"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real implementations live in ``json_parquet_convertor_spark/``; this
module only adapts the package registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from json_parquet_convertor_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, SURVEY.md §2 q_agg_groupby) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["q_agg_groupby"](spark, "/root/testdata/sf0.001")


# Verification priority: the driver walks this dict in order under a budget
# (round 2 checked exactly the first 50 registry entries), so queries that
# have never received a driver CORRECTNESS row come first, then queries whose
# implementation changed after their last driver check, then the rest
# (cheapest first so a partial sweep still maximizes coverage).
_VERIFY_PRIORITY = [
    # -- never driver-checked through r5 (68 queries; cheapest first so a
    # partial sweep still maximizes coverage; recomputed from the union of
    # CORRECTNESS_r01..r05 per the r5 verdict) --
    "q_udtf_lateral", "q_join_null_safe", "q_stream_tumbling", "q_fn_json",
    "q_agg_mode_median", "q_cache_reuse", "q_sql_exists",
    "q_join_spatial_grid", "q_stream_sliding", "q_merge_upsert",
    "q_win_cusum", "q_win_sessionize", "q_win_time_range", "q_fn_variant",
    "q_win_funnel", "q_sql_subquery_scalar", "q_scan_csv_corrupt",
    "q_time_downsample_m4", "q_stats_mannwhitney", "q_stats_autocorr",
    "q_text_hapax", "q_join_nearest", "q_time_interpolate",
    "q_agg_bitmap_distinct", "q_anomaly_zscore", "q_season_profile",
    "q_udaf_pandas", "q_join_asof_tolerance", "q_text_zipf", "q_scan_xml",
    "q_agg_weighted", "q_sql_cte", "q_stream_dedup", "q_bpe_merge",
    "q_seq_markov", "q_graph_degree_dist", "q_observe_qc", "q_scd2_history",
    "q_win_concurrency", "q_rfm_segment", "q_sink_sorted",
    "q_stream_session", "q_composite_q3", "q_graph_triangles", "q_knn_graph",
    "q_join_array_membership", "q_join_range_binned", "q_stream_watermark",
    "q_udf_cogroup", "q_udf_pandas", "q_win_rank_delta", "q_text_lm_score",
    "q_agg_corr", "q_sql_view", "q_text_decontaminate", "q_udf_grouped_map",
    "q_stream_convert", "q_stream_foreachbatch", "q_stream_enrich",
    "q_stream_stateful", "q_sink_compacted", "q_rank_bm25",
    "q_dedup_cluster", "q_sql_recursive", "q_text_containment",
    "q_graph_pagerank", "q_profile_stats", "q_stream_join",
    # -- implementation changed in round 6 AFTER their last driver check --
    # (pairs_lift: support-table broadcast hints dropped; quality_gate:
    # null-closed dead-letter routing; cube/rollup/groupingsets: HAVING
    # cnt>0 pins empty-input semantics; the rest: empty-input hardening —
    # declared read-back schemas, NULL-vs-0 empty aggregates, guarded
    # iterative seeds — from the r6 zero-row fixture sweep)
    # (agg_groupby: sum_charge oracle re-routed through VARCHAR after the
    # gen-sf1.0 sweep caught DuckDB's double-rounded decimal→double cast;
    # join_asof / join_point_in_time / er_pipeline: oracles linearized for
    # sf1.0 feasibility — semantics unchanged, re-check wanted)
    # (agg_ohlc: oracle argmax key DECIMAL->HUGEINT after the --dupes
    # sweep caught DuckDB's approximate decimal key comparison)
    "q_agg_groupby", "q_join_asof", "q_join_point_in_time", "q_er_pipeline",
    "q_agg_ohlc",
    "q_pairs_lift", "q_stream_quality_gate", "q_agg_cube", "q_agg_rollup",
    "q_agg_groupingsets", "q_convert_parquet_json", "q_sink_partitioned",
    "q_scan_pruned", "q_scan_metadata", "q_join_prune_dynamic",
    "q_privacy_kanon",
    "q_embed_kmeans",
    # -- previously driver-checked, unchanged since (r5-changed block first,
    # then oldest check first) --
    "q_scan_binary", "q_scan_jsonlines", "q_unpivot", "q_fn_encode",
    "q_sample_stratified", "q_scan_text", "q_fn_conditional",
    "q_corpus_shard", "q_sample_weighted", "q_fn_url", "q_fn_struct",
    "q_win_distribution",
    "q_fn_math", "q_text_dedup_prefix", "q_union_evolution", "q_fn_map",
    "q_gen_range", "q_corpus_mix", "q_fn_string", "q_sample_reservoir",
    "q_embed_quantize", "q_fn_bitwise", "q_fn_try", "q_join_fuzzy",
    "q_fn_date", "q_text_scrub_pii", "q_agg_time_rollup",
    "q_scan_merge_schema", "q_pack_sequences", "q_stats_benford",
    "q_sample_split", "q_win_rolling_median",
    "q_agg_hll_union", "q_fn_collation", "q_fn_array", "q_sql_not_in",
    "q_win_pattern", "q_udtf_explode", "q_scan_orc", "q_agg_modern",
    "q_agg_freq_items", "q_udf_python", "q_json_normalize", "q_win_drawdown",
    "q_text_chunk", "q_setop_all", "q_time_spine",
    "q_agg_histogram", "q_multimodal_frames", "q_multimodal_decode",
    "q_text_quality", "q_stats_auc", "q_seq_gaps",
    "q_sort_multi", "q_embed_pool", "q_id_dense", "q_stats_ks",
    "q_sample_temperature", "q_zero_fill",
    "q_filter_like", "q_limit", "q_union_all", "q_filter_simple",
    "q_win_rank", "q_filter_compound", "q_topk", "q_win_analytic",
    "q_union_distinct", "q_filter_null_semantics", "q_except", "q_intersect",
    "q_win_frame_rows", "q_win_frame_range", "q_win_topk_per_group",
    "q_case_when", "q_project_rename_cast", "q_scan_json", "q_text_stats",
    "q_pivot", "q_join_cross", "q_join_anti", "q_dedup_exact", "q_join_semi",
    "q_text_langid", "q_join_broadcast", "q_join_right", "q_join_inner",
    "q_text_tokens", "q_convert_json_parquet", "q_multimodal_join",
    "q_join_left", "q_agg_having", "q_join_theta",
    "q_scan_csv", "q_sim_cosine_topk", "q_agg_collect",
    "q_scan_parquet", "q_text_vocab", "q_join_full",
    "q_agg_approx_distinct", "q_agg_stats", "q_dedup_near", "q_join_range",
    "q_join_multiway", "q_dedup_simhash",
    "q_agg_distinct", "q_text_fingerprint", "q_agg_global", 
    "q_sim_ann_ivf", "q_join_bucketed", "q_sim_pairs_lsh", "q_join_salted",
    "q_text_tfidf", "q_dedup_embed",
    "q_dedup_ngram_jaccard", "q_agg_sketch_quantiles", "q_fn_format",
    "q_fn_timezone", "q_fn_regex", "q_sample_balanced", "q_text_dedup_url",
    "q_sort_zorder", "q_multimodal_dedup", "q_agg_diversity",
    "q_skew_diagnose", "q_corpus_qc", "q_win_streaks",
    "q_win_cumulative_share", "q_udf_arrow", "q_win_conversion_lag",
    "q_win_ewma", "q_win_attribution", "q_corpus_pipeline",
    "q_join_interval_overlap", "q_agg_incremental", "q_sql_lateral",
    "q_stats_gini", "q_cohort_retention", "q_scan_json_corrupt",
    "q_win_moving_distinct", "q_source_custom", 
    "q_cdc_diff", "q_stats_chi2", "q_embed_pca", "q_stats_ttest",
    "q_text_repetition", "q_agg_sketch_cms", "q_join_hinted",
    "q_stats_pareto", "q_join_bloom_prefilter", "q_anomaly_mad",
    "q_text_entropy", "q_embed_whiten", "q_stats_linreg",
    "q_bpe_apply", "q_dedup_incremental", "q_pairs_copurchase",
    "q_sql_params", "q_eval_calibration",
    "q_sql_identifier", "q_skyline_pareto", "q_label_future_window",
    "q_rank_rrf", "q_udtf_python", "q_win_peaks",
    "q_orders_backlog", "q_stats_psi", "q_win_growth", "q_time_decompose",
    "q_stats_wilson", "q_feature_gini", "q_interval_merge", "q_seq_paths",
    "q_user_features", "q_cohort_ltv", "q_sample_temporal_split",
    "q_seq_transitions", "q_stats_anova", "q_stats_power", "q_rank_mrr",
    "q_agg_percentile_daily", "q_stats_rolling_corr", "q_text_collocations",
    "q_qc_expectations", "q_s3_event_parse", "q_composite_q18",
    "q_agg_hist2d", "q_anomaly_seasonal", "q_feature_hash",
    "q_composite_q7", "q_survival_km", "q_composite_q5",
    "q_text_dedup_paragraph", "q_text_bigram_lm", "q_graph_bfs",
    "q_stream_s3_events", "q_feature_target_encode", "q_checksum_table",
    "q_text_keywords", "q_agg_weighted_median",
    "q_sample_bootstrap",
]


def _ordered(mapping: dict) -> dict:
    """Reorder ``mapping`` by verification priority (unknown keys keep their
    registration order at the end, so new operators are never dropped)."""
    rank = {k: i for i, k in enumerate(_VERIFY_PRIORITY)}
    keys = sorted(mapping, key=lambda k: rank.get(k, len(rank)))
    return {k: mapping[k] for k in keys}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return _ordered(registry.ORACLES)
