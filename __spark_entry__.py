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

from json_parquet_convertor_spark import registry, verify_order  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, SURVEY.md §2 q_agg_groupby) on
    /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["q_agg_groupby"](spark, "/root/testdata/sf0.001")


# Verification priority: the driver walks this dict in order under a budget
# (round 2 checked exactly the first 50 registry entries), so queries that
# have never received a driver CORRECTNESS row come first, then queries whose
# implementation changed after their last driver check, then the rest
# (stalest driver check first, cheapest first within a tier).
#
# The order is COMPUTED AT IMPORT TIME from the CORRECTNESS_r*.json /
# BENCH_FULL*.json artifacts in the repo root (see verify_order.py) — round 7
# showed a hand-rotated static list silently wastes a driver sampling round
# when the rotation is skipped.  The only human-maintained input is the
# changed block below: queries whose implementation or oracle changed this
# round after their last driver check, so the driver re-confirms them.
_CHANGED_THIS_ROUND = [
    # r11 (all 26 r10 entries went green in CORRECTNESS_r10 and are
    # cleared so the driver budget refreshes the last stale r1/r2 tier).
    #
    # --rowdup axis (at-least-once duplicate rows incl. primary ids):
    # set-vs-bag shingle indexes — full-row dropDuplicates ingest guard
    # before indexing (Spark side changed). ALSO reshaped by the
    # --longtext axis (crawl-outlier megadocs): every shingle/gram
    # builder now binds the token array as a column BEFORE the HOF
    # lambda indexes it (an inline split re-splits the text per element,
    # O(len²) per doc) and the oracles bind string_split in a subquery.
    "q_dedup_ngram_jaccard",
    "q_dedup_cluster",
    "q_dedup_incremental",
    "q_text_containment",
    "q_text_decontaminate",
    # oracle-side fixes (per-key regroups that merged re-delivered
    # copies; Spark semantics unchanged but the oracle TEXT changed, so
    # a driver re-hash is cheap insurance against a transcription slip)
    "q_text_fingerprint",
    "q_corpus_pipeline",
    "q_feature_hash",
    "q_win_moving_distinct",
    "q_join_asof",
    "q_join_interval_overlap",
    # sf1.0 twelve-axes composed sweep catch: the equi+range-post-filter
    # plan degenerates to a per-key cartesian under hot-key skew (8.0e11
    # pairs on one user) — rewritten to (user, day) pre-aggregated
    # partials joined equi on the exploded day window, linear by
    # construction; oracle rewritten to the same shape
    "q_join_range",
    # sf1.0 twelve-axes composed sweep catch: the (18,4)x(4,2) scale-6
    # weighted sum crosses 2^53 in its scaled numerator at this volume,
    # where DuckDB's direct decimal->double cast double-rounds — the
    # oracle cast now routes through VARCHAR (the r6 rule)
    "q_join_salted",
    # --longtext axis: MinHash shingling rewritten to the bound-token-
    # array shape (rows-only query — the driver's ran+rows check is the
    # re-confirmation) and q_text_fingerprint's _spark_shingles helper
    # likewise (its oracle re-hash is covered above)
    "q_dedup_near",
    # --longtext oracle feasibility: the lateral generate_series bigram
    # join carried the whole token list into every joined row (O(len²)
    # per doc) — rewritten to list_zip of two top-level slices
    "q_text_bigram_lm",
    "q_text_collocations",
    "q_text_repetition",
    # --longtext sibling-projection re-split (size(split) next to
    # explode(split) re-splits per OUTPUT row in both engines)
    "q_text_tfidf",
    "q_text_keywords",
    # --longtext 32-bit overflow: the quality-score numerator crosses
    # 2^31 near 220k tokens — stats promoted to LONG/BIGINT on both sides
    "q_text_quality",
    # --longtext Generate-sibling carry: the chunker's start-posexplode
    # replicated the whole token array per chunk row (quadratic per
    # megadoc) — chunk md5s now build inside one transform over the
    # bound array; oracle regroups per token, keyed by physical row so
    # --rowdup copies still emit per delivery
    "q_text_chunk",
    # --evolve axis (schema drift; late-added columns read NULL where no
    # other axis nulls them): arg_max-skips-NULL-values vs max_by
    # sentinel (q_agg_modern, q_join_point_in_time incl. a NULL-state
    # version-boundary carry), missing-as-token hashing (q_feature_hash;
    # DuckDB list_distinct strips NULL elements), NULL-objective domain
    # guard (q_skyline_pareto), nullable-Int64 label groups
    # (q_embed_whiten, rows-only); q_feature_hash (missing-as-token on
    # every categorical) is already listed above
    "q_agg_modern",
    "q_join_point_in_time",
    "q_skyline_pareto",
    "q_embed_whiten",
]

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))

_VERIFY_PRIORITY = verify_order.compute_verify_order(
    list(registry.QUERIES), _REPO_ROOT, changed=_CHANGED_THIS_ROUND
)


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
