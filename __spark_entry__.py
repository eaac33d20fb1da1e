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
    # r6 oracle rewrites not driver-sampled since (r7 was a zero-commit
    # round): asof/point-in-time linearized for sf1.0 feasibility, ohlc
    # argmax key DECIMAL->HUGEINT, er_pipeline name-space closure.
    "q_join_asof",
    "q_join_point_in_time",
    "q_agg_ohlc",
    "q_er_pipeline",
    # r8: denominator mask now qty-NULL-only, matching SUM(p*q)/SUM(q)
    "q_udaf_pandas",
    # r8 --extreme sweep fixes: non-finite embedding components
    # (pool-exclude / saturating quantize / NULL features), zero-weight
    # draw exclusion, and the file-count contract made NDV-robust
    "q_embed_pool",
    "q_embed_quantize",
    "q_multimodal_join",
    "q_sample_weighted",
    "q_sink_sorted",
    # r8 price-NULL sweep: NULL price/qty rows excluded from the weighted
    # median (NULL group sorted NULLS-FIRST/LAST asymmetrically)
    "q_agg_weighted_median",
    # r9 --dates sweep fixes (temporal edge values; BASELINE.md round-9
    # matrix row): trunc-vs-floor epoch seconds -> exact.fsec, packed-key
    # epoch shift, gap-capped interpolation, widened day decimals, bounded
    # stream-join replay window, fixed-offset timezone shifts. Queries
    # whose Spark idiom changed but whose driver-fixture output is
    # byte-identical (the ~25 latent fsec sites) are deliberately NOT
    # listed — a re-check of an unchanged result spends a slot for zero
    # information.
    "q_time_interpolate",
    "q_join_nearest",
    "q_fn_date",
    "q_fn_timezone",
    "q_checksum_table",
    "q_scd2_history",
    "q_win_frame_range",
    "q_win_sessionize",
    "q_win_time_range",
    "q_user_features",
    "q_composite_q7",
    # r9 --negative sweep fixes: positivity-domain guards on sqrt/ln
    # (Spark NULL/NaN vs DuckDB hard error) and Benford reads |x|'s digit
    "q_fn_math",
    "q_udf_pandas",
    "q_stats_benford",
    # r9 composed-axes catch: collect_list drops NULL daily sums where
    # DuckDB's list() keeps them; the rolling-median oracle now filters
    "q_win_rolling_median",
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
