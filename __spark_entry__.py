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
    # r10 (all 27 r6-r9 entries went green in CORRECTNESS_r09 and are
    # cleared so the driver budget refreshes the stalest r1/r2 tier):
    #
    # promoted rows-only -> SQL-oracled: the sink read-back is the three
    # embedded reference sample persons, stated inline by the oracle
    "q_stream_convert",
    # composed-sf0.1 sweep catches (BASELINE.md round-10 matrix row):
    # zero running peak is ANSI DIVIDE_BY_ZERO vs DuckDB Inf -> mirrored
    # peak > 0 domain guard on drawdown_pct
    "q_win_drawdown",
    # (s, e) tie groups sequenced independently by the flag and sum
    # window passes split an island -> both passes now order by the
    # TOTAL key (s, e, event_id) in both engines
    "q_interval_merge",
    # --bigid axis (snowflake-scale ids): reduce-first hash mixing, 1e19
    # pack fields, empty-replicate guard. Semantics CHANGED only where
    # malformed/degenerate input now yields NULL-and-continue (bootstrap
    # empty replicates, corpus_mix unparseable source); the reduce-first
    # rewrites are provably congruent (listed anyway: the oracle TEXT
    # changed, so a driver re-hash is cheap insurance against a
    # transcription slip).
    "q_sample_split",
    "q_sample_stratified",
    "q_sample_temperature",
    "q_sample_weighted",
    "q_sample_bootstrap",
    "q_corpus_mix",
    "q_corpus_shard",
    "q_pack_sequences",
    "q_eval_calibration",
    "q_rank_mrr",
    "q_join_salted",
    "q_agg_ohlc",
    "q_join_asof",
    "q_join_nearest",
    # --ctrl axis (byte-level text dirt): ANSI-crash -> NULL-and-continue
    "q_fn_url",
    "q_text_dedup_url",
    # --nullkey axis (orphan FKs): window-partition-vs-equi-join NULL
    # semantics pinned; q_pivot's fill no longer rewrites the group key
    "q_join_point_in_time",
    "q_win_moving_distinct",
    "q_pivot",
    "q_feature_hash",
    "q_udf_cogroup",
    # composed-axes catches (orphan carry at month spread; NULLS LAST
    # rank tiebreak pinned)
    "q_join_asof_tolerance",
    "q_win_rank_delta",
    # NOT listed: the ~30 fsec/fday sites rewritten from decimal to LONG
    # floor-division this round — exact-identical output on every fixture
    # (differential-swept on driver/dates/hotkey/composed fixtures), so a
    # re-check spends a driver slot for zero information.
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
