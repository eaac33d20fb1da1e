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
_CHANGED_THIS_ROUND: list[str] = [
    # r12: EMPTY by design. Every r11 entry went green in
    # CORRECTNESS_r11.json and is cleared. This round's changes are all
    # load-path / harness / fixture-side — the --filedirt axis with its
    # strict-vs-quarantine partial-file policy (sources/io.py), the
    # --evolve narrow (float32) type-drift mode with the widened
    # footer-union read, the typed oracle drift probe and per-query
    # connection isolation (tests/oracle_utils.py), and the
    # expression-tree rewrite of the split-in-lambda plan gate — none of
    # which alters any query's semantics on the driver fixtures (proven:
    # full 286/286 drive_entry sweep at sf0.01 after the changes). With
    # the block empty, verify_order's stalest-first tier hands the
    # driver's ~50-slot budget to the r2/r3-era tier (the stats family,
    # exotic joins, zorder, r3 windows, and the r2 rows-only pair) —
    # judge r12 task 1.
    #
    # The exceptions — real r12 query changes. [1] The sf1.0 composed
    # sweep's substring-in-lambda catch: char pairing rewritten to
    # zip_with over a bound char array on BOTH sides (was O(len²) per
    # word — 23 CPU-minutes on one 64 KiB single-token doc), plus the
    # 512-char segmentation cap in q_bpe_apply (rows-only).
    "q_bpe_merge",
    "q_bpe_apply",
    # [2] The r12 --unicode case-fold traps' catches: q_text_dedup_url
    # now folds URL case ASCII-only (translate, both sides — JVM full
    # vs utf8proc simple case mapping diverge on ß/ﬁ/İ) with a mirrored
    # non-ASCII-host NULL guard, and q_fn_url's oracle mirrors
    # java.net.URI's component-local host rejection.
    "q_text_dedup_url",
    "q_fn_url",
    # [3] The sf0.1 fifteen-axes composed sweep's catch: streaming
    # dropDuplicates keys state on raw binary rows where -0.0 != +0.0
    # (batch grouping and DuckDB DISTINCT both normalize), so a
    # -0.0-valued purchase twin made the interval join emit its pair
    # twice. q_stream_join now canonicalizes the sign bit before state
    # and dedups the sink on output identity.
    "q_stream_join",
    # [4] The sf1.0 fifteen-axes composed sweep's catch: at 150k-row
    # segments percent_rank's exact rational lands ON a .00005 boundary
    # (11989/15200 = 0.788750) and ROUND(double, 4) splits half-up vs
    # nearest-double across engines — pct_rank now uses the house
    # integer-rational 4-dp quantization on both sides.
    "q_win_rank",
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
