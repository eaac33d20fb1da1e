"""Differential test: every SQL-oracled query must match DuckDB exactly.

This replicates the driver's t2 gate locally (SURVEY.md §5 strategy 1) at
sf0.001 for speed; the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from json_parquet_convertor_spark import registry

registry.load_all()

ORACLED = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, duck, sf_dir, name):
    from tests.oracle_utils import compare_query

    ok, detail = compare_query(
        spark, duck, registry.QUERIES[name], registry.ORACLES[name], sf_dir
    )
    assert ok, f"{name}: {detail}"


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle still must run and return a stable schema."""
    for name, fn in registry.QUERIES.items():
        if name in registry.ORACLES:
            continue
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: no columns"
        assert df.count() >= 0, f"{name}: count failed"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_sweep_isolates_poisoned_oracle_connections(spark, sf_dir):
    """Judge r12 task 5: one failing oracle must not cascade. The r11
    sf1.0 run showed a DuckDB OOM poisons the shared connection — every
    later oracle on it dies with tiny bad-allocations. sweep_queries must
    rebuild the connection on a raised compare (retrying once) and leave a
    fresh one for the NEXT query, so the queries after a deliberately
    erroring oracle still verify green."""
    import duckdb

    from tests.oracle_utils import register_duck_views, sweep_queries

    built = []

    def con_factory():
        c = duckdb.connect()
        register_duck_views(c, sf_dir)
        built.append(c)
        return c

    from json_parquet_convertor_spark import registry

    good = registry.QUERIES["q_agg_groupby"]
    qs = {"q_bad": good, "q_good": good}
    oracles = {
        "q_bad": "SELECT error('deliberate oracle failure')",
        "q_good": registry.ORACLES["q_agg_groupby"],
    }
    lines = []
    fails = sweep_queries(
        spark, con_factory, qs, oracles, ["q_bad", "q_good"], sf_dir,
        report=lines.append,
    )
    assert fails == ["q_bad"], (fails, lines)
    assert any(l.startswith("OK  q_good") for l in lines), lines
    # the erroring oracle forced at least one rebuild: initial + retry con
    assert len(built) >= 3, lines
