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
