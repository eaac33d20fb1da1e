"""Central query/oracle registry.

Every operator from SURVEY.md §2 Part B registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a DuckDB oracle
SQL string. ``__spark_entry__.py`` exposes these to the driver.

The driver compares row-count + schema + order-insensitive value hash, so:
- every computed column is aliased identically in query and oracle;
- float-valued aggregates use the decimal-exact helpers in
  :mod:`json_parquet_convertor_spark.exact` or are rounded to 4 dp on both
  sides;
- arrays are sorted on both sides before comparison.
"""

from __future__ import annotations

from collections.abc import Callable
from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` means rows-only driver check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = dedent(oracle).strip()
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from json_parquet_convertor_spark.operators import (  # noqa: F401
        aggregates,
        analytics,
        corpus,
        joins,
        llm,
        pipeline,
        relational,
        sampling,
        sqlapi,
        timeseries,
        udfs,
        validation,
        windows,
    )
    from json_parquet_convertor_spark.functions import scalar  # noqa: F401
    from json_parquet_convertor_spark.streaming import batch  # noqa: F401
