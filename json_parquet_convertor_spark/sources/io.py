"""Sources and sinks (SURVEY.md §2 B1; generalizes reference A3/A6).

The reference downloads a JSON object from S3 (``convertor/convertor.go:126-133``)
and writes a single-row snappy parquet file back (``convertor/convertor.go:169-184``).
Here the same surface is Spark's declarative readers/writers — predicate
pushdown, column pruning, and partition pruning then come free from Catalyst.

Scale posture: paths are just URIs — swap ``/root/testdata`` for
``s3a://bucket/prefix`` and the same code runs on a cluster. Partitioned
writes (``partition_by``) are the 100 TB layout primitive: they turn
date/tenant filters into partition pruning instead of full scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: The catalog contract (TESTDATA.md): the columns every reader sees for
#: each table, whatever any single part file carries. A 100 TB table is
#: written by years of producer versions, so part files drift — old files
#: miss late-added columns, new files carry fields the contract doesn't
#: know yet. The reference handles exactly this at JSON ingest (A4:
#: unknown keys dropped, missing fields filled, convertor/struct.go);
#: ``load_table`` generalizes it to the parquet lake: missing-in-file →
#: NULL, unknown → dropped, order irrelevant (parquet is name-addressed).
EXPECTED_COLUMNS = {
    "region": ("r_regionkey", "r_name"),
    "nation": ("n_nationkey", "n_name", "n_regionkey"),
    "customer": (
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
    ),
    "supplier": ("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part": (
        "p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice",
    ),
    "orders": (
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ),
    "lineitem": (
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ),
    "events": ("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents": ("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings": ("vec_id", "embedding", "label"),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated parquet table (TESTDATA.md).

    ``events.ts`` has shipped in two physical layouts across testdata
    generations: TIMESTAMP(NANOS) (which Spark's parquet reader only accepts
    as a long via the legacy conf — we truncate to micros, the same
    truncation DuckDB applies on ``CAST(ts AS TIMESTAMP)``) and plain
    TIMESTAMP(MICROS) without UTC adjustment (which Spark reads as
    TIMESTAMP_NTZ). Both normalize to a session-local TIMESTAMP here so
    every query sees one stable type; with the session pinned to UTC the
    NTZ→LTZ cast is wall-clock-identity and matches the tz-naive DuckDB
    oracle exactly.

    The session timezone is pinned to UTC here (runtime conf) because the
    caller may hand us a default-configured session: timestamp literals in
    the queries must mean the same wall-clock instants the (tz-naive) DuckDB
    oracle sees.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_contract(spark, sf_dir, name)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":  # TIMESTAMP(NANOS) read as long
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
        if ts_type != "timestamp":  # timestamp_ntz → session-UTC timestamp
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return _read_contract(spark, sf_dir, name)


def _read_contract(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a table directory under the catalog contract (EXPECTED_COLUMNS).

    The plain read infers its schema from ONE footer; on a homogeneous
    layout that is the whole contract and costs nothing extra (the hot
    path — zero change for clean directories, including fragmented
    --manyfiles layouts, because Spark's vectorized reader already fills
    a column missing from a *later* file with NULL). Only when the
    inferred column set disagrees with the contract — the elected footer
    was an old-generation or new-generation file — do we pay the
    mergeSchema pass (a distributed footer merge, the schema-evolution
    slow path), then clip to the contract: unknown producer columns are
    dropped (reference A4 semantics, convertor/struct.go) and the select
    is name-addressed so per-file column ORDER is irrelevant. A contract
    column absent from every file stays absent — that table is broken and
    the query should fail loudly, not silently compute on a phantom.
    """
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    expected = EXPECTED_COLUMNS.get(name)
    if expected is None or set(df.columns) == set(expected):
        return df
    df = spark.read.option("mergeSchema", "true").parquet(path)
    return df.select(*[c for c in expected if c in df.columns])


def spread(df: DataFrame) -> DataFrame:
    """Ensure enough partitions for CPU-bound per-row work.

    Small benchmark tables arrive as a single parquet file → one partition →
    one task doing all the hashing/dot-product work. If the scan has fewer
    partitions than the cluster has slots, repartition up; at real scale the
    input is already split (partitions >> cores) and this is a no-op, so no
    gratuitous shuffle is added on big inputs."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    multiline: bool = True,
    drop_malformed: bool = True,
) -> DataFrame:
    """JSON reader with the reference's input shape (A3/A4).

    The reference's inputs are pretty-printed single-object files
    (``sample_json/person2.json``), hence ``multiLine``. An explicit schema
    reproduces "unknown keys dropped"; ``DROPMALFORMED`` reproduces
    "type mismatch → skip file" (``convertor/convertor.go:137-141``).
    """
    reader = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        reader = reader.schema(schema)
    if drop_malformed:
        reader = reader.option("mode", "DROPMALFORMED")
    return reader.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    compression: str = "snappy",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink matching the reference's (A6): snappy, dictionary-encoded.

    The reference fixes a 16 MiB row-group target (``convertor/convertor.go:180``);
    Spark's default 128 MiB ``parquet.block.size`` is the right call at scale —
    fewer, larger row groups scan faster. Dictionary encoding is on by default.
    """
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """CSV source with explicit schema (never inferSchema — that's a full
    extra pass over the data at scale)."""
    return spark.read.option("header", "true").schema(schema).csv(path)
