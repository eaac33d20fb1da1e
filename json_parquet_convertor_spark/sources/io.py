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
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":  # TIMESTAMP(NANOS) read as long
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
        if ts_type != "timestamp":  # timestamp_ntz → session-UTC timestamp
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
