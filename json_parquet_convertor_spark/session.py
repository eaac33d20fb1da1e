"""SparkSession factory.

Replaces the reference's bootstrap (``cmd/convertor/main.go:20-72``): env
config + AWS client construction there becomes session construction here.
Defaults are tuned for the test harness (local[N]) but every knob is the one
you would set on a real cluster: AQE for runtime re-planning and skew joins,
Arrow for pandas-UDF transfer, snappy parquet to match the reference's sink
(``convertor/convertor.go:182``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "json-parquet-convertor-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    At 100 TB on a real cluster you drop ``master`` and let the cluster
    manager size executors; everything else below still applies.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        # local mode: match cores, not the 200 default (tiny shuffles per
        # partition otherwise). On a cluster: ~2-3x total cores, or rely on AQE
        # coalescing from a high initial value.
        shuffle_partitions = max(cpus, 8)

    # Local-mode driver heap (r14, guide §5/§9): in local[N] the driver JVM
    # IS the executor — N task threads, every broadcast, AND the streaming
    # state stores (HDFSBackedStateStore keeps committed state maps on heap,
    # and each streaming invocation's providers stay loaded after the query
    # terminates) all share it. PySpark's bare 1g default collapses under
    # that once a long session accumulates state: measured on the bench
    # sequence, q_stream_join degrades 5.4 s → 15-42 s per run as the heap
    # fills (GC thrash), and is flat 6 s at 8g. -Xmx is a CAP, not a
    # reservation, so small test sessions are unaffected. Driver-heap
    # configs are silently ignored at builder time (the JVM is already
    # being launched), so this must go through PYSPARK_SUBMIT_ARGS — set
    # only when we are actually the process launching the JVM and the
    # caller hasn't configured their own. On a real cluster the submitter
    # owns --driver-memory and this branch never fires.
    from pyspark import SparkContext

    if (
        "PYSPARK_SUBMIT_ARGS" not in os.environ
        and SparkContext._active_spark_context is None
    ):
        mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        os.environ["PYSPARK_SUBMIT_ARGS"] = (
            f"--driver-memory {mem} pyspark-shell"
        )

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # broadcast small dims aggressively; the star-schema dims here are
        # tiny, and at 100 TB the dims are still << executor memory.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.ui.enabled", "false")
    )
    # NOTE: spark.driver.memory cannot be set here — the JVM is already
    # being launched by getOrCreate, so builder-time driver-heap configs are
    # silently ignored. Set it before process start instead, e.g.
    # PYSPARK_SUBMIT_ARGS="--driver-memory 32g pyspark-shell" or
    # spark-submit --driver-memory.
    if os.environ.get("SPARK_GRAFT_S3", "") == "1":
        builder = _with_s3a(builder)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _with_s3a(builder):
    """Cluster-ready S3 posture for the "swap the URI" claim (sources/io.py):
    the same code runs against ``s3a://bucket/prefix`` once these are set.

    Opt-in (``SPARK_GRAFT_S3=1``) because the sandbox has neither the
    hadoop-aws jars nor AWS credentials; on a real cluster the jars ship with
    the distribution. This replaces the reference's AWS client bootstrap
    (``cmd/convertor/main.go:30-45``, default credential chain + region env).
    """
    return (
        builder
        # default AWS credential chain (env vars, instance profile, SSO) —
        # same resolution order the reference's SDK v2 config loader uses
        .config(
            "spark.hadoop.fs.s3a.aws.credentials.provider",
            "com.amazonaws.auth.DefaultAWSCredentialsProviderChain",
        )
        # the magic committer makes S3 writes task-atomic without a rename
        # (S3 has no rename); required for correct concurrent job output
        .config(
            "spark.hadoop.fs.s3a.committer.name", "magic",
        )
        .config(
            "spark.sql.sources.commitProtocolClass",
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
        )
        .config(
            "spark.sql.parquet.output.committer.class",
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter",
        )
        # throughput knobs: parallel multipart uploads and ranged GETs sized
        # like the reference's 5 MiB x4 download manager (main.go:68-69),
        # scaled for executor-side parallelism
        .config("spark.hadoop.fs.s3a.connection.maximum", "96")
        .config("spark.hadoop.fs.s3a.threads.max", "64")
        .config("spark.hadoop.fs.s3a.multipart.size", "64M")
        .config("spark.hadoop.fs.s3a.experimental.input.fadvise", "random")
    )
