"""Dump q_stream_join's STREAMING-side physical plan (un-started).

The registry function executes the stream and returns the batch read of
its memory sink, so `opt_measure --plans` would only capture the sink
read. This rebuilds the streaming `joined` DataFrame exactly as
q_stream_join does (same helpers) and explains it without starting the
query — the dedup state columns and the interval join are the plan
facts the r14 change touches. Usage:
    python scripts/opt_streamplan_r14.py plans/r14/q_stream_join_<suffix>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from json_parquet_convertor_spark.session import get_spark  # noqa: E402
from json_parquet_convertor_spark.sources.io import load_table  # noqa: E402
from json_parquet_convertor_spark.streaming import batch as sb  # noqa: E402

OUT = sys.argv[1]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    spark = get_spark(app_name="jpc-streamplan", cpus=8)
    ev = (
        load_table(spark, SF, "events")
        .filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-05").cast("timestamp"))
        )
        .select("user_id", "event_type", "ts", "value")
    )
    src = sb._replay_source(spark, SF, "join", lambda: ev)

    # mirror q_stream_join's stream construction (kept in sync by hand;
    # the dump is diagnostic evidence, not production code). --old builds
    # the r13 shape (full event rows through the dedup state).
    old = "--old" in sys.argv

    def side(event_type: str):
        return (
            spark.readStream.schema(ev.schema)
            .parquet(src)
            .filter(F.col("event_type") == event_type)
            .withWatermark("ts", "10 minutes")
        )

    if old:
        clicks = (
            side("click")
            .dropDuplicates(["user_id", "ts"])
            .select(
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("click_ts"),
            )
        )
        buys = (
            side("purchase")
            .withColumn(
                "value",
                F.when(F.col("value") == 0, F.lit(0.0)).otherwise(
                    F.col("value")
                ),
            )
            .dropDuplicates(["user_id", "ts", "value"])
            .select(
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("buy_ts"),
                "value",
            )
        )
    else:
        clicks = (
            side("click")
            .select("user_id", "ts")
            .dropDuplicates(["user_id", "ts"])
            .select(
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("click_ts"),
            )
        )
        buys = (
            side("purchase")
            .select(
                "user_id",
                "ts",
                F.when(F.col("value") == 0, F.lit(0.0))
                .otherwise(F.col("value"))
                .alias("value"),
            )
            .dropDuplicates(["user_id", "ts", "value"])
            .select(
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("buy_ts"),
                "value",
            )
        )
    joined = clicks.join(
        buys,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (
            F.col("buy_ts")
            < F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
    )
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    with open(OUT, "w") as fh:
        fh.write(plan)
    print(f"wrote {OUT} ({len(plan)} bytes); old={old}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
