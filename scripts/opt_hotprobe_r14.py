"""Hot-bucket probe for the r14 pre-screen (VERDICT r13 item 1).

Synthesizes the exact failure mode the screen exists for — ONE bucket key
owning h rows (the 10⁷-member boilerplate clique of the verdict) plus a
spread tail — and runs the bucket-list aggregate in both shapes:

  OLD (r13): groupBy(k).agg(array_sort(collect_list(id)), count)
             .filter(cnt <= 200)           # cap applied AFTER the list
  NEW (r14): _screen_hot_buckets first     # cap applied BEFORE the list

Reports wall time and the aggregate's peak-memory SQLMetric (best effort
through the AQE plan). The OLD shape must materialize + sort the full
h-member array in one un-spillable aggregation buffer before throwing it
away; the NEW shape never ships those rows into the list aggregate.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from json_parquet_convertor_spark.operators.llm import (  # noqa: E402
    _screen_hot_buckets,
)
from json_parquet_convertor_spark.session import get_spark  # noqa: E402

HOT = [int(x) for x in (sys.argv[1:] or ["1000000", "10000000"])]
TAIL_KEYS = 100_000  # spread tail: 100k buckets of 10 members each


def peak_agg_memory_bytes(df) -> int:
    """Max 'peak memory' SQLMetric over aggregate nodes (best effort)."""
    best = 0

    def walk(node):
        nonlocal best
        name = node.getClass().getSimpleName()
        if "Adaptive" in name:
            walk(node.executedPlan())
            return
        if "QueryStage" in name:
            walk(node.plan())
        if "Aggregate" in name:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if "peak" in str(kv._1()).lower():
                    best = max(best, kv._2().value())
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    try:
        walk(df._jdf.queryExecution().executedPlan())
    except Exception as exc:  # metric plumbing is diagnostic only
        print(f"  (peak-memory walk failed: {exc})", file=sys.stderr)
    return int(best)


def main() -> int:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (
        os.cpu_count() or 8
    )
    spark = get_spark(app_name="jpc-hotprobe-r14", cpus=cpus)

    for h in HOT:
        # id space: hot rows get key 0, tail rows key 1..TAIL_KEYS
        rows = spark.range(h + 10 * TAIL_KEYS).select(
            F.col("id"),
            F.when(F.col("id") < h, F.lit(0))
            .otherwise(F.col("id") % TAIL_KEYS + 1)
            .alias("k"),
        )

        def agg(keyed):
            return (
                keyed.groupBy("k")
                .agg(
                    F.array_sort(F.collect_list("id")).alias("ds"),
                    F.count(F.lit(1)).alias("cnt"),
                )
                .filter(F.col("cnt") <= 200)
            )

        for arm, shape in (
            ("new", agg(_screen_hot_buckets(rows, ["k"], 200))),
            ("old", agg(rows)),
        ):
            spark.sparkContext.setJobDescription(f"hotprobe:{h}:{arm}")
            t0 = time.perf_counter()
            try:
                shape.write.format("noop").mode("overwrite").save()
                err = None
            except Exception as exc:
                err = f"{type(exc).__name__}: {str(exc)[:200]}"
            dt = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "hot_members": h,
                        "arm": arm,
                        "sec": round(dt, 2),
                        "error": err,
                        "agg_peak_memory_bytes": peak_agg_memory_bytes(
                            shape
                        ),
                    }
                )
            )
            sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
