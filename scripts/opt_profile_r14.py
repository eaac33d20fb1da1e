"""Fixed-overhead profile for the r14 optimization round (guide §1).

Splits a cheap query's per-invocation cost into its harness components:
table load (footer read + conf RPCs), spread()'s partition probe
(df.rdd.getNumPartitions — full Catalyst planning per call), the
candidate cheap replacement (analyzed-plan semanticHash), plan build,
and bare job submission (noop write of a 1-row range). All timings in a
single warm session, medians over N reps, printed as one JSON line each.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from json_parquet_convertor_spark import registry  # noqa: E402
from json_parquet_convertor_spark.session import get_spark  # noqa: E402
from json_parquet_convertor_spark.sources import io  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PROF_REPS", "30"))


def timed(label, fn, n=N):
    xs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        xs.append(round((time.perf_counter() - t0) * 1000, 3))
    print(json.dumps({
        "step": label,
        "median_ms": round(statistics.median(xs), 3),
        "min_ms": min(xs),
        "max_ms": max(xs),
        "n": n,
    }))
    sys.stdout.flush()


def main() -> int:
    registry.load_all()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (
        os.cpu_count() or 8
    )
    spark = get_spark(app_name="jpc-opt-profile", cpus=cpus)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(registry.QUERIES["q_agg_groupby"](spark, SF))  # warm session

    timed("load_table(documents)", lambda: io.load_table(spark, SF, "documents"))
    timed("load_table(lineitem)", lambda: io.load_table(spark, SF, "lineitem"))

    df = io.load_table(spark, SF, "documents")
    timed("df.rdd.getNumPartitions", lambda: df.rdd.getNumPartitions())
    timed(
        "analyzed.semanticHash",
        lambda: df._jdf.queryExecution().analyzed().semanticHash(),
    )
    timed(
        "defaultParallelism",
        lambda: spark.sparkContext.defaultParallelism,
    )
    timed("spread(load_table)", lambda: io.spread(io.load_table(spark, SF, "documents")))

    timed("noop write 1-row range", lambda: force(spark.range(1)), n=10)

    q = registry.QUERIES["q_text_stats"]
    timed("q_text_stats build df", lambda: q(spark, SF), n=10)

    def run():
        d = q(spark, SF)
        force(d)
        spark.catalog.clearCache()

    timed("q_text_stats build+run", run, n=10)
    return 0


if __name__ == "__main__":
    sys.exit(main())
