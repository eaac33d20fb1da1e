"""Round-13 task 3: settle the two r12 bench drifts with an idle
interleaved re-measure (the r12 recopy-A/B method, adapted).

Watch items (VERDICT.md r12 "What's wrong"):
  - q_join_range: 0.63 s (r11) -> 1.29/1.15 s in both r12 bench runs
    (~1.9x) with NO r12 code change and an identical plan shape
    (PLANS.md) — smells like host noise concentrated on one query, but
    two consecutive runs agreeing demands data, not a shrug.
  - q_fn_url: 0.13 -> 0.28/0.32 s (~2.2x) — r12 touched its oracle and
    guards (commit 05424a0), absolute cost trivial but it moved in the
    round it was edited.

Protocol (one session, idle host): each watch query runs REPS
interleaved blocks against two CONTROL queries of the same input family
and plan class whose r12 timings were flat (q_join_interval_overlap for
the range-join family, q_fn_format for the scalar-projection family).
The canary (q_agg_groupby) runs at start and end. Interpretation:
  - watch medians back at r11 levels while controls flat -> r12 numbers
    were host noise; close the watch item in BASELINE.md.
  - watch medians still elevated while controls flat -> real regression;
    profile the plans.
  - everything elevated -> host still loaded; rerun idle.

Usage: python scripts/drift_ab_r13.py [--reps 7] [--sf-dir DIR]
Prints one JSON line with per-query medians + the r11/r12 reference
numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WATCH = ["q_join_range", "q_fn_url"]
CONTROL = ["q_join_interval_overlap", "q_fn_format"]
#: reference medians from BENCH_FULL_r11_local.json / BENCH_FULL_r12*.json
REFERENCE = {
    "q_join_range": {"r11": 0.63, "r12": [1.29, 1.15]},
    "q_fn_url": {"r11": 0.13, "r12": [0.28, 0.32]},
}


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from json_parquet_convertor_spark import registry
    from json_parquet_convertor_spark.session import get_spark

    registry.load_all()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark(app_name="jpc-drift-ab-r13", cpus=cpus)

    def canary() -> float:
        s = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(registry.QUERIES["q_agg_groupby"](spark, args.sf_dir))
            s.append(time.perf_counter() - t0)
        return round(statistics.median(s), 4)

    _force(registry.QUERIES["q_agg_groupby"](spark, args.sf_dir))  # warmup
    c0 = canary()
    print(f"canary@start {c0} load={list(os.getloadavg())}", file=sys.stderr)

    times: dict[str, list[float]] = {q: [] for q in WATCH + CONTROL}
    for rep in range(args.reps):
        for q in WATCH + CONTROL:
            t0 = time.perf_counter()
            _force(registry.QUERIES[q](spark, args.sf_dir))
            times[q].append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        print(f"rep {rep} done", file=sys.stderr)
    c1 = canary()
    print(f"canary@end {c1} load={list(os.getloadavg())}", file=sys.stderr)

    out = {
        "medians": {
            q: round(statistics.median(v), 4) for q, v in times.items()
        },
        "all_reps": {q: [round(x, 4) for x in v] for q, v in times.items()},
        "reference": REFERENCE,
        "canary": [c0, c1],
        "reps": args.reps,
        "cpus": cpus,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
