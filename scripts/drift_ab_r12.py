"""Round-12 task 4: settle the documents/embeddings LOCAL drift watch item
(open since r10) with a fixture-recopy A/B.

Hypothesis under test (BASELINE.md "Round-11 watch-item re-measure"): a
~dozen shuffle-heavy documents/embeddings queries drift upward ~10%/round
in LOCAL runs with zero code/plan/input diff while the global median
improves — consistent with degrading host I/O / page-cache state against
the AGED fixture inodes, not with an engine regression.

Protocol (one session, idle host):
  A = the original /root/testdata/sf0.1 files (aged inodes)
  B = a fresh byte-copy of the same files (new inodes, written this
      session so fully page-cached)
Each drifting query runs REPS times per side in interleaved A/B blocks
(cancels in-session monotonic drift); the canary (q_agg_groupby) runs at
start and end for the usual deflation context. If B restores the r9-era
numbers while A stays elevated, the drift is host storage state — close
the watch item; if A == B and both stay elevated, profile the queries.

Usage: python scripts/drift_ab_r12.py [--reps 5] [--sf-dir DIR]
Prints one JSON line: {"a": {q: med}, "b": {q: med}, "cold_b": {...},
"canary": [...], "ratio_b_over_a": {...}}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the drifting subset named in BASELINE.md / VERDICT r10-r11, plus its
# family neighbors that share the inputs
DRIFT_SET = [
    "q_rank_bm25",
    "q_embed_pool",
    "q_dedup_simhash",
    "q_knn_graph",
    "q_dedup_incremental",
    "q_text_containment",
    "q_dedup_ngram_jaccard",
    "q_text_tfidf",
    "q_text_keywords",
    "q_text_bigram_lm",
    "q_text_fingerprint",
    "q_pairs_lift",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--copy-dir", default="/tmp/jpc_drift_ab_sf0.1_copy")
    args = ap.parse_args()

    from json_parquet_convertor_spark import registry
    from json_parquet_convertor_spark.session import get_spark

    registry.load_all()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark(app_name="jpc-drift-ab", cpus=cpus)

    # fresh byte-copy: new inodes, same bytes
    if os.path.exists(args.copy_dir):
        shutil.rmtree(args.copy_dir)
    shutil.copytree(args.sf_dir, args.copy_dir)

    def canary() -> float:
        s = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(registry.QUERIES["q_agg_groupby"](spark, args.sf_dir))
            s.append(time.perf_counter() - t0)
        return round(statistics.median(s), 4)

    # warmup
    _force(registry.QUERIES["q_agg_groupby"](spark, args.sf_dir))
    c0 = canary()
    print(f"canary@start {c0} load={list(os.getloadavg())}", file=sys.stderr)

    a: dict[str, list[float]] = {q: [] for q in DRIFT_SET}
    b: dict[str, list[float]] = {q: [] for q in DRIFT_SET}
    cold_b: dict[str, float] = {}
    for rep in range(args.reps):
        for q in DRIFT_SET:
            fn = registry.QUERIES[q]
            for side, store, d in (
                ("a", a, args.sf_dir),
                ("b", b, args.copy_dir),
            ):
                t0 = time.perf_counter()
                _force(fn(spark, d))
                dt = time.perf_counter() - t0
                store[q].append(dt)
                if side == "b" and rep == 0:
                    cold_b[q] = round(dt, 4)
            spark.catalog.clearCache()
        print(f"rep {rep} done", file=sys.stderr)
    c1 = canary()
    print(f"canary@end {c1} load={list(os.getloadavg())}", file=sys.stderr)

    med_a = {q: round(statistics.median(v), 4) for q, v in a.items()}
    med_b = {q: round(statistics.median(v), 4) for q, v in b.items()}
    out = {
        "a_aged": med_a,
        "b_fresh_copy": med_b,
        "b_first_pass": cold_b,
        "ratio_b_over_a": {
            q: round(med_b[q] / med_a[q], 3) for q in DRIFT_SET
        },
        "canary": [c0, c1],
        "reps": args.reps,
        "cpus": cpus,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
