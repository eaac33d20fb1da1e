"""Interleaved same-session A/B for the r14 hot-bucket pre-screen.

OLD arm = the r13 shape (cap filter only AFTER collect_list) obtained by
patching llm._screen_hot_buckets to identity; NEW arm = current registry
(count-first broadcast-anti occupancy screen in front of the list
aggregate). Reps interleave ABAB… in ONE warm session so host noise and
JIT state hit both variants equally (the r12/r13 drift-A/B method).
Caches are cleared after every rep (the bench does the same between
queries), so each rep pays its own cache materialization.
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
from json_parquet_convertor_spark.operators import llm, pipeline  # noqa: E402
from json_parquet_convertor_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = sys.argv[1:] or [
    "q_dedup_near",
    "q_dedup_simhash",
    "q_dedup_embed",
    "q_dedup_ngram_jaccard",
    "q_dedup_incremental",
    "q_text_containment",
]
REPS = int(os.environ.get("AB_REPS", "5"))

_REAL = llm._screen_hot_buckets
_IDENT = lambda keyed, key_cols, cap: keyed  # noqa: E731


def _patch(fn):
    llm._screen_hot_buckets = fn
    pipeline._screen_hot_buckets = fn


def main() -> int:
    registry.load_all()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (
        os.cpu_count() or 8
    )
    spark = get_spark(app_name="jpc-opt-ab-r14", cpus=cpus)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(registry.QUERIES["q_agg_groupby"](spark, SF))  # warm session

    for name in QUERIES:
        fn = registry.QUERIES[name]
        old_s, new_s = [], []
        for r in range(REPS):
            for arm, sink, patch in (
                ("old", old_s, _IDENT),
                ("new", new_s, _REAL),
            ):
                _patch(patch)
                spark.sparkContext.setJobDescription(
                    f"ab_r14:{name}:{arm}:{r}"
                )
                t0 = time.perf_counter()
                force(fn(spark, SF))
                sink.append(round(time.perf_counter() - t0, 4))
                spark.catalog.clearCache()
        _patch(_REAL)
        print(
            json.dumps(
                {
                    "query": name,
                    "old_median": round(statistics.median(old_s), 4),
                    "new_median": round(statistics.median(new_s), 4),
                    "old": old_s,
                    "new": new_s,
                }
            )
        )
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
