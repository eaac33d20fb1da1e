"""1x/4x/10x scale probe of the r11b-changed queries on the axis fixtures
that triggered them (longtext / evolve). Writes SCALING_R11B_AXES.json."""
import json
import os
import statistics
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from gen_fixtures import build
from json_parquet_convertor_spark import registry
from json_parquet_convertor_spark.session import get_spark

registry.load_all()

LONGTEXT_Q = [
    "q_dedup_ngram_jaccard", "q_dedup_cluster", "q_dedup_incremental",
    "q_text_containment", "q_text_decontaminate", "q_text_fingerprint",
    "q_dedup_near", "q_text_bigram_lm", "q_text_collocations",
    "q_text_repetition", "q_text_tfidf", "q_text_keywords", "q_text_quality",
]
EVOLVE_Q = [
    "q_agg_modern", "q_join_point_in_time", "q_feature_hash",
    "q_skyline_pareto", "q_embed_whiten",
]

spark = get_spark(app_name="scale-probe-r11b", cpus=16)

def ensure(sf, **axes):
    suffix = "".join(f"_{k}" for k, v in axes.items() if v)
    dst = f"/tmp/jpc_genfix_sf{sf}{suffix}"
    if not os.path.isdir(dst):
        build(spark, dst, sf, **axes)
    return dst

def t(name, sf_dir, reps=1):
    fn = registry.QUERIES[name]
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    return statistics.median(samples)

out = {}
for axes, qs in [({"longtext": True}, LONGTEXT_Q), ({"evolve": True}, EVOLVE_Q)]:
    dirs = {x: ensure(sf, **axes) for x, sf in [(1, 0.01), (4, 0.04), (10, 0.1)]}
    for q in qs:
        r = {f"t_{x}x": round(t(q, d), 3) for x, d in dirs.items()}
        r["ratio_4x"] = round(r["t_4x"] / r["t_1x"], 2)
        r["ratio_10x"] = round(r["t_10x"] / r["t_1x"], 2)
        r["axis"] = next(iter(axes))
        out[q] = r
        print(q, r, flush=True)

with open(os.path.join(os.path.dirname(_HERE), "SCALING_R11B_AXES.json"), "w") as f:
    json.dump(out, f, indent=1)
print("written")
