"""Scale probe on GENERATED (distribution-different) data — judge r4 #4.

scale_probe.py's 4x replica preserves the sf0.1 key distributions exactly;
this probe instead generates two fresh datasets with scripts/gen_fixtures.py
(seed 777, power-law skew, sf-scaled NDVs) at sf0.1 and sf0.3 and measures,
for the top-N most expensive queries of the committed bench:

- ratio_3x   = t(gen sf0.3) / t(gen sf0.1)   -> scale behavior on skewed,
  NDV-growing data (healthy: <= 3x data growth + fixed overhead; the 6x
  threshold from scale_probe.py marks suspects, rechecked with 3 reps);
- ratio_dist = t(gen sf0.1) / t(driver sf0.1) -> pure distribution
  sensitivity at equal nominal scale (catches plans whose cost hides in
  the driver fixture's uniformity, e.g. a broadcast sized to a uniform
  NDV or a join balanced only because keys are unskewed).

Usage: python scripts/scale_probe_gen.py [--top 20] [--threshold 6.0]
Writes SCALING_GEN.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (package import)
sys.path.insert(0, _HERE)  # scripts/ itself, so `python -m` / external
# importers resolve the sibling module too (not just direct invocation)

from gen_fixtures import build  # noqa: E402  (scripts/ sibling)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time(spark, fn, sf_dir, reps=1):
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        samples.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    return statistics.median(samples)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--threshold", type=float, default=6.0)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--sf-small", type=float, default=0.1)
    ap.add_argument("--sf-big", type=float, default=0.3)
    ap.add_argument("--out", default="SCALING_GEN.json")
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    from json_parquet_convertor_spark import registry
    from json_parquet_convertor_spark.session import get_spark

    registry.load_all()
    import glob

    bench_files = sorted(
        glob.glob(os.path.join(here, "BENCH_FULL*.json")),
        key=os.path.getmtime,
    )
    if not bench_files:
        print("no BENCH_FULL*.json found — run bench.py first",
              file=sys.stderr)
        return 1
    bench = json.load(open(bench_files[-1]))  # newest round's costs
    # bench["queries"] is sorted descending by cost already
    top = [n for n in bench["queries"] if n in registry.QUERIES][: args.top]

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or 32
    spark = get_spark(app_name="jpc-scale-probe-gen", cpus=cpus)
    tmp = os.environ.get("TMPDIR", "/tmp")
    gen01 = os.path.join(tmp, f"jpc_genfix_sf{args.sf_small}")
    gen03 = os.path.join(tmp, f"jpc_genfix_sf{args.sf_big}")
    for sf, dst in ((args.sf_small, gen01), (args.sf_big, gen03)):
        if not os.path.exists(os.path.join(dst, "embeddings.parquet")):
            build(spark, dst, sf)

    _force(registry.QUERIES["q_agg_groupby"](spark, args.base))  # warmup

    out: dict[str, dict] = {}
    for name in top:
        fn = registry.QUERIES[name]
        try:
            t_drv = _time(spark, fn, args.base, args.reps)
            t_g1 = _time(spark, fn, gen01, args.reps)
            t_g3 = _time(spark, fn, gen03, args.reps)
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc!r}", file=sys.stderr)
            out[name] = {"error": repr(exc)[:200]}
            continue
        out[name] = {
            "t_driver_base": round(t_drv, 3),
            f"t_gen_sf{args.sf_small}": round(t_g1, 3),
            f"t_gen_sf{args.sf_big}": round(t_g3, 3),
            "ratio_3x": round(t_g3 / t_g1, 2) if t_g1 > 0 else None,
            "ratio_dist": round(t_g1 / t_drv, 2) if t_drv > 0 else None,
        }
        print(
            f"{name}: drv {t_drv:.2f}s  gen.1 {t_g1:.2f}s  "
            f"gen.3 {t_g3:.2f}s  x3={out[name]['ratio_3x']}  "
            f"dist={out[name]['ratio_dist']}",
            file=sys.stderr,
        )

    suspects = [
        n for n, v in out.items()
        if v.get("ratio_3x") and v["ratio_3x"] > args.threshold
    ]
    for name in suspects:
        fn = registry.QUERIES[name]
        t_g1 = _time(spark, fn, gen01, reps=3)
        t_g3 = _time(spark, fn, gen03, reps=3)
        out[name]["ratio_3x_r3"] = round(t_g3 / t_g1, 2)
        print(f"RECHECK {name}: x{out[name]['ratio_3x_r3']}", file=sys.stderr)
    confirmed = [
        n for n in suspects if out[n]["ratio_3x_r3"] > args.threshold
    ]

    result = {
        "generator": "scripts/gen_fixtures.py seed=777",
        "sf_small": args.sf_small,
        "sf_big": args.sf_big,
        "threshold": args.threshold,
        "suspects": {n: out[n] for n in confirmed},
        "queries": out,
    }
    with open(os.path.join(here, args.out), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({
        "n": len(out),
        "suspects": {n: out[n].get("ratio_3x_r3") for n in confirmed},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
