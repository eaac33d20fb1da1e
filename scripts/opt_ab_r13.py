"""Interleaved same-session A/B for the r13 optimization rewrites.

Builds the OLD (pre-r13-optimization) and NEW (current registry) plan for
each contested query in ONE warm session and interleaves reps ABABAB…, so
host noise and JIT state hit both variants equally (the r12 drift-A/B
method). Old variants are reconstructed inline below from the pre-edit
code (git history 88b2a92).
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

from pyspark.sql import functions as F  # noqa: E402

from json_parquet_convertor_spark import registry  # noqa: E402
from json_parquet_convertor_spark.session import get_spark  # noqa: E402
from json_parquet_convertor_spark.sources.io import (  # noqa: E402
    load_table,
    spread,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_pairs_copurchase(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


def old_simhash_fingerprint(spark, sf_dir):
    """OLD fingerprint pass only (16 conv(substring) nibble columns +
    64 CASE-vote sums) — the part the r13 rewrite touched."""
    docs = spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    nib = toks.select("doc_id", F.md5("tok").alias("h")).select(
        "doc_id",
        *[
            F.conv(F.substring("h", k + 1, 1), 16, 10)
            .cast("int")
            .alias(f"n{k}")
            for k in range(16)
        ],
    )
    votes = nib.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(f"n{j // 4}"), j % 4).bitwiseAND(
                        F.lit(1)
                    )
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(64)
        ]
    )

    def chunk(c: int):
        bits = [
            F.when(F.col(f"v{8 * c + j}") > 0, F.lit(1 << j)).otherwise(
                F.lit(0)
            )
            for j in range(8)
        ]
        return sum(bits[1:], bits[0]).cast("int")

    return votes.select(
        "doc_id", F.array(*[chunk(c) for c in range(8)]).alias("ch")
    )


def new_simhash_fingerprint(spark, sf_dir):
    from json_parquet_convertor_spark.operators.pipeline import (
        _simhash_chunks,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return _simhash_chunks(docs)


def old_sketch_quantiles(spark, sf_dir):
    li = spread(load_table(spark, sf_dir, "lineitem"))
    ps = [0.25, 0.5, 0.75, 0.95]
    approx = F.percentile_approx("l_extendedprice", ps, 1000).cast(
        "array<double>"
    )
    lo = F.percentile(
        "l_extendedprice", F.array(*[F.lit(p - 0.02) for p in ps])
    )
    hi = F.percentile(
        "l_extendedprice", F.array(*[F.lit(p + 0.02) for p in ps])
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count("l_extendedprice").cast("bigint").alias("n_prices"),
        approx.alias("__a"),
        lo.alias("__lo"),
        hi.alias("__hi"),
    )

    def band(i: int, name: str):
        a = F.col("__a").getItem(i)
        return (
            F.when(F.col("__a").isNull(), F.lit(1))
            .otherwise(
                (
                    (a >= F.col("__lo").getItem(i))
                    & (a <= F.col("__hi").getItem(i))
                ).cast("bigint")
            )
            .alias(name)
        )

    return agg.select(
        "l_returnflag",
        "n_prices",
        band(0, "in_band_q25"),
        band(1, "in_band_q50"),
        band(2, "in_band_q75"),
        band(3, "in_band_q95"),
    )


PAIRS = {
    "pairs_copurchase": (
        old_pairs_copurchase,
        lambda s, d: registry.QUERIES["q_pairs_copurchase"](s, d),
    ),
    "simhash_fingerprint": (
        old_simhash_fingerprint,
        new_simhash_fingerprint,
    ),
    "sketch_quantiles": (
        old_sketch_quantiles,
        lambda s, d: registry.QUERIES["q_agg_sketch_quantiles"](s, d),
    ),
}


def main() -> int:
    reps = int(os.environ.get("AB_REPS", "7"))
    names = sys.argv[1:] or list(PAIRS)
    registry.load_all()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (
        os.cpu_count() or 8
    )
    spark = get_spark(app_name="jpc-opt-ab", cpus=cpus)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm both variants once, untimed
    for name in names:
        old, new = PAIRS[name]
        force(old(spark, SF))
        spark.catalog.clearCache()
        force(new(spark, SF))
        spark.catalog.clearCache()

    for name in names:
        old, new = PAIRS[name]
        ta, tb = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            force(old(spark, SF))
            ta.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(new(spark, SF))
            tb.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(
            json.dumps(
                {
                    "pair": name,
                    "old_median": round(statistics.median(ta), 4),
                    "new_median": round(statistics.median(tb), 4),
                    "old": [round(x, 3) for x in ta],
                    "new": [round(x, 3) for x in tb],
                }
            )
        )
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
