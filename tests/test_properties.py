"""Property-style invariants (SURVEY §5 strategy 5).

Cheap cross-operator algebraic checks that hold for ANY data: set-operation
cardinalities, join row bounds, dedup idempotence. These catch a class of
bug the oracle compare can miss (both engines wrong the same way is
impossible for an arithmetic identity).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from json_parquet_convertor_spark import registry
from json_parquet_convertor_spark.sources.io import load_table

registry.load_all()


def test_union_all_count_is_sum(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    got = registry.QUERIES["q_union_all"](spark, sf_dir).count()
    assert got == orders.count() + cust.count()


def test_intersect_subset_of_both(spark, sf_dir):
    inter = registry.QUERIES["q_intersect"](spark, sf_dir)
    cust_keys = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    orders_keys = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    assert inter.exceptAll(cust_keys.distinct()).count() == 0
    assert inter.exceptAll(orders_keys.distinct()).count() == 0


def test_except_plus_intersect_partitions_left(spark, sf_dir):
    """|A \\ B| + |A ∩ B| == |A| for distinct sets."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("custkey"))
        .distinct()
    )
    big_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    diff = cust.subtract(big_orders).count()
    inter = cust.intersect(big_orders).count()
    assert diff + inter == cust.count()


def test_semi_plus_anti_partitions_left(spark, sf_dir):
    """Semi-join and anti-join on the same condition partition the left."""
    cust = load_table(spark, sf_dir, "customer")
    semi = registry.QUERIES["q_join_semi"](spark, sf_dir).count()
    anti_cond = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    anti = cust.join(
        anti_cond, cust.c_custkey == anti_cond.o_custkey, "left_anti"
    ).count()
    assert semi + anti == cust.count()


def test_inner_join_bounded_by_key_product(spark, sf_dir):
    """|A ⋈ B| <= |A| * max multiplicity of B's key (here: inner join on a
    unique customer key can't exceed the orders row count)."""
    got = registry.QUERIES["q_join_inner"](spark, sf_dir).count()
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    )
    assert got <= orders.count()


def test_dedup_exact_idempotent_and_complete(spark, sf_dir):
    out = registry.QUERIES["q_dedup_exact"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # every distinct text is represented exactly once
    assert out.count() == docs.select("text").distinct().count()
    # copies add back up to the corpus
    total = out.agg(F.sum("n_copies")).collect()[0][0]
    assert total == docs.count()


def test_split_partitions_corpus(spark, sf_dir):
    """train/val/test counts sum to the corpus; assignment is total."""
    out = registry.QUERIES["q_sample_split"](spark, sf_dir)
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "documents").count()


def test_shards_are_balanced(spark, sf_dir):
    """No shard holds more than 2x the mean (the mix constant decorrelates
    shard from id ranges)."""
    rows = registry.QUERIES["q_corpus_shard"](spark, sf_dir).collect()
    counts = [r["n_docs"] for r in rows]
    assert len(counts) == 8
    assert max(counts) <= 2 * (sum(counts) / len(counts))


def test_approx_distinct_within_rsd(spark, sf_dir):
    """HLL estimate within its declared 2% rsd (5 sigma slack)."""
    for r in registry.QUERIES["q_agg_approx_distinct"](spark, sf_dir).collect():
        assert abs(r["approx_parts"] - r["exact_parts"]) <= max(
            5, 0.1 * r["exact_parts"]
        )


def test_sketch_quantile_near_exact(spark, sf_dir):
    """Greenwald-Khanna approx median within 1% of the exact median at
    accuracy=1000."""
    for r in registry.QUERIES["q_agg_sketch_quantiles"](spark, sf_dir).collect():
        rel = abs(r["approx_median"] - r["exact_median"]) / r["exact_median"]
        assert rel < 0.01, r


def test_hll_union_estimates_near_exact(spark, sf_dir):
    """Per-group DataSketches HLL estimates and the union-merged ALL row
    must land within 5% of exact distinct counts (default lgK=12 gives
    ~1.6% rsd), and the union must be >= the largest partial."""
    from pyspark.sql import functions as F

    from json_parquet_convertor_spark.sources.io import load_table

    est = {
        r["event_type"]: r["est_users"]
        for r in registry.QUERIES["q_agg_hll_union"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    for k, ex in exact.items():
        assert abs(est[k] - ex) <= max(2, 0.05 * ex), (k, est[k], ex)
    assert est["ALL"] >= max(v for k, v in est.items() if k != "ALL")


def test_freq_items_threshold_is_exact(spark, sf_dir):
    """Every returned heavy hitter meets the 0.5% support threshold, and
    sum-of-returned-frequencies never exceeds the corpus token total."""
    from pyspark.sql import functions as F

    from json_parquet_convertor_spark.sources.io import load_table

    rows = registry.QUERIES["q_agg_freq_items"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(
        F.explode(F.split("text", " ")).alias("t")
    ).count()
    assert rows, "no heavy hitters found"
    for r in rows:
        assert r["freq"] >= total * 0.005
    assert sum(r["freq"] for r in rows) <= total
