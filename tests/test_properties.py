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
    """HLL estimate within its declared rsd band: the promoted contract
    (r13) emits exact counts + a 0/1 in-band flag, so the twin re-derives
    the raw estimate independently and re-checks the bound itself."""
    from pyspark.sql import functions as F

    from json_parquet_convertor_spark.sources.io import load_table

    rows = registry.QUERIES["q_agg_approx_distinct"](spark, sf_dir).collect()
    assert rows
    raw = {
        r["l_returnflag"]: (r["approx"], r["exact"])
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.05).alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .collect()
    }
    for r in rows:
        assert r["hll_within_rsd"] == 1, r
        approx, exact = raw[r["l_returnflag"]]
        assert r["exact_parts"] == exact
        assert abs(approx - exact) <= max(5, 0.15 * exact), (r, approx)


def test_sketch_quantile_near_exact(spark, sf_dir):
    """Greenwald-Khanna approx median within 1% of the exact median at
    accuracy=1000 (re-derived raw — the promoted r13 contract emits
    in-band flags), and every emitted band flag is 1."""
    from pyspark.sql import functions as F

    from json_parquet_convertor_spark.sources.io import load_table

    rows = registry.QUERIES["q_agg_sketch_quantiles"](spark, sf_dir).collect()
    assert rows
    raw = {
        r["l_returnflag"]: (r["approx"], r["exact"])
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        )
        .collect()
    }
    for r in rows:
        for flag in ("in_band_q25", "in_band_q50", "in_band_q75", "in_band_q95"):
            assert r[flag] == 1, r
        approx, exact = raw[r["l_returnflag"]]
        if exact:
            assert abs(approx - exact) / abs(exact) < 0.01, (r, approx, exact)


def test_hll_union_estimates_near_exact(spark, sf_dir):
    """Per-group DataSketches HLL estimates and the union-merged ALL row
    must land within 5% of exact distinct counts (default lgK=12 gives
    ~1.6% rsd; re-derived raw — the promoted r13 contract emits in-band
    flags), and the union estimate must be >= the largest partial."""
    from pyspark.sql import functions as F

    from json_parquet_convertor_spark.sources.io import load_table

    rows = registry.QUERIES["q_agg_hll_union"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    partials = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = {
        r["event_type"]: r["est"]
        for r in partials.select(
            "event_type", F.hll_sketch_estimate("sk").alias("est")
        ).collect()
    }
    est["ALL"] = (
        partials.agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("est"))
        .collect()[0]["est"]
    )
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    emitted = {r["event_type"]: r for r in rows}
    for k, ex in exact.items():
        assert abs(est[k] - ex) <= max(2, 0.05 * ex), (k, est[k], ex)
        assert emitted[k]["exact_users"] == ex
        assert emitted[k]["within_bound"] == 1, emitted[k]
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


def test_pagerank_mass_conserved_and_bounded(spark, sf_dir):
    """PageRank algebra: every node keeps out-degree >= 2 (no dangling
    mass), so total rank stays ~1 after any number of rounds, and every
    rank is at least the teleport floor (1-d)/n."""
    ranks = registry.QUERIES["q_graph_pagerank"](spark, sf_dir)
    rows = ranks.collect()
    n = len(rows)
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-6, total
    floor = 0.15 / n
    assert all(r["rank"] >= floor - 1e-12 for r in rows)


def test_chunking_covers_every_token_exactly_by_formula(spark, sf_dir):
    """Chunk geometry: per doc, #chunks = floor((n-1)/96)+1, every chunk
    except possibly the last has exactly 128 tokens or runs to the doc
    end, and the last chunk ends exactly at token n."""
    chunks = registry.QUERIES["q_text_chunk"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    got = (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
            F.min("n_chunk_tokens").alias("min_len"),
        )
        .join(docs, "doc_id")
        .collect()
    )
    assert got
    for r in got:
        expect = (r["n"] - 1) // 96 + 1
        assert r["n_chunks"] == expect, r
        assert r["max_idx"] == expect - 1, r
        # smallest chunk is the tail: n - 96*(chunks-1) tokens (<= 128)
        tail = r["n"] - 96 * (expect - 1)
        assert r["min_len"] == min(tail, 128), r


def test_sessionize_gaps_split_and_cohere(spark, sf_dir):
    """Gaps-and-islands algebra: consecutive sessions of one user are
    separated by >= 1800 s (end of k to start of k+1), and every session's
    span is bounded by its event count (no negative durations)."""
    s = registry.QUERIES["q_win_sessionize"](spark, sf_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("session_id")
    g = s.select(
        "user_id",
        "session_id",
        "session_start",
        "session_end",
        F.lag("session_end").over(w).alias("prev_end"),
    ).collect()
    assert g
    for r in g:
        assert r["session_end"] >= r["session_start"], r
        if r["prev_end"] is not None:
            assert r["session_start"] - r["prev_end"] >= 1800, r


def test_bm25_matches_numpy_reference(spark, sf_dir):
    """Recompute BM25 for the winning docs in pure Python from raw token
    counts — the Spark pipeline must agree to 6 dp (catches any silent
    drift in the staged statistics joins)."""
    import math
    from collections import Counter

    top = registry.QUERIES["q_rank_bm25"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    tf_tot = Counter()
    df = Counter()
    for toks in docs.values():
        c = Counter(toks)
        tf_tot.update(c)
        df.update(c.keys())
    qterms = sorted(tf_tot, key=lambda t: (-tf_tot[t], t))[:3]
    n = len(docs)
    avgdl = float(sum(len(t) for t in docs.values())) / n
    for row in top:
        toks = docs[row["doc_id"]]
        c, dl = Counter(toks), float(len(toks))
        score = 0.0
        for t in qterms:
            if c[t] == 0:
                continue
            idf = math.log(1.0 + (float(n) - float(df[t]) + 0.5) / (float(df[t]) + 0.5))
            s = idf * ((c[t] * 2.2) / (c[t] + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl))))
            score += round(s, 8)
        assert abs(score - row["bm25"]) < 1e-6, (row, score)


def test_cms_bounds_hold_against_exact_counts(spark, sf_dir):
    """Count-min guarantees: est >= exact always, and est <= exact + eps*N
    (eps = 2/width = 2/1024) — here asserted deterministically, not just
    w.h.p., since the fixture's key spread keeps collisions far under the
    bound. Probes missing from the table must still satisfy est >= 0."""
    from json_parquet_convertor_spark import registry
    from json_parquet_convertor_spark.sources.io import load_table

    rows = registry.QUERIES["q_agg_sketch_cms"](spark, sf_dir).collect()
    assert len(rows) == 10
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["k"]: r["n"]
        for r in li.filter("l_partkey BETWEEN 1 AND 10")
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        # the promoted r13 contract emits the invariant flags directly;
        # the twin re-derives the exact side independently
        assert r["exact_cnt"] == exact.get(r["probe_key"], 0), r
        assert r["never_under"] == 1, r
        assert r["within_4eps"] == 1, r


def test_linreg_r2_equals_corr_squared(spark, sf_dir):
    """Cross-operator invariant: q_stats_linreg's R² must equal
    q_agg_corr's correlation squared on the same (quantity, price-ticks)
    pairs — two independently-written co-moment pipelines agreeing on a
    derived identity."""
    from json_parquet_convertor_spark import registry

    r2 = {
        r["flag"]: r["r2"]
        for r in registry.QUERIES["q_stats_linreg"](spark, sf_dir).collect()
    }
    corr = {
        r["l_returnflag"]: r["corr_qty_price"]
        for r in registry.QUERIES["q_agg_corr"](spark, sf_dir).collect()
    }
    assert set(r2) == set(corr)
    for flag in r2:
        assert abs(r2[flag] - corr[flag] ** 2) < 5e-4, (
            flag,
            r2[flag],
            corr[flag] ** 2,
        )


def test_bloom_prefilter_candidates_superset_and_bounded(spark, sf_dir):
    """The Bloom stage must pass EVERY true match (no false negatives —
    the correctness half of a Bloom filter's contract) and its false-
    positive volume must stay under ~3x the classic (1-e^{-kn/m})^k bound
    for k=2 hashes. Rebuilds the candidate stage without the exact refine
    to measure it."""
    import math

    from pyspark.sql import functions as F

    from json_parquet_convertor_spark.sources.io import load_table

    m_bits = 1 << 16
    dim = (
        load_table(spark, sf_dir, "supplier")
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            load_table(spark, sf_dir, "region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "ASIA")
        .select("s_suppkey")
    )
    n_keys = dim.count()
    fact = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    true_matches = fact.join(
        dim, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    ).count()

    pos = dim.select(
        F.explode(
            F.array(
                F.pmod(F.xxhash64("s_suppkey", F.lit(1)), F.lit(m_bits)),
                F.pmod(F.xxhash64("s_suppkey", F.lit(2)), F.lit(m_bits)),
            )
        ).alias("pos")
    )
    bloom_set = {r["pos"] for r in pos.distinct().collect()}
    probed = fact.withColumns(
        {
            "p1": F.pmod(F.xxhash64("l_suppkey", F.lit(1)), F.lit(m_bits)),
            "p2": F.pmod(F.xxhash64("l_suppkey", F.lit(2)), F.lit(m_bits)),
        }
    ).collect()
    candidates = sum(
        1 for r in probed if r["p1"] in bloom_set and r["p2"] in bloom_set
    )
    assert candidates >= true_matches  # no false negatives
    fp_rate = (1 - math.exp(-2.0 * n_keys / m_bits)) ** 2
    n_fact = len(probed)
    assert candidates - true_matches <= max(50, 3 * fp_rate * n_fact), (
        candidates,
        true_matches,
        fp_rate,
    )


def test_auc_matches_python_reference(spark, sf_dir):
    """q_stats_auc must equal a from-scratch midrank Mann-Whitney AUC
    over the collected (score, label) pairs — guards the rank-sum
    algebra, which is easy to get subtly wrong (0-based vs 1-based
    midranks shift the result by np/(2*nn))."""
    import collections

    from json_parquet_convertor_spark import registry
    from json_parquet_convertor_spark.sources.io import load_table
    from pyspark.sql import functions as F

    row = registry.QUERIES["q_stats_auc"](spark, sf_dir).collect()[0]
    pairs = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select(
            F.round(F.col("value") * 10000, 0).cast("bigint").alias("v"),
            (F.col("event_type") == "purchase").cast("int").alias("y"),
        )
        .collect()
    )
    pos, neg = collections.Counter(), collections.Counter()
    for r in pairs:
        (pos if r["y"] else neg)[r["v"]] += 1
    np_, nn = sum(pos.values()), sum(neg.values())
    below, rank_sum = 0, 0.0
    for v in sorted(set(pos) | set(neg)):
        g = pos[v] + neg[v]
        rank_sum += pos[v] * (below + (g + 1) / 2.0)
        below += g
    ref = (rank_sum - np_ * (np_ + 1) / 2.0) / (np_ * nn)
    assert row["n_pos"] == np_ and row["n_neg"] == nn
    assert abs(row["auc"] - round(ref, 6)) < 1e-9, (row["auc"], ref)
