"""Data-validation operators (B12, round 4): declarative expectation
suites, order-insensitive table checksums, and key-sequence gap audits.

The reference converts blindly — any JSON that deserializes is written
(``convertor/convertor.go:135-154``); the only "validation" is skipping
non-string/float fields (``convertor/convertor.go:139-147``). A lake
built from its output immediately needs the verification layer these
operators provide: did the load produce the rows we expect (checksum),
do the rows satisfy the contract (expectations), and is the key space
complete (gap audit)? These are the dbt-test / Great-Expectations /
audit-publish primitives, expressed as single-pass Spark aggregations.

Cross-engine determinism notes:
- the checksum hashes a canonical string of INTEGER-cast columns only
  (int-to-string rendering is identical in Spark and DuckDB; doubles and
  timestamps are canonicalized through bigint first);
- the 64-bit digest twin is Spark ``conv(byte-reversed md5 hex, 16, 10)``
  vs DuckDB ``md5_number_lower`` — verified bit-identical (little-endian
  interpretation of digest bytes 8..15);
- expectation counts are plain conditional aggregates — no floats at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from json_parquet_convertor_spark.exact import fsec
from json_parquet_convertor_spark.registry import query
from json_parquet_convertor_spark.sources.io import load_table, spread

# ---------------------------------------------------------------------------
# declarative expectation suite (dbt-test / Great-Expectations shape)
# ---------------------------------------------------------------------------


@query(
    "q_qc_expectations",
    oracle="""
    WITH o AS (
        SELECT COUNT(*) AS n,
               COUNT(*) FILTER (WHERE o_custkey IS NULL) AS v_null,
               COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_uniq,
               COUNT(*) FILTER (
                   WHERE o_orderstatus NOT IN ('F', 'O', 'P')
                      OR o_orderstatus IS NULL) AS v_vals,
               COUNT(*) FILTER (
                   WHERE o_totalprice IS NULL OR o_totalprice <= 0) AS v_pos
        FROM orders
    ),
    l AS (
        SELECT COUNT(*) AS n,
               COUNT(*) FILTER (
                   WHERE l_discount < 0 OR l_discount > 0.1
                      OR l_discount IS NULL) AS v_disc,
               COUNT(*) FILTER (
                   WHERE l_quantity < 1 OR l_quantity > 50
                      OR l_quantity IS NULL) AS v_qty
        FROM lineitem
    ),
    fk AS (
        SELECT (SELECT COUNT(*) FROM lineitem) AS n,
               COUNT(*) AS v
        FROM lineitem WHERE l_orderkey NOT IN (
            SELECT o_orderkey FROM orders)
    )
    SELECT rule, n_checked, n_violations, n_violations = 0 AS passed
    FROM (
        SELECT 'orders.o_custkey.not_null' AS rule,
               n AS n_checked, v_null AS n_violations FROM o
        UNION ALL
        SELECT 'orders.o_orderkey.unique', n, v_uniq FROM o
        UNION ALL
        SELECT 'orders.o_orderstatus.accepted_values', n, v_vals FROM o
        UNION ALL
        SELECT 'orders.o_totalprice.positive', n, v_pos FROM o
        UNION ALL
        SELECT 'lineitem.l_discount.range_0_01', n, v_disc FROM l
        UNION ALL
        SELECT 'lineitem.l_quantity.range_1_50', n, v_qty FROM l
        UNION ALL
        SELECT 'lineitem.l_orderkey.fk_orders', n, v FROM fk
    )
    """,
)
def q_qc_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract suite: one output row per expectation
    (not-null, unique, accepted-values, positive-amount, numeric-range,
    foreign-key) with checked/violation counts and a pass flag — the
    audit step a pipeline runs before publishing a partition, and the
    check the reference never performs on what it writes
    (``convertor/convertor.go:135-154`` converts anything that parses).

    Scale design: all four orders rules come from ONE full scan
    (conditional aggregates fused into a single partial-agg pipeline —
    uniqueness is count minus approx-free exact distinct, which shuffles
    only the 8-byte key), both lineitem rules from one more, and the FK
    check is a left-anti equi-join on the join key both tables would
    already be bucketed by in a real lake. Rule rows are assembled with
    a stack() unpivot of the two 1-row aggregates — no driver collect;
    the whole suite is 3 jobs regardless of data size."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    o_agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("o_custkey").isNull()).alias("v_null"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("v_uniq"),
        F.count_if(
            ~F.col("o_orderstatus").isin("F", "O", "P")
            | F.col("o_orderstatus").isNull()
        ).alias("v_vals"),
        F.count_if(
            F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
        ).alias("v_pos"),
    )
    l_agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(
            (F.col("l_discount") < 0)
            | (F.col("l_discount") > 0.1)
            | F.col("l_discount").isNull()
        ).alias("v_disc"),
        F.count_if(
            (F.col("l_quantity") < 1)
            | (F.col("l_quantity") > 50)
            | F.col("l_quantity").isNull()
        ).alias("v_qty"),
    )
    orphans = li.join(
        o.select("o_orderkey"),
        li["l_orderkey"] == o["o_orderkey"],
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("v"))
    li_n = li.agg(F.count(F.lit(1)).alias("n"))

    o_rules = o_agg.selectExpr(
        """stack(4,
            'orders.o_custkey.not_null', v_null,
            'orders.o_orderkey.unique', v_uniq,
            'orders.o_orderstatus.accepted_values', v_vals,
            'orders.o_totalprice.positive', v_pos
        ) AS (rule, n_violations)""",
        "n AS n_checked",
    )
    l_rules = l_agg.selectExpr(
        """stack(2,
            'lineitem.l_discount.range_0_01', v_disc,
            'lineitem.l_quantity.range_1_50', v_qty
        ) AS (rule, n_violations)""",
        "n AS n_checked",
    )
    fk_rule = li_n.crossJoin(orphans).select(
        F.lit("lineitem.l_orderkey.fk_orders").alias("rule"),
        F.col("v").alias("n_violations"),
        F.col("n").alias("n_checked"),
    )
    rules = o_rules.unionByName(l_rules).unionByName(fk_rule)
    return rules.select(
        "rule",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


# ---------------------------------------------------------------------------
# order-insensitive table checksum (audit-publish fingerprint)
# ---------------------------------------------------------------------------


@query(
    "q_checksum_table",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(md5_number_lower(concat_ws('|',
               l_orderkey, l_linenumber,
               CAST(trunc(l_quantity) AS BIGINT),
               CAST(floor(epoch(CAST(l_shipdate AS TIMESTAMP))) AS BIGINT)
           )) AS DECIMAL(38,0))) % 1000000000000000000 AS BIGINT)
               AS row_checksum
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_checksum_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint per partition group: SUM of
    the lower 64 bits of each row's md5 over a canonical column string.
    Two engines (or two loads, or source-vs-replica) agree on the
    checksum iff they hold exactly the same multiset of rows — the
    cheapest cross-system reconciliation there is, and the natural
    post-hoc audit for a converter like the reference (did the parquet
    we wrote contain exactly the rows we read?).

    Cross-engine twin: DuckDB's ``md5_number_lower`` is the
    little-endian interpretation of digest bytes 8..15; Spark reproduces
    it by byte-reversing md5 hex chars 17..32 before ``conv(_, 16, 10)``
    (verified bit-identical). The canonical string uses only
    bigint-rendered columns — int-to-string is locale/engine stable
    where double/timestamp rendering is not.

    Scale design: hashing is per-row JVM codegen (md5 + substrings, no
    Python) spread() across all slots (md5 is the CPU hot spot; a
    single-file fixture would serialize it), and SUM over decimal(38)
    is a map-side partial aggregate —
    the shuffle carries one 16-byte accumulator per (group, partition),
    so the checksum of 100 TB moves kilobytes. Addition is commutative,
    which is exactly why the fingerprint is row-order- and
    partitioning-independent. The exact 38-digit sum is folded mod 10^18
    into a BIGINT only at the very end (full precision travels through
    the aggregation; the fold keeps the output type stable across
    engines at a 1e-18 collision rate)."""
    li = spread(load_table(spark, sf_dir, "lineitem"))
    canonical = F.concat_ws(
        "|",
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.col("l_quantity").cast("bigint"),
        fsec("l_shipdate"),
    )
    h = F.md5(canonical)
    # little-endian lower 64 bits: hex byte pairs 31,29,..,17 reversed
    rev = F.concat(*[F.substring(h, 31 - 2 * i, 2) for i in range(8)])
    low64 = F.conv(rev, 16, 10).cast("decimal(20,0)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(low64) % F.lit(10**18))
            .cast("bigint")
            .alias("row_checksum"),
        )
    )


# ---------------------------------------------------------------------------
# key-sequence gap audit (completeness check over an id space)
# ---------------------------------------------------------------------------


@query(
    "q_seq_gaps",
    oracle="""
    WITH k AS (
        SELECT o_orderkey AS k,
               lead(o_orderkey) OVER (ORDER BY o_orderkey) AS nk
        FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT k + 1 AS gap_start,
           nk - 1 AS gap_end,
           nk - k - 1 AS gap_len
    FROM k WHERE nk - k > 1
    ORDER BY gap_len DESC, gap_start
    LIMIT 100
    """,
)
def q_seq_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-space completeness audit: the largest missing runs in the
    finished-order key sequence (consecutive present keys with
    ``next - key > 1`` bound a gap). The "did every message arrive?"
    question for a queue-fed converter like the reference — SQS
    redelivers but also drops to DLQ, and the orderkey gaps are how the
    lake notices (``convertor/convertor.go:46-54`` retries; nothing
    audits).

    Scale design: a single global lead() window would serialize the key
    stream through one task. Instead keys are bucketed (``key div B``),
    lead runs WITHIN buckets (shuffle key = bucket, perfectly parallel),
    and the only cross-bucket work is one lead over the per-bucket
    (min, max) summary — |keys|/B rows, with B sized so the summary fits
    one task (B=4096 here; at 100 TB pick B~2^20 or recurse the same
    trick once more — each level divides by B). In-bucket gaps and
    boundary gaps (bucket max → next bucket's min) union to exactly the
    global gap set because buckets partition the key line in order."""
    o = load_table(spark, sf_dir, "orders")
    bucket_size = 4096
    # integer division: float `/` rounds above 2^53 and can misplace a
    # boundary key, breaking the buckets-tile-the-key-line invariant
    keys = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("k"),
        F.expr(f"o_orderkey div {bucket_size}").alias("b"),
    )
    in_bucket = Window.partitionBy("b").orderBy("k")
    within = (
        keys.withColumn("nk", F.lead("k").over(in_bucket))
        .filter(F.col("nk") - F.col("k") > 1)
        .select("k", "nk")
    )
    # per-bucket envelope; one tiny window over |keys|/B summary rows
    summary = keys.groupBy("b").agg(
        F.min("k").alias("kmin"), F.max("k").alias("kmax")
    )
    across = (
        summary.withColumn(
            "next_min", F.lead("kmin").over(Window.orderBy("b"))
        )
        .filter(F.col("next_min") - F.col("kmax") > 1)
        .select(F.col("kmax").alias("k"), F.col("next_min").alias("nk"))
    )
    gaps = within.unionByName(across).select(
        (F.col("k") + 1).alias("gap_start"),
        (F.col("nk") - 1).alias("gap_end"),
        (F.col("nk") - F.col("k") - 1).alias("gap_len"),
    )
    return gaps.orderBy(F.desc("gap_len"), "gap_start").limit(100)


# ---------------------------------------------------------------------------
# k-anonymity audit (quasi-identifier re-identification risk)
# ---------------------------------------------------------------------------


@query(
    "q_privacy_kanon",
    oracle="""
    WITH q AS (
        SELECT c_nationkey,
               c_mktsegment,
               CAST(least(floor(c_acctbal / 1000), 9) AS BIGINT)
                   AS bal_band,
               COUNT(*) AS grp
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT CAST(MIN(grp) AS BIGINT) AS k_anonymity,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(COUNT(*) FILTER (WHERE grp < 5) AS BIGINT)
               AS classes_below_5,
           CAST(COALESCE(SUM(grp) FILTER (WHERE grp < 5), 0) AS BIGINT)
               AS customers_at_risk,
           floor(CAST(SUM(grp * grp) AS DOUBLE)
                 / (CAST(SUM(grp) AS DOUBLE) * SUM(grp))
                 * 10000 + 0.5) / 10000 AS reid_collision_rate
    FROM q
    """,
)
def q_privacy_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer table: treat (nation, market
    segment, account-balance band) as the quasi-identifier, measure the
    smallest equivalence class (the dataset's k), how many classes fall
    below k=5, how many customers sit in them, and the expected
    re-identification collision rate (sum p_i^2, the probability two
    random records share a class) — the release gate privacy review
    runs before publishing "anonymized" data, and exactly what the
    reference's field-dropping converter (convertor/convertor.go:139-147
    silently drops unknown fields, which is NOT anonymization) cannot
    answer.

    Scale design: one scan → groupBy the quasi-identifier tuple
    (map-side partials; class count is bounded by the QI domain, here
    25 x 5 x 10), then a single 1-row rollup over the class table. The
    balance band uses integer-floor banding (the q_agg_hist2d grid
    rule). All outputs derive from exact integer counts; the collision
    rate divides exact sums in the same operation order on both
    engines."""
    c = load_table(spark, sf_dir, "customer")
    band = F.least(F.floor(F.col("c_acctbal") / 1000), F.lit(9)).cast(
        "bigint"
    )
    q = c.groupBy(
        "c_nationkey", "c_mktsegment", band.alias("bal_band")
    ).agg(F.count(F.lit(1)).alias("grp"))
    return q.agg(
        F.min("grp").cast("bigint").alias("k_anonymity"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.count_if(F.col("grp") < 5).cast("bigint").alias("classes_below_5"),
        F.coalesce(
            F.sum(F.when(F.col("grp") < 5, F.col("grp"))), F.lit(0)
        )
        .cast("bigint")
        .alias("customers_at_risk"),
        (
            F.floor(
                F.sum(F.col("grp") * F.col("grp")).cast("double")
                / (F.sum("grp").cast("double") * F.sum("grp"))
                * 10000
                + 0.5
            )
            / 10000
        ).alias("reid_collision_rate"),
    )


def md5_low64(col: F.Column) -> F.Column:
    """Lower 64 bits of md5 as an unsigned decimal — the Spark twin of
    DuckDB's ``md5_number_lower`` (little-endian digest bytes 8..15;
    byte-reverse the hex tail, then base-16 conv). Shared by the
    checksum and feature-hashing operators."""
    h = F.md5(col)
    rev = F.concat(*[F.substring(h, 31 - 2 * i, 2) for i in range(8)])
    return F.conv(rev, 16, 10).cast("decimal(20,0)")
