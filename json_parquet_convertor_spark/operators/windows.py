"""Window functions (SURVEY.md §2 B5).

Window execution shuffles once on partitionBy keys then sorts within
partitions. Scale notes: never use a global (unpartitioned) window on big
data — every query here partitions by a real key except q_sort_multi's
deliberate rank-capture (on the small customer table). Rank-family outputs
are cast to BIGINT on the Spark side to match DuckDB's window return types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from json_parquet_convertor_spark.registry import query
from json_parquet_convertor_spark.sources.io import load_table


@query(
    "q_win_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
    )


@query(
    "q_win_analytic",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(event_id) OVER w AS first_event,
           LAST_VALUE(event_id) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w_full).alias("last_event"),
    )


@query(
    "q_win_frame_rows",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend,
           CAST(COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS last3_cnt
    FROM orders
    """,
)
def q_win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum over a ROWS frame — decimal-exact so the running totals
    hash-match the oracle at every row."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = w.rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(running)
        .cast("double")
        .alias("running_spend"),
        F.count("*").over(last3).cast("bigint").alias("last3_cnt"),
    )


@query(
    "q_win_frame_range",
    oracle="""
    SELECT user_id, event_id, ts_epoch,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
               PARTITION BY user_id ORDER BY ts_epoch
               RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS day_window_sum
    FROM (
        SELECT user_id, event_id, value,
               CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS ts_epoch
        FROM events
    )
    """,
)
def q_win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over epoch seconds: trailing 24h sum per user — the moving
    value window, a windowed precursor of the streaming sliding window."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        F.unix_timestamp("ts").alias("ts_epoch"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_epoch")
        .rangeBetween(-86400, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts_epoch",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("day_window_sum"),
    )


@query(
    "q_win_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY c.c_custkey
                   ORDER BY o.o_totalprice DESC, o.o_orderkey
               ) AS BIGINT) AS rn
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    ) WHERE rn <= 3
    """,
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the canonical top-k-per-group rewrite
    (window + filter). At 100 TB this beats a self-join formulation by one
    full shuffle; skewed customers are handled by AQE."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
    )
