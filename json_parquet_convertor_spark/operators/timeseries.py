"""Time-series repair and proximity operators (B12, round 4).

The reference stops at converting one JSON record per message
(``convertor/convertor.go:59-184``); a lake of its parquet output with
event timestamps immediately needs the time-series toolbox: gap FILLING
with interpolated values (q_time_spine zero-fills; sensors and revenue
series need linear interpolation instead), rolling robust statistics
(median, which ignores spikes that wreck a rolling mean), and
nearest-event joins (the bidirectional generalization of q_join_asof —
"which click is closest in time to this purchase, before OR after").

Determinism ground rules (registry docstring): daily sums go through the
decimal-exact helpers; interpolation arithmetic is written with the SAME
operation order in the Spark plan and the DuckDB oracle so the doubles
are bit-identical before the final 4-dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from json_parquet_convertor_spark.exact import dsum, fday, fsec
from json_parquet_convertor_spark.registry import query
from json_parquet_convertor_spark.sources.io import load_table

# ---------------------------------------------------------------------------
# gap-capped per-user linear interpolation
# ---------------------------------------------------------------------------

# longest run of missing days a straight line may fill; gaps beyond this
# stay unfilled, bounding output by O(observations x cap) however dirty
# the timestamps (the oracle interpolates this + 1 — day-delta form — so
# the two engines can never drift when the constant is edited)
_MAX_GAP_DAYS = 45


@query(
    "q_time_interpolate",
    oracle=f"""
    WITH p AS (
        SELECT user_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
                   AS day,
               value
        FROM events WHERE event_type = 'purchase'
    ),
    daily AS (
        SELECT user_id, day,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
        FROM p GROUP BY 1, 2
    ),
    nx AS (
        SELECT user_id, day, v,
               lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nd,
               lead(v)   OVER (PARTITION BY user_id ORDER BY day) AS nv
        FROM daily
    ),
    g AS (
        SELECT user_id, day, v, nd, nv,
               unnest(generate_series(
                   day,
                   CASE WHEN nd IS NOT NULL AND nd - day <= {_MAX_GAP_DAYS + 1}
                        THEN nd - 1 ELSE day END
               )) AS d
        FROM nx
    )
    SELECT user_id, d AS day,
           floor((CASE WHEN d = day THEN v
                  ELSE v + (nv - v) * (CAST(d - day AS DOUBLE)
                                       / CAST(nd - day AS DOUBLE))
                  END) * 10000 + 0.5) / 10000 AS v_filled,
           (d <> day) AS interpolated
    FROM g
    """,
)
def q_time_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-capped linear interpolation of each user's daily purchase
    series: observed days pass through; a gap of at most _MAX_GAP_DAYS
    missing days between two observations fills with the straight line
    between them; longer gaps stay unfilled (no rows) — the imputation
    step forecast inputs and per-entity sensor series need, where
    q_time_spine's zero-fill would be a lie ("no reading" is not
    "reading = 0"), and interpolating across a months-long outage would
    be a different lie.

    Spark-first plan: NO date spine and NO fill windows at all — events
    collapse to per-(user, day) sums (decimal-exact), ONE lead() window
    pass attaches the next observation, and `sequence`+`explode` generates
    exactly the gap days each pair owns. One shuffle on user_id, O(1)
    window state, zero joins.

    Scale design: output (and the generate step) is bounded by
    O(observations x _MAX_GAP_DAYS) — a DATA-proportional bound. The
    previous global-bounds spine was SPAN-proportional: one dirty
    2304-dated event (the --dates fixture axis plants exactly those) made
    every user's series ~147k days — 21M rows from a 60k-row input at
    sf0.01, and the forward-fill's CURRENT ROW..UNBOUNDED FOLLOWING frame
    (Spark recomputes that aggregate per row, O(n^2) per partition) turned
    one task into an hour. At 100 TB one bad timestamp would do the same
    to a 1000-executor job; the gap cap makes dirty dates cost O(cap)
    rows instead. Interpolation arithmetic mirrors the oracle
    operation-for-operation: v + (nv - v) * ((d-day)/(nd-day)), so
    doubles are bit-identical before the 4-dp quantization."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        fday("ts").alias("day"),
        "value",
    )
    daily = p.groupBy("user_id", "day").agg(dsum("value").alias("v"))
    w = Window.partitionBy("user_id").orderBy("day")
    nx = daily.select(
        "user_id",
        "day",
        "v",
        F.lead("day").over(w).alias("nd"),
        F.lead("v").over(w).alias("nv"),
    )
    # emit the observed day, plus the gap days up to the next observation
    # when the gap fits the cap (nd - day <= cap + 1 missing-day bound)
    end = F.when(
        F.col("nd").isNotNull()
        & (F.col("nd") - F.col("day") <= _MAX_GAP_DAYS + 1),
        F.col("nd") - 1,
    ).otherwise(F.col("day"))
    g = nx.select(
        "user_id",
        "day",
        "v",
        "nd",
        "nv",
        F.explode(F.sequence(F.col("day"), end)).alias("d"),
    )
    lerp = F.col("v") + (F.col("nv") - F.col("v")) * (
        (F.col("d") - F.col("day")).cast("double")
        / (F.col("nd") - F.col("day")).cast("double")
    )
    filled = F.when(F.col("d") == F.col("day"), F.col("v")).otherwise(lerp)
    # floor(x*1e4 + 0.5)/1e4 instead of round(): a lerp between two 4-dp
    # values can land EXACTLY on a .00005 boundary, where the engines'
    # round() conventions disagree; this expression is computed on
    # bit-identical doubles identically in both.
    return g.select(
        "user_id",
        F.col("d").alias("day"),
        (F.floor(filled * 10000 + 0.5) / 10000).alias("v_filled"),
        (F.col("d") != F.col("day")).alias("interpolated"),
    )


# ---------------------------------------------------------------------------
# rolling exact median
# ---------------------------------------------------------------------------


@query(
    "q_win_rolling_median",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
                   AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
        FROM events GROUP BY 1, 2
    ),
    w AS (
        -- list_filter strips NULL daily sums (a day whose only values
        -- were NULL): Spark's collect_list DROPS NULLs while DuckDB's
        -- list() keeps them, shifting both the length and the middle —
        -- caught only when the --nulls and --dates axes compose (a NULL
        -- singleton dirty day)
        SELECT event_type, day,
               list_sort(list_filter(list(sum_v) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
               ), x -> x IS NOT NULL)) AS l
        FROM daily
    )
    SELECT event_type, day,
           floor(CASE WHEN len(l) = 0 THEN NULL
                      WHEN len(l) % 2 = 1
                      THEN l[(len(l) + 1) // 2]
                      ELSE (l[len(l) // 2] + l[len(l) // 2 + 1]) / 2
                 END * 10000 + 0.5) / 10000 AS med7
    FROM w
    """,
)
def q_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling MEDIAN of each event type's daily value total
    — the robust-statistics twin of a rolling mean: one spiky day moves a
    mean for a week but leaves the median untouched, which is why SLO
    dashboards and anomaly baselines prefer it.

    COUNT/SUM windows stream in O(1) state; an exact median window cannot
    (Spark rejects `median` with a window frame outright), so the frame
    materializes as a sorted ≤7-element list per row and the median is
    read off explicitly — odd count takes the middle element, even count
    averages the two middle ones with the SAME (a + b) / 2 expression in
    the oracle, so the doubles agree bit-for-bit before rounding instead
    of trusting two engines' internal quantile interpolation to match.

    Scale design: the window input is the DAILY table (|event_types| x
    |days| rows), never raw events — the heavy reduction happened in the
    decimal-exact groupBy. One shuffle on event_type, sorted frames after.
    For wide frames (e.g. trailing 10k events) swap exact median for
    approx_percentile sketch state; the plan shape is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        fday("ts").alias("day"),
    ).agg(dsum("value").alias("sum_v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    # size(l) = 0 (a window of only NULL daily sums — collect_list skips
    # them, matching the oracle's list_filter) must yield NULL, not an
    # ANSI element_at(l, 0) error
    med = F.expr(
        "CASE WHEN size(l) = 0 THEN CAST(NULL AS DOUBLE) "
        "WHEN size(l) % 2 = 1 "
        "THEN element_at(l, CAST((size(l) + 1) DIV 2 AS INT)) "
        "ELSE (element_at(l, CAST(size(l) DIV 2 AS INT)) "
        "      + element_at(l, CAST(size(l) DIV 2 + 1 AS INT))) / 2 END"
    )
    return daily.select(
        "event_type",
        "day",
        F.sort_array(F.collect_list("sum_v").over(w)).alias("l"),
    ).select(
        "event_type",
        "day",
        # same boundary-safe quantization as q_time_interpolate: the mean
        # of two 4-dp daily sums can sit exactly on a .00005 boundary
        (F.floor(med * 10000 + 0.5) / 10000).alias("med7"),
    )


# ---------------------------------------------------------------------------
# nearest-event join (bidirectional as-of)
# ---------------------------------------------------------------------------


@query(
    "q_join_nearest",
    oracle="""
    -- linear union-merge twin of the per-purchase LATERAL top-1 (which
    -- materializes every purchase x same-user click pair — 218M at gen
    -- sf1.0, 60+ GB under the window sort): clicks and purchases merge
    -- into one per-user stream; a running MAX carries the nearest
    -- at-or-before click, a running MIN the nearest after. The click's
    -- (epoch_us, event_id) packs into one hugeint — backward negates
    -- event_id against 1e19-1 so MAX realizes (max ts, then MIN id),
    -- forward keeps it raw so MIN realizes (min ts, then min id) —
    -- reproducing ORDER BY delta_us, c.ts, c.event_id exactly: equal
    -- |delta| prefers the smaller c.ts, i.e. the backward click
    WITH e0 AS (
        -- pack guard: the 1e19 field width exceeds every representable
        -- BIGINT event_id (--bigid plants ~9.1e15 snowflake ids, which
        -- overflowed the old 1e10 field); only a NEGATIVE id still
        -- breaks the pack, and it must ERROR loudly, not mis-tie-break
        -- silently (r7 verdict #3)
        SELECT user_id, ts, event_type,
               CASE WHEN event_id >= 0 THEN event_id
                    ELSE CAST(error('q_join_nearest oracle: negative '
                         || 'event_id ' || event_id || ' breaks the pack')
                         AS BIGINT)
               END AS event_id
        FROM events WHERE event_type IN ('purchase', 'click')
    ),
    u AS (
        -- the pack SHIFTS epoch_us positive by 1e17 before multiplying:
        -- DuckDB's // truncates toward zero and % follows the dividend
        -- sign, so a NEGATIVE packed value (pre-1970 ts — the --dates
        -- axis plants 1902 events) would decode off-by-one with a
        -- negative "event_id". The shift keeps packing order-preserving
        -- and makes every decode operate on nonnegative hugeints; the
        -- guard errors loudly if a timestamp ever escapes the budget
        SELECT user_id,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) BETWEEN
                         -100000000000000000 AND 100000000000000000
                    THEN epoch_us(CAST(ts AS TIMESTAMP))
                    ELSE CAST(error('q_join_nearest oracle: epoch_us '
                         'outside pack shift 1e17') AS BIGINT)
               END AS us,
               event_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
               CASE WHEN event_type = 'click'
                    THEN (CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS HUGEINT)
                          + 100000000000000000)
                         * 10000000000000000000
                         + (9999999999999999999 - event_id) END AS pb,
               CASE WHEN event_type = 'click'
                    THEN (CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS HUGEINT)
                          + 100000000000000000)
                         * 10000000000000000000 + event_id END AS pf
        FROM e0
    ),
    m AS (
        SELECT user_id, us, event_id, is_p,
               max(pb) OVER (PARTITION BY user_id ORDER BY us, is_p
                             ROWS UNBOUNDED PRECEDING) AS bb,
               min(pf) OVER (PARTITION BY user_id ORDER BY us, is_p
                             ROWS BETWEEN 1 FOLLOWING
                                      AND UNBOUNDED FOLLOWING) AS bf
        FROM u
    ),
    d AS (
        SELECT event_id AS purchase_id,
               CAST(9999999999999999999 - (bb % 10000000000000000000)
                    AS BIGINT) AS eid_b,
               us - (CAST(bb // 10000000000000000000 AS BIGINT)
                     - 100000000000000000) AS delta_b,
               CAST(bf % 10000000000000000000 AS BIGINT) AS eid_f,
               (CAST(bf // 10000000000000000000 AS BIGINT)
                - 100000000000000000) - us AS delta_f
        FROM m WHERE is_p = 1
    )
    SELECT purchase_id,
           CASE WHEN delta_b IS NULL AND delta_f IS NULL THEN NULL
                WHEN delta_f IS NULL OR delta_b <= delta_f THEN eid_b
                ELSE eid_f END AS click_id,
           CASE WHEN delta_b IS NULL AND delta_f IS NULL THEN NULL
                WHEN delta_f IS NULL OR delta_b <= delta_f THEN delta_b
                ELSE delta_f END AS delta_us
    FROM d
    """,
)
def q_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event join: each purchase matched to the CLOSEST click of
    the same user in time, before or after — the bidirectional
    generalization of q_join_asof (joins.py:247), which only looks
    backward. Attribution, ad-to-conversion matching, and sensor
    alignment all want "closest", not "most recent".

    Spark-first plan: NOT a per-row subquery. Clicks and purchases union
    into one stream sorted by (user_id, ts); a backward window carries the
    last click at-or-before each purchase, a forward window the first
    click after — two window passes over ONE shuffle's sort order — and a
    final projection picks whichever side is nearer in exact integer
    microseconds. Ties: equal |delta| resolves to the earlier (backward)
    click, and equal timestamps within a side resolve to the smallest
    event_id, matching the oracle's ORDER BY delta_us, ts, event_id.

    Scale design: one shuffle on user_id, O(1) window state per row, output
    |purchases| rows. The oracle's LATERAL formulation is the naive
    O(|purchases| x per-user clicks) shape this operator exists to avoid.
    Skewed users (bots with millions of clicks) stream through the sorted
    frame without materializing per-user state."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type",
        F.unix_micros("ts").alias("us"),
    )
    both = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "us",
        "event_id",
        (F.col("event_type") == "click").alias("is_click"),
        F.when(F.col("event_type") == "click", F.col("us")).alias("c_us"),
        F.when(F.col("event_type") == "click", F.col("event_id")).alias(
            "c_id"
        ),
    )
    # Backward pass: clicks sort BEFORE purchases at equal us (is_click
    # desc) so a click at the same instant is visible at distance 0; equal
    # (us) clicks keep the smallest event_id by ordering event_id DESC and
    # taking last.
    back = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("us").asc(),
            F.col("is_click").desc(),
            F.col("c_id").desc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward pass: first strictly-later click; clicks sort AFTER purchases
    # at equal us so distance-0 clicks are owned by the backward side, and
    # equal-us clicks keep the smallest event_id. Expressed as a running
    # last over the exactly-REVERSED sort (us desc, is_click desc, c_id
    # desc_nulls_first) — O(n) per partition, where the naive CURRENT
    # ROW..UNBOUNDED FOLLOWING frame recomputes per row, O(n^2): a single
    # bot user (--extreme collapses events to one) would turn that frame
    # into one quadratic task. Rows tied under the full triple are only
    # purchase pairs (c_id NULL), which carry no click values, so the
    # reversal picks the identical click row.
    fwd = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("us").desc(),
            F.col("is_click").desc(),
            F.col("c_id").desc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = both.select(
        "*",
        F.last("c_us", ignorenulls=True).over(back).alias("b_us"),
        F.last("c_id", ignorenulls=True).over(back).alias("b_id"),
        F.last("c_us", ignorenulls=True).over(fwd).alias("f_us"),
        F.last("c_id", ignorenulls=True).over(fwd).alias("f_id"),
    ).filter(~F.col("is_click"))
    b_d = F.col("us") - F.col("b_us")  # >= 0
    f_d = F.col("f_us") - F.col("us")  # >= 0 (0 only when no backward twin)
    # A forward click at distance 0 exists only if there is also a backward
    # one (same click), so strict vs non-strict at 0 cannot flip the choice;
    # ties at equal distance go backward (earlier ts), matching the oracle.
    pick_b = F.col("b_us").isNotNull() & (
        F.col("f_us").isNull() | (b_d <= f_d)
    )
    return g.select(
        F.col("event_id").alias("purchase_id"),
        F.when(pick_b, F.col("b_id")).otherwise(F.col("f_id")).alias(
            "click_id"
        ),
        F.when(pick_b, b_d).otherwise(f_d).alias("delta_us"),
    )


# ---------------------------------------------------------------------------
# running-peak drawdown
# ---------------------------------------------------------------------------


@query(
    "q_win_drawdown",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
                   AS day,
               SUM(CAST(value AS DECIMAL(18,4))) AS sum_v
        FROM events GROUP BY 1, 2
    ),
    g AS (
        SELECT event_type, day, sum_v,
               MAX(sum_v) OVER (
                   PARTITION BY event_type ORDER BY day
               ) AS peak
        FROM daily
    )
    SELECT event_type, day,
           CAST(sum_v AS DOUBLE) AS sum_v,
           CAST(peak AS DOUBLE) AS peak,
           CAST(peak - sum_v AS DOUBLE) AS drawdown,
           -- domain guard (r10 composed sf0.1: --negative x --hotkey can
           -- zero a running peak, where ANSI Spark hard-errors and DuckDB
           -- emits Inf): the pct is defined only for a POSITIVE peak
           CASE WHEN peak > 0 THEN
               floor(CAST(peak - sum_v AS DOUBLE) / CAST(peak AS DOUBLE)
                     * 10000 + 0.5) / 10000
           END AS drawdown_pct
    FROM g
    """,
)
def q_win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-peak drawdown: each day's distance below the best day seen
    so far, per event type — the risk metric behind "how far below the
    high-water mark are we", used on revenue series exactly as on equity
    curves; pairs with q_win_cusum (drift) and q_win_ewma (smoothing) in
    the monitoring family.

    The peak is a cumulative MAX window over DECIMAL daily totals —
    comparison-only, so exact in both engines; drawdown stays decimal
    until the output cast and only the pct ratio needs the boundary-safe
    quantization.

    Scale design: daily decimal rollup first (the only pass over fact
    rows), then one shuffle on event_type with an O(1) running-max frame.
    Identical plan shape at any history length."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        fday("ts").alias("day"),
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = daily.select(
        "event_type",
        "day",
        "sum_v",
        F.max("sum_v").over(w).alias("peak"),
    )
    return g.select(
        "event_type",
        "day",
        F.col("sum_v").cast("double").alias("sum_v"),
        F.col("peak").cast("double").alias("peak"),
        (F.col("peak") - F.col("sum_v")).cast("double").alias("drawdown"),
        # peak > 0 domain guard, mirrored in the oracle (r10 composed
        # sf0.1 catch): a zero running peak — one all-negative/zero hot
        # day opening a series — is DIVIDE_BY_ZERO under ANSI Spark but
        # Inf under DuckDB, so the engines diverge before results are
        # comparable; a NEGATIVE peak would divide fine in both but the
        # "fraction below high-water" metric is meaningless there.
        F.when(
            F.col("peak") > 0,
            F.floor(
                (F.col("peak") - F.col("sum_v")).cast("double")
                / F.col("peak").cast("double")
                * 10000
                + 0.5
            )
            / 10000,
        ).alias("drawdown_pct"),
    )


# ---------------------------------------------------------------------------
# M4 downsampling
# ---------------------------------------------------------------------------


@query(
    "q_time_downsample_m4",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 21600) AS BIGINT)
                   AS bucket,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               event_id, value
        FROM events
    ),
    r AS (
        SELECT event_type, bucket, value,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, bucket ORDER BY us, event_id
               ) AS rf,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, bucket
                   ORDER BY us DESC, event_id DESC
               ) AS rl,
               COUNT(*) OVER (PARTITION BY event_type, bucket) AS n,
               MIN(value) OVER (PARTITION BY event_type, bucket) AS v_min,
               MAX(value) OVER (PARTITION BY event_type, bucket) AS v_max
        FROM e
    )
    SELECT event_type, bucket, CAST(n AS BIGINT) AS n,
           floor(v_min * 10000 + 0.5) / 10000 AS v_min,
           floor(v_max * 10000 + 0.5) / 10000 AS v_max,
           floor(MAX(CASE WHEN rf = 1 THEN value END) * 10000 + 0.5)
               / 10000 AS v_first,
           floor(MAX(CASE WHEN rl = 1 THEN value END) * 10000 + 0.5)
               / 10000 AS v_last
    FROM r GROUP BY event_type, bucket, n, v_min, v_max
    """,
)
def q_time_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling: per (series, 6-hour bucket) the min / max / first /
    last values plus count — the four points that make a downsampled line
    chart pixel-identical to the raw series (the M4 aggregation used by
    time-series visualization backends), and the same shape q_agg_ohlc
    uses for finance bars, generalized to any series.

    First/last are row_number picks over the (µs, event_id) total order —
    deterministic under equal timestamps — combined with plain min/max in
    one window pass; raw stored doubles pass through untouched except the
    final display quantization.

    Scale design: one shuffle on (series, bucket); every window shares the
    same partitioning, so Catalyst runs all five measures in one exchange
    + sort. Output is |series| × |buckets| — the whole point is that
    downstream (a chart, a dashboard cache) never touches fact rows."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.floor(fsec("ts") / 21600).cast("bigint").alias(
            "bucket"
        ),
        F.unix_micros("ts").alias("us"),
        "event_id",
        "value",
    )
    part = Window.partitionBy("event_type", "bucket")
    fwd = part.orderBy("us", "event_id")
    bwd = part.orderBy(F.col("us").desc(), F.col("event_id").desc())
    r = e.select(
        "event_type",
        "bucket",
        "value",
        F.row_number().over(fwd).alias("rf"),
        F.row_number().over(bwd).alias("rl"),
        F.count("*").over(part).alias("n"),
        F.min("value").over(part).alias("v_min"),
        F.max("value").over(part).alias("v_max"),
    )
    q = lambda c: F.floor(c * 10000 + 0.5) / 10000  # noqa: E731
    return r.groupBy(
        "event_type", "bucket", "n", "v_min", "v_max"
    ).agg(
        F.max(F.when(F.col("rf") == 1, F.col("value"))).alias("f"),
        F.max(F.when(F.col("rl") == 1, F.col("value"))).alias("l"),
    ).select(
        "event_type",
        "bucket",
        F.col("n").cast("bigint").alias("n"),
        q(F.col("v_min")).alias("v_min"),
        q(F.col("v_max")).alias("v_max"),
        q(F.col("f")).alias("v_first"),
        q(F.col("l")).alias("v_last"),
    )


# ---------------------------------------------------------------------------
# interval union / coverage (merge overlapping spans)
# ---------------------------------------------------------------------------


@query(
    "q_interval_merge",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                   + greatest(1, CAST(floor(value) AS BIGINT)) AS e
        FROM events
    ),
    -- both window passes order by (s, e, event_id) — a TOTAL key (r10
    -- composed sf0.1 catch, the r6 gap-and-island class): with (s, e)
    -- alone, ~200-row tie groups (--dupes instants x --extreme single
    -- user) are sequenced independently in the flag pass and the sum
    -- pass; when the orders disagree a tie group splits across two
    -- islands and coverage/longest shift while n_merged stays equal
    flagged AS (
        SELECT user_id, s, e, event_id,
               CASE WHEN s > coalesce(max(e) OVER (
                   PARTITION BY user_id ORDER BY s, e, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), -1) THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (
                   PARTITION BY user_id ORDER BY s, e, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island
        FROM flagged
    ),
    merged AS (
        SELECT user_id, island,
               MIN(s) AS ms, MAX(e) AS me, COUNT(*) AS n_raw
        FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(SUM(n_raw) AS BIGINT) AS n_intervals,
           CAST(COUNT(*) AS BIGINT) AS n_merged,
           CAST(SUM(me - ms) AS BIGINT) AS coverage_sec,
           CAST(MAX(me - ms) AS BIGINT) AS longest_sec
    FROM merged GROUP BY 1
    """,
)
def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union per user: overlapping/adjacent activity spans
    [ts, ts+duration) are merged into maximal islands, reporting raw vs
    merged counts, total covered seconds and the longest merged span —
    "how much wall-clock was this user actually active" (billing,
    SLA-coverage, machine-utilization), which double-counts unless the
    overlaps are merged first. Complements q_win_concurrency: the sweep
    line counts simultaneous spans, this one measures their union.

    The classic cumulative-max island trick: an interval starts a new
    island iff its start exceeds the running max end of everything
    before it (ROWS .. 1 PRECEDING, so the current row's own end is
    excluded); the island id is then a running sum of those flags, and
    each island collapses to (min s, max e) in one groupBy.

    Scale design: both window passes share one (user_id ordered-by s,e)
    sort — one shuffle keyed by user_id, O(1) state per row (running
    max + running sum), then a hash aggregate. Per-user data is bounded
    by that user's event count, so skew follows user activity — for a
    pathological mega-user, pre-split by day and stitch islands whose
    spans cross midnight (same carry trick q_win_concurrency documents).
    Half-open convention: a span ending exactly where the next begins
    merges (s > max_e is strict)."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        fsec("ts").alias("s"),
        (
            fsec("ts")
            + F.greatest(F.lit(1), F.floor("value").cast("bigint"))
        ).alias("e"),
    )
    # (s, e, event_id) is a TOTAL order — see the oracle comment; Spark
    # fuses both frames into one Window exec so it happens to be self-
    # consistent, but the cross-engine island assignment within a tie
    # group is only deterministic under a shared total key
    order = Window.partitionBy("user_id").orderBy("s", "e", "event_id")
    prev_max = order.rowsBetween(Window.unboundedPreceding, -1)
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = iv.select(
        "user_id",
        "s",
        "e",
        "event_id",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(prev_max), F.lit(-1)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_island"),
    ).select(
        "user_id",
        "s",
        "e",
        F.sum("new_island").over(run).alias("island"),
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"),
        F.max("e").alias("me"),
        F.count(F.lit(1)).alias("n_raw"),
    )
    return merged.groupBy("user_id").agg(
        F.sum("n_raw").cast("bigint").alias("n_intervals"),
        F.count(F.lit(1)).cast("bigint").alias("n_merged"),
        F.sum(F.col("me") - F.col("ms")).cast("bigint").alias("coverage_sec"),
        F.max(F.col("me") - F.col("ms")).cast("bigint").alias("longest_sec"),
    )


# ---------------------------------------------------------------------------
# local-extremum (peak) detection on a daily series
# ---------------------------------------------------------------------------


@query(
    "q_win_peaks",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
                   AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ),
    nbr AS (
        SELECT event_type, day, v,
               lag(v) OVER (PARTITION BY event_type ORDER BY day) AS pv,
               lead(v) OVER (PARTITION BY event_type ORDER BY day) AS nv
        FROM daily
    )
    SELECT event_type, day,
           floor(v * 10000 + 0.5) / 10000 AS v,
           floor((v - greatest(pv, nv)) * 10000 + 0.5) / 10000
               AS prominence
    FROM nbr
    WHERE pv IS NOT NULL AND nv IS NOT NULL AND v > pv AND v > nv
    """,
)
def q_win_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum detection over each event type's daily-revenue
    series: a day is a peak iff it strictly exceeds both neighbors
    (series edges excluded — they have only one neighbor), with a
    min-neighbor prominence (v - max(prev, next)) — the spike-detection
    primitive behind alerting and campaign-attribution ("which days
    stood out from their neighborhood").

    Scale design: raw events collapse to per-(type, day) sums first
    (decimal-exact, map-side partial agg), so the lag/lead windows run
    over |types| x |days| rows — series length, not event count. Both
    neighbors come from ONE window sort (lag and lead share the
    (type, day) ordering; Catalyst evaluates them in a single Window
    node, one shuffle). The daily sums pass through the decimal path so
    Spark and DuckDB compare bit-identical doubles before the 4-dp
    round; v - greatest(pv, nv) is then the same two double ops in the
    same order on both engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        fday("ts").alias("day"),
    ).agg(dsum("value").alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    nbr = daily.select(
        "event_type",
        "day",
        "v",
        F.lag("v").over(w).alias("pv"),
        F.lead("v").over(w).alias("nv"),
    )
    q = lambda c: F.floor(c * 10000 + 0.5) / 10000  # noqa: E731
    return nbr.filter(
        F.col("pv").isNotNull()
        & F.col("nv").isNotNull()
        & (F.col("v") > F.col("pv"))
        & (F.col("v") > F.col("nv"))
    ).select(
        "event_type",
        "day",
        q(F.col("v")).alias("v"),
        q(F.col("v") - F.greatest("pv", "nv")).alias("prominence"),
    )


# ---------------------------------------------------------------------------
# rolling correlation between two daily series
# ---------------------------------------------------------------------------


@query(
    "q_stats_rolling_corr",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
                   AS day,
               coalesce(CAST(SUM(CASE WHEN event_type = 'click'
                   THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE),
                   0.0) AS x,
               coalesce(CAST(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE),
                   0.0) AS y
        FROM events
        WHERE event_type IN ('click', 'purchase')
        GROUP BY 1
    ),
    rolled AS (
        SELECT day, x, y,
               COUNT(*) OVER w AS n,
               SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
               SUM(x * y) OVER w AS sxy,
               SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           CAST(n AS BIGINT) AS n_days,
           CASE WHEN n >= 7
                 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN floor((n * sxy - sx * sy)
                           / sqrt(n * sxx - sx * sx)
                           / sqrt(n * syy - sy * sy) * 10000 + 0.5) / 10000
           END AS rolling_corr
    FROM rolled
    """,
)
def q_stats_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day rolling Pearson correlation between the click and purchase
    daily-revenue series (a day with one series absent counts as 0.0
    revenue for it — unlike q_time_interpolate's sensors, "no purchases"
    IS zero) — the metric-coupling monitor ("did purchases
    stop following clicks this week?") that a global correlation
    (q_agg_corr / q_stats_linreg's sufficient statistics) cannot see
    because regime changes average out. Windows shorter than 7 observed
    days emit NULL (correlation over a handful of points is noise), as
    do degenerate zero-variance windows.

    Scale design: events collapse to one row per day FIRST (conditional
    decimal-exact sums pivot the two series into columns — no join
    between two daily aggregates), so the six rolling sufficient
    statistics run over series-length rows with O(window) state, all
    six sharing ONE window sort. The closed-form r from sufficient
    sums is the same n*sxy - sx*sy shape q_stats_linreg established;
    identical operation order on both engines keeps the doubles
    bit-identical before the 4-dp round. The single unpartitioned
    window is over the DAILY table (|days| rows — thousands for years
    of data); with many series, partition by series key as
    q_win_peaks does."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            fday("ts").alias("day")
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "click",
                        F.col("value").cast("decimal(18,4)"),
                    )
                ).cast("double"),
                F.lit(0.0),
            ).alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.col("value").cast("decimal(18,4)"),
                    )
                ).cast("double"),
                F.lit(0.0),
            ).alias("y"),
        )
    )
    w = Window.orderBy("day").rowsBetween(-13, Window.currentRow)
    rolled = daily.select(
        "day",
        "x",
        "y",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov_n = n * F.col("sxy") - sx * sy
    var_x = n * F.col("sxx") - sx * sx
    var_y = n * F.col("syy") - sy * sy
    r = cov_n / F.sqrt(var_x) / F.sqrt(var_y)
    return rolled.select(
        "day",
        n.cast("bigint").alias("n_days"),
        F.when(
            (n >= 7) & (var_x > 0) & (var_y > 0),
            F.floor(r * 10000 + 0.5) / 10000,
        ).alias("rolling_corr"),
    )


# ---------------------------------------------------------------------------
# period-over-period growth (DoD / WoW)
# ---------------------------------------------------------------------------


@query(
    "q_win_growth",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
                   AS day,
               SUM(CAST(value AS DECIMAL(18,4))) AS v
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT event_type, day, v,
               lag(v, 1) OVER w AS v_d1,
               lag(v, 7) OVER w AS v_d7,
               lag(day, 1) OVER w AS day_d1,
               lag(day, 7) OVER w AS day_d7
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day,
           CAST(v AS DOUBLE) AS revenue,
           CASE WHEN day_d1 = day - 1 AND v_d1 > 0
                THEN floor((CAST(v AS DOUBLE) / CAST(v_d1 AS DOUBLE) - 1)
                           * 10000 + 0.5) / 10000 END AS growth_dod,
           CASE WHEN day_d7 = day - 7 AND v_d7 > 0
                THEN floor((CAST(v AS DOUBLE) / CAST(v_d7 AS DOUBLE) - 1)
                           * 10000 + 0.5) / 10000 END AS growth_wow
    FROM lagged
    """,
)
def q_win_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth per event type: day-over-day and
    week-over-week revenue growth rates, NULL when the comparison day
    is missing from the series (lag() returns the previous ROW, so the
    guard day_dN = day - N ensures the growth compares true calendar
    neighbors, not whatever happened to precede a gap) — the daily
    scorecard metric next to q_stats_autocorr's momentum diagnosis and
    q_win_rank_delta's rank movement.

    Scale design: facts collapse to per-(type, day) DECIMAL sums first;
    both lags (and their day twins) share one (type, day) window sort —
    a single exchange on event_type, series-length state. The growth
    ratio divides the two exact decimals as doubles in the same
    operation order on both engines before the 4-dp quantize."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        fday("ts").alias("day"),
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "day",
        "v",
        F.lag("v", 1).over(w).alias("v_d1"),
        F.lag("v", 7).over(w).alias("v_d7"),
        F.lag("day", 1).over(w).alias("day_d1"),
        F.lag("day", 7).over(w).alias("day_d7"),
    )

    def growth(vn, dn, n):
        return F.when(
            (F.col(dn) == F.col("day") - n) & (F.col(vn) > 0),
            F.floor(
                (F.col("v").cast("double") / F.col(vn).cast("double") - 1)
                * 10000
                + 0.5
            )
            / 10000,
        )

    return lagged.select(
        "event_type",
        "day",
        F.col("v").cast("double").alias("revenue"),
        growth("v_d1", "day_d1", 1).alias("growth_dod"),
        growth("v_d7", "day_d7", 7).alias("growth_wow"),
    )


# ---------------------------------------------------------------------------
# additive time-series decomposition (trend + day-of-week seasonal + residual)
# ---------------------------------------------------------------------------


@query(
    "q_time_decompose",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
                   AS day,
               SUM(CAST(value AS DECIMAL(18,4))) AS v
        FROM events GROUP BY 1, 2
    ),
    t AS (
        SELECT event_type, day, v, (day + 4) % 7 AS dow,
               SUM(v) OVER w7 AS tsum,
               COUNT(*) OVER w7 AS tn
        FROM daily
        WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    full_t AS (SELECT * FROM t WHERE tn = 7),
    seas AS (
        SELECT event_type, dow,
               CAST(SUM(7 * v - tsum) AS DOUBLE)
                   / (7.0 * COUNT(*)) AS s
        FROM full_t GROUP BY 1, 2
    )
    SELECT f.event_type, f.day, CAST(f.dow AS INT) AS dow,
           floor(CAST(f.v AS DOUBLE) * 10000 + 0.5) / 10000 AS value,
           floor(CAST(f.tsum AS DOUBLE) / 7 * 10000 + 0.5) / 10000
               AS trend,
           floor(s.s * 10000 + 0.5) / 10000 AS seasonal,
           floor((CAST(f.v AS DOUBLE) - CAST(f.tsum AS DOUBLE) / 7 - s.s)
                 * 10000 + 0.5) / 10000 AS residual
    FROM full_t f JOIN seas s USING (event_type, dow)
    """,
)
def q_time_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive time-series decomposition (STL-lite) of each type's
    daily revenue: trend = centered 7-day moving average (full windows
    only — edges have no honest trend), seasonal = day-of-week mean of
    the detrended series, residual = value - trend - seasonal — the
    decomposition that q_season_profile's index and q_anomaly_seasonal's
    cohort medians both approximate from one side, here produced as
    three explicit components per day (forecast inputs, what-changed
    dashboards).

    Cross-engine determinism: the moving sum accumulates DECIMALS over
    the ordered frame (exact), and the seasonal mean is computed from
    the scaled form sum(7v - tsum) — still all-decimal, order-free —
    with exactly one decimal→double cast per component before
    identically-ordered double arithmetic and the 4-dp quantize.

    Scale design: facts collapse to per-(type, day) decimal sums first;
    the centered window and the dow rollup both run over series-length
    rows (the window shares the one (type, day) sort; the seasonal
    table is 7 rows per type and joins back on (type, dow))."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        fday("ts").alias("day"),
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("v"))
    w7 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    t = daily.select(
        "event_type",
        "day",
        "v",
        ((F.col("day") + 4) % 7).alias("dow"),
        F.sum("v").over(w7).alias("tsum"),
        F.count(F.lit(1)).over(w7).alias("tn"),
    ).filter(F.col("tn") == 7)
    seas = t.groupBy("event_type", "dow").agg(
        (
            F.sum(7 * F.col("v") - F.col("tsum")).cast("double")
            / (7.0 * F.count(F.lit(1)))
        ).alias("s")
    )
    q4 = lambda c: F.floor(c * 10000 + 0.5) / 10000  # noqa: E731
    vd = F.col("v").cast("double")
    td = F.col("tsum").cast("double") / 7
    return t.join(seas, ["event_type", "dow"]).select(
        "event_type",
        "day",
        F.col("dow").cast("int").alias("dow"),
        q4(vd).alias("value"),
        q4(td).alias("trend"),
        q4(F.col("s")).alias("seasonal"),
        q4(vd - td - F.col("s")).alias("residual"),
    )
