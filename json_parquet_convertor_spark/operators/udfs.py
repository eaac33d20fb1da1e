"""UDF / UDAF / UDTF surface (SURVEY.md §2 B10).

The reference's only "function" is the hand-written row-mapper ``toParquet``
(``/root/reference/convertor/struct.go:20-28``); ``q_udf_python`` expresses
exactly that shape as a row-at-a-time Python UDF. It exists to be contrasted:
every other query here uses the Arrow-vectorized path (pandas UDF /
mapInPandas), which moves data JVM↔Python in columnar batches and is the only
Python execution model that survives 100 TB. Rule of thumb encoded here:

- row UDF        → ~1e5 rows/s/core   (pickle per row)    — q_udf_python
- pandas UDF     → ~1e7 rows/s/core   (Arrow per batch)   — q_udf_pandas
- built-in exprs → no Python at all                        — everything else

Cross-engine note: rounding happens JVM-side (``F.round`` = HALF_UP, matching
DuckDB) AFTER the UDF returns raw doubles — numpy's ``round`` is half-to-even
and would diverge at exact .00005 boundaries.
"""

# NOTE: no `from __future__ import annotations` here — stringized type hints
# break pandas_udf eval-type inference (UNSUPPORTED_SIGNATURE).
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from json_parquet_convertor_spark.registry import query
from json_parquet_convertor_spark.sources.io import load_table


@query(
    "q_udf_python",
    oracle="""
    SELECT c_custkey,
           CAST(c_custkey AS VARCHAR) || ':' || c_name || ':'
               || CAST(CAST(c_nationkey AS TINYINT) AS VARCHAR) AS person_label
    FROM customer
    """,
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ``toParquet`` row-map (struct.go:20-28) as a scalar
    Python UDF: field remapping + the narrowing int→tinyint cast, one row at
    a time. Deliberately the slow path — each row round-trips through
    pickle; kept here as the parity/contrast case for q_udf_pandas."""
    cust = load_table(spark, sf_dir, "customer")

    @F.udf("string")
    def person_label(custkey, name, nationkey):
        # mirrors toParquet: stringly ID, name carried, age narrowed (int8)
        # via a true two's-complement wrap — CAST(x AS TINYINT) maps 128..255
        # to -128..-1, which `& 0x7F` would not.
        narrowed = ((int(nationkey) + 128) % 256) - 128
        return f"{custkey}:{name}:{narrowed}"

    return cust.select(
        "c_custkey",
        person_label("c_custkey", "c_name", "c_nationkey").alias("person_label"),
    )


@query(
    "q_udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS disc_price,
           CASE WHEN l_extendedprice >= 0 AND l_quantity > -1
                THEN round(sqrt(l_extendedprice) + ln(l_quantity + 1), 4)
           END AS feature
    FROM lineitem
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Series → Series over Arrow batches).
    The arithmetic runs as numpy ops over whole columns — no per-row Python.
    Rounding is applied JVM-side afterwards (HALF_UP, matches DuckDB)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    li = load_table(spark, sf_dir, "lineitem")

    @pandas_udf("double")
    def disc_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    @pandas_udf("double")
    def feature(price: pd.Series, qty: pd.Series) -> pd.Series:
        import numpy as np

        return np.sqrt(price) + np.log(qty + 1.0)

    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(disc_price("l_extendedprice", "l_discount"), 4).alias("disc_price"),
        # domain guard, mirrored in the oracle CASE: the UDF still runs
        # over every Arrow batch (Spark hoists UDFs out of CASE) and
        # numpy quietly yields NaN/-inf for returns/credit rows; the
        # JVM-side when() replaces those with NULL, where the unguarded
        # oracle would hard-error on sqrt(negative) (--negative axis)
        F.when(
            (F.col("l_extendedprice") >= 0) & (F.col("l_quantity") > -1),
            F.round(feature("l_extendedprice", "l_quantity"), 4),
        ).alias("feature"),
    )


@query(
    "q_udaf_pandas",
    oracle="""
    SELECT l_returnflag,
           round(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
               AS weighted_avg_price,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: a custom weighted mean the built-in agg
    set lacks. Each group arrives as pandas Series (Arrow transfer), reduces
    to one scalar — composable with built-in aggs in the same .agg().
    The 3-value group key keeps state bounded at any scale; numpy-vs-engine
    summation order differs only ~1e-13 relative, far inside 4 dp.

    NULL parity: Arrow nulls surface as NaN in the float Series, and a
    naive np.sum would propagate them where SQL's SUM skips — so the two
    sums mask INDEPENDENTLY, exactly like the oracle's
    SUM(price*qty)/SUM(qty): the numerator skips rows where EITHER factor
    is NULL (the product is NULL), the denominator skips only qty-NULL
    rows — a price-NULL row still counts its qty in the denominator
    (r7 verdict #2; the r6 version wrongly masked both sums on either-NULL).
    Each SUM over zero surviving rows is SQL-NULL, so the result is NULL;
    fixture quantities are strictly positive, so a non-NULL denominator
    sum can never be exactly zero (division-by-zero unreachable)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    li = load_table(spark, sf_dir, "lineitem")

    @pandas_udf("double")
    def weighted_mean(price: pd.Series, qty: pd.Series) -> float:
        p, q = price.values, qty.values
        q_ok = ~np.isnan(q)
        both_ok = q_ok & ~np.isnan(p)
        if not q_ok.any() or not both_ok.any():
            return None  # either SUM is NULL -> the quotient is NULL
        return float(np.sum(p[both_ok] * q[both_ok]) / np.sum(q[q_ok]))

    # Spark disallows mixing grouped-agg pandas UDFs with built-in aggs in
    # one .agg() (INVALID_PANDAS_UDF_PLACEMENT), so the count is a pandas
    # UDF as well.
    @pandas_udf("long")
    def group_size(qty: pd.Series) -> int:
        return int(len(qty))

    return li.groupBy("l_returnflag").agg(
        F.round(weighted_mean("l_extendedprice", "l_quantity"), 4).alias(
            "weighted_avg_price"
        ),
        group_size("l_quantity").alias("n_rows"),
    )


@query(
    "q_udtf_explode",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' ')[1:5], 1) AS INT) AS pos,
           unnest(string_split(text, ' ')[1:5]) AS token
    FROM documents
    """,
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python table function: one row → N rows via mapInPandas (Arrow batch
    in, Arrow batch out) — the tokenizer shape of a training-data pipeline.
    Emits (doc_id, pos, token) for each doc's first 5 whitespace tokens.
    mapInPandas streams batches, so peak memory is one batch regardless of
    input size; the fan-out happens inside the Python worker with no
    driver involvement."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def tokenize(batches):
        for pdf in batches:
            ids, poss, toks = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for i, tok in enumerate(text.split(" ")[:5], start=1):
                    ids.append(doc_id)
                    poss.append(i)
                    toks.append(tok)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "pos": pd.Series(poss, dtype="int32"),
                    "token": pd.Series(toks, dtype="object"),
                }
            )

    return docs.mapInPandas(tokenize, "doc_id long, pos int, token string")


@query(
    "q_udf_grouped_map",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           round((l_extendedprice - AVG(l_extendedprice) OVER (PARTITION BY l_returnflag))
                 / STDDEV_SAMP(l_extendedprice) OVER (PARTITION BY l_returnflag), 4)
               AS price_z
    FROM lineitem
    """,
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas): whole-group in, whole-group
    out — per-group feature normalization (z-score within return flag), the
    shape used for per-entity standardization and per-group model scoring.
    Each group arrives as one pandas DataFrame over Arrow; the 3-value
    group key bounds the per-task working set at any scale (for
    high-cardinality groups this is the memory-risk API — each group must
    fit in one worker, unlike mapInPandas which streams batches).

    Rounding stays JVM-side (HALF_UP) and the numpy-vs-engine summation
    difference in mean/std is ~1e-13 relative — inside 4 dp."""
    import pandas as pd

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )

    def zscore(pdf: "pd.DataFrame") -> "pd.DataFrame":
        x = pdf["l_extendedprice"]
        z = (x - x.mean()) / x.std(ddof=1)
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "l_returnflag": pdf["l_returnflag"],
                "price_z_raw": z,
            }
        )

    out = li.groupBy("l_returnflag").applyInPandas(
        zscore,
        "l_orderkey long, l_linenumber int, l_returnflag string, price_z_raw double",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round("price_z_raw", 4).alias("price_z"),
    )


@query(
    "q_udtf_lateral",
    oracle="""
    SELECT doc_id,
           CAST(i AS INT) AS idx,
           string_split(text, ' ')[i + 1] AS piece,
           CAST(length(string_split(text, ' ')[i + 1]) AS INT) AS piece_len
    FROM documents, generate_series(0, 2) t(i)
    WHERE len(string_split(text, ' ')) > i
    """,
)
def q_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Python UDTF (Spark 4 ``@udtf`` class API) applied laterally:
    one document row in, up to three (idx, piece, piece_len) rows out —
    the table-function counterpart of q_udtf_explode's built-in-explode
    formulation, for row-expanding logic that genuinely needs Python.

    Scale posture: a UDTF runs per-partition in a Python worker with Arrow
    transfer, composes with LATERAL like any relation, and never touches
    the driver; the expansion factor (≤3 here) bounds output amplification.
    The same join would be codegen'd via posexplode — the UDTF is the
    escape hatch for when it cannot be."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx int, piece string, piece_len int")
    class HeadWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split(" ")[:3]):
                yield (i, w, len(w))

    spark.udtf.register("jpc_head_words", HeadWords)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "jpc_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.idx, t.piece, t.piece_len
        FROM jpc_udtf_docs d, LATERAL jpc_head_words(d.text) t
        """
    )


@query(
    "q_udf_cogroup",
    oracle="""
    WITH o AS (
        SELECT o_custkey AS u, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_spend
        FROM orders GROUP BY 1
    ), e AS (
        SELECT user_id AS u, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    )
    SELECT COALESCE(o.u, e.u) AS u,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(e.n_events, 0) AS n_events,
           COALESCE(o.total_spend, 0.0) AS total_spend
    FROM o FULL OUTER JOIN e ON o.u = e.u
    """,
)
def q_udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map pandas UDF (`groupBy().cogroup().applyInPandas`): the
    two tables are co-partitioned on the user key and EACH KEY's two
    pandas frames arrive together in one Python call — the escape hatch
    for per-entity logic that needs both sides at once (custom
    reconciliation, trajectory stitching) and can't be said as a join.
    Here the merge logic itself is deliberately simple (count/sum + full
    outer semantics incl. keys present on only one side) so the oracle
    can state it as SQL and certify the cogroup machinery end-to-end.

    Scale design: cogroup is exactly one co-partitioning shuffle of each
    side (same exchange layout both, like a sort-merge join), then
    Arrow-batched per-group calls. Two choices make this survive scale:
    (1) the aggregates are pre-reduced BEFORE the cogroup (events collapse
    to per-user counts engine-side), so Python sees user-count-sized
    frames, not raw fact rows; (2) the cogroup key is a HASH BUCKET of the
    user id, not the user id itself — per-entity Python calls mean one
    interpreter round-trip per key (40 s for 15 k users at sf0.1; hopeless
    at billions), while bucketing fixes the call count at n_buckets and
    does the per-user merge vectorized inside pandas. Each user lands in
    exactly one bucket, so bucket-local full-outer still equals the
    global full-outer."""
    import pandas as pd

    n_buckets = 64
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("u"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_spend"),
        )
        .withColumn("b", F.pmod("u", F.lit(n_buckets)).cast("int"))
    )
    events = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("u"))
        .agg(F.count("*").alias("n_events"))
        .withColumn("b", F.pmod("u", F.lit(n_buckets)).cast("int"))
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # SQL NULL-key semantics by hand (--nullkey axis catch): pandas
        # merge MATCHES NaN keys with each other where SQL's FULL OUTER
        # equi-join never does — so the orphan (NULL-key) rows are split
        # out and appended UNMATCHED, one row per side, exactly like the
        # oracle. The key column goes out as nullable Int64 (a bare
        # int64 astype crashes on the NaN the orphans carry).
        l, r = left.drop(columns=["b"]), right.drop(columns=["b"])
        m = l[l["u"].notna()].merge(r[r["u"].notna()], on="u", how="outer")
        parts = [m, l[l["u"].isna()], r[r["u"].isna()]]
        m = pd.concat(parts, ignore_index=True)
        return pd.DataFrame(
            {
                "u": m["u"].astype("Int64"),
                "n_orders": m["n_orders"].fillna(0).astype("int64"),
                "n_events": m["n_events"].fillna(0).astype("int64"),
                "total_spend": m["total_spend"].fillna(0.0).astype("float64"),
            }
        )

    return (
        orders.groupBy("b")
        .cogroup(events.groupBy("b"))
        .applyInPandas(
            merge,
            "u BIGINT, n_orders BIGINT, n_events BIGINT, total_spend DOUBLE",
        )
    )


@query(
    "q_udf_arrow",
    oracle="""
    SELECT c_custkey,
           upper(array_to_string(
               list_transform(string_split(c_name, ' '), w -> w[1]), ''
           )) AS initials,
           CAST(length(replace(c_name, ' ', '')) AS INT) AS n_letters
    FROM customer
    """,
)
def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (`@udf(..., useArrow=True)`,
    Spark 3.5): the third point on the Python-UDF spectrum this repo
    demonstrates — q_udf_python (row-at-a-time pickle), this (row-level
    Python logic but Arrow-batch transfer, ~2-5× less serialization
    overhead), q_udf_pandas (vectorized pandas semantics). Arrow UDFs
    keep per-row Python functions viable when the logic genuinely
    resists vectorization; when it doesn't, the pandas form wins.

    The function is string-only (initials + letter count) — no float
    rounding, so Python and SQL agree exactly.

    Scale: still Python-bound per row; the win over pickle UDFs is
    transfer, not compute. Same placement rule as every UDF here:
    project only needed columns into it, keep filters JVM-side."""
    from pyspark.sql.functions import udf

    @udf("initials string, n_letters int", useArrow=True)
    def name_features(name: str):
        parts = [p for p in (name or "").split(" ") if p]
        return (
            "".join(p[0] for p in parts).upper(),
            sum(len(p) for p in parts),
        )

    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", name_features("c_name").alias("nf")
    ).select(
        "c_custkey",
        F.col("nf.initials").alias("initials"),
        F.col("nf.n_letters").alias("n_letters"),
    )


# ---------------------------------------------------------------------------
# Spark 4 Python UDTF (@udtf class) with LATERAL join
# ---------------------------------------------------------------------------


@query(
    "q_udtf_python",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    )
    SELECT doc_id,
           CAST(g.i AS INT) AS pos,
           l[g.i] || '_' || l[g.i + 1] AS bigram
    FROM toks CROSS JOIN
         unnest(generate_series(1, least(len(toks.l) - 1, 3))) AS g(i)
    """,
)
def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's first-class Python UDTF surface: a ``@udtf`` class whose
    ``eval`` yields multiple rows per input, registered and invoked via
    SQL ``LATERAL`` — the user-extensible table function the classic API
    faked with explode-over-arrays (q_udtf_explode shows the
    mapInPandas shape; THIS is the declarative registration the SQL
    user sees). Emits each document's first three adjacent-token
    bigrams with positions.

    Scale posture: a UDTF runs per-partition inside the Python worker —
    parallelism follows the scan, no shuffle is introduced by the
    lateral itself. The per-row Python loop is the cost (row-at-a-time
    pickling, the documented slow path vs q_udtf_explode's
    Arrow-batched mapInPandas twin) — acceptable at B10's API-surface
    scope, not in a hot path; Spark 4's arrow-optimized UDTF mode
    (useArrow=True) is the production setting but changes no
    semantics."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class FirstBigrams:
        def eval(self, text: str, k: int):  # noqa: D102
            toks = text.split(" ")
            for i in range(min(len(toks) - 1, k)):
                yield i + 1, f"{toks[i]}_{toks[i + 1]}"

    spark.udtf.register("first_bigrams", FirstBigrams)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "jpc_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.bigram
        FROM jpc_udtf_docs d,
             LATERAL first_bigrams(d.text, 3) AS b
        """
    )
