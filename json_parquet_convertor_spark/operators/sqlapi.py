"""SQL-string API surface (B12 extension, round 3).

The reference exposes its converter only programmatically
(``cmd/convertor/main.go:20-72`` wires the pipeline in Go); a Spark user
gets the same logical plans through ``spark.sql`` too. This module proves
the SQL surface is first-class: each query here registers the fixture
tables as temp views and submits ONE dialect-shared ANSI SQL string that
is byte-identical to its DuckDB oracle — same text, two engines, same
result. That is the strongest parity statement the oracle harness can
make: there is no "translation" step left to get wrong.

Scale posture: ``spark.sql`` compiles to exactly the same Catalyst plans
as the DataFrame API (CTEs inline or reuse via ReusedExchange, correlated
EXISTS becomes a left-semi hash join, scalar subqueries become broadcast
single-row joins), so everything the DataFrame queries prove about
pushdown and shuffle shape holds verbatim here.

Cross-engine float discipline (registry.py doctrine): money math runs in
DECIMAL(18,4) end-to-end and is cast to DOUBLE only in the final
projection; ratio columns divide two identically-derived doubles, which
is bit-deterministic in IEEE 754 given the same operand order — which the
shared SQL text guarantees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from json_parquet_convertor_spark.registry import query
from json_parquet_convertor_spark.sources.io import load_table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as session temp views named exactly like the
    driver's pre-registered DuckDB views, so one SQL text runs on both."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# Reused-CTE revenue share: seg_stats is consumed twice (per-segment rows
# AND the grand total). Spark plans the reuse as one aggregation feeding a
# broadcast single-row join — no second scan of orders.
_SQL_CTE = """
WITH cust_orders AS (
    SELECT c.c_mktsegment, o.o_totalprice
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
),
seg_stats AS (
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS revenue_dec
    FROM cust_orders
    GROUP BY c_mktsegment
)
SELECT s.c_mktsegment,
       s.n_orders,
       CAST(s.revenue_dec AS DOUBLE) AS revenue,
       CAST(s.revenue_dec AS DOUBLE) * 100.0 / CAST(t.total_dec AS DOUBLE)
           AS revenue_pct
FROM seg_stats s
CROSS JOIN (SELECT SUM(revenue_dec) AS total_dec FROM seg_stats) t
"""


@query("q_sql_cte", oracle=_SQL_CTE)
def q_sql_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-CTE revenue-share query submitted as a raw SQL string — the
    oracle is the SAME string. The second CTE is referenced twice; the
    grand total joins back as a 1-row broadcast, so the whole query costs
    one join + one aggregation regardless of scale."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_SQL_CTE)


# Above-average filter via two scalar subqueries. The usual AVG() form is
# a float trap (sum order changes the last ulp); rearranging the
# inequality to price * COUNT(*) > SUM(price) keeps every operand exact
# DECIMAL/BIGINT, so the boundary rows are engine-independent.
_SQL_SCALAR = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_above_avg,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS max_price
FROM orders
WHERE CAST(o_totalprice AS DECIMAL(18,4)) * (SELECT COUNT(*) FROM orders)
      > (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,4))) FROM orders)
GROUP BY o_orderpriority
"""


@query("q_sql_subquery_scalar", oracle=_SQL_SCALAR)
def q_sql_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subqueries in WHERE ("orders above the average price"),
    shared SQL text with the oracle. Spark plans each scalar subquery as a
    broadcast of one row — the orders scan runs once per subquery but both
    are tiny aggregates; at 100 TB you'd still take this plan, because the
    alternative (a window over the whole table) shuffles everything.

    The avg comparison is rearranged to exact integer/decimal math (see
    module comment) so no float threshold can flip a boundary row."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_SQL_SCALAR)


# Correlated EXISTS / NOT EXISTS — Spark decorrelates these into
# left-semi and left-anti hash joins on o_custkey.
_SQL_EXISTS = """
SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 200000.0)
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey
                    AND o2.o_orderstatus = 'F')
GROUP BY c.c_mktsegment
"""


@query("q_sql_exists", oracle=_SQL_EXISTS)
def q_sql_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS over the same child table, shared
    SQL text with the oracle. Catalyst decorrelates both predicates into a
    left-semi and a left-anti join on the correlation key — the plan a
    hand-written DataFrame version (q_join_semi/q_join_anti) would build,
    derived automatically from the declarative form."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_SQL_EXISTS)


_SQL_VIEW_BODY = """
SELECT l_orderkey,
       l_returnflag,
       CAST(l_extendedprice AS DECIMAL(18,4))
           * (CAST(1.0 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))
           AS net_dec
FROM lineitem
WHERE l_quantity < 30.0
"""

_SQL_VIEW_SELECT = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(CAST(SUM(net_dec) AS STRING) AS DOUBLE) AS net_revenue
FROM lineitem_net
GROUP BY l_returnflag
"""
# ^ net_dec is scale-8 — (18,4) x (5,4) — so the summed numerator crosses
# 2^53 at gen sf1.0 and DuckDB's direct decimal->double cast double-rounds
# 1 ulp off Spark's (q_agg_groupby sum_charge class). Both engines run this
# same SELECT string; the STRING round-trip makes both conversions the
# correctly-rounded string->double parse.


@query(
    "q_sql_view",
    oracle=f"WITH lineitem_net AS ({_SQL_VIEW_BODY}) {_SQL_VIEW_SELECT}",
)
def q_sql_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-view DDL surface: CREATE OR REPLACE TEMPORARY VIEW over a
    derived lineitem projection, then an aggregate over the view. Views
    are pure catalog objects — Catalyst inlines the definition, so the
    filter (l_quantity < 30) still reaches the parquet scan as a pushed
    filter exactly as if written inline; the oracle expresses the same
    two-layer query as a CTE."""
    _views(spark, sf_dir, "lineitem")
    spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW lineitem_net AS {_SQL_VIEW_BODY}")
    return spark.sql(_SQL_VIEW_SELECT)


# NOT IN with a nullable outer key — ANSI three-valued logic: a NULL key
# can never satisfy NOT IN against a non-empty set (NULL <> x is NULL, so
# the conjunction is NULL, so the row is filtered). Both engines must drop
# the 122 negative-balance customers via the NULL path, not the match path.
_SQL_NOT_IN = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END) NOT IN
      (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


@query("q_sql_not_in", oracle=_SQL_NOT_IN)
def q_sql_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a subquery with a NULLABLE outer key — the classic
    three-valued-logic trap (a NULL key row silently disappears), pinned
    here so both engines agree on the ANSI semantics, byte-identical SQL
    on both sides.

    Plan: Spark's `optimizeNullAwareAntiJoin` compiles single-key NOT IN
    to a broadcast hash anti join with `isNullAwareAntiJoin=true` — a hash
    lookup plus the one extra "does the build side contain NULL" probe —
    instead of the quadratic BroadcastNestedLoopJoin that general NOT IN
    conditions force.

    Scale: the subquery (high-value customer keys) is the small side and
    broadcasts; the customer scan streams map-side with no shuffle. If the
    build side outgrew broadcast, the rewrite is the documented fallback:
    pre-aggregate it, add an `ANY(key IS NULL)` flag, and left-join."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_SQL_NOT_IN)


# Recursive hierarchy walk over a binary tree embedded in the order keys
# (node k's children are 2k and 2k+1, bounded to 2..127): 127 nodes,
# depth <= 6, root-to-node paths materialized as strings.
_SQL_RECURSIVE = """
WITH RECURSIVE tree AS (
    SELECT CAST(1 AS BIGINT) AS node, 0 AS depth, CAST('1' AS STRING) AS path
    UNION ALL
    SELECT o.o_orderkey, t.depth + 1,
           t.path || '/' || CAST(o.o_orderkey AS STRING)
    FROM orders o JOIN tree t
      ON CAST(floor(o.o_orderkey / 2.0) AS BIGINT) = t.node
    WHERE o.o_orderkey BETWEEN 2 AND 127
)
SELECT node, CAST(depth AS INT) AS depth, path FROM tree
"""


@query("q_sql_recursive", oracle=_SQL_RECURSIVE)
def q_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (new in Spark 4): a hierarchy walk materializing
    root-to-node paths over a binary tree embedded in the order keys —
    the org-chart / BOM / folder-tree query class that previously needed
    the driver-side iteration loops (q_dedup_cluster, q_graph_pagerank
    hand-roll exactly this shape). Byte-identical SQL text runs on both
    engines (`STRING` aliases VARCHAR in DuckDB; the parent key divides
    via floor(x / 2.0) because bare `/` is float division in one dialect
    and integer in the other).

    Scale: each recursion level is one equi-join of the frontier against
    the child relation — the frontier is the only state that grows, and
    Spark executes levels as ordinary batch joins (breadth-first), so the
    100 TB posture matches the manual loop: co-partition on the join key,
    depth bounded by the hierarchy, never by table size."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_SQL_RECURSIVE)


@query(
    "q_sql_lateral",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer c,
         LATERAL (
             SELECT o_orderkey, o_totalprice
             FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 2
         ) t
    WHERE c.c_custkey <= 200
    """,
)
def q_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join (SQL:1999, Spark 3.2+): each
    customer row drives a per-row subquery — "this customer's top-2
    orders" — stated exactly as a requirements doc would phrase it. The
    ORDER BY carries an o_orderkey tiebreak so LIMIT 2 is deterministic
    under equal prices.

    Scale design: Catalyst DECORRELATES the lateral into a join +
    per-key window (rank ≤ 2) rather than executing the subquery per
    row — the same physical plan q_win_topk_per_group writes by hand.
    This query certifies that rewrite: identical SQL runs on both
    engines and the Spark plan must contain a real Join, not a
    per-row loop. LATERAL is the right surface when the per-row logic
    is richer than one window can say (different limits per segment,
    correlated filters) — the optimizer still owns the strategy."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "jpc_lat_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "jpc_lat_orders"
    )
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
        FROM jpc_lat_customer c,
             LATERAL (
                 SELECT o_orderkey, o_totalprice
                 FROM jpc_lat_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 LIMIT 2
             ) t
        WHERE c.c_custkey <= 200
        """
    )


# ---------------------------------------------------------------------------
# parameterized SQL (named parameters, Spark 3.4+)
# ---------------------------------------------------------------------------


@query(
    "q_sql_params",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_totalprice > 50000.0 AND o_orderstatus = 'F'
    GROUP BY 1
    """,
)
def q_sql_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+ named-parameter API): the query
    text carries ``:min_price`` / ``:status`` placeholders and values
    arrive via ``spark.sql(..., args={...})`` — the injection-safe way
    to template SQL that string interpolation is not (a user-supplied
    ``'F' OR 1=1`` stays a VALUE here, never syntax). The oracle is the
    same query with the two literals inlined, proving the binding
    changes nothing semantically.

    Scale posture: parameters bind in the parser, so Catalyst sees
    ordinary literals — the price predicate still reaches the parquet
    scan as a pushed filter, constant folding still applies; zero plan
    difference vs the literal form."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_price
        FROM orders
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        GROUP BY 1
        """,
        args={"min_price": 50000.0, "status": "F"},
    )


# ---------------------------------------------------------------------------
# IDENTIFIER() templated object names (Spark 3.4+)
# ---------------------------------------------------------------------------


@query(
    "q_sql_identifier",
    oracle="""
    SELECT l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(trunc(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY 1
    """,
)
def q_sql_identifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Templated object names via the IDENTIFIER() clause (Spark 3.4+):
    the table AND the grouping column arrive as string parameters but
    bind as catalog identifiers, not values — the injection-safe way to
    write one query over many tables/columns (per-tenant tables, metric
    configs) where string-formatted SQL invites both injection and
    quoting bugs. Companion to q_sql_params, which templates VALUES;
    this templates NAMES — the two halves of safe dynamic SQL.

    Scale posture: identifiers resolve during analysis, so the plan is
    byte-identical to the hard-coded query — same pushdown, same
    pruning, zero overhead."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp_col) AS l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM IDENTIFIER(:tbl)
        GROUP BY 1
        """,
        args={"tbl": "lineitem", "grp_col": "l_linestatus"},
    )
