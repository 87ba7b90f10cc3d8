"""SQL subquery surface: correlated EXISTS / NOT EXISTS, correlated
scalar subqueries, LATERAL joins, GROUP BY ALL, and VALUES inline
dimension tables.

The reference exposes its whole surface through `submit!`-style batch
calls (core.clj:60-83); a SQL front end replacing it must also cover the
subquery shapes an analyst writes. Catalyst decorrelates all of these
into joins (EXISTS → left-semi, NOT EXISTS → left-anti, scalar subquery
→ aggregate + equi-join, LATERAL top-k → ranked window or limited
join), so every query here executes as a shuffle/broadcast join plan —
nothing runs row-at-a-time, and all of them survive a 100 TB input the
same way the explicit-join formulations do.

Where the same text parses in both engines the oracle IS the Spark SQL
(single source of truth); money-sum fixed-point rules from _sqlgen keep
float aggregates hash-exact.
"""

from __future__ import annotations

from ..sources import table
from . import query

# Same text runs in Spark (on prefixed temp views) and DuckDB (on the
# pre-registered parquet views) — formatted per engine.
EXISTS_SQL = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM {customer} c
WHERE EXISTS (
        SELECT 1 FROM {orders} o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
      )
  AND NOT EXISTS (
        SELECT 1 FROM {orders} o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
      )
ORDER BY c.c_custkey
"""


@query(
    "q96_exists_subquery",
    oracle=EXISTS_SQL.format(customer="customer", orders="orders"),
    tags=("sql", "join"),
)
def q96_exists_subquery(spark, sf_dir):
    """Correlated EXISTS + NOT EXISTS (same SQL text as the oracle).

    Catalyst decorrelates to a left-semi join and a left-anti join on
    o_custkey — both shuffle hash joins at scale, broadcastable when the
    filtered order side is small. No per-row subquery execution ever."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("sq_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("sq_orders")
    return spark.sql(EXISTS_SQL.format(customer="sq_customer", orders="sq_orders"))


SCALAR_SUBQ_SQL = """
SELECT o_orderkey, o_custkey, my_cents, cust_cents, cust_orders,
       my_cents * cust_orders - cust_cents AS dev_cents_times_n
FROM (
  SELECT o.o_orderkey,
         o.o_custkey,
         CAST(ROUND(o.o_totalprice * 100.0, 0) AS BIGINT) AS my_cents,
         (SELECT CAST(SUM(CAST(ROUND(o2.o_totalprice * 100.0, 0) AS BIGINT))
                 AS BIGINT)
          FROM {orders} o2 WHERE o2.o_custkey = o.o_custkey) AS cust_cents,
         (SELECT COUNT(*) FROM {orders} o3
          WHERE o3.o_custkey = o.o_custkey) AS cust_orders
  FROM {orders} o
  WHERE o.o_totalprice > 400000.0
) base
ORDER BY o_orderkey
"""


@query(
    "q97_scalar_subquery",
    oracle=SCALAR_SUBQ_SQL.format(orders="orders"),
    tags=("sql", "agg"),
)
def q97_scalar_subquery(spark, sf_dir):
    """Correlated scalar subqueries (per-customer SUM and COUNT) consumed
    by the outer row. All arithmetic stays in integer cents so the hash
    is exact; `dev_cents_times_n = my*n - total` expresses "deviation
    from the customer mean" without a non-integer division. The derived
    expression reuses the subquery RESULT columns (each subquery appears
    once textually) because Catalyst decorrelates per textual occurrence
    — repeating a subquery expression would re-scan orders each time.

    Catalyst rewrites each scalar subquery into one aggregate on
    o_custkey left-joined back to the filtered outer — two aggregates,
    two equi-joins, never per-row execution."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("ssq_orders")
    return spark.sql(SCALAR_SUBQ_SQL.format(orders="ssq_orders"))


LATERAL_SQL = """
SELECT seg.c_mktsegment, top3.o_orderkey, top3.total_cents
FROM (SELECT DISTINCT c_mktsegment FROM {customer}) seg,
LATERAL (
  SELECT o.o_orderkey,
         CAST(ROUND(o.o_totalprice * 100.0, 0) AS BIGINT) AS total_cents
  FROM {orders} o JOIN {customer} c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = seg.c_mktsegment
  ORDER BY o.o_totalprice DESC, o.o_orderkey
  LIMIT 3
) top3
ORDER BY seg.c_mktsegment, top3.total_cents DESC, top3.o_orderkey
"""


@query(
    "q98_lateral_topk",
    oracle=LATERAL_SQL.format(customer="customer", orders="orders"),
    tags=("sql", "join", "window"),
)
def q98_lateral_topk(spark, sf_dir):
    """LATERAL correlated subquery: top-3 orders per market segment,
    written as a per-segment dependent subquery (the shape users write)
    rather than a window function. Catalyst decorrelates the LIMIT-under-
    LATERAL into a ranked join — executed once over the joined input,
    never once per outer row. Ordering key (o_totalprice DESC,
    o_orderkey) is unique, so the top-3 cut is deterministic in both
    engines."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(
        LATERAL_SQL.format(customer="lat_customer", orders="lat_orders")
    )


GROUPBY_ALL_SQL = """
SELECT l_returnflag,
       l_linestatus,
       CAST(YEAR(l_shipdate) AS INT) AS ship_year,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100.0, 0) AS BIGINT))
            AS BIGINT) AS sum_price_cents
FROM {lineitem}
GROUP BY ALL
ORDER BY ALL
"""


@query(
    "q99_groupby_all",
    oracle=GROUPBY_ALL_SQL.format(lineitem="lineitem"),
    tags=("sql", "agg"),
)
def q99_groupby_all(spark, sf_dir):
    """GROUP BY ALL / ORDER BY ALL (dialect sugar both engines share):
    groups by every non-aggregate select item including the computed
    ship_year. Resolves at analysis time to an ordinary hash aggregate —
    partial map-side combine, one exchange on the three keys."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("gba_lineitem")
    return spark.sql(GROUPBY_ALL_SQL.format(lineitem="gba_lineitem"))


VALUES_DIM_SQL = """
WITH tiers AS (
  SELECT * FROM (VALUES ('small', 0.0, 2000.0),
                        ('mid', 2000.0, 6000.0),
                        ('big', 6000.0, 1e12)) AS t(tier, lo, hi)
)
SELECT t.tier,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(ROUND(c.c_acctbal * 100.0, 0) AS BIGINT))
            AS BIGINT) AS sum_acctbal_cents
FROM {customer} c
JOIN tiers t ON c.c_acctbal >= t.lo AND c.c_acctbal < t.hi
GROUP BY t.tier
ORDER BY t.tier
"""


@query(
    "q100_values_dim_join",
    oracle=VALUES_DIM_SQL.format(customer="customer"),
    tags=("sql", "join"),
)
def q100_values_dim_join(spark, sf_dir):
    """Inline VALUES dimension (banding table) range-joined to a fact
    column. The 3-row literal side broadcasts (BroadcastNestedLoopJoin
    over a 3-row build is constant work per row — the correct plan for a
    banding join); negative acctbals fall outside every band, which the
    inner join drops identically in both engines."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("vd_customer")
    return spark.sql(VALUES_DIM_SQL.format(customer="vd_customer"))


# One SQL text for both engines (no dialect divergence): bounded-depth
# BFS so the cyclic transition graph terminates under UNION ALL
# semantics in both, with MIN(hop) collapsing the path fan-out.
_BFS_SQL = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM {events}
), edges AS (
  SELECT DISTINCT prev_type AS src, event_type AS dst
  FROM seq WHERE prev_type IS NOT NULL AND prev_type <> event_type
), hops (node, hop) AS (
  SELECT CAST('signup' AS {strtype}), 0
  UNION ALL
  SELECT e.dst, h.hop + 1
  FROM hops h JOIN edges e ON e.src = h.node
  WHERE h.hop < 4
)
SELECT node, CAST(MIN(hop) AS INT) AS hops
FROM hops
GROUP BY node
ORDER BY node
"""


@query(
    "q137_recursive_bfs",
    oracle=_BFS_SQL.format(events="events", strtype="VARCHAR"),
    tags=("sql", "recursive", "iterative"),
)
def q137_recursive_bfs(spark, sf_dir):
    """Recursive CTE (WITH RECURSIVE, Spark 4 engine surface): BFS hop
    counts from 'signup' over the event-transition graph. The recursion
    is depth-bounded (hop < 4) so the cyclic graph terminates under
    UNION ALL in both engines, and MIN(hop) collapses path fan-out to
    shortest-hop labels. Edge extraction is the distributed part (lag
    window + DISTINCT, one user_id shuffle); the recursion itself runs
    on the dimension-sized edge set. Same SQL text runs on both engines
    modulo the string-type cast."""
    table(spark, sf_dir, "events").createOrReplaceTempView("bfs_events")
    return spark.sql(_BFS_SQL.format(events="bfs_events", strtype="STRING"))


@query(
    "q276_parameterized_sql",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(ROUND(c_acctbal * 100.0, 0) AS BIGINT)) AS BIGINT)
         AS balance_cents
FROM customer
WHERE c_acctbal > 1000.0 AND c_nationkey < 10
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("sql", "api"),
)
def q276_parameterized_sql(spark, sf_dir):
    """Named-parameter SQL (Spark 3.4+ spark.sql(query, args)): the
    injection-safe templating surface a query service builds on —
    parameters bind as typed literals in the parser, never by string
    concatenation, so a hostile or odd value cannot change the query
    shape, and the SAME text compiles to the same plan cache entry
    across parameter values. The query itself is a plain filtered
    aggregate; what's under test is that the bound parameters reach
    Catalyst as literals (the plan shows them constant-folded and
    pushed into the scan like any literal filter)."""
    from ..sources import table as _table

    _table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_psql"
    )
    return spark.sql(
        """
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(ROUND(c_acctbal * 100.0, 0) AS BIGINT))
                    AS BIGINT) AS balance_cents
        FROM customer_psql
        WHERE c_acctbal > :min_bal AND c_nationkey < :max_nation
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """,
        args={"min_bal": 1000.0, "max_nation": 10},
    )


@query(
    "a356_sql_udf",
    oracle="""
SELECT CASE WHEN c_acctbal < 0.0 THEN 'neg'
            WHEN c_acctbal < 5000.0 THEN 'mid'
            ELSE 'high' END AS band,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(ROUND(c_acctbal * 100.0, 0) AS BIGINT)) AS BIGINT)
         AS balance_cents
FROM customer
GROUP BY band
ORDER BY band
""",
    tags=("sql", "api", "udf"),
)
def a356_sql_udf(spark, sf_dir):
    """SQL-defined scalar functions (Spark 4 CREATE FUNCTION … RETURN
    expr, SPARK-46246) — the UDF surface with ZERO engine cost: the
    analyzer inlines the RETURN expression at every call site, so
    `cents(x)` and `bal_band(x)` compile into the same whole-stage
    codegen the hand-inlined expression would, with none of a Python
    UDF's serialization hop. This is the right default for shared
    business logic at 100 TB (define once, reuse everywhere, still
    vectorized JVM execution); the oracle is the same query with the
    bodies inlined by hand — identical results prove the inlining is
    semantic identity. Session-scoped temporary functions; catalog
    registration would persist them for every reader."""
    from ..sources import table as _table

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cents(p DOUBLE)"
        " RETURNS BIGINT RETURN CAST(ROUND(p * 100.0, 0) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION bal_band(b DOUBLE)"
        " RETURNS STRING RETURN CASE WHEN b < 0.0 THEN 'neg'"
        " WHEN b < 5000.0 THEN 'mid' ELSE 'high' END"
    )
    _table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_sqludf"
    )
    return spark.sql(
        """
        SELECT bal_band(c_acctbal) AS band,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(cents(c_acctbal)) AS BIGINT) AS balance_cents
        FROM customer_sqludf
        GROUP BY band
        ORDER BY band
        """
    )


@query(
    "a370_sql_pipe_syntax",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100.0, 0) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_quantity > 10.0
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("sql", "api"),
)
def a370_sql_pipe_syntax(spark, sf_dir):
    """SQL pipe syntax (Spark 4, SPARK-49555: `FROM t |> WHERE … |>
    AGGREGATE …`) — the linear, top-to-bottom query dialect where each
    |> stage transforms the previous result, eliminating the
    inside-out reading order of nested SQL. Semantically IDENTICAL to
    the classic form (the parser lowers pipes to the same logical
    plan, so Catalyst optimizes both identically — filter still pushes
    to the scan); the oracle is the classic-syntax twin, and the hash
    match is the proof of plan equivalence. Engine-surface coverage:
    a user of pipe-dialect queries can run them unchanged."""
    from ..sources import table as _table

    _table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_pipe"
    )
    return spark.sql(
        """
        FROM lineitem_pipe
        |> WHERE l_quantity > 10.0
        |> EXTEND CAST(ROUND(l_extendedprice * 100.0, 0) AS BIGINT)
             AS cents
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(cents) AS BIGINT) AS revenue_cents
             GROUP BY l_returnflag
        |> ORDER BY l_returnflag
        """
    )


@query(
    "a390_sql_scripting",
    oracle="""
WITH RECURSIVE s AS (
  SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT))
              AS DOUBLE) AS v
  FROM orders
), it AS (
  SELECT 0 AS i, v AS x, v FROM s
  UNION ALL
  SELECT i + 1, (x + v / x) / 2.0, v FROM it WHERE i < 40
)
SELECT CAST(v AS BIGINT) AS total_cents,
       round(x, 6) AS scripted_sqrt_r,
       round(sqrt(v), 6) AS builtin_sqrt_r
FROM it WHERE i = 40
""",
    tags=("sql", "scripting"),
)
def a390_sql_scripting(spark, sf_dir):
    """SQL scripting (Spark 4, SQL/PSM BEGIN…END with DECLARE and
    WHILE) — procedural control flow INSIDE the SQL surface, no driver
    round-trips per iteration: the script reads the revenue total from
    a table, then runs 40 Babylonian iterations x ← (x + S/x)/2 as a
    WHILE loop over session variables. The oracle replays the
    IDENTICAL iteration as a recursive CTE (same arithmetic, same
    count, seeded x₀ = S), so the scripted and relational control
    flows must agree to the bit — and both land on the builtin sqrt
    at 6dp, the convergence sanity check. This is the surface
    migration tooling needs for stored-procedure-shaped workloads."""
    from ..sources import table as _table

    spark.conf.set("spark.sql.scripting.enabled", "true")
    _table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_script"
    )
    return spark.sql(
        """
BEGIN
  DECLARE v DOUBLE;
  DECLARE x DOUBLE;
  DECLARE i INT = 0;
  SET v = (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0)
                              AS BIGINT)) AS DOUBLE)
           FROM orders_script);
  SET x = v;
  WHILE i < 40 DO
    SET x = (x + v / x) / 2.0;
    SET i = i + 1;
  END WHILE;
  SELECT CAST(v AS BIGINT) AS total_cents,
         round(x, 6) AS scripted_sqrt_r,
         round(sqrt(v), 6) AS builtin_sqrt_r;
END
"""
    )


@query(
    "a391_identifier_clause",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT))
            AS BIGINT) AS cents
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("sql", "api"),
)
def a391_identifier_clause(spark, sf_dir):
    """IDENTIFIER() clause — injection-safe DYNAMIC table and column
    names (the q276 parameter story extended to identifiers, which
    plain parameters cannot name): the table, group column, and
    measure column all arrive as bound string parameters resolved
    through IDENTIFIER(), so a query service can template over
    physical names without string concatenation — the identifier is
    validated as a name, never spliced as SQL text. The plan is
    byte-identical to the static query (resolution happens at
    analysis), which the oracle hash-match proves."""
    from ..sources import table as _table

    _table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_ident"
    )
    return spark.sql(
        """
        SELECT IDENTIFIER(:g) AS o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(IDENTIFIER(:m) * 100.0, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM IDENTIFIER(:t)
        GROUP BY IDENTIFIER(:g)
        ORDER BY IDENTIFIER(:g)
        """,
        args={
            "t": "orders_ident",
            "g": "o_orderpriority",
            "m": "o_totalprice",
        },
    )


@query(
    "a429_lateral_column_alias",
    oracle="""
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(total_cents) AS BIGINT) AS billed_cents
FROM (
  SELECT o_orderstatus,
         CAST(ROUND(o_totalprice * 90.0, 0) AS BIGINT) AS disc_cents,
         CAST(ROUND(disc_cents * 0.07, 0) AS BIGINT) AS tax_cents,
         disc_cents + tax_cents AS total_cents
  FROM orders
)
GROUP BY status
ORDER BY status
""",
    tags=("sql", "battery"),
)
def a429_lateral_column_alias(spark, sf_dir):
    """Lateral column aliases (Spark 3.4+/SPARK-27561; DuckDB shares
    the dialect): a SELECT item referencing an alias defined EARLIER
    in the same SELECT list — `disc AS d, d*0.07 AS tax, d+tax` —
    the ergonomic chain that otherwise forces nested subqueries or
    repeated expressions. The analyzer inlines each alias (the plan is
    identical to the expanded form, so nothing is evaluated twice),
    and because BOTH engines support the surface, the oracle is the
    LITERAL SAME SQL text — the strongest possible dialect-parity
    check. The chain computes a fixed-point billing cascade
    (discounted cents → 7% tax → total) so every step is exact
    integer arithmetic; folded per order status."""
    from ..sources import table as _table

    _table(spark, sf_dir, "orders").createOrReplaceTempView("lca_orders")
    return spark.sql(
        """
        SELECT o_orderstatus AS status,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(total_cents) AS BIGINT) AS billed_cents
        FROM (
          SELECT o_orderstatus,
                 CAST(ROUND(o_totalprice * 90.0, 0) AS BIGINT) AS disc_cents,
                 CAST(ROUND(disc_cents * 0.07, 0) AS BIGINT) AS tax_cents,
                 disc_cents + tax_cents AS total_cents
          FROM lca_orders
        )
        GROUP BY status
        ORDER BY status
        """
    )
