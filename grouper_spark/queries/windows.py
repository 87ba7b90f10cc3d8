"""Window functions: ranking, analytic frames, top-k per group, as-of join.

Every window partitions on a real key (customer / user) — at 100 TB the
window is one shuffle on that key and per-partition sort; there are no
global (unpartitioned) windows anywhere in this inventory, since those
serialize onto a single task.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.text import money
from ..operators import asof_join, topk_per_group
from ..sources import table
from . import query


@query(
    "q18_window_rank",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rk,
       DENSE_RANK() OVER w AS drk,
       NTILE(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
QUALIFY rn <= 5
ORDER BY o_custkey, rn
""",
    tags=("window",),
)
def q18_window_rank(spark, sf_dir):
    """Ranking battery (row_number/rank/dense_rank/ntile) per customer."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 5)
        .orderBy("o_custkey", "rn")
    )


@query(
    "q19_window_running",
    oracle="""
SELECT event_id, user_id, ts, value,
       CAST(SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
         AS DOUBLE) AS running_value,
       LAG(event_id) OVER w AS prev_event_id,
       LEAD(event_id) OVER w AS next_event_id,
       FIRST_VALUE(event_id) OVER w AS first_event_id
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, ts, event_id
""",
    tags=("window",),
)
def q19_window_running(spark, sf_dir):
    """Analytic frames: running sum (fixed-point, order-exact), lag/lead,
    first_value over a per-user event timeline."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.sum(money("value")).over(wrun) / 100.0).alias("running_value"),
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        F.first("event_id").over(w).alias("first_event_id"),
    ).orderBy("user_id", "ts", "event_id")


@query(
    "q20_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, rn
""",
    tags=("window", "operator"),
)
def q20_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer via the reusable topk_per_group operator."""
    o = table(spark, sf_dir, "orders")
    top = topk_per_group(
        o,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    )
    return top.select("o_custkey", "o_orderkey", "o_totalprice", "rn").orderBy(
        "o_custkey", "rn"
    )


@query(
    "q21_asof_join",
    oracle="""
SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts, s.value AS signup_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
ORDER BY p.event_id
""",
    tags=("window", "operator"),
)
def q21_asof_join(spark, sf_dir):
    """As-of (backward) join: each purchase matched to the user's most
    recent signup at-or-before it. Uses the union-merge asof_join operator
    (single sort-merge pass — no range explosion); oracle is DuckDB's
    native ASOF JOIN."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    signups = e.filter(F.col("event_type") == "signup")
    joined = asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_values=["value"],
        suffix="_signup",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_signup").alias("signup_ts"),
        F.col("value_signup").alias("signup_value"),
    ).orderBy("event_id")


@query(
    "q74_grouping_id",
    oracle="""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_flag,
       GROUPING(l_linestatus) AS g_status,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
    tags=("agg", "rollup"),
)
def q74_grouping_id(spark, sf_dir):
    """grouping() markers on rollup output: distinguishes a NULL group
    key in the data from the NULL a rollup subtotal synthesizes — the
    only correct way to consume rollup output downstream."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
            F.grouping("l_linestatus").cast("bigint").alias("g_status"),
            F.count("*").alias("n_items"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n_items")
        .orderBy(
            "g_flag",
            "g_status",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "q75_time_range_window",
    oracle="""
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT))
         OVER (PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
         AS BIGINT) AS hour_cents
FROM events
WHERE user_id < 10
ORDER BY user_id, ts, event_id
""",
    tags=("window", "event_time"),
)
def q75_time_range_window(spark, sf_dir):
    """Time-interval RANGE window frame: per-user rolling 1-hour sum —
    the frame is bounded by event-time distance, not row count.
    Frames are defined on WHOLE epoch seconds on BOTH sides
    (unix_timestamp truncates; the oracle floors epoch()) — framing one
    side on microsecond timestamps would silently disagree near the
    window edge. The sliding-aggregation shape behind rate limiting and
    rolling feature windows."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(money("value")).over(w).alias("hour_cents"),
    ).orderBy("user_id", "ts", "event_id")


@query(
    "a363_asof_tolerance",
    oracle="""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), matched AS (
  SELECT p.event_id,
         (SELECT max(c.ts) FROM clicks c
          WHERE c.user_id = p.user_id AND c.ts <= p.ts
            AND c.ts >= p.ts - INTERVAL 30 MINUTE) AS click_ts,
         p.ts
  FROM purchases p
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(click_ts) AS BIGINT) AS n_matched,
       CAST(SUM(CASE WHEN click_ts IS NOT NULL THEN
             (epoch_us(ts) - epoch_us(click_ts)) // 1000000 END)
            AS BIGINT) AS total_gap_s,
       round(CAST(SUM(CASE WHEN click_ts IS NOT NULL THEN
               (epoch_us(ts) - epoch_us(click_ts)) // 1000000 END)
             AS DOUBLE) / COUNT(click_ts), 6) AS avg_gap_s_r
FROM matched
""",
    tags=("window", "asof"),
)
def a363_asof_tolerance(spark, sf_dir):
    """As-of join WITH a staleness tolerance (pandas merge_asof
    ``tolerance``): each purchase is attributed to the user's most
    recent click only if it happened within 30 minutes — older context
    is treated as no match, the guard every feature-store lookup needs
    so a join never silently serves hours-stale features. Same
    union-merge single-sort plan as q21 (no range cross-join); the
    tolerance check is a post-carry filter on the carried timestamp,
    zero extra shuffles. The oracle is the correlated bounded-argmax
    subquery. Gaps aggregate as exact integer seconds."""
    from ..operators import asof_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    m = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        tolerance_s=1800,
    )
    # microsecond-exact gap floored to whole seconds as ONE division —
    # flooring each endpoint separately (unix_timestamp) disagrees with
    # the oracle's epoch_us difference whenever the fractional parts
    # straddle a second boundary
    gap = (
        (F.unix_micros("ts") - F.unix_micros("ts_asof")) / F.lit(1000000)
    ).cast("bigint")
    return m.agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.count("ts_asof").cast("bigint").alias("n_matched"),
        F.sum(F.when(F.col("ts_asof").isNotNull(), gap))
        .cast("bigint")
        .alias("total_gap_s"),
        F.round(
            F.sum(F.when(F.col("ts_asof").isNotNull(), gap)).cast("double")
            / F.count("ts_asof"),
            6,
        ).alias("avg_gap_s_r"),
    )


@query(
    "a365_numeric_range_frame",
    oracle="""
WITH priced AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(ROUND(o_totalprice, 0) AS BIGINT) AS dollars
  FROM orders
)
SELECT * FROM (
  SELECT o_orderkey, o_orderpriority, dollars,
         CAST(COUNT(*) OVER w AS BIGINT) AS n_peers,
         CAST(SUM(dollars) OVER w AS BIGINT) AS peer_dollars,
         round(CAST(AVG(dollars) OVER w AS DOUBLE), 6) AS peer_avg_r
  FROM priced
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY dollars
               RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
)
WHERE o_orderkey < 500
ORDER BY o_orderkey
""",
    tags=("window", "range-frame"),
)
def a365_numeric_range_frame(spark, sf_dir):
    """VALUE-based RANGE window frames on a NUMERIC ordering — each
    order's peer group is every same-priority order within ±$10k of
    its own price (q75 is the time-interval cousin; this is the price-
    neighborhood one: local density and local averages without
    binning, the exact form of 'compare me to my price band'). The
    frame is resolved by the engine's range-frame machinery in one
    sort per partition — no self-join on a band predicate, which is
    the O(n·band) trap this operator exists to avoid. AVG over BIGINT
    returns engine-specific types (Spark DOUBLE, DuckDB DOUBLE via
    explicit CAST) but identical values: it is the exact-integer
    SUM/COUNT ratio, rounded once. The o_orderkey filter bounds the
    OUTPUT rows; the window still sees every order — which forces the
    filter into an OUTER query in the oracle, because SQL WHERE runs
    BEFORE window functions."""
    o = table(spark, sf_dir, "orders")
    priced = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice"), 0).cast("bigint").alias("dollars"),
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("dollars")
        .rangeBetween(-10000, 10000)
    )
    return (
        priced.select(
            "o_orderkey",
            "o_orderpriority",
            "dollars",
            F.count("*").over(w).cast("bigint").alias("n_peers"),
            F.sum("dollars").over(w).cast("bigint").alias("peer_dollars"),
        )
        # peer_avg_r derived from the two frame aggregates in a
        # post-window projection: a sliding VALUE frame is recomputed
        # per row (no retraction for declarative aggregates), so a
        # third windowed AVG re-walked every frame buffer for a number
        # count+sum already determine — ABBA A/B 9.6 s → 5.6 s min
        # with byte-identical output (the exact bigint ratio is also
        # DuckDB's AVG-over-BIGINT arithmetic, where Spark's windowed
        # AVG sums doubles)
        .select(
            "o_orderkey",
            "o_orderpriority",
            "dollars",
            "n_peers",
            "peer_dollars",
            F.round(
                F.col("peer_dollars").cast("double") / F.col("n_peers"),
                6,
            ).alias("peer_avg_r"),
        )
        .filter(F.col("o_orderkey") < 500)
        .orderBy("o_orderkey")
    )

