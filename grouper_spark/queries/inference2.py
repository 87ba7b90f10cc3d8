"""Round-7 battery II (a059+): homogeneity/changepoint tests,
randomness, time-series model fits, and intermittent-demand
forecasting the earlier batteries did not cover — Pettitt, Buishand
range + SNHT, Bartels rank von Neumann, Yule–Walker AR(2), Croston.

Same design discipline as inference.py: the corpus folds ONCE to a
calendar-bounded daily summary (~2.4k rows at every sf — the date
range is fixed, so the post-fold windows are O(days), not O(rows),
and hold at 100 TB); all cross-row sums are exact BIGINTs (doubled
midranks for tie-exact rank statistics, fixed-point weight tables
generated in Python and embedded as literals in BOTH plans);
transcendentals run once on identical exact inputs into a terminal
``round(x, 6)``. Reference parity target: junegunn/grouper exposes no
statistics surface (src/grouper/core.clj is a micro-batching
utility); these extend pipeline-monitoring analytics.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..sources import table
from . import query

# Shared base series: daily order revenue in whole dollars — exact
# integer fold (cents round, then integer div), one shuffle on the
# date key, bounded by the calendar (~2.4k rows at any sf).
_DAILY_SQL = """
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) // 100
              AS BIGINT) AS x
  FROM orders GROUP BY 1
"""


def _daily(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.expr(
            "CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT))"
            " div 100 AS BIGINT)"
        ).alias("x")
    )


@query(
    "a059_pettitt_changepoint",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
hist AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS g FROM daily GROUP BY x
), ranked AS (
  SELECT x,
         CAST(2 * COALESCE(SUM(g) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + g + 1 AS BIGINT) AS dr
  FROM hist
), ut AS (
  SELECT d.d,
         CAST(SUM(r.dr - (n.n + 1)) OVER (ORDER BY d.d)
              AS BIGINT) AS u_t
  FROM daily d JOIN ranked r ON d.x = r.x CROSS JOIN n
), best AS (
  SELECT u_t AS u_star, d AS change_date
  FROM ut ORDER BY ABS(u_t) DESC, d ASC LIMIT 1
)
SELECT n.n AS n_days,
       CAST(ABS(b.u_star) // 2 AS BIGINT) AS k_stat,
       b.change_date,
       round(2.0 * EXP(-6.0 * (CAST(ABS(b.u_star) AS DOUBLE) / 2.0)
                            * (CAST(ABS(b.u_star) AS DOUBLE) / 2.0)
                     / (CAST(n.n AS DOUBLE) * n.n * n.n
                        + CAST(n.n AS DOUBLE) * n.n)), 6) AS p_approx_r
FROM best b CROSS JOIN n
""",
)
def a059_pettitt_changepoint(spark, sf_dir):
    """Pettitt rank-based changepoint test on the daily order-revenue
    series. The Mann–Whitney-style statistic U_t = Σ_{i≤t}Σ_{j>t}
    sgn(x_i−x_j) collapses — because the i,j≤t block is antisymmetric
    — to the cumulative sum of per-day sign-sums, and each sign-sum
    equals (2·midrank − n − 1) EXACTLY under ties, so the whole test
    is a value histogram + two windows with zero pairwise joins.
    Doubled midranks (2c_less + g + 1) keep every term integer; K =
    max|U_t| is an exact BIGINT halved at readout, and the single
    exp() runs once on the final K. At 100 TB: one orders shuffle on
    the date key, then O(days) work; the ORDER BY-ABS argmax touches
    ~2.4k rows."""
    daily = _daily(spark, sf_dir)
    n = daily.agg(F.count("*").cast("bigint").alias("n"))
    hist = daily.groupBy("x").agg(F.count("*").cast("bigint").alias("g"))
    wv = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.select(
        "x",
        (
            2 * F.coalesce(F.sum("g").over(wv), F.lit(0)) + F.col("g") + 1
        ).cast("bigint").alias("dr"),
    )
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    ut = (
        daily.join(ranked, "x")
        .crossJoin(F.broadcast(n))
        .select(
            "d",
            F.sum(F.col("dr") - (F.col("n") + 1)).over(wd)
            .cast("bigint").alias("u_t"),
        )
    )
    best = ut.orderBy(F.abs("u_t").desc(), F.col("d").asc()).limit(1)
    ad = F.abs(F.col("u_t")).cast("double") / 2.0
    nn = F.col("n").cast("double")
    return best.crossJoin(F.broadcast(n)).select(
        F.col("n").alias("n_days"),
        F.expr("CAST(ABS(u_t) div 2 AS BIGINT)").alias("k_stat"),
        F.col("d").alias("change_date"),
        F.round(
            2.0 * F.exp(-6.0 * ad * ad / (nn * nn * nn + nn * nn)), 6
        ).alias("p_approx_r"),
    )


@query(
    "a060_buishand_snht",
    oracle=f"""
WITH daily AS (
  SELECT d, CAST(x // 100 AS BIGINT) AS x FROM ({_DAILY_SQL})
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS t,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM daily
), pre AS (
  SELECT d.d,
         CAST(ROW_NUMBER() OVER (ORDER BY d.d) AS BIGINT) AS k,
         CAST(t.n * SUM(d.x) OVER (ORDER BY d.d)
              - ROW_NUMBER() OVER (ORDER BY d.d) * t.t
              AS BIGINT) AS dk
  FROM daily d CROSS JOIN tot t
), s AS (
  SELECT SQRT((CAST(t.n AS DOUBLE) * t.sxx - CAST(t.t AS DOUBLE) * t.t)
              / (CAST(t.n AS DOUBLE) * (t.n - 1))) AS sd, t.n, t.t
  FROM tot t
), snht AS (
  SELECT p.d,
         (CAST(p.dk AS DOUBLE) * p.dk)
           / (CAST(s.n AS DOUBLE) * s.n * s.sd * s.sd)
           * (1.0 / p.k + 1.0 / (s.n - p.k)) AS t_k
  FROM pre p CROSS JOIN s WHERE p.k < (SELECT n FROM tot)
), tmax AS (
  SELECT t_k AS t_star, d AS snht_date FROM snht
  ORDER BY t_k DESC, d ASC LIMIT 1
)
SELECT s.n AS n_days,
       round((CAST(MAX(p.dk) AS DOUBLE) - MIN(p.dk))
             / (CAST(s.n AS DOUBLE) * s.sd) / SQRT(CAST(s.n AS DOUBLE)),
             6) AS buishand_rsqn_r,
       round(MAX(tm.t_star), 6) AS snht_t_r,
       MAX(tm.snht_date) AS snht_date
FROM pre p CROSS JOIN s CROSS JOIN tmax tm
GROUP BY s.n, s.sd
""",
)
def a060_buishand_snht(spark, sf_dir):
    """Buishand range test + standard normal homogeneity test (SNHT)
    on the daily revenue series, quantized to whole hundreds of
    dollars so every cumulative deviation stays exact: n·S_k = n·P_k
    − k·T is an exact BIGINT (≤ ~5e12 at sf0.1, ~5e14 at the 10×
    audit point — headroom to sf100). Buishand R/√n = (max−min of
    nS_k)/(n·s·√n); SNHT T_k = D_k²/(n²s²)·(1/k + 1/(n−k)) maximized
    over k with its argmax date. One orders fold, O(days) windows; sd
    and the divisions are terminal doubles off exact integers."""
    daily = _daily(spark, sf_dir).select(
        "d", F.expr("CAST(x div 100 AS BIGINT)").alias("x")
    )
    tot = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("t"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    wd = Window.orderBy("d")
    pre = (
        daily.crossJoin(F.broadcast(tot))
        .select(
            "d",
            "n",
            "t",
            "sxx",
            F.row_number().over(wd).cast("bigint").alias("k"),
            F.sum("x").over(
                wd.rowsBetween(Window.unboundedPreceding, 0)
            ).cast("bigint").alias("pk"),
        )
        .withColumn(
            "dk", (F.col("n") * F.col("pk") - F.col("k") * F.col("t"))
            .cast("bigint")
        )
    )
    nd = F.col("n").cast("double")
    sd = F.sqrt(
        (nd * F.col("sxx") - F.col("t").cast("double") * F.col("t"))
        / (nd * (nd - 1.0))
    )
    snht = pre.filter(F.col("k") < F.col("n")).select(
        "d",
        (
            F.col("dk").cast("double") * F.col("dk") / (nd * nd * sd * sd)
            * (1.0 / F.col("k").cast("double")
               + 1.0 / (nd - F.col("k").cast("double")))
        ).alias("t_k"),
    )
    tmax = snht.orderBy(F.col("t_k").desc(), F.col("d").asc()).limit(1)
    agg = pre.groupBy("n", "t", "sxx").agg(
        F.max("dk").cast("bigint").alias("dmax"),
        F.min("dk").cast("bigint").alias("dmin"),
    )
    return agg.crossJoin(F.broadcast(tmax)).select(
        F.col("n").alias("n_days"),
        F.round(
            (F.col("dmax").cast("double") - F.col("dmin"))
            / (nd * sd) / F.sqrt(nd),
            6,
        ).alias("buishand_rsqn_r"),
        F.round("t_k", 6).alias("snht_t_r"),
        F.col("d").alias("snht_date"),
    )


@query(
    "a061_bartels_rank_vn",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
hist AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS g FROM daily GROUP BY x
), ranked AS (
  SELECT x,
         CAST(2 * COALESCE(SUM(g) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + g + 1 AS BIGINT) AS dr
  FROM hist
), seq AS (
  SELECT r.dr,
         LEAD(r.dr) OVER (ORDER BY d.d) AS dr_next,
         n.n
  FROM daily d JOIN ranked r ON d.x = r.x CROSS JOIN n
), parts AS (
  SELECT MAX(n) AS n,
         CAST(SUM(CASE WHEN dr_next IS NOT NULL
                       THEN (dr - dr_next) * (dr - dr_next) END)
              AS BIGINT) AS num,
         CAST(SUM((dr - (n + 1)) * (dr - (n + 1))) AS BIGINT) AS den
  FROM seq
)
SELECT n AS n_days,
       round(CAST(num AS DOUBLE) / den, 6) AS rvn_r,
       round((CAST(num AS DOUBLE) / den - 2.0)
             / SQRT(4.0 * (n - 2) * (5.0 * n * n - 2.0 * n - 9.0)
                    / (5.0 * CAST(n AS DOUBLE) * (n + 1)
                       * (CAST(n AS DOUBLE) - 1) * (n - 1))),
             6) AS z_r
FROM parts
""",
)
def a061_bartels_rank_vn(spark, sf_dir):
    """Bartels rank von Neumann ratio test for randomness of the
    daily revenue sequence: RVN = Σ(r_i − r_{i+1})² / Σ(r_i − r̄)²
    over tie-exact midranks. Doubled midranks make BOTH sums exact
    BIGINTs (the ×4 scaling cancels in the ratio), and r̄ = (n+1)/2
    doubles to exactly n+1 — no fractional mean anywhere. The normal
    approximation z uses the exact-rational variance 4(n−2)(5n²−2n−9)
    / (5n(n+1)(n−1)²). Histogram + two O(days) windows; no pairwise
    joins. At 100 TB the only corpus-sized stage is the date fold."""
    daily = _daily(spark, sf_dir)
    n = daily.agg(F.count("*").cast("bigint").alias("n"))
    hist = daily.groupBy("x").agg(F.count("*").cast("bigint").alias("g"))
    wv = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.select(
        "x",
        (
            2 * F.coalesce(F.sum("g").over(wv), F.lit(0)) + F.col("g") + 1
        ).cast("bigint").alias("dr"),
    )
    wd = Window.orderBy("d")
    seq = (
        daily.join(ranked, "x")
        .crossJoin(F.broadcast(n))
        .select("dr", F.lead("dr").over(wd).alias("dr_next"), "n")
    )
    diff = F.col("dr") - F.col("dr_next")
    dev = F.col("dr") - (F.col("n") + 1)
    parts = seq.agg(
        F.max("n").alias("n"),
        F.sum(
            F.when(F.col("dr_next").isNotNull(), diff * diff)
        ).cast("bigint").alias("num"),
        F.sum(dev * dev).cast("bigint").alias("den"),
    )
    nd = F.col("n").cast("double")
    rvn = F.col("num").cast("double") / F.col("den")
    sigma = F.sqrt(
        4.0 * (nd - 2.0) * (5.0 * nd * nd - 2.0 * nd - 9.0)
        / (5.0 * nd * (nd + 1.0) * (nd - 1.0) * (nd - 1.0))
    )
    return parts.select(
        F.col("n").alias("n_days"),
        F.round(rvn, 6).alias("rvn_r"),
        F.round((rvn - 2.0) / sigma, 6).alias("z_r"),
    )


@query(
    "a062_yule_walker_ar2",
    oracle=f"""
WITH daily AS (
  SELECT d, CAST(x // 100 AS BIGINT) AS x FROM ({_DAILY_SQL})
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS t
  FROM daily
), lagged AS (
  SELECT x,
         LAG(x, 1) OVER (ORDER BY d) AS x1,
         LAG(x, 2) OVER (ORDER BY d) AS x2
  FROM daily
), moments AS (
  SELECT CAST(SUM(x * x) AS BIGINT) AS sxx0,
         CAST(SUM(x * x1) AS BIGINT) AS sxx1,
         CAST(SUM(x * x2) AS BIGINT) AS sxx2,
         CAST(SUM(CASE WHEN x1 IS NOT NULL THEN x + x1 END)
              AS BIGINT) AS sab1,
         CAST(SUM(CASE WHEN x2 IS NOT NULL THEN x + x2 END)
              AS BIGINT) AS sab2
  FROM lagged
), g AS (
  SELECT t.n,
         CAST(t.n * t.n * m.sxx0 - 2 * t.n * t.t * t.t
              + t.n * t.t * t.t AS BIGINT) AS g0,
         CAST(t.n * t.n * m.sxx1 - t.n * t.t * m.sab1
              + (t.n - 1) * t.t * t.t AS BIGINT) AS g1,
         CAST(t.n * t.n * m.sxx2 - t.n * t.t * m.sab2
              + (t.n - 2) * t.t * t.t AS BIGINT) AS g2
  FROM tot t CROSS JOIN moments m
)
SELECT n AS n_days,
       round(CAST(g1 AS DOUBLE) / g0, 6) AS r1_r,
       round(CAST(g2 AS DOUBLE) / g0, 6) AS r2_r,
       round((CAST(g1 AS DOUBLE) / g0)
             * (1.0 - CAST(g2 AS DOUBLE) / g0)
             / (1.0 - (CAST(g1 AS DOUBLE) / g0)
                      * (CAST(g1 AS DOUBLE) / g0)), 6) AS phi1_r,
       round((CAST(g2 AS DOUBLE) / g0 - (CAST(g1 AS DOUBLE) / g0)
                                        * (CAST(g1 AS DOUBLE) / g0))
             / (1.0 - (CAST(g1 AS DOUBLE) / g0)
                      * (CAST(g1 AS DOUBLE) / g0)), 6) AS phi2_r,
       round(1.0
             - ((CAST(g1 AS DOUBLE) / g0) * (1.0 - CAST(g2 AS DOUBLE) / g0)
                / (1.0 - (CAST(g1 AS DOUBLE) / g0)
                         * (CAST(g1 AS DOUBLE) / g0)))
               * (CAST(g1 AS DOUBLE) / g0)
             - ((CAST(g2 AS DOUBLE) / g0
                 - (CAST(g1 AS DOUBLE) / g0) * (CAST(g1 AS DOUBLE) / g0))
                / (1.0 - (CAST(g1 AS DOUBLE) / g0)
                         * (CAST(g1 AS DOUBLE) / g0)))
               * (CAST(g2 AS DOUBLE) / g0), 6) AS noise_ratio_r
FROM g
""",
)
def a062_yule_walker_ar2(spark, sf_dir):
    """Yule–Walker AR(2) fit to the daily revenue series (hundred-
    dollar units). Autocovariance numerators are n²-scaled EXACT
    BIGINTs: n²Σx_i x_{i+k} − nT·Σ(x_i + x_{i+k}) + (n−k)T², expanded
    so no fractional mean enters before the terminal ratios (≤ ~1e16
    at sf0.1, ~1e18 at the 10× point — documented headroom cap).
    r1, r2 and the closed-form φ1 = r1(1−r2)/(1−r1²), φ2 =
    (r2−r1²)/(1−r1²), innovation ratio 1 − φ1r1 − φ2r2 are terminal
    doubles. One date-keyed fold, two LAG windows over ~2.4k rows."""
    daily = _daily(spark, sf_dir).select(
        "d", F.expr("CAST(x div 100 AS BIGINT)").alias("x")
    )
    tot = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("t"),
    )
    wd = Window.orderBy("d")
    lagged = daily.select(
        "x",
        F.lag("x", 1).over(wd).alias("x1"),
        F.lag("x", 2).over(wd).alias("x2"),
    )
    moments = lagged.agg(
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx0"),
        F.sum(F.col("x") * F.col("x1")).cast("bigint").alias("sxx1"),
        F.sum(F.col("x") * F.col("x2")).cast("bigint").alias("sxx2"),
        F.sum(
            F.when(F.col("x1").isNotNull(), F.col("x") + F.col("x1"))
        ).cast("bigint").alias("sab1"),
        F.sum(
            F.when(F.col("x2").isNotNull(), F.col("x") + F.col("x2"))
        ).cast("bigint").alias("sab2"),
    )
    g = moments.crossJoin(F.broadcast(tot)).select(
        "n",
        (
            F.col("n") * F.col("n") * F.col("sxx0")
            - 2 * F.col("n") * F.col("t") * F.col("t")
            + F.col("n") * F.col("t") * F.col("t")
        ).cast("bigint").alias("g0"),
        (
            F.col("n") * F.col("n") * F.col("sxx1")
            - F.col("n") * F.col("t") * F.col("sab1")
            + (F.col("n") - 1) * F.col("t") * F.col("t")
        ).cast("bigint").alias("g1"),
        (
            F.col("n") * F.col("n") * F.col("sxx2")
            - F.col("n") * F.col("t") * F.col("sab2")
            + (F.col("n") - 2) * F.col("t") * F.col("t")
        ).cast("bigint").alias("g2"),
    )
    r1 = F.col("g1").cast("double") / F.col("g0")
    r2 = F.col("g2").cast("double") / F.col("g0")
    phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    return g.select(
        F.col("n").alias("n_days"),
        F.round(r1, 6).alias("r1_r"),
        F.round(r2, 6).alias("r2_r"),
        F.round(phi1, 6).alias("phi1_r"),
        F.round(phi2, 6).alias("phi2_r"),
        F.round(1.0 - phi1 * r1 - phi2 * r2, 6).alias("noise_ratio_r"),
    )


# Croston SES weights α(1−α)^k at α=0.2, k = 0..127 (ages beyond 128
# carry < 4e-13 of the weight), at 1e12 fixed point — Python-generated
# literals embedded in BOTH plans (the a032/a016 constant-table
# recipe) so the weighted sums are exact BIGINTs in both engines.
_CROSTON_ALPHA = 0.2
_CROSTON_K = 128
_CROSTON_ROWS = [
    (k, int(round(_CROSTON_ALPHA * (1.0 - _CROSTON_ALPHA) ** k * 1e12)))
    for k in range(_CROSTON_K)
]
_CROSTON_VALUES = ", ".join(f"({k}, {w})" for k, w in _CROSTON_ROWS)


@query(
    "a063_croston_intermittent",
    oracle=f"""
WITH w(age, wfp) AS (VALUES {_CROSTON_VALUES}),
demand AS (
  SELECT CAST(l_partkey % 97 AS BIGINT) AS bkt,
         CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS z
  FROM lineitem GROUP BY 1, 2
), seq AS (
  SELECT bkt, z,
         CAST(DATEDIFF('day',
              LAG(d) OVER (PARTITION BY bkt ORDER BY d), d)
              AS BIGINT) AS gap,
         CAST(ROW_NUMBER() OVER (PARTITION BY bkt ORDER BY d DESC)
              AS BIGINT) - 1 AS age
  FROM demand
), recent AS (
  SELECT s.bkt, s.z, s.gap, w.wfp
  FROM seq s JOIN w ON s.age = w.age
), fit AS (
  SELECT bkt,
         CAST(COUNT(*) AS BIGINT) AS m_obs,
         CAST(SUM(z * wfp) AS BIGINT) AS zw,
         CAST(SUM(wfp) AS BIGINT) AS wsum,
         CAST(SUM(CASE WHEN gap IS NOT NULL THEN gap * wfp END)
              AS BIGINT) AS pw,
         CAST(SUM(CASE WHEN gap IS NOT NULL THEN wfp END)
              AS BIGINT) AS pwsum
  FROM recent GROUP BY bkt
)
SELECT bkt, m_obs,
       round(CAST(zw AS DOUBLE) / wsum, 6) AS z_hat_r,
       round(CAST(pw AS DOUBLE) / pwsum, 6) AS p_hat_r,
       round((CAST(zw AS DOUBLE) / wsum)
             / (CAST(pw AS DOUBLE) / pwsum), 6) AS croston_r,
       round((1.0 - {_CROSTON_ALPHA} / 2.0)
             * (CAST(zw AS DOUBLE) / wsum)
             / (CAST(pw AS DOUBLE) / pwsum), 6) AS sba_r
FROM fit
ORDER BY bkt
""",
)
def a063_croston_intermittent(spark, sf_dir):
    """Croston intermittent-demand forecast per part bucket (97
    series, ~23% of (bucket, day) slots carry demand in this
    fixture). Demand sizes and inter-arrival gaps are smoothed with
    truncated-renormalized SES(α=0.2) over the most recent 128
    nonzero observations — the truncation carries < 4e-13 of the
    weight mass, and the weight table is Python-generated 1e12
    fixed-point literals embedded in both plans, so Σz·w and Σgap·w
    are exact BIGINTs. Forecast = ẑ/p̂, plus the Syntetos–Boylan
    (1−α/2) bias-corrected variant. One lineitem fold keyed
    (bucket, day), then bucket-partitioned windows over ≤ days rows
    per bucket; at 100 TB the fold is the only corpus-sized stage and
    the per-bucket state is capped at 128 rows by construction."""
    li = table(spark, sf_dir, "lineitem")
    demand = li.groupBy(
        (F.col("l_partkey") % 97).cast("bigint").alias("bkt"),
        F.to_date("l_shipdate").alias("d"),
    ).agg(
        F.sum(F.round("l_quantity", 0).cast("bigint"))
        .cast("bigint").alias("z")
    )
    wb = Window.partitionBy("bkt").orderBy("d")
    wr = Window.partitionBy("bkt").orderBy(F.col("d").desc())
    seq = demand.select(
        "bkt",
        "z",
        F.datediff(F.col("d"), F.lag("d").over(wb))
        .cast("bigint").alias("gap"),
        (F.row_number().over(wr).cast("bigint") - 1).alias("age"),
    )
    wtab = spark.createDataFrame(_CROSTON_ROWS, "age bigint, wfp bigint")
    recent = seq.join(F.broadcast(wtab), "age")
    fit = recent.groupBy("bkt").agg(
        F.count("*").cast("bigint").alias("m_obs"),
        F.sum(F.col("z") * F.col("wfp")).cast("bigint").alias("zw"),
        F.sum("wfp").cast("bigint").alias("wsum"),
        F.sum(
            F.when(F.col("gap").isNotNull(), F.col("gap") * F.col("wfp"))
        ).cast("bigint").alias("pw"),
        F.sum(
            F.when(F.col("gap").isNotNull(), F.col("wfp"))
        ).cast("bigint").alias("pwsum"),
    )
    z_hat = F.col("zw").cast("double") / F.col("wsum")
    p_hat = F.col("pw").cast("double") / F.col("pwsum")
    return fit.select(
        "bkt",
        "m_obs",
        F.round(z_hat, 6).alias("z_hat_r"),
        F.round(p_hat, 6).alias("p_hat_r"),
        F.round(z_hat / p_hat, 6).alias("croston_r"),
        F.round(
            (1.0 - _CROSTON_ALPHA / 2.0) * z_hat / p_hat, 6
        ).alias("sba_r"),
    ).orderBy("bkt")
