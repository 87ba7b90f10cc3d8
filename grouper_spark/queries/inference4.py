"""Round-9 battery (a174–a198): signal filtering, serially-correlated
and zero-inflated regression corrections, exact dependence measures,
process mining, data valuation, bipartite graph motifs, method
comparison, and layout/locality audits the earlier batteries did not
cover.

Queued for future driver-sampler windows (aNNN past a078 sort outside
the round-9 first-50 window; see queries/aliases.py). Shared design
rules (the monitoring.py discipline): ONE map-side-combined aggregate
folds the corpus to a keyed summary; every cross-row sum is an exact
BIGINT (fixed-point where the source is a double); transcendentals run
once per group/bin/scalar on identical exact inputs and feed a terminal
``round(x, 6)``; pairwise self-joins only over calendar-bounded panels
(the daily panel is ≤2404 rows at EVERY corpus scale — the fixture
calendar does not grow with sf).

Reference parity target: junegunn/grouper exposes no statistics
surface (src/grouper/core.clj is a 155-line micro-batching utility);
these extend the engine's analytics coverage for pipeline monitoring
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..sources import table
from . import query

# Daily order volume + whole-dollar revenue — both exact BIGINTs.
# Shared by the filter/dependence/model-selection ops. The day panel is
# calendar-bounded (≤2404 rows at any sf), so per-day work and even
# day×day pairwise work is O(1) in corpus size; only the ONE groupBy
# that builds it scans the fact table.
_DAILYV_SQL = """
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS v,
         CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) // 100
              AS BIGINT) AS y
  FROM orders GROUP BY 1
"""


def _dailyv(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.count("*").cast("bigint").alias("v"),
            F.expr(
                "CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT))"
                " div 100 AS BIGINT)"
            ).alias("y"),
        )
        .localCheckpoint(eager=False)
    )


@query(
    "a174_savitzky_golay",
    oracle=f"""
WITH daily AS ({_DAILYV_SQL}),
lagged AS (
  SELECT d,
         LAG(v, 3) OVER (ORDER BY d) AS xm3,
         LAG(v, 2) OVER (ORDER BY d) AS xm2,
         LAG(v, 1) OVER (ORDER BY d) AS xm1,
         v AS x0,
         LEAD(v, 1) OVER (ORDER BY d) AS xp1,
         LEAD(v, 2) OVER (ORDER BY d) AS xp2,
         LEAD(v, 3) OVER (ORDER BY d) AS xp3
  FROM daily
)
SELECT d, x0 AS volume,
       round((-2*(xm3 + xp3) + 3*(xm2 + xp2) + 6*(xm1 + xp1) + 7*x0)
             / CAST(21 AS DOUBLE), 6) AS sg_r
FROM lagged
WHERE xm3 IS NOT NULL AND xp3 IS NOT NULL
ORDER BY d
LIMIT 60
""",
    tags=("inference", "timeseries", "filter"),
)
def a174_savitzky_golay(spark, sf_dir):
    """Savitzky–Golay smoothing of daily order volume (window 7,
    quadratic/cubic fit): the least-squares polynomial filter whose
    closed form is the exact integer convolution (-2,3,6,7,6,3,-2)/21 —
    preserves peak height/width where a plain moving average flattens
    them. Interior points only (full 7-day window). The convolution is
    an exact BIGINT; the single division by 21 yields a non-terminating
    decimal, so round(,6) can never land on a half boundary (q326
    tie-break class is structurally impossible)."""
    daily = _dailyv(spark, sf_dir)
    w = Window.orderBy("d")
    cols = {
        "xm3": F.lag("v", 3).over(w),
        "xm2": F.lag("v", 2).over(w),
        "xm1": F.lag("v", 1).over(w),
        "xp1": F.lead("v", 1).over(w),
        "xp2": F.lead("v", 2).over(w),
        "xp3": F.lead("v", 3).over(w),
    }
    df = daily.select("d", F.col("v").alias("x0"), *[c.alias(n) for n, c in cols.items()])
    conv = (
        F.lit(-2) * (F.col("xm3") + F.col("xp3"))
        + F.lit(3) * (F.col("xm2") + F.col("xp2"))
        + F.lit(6) * (F.col("xm1") + F.col("xp1"))
        + F.lit(7) * F.col("x0")
    )
    return (
        df.filter(F.col("xm3").isNotNull() & F.col("xp3").isNotNull())
        .select(
            "d",
            F.col("x0").alias("volume"),
            F.round(conv / F.lit(21.0), 6).alias("sg_r"),
        )
        .orderBy("d")
        .limit(60)
    )


@query(
    "a175_kz_filter",
    oracle=f"""
WITH daily AS ({_DAILYV_SQL}),
l1 AS (
  SELECT d,
         LAG(v,2) OVER (ORDER BY d) + LAG(v,1) OVER (ORDER BY d) + v
           + LEAD(v,1) OVER (ORDER BY d) + LEAD(v,2) OVER (ORDER BY d)
           AS s1
  FROM daily
), l2 AS (
  SELECT d,
         LAG(s1,2) OVER (ORDER BY d) + LAG(s1,1) OVER (ORDER BY d) + s1
           + LEAD(s1,1) OVER (ORDER BY d) + LEAD(s1,2) OVER (ORDER BY d)
           AS s2
  FROM l1
), l3 AS (
  SELECT d,
         LAG(s2,2) OVER (ORDER BY d) + LAG(s2,1) OVER (ORDER BY d) + s2
           + LEAD(s2,1) OVER (ORDER BY d) + LEAD(s2,2) OVER (ORDER BY d)
           AS s3
  FROM l2
)
SELECT d, round(s3 / CAST(125 AS DOUBLE), 6) AS kz_r
FROM l3 WHERE s3 IS NOT NULL
ORDER BY d
LIMIT 60
""",
    tags=("inference", "timeseries", "filter"),
)
def a175_kz_filter(spark, sf_dir):
    """Kolmogorov–Zurbenko KZ(5,3) filter of daily order volume: three
    iterated centered 5-day moving averages — the low-pass filter of
    choice for separating long-term signal from synoptic noise (its
    transfer function is sinc³, far steeper roll-off than one MA).
    Implemented as iterated LAG/LEAD SUMS so every intermediate stays
    an exact BIGINT; null edges propagate through the additions, which
    IS the correct shrinking-support boundary; the single terminal
    division by 125 = 5³ is exact to 3 decimal places, so the 6-dp
    round is boundary-safe."""
    daily = _dailyv(spark, sf_dir)
    w = Window.orderBy("d")
    df = daily.select(
        "d",
        (
            F.lag("v", 2).over(w)
            + F.lag("v", 1).over(w)
            + F.col("v")
            + F.lead("v", 1).over(w)
            + F.lead("v", 2).over(w)
        ).alias("s1"),
    )
    df = df.select(
        "d",
        (
            F.lag("s1", 2).over(w)
            + F.lag("s1", 1).over(w)
            + F.col("s1")
            + F.lead("s1", 1).over(w)
            + F.lead("s1", 2).over(w)
        ).alias("s2"),
    )
    df = df.select(
        "d",
        (
            F.lag("s2", 2).over(w)
            + F.lag("s2", 1).over(w)
            + F.col("s2")
            + F.lead("s2", 1).over(w)
            + F.lead("s2", 2).over(w)
        ).alias("s3"),
    )
    return (
        df.filter(F.col("s3").isNotNull())
        .select("d", F.round(F.col("s3") / F.lit(125.0), 6).alias("kz_r"))
        .orderBy("d")
        .limit(60)
    )

@query(
    "a176_cochrane_orcutt",
    oracle="""
WITH daily0 AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) // 100
              AS BIGINT) AS y
  FROM orders GROUP BY d
), unit AS (
  SELECT GREATEST(1, (CAST(SUM(y) AS BIGINT) // COUNT(*)) // 3000) AS u
  FROM daily0
), daily AS (
  SELECT d, CAST(y // u AS BIGINT) AS y FROM daily0 CROSS JOIN unit
), ts_ AS (
  SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t FROM daily
), sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(t * t) AS BIGINT) AS st2,
         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(t * y) AS BIGINT) AS sty
  FROM ts_
), fit AS (
  SELECT n, st, sy,
         (CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * st2 - CAST(st AS DOUBLE) * st) AS b
  FROM sums
), fit2 AS (
  SELECT b, (CAST(sy AS DOUBLE) - b * st) / n AS a FROM fit
), resid AS (
  SELECT t.t, CAST(ROUND(t.y - f.a - f.b * t.t, 0) AS BIGINT) AS ec
  FROM ts_ t CROSS JOIN fit2 f
), rho_ AS (
  SELECT CAST(SUM(ec * pec) AS DOUBLE) / SUM(pec * pec) AS rho
  FROM (SELECT ec, LAG(ec) OVER (ORDER BY t) AS pec FROM resid)
  WHERE pec IS NOT NULL
), star AS (
  SELECT CAST(ROUND((t.y - r.rho * py) * 1000.0, 0) AS BIGINT) AS yc,
         CAST(ROUND((t.t - r.rho * (t.t - 1)) * 1000.0, 0) AS BIGINT) AS xc
  FROM (SELECT y, t, LAG(y) OVER (ORDER BY t) AS py FROM ts_) t
  CROSS JOIN rho_ r
  WHERE py IS NOT NULL
), ssum AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xc) AS BIGINT) AS sx, CAST(SUM(yc) AS BIGINT) AS sy,
         CAST(SUM(xc * yc) AS BIGINT) AS sxy,
         CAST(SUM(xc * xc) AS BIGINT) AS sxx
  FROM star
)
SELECT s.n AS n_obs,
       round(r.rho, 6) AS rho_r,
       round(f.b, 6) AS slope_ols_r,
       round((CAST(s.n AS DOUBLE) * s.sxy - CAST(s.sx AS DOUBLE) * s.sy)
             / (CAST(s.n AS DOUBLE) * s.sxx - CAST(s.sx AS DOUBLE) * s.sx),
             6) AS slope_gls_r
FROM ssum s CROSS JOIN rho_ r CROSS JOIN fit f
""",
    tags=("inference", "regression", "timeseries"),
)
def a176_cochrane_orcutt(spark, sf_dir):
    """Cochrane–Orcutt AR(1) serial-correlation correction for the
    daily-revenue-on-time trend regression: OLS residuals give
    rho = Σe_t·e_{t-1}/Σe²_{t-1}, then the quasi-differenced series
    (y_t − ρy_{t-1}) on (t − ρ(t−1)) is refit — the GLS slope whose
    standard errors don't lie when a479_durbin_watson rejects
    independence. Revenue is unit-rescaled (the a038-class overflow
    guard: consumers are scale-invariant), residuals round to exact
    BIGINTs, and the quasi-differenced regressors are 3-dp fixed-point
    so every cross-product sum is exact at any corpus scale."""
    from .inference import _unit_scaled

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date(F.date_trunc("day", "o_orderdate")).alias("d")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT))"
            " div 100 AS BIGINT)"
        ).alias("y")
    )
    daily = _unit_scaled(daily)
    w = Window.orderBy("d")
    ts = daily.select(
        "y", F.row_number().over(w).cast("bigint").alias("t")
    ).localCheckpoint(eager=False)
    sums = ts.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("st2"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("sty"),
    )
    fit = sums.select(
        "n",
        "st",
        "sy",
        (
            (F.col("n").cast("double") * F.col("sty") - F.col("st").cast("double") * F.col("sy"))
            / (F.col("n").cast("double") * F.col("st2") - F.col("st").cast("double") * F.col("st"))
        ).alias("b"),
    ).select(
        "b",
        ((F.col("sy").cast("double") - F.col("b") * F.col("st")) / F.col("n")).alias("a"),
    )
    wt = Window.orderBy("t")
    resid = ts.crossJoin(F.broadcast(fit)).select(
        "t",
        "y",
        F.round(F.col("y") - F.col("a") - F.col("b") * F.col("t"), 0)
        .cast("bigint")
        .alias("ec"),
        F.col("b").alias("b_ols"),
    )
    lagged = resid.select(
        "t", "y", "ec", "b_ols", F.lag("ec").over(wt).alias("pec"), F.lag("y").over(wt).alias("py")
    ).localCheckpoint(eager=False)
    rho = (
        lagged.filter(F.col("pec").isNotNull())
        .agg(
            (
                F.sum(F.col("ec") * F.col("pec")).cast("double")
                / F.sum(F.col("pec") * F.col("pec"))
            ).alias("rho"),
            F.first("b_ols").alias("b_ols"),
        )
    )
    star = (
        lagged.filter(F.col("py").isNotNull())
        .drop("b_ols")
        .crossJoin(F.broadcast(rho))
        .select(
            "rho",
            "b_ols",
            F.round((F.col("y") - F.col("rho") * F.col("py")) * F.lit(1000.0), 0)
            .cast("bigint")
            .alias("yc"),
            F.round(
                (F.col("t") - F.col("rho") * (F.col("t") - F.lit(1))) * F.lit(1000.0), 0
            )
            .cast("bigint")
            .alias("xc"),
        )
    )
    out = star.groupBy("rho", "b_ols").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("xc").cast("bigint").alias("sx"),
        F.sum("yc").cast("bigint").alias("sy"),
        F.sum(F.col("xc") * F.col("yc")).cast("bigint").alias("sxy"),
        F.sum(F.col("xc") * F.col("xc")).cast("bigint").alias("sxx"),
    )
    return out.select(
        F.col("n").alias("n_obs"),
        F.round("rho", 6).alias("rho_r"),
        F.round("b_ols", 6).alias("slope_ols_r"),
        F.round(
            (
                F.col("n").cast("double") * F.col("sxy")
                - F.col("sx").cast("double") * F.col("sy")
            )
            / (
                F.col("n").cast("double") * F.col("sxx")
                - F.col("sx").cast("double") * F.col("sx")
            ),
            6,
        ).alias("slope_gls_r"),
    )

@query(
    "a177_zip_mom",
    oracle="""
WITH cal AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
usr AS (SELECT DISTINCT user_id FROM events),
grid AS (SELECT u.user_id, c.d FROM usr u CROSS JOIN cal c),
cnt AS (
  SELECT CAST(ts AS DATE) AS d, user_id,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
), cells AS (
  SELECT COALESCE(cnt.c, 0) AS c
  FROM grid LEFT JOIN cnt ON grid.user_id = cnt.user_id AND grid.d = cnt.d
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS z
  FROM cells
)
SELECT n AS n_cells, z AS zero_cells,
       round(CAST(s1 AS DOUBLE) / n, 6) AS mean_r,
       round((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n, 6)
         AS var_r,
       round(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n
               + (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
               - CAST(s1 AS DOUBLE) / n)
             / (CAST(s1 AS DOUBLE) / n), 6) AS lambda_r,
       round(1.0 - (CAST(s1 AS DOUBLE) / n)
                   / (((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n
                       + (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                       - CAST(s1 AS DOUBLE) / n)
                      / (CAST(s1 AS DOUBLE) / n)), 6) AS pi_r
FROM mom
""",
    tags=("inference", "count-model"),
)
def a177_zip_mom(spark, sf_dir):
    """Zero-inflated Poisson method-of-moments fit on per-(user, day)
    purchase counts over the full user x calendar grid (zeros included
    by construction — the grid left-join is what distinguishes a count
    MODEL from a count SUMMARY). Moment estimators: lambda-hat =
    (s^2 + m^2 - m)/m, pi-hat = 1 - m/lambda-hat — closed-form, no
    iteration. All moments are exact BIGINT sums (population variance
    convention); the handful of terminal divisions are identical IEEE
    expressions on both engines."""
    e = table(spark, sf_dir, "events")
    cal = e.select(F.to_date("ts").alias("d")).distinct()
    usr = e.select("user_id").distinct()
    grid = usr.crossJoin(cal)
    cnt = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"), "user_id")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    cells = grid.join(cnt, ["user_id", "d"], "left").select(
        F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("c")
    )
    mom = cells.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
        F.sum((F.col("c") == 0).cast("bigint")).cast("bigint").alias("z"),
    )
    m = F.col("s1").cast("double") / F.col("n")
    var = (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n")) / F.col("n")
    lam = (var + m * m - m) / m
    return mom.select(
        F.col("n").alias("n_cells"),
        F.col("z").alias("zero_cells"),
        F.round(m, 6).alias("mean_r"),
        F.round(var, 6).alias("var_r"),
        F.round(lam, 6).alias("lambda_r"),
        F.round(F.lit(1.0) - m / lam, 6).alias("pi_r"),
    )


@query(
    "a178_hoeffding_d",
    oracle=f"""
WITH daily AS ({_DAILYV_SQL}),
ranked AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY v, d) AS BIGINT) AS r,
         CAST(ROW_NUMBER() OVER (ORDER BY y, d) AS BIGINT) AS s
  FROM daily
), ci AS (
  SELECT a.r, a.s,
         CAST(COUNT(b.r) AS BIGINT) AS c
  FROM ranked a LEFT JOIN ranked b ON b.r < a.r AND b.s < a.s
  GROUP BY a.r, a.s
), parts AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c * (c - 1)) AS BIGINT) AS d1,
         CAST(SUM((r - 1) * (r - 2) * (s - 1) * (s - 2)) AS BIGINT) AS d2,
         CAST(SUM((r - 2) * (s - 2) * c) AS BIGINT) AS d3
  FROM ci
)
SELECT n AS n_days, d1, d2, d3,
       round(30.0 * (CAST((n - 2) AS DOUBLE) * (n - 3) * d1 + d2
                     - 2.0 * (n - 2) * d3)
             / (CAST(n AS DOUBLE) * (n - 1) * (n - 2) * (n - 3) * (n - 4)),
             6) AS d_stat_r
FROM parts
""",
    tags=("inference", "dependence"),
)
def a178_hoeffding_d(spark, sf_dir):
    """Hoeffding's D test of independence between daily order volume
    and daily revenue — the classical rank statistic that detects ANY
    dependence (non-monotone included), where Kendall/Spearman only see
    monotone association; complements a138_chatterjee_xi / a139_dcor
    with the exact finite-sample U-statistic. Ties are broken
    deterministically by date (ranks become a permutation, keeping
    D1/D2/D3 exact integers). The bivariate rank c_i needs pairwise
    dominance counting — run over the DAILY panel, which is
    calendar-bounded (<=2404 rows at every sf), so the pair join is
    O(1) in corpus size and both sides stay exact BIGINTs."""
    daily = _dailyv(spark, sf_dir)
    ranked = daily.select(
        F.row_number().over(Window.orderBy("v", "d")).cast("bigint").alias("r"),
        F.row_number().over(Window.orderBy("y", "d")).cast("bigint").alias("s"),
    ).localCheckpoint(eager=False)
    b = ranked.select(F.col("r").alias("br"), F.col("s").alias("bs"))
    ci = (
        ranked.join(
            F.broadcast(b),
            (F.col("br") < F.col("r")) & (F.col("bs") < F.col("s")),
            "left",
        )
        .groupBy("r", "s")
        .agg(F.count("br").cast("bigint").alias("c"))
    )
    parts = ci.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("d1"),
        F.sum(
            (F.col("r") - 1) * (F.col("r") - 2) * (F.col("s") - 1) * (F.col("s") - 2)
        )
        .cast("bigint")
        .alias("d2"),
        F.sum((F.col("r") - 2) * (F.col("s") - 2) * F.col("c"))
        .cast("bigint")
        .alias("d3"),
    )
    return parts.select(
        F.col("n").alias("n_days"),
        "d1",
        "d2",
        "d3",
        F.round(
            F.lit(30.0)
            * (
                (F.col("n") - 2).cast("double") * (F.col("n") - 3) * F.col("d1")
                + F.col("d2")
                - F.lit(2.0) * (F.col("n") - 2) * F.col("d3")
            )
            / (
                F.col("n").cast("double")
                * (F.col("n") - 1)
                * (F.col("n") - 2)
                * (F.col("n") - 3)
                * (F.col("n") - 4)
            ),
            6,
        ).alias("d_stat_r"),
    )
