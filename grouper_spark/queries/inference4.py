"""Round-9 battery (a174–a207): signal filtering, serially-correlated
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

import math

from pyspark.sql import Window, functions as F

from ..sources import table
from . import query
from ..operators.core import literal_frame

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


# (d, v, yk) with adaptive-unit revenue: yk = y // max(1, mean(y)/3000),
# the inference.py _unit_scaled discipline. A fixed kilodollar divisor
# put a201/a193's n-cross-multiplied yk moments (n*s22, sx2*sx2) within
# ~2x of int64 max at the 10x gate; the adaptive unit pins mean(yk) at
# ~3000 at EVERY corpus scale, so the squared-moment overflow budget is
# scale-invariant. Both engines floor-divide identically.
_DAILYVK_SQL = f"""
daily0 AS ({_DAILYV_SQL}),
uk AS (
  SELECT GREATEST(1, (CAST(SUM(y) AS BIGINT) // COUNT(*)) // 3000) AS u
  FROM daily0
),
daily AS (
  SELECT d, v, CAST(y // u AS BIGINT) AS yk FROM daily0 CROSS JOIN uk
)
"""


def _dailyvk(spark, sf_dir):
    daily = _dailyv(spark, sf_dir)
    unit = daily.agg(
        F.expr(
            "GREATEST(CAST(1 AS BIGINT),"
            " (CAST(SUM(y) AS BIGINT) div COUNT(*)) div 3000)"
        ).alias("u")
    )
    return daily.crossJoin(F.broadcast(unit)).select(
        "d", "v", F.expr("CAST(y div u AS BIGINT)").alias("yk")
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

@query(
    "a179_blomqvist_beta",
    oracle=f"""
WITH daily AS ({_DAILYV_SQL}),
med AS (
  SELECT
    (SELECT v FROM daily ORDER BY v, d
      LIMIT 1 OFFSET (SELECT ((COUNT(*) + 1) // 2) - 1 FROM daily)) AS mv,
    (SELECT y FROM daily ORDER BY y, d
      LIMIT 1 OFFSET (SELECT ((COUNT(*) + 1) // 2) - 1 FROM daily)) AS my
), quad AS (
  SELECT
    CAST(SUM(CASE WHEN v > mv AND y > my THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN v <= mv AND y > my THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(SUM(CASE WHEN v <= mv AND y <= my THEN 1 ELSE 0 END) AS BIGINT) AS n3,
    CAST(SUM(CASE WHEN v > mv AND y <= my THEN 1 ELSE 0 END) AS BIGINT) AS n4
  FROM daily CROSS JOIN med
)
SELECT n1, n2, n3, n4,
       round(CAST(n1 + n3 - n2 - n4 AS DOUBLE) / (n1 + n2 + n3 + n4), 6)
         AS beta_r
FROM quad
""",
    tags=("inference", "dependence"),
)
def a179_blomqvist_beta(spark, sf_dir):
    """Blomqvist's beta (medial correlation) between daily order volume
    and daily revenue: the quadrant statistic — concordance of signs
    around the (median, median) center. The robust quick-look
    dependence check that needs only quadrant COUNTS (exact integers);
    medians are the deterministic LOWER medians ((n+1)//2-th order
    statistic with date tie-break), the q160 exact-median convention,
    so no interpolation ever enters. One corpus fold + one broadcast of
    a 1-row median pair."""
    daily = _dailyv(spark, sf_dir).localCheckpoint(eager=False)
    n_half = daily.groupBy().agg(
        (((F.count("*") + 1) / 2).cast("bigint") - 1).alias("k")
    )
    wv = Window.orderBy("v", "d")
    wy = Window.orderBy("y", "d")
    ranked = daily.select(
        "v",
        "y",
        (F.row_number().over(wv) - 1).cast("bigint").alias("rv"),
        (F.row_number().over(wy) - 1).cast("bigint").alias("ry"),
    )
    med = (
        ranked.crossJoin(F.broadcast(n_half))
        .agg(
            F.max(F.when(F.col("rv") == F.col("k"), F.col("v"))).alias("mv"),
            F.max(F.when(F.col("ry") == F.col("k"), F.col("y"))).alias("my"),
        )
    )
    quad = daily.crossJoin(F.broadcast(med)).agg(
        F.sum(((F.col("v") > F.col("mv")) & (F.col("y") > F.col("my"))).cast("bigint")).alias("n1"),
        F.sum(((F.col("v") <= F.col("mv")) & (F.col("y") > F.col("my"))).cast("bigint")).alias("n2"),
        F.sum(((F.col("v") <= F.col("mv")) & (F.col("y") <= F.col("my"))).cast("bigint")).alias("n3"),
        F.sum(((F.col("v") > F.col("mv")) & (F.col("y") <= F.col("my"))).cast("bigint")).alias("n4"),
    )
    return quad.select(
        "n1",
        "n2",
        "n3",
        "n4",
        F.round(
            (F.col("n1") + F.col("n3") - F.col("n2") - F.col("n4")).cast("double")
            / (F.col("n1") + F.col("n2") + F.col("n3") + F.col("n4")),
            6,
        ).alias("beta_r"),
    )


@query(
    "a180_welch_anova",
    oracle="""
WITH g AS (
  SELECT l_returnflag || '/' || l_linestatus AS grp,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS s1,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)
                  * CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS s2
  FROM lineitem
  GROUP BY 1
  HAVING COUNT(*) >= 2
), stats AS (
  SELECT grp, n,
         CAST(s1 AS DOUBLE) / n AS m,
         (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) AS s2v
  FROM g
), w AS (
  SELECT grp, n, m, s2v, CAST(n AS DOUBLE) / s2v AS wt FROM stats
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(wt) AS sw,
         SUM(wt * m) AS swm
  FROM w
), grand AS (
  SELECT k, sw, swm / sw AS gm FROM tot
), comp AS (
  SELECT g2.k, g2.gm,
         SUM(w.wt * (w.m - g2.gm) * (w.m - g2.gm)) AS num,
         SUM((1.0 - w.wt / g2.sw) * (1.0 - w.wt / g2.sw) / (w.n - 1))
           AS lam
  FROM w CROSS JOIN grand g2
  GROUP BY g2.k, g2.gm, g2.sw
)
SELECT k AS n_groups,
       round(gm, 6) AS grand_mean_r,
       round((num / (k - 1))
             / (1.0 + 2.0 * (k - 2) / (CAST(k AS DOUBLE) * k - 1.0) * lam),
             6) AS f_welch_r,
       round((CAST(k AS DOUBLE) * k - 1.0) / (3.0 * lam), 6) AS df2_r
FROM comp
""",
    tags=("inference", "anova"),
)
def a180_welch_anova(spark, sf_dir):
    """Welch's heteroscedasticity-robust one-way ANOVA of line-item
    quantity across the 6 returnflag/linestatus groups — the F* that
    does NOT assume equal group variances (classic ANOVA q272's blind
    spot; a475_bartlett tests the assumption, this drops it). Group
    moments are exact BIGINT sums of the integer quantities; the Welch
    weights, grand mean, F*, and Welch–Satterthwaite df2 are a fixed
    scalar expression tree over the 6-row group summary, identical on
    both engines."""
    li = table(spark, sf_dir, "lineitem")
    q = F.round("l_quantity", 0).cast("bigint")
    g = (
        li.groupBy(
            F.concat_ws("/", "l_returnflag", "l_linestatus").alias("grp")
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(q).cast("bigint").alias("s1"),
            F.sum(q * q).cast("bigint").alias("s2"),
        )
        .filter(F.col("n") >= 2)
    )
    stats = g.select(
        "grp",
        "n",
        (F.col("s1").cast("double") / F.col("n")).alias("m"),
        (
            (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("s2v"),
    ).select("grp", "n", "m", "s2v", (F.col("n").cast("double") / F.col("s2v")).alias("wt"))
    tot = stats.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("wt").alias("sw"),
        F.sum(F.col("wt") * F.col("m")).alias("swm"),
    ).select("k", "sw", (F.col("swm") / F.col("sw")).alias("gm"))
    comp = (
        stats.crossJoin(F.broadcast(tot))
        .groupBy("k", "gm", "sw")
        .agg(
            F.sum(F.col("wt") * (F.col("m") - F.col("gm")) * (F.col("m") - F.col("gm"))).alias("num"),
            F.sum(
                (F.lit(1.0) - F.col("wt") / F.col("sw"))
                * (F.lit(1.0) - F.col("wt") / F.col("sw"))
                / (F.col("n") - 1)
            ).alias("lam"),
        )
    )
    kd = F.col("k").cast("double")
    return comp.select(
        F.col("k").alias("n_groups"),
        F.round("gm", 6).alias("grand_mean_r"),
        F.round(
            (F.col("num") / (F.col("k") - 1))
            / (F.lit(1.0) + F.lit(2.0) * (F.col("k") - 2) / (kd * F.col("k") - F.lit(1.0)) * F.col("lam")),
            6,
        ).alias("f_welch_r"),
        F.round((kd * F.col("k") - F.lit(1.0)) / (F.lit(3.0) * F.col("lam")), 6).alias("df2_r"),
    )

@query(
    "a181_ancova",
    oracle="""
WITH li AS (
  SELECT l_returnflag AS grp,
         CAST(ROUND(l_quantity, 0) AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS y
  FROM lineitem
), g AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM li GROUP BY grp
), within AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nt,
         SUM(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS wxx,
         SUM(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) AS wxy,
         SUM(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) AS wyy
  FROM g
), totals AS (
  SELECT CAST(SUM(sx) AS BIGINT) AS tx, CAST(SUM(sy) AS BIGINT) AS ty,
         CAST(SUM(sxx) AS BIGINT) AS txx, CAST(SUM(sxy) AS BIGINT) AS txy,
         CAST(SUM(syy) AS BIGINT) AS tyy, CAST(SUM(n) AS BIGINT) AS nt
  FROM g
), comp AS (
  SELECT w.k, w.nt,
         w.wyy - w.wxy * w.wxy / w.wxx AS sse_w,
         (CAST(t.tyy AS DOUBLE) - CAST(t.ty AS DOUBLE) * t.ty / t.nt)
           - (CAST(t.txy AS DOUBLE) - CAST(t.tx AS DOUBLE) * t.ty / t.nt)
             * (CAST(t.txy AS DOUBLE) - CAST(t.tx AS DOUBLE) * t.ty / t.nt)
             / (CAST(t.txx AS DOUBLE) - CAST(t.tx AS DOUBLE) * t.tx / t.nt)
           AS sse_t,
         w.wxy / w.wxx AS b_common
  FROM within w CROSS JOIN totals t
)
SELECT k AS n_groups, nt AS n_obs,
       round(b_common, 6) AS slope_r,
       round((sse_t - sse_w) / (k - 1) / (sse_w / (nt - k - 1)), 6)
         AS f_group_r
FROM comp
""",
    tags=("inference", "anova", "regression"),
)
def a181_ancova(spark, sf_dir):
    """One-way ANCOVA: extended price (whole dollars) by returnflag
    group, adjusting for quantity as the covariate with a common
    within-group slope. F compares the covariate-adjusted group effect
    (SSE_total-regression minus SSE_within-regression) to the within
    residual — the textbook adjusted-means test, distinct from
    a408_two_way_anova (no covariate) and q138_groupwise_regression
    (per-group slopes, no test). Every raw moment is an exact BIGINT
    in whole-dollar/whole-unit scale (cents would overflow y² sums at
    the 10× fixture); the scalar assembly is identical IEEE on both
    engines."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.round("l_quantity", 0).cast("bigint").alias("x"),
        F.round("l_extendedprice", 0).cast("bigint").alias("y"),
    )
    g = li.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    within = g.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nt"),
        F.sum(F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n")).alias("wxx"),
        F.sum(F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / F.col("n")).alias("wxy"),
        F.sum(F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / F.col("n")).alias("wyy"),
    )
    totals = g.agg(
        F.sum("sx").cast("bigint").alias("tx"),
        F.sum("sy").cast("bigint").alias("ty"),
        F.sum("sxx").cast("bigint").alias("txx"),
        F.sum("sxy").cast("bigint").alias("txy"),
        F.sum("syy").cast("bigint").alias("tyy"),
        F.sum("n").cast("bigint").alias("nt2"),
    )
    txy_c = F.col("txy").cast("double") - F.col("tx").cast("double") * F.col("ty") / F.col("nt2")
    comp = within.crossJoin(F.broadcast(totals)).select(
        "k",
        "nt",
        (F.col("wyy") - F.col("wxy") * F.col("wxy") / F.col("wxx")).alias("sse_w"),
        (
            (F.col("tyy").cast("double") - F.col("ty").cast("double") * F.col("ty") / F.col("nt2"))
            - txy_c * txy_c
            / (F.col("txx").cast("double") - F.col("tx").cast("double") * F.col("tx") / F.col("nt2"))
        ).alias("sse_t"),
        (F.col("wxy") / F.col("wxx")).alias("b_common"),
    )
    return comp.select(
        F.col("k").alias("n_groups"),
        F.col("nt").alias("n_obs"),
        F.round("b_common", 6).alias("slope_r"),
        F.round(
            (F.col("sse_t") - F.col("sse_w"))
            / (F.col("k") - 1)
            / (F.col("sse_w") / (F.col("nt") - F.col("k") - 1)),
            6,
        ).alias("f_group_r"),
    )


@query(
    "a182_bass_diffusion",
    oracle="""
WITH firsts AS (
  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS fd
  FROM orders GROUP BY o_custkey
), bounds AS (SELECT MIN(fd) AS d0 FROM firsts),
weekly AS (
  SELECT CAST(DATEDIFF('day', b.d0, f.fd) // 7 AS BIGINT) AS wk,
         CAST(COUNT(*) AS BIGINT) AS s
  FROM firsts f CROSS JOIN bounds b
  GROUP BY 1
), unit AS (
  SELECT GREATEST(1, CAST(SUM(s) AS BIGINT) // 1000) AS u FROM weekly
), series AS (
  SELECT wk,
         CAST(SUM(s) OVER (ORDER BY wk) // u AS BIGINT) AS cum
  FROM weekly CROSS JOIN unit
), steps AS (
  SELECT wk, cum,
         LAG(cum) OVER (ORDER BY wk) AS prev
  FROM series
), reg AS (
  SELECT CAST(cum - prev AS BIGINT) AS sa,
         CAST(prev AS BIGINT) AS nn
  FROM steps WHERE prev IS NOT NULL
), sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(nn) AS BIGINT) AS s1,
         CAST(SUM(nn * nn) AS BIGINT) AS s2,
         CAST(SUM(nn * nn * nn) AS BIGINT) AS s3,
         CAST(SUM(nn * nn * nn * nn) AS BIGINT) AS s4,
         CAST(SUM(sa) AS BIGINT) AS sy,
         CAST(SUM(sa * nn) AS BIGINT) AS sy1,
         CAST(SUM(sa * nn * nn) AS BIGINT) AS sy2
  FROM reg
), cram AS (
  SELECT
    CAST(n AS DOUBLE) * (CAST(s2 AS DOUBLE) * s4 - CAST(s3 AS DOUBLE) * s3)
      - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s4 - CAST(s3 AS DOUBLE) * s2)
      + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s3 - CAST(s2 AS DOUBLE) * s2)
      AS det,
    CAST(sy AS DOUBLE) * (CAST(s2 AS DOUBLE) * s4 - CAST(s3 AS DOUBLE) * s3)
      - CAST(s1 AS DOUBLE) * (CAST(sy1 AS DOUBLE) * s4 - CAST(s3 AS DOUBLE) * sy2)
      + CAST(s2 AS DOUBLE) * (CAST(sy1 AS DOUBLE) * s3 - CAST(s2 AS DOUBLE) * sy2)
      AS det_a,
    CAST(n AS DOUBLE) * (CAST(sy1 AS DOUBLE) * s4 - CAST(sy2 AS DOUBLE) * s3)
      - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s4 - CAST(s3 AS DOUBLE) * s2)
      + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * sy2 - CAST(sy1 AS DOUBLE) * s2)
      AS det_b,
    CAST(n AS DOUBLE) * (CAST(s2 AS DOUBLE) * sy2 - CAST(s3 AS DOUBLE) * sy1)
      - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * sy2 - CAST(s3 AS DOUBLE) * sy)
      + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s3 - CAST(s2 AS DOUBLE) * s2)
      AS det_c
  FROM sums
), abc AS (
  SELECT det_a / det AS a, det_b / det AS b, det_c / det AS c FROM cram
)
SELECT round(a, 6) AS a_r, round(b, 6) AS b_r, round(c, 6) AS c_r,
       round(b * b - 4.0 * a * c, 6) AS disc_r,
       CASE WHEN b * b - 4.0 * a * c >= 0 AND c <> 0 THEN
         round((-b - sqrt(b * b - 4.0 * a * c)) / (2.0 * c), 6) END AS m_hat_r,
       CASE WHEN b * b - 4.0 * a * c >= 0 AND c <> 0 THEN
         round(a / ((-b - sqrt(b * b - 4.0 * a * c)) / (2.0 * c)), 6) END AS p_hat_r,
       CASE WHEN b * b - 4.0 * a * c >= 0 AND c <> 0 THEN
         round(-c * ((-b - sqrt(b * b - 4.0 * a * c)) / (2.0 * c)), 6) END AS q_hat_r
FROM abc
""",
    tags=("inference", "forecast", "growth"),
)
def a182_bass_diffusion(spark, sf_dir):
    """Bass diffusion model of customer adoption: weekly first-order
    counts s_t regressed on cumulative adopters (s = a + bN + cN², the
    discrete Bass analogue), then innovation p, imitation q and market
    size M recovered from the quadratic's root (M = (-b-√(b²-4ac))/2c,
    p = a/M, q = -cM). Adopter counts are unit-rescaled (max(1,
    total//1000)) so ΣN⁴ stays inside BIGINT at every corpus scale;
    the 3×3 normal equations solve by Cramer determinants over exact
    integer power sums; sqrt runs once on a scalar. p̂ and q̂ are
    scale-free; m_hat is in rescaled-adopter units. When the fitted
    quadratic has no real root (disc < 0 — adoption is not S-shaped,
    which IS the diagnostic on a uniform-adoption corpus), the root
    columns are NULL and disc_r carries the evidence."""
    o = table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(F.min(F.to_date("o_orderdate")).alias("fd"))
    bounds = firsts.agg(F.min("fd").alias("d0"))
    weekly = (
        firsts.crossJoin(F.broadcast(bounds))
        .groupBy(
            F.expr("CAST(DATEDIFF(fd, d0) div 7 AS BIGINT)").alias("wk")
        )
        .agg(F.count("*").cast("bigint").alias("s"))
    )
    unit = weekly.agg(
        F.greatest(F.lit(1).cast("bigint"), (F.sum("s").cast("bigint") / F.lit(1000)).cast("bigint")).alias("u")
    )
    wwk = Window.orderBy("wk")
    series = (
        weekly.crossJoin(F.broadcast(unit))
        .select(
            "wk",
            F.expr(
                "CAST(SUM(s) OVER (ORDER BY wk) div u AS BIGINT)"
            ).alias("cum"),
        )
    )
    steps = series.select("wk", "cum", F.lag("cum").over(wwk).alias("prev"))
    reg = steps.filter(F.col("prev").isNotNull()).select(
        (F.col("cum") - F.col("prev")).cast("bigint").alias("sa"),
        F.col("prev").cast("bigint").alias("nn"),
    )
    nn, sa = F.col("nn"), F.col("sa")
    sums = reg.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(nn).cast("bigint").alias("s1"),
        F.sum(nn * nn).cast("bigint").alias("s2"),
        F.sum(nn * nn * nn).cast("bigint").alias("s3"),
        F.sum(nn * nn * nn * nn).cast("bigint").alias("s4"),
        F.sum(sa).cast("bigint").alias("sy"),
        F.sum(sa * nn).cast("bigint").alias("sy1"),
        F.sum(sa * nn * nn).cast("bigint").alias("sy2"),
    )
    d = lambda c: F.col(c).cast("double")
    cram = sums.select(
        (
            d("n") * (d("s2") * F.col("s4") - d("s3") * F.col("s3"))
            - d("s1") * (d("s1") * F.col("s4") - d("s3") * F.col("s2"))
            + d("s2") * (d("s1") * F.col("s3") - d("s2") * F.col("s2"))
        ).alias("det"),
        (
            d("sy") * (d("s2") * F.col("s4") - d("s3") * F.col("s3"))
            - d("s1") * (d("sy1") * F.col("s4") - d("s3") * F.col("sy2"))
            + d("s2") * (d("sy1") * F.col("s3") - d("s2") * F.col("sy2"))
        ).alias("det_a"),
        (
            d("n") * (d("sy1") * F.col("s4") - d("sy2") * F.col("s3"))
            - d("sy") * (d("s1") * F.col("s4") - d("s3") * F.col("s2"))
            + d("s2") * (d("s1") * F.col("sy2") - d("sy1") * F.col("s2"))
        ).alias("det_b"),
        (
            d("n") * (d("s2") * F.col("sy2") - d("s3") * F.col("sy1"))
            - d("s1") * (d("s1") * F.col("sy2") - d("s3") * F.col("sy"))
            + d("sy") * (d("s1") * F.col("s3") - d("s2") * F.col("s2"))
        ).alias("det_c"),
    )
    abc = cram.select(
        (F.col("det_a") / F.col("det")).alias("a"),
        (F.col("det_b") / F.col("det")).alias("b"),
        (F.col("det_c") / F.col("det")).alias("c"),
    )
    disc = F.col("b") * F.col("b") - F.lit(4.0) * F.col("a") * F.col("c")
    ok = (disc >= 0) & (F.col("c") != 0)
    m_hat = (-F.col("b") - F.sqrt(disc)) / (F.lit(2.0) * F.col("c"))
    return abc.select(
        F.round("a", 6).alias("a_r"),
        F.round("b", 6).alias("b_r"),
        F.round("c", 6).alias("c_r"),
        F.round(disc, 6).alias("disc_r"),
        F.when(ok, F.round(m_hat, 6)).alias("m_hat_r"),
        F.when(ok, F.round(F.col("a") / m_hat, 6)).alias("p_hat_r"),
        F.when(ok, F.round(-F.col("c") * m_hat, 6)).alias("q_hat_r"),
    )


# --- Process mining (a183-a186) -------------------------------------
# The event log is (user_id, ts, event_id, event_type); (user_id, ts)
# is unique in the fixture but every ordering still tie-breaks on
# event_id so the sequence is total. One window pass per user builds
# the directly-follows pairs; everything downstream is bounded by the
# event-type vocabulary (5 types -> <=25 transitions), so the footprint
# matrix and bottleneck tables are O(1) in corpus size.

_DFG_SQL = """
  SELECT user_id, event_type AS src,
         LEAD(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS dst,
         CAST(epoch_us(ts) AS BIGINT) AS t_us,
         LEAD(CAST(epoch_us(ts) AS BIGINT)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS nxt_us
  FROM events
"""


def _dfg_pairs(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
        F.unix_micros("ts").alias("t_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("nxt_us"),
    ).filter(F.col("dst").isNotNull())


@query(
    "a183_directly_follows_graph",
    oracle=f"""
WITH dfg AS ({_DFG_SQL}),
cnt AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM dfg WHERE dst IS NOT NULL GROUP BY 1, 2
), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cnt)
SELECT src, dst, n,
       CAST(n * 1000000 // t AS BIGINT) AS share_ppm
FROM cnt CROSS JOIN tot
ORDER BY n DESC, src, dst
LIMIT 40
""",
    tags=("process", "events", "graph"),
)
def a183_directly_follows_graph(spark, sf_dir):
    """Directly-follows graph (the process-mining primitive every
    discovery algorithm starts from): per-user event sequences ordered
    by (ts, event_id), one LEAD window pass emits the src->dst
    transition multiset, one groupBy counts it. Share is an exact
    integer ppm (cross-multiplied, floor), never a float division.
    Top-40 transitions by (count desc, src, dst) -- deterministic at
    every scale because the transition vocabulary is type x type."""
    pairs = _dfg_pairs(spark, sf_dir)
    cnt = pairs.groupBy("src", "dst").agg(
        F.count("*").cast("bigint").alias("n")
    )
    tot = cnt.agg(F.sum("n").cast("bigint").alias("t"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "src",
            "dst",
            "n",
            F.expr("CAST(n * 1000000 div t AS BIGINT)").alias("share_ppm"),
        )
        .orderBy(F.desc("n"), "src", "dst")
        .limit(40)
    )


@query(
    "a184_process_footprint_matrix",
    oracle=f"""
WITH dfg AS ({_DFG_SQL}),
cnt AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM dfg WHERE dst IS NOT NULL GROUP BY 1, 2
), types AS (SELECT DISTINCT event_type AS t FROM events),
grid AS (
  SELECT a.t AS ta, b.t AS tb
  FROM types a CROSS JOIN types b WHERE a.t < b.t
)
SELECT ta, tb,
       CAST(COALESCE(f.n, 0) AS BIGINT) AS f_ab,
       CAST(COALESCE(r.n, 0) AS BIGINT) AS f_ba,
       CASE
         WHEN COALESCE(f.n, 0) > 0 AND COALESCE(r.n, 0) > 0 THEN '||'
         WHEN COALESCE(f.n, 0) > 0 THEN '->'
         WHEN COALESCE(r.n, 0) > 0 THEN '<-'
         ELSE '#'
       END AS relation
FROM grid
LEFT JOIN cnt f ON f.src = grid.ta AND f.dst = grid.tb
LEFT JOIN cnt r ON r.src = grid.tb AND r.dst = grid.ta
ORDER BY ta, tb
""",
    tags=("process", "events", "graph"),
)
def a184_process_footprint_matrix(spark, sf_dir):
    """Alpha-algorithm footprint matrix: for every unordered event-type
    pair the causal relation derived from the directly-follows counts
    -- sequence (->, <-), parallel (||, both directions observed) or
    choice (#, never adjacent). The grid is the type vocabulary crossed
    with itself (a < b), so the output is O(|types|^2) regardless of
    corpus size; the two count lookups are broadcast-able left joins
    onto a <=25-row table."""
    pairs = _dfg_pairs(spark, sf_dir)
    cnt = pairs.groupBy("src", "dst").agg(
        F.count("*").cast("bigint").alias("n")
    )
    e = table(spark, sf_dir, "events")
    types = e.select(F.col("event_type").alias("t")).distinct()
    grid = (
        types.alias("a")
        .crossJoin(types.alias("b"))
        .filter(F.col("a.t") < F.col("b.t"))
        .select(F.col("a.t").alias("ta"), F.col("b.t").alias("tb"))
    )
    f = cnt.select(
        F.col("src").alias("ta"), F.col("dst").alias("tb"), F.col("n").alias("n_f")
    )
    r = cnt.select(
        F.col("dst").alias("ta"), F.col("src").alias("tb"), F.col("n").alias("n_r")
    )
    out = (
        grid.join(F.broadcast(f), ["ta", "tb"], "left")
        .join(F.broadcast(r), ["ta", "tb"], "left")
        .select(
            "ta",
            "tb",
            F.coalesce("n_f", F.lit(0)).cast("bigint").alias("f_ab"),
            F.coalesce("n_r", F.lit(0)).cast("bigint").alias("f_ba"),
        )
        .withColumn(
            "relation",
            F.when((F.col("f_ab") > 0) & (F.col("f_ba") > 0), F.lit("||"))
            .when(F.col("f_ab") > 0, F.lit("->"))
            .when(F.col("f_ba") > 0, F.lit("<-"))
            .otherwise(F.lit("#")),
        )
    )
    return out.orderBy("ta", "tb")


@query(
    "a185_transition_bottlenecks",
    oracle=f"""
WITH dfg AS ({_DFG_SQL}),
waits AS (
  SELECT src, dst,
         CAST((nxt_us - t_us) // 1000000 AS BIGINT) AS wait_s
  FROM dfg WHERE dst IS NOT NULL
)
SELECT src, dst,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(wait_s) AS BIGINT) AS total_wait_s,
       CAST(MAX(wait_s) AS BIGINT) AS max_wait_s,
       CAST((SUM(wait_s) // COUNT(*)) * 100
            + ((SUM(wait_s) % COUNT(*)) * 100) // COUNT(*)
            AS BIGINT) AS mean_wait_centi_s
FROM waits
GROUP BY 1, 2
ORDER BY mean_wait_centi_s DESC, src, dst
""",
    tags=("process", "events"),
)
def a185_transition_bottlenecks(spark, sf_dir):
    """Process bottleneck table: per directly-follows transition the
    exact waiting-time profile (count, total, max, mean) in integer
    seconds. Per-row wait floors microseconds to seconds BEFORE the sum
    so the fold stays within BIGINT at any corpus size (max wait ~2.6e6
    s; 1e12 rows -> 2.6e18 < 2^63); the mean is the overflow-safe
    split-division floor((total*100)/n) = (total//n)*100 +
    ((total%n)*100)//n, identical in both engines. Output is bounded by
    the type x type vocabulary."""
    pairs = _dfg_pairs(spark, sf_dir)
    waits = pairs.select(
        "src",
        "dst",
        F.expr("CAST((nxt_us - t_us) div 1000000 AS BIGINT)").alias("wait_s"),
    )
    return (
        waits.groupBy("src", "dst")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("wait_s").cast("bigint").alias("total_wait_s"),
            F.max("wait_s").cast("bigint").alias("max_wait_s"),
        )
        .select(
            "src",
            "dst",
            "n",
            "total_wait_s",
            "max_wait_s",
            F.expr(
                "CAST((total_wait_s div n) * 100"
                " + ((total_wait_s % n) * 100) div n AS BIGINT)"
            ).alias("mean_wait_centi_s"),
        )
        .orderBy(F.desc("mean_wait_centi_s"), "src", "dst")
    )


@query(
    "a186_case_variant_entropy",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), pu AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS variant
  FROM seq WHERE rn <= 8 GROUP BY user_id
), vc AS (
  SELECT variant, CAST(COUNT(*) AS BIGINT) AS c FROM pu GROUP BY 1
), byc AS (
  SELECT c, CAST(COUNT(*) AS BIGINT) AS m,
         CAST(ROUND(c * LN(c) * 1000000.0, 0) AS BIGINT) AS q
  FROM vc GROUP BY c
), tots AS (
  SELECT CAST(SUM(c * m) AS BIGINT) AS n_cases,
         CAST(SUM(m) AS BIGINT) AS n_variants,
         CAST(SUM(m * q) AS BIGINT) AS s_micro
  FROM byc
), top AS (
  SELECT variant AS top_variant, c AS top_count
  FROM vc ORDER BY c DESC, variant LIMIT 1
)
SELECT n_cases, n_variants, top_variant, CAST(top_count AS BIGINT) AS top_count,
       ROUND(LN(n_cases)
             - (CAST(s_micro AS DOUBLE) / 1000000.0)
               / CAST(n_cases AS DOUBLE), 6) AS entropy_nats_r
FROM tots CROSS JOIN top
""",
    tags=("process", "events", "text"),
)
def a186_case_variant_entropy(spark, sf_dir):
    """Case-variant analysis: each user's trace is truncated to its
    first 8 events (ordered by ts, event_id) and serialized as a
    'a>b>c' variant string; the variant distribution's Shannon entropy
    says how standardized the process is. H = ln(N) - (1/N)*sum(c*ln c)
    is folded the nano-quantized way (a155 discipline): ln runs once
    per DISTINCT count value on exact integers, each term is rounded to
    an integer micro-nat BEFORE the cross-variant sum, so the fold is
    a BIGINT and engine-order-independent."""
    e = table(spark, sf_dir, "events")
    pu = e.groupBy("user_id").agg(
        F.array_join(
            F.slice(
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(ts, event_id, event_type))), x -> x.event_type)"
                ),
                1,
                8,
            ),
            ">",
        ).alias("variant")
    )
    vc = pu.groupBy("variant").agg(F.count("*").cast("bigint").alias("c"))
    byc = vc.groupBy("c").agg(F.count("*").cast("bigint").alias("m")).select(
        "c",
        "m",
        F.expr(
            "CAST(ROUND(c * LN(c) * 1000000.0, 0) AS BIGINT)"
        ).alias("q"),
    )
    tots = byc.agg(
        F.sum(F.col("c") * F.col("m")).cast("bigint").alias("n_cases"),
        F.sum("m").cast("bigint").alias("n_variants"),
        F.sum(F.col("m") * F.col("q")).cast("bigint").alias("s_micro"),
    )
    top = (
        vc.orderBy(F.desc("c"), "variant")
        .limit(1)
        .select(
            F.col("variant").alias("top_variant"),
            F.col("c").cast("bigint").alias("top_count"),
        )
    )
    return tots.crossJoin(F.broadcast(top)).select(
        "n_cases",
        "n_variants",
        "top_variant",
        "top_count",
        F.round(
            F.log(F.col("n_cases").cast("double"))
            - (F.col("s_micro").cast("double") / F.lit(1000000.0))
            / F.col("n_cases").cast("double"),
            6,
        ).alias("entropy_nats_r"),
    )


# --- Data valuation (a187-a188) --------------------------------------


@query(
    "a187_loo_source_value",
    oracle="""
WITH per_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
         CAST(SUM(n_chars) AS BIGINT) AS t_s
  FROM documents GROUP BY 1
), tot AS (
  SELECT CAST(SUM(n_s) AS BIGINT) AS n, CAST(SUM(t_s) AS BIGINT) AS t
  FROM per_src
)
SELECT source, n_s,
       CAST(n_s * 1000000 // n AS BIGINT) AS share_ppm,
       CAST(t_s * 1000000 // n_s AS BIGINT) AS own_mean_chars_micro,
       CASE WHEN n = n_s THEN CAST(0 AS BIGINT)
            ELSE CAST(t * 1000000 // n
                      - (t - t_s) * 1000000 // (n - n_s) AS BIGINT)
       END AS loo_delta_micro
FROM per_src CROSS JOIN tot
ORDER BY loo_delta_micro DESC, source
""",
    tags=("valuation", "documents"),
)
def a187_loo_source_value(spark, sf_dir):
    """Leave-one-source-out data valuation: each ingest source's
    marginal contribution to the corpus mean document length, i.e.
    mean(all) - mean(all \\ source). Everything is one map-side-combined
    groupBy to 20 source rows plus exact integer-micro divisions (floor,
    cross-multiplied) -- no doubles anywhere, so the ranking is stable
    at any corpus size. Positive delta = the source pulls the corpus
    mean UP (removing it lowers quality proxy); the 100 TB use is
    pruning the bottom of this table before pretraining."""
    d = table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_s"),
        F.sum("n_chars").cast("bigint").alias("t_s"),
    )
    tot = per_src.agg(
        F.sum("n_s").cast("bigint").alias("n"),
        F.sum("t_s").cast("bigint").alias("t"),
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_s",
            F.expr("CAST(n_s * 1000000 div n AS BIGINT)").alias("share_ppm"),
            F.expr("CAST(t_s * 1000000 div n_s AS BIGINT)").alias(
                "own_mean_chars_micro"
            ),
            # Degenerate single-source corpus: n = n_s makes the LOO
            # mean undefined; emit 0 on both engines (a204 det_ppm
            # guard pattern) instead of Spark-NULL vs DuckDB-raise.
            F.expr(
                "CASE WHEN n = n_s THEN CAST(0 AS BIGINT)"
                " ELSE CAST(t * 1000000 div n"
                " - (t - t_s) * 1000000 div (n - n_s) AS BIGINT) END"
            ).alias("loo_delta_micro"),
        )
        .orderBy(F.desc("loo_delta_micro"), "source")
    )


@query(
    "a188_ols_leverage_dffits",
    oracle=f"""
WITH daily AS ({_DAILYV_SQL}),
idx AS (
  SELECT d, v, CAST(DATEDIFF('day', (SELECT MIN(d) FROM daily), d)
                    AS BIGINT) AS t
  FROM daily
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS st,
         CAST(SUM(t * t) AS BIGINT) AS stt,
         CAST(SUM(v) AS BIGINT) AS sv,
         CAST(SUM(v * v) AS BIGINT) AS svv,
         CAST(SUM(t * v) AS BIGINT) AS stv
  FROM idx
), coef AS (
  SELECT n, st, stt, sv, stv,
         CAST(n * stt - st * st AS DOUBLE) AS dxx,
         CAST(n * svv - sv * sv AS DOUBLE) / n AS syy_c,
         CAST(n * stv - st * sv AS DOUBLE) AS dxy
  FROM s
), scal AS (
  SELECT n, st, dxx, dxy / dxx AS b,
         (syy_c - (dxy / dxx) * (dxy / dxx) * (dxx / n)) AS sse
  FROM coef
), per AS (
  SELECT d, t, v, n, sse,
         1.0 / n + CAST((n * t - st) * (n * t - st) AS DOUBLE)
                   / (n * dxx) AS h,
         (CAST(v AS DOUBLE) - (CAST(sv2.svq AS DOUBLE) / n))
           - b * (CAST(t AS DOUBLE) - (CAST(st AS DOUBLE) / n)) AS e
  FROM idx CROSS JOIN scal
  CROSS JOIN (SELECT CAST(SUM(v) AS BIGINT) AS svq FROM idx) sv2
), dff AS (
  SELECT d, t, v, h, e,
         SQRT((sse - e * e / (1.0 - h)) / (n - 3)) AS s_loo,
         (e / (SQRT((sse - e * e / (1.0 - h)) / (n - 3))
               * SQRT(1.0 - h))) * SQRT(h / (1.0 - h)) AS dffits
  FROM per
)
SELECT d, v, ROUND(h, 6) AS h_r, ROUND(e, 6) AS e_r,
       ROUND(s_loo, 6) AS s_loo_r, ROUND(dffits, 6) AS dffits_r
FROM dff
ORDER BY ABS(ROUND(dffits, 6)) DESC, d
LIMIT 12
""",
    tags=("valuation", "regression", "inference"),
)
def a188_ols_leverage_dffits(spark, sf_dir):
    """Per-observation influence diagnostics for the daily volume-on-
    time trend regression: leverage h_i and DFFITS (the leave-one-out
    scaled change in fit -- the companion to a069's Cook's D, which
    measures coefficient change; DFFITS measures FITTED-VALUE change).
    All moment sums are exact BIGINTs over the bounded day panel; the
    scalar slope/SSE and per-day h/e/DFFITS are double expressions with
    identical text in both engines, each feeding its own terminal
    round(,6) -- no cross-row double folds anywhere. Top-12 days by
    |DFFITS| (tie-break d)."""
    daily = _dailyv(spark, sf_dir)
    bounds = daily.agg(F.min("d").alias("d0"))
    idx = (
        daily.crossJoin(F.broadcast(bounds))
        .select(
            "d",
            "v",
            F.datediff("d", "d0").cast("bigint").alias("t"),
        )
        .localCheckpoint(eager=False)
    )
    s = idx.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("stt"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("svv"),
        F.sum(F.col("t") * F.col("v")).cast("bigint").alias("stv"),
    )
    coef = s.select(
        "n",
        "st",
        "sv",
        F.expr("CAST(n * stt - st * st AS DOUBLE)").alias("dxx"),
        F.expr("CAST(n * svv - sv * sv AS DOUBLE) / n").alias("syy_c"),
        F.expr("CAST(n * stv - st * sv AS DOUBLE)").alias("dxy"),
    )
    scal = coef.select(
        "n",
        "st",
        "sv",
        "dxx",
        (F.col("dxy") / F.col("dxx")).alias("b"),
        (
            F.col("syy_c")
            - (F.col("dxy") / F.col("dxx"))
            * (F.col("dxy") / F.col("dxx"))
            * (F.col("dxx") / F.col("n"))
        ).alias("sse"),
    )
    per = idx.crossJoin(F.broadcast(scal)).select(
        "d",
        "t",
        "v",
        "n",
        "sse",
        (
            F.lit(1.0) / F.col("n")
            + F.expr("CAST((n * t - st) * (n * t - st) AS DOUBLE)")
            / (F.col("n") * F.col("dxx"))
        ).alias("h"),
        (
            (F.col("v").cast("double") - F.col("sv").cast("double") / F.col("n"))
            - F.col("b")
            * (F.col("t").cast("double") - F.col("st").cast("double") / F.col("n"))
        ).alias("e"),
    )
    s_loo = F.sqrt(
        (F.col("sse") - F.col("e") * F.col("e") / (F.lit(1.0) - F.col("h")))
        / (F.col("n") - F.lit(3))
    )
    dffits = (
        F.col("e") / (s_loo * F.sqrt(F.lit(1.0) - F.col("h")))
    ) * F.sqrt(F.col("h") / (F.lit(1.0) - F.col("h")))
    dff = per.select(
        "d",
        "v",
        "h",
        "e",
        s_loo.alias("s_loo"),
        dffits.alias("dffits"),
    )
    return (
        dff.select(
            "d",
            "v",
            F.round("h", 6).alias("h_r"),
            F.round("e", 6).alias("e_r"),
            F.round("s_loo", 6).alias("s_loo_r"),
            F.round("dffits", 6).alias("dffits_r"),
        )
        .orderBy(F.abs(F.col("dffits_r")).desc(), "d")
        .limit(12)
    )


# --- Bipartite graph motifs (a189-a190) -------------------------------
# Customer-part purchase graph through lineitem JOIN orders. The part
# side is panel-bounded to the top-25 parts by line count (tie-break
# partkey), so the pairwise stage is <=C(25,2)=300 part pairs and each
# customer contributes at most C(25,2) pair rows -- linear in customers
# at every corpus scale, never all-pairs on the full part catalog.

_BIPARTITE_EDGES_SQL = """
  panel AS (
    SELECT CAST(l_partkey AS BIGINT) AS pk
    FROM lineitem GROUP BY 1
    ORDER BY COUNT(*) DESC, pk LIMIT 25
  ),
  edges AS (
    SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS ck, p.pk
    FROM lineitem l
    JOIN panel p ON CAST(l.l_partkey AS BIGINT) = p.pk
    JOIN orders o ON l.l_orderkey = o.o_orderkey
  )
"""


def _bipartite_edges(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    panel = (
        l.groupBy(F.col("l_partkey").cast("bigint").alias("pk"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "pk")
        .limit(25)
        .select("pk")
    )
    return (
        l.join(
            F.broadcast(panel),
            l["l_partkey"].cast("bigint") == panel["pk"],
        )
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").cast("bigint").alias("ck"), "pk")
        .distinct()
        .localCheckpoint(eager=False)
    )


@query(
    "a189_butterfly_count",
    oracle=f"""
WITH {_BIPARTITE_EDGES_SQL},
pairs AS (
  SELECT e1.pk AS p1, e2.pk AS p2, CAST(COUNT(*) AS BIGINT) AS common_c
  FROM edges e1 JOIN edges e2 ON e1.ck = e2.ck AND e1.pk < e2.pk
  GROUP BY 1, 2
), tot AS (
  SELECT CAST(SUM(common_c * (common_c - 1) // 2) AS BIGINT)
           AS total_butterflies
  FROM pairs
)
SELECT p1, p2, common_c,
       CAST(common_c * (common_c - 1) // 2 AS BIGINT) AS butterflies,
       total_butterflies
FROM pairs CROSS JOIN tot
ORDER BY common_c DESC, p1, p2
LIMIT 15
""",
    tags=("graph", "bipartite"),
)
def a189_butterfly_count(spark, sf_dir):
    """Butterfly (2x2 biclique) counting on the customer-part purchase
    graph -- the bipartite analogue of triangle counting that drives
    bipartite clustering and spam/collusion detection. For part pair
    (p1,p2) with c common customers the pair hosts C(c,2) butterflies;
    the total is the exact BIGINT sum. The part side is the top-25
    panel (_BIPARTITE_EDGES_SQL), so the customer self-join emits at
    most C(25,2) rows per customer -- linear in corpus. Top-15 pairs
    plus the corpus total on every row."""
    edges = _bipartite_edges(spark, sf_dir)
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    pairs = (
        e1.join(
            e2,
            (F.col("e1.ck") == F.col("e2.ck"))
            & (F.col("e1.pk") < F.col("e2.pk")),
        )
        .groupBy(
            F.col("e1.pk").alias("p1"), F.col("e2.pk").alias("p2")
        )
        .agg(F.count("*").cast("bigint").alias("common_c"))
    )
    tot = pairs.agg(
        F.sum(
            F.expr("common_c * (common_c - 1) div 2")
        ).cast("bigint").alias("total_butterflies")
    )
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            "p1",
            "p2",
            "common_c",
            F.expr(
                "CAST(common_c * (common_c - 1) div 2 AS BIGINT)"
            ).alias("butterflies"),
            "total_butterflies",
        )
        .orderBy(F.desc("common_c"), "p1", "p2")
        .limit(15)
    )


@query(
    "a190_bipartite_edge_redundancy",
    oracle=f"""
WITH {_BIPARTITE_EDGES_SQL},
pairs AS (
  SELECT e1.pk AS p1, e2.pk AS p2, CAST(COUNT(*) AS BIGINT) AS common_c
  FROM edges e1 JOIN edges e2 ON e1.ck = e2.ck AND e1.pk < e2.pk
  GROUP BY 1, 2
), solid AS (
  SELECT p1, p2 FROM pairs WHERE common_c >= 2
), red AS (
  SELECT DISTINCT e1.ck, e1.pk
  FROM edges e1
  JOIN edges e2 ON e1.ck = e2.ck AND e1.pk <> e2.pk
  JOIN solid s
    ON s.p1 = LEAST(e1.pk, e2.pk) AND s.p2 = GREATEST(e1.pk, e2.pk)
), cnts AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM red) AS n_redundant,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM solid) AS n_solid_pairs
)
SELECT n_edges, n_redundant, n_solid_pairs,
       CASE WHEN n_edges = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(n_redundant * 1000000 // n_edges AS BIGINT)
       END AS redundancy_ppm
FROM cnts
""",
    tags=("graph", "bipartite"),
)
def a190_bipartite_edge_redundancy(spark, sf_dir):
    """Bipartite edge redundancy: the fraction of customer-part edges
    that participate in at least one butterfly (the graph-robustness
    number behind 'if this edge is noise, is the motif still
    supported?'). An edge (c,p) is redundant iff c buys some other
    panel part p2 with common(p,p2) >= 2 (c plus at least one other
    customer). Same bounded panel as a189; redundancy is an exact
    integer ppm."""
    edges = _bipartite_edges(spark, sf_dir)
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    pairs = (
        e1.join(
            e2,
            (F.col("e1.ck") == F.col("e2.ck"))
            & (F.col("e1.pk") < F.col("e2.pk")),
        )
        .groupBy(F.col("e1.pk").alias("p1"), F.col("e2.pk").alias("p2"))
        .agg(F.count("*").cast("bigint").alias("common_c"))
    )
    solid = pairs.filter(F.col("common_c") >= 2).select("p1", "p2")
    red = (
        e1.join(
            e2,
            (F.col("e1.ck") == F.col("e2.ck"))
            & (F.col("e1.pk") != F.col("e2.pk")),
        )
        .select(
            F.col("e1.ck").alias("ck"),
            F.col("e1.pk").alias("pk"),
            F.least(F.col("e1.pk"), F.col("e2.pk")).alias("p1"),
            F.greatest(F.col("e1.pk"), F.col("e2.pk")).alias("p2"),
        )
        .join(F.broadcast(solid), ["p1", "p2"])
        .select("ck", "pk")
        .distinct()
    )
    n_edges = edges.agg(F.count("*").cast("bigint").alias("n_edges"))
    n_red = red.agg(F.count("*").cast("bigint").alias("n_redundant"))
    n_solid = solid.agg(F.count("*").cast("bigint").alias("n_solid_pairs"))
    return (
        n_edges.crossJoin(F.broadcast(n_red))
        .crossJoin(F.broadcast(n_solid))
        .select(
            "n_edges",
            "n_redundant",
            "n_solid_pairs",
            # Empty edge panel (degenerate fixture): 0, not NULL/raise.
            F.expr(
                "CASE WHEN n_edges = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST(n_redundant * 1000000 div n_edges AS BIGINT) END"
            ).alias("redundancy_ppm"),
        )
    )


# --- Method comparison (a191-a194) ------------------------------------
# Two "measurements" of daily activity: order volume v and revenue yk —
# kilodollar (y div 1000) for a191/a194, whose rank/order statistics
# never square yk, and adaptive-unit (_dailyvk) for a193, whose squared
# moments need scale-invariant int64 headroom. Panel is calendar-bounded
# either way, so even
# the Passing-Bablok all-pairs slope stage is <=C(2404,2) ~ 2.9M rows
# at EVERY corpus scale -- the one groupBy that builds the panel is the
# only stage that touches the fact table.


@query(
    "a191_passing_bablok",
    oracle=f"""
WITH daily AS ({_DAILYV_SQL}),
pan AS (
  SELECT d, v, CAST(y // 1000 AS BIGINT) AS yk,
         ROW_NUMBER() OVER (ORDER BY d) AS i
  FROM daily
), sl AS (
  SELECT a.i AS i, b.i AS j,
         CAST(b.yk - a.yk AS BIGINT) AS num,
         CAST(b.v - a.v AS BIGINT) AS den
  FROM pan a JOIN pan b ON a.i < b.i
  WHERE b.v <> a.v AND (b.yk - a.yk) <> -(b.v - a.v)
), valid AS (
  SELECT CAST(num AS DOUBLE) / den AS s, i, j FROM sl
), scal AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN s < -1.0 THEN 1 ELSE 0 END) AS BIGINT) AS k_neg
  FROM valid
), ranked AS (
  SELECT s, ROW_NUMBER() OVER (ORDER BY s, i, j) AS rn FROM valid
), bsel AS (
  SELECT CASE WHEN sc.n_pairs % 2 = 1 THEN
           (SELECT s FROM ranked, scal sc2
             WHERE rn = (sc2.n_pairs + 1) // 2 + sc2.k_neg)
         ELSE
           ((SELECT s FROM ranked, scal sc2
              WHERE rn = sc2.n_pairs // 2 + sc2.k_neg)
            + (SELECT s FROM ranked, scal sc2
                WHERE rn = sc2.n_pairs // 2 + 1 + sc2.k_neg)) / 2.0
         END AS b, sc.n_pairs, sc.k_neg
  FROM scal sc
), resid AS (
  SELECT CAST(p.yk AS DOUBLE) - bs.b * p.v AS r, p.d
  FROM pan p CROSS JOIN bsel bs
), rr AS (
  SELECT r, ROW_NUMBER() OVER (ORDER BY r, d) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM resid
), asel AS (
  SELECT CASE WHEN MAX(n) % 2 = 1 THEN
           MAX(CASE WHEN rn = (n + 1) // 2 THEN r END)
         ELSE
           (MAX(CASE WHEN rn = n // 2 THEN r END)
            + MAX(CASE WHEN rn = n // 2 + 1 THEN r END)) / 2.0
         END AS a
  FROM rr
)
SELECT n_pairs, k_neg, ROUND(b, 6) AS slope_r, ROUND(a, 6) AS intercept_r
FROM bsel CROSS JOIN asel
""",
    tags=("inference", "method-comparison"),
)
def a191_passing_bablok(spark, sf_dir):
    """Passing-Bablok method-comparison regression of daily kilodollar
    revenue on daily order volume: the nonparametric estimator robust
    to errors in BOTH measurements -- slope = the K-shifted median of
    all C(n,2) pairwise slopes (slopes exactly equal to -1 excluded, K
    = count of slopes < -1 restores symmetry), intercept = median(y -
    b*x). The panel is calendar-bounded (<= ~2404 (d, v, yk) rows at
    ANY corpus scale -- the one groupBy over orders is the only stage
    that touches facts), so after that aggregate the whole estimator
    runs DRIVER-SIDE on the collected panel (the q249/a448/a493
    bounded-state recipe): the C(n,2) slopes, the shifted-median rank
    picks and the residual median are numpy float64 ops that replicate
    the engine expressions operation-for-operation (int64 subtraction,
    int->double conversion, one IEEE division per pair, (lo+hi)/2.0 --
    all exact, no transcendental), and VALUES at rank positions depend
    only on the sorted slope order, so s-ties need no (i, j)
    tie-breaking. Terminal round(_, 6) stays engine-side on the
    literal frame. The former distributed pipeline (theta-join pair
    stage + parallel global rank) remains as the fallback for a panel
    that ever exceeds the driver bound, and for the degenerate
    rank-out-of-range cases whose NULL flow the relational plan
    defines."""
    daily = _dailyv(spark, sf_dir)
    rows = (
        daily.select(
            "d", "v", F.expr("CAST(y div 1000 AS BIGINT)").alias("yk")
        )
        .collect()
    )
    if 0 < len(rows) <= _PB_MAX_PANEL:
        import numpy as np

        rows.sort(key=lambda r: r["d"])
        v = np.array([r["v"] for r in rows], dtype=np.int64)
        yk = np.array([r["yk"] for r in rows], dtype=np.int64)
        n = len(rows)
        iu = np.triu_indices(n, 1)
        den = (v[None, :] - v[:, None])[iu]
        num = (yk[None, :] - yk[:, None])[iu]
        keep = (den != 0) & (num != -den)
        s = num[keep].astype(np.float64) / den[keep].astype(np.float64)
        n_pairs = int(s.size)
        k_neg = int((s < -1.0).sum())
        ss = np.sort(s)
        if n_pairs % 2 == 1:
            ranks = ((n_pairs + 1) // 2 + k_neg,)
        else:
            ranks = (n_pairs // 2 + k_neg, n_pairs // 2 + 1 + k_neg)
        if all(1 <= rk <= n_pairs for rk in ranks):
            if n_pairs % 2 == 1:
                b = float(ss[ranks[0] - 1])
            else:
                b = float((ss[ranks[0] - 1] + ss[ranks[1] - 1]) / 2.0)
            r = yk.astype(np.float64) - np.float64(b) * v.astype(np.float64)
            rs = np.sort(r)
            if n % 2 == 1:
                a_val = float(rs[(n + 1) // 2 - 1])
            else:
                a_val = float((rs[n // 2 - 1] + rs[n // 2]) / 2.0)
            out = literal_frame(
        spark,
                [(n_pairs, k_neg, b, a_val)],
                "n_pairs bigint, k_neg bigint, b double, a double",
            )
            return out.select(
                "n_pairs",
                "k_neg",
                F.round("b", 6).alias("slope_r"),
                F.round("a", 6).alias("intercept_r"),
            )
    return _a191_distributed(spark, daily)


# driver-side panel bound for a191: 8000 days ≈ 32M pair slopes ≈ a few
# hundred MB of transient numpy state; the fixture calendar is ~2404
# days at every sf, so the fallback only guards a different fixture
_PB_MAX_PANEL = 8000


def _a191_distributed(spark, daily):
    """The distributed Passing-Bablok pipeline (theta-join pair stage,
    parallel global rank): fallback when the daily panel exceeds the
    driver bound or a rank pick falls out of range."""
    from ..operators.core import global_row_number

    w_d = Window.orderBy("d")
    pan = daily.select(
        "d",
        "v",
        F.expr("CAST(y div 1000 AS BIGINT)").alias("yk"),
        F.row_number().over(w_d).alias("i"),
    ).localCheckpoint(eager=False)
    a = pan.alias("a")
    b = pan.alias("b")
    sl = (
        a.join(b, F.col("a.i") < F.col("b.i"))
        .filter(
            (F.col("b.v") != F.col("a.v"))
            & ((F.col("b.yk") - F.col("a.yk"))
               != -(F.col("b.v") - F.col("a.v")))
        )
        .select(
            F.col("a.i").alias("i"),
            F.col("b.i").alias("j"),
            (F.col("b.yk") - F.col("a.yk")).cast("bigint").alias("num"),
            (F.col("b.v") - F.col("a.v")).cast("bigint").alias("den"),
        )
    )
    valid = sl.select(
        (F.col("num").cast("double") / F.col("den")).alias("s"), "i", "j"
    ).localCheckpoint(eager=False)
    scal = valid.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("s") < -1.0, 1).otherwise(0))
        .cast("bigint")
        .alias("k_neg"),
    )
    # the 2.5M-pair slope rank is the one corpus-independent hotspot:
    # a bare Window.orderBy would sort it in ONE task (~3.4 s of the
    # query's 6 s); the range-partitioned exact global rank runs the
    # sort across the session's cores with bit-identical ranks
    ranked = global_row_number(valid, ["s", "i", "j"]).select("s", "rn")
    picks = (
        ranked.crossJoin(F.broadcast(scal))
        .filter(
            (F.col("rn") == F.expr("(n_pairs + 1) div 2 + k_neg"))
            | (F.col("rn") == F.expr("n_pairs div 2 + k_neg"))
            | (F.col("rn") == F.expr("n_pairs div 2 + 1 + k_neg"))
        )
        .groupBy("n_pairs", "k_neg")
        .agg(
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n_pairs + 1) div 2 + k_neg"),
                    F.col("s"),
                )
            ).alias("s_mid"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("n_pairs div 2 + k_neg"), F.col("s")
                )
            ).alias("s_lo"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("n_pairs div 2 + 1 + k_neg"),
                    F.col("s"),
                )
            ).alias("s_hi"),
        )
    )
    bsel = picks.select(
        "n_pairs",
        "k_neg",
        F.when(F.expr("n_pairs % 2 = 1"), F.col("s_mid"))
        .otherwise((F.col("s_lo") + F.col("s_hi")) / F.lit(2.0))
        .alias("b"),
    )
    resid = pan.crossJoin(F.broadcast(bsel)).select(
        (F.col("yk").cast("double") - F.col("b") * F.col("v")).alias("r"),
        "d",
        "n_pairs",
        "k_neg",
        F.col("b").alias("bb"),
    )
    w_r = Window.orderBy("r", "d")
    rr = resid.select(
        "r",
        "n_pairs",
        "k_neg",
        "bb",
        F.row_number().over(w_r).alias("rn"),
        F.count("*").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("bigint").alias("n"),
    )
    asel = (
        rr.filter(
            (F.col("rn") == F.expr("(n + 1) div 2"))
            | (F.col("rn") == F.expr("n div 2"))
            | (F.col("rn") == F.expr("n div 2 + 1"))
        )
        .groupBy("n_pairs", "k_neg", "bb")
        .agg(
            F.max("n").alias("n"),
            F.max(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("r"))
            ).alias("r_mid"),
            F.max(
                F.when(F.col("rn") == F.expr("n div 2"), F.col("r"))
            ).alias("r_lo"),
            F.max(
                F.when(F.col("rn") == F.expr("n div 2 + 1"), F.col("r"))
            ).alias("r_hi"),
        )
    )
    return asel.select(
        "n_pairs",
        "k_neg",
        F.round("bb", 6).alias("slope_r"),
        F.round(
            F.when(F.expr("n % 2 = 1"), F.col("r_mid")).otherwise(
                (F.col("r_lo") + F.col("r_hi")) / F.lit(2.0)
            ),
            6,
        ).alias("intercept_r"),
    )


@query(
    "a192_copeland_ranking",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type AS t, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), users AS (SELECT DISTINCT user_id FROM events),
types AS (SELECT DISTINCT event_type AS t FROM events),
grid AS (
  SELECT u.user_id, ty.t, CAST(COALESCE(c.c, 0) AS BIGINT) AS c
  FROM users u CROSS JOIN types ty
  LEFT JOIN counts c ON c.user_id = u.user_id AND c.t = ty.t
), duels AS (
  SELECT g1.t AS t1, g2.t AS t2,
         CAST(SUM(CASE WHEN g1.c > g2.c THEN 1 ELSE 0 END) AS BIGINT) AS w1,
         CAST(SUM(CASE WHEN g2.c > g1.c THEN 1 ELSE 0 END) AS BIGINT) AS w2
  FROM grid g1 JOIN grid g2
    ON g1.user_id = g2.user_id AND g1.t < g2.t
  GROUP BY 1, 2
), points AS (
  SELECT t1 AS t,
         CASE WHEN w1 > w2 THEN 2 WHEN w1 = w2 THEN 1 ELSE 0 END AS pts,
         w1 AS uw
  FROM duels
  UNION ALL
  SELECT t2 AS t,
         CASE WHEN w2 > w1 THEN 2 WHEN w1 = w2 THEN 1 ELSE 0 END AS pts,
         w2 AS uw
  FROM duels
)
SELECT t AS event_type,
       CAST(SUM(pts) AS BIGINT) AS copeland_doubled,
       CAST(SUM(CASE WHEN pts = 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS majority_wins,
       CAST(SUM(CASE WHEN pts = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS majority_ties,
       CAST(SUM(uw) AS BIGINT) AS total_user_wins
FROM points
GROUP BY 1
ORDER BY copeland_doubled DESC, total_user_wins DESC, event_type
""",
    tags=("inference", "method-comparison", "ranking"),
)
def a192_copeland_ranking(spark, sf_dir):
    """Copeland pairwise-majority ranking of event types: every user
    'votes' in each type-vs-type duel by which they performed more
    often (per-user counts, missing = 0 via the users x types grid);
    the duel winner is the user-majority, and the Copeland score is
    wins x 2 + ties x 1 over all opponents -- the Condorcet-consistent
    aggregate that a plain popularity count is not. The grid is |users|
    x |types| (linear), the duel stage joins the grid to itself per
    user on the bounded type vocabulary (<=C(5,2) rows/user), and all
    tallies are exact BIGINTs."""
    e = table(spark, sf_dir, "events")
    counts = e.groupBy(
        "user_id", F.col("event_type").alias("t")
    ).agg(F.count("*").cast("bigint").alias("c"))
    users = e.select("user_id").distinct()
    types = e.select(F.col("event_type").alias("t")).distinct()
    grid = (
        users.crossJoin(F.broadcast(types))
        .join(counts, ["user_id", "t"], "left")
        .select(
            "user_id", "t", F.coalesce("c", F.lit(0)).cast("bigint").alias("c")
        )
        .localCheckpoint(eager=False)
    )
    g1 = grid.alias("g1")
    g2 = grid.alias("g2")
    duels = (
        g1.join(
            g2,
            (F.col("g1.user_id") == F.col("g2.user_id"))
            & (F.col("g1.t") < F.col("g2.t")),
        )
        .groupBy(F.col("g1.t").alias("t1"), F.col("g2.t").alias("t2"))
        .agg(
            F.sum(F.when(F.col("g1.c") > F.col("g2.c"), 1).otherwise(0))
            .cast("bigint")
            .alias("w1"),
            F.sum(F.when(F.col("g2.c") > F.col("g1.c"), 1).otherwise(0))
            .cast("bigint")
            .alias("w2"),
        )
    )
    pts1 = duels.select(
        F.col("t1").alias("t"),
        F.when(F.col("w1") > F.col("w2"), 2)
        .when(F.col("w1") == F.col("w2"), 1)
        .otherwise(0)
        .alias("pts"),
        F.col("w1").alias("uw"),
    )
    pts2 = duels.select(
        F.col("t2").alias("t"),
        F.when(F.col("w2") > F.col("w1"), 2)
        .when(F.col("w1") == F.col("w2"), 1)
        .otherwise(0)
        .alias("pts"),
        F.col("w2").alias("uw"),
    )
    return (
        pts1.unionAll(pts2)
        .groupBy(F.col("t").alias("event_type"))
        .agg(
            F.sum("pts").cast("bigint").alias("copeland_doubled"),
            F.sum(F.when(F.col("pts") == 2, 1).otherwise(0))
            .cast("bigint")
            .alias("majority_wins"),
            F.sum(F.when(F.col("pts") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("majority_ties"),
            F.sum("uw").cast("bigint").alias("total_user_wins"),
        )
        .orderBy(
            F.desc("copeland_doubled"), F.desc("total_user_wins"), "event_type"
        )
    )


@query(
    "a193_lin_ccc",
    oracle=f"""
WITH {_DAILYVK_SQL},
pan AS (SELECT v, yk FROM daily),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS sx,
         CAST(SUM(yk) AS BIGINT) AS sy,
         CAST(SUM(v * v) AS BIGINT) AS sxx,
         CAST(SUM(yk * yk) AS BIGINT) AS syy,
         CAST(SUM(v * yk) AS BIGINT) AS sxy
  FROM pan
)
SELECT n,
       ROUND(CAST(2 * (n * sxy - sx * sy) AS DOUBLE)
             / CAST((n * sxx - sx * sx) + (n * syy - sy * sy)
                    + (sx - sy) * (sx - sy) AS DOUBLE), 6) AS ccc_r,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS pearson_r,
       ROUND((CAST(2 * (n * sxy - sx * sy) AS DOUBLE)
              / CAST((n * sxx - sx * sx) + (n * syy - sy * sy)
                     + (sx - sy) * (sx - sy) AS DOUBLE))
             / (CAST(n * sxy - sx * sy AS DOUBLE)
                / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                   * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))), 6) AS c_b_r
FROM s
""",
    tags=("inference", "method-comparison"),
)
def a193_lin_ccc(spark, sf_dir):
    """Lin's concordance correlation coefficient between daily order
    volume and daily adaptive-unit revenue: CCC = 2*s_xy / (s_xx + s_yy +
    (xbar-ybar)^2), the agreement measure that penalizes both scatter
    (Pearson part) AND location/scale shift (the C_b accuracy factor,
    emitted too). Cross-multiplied by n^2 everything is one exact
    BIGINT fold over the bounded day panel; the revenue side is the
    adaptive-unit yk (_dailyvk) so the squared moments keep the same
    int64 headroom at every corpus scale; two sqrt calls run once on
    exact integers and every output feeds a terminal round(,6)."""
    pan = _dailyvk(spark, sf_dir).select("v", "yk")
    s = pan.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("sx"),
        F.sum("yk").cast("bigint").alias("sy"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("sxx"),
        F.sum(F.col("yk") * F.col("yk")).cast("bigint").alias("syy"),
        F.sum(F.col("v") * F.col("yk")).cast("bigint").alias("sxy"),
    )
    ccc = F.expr(
        "CAST(2 * (n * sxy - sx * sy) AS DOUBLE)"
        " / CAST((n * sxx - sx * sx) + (n * syy - sy * sy)"
        " + (sx - sy) * (sx - sy) AS DOUBLE)"
    )
    pear = F.expr(
        "CAST(n * sxy - sx * sy AS DOUBLE)"
        " / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))"
        " * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))"
    )
    return s.select(
        "n",
        F.round(ccc, 6).alias("ccc_r"),
        F.round(pear, 6).alias("pearson_r"),
        F.round(ccc / pear, 6).alias("c_b_r"),
    )


@query(
    "a194_total_deviation_index",
    oracle=f"""
WITH daily AS ({_DAILYV_SQL}),
pan AS (SELECT d, v, CAST(y // 1000 AS BIGINT) AS yk FROM daily),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS sv,
         CAST(SUM(yk) AS BIGINT) AS syk
  FROM pan
), cal AS (
  SELECT p.d, p.v,
         CAST(p.yk * s.sv // s.syk AS BIGINT) AS yhat,
         ABS(p.v - CAST(p.yk * s.sv // s.syk AS BIGINT)) AS adiff,
         s.n, s.sv
  FROM pan p CROSS JOIN s
), ranked AS (
  SELECT adiff, n, sv,
         ROW_NUMBER() OVER (ORDER BY adiff, d) AS rn
  FROM cal
)
SELECT MAX(n) AS n,
       CAST(MAX(CASE WHEN rn = (MAX_N * 9 + 9) // 10 THEN adiff END)
            AS BIGINT) AS tdi90,
       CAST(MAX(thr) AS BIGINT) AS coverage_thr,
       CAST(SUM(CASE WHEN adiff <= thr THEN 1 ELSE 0 END) * 1000000
            // MAX(n) AS BIGINT) AS coverage_ppm
FROM (SELECT adiff, n, sv, rn,
             MAX(n) OVER () AS MAX_N,
             (sv // n) // 10 AS thr
      FROM ranked)
GROUP BY ()
""",
    tags=("inference", "method-comparison"),
)
def a194_total_deviation_index(spark, sf_dir):
    """Total deviation index for the volume-vs-revenue agreement: the
    revenue series is ratio-calibrated onto the volume scale (yhat =
    yk * sum(v) // sum(yk), an exact BIGINT floor), TDI90 is the exact
    90th-percentile order statistic of |v - yhat| (rank ceil(0.9 n) via
    row_number, never an engine percentile), and coverage is the exact
    ppm of days within 10% of mean daily volume. The TDI/coverage pair
    is the method-comparison dual of a193's CCC: 'how big is the
    disagreement' instead of 'how correlated are they'."""
    daily = _dailyv(spark, sf_dir)
    pan = daily.select("d", "v", F.expr("CAST(y div 1000 AS BIGINT)").alias("yk"))
    s = pan.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum("yk").cast("bigint").alias("syk"),
    )
    cal = pan.crossJoin(F.broadcast(s)).select(
        "d",
        "v",
        "n",
        "sv",
        F.expr("ABS(v - CAST(yk * sv div syk AS BIGINT))").alias("adiff"),
        F.expr("(sv div n) div 10").alias("thr"),
    )
    ranked = cal.select(
        "adiff",
        "n",
        "thr",
        F.row_number().over(Window.orderBy("adiff", "d")).alias("rn"),
    )
    return ranked.groupBy().agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(n * 9 + 9) div 10"), F.col("adiff")
            )
        ).cast("bigint").alias("tdi90"),
        F.max("thr").cast("bigint").alias("coverage_thr"),
        F.expr(
            "CAST(SUM(CASE WHEN adiff <= thr THEN 1 ELSE 0 END) * 1000000"
            " div MAX(n) AS BIGINT)"
        ).alias("coverage_ppm"),
    )


# --- Layout & locality audits (a195-a198) -----------------------------
# Physical-design health metrics over the orders table, keyed by the
# write-order proxy bucket = o_orderkey div 4096 (a fixed chunk size,
# so the bucket count grows linearly with the corpus and every audit
# below is one bucket-partitioned pass -- no global sorts, no windows
# over the full table).


@query(
    "a195_comonth_collision_audit",
    oracle="""
WITH bm AS (
  SELECT DISTINCT CAST(o_orderkey // 4096 AS BIGINT) AS bucket,
         CAST(strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS VARCHAR)
           AS month
  FROM orders
), per_month AS (
  SELECT month, CAST(COUNT(*) AS BIGINT) AS k FROM bm GROUP BY 1
), per_bucket AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS m FROM bm GROUP BY 1
)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM per_bucket) AS n_buckets,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM per_month) AS n_months,
  (SELECT CAST(SUM(k * (k - 1) // 2) AS BIGINT) FROM per_month)
    AS comonth_collisions,
  (SELECT CAST(SUM(m) * 100 // COUNT(*) AS BIGINT) FROM per_bucket)
    AS mean_months_per_bucket_centi
""",
    tags=("layout", "audit"),
)
def a195_comonth_collision_audit(spark, sf_dir):
    """Clustering-locality audit: how badly do write-order chunks
    (orderkey div 4096, a parquet-row-group proxy) interleave the
    orderdate dimension? A perfectly date-clustered table has each
    month touched by ~contiguous chunks; the co-month collision count
    sum_m C(k_m, 2) (k_m = chunks touching month m) is the number of
    chunk pairs a month-predicate scan must co-read -- the same number
    OPTIMIZE/Z-ORDER maintenance drives down. Months are calendar-
    bounded, so the collision fold is over <=84 rows; the distinct
    (chunk, month) pass is one map-side-combined aggregate."""
    o = table(spark, sf_dir, "orders")
    bm = o.select(
        F.expr("CAST(o_orderkey div 4096 AS BIGINT)").alias("bucket"),
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("month"),
    ).distinct().localCheckpoint(eager=False)
    per_month = bm.groupBy("month").agg(
        F.count("*").cast("bigint").alias("k")
    )
    per_bucket = bm.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("m")
    )
    a = per_bucket.agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        F.expr("CAST(SUM(m) * 100 div COUNT(*) AS BIGINT)").alias(
            "mean_months_per_bucket_centi"
        ),
    )
    b = per_month.agg(
        F.count("*").cast("bigint").alias("n_months"),
        F.sum(F.expr("k * (k - 1) div 2")).cast("bigint").alias(
            "comonth_collisions"
        ),
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_buckets", "n_months", "comonth_collisions",
        "mean_months_per_bucket_centi",
    )


@query(
    "a196_partition_balance_audit",
    oracle="""
WITH h AS (
  SELECT CAST(('0x' || substr(md5('pb|' || CAST(o_orderkey AS VARCHAR)),
                              1, 13)) AS BIGINT) % 32 AS bucket
  FROM orders
), per AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS r FROM h GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(r) AS BIGINT) AS total_rows,
       CAST(MIN(r) AS BIGINT) AS min_rows,
       CAST(MAX(r) AS BIGINT) AS max_rows,
       CAST((MAX(r) - MIN(r)) * 1000000 // SUM(r) AS BIGINT)
         AS range_ppm,
       CAST(SUM((32 * r - (SELECT SUM(r) FROM per))
                * (32 * r - (SELECT SUM(r) FROM per))) AS BIGINT)
         AS sumsq_dev_x32
FROM per
""",
    tags=("layout", "audit", "skew"),
)
def a196_partition_balance_audit(spark, sf_dir):
    """Hash-partition balance audit: rows per bucket under the
    deterministic 52-bit md5 slice of the orderkey mod 32 (the engine-
    portable stand-in for a shuffle partitioner -- same draw on both
    engines, the a1NN bootstrap discipline). Emits min/max/range-ppm
    and the exact cross-multiplied deviation sum sum((32 r_i - N)^2)
    (chi-square numerator x 32^2) so 'is the partitioner balanced'
    needs no float mean. One groupBy to 32 rows at any corpus size."""
    o = table(spark, sf_dir, "orders")
    h = o.select(
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("pb|"), F.col("o_orderkey").cast("string")
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("bigint")
            % 32
        ).alias("bucket")
    )
    per = h.groupBy("bucket").agg(F.count("*").cast("bigint").alias("r"))
    tot = per.agg(F.sum("r").cast("bigint").alias("n_total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .groupBy()
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.sum("r").cast("bigint").alias("total_rows"),
            F.min("r").cast("bigint").alias("min_rows"),
            F.max("r").cast("bigint").alias("max_rows"),
            F.expr(
                "CAST((MAX(r) - MIN(r)) * 1000000 div SUM(r) AS BIGINT)"
            ).alias("range_ppm"),
            F.sum(
                (F.lit(32) * F.col("r") - F.col("n_total"))
                * (F.lit(32) * F.col("r") - F.col("n_total"))
            ).cast("bigint").alias("sumsq_dev_x32"),
        )
    )


@query(
    "a197_bucket_sortedness_audit",
    oracle="""
WITH seq AS (
  SELECT CAST(o_orderkey // 4096 AS BIGINT) AS bucket,
         CAST(o_orderdate AS DATE) AS d,
         LEAD(CAST(o_orderdate AS DATE)) OVER
           (PARTITION BY CAST(o_orderkey // 4096 AS BIGINT)
            ORDER BY o_orderkey) AS nxt
  FROM orders
), steps AS (
  SELECT bucket,
         CASE WHEN nxt < d THEN 1 ELSE 0 END AS descent
  FROM seq WHERE nxt IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_steps,
       CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets,
       CAST(SUM(descent) AS BIGINT) AS descents,
       CAST(1000000 - SUM(descent) * 1000000 // COUNT(*) AS BIGINT)
         AS sortedness_ppm
FROM steps
""",
    tags=("layout", "audit"),
)
def a197_bucket_sortedness_audit(spark, sf_dir):
    """Within-chunk sortedness audit: walking each write-order chunk
    (orderkey div 4096) in key order, what fraction of adjacent steps
    keep orderdate non-decreasing? 1.0 means the date column is
    monotone inside every chunk (delta/RLE encodings and zone maps are
    maximally effective); random interleave gives ~0.5. The window is
    PARTITIONED by chunk -- a parallel per-chunk pass, never a global
    sort -- and the descent tally is an exact integer ppm."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("bucket").orderBy("o_orderkey")
    seq = o.select(
        F.expr("CAST(o_orderkey div 4096 AS BIGINT)").alias("bucket"),
        F.to_date("o_orderdate").alias("d"),
        "o_orderkey",
    ).select(
        "bucket", "d", F.lead("d").over(w).alias("nxt")
    )
    steps = seq.filter(F.col("nxt").isNotNull()).select(
        "bucket",
        F.when(F.col("nxt") < F.col("d"), 1).otherwise(0).alias("descent"),
    )
    return steps.groupBy().agg(
        F.count("*").cast("bigint").alias("n_steps"),
        F.countDistinct("bucket").cast("bigint").alias("n_buckets"),
        F.sum("descent").cast("bigint").alias("descents"),
        F.expr(
            "CAST(1000000 - SUM(descent) * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("sortedness_ppm"),
    )


@query(
    "a198_delta_bitwidth_audit",
    oracle="""
WITH seq AS (
  SELECT CAST(o_orderkey AS BIGINT)
         - LAG(CAST(o_orderkey AS BIGINT)) OVER
             (PARTITION BY CAST(o_orderkey // 4096 AS BIGINT)
              ORDER BY o_orderkey) AS delta
  FROM orders
), cl AS (
  SELECT CASE WHEN delta < 16 THEN 4 WHEN delta < 256 THEN 8
              WHEN delta < 4096 THEN 12 WHEN delta < 65536 THEN 16
              WHEN delta < 1048576 THEN 20 WHEN delta < 16777216 THEN 24
              WHEN delta < 4294967296 THEN 32 ELSE 64 END AS w
  FROM seq WHERE delta IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_deltas,
       CAST(SUM(CASE WHEN w = 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
       CAST(SUM(CASE WHEN w = 8 THEN 1 ELSE 0 END) AS BIGINT) AS c8,
       CAST(SUM(CASE WHEN w = 12 THEN 1 ELSE 0 END) AS BIGINT) AS c12,
       CAST(SUM(CASE WHEN w = 16 THEN 1 ELSE 0 END) AS BIGINT) AS c16,
       CAST(SUM(CASE WHEN w > 16 THEN 1 ELSE 0 END) AS BIGINT) AS c_wide,
       CAST(SUM(w) AS BIGINT) AS bits_delta,
       CAST(COUNT(*) * 64 AS BIGINT) AS bits_plain,
       CAST(1000000 - SUM(w) * 1000000 // (COUNT(*) * 64) AS BIGINT)
         AS savings_ppm
FROM cl
""",
    tags=("layout", "audit", "encoding"),
)
def a198_delta_bitwidth_audit(spark, sf_dir):
    """Delta-encoding bit-width audit for the orderkey column (the
    companion to the RLE audit: WOULD delta encoding pay, before
    rewriting the table?): within each write-order chunk the key deltas
    are classified into parquet-style bit-width classes (4/8/12/16/...)
    by exact integer comparison, and the audit reports the class
    histogram plus total delta bits vs 64-bit plain -- savings_ppm is
    the headline. Window is per-chunk (parallel), tallies are exact
    BIGINTs."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("bucket").orderBy("k")
    seq = o.select(
        F.col("o_orderkey").cast("bigint").alias("k"),
        F.expr("CAST(o_orderkey div 4096 AS BIGINT)").alias("bucket"),
    ).select((F.col("k") - F.lag("k").over(w)).alias("delta"))
    cl = seq.filter(F.col("delta").isNotNull()).select(
        F.when(F.col("delta") < 16, 4)
        .when(F.col("delta") < 256, 8)
        .when(F.col("delta") < 4096, 12)
        .when(F.col("delta") < 65536, 16)
        .when(F.col("delta") < 1048576, 20)
        .when(F.col("delta") < 16777216, 24)
        .when(F.col("delta") < 4294967296, 32)
        .otherwise(64)
        .alias("w")
    )
    return cl.groupBy().agg(
        F.count("*").cast("bigint").alias("n_deltas"),
        F.sum(F.when(F.col("w") == 4, 1).otherwise(0)).cast("bigint").alias("c4"),
        F.sum(F.when(F.col("w") == 8, 1).otherwise(0)).cast("bigint").alias("c8"),
        F.sum(F.when(F.col("w") == 12, 1).otherwise(0)).cast("bigint").alias("c12"),
        F.sum(F.when(F.col("w") == 16, 1).otherwise(0)).cast("bigint").alias("c16"),
        F.sum(F.when(F.col("w") > 16, 1).otherwise(0)).cast("bigint").alias("c_wide"),
        F.sum("w").cast("bigint").alias("bits_delta"),
        (F.count("*") * F.lit(64)).cast("bigint").alias("bits_plain"),
        F.expr(
            "CAST(1000000 - SUM(w) * 1000000 div (COUNT(*) * 64) AS BIGINT)"
        ).alias("savings_ppm"),
    )


# --- Battery extension (a199-a206): process/queueing/infra/dynamics ---


@query(
    "a199_heuristic_miner_dependency",
    oracle=f"""
WITH dfg AS ({_DFG_SQL}),
cnt AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM dfg WHERE dst IS NOT NULL GROUP BY 1, 2
), types AS (SELECT DISTINCT event_type AS t FROM events),
grid AS (
  SELECT a.t AS ta, b.t AS tb FROM types a CROSS JOIN types b
), dep AS (
  SELECT g.ta, g.tb,
         CAST(COALESCE(f.n, 0) AS BIGINT) AS f_ab,
         CAST(COALESCE(r.n, 0) AS BIGINT) AS f_ba
  FROM grid g
  LEFT JOIN cnt f ON f.src = g.ta AND f.dst = g.tb
  LEFT JOIN cnt r ON r.src = g.tb AND r.dst = g.ta
)
SELECT ta, tb, f_ab,
       ROUND(CASE WHEN ta = tb
                  THEN CAST(f_ab AS DOUBLE) / (f_ab + 1)
                  ELSE CAST(f_ab - f_ba AS DOUBLE) / (f_ab + f_ba + 1)
             END, 6) AS dep_r,
       CASE WHEN (CASE WHEN ta = tb
                       THEN CAST(f_ab AS DOUBLE) / (f_ab + 1)
                       ELSE CAST(f_ab - f_ba AS DOUBLE) / (f_ab + f_ba + 1)
                  END) >= 0.5 THEN 1 ELSE 0 END AS edge_flag
FROM dep
ORDER BY ta, tb
""",
    tags=("process", "events", "graph"),
)
def a199_heuristic_miner_dependency(spark, sf_dir):
    """Heuristics-miner dependency measure over the full (ordered)
    type x type grid: dep(a,b) = (|a>b| - |b>a|) / (|a>b| + |b>a| + 1)
    for a != b and the length-one-loop form |a>a| / (|a>a| + 1) on the
    diagonal -- the noise-robust causal strength the heuristic miner
    thresholds to draw its net (edge_flag at the classic 0.5). The
    ratio is a single division of exact BIGINT counts feeding a
    terminal round(,6); grid and output are O(|types|^2)."""
    pairs = _dfg_pairs(spark, sf_dir)
    cnt = pairs.groupBy("src", "dst").agg(
        F.count("*").cast("bigint").alias("n")
    )
    e = table(spark, sf_dir, "events")
    types = e.select(F.col("event_type").alias("t")).distinct()
    grid = (
        types.alias("a")
        .crossJoin(types.alias("b"))
        .select(F.col("a.t").alias("ta"), F.col("b.t").alias("tb"))
    )
    f = cnt.select(
        F.col("src").alias("ta"), F.col("dst").alias("tb"),
        F.col("n").alias("n_f"),
    )
    r = cnt.select(
        F.col("dst").alias("ta"), F.col("src").alias("tb"),
        F.col("n").alias("n_r"),
    )
    dep = (
        grid.join(F.broadcast(f), ["ta", "tb"], "left")
        .join(F.broadcast(r), ["ta", "tb"], "left")
        .select(
            "ta",
            "tb",
            F.coalesce("n_f", F.lit(0)).cast("bigint").alias("f_ab"),
            F.coalesce("n_r", F.lit(0)).cast("bigint").alias("f_ba"),
        )
    )
    dep_expr = F.when(
        F.col("ta") == F.col("tb"),
        F.col("f_ab").cast("double") / (F.col("f_ab") + F.lit(1)),
    ).otherwise(
        (F.col("f_ab") - F.col("f_ba")).cast("double")
        / (F.col("f_ab") + F.col("f_ba") + F.lit(1))
    )
    return dep.select(
        "ta",
        "tb",
        "f_ab",
        F.round(dep_expr, 6).alias("dep_r"),
        F.when(dep_expr >= 0.5, 1).otherwise(0).alias("edge_flag"),
    ).orderBy("ta", "tb")


@query(
    "a200_littles_law_audit",
    oracle="""
WITH seq AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t_us,
         CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                   - LAG(CAST(epoch_us(ts) AS BIGINT)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000
              OR LAG(ts) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
), sess AS (
  SELECT user_id, sid,
         CAST(MIN(t_us) AS BIGINT) AS s_start,
         CAST(MAX(t_us) AS BIGINT) AS s_end
  FROM (
    SELECT user_id, t_us,
           SUM(new_s) OVER
             (PARTITION BY user_id ORDER BY t_us
              ROWS UNBOUNDED PRECEDING) AS sid
    FROM seq
  ) GROUP BY 1, 2
), horiz AS (
  SELECT CAST(MIN(s_start) AS BIGINT) AS h0,
         CAST(MAX(s_end) AS BIGINT) AS h1
  FROM sess
), ticks AS (
  SELECT h0 + 3600000000 * CAST(g AS BIGINT) AS tick
  FROM horiz, UNNEST(generate_series(1, 2400)) AS u(g)
  WHERE h0 + 3600000000 * CAST(g AS BIGINT) < h1
), scal AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
         CAST(SUM((s_end - s_start) // 1000) AS BIGINT) AS total_dur_ms,
         (SELECT (h1 - h0) // 1000 FROM horiz) AS horizon_ms
  FROM sess
), sampled AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS span_hits,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM ticks) AS n_ticks
  FROM ticks t JOIN sess s
    ON s.s_start <= t.tick AND t.tick < s.s_end
)
SELECT n_sessions, total_dur_ms, horizon_ms,
       CASE WHEN horizon_ms = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((total_dur_ms // horizon_ms) * 1000000
                      + ((total_dur_ms % horizon_ms) * 1000000)
                        // horizon_ms AS BIGINT)
       END AS l_timeavg_micro,
       CASE WHEN n_ticks = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((span_hits // n_ticks) * 1000000
                      + ((span_hits % n_ticks) * 1000000) // n_ticks
                      AS BIGINT)
       END AS l_sampled_micro,
       span_hits, n_ticks
FROM scal CROSS JOIN sampled
""",
    tags=("process", "events", "queueing"),
)
def a200_littles_law_audit(spark, sf_dir):
    """Little's law audit on sessionized activity: L (time-average
    concurrent sessions) computed two independent ways -- exactly, as
    sum(session durations)/horizon (which IS lambda*W, so the law holds
    by construction), and empirically, by sampling concurrency at up to
    2400 hourly ticks (count of sessions spanning each tick). The gap
    between l_timeavg_micro and l_sampled_micro is pure sampling error
    -- the classic way a dashboard 'current sessions' gauge disagrees
    with throughput x latency. Sessions are 30-min-gap windows built by
    one per-user running-sum window pass; the tick join is sessions x
    <=2400 bounded ticks. Durations floor to milliseconds per session
    BEFORE the corpus fold and both L ratios use the overflow-safe
    split division (total//h)*1e6 + ((total%h)*1e6)//h -- the 10x
    sweep caught the naive total*1e6 overflowing BIGINT (a038 class).
    All outputs exact integers."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.when(
            (
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
                > 1800000000
            )
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = (
        seq.select("user_id", "t_us", F.sum("new_s").over(w2).alias("sid"))
        .groupBy("user_id", "sid")
        .agg(
            F.min("t_us").cast("bigint").alias("s_start"),
            F.max("t_us").cast("bigint").alias("s_end"),
        )
        .localCheckpoint(eager=False)
    )
    horiz = sess.agg(
        F.min("s_start").cast("bigint").alias("h0"),
        F.max("s_end").cast("bigint").alias("h1"),
    )
    scal = sess.crossJoin(F.broadcast(horiz)).agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum(F.expr("(s_end - s_start) div 1000")).cast("bigint").alias(
            "total_dur_ms"
        ),
        F.expr("(MAX(h1) - MAX(h0)) div 1000").cast("bigint").alias(
            "horizon_ms"
        ),
    )
    # Per-session closed form for "# hourly ticks g in [1, 2400] with
    # tick < h1 and s_start <= h0 + g*3600e6 < s_end" — equivalent to
    # the oracle's range join but with ZERO join fan-out (the r5
    # non-equi-band lesson: a BETWEEN tick join plans as a cartesian).
    u = 3600000000
    hits = sess.crossJoin(F.broadcast(horiz)).select(
        F.greatest(
            F.expr(f"(s_start - h0 + {u - 1}) div {u}"), F.lit(1).cast("bigint")
        ).alias("g_lo"),
        F.least(
            F.expr(f"(s_end - h0 - 1) div {u}"),
            F.expr(f"(h1 - h0 - 1) div {u}"),
            F.lit(2400).cast("bigint"),
        ).alias("g_hi"),
    )
    n_ticks_df = horiz.select(
        F.least(
            F.expr(f"(h1 - h0 - 1) div {u}"), F.lit(2400).cast("bigint")
        ).alias("n_ticks")
    )
    sampled = (
        hits.agg(
            F.sum(
                F.greatest(
                    F.col("g_hi") - F.col("g_lo") + F.lit(1),
                    F.lit(0).cast("bigint"),
                )
            )
            .cast("bigint")
            .alias("span_hits")
        )
        .crossJoin(F.broadcast(n_ticks_df))
    )
    return scal.crossJoin(F.broadcast(sampled)).select(
        "n_sessions",
        "total_dur_ms",
        "horizon_ms",
        # Degenerate horizons (all events in one instant / under ~2h →
        # zero ticks) must yield 0 on both engines, not Spark-NULL vs
        # DuckDB-raise (a204 det_ppm guard pattern).
        F.expr(
            "CASE WHEN horizon_ms = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST((total_dur_ms div horizon_ms) * 1000000"
            " + ((total_dur_ms % horizon_ms) * 1000000) div horizon_ms"
            " AS BIGINT) END"
        ).alias("l_timeavg_micro"),
        F.expr(
            "CASE WHEN n_ticks = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST((span_hits div n_ticks) * 1000000"
            " + ((span_hits % n_ticks) * 1000000) div n_ticks"
            " AS BIGINT) END"
        ).alias("l_sampled_micro"),
        "span_hits",
        "n_ticks",
    )


@query(
    "a201_var1_model",
    oracle=f"""
WITH {_DAILYVK_SQL},
pan AS (
  SELECT d, v, yk,
         LAG(v) OVER (ORDER BY d) AS vl,
         LAG(yk) OVER (ORDER BY d) AS yl
  FROM daily
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(vl) AS BIGINT) AS sx1, CAST(SUM(yl) AS BIGINT) AS sx2,
         CAST(SUM(v) AS BIGINT) AS sv, CAST(SUM(yk) AS BIGINT) AS sy,
         CAST(SUM(vl * vl) AS BIGINT) AS s11,
         CAST(SUM(vl * yl) AS BIGINT) AS s12,
         CAST(SUM(yl * yl) AS BIGINT) AS s22,
         CAST(SUM(vl * v) AS BIGINT) AS c1v,
         CAST(SUM(yl * v) AS BIGINT) AS c2v,
         CAST(SUM(vl * yk) AS BIGINT) AS c1y,
         CAST(SUM(yl * yk) AS BIGINT) AS c2y
  FROM pan WHERE vl IS NOT NULL
), m AS (
  SELECT n,
         CAST(n * s11 - sx1 * sx1 AS DOUBLE) AS m11,
         CAST(n * s12 - sx1 * sx2 AS DOUBLE) AS m12,
         CAST(n * s22 - sx2 * sx2 AS DOUBLE) AS m22,
         CAST(n * c1v - sx1 * sv AS DOUBLE) AS b1v,
         CAST(n * c2v - sx2 * sv AS DOUBLE) AS b2v,
         CAST(n * c1y - sx1 * sy AS DOUBLE) AS b1y,
         CAST(n * c2y - sx2 * sy AS DOUBLE) AS b2y,
         CAST(sv AS DOUBLE) / n AS mv, CAST(sy AS DOUBLE) / n AS my,
         CAST(sx1 AS DOUBLE) / n AS m1, CAST(sx2 AS DOUBLE) / n AS m2
  FROM s
), a AS (
  SELECT n, mv, my, m1, m2,
         (b1v * m22 - b2v * m12) / (m11 * m22 - m12 * m12) AS a11,
         (b2v * m11 - b1v * m12) / (m11 * m22 - m12 * m12) AS a12,
         (b1y * m22 - b2y * m12) / (m11 * m22 - m12 * m12) AS a21,
         (b2y * m11 - b1y * m12) / (m11 * m22 - m12 * m12) AS a22
  FROM m
)
SELECT n,
       ROUND(a11, 6) AS a11_r, ROUND(a12, 6) AS a12_r,
       ROUND(a21, 6) AS a21_r, ROUND(a22, 6) AS a22_r,
       ROUND(mv - a11 * m1 - a12 * m2, 6) AS c1_r,
       ROUND(my - a21 * m1 - a22 * m2, 6) AS c2_r,
       ROUND(CASE WHEN (a11 + a22) * (a11 + a22)
                       - 4 * (a11 * a22 - a12 * a21) >= 0
                  THEN GREATEST(
                    ABS((a11 + a22
                         + SQRT((a11 + a22) * (a11 + a22)
                                - 4 * (a11 * a22 - a12 * a21))) / 2),
                    ABS((a11 + a22
                         - SQRT((a11 + a22) * (a11 + a22)
                                - 4 * (a11 * a22 - a12 * a21))) / 2))
                  ELSE SQRT(ABS(a11 * a22 - a12 * a21))
             END, 6) AS spectral_radius_r
FROM a
""",
    tags=("inference", "timeseries"),
)
def a201_var1_model(spark, sf_dir):
    """Bivariate VAR(1) fit on the (daily volume, daily adaptive-unit
    revenue) system: [v_t, y_t]' = c + A [v_{t-1}, y_{t-1}]' + e, the
    workhorse lead-lag model Granger causality (a507) presumes. Each
    equation is a two-predictor OLS solved in closed form from exact
    n-cross-multiplied BIGINT lag moments over the bounded day panel;
    the stability diagnostic is the companion-matrix spectral radius
    (real eigenvalues via the trace/det quadratic when the discriminant
    is nonnegative, modulus sqrt(|det|) for the complex pair). Scalar
    doubles only, every output a terminal round(,6); the revenue side
    is the adaptive-unit yk (_dailyvk) so the n-cross-multiplied lag
    moments keep the same int64 headroom at every corpus scale."""
    w = Window.orderBy("d")
    pan = _dailyvk(spark, sf_dir).select(
        "d",
        "v",
        "yk",
        F.lag("v").over(w).alias("vl"),
        F.lag("yk").over(w).alias("yl"),
    ).filter(F.col("vl").isNotNull())
    s = pan.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("vl").cast("bigint").alias("sx1"),
        F.sum("yl").cast("bigint").alias("sx2"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum("yk").cast("bigint").alias("sy"),
        F.sum(F.col("vl") * F.col("vl")).cast("bigint").alias("s11"),
        F.sum(F.col("vl") * F.col("yl")).cast("bigint").alias("s12"),
        F.sum(F.col("yl") * F.col("yl")).cast("bigint").alias("s22"),
        F.sum(F.col("vl") * F.col("v")).cast("bigint").alias("c1v"),
        F.sum(F.col("yl") * F.col("v")).cast("bigint").alias("c2v"),
        F.sum(F.col("vl") * F.col("yk")).cast("bigint").alias("c1y"),
        F.sum(F.col("yl") * F.col("yk")).cast("bigint").alias("c2y"),
    )
    m = s.select(
        "n",
        F.expr("CAST(n * s11 - sx1 * sx1 AS DOUBLE)").alias("m11"),
        F.expr("CAST(n * s12 - sx1 * sx2 AS DOUBLE)").alias("m12"),
        F.expr("CAST(n * s22 - sx2 * sx2 AS DOUBLE)").alias("m22"),
        F.expr("CAST(n * c1v - sx1 * sv AS DOUBLE)").alias("b1v"),
        F.expr("CAST(n * c2v - sx2 * sv AS DOUBLE)").alias("b2v"),
        F.expr("CAST(n * c1y - sx1 * sy AS DOUBLE)").alias("b1y"),
        F.expr("CAST(n * c2y - sx2 * sy AS DOUBLE)").alias("b2y"),
        F.expr("CAST(sv AS DOUBLE) / n").alias("mv"),
        F.expr("CAST(sy AS DOUBLE) / n").alias("my"),
        F.expr("CAST(sx1 AS DOUBLE) / n").alias("m1"),
        F.expr("CAST(sx2 AS DOUBLE) / n").alias("m2"),
    )
    a = m.select(
        "n",
        "mv",
        "my",
        "m1",
        "m2",
        F.expr(
            "(b1v * m22 - b2v * m12) / (m11 * m22 - m12 * m12)"
        ).alias("a11"),
        F.expr(
            "(b2v * m11 - b1v * m12) / (m11 * m22 - m12 * m12)"
        ).alias("a12"),
        F.expr(
            "(b1y * m22 - b2y * m12) / (m11 * m22 - m12 * m12)"
        ).alias("a21"),
        F.expr(
            "(b2y * m11 - b1y * m12) / (m11 * m22 - m12 * m12)"
        ).alias("a22"),
    )
    return a.select(
        "n",
        F.round("a11", 6).alias("a11_r"),
        F.round("a12", 6).alias("a12_r"),
        F.round("a21", 6).alias("a21_r"),
        F.round("a22", 6).alias("a22_r"),
        F.round(
            F.col("mv") - F.col("a11") * F.col("m1") - F.col("a12") * F.col("m2"),
            6,
        ).alias("c1_r"),
        F.round(
            F.col("my") - F.col("a21") * F.col("m1") - F.col("a22") * F.col("m2"),
            6,
        ).alias("c2_r"),
        F.round(
            F.expr(
                "CASE WHEN (a11 + a22) * (a11 + a22)"
                " - 4 * (a11 * a22 - a12 * a21) >= 0"
                " THEN GREATEST("
                " ABS((a11 + a22 + SQRT((a11 + a22) * (a11 + a22)"
                " - 4 * (a11 * a22 - a12 * a21))) / 2),"
                " ABS((a11 + a22 - SQRT((a11 + a22) * (a11 + a22)"
                " - 4 * (a11 * a22 - a12 * a21))) / 2))"
                " ELSE SQRT(ABS(a11 * a22 - a12 * a21)) END"
            ),
            6,
        ).alias("spectral_radius_r"),
    )


@query(
    "a202_poincare_sd",
    oracle=f"""
WITH daily AS ({_DAILYV_SQL}),
pan AS (
  SELECT v, LEAD(v) OVER (ORDER BY d) AS vn FROM daily
), dz AS (
  SELECT CAST(vn - v AS BIGINT) AS df, CAST(vn + v AS BIGINT) AS sm
  FROM pan WHERE vn IS NOT NULL
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(df) AS BIGINT) AS sd, CAST(SUM(df * df) AS BIGINT) AS sdd,
         CAST(SUM(sm) AS BIGINT) AS ss, CAST(SUM(sm * sm) AS BIGINT) AS sss
  FROM dz
)
SELECT n,
       ROUND(SQRT(CAST(n * sdd - sd * sd AS DOUBLE)
                  / (CAST(n AS DOUBLE) * n * 2)), 6) AS sd1_r,
       ROUND(SQRT(CAST(n * sss - ss * ss AS DOUBLE)
                  / (CAST(n AS DOUBLE) * n * 2)), 6) AS sd2_r,
       ROUND(SQRT(CAST(n * sdd - sd * sd AS DOUBLE)
                  / CAST(n * sss - ss * ss AS DOUBLE)), 6) AS ratio_r,
       ROUND(PI() * SQRT(CAST(n * sdd - sd * sd AS DOUBLE)
                         / (CAST(n AS DOUBLE) * n * 2))
                  * SQRT(CAST(n * sss - ss * ss AS DOUBLE)
                         / (CAST(n AS DOUBLE) * n * 2)), 6) AS ellipse_area_r
FROM s
""",
    tags=("inference", "timeseries"),
)
def a202_poincare_sd(spark, sf_dir):
    """Poincare-plot dispersion of daily order volume: SD1 (short-term
    variability, the spread of (v_t, v_{t+1}) perpendicular to the
    identity line = sd(diff)/sqrt(2)) and SD2 (long-term, along the
    line = sd(sum)/sqrt(2)), plus their ratio and the fitted ellipse
    area pi*SD1*SD2 -- the HRV-style nonlinear summary that separates
    jitter from drift where a plain variance cannot. Lag pairs come
    from one LEAD over the bounded day panel; diff/sum moments are
    exact BIGINTs, the sqrts are scalar, every output a terminal
    round(,6)."""
    daily = _dailyv(spark, sf_dir)
    w = Window.orderBy("d")
    pan = daily.select("v", F.lead("v").over(w).alias("vn")).filter(
        F.col("vn").isNotNull()
    )
    dz = pan.select(
        (F.col("vn") - F.col("v")).cast("bigint").alias("df"),
        (F.col("vn") + F.col("v")).cast("bigint").alias("sm"),
    )
    s = dz.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("df").cast("bigint").alias("sd"),
        F.sum(F.col("df") * F.col("df")).cast("bigint").alias("sdd"),
        F.sum("sm").cast("bigint").alias("ss"),
        F.sum(F.col("sm") * F.col("sm")).cast("bigint").alias("sss"),
    )
    sd1 = F.sqrt(
        F.expr(
            "CAST(n * sdd - sd * sd AS DOUBLE) / (CAST(n AS DOUBLE) * n * 2)"
        )
    )
    sd2 = F.sqrt(
        F.expr(
            "CAST(n * sss - ss * ss AS DOUBLE) / (CAST(n AS DOUBLE) * n * 2)"
        )
    )
    return s.select(
        "n",
        F.round(sd1, 6).alias("sd1_r"),
        F.round(sd2, 6).alias("sd2_r"),
        F.round(
            F.sqrt(
                F.expr(
                    "CAST(n * sdd - sd * sd AS DOUBLE)"
                    " / CAST(n * sss - ss * ss AS DOUBLE)"
                )
            ),
            6,
        ).alias("ratio_r"),
        F.round(F.lit(math.pi) * sd1 * sd2, 6).alias("ellipse_area_r"),
    )


@query(
    "a203_transfer_entropy",
    oracle=f"""
WITH daily AS ({_DAILYV_SQL}),
med AS (
  SELECT
    (SELECT v FROM daily ORDER BY v, d
      LIMIT 1 OFFSET (SELECT ((COUNT(*) + 1) // 2) - 1 FROM daily)) AS mv,
    (SELECT y FROM daily ORDER BY y, d
      LIMIT 1 OFFSET (SELECT ((COUNT(*) + 1) // 2) - 1 FROM daily)) AS my
), bin AS (
  SELECT d,
         CASE WHEN v > (SELECT mv FROM med) THEN 1 ELSE 0 END AS bv,
         CASE WHEN y > (SELECT my FROM med) THEN 1 ELSE 0 END AS by_
  FROM daily
), tri AS (
  SELECT by_ AS a, LAG(by_) OVER (ORDER BY d) AS b,
         LAG(bv) OVER (ORDER BY d) AS c
  FROM bin
), cells AS (
  SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS n_abc
  FROM tri WHERE b IS NOT NULL GROUP BY 1, 2, 3
), marg AS (
  SELECT c1.a, c1.b, c1.c, c1.n_abc,
         (SELECT SUM(n_abc) FROM cells c2 WHERE c2.b = c1.b) AS n_b,
         (SELECT SUM(n_abc) FROM cells c2
           WHERE c2.a = c1.a AND c2.b = c1.b) AS n_ab,
         (SELECT SUM(n_abc) FROM cells c2
           WHERE c2.b = c1.b AND c2.c = c1.c) AS n_bc
  FROM cells c1
), q AS (
  SELECT CAST(SUM(n_abc) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(n_abc * LN(CAST(n_abc AS DOUBLE) * n_b
                                        / (CAST(n_ab AS DOUBLE) * n_bc))
                             * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS s_micro
  FROM marg
)
SELECT n,
       ROUND((CAST(s_micro AS DOUBLE) / 1000000.0) / n, 6) AS te_vy_r
FROM q
""",
    tags=("inference", "timeseries", "information"),
)
def a203_transfer_entropy(spark, sf_dir):
    """Transfer entropy TE(volume -> revenue) at lag 1 on the median-
    binarized daily panel: TE = sum p(y_t, y_{t-1}, v_{t-1}) * ln[
    p(y_t | y_{t-1}, v_{t-1}) / p(y_t | y_{t-1}) ] -- the directed,
    model-free dependence that Granger causality (a507) linearizes.
    Binarization thresholds at the exact lower median (a179's order
    statistic); the triple histogram has <=8 cells, each ln runs once
    per cell on exact integer count ratios, each term is nano-quantized
    to BIGINT micro BEFORE the cross-cell sum (a155/a186 discipline),
    and the single terminal division feeds round(,6)."""
    daily = _dailyv(spark, sf_dir).localCheckpoint(eager=False)
    n_all = daily.agg(F.count("*").cast("bigint").alias("n_all"))
    mv = (
        daily.crossJoin(F.broadcast(n_all))
        .select(
            "v",
            F.row_number().over(Window.orderBy("v", "d")).alias("rn"),
            "n_all",
        )
        .filter(F.col("rn") == F.expr("(n_all + 1) div 2"))
        .select(F.col("v").alias("mv"))
    )
    my = (
        daily.crossJoin(F.broadcast(n_all))
        .select(
            "y",
            F.row_number().over(Window.orderBy("y", "d")).alias("rn"),
            "n_all",
        )
        .filter(F.col("rn") == F.expr("(n_all + 1) div 2"))
        .select(F.col("y").alias("my"))
    )
    bin_df = daily.crossJoin(F.broadcast(mv)).crossJoin(F.broadcast(my)).select(
        "d",
        F.when(F.col("v") > F.col("mv"), 1).otherwise(0).alias("bv"),
        F.when(F.col("y") > F.col("my"), 1).otherwise(0).alias("by_"),
    )
    w = Window.orderBy("d")
    tri = bin_df.select(
        F.col("by_").alias("a"),
        F.lag("by_").over(w).alias("b"),
        F.lag("bv").over(w).alias("c"),
    ).filter(F.col("b").isNotNull())
    cells = tri.groupBy("a", "b", "c").agg(
        F.count("*").cast("bigint").alias("n_abc")
    ).localCheckpoint(eager=False)
    n_b = cells.groupBy("b").agg(F.sum("n_abc").cast("bigint").alias("n_b"))
    n_ab = cells.groupBy("a", "b").agg(
        F.sum("n_abc").cast("bigint").alias("n_ab")
    )
    n_bc = cells.groupBy("b", "c").agg(
        F.sum("n_abc").cast("bigint").alias("n_bc")
    )
    marg = (
        cells.join(F.broadcast(n_b), "b")
        .join(F.broadcast(n_ab), ["a", "b"])
        .join(F.broadcast(n_bc), ["b", "c"])
    )
    q = marg.agg(
        F.sum("n_abc").cast("bigint").alias("n"),
        F.sum(
            F.expr(
                "CAST(ROUND(n_abc * LN(CAST(n_abc AS DOUBLE) * n_b"
                " / (CAST(n_ab AS DOUBLE) * n_bc)) * 1000000.0, 0) AS BIGINT)"
            )
        ).cast("bigint").alias("s_micro"),
    )
    return q.select(
        "n",
        F.round(
            (F.col("s_micro").cast("double") / F.lit(1000000.0)) / F.col("n"),
            6,
        ).alias("te_vy_r"),
    )


@query(
    "a204_recurrence_quantification",
    oracle=f"""
WITH daily AS ({_DAILYV_SQL}),
pan AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
), eps AS (
  SELECT CAST((MAX(v) - MIN(v)) // 20 AS BIGINT) AS e,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pan
), rec AS (
  SELECT a.i AS i, b.i AS j
  FROM pan a JOIN pan b ON a.i < b.i
  WHERE ABS(a.v - b.v) <= (SELECT e FROM eps)
), diag AS (
  SELECT r1.i, r1.j
  FROM rec r1
  WHERE EXISTS (SELECT 1 FROM rec r2
                 WHERE r2.i = r1.i + 1 AND r2.j = r1.j + 1)
     OR EXISTS (SELECT 1 FROM rec r2
                 WHERE r2.i = r1.i - 1 AND r2.j = r1.j - 1)
), cnts AS (
  SELECT (SELECT e FROM eps) AS eps,
         (SELECT n FROM eps) AS n,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM rec) AS n_recurrent,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM diag) AS n_in_lines
)
SELECT n, eps, n_recurrent,
       CAST(n_recurrent * 1000000 // (n * (n - 1) // 2) AS BIGINT)
         AS rr_ppm,
       n_in_lines,
       CASE WHEN n_recurrent = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(n_in_lines * 1000000 // n_recurrent AS BIGINT)
       END AS det_ppm
FROM cnts
""",
    tags=("inference", "timeseries", "dynamics"),
)
def a204_recurrence_quantification(spark, sf_dir):
    """Recurrence quantification analysis of daily order volume:
    recurrence rate (fraction of day pairs within eps = range/20 of
    each other) and determinism (fraction of recurrent pairs lying on a
    diagonal line of length >= 2, i.e. whose successor or predecessor
    pair also recurs -- periodic dynamics score high, noise scores
    low). The pair stage is the calendar-bounded panel self-join
    (<=C(2404,2) rows at any corpus scale); the diagonal test is an
    exact (i+1, j+1) self-join of the recurrent-pair set; eps and all
    tallies are exact integers."""
    daily = _dailyv(spark, sf_dir)
    pan = daily.select(
        "v", F.row_number().over(Window.orderBy("d")).alias("i")
    ).localCheckpoint(eager=False)
    eps = pan.agg(
        F.expr("CAST((MAX(v) - MIN(v)) div 20 AS BIGINT)").alias("e"),
        F.count("*").cast("bigint").alias("n"),
    )
    a = pan.alias("a")
    b = pan.alias("b")
    rec = (
        a.join(b, F.col("a.i") < F.col("b.i"))
        .crossJoin(F.broadcast(eps))
        .filter(F.abs(F.col("a.v") - F.col("b.v")) <= F.col("e"))
        .select(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .localCheckpoint(eager=False)
    )
    succ = rec.select(
        (F.col("i") - 1).alias("i"), (F.col("j") - 1).alias("j"),
        F.lit(1).alias("has_succ"),
    )
    pred = rec.select(
        (F.col("i") + 1).alias("i"), (F.col("j") + 1).alias("j"),
        F.lit(1).alias("has_pred"),
    )
    diag = (
        rec.join(succ, ["i", "j"], "left")
        .join(pred, ["i", "j"], "left")
        .filter(F.col("has_succ").isNotNull() | F.col("has_pred").isNotNull())
        .select("i", "j")
    )
    n_rec = rec.agg(F.count("*").cast("bigint").alias("n_recurrent"))
    n_diag = diag.agg(F.count("*").cast("bigint").alias("n_in_lines"))
    return (
        eps.crossJoin(F.broadcast(n_rec))
        .crossJoin(F.broadcast(n_diag))
        .select(
            "n",
            F.col("e").alias("eps"),
            "n_recurrent",
            F.expr(
                "CAST(n_recurrent * 1000000 div (n * (n - 1) div 2) AS BIGINT)"
            ).alias("rr_ppm"),
            "n_in_lines",
            F.expr(
                "CASE WHEN n_recurrent = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST(n_in_lines * 1000000 div n_recurrent AS BIGINT) END"
            ).alias("det_ppm"),
        )
    )


@query(
    "a205_seasonal_strength",
    oracle=f"""
WITH daily AS ({_DAILYV_SQL}),
ma AS (
  SELECT d, v,
         CAST(isodow(d) AS BIGINT) AS dow,
         CAST(SUM(v) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                           AND 3 FOLLOWING) AS BIGINT) AS t7,
         CAST(COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
                             AND 3 FOLLOWING) AS BIGINT) AS w7
  FROM daily
), interior AS (
  SELECT d, v, dow, CAST(7 * v - t7 AS BIGINT) AS det7
  FROM ma WHERE w7 = 7
), vbar AS (
  SELECT CAST(SUM(v) // COUNT(*) AS BIGINT) AS vb FROM interior
), seas AS (
  SELECT dow, CAST(SUM(det7) AS BIGINT) AS s_num,
         CAST(COUNT(*) AS BIGINT) AS n_dow
  FROM interior GROUP BY 1
), rel AS (
  SELECT i.d,
         CAST(i.det7 * 1000000 // (7 * vb) AS BIGINT) AS det_rel,
         CAST((i.det7 * s.n_dow - s.s_num) * 1000000
              // (7 * s.n_dow * vb) AS BIGINT) AS rem_rel,
         CAST((7 * s.n_dow * i.v - s.s_num) * 1000000
              // (7 * s.n_dow * vb) AS BIGINT) AS sa_rel
  FROM interior i JOIN seas s ON i.dow = s.dow CROSS JOIN vbar
), mo AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(det_rel) AS BIGINT) AS s_d,
         CAST(SUM(det_rel * det_rel) AS BIGINT) AS ss_d,
         CAST(SUM(rem_rel) AS BIGINT) AS s_r,
         CAST(SUM(rem_rel * rem_rel) AS BIGINT) AS ss_r,
         CAST(SUM(sa_rel) AS BIGINT) AS s_a,
         CAST(SUM(sa_rel * sa_rel) AS BIGINT) AS ss_a
  FROM rel
)
SELECT n,
       ROUND(GREATEST(0.0, 1.0 - CAST(n * ss_r - s_r * s_r AS DOUBLE)
                                 / CAST(n * ss_d - s_d * s_d AS DOUBLE)),
             6) AS seasonal_strength_r,
       ROUND(GREATEST(0.0, 1.0 - CAST(n * ss_r - s_r * s_r AS DOUBLE)
                                 / CAST(n * ss_a - s_a * s_a AS DOUBLE)),
             6) AS trend_strength_r
FROM mo
""",
    tags=("inference", "timeseries"),
)
def a205_seasonal_strength(spark, sf_dir):
    """STL-style seasonal and trend strength of daily order volume:
    detrend with a centered 7-day moving average (interior days only),
    estimate the day-of-week seasonal as the per-dow mean of the
    detrended series, and report F_seasonal = 1 - Var(remainder)/
    Var(detrended) and F_trend = 1 - Var(remainder)/Var(seasonally
    adjusted) (Hyndman's feasts definitions, clamped at 0). To keep
    every cross-row fold exact at ANY corpus scale, per-day values are
    floor-normalized to ppm-of-mean-volume BIGINTs (det7*1e6 //
    (7*vbar) etc.) BEFORE the moment sums -- scale-free by
    construction, identical floors in both engines."""
    daily = _dailyv(spark, sf_dir)
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    ma = daily.select(
        "d",
        "v",
        F.sum("v").over(w7).cast("bigint").alias("t7"),
        F.count("*").over(w7).cast("bigint").alias("w7"),
    )
    # Spark dayofweek is 1=Sunday..7; DuckDB isodow is 1=Monday..7.
    # Derive DuckDB's numbering: isodow = ((dayofweek + 5) % 7) + 1.
    interior = ma.filter(F.col("w7") == 7).select(
        "d",
        "v",
        F.expr("CAST(((dayofweek(d) + 5) % 7) + 1 AS BIGINT)").alias("dow"),
        F.expr("CAST(7 * v - t7 AS BIGINT)").alias("det7"),
    ).localCheckpoint(eager=False)
    vbar = interior.agg(
        F.expr("CAST(SUM(v) div COUNT(*) AS BIGINT)").alias("vb")
    )
    seas = interior.groupBy("dow").agg(
        F.sum("det7").cast("bigint").alias("s_num"),
        F.count("*").cast("bigint").alias("n_dow"),
    )
    rel = (
        interior.join(F.broadcast(seas), "dow")
        .crossJoin(F.broadcast(vbar))
        .select(
            F.expr("CAST(det7 * 1000000 div (7 * vb) AS BIGINT)").alias(
                "det_rel"
            ),
            F.expr(
                "CAST((det7 * n_dow - s_num) * 1000000"
                " div (7 * n_dow * vb) AS BIGINT)"
            ).alias("rem_rel"),
            F.expr(
                "CAST((7 * n_dow * v - s_num) * 1000000"
                " div (7 * n_dow * vb) AS BIGINT)"
            ).alias("sa_rel"),
        )
    )
    mo = rel.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("det_rel").cast("bigint").alias("s_d"),
        F.sum(F.col("det_rel") * F.col("det_rel")).cast("bigint").alias("ss_d"),
        F.sum("rem_rel").cast("bigint").alias("s_r"),
        F.sum(F.col("rem_rel") * F.col("rem_rel")).cast("bigint").alias("ss_r"),
        F.sum("sa_rel").cast("bigint").alias("s_a"),
        F.sum(F.col("sa_rel") * F.col("sa_rel")).cast("bigint").alias("ss_a"),
    )
    return mo.select(
        "n",
        F.round(
            F.greatest(
                F.lit(0.0),
                F.lit(1.0)
                - F.expr("CAST(n * ss_r - s_r * s_r AS DOUBLE)")
                / F.expr("CAST(n * ss_d - s_d * s_d AS DOUBLE)"),
            ),
            6,
        ).alias("seasonal_strength_r"),
        F.round(
            F.greatest(
                F.lit(0.0),
                F.lit(1.0)
                - F.expr("CAST(n * ss_r - s_r * s_r AS DOUBLE)")
                / F.expr("CAST(n * ss_a - s_a * s_a AS DOUBLE)"),
            ),
            6,
        ).alias("trend_strength_r"),
    )


@query(
    "a206_allan_variance",
    oracle=f"""
WITH daily AS ({_DAILYV_SQL}),
idx AS (
  SELECT v, CAST(DATEDIFF('day', (SELECT MIN(d) FROM daily), d)
                 AS BIGINT) AS t
  FROM daily
), taus AS (
  SELECT CAST(tau AS BIGINT) AS tau
  FROM (VALUES (1), (2), (4), (8), (16)) AS tv(tau)
), blocks AS (
  SELECT ta.tau, i.t // ta.tau AS bk,
         CAST(SUM(i.v) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
  FROM idx i CROSS JOIN taus ta
  GROUP BY 1, 2
), full_b AS (
  SELECT tau, bk, s FROM blocks WHERE c = tau
), diffs AS (
  SELECT b1.tau, CAST(b2.s - b1.s AS BIGINT) AS dk
  FROM full_b b1 JOIN full_b b2
    ON b1.tau = b2.tau AND b2.bk = b1.bk + 1
)
SELECT tau, CAST(COUNT(*) AS BIGINT) AS m,
       CAST(SUM(dk * dk) AS BIGINT) AS sum_d2,
       ROUND(CAST(SUM(dk * dk) AS DOUBLE)
             / (2.0 * COUNT(*) * tau * tau), 6) AS avar_r
FROM diffs
GROUP BY tau
ORDER BY tau
""",
    tags=("inference", "timeseries"),
)
def a206_allan_variance(spark, sf_dir):
    """Allan variance of daily order volume at averaging times tau =
    1, 2, 4, 8, 16 days: AVAR(tau) = E[(ybar_{k+1} - ybar_k)^2] / 2
    over consecutive non-overlapping tau-day blocks -- the clock-
    stability statistic that separates white noise (slope -1 in
    log-log) from random walk (slope +1) where a plain variance
    conflates them. Blocks come from one groupBy on (tau, t div tau)
    over the bounded day panel crossed with a 5-row literal tau table;
    partial tail blocks are dropped exactly (c = tau); block-sum diffs
    are an equi-join on bk+1; the fold is exact BIGINT with one
    terminal division per tau."""
    daily = _dailyv(spark, sf_dir)
    bounds = daily.agg(F.min("d").alias("d0"))
    idx = daily.crossJoin(F.broadcast(bounds)).select(
        "v", F.datediff("d", "d0").cast("bigint").alias("t")
    )
    taus = literal_frame(
        spark,
        [(1,), (2,), (4,), (8,), (16,)], "tau long"
    )
    blocks = (
        idx.crossJoin(F.broadcast(taus))
        .groupBy("tau", F.expr("t div tau").alias("bk"))
        .agg(
            F.sum("v").cast("bigint").alias("s"),
            F.count("*").cast("bigint").alias("c"),
        )
    )
    full_b = blocks.filter(F.col("c") == F.col("tau")).select(
        "tau", "bk", "s"
    ).localCheckpoint(eager=False)
    b1 = full_b.alias("b1")
    b2 = full_b.alias("b2")
    diffs = b1.join(
        b2,
        (F.col("b1.tau") == F.col("b2.tau"))
        & (F.col("b2.bk") == F.col("b1.bk") + 1),
    ).select(
        F.col("b1.tau").alias("tau"),
        (F.col("b2.s") - F.col("b1.s")).cast("bigint").alias("dk"),
    )
    return (
        diffs.groupBy("tau")
        .agg(
            F.count("*").cast("bigint").alias("m"),
            F.sum(F.col("dk") * F.col("dk")).cast("bigint").alias("sum_d2"),
        )
        .select(
            "tau",
            "m",
            "sum_d2",
            F.round(
                F.expr(
                    "CAST(sum_d2 AS DOUBLE) / (2.0 * m * tau * tau)"
                ),
                6,
            ).alias("avar_r"),
        )
        .orderBy("tau")
    )


@query(
    "a207_split_half_reliability",
    oracle="""
WITH types AS (
  SELECT event_type AS t,
         ROW_NUMBER() OVER (ORDER BY event_type) AS tr
  FROM (SELECT DISTINCT event_type FROM events)
), halves AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ty.tr % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS h1,
         CAST(SUM(CASE WHEN ty.tr % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS h2
  FROM events e JOIN types ty ON e.event_type = ty.t
  GROUP BY 1
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(h1) AS BIGINT) AS s1, CAST(SUM(h2) AS BIGINT) AS s2,
         CAST(SUM(h1 * h1) AS BIGINT) AS s11,
         CAST(SUM(h2 * h2) AS BIGINT) AS s22,
         CAST(SUM(h1 * h2) AS BIGINT) AS s12
  FROM halves
)
SELECT n,
       ROUND(CAST(n * s12 - s1 * s2 AS DOUBLE)
             / (SQRT(CAST(n * s11 - s1 * s1 AS DOUBLE))
                * SQRT(CAST(n * s22 - s2 * s2 AS DOUBLE))), 6) AS r_half_r,
       ROUND(2.0 * (CAST(n * s12 - s1 * s2 AS DOUBLE)
                    / (SQRT(CAST(n * s11 - s1 * s1 AS DOUBLE))
                       * SQRT(CAST(n * s22 - s2 * s2 AS DOUBLE))))
             / (1.0 + CAST(n * s12 - s1 * s2 AS DOUBLE)
                      / (SQRT(CAST(n * s11 - s1 * s1 AS DOUBLE))
                         * SQRT(CAST(n * s22 - s2 * s2 AS DOUBLE)))),
             6) AS spearman_brown_r
FROM s
""",
    tags=("inference", "psychometrics"),
)
def a207_split_half_reliability(spark, sf_dir):
    """Split-half reliability of the per-user engagement instrument:
    event types are split odd/even by alphabetical rank (deterministic
    halves), each user's two half-scores are exact counts, their
    Pearson correlation is the split-half reliability, and the
    Spearman-Brown prophecy 2r/(1+r) projects it to full length -- the
    a486 Cronbach alpha's classical companion (alpha is the mean of
    all split-half coefficients under equal variances). One groupBy to
    per-user rows, exact n-cross-multiplied BIGINT moments, two scalar
    sqrts, terminal round(,6)."""
    e = table(spark, sf_dir, "events")
    types = (
        e.select("event_type")
        .distinct()
        .select(
            F.col("event_type").alias("t"),
            F.row_number().over(Window.orderBy("event_type")).alias("tr"),
        )
        # no-op bound: the type vocabulary is fixed; pins the broadcast
        # side as bounded in the analyzed plan (q95/a118 lint pattern)
        .limit(64)
    )
    halves = (
        e.join(F.broadcast(types), e["event_type"] == types["t"])
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("tr") % 2 == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("h1"),
            F.sum(F.when(F.col("tr") % 2 == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("h2"),
        )
    )
    s = halves.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("h1").cast("bigint").alias("s1"),
        F.sum("h2").cast("bigint").alias("s2"),
        F.sum(F.col("h1") * F.col("h1")).cast("bigint").alias("s11"),
        F.sum(F.col("h2") * F.col("h2")).cast("bigint").alias("s22"),
        F.sum(F.col("h1") * F.col("h2")).cast("bigint").alias("s12"),
    )
    r = F.expr(
        "CAST(n * s12 - s1 * s2 AS DOUBLE)"
        " / (SQRT(CAST(n * s11 - s1 * s1 AS DOUBLE))"
        " * SQRT(CAST(n * s22 - s2 * s2 AS DOUBLE)))"
    )
    return s.select(
        "n",
        F.round(r, 6).alias("r_half_r"),
        F.round(F.lit(2.0) * r / (F.lit(1.0) + r), 6).alias(
            "spearman_brown_r"
        ),
    )
