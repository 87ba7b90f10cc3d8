"""Round-10 battery extension 3 (a591–a598): regression-residual
serial-correlation diagnostics (Durbin–Watson, Breusch–Godfrey LM),
the Ramsey RESET functional-form test, the Cox–Stuart exact-binomial
trend test, Lempel–Ziv (LZ76) sequence complexity, the two-sample
energy distance, empirical-copula tail-dependence coefficients, and a
phonetic (simplified-Soundex) blocking-efficiency audit for entity
resolution.

Shared design rules (the monitoring.py / inference6.py discipline):
ONE map-side combined aggregate folds the corpus to a keyed summary
panel (per-type daily counts, the orders daily panel, or the part
vocabulary); every cross-row sum is an exact BIGINT; residuals are
*denominator-cleared* (multiplied through by the per-group OLS
denominator D = n·Sxx − Sx², the a434 "n-scaled deviation" trick one
step further) so autocorrelation sums stay exact integers; scalar
double algebra runs only on identical exact inputs through identical
expression text, feeding a terminal ``round(x, 6)`` or a raw
BIGINT/BIGINT ratio (one IEEE division, bit-identical cross-engine —
the a452 pattern). Iterative parses (LZ76) fold with ``F.aggregate``
in Spark while the oracle steps the SAME per-step expressions through
a recursive CTE (the a585 Viterbi recipe).

Overflow budget: the per-type daily count series is unit-rescaled
(ck = c // max(1, mean(c)//500), the _dailyvk discipline with a 500
target) so mean(ck) ∈ [500, 1000) at EVERY corpus scale; with the
30-day panel's D = 67,425 and |residual| ≤ ~8·mean the cleared
residual squares stay ≤ ~5e17 against the 9.2e18 int64 ceiling —
scale-invariant headroom ≥ 16×.

Reference parity target: junegunn/grouper exposes no statistics
surface (src/grouper/core.clj is a 155-line micro-batching utility);
these extend the engine's analytics/curation coverage for pipeline
monitoring and entity resolution at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..sources import table
from . import query
from .inference4 import _DAILYV_SQL, _dailyv

# ---------------------------------------------------------------------------
# Shared panels
# ---------------------------------------------------------------------------

# Unit-rescaled per-type daily count series with a contiguous 1-based
# index k (row_number over observed days — calendar gaps at tiny sf do
# not break the regressor). One global unit u pins mean(y) ∈ [500,
# 1000) at every corpus scale (see module docstring overflow budget).
_TDK_SQL = """
daily0 AS (
  SELECT event_type AS grp, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY grp, d
),
uk AS (
  SELECT GREATEST(1, (CAST(SUM(c) AS BIGINT) // COUNT(*)) // 500) AS u
  FROM daily0
),
seq AS (
  SELECT grp,
         CAST(row_number() OVER (PARTITION BY grp ORDER BY d)
              AS BIGINT) AS k,
         CAST(c // u AS BIGINT) AS y
  FROM daily0 CROSS JOIN uk
)
"""


def _tdk(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    daily0 = ev.groupBy(
        F.col("event_type").alias("grp"),
        F.date_trunc("day", "ts").cast("date").alias("d"),
    ).agg(F.count("*").cast("bigint").alias("c"))
    unit = daily0.agg(
        F.expr(
            "GREATEST(CAST(1 AS BIGINT),"
            " (CAST(SUM(c) AS BIGINT) div COUNT(*)) div 500)"
        ).alias("u")
    )
    w = Window.partitionBy("grp").orderBy("d")
    return (
        daily0.crossJoin(F.broadcast(unit))
        .select(
            "grp",
            F.row_number().over(w).cast("bigint").alias("k"),
            F.expr("CAST(c div u AS BIGINT)").alias("y"),
        )
        # ≤150-row panel referenced by moments + residual join (+ the
        # a594 self-join): checkpoint so Catalyst doesn't replan the
        # corpus count aggregate once per reference.
        .localCheckpoint(eager=False)
    )


# Denominator-cleared OLS trend residuals per type: with per-group
# moments (n, Sx, Sy, Sxx, Sxy) and D = n·Sxx − Sx², the residual of
# y ~ a + b·k scaled by D is the exact BIGINT
#   e = D·y − (Sy·Sxx − Sx·Sxy) − (n·Sxy − Sx·Sy)·k .
# OLS normal equations give Σe = 0 and Σe·k = 0 EXACTLY in integers —
# the property tests pin both.
_RESID_SQL = f"""
{_TDK_SQL},
mom AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(k) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(k * k) AS BIGINT) AS sxx,
         CAST(SUM(k * y) AS BIGINT) AS sxy
  FROM seq GROUP BY grp
),
resid AS (
  SELECT s.grp, s.k, m.n,
         (m.n * m.sxx - m.sx * m.sx) * s.y
           - (m.sy * m.sxx - m.sx * m.sxy)
           - (m.n * m.sxy - m.sx * m.sy) * s.k AS e
  FROM seq s JOIN mom m ON m.grp = s.grp
)
"""


def _trend_resid(spark, sf_dir):
    seq = _tdk(spark, sf_dir)
    mom = seq.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("sxx"),
        F.sum(F.col("k") * F.col("y")).cast("bigint").alias("sxy"),
    )
    j = seq.join(mom, "grp")
    e = (
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * F.col("y")
        - (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
        - (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) * F.col("k")
    )
    return j.select("grp", "k", "n", e.alias("e"))


# ---------------------------------------------------------------------------
# a591 Durbin–Watson
# ---------------------------------------------------------------------------


@query(
    "a591_durbin_watson",
    oracle=f"""
WITH {_RESID_SQL},
lagd AS (
  SELECT grp, n, e,
         lag(e) OVER (PARTITION BY grp ORDER BY k) AS el
  FROM resid
),
sums AS (
  SELECT grp, CAST(MIN(n) AS BIGINT) AS n,
         CAST(SUM(e * e) AS BIGINT) AS see,
         CAST(COALESCE(SUM((e - el) * (e - el)), 0) AS BIGINT) AS sdd
  FROM lagd GROUP BY grp
)
SELECT grp, n, see, sdd,
       CASE WHEN see = 0 THEN NULL
            ELSE CAST(sdd AS DOUBLE) / see END AS dw,
       CASE WHEN see = 0 THEN NULL
            ELSE round(1.0 - (CAST(sdd AS DOUBLE) / see) / 2.0, 6)
       END AS rho1_r
FROM sums ORDER BY grp
""",
    tags=("inference", "timeseries"),
)
def a591_durbin_watson(spark, sf_dir):
    """Durbin–Watson serial-correlation statistic of the OLS trend
    residuals of each event type's unit-rescaled daily counts —
    DW = Σ(eₜ−eₜ₋₁)²/Σeₜ², the first thing a forecaster reads off a
    fitted trend before trusting its standard errors (DW≈2 white,
    →0 positive, →4 negative serial correlation). Exactness: the
    residual is denominator-cleared (e·D with D = n·Sxx−Sx², module
    docstring) so BOTH quadratic sums are exact BIGINTs whose common
    D² cancels in the ratio; DW is emitted as one raw BIGINT/BIGINT
    IEEE division (bit-identical cross-engine, a452 pattern) plus the
    implied round(1−DW/2, 6) lag-1 coefficient. Scale: the corpus is
    gone after one count aggregate; the statistic runs on a ≤30-row
    per-type panel regardless of corpus size."""
    r = _trend_resid(spark, sf_dir)
    w = Window.partitionBy("grp").orderBy("k")
    lagd = r.select("grp", "n", "e", F.lag("e").over(w).alias("el"))
    sums = lagd.groupBy("grp").agg(
        F.min("n").cast("bigint").alias("n"),
        F.sum(F.col("e") * F.col("e")).cast("bigint").alias("see"),
        F.coalesce(
            F.sum((F.col("e") - F.col("el")) * (F.col("e") - F.col("el"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("sdd"),
    )
    dw = F.col("sdd").cast("double") / F.col("see")
    return sums.select(
        "grp",
        "n",
        "see",
        "sdd",
        F.when(F.col("see") == 0, F.lit(None).cast("double"))
        .otherwise(dw)
        .alias("dw"),
        F.when(F.col("see") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(1.0 - dw / 2.0, 6))
        .alias("rho1_r"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# a592 Breusch–Godfrey LM (lag 1)
# ---------------------------------------------------------------------------


@query(
    "a592_breusch_godfrey",
    oracle=f"""
WITH {_RESID_SQL},
lagd AS (
  SELECT grp, n, k, e,
         lag(e) OVER (PARTITION BY grp ORDER BY k) AS el
  FROM resid
),
aux AS (
  SELECT grp, CAST(MIN(n) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(e) AS BIGINT) AS se,
         CAST(SUM(el) AS BIGINT) AS sl,
         CAST(SUM(k) AS BIGINT) AS sk,
         CAST(SUM(e * e) AS BIGINT) AS see,
         CAST(SUM(el * el) AS BIGINT) AS sll,
         CAST(SUM(k * k) AS BIGINT) AS skk,
         CAST(SUM(e * el) AS BIGINT) AS sel,
         CAST(SUM(e * k) AS BIGINT) AS sek,
         CAST(SUM(el * k) AS BIGINT) AS slk
  FROM lagd WHERE el IS NOT NULL GROUP BY grp
),
calc AS (
  SELECT grp, n, m,
         CAST(see AS DOUBLE) - CAST(se AS DOUBLE) * se / m AS cee,
         CAST(sll AS DOUBLE) - CAST(sl AS DOUBLE) * sl / m AS cll,
         CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE) * sk / m AS ckk,
         CAST(sel AS DOUBLE) - CAST(se AS DOUBLE) * sl / m AS cel,
         CAST(sek AS DOUBLE) - CAST(se AS DOUBLE) * sk / m AS cek,
         CAST(slk AS DOUBLE) - CAST(sl AS DOUBLE) * sk / m AS clk
  FROM aux
),
fit AS (
  SELECT grp, n, m, cee, cel, cek,
         cll * ckk - clk * clk AS det,
         cel * ckk - cek * clk AS bnum,
         cek * cll - cel * clk AS gnum
  FROM calc
)
SELECT grp, m,
       CASE WHEN det <= 0 OR cee <= 0 THEN NULL
            ELSE round(((bnum / det) * cel + (gnum / det) * cek)
                       / cee, 6) END AS r2_r,
       CASE WHEN det <= 0 OR cee <= 0 THEN NULL
            ELSE round(GREATEST(m * (((bnum / det) * cel
                                      + (gnum / det) * cek) / cee),
                                0.0), 6) END AS lm_r,
       CASE WHEN det <= 0 THEN NULL
            ELSE round(bnum / det, 6) END AS rho_hat_r
FROM fit
ORDER BY grp
""",
    tags=("inference", "timeseries"),
)
def a592_breusch_godfrey(spark, sf_dir):
    """Breusch–Godfrey lag-1 LM test on the same denominator-cleared
    trend residuals as a591 — the auxiliary regression of eₜ on
    (1, t, eₜ₋₁) whose m·R² is χ²(1) under no serial correlation.
    Unlike Durbin–Watson it stays valid with lagged regressors and
    gives a usable ρ̂ (the eₜ₋₁ coefficient). All eleven auxiliary
    moments are exact BIGINT folds of the cleared residuals (the D²
    scale cancels inside R²; ρ̂ is scale-free too since both sides
    carry D); the centered 2-predictor closed form then runs in
    scalar doubles through identical expression text on identical
    exact inputs, guarded CASE WHEN det/cee degenerate (the a204
    discipline). Terminal round(x, 6) everywhere."""
    r = _trend_resid(spark, sf_dir)
    w = Window.partitionBy("grp").orderBy("k")
    lagd = r.select(
        "grp", "n", "k", "e", F.lag("e").over(w).alias("el")
    ).where(F.col("el").isNotNull())
    aux = lagd.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum("e").cast("bigint").alias("se"),
        F.sum("el").cast("bigint").alias("sl"),
        F.sum("k").cast("bigint").alias("sk"),
        F.sum(F.col("e") * F.col("e")).cast("bigint").alias("see"),
        F.sum(F.col("el") * F.col("el")).cast("bigint").alias("sll"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("skk"),
        F.sum(F.col("e") * F.col("el")).cast("bigint").alias("sel"),
        F.sum(F.col("e") * F.col("k")).cast("bigint").alias("sek"),
        F.sum(F.col("el") * F.col("k")).cast("bigint").alias("slk"),
    )
    m = F.col("m")
    cee = F.col("see").cast("double") - F.col("se").cast("double") * F.col("se") / m
    cll = F.col("sll").cast("double") - F.col("sl").cast("double") * F.col("sl") / m
    ckk = F.col("skk").cast("double") - F.col("sk").cast("double") * F.col("sk") / m
    cel = F.col("sel").cast("double") - F.col("se").cast("double") * F.col("sl") / m
    cek = F.col("sek").cast("double") - F.col("se").cast("double") * F.col("sk") / m
    clk = F.col("slk").cast("double") - F.col("sl").cast("double") * F.col("sk") / m
    c = aux.select(
        "grp",
        "m",
        cee.alias("cee"),
        cll.alias("cll"),
        ckk.alias("ckk"),
        cel.alias("cel"),
        cek.alias("cek"),
        clk.alias("clk"),
    )
    det = F.col("cll") * F.col("ckk") - F.col("clk") * F.col("clk")
    bn = (F.col("cel") * F.col("ckk") - F.col("cek") * F.col("clk")) / det
    gn = (F.col("cek") * F.col("cll") - F.col("cel") * F.col("clk")) / det
    r2 = (bn * F.col("cel") + gn * F.col("cek")) / F.col("cee")
    bad = (det <= 0) | (F.col("cee") <= 0)
    return c.select(
        "grp",
        "m",
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(r2, 6))
        .alias("r2_r"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(F.greatest(F.col("m") * r2, F.lit(0.0)), 6))
        .alias("lm_r"),
        F.when(det <= 0, F.lit(None).cast("double"))
        .otherwise(F.round(bn, 6))
        .alias("rho_hat_r"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# a593 Ramsey RESET (quadratic)
# ---------------------------------------------------------------------------


@query(
    "a593_ramsey_reset",
    oracle=f"""
WITH {_TDK_SQL},
mom AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq GROUP BY grp
),
ortho AS (
  SELECT s.grp, m.n, s.y,
         2 * s.k - (m.n + 1) AS u,
         3 * (2 * s.k - (m.n + 1)) * (2 * s.k - (m.n + 1))
           - (m.n * m.n - 1) AS q
  FROM seq s JOIN mom m ON m.grp = s.grp
),
agg AS (
  SELECT grp, CAST(MIN(n) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(u * u) AS BIGINT) AS suu,
         CAST(SUM(q * q) AS BIGINT) AS sqq,
         CAST(SUM(u * y) AS BIGINT) AS suy,
         CAST(SUM(q * y) AS BIGINT) AS sqy
  FROM ortho GROUP BY grp
),
calc AS (
  SELECT grp, n,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS cyy,
         CAST(suy AS DOUBLE) * suy / suu AS ssru,
         CAST(sqy AS DOUBLE) * sqy / sqq AS ssrq
  FROM agg
)
SELECT grp, n,
       CASE WHEN n <= 3 OR cyy - ssru - ssrq <= 0 THEN NULL
            ELSE round(ssrq * (n - 3) / (cyy - ssru - ssrq), 6)
       END AS reset_f_r,
       CASE WHEN cyy <= 0 THEN NULL
            ELSE round(ssrq / cyy, 6) END AS quad_share_r
FROM calc ORDER BY grp
""",
    tags=("inference", "timeseries"),
)
def a593_ramsey_reset(spark, sf_dir):
    """Ramsey RESET functional-form test (quadratic augmentation) on
    each event type's unit-rescaled daily trend: does adding a squared
    term to y ~ a + b·t significantly cut the SSE — the standard 'is
    the linear trend mis-specified' gate. Because the added RESET
    regressor ŷ² spans the same column as t², the test is the nested
    quadratic-vs-linear F; with ORTHOGONAL integer polynomials
    u = 2k−(n+1) (Σu=0) and q = 3u²−(n²−1) (Σq=0, Σu·q=0 over the
    contiguous index), the incremental SSR is simply (Σq·y)²/Σq² —
    no 3×3 solve. All seven moments are exact BIGINTs (|q| ≤ 1624 on
    a 30-day panel — trivial headroom); the F readout is scalar
    doubles on identical exact inputs, degenerate-guarded (n ≤ 3 or
    zero residual variance → NULL), terminal round(x, 6)."""
    seq = _tdk(spark, sf_dir)
    mom = seq.groupBy("grp").agg(F.count("*").cast("bigint").alias("n"))
    u = 2 * F.col("k") - (F.col("n") + 1)
    q = 3 * u * u - (F.col("n") * F.col("n") - 1)
    ortho = seq.join(mom, "grp").select(
        "grp", "n", "y", u.alias("u"), q.alias("q")
    )
    agg = ortho.groupBy("grp").agg(
        F.min("n").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("u") * F.col("u")).cast("bigint").alias("suu"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("sqq"),
        F.sum(F.col("u") * F.col("y")).cast("bigint").alias("suy"),
        F.sum(F.col("q") * F.col("y")).cast("bigint").alias("sqy"),
    )
    n = F.col("n")
    cyy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / n
    ssru = F.col("suy").cast("double") * F.col("suy") / F.col("suu")
    ssrq = F.col("sqy").cast("double") * F.col("sqy") / F.col("sqq")
    calc = agg.select(
        "grp", "n", cyy.alias("cyy"), ssru.alias("ssru"), ssrq.alias("ssrq")
    )
    sse2 = F.col("cyy") - F.col("ssru") - F.col("ssrq")
    return calc.select(
        "grp",
        "n",
        F.when((F.col("n") <= 3) | (sse2 <= 0), F.lit(None).cast("double"))
        .otherwise(F.round(F.col("ssrq") * (F.col("n") - 3) / sse2, 6))
        .alias("reset_f_r"),
        F.when(F.col("cyy") <= 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("ssrq") / F.col("cyy"), 6))
        .alias("quad_share_r"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# a594 Cox–Stuart exact trend test
# ---------------------------------------------------------------------------


@query(
    "a594_cox_stuart",
    oracle=f"""
WITH {_TDK_SQL},
mom AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n FROM seq GROUP BY grp
),
sm AS (
  SELECT s.grp, s.k, s.y, m.n FROM seq s JOIN mom m ON m.grp = s.grp
),
pr AS (
  SELECT a.grp,
         CASE WHEN b.y > a.y THEN 1 ELSE 0 END AS up,
         CASE WHEN b.y < a.y THEN 1 ELSE 0 END AS dn
  FROM sm a JOIN sm b
    ON b.grp = a.grp AND b.k = a.k + (a.n - a.n // 2)
  WHERE a.k <= a.n // 2
),
cnt AS (
  SELECT grp, CAST(SUM(up) AS BIGINT) AS pos,
         CAST(SUM(dn) AS BIGINT) AS neg,
         CAST(SUM(up) + SUM(dn) AS BIGINT) AS m_eff
  FROM pr GROUP BY grp
),
tails AS (
  SELECT c.grp, c.pos, c.neg, c.m_eff,
         CAST(SUM(CASE WHEN i.i <= LEAST(c.pos, c.neg)
                  THEN CAST(factorial(CAST(c.m_eff AS INTEGER)) AS BIGINT)
                       // (CAST(factorial(CAST(i.i AS INTEGER)) AS BIGINT)
                           * CAST(factorial(CAST(c.m_eff - i.i AS INTEGER)) AS BIGINT))
                  ELSE 0 END) AS BIGINT) AS ptail,
         CAST(SUM(CAST(factorial(CAST(c.m_eff AS INTEGER)) AS BIGINT)
                  // (CAST(factorial(CAST(i.i AS INTEGER)) AS BIGINT)
                      * CAST(factorial(CAST(c.m_eff - i.i AS INTEGER)) AS BIGINT)))
              AS BIGINT) AS tot
  FROM cnt c
  JOIN (SELECT unnest(range(0, 21)) AS i) i ON i.i <= c.m_eff
  GROUP BY c.grp, c.pos, c.neg, c.m_eff
)
SELECT grp, pos, neg, m_eff, ptail, tot,
       LEAST(1.0, 2.0 * CAST(ptail AS DOUBLE) / tot) AS p_two
FROM tails ORDER BY grp
""",
    tags=("inference", "timeseries"),
)
def a594_cox_stuart(spark, sf_dir):
    """Cox–Stuart trend test on each event type's unit-rescaled daily
    counts: pair the first half of the sequence against the second
    (x_k vs x_{k+⌈n/2⌉}, middle dropped when n is odd), count rises
    vs falls, and read the EXACT two-sided binomial sign-test p-value
    — the assumption-free 'is this series trending' check that needs
    no variance estimate at all. Everything is exact integers: ties
    (zero diffs) drop per Cox–Stuart, the tail mass Σ_{{i≤min(pos,
    neg)}} C(m,i) and the total 2^m = ΣC(m,i) are BIGINT sums of
    factorial-ratio binomial coefficients over one static 0..20 index
    panel (factorial(20) < 2⁶³; the fixture's 30-day panel gives
    m ≤ 15, so the guard headroom is a fixture growth to 41 days),
    and p_two is ONE raw IEEE division of two BIGINTs (bit-identical
    cross-engine) capped at 1."""
    seq = _tdk(spark, sf_dir)
    mom = seq.groupBy("grp").agg(F.count("*").cast("bigint").alias("n"))
    sm = seq.join(mom, "grp")
    a = sm.alias("a")
    b = sm.alias("b")
    pr = a.join(
        b,
        (F.col("b.grp") == F.col("a.grp"))
        & (
            F.col("b.k")
            == F.col("a.k")
            + (F.col("a.n") - F.expr("a.n div 2"))
        ),
    ).where(F.col("a.k") <= F.expr("a.n div 2"))
    cnt = pr.select(
        F.col("a.grp").alias("grp"),
        F.when(F.col("b.y") > F.col("a.y"), 1).otherwise(0).alias("up"),
        F.when(F.col("b.y") < F.col("a.y"), 1).otherwise(0).alias("dn"),
    ).groupBy("grp").agg(
        F.sum("up").cast("bigint").alias("pos"),
        F.sum("dn").cast("bigint").alias("neg"),
        (F.sum("up") + F.sum("dn")).cast("bigint").alias("m_eff"),
    )
    idx = spark.range(0, 21).select(F.col("id").alias("i"))
    binom = F.expr(
        "CAST(factorial(m_eff) AS BIGINT)"
        " div (CAST(factorial(i) AS BIGINT)"
        "      * CAST(factorial(m_eff - i) AS BIGINT))"
    )
    tails = (
        cnt.join(F.broadcast(idx), F.col("i") <= F.col("m_eff"))
        .groupBy("grp", "pos", "neg", "m_eff")
        .agg(
            F.sum(
                F.when(
                    F.col("i") <= F.least(F.col("pos"), F.col("neg")), binom
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("ptail"),
            F.sum(binom).cast("bigint").alias("tot"),
        )
    )
    return tails.select(
        "grp",
        "pos",
        "neg",
        "m_eff",
        "ptail",
        "tot",
        F.least(
            F.lit(1.0),
            2.0 * F.col("ptail").cast("double") / F.col("tot"),
        ).alias("p_two"),
    ).orderBy("grp")

# ---------------------------------------------------------------------------
# a595 Lempel–Ziv (LZ76) complexity
# ---------------------------------------------------------------------------


@query(
    "a595_lz76_complexity",
    oracle="""
WITH RECURSIVE daily0 AS (
  SELECT event_type AS grp, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY grp, d
),
d1 AS (
  SELECT grp, d,
         c - lag(c) OVER (PARTITION BY grp ORDER BY d) AS dx
  FROM daily0
),
s AS (
  SELECT grp,
         string_agg(CASE WHEN dx > 0 THEN 'u'
                         WHEN dx < 0 THEN 'd' ELSE 'e' END,
                    '' ORDER BY d) AS str
  FROM d1 WHERE dx IS NOT NULL GROUP BY grp
),
lz AS (
  SELECT grp, str, CAST(length(str) AS BIGINT) AS len,
         CAST(0 AS BIGINT) AS j, CAST(0 AS BIGINT) AS c,
         CAST(1 AS BIGINT) AS p
  FROM s
  UNION ALL
  SELECT grp, str, len, j + 1,
         CASE WHEN instr(substr(str, 1, CAST(j AS INT)),
                         substr(str, CAST(p AS INT),
                                CAST(j + 2 - p AS INT))) = 0
              THEN c + 1 ELSE c END,
         CASE WHEN instr(substr(str, 1, CAST(j AS INT)),
                         substr(str, CAST(p AS INT),
                                CAST(j + 2 - p AS INT))) = 0
              THEN j + 2 ELSE p END
  FROM lz WHERE j < len
)
SELECT grp, len,
       c + CASE WHEN p <= len THEN 1 ELSE 0 END AS lz_c,
       CASE WHEN len <= 1 THEN NULL
            ELSE round((c + CASE WHEN p <= len THEN 1 ELSE 0 END)
                       * ln(CAST(len AS DOUBLE)) / ln(2.0) / len, 6)
       END AS cn_r
FROM lz WHERE j = len
ORDER BY grp
""",
    tags=("monitoring", "signal"),
)
def a595_lz76_complexity(spark, sf_dir):
    """Lempel–Ziv (LZ76) sequence complexity of each event type's
    daily up/down/equal movement string — the number of phrases in
    the exhaustive production history (each phrase the shortest
    substring not seen in the prefix before its last character), the
    classic model-free randomness gauge for a symbol stream, plus the
    C·log₂(len)/len normalization that →1 for incompressible noise.
    The parse is a left fold over character positions carrying
    (phrase-count, phrase-start): Spark runs it as ONE F.aggregate
    lambda over the per-type string, the oracle steps the SAME
    substr/instr expressions through a recursive CTE (the a585
    Viterbi recipe) — pure integer state, so the engines agree
    bit-for-bit; the single ln-ratio normalization is terminal
    round(x, 6). Corpus folds to 5 strings of ≤29 chars after one
    count aggregate — scale-free."""
    ev = table(spark, sf_dir, "events")
    daily0 = ev.groupBy(
        F.col("event_type").alias("grp"),
        F.date_trunc("day", "ts").cast("date").alias("d"),
    ).agg(F.count("*").cast("bigint").alias("c"))
    w = Window.partitionBy("grp").orderBy("d")
    d1 = daily0.withColumn("dx", F.col("c") - F.lag("c").over(w))
    s = (
        d1.where(F.col("dx").isNotNull())
        .withColumn(
            "ch",
            F.when(F.col("dx") > 0, F.lit("u"))
            .when(F.col("dx") < 0, F.lit("d"))
            .otherwise(F.lit("e")),
        )
        .groupBy("grp")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(d, ch))), x -> x.ch), '')"
            ).alias("str")
        )
    )
    fold = (
        "aggregate(sequence(1, CAST(length(str) AS INT)),"
        " named_struct('c', CAST(0 AS BIGINT), 'p', CAST(1 AS BIGINT)),"
        " (acc, j) -> IF(instr(substr(str, 1, j - 1),"
        "                      substr(str, CAST(acc.p AS INT),"
        "                             j + 1 - CAST(acc.p AS INT))) = 0,"
        "   named_struct('c', acc.c + CAST(1 AS BIGINT),"
        "                'p', CAST(j AS BIGINT) + CAST(1 AS BIGINT)),"
        "   acc),"
        " acc -> acc.c + IF(acc.p <= CAST(length(str) AS BIGINT),"
        "                   CAST(1 AS BIGINT), CAST(0 AS BIGINT)))"
    )
    return (
        s.select(
            "grp",
            F.length("str").cast("bigint").alias("len"),
            F.expr(fold).alias("lz_c"),
        )
        .select(
            "grp",
            "len",
            "lz_c",
            F.when(F.col("len") <= 1, F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    F.col("lz_c")
                    * F.log(F.col("len").cast("double"))
                    / F.log(F.lit(2.0))
                    / F.col("len"),
                    6,
                )
            )
            .alias("cn_r"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# a596 two-sample energy distance
# ---------------------------------------------------------------------------


@query(
    "a596_energy_distance",
    oracle="""
WITH dall AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY d
),
wd AS (SELECT c FROM dall WHERE isodow(d) NOT IN (6, 7)),
we AS (SELECT c FROM dall WHERE isodow(d) IN (6, 7)),
sz AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM wd) AS m,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM we) AS n
),
ab AS (
  SELECT (SELECT CAST(COALESCE(SUM(ABS(x.c - y.c)), 0) AS BIGINT)
          FROM wd x CROSS JOIN we y) AS axy,
         (SELECT CAST(COALESCE(SUM(ABS(x.c - y.c)), 0) AS BIGINT)
          FROM wd x CROSS JOIN wd y) AS bxx,
         (SELECT CAST(COALESCE(SUM(ABS(x.c - y.c)), 0) AS BIGINT)
          FROM we x CROSS JOIN we y) AS cyy
)
SELECT m, n, axy, bxx, cyy,
       CASE WHEN m = 0 OR n = 0 THEN NULL
            ELSE 2.0 * axy / (m * n)
                 - CAST(bxx AS DOUBLE) / (m * m)
                 - CAST(cyy AS DOUBLE) / (n * n) END AS e_dist,
       CASE WHEN m = 0 OR n = 0 THEN NULL
            ELSE round((CAST(m AS DOUBLE) * n / (m + n))
                       * (2.0 * axy / (m * n)
                          - CAST(bxx AS DOUBLE) / (m * m)
                          - CAST(cyy AS DOUBLE) / (n * n)), 6)
       END AS t_stat_r
FROM sz CROSS JOIN ab
""",
    tags=("inference", "distribution"),
)
def a596_energy_distance(spark, sf_dir):
    """Székely–Rizzo two-sample energy distance between the weekday
    and weekend distributions of total daily event volume:
    D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'|, the metric two-sample
    discrepancy that is zero iff the distributions match — a sharper
    'did the weekly mix shift' readout than any single quantile, plus
    the m·n/(m+n)-scaled test statistic. The corpus folds to ≤31
    daily totals in one count aggregate; the three pairwise
    |x−y| sums then run over ≤22×22 BROADCAST cross joins of the tiny
    panel — exact BIGINTs (the weekend split is weekday()/isodow()
    agreeing on Mon..Sun). e_dist is three raw IEEE divisions of
    exact integers through identical expression text (bit-identical
    cross-engine); only t_stat rounds. Scale-free after the first
    aggregate at any corpus size."""
    ev = table(spark, sf_dir, "events")
    dall = (
        ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(F.count("*").cast("bigint").alias("c"))
        # ≤31-row panel feeding five downstream references (two size
        # aggregates + three pair-sum cross joins): checkpoint once.
        .localCheckpoint(eager=False)
    )
    wk = F.expr("weekday(d)")
    wd = dall.where(~wk.isin(5, 6)).select("c")
    we = dall.where(wk.isin(5, 6)).select("c")
    m_n = wd.agg(F.count("*").cast("bigint").alias("m")).crossJoin(
        we.agg(F.count("*").cast("bigint").alias("n"))
    )

    def _pair_sum(left, right, alias):
        return (
            left.select(F.col("c").alias("xc"))
            .crossJoin(F.broadcast(right.select(F.col("c").alias("yc"))))
            .agg(
                F.coalesce(
                    F.sum(F.abs(F.col("xc") - F.col("yc"))), F.lit(0)
                )
                .cast("bigint")
                .alias(alias)
            )
        )

    ab = (
        _pair_sum(wd, we, "axy")
        .crossJoin(_pair_sum(wd, wd, "bxx"))
        .crossJoin(_pair_sum(we, we, "cyy"))
    )
    j = m_n.crossJoin(ab)
    m, n = F.col("m"), F.col("n")
    e_dist = (
        2.0 * F.col("axy") / (m * n)
        - F.col("bxx").cast("double") / (m * m)
        - F.col("cyy").cast("double") / (n * n)
    )
    bad = (m == 0) | (n == 0)
    return j.select(
        "m",
        "n",
        "axy",
        "bxx",
        "cyy",
        F.when(bad, F.lit(None).cast("double")).otherwise(e_dist).alias(
            "e_dist"
        ),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round((m.cast("double") * n / (m + n)) * e_dist, 6))
        .alias("t_stat_r"),
    )


# ---------------------------------------------------------------------------
# a597 empirical-copula tail dependence
# ---------------------------------------------------------------------------


@query(
    "a597_tail_dependence",
    oracle=f"""
WITH daily AS ({_DAILYV_SQL}),
r AS (
  SELECT CAST(row_number() OVER (ORDER BY v, d) AS BIGINT) AS rv,
         CAST(row_number() OVER (ORDER BY y, d) AS BIGINT) AS ry,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM daily
),
t AS (
  SELECT rv, ry, n,
         (n * 9) // 10 AS k90, (n * 19) // 20 AS k95
  FROM r
)
SELECT CAST(MIN(n) AS BIGINT) AS n,
       CAST(MIN(k90) AS BIGINT) AS k90, CAST(MIN(k95) AS BIGINT) AS k95,
       CAST(SUM(CASE WHEN rv > k90 AND ry > k90 THEN 1 ELSE 0 END)
            AS BIGINT) AS cu90,
       CAST(SUM(CASE WHEN rv <= n - k90 AND ry <= n - k90
                THEN 1 ELSE 0 END) AS BIGINT) AS cl90,
       CAST(SUM(CASE WHEN rv > k95 AND ry > k95 THEN 1 ELSE 0 END)
            AS BIGINT) AS cu95,
       CAST(SUM(CASE WHEN rv <= n - k95 AND ry <= n - k95
                THEN 1 ELSE 0 END) AS BIGINT) AS cl95,
       CASE WHEN MIN(n) - MIN(k90) = 0 THEN NULL
            ELSE CAST(SUM(CASE WHEN rv > k90 AND ry > k90
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / (MIN(n) - MIN(k90)) END AS lam_u90,
       CASE WHEN MIN(n) - MIN(k90) = 0 THEN NULL
            ELSE CAST(SUM(CASE WHEN rv <= n - k90 AND ry <= n - k90
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / (MIN(n) - MIN(k90)) END AS lam_l90,
       CASE WHEN MIN(n) - MIN(k95) = 0 THEN NULL
            ELSE CAST(SUM(CASE WHEN rv > k95 AND ry > k95
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / (MIN(n) - MIN(k95)) END AS lam_u95,
       CASE WHEN MIN(n) - MIN(k95) = 0 THEN NULL
            ELSE CAST(SUM(CASE WHEN rv <= n - k95 AND ry <= n - k95
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / (MIN(n) - MIN(k95)) END AS lam_l95
FROM t
""",
    tags=("inference", "dependence"),
)
def a597_tail_dependence(spark, sf_dir):
    """Empirical-copula tail-dependence coefficients between daily
    order volume and daily revenue over the full orders calendar:
    λ_U(q) = P(rank_v > k, rank_y > k)/(n−k) at q ∈ {{0.90, 0.95}}
    (and the mirrored λ_L) — do the two series crash/spike TOGETHER,
    the co-movement property a plain correlation (or even Kendall's
    τ, a468-family) cannot see because it averages over the whole
    distribution. Deterministic integer machinery only: ranks are
    row_number with the date as tie-break (both engines sort the same
    total order), thresholds are the exact integer k = (n·q-num)//
    q-den, the four tail counts are exact BIGINTs, and each λ is one
    raw IEEE division (bit-identical cross-engine). Two window sorts
    of a ≤2.4k-row panel — corpus-size-free after the daily
    aggregate."""
    daily = _dailyv(spark, sf_dir)
    wv = Window.orderBy("v", "d")
    wy = Window.orderBy("y", "d")
    r = daily.select(
        F.row_number().over(wv).cast("bigint").alias("rv"),
        F.row_number().over(wy).cast("bigint").alias("ry"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    t = r.select(
        "rv",
        "ry",
        "n",
        F.expr("(n * 9) div 10").alias("k90"),
        F.expr("(n * 19) div 20").alias("k95"),
    )

    def _cnt(cond, alias):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(alias)

    agg = t.agg(
        F.min("n").cast("bigint").alias("n"),
        F.min("k90").cast("bigint").alias("k90"),
        F.min("k95").cast("bigint").alias("k95"),
        _cnt((F.col("rv") > F.col("k90")) & (F.col("ry") > F.col("k90")), "cu90"),
        _cnt(
            (F.col("rv") <= F.col("n") - F.col("k90"))
            & (F.col("ry") <= F.col("n") - F.col("k90")),
            "cl90",
        ),
        _cnt((F.col("rv") > F.col("k95")) & (F.col("ry") > F.col("k95")), "cu95"),
        _cnt(
            (F.col("rv") <= F.col("n") - F.col("k95"))
            & (F.col("ry") <= F.col("n") - F.col("k95")),
            "cl95",
        ),
    )

    def _lam(cnt, k, alias):
        return (
            F.when(F.col("n") - F.col(k) == 0, F.lit(None).cast("double"))
            .otherwise(
                F.col(cnt).cast("double") / (F.col("n") - F.col(k))
            )
            .alias(alias)
        )

    return agg.select(
        "n",
        "k90",
        "k95",
        "cu90",
        "cl90",
        "cu95",
        "cl95",
        _lam("cu90", "k90", "lam_u90"),
        _lam("cl90", "k90", "lam_l90"),
        _lam("cu95", "k95", "lam_u95"),
        _lam("cl95", "k95", "lam_l95"),
    )


# ---------------------------------------------------------------------------
# a598 phonetic blocking-efficiency audit
# ---------------------------------------------------------------------------


def _soundex_sql(tok: str, g: str) -> str:
    """Simplified American Soundex as engine-portable SQL text: map
    letters to the classic digit classes via ``translate``, collapse
    adjacent duplicate codes with one regexp per digit class (RE2 has
    no backreferences, so the chain is 7 literal patterns — this also
    means the h/w elision rule of full Soundex is deliberately NOT
    applied; the variant is documented in a598's docstring), drop the
    first collapsed symbol (the first letter keeps its LETTER, not
    its digit), strip vowel zeros, pad to 4. ``g`` is ``", 'g'"`` for
    DuckDB (whose regexp_replace is first-match by default) and ``""``
    for Spark (always global) — same semantics either way."""
    m = (
        f"translate(lower({tok}), 'abcdefghijklmnopqrstuvwxyz',"
        f" '01230120022455012623010202')"
    )
    for dgt in "0123456":
        m = f"regexp_replace({m}, '{dgt}{dgt}+', '{dgt}'{g})"
    return (
        f"rpad(upper(substr(lower({tok}), 1, 1)) ||"
        f" replace(substr({m}, 2), '0', ''), 4, '0')"
    )


@query(
    "a598_soundex_blocking",
    oracle=f"""
WITH p AS (
  SELECT {_soundex_sql("split_part(p_name, ' ', 2)", ", 'g'")} AS blk
  FROM part
),
b AS (
  SELECT blk, CAST(COUNT(*) AS BIGINT) AS n_parts FROM p GROUP BY blk
),
tot AS (
  SELECT CAST(SUM(n_parts) AS BIGINT) AS n_total,
         CAST(SUM(n_parts * (n_parts - 1) // 2) AS BIGINT)
           AS blocked_pairs,
         CAST(COUNT(*) AS BIGINT) AS n_blocks
  FROM b
)
SELECT blk, n_parts,
       CAST(n_parts * (n_parts - 1) // 2 AS BIGINT) AS n_pairs,
       n_total, n_blocks, blocked_pairs,
       CASE WHEN n_total <= 1 THEN NULL
            ELSE CAST(blocked_pairs AS DOUBLE)
                 / (n_total * (n_total - 1) // 2) END AS pair_ratio
FROM b CROSS JOIN tot
ORDER BY n_parts DESC, blk
LIMIT 20
""",
    tags=("curation", "dedup"),
)
def a598_soundex_blocking(spark, sf_dir):
    """Phonetic blocking-efficiency audit for entity resolution: block
    the part vocabulary by the simplified Soundex code of the noun
    token of p_name (classic digit classes, adjacent-duplicate
    collapse, vowel-zero strip — WITHOUT full Soundex's h/w elision
    rule, which needs backreferences RE2 lacks; the simplification is
    shared by both engines so codes agree exactly), then report the
    top-20 blocks with their within-block candidate-pair counts and
    the global pair-reduction ratio Σ C(nᵢ,2) / C(N,2) — the number
    that decides whether a fuzzy-match join is feasible at 100 TB
    (blocking IS the scale strategy: candidate generation must be an
    equi-join on a cheap deterministic key, never an all-pairs scan;
    cf. q145's prefix filter and q34's shingle posting lists). All
    counts exact BIGINT; the ratio is one raw IEEE division."""
    p = table(spark, sf_dir, "part").select(
        F.expr(
            _soundex_sql("split_part(p_name, ' ', 2)", "")
        ).alias("blk")
    )
    b = (
        p.groupBy("blk")
        .agg(F.count("*").cast("bigint").alias("n_parts"))
        # ≤26-row block histogram referenced by totals + final join
        .localCheckpoint(eager=False)
    )
    tot = b.agg(
        F.sum("n_parts").cast("bigint").alias("n_total"),
        F.sum(
            F.expr("n_parts * (n_parts - 1) div 2")
        )
        .cast("bigint")
        .alias("blocked_pairs"),
        F.count("*").cast("bigint").alias("n_blocks"),
    )
    j = b.crossJoin(F.broadcast(tot))
    return (
        j.select(
            "blk",
            "n_parts",
            F.expr("CAST(n_parts * (n_parts - 1) div 2 AS BIGINT)").alias(
                "n_pairs"
            ),
            "n_total",
            "n_blocks",
            "blocked_pairs",
            F.when(F.col("n_total") <= 1, F.lit(None).cast("double"))
            .otherwise(
                F.col("blocked_pairs").cast("double")
                / F.expr("n_total * (n_total - 1) div 2")
            )
            .alias("pair_ratio"),
        )
        .orderBy(F.col("n_parts").desc(), "blk")
        .limit(20)
    )
