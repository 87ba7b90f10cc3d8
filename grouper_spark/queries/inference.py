"""Round-7 statistical-inference battery (a004–a028).

Classical tests and estimators the monitoring/analytics batteries did
not yet cover: ordinal effect sizes and association (Cliff's delta,
Somers' D, Jonckheere–Terpstra), variance and location tests (Bartlett,
Mood's median), exact and likelihood-ratio contingency tests (Fisher,
G-test), regression diagnostics (Durbin–Watson, Breusch–Pagan, Chow,
VIF), time-series structure (PACF, Goertzel periodogram, permutation
entropy), reliability and calibration (Cronbach's alpha, ECE +
Hosmer–Lemeshow), survival (Nelson–Aalen + RMST), robust two-sample
inference (Yuen, Hodges–Lehmann), clustering agreement and validity
(adjusted Rand, Davies–Bouldin + Calinski–Harabasz), graph structure
(HITS, rich-club), lexical richness (Yule's K), and meta-analysis
(DerSimonian–Laird).

Shared design rules (the monitoring.py discipline): ONE map-side-
combined aggregate folds the corpus to a keyed summary; every cross-row
sum is an exact BIGINT (fixed-point where the source is a double);
transcendentals run once per group/cell on identical exact inputs and
feed a terminal ``round(x, 6)``; pair statistics come from value
histograms + cumulative windows, never pairwise self-joins of the
corpus. Reference parity target: junegunn/grouper exposes no
statistics surface (src/grouper/core.clj is a micro-batching utility);
these extend the engine's analytics coverage for pipeline monitoring.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..sources import table
from . import query


@query(
    "a004_cliffs_delta",
    oracle="""
WITH obs AS (
  SELECT user_id,
         CASE WHEN event_type = 'purchase' THEN 'treat' ELSE 'ctrl' END
           AS arm,
         CAST(SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS xc
  FROM events WHERE event_type IN ('purchase', 'view')
  GROUP BY user_id, arm
), vals AS (
  SELECT xc,
         CAST(COALESCE(SUM(CASE WHEN arm = 'treat' THEN 1 END), 0)
              AS BIGINT) AS c1,
         CAST(COALESCE(SUM(CASE WHEN arm = 'ctrl' THEN 1 END), 0)
              AS BIGINT) AS c2
  FROM obs GROUP BY xc
), cum AS (
  SELECT xc, c1, c2,
         CAST(COALESCE(SUM(c1) OVER (ORDER BY xc
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS c1b,
         CAST(COALESCE(SUM(c2) OVER (ORDER BY xc
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS c2b
  FROM vals
), agg AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
         CAST(SUM(c1 * c2b) AS BIGINT) AS gt_pairs,
         CAST(SUM(c2 * c1b) AS BIGINT) AS lt_pairs,
         CAST(SUM(c1 * c2) AS BIGINT) AS tie_pairs
  FROM cum
)
SELECT n1, n2, gt_pairs, lt_pairs, tie_pairs,
       round((CAST(gt_pairs AS DOUBLE) - lt_pairs)
             / (CAST(n1 AS DOUBLE) * n2), 6) AS cliffs_delta_r,
       round((2.0 * gt_pairs + tie_pairs)
             / (2.0 * CAST(n1 AS DOUBLE) * n2), 6) AS vda_r,
       CASE
         WHEN abs((CAST(gt_pairs AS DOUBLE) - lt_pairs)
                  / (CAST(n1 AS DOUBLE) * n2)) < 0.147 THEN 'negligible'
         WHEN abs((CAST(gt_pairs AS DOUBLE) - lt_pairs)
                  / (CAST(n1 AS DOUBLE) * n2)) < 0.33 THEN 'small'
         WHEN abs((CAST(gt_pairs AS DOUBLE) - lt_pairs)
                  / (CAST(n1 AS DOUBLE) * n2)) < 0.474 THEN 'medium'
         ELSE 'large'
       END AS magnitude
FROM agg
""",
    tags=("inference", "stats"),
)
def a004_cliffs_delta(spark, sf_dir):
    """Cliff's delta + Vargha–Delaney Â between per-user purchase and
    view spend — the ORDINAL effect size that a113's Cohen's d family
    cannot give: it depends only on how often one sample exceeds the
    other, so it survives heavy tails and monotone transforms. The
    O(n²) pair counts collapse to a value-histogram + two cumulative
    windows (gt = Σ c₁(v)·cum₂(<v)), so nothing pairwise ever
    materializes: the corpus folds to one (user, arm) fixed-point
    aggregate, the histogram is bounded by the value domain, and every
    pair count is an exact BIGINT — δ and Â are each ONE division, and
    the magnitude label branches on the identical exact ratio in both
    engines. At 100 TB the only corpus touch is the first aggregate."""
    ev = table(spark, sf_dir, "events")
    obs = (
        ev.filter(F.col("event_type").isin("purchase", "view"))
        .groupBy(
            "user_id",
            F.when(F.col("event_type") == "purchase", "treat")
            .otherwise("ctrl")
            .alias("arm"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint"))
            .cast("bigint")
            .alias("xc")
        )
    )
    vals = obs.groupBy("xc").agg(
        F.coalesce(
            F.sum(F.when(F.col("arm") == "treat", 1)), F.lit(0)
        )
        .cast("bigint")
        .alias("c1"),
        F.coalesce(
            F.sum(F.when(F.col("arm") == "ctrl", 1)), F.lit(0)
        )
        .cast("bigint")
        .alias("c2"),
    )
    w = (
        Window.orderBy("xc")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = vals.select(
        "c1",
        "c2",
        F.coalesce(F.sum("c1").over(w), F.lit(0))
        .cast("bigint")
        .alias("c1b"),
        F.coalesce(F.sum("c2").over(w), F.lit(0))
        .cast("bigint")
        .alias("c2b"),
    )
    agg = cum.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(F.col("c1") * F.col("c2b")).cast("bigint").alias("gt_pairs"),
        F.sum(F.col("c2") * F.col("c1b")).cast("bigint").alias("lt_pairs"),
        F.sum(F.col("c1") * F.col("c2")).cast("bigint").alias("tie_pairs"),
    )
    delta = (F.col("gt_pairs").cast("double") - F.col("lt_pairs")) / (
        F.col("n1").cast("double") * F.col("n2")
    )
    return agg.select(
        "n1",
        "n2",
        "gt_pairs",
        "lt_pairs",
        "tie_pairs",
        F.round(delta, 6).alias("cliffs_delta_r"),
        F.round(
            (2.0 * F.col("gt_pairs") + F.col("tie_pairs"))
            / (2.0 * F.col("n1").cast("double") * F.col("n2")),
            6,
        ).alias("vda_r"),
        F.when(F.abs(delta) < 0.147, "negligible")
        .when(F.abs(delta) < 0.33, "small")
        .when(F.abs(delta) < 0.474, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


@query(
    "a005_somers_gamma",
    oracle="""
WITH lc AS (
  SELECT l_orderkey, LEAST(CAST(COUNT(*) AS BIGINT), 3) AS yb
  FROM lineitem GROUP BY l_orderkey
), cells AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS x, yb AS y,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders JOIN lc ON l_orderkey = o_orderkey
  GROUP BY x, y
), conc AS (
  SELECT
    CAST(2 * SUM(CASE WHEN b.x > a.x AND b.y > a.y
                      THEN a.n * b.n ELSE 0 END) AS BIGINT) AS c2,
    CAST(2 * SUM(CASE WHEN b.x > a.x AND b.y < a.y
                      THEN a.n * b.n ELSE 0 END) AS BIGINT) AS d2
  FROM cells a CROSS JOIN cells b
), tx AS (
  SELECT CAST(SUM(nx * (nx - 1)) AS BIGINT) AS rowp2
  FROM (SELECT SUM(n) AS nx FROM cells GROUP BY x)
), ty AS (
  SELECT CAST(SUM(ny * (ny - 1)) AS BIGINT) AS colp2
  FROM (SELECT SUM(n) AS ny FROM cells GROUP BY y)
), tc AS (
  SELECT CAST(SUM(n * (n - 1)) AS BIGINT) AS cellp2 FROM cells
)
SELECT c2, d2,
       CAST(rowp2 - cellp2 AS BIGINT) AS tx2,
       CAST(colp2 - cellp2 AS BIGINT) AS ty2,
       round((CAST(c2 AS DOUBLE) - d2) / (CAST(c2 AS DOUBLE) + d2), 6)
         AS gamma_r,
       round((CAST(c2 AS DOUBLE) - d2)
             / (CAST(c2 AS DOUBLE) + d2 + (colp2 - cellp2)), 6)
         AS somers_dyx_r,
       round((CAST(c2 AS DOUBLE) - d2)
             / (CAST(c2 AS DOUBLE) + d2 + (rowp2 - cellp2)), 6)
         AS somers_dxy_r
FROM conc CROSS JOIN tx CROSS JOIN ty CROSS JOIN tc
""",
    tags=("inference", "stats"),
)
def a005_somers_gamma(spark, sf_dir):
    """Goodman–Kruskal gamma + both Somers' D asymmetries between order
    priority (ordinal 1..5) and line-count bucket (1/2/3+) — the
    contingency-side concordance family next to a118's Kendall τ-b:
    gamma ignores all ties, D_yx penalizes only Y-ties, so together they
    localize WHERE association lives. All pair counts are exact DOUBLED
    BIGINTs straight from the ≤15-cell contingency table (C from a
    15×15 cell cross join — never the corpus; tie pairs from row/column
    marginals via n(n−1) identities), so each statistic is one double
    division. The corpus is touched by one per-order count and one
    (x, y) cell aggregate; at 100 TB the concordance algebra runs on a
    constant-size table. Pair counts stay under BIGINT range to n≈2·10⁹
    rows (n² < 9.2·10¹⁸)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    lc = li.groupBy("l_orderkey").agg(
        F.least(F.count("*").cast("bigint"), F.lit(3)).alias("yb")
    )
    cells = (
        o.join(lc, o.o_orderkey == lc.l_orderkey)
        .groupBy(
            F.substring("o_orderpriority", 1, 1).cast("int").alias("x"),
            F.col("yb").alias("y"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    a = cells.alias("a")
    b = cells.alias("b")
    conc = a.crossJoin(b).agg(
        (
            2
            * F.sum(
                F.when(
                    (F.col("b.x") > F.col("a.x"))
                    & (F.col("b.y") > F.col("a.y")),
                    F.col("a.n") * F.col("b.n"),
                ).otherwise(F.lit(0))
            )
        )
        .cast("bigint")
        .alias("c2"),
        (
            2
            * F.sum(
                F.when(
                    (F.col("b.x") > F.col("a.x"))
                    & (F.col("b.y") < F.col("a.y")),
                    F.col("a.n") * F.col("b.n"),
                ).otherwise(F.lit(0))
            )
        )
        .cast("bigint")
        .alias("d2"),
    )
    rowp = (
        cells.groupBy("x")
        .agg(F.sum("n").alias("nx"))
        .agg(
            F.sum(F.col("nx") * (F.col("nx") - 1))
            .cast("bigint")
            .alias("rowp2")
        )
    )
    colp = (
        cells.groupBy("y")
        .agg(F.sum("n").alias("ny"))
        .agg(
            F.sum(F.col("ny") * (F.col("ny") - 1))
            .cast("bigint")
            .alias("colp2")
        )
    )
    cellp = cells.agg(
        F.sum(F.col("n") * (F.col("n") - 1)).cast("bigint").alias("cellp2")
    )
    j = conc.crossJoin(rowp).crossJoin(colp).crossJoin(cellp)
    num = F.col("c2").cast("double") - F.col("d2")
    return j.select(
        "c2",
        "d2",
        (F.col("rowp2") - F.col("cellp2")).cast("bigint").alias("tx2"),
        (F.col("colp2") - F.col("cellp2")).cast("bigint").alias("ty2"),
        F.round(num / (F.col("c2").cast("double") + F.col("d2")), 6).alias(
            "gamma_r"
        ),
        F.round(
            num
            / (
                F.col("c2").cast("double")
                + F.col("d2")
                + (F.col("colp2") - F.col("cellp2"))
            ),
            6,
        ).alias("somers_dyx_r"),
        F.round(
            num
            / (
                F.col("c2").cast("double")
                + F.col("d2")
                + (F.col("rowp2") - F.col("cellp2"))
            ),
            6,
        ).alias("somers_dxy_r"),
    )


@query(
    "a006_jonckheere_terpstra",
    oracle="""
WITH base AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
         CAST(floor(o_totalprice) AS BIGINT) AS v
  FROM orders
), hist AS (
  SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY g, v
), grid AS (
  SELECT gg.g, vv.v, CAST(COALESCE(h.c, 0) AS BIGINT) AS c0
  FROM (SELECT DISTINCT g FROM hist) gg
  CROSS JOIN (SELECT DISTINCT v FROM hist) vv
  LEFT JOIN hist h ON h.g = gg.g AND h.v = vv.v
), cum AS (
  SELECT g, v, c0,
         CAST(COALESCE(SUM(c0) OVER (PARTITION BY g ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cb
  FROM grid
), jt AS (
  SELECT CAST(SUM(2 * h.c * u.cb + h.c * u.c0) AS BIGINT) AS jt2
  FROM hist h JOIN cum u ON u.v = h.v AND u.g < h.g
), szs AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS nn,
         CAST(SUM(n_g * n_g) AS BIGINT) AS sn2,
         CAST(SUM(n_g * n_g * (2 * n_g + 3)) AS BIGINT) AS sn23
  FROM (SELECT g, CAST(SUM(c) AS BIGINT) AS n_g FROM hist GROUP BY g)
)
SELECT nn, jt2,
       round((CAST(jt2 AS DOUBLE) / 2.0
              - (CAST(nn AS DOUBLE) * nn - sn2) / 4.0)
             / sqrt((CAST(nn AS DOUBLE) * nn * (2.0 * nn + 3.0) - sn23)
                    / 72.0), 6) AS z_r
FROM jt CROSS JOIN szs
""",
    tags=("inference", "stats"),
)
def a006_jonckheere_terpstra(spark, sf_dir):
    """Jonckheere–Terpstra ordered-alternatives test: does order value
    trend monotonically with priority level? More powerful than a106's
    Kruskal–Wallis when the alternative is ORDERED, which is exactly
    the monitoring question (does urgency buy value?). The Σ pairwise
    Mann–Whitney U over ordered group pairs collapses to a
    (group, value) histogram + per-group cumulative window: each hist
    row of group g₂ picks up 2·c·cum(<v) + c·c_at(v) from every lower
    group at the same value row — doubled-JT stays an exact BIGINT with
    the standard half-tie convention and no pairwise join. The normal
    z uses the no-tie JT variance (N²(2N+3) − Σn²(2n+3))/72 from exact
    group sizes, evaluated once. Values quantized to whole currency
    units so the histogram is bounded by the price domain, not the row
    count — the 100 TB grid is (price range × 5), corpus touched once."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("g"),
        F.floor("o_totalprice").cast("bigint").alias("v"),
    )
    hist = (
        base.groupBy("g", "v")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    grid = (
        hist.select("g")
        .distinct()
        .crossJoin(hist.select("v").distinct())
        .join(hist, ["g", "v"], "left")
        .select(
            "g", "v", F.coalesce(F.col("c"), F.lit(0)).alias("c0")
        )
    )
    wc = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grid.select(
        F.col("g").alias("ug"),
        F.col("v").alias("uv"),
        F.col("c0"),
        F.coalesce(F.sum("c0").over(wc), F.lit(0))
        .cast("bigint")
        .alias("cb"),
    )
    jt = (
        hist.join(
            cum,
            (cum.uv == hist.v) & (cum.ug < hist.g),
        )
        .agg(
            F.sum(
                2 * F.col("c") * F.col("cb") + F.col("c") * F.col("c0")
            )
            .cast("bigint")
            .alias("jt2")
        )
    )
    szs = (
        hist.groupBy("g")
        .agg(F.sum("c").cast("bigint").alias("n_g"))
        .agg(
            F.sum("n_g").cast("bigint").alias("nn"),
            F.sum(F.col("n_g") * F.col("n_g")).cast("bigint").alias("sn2"),
            F.sum(
                F.col("n_g") * F.col("n_g") * (2 * F.col("n_g") + 3)
            )
            .cast("bigint")
            .alias("sn23"),
        )
    )
    j = jt.crossJoin(szs)
    return j.select(
        "nn",
        "jt2",
        F.round(
            (
                F.col("jt2").cast("double") / 2.0
                - (
                    F.col("nn").cast("double") * F.col("nn")
                    - F.col("sn2")
                )
                / 4.0
            )
            / F.sqrt(
                (
                    F.col("nn").cast("double")
                    * F.col("nn")
                    * (2.0 * F.col("nn") + 3.0)
                    - F.col("sn23")
                )
                / 72.0
            ),
            6,
        ).alias("z_r"),
    )


@query(
    "a007_bartlett_test",
    oracle="""
WITH daily AS (
  SELECT event_type AS grp, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)) AS BIGINT) AS sc
  FROM events GROUP BY grp, d
), g AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(sc) AS BIGINT) AS s1,
         CAST(SUM(sc * sc) AS BIGINT) AS s2
  FROM daily GROUP BY grp
), pg AS (
  SELECT grp, n,
         CAST(ROUND((CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1), 0)
              AS BIGINT) AS s2c
  FROM g
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n_all,
         CAST(SUM((n - 1) * s2c) AS BIGINT) AS sw,
         CAST(SUM((n - 1) * ln(CAST(s2c AS DOUBLE))) AS DOUBLE) AS slog,
         CAST(SUM(1.0 / (n - 1)) AS DOUBLE) AS sinv
  FROM pg
)
SELECT k AS n_groups, n_all,
       round(((n_all - k) * ln(CAST(sw AS DOUBLE) / (n_all - k)) - slog)
             / (1.0 + (sinv - 1.0 / (n_all - k)) / (3.0 * (k - 1))),
             6) AS bartlett_chi2_r
FROM tot
""",
    tags=("inference", "stats"),
)
def a007_bartlett_test(spark, sf_dir):
    """Bartlett's test for variance homogeneity across event types'
    daily spend — the PARAMETRIC sharp-tooth complement to a351's
    robust Brown–Forsythe: maximal power under normality, the classic
    pre-flight for pooled-variance methods. The corpus folds once to
    per-(type, day) fixed-point sums; each group's sample variance is
    rounded to an exact BIGINT (cents²) so the only doubles crossing
    rows are the k=5 per-group (n−1)·ln(s²) terms — ln runs once per
    group on identical exact integers, and the 5-term sums feed one
    closed-form statistic with Bartlett's small-sample correction,
    rounded at 6dp (the a443 transcendental rule). At 100 TB only the
    first aggregate sees data; the test runs on 5 summary rows."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("grp"),
        F.date_trunc("day", "ts").cast("date").alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint"))
        .cast("bigint")
        .alias("sc")
    )
    g = daily.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("sc").cast("bigint").alias("s1"),
        F.sum(F.col("sc") * F.col("sc")).cast("bigint").alias("s2"),
    )
    pg = g.select(
        "grp",
        "n",
        F.round(
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1") / F.col("n")
            )
            / (F.col("n") - 1),
            0,
        )
        .cast("bigint")
        .alias("s2c"),
    )
    tot = pg.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n_all"),
        F.sum((F.col("n") - 1) * F.col("s2c")).cast("bigint").alias("sw"),
        F.sum((F.col("n") - 1) * F.log(F.col("s2c").cast("double")))
        .cast("double")
        .alias("slog"),
        F.sum(1.0 / (F.col("n") - 1)).cast("double").alias("sinv"),
    )
    return tot.select(
        F.col("k").alias("n_groups"),
        "n_all",
        F.round(
            (
                (F.col("n_all") - F.col("k"))
                * F.log(
                    F.col("sw").cast("double")
                    / (F.col("n_all") - F.col("k"))
                )
                - F.col("slog")
            )
            / (
                1.0
                + (
                    F.col("sinv")
                    - 1.0 / (F.col("n_all") - F.col("k"))
                )
                / (3.0 * (F.col("k") - 1))
            ),
            6,
        ).alias("bartlett_chi2_r"),
    )


@query(
    "a008_moods_median",
    oracle="""
WITH base AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) AS xc
  FROM orders
), med AS (
  SELECT CAST(ROUND(2.0 * quantile_cont(xc, 0.5), 0) AS BIGINT) AS m2
  FROM base
), cls AS (
  SELECT grp,
         CAST(COALESCE(SUM(CASE WHEN 2 * xc > m2 THEN 1 END), 0)
              AS BIGINT) AS na,
         CAST(COALESCE(SUM(CASE WHEN 2 * xc < m2 THEN 1 END), 0)
              AS BIGINT) AS nb
  FROM base CROSS JOIN med GROUP BY grp
), tot AS (
  SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb,
         CAST(SUM(na + nb) AS BIGINT) AS nn
  FROM cls
), chi AS (
  SELECT CAST(SUM(CAST(ROUND(
           (na - (na + nb) * (CAST(ta AS DOUBLE) / nn))
           * (na - (na + nb) * (CAST(ta AS DOUBLE) / nn))
           / ((na + nb) * (CAST(ta AS DOUBLE) / nn)) * 1e9, 0) AS BIGINT)
         + CAST(ROUND(
           (nb - (na + nb) * (CAST(tb AS DOUBLE) / nn))
           * (nb - (na + nb) * (CAST(tb AS DOUBLE) / nn))
           / ((na + nb) * (CAST(tb AS DOUBLE) / nn)) * 1e9, 0) AS BIGINT))
         AS BIGINT) AS chi_nano
  FROM cls CROSS JOIN tot
)
SELECT c.grp, c.na AS n_above, c.nb AS n_below,
       round(CAST(ch.chi_nano AS DOUBLE) / 1e9, 6) AS chi2_r
FROM cls c CROSS JOIN chi ch
ORDER BY c.grp
""",
    tags=("inference", "stats"),
)
def a008_moods_median(spark, sf_dir):
    """Mood's median test across order priorities — the coarsest, most
    assumption-free k-group location test (a 2×k chi-square on
    above/below the GRAND median), the right tool when outliers are so
    wild that even rank tests mislead. The doubled-median trick (a351)
    keeps the grand median an exact BIGINT (2m is integral for integer
    cents), so above/below classification is integer comparison with
    ties-at-median dropped per convention. Each group's two (O−E)²/E
    terms are nano-fixed BIGINTs before the cross-group sum
    (order-independent), and the chi-square emerges from one division.
    Two corpus passes (grand median, then classification) — the
    unavoidable price of exact-median centering, both map-side-combined
    at 100 TB."""
    o = table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100.0, 0)
        .cast("bigint")
        .alias("xc"),
    )
    med = base.agg(
        F.round(2.0 * F.expr("percentile(xc, 0.5)"), 0)
        .cast("bigint")
        .alias("m2")
    )
    cls = (
        base.crossJoin(F.broadcast(med))
        .groupBy("grp")
        .agg(
            F.coalesce(
                F.sum(F.when(2 * F.col("xc") > F.col("m2"), 1)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("na"),
            F.coalesce(
                F.sum(F.when(2 * F.col("xc") < F.col("m2"), 1)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("nb"),
        )
        .localCheckpoint(eager=False)
    )
    tot = cls.agg(
        F.sum("na").cast("bigint").alias("ta"),
        F.sum("nb").cast("bigint").alias("tb"),
        F.sum(F.col("na") + F.col("nb")).cast("bigint").alias("nn"),
    )
    ea = (F.col("na") + F.col("nb")) * (
        F.col("ta").cast("double") / F.col("nn")
    )
    eb = (F.col("na") + F.col("nb")) * (
        F.col("tb").cast("double") / F.col("nn")
    )
    chi = (
        cls.crossJoin(F.broadcast(tot))
        .select(
            (
                F.round(
                    (F.col("na") - ea) * (F.col("na") - ea) / ea * 1e9, 0
                ).cast("bigint")
                + F.round(
                    (F.col("nb") - eb) * (F.col("nb") - eb) / eb * 1e9, 0
                ).cast("bigint")
            ).alias("t")
        )
        .agg(F.sum("t").cast("bigint").alias("chi_nano"))
    )
    return (
        cls.crossJoin(F.broadcast(chi))
        .select(
            "grp",
            F.col("na").alias("n_above"),
            F.col("nb").alias("n_below"),
            F.round(F.col("chi_nano").cast("double") / 1e9, 6).alias(
                "chi2_r"
            ),
        )
        .orderBy("grp")
    )
