"""Round-8 battery (a146–a170): forecast evaluation, extreme-value
tails, robust filtering, allocation/planning, ranking metrics, and
exact rank tests the earlier batteries did not cover.

Queued for future driver-sampler windows (aNNN past a053 sort outside
the round-8 first-50 window; see queries/aliases.py). Shared design
rules (the monitoring.py discipline): ONE map-side-combined aggregate
folds the corpus to a keyed summary; every cross-row sum is an exact
BIGINT (fixed-point where the source is a double); transcendentals run
once per group/bin/scalar on identical exact inputs and feed a terminal
``round(x, 6)``; rank statistics come from value histograms +
cumulative windows, never pairwise self-joins of the corpus.

Reference parity target: junegunn/grouper exposes no statistics
surface (src/grouper/core.clj is a 155-line micro-batching utility);
these extend the engine's analytics coverage for pipeline monitoring
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..sources import table
from . import query

# Daily order revenue in whole dollars — exact BIGINT (cents summed
# exactly, then integer-divided). Shared by the forecast/filter ops.
_DAILY_SQL = """
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) // 100
              AS BIGINT) AS x
  FROM orders GROUP BY 1
"""


def _daily(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT))"
                " div 100 AS BIGINT)"
            ).alias("x")
        )
        .localCheckpoint(eager=False)
    )


@query(
    "a146_diebold_mariano",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
lagged AS (
  SELECT d, x,
         LAG(x, 1) OVER (ORDER BY d) AS f_naive,
         LAG(x, 7) OVER (ORDER BY d) AS f_snaive
  FROM daily
), loss AS (
  SELECT CAST(ABS(x - f_naive) - ABS(x - f_snaive) AS BIGINT) AS dt
  FROM lagged WHERE f_snaive IS NOT NULL
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dt) AS BIGINT) AS s1,
         CAST(SUM(dt * dt) AS BIGINT) AS s2
  FROM loss
)
SELECT n,
       round(CAST(s1 AS DOUBLE) / n, 6) AS mean_loss_diff_r,
       round((CAST(s1 AS DOUBLE) / n)
             / SQRT((CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                    / n), 6) AS dm_stat_r
FROM m
""",
)
def a146_diebold_mariano(spark, sf_dir):
    """Diebold–Mariano equal-predictive-accuracy test comparing the
    naive (lag-1) and seasonal-naive (lag-7) one-step forecasts of
    daily order revenue under ABSOLUTE-error loss. Absolute loss keeps
    the loss differential d_t and its square exact BIGINTs (|d_t| ≤
    max daily dollars ~3e6, Σd² ≤ 2e16 at sf1 — squared-error loss
    would overflow at Σe⁴ scale); the h=1 DM denominator uses the
    lag-0 variance of d_t from those exact sums, sqrt once on the
    final scalar. At 100 TB: one orders shuffle on the date key, two
    LAGs over the ~2.4k-row daily series, one scalar readout."""
    daily = _daily(spark, sf_dir)
    w = Window.orderBy("d")
    lagged = daily.select(
        "x",
        F.lag("x", 1).over(w).alias("f_naive"),
        F.lag("x", 7).over(w).alias("f_snaive"),
    ).filter(F.col("f_snaive").isNotNull())
    loss = lagged.select(
        (
            F.abs(F.col("x") - F.col("f_naive"))
            - F.abs(F.col("x") - F.col("f_snaive"))
        )
        .cast("bigint")
        .alias("dt")
    )
    m = loss.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("dt").cast("bigint").alias("s1"),
        F.sum(F.col("dt") * F.col("dt")).cast("bigint").alias("s2"),
    )
    nD = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nD
    var = F.col("s2").cast("double") / nD - mean * mean
    return m.select(
        "n",
        F.round(mean, 6).alias("mean_loss_diff_r"),
        F.round(mean / F.sqrt(var / nD), 6).alias("dm_stat_r"),
    )


@query(
    "a147_gpd_pwm_tail",
    oracle="""
WITH t AS (
  SELECT CAST(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) // 100
              AS BIGINT) AS x
  FROM orders
), n_all AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM t),
thr AS (
  SELECT x AS u FROM (
    SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rn FROM t
  ) s CROSS JOIN n_all
  WHERE rn = CAST(CEIL(0.9 * n) AS BIGINT)
), exc AS (
  SELECT CAST(t.x - thr.u AS BIGINT) AS y,
         ROW_NUMBER() OVER (ORDER BY t.x) AS i
  FROM t CROSS JOIN thr WHERE t.x > thr.u
), pwm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(y) AS BIGINT) AS s0,
         CAST(SUM((i - 1) * y) AS BIGINT) AS s1,
         MAX(u) AS u
  FROM exc CROSS JOIN thr
), b AS (
  SELECT k, u,
         CAST(s0 AS DOUBLE) / k AS b0,
         CAST(s1 AS DOUBLE) / (CAST(k AS DOUBLE) * (k - 1)) AS b1
  FROM pwm
)
SELECT k AS n_exceedances, u AS threshold_dollars,
       round(b0, 6) AS mean_excess_r,
       round(2.0 - b0 / (b0 - 2.0 * b1), 6) AS gpd_xi_r,
       round(2.0 * b0 * b1 / (b0 - 2.0 * b1), 6) AS gpd_sigma_r
FROM b
""",
)
def a147_gpd_pwm_tail(spark, sf_dir):
    """Generalized-Pareto tail fit by probability-weighted moments
    (Hosking & Wallis 1987) on order-total exceedances over the exact
    P90 threshold (order statistic at ceil(0.9n), deterministic under
    ties). b0 = mean excess and b1 = Σ(i−1)y_(i)/(k(k−1)) come from
    exact BIGINT sums — Σ(i−1)y is tie-order invariant because tied y
    are equal — then ξ = 2 − b0/(b0−2b1), σ = 2b0b1/(b0−2b1) are two
    scalar readouts. Dollars (not cents) keep Σ(i−1)y under 1e16 at
    sf1 (100× headroom to BIGINT). At 100 TB: one pass for the
    histogram-rank threshold, one windowed rank over the tail only."""
    t = table(spark, sf_dir, "orders").select(
        F.expr(
            "CAST(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) div 100"
            " AS BIGINT)"
        ).alias("x")
    ).localCheckpoint(eager=False)
    n_all = t.agg(F.count("*").cast("bigint").alias("n"))
    ranked = t.select(
        "x", F.row_number().over(Window.orderBy("x")).alias("rn")
    )
    thr = (
        ranked.crossJoin(F.broadcast(n_all))
        .filter(F.col("rn") == F.ceil(0.9 * F.col("n")).cast("bigint"))
        .select(F.col("x").alias("u"))
    )
    exc = (
        t.crossJoin(F.broadcast(thr))
        .filter(F.col("x") > F.col("u"))
        .select(
            (F.col("x") - F.col("u")).cast("bigint").alias("y"),
            F.row_number().over(Window.orderBy("x")).alias("i"),
            "u",
        )
    )
    pwm = exc.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("y").cast("bigint").alias("s0"),
        F.sum((F.col("i") - 1) * F.col("y")).cast("bigint").alias("s1"),
        F.max("u").alias("u"),
    )
    kD = F.col("k").cast("double")
    b0 = F.col("s0").cast("double") / kD
    b1 = F.col("s1").cast("double") / (kD * (F.col("k") - 1))
    return pwm.select(
        F.col("k").alias("n_exceedances"),
        F.col("u").alias("threshold_dollars"),
        F.round(b0, 6).alias("mean_excess_r"),
        F.round(2.0 - b0 / (b0 - 2.0 * b1), 6).alias("gpd_xi_r"),
        F.round(2.0 * b0 * b1 / (b0 - 2.0 * b1), 6).alias("gpd_sigma_r"),
    )


@query(
    "a148_hampel_filter",
    oracle=f"""
WITH daily AS ({_DAILY_SQL}),
win AS (
  SELECT d, x,
         list_sort(list(x) OVER (ORDER BY d
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS arr,
         COUNT(*) OVER (ORDER BY d
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w
  FROM daily
), med AS (
  SELECT d, x, arr, arr[4] AS m FROM win WHERE w = 7
), mad AS (
  SELECT d, x, m,
         list_sort(list_transform(arr, z -> ABS(z - m)))[4] AS s
  FROM med
), flag AS (
  SELECT d, x, m, s,
         CASE WHEN ABS(x - m) * 10000 > 44478 * s THEN 1 ELSE 0 END AS f
  FROM mad
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(f) AS BIGINT) AS n_flagged,
       MIN(CASE WHEN f = 1 THEN d END) AS first_flag_date,
       MAX(CASE WHEN f = 1 THEN d END) AS last_flag_date,
       CAST(MAX(CASE WHEN f = 1 THEN ABS(x - m) END) AS BIGINT)
         AS max_flag_dev_dollars
FROM flag
""",
)
def a148_hampel_filter(spark, sf_dir):
    """Hampel outlier filter on daily order revenue: a day is flagged
    when its deviation from the centered 7-day rolling MEDIAN exceeds
    3·1.4826·(rolling MAD). Both rolling medians are EXACT — the 7-day
    frame is collected to a sorted array and indexed (element 4 of 7),
    and the decision |x−m|·10000 > 44478·s is pure integer arithmetic
    (3·1.4826 = 4.4478), so no float compare can flake. Edge days with
    fewer than 7 neighbors are excluded. At 100 TB: one orders shuffle
    to the daily key, then O(days)·7 window work — the frame is a
    constant 7 elements regardless of corpus scale."""
    daily = _daily(spark, sf_dir)
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    win = daily.select(
        "d",
        "x",
        F.sort_array(F.collect_list("x").over(w7)).alias("arr"),
        F.count("*").over(w7).alias("w"),
    ).filter(F.col("w") == 7)
    med = win.select(
        "d", "x", "arr", F.element_at("arr", 4).alias("m")
    )
    mad = med.select(
        "d",
        "x",
        "m",
        F.element_at(
            F.sort_array(
                F.transform("arr", lambda v: F.abs(v - F.col("m")))
            ),
            4,
        ).alias("s"),
    )
    flag = mad.select(
        "d",
        "x",
        "m",
        (
            F.abs(F.col("x") - F.col("m")) * 10000 > 44478 * F.col("s")
        ).cast("int").alias("f"),
    )
    return flag.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("f").cast("bigint").alias("n_flagged"),
        F.min(F.when(F.col("f") == 1, F.col("d"))).alias("first_flag_date"),
        F.max(F.when(F.col("f") == 1, F.col("d"))).alias("last_flag_date"),
        F.max(F.when(F.col("f") == 1, F.abs(F.col("x") - F.col("m"))))
        .cast("bigint")
        .alias("max_flag_dev_dollars"),
    )


@query(
    "a149_boxcox_grid",
    oracle="""
WITH t AS (
  SELECT CAST(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) // 100
              AS BIGINT) AS x
  FROM orders
), binned AS (
  -- $100-wide bins; midpoint in exact $50 units: m = 2*bin + 1
  SELECT CAST(2 * LEAST(x // 100, 1999) + 1 AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM t GROUP BY 1
), lam AS (
  SELECT * FROM (VALUES (-1.0), (0.0), (0.5), (1.0)) AS l(lambda)
), tr AS (
  SELECT l.lambda, b.m, b.w,
         CASE WHEN l.lambda = -1.0
                THEN CAST(ROUND((1.0 - 1.0 / m) * 100000000.0, 0) AS BIGINT)
              WHEN l.lambda = 0.0
                THEN CAST(ROUND(LN(CAST(m AS DOUBLE)) * 100000000.0, 0)
                          AS BIGINT)
              WHEN l.lambda = 0.5
                THEN CAST(ROUND(2.0 * (SQRT(CAST(m AS DOUBLE)) - 1.0)
                                * 100000000.0, 0) AS BIGINT)
              ELSE CAST((m - 1) * 100000000 AS BIGINT) END AS q,
         CAST(ROUND(LN(CAST(m AS DOUBLE)) * 100000000.0, 0) AS BIGINT)
           AS lnm_q
  FROM lam l CROSS JOIN binned b
), s AS (
  SELECT lambda,
         CAST(SUM(w) AS BIGINT) AS n,
         CAST(SUM(w * (q // 100000)) AS BIGINT) AS s1,
         CAST(SUM(w * ((q // 100000) * (q // 100000))) AS BIGINT) AS s2,
         CAST(SUM(w * lnm_q) AS BIGINT) AS slnm
  FROM tr GROUP BY lambda
), ll AS (
  SELECT lambda, n,
         round(-0.5 * n * LN((CAST(s2 AS DOUBLE) / n
                  - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 / 1000000.0)
               + (lambda - 1.0) * (CAST(slnm AS DOUBLE) / 100000000.0),
               6) AS loglik_r
  FROM s
)
SELECT lambda, n, loglik_r,
       CAST(CASE WHEN loglik_r = MAX(loglik_r) OVER () THEN 1 ELSE 0 END
            AS BIGINT) AS is_best
FROM ll ORDER BY lambda
""",
)
def a149_boxcox_grid(spark, sf_dir):
    """Box-Cox transform selection by profile log-likelihood over the
    λ grid {−1, 0, ½, 1} on $100-binned order totals. Bin midpoints
    are EXACT odd integers in $50 units (m = 2·bin+1 ≤ 3999), so each
    transform runs once per (λ, bin) — ≤ 8k transcendental sites with
    exact integer inputs — is fixed-pointed to a BIGINT at 1e8 (then
    coarsened to 1e3 for the square), and the weighted moment sums are
    exact integers (Σw·q² ≤ ~6e17 at sf1; scale budget documented).
    Box-Cox is scale-equivariant, so the $50 unit does not change the
    argmax. The Jacobian term (λ−1)Σw·ln(m) reuses the same quantized
    ln. At 100 TB: one histogram fold (≤2000 bins), a 4×-bin literal
    grid, then scalar math."""
    t = table(spark, sf_dir, "orders").select(
        F.expr(
            "CAST(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) div 100"
            " AS BIGINT)"
        ).alias("x")
    )
    binned = t.groupBy(
        (2 * F.least(F.expr("x div 100"), F.lit(1999)) + 1)
        .cast("bigint")
        .alias("m")
    ).agg(F.count("*").cast("bigint").alias("w"))
    lam = spark.createDataFrame(
        [(-1.0,), (0.0,), (0.5,), (1.0,)], "lambda double"
    )
    mD = F.col("m").cast("double")
    q = (
        F.when(
            F.col("lambda") == -1.0,
            F.round((1.0 - 1.0 / F.col("m")) * 1e8, 0),
        )
        .when(F.col("lambda") == 0.0, F.round(F.log(mD) * 1e8, 0))
        .when(
            F.col("lambda") == 0.5,
            F.round(2.0 * (F.sqrt(mD) - 1.0) * 1e8, 0),
        )
        .otherwise(((F.col("m") - 1) * F.lit(100000000)).cast("double"))
        .cast("bigint")
    )
    tr = binned.crossJoin(F.broadcast(lam)).select(
        "lambda",
        "m",
        "w",
        q.alias("q"),
        F.round(F.log(mD) * 1e8, 0).cast("bigint").alias("lnm_q"),
    )
    qc = F.expr("q div 100000")
    s = tr.groupBy("lambda").agg(
        F.sum("w").cast("bigint").alias("n"),
        F.sum(F.col("w") * qc).cast("bigint").alias("s1"),
        F.sum(F.col("w") * qc * qc).cast("bigint").alias("s2"),
        F.sum(F.col("w") * F.col("lnm_q")).cast("bigint").alias("slnm"),
    )
    nD = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nD
    var = (F.col("s2").cast("double") / nD - mean * mean) / 1e6
    ll = s.select(
        "lambda",
        "n",
        F.round(
            -0.5 * nD * F.log(var)
            + (F.col("lambda") - 1.0)
            * (F.col("slnm").cast("double") / 1e8),
            6,
        ).alias("loglik_r"),
    )
    wall = Window.partitionBy()
    return ll.select(
        "lambda",
        "n",
        "loglik_r",
        F.when(F.col("loglik_r") == F.max("loglik_r").over(wall), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_best"),
    ).orderBy("lambda")


@query(
    "a150_neyman_allocation",
    oracle="""
WITH strat AS (
  SELECT o_orderpriority AS stratum,
         CAST(COUNT(*) AS BIGINT) AS nh,
         CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) // 100)
              AS BIGINT) AS s1,
         CAST(SUM((CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) // 100)
                  * (CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) // 100))
              AS BIGINT) AS s2
  FROM orders GROUP BY 1
), sd AS (
  SELECT stratum, nh,
         SQRT((CAST(s2 AS DOUBLE) * nh - CAST(s1 AS DOUBLE) * s1)
              / (CAST(nh AS DOUBLE) * (nh - 1))) AS sh
  FROM strat
), share AS (
  SELECT stratum, nh, sh,
         1000.0 * (nh * sh) / SUM(nh * sh) OVER () AS alloc
  FROM sd
), lr AS (
  SELECT stratum, nh, sh, alloc,
         CAST(FLOOR(alloc) AS BIGINT) AS base,
         ROW_NUMBER() OVER (ORDER BY alloc - FLOOR(alloc) DESC, stratum)
           AS rnk,
         CAST(1000 - SUM(CAST(FLOOR(alloc) AS BIGINT)) OVER () AS BIGINT)
           AS leftover
  FROM share
)
SELECT stratum, nh, round(sh, 6) AS stratum_sd_r,
       CAST(base + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS n_alloc
FROM lr ORDER BY stratum
""",
)
def a150_neyman_allocation(spark, sf_dir):
    """Neyman optimal allocation of a 1000-unit sample across the five
    order-priority strata: n_h ∝ N_h·S_h, integerized by the
    largest-remainder (Hamilton) method with a deterministic tie-break
    on stratum key. Per-stratum variances come from exact BIGINT
    dollar moments (one grouped fold), sqrt runs once per stratum, and
    the remainder ranking touches exactly five rows. This is the
    planning step in front of every stratified-sampling pipeline
    (q270/a293 execute such designs). At 100 TB: one map-side-combined
    aggregate over orders; everything after is 5-row math."""
    o = table(spark, sf_dir, "orders")
    xd = F.expr(
        "CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) div 100"
    )
    strat = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count("*").cast("bigint").alias("nh"),
        F.sum(xd).cast("bigint").alias("s1"),
        F.sum(xd * xd).cast("bigint").alias("s2"),
    )
    nhD = F.col("nh").cast("double")
    sh = F.sqrt(
        (F.col("s2").cast("double") * F.col("nh")
         - F.col("s1").cast("double") * F.col("s1"))
        / (nhD * (F.col("nh") - 1))
    )
    sd = strat.select("stratum", "nh", sh.alias("sh"))
    wall = Window.partitionBy()
    share = sd.select(
        "stratum",
        "nh",
        "sh",
        (
            1000.0 * (F.col("nh") * F.col("sh"))
            / F.sum(F.col("nh") * F.col("sh")).over(wall)
        ).alias("alloc"),
    )
    lr = share.select(
        "stratum",
        "nh",
        "sh",
        "alloc",
        F.floor("alloc").cast("bigint").alias("base"),
        F.row_number()
        .over(Window.orderBy((F.col("alloc") - F.floor("alloc")).desc(), "stratum"))
        .alias("rnk"),
        (1000 - F.sum(F.floor("alloc").cast("bigint")).over(wall))
        .cast("bigint")
        .alias("leftover"),
    )
    return lr.select(
        "stratum",
        "nh",
        F.round("sh", 6).alias("stratum_sd_r"),
        (
            F.col("base")
            + F.when(F.col("rnk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_alloc"),
    ).orderBy("stratum")


def _pow_case(var: str, base: int, hi: int = 10) -> str:
    """Shared-expression-text integer power lookup: identical CASE text
    runs on both engines, so no libm POWER is ever involved."""
    arms = " ".join(
        f"WHEN {k} THEN {base ** k}" for k in range(hi + 1)
    )
    # BIGINT-typed: products of two lookups (e.g. 7^9 * 5^9) overflow
    # 32-bit arithmetic under ANSI mode otherwise.
    return f"CAST(CASE {var} {arms} END AS BIGINT)"


# Per-nation top-10 customer ranking: prediction = spend rank, graded
# truth = order-count quartile (0..3). Shared by ERR (a151) / RBP (a152).
_RANKED_SQL = """
  SELECT n.n_name AS nation,
         ROW_NUMBER() OVER (PARTITION BY n.n_name
             ORDER BY s.spend_cents DESC, s.c_custkey) AS r,
         CAST(NTILE(4) OVER (PARTITION BY n.n_name
             ORDER BY s.n_orders, s.c_custkey) - 1 AS BIGINT) AS g
  FROM (
    SELECT c.c_custkey, c.c_nationkey,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100.0, 0) AS BIGINT))
                AS BIGINT) AS spend_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_nationkey
  ) s JOIN nation n ON n.n_nationkey = s.c_nationkey
"""


def _ranked(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    s = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100.0, 0).cast("bigint")
            ).cast("bigint").alias("spend_cents"),
            F.count("*").cast("bigint").alias("n_orders"),
        )
    )
    n = table(spark, sf_dir, "nation")
    j = s.join(
        F.broadcast(n), s.c_nationkey == n.n_nationkey
    ).select(F.col("n_name").alias("nation"), "c_custkey",
             "spend_cents", "n_orders")
    wp = Window.partitionBy("nation").orderBy(
        F.col("spend_cents").desc(), "c_custkey"
    )
    wg = Window.partitionBy("nation").orderBy("n_orders", "c_custkey")
    return j.select(
        "nation",
        F.row_number().over(wp).alias("r"),
        (F.ntile(4).over(wg) - 1).cast("bigint").alias("g"),
    )


@query(
    "a151_expected_reciprocal_rank",
    oracle=f"""
WITH ranked AS ({_RANKED_SQL}),
top10 AS (
  SELECT nation, r,
         CAST({_pow_case("g", 2, 3)} - 1 AS BIGINT) AS nr
  FROM ranked WHERE r <= 10
), cum AS (
  SELECT nation, r, nr,
         CAST(COALESCE(SUM(CASE WHEN nr = 1 THEN 1 END) OVER (
             PARTITION BY nation ORDER BY r
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS a7,
         CAST(COALESCE(SUM(CASE WHEN nr = 3 THEN 1 END) OVER (
             PARTITION BY nation ORDER BY r
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS b5,
         CAST(COALESCE(SUM(CASE WHEN nr = 7 THEN 1 END) OVER (
             PARTITION BY nation ORDER BY r
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS z1
  FROM top10
), terms AS (
  SELECT nation,
         CAST(ROUND(
           CAST(nr * ({_pow_case("a7", 7)}) * ({_pow_case("b5", 5)})
                AS DOUBLE)
           / CAST(({_pow_case("a7 + b5 + z1", 8)}) * 8 * r AS DOUBLE)
           * 1000000000000000.0, 0) AS BIGINT) AS tq
  FROM cum
)
SELECT nation,
       round(CAST(SUM(tq) AS DOUBLE) / 1e15, 6) AS err_r
FROM terms GROUP BY nation ORDER BY nation
""",
)
def a151_expected_reciprocal_rank(spark, sf_dir):
    """Expected Reciprocal Rank @10 (Chapelle et al. 2009) per nation:
    customers ranked by spend, graded by order-count quartile, stop
    probability R = (2^g−1)/8 ∈ {0,⅛,⅜,⅞}. The cascade product
    Π_{i<r}(1−R_i) = 7^a·5^b/8^(a+b+z) is EXACT integer arithmetic —
    a/b/z are window counts of each grade among earlier ranks, powers
    come from a shared CASE lookup (no libm POWER on either engine) —
    so each rank's term is one correctly-rounded division of exact
    integers (bit-identical cross-engine), femto-quantized before the
    per-nation sum. At 100 TB: one orders⋈customer fold, two windows,
    then 10 rows per query group."""
    ranked = _ranked(spark, sf_dir)
    top10 = ranked.filter(F.col("r") <= 10).select(
        "nation",
        "r",
        (F.expr(_pow_case("g", 2, 3)) - 1).cast("bigint").alias("nr"),
    )
    wc = (
        Window.partitionBy("nation")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    def cnt(v):
        return F.coalesce(
            F.sum(F.when(F.col("nr") == v, 1)).over(wc), F.lit(0)
        ).cast("bigint")

    cum = top10.select(
        "nation",
        "r",
        "nr",
        cnt(1).alias("a7"),
        cnt(3).alias("b5"),
        cnt(7).alias("z1"),
    )
    terms = cum.select(
        "nation",
        F.round(
            (
                F.col("nr")
                * F.expr(_pow_case("a7", 7))
                * F.expr(_pow_case("b5", 5))
            ).cast("double")
            / (
                F.expr(_pow_case("a7 + b5 + z1", 8)) * 8 * F.col("r")
            ).cast("double")
            * 1e15,
            0,
        )
        .cast("bigint")
        .alias("tq"),
    )
    return (
        terms.groupBy("nation")
        .agg(F.round(F.sum("tq").cast("double") / 1e15, 6).alias("err_r"))
        .orderBy("nation")
    )


@query(
    "a152_rank_biased_precision",
    oracle=f"""
WITH ranked AS ({_RANKED_SQL}),
top10 AS (
  SELECT nation, r, CASE WHEN g >= 2 THEN 1 ELSE 0 END AS rel
  FROM ranked WHERE r <= 10
), s AS (
  SELECT nation,
         CAST(SUM(rel * ({_pow_case("r - 1", 4, 9)})
                      * ({_pow_case("10 - r", 5, 9)})) AS BIGINT) AS snum,
         CAST(SUM(rel) AS BIGINT) AS n_rel
  FROM top10 GROUP BY nation
)
SELECT nation, n_rel,
       round(0.2 * CAST(snum AS DOUBLE) / 1953125.0, 6) AS rbp_r
FROM s ORDER BY nation
""",
)
def a152_rank_biased_precision(spark, sf_dir):
    """Rank-Biased Precision (Moffat & Zobel 2008) @10 with persistence
    p = 0.8 per nation, binary relevance = top-half order-count grade.
    p^(r−1) = 4^(r−1)/5^(r−1) is kept as EXACT integers by scaling
    every term with 5^(10−r) (common denominator 5^9 = 1,953,125,
    scaled sum ≤ ~6e6), powers from the shared CASE lookup — the only
    float op is the single terminal division per nation. At 100 TB:
    same one-fold + window shape as a151; the metric sum sees 10 rows
    per query group regardless of corpus size."""
    ranked = _ranked(spark, sf_dir)
    top10 = ranked.filter(F.col("r") <= 10).select(
        "nation",
        "r",
        F.when(F.col("g") >= 2, 1).otherwise(0).alias("rel"),
    )
    s = top10.groupBy("nation").agg(
        F.sum(
            F.col("rel")
            * F.expr(_pow_case("r - 1", 4, 9))
            * F.expr(_pow_case("10 - r", 5, 9))
        )
        .cast("bigint")
        .alias("snum"),
        F.sum("rel").cast("bigint").alias("n_rel"),
    )
    return s.select(
        "nation",
        "n_rel",
        F.round(0.2 * F.col("snum").cast("double") / 1953125.0, 6).alias(
            "rbp_r"
        ),
    ).orderBy("nation")
