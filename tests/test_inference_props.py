"""Textbook-invariant property checks for the round-7 inference
battery (grouper_spark/queries/inference.py).

The parity gate proves Spark == DuckDB, but it CANNOT catch a formula
both sides encode wrong (the q169/q277 class) — these assertions pin
the statistics to facts that hold for the ESTIMATORS themselves:
range bounds, algebraic identities between outputs, normalization,
and dominance relations. Each query runs once at sf0.001 on the
shared session and is collected (all are summary-sized outputs)."""

from __future__ import annotations

import math

import pytest

from grouper_spark.queries import load_all

REGISTRY = load_all()


@pytest.fixture(scope="module")
def row(spark, sf_dir):
    cache: dict[str, list] = {}

    def get(name):
        if name not in cache:
            cache[name] = REGISTRY[name].fn(spark, sf_dir).collect()
        return cache[name]

    return get


def test_cliffs_delta_vda_identity(row):
    r = row("a472_cliffs_delta")[0]
    assert -1.0 <= r.cliffs_delta_r <= 1.0
    assert 0.0 <= r.vda_r <= 1.0
    # Â = (δ+1)/2 exactly (tie mass splits evenly)
    assert abs(r.vda_r - (r.cliffs_delta_r + 1.0) / 2.0) < 2e-6
    assert r.gt_pairs + r.lt_pairs + r.tie_pairs == r.n1 * r.n2


def test_fisher_tails_overlap_at_observed(row):
    r = row("a477_fisher_exact")[0]
    # left and right tails both include P(K = a_obs), so they sum > 1
    assert r.p_left_r + r.p_right_r >= 1.0 - 1e-5
    assert 0.0 <= r.p_left_r <= 1.0 + 1e-9
    assert 0.0 <= r.p_right_r <= 1.0 + 1e-9


def test_pacf_lag1_equals_acf1(row):
    r = row("a483_pacf")[0]
    assert r.pacf1_r == r.acf1_r
    for v in (r.pacf1_r, r.pacf2_r, r.pacf3_r, r.pacf4_r, r.pacf5_r):
        assert -1.0 <= v <= 1.0


def test_periodogram_power_nonnegative(row):
    rows = row("a484_goertzel_periodogram")
    assert [r.period_days for r in rows] == [7, 14, 30]
    for r in rows:
        assert r.power_r >= 0.0


def test_permutation_entropy_normalized(row):
    r = row("a485_permutation_entropy")[0]
    assert 0.0 <= r.h_norm_r <= 1.0 + 1e-9
    assert 1 <= r.n_patterns <= 6


def test_cronbach_alpha_upper_bound(row):
    r = row("a486_cronbach_alpha")[0]
    # alpha <= 1 always; item variances positive on this fixture
    assert r.alpha_r <= 1.0 + 1e-9
    assert r.item_var_num > 0 and r.total_var_num > 0


def test_ece_bounds(row):
    r = row("a487_ece_calibration")[0]
    assert 0.0 <= r.ece_r <= 1.0
    assert 1 <= r.n_bins <= 10
    assert r.hl_chi2_r >= 0.0


def test_nelson_aalen_monotone_pieces(row):
    r = row("a488_nelson_aalen_rmst")[0]
    assert r.h_final_r >= 0.0
    # RMST(90) is an average of a [0,1] survival curve over <=90 days
    assert 0.0 <= r.rmst90_r <= 90.0 + 1e-9
    assert r.n_event_times <= r.n_subjects


def test_yuen_h_le_n(row):
    r = row("a489_yuen_trimmed_t")[0]
    assert r.h_urgent <= r.n_urgent and r.h_low <= r.n_low
    # 20% trim leaves at least 60% of each group
    assert r.h_urgent >= 0.6 * r.n_urgent - 1
    assert r.df_r <= r.h_urgent + r.h_low - 2 + 1e-6


def test_hodges_lehmann_pairs(row):
    r = row("a490_hodges_lehmann")[0]
    assert r.n_pairs == r.n_purchase * r.n_view


def test_ari_upper_bound(row):
    r = row("a491_adjusted_rand")[0]
    assert r.ari_r <= 1.0 + 1e-9
    assert r.s_index <= min(r.s_a, r.s_b)


def test_davies_bouldin_positive(row):
    r = row("a492_davies_bouldin_ch")[0]
    assert r.db_index_r > 0.0
    assert r.ch_index_r > 0.0


def test_hits_l1_normalized(row):
    rows = row("a493_hits")
    assert len(rows) == 5
    # floor-div renormalization keeps each L1 sum within 5 fp units of 1
    assert abs(sum(r.hub_r for r in rows) - 1.0) < 1e-5
    assert abs(sum(r.auth_r for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert r.hub_r >= 0.0 and r.auth_r >= 0.0


def test_rich_club_monotone_support(row):
    rows = row("a494_rich_club")
    # rich-node counts shrink as the threshold rises
    ns = [r.n_rich for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        if r.phi_r is not None:
            assert 0.0 <= r.phi_r <= 1.0 + 1e-9


def test_yules_k_spectrum_identity(row):
    r = row("a495_yules_k")[0]
    assert r.v_types <= r.n_tokens
    assert r.s2 >= r.n_tokens  # sum m^2 >= sum m
    assert r.yules_k_r >= 0.0


def test_dersimonian_laird_tau_nonneg(row):
    r = row("a496_dersimonian_laird")[0]
    assert r.tau2_r >= 0.0
    assert r.q_r >= 0.0
    assert abs(math.log(r.pooled_or_r) - r.pooled_lor_r) < 1e-4


def test_weighted_reservoir_size(row):
    r = row("a497_weighted_reservoir")[0]
    assert r.k_sampled == 100
    assert r.n_sources >= 1


def test_absorbing_steps_at_least_one(row):
    rows = row("a498_absorbing_markov")
    assert len(rows) == 4
    for r in rows:
        # at least one step to absorb from any transient state
        assert r.exp_steps_r >= 1.0


def test_erlang_c_dominates_b(row):
    r = row("a499_erlang_c")[0]
    assert 0.0 <= r.erlang_b8_r <= 1.0
    if r.erlang_c8_r is not None:
        # Erlang C (wait) >= Erlang B (block) at the same c
        assert r.erlang_c8_r >= r.erlang_b8_r - 1e-6


def test_decay_deciles_monotone(row):
    rows = row("a500_decay_weighted_engagement")
    avgs = [r.avg_decayed_dollars_r for r in rows]
    assert avgs == sorted(avgs)
    assert all(r.n_users > 0 for r in rows)


def test_intersect_except_counts(row):
    r = row("a501_intersect_except")[0]
    # bag counts dominate set counts; EXCEPT ALL >= EXCEPT
    assert r.n_intersect_all >= r.n_intersect
    assert r.n_except_all >= r.n_except


def test_page_l_range(row):
    r = row("a502_page_trend")[0]
    # doubled L is between n*k(k+1)/1... loose sanity: positive, bounded
    assert 12 * r.n_users <= r.l2_stat <= 36 * r.n_users


def test_quade_f_nonneg(row):
    r = row("a503_quade_test")[0]
    assert r.f_quade_r >= 0.0


def test_cox_stuart_p_range(row):
    r = row("a504_cox_stuart")[0]
    assert 0.0 <= r.p_two_sided_r <= 1.0


def test_kpss_nonneg(row):
    r = row("a505_kpss")[0]
    assert r.kpss_eta_r >= 0.0


def test_brunner_munzel_p_hat_range(row):
    r = row("a511_brunner_munzel")[0]
    assert 0.0 <= r.p_hat_r <= 1.0


def test_bowker_df_bound(row):
    r = row("a513_bowker_symmetry")[0]
    assert 0 <= r.df_used <= 10  # C(5,2) unordered pairs
    assert r.chi2_bowker_r >= 0.0


def test_stuart_maxwell_margins_sum_zero(row):
    r = row("a514_stuart_maxwell")[0]
    assert r.d_purchase + r.d_click + r.d_other == 0


def test_ad_ksample_shape(row):
    r = row("a515_anderson_darling_ksample")[0]
    assert r.k_groups == 5
    assert r.a2_akn_r is not None


def test_theil_u_consistency(row):
    r = row("a516_theil_u2")[0]
    assert r.theil_u2_r >= 0.0
    assert 0.0 <= r.theil_u1_r <= 1.0 + 1e-9
    assert (r.verdict == "seasonal_beats_naive") == (r.theil_u2_r < 1.0)


def test_somers_gamma_bounds(row):
    r = row("a473_somers_gamma")[0]
    assert -1.0 <= r.gamma_r <= 1.0
    # |gamma| >= |somers' d| always (gamma drops ties from the denom)
    assert abs(r.gamma_r) >= abs(r.somers_dxy_r) - 1e-6
    assert abs(r.gamma_r) >= abs(r.somers_dyx_r) - 1e-6


def test_bartlett_nonneg(row):
    r = row("a475_bartlett_test")[0]
    assert r.bartlett_chi2_r >= 0.0


def test_g_test_nonneg(row):
    r = row("a478_g_test")[0]
    assert r.g_stat_r >= 0.0


def test_durbin_watson_range_and_identity(row):
    r = row("a479_durbin_watson")[0]
    assert 0.0 <= r.dw_r <= 4.0
    # rho1 = 1 - DW/2 by construction
    assert abs(r.rho1_r - (1.0 - r.dw_r / 2.0)) < 2e-6


def test_breusch_pagan_nonneg(row):
    r = row("a480_breusch_pagan")[0]
    assert r.bp_lm_r >= 0.0


def test_chow_f_nonneg(row):
    r = row("a481_chow_test")[0]
    assert r.f_chow_r >= 0.0


def test_vif_at_least_one(row):
    r = row("a482_vif")[0]
    # VIF = 1/(1-R^2) >= 1 for any real predictor set
    for v in (r.vif_quantity_r, r.vif_discount_r, r.vif_tax_r):
        assert v >= 1.0 - 1e-6
    for c in (r.r12_r, r.r13_r, r.r23_r):
        assert -1.0 <= c <= 1.0


def test_adf_outputs_finite(row):
    r = row("a506_adf")[0]
    # the AR coefficient rho on differences sits in (-2, 1) for any
    # real series; the t ratio must agree in sign with rho
    assert -2.0 < r.rho_r < 1.0
    assert (r.adf_t_r < 0) == (r.rho_r < 0)


def test_granger_f_nonneg(row):
    r = row("a507_granger_causality")[0]
    # restricted SSE >= unrestricted SSE, so F >= 0 up to rounding
    assert r.f_granger_r >= -1e-6


def test_breusch_godfrey_lm_bounds(row):
    r = row("a508_breusch_godfrey")[0]
    # LM = n*R^2 with R^2 in [0,1]
    assert -1e-6 <= r.lm_bg_r <= r.n_obs + 1e-6
    assert -1.0 <= r.rho_resid_r <= 1.0


def test_white_r2_bounds(row):
    r = row("a509_white_test")[0]
    assert -1e-6 <= r.r2_aux_r <= 1.0 + 1e-6
    # r2_aux_r is rounded to 6dp, so the identity holds to n*5e-7
    assert abs(r.lm_white_r - r.n_obs * r.r2_aux_r) < r.n_obs * 5.1e-7 + 1e-6


def test_lilliefors_d_range(row):
    r = row("a510_lilliefors")[0]
    assert 0.0 <= r.d_stat_r <= 1.0


def test_conover_t_bounds(row):
    r = row("a512_conover_squared_ranks")[0]
    # normalized squared ranks are <= 1 each, so T <= n1
    assert 0.0 <= r.t_norm_r <= r.n_urgent + 1e-6


def test_kendalls_w_range(row):
    r = row("a517_kendalls_w")[0]
    assert 0.0 <= r.w_r <= 1.0 + 1e-9
    # chi2 = m (n-1) W identity
    assert abs(r.chi2_r - r.n_raters * 4.0 * r.w_r) < 2e-4


def test_gk_lambda_bounds(row):
    r = row("a518_goodman_kruskal_lambda")[0]
    for v in (
        r.lambda_seg_given_nation_r,
        r.lambda_nation_given_seg_r,
        r.lambda_symmetric_r,
    ):
        assert -1e-9 <= v <= 1.0 + 1e-9
    lo = min(r.lambda_seg_given_nation_r, r.lambda_nation_given_seg_r)
    hi = max(r.lambda_seg_given_nation_r, r.lambda_nation_given_seg_r)
    # symmetric lambda is a weighted mean of the two directions
    assert lo - 1e-6 <= r.lambda_symmetric_r <= hi + 1e-6


def test_uncertainty_coefficient_bounds(row):
    r = row("a519_uncertainty_coefficient")[0]
    assert r.mi_nats_r >= -1e-6
    for v in (
        r.u_lang_given_source_r,
        r.u_source_given_lang_r,
        r.u_symmetric_r,
    ):
        assert -1e-6 <= v <= 1.0 + 1e-6


def test_cvm_nonneg(row):
    r = row("a520_cramer_von_mises")[0]
    assert r.cvm_t_r >= 0.0


def test_ansari_bradley_score_bounds(row):
    r = row("a521_ansari_bradley")[0]
    nn = r.n_urgent + r.n_low
    # AB sums n1 scores, each in [1, (N+1)/2]
    assert r.n_urgent <= r.ab_stat_r <= r.n_urgent * (nn + 1) / 2.0


def test_map_mrr_dominance(row):
    r = row("a522_map_mrr")[0]
    assert 0.0 <= r.map100_r <= 1.0 + 1e-9
    assert 0.0 <= r.mrr_r <= 1.0 + 1e-9
    # MRR scores only the first hit at full credit, so MRR >= MAP
    assert r.mrr_r >= r.map100_r - 1e-6
    assert r.n_with_relevant <= r.n_queries


def test_rbo_bounds(row):
    r = row("a523_rank_biased_overlap")[0]
    assert 0.0 <= r.rbo_r <= 1.0 + 1e-9
    assert 0 <= r.overlap_at_depth <= r.depth


def test_weighted_kappa_bounds(row):
    r = row("a524_weighted_kappa")[0]
    for v in (r.kappa_quadratic_r, r.kappa_linear_r):
        assert -1.0 - 1e-9 <= v <= 1.0 + 1e-9


def test_matthews_panel_consistency(row):
    r = row("a525_matthews_corrcoef")[0]
    if r.mcc_r is not None:
        assert -1.0 <= r.mcc_r <= 1.0
    if r.f1_r is not None:
        assert 0.0 <= r.f1_r <= 1.0
    if r.balanced_acc_r is not None and r.youden_j_r is not None:
        # J = 2*BA - 1 identity
        assert abs(r.youden_j_r - (2.0 * r.balanced_acc_r - 1.0)) < 2e-6


def test_bland_altman_loa_order(row):
    r = row("a526_bland_altman")[0]
    assert r.loa_lower_r <= r.bias_dollars_r <= r.loa_upper_r
    # ~5% outside the 95% limits for any roughly symmetric distribution
    assert 0.0 <= r.frac_outside_r <= 0.25


# ---- battery II (inference2.py) ----

def _daily_series(sf_dir):
    import duckdb

    return [
        r[1]
        for r in duckdb.connect()
        .execute(
            f"""SELECT CAST(o_orderdate AS DATE) d,
                 CAST(SUM(CAST(ROUND(o_totalprice*100.0,0) AS BIGINT))//100
                      AS BIGINT) x
            FROM '{sf_dir}/orders.parquet' GROUP BY 1 ORDER BY 1"""
        )
        .fetchall()
    ]


def test_pettitt_brute_force(row, sf_dir):
    r = row("a527_pettitt_changepoint")[0]
    xs = _daily_series(sf_dir)
    n = len(xs)
    assert r.n_days == n
    # brute-force U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j)
    import numpy as np

    a = np.asarray(xs, dtype=np.int64)
    sgn_row = np.sign(a[:, None] - a[None, :]).sum(axis=1)  # vs all j
    # U_t = cumulative sum of per-i sign-sums (pairs inside prefix cancel)
    u = np.cumsum(sgn_row)
    k_brute = int(np.max(np.abs(u)))
    assert r.k_stat == k_brute
    assert 0.0 <= r.p_approx_r <= 2.0 + 1e-9


def test_buishand_snht_brute_force(row, sf_dir):
    r = row("a528_buishand_snht")[0]
    import numpy as np

    a = np.asarray([x // 100 for x in _daily_series(sf_dir)], dtype=float)
    n = len(a)
    s = a.cumsum() - (np.arange(1, n + 1)) * a.mean()
    sd = a.std(ddof=1)
    r_brute = (s.max() - s.min()) / sd / math.sqrt(n)
    assert abs(r.buishand_rsqn_r - r_brute) < 1e-4
    k = np.arange(1, n)
    z = s[:-1] / sd
    t = z * z * (1.0 / k + 1.0 / (n - k)) * n / n  # T_k = z^2 n(1/k+1/(n-k))/n
    t_k = (s[:-1] ** 2) / (sd * sd) * (1.0 / k + 1.0 / (n - k))
    assert abs(r.snht_t_r - t_k.max()) < 1e-3
    assert r.buishand_rsqn_r >= 0.0


def test_bartels_rvn_brute_force(row, sf_dir):
    r = row("a529_bartels_rank_vn")[0]
    import pandas as pd

    xs = pd.Series(_daily_series(sf_dir))
    rk = xs.rank(method="average").to_numpy()
    num = ((rk[:-1] - rk[1:]) ** 2).sum()
    den = ((rk - rk.mean()) ** 2).sum()
    assert abs(r.rvn_r - num / den) < 1e-4
    assert 0.0 < r.rvn_r < 4.0


def test_yule_walker_brute_force(row, sf_dir):
    r = row("a530_yule_walker_ar2")[0]
    import numpy as np

    a = np.asarray([x // 100 for x in _daily_series(sf_dir)], dtype=float)
    n = len(a)
    m = a.mean()

    def cov(k):
        return ((a[: n - k] - m) * (a[k:] - m)).sum()

    r1, r2 = cov(1) / cov(0), cov(2) / cov(0)
    assert abs(r.r1_r - r1) < 1e-4 and abs(r.r2_r - r2) < 1e-4
    phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    assert abs(r.phi1_r - phi1) < 1e-4 and abs(r.phi2_r - phi2) < 1e-4
    assert 0.0 < r.noise_ratio_r <= 1.0 + 1e-9


def test_croston_identities(row):
    rows = row("a531_croston_intermittent")
    assert len(rows) == 97
    for r in rows:
        assert r.z_hat_r > 0 and r.p_hat_r >= 1.0 - 1e-9
        assert abs(r.croston_r - r.z_hat_r / r.p_hat_r) < 2e-6
        assert abs(r.sba_r - 0.9 * r.croston_r) < 2e-6


def test_aalen_johansen_monotone_and_bounded(row):
    rows = row("a532_aalen_johansen")
    prev1 = prev2 = 0.0
    for r in rows:
        assert r.cif_purchase_r >= prev1 - 1e-9
        assert r.cif_error_r >= prev2 - 1e-9
        assert r.cif_purchase_r + r.cif_error_r <= 1.0 + 1e-6
        prev1, prev2 = r.cif_purchase_r, r.cif_error_r


def test_greenwood_brackets_km(row):
    rows = row("a533_km_greenwood_ci")
    km = {r.t_days: r for r in row("q245_kaplan_meier")}
    prev = 1.0
    for r in rows:
        assert r.ci_lo_r <= r.survival_r <= r.ci_hi_r
        assert r.survival_r <= prev + 1e-9
        prev = r.survival_r
        # same framing as q245: survival curves must agree (4dp there)
        assert abs(round(r.survival_r, 4) - km[r.t_days].survival_r) < 2e-4


def test_adamic_adar_scores_positive(row):
    rows = row("a534_adamic_adar_linkpred")
    assert rows, "link-prediction candidates must exist"
    for r in rows:
        assert r.cn >= 1
        assert r.aa_r > 0.0
        assert 0.0 < r.jaccard_r <= 1.0
        assert r.u < r.v


def test_connected_components_union_find(row, sf_dir):
    import duckdb

    rows = row("a535_connected_components")
    edges = duckdb.connect().execute(
        f"""WITH op AS (SELECT DISTINCT l_orderkey o, l_partkey p
              FROM '{sf_dir}/lineitem.parquet'),
        okeep AS (SELECT o FROM op GROUP BY o HAVING count(*) <= 20),
        opk AS (SELECT op.o, p FROM op JOIN okeep ON op.o=okeep.o)
        SELECT a.p, b.p FROM opk a JOIN opk b
        ON a.o=b.o AND a.p<b.p GROUP BY 1,2 HAVING count(*) >= 2"""
    ).fetchall()
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    from collections import Counter

    sizes = Counter(Counter(find(x) for x in parent).values())
    got = {r.component_size: (r.n_components, r.n_nodes) for r in rows}
    assert got == {s: (c, s * c) for s, c in sizes.items()}


def test_fuzzy_blocking_brute_force(row, sf_dir):
    import duckdb

    rows = row("a536_fuzzy_name_blocking")

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    names = duckdb.connect().execute(
        f"""SELECT regexp_extract(p_name, '([a-z]+)$', 1),
               list(p_name ORDER BY p_partkey)
        FROM '{sf_dir}/part.parquet' GROUP BY 1"""
    ).fetchall()
    expect = {}
    for blk, ns in names:
        ns = ns[:256]
        pairs = [
            lev(ns[i], ns[j])
            for i in range(len(ns))
            for j in range(i + 1, len(ns))
        ]
        pairs = [d for d in pairs if 1 <= d <= 3]
        if pairs:
            expect[blk] = (len(pairs), sum(pairs))
    got = {r.blk: (r.n_pairs, r.dist_sum) for r in rows}
    assert got == expect


def test_cooks_distance_numpy(row, sf_dir):
    import duckdb
    import numpy as np

    rows = row("a537_cooks_distance")
    xy = duckdb.connect().execute(
        f"""SELECT CAST(ROUND(c_acctbal,0) AS BIGINT),
               CAST(SUM(CAST(ROUND(o_totalprice*100.0,0) AS BIGINT))//100
                    AS BIGINT)
        FROM '{sf_dir}/customer.parquet' c
        JOIN '{sf_dir}/orders.parquet' o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_acctbal"""
    ).fetchall()
    x = np.array([p[0] for p in xy], float)
    y = np.array([p[1] for p in xy], float)
    n = len(x)
    beta = ((x - x.mean()) * (y - y.mean())).sum() / ((x - x.mean()) ** 2).sum()
    alpha = y.mean() - beta * x.mean()
    e = y - alpha - beta * x
    mse = (e ** 2).sum() / (n - 2)
    h = 1.0 / n + (x - x.mean()) ** 2 / ((x - x.mean()) ** 2).sum()
    d = e ** 2 * h / (2 * mse * (1 - h) ** 2)
    assert abs(max(d) - rows[0].cooks_d_r) < 1e-4
    for r in rows:
        assert 0.0 < r.leverage_r < 1.0
        assert r.cooks_d_r >= 0.0


def test_dixon_q_bounds(row):
    for r in row("a538_dixon_q_outlier"):
        assert r.x1 <= r.x2 <= r.xn and r.x1 <= r.xn1 <= r.xn
        assert 0.0 <= r.q_max_r <= 1.0 and 0.0 <= r.q_min_r <= 1.0


def test_llr_nonnegative_and_brute(row):
    rows = row("a539_dunning_llr_collocations")
    assert rows
    for r in rows:
        assert r.llr_r >= -1e-6
        assert r.k11 >= 5
    # scores must be sorted descending
    vals = [r.llr_r for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_hhi_identities(row):
    for r in row("a540_herfindahl_concentration"):
        assert 1.0 / r.n_suppliers - 1e-9 <= r.hhi_r <= 1.0 + 1e-9
        assert abs(r.effective_n_r - 1.0 / r.hhi_r) < 1e-3
        assert -1e-6 <= r.hhi_norm_r <= 1.0 + 1e-9
        assert r.effective_n_r <= r.n_suppliers + 1e-6


def test_inequality_identities(row):
    r = row("a541_inequality_panel")[0]
    assert r.theil_t_r >= -1e-6 and r.theil_l_r >= -1e-6
    assert 0.0 <= r.atkinson1_r < 1.0
    # Atkinson(1) = 1 - exp(-Theil L), exactly
    assert abs(r.atkinson1_r - (1.0 - math.exp(-r.theil_l_r))) < 2e-5


def test_lift_gains_consistency(row):
    rows = row("a542_lift_gains_deciles")
    base_users = sum(r.n_users for r in rows)
    base_pos = sum(r.n_pos for r in rows)
    for r in rows:
        assert abs(r.resp_rate_r - r.n_pos / r.n_users) < 2e-6
        assert abs(
            r.lift_r - (r.n_pos / r.n_users) / (base_pos / base_users)
        ) < 1e-4
    # cumulative gain reaches 1.0 at the lowest bin
    assert abs(rows[0].cum_gain_r - 1.0) < 2e-6 or abs(
        max(r.cum_gain_r for r in rows) - 1.0
    ) < 2e-6


def test_fdr_dominance(row):
    rows = row("a543_multiple_testing_fdr")
    assert len(rows) == 25
    for r in rows:
        # Holm (FWER) is uniformly at least as conservative as BH (FDR)
        assert r.p_holm_r >= r.p_bh_r - 1e-6
        assert r.p_bh_r >= r.p_r - 1e-6
        assert 0.0 <= r.p_r <= 1.0 + 1e-9
        assert r.rej_holm <= r.rej_bh


def test_mahalanobis_numpy(row, sf_dir):
    import duckdb
    import numpy as np

    rows = row("a544_mahalanobis_outliers")
    xy = duckdb.connect().execute(
        f"""SELECT CAST(ROUND(c_acctbal,0) AS BIGINT),
               CAST(SUM(CAST(ROUND(o_totalprice*100.0,0) AS BIGINT))//100
                    AS BIGINT)
        FROM '{sf_dir}/customer.parquet' c
        JOIN '{sf_dir}/orders.parquet' o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_acctbal"""
    ).fetchall()
    a = np.array(xy, float)
    mu = a.mean(axis=0)
    cov = np.cov(a.T)
    inv = np.linalg.inv(cov)
    d = a - mu
    d2 = (d @ inv * d).sum(axis=1)
    assert abs(rows[0].mahal_d2_r - d2.max()) < 1e-3
    for r in rows:
        assert r.mahal_d2_r >= 0.0
        assert abs(r.chi2_p_r - math.exp(-r.mahal_d2_r / 2.0)) < 2e-6


def test_average_precision_bounds(row):
    r = row("a545_average_precision")[0]
    assert 0.0 <= r.ap_r <= 1.0 + 1e-9
    # AP of any ranking is at least the prevalence achieved by chance
    assert r.ap_r >= r.prevalence_r * 0.5
    # p@k is NULL when fewer than k users exist (15 users at sf0.001)
    for v in (r.p_at_10_r, r.p_at_25_r):
        if v is not None:
            assert 0.0 <= v <= 1.0
    assert r.n_pos <= r.n_users


def test_elbow_wss_monotone(row):
    rows = row("a546_elbow_wss")
    wss = [r.wss_units for r in rows]
    assert [r.k for r in rows] == list(range(1, 9))
    # WSS is non-increasing in k for nested equal-width refinements?
    # Not guaranteed for arbitrary grids, but k=1 must dominate all.
    assert wss[0] == max(wss)
    assert all(w >= 0 for w in wss)
    # drop identity
    for i in range(1, len(rows)):
        assert rows[i].drop_units == wss[i - 1] - wss[i]


def test_hill_alpha_identity(row):
    rows = row("a079_hill_tail_index")
    assert [r.k for r in rows] == [50, 100, 200]
    for r in rows:
        assert r.hill_h_r > 0.0
        assert abs(r.alpha_r - 1.0 / r.hill_h_r) < 1e-3
        assert r.x_thresh > 0


def test_did_cell_identity(row):
    r = row("a080_diff_in_diff")[0]
    did = (r.mean_treat_post_r - r.mean_treat_pre_r) - (
        r.mean_ctrl_post_r - r.mean_ctrl_pre_r
    )
    assert abs(r.did_r - did) < 2e-5
    assert r.se_r > 0.0
    assert abs(r.t_r - r.did_r / r.se_r) < 1e-3


def test_iv_wald_consistency(row):
    r = row("a081_iv_wald_estimator")[0]
    # beta_iv = reduced form / first stage (Wald identity)
    assert abs(r.beta_iv_r - r.reduced_form_r / r.first_stage_r) < max(
        1e-3, abs(r.beta_iv_r) * 1e-3
    )


def test_oaxaca_gap_decomposition(row):
    r = row("a082_oaxaca_blinder")[0]
    assert abs(r.gap_r - (r.explained_r + r.unexplained_r)) < 2e-5


def test_weibull_fit_positive_scale(row):
    r = row("a083_weibull_plot_fit")[0]
    assert r.n_points >= 3
    assert r.scale_days_r > 0.0


def test_dbscan_grid_sane(row):
    rows = row("a084_dbscan_grid")
    assert rows, "at least one dense cluster must exist"
    for r in rows:
        assert r.n_cells >= 1
        assert r.n_points >= r.n_cells  # every core cell holds points
    sizes = [r.n_points for r in rows]
    assert sizes == sorted(sizes, reverse=True)


def test_gmm_em_sane(row):
    r = row("a085_gmm_em_1d")[0]
    assert 0.0 < r.pi1_r < 1.0
    assert 0.0 <= r.mu1_grid_r <= 511.0 and 0.0 <= r.mu2_grid_r <= 511.0
    assert r.sigma1_grid_r >= 0.5 - 1e-9  # sqrt of 0.25 floor
    assert r.sigma2_grid_r >= 0.5 - 1e-9
    # quartile init orders the components; EM keeps them ordered on
    # this unimodal-ish fixture
    assert r.mu1_grid_r < r.mu2_grid_r


def test_tost_identities(row):
    r = row("a086_tost_equivalence")[0]
    assert r.margin_dollars_r > 0.0
    # t_lower + t_upper = 2*delta/se > 0
    assert r.t_lower_r + r.t_upper_r > 0.0
    assert 0.0 <= r.p_lower_r <= 1.0 and 0.0 <= r.p_upper_r <= 1.0
    assert r.equivalent in (0, 1)


def test_hellinger_bounds(row):
    r = row("a087_hellinger_bhattacharyya")[0]
    assert 0.0 < r.bc_r <= 1.0 + 1e-6
    assert 0.0 <= r.hellinger_r <= 1.0
    assert r.bhattacharyya_dist_r >= -1e-6
    # H^2 = 1 - BC identity
    assert abs(r.hellinger_r ** 2 - (1.0 - r.bc_r)) < 2e-5


def test_negbin_moment_identities(row):
    r = row("a088_negbin_overdispersion")[0]
    assert abs(r.dispersion_r - r.var_r / r.mean_r) < 1e-4
    if r.var_r > r.mean_r:  # overdispersed -> valid NB MoM
        assert r.nb_r_r > 0.0
        assert 0.0 < r.nb_p_r < 1.0


def test_stratified_never_worse_much(row):
    r = row("a089_stratified_efficiency")[0]
    # proportional stratification variance <= SRS up to the fpc slack
    assert r.v_strat_r <= r.v_srs_r * 1.01
    assert r.efficiency_gain_r >= 0.99


def test_icc_deff_identity(row):
    r = row("a090_icc_design_effect")[0]
    assert -1.0 <= r.icc_r <= 1.0
    mbar = r.n_obs / r.n_clusters
    assert abs(r.deff_r - (1.0 + (mbar - 1.0) * r.icc_r)) < 1e-3
    assert r.msb_bn_r > 0.0 and r.msw_bn_r > 0.0


def test_elasticity_fixture_negative(row):
    r = row("a091_price_elasticity_within")[0]
    # both estimators exist and are finite; within FE uses all parts
    assert r.n_parts >= 1 and r.n_lines > r.n_parts
    assert r.elasticity_within_r is not None
    assert r.elasticity_pooled_r is not None


def test_source_overlap_bounds(row):
    rows = row("a092_source_overlap_matrix")
    assert len(rows) == 15
    for r in rows:
        assert 0.0 < r.jaccard_r <= 1.0
        assert r.jaccard_r <= r.containment_r + 1e-9
        assert r.inter <= min(r.size_a, r.size_b)
        assert r.src_a < r.src_b


def test_source_redundancy_bounds(row):
    rows = row("a093_source_redundancy_audit")
    assert len(rows) == 20  # fixed source catalog
    for r in rows:
        assert 0.0 <= r.redundancy_r < 1.0
        assert r.distinct_grams <= r.gram_instances
        assert r.grams_per_doc_r > 0.0


def test_morans_geary_relation(row):
    r = row("a094_morans_i_geary_c")[0]
    assert r.n_cells == 1600
    # positive spatial autocorrelation in a clumped customer grid
    assert r.morans_i_r > r.expected_i_r
    assert r.gearys_c_r < 1.0 + 1e-6
    assert -1.5 <= r.morans_i_r <= 1.5
    assert 0.0 <= r.gearys_c_r <= 3.0


def test_burrows_delta_nonneg_sorted(row):
    rows = row("a095_burrows_delta")
    assert len(rows) == 15
    vals = [r.delta_r for r in rows]
    assert vals == sorted(vals)
    for r in rows:
        assert r.delta_r >= 0.0
        assert r.n_words >= 10


def test_backfill_waves_ordered(row):
    rows = row("a096_backfill_planner")
    assert rows
    prev_last = None
    for r in rows:
        assert 1 <= r.n_partitions <= 10
        assert r.first_date <= r.max_date
        assert r.n_missing <= r.n_partitions
        if prev_last is not None:
            assert r.first_date > prev_last
        prev_last = r.max_date


def test_taylor_power_law_sane(row):
    r = row("a097_taylor_power_law")[0]
    assert r.n_groups >= 20
    assert 0.0 <= r.r2_r <= 1.0 + 1e-9
    # count data sits between Poisson (1) and strong clumping (2+ rare)
    assert 0.0 < r.taylor_b_r < 3.0


def test_ohlc_rsi_bounds(row):
    rows = row("a098_ohlc_technical")
    assert len(rows) == 24
    for r in rows:
        if r.rsi_r is not None:
            assert 0.0 <= r.rsi_r <= 100.0
        assert r.breach in (-1, 0, 1)
        if r.breach == 1:
            assert r.pct_b_r > 1.0 - 1e-6
        if r.breach == -1:
            assert r.pct_b_r < 1e-6


def test_ccf_symmetric_n_and_bounds(row):
    rows = row("a099_cross_correlation")
    assert [r.lag for r in rows] == list(range(-7, 8))
    by_lag = {r.lag: r for r in rows}
    for r in rows:
        assert -1.0 - 1e-9 <= r.ccf_r <= 1.0 + 1e-9
        # aligned-pair count is symmetric in the lag sign
        assert r.n == by_lag[-r.lag].n
    # revenue and order count on the same day are strongly coupled
    assert by_lag[0].ccf_r > 0.5


def test_jackknife_se_positive(row):
    r = row("a100_jackknife_se")[0]
    assert r.n_groups >= 20
    assert r.se_jack_r > 0.0
    # leave-one-out means average back near the full mean
    assert abs(r.theta_bar_r - r.mean_r) < r.mean_r * 0.01


def test_lognormal_fit_sane(row):
    r = row("a126_lognormal_fit_gof")[0]
    assert r.sigma_log_r > 0.0
    assert 0.0 <= r.ks_stat_r <= 1.0
    # implied lognormal mean should be within an order of magnitude of
    # the true mean of a positive distribution this fit targets
    assert r.implied_mean_r > 0.0


def test_abc_xyz_matrix_consistency(row, sf_dir):
    import duckdb

    rows = row("a127_abc_xyz_classification")
    n_parts = duckdb.connect().execute(
        f"SELECT count(DISTINCT l_partkey) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    assert sum(r.n_parts for r in rows) == n_parts
    assert abs(sum(r.rev_share_r for r in rows) - 1.0) < 1e-3
    a_share = sum(r.rev_share_r for r in rows if r.abc == "A")
    c_share = sum(r.rev_share_r for r in rows if r.abc == "C")
    assert a_share >= c_share  # A-class concentrates revenue


def test_newsvendor_quantile_dominates_mean(row):
    rows = row("a128_newsvendor_stock")
    assert len(rows) == 97
    for r in rows:
        # the 0.9 fractile of a nonnegative demand is >= ... its mean
        # only for right-skewed series; assert the weaker exact facts
        assert r.q90 >= 1
        assert r.mean_demand_r > 0.0
        assert abs(r.safety_stock_r - (r.q90 - r.mean_demand_r)) < 2e-6


def test_hubness_mean_is_k(row):
    r = row("a129_hubness_audit")[0]
    assert r.n_vectors == 256
    # every point emits exactly k = 10 neighbor votes
    assert abs(r.mean_occ_r - 10.0) < 1e-6
    assert r.var_occ_r >= 0.0
    assert r.max_occ >= 10
    assert 0 <= r.n_antihubs < r.n_vectors


def test_twonn_dim_sane(row):
    r = row("a130_twonn_intrinsic_dim")[0]
    assert r.n_points >= 200
    assert r.mean_ln_mu_r > 0.0
    # estimated intrinsic dim of a 64-d embedding must be positive
    # and cannot exceed the ambient dimension by much
    assert 0.5 <= r.intrinsic_dim_r <= 128.0


def test_lindley_waits_sane(row):
    r = row("a131_lindley_queue_replay")[0]
    assert r.mean_wait_s_r >= 0.0
    assert r.max_wait_s_r >= r.mean_wait_s_r
    assert 0.0 <= r.frac_waited_r <= 1.0
    assert r.utilization_r > 0.0
    assert r.n_busy_periods >= 1


def test_c_index_bounds(row):
    r = row("a132_harrell_c_index")[0]
    assert r.n_comparable > 0
    assert r.concordant + r.tied_pred <= r.n_comparable
    assert 0.0 <= r.c_index_r <= 1.0


def test_obf_boundaries_decrease(row):
    rows = row("a133_group_sequential_obf")
    assert [r.look_day for r in rows] == [6, 12, 18, 24, 30]
    bounds = [r.z_bound_r for r in rows]
    assert bounds == sorted(bounds, reverse=True)
    ns = [r.n_users for r in rows]
    assert ns == sorted(ns)  # looks accumulate users
    for r in rows:
        assert r.crossed in (0, 1)


def test_crps_nonneg(row):
    r = row("a134_crps_ensemble")[0]
    assert r.n_days > 0
    # CRPS of any forecast is nonnegative and bounded by max |X - y|
    assert 0.0 <= r.mean_crps_r <= r.max_crps_r + 1e-9


def test_winkler_dominates_width(row):
    r = row("a135_winkler_interval_score")[0]
    # score = width + penalties, so mean score >= mean width
    assert r.mean_winkler_r >= r.mean_width_r - 1e-6
    assert 0.0 <= r.coverage_r <= 1.0
    # an 80% interval from the same process should cover well
    assert r.coverage_r >= 0.4


def test_pit_bins_partition(row):
    rows = row("a136_pit_uniformity")
    assert sum(r.k for r in rows) > 0
    assert abs(sum(r.frac_r for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert 0 <= r.pit_bin <= 3
        assert r.chi2_term_r >= 0.0


def test_tail_dependence_bounds(row):
    r = row("a137_tail_dependence")[0]
    assert 0.0 <= r.lambda_upper_r <= 1.0
    assert 0.0 <= r.lambda_lower_r <= 1.0
    assert r.both_hi <= r.n // 20 + 1


def test_chatterjee_xi_bounds(row):
    r = row("a138_chatterjee_xi")[0]
    # xi in [-1/2 + O(1/n), 1]; for continuous-ish data it sits in
    # [-0.5, 1] with independence near 0
    assert -0.55 <= r.xi_r <= 1.0


def test_distance_correlation_bounds(row):
    r = row("a139_distance_correlation")[0]
    assert r.n_panel > 0
    assert r.dvarx_r > 0.0 and r.dvary_r > 0.0
    assert 0.0 <= r.dcor_r <= 1.0 + 1e-9
    # V-statistic dCov^2 is nonnegative up to rounding
    assert r.dcov2_r >= -1e-6


def test_price_index_fisher_between(row):
    r = row("a140_price_indexes")[0]
    assert r.n_parts > 0
    lo, hi = sorted([r.laspeyres_r, r.paasche_r])
    # Fisher is the geometric mean: strictly between L and P
    assert lo - 1e-6 <= r.fisher_r <= hi + 1e-6
    for v in (r.laspeyres_r, r.paasche_r, r.fisher_r, r.tornqvist_r):
        assert v > 0.0
    # Tornqvist is superlative too: close to Fisher on matched baskets
    assert abs(r.tornqvist_r - r.fisher_r) < 0.25


def test_arch_lm_nonneg(row):
    r = row("a141_arch_lm_test")[0]
    assert r.n_obs > 100
    assert -1e-6 <= r.r2_r <= 1.0
    assert r.arch_lm_r >= -1e-4


def test_risk_panel_identities(row):
    r = row("a142_risk_metrics_panel")[0]
    assert r.ann_vol_r > 0.0
    # Sortino >= Sharpe iff downside semidev <= full sd; both finite
    assert abs(r.sharpe_r) < 1e6 and abs(r.sortino_r) < 1e6
    assert 0.0 <= r.max_drawdown_r < 1.0
    # CVaR95 is at least as extreme (negative) as VaR95
    assert r.cvar95_r <= r.var95_r + 1e-6
    assert r.var95_r <= 0.0 + 1e-6 or r.omega0_r > 1.0
    assert r.omega0_r > 0.0


def test_seasonal_mk_sane(row):
    r = row("a143_seasonal_mann_kendall")[0]
    assert r.n_seasons == 7
    assert r.var_tot_r > 0.0
    # z is finite and the continuity correction shrinks |S| by 1
    assert abs(r.z_r) < 50.0


def test_gesd_rounds_structure(row):
    rows = row("a144_generalized_esd")
    assert [r.round_i for r in rows] == [1, 2, 3]
    dates = [r.outlier_date for r in rows]
    assert len(set(dates)) == 3  # removes a DIFFERENT point each round
    for r in rows:
        assert r.r_stat_r > 0.0
        assert r.lambda_r > 2.0  # Rosner critical values at alpha=.05
        assert r.is_outlier in (0, 1)
    # inward ordering: once a round fails to reject, its R is below
    # lambda; R_1 is the global max studentized deviation
    assert rows[0].r_stat_r >= rows[1].r_stat_r - 5.0


def test_shapley_efficiency(row, spark, sf_dir):
    rows = row("a145_shapley_attribution")
    assert sorted(r.channel for r in rows) == [
        "click", "error", "signup", "view",
    ]
    total = sum(r.shapley_r for r in rows)
    # efficiency: sum of Shapley values = v(full) - v(empty).
    # v(full) = global conversion rate; v(empty) = rate among users
    # below EVERY channel median (0 if none). Recompute v(full):
    import duckdb

    full_rate, empty_rate = duckdb.connect().execute(
        f"""WITH u AS (
          SELECT user_id,
            SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) c0,
            SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) c1,
            SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) c2,
            SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) c3,
            CASE WHEN SUM(CASE WHEN event_type='purchase' THEN 1
                          ELSE 0 END) >= 14 THEN 1 ELSE 0 END conv
          FROM '{sf_dir}/events.parquet' GROUP BY user_id),
        med AS (SELECT median(c0) m0, median(c1) m1, median(c2) m2,
                       median(c3) m3 FROM u)
        SELECT
          (SELECT avg(conv) FROM u),
          COALESCE((SELECT avg(conv) FROM u CROSS JOIN med
            WHERE c0 < m0 AND c1 < m1 AND c2 < m2 AND c3 < m3), 0)
        """
    ).fetchone()
    # duckdb median interpolates; engine uses lower integer fractile —
    # allow a loose tolerance on the efficiency identity
    assert abs(total - (full_rate - empty_rate)) < 0.35
    for r in rows:
        assert -1.0 <= r.shapley_r <= 1.0
