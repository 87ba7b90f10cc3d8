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
    r = row("a004_cliffs_delta")[0]
    assert -1.0 <= r.cliffs_delta_r <= 1.0
    assert 0.0 <= r.vda_r <= 1.0
    # Â = (δ+1)/2 exactly (tie mass splits evenly)
    assert abs(r.vda_r - (r.cliffs_delta_r + 1.0) / 2.0) < 2e-6
    assert r.gt_pairs + r.lt_pairs + r.tie_pairs == r.n1 * r.n2


def test_fisher_tails_overlap_at_observed(row):
    r = row("a009_fisher_exact")[0]
    # left and right tails both include P(K = a_obs), so they sum > 1
    assert r.p_left_r + r.p_right_r >= 1.0 - 1e-5
    assert 0.0 <= r.p_left_r <= 1.0 + 1e-9
    assert 0.0 <= r.p_right_r <= 1.0 + 1e-9


def test_pacf_lag1_equals_acf1(row):
    r = row("a015_pacf")[0]
    assert r.pacf1_r == r.acf1_r
    for v in (r.pacf1_r, r.pacf2_r, r.pacf3_r, r.pacf4_r, r.pacf5_r):
        assert -1.0 <= v <= 1.0


def test_periodogram_power_nonnegative(row):
    rows = row("a016_goertzel_periodogram")
    assert [r.period_days for r in rows] == [7, 14, 30]
    for r in rows:
        assert r.power_r >= 0.0


def test_permutation_entropy_normalized(row):
    r = row("a017_permutation_entropy")[0]
    assert 0.0 <= r.h_norm_r <= 1.0 + 1e-9
    assert 1 <= r.n_patterns <= 6


def test_cronbach_alpha_upper_bound(row):
    r = row("a018_cronbach_alpha")[0]
    # alpha <= 1 always; item variances positive on this fixture
    assert r.alpha_r <= 1.0 + 1e-9
    assert r.item_var_num > 0 and r.total_var_num > 0


def test_ece_bounds(row):
    r = row("a019_ece_calibration")[0]
    assert 0.0 <= r.ece_r <= 1.0
    assert 1 <= r.n_bins <= 10
    assert r.hl_chi2_r >= 0.0


def test_nelson_aalen_monotone_pieces(row):
    r = row("a020_nelson_aalen_rmst")[0]
    assert r.h_final_r >= 0.0
    # RMST(90) is an average of a [0,1] survival curve over <=90 days
    assert 0.0 <= r.rmst90_r <= 90.0 + 1e-9
    assert r.n_event_times <= r.n_subjects


def test_yuen_h_le_n(row):
    r = row("a021_yuen_trimmed_t")[0]
    assert r.h_urgent <= r.n_urgent and r.h_low <= r.n_low
    # 20% trim leaves at least 60% of each group
    assert r.h_urgent >= 0.6 * r.n_urgent - 1
    assert r.df_r <= r.h_urgent + r.h_low - 2 + 1e-6


def test_hodges_lehmann_pairs(row):
    r = row("a022_hodges_lehmann")[0]
    assert r.n_pairs == r.n_purchase * r.n_view


def test_ari_upper_bound(row):
    r = row("a023_adjusted_rand")[0]
    assert r.ari_r <= 1.0 + 1e-9
    assert r.s_index <= min(r.s_a, r.s_b)


def test_davies_bouldin_positive(row):
    r = row("a024_davies_bouldin_ch")[0]
    assert r.db_index_r > 0.0
    assert r.ch_index_r > 0.0


def test_hits_l1_normalized(row):
    rows = row("a025_hits")
    assert len(rows) == 5
    # floor-div renormalization keeps each L1 sum within 5 fp units of 1
    assert abs(sum(r.hub_r for r in rows) - 1.0) < 1e-5
    assert abs(sum(r.auth_r for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert r.hub_r >= 0.0 and r.auth_r >= 0.0


def test_rich_club_monotone_support(row):
    rows = row("a026_rich_club")
    # rich-node counts shrink as the threshold rises
    ns = [r.n_rich for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        if r.phi_r is not None:
            assert 0.0 <= r.phi_r <= 1.0 + 1e-9


def test_yules_k_spectrum_identity(row):
    r = row("a027_yules_k")[0]
    assert r.v_types <= r.n_tokens
    assert r.s2 >= r.n_tokens  # sum m^2 >= sum m
    assert r.yules_k_r >= 0.0


def test_dersimonian_laird_tau_nonneg(row):
    r = row("a028_dersimonian_laird")[0]
    assert r.tau2_r >= 0.0
    assert r.q_r >= 0.0
    assert abs(math.log(r.pooled_or_r) - r.pooled_lor_r) < 1e-4


def test_weighted_reservoir_size(row):
    r = row("a029_weighted_reservoir")[0]
    assert r.k_sampled == 100
    assert r.n_sources >= 1


def test_absorbing_steps_at_least_one(row):
    rows = row("a030_absorbing_markov")
    assert len(rows) == 4
    for r in rows:
        # at least one step to absorb from any transient state
        assert r.exp_steps_r >= 1.0


def test_erlang_c_dominates_b(row):
    r = row("a031_erlang_c")[0]
    assert 0.0 <= r.erlang_b8_r <= 1.0
    if r.erlang_c8_r is not None:
        # Erlang C (wait) >= Erlang B (block) at the same c
        assert r.erlang_c8_r >= r.erlang_b8_r - 1e-6


def test_decay_deciles_monotone(row):
    rows = row("a032_decay_weighted_engagement")
    avgs = [r.avg_decayed_dollars_r for r in rows]
    assert avgs == sorted(avgs)
    assert all(r.n_users > 0 for r in rows)


def test_intersect_except_counts(row):
    r = row("a033_intersect_except")[0]
    # bag counts dominate set counts; EXCEPT ALL >= EXCEPT
    assert r.n_intersect_all >= r.n_intersect
    assert r.n_except_all >= r.n_except


def test_page_l_range(row):
    r = row("a034_page_trend")[0]
    # doubled L is between n*k(k+1)/1... loose sanity: positive, bounded
    assert 12 * r.n_users <= r.l2_stat <= 36 * r.n_users


def test_quade_f_nonneg(row):
    r = row("a035_quade_test")[0]
    assert r.f_quade_r >= 0.0


def test_cox_stuart_p_range(row):
    r = row("a036_cox_stuart")[0]
    assert 0.0 <= r.p_two_sided_r <= 1.0


def test_kpss_nonneg(row):
    r = row("a037_kpss")[0]
    assert r.kpss_eta_r >= 0.0


def test_brunner_munzel_p_hat_range(row):
    r = row("a043_brunner_munzel")[0]
    assert 0.0 <= r.p_hat_r <= 1.0


def test_bowker_df_bound(row):
    r = row("a045_bowker_symmetry")[0]
    assert 0 <= r.df_used <= 10  # C(5,2) unordered pairs
    assert r.chi2_bowker_r >= 0.0


def test_stuart_maxwell_margins_sum_zero(row):
    r = row("a046_stuart_maxwell")[0]
    assert r.d_purchase + r.d_click + r.d_other == 0


def test_ad_ksample_shape(row):
    r = row("a047_anderson_darling_ksample")[0]
    assert r.k_groups == 5
    assert r.a2_akn_r is not None


def test_theil_u_consistency(row):
    r = row("a048_theil_u2")[0]
    assert r.theil_u2_r >= 0.0
    assert 0.0 <= r.theil_u1_r <= 1.0 + 1e-9
    assert (r.verdict == "seasonal_beats_naive") == (r.theil_u2_r < 1.0)


def test_somers_gamma_bounds(row):
    r = row("a005_somers_gamma")[0]
    assert -1.0 <= r.gamma_r <= 1.0
    # |gamma| >= |somers' d| always (gamma drops ties from the denom)
    assert abs(r.gamma_r) >= abs(r.somers_dxy_r) - 1e-6
    assert abs(r.gamma_r) >= abs(r.somers_dyx_r) - 1e-6


def test_bartlett_nonneg(row):
    r = row("a007_bartlett_test")[0]
    assert r.bartlett_chi2_r >= 0.0


def test_g_test_nonneg(row):
    r = row("a010_g_test")[0]
    assert r.g_stat_r >= 0.0


def test_durbin_watson_range_and_identity(row):
    r = row("a011_durbin_watson")[0]
    assert 0.0 <= r.dw_r <= 4.0
    # rho1 = 1 - DW/2 by construction
    assert abs(r.rho1_r - (1.0 - r.dw_r / 2.0)) < 2e-6


def test_breusch_pagan_nonneg(row):
    r = row("a012_breusch_pagan")[0]
    assert r.bp_lm_r >= 0.0


def test_chow_f_nonneg(row):
    r = row("a013_chow_test")[0]
    assert r.f_chow_r >= 0.0


def test_vif_at_least_one(row):
    r = row("a014_vif")[0]
    # VIF = 1/(1-R^2) >= 1 for any real predictor set
    for v in (r.vif_quantity_r, r.vif_discount_r, r.vif_tax_r):
        assert v >= 1.0 - 1e-6
    for c in (r.r12_r, r.r13_r, r.r23_r):
        assert -1.0 <= c <= 1.0


def test_adf_outputs_finite(row):
    r = row("a038_adf")[0]
    # the AR coefficient rho on differences sits in (-2, 1) for any
    # real series; the t ratio must agree in sign with rho
    assert -2.0 < r.rho_r < 1.0
    assert (r.adf_t_r < 0) == (r.rho_r < 0)


def test_granger_f_nonneg(row):
    r = row("a039_granger_causality")[0]
    # restricted SSE >= unrestricted SSE, so F >= 0 up to rounding
    assert r.f_granger_r >= -1e-6


def test_breusch_godfrey_lm_bounds(row):
    r = row("a040_breusch_godfrey")[0]
    # LM = n*R^2 with R^2 in [0,1]
    assert -1e-6 <= r.lm_bg_r <= r.n_obs + 1e-6
    assert -1.0 <= r.rho_resid_r <= 1.0


def test_white_r2_bounds(row):
    r = row("a041_white_test")[0]
    assert -1e-6 <= r.r2_aux_r <= 1.0 + 1e-6
    assert abs(r.lm_white_r - r.n_obs * r.r2_aux_r) < 2e-4


def test_lilliefors_d_range(row):
    r = row("a042_lilliefors")[0]
    assert 0.0 <= r.d_stat_r <= 1.0


def test_conover_t_bounds(row):
    r = row("a044_conover_squared_ranks")[0]
    # normalized squared ranks are <= 1 each, so T <= n1
    assert 0.0 <= r.t_norm_r <= r.n_urgent + 1e-6


def test_kendalls_w_range(row):
    r = row("a049_kendalls_w")[0]
    assert 0.0 <= r.w_r <= 1.0 + 1e-9
    # chi2 = m (n-1) W identity
    assert abs(r.chi2_r - r.n_raters * 4.0 * r.w_r) < 2e-4


def test_gk_lambda_bounds(row):
    r = row("a050_goodman_kruskal_lambda")[0]
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
    r = row("a051_uncertainty_coefficient")[0]
    assert r.mi_nats_r >= -1e-6
    for v in (
        r.u_lang_given_source_r,
        r.u_source_given_lang_r,
        r.u_symmetric_r,
    ):
        assert -1e-6 <= v <= 1.0 + 1e-6


def test_cvm_nonneg(row):
    r = row("a052_cramer_von_mises")[0]
    assert r.cvm_t_r >= 0.0


def test_ansari_bradley_score_bounds(row):
    r = row("a053_ansari_bradley")[0]
    nn = r.n_urgent + r.n_low
    # AB sums n1 scores, each in [1, (N+1)/2]
    assert r.n_urgent <= r.ab_stat_r <= r.n_urgent * (nn + 1) / 2.0


def test_map_mrr_dominance(row):
    r = row("a054_map_mrr")[0]
    assert 0.0 <= r.map100_r <= 1.0 + 1e-9
    assert 0.0 <= r.mrr_r <= 1.0 + 1e-9
    # MRR scores only the first hit at full credit, so MRR >= MAP
    assert r.mrr_r >= r.map100_r - 1e-6
    assert r.n_with_relevant <= r.n_queries


def test_rbo_bounds(row):
    r = row("a055_rank_biased_overlap")[0]
    assert 0.0 <= r.rbo_r <= 1.0 + 1e-9
    assert 0 <= r.overlap_at_depth <= r.depth


def test_weighted_kappa_bounds(row):
    r = row("a056_weighted_kappa")[0]
    for v in (r.kappa_quadratic_r, r.kappa_linear_r):
        assert -1.0 - 1e-9 <= v <= 1.0 + 1e-9


def test_matthews_panel_consistency(row):
    r = row("a057_matthews_corrcoef")[0]
    if r.mcc_r is not None:
        assert -1.0 <= r.mcc_r <= 1.0
    if r.f1_r is not None:
        assert 0.0 <= r.f1_r <= 1.0
    if r.balanced_acc_r is not None and r.youden_j_r is not None:
        # J = 2*BA - 1 identity
        assert abs(r.youden_j_r - (2.0 * r.balanced_acc_r - 1.0)) < 2e-6


def test_bland_altman_loa_order(row):
    r = row("a058_bland_altman")[0]
    assert r.loa_lower_r <= r.bias_dollars_r <= r.loa_upper_r
    # ~5% outside the 95% limits for any roughly symmetric distribution
    assert 0.0 <= r.frac_outside_r <= 0.25
