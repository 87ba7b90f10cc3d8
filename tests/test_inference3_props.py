"""Textbook-invariant property checks for the round-8 battery
(grouper_spark/queries/inference3.py).

Same contract as test_inference_props.py: the parity gate proves
Spark == DuckDB but cannot catch a formula BOTH sides encode wrong —
these pin each estimator to facts that hold for the statistic itself
(bounds, identities, dominance, normalization). Each query runs once
at sf0.001 on the shared session; all outputs are summary-sized."""

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


def test_diebold_mariano_mean_consistency(row):
    r = row("a146_diebold_mariano")[0]
    # DM statistic and mean loss differential must share their sign
    assert r["n"] > 0
    if r["mean_loss_diff_r"] != 0:
        assert (r["dm_stat_r"] > 0) == (r["mean_loss_diff_r"] > 0)


def test_gpd_pwm_internal_consistency(row):
    r = row("a147_gpd_pwm_tail")[0]
    # ~10% of orders exceed the P90 threshold; mean excess positive;
    # for a finite-mean fit, sigma must be positive
    assert r["n_exceedances"] > 0
    assert r["mean_excess_r"] > 0
    assert r["gpd_sigma_r"] > 0


def test_hampel_bounds(row):
    r = row("a148_hampel_filter")[0]
    assert 0 <= r["n_flagged"] <= r["n_days"]
    if r["n_flagged"] > 0:
        assert r["first_flag_date"] <= r["last_flag_date"]
        assert r["max_flag_dev_dollars"] > 0


def test_boxcox_exactly_one_best(row):
    rs = row("a149_boxcox_grid")
    assert len(rs) == 4
    assert sum(r["is_best"] for r in rs) >= 1
    # all lambdas see the same histogram mass
    assert len({r["n"] for r in rs}) == 1


def test_neyman_allocation_sums_to_1000(row):
    rs = row("a150_neyman_allocation")
    assert len(rs) == 5
    assert sum(r["n_alloc"] for r in rs) == 1000
    for r in rs:
        assert r["stratum_sd_r"] > 0


def test_err_bounds(row):
    rs = row("a151_expected_reciprocal_rank")
    assert len(rs) == 25
    for r in rs:
        # ERR is a probability-weighted reciprocal rank: (0, 1]
        assert 0.0 <= r["err_r"] <= 1.0


def test_rbp_bounds_and_monotonicity(row):
    rs = row("a152_rank_biased_precision")
    for r in rs:
        # RBP@10 with p=0.8 is bounded by (1-p) * sum p^k < 1 - p^10
        assert 0.0 <= r["rbp_r"] <= 1.0 - 0.8 ** 10 + 1e-9
        assert 0 <= r["n_rel"] <= 10


def test_interarrival_order_stats(row):
    rs = row("a153_interarrival_reliability")
    assert len(rs) > 0
    for r in rs:
        assert 0 <= r["p50_us"] <= r["p90_us"]
        assert r["mtbe_us"] > 0


def test_fellegi_sunter_weight_signs(row):
    rs = row("a154_fellegi_sunter")
    assert len(rs) == 3
    for r in rs:
        assert 0.0 <= r["m_r"] <= 1.0 and 0.0 <= r["u_r"] <= 1.0
        # agreement weight positive iff m > u, and then disagreement
        # weight must be negative (log-odds see-saw)
        if r["m_r"] > r["u_r"]:
            assert r["agree_weight_r"] > 0 > r["disagree_weight_r"]


def test_spectral_entropy_normalized(row):
    r = row("a155_spectral_entropy")[0]
    assert 0.0 <= r["spectral_entropy_r"] <= 1.0 + 1e-9
    assert 0.0 <= r["dominant_share_r"] <= 1.0
    assert r["n_periods"] == 12


def test_kuiper_bounds(row):
    r = row("a156_kuiper_test")[0]
    # V = D+ + D- is in [0, 2]; p in [0, ~2] by the 2-term series,
    # clamp check loose
    assert 0.0 <= r["kuiper_v_r"] <= 2.0
    assert r["p_approx_r"] >= -1e-6


def test_cucconi_nonnegative(row):
    r = row("a157_cucconi_test")[0]
    # C is a positive-definite quadratic form
    assert r["cucconi_c_r"] >= 0.0
    assert 0.0 <= r["p_approx_r"] <= 1.0


def test_mood_positive_m(row):
    r = row("a158_mood_squared_ranks")[0]
    assert r["mood_m_r"] > 0.0
    assert r["n1"] > 0 and r["n2"] > 0


def test_dagostino_k2_identity(row):
    r = row("a159_dagostino_k2")[0]
    assert r["k2_r"] >= 0.0
    tol = 1e-5 * (1.0 + abs(r["skew_z_r"]) + abs(r["kurt_z_r"]))
    assert abs(
        r["k2_r"] - (r["skew_z_r"] ** 2 + r["kurt_z_r"] ** 2)
    ) < tol


def test_theta_forecast_trend_consistency(row):
    rs = row("a160_theta_forecast")
    assert len(rs) == 5
    for r in rs:
        # 14-step vs 1-step forecast differ by exactly 6.5*b (the
        # 0.5-weighted trend extrapolation: 0.5*b*13)
        assert abs(
            (r["forecast_14_r"] - r["forecast_1_r"])
            - 6.5 * r["trend_slope_r"]
        ) < 1e-3


def test_apriori_support_ordering(row):
    rs = row("a161_apriori_triples")
    assert len(rs) > 0
    sups = [r["support"] for r in rs]
    assert sups == sorted(sups, reverse=True)
    for r in rs:
        assert 0 <= r["cat_a"] < r["cat_b"] < r["cat_c"] < 32


def test_eoq_panel_positive(row):
    rs = row("a162_eoq_safety_stock")
    assert len(rs) == 25
    for r in rs:
        assert r["eoq_r"] > 0 and r["safety_stock_r"] >= 0
        # reorder point decomposes into lead-time demand + safety
        assert abs(
            r["reorder_point_r"]
            - (7.0 * r["d_daily_r"] + r["safety_stock_r"])
        ) < 2e-5


def test_kelly_fraction_identity(row):
    rs = row("a163_kelly_criterion")
    assert len(rs) == 5
    for r in rs:
        assert 0.0 < r["win_prob_r"] < 1.0
        assert r["payoff_ratio_r"] > 0
        f = r["win_prob_r"] - (1.0 - r["win_prob_r"]) / r["payoff_ratio_r"]
        assert abs(f - r["kelly_fraction_r"]) < 2e-6


def test_sttr_bounds(row):
    rs = row("a164_sttr_text_richness")
    assert len(rs) > 0
    for r in rs:
        # each 20-token block has between 1 and 20 types
        assert 1.0 / 20.0 <= r["sttr_r"] <= 1.0
        assert r["n_blocks"] >= 2


def test_dunn_antisymmetric_pairs(row):
    rs = row("a165_dunn_posthoc")
    assert len(rs) == 10
    for r in rs:
        assert r["significant_bonf"] in (0, 1)
        assert (abs(r["dunn_z_r"]) > 2.8070337683438042) == bool(
            r["significant_bonf"]
        )


def test_mmd_kernel_expectations(row):
    r = row("a166_mmd_poly")[0]
    # polynomial kernel with even degree: E[k] >= 0 blocks; MMD^2 of
    # the biased/unbiased mix can be slightly negative only through
    # the U-statistic correction — allow tiny slack
    assert r["e_kxx_r"] > 0 and r["e_kyy_r"] > 0
    assert r["mmd2_r"] >= -1e-3


def test_lorenz_asymmetry_range(row):
    rs = row("a167_lorenz_asymmetry")
    assert len(rs) == 5
    for r in rs:
        assert 0.0 <= r["f_mu_r"] <= 1.0
        assert 0.0 <= r["l_mu_r"] <= 1.0
        # L(mu) <= F(mu): the below-mean mass holds less than its
        # population share of revenue by definition of the mean
        assert r["l_mu_r"] <= r["f_mu_r"] + 1e-9


def test_bootstrap_se_positive_and_small(row):
    r = row("a168_hash_bootstrap_se")[0]
    assert r["boot_se_r"] > 0
    # SE of a mean over n users is far below the mean itself here
    assert r["boot_se_r"] < r["mean_r"]


def test_growth_accounting_flow_identity(row):
    rs = row("a169_growth_accounting")
    assert len(rs) > 0
    for r in rs:
        assert (
            r["active_u"]
            == r["new_u"] + r["retained_u"] + r["resurrected_u"]
        )
        assert r["churned_u"] >= 0


def test_approx_percentile_guarantee_holds(row):
    rs = row("a170_approx_percentile_audit")
    assert len(rs) == 3
    cents = None
    for r in rs:
        assert r["sketch_within_bound"] == 1
        if cents is not None:
            assert r["exact_cents"] >= cents  # quantiles monotone in q
        cents = r["exact_cents"]


def test_ks_two_sample_bounds(row):
    r = row("a171_ks_two_sample")[0]
    assert 0.0 <= r["ks_d_r"] <= 1.0
    assert -1e-6 <= r["p_approx_r"] <= 1.0 + 1e-6


def test_logistic_irls_sane(row):
    r = row("a172_logistic_irls")[0]
    assert 0 < r["n_pos"] < r["n_users"]
    # odds ratio must equal exp(coef) and share the coefficient's
    # direction
    assert abs(r["odds_ratio_r"] - round(math.exp(r["coef_r"]), 6)) < 1e-5
    assert (r["odds_ratio_r"] > 1.0) == (r["coef_r"] > 0)


def test_cox_ph_hazard_ratio_identity(row):
    r = row("a173_cox_ph")[0]
    assert r["n_users"] > 0
    assert abs(
        r["hazard_ratio_r"] - round(math.exp(r["beta_r"]), 6)
    ) < 1e-5
    assert r["hazard_ratio_r"] > 0
