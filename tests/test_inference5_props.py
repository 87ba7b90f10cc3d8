"""Textbook-invariant property checks for the round-10 battery
(grouper_spark/queries/inference5.py, a208-a231).

Same contract as test_inference4_props.py: the parity gate proves
Spark == DuckDB but cannot catch a formula BOTH sides encode wrong --
these pin each estimator/audit to facts that hold for the statistic
itself (bounds, identities, conservation, independent recomputation).
Each query runs once at sf0.001 on the shared session; all outputs are
summary-sized."""

from __future__ import annotations

import math
import statistics

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


@pytest.fixture(scope="module")
def daily(spark, sf_dir):
    from grouper_spark.queries.inference4 import _dailyv

    rows = _dailyv(spark, sf_dir).orderBy("d").collect()
    return [(r["d"], r["v"], r["y"]) for r in rows]


def test_siegel_recompute(row, daily):
    # Full independent recomputation of the repeated-median line.
    r = row("a208_siegel_repeated_medians")[0]
    v = [x[1] for x in daily]
    n = len(v)
    assert r["n"] == n
    meds = []
    for i in range(n):
        slopes = [(v[j] - v[i]) / (j - i) for j in range(n) if j != i]
        meds.append(statistics.median(slopes))
    b = statistics.median(meds)
    a = statistics.median(v[i] - b * (i + 1) for i in range(n))
    assert abs(r["slope_r"] - b) < 1e-5
    assert abs(r["intercept_r"] - a) < 1e-4


def test_loess_grid_recompute(row, daily):
    rs = row("a209_loess_grid")
    v = [x[1] for x in daily]
    n = len(v)
    assert len(rs) == 24
    h = max(1, n // 4)
    vmin, vmax = min(v), max(v)
    for r in rs:
        assert r["n"] == n and r["h"] == h
        # a weighted local fit cannot leave the data range
        assert vmin - 1 <= r["fit_r"] <= vmax + 1
    # exact recompute of the middle eval point
    r = rs[12]
    tg = r["tg"]
    s0 = s1 = s2 = t0 = t1 = 0
    for j in range(n):
        t = j + 1
        dt = abs(t - tg)
        if dt > h:
            continue
        q = ((h**3 - dt**3) * 100) // h**3
        w = q**3
        u = t - tg
        s0 += w
        s1 += w * u
        s2 += w * u * u
        t0 += w * v[j]
        t1 += w * u * v[j]
    fit = (s2 * t0 - s1 * t1) / (s0 * s2 - s1 * s1)
    assert abs(r["fit_r"] - fit) < 1e-5


def test_kde_density_integrates(row):
    rs = row("a210_kde_epanechnikov")
    assert len(rs) == 32
    assert all(r["f_nano"] >= 0 for r in rs)
    # Riemann sum of the density over the grid should be near 1
    # (coarse 32-point grid + edge truncation => generous band).
    step = rs[1]["xg"] - rs[0]["xg"]
    total = sum(r["f_nano"] for r in rs) * step / 1e9
    assert 0.4 < total < 1.6


def test_capability_orderings(row):
    r = row("a211_process_capability")[0]
    assert r["lsl"] < r["usl"]
    assert r["lsl"] <= r["mu_r"] <= r["usl"]
    assert r["sigma_within_r"] > 0 and r["sigma_overall_r"] > 0
    # Cpk/Ppk account for centering, so they never exceed Cp/Pp.
    assert r["cpk_r"] <= r["cp_r"] + 1e-9
    assert r["ppk_r"] <= r["pp_r"] + 1e-9


def test_standardization_bounds(row):
    rs = row("a212_rate_standardization")
    assert len(rs) >= 5
    for r in rs:
        assert 0 <= r["crude_ppm"] <= 1_000_000
        assert 0 <= r["direct_ppm"] <= 1_000_000
        assert r["smr_r"] > 0


def test_james_stein_shrinks_toward_grand_mean(row):
    rs = row("a213_james_stein")
    for r in rs:
        assert 0.0 <= r["shrink_r"] <= 1.0
        lo = min(r["mean_unit"], r["grand_unit"])
        hi = max(r["mean_unit"], r["grand_unit"])
        assert lo - 1e-6 <= r["js_r"] <= hi + 1e-6


def test_event_study_market_identities(row):
    # Segments partition the market, so betas sum to 1, alphas to 0,
    # and the CARs cancel exactly.
    rs = row("a214_event_study_car")
    assert len(rs) == 5
    assert abs(sum(r["beta_r"] for r in rs) - 1.0) < 1e-4
    assert abs(sum(r["alpha_r"] for r in rs)) < 1e-3
    assert abs(sum(r["car_r"] for r in rs)) < 1e-2


def test_hinge_trend_identities(row):
    r = row("a215_hinge_trend")[0]
    assert abs(
        r["slope_pre_r"] + r["slope_change_r"] - r["slope_post_r"]
    ) < 2e-6
    assert 0.0 <= r["r2_r"] <= 1.0
    assert 0 < r["k"] < r["n"]


def test_twin_alignment_histogram(row):
    rs = row("a216_twin_alignment_audit")
    assert len(rs) == 16
    r0 = rs[0]
    assert r0["n_panel"] == 256
    assert r0["n_pairs"] == 256 * 255 // 2
    assert sum(r["n_in_bin"] for r in rs) == r0["n_pairs"]
    # planted twins sit at cosine >= ~0.996 => milli-fixed d2 well
    # inside the first histogram bin width (250000)
    assert 0 <= r0["alignment_md2"] < 250_000
    assert r0["uniformity_proxy"] >= 0


def test_ams_f2_bounds(row):
    r = row("a217_ams_f2_sketch")[0]
    assert r["n_vocab"] <= r["n_tokens"]
    assert r["n_tokens"] <= r["f2"] <= r["n_tokens"] ** 2
    assert r["est16"] >= 0
    # 16-estimator mean has sd ~ sqrt(2/16)*F2; allow a wide 4-sigma.
    assert r["rel_err_r"] < 2.0


def test_rendezvous_remap_identity(row):
    rs = row("a218_rendezvous_hashing")
    assert len(rs) == 8
    n = sum(r["n_docs"] for r in rs)
    assert n > 0
    node0 = next(r for r in rs if r["node"] == 0)
    # removing node 0 remaps EXACTLY node 0's residents
    assert node0["hrw_remap_ppm"] == node0["share_ppm"]
    # mod-N rehash remaps almost everything
    assert node0["mod_remap_ppm"] > 500_000
    for r in rs:
        assert 40_000 <= r["share_ppm"] <= 300_000


def test_l_diversity_bounds(row):
    rs = row("a219_l_diversity_tcloseness")
    for r in rs:
        assert 1 <= r["l_distinct"] <= 5
        assert r["k"] >= r["l_distinct"]
        assert -1e-9 <= r["entropy_r"] <= math.log(5) + 1e-6
        assert 0 <= r["t_micro"] <= 1_000_000
        assert r["l3_ok"] == (1 if r["l_distinct"] >= 3 else 0)


def test_dedup_scaling_nested(row):
    rs = sorted(row("a220_dedup_scaling_curve"), key=lambda r: r["subset_16ths"])
    assert [r["subset_16ths"] for r in rs] == [1, 2, 4, 8, 16]
    for i in range(1, 5):
        # nested subsets: docs, distincts and duplicates all grow
        assert rs[i]["n_docs"] >= rs[i - 1]["n_docs"]
        assert rs[i]["n_distinct"] >= rs[i - 1]["n_distinct"]
        assert rs[i]["dups"] >= rs[i - 1]["dups"]
    for r in rs:
        assert r["n_distinct"] <= r["n_docs"]
        assert r["dups"] == r["n_docs"] - r["n_distinct"]


def test_chain_ladder_reserves(row):
    rs = row("a221_chain_ladder")
    assert len(rs) == 12
    for r in rs:
        # cumulative paid only grows, so factors >= 1 and reserve >= 0
        assert r["reserve_cents"] >= 0
        assert r["ultimate_cents"] >= r["latest_cents"]
        assert r["dlast"] <= min(5, 11 - r["origin"])


def test_bullwhip_ratio_consistent(row):
    r = row("a222_bullwhip_effect")[0]
    assert r["cv2_demand_r"] > 0 and r["cv2_ship_r"] > 0
    assert abs(
        r["bullwhip_r"] - r["cv2_ship_r"] / r["cv2_demand_r"]
    ) < 1e-4


def test_spt_minimizes_total_flow(row):
    rs = {r["rule"]: r for r in row("a223_dispatch_rules")}
    assert set(rs) == {"fifo", "spt", "edd"}
    n = {r["n_jobs"] for r in rs.values()}
    assert len(n) == 1
    # the classic exchange-argument theorem: SPT minimizes total flow
    assert rs["spt"]["total_flow"] <= rs["fifo"]["total_flow"]
    assert rs["spt"]["total_flow"] <= rs["edd"]["total_flow"]
    for r in rs.values():
        assert 0 <= r["n_tardy"] <= r["n_jobs"]
        assert r["total_tardiness"] >= 0


def test_skill_scores_recompute(row):
    r = row("a224_heidke_peirce_skill")[0]
    tp, fp, fn, tn = r["tp"], r["fp"], r["fn"], r["tn"]
    hss = 2 * (tp * tn - fp * fn) / (
        (tp + fn) * (fn + tn) + (tp + fp) * (fp + tn)
    )
    pss = (tp * tn - fp * fn) / ((tp + fn) * (fp + tn))
    assert abs(r["hss_r"] - hss) < 1e-6
    assert abs(r["pss_r"] - pss) < 1e-6
    assert -1 <= r["hss_r"] <= 1 and -1 <= r["pss_r"] <= 1
    assert 0 <= r["balanced_acc_r"] <= 1


def test_mg1_consistency(row):
    r = row("a225_mg1_pollaczek")[0]
    assert abs(r["rho_r"] - r["lambda_r"] * r["es_r"]) < 1e-3
    assert r["es2_r"] >= r["es_r"] ** 2 - 1e-6  # E[S^2] >= E[S]^2
    if r["saturated"] == 0:
        assert r["wq_r"] >= 0
        assert abs(r["lq_r"] - r["lambda_r"] * r["wq_r"]) < 1e-2


def test_ripley_k_monotone(row):
    rs = sorted(row("a226_ripley_k"), key=lambda r: r["r"])
    assert [r["r"] for r in rs] == [25000, 50000, 100000]
    assert rs[0]["n"] <= 2048
    for i in range(1, 3):
        assert rs[i]["n_within"] >= rs[i - 1]["n_within"]
        assert rs[i]["k_hat_floor"] >= rs[i - 1]["k_hat_floor"]
    # CSR-by-construction field: L(r) - r should be small vs r
    for r in rs:
        assert abs(r["l_minus_r_r"]) < 0.25 * r["r"]


def test_life_table_conservation(row):
    rs = sorted(row("a227_life_table"), key=lambda r: r["x"])
    assert len(rs) == 10
    total_deaths = sum(r["d_x"] for r in rs)
    assert rs[0]["l_x"] == total_deaths
    for i in range(1, 10):
        assert rs[i]["l_x"] <= rs[i - 1]["l_x"]
        assert rs[i - 1]["l_x"] - rs[i]["l_x"] == rs[i - 1]["d_x"]
    last_alive = [r for r in rs if r["l_x"] > 0][-1]
    assert last_alive["q_x_micro"] == 1_000_000
    for r in rs:
        assert 0 <= r["q_x_micro"] <= 1_000_000


def test_ransac_sanity(row, daily):
    r = row("a228_ransac_line")[0]
    n = len(daily)
    assert 2 <= r["n_inliers"] <= n
    assert 0 <= r["c"] <= 63
    assert math.isfinite(r["slope_r"])
    assert math.isfinite(r["intercept_r"])
    # the OLS refit runs on the candidate's inliers, so its line cannot
    # drift far from the candidate line (tol = mean/20 per unit step)
    v = [x[1] for x in daily]
    tol = max(1, sum(v) // (n * 20))
    assert abs(r["slope_r"] - r["cand_slope_r"]) <= 2 * tol


def test_cka_bounds(row):
    r = row("a229_cka_quantization_audit")[0]
    assert r["n_panel"] == 256
    assert r["n_cells"] == 64 * 64
    # int8 quantization of milli-fixed coords is near-lossless, and
    # CKA is a normalized inner product: in (0, 1].
    assert 0.9 < r["cka_r"] <= 1.0 + 1e-9


def test_preference_cycles_census(row):
    r = row("a230_preference_cycles")[0]
    assert r["n_parts"] == 12
    # 3-way join over ordered pairs enumerates each triple once
    assert r["n_triads"] == 220
    assert 0 <= r["n_tied"] <= r["n_triads"]
    assert 0 <= r["n_cyclic"] <= r["n_triads"] - r["n_tied"]
    assert 0 <= r["transitivity_ppm"] <= 1_000_000


def test_crow_amsaa_fit(row):
    r = row("a231_crow_amsaa")[0]
    assert r["n_points"] >= 2
    # cumulative counts grow, so the log-log slope is positive
    assert r["beta_r"] > 0
    assert r["reliability_growth"] in (0, 1)
    assert r["reliability_growth"] == (1 if r["beta_r"] < 1 else 0)
