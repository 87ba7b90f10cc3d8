"""Textbook-invariant property checks for the round-10 extension
battery (grouper_spark/queries/inference6.py, a572-a590).

Same contract as test_inference5_props.py: the parity gate proves
Spark == DuckDB but cannot catch a formula BOTH sides encode wrong --
each statistic here is recomputed independently in plain Python from
the raw fixture (via duckdb) and pinned to textbook identities.
Each query runs once at sf0.001 on the shared session; all outputs are
summary-sized."""

from __future__ import annotations

import math
import statistics

import duckdb
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
def tdaily(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               COUNT(*) AS c
        FROM '{sf_dir}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    out: dict[str, list[int]] = {}
    for grp, _, c in rows:
        out.setdefault(grp, []).append(int(c))
    return out


@pytest.fixture(scope="module")
def odaily(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS v
        FROM '{sf_dir}/orders.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    return [int(v) for _, v in rows]


def _pvar(xs):
    n = len(xs)
    m = sum(xs) / n
    return sum((x - m) ** 2 for x in xs) / n


def test_hjorth_recompute(row, tdaily):
    rs = {r["grp"]: r for r in row("a572_hjorth_params")}
    assert set(rs) == set(tdaily)
    for grp, xs in tdaily.items():
        dx = [b - a for a, b in zip(xs, xs[1:])]
        ddx = [b - a for a, b in zip(dx, dx[1:])]
        v0, v1, v2 = _pvar(xs), _pvar(dx), _pvar(ddx)
        r = rs[grp]
        assert r["n_days"] == len(xs)
        assert abs(r["activity"] - v0) < 1e-9 * max(1.0, v0)
        mob = math.sqrt(v1 / v0)
        assert abs(r["mobility_r"] - mob) < 1e-5
        assert abs(r["complexity_r"] - math.sqrt(v2 / v1) / mob) < 1e-5


def test_sample_entropy_recompute(row, tdaily):
    rs = {r["grp"]: r for r in row("a573_sample_entropy")}
    for grp, xs in tdaily.items():
        n = len(xs)
        r_tol = max(1, (max(xs) - min(xs)) // 10)
        b_cnt = a_cnt = 0
        for i in range(n - 2):
            for j in range(i + 1, n - 2):
                if (
                    abs(xs[i] - xs[j]) <= r_tol
                    and abs(xs[i + 1] - xs[j + 1]) <= r_tol
                ):
                    b_cnt += 1
                    if abs(xs[i + 2] - xs[j + 2]) <= r_tol:
                        a_cnt += 1
        r = rs[grp]
        assert r["r_tol"] == r_tol
        assert r["b_cnt"] == b_cnt
        assert r["a_cnt"] == a_cnt
        if a_cnt and b_cnt:
            # SampEn >= 0 always (A <= B by construction).
            assert r["sampen_r"] >= 0
            assert abs(r["sampen_r"] - math.log(b_cnt / a_cnt)) < 1e-5


def test_higuchi_recompute(row, tdaily):
    rs = {r["grp"]: r for r in row("a574_higuchi_fd")}
    for grp, xs in tdaily.items():
        n = len(xs)
        lks = []
        for k in (1, 2, 3, 4):
            lk = 0.0
            for m in range(1, k + 1):
                idx = list(range(m - 1, n, k))
                sa = sum(
                    abs(xs[idx[i]] - xs[idx[i - 1]])
                    for i in range(1, len(idx))
                )
                cnt = (n - m) // k
                lk += (sa * (n - 1)) / (cnt * k * k)
            lks.append(lk)
        r = rs[grp]
        for k, f in zip((1, 2, 3, 4), lks):
            assert abs(r[f"f{k}"] / 1e9 - f) < 1e-6 * max(1.0, f)
        # OLS slope of ln L(k) on ln k -> FD = -slope, expect 1..2 for
        # a bounded noisy series.
        ys = [math.log(v) for v in lks]
        xsl = [math.log(k) for k in (1, 2, 3, 4)]
        xb = sum(xsl) / 4
        yb = sum(ys) / 4
        slope = sum((x - xb) * (y - yb) for x, y in zip(xsl, ys)) / sum(
            (x - xb) ** 2 for x in xsl
        )
        assert abs(r["hfd_r"] - (-slope)) < 1e-4
        # [1,2] in theory; the kmax=4 estimator on a short noisy
        # series can undershoot slightly, so pin a loose sanity band.
        assert 0.5 < r["hfd_r"] < 2.5


def test_dfa_recompute(row, odaily):
    r = row("a575_dfa_alpha")[0]
    v = odaily
    n = len(v)
    u = max(1, (sum(v) // n) // 30)
    c = [x // u for x in v]
    s = sum(c)
    p = 0
    y = []
    for t, x in enumerate(c, start=1):
        p += x
        y.append(n * p - t * s)
    got = {}
    for bs in (8, 16, 32):
        tot_fp = 0
        n_used = 0
        for box in range(n // bs):
            yy = [
                y[box * bs + i] - y[box * bs] for i in range(bs)
            ]
            ts = list(range(1, bs + 1))
            m = bs
            sx, sxx = sum(ts), sum(t * t for t in ts)
            sy, syy = sum(yy), sum(q * q for q in yy)
            sxy = sum(t * q for t, q in zip(ts, yy))
            a_ = m * sxx - sx * sx
            ss = (float(a_) * (m * syy - sy * sy) - float(m * sxy - sx * sy) ** 2) / (
                m * a_
            )
            tot_fp += int(round(ss * 1000))
            n_used += m
        got[bs] = (tot_fp, n_used)
    assert (r["ss8"], r["m8"]) == got[8]
    assert (r["ss16"], r["m16"]) == got[16]
    assert (r["ss32"], r["m32"]) == got[32]
    alpha = (
        math.log(got[32][0] / got[32][1]) - math.log(got[8][0] / got[8][1])
    ) / (2 * (math.log(32) - math.log(16))) / 2
    assert abs(r["alpha_r"] - alpha) < 1e-5
    # Arrival counts are near-uncorrelated day to day: alpha well
    # below the 1.0 nonstationary regime.
    assert 0.1 < r["alpha_r"] < 1.2


def test_goldfeld_quandt_recompute(row, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT l_returnflag,
               CAST(round(l_quantity * 100, 0) AS BIGINT),
               CAST(round(l_extendedprice / 38, 0) AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet'
        ORDER BY 1, 2, 3, l_orderkey, l_linenumber
        """
    ).fetchall()
    by = {}
    for g, x, y in rows:
        by.setdefault(g, []).append((int(x), int(y)))
    rs = {r["grp"]: r for r in row("a576_goldfeld_quandt")}
    for g, xy in by.items():
        n = len(xy)
        k = n * 3 // 8
        for s, seg in ((1, xy[:k]), (2, xy[n - k:])):
            m = len(seg)
            sx = sum(x for x, _ in seg)
            sy = sum(y for _, y in seg)
            sxx = sum(x * x for x, _ in seg)
            syy = sum(y * y for _, y in seg)
            sxy = sum(x * y for x, y in seg)
            rss = (
                syy
                - sy * sy / m
                - (sxy - sx * sy / m) ** 2 / (sxx - sx * sx / m)
            )
            key = f"rss{s}_r"
            assert abs(rs[g][key] - rss) < 1e-4 * max(1.0, abs(rss))
        assert rs[g]["n_rows"] == n and rs[g]["m_seg"] == k
        assert (
            abs(rs[g]["gq_f_r"] - rs[g]["rss2_r"] / rs[g]["rss1_r"]) < 1e-4
        )
        assert rs[g]["gq_f_r"] > 0


def test_engle_granger_recompute(row, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS v,
               CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) // 100
                    AS BIGINT) AS y
        FROM '{sf_dir}/orders.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    n = len(rows)
    u = max(1, (sum(r[2] for r in rows) // n) // 3000)
    vs = [int(r[1]) for r in rows]
    yk = [int(r[2]) // u for r in rows]
    sv, sy = sum(vs), sum(yk)
    svv = sum(v * v for v in vs)
    svy = sum(v + 0 for v in [a * b for a, b in zip(vs, yk)])
    b = (n * svy - sv * sy) / (n * svv - sv * sv)
    a = (sy - b * sv) / n
    e = [int(round((y - a - b * v) * 1000)) for v, y in zip(vs, yk)]
    de = [q - p for p, q in zip(e, e[1:])]
    le = e[:-1]
    m = len(le)
    sdl = sum(d * q for d, q in zip(de, le))
    sll = sum(q * q for q in le)
    sdd = sum(d * d for d in de)
    gamma = sdl / sll
    t_stat = gamma / math.sqrt(((sdd - sdl * sdl / sll) / (m - 1)) / sll)
    r = row("a577_engle_granger")[0]
    assert r["n_days"] == n
    assert abs(r["beta_r"] - b) < 1e-5
    assert abs(r["gamma"] - gamma) < 1e-9
    assert abs(r["adf_t_r"] - t_stat) < 1e-4
    # Cointegration direction: residual mean-reverts, gamma < 0.
    assert r["gamma"] < 0


def test_pesaran_timmermann_recompute(row, tdaily):
    rs = {r["grp"]: r for r in row("a578_pesaran_timmermann")}
    for grp, xs in tdaily.items():
        dx = [b - a for a, b in zip(xs, xs[1:])]
        up = [1 if d > 0 else 0 for d in dx]
        pred = up[:-1]
        act = up[1:]
        t = len(act)
        m = sum(1 for p, q in zip(pred, act) if p == q)
        na, nf = sum(act), sum(pred)
        p_hat = m / t
        py, px = na / t, nf / t
        p_star = py * px + (1 - py) * (1 - px)
        vp = p_star * (1 - p_star) / t
        vps = (
            (2 * py - 1) ** 2 * px * (1 - px)
            + (2 * px - 1) ** 2 * py * (1 - py)
            + 4 * py * px * (1 - py) * (1 - px) / t
        ) / t
        z = (p_hat - p_star) / math.sqrt(vp - vps)
        r = rs[grp]
        assert r["t_n"] == t
        assert r["n_correct"] == m
        assert r["n_up_actual"] == na and r["n_up_pred"] == nf
        assert abs(r["p_hat"] - p_hat) < 1e-12
        assert abs(r["p_star"] - p_star) < 1e-12
        assert abs(r["pt_z_r"] - z) < 1e-4


def test_katz_recompute(row, sf_dir):
    con = duckdb.connect()
    pairs = con.execute(
        f"""
        WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM '{sf_dir}/lineitem.parquet')
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey <> b.l_partkey
        """
    ).fetchall()
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(int(u), set()).add(int(v))
    srcs = sorted(u for u in adj if u % 199 == 0)[:10]
    got = {(r["u"], r["v"]): r for r in row("a579_katz_index")}
    assert got, "panel produced no rows"
    scores = {}
    for s in srcs:
        n1 = {v: 1 for v in adj[s]}
        n2: dict[int, int] = {}
        for w in adj[s]:
            for v in adj.get(w, ()):
                n2[v] = n2.get(v, 0) + 1
        n3: dict[int, int] = {}
        for w, c in n2.items():
            for v in adj.get(w, ()):
                n3[v] = n3.get(v, 0) + c
        for v in set(n1) | set(n2) | set(n3):
            if v == s:
                continue
            scores[(s, v)] = (
                400 * n1.get(v, 0) + 20 * n2.get(v, 0) + n3.get(v, 0),
                n1.get(v, 0),
                n2.get(v, 0),
                n3.get(v, 0),
            )
    top = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    assert len(got) == min(20, len(top))
    for (u, v), (num, n1v, n2v, n3v) in top[: len(got)]:
        r = got[(u, v)]
        assert (r["n1"], r["n2"], r["n3"], r["katz_num"]) == (
            n1v,
            n2v,
            n3v,
            num,
        )
        assert abs(r["katz"] - num / 8000) < 1e-12


def test_rule_strength_recompute(row, sf_dir):
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    items = dict(
        con.execute(
            f"""
            WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM '{sf_dir}/lineitem.parquet')
            SELECT l_partkey, COUNT(*) FROM lp GROUP BY 1
            """
        ).fetchall()
    )
    for r in row("a580_rule_strength"):
        n_a = items[r["ant"]]
        n_c = items[r["cons"]]
        n_ab = r["n_ab"]
        assert r["lev_num"] == n_ab * n - n_a * n_c > 0
        assert abs(r["leverage"] - r["lev_num"] / n / n) < 1e-15
        if n_ab < n_a:
            assert abs(
                r["conviction"]
                - (1 - n_c / n) / (1 - n_ab / n_a)
            ) < 1e-9
        assert abs(r["all_conf"] - n_ab / max(n_a, n_c)) < 1e-12
        assert abs(r["cosine_r"] - n_ab / math.sqrt(n_a * n_c)) < 1e-5
        assert abs(r["jaccard"] - n_ab / (n_a + n_c - n_ab)) < 1e-12
        # Null-invariant ordering: jaccard <= all_conf <= cosine.
        assert r["jaccard"] <= r["all_conf"] + 1e-12
        assert r["all_conf"] <= r["cosine_r"] + 1e-5


def test_self_excitation_recompute(row, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
               epoch_us(ts) AS t
        FROM '{sf_dir}/events.parquet' ORDER BY 1, 2, 3
        """
    ).fetchall()
    by: dict[str, dict] = {}
    for g, d, t in rows:
        e = by.setdefault(g, {"days": {}, "all": []})
        e["days"].setdefault(d, []).append(int(t))
        e["all"].append(int(t))
    rs = {r["grp"]: r for r in row("a581_self_excitation")}
    for g, e in by.items():
        n_gaps = n_trig = 0
        for ts in e["days"].values():
            gaps = [b - a for a, b in zip(ts, ts[1:])]
            n_gaps += len(gaps)
            n_trig += sum(1 for x in gaps if x <= 60_000_000)
        n = len(e["all"])
        span = max(e["all"]) - min(e["all"])
        p_exp = 1 - math.exp(-(n * 60_000_000 / span))
        r = rs[g]
        assert r["n"] == n
        assert r["n_gaps"] == n_gaps and r["n_trig"] == n_trig
        assert abs(r["p_obs"] - n_trig / n_gaps) < 1e-12
        assert abs(r["p_exp_r"] - p_exp) < 1e-5
        assert (
            abs(r["excess_r"] - (n_trig / n_gaps - p_exp) / (1 - p_exp))
            < 1e-4
        )


@pytest.fixture(scope="module")
def yk_series(sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)) // 100
                    AS BIGINT) AS y
        FROM '{sf_dir}/orders.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    ys = [int(y) for _, y in rows]
    u = max(1, (sum(ys) // len(ys)) // 3000)
    return [y // u for y in ys]


def test_max_drawdown_recompute(row, yk_series):
    r = row("a582_max_drawdown")[0]
    peak = -1
    dds, ppms = [], []
    for y in yk_series:
        peak = max(peak, y)
        dds.append(peak - y)
        ppms.append((peak - y) * 1_000_000 // peak)
    assert r["n_days"] == len(yk_series)
    assert r["max_dd"] == max(dds)
    assert r["max_dd_ppm"] == max(ppms)
    ui = math.sqrt(sum(p * p for p in ppms) / len(ppms)) / 10000
    assert abs(r["ulcer_r"] - ui) < 1e-5
    # Drawdown ppm is a fraction of peak: bounded by 1e6.
    assert 0 <= r["max_dd_ppm"] <= 1_000_000


def test_var_es_recompute(row, yk_series):
    r = row("a583_var_es")[0]
    rets = [
        (b - a) * 1_000_000 // a for a, b in zip(yk_series, yk_series[1:])
    ]
    m = len(rets)
    k = (m + 19) // 20
    srt = sorted(rets)
    var = -srt[k - 1]
    es = -sum(srt[:k]) / k
    assert r["m_days"] == m and r["k_tail"] == k
    assert r["var_ppm"] == var
    assert abs(r["es_ppm"] - es) < 1e-9 * max(1.0, abs(es))
    # ES is at least as severe as VaR (tail mean beyond the quantile).
    assert r["es_ppm"] >= r["var_ppm"]


def test_walk_centrality_recompute(row, sf_dir):
    con = duckdb.connect()
    pairs = con.execute(
        f"""
        WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM '{sf_dir}/lineitem.parquet')
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM lp a JOIN lp b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey <> b.l_partkey
        """
    ).fetchall()
    adj: dict[int, list[int]] = {}
    for u, v in pairs:
        adj.setdefault(int(u), []).append(int(v))
    w = {u: len(vs) for u, vs in adj.items()}
    w3 = {}
    for _ in range(3):
        w3 = w
        w = {
            u: sum(w3.get(v, 0) for v in vs) for u, vs in adj.items()
        }
    mw = max(w.values())
    top = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = row("a584_walk_centrality")
    assert len(got) == len(top)
    for r, (u, w4) in zip(got, top):
        assert (r["u"], r["w4"]) == (u, w4)
        assert r["w3"] == w3[u]
        assert abs(r["centrality"] - w4 / mw) < 1e-15
        assert abs(r["lambda_est"] - w4 / w3[u]) < 1e-12
        assert 0 < r["centrality"] <= 1


def test_kleinberg_burst_recompute(row, tdaily):
    rs = {r["grp"]: r for r in row("a585_kleinberg_burst")}
    for grp, xs in tdaily.items():
        n = len(xs)
        s = sum(xs)
        lam = s / n
        lnl0, lnl1 = math.log(lam), math.log(2 * lam)
        gam = math.log(n)
        v0, v1, c0, c1 = 0.0, 1e18, 0, 0
        for c in xs:
            nv0 = (lam - c * lnl0) + min(v0, v1)
            nv1 = (2 * lam - c * lnl1) + min(v0 + gam, v1)
            nc0 = c0 if v0 <= v1 else c1
            nc1 = (c0 if v0 + gam < v1 else c1) + 1
            v0, v1, c0, c1 = nv0, nv1, nc0, nc1
        r = rs[grp]
        assert r["n_days"] == n
        assert abs(r["lam"] - lam) < 1e-12
        assert abs(r["cost_r"] - min(v0, v1)) < 1e-5
        assert r["n_burst_days"] == (c0 if v0 <= v1 else c1)
        assert 0 <= r["n_burst_days"] <= n


def test_hill_recompute(row, sf_dir):
    con = duckdb.connect()
    xs = [
        int(x)
        for (x,) in con.execute(
            f"""
            SELECT CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT)
            FROM '{sf_dir}/orders.parquet'
            ORDER BY 1 DESC, o_orderkey LIMIT 201
            """
        ).fetchall()
    ]
    xk1 = xs[200]
    s1 = sum(int(round(math.log(x / xk1) * 1e9)) for x in xs[:200])
    s2 = sum(
        int(round(math.log(x / xk1) ** 2 * 1e12)) for x in xs[:200]
    )
    hill = s1 / 200 / 1e9
    m2 = s2 / 200 / 1e12
    dedh = hill + 1 - 0.5 / (1 - hill * hill / m2)
    r = row("a586_hill_tail_index")[0]
    assert r["threshold_cents"] == xk1
    assert r["k_tail"] == 200
    assert abs(r["hill_r"] - hill) < 1e-5
    assert abs(r["dedh_xi_r"] - dedh) < 1e-4
    # Hill is a positive mean of log spacings; DEdH <= Hill + 1.
    assert r["hill_r"] > 0
    assert r["dedh_xi_r"] <= r["hill_r"] + 1


def test_motif_discord_recompute(row, tdaily):
    rs = {r["grp"]: r for r in row("a587_motif_discord")}
    m = 7
    for grp, xs in tdaily.items():
        n = len(xs)
        starts = list(range(n - m + 1))
        d2 = {}
        for ii, i in enumerate(starts):
            for j in starts[ii + 1:]:
                if j - i < m:
                    continue
                d2[(i, j)] = sum(
                    (xs[i + o] - xs[j + o]) ** 2 for o in range(m)
                )
        motif = min(d2.items(), key=lambda kv: (kv[1], kv[0]))
        nn = {}
        for (i, j), d in d2.items():
            nn[i] = min(nn.get(i, 1 << 62), d)
            nn[j] = min(nn.get(j, 1 << 62), d)
        discord = max(nn.items(), key=lambda kv: (kv[1], -kv[0]))
        r = rs[grp]
        # 1-based rn in the query vs 0-based here.
        assert (r["motif_i"] - 1, r["motif_j"] - 1) == motif[0]
        assert r["motif_d2"] == motif[1]
        assert r["discord_i"] - 1 == discord[0]
        assert r["discord_d2"] == discord[1]
        # A discord's NN distance can never undercut the motif pair.
        assert r["discord_d2"] >= r["motif_d2"]


def test_mediation_sobel_recompute(row, sf_dir):
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END),
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END),
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        FROM '{sf_dir}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    x = np.array([float(r[0]) for r in rows])
    m = np.array([float(r[1]) for r in rows])
    y = np.array([float(r[2]) for r in rows])
    n = len(x)
    # Path a: OLS m ~ 1 + x, textbook SE.
    X1 = np.column_stack([np.ones(n), x])
    beta1, *_ = np.linalg.lstsq(X1, m, rcond=None)
    a_hat = beta1[1]
    r1 = m - X1 @ beta1
    sxx = ((x - x.mean()) ** 2).sum()
    var_a = (r1 @ r1) / (n - 2) / sxx
    # Paths b, c': OLS y ~ 1 + x + m.
    X2 = np.column_stack([np.ones(n), x, m])
    beta2, *_ = np.linalg.lstsq(X2, y, rcond=None)
    bx_hat, b_hat = beta2[1], beta2[2]
    r2 = y - X2 @ beta2
    sigma2 = (r2 @ r2) / (n - 3)
    cov = np.linalg.inv(X2.T @ X2) * sigma2
    var_b = cov[2, 2]
    sobel = a_hat * b_hat / math.sqrt(
        a_hat**2 * var_b + b_hat**2 * var_a
    )
    r = row("a588_mediation_sobel")[0]
    assert r["n_users"] == n
    assert abs(r["a_r"] - a_hat) < 1e-5
    assert abs(r["b_r"] - b_hat) < 1e-5
    assert abs(r["direct_r"] - bx_hat) < 1e-5
    assert abs(r["ab_r"] - a_hat * b_hat) < 1e-5
    assert abs(r["sobel_z_r"] - sobel) < 1e-4


def test_scheffe_recompute(row, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type, COUNT(*),
               SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)),
               SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)
                   * CAST(ROUND(value * 100.0, 0) AS BIGINT))
        FROM '{sf_dir}/events.parquet' GROUP BY 1
        """
    ).fetchall()
    g = {r[0]: (int(r[1]), int(r[2]), int(r[3])) for r in rows}
    n_total = sum(v[0] for v in g.values())
    w = {"purchase": 3, "signup": 3, "click": -2, "view": -2, "error": -2}
    c_hat = sum(w[k] * (g[k][1] / g[k][0]) for k in w) / 6 / 100
    ssw = sum(v[2] - v[1] ** 2 / v[0] for v in g.values())
    mse = ssw / (n_total - 5) / 10000
    wsum = sum((w[k] / 6) ** 2 / g[k][0] for k in w)
    f_stat = c_hat**2 / (4 * mse * wsum)
    r = row("a589_scheffe_contrast")[0]
    assert r["n_total"] == n_total
    assert abs(r["c_hat_r"] - c_hat) < 1e-4
    assert abs(r["se_r"] - math.sqrt(mse * wsum)) < 1e-5
    assert abs(r["scheffe_f_r"] - f_stat) < 1e-3 * max(1.0, f_stat)
    assert r["scheffe_f_r"] >= 0


def test_poisson_irls_recompute(row, sf_dir):
    con = duckdb.connect()
    cs = [
        int(c)
        for (c,) in con.execute(
            f"""
            SELECT COUNT(*) FROM '{sf_dir}/events.parquet'
            GROUP BY CAST(date_trunc('day', ts) AS DATE)
            ORDER BY CAST(date_trunc('day', ts) AS DATE)
            """
        ).fetchall()
    ]
    n = len(cs)
    s = sum(cs)
    b0, b1 = math.log(s / n), 0.0
    for _ in range(3):
        sw = swt = swt2 = swz = swzt = 0
        for t, c in enumerate(cs, start=1):
            mu = math.exp(b0 + b1 * t)
            wz = mu * (b0 + b1 * t) + (c - mu)
            sw += int(round(mu * 1e6))
            swt += int(round(mu * t * 1e6))
            swt2 += int(round(mu * t * t * 1e6))
            swz += int(round(wz * 1e6))
            swzt += int(round(wz * t * 1e6))
        b1 = (sw * swzt - swt * swz) / (sw * swt2 - swt * swt)
        b0 = (swz - b1 * swt) / sw
    sdev = sum(
        int(
            round(
                (
                    c * math.log(c / math.exp(b0 + b1 * t))
                    - (c - math.exp(b0 + b1 * t))
                )
                * 1e6
            )
        )
        for t, c in enumerate(cs, start=1)
    )
    r = row("a590_poisson_trend_irls")[0]
    assert r["n_days"] == n
    assert abs(r["b0_r"] - b0) < 1e-4
    assert abs(r["b1_r"] - b1) < 1e-5
    assert abs(r["daily_growth_r"] - (math.exp(b1) - 1)) < 1e-5
    assert abs(r["dev_micro"] - 2 * sdev) < 200  # sub-ulp fp slack
    # Fitted mean at t=(1+n)/2 should sit near the sample mean.
    mid_mu = math.exp(b0 + b1 * (1 + n) / 2)
    assert abs(mid_mu - s / n) < 0.05 * (s / n)
