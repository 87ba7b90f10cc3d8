"""Smoke + spot-parity over the full query registry.

Every registered query must run at sf0.001 with a stable non-empty
schema; a representative subset is additionally checked against its
DuckDB oracle here (full-inventory parity lives in
tools/check_parity.py and the driver's own gate).
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pytest

from grouper_spark.queries import load_all
from grouper_spark.sources import TABLES

REGISTRY = load_all()

# Queries expected to return >0 rows at sf0.001 (q15 anti-join is
# legitimately small but non-empty at all SFs).
ALL_NAMES = sorted(REGISTRY)

PARITY_SUBSET = (
    "q01_pricing_summary",
    "q06_rollup",
    "q12_shuffle_join",
    "q18_window_rank",
    "q21_asof_join",
    "q27_session_window",
    "q34_ngram_jaccard",
    "q37_ann_bruteforce",
    "q85_repetition_quality",
    "q89_embedding_quantize",
)


@pytest.mark.parametrize("name", ALL_NAMES)
def test_query_runs(spark, sf_dir, name):
    qdef = REGISTRY[name]
    df = qdef.fn(spark, sf_dir)
    assert len(df.columns) > 0
    n = df.count()
    assert n >= 0
    if name not in ("q15_anti_join",):
        assert n > 0, f"{name} unexpectedly empty at {sf_dir}"


def _normalize(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_normalize(x) for x in v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", PARITY_SUBSET)
def test_oracle_parity(spark, sf_dir, duck, name):
    qdef = REGISTRY[name]
    assert qdef.oracle is not None
    sdf = qdef.fn(spark, sf_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        (tuple(_normalize(r[c]) for c in scols) for r in sdf.collect()), key=_key
    )
    res = duck.execute(qdef.oracle)
    dcols_raw = [d[0] for d in res.description]
    order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
    dcols = [dcols_raw[i] for i in order]
    drows = sorted(
        (tuple(_normalize(r[i]) for i in order) for r in res.fetchall()), key=_key
    )
    assert scols == dcols
    assert srows == drows


def test_q123_hll_estimate_within_error_bound(spark, sf_dir):
    """q123 is rows-only at the driver (Datasketches HLL has no DuckDB
    twin), so the accuracy assertion lives here: the merged and global
    estimates must agree exactly (sketches are deterministic functions
    of the value set), and the estimate must sit within 3 standard
    errors of the exact distinct count. Spark's default lgConfigK=12
    gives RSE ~= 1.04/sqrt(2^12) ~= 1.63%."""
    row = REGISTRY["q123_hll_sketch_merge"].fn(spark, sf_dir).collect()[0]
    est_union, est_global, n_exact = (
        row["est_union"],
        row["est_global"],
        row["n_exact"],
    )
    assert est_union == est_global
    rse = 1.04 / math.sqrt(2**12)
    assert abs(est_global - n_exact) <= 3 * rse * n_exact, (
        est_global,
        n_exact,
    )


def test_q68_approx_percentiles_within_accuracy_bound(spark, sf_dir):
    """q68 is rows-only at the driver (sketch merges are arrival-order
    dependent), so the accuracy assertion lives here: with accuracy
    parameter 10000, percentile_approx guarantees rank error <=
    n/10000, which at these group sizes means the estimate must land
    within a tight quantile band of the exact distribution."""
    from pyspark.sql import functions as F

    from grouper_spark.sources import table as _table

    got = {
        r["o_orderpriority"]: (r["median_approx"], r["p90_approx"])
        for r in REGISTRY["q68_approx_percentiles"].fn(spark, sf_dir).collect()
    }
    o = _table(spark, sf_dir, "orders")
    exact = {
        r["o_orderpriority"]: (r["lo50"], r["hi50"], r["lo90"], r["hi90"])
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.48)").alias("lo50"),
            F.expr("percentile(o_totalprice, 0.52)").alias("hi50"),
            F.expr("percentile(o_totalprice, 0.88)").alias("lo90"),
            F.expr("percentile(o_totalprice, 0.92)").alias("hi90"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for k, (m, p90) in got.items():
        lo50, hi50, lo90, hi90 = exact[k]
        assert lo50 <= m <= hi50, (k, m, lo50, hi50)
        assert lo90 <= p90 <= hi90, (k, p90, lo90, hi90)


def test_q300_short_docs_do_not_crash_ansi(spark, tmp_path):
    """ADVICE r3 (medium): sequence(1, greatest(size-1, 0)) counts DOWN
    to [1, 0] for <=1-token docs, so ws[1] indexed out of bounds under
    the session's ANSI mode. The query must emit zero bigrams for such
    docs instead of raising INVALID_ARRAY_INDEX."""
    rows = [
        (0, "alpha beta alpha beta", "en", "web", 21),
        (1, "alpha", "en", "web", 5),  # single token, held-out split
        (2, "", "en", "web", 0),  # empty, train split
        (3, "beta alpha beta", "en", "web", 15),
    ]
    schema = (
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = REGISTRY["q300_lm_perplexity_holdout"].fn(
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    assert out[0]["n_bigrams"] == 2  # doc 3's two bigrams only
    assert out[0]["perplexity_r"] > 0


def test_a350_business_day_closed_form_matches_bruteforce(spark):
    """The Monday-epoch closed form f(d)=(days//7)*5+min(days%7,5) must
    equal a brute-force weekday count for every day-pair in a window
    spanning month and weekend boundaries (independent re-derivation,
    not the oracle twin)."""
    import datetime as _dt

    from pyspark.sql import functions as F

    def f_py(d):
        days = (d - _dt.date(1970, 1, 5)).days
        return (days // 7) * 5 + min(days % 7, 5)

    def brute(a, b):
        # f(b)-f(a) counts weekdays in the half-open interval [a, b):
        # the order day itself is a business day spent, the ship day is
        # not yet complete. Any consistent convention works for the
        # cycle-time aggregate; this pins WHICH one the formula encodes.
        n, d = 0, a
        while d < b:
            if d.weekday() < 5:
                n += 1
            d += _dt.timedelta(days=1)
        return n

    base = _dt.date(2024, 2, 20)
    pairs = [
        (base + _dt.timedelta(days=i), base + _dt.timedelta(days=i + g))
        for i in range(14)
        for g in (0, 1, 2, 3, 5, 7, 11, 30)
    ]
    for a, b in pairs:
        assert f_py(b) - f_py(a) == brute(a, b), (a, b)

    # and the Spark expression computes the same f as f_py
    df = spark.createDataFrame([(a,) for a, _ in pairs], "d date")
    days = F.datediff(F.col("d"), F.lit("1970-01-05").cast("date"))
    fcol = (days - F.pmod(days, 7)) / 7 * 5 + F.least(F.pmod(days, 7), F.lit(5))
    got = {r["d"]: r["f"] for r in df.select("d", fcol.cast("bigint").alias("f")).collect()}
    for a, _ in pairs:
        assert got[a] == f_py(a), a


def _stage_orders(spark, tmp_path, rows):
    schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    return str(tmp_path)


def test_a366_wilcoxon_matches_textbook(spark, tmp_path):
    """Independent re-derivation (not the oracle twin): average ranks of
    |d| with ties, W+ on the x2 scale, and the normal z."""
    import datetime as _dt

    early, late = _dt.datetime(1993, 1, 1), _dt.datetime(1996, 1, 1)
    # customer -> (early_dollars, late_dollars); includes a |d| tie
    pairs = {1: (100.0, 150.0), 2: (200.0, 150.0), 3: (100.0, 180.0),
             4: (500.0, 450.0), 5: (300.0, 340.0)}
    rows = []
    k = 0
    for c, (e, l) in pairs.items():
        rows.append((k := k + 1, c, "F", e, early, "3-MEDIUM"))
        rows.append((k := k + 1, c, "F", l, late, "3-MEDIUM"))
    out = REGISTRY["a366_wilcoxon_signed_rank"].fn(
        spark, _stage_orders(spark, tmp_path, rows)
    ).first()

    ds = [(l - e) * 100 for e, l in pairs.values()]  # cents
    absd = sorted(range(len(ds)), key=lambda i: abs(ds[i]))
    # average ranks with ties, x2 scale
    r2 = [0] * len(ds)
    i = 0
    while i < len(absd):
        j = i
        while j < len(absd) and abs(ds[absd[j]]) == abs(ds[absd[i]]):
            j += 1
        for t in range(i, j):
            r2[absd[t]] = (i + 1) + j  # 2*avg of ranks i+1..j
        i = j
    n = len(ds)
    w2p = sum(r for r, d in zip(r2, ds) if d > 0)
    z = (w2p - n * (n + 1) / 2.0) / (
        (n * (n + 1) * (2 * n + 1) / 6.0) ** 0.5
    )
    assert out["n"] == n
    assert out["w_plus_x2"] == w2p
    assert abs(out["z_r"] - round(z, 6)) < 1e-9


def test_a367_cochran_armitage_matches_textbook(spark, tmp_path):
    """Independent re-derivation: T = Σ s(x - n·p̄), Var = p̄(1-p̄)·
    (Σs²n − (Σsn)²/N), z = T/√Var — against the integer cross-sum
    form the query uses."""
    import datetime as _dt

    d0 = _dt.datetime(1995, 6, 1)
    # (priority, n_total, n_high): rising high-value share with level
    spec = [("1-URGENT", 10, 1), ("2-HIGH", 10, 3), ("3-MEDIUM", 10, 4),
            ("4-NOT SPECIFIED", 10, 6), ("5-LOW", 10, 9)]
    rows, k = [], 0
    for pr, n_i, x_i in spec:
        for j in range(n_i):
            price = 200000.0 if j < x_i else 1000.0  # > / < $150k line
            rows.append((k := k + 1, k, "F", price, d0, pr))
    out = REGISTRY["a367_cochran_armitage"].fn(
        spark, _stage_orders(spark, tmp_path, rows)
    ).first()

    import math

    N = sum(n for _, n, _ in spec)
    X = sum(x for _, _, x in spec)
    pbar = X / N
    T = sum((i + 1) * (x - n * pbar) for i, (_, n, x) in enumerate(spec))
    var = (
        pbar * (1 - pbar)
        * (sum((i + 1) ** 2 * n for i, (_, n, _) in enumerate(spec))
           - sum((i + 1) * n for i, (_, n, _) in enumerate(spec)) ** 2 / N)
    )
    z = T / math.sqrt(var)
    assert out["n"] == N and out["x"] == X
    assert abs(out["z_r"] - round(z, 6)) < 1e-6


def test_a388_fleiss_kappa_matches_textbook(spark, tmp_path):
    """Independent re-derivation via the generic Fleiss formula (full
    n_ij table, no algebraic collapse) on staged orders."""
    import datetime as _dt

    d0 = _dt.datetime(1995, 6, 1)
    # (price, priority, status) -> rater votes (>250k, urgent/high, F)
    spec = [
        (300000.0, "1-URGENT", "F"),  # pos=3
        (300000.0, "3-MEDIUM", "O"),  # pos=1
        (1000.0, "2-HIGH", "F"),      # pos=2
        (1000.0, "5-LOW", "O"),       # pos=0
        (260000.0, "1-URGENT", "O"),  # pos=2
        (1000.0, "4-NOT SPECIFIED", "F"),  # pos=1
    ]
    rows = [
        (i + 1, i + 1, st, price, d0, pr)
        for i, (price, pr, st) in enumerate(spec)
    ]
    out = REGISTRY["a388_fleiss_kappa"].fn(
        spark, _stage_orders(spark, tmp_path, rows)
    ).first()

    m = 3
    pos = [3, 1, 2, 0, 2, 1]
    n = len(pos)
    p_i = [
        (p * p + (m - p) * (m - p) - m) / (m * (m - 1)) for p in pos
    ]
    p_bar = sum(p_i) / n
    p1 = sum(pos) / (n * m)
    p_e = p1 * p1 + (1 - p1) * (1 - p1)
    kappa = (p_bar - p_e) / (1 - p_e)
    assert out["n"] == n
    assert abs(out["p_bar_r"] - round(p_bar, 6)) < 1e-9
    assert abs(out["fleiss_kappa_r"] - round(kappa, 6)) < 1e-6


def test_a389_compressibility_orders_repetitive_below_diverse(spark, tmp_path):
    """rows-only accuracy pin: a repetitive source must compress to a
    strictly smaller ratio than a diverse one, and ratios lie in
    (0, ~1.1]."""
    rows = [
        (1, "spam spam spam " * 50, "en", "tmpl", 750),
        (2, "ham ham ham ham " * 50, "en", "tmpl", 800),
        (3, " ".join(f"w{i}x{i * 7 % 97}" for i in range(200)), "en",
         "organic", 1500),
        (4, " ".join(f"z{i * 13 % 89}q{i}" for i in range(200)), "en",
         "organic", 1500),
    ]
    schema = (
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["source"]: r["ratio_r"]
        for r in REGISTRY["a389_compressibility"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert 0 < got["tmpl"] < got["organic"] <= 1.1, got


def test_a372_water_filling_matches_iterative(spark, tmp_path):
    """Independent re-derivation: the closed sorted form must equal the
    textbook iterative water-filling (raise the cap until the budget
    is exhausted) on a synthetic demand profile."""
    import datetime as _dt

    d0 = _dt.datetime(1995, 6, 1)
    # one order per customer; price = demand dollars
    demands = [10.0, 10.0, 20.0, 40.0, 100.0, 400.0]
    rows = [
        (i + 1, i + 1, "F", d, d0, "3-MEDIUM")
        for i, d in enumerate(demands)
    ]
    out = REGISTRY["a372_water_filling"].fn(
        spark, _stage_orders(spark, tmp_path, rows)
    ).first()

    cents = sorted(int(round(d * 100)) for d in demands)
    b = sum(cents) // 10
    # iterative: fully fund the smallest while the remaining budget
    # spread over the rest still exceeds its demand
    funded, rem, n_left = 0, b, len(cents)
    for d in cents:
        if d <= rem / n_left:
            # d is below the flat split of what's left → fully funded
            rem -= d
            n_left -= 1
            funded += 1
        else:
            break
    cap = rem / n_left
    assert out["budget_cents"] == b
    assert out["n_fully_funded"] == funded
    assert abs(out["cap_cents_r"] - round(cap, 6)) < 1e-6
    # allocations exhaust the budget exactly
    total_alloc = sum(cents[:funded]) + cap * (len(cents) - funded)
    assert abs(total_alloc - b) < 1e-6


def test_a345_kneser_ney_matches_hand_computation(spark, tmp_path):
    """Independent re-derivation of interpolated KN on a corpus small
    enough to verify by hand: counts, continuation counts, and the
    D=0.75 formula computed in pure Python."""
    docs = [
        (0, "a b a b", "en", "t", 7),
        (1, "a c", "en", "t", 3),
        (2, "b a", "en", "t", 3),
    ]
    schema = (
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )
    spark.createDataFrame(docs, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = REGISTRY["a345_kneser_ney"].fn(spark, str(tmp_path)).collect()

    # bigrams: (a,b)x2, (b,a)x2, (a,c)x1  [doc0: ab,ba,ab; doc1: ac; doc2: ba]
    from collections import Counter

    big = Counter(
        [("a", "b"), ("b", "a"), ("a", "b"), ("a", "c"), ("b", "a")]
    )
    c1 = Counter()
    fol = Counter()
    npre = Counter()
    for (w1, w2), c in big.items():
        c1[w1] += c
        fol[w1] += 1
        npre[w2] += 1
    B = len(big)
    D = 0.75

    def pkn(w1, w2):
        return (max(big[(w1, w2)] - D, 0) / c1[w1]) + (
            (D * fol[w1] / c1[w1]) * (npre[w2] / B)
        )

    got = {(r["w1"], r["w2"]): (r["c12"], r["pkn_r"]) for r in rows}
    for (w1, w2), c in big.items():
        assert got[(w1, w2)][0] == c
        assert abs(got[(w1, w2)][1] - round(pkn(w1, w2), 6)) < 1e-9


def test_a400_columnar_beats_row_formats(spark, sf_dir):
    """rows-only pin: parquet and ORC must use fewer bytes/row than CSV
    and JSON on the same projection."""
    got = {
        r["format"]: r["bytes_per_row"]
        for r in REGISTRY["a400_format_footprint_advisor"].fn(
            spark, sf_dir
        ).collect()
    }
    assert set(got) == {"parquet", "orc", "csv", "json"}
    assert max(got["parquet"], got["orc"]) < min(got["csv"], got["json"]), got


def test_a399_scurve_values_match_python_math(spark, sf_dir):
    """Independent re-derivation: the analytic capture probabilities
    must equal 1-(1-j^r)^b computed in pure Python for every grid row."""
    rows = REGISTRY["a399_lsh_band_optimizer"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        for j, col in ((0.8, "recall_at_080_r"), (0.5, "fp_at_050_r")):
            expect = 1.0 - (1.0 - j ** r["r"]) ** r["b"]
            assert abs(r[col] - round(expect, 6)) < 1e-9, (r, col)
        assert r["n_hashes"] == r["b"] * r["r"]


def test_a381_pq_assignment_matches_numpy(spark, sf_dir):
    """Independent re-derivation: PQ cell assignments and mean
    distortion recomputed with NumPy from the same md5 codebook over
    the real embeddings must match the query's census exactly."""
    import numpy as np

    from grouper_spark.queries.similarity import _pq_codebook
    from grouper_spark.sources import table as _table

    book = _pq_codebook()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in _table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    cents = {
        m: np.array([book[(m, k)] for k in range(4)]) for m in range(4)
    }
    census = {}
    for v in emb.values():
        for m in range(4):
            sub = v[m * 16 : (m + 1) * 16]
            d = ((cents[m] - sub) ** 2).sum(axis=1)
            # argmin with lowest-index tiebreak == np.argmin
            k = int(np.argmin(d))
            e_micro = int(round(d[k] * 1e6))
            n, s = census.get((m, k), (0, 0))
            census[(m, k)] = (n + 1, s + e_micro)

    got = {
        (r["m"], r["k"]): (r["n_assigned"], r["avg_err_r"])
        for r in REGISTRY["a381_product_quantization"].fn(
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(census)
    for key, (n, s) in census.items():
        assert got[key][0] == n, key
        # compare against the UNROUNDED reference: Python round() is
        # banker's and diverges from the engines' half-up at exact
        # 6dp ties; the engine value must sit within half a rounding
        # step of the true ratio
        assert abs(got[key][1] - s / 1e6 / n) <= 5.1e-7, key
