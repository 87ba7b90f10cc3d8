"""Property-based invariants for the core DataFrame operators: each
operator is compared against a direct Python reference implementation on
hypothesis-generated inputs. The Grouper layer has the same treatment in
test_grouper.py; this file covers the relational operators whose edge
cases (empty groups, touching intervals, simultaneous timestamps, hot
buckets) are easy to miss with fixture-only tests.

Spark round-trips per example are not free — max_examples is kept small;
the generators are biased toward collisions (tiny key/ts domains) so the
interesting cases dominate.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=2)
stamps = st.integers(min_value=0, max_value=8)


@given(
    left=st.lists(st.tuples(keys, stamps), min_size=1, max_size=12),
    right=st.lists(
        st.tuples(keys, stamps, st.integers(0, 100)),
        min_size=0,
        max_size=12,
        unique_by=lambda r: (r[0], r[1]),  # unique (key, ts) → deterministic
    ),
)
@settings(**_SETTINGS)
def test_property_asof_join_matches_reference(spark, left, right):
    from grouper_spark.operators import asof_join

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "id long, k long, ts long"
    )
    rdf = spark.createDataFrame(right or [], "k long, ts long, v long")
    got = {
        r["id"]: r["v_asof"]
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="ts", right_values=["v"]
        ).collect()
    }

    def ref(k, t):
        cands = [(rt, v) for rk, rt, v in right if rk == k and rt <= t]
        return max(cands)[1] if cands else None

    want = {i: ref(k, t) for i, (k, t) in enumerate(left)}
    assert got == want


@given(
    rows=st.lists(
        st.tuples(keys, stamps, st.integers(0, 6)),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_property_merge_intervals_matches_reference(spark, rows):
    from grouper_spark.operators import merge_intervals

    data = [(k, s, s + d) for k, s, d in rows]
    df = spark.createDataFrame(data, "k long, s long, e long")
    got = sorted(
        (r["k"], r["island_start"], r["island_end"], r["n_intervals"])
        for r in merge_intervals(df, "k", "s", "e").collect()
    )

    want = []
    for k in {r[0] for r in data}:
        ivs = sorted((s, e) for kk, s, e in data if kk == k)
        cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s <= cur_e:  # overlapping or touching
                cur_e = max(cur_e, e)
                n += 1
            else:
                want.append((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
        want.append((k, cur_s, cur_e, n))
    assert got == sorted(want)


@given(
    rows=st.lists(
        st.tuples(keys, st.integers(0, 50)), min_size=1, max_size=15
    ),
    k=st.integers(min_value=1, max_value=4),
)
@settings(**_SETTINGS)
def test_property_topk_per_group_matches_reference(spark, rows, k):
    from pyspark.sql import functions as F

    from grouper_spark.operators import topk_per_group

    data = [(i, g, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, g long, v long")
    got = sorted(
        (r["g"], r["rn"], r["v"], r["id"])
        for r in topk_per_group(
            df, ["g"], [F.col("v").desc(), F.col("id")], k=k
        ).collect()
    )

    want = []
    for g in {r[1] for r in data}:
        members = sorted(
            ((v, i) for i, gg, v in data if gg == g),
            key=lambda p: (-p[0], p[1]),
        )
        for rn, (v, i) in enumerate(members[:k], start=1):
            want.append((g, rn, v, i))
    assert got == sorted(want)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 6), keys),
        min_size=1,
        max_size=15,
        unique=True,
    ),
    cap=st.integers(min_value=1, max_value=5),
)
@settings(**_SETTINGS)
def test_property_cooccurrence_pairs_matches_reference(spark, rows, cap):
    from grouper_spark.operators import cooccurrence_pairs

    df = spark.createDataFrame(rows, "uid long, b long")
    got = {
        (r["u"], r["v"]): r["i"]
        for r in cooccurrence_pairs(df, "uid", ["b"], max_bucket=cap).collect()
    }

    want: dict[tuple[int, int], int] = {}
    for b in {r[1] for r in rows}:
        members = sorted(u for u, bb in rows if bb == b)
        if len(members) > cap:
            continue
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                p = (members[i], members[j])
                want[p] = want.get(p, 0) + 1
    assert got == want


@given(
    dim_keys=st.lists(st.integers(0, 50), min_size=0, max_size=20),
    fact_keys=st.lists(st.integers(0, 50), min_size=1, max_size=40),
)
@settings(**_SETTINGS)
def test_property_bloom_prefilter_never_drops_a_match(spark, dim_keys, fact_keys):
    """A Bloom filter has false positives but NEVER false negatives:
    for any dim key set, prefilter(fact) ⊇ fact ⋉ dim, so the
    prefilter + exact semi-join pipeline equals the plain semi-join
    (the q194 construction, minimized)."""
    from pyspark.sql import functions as F

    m_bits, k_seeds = 1 << 10, 4
    bitmap = [0] * (m_bits // 64)
    # build bitmap with Spark's own xxhash64 so probe and build agree
    dim = spark.createDataFrame([(k,) for k in dim_keys] or [], "k long")
    pos = dim.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.concat(F.lit(f"bf{s}|"), F.col("k").cast("string"))),
                        F.lit(m_bits),
                    )
                    for s in range(k_seeds)
                ]
            )
        ).alias("pos")
    )
    for r in (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
        .collect()
    ):
        bitmap[r["w"]] = r["mask"]

    blit = F.array(*[F.lit(x).cast("long") for x in bitmap])
    fact = spark.createDataFrame([(k,) for k in fact_keys], "k long")
    probe = fact.withColumn("__bf", blit)
    cond = F.lit(True)
    for s in range(k_seeds):
        p = F.pmod(
            F.xxhash64(F.concat(F.lit(f"bf{s}|"), F.col("k").cast("string"))),
            F.lit(m_bits),
        )
        word = F.element_at("__bf", (p / 64).cast("int") + 1)
        mask = F.expr(
            f"shiftleft(1L, CAST(pmod(xxhash64(concat('bf{s}|', CAST(k AS STRING))), {m_bits}) % 64 AS INT))"
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    surviving = sorted(r["k"] for r in probe.filter(cond).collect())
    matches = sorted(k for k in fact_keys if k in set(dim_keys))
    # no false negatives: every true match survives the prefilter
    assert set(matches) <= set(surviving)
    # end-to-end exactness: prefilter + exact semi-join == semi-join
    exact = sorted(
        r["k"]
        for r in probe.filter(cond)
        .join(dim.distinct(), "k", "left_semi")
        .collect()
    )
    assert exact == matches


@given(
    members=st.lists(st.integers(0, 30), min_size=0, max_size=25, unique=True),
)
@settings(**_SETTINGS)
def test_property_cooccurrence_pair_stream_is_exact_half(spark, members):
    """One bucket of n distinct members must yield exactly C(n,2) pairs
    with u < v and i = 1 — the sorted-slice explode must not duplicate
    or drop pairs."""
    from grouper_spark.operators.dedup import cooccurrence_pairs

    df = spark.createDataFrame(
        [(u, "b", "d") for u in members] or [], "uid long, et string, d string"
    )
    got = {
        (r["u"], r["v"]): r["i"]
        for r in cooccurrence_pairs(df, "uid", ["et", "d"], max_bucket=4096).collect()
    }
    want = {
        (a, b): 1
        for a in members
        for b in members
        if a < b
    }
    assert got == want
