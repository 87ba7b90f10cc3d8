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
