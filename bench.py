"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.

Execution is forced with the noop sink (full computation, no driver
collect) except for intentionally-small results, which are collected.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from grouper_spark.queries import load_all  # noqa: E402
from grouper_spark.session import (  # noqa: E402
    get_spark,
    silence_accumulator_spam,
)

# Headline set: one per operator family, weighted toward shuffle-heavy ops.
# The first 11 are the round-1 continuity set (comparable across BENCH_r*
# files); the second group covers the heaviest round-2 surface so its
# wall-times are measured, not inferred from plan shape.
HEADLINE = (
    "q01_pricing_summary",    # scan + hash agg
    "q05_group_count_distinct",
    "q12_shuffle_join",       # fact⋈fact join
    "q13_multi_join_topk",    # 3-way join + agg + top-k
    "q18_window_rank",        # window battery
    "q21_asof_join",          # as-of merge
    "q27_session_window",     # sessionization
    "q31_fingerprint",        # text hashing battery
    "q34_ngram_jaccard",      # shingle join dedup
    "q35_minhash_lsh",        # LSH dedup
    "q37_ann_bruteforce",     # similarity search
    # round-2 surface
    "q83_neardup_lsh_rerank",   # banded LSH + exact rerank
    "q104_span_dedup",          # duplicated-span detection
    "q144_semantic_dedup",      # SemDeDup cluster + in-cell cosine
    "q145_prefix_filter_join",  # PPJoin-lite set-similarity join
    "q146_triangle_count",      # bounded co-visitation triangles
    "q165_bucketed_join",       # shuffle-free bucketed fact join
    # round-3 surface (baselined this round for r4 comparisons)
    "q194_bloom_prefiltered_join",  # runtime-filter bitmap prefilter
    "q198_tfidf_knn",               # sparse posting-list A·Aᵀ
    "q201_cogroup_reconcile",       # cogrouped Arrow batch UDF
    "q206_mapinarrow_kernel",       # pyarrow.compute columnar kernel
    "q222_grid_spatial_join",       # grid-cell spatial radius join
    "q229_capped_running_balance",  # ordered-collect recurrence fold
    # round-3b surface (oracle-checkable LSH + linalg + connector)
    "q238_minhash_oracled",         # md5-MinHash signatures + banding
    "q249_power_iteration",         # gramian + 5 exact integer iterations
    "q253_python_datasource",       # Python DataSource partitioned read
    # round-4 surface (baselined this round for r5 comparisons)
    "a345_kneser_ney",              # bigram shuffle + vocab-scale KN smoothing
    "a353_permutation_test",        # 20-way replicated rank-and-sum
    "a355_mrl_truncation_audit",    # 4-width cosine audit, one projection
    "a357_label_propagation",       # co-purchase pair join + vote windows
    # round-5 surface (heaviest never-benched r4 queries, r4 verdict #6)
    "a381_product_quantization",    # PQ codes + distortion census
    "a386_source_overlap_matrix",   # inter-source n-gram contamination
    "a404_lsh_prf_eval",            # LSH P/R/F1 vs exact posting truth
    # round-5b surface (heaviest new r5 operators)
    "a436_bradley_terry",           # duel self-join + 20-step MM matrix fold
    "a440_geometric_median",        # 6 Weiszfeld passes, fixed-point sums
    "a450_lof_panel",               # three bounded×corpus 2-hop LOF sweeps
    # round-7 surface (heaviest never-benched r5 queries, r5 verdict #4,
    # r6 verdict #5)
    "a444_wasserstein_1d",          # per-source exact 1-D transport distances
    "a447_haar_wavelet_energy",     # log2-depth pairwise averaging cascade
    "a448_ipf_raking",              # 4-pass IPF margin/scale iteration
    "a459_kcenter_seeding",         # 8 greedy max-min corpus sweeps
)


def run_one(spark, qdef, sf_dir: str) -> float:
    t0 = time.time()
    df = qdef.fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def grouper_throughput(n_items: int = 50_000) -> float:
    """Items/s through the in-process Grouper micro-batch layer.

    Comparable to the reference's analytic model (README.md:44-50):
    batch=100, 10 ms simulated round-trip per batch ⇒ the model says
    ~909 items/s for a serial remote store. Our figure measures the
    engine overhead against that same workload shape.
    """
    import time as _t

    from grouper_spark.streaming import Grouper

    def proc(xs):
        _t.sleep(0.010)  # the reference model's 10 ms per-batch round-trip
        return [x + 1 for x in xs]

    t0 = _t.time()
    with Grouper(proc, capacity=100, interval=None, pool=8) as g:
        futs = [g.submit(i) for i in range(n_items)]
        g.flush()
        last = futs[-1].result(60)
    dt = _t.time() - t0
    assert last == n_items, last
    return n_items / dt


def jvm_calibration(spark) -> float:
    """Fixed-work, data-independent JVM probe: hash + fold 8e9 longs over
    a pinned partition count, min-of-3 seconds (~2 s on a healthy host —
    large enough that scheduler jitter is <5% of the reading).

    The host's CPU clock is burstable (r3: a +37% continuity swing on
    byte-identical query code), so absolute wall times are not comparable
    across rounds. This probe does the same work every round on the same
    partition layout — its wall time moves ONLY with host speed, making
    ``continuity / calib`` the round-over-round comparable figure.
    """
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.time()
        (
            spark.range(0, 8_000_000_000, 1, 64)
            .select(F.xxhash64("id").alias("h"))
            .agg(F.bit_xor("h"))
            .collect()
        )
        return time.time() - t0

    return min(once() for _ in range(3))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Measure the in-process Grouper layer BEFORE the Spark JVM exists —
    # its 32 executor threads + GC otherwise contend with the pool and
    # add run-to-run noise to a pure-Python throughput figure.
    grouper_items_s = round(grouper_throughput(), 1)

    registry = load_all()
    spark = get_spark("grouper-bench")
    spark.sparkContext.setLogLevel("ERROR")
    silence_accumulator_spam(spark)

    # Host-speed calibration BEFORE the query loop (steady JVM, no page
    # cache effects — the probe reads no files).
    calib_jvm_sec = round(jvm_calibration(spark), 3)

    # JVM/codegen warmup on the smallest fixture so measured times are
    # steady-state compute, not first-query JIT.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        run_one(spark, registry["q01_pricing_summary"], warm_dir)

    # min of three runs per query: later runs reuse JIT'd codegen and
    # warmed file listings, so the min reports steady-state compute
    # rather than scheduler jitter (the host's CPU clock is burstable —
    # identical work varies several-fold run to run, so two samples
    # under-estimate the floor)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t = min(run_one(spark, registry[name], sf_dir) for _ in range(3))
        timings[name] = round(t, 3)

    total = round(sum(timings.values()), 3)
    # sum over the round-1 continuity set only, comparable to BENCH_r1/r2
    continuity = round(sum(timings[n] for n in HEADLINE[:11]), 3)

    # sf1 scale point (r7 verdict #5): the 10 heaviest headline queries
    # re-timed on the 10x-staged fixture (~1.5M orders / 6M lineitems ≈
    # sf1) so the "plans survive 10x" claim is wall-clock empirical, not
    # plan-shape-only. min-of-2 per query (r8 verdict #8: single-shot
    # sf1 numbers carry 36%-class JVM noise), and the section records
    # total/jvm_fixed_work_sec so sf1 deltas can be normalized the same
    # way the continuity set is. Opt out with SPARK_GRAFT_SF1=0;
    # skipped silently if the staged dir is absent
    # (tools/stage_scale10.py creates it).
    sf1_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "spark-warehouse",
        "scale10",
    )
    sf1: dict | None = None
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0" and os.path.isdir(
        sf1_dir
    ):
        heavy = (
            "a381_product_quantization",
            "a440_geometric_median",
            "a355_mrl_truncation_audit",
            "q249_power_iteration",
            "a404_lsh_prf_eval",
            "q83_neardup_lsh_rerank",
            "q146_triangle_count",
            "a459_kcenter_seeding",
            "a450_lof_panel",
            "a448_ipf_raking",
            # r9 verdict #3: the two slowest scale10-sweep queries were
            # invisible to this section — time them where they hurt.
            "a191_passing_bablok",   # O(days^2) pair stage, scale-constant
            "q56_ann_ivf",           # IVF coarse quantizer + cell rerank
        )
        sf1_timings = {
            name: round(
                min(run_one(spark, registry[name], sf1_dir) for _ in range(2)),
                3,
            )
            for name in heavy
        }
        sf1_total = round(sum(sf1_timings.values()), 3)
        sf1 = {
            "dir": sf1_dir,
            "approx_sf": 1.0,
            "queries": sf1_timings,
            "total": sf1_total,
            # same normalization contract as continuity_normalized:
            # sf1 wall in units of the fixed-work JVM probe.
            "total_normalized": round(sf1_total / calib_jvm_sec, 3),
        }
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "value_r1_continuity_set": continuity,
                "calib": {
                    # fixed-work JVM probe (xxhash64+bit_xor over 8e9 ids,
                    # 64 pinned partitions, min-of-3): moves only with
                    # host speed. r4 reference on a healthy host: record
                    # alongside continuity each round.
                    "jvm_fixed_work_sec": calib_jvm_sec,
                    # pure-Python probe (Grouper micro-batch layer):
                    # second, JVM-free witness of host speed.
                    "python_grouper_items_per_s": grouper_items_s,
                },
                # THE round-over-round comparable: continuity wall time in
                # units of the fixed-work probe. Host slowdown cancels.
                "continuity_normalized": round(
                    continuity / calib_jvm_sec, 3
                ),
                "queries": timings,
                "sf1_headline": sf1,
                "sf": sf,
                "grouper_throughput_items_per_s": grouper_items_s,
                "grouper_baseline_items_per_s": 909.0,
            }
        )
    )


if __name__ == "__main__":
    main()
