"""Driver-side replicas of engine-exact scalar arithmetic.

Used by queries whose iterative tail runs on a bounded (O(dim²) /
O(cells)) table: after the corpus-sized Spark pass, the remaining
fixed-point iteration is pure scalar arithmetic, and running it on the
driver removes dozens of per-iteration Spark jobs without changing a
single output bit — PROVIDED the scalar ops replicate Spark's exactly.

The one non-trivial op is ``F.round(double_expr, 0)``: Spark routes a
double through ``BigDecimal.valueOf`` (i.e. ``Double.toString``, a
round-trip decimal rendering) and rounds HALF_UP (away from zero).
Python's ``repr(float)`` is likewise a round-trip rendering; at scale 0
two round-trip renderings of the SAME double always round identically,
because a tie needs the literal decimal ``n.5`` and a rendering equal
to n.5 parses back to the double n.5 itself — so the literal appears
iff the input double IS exactly n.5, in which case both runtimes emit
it. (At higher scales this argument does not hold; keep fractional
rounding engine-side.)
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def round0_half_up(x: float) -> int:
    """Integer result of Spark's ``F.round(lit_double, 0)`` (HALF_UP,
    via the round-trip decimal rendering — see module docstring)."""
    return int(
        Decimal(repr(float(x))).quantize(
            Decimal("1"), rounding=ROUND_HALF_UP
        )
    )


def round0_half_up_vec(a):
    """Vectorized ``round0_half_up`` over a float64 ndarray → int64.

    Computes HALF_UP on the TRUE binary value with exact float steps:
    for |v| < 2**52 both ``floor(|v|)`` and ``|v| - floor(|v|)`` are
    exactly representable (the fractional part is a tail of the
    significand), so the ``frac >= 0.5`` test is exact; for
    |v| >= 2**52 the value is already integral and passes through.
    That equals HALF_UP on the round-trip rendering because a tie
    needs the rendering to be exactly ``n.5``, which round-trips to
    the double ``n.5`` itself — any non-tie double renders strictly
    on its own side of the boundary (module docstring). Caller must
    guard |v| < 2**63 (int64) — values at the bench's fixed-point
    scales are orders of magnitude below it.
    """
    import numpy as np

    aa = np.abs(a)
    i = np.floor(aa)
    r = np.where(aa - i >= 0.5, i + 1.0, i)
    return np.copysign(r, a).astype(np.int64)
