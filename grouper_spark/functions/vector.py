"""Vector math over ``array<float>`` columns — pure JVM-side expressions.

All of these compile to Catalyst higher-order functions (``zip_with`` /
``aggregate`` / ``transform``), so they run inside whole-stage codegen
with zero Python/serialization cost. This is the hot path for similarity
search over embedding columns; a Pandas-UDF variant would move every
vector through Arrow for no gain at these dimensions (64–4096).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length float arrays (accumulated in double)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; zero vectors get 0.0 (not a divide-by-zero —
    ANSI mode is on, so an unguarded /0 would fail the whole stage)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def l2_normalize(a: Column | str) -> Column:
    """Scale a vector to unit L2 norm (pre-normalization turns cosine top-k
    into dot-product top-k — one aggregate per pair instead of three).
    Zero vectors pass through unchanged (guarded divisor, ANSI-safe)."""
    a = F.col(a) if isinstance(a, str) else a
    n = l2_norm(a)
    safe = F.when(n == 0, F.lit(1.0)).otherwise(n)
    return F.transform(a, lambda x: x.cast("double") / safe)
