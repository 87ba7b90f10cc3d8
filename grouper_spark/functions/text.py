"""Text/number helpers shared by the query inventory.

``money`` exists because the correctness gate hashes float values computed
independently by Spark and DuckDB: a double SUM accumulates in a different
order in each engine, so the last bits differ and a naive ROUND(sum, 2) can
land on opposite sides of a rounding boundary. Summing *integer cents*
instead is order-independent and bit-exact in both engines; one final
division by the scale yields an identical double. Every aggregate in the
oracle-checked queries uses this pattern on both the Spark and SQL sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(col: Column | str, scale: int = 2) -> Column:
    """Exact fixed-point representation: round(col * 10^scale) as bigint."""
    col = F.col(col) if isinstance(col, str) else col
    return F.round(col * F.lit(float(10**scale)), 0).cast("bigint")


def money_sum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-independent double SUM: sum integer units, divide once."""
    return (F.sum(money(col, scale)) / F.lit(float(10**scale))).alias(alias)


def money_avg(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Order-independent AVG derived from the integer-unit sum."""
    c = money(col, scale)
    return (F.sum(c) / F.lit(float(10**scale)) / F.count(c)).alias(alias)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty string → empty array (not [''])."""
    col = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def normalized_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    col = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles of a text column, as an array<string>.

    Built from sequence/transform/slice — stays in codegen. For a text of
    w words this yields max(w-n+1, 0) shingles, deduplicated.
    """
    toks = tokens(col)
    k = F.size(toks) - F.lit(n - 1)
    # sequence(1, k) with k < 1 would count DOWN in Spark; guard explicitly.
    return F.when(k < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        )
    )
