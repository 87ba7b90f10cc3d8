"""Helpers for writing DuckDB oracle SQL that is bit-exact vs Spark.

Float SUM/AVG accumulate in engine-specific order, so raw double
aggregates don't hash-match across engines. Both sides therefore sum
integer fixed-point units (order-independent, exact) and divide once at
the end — see ``grouper_spark.functions.text.money``. These helpers emit
the SQL half of that contract.
"""

from __future__ import annotations


def sql_money_sum(expr: str, alias: str, scale: int = 2) -> str:
    s = 10**scale
    return (
        f"SUM(CAST(ROUND(({expr}) * {s}.0, 0) AS BIGINT)) / {s}.0 AS {alias}"
    )


def sql_money_avg(expr: str, alias: str, scale: int = 4) -> str:
    s = 10**scale
    return (
        f"SUM(CAST(ROUND(({expr}) * {s}.0, 0) AS BIGINT)) / {s}.0"
        f" / COUNT({expr}) AS {alias}"
    )


def sql_money_cell(expr: str, alias: str, scale: int = 2) -> str:
    """Per-row fixed-point projection (no aggregation)."""
    s = 10**scale
    return f"CAST(ROUND(({expr}) * {s}.0, 0) AS BIGINT) / {s}.0 AS {alias}"
