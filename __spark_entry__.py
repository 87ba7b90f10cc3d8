"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``grouper_spark``; this module only
re-exports the registry (grouper_spark.queries.REGISTRY).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from grouper_spark.queries import load_all
from grouper_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-style pricing summary: scan → filter → hash agg → sort.
    """
    tune_session(spark)
    registry = load_all()
    return registry["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry = load_all()

    def bind(qdef):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return qdef.fn(spark, sf_dir)

        run.__name__ = qdef.name
        return run

    return {name: bind(qdef) for name, qdef in sorted(registry.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries (streaming / LSH /
    hash-seeded ops) get the driver's rows-only check."""
    registry = load_all()
    return {
        name: qdef.oracle
        for name, qdef in sorted(registry.items())
        if qdef.oracle is not None
    }
