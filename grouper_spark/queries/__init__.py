"""Query inventory registry.

Each operator from SURVEY.md §2.D registers here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible)
the equivalent DuckDB oracle SQL. ``__spark_entry__.py`` re-exports the
registry for the driver's correctness gate.

Column-name contract: every computed column is aliased identically in the
Spark code and the oracle SQL — the driver sorts columns by name before
hashing values.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QueryDef] = {}

_MODULES = (
    "relational",
    "joins",
    "windows",
    "events",
    "text",
    "dedup",
    "similarity",
    "functions_battery",
    "pandas_udfs",
    "microbatch",
    "multimodal",
    "pipeline",
    "curation",
    "subqueries",
    "quality",
    "analytics",
    "temporal",
    "lm",
    "monitoring",
    "versioning",
    "indexing",
    "skew",
    "inference",
    "inference2",
    "inference3",
    "inference4",
    "inference5",
    "inference6",
    "inference7",
    "inference8",
    # keep last: re-registers existing queries under driver-sampler
    # alias names (depends on every other module being loaded)
    "aliases",
)


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name, fn, oracle, tuple(tags))
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    return REGISTRY
