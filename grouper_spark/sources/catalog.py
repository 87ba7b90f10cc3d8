"""Table catalog over the parquet fixtures.

Every query loads through here so scan behavior is uniform:
``spark.read.parquet`` gives vectorized columnar scans with predicate
pushdown and column pruning for free via Catalyst — verify with
``df.explain("formatted")`` (PushedFilters / ReadSchema lines).

At 100 TB the same call reads a partitioned parquet lake; nothing in the
query layer changes — partition pruning kicks in when the lake is laid
out by date/key and filters reference those columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast, at any scale factor.
# region=5, nation=25 rows at every SF; supplier/part grow with SF but stay
# dimension-sized relative to the fact tables.
BROADCAST_DIMS = frozenset({"region", "nation"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # Parquet TIMESTAMP(NANOS) surfaces as long under
        # spark.sql.legacy.parquet.nanosAsLong; truncate to micros —
        # the same truncation DuckDB applies reading the same file.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, TimestampNTZType)
    ]
    for col in ntz:
        # Fixture generations vary between TIMESTAMP(NANOS) and plain
        # micros-NTZ. Normalize NTZ to session-tz (LTZ) timestamps: with
        # the session tz pinned to UTC this is the same instant and the
        # same wall clock DuckDB sees, and LTZ is required by event-time
        # operators (withWatermark rejects TIMESTAMP_NTZ).
        df = df.withColumn(col, F.col(col).cast("timestamp_ltz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register all fixture tables as temp views for spark.sql queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
