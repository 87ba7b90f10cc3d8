"""Source/sink helpers beyond the fixture catalog.

The reference has no file formats at all (its only buffer is an
in-memory queue, core.clj:27); an analytics engine needs real lake I/O.
These helpers standardize the layouts that matter at 100 TB:

- ``read_any``: format-dispatching reader (parquet/csv/json/orc) with
  the same downstream behavior as the parquet catalog.
- ``write_partitioned``: hive-style partition layout (e.g. by event
  date) so partition pruning turns time-range scans into directory
  listings.
- ``write_bucketed``: bucketed + sorted table so repeated large joins
  on the bucket key become shuffle-free (both sides pre-clustered).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "csv", "json", "orc")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; have {FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    return reader.options(**options).load(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options,
) -> None:
    """Hive-partitioned layout — the default for fact tables at scale:
    filters on the partition columns prune at file-listing time."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; have {FORMATS}")
    (
        df.write.format(fmt)
        .mode(mode)
        .partitionBy(*partition_by)
        .options(**options)
        .save(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates join keys so fact⋈fact joins
    on the bucket key skip the shuffle entirely (both sides read
    pre-clustered). At 100 TB this is the difference between an
    every-query shuffle and a one-time layout cost."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)
