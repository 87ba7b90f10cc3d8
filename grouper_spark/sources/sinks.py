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


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    target_rows_per_file: int,
    order_by: Sequence[str] | None = None,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction — the OPTIMIZE pass every streaming sink
    eventually needs: micro-batches leave thousands of KB-sized files,
    and at 100 TB the NameNode/listing cost and per-file scan overhead
    dominate. Rewrites ``src_path`` into ``ceil(n/target)`` files; with
    ``order_by`` the rewrite range-partitions + sorts within files
    (Z-order-lite clustering: range partitioning gives disjoint
    envelopes per file, so zone maps actually prune).

    Returns the number of output files requested. Counting rows costs
    one scan; the rewrite is the second — same two-pass cost profile as
    Delta's OPTIMIZE."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; have {FORMATS}")
    df = spark.read.format(fmt).load(src_path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    if order_by:
        df = df.repartitionByRange(n_files, *order_by).sortWithinPartitions(
            *order_by
        )
    else:
        df = df.repartition(n_files)
    df.write.format(fmt).mode("overwrite").save(dst_path)
    return n_files


def read_merged_schema(
    spark: SparkSession, path: str, fmt: str = "parquet", **options
) -> DataFrame:
    """Schema-evolution read: union the schemas of every file under
    ``path`` (``mergeSchema``) so older files missing newer columns
    surface them as NULL — the contract a long-lived ingest directory
    needs once producers add fields. Parquet/ORC only (the formats
    whose footers carry a schema)."""
    if fmt not in ("parquet", "orc"):
        raise ValueError("schema merge needs a self-describing format")
    return (
        spark.read.format(fmt)
        .option("mergeSchema", "true")
        .options(**options)
        .load(path)
    )
