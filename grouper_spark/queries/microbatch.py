"""Grouper micro-batch layer as a registered query (rows-only check:
streaming batch boundaries aren't SQL-expressible, but row counts and
schema are stable)."""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from ..sources import table
from ..streaming import grouper_process_stream
from . import query


@query("q40_grouper_stream", oracle=None, tags=("streaming", "rows_only"))
def q40_grouper_stream(spark, sf_dir):
    """Replay the events table through the Structured-Streaming grouper
    path (availableNow drain == reference close/drain semantics): batch fn
    uppercases event_type and doubles value; per-batch status columns
    implement the error-as-value channel."""

    def proc(batch_df):
        return batch_df.select(
            "event_id",
            F.upper("event_type").alias("event_type_upper"),
            (F.col("value") * 2).alias("value_doubled"),
        )

    # Stage the table as a 4-file directory so availableNow +
    # maxFilesPerTrigger=1 actually exercises multiple micro-batches.
    source_dir = os.path.join(
        tempfile.gettempdir(), f"grouper-src-{uuid.uuid4().hex}"
    )
    table(spark, sf_dir, "events").repartition(4).write.parquet(source_dir)

    out = grouper_process_stream(
        spark,
        source_dir,
        proc,
        interval_ms=None,
        max_files_per_trigger=1,
    )
    return out.select(
        "event_id", "event_type_upper", "value_doubled", "status"
    ).orderBy("event_id")


@query(
    "q52_stream_watermark_window",
    oracle=f"""
SELECT date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events,
       SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)) / 100.0 AS total_value
FROM events
GROUP BY window_start
ORDER BY window_start
""",
    tags=("streaming", "event_time"),
)
def q52_stream_watermark_window(spark, sf_dir):
    """Event-time tumbling window + watermark over a real stream
    (readStream → withWatermark → window agg → availableNow drain,
    complete output). State is keyed by window — at scale this is
    RocksDB-backed streaming state. Complete-mode totals equal the
    batch aggregation, so this streaming query carries an exact SQL
    oracle."""
    src = os.path.join(tempfile.gettempdir(), f"grouper-wm-{uuid.uuid4().hex}")
    table(spark, sf_dir, "events").repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    name = f"wm_{uuid.uuid4().hex[:12]}"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint")) / 100.0
            ).alias("total_value"),
        )
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )
