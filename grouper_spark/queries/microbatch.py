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
