"""Structured-Streaming face of the Grouper layer.

The reference's dispatcher loop (core.clj:124-135) IS Spark's
micro-batch execution: ``Trigger.ProcessingTime`` ≈ ``:interval``,
``maxFilesPerTrigger`` ≈ ``:capacity`` rate limiting, and
``Trigger.AvailableNow`` is the graceful drain of close (core.clj:58-66).
``foreachBatch`` plays body-fn (core.clj:68-83): it applies the user's
batch transform and — crucially — implements the reference's
*error-as-value, no-retry* contract by catching inside the batch
function and emitting status/error columns instead of letting Spark's
task-retry machinery re-run user side effects the reference would never
re-run.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def grouper_process_stream(
    spark: SparkSession,
    source_dir: str,
    proc_fn: Callable[[DataFrame], DataFrame],
    *,
    schema=None,
    interval_ms: int | None = None,
    max_files_per_trigger: int = 1,
    result_dir: str | None = None,
) -> DataFrame:
    """Run a parquet-directory stream through a grouper-style batch fn.

    - ``interval_ms=None`` → one-shot drain (Trigger.AvailableNow), the
      deterministic mode used by tests and the driver.
    - ``max_files_per_trigger`` bounds batch size (capacity analogue).
    - Each micro-batch gets ``batch_id`` plus ``status``/``error``
      columns; a failing batch is recorded, not retried.

    Returns the accumulated result as a DataFrame read back from the
    result sink.
    """
    if schema is None:
        schema = spark.read.parquet(source_dir).schema
    if result_dir is None:
        result_dir = os.path.join(
            tempfile.gettempdir(), f"grouper-stream-{uuid.uuid4().hex}"
        )

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        try:
            out = proc_fn(batch_df)
            out = out.withColumn("batch_id", F.lit(batch_id)).withColumn(
                "status", F.lit("ok")
            ).withColumn("error", F.lit(None).cast("string"))
        except Exception as exc:  # error-as-value: never let Spark retry
            # Dead-letter channel: same fate for the whole batch
            # (batch-granular failure, core.clj:80-83), separate sink so
            # the ok-result schema stays uniform.
            batch_df.select(
                F.lit(batch_id).alias("batch_id"),
                F.lit("error").alias("status"),
                F.lit(str(exc)).alias("error"),
            ).write.mode("append").parquet(result_dir + "-errors")
            return
        out.write.mode("append").parquet(result_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    writer = stream.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation",
        os.path.join(tempfile.gettempdir(), f"grouper-ckpt-{uuid.uuid4().hex}"),
    )
    if interval_ms is None:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
    else:
        query = writer.trigger(processingTime=f"{interval_ms} milliseconds").start()
        query.processAllAvailable()
        query.stop()
    if not os.path.exists(result_dir):
        # every batch failed → only the dead-letter sink has rows
        return spark.createDataFrame(
            [], "batch_id long, status string, error string"
        )
    return spark.read.parquet(result_dir)
