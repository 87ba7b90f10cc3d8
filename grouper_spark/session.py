"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32) but every
config below is chosen for the 1000-executor / 100 TB design point:

- AQE on (runtime join-strategy switch, skew-join splitting, partition
  coalescing) — the single most important knob at scale.
- ``spark.sql.shuffle.partitions`` sized from the environment; at cluster
  scale AQE coalesces down from a deliberately-high initial number.
- Arrow enabled so any Pandas-UDF fallback is batch-columnar, never
  row-at-a-time pickling.
- Session timezone pinned to UTC so event-time semantics are stable and
  oracle (DuckDB, tz-naive) comparisons are deterministic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "grouper-spark",
    *,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    # local[N] runs driver + executors in ONE JVM; the 1g driver default
    # starves N concurrent task threads (measured: 32-way array fan-outs
    # OOM a 1g heap). Sized for the test host; on a real cluster the
    # submitter's --driver-memory/--executor-memory govern instead.
    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", heap)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS); Spark reads those as
        # long when this is on, and the catalog converts to micros.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def silence_accumulator_spam(spark: SparkSession) -> None:
    """Mute DAGScheduler's benign post-GC accumulator errors.

    ``localCheckpoint`` + AQE job cleanup GCs accumulators while straggler
    tasks are still completing; each late update then logs a full
    ``SparkException: attempted to access non-existent accumulator`` stack
    trace at ERROR (hundreds per bench run), burying any real failure.
    The update is harmless — results are already in — so raise that one
    logger to FATAL. Real errors still surface through TaskSetManager
    logs and the raised job exception.
    """
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.scheduler.DAGScheduler",
            jvm.org.apache.logging.log4j.Level.FATAL,
        )
    except Exception:  # log4j internals moved — degrade to noisy logs
        pass


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an externally-created session.

    The driver hands us its own SparkSession; static confs (master, memory)
    are out of our hands, but SQL confs are runtime-settable and matter for
    plan quality, so set them defensively here.
    """
    rt = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
    }
    for k, v in rt.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # static/locked conf on this session — keep going
            pass
    return spark
