"""Custom Python data source (Spark 4 DataSource API): a deterministic
synthetic series generator, the template for plugging a bespoke system
(feature store, internal log service, simulation) into the engine as a
first-class `spark.read.format(...)` connector with real partition
planning — each InputPartition generates its id range independently, so
a 1000-executor cluster reads 1000 splits in parallel with no driver
bottleneck and no shuffle.

Rows are pure functions of the id (md5-derived values), so any SQL
engine can reproduce the content exactly — which is what lets the
connector sit under an oracle-checked query (q253).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


def synth_row(i: int) -> tuple[int, int, int]:
    """Deterministic row content for id ``i`` — mirrored in q253's SQL."""
    h = hashlib.md5(f"syn|{i}".encode()).hexdigest()
    return i, i % 16, int(h[:8], 16) % 100000


class _SynthPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticSeriesReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 100000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        step = (self.n + self.parts - 1) // self.parts
        return [
            _SynthPartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _SynthPartition):
        for i in range(partition.start, partition.end):
            yield synth_row(i)


class SyntheticSeriesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_series"

    def schema(self) -> str:
        return "id bigint, bucket bigint, val_cents bigint"

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticSeriesReader(self.options)
