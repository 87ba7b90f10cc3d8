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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
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


class _JsonlCommitMessage(WriterCommitMessage):
    def __init__(self, tmp_name: str, n_rows: int):
        self.tmp_name = tmp_name
        self.n_rows = n_rows


class JsonlCommitWriter(DataSourceWriter):
    """Two-phase-commit JSONL sink: each task writes a .tmp file and
    reports it in its commit message; only the driver-side commit()
    renames task output into place and publishes the _MANIFEST, so a
    failed/partial job leaves nothing visible — the exactly-once file
    layout protocol (same contract FileStreamSink implements in Scala),
    here as the Python DataSourceWriter surface."""

    def __init__(self, options, overwrite: bool = True):
        import uuid

        self.path = options["path"]
        self.overwrite = overwrite
        # Job-unique prefix, minted driver-side and shipped to every
        # task via pickling: commit()/abort() can then glob this job's
        # leftover .tmp litter (failed-before-message tasks, lost
        # speculative attempts) without touching a concurrent job's
        # in-flight files.
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, rows):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = f"task-{self.job_id}-{uuid.uuid4().hex}.jsonl.tmp"
        n = 0
        try:
            with open(os.path.join(self.path, tmp), "w") as fh:
                for r in rows:
                    fh.write(json.dumps(r.asDict()) + "\n")
                    n += 1
        except BaseException:
            # a task failing mid-write cleans its own litter instead of
            # relying on the driver sweep
            try:
                os.remove(os.path.join(self.path, tmp))
            except OSError:
                pass
            raise
        # Zombie-task guard: a task can finish AFTER the driver's
        # abort() swept this job's .tmp files. The ordering makes the
        # handoff race-free: the task writes its .tmp THEN checks the
        # abort marker; the driver writes the marker THEN sweeps. Every
        # interleaving either has the sweep see the .tmp or the task
        # see the marker.
        if os.path.exists(os.path.join(self.path, f"_ABORTED-{self.job_id}")):
            try:
                os.remove(os.path.join(self.path, tmp))
            except OSError:
                pass
        return _JsonlCommitMessage(tmp, n)

    def _sweep_tmp(self):
        """Remove every .tmp file this job created that was never
        promoted by commit() — tasks that died before returning a
        commit message leave these behind with no message to name them."""
        import glob
        import os

        for p in glob.glob(
            os.path.join(self.path, f"task-{self.job_id}-*.jsonl.tmp")
        ):
            try:
                os.remove(p)
            except OSError:
                pass

    def commit(self, messages):
        import os

        final = []
        for m in messages:
            if m is None:
                continue
            dst = m.tmp_name[: -len(".tmp")]
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, dst),
            )
            final.append(dst)
        self._sweep_tmp()
        manifest = os.path.join(self.path, "_MANIFEST")
        if not self.overwrite and os.path.exists(manifest):
            # mode('append'): the manifest is the reader-visible table
            # state, so a second append must UNION its files with the
            # earlier commits' — rewriting it with only this job's files
            # would silently unpublish prior appends.
            with open(manifest) as fh:
                final.extend(
                    line.strip() for line in fh if line.strip()
                )
        with open(manifest, "w") as fh:
            fh.write("\n".join(sorted(set(final))) + "\n")

    def abort(self, messages):
        import os

        # marker BEFORE sweep (see write(): the pairing is what closes
        # the zombie-task window). One zero-byte marker per aborted job
        # stays behind; readers only consult _MANIFEST, so it is inert.
        try:
            with open(
                os.path.join(self.path, f"_ABORTED-{self.job_id}"), "w"
            ):
                pass
        except OSError:
            pass
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except OSError:
                pass
        self._sweep_tmp()


class JsonlCommitDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_commit"

    def writer(self, schema: StructType, overwrite: bool):
        return JsonlCommitWriter(self.options, overwrite=overwrite)
