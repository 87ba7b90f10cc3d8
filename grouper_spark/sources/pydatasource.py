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
        # Job-unique id, minted driver-side and shipped to every task
        # via pickling: it names this job's staging directory, so
        # commit()/abort() can remove this job's leftover litter
        # (failed-before-message tasks, lost speculative attempts)
        # without touching a concurrent job's in-flight files.
        self.job_id = uuid.uuid4().hex[:12]

    def _pending_dir(self) -> str:
        import os

        # Job-scoped staging directory (the FileOutputCommitter
        # `_temporary/<attempt>` design): every task .tmp lives HERE,
        # never in the table directory. This is what makes the protocol
        # robust to zombie workers that are SIGKILLed between creating
        # a .tmp and any self-cleanup — no driver sweep can win that
        # race file-by-file (the marker handshake only helps a worker
        # that lives long enough to check it), but litter confined to
        # the staging dir is invisible to readers and to directory
        # listings of the table path, and abort/commit remove the whole
        # tree best-effort.
        return os.path.join(self.path, f"_pending-{self.job_id}")

    def write(self, rows):
        import json
        import os
        import uuid

        os.makedirs(self._pending_dir(), exist_ok=True)
        tmp = f"task-{self.job_id}-{uuid.uuid4().hex}.jsonl.tmp"
        n = 0
        try:
            with open(os.path.join(self._pending_dir(), tmp), "w") as fh:
                for r in rows:
                    fh.write(json.dumps(r.asDict()) + "\n")
                    n += 1
        except BaseException:
            # a task failing mid-write cleans its own litter instead of
            # relying on the driver sweep
            try:
                os.remove(os.path.join(self._pending_dir(), tmp))
            except OSError:
                pass
            raise
        # Zombie-task guard: a task can finish AFTER the driver's
        # abort() removed the staging tree. Ordering: the task writes
        # its .tmp THEN checks the abort marker; the driver writes the
        # marker THEN removes staging — a surviving zombie either gets
        # cleaned by the tree removal or sees the marker and cleans
        # itself; a SIGKILLed one leaves litter only inside the
        # recreated staging dir, which readers never consult.
        if os.path.exists(os.path.join(self.path, f"_ABORTED-{self.job_id}")):
            import shutil

            shutil.rmtree(self._pending_dir(), ignore_errors=True)
        return _JsonlCommitMessage(tmp, n)

    def commit(self, messages):
        import os
        import shutil

        final = []
        for m in messages:
            if m is None:
                continue
            dst = m.tmp_name[: -len(".tmp")]
            os.replace(
                os.path.join(self._pending_dir(), m.tmp_name),
                os.path.join(self.path, dst),
            )
            final.append(dst)
        shutil.rmtree(self._pending_dir(), ignore_errors=True)
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
        import shutil

        # marker BEFORE staging removal (see write(): the pairing
        # covers zombies that survive to their check). One zero-byte
        # marker per aborted job stays behind; readers only consult
        # _MANIFEST, so it is inert.
        try:
            with open(
                os.path.join(self.path, f"_ABORTED-{self.job_id}"), "w"
            ):
                pass
        except OSError:
            pass
        shutil.rmtree(self._pending_dir(), ignore_errors=True)


class JsonlCommitDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_commit"

    def writer(self, schema: StructType, overwrite: bool):
        return JsonlCommitWriter(self.options, overwrite=overwrite)
