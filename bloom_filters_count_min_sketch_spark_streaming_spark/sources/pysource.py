"""Custom Python data source (Spark 4 DataSource API, SURVEY §2.B B2).

A user-defined source the engine can register and scan like any built-in
format: ``spark.read.format("bfcms_synth")``. Demonstrates the full
contract — schema declaration, partition planning (the source decides its
own parallelism; each partition is generated independently on an
executor), and Arrow-batched row production.

The source is a deterministic synthetic event generator (pure integer
LCG keyed by row id — no RNG state, so any engine can reproduce it
closed-form; the DuckDB oracle regenerates the same rows from
generate_series). Rows never exist at rest: the "scan" is computation,
which is exactly how a 100 TB synthetic-load or fuzz source should work —
O(0) storage, parallelism = requested partitions.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_MUL = 48271  # Park-Miller multiplier; value = (id * MUL) % MOD
_MOD = 100003


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SynthReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("parts", 8))
        self.buckets = int(options.get("buckets", 16))

    def partitions(self):
        per = max(1, -(-self.rows // self.parts))  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.rows))
            for lo in range(0, self.rows, per)
        ]

    def read(self, partition):
        buckets = self.buckets
        for i in range(partition.start, partition.end):
            yield (i, i % buckets, float((i * _MUL) % _MOD))


class SynthDataSource(DataSource):
    """``bfcms_synth``: deterministic generated rows (id, bucket, v)."""

    @classmethod
    def name(cls):
        return "bfcms_synth"

    def schema(self):
        return "id BIGINT, bucket INT, v DOUBLE"

    def reader(self, schema: StructType):
        return SynthReader(self.options)


def register(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(SynthDataSource)


# ---------------------------------------------------------------------------
# Streaming variant: a custom Python *stream* source (C1 via the Spark 4
# DataSource API). Offsets are batch indexes; each micro-batch k emits rows
# [k*rows_per_batch, (k+1)*rows_per_batch) until n_batches is reached, then
# the offset stops advancing. readBetweenOffsets makes replay deterministic,
# so exactly-once holds across recovery.

from pyspark.sql.datasource import SimpleDataSourceStreamReader


class SynthStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.n_batches = int(options.get("batches", 10))
        self.buckets = int(options.get("buckets", 16))

    def initialOffset(self):
        return {"batch": 0}

    def _rows(self, lo_batch: int, hi_batch: int):
        # a concrete list, not a generator: the prefetched batch is pickled
        # by the driver-side cache before it is shipped to executors
        return [
            (i, i % self.buckets, float((i * _MUL) % _MOD))
            for i in range(
                lo_batch * self.rows_per_batch, hi_batch * self.rows_per_batch
            )
        ]

    def read(self, start):
        # pyspark's SimpleStreamReader prefetch cache advances the returned
        # value with next(), so this must be an ITERATOR over the concrete
        # list (a bare list raised TypeError in the post-stop latestOffset
        # probe; the rows themselves are still materialized for pickling)
        k = start["batch"]
        if k >= self.n_batches:
            return iter([]), start
        return iter(self._rows(k, k + 1)), {"batch": k + 1}

    def readBetweenOffsets(self, start, end):
        return self._rows(start["batch"], end["batch"])


class SynthStreamDataSource(DataSource):
    """``bfcms_synth_stream``: deterministic micro-batched generated rows."""

    @classmethod
    def name(cls):
        return "bfcms_synth_stream"

    def schema(self):
        return "id BIGINT, bucket INT, v DOUBLE"

    def simpleStreamReader(self, schema: StructType):
        return SynthStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(SynthStreamDataSource)


class _JsonDirCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path, self.n_rows = path, n_rows


class _JsonDirWriter(DataSourceWriter):
    """Executor-parallel writer: each partition lands one JSON-lines file
    under the target directory (write-then-commit: files are written under
    a temp name and the filenames travel in the commit messages, so an
    aborted task leaves only an orphan the reader never sees)."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = os.path.join(self.path, f"part-{pid:05d}-{uuid.uuid4().hex}.json")
        n = 0
        with open(name + ".tmp", "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        os.rename(name + ".tmp", name)
        return _JsonDirCommit(name, n)

    def commit(self, messages):
        import json
        import os

        total = sum(m.n_rows for m in messages)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(json.dumps({"files": len(messages), "rows": total}))

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonDirSinkDataSource(DataSource):
    """Python DataSource WRITE path (Spark 4): df.write.format(
    'bfcms_jsondir').option('path', dir).save() fans partitions out to
    executor-local JSON-lines files with a two-phase commit — the writer
    half of the custom-connector contract (SynthDataSource covers batch
    read, SynthStreamDataSource streaming read)."""

    @classmethod
    def name(cls):
        return "bfcms_jsondir"

    def writer(self, schema: StructType, overwrite: bool):
        return _JsonDirWriter(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return _JsonDirStreamWriter(self.options)


class _JsonDirStreamWriter(DataSourceStreamWriter):
    """Streaming twin of _JsonDirWriter: every micro-batch's partitions
    land as committed JSON-lines files; commit() stamps a per-batch
    marker so a resumed query can see which batches fully landed."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = os.path.join(
            self.path, f"stream-{pid:05d}-{uuid.uuid4().hex}.json"
        )
        n = 0
        with open(name + ".tmp", "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        os.rename(name + ".tmp", name)
        return _JsonDirCommit(name, n)

    def commit(self, messages, batchId):
        import json
        import os

        total = sum(m.n_rows for m in messages if m is not None)
        with open(
            os.path.join(self.path, f"_BATCH_{batchId}_SUCCESS"), "w"
        ) as fh:
            fh.write(json.dumps({"batch": batchId, "rows": total}))

    def abort(self, messages, batchId):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
