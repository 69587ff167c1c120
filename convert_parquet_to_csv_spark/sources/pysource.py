"""Custom Python data source (Spark 4 ``pyspark.sql.datasource``) —
the extension seam for sources Spark has no connector for (internal
services, bespoke formats, synthetic generators).

``SynthDocsDataSource`` generates a deterministic synthetic document
table (id, fingerprint, n_tokens) without any input files:

- **Partition-parallel**: the id range splits into ``n_parts`` input
  partitions; each task generates only its slice. At 100 TB-equivalent
  row counts the generator scales exactly like a file scan — no
  driver-side materialization anywhere.
- **Filter pushdown** (Spark 4.1 ``pushFilters``): ``id >= / > / <= /
  < / =`` predicates narrow the id range BEFORE partition planning, so
  non-matching partitions are never created, let alone scheduled —
  the Python-source equivalent of parquet row-group pruning. All
  other predicates are returned as unsupported and Spark re-applies
  them post-scan (correctness never depends on the pushdown).
- **Deterministic content**: every cell derives from md5(id), so two
  scans — or Spark and a SQL oracle — produce identical values with
  no RNG state (the repo-wide no-RNG rule).

Register with :func:`register_once` (plain ``register`` raises
``DATA_SOURCE_ALREADY_EXISTS`` when two sessions sharing one JVM —
e.g. ``newSession()`` — both register the same short name) then
``spark.read.format("synthdocs")``.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


@dataclass
class _IdSlice(InputPartition):
    start: int
    end: int  # exclusive


def _row_for(i: int) -> tuple[int, str, int]:
    h = hashlib.md5(str(i).encode()).hexdigest()
    # deterministic pseudo token count in [10, 109]
    n_tokens = 10 + int(h[:8], 16) % 100
    return (i, h, n_tokens)


class _SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_parts", 8))
        self.lo = 0
        self.hi = self.n_rows  # exclusive

    def pushFilters(self, filters):
        """Narrow [lo, hi) from id comparisons; return whatever we
        can't handle so Spark re-applies it post-scan. Eager (no
        generator): the range must be final before ``partitions()``
        runs, not whenever Spark drains the iterator."""
        unsupported = []
        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("id",) and isinstance(
                getattr(f, "value", None), int
            ):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                    continue
            unsupported.append(f)
        return unsupported

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        if hi <= lo:
            return [_IdSlice(0, 0)]
        span = hi - lo
        n = min(self.n_parts, span)
        step = (span + n - 1) // n
        return [
            _IdSlice(s, min(s + step, hi))
            for s in range(lo, hi, step)
        ]

    def read(self, partition: _IdSlice):
        for i in range(partition.start, partition.end):
            yield _row_for(i)


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "id BIGINT, fingerprint STRING, n_tokens INT"

    def reader(self, schema) -> _SynthDocsReader:
        return _SynthDocsReader(self.options)


# --------------------------------------------------------------------------
# Streaming flavor
# --------------------------------------------------------------------------


class _SynthDocsStreamReader(SimpleDataSourceStreamReader):
    """``SimpleDataSourceStreamReader``: offset = next id to emit.

    Each micro-batch emits up to ``rows_per_batch`` ids; the offset
    dict persists in the checkpoint log, so a restarted query resumes
    exactly where it stopped (the same exactly-once contract the
    file source's test pins). ``readBetweenOffsets`` replays a
    committed range deterministically — trivial here because content
    is a pure function of id.
    """

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.rows_per_batch, self.n_rows)
        end = {"next": hi}
        return (self._rows(lo, hi), end)

    def readBetweenOffsets(self, start, end):
        return self._rows(start["next"], end["next"])

    @staticmethod
    def _rows(lo, hi):
        return iter([_row_for(i) for i in range(lo, hi)])

    def commit(self, end):
        pass


class SynthDocsStreamDataSource(DataSource):
    """Streaming twin of :class:`SynthDocsDataSource` — registered as
    ``synthdocs_stream`` for ``spark.readStream.format(...)``."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs_stream"

    def schema(self) -> str:
        return "id BIGINT, fingerprint STRING, n_tokens INT"

    def simpleStreamReader(self, schema) -> _SynthDocsStreamReader:
        return _SynthDocsStreamReader(self.options)


# --------------------------------------------------------------------------
# Writer side (Spark 4 ``DataSourceWriter``) — the sink twin
# --------------------------------------------------------------------------


@dataclass
class _StagedFile(WriterCommitMessage):
    staged: str
    rows: int


class _JsonlWriter(DataSourceWriter):
    """Task-commit JSONL sink with the classic two-phase protocol:

    - ``write`` (executor, per task): serialize the task's rows to a
      UNIQUELY-NAMED file in a staging directory and return its path
      as the commit message. Unique names make speculative/retried
      attempts collide-free; an attempt that loses the race simply
      leaves an orphan in staging.
    - ``commit`` (driver, all tasks succeeded): move exactly the
      committed files into the final directory, drop the whole staging
      dir (including loser-attempt orphans), write ``_SUCCESS``.
      Readers that key on ``_SUCCESS`` therefore never observe a
      partial write — the same atomicity contract as Spark's file
      sinks.
    - ``abort`` (driver, any task failed): remove the staging dir;
      the final dir is untouched.

    Filesystem note: staging/final live on whatever filesystem ``path``
    names. In local mode that is the shared local FS; on a cluster it
    must be a shared mount (the driver moves files the executors
    wrote). Object-store deployments would swap the rename for a
    copy — the protocol is the point here, not the FS client.
    """

    def __init__(self, options, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("jsonlsink requires a path option")
        self.path = path
        self.overwrite = overwrite
        self.staging = os.path.join(path, "_staging")

    def write(self, iterator) -> _StagedFile:
        import json
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self.staging, exist_ok=True)
        staged = os.path.join(
            self.staging, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _StagedFile(staged=staged, rows=n)

    def commit(self, messages) -> None:
        import glob
        import shutil

        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                os.remove(old)
            _success = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(_success):
                os.remove(_success)
        total = 0
        for m in messages:
            if m is None:  # empty task: Spark may pass None
                continue
            os.replace(
                m.staged,
                os.path.join(self.path, os.path.basename(m.staged)),
            )
            total += m.rows
        shutil.rmtree(self.staging, ignore_errors=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(f"{total}\n")

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


class JsonlSinkDataSource(DataSource):
    """Batch sink: ``df.write.format("jsonlsink").mode(...).save(path)``.

    Completes the Python data source surface (sources/pysource.py):
    batch reader with pushFilters, streaming reader, and now the
    writer half with real two-phase task commit — the seam for sinks
    Spark has no connector for (internal services, bespoke formats).
    """

    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def writer(self, schema, overwrite: bool) -> _JsonlWriter:
        return _JsonlWriter(self.options, overwrite)


def register_once(spark, ds_cls) -> None:
    """Idempotent ``spark.dataSource.register``: Spark keeps ONE
    Python-data-source registry per JVM-side session state, so a
    second registration of the same short name (another query in the
    same gate run, or a ``newSession`` sharing the JVM) raises
    DATA_SOURCE_ALREADY_EXISTS. Same-name re-registration here is a
    no-op — acceptable because every source class in this module is
    import-stable within a process.

    Known Spark 4.1 asymmetry (probed, tests/test_vanilla_session):
    the ALREADY_EXISTS check consults a registry SHARED across
    sessions of one JVM while format-lookup is per-session, so a
    ``newSession()`` whose sibling registered the name can neither
    register nor load it. Single-session processes (the driver
    gate, oracle_check, bench) are unaffected."""
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        spark.dataSource.register(ds_cls)
    except AnalysisException as ex:
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(ex):
            raise
