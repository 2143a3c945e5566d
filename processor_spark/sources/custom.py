"""Custom Python data source (Spark 4 DataSource API, SURVEY.md §2.1).

The connector surface for sources Spark has no built-in reader for
(internal services, bespoke formats): a pure-Python DataSource class
registered once per session, after which it is a first-class
``spark.read.format(...)`` / ``spark.readStream.format(...)`` — the
engine's operators run on it unchanged.

This module ships a deterministic synthetic-events source in both
forms:

- batch: partitioned generator (``partitions`` splits the row range,
  one Arrow-batched Python task each — the parallelism contract of
  any distributed source);
- streaming: a SimpleDataSourceStreamReader whose offset is the row
  counter — initialOffset/read/commit give checkpointable,
  exactly-once micro-batches (proven across a restart in
  tests/test_sources.py).

Rows are a pure function of event_id, so any slice of the output is
reproducible on any cluster — the property that makes a synthetic
source usable as a load-test fixture at 100 TB (no data movement:
every executor GENERATES its shard).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
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

_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"
_TYPES = ["click", "view", "signup", "purchase", "error"]


def _row(i: int):
    return (i, i % 97, _TYPES[i % 5], float(i % 1000) / 10.0)


class SynthEventsSource(DataSource):
    """``synth_events``: options rows (total), partitions (batch
    split), batch_rows (per streaming micro-batch)."""

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "SynthEventsReader":
        return SynthEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SynthEventsStreamReader":
        return SynthEventsStreamReader(self.options)


class SynthEventsReader(DataSourceReader):
    """Batch reader WITH filter pushdown: range predicates on event_id
    shrink the generated row range itself (the custom-source analogue
    of parquet row-group skipping), and partitions covering an empty
    slice are never even created — pushdown reaches ALL the way into
    partition planning, which is the 100 TB point of the API."""

    def __init__(self, options) -> None:
        self.n = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 4))
        self.lo = 0            # inclusive event_id bound after pushdown
        self.hi = self.n       # exclusive

    def pushFilters(self, filters):
        for f in filters:
            # absorb only genuine int comparison values: int(4.5) would
            # silently truncate the bound AND report the filter absorbed
            if getattr(f, "attribute", None) == ("event_id",) and isinstance(
                getattr(f, "value", None), int
            ) and not isinstance(f.value, bool):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
            yield f  # unsupported → Spark re-applies it above the scan

    def partitions(self):
        span = max(0, self.hi - self.lo)
        base = span // self.parts
        extra = span % self.parts
        out = []
        for i in range(self.parts):
            start = self.lo + i * base + min(i, extra)
            end = start + base + (1 if i < extra else 0)
            if end > start:  # empty slices never become tasks
                out.append(InputPartition((start, end)))
        return out

    def read(self, partition):
        start, end = partition.value
        for j in range(start, end):
            yield _row(j)


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset = next row index; each micro-batch emits ``batch_rows``
    rows up to ``rows`` total.  The offset dict round-trips through the
    checkpoint, so a restarted query resumes exactly where the last
    committed batch ended."""

    def __init__(self, options) -> None:
        self.total = int(options.get("rows", 1000))
        self.batch = int(options.get("batch_rows", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch, self.total)
        return iter([_row(j) for j in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(j) for j in range(start["next"], end["next"])])

    def commit(self, end: dict) -> None:
        return


class JsonlCommit(WriterCommitMessage):
    def __init__(self, file: str, count: int) -> None:
        self.file = file
        self.count = count


class JsonlSinkWriter(DataSourceWriter):
    """Executor-side write + driver-side commit: each task writes one
    JSONL file and reports (file, count); commit() publishes the
    _MANIFEST only after EVERY task succeeded — the two-phase protocol
    that makes a custom sink exactly-once at the job level (readers
    trust only manifested files; an aborted job leaves no manifest)."""

    def __init__(self, options, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os

        from pyspark import TaskContext

        import uuid

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        # attempt-unique name: a retried/speculative attempt of this
        # partition must never write the same file in place — the
        # manifest publishes exactly one attempt's file; orphans from
        # lost attempts stay unmanifested and are ignored by readers
        file = os.path.join(
            self.path, f"part-{pid:05d}-{uuid.uuid4().hex[:12]}.jsonl"
        )
        n = 0
        with open(file, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return JsonlCommit(file, n)

    def commit(self, messages):
        import json
        import os

        manifest = {
            "files": sorted(m.file for m in messages),
            "total_rows": sum(m.count for m in messages),
        }
        target = os.path.join(self.path, "_MANIFEST")
        tmp = target + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, target)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class JsonlStreamSinkWriter(DataSourceStreamWriter):
    """Streaming flavor: one JSONL file per (batch, task); commit()
    receives (messages, batchId) and appends one line to a manifest
    LOG — idempotently, so a replayed micro-batch (failure between
    sink commit and checkpoint write) overwrites its own entry instead
    of double-counting.  Readers sum the log for the exactly-once
    row count."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")

    def write(self, iterator):
        import json
        import os

        from pyspark import TaskContext

        import uuid

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        # attempt-unique name (stage+partition repeat on retries);
        # commit publishes exactly one attempt per task via the manifest
        file = os.path.join(
            self.path,
            f"stream-{ctx.stageId()}-{ctx.partitionId():05d}-"
            f"{uuid.uuid4().hex[:12]}.jsonl",
        )
        n = 0
        with open(file, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return JsonlCommit(file, n)

    def commit(self, messages, batchId) -> None:
        import json
        import os

        log = os.path.join(self.path, "_MANIFEST_LOG")
        entries = {}
        if os.path.exists(log):
            with open(log) as fh:
                for line in fh:
                    e = json.loads(line)
                    entries[e["batch"]] = e
        entries[batchId] = {
            "batch": batchId,
            "files": sorted(m.file for m in messages),
            "rows": sum(m.count for m in messages),
        }
        # write-temp + atomic replace: a crash mid-commit must never
        # truncate the log and orphan every earlier batch's entry
        tmp = log + ".tmp"
        with open(tmp, "w") as fh:
            for b in sorted(entries):
                fh.write(json.dumps(entries[b]) + "\n")
        os.replace(tmp, log)

    def abort(self, messages, batchId) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class JsonlSinkSource(DataSource):
    """``jsonl_sink``: a custom batch WRITER (option path) with a
    manifest-based commit protocol."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonlStreamSinkWriter:
        return JsonlStreamSinkWriter(self.options)


def register_custom_sources(spark) -> None:
    """Register the Python data sources on a session (idempotent).

    Runtime conf, not build_session: the driver runs queries under its
    OWN SparkSession (CLAUDE.md hostile-session rule), so the pushdown
    enable must ride with the registration call."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthEventsSource)
    spark.dataSource.register(JsonlSinkSource)
