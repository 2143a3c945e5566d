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
    InputPartition,
    SimpleDataSourceStreamReader,
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
    def __init__(self, options) -> None:
        self.n = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 4))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        base = self.n // self.parts
        extra = self.n % self.parts
        i = partition.value
        start = i * base + min(i, extra)
        end = start + base + (1 if i < extra else 0)
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


def register_custom_sources(spark) -> None:
    """Register the Python data sources on a session (idempotent)."""
    spark.dataSource.register(SynthEventsSource)
