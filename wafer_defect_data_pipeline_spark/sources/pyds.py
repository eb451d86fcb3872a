"""Python DataSource API (Spark 4) — custom sources without JVM code.

The extension point for ingesting from systems Spark has no built-in
connector for (internal services, bespoke formats, synthetic load): a
``DataSource`` subclass registered once per session, after which
``spark.read.format(name)`` plans it like any other source — partitions
become tasks, each executor pulls only its slice, and the rows flow through
Arrow into Tungsten. No driver materialization anywhere.

``SynthEventsSource`` here is a deterministic generator (pure integer
arithmetic keyed on the row id — no RNG), which makes it the rare custom
source whose output an independent SQL engine can regenerate exactly:
the driver oracle replays the same formulas over ``generate_series`` and
value-hash-compares. That proves the full plumbing — options, schema,
partitioning, per-partition iterators — not just "rows came out".

A streaming twin (``SynthEventsStreamSource``) exposes the same generator
through ``SimpleDataSourceStreamReader`` (offset-tracked micro-batches) —
the shape of a replayable ingest queue; batch/stream equivalence is
pytest-asserted.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# Knuth's multiplicative-hash constant: spreads sequential ids uniformly
# across users while staying exactly reproducible in any engine with 64-bit
# integer arithmetic (id < ~2^31 keeps every product below 2^63).
_MULT = 2654435761
_USERS = 97
_TYPES = ("view", "click", "purchase", "error")

SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"


def _row(i: int) -> tuple:
    return (
        i,
        (i * _MULT) % _USERS,
        _TYPES[(i * _MULT) % len(_TYPES)],
        ((i * i) % 1000) / 10.0,
    )


class _SynthPartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class _SynthReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 10_000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        # contiguous id ranges -> each task generates only its slice;
        # adding executors splits the work with zero coordination
        return [
            _SynthPartition(self.n * i // self.parts, self.n * (i + 1) // self.parts)
            for i in range(self.parts)
        ]

    def read(self, partition):
        for i in range(partition.lo, partition.hi):
            yield _row(i)


class SynthEventsSource(DataSource):
    """``spark.read.format("synth_events").option("n", ...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return _SynthReader(self.options)


class _SynthStreamReader(SimpleDataSourceStreamReader):
    """Offset = next id to emit; each micro-batch advances by ``batch_size``
    until ``n`` — a replayable queue (same offset range ⇒ same rows), which
    is exactly the contract exactly-once streaming sources need."""

    def __init__(self, options):
        self.n = int(options.get("n", 10_000))
        self.batch_size = int(options.get("batch_size", 1_000))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.batch_size, self.n)
        return iter([_row(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start, end):
        return iter([_row(i) for i in range(start["next"], end["next"])])


class SynthEventsStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synth_events_stream"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema):
        return _SynthStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Idempotently register both sources on the session."""
    spark.dataSource.register(SynthEventsSource)
    spark.dataSource.register(SynthEventsStreamSource)
