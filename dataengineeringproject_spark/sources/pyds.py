"""Custom Python data source (PySpark 4 `pyspark.sql.datasource` API):
a deterministic synthetic-events generator, registered as format
`synth_events`.

Why it exists: the reference ingests from an external HTTP feed the
test environment can't reach; a generator source gives the engine a
self-contained, infinitely scalable input for load tests and examples
without staging files. It also exercises the DataSource-V2 Python
surface (schema declaration, input-partition planning, per-partition
iteration) that any future real connector (REST API, message queue,
proprietary format) would use.

Scale posture: rows are generated per-partition on executors —
`numPartitions` shards the keyspace, so a 1000-executor cluster
generates in parallel with zero driver involvement and no shuffle.
Determinism: every field is a pure function of (seed, partition, i)
via md5, so the same options always yield byte-identical data on any
cluster size — the property that makes generated inputs usable in
differential tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_SCHEMA = (
    "event_id bigint, ts_us bigint, user_id bigint, event_type string, "
    "value double"
)


def _h(seed: str, part: int, i: int, field: str) -> int:
    """60-bit deterministic hash of one cell's coordinates."""
    raw = hashlib.md5(f"{seed}|{part}|{i}|{field}".encode()).hexdigest()
    return int(raw[:15], 16)


class SynthEventsDataSource(DataSource):
    """Options: numPartitions (default 4), rowsPerPartition (default
    1000), seed (default 'synth-v1'), nUsers (default 100)."""

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
    def __init__(self, options: dict) -> None:
        # DataSourceReader receives options lower-cased.
        self.n_parts = int(options.get("numpartitions", 4))
        self.rows = int(options.get("rowsperpartition", 1000))
        self.seed = options.get("seed", "synth-v1")
        self.n_users = int(options.get("nusers", 100))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        p = partition.value
        base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
        for i in range(self.rows):
            event_id = p * self.rows + i
            ts_us = base_us + _h(self.seed, p, i, "ts") % (30 * 86_400_000_000)
            user_id = _h(self.seed, p, i, "user") % self.n_users
            etype = EVENT_TYPES[_h(self.seed, p, i, "type") % len(EVENT_TYPES)]
            value = (_h(self.seed, p, i, "value") % 1_000_000) / 1000.0
            yield (event_id, ts_us, user_id, etype, value)


def register(spark) -> None:
    """Idempotently register the source with a session; afterwards
    `spark.read.format("synth_events").option(...).load()` works."""
    spark.dataSource.register(SynthEventsDataSource)


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of SynthEventsReader: micro-batch b replays
    exactly batch-partition b of the batch generator, so a stream that
    has consumed `numPartitions` micro-batches holds BYTE-IDENTICAL
    content to the batch read with the same options — the replayable-
    source property (Kafka-like) that exactly-once sinks rely on.
    `readBetweenOffsets` regenerates any offset range deterministically,
    which is what makes recovery-after-crash reproduce the same rows."""

    def __init__(self, options: dict) -> None:
        self.n_parts = int(options.get("numpartitions", 4))
        self.rows = int(options.get("rowsperpartition", 1000))
        self.seed = options.get("seed", "synth-v1")
        self.n_users = int(options.get("nusers", 100))

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def _gen(self, p: int):
        base_us = 1_704_067_200_000_000
        for i in range(self.rows):
            yield (
                p * self.rows + i,
                base_us + _h(self.seed, p, i, "ts") % (30 * 86_400_000_000),
                _h(self.seed, p, i, "user") % self.n_users,
                EVENT_TYPES[_h(self.seed, p, i, "type") % len(EVENT_TYPES)],
                (_h(self.seed, p, i, "value") % 1_000_000) / 1000.0,
            )

    def read(self, start: dict):
        b = start["batch"]
        if b >= self.n_parts:  # source exhausted: empty batch, same offset
            return iter([]), start
        # materialized list, not the generator: Spark's prefetch cache
        # copy.copy()s the returned iterator, and generators aren't
        # copyable (list iterators are)
        return iter(list(self._gen(b))), {"batch": b + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        for b in range(start["batch"], end["batch"]):
            yield from self._gen(b)
