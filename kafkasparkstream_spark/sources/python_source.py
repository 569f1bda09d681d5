"""Custom Python DataSource (Spark 4 DataSource API): the reference's
data generator as a first-class ``spark.read.format("sensor_gen")`` source.

The reference synthesizes sensor events in a standalone producer process
(data-generator/generator.py:37-48) and ships them through Kafka. Spark 4's
Python DataSource API lets the engine own that surface natively: the
generator IS a table — partitioned, so N executors each synthesize their
slice in parallel, no driver bottleneck, no external process.

Generation is keyed on the row index through md5 (functions/hashing.py
rationale): same index → same row on any engine, any partitioning — so
tests, the DuckDB oracle, and a 1000-executor cluster all see the identical
dataset. Domains mirror generator.py:38-47: device sensor_{1..100}, five
device types, six locations, value ∈ [0,100) rounded to 2dp, battery ∈
[0,100), ISO-8601 timestamps at 1-second cadence from a fixed epoch.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

DEVICE_TYPES = ("temperature", "humidity", "pressure", "motion", "light")
LOCATIONS = ("room1", "room2", "kitchen", "living_room", "bathroom", "outdoor")
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

SCHEMA = (
    "row_id bigint, device_id string, device_type string, location string, "
    "value double, battery_level double, timestamp string"
)


def _h(i: int, field: str) -> int:
    """First 8 hex chars of md5('{field}_{i}') as int — the SQL twin is
    CAST(('0x' || substr(md5(field || '_' || i), 1, 8)) AS BIGINT)."""
    return int(hashlib.md5(f"{field}_{i}".encode()).hexdigest()[:8], 16)


def gen_row(i: int) -> tuple:
    """Deterministic sensor reading #i (generator.py:41-48 analog)."""
    ts = (EPOCH + timedelta(seconds=i)).isoformat()
    return (
        i,
        f"sensor_{1 + _h(i, 'dev') % 100}",
        DEVICE_TYPES[_h(i, 'typ') % len(DEVICE_TYPES)],
        LOCATIONS[_h(i, 'loc') % len(LOCATIONS)],
        round((_h(i, 'val') % 10000) / 100.0, 2),
        round((_h(i, 'bat') % 10000) / 100.0, 2),
        ts,
    )


class SensorGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def _chunk(self) -> int:
        return -(-self.n_rows // self.n_parts)

    def partitions(self):
        # Contiguous slices: partition p owns [p*chunk, min((p+1)*chunk, n)).
        return [InputPartition(p) for p in range(self.n_parts)]

    def read(self, partition):
        chunk = self._chunk()
        start = partition.value * chunk
        for i in range(start, min(start + chunk, self.n_rows)):
            yield gen_row(i)


class SensorGenDataSource(DataSource):
    """``spark.dataSource.register(SensorGenDataSource)`` then
    ``spark.read.format("sensor_gen").option("rows", 10000).load()``."""

    @classmethod
    def name(cls) -> str:
        return "sensor_gen"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SensorGenReader:
        return SensorGenReader(self.options)

    def simpleStreamReader(self, schema) -> "SensorGenStreamReader":
        return SensorGenStreamReader(self.options)


class SensorGenStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the generator (G1 analog as a true source): the
    offset is simply the next row index, so progress, recovery, and replay
    are all exact — ``read`` advances the offset by ``rowsPerBatch`` per
    micro-batch (the reference's MESSAGES_PER_SECOND rate knob,
    generator.py:13,97), and ``readBetweenOffsets`` regenerates any
    committed range bit-for-bit after a restart (determinism does the work
    a write-ahead log does for nondeterministic sources). Bounded by
    ``rows`` so tests and demos drain; production would leave it unbounded.

    The simple-reader protocol generates on the driver and ships rows to
    executors — right for a rate-limited demo feed, not for bulk
    (re)generation; the batch reader above is the partition-parallel path.
    """

    def __init__(self, options: dict):
        self.total = int(options.get("rows", 1000))
        self.per_batch = int(options.get("rowsPerBatch", 100))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        s = start["index"]
        e = min(s + self.per_batch, self.total)
        return iter([gen_row(i) for i in range(s, e)]), {"index": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([gen_row(i) for i in range(start["index"], end["index"])])
