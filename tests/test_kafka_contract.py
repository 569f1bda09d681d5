"""Kafka reader/writer OPTION-CONTRACT tests (no broker, no kafka package).

The sandbox has no Kafka broker and no spark-sql-kafka jar, so the live
round-trip can't run here; what CAN be pinned is the exact DataSource option
surface our source/sink resolve to — the reference's contract
(spark-processor/processor.py:60-67: format kafka, subscribe topic,
startingOffsets=earliest, failOnDataLoss=false; topic default 'raw-data'
per data-generator/generator.py:12). A recording stub stands in for the
reader/writer builders, so these tests never touch the kafka DataSource
registry and stay green without the package.
"""

from __future__ import annotations

import pytest

from kafkasparkstream_spark.sources.streams import kafka_sink, kafka_stream


class _RecordingBuilder:
    """Quacks like DataStreamReader/Writer, records the builder calls."""

    def __init__(self):
        self.fmt = None
        self.opts = {}
        self.mode = None
        self.loaded = False
        self.started = False

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def outputMode(self, mode):
        self.mode = mode
        return self

    def load(self):
        self.loaded = True
        return self

    def start(self):
        self.started = True
        return self


class _FakeSparkForRead:
    def __init__(self, rec):
        self._rec = rec

    @property
    def readStream(self):
        return self._rec


def test_kafka_reader_options_match_reference():
    rec = _RecordingBuilder()
    kafka_stream(_FakeSparkForRead(rec), "broker:9092", "raw-data")
    assert rec.fmt == "kafka"
    assert rec.loaded
    assert rec.opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "raw-data",           # processor.py:64
        "startingOffsets": "earliest",     # processor.py:65
        "failOnDataLoss": "false",         # processor.py:66 (string, lowercase)
    }


def test_kafka_reader_option_overrides_resolve():
    rec = _RecordingBuilder()
    kafka_stream(
        _FakeSparkForRead(rec),
        "b:9092",
        "other-topic",
        starting_offsets="latest",
        fail_on_data_loss=True,
    )
    assert rec.opts["startingOffsets"] == "latest"
    assert rec.opts["failOnDataLoss"] == "true"
    assert rec.opts["subscribe"] == "other-topic"


def test_kafka_sink_options_and_payload(spark, monkeypatch):
    """The sink must publish a single JSON `value` column to the topic with a
    checkpoint — asserted against the recorded writer options and the
    payload projection's schema."""
    rec = _RecordingBuilder()
    captured = {}

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    cls = type(df)  # the concrete DataFrame class (pyspark.sql.classic)
    orig_select = cls.select

    def capture_select(self, *cols):
        out = orig_select(self, *cols)
        captured["payload"] = out
        return out

    monkeypatch.setattr(cls, "select", capture_select)
    monkeypatch.setattr(cls, "writeStream", property(lambda self: rec))
    q = kafka_sink(df, "broker:9092", "processed-data", "/tmp/ckpt-kafka")
    assert q is rec and rec.started
    assert rec.fmt == "kafka"
    assert rec.mode == "append"
    assert rec.opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": "processed-data",
        "checkpointLocation": "/tmp/ckpt-kafka",
    }
    # wire shape: exactly one column named `value` (Kafka payload contract)
    assert captured["payload"].columns == ["value"]


def test_kafka_datasource_not_required_at_import():
    """Constructing the reader lazily means no kafka jar is needed until a
    real session resolves the format — the import path itself is clean."""
    import kafkasparkstream_spark.sources.streams as streams

    assert callable(streams.kafka_stream) and callable(streams.kafka_sink)


def test_python_datasource_deterministic_and_partitioned(spark):
    """The sensor_gen Python DataSource yields the same rows under any
    partition count (generation keyed on row index, not partition), with
    domains matching the reference generator's."""
    from kafkasparkstream_spark.sources.python_source import (
        DEVICE_TYPES,
        LOCATIONS,
        SensorGenDataSource,
    )

    try:
        spark.dataSource.register(SensorGenDataSource)
    except Exception:
        pass

    def rows(parts):
        return sorted(
            spark.read.format("sensor_gen")
            .option("rows", 500)
            .option("partitions", parts)
            .load()
            .collect()
        )

    a, b = rows(2), rows(7)
    assert a == b, "row content must not depend on partitioning"
    assert len(a) == 500
    for r in a[:50]:
        assert r.device_type in DEVICE_TYPES
        assert r.location in LOCATIONS
        assert r.device_id.startswith("sensor_")
        assert 0.0 <= r.value < 100.0 and 0.0 <= r.battery_level < 100.0


def test_python_stream_source_drains_exact_rows(spark, tmp_path):
    """The streaming face of sensor_gen: a rate-limited micro-batch feed
    whose offset is the row index. Draining the bounded stream must yield
    exactly the batch generator's rows (same gen_row universe), across
    multiple micro-batches — determinism stands in for a write-ahead log."""
    import time

    from kafkasparkstream_spark.sources.python_source import (
        SensorGenDataSource,
        gen_row,
    )

    try:
        spark.dataSource.register(SensorGenDataSource)
    except Exception:
        pass

    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("sensor_gen")
        .option("rows", 250)
        .option("rowsPerBatch", 100)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    from kafkasparkstream_spark.queries import _drain_sink

    assert _drain_sink(spark, q, sink, n_rows=250, timeout_s=120), (
        "stream did not drain 250 rows in 120 s (timeout, not content)"
    )

    got = sorted(tuple(r) for r in spark.read.parquet(sink).collect())
    assert got == sorted(gen_row(i) for i in range(250))


def test_python_stream_source_replay_between_offsets():
    """Recovery contract: readBetweenOffsets must regenerate any committed
    range bit-for-bit (what the engine calls after a restart)."""
    from kafkasparkstream_spark.sources.python_source import (
        SensorGenStreamReader,
        gen_row,
    )

    r = SensorGenStreamReader({"rows": "100", "rowsPerBatch": "30"})
    assert r.initialOffset() == {"index": 0}
    batch, nxt = r.read({"index": 0})
    assert list(batch) == [gen_row(i) for i in range(30)] and nxt == {"index": 30}
    # tail batch clips at the bound
    batch, nxt = r.read({"index": 90})
    assert list(batch) == [gen_row(i) for i in range(90, 100)]
    assert nxt == {"index": 100}
    replay = list(r.readBetweenOffsets({"index": 40}, {"index": 70}))
    assert replay == [gen_row(i) for i in range(40, 70)]
