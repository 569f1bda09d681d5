"""Golden end-to-end streaming tests (SURVEY.md §5.2).

Replays a fixed sensor-event set through the parse → watermark → window → agg
pipeline with file-source micro-batches under Trigger.AvailableNow, across a
checkpoint restart, asserting:

- the final aggregate state equals the batch shadow of the on-time rows
  (ST1/ST2/ST3 semantics),
- the late row (event time behind the persisted watermark) is dropped from
  the aggregate but the raw append branch keeps every parsed row (ST4),
- malformed JSON yields an all-null parsed row (PERMISSIVE, processor.py:48-55
  nullable schema), not a stream failure,
- recovery: the second run resumes from the checkpoint and only processes the
  new file (ST6).
"""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from kafkasparkstream_spark.sources.streams import file_json_stream, rate_sensor_stream
from kafkasparkstream_spark.streaming.pipeline import (
    PipelineConfig,
    parse_stage,
    start_pipeline,
    windowed_aggregate_stage,
)
from kafkasparkstream_spark.streaming.sinks import latest_state


def _event(device, dtype, loc, value, battery, ts):
    return json.dumps(
        {
            "device_id": device,
            "device_type": dtype,
            "location": loc,
            "value": value,
            "battery_level": battery,
            "timestamp": ts,
        }
    )


ONTIME = [
    _event("sensor_1", "temperature", "room1", 20.0, 90.0, "2024-01-01T10:00:05"),
    _event("sensor_2", "temperature", "room1", 22.0, 80.0, "2024-01-01T10:00:30"),
    _event("sensor_3", "humidity", "kitchen", 55.0, 70.0, "2024-01-01T10:01:10"),
    _event("sensor_1", "temperature", "room1", 24.0, 89.0, "2024-01-01T10:02:50"),
]
MALFORMED = "{this is not json"
RUN2_LATE = _event("sensor_9", "temperature", "room1", 99.0, 10.0, "2024-01-01T10:00:40")
RUN2_ONTIME = _event("sensor_4", "humidity", "kitchen", 60.0, 60.0, "2024-01-01T10:03:10")


def _run_available_now(spark, src_dir, sink, ckpt):
    raw = file_json_stream(spark, src_dir, max_files_per_trigger=1)
    agg_q, raw_q = start_pipeline(raw, sink, ckpt, available_now=True)
    agg_q.awaitTermination()
    raw_q.awaitTermination()


def test_streaming_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    # ---- run 1: on-time events + a malformed line --------------------------
    (src / "f1.json").write_text("\n".join(ONTIME + [MALFORMED]) + "\n")
    _run_available_now(spark, str(src), sink, ckpt)

    raw1 = spark.read.parquet(f"{sink}/sensor_data")
    assert raw1.count() == 5  # 4 events + 1 all-null malformed row
    assert raw1.filter(F.col("device_id").isNull()).count() == 1

    # ---- run 2: restart from checkpoint; one late + one on-time event ------
    (src / "f2.json").write_text("\n".join([RUN2_LATE, RUN2_ONTIME]) + "\n")
    _run_available_now(spark, str(src), sink, ckpt)

    raw2 = spark.read.parquet(f"{sink}/sensor_data")
    # Recovery (ST6): only f2 processed in run 2 → exactly 2 new raw rows.
    assert raw2.count() == 7
    # Raw branch has no watermark (ST4): the late row IS in the raw table.
    assert raw2.filter(F.col("device_id") == "sensor_9").count() == 1

    # ---- final aggregate state == batch shadow of on-time rows only --------
    agg = latest_state(
        spark.read.parquet(f"{sink}/sensor_aggregates"),
        ("window_start", "window_end", "device_type", "location"),
    )
    # Late row (10:00:40 behind watermark 10:01:50 persisted in run 1's
    # checkpoint) must NOT appear: its window's state was evicted (ST1).
    shadow_input = spark.createDataFrame(
        [(v,) for v in ONTIME + [RUN2_ONTIME]], ["value"]
    )
    expected = windowed_aggregate_stage(
        parse_stage(shadow_input, PipelineConfig()), PipelineConfig()
    )
    got = {tuple(r) for r in agg.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want, f"\ngot:  {sorted(got)}\nwant: {sorted(want)}"


def test_rate_source_synthesizer(spark, tmp_path):
    """G1 analog: the rate-source generator emits parseable sensor JSON."""
    stream = rate_sensor_stream(spark, rows_per_second=50)
    parsed = parse_stage(stream, PipelineConfig())
    q = (
        parsed.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_rate"))
        .start()
    )
    try:
        q.processAllAvailable()
        import time

        deadline = time.time() + 20
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT * FROM rate_smoke WHERE device_id IS NOT NULL"
            ).collect()
            if rows:
                break
            q.processAllAvailable()
        assert rows, "rate source produced no parseable sensor events in 20s"
        r = rows[0]
        assert r.device_id.startswith("sensor_")
        assert r.device_type in {"temperature", "humidity", "pressure", "motion", "light"}
        assert r.timestamp is not None
    finally:
        q.stop()


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-user totals accumulate across micro-batches
    (state store carries (count, sum) between triggers)."""
    import pandas as pd

    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType
    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.sources.json_parse import parse_json_events
    from kafkasparkstream_spark.streaming.stateful import running_user_totals

    wire = StructType(
        [
            StructField("user_id", LongType(), True),
            StructField("value", DoubleType(), True),
            StructField("ts", StringType(), True),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "out")
    rows1 = [
        json.dumps({"user_id": 1, "value": 10.0, "ts": "2024-01-01T10:00:00"}),
        json.dumps({"user_id": 1, "value": 5.0, "ts": "2024-01-01T10:00:10"}),
        json.dumps({"user_id": 2, "value": 7.0, "ts": "2024-01-01T10:00:20"}),
    ]
    rows2 = [
        json.dumps({"user_id": 1, "value": 2.5, "ts": "2024-01-01T10:01:00"}),
    ]
    (src / "a.json").write_text("\n".join(rows1) + "\n")
    (src / "b.json").write_text("\n".join(rows2) + "\n")

    raw = file_json_stream(spark, str(src), max_files_per_trigger=1)
    parsed = parse_json_events(raw, wire, ts_col="ts")
    totals = running_user_totals(parsed)
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    q = (
        totals.writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(sink).toPandas()
    # Final (highest) emission per user must be the cross-batch total.
    final = out.sort_values("n_events").groupby("user_id").last()
    assert final.loc[1, "n_events"] == 3 and abs(final.loc[1, "sum_value"] - 17.5) < 1e-9
    assert final.loc[2, "n_events"] == 1 and abs(final.loc[2, "sum_value"] - 7.0) < 1e-9
    # User 1 appeared in two micro-batches -> two emissions with growing totals.
    u1 = sorted(out[out.user_id == 1]["n_events"].tolist())
    assert u1 == [2, 3], f"expected state carry across batches, got emissions {u1}"


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """Native session windows under Structured Streaming: a watermarked
    session_window aggregate over file micro-batches (availableNow) must
    converge to the batch session_window answer on the same rows."""
    import pandas as pd  # noqa: F401

    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType
    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.sources.json_parse import parse_json_events

    wire = StructType(
        [
            StructField("user_id", LongType(), True),
            StructField("value", DoubleType(), True),
            StructField("ts", StringType(), True),
        ]
    )
    rows = [
        # user 1: two sessions (gap > 30 min between 10:10 and 11:00)
        {"user_id": 1, "value": 1.0, "ts": "2024-01-01T10:00:00"},
        {"user_id": 1, "value": 2.0, "ts": "2024-01-01T10:10:00"},
        {"user_id": 1, "value": 4.0, "ts": "2024-01-01T11:00:00"},
        # user 2: one session
        {"user_id": 2, "value": 8.0, "ts": "2024-01-01T10:05:00"},
        {"user_id": 2, "value": 16.0, "ts": "2024-01-01T10:20:00"},
    ]
    src = tmp_path / "src"
    src.mkdir()
    import time as _time

    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    # Flush events (filtered from the assertion): each later file advances
    # the watermark so append mode closes and emits the earlier sessions.
    _time.sleep(0.05)
    (src / "b.json").write_text(
        json.dumps({"user_id": 999, "value": 0.0, "ts": "2024-01-01T13:00:00"}) + "\n"
    )
    _time.sleep(0.05)
    (src / "c.json").write_text(
        json.dumps({"user_id": 999, "value": 0.0, "ts": "2024-01-01T14:00:00"}) + "\n"
    )

    def agg(df):
        return (
            df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .select(
                "user_id",
                F.col("session_window.start").alias("start"),
                F.col("session_window.end").alias("end"),
                "n",
                "s",
            )
        )

    raw = file_json_stream(spark, str(src), max_files_per_trigger=1)
    parsed = parse_json_events(raw, wire, ts_col="ts").withWatermark("ts", "1 minute")
    sink = str(tmp_path / "out")
    # Append mode: a session row is emitted once, when the watermark passes
    # its end (the only supported mode for streaming session windows).
    q = (
        agg(parsed)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["user_id"], r["start"], r["end"]): (r["n"], r["s"])
        for r in spark.read.parquet(sink).filter(F.col("user_id") != 999).collect()
    }
    batch_df = spark.createDataFrame(
        [(r["user_id"], float(r["value"]), r["ts"].replace("T", " ")) for r in rows],
        "user_id long, value double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    want = {
        (r["user_id"], r["start"], r["end"]): (r["n"], r["s"])
        for r in agg(batch_df).collect()
    }
    assert got == want and len(want) == 3


def test_streaming_dedup_across_batches(spark, tmp_path):
    """dropDuplicates on a watermarked stream: a re-delivered event (same
    device_id+timestamp, arriving again in a later micro-batch while still
    inside the watermark horizon) reaches the sink exactly once."""
    from kafkasparkstream_spark.streaming.pipeline import dedup_stage
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink" / "deduped")
    ckpt = str(tmp_path / "ckpt")

    dup = ONTIME[0]  # sensor_1 @ 10:00:05 — re-delivered in batch 2
    (src / "b1.json").write_text("\n".join(ONTIME) + "\n")
    (src / "b2.json").write_text("\n".join([dup, RUN2_ONTIME]) + "\n")

    raw = file_json_stream(spark, str(src), max_files_per_trigger=1)
    deduped = dedup_stage(parse_stage(raw, PipelineConfig()))
    q = (
        deduped.writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(sink)
    # 4 distinct on-time events + 1 new event; the re-delivery is dropped.
    assert out.count() == 5
    assert (
        out.filter(F.col("device_id") == "sensor_1").count() == 2
    )  # 10:00:05 once + 10:02:50 once
    assert out.select("device_id", "timestamp").distinct().count() == 5


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static broadcast join: every micro-batch row is enriched from
    the static dimension; unmatched keys survive with a null (left join)."""
    from kafkasparkstream_spark.streaming.pipeline import enrich_stage
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink" / "enriched")
    ckpt = str(tmp_path / "ckpt")
    (src / "b1.json").write_text("\n".join(ONTIME) + "\n")

    dim = spark.createDataFrame(
        [("sensor_1", "building-A"), ("sensor_2", "building-B")],
        ["device_id", "site"],
    )
    raw = file_json_stream(spark, str(src), max_files_per_trigger=None)
    enriched = enrich_stage(parse_stage(raw, PipelineConfig()), dim)
    q = (
        enriched.writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(sink)
    rows = {r["device_id"]: r["site"] for r in out.collect()}
    assert rows["sensor_1"] == "building-A"
    assert rows["sensor_2"] == "building-B"
    assert rows["sensor_3"] is None  # unmatched key kept by the left join


def test_jdbc_sink_error_isolation(spark, tmp_path):
    """S3/ST7: the JDBC sink callback skips empty batches and isolates write
    failures (no driver on the classpath here → the append raises inside the
    guard; the stream must survive, matching processor.py:139-140)."""
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_jdbc_sink

    sink = foreach_batch_jdbc_sink("jdbc:postgresql://nowhere:5432/nodb", "t")
    batch = spark.createDataFrame([(1, "a")], ["id", "v"])
    sink(batch, 0)  # must not raise (isolated failure)
    sink(batch.filter("id < 0"), 1)  # empty batch → skipped before any JDBC call

    import pytest as _pytest

    strict = foreach_batch_jdbc_sink(
        "jdbc:postgresql://nowhere:5432/nodb", "t", swallow_errors=False
    )
    with _pytest.raises(Exception):
        strict(batch, 2)


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream inner join with watermarks + a time-bound condition:
    click→purchase attribution within 10 minutes. Purchases outside any
    click's window, and unmatched clicks, must not emit."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from kafkasparkstream_spark.sources.json_parse import parse_json_events
    from kafkasparkstream_spark.streaming.pipeline import stream_interval_join
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    wire = StructType(
        [
            StructField("user_id", LongType(), True),
            StructField("kind", StringType(), True),
            StructField("ts", StringType(), True),
        ]
    )

    def _ev(user, kind, ts):
        return json.dumps({"user_id": user, "kind": kind, "ts": ts})

    clicks_dir, buys_dir = tmp_path / "clicks", tmp_path / "buys"
    clicks_dir.mkdir()
    buys_dir.mkdir()
    (clicks_dir / "c.json").write_text(
        "\n".join(
            [
                _ev(1, "click", "2024-01-01T10:00:00"),
                _ev(2, "click", "2024-01-01T10:00:00"),
                _ev(3, "click", "2024-01-01T12:00:00"),  # no purchase near
            ]
        )
        + "\n"
    )
    (buys_dir / "b.json").write_text(
        "\n".join(
            [
                _ev(1, "purchase", "2024-01-01T10:05:00"),  # within 10 min ✓
                _ev(2, "purchase", "2024-01-01T11:00:00"),  # 60 min later ✗
            ]
        )
        + "\n"
    )

    def _stream(path):
        raw = file_json_stream(spark, str(path), max_files_per_trigger=None)
        return parse_json_events(raw, wire, payload_col="value", ts_col="ts")

    joined = stream_interval_join(
        _stream(clicks_dir),
        _stream(buys_dir),
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        within_seconds=600,
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("click_ts"),
        F.col("r.ts").alias("purchase_ts"),
    )
    sink = str(tmp_path / "sink")
    q = (
        joined.writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 1
    assert rows[0]["user_id"] == 1
    assert str(rows[0]["purchase_ts"]).startswith("2024-01-01 10:05:00")


def test_compaction_after_streaming_appends(spark, tmp_path):
    """A streaming sink leaves one small file per (micro-batch × task);
    compaction must collapse them to the size-targeted count with identical
    data."""
    from kafkasparkstream_spark.tables import _list_parquet_files, compact_table

    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink" / "sensor_data")
    ckpt = str(tmp_path / "ckpt")
    # 3 micro-batches (maxFilesPerTrigger=1) → many small files.
    (src / "f1.json").write_text("\n".join(ONTIME[:2]) + "\n")
    (src / "f2.json").write_text("\n".join(ONTIME[2:]) + "\n")
    (src / "f3.json").write_text(RUN2_ONTIME + "\n")
    raw = file_json_stream(spark, str(src), max_files_per_trigger=1)
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    q = (
        parse_stage(raw, PipelineConfig())
        .writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    before_files = len(_list_parquet_files(sink))
    before = sorted(tuple(r) for r in spark.read.parquet(sink).drop("_batch_id").collect())
    assert before_files >= 3

    n_out = compact_table(spark, sink, target_file_bytes=1 << 30)
    assert n_out == 1 < before_files
    after = sorted(tuple(r) for r in spark.read.parquet(sink).drop("_batch_id").collect())
    assert after == before


def test_parquet_sink_retry_is_idempotent(spark, tmp_path):
    """A retried micro-batch (same batch_id re-delivered after a crash between
    sink write and checkpoint commit) must NOT double-append: the sink writes
    each batch into its own _batch_id partition with dynamic overwrite, so the
    replay replaces its own data. This exceeds the reference's at-least-once
    contract (processor.py:133 duplicates on replay)."""
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    sink = str(tmp_path / "out")
    write = foreach_batch_parquet_sink(sink)
    b0 = spark.createDataFrame([(1, 10.0), (2, 20.0)], "user_id long, value double")
    b1 = spark.createDataFrame([(3, 30.0)], "user_id long, value double")

    write(b0, 0)
    write(b1, 1)
    write(b0, 0)  # retry of batch 0 — must replace, not append
    out = spark.read.parquet(sink)
    assert out.count() == 3
    assert out.select("user_id").distinct().count() == 3
    # batch stamp is still visible for latest_state-style idempotent reads
    assert set(r._batch_id for r in out.select("_batch_id").distinct().collect()) == {0, 1}


def test_stateful_eviction_drops_idle_key(spark, tmp_path):
    """Eviction variant: a key idle past the processing-time timeout has its
    state removed — when it returns, totals restart from zero (proving the
    store no longer held it).

    Runs ONE continuously-triggered query stopped explicitly: eviction's
    supported deployment shape. (``Trigger.AvailableNow`` + ProcessingTime
    timeouts never terminates — see stateful.py module docstring — which is
    exactly why eviction is opt-in.)"""
    import time

    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType
    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.sources.json_parse import parse_json_events
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink
    from kafkasparkstream_spark.streaming.stateful import running_user_totals

    wire = StructType(
        [
            StructField("user_id", LongType(), True),
            StructField("value", DoubleType(), True),
            StructField("ts", StringType(), True),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "out")

    raw = file_json_stream(spark, str(src), max_files_per_trigger=10)
    parsed = parse_json_events(raw, wire, ts_col="ts")
    totals = running_user_totals(parsed, idle_timeout_ms=500)
    q = (
        totals.writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .start()  # default trigger: micro-batches as data (and timeouts) arrive
    )

    def emissions_for(uid, n_expected, deadline_s=60):
        """Poll the sink until user `uid` has n_expected emissions; return them
        ordered by batch id."""
        end = time.time() + deadline_s
        while time.time() < end:
            try:
                pdf = spark.read.parquet(sink).toPandas()
                rows = pdf[pdf.user_id == uid].sort_values("_batch_id")
                if len(rows) >= n_expected:
                    return rows
            except Exception:
                pass  # sink dir not created yet
            time.sleep(0.2)
        raise AssertionError(f"timed out waiting for {n_expected} emissions of user {uid}")

    try:
        (src / "a.json").write_text(
            json.dumps({"user_id": 1, "value": 10.0, "ts": "2024-01-01T10:00:00"}) + "\n"
        )
        u1 = emissions_for(1, 1)
        assert list(u1["n_events"]) == [1]

        time.sleep(1.0)  # let user 1 sit idle past the 500 ms timeout
        # a batch with only user 2 fires user 1's pending timeout -> eviction
        (src / "b.json").write_text(
            json.dumps({"user_id": 2, "value": 7.0, "ts": "2024-01-01T10:01:00"}) + "\n"
        )
        emissions_for(2, 1)

        # user 1 returns: state was evicted, so totals restart at n_events=1
        (src / "c.json").write_text(
            json.dumps({"user_id": 1, "value": 2.0, "ts": "2024-01-01T10:02:00"}) + "\n"
        )
        u1 = emissions_for(1, 2)
        assert list(u1["n_events"]) == [1, 1], (
            f"expected restart-from-zero after eviction, got {list(u1['n_events'])}"
        )
        assert abs(u1["sum_value"].iloc[-1] - 2.0) < 1e-9
    finally:
        q.stop()


def test_dedup_within_watermark_collapses_restamped_retry(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a producer retry that re-stamps the
    timestamp (same device key, different event time) still collapses to one
    row; a genuinely new reading from the same device outside the watermark
    horizon survives."""
    from kafkasparkstream_spark.sources.json_parse import parse_json_events
    from kafkasparkstream_spark.streaming.pipeline import (
        dedup_within_watermark_stage,
    )
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    src = tmp_path / "src"
    src.mkdir()
    # Batch 1: original + re-stamped retry (collapse) + a second device.
    (src / "f1.json").write_text(
        "\n".join(
            [
                _event("sensor_1", "temperature", "room1", 20.0, 90.0, "2024-01-01T10:00:05"),
                # retry of the same reading, re-stamped 3 s later → dup
                _event("sensor_1", "temperature", "room1", 20.0, 90.0, "2024-01-01T10:00:08"),
                _event("sensor_2", "temperature", "room1", 22.0, 80.0, "2024-01-01T10:00:30"),
            ]
        )
        + "\n"
    )
    # Batches 2-3 advance the watermark past sensor_1's dedup-state expiry
    # (first-seen 10:00:05 + 1 min). Two advancing batches because state
    # eviction runs at batch END against the PREVIOUS batch's watermark —
    # a single advancing batch leaves the old entry visible one batch longer.
    (src / "f2.json").write_text(
        _event("sensor_3", "humidity", "kitchen", 50.0, 70.0, "2024-01-01T10:05:00") + "\n"
    )
    (src / "f3.json").write_text(
        _event("sensor_3", "humidity", "kitchen", 51.0, 70.0, "2024-01-01T10:06:00") + "\n"
    )
    (src / "f4.json").write_text(
        _event("sensor_3", "humidity", "kitchen", 52.0, 70.0, "2024-01-01T10:07:00") + "\n"
    )
    # Final batch: same device again, far outside the horizon → NEW reading.
    (src / "f5.json").write_text(
        _event("sensor_1", "temperature", "room1", 24.0, 89.0, "2024-01-01T10:30:00") + "\n"
    )

    raw = file_json_stream(spark, str(src), max_files_per_trigger=1)
    parsed = parse_json_events(raw, PipelineConfig().schema, ts_col="timestamp")
    deduped = dedup_within_watermark_stage(parsed, keys=("device_id",))
    sink = str(tmp_path / "sink")
    q = (
        deduped.writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(sink)
    s1 = got.filter(F.col("device_id") == "sensor_1")
    # late-horizon reading (10:30) survives; the re-stamped retry collapsed
    assert s1.count() == 2, s1.collect()
    assert got.filter(F.col("device_id") == "sensor_2").count() == 1


def test_pipeline_on_rocksdb_state_store(spark, tmp_path):
    """The full pipeline (watermark → window → update-mode agg) must produce
    the identical final state on the RocksDB state store provider — the
    bounded-heap provider high-cardinality deployments need — as on the
    default HDFS-backed one."""
    from kafkasparkstream_spark.session import use_rocksdb_state

    src = tmp_path / "src"
    src.mkdir()
    (src / "f1.json").write_text("\n".join(ONTIME) + "\n")

    def run(tag):
        sink, ckpt = str(tmp_path / f"sink_{tag}"), str(tmp_path / f"ckpt_{tag}")
        _run_available_now(spark, str(src), sink, ckpt)
        return {
            tuple(r)
            for r in latest_state(
                spark.read.parquet(f"{sink}/sensor_aggregates"),
                ("window_start", "window_end", "device_type", "location"),
            ).collect()
        }

    base = run("default")
    use_rocksdb_state(spark)
    try:
        rocks = run("rocksdb")
    finally:
        use_rocksdb_state(spark, enable=False)
    assert rocks == base and len(base) > 0


def test_left_outer_join_drains_tail_when_one_stream_ends_early(spark, tmp_path):
    """Regression: Spark's global watermark is the MIN across both streams,
    so a flush sentinel derived per-side strands the long side's tail
    unmatched rows whenever the short side ends hours earlier. With both
    sentinels anchored on the union's max ts, every unmatched left row
    must null-extend out of state — clicks three hours after the last
    error included."""
    import datetime as dt

    from pyspark.sql import functions as F

    from kafkasparkstream_spark.queries import (
        EVENT_WIRE_SCHEMA,
        _clamped_shuffle_partitions,
        _wire_with_flush_sentinel,
    )
    from kafkasparkstream_spark.sources.json_parse import parse_json_events
    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.streaming.pipeline import stream_interval_join
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = []
    # errors only in the first 10 minutes; clicks trail on for 3 more hours
    for i in range(3):
        rows.append((100 + i, i % 2, "error", 1.0, base + dt.timedelta(minutes=i)))
    for i in range(8):
        rows.append((200 + i, i % 2, "click", 1.0, base + dt.timedelta(minutes=25 * i)))
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double, ts timestamp"
    )
    src_c, src_e = str(tmp_path / "clicks"), str(tmp_path / "errors")
    _wire_with_flush_sentinel(
        events.filter(F.col("event_type") == "click"), src_c, anchor=events
    )
    _wire_with_flush_sentinel(
        events.filter(F.col("event_type") == "error"), src_e, anchor=events
    )

    def _stream(path):
        raw = file_json_stream(spark, path, max_files_per_trigger=None)
        return parse_json_events(raw, EVENT_WIRE_SCHEMA, payload_col="value", ts_col="ts")

    pairs = stream_interval_join(
        _stream(src_c), _stream(src_e),
        key="user_id", left_ts="ts", right_ts="ts",
        watermark="1 minute", within_seconds=600, how="left_outer",
    ).select(
        F.col("l.event_id").alias("click_id"), F.col("r.event_id").alias("error_id")
    )
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    with _clamped_shuffle_partitions(spark):
        q = (
            pairs.writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    got = spark.read.parquet(sink).filter(F.col("click_id") >= 0)
    # every real click must appear; the tail ones null-extended (the join
    # looks for errors in the 10 minutes FOLLOWING each click, and no error
    # exists after minute 2)
    clicks_out = {r["click_id"] for r in got.collect()}
    assert clicks_out == {200 + i for i in range(8)}
    unmatched = {r["click_id"] for r in got.filter(F.col("error_id").isNull()).collect()}
    assert {200 + i for i in range(1, 8)} <= unmatched


def test_interval_join_state_survives_restart(spark, tmp_path):
    """Stream-stream join state must persist across a full stop/restart:
    clicks delivered in run 1 match errors that only arrive in run 2 (same
    checkpoint), and the final left-outer sink equals the batch answer.
    This is ST6 (replay/recovery) for the hardest stateful operator."""
    import datetime as dt
    import json as js
    import os

    from pyspark.sql import functions as F

    from kafkasparkstream_spark.queries import (
        EVENT_WIRE_SCHEMA,
        _clamped_shuffle_partitions,
    )
    from kafkasparkstream_spark.sources.json_parse import parse_json_events
    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.streaming.pipeline import stream_interval_join
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    base = dt.datetime(2024, 5, 1, 9, 0, 0)

    def wire(eid, uid, typ, minutes):
        ts = (base + dt.timedelta(minutes=minutes)).strftime("%Y-%m-%dT%H:%M:%S.%f")
        return js.dumps(
            {"event_id": eid, "user_id": uid, "event_type": typ, "value": 1.0, "ts": ts}
        )

    src_c, src_e = tmp_path / "clicks", tmp_path / "errors"
    os.makedirs(src_c); os.makedirs(src_e)
    # run 1: clicks only (no errors yet) — join state must hold them
    (src_c / "w1.json").write_text(
        "\n".join([wire(200, 0, "click", 0), wire(201, 1, "click", 1)]) + "\n"
    )
    (src_e / "w1.json").write_text("")  # empty first wave

    def run_once():
        def _stream(path):
            raw = file_json_stream(spark, str(path), max_files_per_trigger=None)
            return parse_json_events(
                raw, EVENT_WIRE_SCHEMA, payload_col="value", ts_col="ts"
            )

        pairs = stream_interval_join(
            _stream(src_c), _stream(src_e),
            key="user_id", left_ts="ts", right_ts="ts",
            watermark="1 minute", within_seconds=600, how="left_outer",
        ).select(
            F.col("l.event_id").alias("click_id"),
            F.col("r.event_id").alias("error_id"),
        )
        with _clamped_shuffle_partitions(spark):
            q = (
                pairs.writeStream.foreachBatch(
                    foreach_batch_parquet_sink(str(tmp_path / "sink"))
                )
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    run_once()  # run 1: both clicks parked in state, nothing emitted

    # run 2: an error for user 0 within click 200's 10-minute window, plus
    # flush sentinels on both sides (max real ts + 2 h)
    (src_c / "w2.json").write_text(wire(-1, -1, "flush", 125) + "\n")
    (src_e / "w2.json").write_text(
        "\n".join([wire(100, 0, "error", 5), wire(-1, -1, "flush", 125)]) + "\n"
    )
    run_once()  # same checkpoint: recovered state must match the new error

    got = {
        (r["click_id"], r["error_id"])
        for r in spark.read.parquet(str(tmp_path / "sink"))
        .filter(F.col("click_id") >= 0)
        .collect()
    }
    # click 200 (run 1) matched by error 100 (run 2) — state crossed the
    # restart; click 201 drains unmatched via the sentinels
    assert got == {(200, 100), (201, None)}


def test_stream_throughput_harness_verifies_state(spark):
    """The throughput artifact's correctness gate is load-bearing: run the
    harness's micro-batch mode at sf0.001 and require the
    verified-vs-batch-shadow flag (a throughput number for a wrong answer
    must never be recorded)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "stream_throughput",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "stream_throughput.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from kafkasparkstream_spark.tables import load_table

    events = load_table(spark, "events", "/root/testdata/sf0.001")
    r = mod.run_mode(spark, events, "microbatch", n_files=4)
    assert r["verified_vs_batch_shadow"] and r["events"] == events.count()
    assert r["micro_batches"] >= 4


def test_transform_with_state_matches_apply_in_pandas_with_state(spark, tmp_path):
    """Spark 4's transformWithStateInPandas twin must reproduce the
    applyInPandasWithState accumulator's final state exactly across the
    same two micro-batches (cross-batch state carry on the new API, RocksDB
    provider as it requires).

    Gated on protobuf: the transformWithState Python state server speaks
    protobuf to the JVM; this container has no `google.protobuf` and pip is
    unavailable (ENVIRONMENT.md), so here the test SKIPs — it runs for real
    wherever protobuf exists."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state server needs protobuf (ENVIRONMENT.md)",
    )
    import json as _json

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from kafkasparkstream_spark.session import use_rocksdb_state
    from kafkasparkstream_spark.sources.json_parse import parse_json_events
    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink
    from kafkasparkstream_spark.streaming.stateful import (
        running_user_totals,
        running_user_totals_tws,
    )

    wire = StructType(
        [
            StructField("user_id", LongType(), True),
            StructField("value", DoubleType(), True),
            StructField("ts", StringType(), True),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    rows1 = [
        _json.dumps({"user_id": 1, "value": 10.0, "ts": "2024-01-01T10:00:00"}),
        _json.dumps({"user_id": 1, "value": 5.0, "ts": "2024-01-01T10:00:10"}),
        _json.dumps({"user_id": 2, "value": 7.0, "ts": "2024-01-01T10:00:20"}),
    ]
    rows2 = [_json.dumps({"user_id": 1, "value": 2.5, "ts": "2024-01-01T10:01:00"})]
    (src / "a.json").write_text("\n".join(rows1) + "\n")
    (src / "b.json").write_text("\n".join(rows2) + "\n")

    def run(op, tag):
        raw = file_json_stream(spark, str(src), max_files_per_trigger=1)
        parsed = parse_json_events(raw, wire, ts_col="ts")
        sink = str(tmp_path / f"out_{tag}")
        q = (
            op(parsed)
            .writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
            .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.read.parquet(sink).toPandas()
        return out.sort_values("n_events").groupby("user_id").last()

    base = run(running_user_totals, "gs")
    use_rocksdb_state(spark)
    try:
        tws = run(running_user_totals_tws, "tws")
    finally:
        use_rocksdb_state(spark, enable=False)

    assert tws.equals(base), f"\nbase:\n{base}\ntws:\n{tws}"
    assert tws.loc[1, "n_events"] == 3 and abs(tws.loc[1, "sum_value"] - 17.5) < 1e-9


def test_jdbc_sink_real_roundtrip_embedded_derby(spark, tmp_path):
    """S3 SUCCESS path over a REAL JDBC database (processor.py:124-140).

    The sandbox has no Postgres, but Spark's own classpath ships the
    embedded Derby driver (derby-10.16 jars, used by the Hive metastore),
    so the reference's actual sink call — ``batch_df.write.jdbc(url, table,
    mode="append")`` from inside foreachBatch — can execute against a live
    database: stream → parse → JDBC append per micro-batch → read the table
    back via ``spark.read.jdbc`` and match the batch-parsed shadow. Also
    exercises ST8 (empty batch never touches the database) and ST7 (a
    failing write against the live table is isolated; the table keeps its
    prior contents)."""
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_jdbc_sink

    # Keep derby.log out of the repo cwd (property read at engine boot).
    spark._jvm.java.lang.System.setProperty(
        "derby.stream.error.file", str(tmp_path / "derby.log")
    )
    url = f"jdbc:derby:{tmp_path}/kssdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    src = tmp_path / "src"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(ONTIME[:2]) + "\n")
    (src / "b2.json").write_text("\n".join(ONTIME[2:]) + "\n")

    raw = file_json_stream(spark, str(src), max_files_per_trigger=1)
    parsed = parse_stage(raw, PipelineConfig())
    q = (
        parsed.writeStream.foreachBatch(
            foreach_batch_jdbc_sink(url, "sensor_data", properties=props)
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    back = spark.read.jdbc(url, "sensor_data", properties=props)
    shadow = parse_stage(
        spark.read.text(str(src)).withColumnRenamed("value", "v")
        .selectExpr("CAST(v AS BINARY) AS value"),
        PipelineConfig(),
    )
    key = lambda r: (r["device_id"], r["timestamp"])  # noqa: E731
    got = sorted(map(key, back.collect()))
    want = sorted(map(key, shadow.collect()))
    assert got == want and len(got) == 4
    assert back.schema["value"].dataType.typeName() == "double"

    # ST8: an empty batch must not create (or touch) a table.
    sink2 = foreach_batch_jdbc_sink(url, "never_created", properties=props)
    sink2(back.filter("1=0"), 7)
    with pytest.raises(Exception):
        spark.read.jdbc(url, "never_created", properties=props).collect()

    # ST7 against the LIVE table: incompatible schema append fails inside
    # the guard; stream-side contract is "log and continue", table intact.
    bad = spark.createDataFrame([(1,)], ["only_one_col"])
    foreach_batch_jdbc_sink(url, "sensor_data", properties=props)(bad, 8)
    assert spark.read.jdbc(url, "sensor_data", properties=props).count() == 4


def test_upsert_sink_stored_table_is_duplicate_free(spark, tmp_path):
    """ST3 production fix, executable: update-mode refinements REPLACE their
    stored row via the manifest-swap upsert sink, so the table itself —
    no latest_state read — is duplicate-free and equals the batch shadow."""
    from kafkasparkstream_spark.streaming.sinks import (
        foreach_batch_upsert_sink,
        read_upsert_table,
    )

    src = tmp_path / "src"
    src.mkdir()
    # Batch 1 and batch 2 both hit window 10:00/temperature/room1 → the
    # second micro-batch refines the first's row (count 1 → 2).
    (src / "b1.json").write_text(ONTIME[0] + "\n")
    (src / "b2.json").write_text("\n".join(ONTIME[1:]) + "\n")

    cfg = PipelineConfig()
    keys = ("window_start", "window_end", "device_type", "location")
    tbl = str(tmp_path / "agg_upsert")
    raw = file_json_stream(spark, str(src), max_files_per_trigger=1)
    q = (
        windowed_aggregate_stage(parse_stage(raw, cfg), cfg)
        .writeStream.foreachBatch(foreach_batch_upsert_sink(tbl, keys))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    stored = read_upsert_table(spark, tbl)
    assert stored.groupBy(*keys).count().filter("count > 1").count() == 0
    refined = stored.filter(
        "device_type = 'temperature' AND location = 'room1' "
        "AND window_start = timestamp'2024-01-01 10:00:00'"
    ).collect()
    assert len(refined) == 1 and refined[0]["reading_count"] == 2

    batch_shadow = windowed_aggregate_stage(
        parse_stage(
            spark.read.text(str(src))
            .withColumnRenamed("value", "v")
            .selectExpr("CAST(v AS BINARY) AS value"),
            cfg,
        ),
        cfg,
    )
    assert stored.exceptAll(batch_shadow).count() == 0
    assert batch_shadow.exceptAll(stored).count() == 0


def test_upsert_sink_replay_and_crash_are_idempotent(spark, tmp_path):
    """A checkpoint replay of an already-swapped batch (same batch_id) must
    converge to the identical row set via a FRESH attempt dir — and a
    'crash' that leaves a stale unreferenced version dir must not corrupt
    reads. Also ST8 (empty batch leaves no trace) and ST7 isolation."""
    import os

    from kafkasparkstream_spark.streaming.sinks import (
        foreach_batch_upsert_sink,
        read_upsert_table,
    )

    tbl = str(tmp_path / "tbl")
    sink = foreach_batch_upsert_sink(tbl, ("k",), num_buckets=4)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    sink(b0, 0)
    sink(b0, 0)  # replay after completed swap
    assert sorted((r["k"], r["v"]) for r in read_upsert_table(spark, tbl).collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    # refinement batch replaces k=1, adds k=3; replayed twice as well
    b1 = spark.createDataFrame([(1, "a2"), (3, "c")], ["k", "v"])
    sink(b1, 1)
    sink(b1, 1)
    got = sorted((r["k"], r["v"]) for r in read_upsert_table(spark, tbl).collect())
    assert got == [(1, "a2"), (2, "b"), (3, "c")]
    # crash simulation: an orphan version dir (written, never swapped in)
    # is invisible to readers.
    os.makedirs(os.path.join(tbl, "data", "v99", "_kb=0"), exist_ok=True)
    assert sorted(
        (r["k"], r["v"]) for r in read_upsert_table(spark, tbl).collect()
    ) == got
    # ST8: empty batch is a no-op (manifest untouched).
    before = open(os.path.join(tbl, "_manifest.json")).read()
    sink(b1.filter("k < 0"), 2)
    assert open(os.path.join(tbl, "_manifest.json")).read() == before
    # ST7: a failing merge (schema mismatch vs stored buckets) isolates.
    bad = spark.createDataFrame([("x",)], ["wrong"])
    foreach_batch_upsert_sink(tbl, ("wrong",), num_buckets=4)(bad, 3)
    assert sorted(
        (r["k"], r["v"]) for r in read_upsert_table(spark, tbl).collect()
    ) == got


def test_upsert_vacuum_removes_only_unreferenced_versions(spark, tmp_path):
    """Vacuum deletes superseded/orphaned version dirs, never a referenced
    one; reads are identical before and after."""
    import os

    from kafkasparkstream_spark.streaming.sinks import (
        foreach_batch_upsert_sink,
        read_upsert_table,
        vacuum_upsert_table,
    )

    tbl = str(tmp_path / "tbl")
    sink = foreach_batch_upsert_sink(tbl, ("k",), num_buckets=2)
    sink(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), 0)
    sink(spark.createDataFrame([(1, "a2")], ["k", "v"]), 1)  # supersedes k=1's bucket in v0
    os.makedirs(os.path.join(tbl, "data", "v99", "_kb=0"), exist_ok=True)  # crash orphan
    before = sorted(map(tuple, read_upsert_table(spark, tbl).collect()))
    removed = vacuum_upsert_table(tbl)
    assert "v99" in removed
    assert sorted(map(tuple, read_upsert_table(spark, tbl).collect())) == before
    # every remaining dir is referenced
    import json

    refs = set(json.load(open(os.path.join(tbl, "_manifest.json")))["buckets"].values())
    assert set(os.listdir(os.path.join(tbl, "data"))) == refs


def test_upsert_vacuum_under_replay_convergence(spark, tmp_path):
    """Vacuum interleaved with checkpoint replay (the serialized-writer
    contract, sinks.py vacuum docstring): a vacuum between a completed
    swap and that batch's replay never breaks read_upsert_table, and the
    replay re-converges to the identical row set — vacuum only ever
    removes dirs no manifest references, replay writes a fresh attempt
    dir, so the two operations commute."""
    import json
    import os

    from kafkasparkstream_spark.streaming.sinks import (
        foreach_batch_upsert_sink,
        read_upsert_table,
        vacuum_upsert_table,
    )

    tbl = str(tmp_path / "tbl")
    sink = foreach_batch_upsert_sink(tbl, ("k",), num_buckets=2)
    sink(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), 0)
    b1 = spark.createDataFrame([(1, "a2"), (3, "c")], ["k", "v"])
    sink(b1, 1)
    want = [(1, "a2"), (2, "b"), (3, "c")]

    def snapshot():
        return sorted((r["k"], r["v"]) for r in read_upsert_table(spark, tbl).collect())

    # vacuum after the swap, before the replay: reads stay intact
    vacuum_upsert_table(tbl)
    assert snapshot() == want
    # replay of the already-swapped batch after that vacuum: converges
    sink(b1, 1)
    assert snapshot() == want
    # vacuum again after the replay; the replay's superseded dirs go,
    # referenced ones stay, reads unchanged
    vacuum_upsert_table(tbl)
    assert snapshot() == want
    refs = set(json.load(open(os.path.join(tbl, "_manifest.json")))["buckets"].values())
    assert set(os.listdir(os.path.join(tbl, "data"))) == refs
    # one more replay cycle on a vacuumed table still converges
    sink(b1, 1)
    vacuum_upsert_table(tbl)
    assert snapshot() == want


def test_upsert_read_before_any_batch(spark, tmp_path):
    """A table whose stream never committed (empty source + skip_empty)
    has no manifest: read with a schema returns an empty DataFrame; read
    without one raises a descriptive error naming the path and cause."""
    import pytest

    from kafkasparkstream_spark.streaming.sinks import (
        foreach_batch_upsert_sink,
        read_upsert_table,
    )

    tbl = str(tmp_path / "never_written")
    # skip_empty: an all-empty stream leaves no manifest behind
    sink = foreach_batch_upsert_sink(tbl, ("k",), num_buckets=2)
    empty = spark.createDataFrame([], "k int, v string")
    sink(empty, 0)

    df = read_upsert_table(spark, tbl, schema="k int, v string")
    assert df.count() == 0 and df.columns == ["k", "v"]
    with pytest.raises(FileNotFoundError, match="no micro-batch has committed"):
        read_upsert_table(spark, tbl)


def test_deep_release_frees_pinned_storage_and_streaming_survives(spark, tmp_path):
    """deep_release must (a) drop raw localCheckpoint blocks that no
    per-operator registry tracks, and (b) unload state-store providers
    WITHOUT breaking a subsequent streaming query — the long-session leak
    that starved a hash aggregate of execution memory ~190 queries into a
    full-registry sf1.0 sweep (UNABLE_TO_ACQUIRE_MEMORY)."""
    from pyspark.sql import functions as F

    from kafkasparkstream_spark.operators.dedup import deep_release
    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    # (a) a raw (untracked) localCheckpoint pins blocks
    df = spark.range(1000).withColumn("v", F.col("id") * 2).localCheckpoint()
    assert df.count() == 1000
    assert spark.sparkContext._jsc.getPersistentRDDs().size() >= 1
    deep_release(spark)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0

    # (b) streaming works after a provider unload: run the same tiny
    # replay twice with deep_release in between
    import json

    src = tmp_path / "src"
    src.mkdir()
    rows = [{"id": i, "ts": f"2024-01-01T00:00:{i % 60:02d}", "v": i} for i in range(50)]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))

    def replay(tag: str) -> int:
        out, ckpt = str(tmp_path / f"out_{tag}"), str(tmp_path / f"ckpt_{tag}")
        raw = file_json_stream(spark, str(src), max_files_per_trigger=None)
        parsed = raw.selectExpr(
            "CAST(get_json_object(value, '$.id') AS LONG) AS id",
            "CAST(get_json_object(value, '$.ts') AS TIMESTAMP) AS ts",
            "CAST(get_json_object(value, '$.v') AS LONG) AS v",
        )
        agg = (
            parsed.withWatermark("ts", "1 minute")
            .groupBy(F.window("ts", "1 minute").alias("w"))
            .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n"))
            .select("w.start", "sv", "n")
        )
        q = (
            agg.writeStream.foreachBatch(foreach_batch_parquet_sink(out))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).agg(F.sum("n")).collect()[0][0]

    n1 = replay("one")
    deep_release(spark)
    n2 = replay("two")
    assert n1 == n2 == 50


def test_clamped_shuffle_partitions_is_scale_aware(spark):
    """Bounded-replay state-store sizing: small replays pin the 8-provider
    store (per-provider commit overhead dominates at the sf0.01 gate);
    large replays (rows >= 200k) keep the session's full width — 8 state
    partitions on a 32-core session measured 2x the wall at sf1.0."""
    from kafkasparkstream_spark.queries import _clamped_shuffle_partitions

    old = spark.conf.get("spark.sql.shuffle.partitions")
    with _clamped_shuffle_partitions(spark, rows=10_000):
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(
            min(int(old), 8)
        )
    with _clamped_shuffle_partitions(spark, rows=1_000_000):
        assert spark.conf.get("spark.sql.shuffle.partitions") == old
    with _clamped_shuffle_partitions(spark):  # rows unknown -> conservative
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(
            min(int(old), 8)
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_stream_workdir_reaps_stale_and_registers_for_exit(tmp_path, monkeypatch):
    """The streaming workdir leak guards (round 6): a crashed earlier
    process's stale same-prefix dir is reaped on the next call, a fresh
    (recent) dir is left alone, and every dir created by THIS process is
    registered so the atexit hook removes it. Before the guards, each
    streaming registry query leaked its ~250 MB workdir permanently —
    81 GB had accumulated by round 6 and failed Spark shuffles with
    ENOSPC."""
    import os
    import time as _time

    from kafkasparkstream_spark import queries as q

    monkeypatch.setattr(q.tempfile, "gettempdir", lambda: str(tmp_path))

    stale = tmp_path / "kss_t_stale"
    stale.mkdir()
    (stale / "payload").write_text("x")
    old = _time.time() - q._STALE_WORKDIR_S - 60
    os.utime(stale, (old, old))
    fresh = tmp_path / "kss_t_fresh"
    fresh.mkdir()
    other = tmp_path / "kss_other_stale"
    other.mkdir()
    os.utime(other, (old, old))

    created = tmp_path / "kss_t_new"
    created.mkdir()
    monkeypatch.setattr(q.tempfile, "mkdtemp", lambda prefix: str(created))

    before = list(q._STREAM_WORKDIRS)
    got = q._stream_workdir("kss_t_")
    assert got == str(created)
    assert not stale.exists(), "stale same-prefix dir must be reaped"
    assert fresh.exists(), "recent same-prefix dir must survive"
    assert other.exists(), "other-prefix dirs are not this call's business"
    assert q._STREAM_WORKDIRS[-1] == str(created)

    q._reap_stream_workdirs()
    assert not created.exists(), "atexit hook must remove registered dirs"
    assert q._STREAM_WORKDIRS == []
    q._STREAM_WORKDIRS.extend(d for d in before if os.path.isdir(d))
