"""HTTP shim tests: the five reference endpoints served over real pipeline
sink tables, asserted against the reference's response shapes
(api-service/app.py:43-68 Pydantic models and endpoint bodies)."""

from __future__ import annotations

import json

import pytest

from kafkasparkstream_spark.api import create_app
from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink


@pytest.fixture(scope="module")
def app_client(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("api-root")
    readings = spark.createDataFrame(
        [
            ("sensor_1", "temperature", "room1", 20.0, 90.0, "2024-01-01T10:00:05"),
            ("sensor_2", "temperature", "room1", 22.0, 80.0, "2024-01-01T10:00:30"),
            ("sensor_3", "humidity", "kitchen", 55.0, 70.0, "2024-01-01T10:01:10"),
            ("sensor_1", "temperature", "room1", 24.0, 89.0, "2024-01-01T10:02:50"),
        ],
        "device_id string, device_type string, location string, value double,"
        " battery_level double, timestamp string",
    )
    # build via the real sink callback so the read path (batch partitions,
    # latest_state) is exercised end-to-end
    from pyspark.sql import functions as F

    readings = readings.withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    foreach_batch_parquet_sink(str(root / "sensor_data"))(readings, 0)

    aggs0 = spark.createDataFrame(
        [
            ("2024-01-01T10:00:00", "2024-01-01T10:01:00", "temperature", "room1", 21.0, 20.0, 22.0, 85.0, 2),
            ("2024-01-01T10:01:00", "2024-01-01T10:02:00", "humidity", "kitchen", 55.0, 55.0, 55.0, 70.0, 1),
        ],
        "window_start string, window_end string, device_type string, location string,"
        " avg_value double, min_value double, max_value double, avg_battery double,"
        " reading_count long",
    )
    aggs0 = aggs0.withColumn("window_start", F.col("window_start").cast("timestamp")).withColumn(
        "window_end", F.col("window_end").cast("timestamp")
    )
    sink = foreach_batch_parquet_sink(str(root / "sensor_aggregates"))
    sink(aggs0, 0)
    # update-mode refinement of the first window in a later batch: the served
    # row must be the refined one (latest_state), not the stale duplicate
    refined = aggs0.filter(F.col("device_type") == "temperature").withColumn(
        "avg_value", F.lit(22.0)
    ).withColumn("reading_count", F.lit(3).cast("long"))
    sink(refined, 1)

    app = create_app(spark, str(root))
    app.config.update(TESTING=True)
    return app.test_client()


def _get(client, path):
    resp = client.get(path)
    return resp.status_code, json.loads(resp.data)


def test_health(app_client):
    code, body = _get(app_client, "/health")
    assert code == 200
    assert body["status"] == "healthy" and "timestamp" in body


def test_sensors_shape(app_client):
    code, body = _get(app_client, "/api/sensors")
    assert code == 200
    assert {frozenset(r) for r in body} == {frozenset({"device_id", "device_type", "location"})}
    ids = [r["device_id"] for r in body]
    assert sorted(ids) == ["sensor_1", "sensor_2", "sensor_3"]
    # reference orders by device_type, location (app.py:125)
    assert body[0]["device_type"] == "humidity"


def test_latest_filtered_and_cached(app_client):
    code, body = _get(app_client, "/api/data/latest?device_type=temperature")
    assert code == 200
    assert len(body) == 3
    assert all(r["device_type"] == "temperature" for r in body)
    # newest first (app.py:170)
    assert body[0]["value"] == 24.0
    # repeated filtered call is served from cache (reference caches only
    # filtered, non-empty results — app.py:178-185)
    code2, body2 = _get(app_client, "/api/data/latest?device_type=temperature")
    assert code2 == 200 and body2 == body


def test_aggregates_serves_refined_row(app_client):
    code, body = _get(app_client, "/api/aggregates?hours=24")
    assert code == 200
    temp = [r for r in body if r["device_type"] == "temperature"]
    assert len(temp) == 1, "duplicate update-mode appends must collapse"
    assert temp[0]["avg_value"] == 22.0 and temp[0]["reading_count"] == 3
    # window_start descending
    starts = [r["window_start"] for r in body]
    assert starts == sorted(starts, reverse=True)


def test_aggregates_hours_validation(app_client):
    code, _ = _get(app_client, "/api/aggregates?hours=25")
    assert code == 422
    code, _ = _get(app_client, "/api/aggregates?hours=abc")
    assert code == 422


def test_stats_shape(app_client):
    code, body = _get(app_client, "/api/stats")
    assert code == 200
    assert body["total_readings"] == 4
    assert body["device_type_distribution"] == {"temperature": 3, "humidity": 1}
    assert body["location_distribution"] == {"room1": 3, "kitchen": 1}
    # reference serves distributions ordered by count desc (app.py:238-288);
    # the single-pass GROUPING SETS rewrite must preserve that
    assert list(body["device_type_distribution"]) == ["temperature", "humidity"]
    assert list(body["location_distribution"]) == ["room1", "kitchen"]
    assert body["time_range"]["earliest"].startswith("2024-01-01T10:00:05")
    assert body["time_range"]["latest"].startswith("2024-01-01T10:02:50")
