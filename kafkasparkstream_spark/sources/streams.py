"""Streaming sources (S1/G1, SURVEY.md §2.1).

Three interchangeable sources behind one config switch, all yielding the same
payload-column shape so the downstream parse chain is source-agnostic:

- **kafka** — the reference's source (processor.py:60-67): subscribe topic,
  earliest offsets, tolerate data loss. Requires the spark-sql-kafka package
  on the cluster; constructing the reader is lazy, so code paths stay
  importable without it.
- **file** — directory of JSON-lines files; the deterministic test source
  (Trigger.AvailableNow replays a fixed event set batch-by-batch).
- **rate** — Spark's synthetic rate source transformed into the reference's
  sensor-event JSON (generator.py:37-48 analog) for live demos.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Kafka streaming source (S1). Yields standard Kafka columns; the JSON
    payload is in ``value`` (binary) — feed to ``parse_json_events``.

    Mirrors reference options (processor.py:60-67): earliest offsets for
    replay, failOnDataLoss=false for data-loss tolerance (ST6).
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
        .load()
    )


def file_json_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """File-based JSON-lines stream with one raw ``value`` string column —
    wire-compatible with the Kafka payload so tests exercise the identical
    parse chain."""
    reader = (
        spark.readStream.schema(StructType().add("value", StringType()))
        .format("text")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path).select(F.col("value"))


def rate_sensor_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Rate-source sensor-event synthesizer (G1 analog, generator.py:37-48):
    deterministic column transforms over the monotonically increasing
    ``value`` counter — same categories/domains as the reference producer,
    emitted as a JSON ``value`` column."""
    device_types = F.array(*[F.lit(x) for x in
        ("temperature", "humidity", "pressure", "motion", "light")])
    locations = F.array(*[F.lit(x) for x in
        ("room1", "room2", "kitchen", "living_room", "bathroom", "outdoor")])
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    seed = F.col("value")
    record = F.struct(
        F.concat(F.lit("sensor_"), (seed % 100 + 1).cast("string")).alias("device_id"),
        F.element_at(device_types, (seed % 5 + 1).cast("int")).alias("device_type"),
        F.element_at(locations, (seed % 6 + 1).cast("int")).alias("location"),
        F.round((F.pmod(F.hash(seed), F.lit(10000)) / 100.0), 2).alias("value"),
        (F.pmod(F.hash(seed + 1), F.lit(10000)) / 100.0).alias("battery_level"),
        F.date_format("timestamp", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("timestamp"),
    )
    return rate.select(F.to_json(record).alias("value"))


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
    output_mode: str = "append",
):
    """Kafka streaming sink: serializes every row to a JSON ``value`` and
    publishes to ``topic`` — the write-side twin of :func:`kafka_stream`
    (requires the same spark-sql-kafka package; construction is lazy so
    code paths stay importable without it).

    Returns the started StreamingQuery.
    """
    payload = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
        .outputMode(output_mode)
        .start()
    )
