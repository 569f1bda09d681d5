"""Explicit schemas — the engine's schema-on-read regime.

The reference declares its event schema explicitly rather than inferring it
(spark-processor/processor.py:48-55); we keep that regime: every stream gets a
declared StructType, no inference in the hot path.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: The reference's IoT sensor-reading event schema
#: (spark-processor/processor.py:48-55). ``timestamp`` arrives as an ISO-8601
#: string and is cast to TimestampType downstream (processor.py:76 analog).
SENSOR_READING_SCHEMA = StructType(
    [
        StructField("device_id", StringType(), True),
        StructField("device_type", StringType(), True),
        StructField("location", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("battery_level", DoubleType(), True),
        StructField("timestamp", StringType(), True),
    ]
)

#: Output shape of the reference's windowed aggregate
#: (processor.py:82-95, flattened as the JDBC write does — api-service/app.py:89-102).
SENSOR_AGGREGATE_SCHEMA = StructType(
    [
        StructField("window_start", TimestampType(), True),
        StructField("window_end", TimestampType(), True),
        StructField("device_type", StringType(), True),
        StructField("location", StringType(), True),
        StructField("avg_value", DoubleType(), True),
        StructField("min_value", DoubleType(), True),
        StructField("max_value", DoubleType(), True),
        StructField("avg_battery", DoubleType(), True),
        StructField("reading_count", LongType(), True),
    ]
)

#: The driver testdata `events` table — structural stand-in for the sensor
#: stream (event time + low-cardinality dims + measure + JSON props).
EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

#: Schema of the JSON payload inside ``events.props``.
EVENT_PROPS_SCHEMA = StructType([StructField("k", LongType(), True)])

#: Multimodal asset row: media payload as an opaque binary column plus typed
#: metadata. Decode/feature-extraction runs as Pandas UDFs over mapInPandas.
MEDIA_ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)
