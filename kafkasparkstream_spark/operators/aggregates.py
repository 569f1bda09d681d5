"""Windowed & grouped aggregates — the reference's flagship computation.

The reference's heart is a 1-minute tumbling-window multi-aggregate grouped by
low-cardinality dimensions (spark-processor/processor.py:82-95, operator S10 in
SURVEY.md §2.4). ``windowed_agg`` is its exact batch shadow; the streaming
variant (same expression tree plus a watermark) lives in
``kafkasparkstream_spark.streaming.pipeline``.

Scale notes (100 TB): a groupBy on (window, dims) shuffles once on the full
group key; Spark plans partial (map-side) aggregation before the exchange, so
the shuffle carries one row per (partition × group), not per event — with
30-ish dim groups per window this is tiny regardless of input size. No salting
needed: the window key grows with time, so keys don't concentrate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Decimal places used when a query must emit float aggregates whose exact bit
#: pattern depends on summation order (avg/sum of doubles). Rounding both the
#: Spark result and the oracle to the same grid makes hashes comparable.
FLOAT_DP = 4


def windowed_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 minute",
    dims: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window multi-aggregate (S10 batch shadow, processor.py:82-95).

    Returns one row per (window, *dims) with avg/min/max of ``value_col`` and
    the row count, window struct flattened to ``window_start``/``window_end``
    (mirroring what the reference's JDBC write does, api-service/app.py:93-94).
    """
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration), *[F.col(d) for d in dims])
        .agg(
            F.round(F.avg(value_col), FLOAT_DP).alias("avg_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
            F.count(F.lit(1)).alias("reading_count"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *dims,
            "avg_value",
            "min_value",
            "max_value",
            "reading_count",
        )
    )


def sensor_windowed_agg(df: DataFrame) -> DataFrame:
    """The reference's exact aggregate set over a sensor-shaped frame
    (avg/min/max value, avg battery, count — processor.py:89-95)."""
    return (
        df.groupBy(
            F.window(F.col("timestamp"), "1 minute"),
            F.col("device_type"),
            F.col("location"),
        )
        .agg(
            F.avg("value").alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.avg("battery_level").alias("avg_battery"),
            F.count(F.lit(1)).alias("reading_count"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "device_type",
            "location",
            "avg_value",
            "min_value",
            "max_value",
            "avg_battery",
            "reading_count",
        )
    )


def group_count(df: DataFrame, dim: str) -> DataFrame:
    """Group-count + sort-by-count (A6/A7, api-service/app.py:251-266).

    Deterministic total order: count desc, then dim asc as tiebreaker.
    """
    return (
        df.groupBy(dim)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(dim))
    )


def total_count(df: DataFrame) -> DataFrame:
    """Ungrouped COUNT(*) (A5, api-service/app.py:247-248)."""
    return df.agg(F.count(F.lit(1)).alias("total_count"))


def time_range(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """MIN/MAX over the event-time column (A8, api-service/app.py:269-275)."""
    return df.agg(
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"),
    )
