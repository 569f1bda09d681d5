"""Reference parity — the streaming aggregate's batch shadow (S10)
and serving queries (A1-A12) over the `events` stream table, plus the
deterministic python-source generators (G1)."""

from __future__ import annotations

from kafkasparkstream_spark import schemas
from kafkasparkstream_spark.operators import aggregates, serving
from kafkasparkstream_spark.sources.json_parse import extract_props
from kafkasparkstream_spark.tables import load_table
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from kafkasparkstream_spark.queries._shared import (  # noqa: E402
    register,
)
from kafkasparkstream_spark.queries.streaming import (  # noqa: E402
    _drain_sink,
    _stream_workdir,
)

@register(
    "windowed_agg_1min",
    oracle="""
    SELECT time_bucket(INTERVAL '1 minute', ts)                      AS window_start,
           time_bucket(INTERVAL '1 minute', ts) + INTERVAL '1 minute' AS window_end,
           event_type,
           ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) * 100.0
                 / COUNT(*), 0) / 10000.0 AS avg_value,
           MIN(value)           AS min_value,
           MAX(value)           AS max_value,
           COUNT(*)             AS reading_count
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def windowed_agg_1min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 (processor.py:82-95): 1-min tumbling window × event_type, multi-agg."""
    events = load_table(spark, "events", sf_dir)
    return aggregates.windowed_agg(events, ts_col="ts", dims=("event_type",))


@register(
    "incremental_rollup_merge",
    oracle="""
    SELECT time_bucket(INTERVAL '1 minute', ts)                       AS window_start,
           time_bucket(INTERVAL '1 minute', ts) + INTERVAL '1 minute' AS window_end,
           event_type,
           ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) * 100.0
                 / COUNT(*), 0) / 10000.0 AS avg_value,
           MIN(value)                      AS min_value,
           MAX(value)                      AS max_value,
           COUNT(*)                        AS reading_count
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: the event stream split into two ingest
    batches at a time cutoff, each reduced to decomposable per-window
    partials (sum/count/min/max), partials merged — and the result must
    equal the full single-pass aggregate (the oracle). At 100 TB only the
    new batch's events are ever touched; history lives as partial rows."""
    events = load_table(spark, "events", sf_dir)
    cutoff = F.lit("2024-01-03").cast("timestamp")
    p1 = aggregates.window_partials(events.filter(F.col("ts") < cutoff))
    p2 = aggregates.window_partials(events.filter(F.col("ts") >= cutoff))
    return aggregates.merge_window_partials(p1, p2)


@register(
    "distinct_dims",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    ORDER BY user_id, event_type
    """,
)
def distinct_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A11 (app.py:122-126): DISTINCT dimension tuples, multi-key sort."""
    events = load_table(spark, "events", sf_dir)
    return serving.distinct_dims(events, "user_id", "event_type")


@register(
    "latest_100",
    oracle="""
    SELECT * FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
)
def latest_100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 (app.py:170): top-100 by event time (TakeOrderedAndProject plan)."""
    events = load_table(spark, "events", sf_dir)
    return serving.latest_readings(events, ts_col="ts", limit=100)


@register(
    "latest_100_filtered",
    oracle="""
    SELECT * FROM events
    WHERE event_type = 'click' AND user_id = 7
    ORDER BY ts DESC, event_id DESC
    LIMIT 100
    """,
)
def latest_100_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A9 (app.py:154-170): dynamic equality filters + top-k by time."""
    events = load_table(spark, "events", sf_dir)
    return serving.latest_readings(
        events, ts_col="ts", limit=100, event_type="click", user_id=7
    )


@register("total_count", oracle="SELECT COUNT(*) AS total_count FROM events")
def total_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (app.py:247-248): ungrouped COUNT(*)."""
    return aggregates.total_count(load_table(spark, "events", sf_dir))


@register(
    "count_by_event_type",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt
    FROM events
    GROUP BY event_type
    ORDER BY cnt DESC, event_type
    """,
)
def count_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+A12 (app.py:251-257): group-count sorted by count desc."""
    return aggregates.group_count(load_table(spark, "events", sf_dir), "event_type")


@register(
    "count_by_user",
    oracle="""
    SELECT user_id, COUNT(*) AS cnt
    FROM events
    GROUP BY user_id
    ORDER BY cnt DESC, user_id
    """,
)
def count_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (app.py:260-266): group-count over the second dimension."""
    return aggregates.group_count(load_table(spark, "events", sf_dir), "user_id")


@register(
    "time_min_max",
    oracle="SELECT MIN(ts) AS min_ts, MAX(ts) AS max_ts FROM events",
)
def time_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (app.py:269-275): ungrouped MIN/MAX over event time."""
    return aggregates.time_range(load_table(spark, "events", sf_dir), "ts")


@register(
    "extreme_events_by_type",
    oracle="""
    WITH o AS (
        SELECT *, CAST(round(value * 100, 0) AS BIGINT) * 10000000000000 + event_id AS ord
        FROM events
    )
    SELECT event_type,
           COUNT(*)                  AS cnt,
           MAX(value)                AS max_value,
           arg_max(event_id, ord)    AS peak_event_id,
           arg_max(user_id, ord)     AS peak_user_id,
           MIN(value)                AS min_value,
           arg_min(event_id, ord)    AS trough_event_id
    FROM o GROUP BY event_type ORDER BY event_type
    """,
)
def extreme_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which exact row carries the extreme? `max_by`/`min_by` pull the
    peak/trough event row per type in ONE hash aggregate — no row_number
    window, no second scan, no join back. The double `value` sits on an
    exact 0.01 grid, so the composite BIGINT ordinal (value-cents scaled
    past the id range, id as tie-break) makes the argmax deterministic and
    engine-portable: ties resolve to the highest event_id on peaks, lowest
    on troughs, identically in Spark and the oracle.

    The composite form assumes |value·100| ≤ 922,336 (≈ |value| ≤ $9,223)
    and 0 ≤ event_id < 10^13 — outside those bounds int64 would WRAP, and
    Spark wraps silently while DuckDB errors, so the argmax could diverge
    unnoticed. The bounds are therefore GUARDED in-plan: out-of-range rows
    `raise_error` (both engines now fail loudly instead of diverging). The
    alternative — MAX over a (cents, id) struct — is portable without
    bounds but falls off hash aggregation into SortAggregate (struct isn't
    a mutable aggregate buffer type), turning an O(n) hash pass into a
    per-partition sort of the fact table; the guarded ordinal keeps the
    hash plan.

    100 TB: partial map-side combine keeps executor traffic at |types|
    rows; the window-function formulation would shuffle the whole fact
    table instead."""
    events = load_table(spark, "events", sf_dir)
    cents = F.rint(F.col("value") * 100).cast("long")
    in_bounds = (
        (F.abs(cents) <= F.lit(922_336))
        & (F.col("event_id") >= 0)
        & (F.col("event_id") < F.lit(10_000_000_000_000))
    )
    # Inverted WHEN so NULL inputs pass through instead of crashing: a NULL
    # value/event_id makes in_bounds NULL, so `when(~in_bounds)` does not
    # match and the otherwise-branch yields a NULL ordinal — which max_by/
    # min_by skip, exactly as DuckDB's arg_max skips NULLs. Only a row that
    # is DEFINITIVELY out of bounds raises.
    ord_ = F.when(
        ~in_bounds,
        F.raise_error(
            F.lit(
                "extreme_events_by_type: composite ordinal out of bounds "
                "(requires |value| <= 9223.36 and 0 <= event_id < 1e13)"
            )
        ).cast("long"),
    ).otherwise(cents * F.lit(10_000_000_000_000) + F.col("event_id"))
    o = events.withColumn("_ord", ord_)
    return (
        o.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("value").alias("max_value"),
            F.max_by("event_id", F.col("_ord")).alias("peak_event_id"),
            F.max_by("user_id", F.col("_ord")).alias("peak_user_id"),
            F.min("value").alias("min_value"),
            F.min_by("event_id", F.col("_ord")).alias("trough_event_id"),
        )
        .orderBy("event_type")
    )


@register(
    "recent_aggregates_24h",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS _anchor FROM events)
    SELECT time_bucket(INTERVAL '1 minute', ts)                       AS window_start,
           time_bucket(INTERVAL '1 minute', ts) + INTERVAL '1 minute' AS window_end,
           event_type,
           ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) * 100.0
                 / COUNT(*), 0) / 10000.0 AS avg_value,
           MIN(value)           AS min_value,
           MAX(value)           AS max_value,
           COUNT(*)             AS reading_count
    FROM events, anchor
    WHERE ts >= _anchor - INTERVAL 24 HOURS
    GROUP BY 1, 2, 3
    ORDER BY window_start DESC, event_type
    """,
)
def recent_aggregates_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A1+A10 (app.py:189-227): time-range filter anchored at max event
    time + windowed rollup, newest window first."""
    events = load_table(spark, "events", sf_dir)
    return serving.recent_aggregates(events, ts_col="ts", hours=24, dims=("event_type",))


@register(
    "props_json_sum",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS cnt
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def props_json_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 (processor.py:74): schema-directed JSON parse of the embedded
    ``props`` payload, then a grouped rollup of the extracted field."""
    events = load_table(spark, "events", sf_dir)
    parsed = extract_props(events, schemas.EVENT_PROPS_SCHEMA)
    return (
        parsed.groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("cnt"))
        .orderBy("event_type")
    )


@register(
    "python_datasource_gen",
    oracle="""
    WITH idx AS (SELECT unnest(range(0, 2000)) AS i),
    g AS (
        SELECT i,
               (CASE CAST(('0x' || substr(md5('typ_' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 5
                  WHEN 0 THEN 'temperature' WHEN 1 THEN 'humidity'
                  WHEN 2 THEN 'pressure' WHEN 3 THEN 'motion' ELSE 'light' END) AS device_type,
               ROUND((CAST(('0x' || substr(md5('val_' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 10000) / 100.0, 2) AS value
        FROM idx
    )
    SELECT device_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) * 100.0
                 / COUNT(*), 0) / 10000.0 AS avg_value
    FROM g GROUP BY device_type ORDER BY device_type
    """,
)
def python_datasource_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's data generator as a native Spark 4 Python DataSource
    (sources/python_source.py): executors synthesize their partition slices
    in parallel, and because generation is md5-keyed on the row index the
    DuckDB oracle reproduces the exact dataset — a *generated source* that
    still hash-verifies. Rolls up the 2000-row table per device type."""
    from kafkasparkstream_spark.sources.python_source import SensorGenDataSource

    try:
        spark.dataSource.register(SensorGenDataSource)
    except Exception:
        pass  # already registered in this session
    df = (
        spark.read.format("sensor_gen")
        .option("rows", 2000)
        .option("partitions", 8)
        .load()
    )
    return (
        df.groupBy("device_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(aggregates.value_units("value")).alias("_sc"),
        )
        .select(
            "device_type",
            "n",
            aggregates.grid_avg(F.col("_sc"), F.col("n")).alias("avg_value"),
        )
        .orderBy("device_type")
    )


@register(
    "python_stream_source_gen",
    oracle="""
    WITH idx AS (SELECT unnest(range(0, 600)) AS i),
    g AS (
        SELECT i,
               (CASE CAST(('0x' || substr(md5('typ_' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 5
                  WHEN 0 THEN 'temperature' WHEN 1 THEN 'humidity'
                  WHEN 2 THEN 'pressure' WHEN 3 THEN 'motion' ELSE 'light' END) AS device_type,
               ROUND((CAST(('0x' || substr(md5('val_' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT) % 10000) / 100.0, 2) AS value
        FROM idx
    )
    SELECT device_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) * 100.0
                 / COUNT(*), 0) / 10000.0 AS avg_value
    FROM g GROUP BY device_type ORDER BY device_type
    """,
)
def python_stream_source_gen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generator's STREAMING face executed for real: the Python
    DataSource's SimpleDataSourceStreamReader feeds 600 rows through
    micro-batches of 200 (offset = row index, so recovery replays exact
    ranges), a parquet sink drains the bounded stream, and the rollup of
    the sink must hash-match the same md5-keyed oracle the batch face uses
    — one determinism contract across both read paths. Covers G1's
    rate-limited produce loop (generator.py:86-97) as a first-class
    streaming source rather than an external process."""
    import tempfile

    from kafkasparkstream_spark.sources.python_source import SensorGenDataSource

    try:
        spark.dataSource.register(SensorGenDataSource)
    except Exception:
        pass
    workdir = _stream_workdir("kss_pysrc_")
    sink, ckpt = f"{workdir}/sink", f"{workdir}/ckpt"
    stream = (
        spark.readStream.format("sensor_gen")
        .option("rows", 600)
        .option("rowsPerBatch", 200)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    if not _drain_sink(spark, q, sink, n_rows=600, timeout_s=120):
        raise RuntimeError(
            "python_stream_source_gen: stream did not drain 600 rows within "
            "120 s — timeout, not a determinism failure"
        )
    return (
        spark.read.parquet(sink)
        .groupBy("device_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(aggregates.value_units("value")).alias("_sc"),
        )
        .select(
            "device_type",
            "n",
            aggregates.grid_avg(F.col("_sc"), F.col("n")).alias("avg_value"),
        )
        .orderBy("device_type")
    )
