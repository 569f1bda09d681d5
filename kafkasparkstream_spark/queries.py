"""The engine's named-query registry — the correctness surface.

Each entry pairs a Spark DataFrame program with the ANSI-SQL oracle DuckDB
runs on the same parquet tables. Names, column aliases, and value grids
(float rounding) match exactly on both sides so the driver's
order-insensitive value-hash compares clean.

Organized by SURVEY.md §2 operator id (reference parity) and by
training-data-pipeline extension group (dedup / similarity / text).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkasparkstream_spark import schemas
from kafkasparkstream_spark.operators import aggregates, serving
from kafkasparkstream_spark.sources.json_parse import extract_props
from kafkasparkstream_spark.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Reference parity — streaming aggregate's batch shadow (S10) and serving
# queries (A1-A12) over the `events` stream table.
# ---------------------------------------------------------------------------


@register(
    "windowed_agg_1min",
    oracle="""
    SELECT time_bucket(INTERVAL '1 minute', ts)                      AS window_start,
           time_bucket(INTERVAL '1 minute', ts) + INTERVAL '1 minute' AS window_end,
           event_type,
           ROUND(AVG(value), 4) AS avg_value,
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
    "recent_aggregates_24h",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS _anchor FROM events)
    SELECT time_bucket(INTERVAL '1 minute', ts)                       AS window_start,
           time_bucket(INTERVAL '1 minute', ts) + INTERVAL '1 minute' AS window_end,
           event_type,
           ROUND(AVG(value), 4) AS avg_value,
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


# ---------------------------------------------------------------------------
# Relational analytics — join/agg/top-k shapes over the star schema
# (engine capability beyond the join-free reference; SURVEY.md §2.3 note).
# ---------------------------------------------------------------------------

from kafkasparkstream_spark.operators import analytics  # noqa: E402


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4)                                           AS sum_qty,
           ROUND(SUM(l_extendedprice), 4)                                      AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)                   AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)     AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                           AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                      AS avg_price,
           ROUND(AVG(l_discount), 4)                                           AS avg_disc,
           COUNT(*)                                                            AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter (pushed down) → grouped multi-agg."""
    return analytics.pricing_summary(load_table(spark, "lineitem", sf_dir))


@register(
    "top_orders_by_revenue",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: dim filter → 3-way join → grouped revenue → top-k."""
    return analytics.top_orders_by_revenue(
        load_table(spark, "customer", sf_dir),
        load_table(spark, "orders", sf_dir),
        load_table(spark, "lineitem", sf_dir),
    )


@register(
    "region_revenue",
    oracle="""
    SELECT r_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY revenue DESC, n_name
    """,
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join with broadcast dims, per-nation revenue."""
    return analytics.region_revenue(
        load_table(spark, "region", sf_dir),
        load_table(spark, "nation", sf_dir),
        load_table(spark, "customer", sf_dir),
        load_table(spark, "orders", sf_dir),
        load_table(spark, "lineitem", sf_dir),
        load_table(spark, "supplier", sf_dir),
    )


@register(
    "brand_revenue_topk",
    oracle="""
    SELECT p_brand,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           ROUND(SUM(l_quantity), 4)                         AS total_qty,
           COUNT(*)                                          AS line_count
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY revenue DESC, p_brand
    LIMIT 10
    """,
)
def brand_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension join + grouped revenue + top-k brands."""
    return analytics.brand_revenue_topk(
        load_table(spark, "part", sf_dir), load_table(spark, "lineitem", sf_dir)
    )


@register(
    "order_priority_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1998-06-01'
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS as a left-semi join, counts per priority."""
    return analytics.order_priority_counts(
        load_table(spark, "orders", sf_dir), load_table(spark, "lineitem", sf_dir)
    )


@register(
    "customer_nation_rollup",
    oracle="""
    SELECT n_name,
           COUNT(*)                       AS order_count,
           ROUND(SUM(o_totalprice), 4)    AS total_spend,
           ROUND(AVG(o_totalprice), 4)    AS avg_spend
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY total_spend DESC, n_name
    """,
)
def customer_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + per-nation order stats."""
    return analytics.customer_nation_rollup(
        load_table(spark, "customer", sf_dir),
        load_table(spark, "nation", sf_dir),
        load_table(spark, "orders", sf_dir),
    )
