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


# ---------------------------------------------------------------------------
# Relational analytics — join/agg/top-k shapes over the star schema
# (engine capability beyond the join-free reference; SURVEY.md §2.3 note).
# ---------------------------------------------------------------------------

from kafkasparkstream_spark.operators import analytics  # noqa: E402


@register(
    "pricing_summary",
    oracle="""
    WITH u AS (
        SELECT l_returnflag, l_linestatus,
               CAST(ROUND(l_quantity, 0) AS BIGINT)            AS q,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS pc,
               CAST(ROUND(l_discount * 100, 0) AS BIGINT)      AS dc,
               CAST(ROUND(l_tax * 100, 0) AS BIGINT)           AS tc
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(q) AS DOUBLE)                                 AS sum_qty,
           CAST(SUM(pc) AS DOUBLE) / 100.0                        AS sum_base_price,
           CAST(SUM(pc * (100 - dc)) AS DOUBLE) / 10000.0         AS sum_disc_price,
           CAST(SUM((pc * (100 - dc) * (100 + tc)) // 1000000) AS DOUBLE)
             + CAST(SUM((pc * (100 - dc) * (100 + tc)) % 1000000) AS DOUBLE)
               / 1000000.0                                        AS sum_charge,
           ROUND(CAST(SUM(q) AS DOUBLE) * 10000.0 / COUNT(*), 0) / 10000.0
                                                                  AS avg_qty,
           ROUND(CAST(SUM(pc) AS DOUBLE) * 100.0 / COUNT(*), 0) / 10000.0
                                                                  AS avg_price,
           ROUND(CAST(SUM(dc) AS DOUBLE) * 100.0 / COUNT(*), 0) / 10000.0
                                                                  AS avg_disc,
           COUNT(*)                                               AS count_order
    FROM u
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
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
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
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
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
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
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
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE)
               / 100.0 AS total_spend,
           ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) * 100.0
                 / COUNT(*), 0) / 10000.0 AS avg_spend
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


@register(
    "bi_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_0', 'NATION_1')
      AND n2.n_name IN ('NATION_0', 'NATION_1')
      AND n1.n_name <> n2.n_name
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def bi_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between a nation pair, both directions."""
    return analytics.bi_nation_volume(
        load_table(spark, "lineitem", sf_dir),
        load_table(spark, "supplier", sf_dir),
        load_table(spark, "orders", sf_dir),
        load_table(spark, "customer", sf_dir),
        load_table(spark, "nation", sf_dir),
    )


@register(
    "small_quantity_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
                 * 100.0 / 7.0, 0) / 10000.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery, decorrelated into a
    pre-aggregate + join on the Spark side."""
    return analytics.small_quantity_revenue(
        load_table(spark, "lineitem", sf_dir), load_table(spark, "part", sf_dir)
    )


@register(
    "stale_order_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1998-06-01'
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def stale_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join (dual of order_priority_counts)."""
    return analytics.stale_order_counts(
        load_table(spark, "orders", sf_dir), load_table(spark, "lineitem", sf_dir)
    )


@register(
    "revenue_change_forecast",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS DOUBLE)
               / 10000.0 AS revenue_increase
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
      AND l_discount BETWEEN 0.05 - 0.01001 AND 0.05 + 0.01001
      AND l_quantity < 24
    """,
)
def revenue_change_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: all predicates pushed to one scan, one ungrouped agg."""
    return analytics.revenue_change_forecast(load_table(spark, "lineitem", sf_dir))


@register(
    "nation_market_share",
    oracle="""
    WITH u AS (
        SELECT year(o_orderdate) AS o_year, n_name,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS vu
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN n_name = 'NATION_0' THEN vu ELSE 0 END)
                      AS DOUBLE)
                 / CAST(SUM(vu) AS DOUBLE) * 10000.0, 0) / 10000.0 AS mkt_share
    FROM u
    GROUP BY 1 ORDER BY 1
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: per-year conditional-aggregate revenue share."""
    return analytics.nation_market_share(
        load_table(spark, "lineitem", sf_dir),
        load_table(spark, "orders", sf_dir),
        load_table(spark, "supplier", sf_dir),
        load_table(spark, "nation", sf_dir),
    )


@register(
    "disjunctive_filter_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS line_count
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def disjunctive_filter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicates across both join sides."""
    return analytics.disjunctive_filter_revenue(
        load_table(spark, "lineitem", sf_dir), load_table(spark, "part", sf_dir)
    )


@register(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + double aggregation."""
    return analytics.customer_order_distribution(
        load_table(spark, "customer", sf_dir), load_table(spark, "orders", sf_dir)
    )


@register(
    "promo_revenue_share",
    oracle="""
    WITH u AS (
        SELECT p_type,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS vu
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1998-06-01'
          AND l_shipdate <  TIMESTAMP '1998-07-01'
    )
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vu ELSE 0 END)
                              AS DOUBLE)
                 / CAST(SUM(vu) AS DOUBLE) * 10000.0, 0) / 10000.0
               AS promo_revenue_pct
    FROM u
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (CASE inside SUM) ratio."""
    return analytics.promo_revenue_share(
        load_table(spark, "lineitem", sf_dir), load_table(spark, "part", sf_dir)
    )


@register(
    "top_supplier_revenue",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey, CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate <  TIMESTAMP '1998-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate → max-filter via 1-row broadcast join."""
    return analytics.top_supplier_revenue(
        load_table(spark, "supplier", sf_dir), load_table(spark, "lineitem", sf_dir)
    )


@register(
    "large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROUND(t.sum_qty, 4) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN (
        SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    ) t ON o_orderkey = t.l_orderkey
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered agg as a semi-join key list."""
    return analytics.large_volume_customers(
        load_table(spark, "customer", sf_dir),
        load_table(spark, "orders", sf_dir),
        load_table(spark, "lineitem", sf_dir),
    )


@register(
    "wealthy_inactive_customers",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
               AS totacctbal
    FROM customer c
    WHERE CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)
            * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
          > (SELECT SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT))
             FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def wealthy_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global-avg scalar subquery + anti join + rollup."""
    return analytics.wealthy_inactive_customers(
        load_table(spark, "customer", sf_dir), load_table(spark, "orders", sf_dir)
    )


# ---------------------------------------------------------------------------
# Text analysis — training-data-pipeline operators over `documents`
# (north-star extensions; pure column expressions, no Python UDFs).
# ---------------------------------------------------------------------------

from kafkasparkstream_spark.operators import text as text_ops  # noqa: E402


@register(
    "token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    df = text_ops.token_count(load_table(spark, "documents", sf_dir))
    return df.select(
        "doc_id",
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("bpe_tokens").cast("long").alias("bpe_tokens"),
        F.col("n_chars_measured").cast("long").alias("n_chars_measured"),
    )


@register(
    "quality_score",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(text), ' +') AS toks
        FROM documents
    ), m AS (
        SELECT doc_id,
               len(toks) AS n,
               len(list_distinct(toks)) AS n_uniq,
               len(list_filter(toks, tk -> list_contains(['the','a','of','and','is','to','in','that'], tk))) AS n_stop,
               CAST(list_sum(list_transform(toks, tk -> length(tk))) AS DOUBLE) AS len_sum
        FROM t
    )
    SELECT doc_id,
           CAST(n AS BIGINT)      AS n_tokens,
           CAST(n_uniq AS BIGINT) AS n_uniq_tokens,
           ROUND(len_sum / n, 4)  AS avg_token_len,
           ROUND(CAST(n_stop AS DOUBLE) / n, 4) AS stopword_ratio,
           ROUND(CAST(n_uniq AS DOUBLE) / n, 4) AS uniq_ratio,
           ROUND(least(n / 64.0, 1.0)
                 * (0.5 + 0.5 * least(n_stop / greatest(n * 0.05, 1.0), 1.0))
                 * (CAST(n_uniq AS DOUBLE) / n), 4) AS quality
    FROM m
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / stopword / diversity quality heuristics per document."""
    df = text_ops.quality_score(load_table(spark, "documents", sf_dir))
    return df.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_uniq_tokens").cast("long").alias("n_uniq_tokens"),
        "avg_token_len",
        "stopword_ratio",
        "uniq_ratio",
        "quality",
    )


@register(
    "lang_id",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, lang,
            CAST(len(list_filter(toks, tk -> list_contains(['der','die','das','und','ist','nicht','ein','mit'], tk))) AS INT) AS score_de,
            CAST(len(list_filter(toks, tk -> list_contains(['the','a','of','and','is','to','in','that'], tk))) AS INT)        AS score_en,
            CAST(len(list_filter(toks, tk -> list_contains(['el','la','de','que','y','en','un','es'], tk))) AS INT)           AS score_es,
            CAST(len(list_filter(toks, tk -> list_contains(['le','la','de','et','est','un','une','dans'], tk))) AS INT)       AS score_fr,
            CAST(len(list_filter(toks, tk -> list_contains(['de','le','shi','bu','wo','you','zai','ta'], tk))) AS INT)        AS score_zh
        FROM t
    )
    SELECT doc_id, lang, score_de, score_en, score_es, score_fr, score_zh,
           CASE
             WHEN score_de = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'de'
             WHEN score_en = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'en'
             WHEN score_es = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'es'
             WHEN score_fr = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'fr'
             WHEN score_zh = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'zh'
             ELSE 'unknown'
           END AS pred_lang
    FROM s
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language heuristic (argmax over per-lang scores)."""
    return text_ops.lang_id(load_table(spark, "documents", sf_dir))


@register(
    "doc_fingerprint",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
        FROM documents
    )
    SELECT doc_id,
           array_to_string(
             (list_sort(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                        i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))))[1:5],
             '|') AS fingerprint
    FROM t
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-5 md5 sketch over word 3-gram shingles (rolling-hash analog)."""
    return text_ops.doc_fingerprint(load_table(spark, "documents", sf_dir))


@register(
    "top_vocab",
    oracle="""
    WITH t AS (SELECT unnest(string_split_regex(trim(text), ' +')) AS tok FROM documents)
    SELECT tok, COUNT(*) AS cnt
    FROM t GROUP BY tok
    ORDER BY cnt DESC, tok
    LIMIT 50
    """,
)
def top_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-50 by frequency — explode + map-side-combined
    count + TakeOrdered; the canonical word-count at any scale."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(text_ops.tokens_col("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(50)
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
                  FROM documents),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT tok, COUNT(*) AS doc_freq FROM tf GROUP BY 1),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (SELECT doc_id, tok, tf, doc_freq,
                      ROUND(tf * ln(CAST(n_docs AS DOUBLE) / doc_freq), 4) AS tfidf
               FROM tf JOIN dfreq USING (tok) CROSS JOIN n),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                            ORDER BY tfidf DESC, tok) AS rn
               FROM scored)
    SELECT doc_id, tok AS top_term, tf, doc_freq, tfidf
    FROM ranked WHERE rn = 1 ORDER BY doc_id
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF (idf = ln(N/df)) top term per document — explode → tf agg →
    broadcast vocabulary df → rank per doc."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.tfidf_top_terms(docs)


# ---------------------------------------------------------------------------
# Deduplication — exact, n-gram Jaccard, MinHash+LSH, SimHash over `documents`.
# ---------------------------------------------------------------------------

from kafkasparkstream_spark.operators import dedup  # noqa: E402

_SHINGLES_CTE = """
    t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents),
    s AS (SELECT doc_id,
                 unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
          FROM t),
    sz AS (SELECT doc_id, count(*) AS n_sh FROM s GROUP BY doc_id)
"""


@register(
    "bm25_search",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), ' +') AS t FROM documents
    ),
    lengths AS (SELECT doc_id, len(t) AS dl FROM toks),
    exploded AS (
        SELECT doc_id, unnest(t) AS term FROM toks
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM exploded
        WHERE term IN ('hash', 'join', 'filter')
        GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lengths),
    scored AS (
        SELECT tf.doc_id,
               SUM(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS s
        FROM tf JOIN dfreq USING (term) JOIN lengths USING (doc_id), stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(s, 4) AS bm25
    FROM scored ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (query: hash, join, filter) — top-20 docs by
    closed-form score; complements the embedding-space ANN operators."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.bm25_scores(docs, ("hash", "join", "filter"))


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content digest → (keeper id, copy count)."""
    return dedup.exact_dedup(load_table(spark, "documents", sf_dir))


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(common * 1.0 / (x.n_sh + y.n_sh - common), 4) AS jaccard
    FROM pairs
    JOIN sz x ON doc_a = x.doc_id
    JOIN sz y ON doc_b = y.doc_id
    WHERE common * 1.0 / (x.n_sh + y.n_sh - common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs at threshold 0.5."""
    return dedup.ngram_jaccard_pairs(load_table(spark, "documents", sf_dir), threshold=0.5)


def _minhash_sig_sql(num_hashes: int = 16) -> str:
    # Mirrors dedup.minhash_signatures exactly: base = first 8 hex chars of
    # md5(shingle) as int; mh_h = (A[h]*base + B[h]) mod P.
    from kafkasparkstream_spark.operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    base = "CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT)"
    mins = ",\n               ".join(
        f"min(({MINHASH_A[h]} * {base} + {MINHASH_B[h]}) % {MINHASH_P}) AS mh{h}"
        for h in range(num_hashes)
    )
    return f"sig AS (SELECT doc_id,\n               {mins}\n        FROM s GROUP BY doc_id)"


def _band_sql(bands: int = 4, rows: int = 4) -> str:
    parts = []
    for b in range(bands):
        cols = " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows))
        parts.append(f"SELECT doc_id, {b} AS band, {cols} AS bucket FROM sig")
    return "bk AS (" + "\n        UNION ALL ".join(parts) + ")"


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_minhash_sig_sql(16)},
    {_band_sql(4, 4)},
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    common AS (
        SELECT doc_a, doc_b, count(*) AS common
        FROM cand
        JOIN s sa ON sa.doc_id = doc_a
        JOIN s sb ON sb.doc_id = doc_b AND sb.sh = sa.sh
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(common * 1.0 / (x.n_sh + y.n_sh - common), 4) AS jaccard
    FROM common
    JOIN sz x ON doc_a = x.doc_id
    JOIN sz y ON doc_b = y.doc_id
    WHERE common * 1.0 / (x.n_sh + y.n_sh - common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4 bands × 4 rows) candidates, exact-Jaccard verified."""
    return dedup.minhash_lsh_pairs(load_table(spark, "documents", sf_dir), threshold=0.5)


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_minhash_sig_sql(16)},
    {_band_sql(4, 4)},
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    common AS (
        SELECT doc_a, doc_b, count(*) AS common
        FROM cand
        JOIN s sa ON sa.doc_id = doc_a
        JOIN s sb ON sb.doc_id = doc_b AND sb.sh = sa.sh
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM common
        JOIN sz x ON doc_a = x.doc_id
        JOIN sz y ON doc_b = y.doc_id
        WHERE common * 1.0 / (x.n_sh + y.n_sh - common) >= 0.5
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    walk(u, lbl) AS (
        SELECT DISTINCT u, u FROM edges
        UNION
        SELECT e.u, w.lbl FROM edges e JOIN walk w ON e.v = w.u
    )
    SELECT u AS doc_id, MIN(lbl) AS cluster_id
    FROM walk GROUP BY u ORDER BY doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup groups: MinHash+LSH pairs clustered into connected
    components by distributed min-label propagation; the oracle computes
    the same components with a recursive CTE (reachable-set minimum)."""
    pairs = dedup.minhash_lsh_pairs(load_table(spark, "documents", sf_dir), threshold=0.5)
    return dedup.connected_components(pairs)


def _minhash_side_sql(
    sfx: str, where: str, num_hashes: int = 16, bands: int = 4, src: str = "documents"
) -> str:
    """Shingle→signature→bucket CTE chain over ``src`` (suffix distinguishes
    multiple chains in one query, e.g. incoming vs corpus)."""
    from kafkasparkstream_spark.operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    rows = num_hashes // bands
    base = "CAST(('0x' || substr(md5(sh), 1, 8)) AS BIGINT)"
    mins = ",\n             ".join(
        f"min(({MINHASH_A[h]} * {base} + {MINHASH_B[h]}) % {MINHASH_P}) AS mh{h}"
        for h in range(num_hashes)
    )
    band_parts = []
    for b in range(bands):
        cols = " || '|' || ".join(f"mh{b * rows + r}" for r in range(rows))
        band_parts.append(f"SELECT doc_id, {b} AS band, {cols} AS bucket FROM sig{sfx}")
    bands_sql = "\n        UNION ALL ".join(band_parts)
    return f"""
    t{sfx} AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
               FROM {src} WHERE {where}),
    s{sfx} AS (SELECT doc_id,
               unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
          FROM t{sfx}),
    sz{sfx} AS (SELECT doc_id, count(*) AS n_sh FROM s{sfx} GROUP BY doc_id),
    sig{sfx} AS (SELECT doc_id, {mins} FROM s{sfx} GROUP BY doc_id),
    bk{sfx} AS ({bands_sql})
"""


# Same construction as _BUCKET_SQL (defined in the sampling section below).
_INC_SPLIT = (
    "CAST(('0x' || substr(md5('inc' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10"
)


@register(
    "dedup_incremental",
    oracle=f"""
    WITH {_minhash_side_sql('_i', _INC_SPLIT)},
    {_minhash_side_sql('_c', 'NOT (' + _INC_SPLIT + ')')},
    cand AS (
        SELECT DISTINCT i.doc_id AS incoming_id, c.doc_id AS corpus_id
        FROM bk_i i JOIN bk_c c ON i.band = c.band AND i.bucket = c.bucket
    ),
    common AS (
        SELECT incoming_id, corpus_id, count(*) AS common
        FROM cand
        JOIN s_i sa ON sa.doc_id = incoming_id
        JOIN s_c sb ON sb.doc_id = corpus_id AND sb.sh = sa.sh
        GROUP BY 1, 2
    )
    SELECT incoming_id, corpus_id,
           ROUND(common * 1.0 / (x.n_sh + y.n_sh - common), 4) AS jaccard
    FROM common
    JOIN sz_i x ON incoming_id = x.doc_id
    JOIN sz_c y ON corpus_id = y.doc_id
    WHERE common * 1.0 / (x.n_sh + y.n_sh - common) >= 0.5
    ORDER BY incoming_id, corpus_id
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production dedup shape: a ~10% 'incoming' batch (hash-split) checked
    against the remaining 'corpus' — cross-set banded-minhash candidates,
    exact-Jaccard verified; no corpus-vs-corpus work."""
    from kafkasparkstream_spark.operators.sampling import _hash_bucket

    docs = load_table(spark, "documents", sf_dir)
    bucket = _hash_bucket(F.col("doc_id"), "inc")
    incoming = docs.filter(bucket < 10)
    corpus = docs.filter(~(bucket < 10))
    return dedup.incremental_minhash_pairs(incoming, corpus, threshold=0.5)


@register(
    "text_normalize_stats",
    oracle="""
    WITH n AS (
        SELECT doc_id,
               CAST(length(text) AS INT) AS raw_chars,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                                   ' +', ' ', 'g')) AS norm_text
        FROM documents
    )
    SELECT doc_id, raw_chars, CAST(length(norm_text) AS INT) AS norm_chars, norm_text
    FROM n ORDER BY doc_id
    """,
)
def text_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase / strip punctuation /
    collapse whitespace) with before/after size accounting."""
    docs = load_table(spark, "documents", sf_dir)
    out = text_ops.normalize_text(docs)
    return out.select(
        "doc_id",
        F.col("raw_chars").cast("int").alias("raw_chars"),
        F.col("norm_chars").cast("int").alias("norm_chars"),
        "norm_text",
    ).orderBy("doc_id")


@register(
    "training_pipeline_e2e",
    oracle=f"""
    WITH q AS (
        SELECT doc_id,
               ROUND(least(len(toks) / 64.0, 1.0)
                     * (0.5 + 0.5 * least(len(list_filter(toks, tk -> list_contains(['the','a','of','and','is','to','in','that'], tk))) / greatest(len(toks) * 0.05, 1.0), 1.0))
                     * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)), 4) AS quality
        FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents)
    ),
    kept AS (
        SELECT d.doc_id, d.text, q.quality
        FROM documents d JOIN q USING (doc_id)
        WHERE q.quality >= 0.25
    ),
    norm AS (
        SELECT doc_id, text, quality,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                                   ' +', ' ', 'g')) AS norm_text
        FROM kept
    ),
    keepers AS (SELECT MIN(doc_id) AS doc_id FROM norm GROUP BY md5(norm_text)),
    kd AS (SELECT n.doc_id, n.text, n.quality FROM norm n JOIN keepers USING (doc_id)),
    {_minhash_side_sql('_p', 'TRUE', src='kd')},
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bk_p a JOIN bk_p b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    common AS (
        SELECT doc_a, doc_b, count(*) AS common
        FROM cand
        JOIN s_p sa ON sa.doc_id = doc_a
        JOIN s_p sb ON sb.doc_id = doc_b AND sb.sh = sa.sh
        GROUP BY 1, 2
    ),
    nd_drop AS (
        SELECT DISTINCT doc_b AS doc_id
        FROM common
        JOIN sz_p x ON doc_a = x.doc_id
        JOIN sz_p y ON doc_b = y.doc_id
        WHERE common * 1.0 / (x.n_sh + y.n_sh - common) >= 0.5
    ),
    final AS (
        SELECT doc_id, quality FROM kd
        WHERE doc_id NOT IN (SELECT doc_id FROM nd_drop)
    ),
    labeled AS (
        SELECT quality,
               CASE WHEN CAST(('0x' || substr(md5('split0' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
                    WHEN CAST(('0x' || substr(md5('split0' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM final
    )
    SELECT split, COUNT(*) AS n_docs, ROUND(AVG(quality), 4) AS avg_quality
    FROM labeled GROUP BY split ORDER BY split
    """,
)
def training_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data pipeline as ONE lazy Catalyst plan:
    quality-filter → normalize → exact dedup (keep smallest id per
    normalized-content hash) → MinHash near-dup drop → deterministic
    train/val/test split → per-split stats. Every stage is an operator from
    this package composed declaratively — Catalyst fuses and optimizes the
    whole thing end to end."""
    from kafkasparkstream_spark.operators import sampling as sampling_ops

    docs = load_table(spark, "documents", sf_dir)
    q = text_ops.quality_score(docs).select("doc_id", "quality")
    kept = docs.join(q, "doc_id").filter(F.col("quality") >= 0.25)
    norm = kept.withColumn("norm_text", text_ops.normalize_text_col("text"))
    keepers = norm.groupBy(F.md5(F.col("norm_text").cast("binary")).alias("_h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kd = norm.join(keepers.select("doc_id"), "doc_id").select("doc_id", "text", "quality")
    pairs = dedup.minhash_lsh_pairs(kd.select("doc_id", "text"), threshold=0.5)
    nd_drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    final = kd.join(nd_drop, "doc_id", "left_anti")
    labeled = sampling_ops.dataset_split(final, "doc_id")
    return (
        labeled.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
        .orderBy("split")
    )


def _simhash_sig_cte(bits: int) -> str:
    # Mirrors dedup.simhash: coin j = bit 3-(j%4) of hex char j//4 of
    # md5(token), generated from the same _NIBBLE_BIT_SETS constants.
    from kafkasparkstream_spark.operators.dedup import _NIBBLE_BIT_SETS

    bit_cases = []
    for j in range(bits):
        charset = ",".join(f"'{c}'" for c in _NIBBLE_BIT_SETS[j % 4])
        bit_cases.append(
            f"CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN substr(h, {j // 4 + 1}, 1) "
            f"IN ({charset}) THEN 1 ELSE -1 END)) >= 0 THEN '1' ELSE '0' END"
        )
    sig = " || ".join(bit_cases)
    return f"""
    t AS (SELECT doc_id, list_transform(string_split_regex(trim(text), ' +'), tk -> md5(tk)) AS hs
          FROM documents),
    sig AS (SELECT doc_id, {sig} AS simhash FROM t)
"""


@register(
    "dedup_simhash",
    oracle=f"""
    WITH {_simhash_sig_cte(16)}
    SELECT doc_id, simhash FROM sig
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash signature per document (sign-of-sum over token-hash bits)."""
    return dedup.simhash(load_table(spark, "documents", sf_dir))


def _hamming_sql(bits: int) -> str:
    return " + ".join(
        f"(CASE WHEN substr(sig_a, {j + 1}, 1) <> substr(sig_b, {j + 1}, 1) THEN 1 ELSE 0 END)"
        for j in range(bits)
    )


@register(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH {_simhash_sig_cte(64)},
    bk AS (
        SELECT doc_id, simhash, b.band, substr(simhash, b.band * 16 + 1, 16) AS chunk
        FROM sig, (SELECT unnest(range(4)) AS band) b
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sig_a, b.simhash AS sig_b
        FROM bk a JOIN bk b ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT doc_a, doc_b, CAST({_hamming_sql(64)} AS INT) AS hamming FROM cand
    )
    SELECT doc_a, doc_b, hamming
    FROM scored WHERE hamming <= 3
    ORDER BY doc_a, doc_b
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs: 4×16-bit banded candidates, exact
    Hamming ≤ 3 verification (full recall by pigeonhole)."""
    return dedup.simhash_pairs(load_table(spark, "documents", sf_dir))


# ---------------------------------------------------------------------------
# Similarity search over `embeddings` (ANN baseline + LSH scale path).
# ---------------------------------------------------------------------------

from kafkasparkstream_spark.operators import similarity  # noqa: E402


@register(
    "ann_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id, list_cosine_similarity(q.emb, c.emb) AS cos
        FROM q JOIN c ON neighbor_id <> query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(cos, 4) AS cosine, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 10
    ORDER BY query_id, rnk
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 for 10 query vectors."""
    df = similarity.brute_force_topk(load_table(spark, "embeddings", sf_dir))
    return df.withColumn("rnk", F.col("rnk").cast("int"))


@register(
    "ann_lsh_topk",
    oracle="""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               (CASE WHEN embedding[1] > 0 THEN '1' ELSE '0' END ||
                CASE WHEN embedding[2] > 0 THEN '1' ELSE '0' END ||
                CASE WHEN embedding[3] > 0 THEN '1' ELSE '0' END ||
                CASE WHEN embedding[4] > 0 THEN '1' ELSE '0' END) AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, emb AS q_emb, bucket FROM e WHERE vec_id < 10),
    scored AS (
        SELECT query_id, e.vec_id AS neighbor_id, list_cosine_similarity(q_emb, e.emb) AS cos
        FROM q JOIN e ON q.bucket = e.bucket AND e.vec_id <> query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(cos, 4) AS cosine, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 10
    ORDER BY query_id, rnk
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed approximate cosine top-10 (probes own bucket only)."""
    df = similarity.lsh_bucketed_topk(load_table(spark, "embeddings", sf_dir))
    return df.withColumn("rnk", F.col("rnk").cast("int"))


@register(
    "ann_ivf_topk",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 16),
    assign AS (
        SELECT vec_id, emb, cid FROM (
            SELECT e.vec_id, e.emb, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY list_cosine_similarity(e.emb, c.cemb) DESC, c.cid) AS rn
            FROM e CROSS JOIN c
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, q_emb, cid FROM (
            SELECT e.vec_id AS query_id, e.emb AS q_emb, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY list_cosine_similarity(e.emb, c.cemb) DESC, c.cid) AS rn
            FROM e CROSS JOIN c WHERE e.vec_id < 10
        ) WHERE rn <= 2
    ),
    scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               list_cosine_similarity(p.q_emb, a.emb) AS cos
        FROM probes p JOIN assign a USING (cid)
        WHERE a.vec_id <> p.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(cos, 4) AS cosine, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 10
    ORDER BY query_id, rnk
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate cosine top-10: 16 deterministic centroids, 2 probes."""
    df = similarity.ivf_topk(load_table(spark, "embeddings", sf_dir))
    return df.withColumn("rnk", F.col("rnk").cast("int"))


@register(
    "kmeans_embeddings",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings),
    c0 AS (SELECT vec_id AS cid, emb FROM e WHERE vec_id < 8),
    d1 AS (SELECT e.vec_id, c0.cid, list_distance(e.emb, c0.emb) AS d FROM e CROSS JOIN c0),
    a1 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d1)
           WHERE rn = 1),
    x1 AS (SELECT a1.cid, unnest(e.emb) AS val, unnest(range(len(e.emb))) AS pos
           FROM e JOIN a1 USING (vec_id)),
    m1 AS (SELECT cid, pos, AVG(val) AS val FROM x1 GROUP BY 1, 2),
    c1 AS (SELECT cid, list(val ORDER BY pos) AS emb FROM m1 GROUP BY cid),
    d2 AS (SELECT e.vec_id, c1.cid, list_distance(e.emb, c1.emb) AS d FROM e CROSS JOIN c1),
    a2 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d2)
           WHERE rn = 1)
    SELECT cid AS cluster_id, COUNT(*) AS n_members,
           ROUND(AVG(CAST(label AS DOUBLE)), 4) AS avg_label
    FROM a2 JOIN e USING (vec_id)
    GROUP BY 1 ORDER BY 1
    """,
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 2-iteration Lloyd's k-means (k=8, init = first k ids)
    over the embedding column; the oracle unrolls the same two assign/update
    rounds as CTEs. The distributed twin of IVF centroid training."""
    return similarity.kmeans_cluster_stats(load_table(spark, "embeddings", sf_dir))


@register(
    "embedding_neardup",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.emb, b.emb), 4) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.emb, b.emb) >= 0.35
    ORDER BY id_a, id_b
    """,
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs embedding-cosine near-duplicates at threshold 0.35."""
    return similarity.cosine_neardup_pairs(load_table(spark, "embeddings", sf_dir))


@register(
    "semdedup_clusters",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings),
    c0 AS (SELECT vec_id AS cid, emb FROM e WHERE vec_id < 8),
    d1 AS (SELECT e.vec_id, c0.cid, list_distance(e.emb, c0.emb) AS d FROM e CROSS JOIN c0),
    a1 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d1)
           WHERE rn = 1),
    x1 AS (SELECT a1.cid, unnest(e.emb) AS val, unnest(range(len(e.emb))) AS pos
           FROM e JOIN a1 USING (vec_id)),
    m1 AS (SELECT cid, pos, AVG(val) AS val FROM x1 GROUP BY 1, 2),
    c1 AS (SELECT cid, list(val ORDER BY pos) AS emb FROM m1 GROUP BY cid),
    d2 AS (SELECT e.vec_id, c1.cid, list_distance(e.emb, c1.emb) AS d FROM e CROSS JOIN c1),
    a2 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM d2)
           WHERE rn = 1),
    av AS (SELECT a2.vec_id, a2.cid, e.emb FROM a2 JOIN e USING (vec_id)),
    dup AS (SELECT b.cid, b.vec_id
            FROM av a JOIN av b ON a.cid = b.cid AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.emb, b.emb) >= 0.4
            GROUP BY 1, 2),
    m AS (SELECT cid, COUNT(*) AS n_members FROM a2 GROUP BY 1),
    d AS (SELECT cid, COUNT(*) AS n_dups FROM dup GROUP BY 1)
    SELECT m.cid AS cluster_id,
           n_members,
           COALESCE(n_dups, 0) AS n_dups,
           n_members - COALESCE(n_dups, 0) AS n_kept,
           ROUND(CAST(COALESCE(n_dups, 0) AS DOUBLE) / n_members, 4) AS dup_rate
    FROM m LEFT JOIN d USING (cid)
    ORDER BY 1
    """,
)
def semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means-bucketed semantic dedup (cosine ≥ 0.4 to a lower-id
    row in the same cluster ⇒ duplicate). The oracle unrolls the same two
    deterministic Lloyd iterations as `kmeans_embeddings`, then applies the
    within-cluster pair rule declaratively."""
    return similarity.semdedup_stats(load_table(spark, "embeddings", sf_dir))


# ---------------------------------------------------------------------------
# Analytic window functions, set ops, multi-dim aggregates over `events`.
# ---------------------------------------------------------------------------

from kafkasparkstream_spark.operators import windows as win_ops  # noqa: E402


@register(
    "latest_per_user",
    oracle="""
    SELECT * EXCLUDE (rnk) FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnk
        FROM events
    ) WHERE rnk = 1
    ORDER BY user_id
    """,
)
def latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic row_number()=1: latest event per user."""
    return win_ops.latest_per_key(load_table(spark, "events", sf_dir))


@register(
    "top3_by_value_per_user",
    oracle="""
    SELECT * FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INT) AS rnk
        FROM events
    ) WHERE rnk <= 3
    ORDER BY user_id, rnk
    """,
)
def top3_by_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-filter top-3 rows per key by measure."""
    return win_ops.topk_per_key(load_table(spark, "events", sf_dir), k=3)


@register(
    "running_stats_per_user",
    oracle="""
    SELECT user_id, event_id, ts,
           ROUND(SUM(value) OVER w_cum, 4)   AS running_sum,
           COUNT(*) OVER w_cum               AS running_count,
           ROUND(LAG(value, 1) OVER w, 4)    AS prev_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
           w_cum AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def running_stats_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum/count + lag per user in event-time order."""
    return win_ops.running_stats_per_key(load_table(spark, "events", sf_dir))


@register(
    "rollup_event_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt,
           ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) * 100.0
                 / COUNT(*), 0) / 10000.0 AS avg_value
    FROM events
    GROUP BY ROLLUP (event_type)
    ORDER BY event_type NULLS FIRST
    """,
)
def rollup_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP: per-type rows + grand total."""
    return win_ops.rollup_counts(load_table(spark, "events", sf_dir))


@register(
    "cube_type_user_bucket",
    oracle="""
    SELECT event_type, user_id % 4 AS user_bucket, COUNT(*) AS cnt,
           ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) * 100.0
                 / COUNT(*), 0) / 10000.0 AS avg_value
    FROM events
    GROUP BY CUBE (event_type, user_id % 4)
    ORDER BY event_type NULLS FIRST, user_bucket NULLS FIRST
    """,
)
def cube_type_user_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE over (event_type, user bucket)."""
    df = load_table(spark, "events", sf_dir).withColumn(
        "user_bucket", F.col("user_id") % 4
    )
    return win_ops.cube_counts(df, ("event_type", "user_bucket"))


@register(
    "grouping_sets_counts",
    oracle="""
    SELECT event_type, user_id % 10 AS user_bucket, COUNT(*) AS cnt,
           GROUPING(event_type) AS g_type, GROUPING(user_id % 10) AS g_bucket
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
    ORDER BY g_type, g_bucket, event_type, user_bucket
    """,
)
def grouping_sets_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the spark.sql entry point — the
    engine's raw-SQL surface (Catalyst parses the same ANSI text the oracle
    runs; the Expand operator evaluates all sets in one pass, map-side
    partial-aggregated, exactly like rollup/cube)."""
    load_table(spark, "events", sf_dir).createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type, user_id % 10 AS user_bucket, COUNT(*) AS cnt,
               GROUPING(event_type) AS g_type, GROUPING(user_id % 10) AS g_bucket
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        ORDER BY g_type, g_bucket, event_type, user_bucket
        """
    )


@register(
    "users_purchase_and_error",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    ORDER BY user_id
    """,
)
def users_purchase_and_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: users with both purchase and error events."""
    return win_ops.event_type_user_overlap(
        load_table(spark, "events", sf_dir), "purchase", "error"
    )


@register(
    "users_signup_not_purchase",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    ORDER BY user_id
    """,
)
def users_signup_not_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set EXCEPT: signup users with zero purchase events."""
    return win_ops.event_type_user_except(
        load_table(spark, "events", sf_dir), "signup", "purchase"
    )


@register(
    "tagged_union_click_view",
    oracle="""
    SELECT event_id, user_id, 'a' AS branch FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, user_id, 'b' AS branch FROM events WHERE event_type = 'view'
    ORDER BY event_id, branch
    """,
)
def tagged_union_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with provenance tag."""
    return win_ops.tagged_union(load_table(spark, "events", sf_dir), "click", "view")


@register(
    "distinct_user_count",
    oracle="SELECT COUNT(DISTINCT user_id) AS distinct_users FROM events",
)
def distinct_user_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT)."""
    return win_ops.distinct_user_count(load_table(spark, "events", sf_dir))


@register(
    "sliding_window_avg",
    oracle="""
    WITH exploded AS (
        SELECT time_bucket(INTERVAL '1 minute', ts) - k.k * INTERVAL 1 MINUTE AS window_start,
               event_type, value
        FROM events, (SELECT unnest([0, 1]) AS k) k
    )
    SELECT window_start, window_start + INTERVAL 2 MINUTES AS window_end,
           event_type,
           ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) * 100.0
                 / COUNT(*), 0) / 10000.0 AS avg_value,
           COUNT(*) AS reading_count
    FROM exploded
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def sliding_window_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2-min duration, 1-min slide): every event lands in
    two windows; oracle derives the same windows by explicit explosion."""
    events = load_table(spark, "events", sf_dir)
    return win_ops.sliding_window_agg(events).orderBy("window_start", "event_type")


@register(
    "session_window_user",
    oracle="""
    WITH s AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    n AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid FROM s)
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTES AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM n GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def session_window_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (gap-merged [ts, ts+gap) ranges) checked
    against a first-principles islands construction: merge iff ranges
    overlap, i.e. new session when the gap is >= 30 min."""
    events = load_table(spark, "events", sf_dir)
    return win_ops.session_window_agg(events)


@register(
    "zscore_per_user",
    oracle="""
    WITH q AS (
        SELECT event_id, user_id, value, ROUND(value * 100, 0) AS vq
        FROM events
    ),
    w AS (
        SELECT event_id, user_id, value, vq,
               SUM(vq) OVER win AS s, COUNT(*) OVER win AS n,
               SUM(vq * vq) OVER win AS ss,
               MIN(vq) OVER win AS vmin, MAX(vq) OVER win AS vmax
        FROM q WINDOW win AS (PARTITION BY user_id)
    )
    SELECT event_id, user_id, value,
           CASE WHEN n > 1 AND vmin < vmax
                     AND (ss - s * s / n) / (n - 1) > 0
                THEN ROUND((vq - s / n)
                           / SQRT((ss - s * s / n) / (n - 1))
                           * 10000, 0) / 10000 + 0.0
           END AS zscore
    FROM w ORDER BY event_id
    """,
)
def zscore_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score in the window-function form (codegen, one shuffle —
    the right shape for many small keys; see zscore_per_type_grouped_map
    for the Python grouped-map twin on few large keys)."""
    events = load_table(spark, "events", sf_dir)
    return win_ops.zscore_per_key_window(events)


@register(
    "zscore_per_type_grouped_map",
    oracle="""
    WITH q AS (
        SELECT event_id, event_type, value, ROUND(value * 100, 0) AS vq
        FROM events
    ),
    w AS (
        SELECT event_id, event_type, value, vq,
               SUM(vq) OVER win AS s, COUNT(*) OVER win AS n,
               SUM(vq * vq) OVER win AS ss,
               MIN(vq) OVER win AS vmin, MAX(vq) OVER win AS vmax
        FROM q WINDOW win AS (PARTITION BY event_type)
    )
    SELECT event_id, event_type, value,
           CASE WHEN n > 1 AND vmin < vmax
                     AND (ss - s * s / n) / (n - 1) > 0
                THEN ROUND((vq - s / n)
                           / SQRT((ss - s * s / n) / (n - 1))
                           * 10000, 0) / 10000 + 0.0
           END AS zscore
    FROM w ORDER BY event_id
    """,
)
def zscore_per_type_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (vectorized numpy kernel per group, few
    large groups — the regime where grouped-map shines) cross-checked
    against pure window-function SQL."""
    events = load_table(spark, "events", sf_dir)
    return win_ops.zscore_per_key(events, key_col="event_type")


@register(
    "pivot_user_event_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def pivot_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into per-user count columns (explicit value list →
    single hash aggregate, no distinct-collection pre-job)."""
    events = load_table(spark, "events", sf_dir)
    return win_ops.pivot_counts(events)


@register(
    "unpivot_window_stats",
    oracle="""
    WITH w AS (
        SELECT time_bucket(INTERVAL '1 minute', ts) AS window_start,
               ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) * 100.0
                     / COUNT(*), 0) / 10000.0 AS avg_value,
               MIN(value)           AS min_value,
               MAX(value)           AS max_value
        FROM events GROUP BY 1
    )
    SELECT window_start, metric, metric_value
    FROM w UNPIVOT (metric_value FOR metric IN (avg_value, min_value, max_value))
    ORDER BY window_start, metric
    """,
)
def unpivot_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the per-window multi-aggregate reshaped to long
    (window, metric, value) rows — pivot's inverse, the layout metric
    stores and plotting layers want. Spark's `unpivot` is a zero-shuffle
    Expand projection over the already-aggregated rows."""
    events = load_table(spark, "events", sf_dir)
    wide = (
        events.groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(
            F.sum(aggregates.value_units("value")).alias("_sc"),
            F.count(F.lit(1)).alias("_n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            aggregates.grid_avg(F.col("_sc"), F.col("_n")).alias("avg_value"),
            "min_value",
            "max_value",
        )
    )
    return wide.unpivot(
        ["window_start"],
        ["avg_value", "min_value", "max_value"],
        "metric",
        "metric_value",
    ).orderBy("window_start", "metric")


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week FROM events GROUP BY 1
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.w) / 7 AS INT) AS weeks_since,
           COUNT(DISTINCT a.user_id) AS active_users
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    distinct-active counts per weeks-since-cohort — two shuffles (first-seen
    agg + distinct activity), then a broadcastable cohort join."""
    events = load_table(spark, "events", sf_dir)
    firsts = events.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).cast("date").alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .withColumn(
            "weeks_since",
            (F.datediff(F.col("w").cast("date"), F.col("cohort_week")) / 7).cast("int"),
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "weeks_since")
    )


@register(
    "profile_events",
    oracle="""
    SELECT 'event_type' AS "column", COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           COUNT(DISTINCT event_type) AS n_distinct FROM events
    UNION ALL
    SELECT 'props', COUNT(*),
           CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT props) FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*),
           CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT user_id) FROM events
    UNION ALL
    SELECT 'value', COUNT(*),
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT value) FROM events
    ORDER BY "column"
    """,
)
def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile (rows / nulls / exact distinct) — the
    first query anyone runs on an unfamiliar 100 TB table."""
    events = load_table(spark, "events", sf_dir)
    return aggregates.profile_table(events, ("event_type", "props", "user_id", "value"))


@register(
    "resample_hourly_ffill",
    oracle="""
    WITH pts AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket, AVG(value) AS v
        FROM events WHERE user_id < 20
        GROUP BY 1, 2
    ),
    span AS (SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM pts GROUP BY 1),
    grid AS (SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket FROM span),
    j AS (SELECT g.user_id, g.bucket, p.v FROM grid g LEFT JOIN pts p USING (user_id, bucket))
    SELECT user_id, bucket,
           ROUND(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
                                                  ROWS UNBOUNDED PRECEDING), 4) AS value_ffill,
           v IS NULL AS is_gap
    FROM j
    ORDER BY user_id, bucket
    """,
)
def resample_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap fill: hourly grid per user (users 0-19),
    forward-filled from the last observed hourly average."""
    events = load_table(spark, "events", sf_dir).filter(F.col("user_id") < 20)
    return aggregates.resample_ffill(events, unit="hour")


@register(
    "approx_distinct_user_count",
    oracle="""
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct_users,
           TRUE AS within_3rsd
    FROM events
    """,
)
def approx_distinct_user_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approx distinct, HASH-GATED (round-7 close of the
    no_oracle row): the sketch estimate is engine-specific, so the hashed
    output is the exact distinct count PLUS the bounded verdict that the
    HLL++ estimate lies within 3·rsd (6% at rsd=0.02) of it — the sketch
    still executes, and a broken sketch flips the boolean and fails the
    gate. The exact side is one countDistinct the oracle recomputes; at
    100 TB the sketch IS the product and the exact twin is the verifier
    you run on a sample."""
    events = load_table(spark, "events", sf_dir)
    approx = win_ops.approx_distinct_user_count(events)  # 1-row sketch
    exact = events.agg(F.countDistinct("user_id").alias("exact_distinct_users"))
    return approx.crossJoin(exact).select(  # sanctioned 1-row x 1-row combine
        "exact_distinct_users",
        (
            F.abs(F.col("approx_distinct_users") - F.col("exact_distinct_users"))
            <= F.lit(0.06) * F.col("exact_distinct_users")
        ).alias("within_3rsd"),
    )


@register(
    "approx_value_percentiles",
    oracle="""
    WITH v AS (SELECT event_type,
                      CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
               FROM events),
    h AS (SELECT event_type, cents, COUNT(*) AS c FROM v GROUP BY 1, 2),
    n AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1),
    cum AS (SELECT event_type, cents,
                   SUM(c) OVER (PARTITION BY event_type ORDER BY cents) AS cum
            FROM h)
    SELECT event_type,
           MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN cents END) AS p50_cents,
           MIN(CASE WHEN cum >= CEIL(0.95 * n) THEN cents END) AS p95_cents,
           TRUE AS p50_in_band, TRUE AS p95_in_band
    FROM cum JOIN n USING (event_type)
    GROUP BY event_type ORDER BY event_type
    """,
)
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK-sketch approximate percentiles per group, HASH-GATED (round-7
    close of the no_oracle row): sketch internals are engine-specific, so
    the hashed output is the exact p50/p95 order statistics (ceil(q·n)
    rank on the integer-cents grid, computed as a value-histogram
    cumulative — the 100 TB-exact-percentile shape: the heavy aggregate is
    per (type, cents), the window runs over the ≤100k-row histogram) PLUS
    bounded verdicts that the percentile_approx estimates land inside the
    ±5%-rank band [p45, p55] / [p90, p99] — far wider than the sketch's
    1e-4 rank error, so the booleans certify the sketch without exposing
    its engine-specific values to the hash."""
    from pyspark.sql.window import Window

    events = load_table(spark, "events", sf_dir)
    v = events.select("event_type", aggregates.value_units("value").alias("cents"))
    h = v.groupBy("event_type", "cents").agg(F.count(F.lit(1)).alias("c"))
    n = h.groupBy("event_type").agg(F.sum("c").alias("n"))
    w = Window.partitionBy("event_type").orderBy("cents")
    cum = h.withColumn("cum", F.sum("c").over(w)).join(F.broadcast(n), "event_type")

    def _ostat(q: float) -> Column:
        return F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("cents"))
        )

    exact = cum.groupBy("event_type").agg(
        _ostat(0.45).alias("p45_cents"),
        _ostat(0.5).alias("p50_cents"),
        _ostat(0.55).alias("p55_cents"),
        _ostat(0.90).alias("p90_cents"),
        _ostat(0.95).alias("p95_cents"),
        _ostat(0.99).alias("p99_cents"),
    )
    approx = events.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("value", 0.95, 10000).alias("p95_approx"),
    )
    return (
        exact.join(approx, "event_type")
        .select(
            "event_type",
            "p50_cents",
            "p95_cents",
            aggregates.value_units("p50_approx")
            .between(F.col("p45_cents"), F.col("p55_cents"))
            .alias("p50_in_band"),
            aggregates.value_units("p95_approx")
            .between(F.col("p90_cents"), F.col("p99_cents"))
            .alias("p95_in_band"),
        )
        .orderBy("event_type")
    )


@register(
    "json_roundtrip_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7+F1 (generator.py:22 / processor.py:74): to_json → from_json
    round-trip, then aggregate — the serialized wire format must be
    lossless, so the rollup equals the direct aggregate exactly."""
    from kafkasparkstream_spark.sources.json_parse import parse_json_events
    from pyspark.sql.types import StructType as _St

    events = load_table(spark, "events", sf_dir)
    wire_schema = _St(
        [f for f in schemas.EVENT_SCHEMA.fields if f.name in ("event_type", "value")]
    )
    wire = events.select(
        F.to_json(F.struct("event_type", "value")).alias("value")
    )
    parsed = parse_json_events(wire, wire_schema, ts_col=None)
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(aggregates.value_units("value")).cast("double") / 100.0).alias(
                "sum_value"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Temporal operators — as-of join and sessionization over `events`.
# The as-of oracle uses DuckDB's NATIVE ASOF JOIN: two independent
# implementations (union+carry-forward vs merge-join), one answer.
# ---------------------------------------------------------------------------

from kafkasparkstream_spark.operators import temporal  # noqa: E402


@register(
    "asof_purchase_click",
    oracle="""
    WITH r AS (
        SELECT user_id, ts, arg_max(value, event_id) AS value
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ),
    l AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT l.event_id, l.user_id, l.ts, l.value,
           r.ts AS prev_ts, r.value AS prev_value
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    ORDER BY l.event_id
    """,
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase gets the user's most recent click at or
    before it. Right side deduped per (user, ts) by max event_id so the
    'most recent row' is unambiguous in every engine."""
    events = load_table(spark, "events", sf_dir)
    left = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
    )
    out = temporal.asof_join(
        left, right, key_col="user_id", ts_col="ts", value_cols=("value",)
    )
    return out.select(
        "event_id", "user_id", "ts", "value",
        F.col("prev_ts"), F.col("prev_value"),
    ).orderBy("event_id")


@register(
    "rate_spike_windows",
    oracle="""
    WITH w AS (
        SELECT time_bucket(INTERVAL '1 minute', ts) AS window_start, COUNT(*) AS cnt
        FROM events GROUP BY 1
    )
    SELECT * FROM (
        SELECT window_start, cnt,
               ROUND(AVG(cnt) OVER (ORDER BY window_start
                                    ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 4)
                   AS trailing_avg,
               ROUND(cnt / AVG(cnt) OVER (ORDER BY window_start
                                          ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 4)
                   AS spike_ratio
        FROM w
    )
    WHERE trailing_avg IS NOT NULL
    ORDER BY window_start
    """,
)
def rate_spike_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throughput anomaly detection: per-minute event counts compared to the
    trailing 5-window average (rows-frame over the aggregated windows — the
    monitoring query an ops team runs on the reference's aggregate table).
    The first window of the stream has no history and is excluded."""
    from pyspark.sql.window import Window as W

    events = load_table(spark, "events", sf_dir)
    counts = (
        events.groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "cnt")
    )
    trail = W.orderBy("window_start").rowsBetween(-5, -1)
    return (
        counts.select(
            "window_start",
            "cnt",
            F.round(F.avg("cnt").over(trail), 4).alias("trailing_avg"),
            F.round(F.col("cnt") / F.avg("cnt").over(trail), 4).alias("spike_ratio"),
        )
        .filter(F.col("trailing_avg").isNotNull())
        .orderBy("window_start")
    )


@register(
    "scd2_event_type_history",
    oracle="""
    WITH changed AS (
        SELECT user_id, event_type, ts, event_id
        FROM (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events
        )
        WHERE prev IS NULL OR event_type <> prev
    )
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
    FROM changed
    ORDER BY user_id, valid_from
    """,
)
def scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 compaction: per-user event_type change intervals with
    valid_from/valid_to bounds and an is_current flag (the CDC→dimension
    transformation)."""
    events = load_table(spark, "events", sf_dir)
    return temporal.scd2_history(events)


@register(
    "time_weighted_avg_user",
    oracle="""
    WITH d AS (
        SELECT user_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS vq,
               lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   - epoch_us(ts) AS dur_us
        FROM events
    ),
    a AS (
        SELECT user_id, SUM(vq * dur_us) AS sp, SUM(dur_us) AS sd,
               COUNT(*) AS n_intervals
        FROM d WHERE dur_us IS NOT NULL
        GROUP BY user_id
        HAVING SUM(dur_us) > 0
    )
    SELECT user_id,
           ROUND(CAST(sp AS DOUBLE) / CAST(sd AS DOUBLE) / 100.0 * 10000, 0)
               / 10000 + 0.0 AS twa_value,
           n_intervals,
           ROUND(CAST(sd AS DOUBLE) / 100.0, 0) / 10000 AS span_seconds
    FROM a ORDER BY user_id
    """,
)
def time_weighted_avg_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-weighted average per user: each reading is
    weighted by how long it remained current (lead-interval weighting)."""
    events = load_table(spark, "events", sf_dir)
    return temporal.time_weighted_avg(events)


@register(
    "session_stats",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_id
        FROM s
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) + per-session rollup."""
    events = load_table(spark, "events", sf_dir)
    out = temporal.session_stats(events, gap_seconds=1800)
    return out.select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        "session_start",
        "session_end",
        "n_events",
        "sum_value",
    )


@register(
    "clicks_before_error_60s",
    oracle="""
    WITH r AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    l AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'error')
    SELECT l.event_id, l.user_id, l.ts, l.value,
           CAST(COUNT(r.ts) AS BIGINT) AS n_in_range
    FROM l LEFT JOIN r
      ON l.user_id = r.user_id
     AND r.ts > l.ts - INTERVAL 60 SECONDS AND r.ts <= l.ts
    GROUP BY l.event_id, l.user_id, l.ts, l.value
    ORDER BY l.event_id
    """,
)
def clicks_before_error_60s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks within the 60 s before each error, per user —
    bucketized equi-join shape (no nested-loop range join)."""
    events = load_table(spark, "events", sf_dir)
    left = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", "value"
    )
    right = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    return temporal.range_join_count(
        left, right, key_col="user_id", ts_col="ts", window_seconds=60
    )


@register(
    "salted_value_stats_by_type",
    oracle="""
    SELECT event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def salted_value_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase (salted) aggregate — must equal the plain
    one-phase GROUP BY exactly (count/sum/min/max are decomposable)."""
    events = load_table(spark, "events", sf_dir)
    return aggregates.salted_group_agg(events, key_col="event_type")


@register(
    "value_distribution_stats",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4)  AS p50,
           ROUND(quantile_cont(value, 0.95), 4) AS p95,
           ROUND(stddev_samp(value), 4)         AS stddev_value,
           ROUND(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_value_aux
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def value_distribution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + moments per group (Catalyst
    `percentile` ≡ DuckDB `quantile_cont`)."""
    events = load_table(spark, "events", sf_dir)
    return aggregates.distribution_stats(events)


@register(
    "value_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 10.0) AS INT) AS bucket,
           COUNT(*)             AS cnt,
           ROUND(MIN(value), 4) AS min_value,
           ROUND(MAX(value), 4) AS max_value,
           ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) * 100.0
                 / COUNT(*), 0) / 10000.0 AS avg_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (width_bucket shape): bucketize + count."""
    events = load_table(spark, "events", sf_dir)
    return aggregates.value_histogram(events)


@register(
    "ntile_decile_stats",
    oracle="""
    WITH t AS (
        SELECT value, NTILE(10) OVER (ORDER BY value, event_id) AS decile
        FROM events
    )
    SELECT decile, COUNT(*) AS cnt,
           ROUND(MIN(value), 4) AS min_value,
           ROUND(MAX(value), 4) AS max_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_value
    FROM t GROUP BY decile ORDER BY decile
    """,
)
def ntile_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(10) equal-frequency buckets rolled up to per-decile stats."""
    events = load_table(spark, "events", sf_dir)
    return win_ops.ntile_decile_stats(events)


@register(
    "moving_avg_1h",
    oracle="""
    SELECT user_id, event_id, ts,
           ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w * 100.0
                 / (COUNT(*) OVER w), 0) / 10000.0 AS trailing_avg,
           COUNT(*) OVER w             AS trailing_cnt
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def moving_avg_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour moving average per user: RANGE frame on int64
    microsecond epoch (exact frame boundary in both engines)."""
    events = load_table(spark, "events", sf_dir)
    return win_ops.moving_avg_time_range(events)


# ---------------------------------------------------------------------------
# Deterministic sampling / dataset splits — hash-keyed, engine-portable
# (the oracle runs the identical md5 arithmetic).
# ---------------------------------------------------------------------------

from kafkasparkstream_spark.operators import sampling  # noqa: E402

_BUCKET_SQL = "CAST(('0x' || substr(md5('{salt}' || CAST({id} AS VARCHAR)), 1, 8)) AS BIGINT) % 100"


@register(
    "dataset_split_stats",
    oracle=f"""
    WITH labeled AS (
        SELECT *, CASE WHEN {_BUCKET_SQL.format(salt='split0', id='event_id')} < 80 THEN 'train'
                       WHEN {_BUCKET_SQL.format(salt='split0', id='event_id')} < 90 THEN 'val'
                       ELSE 'test' END AS split
        FROM events
    )
    SELECT split, COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM labeled GROUP BY split ORDER BY split
    """,
)
def dataset_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split by id hash — stable under reprocessing,
    repartitioning, and appends; here rolled up to per-split stats."""
    events = load_table(spark, "events", sf_dir)
    labeled = sampling.dataset_split(events, "event_id")
    return (
        labeled.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.sum(aggregates.value_units("value")).cast("double") / 100.0).alias(
                "sum_value"
            ),
        )
        .orderBy("split")
    )


@register(
    "stratified_sample_counts",
    oracle=f"""
    SELECT event_type, COUNT(*) AS cnt
    FROM events
    WHERE {_BUCKET_SQL.format(salt='s0', id='event_id')} <
          CASE event_type WHEN 'purchase' THEN 100 WHEN 'click' THEN 10
                          WHEN 'view' THEN 10 ELSE 0 END
    GROUP BY event_type ORDER BY event_type
    """,
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling: keep all purchases, 10% of clicks/views,
    drop the rest — one pushable filter expression, zero shuffle."""
    events = load_table(spark, "events", sf_dir)
    sampled = sampling.stratified_hash_sample(
        events, "event_id", "event_type", {"purchase": 100, "click": 10, "view": 10}
    )
    return sampled.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).orderBy("event_type")


# ---------------------------------------------------------------------------
# Streaming end-to-end — the reference's continuous query (S1-S10, ST1-ST8)
# run for real: JSON wire format → file-source micro-batch → parse chain →
# watermark → tumbling window state → update-mode foreachBatch sink →
# idempotent read-back. The final state must hash-match the *batch* oracle,
# proving the incremental computation converges to the declarative answer.
# ---------------------------------------------------------------------------

from pyspark.sql.types import (  # noqa: E402
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Wire schema for events serialized as sensor-style JSON (`ts` as ISO string,
#: cast downstream — the reference's regime, processor.py:48-55,76).
EVENT_WIRE_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("ts", StringType(), True),
    ]
)


import atexit  # noqa: E402
import contextlib  # noqa: E402
import os  # noqa: E402
import shutil  # noqa: E402
import tempfile  # noqa: E402
import time  # noqa: E402

_STREAM_WORKDIRS: list[str] = []
_STALE_WORKDIR_S = 1800.0  # a live streaming registry query holds its dir for seconds


def _reap_stream_workdirs() -> None:
    for d in _STREAM_WORKDIRS:
        shutil.rmtree(d, ignore_errors=True)
    _STREAM_WORKDIRS.clear()


atexit.register(_reap_stream_workdirs)


def _stream_workdir(prefix: str) -> str:
    """mkdtemp for a streaming query's wire copy / checkpoint / sink, with
    two leak guards the bare ``tempfile.mkdtemp`` lacked. Every dir this
    process creates is rmtree'd at exit — the returned result DataFrame
    reads the sink lazily, so the dir must outlive the caller's collect,
    and process exit is the only point that is guaranteed. And stale
    same-prefix dirs from earlier *crashed* processes (atexit never ran)
    are reaped on sight once older than 30 minutes. Without both guards,
    every bench/sweep/test invocation of a streaming registry query leaked
    its ~250 MB workdir forever: 81 GB had accumulated by round 6, enough
    to fail concurrent Spark shuffles with ENOSPC."""
    root = tempfile.gettempdir()
    now = time.time()
    try:
        entries = os.listdir(root)
    except OSError:
        entries = []
    for entry in entries:
        if not entry.startswith(prefix):
            continue
        path = os.path.join(root, entry)
        try:
            if now - os.path.getmtime(path) > _STALE_WORKDIR_S:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            pass
    d = tempfile.mkdtemp(prefix=prefix)
    _STREAM_WORKDIRS.append(d)
    return d


@contextlib.contextmanager
def _clamped_shuffle_partitions(spark: SparkSession, cap: int = 8, rows: int | None = None):
    """Pin the state-store count for a bounded streaming replay (the count
    is frozen into the fresh checkpoint at first start); restore the
    session value after. Production sizes this to cluster capacity BEFORE
    the first start — it cannot change without a state rebuild.

    ``rows``: pass the replay's row count ONLY for Python-stateful
    replays (``applyInPandasWithState`` / ``transformWithStateInPandas``):
    there the per-partition Arrow+Python loop is the bottleneck, and a
    large replay (``rows`` ≥ 200k) keeps the session's full shuffle width
    (streaming_running_totals at sf1.0: 23 s → 12 s on local[32]).
    JVM-state replays (windowed aggs, dedup, stream-stream joins) must
    NOT pass it: their cost is per-provider state commits × batches, and
    widening the store makes them SLOWER — measured at sf1.0, cap 8 vs
    session-32: left-outer join 5.4 s vs 12.5 s, interval join 4.4 vs
    10.6, chained windows 3.4 vs 5.6, upsert 2.7 vs 4.3 (stream-stream
    joins keep FOUR stores per partition, so provider overhead scales
    worst there)."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    eff = int(old) if (rows is not None and rows >= 200_000) else min(int(old), cap)
    spark.conf.set("spark.sql.shuffle.partitions", str(eff))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _drain_sink(spark, q, sink: str, n_rows: int, timeout_s: float = 120.0) -> bool:
    """Poll a parquet sink until it holds ``n_rows`` rows, the query dies,
    or the deadline passes; then stop the query and re-check the SETTLED
    sink (the final rows can land in the last poll gap). Fast-fails when
    the query terminates early — awaitTermination surfaces its error.
    Returns whether the sink drained; shared by the stream-source query
    and its pytest twin so the drain logic cannot drift."""
    import time as _t

    deadline = _t.time() + timeout_s
    drained = False
    while _t.time() < deadline:
        if not q.isActive:
            break
        try:
            if spark.read.parquet(sink).count() >= n_rows:
                drained = True
                break
        except Exception:
            pass  # sink dir not created yet on the first probes
        _t.sleep(0.5)
    q.stop()
    q.awaitTermination()
    if not drained:
        try:
            drained = spark.read.parquet(sink).count() >= n_rows
        except Exception:
            drained = False
    return drained


def _wire_with_flush_sentinel(
    events: DataFrame, path: str, anchor: DataFrame | None = None
) -> None:
    """Serialize events to the JSON wire format plus one far-future sentinel
    row (user_id = event_id = -1, ts = max + 2 h): the sentinel advances the
    watermark past every real window/session so a bounded append-mode replay
    flushes all state, while its own window never closes — it self-excludes
    from output (filter user_id >= 0 where the sink could contain it).

    ``anchor`` supplies the max-ts base when the serialized side is one
    stream of a MULTI-stream query: Spark's global watermark is the MIN
    across streams, so each side's sentinel must sit past the max event
    time of ALL sides or a short side's sentinel can strand the long
    side's tail state (pass the parent table both times)."""
    flush = (anchor if anchor is not None else events).select(
        F.lit(-1).cast("long").alias("event_id"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("flush").alias("event_type"),
        F.lit(0.0).alias("value"),
        (F.max("ts") + F.expr("INTERVAL 2 HOURS")).alias("ts"),
    )
    cols = ("event_id", "user_id", "event_type", "value", "ts")
    _events_to_wire(events.select(*cols).unionByName(flush.select(*cols)), path)


def _wire_projection(events: DataFrame) -> DataFrame:
    """The JSON wire format the Kafka producer would send (ISO-8601 µs
    timestamps, one JSON object per line) — the single definition of the
    parse contract shared by every replay/throughput writer."""
    return events.select(
        F.to_json(
            F.struct(
                "event_id",
                "user_id",
                "event_type",
                "value",
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
            )
        ).alias("value")
    )


def _events_to_wire(events: DataFrame, path: str, n_files: int | None = None) -> None:
    """G1 analog: serialize events to the JSON wire format."""
    wire = _wire_projection(events)
    if n_files is not None:
        wire = wire.repartition(n_files)
    wire.write.mode("overwrite").text(path)


@register(
    "streaming_windowed_agg",
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
def streaming_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full continuous query, executed for real via Structured Streaming:
    events → JSON lines → file stream (Kafka-payload-shaped) → parse →
    watermark → 1-min tumbling agg → update-mode foreachBatch parquet sink →
    latest-state read. Single availableNow batch keeps watermark drops out so
    the final state equals the batch answer exactly."""
    import tempfile

    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.streaming.pipeline import PipelineConfig, start_pipeline
    from kafkasparkstream_spark.streaming.sinks import latest_state

    events = load_table(spark, "events", sf_dir)
    workdir = _stream_workdir("kss_stream_")
    src, sink, ckpt = f"{workdir}/src", f"{workdir}/sink", f"{workdir}/ckpt"
    _events_to_wire(events, src)

    cfg = PipelineConfig(
        dims=("event_type",),
        ts_col="ts",
        value_col="value",
        battery_col=None,
        schema=EVENT_WIRE_SCHEMA,
    )
    raw = file_json_stream(spark, src, max_files_per_trigger=None)
    with _clamped_shuffle_partitions(spark):
        agg_q, raw_q = start_pipeline(raw, sink, ckpt, cfg, available_now=True)
        agg_q.awaitTermination()
        raw_q.awaitTermination()

    final = latest_state(
        spark.read.parquet(f"{sink}/sensor_aggregates"),
        ("window_start", "window_end", "event_type"),
    )
    # avg_value is already on the portable 4dp grid (pipeline computes it
    # from the exact integer-cents sum inside the streaming agg) — no
    # read-side re-round, which would re-introduce the half-up boundary.
    return final.select(
        "window_start",
        "window_end",
        "event_type",
        "avg_value",
        "min_value",
        "max_value",
        "reading_count",
    )


@register(
    "streaming_upsert_agg",
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
def streaming_upsert_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3's production fix, executed for real: the same 1-minute continuous
    query as ``streaming_windowed_agg``, but update-mode refinements land
    through the manifest-swap UPSERT sink
    (`streaming/sinks.py:foreach_batch_upsert_sink`) — a key's refinement
    REPLACES its stored row, so the STORED table itself is duplicate-free
    and is returned directly, with NO ``latest_state`` read-side
    resolution. The reference appends update-mode batches blindly and
    serves duplicates (processor.py:105,133); this is the
    Delta/Iceberg-MERGE-shaped fix as a storage property, hash-checked
    against the batch oracle."""
    import tempfile

    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.streaming.pipeline import (
        PipelineConfig,
        parse_stage,
        windowed_aggregate_stage,
    )
    from kafkasparkstream_spark.streaming.sinks import (
        foreach_batch_upsert_sink,
        read_upsert_table,
    )

    events = load_table(spark, "events", sf_dir)
    workdir = _stream_workdir("kss_upsert_")
    src, tbl, ckpt = f"{workdir}/src", f"{workdir}/tbl", f"{workdir}/ckpt"
    _events_to_wire(events, src)

    cfg = PipelineConfig(
        dims=("event_type",),
        ts_col="ts",
        value_col="value",
        battery_col=None,
        schema=EVENT_WIRE_SCHEMA,
    )
    raw = file_json_stream(spark, src, max_files_per_trigger=None)
    keys = ("window_start", "window_end", "event_type")
    with _clamped_shuffle_partitions(spark):
        q = (
            windowed_aggregate_stage(parse_stage(raw, cfg), cfg)
            # swallow_errors=False: ST7 isolation is right for the
            # reference-parity sinks, but THIS is an oracle-verified
            # registry query — a swallowed batch failure would surface as
            # a silently stale table (or a baffling missing-manifest read
            # error), not as the real exception.
            .writeStream.foreachBatch(
                foreach_batch_upsert_sink(tbl, keys, swallow_errors=False)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return read_upsert_table(spark, tbl).select(
        "window_start",
        "window_end",
        "event_type",
        "avg_value",
        "min_value",
        "max_value",
        "reading_count",
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing — binary assets decoded/feature-extracted through
# Arrow-batched mapInPandas kernels. The payloads are synthesized
# deterministically from `documents` (ASCII bytes of sha2(text) hex) so the
# DuckDB oracle can mirror the byte-level math in string space; the decode
# kernels are the container-safe fakes in operators/multimodal.py.
# ---------------------------------------------------------------------------

from kafkasparkstream_spark.operators import multimodal  # noqa: E402


def _doc_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → asset table: payload = ASCII bytes of sha2(text) (64 B)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.sha2(F.col("text"), 256).cast("binary").alias("payload"),
    )


@register(
    "multimodal_image_features",
    oracle="""
    WITH a AS (SELECT doc_id AS asset_id, sha256(text) AS payload_hex FROM documents),
    d AS (SELECT asset_id,
                 sha256(payload_hex)             AS digest,
                 sha256('emb:' || payload_hex)   AS emb_digest
          FROM a)
    SELECT asset_id,
           CAST(64 + CAST(('0x' || substr(digest, 1, 2)) AS INT) % 192 AS INT) AS width,
           CAST(64 + CAST(('0x' || substr(digest, 3, 2)) AS INT) % 192 AS INT) AS height,
           CAST(64 AS BIGINT) AS n_bytes,
           digest AS sha256,
           ROUND(CAST(('0x' || substr(emb_digest, 1, 2)) AS INT) / 255.0 - 0.5, 6) AS e0,
           ROUND(CAST(('0x' || substr(emb_digest, 3, 2)) AS INT) / 255.0 - 0.5, 6) AS e1,
           ROUND(CAST(('0x' || substr(emb_digest, 5, 2)) AS INT) / 255.0 - 0.5, 6) AS e2,
           ROUND(CAST(('0x' || substr(emb_digest, 7, 2)) AS INT) / 255.0 - 0.5, 6) AS e3
    FROM d
    ORDER BY asset_id
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + feature extraction (Arrow mapInPandas kernel), with
    the embedding head flattened to scalar columns for the value-hash."""
    feats = multimodal.image_features(_doc_assets(spark, sf_dir), embedding_dim=4)
    return feats.select(
        "asset_id",
        "width",
        "height",
        "n_bytes",
        "sha256",
        *[F.element_at("embedding", k + 1).alias(f"e{k}") for k in range(4)],
    ).orderBy("asset_id")


@register(
    "multimodal_audio_energy",
    oracle="""
    WITH a AS (SELECT doc_id AS asset_id, sha256(text) AS hex FROM documents),
    s AS (SELECT asset_id, ord(substr(hex, CAST(i AS INT), 1)) - 128 AS b
          FROM a, range(1, 65) t(i))
    SELECT asset_id, COUNT(*) AS n_samples,
           CAST(SUM(b * b) AS BIGINT) AS energy,
           ROUND(sqrt(CAST(SUM(b * b) AS DOUBLE) / COUNT(*)), 6) AS rms
    FROM s GROUP BY asset_id ORDER BY asset_id
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode + energy/RMS summary (fake PCM = centered payload
    bytes): integer-exact energy, IEEE-exact sqrt — deterministic by
    construction across engines."""
    feats = multimodal.audio_features(_doc_assets(spark, sf_dir))
    return feats.select(
        "asset_id", "n_samples", "energy", F.round("rms", 6).alias("rms")
    ).orderBy("asset_id")


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH a AS (SELECT doc_id AS asset_id, sha256(text) AS payload_hex FROM documents),
    f AS (SELECT asset_id, unnest([0, 2]) AS frame_index, payload_hex FROM a)
    SELECT asset_id, CAST(frame_index AS INT) AS frame_index,
           substr(payload_hex, frame_index * 16 + 1, 16) AS frame_str
    FROM f
    ORDER BY asset_id, frame_index
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (1 row in → N frame rows out through mapInPandas);
    64-byte payloads → 4 16-byte frames, every 2nd kept → frames 0 and 2.
    Frames are ASCII by construction, so the oracle compares them as text."""
    frames = multimodal.sample_frames(_doc_assets(spark, sf_dir), every_n=2, max_frames=3)
    return frames.select(
        "asset_id",
        "frame_index",
        F.col("frame").cast("string").alias("frame_str"),
    ).orderBy("asset_id", "frame_index")


# ---------------------------------------------------------------------------
# Round-2 coverage: TPC-H Q10 analog, recency-weighted aggregation, kNN
# graph, and the benchmark-decontamination / quality-funnel / PII-scan trio
# of training-data curation reports.
# ---------------------------------------------------------------------------


@register(
    "returned_items_by_customer",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
        GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, n_name, revenue, c_acctbal
    FROM rev
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_items_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned revenue in a quarter
    (fact-side filters pushed to both scans, revenue aggregated per custkey
    BEFORE the dimension joins, top-k as TakeOrderedAndProject)."""
    return analytics.returned_items_topk(
        load_table(spark, "customer", sf_dir),
        load_table(spark, "orders", sf_dir),
        load_table(spark, "lineitem", sf_dir),
        load_table(spark, "nation", sf_dir),
    )


@register(
    "time_decay_value_by_type",
    oracle="""
    WITH m AS (SELECT MAX(epoch_us(ts)) AS mx FROM events)
    SELECT event_type,
           ROUND(SUM(value * (1.0 / (1.0 + (mx - epoch_us(ts)) / 3600000000.0)))
                 / SUM(1.0 / (1.0 + (mx - epoch_us(ts)) / 3600000000.0)), 4)
               AS decayed_avg,
           ROUND(SUM(1.0 / (1.0 + (mx - epoch_us(ts)) / 3600000000.0)), 4)
               AS total_weight,
           COUNT(*) AS n_events
    FROM events, m
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def time_decay_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted mean per event type, weight = 1/(1 + age_hours)
    anchored at max(ts). Rational decay over int64-µs ages keeps every step
    a correctly-rounded IEEE op, so both engines agree bit-for-bit before
    the output rounding."""
    return temporal.time_decay_weighted_avg(load_table(spark, "events", sf_dir))


@register(
    "knn_graph",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    scored AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
               list_cosine_similarity(a.emb, b.emb) AS cos
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT vec_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY ROUND(cos * 10000, 0) DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT vec_id, neighbor_id, ROUND(cos, 4) AS cosine, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 5
    ORDER BY vec_id, rnk
    """,
)
def knn_graph_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbor graph over all embeddings, block-tiled
    (each block pair one GEMM, partial top-k per tile, window reduce)."""
    return similarity.knn_graph(load_table(spark, "embeddings", sf_dir), k=5)


@register(
    "user_series_knn",
    oracle="""
    WITH cents AS (
        SELECT user_id, CAST(day(ts) AS INT) AS d,
               SUM(CAST(round(value * 100, 0) AS BIGINT)) AS s
        FROM events GROUP BY 1, 2
    ),
    days AS (SELECT unnest(range(1, 32)) AS d),
    grid AS (
        SELECT u.user_id, days.d, COALESCE(c.s, 0) AS s
        FROM (SELECT DISTINCT user_id FROM cents) u
        CROSS JOIN days
        LEFT JOIN cents c ON c.user_id = u.user_id AND c.d = days.d
    ),
    vec AS (SELECT user_id, list(CAST(s AS DOUBLE) ORDER BY d) AS v
            FROM grid GROUP BY user_id),
    scored AS (
        SELECT a.user_id, b.user_id AS neighbor_user_id,
               list_cosine_similarity(a.v, b.v) AS cos
        FROM vec a JOIN vec b ON a.user_id <> b.user_id
    ),
    ranked AS (
        SELECT user_id, neighbor_user_id, cos,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ROUND(cos * 10000, 0) DESC, neighbor_user_id) AS rnk
        FROM scored
    )
    SELECT user_id, neighbor_user_id, ROUND(cos, 4) AS cosine, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY user_id, rnk
    """,
)
def user_series_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (the distributed-top-k-similarity
    problem of e.g. EDBT'19's streaming-series search, batch form): each
    user's daily-spend series becomes a dense vector, then the exact
    block-tiled kNN machinery finds the 3 most-cosine-similar users — the
    behavioral-cohort / anomaly-peer query.

    Portability: per-day sums accumulate on the exact cents grid (int64),
    so both engines build bit-identical vectors before any float math; the
    day index is day-of-month (31 slots, so month-boundary spillover like
    the sf1.0 replica's Jan-31 jitter is kept, not silently dropped), no
    anchor job needed. Ranking rides the knn family's 4dp-grid + id
    tie-break total order. Scale shape: the series build is one fact-sized
    map-side-combined aggregate to |users|×31 cells, pinned with
    localCheckpoint so knn_graph's block-count probe reads the small
    materialized vector table instead of re-running the fact aggregate —
    at 100 TB the fact scan runs once and the kNN cost depends only on
    |users|."""
    events = load_table(spark, "events", sf_dir)
    cents = F.rint(F.col("value") * 100).cast("long")
    daily = (
        events.groupBy("user_id", F.dayofmonth("ts").alias("d"))
        .agg(F.sum(cents).alias("s"))
    )
    vec = (
        daily.groupBy("user_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("d", "s"))).alias("m"))
        .select(
            "user_id",
            F.transform(
                F.sequence(F.lit(1), F.lit(31)),
                lambda d: F.coalesce(F.element_at(F.col("m"), d), F.lit(0)).cast("double"),
            ).alias("series"),
        )
        .localCheckpoint()
    )
    return (
        similarity.knn_graph(vec, k=3, id_col="user_id", vec_col="series")
        .withColumnRenamed("vec_id", "user_id")
        .withColumnRenamed("neighbor_id", "neighbor_user_id")
    )


@register(
    "decontamination_8gram",
    oracle="""
    WITH t AS (SELECT doc_id, source, string_split_regex(trim(text), ' +') AS toks
               FROM documents),
    sh AS (SELECT doc_id, source,
                  unnest(list_distinct(list_transform(
                      range(1, greatest(len(toks) - 7, 0) + 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                           || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5]
                           || ' ' || toks[i+6] || ' ' || toks[i+7]))) AS sh
           FROM t),
    bench AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0'),
    train AS (SELECT doc_id, sh FROM sh WHERE source <> 'src0')
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           COUNT(b.sh) AS n_contaminated,
           ROUND(COUNT(b.sh) * 1.0 / COUNT(*), 4) AS contamination_ratio
    FROM train LEFT JOIN bench b ON train.sh = b.sh
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def decontamination_8gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: fraction of each training doc's distinct
    8-grams that appear in the benchmark set (source src0); the benchmark
    shingle set is tiny → broadcast, so the training side never shuffles."""
    return text_ops.decontamination_overlap(load_table(spark, "documents", sf_dir))


@register(
    "split_leakage_check",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
               FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(
                      range(1, greatest(len(toks) - 7, 0) + 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                           || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5]
                           || ' ' || toks[i+6] || ' ' || toks[i+7]))) AS sh
           FROM t),
    lab AS (SELECT doc_id,
                   CAST(('0x' || substr(md5('split0' || CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 100 < 90 AS is_train
            FROM documents),
    train AS (SELECT DISTINCT sh.sh FROM sh JOIN lab USING (doc_id) WHERE is_train),
    test AS (SELECT sh.doc_id, sh.sh FROM sh JOIN lab USING (doc_id) WHERE NOT is_train)
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           COUNT(train.sh) AS n_leaked,
           ROUND(COUNT(train.sh) * 1.0 / COUNT(*), 4) AS leak_ratio
    FROM test LEFT JOIN train ON test.sh = train.sh
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test 8-gram contamination audit over the md5-hash 90/10 split:
    per test doc, how much of it leaks from the train side. Train shingles
    are never globally distinct'd — they semi-join against the test shingle
    set first. ``broadcast_test=False`` because this is a PROPORTIONAL
    split — the test side is 10% of the corpus (10 TB at target scale) and
    must shuffle, not broadcast (text.py split_leakage_overlap docstring;
    the broadcast path stays covered by
    test_split_leakage_shuffle_mode_matches_broadcast_mode)."""
    return text_ops.split_leakage_overlap(
        load_table(spark, "documents", sf_dir), broadcast_test=False
    )


@register(
    "gopher_rule_matrix",
    oracle="""
    WITH f AS (
        SELECT source,
               len(string_split_regex(trim(text), ' +')) AS ntok,
               (length(trim(text)) - (len(string_split_regex(trim(text), ' +')) - 1)) * 1.0
                   / len(string_split_regex(trim(text), ' +')) AS mwl,
               len(list_filter(string_split_regex(trim(text), ' +'),
                               x -> x IN ('the', 'a'))) AS nstop,
               len(list_distinct(string_split_regex(trim(text), ' +'))) * 1.0
                   / len(string_split_regex(trim(text), ' +')) AS uniq
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN ntok BETWEEN 30 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS pass_wordcount,
           CAST(SUM(CASE WHEN mwl BETWEEN 4.0 AND 5.0 THEN 1 ELSE 0 END) AS BIGINT) AS pass_mean_word_len,
           CAST(SUM(CASE WHEN nstop >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_stopwords,
           CAST(SUM(CASE WHEN uniq >= 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS pass_uniq_ratio,
           CAST(SUM(CASE WHEN ntok BETWEEN 30 AND 90 AND mwl BETWEEN 4.0 AND 5.0
                         AND nstop >= 2 AND uniq >= 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS pass_all,
           ROUND(SUM(CASE WHEN ntok BETWEEN 30 AND 90 AND mwl BETWEEN 4.0 AND 5.0
                          AND nstop >= 2 AND uniq >= 0.4 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS pass_rate
    FROM f GROUP BY source ORDER BY source
    """,
)
def gopher_rule_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source independent Gopher-rule pass matrix — which quality rule
    cuts which source (vs the funnel's cumulative survivors)."""
    return text_ops.gopher_rule_matrix(load_table(spark, "documents", sf_dir))


@register(
    "quality_filter_funnel",
    oracle="""
    WITH f AS (
        SELECT n_chars, lang,
               len(string_split_regex(trim(text), ' +')) AS ntok,
               length(trim(text)) AS tlen
        FROM documents
    ),
    g AS (
        SELECT COUNT(*) AS c0,
               CAST(SUM(CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN n_chars >= 150
                             AND lang IN ('en','de','fr','es') THEN 1 ELSE 0 END)
                    AS BIGINT) AS c2,
               CAST(SUM(CASE WHEN n_chars >= 150
                             AND lang IN ('en','de','fr','es')
                             AND ntok >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
               CAST(SUM(CASE WHEN n_chars >= 150
                             AND lang IN ('en','de','fr','es')
                             AND ntok >= 30
                             AND (tlen - (ntok - 1)) * 1.0 / ntok
                                 BETWEEN 3.0 AND 12.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c4
        FROM f
    )
    SELECT * FROM (
        SELECT CAST(0 AS INT) AS stage, 'all' AS stage_name, c0 AS n_docs,
               ROUND(c0 * 1.0 / c0, 4) AS retention FROM g
        UNION ALL SELECT 1, 'min_chars', c1, ROUND(c1 * 1.0 / c0, 4) FROM g
        UNION ALL SELECT 2, 'lang_known', c2, ROUND(c2 * 1.0 / c0, 4) FROM g
        UNION ALL SELECT 3, 'min_tokens', c3, ROUND(c3 * 1.0 / c0, 4) FROM g
        UNION ALL SELECT 4, 'mean_word_len', c4, ROUND(c4 * 1.0 / c0, 4) FROM g
    ) ORDER BY stage
    """,
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative quality-filter survivor counts in ONE scan (conditional
    sums unpivoted via stack) — the standard corpus-curation funnel report."""
    return text_ops.quality_filter_funnel(load_table(spark, "documents", sf_dir))


@register(
    "pii_scan_stats",
    oracle=r"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN regexp_matches(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
                THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
           CAST(SUM(CASE WHEN regexp_matches(text,
                '[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}')
                THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
           CAST(SUM(CASE WHEN regexp_matches(text, '(^| )[a-z]{1,3}( |$)')
                THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_short_token,
           ROUND((SUM(CASE WHEN regexp_matches(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
                     THEN 1 ELSE 0 END)
                  + SUM(CASE WHEN regexp_matches(text,
                        '[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}')
                        THEN 1 ELSE 0 END)) * 1.0 / COUNT(*), 4)
               AS pii_doc_ratio
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def pii_scan_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language PII exposure report (email/phone regex in codegen, no
    Python in the scan) with a populated control column on synthetic data."""
    return text_ops.pii_scan_stats(load_table(spark, "documents", sf_dir))


# ---------------------------------------------------------------------------
# Round-2 coverage, second batch: intra-doc repetition signals, corpus
# token-length histogram, exact-k-per-group sampling, temperature mixing,
# and canonical-survivor selection over the near-dup clusters.
# ---------------------------------------------------------------------------


@register(
    "doc_repetition_stats",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
               FROM documents),
    r AS (SELECT doc_id, toks, len(toks) AS n,
                 len(list_distinct(toks)) AS nu,
                 list_max(list_transform(list_distinct(toks),
                          u -> len(list_filter(toks, x -> x = u)))) AS topc,
                 list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                                i -> toks[i] || ' ' || toks[i+1]) AS bi
          FROM t)
    SELECT doc_id,
           CAST(n AS INT) AS n_tokens,
           ROUND(1.0 - nu * 1.0 / n, 4) AS dup_token_ratio,
           ROUND(topc * 1.0 / n, 4) AS top_token_ratio,
           CASE WHEN len(bi) > 0
                THEN ROUND(1.0 - len(list_distinct(bi)) * 1.0 / len(bi), 4)
                ELSE 0.0 END AS dup_bigram_ratio
    FROM r ORDER BY doc_id
    """,
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition signals (dup-token, top-token,
    dup-bigram ratios) as pure per-row array expressions — zero shuffle."""
    out = text_ops.repetition_stats(load_table(spark, "documents", sf_dir))
    return out.withColumn("n_tokens", F.col("n_tokens").cast("int")).orderBy("doc_id")


@register(
    "token_length_histogram",
    oracle="""
    WITH e AS (SELECT unnest(string_split_regex(trim(text), ' +')) AS tok
               FROM documents)
    SELECT CAST(length(tok) AS INT) AS token_len,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT tok) AS n_distinct_tokens
    FROM e GROUP BY 1 ORDER BY 1
    """,
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-length distribution: explode → hash-agg on ~30 keys,
    map-side partials collapse the shuffle to O(splits × lengths)."""
    return text_ops.token_length_histogram(load_table(spark, "documents", sf_dir))


@register(
    "sample_k_per_lang",
    oracle=f"""
    WITH r AS (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY CAST(('0x' || substr(md5('k0' || CAST(doc_id AS VARCHAR)), 1, 8))
                                 AS BIGINT), doc_id) AS sample_rank
        FROM documents)
    SELECT doc_id, lang, CAST(sample_rank AS INT) AS sample_rank
    FROM r WHERE sample_rank <= 20 ORDER BY lang, sample_rank
    """,
)
def sample_k_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-20-per-language deterministic reservoir: rank by md5(id)
    within language — same survivors on any engine / partitioning / rerun."""
    docs = load_table(spark, "documents", sf_dir)
    out = sampling.sample_k_per_group(docs, "doc_id", "lang", k=20)
    return out.select("doc_id", "lang", "sample_rank").orderBy("lang", "sample_rank")


@register(
    "source_mixture_temperature",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    w AS (SELECT source, n_docs,
                 CAST(ROUND(sqrt(n_docs), 6) AS DECIMAL(18,6)) AS w FROM c)
    SELECT source, n_docs,
           ROUND(n_docs * 1.0 / SUM(n_docs) OVER (), 4) AS raw_share,
           ROUND(CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE), 4) AS temp_share
    FROM w ORDER BY source
    """,
)
def source_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (α=0.5) source-mixing report: weights ∝ sqrt(n), snapped
    to the 6-dp grid and summed as decimal so normalization is exact."""
    return sampling.temperature_mixture(load_table(spark, "documents", sf_dir))


@register(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_minhash_sig_sql(16)},
    {_band_sql(4, 4)},
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    common AS (
        SELECT doc_a, doc_b, count(*) AS common
        FROM cand
        JOIN s sa ON sa.doc_id = doc_a
        JOIN s sb ON sb.doc_id = doc_b AND sb.sh = sa.sh
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM common
        JOIN sz x ON doc_a = x.doc_id
        JOIN sz y ON doc_b = y.doc_id
        WHERE common * 1.0 / (x.n_sh + y.n_sh - common) >= 0.5
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ),
    walk(u, lbl) AS (
        SELECT DISTINCT u, u FROM edges
        UNION
        SELECT e.u, w.lbl FROM edges e JOIN walk w ON e.v = w.u
    ),
    clu AS (SELECT u AS doc_id, MIN(lbl) AS cluster_id FROM walk GROUP BY u),
    m AS (SELECT c.cluster_id, c.doc_id, d.n_chars,
                 row_number() OVER (PARTITION BY c.cluster_id
                                    ORDER BY d.n_chars DESC, c.doc_id) AS rn
          FROM clu c JOIN documents d USING (doc_id))
    SELECT cluster_id,
           MAX(CASE WHEN rn = 1 THEN doc_id END) AS canonical_doc_id,
           MAX(CASE WHEN rn = 1 THEN n_chars END) AS canonical_len,
           COUNT(*) AS cluster_size,
           COUNT(*) - 1 AS n_dropped
    FROM m GROUP BY cluster_id ORDER BY cluster_id
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup decision stage: per near-dup cluster (MinHash+LSH →
    connected components), keep the longest member (ties → smallest id)
    and report how many copies each canonical absorbs."""
    docs = load_table(spark, "documents", sf_dir)
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    clusters = dedup.connected_components(pairs)
    return dedup.keep_best_per_cluster(docs, clusters)


# ---------------------------------------------------------------------------
# Round-2 coverage, third batch: Q21-shape bottleneck suppliers, and the
# dataset-assembly pair (shard balance report, sequence packing).
# ---------------------------------------------------------------------------


@register(
    "waiting_suppliers",
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_suppkey,
               l_shipdate >= TIMESTAMP '1998-06-01' AS is_late
        FROM lineitem
    ),
    per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
        FROM li GROUP BY l_orderkey
    ),
    qualifying AS (
        SELECT p.l_orderkey
        FROM per_order p
        JOIN orders o ON o.o_orderkey = p.l_orderkey AND o.o_orderstatus = 'F'
        WHERE p.n_supp >= 2 AND p.n_late_supp = 1
    ),
    sole_late AS (
        SELECT DISTINCT li.l_orderkey, li.l_suppkey
        FROM li JOIN qualifying q ON li.l_orderkey = q.l_orderkey
        WHERE li.is_late
    )
    SELECT s_name, n_name, COUNT(*) AS numwait
    FROM sole_late
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY s_name, n_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the supplier who was the sole late shipper of a
    multi-supplier finished order, counted per supplier. One aggregation
    pass over lineitem replaces the textbook EXISTS / NOT-EXISTS double
    self-join (see operators/analytics.waiting_suppliers)."""
    return analytics.waiting_suppliers(
        load_table(spark, "supplier", sf_dir),
        load_table(spark, "lineitem", sf_dir),
        load_table(spark, "orders", sf_dir),
        load_table(spark, "nation", sf_dir),
    )


@register(
    "shard_balance_stats",
    oracle="""
    WITH s AS (
        SELECT *,
               CAST(CAST(('0x' || substr(md5('shard0' || CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 16 AS INT) AS shard
        FROM documents
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM s GROUP BY shard ORDER BY shard
    """,
)
def shard_balance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash shard assignment (16 shards) + the per-shard balance
    report an export stage runs before committing training shards."""
    return sampling.shard_stats(load_table(spark, "documents", sf_dir))


@register(
    "pack_sequences_512",
    oracle="""
    WITH t AS (
        SELECT lang, source, doc_id,
               len(string_split_regex(trim(text), ' +')) AS ntok
        FROM documents
    ),
    c AS (
        SELECT lang, source, ntok,
               SUM(ntok) OVER (PARTITION BY lang, source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT lang, source,
           CAST(floor((cum - ntok) / 512.0) AS INT) AS seq_no,
           COUNT(*) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS seq_tokens,
           CAST(SUM(ntok) AS BIGINT) * 10000 // 512 AS fill_bp
    FROM c
    GROUP BY lang, source, seq_no
    ORDER BY lang, source, seq_no
    """,
)
def pack_sequences_512(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-fill packing of documents into 512-token training
    sequences per (lang, source) stream — keyed window cumsum, parallel by
    corpus stream, no global sort."""
    return sampling.pack_sequences(load_table(spark, "documents", sf_dir), budget=512)


# ---------------------------------------------------------------------------
# Round-2 coverage, fourth batch: token entropy, n-gram novelty, event
# transition matrix, and the cross-source near-dup leakage matrix.
# ---------------------------------------------------------------------------


@register(
    "doc_token_entropy",
    oracle="""
    WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
               FROM documents),
    c AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
    e AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS nu,
                 log2(SUM(c)) - SUM(c * log2(c)) / SUM(c) AS ent
          FROM c GROUP BY 1)
    SELECT doc_id,
           CAST(n AS INT) AS n_tokens,
           CAST(nu AS INT) AS n_uniq_tokens,
           ROUND(ent, 4) AS entropy,
           CASE WHEN nu > 1 THEN ROUND(ent / log2(nu), 4) END AS entropy_ratio
    FROM e ORDER BY doc_id
    """,
)
def doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token-distribution Shannon entropy + normalized ratio (the
    low-entropy boilerplate filter) — log2(n) − Σ c·log2(c)/n over one
    explode + two keyed hash-aggs, linear in corpus size."""
    return text_ops.token_entropy(load_table(spark, "documents", sf_dir)).orderBy(
        "doc_id"
    )


@register(
    "ngram_novelty_rate",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
               FROM documents),
    s AS (SELECT doc_id,
                 unnest(list_distinct(list_transform(
                     range(1, greatest(len(toks) - 2, 0) + 1),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
          FROM t),
    f AS (SELECT sh, MIN(doc_id) AS first_doc FROM s GROUP BY sh)
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           ROUND(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS novelty_ratio
    FROM s JOIN f USING (sh)
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each doc's distinct 3-grams first seen in that doc
    (corpus-position novelty curve; first-occurrence attribution by
    min doc_id)."""
    return text_ops.ngram_novelty(load_table(spark, "documents", sf_dir))


@register(
    "event_transition_matrix",
    oracle="""
    WITH s AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    p AS (
        SELECT from_type, to_type, COUNT(*) AS n_transitions
        FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
           ROUND(n_transitions * 1.0
                 / SUM(n_transitions) OVER (PARTITION BY from_type), 4)
               AS transition_prob
    FROM p ORDER BY from_type, to_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical first-order Markov transition matrix of per-user event
    sequences (deterministic ts+id ordering; one keyed window shuffle)."""
    return temporal.event_transitions(load_table(spark, "events", sf_dir))


@register(
    "dedup_source_matrix",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_minhash_sig_sql(16)},
    {_band_sql(4, 4)},
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    common AS (
        SELECT doc_a, doc_b, count(*) AS common
        FROM cand
        JOIN s sa ON sa.doc_id = doc_a
        JOIN s sb ON sb.doc_id = doc_b AND sb.sh = sa.sh
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM common
        JOIN sz x ON doc_a = x.doc_id
        JOIN sz y ON doc_b = y.doc_id
        WHERE common * 1.0 / (x.n_sh + y.n_sh - common) >= 0.5
    )
    SELECT least(da.source, db.source) AS source_x,
           greatest(da.source, db.source) AS source_y,
           COUNT(*) AS n_pairs
    FROM pairs
    JOIN documents da ON doc_a = da.doc_id
    JOIN documents db ON doc_b = db.doc_id
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup leakage matrix by source pair (off-diagonal = cross-corpus
    duplication, the train/eval contamination signal) over the MinHash+LSH
    verified pair list."""
    docs = load_table(spark, "documents", sf_dir)
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    return dedup.pair_source_matrix(docs, pairs)


# ---------------------------------------------------------------------------
# Round-2 additions: chunking / collocations / vocabulary overlap / robust
# outliers / embedding-norm audit.
# ---------------------------------------------------------------------------

from kafkasparkstream_spark.operators import windows as windows_ops  # noqa: E402


@register(
    "doc_chunk_overlap",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    b AS (
        SELECT doc_id, n_tokens,
               CAST(48 * CAST(ceil(greatest(0, n_tokens - 64) / 48.0) AS BIGINT) AS INT)
                   AS last_start
        FROM d
    ),
    e AS (
        SELECT doc_id, n_tokens,
               unnest(generate_series(0, last_start, 48)) AS i
        FROM b
    )
    SELECT doc_id,
           CAST(i / 48 AS INT)  AS chunk_idx,
           CAST(i AS INT)       AS chunk_start,
           CAST(least(64, n_tokens - i) AS INT) AS chunk_len,
           n_tokens
    FROM e
    ORDER BY doc_id, chunk_idx
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunk plan (64-token windows, stride 48): closed-form
    sequence + explode, no shuffle — both engines derive identical chunk
    grids from the token count alone."""
    return text_ops.chunk_documents(
        load_table(spark, "documents", sf_dir), size=64, stride=48
    )


@register(
    "bigram_top_per_lang",
    oracle="""
    WITH t AS (
        SELECT lang, string_split_regex(trim(text), ' +') AS l FROM documents
    ),
    e AS (
        SELECT lang, l, unnest(generate_series(1, len(l) - 1)) AS i
        FROM t WHERE len(l) > 1
    ),
    b AS (SELECT lang, l[i] || ' ' || l[i + 1] AS bigram FROM e),
    c AS (SELECT lang, bigram, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
    r AS (
        SELECT lang, bigram, cnt,
               row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram)
                   AS rnk
        FROM c
    )
    SELECT lang, bigram, cnt, CAST(rnk AS INT) AS rnk
    FROM r WHERE rnk <= 10 ORDER BY lang, rnk
    """,
)
def bigram_top_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 bigram collocations per language: row-local zip_with bigrams,
    one (lang, bigram) hash-agg, rank over distinct-bigram cardinality."""
    return text_ops.top_bigrams_per_group(
        load_table(spark, "documents", sf_dir), group_col="lang", k=10
    )


@register(
    "vocab_overlap_sources",
    oracle="""
    WITH v AS (
        SELECT DISTINCT source AS grp, tok
        FROM (SELECT source, unnest(string_split_regex(trim(text), ' +')) AS tok
              FROM documents)
    ),
    sz AS (SELECT grp, COUNT(*) AS n_vocab FROM v GROUP BY 1),
    c AS (
        SELECT a.grp AS source_a, b.grp AS source_b, COUNT(*) AS common_tokens
        FROM v a JOIN v b ON a.tok = b.tok AND a.grp < b.grp
        GROUP BY 1, 2
    )
    SELECT source_a, source_b,
           x.n_vocab AS vocab_a, y.n_vocab AS vocab_b, common_tokens,
           ROUND(common_tokens * 1.0
                 / (x.n_vocab + y.n_vocab - common_tokens), 4) AS jaccard
    FROM c JOIN sz x ON source_a = x.grp JOIN sz y ON source_b = y.grp
    ORDER BY source_a, source_b
    """,
)
def vocab_overlap_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — distinct (source, tok)
    grain bounds the self-join fanout to |sources| per token."""
    return text_ops.vocab_jaccard_between_groups(
        load_table(spark, "documents", sf_dir), group_col="source"
    )


@register(
    "mad_outliers_per_type",
    oracle="""
    WITH med AS (
        SELECT event_type, ROUND(median(value), 6) AS med
        FROM events GROUP BY 1
    ),
    dev AS (
        SELECT e.event_type, abs(e.value - m.med) AS absdev, m.med
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, ROUND(median(absdev), 6) AS mad
        FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(d.med) AS med,
           MIN(m.mad) AS mad,
           CAST(SUM(CASE WHEN d.absdev > 3.0 * 1.4826 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           ROUND(SUM(CASE WHEN d.absdev > 3.0 * 1.4826 * m.mad THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 4) AS outlier_ratio
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1 ORDER BY 1
    """,
)
def mad_outliers_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier screen per event_type (6-dp snapped
    thresholds so both engines classify identically)."""
    return windows_ops.mad_outlier_stats(
        load_table(spark, "events", sf_dir), key_col="event_type"
    )


@register(
    "embedding_norm_stats",
    oracle="""
    WITH n AS (
        SELECT label,
               sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                            x -> x * x))) AS nrm
        FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(nrm), 4) AS avg_norm,
           ROUND(MIN(nrm), 4) AS min_norm,
           ROUND(MAX(nrm), 4) AS max_norm
    FROM n GROUP BY 1 ORDER BY 1
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm audit of the embedding column — fused JVM
    zip_with/aggregate norm, one hash-agg to |labels| rows."""
    return similarity.norm_stats_by_label(load_table(spark, "embeddings", sf_dir))


@register(
    "ann_quantized_topk",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    s AS (
        SELECT vec_id, emb,
               nullif(list_max(list_transform(emb, x -> abs(x))) / 127.0, 0.0)
                   AS scale
        FROM v
    ),
    q AS (
        SELECT vec_id, coalesce(scale, 0.0) AS scale,
               list_transform(emb,
                   x -> CAST(coalesce(floor(x / scale + 0.5), 0) AS BIGINT))
                   AS qv
        FROM s
    ),
    p AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               list_dot_product(a.qv, b.qv) * a.scale * b.scale AS qdot
        FROM q a JOIN q b ON a.vec_id < 10 AND b.vec_id <> a.vec_id
    ),
    r AS (
        SELECT query_id, neighbor_id, qdot,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY qdot DESC, neighbor_id) AS rnk
        FROM p
    )
    SELECT query_id, neighbor_id, ROUND(qdot, 4) AS qdot, CAST(rnk AS INT) AS rnk
    FROM r WHERE rnk <= 10 ORDER BY query_id, rnk
    """,
)
def ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized inner-product top-10: integer-exact scoring, salted
    two-phase ranking — the 4×-bandwidth ANN scale path, bit-identical
    across engines."""
    return similarity.quantized_topk(load_table(spark, "embeddings", sf_dir))


@register(
    "key_skew_report",
    oracle="""
    WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_cnt,
           ROUND(MAX(cnt) * 1.0 / SUM(cnt), 6) AS max_share,
           ROUND(SUM(CAST(cnt AS DOUBLE) * cnt) / (SUM(cnt) * 1.0 * SUM(cnt)), 6)
               AS hhi,
           ROUND(stddev_pop(cnt) / AVG(cnt), 4) AS cv,
           ROUND(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
           ROUND(quantile_cont(cnt, 0.99), 4) AS p99_cnt
    FROM c
    """,
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnosis over events.user_id — cardinality, top
    share, HHI, CV, p50/p99 — two hash-aggs, no sort."""
    return windows_ops.key_skew_report(load_table(spark, "events", sf_dir))


@register(
    "funnel_conversion",
    oracle="""
    WITH s1 AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0
        FROM events GROUP BY 1
    ),
    s2 AS (
        SELECT e.user_id, s1.t0,
               MIN(CASE WHEN e.event_type = 'click' AND e.ts > s1.t0
                        THEN e.ts END) AS t1
        FROM events e JOIN s1 USING (user_id) GROUP BY 1, 2
    ),
    s3 AS (
        SELECT e.user_id, s2.t0, s2.t1,
               MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t1
                        THEN e.ts END) AS t2
        FROM events e JOIN s2 USING (user_id) GROUP BY 1, 2, 3
    ),
    c AS (
        SELECT SUM(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS c0,
               SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS c1,
               SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS c2
        FROM s3
    ),
    u AS (
        SELECT 1 AS stage, 'signup' AS stage_name, c0 AS n_users, c0 AS base FROM c
        UNION ALL
        SELECT 2, 'click', c1, c0 FROM c
        UNION ALL
        SELECT 3, 'purchase', c2, c0 FROM c
    )
    SELECT CAST(stage AS INT) AS stage, stage_name,
           CAST(n_users AS BIGINT) AS n_users,
           ROUND(n_users * 1.0 / nullif(base, 0), 4) AS conversion
    FROM u ORDER BY stage
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup→click→purchase funnel — successive aggregate-windows
    over ONE user-keyed shuffle; conversion shares off the stage-1 base."""
    return temporal.ordered_funnel(load_table(spark, "events", sf_dir))


@register(
    "lang_confusion_matrix",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, lang,
            CAST(len(list_filter(toks, tk -> list_contains(['der','die','das','und','ist','nicht','ein','mit'], tk))) AS INT) AS score_de,
            CAST(len(list_filter(toks, tk -> list_contains(['the','a','of','and','is','to','in','that'], tk))) AS INT)        AS score_en,
            CAST(len(list_filter(toks, tk -> list_contains(['el','la','de','que','y','en','un','es'], tk))) AS INT)           AS score_es,
            CAST(len(list_filter(toks, tk -> list_contains(['le','la','de','et','est','un','une','dans'], tk))) AS INT)       AS score_fr,
            CAST(len(list_filter(toks, tk -> list_contains(['de','le','shi','bu','wo','you','zai','ta'], tk))) AS INT)        AS score_zh
        FROM t
    ), p AS (
        SELECT lang,
               CASE
                 WHEN score_de = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'de'
                 WHEN score_en = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'en'
                 WHEN score_es = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'es'
                 WHEN score_fr = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'fr'
                 WHEN score_zh = greatest(score_de, score_en, score_es, score_fr, score_zh) AND greatest(score_de, score_en, score_es, score_fr, score_zh) > 0 THEN 'zh'
                 ELSE 'unknown'
               END AS pred_lang
        FROM s
    )
    SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY lang), 4)
               AS share_of_lang
    FROM p GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID quality report: labeled vs predicted language counts and
    per-label shares — the heuristic's scoring scan plus a ~|langs|² agg."""
    from pyspark.sql.window import Window as W

    pred = text_ops.lang_id(load_table(spark, "documents", sf_dir))
    cm = pred.groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("n_docs"))
    per_lang = W.partitionBy("lang")
    return cm.select(
        "lang",
        "pred_lang",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(per_lang), 4).alias(
            "share_of_lang"
        ),
    ).orderBy("lang", "pred_lang")


@register(
    "order_to_ship_latency",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(AVG(datediff('day', o_orderdate, l_shipdate)), 4)
               AS avg_days_to_ship,
           ROUND(quantile_cont(datediff('day', o_orderdate, l_shipdate), 0.5), 4)
               AS p50_days_to_ship,
           ROUND(quantile_cont(datediff('day', o_orderdate, l_shipdate), 0.95), 4)
               AS p95_days_to_ship,
           CAST(MIN(datediff('day', o_orderdate, l_shipdate)) AS INT)
               AS min_days_to_ship,
           CAST(MAX(datediff('day', o_orderdate, l_shipdate)) AS INT)
               AS max_days_to_ship
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)
def order_to_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per priority class — one keyed
    fact join + hash-agg with exact p50/p95."""
    return analytics.order_to_ship_latency(
        load_table(spark, "orders", sf_dir), load_table(spark, "lineitem", sf_dir)
    )


@register(
    "user_gap_stats",
    oracle="""
    WITH g AS (
        SELECT user_id,
               epoch(ts) - lag(epoch(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(AVG(gap), 4) AS mean_gap_s,
           ROUND(quantile_cont(gap, 0.5), 4) AS p50_gap_s,
           ROUND(quantile_cont(gap, 0.95), 4) AS p95_gap_s,
           ROUND(AVG(gap) / nullif(quantile_cont(gap, 0.5), 0.0), 4) AS burstiness
    FROM g WHERE gap IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
)
def user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event cadence (mean/p50/p95 gap, burstiness) — one
    keyed lag window + hash-agg."""
    return temporal.user_gap_stats(load_table(spark, "events", sf_dir))


@register(
    "token_fertility_by_lang",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS BIGINT)
               AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')))
                AS BIGINT) AS bpe_tokens,
           ROUND(SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')))
                 * 1.0 / SUM(len(string_split_regex(trim(text), ' +'))), 4)
               AS fertility,
           ROUND(SUM(length(text)) * 1.0
                 / SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))), 4)
               AS chars_per_bpe_token
    FROM documents
    GROUP BY 1 ORDER BY 1
    """,
)
def token_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (subwords per word, chars per subword) per
    language — projection + one tiny hash-agg."""
    return text_ops.token_fertility_by_lang(load_table(spark, "documents", sf_dir))


@register(
    "multimodal_resize",
    oracle="""
    WITH a AS (SELECT doc_id AS asset_id, sha256(text) AS payload_hex
               FROM documents)
    SELECT asset_id,
           CAST(16 AS INT) AS width,
           CAST(16 AS INT) AS height,
           CAST(length(payload_hex) AS BIGINT) AS n_bytes_in,
           CAST(32 AS BIGINT) AS n_bytes_out,
           sha256(substr(payload_hex, 1, 32)) AS resized_sha256
    FROM a ORDER BY asset_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail-resize plumbing (binary→binary mapInPandas kernel with a
    deterministic fake codec); dims + digest verified against the oracle."""
    return multimodal.resize_images(
        _doc_assets(spark, sf_dir), target_w=16, target_h=16
    ).orderBy("asset_id")


@register(
    "streaming_running_totals",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful operator (applyInPandasWithState running
    accumulators), executed for real across TWO micro-batches: events →
    JSON wire format split into two source files → maxFilesPerTrigger=1 →
    parse → per-user (count, sum) state carried batch to batch →
    update-mode parquet sink → latest state per user. The final state must
    equal the one-pass batch aggregate — cross-batch state continuity is
    exactly what this checks (a state loss between batch 1 and 2 halves
    the counts)."""
    import tempfile

    from kafkasparkstream_spark.sources.json_parse import parse_json_events
    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.streaming.sinks import (
        foreach_batch_parquet_sink,
        latest_state,
    )
    from kafkasparkstream_spark.streaming.stateful import running_user_totals

    events = load_table(spark, "events", sf_dir)
    workdir = _stream_workdir("kss_state_")
    src, sink, ckpt = f"{workdir}/src", f"{workdir}/sink", f"{workdir}/ckpt"
    _events_to_wire(events, src, n_files=2)

    raw = file_json_stream(spark, src, max_files_per_trigger=1)
    parsed = parse_json_events(raw, EVENT_WIRE_SCHEMA, ts_col="ts")
    totals = running_user_totals(parsed)

    # Fresh checkpoint per run. Unlike the JVM-state replays, this one
    # passes rows= so a large replay keeps the session's full shuffle
    # width: applyInPandasWithState is Arrow/Python-throughput-bound per
    # partition (see _clamped_shuffle_partitions).
    with _clamped_shuffle_partitions(spark, rows=events.count()):
        q = (
            totals.writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .queryName("running_totals")
            .start()
        )
        q.awaitTermination()

    final = latest_state(spark.read.parquet(sink), ("user_id",))
    return final.select("user_id", "n_events", "sum_value").orderBy("user_id")


@register(
    "incremental_distinct_sketch",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS merged_within_5pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def incremental_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental COUNT(DISTINCT) maintenance via mergeable Datasketches
    HLL, HASH-GATED (round-7 close of the no_oracle row): two batch
    partials are unioned exactly as before (the incremental-view
    machinery under test — merge-losslessness is additionally pinned by
    tests/test_semantics.py::test_hll_sketch_merge_equals_direct), and the
    hashed output is the exact per-type distinct + row counts PLUS the
    bounded verdict that the MERGED estimate lands within 5% (≈3σ at
    lg_k=12) of exact. A lossy merge or broken sketch flips the boolean
    and fails the gate."""
    from kafkasparkstream_spark.operators.aggregates import (
        distinct_sketch_partials,
        merge_distinct_sketches,
    )

    events = load_table(spark, "events", sf_dir)
    b1 = events.filter(F.col("event_id") % 2 == 0)
    b2 = events.filter(F.col("event_id") % 2 == 1)
    merged = merge_distinct_sketches(
        distinct_sketch_partials(b1), distinct_sketch_partials(b2)
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return (
        exact.join(merged.withColumnRenamed("n_rows", "_sk_rows"), "event_type")
        .select(
            "event_type",
            "exact_distinct",
            "n_rows",
            (
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                <= F.lit(0.05) * F.col("exact_distinct")
            ).alias("merged_within_5pct"),
        )
        .orderBy("event_type")
    )


@register(
    "data_quality_audit",
    oracle="""
    WITH a AS (
        SELECT COUNT(*) AS total,
               SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS v_event_id_not_null,
               COUNT(event_id) - COUNT(DISTINCT event_id)        AS v_event_id_unique,
               SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)       AS v_ts_not_null,
               SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)  AS v_user_id_not_null,
               SUM(CASE WHEN NOT event_type IN
                   ('click','view','purchase','signup','error') THEN 1 ELSE 0 END)
                                                                 AS v_event_type_in_domain,
               SUM(CASE WHEN NOT (value BETWEEN 0.0 AND 1000.0) THEN 1 ELSE 0 END)
                                                                 AS v_value_in_range,
               SUM(CASE WHEN props IS NOT NULL AND json_valid(props) = false
                   THEN 1 ELSE 0 END)                            AS v_props_json_parseable
        FROM events
    ),
    u AS (
        SELECT 'event_id_not_null' AS check_name, v_event_id_not_null AS n_violations, total FROM a
        UNION ALL SELECT 'event_id_unique', v_event_id_unique, total FROM a
        UNION ALL SELECT 'ts_not_null', v_ts_not_null, total FROM a
        UNION ALL SELECT 'user_id_not_null', v_user_id_not_null, total FROM a
        UNION ALL SELECT 'event_type_in_domain', v_event_type_in_domain, total FROM a
        UNION ALL SELECT 'value_in_range', v_value_in_range, total FROM a
        UNION ALL SELECT 'props_json_parseable', v_props_json_parseable, total FROM a
    )
    SELECT check_name,
           CAST(total AS BIGINT) AS n_rows,
           CAST(n_violations AS BIGINT) AS n_violations,
           ROUND(n_violations * 1.0 / nullif(total, 0), 6) AS violation_ratio,
           n_violations = 0 AS passed
    FROM u ORDER BY check_name
    """,
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit of the events table in one scan: null/unique/domain/
    range/JSON-parseability checks as conditional aggregates, unpivoted to
    one row per check."""
    from kafkasparkstream_spark.operators import quality as q

    events = load_table(spark, "events", sf_dir)
    checks = [
        q.check_not_null("event_id"),
        q.check_not_null("ts"),
        q.check_not_null("user_id"),
        q.check_in_domain("event_type", ("click", "view", "purchase", "signup", "error")),
        q.check_range("value", 0.0, 1000.0),
        q.check_json_parseable("props", "a INT"),
    ]
    return q.audit(events, checks, unique_cols=("event_id",))


@register(
    "snapshot_diff_summary",
    oracle="""
    WITH old AS (
        SELECT event_id, event_type, value FROM events WHERE event_id % 11 <> 0
    ),
    new AS (
        SELECT event_id, event_type,
               CASE WHEN event_id % 13 = 0 THEN value + 1.0 ELSE value END AS value
        FROM events
    ),
    d AS (
        SELECT coalesce(o.event_id, n.event_id) AS event_id,
               CASE
                 WHEN o.event_id IS NULL THEN 'added'
                 WHEN n.event_id IS NULL THEN 'removed'
                 WHEN o.event_type IS DISTINCT FROM n.event_type
                      OR o.value IS DISTINCT FROM n.value THEN 'changed'
                 ELSE 'unchanged'
               END AS change_type
        FROM old o FULL OUTER JOIN new n USING (event_id)
    )
    SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM d GROUP BY 1 ORDER BY 1
    """,
)
def snapshot_diff_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff: yesterday's table (every 11th row missing) vs
    today's (every 13th row's value bumped) — added/removed/changed/
    unchanged counts off ONE keyed full-outer join."""
    from kafkasparkstream_spark.tables import snapshot_diff_summary as sds

    events = load_table(spark, "events", sf_dir)
    old = events.filter(F.col("event_id") % 11 != 0)
    new = events.withColumn(
        "value",
        F.when(F.col("event_id") % 13 == 0, F.col("value") + 1.0).otherwise(
            F.col("value")
        ),
    )
    return sds(old, new, ("event_id",), ("event_type", "value"))


@register(
    "rolling_7d_active_users",
    oracle="""
    WITH active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    mx AS (SELECT MAX(day) AS max_day FROM active),
    c AS (
        SELECT user_id, unnest(generate_series(day, day + INTERVAL 6 DAY,
                                               INTERVAL 1 DAY)) AS report_day
        FROM active
    )
    SELECT CAST(report_day AS DATE) AS report_day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_7d
    FROM c, mx WHERE CAST(report_day AS DATE) <= max_day
    GROUP BY 1 ORDER BY 1
    """,
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day active users per day: distinct (user, day) collapse →
    bounded explode to report days → distinct count, no sliding-frame
    distinct anywhere."""
    return aggregates.rolling_active_users(load_table(spark, "events", sf_dir))


@register(
    "psi_value_drift",
    oracle="""
    WITH old AS (SELECT value FROM events WHERE event_id % 2 = 0),
    new AS (SELECT CASE WHEN event_id % 5 = 0 THEN value * 1.2 ELSE value END AS value
            FROM events WHERE event_id % 2 = 1),
    ob AS (SELECT CAST(floor((least(greatest(value, 0.0), 1000.0 - 1e-9)) / 50.0) AS INT)
                      AS bucket, COUNT(*) AS n_old FROM old GROUP BY 1),
    nb AS (SELECT CAST(floor((least(greatest(value, 0.0), 1000.0 - 1e-9)) / 50.0) AS INT)
                      AS bucket, COUNT(*) AS n_new FROM new GROUP BY 1),
    j AS (SELECT coalesce(ob.bucket, nb.bucket) AS bucket,
                 coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
          FROM ob FULL OUTER JOIN nb ON ob.bucket = nb.bucket),
    t AS (SELECT SUM(n_old) AS t_old, SUM(n_new) AS t_new FROM j),
    s AS (SELECT bucket, n_old, n_new,
                 (n_old + 0.5) / (t_old + 0.5) AS p_old,
                 (n_new + 0.5) / (t_new + 0.5) AS p_new
          FROM j, t)
    SELECT bucket, CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
           ROUND((p_new - p_old) * ln(p_new / p_old), 6) AS psi_term
    FROM s ORDER BY bucket
    """,
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift (PSI) report between two deterministic event
    slices (odd ids, 20%% of them value-inflated, vs even ids) — fixed-width
    buckets, smoothed log-ratio terms; Σ psi_term is the alarm value."""
    events = load_table(spark, "events", sf_dir)
    old = events.filter(F.col("event_id") % 2 == 0)
    new = events.filter(F.col("event_id") % 2 == 1).withColumn(
        "value",
        F.when(F.col("event_id") % 5 == 0, F.col("value") * 1.2).otherwise(
            F.col("value")
        ),
    )
    return aggregates.psi_drift(old, new)


@register(
    "session_funnel_conversion",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_id
        FROM s
    ),
    s1 AS (
        SELECT user_id, session_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0
        FROM numbered GROUP BY 1, 2
    ),
    s2 AS (
        SELECT n.user_id, n.session_id, s1.t0,
               MIN(CASE WHEN n.event_type = 'click' AND n.ts > s1.t0
                        THEN n.ts END) AS t1
        FROM numbered n JOIN s1 USING (user_id, session_id) GROUP BY 1, 2, 3
    ),
    s3 AS (
        SELECT n.user_id, n.session_id, s2.t0, s2.t1,
               MIN(CASE WHEN n.event_type = 'purchase' AND n.ts > s2.t1
                        THEN n.ts END) AS t2
        FROM numbered n JOIN s2 USING (user_id, session_id) GROUP BY 1, 2, 3, 4
    ),
    c AS (
        SELECT SUM(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS c0,
               SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS c1,
               SUM(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS c2
        FROM s3
    ),
    u AS (
        SELECT 1 AS stage, 'signup' AS stage_name, c0 AS n_users, c0 AS base FROM c
        UNION ALL SELECT 2, 'click', c1, c0 FROM c
        UNION ALL SELECT 3, 'purchase', c2, c0 FROM c
    )
    SELECT CAST(stage AS INT) AS stage, stage_name,
           CAST(n_users AS BIGINT) AS n_users,
           ROUND(n_users * 1.0 / nullif(base, 0), 4) AS conversion
    FROM u ORDER BY stage
    """,
)
def session_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session ordered funnel: a conversion only counts when the
    whole signup→click→purchase sequence happens inside ONE gap-based
    session (a purchase days later is retention, not conversion). Composes
    sessionize (one user-keyed shuffle) with the ordered-funnel windows,
    re-keyed by (user, session) — one additional keyed exchange, n_users
    counts funnel-completing *sessions*."""
    events = load_table(spark, "events", sf_dir)
    sessions = temporal.sessionize(events).withColumn(
        "_sess_key",
        F.concat_ws("#", F.col("user_id").cast("string"), F.col("session_id").cast("string")),
    )
    return temporal.ordered_funnel(sessions, key_col="_sess_key")


@register(
    "dedup_containment",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(common * 1.0 / least(x.n_sh, y.n_sh), 4) AS containment
    FROM pairs
    JOIN sz x ON doc_a = x.doc_id
    JOIN sz y ON doc_b = y.doc_id
    WHERE common * 1.0 / least(x.n_sh, y.n_sh) >= 0.8
    ORDER BY doc_a, doc_b
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dups (short-doc-inside-long-doc) — the
    quote/boilerplate catcher Jaccard misses."""
    return dedup.containment_pairs(load_table(spark, "documents", sf_dir))


@register(
    "quality_weighted_sample",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
        FROM documents
    ), m AS (
        SELECT doc_id, lang,
               len(toks) AS n,
               len(list_distinct(toks)) AS n_uniq,
               len(list_filter(toks, tk -> list_contains(['the','a','of','and','is','to','in','that'], tk))) AS n_stop
        FROM t
    ), q AS (
        SELECT doc_id, lang,
               ROUND(least(n / 64.0, 1.0)
                     * (0.5 + 0.5 * least(n_stop / greatest(n * 0.05, 1.0), 1.0))
                     * (CAST(n_uniq AS DOUBLE) / n), 4) AS quality,
               (CAST(('0x' || substr(md5('qw0' || CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 10000) / 10000.0 AS u
        FROM m
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN u < least(1.0, 2.0 * quality) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           ROUND(SUM(CASE WHEN u < least(1.0, 2.0 * quality) THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 4) AS keep_rate,
           ROUND(AVG(quality), 4) AS avg_quality_before,
           ROUND(AVG(CASE WHEN u < least(1.0, 2.0 * quality) THEN quality END), 4)
               AS avg_quality_after
    FROM q GROUP BY 1 ORDER BY 1
    """,
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional importance sampling (keep-prob = min(1, 2q),
    deterministic md5 uniform): per-language keep rates and the before/after
    mean-quality lift."""
    from kafkasparkstream_spark.operators import sampling as sampling_ops

    docs = load_table(spark, "documents", sf_dir)
    q = text_ops.quality_score(docs).select("doc_id", "quality")
    with_lang = docs.select("doc_id", "lang").join(q, "doc_id")
    return sampling_ops.quality_weighted_sample(with_lang)


@register(
    "session_type_pairs",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_id
        FROM s
    ),
    st AS (SELECT DISTINCT user_id, session_id, event_type FROM numbered),
    tot AS (SELECT COUNT(DISTINCT (user_id, session_id)) AS n_sessions FROM numbered),
    p AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_sessions_both
        FROM st a JOIN st b
          ON a.user_id = b.user_id AND a.session_id = b.session_id
         AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_sessions_both,
           ROUND(n_sessions_both * 1.0 / t.n_sessions, 4) AS support
    FROM p, tot t ORDER BY type_a, type_b
    """,
)
def session_type_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence within gap-based sessions (market-basket
    support over sessions): distinct (session, type) grain bounds the
    self-join fanout to |types| per session key; support normalizes by the
    1-row total-session count."""
    events = load_table(spark, "events", sf_dir)
    st = (
        temporal.sessionize(events)
        .select("user_id", "session_id", "event_type")
        .distinct()
    )
    tot = st.select("user_id", "session_id").distinct().agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    a, b = st.alias("a"), st.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_id") == F.col("b.session_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b")
        )
        .agg(F.count(F.lit(1)).alias("n_sessions_both"))
    )
    return (
        pairs.join(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_sessions_both",
            F.round(F.col("n_sessions_both") / F.col("n_sessions"), 4).alias("support"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "rolling_7d_active_sketch",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS aday FROM events),
    d AS (SELECT DISTINCT aday AS report_day FROM a)
    SELECT report_day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_active_7d,
           TRUE AS sketch_within_5pct
    FROM d JOIN a ON a.aday BETWEEN report_day - 6 AND report_day
    GROUP BY report_day ORDER BY report_day
    """,
)
def rolling_7d_active_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based trailing-7-day active users, HASH-GATED (round-7 close
    of the no_oracle row): the per-day HLL blobs unioned over a day-range
    window execute exactly as before — |days| sketch rows of state instead
    of the users×days explode, the 100 TB shape — and the hashed output is
    the exact trailing-7d distinct per observed day (the verifier: a
    days×activity range join over the ALREADY-COLLAPSED distinct grain)
    PLUS the bounded verdict that every day's sketch estimate is within 5%
    (≈3σ at lg_k=12). The curve is additionally pinned to the exact twin
    in tests/test_semantics.py."""
    from kafkasparkstream_spark.operators.aggregates import (
        rolling_active_users_sketch,
    )

    events = load_table(spark, "events", sf_dir)
    sk = rolling_active_users_sketch(events)
    active = events.select(
        "user_id", F.to_date("ts").alias("aday")
    ).distinct()
    days = active.select(F.col("aday").alias("report_day")).distinct()
    # Exact twin as equi-joins only: explode each activity day FORWARD into
    # the ≤7 report days it reaches (the rolling_active_users shape), then
    # keep observed report days — a broadcastable equi join, not a
    # days×activity range join (which plans as a nested loop).
    contributes = active.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("aday"),
                F.date_add(F.col("aday"), 6),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("report_day"),
    )
    exact = (
        contributes.join(F.broadcast(days), "report_day")
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("exact_active_7d"))
    )
    return (
        exact.join(sk, "report_day")
        .select(
            "report_day",
            "exact_active_7d",
            (
                F.abs(F.col("approx_active_7d") - F.col("exact_active_7d"))
                <= F.lit(0.05) * F.col("exact_active_7d")
            ).alias("sketch_within_5pct"),
        )
        .orderBy("report_day")
    )


@register(
    "embedding_pca_variance",
    oracle="""
    WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    d AS (SELECT unnest(range(1, 65)) AS j),
    v AS (SELECT j, VAR_SAMP(emb[j]) AS vj FROM e, d GROUP BY j)
    SELECT CAST(10 AS INT) AS n_components,
           CAST(ROUND(SUM(vj) / POWER(10, FLOOR(LOG10(SUM(vj))) - 3), 0) AS BIGINT)
               AS trace_sig4,
           CAST(FLOOR(LOG10(SUM(vj))) AS INT) AS trace_exp,
           TRUE AS eigenpairs_certified,
           TRUE AS shares_descending,
           TRUE AS shares_sum_to_one
    FROM v
    """,
)
def embedding_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA spectrum certificate, HASH-GATED (round-7 close of the last
    no_oracle row): the one-pass Gram-partial covariance runs as before,
    the driver-side eigendecomposition is certified in-query (residual /
    orthonormality / ordering / trace identities), and the hashed output
    is the covariance trace as a 4-significant-digit mantissa + exponent
    (r7 ADVICE: coarse relative units so cross-engine summation-order
    disagreement can't straddle a rounding boundary) — recomputed by the
    oracle as Σ per-dimension VAR_SAMP — plus the certificate booleans.
    The numeric top-10 spectrum report remains available via
    operators/similarity.py:pca_variance_spectrum, which pytest pins to a
    single-machine numpy reference (tests/test_semantics.py)."""
    return similarity.pca_spectrum_certificate(
        load_table(spark, "embeddings", sf_dir)
    )


def _pagerank_oracle_sql(iterations: int = 10) -> str:
    """Unrolled power-iteration SQL twin over the kNN-5 edge list."""
    parts = ["""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               list_cosine_similarity(a.emb, b.emb) AS cos
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    g AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY src ORDER BY ROUND(cos * 10000, 0) DESC, dst) AS rnk
            FROM scored) WHERE rnk <= 5
    ),
    nodes AS (SELECT vec_id FROM embeddings),
    nc AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS (SELECT src, COUNT(*) AS deg FROM g GROUP BY 1),
    r0 AS (SELECT vec_id, 1.0 / nc.n AS rank FROM nodes, nc)"""]
    for i in range(1, iterations + 1):
        parts.append(f""",
    c{i} AS (
        SELECT g.dst AS vec_id, SUM(r.rank / d.deg) AS inflow
        FROM g JOIN r{i-1} r ON g.src = r.vec_id JOIN deg d ON d.src = g.src
        GROUP BY 1
    ),
    r{i} AS (
        SELECT n.vec_id, 0.15 / nc.n + 0.85 * coalesce(c{i}.inflow, 0) AS rank
        FROM nodes n CROSS JOIN nc LEFT JOIN c{i} USING (vec_id)
    )""")
    parts.append(f"""
    SELECT vec_id, ROUND(rank, 6) AS rank FROM r{iterations} ORDER BY vec_id
    """)
    return "".join(parts)


@register("pagerank_knn_graph", oracle=_pagerank_oracle_sql(10))
def pagerank_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-graph centrality: 10 power iterations of PageRank over
    the exact kNN-5 cosine graph — the representative-sample /
    duplication-hub ranking; every iteration one edge-keyed join + agg."""
    from kafkasparkstream_spark.operators.graph import pagerank

    emb = load_table(spark, "embeddings", sf_dir)
    edges = similarity.knn_graph(emb, k=5).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return pagerank(edges, emb.select("vec_id"), iterations=10)


@register(
    "unigram_logprob_score",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
        FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    vocab AS (SELECT tok, SUM(c) AS vc FROM tf GROUP BY 1),
    tot AS (SELECT CAST(SUM(vc) AS DOUBLE) AS n FROM vocab)
    SELECT doc_id,
           ROUND(SUM(c * LOG2(vc / n)) / SUM(c), 4) AS mean_logprob,
           CAST(SUM(c) AS BIGINT) AS n_tokens
    FROM tf JOIN vocab USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-lite quality signal: per-doc mean token log2-probability
    under the corpus's own unigram distribution — one fact-sized shuffle,
    vocab broadcast (see operators/text.py:unigram_logprob)."""
    docs = load_table(spark, "documents", sf_dir)
    out = text_ops.unigram_logprob(docs)
    return out.select("doc_id", "mean_logprob", F.col("n_tokens").cast("long").alias("n_tokens"))


@register(
    "streaming_interval_join",
    oracle="""
    WITH c AS (SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'),
    e AS (SELECT event_id, user_id, ts AS e_ts FROM events WHERE event_type = 'error')
    SELECT e.event_id, CAST(COUNT(*) AS BIGINT) AS n_clicks_1h
    FROM e JOIN c
      ON e.user_id = c.user_id
     AND e.e_ts >= c.c_ts
     AND e.e_ts <= c.c_ts + INTERVAL 3600 SECONDS
    GROUP BY e.event_id
    ORDER BY e.event_id
    """,
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join executed for real: clicks and errors
    replay as two watermarked file streams, the inner join pairs each error
    with the same user's clicks from the preceding hour, and the append-mode
    sink's contents must hash-match the batch range-join oracle — proving
    the stateful two-sided join converges to the declarative answer.

    The reference has no joins at all (SURVEY.md §2.3); this is the engine
    exceeding it with the canonical hard Structured Streaming operator. The
    time-bound condition lets Spark size and evict both state stores
    (state ≈ arrival rate × (watermark + interval) per side), so the same
    plan runs unbounded at production scale.
    """
    import tempfile

    from kafkasparkstream_spark.sources.json_parse import parse_json_events
    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.streaming.pipeline import stream_interval_join
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    events = load_table(spark, "events", sf_dir)
    workdir = _stream_workdir("kss_ssjoin_")

    src_c, src_e = f"{workdir}/clicks", f"{workdir}/errors"
    _events_to_wire(events.filter(F.col("event_type") == "click"), src_c)
    _events_to_wire(events.filter(F.col("event_type") == "error"), src_e)

    def _stream(path: str) -> DataFrame:
        raw = file_json_stream(spark, path, max_files_per_trigger=None)
        return parse_json_events(raw, EVENT_WIRE_SCHEMA, payload_col="value", ts_col="ts")

    pairs = stream_interval_join(
        _stream(src_c),
        _stream(src_e),
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        watermark="1 minute",
        within_seconds=3600,
    ).select(
        F.col("r.event_id").alias("event_id"),
        F.col("l.ts").alias("click_ts"),
    )

    sink, ckpt = f"{workdir}/sink", f"{workdir}/ckpt"
    with _clamped_shuffle_partitions(spark):
        q = (
            pairs.writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    return (
        spark.read.parquet(sink)
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_1h"))
        .orderBy("event_id")
    )


@register(
    "streaming_session_window",
    oracle="""
    WITH s AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    n AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid FROM s)
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTES AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM n GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows executed as a real streaming query: the
    state store merges each user's [ts, ts+30min) ranges as events arrive,
    and sessions emit in append mode once the watermark passes their end —
    the only mode Spark allows for streaming session aggregation. The emitted
    rows must hash-match the batch islands construction (the
    session_window_user oracle). Together with the tumbling-window and
    interval-join twins this closes the streaming operator triad — fixed
    windows, dynamic windows, two-sided joins — all state-store-backed.

    A sentinel user (user_id = -1) far in the future advances the watermark
    past every real session's end so the bounded replay flushes all state —
    the same role Kafka heartbeat/flush records play in production backfills;
    it is filtered out at read-back and never reaches the oracle compare.

    The aggregate (count / sum) is decomposable, so session merges combine
    partial states instead of re-reading events; state per user is bounded
    by the session gap × watermark horizon.
    """
    import tempfile

    from kafkasparkstream_spark.sources.json_parse import parse_json_events
    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    events = load_table(spark, "events", sf_dir)
    workdir = _stream_workdir("kss_sesswin_")
    src, sink, ckpt = f"{workdir}/src", f"{workdir}/sink", f"{workdir}/ckpt"
    _wire_with_flush_sentinel(events, src)

    raw = file_json_stream(spark, src, max_files_per_trigger=None)
    parsed = parse_json_events(raw, EVENT_WIRE_SCHEMA, payload_col="value", ts_col="ts")
    # No orderBy here — sorts are illegal mid-stream; ordering happens at the
    # batch read-back below.
    sessions = (
        parsed.withWatermark("ts", "1 minute")
        .groupBy(F.session_window(F.col("ts"), "30 minutes"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(aggregates.value_units("value")).alias("_sum_cents"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "_sum_cents",
        )
    )

    with _clamped_shuffle_partitions(spark):
        q = (
            sessions.writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .queryName("session_windows")
            .start()
        )
        q.awaitTermination()

    return (
        spark.read.parquet(sink)
        .filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            (F.col("_sum_cents").cast("double") / 100.0).alias("sum_value"),
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "duplicated_span_stats",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(toks) - 2, 0) + 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS span
        FROM t
    ),
    c AS (SELECT doc_id, span, COUNT(*) OVER (PARTITION BY span) AS n_docs FROM sh)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicated,
           ROUND(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) / COUNT(*), 4) AS dup_ratio
    FROM c GROUP BY doc_id ORDER BY doc_id
    """,
)
def duplicated_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplication evidence: fraction of each doc's distinct
    3-gram spans that occur in another document (see
    operators/text.py:duplicated_span_stats for the single-join-free plan)."""
    docs = load_table(spark, "documents", sf_dir)
    out = text_ops.duplicated_span_stats(docs)
    return out.select(
        "doc_id",
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("n_duplicated").cast("long").alias("n_duplicated"),
        "dup_ratio",
    )


def _zorder_oracle_sql(bits: int = 16) -> str:
    """Generate the DuckDB twin of tables.zvalue_col for (user_id, floor(value)):
    the same shift/and interleave, term by term."""
    terms = []
    for b in range(bits):
        terms.append(f"(((ux >> {b}) & 1) << {2 * b})")
        terms.append(f"(((vx >> {b}) & 1) << {2 * b + 1})")
    z = " + ".join(terms)
    return f"""
    WITH s AS (
        SELECT (user_id & 65535) AS ux,
               (CAST(FLOOR(value) AS BIGINT) & 65535) AS vx
        FROM events
    ),
    z AS (SELECT {z} AS zval FROM s)
    SELECT CAST(zval >> 24 AS BIGINT) AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(zval) AS BIGINT) AS z_min,
           CAST(MAX(zval) AS BIGINT) AS z_max
    FROM z GROUP BY z_bucket ORDER BY z_bucket
    """


@register("zorder_curve_stats", oracle=_zorder_oracle_sql())
def zorder_curve_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve audit: interleave (user_id, ⌊value⌋) into the
    64-bit curve key with pure shift/and column expressions
    (tables.zvalue_col — the layout key zorder_write sorts by), then roll up
    occupancy per top-8-bit curve bucket. Verifies the bit-interleave is
    exactly the closed form the oracle computes; the layout win it buys
    (per-file min/max tightness → row-group skipping) is pinned in
    tests/test_plans.py."""
    from kafkasparkstream_spark.tables import zvalue_col

    events = load_table(spark, "events", sf_dir)
    ux = F.col("user_id").bitwiseAND(F.lit(65535))
    vx = F.floor("value").cast("long").bitwiseAND(F.lit(65535))
    return (
        events.select(zvalue_col([ux, vx], bits=16).alias("zval"))
        .groupBy(F.shiftright("zval", 24).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
        .orderBy("z_bucket")
    )


@register(
    "pit_trailing_features",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts AS c_ts, value AS c_val FROM events WHERE event_type = 'click'),
    m AS (
        SELECT p.event_id,
               SUM(CASE WHEN c.c_ts >= p.ts - INTERVAL 3600 SECONDS THEN 1 ELSE 0 END) AS n_3600s,
               ROUND(SUM(CASE WHEN c.c_ts >= p.ts - INTERVAL 3600 SECONDS THEN c.c_val ELSE 0 END), 4) AS sum_3600s,
               SUM(CASE WHEN c.c_ts >= p.ts - INTERVAL 86400 SECONDS THEN 1 ELSE 0 END) AS n_86400s,
               ROUND(SUM(CASE WHEN c.c_ts >= p.ts - INTERVAL 86400 SECONDS THEN c.c_val ELSE 0 END), 4) AS sum_86400s
        FROM p JOIN c ON p.user_id = c.user_id
         AND c.c_ts < p.ts AND c.c_ts >= p.ts - INTERVAL 86400 SECONDS
        GROUP BY p.event_id
    )
    SELECT p.event_id, p.user_id, p.ts,
           CAST(COALESCE(m.n_3600s, 0) AS BIGINT) AS n_3600s,
           COALESCE(m.sum_3600s, 0.0) AS sum_3600s,
           CAST(COALESCE(m.n_86400s, 0) AS BIGINT) AS n_86400s,
           COALESCE(m.sum_86400s, 0.0) AS sum_86400s
    FROM p LEFT JOIN m USING (event_id)
    ORDER BY p.event_id
    """,
)
def pit_trailing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature backfill: per purchase, the user's
    strictly-prior click count/value-sum over 1 h and 24 h trailing windows,
    both horizons from ONE binned hash join (operators/temporal.py:
    point_in_time_features) — the no-leakage join every feature store needs."""
    events = load_table(spark, "events", sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    return temporal.point_in_time_features(purchases, clicks)


@register(
    "deletion_cascade_report",
    oracle="""
    WITH t AS (SELECT DISTINCT user_id FROM events WHERE user_id % 29 = 0)
    SELECT e.event_type,
           CAST(SUM(CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
           CAST(SUM(CASE WHEN t.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(COUNT(DISTINCT CASE WHEN t.user_id IS NOT NULL THEN e.user_id END) AS BIGINT) AS n_keys_purged
    FROM events e LEFT JOIN t ON e.user_id = t.user_id
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def deletion_cascade_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten blast radius: per event_type, rows a tombstone
    set (here the deterministic user_id % 29 == 0 cohort) would purge vs
    keep — one broadcast-flagged scan (operators/governance.py)."""
    from kafkasparkstream_spark.operators import governance

    events = load_table(spark, "events", sf_dir)
    tombstones = events.select("user_id").distinct().filter(F.col("user_id") % 29 == 0)
    out = governance.purge_report(events, tombstones)
    return out.select(
        "event_type",
        F.col("n_purged").cast("long").alias("n_purged"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("n_keys_purged").cast("long").alias("n_keys_purged"),
    )


@register(
    "cross_modal_search",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id, list_cosine_similarity(q.emb, c.emb) AS cos
        FROM q JOIN c ON neighbor_id <> query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT r.query_id, r.neighbor_id, ROUND(r.cos, 4) AS cosine,
           CAST(r.rnk AS INT) AS rnk, d.lang, d.source,
           CAST(d.n_chars AS BIGINT) AS n_chars
    FROM ranked r JOIN documents d ON d.doc_id = r.neighbor_id
    WHERE r.rnk <= 5
    ORDER BY r.query_id, r.rnk
    """,
)
def cross_modal_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal retrieval: embedding-space kNN → document metadata in one
    plan. The ANN result (25 rows) is the BROADCAST side of the enrichment
    join — the corpus-sized documents table never shuffles; at 100 TB the
    retrieval fan-out stays k·queries rows against a pruned doc scan."""
    emb = load_table(spark, "embeddings", sf_dir)
    docs = load_table(spark, "documents", sf_dir)
    topk = similarity.brute_force_topk(emb, num_queries=5, k=5)
    return (
        docs.join(F.broadcast(topk), docs.doc_id == topk.neighbor_id)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rnk").cast("int").alias("rnk"),
            "lang",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
        )
        .orderBy("query_id", "rnk")
    )


@register(
    "weighted_reservoir_sample",
    oracle="""
    WITH keyed AS (
        SELECT event_id, event_type, value,
               ROUND(LN((CAST(('0x' || substr(md5('wrs0' || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1)
                        / 4294967297.0)
                     / (value + 1.0), 9) AS wkey
        FROM events
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY wkey DESC, event_id) AS rnk
        FROM keyed
    )
    SELECT event_id, event_type, value, wkey
    FROM ranked WHERE rnk <= 20
    ORDER BY event_type, event_id
    """,
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement: 20 events
    per type, weight = value + 1, via one window rank over the md5-seeded
    exponential-race key (operators/sampling.py:weighted_reservoir_sample)."""
    events = load_table(spark, "events", sf_dir)
    out = sampling.weighted_reservoir_sample(
        events, "event_id", F.col("value") + F.lit(1.0), "event_type", k=20
    )
    return out.select("event_id", "event_type", "value", F.col("_wkey").alias("wkey")).orderBy(
        "event_type", "event_id"
    )


@register(
    "seasonal_residual_anomalies",
    oracle="""
    WITH base AS (
        SELECT event_type, EXTRACT(hour FROM ts) AS hod,
               AVG(value) AS base_avg
        FROM events GROUP BY 1, 2
    ),
    resid AS (
        SELECT e.event_id, e.event_type, e.ts, e.value,
               ROUND(e.value - b.base_avg, 4) AS residual
        FROM events e
        JOIN base b ON b.event_type = e.event_type
                   AND b.hod = EXTRACT(hour FROM e.ts)
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY ABS(residual) DESC, event_id) AS rnk
        FROM resid
    )
    SELECT event_id, event_type, ts, value, residual
    FROM ranked WHERE rnk <= 20
    ORDER BY event_id
    """,
)
def seasonal_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly screen: the hour-of-day baseline per
    event_type (a 24×|types| aggregate — broadcast), residual = value −
    baseline, top-20 by |residual| as TakeOrdered. Two passes over the fact
    table but only one shuffle (the tiny baseline agg); the residual join
    is broadcast so the second scan never exchanges."""
    events = load_table(spark, "events", sf_dir)
    base = (
        events.groupBy(
            F.col("event_type").alias("_bt"), F.hour("ts").alias("_bh")
        ).agg(F.avg("value").alias("base_avg"))
    )
    resid = (
        events.join(
            F.broadcast(base),
            (F.col("event_type") == F.col("_bt")) & (F.hour("ts") == F.col("_bh")),
        )
        .select(
            "event_id",
            "event_type",
            "ts",
            "value",
            F.round(F.col("value") - F.col("base_avg"), 4).alias("residual"),
        )
    )
    return (
        resid.orderBy(F.abs("residual").desc(), F.asc("event_id"))
        .limit(20)
        .orderBy("event_id")
    )


@register(
    "countmin_user_frequencies",
    oracle="""
    WITH rows_ AS (SELECT unnest(range(0, 4)) AS r),
    h AS (
        SELECT e.user_id, r.r AS hrow,
               CAST(('0x' || substr(md5('cms' || CAST(r.r AS VARCHAR) || '_' || CAST(e.user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS bucket
        FROM events e CROSS JOIN rows_ r
    ),
    counters AS (SELECT hrow, bucket, COUNT(*) AS c FROM h GROUP BY 1, 2),
    truth AS (SELECT user_id, COUNT(*) AS true_cnt FROM events GROUP BY 1),
    probes AS (
        SELECT t.user_id, t.true_cnt, r.r AS hrow,
               CAST(('0x' || substr(md5('cms' || CAST(r.r AS VARCHAR) || '_' || CAST(t.user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 64 AS bucket
        FROM truth t CROSS JOIN rows_ r
    )
    SELECT p.user_id, CAST(p.true_cnt AS BIGINT) AS true_cnt,
           CAST(MIN(c.c) AS BIGINT) AS cms_est
    FROM probes p JOIN counters c ON c.hrow = p.hrow AND c.bucket = p.bucket
    GROUP BY p.user_id, p.true_cnt
    ORDER BY p.user_id
    """,
)
def countmin_user_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch per-user frequency estimates (depth 4 × width 64,
    md5 hash rows — engine-portable, so the oracle reproduces every counter;
    see operators/aggregates.py:countmin_estimates). cms_est >= true_cnt
    always; the few-KB counter table is the whole sketch state at any
    cardinality."""
    events = load_table(spark, "events", sf_dir)
    out = aggregates.countmin_estimates(events, "user_id")
    return out.select(
        "user_id",
        F.col("true_cnt").cast("long").alias("true_cnt"),
        F.col("cms_est").cast("long").alias("cms_est"),
    ).orderBy("user_id")


@register(
    "props_variant_stats",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k,
           CAST(COUNT(props->>'$.k') AS BIGINT) AS n_with_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via the VARIANT type (Spark 4): parse_json once
    into an open-schema variant column, extract typed paths with
    variant_get — no StructType declared up front, unlike the from_json
    twin (props_json_sum). This is the schema-on-read regime for payloads
    whose shape drifts: the binary variant encoding is columnar-friendly
    and path extraction stays JVM-side (no Python in the hot path)."""
    events = load_table(spark, "events", sf_dir)
    v = events.select("event_type", F.parse_json("props").alias("_v"))
    k = F.try_variant_get(F.col("_v"), "$.k", "bigint")
    return (
        v.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.sum("_k").alias("sum_k"),
            F.min("_k").alias("min_k"),
            F.max("_k").alias("max_k"),
            F.count("_k").alias("n_with_k"),
        )
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
    "ks_drift_by_type",
    oracle="""
    WITH labeled AS (
        SELECT event_type, value,
               CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS grp
        FROM events
    ),
    tot AS (
        SELECT event_type,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n0,
               SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n1
        FROM labeled GROUP BY 1
    ),
    cum AS (
        SELECT event_type, value,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) OVER w AS c0,
               SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) OVER w AS c1
        FROM labeled
        WINDOW w AS (PARTITION BY event_type ORDER BY value
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT c.event_type,
           CAST(t.n0 AS BIGINT) AS n_even, CAST(t.n1 AS BIGINT) AS n_odd,
           ROUND(MAX(ABS(c.c0 * 1.0 / t.n0 - c.c1 * 1.0 / t.n1)), 4) AS ks_stat
    FROM cum c JOIN tot t USING (event_type)
    GROUP BY c.event_type, t.n0, t.n1
    ORDER BY c.event_type
    """,
)
def ks_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS drift per event_type (even vs odd event ids as the
    deterministic split): max ECDF gap, computed on one key-partitioned
    exchange (operators/windows.py:ks_two_sample_drift)."""
    events = load_table(spark, "events", sf_dir)
    out = windows_ops.ks_two_sample_drift(events)
    return out.select(
        "event_type",
        F.col("n_even").cast("long").alias("n_even"),
        F.col("n_odd").cast("long").alias("n_odd"),
        "ks_stat",
    )


@register(
    "benford_first_digit",
    oracle="""
    WITH d AS (
        SELECT event_type,
               TRY_CAST(substr(regexp_replace(CAST(ABS(value) AS VARCHAR), '[0.]*', '', 'g'), 1, 1) AS INT) AS fd
        FROM events WHERE value IS NOT NULL AND value <> 0
    ),
    c AS (
        SELECT event_type, fd, COUNT(*) AS n
        FROM d WHERE fd IS NOT NULL AND fd > 0
        GROUP BY 1, 2
    )
    SELECT event_type, fd AS first_digit, CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY event_type), 4) AS freq,
           ROUND(LOG10(1 + 1.0 / fd), 4) AS benford_freq,
           ROUND(ABS(n * 1.0 / SUM(n) OVER (PARTITION BY event_type)
                     - LOG10(1 + 1.0 / fd)), 4) AS abs_gap
    FROM c
    ORDER BY event_type, first_digit
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution per event_type vs the Benford
    law expectation — the forensic screen for fabricated/unit-mangled
    numerics (operators/quality.py:benford_first_digit; one scan, one
    hash aggregate)."""
    from kafkasparkstream_spark.operators import quality

    events = load_table(spark, "events", sf_dir)
    return quality.benford_first_digit(events).select(
        "event_type",
        "first_digit",
        F.col("n").cast("long").alias("n"),
        "freq",
        "benford_freq",
        "abs_gap",
    )


@register(
    "hourly_latency_bands",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(value, 0.5), 4)  AS p50,
           ROUND(quantile_cont(value, 0.95), 4) AS p95,
           ROUND(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def hourly_latency_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO-style monitoring bands: exact interpolated P50/P95/P99 of value
    per hour bucket — the latency-percentile time series every ops dashboard
    plots. One hash aggregate keyed by the hour bucket; exact `percentile`
    buffers each bucket's values on its reducer (hours × values fit
    comfortably), with `approx_percentile` as the same-shape swap beyond
    that (see approx_value_percentiles for the sketch twin)."""
    events = load_table(spark, "events", sf_dir)
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
        .select(F.col("w.start").alias("hour_start"), "n", "p50", "p95", "p99")
        .orderBy("hour_start")
    )


@register(
    "streaming_chained_windows",
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0
               AS sum_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def streaming_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained stateful aggregation in ONE streaming query (Spark's
    multiple-stateful-operator support): 1-minute windowed partials
    re-aggregated into 5-minute windows via window_time(), both stages
    state-store-backed, append mode. The emitted rollup must hash-match the
    flat 5-minute batch aggregate — proving the two-level incremental
    computation composes losslessly (count/sum partials are decomposable).

    This is the streaming form of the rollup-hierarchy pattern
    (window_partials/merge_window_partials): the fine grain absorbs the
    event stream, the coarse grain sees only |1-min windows| rows — at
    production rates the second stage's input is ~5 rows per emitted
    window regardless of event volume. A far-future sentinel advances the
    watermark so the bounded replay flushes; its own window never passes
    the watermark, so it self-excludes from append output.
    """
    import tempfile

    from kafkasparkstream_spark.sources.json_parse import parse_json_events
    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    events = load_table(spark, "events", sf_dir)
    workdir = _stream_workdir("kss_chain_")
    src, sink, ckpt = f"{workdir}/src", f"{workdir}/sink", f"{workdir}/ckpt"
    _wire_with_flush_sentinel(events, src)

    raw = file_json_stream(spark, src, max_files_per_trigger=None)
    parsed = parse_json_events(raw, EVENT_WIRE_SCHEMA, payload_col="value", ts_col="ts")
    # Both stateful levels carry exact integer cents — float partials would
    # make the coarse total depend on which 1-min window absorbed each row.
    fine = (
        parsed.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 minute").alias("w1"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(aggregates.value_units("value")).alias("s"),
        )
    )
    coarse = (
        fine.groupBy(F.window(F.window_time("w1"), "5 minutes").alias("w5"))
        .agg(F.sum("n").alias("n_events"), F.sum("s").alias("_sum_c"))
        .select(F.col("w5.start").alias("window_start"), "n_events", "_sum_c")
    )

    with _clamped_shuffle_partitions(spark):
        q = (
            coarse.writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    return (
        spark.read.parquet(sink)
        .select(
            "window_start",
            F.col("n_events").cast("long").alias("n_events"),
            (F.col("_sum_c").cast("double") / 100.0).alias("sum_value"),
        )
        .orderBy("window_start")
    )


@register(
    "inverted_index_postings",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS term
        FROM documents
    ),
    tf AS (SELECT term, doc_id, COUNT(*) AS f FROM tok GROUP BY 1, 2)
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(f) AS BIGINT) AS total_tf,
           array_to_string((list(doc_id ORDER BY doc_id))[1:20], ',') AS postings_head
    FROM tf
    GROUP BY term
    ORDER BY term
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: term → (document frequency, total term
    frequency, ordered posting-list head). The index build is the retrieval
    twin of the word count: one explode → (term, doc) tf aggregate, then a
    term-keyed rollup whose collect_set gathers each term's postings on its
    reducer — partition by term, so posting lists build in parallel and no
    reducer holds more than its terms' lists. Posting heads are capped at
    20 ids to keep the oracle compare bounded; production writes the full
    lists sharded by term hash. The head is emitted as a comma-joined STRING
    (not an array): the driver's canonicalizer sorts the result frame on
    every column, and list-typed cells are unhashable there (r05 red)."""
    docs = load_table(spark, "documents", sf_dir)
    tf = (
        docs.select("doc_id", F.explode(text_ops.tokens_col("text")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("f").alias("total_tf"),
            F.concat_ws(
                ",",
                F.slice(F.sort_array(F.collect_set("doc_id")), 1, 20).cast(
                    "array<string>"
                ),
            ).alias("postings_head"),
        )
        .orderBy("term")
    )


@register(
    "zipf_fit_report",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), ' +')) AS tok FROM documents
    ),
    freq AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
    ranked AS (
        SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rnk FROM freq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
           ROUND(regr_slope(LN(cnt), LN(rnk)), 4) AS zipf_slope,
           ROUND(regr_r2(LN(cnt), LN(rnk)), 4) AS r2
    FROM ranked
    """,
)
def zipf_fit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health check: OLS fit of log-frequency vs log-rank over the
    vocabulary. Natural language sits near slope −1 (Zipf); synthetic or
    template-heavy corpora flatten out — a one-number screen for
    "does this crawl look like language". The rank is a vocabulary-sized
    window (vocab ≪ corpus), the fit is Spark's built-in regr_slope/regr_r2
    aggregate — identical math to the DuckDB oracle."""
    docs = load_table(spark, "documents", sf_dir)
    from pyspark.sql.window import Window

    freq = (
        docs.select(F.explode(text_ops.tokens_col("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = freq.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("tok")))
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.round(F.expr("regr_slope(LN(cnt), LN(rnk))"), 4).alias("zipf_slope"),
        F.round(F.expr("regr_r2(LN(cnt), LN(rnk))"), 4).alias("r2"),
    )


@register(
    "id_continuity_report",
    oracle="""
    WITH ids AS (SELECT DISTINCT event_id FROM events),
    isl AS (
        SELECT event_id,
               event_id - row_number() OVER (ORDER BY event_id) AS grp
        FROM ids
    ),
    islands AS (
        SELECT MIN(event_id) AS island_start, MAX(event_id) AS island_end,
               COUNT(*) AS island_len
        FROM isl GROUP BY grp
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(island_len) AS BIGINT) AS n_ids,
           CAST(MIN(island_start) AS BIGINT) AS min_id,
           CAST(MAX(island_end) AS BIGINT) AS max_id,
           CAST(MAX(island_end) - MIN(island_start) + 1 - SUM(island_len) AS BIGINT)
               AS n_missing
    FROM islands
    """,
)
def id_continuity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-continuity audit: contiguous-id islands via the classic
    id − row_number() trick, rolled up to island/gap counts — the ingest
    health check for "did we drop a batch" (a gap in an append-only id
    column is a missing delivery). One global-ordered window over the
    DISTINCT id set; at 100 TB, range-partition the ids first and count
    island breaks at partition boundaries instead."""
    from pyspark.sql.window import Window

    events = load_table(spark, "events", sf_dir)
    ids = events.select("event_id").distinct()
    isl = ids.withColumn(
        "grp", F.col("event_id") - F.row_number().over(Window.orderBy("event_id"))
    )
    islands = isl.groupBy("grp").agg(
        F.min("event_id").alias("island_start"),
        F.max("event_id").alias("island_end"),
        F.count(F.lit(1)).alias("island_len"),
    )
    return islands.agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("island_len").alias("n_ids"),
        F.min("island_start").alias("min_id"),
        F.max("island_end").alias("max_id"),
        (
            F.max("island_end") - F.min("island_start") + F.lit(1) - F.sum("island_len")
        ).alias("n_missing"),
    )


@register(
    "knn_triangle_stats",
    oracle="""
    WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    scored AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               list_cosine_similarity(a.emb, b.emb) AS cos
        FROM e0 a JOIN e0 b ON a.vec_id <> b.vec_id
    ),
    g AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   row_number() OVER (PARTITION BY src ORDER BY ROUND(cos * 10000, 0) DESC, dst) AS rnk
            FROM scored) WHERE rnk <= 5
    ),
    e AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM g),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM e ab
        JOIN e bc ON ab.v = bc.u
        JOIN e ac ON ac.u = ab.u AND ac.v = bc.v
    ),
    deg AS (
        SELECT n, COUNT(*) AS d FROM (
            SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e
        ) GROUP BY n
    ),
    st AS (SELECT COUNT(*) AS n_nodes,
                  CAST(SUM(d * (d - 1)) / 2 AS BIGINT) AS n_wedges FROM deg),
    ec AS (SELECT COUNT(*) AS n_edges FROM e)
    SELECT CAST(st.n_nodes AS BIGINT) AS n_nodes,
           CAST(ec.n_edges AS BIGINT) AS n_edges,
           CAST(tri.n_triangles AS BIGINT) AS n_triangles,
           st.n_wedges,
           ROUND(3.0 * tri.n_triangles / st.n_wedges, 4) AS clustering_coeff
    FROM tri, st, ec
    """,
)
def knn_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifold-quality signal: triangle census + global clustering
    coefficient of the exact kNN-5 cosine graph (operators/graph.py:
    triangle_stats — ordered two-join enumeration, degree-sum wedges)."""
    from kafkasparkstream_spark.operators.graph import triangle_stats

    emb = load_table(spark, "embeddings", sf_dir)
    edges = similarity.knn_graph(emb, k=5).select(
        F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    out = triangle_stats(edges)
    return out.select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("n_edges").cast("long").alias("n_edges"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
        F.col("n_wedges").cast("long").alias("n_wedges"),
        "clustering_coeff",
    )


@register(
    "daily_dup_rate",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, md5(props) AS dig
        FROM events
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT dig) AS BIGINT) AS n_distinct,
           ROUND(1.0 - COUNT(DISTINCT dig) * 1.0 / COUNT(*), 4) AS dup_rate
    FROM d GROUP BY day ORDER BY day
    """,
)
def daily_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication trend over ingest time: per-day exact-duplicate rate of
    the payload digest — the curation dashboard curve that catches a
    duplicating upstream producer the day it breaks. COUNT vs
    COUNT(DISTINCT md5) in one day-keyed aggregate; at scale the distinct
    side is the only state and it partitions by day."""
    events = load_table(spark, "events", sf_dir)
    return (
        events.select(F.to_date("ts").alias("day"), F.md5(F.col("props").cast("binary")).alias("dig"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("dig").alias("n_distinct"),
            F.round(1.0 - F.countDistinct("dig") / F.count(F.lit(1)), 4).alias("dup_rate"),
        )
        .orderBy("day")
    )


@register(
    "streaming_enrich_join",
    oracle="""
    WITH dim(event_type, category, weight) AS (
        VALUES ('click', 'engagement', 1.0), ('view', 'engagement', 0.5),
               ('purchase', 'revenue', 5.0), ('signup', 'growth', 3.0),
               ('error', 'ops', 0.0)
    )
    SELECT d.category,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value * d.weight), 4) AS weighted_value
    FROM events e JOIN dim d USING (event_type)
    GROUP BY d.category
    ORDER BY d.category
    """,
)
def streaming_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment executed for real: each micro-batch
    broadcast-joins against a small dimension table (enrich_stage — the
    static side re-resolves per batch, so dims update without a stream
    restart), then a per-category rollup of the enriched rows read back
    from the append sink must hash-match the batch join. No streaming
    state at all — the join is per-batch, which is why it scales to any
    stream rate."""
    import tempfile

    from kafkasparkstream_spark.sources.json_parse import parse_json_events
    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.streaming.pipeline import enrich_stage
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    events = load_table(spark, "events", sf_dir)
    workdir = _stream_workdir("kss_enrich_")
    src, sink, ckpt = f"{workdir}/src", f"{workdir}/sink", f"{workdir}/ckpt"
    _events_to_wire(events, src)

    dim = spark.createDataFrame(
        [
            ("click", "engagement", 1.0),
            ("view", "engagement", 0.5),
            ("purchase", "revenue", 5.0),
            ("signup", "growth", 3.0),
            ("error", "ops", 0.0),
        ],
        "event_type string, category string, weight double",
    )
    raw = file_json_stream(spark, src, max_files_per_trigger=None)
    parsed = parse_json_events(raw, EVENT_WIRE_SCHEMA, payload_col="value", ts_col="ts")
    # enrich_stage joins LEFT by design (unmatched events survive with null
    # dims); the rollup drops them to match the oracle's inner join — a
    # sixth event_type or malformed wire line must not hash-diverge.
    enriched = (
        enrich_stage(parsed, dim, on="event_type")
        .filter(F.col("category").isNotNull())
        .select("category", "value", "weight")
    )

    with _clamped_shuffle_partitions(spark):
        q = (
            enriched.writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    return (
        spark.read.parquet(sink)
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value") * F.col("weight")), 4).alias("weighted_value"),
        )
        .orderBy("category")
    )


@register(
    "time_to_conversion",
    oracle="""
    WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    nxt AS (
        SELECT c.event_id, MIN(p.ts) AS next_purchase
        FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.ts > c.ts
        GROUP BY c.event_id
    ),
    banded AS (
        SELECT CASE
                 WHEN n.next_purchase IS NULL THEN 'none'
                 WHEN epoch(n.next_purchase) - epoch(c.ts) <= 3600 THEN 'within_1h'
                 WHEN epoch(n.next_purchase) - epoch(c.ts) <= 86400 THEN 'within_24h'
                 ELSE 'later'
               END AS band
        FROM c JOIN nxt n USING (event_id)
    )
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n_clicks
    FROM banded GROUP BY band ORDER BY band
    """,
)
def time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each click's STRICTLY-NEXT purchase by the same user,
    banded into conversion-latency buckets. The Spark side is the
    union-and-carry construction of operators/temporal.py:asof_join run in
    REVERSED time order — ``last(ignorenulls)`` over an
    unboundedPreceding..currentRow frame, which Spark evaluates
    incrementally in one pass (a currentRow..following frame re-scans to
    the partition end for every row: O(n²) per hot user). At equal
    instants the click sorts first in the reversed scan, so same-instant
    purchases are excluded — strict forward semantics by sort order alone.
    The oracle uses a min-join — two different constructions that must
    agree, which is the point."""
    from pyspark.sql.window import Window

    events = load_table(spark, "events", sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("_side"), F.col("ts").alias("_p_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("_side"), F.lit(None).cast("timestamp").alias("_p_ts")
    )
    # Reversed scan (ts desc): the preceding frame holds later-ts rows, and
    # last(ignorenulls) is the nearest — i.e. the earliest later purchase.
    # At equal ts the click (_side 0) precedes the purchase (_side 1), so
    # the purchase stays outside the click's frame: strictly-after only.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = purchases.unionByName(clicks).withColumn(
        "next_purchase", F.last("_p_ts", ignorenulls=True).over(w)
    )
    # double-precision epoch difference — cast('long') would FLOOR each side
    # and band a 3600.8 s latency as 3600 (sub-second fractions are real in
    # the fixtures); the oracle's epoch() keeps fractions too.
    secs = F.col("next_purchase").cast("double") - F.col("ts").cast("double")
    band = (
        F.when(F.col("next_purchase").isNull(), "none")
        .when(secs <= 3600, "within_1h")
        .when(secs <= 86400, "within_24h")
        .otherwise("later")
    )
    return (
        carried.filter(F.col("_side") == 0)  # keep the click rows
        .select(band.alias("band"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
        .orderBy("band")
    )


@register(
    "peak_concurrency",
    oracle="""
    WITH s AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    n AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid FROM s),
    sess AS (
        SELECT user_id, MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTES AS session_end
        FROM n GROUP BY user_id, sid
    ),
    deltas AS (
        SELECT session_start AS t, 1 AS delta FROM sess
        UNION ALL
        SELECT session_end AS t, -1 AS delta FROM sess
    ),
    curve AS (
        SELECT SUM(delta) OVER (ORDER BY t, delta
                                ROWS UNBOUNDED PRECEDING) AS conc
        FROM deltas
    )
    SELECT CAST((SELECT COUNT(*) FROM sess) AS BIGINT) AS n_sessions,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrency
    FROM curve
    """,
)
def peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous sessions — the sweep-line classic, built scalable:
    +1/−1 boundary events range-partition by time, each partition computes
    its LOCAL running sum, per-partition totals (one tiny row each) become
    broadcast exclusive-prefix offsets, and the global curve is local_cum +
    offset — the textbook two-phase distributed prefix sum, no single
    global-sort reducer. Ends sort before starts at equal instants
    ([start, end) half-open sessions don't overlap at the boundary).

    The (t, delta, pid) table is materialized ONCE (checkpoint) before both
    consumers: RangePartitioner boundaries come from nondeterministic
    sampling, so letting the local-cumsum and totals branches each re-plan
    the exchange would only agree while exchange reuse happens to dedupe
    them — pin it instead of relying on an optimizer artifact."""
    from pyspark.sql.window import Window

    events = load_table(spark, "events", sf_dir)
    sess = windows_ops.session_window_agg(events).select("session_start", "session_end")
    deltas = sess.select(
        F.col("session_start").alias("t"), F.lit(1).alias("delta")
    ).unionByName(sess.select(F.col("session_end").alias("t"), F.lit(-1).alias("delta")))

    parts = (
        deltas.repartitionByRange(8, "t", "delta")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parts.withColumn("local_cum", F.sum("delta").over(w_local))
    totals = parts.groupBy("pid").agg(F.sum("delta").alias("tot"))
    w_off = (
        Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn(
        "offset", F.sum("tot").over(w_off) - F.col("tot")
    ).select("pid", "offset")
    curve = local.join(F.broadcast(offsets), "pid").withColumn(
        "conc", F.col("local_cum") + F.col("offset")
    )
    # n_sessions = number of +1 boundary rows — free in the same aggregate,
    # instead of a second full sessionization job for a count literal.
    return curve.agg(
        F.sum((F.col("delta") == 1).cast("long")).alias("n_sessions"),
        F.max("conc").cast("long").alias("peak_concurrency"),
    )


@register(
    "top3_per_user_agg_twin",
    oracle="""
    SELECT * FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INT) AS rnk
        FROM events
    ) WHERE rnk <= 3
    ORDER BY user_id, rnk
    """,
)
def top3_per_user_agg_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per key WITHOUT a rank window: one hash aggregate collects each
    key's rows, sorts the tiny per-key array, slices k, re-explodes. Same
    oracle as top3_by_value_per_user — two physical strategies, one truth.
    The agg form wins on high-cardinality keys with small groups (map-side
    partial collect, no sort of the whole partition); the window form wins
    when single keys are huge (no per-key array buffering). Both are in the
    registry so the trade-off is measured, not guessed."""
    events = load_table(spark, "events", sf_dir)
    cols = events.columns
    inner = F.struct(
        (-F.col("value")).alias("nv"),
        F.col("event_id").alias("eid"),
        F.struct(*cols).alias("row"),
    )
    return (
        events.groupBy("user_id")
        .agg(F.slice(F.sort_array(F.collect_list(inner)), 1, 3).alias("top"))
        .select(F.posexplode("top").alias("pos", "item"))
        .select("item.row.*", (F.col("pos") + 1).cast("int").alias("rnk"))
        .orderBy("user_id", "rnk")
    )


@register(
    "value_trend_by_type",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(value, epoch(ts)) * 86400, 6) AS slope_per_day,
           ROUND(regr_r2(value, epoch(ts)), 6) AS r2
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def value_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend: value regressed on event time, reported as
    slope-per-day + fit quality — the drift/trend detector for metric
    monitoring. regr_slope/regr_r2 are decomposable aggregates (sums of
    products), so this is one map-side-combined hash agg."""
    events = load_table(spark, "events", sf_dir)
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.expr("regr_slope(value, CAST(ts AS DOUBLE))") * 86400, 6
            ).alias("slope_per_day"),
            F.round(F.expr("regr_r2(value, CAST(ts AS DOUBLE))"), 6).alias("r2"),
        )
        .orderBy("event_type")
    )


def _label_centroids(emb: DataFrame) -> DataFrame:
    """(label, c) mean-embedding table: one posexplode → (label, dim) mean
    (the only fact-sized shuffle, map-side combined), re-assembled into an
    ordered array per label — labels × dims rows, broadcastable."""
    e = emb.select("label", F.col("embedding").cast("array<double>").alias("emb"))
    pos = (
        e.select("label", F.posexplode("emb").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg("x").alias("m"))
    )
    return (
        pos.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("_im"))
        .select("label", F.expr("transform(_im, s -> s.m)").alias("c"))
    )


@register(
    "label_separability",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    pos AS (
        SELECT label, i, AVG(emb[i]) AS m
        FROM e, (SELECT unnest(range(1, 1 + len(emb))) AS i
                 FROM (SELECT emb FROM e LIMIT 1)) idx
        GROUP BY 1, 2
    ),
    cent AS (SELECT label, list(m ORDER BY i) AS c FROM pos GROUP BY label),
    sc AS (
        SELECT e.label,
               list_cosine_similarity(e.emb, cent.c) AS cos
        FROM e JOIN cent USING (label)
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(cos), 4) AS avg_cos_to_centroid,
           ROUND(MIN(cos), 4) AS min_cos_to_centroid
    FROM sc GROUP BY label ORDER BY label
    """,
)
def label_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality diagnostic per class label: each label's mean
    vector (centroid) and how tightly members cohere to it (avg/min cosine).
    Loose clusters flag label noise or an under-trained encoder before any
    model consumes the embeddings.

    Shape: one posexplode → (label, dim) mean (the only fact-sized
    shuffle, map-side combined), centroids re-assembled label-side
    (labels × dims rows — broadcastable), then a broadcast join back and a
    zip_with/aggregate dot product per row — no Python, no driver math.
    """
    from kafkasparkstream_spark.operators.similarity import dot, norm

    emb = load_table(spark, "embeddings", sf_dir)
    e = emb.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("emb"))
    # centroid norm precomputed once per label, not per corpus row
    cent = _label_centroids(emb).withColumn("c_norm", norm(F.col("c")))
    sc = e.join(F.broadcast(cent), "label").withColumn(
        "cos", dot(F.col("emb"), F.col("c")) / (norm(F.col("emb")) * F.col("c_norm"))
    )
    return (
        sc.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("cos"), 4).alias("avg_cos_to_centroid"),
            F.round(F.min("cos"), 4).alias("min_cos_to_centroid"),
        )
        .orderBy("label")
    )


@register(
    "label_confusion_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    pos AS (
        SELECT label, i, AVG(emb[i]) AS m
        FROM e, (SELECT unnest(range(1, 1 + len(emb))) AS i
                 FROM (SELECT emb FROM e LIMIT 1)) idx
        GROUP BY 1, 2
    ),
    cent AS (SELECT label, list(m ORDER BY i) AS c FROM pos GROUP BY label)
    SELECT a.label AS label_a, b.label AS label_b,
           ROUND(list_cosine_similarity(a.c, b.c), 4) AS centroid_cos
    FROM cent a JOIN cent b ON a.label < b.label
    ORDER BY label_a, label_b
    """,
)
def label_confusion_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-collision matrix: pairwise cosine between label centroids —
    labels whose centroids nearly coincide are indistinguishable to any
    downstream model (label noise, or classes that should merge). Pairs are
    labels² rows over broadcast-sized centroids; the corpus is scanned once
    for the (label, dim) means."""
    from kafkasparkstream_spark.operators.similarity import cosine

    emb = load_table(spark, "embeddings", sf_dir)
    cent = _label_centroids(emb)
    a = cent.select(F.col("label").alias("label_a"), F.col("c").alias("ca"))
    b = cent.select(F.col("label").alias("label_b"), F.col("c").alias("cb"))
    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(cosine(F.col("ca"), F.col("cb")), 4).alias("centroid_cos"),
        )
        .orderBy("label_a", "label_b")
    )


@register(
    "value_decile_uniformity",
    oracle="""
    WITH r AS (
        SELECT event_type,
               cume_dist() OVER (PARTITION BY event_type ORDER BY value, event_id) AS cd
        FROM events
    )
    SELECT event_type,
           CAST(LEAST(FLOOR(cd * 10), 9) AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM r
    GROUP BY 1, 2
    ORDER BY event_type, decile
    """,
)
def value_decile_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalization check via cume_dist: mapping each value to its
    within-group cumulative rank must land ~uniform decile occupancy (the
    flatness IS the property quantile normalization promises). Ties broken
    by event_id so both engines rank identically; one window shuffle per
    group key."""
    from pyspark.sql.window import Window

    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        events.withColumn("cd", F.cume_dist().over(w))
        .select(
            "event_type",
            F.least(F.floor(F.col("cd") * 10), F.lit(9)).cast("int").alias("decile"),
        )
        .groupBy("event_type", "decile")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "decile")
    )


@register(
    "streaming_dedup_replay",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def streaming_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication proven end-to-end: the wire replay contains
    EVERY event twice (an at-least-once source re-delivering the whole
    topic), dedup_stage drops the re-deliveries inside the stream, and the
    sink's per-type counts must equal the clean batch counts — the
    exactly-once-ish ingest guard the reference lacks (its JDBC append
    doubles on replay, SURVEY.md ST3), hash-verified rather than asserted
    on a toy fixture. Dedup keys on (event_id, ts): state is one entry per
    in-horizon event, evicted as the watermark passes."""
    import tempfile

    from kafkasparkstream_spark.sources.json_parse import parse_json_events
    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.streaming.pipeline import PipelineConfig, dedup_stage
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    events = load_table(spark, "events", sf_dir)
    workdir = _stream_workdir("kss_ddr_")
    src, sink, ckpt = f"{workdir}/src", f"{workdir}/sink", f"{workdir}/ckpt"
    doubled = events.unionByName(events)  # the re-delivered topic
    _events_to_wire(doubled, src)

    raw = file_json_stream(spark, src, max_files_per_trigger=None)
    parsed = parse_json_events(raw, EVENT_WIRE_SCHEMA, payload_col="value", ts_col="ts")
    cfg = PipelineConfig(ts_col="ts")
    deduped = dedup_stage(parsed, keys=("event_id", "ts"), cfg=cfg)

    with _clamped_shuffle_partitions(spark):
        q = (
            deduped.writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    return (
        spark.read.parquet(sink)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


@register(
    "daily_type_share",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, event_type FROM events
    )
    SELECT day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY day), 4) AS share
    FROM d GROUP BY day, event_type
    ORDER BY day, event_type
    """,
)
def daily_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition drift over ingest time: each day's event-type mix as
    within-day shares — the upstream-change detector (a producer that stops
    sending a type shifts the shares before any count alarm fires). One
    (day, type) hash aggregate; the share denominator rides a day-keyed
    window over the aggregate's own (tiny) output."""
    from pyspark.sql.window import Window

    events = load_table(spark, "events", sf_dir)
    agg = (
        events.select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("day")
    return (
        agg.withColumn("share", F.round(F.col("n") / F.sum("n").over(w), 4))
        .orderBy("day", "event_type")
    )


@register(
    "order_fanout_profile",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY 1
    )
    SELECT CAST(n_lines AS INT) AS n_lines,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(COUNT(*)) OVER (ORDER BY n_lines
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_orders
    FROM per_order GROUP BY n_lines ORDER BY n_lines
    """,
)
def order_fanout_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key fan-out histogram: how many lineitems each order key fans
    out to, with a cumulative curve — the profile that decides whether the
    orders⋈lineitem join needs skew handling (a long tail here is the skew;
    compare key_skew_report for the per-key view). Two hash aggregates over
    8-byte keys; the histogram itself is ~10 rows."""
    from pyspark.sql.window import Window

    lineitem = load_table(spark, "lineitem", sf_dir)
    per_order = lineitem.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    hist = per_order.groupBy("n_lines").agg(F.count(F.lit(1)).alias("n_orders"))
    w = Window.orderBy("n_lines").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        hist.withColumn("cum_orders", F.sum("n_orders").over(w))
        .select(
            F.col("n_lines").cast("int").alias("n_lines"),
            "n_orders",
            F.col("cum_orders").cast("long").alias("cum_orders"),
        )
        .orderBy("n_lines")
    )


@register(
    "ewma_value_per_user",
    oracle="""
    WITH e AS (
        SELECT user_id,
               (value
                + COALESCE(LAG(value, 1) OVER w * 0.5, 0)
                + COALESCE(LAG(value, 2) OVER w * 0.25, 0)
                + COALESCE(LAG(value, 3) OVER w * 0.125, 0)
                + COALESCE(LAG(value, 4) OVER w * 0.0625, 0)
                + COALESCE(LAG(value, 5) OVER w * 0.03125, 0)
                + COALESCE(LAG(value, 6) OVER w * 0.015625, 0)
                + COALESCE(LAG(value, 7) OVER w * 0.0078125, 0))
               /
               (1.0
                + CASE WHEN LAG(value, 1) OVER w IS NULL THEN 0 ELSE 0.5 END
                + CASE WHEN LAG(value, 2) OVER w IS NULL THEN 0 ELSE 0.25 END
                + CASE WHEN LAG(value, 3) OVER w IS NULL THEN 0 ELSE 0.125 END
                + CASE WHEN LAG(value, 4) OVER w IS NULL THEN 0 ELSE 0.0625 END
                + CASE WHEN LAG(value, 5) OVER w IS NULL THEN 0 ELSE 0.03125 END
                + CASE WHEN LAG(value, 6) OVER w IS NULL THEN 0 ELSE 0.015625 END
                + CASE WHEN LAG(value, 7) OVER w IS NULL THEN 0 ELSE 0.0078125 END)
               AS ewma
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(ewma), 4) AS avg_ewma,
           ROUND(MAX(ewma), 4) AS max_ewma
    FROM e GROUP BY user_id ORDER BY user_id
    """,
)
def ewma_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-lag exponentially-weighted moving average of ``value`` per
    user (alpha=0.5, 8 taps), summarized per key. True EWMA is a recursion —
    hostile to set-oriented engines — but with a geometric decay the tail
    beyond 8 taps contributes < 0.4% of the weight, so a fixed-depth lag
    expansion is both exact-enough and embarrassingly parallel: one shuffle
    on user_id, eight ``lag`` reads inside a single WindowExec pass, no
    Python. The per-row prefix is renormalized by the weights actually
    present so early rows aren't biased toward zero. alpha=1/2 makes every
    tap weight a power of two — each product is exact float scaling, so the
    Spark and DuckDB values agree bit-for-bit before rounding.

    100 TB shape: partitions by user_id (high-cardinality key), sequential
    scan per key inside WindowExec — no global sort, no driver state. The
    8-tap depth is a constant, independent of history length, unlike the
    recursive formulation which would serialize each key's full timeline.
    """
    events = load_table(spark, "events", sf_dir)
    return (
        temporal.bounded_ewma(events, key="user_id", value="value")
        .select("user_id", "ewma")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("ewma"), 4).alias("avg_ewma"),
            F.round(F.max("ewma"), 4).alias("max_ewma"),
        )
        .orderBy("user_id")
    )


@register(
    "jackknife_mean_se",
    oracle="""
    WITH pf AS (
        SELECT event_type, event_id % 16 AS fold,
               SUM(value) AS sf, COUNT(*) AS nf
        FROM events GROUP BY 1, 2
    ),
    t AS (
        SELECT event_type, SUM(sf) AS s, SUM(nf) AS n, COUNT(*) AS nfolds
        FROM pf GROUP BY 1
    ),
    j AS (
        SELECT pf.event_type, t.s, t.n, t.nfolds,
               CASE WHEN t.n > pf.nf
                    THEN (t.s - pf.sf) / (t.n - pf.nf) END AS loo
        FROM pf JOIN t USING (event_type)
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           ROUND(MAX(s) / MAX(n), 4) AS mean_value,
           ROUND(SQRT((MAX(nfolds) - 1) * var_pop(loo)), 6) AS jackknife_se
    FROM j GROUP BY event_type ORDER BY event_type
    """,
)
def jackknife_mean_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-fold jackknife standard error of the per-type mean: the
    distributed answer to "what error bar goes on this aggregate?" without
    resampling the data. 16 deterministic folds (event_id mod 16) give 16
    leave-one-fold-out means; their population variance scaled by (F-1)
    estimates the variance of the full mean (Efron & Stein 1981 — public
    statistics, not engine-specific).

    100 TB shape: ONE fact-sized shuffle — the (type, fold) partial
    aggregate, map-side combined to |types|x16 rows. Everything after
    (totals, leave-one-out means, variance across folds) runs on that tiny
    aggregate; the rejoin broadcasts a |types|-row table. Contrast with
    bootstrap-by-replication, which multiplies the fact scan by B.
    """
    events = load_table(spark, "events", sf_dir)
    pf = (
        events.select(
            "event_type", (F.col("event_id") % 16).alias("fold"), "value"
        )
        .groupBy("event_type", "fold")
        .agg(F.sum("value").alias("sf"), F.count(F.lit(1)).alias("nf"))
        # |types|x16 rows feeding two consumers (totals + rejoin): pin it
        # so the fact scan runs once
        .localCheckpoint()
    )
    tot = pf.groupBy("event_type").agg(
        F.sum("sf").alias("s"), F.sum("nf").alias("n"), F.count(F.lit(1)).alias("nfolds")
    )
    # Guarded: a type whose rows all land in one fold has n == nf for that
    # fold; both engines must yield NULL there, not an engine-specific
    # divide-by-zero artifact (Spark NULL vs DuckDB inf).
    j = pf.join(F.broadcast(tot), "event_type").withColumn(
        "loo",
        F.when(
            F.col("n") > F.col("nf"),
            (F.col("s") - F.col("sf")) / (F.col("n") - F.col("nf")),
        ),
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.round(F.max("s") / F.max("n"), 4).alias("mean_value"),
            F.round(
                F.sqrt((F.max("nfolds") - F.lit(1)) * F.var_pop("loo")), 6
            ).alias("jackknife_se"),
        )
        .orderBy("event_type")
    )


@register(
    "pareto_customers",
    oracle="""
    WITH co AS (
        SELECT c.c_custkey, c.c_name, c.c_acctbal,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2, 3
    )
    SELECT c_custkey, c_name, c_acctbal, n_orders
    FROM co r
    WHERE NOT EXISTS (
        SELECT 1 FROM co s
        WHERE s.c_acctbal > r.c_acctbal AND s.n_orders > r.n_orders
    )
    ORDER BY c_acctbal DESC, c_custkey
    """,
)
def pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) over customers: the rows not strictly
    dominated on (account balance, order count) — "no one is both richer
    AND more active". Strict dominance on both axes keeps tie handling
    simple: equal-balance or equal-count rows never dominate each other.

    The oracle is the quadratic NOT EXISTS; the Spark plan is the
    distributed two-level sweep (Borzsony/Kossmann skyline literature,
    bucket-prune variant): bucket the x-axis into fixed-width ranges, take
    max(y) per (bucket, x) — one fact-sized shuffle — roll per-bucket maxima
    through a tiny ordered window to get each bucket's carry-in (the best y
    seen in any strictly-higher bucket), then finish with a per-bucket
    window (partitionBy bucket — parallel, never a global sort) computing
    the running max over strictly-greater x within the bucket. A row
    survives iff no strictly-greater x anywhere beat its y. Every step is an
    equi-join or keyed window; the only single-partition structure is the
    per-bucket carry-in table (~22 rows).
    """
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    co = (
        customer.join(
            orders.select(F.col("o_custkey").alias("c_custkey"), "o_orderkey"),
            "c_custkey",
            "left",
        )
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        analytics.skyline_2d(co, x="c_acctbal", y="n_orders", bucket_width=500.0)
        .select("c_custkey", "c_name", "c_acctbal", "n_orders")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
    )


@register(
    "brand_basket_lift",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
    bc AS (SELECT p_brand, COUNT(*) AS cnt FROM items GROUP BY 1),
    pairs AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS pair_cnt
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b,
           CAST(pair_cnt AS BIGINT) AS pair_orders,
           ROUND(pair_cnt * 1.0 * tot.n_orders / (ca.cnt * cb.cnt), 6) AS lift
    FROM pairs
    JOIN bc ca ON ca.p_brand = pairs.brand_a
    JOIN bc cb ON cb.p_brand = pairs.brand_b
    CROSS JOIN tot
    WHERE pair_cnt >= 50
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 15
    """,
)
def brand_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift between part brands co-purchased in one order:
    lift = P(a,b) / (P(a)·P(b)) over order baskets, the association-rule
    screen (lift > 1 = brands bought together more than chance). Extends
    session_type_pairs (co-occurrence support) with marginal normalization.

    100 TB shape: part is the broadcast dim; the basket self-join is
    co-partitioned on l_orderkey with fan-out bounded by the max basket size
    (~13 distinct brands/order → ≤78 pairs), so the pair explosion is
    linear in facts, not quadratic in the catalog. Pair counts and brand
    marginals are |brands|² and |brands| rows — the lift join is all
    broadcast; the 1-row basket total rides a sanctioned broadcast.
    """
    lineitem = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    # one orderkey-keyed shuffle builds each basket's distinct-brand set
    # (collect_set dedups map-side); pair expansion is a JVM array comb —
    # no self-join, no second fact-sized shuffle
    baskets = (
        lineitem.select(F.col("l_partkey").alias("p_partkey"), "l_orderkey")
        .join(F.broadcast(part.select("p_partkey", "p_brand")), "p_partkey")
        .groupBy("l_orderkey")
        .agg(F.collect_set("p_brand").alias("bs"))
        # three consumers (total, marginals, pairs) — materialize the
        # basket-sized table once instead of re-running the fact join+agg
        .localCheckpoint()
    )
    tot = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    bc = baskets.select(F.explode("bs").alias("p_brand")).groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    pair_expr = F.expr(
        "flatten(transform(bs, x -> "
        "transform(filter(bs, y -> y > x), y -> struct(x AS a, y AS b))))"
    )
    pairs = (
        baskets.select(F.explode(pair_expr).alias("p"))
        .groupBy(
            F.col("p.a").alias("brand_a"), F.col("p.b").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 50)
    )
    ca = bc.select(F.col("p_brand").alias("brand_a"), F.col("cnt").alias("cnt_a"))
    cb = bc.select(F.col("p_brand").alias("brand_b"), F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .join(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            F.col("pair_cnt").cast("long").alias("pair_orders"),
            F.round(
                F.col("pair_cnt") * F.col("n_orders") / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(15)
    )


@register(
    "embedding_dim_variance",
    oracle="""
    WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    x AS (
        SELECT u.i - 1 AS dim, e.emb[u.i] AS v
        FROM e, (SELECT unnest(range(1, 1 + len(emb))) AS i
                 FROM (SELECT emb FROM e LIMIT 1)) u
    ),
    d AS (
        SELECT dim, AVG(v) AS mean_v, var_pop(v) AS var_v
        FROM x GROUP BY dim
    )
    SELECT CAST(dim AS INT) AS dim,
           ROUND(mean_v, 6) AS mean_v,
           ROUND(var_v, 6) AS variance,
           ROUND(var_v / SUM(var_v) OVER (), 6) AS var_share
    FROM d ORDER BY dim
    """,
)
def embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance audit of the embedding column — the
    dead-dimension detector (a coordinate with ~zero variance carries no
    signal; a dominant variance share flags a rogue feature or a collapsed
    encoder). One posexplode → (dim) hash aggregate, map-side combined to
    |dims| rows; the variance-share denominator is a window over that tiny
    output. 100 TB shape: the explode multiplies rows by dim count but every
    downstream structure is |dims|-sized — no driver math, no collect."""
    from pyspark.sql.window import Window

    emb = load_table(spark, "embeddings", sf_dir)
    d = (
        emb.select(F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v"))
        .groupBy("dim")
        .agg(F.avg("v").alias("mean_v"), F.var_pop("v").alias("var_v"))
    )
    w = Window.partitionBy()
    return (
        d.select(
            F.col("dim").cast("int").alias("dim"),
            F.round("mean_v", 6).alias("mean_v"),
            F.round("var_v", 6).alias("variance"),
            F.round(F.col("var_v") / F.sum("var_v").over(w), 6).alias("var_share"),
        )
        .orderBy("dim")
    )


@register(
    "embedding_anisotropy",
    oracle="""
    WITH e AS (
        SELECT label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    n AS (
        SELECT label, emb,
               sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm
        FROM e
    ),
    u AS (SELECT label, list_transform(emb, x -> x / nrm) AS uv, nrm FROM n),
    x AS (
        SELECT u.label, i.i, u.uv[i.i] AS v
        FROM u, (SELECT unnest(range(1, 1 + len(emb))) AS i
                 FROM (SELECT emb FROM e LIMIT 1)) i
    ),
    m AS (SELECT label, i, AVG(v) AS mv FROM x GROUP BY label, i),
    a AS (SELECT label, SUM(mv * mv) AS aniso FROM m GROUP BY label),
    s AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
               AVG(nrm) AS avg_norm
        FROM n GROUP BY label
    )
    SELECT s.label, s.n_vecs,
           ROUND(s.avg_norm, 4) AS avg_norm,
           ROUND(a.aniso, 6) AS anisotropy
    FROM s JOIN a USING (label)
    ORDER BY label
    """,
)
def embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label anisotropy of the embedding space: the squared norm of the
    mean *unit* vector — 0 for directionally uniform embeddings, →1 when
    every vector points the same way (the "narrow cone" pathology of
    contrastive/LM encoders, Ethayarajh 2019). Equals the expected pairwise
    cosine between members, without materializing any pair.

    100 TB shape: row-local normalization (JVM transform/aggregate — no
    Python), one posexplode → (label, dim) mean (the only fact-sized
    shuffle, map-side combined), then |labels|×|dims| → |labels| sums and a
    broadcast-sized equi-join with the per-label norm stats. Contrast with
    the naive avg-pairwise-cosine, which is quadratic in corpus size.
    """
    emb = load_table(spark, "embeddings", sf_dir)
    e = emb.select("label", F.col("embedding").cast("array<double>").alias("emb"))
    n = e.withColumn(
        "nrm",
        F.sqrt(F.aggregate("emb", F.lit(0.0), lambda a, x: a + x * x)),
    )
    # ONE fact pass: the exploded rows carry nrm, so the (label, dim)
    # aggregate yields the unit-component means AND (replicated per dim,
    # divided back out by max) the per-label norm sums and counts — no
    # second scan of the embedding table.
    m = (
        n.select("label", "nrm", F.posexplode(F.expr("transform(emb, x -> x / nrm)")).alias("i", "v"))
        .groupBy("label", "i")
        .agg(
            F.avg("v").alias("mv"),
            F.sum("nrm").alias("sn"),
            F.count(F.lit(1)).alias("nv"),
        )
    )
    return (
        m.groupBy("label")
        .agg(
            F.max("nv").cast("long").alias("n_vecs"),
            F.round(F.max("sn") / F.max("nv"), 4).alias("avg_norm"),
            F.round(F.sum(F.col("mv") * F.col("mv")), 6).alias("anisotropy"),
        )
        .orderBy("label")
    )


@register(
    "knn_jaccard_links",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    scored AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
               list_cosine_similarity(a.emb, b.emb) AS cos
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT vec_id, neighbor_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY ROUND(cos * 10000, 0) DESC, neighbor_id) AS rnk
        FROM scored
    ),
    knn AS (SELECT vec_id, neighbor_id FROM ranked WHERE rnk <= 5),
    deg AS (SELECT vec_id, COUNT(*) AS d FROM knn GROUP BY vec_id),
    inter AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, COUNT(*) AS n_common
        FROM knn a JOIN knn b
          ON a.neighbor_id = b.neighbor_id AND a.vec_id < b.vec_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(n_common AS BIGINT) AS n_common,
           ROUND(n_common * 1.0 / (da.d + db.d - n_common), 6) AS jaccard
    FROM inter
    JOIN deg da ON da.vec_id = inter.id_a
    JOIN deg db ON db.vec_id = inter.id_b
    WHERE n_common >= 2
    ORDER BY jaccard DESC, id_a, id_b
    LIMIT 20
    """,
)
def knn_jaccard_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the k-NN graph: neighborhood Jaccard similarity
    for vector pairs sharing ≥2 of their top-5 neighbors — the classic
    common-neighbors score, here used as a near-duplicate/cluster-seed
    signal on embeddings ("two points whose neighbor sets agree are
    interchangeable"). The wedge self-join on neighbor_id is the same
    bounded fan-out shape as knn_triangle_stats: each node has exactly k
    out-edges, so a shared neighbor fans out to ≤k² wedges — linear in
    nodes, never all-pairs. Degrees ride a tiny broadcast join; the final
    top-20 is a TakeOrdered."""
    # Barrier the kNN edge list: it feeds the degree aggregate AND both
    # sides of the wedge self-join, and without lineage truncation each
    # consumer re-runs the GEMM tile kernel (measured 4x cold at sf0.1).
    # The materialized set is n·k rows — linear in corpus size.
    edges = (
        similarity.knn_graph(load_table(spark, "embeddings", sf_dir), k=5)
        .select("vec_id", "neighbor_id")
        # eager=False: see triangle_stats — barrier without executing the
        # kernel at DataFrame-construction time.
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy("vec_id").agg(F.count(F.lit(1)).alias("d"))
    a, b = edges.alias("a"), edges.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.neighbor_id") == F.col("b.neighbor_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= 2)
    )
    da = deg.select(F.col("vec_id").alias("id_a"), F.col("d").alias("da"))
    db = deg.select(F.col("vec_id").alias("id_b"), F.col("d").alias("db"))
    return (
        inter.join(F.broadcast(da), "id_a")
        .join(F.broadcast(db), "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.round(
                F.col("n_common") / (F.col("da") + F.col("db") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "id_a", "id_b")
        .limit(20)
    )


@register(
    "streaming_left_outer_join",
    oracle="""
    WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
         er AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error')
    SELECT c.user_id,
           CAST(COUNT(er.event_id) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN er.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unmatched_clicks
    FROM c LEFT JOIN er
      ON er.user_id = c.user_id
     AND er.ts >= c.ts
     AND er.ts <= c.ts + INTERVAL 600 SECONDS
    GROUP BY c.user_id
    ORDER BY c.user_id
    """,
)
def streaming_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join executed for real: clicks and
    errors replay as two watermarked file streams; each click pairs with the
    same user's errors in the following 10 minutes, and clicks with no such
    error emit a null-extended row — but only after the watermark proves no
    matching error can still arrive. That deferred-null emission is the
    semantic this query pins (the inner twin, streaming_interval_join,
    never has to wait): a flush sentinel 2 h past the last real event
    pushes the final watermark so the bounded replay drains every unmatched
    click out of state, exactly as an unbounded deployment drains them
    continuously. Sink contents must hash-match the batch LEFT JOIN oracle.

    State sizing is identical to the inner case (arrival rate × (watermark
    + interval) per side); the outer side adds only the per-row "matched"
    bit. The sentinel key (-1) pairs with its twin and is filtered on read.
    """
    import tempfile

    from kafkasparkstream_spark.sources.json_parse import parse_json_events
    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.streaming.pipeline import stream_interval_join
    from kafkasparkstream_spark.streaming.sinks import foreach_batch_parquet_sink

    events = load_table(spark, "events", sf_dir)
    workdir = _stream_workdir("kss_lojoin_")

    src_c, src_e = f"{workdir}/clicks", f"{workdir}/errors"
    # anchor both sentinels on the PARENT table's max ts: the global
    # watermark is the min across the two streams, so a per-side anchor
    # would strand tail state whenever one stream ends much earlier
    _wire_with_flush_sentinel(
        events.filter(F.col("event_type") == "click"), src_c, anchor=events
    )
    _wire_with_flush_sentinel(
        events.filter(F.col("event_type") == "error"), src_e, anchor=events
    )

    def _stream(path: str) -> DataFrame:
        raw = file_json_stream(spark, path, max_files_per_trigger=None)
        return parse_json_events(raw, EVENT_WIRE_SCHEMA, payload_col="value", ts_col="ts")

    pairs = stream_interval_join(
        _stream(src_c),
        _stream(src_e),
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        watermark="1 minute",
        within_seconds=600,
        how="left_outer",
    ).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("error_id"),
    )

    sink, ckpt = f"{workdir}/sink", f"{workdir}/ckpt"
    with _clamped_shuffle_partitions(spark):
        q = (
            pairs.writeStream.foreachBatch(foreach_batch_parquet_sink(sink))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    return (
        spark.read.parquet(sink)
        .filter(F.col("user_id") >= 0)
        .groupBy("user_id")
        .agg(
            F.count("error_id").alias("n_pairs"),
            F.sum(F.when(F.col("error_id").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_unmatched_clicks"),
        )
        .orderBy("user_id")
    )


@register(
    "join_size_estimate",
    oracle="""
    WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1)
    SELECT CAST(SUM(CASE WHEN user_id % 64 = 0 THEN n * n ELSE 0 END) * 64
                AS BIGINT) AS est_pairs,
           CAST(SUM(n * n) AS BIGINT) AS exact_pairs,
           ROUND(ABS(SUM(CASE WHEN user_id % 64 = 0 THEN n * n ELSE 0 END) * 64.0
                     - SUM(n * n)) / SUM(n * n), 6) AS rel_err
    FROM c
    """,
)
def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join cardinality estimator: predicts the output size of a
    self-equi-join (events ⋈ events on user_id = Σ per-key count²) from a
    1/64 key-universe sample, next to the exact figure and the relative
    error. At 100 TB you run the estimator BEFORE the join — it prices the
    shuffle and flags quadratic blowup on skewed keys while touching only
    the sampled keys' partial counts (the full-key groupBy here exists only
    to report the exact baseline; production runs the sampled branch alone
    with a pushed-down key predicate). Key-universe sampling (all rows of a
    sampled key, not row sampling) is what makes Σ n² unbiased under
    scaling — row sampling would bias pair counts down by the square of the
    rate. Deterministic mod keeps the oracle in lockstep; production swaps
    in a salted hash for arbitrary key types. One map-side-combined hash
    aggregate; 1-row output, no join anywhere."""
    events = load_table(spark, "events", sf_dir)
    c = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    n2 = F.col("n") * F.col("n")
    sampled = F.sum(F.when(F.col("user_id") % 64 == 0, n2).otherwise(F.lit(0)))
    exact = F.sum(n2)
    return c.agg(
        (sampled * 64).cast("long").alias("est_pairs"),
        exact.cast("long").alias("exact_pairs"),
        F.round(F.abs(sampled * 64.0 - exact) / exact, 6).alias("rel_err"),
    )


@register(
    "nation_revenue_gini",
    oracle="""
    WITH rev AS (
        SELECT c.c_nationkey, c.c_custkey,
               SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS r
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    rk AS (
        SELECT c_nationkey, r,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY r, c_custkey) AS i,
               COUNT(*) OVER (PARTITION BY c_nationkey) AS n,
               SUM(r) OVER (PARTITION BY c_nationkey) AS tot
        FROM rev
    )
    SELECT n.n_name,
           CAST(MAX(rk.n) AS BIGINT) AS n_customers,
           CAST(MAX(rk.tot) AS DOUBLE) / 100.0 AS total_revenue,
           ROUND((2.0 * CAST(SUM(rk.i * rk.r) AS DOUBLE)
                  / (CAST(MAX(rk.n) AS DOUBLE) * CAST(MAX(rk.tot) AS DOUBLE))
                  - (CAST(MAX(rk.n) AS DOUBLE) + 1.0) / CAST(MAX(rk.n) AS DOUBLE))
                 * 1000000.0, 0) / 1000000.0 AS gini
    FROM rk JOIN nation n ON n.n_nationkey = rk.c_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def nation_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per nation as a Gini coefficient — the
    inequality metric behind every 80/20 revenue claim, computed from the
    Lorenz-ordered rank sum: G = 2·Σ(i·rᵢ)/(n·Σr) − (n+1)/n with customers
    ranked ascending by revenue (ties broken by key for determinism).

    100 TB shape: one customers⋈orders equi-join pre-aggregated to
    (nation, customer) revenue, then rank/count/total ride a single
    nation-partitioned WindowExec pass — per-nation sequential work, all
    nations in parallel, never a global sort. The nation dim joins by
    broadcast; output is |nations| rows. A skewed mega-nation serializes
    its own partition only — the documented mitigation is two-phase rank
    (range-partition by revenue within nation, offset by per-range counts),
    same shape as peak_concurrency's distributed prefix sum."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    from pyspark.sql.window import Window

    rev = (
        customer.select("c_custkey", "c_nationkey")
        .join(
            orders.select(F.col("o_custkey").alias("c_custkey"), "o_totalprice"),
            "c_custkey",
        )
        .groupBy("c_nationkey", "c_custkey")
        # Exact integer cents: the per-customer revenue, the rank order and
        # the nation totals are all order-independent integers; only the
        # final ratio touches floats (identical IEEE ops on identical
        # integers in both engines — the sf1.0 sweep caught the raw-double
        # variant flipping at the 9dp compare grid).
        .agg(F.sum(F.rint(F.col("o_totalprice") * 100).cast("long")).alias("r"))
    )
    wp = Window.partitionBy("c_nationkey")
    rk = (
        rev.withColumn("i", F.row_number().over(wp.orderBy("r", "c_custkey")))
        .withColumn("n", F.count(F.lit(1)).over(wp))
        .withColumn("tot", F.sum("r").over(wp))
    )
    n_d = F.max("n").cast("double")
    tot_d = F.max("tot").cast("double")
    gini_raw = (
        2.0 * F.sum(F.col("i") * F.col("r")).cast("double") / (n_d * tot_d)
        - (n_d + 1.0) / n_d
    )
    return (
        rk.join(
            F.broadcast(
                nation.select(F.col("n_nationkey").alias("c_nationkey"), "n_name")
            ),
            "c_nationkey",
        )
        .groupBy("n_name")
        .agg(
            F.max("n").cast("long").alias("n_customers"),
            (F.max("tot").cast("double") / 100.0).alias("total_revenue"),
            (F.round(gini_raw * 1000000.0, 0) / 1000000.0).alias("gini"),
        )
        .orderBy("n_name")
    )


@register(
    "lineitem_corr_matrix",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price,
           ROUND(corr(l_quantity, l_discount), 6) AS qty_discount,
           ROUND(corr(l_extendedprice, l_discount), 6) AS price_discount,
           ROUND(corr(l_extendedprice, l_tax), 6) AS price_tax
    FROM lineitem
    """,
)
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations between the lineitem numeric measures,
    all in ONE scan: corr is a decomposable aggregate (sums of products),
    so four pairs cost one map-side-combined pass with no shuffle beyond
    the 1-row combine — the feature-redundancy screen run before any model
    sees the columns. Contrast with calling df.stat.corr per pair, which
    would scan the fact table four times."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("qty_discount"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("price_discount"),
        F.round(F.corr("l_extendedprice", "l_tax"), 6).alias("price_tax"),
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


@register(
    "resample_hourly_interp",
    oracle="""
    WITH pts AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               ROUND(AVG(value) * 10000, 0) AS vi
        FROM events WHERE user_id < 20
        GROUP BY 1, 2
    ),
    span AS (SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1 FROM pts GROUP BY 1),
    grid AS (SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket FROM span),
    j AS (SELECT g.user_id, g.bucket, p.vi FROM grid g LEFT JOIN pts p USING (user_id, bucket)),
    k AS (
        SELECT user_id, bucket, vi,
               last_value(vi IGNORE NULLS) OVER wb AS pv,
               epoch(last_value(CASE WHEN vi IS NOT NULL THEN bucket END IGNORE NULLS) OVER wb) AS pb,
               first_value(vi IGNORE NULLS) OVER wf AS nv,
               epoch(first_value(CASE WHEN vi IS NOT NULL THEN bucket END IGNORE NULLS) OVER wf) AS nb
        FROM j
        WINDOW wb AS (PARTITION BY user_id ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY bucket
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket,
           (CASE WHEN vi IS NOT NULL THEN vi
                 ELSE ROUND((pv * (nb - epoch(bucket)) + nv * (epoch(bucket) - pb))
                            / (nb - pb), 0) END) / 10000.0
               AS value_interp,
           vi IS NULL AS is_gap
    FROM k
    ORDER BY user_id, bucket
    """,
)
def resample_hourly_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap fill, interpolation flavor: the hourly grid per
    user (users 0-19) with interior gaps filled by the line between the
    surrounding observed hourly averages — resample_hourly_ffill's twin for
    metrics that drift between samples rather than hold. One bucket
    aggregate, distributed sequence() grid, and two ignore-nulls window
    passes per key; anchors always exist because each key's grid spans its
    own observed range. Values ride an integer ten-thousandths grid with
    scale-0 rounds only (see resample_interp's portability note)."""
    events = load_table(spark, "events", sf_dir).filter(F.col("user_id") < 20)
    return aggregates.resample_interp(events, unit="hour")


@register(
    "rollup_cascade_daily",
    oracle="""
    SELECT date_trunc('day', ts) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(ROUND(value * 100, 0)) / 100.0 AS sum_value,
           ROUND(SUM(ROUND(value * 100, 0)) * 100 / COUNT(*), 0) / 10000.0
               AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup cascade (the hypertable continuous-
    aggregate pattern): minute partials re-aggregate to hours, hours to
    days, and the day tier must equal a direct day aggregate off the raw
    stream — which is exactly what the oracle computes. The cascade only
    works because every kept statistic is decomposable (sum/count/min/max
    merge associatively; avg is DERIVED from sum/count at read time, never
    stored — storing avg would make tiers unmergeable).

    Sums ride an integer cents grid: the 2dp values become exact integers
    (ROUND(value*100, 0) of the identical stored double on any engine), so
    re-aggregation order cannot shift a single bit between the cascade and
    the direct aggregate — float sums would differ at 1e-10 and flip 4dp
    rounding at boundaries. avg derives from the exact sums with one
    scale-0 round (see resample_interp's portability note).

    100 TB shape: the only fact-sized shuffle builds the minute tier; each
    further tier aggregates the previous (much smaller) tier. In
    production each tier is a materialized sink maintained incrementally
    (incremental_rollup_merge is the merge step); a day query then scans
    |days|x|types| rows instead of the raw stream."""
    events = load_table(spark, "events", sf_dir)
    cents = F.rint(F.col("value") * 100)
    minute = (
        events.groupBy(
            F.date_trunc("minute", "ts").alias("m"), "event_type"
        ).agg(
            F.sum(cents).alias("sv"),
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
    )
    hour = (
        minute.groupBy(F.date_trunc("hour", "m").alias("h"), "event_type")
        .agg(
            F.sum("sv").alias("sv"),
            F.sum("n").alias("n"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    return (
        hour.groupBy(F.to_date("h").alias("day"), "event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            (F.sum("sv") / 100.0).alias("sum_value"),
            (F.round(F.sum("sv") * 100 / F.sum("n"), 0) / 10000.0).alias("avg_value"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
        )
        .orderBy("day", "event_type")
    )


@register(
    "referential_integrity_audit",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS fk,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
               AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM part p
                                   WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
    ORDER BY fk
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table foreign-key audit: orphan counts for the four main FK
    edges, the first integrity gate a 100 TB warehouse runs after ingest.
    Each edge is a LEFT ANTI join — dimension sides (nation, part,
    customer) broadcast; the lineitem→orders edge is the one shuffled
    anti-join, co-partitioned on the key. Four tiny counts union to one
    4-row report; a healthy warehouse reads all zeros."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    part = load_table(spark, "part", sf_dir)

    def orphans(fact, key, dim, dkey, label, bcast=True):
        d = dim.select(F.col(dkey).alias(key)).distinct()
        d = F.broadcast(d) if bcast else d
        return (
            fact.select(key)
            .join(d, key, "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
            .select(F.lit(label).alias("fk"), "n_orphans")
        )

    return (
        orphans(li, "l_orderkey", orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "lineitem.l_orderkey->orders", bcast=False)
        .unionByName(orphans(orders, "o_custkey", customer, "c_custkey", "orders.o_custkey->customer"))
        .unionByName(orphans(customer, "c_nationkey", nation, "n_nationkey", "customer.c_nationkey->nation"))
        .unionByName(orphans(li, "l_partkey", part, "p_partkey", "lineitem.l_partkey->part"))
        .orderBy("fk")
    )


@register(
    "trimmed_mean_by_type",
    oracle="""
    WITH u AS (
        SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS vq FROM events
    ),
    h AS (SELECT event_type, vq, COUNT(*) AS c FROM u GROUP BY 1, 2),
    hh AS (
        SELECT event_type, vq, c,
               SUM(c) OVER (PARTITION BY event_type ORDER BY vq
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(c) OVER (PARTITION BY event_type) AS n
        FROM h
    ),
    cuts AS (
        SELECT event_type,
               MIN(CASE WHEN cum >= (n * 5 + 99) // 100 THEN vq END)  AS lo_q,
               MIN(CASE WHEN cum >= (n * 95 + 99) // 100 THEN vq END) AS hi_q
        FROM hh GROUP BY event_type
    )
    SELECT u.event_type,
           CAST(SUM(CASE WHEN vq BETWEEN lo_q AND hi_q THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           ROUND(SUM(vq) * 100.0 / COUNT(*), 0) / 10000.0 AS raw_mean,
           ROUND(SUM(CASE WHEN vq BETWEEN lo_q AND hi_q THEN vq END) * 100.0
                 / SUM(CASE WHEN vq BETWEEN lo_q AND hi_q THEN 1 ELSE 0 END), 0)
               / 10000.0 AS trimmed_mean
    FROM u JOIN cuts USING (event_type)
    GROUP BY u.event_type ORDER BY u.event_type
    """,
)
def trimmed_mean_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean per event type next to the raw mean — the robust
    location estimate that survives the fat tails MAD flags
    (mad_outliers_per_type is the detection view; this is the corrected
    statistic).

    Cut points are DISCRETE order statistics on the exact cents grid (the
    smallest value whose cumulative count reaches ⌈p·n⌉ — type-1 quantile),
    not interpolated percentiles: interpolation arithmetic disagrees across
    engines in the last ulp, and with heavy ties at the boundary (the sf1.0
    replica corpus) an ulp decides whether 50 tied rows are in or out.
    Integer ranks cannot disagree.

    Scale shape: the cut computation runs on a per-(type, cents) HISTOGRAM
    — ≤ |types|·|distinct cents| rows, map-side combined — with a window
    scan over that tiny table, never a fact-sized sort; the fact table is
    then re-aggregated once against the broadcast cuts."""
    from pyspark.sql.window import Window

    events = load_table(spark, "events", sf_dir)
    vq = aggregates.value_units("value")
    h = (
        events.select("event_type", vq.alias("vq"))
        .groupBy("event_type", "vq")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wt = Window.partitionBy("event_type")
    hh = h.withColumn(
        "cum", F.sum("c").over(wt.orderBy("vq").rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("n", F.sum("c").over(wt))
    k_lo = F.expr("(n * 5 + 99) DIV 100")
    k_hi = F.expr("(n * 95 + 99) DIV 100")
    cuts = hh.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= k_lo, F.col("vq"))).alias("lo_q"),
        F.min(F.when(F.col("cum") >= k_hi, F.col("vq"))).alias("hi_q"),
    )
    kept = F.col("vq").between(F.col("lo_q"), F.col("hi_q"))
    return (
        events.select("event_type", vq.alias("vq"))
        .join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(kept.cast("long")).alias("n_kept"),
            aggregates.grid_avg(F.sum("vq"), F.count(F.lit(1))).alias("raw_mean"),
            aggregates.grid_avg(
                F.sum(F.when(kept, F.col("vq"))), F.sum(kept.cast("long"))
            ).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )


@register(
    "max_drawdown_per_user",
    oracle="""
    WITH c AS (
        SELECT user_id, ts, event_id,
               SUM(ROUND(value * 100, 0)) OVER w AS cum
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    ),
    d AS (
        SELECT user_id, cum,
               MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS peak
        FROM c
    )
    SELECT user_id,
           MAX(cum) / 100.0 AS peak_cum_value,
           MAX(peak - cum) / 100.0 AS max_drawdown
    FROM d GROUP BY user_id ORDER BY user_id
    """,
)
def max_drawdown_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each user's cumulative value series: the largest
    peak-to-trough drop, i.e. max over time of (running-peak − running-sum).
    The classic "needs a scan" financial metric, expressed entirely with
    keyed windows: one partition-by-user WindowExec pass computes the
    cumulative sum AND its running max (same sort order, shared window
    frame), then a hash aggregate takes the maxima — no recursion, no
    Python, parallel across users. Sums ride the integer-cents grid so
    cumulative order noise can't shift results between engines.

    (Here drawdown measures a streak of negative values; on a price-like
    series the same plan applies unchanged.)"""
    from pyspark.sql.window import Window

    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum(F.rint(F.col("value") * 100)).over(w)
    d = events.select("user_id", "ts", "event_id", cum.alias("cum")).withColumn(
        "peak", F.max("cum").over(w)
    )
    return (
        d.groupBy("user_id")
        .agg(
            (F.max("cum") / 100.0).alias("peak_cum_value"),
            (F.max(F.col("peak") - F.col("cum")) / 100.0).alias("max_drawdown"),
        )
        .orderBy("user_id")
    )


@register(
    "value_autocorr_lag1",
    oracle="""
    WITH l AS (
        SELECT event_type, value,
               LAG(value) OVER (PARTITION BY event_type ORDER BY ts, event_id)
                   AS lv
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(lv) AS BIGINT) AS n_pairs,
           ROUND(corr(value, lv), 6) AS autocorr_lag1
    FROM l GROUP BY event_type ORDER BY event_type
    """,
)
def value_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the value series per event type — the
    is-this-noise-or-a-process test (≈0 for i.i.d. readings; persistent
    positive values mean smoothing/windowed models will help, and that
    block bootstrap, not row bootstrap, is the right error bar). One keyed
    WindowExec pass for the lag, then corr — a decomposable aggregate —
    map-side combined to |types| rows. Both engines skip the per-key first
    row (null lag) by SQL corr semantics."""
    from pyspark.sql.window import Window

    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    l = events.select(
        "event_type", "value", F.lag("value").over(w).alias("lv")
    )
    return (
        l.groupBy("event_type")
        .agg(
            F.count("lv").alias("n_pairs"),
            F.round(F.corr("value", "lv"), 6).alias("autocorr_lag1"),
        )
        .orderBy("event_type")
    )


@register(
    "weekday_effect_by_type",
    oracle="""
    WITH g AS (
        SELECT event_type, dayofweek(ts) AS dow,
               COUNT(*) AS n, SUM(value) AS s, SUM(value * value) AS ss
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(SUM(n) AS BIGINT) AS n,
           ROUND((SUM(s * s / n) - SUM(s) * SUM(s) / SUM(n))
                 / (SUM(ss) - SUM(s) * SUM(s) / SUM(n)), 6) AS eta_sq
    FROM g GROUP BY event_type ORDER BY event_type
    """,
)
def weekday_effect_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality strength per event type as ANOVA eta²:
    between-weekday sum of squares over total sum of squares — ~0 when the
    weekday means are indistinguishable, →1 when the weekday alone predicts
    the value. Computed entirely from decomposable sums: ONE
    (type, weekday) partial aggregate (map-side combined, ≤7 rows per
    type), then pure arithmetic on that tiny table — the textbook
    two-level aggregation that replaces a per-group variance pass at
    100 TB."""
    events = load_table(spark, "events", sf_dir)
    g = (
        events.select(
            "event_type", F.dayofweek("ts").alias("dow"), "value"
        )
        .groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.sum(F.col("value") * F.col("value")).alias("ss"),
        )
    )
    ssb = F.sum(F.col("s") * F.col("s") / F.col("n")) - F.sum("s") * F.sum("s") / F.sum("n")
    sst = F.sum("ss") - F.sum("s") * F.sum("s") / F.sum("n")
    return (
        g.groupBy("event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.round(ssb / sst, 6).alias("eta_sq"),
        )
        .orderBy("event_type")
    )


@register(
    "dedup_edit_distance_blocked",
    oracle="""
    WITH d AS (SELECT doc_id, trim(text) AS t FROM documents),
    b AS (SELECT doc_id, t, substr(t, 1, 32) AS blk FROM d)
    SELECT a.doc_id AS id_a, bb.doc_id AS id_b,
           CAST(levenshtein(a.t, bb.t) AS BIGINT) AS edit_dist
    FROM b a JOIN b bb
      ON a.blk = bb.blk AND a.doc_id < bb.doc_id
    WHERE levenshtein(a.t, bb.t) <= 40
    ORDER BY id_a, id_b
    """,
)
def dedup_edit_distance_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by bounded edit distance with prefix blocking:
    only documents sharing their first 32 characters are compared, then
    Levenshtein (JVM built-in, O(len²) per pair) verifies within the
    block. Blocking is what makes edit distance usable at scale — the
    quadratic cost is confined to each block's candidates (the same
    prune-then-verify shape as MinHash→Jaccard, with a cheaper prune and a
    costlier verify); an all-pairs Levenshtein would be O(n²·len²). The
    equi-join on the block key is an ordinary shuffled hash join."""
    docs = load_table(spark, "documents", sf_dir)
    return dedup.edit_distance_pairs(
        docs, block_chars=32, max_dist=40
    ).orderBy("id_a", "id_b")


@register(
    "pricing_exact_decimal",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS DECIMAL(18,0)))
                AS BIGINT) AS sum_price_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS DECIMAL(18,0))
                    * CAST(100 - ROUND(l_discount * 100, 0) AS DECIMAL(18,0)))
                AS BIGINT) AS sum_disc_price_du,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def pricing_exact_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pricing summary on EXACT decimal arithmetic — what a financial
    close needs, where the double-based twin (pricing_summary) carries
    ~1e-10 summation noise. The 2dp source doubles become integer cents
    via a scale-0 round (the portable quantization — casting a double
    straight to DECIMAL(18,2) re-rounds at the representation boundary and
    engines disagree by a cent); all sums then run in integer decimal
    space, exact and order-independent. The ledger columns are emitted as
    exact integer units (cents, and 1e-4 discount-units) in BIGINT — the
    repo's cross-engine grid convention: a DECIMAL output column is the
    same driver-hash-serialization hazard class as DuckDB's SUM(int)
    HUGEINT widening (r04), so integer units cross the gate instead.
    Still one map-side-combined hash agg; decimal costs ~2-3x double
    arithmetic, the price of auditable-to-the-cent results."""
    li = load_table(spark, "lineitem", sf_dir)
    cents = F.rint(F.col("l_extendedprice") * 100).cast("decimal(18,0)")
    disc_c = (F.lit(100) - F.rint(F.col("l_discount") * 100)).cast("decimal(18,0)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents).cast("long").alias("sum_price_cents"),
            F.sum(cents * disc_c).cast("long").alias("sum_disc_price_du"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "debounce_events",
    oracle="""
    WITH l AS (
        SELECT event_type, user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN prev_ts IS NULL
                          OR epoch(ts) - epoch(prev_ts) > 5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN prev_ts IS NOT NULL
                          AND epoch(ts) - epoch(prev_ts) <= 5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_debounced
    FROM l GROUP BY event_type ORDER BY event_type
    """,
)
def debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce: within each (user, type) stream, an event
    arriving ≤5 s after the previous one is a bounce (double-click, retry,
    sensor chatter) and is dropped; the report counts kept vs debounced
    per type. Distinct from dedup (these are REAL distinct events arriving
    too fast) and from sessionization (the gap rule keeps the first of a
    burst rather than grouping it). One keyed WindowExec lag pass — the
    same shape runs streaming via the watermark-scoped dropDuplicates
    stage with a rounded-time key."""
    events = load_table(spark, "events", sf_dir)
    l = temporal.debounce(events).select("event_type", "keep")
    return (
        l.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.sum((~F.col("keep")).cast("long")).alias("n_debounced"),
        )
        .orderBy("event_type")
    )


@register(
    "revenue_rank_stability",
    oracle="""
    WITH h AS (SELECT MIN(o_orderdate)
                      + to_days(CAST(date_diff('day', MIN(o_orderdate),
                                               MAX(o_orderdate)) // 2 AS INT))
                   AS mid FROM orders),
    r1 AS (
        SELECT o_custkey, SUM(ROUND(o_totalprice * 100, 0)) AS rev1
        FROM orders, h WHERE o_orderdate < mid GROUP BY o_custkey
    ),
    r2 AS (
        SELECT o_custkey, SUM(ROUND(o_totalprice * 100, 0)) AS rev2
        FROM orders, h WHERE o_orderdate >= mid GROUP BY o_custkey
    ),
    top AS (
        SELECT o_custkey, rev1, rev2 FROM r1 JOIN r2 USING (o_custkey)
        ORDER BY rev1 DESC, o_custkey LIMIT 100
    ),
    pairs AS (
        SELECT CASE WHEN (a.rev1 - b.rev1) * (a.rev2 - b.rev2) > 0
                    THEN 1 ELSE 0 END AS conc
        FROM top a JOIN top b ON a.o_custkey < b.o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(conc) AS BIGINT) AS concordant,
           ROUND(2.0 * SUM(conc) / COUNT(*) - 1.0, 6) AS kendall_tau
    FROM pairs
    """,
)
def revenue_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the revenue leaderboard stable? Kendall tau-a between customers'
    first-half and second-half revenue orderings, over the top-100
    first-half customers — ~1 means the ranking persists, ~0 means churn.
    Concordance needs only RELATIVE order, so no global rank window ever
    runs: the top slice comes from orderBy+limit (TakeOrderedAndProject —
    parallel partial top-k, never a full sort) and pairs compare revenue
    differences directly. The quadratic pair join runs only on the k-row
    slice (k²/2 pairs regardless of corpus size — the standard way to make
    rank correlation feasible at 100 TB), broadcast to itself. Revenues
    ride the integer-cents grid so cross-engine sums tie exactly."""
    orders = load_table(spark, "orders", sf_dir)
    h = orders.agg(
        F.expr(
            "DATE_ADD(MIN(o_orderdate), "
            "CAST(DATEDIFF(MAX(o_orderdate), MIN(o_orderdate)) / 2 AS INT))"
        ).alias("mid")
    )
    cents = F.rint(F.col("o_totalprice") * 100)
    o = orders.join(F.broadcast(h))
    r1 = (
        o.filter(F.col("o_orderdate") < F.col("mid"))
        .groupBy("o_custkey")
        .agg(F.sum(cents).alias("rev1"))
    )
    r2 = (
        o.filter(F.col("o_orderdate") >= F.col("mid"))
        .groupBy("o_custkey")
        .agg(F.sum(cents).alias("rev2"))
    )
    top = (
        r1.join(r2, "o_custkey")
        .orderBy(F.desc("rev1"), "o_custkey")
        .limit(100)
        .localCheckpoint()
    )
    a, b = top.alias("a"), top.alias("b")
    conc = F.when(
        (F.col("a.rev1") - F.col("b.rev1")) * (F.col("a.rev2") - F.col("b.rev2")) > 0,
        1,
    ).otherwise(0)
    return (
        a.join(F.broadcast(b), F.col("a.o_custkey") < F.col("b.o_custkey"))
        .select(conc.alias("conc"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("conc").cast("long").alias("concordant"),
            F.round(2.0 * F.sum("conc") / F.count(F.lit(1)) - 1.0, 6).alias("kendall_tau"),
        )
    )


@register(
    "cusum_changepoint_by_type",
    oracle="""
    WITH base AS (
        SELECT event_type, ts, event_id,
               ROUND(value * 100, 0) AS vc
        FROM events
    ),
    tot AS (
        SELECT event_type, SUM(vc) AS s, COUNT(*) AS n
        FROM base GROUP BY event_type
    ),
    c AS (
        SELECT b.event_type, b.ts,
               SUM(b.vc) OVER w
                 - (ROW_NUMBER() OVER w) * (t.s / t.n) AS dev
        FROM base b JOIN tot t USING (event_type)
        WINDOW w AS (PARTITION BY b.event_type ORDER BY b.ts, b.event_id
                     ROWS UNBOUNDED PRECEDING)
    ),
    r AS (
        SELECT event_type, ts, ABS(dev) AS cusum,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ABS(dev) DESC, ts) AS rn
        FROM c
    )
    SELECT event_type,
           ROUND(cusum / 100.0, 4) AS max_cusum,
           ts AS changepoint_ts
    FROM r WHERE rn = 1 ORDER BY event_type
    """,
)
def cusum_changepoint_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per event type: the running sum of
    deviations from the series mean peaks (in absolute value) exactly
    where the level shifts — the classic Page/CUSUM statistic, with the
    argmax timestamp as the estimated change point. Values ride the
    integer-cents grid; the only non-integer term, row_number × mean, is
    the same IEEE product on both engines, so the argmax cannot flip.

    Shape: one tiny per-type totals aggregate broadcast back, then a
    single keyed WindowExec pass computes the cumulative deviation AND its
    per-type argmax rank (two window specs, same partition+sort — one
    shuffle, one sort). Per-type sequential work parallel across types;
    the documented mitigation for a mega-type is the two-phase prefix-sum
    split used by peak_concurrency."""
    from pyspark.sql.window import Window

    events = load_table(spark, "events", sf_dir)
    base = events.select(
        "event_type", "ts", "event_id", F.rint(F.col("value") * 100).alias("vc")
    )
    tot = base.groupBy("event_type").agg(
        F.sum("vc").alias("s"), F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = (
        base.join(F.broadcast(tot), "event_type")
        .withColumn(
            "dev",
            F.sum("vc").over(w)
            - F.row_number().over(Window.partitionBy("event_type").orderBy("ts", "event_id"))
            * (F.col("s") / F.col("n")),
        )
    )
    r = c.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.abs("dev").desc(), "ts")
        ),
    )
    return (
        r.filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.round(F.abs("dev") / 100.0, 4).alias("max_cusum"),
            F.col("ts").alias("changepoint_ts"),
        )
        .orderBy("event_type")
    )


@register(
    "hard_negatives_topk",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    scored AS (
        SELECT a.vec_id, a.label AS label_a, b.vec_id AS neighbor_id,
               b.label AS label_b,
               list_cosine_similarity(a.emb, b.emb) AS cos,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND(list_cosine_similarity(a.emb, b.emb)
                                                 * 10000, 0) DESC, b.vec_id) AS knn_rnk
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY ROUND(cos, 4) DESC, neighbor_id)
                      AS rnk
        FROM scored WHERE knn_rnk <= 25 AND label_a <> label_b
    )
    SELECT vec_id, neighbor_id AS negative_id,
           label_a AS anchor_label, label_b AS negative_label,
           ROUND(cos, 4) AS cosine
    FROM ranked WHERE rnk <= 2
    ORDER BY vec_id, rnk
    """,
)
def hard_negatives_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: each vector's top-2
    most-similar embeddings carrying a DIFFERENT label — the pairs that
    teach a metric model the most (easy negatives are already far away).
    Same block-tiled GEMM top-k as the kNN graph, with the cross-label
    filter applied BEFORE the per-anchor rank so a same-label near-dup
    can't crowd a true hard negative out of the k slots. Labels ride the
    broadcastable (id, label) projection; nothing new is quadratic.

    The 25-neighbor oversample bounds the work; it is exact as long as no
    anchor's top 25 neighbors are ALL same-label (true here — verified
    against the unbounded oracle; re-size the oversample for corpora with
    tighter label clustering)."""
    emb = load_table(spark, "embeddings", sf_dir)
    labels = emb.select("vec_id", "label")
    # oversample neighbors (k=25) so the cross-label filter still leaves ≥2
    # per anchor, then re-rank among negatives only
    from pyspark.sql.window import Window

    edges = similarity.knn_graph(emb, k=25)
    la = labels.select(F.col("vec_id"), F.col("label").alias("anchor_label"))
    lb = labels.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("negative_label")
    )
    neg = (
        edges.join(F.broadcast(la), "vec_id")
        .join(F.broadcast(lb), "neighbor_id")
        .filter(F.col("anchor_label") != F.col("negative_label"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        neg.withColumn("rnk2", F.row_number().over(w))
        .filter(F.col("rnk2") <= 2)
        .select(
            "vec_id",
            F.col("neighbor_id").alias("negative_id"),
            "anchor_label",
            "negative_label",
            "cosine",
        )
        .orderBy("vec_id", "rnk2")
    )


@register(
    "daily_activity_span",
    oracle="""
    WITH s AS (
        SELECT CAST(ts AS DATE) AS day, user_id,
               epoch(MAX(ts)) - epoch(MIN(ts)) AS span_s,
               COUNT(*) AS n_ev
        FROM events GROUP BY 1, 2
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_active_users,
           ROUND(AVG(span_s) / 60.0, 4) AS avg_active_minutes,
           ROUND(AVG(n_ev), 4) AS avg_events_per_user
    FROM s GROUP BY day ORDER BY day
    """,
)
def daily_activity_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily engagement profile: per active user-day, the first-to-last
    event span and event count, rolled up per day — the session-free
    activity feature (how long users stay engaged each day, how many touch
    the product). Two hash aggregates: the (day, user) grain is the only
    fact-sized shuffle (min/max/count all map-side combined); the day
    rollup is |days|-sized. Span arithmetic is exact integer seconds."""
    events = load_table(spark, "events", sf_dir)
    s = (
        events.groupBy(F.to_date("ts").alias("day"), "user_id")
        .agg(
            (F.max("ts").cast("double") - F.min("ts").cast("double")).alias("span_s"),
            F.count(F.lit(1)).alias("n_ev"),
        )
    )
    return (
        s.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active_users"),
            F.round(F.avg("span_s") / 60.0, 4).alias("avg_active_minutes"),
            F.round(F.avg("n_ev"), 4).alias("avg_events_per_user"),
        )
        .orderBy("day")
    )


@register(
    "rfm_segment_counts",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate),
                         (SELECT MAX(o_orderdate) FROM orders)) AS recency_d,
               COUNT(*) AS freq,
               SUM(ROUND(o_totalprice * 100, 0)) AS monetary_c
        FROM orders GROUP BY o_custkey
    ),
    cuts AS (
        SELECT quantile_cont(recency_d, 0.5) AS r_med,
               quantile_cont(freq, 0.5) AS f_med,
               quantile_cont(monetary_c, 0.5) AS m_med
        FROM rfm
    )
    SELECT CASE WHEN recency_d <= r_med THEN 'recent' ELSE 'lapsed' END AS r_seg,
           CASE WHEN freq > f_med THEN 'frequent' ELSE 'occasional' END AS f_seg,
           CASE WHEN monetary_c > m_med THEN 'high_value' ELSE 'low_value' END AS m_seg,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(monetary_c) / 100.0, 4) AS avg_monetary
    FROM rfm, cuts
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def rfm_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation, the marketing
    workhorse, built WITHOUT the global ntile sort: per-customer R/F/M from
    one orders aggregate, median cut points from an exact-percentile
    aggregate (a 1-row broadcast — the sanctioned shape), then segment
    assignment is a row-local CASE and the cell counts a tiny hash agg.
    At 100 TB the cut points swap to approx_percentile, same plan.
    Monetary rides integer cents; the recency anchor is the corpus max
    date so the result is replay-stable."""
    orders = load_table(spark, "orders", sf_dir)
    anchor = orders.agg(F.max("o_orderdate").alias("maxd"))
    rfm = (
        orders.join(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff(F.col("maxd"), F.col("o_orderdate"))).alias("recency_d"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.rint(F.col("o_totalprice") * 100)).alias("monetary_c"),
        )
    )
    cuts = rfm.agg(
        F.percentile("recency_d", F.lit(0.5)).alias("r_med"),
        F.percentile("freq", F.lit(0.5)).alias("f_med"),
        F.percentile("monetary_c", F.lit(0.5)).alias("m_med"),
    )
    seg = rfm.join(F.broadcast(cuts)).select(
        F.when(F.col("recency_d") <= F.col("r_med"), "recent")
        .otherwise("lapsed")
        .alias("r_seg"),
        F.when(F.col("freq") > F.col("f_med"), "frequent")
        .otherwise("occasional")
        .alias("f_seg"),
        F.when(F.col("monetary_c") > F.col("m_med"), "high_value")
        .otherwise("low_value")
        .alias("m_seg"),
        "monetary_c",
    )
    return (
        seg.groupBy("r_seg", "f_seg", "m_seg")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("monetary_c") / 100.0, 4).alias("avg_monetary"),
        )
        .orderBy("r_seg", "f_seg", "m_seg")
    )


@register(
    "discount_quantity_elasticity",
    oracle="""
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(l.l_quantity, l.l_discount), 6) AS qty_per_discount,
           ROUND(regr_r2(l.l_quantity, l.l_discount), 6) AS r2
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def discount_quantity_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does discounting move volume? Per-brand OLS slope of quantity on
    discount (the elasticity proxy every pricing team asks for) with fit
    quality. regr_slope/regr_r2 are decomposable sums-of-products, so the
    whole answer is the broadcast part-dim join plus ONE map-side-combined
    hash aggregate to |brands| rows — no per-brand regression loop."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    return (
        li.select(F.col("l_partkey").alias("p_partkey"), "l_quantity", "l_discount")
        .join(F.broadcast(part.select("p_partkey", "p_brand")), "p_partkey")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("regr_slope(l_quantity, l_discount)"), 6).alias(
                "qty_per_discount"
            ),
            F.round(F.expr("regr_r2(l_quantity, l_discount)"), 6).alias("r2"),
        )
        .orderBy("p_brand")
    )


@register(
    "supplier_hhi_by_nation",
    oracle="""
    WITH r AS (
        SELECT s.s_nationkey, l.l_suppkey,
               SUM(ROUND(l.l_extendedprice * 100, 0)) AS rev
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    )
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(SUM(rev) / 100.0, 2) AS total_revenue,
           ROUND(SUM(rev * rev) / (SUM(rev) * SUM(rev)), 6) AS hhi
    FROM r JOIN nation n ON n.n_nationkey = r.s_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def supplier_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue concentration per nation as the Herfindahl-
    Hirschman index: Σ share² = Σr² / (Σr)², →1/n for even markets, →1 for
    a monopoly supplier — the concentration twin of nation_revenue_gini
    (which measures inequality on the customer side with a rank sum; HHI
    needs no ranks at all). One (nation, supplier) revenue aggregate — the
    only fact-sized shuffle, map-side combined — then pure arithmetic on
    the supplier-sized table; nation names ride a broadcast. Revenues are
    exact integer cents; the squared sums stay under 2^53 at test scale
    and the documented 100 TB variant squares the (double) shares
    instead, which is scale-free."""
    li = load_table(spark, "lineitem", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    r = (
        li.select(F.col("l_suppkey").alias("s_suppkey"),
                  F.rint(F.col("l_extendedprice") * 100).alias("cents"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")), "s_suppkey")
        .groupBy("s_nationkey", "s_suppkey")
        .agg(F.sum("cents").alias("rev"))
    )
    return (
        r.join(
            F.broadcast(
                nation.select(F.col("n_nationkey").alias("s_nationkey"), "n_name")
            ),
            "s_nationkey",
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("rev") / 100.0, 2).alias("total_revenue"),
            F.round(
                F.sum(F.col("rev") * F.col("rev")) / (F.sum("rev") * F.sum("rev")), 6
            ).alias("hhi"),
        )
        .orderBy("n_name")
    )


@register(
    "first_touch_attribution",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id AS purchase_id, ts
        FROM events WHERE event_type = 'purchase'
    ),
    cand AS (
        SELECT p.purchase_id, e.event_type, e.ts, e.event_id,
               row_number() OVER (PARTITION BY p.purchase_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM p JOIN events e
          ON e.user_id = p.user_id
         AND e.ts >= p.ts - INTERVAL 1 HOUR
         AND e.ts < p.ts
         AND e.event_type IN ('click', 'view')
    )
    SELECT event_type AS first_touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM cand WHERE rn = 1
    GROUP BY 1 ORDER BY 1
    """,
)
def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each purchase is credited to the EARLIEST
    click/view in the preceding hour — the complement of the as-of join
    (asof_purchase_click credits the latest). The user-keyed equi-join
    with a time-band condition bounds fan-out to one user-hour of
    touchpoints per purchase; the per-purchase argmin is a keyed
    row_number window over that bounded candidate set. At 100 TB the same
    plan holds because both sides co-partition on user_id and the band
    keeps state linear in arrival rate."""
    from pyspark.sql.window import Window

    events = load_table(spark, "events", sf_dir)
    p = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    e = events.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "event_type", "ts", "event_id"
    )
    cand = p.join(e, "user_id").filter(
        (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("ts") < F.col("pts"))
    )
    w = Window.partitionBy("purchase_id").orderBy("ts", "event_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(F.col("event_type").alias("first_touch_type"))
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .orderBy("first_touch_type")
    )


@register(
    "customer_order_concentration",
    oracle="""
    WITH per AS (
        SELECT o_custkey,
               MAX(ROUND(o_totalprice * 100, 0)) AS top_c,
               SUM(ROUND(o_totalprice * 100, 0)) AS tot_c,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
    ),
    sh AS (
        SELECT o_custkey, n_orders, top_c / tot_c AS top_share FROM per
        WHERE n_orders >= 2
    )
    SELECT CAST(FLOOR(top_share * 10) AS INT) AS share_decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(AVG(n_orders), 4) AS avg_orders
    FROM sh GROUP BY 1 ORDER BY 1
    """,
)
def customer_order_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wallet concentration: what fraction of each multi-order customer's
    spend sits in their single largest order, histogrammed by decile —
    near 1/n means even spending, near 1.0 means one-big-purchase
    customers (a different risk segment). One customer-grain aggregate
    (max and sum are the same map-side-combined pass), a row-local share
    and bucket, then a 10-row histogram. Cents grid keeps the share's
    decile assignment engine-stable (an exact decile boundary would flip
    on float sum noise otherwise)."""
    orders = load_table(spark, "orders", sf_dir)
    cents = F.rint(F.col("o_totalprice") * 100)
    per = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(cents).alias("top_c"),
            F.sum(cents).alias("tot_c"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("n_orders") >= 2)
    )
    return (
        per.select(
            F.floor(F.col("top_c") / F.col("tot_c") * 10).cast("int").alias("share_decile"),
            "n_orders",
        )
        .groupBy("share_decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("n_orders"), 4).alias("avg_orders"),
        )
        .orderBy("share_decile")
    )


@register(
    "daily_new_vs_returning",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    f AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id)
    SELECT ud.day,
           CAST(SUM(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           CAST(SUM(CASE WHEN ud.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT)
               AS n_returning
    FROM ud JOIN f USING (user_id)
    GROUP BY ud.day ORDER BY ud.day
    """,
)
def daily_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The growth chart: daily active users split into first-ever-seen
    (new) vs returning — the first split any activation dashboard draws.
    Distinct (day, user) grain is the one fact-sized shuffle; first-seen
    days re-aggregate from that same grain (user-keyed, map-side
    combined) and join back co-partitioned on user_id. No window over the
    full history, so the plan is two hash aggs + one equi-join at any
    scale."""
    events = load_table(spark, "events", sf_dir)
    ud = events.select(F.to_date("ts").alias("day"), "user_id").distinct()
    f = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        ud.join(f, "user_id")
        .groupBy("day")
        .agg(
            F.sum((F.col("day") == F.col("first_day")).cast("long")).alias("n_new"),
            F.sum((F.col("day") > F.col("first_day")).cast("long")).alias(
                "n_returning"
            ),
        )
        .orderBy("day")
    )


@register(
    "nation_trade_balance",
    oracle="""
    WITH supply AS (
        SELECT s.s_nationkey AS nk,
               SUM(ROUND(l.l_extendedprice * 100, 0)) AS sell_c
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1
    ),
    demand AS (
        SELECT c.c_nationkey AS nk,
               SUM(ROUND(o.o_totalprice * 100, 0)) AS buy_c
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    )
    SELECT n.n_name,
           ROUND(COALESCE(sell_c, 0) / 100.0, 2) AS supply_revenue,
           ROUND(COALESCE(buy_c, 0) / 100.0, 2) AS demand_spend,
           ROUND((COALESCE(sell_c, 0) - COALESCE(buy_c, 0)) / 100.0, 2)
               AS trade_balance
    FROM nation n
    LEFT JOIN supply ON supply.nk = n.n_nationkey
    LEFT JOIN demand ON demand.nk = n.n_nationkey
    ORDER BY n.n_name
    """,
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation trade balance: revenue its suppliers sell vs what its
    customers spend — the two fact aggregates every geo BI page overlays.
    Each side is one broadcast-dim join + hash agg to |nations| rows; the
    final three-way combine is all broadcast-sized. Cents grid keeps both
    sums exact; nations missing a side coalesce to zero rather than drop
    (LEFT joins from the dim)."""
    li = load_table(spark, "lineitem", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    supply = (
        li.select(F.col("l_suppkey").alias("s_suppkey"),
                  F.rint(F.col("l_extendedprice") * 100).alias("c"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")), "s_suppkey")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.sum("c").alias("sell_c"))
    )
    demand = (
        orders.select(F.col("o_custkey").alias("c_custkey"),
                      F.rint(F.col("o_totalprice") * 100).alias("c"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")), "c_custkey")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.sum("c").alias("buy_c"))
    )
    n = nation.select(F.col("n_nationkey").alias("nk"), "n_name")
    return (
        n.join(F.broadcast(supply), "nk", "left")
        .join(F.broadcast(demand), "nk", "left")
        .select(
            "n_name",
            F.round(F.coalesce("sell_c", F.lit(0)) / 100.0, 2).alias("supply_revenue"),
            F.round(F.coalesce("buy_c", F.lit(0)) / 100.0, 2).alias("demand_spend"),
            F.round(
                (F.coalesce("sell_c", F.lit(0)) - F.coalesce("buy_c", F.lit(0))) / 100.0,
                2,
            ).alias("trade_balance"),
        )
        .orderBy("n_name")
    )


@register(
    "part_price_dispersion",
    oracle="""
    WITH u AS (
        SELECT l_partkey, l_extendedprice / l_quantity AS unit_price
        FROM lineitem WHERE l_quantity > 0
    ),
    d AS (
        SELECT l_partkey,
               COUNT(*) AS n_lines,
               AVG(unit_price) AS mean_up,
               stddev_samp(unit_price) AS sd_up
        FROM u GROUP BY l_partkey
        HAVING COUNT(*) >= 8
    )
    SELECT p.p_brand, d.l_partkey AS partkey,
           CAST(d.n_lines AS BIGINT) AS n_lines,
           ROUND(d.mean_up, 4) AS mean_unit_price,
           ROUND(d.sd_up / d.mean_up, 6) AS price_cv
    FROM d JOIN part p ON p.p_partkey = d.l_partkey
    ORDER BY price_cv DESC, partkey
    LIMIT 20
    """,
)
def part_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-consistency audit: the 20 parts whose realized unit price
    (extended price / quantity) varies most across order lines, as a
    coefficient of variation — high CV flags discount leakage or data
    errors on that SKU. One part-keyed hash aggregate (count/avg/stddev
    all decomposable, map-side combined), brand attached by broadcast,
    TakeOrdered for the top slice. The HAVING floor keeps small-n noise
    out of the ranking."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    u = li.filter(F.col("l_quantity") > 0).select(
        "l_partkey", (F.col("l_extendedprice") / F.col("l_quantity")).alias("up")
    )
    d = (
        u.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.avg("up").alias("mean_up"),
            F.stddev_samp("up").alias("sd_up"),
        )
        .filter(F.col("n_lines") >= 8)
    )
    return (
        d.join(
            F.broadcast(part.select(F.col("p_partkey").alias("l_partkey"), "p_brand")),
            "l_partkey",
        )
        .select(
            "p_brand",
            F.col("l_partkey").alias("partkey"),
            F.col("n_lines").cast("long").alias("n_lines"),
            F.round("mean_up", 4).alias("mean_unit_price"),
            F.round(F.col("sd_up") / F.col("mean_up"), 6).alias("price_cv"),
        )
        .orderBy(F.col("price_cv").desc(), "partkey")
        .limit(20)
    )


@register(
    "streaming_batch_parity_audit",
    oracle="""
    WITH w AS (
        SELECT time_bucket(INTERVAL '1 minute', ts) AS window_start,
               event_type,
               COUNT(*) AS reading_count
        FROM events GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(0 AS BIGINT) AS n_mismatches
    FROM w
    """,
)
def streaming_batch_parity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine auditing itself: run the real micro-batch pipeline
    (parse → watermark → 1-min window agg → update-mode sink → latest
    state), compute the same aggregate as a batch query, and anti-join the
    two INSIDE the engine — the output row claims how many windows exist
    and that zero disagree, and the oracle independently recomputes the
    window count so a silent divergence (or an empty sink) fails the
    hash. This is the Lambda-architecture reconciliation job expressed as
    one query: at 100 TB you run exactly this to certify a streaming
    sink's backfill against the batch path, and both sides here are the
    engine's own operators (no driver-side comparison)."""
    import tempfile

    from kafkasparkstream_spark.sources.streams import file_json_stream
    from kafkasparkstream_spark.streaming.pipeline import PipelineConfig, start_pipeline
    from kafkasparkstream_spark.streaming.sinks import latest_state

    events = load_table(spark, "events", sf_dir)
    workdir = _stream_workdir("kss_parity_")
    src, sink, ckpt = f"{workdir}/src", f"{workdir}/sink", f"{workdir}/ckpt"
    _events_to_wire(events, src)
    cfg = PipelineConfig(
        dims=("event_type",),
        ts_col="ts",
        value_col="value",
        battery_col=None,
        schema=EVENT_WIRE_SCHEMA,
    )
    raw = file_json_stream(spark, src, max_files_per_trigger=None)
    with _clamped_shuffle_partitions(spark):
        agg_q, raw_q = start_pipeline(raw, sink, ckpt, cfg, available_now=True)
        agg_q.awaitTermination()
        raw_q.awaitTermination()

    streamed = latest_state(
        spark.read.parquet(f"{sink}/sensor_aggregates"),
        ("window_start", "window_end", "event_type"),
    ).select(
        "window_start",
        "event_type",
        F.col("avg_value").alias("s_avg"),
        F.col("reading_count").cast("long").alias("s_count"),
    )
    batch = (
        events.groupBy(
            F.window("ts", "1 minute").alias("w"), "event_type"
        )
        .agg(
            F.sum(aggregates.value_units("value")).alias("_sc"),
            F.count(F.lit(1)).alias("b_count"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            aggregates.grid_avg(F.col("_sc"), F.col("b_count")).alias("b_avg"),
            "b_count",
        )
    )
    # Keyed full-outer reconciliation. Both paths now derive the average
    # from the exact integer-cents sum (identical IEEE ops on identical
    # integers), so equality is exact; the 1e-9 tolerance is a belt for
    # future non-grid aggregates, not a requirement of this pair.
    j = batch.join(streamed, ["window_start", "event_type"], "full_outer")
    mismatch = (
        F.col("b_count").isNull()
        | F.col("s_count").isNull()
        | (F.col("b_count") != F.col("s_count"))
        | (F.abs(F.col("b_avg") - F.col("s_avg")) > 1e-9)
    )
    return batch.agg(
        F.count(F.lit(1)).alias("n_windows")
    ).join(
        F.broadcast(
            j.agg(
                F.sum(mismatch.cast("long")).alias("n_mismatches")
            ).select(F.coalesce("n_mismatches", F.lit(0)).alias("n_mismatches"))
        )
    )


@register(
    "monthly_revenue_trend",
    oracle="""
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               SUM(ROUND(o_totalprice * 100, 0)) AS rev_c,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT month,
           CAST(n_orders AS BIGINT) AS n_orders,
           ROUND(rev_c / 100.0, 2) AS revenue,
           COALESCE(ROUND((rev_c - LAG(rev_c) OVER (ORDER BY month))
                 / LAG(rev_c) OVER (ORDER BY month), 6), 0.0) AS mom_growth
    FROM m ORDER BY month
    """,
)
def monthly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with month-over-month growth — the first chart on
    any revenue dashboard. The fact scan reduces straight to |months| rows
    (map-side combined, cents-exact); the growth lag is a window over that
    tiny table, so the 'global' sort orders ~a hundred rows, not the fact
    stream. The first month's undefined growth reads 0.0 on both sides
    (the driver's value-hash cannot order NULLs against floats)."""
    from pyspark.sql.window import Window

    orders = load_table(spark, "orders", sf_dir)
    m = (
        orders.groupBy(F.trunc("o_orderdate", "month").alias("month"))
        .agg(
            F.sum(F.rint(F.col("o_totalprice") * 100)).alias("rev_c"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.orderBy("month")
    prev = F.lag("rev_c").over(w)
    return (
        m.select(
            "month",
            F.col("n_orders").cast("long").alias("n_orders"),
            F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
            F.coalesce(
                F.round((F.col("rev_c") - prev) / prev, 6), F.lit(0.0)
            ).alias("mom_growth"),
        )
        .orderBy("month")
    )


@register(
    "dow_hour_heatmap",
    oracle="""
    SELECT dayofweek(ts) AS dow, hour(ts) AS hr,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (), 6) AS share
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The traffic heatmap: event counts per (weekday, hour) cell with
    corpus share — the capacity-planning view (when to schedule
    compaction, when spikes land). One hash aggregate to ≤168 cells; the
    share denominator is a window over that fixed-size output. Weekday
    numbering differs across engines (Spark Sun=1, DuckDB Sun=0) so the
    Spark side emits dayofweek-1 to match the oracle's labels."""
    events = load_table(spark, "events", sf_dir)
    g = (
        events.select(
            (F.dayofweek("ts") - 1).alias("dow"), F.hour("ts").alias("hr")
        )
        .groupBy("dow", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql.window import Window

    return (
        g.select(
            "dow",
            "hr",
            "n",
            F.round(F.col("n") / F.sum("n").over(Window.partitionBy()), 6).alias(
                "share"
            ),
        )
        .orderBy("dow", "hr")
    )


# ---------------------------------------------------------------------------
# Round-6 depth: DSIR importance resampling, CCNet perplexity buckets,
# curriculum ordering, static mixture planning, PQ codebook seeding, BPE
# merge training, and perceptual image dedup — the remaining standard
# stations of a pretraining-data pipeline.
# ---------------------------------------------------------------------------


@register(
    "dsir_importance_weights",
    oracle="""
    WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS toks
               FROM documents),
    b AS (SELECT doc_id, lang,
                 unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                        i -> toks[i] || ' ' || toks[i+1])) AS g
          FROM t),
    tf AS (SELECT doc_id, g, COUNT(*) AS c,
                  MAX(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS is_t
           FROM b GROUP BY doc_id, g),
    vocab AS (SELECT g, SUM(c) AS rc,
                     SUM(CASE WHEN is_t = 1 THEN c ELSE 0 END) AS tc
              FROM tf GROUP BY g),
    tot AS (SELECT CAST(SUM(rc) AS DOUBLE) AS R, CAST(SUM(tc) AS DOUBLE) AS T,
                   CAST(COUNT(*) AS DOUBLE) AS V
            FROM vocab)
    SELECT doc_id,
           ROUND(SUM(c * (LOG2((tc + 1) / (T + V)) - LOG2((rc + 1) / (R + V))))
                 / SUM(c), 4) + 0.0 AS dsir_weight,
           CAST(SUM(c) AS BIGINT) AS n_bigrams
    FROM tf JOIN vocab USING (g) CROSS JOIN tot
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) per-document importance weights under
    hashed-bigram models — target = the corpus's English slice, raw = the
    whole corpus; see operators/text.py:dsir_importance for the plan."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.dsir_importance(docs, target_lang="en")


@register(
    "perplexity_buckets_ccnet",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
                 FROM documents),
    tf AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    vocab AS (SELECT tok, SUM(c) AS vc FROM tf GROUP BY 1),
    tot AS (SELECT CAST(SUM(vc) AS DOUBLE) AS n FROM vocab),
    scored AS (SELECT doc_id, ROUND(SUM(c * LOG2(vc / n)) / SUM(c), 4) AS lp,
                      SUM(c) AS n_tokens
               FROM tf JOIN vocab USING (tok) CROSS JOIN tot GROUP BY doc_id),
    lab AS (SELECT s.doc_id, d.lang, s.lp, s.n_tokens,
                   ntile(3) OVER (PARTITION BY d.lang
                                  ORDER BY s.lp DESC, s.doc_id) AS t
            FROM scored s JOIN documents d USING (doc_id))
    SELECT lang,
           CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
           COUNT(*) AS n_docs,
           MIN(lp) AS min_logprob,
           MAX(lp) AS max_logprob,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM lab GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def perplexity_buckets_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail per-language perplexity terciles under
    the corpus's own unigram LM (operators/text.py:perplexity_buckets)."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.perplexity_buckets(docs)


@register(
    "curriculum_difficulty_deciles",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
               FROM documents),
    d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(len(toks) AS BIGINT)
                   * CAST(len(list_distinct(toks)) AS BIGINT) AS difficulty
          FROM t),
    n AS (SELECT *, ntile(10) OVER (ORDER BY difficulty, doc_id) AS decile FROM d)
    SELECT decile, COUNT(*) AS n_docs,
           MIN(difficulty) AS min_difficulty,
           MAX(difficulty) AS max_difficulty,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 4) AS avg_tokens
    FROM n GROUP BY 1 ORDER BY 1
    """,
)
def curriculum_difficulty_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact difficulty deciles (token count x distinct tokens) for
    curriculum scheduling (operators/text.py:curriculum_difficulty_deciles)."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.curriculum_difficulty_deciles(docs)


@register(
    "mixture_epochs_plan",
    oracle="""
    WITH d AS (SELECT source,
                      CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tok,
                      (lang = 'en') AS is_t
               FROM documents),
    s AS (SELECT source, SUM(n_tok) AS src_tokens,
                 SUM(CASE WHEN is_t THEN n_tok ELSE 0 END) AS lang_tokens
          FROM d GROUP BY source),
    t AS (SELECT SUM(src_tokens) AS total_tokens, SUM(lang_tokens) AS total_lang
          FROM s)
    SELECT source,
           CAST(src_tokens AS BIGINT) AS src_tokens,
           CAST(lang_tokens AS BIGINT) AS lang_tokens,
           CAST(CASE WHEN total_lang = 0 THEN 0
                     ELSE lang_tokens * 10000 // total_lang END
                AS BIGINT) AS weight_bp,
           CAST(CASE WHEN total_lang = 0 THEN 0
                     ELSE (total_tokens * 2) * (lang_tokens * 10000 // total_lang) // 10000 END
                AS BIGINT) AS planned_tokens,
           CAST(CASE WHEN total_lang = 0 THEN 0
                     ELSE ((total_tokens * 2) * (lang_tokens * 10000 // total_lang) // 10000)
                          * 1000 // src_tokens END
                AS BIGINT) AS epochs_milli
    FROM s CROSS JOIN t ORDER BY source
    """,
)
def mixture_epochs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style static mixture plan in exact BIGINT arithmetic
    (operators/sampling.py:mixture_epochs_plan)."""
    docs = load_table(spark, "documents", sf_dir)
    return sampling.mixture_epochs_plan(docs, budget_multiple=2)


@register(
    "pq_codebook_distortion",
    oracle="""
    WITH c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
                      embedding AS cemb
               FROM (SELECT vec_id, embedding FROM embeddings
                     ORDER BY vec_id LIMIT 16)),
    p AS (SELECT e.vec_id, CAST(ss.s AS INT) AS subspace, c.cid,
                 list_sum(list_transform(range(1, 17),
                   i -> (CAST(e.embedding[CAST(ss.s * 16 + i AS INT)] AS DOUBLE)
                         - CAST(c.cemb[CAST(ss.s * 16 + i AS INT)] AS DOUBLE)) ^ 2))
                 AS d2
          FROM embeddings e CROSS JOIN range(0, 4) ss(s) CROSS JOIN c),
    a AS (SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
                                       ORDER BY ROUND(d2, 6), cid) AS rn
          FROM p)
    SELECT subspace, cid AS centroid, COUNT(*) AS n_assigned,
           CAST(SUM(CAST(ROUND(ROUND(d2, 6) * 1000000, 0) AS BIGINT)) AS BIGINT)
               AS distortion_micro
    FROM a WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def pq_codebook_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook seeding report: 4 subspaces x 16
    codewords (the 16 lowest-vec_id vectors), per-codeword assignment
    counts and integer-exact squared-error distortion
    (operators/similarity.py:pq_distortion)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return similarity.pq_distortion(emb, n_subspaces=4, n_centroids=16, dim=64)


def _bpe_oracle_ctes(merges: int = 8) -> str:
    """Unrolled-CTE SQL twin of bpe_train_merges — the pagerank technique
    applied to BPE (round-7 close of the no_oracle rows): each round is a
    pair-count aggregate + deterministic argmax (cnt DESC, pair ASC) + a
    merge applied via string REPLACE over a space-armored symbol encoding.

    Encoding: a word's symbols are joined as ``' ' || join(syms, '  ')
    || ' '`` — every symbol carries exactly one space on each side, so the
    pattern ``' x  y '`` matches precisely adjacent symbol pairs, and SQL
    REPLACE's simultaneous left-to-right non-overlapping scan reproduces
    the greedy leftmost-first BPE fold exactly (on 'aaa' with rule (a,a):
    '␣a␣␣a␣␣a␣' → '␣aa␣␣a␣' = [aa, a], matching the Spark fold).
    ``[\\s\\S]`` (not '.') char-splits words that contain embedded
    tabs/newlines; the coalesce guards DuckDB's array_to_string([]) → NULL
    on the degenerate empty token."""
    parts = [
        """
    WITH w0 AS (
        SELECT ' ' || coalesce(array_to_string(regexp_extract_all(w, '[\\s\\S]'), '  '), '') || ' ' AS s,
               CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split_regex(trim(text), ' +')) AS w
              FROM documents)
        GROUP BY 1
    )"""
    ]
    for r in range(1, merges + 1):
        parts.append(f""",
    p{r} AS (
        SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
            SELECT freq,
                   unnest(list_transform(range(1, len(syms)),
                                         i -> syms[i] || ' ' || syms[i+1])) AS pair
            FROM (SELECT string_split(trim(s), '  ') AS syms, freq FROM w{r-1})
        ) GROUP BY pair
    ),
    t{r} AS (SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair ASC LIMIT 1),
    w{r} AS (
        SELECT replace(s,
                       ' ' || split_part(pair, ' ', 1) || '  ' || split_part(pair, ' ', 2) || ' ',
                       ' ' || split_part(pair, ' ', 1) || split_part(pair, ' ', 2) || ' ') AS s,
               freq
        FROM w{r-1}, t{r}
    )""")
    return "".join(parts)


def _bpe_merge_oracle_sql(merges: int = 8) -> str:
    arms = "\n        UNION ALL\n".join(
        f"""        SELECT CAST({r} AS INT) AS rank, split_part(pair,' ',1) AS "left",
               split_part(pair,' ',2) AS "right", cnt AS pair_count FROM t{r}"""
        for r in range(1, merges + 1)
    )
    return f"""{_bpe_oracle_ctes(merges)}
    SELECT * FROM (
{arms}
    ) ORDER BY rank"""


@register("bpe_merge_table", oracle=_bpe_merge_oracle_sql(8))
def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge training (8 rounds) over the corpus's word-type
    frequency table. HASH-GATED since round 7: the oracle unrolls all 8
    pair-count→argmax→merge rounds in SQL (see _bpe_oracle_ctes), so the
    full deterministic tie-broken merge sequence is cross-engine verified,
    not just rows-counted; the greedy-fold merge semantics are additionally
    pinned by unit tests (operators/text.py:bpe_train_merges)."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.bpe_train_merges(docs, merges=8)


@register(
    "image_dhash_dedup",
    oracle="""
    WITH a AS (SELECT sha256(sha256(text)) AS sig FROM documents),
    g AS (SELECT sig, COUNT(*) AS n FROM a GROUP BY sig)
    SELECT CAST(SUM(n) AS BIGINT) AS n_assets,
           COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
           CAST(MAX(n) AS BIGINT) AS max_group,
           CAST(0 AS BIGINT) AS n_decoded
    FROM g
    """,
)
def image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup over the asset table: per-asset 64-bit dHash
    (real pixel path for decodable payloads, sha-prefix fallback for the
    synthetic digest payloads — so the oracle mirrors the grouping in hash
    space), rolled up to corpus dup-group stats
    (operators/multimodal.py:image_dhash_dedup). The pixel path's dHash is
    pinned against a pure-Python reference in tests/test_multimodal.py."""
    return multimodal.image_dhash_dedup(_doc_assets(spark, sf_dir))


def _logreg_oracle_sql(iterations: int, lr: float) -> str:
    """Unrolled-CTE twin of operators/text.py:quality_logreg_fit (same
    technique as _pagerank_oracle_sql: scalar weight CTE per iteration)."""
    z = "(w0 + w1*x1 + w2*x2 + w3*x3)"
    p = f"1/(1+EXP(-{z}))"
    sw = "['the','a','of','and','is','to','in','that']"
    parts = [f"""
    WITH t AS (SELECT string_split_regex(trim(text), ' +') AS toks, lang
               FROM documents),
    f AS (SELECT LEAST(len(toks), 128) / 128.0 AS x1,
                 len(list_distinct(toks)) / len(toks) AS x2,
                 len(list_filter(toks, tk -> list_contains({sw}, tk)))
                   / len(toks) AS x3,
                 CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
          FROM t),
    i0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"""]
    for k in range(1, iterations + 1):
        parts.append(f""",
    g{k} AS (SELECT AVG({p} - y) AS g0, AVG(({p} - y) * x1) AS g1,
                    AVG(({p} - y) * x2) AS g2, AVG(({p} - y) * x3) AS g3
             FROM f CROSS JOIN i{k-1}),
    i{k} AS (SELECT w0 - {lr} * g0 AS w0, w1 - {lr} * g1 AS w1,
                    w2 - {lr} * g2 AS w2, w3 - {lr} * g3 AS w3
             FROM i{k-1} CROSS JOIN g{k})""")
    parts.append(f"""
    SELECT CAST({iterations} AS INT) AS iterations,
           ROUND(w0, 4) + 0.0 AS w0, ROUND(w1, 4) + 0.0 AS w1,
           ROUND(w2, 4) + 0.0 AS w2, ROUND(w3, 4) + 0.0 AS w3,
           (SELECT ROUND(AVG(-(y * LN(pp) + (1 - y) * LN(1 - pp))), 4) + 0.0
            FROM (SELECT y, {p} AS pp FROM f CROSS JOIN i{iterations}) q)
               AS log_loss
    FROM i{iterations}
    """)
    return "".join(parts)


@register("quality_logreg_fit", oracle=_logreg_oracle_sql(5, 1.0))
def quality_logreg_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed full-batch GD for a fastText-style quality/language
    classifier: 5 iterations, each one corpus-wide gradient aggregate and a
    1-row driver pull; oracle is the unrolled-CTE twin
    (operators/text.py:quality_logreg_fit)."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.quality_logreg_fit(docs, iterations=5, lr=1.0)


@register(
    "media_probe_inventory",
    oracle="""
    WITH a AS (SELECT doc_id AS i, doc_id % 4 AS sel FROM documents),
    k AS (SELECT CASE sel WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
                          WHEN 2 THEN 'mp3' ELSE 'flac' END AS kind,
                 CASE sel WHEN 0 THEN (8 + i % 8) * 8
                          WHEN 1 THEN 100 + i % 50
                          WHEN 2 THEN (2 + i % 3) * 1152
                          ELSE 64 + i % 32 END AS n_units,
                 CASE sel WHEN 1 THEN (100 + i % 50) * 1000 // 16000
                          WHEN 2 THEN ((2 + i % 3) * 1152) * 1000 // 44100
                          WHEN 3 THEN (64 + i % 32) * 1000 // 16000
                          ELSE 0 END AS duration_ms,
                 CASE sel WHEN 1 THEN 16000 WHEN 2 THEN 44100
                          WHEN 3 THEN 16000 ELSE 0 END AS sample_rate
          FROM a)
    SELECT kind, COUNT(*) AS n_assets,
           CAST(SUM(n_units) AS BIGINT) AS sum_units,
           CAST(SUM(duration_ms) AS BIGINT) AS sum_duration_ms,
           CAST(MAX(sample_rate) AS INT) AS max_sample_rate
    FROM k GROUP BY kind ORDER BY kind
    """,
)
def media_probe_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec round-trip inside the correctness gate: per document a
    deterministic media fixture is ENCODED by the stdlib codecs
    (PNG / WAV / MPEG-1-Layer-III / FLAC by doc_id % 4), then header-probed
    by multimodal.media_probe, and the per-kind inventory (asset counts,
    decoded unit sums, durations, rates) must match the oracle's closed-form
    arithmetic on doc_id — any bit drift in encoder or parser breaks the
    hash. Two Arrow kernels back-to-back; everything else is one 4-row
    aggregate."""
    docs = load_table(spark, "documents", sf_dir)
    probed = multimodal.media_probe(multimodal.synthesize_media_assets(docs))
    return (
        probed.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_units").alias("sum_units"),
            F.sum("duration_ms").alias("sum_duration_ms"),
            F.max("sample_rate").alias("max_sample_rate"),
        )
        .orderBy("kind")
    )


@register(
    "exact_substring_dedup",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
               FROM documents),
    g0 AS (SELECT doc_id,
                  unnest(list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
                         i -> struct_pack(s := i - 1,
                              gram := toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                      AS u
           FROM t),
    g AS (SELECT doc_id, u.s AS s, u.gram AS gram FROM g0),
    d AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
    sd AS (SELECT doc_id, list(s ORDER BY s) AS starts
           FROM g JOIN d USING (gram) GROUP BY doc_id),
    c AS (SELECT t.doc_id, toks, coalesce(starts, []) AS starts
          FROM t LEFT JOIN sd USING (doc_id)),
    k AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                 list_filter(list_transform(range(1, len(toks) + 1), i -> CASE
                   WHEN len(list_filter(starts,
                            s -> s <= i - 1 AND s > i - 1 - 3)) = 0
                   THEN toks[i] END), x -> x IS NOT NULL) AS kept
          FROM c)
    SELECT doc_id, n_tokens,
           CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
           md5(coalesce(array_to_string(kept, ' '), '')) AS cleaned_md5
    FROM k ORDER BY doc_id
    """,
)
def exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplicate-text-datasets-style exact substring removal (Lee et al.
    2022): every token span whose 3-gram occurs >= 2 times corpus-wide is
    deleted, and the oracle hash-matches the md5 of each RECONSTRUCTED
    document — reconstruction parity, not just counts
    (operators/text.py:remove_duplicated_spans)."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.remove_duplicated_spans(docs, n=3)


def _bpe_encode_oracle_sql(merges: int = 8) -> str:
    """Full SQL twin of bpe_encode_stats: train the 8 merge rules with the
    unrolled CTEs, then ENCODE every distinct word type by replaying the
    learned replaces in rank order and roll up per-language fertility."""
    enc = []
    for r in range(1, merges + 1):
        # LEFT JOIN ON TRUE (not a comma cross join): if the corpus
        # exhausts mergeable pairs before round r, t{r} is EMPTY and a
        # cross join would empty the whole encode chain — Spark's trainer
        # breaks early but still encodes with the rules it learned, so the
        # oracle must pass rows through unmerged when t{r} has no row.
        enc.append(f""",
    enc{r} AS (
        SELECT tok,
               CASE WHEN pair IS NULL THEN s
                    ELSE replace(s,
                                 ' ' || split_part(pair, ' ', 1) || '  ' || split_part(pair, ' ', 2) || ' ',
                                 ' ' || split_part(pair, ' ', 1) || split_part(pair, ' ', 2) || ' ')
               END AS s
        FROM enc{r-1} LEFT JOIN t{r} ON TRUE
    )""")
    return f"""{_bpe_oracle_ctes(merges)},
    tl AS (
        SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT lang, unnest(string_split_regex(trim(text), ' +')) AS tok
              FROM documents)
        GROUP BY 1, 2
    ),
    enc0 AS (
        SELECT tok,
               ' ' || coalesce(array_to_string(regexp_extract_all(tok, '[\\s\\S]'), '  '), '') || ' ' AS s
        FROM (SELECT DISTINCT tok FROM tl)
    ){"".join(enc)},
    bl AS (SELECT tok, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS bpe_len
           FROM enc{merges})
    SELECT lang,
           CAST(SUM(cnt) AS BIGINT) AS ws_tokens,
           CAST(SUM(cnt * bpe_len) AS BIGINT) AS bpe_tokens,
           CAST(SUM(cnt * length(tok)) AS BIGINT) AS n_chars,
           ROUND(CAST(SUM(cnt * bpe_len) AS DOUBLE) / SUM(cnt), 4) AS symbols_per_word
    FROM tl JOIN bl USING (tok)
    GROUP BY lang ORDER BY lang"""


@register("bpe_encode_stats", oracle=_bpe_encode_oracle_sql(8))
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility under the corpus's own learned BPE (8 merges):
    per-language whitespace-token / BPE-symbol / character counts and
    symbols-per-word. HASH-GATED since round 7: the oracle unrolls the
    whole train+encode pipeline in SQL (_bpe_encode_oracle_sql), so the
    fertility numbers are cross-engine verified end-to-end; the merge-fold
    semantics are additionally reference-pinned in tests
    (operators/text.py:bpe_encode_stats)."""
    docs = load_table(spark, "documents", sf_dir)
    return text_ops.bpe_encode_stats(docs, merges=8)


@register(
    "ann_lsh_multiprobe_topk",
    oracle="""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               (CASE WHEN embedding[1] > 0 THEN '1' ELSE '0' END ||
                CASE WHEN embedding[2] > 0 THEN '1' ELSE '0' END ||
                CASE WHEN embedding[3] > 0 THEN '1' ELSE '0' END ||
                CASE WHEN embedding[4] > 0 THEN '1' ELSE '0' END) AS bucket
        FROM embeddings
    ),
    q0 AS (SELECT vec_id AS query_id, emb AS q_emb, bucket FROM e
           WHERE vec_id < 10),
    q AS (SELECT query_id, q_emb,
                 unnest([bucket,
                         (CASE WHEN bucket[1] = '1' THEN '0' ELSE '1' END) || bucket[2:4],
                         bucket[1] || (CASE WHEN bucket[2] = '1' THEN '0' ELSE '1' END) || bucket[3:4],
                         bucket[1:2] || (CASE WHEN bucket[3] = '1' THEN '0' ELSE '1' END) || bucket[4],
                         bucket[1:3] || (CASE WHEN bucket[4] = '1' THEN '0' ELSE '1' END)])
                     AS bucket
          FROM q0),
    scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(q_emb, e.emb) AS cos
        FROM q JOIN e ON q.bucket = e.bucket AND e.vec_id <> query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rnk
        FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(cos, 4) AS cosine, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 10
    ORDER BY query_id, rnk
    """,
)
def ann_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH top-10: own bucket + every Hamming-1 bucket —
    the Lv et al. 2007 recall/candidate trade on the same index
    (operators/similarity.py:lsh_multiprobe_topk)."""
    df = similarity.lsh_multiprobe_topk(load_table(spark, "embeddings", sf_dir))
    return df.withColumn("rnk", F.col("rnk").cast("int"))


def _ann_recall_oracle_sql() -> str:
    """Recall oracle composed from the existing ANN oracles: the
    exact-cosine top-10 is ground truth; each approximate method's top-10
    is intersected with it per query."""
    ex = ORACLE_SQL["ann_cosine_topk"]
    methods = {
        "ivf": ORACLE_SQL["ann_ivf_topk"],
        "lsh": ORACLE_SQL["ann_lsh_topk"],
        "lsh_multiprobe": ORACLE_SQL["ann_lsh_multiprobe_topk"],
        "quantized": ORACLE_SQL["ann_quantized_topk"],
    }
    # ivfpq (+rerank) register later in the module; the final recomposition
    # at the bottom of the file folds them in once their oracles exist.
    if "ann_ivfpq_topk" in ORACLE_SQL:
        methods["ivfpq"] = ORACLE_SQL["ann_ivfpq_topk"]
    if "ann_ivfpq_rerank_topk" in ORACLE_SQL:
        methods["ivfpq_rerank"] = ORACLE_SQL["ann_ivfpq_rerank_topk"]
    arms = []
    for name, sql in sorted(methods.items()):
        arms.append(f"""
    SELECT '{name}' AS method,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM (SELECT query_id, neighbor_id FROM ({ex}) x) e
            JOIN (SELECT query_id, neighbor_id FROM ({sql}) y) a
            USING (query_id, neighbor_id)) AS n_matched,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ({ex}) z) AS n_possible""")
    body = "\n    UNION ALL\n".join(arms)
    return f"""
    SELECT method, n_matched, n_possible,
           ROUND(n_matched * 1.0 / n_possible, 4) AS recall
    FROM ({body}) t
    ORDER BY method
    """


@register("ann_recall_report", oracle=_ann_recall_oracle_sql())
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@10 of every approximate ANN path against the exact
    cosine top-10 — the index-quality report an ANN deployment ships with.
    The oracle is COMPOSED from the four existing ANN oracles (exact as
    ground truth), so the recall arithmetic itself is gate-checked, not
    just asserted in tests. All four method results are k x queries rows;
    the intersections are tiny joins."""
    emb = load_table(spark, "embeddings", sf_dir)
    # Barrier: `exact` has |methods|+1 consumers (one intersection join per
    # method + the possible-count) and each would re-execute the GEMM
    # kernel (recompute audit flagged 6 evaluations).
    exact = (
        similarity.brute_force_topk(emb)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    methods = {
        "ivf": similarity.ivf_topk(emb),
        "ivfpq": similarity.ivfpq_topk(emb),
        "ivfpq_rerank": similarity.ivfpq_rerank_topk(emb),
        "lsh": similarity.lsh_bucketed_topk(emb),
        "lsh_multiprobe": similarity.lsh_multiprobe_topk(emb),
        "quantized": similarity.quantized_topk(emb),
    }
    possible = exact.agg(F.count(F.lit(1)).alias("n_possible"))
    parts = []
    for name in sorted(methods):
        appx = methods[name].select("query_id", "neighbor_id")
        matched = exact.join(appx, ["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).alias("n_matched")
        )
        parts.append(
            matched.crossJoin(possible).select(
                F.lit(name).alias("method"), "n_matched", "n_possible"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "method",
        "n_matched",
        "n_possible",
        F.round(F.col("n_matched") / F.col("n_possible"), 4).alias("recall"),
    ).orderBy("method")


@register(
    "embedding_decontamination",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    ev AS (SELECT emb AS ev_emb FROM e WHERE vec_id < 10),
    mx AS (SELECT e.vec_id, e.label,
                  ROUND(MAX(list_cosine_similarity(e.emb, ev.ev_emb)), 4)
                      AS max_cos
           FROM e CROSS JOIN ev
           WHERE e.vec_id >= 10
           GROUP BY e.vec_id, e.label)
    SELECT label, COUNT(*) AS n_vecs,
           CAST(SUM(CASE WHEN max_cos >= 0.95 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cos95,
           CAST(SUM(CASE WHEN max_cos >= 0.99 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cos99,
           MAX(max_cos) AS max_cosine
    FROM mx GROUP BY label ORDER BY label
    """,
)
def embedding_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space eval-leakage screen: per-label counts of corpus
    vectors whose max cosine to the 10-vector eval set crosses the
    0.95/0.99 near-dup bars
    (operators/similarity.py:embedding_decontamination)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return similarity.embedding_decontamination(emb)


def _ivfpq_oracle_sql(k: int) -> str:
    """IVF-PQ ADC oracle, parameterized on the result depth so the
    rerank query can reuse it as a shortlist CTE."""
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    c AS (SELECT CAST(vec_id AS INT) AS cid, emb AS cemb FROM e WHERE vec_id < 16),
    coarse AS (
        SELECT vec_id, cid AS coarse FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY ROUND(list_cosine_similarity(e.emb, c.cemb), 6)
                                DESC, c.cid) AS rn
            FROM e CROSS JOIN c) t
        WHERE rn = 1),
    pc AS (
        SELECT e.vec_id, CAST(ss.s AS INT) AS s, c.cid AS code,
               ROUND(list_sum(list_transform(range(1, 17),
                 i -> (e.emb[CAST(ss.s * 16 + i AS INT)]
                       - c.cemb[CAST(ss.s * 16 + i AS INT)]) ^ 2)), 6) AS d2
        FROM e CROSS JOIN range(0, 4) ss(s) CROSS JOIN c),
    codes AS (
        SELECT vec_id, s, code FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                         ORDER BY d2, code) AS rn
            FROM pc) t
        WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 10),
    pr AS (
        SELECT query_id, cid AS coarse FROM (
            SELECT q.query_id, c.cid,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY ROUND(list_cosine_similarity(q.qemb, c.cemb), 6)
                                DESC, c.cid) AS rn
            FROM q CROSS JOIN c) t
        WHERE rn <= 2),
    lut AS (
        SELECT q.query_id, CAST(ss.s AS INT) AS s, c.cid AS code,
               list_sum(list_transform(range(1, 17),
                 i -> q.qemb[CAST(ss.s * 16 + i AS INT)]
                      * c.cemb[CAST(ss.s * 16 + i AS INT)])) AS pdot
        FROM q CROSS JOIN range(0, 4) ss(s) CROSS JOIN c),
    sc AS (
        SELECT pr.query_id, coarse.vec_id AS neighbor_id, SUM(lut.pdot) AS adot
        FROM coarse
        JOIN pr USING (coarse)
        JOIN codes ON codes.vec_id = coarse.vec_id
        JOIN lut ON lut.query_id = pr.query_id
                AND lut.s = codes.s AND lut.code = codes.code
        WHERE coarse.vec_id <> pr.query_id
        GROUP BY 1, 2),
    ranked AS (
        SELECT query_id, neighbor_id, ROUND(adot, 4) AS approx_dot,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY ROUND(adot, 4) DESC, neighbor_id) AS rnk
        FROM sc)
    SELECT query_id, neighbor_id, approx_dot, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {k}
    ORDER BY query_id, rnk
    """


@register("ann_ivfpq_topk", oracle=_ivfpq_oracle_sql(10))
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-10 with asymmetric distance computation:
    coarse routing + 4-byte PQ codes + per-query LUT scoring — candidates
    are ranked without ever rereading their raw vectors
    (operators/similarity.py:ivfpq_topk)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return similarity.ivfpq_topk(emb)



def _ivfpq_rerank_oracle_sql() -> str:
    """Shortlist (ivfpq at depth 50) + exact-cosine re-rank."""
    return f"""
    WITH short AS (SELECT query_id, neighbor_id FROM ({_ivfpq_oracle_sql(50)}) t),
    e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    rr AS (SELECT s.query_id, s.neighbor_id,
                  list_cosine_similarity(qe.emb, ne.emb) AS cos
           FROM short s
           JOIN e2 qe ON qe.vec_id = s.query_id
           JOIN e2 ne ON ne.vec_id = s.neighbor_id),
    rranked AS (SELECT query_id, neighbor_id, ROUND(cos, 4) AS cosine,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id) AS rnk
                FROM rr)
    SELECT query_id, neighbor_id, cosine, CAST(rnk AS INT) AS rnk
    FROM rranked WHERE rnk <= 10
    ORDER BY query_id, rnk
    """


@register("ann_ivfpq_rerank_topk", oracle=_ivfpq_rerank_oracle_sql())
def ann_ivfpq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ shortlist-50 + exact cosine re-rank — the production ANN
    topology that breaks the ADC quantization ceiling
    (operators/similarity.py:ivfpq_rerank_topk)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return similarity.ivfpq_rerank_topk(emb)


# Final recomposition: the recall report covers every approximate method
# registered above, ivfpq + rerank included.
ORACLE_SQL["ann_recall_report"] = _ann_recall_oracle_sql()
