"""Analytic (OVER) window functions, set operations, multi-dim aggregates.

The reference has none of these (SURVEY.md §2.5/§2.7 — its "latest N" is
ORDER BY + LIMIT), but they're part of the engine surface Spark provides;
exposing them as named operators completes the serving-query vocabulary.

Scale notes: a window partitioned by a high-cardinality key (user_id) shuffles
once on that key — same exchange a groupBy would need; rank-filter top-k per
key keeps k rows per key. ROLLUP/CUBE expand to grouping sets *before* the
exchange (Spark's Expand operator), so cost is (#grouping sets × input), all
map-side partial-aggregated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_key(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """row_number() = 1 per key ordered by time desc — the analytic-function
    form of "latest reading per device"."""
    w = Window.partitionBy(key).orderBy(F.desc(ts_col), F.desc(tiebreak))
    return (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
        .orderBy(key)
    )


def topk_per_key(
    df: DataFrame,
    key: str = "user_id",
    order_col: str = "value",
    k: int = 3,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Top-k rows per key by a measure (rank-filter pattern)."""
    w = Window.partitionBy(key).orderBy(F.desc(order_col), F.asc(tiebreak))
    return (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .withColumn("rnk", F.col("rnk").cast("int"))
        .orderBy(key, "rnk")
    )


def running_stats_per_key(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Cumulative sum/count + lag per key in event-time order."""
    w = Window.partitionBy(key).orderBy(F.asc(ts_col), F.asc(tiebreak))
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.select(
        key,
        tiebreak,
        ts_col,
        F.round(F.sum(value_col).over(cum), 4).alias("running_sum"),
        F.count(F.lit(1)).over(cum).alias("running_count"),
        F.round(F.lag(value_col, 1).over(w), 4).alias("prev_value"),
    ).orderBy(key, tiebreak)


def rollup_counts(
    df: DataFrame, dims: tuple[str, ...] = ("event_type",), value_col: str = "value"
) -> DataFrame:
    """GROUP BY ROLLUP(dims): per-dim rows plus grand total (null dims)."""
    return (
        df.rollup(*dims)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg(value_col), 4).alias("avg_value"),
        )
        .orderBy(*[F.asc_nulls_first(d) for d in dims])
    )


def cube_counts(df: DataFrame, dims: tuple[str, ...], value_col: str = "value") -> DataFrame:
    """GROUP BY CUBE(dims): all 2^|dims| grouping sets."""
    return (
        df.cube(*dims)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg(value_col), 4).alias("avg_value"),
        )
        .orderBy(*[F.asc_nulls_first(d) for d in dims])
    )


def event_type_user_overlap(df: DataFrame, type_a: str, type_b: str) -> DataFrame:
    """Set operations: users with both event types (INTERSECT)."""
    ua = df.filter(F.col("event_type") == type_a).select("user_id")
    ub = df.filter(F.col("event_type") == type_b).select("user_id")
    return ua.intersect(ub).orderBy("user_id")


def event_type_user_except(df: DataFrame, type_a: str, type_b: str) -> DataFrame:
    """Users with type_a events but no type_b events (EXCEPT)."""
    ua = df.filter(F.col("event_type") == type_a).select("user_id")
    ub = df.filter(F.col("event_type") == type_b).select("user_id")
    return ua.exceptAll(ub).distinct().orderBy("user_id")


def tagged_union(df: DataFrame, type_a: str, type_b: str) -> DataFrame:
    """UNION ALL of two filtered branches with a provenance tag."""
    ua = df.filter(F.col("event_type") == type_a).select(
        "event_id", "user_id", F.lit("a").alias("branch")
    )
    ub = df.filter(F.col("event_type") == type_b).select(
        "event_id", "user_id", F.lit("b").alias("branch")
    )
    return ua.unionAll(ub).orderBy("event_id", "branch")


def distinct_user_count(df: DataFrame) -> DataFrame:
    """Exact COUNT(DISTINCT) — the oracle-checkable twin of the approximate
    version below."""
    return df.agg(F.countDistinct("user_id").alias("distinct_users"))


def approx_distinct_user_count(df: DataFrame, rsd: float = 0.02) -> DataFrame:
    """HyperLogLog++ approximate distinct count — the 100 TB path (no exact
    distinct shuffle; sketches merge associatively). Engine-specific sketch →
    no SQL oracle; driver does the rows-only check."""
    return df.agg(F.approx_count_distinct("user_id", rsd=rsd).alias("approx_distinct_users"))
