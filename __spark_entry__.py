"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` are the per-operator correctness surface
(driver runs both at sf0.01 and hash-compares via DuckDB).

Every query here maps to a SURVEY.md §2 operator id (noted per entry) or to a
training-data-pipeline extension. Column aliases match between the Spark
DataFrame and the oracle SQL exactly (driver compare sorts columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafkasparkstream_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's 1-minute tumbling windowed multi-aggregate
    (S10, spark-processor/processor.py:82-95) over the sf0.001 events table."""
    return Q.QUERIES["windowed_agg_1min"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLE_SQL)
