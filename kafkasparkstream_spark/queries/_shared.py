"""Shared registry infrastructure for the query package: the
`register` decorator, the QUERIES / ORACLE_SQL aggregation dicts, and
helpers used across families."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Re-exported through the package's flat namespace — external consumers do
# `from kafkasparkstream_spark.queries import load_table`.
from kafkasparkstream_spark.tables import load_table  # noqa: F401

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


_BUCKET_SQL = "CAST(('0x' || substr(md5('{salt}' || CAST({id} AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
