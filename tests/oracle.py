"""Local stand-in for the driver's DuckDB-oracle compare.

Mirrors the documented contract (__spark_entry__.py): run the Spark query and
the oracle SQL on the same parquet tables, then compare row count, schema
arity, and an order-insensitive value multiset with columns sorted by name.
Floats compare exactly after normalization to a fixed decimal grid — stricter
than any sane driver tolerance, so passing here is a safe margin.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from kafkasparkstream_spark.tables import TABLE_NAMES

NORM_DP = 9  # normalization grid for float compare (queries round to 4dp already)


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, NORM_DP):.{NORM_DP}f}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def normalize_result(cols, rows):
    """Sort columns by name (the driver does), then rows as a multiset."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    normed = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return sorted_cols, normed


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, name: str = "?"):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(oracle_sql, sf_dir)

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column names differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    _, s_norm = normalize_result(s_cols, s_rows)
    _, d_norm = normalize_result(d_cols, d_rows)
    if s_norm != d_norm:
        d_set, s_set = set(d_norm), set(s_norm)
        diff_s = [r for r in s_norm if r not in d_set][:5]
        diff_d = [r for r in d_norm if r not in s_set][:5]
        raise AssertionError(
            f"{name}: value mismatch.\n spark-only (≤5): {diff_s}\n duckdb-only (≤5): {diff_d}"
        )
