"""Local stand-in for the driver's DuckDB-oracle compare.

Mirrors the documented contract (__spark_entry__.py): run the Spark query and
the oracle SQL on the same parquet tables, then compare row count, schema
arity, and an order-insensitive value multiset with columns sorted by name.

Driver-faithfulness (learned the hard way in r04): the driver's hash is
*result-type sensitive* where a Python ``fetchall()`` compare is not — DuckDB
widens SUM(INTEGER) to HUGEINT, which its pandas/arrow conversion then turns
into float64/decimal128 while Spark emits int64, and the driver hash diverges
even though every value is numerically equal. This comparator therefore:

1. fetches the DuckDB side through **Arrow** (``.arrow().to_pylist()``), which
   preserves the engine's logical result types (HUGEINT -> Decimal, not int),
   and
2. normalizes values **type-sensitively**: bool / int / float / Decimal /
   str / date / datetime all normalize into disjoint spaces, so an oracle
   whose column widens to HUGEINT or DECIMAL fails here exactly like it
   failed the driver (verified: both r04 reds reproduce pre-fix under this
   comparator and pass post-fix).

The driver's exact hash serialization is still unknown, so the hard gate
against this failure class is the registry-wide oracle type-audit in
tests/test_oracle_parity.py (every oracle column must DESCRIBE to a
pandas/arrow-lossless type); this module is the per-value backstop.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb

from kafkasparkstream_spark.tables import TABLE_NAMES

NORM_DP = 9  # normalization grid for float compare (queries round to 4dp already)

#: When True, floats compare BIT-EXACTLY (float.hex()) instead of on the
#: 9dp grid. Since the driver runs the same Spark and DuckDB builds at the
#: same scale, a bit-exact local pass implies the driver sees identical
#: doubles too — this is the ROUND-half-tie / sub-grid-noise audit mode
#: (scripts/oracle_sweep.py --strict-floats).
STRICT_FLOATS = False

#: DuckDB logical result types that convert losslessly (and type-stably)
#: through both pandas and arrow — the only types an oracle may emit.
#: Notably absent: HUGEINT (SUM over int widens there; -> float64/decimal128),
#: DECIMAL (-> float64 via .df(), Decimal via arrow), UUID, BLOB, structs.
ORACLE_TYPE_WHITELIST = frozenset(
    {
        "BIGINT",
        "INTEGER",
        "SMALLINT",
        "TINYINT",
        "DOUBLE",
        "FLOAT",
        "VARCHAR",
        "DATE",
        "TIMESTAMP",
        "BOOLEAN",
    }
)


def oracle_type_ok(duckdb_type: str) -> bool:
    """True iff a DuckDB DESCRIBE type string is driver-hash portable:
    a whitelisted SCALAR only. Lists/structs/maps are rejected outright —
    the r04 whitelist allowed "list-of-those", and r05 falsified it: a
    list column survives Arrow but crashes the driver's pandas
    canonicalizer (sort_values/factorize -> TypeError: unhashable type:
    'list'). Nested types must be serialized (e.g. concat_ws /
    array_to_string) before they reach the wire."""
    return duckdb_type.strip().upper() in ORACLE_TYPE_WHITELIST


def _connect(sf_dir: str):
    con = duckdb.connect()
    # Bound the oracle engine so a big-SF sweep SPILLS instead of taking the
    # box down: DuckDB's default limit (~80% of RAM) plus the Spark JVM
    # host-OOM'd the sf10 sweep twice (110 GB anon-rss, kernel kill). The
    # cap must never RAISE the limit on a small host, so it's
    # min(48GB, 40% of physical RAM) unless overridden. The driver's own
    # gate runs at sf0.01 where this never binds.
    import os as _os
    import tempfile as _tf

    limit = _os.environ.get("ORACLE_DUCKDB_MEM")
    if limit is None:
        try:
            ram_gb = (
                _os.sysconf("SC_PAGE_SIZE") * _os.sysconf("SC_PHYS_PAGES")
            ) / 2**30
            limit = f"{max(1, min(48, int(ram_gb * 0.4)))}GB"
        except (ValueError, OSError):
            limit = "4GB"
    con.execute(f"SET memory_limit='{limit}'")
    con.execute(f"SET temp_directory='{_tf.gettempdir()}/duckdb_oracle_spill'")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def duckdb_describe(sql: str, sf_dir: str):
    """[(column, duckdb_type)] for the oracle's result, without executing."""
    con = _connect(sf_dir)
    desc = con.sql("DESCRIBE " + sql).fetchall()
    con.close()
    return [(row[0], row[1]) for row in desc]


def duckdb_run(sql: str, sf_dir: str):
    """Run the oracle and fetch through Arrow so logical result types
    survive (HUGEINT comes back as Decimal, not Python int)."""
    con = _connect(sf_dir)
    tbl = con.sql(sql).arrow()
    con.close()
    cols = tbl.column_names
    # Positional rebuild: to_pylist() returns name-keyed dicts, which would
    # silently collapse duplicate column names instead of erroring.
    assert len(set(cols)) == len(cols), f"duplicate oracle column names: {cols}"
    rows = list(zip(*(col.to_pylist() for col in tbl.columns))) if cols else []
    return cols, rows


def driver_canon_simulate(cols, rows):
    """Run a result frame through the driver's observed canonicalization
    procedure (r05 post-mortem): build a pandas DataFrame and sort_values
    over EVERY column. The driver does this before hashing; cells pandas
    cannot factorize (lists, dicts, sets) raise TypeError there — which
    surfaced as the r05 ``inverted_index_postings`` gate error even though
    every value was correct. Raises whatever pandas raises; callers assert
    it doesn't."""
    import pandas as pd

    df = pd.DataFrame(rows, columns=list(cols))
    df = df.reindex(sorted(df.columns), axis=1)
    # The observed r05 traceback died in ObjectHashTable._unique (factorize),
    # which multi-column sort_values uses per column; a single-column frame
    # takes a comparison-sort path instead, so factorize explicitly too.
    for c in df.columns:
        pd.factorize(df[c])
    df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return True


def _norm(v):
    """Type-sensitive canonical form: ints, floats, Decimals, bools and
    strings live in disjoint spaces, so cross-engine type drift (not just
    value drift) fails the compare — like the driver's hash."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        if STRICT_FLOATS:
            return ("f", v.hex())
        return ("f", f"{round(v, NORM_DP):.{NORM_DP}f}")
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(timespec="microseconds"))
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def normalize_result(cols, rows):
    """Sort columns by name (the driver does), then rows as a multiset."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    normed = sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=repr,
    )
    return sorted_cols, normed


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, name: str = "?"):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(oracle_sql, sf_dir)

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column names differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    # Both frames must survive the driver's canonicalization procedure
    # (pandas sort/factorize over every column) — values being equal is not
    # enough if the wire format crashes the gate (r05 lesson).
    for side, cols, rows in (("spark", s_cols, s_rows), ("duckdb", d_cols, d_rows)):
        try:
            driver_canon_simulate(cols, rows)
        except TypeError as e:
            raise AssertionError(
                f"{name}: {side} result is not driver-canon-safe: {e}"
            ) from e
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    _, s_norm = normalize_result(s_cols, s_rows)
    _, d_norm = normalize_result(d_cols, d_rows)
    if s_norm != d_norm:
        d_set = {repr(r) for r in d_norm}
        s_set = {repr(r) for r in s_norm}
        diff_s = [r for r in s_norm if repr(r) not in d_set][:5]
        diff_d = [r for r in d_norm if repr(r) not in s_set][:5]
        raise AssertionError(
            f"{name}: value/type mismatch.\n spark-only (≤5): {diff_s}\n"
            f" duckdb-only (≤5): {diff_d}"
        )
