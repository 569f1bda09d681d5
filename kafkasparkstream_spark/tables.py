"""Parquet table registry over the driver's testdata.

Loading is plain ``spark.read.parquet`` — declarative, so Catalyst gets column
pruning and predicate pushdown into the scan for free. At 100 TB these tables
would be date/key-partitioned parquet (or an open table format); the loader
keeps that swap behind one function.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at ANY realistic scale factor
#: (region=5, nation=25 rows; supplier/part grow with sf but stay dimension-ish).
ALWAYS_BROADCAST = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: Columns stored as TIMESTAMP(NANOS) in the testdata parquet. Spark's reader
#: rejects nanos outright; with ``spark.sql.legacy.parquet.nanosAsLong`` they
#: surface as epoch-nanos longs, which we floor-divide to µs (exactly what
#: DuckDB's ns→µs coercion does, keeping oracle parity).
_NANOS_TS_COLS = {"events": ("ts",)}


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    # Runtime-settable SQLConf — works even under a caller-provided session.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for ts_col in _NANOS_TS_COLS.get(name, ()):
        field = df.schema[ts_col] if ts_col in df.columns else None
        if field is not None and isinstance(field.dataType, LongType):
            # `div` = integer division on longs; a float divide would lose
            # precision (epoch-nanos ≈ 1.7e18 exceeds double's 53-bit mantissa).
            df = df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
        elif field is not None and not isinstance(field.dataType, TimestampType):
            df = df.withColumn(ts_col, F.col(ts_col).cast(TimestampType()))
    return df


def register_views(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (→ usable from spark.sql)."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("event_date",),
    mode: str = "overwrite",
) -> None:
    """Date/key-partitioned parquet sink — the 100 TB table layout.

    Partition columns become directory levels, so time-ranged queries (A2)
    and per-day backfills touch only matching directories: Catalyst turns
    the predicate into PartitionFilters and never lists the other
    partitions. Keep partition cardinality in the hundreds-to-thousands
    (e.g. a date, not a timestamp) or the file listing itself becomes the
    bottleneck.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table — the shuffle-elimination layout for 100 TB
    co-located joins.

    Both sides of a recurring equi-join written with the same
    (bucket_col, num_buckets) hash-layout join WITHOUT a shuffle: Spark's
    scan reports the bucketing as its output partitioning, so the exchange
    that a plain parquet join needs on each side disappears (pinned by
    tests/test_plans.py). Add ``sortBy`` to also pre-sort within buckets and
    drop the join's sort step. This is the at-rest answer to the
    orders⋈lineitem co-partitioning called out in
    `analytics.top_orders_by_revenue`.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: tuple[str, ...] = (),
) -> int:
    """Rewrite a parquet table into ~``target_file_bytes`` files — the
    maintenance job that keeps a streaming sink healthy.

    Every micro-batch append (streaming.sinks) adds one file per task;
    after days of 1-minute triggers a table is thousands of KB-sized files
    and scan planning (footer reads, task scheduling) dwarfs the scan
    itself. Compaction = read → repartition to ceil(bytes/target) →
    atomic-ish rewrite (write to a sibling dir, then swap), preserving any
    partition columns. Returns the output file count.

    On a lakehouse table format (Delta/Iceberg) this is OPTIMIZE /
    rewrite_data_files; over raw parquet the swap window is the caller's
    scheduling concern (run it when no writer is active).
    """
    import math
    import shutil

    src_files = [
        (p, sz)
        for p, sz in _list_parquet_files(path)
    ]
    total_bytes = sum(sz for _, sz in src_files) or 1
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    writer = df.repartition(n_out).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)

    backup = path.rstrip("/") + "._compact_old"
    shutil.move(path, backup)
    shutil.move(tmp, path)
    shutil.rmtree(backup)
    return len(_list_parquet_files(path))


def _list_parquet_files(path: str) -> list[tuple[str, int]]:
    import os

    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out.append((p, os.path.getsize(p)))
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...],
    compare_cols: tuple[str, ...],
) -> DataFrame:
    """Row-level CDC between two snapshots of a table: classify every key
    as ``added`` (only in new), ``removed`` (only in old), ``changed``
    (present in both, any compare column differs, null-safe) or
    ``unchanged`` — the audit behind incremental publishes and replication
    checks.

    ONE full-outer hash join on the key (both sides shuffle on the key they
    are naturally keyed by — bucketed layouts make it exchange-free) and a
    null-safe column comparison in the join's projection; no row hashing,
    no second scan. Output carries the key plus the change class; counts
    roll up with one tiny hash-agg (see ``snapshot_diff_summary``).
    """
    # presence flags are literal markers, not nullable compare values — a
    # legitimately-NULL compare column must not read as "row absent".
    o = old.select(
        *key_cols, *[F.col(c).alias(f"_o_{c}") for c in compare_cols]
    ).withColumn("_in_old", F.lit(1))
    n = new.select(
        *key_cols, *[F.col(c).alias(f"_n_{c}") for c in compare_cols]
    ).withColumn("_in_new", F.lit(1))
    joined = o.join(n, list(key_cols), "full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*key_cols, change.alias("change_type"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...],
    compare_cols: tuple[str, ...],
) -> DataFrame:
    """Change-class counts from :func:`snapshot_diff` — one extra hash-agg
    to ≤4 rows."""
    return (
        snapshot_diff(old, new, key_cols, compare_cols)
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("change_type")
    )


def schema_diff(old: DataFrame, new: DataFrame) -> list[dict]:
    """Schema drift between two table versions: added / removed columns and
    dtype or nullability changes — the metadata gate run before
    :func:`snapshot_diff` makes sense to compute at all.

    Pure driver-side metadata (no job, no scan); returns a list of
    ``{"column", "change", "old", "new"}`` dicts ordered by column name so
    pipelines can fail fast on incompatible drift.
    """
    o = {f.name: f for f in old.schema.fields}
    n = {f.name: f for f in new.schema.fields}
    out: list[dict] = []
    for c in sorted(set(o) | set(n)):
        if c not in n:
            out.append(
                {"column": c, "change": "removed", "old": o[c].dataType.simpleString(), "new": None}
            )
        elif c not in o:
            out.append(
                {"column": c, "change": "added", "old": None, "new": n[c].dataType.simpleString()}
            )
        elif (o[c].dataType, o[c].nullable) != (n[c].dataType, n[c].nullable):
            fmt = lambda f: f.dataType.simpleString() + ("" if f.nullable else " not null")
            out.append(
                {"column": c, "change": "changed", "old": fmt(o[c]), "new": fmt(n[c])}
            )
    return out


def zvalue_col(cols: list, bits: int = 16):
    """Morton (Z-order) curve key: interleave the low ``bits`` bits of each
    input column (already scaled to non-negative ints < 2**bits). Sorting by
    this key clusters rows that are close in EVERY dimension into the same
    parquet files, so min/max row-group stats prune multi-dimensional
    filters — the data-skipping layout trick behind Delta/Iceberg OPTIMIZE
    ZORDER, built here from plain shift/and expressions that stay inside
    whole-stage codegen (no UDF).
    """
    n = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + j)
    return z


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet laid out along the Z-order curve of ``cols``:
    min-max scale each column to ``bits`` bits (1-row bounds broadcast, no
    shuffle), range-partition by the interleaved key into ``n_files`` splits
    and sort within each — so every file covers a tight hyper-rectangle of
    the key space. At 100 TB the same plan holds: the bounds aggregate is
    k doubles, the range exchange is the only data-sized shuffle, and the
    per-file sort spills locally.
    """
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"_mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_mx_{c}") for c in cols],
    )
    scale = F.lit((1 << bits) - 1)
    scaled = df.crossJoin(F.broadcast(bounds))
    zcols = [
        F.floor(
            (F.col(c).cast("double") - F.col(f"_mn_{c}"))
            / (F.col(f"_mx_{c}") - F.col(f"_mn_{c}") + 1e-12)
            * scale
        )
        for c in cols
    ]
    (
        scaled.withColumn("_z", zvalue_col(zcols, bits=bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )
