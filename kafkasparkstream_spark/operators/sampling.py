"""Deterministic sampling & dataset splitting for training-data pipelines.

Random sampling (`df.sample`, TABLESAMPLE) is irreproducible across engines,
partitionings, and reruns — useless for auditable training splits. These
operators key every decision on a content hash of a stable id column:

- the same row lands in the same split on ANY engine (the DuckDB oracles run
  the identical md5 arithmetic),
- resampling is a pure filter — no shuffle, fully pushed-down-scan friendly,
- rates are exact in expectation and independent per salt (changing the salt
  draws a fresh sample).

At 100 TB a sample/split is a narrow projection+filter over the scan: no
state, no shuffle, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafkasparkstream_spark.functions.hashing import hash_bucket


def _hash_bucket(id_col: Column, salt: str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) — see functions.hashing for the
    construction and its SQL twin."""
    return hash_bucket(id_col, buckets, salt)


def hash_sample(
    df: DataFrame, id_col: str, rate_pct: int, salt: str = "s0"
) -> DataFrame:
    """Keep ~rate_pct% of rows, deterministically by id hash."""
    return df.filter(_hash_bucket(F.col(id_col), salt) < rate_pct)


def dataset_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split0",
) -> DataFrame:
    """Label every row train/val/test by id-hash bucket (80/10/10 default).

    Returns the input plus a ``split`` column; the split is a function of
    the id alone, so it is stable under reprocessing, repartitioning, and
    incremental appends — the property a training pipeline actually needs.
    """
    b = _hash_bucket(F.col(id_col), salt)
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_hash_sample(
    df: DataFrame, id_col: str, strata_col: str, rates_pct: dict[str, int], salt: str = "s0"
) -> DataFrame:
    """Per-stratum deterministic sampling: each ``strata_col`` value keeps
    its own rate (absent strata keep 0%). The downsample-the-majority-class
    primitive, as one pushable filter expression."""
    b = _hash_bucket(F.col(id_col), salt)
    rate = F.lit(0)
    for value, pct in rates_pct.items():
        rate = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(b < rate)
