"""Plan-shaping helpers shared by operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure ``df`` has enough partitions to use the cluster for a
    compute-heavy downstream stage.

    Small inputs (a single parquet file, a filtered dimension) arrive as one
    split, which serializes any expensive per-row projection or
    nested-loop-join stage onto one core. Repartitioning round-robin to the
    cluster's default parallelism fixes that for the price of one small
    shuffle.

    At scale this is a no-op: inputs with >= default-parallelism partitions
    pass through untouched, so a 100 TB scan (thousands of splits) never pays
    an extra shuffle. Only use upstream of genuinely expensive per-row work —
    cheap projections don't earn their shuffle back.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
