"""Data-governance operators: deletion propagation ("right to be forgotten")
and purge auditing across a fact table and its derived rollups.

At 100 TB the shape that survives is: the tombstone set (users/keys to
forget) is tiny relative to the corpus — broadcast it and anti-join each
affected table in one scan apiece. Derived aggregates are NOT patchable by
row deletion (their partials already mixed the purged rows in), so the purge
report counts the rollup groups that must be recomputed — the operational
cost estimate a deletion pipeline needs before it runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purge_rows(fact: DataFrame, tombstones: DataFrame, key_col: str) -> DataFrame:
    """The surviving fact table: broadcast anti-join against the tombstone
    keys — one scan, no shuffle of the fact side."""
    return fact.join(F.broadcast(tombstones), key_col, "left_anti")


def purge_report(
    fact: DataFrame,
    tombstones: DataFrame,
    key_col: str = "user_id",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """One-scan deletion audit: per affected group, how many fact rows the
    tombstone set removes and how many remain — the blast-radius report
    (which rollup groups need recomputation, how much data rewrites).

    Single aggregate over the broadcast-semi-join-flagged scan; no second
    pass over the fact table. The tombstone set is deduplicated internally —
    two deletion requests for the same key must not double-count its rows.
    """
    flagged = fact.join(
        F.broadcast(
            tombstones.select(F.col(key_col)).distinct().withColumn("_purge", F.lit(True))
        ),
        key_col,
        "left",
    )
    return (
        flagged.groupBy(*group_cols)
        .agg(
            F.sum(F.col("_purge").isNotNull().cast("long")).alias("n_purged"),
            F.sum(F.col("_purge").isNull().cast("long")).alias("n_kept"),
            F.countDistinct(
                F.when(F.col("_purge").isNotNull(), F.col(key_col))
            ).alias("n_keys_purged"),
        )
        .orderBy(*group_cols)
    )
