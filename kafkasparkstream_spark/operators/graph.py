"""Iterative graph scoring over edge DataFrames — the loop-of-joins shape
(like k-means and connected components) where the DRIVER owns the trivial
iteration count and every per-iteration step is a keyed join + hash-agg
sized to the edge list.

PageRank here ranks centrality in a similarity graph (which documents /
embeddings are "hubs" of near-duplication or semantic mass) — the standard
representative-sample picker over a kNN graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "vec_id",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank with a fixed iteration count.

    Per iteration: one keyed join of the (persisted) edge list against the
    current rank table on ``src``, one hash-agg of contributions keyed by
    ``dst``, and a left join back onto the node set for the teleport term —
    every shuffle is keyed and sized to edges/nodes, nothing driver-side
    but the loop counter. Fixed iterations (not a convergence test) keep
    the result deterministic and the oracle expressible as unrolled SQL.

    Nodes with no in-links keep the teleport mass ``(1-d)/N``; out-degrees
    are computed from the edge list (dangling nodes contribute nothing,
    matching the unrolled-SQL twin).
    """
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst")).persist()
    deg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    ed = e.join(deg, "_src").persist()
    try:
        n = nodes.count()
        ranks = nodes.select(F.col(id_col)).withColumn("rank", F.lit(1.0 / n))
        teleport = (1.0 - damping) / n
        for _ in range(iterations):
            inflow = (
                ed.join(ranks, ed["_src"] == ranks[id_col])
                .select("_dst", (F.col("rank") / F.col("_deg")).alias("_c"))
                .groupBy("_dst")
                .agg(F.sum("_c").alias("_inflow"))
            )
            ranks = (
                nodes.select(id_col)
                .join(inflow, F.col(id_col) == F.col("_dst"), "left")
                .select(
                    id_col,
                    (
                        F.lit(teleport)
                        + F.lit(damping) * F.coalesce(F.col("_inflow"), F.lit(0.0))
                    ).alias("rank"),
                )
            )
        return ranks.select(id_col, F.round("rank", 6).alias("rank")).orderBy(id_col)
    finally:
        e.unpersist()
        ed.unpersist()
