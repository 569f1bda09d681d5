"""Similarity search over embedding columns (``array<float>``).

Three operators:

- :func:`brute_force_topk` — exact cosine top-k: broadcast the (small) query
  set against the candidate table. The baseline and the verifier for
  approximate variants. Per-candidate work is a fused JVM expression
  (``zip_with`` + ``aggregate``), no Python, no shuffle of the candidate
  table — only the final per-query top-k (a window over query_id, k rows per
  query survive).
- :func:`lsh_bucketed_topk` — the scale path: axis-aligned sign-LSH buckets
  (bit b = sign of dimension b). Query only probes its own bucket →
  candidate set shrinks ~2^bits ×; recall follows from embedding isotropy
  (swap in learned/random hyperplanes by replacing the bucket expression —
  the plan shape is identical). At 100 TB: candidates are hash-partitioned
  by bucket, queries broadcast, so each executor scans only its buckets.
- :func:`cosine_neardup_pairs` — embedding-cosine near-duplicate pairs
  (all-pairs ≥ threshold); quadratic, intended for within-bucket use.

Norms are precomputed per row (one pass) rather than per pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns as a fused JVM expression (cast to
    double before multiply — matches the oracle's double math on float32)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every candidate for each of the first
    ``num_queries`` vectors (query set = ``vec_id < num_queries``).

    Plan: broadcast-nested-loop the tiny query side against the candidates
    (linear scan, no candidate shuffle), then a window top-k per query —
    ``row_number`` ties broken by neighbor id for determinism.
    """
    from pyspark.sql.window import Window

    q = embeddings.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb")
    )
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_emb"))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_emb"), F.col("c_emb")).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cosine"), "rnk")
        .orderBy("query_id", "rnk")
    )


def sign_bucket(vec_col: Column, bits: int = 4) -> Column:
    """Axis-aligned sign-LSH bucket id: bit b = 1 iff dimension b > 0."""
    return F.concat(
        *[
            F.when(F.element_at(vec_col, b + 1) > 0, F.lit("1")).otherwise(F.lit("0"))
            for b in range(bits)
        ]
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 10,
    bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k probing only the query's sign-LSH bucket."""
    from pyspark.sql.window import Window

    bucketed = embeddings.select(
        F.col(id_col), F.col(vec_col), sign_bucket(F.col(vec_col), bits).alias("bucket")
    )
    q = bucketed.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb"), "bucket"
    )
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_emb"), "bucket"
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("q_emb"), F.col("c_emb")).alias("_cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cosine"), "rnk")
        .orderBy("query_id", "rnk")
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-duplicate scan).

    Norms are computed once per row before the pair join. All-pairs is
    O(n²/2) — at scale, run it per sign-LSH bucket (compose with
    :func:`sign_bucket` as an extra equi-join key) or on MinHash candidates.
    """
    with_norm = embeddings.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("_n")
    )
    a = with_norm.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("emb_a"), F.col("_n").alias("n_a")
    )
    b = with_norm.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("emb_b"), F.col("_n").alias("n_b")
    )
    cos = dot(F.col("emb_a"), F.col("emb_b")) / (F.col("n_a") * F.col("n_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("_cos"))
        .filter(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round("_cos", 4).alias("cosine"))
        .orderBy("id_a", "id_b")
    )
