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
  (all-pairs ≥ threshold): block-tiled distributed GEMM by default (per-task
  memory bounded by the block size, nothing collected to the driver), with
  the legacy driver-broadcast path behind ``small_corpus=True``.

Norms are precomputed per row (one pass) rather than per pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafkasparkstream_spark.util import fanout


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


def _spark_round(arr, decimals: int):
    """Replicate Spark's ``Round`` on DoubleType in numpy, bit-for-bit.

    Spark rounds a double via ``BigDecimal.valueOf(x)`` (shortest decimal
    representation, same algorithm as Python's ``repr``) + ``HALF_UP``
    (away from zero). The vectorized fast path —
    ``floor(|x|·10^d + 0.5)·sign(x)`` — agrees except when ``x·10^d``
    sits within float error of a ``.5`` boundary; those rare elements are
    re-rounded through ``Decimal(repr(x))``, which IS the JVM semantics.
    Needed so BLAS kernels reproduce the columnar/oracle tie-breaks that
    hinge on 6dp-rounded distances.
    """
    import numpy as np

    arr = np.asarray(arr, dtype=np.float64)
    scale = 10.0 ** decimals
    finite = np.isfinite(arr)
    y = np.where(finite, arr, 0.0) * scale
    absy = np.abs(y)
    fast = np.sign(y) * np.floor(absy + 0.5) / scale
    frac = absy - np.floor(absy)
    amb = finite & (np.abs(frac - 0.5) <= np.maximum(absy, 1.0) * 1e-12)
    if amb.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal(1).scaleb(-decimals)
        flat = fast.ravel()
        src = arr.ravel()
        for i in np.nonzero(amb.ravel())[0]:
            flat[i] = float(
                Decimal(repr(float(src[i]))).quantize(q, rounding=ROUND_HALF_UP)
            )
        fast = flat.reshape(fast.shape)
    # round(-inf) stays -inf (masked entries)
    fast = np.where(finite, fast, arr)
    return fast


def _fold_dot(a, b):
    """Sequential-fold dot of row-matrices ``a (n,d)`` x ``b (m,d)`` →
    ``(n,m)``, accumulating dimension-by-dimension in the exact order
    Spark's ``F.aggregate(zip_with(...))`` fold does, so every float64
    intermediate is bit-identical to the columnar/oracle computation
    (a BLAS GEMM's pairwise summation is ~1e-15 off — enough to flip a
    6dp-rounded argmin once in ~10^7 roundings, which an exact integer
    rollup like pq_distortion would surface as a hash mismatch)."""
    import numpy as np

    acc = np.zeros((a.shape[0], b.shape[0]), dtype=np.float64)
    for j in range(a.shape[1]):
        acc = acc + a[:, j, None] * b[None, :, j]
    return acc


def _fold_sqdist(a, b):
    """Sequential-fold squared L2 of ``a (n,d)`` x ``b (m,d)`` → ``(n,m)``
    in Spark's fold order (see :func:`_fold_dot`)."""
    import numpy as np

    acc = np.zeros((a.shape[0], b.shape[0]), dtype=np.float64)
    for j in range(a.shape[1]):
        d = a[:, j, None] - b[None, :, j]
        acc = acc + d * d
    return acc


def brute_force_topk(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every candidate for each of the first
    ``num_queries`` vectors (query set = ``vec_id < num_queries``).

    Plan: collect the tiny query set to a numpy matrix and broadcast it;
    ``mapInPandas`` scores each candidate partition as one BLAS GEMM
    (``block @ queries.T``) and emits only each partition's top-k per query
    (``argpartition``), so the shuffle carries ≤ k·partitions rows per query
    no matter how many candidates were scanned. A final window picks the
    global top-k — ``row_number`` ties broken by neighbor id for
    determinism. The query side is O(num_queries·d) on the driver; the
    candidate side never leaves the executors.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType
    from pyspark.sql.window import Window

    spark = embeddings.sparkSession
    qrows = (
        embeddings.filter(F.col(id_col) < num_queries)
        .select(F.col(id_col), F.col(vec_col))
        .collect()
    )
    q_ids = np.array([r[0] for r in qrows], dtype="int64")
    q_mat = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    out_schema = StructType(
        [
            StructField("query_id", LongType(), False),
            StructField("neighbor_id", LongType(), False),
            StructField("_cos", DoubleType(), False),
        ]
    )

    def bf_topk_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, mat_q = bc.value
        for batch in batches:
            if not len(batch):
                continue
            c_ids = batch[id_col].to_numpy()
            c_mat = np.array([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = c_mat @ mat_q.T  # (n_cand, n_q)
            sims[c_ids[:, None] == ids_q[None, :]] = -np.inf  # mask self-match
            # k+1: a masked self-match may occupy one slot in its partition.
            take = min(k + 1, len(c_ids))
            # Partial top-k per query within this partition.
            part = np.argpartition(-sims, take - 1, axis=0)[:take]  # (take, n_q)
            qi = np.broadcast_to(ids_q, part.shape)
            yield pd.DataFrame(
                {
                    "query_id": qi.ravel(),
                    "neighbor_id": c_ids[part].ravel().astype("int64"),
                    "_cos": np.take_along_axis(sims, part, axis=0).ravel(),
                }
            )

    # fanout: the candidate scan carries the GEMM work; a single input split
    # would serialize it onto one core.
    c = fanout(embeddings.select(F.col(id_col), F.col(vec_col)))
    scored = c.mapInPandas(bf_topk_kernel, out_schema).filter(F.col("_cos") != float("-inf"))
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
    c = fanout(
        bucketed.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_emb"), "bucket"
        )
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


def ivf_topk(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate cosine top-k.

    Coarse quantizer: the first ``n_centroids`` vectors serve as centroids
    (deterministic "training" — swap in k-means output without changing the
    plan). Every vector is assigned to its max-cosine centroid (ties →
    lowest centroid id); each query probes its ``nprobe`` nearest centroid
    lists and scores only those vectors.

    Scale shape: centroids and queries broadcast (O((C+Q)·d)); one
    mapInPandas pass assigns + scores each partition with BLAS GEMMs and
    emits local top-(k+1) per query, so the shuffle carries k·partitions
    rows. On a real deployment the assignment would be precomputed and the
    table bucketed by centroid id, turning each probe into partition
    pruning — the kernel is unchanged.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType
    from pyspark.sql.window import Window

    spark = embeddings.sparkSession

    def _mat(rows):
        ids = np.array([r[0] for r in rows], dtype="int64")
        m = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
        return ids, m / np.linalg.norm(m, axis=1, keepdims=True)

    cent_ids, cent_mat = _mat(
        embeddings.filter(F.col(id_col) < n_centroids)
        .orderBy(id_col)
        .select(id_col, vec_col)
        .collect()
    )
    q_ids, q_mat = _mat(
        embeddings.filter(F.col(id_col) < num_queries).select(id_col, vec_col).collect()
    )
    # Probe lists: each query's nprobe nearest centroids (ties → lowest id).
    q_cent = q_mat @ cent_mat.T  # (n_q, C)
    order = np.lexsort((np.broadcast_to(cent_ids, q_cent.shape), -q_cent), axis=1)
    probes = cent_ids[order[:, :nprobe]]  # (n_q, nprobe)
    bc = spark.sparkContext.broadcast((q_ids, q_mat, cent_ids, cent_mat, probes))

    out_schema = StructType(
        [
            StructField("query_id", LongType(), False),
            StructField("neighbor_id", LongType(), False),
            StructField("_cos", DoubleType(), False),
        ]
    )

    def ivf_topk_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, mat_q, ids_c, mat_c, probe_sets = bc.value
        for batch in batches:
            if not len(batch):
                continue
            v_ids = batch[id_col].to_numpy()
            v_mat = np.array([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            v_mat /= np.linalg.norm(v_mat, axis=1, keepdims=True)
            # Assign each vector to its max-cosine centroid (argmax picks the
            # lowest index on ties; ids_c is sorted ascending).
            assign = ids_c[np.argmax(v_mat @ mat_c.T, axis=1)]  # (n_v,)
            sims = v_mat @ mat_q.T  # (n_v, n_q)
            allowed = (assign[:, None, None] == probe_sets[None, :, :]).any(-1)
            sims[~allowed] = -np.inf
            sims[v_ids[:, None] == ids_q[None, :]] = -np.inf
            take = min(k + 1, len(v_ids))
            part = np.argpartition(-sims, take - 1, axis=0)[:take]
            qi = np.broadcast_to(ids_q, part.shape)
            yield pd.DataFrame(
                {
                    "query_id": qi.ravel(),
                    "neighbor_id": v_ids[part].ravel().astype("int64"),
                    "_cos": np.take_along_axis(sims, part, axis=0).ravel(),
                }
            )

    c = fanout(embeddings.select(F.col(id_col), F.col(vec_col)))
    scored = c.mapInPandas(ivf_topk_kernel, out_schema).filter(F.col("_cos") != float("-inf"))
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
    block_rows: int = 1024,
    n_blocks: int | None = None,
    small_corpus: bool = False,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-duplicate scan).

    Default plan — **block-tiled exact all-pairs, fully distributed**: rows
    hash into ``n_blocks`` blocks (≈ ``block_rows`` rows each); every
    unordered block pair (i ≤ j) is one tile, and each vector is routed to
    its tiles by exploding a tile-id list (left copy to tiles (blk, j ≥ blk),
    right copy to tiles (i < blk, blk)), so each unordered *row* pair is
    scored in exactly one tile. ``groupBy(tile).applyInPandas`` scores a tile
    as one BLAS GEMM and emits only above-threshold pairs. Nothing is ever
    collected to the driver; per-task memory is two blocks
    (O(block_rows·d)), so the executor footprint is flat no matter the
    corpus size. Replication factor is n_blocks+1 copies of the (id, vec)
    projection — the price of exact all-pairs without a broadcast.

    All-pairs compute is O(n²·d) by nature: beyond ~1M rows pre-bucket the
    corpus (:func:`sign_bucket` / MinHash bands) and run this per bucket —
    the tiling composes unchanged inside each bucket.

    ``small_corpus=True`` switches to the legacy broadcast path (collect the
    normalized matrix to the driver, one GEMM per partition against it):
    marginally faster when the whole matrix comfortably fits the driver, and
    a driver OOM when it doesn't — opt-in only.
    """
    if small_corpus:
        return _cosine_neardup_broadcast(embeddings, threshold, id_col, vec_col)

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    src = embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if n_blocks is None:
        n = src.count()  # metadata-only for parquet scans — not a collect
        n_blocks = max(1, min(256, -(-n // block_rows)))
    nb = n_blocks

    blk = F.pmod(F.hash(F.col("_id")), F.lit(nb)).cast("int")
    sided = src.withColumn("_blk", blk)
    left = sided.select(
        "_id",
        "_v",
        F.col("_blk").alias("ti"),
        F.explode(F.sequence(F.col("_blk"), F.lit(nb - 1))).alias("tj"),
        F.lit(0).alias("side"),
    )
    right = sided.filter(F.col("_blk") > 0).select(
        "_id",
        "_v",
        F.explode(F.sequence(F.lit(0), F.col("_blk") - 1)).alias("ti"),
        F.col("_blk").alias("tj"),
        F.lit(1).alias("side"),
    )

    out_schema = StructType(
        [
            StructField("id_a", LongType(), False),
            StructField("id_b", LongType(), False),
            StructField("cosine", DoubleType(), False),
        ]
    )

    def _norm_mat(frame: pd.DataFrame) -> tuple:
        ids = frame["_id"].to_numpy()
        mat = np.array([np.asarray(v, dtype=np.float64) for v in frame["_v"]])
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        return ids, mat

    empty = pd.DataFrame(
        {
            "id_a": pd.Series(dtype="int64"),
            "id_b": pd.Series(dtype="int64"),
            "cosine": pd.Series(dtype="float64"),
        }
    )

    def tile_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        diag = pdf["ti"].iat[0] == pdf["tj"].iat[0]
        a = pdf[pdf["side"] == 0]
        if not len(a):
            return empty
        ids_a, mat_a = _norm_mat(a)
        if diag:
            sims = mat_a @ mat_a.T
            ii, jj = np.nonzero((sims >= threshold) & (ids_a[:, None] < ids_a[None, :]))
            pa, pb, cos = ids_a[ii], ids_a[jj], sims[ii, jj]
        else:
            b = pdf[pdf["side"] == 1]
            if not len(b):
                return empty
            ids_b, mat_b = _norm_mat(b)
            sims = mat_a @ mat_b.T
            ii, jj = np.nonzero(sims >= threshold)
            xa, xb = ids_a[ii], ids_b[jj]
            # different blocks, hence different ids — canonicalize the order
            pa, pb, cos = np.minimum(xa, xb), np.maximum(xa, xb), sims[ii, jj]
        return pd.DataFrame(
            {
                "id_a": pa.astype("int64"),
                "id_b": pb.astype("int64"),
                "cosine": np.round(cos, 4),
            }
        )

    return (
        left.unionByName(right)
        .groupBy("ti", "tj")
        .applyInPandas(tile_kernel, out_schema)
        .orderBy("id_a", "id_b")
    )


def _cosine_neardup_broadcast(
    embeddings: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Legacy small-corpus path: broadcast the row-normalized matrix (numpy,
    via a Spark broadcast variable); ``mapInPandas`` computes each partition's
    block of the similarity matrix as ``block @ full.T`` and emits the
    above-threshold upper triangle. O(n·d) driver memory — see
    :func:`cosine_neardup_pairs` for the scale-safe default."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    spark = embeddings.sparkSession
    pdf = embeddings.select(F.col(id_col), F.col(vec_col)).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))

    out_schema = StructType(
        [
            StructField("id_a", LongType(), False),
            StructField("id_b", LongType(), False),
            StructField("cosine", DoubleType(), False),
        ]
    )

    def neardup_bcast_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = bc.value
        for batch in batches:
            if not len(batch):
                continue
            b_ids = batch[id_col].to_numpy()
            b_mat = np.array([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            b_mat /= np.linalg.norm(b_mat, axis=1, keepdims=True)
            sims = b_mat @ all_mat.T
            rows_i, cols_j = np.nonzero(
                (sims >= threshold) & (b_ids[:, None] < all_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": b_ids[rows_i].astype("int64"),
                    "id_b": all_ids[cols_j].astype("int64"),
                    "cosine": np.round(sims[rows_i, cols_j], 4),
                }
            )

    dist = fanout(embeddings.select(F.col(id_col), F.col(vec_col)))
    return dist.mapInPandas(neardup_bcast_kernel, out_schema).orderBy("id_a", "id_b")


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Final-iteration assignment of deterministic Lloyd's k-means (see
    :func:`kmeans_cluster_stats` for the algorithm and scale shape).
    Returns ``(id, cluster_id, vec, label)`` — the shared front half of
    cluster-stats and SemDeDup-style within-cluster operators.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    spark = embeddings.sparkSession
    emb = embeddings.select(id_col, vec_col, label_col)

    init = sorted(
        emb.filter(F.col(id_col) < k).select(id_col, vec_col).collect(),
        key=lambda r: r[0],
    )
    c_ids = [int(r[0]) for r in init]
    c_mat = np.array([np.asarray(r[1], dtype=np.float64) for r in init])

    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("cluster_id", LongType(), False),
            StructField(vec_col, ArrayType(FloatType()), True),
            StructField(label_col, IntegerType(), True),
        ]
    )

    def make_kernel(bc):
        def kmeans_assign_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            ids_c, mat_c = bc.value
            ids_c = np.asarray(ids_c, dtype="int64")
            for batch in batches:
                if not len(batch):
                    continue
                x = np.array(
                    [np.asarray(v, dtype=np.float64) for v in batch[vec_col]]
                )
                # argmin over squared L2; first occurrence = lowest cid
                # because the centroid matrix is sorted by id.
                d2 = ((x[:, None, :] - mat_c[None, :, :]) ** 2).sum(axis=-1)
                yield pd.DataFrame(
                    {
                        id_col: batch[id_col].to_numpy(),
                        "cluster_id": ids_c[np.argmin(d2, axis=1)],
                        vec_col: batch[vec_col],
                        label_col: batch[label_col].to_numpy(),
                    }
                )

        return kmeans_assign_kernel

    assigned = None
    for it in range(iters):
        bc = spark.sparkContext.broadcast((c_ids, c_mat))
        assigned = fanout(emb).mapInPandas(make_kernel(bc), out_schema)
        if it < iters - 1:
            means = (
                assigned.select(
                    "cluster_id", F.posexplode(vec_col).alias("pos", "val")
                )
                .groupBy("cluster_id", "pos")
                .agg(F.avg(F.col("val").cast("double")).alias("val"))
                .collect()
            )
            by_cluster: dict[int, dict[int, float]] = {}
            for r in means:
                by_cluster.setdefault(int(r["cluster_id"]), {})[int(r["pos"])] = r["val"]
            c_ids = sorted(by_cluster)
            c_mat = np.array(
                [
                    [by_cluster[c][p] for p in range(len(by_cluster[c]))]
                    for c in c_ids
                ]
            )
    return assigned


def kmeans_cluster_stats(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Lloyd's k-means over the embedding column, fully deterministic:
    centroids initialize to the first ``k`` vectors by id, each iteration
    assigns every vector to its nearest (squared-L2) centroid — ties to the
    lowest centroid id — then recomputes centroids as element-wise means.
    Returns per-cluster stats after the final assignment.

    Scale shape (the IVF training step at 100 TB): the centroid matrix is
    O(k·d) — broadcast; assignment is one vectorized distance kernel per
    Arrow batch (`mapInPandas`, no shuffle); the centroid update is a
    posexplode → (cluster, dim) grouped mean — map-side combined, exchange
    carries k·d rows — collected back only as the k·d aggregate. Driver
    traffic per iteration is exactly the centroid matrix, never the data.
    Empty clusters drop out (their centroid has no members to average),
    matching the declarative oracle.
    """
    assigned = kmeans_assign(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col, label_col=label_col
    )
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg(F.col(label_col).cast("double")), 4).alias("avg_label"),
        )
        .orderBy("cluster_id")
    )


def semdedup_stats(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public method):
    semantic deduplication that confines the quadratic cosine comparison to
    k-means clusters. A row is a semantic duplicate iff some *lower-id* row
    in the SAME cluster has cosine ≥ ``tau`` (deterministic keep-lowest-id
    rule, the same convention as the MinHash/SimHash dedup family). Returns
    per-cluster ``(n_members, n_dups, n_kept, dup_rate)``.

    100 TB shape: the only all-pairs work is *within* a cluster — pick k so
    clusters hold ~1-10k rows (k ≈ n/5000) and per-cluster cost is bounded
    while total work is n·(n/k), linear in n for k ∝ n. One shuffle keyed on
    cluster_id (`applyInPandas`), then a single BLAS GEMM per cluster in
    row-blocks (tile memory bounded at BLOCK × c regardless of cluster
    size) — no per-pair join rows ever materialize, no broadcast of the
    corpus, no global cartesian. Contrast with `cosine_neardup_pairs`
    (exact all-pairs, tiled): SemDeDup trades recall across cluster
    boundaries for an n²/k cost cut — the standard embedding-space analog
    of banded MinHash.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    assigned = kmeans_assign(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col, label_col=label_col
    ).select(id_col, "cluster_id", vec_col)

    out_schema = StructType(
        [
            StructField("cluster_id", LongType(), False),
            StructField("n_members", LongType(), False),
            StructField("n_dups", LongType(), False),
        ]
    )
    t = float(tau)

    def semdedup_stats_kernel(key, pdf):
        # One GEMM per cluster instead of a per-pair interpreted HOF
        # expression (measured 4.7 s -> ~1 s at sf0.1). Row blocks bound the
        # similarity-tile memory to BLOCK × c doubles regardless of cluster
        # size; keep-lowest-id rule = "any strictly-earlier row ≥ tau" after
        # an id sort.
        pdf = pdf.sort_values(id_col)
        x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0.0] = 1.0
        xn = x / norms[:, None]
        c = len(xn)
        dup = np.zeros(c, dtype=bool)
        block = 1024
        for lo in range(0, c, block):
            hi = min(lo + block, c)
            s = xn[lo:hi] @ xn.T  # (hi-lo, c)
            mask = s >= t
            # only strictly-earlier columns count
            cols = np.arange(c)[None, :]
            rows = np.arange(lo, hi)[:, None]
            dup[lo:hi] = (mask & (cols < rows)).any(axis=1)
        return pd.DataFrame(
            {
                "cluster_id": [int(key[0])],
                "n_members": [c],
                "n_dups": [int(dup.sum())],
            }
        )

    per_cluster = assigned.groupBy("cluster_id").applyInPandas(semdedup_stats_kernel, out_schema)
    return per_cluster.select(
        "cluster_id",
        "n_members",
        "n_dups",
        (F.col("n_members") - F.col("n_dups")).alias("n_kept"),
        F.round(F.col("n_dups") / F.col("n_members"), 4).alias("dup_rate"),
    ).orderBy("cluster_id")


def knn_graph(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 1024,
    n_blocks: int | None = None,
) -> DataFrame:
    """Exact k-nearest-neighbor graph over the whole corpus (every vector's
    top-k cosine neighbors) — the similarity-graph build behind
    cluster-then-dedup and graph-based curation pipelines.

    Same block tiling as :func:`cosine_neardup_pairs` (each unordered block
    pair scored once as one GEMM, nothing collected to the driver), but each
    tile emits a *partial* top-k per row for BOTH sides of the tile, so the
    shuffle out of the tiles carries ≤ n_blocks·k candidate rows per vector
    instead of the full similarity matrix. A final per-vector window
    (``row_number`` over 4dp-grid cosine desc, neighbor id asc) reduces candidates to
    the global top-k. All-pairs compute is O(n²·d) by nature — beyond ~1M
    rows, pre-bucket and build the graph per bucket exactly as for the
    near-dup scan.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType
    from pyspark.sql.window import Window

    src = embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if n_blocks is None:
        n = src.count()
        n_blocks = max(1, min(256, -(-n // block_rows)))
    nb = n_blocks

    blk = F.pmod(F.hash(F.col("_id")), F.lit(nb)).cast("int")
    sided = src.withColumn("_blk", blk)
    left = sided.select(
        "_id", "_v",
        F.col("_blk").alias("ti"),
        F.explode(F.sequence(F.col("_blk"), F.lit(nb - 1))).alias("tj"),
        F.lit(0).alias("side"),
    )
    right = sided.filter(F.col("_blk") > 0).select(
        "_id", "_v",
        F.explode(F.sequence(F.lit(0), F.col("_blk") - 1)).alias("ti"),
        F.col("_blk").alias("tj"),
        F.lit(1).alias("side"),
    )

    out_schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("neighbor_id", LongType(), False),
            StructField("cos", DoubleType(), False),
        ]
    )
    empty = pd.DataFrame(
        {
            "vec_id": pd.Series(dtype="int64"),
            "neighbor_id": pd.Series(dtype="int64"),
            "cos": pd.Series(dtype="float64"),
        }
    )

    def _norm_mat(frame: pd.DataFrame) -> tuple:
        ids = frame["_id"].to_numpy()
        mat = np.array([np.asarray(v, dtype=np.float64) for v in frame["_v"]])
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        return ids, mat

    def _partial_topk(ids_q, ids_c, sims) -> pd.DataFrame:
        """Per-row top-k of a query-block × candidate-block score matrix.

        Selection order is (cosine on a 4dp grid DESC, neighbor id ASC) —
        the same total order the global window and the SQL oracles use.
        Ranking raw GEMM doubles here would let a last-ulp difference vs
        another engine's sequential dot product swap which neighbor makes
        the cut at the rank-k boundary; on the 4dp grid such near-ties
        collapse and the id tie-break decides deterministically. The
        composite key rq·(m+1) − id_rank is exact lexicographic order in
        one float64 (|rq| ≤ 10^4, id_rank < m+1 ⇒ well under 2^53)."""
        s4 = np.where(np.isfinite(sims), sims, -2.0) * 10000.0  # -inf diag → below any real cos
        t = np.trunc(s4)
        rq = np.where(np.abs(s4 - t) == 0.5, t + np.sign(s4), np.rint(s4))
        id_rank = np.argsort(np.argsort(ids_c))
        comp = rq * (len(ids_c) + 1.0) - id_rank
        kk = min(k, sims.shape[1])
        part = np.argpartition(-comp, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(ids_q, kk)
        cols = ids_c[part.ravel()]
        vals = np.take_along_axis(sims, part, axis=1).ravel()
        return pd.DataFrame({"vec_id": rows, "neighbor_id": cols, "cos": vals})

    def tile_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        diag = pdf["ti"].iat[0] == pdf["tj"].iat[0]
        a = pdf[pdf["side"] == 0]
        if not len(a):
            return empty
        ids_a, mat_a = _norm_mat(a)
        if diag:
            sims = mat_a @ mat_a.T
            np.fill_diagonal(sims, -np.inf)  # no self-neighbors
            if sims.shape[1] < 2:
                return empty
            out = _partial_topk(ids_a, ids_a, sims)
            return out[np.isfinite(out["cos"])]
        b = pdf[pdf["side"] == 1]
        if not len(b):
            return empty
        ids_b, mat_b = _norm_mat(b)
        sims = mat_a @ mat_b.T
        return pd.concat(
            [_partial_topk(ids_a, ids_b, sims), _partial_topk(ids_b, ids_a, sims.T)]
        )

    cand = (
        left.unionByName(right)
        .groupBy("ti", "tj")
        .applyInPandas(tile_kernel, out_schema)
    )
    # Global reduce ranks on the same (4dp grid DESC, id ASC) total order as
    # the tile kernels and the SQL oracles (see _partial_topk).
    w = Window.partitionBy("vec_id").orderBy(
        F.desc(F.round(F.col("cos") * 10000, 0)), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "vec_id",
            "neighbor_id",
            F.round("cos", 4).alias("cosine"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("vec_id", "rnk")
    )


def norm_stats_by_label(
    embeddings: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label L2-norm distribution of an embedding column — the sanity
    report run before any cosine-based op (un-normalized slices break
    cosine ranking silently).

    The norm is a fused ``zip_with``/``aggregate`` JVM expression
    (:func:`norm` — float32 cast to double exactly, summed left-to-right,
    matching the oracle's double math), so the whole operator is a
    projection + one hash-agg to |labels| rows: zero Python, one tiny
    exchange, scan-bandwidth bound at any corpus size.
    """
    nrm = norm(F.col(vec_col))
    return (
        embeddings.select(F.col(label_col), nrm.alias("nrm"))
        .groupBy(label_col)
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("nrm"), 4).alias("avg_norm"),
            F.round(F.min("nrm"), 4).alias("min_norm"),
            F.round(F.max("nrm"), 4).alias("max_norm"),
        )
        .orderBy(label_col)
    )


def quantized_topk(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt_buckets: int = 64,
) -> DataFrame:
    """Int8-quantized maximum-inner-product top-k — the bandwidth-saving
    scale path for similarity search: per-vector symmetric quantization
    (``scale = max|v| / 127``, ``q = floor(v/scale + 0.5)``) shrinks the
    candidate side 4× (int8 vs float32) and turns scoring into exact
    integer arithmetic, so the approximate score
    ``(Σ qa·qb) · scale_a · scale_b`` is bit-identical on every engine —
    no float-summation-order drift anywhere in the ranking.

    Execution is pure Catalyst: quantization is a projection (HOF
    ``transform``), the 10-row query side broadcasts into a sanctioned
    nested-loop join, and the integer dot is a fused ``zip_with`` /
    ``aggregate``. Top-k runs in two phases — a salted per-bucket
    ``row_number`` (≤ k·salt_buckets survivors per query) then the global
    rank — so no single reducer ever sees the full candidate set; at
    100 TB each of the |queries|·salt_buckets partitions carries
    ~n/salt_buckets rows.
    """
    from pyspark.sql.window import Window

    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qtab = (
        embeddings.select(F.col(id_col), dv.alias("_dv"))
        # nullif guards the all-zero vector: its elements quantize to 0 via
        # the coalesce below instead of dividing by zero.
        .withColumn(
            "_scale",
            F.nullif(
                F.array_max(F.transform("_dv", lambda x: F.abs(x))) / F.lit(127.0),
                F.lit(0.0),
            ),
        )
        .select(
            id_col,
            F.coalesce(F.col("_scale"), F.lit(0.0)).alias("scale"),
            F.transform(
                "_dv",
                lambda x: F.coalesce(
                    F.floor(x / F.col("_scale") + F.lit(0.5)), F.lit(0)
                ),
            ).alias("qv"),
        )
    )
    queries = qtab.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"),
        F.col("scale").alias("q_scale"),
        F.col("qv").alias("q_qv"),
    )
    cand = fanout(qtab).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("scale").alias("c_scale"),
        F.col("qv").alias("c_qv"),
    )
    idot = F.aggregate(
        F.zip_with("q_qv", "c_qv", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        cand.join(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (idot * F.col("q_scale") * F.col("c_scale")).alias("_qdot"),
        )
    )
    # Phase 1: per-(query, salt-bucket) partial top-k bounds every reducer.
    w_salt = Window.partitionBy(
        "query_id", F.pmod(F.hash("neighbor_id"), F.lit(salt_buckets))
    ).orderBy(F.desc("_qdot"), F.asc("neighbor_id"))
    survivors = (
        scored.withColumn("_prnk", F.row_number().over(w_salt))
        .filter(F.col("_prnk") <= k)
        .drop("_prnk")
    )
    # Phase 2: global rank over ≤ k·salt_buckets survivors per query.
    w = Window.partitionBy("query_id").orderBy(F.desc("_qdot"), F.asc("neighbor_id"))
    return (
        survivors.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("_qdot", 4).alias("qdot"), "rnk")
        .orderBy("query_id", "rnk")
    )


def _cov_one_pass(embeddings: DataFrame, vec_col: str = "embedding"):
    """(n, covariance matrix) of an embedding column via ONE distributed
    pass — the canonical "partial-aggregate your linear algebra" shape.

    Each partition reduces its rows to a d×d Gram partial plus a sum
    vector and count with a float64 BLAS GEMM (``X.T @ X``); partials are
    d²+d+1 numbers regardless of row count, so the merge is a tiny
    element-wise aggregation. Centering happens analytically on the merged
    totals (``cov = (G − n·μμᵀ)/(n−1)``) — no second scan. At 100 TB the
    only data-sized cost is the scan.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    part_schema = StructType(
        [
            StructField("n", LongType(), False),
            StructField("s", ArrayType(DoubleType()), False),
            StructField("g", ArrayType(DoubleType()), False),
        ]
    )

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, g = 0, None, None
        for batch in batches:
            if not len(batch):
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in batch.iloc[:, 0]])
            n += len(x)
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]})

    parts = fanout(embeddings.select(vec_col)).mapInPandas(partials, part_schema).collect()
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    g = np.sum([np.asarray(r["g"]) for r in parts], axis=0)
    d = s.shape[0]
    mu = s / n
    cov = (g.reshape(d, d) - n * np.outer(mu, mu)) / max(n - 1, 1)
    return n, cov


def pca_variance_spectrum(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    top_k: int = 10,
) -> DataFrame:
    """PCA variance spectrum of an embedding column — see
    :func:`_cov_one_pass` for the single-scan distributed covariance; the
    d×d eigendecomposition runs on the driver (d², not n, sized)."""
    import numpy as np

    _, cov = _cov_one_pass(embeddings, vec_col)
    d = cov.shape[0]
    evals = np.linalg.eigvalsh(cov)[::-1]  # descending
    total = float(evals.sum())
    rows = []
    cum = 0.0
    for i in range(min(top_k, d)):
        cum += float(evals[i])
        rows.append(
            (
                i + 1,
                round(float(evals[i]), 6),
                round(float(evals[i]) / total, 4),
                round(cum / total, 4),
            )
        )
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        rows, "component int, eigenvalue double, var_share double, cum_share double"
    )


def pca_spectrum_certificate(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    top_k: int = 10,
) -> DataFrame:
    """Hash-gatable PCA spectrum certificate (round-7 close of the
    embedding_pca_variance no_oracle row, the ann_recall_report pattern):
    the eigendecomposition itself is not SQL-expressible, so the hashed
    payload is (a) the covariance TRACE as a 4-significant-digit mantissa
    (``trace_sig4``) plus decimal exponent (``trace_exp``) — coarse
    relative units (r7 ADVICE) that a SQL oracle recomputes independently
    as Σ per-dimension sample variances without cross-engine
    summation-order rounding flakes — and (b) boolean certificates that
    the computed eigenpairs actually diagonalize that covariance: max
    ‖cov·vᵢ − λᵢvᵢ‖∞ within 1e-8·scale, eigenvector orthonormality within
    1e-10, shares descending in [0, 1], and Σλ equal to the trace within
    1e-9 relative. LAPACK residuals are ~1e-14, so the margins never
    flap; a wrong spectrum (or a covariance pass that dropped rows) flips
    a boolean or shifts the trace mantissa and fails the gate. The
    numeric spectrum report stays available as
    :func:`pca_variance_spectrum`."""
    import numpy as np

    n, cov = _cov_one_pass(embeddings, vec_col)
    d = cov.shape[0]
    evals, evecs = np.linalg.eigh(cov)
    evals, evecs = evals[::-1], evecs[:, ::-1]  # descending
    trace = float(np.trace(cov))
    if trace <= 0.0:
        # collapsed corpus (all-identical or single-row embeddings): shares
        # are undefined — fail loudly with the cause, not NaN certificates.
        # <= catches the tiny NEGATIVE trace a near-constant corpus can
        # produce via G − n·μμᵀ cancellation (r8 review), which would
        # otherwise NaN the log10 mantissa extraction below.
        raise ValueError(
            "pca_spectrum_certificate: covariance trace is zero or "
            f"negative-from-cancellation ({trace!r}, n={n}) — embedding "
            "corpus has no variance; PCA shares undefined"
        )
    scale = max(1.0, float(np.abs(evals).max()))
    resid = float(np.abs(cov @ evecs - evecs * evals[None, :]).max())
    ortho = float(np.abs(evecs.T @ evecs - np.eye(d)).max())
    shares = evals / trace
    certified = bool(resid <= 1e-8 * scale)
    orthonormal = bool(ortho <= 1e-10)
    descending = bool(
        np.all(np.diff(evals) <= 1e-12 * scale)
        and np.all(shares[: min(top_k, d)] >= -1e-12)
        and np.all(shares[: min(top_k, d)] <= 1.0 + 1e-12)
    )
    sums_to_one = bool(abs(float(evals.sum()) - trace) <= 1e-9 * max(1.0, abs(trace)))
    # Trace in 4-significant-digit mantissa + exponent units (r7 ADVICE):
    # the old exact trace*1e4 integer put a ~1e-4-relative quantum against
    # a cross-engine summation disagreement that grows with n (distributed
    # Gram partials + G - n*mu*mu' centering here vs streaming VAR_SAMP in
    # the oracle). A 4-sig-digit mantissa keeps a real cross-engine value
    # check while making the .5-boundary flake window ~1e-9 relative.
    exp = int(np.floor(np.log10(trace)))
    trace_sig4 = int(_spark_round(np.array([trace / 10.0 ** (exp - 3)]), 0)[0])
    # Mantissa-overflow normalization (r8 ADVICE): a trace straddling a
    # power of 10 cross-engine (999999.99 vs 1000000.01) would otherwise
    # encode as (10000, 5) here vs (1000, 6) in the oracle — numerically
    # equal, hash-mismatched. Fold 10000 back to 1000 and bump the
    # exponent; the oracle SQL applies the identical CASE.
    if trace_sig4 == 10000:
        trace_sig4, exp = 1000, exp + 1
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [(min(top_k, d), trace_sig4, exp, certified and orthonormal, descending, sums_to_one)],
        "n_components int, trace_sig4 bigint, trace_exp int, eigenpairs_certified boolean, "
        "shares_descending boolean, shares_sum_to_one boolean",
    )


def pq_distortion_columnar(
    embeddings: DataFrame,
    n_subspaces: int = 4,
    n_centroids: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ORACLE CROSS-CHECK PATH — not the default. :func:`pq_distortion`
    (the BLAS ``mapInPandas`` kernel) is the production implementation;
    this Catalyst-expression variant is kept for the engine-side diff in
    ``tests/test_ivfpq_blas.py``.

    Product-quantization codebook report: split each vector into
    ``n_subspaces`` contiguous sub-vectors, assign every sub-vector to its
    nearest codeword (deterministic codebook: the ``n_centroids``
    lowest-``id_col`` vectors' sub-vectors — the seeding step of a PQ
    trainer, before Lloyd iterations), and roll up per (subspace, codeword)
    the assignment count and total squared-error distortion. This is the
    measurement loop of IVF-PQ index building: distortion per codeword
    tells you which subspaces need more centroids before you compress a
    trillion-vector corpus 32x.

    Plan: the codebook is a k-row driver pull (k = ``n_centroids``)
    broadcast as literals into ONE fused JVM projection — per row,
    subspaces x centroids squared-L2s via sequential ``aggregate`` folds
    (deterministic summation order, so the 6dp-rounded distances are
    reproducible across engines), argmin via ``array_sort`` on (distance,
    codeword) structs, then a single map-side-combined aggregate to
    |subspaces|x|codewords| rows. Distortion is summed in integer
    micro-units (round first, then BIGINT) so the rollup is exact. No
    shuffle of the vector table beyond the final tiny aggregate.
    """
    sub_d = dim // n_subspaces
    seed = [
        [float(v) for v in r[vec_col]]
        for r in embeddings.orderBy(id_col).limit(n_centroids).collect()
    ]

    per_sub = []
    for s in range(n_subspaces):
        off = s * sub_d
        sub = F.slice(F.col(vec_col), off + 1, sub_d)
        # One 2-D literal codebook array + ONE transform per subspace
        # (instead of n_centroids separate fold expressions — that version
        # produced a codegen blob measured at ~5 s for 2k rows at sf0.1;
        # this one is ~0.4 s with identical values: same sequential fold
        # order inside each distance).
        codebook = F.array(
            *[
                F.array(*[F.lit(v) for v in seed[c][off : off + sub_d]])
                for c in range(n_centroids)
            ]
        )
        dists = F.zip_with(
            codebook,
            F.sequence(F.lit(0), F.lit(n_centroids - 1)),
            lambda carr, cid: F.struct(
                F.round(
                    F.aggregate(
                        F.zip_with(
                            sub,
                            carr,
                            lambda a, b: (a.cast("double") - b)
                            * (a.cast("double") - b),
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    ),
                    6,
                ).alias("d"),
                cid.cast("int").alias("c"),
            ),
        )
        best = F.array_sort(dists)[0]
        per_sub.append(
            F.struct(
                F.lit(s).alias("subspace"),
                best["c"].alias("centroid"),
                best["d"].alias("d"),
            )
        )
    assigned = embeddings.select(
        F.explode(F.array(*per_sub)).alias("a")
    ).select("a.subspace", "a.centroid", "a.d")
    return (
        assigned.groupBy("subspace", "centroid")
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            F.sum(F.round(F.col("d") * 1000000, 0).cast("long")).alias(
                "distortion_micro"
            ),
        )
        .orderBy("subspace", "centroid")
    )


def pq_distortion(
    embeddings: DataFrame,
    n_subspaces: int = 4,
    n_centroids: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codebook distortion report, BLAS-kernel default (round-7
    promotion; the Catalyst variant survives as
    :func:`pq_distortion_columnar` for the engine-side cross-check).

    Identical semantics to the columnar path / DuckDB oracle: nearest
    codeword per (row, subspace) by 6dp-rounded squared-L2 (Spark fold
    order via :func:`_fold_sqdist`, Spark rounding via
    :func:`_spark_round`, ties → lowest codeword id), distortion summed in
    exact integer micro-units. The integer rollup is why fold-order
    replication matters here: ONE row whose GEMM-computed distance rounds
    differently at 6dp would shift ``distortion_micro`` and break the
    value hash.

    Scale shape: codebook broadcast; one ``mapInPandas`` pass reduces each
    partition to ≤ subspaces·centroids partial rows (count + micro-unit
    sum), so the shuffle is O(S·C·partitions) regardless of corpus size —
    map-side combine done explicitly inside the kernel.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    spark = embeddings.sparkSession
    sub_d = dim // n_subspaces
    cent = np.array(
        [
            [float(v) for v in r[vec_col]]
            for r in embeddings.orderBy(id_col).limit(n_centroids).collect()
        ],
        dtype=np.float64,
    )
    bc = spark.sparkContext.broadcast(cent)

    part_schema = StructType(
        [
            StructField("subspace", IntegerType(), False),
            StructField("centroid", IntegerType(), False),
            StructField("n", LongType(), False),
            StructField("micro", LongType(), False),
        ]
    )

    def pq_distortion_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cb = bc.value
        counts = np.zeros((n_subspaces, n_centroids), dtype="int64")
        micro = np.zeros((n_subspaces, n_centroids), dtype="int64")
        for batch in batches:
            if not len(batch):
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            for s in range(n_subspaces):
                off = s * sub_d
                d6 = _spark_round(
                    _fold_sqdist(x[:, off : off + sub_d], cb[:, off : off + sub_d]), 6
                )
                code = np.argmin(d6, axis=1)
                best = d6[np.arange(len(x)), code]
                m = _spark_round(best * 1000000.0, 0).astype("int64")
                np.add.at(counts[s], code, 1)
                np.add.at(micro[s], code, m)
        s_idx, c_idx = np.nonzero(counts)
        if len(s_idx):
            yield pd.DataFrame(
                {
                    "subspace": s_idx.astype("int32"),
                    "centroid": c_idx.astype("int32"),
                    "n": counts[s_idx, c_idx],
                    "micro": micro[s_idx, c_idx],
                }
            )

    parts = fanout(embeddings.select(vec_col)).mapInPandas(pq_distortion_kernel, part_schema)
    return (
        parts.groupBy("subspace", "centroid")
        .agg(
            F.sum("n").alias("n_assigned"),
            F.sum("micro").alias("distortion_micro"),
        )
        .orderBy("subspace", "centroid")
    )


def lsh_multiprobe_topk(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 10,
    bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe sign-LSH approximate cosine top-k: each query probes its
    own bucket AND every Hamming-distance-1 bucket (bits+1 probes). The
    classic multi-probe LSH trade (Lv et al. 2007): ~(bits+1)x the
    candidates of single-probe for a large recall jump (measured in
    ann_recall_report: 0.14 single-probe → ~0.6+ multi-probe at 4 bits)
    with the same index and no extra tables. Candidates still carry ONE
    bucket each — only the tiny query side explodes, so the join stays
    candidate-partitioned and broadcast-probed at any corpus size."""
    from pyspark.sql.window import Window

    bucketed = embeddings.select(
        F.col(id_col), F.col(vec_col), sign_bucket(F.col(vec_col), bits).alias("bucket")
    )

    def _flip(p: int) -> Column:  # 1-based bit position
        flipped = F.when(
            F.substring("bucket", p, 1) == "1", F.lit("0")
        ).otherwise(F.lit("1"))
        return F.concat(
            F.substring("bucket", 1, p - 1), flipped,
            F.substring("bucket", p + 1, bits - p),
        )

    probes = F.array(F.col("bucket"), *[_flip(p) for p in range(1, bits + 1)])
    q = (
        bucketed.filter(F.col(id_col) < num_queries)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb"),
                F.explode(probes).alias("bucket"))
    )
    c = fanout(
        bucketed.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_emb"), "bucket"
        )
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("q_emb"), F.col("c_emb")).alias("_cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 4).alias("cosine"), "rnk")
        .orderBy("query_id", "rnk")
    )


def embedding_decontamination(
    embeddings: DataFrame,
    num_eval: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Benchmark-contamination screen in embedding space: treat the first
    ``num_eval`` vectors as the held-out eval set and, for every other
    corpus vector, compute its maximum cosine to ANY eval vector; report
    per-label counts above the 0.95 / 0.99 near-duplicate thresholds plus
    the per-label max. The embedding twin of hashed-n-gram
    decontamination — catches paraphrased/reformatted eval leakage that
    exact n-grams miss.

    Plan: the eval set is a k-row pull broadcast as a pre-NORMALIZED 2-D
    literal; per corpus row ONE fused transform computes all k dots, and
    max-cosine = array_max(dots)/|v| (one norm per row). No shuffle until
    the |labels|-row rollup — the corpus is scanned once, embarrassingly
    parallel, the same shape at any scale. Threshold comparisons use the
    4dp-rounded cosine so the counts are engine-reproducible."""
    import math

    seed = [
        [float(v) for v in r[vec_col]]
        for r in embeddings.orderBy(id_col).limit(num_eval).collect()
    ]
    normed = []
    for i, vec in enumerate(seed):
        nrm = math.sqrt(sum(x * x for x in vec))
        if nrm == 0.0:
            # r6 ADVICE: fail at plan-build time with a named culprit, not
            # a bare ZeroDivisionError mid-comprehension.
            raise ValueError(
                f"embedding_decontamination: eval vector #{i} "
                f"({id_col} < {num_eval}) has zero norm — cosine undefined"
            )
        normed.append([x / nrm for x in vec])
    ev2d = F.array(*[F.array(*[F.lit(x) for x in e]) for e in normed])
    dots = F.transform(ev2d, lambda e: dot(F.col(vec_col), e))
    mx = F.round(F.array_max(dots) / norm(F.col(vec_col)), 4)
    scored = embeddings.filter(F.col(id_col) >= num_eval).select(
        F.col(label_col).alias("label"), mx.alias("max_cos")
    )
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum((F.col("max_cos") >= 0.95).cast("long")).alias("n_cos95"),
            F.sum((F.col("max_cos") >= 0.99).cast("long")).alias("n_cos99"),
            F.max("max_cos").alias("max_cosine"),
        )
        .orderBy("label")
    )


def ivfpq_topk_columnar(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    n_subspaces: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ORACLE CROSS-CHECK PATH — not the default. :func:`ivfpq_topk` (the
    BLAS ``mapInPandas`` kernel) is the production implementation; this
    column-expression variant exists so a pure-Catalyst engine-side
    evaluation of the identical math can be diffed against the kernel
    (``tests/test_ivfpq_blas.py``) and against the DuckDB oracle. Its cost
    is dominated by whole-stage-codegen compilation of the huge fused
    expressions (~0.5 ms/row at sf10 — SCALE_DECADES decade ratio 4.94),
    which is why it was demoted in round 7.

    IVF-PQ approximate top-k with asymmetric distance computation — the
    FAISS-workhorse index shape: a coarse quantizer routes each vector to
    an inverted list, product-quantization codes compress it to
    ``n_subspaces`` bytes, and at query time every probed candidate is
    scored WITHOUT touching its original vector — the approximate inner
    product is a sum of ``n_subspaces`` LUT entries (query-subvector x
    codeword dot products).

    Deterministic codebooks: the ``n_centroids`` lowest-id vectors serve as
    both the coarse centroids and (sliced) the PQ codewords — the seeding
    convention shared with ivf_topk / pq_distortion, swappable for k-means
    output without changing the plan.

    Scale shape: candidates carry only (coarse list id, PQ codes) through
    the probe join — the 8-byte-per-vector compression IS the point: at a
    trillion vectors the inverted lists + codes fit a fraction of the
    original footprint, the probe join is partition pruning on a bucketed
    coarse id, and scoring never rereads the raw embedding column. All
    math is fused column expressions (6dp-rounded argmins, 4dp-rounded
    ranking with id tie-breaks) so the DuckDB oracle reproduces every
    assignment bit-for-bit.
    """
    from pyspark.sql.window import Window

    sub_d = dim // n_subspaces
    seed = [
        [float(v) for v in r[vec_col]]
        for r in embeddings.orderBy(id_col).limit(n_centroids).collect()
    ]
    cent2d = F.array(*[F.array(*[F.lit(x) for x in c]) for c in seed])

    def _coarse(vc: Column) -> Column:
        """argmax-cosine centroid id (ties -> lowest id), 6dp-rounded."""
        sims = F.zip_with(
            cent2d,
            F.sequence(F.lit(0), F.lit(n_centroids - 1)),
            lambda carr, cid: F.struct(
                F.round(-cosine(vc, carr), 6).alias("d"),
                cid.cast("int").alias("c"),
            ),
        )
        return F.array_sort(sims)[0]["c"]

    def _codes(vc: Column) -> Column:
        """array of per-subspace nearest-codeword ids (6dp L2, ties -> low id)."""
        def _sub_lambda(off: int, sub: Column):
            def fn(carr: Column, cid: Column) -> Column:
                return F.struct(
                    F.round(
                        F.aggregate(
                            F.zip_with(
                                sub,
                                F.slice(carr, off + 1, sub_d),
                                lambda a, b: (a.cast("double") - b)
                                * (a.cast("double") - b),
                            ),
                            F.lit(0.0),
                            lambda acc, v: acc + v,
                        ),
                        6,
                    ).alias("d"),
                    cid.cast("int").alias("c"),
                )

            return fn

        per = []
        for s in range(n_subspaces):
            off = s * sub_d
            sub = F.slice(vc, off + 1, sub_d)
            d2s = F.zip_with(
                cent2d,
                F.sequence(F.lit(0), F.lit(n_centroids - 1)),
                _sub_lambda(off, sub),
            )
            per.append(F.array_sort(d2s)[0]["c"])
        return F.array(*per)

    cands = fanout(embeddings.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        _coarse(F.col(vec_col)).alias("coarse"),
        F.posexplode(_codes(F.col(vec_col))).alias("s", "code"),
    )

    q = embeddings.filter(F.col(id_col) < num_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb")
    )
    # probe lists: each query's nprobe max-cosine coarse ids, ranked in-engine
    probes = (
        q.select(
            "query_id",
            F.explode(
                F.zip_with(
                    cent2d,
                    F.sequence(F.lit(0), F.lit(n_centroids - 1)),
                    lambda carr, cid: F.struct(
                        F.round(-cosine(F.col("q_emb"), carr), 6).alias("d"),
                        cid.cast("int").alias("c"),
                    ),
                )
            ).alias("pc"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.asc(F.col("pc")["d"]), F.asc(F.col("pc")["c"])
                )
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("query_id", F.col("pc")["c"].alias("coarse"))
    )
    # ADC lookup table: (query_id, s, code) -> q_sub . codeword_sub,
    # one flat 64-struct literal-driven array exploded per query row
    flat = []
    for s in range(n_subspaces):
        off = s * sub_d
        qsub = F.slice(F.col("q_emb"), off + 1, sub_d)
        for cid in range(n_centroids):
            carr = F.array(*[F.lit(x) for x in seed[cid][off : off + sub_d]])
            flat.append(
                F.struct(
                    F.lit(s).alias("s"),
                    F.lit(cid).alias("code"),
                    dot(qsub, carr).alias("pdot"),
                )
            )
    lut = q.select("query_id", F.explode(F.array(*flat)).alias("e")).select(
        "query_id", F.col("e")["s"].alias("s"), F.col("e")["code"].alias("code"),
        F.col("e")["pdot"].alias("pdot"),
    )

    scored = (
        cands.join(F.broadcast(probes), "coarse")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(lut), ["query_id", "s", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("pdot").alias("adot"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("adot"), 4)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "neighbor_id",
            F.round("adot", 4).alias("approx_dot"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("query_id", "rnk")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    n_subspaces: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate top-k, BLAS-kernel default (round-7 promotion of
    SCALING.md's named fix; the Catalyst-expression variant survives as
    :func:`ivfpq_topk_columnar` for the engine-side cross-check).

    Same semantics as the columnar path and the DuckDB oracle, bit-for-bit:
    deterministic codebook (the ``n_centroids`` lowest-id vectors), coarse
    routing by 6dp-rounded cosine argmax (ties → lowest centroid id),
    per-subspace PQ codes by 6dp-rounded L2 argmin, and asymmetric distance
    = Σ per-subspace LUT entries ranked at 4dp with id tie-breaks. All
    distance folds replicate Spark's sequential ``aggregate`` summation
    order (:func:`_fold_dot` / :func:`_fold_sqdist`) and Spark's
    ``HALF_UP``-on-shortest-repr rounding (:func:`_spark_round`), so the
    kernel, the columnar path, and the oracle agree exactly
    (``tests/test_ivfpq_blas.py``).

    Scale shape: codebook + query LUTs are O((C+Q·S·C)·d) driver-side and
    broadcast; ONE ``mapInPandas`` pass over the candidate scan assigns
    (coarse id, PQ codes) and scores every probed (query, candidate) pair
    with vectorized table lookups — no explode, no probe join, no
    LUT join, and none of the columnar path's ~0.5 ms/row codegen tax.
    Each partition emits only its local top-(k+1) per query, so the
    shuffle carries ≤ (k+1)·partitions rows regardless of corpus size —
    the same partial-top-k contract as :func:`brute_force_topk` /
    :func:`ivf_topk`. At a trillion vectors the assignment would be
    precomputed and bucketed by coarse id; the kernel is unchanged.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType
    from pyspark.sql.window import Window

    spark = embeddings.sparkSession
    sub_d = dim // n_subspaces
    cent = np.array(
        [
            [float(v) for v in r[vec_col]]
            for r in embeddings.orderBy(id_col).limit(n_centroids).collect()
        ],
        dtype=np.float64,
    )  # (C, dim)

    def _sqnorm_rows(mat: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(mat.shape[0], dtype=np.float64)
        for j in range(mat.shape[1]):
            acc = acc + mat[:, j] * mat[:, j]
        return acc

    cent_norm = np.sqrt(_sqnorm_rows(cent))

    def _coarse_dist(mat: "np.ndarray") -> "np.ndarray":
        """6dp-rounded −cosine to every centroid, Spark fold order."""
        dots = _fold_dot(mat, cent)
        denom = np.sqrt(_sqnorm_rows(mat))[:, None] * cent_norm[None, :]
        return _spark_round(-(dots / denom), 6)

    def _pq_codes(mat: "np.ndarray") -> "np.ndarray":
        """(n, S) per-subspace nearest-codeword ids (6dp L2, ties → low id)."""
        cols = []
        for s in range(n_subspaces):
            off = s * sub_d
            d6 = _spark_round(
                _fold_sqdist(mat[:, off : off + sub_d], cent[:, off : off + sub_d]), 6
            )
            cols.append(np.argmin(d6, axis=1))
        return np.stack(cols, axis=1)

    qrows = (
        embeddings.filter(F.col(id_col) < num_queries).select(id_col, vec_col).collect()
    )
    q_ids = np.array([r[0] for r in qrows], dtype="int64")
    q_mat = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
    # Probe lists: nprobe lowest 6dp-rounded −cosine, ties → lowest id
    # (stable argsort over ids already in ascending order).
    qd = _coarse_dist(q_mat)
    probes = np.argsort(qd, axis=1, kind="stable")[:, :nprobe]  # (Q, nprobe)
    # ADC LUT: lut[q, s, c] = q_subvector · codeword_subvector, fold order.
    lut = np.stack(
        [
            _fold_dot(q_mat[:, s * sub_d : (s + 1) * sub_d],
                      cent[:, s * sub_d : (s + 1) * sub_d])
            for s in range(n_subspaces)
        ],
        axis=1,
    )  # (Q, S, C)
    bc = spark.sparkContext.broadcast((q_ids, probes, lut))

    out_schema = StructType(
        [
            StructField("query_id", LongType(), False),
            StructField("neighbor_id", LongType(), False),
            StructField("adot", DoubleType(), False),
        ]
    )

    def ivfpq_topk_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, probe_sets, lut_q = bc.value
        n_q = len(ids_q)
        for batch in batches:
            if not len(batch):
                continue
            v_ids = batch[id_col].to_numpy()
            v_mat = np.array([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])
            coarse = np.argmin(_coarse_dist(v_mat), axis=1)  # (n,)
            codes = _pq_codes(v_mat)  # (n, S)
            adot = np.zeros((len(v_ids), n_q), dtype=np.float64)
            for s in range(n_subspaces):
                adot = adot + lut_q[:, s, codes[:, s]].T  # (n, Q)
            allowed = (coarse[:, None, None] == probe_sets[None, :, :]).any(-1)
            adot[~allowed] = -np.inf
            adot[v_ids[:, None] == ids_q[None, :]] = -np.inf
            key = _spark_round(adot, 4)
            take = min(k + 1, len(v_ids))
            out_q, out_n, out_a = [], [], []
            for qi in range(n_q):
                sel = np.lexsort((v_ids, -key[:, qi]))[:take]
                sel = sel[np.isfinite(adot[sel, qi])]
                out_q.append(np.full(len(sel), ids_q[qi], dtype="int64"))
                out_n.append(v_ids[sel].astype("int64"))
                out_a.append(adot[sel, qi])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "adot": np.concatenate(out_a),
                    }
                )

    c = fanout(embeddings.select(F.col(id_col), F.col(vec_col)))
    scored = c.mapInPandas(ivfpq_topk_kernel, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("adot"), 4)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "neighbor_id",
            F.round("adot", 4).alias("approx_dot"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("query_id", "rnk")
    )


def adaptive_shortlist_depth(n_vecs: int, floor: int = 50, denom: int = 20) -> int:
    """Corpus-adaptive IVF-PQ re-rank shortlist depth:
    ``max(floor, ceil(n_vecs / denom))``.

    Why adaptive: the PQ index's ADC resolution is FIXED (4 subspaces ×
    16 codewords), so as the corpus grows the number of vectors per
    quantization cell grows linearly and true neighbors hide behind a
    linearly growing crowd of ADC near-ties — a fixed shortlist depth is
    a recall CLIFF across scale decades, measured on this corpus:
    recall@10 at depth 100 falls 0.84 (sf0.1, 2k vecs) → 0.68 (sf1.0,
    8k vecs) (ANN_RECALL.json by_sf). The denominator 20 (re-rank the
    top ~5% of the corpus ≈ 40% of the probed candidate set at
    nprobe=2/C=16) is the measured knee with margin: depth n/20 gives
    0.84 / 0.96 / 1.0 at sf0.1 / sf1.0 / sf10 (100 / 400 / 1600), while
    n/40 already fails sf0.1 (depth 50 → 0.67). The floor keeps small
    corpora at the exact-contract depth. The DuckDB oracle of
    ``ann_ivfpq_rerank_adaptive`` computes the SAME rule in SQL
    (GREATEST(floor, CEIL(COUNT(*)/denom))), so the adaptive arithmetic
    is itself gate-checked wherever the rule engages (sf0.1+)."""
    return max(floor, -(-int(n_vecs) // denom))


def ivfpq_rerank_topk(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 10,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    shortlist_df: DataFrame | None = None,
    **ivfpq_kwargs,
) -> DataFrame:
    """IVF-PQ shortlist + exact re-rank — the standard production ANN
    topology: the compressed index (:func:`ivfpq_topk`) retrieves a
    ``shortlist`` of candidates per query from 4-byte codes, then ONLY
    those shortlist vectors are re-read and scored with exact cosine. This
    breaks the ADC quantization ceiling (measured recall@10 at sf0.1:
    0.22 ADC-only → ~0.9+ with a 50-deep shortlist, bounded by the coarse
    router's own recall) while still never scanning raw vectors outside
    the shortlist.

    Scale shape: the shortlist (num_queries x shortlist rows of ids) is
    BROADCAST against the vector table, so the re-rank pass is one scan
    with a tiny semi-join — at a trillion vectors the exact re-rank
    touches only shortlist x queries rows.

    ``shortlist``: the DEFAULT (None) is the corpus-ADAPTIVE depth
    ``max(50, ceil(n/20))`` (:func:`adaptive_shortlist_depth` — one cheap
    count job; r8 verdict #2: a fixed depth is a measured recall cliff
    across scale decades, 0.84 → 0.68 at depth 100 over sf0.1 → sf1.0).
    Pass an int to pin an explicit operating point (the registry's
    ``ann_ivfpq_rerank_topk`` pins 50, its depth-50 oracle's contract;
    ``ann_ivfpq_rerank_adaptive`` gates the adaptive rule with a DuckDB
    oracle that computes the same depth from COUNT(*)).

    ``shortlist_df``: pass an already-computed ``ivfpq_topk(...,
    k=shortlist)`` result to reuse the compressed index (the production
    index-reuse pattern; ann_recall_report shares one 50-deep shortlist
    between its ivfpq and rerank arms instead of running the PQ kernel
    twice — recompute_audit r8). When provided, the query set is DERIVED
    from ``shortlist_df``'s query_id column (not ``num_queries``), and
    passing ``ivfpq_kwargs`` alongside is an error — the shortlist was
    built with its own index parameters and silently ignoring a second
    set would hand back inconsistent rerank results (r8 ADVICE)."""
    from pyspark.sql.window import Window

    if shortlist is None and shortlist_df is None:
        shortlist = adaptive_shortlist_depth(embeddings.count())
    if shortlist_df is not None:
        if ivfpq_kwargs:
            raise ValueError(
                "ivfpq_rerank_topk: shortlist_df= reuses an already-built "
                f"index; ivfpq_kwargs {sorted(ivfpq_kwargs)} would be "
                "silently ignored — build the shortlist with them instead"
            )
        short = shortlist_df.select("query_id", "neighbor_id")
        # Query set = the shortlist's own queries: a shortlist built with a
        # different num_queries can't silently truncate the rerank.
        q = embeddings.join(
            F.broadcast(short.select("query_id").distinct()),
            embeddings[id_col] == F.col("query_id"),
        ).select("query_id", F.col(vec_col).alias("q_emb"))
    else:
        short = ivfpq_topk(
            embeddings, num_queries=num_queries, k=shortlist,
            id_col=id_col, vec_col=vec_col, **ivfpq_kwargs,
        ).select("query_id", "neighbor_id")
        q = embeddings.filter(F.col(id_col) < num_queries).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb")
        )
    cand = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_emb")
    )
    rr = (
        cand.join(F.broadcast(short.join(F.broadcast(q), "query_id")),
                  "neighbor_id")
        .select("query_id", "neighbor_id",
                cosine(F.col("q_emb"), F.col("n_emb")).alias("_cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        rr.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id",
                F.round("_cos", 4).alias("cosine"),
                F.col("rnk").cast("int").alias("rnk"))
        .orderBy("query_id", "rnk")
    )
