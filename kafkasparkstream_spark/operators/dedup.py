"""Deduplication operators for training-data pipelines.

Four families, all expressed as compositions of built-in DataFrame ops (no
Python in the hot path) so Catalyst/Tungsten handle execution:

- **exact**       — hash-groupBy on a content digest.
- **n-gram Jaccard** — shingle-set self-join; exact near-dup, quadratic in the
  worst case, use for candidate *verification*.
- **MinHash + LSH** — banded minhash signatures; candidate generation is
  linear-ish (explode → hash-join on band buckets) and is the 100 TB path:
  the only shuffles are by shingle (signature build) and by band bucket
  (candidate join), both well-distributed keys.
- **SimHash**     — bit-sign aggregate over token hashes; near-identical docs
  collide on the 16-bit signature.

Determinism: every hash is md5 over an explicit string — reproducible across
engines (the DuckDB oracles use the same construction), runs, and partitions.
Spark's built-in ``hash``/``xxhash64`` would be faster; md5 keeps the oracle
cross-checkable, and the swap is a one-line change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkasparkstream_spark.operators.text import shingles_col
from kafkasparkstream_spark.util import fanout


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content digest: one row per distinct content with the
    smallest id as keeper and the duplicate count.

    At scale this is a single hash-aggregate shuffled on the digest — the
    canonical map-side-combinable pattern.
    """
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("copies"),
        )
    )


def _distinct_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, shingle) pairs, one row per distinct shingle per doc.

    fanout first: shingling + hashing is the expensive projection, and the
    explode is narrow — spreading docs across the cluster before it keeps
    every core busy (no-op when the scan already has enough splits).
    """
    return fanout(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(F.array_distinct(shingles_col(text_col, n))).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs by exact word-n-gram Jaccard similarity.

    Plan: explode distinct shingles → self-join on shingle (co-partitioned
    hash join) → count common shingles per pair → join per-doc set sizes →
    filter. The self-join is the scale limiter (a hot shingle fans out
    quadratically) — at 100 TB run :func:`minhash_lsh_pairs` first and feed
    its candidates here for exact verification.
    """
    sh = _distinct_shingles(df, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sz_a = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common"))
    return (
        common.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signature per document: ``mh_h = min over shingles of
    md5('h:' || shingle)``.

    One explode + one grouped aggregate: the shuffle key is the doc id and
    every hash is a parallel ``min`` — map-side combinable, so the exchange
    carries one row per doc regardless of document length.
    """
    sh = _distinct_shingles(df, text_col, id_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{h}:"), F.col("shingle")).cast("binary"))).alias(f"mh{h}")
        for h in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard.

    Band the ``num_hashes`` minhashes into ``bands`` buckets (rows = H/B);
    docs sharing any band bucket are candidates (hash-join on the bucket
    digest); candidates are then *verified* with the exact shingle Jaccard so
    the output has no false positives — false negatives follow the standard
    LSH S-curve (P[candidate] = 1-(1-s^rows)^bands).

    This is the 100 TB dedup path: candidate generation never compares
    non-colliding docs, and bucket skew is bounded because identical docs
    (the worst case) are already collapsed by :func:`exact_dedup`.
    """
    rows = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws("|", *[F.col(f"mh{b * rows + r}") for r in range(rows)]).cast("binary")
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")).select(
        F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    ca = buckets.alias("a")
    cb = buckets.alias("b")
    candidates = (
        ca.join(
            cb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )
    # Exact-Jaccard verification of the candidate set only.
    sh = _distinct_shingles(df, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (
        candidates.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common"))
    return (
        common.join(sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
) -> DataFrame:
    """SimHash signature: bit ``j`` is the sign of the sum over tokens of
    ±1, where the ±1 is bit ``j`` of the token's hash.

    The per-(token, bit) coin is ``md5(token || ':' || j)``'s first hex char
    < '8' — i.e. literally bit 0 of the digest — chosen because the identical
    expression exists in any engine with md5, making the operator
    oracle-checkable. Emitted as a bit-string column so collisions are plain
    string equality (groupable / joinable at scale).
    """
    from kafkasparkstream_spark.operators.text import tokens_col

    # Explode tokens, compute the per-(token, bit) coins as a codegen'd
    # projection, then sum per doc in a Tungsten hash aggregate. Equivalent to
    # a per-row higher-order fold, but the fold is interpreted per element
    # (ArrayAggregate is CodegenFallback) while this shape stays fully
    # code-generated and map-side-combines the ±1 sums, so the exchange
    # carries one row of ``bits`` ints per doc regardless of document length.
    toks = fanout(df.select(F.col(id_col), tokens_col(text_col).alias("_toks"))).select(
        F.col(id_col), F.explode("_toks").alias("_tok")
    )
    coin_cols = [
        F.when(
            F.substring(F.md5(F.concat(F.col("_tok"), F.lit(f":{j}")).cast("binary")), 1, 1).isin(
                *"01234567"
            ),
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .alias(f"_c{j}")
        for j in range(bits)
    ]
    sums = toks.select(F.col(id_col), *coin_cols).groupBy(id_col).agg(
        *[F.sum(f"_c{j}").alias(f"_s{j}") for j in range(bits)]
    )
    bit_exprs = [
        F.when(F.col(f"_s{j}") >= 0, F.lit("1")).otherwise(F.lit("0")) for j in range(bits)
    ]
    return sums.select(F.col(id_col), F.concat(*bit_exprs).alias("simhash"))
