"""Multimodal kernels over synthesized binary assets — decode /
feature-extract / resize / frame-sample via Arrow-batched mapInPandas."""

from __future__ import annotations

from kafkasparkstream_spark.operators import multimodal  # noqa: E402
from kafkasparkstream_spark.tables import load_table
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from kafkasparkstream_spark.queries._shared import (  # noqa: E402
    register,
)

def _doc_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → asset table: payload = ASCII bytes of sha2(text) (64 B)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.sha2(F.col("text"), 256).cast("binary").alias("payload"),
    )


@register(
    "multimodal_image_features",
    oracle="""
    WITH a AS (SELECT doc_id AS asset_id, sha256(text) AS payload_hex FROM documents),
    d AS (SELECT asset_id,
                 sha256(payload_hex)             AS digest,
                 sha256('emb:' || payload_hex)   AS emb_digest
          FROM a)
    SELECT asset_id,
           CAST(64 + CAST(('0x' || substr(digest, 1, 2)) AS INT) % 192 AS INT) AS width,
           CAST(64 + CAST(('0x' || substr(digest, 3, 2)) AS INT) % 192 AS INT) AS height,
           CAST(64 AS BIGINT) AS n_bytes,
           digest AS sha256,
           ROUND(CAST(('0x' || substr(emb_digest, 1, 2)) AS INT) / 255.0 - 0.5, 6) AS e0,
           ROUND(CAST(('0x' || substr(emb_digest, 3, 2)) AS INT) / 255.0 - 0.5, 6) AS e1,
           ROUND(CAST(('0x' || substr(emb_digest, 5, 2)) AS INT) / 255.0 - 0.5, 6) AS e2,
           ROUND(CAST(('0x' || substr(emb_digest, 7, 2)) AS INT) / 255.0 - 0.5, 6) AS e3
    FROM d
    ORDER BY asset_id
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + feature extraction (Arrow mapInPandas kernel), with
    the embedding head flattened to scalar columns for the value-hash."""
    feats = multimodal.image_features(_doc_assets(spark, sf_dir), embedding_dim=4)
    return feats.select(
        "asset_id",
        "width",
        "height",
        "n_bytes",
        "sha256",
        *[F.element_at("embedding", k + 1).alias(f"e{k}") for k in range(4)],
    ).orderBy("asset_id")


@register(
    "multimodal_audio_energy",
    oracle="""
    WITH a AS (SELECT doc_id AS asset_id, sha256(text) AS hex FROM documents),
    s AS (SELECT asset_id, ord(substr(hex, CAST(i AS INT), 1)) - 128 AS b
          FROM a, range(1, 65) t(i))
    SELECT asset_id, COUNT(*) AS n_samples,
           CAST(SUM(b * b) AS BIGINT) AS energy,
           ROUND(sqrt(CAST(SUM(b * b) AS DOUBLE) / COUNT(*)), 6) AS rms
    FROM s GROUP BY asset_id ORDER BY asset_id
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode + energy/RMS summary (fake PCM = centered payload
    bytes): integer-exact energy, IEEE-exact sqrt — deterministic by
    construction across engines."""
    feats = multimodal.audio_features(_doc_assets(spark, sf_dir))
    return feats.select(
        "asset_id", "n_samples", "energy", F.round("rms", 6).alias("rms")
    ).orderBy("asset_id")


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH a AS (SELECT doc_id AS asset_id, sha256(text) AS payload_hex FROM documents),
    f AS (SELECT asset_id, unnest([0, 2]) AS frame_index, payload_hex FROM a)
    SELECT asset_id, CAST(frame_index AS INT) AS frame_index,
           substr(payload_hex, frame_index * 16 + 1, 16) AS frame_str
    FROM f
    ORDER BY asset_id, frame_index
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (1 row in → N frame rows out through mapInPandas);
    64-byte payloads → 4 16-byte frames, every 2nd kept → frames 0 and 2.
    Frames are ASCII by construction, so the oracle compares them as text."""
    frames = multimodal.sample_frames(_doc_assets(spark, sf_dir), every_n=2, max_frames=3)
    return frames.select(
        "asset_id",
        "frame_index",
        F.col("frame").cast("string").alias("frame_str"),
    ).orderBy("asset_id", "frame_index")


@register(
    "multimodal_resize",
    oracle="""
    WITH a AS (SELECT doc_id AS asset_id, sha256(text) AS payload_hex
               FROM documents)
    SELECT asset_id,
           CAST(16 AS INT) AS width,
           CAST(16 AS INT) AS height,
           CAST(length(payload_hex) AS BIGINT) AS n_bytes_in,
           CAST(32 AS BIGINT) AS n_bytes_out,
           sha256(substr(payload_hex, 1, 32)) AS resized_sha256
    FROM a ORDER BY asset_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail-resize plumbing (binary→binary mapInPandas kernel with a
    deterministic fake codec); dims + digest verified against the oracle."""
    return multimodal.resize_images(
        _doc_assets(spark, sf_dir), target_w=16, target_h=16
    ).orderBy("asset_id")


@register(
    "image_dhash_dedup",
    oracle="""
    WITH a AS (SELECT sha256(sha256(text)) AS sig FROM documents),
    g AS (SELECT sig, COUNT(*) AS n FROM a GROUP BY sig)
    SELECT CAST(SUM(n) AS BIGINT) AS n_assets,
           COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
           CAST(MAX(n) AS BIGINT) AS max_group,
           CAST(0 AS BIGINT) AS n_decoded
    FROM g
    """,
)
def image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup over the asset table: per-asset 64-bit dHash
    (real pixel path for decodable payloads, sha-prefix fallback for the
    synthetic digest payloads — so the oracle mirrors the grouping in hash
    space), rolled up to corpus dup-group stats
    (operators/multimodal.py:image_dhash_dedup). The pixel path's dHash is
    pinned against a pure-Python reference in tests/test_multimodal.py."""
    return multimodal.image_dhash_dedup(_doc_assets(spark, sf_dir))


@register(
    "media_probe_inventory",
    oracle="""
    WITH a AS (SELECT doc_id AS i, doc_id % 4 AS sel FROM documents),
    k AS (SELECT CASE sel WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
                          WHEN 2 THEN 'mp3' ELSE 'flac' END AS kind,
                 CASE sel WHEN 0 THEN (8 + i % 8) * 8
                          WHEN 1 THEN 100 + i % 50
                          WHEN 2 THEN (2 + i % 3) * 1152
                          ELSE 64 + i % 32 END AS n_units,
                 CASE sel WHEN 1 THEN (100 + i % 50) * 1000 // 16000
                          WHEN 2 THEN ((2 + i % 3) * 1152) * 1000 // 44100
                          WHEN 3 THEN (64 + i % 32) * 1000 // 16000
                          ELSE 0 END AS duration_ms,
                 CASE sel WHEN 1 THEN 16000 WHEN 2 THEN 44100
                          WHEN 3 THEN 16000 ELSE 0 END AS sample_rate
          FROM a)
    SELECT kind, COUNT(*) AS n_assets,
           CAST(SUM(n_units) AS BIGINT) AS sum_units,
           CAST(SUM(duration_ms) AS BIGINT) AS sum_duration_ms,
           CAST(MAX(sample_rate) AS INT) AS max_sample_rate
    FROM k GROUP BY kind ORDER BY kind
    """,
)
def media_probe_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec round-trip inside the correctness gate: per document a
    deterministic media fixture is ENCODED by the stdlib codecs
    (PNG / WAV / MPEG-1-Layer-III / FLAC by doc_id % 4), then header-probed
    by multimodal.media_probe, and the per-kind inventory (asset counts,
    decoded unit sums, durations, rates) must match the oracle's closed-form
    arithmetic on doc_id — any bit drift in encoder or parser breaks the
    hash. Two Arrow kernels back-to-back; everything else is one 4-row
    aggregate."""
    docs = load_table(spark, "documents", sf_dir)
    probed = multimodal.media_probe(multimodal.synthesize_media_assets(docs))
    return (
        probed.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_units").alias("sum_units"),
            F.sum("duration_ms").alias("sum_duration_ms"),
            F.max("sample_rate").alias("max_sample_rate"),
        )
        .orderBy("kind")
    )
