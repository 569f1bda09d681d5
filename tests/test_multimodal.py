"""Multimodal plumbing tests: schema, Arrow batching, fan-out shape.

The decode kernels are deterministic fakes (codecs absent in this container,
multimodal.py gates on _HAS_CODECS); these tests pin the Spark-side contract:
binary payloads round-trip through mapInPandas, output schemas hold, and the
same asset always produces the same features.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkasparkstream_spark.operators.multimodal import (
    image_features,
    sample_frames,
    synthesize_assets,
)


def test_image_features_schema_and_determinism(spark):
    assets = synthesize_assets(spark, n=32).repartition(4)
    feats = image_features(assets)
    rows = {r.asset_id: r for r in feats.collect()}
    assert len(rows) == 32
    r0 = rows[0]
    assert r0.n_bytes == 32  # sha2-256 payload
    assert len(r0.sha256) == 64
    assert len(r0.embedding) == 8
    assert 64 <= r0.width < 256 and 64 <= r0.height < 256
    # Determinism across a second run (different partitioning).
    again = {r.asset_id: r for r in image_features(assets.repartition(7)).collect()}
    assert rows[5].embedding == again[5].embedding
    assert rows[5].width == again[5].width


def test_frame_sampling_fanout(spark):
    assets = synthesize_assets(spark, n=8, media_type="video")
    frames = sample_frames(assets, every_n=2, max_frames=3)
    pdf = frames.toPandas()
    # 32-byte payload / 16-byte frames = 2 frames, sampled every 2 → index 0 only.
    assert set(pdf["frame_index"]) == {0}
    assert len(pdf) == 8
    assert all(len(bytes(b)) == 16 for b in pdf["frame"])


def test_join_features_back_to_assets(spark):
    """Features join back on asset_id — the downstream pipeline shape."""
    assets = synthesize_assets(spark, n=16)
    feats = image_features(assets)
    joined = assets.join(feats, "asset_id").filter(F.col("n_bytes") > 0)
    assert joined.count() == 16
    assert "media_type" in joined.columns and "embedding" in joined.columns


def test_binary_file_source_ingest(spark, tmp_path):
    """Real multimodal ingest path: a directory of binary media files read
    via Spark's binaryFile source, mapped to the asset schema, and run
    through the feature-extraction kernel — same plumbing a 100 TB image
    corpus on object storage would use (binaryFile scans distribute by
    file; no driver involvement)."""
    import hashlib

    from pyspark.sql import functions as F

    from kafkasparkstream_spark.operators.multimodal import image_features

    media = tmp_path / "media"
    media.mkdir()
    payloads = {}
    for i in range(8):
        raw = hashlib.sha256(f"img{i}".encode()).digest() * 2  # 64 bytes
        (media / f"asset_{i}.bin").write_bytes(raw)
        payloads[i] = raw

    raw_df = spark.read.format("binaryFile").load(str(media / "*.bin"))
    assets = raw_df.select(
        F.regexp_extract(F.col("path"), r"asset_(\d+)\.bin", 1)
        .cast("long")
        .alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.col("content").alias("payload"),
    )
    feats = {r["asset_id"]: r for r in image_features(assets).collect()}
    assert set(feats) == set(payloads)
    for i, raw in payloads.items():
        assert feats[i]["n_bytes"] == 64
        assert feats[i]["sha256"] == hashlib.sha256(raw).hexdigest()


def test_resize_respects_byte_budget_and_digest(spark):
    """Resize kernel: fixed target dims, output bytes capped at the target
    budget, digest reproducible from the truncated payload."""
    import hashlib

    from kafkasparkstream_spark.operators.multimodal import (
        resize_images,
        synthesize_assets,
    )

    assets = synthesize_assets(spark, n=16)
    payloads = {r["asset_id"]: bytes(r["payload"]) for r in assets.collect()}
    rows = {r["asset_id"]: r for r in resize_images(assets, 16, 16).collect()}
    assert set(rows) == set(payloads)
    for aid, raw in payloads.items():
        r = rows[aid]
        assert (r["width"], r["height"]) == (16, 16)
        assert r["n_bytes_out"] == min(len(raw), 32)
        assert r["resized_sha256"] == hashlib.sha256(raw[:32]).hexdigest()
