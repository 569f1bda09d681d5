"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
``map<string,string>`` metadata column (MEDIA_ASSET_SCHEMA). Heavy per-asset
work (decode, resize, feature extraction, frame sampling) runs as Arrow-batched
Pandas functions over ``mapInPandas`` — the correct Spark shape for Python
media libraries:

- Arrow moves the binary batches zero-copy between JVM and Python;
- ``mapInPandas`` streams an *iterator* of batches so one oversized asset
  batch can't OOM the worker;
- output schema is declared up front, so downstream stays fully columnar.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are deterministic fakes behind ``_HAS_CODECS`` — the Spark-side
plumbing (schema, batching, partitioning, UDF signatures) is real and tested.
Swap ``_fake_*`` with real library calls to productionize; nothing else
changes.

Scale notes: repartition by asset id before mapInPandas so media bytes spread
evenly (assets vary 1000× in size — range-partition on size if skewed);
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds Python memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real codecs are not available in this container — gate, don't fail
    import PIL.Image  # noqa: F401

    _HAS_CODECS = True
except ImportError:
    _HAS_CODECS = False


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("embedding", ArrayType(DoubleType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def _fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image decode: dims derived from a digest.

    Replace with ``PIL.Image.open(io.BytesIO(payload)).size`` when codecs
    exist (guard with _HAS_CODECS).
    """
    if _HAS_CODECS:
        raise NotImplementedError("real decode path requires PIL wiring")
    d = hashlib.sha256(payload).digest()
    return 64 + d[0] % 192, 64 + d[1] % 192


def _fake_embedding(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a vision-model embedding."""
    d = hashlib.sha256(b"emb:" + payload).digest()
    return [round(b / 255.0 - 0.5, 6) for b in d[:dim]]


def image_features(assets: DataFrame, embedding_dim: int = 8) -> DataFrame:
    """Decode + feature-extract image assets via Arrow-batched mapInPandas."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [],
                "width": [],
                "height": [],
                "n_bytes": [],
                "sha256": [],
                "embedding": [],
            }
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                w, h = _fake_decode_dims(raw)
                out["asset_id"].append(asset_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(raw))
                out["sha256"].append(hashlib.sha256(raw).hexdigest())
                out["embedding"].append(_fake_embedding(raw, embedding_dim))
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(
        kernel, IMAGE_FEATURES_SCHEMA
    )


def sample_frames(assets: DataFrame, every_n: int = 2, max_frames: int = 3) -> DataFrame:
    """Frame-sample "video" assets (1 output row per sampled frame).

    The fake kernel slices the payload into fixed-size chunks as stand-in
    frames; a real one would ffmpeg-demux. The Spark shape — one input row
    fanning out to N output rows through mapInPandas — is the part that
    matters for the pipeline.
    """
    frame_bytes = 16

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "frame_index": [], "frame": []}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                n_frames = max(len(raw) // frame_bytes, 0)
                for i, fi in enumerate(range(0, n_frames, every_n)):
                    if i >= max_frames:
                        break
                    rows["asset_id"].append(asset_id)
                    rows["frame_index"].append(fi)
                    rows["frame"].append(raw[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "payload").mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


def synthesize_assets(spark, n: int = 64, media_type: str = "image") -> DataFrame:
    """Deterministic fake asset table (payload = seeded bytes) for tests."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("asset_id"),
            F.lit(media_type).alias("media_type"),
            F.unhex(F.sha2(F.col("id").cast("string"), 256)).alias("payload"),
            F.create_map(
                F.lit("source"), F.concat(F.lit("synth://"), F.col("id").cast("string"))
            ).alias("meta"),
        )
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("energy", LongType(), True),
        StructField("rms", DoubleType(), True),
    ]
)


def audio_features(assets: DataFrame) -> DataFrame:
    """Decode + summarize audio assets via Arrow-batched mapInPandas.

    The fake decode treats each payload byte as one centered PCM sample
    (b − 128); a real kernel would torchaudio/soundfile-decode. Energy is an
    exact integer sum (engine-order-independent) and RMS is one IEEE sqrt of
    an exact ratio, so the oracle matches bit-for-bit — the same
    determinism-by-construction discipline as the image kernel.
    """
    import math

    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "n_samples": [], "energy": [], "rms": []}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                x = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
                energy = int((x * x).sum())
                n = len(x)
                out["asset_id"].append(asset_id)
                out["n_samples"].append(n)
                out["energy"].append(energy)
                out["rms"].append(math.sqrt(energy / n) if n else 0.0)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(
        kernel, AUDIO_FEATURES_SCHEMA
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_bytes_in", LongType(), False),
        StructField("n_bytes_out", LongType(), False),
        StructField("resized_sha256", StringType(), False),
    ]
)


def resize_images(
    assets: DataFrame, target_w: int = 16, target_h: int = 16
) -> DataFrame:
    """Resize image assets to a fixed target via Arrow-batched mapInPandas —
    the binary-in/binary-out transform shape (decode → scale → re-encode)
    of a real thumbnailing stage, with the codec swapped for a
    deterministic fake (truncate to the target byte budget) since the
    container ships no image libraries; a real kernel drops PIL's
    ``Image.resize`` into the same loop.

    Per-asset work is independent → the operator scales with input splits;
    the output carries dims + content digest so downstream stages (and the
    DuckDB oracle) can verify the transform without shipping pixels.
    """
    budget = max(target_w * target_h // 8, 1)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [],
                "width": [],
                "height": [],
                "n_bytes_in": [],
                "n_bytes_out": [],
                "resized_sha256": [],
            }
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                resized = raw[:budget]
                out["asset_id"].append(asset_id)
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["n_bytes_in"].append(len(raw))
                out["n_bytes_out"].append(len(resized))
                out["resized_sha256"].append(hashlib.sha256(resized).hexdigest())
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(kernel, RESIZE_SCHEMA)
