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

Decode is REAL for PNG, WAV, GIF, baseline JPEG and Motion-JPEG MP4 via
the pure-stdlib codecs in
:mod:`kafkasparkstream_spark.operators.codecs` (zlib scanline decode with
all five PNG filters; RIFF/PCM parse; LZW frames; Huffman+IDCT; ISO-BMFF
moov/stbl sample-table demux) — kernels sniff magic bytes per asset,
decode real media for real payloads, and fall back to deterministic
digest-derived fakes for payloads outside codec scope (synthetic
fixtures, HEVC video, arithmetic-coded JPEG; ``_HAS_PIL`` upgrades
the JPEG branch when PIL exists). Baseline I-frame H.264 — raw Annex B
or in avc1 mp4 — is REALLY decoded (operators/h264.py). The fallback keeps every output column
well-defined and oracle-reproducible for any byte string.

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

from kafkasparkstream_spark.operators import codecs

try:  # PIL covers JPEG etc.; PNG/WAV need only the stdlib codecs module
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

# Back-compat alias (older tests/docs gated on this name).
_HAS_CODECS = _HAS_PIL


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
    """Deterministic fallback for non-decodable payloads: dims from a digest."""
    d = hashlib.sha256(payload).digest()
    return 64 + d[0] % 192, 64 + d[1] % 192


def _fake_embedding(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fallback for a vision-model embedding."""
    d = hashlib.sha256(b"emb:" + payload).digest()
    return [round(b / 255.0 - 0.5, 6) for b in d[:dim]]


def _decode_image(raw: bytes):
    """Real pixels ``(h, w, ch) uint8`` for decodable payloads, else None.

    GIFs contribute their FIRST frame (the still-image convention thumbnail
    pipelines use); frame-level access goes through :func:`sample_frames`.
    """
    kind = codecs.sniff(raw)
    try:
        if kind == "png":
            return codecs.png_decode(raw)
        if kind == "gif":
            return codecs.gif_decode_frames(raw)[0]
        if kind == "mp4":
            # Demux (codecs.py): first frame, the thumbnail convention.
            # The stbl sample tables give exact per-sample byte ranges, so
            # only sample 0 is decoded — a long clip must not pay N full
            # decodes for its thumbnail. MJPEG goes through the baseline
            # JPEG decoder, avc1 through the baseline I-frame H.264
            # decoder (operators/h264.py); other codecs raise -> digest
            # fallback.
            codec = codecs.mp4_probe(raw)["codec"]
            if codec in ("jpeg", "mjpa"):
                return codecs.jpeg_decode(codecs.mp4_demux(raw)[0])
            if codec == "avc1":
                return codecs.mp4_decode_avc_samples(raw, [0])[0]
            return None
        if kind == "h264":
            from kafkasparkstream_spark.operators.h264 import h264_decode_frames_at

            return h264_decode_frames_at(raw, [0])[0]
        if kind == "jpeg":
            if _HAS_PIL:
                import io

                import numpy as np

                import PIL.Image

                img = np.asarray(PIL.Image.open(io.BytesIO(raw)).convert("RGB"))
                return img if img.dtype == "uint8" else None
            # Pure-stdlib decoder (codecs.py): baseline SOF0/SOF1 and
            # progressive SOF2 (spectral selection + successive
            # approximation), 4:4:4 / 4:2:2 / 4:2:0, restart markers.
            # Arithmetic-coded / 12-bit files fall through to the digest
            # fallback via the except guard.
            return codecs.jpeg_decode(raw)
    except Exception:  # malformed/truncated container or unsupported scope
        return None  # -> deterministic fallback; the kernel must stay total
    return None


def _pixel_embedding(img, dim: int) -> list[float]:
    """Deterministic content embedding from REAL pixels: per-channel means
    (padded to 4), overall contrast (std), aspect, log-size — exact
    integer/single-op float math, so the value is engine- and
    platform-stable."""
    import math

    import numpy as np

    h, w, ch = img.shape
    px = img.astype(np.int64)
    n = h * w
    means = [float(px[:, :, c].sum()) / (255.0 * n) - 0.5 for c in range(min(ch, 4))]
    means += [0.0] * (4 - len(means))
    var = float((px * px).sum()) / (n * ch) - (float(px.sum()) / (n * ch)) ** 2
    feats = means + [
        math.sqrt(max(var, 0.0)) / 255.0,
        w / (w + h),
        math.log1p(n) / 20.0,
        ch / 4.0,
    ]
    out = [round(v, 6) for v in feats[:dim]]
    return out + [0.0] * (dim - len(out))


def image_features(assets: DataFrame, embedding_dim: int = 8) -> DataFrame:
    """Decode + feature-extract image assets via Arrow-batched mapInPandas.

    PNG payloads are REALLY decoded (stdlib codec): width/height are the
    image's actual dimensions and the embedding is computed from pixel
    statistics. JPEG decodes when PIL is installed. Anything else gets the
    deterministic digest-derived fallback, so the operator is total over
    arbitrary bytes (a 100 TB crawl always contains garbage payloads — a
    decode-or-die kernel would kill the stage)."""

    def image_features_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
                img = _decode_image(raw)
                if img is not None:
                    h, w = img.shape[0], img.shape[1]
                    emb = _pixel_embedding(img, embedding_dim)
                else:
                    w, h = _fake_decode_dims(raw)
                    emb = _fake_embedding(raw, embedding_dim)
                out["asset_id"].append(asset_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(raw))
                out["sha256"].append(hashlib.sha256(raw).hexdigest())
                out["embedding"].append(emb)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(
        image_features_kernel, IMAGE_FEATURES_SCHEMA
    )


def _sample_media_frames(raw: bytes, kind: str, every_n: int, max_frames: int):
    """Strided (frame_index, pixels) picks for a multi-frame payload.

    GIF frames composite onto the previous canvas (LZW + disposal), so the
    full decode is inherent and sampling happens after. MJPEG mp4 samples
    are independent and the stbl tables give exact byte ranges: demux is
    byte slicing, and ONLY the strided sample indices (≤ max_frames) pay a
    JPEG decode — a long clip never pays N full decodes for 3 frames.
    Raises on malformed/out-of-scope payloads (callers chunk-fallback)."""
    if kind == "gif":
        frames = codecs.gif_decode_frames(raw)
        return [
            (fi, frames[fi])
            for i, fi in enumerate(range(0, len(frames), every_n))
            if i < max_frames
        ]
    if kind == "h264":
        from kafkasparkstream_spark.operators.h264 import h264_decode_frames_at, h264_probe

        n = h264_probe(raw)["n_idr"]
        picks = [fi for i, fi in enumerate(range(0, n, every_n)) if i < max_frames]
        return list(zip(picks, h264_decode_frames_at(raw, picks)))
    codec = codecs.mp4_probe(raw)["codec"]
    if codec == "avc1":
        n = codecs.mp4_probe(raw)["n_samples"]
        picks = [fi for i, fi in enumerate(range(0, n, every_n)) if i < max_frames]
        return list(zip(picks, codecs.mp4_decode_avc_samples(raw, picks)))
    if codec not in ("jpeg", "mjpa"):
        raise ValueError("mp4: unsupported video codec")
    samples = codecs.mp4_demux(raw)
    return [
        (fi, codecs.jpeg_decode(samples[fi]))
        for i, fi in enumerate(range(0, len(samples), every_n))
        if i < max_frames
    ]


def sample_frames(assets: DataFrame, every_n: int = 2, max_frames: int = 3) -> DataFrame:
    """Frame-sample multi-frame media (1 output row per sampled frame).

    GIF, Motion-JPEG MP4, avc1 MP4 and raw Annex B H.264 payloads are
    REALLY demuxed (stdlib LZW decode / ISO-BMFF moov+stbl sample tables /
    NAL parse, codecs.py + h264.py): every ``every_n``-th actual frame is
    decoded and re-emitted as a PNG binary — the true
    decode→sample→re-encode pipeline shape. Payloads outside codec scope
    (HEVC mp4, malformed containers) fall back to slicing the payload
    into fixed-size chunks as deterministic stand-in frames. The Spark
    shape — one input row fanning out to N output rows through
    mapInPandas — is identical on all paths.
    """
    frame_bytes = 16

    def sample_frames_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "frame_index": [], "frame": []}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                kind = codecs.sniff(raw)
                if kind in ("gif", "mp4", "h264"):
                    try:
                        picks = _sample_media_frames(raw, kind, every_n, max_frames)
                    except Exception:  # malformed/out-of-scope -> chunk fallback
                        picks = None
                    if picks is not None:
                        for fi, img in picks:
                            rows["asset_id"].append(asset_id)
                            rows["frame_index"].append(fi)
                            rows["frame"].append(codecs.png_encode(img))
                        continue
                n_frames = max(len(raw) // frame_bytes, 0)
                for i, fi in enumerate(range(0, n_frames, every_n)):
                    if i >= max_frames:
                        break
                    rows["asset_id"].append(asset_id)
                    rows["frame_index"].append(fi)
                    rows["frame"].append(raw[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "payload").mapInPandas(sample_frames_kernel, FRAME_SAMPLE_SCHEMA)


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

    RIFF/WAVE payloads are REALLY decoded (stdlib ``wave``): n_samples,
    energy and RMS come from the actual PCM samples (8-bit centered,
    16-bit native). FLAC payloads are REALLY decoded too (pure-stdlib
    RFC 9639 decoder, codecs.py: Rice residuals, fixed/LPC predictors,
    stereo decorrelation, CRC+MD5 verified). Other payloads keep the
    deterministic byte-as-sample fallback
    (each byte − 128). Energy is an exact integer sum
    (engine-order-independent) and RMS is one IEEE sqrt of an exact ratio,
    so the oracle matches bit-for-bit — the same determinism-by-construction
    discipline as the image kernel.
    """
    import math

    import numpy as np

    def audio_features_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "n_samples": [], "energy": [], "rms": []}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                x = None
                kind = codecs.sniff(raw)
                if kind in ("wav", "flac"):
                    try:
                        dec = codecs.wav_decode if kind == "wav" else codecs.flac_decode
                        x = dec(raw)[0].reshape(-1)
                    except Exception:  # malformed/truncated container -> fallback
                        x = None
                if x is None:
                    x = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
                energy = int((x * x).sum())
                n = len(x)
                out["asset_id"].append(asset_id)
                out["n_samples"].append(n)
                out["energy"].append(energy)
                out["rms"].append(math.sqrt(energy / n) if n else 0.0)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(
        audio_features_kernel, AUDIO_FEATURES_SCHEMA
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
    the full binary-in/binary-out thumbnailing stage: PNG payloads are
    REALLY decoded (stdlib codec), area-weighted box-resized to the target,
    and re-encoded as PNG; non-decodable payloads keep the deterministic
    truncate-to-budget fake so the operator stays total over arbitrary
    bytes.

    Per-asset work is independent → the operator scales with input splits;
    the output carries dims + content digest so downstream stages (and the
    DuckDB oracle) can verify the transform without shipping pixels.
    """
    budget = max(target_w * target_h // 8, 1)

    def resize_images_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
                img = _decode_image(raw)
                if img is not None:
                    resized = codecs.png_encode(
                        codecs.box_resize(img, target_w, target_h)
                    )
                else:
                    resized = raw[:budget]
                out["asset_id"].append(asset_id)
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["n_bytes_in"].append(len(raw))
                out["n_bytes_out"].append(len(resized))
                out["resized_sha256"].append(hashlib.sha256(resized).hexdigest())
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(resize_images_kernel, RESIZE_SCHEMA)


DHASH_SCHEMA = (
    "asset_id long, dhash long, width int, height int, decoded boolean"
)


def _dhash_from_pixels(img) -> int:
    """64-bit difference hash: luma (integer BT.601 coefficients, exact on
    every platform), box-resample to 9x8, bit (y,x) = luma[y][x] > luma[y][x+1].
    The canonical perceptual near-dup signature — robust to re-encoding,
    resizing, and mild color shifts, cheap enough to run inline with decode."""
    import numpy as np

    px = img.astype(np.int64)
    if px.ndim == 3:
        if px.shape[2] >= 3:
            luma = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
        else:
            luma = px[:, :, 0]
    else:
        luma = px
    small = codecs.box_resize(
        luma.astype(np.uint8)[:, :, None].repeat(3, axis=2), 9, 8
    )[:, :, 0].astype(np.int64)
    bits = 0
    for y in range(8):
        for x in range(8):
            bits = (bits << 1) | (1 if small[y, x] > small[y, x + 1] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def _dhash_fallback(raw: bytes) -> int:
    """Total-function fallback for undecodable payloads: the first 8 bytes
    of sha256(payload) as a signed big-endian int64 — identical payloads
    still land in the same group, so exact-dup detection keeps working on
    garbage bytes."""
    v = int.from_bytes(hashlib.sha256(raw).digest()[:8], "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash(assets: DataFrame) -> DataFrame:
    """Per-asset perceptual dHash via Arrow-batched mapInPandas: real
    pixels (PNG/GIF/JPEG/H.264/MP4 through the stdlib codecs) get the
    pixel dHash; anything undecodable gets the sha256-prefix fallback so
    the kernel is total. Downstream grouping on the 8-byte hash is the
    standard image-dedup scale shape: one map-side-combined aggregate,
    no pixel ever crosses the shuffle."""

    def image_dhash_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "dhash": [], "width": [], "height": [],
                   "decoded": []}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                img = _decode_image(raw)
                if img is not None:
                    h, w = int(img.shape[0]), int(img.shape[1])
                    dh, dec = _dhash_from_pixels(img), True
                else:
                    w, h = _fake_decode_dims(raw)
                    dh, dec = _dhash_fallback(raw), False
                out["asset_id"].append(asset_id)
                out["dhash"].append(dh)
                out["width"].append(w)
                out["height"].append(h)
                out["decoded"].append(dec)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(image_dhash_kernel, DHASH_SCHEMA)


def image_dhash_dedup(assets: DataFrame) -> DataFrame:
    """Corpus-level image near-dup report over :func:`image_dhash` groups:
    asset count, distinct-signature count, duplicate-group count, largest
    group, and how many assets took the real pixel path. The group-by key
    is 8 bytes, so at 100 TB the aggregate is a narrow hash rollup of a
    (id, hash) projection — the images themselves never shuffle."""
    sigs = image_dhash(assets)
    groups = sigs.groupBy("dhash").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("decoded").cast("long")).alias("n_dec"),
    )
    return groups.agg(
        F.sum("n").alias("n_assets"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("n") > 1).cast("long")).alias("n_dup_groups"),
        F.max("n").alias("max_group"),
        F.sum("n_dec").alias("n_decoded"),
    )


MEDIA_PROBE_SCHEMA = (
    "asset_id long, kind string, sample_rate int, channels int, "
    "n_units long, duration_ms long, detail string"
)


def media_probe(assets: DataFrame) -> DataFrame:
    """Container metadata for every asset without a full decode — the
    routing/filtering station of a multimodal crawl pipeline (drop low
    sample rates, split by duration, send each codec to its decode fleet).

    Per payload: sniff the container, then read only its header/index
    structures — WAV fmt chunk, FLAC STREAMINFO, MP3 frame-header walk,
    MP4 moov/stbl, H.264 NAL scan, PNG/GIF/JPEG dimensions. ``n_units`` is
    the natural count (audio samples, video frames/samples, pixels);
    ``detail`` is a small deterministic tag (codec/mode/layer). Unknown or
    malformed payloads probe as kind='unknown' with zeroed fields — the
    kernel is total, per the multimodal contract. Arrow-batched
    mapInPandas; only header bytes are touched, so probing a 100 TB asset
    table is scan-bound, not decode-bound."""

    def _probe(raw: bytes) -> tuple[str, int, int, int, int, str]:
        kind = codecs.sniff(raw)
        if kind == "wav":
            x, rate = codecs.wav_decode(raw)
            n = int(x.shape[0])
            ch = int(x.shape[1]) if x.ndim > 1 else 1
            return "wav", rate, ch, n, n * 1000 // rate, "pcm"
        if kind == "flac":
            x, rate = codecs.flac_decode(raw)
            n = int(x.shape[0])
            ch = int(x.shape[1]) if x.ndim > 1 else 1
            return "flac", rate, ch, n, n * 1000 // rate, "lossless"
        if kind == "mp3":
            m = codecs.mp3_probe(raw)
            ch = 1 if m["mode"] == "mono" else 2
            detail = f"v{m['version']}L{m['layer']}:" + (
                "vbr" if m["vbr"] else f"{m['bitrate_kbps']}kbps"
            )
            return "mp3", m["sample_rate"], ch, m["n_samples"], m["duration_ms"], detail
        if kind == "mp4":
            m = codecs.mp4_probe(raw)
            return "mp4", 0, 0, m["n_samples"], 0, m["codec"]
        if kind == "h264":
            from kafkasparkstream_spark.operators.h264 import h264_probe

            m = h264_probe(raw)
            return "h264", 0, 0, m["n_idr"], 0, "annexb"
        if kind in ("png", "gif", "jpeg"):
            img = _decode_image(raw)
            if img is None:
                return kind, 0, 0, 0, 0, "undecodable"
            h, w = int(img.shape[0]), int(img.shape[1])
            return kind, 0, int(img.shape[2]), h * w, 0, f"{w}x{h}"
        return "unknown", 0, 0, 0, 0, ""

    def probe_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "kind", "sample_rate",
                                   "channels", "n_units", "duration_ms",
                                   "detail")}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    kind, rate, ch, n, dur, detail = _probe(raw)
                except Exception:  # malformed container: total, not fatal
                    kind, rate, ch, n, dur, detail = "unknown", 0, 0, 0, 0, "malformed"
                out["asset_id"].append(asset_id)
                out["kind"].append(kind)
                out["sample_rate"].append(rate)
                out["channels"].append(ch)
                out["n_units"].append(n)
                out["duration_ms"].append(dur)
                out["detail"].append(detail)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "payload").mapInPandas(probe_kernel, MEDIA_PROBE_SCHEMA)


def synthesize_media_assets(docs: DataFrame) -> DataFrame:
    """Deterministic REAL media fixtures per document — the generator half
    of the media_probe gate: doc_id % 4 selects the container, the id
    parameterizes its size, and the payload is produced by the actual
    pure-stdlib ENCODERS (png_encode / wav_encode / mp3_frames_fixture /
    flac_encode), so a downstream probe exercises the real parse paths on
    every row. Arrow mapInPandas; encoding is per-row independent (scales
    with splits)."""

    def synth_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"asset_id": [], "payload": []}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                sel = i % 4
                if sel == 0:
                    w = 8 + i % 8
                    img = np.tile(
                        np.arange(w, dtype=np.uint8)[None, :] * 7, (8, 1)
                    )[:, :, None].repeat(3, axis=2)
                    raw = codecs.png_encode(img)
                elif sel == 1:
                    n = 100 + i % 50
                    pcm = ((np.arange(n) * 37 + i) % 997 - 498).astype(np.int16)
                    raw = codecs.wav_encode(pcm, rate=16000)
                elif sel == 2:
                    raw = codecs.mp3_frames_fixture(
                        n_frames=2 + i % 3, bitrate_kbps=128
                    )
                else:
                    n = 64 + i % 32
                    pcm = ((np.arange(n) * 53 + i) % 811 - 405).astype(np.int16)
                    raw = codecs.flac_encode(pcm, rate=16000)
                out["asset_id"].append(i)
                out["payload"].append(raw)
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(synth_kernel, "asset_id long, payload binary")
