"""Multimodal plumbing tests: schema, Arrow batching, fan-out shape, and
REAL decode for the stdlib-supported containers.

PNG and WAV payloads are genuinely decoded (operators/codecs.py — zlib
scanline decode, RIFF/PCM parse); other payloads take the deterministic
digest-derived fallback. Tests pin both paths plus the Spark-side contract:
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


def _png_assets(spark, imgs):
    """(asset_id, payload) DataFrame of real PNG payloads."""
    from kafkasparkstream_spark.operators.codecs import png_encode

    rows = [(i, bytearray(png_encode(img))) for i, img in enumerate(imgs)]
    return spark.createDataFrame(rows, "asset_id long, payload binary")


def test_real_png_decode_through_image_features(spark):
    """PNG payloads must yield the image's ACTUAL dimensions and a
    pixel-derived embedding — not the digest fallback."""
    import numpy as np

    rng = np.random.default_rng(11)
    imgs = [
        rng.integers(0, 256, (5, 9, 3), dtype=np.uint8),
        rng.integers(0, 256, (17, 3, 1), dtype=np.uint8),
        rng.integers(0, 256, (4, 4, 4), dtype=np.uint8),
    ]
    rows = {r.asset_id: r for r in image_features(_png_assets(spark, imgs)).collect()}
    for i, img in enumerate(imgs):
        h, w, ch = img.shape
        assert (rows[i].width, rows[i].height) == (w, h), i
        # embedding[0] = channel-0 mean, exact integer-sum math
        want = round(float(img[:, :, 0].astype(np.int64).sum()) / (255.0 * h * w) - 0.5, 6)
        assert rows[i].embedding[0] == want


def test_real_png_resize_is_area_weighted(spark):
    """Resize of a real PNG must be the exact box-average thumbnail,
    verified via the output digest against a locally computed reference."""
    import hashlib

    import numpy as np

    from kafkasparkstream_spark.operators.codecs import box_resize, png_encode
    from kafkasparkstream_spark.operators.multimodal import resize_images

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    r = resize_images(_png_assets(spark, [img]), 4, 4).collect()[0]
    want_png = png_encode(box_resize(img, 4, 4))
    assert r["n_bytes_out"] == len(want_png)
    assert r["resized_sha256"] == hashlib.sha256(want_png).hexdigest()
    # and the digest really is a 4x4 block-mean image
    blocks = np.rint(
        img.astype(np.int64).reshape(4, 2, 4, 2, 3).mean(axis=(1, 3))
    ).astype(np.uint8)
    assert hashlib.sha256(png_encode(blocks)).hexdigest() == r["resized_sha256"]


def test_real_wav_audio_features(spark):
    """WAV payloads must yield sample counts/energy from the actual PCM
    stream, not from payload bytes."""
    import numpy as np

    from kafkasparkstream_spark.operators.codecs import wav_encode
    from kafkasparkstream_spark.operators.multimodal import audio_features

    x = (np.sin(np.arange(500) / 7.0) * 9000).astype(np.int16)
    stereo = np.stack([x, -x], axis=1)
    df = spark.createDataFrame(
        [(0, bytearray(wav_encode(x))), (1, bytearray(wav_encode(stereo)))],
        "asset_id long, payload binary",
    )
    rows = {r.asset_id: r for r in audio_features(df).collect()}
    e_mono = int((x.astype(np.int64) ** 2).sum())
    assert rows[0].n_samples == 500 and rows[0].energy == e_mono
    assert rows[1].n_samples == 1000 and rows[1].energy == 2 * e_mono


def test_flac_roundtrip_all_paths():
    """FLAC encode→decode identity across every decoder path: fixed and
    forced-LPC predictors, all four stereo decorrelation modes, constant
    and wasted-bits subframes, Rice and raw-escape residuals, multi-frame
    streams, and the empty stream."""
    import numpy as np

    from kafkasparkstream_spark.operators.codecs import flac_decode, flac_encode

    rng = np.random.default_rng(7)
    x = rng.normal(0, 3000, 10000).astype(np.int16)

    # mono, multiple frames
    dec, rate = flac_decode(flac_encode(x, rate=16000, block_size=4096))
    assert rate == 16000 and np.array_equal(dec[:, 0], x.astype(np.int64))

    # stereo, all channel layouts
    st2 = np.stack(
        [rng.normal(0, 5000, 5000).astype(np.int16),
         rng.normal(0, 5000, 5000).astype(np.int16)],
        axis=1,
    )
    for mode in ("indep", "left_side", "right_side", "mid_side"):
        dec, rate = flac_decode(
            flac_encode(st2, rate=44100, block_size=1024, stereo_mode=mode)
        )
        assert rate == 44100 and np.array_equal(dec, st2.astype(np.int64)), mode

    # LPC subframe layout (bit-identical predictor expressed through LPC)
    dec, _ = flac_decode(flac_encode(x, rate=8000, force_lpc=True))
    assert np.array_equal(dec[:, 0], x.astype(np.int64))

    # constant subframe + wasted-bits extraction
    const = np.full(3000, 640, dtype=np.int16)
    dec, _ = flac_decode(flac_encode(const, rate=16000))
    assert np.array_equal(dec[:, 0], const.astype(np.int64))
    shifted = (rng.integers(-400, 400, 2000) * 64).astype(np.int16)
    dec, _ = flac_decode(flac_encode(shifted, rate=16000))
    assert np.array_equal(dec[:, 0], shifted.astype(np.int64))

    # raw-escape residuals on max-entropy noise (rice would expand)
    noise = rng.integers(-(2**15), 2**15, 4096).astype(np.int16)
    dec, _ = flac_decode(flac_encode(noise, rate=16000))
    assert np.array_equal(dec[:, 0], noise.astype(np.int64))

    # empty stream
    dec, _ = flac_decode(flac_encode(np.zeros((0,), dtype=np.int16)))
    assert dec.shape == (0, 1)


def test_flac_crc_anchors_and_error_contract():
    """The CRC polynomials match the FLAC spec via published check values
    (CRC-8 poly 0x07 -> 0xF4, CRC-16/BUYPASS poly 0x8005 -> 0xFEE8 over
    b'123456789') — an anchor independent of our own encoder. Malformed
    streams raise ValueError: bad magic, truncation, a flipped payload
    byte (frame CRC-16), and a corrupted STREAMINFO MD5."""
    import numpy as np
    import pytest

    from kafkasparkstream_spark.operators.codecs import (
        _flac_crc8,
        _flac_crc16,
        flac_decode,
        flac_encode,
    )

    assert _flac_crc8(b"123456789") == 0xF4
    assert _flac_crc16(b"123456789") == 0xFEE8

    x = np.arange(-1000, 1000, dtype=np.int16)
    enc = flac_encode(x, rate=16000)
    with pytest.raises(ValueError, match="magic"):
        flac_decode(b"XLAC" + enc[4:])
    with pytest.raises(ValueError, match="truncated"):
        flac_decode(enc[: len(enc) - 6])
    with pytest.raises(ValueError, match="crc"):
        flac_decode(enc[:-1] + bytes([enc[-1] ^ 0xFF]))
    # corrupt one MD5 byte in STREAMINFO (offset: 4 magic + 4 block header
    # + 18 fixed fields; md5 is the last 16 bytes of the 34-byte block)
    bad = bytearray(enc)
    bad[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="md5"):
        flac_decode(bytes(bad))


def test_flac_roundtrip_property():
    """Property: any int16 signal, mono or stereo, any stereo mode,
    round-trips bit-exactly."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafkasparkstream_spark.operators.codecs import flac_decode, flac_encode

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 600),
        mode=st.sampled_from(["mono", "indep", "left_side", "right_side", "mid_side"]),
        scale=st.sampled_from([1, 40, 32000]),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(n, mode, scale, seed):
        rng = np.random.default_rng(seed)
        x = np.clip(
            rng.normal(0, scale, (n, 1 if mode == "mono" else 2)), -32768, 32767
        ).astype(np.int16)
        enc = flac_encode(
            x, rate=8000, block_size=256,
            stereo_mode="indep" if mode == "mono" else mode,
        )
        dec, rate = flac_decode(enc)
        assert rate == 8000 and np.array_equal(dec, x.astype(np.int64))

    roundtrip()


def test_real_flac_audio_features(spark):
    """FLAC payloads must yield sample counts/energy from the decoded PCM,
    matching the same signal shipped as WAV."""
    import numpy as np

    from kafkasparkstream_spark.operators.codecs import flac_encode, wav_encode
    from kafkasparkstream_spark.operators.multimodal import audio_features

    x = (np.sin(np.arange(700) / 5.0) * 11000).astype(np.int16)
    stereo = np.stack([x, -x], axis=1)
    df = spark.createDataFrame(
        [
            (0, bytearray(flac_encode(x, rate=16000))),
            (1, bytearray(flac_encode(stereo, rate=16000, stereo_mode="mid_side"))),
            (2, bytearray(wav_encode(x))),
        ],
        "asset_id long, payload binary",
    )
    rows = {r.asset_id: r for r in audio_features(df).collect()}
    e_mono = int((x.astype(np.int64) ** 2).sum())
    assert rows[0].n_samples == 700 and rows[0].energy == e_mono
    assert rows[1].n_samples == 1400 and rows[1].energy == 2 * e_mono
    # FLAC and WAV of the same signal agree exactly
    assert rows[0].energy == rows[2].energy and rows[0].rms == rows[2].rms


def test_mixed_real_and_fallback_assets(spark):
    """One DataFrame mixing a real PNG, a truncated PNG, and garbage bytes:
    the real one decodes, the malformed ones fall back deterministically —
    the kernel is total over arbitrary payloads."""
    import hashlib

    import numpy as np

    from kafkasparkstream_spark.operators.codecs import png_encode

    img = np.full((6, 10, 3), 200, dtype=np.uint8)
    png = png_encode(img)
    garbage = hashlib.sha256(b"x").digest()
    df = spark.createDataFrame(
        [(0, bytearray(png)), (1, bytearray(png[:20])), (2, bytearray(garbage))],
        "asset_id long, payload binary",
    )
    rows = {r.asset_id: r for r in image_features(df).collect()}
    assert (rows[0].width, rows[0].height) == (10, 6)
    for aid, raw in [(1, bytes(png[:20])), (2, garbage)]:
        d = hashlib.sha256(raw).digest()
        assert (rows[aid].width, rows[aid].height) == (64 + d[0] % 192, 64 + d[1] % 192)


def test_codec_roundtrips_property():
    """Pure-codec property tests (no Spark): PNG encode→decode is the
    identity for every supported channel count and shape, including 1-pixel
    edges; WAV roundtrips mono/stereo int16; box_resize preserves constant
    images exactly and never leaves the input value range."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafkasparkstream_spark.operators.codecs import (
        box_resize,
        png_decode,
        png_encode,
        wav_decode,
        wav_encode,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        ch=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def png_roundtrip(h, w, ch, seed):
        img = np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(img)), img)

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 300),
        stereo=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def wav_roundtrip(n, stereo, seed):
        x = np.random.default_rng(seed).integers(-(2**15), 2**15, n, dtype=np.int64)
        x = x.astype(np.int16)
        s = np.stack([x, x[::-1]], axis=1) if stereo else x
        dec, rate = wav_decode(wav_encode(s, 8000))
        assert rate == 8000
        want = s if stereo else x[:, None]
        assert np.array_equal(dec, want.astype(np.int64))

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 10),
        w=st.integers(1, 10),
        th=st.integers(1, 10),
        tw=st.integers(1, 10),
        v=st.integers(0, 255),
    )
    def resize_invariants(h, w, th, tw, v):
        const = np.full((h, w, 3), v, dtype=np.uint8)
        r = box_resize(const, tw, th)
        assert r.shape == (th, tw, 3)
        assert (r == v).all()  # area-weighted mean of a constant is itself

    png_roundtrip()
    wav_roundtrip()
    resize_invariants()


def test_real_gif_frame_sampling(spark):
    """GIF payloads must fan out to ACTUAL decoded frames (re-encoded as
    PNG), with the every_n stride and max_frames cap applied to the real
    frame sequence — not to byte chunks."""
    import numpy as np

    from kafkasparkstream_spark.operators.codecs import (
        gif_encode_frames,
        png_decode,
    )
    from kafkasparkstream_spark.operators.multimodal import sample_frames

    rng = np.random.default_rng(17)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx_frames = [rng.integers(0, 16, (6, 4), dtype=np.uint8) for _ in range(7)]
    gif = gif_encode_frames(idx_frames, pal)
    df = spark.createDataFrame([(0, bytearray(gif))], "asset_id long, payload binary")
    rows = sorted(
        sample_frames(df, every_n=2, max_frames=3).collect(),
        key=lambda r: r.frame_index,
    )
    # 7 frames, stride 2, cap 3 -> indices 0, 2, 4
    assert [r.frame_index for r in rows] == [0, 2, 4]
    for r in rows:
        got = png_decode(bytes(r.frame))
        want = pal[idx_frames[r.frame_index]]
        assert np.array_equal(got, want), r.frame_index


def test_gif_codec_property_roundtrip():
    """Pure-codec: GIF encode->decode is the identity (through the palette)
    for random frame stacks, including 256-color palettes that force 12-bit
    LZW code growth and table resets."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafkasparkstream_spark.operators.codecs import (
        gif_decode_frames,
        gif_encode_frames,
    )

    @settings(max_examples=20, deadline=None)
    @given(
        nf=st.integers(1, 4),
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        ncol=st.sampled_from([2, 16, 256]),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(nf, h, w, ncol, seed):
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        frames = [rng.integers(0, ncol, (h, w), dtype=np.uint8) for _ in range(nf)]
        dec = gif_decode_frames(gif_encode_frames(frames, pal))
        assert len(dec) == nf
        for f, d in zip(frames, dec):
            assert np.array_equal(d, pal[f])

    roundtrip()


def test_gif_first_frame_through_image_features(spark):
    """A GIF payload's image features must come from its real first frame
    (dims + pixel embedding), matching the PNG path's treatment of the
    same pixels."""
    import numpy as np

    from kafkasparkstream_spark.operators.codecs import gif_encode_frames

    rng = np.random.default_rng(23)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    first = rng.integers(0, 16, (9, 5), dtype=np.uint8)
    gif = gif_encode_frames([first, rng.integers(0, 16, (9, 5), dtype=np.uint8)], pal)
    df = spark.createDataFrame([(0, bytearray(gif))], "asset_id long, payload binary")
    r = image_features(df).collect()[0]
    assert (r.width, r.height) == (5, 9)
    rgb = pal[first]
    want = round(float(rgb[:, :, 0].astype(np.int64).sum()) / (255.0 * 9 * 5) - 0.5, 6)
    assert r.embedding[0] == want


def test_jpeg_codec_property_roundtrip():
    """JPEG encode→decode property: output parses as baseline JPEG, decodes
    to the exact source dimensions, and pixel error stays within the
    quantization budget at q=90 across gray/RGB, 4:4:4/4:2:0, and restart
    intervals. Lossy, so the bound is on mean absolute error (the smooth
    gradient keeps high-frequency quantization noise small)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafkasparkstream_spark.operators.codecs import (
        jpeg_decode,
        jpeg_encode,
        sniff,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        gray=st.booleans(),
        subsample=st.booleans(),
        rst=st.sampled_from([0, 2]),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(h, w, gray, subsample, rst, seed):
        rng = np.random.default_rng(seed)
        base = rng.integers(0, 256, (1 if gray else 3,)).astype(np.float64)
        yy, xx = np.mgrid[0:h, 0:w]
        grad = (yy * 2 + xx * 3) % 97
        img = np.clip(base[None, None, :] * 0.5 + grad[:, :, None], 0, 255).astype(
            np.uint8
        )
        if gray:
            img = img[:, :, :1]
        enc = jpeg_encode(img, quality=90, subsample=not gray and subsample,
                          restart_interval=rst)
        assert sniff(enc) == "jpeg"
        dec = jpeg_decode(enc)
        assert dec.shape[:2] == (h, w)
        assert dec.shape[2] == (1 if gray else 3)
        ref = img.astype(np.float64)
        got = dec.astype(np.float64)
        assert np.abs(got - ref).mean() < 16.0, np.abs(got - ref).mean()

    roundtrip()


def test_jpeg_through_image_features(spark):
    """A baseline JPEG payload must yield its ACTUAL dims and an embedding
    computed from the decoded pixels (bit-equal to running the pure codec
    locally) — not the digest fallback. A truncated SOF2 header with no
    scan data stays on the deterministic fallback (kernel total over
    malformed input)."""
    import numpy as np

    from kafkasparkstream_spark.operators.codecs import jpeg_encode
    from kafkasparkstream_spark.operators.multimodal import _decode_image

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    jpg = jpeg_encode(img, quality=85, subsample=True)
    # Reference pixels through the SAME decode path the kernel uses: with
    # PIL installed the kernel prefers PIL, whose IDCT/upsampling differs
    # from the pure codec by a few LSBs — computing the reference via
    # codecs.jpeg_decode would break the bit-equality assertion there.
    decoded = _decode_image(bytes(jpg))
    assert decoded is not None

    # A scanless SOF2 header (no SOS) → decoder raises → fallback.
    fake_prog = b"\xff\xd8\xff\xc2" + b"\x00\x0b" + b"\x08\x00\x08\x00\x08\x01\x01\x11\x00"

    df = spark.createDataFrame(
        [(0, bytearray(jpg)), (1, bytearray(fake_prog))],
        "asset_id long, payload binary",
    )
    rows = {r.asset_id: r for r in image_features(df).collect()}
    assert (rows[0].width, rows[0].height) == (7, 11)
    h, w, _ = decoded.shape
    want = round(
        float(decoded[:, :, 0].astype(np.int64).sum()) / (255.0 * h * w) - 0.5, 6
    )
    assert rows[0].embedding[0] == want
    # fallback row: digest-derived dims, deterministic across runs
    assert rows[1].width > 0 and rows[1].height > 0
    again = {r.asset_id: r for r in image_features(df).collect()}
    assert again[1].width == rows[1].width and again[1].embedding == rows[1].embedding


def test_jpeg_decode_tolerates_fill_bytes_and_rejects_truncation():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a marker —
    a legal stream with padding must decode to the same pixels as the
    unpadded stream (both between header segments and before an in-scan
    restart marker). A payload truncated mid-entropy-data must raise
    ValueError (total kernels map it to the digest fallback), never
    IndexError."""
    import numpy as np
    import pytest

    from kafkasparkstream_spark.operators.codecs import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(7)
    # big enough for multiple MCUs so restart_interval=2 actually emits RSTn
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    enc = jpeg_encode(img, quality=85, subsample=True, restart_interval=2)
    ref = jpeg_decode(enc)

    # pad every non-entropy marker AFTER SOI (the file must still start
    # with the unpadded FF D8 signature) with a fill byte
    sos = enc.index(b"\xff\xda")
    padded = bytearray(enc[:2])
    i = 2
    while i < sos:
        if enc[i] == 0xFF:
            padded += b"\xff"  # one extra fill byte before each marker
        padded.append(enc[i])
        i += 1
    padded += enc[sos:]
    got = jpeg_decode(bytes(padded))
    assert np.array_equal(got, ref)

    # fill byte before an in-scan restart marker
    rst = enc.index(b"\xff\xd0", sos)
    in_scan = enc[:rst] + b"\xff" + enc[rst:]
    got2 = jpeg_decode(bytes(in_scan))
    assert np.array_equal(got2, ref)

    # truncation mid-entropy-data: ValueError, not IndexError
    with pytest.raises(ValueError):
        jpeg_decode(bytes(enc[: sos + 20]))


def test_jpeg_malformed_streams_raise_valueerror_consistently():
    """The codec contract is 'errors loudly via ValueError' — malformed or
    out-of-scope streams must never escape as IndexError/KeyError/
    struct.error (r4 advice): truncated length fields, non-dividing
    sampling factors, partial-SOS (multi-scan) coverage, DRI promising
    more restart segments than the scan holds, and out-of-range encoder
    quality."""
    import numpy as np
    import pytest

    from kafkasparkstream_spark.operators.codecs import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)

    # encoder quality validation
    for q in (0, -5, 101):
        with pytest.raises(ValueError, match="quality"):
            jpeg_encode(img, quality=q)

    # header truncated inside a segment length field: ValueError, not struct.error
    with pytest.raises(ValueError, match="truncated"):
        jpeg_decode(b"\xff\xd8\xff\xdb\x00")

    enc = jpeg_encode(img, quality=85, subsample=True, restart_interval=2)

    # non-dividing sampling factors (legal T.81, out of scope here): loud
    # scope rejection, not a numpy shape error. SOF payload: marker(2) +
    # len(2) + prec(1) + h(2) + w(2) + nc(1), then (id, h<<4|v, tq) per
    # component -> Y's hv byte is sof+11, Cb's is sof+14.
    sof = enc.index(b"\xff\xc0")
    bad = bytearray(enc)
    bad[sof + 11] = 0x31  # Y: 3x1
    bad[sof + 14] = 0x21  # Cb: 2x1 -> hmax=3 % 2 != 0
    with pytest.raises(ValueError, match="sampling"):
        jpeg_decode(bytes(bad))

    # SOS covering fewer components than SOF (multi-scan file): ValueError,
    # not KeyError. Rebuild the SOS header with ns=2.
    sos = enc.index(b"\xff\xda")
    seg_len = int.from_bytes(enc[sos + 2 : sos + 4], "big")
    ns = enc[sos + 4]
    assert ns == 3 and seg_len == 2 + 1 + 2 * 3 + 3
    partial = (
        enc[:sos]
        + b"\xff\xda"
        + (seg_len - 2).to_bytes(2, "big")
        + bytes([2])
        + enc[sos + 5 : sos + 5 + 4]  # first two (cs, td_ta) pairs
        + enc[sos + 5 + 6 : sos + 2 + seg_len]  # spectral bytes
        + enc[sos + 2 + seg_len :]
    )
    with pytest.raises(ValueError, match="multi-scan"):
        jpeg_decode(partial)

    # DRI promising more restart segments than present: cut the scan at its
    # last RSTn marker and close with EOI -> decode needs one more segment.
    last_rst = max(enc.rfind(bytes([0xFF, 0xD0 + k]), sos) for k in range(8))
    assert last_rst > sos
    with pytest.raises(ValueError, match="restart|exhausted"):
        jpeg_decode(enc[:last_rst] + b"\xff\xd9")

    # header cut mid-length-field: ValueError, not struct.error
    dri = enc.index(b"\xff\xdd")
    with pytest.raises(ValueError, match="truncated"):
        jpeg_decode(enc[: dri + 3])


def test_mp4_mjpeg_mux_demux_roundtrip():
    """Pure-codec: the fixture MJPEG muxer writes real ISO-BMFF sample
    tables, and the demuxer recovers every sample byte-exactly (each a
    complete baseline JPEG the decoder accepts); probe reads codec/dims/
    counts from the moov atom alone."""
    import numpy as np

    from kafkasparkstream_spark.operators.codecs import (
        jpeg_decode,
        jpeg_encode,
        mp4_decode_frames,
        mp4_demux,
        mp4_encode_mjpeg,
        mp4_probe,
        sniff,
    )

    rng = np.random.default_rng(31)
    frames = [rng.integers(0, 256, (24, 32, 3), dtype=np.uint8) for _ in range(7)]
    mp4 = mp4_encode_mjpeg(frames, fps=10, quality=85)
    assert sniff(mp4) == "mp4"
    meta = mp4_probe(mp4)
    assert meta == {
        "codec": "jpeg",
        "width": 32,
        "height": 24,
        "n_samples": 7,
        "timescale": 1000,
        "duration": 700,
    }
    samples = mp4_demux(mp4)
    assert [s[:3] for s in samples] == [b"\xff\xd8\xff"] * 7
    want = [jpeg_decode(jpeg_encode(f, quality=85)) for f in frames]
    got = mp4_decode_frames(mp4)
    assert len(got) == 7
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_mp4_malformed_and_out_of_scope_raise_valueerror():
    """Demux contract: truncated boxes, missing moov, and non-MJPEG codecs
    raise ValueError (kernels map that to the digest/chunk fallback)."""
    import numpy as np
    import pytest

    from kafkasparkstream_spark.operators.codecs import (
        mp4_decode_frames,
        mp4_demux,
        mp4_encode_mjpeg,
        mp4_probe,
    )

    rng = np.random.default_rng(37)
    mp4 = mp4_encode_mjpeg([rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)] * 2)

    with pytest.raises(ValueError, match="ftyp"):
        mp4_probe(b"\x00\x00\x00\x08freeJUNK")
    with pytest.raises(ValueError):
        mp4_demux(mp4[:40])  # cut inside moov
    # flip the stsd sample-entry fourcc to avc1: probe fine, decode refuses
    avc = bytearray(mp4)
    k = avc.find(b"jpeg")
    avc[k : k + 4] = b"avc1"
    assert mp4_probe(bytes(avc))["codec"] == "avc1"
    with pytest.raises(ValueError, match="avc1"):
        mp4_decode_frames(bytes(avc))
    # sample table pointing past EOF
    cut = mp4[: len(mp4) - 10]
    with pytest.raises(ValueError, match="beyond file end|truncated"):
        mp4_demux(cut)


def test_mp4_truncated_sample_tables_raise_valueerror_not_struct_error():
    """Codec contract: malformed COUNT FIELDS in stsz/stsc/stco must raise
    ValueError (like the JPEG side), never struct.error — direct
    mp4_demux/mp4_probe callers get a documented exception type."""
    import numpy as np
    import pytest

    from kafkasparkstream_spark.operators.codecs import (
        mp4_demux,
        mp4_encode_mjpeg,
        mp4_probe,
    )

    rng = np.random.default_rng(53)
    mp4 = mp4_encode_mjpeg([rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)] * 3)

    def corrupt_count(box: bytes, count: int) -> bytes:
        """Return the file with the box's 4-byte count field set huge."""
        k = mp4.find(box)
        assert k > 0, box
        out = bytearray(mp4)
        # fullbox: size(4) type(4) version/flags(4) then the count field —
        # except stsz where the count is at offset 8 after version/flags
        # (sample_size first).
        off = k + 4 + 4 + (4 if box == b"stsz" else 0)
        out[off : off + 4] = count.to_bytes(4, "big")
        return bytes(out)

    # huge ne in stsc -> 12*ne runs past the box payload
    with pytest.raises(ValueError, match="truncated stsc"):
        mp4_demux(corrupt_count(b"stsc", 1 << 24))
    # huge nc in stco -> 4*nc offsets past the box payload
    with pytest.raises(ValueError, match="truncated stco"):
        mp4_demux(corrupt_count(b"stco", 1 << 24))
    # huge n in stsz (variable sizes) -> 4*n sizes past the box payload
    with pytest.raises(ValueError, match="truncated stsz"):
        mp4_demux(corrupt_count(b"stsz", 1 << 24))
    # stsz box whose SIZE field says the payload is smaller than its own
    # 12-byte fixed header -> probe must refuse before unpacking
    k = mp4.find(b"stsz")
    shrunk = bytearray(mp4)
    shrunk[k - 4 : k] = (10).to_bytes(4, "big")
    with pytest.raises(ValueError, match="truncated stsz"):
        mp4_probe(bytes(shrunk))


def test_mp4_lazy_decode_only_sampled_frames(monkeypatch):
    """Scale contract (r5 ADVICE): a long MJPEG clip pays a JPEG decode only
    for the frames actually emitted — image_features' first frame and
    sample_frames' strided picks — never one per sample."""
    import numpy as np

    from kafkasparkstream_spark.operators import codecs, multimodal

    rng = np.random.default_rng(59)
    frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(12)]
    mp4 = codecs.mp4_encode_mjpeg(frames, fps=10, quality=90)

    calls = {"n": 0}
    real = codecs.jpeg_decode

    def counting(raw):
        calls["n"] += 1
        return real(raw)

    monkeypatch.setattr(codecs, "jpeg_decode", counting)

    img = multimodal._decode_image(mp4)
    assert img is not None and calls["n"] == 1  # thumbnail = 1 decode, not 12

    calls["n"] = 0
    picks = multimodal._sample_media_frames(mp4, "mp4", every_n=4, max_frames=3)
    assert [fi for fi, _ in picks] == [0, 4, 8]
    assert calls["n"] == 3  # only the strided indices, not all 12


def test_real_mp4_frame_sampling_and_features(spark):
    """A Motion-JPEG mp4 payload fans out to ACTUAL decoded frames through
    sample_frames (stride + cap on the real sample sequence, PNG
    re-encode), and image_features uses its real first frame; an
    out-of-scope codec falls back to deterministic byte chunks."""
    import numpy as np

    from kafkasparkstream_spark.operators.codecs import (
        jpeg_decode,
        jpeg_encode,
        mp4_encode_mjpeg,
        png_decode,
    )
    from kafkasparkstream_spark.operators.multimodal import sample_frames

    rng = np.random.default_rng(41)
    frames = [rng.integers(0, 256, (8, 12, 3), dtype=np.uint8) for _ in range(7)]
    mp4 = mp4_encode_mjpeg(frames, fps=5, quality=90)
    df = spark.createDataFrame([(0, bytearray(mp4))], "asset_id long, payload binary")
    rows = sorted(
        sample_frames(df, every_n=2, max_frames=3).collect(),
        key=lambda r: r.frame_index,
    )
    assert [r.frame_index for r in rows] == [0, 2, 4]
    for r in rows:
        got = png_decode(bytes(r.frame))
        want = jpeg_decode(jpeg_encode(frames[r.frame_index], quality=90))
        assert np.array_equal(got, want), r.frame_index

    feat = image_features(df).collect()[0]
    assert (feat.width, feat.height) == (12, 8)

    # out-of-scope codec: chunk fallback, frame bytes are payload slices
    avc = bytearray(mp4)
    k = avc.find(b"jpeg")
    avc[k : k + 4] = b"avc1"
    df2 = spark.createDataFrame([(1, bytes(avc))], "asset_id long, payload binary")
    rows2 = sorted(
        sample_frames(df2, every_n=2, max_frames=2).collect(),
        key=lambda r: r.frame_index,
    )
    assert [r.frame_index for r in rows2] == [0, 2]
    assert bytes(rows2[0].frame) == bytes(avc)[:16]


def test_jpeg_progressive_matches_baseline_pixels():
    """Progressive (SOF2) encode→decode must be PIXEL-IDENTICAL to the
    baseline path on the same image — both modes share the quantized
    coefficients, so the entropy layers (spectral selection, successive
    approximation with DC/AC refinement passes, EOB runs, per-scan DHTs)
    are fully cross-checked against the already-property-tested baseline."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafkasparkstream_spark.operators.codecs import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    @settings(max_examples=15, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        gray=st.booleans(),
        subsample=st.booleans(),
        successive=st.booleans(),
        restart=st.sampled_from([0, 1, 3]),
        quality=st.sampled_from([30, 85, 95]),
        seed=st.integers(0, 2**31 - 1),
    )
    def roundtrip(h, w, gray, subsample, successive, restart, quality, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w) if gray else (h, w, 3)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        sub = subsample and not gray
        base = jpeg_decode(jpeg_encode(img, quality=quality, subsample=sub))
        prog = jpeg_decode(
            jpeg_encode_progressive(
                img,
                quality=quality,
                subsample=sub,
                successive=successive,
                restart_interval=restart,
            )
        )
        assert np.array_equal(prog, base)

    roundtrip()


def test_progressive_jpeg_through_image_features(spark):
    """A real progressive JPEG payload decodes through the kernel path —
    actual dims, not the digest fallback (the r4 gap is closed)."""
    import numpy as np

    from kafkasparkstream_spark.operators.codecs import jpeg_encode_progressive

    rng = np.random.default_rng(43)
    img = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    prog = jpeg_encode_progressive(img, quality=85, successive=True)
    df = spark.createDataFrame([(0, bytearray(prog))], "asset_id long, payload binary")
    r = image_features(df).collect()[0]
    assert (r.width, r.height) == (7, 11)


def test_mp4_demux_multi_chunk_stsc_and_co64():
    """Sample-table generality the fixture muxer doesn't emit: stsc RUNS
    (run k applies from its first_chunk until the next run's first_chunk,
    14496-12 8.7.4) across multiple chunks, and 64-bit co64 chunk offsets.
    Hand-built container: 5 samples in 3 chunks as (2, 2, 1)."""
    import struct

    from kafkasparkstream_spark.operators.codecs import (
        _box,
        _full_box,
        mp4_demux,
        mp4_probe,
    )

    samples = [bytes([0x40 + i]) * (3 + i) for i in range(5)]
    # chunk layout: c1=[s0,s1] c2=[s2,s3] c3=[s4]; stsc runs: (1,2,1),(3,1,1)
    chunks = [b"".join(samples[0:2]), b"".join(samples[2:4]), samples[4]]

    def moov_for(offs):
        entry = (
            b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
            + struct.pack(">HH", 8, 8)
            + struct.pack(">II", 0x00480000, 0x00480000)
            + b"\x00" * 4 + struct.pack(">H", 1)
            + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
        )
        stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
        stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, 5, 100))
        stsc = _full_box(
            b"stsc", 0, 0,
            struct.pack(">I", 2) + struct.pack(">III", 1, 2, 1) + struct.pack(">III", 3, 1, 1),
        )
        stsz = _full_box(
            b"stsz", 0, 0,
            struct.pack(">II", 0, 5) + b"".join(struct.pack(">I", len(s)) for s in samples),
        )
        co64 = _full_box(
            b"co64", 0, 0,
            struct.pack(">I", 3) + b"".join(struct.pack(">Q", o) for o in offs),
        )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + co64)
        dref = _full_box(b"dref", 0, 0, struct.pack(">I", 1) + _full_box(b"url ", 0, 1, b""))
        minf = _box(b"minf", _full_box(b"vmhd", 0, 1, b"\x00" * 8) + _box(b"dinf", dref) + stbl)
        mdhd = _full_box(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 500) + struct.pack(">HH", 0x55C4, 0))
        hdlr = _full_box(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"V\x00")
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _full_box(
            b"tkhd", 0, 7,
            struct.pack(">IIIII", 0, 0, 1, 0, 500) + b"\x00" * 16
            + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", 8 << 16, 8 << 16),
        )
        mvhd = _full_box(
            b"mvhd", 0, 0,
            struct.pack(">IIII", 0, 0, 1000, 500) + struct.pack(">iH", 0x00010000, 0x0100)
            + b"\x00" * 10
            + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24 + struct.pack(">I", 2),
        )
        return _box(b"moov", mvhd + _box(b"trak", tkhd + mdia))

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    moov_len = len(moov_for([0, 0, 0]))
    mdat_payload_at = len(ftyp) + moov_len + 8
    offs = [mdat_payload_at]
    offs.append(offs[0] + len(chunks[0]))
    offs.append(offs[1] + len(chunks[1]))
    mp4 = ftyp + moov_for(offs) + _box(b"mdat", b"".join(chunks))

    meta = mp4_probe(mp4)
    assert meta["codec"] == "jpeg" and meta["n_samples"] == 5
    assert mp4_demux(mp4) == samples


def test_jpeg_progressive_structured_images_match_baseline():
    """Structured inputs random pixels never produce — constant planes
    (pure EOB-run streams), checkerboards (high-frequency AC), a single
    hot pixel (long ZRL chains inside refinement), fine stripes — must
    still decode pixel-identically to the baseline path, across quality
    extremes, 4:2:0, successive approximation and restart markers."""
    import numpy as np

    from kafkasparkstream_spark.operators.codecs import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    g = np.linspace(0, 255, 40).astype(np.uint8)
    cb = (np.indices((32, 32)).sum(0) % 2 * 255).astype(np.uint8)
    hot = np.zeros((24, 24, 3), np.uint8)
    hot[5, 7] = [255, 0, 255]
    stripe = np.zeros((17, 33, 3), np.uint8)
    stripe[:, ::2] = [10, 250, 60]
    cases = [
        np.full((24, 24, 3), 128, dtype=np.uint8),
        np.stack([np.tile(g, (40, 1))] * 3, axis=-1),
        np.stack([cb] * 3, axis=-1),
        hot,
        stripe,
    ]
    for img in cases:
        for q, sub, succ, ri in [(5, True, True, 2), (95, False, True, 0), (50, True, False, 0)]:
            base = jpeg_decode(jpeg_encode(img, quality=q, subsample=sub))
            dec = jpeg_decode(
                jpeg_encode_progressive(
                    img, quality=q, subsample=sub, successive=succ, restart_interval=ri
                )
            )
            assert np.array_equal(dec, base), (img.shape, q, sub, succ, ri)
