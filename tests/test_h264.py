"""H.264 baseline I-frame codec (operators/h264.py) + avc1 MP4 integration.

Verification standard (same as the progressive-JPEG / FLAC fixtures, since
no H.264 ground-truth decoder exists in this container — ENVIRONMENT.md):
the encoder runs the decoder's exact reconstruction arithmetic as its local
loop, so ``decode(encode(x)) == encoder_reconstruction`` is a BIT-EXACT
equality across QPs, every intra prediction mode, all macroblock types and
container paths; I_PCM gives true pixel identity. Structural spec
properties (VLC prefix-freedom, CAVLC roundtrips, emulation prevention) are
pinned independently of the pair.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from kafkasparkstream_spark.operators import codecs
from kafkasparkstream_spark.operators import h264 as H


def _smooth(h, w, k=0.6):
    gx = np.linspace(20, 235, w)[None, :]
    gy = np.linspace(30, 225, h)[:, None]
    img = np.stack([k * gx + (1 - k) * gy, 0.3 * gx + 0.7 * gy, 0.5 * gx + 0.5 * gy], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


def _textured(h, w, seed=11, sigma=14):
    r = np.random.default_rng(seed)
    return np.clip(_smooth(h, w).astype(float) + r.normal(0, sigma, (h, w, 3)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# CAVLC structural properties
# ---------------------------------------------------------------------------


def test_vlc_tables_prefix_free_and_complete():
    def check(m, name):
        for (l1, c1), (l2, c2) in itertools.combinations(sorted(m), 2):
            if l1 <= l2 and (c2 >> (l2 - l1)) == c1:
                raise AssertionError(f"{name}: ({l1},{c1}) prefixes ({l2},{c2})")
            if l2 < l1 and (c1 >> (l1 - l2)) == c2:
                raise AssertionError(f"{name}: ({l2},{c2}) prefixes ({l1},{c1})")
        assert all(l <= 16 for l, _ in m)
        kraft = sum(2.0 ** -l for l, _ in m)
        assert kraft <= 1.0 + 1e-12, f"{name}: kraft {kraft}"

    for i, m in enumerate(H._CT_MAPS):
        check(m, f"coeff_token ctx{i}")
        # all 62 symbols (tc 0 + 1..16 x valid t1) present
        assert len(m) == 62
    check(H._CT_CDC_MAP, "coeff_token chromaDC")
    for i, m in enumerate(H._TZ_MAPS):
        check(m, f"total_zeros tc{i + 1}")
        assert len(m) == 16 - i
    for i, m in enumerate(H._TZ_CDC_MAPS):
        check(m, f"total_zeros cdc tc{i + 1}")
    for i, m in enumerate(H._RB_MAPS):
        check(m, f"run_before z{i + 1}")


def test_cavlc_residual_roundtrip_fuzz():
    rng = np.random.default_rng(42)
    mags = [1, 1, 1, 2, 3, 5, 10, 50, 300, 3000, 40000, 70000, 500000]
    for _ in range(1500):
        max_coeff = int(rng.choice([16, 15, 4]))
        nC = -1 if max_coeff == 4 else int(rng.choice([0, 1, 2, 3, 5, 7, 8, 12]))
        coeffs = [0] * max_coeff
        n_nz = int(rng.integers(0, max_coeff + 1))
        for p in rng.choice(max_coeff, size=n_nz, replace=False):
            coeffs[p] = int(rng.choice(mags)) * int(rng.choice([1, -1]))
        w = H._BitWriter()
        H.encode_residual_block(w, coeffs, nC, max_coeff)
        w.rbsp_trailing()
        got = H.decode_residual_block(H._BitReader(w.bytes()), nC, max_coeff)
        assert got == coeffs, (nC, max_coeff, coeffs, got)


def test_emulation_prevention_roundtrip():
    for rbsp in (b"\x00\x00\x00\x00\x01", b"\x00\x00\x03\x00\x00\x02",
                 b"ab\x00\x00\x00cd", bytes(range(256)) * 3):
        ebsp = H.rbsp_to_ebsp(rbsp)
        # no raw 00 00 0x (x <= 2) may survive in the EBSP (00 00 03 is
        # the emulation-prevention marker itself and is legal)
        for i in range(len(ebsp) - 2):
            assert not (ebsp[i] == 0 and ebsp[i + 1] == 0 and ebsp[i + 2] <= 2), ebsp
        assert H.ebsp_to_rbsp(ebsp) == rbsp


# ---------------------------------------------------------------------------
# Transform / quant gain anchors
# ---------------------------------------------------------------------------


def test_flat_residual_gain_consistency():
    """A flat residual of mean m must reconstruct to ~m through every
    coefficient path: normal 4x4, luma-DC hadamard, chroma-DC hadamard —
    the gain relation that caught the chroma >>5-vs->>1 scaling defect."""
    for m in (4, 17, -23, 60):
        x = np.full((4, 4), m, dtype=np.int64)
        for qp in (0, 8, 16, 28, 40):
            w = H.forward_transform4(x)
            z = H.quantize4(w, qp)
            r = H.inverse_transform4(H.dequantize4(z, qp))
            step = 0.675 * 2 ** (qp / 6)
            assert abs(float(r.mean()) - m) <= max(1.0, step), (m, qp, r.mean())
        # luma DC plane: 16 blocks all with DC 16*m
        dcs = np.full((4, 4), 16 * m, dtype=np.int64)
        z = H.luma_dc_quant(dcs, 16)
        d = H.luma_dc_dequant(H._scan_to_block(H._block_to_scan(z)), 16)
        # inverse transform of DC-only block: sample = (d + 32) >> 6
        got = (d[0, 0] + 32) >> 6
        assert abs(int(got) - m) <= 2, (m, got)
        # chroma DC plane (2x2 of blocks)
        dc2 = np.full((2, 2), 16 * m, dtype=np.int64)
        z2 = H.chroma_dc_quant(dc2, 16)
        d2 = H.chroma_dc_dequant(z2, 16)
        got = (d2[0, 0] + 32) >> 6
        assert abs(int(got) - m) <= 2, (m, got)


# ---------------------------------------------------------------------------
# Encode/decode identity (the conformance pair)
# ---------------------------------------------------------------------------


def test_pcm_is_pixel_exact_end_to_end():
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    bs, recon = H.h264_encode_annexb([frame], mode="pcm", with_recon=True)
    dec = H.h264_decode_annexb(bs)
    assert np.array_equal(dec[0], recon[0])
    # PCM recon differs from the source only by the 4:2:0 color roundtrip;
    # luma is carried exactly, so grayscale input survives pixel-exact
    gray = np.repeat(rng.integers(0, 256, (32, 48, 1), dtype=np.uint8), 3, axis=2)
    bs, _ = H.h264_encode_annexb([gray], mode="pcm", with_recon=True)
    dec = H.h264_decode_annexb(bs)
    assert np.abs(dec[0].astype(int) - gray.astype(int)).max() <= 1


@pytest.mark.parametrize("mode", ["i4x4", "i16x16", "mixed"])
def test_decode_equals_encoder_recon_across_qp(mode):
    frames = [_textured(48, 64, 7), np.flipud(_textured(48, 64, 8)).copy()]
    for qp in (4, 18, 30, 44):
        bs, recon = H.h264_encode_annexb(frames, qp=qp, mode=mode, with_recon=True)
        dec = H.h264_decode_annexb(bs)
        assert len(dec) == len(frames)
        for d, r in zip(dec, recon):
            assert np.array_equal(d, r), (mode, qp)


def test_all_intra_prediction_modes_roundtrip():
    tex = _textured(48, 64)
    for lm in range(9):
        bs, recon = H.h264_encode_annexb([tex], qp=20, mode="i4x4", luma_mode=lm, with_recon=True)
        assert np.array_equal(H.h264_decode_annexb(bs)[0], recon[0]), f"luma4x4 mode {lm}"
    for im in range(4):
        for cm in range(4):
            bs, recon = H.h264_encode_annexb([tex], qp=24, mode="i16x16",
                                             i16_mode=im, chroma_mode=cm, with_recon=True)
            assert np.array_equal(H.h264_decode_annexb(bs)[0], recon[0]), (im, cm)


def test_rate_distortion_sanity():
    """Transform coding must approach the pure 4:2:0 conversion floor at
    low QP and trade bytes for error monotonically-ish with QP."""
    tex = _textured(48, 64)
    bs_pcm, _ = H.h264_encode_annexb([tex], mode="pcm", with_recon=True)
    floor = float(np.abs(H.h264_decode_annexb(bs_pcm)[0].astype(int) - tex.astype(int)).mean())
    sizes, errs = [], []
    for qp in (4, 28, 44):
        bs = H.h264_encode_annexb([tex], qp=qp, mode="i4x4")
        d = H.h264_decode_annexb(bs)[0]
        sizes.append(len(bs))
        errs.append(float(np.abs(d.astype(int) - tex.astype(int)).mean()))
    assert errs[0] <= floor + 0.5, (errs[0], floor)
    assert sizes[0] > sizes[1] > sizes[2]
    assert errs[2] > errs[0]


def test_cropped_sizes_and_multiframe():
    fs = [_smooth(34, 50), np.flipud(_smooth(34, 50)).copy(), _textured(34, 50)]
    bs, recon = H.h264_encode_annexb(fs, qp=26, mode="mixed", with_recon=True)
    dec = H.h264_decode_annexb(bs)
    assert [d.shape for d in dec] == [(34, 50, 3)] * 3
    assert all(np.array_equal(d, r) for d, r in zip(dec, recon))
    meta = H.h264_probe(bs)
    assert (meta["width"], meta["height"], meta["n_idr"]) == (50, 34, 3)
    # lazy per-index decode equals the full pass
    lazy = H.h264_decode_frames_at(bs, [2, 0])
    assert np.array_equal(lazy[0], dec[2]) and np.array_equal(lazy[1], dec[0])


def test_error_contracts():
    f = _smooth(32, 48)
    bs = H.h264_encode_annexb([f], qp=30)
    with pytest.raises(ValueError):
        H.h264_decode_annexb(bs[: len(bs) // 2])  # truncated mid-slice
    with pytest.raises(ValueError):
        H.h264_decode_annexb(b"\x00\x01\x02\x03")  # no start code
    with pytest.raises(ValueError):
        H.h264_encode_annexb([_smooth(33, 48)])  # odd height
    with pytest.raises(ValueError):
        H.h264_encode_annexb([f], qp=77)
    with pytest.raises(ValueError):
        H.h264_encode_annexb([], qp=20)
    # IDR before SPS/PPS
    idr = next(n for n in H.split_annexb(bs) if n[0] & 0x1F == 5)
    with pytest.raises(ValueError):
        H.h264_decode_annexb(b"\x00\x00\x00\x01" + idr)


def test_sniff_and_mp4_avc1_roundtrip():
    fs = [_smooth(32, 48), _smooth(32, 48, 0.2)]
    raw = H.h264_encode_annexb(fs, qp=20)
    assert codecs.sniff(raw) == "h264"
    mp4 = codecs.mp4_encode_h264(fs, qp=20)
    assert codecs.sniff(mp4) == "mp4"
    meta = codecs.mp4_probe(mp4)
    assert meta["codec"] == "avc1" and meta["n_samples"] == 2
    dec = codecs.mp4_decode_frames(mp4)
    assert len(dec) == 2 and dec[0].shape == (32, 48, 3)
    # container-path pixels == elementary-stream pixels
    es = H.h264_decode_annexb(raw)
    assert all(np.array_equal(a, b) for a, b in zip(dec, es))
    # lazy sample decode
    lazy = codecs.mp4_decode_avc_samples(mp4, [1])
    assert np.array_equal(lazy[0], dec[1])


def test_image_features_and_sample_frames_route_h264(spark):
    from kafkasparkstream_spark.operators.multimodal import image_features, sample_frames

    fs = [_smooth(32, 48), _smooth(32, 48, 0.15), _smooth(32, 48, 0.9)]
    raw = H.h264_encode_annexb(fs, qp=22)
    mp4 = codecs.mp4_encode_h264(fs, qp=22)
    assets = spark.createDataFrame(
        [(1, "video", bytearray(raw)), (2, "video", bytearray(mp4))],
        "asset_id long, media_type string, payload binary",
    )
    feats = {r["asset_id"]: r for r in image_features(assets).collect()}
    assert feats[1]["width"] == 48 and feats[1]["height"] == 32
    assert feats[2]["width"] == 48 and feats[2]["height"] == 32
    # both container paths must surface the SAME first frame -> identical
    # pixel-derived embedding
    assert feats[1]["embedding"] == feats[2]["embedding"]

    rows = sample_frames(assets, every_n=2, max_frames=2).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r["frame_index"])
    assert by_asset[1] == [0, 2] and by_asset[2] == [0, 2]
    # frames re-emitted as PNG decode back to the codec's own pixels
    png0 = next(r["frame"] for r in rows if r["asset_id"] == 1 and r["frame_index"] == 2)
    assert np.array_equal(codecs.png_decode(bytes(png0)), H.h264_decode_frames_at(raw, [2])[0])
