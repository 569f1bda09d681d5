"""MP3 frame-header probe and the unified media_probe kernel: header-table
correctness (ISO/IEC 11172-3 framing), ID3v2 skip, VBR detection, loud
errors on truncation, and the Spark-surface routing over mixed payloads."""

from __future__ import annotations

import numpy as np
import pytest

from kafkasparkstream_spark.operators import codecs, multimodal


def test_mp3_cbr_stream_metadata():
    p = codecs.mp3_frames_fixture(n_frames=8, bitrate_kbps=192, sample_rate=48000)
    assert codecs.sniff(p) == "mp3"
    m = codecs.mp3_probe(p)
    assert m["version"] == "1" and m["layer"] == 3
    assert m["sample_rate"] == 48000 and m["mode"] == "stereo"
    assert m["n_frames"] == 8 and m["n_samples"] == 8 * 1152
    assert m["duration_ms"] == 8 * 1152 * 1000 // 48000
    assert m["bitrate_kbps"] == 192 and not m["vbr"] and not m["id3v2"]


def test_mp3_vbr_id3_mono():
    p = codecs.mp3_frames_fixture(
        n_frames=3, bitrate_kbps=[64, 128, 320], mono=True, id3v2=True
    )
    m = codecs.mp3_probe(p)
    assert m["vbr"] and m["id3v2"] and m["mode"] == "mono"
    assert m["bitrate_kbps"] == 64  # first frame


def test_mp3_frame_length_table():
    """144 * bitrate // rate framing: byte-exact across bitrates."""
    for kbps in (32, 128, 320):
        p = codecs.mp3_frames_fixture(n_frames=2, bitrate_kbps=kbps)
        assert len(p) == 2 * (144 * kbps * 1000 // 44100)


def test_mp3_errors_loudly():
    p = codecs.mp3_frames_fixture(n_frames=2)
    with pytest.raises(ValueError):
        codecs.mp3_probe(p[:-10])  # truncated final frame
    with pytest.raises(ValueError):
        codecs.mp3_probe(b"\xff\xfb")  # truncated header
    with pytest.raises(ValueError):
        codecs.mp3_probe(bytes([0xFF, 0xFB, 0x0F, 0x00]) + b"\x00" * 400)  # rate reserved
    bad_sync = bytearray(p)
    bad_sync[0] = 0xFE
    with pytest.raises(ValueError):
        codecs.mp3_probe(bytes(bad_sync))
    # ID3 tag with nothing after it
    tag_only = codecs.mp3_frames_fixture(n_frames=1, id3v2=True)
    tag_len = 10 + 17
    with pytest.raises(ValueError):
        codecs.mp3_probe(tag_only[:tag_len])


def test_sniff_mp3_does_not_shadow_other_kinds():
    assert codecs.sniff(b"\xff\xd8\xff\xe0JFIF") == "jpeg"
    assert codecs.sniff(b"fLaC" + b"\x00" * 8) == "flac"
    assert codecs.sniff(b"not media at all") is None
    # 0xFF sync with reserved layer bits must NOT sniff as mp3
    assert codecs.sniff(bytes([0xFF, 0xE1, 0x90, 0x00])) is None


def test_media_probe_routes_mixed_payloads(spark):
    grad = np.tile(np.arange(0, 160, 10, dtype=np.uint8), (8, 1))
    png = codecs.png_encode(grad[:, :, None].repeat(3, axis=2))
    wav = codecs.wav_encode(np.arange(-50, 50, dtype=np.int16), rate=16000)
    mp3 = codecs.mp3_frames_fixture(n_frames=4, bitrate_kbps=128)
    rows = spark.createDataFrame(
        [
            (1, bytearray(png)),
            (2, bytearray(wav)),
            (3, bytearray(mp3)),
            (4, bytearray(b"garbage")),
        ],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r for r in multimodal.media_probe(rows).collect()}
    assert got[1]["kind"] == "png" and got[1]["detail"] == "16x8"
    assert got[1]["n_units"] == 16 * 8
    assert got[2]["kind"] == "wav" and got[2]["sample_rate"] == 16000
    assert got[2]["n_units"] == 100
    assert got[3]["kind"] == "mp3" and got[3]["n_units"] == 4 * 1152
    assert got[3]["detail"] == "v1L3:128kbps"
    assert got[4]["kind"] == "unknown"


def test_sniff_rejects_single_plausible_header_garbage():
    """r6 ADVICE: one plausible 4-byte header is not enough — sniff must
    walk to the first frame's end and find either exact end-of-payload or
    a second valid header there."""
    # FF FB 92 00 = MPEG-1 L3 128kbps 44.1kHz padded (frame_len 418); the
    # payload is 284 bytes of garbage, so neither condition holds.
    p = bytes([0xFF, 0xFB, 0x92, 0x00]) + b"garbage" * 40
    assert codecs.sniff(p) is None
    # real streams still sniff: exact single frame and multi-frame
    assert codecs.sniff(codecs.mp3_frames_fixture(n_frames=1)) == "mp3"
    assert codecs.sniff(codecs.mp3_frames_fixture(n_frames=2)) == "mp3"


def test_id3v24_footer_flag_skip():
    """r6 ADVICE: the ID3v2.4 footer flag (header byte 5 & 0x10) adds a
    10-byte '3DI' footer NOT counted in the syncsafe size; the skip must
    step over it or a valid stream reports 'lost frame sync'."""
    body = b"\x00" * 17
    sync = bytes([0, 0, 0, len(body)])
    tag = b"ID3\x04\x00\x10" + sync + body + b"3DI\x04\x00\x10" + sync
    frames = codecs.mp3_frames_fixture(n_frames=2)
    m = codecs.mp3_probe(tag + frames)
    assert m["id3v2"] and m["n_frames"] == 2
