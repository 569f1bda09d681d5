"""Measure the pure-stdlib codecs' decode throughput (VERDICT r8 #5).

The multimodal kernels decode PNG/GIF/JPEG/WAV/FLAC/MP4/H.264 with
pure-Python implementations of the public specs (operators/codecs.py,
operators/h264.py) — the honest trade for a no-external-deps container,
with a named production swap (libvips/Pillow-SIMD for images,
libsndfile/ffmpeg for audio/video). This probe turns that documented
trade into NUMBERS: per-codec decode MB/s (decoded-payload megabytes per
wall second, single core) over the same fixture generators the
registry's media queries use, so a 100 TB deployment can size the
decode stage — or justify the library swap — from a versioned artifact
(CODEC_THROUGHPUT.json) instead of a docstring.

Run: python scripts/codec_throughput.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _img(w: int, h: int, seed: int = 7) -> "np.ndarray":
    rng = np.random.default_rng(seed)
    # Smooth gradient + noise: representative entropy (pure noise is the
    # worst case for Huffman; flat color the best — this sits between).
    gy = np.linspace(0, 255, h)[:, None, None]
    gx = np.linspace(0, 255, w)[None, :, None]
    img = (gy + gx) / 2 + rng.integers(0, 32, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _bench(fn, payload, *, min_sec: float = 1.0) -> dict:
    """Repeat fn(payload) until min_sec wall, return per-call + MB/s."""
    n, t0 = 0, time.perf_counter()
    while True:
        fn(payload)
        n += 1
        el = time.perf_counter() - t0
        if el >= min_sec and n >= 3:
            break
    per_call = el / n
    return {
        "payload_bytes": len(payload),
        "calls": n,
        "sec_per_call": round(per_call, 4),
        "mb_per_sec": round(len(payload) / 1e6 / per_call, 3),
    }


def main() -> int:
    from kafkasparkstream_spark.operators import codecs
    from kafkasparkstream_spark.operators import h264 as h264_mod

    out: dict = {}

    img = _img(256, 256)
    png = codecs.png_encode(img)
    out["png"] = _bench(codecs.png_decode, png)

    frames = [_img(128, 128, seed=s) for s in range(4)]
    # GIF frames are (h, w) palette-index arrays (default 256-gray palette).
    gif = codecs.gif_encode_frames([f[:, :, 0] for f in frames])
    out["gif"] = _bench(codecs.gif_decode_frames, gif)

    jb = codecs.jpeg_encode(img, quality=75)
    out["jpeg_baseline"] = _bench(codecs.jpeg_decode, jb)
    jp = codecs.jpeg_encode_progressive(img, quality=75)
    out["jpeg_progressive"] = _bench(codecs.jpeg_decode, jp)

    rng = np.random.default_rng(3)
    samples = (np.sin(np.linspace(0, 440 * 2 * np.pi, 16000 * 4))
               * 12000 + rng.integers(-500, 500, 16000 * 4)).astype(np.int16)
    wav = codecs.wav_encode(samples, rate=16000)
    out["wav"] = _bench(lambda p: codecs.wav_decode(p), wav)

    flac = codecs.flac_encode(samples, rate=16000)
    out["flac"] = _bench(lambda p: codecs.flac_decode(p), flac)

    mp3 = codecs.mp3_frames_fixture(n_frames=200)
    out["mp3_probe"] = _bench(codecs.mp3_probe, mp3)

    mp4 = codecs.mp4_encode_mjpeg(frames)
    out["mp4_demux_decode"] = _bench(codecs.mp4_decode_frames, mp4)

    h264 = h264_mod.h264_encode_annexb(frames)
    out["h264"] = _bench(h264_mod.h264_decode_annexb, h264)

    for k, v in out.items():
        print(f"{k}: {v['mb_per_sec']} MB/s ({v['sec_per_call']}s/call, "
              f"{v['payload_bytes']} B payload)")

    doc = {
        "description": "Pure-Python codec DECODE throughput, single core, "
        "repo fixtures (see scripts/codec_throughput.py docstring). "
        "mb_per_sec = encoded payload MB / wall sec.",
        "host": "local[32] container, measurement is single-threaded",
        "codecs": out,
    }
    with open(os.path.join(HERE, "CODEC_THROUGHPUT.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote CODEC_THROUGHPUT.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
