"""Pure-stdlib media codecs: PNG (zlib), WAV (RIFF), GIF (LZW), JPEG (DCT).

The container ships no PIL/ffmpeg, but PNG is zlib-compressed filtered
scanlines, WAV is raw PCM behind a RIFF header, GIF is LZW, and baseline
JPEG is Huffman + 8×8 DCT — all decodable with the standard library plus
numpy. These codecs make the multimodal operators' decode path REAL for the
three dominant web-crawl image containers (PNG/GIF/JPEG), WAV audio, and
Motion-JPEG and avc1 MP4 video (real ISO-BMFF moov/stbl demux; baseline
I-frame H.264 decode via :mod:`operators.h264`; the fixture muxers below
produce conformant files), with the deterministic fakes in
:mod:`multimodal` remaining the fallback only for payloads that genuinely
need external libraries (HEVC video, arithmetic-coded JPEG).

Scope (honest partial codec, errors loudly outside it):

- PNG decode: 8-bit depth, color types 0/2/4/6 (gray, RGB, gray+alpha,
  RGBA), non-interlaced, all five scanline filters (None/Sub/Up/Average/
  Paeth). This covers everything the PNG *encoder* here emits plus the
  common output of real screenshot/thumbnail pipelines.
- PNG encode: filter-0 scanlines, one zlib IDAT; gray/RGB/RGBA by array
  shape.
- WAV decode/encode: PCM 8/16-bit via the stdlib ``wave`` module.
- GIF decode: 87a/89a multi-frame LZW (variable code width, table resets,
  KwKwK case), global/local color tables; interlace rejected,
  transparency/disposal ignored (frames return as standalone RGB). Plus a
  test-fixture encoder. This makes frame-sampling REAL for actual
  multi-frame media.
- JPEG decode: baseline sequential DCT (SOF0/SOF1) AND progressive
  (SOF2: spectral selection + successive approximation, DC/AC first and
  refinement passes, EOB runs, per-scan DHT redefinition), 8-bit,
  grayscale or YCbCr with max-dividing sampling factors (4:4:4 / 4:2:2 /
  4:2:0; non-dividing combos like Y 3x1 + Cb 2x1 are rejected loudly),
  restart markers, tables read from the file's own DQT/DHT. Arithmetic
  coding, 12-bit and CMYK are rejected loudly. Plus spec-compliant
  fixture encoders for BOTH modes (Annex-K quant tables with libjpeg
  quality scaling, per-image canonical Huffman, optional 4:2:0 and
  restart intervals; the progressive encoder emits all four scan types),
  cross-checked: progressive encode→decode is pixel-identical to the
  baseline path on the same image.

Performance shape: these run per-asset inside Arrow-batched ``mapInPandas``
kernels — the decompression and unfiltering are C-speed (zlib, numpy); only
the Sub/Average/Paeth unfilter walks pixels in Python along each row's
x-axis (prior-pixel data dependency, unavoidable without C). For
thumbnail-sized assets this is microseconds; for very large images swap in
PIL via the ``_HAS_PIL`` gate in :mod:`multimodal` — the operator plumbing
does not change.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> samples per pixel


def sniff(payload: bytes) -> str | None:
    """Media container by magic bytes: 'png', 'wav', 'flac', 'gif', 'jpeg',
    'mp4', 'h264' (Annex B elementary stream), 'mp3' (MPEG audio frame
    sync or ID3v2 tag), or None.

    mp3 contract (r6 ADVICE tightening): a bare frame-sync prefix is NOT
    enough — the payload must contain the complete first frame and then
    either end exactly at the frame boundary or present a second valid
    header there. A valid stream whose first frame is truncated (e.g. a
    partial chunk from a splitter) deliberately sniffs to None rather than
    'mp3'; callers streaming partial chunks must buffer at least one whole
    frame before classifying."""
    if payload[:8] == PNG_SIG:
        return "png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    # Annex B H.264 elementary stream: start code then a NAL header with
    # forbidden_zero_bit clear and a plausible type (SPS/PPS/IDR/AUD/SEI)
    for sc in (b"\x00\x00\x00\x01", b"\x00\x00\x01"):
        if payload[: len(sc)] == sc and len(payload) > len(sc):
            hdr = payload[len(sc)]
            if not hdr & 0x80 and (hdr & 0x1F) in (1, 5, 6, 7, 8, 9):
                return "h264"
    # MPEG audio: ID3v2-tagged, or a frame sync whose version/layer/bitrate/
    # rate fields are all non-reserved (checked after JPEG — a JPEG SOI also
    # starts 0xFF but its third byte 0xFF fails the bitrate==0xF check).
    if payload[:3] == b"ID3" and len(payload) >= 10:
        return "mp3"
    if (
        len(payload) >= 4
        and payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
        and (payload[1] >> 3) & 0x3 != 1      # version not reserved
        and (payload[1] >> 1) & 0x3 != 0      # layer not reserved
        and (payload[2] >> 4) & 0xF not in (0, 0xF)  # bitrate valid
        and (payload[2] >> 2) & 0x3 != 3      # sample rate not reserved
    ):
        # One plausible 4-byte header still matches ~1 in 10^4 arbitrary
        # payloads; confirm by walking to where the first frame ends and
        # requiring either exact end-of-payload or a second valid header
        # there (r6 ADVICE).
        try:
            flen, _ = _mp3_frame_header(payload, 0)
            if len(payload) == flen:
                return "mp3"
            _mp3_frame_header(payload, flen)
            return "mp3"
        except ValueError:
            return None
    return None


def png_decode(payload: bytes) -> np.ndarray:
    """Decode a PNG to a ``(height, width, channels)`` uint8 array.

    Raises ``ValueError`` on anything outside the supported scope (16-bit,
    palette, interlaced) rather than guessing.
    """
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            if comp or filt:
                raise ValueError("nonstandard PNG compression/filter method")
            meta = (w, h, _CHANNELS[color])
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + CRC
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, ch = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=row_start + 1)
        if ftype == 0:  # None
            recon = line.copy()
        elif ftype == 2:  # Up
            recon = line + prev  # uint8 wraps mod 256, as the spec requires
        else:  # Sub / Average / Paeth: prior-pixel dependency along x
            recon = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(recon[x - ch]) if x >= ch else 0  # left
                b = int(prev[x])  # up
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + b) >> 1
                elif ftype == 4:  # Paeth
                    c = int(prev[x - ch]) if x >= ch else 0  # upper-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
                recon[x] = (int(line[x]) + pred) & 0xFF
        out[y] = recon
        prev = recon
    return out.reshape(h, w, ch)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray, level: int = 6) -> bytes:
    """Encode a ``(h, w)`` or ``(h, w, channels)`` uint8 array as PNG
    (filter-0 scanlines; gray/gray+alpha/RGB/RGBA by channel count)."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8:
        raise ValueError("png_encode expects uint8 pixels")
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = img.reshape(h, w * ch)
    scan = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan, level))
        + _chunk(b"IEND", b"")
    )


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV to ``(samples int64 array of shape (frames, channels),
    sample_rate)``. 8-bit WAV is unsigned per the format; it is centered to
    signed (−128..127) here so energy/RMS math is zero-mean like 16-bit."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        nch, sampwidth, rate, nframes = (
            wf.getnchannels(),
            wf.getsampwidth(),
            wf.getframerate(),
            wf.getnframes(),
        )
        frames = wf.readframes(nframes)
    if sampwidth == 1:
        x = np.frombuffer(frames, dtype=np.uint8).astype(np.int64) - 128
    elif sampwidth == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.int64)
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth} (PCM 8/16-bit only)")
    return x.reshape(-1, nch), rate


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode ``(frames,)`` or ``(frames, channels)`` int16 samples as PCM WAV."""
    x = np.asarray(samples, dtype="<i2")
    if x.ndim == 1:
        x = x[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(x.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(x.tobytes())
    return buf.getvalue()


def _overlap_weights(n_src: int, n_dst: int) -> np.ndarray:
    """Integer box-overlap matrix ``(n_dst, n_src)``: entry [i, y] is the
    length of ``[i·n_src, (i+1)·n_src) ∩ [y·n_dst, (y+1)·n_dst)`` — i.e. how
    much of source pixel ``y`` output box ``i`` covers, scaled by ``n_dst``
    so everything stays integral. Each row sums to exactly ``n_src``."""
    i = np.arange(n_dst, dtype=np.int64)[:, None]
    y = np.arange(n_src, dtype=np.int64)[None, :]
    lo = np.maximum(i * n_src, y * n_dst)
    hi = np.minimum((i + 1) * n_src, (y + 1) * n_dst)
    return np.maximum(hi - lo, 0)


def box_resize(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Area-weighted (box-average) resize of a ``(h, w, ch)`` uint8 image.

    Output pixel (i, j) is the exact area-weighted mean of the source box
    it covers, computed as an INTEGER bilinear form (separable overlap
    weights, one division at the end) — deterministic across platforms,
    no float accumulation order. Ties at .5 round half-even (np.rint).
    """
    h, w, ch = img.shape
    wy = _overlap_weights(h, target_h)  # (th, h), rows sum to h
    wx = _overlap_weights(w, target_w)  # (tw, w), rows sum to w
    # (th, h) @ (h, w*ch) -> (th, w, ch); then contract w with (tw, w).
    t = wy @ img.reshape(h, w * ch).astype(np.int64)
    t = np.einsum("jw,iwc->ijc", wx, t.reshape(target_h, w, ch))
    return np.rint(t / (h * w)).astype(np.uint8)


# --------------------------------------------------------------------------
# GIF: LZW-compressed indexed frames (pure stdlib). Decode scope: 87a/89a,
# global/local color tables, multiple frames, transparency/disposal IGNORED
# (each frame is returned as its own indexed region rendered over black),
# interlaced frames rejected. Exactly what frame-sampling needs: the real
# frame COUNT and real per-frame pixels.
# --------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW: variable code width, CLEAR/EOI codes, MSB-last bit
    packing within little-endian bytes."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    # bit reader over the concatenated sub-block payload
    acc = bitn = pos = 0
    width = min_code_size + 1
    table = [bytes([i]) for i in range(1 << min_code_size)] + [b"", b""]
    prev = None

    def read_code():
        nonlocal acc, bitn, pos
        while bitn < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << bitn
            pos += 1
            bitn += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        bitn -= width
        return code

    while len(out) < n_pixels:
        code = read_code()
        if code is None or code == eoi:
            break
        if code == clear:
            table = table[: (1 << min_code_size) + 2]
            width = min_code_size + 1
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("GIF LZW stream ended early")
    return bytes(out[:n_pixels])


def _lzw_encode(pixels: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW encoder (for tests/fixtures and re-encode paths)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = bitn = 0
    width = min_code_size + 1

    def emit(code):
        nonlocal acc, bitn, width
        acc |= code << bitn
        bitn += width
        while bitn >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bitn -= 8

    table = {bytes([i]): i for i in range(1 << min_code_size)}
    next_code = eoi + 1
    emit(clear)
    prev = b""
    for b in pixels:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << width) + 1:
            if width < 12:
                width += 1
            else:
                emit(clear)
                table = {bytes([i]): i for i in range(1 << min_code_size)}
                next_code = eoi + 1
                width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev])
    emit(eoi)
    if bitn:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_decode_frames(payload: bytes) -> list[np.ndarray]:
    """Decode every frame of a GIF to ``(h, w, 3)`` uint8 RGB arrays
    (frame-local dimensions; disposal/composition ignored)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    pos = 6
    _w, _h, flags, _bg, _ar = struct.unpack("<HHBBB", payload[pos : pos + 7])
    pos += 7
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    frames = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            _x, _y, fw, fh, iflags = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
            pos += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF not supported")
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF frame without a color table")
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += ln + 1
            pos += 1
            idx = np.frombuffer(_lzw_decode(bytes(data), mcs, fw * fh), np.uint8)
            frames.append(ct[np.minimum(idx, len(ct) - 1)].reshape(fh, fw, 3))
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contains no frames")
    return frames


def gif_encode_frames(frames: list[np.ndarray], palette: np.ndarray | None = None) -> bytes:
    """Encode indexed frames as an animated GIF (test-fixture encoder).

    ``frames``: list of ``(h, w)`` uint8 PALETTE-INDEX arrays; ``palette``:
    ``(n, 3)`` uint8 RGB (default 256-gray). Frames may differ in size.
    """
    if palette is None:
        palette = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size = 1 << max(bits, 1)
    pal = np.zeros((size, 3), np.uint8)
    pal[:n] = palette
    w = max(f.shape[1] for f in frames)
    h = max(f.shape[0] for f in frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (max(bits, 1) - 1), 0, 0)
    out += pal.tobytes()
    mcs = max(2, bits)
    for f in frames:
        fh, fw = f.shape
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, fw, fh, 0)
        out.append(mcs)
        comp = _lzw_encode(f.astype(np.uint8).reshape(-1).tobytes(), mcs)
        for i in range(0, len(comp), 255):
            chunk = comp[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


# --------------------------------------------------------------------------
# JPEG — baseline sequential DCT (ITU-T T.81), pure stdlib + numpy.
# Decoder: SOF0/SOF1, 8-bit, 1 or 3 components, max-dividing sampling
# factors (4:4:4 / 4:2:2 / 4:2:0), restart markers, canonical Huffman from
# the file's own DHT segments. Progressive (SOF2), arithmetic coding,
# 12-bit and CMYK are rejected loudly (scope note in the module docstring).
# Encoder: spec-compliant baseline for test fixtures — 4:4:4 or 4:2:0,
# Annex-K quant tables with libjpeg quality scaling, per-image canonical
# Huffman tables (embedded in DHT, so any decoder reads them), optional
# restart intervals. Roundtrips are property-tested against the decoder.
# --------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """Block index (r*8+c) for each of the 64 zigzag scan positions."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(7, s) + 1)
        for r in (rng if s % 2 else reversed(rng)):
            out.append(r * 8 + (s - r))
    return np.array(out, dtype=np.int64)


_ZZ = _zigzag_order()

# Annex K.1/K.2 base quantization tables (zigzag-independent, row-major).
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_Q_CHROM = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32,
    dtype=np.int64,
)


def _dct_matrix() -> np.ndarray:
    u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    a = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    a[0, :] /= np.sqrt(2.0)
    return a


_DCT_A = _dct_matrix()


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (already
    de-stuffed: 0xFF00 collapsed to 0xFF, markers stripped).

    Absolute-bit-cursor design (r9 throughput pass, CODEC_THROUGHPUT.json:
    the bit-at-a-time loop was ~55% of jpeg_decode): ``receive`` extracts
    all ``nbits`` in one ``int.from_bytes`` window instead of a per-bit
    loop, and ``peek16`` exposes a zero-padded 16-bit lookahead for the
    LUT Huffman decoder. Error semantics are unchanged: any CONSUMED bit
    past the end raises "entropy data exhausted" (padding is only ever
    peeked, never consumed)."""

    def __init__(self, data: bytes):
        self.data = data
        self.nbits = len(data) * 8
        self.bitpos = 0

    def read_bit(self) -> int:
        p = self.bitpos
        if p >= self.nbits:
            raise ValueError("jpeg: entropy data exhausted")
        self.bitpos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def receive(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        p = self.bitpos
        end = p + nbits
        if end > self.nbits:
            raise ValueError("jpeg: entropy data exhausted")
        b1 = (end + 7) >> 3
        chunk = int.from_bytes(self.data[p >> 3 : b1], "big")
        self.bitpos = end
        return (chunk >> ((b1 << 3) - end)) & ((1 << nbits) - 1)

    def peek16(self) -> int:
        """Next 16 bits, zero-padded past the end (lookahead only — the
        caller bounds-checks before consuming)."""
        p = self.bitpos
        b0 = p >> 3
        v = int.from_bytes(self.data[b0 : b0 + 3].ljust(3, b"\x00"), "big")
        return (v >> (8 - (p & 7))) & 0xFFFF


def _extend(v: int, nbits: int) -> int:
    """T.81 F.2.2.1: map the received magnitude bits to a signed value."""
    if nbits == 0:
        return 0
    return v if v >= (1 << (nbits - 1)) else v - (1 << nbits) + 1


class _HuffTable:
    """Canonical Huffman table: the (length, code) -> symbol dict plus a
    65,536-entry 16-bit-prefix LUT (``lut[prefix] = (length << 8) | sym``,
    0 = no code of length <= 16 is a prefix). The LUT turns the decode
    into one peek + one array index; build cost is a handful of
    vectorized slice fills per DHT segment."""

    __slots__ = ("codes", "lut")

    def __init__(self, codes: dict[tuple[int, int], int]):
        self.codes = codes
        lut = np.zeros(1 << 16, dtype=np.int32)
        for (ln, code), sym in codes.items():
            lo = code << (16 - ln)
            lut[lo : lo + (1 << (16 - ln))] = (ln << 8) | sym
        self.lut = lut


def _huff_table(bits: list[int], vals: bytes) -> _HuffTable:
    """Canonical (length, code) -> symbol table from a DHT BITS/HUFFVAL
    spec, wrapped with its prefix LUT."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return _HuffTable(table)


def _huff_decode(reader: _BitReader, table: _HuffTable) -> int:
    entry = int(table.lut[reader.peek16()])
    ln = entry >> 8
    if ln:
        end = reader.bitpos + ln
        if end > reader.nbits:
            # The match needed padding bits — the bit-serial decoder would
            # have run out of data mid-code.
            raise ValueError("jpeg: entropy data exhausted")
        reader.bitpos = end
        return entry & 0xFF
    if reader.bitpos + 16 <= reader.nbits:
        raise ValueError("jpeg: invalid Huffman code")
    raise ValueError("jpeg: entropy data exhausted")


def jpeg_decode(payload: bytes) -> np.ndarray:
    """JPEG → ``(h, w, 3) uint8`` RGB (or ``(h, w, 1)`` gray): baseline
    sequential (SOF0/SOF1, one scan) and progressive (SOF2, multi-scan
    spectral selection + successive approximation, DC/AC first and
    refinement passes, per-scan DHT redefinition, restart markers)."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    scan = None
    scans: list[dict] = []  # progressive: every scan, in file order
    while i < len(payload):
        if payload[i] != 0xFF:
            raise ValueError("jpeg: marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker —
        # skip them so "FF FF DB" parses as DQT, not as marker 0xFF.
        while i < len(payload) and payload[i] == 0xFF:
            i += 1
        if i >= len(payload):
            raise ValueError("jpeg: truncated at marker")
        marker = payload[i]
        i += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if i + 2 > len(payload):
            raise ValueError("jpeg: truncated in segment length field")
        seg_len = struct.unpack(">H", payload[i : i + 2])[0]
        if seg_len < 2 or i + seg_len > len(payload):
            raise ValueError("jpeg: truncated or malformed segment")
        seg = payload[i + 2 : i + seg_len]
        i += seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise ValueError("jpeg: only 8-bit quant tables (baseline)")
                zz = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int64)
                t = np.zeros(64, dtype=np.int64)
                t[_ZZ] = zz
                qt[tq] = t
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_table(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if len(seg) < 6 or len(seg) < 6 + 3 * seg[5]:
                raise ValueError("jpeg: truncated SOF segment")
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision")
            if nc not in (1, 3):
                raise ValueError("jpeg: only gray/YCbCr (1 or 3 components)")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"jpeg: unsupported SOF marker 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("jpeg: truncated DRI segment")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            progressive = frame is not None and frame.get("progressive")
            need = 4 + 2 * seg[0] if (seg and progressive) else 1 + 2 * (seg[0] if seg else 0)
            if not seg or len(seg) < need:
                raise ValueError("jpeg: truncated SOS segment")
            ns = seg[0]
            tables = {}
            order = []
            for c in range(ns):
                cs, td_ta = seg[1 + 2 * c], seg[2 + 2 * c]
                tables[cs] = (td_ta >> 4, td_ta & 15)
                order.append(cs)
            # Entropy-coded data: de-stuff, split at restart markers.
            segs, cur = [], bytearray()
            while i < len(payload):
                b = payload[i]
                if b != 0xFF:
                    cur.append(b)
                    i += 1
                    continue
                if i + 1 >= len(payload):
                    raise ValueError("jpeg: truncated in entropy-coded data")
                nxt = payload[i + 1]
                if nxt == 0x00:
                    cur.append(0xFF)
                    i += 2
                elif nxt == 0xFF:
                    i += 1  # T.81 fill byte before an in-scan marker
                elif 0xD0 <= nxt <= 0xD7:
                    segs.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                else:
                    break  # next real marker (EOI or other)
            segs.append(bytes(cur))
            if progressive:
                ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
                scans.append(
                    {
                        "tables": tables,
                        "order": order,
                        "segs": segs,
                        "ss": ss,
                        "se": se,
                        "ah": ahal >> 4,
                        "al": ahal & 15,
                        "dri": restart_interval,
                        # DHT may be redefined between scans: snapshot refs
                        "dc": dict(huff_dc),
                        "ac": dict(huff_ac),
                    }
                )
                continue  # progressive: keep walking to the next scan
            scan = {"tables": tables, "segs": segs}
            break  # single-scan baseline: decode after the loop
        # APPn/COM/others: skipped via seg_len
    if frame is not None and frame.get("progressive"):
        if not scans:
            raise ValueError("jpeg: missing SOF/SOS")
        _sampling_check(frame["comps"])
        return _jpeg_decode_progressive(frame, qt, scans)
    if frame is None or scan is None:
        raise ValueError("jpeg: missing SOF/SOS")

    comps = frame["comps"]
    hmax, vmax = _sampling_check(comps)
    if set(scan["tables"]) != {c["id"] for c in comps}:
        # Single-scan baseline only: an SOS covering a component subset is
        # a multi-scan file; decoding it as one scan would KeyError later.
        raise ValueError("jpeg: multi-scan (partial SOS coverage) not supported")
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    seg_idx = 0
    reader = _BitReader(scan["segs"][0])
    n_mcu = 0
    # Entropy-decode into flat coefficient lists first, then dequantize +
    # IDCT every component's blocks in ONE einsum (r9 throughput pass:
    # per-block numpy — zeros/mul/reshape/two 8x8 matmuls — was ~35% of
    # decode wall; the batched transform is bit-identical, same float64
    # matmul per block, just n-at-a-time).
    coefs: dict[int, list] = {c["id"]: [] for c in comps}
    pos: dict[int, list] = {c["id"]: [] for c in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(scan["segs"]):
                    raise ValueError(
                        "jpeg: DRI declares more restart segments than present"
                    )
                reader = _BitReader(scan["segs"][seg_idx])
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                td, ta = scan["tables"][c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = [0] * 64
                        t = _huff_decode(reader, huff_dc[td])
                        pred[c["id"]] += _extend(reader.receive(t), t)
                        coef[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, huff_ac[ta])
                            if rs == 0:
                                break  # EOB
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            s = rs & 15
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            coef[_ZZ[k]] = _extend(reader.receive(s), s)
                            k += 1
                        coefs[c["id"]].append(coef)
                        pos[c["id"]].append(
                            ((my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8)
                        )
            n_mcu += 1

    for c in comps:
        cid = c["id"]
        if not coefs[cid]:
            continue
        q = qt[c["tq"]].astype(np.float64)
        blocks = (np.array(coefs[cid], dtype=np.int64) * q).reshape(-1, 8, 8)
        # Same two pairwise matmuls as the old per-block path (matmul
        # broadcasts over the leading axis), so the float contraction
        # order per block is unchanged.
        px = _DCT_A.T @ blocks.astype(np.float64) @ _DCT_A + 128.0
        plane = planes[cid]
        for i, (y0, x0) in enumerate(pos[cid]):
            plane[y0 : y0 + 8, x0 : x0 + 8] = px[i]

    return _planes_to_image(frame, planes)


def _sampling_check(comps) -> tuple[int, int]:
    """Validate max-dividing sampling factors; return (hmax, vmax)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if c["h"] < 1 or c["v"] < 1 or hmax % c["h"] or vmax % c["v"]:
            # Upsampling is integer np.repeat; non-dividing factor combos
            # (legal per T.81, e.g. Y 3x1 with Cb 2x1) would build a
            # mis-sized plane — reject loudly instead of a numpy shape error.
            raise ValueError("jpeg: non-integer-ratio sampling not supported")
    return hmax, vmax


def _planes_to_image(frame: dict, planes: dict) -> np.ndarray:
    """Upsample chroma to full resolution, crop the MCU padding, and apply
    the YCbCr→RGB transform (grayscale passes through)."""
    comps = frame["comps"]
    hmax, vmax = _sampling_check(comps)
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[: frame["h"], : frame["w"]])
    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return g[:, :, None]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)



def _jpeg_decode_progressive(frame: dict, qt: dict, scans: list[dict]) -> np.ndarray:
    """Progressive (SOF2) reconstruction: accumulate DCT coefficients
    across spectral-selection / successive-approximation scans (T.81
    Annex G), then dequantize + IDCT every block at once."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax, vmax = _sampling_check(comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    info: dict[int, dict] = {}
    for c in comps:
        # Interleaved scans pad to whole MCUs; non-interleaved scans use
        # the component's own sample grid (T.81 A.2.2).
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        info[c["id"]] = {
            "c": c,
            "nbw": -(-cw // 8),
            "nbh": -(-ch // 8),
            "coef": np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64),
        }
    for scan in scans:
        _apply_progressive_scan(scan, frame, info, mcux, mcuy)
    planes = {}
    for cid, st in info.items():
        q = qt[st["c"]["tq"]]
        bh, bw = st["coef"].shape[:2]
        blocks = (st["coef"].reshape(-1, 64) * q).astype(np.float64).reshape(-1, 8, 8)
        px = np.matmul(np.matmul(_DCT_A.T, blocks), _DCT_A) + 128.0
        planes[cid] = (
            px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
    return _planes_to_image(frame, planes)


def _apply_progressive_scan(scan, frame, info, mcux, mcuy) -> None:
    comp_ids = {c["id"] for c in frame["comps"]}
    for cid in scan["order"]:
        if cid not in comp_ids:
            raise ValueError("jpeg: SOS names an unknown component")
    if scan["ss"] == 0:
        if scan["se"] != 0:
            raise ValueError("jpeg: progressive DC scan must have Se=0")
        _dc_scan(scan, info, mcux, mcuy)
    else:
        if len(scan["order"]) != 1:
            raise ValueError("jpeg: progressive AC scan must cover one component")
        _ac_scan(scan, info[scan["order"][0]])


def _next_seg(scan, seg_idx: int) -> "_BitReader":
    if seg_idx >= len(scan["segs"]):
        raise ValueError("jpeg: DRI declares more restart segments than present")
    return _BitReader(scan["segs"][seg_idx])


def _dc_scan(scan, info, mcux, mcuy) -> None:
    """DC pass — first (Ah=0: Huffman diffs, value << Al) or refinement
    (one appended bit per block). Interleaved scans walk MCU order;
    single-component scans walk the component's own block raster."""
    al, first = scan["al"], scan["ah"] == 0
    order = scan["order"]
    dri = scan["dri"]
    seg_idx, n_unit = 0, 0
    reader = _next_seg(scan, 0)
    pred = {cid: 0 for cid in order}

    # restart units: blocks for a single-component scan, MCUs otherwise
    if len(order) == 1:
        st = info[order[0]]
        units = [
            [(order[0], ry, rx)]
            for ry in range(st["nbh"])
            for rx in range(st["nbw"])
        ]
    else:
        units = []
        for my in range(mcuy):
            for mx in range(mcux):
                mcu = []
                for cid in order:
                    c = info[cid]["c"]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            mcu.append((cid, my * c["v"] + by, mx * c["h"] + bx))
                units.append(mcu)

    for unit in units:
        if dri and n_unit and n_unit % dri == 0:
            seg_idx += 1
            reader = _next_seg(scan, seg_idx)
            pred = {cid: 0 for cid in order}
        for cid, ry, rx in unit:
            coef = info[cid]["coef"][ry, rx]
            if first:
                td = scan["tables"][cid][0]
                t = _huff_decode(reader, scan["dc"][td])
                pred[cid] += _extend(reader.receive(t), t)
                coef[0] = pred[cid] << al
            elif reader.read_bit():
                coef[0] |= 1 << al
        n_unit += 1


def _ac_scan(scan, st) -> None:
    ss, se, al, first = scan["ss"], scan["se"], scan["al"], scan["ah"] == 0
    cid = scan["order"][0]
    table = scan["ac"][scan["tables"][cid][1]]
    dri = scan["dri"]
    seg_idx, n_blk = 0, 0
    reader = _next_seg(scan, 0)
    eobrun = [0]
    for ry in range(st["nbh"]):
        for rx in range(st["nbw"]):
            if dri and n_blk and n_blk % dri == 0:
                seg_idx += 1
                reader = _next_seg(scan, seg_idx)
                eobrun[0] = 0
            coef = st["coef"][ry, rx]
            if first:
                _ac_first_block(reader, table, coef, ss, se, al, eobrun)
            else:
                _ac_refine_block(reader, table, coef, ss, se, al, eobrun)
            n_blk += 1


def _ac_first_block(reader, table, coef, ss, se, al, eobrun) -> None:
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(reader, table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun[0] = (1 << r) - 1  # EOBn: this block ends the run's first
            if r:
                eobrun[0] += reader.receive(r)
            return
        k += r
        if k > se:
            raise ValueError("jpeg: AC index overflow")
        coef[_ZZ[k]] = _extend(reader.receive(s), s) << al
        k += 1


def _ac_refine_block(reader, table, coef, ss, se, al, eobrun) -> None:
    """AC successive-approximation refinement (T.81 G.1.2.3 / the
    libjpeg-documented algorithm): newly-significant coefficients arrive as
    run/1 symbols; every already-nonzero coefficient passed over emits one
    correction bit; EOB runs append correction bits to the block tails."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = _huff_decode(reader, table)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:  # EOBn: run of blocks ending here
                    eobrun[0] = 1 << r
                    if r:
                        eobrun[0] += reader.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("jpeg: bad AC-refine symbol")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                z = _ZZ[k]
                if coef[z] != 0:
                    if reader.read_bit() and not (coef[z] & p1):
                        coef[z] += p1 if coef[z] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[_ZZ[k]] = val
            k += 1
    if eobrun[0] > 0:
        while k <= se:
            z = _ZZ[k]
            if coef[z] != 0:
                if reader.read_bit() and not (coef[z] & p1):
                    coef[z] += p1 if coef[z] >= 0 else m1
            k += 1
        eobrun[0] -= 1


class _BitWriter:
    """MSB-first bit writer with 0xFF00 byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)
                self.buf = 0
                self.n = 0

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        while self.n:
            self.write(1, 1)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def q(base):
        return np.clip((base * scale + 50) // 100, 1, 255)
    return q(_Q_LUM), q(_Q_CHROM)


def _fixed_len_huff(symbols: set[int]) -> tuple[list[int], bytes]:
    """Canonical table giving every used symbol the same code length L,
    with 2^L - 1 >= |symbols| (the all-ones code stays unused, as T.81
    requires). Embedded in DHT, so any conformant decoder reads it."""
    syms = sorted(symbols) or [0]
    ln = 1
    while (1 << ln) - 1 < len(syms):
        ln += 1
    bits = [0] * 16
    bits[ln - 1] = len(syms)
    return bits, bytes(syms)


def _encode_codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for the canonical table."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _block_symbols(blocks: list[np.ndarray], preds: list[int]) -> tuple[list, set, set]:
    """Zigzag/RLE a component's quantized blocks into (dc_sym, dc_bits,
    [(ac_sym, ac_bits)]) tuples, collecting the used symbol sets."""
    toks, dc_syms, ac_syms = [], set(), set()
    pred = preds[0]
    for blk in blocks:
        zz = blk.reshape(64)[_ZZ]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        s = int(diff).bit_length() if diff != 0 else 0
        dc_syms.add(s)
        dc_tok = (s, diff if diff >= 0 else diff + (1 << s) - 1)
        acs = []
        run = 0
        last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                if k > last_nz:
                    acs.append((0x00, 0, 0))  # EOB
                    ac_syms.add(0x00)
                    break
                run += 1
                if run == 16:
                    acs.append((0xF0, 0, 0))  # ZRL
                    ac_syms.add(0xF0)
                    run = 0
                continue
            s = abs(v).bit_length()
            sym = (run << 4) | s
            ac_syms.add(sym)
            acs.append((sym, s, v if v >= 0 else v + (1 << s) - 1))
            run = 0
        toks.append((dc_tok, acs))
    preds[0] = pred
    return toks, dc_syms, ac_syms


def _prepare_blocks(img: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front-end: color transform, optional 4:2:0 downsample,
    MCU padding, forward DCT and quantization. Returns
    ``(gray, samp, q_lum, q_chrom, comp_block_lists, mcux, mcuy, h, w)``
    with blocks in MCU-interleaved order per component."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if not 1 <= quality <= 100:
        # _quality_tables divides by quality (<50 branch) and a >100 value
        # silently degenerates to all-1 tables — reject instead.
        raise ValueError("jpeg: quality must be in 1..100")
    q_lum, q_chrom = _quality_tables(quality)
    gray = ch == 1
    if gray:
        comps_px = [img[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        qts = [q_lum]
    else:
        f = img.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            def down2(p):
                if p.shape[0] % 2:
                    p = np.concatenate([p, p[-1:]], axis=0)
                if p.shape[1] % 2:
                    p = np.concatenate([p, p[:, -1:]], axis=1)
                return (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]) / 4.0
            comps_px = [y, down2(cb), down2(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            comps_px = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qts = [q_lum, q_chrom, q_chrom]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # Quantize every block, MCU-interleaved order per component.
    comp_block_lists: list[list[np.ndarray]] = [[] for _ in comps_px]
    for ci, (px, (sh, sv), q) in enumerate(zip(comps_px, samp, qts)):
        ph, pw = mcuy * 8 * sv, mcux * 8 * sh
        pad = np.pad(px, ((0, ph - px.shape[0]), (0, pw - px.shape[1])), mode="edge")
        qm = q.reshape(8, 8).astype(np.float64)
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(sv):
                    for bx in range(sh):
                        y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                        blk = pad[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = _DCT_A @ blk @ _DCT_A.T
                        comp_block_lists[ci].append(
                            np.round(coef / qm).astype(np.int64)
                        )
    return gray, samp, q_lum, q_chrom, comp_block_lists, mcux, mcuy, h, w


def jpeg_encode(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encoder (test-fixture grade, spec-compliant output):
    ``(h, w, 3)`` RGB → YCbCr 4:4:4 (or 4:2:0 with ``subsample=True``),
    ``(h, w)``/``(h, w, 1)`` → grayscale. ``restart_interval`` emits DRI +
    RSTn markers every N MCUs (exercises the decoder's restart path)."""
    gray, samp, q_lum, q_chrom, comp_block_lists, mcux, mcuy, h, w = _prepare_blocks(
        img, quality, subsample
    )

    # Tokenize (two-pass: symbols first, then bits with the built tables).
    n_tables = 1 if gray else 2
    toks_per_comp, dc_sets, ac_sets = [], [set() for _ in range(n_tables)], [
        set() for _ in range(n_tables)
    ]
    # Restart intervals reset DC prediction; tokenize per restart segment.
    blocks_per_mcu = [sh * sv for sh, sv in samp]
    for ci, blocks in enumerate(comp_block_lists):
        tclass = 0 if ci == 0 else 1
        toks = []
        nper = blocks_per_mcu[ci]
        ri = restart_interval or (mcux * mcuy)
        for seg0 in range(0, mcux * mcuy, ri):
            seg_blocks = blocks[seg0 * nper : (seg0 + ri) * nper]
            pred = [0]
            t, ds, as_ = _block_symbols(seg_blocks, pred)
            toks.extend(t)
            dc_sets[tclass] |= ds
            ac_sets[tclass] |= as_
        toks_per_comp.append(toks)

    dc_tables = [_fixed_len_huff(s) for s in dc_sets]
    ac_tables = [_fixed_len_huff(s) for s in ac_sets]
    dc_codes = [_encode_codes(*t) for t in dc_tables]
    ac_codes = [_encode_codes(*t) for t in ac_tables]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate([q_lum] if gray else [q_lum, q_chrom]):
        zz = q[_ZZ].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        tq = 0 if ci == 0 else 1
        sof += bytes([ci + 1, (sh << 4) | sv, tq])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for tc, tables in ((0, dc_tables), (1, ac_tables)):
        for th, (bits, vals) in enumerate(tables):
            body = bytes([(tc << 4) | th]) + bytes(bits) + vals
            out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for ci in range(nc):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    wtr = _BitWriter()
    n_mcu_total = mcux * mcuy
    rst = 0
    for m in range(n_mcu_total):
        if restart_interval and m and m % restart_interval == 0:
            wtr.flush()
            out += bytes(wtr.out)
            wtr = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
        for ci in range(nc):
            tclass = 0 if ci == 0 else 1
            nper = blocks_per_mcu[ci]
            for bi in range(nper):
                (s, dbits), acs = toks_per_comp[ci][m * nper + bi]
                code, ln = dc_codes[tclass][s]
                wtr.write(code, ln)
                if s:
                    wtr.write(dbits, s)
                for sym, sbits, vbits in acs:
                    code, ln = ac_codes[tclass][sym]
                    wtr.write(code, ln)
                    if sbits:
                        wtr.write(vbits, sbits)
    wtr.flush()
    out += bytes(wtr.out)
    out += b"\xff\xd9"
    return bytes(out)




# ---- Progressive (SOF2) encoder — fixture-grade, spec-compliant ----------


def _mag_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude category + appended-bits encoding of a value."""
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


class _ScanEmitter:
    """Two-pass scan encoding: pass 1 (no writer) collects the Huffman
    symbol set; pass 2 writes codes + raw bits with the built table."""

    def __init__(self, writer: "_BitWriter | None" = None, codes: dict | None = None):
        self.syms: set[int] = set()
        self.writer = writer
        self.codes = codes

    def sym(self, s: int) -> None:
        if self.writer is None:
            self.syms.add(s)
        else:
            code, ln = self.codes[s]
            self.writer.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        if n and self.writer is not None:
            self.writer.write(v, n)


def _enc_dc_first(units, al: int, emit: _ScanEmitter) -> None:
    """DC first pass: Huffman-coded diffs of the point-transformed DC
    (arithmetic shift, T.81 G.1.2.1), prediction per component."""
    pred: dict[int, int] = {}
    for unit in units:
        for cid, coef in unit:
            v = int(coef[0]) >> al
            diff = v - pred.get(cid, 0)
            pred[cid] = v
            s, dbits = _mag_bits(diff)
            emit.sym(s)
            emit.bits(dbits, s)


def _enc_dc_refine(units, al: int, wtr: "_BitWriter") -> None:
    """DC refinement: one raw bit per block, no Huffman coding."""
    for unit in units:
        for _cid, coef in unit:
            wtr.write((int(coef[0]) >> al) & 1, 1)


def _enc_ac_first(blocks, ss: int, se: int, al: int, emit: _ScanEmitter) -> None:
    """AC first pass over one component (magnitude point transform,
    truncation toward zero) with cross-block EOB runs and ZRL folding."""
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            emit.sym(r << 4)
            emit.bits(eobrun - (1 << r), r)
            eobrun = 0

    for coef in blocks:
        vals = []
        for k in range(ss, se + 1):
            v = int(coef[_ZZ[k]])
            m = (v if v >= 0 else -v) >> al
            vals.append(m if v >= 0 else -m)
        last = -1
        for i, v in enumerate(vals):
            if v:
                last = i
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        r = 0
        for i in range(last + 1):
            v = vals[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                emit.sym(0xF0)
                r -= 16
            s, vbits = _mag_bits(v)
            emit.sym((r << 4) | s)
            emit.bits(vbits, s)
            r = 0
        if last < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine(blocks, ss: int, se: int, al: int, emit: _ScanEmitter) -> None:
    """AC refinement pass over one component (T.81 G.1.2.3, the
    libjpeg-documented buffering scheme): newly-significant coefficients
    as run/1 symbols + sign bit; correction bits for already-significant
    coefficients buffered and emitted after the covering symbol; leftover
    runs fold into cross-block EOB runs that carry their buffered bits."""
    eobrun = 0
    bfifo: list[int] = []  # correction bits buffered behind the EOB run

    def flush_eob() -> None:
        nonlocal eobrun, bfifo
        if eobrun:
            r = eobrun.bit_length() - 1
            emit.sym(r << 4)
            emit.bits(eobrun - (1 << r), r)
            eobrun = 0
        for b in bfifo:
            emit.bits(b, 1)
        bfifo = []

    for coef in blocks:
        raw = [int(coef[_ZZ[k]]) for k in range(ss, se + 1)]
        absv = [(v if v >= 0 else -v) >> al for v in raw]
        eobpos = -1
        for i, t in enumerate(absv):
            if t == 1:  # newly significant at this precision
                eobpos = i
        r = 0
        pending: list[int] = []
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            # ZRLs not foldable into the EOB run must flush now (this
            # runs for BOTH correction-bit and newly-significant hits,
            # so buffered bits stay attributed to the right symbol)
            while r > 15 and i <= eobpos:
                flush_eob()
                emit.sym(0xF0)
                for b in pending:
                    emit.bits(b, 1)
                pending = []
                r -= 16
            if t > 1:  # already significant: buffer its correction bit
                pending.append(t & 1)
                continue
            flush_eob()
            emit.sym((r << 4) | 1)
            emit.bits(1 if raw[i] >= 0 else 0, 1)
            for b in pending:
                emit.bits(b, 1)
            pending = []
            r = 0
        if r > 0 or pending:
            eobrun += 1
            bfifo.extend(pending)
            if eobrun == 0x7FFF or len(bfifo) > 900:
                flush_eob()
    flush_eob()


def jpeg_encode_progressive(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    successive: bool = True,
    restart_interval: int = 0,
) -> bytes:
    """Progressive JPEG encoder (SOF2, test-fixture grade): a DC scan for
    all components then one AC scan per component (spectral selection);
    with ``successive=True`` each of those splits into a first pass at
    Al=1 plus a refinement pass (Ah=1, Al=0), exercising all four
    progressive scan types. Every scan carries its own fixed-length DHT
    (table id 0), exercising per-scan table redefinition.
    ``restart_interval`` emits DRI and splits EVERY scan's entropy data
    into RSTn-delimited segments (per T.81 the unit is MCUs for the
    interleaved DC scans, blocks for single-component scans; predictors
    and EOB runs reset per segment). Same pixel front-end as
    :func:`jpeg_encode`, so progressive decode of this output must equal
    the baseline encode→decode of the same image."""
    gray, samp, q_lum, q_chrom, comp_block_lists, mcux, mcuy, h, w = _prepare_blocks(
        img, quality, subsample
    )
    nc = 1 if gray else 3
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    # Interleaved MCU units for DC scans (cid = component index + 1).
    blocks_per_mcu = [sh * sv for sh, sv in samp]
    units = []
    for m in range(mcux * mcuy):
        unit = []
        for ci in range(nc):
            nper = blocks_per_mcu[ci]
            for bi in range(nper):
                unit.append((ci + 1, comp_block_lists[ci][m * nper + bi].ravel()))
        units.append(unit)
    # Non-interleaved raster block lists per component (T.81 A.2.2 grid).
    raster: list[list[np.ndarray]] = []
    for ci in range(nc):
        sh, sv = samp[ci]
        cw = -(-w * sh // hmax)
        chh = -(-h * sv // vmax)
        nbw, nbh = -(-cw // 8), -(-chh // 8)
        lst = []
        for ry in range(nbh):
            for rx in range(nbw):
                idx = ((ry // sv) * mcux + rx // sh) * sv * sh + (ry % sv) * sh + (rx % sh)
                lst.append(comp_block_lists[ci][idx].ravel())
        raster.append(lst)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate([q_lum] if gray else [q_lum, q_chrom]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + q[_ZZ].astype(np.uint8).tobytes()
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def chunked(seq):
        if not restart_interval:
            return [seq]
        return [
            seq[i : i + restart_interval]
            for i in range(0, len(seq), restart_interval)
        ]

    def emit_segments(chunks, write_chunk):
        # scan encoders carry no cross-call state, so per-segment resets
        # (DC predictors, EOB runs, correction-bit buffers) hold by
        # construction — exactly the decoder's per-RSTn contract
        for k, ch in enumerate(chunks):
            wtr = _BitWriter()
            write_chunk(ch, wtr)
            wtr.flush()
            out.extend(bytes(wtr.out))
            if k < len(chunks) - 1:
                out.extend(bytes([0xFF, 0xD0 + (k % 8)]))

    def add_huffman_scan(tclass, scan_fn, comp_ids, ss, se, ah, al, seq):
        chunks = chunked(seq)
        collect = _ScanEmitter()
        for ch in chunks:
            scan_fn(ch, collect)
        bits, vals = _fixed_len_huff(collect.syms)
        body = bytes([(tclass << 4) | 0]) + bytes(bits) + vals
        out.extend(b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body)
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])  # Td=0, Ta=0 (per-scan table id 0)
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos)
        codes = _encode_codes(bits, vals)
        emit_segments(chunks, lambda ch, wtr: scan_fn(ch, _ScanEmitter(wtr, codes)))

    all_ids = list(range(1, nc + 1))
    dc_al = 1 if successive else 0
    add_huffman_scan(
        0, lambda ch, e: _enc_dc_first(ch, dc_al, e), all_ids, 0, 0, 0, dc_al, units
    )
    if successive:
        # DC refinement: raw bits, no Huffman table needed
        sos = bytes([nc]) + b"".join(bytes([cid, 0x00]) for cid in all_ids) + bytes([0, 0, (1 << 4) | 0])
        out.extend(b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos)
        emit_segments(chunked(units), lambda ch, wtr: _enc_dc_refine(ch, 0, wtr))
    ac_al = 1 if successive else 0
    for ci in range(nc):
        add_huffman_scan(
            1,
            lambda ch, e: _enc_ac_first(ch, 1, 63, ac_al, e),
            [ci + 1], 1, 63, 0, ac_al, raster[ci],
        )
    if successive:
        for ci in range(nc):
            add_huffman_scan(
                1,
                lambda ch, e: _enc_ac_refine(ch, 1, 63, 0, e),
                [ci + 1], 1, 63, 1, 0, raster[ci],
            )
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# MP4 — ISO base media file format (ISO/IEC 14496-12): real moov/stbl demux
# plus a fixture-grade MJPEG muxer. The demuxer walks ftyp/moov/trak/mdia/
# minf/stbl, reads the sample tables (stsd codec + dimensions, stts timing,
# stsc sample→chunk runs, stsz sizes, stco/co64 chunk offsets) and returns
# exact per-sample byte ranges out of mdat — the container layer a frame-
# sampling stage actually needs. Codec scope: Motion-JPEG ('jpeg' sample
# entries), every sample a complete baseline JPEG that jpeg_decode handles;
# other codecs (hev1...) probe fine but demux-decode is out of scope
# and rejected loudly, falling back to the digest path in the kernels.
# Mirrors the reference's opaque-payload treatment of media columns
# (spark-processor/processor.py treats values as bytes end-to-end).
# --------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full_box(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


def _walk_boxes(raw: bytes, start: int, end: int):
    """Yield ``(fourcc, payload_start, payload_end)`` for each box in
    ``raw[start:end]``; ValueError on truncation / malformed sizes."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("mp4: truncated box header")
        (size,) = struct.unpack(">I", raw[pos : pos + 4])
        btype = raw[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            (size,) = struct.unpack(">Q", raw[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("mp4: malformed box size")
        yield btype, pos + hdr, pos + size
        pos += size


def _find_box(raw: bytes, path: list[bytes], start: int, end: int) -> tuple[int, int]:
    """(payload_start, payload_end) of the first box at a nested path."""
    for btype, ps, pe in _walk_boxes(raw, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return ps, pe
            return _find_box(raw, path[1:], ps, pe)
    raise ValueError(f"mp4: missing {b'/'.join(path).decode('latin1')} box")


def _video_mdia(raw: bytes) -> tuple[int, int]:
    """(payload_start, payload_end) of the first VIDEO track's mdia."""
    moov_s, moov_e = _find_box(raw, [b"moov"], 0, len(raw))
    for btype, ps, pe in _walk_boxes(raw, moov_s, moov_e):
        if btype != b"trak":
            continue
        try:
            mdia_s, mdia_e = _find_box(raw, [b"mdia"], ps, pe)
            hdlr_s, _ = _find_box(raw, [b"hdlr"], mdia_s, mdia_e)
            if raw[hdlr_s + 8 : hdlr_s + 12] != b"vide":
                continue
            return mdia_s, mdia_e
        except ValueError:
            continue
    raise ValueError("mp4: no video track")


def _video_stbl(raw: bytes) -> tuple[int, int]:
    """(payload_start, payload_end) of the first VIDEO track's stbl."""
    mdia_s, mdia_e = _video_mdia(raw)
    return _find_box(raw, [b"minf", b"stbl"], mdia_s, mdia_e)


def mp4_probe(payload: bytes) -> dict:
    """Container metadata from the moov atom without touching sample data:
    ``{codec, width, height, n_samples, timescale, duration}``.
    ValueError on anything that is not an ISO-BMFF file with a video trak."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("mp4: missing ftyp")
    stbl_s, stbl_e = _video_stbl(payload)
    stsd_s, stsd_e = _find_box(payload, [b"stsd"], stbl_s, stbl_e)
    if stsd_e - stsd_s < 16 + 36:
        raise ValueError("mp4: truncated stsd")
    entry = stsd_s + 8  # skip version/flags + entry_count
    codec = payload[entry + 4 : entry + 8].decode("latin1")
    width, height = struct.unpack(">HH", payload[entry + 32 : entry + 36])
    stsz_s, stsz_e = _find_box(payload, [b"stsz"], stbl_s, stbl_e)
    if stsz_e - stsz_s < 12:
        raise ValueError("mp4: truncated stsz")
    _, n_samples = struct.unpack(">II", payload[stsz_s + 4 : stsz_s + 12])
    # mdhd of the VIDEO track (not just the first trak) holds the media
    # timescale/duration
    timescale = duration = 0
    try:
        mdia_s, mdia_e = _video_mdia(payload)
        mdhd_s, _ = _find_box(payload, [b"mdhd"], mdia_s, mdia_e)
        timescale, duration = struct.unpack(">II", payload[mdhd_s + 12 : mdhd_s + 20])
    except ValueError:
        pass
    return {
        "codec": codec,
        "width": width,
        "height": height,
        "n_samples": n_samples,
        "timescale": timescale,
        "duration": duration,
    }


def _sample_ranges(payload: bytes) -> list[tuple[int, int]]:
    """Exact (offset, size) of every video sample, from the sample tables."""
    stbl_s, stbl_e = _video_stbl(payload)

    stsz_s, stsz_e = _find_box(payload, [b"stsz"], stbl_s, stbl_e)
    if stsz_e - stsz_s < 12:
        raise ValueError("mp4: truncated stsz")
    fixed, n = struct.unpack(">II", payload[stsz_s + 4 : stsz_s + 12])
    if fixed:
        sizes = [fixed] * n
    else:
        if stsz_s + 12 + 4 * n > stsz_e:
            raise ValueError("mp4: truncated stsz")
        sizes = list(struct.unpack(f">{n}I", payload[stsz_s + 12 : stsz_s + 12 + 4 * n]))

    # Count fields are bounds-checked against the box payload end before
    # unpacking (like stsz's per-sample sizes above): truncated/malformed
    # tables raise ValueError per the codec contract, never struct.error.
    try:
        stco_s, stco_e = _find_box(payload, [b"stco"], stbl_s, stbl_e)
        off_w, off_fmt = 4, "I"
    except ValueError:
        stco_s, stco_e = _find_box(payload, [b"co64"], stbl_s, stbl_e)
        off_w, off_fmt = 8, "Q"
    if stco_e - stco_s < 8:
        raise ValueError("mp4: truncated stco/co64")
    (nc,) = struct.unpack(">I", payload[stco_s + 4 : stco_s + 8])
    if stco_s + 8 + off_w * nc > stco_e:
        raise ValueError("mp4: truncated stco/co64")
    offs = list(
        struct.unpack(f">{nc}{off_fmt}", payload[stco_s + 8 : stco_s + 8 + off_w * nc])
    )

    stsc_s, stsc_e = _find_box(payload, [b"stsc"], stbl_s, stbl_e)
    if stsc_e - stsc_s < 8:
        raise ValueError("mp4: truncated stsc")
    (ne,) = struct.unpack(">I", payload[stsc_s + 4 : stsc_s + 8])
    if stsc_s + 8 + 12 * ne > stsc_e:
        raise ValueError("mp4: truncated stsc")
    runs = [
        struct.unpack(">III", payload[stsc_s + 8 + 12 * k : stsc_s + 20 + 12 * k])
        for k in range(ne)
    ]

    # Expand stsc runs: run k applies from its first_chunk until the next
    # run's first_chunk (1-based), per 14496-12 §8.7.4.
    per_chunk = []
    for k, (first, spc, _sdi) in enumerate(runs):
        last = runs[k + 1][0] if k + 1 < len(runs) else len(offs) + 1
        per_chunk.extend([spc] * (last - first))
    if len(per_chunk) < len(offs):
        per_chunk.extend([per_chunk[-1] if per_chunk else 0] * (len(offs) - len(per_chunk)))

    ranges: list[tuple[int, int]] = []
    si = 0
    for ci, chunk_off in enumerate(offs):
        pos = chunk_off
        for _ in range(per_chunk[ci]):
            if si >= len(sizes):
                break
            if pos + sizes[si] > len(payload):
                raise ValueError("mp4: sample range beyond file end")
            ranges.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    if si != len(sizes):
        raise ValueError("mp4: sample tables disagree on sample count")
    return ranges


def mp4_demux(payload: bytes) -> list[bytes]:
    """Raw per-sample payloads of the video track (for MJPEG: each one a
    complete JPEG image). Container-layer only — no codec decode here."""
    return [payload[o : o + s] for o, s in _sample_ranges(payload)]


def mp4_decode_frames(payload: bytes) -> list[np.ndarray]:
    """Decode an mp4's video track to ``(h, w, 3) uint8`` frames: MJPEG
    samples via the baseline JPEG decoder, avc1 samples via the baseline
    I-frame H.264 decoder (operators/h264.py; all-IDR streams — the shape
    this repo's muxer writes). ValueError for other codecs (hev1...) —
    callers fall back to the digest path, same contract as progressive
    JPEG."""
    meta = mp4_probe(payload)
    if meta["codec"] in ("jpeg", "mjpa"):
        return [jpeg_decode(s) for s in mp4_demux(payload)]
    if meta["codec"] == "avc1":
        n = meta["n_samples"]
        return mp4_decode_avc_samples(payload, list(range(n)))
    raise ValueError(f"mp4: codec {meta['codec']!r} decode not supported")


def _avc_config(payload: bytes) -> tuple[int, bytes]:
    """(nal_length_size, annexb parameter-set prefix) from the avc1 sample
    entry's avcC box."""
    stbl_s, stbl_e = _video_stbl(payload)
    stsd_s, stsd_e = _find_box(payload, [b"stsd"], stbl_s, stbl_e)
    entry = stsd_s + 8  # skip version/flags + entry_count
    if payload[entry + 4 : entry + 8] != b"avc1":
        raise ValueError("mp4: not an avc1 sample entry")
    (entry_size,) = struct.unpack(">I", payload[entry : entry + 4])
    entry_end = min(entry + entry_size, stsd_e)
    # children of a visual sample entry start after its 86 fixed bytes
    avcc_s = avcc_e = None
    for btype, ps, pe in _walk_boxes(payload, entry + 86, entry_end):
        if btype == b"avcC":
            avcc_s, avcc_e = ps, pe
            break
    if avcc_s is None:
        raise ValueError("mp4: avc1 entry without avcC")
    cfg = payload[avcc_s:avcc_e]
    if len(cfg) < 7 or cfg[0] != 1:
        raise ValueError("mp4: bad avcC")
    length_size = (cfg[4] & 3) + 1
    prefix = bytearray()
    pos = 5
    n_sps = cfg[pos] & 0x1F
    pos += 1
    for _ in range(n_sps):
        if pos + 2 > len(cfg):
            raise ValueError("mp4: truncated avcC")
        (ln,) = struct.unpack(">H", cfg[pos : pos + 2])
        pos += 2
        prefix += b"\x00\x00\x00\x01" + cfg[pos : pos + ln]
        pos += ln
    if pos >= len(cfg):
        raise ValueError("mp4: truncated avcC")
    n_pps = cfg[pos]
    pos += 1
    for _ in range(n_pps):
        if pos + 2 > len(cfg):
            raise ValueError("mp4: truncated avcC")
        (ln,) = struct.unpack(">H", cfg[pos : pos + 2])
        pos += 2
        prefix += b"\x00\x00\x00\x01" + cfg[pos : pos + ln]
        pos += ln
    return length_size, bytes(prefix)


def _avc_sample_to_annexb(sample: bytes, length_size: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos + length_size <= len(sample):
        ln = int.from_bytes(sample[pos : pos + length_size], "big")
        pos += length_size
        if pos + ln > len(sample):
            raise ValueError("mp4: truncated avc sample")
        out += b"\x00\x00\x00\x01" + sample[pos : pos + ln]
        pos += ln
    if pos != len(sample):
        raise ValueError("mp4: trailing bytes in avc sample")
    return bytes(out)


def mp4_decode_avc_samples(payload: bytes, indices: list[int]) -> list[np.ndarray]:
    """Decode only the given sample indices of an avc1 track (each sample
    an IDR access unit — random access, so a strided thumbnail/sample pass
    never decodes the whole clip)."""
    from kafkasparkstream_spark.operators.h264 import h264_decode_annexb

    length_size, prefix = _avc_config(payload)
    ranges = _sample_ranges(payload)
    out = []
    for i in indices:
        if not 0 <= i < len(ranges):
            raise ValueError("mp4: sample index out of range")
        o, s = ranges[i]
        annexb = prefix + _avc_sample_to_annexb(payload[o : o + s], length_size)
        out.append(h264_decode_annexb(annexb)[0])
    return out


def mp4_encode_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """Fixture-grade Motion-JPEG mp4 muxer: every frame JPEG-encoded and
    stored as one sample, correct ftyp/moov/mdat with real sample tables
    (single chunk, per-sample stsz). Any conformant demuxer reads it."""
    if not frames:
        raise ValueError("mp4: need at least one frame")
    h, w = frames[0].shape[:2]
    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x0bMotion-JPEG" + b"\x00" * 20  # 32-byte compressorname
        + struct.pack(">Hh", 24, -1)
    )
    samples = [jpeg_encode(f, quality=quality) for f in frames]
    return _mux_mp4_video(samples, w, h, fps, _box(b"jpeg", entry))


def mp4_encode_h264(
    frames: list[np.ndarray], fps: int = 10, qp: int = 28, mode: str = "i4x4"
) -> bytes:
    """Fixture-grade AVC mp4 muxer: frames encoded as all-IDR baseline
    H.264 (operators/h264.py), SPS/PPS carried in the avcC configuration
    box, each access unit stored as one length-prefixed sample."""
    from kafkasparkstream_spark.operators import h264 as _h264

    if not frames:
        raise ValueError("mp4: need at least one frame")
    h, w = frames[0].shape[:2]
    stream = _h264.h264_encode_annexb(frames, qp=qp, mode=mode)
    sps = pps = None
    samples = []
    for nal in _h264.split_annexb(stream):
        typ = nal[0] & 0x1F
        if typ == 7:
            sps = nal
        elif typ == 8:
            pps = nal
        elif typ == 5:
            samples.append(struct.pack(">I", len(nal)) + nal)
    assert sps is not None and pps is not None
    avcc = _box(
        b"avcC",
        bytes([1, sps[1], sps[2], sps[3], 0xFC | 3, 0xE0 | 1])
        + struct.pack(">H", len(sps)) + sps
        + bytes([1]) + struct.pack(">H", len(pps)) + pps,
    )
    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)
        + b"\x04AVC\x00" + b"\x00" * 27  # 32-byte compressorname
        + struct.pack(">Hh", 24, -1)
    )
    return _mux_mp4_video(samples, w, h, fps, _box(b"avc1", entry + avcc))


def _mux_mp4_video(samples: list[bytes], w: int, h: int, fps: int,
                   stsd_entry: bytes) -> bytes:
    """Shared single-track video muxer core: correct ftyp/moov/mdat with
    real sample tables (single chunk, per-sample stsz)."""
    n = len(samples)
    timescale = 1000
    delta = timescale // fps
    duration = n * delta

    def moov_for(chunk_off: int) -> bytes:
        mvhd = _full_box(
            b"mvhd",
            0,
            0,
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">iH", 0x00010000, 0x0100)  # rate, volume
            + b"\x00" * 10
            + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + struct.pack(">I", 2),  # next_track_id
        )
        tkhd = _full_box(
            b"tkhd",
            0,
            7,  # enabled | in_movie | in_preview
            struct.pack(">IIIII", 0, 0, 1, 0, duration)
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = _full_box(
            b"mdhd",
            0,
            0,
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        hdlr = _full_box(
            b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"VideoHandler\x00"
        )
        stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
        stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
        stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
        stsz = _full_box(
            b"stsz",
            0,
            0,
            struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(s)) for s in samples),
        )
        stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, chunk_off))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        dref = _full_box(
            b"dref", 0, 0, struct.pack(">I", 1) + _full_box(b"url ", 0, 1, b"")
        )
        vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        minf = _box(b"minf", vmhd + _box(b"dinf", dref) + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    # stco stores an absolute file offset; moov's SIZE is independent of the
    # offset value (fixed-width u32), so one placeholder pass sizes it.
    moov_len = len(moov_for(0))
    first_sample = len(ftyp) + moov_len + 8
    moov = moov_for(first_sample)
    mdat = _box(b"mdat", b"".join(samples))
    return ftyp + moov + mdat


# ---------------------------------------------------------------------------
# FLAC (RFC 9639) — pure-stdlib lossless audio codec.
#
# Decoder scope: STREAMINFO + skipped metadata blocks; fixed-blocking frames;
# constant / verbatim / fixed(0-4) / LPC subframes; partitioned Rice residuals
# (4- and 5-bit parameters + escape-to-raw); wasted bits; all four channel
# layouts (independent, left-side, right-side, mid-side); CRC-8 header and
# CRC-16 frame checks enforced; STREAMINFO MD5 verified for byte-aligned bit
# depths. The fixture encoder below emits a conformant subset (fixed
# predictors or a forced-LPC twin, single-partition Rice or raw escape,
# wasted-bit extraction) so every decoder path round-trips under tests.
# Errors are ValueError per the codec contract (like JPEG/PNG/MP4 above).

_FLAC_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_FLAC_SSIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc_table(poly: int, width: int) -> list[int]:
    top, mask = 1 << (width - 1), (1 << width) - 1
    tbl = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        tbl.append(r)
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def _flac_crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TBL[c ^ b]
    return c


def _flac_crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ _CRC16_TBL[(c >> 8) ^ b]
    return c


class _MsbBitReader:
    """Plain MSB-first bit reader (no JPEG byte-stuffing). Overruns raise
    ValueError so truncated streams fail loudly per the codec contract."""

    __slots__ = ("d", "bitpos")

    def __init__(self, d: bytes, bitpos: int = 0):
        self.d = d
        self.bitpos = bitpos

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.bitpos + n
        if end > 8 * len(self.d):
            raise ValueError("flac: truncated stream")
        first = self.bitpos >> 3
        last = (end + 7) >> 3
        chunk = int.from_bytes(self.d[first:last], "big")
        self.bitpos = end
        return (chunk >> ((last << 3) - end)) & ((1 << n) - 1)

    def sread(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        d, pos = self.d, self.bitpos
        total = 8 * len(d)
        q = 0
        while True:
            if pos >= total:
                raise ValueError("flac: truncated unary code")
            rem = 8 - (pos & 7)
            bits = d[pos >> 3] & ((1 << rem) - 1)
            if bits == 0:
                q += rem
                pos += rem
                continue
            lead = rem - bits.bit_length()
            self.bitpos = pos + lead + 1
            return q + lead

    @property
    def byte_pos(self) -> int:
        return (self.bitpos + 7) >> 3

    def align(self) -> None:
        self.bitpos = self.byte_pos << 3


class _MsbBitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int) -> None:
        # q zero bits then a one — exactly the integer 1 in q+1 bits.
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0, "unaligned"
        return bytes(self.buf)


def _read_coded_number(r: _MsbBitReader) -> int:
    """UTF-8-style variable-length frame/sample number (up to 36 bits)."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    if n < 2 or n > 7:
        raise ValueError("flac: bad coded number")
    val = b0 & (0x7F >> n)
    for _ in range(n - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: bad coded number continuation")
        val = (val << 6) | (b & 0x3F)
    return val


def _write_coded_number(val: int) -> bytes:
    if val < 0x80:
        return bytes([val])
    for n in range(2, 8):
        if val < (1 << (5 * n + 1)):
            break
    out = [((0xFF << (8 - n)) & 0xFF) | (val >> (6 * (n - 1)))]
    for k in range(n - 2, -1, -1):
        out.append(0x80 | ((val >> (6 * k)) & 0x3F))
    return bytes(out)


def _flac_residual(r: _MsbBitReader, bs: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    po = r.read(4)
    nparts = 1 << po
    if bs % nparts:
        raise ValueError("flac: partition order does not divide block size")
    out: list[int] = []
    for p in range(nparts):
        count = (bs >> po) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("flac: partition smaller than predictor order")
        param = r.read(pbits)
        if param == escape:
            nb = r.read(5)
            out.extend(r.sread(nb) for _ in range(count))
        else:
            for _ in range(count):
                q = r.unary()
                v = (q << param) | r.read(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _flac_subframe(r: _MsbBitReader, bs: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("flac: subframe padding bit set")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
        bps -= wasted
        if bps <= 0:
            raise ValueError("flac: wasted bits exceed sample size")
    if t == 0:  # constant
        out = [r.sread(bps)] * bs
    elif t == 1:  # verbatim
        out = [r.sread(bps) for _ in range(bs)]
    elif 8 <= t <= 12:  # fixed predictor
        order = t - 8
        if order > bs:
            raise ValueError("flac: predictor order exceeds block size")
        out = [r.sread(bps) for _ in range(order)]
        res = _flac_residual(r, bs, order)
        coefs = _FIXED_COEFS[order]
        for i in range(order, bs):
            p = 0
            for j, c in enumerate(coefs):
                p += c * out[i - 1 - j]
            out.append(res[i - order] + p)
    elif t >= 32:  # LPC
        order = (t & 31) + 1
        if order > bs:
            raise ValueError("flac: predictor order exceeds block size")
        out = [r.sread(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid lpc precision")
        shift = r.sread(5)
        if shift < 0:
            raise ValueError("flac: negative lpc shift")
        coefs = [r.sread(prec) for _ in range(order)]
        res = _flac_residual(r, bs, order)
        for i in range(order, bs):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * out[i - 1 - j]
            out.append(res[i - order] + (acc >> shift))
    else:
        raise ValueError("flac: reserved subframe type")
    if wasted:
        out = [v << wasted for v in out]
    return out


def flac_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream to ``((n, channels) int64, sample_rate)`` —
    int64 like :func:`wav_decode`, so downstream exact-integer energy sums
    cannot overflow.

    Enforces the frame-header CRC-8, whole-frame CRC-16, and (for
    byte-aligned bit depths) the STREAMINFO MD5 of the decoded PCM.
    ValueError on anything malformed, truncated, or reserved."""
    import hashlib as _hashlib

    if payload[:4] != b"fLaC":
        raise ValueError("flac: missing fLaC magic")
    r = _MsbBitReader(payload, 32)
    info = None
    last = False
    while not last:
        last = bool(r.read(1))
        btype = r.read(7)
        blen = r.read(24)
        if btype == 0:
            if blen != 34:
                raise ValueError("flac: bad STREAMINFO length")
            r.read(16), r.read(16), r.read(24), r.read(24)
            rate = r.read(20)
            nch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            md5 = b"".join(r.read(8).to_bytes(1, "big") for _ in range(16))
            info = (rate, nch, bps, total, md5)
        else:
            if btype == 127:
                raise ValueError("flac: invalid metadata block type")
            if r.bitpos + 8 * blen > 8 * len(payload):
                raise ValueError("flac: truncated metadata block")
            r.bitpos += 8 * blen
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    rate, nch, bps, total, md5 = info
    if rate == 0:
        raise ValueError("flac: zero sample rate")

    frames: list[list[list[int]]] = []
    ndec = 0
    while (ndec < total) if total else (r.byte_pos < len(payload)):
        r.align()
        fstart = r.byte_pos
        if r.read(14) != 0x3FFE:
            raise ValueError("flac: bad frame sync")
        r.read(1)  # reserved (blocking-strategy-must-match left to players)
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("flac: reserved frame header bit")
        _read_coded_number(r)
        if bs_code == 0:
            raise ValueError("flac: reserved block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 15:
            raise ValueError("flac: invalid sample rate code")
        elif sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        if ss_code == 0:
            fbps = bps
        elif ss_code == 3:
            raise ValueError("flac: reserved sample size code")
        else:
            fbps = _FLAC_SSIZE[ss_code]
        crc8 = r.read(8)
        if _flac_crc8(payload[fstart : r.byte_pos - 1]) != crc8:
            raise ValueError("flac: frame header crc mismatch")

        if ch_code <= 7:
            fch = ch_code + 1
            side = None
        elif ch_code <= 10:
            fch = 2
            side = ("left", "right", "mid")[ch_code - 8]
        else:
            raise ValueError("flac: reserved channel assignment")
        if fch != nch:
            raise ValueError("flac: frame channel count differs from STREAMINFO")

        chans = []
        for c in range(fch):
            extra = 1 if (
                (side == "left" and c == 1)
                or (side == "right" and c == 0)
                or (side == "mid" and c == 1)
            ) else 0
            chans.append(_flac_subframe(r, bs, fbps + extra))
        if side == "left":  # ch0=left, ch1=side -> right = left - side
            chans = [chans[0], [l - s for l, s in zip(chans[0], chans[1])]]
        elif side == "right":  # ch0=side, ch1=right -> left = right + side
            chans = [[rt + s for s, rt in zip(chans[0], chans[1])], chans[1]]
        elif side == "mid":
            mids, sides = chans
            left, right = [], []
            for m, s in zip(mids, sides):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
            chans = [left, right]
        r.align()
        crc16 = r.read(16)
        if _flac_crc16(payload[fstart : r.byte_pos - 2]) != crc16:
            raise ValueError("flac: frame crc mismatch")
        frames.append(chans)
        ndec += bs

    n = total or ndec
    out = np.empty((n, nch), dtype=np.int64)
    row = 0
    for chans in frames:
        bs = len(chans[0])
        take = min(bs, n - row)
        for c in range(nch):
            out[row : row + take, c] = chans[c][:take]
        row += take
    if md5 != b"\x00" * 16 and bps % 8 == 0:
        width = bps // 8
        pcm = bytearray()
        for i in range(n):
            for c in range(nch):
                pcm += int(out[i, c]).to_bytes(width, "little", signed=True)
        if _hashlib.md5(bytes(pcm)).digest() != md5:
            raise ValueError("flac: decoded PCM fails STREAMINFO md5")
    return out, rate


def _rice_cost(us: list[int], param: int) -> int:
    return len(us) * (param + 1) + sum(u >> param for u in us)


def _encode_residual(w: _MsbBitWriter, res: list[int], pbits: int = 4) -> None:
    """Single-partition Rice (or escape-to-raw when cheaper/necessary)."""
    w.write(pbits - 4, 2)  # method: 0=rice4, 1=rice5
    w.write(0, 4)  # partition order 0
    escape = (1 << pbits) - 1
    us = [(v << 1) ^ (v >> 63) for v in res]
    best_p, best_cost = 0, None
    for p in range(escape):
        c = _rice_cost(us, p)
        if best_cost is None or c < best_cost:
            best_p, best_cost = p, c
    nb = max((v.bit_length() + 1 for v in res), default=1)
    nb = min(nb, 31)
    if res and (nb * len(res) < best_cost or max(us).bit_length() > 40):
        w.write(escape, pbits)
        w.write(nb, 5)
        for v in res:
            w.write(v, nb)
        return
    w.write(best_p, pbits)
    for u in us:
        w.unary(u >> best_p)
        w.write(u, best_p)


def _encode_subframe(w: _MsbBitWriter, xs: list[int], bps: int, force_lpc: bool) -> None:
    w.write(0, 1)  # padding
    wasted = 0
    if any(xs):
        tz = min((v & -v).bit_length() - 1 for v in xs if v)
        if all(v == 0 or (v & ((1 << tz) - 1)) == 0 for v in xs):
            wasted = tz
    if wasted:
        xs = [v >> wasted for v in xs]
        bps -= wasted
    if all(v == xs[0] for v in xs):
        w.write(0, 6)  # constant
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.unary(wasted - 1)
        w.write(xs[0], bps)
        return
    # pick the fixed order 0-2 with the smallest |residual| sum
    cands = []
    for order in (0, 1, 2):
        if order >= len(xs):
            break
        coefs = _FIXED_COEFS[order]
        res = [
            xs[i] - sum(c * xs[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, len(xs))
        ]
        cands.append((sum(abs(v) for v in res), order, res))
    _, order, res = min(cands)
    if force_lpc and order == 2:
        w.write(32 + (order - 1), 6)  # LPC, order 2
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.unary(wasted - 1)
        for v in xs[:order]:
            w.write(v, bps)
        w.write(12 - 1, 4)  # precision 12
        w.write(0, 5)  # shift 0
        w.write(2, 12)
        w.write(-1, 12)
    else:
        w.write(8 + order, 6)
        w.write(1 if wasted else 0, 1)
        if wasted:
            w.unary(wasted - 1)
        for v in xs[:order]:
            w.write(v, bps)
    _encode_residual(w, res, pbits=4 if bps <= 17 else 5)


def flac_encode(
    samples: np.ndarray,
    rate: int = 16000,
    block_size: int = 4096,
    stereo_mode: str = "indep",
    force_lpc: bool = False,
) -> bytes:
    """Encode int PCM ``(n,)`` or ``(n, channels)`` as a conformant FLAC
    stream (16-bit). ``stereo_mode`` picks the channel decorrelation
    (``indep``/``left_side``/``right_side``/``mid_side``; stereo input
    only); ``force_lpc`` emits order-2 subframes through the LPC layout
    (coefs [2,-1], shift 0 — bit-identical output to the fixed predictor)
    so decoder LPC paths are exercisable from pure fixtures."""
    import hashlib as _hashlib

    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    if not (1 <= nch <= 8):
        raise ValueError("flac: 1-8 channels")
    bps = 16
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if x.size and (x.min() < lo or x.max() > hi):
        raise ValueError("flac: samples exceed 16-bit range")
    if stereo_mode != "indep" and nch != 2:
        raise ValueError("flac: stereo_mode needs 2 channels")
    if not (16 <= block_size <= 65535):
        raise ValueError("flac: block_size out of range")

    pcm = bytearray()
    for i in range(n):
        for c in range(nch):
            pcm += int(x[i, c]).to_bytes(2, "little", signed=True)
    md5 = _hashlib.md5(bytes(pcm)).digest()

    hdr = _MsbBitWriter()
    hdr.write(1, 1)  # last metadata block
    hdr.write(0, 7)  # STREAMINFO
    hdr.write(34, 24)
    bs_field = min(block_size, max(n, 16)) if n else block_size
    hdr.write(bs_field, 16)
    hdr.write(bs_field, 16)
    hdr.write(0, 24)
    hdr.write(0, 24)
    hdr.write(rate, 20)
    hdr.write(nch - 1, 3)
    hdr.write(bps - 1, 5)
    hdr.write(n, 36)
    for b in md5:
        hdr.write(b, 8)

    ch_code = {"indep": nch - 1, "left_side": 8, "right_side": 9, "mid_side": 10}[
        stereo_mode
    ]
    body = bytearray()
    for fi, start in enumerate(range(0, max(n, 1), block_size)):
        blk = x[start : start + block_size]
        bs = len(blk)
        if bs == 0:
            break
        w = _MsbBitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # explicit 16-bit block size
        w.write(13, 4) if rate <= 65535 else w.write(12, 4)
        w.write(ch_code, 4)
        w.write(4, 3)  # 16 bps
        w.write(0, 1)
        for b in _write_coded_number(fi):
            w.write(b, 8)
        w.write(bs - 1, 16)
        if rate <= 65535:
            w.write(rate, 16)
        elif rate % 1000 == 0 and rate // 1000 <= 255:
            w.write(rate // 1000, 8)
        else:
            raise ValueError("flac: unrepresentable sample rate")
        head = w
        head.align()
        hb = bytearray(head.getvalue())
        hb.append(_flac_crc8(bytes(hb)))
        fw = _MsbBitWriter()
        for b in hb:
            fw.write(b, 8)
        cols = [blk[:, c].astype(np.int64).tolist() for c in range(nch)]
        if stereo_mode == "left_side":
            chans = [(cols[0], bps), ([l - r for l, r in zip(*cols)], bps + 1)]
        elif stereo_mode == "right_side":
            chans = [([l - r for l, r in zip(*cols)], bps + 1), (cols[1], bps)]
        elif stereo_mode == "mid_side":
            chans = [
                ([(l + r) >> 1 for l, r in zip(*cols)], bps),
                ([l - r for l, r in zip(*cols)], bps + 1),
            ]
        else:
            chans = [(col, bps) for col in cols]
        for xs, cbps in chans:
            _encode_subframe(fw, xs, cbps, force_lpc)
        fw.align()
        fb = bytearray(fw.getvalue())
        fb += _flac_crc16(bytes(fb)).to_bytes(2, "big")
        body += fb

    hdr.align()
    return b"fLaC" + hdr.getvalue() + bytes(body)


# --------------------------------------------------------------------------
# MP3 (MPEG-1/2/2.5 audio) frame-header probe
# --------------------------------------------------------------------------
#
# Metadata extraction without a synthesis decoder: walk the frame headers
# (ISO/IEC 11172-3 / 13818-3 framing) and report version, layer, bitrate,
# sample rate, channel mode, frame/sample counts and duration. A crawl
# pipeline needs exactly this to filter/route audio (drop <16 kHz, split by
# duration, detect CBR/VBR) — the subband synthesis itself adds nothing to
# those decisions, so full MP3 PCM decode is intentionally out of scope
# (WAV and FLAC cover the real-PCM paths).

_MP3_BITRATE_V1 = {
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}
_MP3_BITRATE_V2 = {
    1: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {"1": (44100, 48000, 32000), "2": (22050, 24000, 16000),
              "2.5": (11025, 12000, 8000)}
_MP3_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


def _mp3_skip_id3v2(payload: bytes) -> int:
    """Byte offset past a leading ID3v2 tag (syncsafe length), else 0."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    if any(b & 0x80 for b in payload[6:10]):
        raise ValueError("mp3: corrupt ID3v2 syncsafe size")
    size = (payload[6] << 21) | (payload[7] << 14) | (payload[8] << 7) | payload[9]
    # ID3v2.4 footer flag (header byte 5 & 0x10): a 10-byte '3DI' footer
    # follows the tag body and is NOT counted in the syncsafe size (r6
    # ADVICE — without this the skip lands on the footer and a valid
    # stream reports 'lost frame sync').
    if payload[5] & 0x10:
        size += 10
    return 10 + size


def _mp3_frame_header(payload: bytes, off: int):
    """Parse one frame header at ``off`` -> (frame_len, meta dict).

    Raises ValueError on anything that is not a valid MPEG audio frame
    header (the codec contract: malformed input errors loudly)."""
    if off + 4 > len(payload):
        raise ValueError("mp3: truncated frame header")
    b0, b1, b2, b3 = payload[off : off + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError("mp3: lost frame sync")
    ver_bits = (b1 >> 3) & 0x3
    version = {0: "2.5", 2: "2", 3: "1"}.get(ver_bits)
    if version is None:
        raise ValueError("mp3: reserved MPEG version")
    layer = {1: 3, 2: 2, 3: 1}.get((b1 >> 1) & 0x3)
    if layer is None:
        raise ValueError("mp3: reserved layer")
    br_idx = (b2 >> 4) & 0xF
    if br_idx in (0, 0xF):
        raise ValueError("mp3: free-format or invalid bitrate index")
    table = _MP3_BITRATE_V1 if version == "1" else _MP3_BITRATE_V2
    bitrate = table[layer][br_idx] * 1000
    sr_idx = (b2 >> 2) & 0x3
    if sr_idx == 3:
        raise ValueError("mp3: reserved sample-rate index")
    rate = _MP3_RATES[version][sr_idx]
    padding = (b2 >> 1) & 0x1
    mode = _MP3_MODES[(b3 >> 6) & 0x3]
    if layer == 1:
        spf = 384
        frame_len = (12 * bitrate // rate + padding) * 4
    else:
        spf = 1152 if (layer == 2 or version == "1") else 576
        frame_len = spf // 8 * bitrate // rate + padding
    return frame_len, {
        "version": version, "layer": layer, "bitrate_kbps": bitrate // 1000,
        "sample_rate": rate, "mode": mode, "samples_per_frame": spf,
    }


def mp3_probe(payload: bytes) -> dict:
    """Walk every MPEG audio frame and report stream metadata:

    ``{version, layer, sample_rate, mode, n_frames, n_samples,
    duration_ms, bitrate_kbps (first frame), vbr (bitrate varies),
    id3v2 (tag present)}``

    Truncation mid-frame and header corruption raise ValueError; a final
    partial frame of < 4 bytes of trailing junk also errors (codec
    contract). Duration is exact integer math: sum(samples)*1000 // rate.
    """
    off = _mp3_skip_id3v2(payload)
    had_id3 = off > 0
    if off >= len(payload):
        raise ValueError("mp3: no frames after ID3v2 tag")
    first = None
    n_frames = n_samples = 0
    bitrates = set()
    while off < len(payload):
        frame_len, meta = _mp3_frame_header(payload, off)
        if off + frame_len > len(payload):
            raise ValueError("mp3: truncated final frame")
        if first is None:
            first = meta
        elif (meta["version"], meta["layer"], meta["sample_rate"]) != (
            first["version"], first["layer"], first["sample_rate"]
        ):
            raise ValueError("mp3: mid-stream format change")
        bitrates.add(meta["bitrate_kbps"])
        n_frames += 1
        n_samples += meta["samples_per_frame"]
        off += frame_len
    if first is None:
        raise ValueError("mp3: no frames")
    return {
        "version": first["version"], "layer": first["layer"],
        "sample_rate": first["sample_rate"], "mode": first["mode"],
        "n_frames": n_frames, "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // first["sample_rate"],
        "bitrate_kbps": first["bitrate_kbps"], "vbr": len(bitrates) > 1,
        "id3v2": had_id3,
    }


def mp3_frames_fixture(
    n_frames: int = 4,
    bitrate_kbps: int | list[int] = 128,
    sample_rate: int = 44100,
    mono: bool = False,
    id3v2: bool = False,
) -> bytes:
    """Deterministic MPEG-1 Layer III fixture stream: valid frame headers
    with a counter-pattern payload (the probe only reads headers). A list
    of per-frame bitrates produces a VBR stream."""
    rates = {44100: 0, 48000: 1, 32000: 2}
    if sample_rate not in rates:
        raise ValueError("fixture supports MPEG-1 rates only")
    brs = bitrate_kbps if isinstance(bitrate_kbps, list) else [bitrate_kbps] * n_frames
    if len(brs) != n_frames:
        raise ValueError("per-frame bitrate list length mismatch")
    out = bytearray()
    if id3v2:
        tag_body = b"\x00" * 17
        out += b"ID3\x03\x00\x00" + bytes(
            [(len(tag_body) >> 21) & 0x7F, (len(tag_body) >> 14) & 0x7F,
             (len(tag_body) >> 7) & 0x7F, len(tag_body) & 0x7F]
        ) + tag_body
    for i, kbps in enumerate(brs):
        br_idx = _MP3_BITRATE_V1[3].index(kbps)
        b1 = 0xE0 | (3 << 3) | (1 << 1) | 1  # MPEG-1, Layer III, no CRC
        b2 = (br_idx << 4) | (rates[sample_rate] << 2)
        b3 = (0x3 << 6) if mono else 0x00
        frame_len = 144 * kbps * 1000 // sample_rate
        frame = bytearray([0xFF, b1, b2, b3])
        frame += bytes((7 * i + j) % 251 for j in range(frame_len - 4))
        out += frame
    return bytes(out)
