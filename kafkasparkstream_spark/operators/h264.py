"""Pure-stdlib H.264/AVC *baseline I-frame* codec (ITU-T H.264 subset).

Closes the last real video-codec gap in the multimodal surface
(``operators/codecs.py`` decodes PNG/GIF/JPEG-baseline/JPEG-progressive and
demuxes MJPEG MP4; H.264 was digest-fallback). Scope — the keyframe subset a
training-data pipeline actually touches when thumbnailing / feature-probing
video corpora:

- **Decoder** ``h264_decode_annexb``: Annex B byte streams (ITU-T H.264
  Annex B), Baseline profile, 8-bit 4:2:0, CAVLC entropy coding, I slices
  only (IDR), macroblock types I_4x4, I_16x16 (all intra prediction modes,
  §8.3) and I_PCM, frame cropping, multi-frame streams. Deblocking is
  honored only as "disabled" (``disable_deblocking_filter_idc == 1``);
  streams that require the in-loop filter raise ``ValueError`` rather than
  return subtly-wrong pixels — same loud-error contract as the JPEG/MP4
  codecs.
- **Encoder** ``h264_encode_annexb``: fixture-grade but spec-compliant —
  real intra prediction (selectable per call: any 4x4 mode, 16x16 modes,
  I_PCM), forward 4x4 integer transform + quantization (§8.5), CAVLC
  residual coding (§9.2), emulation-prevention insertion. It runs the same
  local reconstruction loop a conforming encoder must, and returns those
  reconstructed frames: ``decode(encode(x)) == encoder_reconstruction`` is
  an EXACT equality the tests pin across QPs, modes and macroblock types
  (quantization makes ``decode == x`` itself impossible except for I_PCM,
  which the tests also pin exactly).

Everything here derives from the public ITU-T H.264 (08/2021) spec text:
NAL/RBSP (§7.3.1, §7.4.1), SPS/PPS (§7.3.2), slice header (§7.3.3),
macroblock/residual syntax (§7.3.5, §9.2), intra prediction (§8.3),
transform/quant (§8.5). No reference-repo lineage: the reference
(ashrafkvt/KafkaSparkStream) has no video path at all — this extends the
engine's multimodal columns the way its documents/embeddings extensions do.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# NAL / RBSP layer (§7.3.1, §7.4.1.1, Annex B)
# ---------------------------------------------------------------------------


def split_annexb(payload: bytes) -> list[bytes]:
    """Split an Annex B byte stream into NAL units (start-code delimited,
    emulation prevention NOT yet removed). ValueError if no start code."""
    n = len(payload)
    # (code_start, payload_start) of every start code, scanned left to right
    marks: list[tuple[int, int]] = []
    i = 0
    while i + 3 <= n:
        if payload[i] == 0 and payload[i + 1] == 0 and payload[i + 2] == 1:
            code = i
            if i >= 1 and payload[i - 1] == 0:
                code = i - 1  # 4-byte form 00 00 00 01
            marks.append((code, i + 3))
            i += 3
        else:
            i += 1
    if not marks:
        raise ValueError("h264: no Annex B start code")
    nals = []
    for k, (_, s) in enumerate(marks):
        e = marks[k + 1][0] if k + 1 < len(marks) else n
        if e > s:
            nals.append(payload[s:e])
    return nals


def ebsp_to_rbsp(nal_payload: bytes) -> bytes:
    """Remove emulation-prevention bytes (00 00 03 -> 00 00)."""
    out = bytearray()
    zeros = 0
    i = 0
    n = len(nal_payload)
    while i < n:
        b = nal_payload[i]
        if zeros >= 2 and b == 0x03 and i + 1 < n and nal_payload[i + 1] <= 0x03:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def rbsp_to_ebsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes wherever 00 00 0x (x<=3) occurs."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 0x03:
            out.append(0x03)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over an RBSP, with Exp-Golomb (§9.1)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.data):
                raise ValueError("h264: bitstream truncated")
            v = (v << 1) | ((self.data[byte_i] >> (7 - bit_i)) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("h264: malformed Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) // 8 * 8

    def more_rbsp_data(self) -> bool:
        """§7.2: true if there are bits before the rbsp_stop_one_bit."""
        total = len(self.data) * 8
        if self.pos >= total:
            return False
        # find last 1 bit in the stream (the stop bit)
        for i in range(len(self.data) - 1, -1, -1):
            if self.data[i]:
                b = self.data[i]
                last_one = i * 8 + (7 - (b & -b).bit_length() + 1)
                return self.pos < last_one
        return False


class _BitWriter:
    """MSB-first bit writer producing an RBSP, with Exp-Golomb."""

    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        k = v + 1
        nbits = k.bit_length()
        self.u(0, nbits - 1)
        self.u(k, nbits)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp_trailing(self) -> None:
        self.bits.append(1)
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        out = bytearray()
        acc = 0
        for i, b in enumerate(self.bits):
            acc = (acc << 1) | b
            if i % 8 == 7:
                out.append(acc)
                acc = 0
        rem = len(self.bits) % 8
        if rem:
            out.append(acc << (8 - rem))
        return bytes(out)


# ---------------------------------------------------------------------------
# CAVLC (§9.2) — coeff_token / total_zeros / run_before VLC tables.
#
# Tables transcribed from ITU-T H.264 Table 9-5 (coeff_token, the three
# adaptive contexts + chroma-DC + the nC>=8 FLC), Tables 9-7/9-8
# (total_zeros, 4x4), Table 9-9(a) (total_zeros, chroma DC 4:2:0) and
# Table 9-10 (run_before), in (length, code-value) form. Self-tests pin
# prefix-freedom and full encode<->decode roundtrips; there is no H.264
# ground-truth decoder in this container (ENVIRONMENT.md), so third-party
# stream interop is untested here — the encoder/decoder PAIR is the
# verified artifact, same standard as the progressive-JPEG and FLAC
# fixtures.
# ---------------------------------------------------------------------------

# _CT_LEN/_CT_CODE[ctx][trailing_ones][total_coeff] for the three adaptive
# contexts: ctx 0 -> 0<=nC<2, ctx 1 -> 2<=nC<4, ctx 2 -> 4<=nC<8.
_CT_LEN = (
    (
        (1, 6, 8, 9, 10, 11, 13, 13, 13, 14, 14, 15, 15, 16, 16, 16, 16),
        (0, 2, 6, 8, 9, 10, 11, 13, 13, 14, 14, 15, 15, 15, 16, 16, 16),
        (0, 0, 3, 7, 8, 9, 10, 11, 13, 13, 14, 14, 15, 15, 16, 16, 16),
        (0, 0, 0, 5, 6, 7, 8, 9, 10, 11, 13, 14, 14, 15, 15, 16, 16),
    ),
    (
        (2, 6, 6, 7, 8, 8, 9, 11, 11, 12, 12, 12, 13, 13, 13, 14, 14),
        (0, 2, 5, 6, 6, 7, 8, 9, 11, 11, 12, 12, 13, 13, 14, 14, 14),
        (0, 0, 3, 6, 6, 7, 8, 9, 11, 11, 12, 12, 13, 13, 13, 14, 14),
        (0, 0, 0, 4, 4, 5, 6, 6, 7, 9, 11, 11, 12, 13, 13, 13, 14),
    ),
    (
        (4, 6, 6, 6, 7, 7, 7, 7, 8, 8, 9, 9, 9, 10, 10, 10, 10),
        (0, 4, 5, 5, 5, 5, 6, 6, 7, 8, 8, 9, 9, 9, 10, 10, 10),
        (0, 0, 4, 5, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 10),
        (0, 0, 0, 4, 4, 4, 4, 4, 5, 6, 7, 8, 8, 9, 10, 10, 10),
    ),
)
_CT_CODE = (
    (
        (1, 5, 7, 7, 7, 7, 15, 11, 8, 15, 11, 15, 11, 15, 11, 7, 4),
        (0, 1, 4, 6, 6, 6, 6, 14, 10, 14, 10, 14, 10, 1, 14, 10, 6),
        (0, 0, 1, 5, 5, 5, 5, 5, 13, 9, 13, 9, 13, 9, 13, 9, 5),
        (0, 0, 0, 3, 3, 4, 4, 4, 4, 4, 12, 12, 8, 12, 8, 12, 8),
    ),
    (
        (3, 11, 7, 7, 7, 4, 7, 15, 11, 15, 11, 8, 15, 11, 7, 9, 7),
        (0, 2, 7, 10, 6, 6, 6, 6, 14, 10, 14, 10, 14, 10, 11, 8, 6),
        (0, 0, 3, 9, 5, 5, 5, 5, 13, 9, 13, 9, 13, 9, 6, 10, 5),
        (0, 0, 0, 5, 4, 6, 8, 4, 4, 4, 12, 8, 12, 12, 8, 1, 4),
    ),
    (
        (15, 15, 11, 8, 15, 11, 9, 8, 15, 11, 15, 11, 8, 13, 9, 5, 1),
        (0, 14, 15, 12, 10, 8, 14, 10, 14, 14, 10, 14, 10, 7, 12, 8, 4),
        (0, 0, 13, 14, 11, 9, 13, 9, 13, 10, 13, 9, 13, 9, 11, 7, 3),
        (0, 0, 0, 12, 11, 10, 9, 8, 13, 12, 12, 12, 8, 12, 10, 6, 2),
    ),
)
# chroma DC (nC == -1, 4:2:0): [trailing_ones][total_coeff 0..4]
_CT_CDC_LEN = ((2, 6, 6, 6, 6), (0, 1, 6, 7, 8), (0, 0, 3, 7, 8), (0, 0, 0, 6, 7))
_CT_CDC_CODE = ((1, 7, 4, 3, 2), (0, 1, 6, 3, 3), (0, 0, 1, 2, 2), (0, 0, 0, 5, 0))

# total_zeros for 4x4 blocks (Tables 9-7/9-8): [total_coeff-1][total_zeros]
_TZ_LEN = (
    (1, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 9),
    (3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 6, 6, 6, 6),
    (4, 3, 3, 3, 4, 4, 3, 3, 4, 5, 5, 6, 5, 6),
    (5, 3, 4, 4, 3, 3, 3, 4, 3, 4, 5, 5, 5),
    (4, 4, 4, 3, 3, 3, 3, 3, 4, 5, 4, 5),
    (6, 5, 3, 3, 3, 3, 3, 3, 4, 3, 6),
    (6, 5, 3, 3, 3, 2, 3, 4, 3, 6),
    (6, 4, 5, 3, 2, 2, 3, 3, 6),
    (6, 6, 4, 2, 2, 3, 2, 5),
    (5, 5, 3, 2, 2, 2, 4),
    (4, 4, 3, 3, 1, 3),
    (4, 4, 2, 1, 3),
    (3, 3, 1, 2),
    (2, 2, 1),
    (1, 1),
)
_TZ_CODE = (
    (1, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 1),
    (7, 6, 5, 4, 3, 5, 4, 3, 2, 3, 2, 3, 2, 1, 0),
    (5, 7, 6, 5, 4, 3, 4, 3, 2, 3, 2, 1, 1, 0),
    (3, 7, 5, 4, 6, 5, 4, 3, 3, 2, 2, 1, 0),
    (5, 4, 3, 7, 6, 5, 4, 3, 2, 1, 1, 0),
    (1, 1, 7, 6, 5, 4, 3, 2, 1, 1, 0),
    (1, 1, 5, 4, 3, 3, 2, 1, 1, 0),
    (1, 1, 1, 3, 3, 2, 2, 1, 0),
    (1, 0, 1, 3, 2, 1, 1, 1),
    (1, 0, 1, 3, 2, 1, 1),
    (0, 1, 1, 2, 1, 3),
    (0, 1, 1, 1, 1),
    (0, 1, 1, 1),
    (0, 1, 1),
    (0, 1),
)
# total_zeros for chroma DC (Table 9-9a, maxNumCoeff 4): [tc-1][tz]
_TZ_CDC_LEN = ((1, 2, 3, 3), (1, 2, 2), (1, 1))
_TZ_CDC_CODE = ((1, 1, 1, 0), (1, 1, 0), (1, 0))

# run_before (Table 9-10): [min(zeros_left,7)-1][run]
_RB_LEN = (
    (1, 1),
    (1, 2, 2),
    (2, 2, 2, 2),
    (2, 2, 2, 3, 3),
    (2, 2, 3, 3, 3, 3),
    (2, 3, 3, 3, 3, 3, 3),
    (3, 3, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9, 10, 11),
)
_RB_CODE = (
    (1, 0),
    (1, 1, 0),
    (3, 2, 1, 0),
    (3, 2, 1, 1, 0),
    (3, 2, 3, 2, 1, 0),
    (3, 0, 1, 3, 2, 5, 4),
    (7, 6, 5, 4, 3, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1),
)


def _vlc_decode_map(lens, codes):
    """{(length, code): symbol} for one VLC table row set, skipping len==0
    (impossible symbol) entries."""
    out = {}
    for sym, (ln, code) in enumerate(zip(lens, codes)):
        if ln:
            if (ln, code) in out:
                raise AssertionError(f"duplicate VLC codepoint ({ln}, {code})")
            out[(ln, code)] = sym
    return out


def _read_vlc(r: _BitReader, table: dict[tuple[int, int], int], max_len: int = 16) -> int:
    ln, code = 0, 0
    while ln < max_len:
        code = (code << 1) | r.u(1)
        ln += 1
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("h264: invalid VLC code")


def _ct_context(nC: int) -> int:
    if nC < 2:
        return 0
    if nC < 4:
        return 1
    return 2


# Pre-built decode maps. coeff_token maps are keyed (len, code) -> packed
# symbol total_coeff*4 + trailing_ones.
def _build_ct_maps():
    maps = []
    for ctx in range(3):
        m = {}
        for t1 in range(4):
            for tc in range(17):
                ln = _CT_LEN[ctx][t1][tc]
                if ln:
                    key = (ln, _CT_CODE[ctx][t1][tc])
                    if key in m:
                        raise AssertionError(f"ctx{ctx}: duplicate coeff_token codepoint {key}")
                    m[key] = tc * 4 + t1
        maps.append(m)
    cdc = {}
    for t1 in range(4):
        for tc in range(5):
            ln = _CT_CDC_LEN[t1][tc]
            if ln or (t1 == 0 and tc == 0):
                cdc[(ln, _CT_CDC_CODE[t1][tc])] = tc * 4 + t1
    return maps, cdc


_CT_MAPS, _CT_CDC_MAP = _build_ct_maps()
_TZ_MAPS = [_vlc_decode_map(_TZ_LEN[i], _TZ_CODE[i]) for i in range(15)]
_TZ_CDC_MAPS = [_vlc_decode_map(_TZ_CDC_LEN[i], _TZ_CDC_CODE[i]) for i in range(3)]
_RB_MAPS = [_vlc_decode_map(_RB_LEN[i], _RB_CODE[i]) for i in range(7)]


def decode_coeff_token(r: _BitReader, nC: int) -> tuple[int, int]:
    """-> (total_coeff, trailing_ones). nC == -1 selects the chroma-DC
    table; nC >= 8 the 6-bit FLC (§9.2.1)."""
    if nC == -1:
        packed = _read_vlc(r, _CT_CDC_MAP, max_len=8)
    elif nC >= 8:
        v = r.u(6)
        if v == 3:  # 000011 -> TotalCoeff 0
            return 0, 0
        return (v >> 2) + 1, v & 3
    else:
        packed = _read_vlc(r, _CT_MAPS[_ct_context(nC)])
    return packed >> 2, packed & 3


def encode_coeff_token(w: _BitWriter, nC: int, tc: int, t1: int) -> None:
    if nC == -1:
        w.u(_CT_CDC_CODE[t1][tc], _CT_CDC_LEN[t1][tc])
    elif nC >= 8:
        w.u(3 if tc == 0 else ((tc - 1) << 2) | t1, 6)
    else:
        ctx = _ct_context(nC)
        w.u(_CT_CODE[ctx][t1][tc], _CT_LEN[ctx][t1][tc])


def decode_residual_block(r: _BitReader, nC: int, max_coeff: int) -> list[int]:
    """§9.2 residual_block_cavlc -> coefficient levels in SCAN ORDER
    (length max_coeff); the caller applies the zigzag mapping."""
    tc, t1 = decode_coeff_token(r, nC)
    coeffs = [0] * max_coeff
    if tc == 0:
        return coeffs
    if tc > max_coeff:
        raise ValueError("h264: total_coeff exceeds block size")
    levels: list[int] = []
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i in range(tc):
        if i < t1:
            levels.append(1 - 2 * r.u(1))
            continue
        prefix = 0
        while r.u(1) == 0:
            prefix += 1
            if prefix > 32:
                raise ValueError("h264: level_prefix overflow")
        suffix_size = suffix_len
        if prefix == 14 and suffix_len == 0:
            suffix_size = 4
        elif prefix >= 15:
            suffix_size = prefix - 3
        level_code = min(15, prefix) << suffix_len
        if suffix_size:
            level_code += r.u(suffix_size)
        if prefix >= 15 and suffix_len == 0:
            level_code += 15
        if prefix >= 16:
            level_code += (1 << (prefix - 3)) - 4096
        if i == t1 and t1 < 3:
            level_code += 2
        level = (level_code + 2) >> 1 if level_code % 2 == 0 else -((level_code + 1) >> 1)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    if tc < max_coeff:
        if nC == -1:
            total_zeros = _read_vlc(r, _TZ_CDC_MAPS[tc - 1], max_len=4)
        else:
            total_zeros = _read_vlc(r, _TZ_MAPS[tc - 1], max_len=9)
    else:
        total_zeros = 0
    zeros_left = total_zeros
    pos = tc - 1 + total_zeros
    for i, level in enumerate(levels):
        if pos >= max_coeff:
            raise ValueError("h264: coefficient position out of range")
        coeffs[pos] = level
        if i == tc - 1:
            break
        run = 0
        if zeros_left > 0:
            run = _read_vlc(r, _RB_MAPS[min(zeros_left, 7) - 1], max_len=11)
            if run > zeros_left:
                raise ValueError("h264: run_before exceeds zeros_left")
        zeros_left -= run
        pos -= 1 + run
    return coeffs


def encode_residual_block(w: _BitWriter, coeffs: list[int], nC: int, max_coeff: int) -> int:
    """Mirror of decode_residual_block; returns total_coeff (the caller
    stores it as the block's nnz for neighbour nC derivation)."""
    nz = [(i, c) for i, c in enumerate(coeffs[:max_coeff]) if c != 0]
    tc = len(nz)
    if tc == 0:
        encode_coeff_token(w, nC, 0, 0)
        return 0
    # trailing ones: up to 3 |1| levels at the high-frequency end
    t1 = 0
    for _, c in reversed(nz):
        if abs(c) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    highest = nz[-1][0]
    total_zeros = highest + 1 - tc
    encode_coeff_token(w, nC, tc, t1)
    # levels, highest frequency first
    ordered = [c for _, c in reversed(nz)]
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i, level in enumerate(ordered):
        if i < t1:
            w.u(0 if level > 0 else 1, 1)
            continue
        level_code = 2 * level - 2 if level > 0 else -2 * level - 1
        if i == t1 and t1 < 3:
            level_code -= 2
        if suffix_len == 0:
            if level_code < 14:
                w.u(1, level_code + 1)  # prefix zeros then 1
            elif level_code < 30:
                w.u(1, 15)  # prefix 14, 4-bit suffix (§9.2.2.1)
                w.u(level_code - 14, 4)
            else:
                _encode_level_escape(w, level_code, 0)
        else:
            if (level_code >> suffix_len) < 15:
                w.u(1, (level_code >> suffix_len) + 1)
                w.u(level_code & ((1 << suffix_len) - 1), suffix_len)
            else:
                _encode_level_escape(w, level_code, suffix_len)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    if tc < max_coeff:
        if nC == -1:
            w.u(_TZ_CDC_CODE[tc - 1][total_zeros], _TZ_CDC_LEN[tc - 1][total_zeros])
        else:
            w.u(_TZ_CODE[tc - 1][total_zeros], _TZ_LEN[tc - 1][total_zeros])
    zeros_left = total_zeros
    positions = [i for i, _ in reversed(nz)]
    for k in range(tc - 1):
        run = positions[k] - positions[k + 1] - 1
        if zeros_left > 0:
            idx = min(zeros_left, 7) - 1
            w.u(_RB_CODE[idx][run], _RB_LEN[idx][run])
        zeros_left -= run
    return tc


def _encode_level_escape(w: _BitWriter, level_code: int, suffix_len: int) -> None:
    """Escape path (level_prefix >= 15), mirroring §9.2.2.1 exactly.

    Decoder arithmetic: level_code = (15 << sl) + suffix
    [+15 if sl == 0] [+ (1 << (prefix-3)) - 4096 if prefix >= 16], with
    suffix_size = prefix - 3. Prefix 15 therefore covers rem in [0, 4096)
    where rem = level_code - base, base = (15 << sl) + (15 if sl == 0);
    prefix p >= 16 covers rem + 4096 in [2^(p-3), 2^(p-2))."""
    base = (15 << suffix_len) + (15 if suffix_len == 0 else 0)
    rem = level_code - base
    if rem < (1 << 12):
        w.u(1, 16)  # 15 prefix zeros + stop bit
        w.u(rem, 12)
        return
    v = rem + 4096
    p3 = v.bit_length() - 1  # = prefix - 3
    w.u(1, p3 + 4)  # prefix zeros + stop bit
    w.u(v - (1 << p3), p3)


# ---------------------------------------------------------------------------
# Transform & quantization (§8.5)
# ---------------------------------------------------------------------------

# 4x4 zigzag scan (frame coding): scan position -> raster index
_ZIGZAG4 = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# Dequant scale V[qp%6][class] (§8.5.9): class 0 = positions (0,0),(0,2),
# (2,0),(2,2); class 1 = (1,1),(1,3),(3,1),(3,3); class 2 = the rest.
_DEQUANT_V = (
    (10, 16, 13),
    (11, 18, 14),
    (13, 20, 16),
    (14, 23, 18),
    (16, 25, 20),
    (18, 29, 23),
)
# Forward quant multiplier MF[qp%6][class] (the well-known encoder-side
# companion of V; the norm constrains only the decoder, any quantizer is
# conformant — this one keeps |W|*MF within 32 bits).
_QUANT_MF = (
    (13107, 5243, 8066),
    (11916, 4660, 7490),
    (10082, 4194, 6554),
    (9362, 3647, 5825),
    (8192, 3355, 5243),
    (7282, 2893, 4559),
)


def _pos_class(i: int, j: int) -> int:
    if i % 2 == 0 and j % 2 == 0:
        return 0
    if i % 2 == 1 and j % 2 == 1:
        return 1
    return 2


def _class_matrix() -> np.ndarray:
    m = np.empty((4, 4), dtype=np.int64)
    for i in range(4):
        for j in range(4):
            m[i, j] = _pos_class(i, j)
    return m


_CLASS44 = _class_matrix()

# chroma QP mapping (Table 8-15): qPc = _QPC_TABLE[clip(qPy + offset, 0, 51)]
_QPC_TABLE = tuple(range(30)) + (29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36,
                                 36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39)

_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]],
               dtype=np.int64)
_H4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
               dtype=np.int64)
_H2 = np.array([[1, 1], [1, -1]], dtype=np.int64)


def forward_transform4(block: np.ndarray) -> np.ndarray:
    """Core 4x4 forward transform W = Cf X Cf^T (encoder side)."""
    return _CF @ block.astype(np.int64) @ _CF.T


def inverse_transform4(d: np.ndarray) -> np.ndarray:
    """§8.5.12.2 inverse 4x4 transform with the spec's exact butterfly
    (including the >>1 on odd basis inputs) and (x + 32) >> 6 rounding.
    Input: dequantized coefficients; output: residual samples."""
    d = d.astype(np.int64)
    # horizontal (rows)
    e = np.empty((4, 4), dtype=np.int64)
    e[0] = d[0] + d[2]
    e[1] = d[0] - d[2]
    e[2] = (d[1] >> 1) - d[3]
    e[3] = d[1] + (d[3] >> 1)
    f = np.empty((4, 4), dtype=np.int64)
    f[0] = e[0] + e[3]
    f[1] = e[1] + e[2]
    f[2] = e[1] - e[2]
    f[3] = e[0] - e[3]
    # vertical (columns)
    g = np.empty((4, 4), dtype=np.int64)
    g[0] = f[:, 0] + f[:, 2]
    g[1] = f[:, 0] - f[:, 2]
    g[2] = (f[:, 1] >> 1) - f[:, 3]
    g[3] = f[:, 1] + (f[:, 3] >> 1)
    h = np.empty((4, 4), dtype=np.int64)
    h[0] = g[0] + g[3]
    h[1] = g[1] + g[2]
    h[2] = g[1] - g[2]
    h[3] = g[0] - g[3]
    return (h.T + 32) >> 6


def quantize4(w: np.ndarray, qp: int) -> np.ndarray:
    """Encoder-side quantization of a 4x4 transform block (intra rounding
    f = 2^qbits / 3)."""
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3
    mf = np.array(
        [[_QUANT_MF[qp % 6][_CLASS44[i, j]] for j in range(4)] for i in range(4)],
        dtype=np.int64,
    )
    aw = np.abs(w)
    z = (aw * mf + f) >> qbits
    return np.where(w < 0, -z, z)


def dequantize4(z: np.ndarray, qp: int) -> np.ndarray:
    """§8.5.9 scaling for a 4x4 residual block: d = z * V[qp%6][class]
    << (qp // 6). For I_16x16 / chroma blocks the caller overwrites
    d[0, 0] with the secondary-transform-scaled DC afterwards
    (§8.5.12.1)."""
    v = np.array(
        [[_DEQUANT_V[qp % 6][_CLASS44[i, j]] for j in range(4)] for i in range(4)],
        dtype=np.int64,
    )
    return z.astype(np.int64) * v << (qp // 6)


def luma_dc_dequant(f: np.ndarray, qp: int) -> np.ndarray:
    """§8.5.10: inverse-hadamard the 4x4 luma DC plane, then scale."""
    g = _H4 @ f.astype(np.int64) @ _H4
    ls = _DEQUANT_V[qp % 6][0]
    if qp // 6 >= 2:
        return (g * ls) << (qp // 6 - 2)
    return (g * ls + (1 << (1 - qp // 6))) >> (2 - qp // 6)


def luma_dc_quant(dc: np.ndarray, qp: int) -> np.ndarray:
    """Encoder side: forward-hadamard (with /2) then quantize with doubled
    deadzone per the standard reference-encoder construction."""
    f = (_H4 @ dc.astype(np.int64) @ _H4) >> 1
    qbits = 15 + qp // 6
    off = (1 << qbits) // 3
    mf0 = _QUANT_MF[qp % 6][0]
    af = np.abs(f)
    z = (af * mf0 + 2 * off) >> (qbits + 1)
    return np.where(f < 0, -z, z)


def chroma_dc_dequant(f: np.ndarray, qpc: int) -> np.ndarray:
    """§8.5.11 (4:2:0): inverse 2x2 hadamard then scale. The spec writes
    ``(f * LevelScale) << (qPc/6) >> 5`` with LevelScale = 16 * normAdjust;
    ``_DEQUANT_V`` holds the bare normAdjust values, so the 16 folds the
    shift down to >> 1 (gain-checked against the normal coefficient path:
    a flat-m residual must scale to D = 64m either way)."""
    g = _H2 @ f.astype(np.int64) @ _H2
    ls = _DEQUANT_V[qpc % 6][0]
    return ((g * ls) << (qpc // 6)) >> 1


def chroma_dc_quant(dc: np.ndarray, qpc: int) -> np.ndarray:
    f = _H2 @ dc.astype(np.int64) @ _H2
    qbits = 15 + qpc // 6
    off = (1 << qbits) // 3
    mf0 = _QUANT_MF[qpc % 6][0]
    af = np.abs(f)
    z = (af * mf0 + 2 * off) >> (qbits + 1)
    return np.where(f < 0, -z, z)


def chroma_qp(qp_y: int, offset: int = 0) -> int:
    return _QPC_TABLE[max(0, min(51, qp_y + offset))]


# ---------------------------------------------------------------------------
# Intra prediction (§8.3). All functions take the reconstructed plane and
# the block origin; availability flags follow picture boundaries (single
# slice covering the frame — the only slice layout this codec emits or
# accepts).
# ---------------------------------------------------------------------------

# z-scan of 4x4 luma blocks within a macroblock: blkIdx -> (bx, by) in
# 4-sample units (§6.4.3).
_BLK4_POS = tuple(
    (((idx >> 2) & 1) * 2 + (idx & 1), ((idx >> 3) & 1) * 2 + ((idx >> 1) & 1))
    for idx in range(16)
)
# within-MB blkIdx whose up-right 4x4 block is not yet decoded (z-scan)
_BLK4_NO_TR = frozenset({3, 7, 11, 13, 15})


def _pred4x4(plane: np.ndarray, x: int, y: int, mode: int,
             avail_l: bool, avail_t: bool, avail_tr: bool, avail_tl: bool) -> np.ndarray:
    """§8.3.1.2 Intra_4x4 prediction, modes 0-8. ValueError when the mode's
    required neighbours are unavailable (a conforming stream never does
    this; a corrupt one errors loudly)."""
    p = np.empty((4, 4), dtype=np.int64)
    t = plane[y - 1, x : x + 4].astype(np.int64) if avail_t else None
    if avail_t:
        if avail_tr:
            tr = plane[y - 1, x + 4 : x + 8].astype(np.int64)
            if tr.shape[0] < 4:  # right picture edge: substitute t[3]
                tr = np.concatenate([tr, np.full(4 - tr.shape[0], t[3], dtype=np.int64)])
        else:
            tr = np.full(4, t[3], dtype=np.int64)
    else:
        tr = None
    lft = plane[y : y + 4, x - 1].astype(np.int64) if avail_l else None
    tl = int(plane[y - 1, x - 1]) if avail_tl else None

    if mode == 0:  # Vertical
        if t is None:
            raise ValueError("h264: vertical pred without top")
        return np.tile(t, (4, 1))
    if mode == 1:  # Horizontal
        if lft is None:
            raise ValueError("h264: horizontal pred without left")
        return np.tile(lft[:, None], (1, 4))
    if mode == 2:  # DC
        if t is not None and lft is not None:
            return np.full((4, 4), (int(t.sum()) + int(lft.sum()) + 4) >> 3, dtype=np.int64)
        if t is not None:
            return np.full((4, 4), (int(t.sum()) + 2) >> 2, dtype=np.int64)
        if lft is not None:
            return np.full((4, 4), (int(lft.sum()) + 2) >> 2, dtype=np.int64)
        return np.full((4, 4), 128, dtype=np.int64)
    if mode == 3:  # Diagonal Down-Left
        if t is None:
            raise ValueError("h264: ddl pred without top")
        e = np.concatenate([t, tr])
        for yy in range(4):
            for xx in range(4):
                if xx == 3 and yy == 3:
                    p[yy, xx] = (e[6] + 3 * e[7] + 2) >> 2
                else:
                    s = xx + yy
                    p[yy, xx] = (e[s] + 2 * e[s + 1] + e[s + 2] + 2) >> 2
        return p
    if mode == 4:  # Diagonal Down-Right
        if t is None or lft is None or tl is None:
            raise ValueError("h264: ddr pred without top+left")
        for yy in range(4):
            for xx in range(4):
                if xx > yy:
                    p[yy, xx] = (t[xx - yy - 2] + 2 * t[xx - yy - 1] + t[xx - yy] + 2) >> 2 \
                        if xx - yy >= 2 else (tl + 2 * t[0] + t[1] + 2) >> 2 \
                        if xx - yy == 1 else 0
                elif xx < yy:
                    p[yy, xx] = (lft[yy - xx - 2] + 2 * lft[yy - xx - 1] + lft[yy - xx] + 2) >> 2 \
                        if yy - xx >= 2 else (tl + 2 * lft[0] + lft[1] + 2) >> 2 \
                        if yy - xx == 1 else 0
                else:
                    p[yy, xx] = (t[0] + 2 * tl + lft[0] + 2) >> 2
        return p
    if mode == 5:  # Vertical-Right
        if t is None or lft is None or tl is None:
            raise ValueError("h264: vr pred without top+left")
        for yy in range(4):
            for xx in range(4):
                z = 2 * xx - yy
                if z >= 0 and z % 2 == 0:
                    p[yy, xx] = ((tl if xx - (yy >> 1) - 1 < 0 else t[xx - (yy >> 1) - 1])
                                 + (t[xx - (yy >> 1)]) + 1) >> 1
                elif z >= 0:
                    a = tl if xx - (yy >> 1) - 2 < 0 else t[xx - (yy >> 1) - 2]
                    b = tl if xx - (yy >> 1) - 1 < 0 else t[xx - (yy >> 1) - 1]
                    p[yy, xx] = (a + 2 * b + t[xx - (yy >> 1)] + 2) >> 2
                elif z == -1:
                    p[yy, xx] = (lft[0] + 2 * tl + t[0] + 2) >> 2
                else:
                    p[yy, xx] = (lft[yy - 2 * xx - 1] + 2 * lft[yy - 2 * xx - 2]
                                 + lft[yy - 2 * xx - 3] + 2) >> 2 \
                        if yy - 2 * xx - 3 >= 0 else (lft[yy - 2 * xx - 1]
                                                      + 2 * lft[yy - 2 * xx - 2] + tl + 2) >> 2
        return p
    if mode == 6:  # Horizontal-Down
        if t is None or lft is None or tl is None:
            raise ValueError("h264: hd pred without top+left")
        for yy in range(4):
            for xx in range(4):
                z = 2 * yy - xx
                if z >= 0 and z % 2 == 0:
                    a = tl if yy - (xx >> 1) - 1 < 0 else lft[yy - (xx >> 1) - 1]
                    p[yy, xx] = (a + lft[yy - (xx >> 1)] + 1) >> 1
                elif z >= 0:
                    a = tl if yy - (xx >> 1) - 2 < 0 else lft[yy - (xx >> 1) - 2]
                    b = tl if yy - (xx >> 1) - 1 < 0 else lft[yy - (xx >> 1) - 1]
                    p[yy, xx] = (a + 2 * b + lft[yy - (xx >> 1)] + 2) >> 2
                elif z == -1:
                    p[yy, xx] = (lft[0] + 2 * tl + t[0] + 2) >> 2
                else:
                    p[yy, xx] = (t[xx - 2 * yy - 1] + 2 * t[xx - 2 * yy - 2]
                                 + t[xx - 2 * yy - 3] + 2) >> 2 \
                        if xx - 2 * yy - 3 >= 0 else (t[xx - 2 * yy - 1]
                                                      + 2 * t[xx - 2 * yy - 2] + tl + 2) >> 2
        return p
    if mode == 7:  # Vertical-Left
        if t is None:
            raise ValueError("h264: vl pred without top")
        e = np.concatenate([t, tr])
        for yy in range(4):
            for xx in range(4):
                i = xx + (yy >> 1)
                if yy % 2 == 0:
                    p[yy, xx] = (e[i] + e[i + 1] + 1) >> 1
                else:
                    p[yy, xx] = (e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2
        return p
    if mode == 8:  # Horizontal-Up
        if lft is None:
            raise ValueError("h264: hu pred without left")
        for yy in range(4):
            for xx in range(4):
                z = xx + 2 * yy
                if z < 5 and z % 2 == 0:
                    p[yy, xx] = (lft[yy + (xx >> 1)] + lft[yy + (xx >> 1) + 1] + 1) >> 1
                elif z < 5:
                    p[yy, xx] = (lft[yy + (xx >> 1)] + 2 * lft[yy + (xx >> 1) + 1]
                                 + lft[yy + (xx >> 1) + 2] + 2) >> 2
                elif z == 5:
                    p[yy, xx] = (lft[2] + 3 * lft[3] + 2) >> 2
                else:
                    p[yy, xx] = lft[3]
        return p
    raise ValueError(f"h264: bad intra4x4 mode {mode}")


def _pred16x16(plane: np.ndarray, x: int, y: int, mode: int,
               avail_l: bool, avail_t: bool) -> np.ndarray:
    """§8.3.3 Intra_16x16 prediction: 0 V, 1 H, 2 DC, 3 Plane."""
    if mode == 0:
        if not avail_t:
            raise ValueError("h264: i16 vertical without top")
        return np.tile(plane[y - 1, x : x + 16].astype(np.int64), (16, 1))
    if mode == 1:
        if not avail_l:
            raise ValueError("h264: i16 horizontal without left")
        return np.tile(plane[y : y + 16, x - 1].astype(np.int64)[:, None], (1, 16))
    if mode == 2:
        if avail_t and avail_l:
            s = int(plane[y - 1, x : x + 16].sum()) + int(plane[y : y + 16, x - 1].sum())
            v = (s + 16) >> 5
        elif avail_t:
            v = (int(plane[y - 1, x : x + 16].sum()) + 8) >> 4
        elif avail_l:
            v = (int(plane[y : y + 16, x - 1].sum()) + 8) >> 4
        else:
            v = 128
        return np.full((16, 16), v, dtype=np.int64)
    if mode == 3:
        if not (avail_t and avail_l):
            raise ValueError("h264: i16 plane without top+left")
        t = plane[y - 1, x - 1 : x + 16].astype(np.int64)  # t[0] = top-left
        lcol = plane[y - 1 : y + 16, x - 1].astype(np.int64)  # lcol[0] = top-left
        h = sum((xx + 1) * (t[9 + xx] - t[7 - xx]) for xx in range(8))
        v = sum((yy + 1) * (lcol[9 + yy] - lcol[7 - yy]) for yy in range(8))
        a = 16 * (int(lcol[16]) + int(t[16]))
        b = (5 * h + 32) >> 6
        c = (5 * v + 32) >> 6
        yy, xx = np.mgrid[0:16, 0:16]
        return np.clip((a + b * (xx - 7) + c * (yy - 7) + 16) >> 5, 0, 255)
    raise ValueError(f"h264: bad intra16x16 mode {mode}")


def _pred_chroma8(plane: np.ndarray, x: int, y: int, mode: int,
                  avail_l: bool, avail_t: bool) -> np.ndarray:
    """§8.3.4 chroma prediction (8x8, 4:2:0): 0 DC, 1 H, 2 V, 3 Plane."""
    p = np.empty((8, 8), dtype=np.int64)
    if mode == 0:
        t = plane[y - 1, x : x + 8].astype(np.int64) if avail_t else None
        lft = plane[y : y + 8, x - 1].astype(np.int64) if avail_l else None
        for qy in (0, 4):
            for qx in (0, 4):
                ts = int(t[qx : qx + 4].sum()) if t is not None else None
                ls = int(lft[qy : qy + 4].sum()) if lft is not None else None
                if qx == qy:  # corner blocks: prefer both, else whichever
                    if ts is not None and ls is not None and qx == 0:
                        v = (ts + ls + 4) >> 3
                    elif qx == 4 and ts is not None and ls is not None:
                        v = (ts + ls + 4) >> 3
                    elif ls is not None:
                        v = (ls + 2) >> 2
                    elif ts is not None:
                        v = (ts + 2) >> 2
                    else:
                        v = 128
                elif qx == 4:  # top-right: prefer top
                    if ts is not None:
                        v = (ts + 2) >> 2
                    elif ls is not None:
                        v = (ls + 2) >> 2
                    else:
                        v = 128
                else:  # bottom-left: prefer left
                    if ls is not None:
                        v = (ls + 2) >> 2
                    elif ts is not None:
                        v = (ts + 2) >> 2
                    else:
                        v = 128
                p[qy : qy + 4, qx : qx + 4] = v
        return p
    if mode == 1:
        if not avail_l:
            raise ValueError("h264: chroma horizontal without left")
        return np.tile(plane[y : y + 8, x - 1].astype(np.int64)[:, None], (1, 8))
    if mode == 2:
        if not avail_t:
            raise ValueError("h264: chroma vertical without top")
        return np.tile(plane[y - 1, x : x + 8].astype(np.int64), (8, 1))
    if mode == 3:
        if not (avail_t and avail_l):
            raise ValueError("h264: chroma plane without top+left")
        t = plane[y - 1, x - 1 : x + 8].astype(np.int64)
        lcol = plane[y - 1 : y + 8, x - 1].astype(np.int64)
        h = sum((xx + 1) * (t[5 + xx] - t[3 - xx]) for xx in range(4))
        v = sum((yy + 1) * (lcol[5 + yy] - lcol[3 - yy]) for yy in range(4))
        a = 16 * (int(lcol[8]) + int(t[8]))
        b = (34 * h + 32) >> 6
        c = (34 * v + 32) >> 6
        yy, xx = np.mgrid[0:8, 0:8]
        return np.clip((a + b * (xx - 3) + c * (yy - 3) + 16) >> 5, 0, 255)
    raise ValueError(f"h264: bad chroma pred mode {mode}")


# ---------------------------------------------------------------------------
# Parameter sets (§7.3.2) — the fixed Baseline/I-only shape this codec
# emits; the parser accepts exactly the features the decoder implements and
# raises ValueError on anything else (loud-error contract).
# ---------------------------------------------------------------------------


def _parse_sps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    r.u(8)  # level_idc
    sps_id = r.ue()
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135):
        raise ValueError("h264: high-profile SPS not supported (baseline subset)")
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        raise ValueError("h264: poc_type 1 not supported")
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    w_mbs = r.ue() + 1
    h_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        raise ValueError("h264: interlaced streams not supported")
    r.u(1)  # direct_8x8_inference_flag
    crop = (0, 0, 0, 0)
    if r.u(1):  # frame_cropping_flag
        crop = (r.ue(), r.ue(), r.ue(), r.ue())  # left right top bottom
    r.u(1)  # vui_parameters_present_flag (ignored if absent payload)
    return {
        "sps_id": sps_id,
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type,
        "mb_width": w_mbs,
        "mb_height": h_units,
        "crop": crop,
    }


def _write_sps(mb_w: int, mb_h: int, crop: tuple[int, int, int, int]) -> bytes:
    w = _BitWriter()
    w.u(66, 8)  # profile_idc: Baseline
    w.u(0, 8)  # constraint flags / reserved
    w.u(20, 8)  # level_idc 2.0
    w.ue(0)  # sps_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type = 2 (no POC syntax anywhere)
    w.ue(0)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(0, 1)  # direct_8x8_inference
    if any(crop):
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present
    w.rbsp_trailing()
    return w.bytes()


def _parse_pps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    pps_id = r.ue()
    sps_id = r.ue()
    if r.u(1):
        raise ValueError("h264: CABAC streams not supported (CAVLC subset)")
    r.u(1)  # bottom_field_pic_order_in_frame_present
    if r.ue() != 0:
        raise ValueError("h264: slice groups (FMO) not supported")
    r.ue()  # num_ref_idx_l0_default_active_minus1
    r.ue()  # num_ref_idx_l1_default_active_minus1
    r.u(1)  # weighted_pred_flag
    r.u(2)  # weighted_bipred_idc
    init_qp = r.se() + 26
    r.se()  # pic_init_qs_minus26
    chroma_qp_offset = r.se()
    deblock_ctrl = r.u(1)
    if r.u(1):
        raise ValueError("h264: constrained_intra_pred not supported")
    r.u(1)  # redundant_pic_cnt_present
    return {
        "pps_id": pps_id,
        "sps_id": sps_id,
        "init_qp": init_qp,
        "chroma_qp_offset": chroma_qp_offset,
        "deblock_ctrl": deblock_ctrl,
    }


def _write_pps() -> bytes:
    w = _BitWriter()
    w.ue(0)  # pps_id
    w.ue(0)  # sps_id
    w.u(0, 1)  # entropy_coding_mode: CAVLC
    w.u(0, 1)  # bottom_field_pic_order_in_frame_present
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)  # num_ref_idx_l0_default_active_minus1
    w.ue(0)  # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)  # weighted_pred
    w.u(0, 2)  # weighted_bipred_idc
    w.se(0)  # pic_init_qp_minus26
    w.se(0)  # pic_init_qs_minus26
    w.se(0)  # chroma_qp_index_offset
    w.u(1, 1)  # deblocking_filter_control_present
    w.u(0, 1)  # constrained_intra_pred
    w.u(0, 1)  # redundant_pic_cnt_present
    w.rbsp_trailing()
    return w.bytes()


# coded_block_pattern me(v) mapping for Intra_4x4 (Table 9-4 column 1):
# codeNum -> cbp
_CBP_INTRA = (
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
)
_CBP_INTRA_INV = {cbp: code for code, cbp in enumerate(_CBP_INTRA)}


class _FrameState:
    """Per-frame reconstruction state shared by decode and the encoder's
    local reconstruction loop: padded planes, per-4x4 nnz grids (luma +
    both chroma planes), and the intra-4x4 mode grid used for pred-mode
    prediction."""

    def __init__(self, mb_w: int, mb_h: int):
        self.mb_w, self.mb_h = mb_w, mb_h
        self.y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.int64)
        self.cb = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int64)
        self.cr = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int64)
        self.nnz_y = np.zeros((mb_h * 4, mb_w * 4), dtype=np.int64)
        self.nnz_cb = np.zeros((mb_h * 2, mb_w * 2), dtype=np.int64)
        self.nnz_cr = np.zeros((mb_h * 2, mb_w * 2), dtype=np.int64)
        # intra-4x4 pred mode per 4x4 block; -1 = "not an I_4x4 block"
        self.modes = np.full((mb_h * 4, mb_w * 4), -1, dtype=np.int64)

    def luma_nc(self, gx: int, gy: int) -> int:
        nA = int(self.nnz_y[gy, gx - 1]) if gx > 0 else None
        nB = int(self.nnz_y[gy - 1, gx]) if gy > 0 else None
        if nA is not None and nB is not None:
            return (nA + nB + 1) >> 1
        if nA is not None:
            return nA
        if nB is not None:
            return nB
        return 0

    def chroma_nc(self, grid: np.ndarray, gx: int, gy: int) -> int:
        nA = int(grid[gy, gx - 1]) if gx > 0 else None
        nB = int(grid[gy - 1, gx]) if gy > 0 else None
        if nA is not None and nB is not None:
            return (nA + nB + 1) >> 1
        if nA is not None:
            return nA
        if nB is not None:
            return nB
        return 0

    def pred_mode4(self, gx: int, gy: int) -> int:
        """predIntra4x4PredMode (§8.3.1.1): min of the left/up blocks'
        modes, DC (2) when a neighbour is unavailable or not I_4x4."""
        a = int(self.modes[gy, gx - 1]) if gx > 0 else -1
        b = int(self.modes[gy - 1, gx]) if gy > 0 else -1
        a = 2 if a < 0 else a
        b = 2 if b < 0 else b
        return min(a, b)


def _scan_to_block(coeffs: list[int], start: int = 0) -> np.ndarray:
    """Zigzag scan positions start..15 -> 4x4 raster block."""
    blk = np.zeros(16, dtype=np.int64)
    for s, c in enumerate(coeffs):
        blk[_ZIGZAG4[start + s]] = c
    return blk.reshape(4, 4)


def _block_to_scan(blk: np.ndarray, start: int = 0) -> list[int]:
    flat = blk.reshape(16)
    return [int(flat[_ZIGZAG4[s]]) for s in range(start, 16)]


# ---------------------------------------------------------------------------
# Decoder (I slice, CAVLC)
# ---------------------------------------------------------------------------


def _decode_macroblock(r: _BitReader, st: _FrameState, mbx: int, mby: int,
                       qp: int, chroma_qp_offset: int) -> int:
    """Parse + reconstruct one macroblock; returns the (possibly updated)
    luma QP for the next MB."""
    mb_type = r.ue()
    x0, y0 = mbx * 16, mby * 16
    cx0, cy0 = mbx * 8, mby * 8
    gx0, gy0 = mbx * 4, mby * 4
    avail_l = mbx > 0
    avail_t = mby > 0

    if mb_type == 25:  # I_PCM
        r.byte_align()
        for yy in range(16):
            for xx in range(16):
                st.y[y0 + yy, x0 + xx] = r.u(8)
        for plane in (st.cb, st.cr):
            for yy in range(8):
                for xx in range(8):
                    plane[cy0 + yy, cx0 + xx] = r.u(8)
        st.nnz_y[gy0 : gy0 + 4, gx0 : gx0 + 4] = 16
        st.nnz_cb[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
        st.nnz_cr[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
        st.modes[gy0 : gy0 + 4, gx0 : gx0 + 4] = -1
        return qp

    if mb_type == 0:  # I_4x4
        modes = []
        for blk in range(16):
            bx, by = _BLK4_POS[blk]
            pred = st.pred_mode4(gx0 + bx, gy0 + by)
            if r.u(1):  # prev_intra4x4_pred_mode_flag
                mode = pred
            else:
                rem = r.u(3)
                mode = rem if rem < pred else rem + 1
            modes.append(mode)
            st.modes[gy0 + by, gx0 + bx] = mode
        chroma_mode = r.ue()
        if chroma_mode > 3:
            raise ValueError("h264: bad intra_chroma_pred_mode")
        code = r.ue()
        if code >= len(_CBP_INTRA):
            raise ValueError("h264: bad coded_block_pattern code")
        cbp = _CBP_INTRA[code]
        if cbp:
            qp = (qp + r.se() + 52) % 52
        # --- parse luma residuals (blkIdx order; nnz grid drives nC) ---
        luma_coeffs: list[list[int] | None] = [None] * 16
        for blk in range(16):
            bx, by = _BLK4_POS[blk]
            if cbp & (1 << (blk // 4)):
                nc = st.luma_nc(gx0 + bx, gy0 + by)
                coeffs = decode_residual_block(r, nc, 16)
                luma_coeffs[blk] = coeffs
                st.nnz_y[gy0 + by, gx0 + bx] = sum(1 for c in coeffs if c)
            else:
                st.nnz_y[gy0 + by, gx0 + bx] = 0
        chroma = _parse_chroma_residual(r, st, mbx, mby, cbp >> 4)
        # --- reconstruct luma block-by-block (z order) ---
        for blk in range(16):
            bx, by = _BLK4_POS[blk]
            x, y = x0 + bx * 4, y0 + by * 4
            a_l = (bx > 0) or avail_l
            a_t = (by > 0) or avail_t
            a_tl = a_l and a_t
            if by == 0:
                a_tr = avail_t if bx < 3 else (avail_t and mbx + 1 < st.mb_w)
            else:
                a_tr = (bx < 3) and (blk not in _BLK4_NO_TR)
            predb = _pred4x4(st.y, x, y, modes[blk], a_l, a_t, a_tr, a_tl)
            if luma_coeffs[blk] is not None:
                res = inverse_transform4(dequantize4(_scan_to_block(luma_coeffs[blk]), qp))
            else:
                res = 0
            st.y[y : y + 4, x : x + 4] = np.clip(predb + res, 0, 255)
        _recon_chroma(st, mbx, mby, chroma_mode, chroma, qp, chroma_qp_offset,
                      avail_l, avail_t)
        return qp

    if 1 <= mb_type <= 24:  # I_16x16
        pm = (mb_type - 1) % 4
        cbp_chroma = ((mb_type - 1) // 4) % 3
        cbp_luma = 15 if mb_type - 1 >= 12 else 0
        chroma_mode = r.ue()
        if chroma_mode > 3:
            raise ValueError("h264: bad intra_chroma_pred_mode")
        qp = (qp + r.se() + 52) % 52
        # luma DC (16 coeffs; nC = neighbours of blk 0)
        dc_scan = decode_residual_block(r, st.luma_nc(gx0, gy0), 16)
        ac_coeffs: list[list[int] | None] = [None] * 16
        for blk in range(16):
            bx, by = _BLK4_POS[blk]
            if cbp_luma:
                nc = st.luma_nc(gx0 + bx, gy0 + by)
                coeffs = decode_residual_block(r, nc, 15)
                ac_coeffs[blk] = coeffs
                st.nnz_y[gy0 + by, gx0 + bx] = sum(1 for c in coeffs if c)
            else:
                st.nnz_y[gy0 + by, gx0 + bx] = 0
        chroma = _parse_chroma_residual(r, st, mbx, mby, cbp_chroma)
        st.modes[gy0 : gy0 + 4, gx0 : gx0 + 4] = -1
        # --- reconstruct ---
        predb = _pred16x16(st.y, x0, y0, pm, avail_l, avail_t)
        dc = luma_dc_dequant(_scan_to_block(dc_scan), qp)
        out = np.empty((16, 16), dtype=np.int64)
        for blk in range(16):
            bx, by = _BLK4_POS[blk]
            d = dequantize4(_scan_to_block(ac_coeffs[blk], start=1) if ac_coeffs[blk] else np.zeros((4, 4), dtype=np.int64), qp)
            d[0, 0] = dc[by, bx]
            res = inverse_transform4(d)
            out[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = res
        st.y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(predb + out, 0, 255)
        _recon_chroma(st, mbx, mby, chroma_mode, chroma, qp, chroma_qp_offset,
                      avail_l, avail_t)
        return qp

    raise ValueError(f"h264: unsupported mb_type {mb_type} (I slice)")


def _parse_chroma_residual(r: _BitReader, st: _FrameState, mbx: int, mby: int,
                           cbp_chroma: int):
    """residual() chroma part (§7.3.5.3.3): both DC blocks (Cb, Cr), then
    Cb's four AC blocks, then Cr's. Updates chroma nnz grids (AC counts
    only). Returns (dc_cb, dc_cr, ac_cb, ac_cr) scan lists."""
    dc = [[0] * 4, [0] * 4]
    ac: list[list[list[int] | None]] = [[None] * 4, [None] * 4]
    if cbp_chroma >= 1:
        for ci in range(2):
            dc[ci] = decode_residual_block(r, -1, 4)
    for ci, grid in ((0, st.nnz_cb), (1, st.nnz_cr)):
        for blk in range(4):
            bx, by = blk % 2, blk // 2
            gx, gy = mbx * 2 + bx, mby * 2 + by
            if cbp_chroma == 2:
                nc = st.chroma_nc(grid, gx, gy)
                coeffs = decode_residual_block(r, nc, 15)
                ac[ci][blk] = coeffs
                grid[gy, gx] = sum(1 for c in coeffs if c)
            else:
                grid[gy, gx] = 0
    return dc, ac


def _recon_chroma(st: _FrameState, mbx: int, mby: int, chroma_mode: int,
                  chroma, qp: int, chroma_qp_offset: int,
                  avail_l: bool, avail_t: bool) -> None:
    dc, ac = chroma
    qpc = chroma_qp(qp, chroma_qp_offset)
    cx0, cy0 = mbx * 8, mby * 8
    for ci, plane in ((0, st.cb), (1, st.cr)):
        predb = _pred_chroma8(plane, cx0, cy0, chroma_mode, avail_l, avail_t)
        dcm = chroma_dc_dequant(np.array(dc[ci], dtype=np.int64).reshape(2, 2), qpc)
        out = np.empty((8, 8), dtype=np.int64)
        for blk in range(4):
            bx, by = blk % 2, blk // 2
            coeffs = ac[ci][blk]
            d = dequantize4(_scan_to_block(coeffs, start=1) if coeffs else np.zeros((4, 4), dtype=np.int64), qpc)
            d[0, 0] = dcm[by, bx]
            out[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = inverse_transform4(d)
        plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(predb + out, 0, 255)


def _decode_slice(rbsp: bytes, sps: dict, pps: dict) -> _FrameState:
    r = _BitReader(rbsp)
    first_mb = r.ue()
    if first_mb != 0:
        raise ValueError("h264: multi-slice frames not supported")
    slice_type = r.ue()
    if slice_type % 5 != 2:
        raise ValueError(f"h264: only I slices supported (slice_type {slice_type})")
    if r.ue() != pps["pps_id"]:
        raise ValueError("h264: slice references unknown PPS")
    r.u(sps["log2_max_frame_num"])  # frame_num
    # IDR: idr_pic_id
    r.ue()
    if sps["poc_type"] == 0:
        raise ValueError("h264: poc_type 0 slice headers not supported")
    # dec_ref_pic_marking (IDR): no_output_of_prior_pics, long_term_reference
    r.u(1)
    r.u(1)
    qp = pps["init_qp"] + r.se()
    if pps["deblock_ctrl"]:
        if r.ue() != 1:
            raise ValueError(
                "h264: in-loop deblocking requested; this decoder only "
                "accepts streams with the filter disabled"
            )
    st = _FrameState(sps["mb_width"], sps["mb_height"])
    for mby in range(st.mb_h):
        for mbx in range(st.mb_w):
            qp = _decode_macroblock(r, st, mbx, mby, qp, pps["chroma_qp_offset"])
    return st


# ---------------------------------------------------------------------------
# Encoder (fixture-grade, spec-compliant syntax; runs the decoder's exact
# reconstruction arithmetic as its local loop)
# ---------------------------------------------------------------------------


def _mode_available(mode: int, a_l: bool, a_t: bool, a_tl: bool) -> bool:
    if mode == 2:
        return True
    if mode in (0, 3, 7):
        return a_t
    if mode in (1, 8):
        return a_l
    return a_l and a_t and a_tl  # 4, 5, 6


def _encode_macroblock(w: _BitWriter, st: _FrameState, mbx: int, mby: int,
                       qp: int, chroma_qp_offset: int,
                       sy: np.ndarray, scb: np.ndarray, scr: np.ndarray,
                       kind: str, luma_mode: int, i16_mode: int,
                       chroma_pref: int) -> None:
    x0, y0 = mbx * 16, mby * 16
    cx0, cy0 = mbx * 8, mby * 8
    gx0, gy0 = mbx * 4, mby * 4
    avail_l, avail_t = mbx > 0, mby > 0
    qpc = chroma_qp(qp, chroma_qp_offset)

    if kind == "pcm":
        w.ue(25)
        while len(w.bits) % 8:
            w.u(0, 1)  # pcm_alignment_zero_bit
        for yy in range(16):
            for xx in range(16):
                v = int(sy[y0 + yy, x0 + xx])
                w.u(v, 8)
                st.y[y0 + yy, x0 + xx] = v
        for src, dst in ((scb, st.cb), (scr, st.cr)):
            for yy in range(8):
                for xx in range(8):
                    v = int(src[cy0 + yy, cx0 + xx])
                    w.u(v, 8)
                    dst[cy0 + yy, cx0 + xx] = v
        st.nnz_y[gy0 : gy0 + 4, gx0 : gx0 + 4] = 16
        st.nnz_cb[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
        st.nnz_cr[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 16
        st.modes[gy0 : gy0 + 4, gx0 : gx0 + 4] = -1
        return

    # ---- chroma analysis (shared by both intra kinds) ----
    chroma_mode = chroma_pref
    if chroma_mode in (1, 3) and not avail_l:
        chroma_mode = 0
    if chroma_mode in (2, 3) and not avail_t:
        chroma_mode = 0
    dc_q = []
    ac_q: list[list[list[int] | None]] = []
    for plane_src, plane_rec in ((scb, st.cb), (scr, st.cr)):
        predb = _pred_chroma8(plane_rec, cx0, cy0, chroma_mode, avail_l, avail_t)
        res = plane_src[cy0 : cy0 + 8, cx0 : cx0 + 8].astype(np.int64) - predb
        wblocks = []
        for blk in range(4):
            bx, by = blk % 2, blk // 2
            wblocks.append(forward_transform4(res[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4]))
        dcs = np.array([[wblocks[0][0, 0], wblocks[1][0, 0]],
                        [wblocks[2][0, 0], wblocks[3][0, 0]]], dtype=np.int64)
        dq = chroma_dc_quant(dcs, qpc)
        dc_q.append([int(dq[0, 0]), int(dq[0, 1]), int(dq[1, 0]), int(dq[1, 1])])
        acs: list[list[int] | None] = []
        for blk in range(4):
            z = quantize4(wblocks[blk], qpc)
            z[0, 0] = 0
            acs.append(_block_to_scan(z, start=1))
        ac_q.append(acs)
    any_dc = any(any(d) for d in dc_q)
    any_ac = any(any(c) for plane in ac_q for c in plane if c)
    cbp_chroma = 2 if any_ac else (1 if any_dc else 0)

    if kind == "i16x16":
        pm = i16_mode
        if pm == 0 and not avail_t:
            pm = 2
        elif pm == 1 and not avail_l:
            pm = 2
        elif pm == 3 and not (avail_l and avail_t):
            pm = 2
        predb = _pred16x16(st.y, x0, y0, pm, avail_l, avail_t)
        res = sy[y0 : y0 + 16, x0 : x0 + 16].astype(np.int64) - predb
        wblocks = [None] * 16
        dcs = np.zeros((4, 4), dtype=np.int64)
        for blk in range(16):
            bx, by = _BLK4_POS[blk]
            wb = forward_transform4(res[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4])
            wblocks[blk] = wb
            dcs[by, bx] = wb[0, 0]
        dc_z = luma_dc_quant(dcs, qp)
        ac_z = []
        for blk in range(16):
            z = quantize4(wblocks[blk], qp)
            z[0, 0] = 0
            ac_z.append(_block_to_scan(z, start=1))
        cbp_luma = 15 if any(any(c) for c in ac_z) else 0
        mb_type = 1 + pm + 4 * cbp_chroma + (12 if cbp_luma else 0)
        w.ue(mb_type)
        w.ue(chroma_mode)
        w.se(0)  # mb_qp_delta
        encode_residual_block(w, _block_to_scan(dc_z), st.luma_nc(gx0, gy0), 16)
        for blk in range(16):
            bx, by = _BLK4_POS[blk]
            if cbp_luma:
                nc = st.luma_nc(gx0 + bx, gy0 + by)
                encode_residual_block(w, ac_z[blk], nc, 15)
                st.nnz_y[gy0 + by, gx0 + bx] = sum(1 for c in ac_z[blk] if c)
            else:
                st.nnz_y[gy0 + by, gx0 + bx] = 0
        _emit_chroma_residual(w, st, mbx, mby, cbp_chroma, dc_q, ac_q)
        st.modes[gy0 : gy0 + 4, gx0 : gx0 + 4] = -1
        # reconstruction — decoder arithmetic
        dc = luma_dc_dequant(_scan_to_block(_block_to_scan(dc_z)), qp)
        out = np.empty((16, 16), dtype=np.int64)
        for blk in range(16):
            bx, by = _BLK4_POS[blk]
            d = dequantize4(_scan_to_block(ac_z[blk], start=1) if cbp_luma else np.zeros((4, 4), dtype=np.int64), qp)
            d[0, 0] = dc[by, bx]
            out[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = inverse_transform4(d)
        st.y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(predb + out, 0, 255)
        _recon_chroma(st, mbx, mby, chroma_mode,
                      (dc_q, [[c if cbp_chroma == 2 else None for c in plane] for plane in ac_q]),
                      qp, chroma_qp_offset, avail_l, avail_t)
        return

    # ---- I_4x4 ----
    modes = []
    coeffs_all: list[list[int]] = []
    pred_syntax = []
    # sequential per-block: choose mode, quantize, reconstruct
    for blk in range(16):
        bx, by = _BLK4_POS[blk]
        x, y = x0 + bx * 4, y0 + by * 4
        a_l = (bx > 0) or avail_l
        a_t = (by > 0) or avail_t
        a_tl = a_l and a_t
        if by == 0:
            a_tr = avail_t if bx < 3 else (avail_t and mbx + 1 < st.mb_w)
        else:
            a_tr = (bx < 3) and (blk not in _BLK4_NO_TR)
        mode = luma_mode if _mode_available(luma_mode, a_l, a_t, a_tl) else 2
        pred = st.pred_mode4(gx0 + bx, gy0 + by)
        pred_syntax.append((mode == pred, mode if mode < pred else mode - 1))
        modes.append(mode)
        st.modes[gy0 + by, gx0 + bx] = mode
        predb = _pred4x4(st.y, x, y, mode, a_l, a_t, a_tr, a_tl)
        res = sy[y : y + 4, x : x + 4].astype(np.int64) - predb
        z = quantize4(forward_transform4(res), qp)
        coeffs_all.append(_block_to_scan(z))
        # reconstruct NOW (later blocks predict from these samples)
        rec = inverse_transform4(dequantize4(_scan_to_block(coeffs_all[blk]), qp))
        st.y[y : y + 4, x : x + 4] = np.clip(predb + rec, 0, 255)
    cbp_luma_bits = 0
    for i8 in range(4):
        if any(any(coeffs_all[i8 * 4 + s]) for s in range(4)):
            cbp_luma_bits |= 1 << i8
    cbp = cbp_luma_bits | (cbp_chroma << 4)
    # emit
    w.ue(0)  # mb_type I_4x4
    for prev_flag, rem in pred_syntax:
        if prev_flag:
            w.u(1, 1)
        else:
            w.u(0, 1)
            w.u(rem, 3)
    w.ue(chroma_mode)
    w.ue(_CBP_INTRA_INV[cbp])
    if cbp:
        w.se(0)  # mb_qp_delta
    for blk in range(16):
        bx, by = _BLK4_POS[blk]
        if cbp & (1 << (blk // 4)):
            nc = st.luma_nc(gx0 + bx, gy0 + by)
            encode_residual_block(w, coeffs_all[blk], nc, 16)
            st.nnz_y[gy0 + by, gx0 + bx] = sum(1 for c in coeffs_all[blk] if c)
        else:
            # decoder forces these to zero; the recon above already used
            # the quantized coefficients, which ARE all zero here (the cbp
            # bit is derived, never clamped)
            st.nnz_y[gy0 + by, gx0 + bx] = 0
    _emit_chroma_residual(w, st, mbx, mby, cbp_chroma, dc_q, ac_q)
    _recon_chroma(st, mbx, mby, chroma_mode,
                  (dc_q if cbp_chroma >= 1 else [[0] * 4, [0] * 4],
                   [[c if cbp_chroma == 2 else None for c in plane] for plane in ac_q]),
                  qp, chroma_qp_offset, avail_l, avail_t)


def _emit_chroma_residual(w: _BitWriter, st: _FrameState, mbx: int, mby: int,
                          cbp_chroma: int, dc_q, ac_q) -> None:
    if cbp_chroma >= 1:
        for ci in range(2):
            encode_residual_block(w, dc_q[ci], -1, 4)
    for ci, grid in ((0, st.nnz_cb), (1, st.nnz_cr)):
        for blk in range(4):
            bx, by = blk % 2, blk // 2
            gx, gy = mbx * 2 + bx, mby * 2 + by
            if cbp_chroma == 2:
                nc = st.chroma_nc(grid, gx, gy)
                encode_residual_block(w, ac_q[ci][blk], nc, 15)
                grid[gy, gx] = sum(1 for c in ac_q[ci][blk] if c)
            else:
                grid[gy, gx] = 0


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr420(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full-range BT.601 RGB -> Y'CbCr with 2x2 box-averaged chroma (the
    same matrix the JPEG codec uses)."""
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    h, w = y.shape
    cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    to8 = lambda p: np.clip(np.round(p), 0, 255).astype(np.int64)  # noqa: E731
    return to8(y), to8(cb), to8(cr)


def _ycbcr420_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cbu = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1).astype(np.float64) - 128.0
    cru = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1).astype(np.float64) - 128.0
    yf = y.astype(np.float64)
    r = yf + 1.402 * cru
    g = yf - 0.344136 * cbu - 0.714136 * cru
    b = yf + 1.772 * cbu
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _pad_to(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    ph, pw = h - plane.shape[0], w - plane.shape[1]
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _nal(nal_type: int, rbsp: bytes, ref_idc: int = 3) -> bytes:
    return b"\x00\x00\x00\x01" + bytes([(ref_idc << 5) | nal_type]) + rbsp_to_ebsp(rbsp)


def h264_encode_annexb(
    frames: list[np.ndarray],
    qp: int = 28,
    mode: str = "i4x4",
    luma_mode: int = 2,
    i16_mode: int = 2,
    chroma_mode: int = 0,
    with_recon: bool = False,
):
    """Encode RGB frames as an Annex B H.264 byte stream (Baseline, CAVLC,
    all-IDR). ``mode``: "i4x4" | "i16x16" | "pcm" | "mixed" (cycles all
    three per MB). ``luma_mode`` (0-8) / ``i16_mode`` (0-3) /
    ``chroma_mode`` (0-3) pick the intra prediction; blocks whose required
    neighbours are unavailable fall back to DC, exactly as signalled.
    ``with_recon=True`` additionally returns the encoder's reconstruction
    (what a conforming decoder must output, bit-exactly).
    Even width/height required (4:2:0 chroma siting + crop-unit 2)."""
    if not frames:
        raise ValueError("h264: no frames")
    if not 0 <= qp <= 51:
        raise ValueError("h264: qp out of range")
    if mode not in ("i4x4", "i16x16", "pcm", "mixed"):
        raise ValueError(f"h264: bad mode {mode!r}")
    h, w = frames[0].shape[:2]
    if h % 2 or w % 2:
        raise ValueError("h264: frame dimensions must be even (4:2:0)")
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    crop = (0, (mb_w * 16 - w) // 2, 0, (mb_h * 16 - h) // 2)  # l r t b
    out = bytearray()
    out += _nal(7, _write_sps(mb_w, mb_h, crop))
    out += _nal(8, _write_pps())
    recon = []
    for fi, frame in enumerate(frames):
        if frame.shape[:2] != (h, w):
            raise ValueError("h264: all frames must share dimensions")
        y, cb, cr = _rgb_to_ycbcr420(np.asarray(frame, dtype=np.uint8))
        sy = _pad_to(y, mb_h * 16, mb_w * 16)
        scb = _pad_to(cb, mb_h * 8, mb_w * 8)
        scr = _pad_to(cr, mb_h * 8, mb_w * 8)
        st = _FrameState(mb_w, mb_h)
        wtr = _BitWriter()
        # slice header (IDR, I slice, poc_type 2)
        wtr.ue(0)  # first_mb_in_slice
        wtr.ue(7)  # slice_type: I (all slices in picture)
        wtr.ue(0)  # pps_id
        wtr.u(0, 4)  # frame_num (log2_max_frame_num == 4)
        wtr.ue(fi % 2)  # idr_pic_id (alternates between IDRs)
        wtr.u(0, 1)  # no_output_of_prior_pics
        wtr.u(0, 1)  # long_term_reference
        wtr.se(qp - 26)  # slice_qp_delta (pic_init_qp == 26)
        wtr.ue(1)  # disable_deblocking_filter_idc = 1 (off)
        for mby in range(mb_h):
            for mbx in range(mb_w):
                if mode == "mixed":
                    kind = ("i4x4", "i16x16", "pcm")[(mbx + mby) % 3]
                else:
                    kind = mode
                _encode_macroblock(wtr, st, mbx, mby, qp, 0, sy, scb, scr,
                                   kind, luma_mode, i16_mode, chroma_mode)
        wtr.rbsp_trailing()
        out += _nal(5, wtr.bytes())
        if with_recon:
            recon.append(_state_to_rgb(st, h, w))
    return (bytes(out), recon) if with_recon else bytes(out)


def _state_to_rgb(st: _FrameState, h: int, w: int) -> np.ndarray:
    y = st.y[:h, :w]
    cb = st.cb[: h // 2, : w // 2]
    cr = st.cr[: h // 2, : w // 2]
    return _ycbcr420_to_rgb(y, cb, cr)


def h264_decode_annexb(payload: bytes) -> list[np.ndarray]:
    """Decode an Annex B H.264 byte stream (Baseline I-frame subset — see
    module docstring) to a list of RGB uint8 frames. ValueError on any
    feature outside the subset."""
    sps = pps = None
    frames = []
    for nal in split_annexb(payload):
        if not nal:
            continue
        hdr = nal[0]
        if hdr & 0x80:
            raise ValueError("h264: forbidden_zero_bit set")
        typ = hdr & 0x1F
        rbsp = ebsp_to_rbsp(nal[1:])
        if typ == 7:
            sps = _parse_sps(rbsp)
        elif typ == 8:
            pps = _parse_pps(rbsp)
        elif typ == 5:
            if sps is None or pps is None:
                raise ValueError("h264: IDR slice before SPS/PPS")
            st = _decode_slice(rbsp, sps, pps)
            cl, cr_, ct, cb_ = sps["crop"]
            h = st.mb_h * 16 - 2 * (ct + cb_)
            w = st.mb_w * 16 - 2 * (cl + cr_)
            y = st.y[2 * ct : 2 * ct + h, 2 * cl : 2 * cl + w]
            cbp = st.cb[ct : ct + h // 2, cl : cl + w // 2]
            crp = st.cr[ct : ct + h // 2, cl : cl + w // 2]
            frames.append(_ycbcr420_to_rgb(y, cbp, crp))
        elif typ == 1:
            raise ValueError("h264: non-IDR slices not supported (I-frame subset)")
        elif typ in (6, 9, 12):
            continue  # SEI / AUD / filler
        else:
            raise ValueError(f"h264: unsupported NAL type {typ}")
    if not frames:
        raise ValueError("h264: no IDR frames in stream")
    return frames


def h264_probe(payload: bytes) -> dict:
    """Cheap stream metadata from the SPS alone: width/height (cropped),
    n_idr (count of IDR NALs), profile 'baseline-cavlc-i'."""
    sps = None
    n_idr = 0
    for nal in split_annexb(payload):
        if not nal:
            continue
        typ = nal[0] & 0x1F
        if typ == 7 and sps is None:
            sps = _parse_sps(ebsp_to_rbsp(nal[1:]))
        elif typ == 5:
            n_idr += 1
    if sps is None:
        raise ValueError("h264: no SPS")
    cl, cr_, ct, cb_ = sps["crop"]
    return {
        "width": sps["mb_width"] * 16 - 2 * (cl + cr_),
        "height": sps["mb_height"] * 16 - 2 * (ct + cb_),
        "n_idr": n_idr,
        "codec": "h264-baseline-cavlc-i",
    }


def h264_decode_frames_at(payload: bytes, indices: list[int]) -> list[np.ndarray]:
    """Decode only the given frame indices of an Annex B stream. Every
    frame in this subset is an IDR (random access), so a strided
    thumbnail/sample pass never pays for the full clip."""
    sps = pps = None
    slices: list[tuple[dict, dict, bytes]] = []
    for nal in split_annexb(payload):
        if not nal:
            continue
        typ = nal[0] & 0x1F
        if typ == 7:
            sps = _parse_sps(ebsp_to_rbsp(nal[1:]))
        elif typ == 8:
            pps = _parse_pps(ebsp_to_rbsp(nal[1:]))
        elif typ == 5:
            if sps is None or pps is None:
                raise ValueError("h264: IDR slice before SPS/PPS")
            slices.append((sps, pps, ebsp_to_rbsp(nal[1:])))
    out = []
    for i in indices:
        if not 0 <= i < len(slices):
            raise ValueError("h264: frame index out of range")
        s, p, rbsp = slices[i]
        st = _decode_slice(rbsp, s, p)
        cl, cr_, ct, cb_ = s["crop"]
        h = st.mb_h * 16 - 2 * (ct + cb_)
        w = st.mb_w * 16 - 2 * (cl + cr_)
        out.append(_ycbcr420_to_rgb(
            st.y[2 * ct : 2 * ct + h, 2 * cl : 2 * cl + w],
            st.cb[ct : ct + h // 2, cl : cl + w // 2],
            st.cr[ct : ct + h // 2, cl : cl + w // 2],
        ))
    return out
