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
