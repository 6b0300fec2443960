"""Pure-numpy baseline JPEG (JFIF) codec — public-spec implementation
(ITU-T T.81 baseline sequential DCT, Annex K quantization/Huffman
tables; JFIF 1.01 container).  No image libraries exist in this
environment, so this retires the jpeg leg of the multimodal decode
stub: `operators/images.decode_any` routes fmt="jpeg" here.

Scope: baseline (SOF0/SOF1) 8-bit, 1 or 3 components, sampling factors
1 or 2 (4:4:4 / 4:2:2 / 4:2:0), optional restart intervals.  The
encoder emits 4:4:4 with quality-scaled Annex K tables.  Progressive
(SOF2) raises NotImplementedError.

Performance note: DCT/IDCT, color transforms, quantization and zigzag
are vectorized numpy over all blocks at once; only the entropy
(Huffman) layer is a per-symbol Python loop, inherent to a pure-Python
bitstream codec.  The operators run it per image inside Arrow-batched
``mapInPandas``, so the cost is distributed and bounded by image size.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# --------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# K.1 luminance / K.2 chrominance quantization tables (natural order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# 8x8 DCT-II basis matrix (orthonormal)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * \
            (np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8))


def _quality_tables(quality: int) -> Tuple[np.ndarray, np.ndarray]:
    """IJG-style quality scaling of the Annex K tables (public libjpeg
    formula: scale = 5000/Q below 50 else 200-2Q)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for t in (QUANT_LUMA, QUANT_CHROMA):
        s = (t * scale + 50) // 100
        out.append(np.clip(s, 1, 255).astype(np.int64))
    return out[0], out[1]


# --------------------------------------------------------------------------
# Huffman code construction (T.81 Annex C)
# --------------------------------------------------------------------------

def _build_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical decode tables (T.81 F.2.2.3: MINCODE/MAXCODE/VALPTR)."""

    def __init__(self, bits: List[int], vals: List[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            else:
                self.maxcode[length] = -1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = reader.read_bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("jpeg: invalid Huffman code")
            code = (code << 1) | reader.read_bit()
        return self.vals[self.valptr[length] + code - self.mincode[length]]


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t raw bits to a signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# --------------------------------------------------------------------------
# bit I/O with 0xFF stuffing
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing (B.1.1.5)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s

    def restart(self, n: int) -> None:
        """Byte-align and emit RSTn (B.2.1.2)."""
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # pending marker hit mid-stream

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.marker is not None:
                # past a marker: T.81 fills with 1s (F.2.2.5 note)
                return 1
            if self.pos >= len(self.data):
                return 1
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed FF
                else:
                    self.marker = nxt
                    return 1
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_take_marker(self) -> int:
        """Consume the pending RST marker at a restart boundary."""
        self.nbits = 0
        if self.marker is not None:
            m = self.marker
            self.marker = None
            # read_bit latched the code byte without consuming it;
            # step past it so the next block doesn't re-read the RSTn
            # code as entropy data
            self.pos += 1
            return m
        # marker not yet scanned: it must be next in the byte stream
        while self.pos < len(self.data) - 1:
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = self.data[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        raise ValueError("jpeg: expected restart marker")


# --------------------------------------------------------------------------
# block transforms (vectorized over all blocks)
# --------------------------------------------------------------------------

def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (n_blocks, 8, 8) in raster block order; H, W % 8 == 0."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
                 .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (blocks.reshape(h // 8, w // 8, 8, 8)
                  .transpose(0, 2, 1, 3).reshape(h, w))


def _dct2(blocks: np.ndarray) -> np.ndarray:
    return _C @ blocks @ _C.T


def _idct2(blocks: np.ndarray) -> np.ndarray:
    return _C.T @ blocks @ _C


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    px = px.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _encode_block(zz: np.ndarray, pred: int, dc_codes, ac_codes,
                  bw: _BitWriter) -> int:
    """One zigzagged quantized block -> entropy bits; returns new DC pred."""
    dc = int(zz[0])
    diff = dc - pred
    t = int(diff).bit_length() if diff != 0 else 0
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k]) if k <= last_nz else 0
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]  # ZRL
            bw.write(c, l)
            run -= 16
        s = int(abs(v)).bit_length()
        c, l = ac_codes[(run << 4) | s]
        bw.write(c, l)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, l = ac_codes[0x00]  # EOB
        bw.write(c, l)
    return dc


def _comp_zigzag(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H, W) level-shifted-input plane -> (n_blocks, 64) quantized
    zigzag coefficients (vectorized DCT over all blocks)."""
    coef = _dct2(_blockify(plane - 128.0))
    quant = np.round(coef / qtab.reshape(8, 8)).astype(np.int64)
    return quant.reshape(-1, 64)[:, ZIGZAG]


def encode_jpeg(pixels: np.ndarray, quality: int = 85,
                subsample: str = "444", restart_interval: int = 0) -> bytes:
    """Baseline JFIF encode.

    * (H, W, 3) uint8 RGB -> 3-component YCbCr, ``subsample`` "444"
      (1x1) or "420" (2x2 luma MCUs, chroma at quarter resolution via
      2x2 block mean).
    * (H, W) uint8 -> single-component grayscale.
    * ``restart_interval`` > 0 emits DRI + RSTn markers every that
      many MCUs (exercises the decoder's restart path).
    """
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    qy, qc = _quality_tables(quality)

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if gray:
        sampling = [(1, 1)]
        comps_meta = [(1, 0)]
    elif subsample == "420":
        sampling = [(2, 2), (1, 1), (1, 1)]
        comps_meta = [(1, 0), (2, 1), (3, 1)]
    elif subsample == "444":
        sampling = [(1, 1), (1, 1), (1, 1)]
        comps_meta = [(1, 0), (2, 1), (3, 1)]
    else:
        raise ValueError(f"unsupported subsampling {subsample!r}")
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    if gray:
        planes = [pixels.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        planes = [ycc[..., i] for i in range(3)]

    comp_zz = []
    comp_bw = []
    for ci, (sh, sv) in enumerate(sampling):
        tgt_h = mcuy * sv * 8
        tgt_w = mcux * sh * 8
        p = planes[ci]
        if (sh, sv) != (hmax, vmax):
            # chroma downsample by block mean over the sampling ratio
            ry, rx = vmax // sv, hmax // sh
            full_h = (h + ry - 1) // ry * ry
            full_w = (w + rx - 1) // rx * rx
            p = np.pad(p, ((0, full_h - h), (0, full_w - w)), mode="edge")
            p = p.reshape(full_h // ry, ry, full_w // rx, rx).mean(axis=(1, 3))
        p = np.pad(p, ((0, tgt_h - p.shape[0]), (0, tgt_w - p.shape[1])),
                   mode="edge")
        comp_zz.append(_comp_zigzag(p, qy if ci == 0 else qc))
        comp_bw.append(tgt_w // 8)

    bw = _BitWriter()
    preds = [0] * len(sampling)
    rst = 0
    for m in range(mcuy * mcux):
        if restart_interval and m and m % restart_interval == 0:
            bw.restart(rst)
            rst = (rst + 1) & 7
            preds = [0] * len(sampling)
        my, mx = divmod(m, mcux)
        for ci, (sh, sv) in enumerate(sampling):
            for v in range(sv):
                for hh in range(sh):
                    bi = (my * sv + v) * comp_bw[ci] + (mx * sh + hh)
                    preds[ci] = _encode_block(
                        comp_zz[ci][bi], preds[ci],
                        dc_l if ci == 0 else dc_c,
                        ac_l if ci == 0 else ac_c, bw)
    bw.flush()

    out = bytearray(b"\xFF\xD8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(qy[ZIGZAG].tolist()))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, len(sampling))
    for (cid, tq), (sh, sv) in zip(comps_meta, sampling):
        sof += bytes([cid, (sh << 4) | sv, tq])
    out += _seg(0xC0, sof)
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
              (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                   (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc_th, bits, vals in tables:
        out += _seg(0xC4, bytes([tc_th] + bits + vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(sampling)])
    for i, (cid, _) in enumerate(comps_meta):
        sos += bytes([cid, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JFIF bytes to an (H, W, 3) uint8 RGB array
    (grayscale replicates to 3 channels)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtables: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, _HuffDecoder] = {}
    huff_ac: Dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # optional FF fill bytes before a marker
            pos += 1        # (T.81 B.1.1.2): skip one pad, rescan
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        payload = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 15
                p += 1
                if pq:
                    t = np.frombuffer(payload[p:p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    t = np.frombuffer(payload[p:p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                qtables[tq] = t[UNZIGZAG]  # store natural order
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 15
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                p += 17 + n
                (huff_ac if tc else huff_dc)[th] = _HuffDecoder(bits, vals)
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError("jpeg: progressive (SOF2) not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs, tdta = payload[1 + 2 * i:3 + 2 * i]
                scan.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 15})
            pos += seglen
            break  # entropy data follows
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("jpeg: missing SOF/SOS")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]   # blocks across
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), dtype=np.float64)
    by_cs = {c["id"]: c for c in comps}

    reader = _BitReader(data, pos)
    preds = {s["cs"]: 0 for s in scan}
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            mk = reader.align_and_take_marker()
            if not (0xD0 <= mk <= 0xD7):
                raise ValueError("jpeg: expected RSTn")
            preds = {s["cs"]: 0 for s in scan}
        my, mx = divmod(m, mcux)
        for s in scan:
            c = by_cs[s["cs"]]
            dec_dc = huff_dc[s["td"]]
            dec_ac = huff_ac[s["ta"]]
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    t = dec_dc.decode(reader)
                    diff = _extend(reader.receive(t), t) if t else 0
                    preds[s["cs"]] += diff
                    zz = np.zeros(64, dtype=np.int64)
                    zz[0] = preds[s["cs"]]
                    k = 1
                    while k < 64:
                        rs = dec_ac.decode(reader)
                        r, size = rs >> 4, rs & 15
                        if size == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("jpeg: AC index overflow")
                        zz[k] = _extend(reader.receive(size), size)
                        k += 1
                    bx = mx * c["h"] + hh
                    byy = my * c["v"] + v
                    c["coef"][byy * c["bw"] + bx] = \
                        zz[UNZIGZAG].reshape(8, 8) * qtables[c["tq"]].reshape(8, 8)

    planes = []
    for c in comps:
        px = _idct2(c["coef"]) + 128.0
        plane = _unblockify(px, c["bh"] * 8, c["bw"] * 8)
        # upsample to full resolution by sample replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:frame["h"], :frame["w"]])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
