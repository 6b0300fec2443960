"""Pure-numpy parsers for the two self-describing uncompressed media
containers a no-codec sandbox CAN genuinely decode from public specs:

* WAV (RIFF/WAVE, PCM integer or IEEE float chunks — Microsoft RIFF
  spec): `decode_wav` -> (samples float64 [-1, 1], sample_rate).
* Y4M (YUV4MPEG2, the mjpegtools interchange format: ASCII stream
  header, per-frame FRAME markers, planar YUV) -> RGB frames.

These retire the audio/video legs of the multimodal stubs for the
formats that are spec-decodable without codec libraries; compressed
formats (mp3/aac/h264/vp9) remain honestly stubbed in
operators/images.py.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

# --------------------------------------------------------------------------
# WAV (RIFF PCM / IEEE float)
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000,
               bits: int = 16) -> bytes:
    """Mono/multichannel PCM WAV writer (test vector source).
    ``samples``: (n,) or (n, ch) float in [-1, 1]."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if bits == 16:
        data = np.clip(np.round(x * 32767.0), -32768, 32767) \
            .astype("<i2").tobytes()
        fmt_code, block = 1, 2 * ch
    elif bits == 32:
        data = x.astype("<f4").tobytes()
        fmt_code, block = 3, 4 * ch
    else:
        raise ValueError("bits must be 16 (PCM) or 32 (IEEE float)")
    fmt = struct.pack("<HHIIHH", fmt_code, ch, sample_rate,
                      sample_rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> Tuple[np.ndarray, int]:
    """RIFF/WAVE -> ((n, ch) float64 in [-1, 1], sample_rate).
    Supports PCM 8/16/24/32-bit and IEEE float 32/64; skips foreign
    chunks (LIST/fact/...) per the RIFF chunk walk."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    fmt_body = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("wav: missing fmt/data chunk")
    code, ch, rate, _, _, bits = fmt
    if code == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: the subformat GUID's
        # leading 16 bits carry the real format code (PCM=1, float=3) —
        # guessing from bits-per-sample would misread float32 as int32
        if fmt_body is None or len(fmt_body) < 26:
            raise ValueError("wav: extensible fmt chunk too short")
        (code,) = struct.unpack_from("<H", fmt_body, 24)
    if code == 1:  # integer PCM
        if bits == 8:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                 - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            v = (b[:, 0].astype(np.int64) | (b[:, 1].astype(np.int64) << 8)
                 | (b[:, 2].astype(np.int64) << 16))
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise ValueError(f"wav: unsupported PCM width {bits}")
    elif code == 3:  # IEEE float
        dt = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(raw, dtype=dt).astype(np.float64)
    else:
        raise ValueError(f"wav: unsupported format code {code}")
    return x.reshape(-1, ch), rate


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2)
# --------------------------------------------------------------------------


def encode_y4m(frames: np.ndarray, fps: Tuple[int, int] = (30, 1)) -> bytes:
    """(n, H, W, 3) uint8 RGB -> YUV4MPEG2 C444 stream (test vectors)."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape[:3]
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C444\n".encode())
    for i in range(n):
        ycc = _rgb_to_ycbcr_601(frames[i])
        out += b"FRAME\n"
        for p in range(3):
            out += np.round(ycc[..., p]).clip(0, 255).astype(np.uint8).tobytes()
    return bytes(out)


def _rgb_to_ycbcr_601(px: np.ndarray) -> np.ndarray:
    # one BT.601 implementation for the whole kernel (jpeg.py owns it)
    from . import jpeg as _kjpeg

    return _kjpeg._rgb_to_ycbcr(px)


def _ycbcr_to_rgb_601(ycc: np.ndarray) -> np.ndarray:
    from . import jpeg as _kjpeg

    return _kjpeg._ycbcr_to_rgb(ycc[..., 0], ycc[..., 1], ycc[..., 2])


def decode_y4m(data: bytes, frame_indices: List[int] = None) -> Tuple[np.ndarray, dict]:
    """YUV4MPEG2 -> ((n, H, W, 3) uint8 RGB, header dict).

    Supports C444 / C422 / C420 (+ the jpeg/paldv cosited variants,
    decoded with the same sample-replication upsampling) and the
    default C420 when no C tag is present.  ``frame_indices`` decodes
    only those frames (frame SEEKING is an offset computation — frame
    payloads are fixed-size — so sampling frame k of a long clip costs
    O(1), the property the Spark frame-sampling operator relies on)."""
    nl = data.index(b"\n")
    header = data[:nl].decode("ascii", "replace").split(" ")
    if header[0] != "YUV4MPEG2":
        raise ValueError("y4m: missing YUV4MPEG2 signature")
    meta = {"C": "420"}
    for tok in header[1:]:
        if not tok:
            continue
        meta[tok[0]] = tok[1:]
    w, h = int(meta["W"]), int(meta["H"])
    chroma = meta["C"].split("p")[0].split("j")[0] or "420"
    if chroma.startswith("444"):
        cw, chh = w, h
    elif chroma.startswith("422"):
        cw, chh = (w + 1) // 2, h
    elif chroma.startswith("420"):
        cw, chh = (w + 1) // 2, (h + 1) // 2
    else:
        raise ValueError(f"y4m: unsupported chroma mode C{meta['C']}")
    frame_bytes = w * h + 2 * cw * chh
    # frames are FRAME[ params]\n + fixed-size payload; param-less
    # FRAME lines (the common case, and what our encoder emits) make
    # the stream position of frame k a closed-form offset
    body = data[nl + 1:]
    marker = b"FRAME\n"
    stride = len(marker) + frame_bytes
    n_frames = len(body) // stride
    wanted = range(n_frames) if frame_indices is None else frame_indices
    frames = []
    for k in wanted:
        if not 0 <= k < n_frames:
            raise IndexError(f"y4m: frame {k} out of range 0..{n_frames - 1}")
        off = k * stride
        if body[off:off + len(marker)] != marker:
            raise ValueError("y4m: FRAME marker with parameters not supported")
        off += len(marker)
        y = np.frombuffer(body, np.uint8, w * h, off).reshape(h, w)
        cb = np.frombuffer(body, np.uint8, cw * chh, off + w * h).reshape(chh, cw)
        cr = np.frombuffer(body, np.uint8, cw * chh,
                           off + w * h + cw * chh).reshape(chh, cw)
        if (cw, chh) != (w, h):
            ry = (h + chh - 1) // chh
            rx = (w + cw - 1) // cw
            cb = np.repeat(np.repeat(cb, ry, 0), rx, 1)[:h, :w]
            cr = np.repeat(np.repeat(cr, ry, 0), rx, 1)[:h, :w]
        frames.append(_ycbcr_to_rgb_601(
            np.stack([y.astype(np.float64), cb.astype(np.float64),
                      cr.astype(np.float64)], axis=-1)))
    meta.update({"w": w, "h": h, "n_frames": n_frames})
    return np.stack(frames) if frames else np.empty((0, h, w, 3), np.uint8), meta
