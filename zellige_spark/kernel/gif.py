"""Pure-numpy GIF codec (public GIF89a specification).

Decoder: full GIF87a/89a — logical screen descriptor, global/local
color tables, variable-width LZW (12-bit cap, clear/end codes,
deferred-clear tolerant), interlaced images, multi-frame animation
with disposal methods 0/1 (draw over) and 2 (restore background),
transparency via the graphic control extension.  Frames composite
onto the logical screen and are returned as RGB uint8 arrays.

Encoder (test oracle): indexed frames + palette; LZW emitted with the
classic fixed-width trick (a CLEAR before every dictionary growth
keeps codes at min_code_size+1 bits) — bit-valid output any decoder
accepts, with the encoder staying ~40 lines.

The LZW decode hot loop is table-driven over numpy int32 arrays
(prefix/suffix chains materialized per code), so a large frame costs
O(pixels) array appends, not per-pixel python dict work beyond the
code stream itself (one iteration per CODE, each emitting a whole
chain).
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


# --- bit reader over the concatenated sub-blocks ---------------------------

def _sub_blocks(buf: bytes, i: int):
    """Collect the sub-block chain starting at ``i``; returns
    (payload bytes, index after the 0 terminator)."""
    out = bytearray()
    while True:
        if i >= len(buf):
            raise GifError("gif: truncated sub-block chain")
        n = buf[i]
        i += 1
        if n == 0:
            return bytes(out), i
        block = buf[i:i + n]
        if len(block) < n:
            raise GifError("gif: truncated sub-block")
        out += block
        i += n


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    # bit stream, LSB-first
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                         bitorder="little")
    pos = 0
    width = min_code_size + 1
    # dictionary: prefix link + suffix byte per code
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.int32)
    suffix[:clear] = np.arange(clear)
    next_code = end + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    prev = -1
    chain = np.empty(4096, dtype=np.int32)

    def read_code():
        nonlocal pos
        if pos + width > len(bits):
            return None
        v = 0
        for k in range(width):
            v |= int(bits[pos + k]) << k
        pos += width
        return v

    while n_out < n_pixels:
        code = read_code()
        if code is None or code == end:
            break
        if code == clear:
            next_code = end + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code >= next_code + 1 or (code == next_code and prev == -1):
            raise GifError("gif: invalid LZW code")
        if code == next_code:
            # KwKwK case: chain = prev chain + first byte of prev chain
            c, n = prev, 0
            while c != -1:
                chain[n] = suffix[c]
                c = prefix[c]
                n += 1
            first = chain[n - 1]
            seq = np.append(chain[:n][::-1], first)
        else:
            c, n = code, 0
            while c != -1:
                chain[n] = suffix[c]
                c = prefix[c]
                n += 1
            seq = chain[:n][::-1]
        take = min(len(seq), n_pixels - n_out)
        out[n_out:n_out + take] = seq[:take]
        n_out += take
        if prev != -1 and next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = seq[0]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out < n_pixels:
        raise GifError("gif: LZW stream ended early")
    return out


_DEINTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes):
    """Decode all frames: returns (frames, delays_cs) where frames is a
    list of (H, W, 3) uint8 RGB arrays composited on the logical
    screen and delays_cs the per-frame delay in centiseconds."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("gif: bad signature")
    if len(data) < 14:
        raise GifError("gif: truncated header")
    W, H = struct.unpack("<HH", data[6:10])
    packed, bg_idx, _aspect = data[10], data[11], data[12]
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data[i:i + 3 * n], dtype=np.uint8).reshape(n, 3)
        i += 3 * n
    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    frames, delays = [], []
    transparent = None
    disposal = 0
    delay = 0
    saved = None
    while i < len(data):
        b = data[i]
        i += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[i]
            i += 1
            payload, i = _sub_blocks(data, i)
            if label == 0xF9 and len(payload) >= 4:
                flags, delay = payload[0], struct.unpack("<H", payload[1:3])[0]
                disposal = (flags >> 2) & 7
                transparent = payload[3] if flags & 1 else None
            continue
        if b != 0x2C:
            raise GifError(f"gif: unknown block 0x{b:02x}")
        left, top, w, h = struct.unpack("<HHHH", data[i:i + 8])
        if left + w > W or top + h > H:
            # a rect past the logical screen would make the composite
            # patch smaller than the decoded frame and raise a raw numpy
            # broadcast error out of the sampling UDF — fail the row
            # cleanly instead
            raise GifError("gif: frame rect outside logical screen")
        fpacked = data[i + 8]
        i += 9
        table = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 7)
            table = np.frombuffer(data[i:i + 3 * n], dtype=np.uint8).reshape(n, 3)
            i += 3 * n
        if table is None:
            raise GifError("gif: no color table")
        min_code = data[i]
        i += 1
        lzw, i = _sub_blocks(data, i)
        idx = _lzw_decode(lzw, min_code, w * h).reshape(h, w)
        if fpacked & 0x40:  # interlaced: reorder rows
            ordered = np.empty_like(idx)
            src = 0
            for start, step in _DEINTERLACE:
                rows = range(start, h, step)
                for r in rows:
                    ordered[r] = idx[src]
                    src += 1
            idx = ordered
        if disposal == 2:
            saved = None  # restore-to-bg applies after the frame
        elif disposal == 3:
            saved = canvas.copy()
        patch = canvas[top:top + h, left:left + w]
        rgb = table[np.clip(idx, 0, len(table) - 1)]
        if transparent is not None:
            mask = idx != transparent
            patch[mask] = rgb[mask]
        else:
            patch[:, :] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            # restore-to-background uses the GLOBAL palette's background
            # color (the logical-screen bg index is defined against the
            # GCT, not a frame's local table)
            bg = gct[bg_idx] if gct is not None and bg_idx < len(gct) else 0
            canvas[top:top + h, left:left + w] = bg
        elif disposal == 3 and saved is not None:
            canvas = saved
        # a graphic control extension governs only the image it precedes
        transparent = None
        disposal = 0
        delay = 0
    if not frames:
        raise GifError("gif: no image data")
    return frames, delays


# --- encoder (test oracle) -------------------------------------------------

def _lzw_encode_fixed(indices: np.ndarray, min_code_size: int) -> bytes:
    """Fixed-width LZW: emit CLEAR whenever the next literal would grow
    the dictionary past min_code_size+1 bits — valid output, trivial
    encoder."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    room = (1 << width) - end - 1  # literals until the width would grow
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for k, v in enumerate(indices.ravel()):
        if k and k % room == 0:
            emit(clear)
        emit(int(v))
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_encode_dict(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real variable-width LZW (string-table compression): exercises
    the decoder's width-growth and KwKwK paths and shrinks repetitive
    frames the way standard encoders do."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(c,): c for c in range(clear)}
    next_code = end + 1
    emit(clear)
    seq = ()
    for v in map(int, indices.ravel()):
        cand = seq + (v,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            # reset AFTER the clear code goes out at the old width
            table = {(c,): c for c in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        seq = (v,)
    if seq:
        emit(table[seq])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(frames_idx, palette: np.ndarray, delays=None,
               transparent: int | None = None,
               compress: bool = False) -> bytes:
    """Encode indexed frames (list of (H, W) uint8 arrays) against one
    global palette ((N, 3) uint8, N a power of two >= 2)."""
    n = len(palette)
    if n & (n - 1) or n < 2:
        raise GifError("gif: palette size must be a power of two >= 2")
    depth = max(1, int(n).bit_length() - 1)
    h, w = frames_idx[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])
    out += palette.astype(np.uint8).tobytes()
    min_code = max(2, depth)
    for k, idx in enumerate(frames_idx):
        delay = (delays or [0] * len(frames_idx))[k]
        flags = (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, flags]) + struct.pack("<H", delay) \
            + bytes([transparent or 0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
        out += bytes([min_code])
        enc = _lzw_encode_dict if compress else _lzw_encode_fixed
        data = enc(idx.astype(np.uint8), min_code)
        for off in range(0, len(data), 255):
            block = data[off:off + 255]
            out += bytes([len(block)]) + block
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)
