"""Deterministic synthetic data: the Iceberg-shaped image+caption table
and coverage polygons (FIXTURES.md §1-2; BASELINE.json input_hint).

Everything is seeded and order-independent: row ``i`` is generated from
``default_rng([seed, i])`` so distributed generation (mapInPandas over a
range) produces identical rows regardless of partitioning.

Image payloads are real encoded bytes in three formats (no PIL in the
sandbox — all stdlib/numpy):

* ``raw`` — C-order uint8 RGB bytes.
* ``ppm`` — P6 header + raw bytes.
* ``png`` — a real, spec-valid PNG (8-bit RGB, filter 0) via stdlib zlib.

``phash`` is a DCT-free 64-bit average hash (8x8 block means of the
luma plane vs their mean, row-major, MSB first) — fixed algorithm so it
can serve as a per-row invariant through re-encodes.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

import numpy as np

SEED = 42
N_CLUSTERS = 20
URBAN_FRACTION = 0.8
CLUSTER_SIGMA_DEG = 0.01
LAT_LIMIT = 85.0511
SIZES = (16, 32, 64)
FORMATS = ("raw", "ppm", "png")


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------

def encode_raw(pixels: np.ndarray) -> bytes:
    return np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + encode_raw(pixels)


def decode_ppm(data: bytes) -> np.ndarray:
    # header: P6\n<w> <h>\n<maxval>\n
    parts = data.split(b"\n", 3)
    if parts[0] != b"P6":
        raise ValueError("not a P6 ppm")
    w, h = (int(t) for t in parts[1].split())
    return np.frombuffer(parts[3], dtype=np.uint8)[: w * h * 3].reshape(h, w, 3)


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """Spec-valid 8-bit RGB PNG, filter type 0 per scanline."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    )
    idat = zlib.compress(rows.tobytes(), level)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a png")
    i = 8
    w = h = None
    idat = b""
    while i < len(data):
        (ln,) = struct.unpack(">I", data[i:i + 4])
        tag = data[i + 4:i + 8]
        payload = data[i + 8:i + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("unsupported png variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        i += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    out = np.empty((h, w * 3), dtype=np.uint8)
    prev = np.zeros(w * 3, dtype=np.int64)
    for r in range(h):
        ftype = rows[r, 0]
        line = rows[r, 1:].astype(np.int64)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) % 256
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth carry a left-pixel dependency, so the
            # scanline reconstructs pixel-by-pixel (3-byte vector per
            # step; images here are <= 64 px wide)
            cur = np.zeros(w * 3, dtype=np.int64)
            for x in range(w):
                i = 3 * x
                a = cur[i - 3:i] if x else np.zeros(3, dtype=np.int64)
                b = prev[i:i + 3]
                if ftype == 1:      # Sub
                    pred = a
                elif ftype == 3:    # Average
                    pred = (a + b) // 2
                else:               # Paeth
                    c = prev[i - 3:i] if x else np.zeros(3, dtype=np.int64)
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where((pa <= pb) & (pa <= pc), a,
                                    np.where(pb <= pc, b, c))
                cur[i:i + 3] = (line[i:i + 3] + pred) % 256
        else:
            raise ValueError(f"unsupported png filter {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = out[r].astype(np.int64)
    return out.reshape(h, w, 3)


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        from .kernel import jpeg as kjpeg

        return kjpeg.decode_jpeg(bytes(data))
    if fmt == "gif":
        from .kernel import gif as kgif

        return kgif.decode_gif(bytes(data))[0][0]  # first frame
    raise ValueError(f"unknown image format {fmt!r}")


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return encode_raw(pixels)
    if fmt == "ppm":
        return encode_ppm(pixels)
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        from .kernel import jpeg as kjpeg

        return kjpeg.encode_jpeg(pixels)
    if fmt == "gif":
        # palette-exact (lossless) for images with <= 256 distinct colors
        from .kernel import gif as kgif

        flat = pixels.reshape(-1, 3)
        pal, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(pal) > 256:
            raise ValueError("gif: more than 256 distinct colors")
        size = max(2, 1 << int(np.ceil(np.log2(max(2, len(pal))))))
        pal = np.vstack([pal, np.zeros((size - len(pal), 3), np.uint8)])
        idx = inv.reshape(pixels.shape[:2]).astype(np.uint8)
        return kgif.encode_gif([idx], pal.astype(np.uint8), compress=True)
    raise ValueError(f"unknown image format {fmt!r}")


# ---------------------------------------------------------------------------
# phash / psnr invariants (input_hint: decoded-pixel PSNR>=40dB, phash kept)
# ---------------------------------------------------------------------------

def average_phash(pixels: np.ndarray) -> int:
    """64-bit average hash: luma -> 8x8 block means -> bit = mean > global
    mean, row-major MSB-first.  Signed int64 (two's complement) so it fits
    a Spark LongType column."""
    p = pixels.astype(np.float64)
    luma = (p[:, :, 0] * 299 + p[:, :, 1] * 587 + p[:, :, 2] * 114) / 1000.0
    h, w = luma.shape
    bh, bw = h // 8, w // 8
    blocks = luma[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).reshape(-1)
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - 0x10000000000000000 if val >= 0x8000000000000000 else val


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


# ---------------------------------------------------------------------------
# generators
# ---------------------------------------------------------------------------

def cluster_centers(seed: int = SEED, n: int = N_CLUSTERS) -> np.ndarray:
    rng = np.random.default_rng([seed, 777])
    lon = rng.uniform(-175.0, 175.0, n)
    lat = rng.uniform(-70.0, 70.0, n)
    return np.stack([lon, lat], axis=1)


def gen_image_row(i: int, seed: int = SEED, centers: np.ndarray = None) -> dict:
    """One deterministic image row (order-independent in ``i``)."""
    if centers is None:
        centers = cluster_centers(seed)
    rng = np.random.default_rng([seed, i])
    w = int(SIZES[int(rng.integers(0, len(SIZES)))])
    h = int(SIZES[int(rng.integers(0, len(SIZES)))])
    fmt = FORMATS[i % len(FORMATS)]
    pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if rng.random() < URBAN_FRACTION:
        c = centers[int(rng.integers(0, len(centers)))]
        lon = float(np.clip(c[0] + rng.normal(0, CLUSTER_SIGMA_DEG), -180.0, 179.999999))
        lat = float(np.clip(c[1] + rng.normal(0, CLUSTER_SIGMA_DEG), -LAT_LIMIT, LAT_LIMIT))
    else:
        lon = float(rng.uniform(-180.0, 180.0))
        lat = float(rng.uniform(-LAT_LIMIT, LAT_LIMIT))
    return {
        "image_id": f"img{i:012d}",
        "bytes": encode_image(pixels, fmt),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": f"caption of img{i} at ({lon:.5f},{lat:.5f})",
        "phash": average_phash(pixels),
        "lon": lon,
        "lat": lat,
    }


def gen_images_pandas(start: int, stop: int, seed: int = SEED):
    """Rows [start, stop) as a pandas DataFrame (used by tests and by the
    Spark mapInPandas generator)."""
    import pandas as pd

    centers = cluster_centers(seed)
    return pd.DataFrame([gen_image_row(i, seed, centers) for i in range(start, stop)])


IMAGES_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
                 "caption string, phash long, lon double, lat double")


def gen_jpeg_image_row(i: int, seed: int = SEED, centers: np.ndarray = None) -> dict:
    """A jpeg-format row with DCT-friendly SMOOTH content (gradient +
    sinusoid): bytes are a real baseline-JPEG encode (q90,
    kernel/jpeg.py) and phash/ground truth are taken over the DECODED
    pixels, so decode-side invariants (phash equality, PSNR >= 40 of a
    second-generation re-encode) hold by construction.  The main
    ``images_df`` mix stays raw/ppm/png noise: white noise is the DCT
    worst case and no baseline codec meets a 40 dB floor on it."""
    from .kernel import jpeg as kjpeg

    if centers is None:
        centers = cluster_centers(seed)
    rng = np.random.default_rng([seed, 7, i])
    w = int(SIZES[int(rng.integers(0, len(SIZES)))])
    h = int(SIZES[int(rng.integers(0, len(SIZES)))])
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    fx, fy = float(rng.uniform(3.0, 11.0)), float(rng.uniform(3.0, 11.0))
    px = np.stack([xx * 255 / max(w - 1, 1), yy * 255 / max(h - 1, 1),
                   128 + 100 * np.sin(xx / fx) * np.cos(yy / fy)], axis=-1)
    pixels = np.clip(px + float(rng.uniform(0, 30)), 0, 255).astype(np.uint8)
    data = kjpeg.encode_jpeg(pixels, 90)
    decoded = kjpeg.decode_jpeg(data)
    if rng.random() < URBAN_FRACTION:
        c = centers[int(rng.integers(0, len(centers)))]
        lon = float(np.clip(c[0] + rng.normal(0, CLUSTER_SIGMA_DEG), -180.0, 179.999999))
        lat = float(np.clip(c[1] + rng.normal(0, CLUSTER_SIGMA_DEG), -LAT_LIMIT, LAT_LIMIT))
    else:
        lon = float(rng.uniform(-180.0, 180.0))
        lat = float(rng.uniform(-LAT_LIMIT, LAT_LIMIT))
    return {
        "image_id": f"jpg{i:012d}",
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": "jpeg",
        "caption": f"caption of img jpg{i} at ({lon:.5f},{lat:.5f})",
        "phash": average_phash(decoded),
        "lon": lon,
        "lat": lat,
    }


def jpeg_images_df(spark, n_rows: int, seed: int = SEED, partitions: int = None):
    """Distributed deterministic jpeg-row generation (same shape as
    ``images_df``)."""
    if partitions is None:
        partitions = max(int(spark.sparkContext.defaultParallelism), 1)

    def gen(iterator):
        import pandas as pd
        centers = cluster_centers(seed)
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            for i in range(0, len(ids), 8192):
                yield pd.DataFrame([gen_jpeg_image_row(int(j), seed, centers)
                                    for j in ids[i:i + 8192]])

    return spark.range(0, n_rows, 1, partitions).mapInPandas(gen, IMAGES_SCHEMA)


def images_df(spark, n_rows: int, seed: int = SEED, partitions: int = None):
    """Distributed deterministic generation: range -> mapInPandas.

    Scales to any n_rows without driver-side materialization; each
    partition generates only its own rows.
    """
    if partitions is None:
        partitions = max(int(spark.sparkContext.defaultParallelism), 1)

    def gen(iterator):
        import pandas as pd  # noqa: F401
        centers = cluster_centers(seed)
        for pdf in iterator:
            ids = pdf["id"].to_numpy()
            # bounded output batches: a partition can hold millions of
            # ids, and image bytes are ~KBs each — emitting one frame
            # per partition OOMs the python worker
            for i in range(0, len(ids), 8192):
                yield gen_images_pandas_ids(ids[i:i + 8192], seed, centers)

    return spark.range(0, n_rows, 1, partitions).mapInPandas(gen, IMAGES_SCHEMA)


def gen_images_pandas_ids(ids, seed: int = SEED, centers: np.ndarray = None):
    import pandas as pd

    if centers is None:
        centers = cluster_centers(seed)
    return pd.DataFrame([gen_image_row(int(i), seed, centers) for i in ids])


# --- coverage polygons (FIXTURES.md §2) --------------------------------------

def gen_coverage_polygons(n: int = 50, seed: int = SEED) -> List[dict]:
    """Convex-ish closed blobs around the urban cluster centres.  Ring 0 is
    clockwise per the reference winding convention (Simplify.hs:92-93);
    every 4th polygon carries an anticlockwise hole."""
    centers = cluster_centers(seed)
    rng = np.random.default_rng([seed, 31337])
    out = []
    for j in range(n):
        # jitter each polygon away from its cluster centre so a large
        # dim table doesn't stack n/20 overlapping polygons per centre
        # (which would make every clustered point match ~n/20 polygons)
        base = centers[j % len(centers)]
        c = base + rng.uniform(-0.2, 0.2, 2)
        k = int(rng.integers(5, 10))
        angles = np.sort(rng.uniform(0, 2 * np.pi, k))
        radii = rng.uniform(0.05, 0.35, k)
        lon = c[0] + radii * np.cos(angles)
        lat = c[1] + radii * np.sin(angles)
        ring = np.stack([lon, lat], axis=1)
        # angles ascending => anticlockwise in lon/lat; reverse for clockwise
        ring = ring[::-1]
        ring = np.concatenate([ring, ring[:1]], axis=0)
        rings = [ring.tolist()]
        if j % 4 == 0:
            hole_r = radii.min() * 0.3
            ha = np.linspace(0, 2 * np.pi, 5)[:-1]
            hlon = c[0] + hole_r * np.cos(ha)
            hlat = c[1] + hole_r * np.sin(ha)
            hole = np.stack([hlon, hlat], axis=1)  # ascending = anticlockwise
            hole = np.concatenate([hole, hole[:1]], axis=0)
            rings.append(hole.tolist())
        out.append({
            "polygon_id": f"poly{j:06d}",
            "name": f"district-{j}",
            "rings": rings,
            "min_lon": float(lon.min()), "min_lat": float(lat.min()),
            "max_lon": float(lon.max()), "max_lat": float(lat.max()),
        })
    return out


def coverage_polygons_df(spark, n: int = 50, seed: int = SEED):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("polygon_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("rings", T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType())))),
        T.StructField("min_lon", T.DoubleType()),
        T.StructField("min_lat", T.DoubleType()),
        T.StructField("max_lon", T.DoubleType()),
        T.StructField("max_lat", T.DoubleType()),
    ])
    return spark.createDataFrame(gen_coverage_polygons(n, seed), schema)
