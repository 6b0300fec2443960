"""Per-tile MVT assembly operators — the engine's shuffle boundary.

The reference encoder is a single-threaded pure function per tile
(/root/reference/src/Data/Geometry/MapnikVectorTile.hs:30-33,60-68);
its streaming fold (GeoJsonStreamingToMvt.hs:25-57) is the shape we
distribute.  Three strategies, all producing IDENTICAL bytes:

1. ``assemble_point_tiles_streaming`` (primary, scale path):
   ``repartition(tile_key) -> sortWithinPartitions(tile_key, image_id)
   -> mapInPandas(streaming fold)``.  One shuffle; each task folds its
   tiles in Arrow-batch-bounded memory — a tile with 10^9 features
   never materializes as one group (the applyInPandas trap).  This is
   exactly Spark's sort-based aggregation pattern applied to MVT
   layers.

2. ``assemble_point_tiles_grouped``: classic
   ``groupBy(tile).applyInPandas`` — simpler plan, used for small/test
   scales and as a cross-check oracle.

3. ``assemble_point_tiles_salted``: explicit two-phase for hot tiles
   (dense urban cells, the north rule's skew case):
   phase A ``groupBy(tile, salt)`` pre-encodes each feature's
   expensive bytes (type+geometry varints) map-side; phase B
   ``groupBy(tile)`` merges sub-groups — a numpy splice of small
   varints (ids/tags), no re-encoding.  Partial+final aggregation,
   exactly Spark's two-phase agg applied to MVT layers.

Determinism: the reference is single-threaded, so its stable order is
input order.  A distributed engine needs an explicit stable key — we
sort features by ``image_id`` within each tile; feature ids are then
1..n in that order (convertId counter semantics, GeoJsonToMvt.hs:54-60).
All three strategies agree byte-for-byte (tested).

Feature properties: ``{"image_id": St <id>}`` per feature; dictionary
tables are first-seen order (= feature order, since ids are unique),
matching the kernel's standardized dictionary semantics.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel import mvt as kmvt
from . import tiles as T

TILE_SCHEMA = ("zoom int, tile_x long, tile_y long, mvt binary, "
               "feature_count long, bytes_len long")


# ---------------------------------------------------------------------------
# numpy byte-assembly helpers (vectorized; no per-feature Python beyond joins)
# ---------------------------------------------------------------------------

def _varints_concat(vals: np.ndarray) -> tuple:
    """Varint-encode a uint64 array; returns (bytes, per-value byte length)."""
    v = np.asarray(vals, dtype=np.uint64)
    nb = 10
    shifts = (np.uint64(7) * np.arange(nb, dtype=np.uint64))[None, :]
    chunks = (v[:, None] >> shifts) & np.uint64(0x7F)
    sig = np.maximum(nb - (chunks[:, ::-1] != 0).argmax(axis=1), 1)
    sig = np.where(v == 0, 1, sig).astype(np.int64)
    idx = np.arange(nb)[None, :]
    used = idx < sig[:, None]
    cont = idx < (sig - 1)[:, None]
    out = (chunks | (np.uint64(0x80) * cont)).astype(np.uint8)
    return out[used].tobytes(), sig


def _point_feature_tails(px: np.ndarray, py: np.ndarray) -> List[bytes]:
    """Per-feature ``type(f3)+geometry(f4)`` bytes for single-point
    features: geometry = [MoveTo(1), zig(x), zig(y)] — all vectorized."""
    ix = np.rint(px).astype(np.int64)
    iy = np.rint(py).astype(np.int64)
    zx = kmvt.zig(ix)
    zy = kmvt.zig(iy)
    n = len(ix)
    ints = np.empty((n, 3), dtype=np.uint64)
    ints[:, 0] = np.uint64(9)  # MoveTo count 1
    ints[:, 1] = zx
    ints[:, 2] = zy
    blob, lens = _varints_concat(ints.reshape(-1))
    lens = lens.reshape(n, 3).sum(axis=1)
    # geometry payload per feature; split the big blob at offsets
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    type_geo = b"\x18\x01"  # type(f3)=POINT
    out = []
    mv = memoryview(blob)
    for i in range(n):
        payload = bytes(mv[offs[i]:offs[i + 1]])
        out.append(type_geo + b"\x22" + kmvt.varint(len(payload)) + payload)
    return out


def _finish_point_tile(image_ids: List[str], tails: List[bytes],
                       layer_name: str, extent: int) -> bytes:
    """ids, tags, dictionaries, layer + tile wrap for one tile."""
    keys = ["image_id"]
    feats = []
    for i, (img, tail) in enumerate(zip(image_ids, tails)):
        fid = i + 1
        # id(f1) + tags(f2: key 0 -> value i) + tail(type+geometry)
        tags = kmvt.varint_array(np.array([0, i], dtype=np.uint64))
        feat = (b"\x08" + kmvt.varint(fid)
                + b"\x12" + kmvt.varint(len(tags)) + tags + tail)
        feats.append(feat)
    values = [("st", s) for s in image_ids]
    layer = kmvt.encode_layer(layer_name, feats, keys, values, extent)
    return kmvt.encode_tile([layer])


# ---------------------------------------------------------------------------
# strategy 1: streaming fold over sorted partitions (the scale path)
# ---------------------------------------------------------------------------

def assemble_point_tiles_streaming(assigned: DataFrame, layer_name: str = "images",
                                   extent: int = 4096, quantize: int = 1,
                                   buffer: int = 128,
                                   num_partitions: Optional[int] = None) -> DataFrame:
    """assigned: rows with zoom/tile_x/tile_y/tile_key/x3857/y3857/image_id.

    Plan: project px/py (codegen) -> filter buffered window (codegen)
    -> repartition(tile_key) -> sortWithinPartitions -> mapInPandas
    streaming fold.  Peak Python memory is O(arrow batch + open tile
    accumulator), independent of tile size.
    """
    df = T.tile_local_px(assigned, extent, quantize)
    w = float(buffer)
    df = df.filter((F.col("px") >= -w) & (F.col("px") <= extent + w)
                   & (F.col("py") >= -w) & (F.col("py") <= extent + w))
    df = df.select("zoom", "tile_x", "tile_y", "tile_key", "image_id", "px", "py")
    if num_partitions:
        df = df.repartition(num_partitions, "tile_key")
    else:
        df = df.repartition("tile_key")
    df = df.sortWithinPartitions("tile_key", "image_id")

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur_key = None
        cur_meta = None
        ids: List[str] = []
        tails: List[bytes] = []

        def flush():
            z, tx, ty = cur_meta
            mvt_bytes = _finish_point_tile(ids, tails, layer_name, extent)
            return pd.DataFrame({
                "zoom": [z], "tile_x": [tx], "tile_y": [ty],
                "mvt": [mvt_bytes], "feature_count": [len(ids)],
                "bytes_len": [len(mvt_bytes)],
            })

        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys = pdf["tile_key"].to_numpy()
            px = pdf["px"].to_numpy()
            py = pdf["py"].to_numpy()
            tails_batch = _point_feature_tails(px, py)
            # split the batch at tile boundaries
            change = np.nonzero(np.diff(keys))[0] + 1
            starts = np.concatenate([[0], change])
            ends = np.concatenate([change, [len(keys)]])
            for s, e in zip(starts, ends):
                k = keys[s]
                if cur_key is not None and k != cur_key:
                    yield flush()
                    ids, tails = [], []
                cur_key = k
                cur_meta = (int(pdf["zoom"].iloc[s]), int(pdf["tile_x"].iloc[s]),
                            int(pdf["tile_y"].iloc[s]))
                ids.extend(pdf["image_id"].iloc[s:e].tolist())
                tails.extend(tails_batch[s:e])
        if cur_key is not None:
            yield flush()

    return df.mapInPandas(fold, TILE_SCHEMA)


# ---------------------------------------------------------------------------
# strategy 2: groupBy().applyInPandas (test scale / oracle)
# ---------------------------------------------------------------------------

def assemble_point_tiles_grouped(assigned: DataFrame, layer_name: str = "images",
                                 extent: int = 4096, quantize: int = 1,
                                 buffer: int = 128) -> DataFrame:
    df = T.tile_local_px(assigned, extent, quantize)
    w = float(buffer)
    df = df.filter((F.col("px") >= -w) & (F.col("px") <= extent + w)
                   & (F.col("py") >= -w) & (F.col("py") <= extent + w))
    df = df.select("zoom", "tile_x", "tile_y", "image_id", "px", "py")

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("image_id")
        tails = _point_feature_tails(pdf["px"].to_numpy(), pdf["py"].to_numpy())
        mvt_bytes = _finish_point_tile(pdf["image_id"].tolist(), tails, layer_name, extent)
        return pd.DataFrame({
            "zoom": [int(pdf["zoom"].iloc[0])],
            "tile_x": [int(pdf["tile_x"].iloc[0])],
            "tile_y": [int(pdf["tile_y"].iloc[0])],
            "mvt": [mvt_bytes], "feature_count": [len(pdf)],
            "bytes_len": [len(mvt_bytes)],
        })

    return df.groupBy("zoom", "tile_x", "tile_y").applyInPandas(encode, TILE_SCHEMA)


# ---------------------------------------------------------------------------
# strategy 3: explicit two-phase with hot-tile salting
# ---------------------------------------------------------------------------

_PARTIAL_SCHEMA = ("zoom int, tile_x long, tile_y long, salt int, "
                   "min_id string, image_ids array<string>, tails array<binary>")


def assemble_point_tiles_salted(assigned: DataFrame, layer_name: str = "images",
                                extent: int = 4096, quantize: int = 1,
                                buffer: int = 128, salt: int = 8) -> DataFrame:
    """Two-phase encode: phase A does the expensive per-feature byte work
    under (tile, salt) groups; phase B merges sub-groups per tile by
    splicing ids/tags — cheap numpy — keeping single-reducer work
    proportional to OUTPUT bytes, not to encode cost.

    Produces bytes identical to the other strategies.
    """
    df = T.tile_local_px(assigned, extent, quantize)
    w = float(buffer)
    df = df.filter((F.col("px") >= -w) & (F.col("px") <= extent + w)
                   & (F.col("py") >= -w) & (F.col("py") <= extent + w))
    df = df.select("zoom", "tile_x", "tile_y", "image_id", "px", "py")
    df = df.withColumn("salt", F.pmod(F.xxhash64("image_id"), F.lit(salt)).cast("int"))

    def phase_a(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("image_id")
        tails = _point_feature_tails(pdf["px"].to_numpy(), pdf["py"].to_numpy())
        return pd.DataFrame({
            "zoom": [int(pdf["zoom"].iloc[0])],
            "tile_x": [int(pdf["tile_x"].iloc[0])],
            "tile_y": [int(pdf["tile_y"].iloc[0])],
            "salt": [int(pdf["salt"].iloc[0])],
            "min_id": [pdf["image_id"].iloc[0]],
            "image_ids": [pdf["image_id"].tolist()],
            "tails": [tails],
        })

    partial = (df.groupBy("zoom", "tile_x", "tile_y", "salt")
                 .applyInPandas(phase_a, _PARTIAL_SCHEMA))

    def phase_b(pdf: pd.DataFrame) -> pd.DataFrame:
        ids: List[str] = []
        tails: List[bytes] = []
        for _, row in pdf.iterrows():
            ids.extend(row["image_ids"])
            tails.extend(row["tails"])
        order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
        ids = [ids[i] for i in order]
        tails = [tails[i] for i in order]
        mvt_bytes = _finish_point_tile(ids, tails, layer_name, extent)
        return pd.DataFrame({
            "zoom": [int(pdf["zoom"].iloc[0])],
            "tile_x": [int(pdf["tile_x"].iloc[0])],
            "tile_y": [int(pdf["tile_y"].iloc[0])],
            "mvt": [mvt_bytes], "feature_count": [len(ids)],
            "bytes_len": [len(mvt_bytes)],
        })

    return (partial.groupBy("zoom", "tile_x", "tile_y")
            .applyInPandas(phase_b, TILE_SCHEMA))


# ---------------------------------------------------------------------------
# generic feature tiles (lines/polygons; fixture-parity and raster/vector ops)
# ---------------------------------------------------------------------------

def encode_geojson_tile(features: list, layer_name: str, z: int, x: int, y: int,
                        buffer: int = 128, extent: int = 4096, quantize: int = 1,
                        simplify: str = "none") -> bytes:
    """Single-tile encode of normalized features via the numpy kernel —
    the per-group body for arbitrary-geometry tiling jobs."""
    from ..kernel import pipeline as kpipe

    cfg = kpipe.TileConfig(name=layer_name, z=z, x=x, y=y, buffer=buffer,
                           extent=extent, quantize=quantize, simplify=simplify)
    return kpipe.encode_features(features, cfg)
