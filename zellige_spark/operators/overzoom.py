"""Tile overzooming: derive z+1 MVT point tiles from encoded z tiles.

The tile-serving primitive the reference's CLI pipeline implies but
never needs (it encodes one tile per run): once a zoom level's tiles
are materialized, every DEEPER zoom is derivable from the tile BYTES
alone — decode, shift/scale the integer coordinates into the four
child frames, drop features outside each child's buffered window,
re-encode.  At 10^12 rows this is the difference between re-shuffling
the raw corpus per zoom level and a MAP-ONLY pass over the (much
smaller) encoded tile set: no Exchange at all — each parent's four
children are produced locally from its own bytes, and the output is
already exactly-one-row-per-child-tile because a child has exactly one
parent.

Exactness: encode the parent at TWICE the child extent (8192 -> 4096)
and overzooming is BYTE-IDENTICAL to encoding the children directly
from raw coordinates — a parent pixel at extent 2E has the same
physical size as a child pixel at extent E, so the child coordinate is
``parent_px - q*E`` (an integer shift, which commutes with the
kernel's half-even rounding), and the parent's buffered window at
extent 2E is exactly the union of the four child windows
(test-pinned).  The classic same-extent overzoom (4096 -> 4096,
coordinates doubled) is also supported; it carries the well-known
2-pixel quantization of every overzoom-serving stack.

Two paths: ``overzoom_point_tiles`` (the vectorized point fast path —
the geotagged-image payload of the north rule) and
``overzoom_feature_tiles`` (generic geometry: lines re-clip through
QuickClip, polygons through Sutherland–Hodgman — the same kernel
dispatch a direct encode runs, minus the projection stage).
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..kernel import mvt as kmvt
from .encode import TILE_SCHEMA, _finish_point_tile

_QUADS = ((0, 0), (1, 0), (0, 1), (1, 1))


def _decode_points(mvt: bytes, layer_name: str):
    """(ids, ix, iy) for the single-point features of ``layer_name``,
    in feature order (the encoder's image_id sort order)."""
    layers = kmvt.decode_tile(bytes(mvt))
    layer = layers[layer_name]
    ids: List[str] = []
    xs: List[int] = []
    ys: List[int] = []
    for feat in layer["features"]:
        if feat["type"] != kmvt.GEOM_POINT:
            raise ValueError(
                f"overzoom_point_tiles: non-point feature type "
                f"{feat['type']} in layer {layer_name!r}")
        tag, val = feat["metadata"]["image_id"]
        ids.append(val if tag == "st" else str(val))
        x, y = feat["geometry"][0]
        xs.append(x)
        ys.append(y)
    return (ids, np.asarray(xs, dtype=np.int64),
            np.asarray(ys, dtype=np.int64), layer["extent"])


def overzoom_point_tiles(tiles: DataFrame, layer_name: str = "images",
                         child_extent: int = 4096,
                         buffer: int = 128) -> DataFrame:
    """tiles: TILE_SCHEMA rows (zoom, tile_x, tile_y, mvt, ...).  Emits
    the four z+1 children of every parent tile (empty children are
    skipped).  Map-only: no shuffle, no sort — the parent's bytes are
    sufficient.

    ``scale = 2*child_extent / parent_extent`` must be a positive
    integer (1 = the exact double-extent path; 2 = classic same-extent
    overzoom), so coordinates stay integers end-to-end.
    """
    w = int(buffer)
    ext = int(child_extent)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["zoom", "tile_x", "tile_y", "mvt", "feature_count",
                "bytes_len"]
        for pdf in batches:
            rows = []
            for z, tx, ty, mvt in zip(pdf["zoom"], pdf["tile_x"],
                                      pdf["tile_y"], pdf["mvt"]):
                ids, ix, iy, pext = _decode_points(mvt, layer_name)
                twice = 2 * ext
                if twice % pext != 0 or twice // pext < 1:
                    raise ValueError(
                        f"overzoom scale {twice}/{pext} is not a "
                        f"positive integer")
                scale = twice // pext
                sx = ix * scale
                sy = iy * scale
                for qx, qy in _QUADS:
                    cx = sx - qx * ext
                    cy = sy - qy * ext
                    keep = ((cx >= -w) & (cx <= ext + w)
                            & (cy >= -w) & (cy <= ext + w))
                    if not keep.any():
                        continue
                    kids = [i for i, k in zip(ids, keep) if k]
                    out = _finish_point_tile(
                        kids, cx[keep].astype(np.float64),
                        cy[keep].astype(np.float64), layer_name, ext)
                    rows.append((int(z) + 1, int(tx) * 2 + qx,
                                 int(ty) * 2 + qy, out, len(kids),
                                 len(out)))
            yield pd.DataFrame(rows, columns=cols)

    return tiles.select("zoom", "tile_x", "tile_y",
                        "mvt").mapInPandas(fold, TILE_SCHEMA)


def point_tile_id_stats(tiles: DataFrame,
                        layer_name: str = "images") -> DataFrame:
    """Decode-back audit per tile: feature count and the BIGINT sum of
    numeric image_ids (null if any id is non-numeric) — integer
    outputs, so a full encode→overzoom→decode chain can sit under the
    driver's hash-exact oracle gate."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for z, tx, ty, mvt in zip(pdf["zoom"], pdf["tile_x"],
                                      pdf["tile_y"], pdf["mvt"]):
                ids, _, _, _ = _decode_points(mvt, layer_name)
                try:
                    id_sum = sum(int(s) for s in ids)
                except ValueError:
                    id_sum = None
                rows.append((int(z), int(tx), int(ty), len(ids), id_sum))
            yield pd.DataFrame(rows, columns=[
                "zoom", "tile_x", "tile_y", "feature_count", "id_sum"])

    return tiles.select("zoom", "tile_x", "tile_y", "mvt").mapInPandas(
        stats, "zoom int, tile_x long, tile_y long, "
               "feature_count long, id_sum long")


# ---------------------------------------------------------------------------
# generic-geometry overzoom: lines/polygons through the clip kernels
# ---------------------------------------------------------------------------

_GT_NAME = {kmvt.GEOM_POINT: "MultiPoint",
            kmvt.GEOM_LINESTRING: "MultiLineString",
            kmvt.GEOM_POLYGON: "MultiPolygon"}


def _unwrap_val(val):
    """Val tuple -> raw python value for re-encoding.  Number classes
    collapse to Do on the way back out — the reference's own
    convertProps semantics (MvtFeatures.hs:45-53), so self-produced
    tiles (St/Do/B only) round-trip exactly."""
    tag, v = val
    if tag == "st":
        return v if isinstance(v, str) else v.decode("utf-8")
    if tag == "b":
        return bool(v)
    return float(v) if tag in ("do", "fl") else int(v)


def _layer_features_py(layer):
    """Decoded layer -> normalized feature dicts (geometry in PARENT
    tile coords) in wire order, ready for coordinate transform +
    ``encode_features_local``-style staging."""
    out = []
    for f in layer["features"]:
        gt = f["type"]
        if gt == 0:
            continue  # UNKNOWN features carry no parseable geometry
        props = {k: _unwrap_val(v) for k, v in f["metadata"].items()}
        geom = f["geometry"]
        if gt == kmvt.GEOM_POINT:
            parts = [[np.asarray(geom, dtype=np.float64)]]
        elif gt == kmvt.GEOM_LINESTRING:
            parts = [[np.asarray(line, dtype=np.float64)] for line in geom]
        else:
            # decode gives [(outer_closed, [(inner_closed, [])...])] in
            # wire order; _polygon_to_int REVERSES rings[1:] when
            # encoding, so feed the inners reversed to reproduce the
            # parent's wire order
            parts = []
            for outer, inners in geom:
                rings = [np.asarray(outer, dtype=np.float64)]
                rings.extend(np.asarray(r, dtype=np.float64)
                             for r, _ in inners[::-1])
                parts.append(rings)
        out.append({"fid": f["id"], "geom_type": _GT_NAME[gt],
                    "props": props, "parts": parts})
    return out


def _encode_local_counted(features, cfg):
    """encode_features_local + staged-feature count (the pipeline's
    clip/simplify dispatch, minus the projection stage)."""
    from ..kernel import clip as kclip
    from ..kernel import pipeline as kpipe

    window = kclip.buffered_bbox(cfg.buffer, cfg.extent)
    staged = []
    for feat in features:
        parts = kpipe._clip_feature(feat["geom_type"], feat["parts"], window)
        if parts is None:
            continue
        parts = kpipe._simplify_feature(feat["geom_type"], parts,
                                        cfg.simplify)
        if parts is None:
            continue
        staged.append({"fid": feat.get("fid"), "geom_type": feat["geom_type"],
                       "parts": parts, "props": feat.get("props") or {}})
    if not staged:
        return None, 0
    return kpipe._encode_staged(staged, cfg), len(staged)


def overzoom_feature_tiles(tiles: DataFrame, layer_name: str = "features",
                           child_extent: int = 4096,
                           buffer: int = 128) -> DataFrame:
    """Generic-geometry overzoom: z+1 tiles for point/line/polygon
    layers, derived from parent tile BYTES through the reference clip
    kernels — lines re-clip with QuickClip, polygons with
    Sutherland-Hodgman, exactly the algorithms a direct encode runs
    (kernel/pipeline.py dispatch).  Same map-only scale shape as
    ``overzoom_point_tiles``.

    Unlike the point path there is no byte-equality claim against a
    direct encode: the parent's clip already introduced boundary
    vertices and its simplification ran at parent resolution, so the
    children are derived from the PARENT's published geometry (the
    standard overzoom contract).  No re-simplification (simplify
    "none"): parent geometry is already simplified.  Feature ids,
    property values (St/Do/B), and wire order are preserved."""
    from ..kernel.pipeline import TileConfig

    w = int(buffer)
    ext = int(child_extent)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["zoom", "tile_x", "tile_y", "mvt", "feature_count",
                "bytes_len"]
        for pdf in batches:
            rows = []
            for z, tx, ty, mvt in zip(pdf["zoom"], pdf["tile_x"],
                                      pdf["tile_y"], pdf["mvt"]):
                layer = kmvt.decode_tile(bytes(mvt))[layer_name]
                pext = layer["extent"]
                twice = 2 * ext
                if twice % pext != 0 or twice // pext < 1:
                    raise ValueError(
                        f"overzoom scale {twice}/{pext} is not a "
                        f"positive integer")
                scale = float(twice // pext)
                feats = _layer_features_py(layer)
                for qx, qy in _QUADS:
                    moved = []
                    for f in feats:
                        parts = [[r * scale - np.array(
                                    [qx * ext, qy * ext], dtype=np.float64)
                                  for r in part] for part in f["parts"]]
                        moved.append({"fid": f["fid"],
                                      "geom_type": f["geom_type"],
                                      "props": f["props"], "parts": parts})
                    cfg = TileConfig(layer_name, int(z) + 1,
                                     int(tx) * 2 + qx, int(ty) * 2 + qy,
                                     buffer=w, extent=ext, quantize=1,
                                     simplify="none")
                    out, n = _encode_local_counted(moved, cfg)
                    if n:
                        rows.append((int(z) + 1, int(tx) * 2 + qx,
                                     int(ty) * 2 + qy, out, n, len(out)))
            yield pd.DataFrame(rows, columns=cols)

    return tiles.select("zoom", "tile_x", "tile_y",
                        "mvt").mapInPandas(fold, TILE_SCHEMA)
