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

Points only: the geotagged-image payload this engine targets is point
features (north rule).  Lines/polygons would additionally need the
clip kernels on the decoded geometry; re-encode those from raw
features via ``feature_tiles`` instead.
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
