"""Raster <-> vector tile materialization (NEW operators, SURVEY.md §2.10).

* ``rasterize_tiles`` — vector->raster: per tile, bin point features
  into a grid (2D histogram), emit a real PNG (grayscale heat ramp via
  the stdlib-zlib codec) + counts.  groupBy(tile).applyInPandas with
  a numpy kernel.
* ``vectorize_tiles`` — raster->vector: threshold the grid, merge
  horizontal runs into maximal rectangles (row-run marching), emit the
  rectangles as polygon features THROUGH the reference MVT pipeline
  (clip -> simplify -> quantize -> command encoding) in tile-local
  space — the polygons exercise the Sutherland-Hodgman + polygon
  command path end-to-end in Spark.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import synth
from ..kernel import pipeline as kpipe

RASTER_SCHEMA = ("zoom int, tile_x long, tile_y long, grid int, "
                 "n_points long, png binary")


def rasterize_tiles(assigned_px: DataFrame, grid: int = 64,
                    extent: int = 4096) -> DataFrame:
    """assigned_px: rows with zoom/tile_x/tile_y/px/py (tile-local).
    Output: one raster row per tile with a grayscale PNG heatmap."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        px = pdf["px"].to_numpy(dtype=np.float64)
        py = pdf["py"].to_numpy(dtype=np.float64)
        scale = grid / float(extent)
        gx = np.clip((px * scale).astype(np.int64), 0, grid - 1)
        gy = np.clip((py * scale).astype(np.int64), 0, grid - 1)
        hist = np.zeros((grid, grid), dtype=np.int64)
        np.add.at(hist, (gy, gx), 1)
        mx = hist.max()
        luma = (np.rint(hist * (255.0 / mx)).astype(np.uint8)
                if mx > 0 else hist.astype(np.uint8))
        rgb = np.stack([luma] * 3, axis=2)
        png = synth.encode_png(rgb)
        return pd.DataFrame({
            "zoom": [int(pdf["zoom"].iloc[0])],
            "tile_x": [int(pdf["tile_x"].iloc[0])],
            "tile_y": [int(pdf["tile_y"].iloc[0])],
            "grid": [grid],
            "n_points": [len(pdf)],
            "png": [png],
        })

    return (assigned_px.select("zoom", "tile_x", "tile_y", "px", "py")
            .groupBy("zoom", "tile_x", "tile_y").applyInPandas(run, RASTER_SCHEMA))


def mask_to_rect_rings(mask: np.ndarray, cell: float) -> List[np.ndarray]:
    """Greedy row-run rectangle merge: horizontal runs of True cells,
    merged downward while the identical (x0, x1) span repeats.  Returns
    closed clockwise rings in tile-local px (y-down => clockwise is the
    screen-CW outer-ring convention, Simplify.hs:92-93)."""
    h, w = mask.shape
    open_spans = {}  # (x0, x1) -> start row
    rings: List[np.ndarray] = []

    def runs_of(row: np.ndarray):
        if not row.any():
            return []
        d = np.diff(np.concatenate([[0], row.view(np.int8), [0]]))
        starts = np.nonzero(d == 1)[0]
        ends = np.nonzero(d == -1)[0]
        return list(zip(starts.tolist(), ends.tolist()))

    def emit(span, y0, y1):
        x0, x1 = span
        # clockwise by the reference's shoelace sign (surveyor <= 0,
        # WindingOrder.hs:38-39) for the outer-ring convention
        ring = np.array([
            [x0 * cell, y0 * cell],
            [x0 * cell, y1 * cell],
            [x1 * cell, y1 * cell],
            [x1 * cell, y0 * cell],
            [x0 * cell, y0 * cell],
        ], dtype=np.float64)
        rings.append(ring)

    for y in range(h + 1):
        spans = set(runs_of(mask[y])) if y < h else set()
        for span in list(open_spans):
            if span not in spans:
                emit(span, open_spans.pop(span), y)
        for span in spans:
            open_spans.setdefault(span, y)
    return rings


VECTOR_SCHEMA = ("zoom int, tile_x long, tile_y long, mvt binary, "
                 "mask_cells long, ring_cells long, parity_ok boolean, "
                 "mvt_features long, roundtrip_ok boolean, "
                 "feature_count long, bytes_len long")


def vectorize_tiles(rasters: DataFrame, threshold: int = 1,
                    extent: int = 4096, layer_name: str = "coverage",
                    simplify: str = "none") -> DataFrame:
    """raster->vector: decode each tile PNG, threshold, merge rectangles,
    and push the polygons through the reference per-tile MVT pipeline
    (tile-local variant — no reprojection)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel import mvt as kmvt

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rgb = synth.decode_png(bytes(r.png))
                luma = rgb[:, :, 0]
                mask = luma >= threshold
                cell = float(extent) / r.grid
                rings = mask_to_rect_rings(mask, cell)
                feats = [{"fid": None, "geom_type": "Polygon",
                          "parts": [[ring]], "props": {"src": "raster"}}
                         for ring in rings]
                cfg = kpipe.TileConfig(name=layer_name, z=int(r.zoom),
                                       x=int(r.tile_x), y=int(r.tile_y),
                                       extent=extent, simplify=simplify)
                mvt = kpipe.encode_features_local(feats, cfg)
                # self-verifying integrity columns (the recall_e3
                # pattern): the rect merge must PARTITION the mask, so
                # shoelace cell-area over the rings equals the decoded
                # mask's popcount; and the emitted protobuf must decode
                # back to exactly feature_count polygons.
                mask_cells = int(mask.sum())
                ring_cells = 0
                for ring in rings:
                    x, y = ring[:, 0], ring[:, 1]
                    area = abs(float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))) / 2.0
                    ring_cells += int(round(area / (cell * cell)))
                dec = kmvt.decode_tile(mvt)
                mvt_features = (len(dec[layer_name]["features"])
                                if layer_name in dec else 0)
                rows.append((int(r.zoom), int(r.tile_x), int(r.tile_y), mvt,
                             mask_cells, ring_cells, ring_cells == mask_cells,
                             mvt_features, mvt_features == len(rings),
                             len(rings), len(mvt)))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "zoom", "tile_x", "tile_y", "mvt",
                    "mask_cells", "ring_cells", "parity_ok",
                    "mvt_features", "roundtrip_ok",
                    "feature_count", "bytes_len"])

    return rasters.mapInPandas(run, VECTOR_SCHEMA)
