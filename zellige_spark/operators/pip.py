"""Point-in-polygon join (NEW operator per SURVEY.md §2.10 / north rule).

Two physical strategies, chosen by polygon-table size:

* ``pip_join_broadcast`` — polygons broadcast to every task (the common
  case: coverage/district tables are thousands of rows).  Plan:
  bbox-prefilter equi-free broadcast nested-loop is avoided by first
  doing a broadcast range join on bboxes, then an Arrow-batched numpy
  ray-cast refine.  No shuffle of the fact table at all.

* ``pip_join_bucketed`` — for big polygon tables: both sides get XYZ
  cell ids at an index zoom (polygons: explode over the cells their
  bbox covers), then a plain shuffle equi-join on cell_key + refine +
  dedup.  Co-locates by cell, so each task only sees local candidates.

Boundary convention: the refine is even-odd ray casting; the reference's
only boundary statement is the Sutherland-Hodgman half-plane test being
inclusive (>=, PolygonSutherlandHodgman.hs:101-102); points exactly on
polygon edges are inside-by-convention here as well (we count edges
touching the ray as crossings per the standard asymmetric rule, so
on-edge results are float-determined; synthetic data avoids exact hits).
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import tiles as T


def _rings_to_arrays(rr) -> List[np.ndarray]:
    """Arrow hands nested list columns back as object arrays of object
    arrays; normalize each ring to a dense (k,2) float array."""
    return [np.array([np.asarray(p, dtype=np.float64) for p in ring]) for ring in rr]


def ray_cast_mask(px: np.ndarray, py: np.ndarray, rings: List[np.ndarray]) -> np.ndarray:
    """Vectorized even-odd point-in-polygon over all rings (holes flip
    parity).  px/py are (n,) point arrays; rings are closed (k,2) arrays."""
    inside = np.zeros(len(px), dtype=bool)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        x1, y1 = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        for i in range(len(x1)):
            a_y, b_y = y1[i], y2[i]
            if a_y == b_y:
                continue
            cond = (py >= min(a_y, b_y)) & (py < max(a_y, b_y))
            if not cond.any():
                continue
            t = (py - a_y) / (b_y - a_y)
            xs = x1[i] + t * (x2[i] - x1[i])
            inside ^= cond & (xs > px)
    return inside


def ray_cast_mask_pairs(px, py, ring_list) -> np.ndarray:
    """Row-wise variant: point i tested against ring_list[i]."""
    out = np.zeros(len(px), dtype=bool)
    for i in range(len(px)):
        out[i] = bool(ray_cast_mask(px[i:i + 1], py[i:i + 1], ring_list[i])[0])
    return out


def pip_join_broadcast(points: DataFrame, polygons: DataFrame,
                       lon_col: str = "lon", lat_col: str = "lat",
                       how: str = "inner") -> DataFrame:
    """points x polygons where point in polygon; polygons broadcast.

    polygons schema: polygon_id, name, rings array<array<array<double>>>,
    min_lon/min_lat/max_lon/max_lat (bbox prefilter columns).
    Output: point columns + polygon_id, name.
    """
    polys = F.broadcast(polygons.select("polygon_id", "name", "rings",
                                        "min_lon", "min_lat", "max_lon", "max_lat"))
    cond = ((F.col(lon_col) >= F.col("min_lon")) & (F.col(lon_col) <= F.col("max_lon"))
            & (F.col(lat_col) >= F.col("min_lat")) & (F.col(lat_col) <= F.col("max_lat")))
    cand = points.join(polys, cond, how="inner")

    point_cols = points.columns

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mask = np.zeros(len(pdf), dtype=bool)
            pos = pdf.reset_index(drop=True)
            px = pos[lon_col].to_numpy(dtype=np.float64)
            py = pos[lat_col].to_numpy(dtype=np.float64)
            # vectorize per polygon: one ray-cast over all its candidate points
            for _, idx in pos.groupby("polygon_id").indices.items():
                rings = _rings_to_arrays(pos["rings"].iloc[idx[0]])
                mask[idx] = ray_cast_mask(px[idx], py[idx], rings)
            out = pos.loc[mask, point_cols + ["polygon_id", "name"]]
            if len(out):
                yield out

    out_schema = cand.select(*point_cols, "polygon_id", "name").schema
    return cand.mapInPandas(refine, out_schema)


def _polygon_cells(min_lon, min_lat, max_lon, max_lat, zoom: int):
    """All XYZ cells a bbox covers at ``zoom`` (numpy helper)."""
    from ..kernel import mercator as km

    x0, y0 = km.xy3857_to_tile(km.lon_to_x(min_lon), km.lat_to_y(max_lat), zoom)
    x1, y1 = km.xy3857_to_tile(km.lon_to_x(max_lon), km.lat_to_y(min_lat), zoom)
    cells = []
    for tx in range(int(x0), int(x1) + 1):
        for ty in range(int(y0), int(y1) + 1):
            cells.append((zoom << 56) | (tx << 28) | ty)
    return cells


def pip_join_bucketed(points: DataFrame, polygons: DataFrame, index_zoom: int = 7,
                      lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Cell-bucketed equi-join for large polygon tables: no broadcast,
    both sides shuffle once on cell_key, AQE handles residual skew."""
    pts = T.with_web_mercator(points, lon_col, lat_col)
    tx, ty = T.tile_xy(F.col("x3857"), F.col("y3857"), F.lit(index_zoom))
    pts = pts.withColumn("cell_key", T.tile_key(F.lit(index_zoom), tx, ty)).drop("x3857", "y3857")

    cells_udf_schema = "array<long>"

    def cells_of(pdf: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in pdf:
            batch = batch.copy()
            batch["cell_keys"] = [
                _polygon_cells(a, b, c, d, index_zoom)
                for a, b, c, d in zip(batch["min_lon"], batch["min_lat"],
                                      batch["max_lon"], batch["max_lat"])
            ]
            yield batch

    from pyspark.sql import types as SqlT

    poly_schema = SqlT.StructType(list(polygons.schema.fields)
                                  + [SqlT.StructField("cell_keys", SqlT.ArrayType(SqlT.LongType()))])
    polys = polygons.mapInPandas(cells_of, poly_schema)
    polys = polys.withColumn("cell_key", F.explode("cell_keys")).drop("cell_keys")

    cand = pts.join(polys, "cell_key", "inner")
    cand = cand.filter((F.col(lon_col) >= F.col("min_lon")) & (F.col(lon_col) <= F.col("max_lon"))
                       & (F.col(lat_col) >= F.col("min_lat")) & (F.col(lat_col) <= F.col("max_lat")))

    point_cols = [c for c in points.columns]

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mask = np.zeros(len(pdf), dtype=bool)
            pos = pdf.reset_index(drop=True)
            px = pos[lon_col].to_numpy(dtype=np.float64)
            py = pos[lat_col].to_numpy(dtype=np.float64)
            # vectorize per polygon: one ray-cast over all its candidate points
            for _, idx in pos.groupby("polygon_id").indices.items():
                rings = _rings_to_arrays(pos["rings"].iloc[idx[0]])
                mask[idx] = ray_cast_mask(px[idx], py[idx], rings)
            out = pos.loc[mask, point_cols + ["polygon_id", "name"]]
            if len(out):
                yield out

    out_schema = cand.select(*point_cols, "polygon_id", "name").schema
    # a polygon can cover several cells but each point lives in exactly
    # one cell at index_zoom, so no dedup needed post-refine
    return cand.mapInPandas(refine, out_schema)
