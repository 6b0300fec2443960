"""Distributed convex hulls per entity group (exact integer geometry).

"What is the spatial footprint of each entity?" — per-seller coverage,
per-source crawl footprint, per-cluster extent.  Points carry INTEGER
coordinates (the driver query uses microdegrees derived from the same
integer lattice on both engines), so every orientation test is an exact
int64 cross product — no float epsilon, engine-independent, oracle
hash-exact.

Semantics: the hull of a group is every point ON the hull boundary,
INCLUDING points interior to an edge (the deterministic closed-set
definition: p is kept iff some direction through p and another point
has the whole group in its closed left half-plane).  Collinear runs are
common here because the test lattice is linear in the key, so the
closed definition is the one both engines can agree on exactly.
Duplicate coordinates are assumed absent (distinct lattice points).

Scale plan — the hull-of-hulls law (hull(A ∪ B) = hull(hull(A) ∪
hull(B))) makes this a two-level aggregation, the same shape as a
partial-agg combine:

1. local: groupBy (group, shard = xxhash64(key) % shards) and run an
   O(n log n) monotone chain per shard inside `applyInPandas` — each
   Arrow batch reduces to its local boundary (for quasi-uniform points
   the local hull is ~O(log n) rows, i.e. the first shuffle ships
   almost nothing).
2. merge: groupBy (group) over the surviving candidates and run the
   same chain once — input is bounded by shards x local-hull size, not
   by raw rows.

Global-boundary points are boundary points of every subset containing
them, so level 1 never drops a true hull point — the two-level result
is EXACTLY the single-pass hull (test-asserted across shard counts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["boundary_indices", "convex_hull"]


def _akl_prune(xy: np.ndarray) -> np.ndarray:
    """Akl-Toussaint octagon prune: indices of points NOT strictly
    inside the convex octagon of the 8 directional extremes.  Strictly
    interior points are strictly inside the hull, so dropping them
    never loses a boundary point (points ON the octagon are kept).
    Fully vectorized — this is what keeps the sequential chain O(small)
    on multi-million-row shards."""
    x = xy[:, 0].astype(np.int64)
    y = xy[:, 1].astype(np.int64)
    ext = [int(np.argmin(x)), int(np.argmin(x + y)), int(np.argmin(y)),
           int(np.argmax(x - y)), int(np.argmax(x)), int(np.argmax(x + y)),
           int(np.argmax(y)), int(np.argmin(x - y))]  # CCW octagon
    poly = []
    for i in ext:  # collapse consecutive duplicates (keeps edges nonzero)
        if not poly or (xy[i] != xy[poly[-1]]).any():
            poly.append(i)
    if len(poly) > 1 and (xy[poly[0]] == xy[poly[-1]]).all():
        poly.pop()
    if len(poly) < 3:
        return np.arange(len(xy))
    inside = np.ones(len(xy), dtype=bool)
    for a, b in zip(poly, poly[1:] + poly[:1]):
        ax, ay = int(xy[a, 0]), int(xy[a, 1])
        bx, by = int(xy[b, 0]), int(xy[b, 1])
        inside &= (bx - ax) * (y - ay) - (by - ay) * (x - ax) > 0
    return np.flatnonzero(~inside)


def boundary_indices(xy: np.ndarray) -> np.ndarray:
    """Row indices of ``xy`` (int64 (n,2)) on the convex-hull boundary,
    edge-interior collinear points INCLUDED (monotone chain popping
    only on strict right turns).  Exact int64 cross products — inputs
    must keep |coord| < ~2^31 so deltas multiply inside int64."""
    n = len(xy)
    if n <= 2:
        return np.arange(n)
    cand = _akl_prune(xy)
    sub = xy[cand]
    order = cand[np.lexsort((sub[:, 1], sub[:, 0]))]

    def half(idx):
        h: list = []
        for i in idx:
            while len(h) >= 2:
                ax, ay = xy[h[-2]]
                bx, by = xy[h[-1]]
                cx, cy = xy[i]
                if (int(bx - ax) * int(cy - ay)
                        - int(by - ay) * int(cx - ax)) < 0:
                    h.pop()
                else:
                    break
            h.append(i)
        return h

    keep = sorted(set(half(order)) | set(half(order[::-1])))
    return np.asarray(keep, dtype=np.int64)


def _hull_rows(pdf: pd.DataFrame, g: str, k: str, x: str, y: str) -> pd.DataFrame:
    xy = np.stack([pdf[x].to_numpy(np.int64), pdf[y].to_numpy(np.int64)],
                  axis=1)
    return pdf.iloc[boundary_indices(xy)][[g, k, x, y]]


def convex_hull(df: DataFrame, group_col: str, key_col: str,
                x_col: str = "ux", y_col: str = "uy",
                shards: int = 4) -> DataFrame:
    """Hull boundary points per ``group_col``: (group, key, x, y) rows,
    a subset of the input.  Coordinates must be integers (exact
    orientation tests); keys identify rows through both levels."""
    cols = [group_col, key_col, x_col, y_col]
    schema = StructType([StructField(c, LongType()) for c in cols])
    src = df.select(*[F.col(c).cast("long").alias(c) for c in cols])

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return _hull_rows(pdf, group_col, key_col, x_col, y_col)

    shard = F.pmod(F.xxhash64(F.col(key_col)), F.lit(shards))
    local = (src.withColumn("_shard", shard)
             .groupBy(group_col, "_shard")
             .applyInPandas(lambda pdf: run(pdf), schema))
    return local.groupBy(group_col).applyInPandas(lambda pdf: run(pdf),
                                                  schema)
