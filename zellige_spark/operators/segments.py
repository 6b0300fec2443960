"""Exact segment-intersection join: trajectory crossing detection.

"Which entities' tracks cross?" — route-conflict detection, contact
tracing, shipping-lane analysis.  Tracks are polylines of integer-
microdegree points (time-ordered per entity); two entities cross when
any segment of one intersects any segment of the other.  All geometry
is exact int64 orientation math (deltas < 2^29, cross products < 2^57)
including the degenerate cases (endpoint touch, collinear overlap) —
no float epsilon, engine-independent, oracle hash-exact.

Scale plan: the naive all-pairs test is O(S^2) over segments — the
DuckDB oracle runs it literally, and it is exactly what cannot run at
10^12 segments.  The operator instead:

1. builds segments with one window over (entity: ts, id) — a single
   Exchange over the points;
2. covers each segment's bbox with cells of a fixed coarse grid
   (integer division over shifted non-negative microdegrees — exact
   and identical everywhere) and explodes the cover;
3. equi-joins candidates ON THE CELL KEY (entity_a < entity_b as a
   post-filter), so only spatially co-located segments ever meet —
   for real tracks with short legs the candidate set is ~linear in S;
4. runs the exact intersection predicate as pure JVM Column math
   (whole-stage codegen), dedups multi-cell hits on the segment-pair
   id, and counts crossings per entity pair.

Correctness of the cover: two intersecting segments both contain the
intersection point, so both bbox covers contain its cell — every
intersecting pair co-occurs in at least one cell.  (The synthetic
event lattice produces world-spanning legs, so its candidate set
approaches all-pairs; the plan's payoff is on real short-leg tracks,
and the predicate cost is the same either way.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["track_segments", "segments_intersect", "crossing_pairs"]


def track_segments(df: DataFrame, entity_col: str = "user_id",
                   ts_col: str = "ts", id_col: str = "event_id",
                   x_col: str = "ux", y_col: str = "uy") -> DataFrame:
    """Consecutive-point segments per entity in (ts, id) order:
    (entity, seg_id = id of the LATER endpoint, x1, y1, x2, y2)."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    return (df.select(F.col(entity_col),
                      F.col(id_col).alias("seg_id"),
                      F.lag(x_col).over(w).alias("x1"),
                      F.lag(y_col).over(w).alias("y1"),
                      F.col(x_col).alias("x2"),
                      F.col(y_col).alias("y2"))
            .filter(F.col("x1").isNotNull()))


def _orient(ox: Column, oy: Column, ax: Column, ay: Column,
            bx: Column, by: Column) -> Column:
    """cross(a - o, b - o) — exact on int64 microdegrees."""
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _on_segment(px, py, qx, qy, rx, ry) -> Column:
    """r (already known collinear with pq) lies within pq's bbox."""
    return (F.least(px, qx) <= rx) & (rx <= F.greatest(px, qx)) & \
           (F.least(py, qy) <= ry) & (ry <= F.greatest(py, qy))


def segments_intersect(x1, y1, x2, y2, x3, y3, x4, y4) -> Column:
    """Closed intersection test for segments (p1,p2) and (p3,p4):
    proper crossings plus endpoint touches and collinear overlaps."""
    z = F.lit(0)
    d1 = _orient(x3, y3, x4, y4, x1, y1)
    d2 = _orient(x3, y3, x4, y4, x2, y2)
    d3 = _orient(x1, y1, x2, y2, x3, y3)
    d4 = _orient(x1, y1, x2, y2, x4, y4)
    proper = (((d1 > z) & (d2 < z)) | ((d1 < z) & (d2 > z))) & \
             (((d3 > z) & (d4 < z)) | ((d3 < z) & (d4 > z)))
    return (proper
            | ((d1 == z) & _on_segment(x3, y3, x4, y4, x1, y1))
            | ((d2 == z) & _on_segment(x3, y3, x4, y4, x2, y2))
            | ((d3 == z) & _on_segment(x1, y1, x2, y2, x3, y3))
            | ((d4 == z) & _on_segment(x1, y1, x2, y2, x4, y4)))


def _with_cells(segs: DataFrame, nx: int, ny: int,
                x0: int, x1: int, y0: int, y1: int) -> DataFrame:
    """Explode each segment to the grid cells covering its bbox.
    Shifted coords are non-negative, so truncating `div` == floor."""
    wx = (x1 - x0 + nx) // nx
    wy = (y1 - y0 + ny) // ny
    seg = (segs
           .withColumn("_cx0", F.expr(f"(least(x1, x2) - ({x0})) div {wx}"))
           .withColumn("_cx1", F.expr(f"(greatest(x1, x2) - ({x0})) div {wx}"))
           .withColumn("_cy0", F.expr(f"(least(y1, y2) - ({y0})) div {wy}"))
           .withColumn("_cy1", F.expr(f"(greatest(y1, y2) - ({y0})) div {wy}")))
    # _cx0/_cy0 (the bbox's lowest covered cell per axis) survive for
    # the join's ownership filter — see crossing_pairs.
    return (seg
            .withColumn("_cx", F.explode(F.sequence("_cx0", "_cx1")))
            .withColumn("_cy", F.explode(F.sequence("_cy0", "_cy1")))
            .drop("_cx1", "_cy1"))


def crossing_pairs(segs: DataFrame, entity_col: str = "user_id",
                   nx: int = 8, ny: int = 4,
                   x0: int = -180_000_000, x1: int = 180_000_000,
                   y0: int = -85_000_000, y1: int = 85_000_000) -> DataFrame:
    """Entity pairs with crossing tracks: (entity_a, entity_b,
    n_crossings) where n_crossings counts intersecting segment pairs;
    entity_a < entity_b."""
    cells = _with_cells(segs, nx, ny, x0, x1, y0, y1)
    a = cells.alias("a")
    b = cells.alias("b")
    ec = entity_col
    # Ownership filter: a co-occurring segment pair's covered cell
    # ranges intersect on both axes, so the cell holding the
    # component-wise max of the two bbox-low cells lies in BOTH covers
    # and is unique — each candidate pair runs the exact intersection
    # predicate in exactly ONE cell (the _bbox_grid_candidates
    # interval-ownership trick).  Without it a world-spanning segment
    # pair was tested once per shared cell (8x the predicate volume on
    # this grid; measured 124 s -> 79 s at sf0.1 — the join's slot
    # enumeration remains, only the per-slot work shrinks), and the post-hit
    # pair DISTINCT existed only to undo that duplication — with
    # single ownership it is dropped outright.
    cand = a.join(b, (F.col("a._cx") == F.col("b._cx"))
                  & (F.col("a._cy") == F.col("b._cy"))
                  & (F.col(f"a.{ec}") < F.col(f"b.{ec}"))
                  & (F.col("a._cx") == F.greatest("a._cx0", "b._cx0"))
                  & (F.col("a._cy") == F.greatest("a._cy0", "b._cy0")))
    hit = cand.filter(segments_intersect(
        F.col("a.x1"), F.col("a.y1"), F.col("a.x2"), F.col("a.y2"),
        F.col("b.x1"), F.col("b.y1"), F.col("b.x2"), F.col("b.y2")))
    pairs = hit.select(F.col(f"a.{ec}").alias("entity_a"),
                       F.col("a.seg_id").alias("seg_a"),
                       F.col(f"b.{ec}").alias("entity_b"),
                       F.col("b.seg_id").alias("seg_b"))
    return (pairs.groupBy("entity_a", "entity_b")
            .agg(F.count(F.lit(1)).alias("n_crossings")))


def snap_to_segments(df: DataFrame, segments: list,
                     x_col: str = "px", y_col: str = "py") -> DataFrame:
    """Nearest-segment snap (the map-matching primitive): for every
    point, the closest segment of a constant dim network and the
    EXACT floored squared distance — all-integer geometry, no float
    term anywhere (NEW vs the reference, which has no joins).

    ``segments`` is a driver-side constant list of
    ``(seg_id, ax, ay, bx, by)`` tuples in the same integer units as
    the point columns (millidegrees in the driver query; any unit with
    coordinate magnitudes <= ~1e6 keeps every product inside the
    DECIMAL(38) headroom).  Point-to-segment distance uses the clamped
    projection: ``dot <= 0`` -> distance to A, ``dot >= |AB|^2`` ->
    distance to B, else the perpendicular case where
    ``d2 = (|AP|^2 * |AB|^2 - dot^2) DIV |AB|^2`` runs in exact
    DECIMAL(38,0) arithmetic (intermediates reach ~1e23, past int64)
    and floors back to BIGINT.  The oracle twin computes the identical
    integers in DuckDB HUGEINT — exactness needs equal INTEGERS, not a
    shared float expression tree.

    Scale shape: the network is a literal, so there is NO join and NO
    shuffle — each segment's distance is one expression, the argmin is
    ``array_min`` over an array<struct<d2, seg_id>> (lexicographic:
    distance, then lowest seg_id for exact ties), and the whole
    operator is a single map-only projection that parallelizes by
    input split.  For networks too big for a literal (beyond a few
    hundred segments), block both sides to grid cells and equi-join on
    the cell key instead — the ``crossing_pairs`` pattern above.

    Output: input columns + (seg_id, snap_d2)."""
    x, y = x_col, y_col
    structs = []
    for sid, ax, ay, bx, by in segments:
        ax, ay, bx, by = int(ax), int(ay), int(bx), int(by)
        abx, aby = bx - ax, by - ay
        ab2 = abx * abx + aby * aby
        if ab2 == 0:
            raise ValueError(f"degenerate segment {sid}")
        dot = f"(({x} - ({ax})) * ({abx}) + ({y} - ({ay})) * ({aby}))"
        ap2 = (f"(({x} - ({ax})) * ({x} - ({ax})) "
               f"+ ({y} - ({ay})) * ({y} - ({ay})))")
        bp2 = (f"(({x} - ({bx})) * ({x} - ({bx})) "
               f"+ ({y} - ({by})) * ({y} - ({by})))")
        num = (f"(CAST({ap2} AS DECIMAL(20,0)) * {ab2} "
               f"- CAST({dot} AS DECIMAL(20,0)) * CAST({dot} AS DECIMAL(20,0)))")
        d2 = (f"CASE WHEN {dot} <= 0 THEN {ap2} "
              f"WHEN {dot} >= {ab2} THEN {bp2} "
              f"ELSE CAST({num} DIV {ab2} AS BIGINT) END")
        structs.append(F.struct(F.expr(d2).cast("long").alias("d2"),
                                F.lit(int(sid)).alias("seg_id")))
    best = F.array_min(F.array(*structs))
    return df.withColumn("seg_id", best["seg_id"].cast("long")) \
             .withColumn("snap_d2", best["d2"])
