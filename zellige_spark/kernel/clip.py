"""Clipping kernels (pure numpy, vectorized over segments / ring points).

Semantics mirror the reference zellige encoder exactly — including its
fold-order quirks, which matter for row-set / byte equality:

* Point-in-extent predicate: closed box test
  (/root/reference/src/Data/Geometry/Clip/Internal/Point.hs:36-44).
* QuickClip line clipping (the default for lines, Clip.hs:57-58):
  axis sort + Y reflection + 6 sequential coordinate checks
  (/root/reference/src/Data/Geometry/Clip/Internal/LineQuickClip.hs:72-188).
* Cohen-Sutherland and Liang-Barsky kept as cross-validation oracles
  (LineCohenSutherland.hs:22-103, LineLiangBarsky.hs:25-111).
* Sutherland-Hodgman polygon clipping (the default for polygons):
  fold through 4 window edges, RHS-inclusive ``inside`` test,
  homogeneous line-line intersection
  (/root/reference/src/Data/Geometry/Clip/Internal/PolygonSutherlandHodgman.hs:70-102).
* Segment re-fusion ``segmentToLine`` keeps the first point then every
  odd-indexed point (Clip/Internal/Line.hs:26-31).
* Multi-line / per-line results are PREPENDED via foldl', so surviving
  sub-line order is reversed relative to input (LineQuickClip.hs:49-55).

A clip window is a tuple (min_x, min_y, max_x, max_y); the buffered
window is (-buffer, -buffer, extent+buffer, extent+buffer)
(Clip.hs:42-46).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

Bbox = Tuple[float, float, float, float]


def buffered_bbox(buffer: float, extent: float) -> Bbox:
    """Clip window for a tile: (-buf, -buf, extent+buf, extent+buf).

    Reference: Clip.hs:42-46 (createBoundingBox).
    """
    return (-float(buffer), -float(buffer), float(extent) + float(buffer), float(extent) + float(buffer))


def point_in_extent_mask(bbox: Bbox, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Closed-box containment mask (Clip/Internal/Point.hs:36-44)."""
    min_x, min_y, max_x, max_y = bbox
    return (x >= min_x) & (x <= max_x) & (y >= min_y) & (y <= max_y)


# ---------------------------------------------------------------------------
# QuickClip (default line algorithm)
# ---------------------------------------------------------------------------

def quickclip_segments(bbox: Bbox, pts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Clip every consecutive segment of a polyline to ``bbox``.

    Vectorized translation of LineQuickClip.hs:72-188 (foldLine and the
    checkX..checkY2 steps).  ``pts`` is an (n,2) float array; returns
    (segments (m,4) as x1,y1,x2,y2 in input order, keep mask of length n-1).
    """
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) < 2:
        return np.empty((0, 4)), np.zeros(0, dtype=bool)
    min_x, min_y0, max_x, max_y0 = (float(v) for v in bbox)
    x1 = pts[:-1, 0].copy()
    y1 = pts[:-1, 1].copy()
    x2 = pts[1:, 0].copy()
    y2 = pts[1:, 1].copy()
    n = len(x1)
    keep = np.ones(n, dtype=bool)
    # checkX (LineQuickClip.hs:99-107): sort by x, drop if fully outside in x
    swap = x1 > x2
    keep &= ~(swap & ((x2 > max_x) | (x1 < min_x)))
    keep &= ~(~swap & ((x1 > max_x) | (x2 < min_x)))
    sx1 = np.where(swap, x2, x1); sy1 = np.where(swap, y2, y1)
    sx2 = np.where(swap, x1, x2); sy2 = np.where(swap, y1, y2)
    x1, y1, x2, y2 = sx1, sy1, sx2, sy2
    # checkY (LineQuickClip.hs:121-132): reflect (negate y, flip window) when y1>y2
    reflect = y1 > y2
    keep &= ~(reflect & ((y2 > max_y0) | (y1 < min_y0)))
    keep &= ~(~reflect & ((y1 > max_y0) | (y2 < min_y0)))
    y1 = np.where(reflect, -y1, y1)
    y2 = np.where(reflect, -y2, y2)
    min_y = np.where(reflect, -max_y0, min_y0)
    max_y = np.where(reflect, -min_y0, max_y0)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        # checkX1 (:140-149): enter through the left edge
        m = keep & (x1 < min_x)
        new_y1 = y1 + (min_x - x1) * (y2 - y1) / (x2 - x1)
        keep &= ~(m & (new_y1 > max_y))
        y1 = np.where(m, new_y1, y1)
        x1 = np.where(m, min_x, x1)
        # checkY1 (:157-166): enter through the bottom edge
        m = keep & (y1 < min_y)
        new_x1 = x1 + (min_y - y1) * (x2 - x1) / (y2 - y1)
        keep &= ~(m & (new_x1 > max_x))
        x1 = np.where(m, new_x1, x1)
        y1 = np.where(m, min_y, y1)
        # checkX2 (:172-177): exit through the right edge
        m = keep & (x2 > max_x)
        new_y2 = y1 + (max_x - x1) * (y2 - y1) / (x2 - x1)
        y2 = np.where(m, new_y2, y2)
        x2 = np.where(m, max_x, x2)
        # checkY2 (:183-188): exit through the top edge
        m = keep & (y2 > max_y)
        new_x2 = x1 + (max_y - y1) * (x2 - x1) / (y2 - y1)
        x2 = np.where(m, new_x2, x2)
        y2 = np.where(m, max_y, y2)
    # switchBack then un-reflect (LineQuickClip.hs:77-88)
    bx1 = np.where(swap, x2, x1); by1 = np.where(swap, y2, y1)
    bx2 = np.where(swap, x1, x2); by2 = np.where(swap, y1, y2)
    by1 = np.where(reflect, -by1, by1)
    by2 = np.where(reflect, -by2, by2)
    segs = np.stack([bx1, by1, bx2, by2], axis=1)
    return segs[keep], keep


def _segments_to_line(segs: np.ndarray) -> np.ndarray:
    """Fuse clipped segments back into a polyline point sequence.

    Flatten endpoints then keep the first point plus every odd-indexed
    point (segmentToLine, Clip/Internal/Line.hs:26-31).  Faithful to the
    reference even for non-contiguous segments.
    """
    if len(segs) == 0:
        return np.empty((0, 2))
    flat = segs.reshape(-1, 2)  # p1,p2,p1,p2,... in segment order
    if len(flat) < 2:
        return np.empty((0, 2))
    return np.concatenate([flat[:1], flat[1::2]], axis=0)


def clip_line_qc(bbox: Bbox, pts: np.ndarray) -> Optional[np.ndarray]:
    """Clip one LineString; None when nothing (or <2 points) survives."""
    segs, _ = quickclip_segments(bbox, pts)
    line = _segments_to_line(segs)
    return line if len(line) >= 2 else None


def clip_multiline_qc(bbox: Bbox, lines: Sequence[np.ndarray]) -> List[np.ndarray]:
    """Clip each member line; surviving lines in REVERSED input order
    (foldl' + prepend at LineQuickClip.hs:49-55)."""
    out: List[np.ndarray] = []
    for pts in lines:
        res = clip_line_qc(bbox, pts)
        if res is not None:
            out.insert(0, res)
    return out


# ---------------------------------------------------------------------------
# Cohen-Sutherland (cross-validation oracle)
# ---------------------------------------------------------------------------

_INSIDE, _LEFT, _RIGHT, _BOTTOM, _TOP = 0, 1, 2, 3, 4  # Ord order of OutCode


def _outcode(bbox: Bbox, x: float, y: float) -> int:
    """Outcode with the reference's precedence (LineCohenSutherland.hs:97-103):
    Top before Bottom before Right before Left."""
    min_x, min_y, max_x, max_y = bbox
    if y > max_y:
        return _TOP
    if y < min_y:
        return _BOTTOM
    if x > max_x:
        return _RIGHT
    if x < min_x:
        return _LEFT
    return _INSIDE


def _cs_clip_point(code: int, bbox: Bbox, p1, p2):
    min_x, min_y, max_x, max_y = bbox
    x1, y1 = p1
    x2, y2 = p2
    if code == _LEFT:
        return (min_x, y1 + (y2 - y1) * (min_x - x1) / (x2 - x1))
    if code == _RIGHT:
        return (max_x, y1 + (y2 - y1) * (max_x - x1) / (x2 - x1))
    if code == _BOTTOM:
        return (x1 + (x2 - x1) * (min_y - y1) / (y2 - y1), min_y)
    return (x1 + (x2 - x1) * (max_y - y1) / (y2 - y1), max_y)


def clip_line_cs(bbox: Bbox, pts: np.ndarray) -> Optional[np.ndarray]:
    """Cohen-Sutherland per-segment clip (LineCohenSutherland.hs:22-103).

    Per-segment Python loop — used only as a test oracle, never in the
    Spark hot path (QuickClip is the default, as in Clip.hs:57-58).
    """
    pts = np.asarray(pts, dtype=np.float64)
    segs = []
    for i in range(len(pts) - 1):
        a = (float(pts[i, 0]), float(pts[i, 1]))
        b = (float(pts[i + 1, 0]), float(pts[i + 1, 1]))
        o1, o2 = _outcode(bbox, *a), _outcode(bbox, *b)
        # evalDiffKeepSame: iteratively clip the point with the larger outcode
        while o1 != o2:
            if o1 > o2:
                a = _cs_clip_point(o1, bbox, a, b)
                o1 = _outcode(bbox, *a)
            else:
                b = _cs_clip_point(o2, bbox, a, b)
                o2 = _outcode(bbox, *b)
        # isSame: drop segments left fully on one outside side
        if o1 == o2 and o1 != _INSIDE:
            continue
        segs.append([a[0], a[1], b[0], b[1]])
    line = _segments_to_line(np.asarray(segs, dtype=np.float64).reshape(-1, 4))
    return line if len(line) >= 2 else None


def clip_multiline_cs(bbox: Bbox, lines: Sequence[np.ndarray]) -> List[np.ndarray]:
    out: List[np.ndarray] = []
    for pts in lines:
        res = clip_line_cs(bbox, pts)
        if res is not None:
            out.insert(0, res)
    return out


# ---------------------------------------------------------------------------
# Liang-Barsky (cross-validation oracle)
# ---------------------------------------------------------------------------

def clip_line_lb(bbox: Bbox, pts: np.ndarray) -> Optional[np.ndarray]:
    """Liang-Barsky parametric clip, vectorized (LineLiangBarsky.hs:25-111)."""
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) < 2:
        return None
    min_x, min_y, max_x, max_y = (float(v) for v in bbox)
    x1 = pts[:-1, 0]; y1 = pts[:-1, 1]
    dx = pts[1:, 0] - x1; dy = pts[1:, 1] - y1
    t1 = np.zeros_like(x1); t2 = np.ones_like(x1)
    keep = np.ones(len(x1), dtype=bool)
    for p, q in (((-dx), (x1 - min_x)), (dx, (max_x - x1)),
                 ((-dy), (y1 - min_y)), (dy, (max_y - y1))):
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            r = q / p
        zero = p == 0
        keep &= ~(zero & (q < 0))
        lt = keep & (p < 0)
        keep &= ~(lt & (r > t2))
        upd1 = lt & (r > t1) & keep
        t1 = np.where(upd1, r, t1)
        gt = keep & (p > 0)
        keep &= ~(gt & (r < t1))
        upd2 = gt & (r < t2) & keep
        t2 = np.where(upd2, r, t2)
    nx1 = x1 + t1 * dx; ny1 = y1 + t1 * dy
    nx2 = x1 + t2 * dx; ny2 = y1 + t2 * dy
    segs = np.stack([nx1, ny1, nx2, ny2], axis=1)[keep]
    line = _segments_to_line(segs)
    return line if len(line) >= 2 else None


def clip_multiline_lb(bbox: Bbox, lines: Sequence[np.ndarray]) -> List[np.ndarray]:
    out: List[np.ndarray] = []
    for pts in lines:
        res = clip_line_lb(bbox, pts)
        if res is not None:
            out.insert(0, res)
    return out


# ---------------------------------------------------------------------------
# Sutherland-Hodgman polygon clipping (default polygon algorithm)
# ---------------------------------------------------------------------------

def _window_edges(bbox: Bbox):
    """The 4 directed window edges, in mkBBoxPoly order
    (Geography.hs:67-72): closing edge (p4,p1) first, then (p1,p2)...

    corner order p1=(x1,y1) p2=(x2,y1) p3=(x2,y2) p4=(x1,y2).
    """
    x1, y1, x2, y2 = bbox
    p1, p2, p3, p4 = (x1, y1), (x2, y1), (x2, y2), (x1, y2)
    return [(p4, p1), (p1, p2), (p2, p3), (p3, p4)]


def _sh_one_pass(poly: np.ndarray, a, b) -> np.ndarray:
    """One Sutherland-Hodgman pass against directed window edge (a,b).

    Vectorized translation of ``foo``/``clipEdges``
    (PolygonSutherlandHodgman.hs:75-86): polygon edges iterate in
    pointsToLines order ((last,first) first), results accumulate by
    PREPENDING whole blocks, so the output is block-reversed.
    ``inside`` is the RHS-inclusive half-plane test (:101-102).
    """
    n = len(poly)
    if n <= 2:
        return np.empty((0, 2))
    ax, ay = a
    bx, by = b
    s = np.roll(poly, 1, axis=0)  # edge i: (s[i], e[i]); edge 0 = (last, first)
    e = poly
    ins_e = (bx - ax) * (e[:, 1] - ay) >= (by - ay) * (e[:, 0] - ax)
    ins_s = (bx - ax) * (s[:, 1] - ay) >= (by - ay) * (s[:, 0] - ax)
    # homogeneous line-line intersection (lineIntersectPoint, :88-98);
    # window edge is (x1,y1)-(x2,y2), polygon edge is (x1',y1')-(x2',y2')
    dx = ax - bx
    dy = ay - by
    dxp = s[:, 0] - e[:, 0]
    dyp = s[:, 1] - e[:, 1]
    n1 = ax * by - ay * bx
    n2 = s[:, 0] * e[:, 1] - s[:, 1] * e[:, 0]
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        d = dx * dyp - dy * dxp
        ix = (n1 * dxp - n2 * dx) / d
        iy = (n1 * dyp - n2 * dy) / d
    keep_e = ins_e
    keep_ip = ins_e != ins_s
    # assemble blocks in REVERSE edge order; block layout per edge: [e, ip]
    order = np.arange(n - 1, -1, -1)
    cand = np.empty((n, 2, 2), dtype=np.float64)
    cand[:, 0, 0] = e[order, 0]
    cand[:, 0, 1] = e[order, 1]
    cand[:, 1, 0] = ix[order]
    cand[:, 1, 1] = iy[order]
    mask = np.stack([keep_e[order], keep_ip[order]], axis=1)
    return cand.reshape(-1, 2)[mask.reshape(-1)]


def sh_clip_ring(bbox: Bbox, ring: np.ndarray) -> Optional[np.ndarray]:
    """Clip one closed linear ring to the window; returns the closed
    result ring or None when it degenerates
    (clipPolyPoints + closeIfNot, PolygonSutherlandHodgman.hs:70-73,
    Clip/Internal/Polygon.hs:10-18).
    """
    poly = np.asarray(ring, dtype=np.float64)
    for a, b in _window_edges(bbox):
        poly = _sh_one_pass(poly, a, b)
    if len(poly) < 2:
        return None
    if poly[0, 0] != poly[-1, 0] or poly[0, 1] != poly[-1, 1]:
        poly = np.concatenate([poly, poly[:1]], axis=0)
    # LinearRing.fromSeq needs a ring of >=4 closed points to be valid
    if len(poly) < 4:
        return None
    return poly


def clip_polygon_sh(bbox: Bbox, rings: Sequence[np.ndarray]) -> List[np.ndarray]:
    """Clip each ring of a polygon, keeping ring order; empty list means
    the polygon is dropped (clippedPoly, PolygonSutherlandHodgman.hs:55-56)."""
    out = []
    for ring in rings:
        res = sh_clip_ring(bbox, ring)
        if res is not None:
            out.append(res)
    return out


def clip_multipolygon_sh(bbox: Bbox, polys: Sequence[Sequence[np.ndarray]]) -> List[List[np.ndarray]]:
    """fmap of clip_polygon_sh over member polygons.  NOTE: faithful to
    clippedMultiPoly (PolygonSutherlandHodgman.hs:38-39) — per-polygon
    empty ring lists are KEPT; the feature is dropped only when the
    polygon list itself is empty."""
    return [clip_polygon_sh(bbox, rings) for rings in polys]


# ---------------------------------------------------------------------------
# Polygon QuickClip (experimental path in the reference; never reached
# from clipFeature — kept for §2.5 inventory parity)
# ---------------------------------------------------------------------------

def qc_clip_ring(bbox: Bbox, ring: np.ndarray) -> Optional[np.ndarray]:
    """Clip one ring by treating its edges as independent QuickClip line
    segments, flattening ALL endpoint pairs (lineToPointXY — no
    segmentToLine dedup) and re-closing
    (PolygonQuickClip.hs:41-62).  Can produce open/incorrect rings —
    faithful to the reference's experimental behavior.
    """
    pts = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if len(pts) <= 2:
        return None  # foo: short input -> empty -> closeIfNot Nothing
    # pointsToLines: closing edge (last, first) first, then consecutive
    edges = np.concatenate([
        np.concatenate([pts[-1:], pts[:1]], axis=1),
        np.concatenate([pts[:-1], pts[1:]], axis=1),
    ], axis=0)
    segs = []
    for e in edges:
        res, _ = quickclip_segments(bbox, e.reshape(2, 2))
        if len(res):
            segs.append(res[0])
    if not segs:
        return None
    flat = np.asarray(segs).reshape(-1, 2)  # lineToPointXY: all endpoints
    if flat[0, 0] != flat[-1, 0] or flat[0, 1] != flat[-1, 1]:
        flat = np.concatenate([flat, flat[:1]], axis=0)
    return flat if len(flat) >= 4 else None


def clip_polygon_qc(bbox: Bbox, rings: Sequence[np.ndarray]) -> Optional[List[np.ndarray]]:
    """traverse semantics (PolygonQuickClip.hs:30,39): if ANY ring of
    the polygon clips away, the WHOLE polygon is dropped (None)."""
    out = []
    for ring in rings:
        res = qc_clip_ring(bbox, ring)
        if res is None:
            return None
        out.append(res)
    return out
