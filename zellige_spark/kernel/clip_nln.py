"""Nicholl-Lee-Nicholl line clipping (cross-validation oracle).

Faithful port of the reference's 3-region case analysis with 90/180/270
degree rotations and axis reflections
(/root/reference/src/Data/Geometry/Clip/Internal/LineNichollLeeNicholl.hs:69-358).
Results agree with QuickClip / Cohen-Sutherland / Liang-Barsky on the
shared spec (test/.../ClipSpec.hs:214-230) — kept as a per-segment
scalar oracle, never the Spark hot path.

The rect here is (left, top, right, bottom) with the y axis pointing
up after ``reverse_rect_y_axis`` (LineNichollLeeNicholl.hs:69-70,
355-358); a point is (x, y).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .clip import Bbox, _segments_to_line

Pt = Tuple[float, float]
Rect = Tuple[float, float, float, float]  # left, top, right, bottom
Line = Tuple[Pt, Pt]


def _delta(l: Line) -> Pt:
    (p1x, p1y), (p2x, p2y) = l
    return (p2x - p1x, p2y - p1y)


def _left_product(r: Rect, l: Line, d: Pt) -> float:
    return (r[0] - l[0][0]) * d[1]


def _top_product(r: Rect, l: Line, d: Pt) -> float:
    return (r[1] - l[0][1]) * d[0]


def _right_product(r: Rect, l: Line, d: Pt) -> float:
    return (r[2] - l[0][0]) * d[1]


def _bottom_product(r: Rect, l: Line, d: Pt) -> float:
    return (r[3] - l[0][1]) * d[0]


def _clip_left(r: Rect, l: Line, d: Pt, left_p: float) -> Pt:
    return (r[0], l[0][1] + left_p / d[0])


def _clip_top(r: Rect, l: Line, d: Pt, top_p: float) -> Pt:
    return (l[0][0] + top_p / d[1], r[1])


def _clip_right(r: Rect, l: Line, d: Pt, right_p: float) -> Pt:
    return (r[2], l[0][1] + right_p / d[0])


def _clip_bottom(r: Rect, l: Line, d: Pt, bottom_p: float) -> Pt:
    return (l[0][0] + bottom_p / d[1], r[3])


def _rot_pt_90(p: Pt) -> Pt:
    return (p[1], -p[0])


def _rot_pt_180(p: Pt) -> Pt:
    return (-p[0], -p[1])


def _rot_pt_270(p: Pt) -> Pt:
    return (-p[1], p[0])


def _refl_pt_xmy(p: Pt) -> Pt:
    return (-p[1], -p[0])


def _refl_pt_x(p: Pt) -> Pt:
    return (p[0], -p[1])


def _map_line(f, l: Line) -> Line:
    return (f(l[0]), f(l[1]))


def _rot_rect_90(r: Rect) -> Rect:
    left, top, right, bottom = r
    return (bottom, -left, top, -right)


def _rot_rect_180(r: Rect) -> Rect:
    left, top, right, bottom = r
    return (-right, -bottom, -left, -top)


def _rot_rect_270(r: Rect) -> Rect:
    left, top, right, bottom = r
    return (-top, right, -bottom, left)


def _refl_rect_xmy(r: Rect) -> Rect:
    left, top, right, bottom = r
    return (-top, -left, -bottom, -right)


def _refl_rect_x(r: Rect) -> Rect:
    left, top, right, bottom = r
    return (left, -bottom, right, -top)


def _p1_left_top_p2_bottom_right(r, l, d, bottom_p) -> Pt:
    right_p = _right_product(r, l, d)
    if bottom_p > right_p:
        return _clip_bottom(r, l, d, bottom_p)
    return _clip_right(r, l, d, right_p)


def _p1_left_top_p2_bottom_prime(r, l, d, bottom_p) -> Pt:
    if l[1][0] > r[2]:
        return _p1_left_top_p2_bottom_right(r, l, d, bottom_p)
    return _clip_bottom(r, l, d, bottom_p)


def _p1_left_top_p2_bottom(r, l, d, left_p) -> Optional[Line]:
    bottom_p = _bottom_product(r, l, d)
    if bottom_p > left_p:
        return None
    return (_clip_left(r, l, d, left_p), _p1_left_top_p2_bottom_prime(r, l, d, bottom_p))


def _p1_left_top_p2_middle(r, l, d) -> Pt:
    if l[1][0] > r[2]:
        return _clip_right(r, l, d, _right_product(r, l, d))
    return l[1]


def _p1_left_top_p2_not_left_top_prime(r, l, d, left_p) -> Optional[Line]:
    if l[1][1] < r[3]:
        return _p1_left_top_p2_bottom(r, l, d, left_p)
    return (_clip_left(r, l, d, left_p), _p1_left_top_p2_middle(r, l, d))


def _p1_left_top_p2_not_left_top(r, l, d) -> Optional[Line]:
    top_p = _top_product(r, l, d)
    left_p = _left_product(r, l, d)
    if top_p > left_p:
        return _p1_left_top_p2_not_left_top_prime(r, l, d, left_p)
    res = _p1_left_top_p2_not_left_top_prime(
        _refl_rect_xmy(r), _map_line(_refl_pt_xmy, l), _refl_pt_xmy(d), top_p)
    return None if res is None else _map_line(_refl_pt_xmy, res)


def _p1_left_top_p2_not_left(r, l) -> Optional[Line]:
    if l[1][1] > r[1]:
        return None
    return _p1_left_top_p2_not_left_top(r, l, _delta(l))


def _p1_left_middle_p2_middle_not_left(r, l, d) -> Pt:
    if l[1][0] > r[2]:
        return _clip_right(r, l, d, _right_product(r, l, d))
    return l[1]


def _p1_left_middle_p2_right_bottom(r, l, d, bottom_p) -> Pt:
    right_p = _right_product(r, l, d)
    if bottom_p > right_p:
        return _clip_bottom(r, l, d, bottom_p)
    return _clip_right(r, l, d, right_p)


def _p1_left_middle_p2_bottom_not_left_prime(r, l, d, bottom_p) -> Pt:
    if l[1][0] > r[2]:
        return _p1_left_middle_p2_right_bottom(r, l, d, bottom_p)
    return _clip_bottom(r, l, d, bottom_p)


def _p1_left_middle_p2_bottom_not_left(r, l) -> Optional[Line]:
    d = _delta(l)
    left_p = _left_product(r, l, d)
    bottom_p = _bottom_product(r, l, d)
    if bottom_p > left_p:
        return None
    return (_clip_left(r, l, d, left_p),
            _p1_left_middle_p2_bottom_not_left_prime(r, l, d, bottom_p))


def _p1_left_middle_p2_not_left(r, l) -> Optional[Line]:
    if l[1][1] < r[3]:
        return _p1_left_middle_p2_bottom_not_left(r, l)
    if l[1][1] > r[1]:
        res = _p1_left_middle_p2_bottom_not_left(
            _refl_rect_x(r), _map_line(_refl_pt_x, l))
        return None if res is None else _map_line(_refl_pt_x, res)
    d = _delta(l)
    left_p = _left_product(r, l, d)
    return (_clip_left(r, l, d, left_p), _p1_left_middle_p2_middle_not_left(r, l, d))


def _p1_left(r, l) -> Optional[Line]:
    if l[1][0] < r[0]:
        return None
    if l[0][1] > r[1]:
        return _p1_left_top_p2_not_left(r, l)
    if l[0][1] < r[3]:
        res = _p1_left_top_p2_not_left(_refl_rect_x(r), _map_line(_refl_pt_x, l))
        return None if res is None else _map_line(_refl_pt_x, res)
    return _p1_left_middle_p2_not_left(r, l)


def _p1_centre_middle_p2_left_top(r, l) -> Pt:
    d = _delta(l)
    left_p = _left_product(r, l, d)
    top_p = _top_product(r, l, d)
    if top_p > left_p:
        return _clip_top(r, l, d, top_p)
    return _clip_left(r, l, d, left_p)


def _p1_centre_middle_p2_left(r, l) -> Pt:
    if l[1][1] > r[1]:
        return _p1_centre_middle_p2_left_top(r, l)
    if l[1][1] < r[3]:
        return _rot_pt_270(_p1_centre_middle_p2_left_top(
            _rot_rect_90(r), _map_line(_rot_pt_90, l)))
    d = _delta(l)
    return _clip_left(r, l, d, _left_product(r, l, d))


def _p1_centre_middle(r, l) -> Pt:
    p2 = l[1]
    if p2[0] < r[0]:
        return _p1_centre_middle_p2_left(r, l)
    if p2[0] > r[2]:
        return _rot_pt_180(_p1_centre_middle_p2_left(
            _rot_rect_180(r), _map_line(_rot_pt_180, l)))
    d = _delta(l)
    if p2[1] > r[1]:
        return _clip_top(r, l, d, _top_product(r, l, d))
    if p2[1] < r[3]:
        return _clip_bottom(r, l, d, _bottom_product(r, l, d))
    return p2


def _p1_centre_bottom(r, l) -> Optional[Line]:
    if l[1][1] < r[3]:
        return None
    res = _p1_left_middle_p2_not_left(_rot_rect_90(r), _map_line(_rot_pt_90, l))
    return None if res is None else _map_line(_rot_pt_270, res)


def _p1_centre_top(r, l) -> Optional[Line]:
    if l[1][1] > r[1]:
        return None
    res = _p1_left_middle_p2_not_left(_rot_rect_270(r), _map_line(_rot_pt_270, l))
    return None if res is None else _map_line(_rot_pt_90, res)


def _p1_centre(r, l) -> Optional[Line]:
    if l[0][1] < r[3]:
        return _p1_centre_bottom(r, l)
    if l[0][1] > r[1]:
        return _p1_centre_top(r, l)
    return (l[0], _p1_centre_middle(r, l))


def _nln_clip_line(r: Rect, l: Line) -> Optional[Line]:
    if l[0][0] < r[0]:
        return _p1_left(r, l)
    if l[0][0] > r[2]:
        res = _p1_left(_rot_rect_180(r), _map_line(_rot_pt_180, l))
        return None if res is None else _map_line(_rot_pt_180, res)
    return _p1_centre(r, l)


def clip_line_nln(bbox: Bbox, pts: np.ndarray) -> Optional[np.ndarray]:
    """Clip one LineString with NLN; None when nothing survives.
    ``bbox`` is the engine's (min_x, min_y, max_x, max_y); the NLN rect
    expects (left, top, right, bottom) via reverseRectYAxis."""
    min_x, min_y, max_x, max_y = (float(v) for v in bbox)
    r: Rect = (min_x, max_y, max_x, min_y)  # reverseRectYAxis
    pts = np.asarray(pts, dtype=np.float64)
    segs = []
    for i in range(len(pts) - 1):
        l: Line = ((float(pts[i, 0]), float(pts[i, 1])),
                   (float(pts[i + 1, 0]), float(pts[i + 1, 1])))
        res = _nln_clip_line(r, l)
        if res is not None:
            (a, b) = res
            segs.append([a[0], a[1], b[0], b[1]])
    line = _segments_to_line(np.asarray(segs, dtype=np.float64).reshape(-1, 4))
    return line if len(line) >= 2 else None


def clip_multiline_nln(bbox: Bbox, lines: Sequence[np.ndarray]) -> List[np.ndarray]:
    out: List[np.ndarray] = []
    for pts in lines:
        res = clip_line_nln(bbox, pts)
        if res is not None:
            out.insert(0, res)
    return out
