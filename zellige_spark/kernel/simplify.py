"""Simplification + winding-order kernels (pure numpy).

Semantics mirror the reference:

* ``douglas_peucker`` — classic RDP with the reference's exact recursion
  shape: split at the 1-based max-distance index (first max wins,
  strictly-greater comparison), halves joined as ``left ++ tail right``
  (/root/reference/src/Data/Geometry/Simplify/DouglasPeucker.hs:19-37).
* ``shortest_distance`` — point-to-segment with endpoint clamping
  (DouglasPeucker.hs:40-48).
* ``surveyor`` — shoelace area over the point sequence as given
  (closed rings include the duplicate closing point)
  (/root/reference/src/Data/Geometry/WindingOrder.hs:23-36);
  area <= 0 means clockwise (:38-39).
* ``rewind`` — reverse the interior keeping first/last pinned (:41-45).
* ``ensure_order`` — force CW (outer ring) / CCW (inner rings) (:47-51).
* ``simplify_ring`` / ``simplify_line`` — dispatch per
  Simplify.hs:117-120: DouglasPeucker applies epsilon=1.0 (hard-coded)
  then ensureOrder; NoAlgorithm and Visvalingam are the identity.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

NO_ALGORITHM = "none"
DOUGLAS_PEUCKER = "douglas-peucker"
VISVALINGAM = "visvalingam"

CLOCKWISE = "cw"
ANTICLOCKWISE = "ccw"


def _shortest_distances(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distance of every point to segment (a,b) with endpoint clamping,
    vectorized (DouglasPeucker.hs:40-48)."""
    if a[0] == b[0] and a[1] == b[1]:
        d = pts - a
        return np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)
    delta = b - a
    with np.errstate(invalid="ignore", divide="ignore"):
        # a != b but delta^2 can underflow to 0 -> u = NaN; both NaN
        # comparisons are False so the 'otherwise' branch runs with a
        # NaN projection, matching Haskell's NaN propagation exactly
        u = ((pts[:, 0] - a[0]) * delta[0] + (pts[:, 1] - a[1]) * delta[1]) / (
            delta[0] * delta[0] + delta[1] * delta[1]
        )
    proj = np.where(
        u[:, None] < 0,
        a[None, :],
        np.where(u[:, None] > 1, b[None, :], a[None, :] + u[:, None] * delta[None, :]),
    )
    d = pts - proj
    return np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)


def douglas_peucker(epsilon: float, pts: np.ndarray) -> np.ndarray:
    """RDP simplification, faithful to the reference recursion.

    splitAtMaxDistance returns a 1-based index of the FIRST max-distance
    point (strictly-greater running comparison == np.argmax); recursion
    keeps ``take index`` / ``drop (index-1)`` halves and joins dropping
    the duplicated split point (DouglasPeucker.hs:19-37).
    """
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    n = len(pts)
    if n == 0:
        return pts
    if n == 1:
        # firstAndLastPoint needs >=2 elements -> empty (DouglasPeucker.hs:53-55)
        return pts[:0]
    d = _shortest_distances(pts, pts[0], pts[-1])
    dmax = float(d.max())
    if dmax > epsilon:
        index = int(np.argmax(d)) + 1
        left = douglas_peucker(epsilon, pts[:index])
        right = douglas_peucker(epsilon, pts[index - 1:])
        return np.concatenate([left, right[1:]], axis=0)
    return np.stack([pts[0], pts[-1]], axis=0)


def surveyor(pts: np.ndarray) -> float:
    """Shoelace area of the point sequence as given (WindingOrder.hs:23-36)."""
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) == 0:
        return 0.0
    x = pts[:, 0]
    y = pts[:, 1]
    yn = np.roll(y, -1)
    yp = np.roll(y, 1)
    return float(np.sum(x * (yn - yp)) / 2.0)


def is_clockwise(pts: np.ndarray) -> bool:
    return surveyor(pts) <= 0


def rewind(pts: np.ndarray) -> np.ndarray:
    """Reverse the interior of the sequence keeping first & last pinned."""
    pts = np.asarray(pts, dtype=np.float64)
    if len(pts) < 3:
        return pts
    return np.concatenate([pts[:1], pts[1:-1][::-1], pts[-1:]], axis=0)


def ensure_order(order: str, pts: np.ndarray) -> np.ndarray:
    if order == CLOCKWISE:
        return pts if is_clockwise(pts) else rewind(pts)
    return rewind(pts) if is_clockwise(pts) else pts


def simplify_points(algo: str, order: str, pts: np.ndarray) -> np.ndarray:
    """simplifyUsing (Simplify.hs:117-120): DP epsilon=1.0 + ensureOrder."""
    if algo == DOUGLAS_PEUCKER:
        return ensure_order(order, douglas_peucker(1.0, np.asarray(pts, dtype=np.float64)))
    return np.asarray(pts, dtype=np.float64)


def simplify_line(algo: str, pts: np.ndarray) -> Optional[np.ndarray]:
    """Lines simplify with the Clockwise winding slot (Simplify.hs:111-112);
    result must still be a valid LineString (>=2 points)."""
    out = simplify_points(algo, CLOCKWISE, pts)
    return out if len(out) >= 2 else None


def simplify_ring(algo: str, order: str, ring: np.ndarray) -> Optional[np.ndarray]:
    """Rings: ring 0 forced Clockwise, subsequent rings AntiClockwise
    (Simplify.hs:92-93); result must be a valid closed ring (>=4 points)."""
    out = simplify_points(algo, order, ring)
    return out if len(out) >= 4 else None
