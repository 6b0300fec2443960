"""Spherical-mercator projection kernel (pure numpy, vectorized).

Semantics mirror the reference zellige encoder
(/root/reference/src/Data/Geometry/SphericalMercator.hs:9-121):

* ``lon_to_x``  — EPSG:4326 lon -> EPSG:3857 meters, clamped above at
  +MAX_EXTENTS (SphericalMercator.hs:100-104).
* ``lat_to_y``  — lat -> 3857 meters via R*log(tan(pi/4 + lat/2)),
  clamped below at -MAX_EXTENTS (SphericalMercator.hs:106-111).
* ``tile_bbox`` — (z,x,y) -> 3857 bbox.  NOTE: min_y is the TOP edge
  (the larger value); the Y span is negative so the affine transform
  flips into screen-style Y-down coords (SphericalMercator.hs:113-121).
* ``lonlat_to_tile_local`` — 3857 meters -> tile-local pixel doubles
  (SphericalMercator.hs:83-94), with optional half-even quantization
  (``newQuantize``, SphericalMercator.hs:96-97) applied only when
  quantize_pixels > 1.

All functions accept scalars or numpy arrays and are fully vectorized.
"""

from __future__ import annotations

import numpy as np

WGS84_MAJOR_RADIUS = 6378137.0
MAX_EXTENTS = 20037508.342789244


def lon_to_x(lon):
    """Longitude (degrees) -> EPSG:3857 X meters, clamped at +MAX_EXTENTS."""
    x = WGS84_MAJOR_RADIUS * (np.asarray(lon, dtype=np.float64) / 180.0 * np.pi)
    return np.minimum(x, MAX_EXTENTS)


def lat_to_y(lat):
    """Latitude (degrees) -> EPSG:3857 Y meters, clamped at -MAX_EXTENTS.

    tan/log are evaluated through extended precision (np.longdouble) and
    rounded back to float64: numpy's SIMD float64 tan/log differ from C
    libm (what GHC's Double instance calls) by 1 ulp on ~25-40% of
    inputs, while this route matches libm bitwise on >99.9% of inputs
    and on every reference fixture golden — cheap insurance for the
    byte-for-byte geometry-command requirement.
    """
    rad = np.asarray(lat, dtype=np.float64) / 180.0 * np.pi
    # the tan/log ARGUMENTS are float64 (as in Haskell); only the
    # transcendental evaluation runs in extended precision
    a = (np.pi * 0.25 + 0.5 * rad).astype(np.longdouble)
    t = np.tan(a).astype(np.float64)
    y = WGS84_MAJOR_RADIUS * np.log(t.astype(np.longdouble)).astype(np.float64)
    return np.maximum(y, -MAX_EXTENTS)


def tile_bbox(z, x, y):
    """(zoom, tile_x, tile_y) -> (min_x, min_y, max_x, max_y) in 3857 meters.

    min_y is the TOP edge (min_y > max_y): the Y span is deliberately
    negative so that the downstream affine lands in screen coords.
    """
    z = np.asarray(z, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    resolution = MAX_EXTENTS * 2.0 / (2.0 ** z)
    min_x = -MAX_EXTENTS + x * resolution
    min_y = MAX_EXTENTS - y * resolution
    max_x = -MAX_EXTENTS + x * resolution + resolution
    max_y = MAX_EXTENTS - y * resolution - resolution
    return min_x, min_y, max_x, max_y


def quantize(pixels: float, v):
    """Snap to multiples of ``pixels`` with banker's (half-even) rounding.

    numpy's np.round matches Haskell ``round`` (round-half-even).
    """
    return np.round(np.asarray(v, dtype=np.float64) / pixels) * pixels


def lonlat_to_tile_local(lon, lat, extents: int, quantize_pixels: int, bbox):
    """Project lon/lat arrays to tile-local pixel doubles.

    ``bbox`` is the (min_x, min_y, max_x, max_y) of the target tile from
    :func:`tile_bbox` (min_y = top edge).  Returns (px, py) float64 arrays.
    """
    min_x, min_y, max_x, max_y = bbox
    span_x = max_x - min_x
    span_y = max_y - min_y
    x = (lon_to_x(lon) - min_x) * float(extents) / span_x
    y = (lat_to_y(lat) - min_y) * float(extents) / span_y
    if quantize_pixels > 1:
        qp = float(quantize_pixels)
        x = quantize(qp, x)
        y = quantize(qp, y)
    return x, y


def xy3857_to_tile(x3857, y3857, zoom):
    """Inverse of :func:`tile_bbox` for points: 3857 meters -> integer
    (tile_x, tile_y) at ``zoom``.  Used for tile assignment (the NEW
    operator required by the north rule; no reference file:line).

    Edge points exactly on MAX_EXTENTS are clamped into the last cell.
    """
    zoom = np.asarray(zoom)
    n = np.power(2.0, zoom)
    resolution = MAX_EXTENTS * 2.0 / n
    tx = np.floor((np.asarray(x3857, dtype=np.float64) + MAX_EXTENTS) / resolution)
    ty = np.floor((MAX_EXTENTS - np.asarray(y3857, dtype=np.float64)) / resolution)
    last = n - 1
    tx = np.clip(tx, 0, last).astype(np.int64)
    ty = np.clip(ty, 0, last).astype(np.int64)
    return tx, ty
