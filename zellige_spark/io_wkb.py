"""WKB (OGC Well-Known Binary) point columns: the interop format of
GeoParquet / PostGIS / every spatial warehouse.

The reference ingests GeoJSON only; real 100-TB corpora arrive as
GeoParquet whose geometry column is WKB bytes — these operators bridge
that: ``wkb_points`` encodes (lon, lat) to standard little-endian WKB
Point values, ``parse_wkb_points`` reads WKB Points of EITHER byte
order (the spec allows both; readers must accept both).  Layout (OGC
06-103r4 / ISO 19125 §8.2.3): 1 byte order marker (0 big / 1 little),
uint32 geometry type (1 = Point), two float64 (x=lon, y=lat) — 21
bytes per point.

Both directions run as Arrow-batched ``mapInPandas`` with the byte
work vectorized across the batch (one ndarray view per batch on the
fixed-21-byte fast path, never per-row struct calls), because Spark
has no IEEE-754 reinterpret Column function.  Map-only: no shuffle at
any scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_WKB_POINT_LE = 1
_LEN = 21


def wkb_point_bytes(lon: np.ndarray, lat: np.ndarray) -> list:
    """Vectorized encode: (n,) lon/lat doubles -> n little-endian WKB
    Point byte strings (one (n, 21) uint8 matrix, sliced per row)."""
    n = len(lon)
    buf = np.empty((n, _LEN), dtype=np.uint8)
    buf[:, 0] = 1                                   # little-endian
    buf[:, 1:5] = np.frombuffer(
        np.uint32(_WKB_POINT_LE).tobytes(), dtype=np.uint8)
    buf[:, 5:13] = np.asarray(lon, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.asarray(lat, dtype="<f8").view(np.uint8).reshape(n, 8)
    raw = buf.tobytes()
    return [raw[i * _LEN:(i + 1) * _LEN] for i in range(n)]


def parse_wkb_point_bytes(vals) -> tuple:
    """Vectorized decode: iterable of WKB Point buffers -> (lon, lat)
    float64 arrays.  Accepts both byte orders; raises ValueError on a
    non-Point type or truncated buffer (strict, like the MVT
    decoder)."""
    bs = [bytes(v) for v in vals]
    n = len(bs)
    if any(len(b) != _LEN for b in bs):
        raise ValueError("WKB Point buffer is not 21 bytes")
    flat = np.frombuffer(b"".join(bs), dtype=np.uint8).reshape(n, _LEN)
    order = flat[:, 0]
    if not np.isin(order, (0, 1)).all():
        raise ValueError("bad WKB byte-order marker")
    lon = np.empty(n, dtype=np.float64)
    lat = np.empty(n, dtype=np.float64)
    for little in (True, False):
        m = order == (1 if little else 0)
        if not m.any():
            continue
        dt_u32 = "<u4" if little else ">u4"
        dt_f8 = "<f8" if little else ">f8"
        sub = flat[m]
        gtype = np.ascontiguousarray(sub[:, 1:5]).view(dt_u32).reshape(-1)
        if not (gtype == 1).all():
            raise ValueError("WKB geometry type is not Point")
        lon[m] = np.ascontiguousarray(sub[:, 5:13]).view(dt_f8).reshape(-1)
        lat[m] = np.ascontiguousarray(sub[:, 13:21]).view(dt_f8).reshape(-1)
    return lon, lat


def wkb_points(df: DataFrame, lon_col: str = "lon", lat_col: str = "lat",
               out_col: str = "wkb") -> DataFrame:
    """Attach a little-endian WKB Point binary column."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[out_col] = wkb_point_bytes(
                pdf[lon_col].to_numpy(dtype=np.float64),
                pdf[lat_col].to_numpy(dtype=np.float64))
            yield out

    # df.schema is CACHED on the frame — never .add() onto it (the
    # mutation corrupts the input plan's schema); build a fresh one
    schema = StructType(list(df.schema.fields)
                        + [StructField(out_col, BinaryType())])
    return df.mapInPandas(enc, schema)


def parse_wkb_points(df: DataFrame, wkb_col: str = "wkb",
                     lon_col: str = "lon",
                     lat_col: str = "lat") -> DataFrame:
    """Decode a WKB Point binary column into lon/lat doubles (either
    byte order)."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            lon, lat = parse_wkb_point_bytes(pdf[wkb_col])
            out[lon_col] = lon
            out[lat_col] = lat
            yield out

    schema = StructType(list(df.schema.fields)
                        + [StructField(lon_col, DoubleType()),
                           StructField(lat_col, DoubleType())])
    return df.mapInPandas(dec, schema)
