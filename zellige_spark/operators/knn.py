"""kNN lookup via XYZ-grid k-ring expansion (NEW operator, SURVEY.md §2.10).

The north rule asks for "kNN lookups via H3 k-ring expansion"; the cell
index here is the XYZ/Google grid (faithful to zellige's tile model,
SphericalMercator.hs:113-121), behind the same k-ring idea: a query
point's candidates live in the Chebyshev rings of its cell at an index
zoom.  A real H3 backend can slot in by swapping the two cell functions.

Plan shape (all Catalyst-friendly):
  queries -> explode (2R+1)^2 neighbor cells      [small fan-out]
  data    -> cell id at index zoom                 [column math]
  join on cell_key (data side shuffles once; query side is broadcast
  when small) -> great-circle distance (column math)
  -> row_number() over (query) order by dist, id  <= k

Correctness guarantee: with ``max_ring`` R, results equal brute-force
kNN whenever the true k-th neighbor lies within R-1 rings of the query
cell (a candidate in ring R can beat an undiscovered point just outside
R's boundary only if the k-th distance exceeds (R-1) cell widths).
Callers size R from data density — or use ``knn_bruteforce`` as the
oracle; tests assert ring-vs-brute equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import tiles as T


def haversine_km(lon1, lat1, lon2, lat2):
    """Great-circle distance (km) as a Column expression — identical
    formula is emitted in the DuckDB oracles."""
    r1 = F.radians(lat1)
    r2 = F.radians(lat2)
    dlat = r2 - r1
    dlon = F.radians(lon2) - F.radians(lon1)
    a = (F.sin(dlat / 2) ** 2 + F.cos(r1) * F.cos(r2) * F.sin(dlon / 2) ** 2)
    return F.lit(2.0 * 6371.0) * F.asin(F.sqrt(a))


def knn_kring(queries: DataFrame, data: DataFrame, k: int = 5,
              index_zoom: int = 5, max_ring: int = 2,
              query_id: str = "query_id", data_id: str = "image_id",
              q_lon: str = "lon", q_lat: str = "lat",
              d_lon: str = "lon", d_lat: str = "lat",
              broadcast_queries: bool = True) -> DataFrame:
    """k nearest data points per query point via k-ring candidate join."""
    n = 2 ** index_zoom

    d = T.with_web_mercator(data, d_lon, d_lat)
    dx, dy = T.tile_xy(F.col("x3857"), F.col("y3857"), F.lit(index_zoom))
    d = (d.withColumn("cell_key", T.tile_key(F.lit(index_zoom), dx, dy))
          .select(F.col(data_id), F.col(d_lon).alias("_dlon"),
                  F.col(d_lat).alias("_dlat"), "cell_key"))

    q = T.with_web_mercator(queries, q_lon, q_lat)
    qx, qy = T.tile_xy(F.col("x3857"), F.col("y3857"), F.lit(index_zoom))
    q = q.withColumn("_qx", qx).withColumn("_qy", qy)
    shifts = [(sx, sy) for sx in range(-max_ring, max_ring + 1)
              for sy in range(-max_ring, max_ring + 1)]
    q = q.withColumn("_s", F.explode(F.array(*[
        F.struct(F.lit(sx).alias("sx"), F.lit(sy).alias("sy")) for sx, sy in shifts])))
    # wrap x around the antimeridian; clamp y at the poles
    cx = F.pmod(F.col("_qx") + F.col("_s.sx"), F.lit(n))
    cy = F.col("_qy") + F.col("_s.sy")
    q = (q.filter((cy >= 0) & (cy < n))
          .withColumn("cell_key", T.tile_key(F.lit(index_zoom), cx, cy))
          .select(F.col(query_id), F.col(q_lon).alias("_qlon"),
                  F.col(q_lat).alias("_qlat"), "cell_key")
          # antimeridian wrap can alias two shifts onto one cell when
          # 2*max_ring+1 > 2^zoom; dedup so candidates pair up once
          .dropDuplicates([query_id, "cell_key"]))
    if broadcast_queries:
        q = F.broadcast(q)

    cand = q.join(d, "cell_key", "inner")
    cand = cand.withColumn("dist_km", haversine_km(
        F.col("_qlon"), F.col("_qlat"), F.col("_dlon"), F.col("_dlat")))
    w = Window.partitionBy(query_id).orderBy(F.col("dist_km").asc(), F.col(data_id).asc())
    out = (cand.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") <= k)
               .select(F.col(query_id),
                       F.col(data_id).alias("neighbor_id"),
                       F.col("dist_km"),
                       F.col("rn").alias("rank")))
    return out


def knn_bruteforce(queries: DataFrame, data: DataFrame, k: int = 5,
                   query_id: str = "query_id", data_id: str = "image_id",
                   q_lon: str = "lon", q_lat: str = "lat",
                   d_lon: str = "lon", d_lat: str = "lat") -> DataFrame:
    """Cross-join oracle (queries broadcast) — correct for any k, O(Q*N)."""
    q = F.broadcast(queries.select(F.col(query_id), F.col(q_lon).alias("_qlon"),
                                   F.col(q_lat).alias("_qlat")))
    d = data.select(F.col(data_id), F.col(d_lon).alias("_dlon"), F.col(d_lat).alias("_dlat"))
    cand = q.crossJoin(d).withColumn("dist_km", haversine_km(
        F.col("_qlon"), F.col("_qlat"), F.col("_dlon"), F.col("_dlat")))
    w = Window.partitionBy(query_id).orderBy(F.col("dist_km").asc(), F.col(data_id).asc())
    return (cand.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k)
                .select(F.col(query_id),
                        F.col(data_id).alias("neighbor_id"),
                        F.col("dist_km"),
                        F.col("rn").alias("rank")))
