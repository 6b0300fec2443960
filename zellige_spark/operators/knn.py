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


# --- CellIndex seam --------------------------------------------------------
#
# Every cell-blocked kNN here (XYZ k-ring below, S2 k-ring in
# operators/s2cells.py, a future H3 backend) decomposes into the same
# three pieces; a backend supplies only the CELL functions:
#   * data-side cell assignment  (one column of cell keys)
#   * query-side ring fan-out    (query rows exploded to ring cells)
#   * a conservative stop bound  (per-query km floor on anything
#     outside the ring block) + the full-coverage ring
# The join + distance + top-k stage (candidate_topk) and the
# ring-doubling driver (adaptive_knn) are shared verbatim, so the two
# shipped backends cannot drift.

def topk_by_distance(cand: DataFrame, k: int, query_id: str,
                     data_id: str) -> DataFrame:
    """Haversine + per-query top-k window over candidate rows carrying
    (_qlon, _qlat, _dlon, _dlat) — the common back half of every kNN
    variant including the brute-force oracle."""
    cand = cand.withColumn("dist_km", haversine_km(
        F.col("_qlon"), F.col("_qlat"), F.col("_dlon"), F.col("_dlat")))
    w = Window.partitionBy(query_id).orderBy(F.col("dist_km").asc(),
                                             F.col(data_id).asc())
    return (cand.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k)
                .select(F.col(query_id),
                        F.col(data_id).alias("neighbor_id"),
                        F.col("dist_km"),
                        F.col("rn").alias("rank")))


def candidate_topk(q: DataFrame, d: DataFrame, k: int, cell_key: str,
                   query_id: str, data_id: str,
                   broadcast_queries: bool = True) -> DataFrame:
    """Shared candidate-join stage: q rows (query_id, _qlon, _qlat,
    cell_key) — already ring-fanned-out — equi-join data rows (data_id,
    _dlon, _dlat, cell_key), then distance + top-k."""
    if broadcast_queries:
        q = F.broadcast(q)
    return topk_by_distance(q.join(d, cell_key, "inner"), k, query_id, data_id)


def adaptive_knn(queries: DataFrame, k: int, round_fn, bound_fn,
                 full_cover_ring: int, start_ring: int,
                 query_id: str, driver_ids_max: int = 100_000) -> DataFrame:
    """Shared ring-doubling driver: ``round_fn(active, ring)`` runs one
    blocked-kNN round over the still-active queries; ``bound_fn(active,
    ring)`` returns (query_id, _bound_km) — a conservative lower bound
    on the distance to anything OUTSIDE the ring block.  A query
    settles once it holds k candidates whose k-th distance is strictly
    under its bound (no undiscovered point can beat it), or
    unconditionally at ``full_cover_ring``.

    Round-6 optimization: each round previously launched ~5 Spark jobs
    (stats agg, two EAGER localCheckpoints, isEmpty) — pure serial
    fixed cost that dominated the small-query-side drivers (knn_s2 ran
    16-27 s on a 25-query / 15k-point input).  When the active query
    side is small (<= ``driver_ids_max``, the adaptive drivers' normal
    shape — the contract-bounded query batch), the satisfied ids are
    collected to the driver ONCE per round and applied as isin()
    filters: one job per round, no joins, no checkpoints, emptiness
    known from a driver counter.  Larger query sides keep the original
    join + eager-checkpoint path.  The settled pieces are lazy
    localCheckpoints either way (they materialize exactly once, at the
    final union).  The settled SET is identical — only the mechanics
    of applying it changed."""
    ring = max(1, start_ring)
    active = queries
    n_active = None
    settled = []
    while True:
        res = round_fn(active, ring)
        if ring >= full_cover_ring:
            settled.append(res)
            break
        stats = (res.groupBy(query_id)
                    .agg(F.count(F.lit(1)).alias("_nc"),
                         F.max("dist_km").alias("_kth")))
        sat = (stats.join(bound_fn(active, ring), query_id)
                    .filter((F.col("_nc") >= k)
                            & (F.col("_kth") < F.col("_bound_km")))
                    .select(query_id))
        if n_active is None:
            n_active = active.count()
        if n_active <= driver_ids_max:
            ids = [r[0] for r in sat.collect()]
            if ids:
                settled.append(res.filter(F.col(query_id).isin(ids))
                                  .localCheckpoint(eager=False))
                active = active.filter(~F.col(query_id).isin(ids))
                n_active -= len(ids)
            if n_active == 0:
                break
        else:
            settled.append(res.join(sat, query_id, "left_semi")
                              .localCheckpoint(eager=True))
            active = (active.join(sat, query_id, "left_anti")
                            .localCheckpoint(eager=True))
            if active.isEmpty():
                break
        ring = min(2 * ring, full_cover_ring)
    out = settled[0]
    for part in settled[1:]:
        out = out.unionByName(part)
    return out


def repartition_by_cell_locality(df: DataFrame, key_col: str,
                                 partitions: int | None = None) -> DataFrame:
    """Shared CellIndex locality layout (the file-pruning half of the
    seam): range-partition rows by a SPATIALLY-ORDERED cell key and
    sort within partitions, so each written file covers a disjoint
    compact key range and parquet min/max stats prune both files and
    row groups for any key-range ("near X") predicate — at 100 TB the
    difference between touching ~everything and a handful of files.

    Backends supply the key column; spatial order is the backend's
    job:  S2's Hilbert cid is spatial order natively
    (`s2cells.repartition_by_s2_locality`), the XYZ grid packs a
    Morton/Z-order interleave of (tile_x, tile_y)
    (`tiles.repartition_by_xyz_locality`), and the hex grid Morton-
    interleaves its offset axial coords
    (`hexgrid.repartition_by_hex_locality`).  All three route here, so
    the layout story cannot drift across backends."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartitionByRange(n, F.col(key_col)).sortWithinPartitions(key_col)


LITERAL_FANOUT_MAX = 4096
"""Ring fan-outs at or below this many cells are emitted as a literal
struct array in the plan (one explode, fully codegen'd); above it the
shifts are generated at runtime via ``sequence`` + explode, so the plan
stays O(1) bytes no matter how wide the ring.  The adaptive drivers'
full-cover rounds (ring ~ 2^zoom at fine index zooms) therefore always
complete — they just take the runtime-fan-out path — instead of
raising, which previously turned sparse-data adaptive runs at
index_zoom >= 9 into mid-query ValueErrors."""


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
    if (2 * max_ring + 1) ** 2 <= LITERAL_FANOUT_MAX:
        shifts = [(sx, sy) for sx in range(-max_ring, max_ring + 1)
                  for sy in range(-max_ring, max_ring + 1)]
        q = (q.withColumn("_s", F.explode(F.array(*[
                  F.struct(F.lit(sx).alias("sx"), F.lit(sy).alias("sy"))
                  for sx, sy in shifts])))
              .withColumn("_sx", F.col("_s.sx"))
              .withColumn("_sy", F.col("_s.sy")))
    else:
        # effective x shifts are mod-n (pmod wrap below) and effective
        # y shifts land in [0, n) after the cy filter, so never
        # enumerate more than one full grid period on either axis — an
        # absurd max_ring degrades to full cover instead of allocating
        # a multi-hundred-MB sequence array per exploded row
        xr = min(max_ring, n // 2)
        yr = min(max_ring, n - 1)
        q = (q.withColumn("_sx", F.explode(F.sequence(F.lit(-xr), F.lit(xr))))
              .withColumn("_sy", F.explode(F.sequence(F.lit(-yr),
                                                      F.lit(yr)))))
    # wrap x around the antimeridian; clamp y at the poles
    cx = F.pmod(F.col("_qx") + F.col("_sx"), F.lit(n))
    cy = F.col("_qy") + F.col("_sy")
    q = (q.filter((cy >= 0) & (cy < n))
          .withColumn("cell_key", T.tile_key(F.lit(index_zoom), cx, cy))
          .select(F.col(query_id), F.col(q_lon).alias("_qlon"),
                  F.col(q_lat).alias("_qlat"), "cell_key")
          # antimeridian wrap can alias two shifts onto one cell when
          # 2*max_ring+1 > 2^zoom; dedup so candidates pair up once
          .dropDuplicates([query_id, "cell_key"]))
    return candidate_topk(q, d, k, "cell_key", query_id, data_id,
                          broadcast_queries)


def _ring_bound_km(active: DataFrame, ring: int, index_zoom: int,
                   q_lon: str, q_lat: str):
    """Conservative lower bound (km, haversine-comparable) on the
    distance from each query point to anything OUTSIDE its ring-R cell
    block.  If the k-th found distance is below this bound, no
    undiscovered point can beat it — the adaptive expansion's stop rule.

    Mercator edge distance is converted to ground distance with the
    block's worst-case (smallest) cos(lat) scale factor, then mapped to
    the haversine sphere radius (6371 km vs the 6378.137 km projection
    radius) — every step rounds the bound DOWN."""
    n = 2 ** index_zoom
    res = 2.0 * T.MAX_EXTENTS / n
    big = F.lit(1.0e18)
    qm = T.with_web_mercator(active, q_lon, q_lat)
    qx, qy = T.tile_xy(F.col("x3857"), F.col("y3857"), F.lit(index_zoom))
    qm = qm.withColumn("_qx", qx).withColumn("_qy", qy)
    x = F.col("x3857")
    y = F.col("y3857")
    xmin = (F.col("_qx") - ring) * F.lit(res) - F.lit(T.MAX_EXTENTS)
    xmax = (F.col("_qx") + ring + 1) * F.lit(res) - F.lit(T.MAX_EXTENTS)
    dx = F.least(x - xmin, xmax - x)
    if 2 * ring + 1 >= n:  # x wraps the antimeridian: full coverage
        dx = big
    top_row = F.col("_qy") - ring     # northern block edge (row index)
    bot_row = F.col("_qy") + ring + 1
    y_top = F.lit(T.MAX_EXTENTS) - top_row * F.lit(res)
    y_bot = F.lit(T.MAX_EXTENTS) - bot_row * F.lit(res)
    dy_n = F.when(top_row <= 0, big).otherwise(y_top - y)
    dy_s = F.when(bot_row >= n, big).otherwise(y - y_bot)
    m = F.least(dx, dy_n, dy_s)

    def lat_at(y_merc):
        clamped = F.greatest(F.least(y_merc, F.lit(T.MAX_EXTENTS)),
                             F.lit(-T.MAX_EXTENTS))
        return F.degrees(F.lit(2.0) * F.atan(F.exp(clamped / F.lit(T.WGS84_MAJOR_RADIUS)))
                         - F.lit(3.141592653589793 / 2.0))

    cos_min = F.least(F.cos(F.radians(lat_at(y_top))), F.cos(F.radians(lat_at(y_bot))))
    bound = m * cos_min * F.lit(6371000.0 / T.WGS84_MAJOR_RADIUS) / F.lit(1000.0)
    return qm.withColumn("_bound_km", bound)


def knn_kring_adaptive(queries: DataFrame, data: DataFrame, k: int = 5,
                       index_zoom: int = 5, start_ring: int = 1,
                       query_id: str = "query_id", data_id: str = "image_id",
                       q_lon: str = "lon", q_lat: str = "lat",
                       d_lon: str = "lon", d_lat: str = "lat",
                       broadcast_queries: bool = True) -> DataFrame:
    """k-ring kNN with adaptive ring expansion (SURVEY §2.10 "expand
    ring radius until k found"): rings double per round; a query is
    settled once it has k candidates whose k-th distance is strictly
    inside the ring's conservative ground-distance bound (or once the
    block covers the whole grid).  Equals brute force on any density —
    sparse regions just take more rounds.  Each round is one candidate
    join over the still-active queries only (the shared ``adaptive_knn``
    driver); lineage is truncated per round so round r doesn't
    recompute rounds < r."""
    n = 2 ** index_zoom

    def round_fn(active, ring):
        return knn_kring(active, data, k=k, index_zoom=index_zoom,
                         max_ring=ring, query_id=query_id, data_id=data_id,
                         q_lon=q_lon, q_lat=q_lat, d_lon=d_lon, d_lat=d_lat,
                         broadcast_queries=broadcast_queries)

    def bound_fn(active, ring):
        return (_ring_bound_km(active, ring, index_zoom, q_lon, q_lat)
                .select(query_id, "_bound_km"))

    # block == whole grid at ring n-1: nothing left to find
    return adaptive_knn(queries, k, round_fn, bound_fn,
                        full_cover_ring=n - 1, start_ring=start_ring,
                        query_id=query_id)


def knn_bruteforce(queries: DataFrame, data: DataFrame, k: int = 5,
                   query_id: str = "query_id", data_id: str = "image_id",
                   q_lon: str = "lon", q_lat: str = "lat",
                   d_lon: str = "lon", d_lat: str = "lat") -> DataFrame:
    """Cross-join oracle (queries broadcast) — correct for any k, O(Q*N)."""
    q = F.broadcast(queries.select(F.col(query_id), F.col(q_lon).alias("_qlon"),
                                   F.col(q_lat).alias("_qlat")))
    d = data.select(F.col(data_id), F.col(d_lon).alias("_dlon"), F.col(d_lat).alias("_dlat"))
    return topk_by_distance(q.crossJoin(d), k, query_id, data_id)


HAVERSINE_RADIUS_KM = 6371.0
KM_PER_DEG = 3.141592653589793 * HAVERSINE_RADIUS_KM / 180.0


def radius_index_zoom(radius_km: float) -> int:
    """Coarsest XYZ zoom whose equatorial cell width is <= ~2x the
    radius, so an equatorial disc's bbox spans O(1) cells on each
    axis (higher latitudes fan wider per-row, see below)."""
    import math
    circumference = 360.0 * KM_PER_DEG
    z = int(math.floor(math.log2(circumference / max(radius_km, 1e-9))))
    return max(0, min(14, z))


def within_distance_join(left: DataFrame, right: DataFrame,
                         radius_km: float, index_zoom: int | None = None,
                         left_id: str = "left_id", right_id: str = "right_id",
                         l_lon: str = "lon", l_lat: str = "lat",
                         r_lon: str = "lon", r_lat: str = "lat",
                         broadcast_left: bool = False) -> DataFrame:
    """Fixed-radius (distance-band) spatial join: every (left, right)
    pair with great-circle distance <= ``radius_km``.  The range-join
    sibling of kNN — "all images within 50 km of each sensor" — and a
    shape Spark has no native operator for.

    Plan (no crossJoin at any density; the equality-vs-brute tests and
    a plan assertion pin it):

      right -> cell key at ``index_zoom``          [column math]
      left  -> cells intersecting the radius-disc BOUNDING BOX
               [per-row runtime sequence explode]
      equi-join on cell_key -> haversine filter    [exact disc]

    The left fan-out is sized per row from the spherical-cap bbox:
    latitude span is exactly +-rho (rho = radius/R_sphere), and the
    longitude half-width is the exact cap-tangent formula
    asin(sin rho / cos lat) — rows near the poles automatically fan
    wider, equatorial rows stay at O(1) cells, and a cap containing a
    pole degrades to a full longitude band.  Spans are clamped at one
    grid period on each axis, so the fan-out is bounded by full cover
    no matter the radius.  ``index_zoom`` defaults to
    ``radius_index_zoom`` (equatorial cell ~ radius..2*radius).

    At 100 TB both sides shuffle once on cell_key (set
    ``broadcast_left=True`` when the left side is a small probe set);
    skewed cells are ordinary equi-join skew, handled by AQE."""
    import math

    if index_zoom is None:
        index_zoom = radius_index_zoom(radius_km)
    n = 2 ** index_zoom
    res = 2.0 * T.MAX_EXTENTS / n

    r = T.with_web_mercator(right, r_lon, r_lat)
    rx, ry = T.tile_xy(F.col("x3857"), F.col("y3857"), F.lit(index_zoom))
    r = (r.withColumn("cell_key", T.tile_key(F.lit(index_zoom), rx, ry))
          .select(F.col(right_id), F.col(r_lon).alias("_dlon"),
                  F.col(r_lat).alias("_dlat"), "cell_key"))

    rho = radius_km / HAVERSINE_RADIUS_KM          # angular radius (rad)
    dlat_deg = math.degrees(rho)
    lat = F.col(l_lat)
    lat_n = F.least(lat + F.lit(dlat_deg), F.lit(90.0))
    lat_s = F.greatest(lat - F.lit(dlat_deg), F.lit(-90.0))
    # exact cap-bbox longitude half-width; >=1 ratio means the cap
    # reaches a pole (or wraps), i.e. every longitude qualifies
    sin_ratio = F.lit(math.sin(min(rho, math.pi / 2.0))) / F.cos(F.radians(lat))
    dlon_rad = F.when(sin_ratio >= 1.0, F.lit(math.pi)).otherwise(F.asin(sin_ratio))

    fx = (F.lit(T.WGS84_MAJOR_RADIUS) * F.radians(F.col(l_lon))
          + F.lit(T.MAX_EXTENTS)) / F.lit(res)     # fractional tile x
    span_x = dlon_rad * F.lit(T.WGS84_MAJOR_RADIUS / res)
    tx_lo = F.floor(fx - span_x).cast("long")
    tx_hi = F.least(F.floor(fx + span_x), tx_lo + F.lit(n - 1)).cast("long")
    # domain contract: points live on the web-mercator grid
    # (|lat| <= ~85.05), the convention of every operator here (and of
    # the reference's tile model); the clamps below keep rows whose
    # disc pokes past a grid edge covered, and the final greatest()
    # keeps the y sequence ascending (Spark's sequence(1,0) DESCENDS)
    # even for out-of-contract rows, which then just probe one cell.
    y_n = F.least(T.y3857(lat_n), F.lit(T.MAX_EXTENTS))
    y_s = T.y3857(lat_s)                           # clamped at -MAX_EXTENTS
    ty_lo = F.greatest(F.floor((F.lit(T.MAX_EXTENTS) - y_n) / F.lit(res)),
                       F.lit(0)).cast("long")
    ty_hi = F.greatest(
        F.least(F.floor((F.lit(T.MAX_EXTENTS) - y_s) / F.lit(res)),
                F.lit(n - 1)).cast("long"),
        ty_lo)

    q = (left.withColumn("_cx", F.explode(F.sequence(tx_lo, tx_hi)))
             .withColumn("_cy", F.explode(F.sequence(ty_lo, ty_hi)))
             .withColumn("cell_key",
                         T.tile_key(F.lit(index_zoom),
                                    F.pmod(F.col("_cx"), F.lit(n)),
                                    F.col("_cy")))
             .select(F.col(left_id), F.col(l_lon).alias("_qlon"),
                     F.col(l_lat).alias("_qlat"), "cell_key"))
    if broadcast_left:
        q = F.broadcast(q)
    cand = q.join(r, "cell_key", "inner").withColumn(
        "dist_km", haversine_km(F.col("_qlon"), F.col("_qlat"),
                                F.col("_dlon"), F.col("_dlat")))
    return (cand.filter(F.col("dist_km") <= F.lit(radius_km))
                .select(F.col(left_id), F.col(right_id), "dist_km"))


def beyond_distance_filter(left: DataFrame, right: DataFrame,
                           radius_km: float, index_zoom: int | None = None,
                           left_id: str = "left_id",
                           right_id: str = "right_id",
                           l_lon: str = "lon", l_lat: str = "lat",
                           r_lon: str = "lon", r_lat: str = "lat",
                           broadcast_left: bool = False) -> DataFrame:
    """Negative distance-band filter: LEFT rows NOT within
    ``radius_km`` of ANY right point — "images far from every known
    POI" (diversity sampling), "sensors outside all coverage discs"
    (gap detection).  The complement of ``within_distance_join``.

    Plan: the SAME cell-blocked candidate join finds the covered left
    ids (distinct — at most one row per left row survives toward the
    anti join, however many sites cover it), then one hash anti-join
    on the left id removes them.  No row ever pays more than its
    bbox-cover fan-out; the anti join is an ordinary equi-join at
    scale (broadcastable when the covered set is small)."""
    covered = within_distance_join(
        left, right, radius_km, index_zoom=index_zoom,
        left_id=left_id, right_id=right_id, l_lon=l_lon, l_lat=l_lat,
        r_lon=r_lon, r_lat=r_lat, broadcast_left=broadcast_left,
    ).select(left_id).distinct()
    return left.join(covered, left_id, "left_anti")
