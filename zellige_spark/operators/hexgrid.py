"""Hexagonal cell index (third CellIndex backend, H3-SHAPED).

The north rule names "H3/S2 index"; S2 is implemented bit-faithfully
to its public design docs (kernel/s2.py).  This module adds the HEX
side of that pair as an honest, from-scratch hexagonal grid: pointy-top
hexagons of circumradius ``hex_size(level)`` on the EPSG:3857 plane,
addressed by axial coordinates (q, r) with cube rounding — the same
addressing scheme and k-ring/grid-distance algebra H3 uses per its
published docs, WITHOUT the icosahedral gnomonic projection, so cell
ids are NOT bit-compatible with the H3 library (stated here and in
COVERAGE.md; the real library drops in behind the same three
callbacks).

Everything is engine-identical arithmetic: the Spark side evaluates
the SAME expression strings (F.expr) the DuckDB oracle runs, and
rounding uses floor(v + 0.5) explicitly (both engines' round() differ
in tie/negative behavior).  Assignment is pure Column math — no UDF,
no shuffle — and kNN reuses the shared CellIndex seam
(`knn.candidate_topk` / `knn.adaptive_knn`) verbatim, proving the seam
with a third backend.

Axial layout (pointy-top, circumradius R):
    center x = R*sqrt(3)*(q + r/2),  center y = R*(3/2)*r
    q = (sqrt(3)/3 * x - 1/3 * y)/R,  r = (2/3 * y)/R
    hex distance((q1,r1),(q2,r2)) = max(|dq|, |dr|, |dq+dr|)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import tiles as T
from ..io_scan import read_sf

# sqrt(3)/3 etc. as literal doubles so both engines parse the exact
# same constant (no engine sqrt in the hot path)
_SQRT3_3 = 0.5773502691896258
_THIRD = 0.3333333333333333
_TWO_THIRDS = 0.6666666666666666
_KEY_OFF = 1 << 30
_KEY_MUL = 1 << 31


def hex_size(level: int) -> float:
    """Circumradius (3857 meters) at ``level``: halves per level."""
    return T.MAX_EXTENTS / (2 ** level)


def hex_qr_sql(level: int) -> tuple[str, str]:
    """(hq, hr) SQL expressions over x3857/y3857 — axial coords with
    cube rounding, identical text for Spark and DuckDB."""
    R = repr(hex_size(level))
    qf = f"(({_SQRT3_3!r} * x3857 - {_THIRD!r} * y3857) / {R})"
    rf = f"(({_TWO_THIRDS!r} * y3857) / {R})"
    yf = f"(-{qf} - {rf})"
    rx = f"CAST(floor({qf} + 0.5) AS BIGINT)"
    ry = f"CAST(floor({yf} + 0.5) AS BIGINT)"
    rz = f"CAST(floor({rf} + 0.5) AS BIGINT)"
    dx = f"abs({rx} - {qf})"
    dy = f"abs({ry} - {yf})"
    dz = f"abs({rz} - {rf})"
    hq = (f"(CASE WHEN {dx} > {dy} AND {dx} > {dz} THEN -{ry} - {rz} "
          f"ELSE {rx} END)")
    hr = (f"(CASE WHEN {dx} > {dy} AND {dx} > {dz} THEN {rz} "
          f"WHEN {dy} > {dz} THEN {rz} "
          f"ELSE -{rx} - {ry} END)")
    return hq, hr


def hex_key_sql(hq: str, hr: str) -> str:
    """Pack axial (q, r) into one int64 (offset-binary 31-bit fields)."""
    return (f"(({hq} + {_KEY_OFF}) * CAST({_KEY_MUL} AS BIGINT) "
            f"+ ({hr} + {_KEY_OFF}))")


def with_hex_cell(df: DataFrame, level: int,
                  lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Add hq / hr / hex_key at ``level`` — pure Column math over the
    shared mercator projection (no Exchange, no Python)."""
    hq, hr = hex_qr_sql(level)
    d = T.with_web_mercator(df, lon_col, lat_col)
    # hex_key references the hq/hr COLUMNS (multi-referenced non-cheap
    # exprs stay un-collapsed), not the re-expanded axial SQL — the
    # textual re-embedding doubled an already-large tree and every
    # adaptive-kNN round paid its Catalyst/Janino compile again.
    # coalesce(-1) never fires but makes the key NON-NULLABLE so join
    # planners skip the isnotnull filter whose pushdown would inline
    # the full axial tree (same fix as s2cells.with_s2_cell).
    return (d.withColumn("hq", F.expr(hq))
             .withColumn("hr", F.expr(hr))
             .withColumn("hex_key", F.coalesce(
                 F.expr(hex_key_sql("hq", "hr")), F.lit(-1).cast("long")))
             .drop("x3857", "y3857"))


def hex_morton_key(hq, hr):
    """Z-order key for a hex cell: bit-interleave the offset-binary
    axial coords.  ``hex_key`` (q-major packing) is the JOIN key;
    this is the LAYOUT key — axial coords are a bounded shear of the
    plane, so compact (q, r) Morton ranges are compact spatial blocks,
    which is what makes ``repartitionByRange`` + parquet min/max stats
    prune files spatially (the hex analogue of the S2 Hilbert cid and
    the XYZ tile Morton key)."""
    oq = (hq + F.lit(_KEY_OFF)).cast("long")
    orr = (hr + F.lit(_KEY_OFF)).cast("long")
    return T.morton_key(oq, orr)


def repartition_by_hex_locality(df: DataFrame, level: int = 9,
                                partitions: int | None = None,
                                lon_col: str = "lon",
                                lat_col: str = "lat") -> DataFrame:
    """Hex-backend spatial file layout: assign each row its hex cell at
    ``level``, attach the Morton ``hex_zorder`` key, and route through
    the shared CellIndex locality helper
    (knn.repartition_by_cell_locality) — written files then hold
    disjoint compact zorder ranges, and any zorder-range predicate
    prunes files + row groups (test-asserted, mirroring the S2 and XYZ
    layout tests)."""
    from .knn import repartition_by_cell_locality

    df = with_hex_cell(df, level, lon_col, lat_col)
    df = df.withColumn("hex_zorder", hex_morton_key(F.col("hq"), F.col("hr")))
    return repartition_by_cell_locality(df, "hex_zorder", partitions)


RING_FANOUT_CAP = 1_000_000  # literal-array guard (see ring_offsets)


def ring_offsets(ring: int) -> list:
    """All axial offsets within hex distance ``ring`` (3R^2+3R+1), for
    the LITERAL-array fan-out path (small rings).  The literal form
    must stay driver-sized, so a ring that would exceed RING_FANOUT_CAP
    offsets raises — but ``knn_hex`` never routes wide rings here: above
    ``knn.LITERAL_FANOUT_MAX`` offsets it switches to the runtime
    ``sequence``-explode fan-out, whose plan is O(1) bytes at any ring
    (so the adaptive full-cover round at fine levels completes instead
    of raising)."""
    if 3 * ring * ring + 3 * ring + 1 > RING_FANOUT_CAP:
        raise ValueError(
            f"hex ring {ring} fans out to >{RING_FANOUT_CAP} cells; "
            f"use a coarser index level for this data density")
    return [(dq, dr)
            for dq in range(-ring, ring + 1)
            for dr in range(-ring, ring + 1)
            if max(abs(dq), abs(dr), abs(dq + dr)) <= ring]


def knn_hex(queries: DataFrame, data: DataFrame, k: int = 5,
            level: int = 3, ring: int = 2,
            query_id: str = "query_id", data_id: str = "image_id",
            q_lon: str = "lon", q_lat: str = "lat",
            d_lon: str = "lon", d_lat: str = "lat",
            broadcast_queries: bool = True) -> DataFrame:
    """kNN with hex-cell blocking via the shared CellIndex seam: data
    side Column-math assignment, query side fanned out to its hex
    k-ring, `candidate_topk` does the join + haversine + top-k.  Same
    sizing contract as knn_kring; `knn_hex_adaptive` discharges it.

    Small rings fan out through a literal offset array (one explode,
    codegen'd); rings past ``knn.LITERAL_FANOUT_MAX`` offsets generate
    (dq, dr) at runtime — dq from sequence(-R, R), dr from the
    dq-dependent sequence that keeps max(|dq|,|dr|,|dq+dr|) <= R — so
    the plan never embeds a giant literal.  The ring is clamped to the
    full-cover ring 2^(level+1) (every in-world cell is within that hex
    distance of any in-world query cell, so wider rings only add empty
    off-world cells): an absurd requested ring degrades to full cover
    instead of generating 3R^2 runtime rows per query."""
    from .knn import LITERAL_FANOUT_MAX, candidate_topk

    ring = min(ring, 2 ** (level + 1))
    d = (with_hex_cell(data, level, d_lon, d_lat)
         .select(F.col(data_id), F.col(d_lon).alias("_dlon"),
                 F.col(d_lat).alias("_dlat"), "hex_key"))
    q = with_hex_cell(queries, level, q_lon, q_lat)
    if 3 * ring * ring + 3 * ring + 1 <= LITERAL_FANOUT_MAX:
        offs = F.array(*[F.struct(F.lit(dq).alias("dq"), F.lit(dr).alias("dr"))
                         for dq, dr in ring_offsets(ring)])
        q = (q.withColumn("_o", F.explode(offs))
              .withColumn("_dq", F.col("_o.dq"))
              .withColumn("_dr", F.col("_o.dr")))
    else:
        q = (q.withColumn("_dq", F.explode(F.sequence(F.lit(-ring), F.lit(ring))))
              .withColumn("_dr", F.explode(F.sequence(
                  F.greatest(F.lit(-ring), F.lit(-ring) - F.col("_dq")),
                  F.least(F.lit(ring), F.lit(ring) - F.col("_dq"))))))
    q = (q.withColumn("hex_key", F.expr(hex_key_sql(
              "(hq + _dq)", "(hr + _dr)")))
          .select(F.col(query_id), F.col(q_lon).alias("_qlon"),
                  F.col(q_lat).alias("_qlat"), "hex_key"))
    return candidate_topk(q, d, k, "hex_key", query_id, data_id,
                          broadcast_queries)


def _hex_bound_km(active: DataFrame, ring: int, level: int,
                  q_lon: str, q_lat: str, query_id: str) -> DataFrame:
    """Conservative ground-distance floor on anything OUTSIDE a
    query's ring-R hex block: centers at hex distance d are >=
    1.5*d*Rc apart (the MINIMUM is along the grid diagonal — e.g.
    offset (k, k) has hex distance 2k but center distance 3k*Rc; the
    sqrt(3)*d*Rc edge-neighbor chain is the maximum-direction case),
    and points sit within Rc of their centers, so bound_merc =
    ((R+1)*1.5 - 2) * Rc.  Mercator meters convert to ground with the
    block's worst-case cos(lat) and the haversine sphere radius —
    every step rounds DOWN (same scheme as knn._ring_bound_km).

    Unlike the XYZ grid (which tiles the mercator cylinder exactly and
    wraps its ring with pmod), a hex grid's axial period across the
    antimeridian is irrational in cells, so the fan-out cannot wrap;
    candidates across the seam are invisible until full cover.  The
    bound therefore caps at the query's mercator distance to either
    seam — a seam-adjacent query (e.g. lon = -180) gets bound ~0 and
    keeps expanding to full cover, where the block holds every cell
    and the top-k is exact."""
    rc = hex_size(level)
    merc = max(0.0, ((ring + 1) * 1.5 - 2.0) * rc)
    span = (ring + 1) * 1.5 * rc + rc  # max |dy| of any block point
    qm = T.with_web_mercator(active, q_lon, q_lat)

    def lat_at(y_merc):
        clamped = F.greatest(F.least(y_merc, F.lit(T.MAX_EXTENTS)),
                             F.lit(-T.MAX_EXTENTS))
        return F.degrees(
            F.lit(2.0) * F.atan(F.exp(clamped / F.lit(T.WGS84_MAJOR_RADIUS)))
            - F.lit(math.pi / 2.0))

    cos_min = F.least(
        F.cos(F.radians(lat_at(F.col("y3857") + F.lit(span)))),
        F.cos(F.radians(lat_at(F.col("y3857") - F.lit(span)))))
    seam_capped = F.least(F.lit(merc),
                          F.col("x3857") + F.lit(T.MAX_EXTENTS),
                          F.lit(T.MAX_EXTENTS) - F.col("x3857"))
    bound = (seam_capped * cos_min
             * F.lit(6371000.0 / T.WGS84_MAJOR_RADIUS) / F.lit(1000.0))
    return qm.select(F.col(query_id), bound.alias("_bound_km"))


def knn_hex_adaptive(queries: DataFrame, data: DataFrame, k: int = 5,
                     level: int = 3, start_ring: int = 1,
                     query_id: str = "query_id", data_id: str = "image_id",
                     q_lon: str = "lon", q_lat: str = "lat",
                     d_lon: str = "lon", d_lat: str = "lat",
                     broadcast_queries: bool = True) -> DataFrame:
    """Ring-doubling hex kNN on the shared `adaptive_knn` driver —
    only the round and bound callbacks are hex-specific (the CellIndex
    seam's third backend)."""
    from .knn import adaptive_knn

    def round_fn(active, ring):
        return knn_hex(active, data, k=k, level=level, ring=ring,
                       query_id=query_id, data_id=data_id,
                       q_lon=q_lon, q_lat=q_lat, d_lon=d_lon, d_lat=d_lat,
                       broadcast_queries=broadcast_queries)

    def bound_fn(active, ring):
        return _hex_bound_km(active, ring, level, q_lon, q_lat, query_id)

    # the grid spans ~2*0.91*2^level axial units: ring 2^(level+1)
    # covers every cell that can hold a point
    return adaptive_knn(queries, k, round_fn, bound_fn,
                        full_cover_ring=2 ** (level + 1),
                        start_ring=start_ring, query_id=query_id)


# --- driver queries + oracles ----------------------------------------------

HEX_QUERY_LEVELS = (4, 8, 12)


def q_hex_cell_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex-cell assignment of customer points at three levels — the
    hex analogue of `s2_cell_assign` (hash-exact vs the DuckDB twin
    running the SAME expression strings)."""
    from ..queries import CUST_LAT, CUST_LON

    df = read_sf(spark, sf_dir, "customer")
    pts = df.select("c_custkey",
                    F.expr(CUST_LON).alias("lon"),
                    F.expr(CUST_LAT).alias("lat"))
    outs = []
    for lv in HEX_QUERY_LEVELS:
        outs.append(with_hex_cell(pts, lv)
                    .select("c_custkey", F.lit(lv).cast("int").alias("level"),
                            "hq", "hr", "hex_key"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def sql_hex_cell_assign() -> str:
    from ..queries import CUST_LAT, CUST_LON, MAX_EXTENTS, R

    x = f"least({R} * radians(lon), {MAX_EXTENTS})"
    y = f"greatest({R} * ln(tan(0.25 * pi() + 0.5 * radians(lat))), -{MAX_EXTENTS})"
    selects = []
    for lv in HEX_QUERY_LEVELS:
        hq, hr = hex_qr_sql(lv)
        selects.append(
            f"SELECT c_custkey, CAST({lv} AS INT) AS level, "
            f"{hq} AS hq, {hr} AS hr, {hex_key_sql(hq, hr)} AS hex_key "
            f"FROM proj")
    union = "\nUNION ALL\n".join(selects)
    return f"""
    WITH pts AS (
      SELECT c_custkey, {CUST_LON} AS lon, {CUST_LAT} AS lat FROM customer
    ), proj AS (
      SELECT c_custkey, {x} AS x3857, {y} AS y3857 FROM pts
    )
    {union}
    """


def q_knn_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive hex-ring kNN, same question as `knn_kring`/`knn_s2` —
    the hex index must not change the answer (same brute oracle)."""
    from ..queries import _customer_points, _nation_points

    queries = (_nation_points(spark, sf_dir)
               .withColumnRenamed("n_nationkey", "query_id"))
    data = (_customer_points(spark, sf_dir)
            .withColumnRenamed("c_custkey", "data_id"))
    out = knn_hex_adaptive(queries, data, k=5, level=3, start_ring=2,
                           query_id="query_id", data_id="data_id")
    return out.select(F.col("query_id").cast("long").alias("query_id"),
                      F.col("neighbor_id").cast("long").alias("neighbor_id"),
                      F.col("rank").cast("int").alias("rank"))


# --- polyfill: polygon -> hex cells (H3's polyfill, center containment) -------

def _merc_xy(lon: float, lat: float) -> tuple:
    """Project one polygon vertex to 3857 in PYTHON — the result is a
    shared float literal, so neither engine runs any trig."""
    x = T.WGS84_MAJOR_RADIUS * math.radians(lon)
    y = T.WGS84_MAJOR_RADIUS * math.log(
        math.tan(0.25 * math.pi + 0.5 * math.radians(lat)))
    return x, y


def hex_polyfill_sql(level: int, verts, engine: str) -> str:
    """One SELECT producing (hq, hr, hex_key) for every hex cell whose
    CENTER lies inside the polygon — H3's published polyfill semantics
    (center containment, even-odd), evaluated on the 3857 plane this
    grid is defined on.  ``verts`` is a closed lon/lat ring; vertices
    are projected in Python so BOTH engines see identical float
    literals, and every arithmetic fragment (candidate ranges from the
    bbox, cell centers, ray-cast terms) is the same expression text.
    ``engine`` picks only the integer-range generator syntax: Spark
    ``explode(sequence(..))`` vs DuckDB ``unnest(range(..))``.

    Scale shape: the fill never scans data — candidates come from the
    polygon bbox (O(area / cell_area) rows from a literal generator),
    the ray cast is O(edges) Column math per candidate, and the result
    is a broadcastable dim for cell-key equi-joins (the hex analogue
    of tiles.polygon_cover / the S2 covering)."""
    if verts[0] != verts[-1]:
        raise ValueError("polygon ring must be closed")
    pts = [_merc_xy(x, y) for x, y in verts]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    R = hex_size(level)
    S = R * 1.7320508075688772   # sqrt(3)*R: axial column pitch
    H = R * 1.5                  # axial row pitch
    r0 = math.floor(min(ys) / H) - 1
    r1 = math.ceil(max(ys) / H) + 1
    qlo = f"(CAST(floor({min(xs)!r} / {S!r} - hr / 2.0) AS BIGINT) - 1)"
    qhi = f"(CAST(ceil({max(xs)!r} / {S!r} - hr / 2.0) AS BIGINT) + 1)"
    cx = f"({S!r} * (hq + hr / 2.0))"
    cy = f"({H!r} * hr)"
    terms = []
    for (x1, y1), (x2, y2) in zip(pts[:-1], pts[1:]):
        if y1 == y2:
            continue
        t = f"(({cy} - {y1!r}) / ({y2!r} - {y1!r}))"
        xint = f"({x1!r} + {t} * ({x2!r} - {x1!r}))"
        cond = (f"({cy} >= least({y1!r},{y2!r}) AND "
                f"{cy} < greatest({y1!r},{y2!r}) AND {xint} > {cx})")
        terms.append(f"CASE WHEN {cond} THEN 1 ELSE 0 END")
    crossings = " + ".join(terms)
    if engine == "spark":
        gen = (f"SELECT hr, explode(sequence({qlo}, {qhi})) AS hq "
               f"FROM (SELECT explode(sequence({r0}, {r1})) AS hr)")
    elif engine == "duckdb":
        gen = (f"SELECT hr, unnest(range({qlo}, {qhi} + 1)) AS hq "
               f"FROM generate_series({r0}, {r1}) AS g(hr)")
    else:
        raise ValueError(f"unknown engine {engine!r}")
    return (f"SELECT hq, hr, {hex_key_sql('hq', 'hr')} AS hex_key "
            f"FROM ({gen}) WHERE ({crossings}) % 2 = 1")


def hex_polyfill(spark: SparkSession, zones: dict, level: int) -> DataFrame:
    """Polyfill a dict of {zone_name: closed lon/lat ring} into one
    (zone, hq, hr, hex_key) DataFrame — a broadcastable covering dim."""
    parts = [f"SELECT '{z}' AS zone, * FROM ({hex_polyfill_sql(level, v, 'spark')})"
             for z, v in sorted(zones.items())]
    return spark.sql("\nUNION ALL\n".join(parts))


POLYFILL_LEVEL = 6


def q_hex_polyfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex polyfill + zonal join: the five translated coverage polygons
    fill to level-6 hex cells (center containment), then every covered
    cell reports its customer-point count (0 for covered-but-empty
    cells) — the hex analogue of polygon_cover composed with
    zonal_stats.  The covering is a literal-generated dim (no data
    scan); the point side aggregates per cell BEFORE the broadcast
    join, so the shuffle carries cell aggregates, never raw rows."""
    from ..queries import _customer_points, _zonal_polys

    cells = hex_polyfill(spark, _zonal_polys(), POLYFILL_LEVEL)
    pts = with_hex_cell(_customer_points(spark, sf_dir), POLYFILL_LEVEL)
    cnt = pts.groupBy("hex_key").agg(F.count(F.lit(1)).alias("n_points"))
    return (cells.join(cnt, "hex_key", "left")
            .select("zone",
                    F.col("hq").cast("long").alias("hq"),
                    F.col("hr").cast("long").alias("hr"),
                    F.coalesce(F.col("n_points"), F.lit(0)).cast("long")
                    .alias("n_points"))
            .orderBy("zone", "hq", "hr"))


def sql_hex_polyfill() -> str:
    from ..queries import CUST_LAT, CUST_LON, MAX_EXTENTS, _zonal_polys

    fills = "\nUNION ALL\n".join(
        f"SELECT '{z}' AS zone, * FROM ({hex_polyfill_sql(POLYFILL_LEVEL, v, 'duckdb')})"
        for z, v in sorted(_zonal_polys().items()))
    x = f"least({T.WGS84_MAJOR_RADIUS} * radians(lon), {MAX_EXTENTS})"
    y = f"greatest({T.WGS84_MAJOR_RADIUS} * ln(tan(0.25 * pi() + 0.5 * radians(lat))), -{MAX_EXTENTS})"
    hq, hr = hex_qr_sql(POLYFILL_LEVEL)
    return f"""
    WITH cells AS (
      {fills}
    ), pts AS (
      SELECT {CUST_LON} AS lon, {CUST_LAT} AS lat FROM customer
    ), proj AS (
      SELECT {x} AS x3857, {y} AS y3857 FROM pts
    ), cnt AS (
      SELECT {hex_key_sql(hq, hr)} AS hex_key, COUNT(*) AS n_points
      FROM proj GROUP BY 1
    )
    SELECT cells.zone, CAST(cells.hq AS BIGINT) AS hq,
           CAST(cells.hr AS BIGINT) AS hr,
           CAST(COALESCE(cnt.n_points, 0) AS BIGINT) AS n_points
    FROM cells LEFT JOIN cnt USING (hex_key)
    ORDER BY zone, hq, hr
    """
