"""String geocell codes: geohash (Niemeyer base32) and Bing quadkey.

Two public-standard CELL-CODE systems that complement the engine's
numeric cell indexes (XYZ tile pairs, S2 Hilbert cids, hex axial ids):

* **geohash** — the interleaved-bisection base32 code (public spec:
  Niemeyer 2008, as described on the geohash Wikipedia page and in
  every OSS implementation).  A geohash's defining property is that
  a LENGTH-q PREFIX of a precision-p code IS the precision-q code of
  the same point (test-pinned) — so prefix ranges are containment
  ranges, which makes plain string sort order a spatial layout key
  and `LIKE 'u4pr%'` a cell-containment predicate that parquet
  min/max string stats can prune on.
* **quadkey** — the Bing Maps quadtree digit string for an XYZ tile
  (public spec: Bing Maps Tile System docs).  Same prefix-containment
  property over the quadtree; the string twin of `tiles.tile_key`.

Both are generated as EXPRESSION TEXT shared verbatim between Spark
(`F.expr`) and the DuckDB oracle (the hexgrid/polyfill technique):
the engines evaluate identical integer/substr trees, so the driver's
value-hash comparison is exact by construction.  Everything is pure
Column math — bit shifts, masks, `substr` into a literal alphabet —
zero UDFs, whole-stage codegen, map-only at any scale (the operator
the reference's tile assignment would emit if its output key were a
string; no reference counterpart, SURVEY.md §2.10 extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_idx_sql(precision: int, lon: str, lat: str) -> tuple:
    """(lon_idx_sql, lat_idx_sql): clamped integer bisection indexes.

    lon gets ceil(5p/2) bits, lat floor(5p/2) (geohash starts the
    MSB-first interleave with longitude).  The single float step —
    ``(lon + 180) / 360 * 2^bits`` — is the same expression text on
    both engines, so the doubles (and their floors) match exactly.
    """
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2

    def idx(src: str, off: float, span: float, bits: int) -> str:
        n = 1 << bits
        return (f"greatest(0, least(CAST(floor((({src}) + {off!r}) / "
                f"{span!r} * {n}) AS BIGINT), {n - 1}))")

    return (idx(lon, 180.0, 360.0, lon_bits),
            idx(lat, 90.0, 180.0, lat_bits))


def geohash_code_sql(precision: int, lon_idx: str = "_gh_lon",
                     lat_idx: str = "_gh_lat") -> str:
    """Base32 code text from the two index columns: per character,
    5 MSB-first interleave offsets (even -> lon bit, odd -> lat bit)
    summed into a 0..31 value indexing the literal alphabet."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    chars = []
    for c in range(precision):
        terms = []
        for j in range(5):
            o = 5 * c + j
            if o % 2 == 0:
                bit = f"(({lon_idx} >> {lon_bits - 1 - o // 2}) & 1)"
            else:
                bit = f"(({lat_idx} >> {lat_bits - 1 - o // 2}) & 1)"
            terms.append(f"({bit} << {4 - j})" if j < 4 else bit)
        val = " + ".join(terms)
        chars.append(f"substr('{GEOHASH_BASE32}', CAST({val} AS INT) + 1, 1)")
    return "concat(" + ", ".join(chars) + ")"


def with_geohash(df: DataFrame, precision: int = 6, lon_col: str = "lon",
                 lat_col: str = "lat", out_col: str = "geohash") -> DataFrame:
    """Attach the precision-p geohash as ``out_col`` — map-only Column
    math.  The index columns are materialized once and referenced 5p
    times by the character expressions; their floor math is O(1) per
    row, so Catalyst's project-collapse inlining stays cheap (the
    CLAUDE.md lambda-inlining rule: bounded references only)."""
    lon_sql, lat_sql = geohash_idx_sql(precision, lon_col, lat_col)
    df = (df.withColumn("_gh_lon", F.expr(lon_sql))
            .withColumn("_gh_lat", F.expr(lat_sql)))
    return (df.withColumn(out_col, F.expr(geohash_code_sql(precision)))
              .drop("_gh_lon", "_gh_lat"))


def quadkey_sql(zoom: int, tx: str = "tile_x", ty: str = "tile_y") -> str:
    """Bing quadkey text for a z``zoom`` tile: digit i (1-based from
    the root) = 2·bit(ty, z−i) + bit(tx, z−i)."""
    if zoom == 0:
        return "''"
    digits = [
        f"substr('0123', CAST(((({ty} >> {zoom - i}) & 1) << 1) + "
        f"(({tx} >> {zoom - i}) & 1) AS INT) + 1, 1)"
        for i in range(1, zoom + 1)
    ]
    return "concat(" + ", ".join(digits) + ")"


def with_quadkey(df: DataFrame, zoom: int, tx_col: str = "tile_x",
                 ty_col: str = "tile_y",
                 out_col: str = "quadkey") -> DataFrame:
    """Attach the quadkey string for already-assigned z``zoom`` tiles."""
    return df.withColumn(out_col, F.expr(quadkey_sql(zoom, tx_col, ty_col)))


def geohash_py(lon: float, lat: float, precision: int) -> str:
    """Driver-side scalar twin (tests + literal generation) — same
    bisection-index construction, not the textbook refine loop, so a
    disagreement with the Column path is a real bug, not a rounding
    difference."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    import math

    li = max(0, min(int(math.floor((lon + 180.0) / 360.0 * (1 << lon_bits))),
                    (1 << lon_bits) - 1))
    la = max(0, min(int(math.floor((lat + 90.0) / 180.0 * (1 << lat_bits))),
                    (1 << lat_bits) - 1))
    out = []
    for c in range(precision):
        val = 0
        for j in range(5):
            o = 5 * c + j
            if o % 2 == 0:
                bit = (li >> (lon_bits - 1 - o // 2)) & 1
            else:
                bit = (la >> (lat_bits - 1 - o // 2)) & 1
            val = (val << 1) | bit
        out.append(GEOHASH_BASE32[val])
    return "".join(out)


def repartition_by_geohash_locality(df: DataFrame, precision: int = 7,
                                    partitions: int | None = None,
                                    lon_col: str = "lon",
                                    lat_col: str = "lat") -> DataFrame:
    """Geohash-backend spatial file layout — the STRING member of the
    CellIndex locality family (S2 Hilbert cid / XYZ Morton / hex
    Morton): attach the precision-p code and route through the shared
    ``knn.repartition_by_cell_locality`` range+sort helper.  Geohash
    lexicographic order IS spatial order (prefix = containment), so
    written files hold disjoint code ranges and parquet min/max STRING
    stats prune both a code-range predicate and — the idiomatic form —
    a ``LIKE 'u4pr%'`` / ``startswith`` cell-containment predicate
    (StringStartsWith pushdown, test-asserted)."""
    from .knn import repartition_by_cell_locality

    df = with_geohash(df, precision, lon_col, lat_col)
    return repartition_by_cell_locality(df, "geohash", partitions)


def voronoi_assign(spark, sites, grid: int,
                   x_period: int = 360000, y_period: int = 170000):
    """Discrete Voronoi surface: every lattice cell is assigned to its
    nearest site (exact integer squared distance between the cell
    CENTER and the site in doubled coordinates — half-cell centers
    become integers; ties to the smallest site_id), plus each site's
    catchment size — the "nearest facility / reverse-geocode to
    nearest city" layer over a coverage area.

    Scale plan: sites are a bounded dim (broadcast — the pip.py dim
    contract); the cell skeleton is grid-bounded, so the crossJoin is
    cells x sites with the site side broadcast, the argmin is one
    partial-agg'd min-struct groupBy(cell), and the catchment count
    is a window over the grid-bounded result.  Raw data never enters
    — this is a pure dim x grid computation that downstream joins
    prune against (the polygon-side twin of `pip` for point sites).

    ``sites``: (site_id, sx, sy) integer coords."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cw = x_period // grid
    ch = y_period // grid
    n = grid * grid
    skeleton = spark.range(n).select(
        (F.col("id") % grid).alias("cell_x"),
        F.expr(f"id div {grid}").alias("cell_y"))
    # doubled coords; x wraps (nearest image), y is plain
    adx = F.abs((2 * F.col("cell_x") + 1) * F.lit(cw) - 2 * F.col("sx"))
    dx = F.least(adx, F.lit(2 * x_period) - adx)
    dy = F.abs((2 * F.col("cell_y") + 1) * F.lit(ch) - 2 * F.col("sy"))
    d2 = dx * dx + dy * dy
    assigned = (skeleton.crossJoin(F.broadcast(sites))
                .groupBy("cell_x", "cell_y")
                .agg(F.min(F.struct(d2.alias("_d"),
                                    F.col("site_id").alias("_s")))
                     .alias("_m")))
    w = Window.partitionBy("_m._s")
    return (assigned
            .select(F.col("cell_x").cast("long"),
                    F.col("cell_y").cast("long"),
                    F.col("_m._s").cast("long").alias("site_id"),
                    F.col("_m._d").cast("long").alias("d2_doubled"),
                    F.count(F.lit(1)).over(w).cast("long")
                    .alias("catchment_cells")))
