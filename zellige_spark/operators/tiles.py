"""Tile assignment as pure Spark Column math (no UDFs, whole-stage codegen).

This operator is NEW relative to the reference (SURVEY.md §2.10): it is
the inverse of zellige's per-tile ``boundingBox``
(/root/reference/src/Data/Geometry/SphericalMercator.hs:113-121):

    tile_x = floor((X + maxExtents) / resolution)
    tile_y = floor((maxExtents - Y) / resolution)
    resolution = 2 * maxExtents / 2^zoom

with X/Y the EPSG:3857 projection (lonToX / latToY,
SphericalMercator.hs:100-111) including their clamping.

Everything here stays JVM-side: radians/log/tan/floor are Catalyst
expressions, zoom fan-out is an ``explode`` of a literal array, so the
whole assignment runs inside WholeStageCodegen with zero Python cost —
at 10^12 rows this is the difference between hours and weeks.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WGS84_MAJOR_RADIUS = 6378137.0
MAX_EXTENTS = 20037508.342789244


def x3857(lon: Column) -> Column:
    """lonToX (SphericalMercator.hs:100-104): clamp above at maxExtents."""
    return F.least(F.lit(WGS84_MAJOR_RADIUS) * F.radians(lon), F.lit(MAX_EXTENTS))


def y3857(lat: Column) -> Column:
    """latToY (SphericalMercator.hs:106-111): clamp below at -maxExtents."""
    y = F.lit(WGS84_MAJOR_RADIUS) * F.log(F.tan(F.lit(0.25) * F.lit(3.141592653589793) + F.lit(0.5) * F.radians(lat)))
    return F.greatest(y, F.lit(-MAX_EXTENTS))


def tile_xy(x: Column, y: Column, zoom: Column) -> tuple:
    """3857 meters -> (tile_x, tile_y) int columns at ``zoom`` (clamped
    into [0, 2^zoom-1] so the +maxExtents edge lands in the last cell)."""
    n = F.pow(F.lit(2.0), zoom.cast("double"))
    res = F.lit(2.0 * MAX_EXTENTS) / n
    last = (n - F.lit(1.0)).cast("long")
    tx = F.floor((x + F.lit(MAX_EXTENTS)) / res)
    ty = F.floor((F.lit(MAX_EXTENTS) - y) / res)
    tx = F.greatest(F.lit(0).cast("long"), F.least(tx, last))
    ty = F.greatest(F.lit(0).cast("long"), F.least(ty, last))
    return tx, ty


def tile_key(z: Column, tx: Column, ty: Column) -> Column:
    """Pack (z, x, y) into one int64: z<<56 | x<<28 | y (x,y < 2^28).

    coalesce(-1) never fires (inputs are non-null by construction) but
    makes the key NON-NULLABLE, so join planners skip the
    isnotnull(key) filter whose pushdown would re-inline the whole
    floor/trig tree into a second per-row evaluation (the s2/hex cell
    keys got the same treatment — see s2cells.with_s2_cell)."""
    return F.coalesce(
        z.cast("long") * F.lit(1 << 56)
        + tx.cast("long") * F.lit(1 << 28) + ty.cast("long"),
        F.lit(-1).cast("long"))


def with_web_mercator(df: DataFrame, lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    return (df
            .withColumn("x3857", x3857(F.col(lon_col)))
            .withColumn("y3857", y3857(F.col(lat_col))))


def assign_tiles(df: DataFrame, zooms: Sequence[int] = range(0, 15),
                 lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Fan each row out to one (zoom, tile_x, tile_y) per requested zoom.

    Plan shape: project (3857 math) -> explode(literal zoom array) ->
    project (floor math).  No shuffle, no UDF; Catalyst keeps it in one
    codegen stage on top of the scan.
    """
    df = with_web_mercator(df, lon_col, lat_col)
    df = df.withColumn("zoom", F.explode(F.array(*[F.lit(z) for z in zooms])))
    tx, ty = tile_xy(F.col("x3857"), F.col("y3857"), F.col("zoom"))
    return (df.withColumn("tile_x", tx)
              .withColumn("tile_y", ty)
              .withColumn("tile_key", tile_key(F.col("zoom"), F.col("tile_x"), F.col("tile_y"))))


def assign_tiles_buffered(df: DataFrame, zoom=None, extent: int = 4096,
                          buffer: int = 128, zooms: Sequence[int] = None,
                          lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Buffer-aware assignment for MVT encoding: a point lands in its
    own tile plus any neighbor tile whose buffered window
    ((-buf,-buf)..(extent+buf,extent+buf), Clip.hs:42-46) contains it.

    Pass ``zoom`` (single) or ``zooms`` (fan out over a literal zoom
    array).  Implemented as explode(zooms) x 3x3 neighbor explode + one
    vectorized filter — still pure Column math.  With buffer/extent =
    128/4096 only ~12% of points (edge band) duplicate, so the fan-out
    cost is ~1.25x rows, not 9x: Catalyst prunes with the filter
    immediately after the explode.
    """
    if zooms is None:
        zooms = [zoom]
    df = with_web_mercator(df, lon_col, lat_col)
    df = df.withColumn("zoom", F.explode(F.array(*[F.lit(int(z)) for z in zooms])))
    n = F.pow(F.lit(2.0), F.col("zoom").cast("double"))
    n_cells = n.cast("long")
    res = F.lit(2.0 * MAX_EXTENTS) / n
    fx = (F.col("x3857") + F.lit(MAX_EXTENTS)) / res   # fractional tile x
    fy = (F.lit(MAX_EXTENTS) - F.col("y3857")) / res
    df = (df.withColumn("_fx", fx).withColumn("_fy", fy)
            .withColumn("_n", n_cells)
            .withColumn("_bx", F.least(F.floor(F.col("_fx")), n_cells - 1))
            .withColumn("_by", F.least(F.floor(F.col("_fy")), n_cells - 1)))
    pad = float(buffer) / float(extent)  # buffer in tile fractions
    # emit only the shifts whose buffered window can contain the point
    # instead of a 3x3 explode + filter: the old shape generated 9 rows
    # per (point, zoom) and filtered ~87% of them away — 8x the
    # Generate volume for nothing (round-6 measurement).  The guard
    # conditions are float-exact restatements of the window filter
    # below (dx=-1 kept iff fx <= bx + pad; dx=+1 iff fx >= bx+1 - pad;
    # all quantities dyadic, so the sums are exact and the kept row set
    # is bit-identical — the filter is still applied afterwards as a
    # cheap invariant).
    empty_i = F.array().cast("array<int>")
    fx_c, bx_c = F.col("_fx"), F.col("_bx").cast("double")
    fy_c, by_c = F.col("_fy"), F.col("_by").cast("double")
    dxs = F.concat(
        F.when(fx_c <= bx_c + F.lit(pad), F.array(F.lit(-1))).otherwise(empty_i),
        F.array(F.lit(0)),
        F.when(fx_c >= bx_c + F.lit(1.0 - pad), F.array(F.lit(1))).otherwise(empty_i))
    dys = F.concat(
        F.when(fy_c <= by_c + F.lit(pad), F.array(F.lit(-1))).otherwise(empty_i),
        F.array(F.lit(0)),
        F.when(fy_c >= by_c + F.lit(1.0 - pad), F.array(F.lit(1))).otherwise(empty_i))
    df = df.withColumn("_sx", F.explode(dxs)).withColumn("_sy", F.explode(dys))
    tx = F.col("_bx") + F.col("_sx")
    ty = F.col("_by") + F.col("_sy")
    # keep when the point is inside this tile's buffered window
    inx = (F.col("_fx") >= tx.cast("double") - F.lit(pad)) & (F.col("_fx") <= tx.cast("double") + F.lit(1.0 + pad))
    iny = (F.col("_fy") >= ty.cast("double") - F.lit(pad)) & (F.col("_fy") <= ty.cast("double") + F.lit(1.0 + pad))
    ok = (tx >= 0) & (ty >= 0) & (tx < F.col("_n")) & (ty < F.col("_n")) & inx & iny
    return (df.filter(ok)
              .withColumn("tile_x", tx.cast("long"))
              .withColumn("tile_y", ty.cast("long"))
              .withColumn("tile_key", tile_key(F.col("zoom"), tx, ty))
              .drop("_fx", "_fy", "_bx", "_by", "_sx", "_sy", "_n"))


def zoom_rollup(df: DataFrame, max_zoom: int = 14,
                zooms: Sequence[int] | None = None,
                sum_cols: dict | None = None,
                lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Hierarchical per-tile rollup (hypertable-style): per-tile counts
    (plus optional column sums) at EVERY requested zoom, computed by
    aggregating the raw rows exactly ONCE at ``max_zoom`` and deriving
    each coarser zoom from the aggregates.

    The naive plan (``assign_tiles`` + groupBy) explodes every RAW row
    once per zoom before aggregating — 15 zooms means the shuffle sees
    15x the input.  Here the raw data is reduced to z``max_zoom`` tile
    aggregates in one shuffle; those aggregates (at most one row per
    occupied finest tile — at 100 TB, ~10^8 rows of a few longs, not
    10^12 raw rows) then explode over the requested zooms, map
    ancestors by arithmetic shift (exact: ``floor(u / 2^s)`` composes
    with the finest-level floor, so rollup tiles equal direct
    assignment tiles bit-for-bit, clamps included), and merge in a
    second aggregation whose map-side combine does the 4^s-to-1
    reduction locally.  Decomposable aggregates only: count (always,
    as ``cnt``) and sums (``sum_cols``: output name -> input column).

    Output: (zoom, tile_x, tile_y, cnt, *sum_cols) — one row per
    occupied tile per zoom."""
    zooms = sorted(set(int(z) for z in (zooms if zooms is not None
                                        else range(max_zoom + 1))))
    if zooms and not (0 <= zooms[0] and zooms[-1] <= max_zoom):
        raise ValueError(f"zooms {zooms} outside [0, max_zoom={max_zoom}]")
    sum_cols = sum_cols or {}

    df = with_web_mercator(df, lon_col, lat_col)
    tx, ty = tile_xy(F.col("x3857"), F.col("y3857"), F.lit(max_zoom))
    fine = (df.groupBy(tx.alias("tile_x"), ty.alias("tile_y"))
              .agg(F.count(F.lit(1)).alias("cnt"),
                   *[F.sum(src).alias(name) for name, src in sum_cols.items()]))
    fine = fine.withColumn("zoom", F.explode(
        F.array(*[F.lit(z) for z in zooms])))
    # arithmetic shift == floor division: exact ancestor mapping, and
    # Spark SQL shiftright takes a column shift amount
    return (fine.groupBy(F.col("zoom"),
                         F.expr(f"shiftright(tile_x, {max_zoom} - zoom)")
                          .alias("tile_x"),
                         F.expr(f"shiftright(tile_y, {max_zoom} - zoom)")
                          .alias("tile_y"))
                .agg(F.sum("cnt").alias("cnt"),
                     *[F.sum(name).alias(name) for name in sum_cols]))


def focal_sum(df: DataFrame, zoom: int, ring: int = 1,
              sum_cols: dict | None = None,
              lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Focal (neighborhood) tile statistics: per-tile counts (plus
    optional column sums) accumulated over the (2·ring+1)² Chebyshev
    neighborhood of each tile at ``zoom`` — the raster focal-sum /
    heatmap-smoothing primitive.

    Scale shape: raw rows reduce to per-tile aggregates in ONE shuffle
    (at most one row per occupied tile, ~2.6e5 at z9 whatever the
    input size); the (2r+1)² neighbor scatter then runs on the
    AGGREGATES — tiny by construction — and a second tile-key
    aggregation merges contributions.  Exactly two Exchanges for any
    ring.  x wraps modulo 2^zoom (antimeridian-continuous, slippy-map
    adjacency); scatter rows falling off the poles in y are dropped.

    Output: (tile_x, tile_y, n_tiles, cnt, *sum_cols) — one row per
    tile receiving any contribution; ``n_tiles`` counts the occupied
    tiles contributing to that neighborhood."""
    sum_cols = sum_cols or {}
    n = 1 << zoom
    if 2 * ring + 1 > n:
        raise ValueError(f"ring {ring} wraps onto itself at zoom {zoom}")
    df = with_web_mercator(df, lon_col, lat_col)
    tx, ty = tile_xy(F.col("x3857"), F.col("y3857"), F.lit(zoom))
    fine = (df.groupBy(tx.alias("tile_x"), ty.alias("tile_y"))
              .agg(F.count(F.lit(1)).alias("cnt"),
                   *[F.sum(src).alias(name) for name, src in sum_cols.items()]))
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx in range(-ring, ring + 1)
                     for dy in range(-ring, ring + 1)])
    scat = (fine.withColumn("_o", F.explode(offs))
                .select(((F.col("tile_x") + F.col("_o.dx") + F.lit(n))
                         % F.lit(n)).alias("tile_x"),
                        (F.col("tile_y") + F.col("_o.dy")).alias("tile_y"),
                        "cnt", *sum_cols.keys())
                .filter((F.col("tile_y") >= 0) & (F.col("tile_y") < n)))
    return (scat.groupBy("tile_x", "tile_y")
                .agg(F.count(F.lit(1)).alias("n_tiles"),
                     F.sum("cnt").alias("cnt"),
                     *[F.sum(name).alias(name) for name in sum_cols]))


def tile_topk(df: DataFrame, zoom: int, k: int, order_by: Sequence,
              lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Per-tile top-k selection (density culling / label placement):
    keep the k best rows of every occupied tile at ``zoom``, ranked by
    ``order_by`` (a sequence of Columns; include a unique tie-break so
    the result is deterministic).

    Scale shape: tile assignment is map-side Column math, then ONE
    shuffle on the tile key.  The ``row_number() <= k`` filter is
    recognized by Spark's WindowGroupLimit pushdown (Spark >= 3.5):
    each map task pre-prunes its partition to k rows PER TILE before
    the exchange, so the shuffle carries at most k·(occupied tiles per
    map partition) rows, not the raw input."""
    from pyspark.sql.window import Window

    a = assign_tiles(df, [zoom]).drop("zoom", "tile_key", "x3857", "y3857")
    w = Window.partitionBy("tile_x", "tile_y").orderBy(*order_by)
    return (a.withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= k))


def tile_change(df: DataFrame, zoom: int, split_es: int,
                ts_col: str = "ts", score_scale: int = 1000,
                lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Per-tile temporal change detection: count events before vs at/
    after ``split_es`` (epoch seconds) in every tile at ``zoom``, and
    score the shift — the hotspot-emergence / decay primitive (NEW vs
    the reference, which has no temporal ops).

    Scale shape: tile assignment and the period flag are map-side
    Column math; ONE shuffle on the tile key with map-side partial
    aggregation (two conditional counts), so a 100-TB fact table ships
    one partial row per (map partition, occupied tile) — never a raw
    ping.  Both periods aggregate in the SAME pass: no second scan, no
    self-join of period slices.

    Exactness: counts are BIGINTs; ``score_q`` is the chi-square-style
    ``(n_b - n_a)^2 * score_scale DIV (n_a + n_b)`` — all-integer (the
    numerator is non-negative, so Spark's ``DIV`` and DuckDB's ``//``
    agree), exact while ``delta^2 * score_scale`` fits int64 (|delta|
    <= ~3e6 at the default scale; beyond that, bucket to a finer zoom
    or aggregate in DECIMAL).

    Output: (tile_x, tile_y, n_a, n_b, delta, score_q, trend)."""
    es = F.unix_timestamp(F.col(ts_col))
    in_b = (es >= F.lit(int(split_es))).cast("long")
    a = assign_tiles(df, [zoom], lon_col, lat_col)
    g = (a.groupBy("tile_x", "tile_y")
          .agg(F.sum(F.lit(1) - in_b).alias("n_a"),
               F.sum(in_b).alias("n_b")))
    delta = F.col("n_b") - F.col("n_a")
    score = F.expr(
        f"(n_b - n_a) * (n_b - n_a) * {int(score_scale)} DIV (n_a + n_b)")
    trend = (F.when(delta > 0, F.lit("grew"))
              .when(delta < 0, F.lit("declined"))
              .otherwise(F.lit("flat")))
    return g.select("tile_x", "tile_y",
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    delta.cast("long").alias("delta"),
                    score.cast("long").alias("score_q"),
                    trend.alias("trend"))


def spread_bits2(v: Column) -> Column:
    """Spread a (<=31-bit) non-negative long's bits to the even bit
    positions of a 64-bit word — the magic-mask half of a 2-D Morton
    interleave, as 5 shift/and Column steps (pure codegen)."""
    v = v.bitwiseOR(F.shiftleft(v, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x3333333333333333))
    v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x5555555555555555))
    return v


def morton_key(tx: Column, ty: Column) -> Column:
    """Z-order key for a tile cell: bit-interleave (tile_x, tile_y) so
    int64 ORDER is spatial order (recursive quadrant order).  The
    row-major ``tile_key`` packing is the JOIN key (exact equality);
    this is the LAYOUT key — ranges of it are compact 2-D blocks, which
    is what makes ``repartitionByRange`` + parquet min/max stats prune
    files spatially (the XYZ analogue of the S2 Hilbert cid)."""
    return F.shiftleft(spread_bits2(ty.cast("long")), 1).bitwiseOR(
        spread_bits2(tx.cast("long")))


def repartition_by_xyz_locality(df: DataFrame, zoom: int = 12,
                                partitions: int | None = None,
                                lon_col: str = "lon",
                                lat_col: str = "lat") -> DataFrame:
    """XYZ-backend spatial file layout: assign each row its tile at
    ``zoom``, attach the Morton ``zorder_key``, and route through the
    shared CellIndex locality helper (knn.repartition_by_cell_locality)
    — written files then hold disjoint compact zorder ranges, and any
    zorder-range predicate prunes files + row groups (test-asserted,
    mirroring the S2 layout test)."""
    from .knn import repartition_by_cell_locality

    df = with_web_mercator(df, lon_col, lat_col)
    tx, ty = tile_xy(F.col("x3857"), F.col("y3857"), F.lit(zoom))
    df = (df.withColumn("tile_x", tx).withColumn("tile_y", ty)
            .withColumn("zorder_key", morton_key(F.col("tile_x"), F.col("tile_y")))
            .drop("x3857", "y3857"))
    return repartition_by_cell_locality(df, "zorder_key", partitions)


def tile_local_px(df: DataFrame, extent: int = 4096,
                  quantize: int = 1) -> DataFrame:
    """Tile-local pixel doubles for an assigned row (latLonToXYInTile,
    SphericalMercator.hs:83-94) — Column math only.

    px = (X - minX) * extent / spanX ; spanY negative => Y-down.
    Quantization >1 snaps to multiples with HALF_EVEN (Spark's bround).
    """
    n = F.pow(F.lit(2.0), F.col("zoom").cast("double"))
    res = F.lit(2.0 * MAX_EXTENTS) / n
    min_x = F.lit(-MAX_EXTENTS) + F.col("tile_x").cast("double") * res
    min_y = F.lit(MAX_EXTENTS) - F.col("tile_y").cast("double") * res
    px = (F.col("x3857") - min_x) * F.lit(float(extent)) / res
    py = (F.col("y3857") - min_y) * F.lit(float(extent)) / (-res)
    if quantize > 1:
        q = F.lit(float(quantize))
        px = F.bround(px / q, 0) * q
        py = F.bround(py / q, 0) * q
    return df.withColumn("px", px).withColumn("py", py)


def _pixel_counts(df: DataFrame, base_zoom: int, px_bits: int,
                  lon_col: str, lat_col: str) -> DataFrame:
    """(tile_x, tile_y, px, cnt) per occupied pixel: pixel (px, py) of
    tile (tx, ty) at ``base_zoom`` IS tile (tx·2^b + px, ty·2^b + py)
    at zoom ``base_zoom + px_bits``, so binning reuses the exact
    clamped tile floor — no new geometry code, and the raw rows are
    reduced in ONE shuffle at the fine zoom (the finest grain this
    operator family ever shuffles).  ``px`` is the row-major tile-local
    pixel id ``py·2^b + px``."""
    side = 1 << px_bits
    df = with_web_mercator(df, lon_col, lat_col)
    fx, fy = tile_xy(F.col("x3857"), F.col("y3857"),
                     F.lit(base_zoom + px_bits))
    pix = (df.groupBy(fx.alias("_fx"), fy.alias("_fy"))
             .agg(F.count(F.lit(1)).alias("cnt")))
    return pix.select(
        F.shiftright("_fx", px_bits).alias("tile_x"),
        F.shiftright("_fy", px_bits).alias("tile_y"),
        ((F.col("_fy") % side) * side + (F.col("_fx") % side))
        .cast("int").alias("px"),
        "cnt")


def density_raster(df: DataFrame, base_zoom: int = 5, px_bits: int = 4,
                   lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Per-tile density-raster summary (heatmap tiles): bin every
    occupied tile's points into a 2^px_bits × 2^px_bits pixel grid and
    aggregate scalar raster statistics per tile.

    Scale shape: one shuffle over raw rows at the fine zoom
    (``_pixel_counts``), then a per-tile aggregation over at most
    4^px_bits pixel rows per tile — aggregates-of-aggregates, exactly
    two Exchanges (plan-asserted), the ``zoom_rollup`` pattern.  All
    outputs are integers so the operator is oracle hash-exact;
    ``density_raster_array`` materializes the dense render-ready array.

    Output: (tile_x, tile_y, n_points, n_px, max_px, mode_px,
    px_checksum) — ``mode_px`` is the smallest pixel id among the
    max-count pixels; ``px_checksum`` = Σ (pixel_id + 1) · count."""
    n_px = 1 << (2 * px_bits)
    pix = _pixel_counts(df, base_zoom, px_bits, lon_col, lat_col)
    # argmax with a deterministic low-px tie-break via lexicographic
    # struct max on (cnt, n_px-1-px)
    best = F.max(F.struct(F.col("cnt").alias("c"),
                          (F.lit(n_px - 1) - F.col("px")).alias("ipx")))
    return (pix.groupBy("tile_x", "tile_y")
               .agg(F.sum("cnt").alias("n_points"),
                    F.count(F.lit(1)).alias("n_px"),
                    F.max("cnt").alias("max_px"),
                    (F.lit(n_px - 1) - best.getField("ipx"))
                    .cast("long").alias("mode_px"),
                    F.sum((F.col("px") + F.lit(1)).cast("long")
                          * F.col("cnt")).alias("px_checksum")))


def density_raster_array(df: DataFrame, base_zoom: int = 5,
                         px_bits: int = 4, lon_col: str = "lon",
                         lat_col: str = "lat") -> DataFrame:
    """Dense row-major pixel-count array per tile — the render-ready
    twin of ``density_raster`` (an MVT/PNG heat layer consumes exactly
    this shape).  Same two-Exchange plan; the dense fill is an
    O(4^px_bits) ``transform`` over a map built from the aggregated
    pixel rows, never over raw rows.  ``raster_sum`` re-aggregates the
    emitted array JVM-side and must equal ``n_points`` (in-job
    integrity, test-asserted)."""
    n_px = 1 << (2 * px_bits)
    pix = _pixel_counts(df, base_zoom, px_bits, lon_col, lat_col)
    g = (pix.groupBy("tile_x", "tile_y")
            .agg(F.map_from_entries(
                     F.collect_list(F.struct("px", "cnt"))).alias("_m"),
                 F.sum("cnt").alias("n_points")))
    raster = F.transform(
        F.sequence(F.lit(0), F.lit(n_px - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i),
                             F.lit(0).cast("long")))
    out = g.select("tile_x", "tile_y", "n_points", raster.alias("raster"))
    return out.withColumn(
        "raster_sum",
        F.aggregate("raster", F.lit(0).cast("long"), lambda a, x: a + x))


def compact_cells(cells: DataFrame, zoom: int) -> DataFrame:
    """H3-style ``compactCells`` on the XYZ quadtree: given a DISTINCT
    cell set at ``zoom``, return the minimal mixed-zoom cover — any
    complete 4-sibling group is replaced by its parent, recursively
    (the coverage-minimization primitive behind polygon covers and
    tile-pyramid manifests; mirrors H3's published compact/uncompact
    API on the quad hierarchy).

    Scale shape: the loop operates on the CELL SET, never raw rows —
    bounded by 4^zoom regardless of input size (dedupe rows to cells
    first; this function does it defensively).  Each level is one
    aggregate + one anti-join over the current set, eagerly
    localCheckpointed: ``promoted`` feeds both the anti-join and the
    next level, and without the checkpoint the double-use doubles the
    recomputation PER LEVEL (2^15 blowup by z0).  Empty levels break
    out early.

    Output: (zoom, tile_x, tile_y) — the minimal cover; every input
    cell is inside exactly one output cell (round-trip and minimality
    are test-pinned)."""
    return compact_quadtree(
        cells, zoom, ["tile_x", "tile_y"],
        lambda: [F.shiftright("tile_x", 1), F.shiftright("tile_y", 1)],
        level_col="zoom")


def compact_quadtree(cells: DataFrame, max_level: int, key_cols: list,
                     parent_exprs, level_col: str = "zoom") -> DataFrame:
    """Generic 4-to-1 hierarchy compact shared by every quadtree-shaped
    backend (XYZ tile pairs here; S2 Hilbert cids in
    ``s2cells.compact_s2`` — the CellIndex-seam philosophy applied to
    hierarchy algebra).  ``parent_exprs`` is a zero-arg callable
    returning Columns that map the current keys to parent keys,
    positionally matching ``key_cols``."""
    cur = cells.select(*[F.col(k).cast("long").alias(k)
                         for k in key_cols]).distinct()
    spark = cells.sparkSession
    schema = f"{level_col} int, " + ", ".join(f"{k} long" for k in key_cols)
    out = spark.createDataFrame([], schema)
    renames = [f"_p_{k}" for k in key_cols]
    for lvl in range(max_level, 0, -1):
        cur = cur.localCheckpoint(eager=True)
        if cur.limit(1).count() == 0:
            return out
        pexprs = parent_exprs()
        promoted = (cur.groupBy(*[e.alias(k)
                                  for k, e in zip(key_cols, pexprs)])
                       .agg(F.count(F.lit(1)).alias("_n"))
                       .filter(F.col("_n") == 4).drop("_n")
                       .localCheckpoint(eager=True))
        withp = cur.select(*key_cols, *[e.alias(r)
                                        for r, e in zip(renames, pexprs)])
        keep = (withp.join(promoted.select(
                    *[F.col(k).alias(r)
                      for k, r in zip(key_cols, renames)]),
                    renames, "left_anti")
                     .select(F.lit(lvl).cast("int").alias(level_col),
                             *key_cols))
        out = out.unionByName(keep)
        cur = promoted
    return out.unionByName(
        cur.select(F.lit(0).cast("int").alias(level_col), *key_cols))


def uncompact_cells(cells: DataFrame, target_zoom: int,
                    zoom_col: str = "zoom") -> DataFrame:
    """Inverse of ``compact_cells``: expand a mixed-zoom cell set back
    to uniform cells at ``target_zoom`` via a runtime ``sequence``
    fan-out (4^(target-z) children per cell, O(1) plan bytes however
    deep the expansion — same pattern as the kNN ring fan-out).

    Output: (tile_x, tile_y) at ``target_zoom``."""
    side = F.expr(f"shiftleft(CAST(1 AS BIGINT), {target_zoom} - {zoom_col})")
    base_x = F.expr(f"shiftleft(tile_x, {target_zoom} - {zoom_col})")
    base_y = F.expr(f"shiftleft(tile_y, {target_zoom} - {zoom_col})")
    return (cells
            .withColumn("_bx", base_x).withColumn("_by", base_y)
            .withColumn("_side", side)
            .withColumn("_dx", F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("_side") - 1)))
            .withColumn("_dy", F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("_side") - 1)))
            .select((F.col("_bx") + F.col("_dx")).alias("tile_x"),
                    (F.col("_by") + F.col("_dy")).alias("tile_y")))


def buffer_cells(cells: DataFrame, zoom: int, ring: int = 1) -> DataFrame:
    """Morphological dilation of a cell SET: every cell within ``ring``
    Chebyshev steps of an input cell at ``zoom`` — the grid form of
    "within k cells of the cover" (polygon buffering, safety margins
    around coverage areas, halo reads for focal ops).

    Scale shape: operates on the DISTINCT cell set, never raw rows —
    the (2r+1)² offset explode runs over at most 4^zoom rows whatever
    the corpus size (the ``focal_sum`` scatter applied to set algebra).
    x wraps modulo 2^zoom (slippy-map adjacency across the
    antimeridian); rows falling off the poles in y are dropped.

    Output: (tile_x, tile_y) distinct — input cells included (dilation
    is reflexive)."""
    n = 1 << zoom
    if 2 * ring + 1 > n:
        raise ValueError(f"ring {ring} wraps onto itself at zoom {zoom}")
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx in range(-ring, ring + 1)
                     for dy in range(-ring, ring + 1)])
    return (cells.select("tile_x", "tile_y").distinct()
            .withColumn("_o", F.explode(offs))
            .select(((F.col("tile_x") + F.col("_o.dx") + F.lit(n))
                     % F.lit(n)).alias("tile_x"),
                    (F.col("tile_y") + F.col("_o.dy")).alias("tile_y"))
            .filter((F.col("tile_y") >= 0) & (F.col("tile_y") < n))
            .distinct())


def grid_geodesic(seeds: DataFrame, walkable: DataFrame, zoom: int,
                  max_d: int) -> DataFrame:
    """Geodesic distance transform on the cell lattice: for every
    walkable cell, the length of the shortest 4-connected path to the
    nearest seed cell THROUGH WALKABLE CELLS ONLY — "how far is every
    serviced cell from the nearest depot, walking the road grid", the
    obstacle-aware generalization of ``buffer_cells`` (whose Chebyshev
    rings assume free space and need no iteration).

    Both inputs are (tile_x, tile_y) cell sets at ``zoom``; seeds
    outside the walkable set are dropped.  x wraps modulo 2^zoom
    (slippy-map antimeridian adjacency), y is clamped at the poles.

    Scale shape: pure cell-set algebra — every round touches at most
    4^zoom rows whatever the corpus size.  BFS frontier expansion runs
    at most ``max_d`` rounds; each round is one 4-offset explode, an
    equi-join (semi) against the walkable set, and an anti-join
    against the visited set, with a ``localCheckpoint`` per round to
    keep the lineage flat (the ``adaptive_knn`` loop discipline).  The
    loop exits early when the frontier drains.

    Output: (tile_x, tile_y, dist) for every walkable cell within
    ``max_d`` of a seed — exact BIGINT BFS distances, hash-checked by
    a DuckDB recursive-CTE twin.
    """
    if max_d < 0:
        raise ValueError("max_d must be >= 0")
    n = 1 << zoom
    walk = (walkable.select(F.col("tile_x").cast("long"),
                            F.col("tile_y").cast("long"))
            .distinct().localCheckpoint())
    visited = (seeds.select(F.col("tile_x").cast("long"),
                            F.col("tile_y").cast("long"))
               .distinct()
               .join(walk, ["tile_x", "tile_y"], "left_semi")
               .withColumn("dist", F.lit(0).cast("long"))
               .localCheckpoint())
    frontier = visited
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))])
    for d in range(1, max_d + 1):
        nxt = (frontier
               .withColumn("_o", F.explode(offs))
               .select(((F.col("tile_x") + F.col("_o.dx") + F.lit(n))
                        % F.lit(n)).alias("tile_x"),
                       (F.col("tile_y") + F.col("_o.dy")).alias("tile_y"))
               .filter((F.col("tile_y") >= 0) & (F.col("tile_y") < n))
               .distinct()
               .join(walk, ["tile_x", "tile_y"], "left_semi")
               .join(visited.select("tile_x", "tile_y"),
                     ["tile_x", "tile_y"], "left_anti")
               .withColumn("dist", F.lit(d).cast("long"))
               .localCheckpoint())
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def segment_cover(df: DataFrame, zoom: int,
                  seg_cols: Sequence[str] = ("seg_id",),
                  lon1: str = "lon1", lat1: str = "lat1",
                  lon2: str = "lon2", lat2: str = "lat2",
                  coords: str = "lonlat") -> DataFrame:
    """Exact tile cover of a line segment (grid supercover): the tiles
    the segment actually CROSSES, not its bbox.  The bbox fan-out that
    `feature_tiles.assign_feature_tiles` uses is self-correcting (clip
    drops empty tiles) but ships O(dx·dy) candidates for a diagonal —
    this is the O(dx+dy) replacement for linework-heavy corpora.

    Construction (pure Column math, one window): project endpoints to
    continuous tile coordinates, explode the parametric positions of
    every x- and y-gridline crossing (two runtime ``sequence``
    fan-outs, empty when a segment spans no gridline), union t = 0,
    then evaluate the tile at each inter-crossing MIDPOINT (lead
    window over t, default 1.0) — each midpoint lands strictly inside
    one covered cell.  Segments are planar in the 3857 plane (no
    antimeridian wrap), matching the reference's planar clipping
    semantics.

    ``coords="lonlat"`` (default) projects the endpoint columns;
    ``coords="3857"`` takes them as plane meters directly (polygon
    edges already projected driver-side).

    Output: (*seg_cols, tile_x, tile_y) distinct."""
    from pyspark.sql.window import Window

    seg_cols = list(seg_cols)
    n = 1 << zoom
    res = 2.0 * MAX_EXTENTS / n
    u = (lambda x: (x + F.lit(MAX_EXTENTS)) / F.lit(res))
    v = (lambda y: (F.lit(MAX_EXTENTS) - y) / F.lit(res))
    if coords == "lonlat":
        px1, py1 = x3857(F.col(lon1)), y3857(F.col(lat1))
        px2, py2 = x3857(F.col(lon2)), y3857(F.col(lat2))
    elif coords == "3857":
        px1, py1 = F.col(lon1), F.col(lat1)
        px2, py2 = F.col(lon2), F.col(lat2)
    else:
        raise ValueError(f"coords {coords!r} not in ('lonlat', '3857')")
    e = df.select(
        *seg_cols,
        u(px1).alias("_u1"), v(py1).alias("_v1"),
        u(px2).alias("_u2"), v(py2).alias("_v2"))

    def crossings(a1, a2):
        lo = F.ceil(F.least(F.col(a1), F.col(a2))).cast("long")
        hi = F.floor(F.greatest(F.col(a1), F.col(a2))).cast("long")
        grid = F.when(hi >= lo, F.sequence(lo, hi)) \
                .otherwise(F.array().cast("array<long>"))
        return grid

    base = e.select(*seg_cols, "_u1", "_v1", "_u2", "_v2",
                    F.lit(0.0).alias("t"))
    # the du/dv != 0 guards keep every division well-defined on BOTH
    # engines (DuckDB nulls double div-by-zero; Spark IEEE-NaNs it)
    xc = (e.filter(F.col("_u2") != F.col("_u1"))
           .withColumn("_g", F.explode(crossings("_u1", "_u2")))
           .select(*seg_cols, "_u1", "_v1", "_u2", "_v2",
                   ((F.col("_g").cast("double") - F.col("_u1"))
                    / (F.col("_u2") - F.col("_u1"))).alias("t")))
    yc = (e.filter(F.col("_v2") != F.col("_v1"))
           .withColumn("_g", F.explode(crossings("_v1", "_v2")))
           .select(*seg_cols, "_u1", "_v1", "_u2", "_v2",
                   ((F.col("_g").cast("double") - F.col("_v1"))
                    / (F.col("_v2") - F.col("_v1"))).alias("t")))
    ts = (base.unionByName(xc).unionByName(yc)
              .filter((F.col("t") >= 0.0) & (F.col("t") < 1.0)))
    w = Window.partitionBy(*seg_cols).orderBy("t")
    mid = (F.col("t") + F.coalesce(F.lead("t").over(w), F.lit(1.0))) / 2
    pu = F.col("_u1") + mid * (F.col("_u2") - F.col("_u1"))
    pv = F.col("_v1") + mid * (F.col("_v2") - F.col("_v1"))
    last = F.lit(n - 1).cast("long")
    tx = F.greatest(F.lit(0).cast("long"),
                    F.least(F.floor(pu).cast("long"), last))
    ty = F.greatest(F.lit(0).cast("long"),
                    F.least(F.floor(pv).cast("long"), last))
    return (ts.select(*seg_cols, tx.alias("tile_x"), ty.alias("tile_y"))
              .distinct())


def quadtree_split(pts: DataFrame, cap: int, max_zoom: int,
                   lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Adaptive quadtree partitioning: the minimal mixed-zoom cell set
    where every occupied leaf holds <= ``cap`` points (or sits at
    ``max_zoom``) — the data-driven answer to spatial skew.  Dense
    urban cells split deep, empty ocean never materializes; the leaf
    set is the balanced partition map a 100-TB tiling job feeds to
    `repartitionByRange` instead of salting blind.

    Scale shape — the recursive split is computed WITHOUT iteration:

    * one data shuffle reduces raw rows to fine-cell counts at
      ``max_zoom`` (partial-agg'd, bounded by min(n, 4^max_zoom));
    * one explode x (max_zoom+1) levels + re-agg over the CELL table
      yields every ancestor count (cell-bounded, never touches rows);
    * per-level counts are monotone toward the root, so "every proper
      ancestor splits" collapses to "the PARENT's count > cap" — one
      self-join on the cell table decides leaf-ness in closed form:
      leaf(z,c) = (z == 0 or parent_c > cap) and (c <= cap or
      z == max_zoom).

    Only OCCUPIED leaves are emitted (the cover is of the data, not of
    space); disjointness + exact point coverage are test-pinned.
    Output: (zoom, tile_x, tile_y, n_points).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if not 0 <= max_zoom <= 27:
        raise ValueError(f"max_zoom must be in [0, 27], got {max_zoom}")
    df = with_web_mercator(pts, lon_col, lat_col)
    tx, ty = tile_xy(F.col("x3857"), F.col("y3857"), F.lit(max_zoom))
    fine = (df.select(tx.alias("_fx"), ty.alias("_fy"))
              .groupBy("_fx", "_fy").agg(F.count(F.lit(1)).alias("_c")))
    lv = fine.withColumn("zoom", F.explode(F.array(
        *[F.lit(z) for z in range(max_zoom + 1)])))
    cnt = (lv.select("zoom",
                     F.expr(f"shiftright(_fx, {max_zoom} - zoom)")
                      .alias("tile_x"),
                     F.expr(f"shiftright(_fy, {max_zoom} - zoom)")
                      .alias("tile_y"),
                     "_c")
             .groupBy("zoom", "tile_x", "tile_y")
             .agg(F.sum("_c").alias("n_points")))
    par = cnt.select((F.col("zoom") + 1).alias("zoom"),
                     F.col("tile_x").alias("_px"),
                     F.col("tile_y").alias("_py"),
                     F.col("n_points").alias("_pc"))
    joined = cnt.join(
        par, [cnt.zoom == par.zoom,
              F.shiftright(cnt.tile_x, 1) == F.col("_px"),
              F.shiftright(cnt.tile_y, 1) == F.col("_py")],
        "left").drop(par.zoom)
    leaf = ((F.col("zoom") == 0) | (F.col("_pc") > cap)) & \
           ((F.col("n_points") <= cap) | (F.col("zoom") == max_zoom))
    return (joined.filter(leaf)
            .select(F.col("zoom").cast("int").alias("zoom"),
                    "tile_x", "tile_y", "n_points"))


def quadtree_assign(pts: DataFrame, leaves: DataFrame, max_zoom: int,
                    lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Route each point to its ``quadtree_split`` leaf: fan the row out
    to its (zoom, ancestor-cell) chain (max_zoom+1 literal rows, pure
    Column math) and inner-join the leaf set — disjointness guarantees
    exactly one hit per point.  The leaf side is cell-bounded, so AQE
    broadcasts it at moderate depths; at extreme depths the equi-join
    shuffles on the cell key like any other.  Appends (zoom, tile_x,
    tile_y) to the input columns."""
    df = with_web_mercator(pts, lon_col, lat_col)
    tx, ty = tile_xy(F.col("x3857"), F.col("y3857"), F.lit(max_zoom))
    chain = (df.withColumn("_fx", tx).withColumn("_fy", ty)
               .withColumn("zoom", F.explode(F.array(
                   *[F.lit(z) for z in range(max_zoom + 1)])))
               .withColumn("tile_x", F.expr(
                   f"shiftright(_fx, {max_zoom} - zoom)"))
               .withColumn("tile_y", F.expr(
                   f"shiftright(_fy, {max_zoom} - zoom)"))
               .drop("_fx", "_fy", "x3857", "y3857"))
    return chain.join(
        leaves.select(F.col("zoom").cast("int").alias("zoom"),
                      "tile_x", "tile_y"),
        ["zoom", "tile_x", "tile_y"], "inner")


def tile_moments(df: DataFrame, zoom: int, quant_m: int = 10,
                 lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Per-tile second-moment sketch (centrography raw moments): for
    every occupied tile at ``zoom``, the DECOMPOSABLE integer moments
    (n, Σdx, Σdy, Σdx², Σdy², Σdx·dy) of the within-tile point offsets
    — everything mean center, standard distance, and the standard
    deviational ellipse derive from, in the mergeable form a rollup
    or an incremental refresh can re-aggregate without touching rows.

    Exactness & overflow by construction: offsets are taken from the
    TILE ORIGIN (never the world origin), quantized to ``quant_m``
    meters and floored to BIGINT, so dx < 2·MAX/2^zoom/quant_m (at z5,
    dam units: ≤ 1.25e5) and Σdx² stays inside int64 up to ~5.9e8
    points per tile; beyond that, raise ``quant_m`` or the zoom — the
    moments themselves stay sum-decomposable either way.  All outputs
    integer, so the sketch sits under the exact hash gate (float
    variance would be reduction-order-dependent).

    Scale shape: map-only projection + offset math, ONE shuffle with
    map-side partial aggregation — a 100-TB table ships one partial
    moment row per (map partition, occupied tile).  Derived display
    means use DIV on the already-aggregated sums."""
    n = 2 ** int(zoom)
    res = 2.0 * MAX_EXTENTS / n
    a = assign_tiles(df, [zoom], lon_col, lat_col)  # keeps x3857/y3857
    dx = F.expr(f"CAST(floor((x3857 + {MAX_EXTENTS!r} - tile_x * {res!r}) "
                f"/ {int(quant_m)}) AS BIGINT)")
    dy = F.expr(f"CAST(floor(({MAX_EXTENTS!r} - y3857 - tile_y * {res!r}) "
                f"/ {int(quant_m)}) AS BIGINT)")
    a = a.withColumn("_dx", dx).withColumn("_dy", dy)
    g = (a.groupBy("tile_x", "tile_y")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("_dx").alias("sum_dx"),
              F.sum("_dy").alias("sum_dy"),
              F.sum(F.col("_dx") * F.col("_dx")).alias("sum_xx"),
              F.sum(F.col("_dy") * F.col("_dy")).alias("sum_yy"),
              F.sum(F.col("_dx") * F.col("_dy")).alias("sum_xy")))
    return g.select(
        F.col("tile_x").cast("long").alias("tile_x"),
        F.col("tile_y").cast("long").alias("tile_y"),
        F.col("n").cast("long").alias("n"),
        F.col("sum_dx").cast("long").alias("sum_dx"),
        F.col("sum_dy").cast("long").alias("sum_dy"),
        F.col("sum_xx").cast("long").alias("sum_xx"),
        F.col("sum_yy").cast("long").alias("sum_yy"),
        F.col("sum_xy").cast("long").alias("sum_xy"),
        F.expr("sum_dx DIV n").alias("mean_dx"),
        F.expr("sum_dy DIV n").alias("mean_dy"))
