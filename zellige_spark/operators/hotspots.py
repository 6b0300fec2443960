"""Grid-density hotspot clustering (DBSCAN's grid cousin).

"Where are the dense regions?" over a trillion geotagged images:
bucket points into tile cells at a fixed zoom, keep cells with at
least ``min_count`` points, and merge 8-adjacent dense cells into
clusters (x wraps at the antimeridian, y clamps at the poles — same
conventions as ``tiles.buffer_cells``).  The cluster id is the
smallest cell key in the component, so output is fully deterministic
and integer-typed (oracle hash-exact).

Scale plan: the ONLY operation that touches raw rows is the per-cell
count — one Exchange with map-side partial aggregation.  Everything
after runs on the dense-cell set, which is bounded by the grid
(<= 4^zoom cells) no matter how many input rows there are; adjacency
is an equi-join on neighbor keys over that bounded set, and the
connected-components loop (``dedup.connected_components``: min-label
propagation + pointer jumping, O(|E| log n)) runs on a graph of at
most 4^zoom nodes.  A distance-based DBSCAN would need a
neighborhood join over raw points; the grid variant is the standard
web-scale approximation (cell width tunes eps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import tiles as T
from .dedup import connected_components

__all__ = ["dense_cells", "hotspot_clusters", "cluster_stats",
           "local_moran", "quadrat_chi2", "kde_pieces", "kde_heat"]


def dense_cells(pts: DataFrame, zoom: int, min_count: int) -> DataFrame:
    """Per-cell point counts at ``zoom``, filtered to cells with
    >= ``min_count`` points: (tile_x, tile_y, n_pts, key) with
    key = tile_x * 2^zoom + tile_y.  One Exchange over the raw rows
    (partial-agg combine); the result is bounded by 4^zoom rows."""
    side = 1 << zoom
    cells = (T.assign_tiles(pts, (zoom,))
             .groupBy("tile_x", "tile_y")
             .agg(F.count(F.lit(1)).alias("n_pts"))
             .filter(F.col("n_pts") >= min_count))
    return cells.withColumn(
        "key", F.col("tile_x") * F.lit(side) + F.col("tile_y"))


def hotspot_clusters(pts: DataFrame, zoom: int, min_count: int) -> DataFrame:
    """Dense cells labeled with their 8-connected cluster: (tile_x,
    tile_y, n_pts, cluster) where cluster = min cell key reachable
    through adjacent dense cells (singletons label themselves).  x
    adjacency wraps at the antimeridian; y never wraps (poles)."""
    side = 1 << zoom
    dense = dense_cells(pts, zoom, min_count).localCheckpoint(eager=True)

    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
    ])
    nbr = (dense
           .select("key", F.explode(offsets).alias("o"),
                   "tile_x", "tile_y")
           .select("key",
                   ((F.col("tile_x") + F.col("o.dx") + side) % side)
                   .alias("nx"),
                   (F.col("tile_y") + F.col("o.dy")).alias("ny")))
    other = dense.select(F.col("tile_x").alias("nx"),
                         F.col("tile_y").alias("ny"),
                         F.col("key").alias("nkey"))
    pairs = (nbr.join(other, ["nx", "ny"])
             .filter(F.col("key") < F.col("nkey"))
             .select(F.col("key").alias("doc_a"),
                     F.col("nkey").alias("doc_b"))
             .distinct())
    comps = connected_components(pairs)
    return (dense
            .join(comps.withColumnRenamed("node", "key"), "key", "left")
            .select("tile_x", "tile_y", "n_pts",
                    F.coalesce("component", F.col("key")).alias("cluster")))


def cluster_stats(pts: DataFrame, zoom: int, min_count: int) -> DataFrame:
    """Per-cluster summary over the labeled dense cells: cell count,
    total points, bbox, and the point-weighted centroid cell.  The
    centroid is integer floor division (sum(coord * n_pts) div
    sum(n_pts)) — exact and engine-independent, no float mean.  Runs
    entirely on the grid-bounded cluster table (one aggregation over
    <= 4^zoom rows)."""
    hc = hotspot_clusters(pts, zoom, min_count)
    return (hc.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.sum("n_pts").alias("n_pts"),
                 F.min("tile_x").alias("x_min"),
                 F.max("tile_x").alias("x_max"),
                 F.min("tile_y").alias("y_min"),
                 F.max("tile_y").alias("y_max"),
                 F.expr("sum(tile_x * n_pts) div sum(n_pts)")
                 .alias("cx"),
                 F.expr("sum(tile_y * n_pts) div sum(n_pts)")
                 .alias("cy")))


# --- local spatial autocorrelation (LISA) --------------------------------
#
# Anselin's Local Moran's I ("LISA", Geographical Analysis 1995 —
# public literature; no reference-repo counterpart): per grid cell,
# does its value cluster with its neighbors' (high-high / low-low,
# I_i > 0) or repel them (high-low outlier, I_i < 0)?  The classic
# follow-up to hotspot_clusters: clusters say WHERE density is, LISA
# says whether the pattern is statistically structured.
#
# With integer cell counts x_i over the FULL N-cell grid and binary
# queen weights w_ij, scale the mean away: D_i = N*x_i - S (exact
# int), L_i = sum of neighbor D_j, and
#
#   I_i = (x_i - xbar) * sum_j w_ij (x_j - xbar) / (sum_k (x_k - xbar)^2 / N)
#       = D_i * L_i / (N * sum(x^2) - S^2)
#
# so the numerator and denominator are EXACT integers and the only
# float is one final long->double division — hash-exact under the
# oracle gate.  int64 bounds: |D| <= N*max(x), |num| <= 8*N^2*max(x)^2
# (fine through ~1e5 cells x 1e6 counts; the web-scale upgrade is the
# map_snap DECIMAL(38) pattern).

def local_moran(pts: DataFrame, grid: int,
                x_col: str = "x", y_col: str = "y",
                x_period: int = 360000, y_period: int = 170000) -> DataFrame:
    """Local Moran's I over per-cell point counts on a ``grid`` x
    ``grid`` integer lattice (x wraps, y clamps — hotspot conventions).

    Output one row per grid cell (including empty cells — LISA is
    defined over the study area, not the occupied cells): cell_x,
    cell_y, n_pts, exact-integer num/den, and ``local_i`` (double).

    Scale shape: raw rows are touched ONCE by the per-cell count (one
    partial-agg'd Exchange); everything else — the full-grid skeleton,
    the three global scalars, the 8-neighbor lag join — runs on the
    grid-bounded cell set (N = grid^2 rows however big the input)."""
    spark = pts.sparkSession
    cw = x_period // grid
    ch = y_period // grid
    n_cells = grid * grid
    counts = (pts.select(
                  F.expr(f"({x_col} div {cw})").alias("cell_x"),
                  F.expr(f"({y_col} div {ch})").alias("cell_y"))
              .groupBy("cell_x", "cell_y")
              .agg(F.count(F.lit(1)).alias("n_pts")))
    skeleton = spark.range(n_cells).select(
        (F.col("id") % grid).alias("cell_x"),
        F.expr(f"id div {grid}").alias("cell_y"))
    cells = (skeleton.join(counts, ["cell_x", "cell_y"], "left")
             .select("cell_x", "cell_y",
                     F.coalesce("n_pts", F.lit(0)).alias("n_pts")))
    glob = cells.agg(
        F.sum("n_pts").alias("s"),
        F.sum(F.col("n_pts") * F.col("n_pts")).alias("sq")).select(
        "s", (F.lit(n_cells) * F.col("sq") - F.col("s") * F.col("s"))
             .alias("den"))
    dev = (cells.join(F.broadcast(glob))
           .select("cell_x", "cell_y", "n_pts", "den",
                   (F.lit(n_cells) * F.col("n_pts") - F.col("s"))
                   .alias("d")))
    # each cell sends its deviation to its 8 queen neighbors
    sent = dev.select(
        F.col("d").alias("d_j"),
        F.explode(F.expr(
            f"filter(transform(sequence(0, 8), o -> struct("
            f"(cell_x + (o div 3) - 1 + {grid}) % {grid} AS nx, "
            f"cell_y + (o % 3) - 1 AS ny)), "
            f"p -> p.ny >= 0 AND p.ny < {grid} AND NOT (p.nx = cell_x "
            f"AND p.ny = cell_y))")).alias("nb"))
    lag = (sent.groupBy(F.col("nb.nx").alias("cell_x"),
                        F.col("nb.ny").alias("cell_y"))
               .agg(F.sum("d_j").alias("lag")))
    return (dev.join(lag, ["cell_x", "cell_y"], "left")
            .withColumn("num", F.col("d") * F.coalesce("lag", F.lit(0)))
            .select("cell_x", "cell_y", "n_pts", "num", "den",
                    # ONE correctly-rounded division of exact int64s —
                    # the only float in the operator
                    (F.col("num").cast("double")
                     / F.col("den").cast("double")).alias("local_i")))


def quadrat_chi2(pts: DataFrame, grid: int,
                 x_col: str = "x", y_col: str = "y",
                 x_period: int = 360000, y_period: int = 170000) -> DataFrame:
    """Quadrat-count chi-square CSR test (the oldest point-pattern
    test): bucket points into a grid x grid lattice and compare cell
    counts to the uniform expectation.  With D_i = N*x_i - S the
    statistic chi2 = sum((x_i - S/N)^2 / (S/N)) = sum(D_i^2) / (N*S)
    — numerator and denominator EXACT integers, one final division.
    One-row output: n_cells, n_points, exact chi2_num/chi2_den, the
    chi2 double, and dof = N - 1.  Same touch-raw-rows-once shape as
    `local_moran` (one partial-agg'd count Exchange; everything else
    is grid-bounded)."""
    spark = pts.sparkSession
    cw = x_period // grid
    ch = y_period // grid
    n_cells = grid * grid
    counts = (pts.select(
                  F.expr(f"({x_col} div {cw})").alias("cell_x"),
                  F.expr(f"({y_col} div {ch})").alias("cell_y"))
              .groupBy("cell_x", "cell_y")
              .agg(F.count(F.lit(1)).alias("n_pts")))
    skeleton = spark.range(n_cells).select(
        (F.col("id") % grid).alias("cell_x"),
        F.expr(f"id div {grid}").alias("cell_y"))
    cells = (skeleton.join(counts, ["cell_x", "cell_y"], "left")
             .select(F.coalesce("n_pts", F.lit(0)).alias("n_pts")))
    tot = cells.agg(F.sum("n_pts").alias("s"))
    return (cells.join(F.broadcast(tot))
            .select("n_pts", "s",
                    ((F.lit(n_cells) * F.col("n_pts") - F.col("s"))
                     * (F.lit(n_cells) * F.col("n_pts") - F.col("s")))
                    .alias("dsq"))
            .agg(F.max("s").alias("s"), F.sum("dsq").alias("chi2_num"))
            .select(F.lit(n_cells).cast("long").alias("n_cells"),
                    F.col("s").alias("n_points"),
                    "chi2_num",
                    (F.lit(n_cells) * F.col("s")).alias("chi2_den"),
                    (F.col("chi2_num").cast("double")
                     / (F.lit(n_cells) * F.col("s")).cast("double"))
                    .alias("chi2"),
                    F.lit(n_cells - 1).cast("long").alias("dof")))


# --- kernel density surface (exact-integer Epanechnikov) -------------------
#
# The smoothed counterpart to the raw per-cell counts: a KDE "heat
# surface" at the cell centers, with the Epanechnikov kernel kept
# EXACT — w(d) = max(0, (2R)^2 - (2d)^2) in doubled integer
# coordinates (doubling makes the half-cell centers integers), so the
# per-cell sum is an int64 and the oracle hash-pins every weight.  x
# wraps (longitude), y clamps — lattice conventions.

def kde_pieces(pts: DataFrame, grid: int, radius: int,
               x_col: str = "x", y_col: str = "y",
               x_period: int = 360000,
               y_period: int = 170000) -> DataFrame:
    """(cell_x, cell_y, _w) positive Epanechnikov pieces — the shared
    per-event candidate builder behind batch ``kde_heat`` and the
    streaming twin (stateless narrow ops, so it composes with
    ``readStream`` unchanged): (2r+1)^2 explode, wrap-aware doubled-
    coordinate weight, w > 0 filter."""
    cw = x_period // grid
    ch = y_period // grid
    rx = radius // cw + 1
    ry = radius // ch + 1
    if 2 * rx + 1 > grid:
        raise ValueError(
            f"radius {radius} spans the whole {grid}-cell ring "
            f"(2*{rx}+1 > {grid}): wrap offsets would double-count")
    r2d = (2 * radius) * (2 * radius)
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in range(-rx, rx + 1) for dy in range(-ry, ry + 1)])
    ev = pts.select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"),
                    F.expr(f"({x_col} div {cw})").alias("_cx"),
                    F.expr(f"({y_col} div {ch})").alias("_cy"))
    cand = (ev.select("_x", "_y", F.explode(offs).alias("o"),
                      "_cx", "_cy")
            .select("_x", "_y",
                    ((F.col("_cx") + F.col("o.dx") + grid) % grid)
                    .alias("cell_x"),
                    (F.col("_cy") + F.col("o.dy")).alias("cell_y"))
            .filter((F.col("cell_y") >= 0) & (F.col("cell_y") < grid)))
    adx = F.abs(2 * F.col("_x") - (2 * F.col("cell_x") + 1) * F.lit(cw))
    dx = F.least(adx, F.lit(2 * x_period) - adx)
    dy = F.abs(2 * F.col("_y") - (2 * F.col("cell_y") + 1) * F.lit(ch))
    w = F.greatest(F.lit(0).cast("long"),
                   F.lit(r2d) - dx * dx - dy * dy)
    return (cand.withColumn("_w", w)
            .filter(F.col("_w") > 0)
            .select("cell_x", "cell_y", "_w"))


def kde_heat(pts: DataFrame, grid: int, radius: int,
             x_col: str = "x", y_col: str = "y",
             x_period: int = 360000, y_period: int = 170000) -> DataFrame:
    """Exact Epanechnikov KDE at lattice-cell centers: one row per
    cell with ``kde_num`` = sum over events within ``radius`` of
    (2R)^2 - d2x - d2y (doubled coords) and ``n_in`` = contributing
    event count.

    Scale plan: each event explodes into its (2r+1)^2 candidate
    neighbor cells (r = radius div cell_width + 1 — provably covers
    every positive-weight cell since an event >= (|o|-0.5) cells from
    a center is > radius away beyond that ring), weights are pure
    Column math, and ONE partial-agg'd groupBy(cell) Exchange sums
    them — map-side combine collapses the fan-out before the shuffle.
    The DuckDB oracle deliberately computes the LITERAL all-pairs
    event x cell sum, so the gate proves the blocking covers every
    positive weight, not just that two engines share a plan."""
    spark = pts.sparkSession
    n = grid * grid
    agg = (kde_pieces(pts, grid, radius, x_col, y_col,
                      x_period, y_period)
           .groupBy("cell_x", "cell_y")
           .agg(F.sum("_w").alias("kde_num"),
                F.count(F.lit(1)).alias("n_in")))
    skeleton = spark.range(n).select(
        (F.col("id") % grid).alias("cell_x"),
        F.expr(f"id div {grid}").alias("cell_y"))
    return (skeleton.join(agg, ["cell_x", "cell_y"], "left")
            .select(F.col("cell_x").cast("long"),
                    F.col("cell_y").cast("long"),
                    F.coalesce("kde_num", F.lit(0)).cast("long")
                    .alias("kde_num"),
                    F.coalesce("n_in", F.lit(0)).cast("long")
                    .alias("n_in")))


# The value-interpolation counterpart to the KDE density: an
# inverse-distance-weighted (IDW, Shepard) surface of a sample VALUE
# at the cell centers.  Weights are integer floor-divisions
# w = IDW_SCALE div (d2 + d0) with d2 the doubled-coordinate squared
# distance (same lattice conventions as kde_heat: x wraps, y clamps)
# and d0 = cell_w * cell_h the softening term — the standard nugget
# regularization, which also caps w (and so every int64 sum) at
# IDW_SCALE/d0.  Positive integer division floors identically in
# Spark (`div`) and DuckDB (`//`), so every weight is hash-exact.

IDW_SCALE = 10 ** 12


def idw_surface(pts: DataFrame, grid: int, radius: int,
                x_col: str = "x", y_col: str = "y", v_col: str = "v",
                x_period: int = 360000,
                y_period: int = 170000) -> DataFrame:
    """Exact-integer IDW interpolation at lattice-cell centers: per
    cell, ``idw_num`` = sum of w*v and ``idw_den`` = sum of w over
    samples within ``radius`` (strict, the kde_heat convention),
    ``n_in`` the contributing count, and ``idw_est`` = num/den as ONE
    correctly-rounded IEEE division (0.0 for empty cells — den > 0
    whenever any sample is in range since w >= 1 up to d2 <=
    IDW_SCALE - d0, far beyond any practical radius).

    Scale plan: identical to kde_heat — each sample explodes into its
    (2r+1)^2 candidate cells, weights are pure Column math, ONE
    partial-agg'd groupBy(cell) Exchange; the DuckDB oracle computes
    the LITERAL all-pairs cell x sample sum so the gate proves the
    blocking covers every in-radius sample."""
    spark = pts.sparkSession
    cw = x_period // grid
    ch = y_period // grid
    rx = radius // cw + 1
    ry = radius // ch + 1
    if 2 * rx + 1 > grid:
        raise ValueError(
            f"radius {radius} spans the whole {grid}-cell ring "
            f"(2*{rx}+1 > {grid}): wrap offsets would double-count")
    r2d = (2 * radius) * (2 * radius)
    d0 = cw * ch
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in range(-rx, rx + 1) for dy in range(-ry, ry + 1)])
    ev = pts.select(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"),
                    F.col(v_col).alias("_v"),
                    F.expr(f"({x_col} div {cw})").alias("_cx"),
                    F.expr(f"({y_col} div {ch})").alias("_cy"))
    cand = (ev.select("_x", "_y", "_v", F.explode(offs).alias("o"),
                      "_cx", "_cy")
            .select("_x", "_y", "_v",
                    ((F.col("_cx") + F.col("o.dx") + grid) % grid)
                    .alias("cell_x"),
                    (F.col("_cy") + F.col("o.dy")).alias("cell_y"))
            .filter((F.col("cell_y") >= 0) & (F.col("cell_y") < grid)))
    adx = F.abs(2 * F.col("_x") - (2 * F.col("cell_x") + 1) * F.lit(cw))
    dx = F.least(adx, F.lit(2 * x_period) - adx)
    dy = F.abs(2 * F.col("_y") - (2 * F.col("cell_y") + 1) * F.lit(ch))
    d2 = (dx * dx + dy * dy).cast("long")
    pieces = (cand.withColumn("_d2", d2)
              .filter(F.col("_d2") < F.lit(r2d))
              .withColumn("_w", F.expr(f"CAST({IDW_SCALE} AS BIGINT)"
                                       f" div (_d2 + {d0})")))
    agg = (pieces.groupBy("cell_x", "cell_y")
           .agg(F.sum(F.col("_w") * F.col("_v")).alias("idw_num"),
                F.sum("_w").alias("idw_den"),
                F.count(F.lit(1)).alias("n_in")))
    skeleton = spark.range(grid * grid).select(
        (F.col("id") % grid).alias("cell_x"),
        F.expr(f"id div {grid}").alias("cell_y"))
    est = F.when(F.col("idw_den") > 0,
                 F.col("idw_num").cast("double")
                 / F.col("idw_den").cast("double")) \
           .otherwise(F.lit(0.0).cast("double"))
    return (skeleton.join(agg, ["cell_x", "cell_y"], "left")
            .select(F.col("cell_x").cast("long"),
                    F.col("cell_y").cast("long"),
                    F.coalesce("n_in", F.lit(0)).cast("long")
                    .alias("n_in"),
                    F.coalesce("idw_num", F.lit(0)).cast("long")
                    .alias("idw_num"),
                    F.coalesce("idw_den", F.lit(0)).cast("long")
                    .alias("idw_den"),
                    est.alias("idw_est")))
