"""Global spatial autocorrelation and lattice point-pattern statistics.

Completes the spatial-statistics toolkit around ``hotspots.local_moran``
(the LISA) with the classical GLOBAL tests every GIS ships (all from
the public literature — Moran 1950, Geary 1954, Getis & Ord 1992,
Cliff & Ord join counts, Matheron's empirical semivariogram; no
reference-repo counterpart):

* :func:`global_autocorr` — Moran's I + Geary's C in ONE row,
* :func:`getis_ord` — the Gi* hot/cold-spot z-surface per cell,
* :func:`join_counts` — BB/BW/WW binary join-count statistics,
* :func:`semivariogram` — the empirical variogram ladder by lag.

All four share the ``local_moran`` lattice conventions: per-cell
point counts on a ``grid`` x ``grid`` integer lattice over the
(x_period, y_period) space, x wraps (antimeridian), y clamps (poles),
queen (8-neighbor) adjacency.  Every statistic is carried as EXACT
int64 numerator/denominator fractions — the mean is scaled away via
D_i = N*x_i - S — with at most ONE final long->double division (and,
for the z-valued surfaces, one IEEE-correctly-rounded sqrt), so the
doubles hash-match DuckDB bit-for-bit under the oracle gate.

Scale plan (identical to ``local_moran``): raw rows are touched ONCE
by the per-cell count — a single Exchange with map-side partial
aggregation.  Everything after (skeleton join, neighbor sends, global
scalars) runs on the grid-bounded cell set: N = grid^2 rows however
many input rows there are.  int64 headroom: |D| <= N*max(x);
the largest products here are ~N^2*max(x)^2 * N — fine through
~1e4 cells x 1e5 per-cell counts; the web-scale upgrade is the
map_snap DECIMAL(38) pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["lattice_cells", "global_autocorr", "getis_ord",
           "join_counts", "semivariogram", "variogram_offsets"]


def lattice_cells(pts: DataFrame, grid: int,
                  x_col: str = "x", y_col: str = "y",
                  x_period: int = 360000,
                  y_period: int = 170000) -> DataFrame:
    """Full-grid per-cell counts: (cell_x, cell_y, n_pts) with one row
    per lattice cell INCLUDING empty cells (global statistics are
    defined over the study area, not the occupied cells).  One
    partial-agg'd Exchange over the raw rows; the skeleton join runs
    on the grid-bounded set."""
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
    return (skeleton.join(counts, ["cell_x", "cell_y"], "left")
            .select("cell_x", "cell_y",
                    F.coalesce("n_pts", F.lit(0)).alias("n_pts")))


def _neighbor_sends(cells: DataFrame, grid: int,
                    include_self: bool) -> DataFrame:
    """Each cell sends (x_j, cell coords) to its queen neighbors
    (x wraps, y clamps); ``include_self`` adds the self-send that
    Gi* (star) semantics require.  Returns the RECEIVER-keyed rows
    (cell_x, cell_y, x_j)."""
    self_pred = ("" if include_self
                 else " AND NOT (p.nx = cell_x AND p.ny = cell_y)")
    return (cells.select(
        F.col("n_pts").alias("x_j"),
        F.explode(F.expr(
            f"filter(transform(sequence(0, 8), o -> struct("
            f"(cell_x + (o div 3) - 1 + {grid}) % {grid} AS nx, "
            f"cell_y + (o % 3) - 1 AS ny)), "
            f"p -> p.ny >= 0 AND p.ny < {grid}{self_pred})")).alias("nb"))
        .select(F.col("nb.nx").alias("cell_x"),
                F.col("nb.ny").alias("cell_y"), "x_j"))


def global_autocorr(pts: DataFrame, grid: int,
                    x_col: str = "x", y_col: str = "y",
                    x_period: int = 360000,
                    y_period: int = 170000) -> DataFrame:
    """Global Moran's I and Geary's C over per-cell counts, one row.

    With D_i = N*x_i - S (exact int; d_i = D_i/N is the deviation):

      I = (N/W) * sum_ij w_ij d_i d_j / sum_k d_k^2
        = N * sum_i D_i*L_i / (W * sum D^2)            (N^2 cancels)
      C = ((N-1)/(2W)) * sum_ij w_ij (x_i-x_j)^2 / sum_k d_k^2
        = (N-1)*N^2*gsum / (2W * sum D^2)

    where L_i = sum of neighbor D_j and gsum = sum_ij w_ij (x_i-x_j)^2
    (an exact int via the receiver-side identity
    sum_j (x_i-x_j)^2 = w_i*x_i^2 - 2*x_i*sum x_j + sum x_j^2).
    Output columns: n_cells, n_points, w_joins (directed weight count
    W), exact i_num/i_den and c_num/c_den, and the two doubles from
    ONE division each.  E[I] = -1/(N-1) for reference."""
    n_cells = grid * grid
    cells = lattice_cells(pts, grid, x_col, y_col, x_period, y_period)
    glob = cells.agg(
        F.sum("n_pts").alias("s"),
        F.sum(F.col("n_pts") * F.col("n_pts")).alias("sq"))
    dev = (cells.join(F.broadcast(glob))
           .select("cell_x", "cell_y", "n_pts", "s", "sq",
                   (F.lit(n_cells) * F.col("n_pts") - F.col("s"))
                   .alias("d")))
    recv = (_neighbor_sends(cells, grid, include_self=False)
            .groupBy("cell_x", "cell_y")
            .agg(F.count(F.lit(1)).alias("w_i"),
                 F.sum("x_j").alias("sx_j"),
                 F.sum(F.col("x_j") * F.col("x_j")).alias("sxx_j")))
    per_cell = (dev.join(recv, ["cell_x", "cell_y"])
                .select(
                    "s", "sq",
                    F.col("w_i").alias("w_i"),
                    (F.col("d") * (F.lit(n_cells) * F.col("sx_j")
                                   - F.col("w_i") * F.col("s")))
                    .alias("cross_i"),
                    (F.col("d") * F.col("d")).alias("dsq"),
                    (F.col("w_i") * F.col("n_pts") * F.col("n_pts")
                     - F.lit(2) * F.col("n_pts") * F.col("sx_j")
                     + F.col("sxx_j")).alias("g_i")))
    agg = per_cell.agg(
        F.max("s").alias("s"),
        F.sum("w_i").alias("w"),
        F.sum("cross_i").alias("cross"),
        F.sum("dsq").alias("ssd"),
        F.sum("g_i").alias("gsum"))
    i_num = F.lit(n_cells) * F.col("cross")
    i_den = F.col("w") * F.col("ssd")
    c_num = (F.lit(n_cells - 1) * F.lit(n_cells) * F.lit(n_cells)
             * F.col("gsum"))
    c_den = F.lit(2) * F.col("w") * F.col("ssd")
    return agg.select(
        F.lit(n_cells).cast("long").alias("n_cells"),
        F.col("s").cast("long").alias("n_points"),
        F.col("w").cast("long").alias("w_joins"),
        i_num.cast("long").alias("i_num"),
        i_den.cast("long").alias("i_den"),
        F.when(i_den == 0, F.lit(0.0).cast("double"))
         .otherwise(i_num.cast("double") / i_den.cast("double"))
         .alias("moran_i"),
        c_num.cast("long").alias("c_num"),
        c_den.cast("long").alias("c_den"),
        F.when(c_den == 0, F.lit(0.0).cast("double"))
         .otherwise(c_num.cast("double") / c_den.cast("double"))
         .alias("geary_c"))


def getis_ord(pts: DataFrame, grid: int,
              x_col: str = "x", y_col: str = "y",
              x_period: int = 360000,
              y_period: int = 170000) -> DataFrame:
    """Getis-Ord Gi* hot/cold-spot surface: one row per lattice cell.

    Gi* = (L_i - xbar*W_i) / (sd * sqrt((N*W_i - W_i^2)/(N-1))) with
    self-inclusive queen weights (W_i = neighbor count + 1, L_i = sum
    of x over the neighborhood incl self).  Scaling by N:

      n_i    = N*L_i - W_i*S                       (exact int, signed)
      Gi*^2  = n_i^2 * (N-1) /
               ((N*sumx2 - S^2) * (N*W_i - W_i^2))  (exact fraction)

    so gi_star = sign(n_i) * sqrt(gi2_num/gi2_den) costs one
    correctly-rounded division + one IEEE-correctly-rounded sqrt —
    bit-identical across engines, hash-exact under the oracle gate."""
    n_cells = grid * grid
    cells = lattice_cells(pts, grid, x_col, y_col, x_period, y_period)
    glob = cells.agg(
        F.sum("n_pts").alias("s"),
        F.sum(F.col("n_pts") * F.col("n_pts")).alias("sq"))
    recv = (_neighbor_sends(cells, grid, include_self=True)
            .groupBy("cell_x", "cell_y")
            .agg(F.count(F.lit(1)).alias("w_i"),
                 F.sum("x_j").alias("l_i")))
    n_i = F.lit(n_cells) * F.col("l_i") - F.col("w_i") * F.col("s")
    gden = (F.lit(n_cells) * F.col("sq") - F.col("s") * F.col("s"))
    gi2_num = n_i * n_i * F.lit(n_cells - 1)
    gi2_den = gden * (F.lit(n_cells) * F.col("w_i")
                      - F.col("w_i") * F.col("w_i"))
    ratio = gi2_num.cast("double") / gi2_den.cast("double")
    return (cells.join(recv, ["cell_x", "cell_y"])
            .join(F.broadcast(glob))
            .select("cell_x", "cell_y", "n_pts",
                    F.col("w_i").cast("long").alias("w_i"),
                    F.col("l_i").cast("long").alias("l_i"),
                    n_i.cast("long").alias("gi_num"),
                    gi2_num.cast("long").alias("gi2_num"),
                    gi2_den.cast("long").alias("gi2_den"),
                    F.when(gi2_den == 0, F.lit(0.0).cast("double"))
                     .otherwise(F.when(n_i < 0, -F.sqrt(ratio))
                                .otherwise(F.sqrt(ratio)))
                     .alias("gi_star")))


def join_counts(pts: DataFrame, grid: int, min_count: int = 1,
                x_col: str = "x", y_col: str = "y",
                x_period: int = 360000,
                y_period: int = 170000) -> DataFrame:
    """Cliff-Ord binary join-count statistics, one row: mark each
    lattice cell Black (n_pts >= min_count) or White, count BB / BW /
    WW joins over UNDIRECTED queen adjacencies, and report the
    nonfree-sampling expectations as exact fractions:

      E[BB] = J*nB*(nB-1) / (N*(N-1)),  E[WW] symmetric,
      E[BW] = 2*J*nB*nW  / (N*(N-1)),   J = total undirected joins.

    Everything is grid-bounded after the one raw-row count Exchange;
    the adjacency pair set is an equi-join on neighbor coordinates
    deduped by cell-key order."""
    n_cells = grid * grid
    cells = (lattice_cells(pts, grid, x_col, y_col, x_period, y_period)
             .withColumn("key", F.col("cell_x") * F.lit(grid)
                         + F.col("cell_y"))
             .withColumn("b", (F.col("n_pts") >= min_count)
                         .cast("long")))
    nbr = (cells.select(
        "key", "b",
        F.explode(F.expr(
            f"filter(transform(sequence(0, 8), o -> struct("
            f"(cell_x + (o div 3) - 1 + {grid}) % {grid} AS nx, "
            f"cell_y + (o % 3) - 1 AS ny)), "
            f"p -> p.ny >= 0 AND p.ny < {grid} AND NOT (p.nx = cell_x "
            f"AND p.ny = cell_y))")).alias("nb"))
        .select("key", "b",
                (F.col("nb.nx") * F.lit(grid) + F.col("nb.ny"))
                .alias("nkey")))
    other = cells.select(F.col("key").alias("nkey"),
                         F.col("b").alias("nb_b"))
    pairs = (nbr.join(other, "nkey")
             .filter(F.col("key") < F.col("nkey")))
    marks = cells.agg(F.sum("b").alias("n_black"))
    agg = (pairs.agg(
        F.count(F.lit(1)).alias("j"),
        F.sum(F.col("b") * F.col("nb_b")).alias("bb"),
        F.sum((F.lit(1) - F.col("b"))
              * (F.lit(1) - F.col("nb_b"))).alias("ww"))
        .join(F.broadcast(marks)))
    n_white = F.lit(n_cells) - F.col("n_black")
    e_den = F.lit(n_cells) * F.lit(n_cells - 1)
    return agg.select(
        F.lit(n_cells).cast("long").alias("n_cells"),
        F.col("n_black").cast("long").alias("n_black"),
        F.col("j").cast("long").alias("n_joins"),
        F.col("bb").cast("long").alias("bb"),
        (F.col("j") - F.col("bb") - F.col("ww")).cast("long").alias("bw"),
        F.col("ww").cast("long").alias("ww"),
        (F.col("j") * F.col("n_black") * (F.col("n_black") - 1))
        .cast("long").alias("ebb_num"),
        (F.lit(2) * F.col("j") * F.col("n_black") * n_white)
        .cast("long").alias("ebw_num"),
        (F.col("j") * n_white * (n_white - 1))
        .cast("long").alias("eww_num"),
        e_den.cast("long").alias("e_den"),
        ((F.col("j") * F.col("n_black") * (F.col("n_black") - 1))
         .cast("double") / e_den.cast("double")).alias("e_bb"),
        ((F.lit(2) * F.col("j") * F.col("n_black") * n_white)
         .cast("double") / e_den.cast("double")).alias("e_bw"),
        ((F.col("j") * n_white * (n_white - 1))
         .cast("double") / e_den.cast("double")).alias("e_ww"))


def variogram_offsets(max_r2: int):
    """Unique undirected lag offsets (dx, dy, h2) with dy > 0 or
    (dy == 0 and dx > 0) and dx^2+dy^2 <= max_r2 — each unordered
    cell pair is generated exactly once (requires sqrt(max_r2) <
    grid/2 so torus-x wrap cannot alias a lag).  Shared verbatim by
    the Column plan and the DuckDB oracle's VALUES list."""
    import math
    r = int(math.isqrt(max_r2))
    offs = []
    for dy in range(0, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx <= 0:
                continue
            h2 = dx * dx + dy * dy
            if h2 <= max_r2:
                offs.append((dx, dy, h2))
    return offs


def semivariogram(pts: DataFrame, grid: int, max_r2: int = 16,
                  x_col: str = "x", y_col: str = "y",
                  x_period: int = 360000,
                  y_period: int = 170000) -> DataFrame:
    """Matheron's empirical semivariogram of the per-cell counts over
    the lattice, one row per exact squared lag h2 <= max_r2:

      gamma(h2) = sum_{pairs at lag h2} (z_a - z_b)^2 / (2 * N_h2)

    Lags are EXACT integer squared cell distances (no float binning);
    pairs are generated once each from the half-plane offset set
    (x wraps, y clamps).  gamma_num / gamma_den are exact ints, gamma
    is the one division.  The pair join is offset-count * N rows —
    grid-bounded, independent of input size."""
    cells = lattice_cells(pts, grid, x_col, y_col, x_period, y_period)
    offs = variogram_offsets(max_r2)
    off_arr = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"),
                 F.lit(h2).alias("h2"))
        for dx, dy, h2 in offs])
    sent = (cells.select(
        F.col("n_pts").alias("z_a"),
        F.explode(off_arr).alias("o"),
        ((F.col("cell_x") + F.col("o.dx") + F.lit(grid)) % F.lit(grid))
        .alias("nx"),
        (F.col("cell_y") + F.col("o.dy")).alias("ny"))
        .filter((F.col("ny") >= 0) & (F.col("ny") < grid))
        .select("z_a", F.col("o.h2").alias("h2"),
                F.col("nx").alias("cell_x"), F.col("ny").alias("cell_y")))
    other = cells.select("cell_x", "cell_y", F.col("n_pts").alias("z_b"))
    return (sent.join(other, ["cell_x", "cell_y"])
            .groupBy("h2")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum((F.col("z_a") - F.col("z_b"))
                       * (F.col("z_a") - F.col("z_b"))).alias("gamma_num"))
            .select(F.col("h2").cast("long").alias("h2"),
                    F.col("n_pairs").cast("long").alias("n_pairs"),
                    F.col("gamma_num").cast("long").alias("gamma_num"),
                    (F.lit(2) * F.col("n_pairs")).cast("long")
                    .alias("gamma_den"),
                    (F.col("gamma_num").cast("double")
                     / (F.lit(2) * F.col("n_pairs")).cast("double"))
                    .alias("gamma"))
            .orderBy("h2"))
