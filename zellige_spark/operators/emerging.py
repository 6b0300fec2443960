"""Emerging hot spot analysis — the space-time composite of Getis-Ord
Gi* (per time slice) and Mann-Kendall (per cell across slices).

The classic GIS workflow (ArcGIS "Emerging Hot Spot Analysis" over a
space-time cube, public methodology): slice events into time bins,
score each lattice cell's Gi* within its slice, then classify each
cell by (a) whether it is hot NOW, (b) how often it has been hot, and
(c) whether its local intensity is trending — new / intensifying /
persistent / diminishing / sporadic / formerly / none.

Exact-arithmetic variant (documented deviations, chosen so the WHOLE
classification is int64-exact and hash-matches a DuckDB oracle):

* Hotness per slice is the exact rational test  z > 1.96  ⇔
  gi_num > 0 AND 10000 * gi2_num > 38416 * gi2_den  (1.96^2 =
  38416/10000; gi2_num/gi2_den is the exact squared-Gi* fraction from
  ``autocorr.getis_ord``'s scaling) — no float z anywhere.
* The trend runs on the cell's per-mille-of-slice-total neighborhood
  share, floor(l_i * 1e6 / s_t)  — an integer, so Mann-Kendall's sign
  comparisons and tie groups are exact.  (ArcGIS trends the float z
  series; the share differs from z by per-slice variance scaling but
  measures the same "is this cell's share of activity rising".)
* MK significance is the exact rational test |z_mk| > 1.96 ⇔
  180000 * (|s|-1)^2 > 38416 * var_num  (z_mk^2 =
  (|s|-1)^2 / (var_num/18)), using the tie-corrected var bracket from
  the ``mann_kendall`` query.

int64 bounds (documented like `local_moran`): with T events per slice
on an N-cell grid, |gi_num| <= 9*N*T so 10000*gi2_num <=
10000*81*(N-1)*N^2*T^2 — safe through N=64, T~2e6; the share fits at
l_i*1e6 <= 9e6*T.  Past that, the map_snap DECIMAL(38) pattern.

Scale plan: raw events are touched ONCE (the per-(slice, cell) count,
one partial-agg'd Exchange).  Everything else — per-slice globals,
the queen-neighborhood lag, the MK month-pair self-join — runs on the
cube-bounded table (slices x N rows regardless of input size), and
the MK pair join is per-cell over slices (<= slices^2 rows per cell).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["emerging_hotspots"]

# 1.96^2 as an exact rational (two-sided 5% normal critical value)
Z2_NUM = 38416
Z2_DEN = 10000
SHARE_SCALE = 1_000_000


def emerging_hotspots(pts_m: DataFrame, grid: int,
                      x_col: str = "x", y_col: str = "y",
                      m_col: str = "m",
                      x_period: int = 360000,
                      y_period: int = 170000) -> DataFrame:
    """Per-cell emerging-hotspot classification over a (x, y, time-bin)
    event frame.  Output one row per lattice cell: n_slices, n_hot,
    hot_now, MK s_stat / var_num over the share series, trend
    (+1/0/-1, exact 5% significance), and the category string."""
    spark = pts_m.sparkSession
    cw = x_period // grid
    ch = y_period // grid
    n = grid * grid
    counts = (pts_m.select(
                  F.col(m_col).alias("m"),
                  F.expr(f"({x_col} div {cw})").alias("cell_x"),
                  F.expr(f"({y_col} div {ch})").alias("cell_y"))
              .groupBy("m", "cell_x", "cell_y")
              .agg(F.count(F.lit(1)).alias("n_pts")))
    months = counts.select("m").distinct()
    skeleton = months.crossJoin(
        F.broadcast(spark.range(n).select(
            (F.col("id") % grid).alias("cell_x"),
            F.expr(f"id div {grid}").alias("cell_y"))))
    cells = (skeleton.join(counts, ["m", "cell_x", "cell_y"], "left")
             .select("m", "cell_x", "cell_y",
                     F.coalesce("n_pts", F.lit(0)).alias("n_pts")))
    glob = cells.groupBy("m").agg(
        F.sum("n_pts").alias("s"),
        F.sum(F.col("n_pts") * F.col("n_pts")).alias("sq"))
    recv = (cells.select(
                "m", F.col("n_pts").alias("x_j"),
                F.explode(F.expr(
                    f"filter(transform(sequence(0, 8), o -> struct("
                    f"(cell_x + (o div 3) - 1 + {grid}) % {grid} AS nx, "
                    f"cell_y + (o % 3) - 1 AS ny)), "
                    f"p -> p.ny >= 0 AND p.ny < {grid})")).alias("nb"))
            .groupBy("m", F.col("nb.nx").alias("cell_x"),
                     F.col("nb.ny").alias("cell_y"))
            .agg(F.count(F.lit(1)).alias("w_i"),
                 F.sum("x_j").alias("l_i")))
    n_i = F.lit(n) * F.col("l_i") - F.col("w_i") * F.col("s")
    gi2_num = n_i * n_i * F.lit(n - 1)
    gi2_den = ((F.lit(n) * F.col("sq") - F.col("s") * F.col("s"))
               * (F.lit(n) * F.col("w_i") - F.col("w_i") * F.col("w_i")))
    sl = (recv.join(F.broadcast(glob), "m")
          .select("m", "cell_x", "cell_y",
                  ((n_i > 0)
                   & (F.lit(Z2_DEN) * gi2_num > F.lit(Z2_NUM) * gi2_den))
                  .cast("int").alias("hot"),
                  F.expr(f"l_i * {SHARE_SCALE} div s").alias("share6"))
          .localCheckpoint(eager=True))
    # Mann-Kendall over the share series, per cell
    a, b = sl.alias("a"), sl.alias("b")
    sg = (F.when(F.col("b.share6") > F.col("a.share6"), F.lit(1))
          .when(F.col("b.share6") < F.col("a.share6"), F.lit(-1))
          .otherwise(F.lit(0)))
    s_tbl = (a.join(b, (F.col("a.cell_x") == F.col("b.cell_x"))
                    & (F.col("a.cell_y") == F.col("b.cell_y"))
                    & (F.col("a.m") < F.col("b.m")))
             .groupBy(F.col("a.cell_x").alias("cell_x"),
                      F.col("a.cell_y").alias("cell_y"))
             .agg(F.sum(sg).alias("s_stat")))
    ties = (sl.groupBy("cell_x", "cell_y", "share6")
            .agg(F.count(F.lit(1)).alias("t"))
            .groupBy("cell_x", "cell_y")
            .agg(F.sum(F.col("t") * (F.col("t") - 1)
                       * (F.lit(2) * F.col("t") + 5)).alias("tie_term")))
    per = (sl.groupBy("cell_x", "cell_y")
           .agg(F.count(F.lit(1)).alias("n_slices"),
                F.sum("hot").alias("n_hot"),
                F.max(F.struct(F.col("m"), F.col("hot"))).alias("_last"))
           .select("cell_x", "cell_y", "n_slices", "n_hot",
                   F.col("_last.hot").alias("hot_now")))
    mk = (per.join(s_tbl, ["cell_x", "cell_y"], "left")
          .join(ties, ["cell_x", "cell_y"])
          .select("cell_x", "cell_y", "n_slices", "n_hot", "hot_now",
                  F.coalesce("s_stat", F.lit(0)).alias("s_stat"),
                  (F.col("n_slices") * (F.col("n_slices") - 1)
                   * (F.lit(2) * F.col("n_slices") + 5)
                   - F.col("tie_term")).alias("var_num")))
    abs_s = F.abs(F.col("s_stat"))
    sig = ((F.col("var_num") > 0) & (abs_s > 0)
           & (F.lit(18 * Z2_DEN) * (abs_s - 1) * (abs_s - 1)
              > F.lit(Z2_NUM) * F.col("var_num")))
    trend = (F.when(sig & (F.col("s_stat") > 0), F.lit(1))
             .when(sig & (F.col("s_stat") < 0), F.lit(-1))
             .otherwise(F.lit(0)))
    out = mk.withColumn("trend", trend.cast("int"))
    cat = (F.when((F.col("hot_now") == 1) & (F.col("n_hot") == 1), "new")
           .when((F.col("hot_now") == 1) & (F.col("trend") == 1),
                 "intensifying")
           .when((F.col("hot_now") == 1) & (F.col("trend") == -1),
                 "diminishing")
           .when((F.col("hot_now") == 1)
                 & (F.col("n_hot") * 10 >= F.col("n_slices") * 9),
                 "persistent")
           .when(F.col("hot_now") == 1, "sporadic")
           .when(F.col("n_hot") > 0, "formerly")
           .otherwise("none"))
    return out.select(
        F.col("cell_x").cast("long"), F.col("cell_y").cast("long"),
        F.col("n_slices").cast("long"), F.col("n_hot").cast("long"),
        F.col("hot_now").cast("int"),
        F.col("s_stat").cast("long"), F.col("var_num").cast("long"),
        F.col("trend").cast("int"), cat.alias("category"))
