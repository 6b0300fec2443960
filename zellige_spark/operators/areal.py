"""Areal interpolation — redistribute per-zone totals onto the tile
grid by overlap area (the classic GIS "census tract -> raster"
dasymetric step; public methodology, no reference counterpart).

Zones are axis-aligned integer rectangles (x0 <= x < x1, y0 <= y < y1)
carrying an integer ``total``; each grid cell receives
total * overlap_area / zone_area summed over the zones that touch it.
Everything stays exact: overlap area is a product of integer interval
overlaps, and each zone-cell share is floored at a fixed 1e6 scale —
``alloc_e6 = sum over zones of total * overlap * 1e6 div zone_area``
(documented quantization: each zone-cell piece loses < 1e-6 of the
zone total; exactness beats reconstructing float sums that no two
engines round alike).

Scale plan: each zone explodes into exactly the cells its rectangle
covers (two nested ``sequence`` explodes — fan-out = covered-cell
count, bounded by zone size over cell size), the per-piece share is
pure Column math, and ONE partial-agg'd groupBy(cell) Exchange sums
the pieces.  Zones larger than ~thousands of cells should be
pre-split coarsely (quadtree_split exists for exactly that shape);
the operator never joins zones with zones or cells with cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["areal_interp"]

ALLOC_SCALE = 1_000_000


def areal_interp(zones: DataFrame, grid: int,
                 x_period: int = 360000, y_period: int = 170000) -> DataFrame:
    """(cell_x, cell_y, n_zones, alloc_e6) over the full grid from a
    zones frame (zone_id, x0, x1, y0, y1, total) of half-open integer
    rectangles.  Cells receive 0 rows -> coalesced to zero via the
    skeleton so the surface is total (choropleth-ready)."""
    spark = zones.sparkSession
    cw = x_period // grid
    ch = y_period // grid
    n = grid * grid
    z = zones.select(
        "zone_id", "x0", "x1", "y0", "y1", "total",
        ((F.col("x1") - F.col("x0"))
         * (F.col("y1") - F.col("y0"))).alias("zarea"))
    covered = (z.filter(F.col("zarea") > 0)
               .select("*", F.explode(F.expr(
                   f"sequence(x0 div {cw}, (x1 - 1) div {cw})"))
                   .alias("cell_x"))
               .select("*", F.explode(F.expr(
                   f"sequence(y0 div {ch}, (y1 - 1) div {ch})"))
                   .alias("cell_y")))
    ox = (F.least(F.col("x1"), (F.col("cell_x") + 1) * F.lit(cw))
          - F.greatest(F.col("x0"), F.col("cell_x") * F.lit(cw)))
    oy = (F.least(F.col("y1"), (F.col("cell_y") + 1) * F.lit(ch))
          - F.greatest(F.col("y0"), F.col("cell_y") * F.lit(ch)))
    # exact floor(total*ov*SCALE/zarea) WITHOUT the triple product
    # (total*ov*SCALE can pass int64 when a zone sits inside one
    # cell): with a = total*ov = q*zarea + r,
    # floor(a*S/zarea) = q*S + floor(r*S/zarea) and every term stays
    # under int64 while zarea*SCALE does (zones < ~9e12 area units)
    piece = F.expr(
        f"(total * _ov div zarea) * {ALLOC_SCALE}"
        f" + (total * _ov % zarea) * {ALLOC_SCALE} div zarea")
    agg = (covered.withColumn("_ov", ox * oy)
           .withColumn("_piece", piece)
           .groupBy("cell_x", "cell_y")
           .agg(F.count(F.lit(1)).alias("n_zones"),
                F.sum("_piece").alias("alloc_e6")))
    skeleton = spark.range(n).select(
        (F.col("id") % grid).alias("cell_x"),
        F.expr(f"id div {grid}").alias("cell_y"))
    return (skeleton.join(agg, ["cell_x", "cell_y"], "left")
            .select(F.col("cell_x").cast("long"),
                    F.col("cell_y").cast("long"),
                    F.coalesce("n_zones", F.lit(0)).cast("long")
                    .alias("n_zones"),
                    F.coalesce("alloc_e6", F.lit(0)).cast("long")
                    .alias("alloc_e6")))
