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

__all__ = ["dense_cells", "hotspot_clusters", "cluster_stats"]


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
