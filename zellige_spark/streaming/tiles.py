"""Streaming tile refresh: incremental MVT materialization.

``stream_tile_refresh`` consumes an image-row stream (file source) and,
per micro-batch, re-encodes ONLY the tiles the batch touches — reading
the accumulated staging data back filtered to those tile keys (a
collected isin literal for small batches, a broadcast semi-join above
``touched_cap``) — then commits the refreshed tiles as a new TileStore
snapshot.  Staging writes are keyed by batch_id (overwrite), so
foreachBatch's at-least-once replays are idempotent.  ``read_latest_tiles`` resolves the current materialized view
(newest version per tile across the snapshot chain).

This is the streaming complement to plans/lineage.encode_resumable:
same snapshot model, but tiles are re-encoded (merged) instead of
skipped, because a point stream keeps appending into existing tiles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import encode as E
from ..operators import tiles as T
from ..plans.lineage import TileStore


# above this many touched tiles the refresh switches from a collected
# literal isin filter to a broadcast semi-join, bounding driver memory
TOUCHED_COLLECT_CAP = 20_000


def stream_tile_refresh(spark: SparkSession, input_path: str, work_dir: str,
                        zoom: int = 6, extent: int = 4096, buffer: int = 128,
                        layer_name: str = "images",
                        touched_cap: int = TOUCHED_COLLECT_CAP):
    """Returns (StreamingQuery, TileStore)."""
    store = TileStore(os.path.join(work_dir, "store"))
    staging = os.path.join(work_dir, "staging")
    ckpt = os.path.join(work_dir, "ckpt")

    src = (spark.readStream.schema("image_id string, lon double, lat double")
           .parquet(input_path))

    def refresh(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.select("image_id", "lon", "lat").cache()
        assigned = T.assign_tiles_buffered(batch_df, zoom=zoom,
                                           extent=extent, buffer=buffer)
        touched_df = assigned.select("tile_key").distinct()
        n_touched = touched_df.count()
        if n_touched == 0:
            batch_df.unpersist()
            return
        # stage the RAW rows (the buffered fan-out would duplicate
        # edge-band points on every replay).  foreachBatch is
        # at-least-once: keying the write by batch_id and overwriting
        # makes a replayed batch idempotent instead of double-counted.
        batch_df.write.mode("overwrite").parquet(
            os.path.join(staging, f"batch={batch_id}"))
        # full state of the touched tiles only
        hist = spark.read.parquet(staging).select("image_id", "lon", "lat")
        hist = T.assign_tiles_buffered(hist, zoom=zoom, extent=extent, buffer=buffer)
        if n_touched <= touched_cap:
            touched = [r["tile_key"] for r in touched_df.collect()]
            hist = hist.filter(F.col("tile_key").isin(touched))
        else:  # wide batches: never collect an unbounded key list
            hist = hist.join(F.broadcast(touched_df), "tile_key", "left_semi")
        tiles = E.assemble_point_tiles_streaming(
            hist, layer_name=layer_name, extent=extent, buffer=buffer)
        store.commit_tiles(tiles, f"stream batch {batch_id}")
        batch_df.unpersist()

    q = (src.writeStream.foreachBatch(refresh)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    return q, store


def read_latest_tiles(spark: SparkSession, store: TileStore) -> DataFrame:
    """Current materialized view: the newest committed version of each
    tile across the snapshot chain (snapshot order = manifest order)."""
    # chronological order via the manifest chain (hex sids don't sort)
    sids = sorted(store.snapshots(),
                  key=lambda s: store.manifest(s)["timestamp_ms"])
    parts = []
    for order, sid in enumerate(sids):
        df = store.read_tiles(spark, sid).withColumn("_ord", F.lit(order))
        parts.append(df)
    allt = parts[0]
    for p in parts[1:]:
        allt = allt.unionByName(p)
    w = Window.partitionBy("zoom", "tile_x", "tile_y").orderBy(F.col("_ord").desc())
    return (allt.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn", "_ord"))
