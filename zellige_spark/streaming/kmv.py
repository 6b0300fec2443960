"""Custom stateful streaming operator: cross-batch bottom-k sketch.

The streaming twin of the KMV distinct sketch (`operators/sketch.py`):
per-tile state is the k smallest distinct 60-bit hashes seen so far —
at most k longs per key however many rows or batches arrive, the same
constant-size keyed-state shape as the streaming HLL.  Unlike HLL
registers this state supports downstream SET OPERATIONS (tile-overlap
estimation) on the live sketches.

The per-row hash is JVM Column math BEFORE the stateful operator
(`kmv_row_hashes`, barrier-free form for streams); Python only merges
two sorted lists of <= k ints per (tile, batch).  Each micro-batch
emits the tile's refreshed (n_sketch, kth_hash, est_kmv) — estimates
use the exact arithmetic of `kmv_finalize`, so the final streamed row
per tile equals the batch operator bit-for-bit including the float
estimate (test-pinned), regardless of batch boundaries: bottom-k
merging is order-independent.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators import sketch as SK
from ..operators import tiles as T

OUT_SCHEMA = ("tile_x long, tile_y long, n_sketch long, kth_hash long, "
              "est_kmv double, n_updates int")


def stream_tile_kmv(spark: SparkSession, input_path: str,
                    checkpoint: str, zoom: int = 3,
                    query_name: str = "kmv_stream",
                    max_files_per_trigger: int | None = None):
    """Start the streaming per-tile bottom-k sketch over a parquet
    directory stream of (id, lon, lat) rows; emits one refreshed row
    per updated tile per micro-batch to the in-memory table
    ``query_name``."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    reader = spark.readStream.schema("id long, lon double, lat double")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pts = reader.parquet(input_path)
    a = T.assign_tiles(pts, [zoom]).select("id", "tile_x", "tile_y")
    hs = SK.kmv_row_hashes(a, ["tile_x", "tile_y"], "id", barriers=False)

    state_schema = "hs array<long>, n_updates int"
    k = SK.KMV_K

    def upd(key, pdf_iter, state: GroupState):
        import pandas as pd

        tx, ty = key
        if state.hasTimedOut:  # never set; keep the branch total
            state.remove()
            return
        new = set()
        for pdf in pdf_iter:
            new.update(int(x) for x in pdf["h"])
        if not new:
            return
        n_up = 0
        if state.exists:
            prev, n_up = state.get
            new.update(int(x) for x in prev)
        merged = sorted(new)[:k]
        n_up += 1
        state.update((merged, n_up))
        if len(merged) == k:
            kth = merged[-1]
            est = SK._KMV_NUM / float(kth)
        else:
            kth = 0
            est = float(len(merged))
        yield pd.DataFrame(
            [(tx, ty, len(merged), kth, est, n_up)],
            columns=["tile_x", "tile_y", "n_sketch", "kth_hash",
                     "est_kmv", "n_updates"])

    out = (hs.groupBy("tile_x", "tile_y")
             .applyInPandasWithState(upd, OUT_SCHEMA, state_schema,
                                     "append",
                                     GroupStateTimeout.NoTimeout))
    return (out.writeStream.outputMode("append")
            .format("memory").queryName(query_name)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
