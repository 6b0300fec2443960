"""Custom stateful streaming operator: cross-batch count-min sketch.

The streaming twin of `operators/sketch.py::cms_counters` /
`cms_estimate`: per-tile state is the flat d*w counter array —
EXACTLY 256 longs per key however many rows or batches arrive.  CMS
counters are additive, so merging micro-batches is order-independent
and the final streamed estimates equal the batch operator over the
union of all inputs bit-for-bit (test-pinned; the per-row hash and
bucket slices are the same md5-nibble math the batch Column plan and
the DuckDB oracle use, recomputed here via hashlib).

The per-row 60-bit hash is JVM Column math BEFORE the stateful
operator (barrier-free form for streams); Python only bins hashes
into d buckets and adds ints.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators import sketch as SK
from ..operators import tiles as T

OUT_SCHEMA = ("tile_x long, tile_y long, probe long, est long, "
              "n_updates int")


def stream_tile_cms(spark: SparkSession, input_path: str,
                    checkpoint: str, probes: list, zoom: int = 3,
                    query_name: str = "cms_stream",
                    max_files_per_trigger: int | None = None):
    """Start the streaming per-tile CMS over a parquet directory
    stream of (id, lon, lat) rows; every micro-batch emits the
    refreshed probe-frequency estimates for each updated tile to the
    in-memory table ``query_name``."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    d, w = SK.CMS_D, SK.CMS_W
    probe_rows = SK.cms_probe_buckets(probes)

    reader = spark.readStream.schema("id long, lon double, lat double")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pts = reader.parquet(input_path)
    a = T.assign_tiles(pts, [zoom]).select("id", "tile_x", "tile_y")
    hs = SK.kmv_row_hashes(a, ["tile_x", "tile_y"], "id", barriers=False)

    state_schema = "cnt array<long>, n_updates int"

    def upd(key, pdf_iter, state: GroupState):
        import pandas as pd

        tx, ty = key
        if state.hasTimedOut:  # never set; keep the branch total
            state.remove()
            return
        add = [0] * (d * w)
        n_rows = 0
        for pdf in pdf_iter:
            for h in pdf["h"]:
                hv = int(h)
                n_rows += 1
                for j in range(d):
                    add[j * w + ((hv >> (15 * j)) & (w - 1))] += 1
        if n_rows == 0:
            return
        n_up = 0
        if state.exists:
            prev, n_up = state.get
            add = [int(p) + a for p, a in zip(prev, add)]
        n_up += 1
        state.update((add, n_up))
        rows = []
        for p, j, b in probe_rows:
            if j == 0:
                est = min(add[jj * w + bb]
                          for pp, jj, bb in probe_rows if pp == p)
                rows.append((tx, ty, p, est, n_up))
        yield pd.DataFrame(
            rows, columns=["tile_x", "tile_y", "probe", "est",
                           "n_updates"])

    out = (hs.groupBy("tile_x", "tile_y")
             .applyInPandasWithState(upd, OUT_SCHEMA, state_schema,
                                     "append",
                                     GroupStateTimeout.NoTimeout))
    return (out.writeStream.outputMode("append")
            .format("memory").queryName(query_name)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
