"""Custom stateful streaming operator: cross-batch distinct sketch.

A continuously-ingesting tile pipeline wants "distinct ids seen per
tile so far" without storing the ids — the register form of the
deterministic HLL (`operators/sketch.py`) is exactly the right state:
64 small ints per tile, max-merged, independent of how many rows or
batches arrived.  This is the state-store shape a 1000-executor
cluster shards naturally: keyed by tile, constant-size state per key.

The per-row geometric observable (bucket, rho) is JVM Column math
BEFORE the stateful operator (`hll_row_observables` — md5-nibble hash,
trailing-zero rank); Python only max-merges small numpy arrays, so the
slow path touches 64 ints per (tile, batch), not per row.

Each micro-batch emits the tile's REFRESHED estimate (a changelog —
downstream keeps the latest row per tile).  Determinism: registers are
max-merged, so the final state equals the batch computation over the
union of all batches regardless of batch boundaries or order —
test-pinned against ``hll_finalize(hll_registers(...))`` including the
float estimate (the Python finalize below uses the same literals the
Column finalize embeds, so the doubles are identical).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from ..operators import sketch as SK
from ..operators import tiles as T

OUT_SCHEMA = ("tile_x long, tile_y long, hll_sum long, est_hll double, "
              "n_updates int")


def _finalize_py(regs: np.ndarray) -> tuple:
    """(hll_sum, est_hll) from a 64-register array — the same exact
    arithmetic as ``hll_finalize``: integer harmonic sum, one IEEE
    division, LinearCounting via the SAME ``math.log`` doubles the
    Column side embeds as literals."""
    v = int((regs == 0).sum())
    s = sum(1 << (SK.RHO_CAP - int(r)) for r in regs if r > 0)
    s += v * (1 << SK.RHO_CAP)
    raw = SK._EST_NUM / float(s)
    if raw <= SK._LC_THRESHOLD and v >= 1:
        est = SK.M_BUCKETS * math.log(SK.M_BUCKETS / v)
    else:
        est = raw
    return s, est


def stream_tile_sketch(spark: SparkSession, input_path: str,
                       checkpoint: str, zoom: int = 9,
                       query_name: str = "sketch_stream",
                       max_files_per_trigger: int | None = None):
    """Start the streaming per-tile distinct sketch over a parquet
    directory stream of (id, lon, lat) rows; emits one refreshed
    (tile, hll_sum, est_hll, n_updates) row per updated tile per
    micro-batch to the in-memory table ``query_name``."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    reader = spark.readStream.schema("id long, lon double, lat double")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pts = reader.parquet(input_path)
    a = T.assign_tiles(pts, [zoom]).select("id", "tile_x", "tile_y")
    obs = SK.hll_row_observables(a, ["tile_x", "tile_y"], "id",
                                 barriers=False)

    state_schema = "regs array<int>, n_updates int"

    def upd(key, pdf_iter, state: GroupState):
        tx, ty = key
        if state.hasTimedOut:  # never set; keep the branch total
            state.remove()
            return
        regs = np.zeros(SK.M_BUCKETS, dtype=np.int64)
        n_updates = 0
        if state.exists:
            prev, n_updates = state.get
            regs[:] = prev
        seen = False
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            seen = True
            np.maximum.at(regs, pdf["bucket"].to_numpy(),
                          pdf["rho"].to_numpy())
        if not seen:
            return
        n_updates += 1
        state.update(([int(r) for r in regs], n_updates))
        s, est = _finalize_py(regs)
        yield pd.DataFrame(
            [(tx, ty, s, est, n_updates)],
            columns=["tile_x", "tile_y", "hll_sum", "est_hll", "n_updates"])

    out = (obs.groupBy("tile_x", "tile_y")
              .applyInPandasWithState(upd, OUT_SCHEMA, state_schema,
                                      "append",
                                      GroupStateTimeout.NoTimeout))
    return (out.writeStream.outputMode("append")
               .format("memory").queryName(query_name)
               .option("checkpointLocation", checkpoint)
               .trigger(availableNow=True)
               .start())
