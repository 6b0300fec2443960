"""Custom stateful streaming operator: cross-batch KDE heat surface.

The streaming twin of ``operators/hotspots.py::kde_heat``: the
per-cell Epanechnikov sums are ADDITIVE, so cross-batch state is just
(kde_num, n_in) — two longs per touched cell, order-independent, and
the final streamed state equals the batch operator over the union of
all inputs bit-for-bit (test-pinned).  This is the live "heat layer"
a continuously-ingesting map keeps warm: constant-size state per
cell, sharded by the state store across executors.

Every per-event weight is JVM Column math BEFORE the stateful
operator (the shared ``kde_pieces`` builder — stateless narrow ops,
stream-safe); Python adds two ints per (cell, batch), never per row.
Each micro-batch emits the cell's refreshed running sums (a
changelog — downstream keeps the latest row per cell).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession

from ..operators import hotspots as HOT

OUT_SCHEMA = "cell_x long, cell_y long, kde_num long, n_in long, n_updates int"


def stream_kde_heat(spark: SparkSession, input_path: str,
                    checkpoint: str, grid: int, radius: int,
                    query_name: str = "kde_stream",
                    max_files_per_trigger: int | None = None):
    """Start the streaming KDE over a parquet directory stream of
    (id, x, y) integer rows; emits one refreshed (cell, kde_num,
    n_in, n_updates) row per updated cell per micro-batch to the
    in-memory table ``query_name``."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    reader = spark.readStream.schema("id long, x long, y long")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pts = reader.parquet(input_path)
    pieces = HOT.kde_pieces(pts, grid, radius)

    state_schema = "kde_num long, n_in long, n_updates int"

    def upd(key, pdf_iter, state: GroupState):
        cx, cy = key
        if state.hasTimedOut:  # never set; keep the branch total
            state.remove()
            return
        kde_num = n_in = 0
        n_updates = 0
        if state.exists:
            kde_num, n_in, n_updates = state.get
        seen = False
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            seen = True
            kde_num += int(pdf["_w"].sum())
            n_in += len(pdf)
        if not seen:
            return
        n_updates += 1
        state.update((kde_num, n_in, n_updates))
        yield pd.DataFrame(
            [(cx, cy, kde_num, n_in, n_updates)],
            columns=["cell_x", "cell_y", "kde_num", "n_in", "n_updates"])

    out = (pieces.groupBy("cell_x", "cell_y")
           .applyInPandasWithState(upd, OUT_SCHEMA, state_schema,
                                   "append",
                                   GroupStateTimeout.NoTimeout))
    return (out.writeStream.outputMode("append")
               .format("memory").queryName(query_name)
               .option("checkpointLocation", checkpoint)
               .trigger(availableNow=True)
               .start())
