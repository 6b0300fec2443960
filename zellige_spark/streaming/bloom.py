"""Custom stateful streaming operator: cross-batch Bloom membership.

The streaming twin of `operators/sketch.py::bloom_words` /
`bloom_member`: per-tile state is the flat 8-word bit array — EXACTLY
8 longs per key however many rows or batches arrive.  Bloom words are
a bitwise-OR monoid, so merging micro-batches is order-independent and
the final streamed membership verdicts equal the batch operator over
the union of all inputs bit-for-bit (test-pinned; the per-row hash is
the same md5-nibble math the batch Column plan and the DuckDB oracle
use, recomputed here via hashlib through `bloom_probe_words`).

The per-row 60-bit hash is JVM Column math BEFORE the stateful
operator (barrier-free form for streams); Python only ORs bits.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators import sketch as SK
from ..operators import tiles as T

OUT_SCHEMA = ("tile_x long, tile_y long, probe long, member int, "
              "n_updates int")

_N_WORDS = SK.BLOOM_M // SK._BLOOM_W


def stream_tile_bloom(spark: SparkSession, input_path: str,
                      checkpoint: str, probes: list, zoom: int = 3,
                      query_name: str = "bloom_stream",
                      max_files_per_trigger: int | None = None):
    """Start the streaming per-tile Bloom filter over a parquet
    directory stream of (id, lon, lat) rows; every micro-batch emits
    the refreshed membership verdict for each probe on each updated
    tile to the in-memory table ``query_name``."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    k, m, bw = SK.BLOOM_K, SK.BLOOM_M, SK._BLOOM_W
    # probe -> {word: required mask}, driver-computed once (hashlib
    # reproduces the engines' md5-nibble decode exactly)
    need: dict = {}
    for p, w, mask in SK.bloom_probe_words(probes):
        need.setdefault(p, {})[w] = mask

    reader = spark.readStream.schema("id long, lon double, lat double")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pts = reader.parquet(input_path)
    a = T.assign_tiles(pts, [zoom]).select("id", "tile_x", "tile_y")
    hs = SK.kmv_row_hashes(a, ["tile_x", "tile_y"], "id", barriers=False)

    state_schema = "words array<long>, n_updates int"

    def upd(key, pdf_iter, state: GroupState):
        import pandas as pd

        tx, ty = key
        if state.hasTimedOut:  # never set; keep the branch total
            state.remove()
            return
        words = [0] * _N_WORDS
        n_rows = 0
        for pdf in pdf_iter:
            for h in pdf["h"]:
                hv = int(h)
                n_rows += 1
                for j in range(k):
                    pos = (hv >> (15 * j)) & (m - 1)
                    words[pos // bw] |= 1 << (pos % bw)
        if n_rows == 0:
            return
        n_up = 0
        if state.exists:
            prev, n_up = state.get
            words = [int(a) | b for a, b in zip(prev, words)]
        n_up += 1
        state.update((words, n_up))
        rows = [(tx, ty, p,
                 int(all((words[w] & req) == req for w, req in wm.items())),
                 n_up)
                for p, wm in need.items()]
        yield pd.DataFrame(
            rows, columns=["tile_x", "tile_y", "probe", "member",
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
