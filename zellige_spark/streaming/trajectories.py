"""Custom stateful streaming operator: cross-batch trajectory stats.

A live telemetry stream (vehicle fleets, geotagged uploads) must keep
per-entity track statistics current as micro-batches arrive.  A
stateless per-batch aggregation loses the leg that CROSSES a batch
boundary (last point of batch N to first point of batch N+1) and the
running totals; this operator keeps exactly the carry a resumable fold
needs as keyed state.

State per entity — constant size regardless of rows or batches (the
100-TB state-store shape, like streaming/dedup.py one row per key):
(n_points, length_m, max_leg_m, first_es, first_lon, first_lat,
last_es, last_lon, last_lat, batch_n).

Each micro-batch sorts its rows by (ts, event_id), chains them onto
the stored last point, and folds with the SAME meter-quantization rule
as the batch operator (``operators/trajectories.track_stats``: floor
the haversine km x 1000 per leg, BIGINT totals): one updated-stats row
per entity per batch (a changelog; downstream upserts by entity).

Contract: the source is event-time ordered ACROSS batches (the
incremental-publish shape — same contract as the incremental tile
refresh); within a batch any order is fine because the fold sorts.
Under that contract the stream's final row per entity equals the batch
twin bit-for-bit — test-pinned over per-file micro-batches.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OUT_SCHEMA = ("user_id long, n_points long, length_m long, max_leg_m long, "
              "net_m long, dur_s long, batch_n long")

STATE_SCHEMA = ("n_points long, length_m long, max_leg_m long, "
                "first_es long, first_lon double, first_lat double, "
                "last_es long, last_lon double, last_lat double, "
                "batch_n long")

EVENT_SCHEMA = ("user_id long, event_id long, ts timestamp, "
                "lon double, lat double")


def _hav_m(lon1: float, lat1: float, lon2: float, lat2: float) -> int:
    """floor(haversine_km * 1000): the same formula (incl. the asin
    radicand clamp) as the Column/oracle twins in
    operators/trajectories.py."""
    r1, r2 = math.radians(lat1), math.radians(lat2)
    dlat, dlon = r2 - r1, math.radians(lon2) - math.radians(lon1)
    a = (math.sin(dlat / 2) ** 2
         + math.cos(r1) * math.cos(r2) * math.sin(dlon / 2) ** 2)
    return math.floor(2.0 * 6371.0 * math.asin(min(1.0, math.sqrt(a)))
                      * 1000.0)


def stream_track_stats(spark: SparkSession, input_path: str,
                       checkpoint: str, query_name: str = "traj_stream",
                       max_files_per_trigger: int | None = None):
    """Start the streaming track-stats fold over a parquet directory
    stream; emits one cumulative-stats row per entity per micro-batch
    to the in-memory table ``query_name``."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pts = reader.parquet(input_path)

    def fold(key, pdf_iter, state: GroupState):
        (uid,) = key
        if state.hasTimedOut:  # never set; keep the branch total
            state.remove()
            return
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        if not len(rows):
            return
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        es = (rows["ts"].astype("datetime64[s]").astype("int64")).tolist()
        lons = rows["lon"].tolist()
        lats = rows["lat"].tolist()

        if state.exists:
            (n, length_m, max_leg, f_es, f_lon, f_lat,
             l_es, l_lon, l_lat, batch_n) = state.get
        else:
            n = length_m = max_leg = 0
            f_es, f_lon, f_lat = es[0], lons[0], lats[0]
            l_es = l_lon = l_lat = None
            batch_n = 0

        for i in range(len(es)):
            if l_lon is not None:
                leg = _hav_m(l_lon, l_lat, lons[i], lats[i])
                length_m += leg
                max_leg = max(max_leg, leg)
            l_es, l_lon, l_lat = es[i], lons[i], lats[i]
            n += 1
        batch_n += 1
        state.update((n, length_m, max_leg, f_es, f_lon, f_lat,
                      l_es, l_lon, l_lat, batch_n))
        net_m = _hav_m(f_lon, f_lat, l_lon, l_lat)
        yield pd.DataFrame([(uid, n, length_m, max_leg, net_m,
                             l_es - f_es, batch_n)],
                           columns=["user_id", "n_points", "length_m",
                                    "max_leg_m", "net_m", "dur_s",
                                    "batch_n"])

    out = (pts.groupBy("user_id")
              .applyInPandasWithState(fold, OUT_SCHEMA, STATE_SCHEMA,
                                      "append",
                                      GroupStateTimeout.NoTimeout))
    return (out.writeStream.outputMode("append")
            .format("memory").queryName(query_name)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def stream_track_stats_batch_twin(spark: SparkSession,
                                  *paths: str) -> DataFrame:
    """Batch-equivalent stats over the union of the same inputs — the
    oracle-checked Column operator, dropping the stream-only batch_n."""
    from ..operators.trajectories import track_stats

    return track_stats(spark.read.parquet(*paths))
