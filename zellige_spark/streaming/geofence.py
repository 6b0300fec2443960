"""Cross-batch streaming geofence: stateful enter/exit alerts.

The streaming twin of ``operators/geofence.geofence_transitions``: a
continuously-ingesting location stream must compare each entity's NEW
points against its LAST point from earlier micro-batches, which a
stateless per-batch window cannot do.  State per entity is constant
size — (last_ts_us, last_event_id, last_inside) — the smallest record
that lets the next batch continue the walk exactly where the last one
stopped.

The inside flag is the same shared-text ray cast as the batch
operator, computed MAP-SIDE before the state store, so the stateful
UDF only compares booleans.  State shards across executors by the
groupBy(entity) hash — the natural state-store layout at 1000
executors.

Ordering contract: micro-batches must arrive per-entity time-ordered
(true for replayed files and for Kafka partitioned by entity with
in-order producers); rows WITHIN a batch are sorted here.  A point
older than the entity's stored last_ts (a genuinely late arrival)
would be walked out of order — out-of-order streams need a watermark +
reordering stage in front, the standard streaming trade-off.

Equality with the batch twin on replayed batches is test-pinned
(``tests/test_stream_geofence.py``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.geofence import inside_crossings

OUT_SCHEMA = "user_id long, event_id long, ts_us long, kind string"


def stream_geofence(spark: SparkSession, input_path: str,
                    checkpoint: str, verts,
                    query_name: str = "geofence_stream",
                    max_files_per_trigger: int | None = None):
    """Start the streaming geofence over a parquet directory stream
    (schema: event_id, ts, user_id, lon, lat); emits transition rows
    to the in-memory table ``query_name``."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    reader = spark.readStream.schema(
        "event_id long, ts timestamp_ntz, user_id long,"
        " lon double, lat double")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pts = (reader.parquet(input_path)
           .select("user_id", "event_id",
                   F.expr("unix_micros(cast(ts as timestamp))")
                   .alias("ts_us"),
                   F.expr(f"(({inside_crossings(verts)}) % 2) = 1")
                   .alias("inside")))

    state_schema = "last_ts long, last_id long, last_inside boolean"

    def walk(key, pdf_iter, state: GroupState):
        (user,) = key
        if state.hasTimedOut:  # never set; keep the branch total
            state.remove()
            return
        rows = [(int(t), int(i), bool(s))
                for pdf in pdf_iter
                for t, i, s in zip(pdf["ts_us"], pdf["event_id"],
                                   pdf["inside"])]
        if not rows:
            return
        rows.sort()
        if state.exists:
            last_ts, last_id, prev = state.get
        else:
            last_ts, last_id, prev = None, None, None
        out = []
        for t, i, s in rows:
            if prev is not None and s != prev:
                out.append((user, i, t, "enter" if s else "exit"))
            prev = s
        t, i, s = rows[-1]
        state.update((t, i, s))
        yield pd.DataFrame(out, columns=["user_id", "event_id",
                                         "ts_us", "kind"])

    verdicts = (pts.groupBy("user_id")
                .applyInPandasWithState(walk, OUT_SCHEMA, state_schema,
                                        "append",
                                        GroupStateTimeout.NoTimeout))
    return (verdicts.writeStream.outputMode("append")
            .format("memory").queryName(query_name)
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint).start())
