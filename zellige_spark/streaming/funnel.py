"""Custom stateful streaming operator: cross-batch funnel progression.

The streaming form of `events.q_event_funnel`: a user's view can land
in one micro-batch and the click that completes stage 2 in a later
one — a stateless per-batch funnel would never connect them.  State
per user is three monotone booleans (seen view / qualified click /
qualified purchase — 3 bits, constant size); each batch walks the
user's new events in (ts, event_id) order, continues the flags where
the last batch stopped, and emits the user's stage row whenever the
stage ADVANCES (changelog output: the latest row per user is their
current funnel stage).

Batch twin: `events.q_event_funnel`'s per-user frame (the oracle-
checked driver query aggregates it); stream == twin whenever batches
arrive in time order — the same documented contract as the geofence /
dedup streams.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

OUT_SCHEMA = "user_id long, s1 int, s2 int, s3 int, event_id long"


def stream_funnel(spark: SparkSession, input_path: str, checkpoint: str,
                  query_name: str = "funnel_stream",
                  max_files_per_trigger: int | None = None):
    """Start the streaming funnel over a parquet directory stream of
    events; emits (user_id, s1, s2, s3, event_id-of-advance) rows to
    the in-memory table ``query_name`` whenever a user's stage
    advances.  State is 3 booleans per user."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    reader = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = (reader.parquet(input_path)
          .select("user_id", "event_type", "event_id",
                  F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("t")))

    state_schema = "s1 boolean, s2 boolean, s3 boolean"

    def walk(key, pdf_iter, state: GroupState):
        (user,) = key
        if state.hasTimedOut:  # never set; keep the branch total
            state.remove()
            return
        rows = sorted(
            (int(t), int(i), str(e))
            for pdf in pdf_iter
            for t, i, e in zip(pdf["t"], pdf["event_id"],
                               pdf["event_type"]))
        if not rows:
            return
        s1, s2, s3 = state.get if state.exists else (False, False, False)
        out = []
        for t, i, e in rows:
            # strict precedence: the flag consulted is the one BEFORE
            # this event (matches the window's 1 PRECEDING frame)
            adv = False
            if e == "purchase" and s2 and not s3:
                s3, adv = True, True
            elif e == "click" and s1 and not s2:
                s2, adv = True, True
            elif e == "view" and not s1:
                s1, adv = True, True
            if adv:
                out.append((user, int(s1), int(s2), int(s3), i))
        state.update((s1, s2, s3))
        if out:
            yield pd.DataFrame(out, columns=[
                "user_id", "s1", "s2", "s3", "event_id"])

    stages = (ev.groupBy("user_id")
              .applyInPandasWithState(walk, OUT_SCHEMA, state_schema,
                                      "append", GroupStateTimeout.NoTimeout))
    return (stages.writeStream.outputMode("append")
            .format("memory").queryName(query_name)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
