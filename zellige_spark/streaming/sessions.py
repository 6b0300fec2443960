"""Custom stateful streaming operator: event sessionization.

* ``q_event_sessions`` — batch gap-and-island sessionization (30-minute
  inactivity gap) as pure window SQL, with an exact DuckDB oracle.
* ``stream_event_sessions`` — the same semantics as a custom stateful
  streaming operator via ``applyInPandasWithState`` (per-user session
  state, processing-time timeout flushes) — the north-rule "custom
  stateful operator" shape that windowed aggregation can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GAP_SECONDS = 1800


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions per user: a new session starts after a >30min gap.
    Output: (user_id, session_id 1..n per user, n_events, start/end epoch)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.createOrReplaceTempView("events_s")
    return spark.sql(f"""
        WITH o AS (
          SELECT user_id, event_id, unix_timestamp(ts) AS e,
                 LAG(unix_timestamp(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events_s
        ), m AS (
          SELECT user_id, event_id, e,
                 CASE WHEN prev IS NULL OR e - prev > {GAP_SECONDS}
                      THEN 1 ELSE 0 END AS new_s
          FROM o
        ), s AS (
          SELECT user_id, e,
                 SUM(new_s) OVER (PARTITION BY user_id
                                  ORDER BY e, event_id) AS session_id
          FROM m
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               MIN(e) AS start_epoch, MAX(e) AS end_epoch
        FROM s GROUP BY user_id, session_id
    """)


def sql_event_sessions() -> str:
    return f"""
    WITH o AS (
      SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS e,
             LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ), m AS (
      SELECT user_id, event_id, e,
             CASE WHEN prev IS NULL OR e - prev > {GAP_SECONDS}
                  THEN 1 ELSE 0 END AS new_s
      FROM o
    ), s AS (
      SELECT user_id, e,
             SUM(new_s) OVER (PARTITION BY user_id
                              ORDER BY e, event_id) AS session_id
      FROM m
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(e) AS start_epoch, MAX(e) AS end_epoch
    FROM s GROUP BY user_id, session_id
    """


def stream_event_sessions(spark: SparkSession, input_path: str, checkpoint: str):
    """applyInPandasWithState sessionizer: state = the open session per
    user (start, last_ts, count); closed sessions emit on gap or state
    timeout.  Returns the StreamingQuery writing closed sessions to the
    in-memory table ``event_sessions``."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = (spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string")
          .parquet(input_path)
          .select("user_id", "event_id", F.unix_timestamp("ts").alias("e")))

    out_schema = ("user_id long, session_id long, n_events long, "
                  "start_epoch long, end_epoch long")
    state_schema = ("next_sid long, start long, last long, n long")

    def sessionize(key, pdf_iter, state: GroupState):
        (user_id,) = key
        # state = (sid_of_open_session, start, last, n)
        if state.hasTimedOut:
            sid, start, last, n = state.get
            state.remove()
            yield pd.DataFrame([(user_id, sid, n, start, last)],
                               columns=["user_id", "session_id", "n_events",
                                        "start_epoch", "end_epoch"])
            return
        if state.exists:
            sid, start, last, n = state.get
        else:
            sid, start, last, n = 1, None, None, 0
        closed = []
        # drain ALL Arrow chunks before sorting: a user whose micro-batch
        # spans multiple chunks is not guaranteed chunk-ordered, so a
        # per-chunk sort would fabricate session boundaries
        events = sorted(e for pdf in pdf_iter for e in pdf["e"].tolist())
        for e in events:
            if start is None:
                start, last, n = e, e, 1
            elif e - last > GAP_SECONDS:
                closed.append((user_id, sid, n, start, last))
                sid += 1
                start, last, n = e, e, 1
            else:
                last = e
                n += 1
        if start is not None:
            state.update((sid, start, last, n))
            state.setTimeoutDuration(60_000)
        if closed:
            yield pd.DataFrame(closed, columns=["user_id", "session_id",
                                                "n_events", "start_epoch",
                                                "end_epoch"])

    sessions = (ev.groupBy("user_id")
                  .applyInPandasWithState(sessionize, out_schema, state_schema,
                                          "append",
                                          GroupStateTimeout.ProcessingTimeTimeout))
    return (sessions.writeStream.outputMode("append")
            .format("memory").queryName("event_sessions")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
