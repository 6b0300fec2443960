"""Watermark late-data semantics for the streaming windowed aggregate:
with per-file micro-batches and append mode, a window emits exactly
once after the watermark passes its end, and a row arriving LATER than
the watermark horizon is dropped — its already-finalized window keeps
the on-time counts only."""

import datetime as dt
import os
import time

import pandas as pd


def _write_batch(spark, src, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # file source orders micro-batches by mtime


def test_append_mode_drops_late_rows_and_emits_once(spark, tmp_path):
    from zellige_spark.streaming import events as EV

    src = str(tmp_path / "ev_in")
    os.makedirs(src)
    base = dt.datetime(2025, 1, 1, 10, 0, 0)

    def ev(i, hours, etype="view"):
        return (i, base + dt.timedelta(hours=hours), 1, etype, 1.0, "{}")

    # batch 1: three on-time events in the 10:00 and 11:00 windows
    _write_batch(spark, src, [ev(1, 0.1), ev(2, 0.2), ev(3, 1.5)])
    # batch 2: advance event time to 20:00 -> the watermark moves past
    # every batch-1 window
    _write_batch(spark, src, [ev(4, 10.0)])
    # batch 3: a LATE event at 05:00 — older than the watermark no
    # matter whether the engine applies batch 2's horizon (18:00) or
    # the one-batch-lagged batch-1 horizon (09:30) — plus one more
    # on-time event to keep the stream moving
    _write_batch(spark, src, [ev(5, -5.0), ev(6, 10.5)])

    q = EV.stream_event_windows(
        spark, src, str(tmp_path / "ckpt"), watermark="2 hours",
        output_mode="append", query_name="late_t1", max_files_per_trigger=1)
    q.awaitTermination(180)
    out = spark.table("late_t1").toPandas()

    epoch_10 = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    by_win = out.groupby("window_epoch")["n_events"].sum().to_dict()
    # exactly the finalized on-time windows, each emitted once; the
    # late event_id=5's 05:00 window never appears (row dropped), and
    # the still-open 20:00 window is not emitted
    assert by_win == {epoch_10: 2, epoch_10 + 3600: 1}, out
    assert not out.duplicated(["window_epoch", "event_type"]).any()
