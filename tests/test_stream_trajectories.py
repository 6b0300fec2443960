"""Streaming cross-batch trajectory stats: with maxFilesPerTrigger=1
each time-ordered file is its own micro-batch, so the leg that CROSSES
a batch boundary (last point of batch N to first point of batch N+1)
only exists via the state carry; the final cumulative row per user must
equal the oracle-checked batch operator bit-for-bit."""

import datetime as dt
import os
import time

import pandas as pd
import pytest

from zellige_spark.streaming import trajectories as ST


def _mk_batch(rows):
    return pd.DataFrame(rows, columns=["user_id", "event_id", "ts",
                                       "lon", "lat"])


@pytest.fixture()
def track_batches(spark, tmp_path):
    """Three time-ordered parquet files.  User 1 appears in all three
    (two boundary-crossing legs), user 2 in the first only, user 3
    joins late in batch 3; batch 2 arrives internally SHUFFLED to
    exercise the in-batch sort."""
    t0 = dt.datetime(2024, 1, 1)

    def s(sec):
        return t0 + dt.timedelta(seconds=sec)

    src = str(tmp_path / "traj_in")
    os.makedirs(src)
    b1 = _mk_batch([(1, 10, s(0), 0.0, 0.0), (1, 11, s(30), 1.0, 0.5),
                    (2, 20, s(10), 50.0, 10.0), (2, 21, s(40), 50.5, 10.5)])
    # shuffled within the batch; ts tie at s(90) broken by event_id
    b2 = _mk_batch([(1, 13, s(90), 3.0, 1.5), (1, 12, s(90), 2.0, 1.0)])
    b3 = _mk_batch([(1, 14, s(200), 4.0, 2.0),
                    (3, 30, s(150), -120.0, -45.0)])
    for b in (b1, b2, b3):
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # file-source orders micro-batches by mtime
    return src


def test_stream_track_stats_equals_batch_twin(spark, tmp_path,
                                              track_batches):
    q = ST.stream_track_stats(spark, track_batches,
                              str(tmp_path / "ckpt"),
                              query_name="traj_stream_t1",
                              max_files_per_trigger=1)
    q.awaitTermination(180)
    out = spark.table("traj_stream_t1").toPandas()

    # one changelog row per (user, batch containing that user)
    assert sorted(out.groupby("user_id").size().items()) == [(1, 3), (2, 1),
                                                             (3, 1)]
    # user 1's totals must strictly grow across its three batches
    u1 = out[out.user_id == 1].sort_values("batch_n")
    assert list(u1.n_points) == [2, 4, 5]
    assert u1.length_m.is_monotonic_increasing
    assert u1.length_m.iloc[1] > u1.length_m.iloc[0]  # boundary leg counted

    # final cumulative rows == the oracle-checked batch operator
    final = (out.sort_values("batch_n").groupby("user_id").last()
                .reset_index()[["user_id", "n_points", "length_m",
                                "max_leg_m", "net_m", "dur_s"]])
    twin = (ST.stream_track_stats_batch_twin(spark, track_batches)
              .toPandas()[["user_id", "n_points", "length_m",
                           "max_leg_m", "net_m", "dur_s"]])
    a = final.sort_values("user_id").reset_index(drop=True)
    b = twin.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_stream_track_stats_state_is_constant_size(spark, tmp_path):
    """Re-sending the same points many times must not grow emitted
    n_points beyond the true count and the per-user state stays one
    row: duplicates arrive as new events here (streams re-deliver), so
    the guard is simply that a 50x-resent single-point user reports
    50 points but zero length — state never accumulates per-row
    payloads (no lists in STATE_SCHEMA) and the fold is O(batch)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "traj_dup_in")
    os.makedirs(src)
    rows = [(9, i, t0 + dt.timedelta(seconds=i), 7.0, 7.0)
            for i in range(50)]
    spark.createDataFrame(_mk_batch(rows)).coalesce(1) \
         .write.mode("append").parquet(src)
    q = ST.stream_track_stats(spark, src, str(tmp_path / "ckpt2"),
                              query_name="traj_stream_t2",
                              max_files_per_trigger=1)
    q.awaitTermination(180)
    out = spark.table("traj_stream_t2").toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.n_points, r.length_m, r.max_leg_m, r.net_m) == (50, 0, 0, 0)
    assert "array" not in ST.STATE_SCHEMA and "binary" not in ST.STATE_SCHEMA


# --- streaming bottom-k sketch ------------------------------------------------


def test_stream_kmv_equals_batch_and_state_bounded(spark, tmp_path):
    """Three micro-batches of (id, lon, lat): the final streamed row
    per tile must equal the batch kmv_finalize(kmv_sketch(...))
    bit-for-bit INCLUDING the float estimate (bottom-k merge is
    order-independent), and re-sent duplicates must never grow the
    sketch past k."""
    import pandas as pd

    from zellige_spark.operators import sketch as SK
    from zellige_spark.operators import tiles as T
    from zellige_spark.streaming import kmv as SKMV

    src = str(tmp_path / "kmv_in")
    os.makedirs(src)
    # 3 batches over 2 tiles; batch 3 resends batch 1's ids (dups)
    def rows(ids, lon):
        return pd.DataFrame({"id": list(ids),
                             "lon": [lon] * len(ids),
                             "lat": [10.0] * len(ids)})

    b1 = pd.concat([rows(range(0, 60), 10.0), rows(range(200, 230), 120.0)])
    b2 = pd.concat([rows(range(60, 120), 10.0), rows(range(230, 260), 120.0)])
    b3 = rows(range(0, 60), 10.0)  # pure resend
    for b in (b1, b2, b3):
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    q = SKMV.stream_tile_kmv(spark, src, str(tmp_path / "ckpt_kmv"),
                             zoom=3, query_name="kmv_stream_t1",
                             max_files_per_trigger=1)
    q.awaitTermination(180)
    out = spark.table("kmv_stream_t1").toPandas()
    assert (out.n_sketch <= SK.KMV_K).all()

    final = (out.sort_values("n_updates").groupby(["tile_x", "tile_y"])
                .last().reset_index())
    batch = spark.read.parquet(src)
    t = T.assign_tiles(batch, [3]).select("id", "tile_x", "tile_y")
    twin = SK.kmv_finalize(SK.kmv_sketch(t, ["tile_x", "tile_y"], "id"),
                           ["tile_x", "tile_y"]).toPandas()
    cols = ["tile_x", "tile_y", "n_sketch", "kth_hash", "est_kmv"]
    a = final[cols].sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    b = twin[cols].sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # the resend batch must not have changed tile (10.0, 10.0)'s sketch
    t1 = out[(out.tile_x == a.tile_x.iloc[0]) & (out.tile_y == a.tile_y.iloc[0])]
    t1 = t1.sort_values("n_updates")
    if len(t1) >= 3:
        assert t1.iloc[-1].n_sketch == t1.iloc[-2].n_sketch
        assert t1.iloc[-1].kth_hash == t1.iloc[-2].kth_hash
