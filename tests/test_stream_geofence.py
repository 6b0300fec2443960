"""Streaming cross-batch geofence: a transition that straddles a
micro-batch boundary (last point of batch 1 inside, first point of
batch 2 outside) is only detectable via the state store; the full
transition set equals the batch operator on the union."""

import os
import time

import pandas as pd
import pytest

from zellige_spark.operators import geofence as GF
from zellige_spark.streaming import geofence as SG

# square fence, vertices off any test coordinate
POLY = [(-10.3, -10.7), (10.9, -10.7), (10.9, 10.1),
        (-10.3, 10.1), (-10.3, -10.7)]


def _pts(rows):
    return pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                       "lon", "lat"])


@pytest.fixture()
def point_batches(spark, tmp_path):
    """Two ordered micro-batches.  User 1 ends batch 1 INSIDE and
    starts batch 2 OUTSIDE (the cross-batch transition); user 2 stays
    outside throughout; user 3 appears only in batch 2."""
    src = str(tmp_path / "geo_stream_in")
    os.makedirs(src)
    t = pd.Timestamp("2024-05-01 10:00:00")
    m = pd.Timedelta(minutes=1)
    b1 = _pts([
        (1, t + 0 * m, 1, -50.0, 0.0),   # u1 outside
        (2, t + 1 * m, 1, 0.0, 0.0),     # u1 enter
        (3, t + 2 * m, 1, 5.0, 5.0),     # u1 still inside (no emit)
        (4, t + 0 * m, 2, 120.0, 40.0),  # u2 outside
        (5, t + 1 * m, 2, 130.0, 45.0),  # u2 outside (no emit)
    ])
    b2 = _pts([
        (6, t + 10 * m, 1, -50.0, 0.0),  # u1 exit — CROSS-BATCH
        (7, t + 11 * m, 1, 0.0, 0.0),    # u1 enter again
        (8, t + 10 * m, 2, 0.0, 0.0),    # u2 enter — cross-batch state
        (9, t + 10 * m, 3, 0.0, 0.0),    # u3 first point (no emit)
    ])
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # file source orders micro-batches by mtime
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
    return src


def test_streaming_geofence_cross_batch(spark, tmp_path, point_batches):
    q = SG.stream_geofence(spark, point_batches, str(tmp_path / "gck"),
                           POLY, query_name="geo_stream_t1",
                           max_files_per_trigger=1)
    q.awaitTermination(180)
    out = (spark.table("geo_stream_t1").toPandas()
           .sort_values(["user_id", "event_id"]).reset_index(drop=True))
    got = list(map(tuple, out[["user_id", "event_id", "kind"]]
                   .itertuples(index=False, name=None)))
    assert got == [
        (1, 2, "enter"), (1, 6, "exit"), (1, 7, "enter"),
        (2, 8, "enter"),
    ]
    # equality with the batch operator over the union of both batches
    batch = (GF.geofence_transitions(
        spark.read.parquet(point_batches), POLY)
        .orderBy("user_id", "event_id").toPandas())
    assert batch.reset_index(drop=True).equals(out[batch.columns])


def test_streaming_geofence_three_batches(spark, tmp_path, point_batches):
    """A THIRD micro-batch continues each user's walk from the stored
    (ts, id, inside) record: only genuine flips emit (the memory sink
    cannot recover a checkpoint across runs, so all three batches
    drain in one availableNow run)."""
    src = point_batches
    t = pd.Timestamp("2024-05-01 11:00:00")
    b3 = _pts([
        (20, t, 1, -60.0, 0.0),  # u1 was inside (evt 7) -> exit
        (21, t, 2, 0.5, 0.5),    # u2 was inside (evt 8) -> no emit
        (22, t, 3, -60.0, 0.0),  # u3 was inside (evt 9) -> exit
    ])
    time.sleep(1.1)
    spark.createDataFrame(b3).coalesce(1).write.mode("append").parquet(src)
    q = SG.stream_geofence(spark, src, str(tmp_path / "gck2"),
                           POLY, query_name="geo_stream_t3",
                           max_files_per_trigger=1)
    q.awaitTermination(180)
    out = spark.table("geo_stream_t3").toPandas()
    got = sorted(map(tuple, out[["user_id", "event_id", "kind"]]
                     .itertuples(index=False, name=None)))
    assert got == [(1, 2, "enter"), (1, 6, "exit"), (1, 7, "enter"),
                   (1, 20, "exit"), (2, 8, "enter"), (3, 22, "exit")]
    # and the batch operator on the union agrees row-for-row
    batch = (GF.geofence_transitions(spark.read.parquet(src), POLY)
             .orderBy("user_id", "event_id").toPandas())
    out = (out.sort_values(["user_id", "event_id"])
           .reset_index(drop=True))
    assert batch.reset_index(drop=True).equals(out[batch.columns])
