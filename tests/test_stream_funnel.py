"""Streaming cross-batch funnel: stage flags persist across
micro-batches (view in batch 1, click in batch 2, purchase in batch 3
completes the funnel); out-of-order stages never advance; the final
streamed stage equals the batch recompute."""

import datetime
import os
import time

import pandas as pd
import pytest

from zellige_spark.streaming import funnel as SFN

T0 = datetime.datetime(2024, 1, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + datetime.timedelta(seconds=s), u, e, 0.0, "{}")
         for i, s, u, e in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")


@pytest.fixture()
def funnel_batches(spark, tmp_path):
    """Batch 1: views for users 1-3 + a premature click for user 4.
    Batch 2: clicks for users 1,2 + view for user 4.
    Batch 3: purchase for user 1 (complete), purchase for user 3
    (skipped stage 2 -> must NOT advance), click for user 4."""
    src = str(tmp_path / "fn_in")
    os.makedirs(src)
    batches = [
        [(1, 0, 1, "view"), (2, 1, 2, "view"), (3, 2, 3, "view"),
         (4, 3, 4, "click")],
        [(5, 10, 1, "click"), (6, 11, 2, "click"), (7, 12, 4, "view")],
        [(8, 20, 1, "purchase"), (9, 21, 3, "purchase"),
         (10, 22, 4, "click")],
    ]
    for rows in batches:
        _df(spark, rows).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)
    return src


def test_streaming_funnel_across_batches(spark, tmp_path, funnel_batches):
    q = SFN.stream_funnel(spark, funnel_batches, str(tmp_path / "ck"),
                          query_name="fn_stream_t1",
                          max_files_per_trigger=1)
    q.awaitTermination(180)
    rows = spark.table("fn_stream_t1").toPandas()
    # latest advance per user = current stage
    final = (rows.sort_values("event_id").groupby("user_id").last())
    # user 1 walked all three stages across three batches
    assert tuple(final.loc[1][["s1", "s2", "s3"]]) == (1, 1, 1)
    # user 2 reached stage 2
    assert tuple(final.loc[2][["s1", "s2", "s3"]]) == (1, 1, 0)
    # user 3's purchase without a qualified click did NOT advance
    assert tuple(final.loc[3][["s1", "s2", "s3"]]) == (1, 0, 0)
    # user 4: premature click ignored; later view then click qualified
    assert tuple(final.loc[4][["s1", "s2", "s3"]]) == (1, 1, 0)
    # advance rows are monotone per user (no stage ever retracts)
    for u, gr in rows.sort_values("event_id").groupby("user_id"):
        stages = (gr.s1 + gr.s2 + gr.s3).tolist()
        assert stages == sorted(stages), (u, stages)


def test_streaming_funnel_matches_batch_recompute(spark, tmp_path,
                                                  funnel_batches):
    """Final streamed stage flags equal an in-order batch recompute of
    the same strict-precedence walk over all events."""
    q = SFN.stream_funnel(spark, funnel_batches, str(tmp_path / "ck2"),
                          query_name="fn_stream_t2",
                          max_files_per_trigger=1)
    q.awaitTermination(180)
    rows = spark.table("fn_stream_t2").toPandas()
    final = (rows.sort_values("event_id").groupby("user_id").last()
             [["s1", "s2", "s3"]])

    ev = (spark.read.parquet(funnel_batches).toPandas()
          .sort_values(["user_id", "ts", "event_id"]))
    expect = {}
    for u, gr in ev.groupby("user_id"):
        s1 = s2 = s3 = False
        for e in gr.event_type:
            if e == "purchase" and s2:
                s3 = True
            elif e == "click" and s1:
                s2 = True
            elif e == "view":
                s1 = True
        expect[u] = (int(s1), int(s2), int(s3))
    for u, flags in expect.items():
        if flags == (0, 0, 0):
            assert u not in final.index
        else:
            assert tuple(final.loc[u]) == flags, u
