"""Streaming cross-batch IMAGE near-dup: phash band-bucket state
catches re-encoded images arriving in a LATER micro-batch; bucket hits
match the batch twin; duplicates never grow state."""

import os
import time

import pandas as pd
import pytest

from zellige_spark.streaming import imagedup as SI


def _phash(g):
    """Deterministic 61-bit group base (same mixing as the driver
    query's synthesis)."""
    return (g * 2654435761) % 2305843009213693951


@pytest.fixture()
def image_batches(spark, tmp_path):
    """File 1: 10 distinct images (groups 0..9, member 0 each).
    File 2: near-dup re-encodes of 5 of them (one bit flipped) under
    new ids, plus 3 fresh images."""
    src = str(tmp_path / "img_in")
    os.makedirs(src)
    b1 = pd.DataFrame({
        "image_id": list(range(10)),
        "phash": [_phash(g) for g in range(10)]})
    dups = {100 + g: _phash(g) ^ (1 << (g % 60)) for g in range(5)}
    fresh = {200 + i: _phash(1000 + i) for i in range(3)}
    b2 = pd.DataFrame({
        "image_id": list(dups) + list(fresh),
        "phash": list(dups.values()) + list(fresh.values())})
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
    return src


def _verdicts(hits: pd.DataFrame, all_ids) -> pd.DataFrame:
    flagged = hits[hits.flagged]
    agg = (flagged.groupby("image_id").rep_id.min()
           .rename("dup_of").reset_index())
    out = pd.DataFrame({"image_id": sorted(all_ids)})
    out = out.merge(agg, on="image_id", how="left")
    out["is_dup"] = (~out.dup_of.isna()).astype(int)
    out["dup_of"] = out.dup_of.fillna(-1).astype(int)
    return out


def test_streaming_imagedup_across_batches(spark, tmp_path, image_batches):
    q = SI.stream_image_dup(spark, image_batches, str(tmp_path / "ck"),
                            query_name="img_stream_t1",
                            max_files_per_trigger=1)
    q.awaitTermination(180)
    hits = spark.table("img_stream_t1").toPandas()
    ids = list(range(10)) + [100 + g for g in range(5)] + [200 + i
                                                          for i in range(3)]
    v = _verdicts(hits, ids).set_index("image_id")
    # batch-1 images are originals (first-seen => bucket reps)
    assert (v.loc[0:9].is_dup == 0).all()
    # the 5 re-encodes are CROSS-batch near-dups pointing at their
    # batch-1 originals — only band-bucket state can know
    for g in range(5):
        assert v.loc[100 + g, "is_dup"] == 1, g
        assert v.loc[100 + g, "dup_of"] == g
    # fresh images are not flagged
    assert (v.loc[200:203].is_dup == 0).all()


def test_streaming_imagedup_matches_batch_twin(spark, tmp_path,
                                               image_batches):
    """Stream bucket hits == batch twin hits row-for-row (in-order
    batches contract), and the combined per-image verdicts agree."""
    q = SI.stream_image_dup(spark, image_batches, str(tmp_path / "ck2"),
                            query_name="img_stream_t2",
                            max_files_per_trigger=1)
    q.awaitTermination(180)
    stream_hits = (spark.table("img_stream_t2").toPandas()
                   .sort_values(["image_id", "band"]).reset_index(drop=True))
    batch = spark.read.parquet(image_batches)
    twin_hits = (SI.image_dup_hits_batch(batch).toPandas()
                 .sort_values(["image_id", "band"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(stream_hits, twin_hits)


def test_streaming_imagedup_dups_never_grow_state(spark, tmp_path):
    """A third batch re-encoding a batch-2 DUPLICATE still points at
    the batch-1 ORIGINAL: duplicates were never admitted to state."""
    src = str(tmp_path / "img_in3")
    os.makedirs(src)
    b1 = pd.DataFrame({"image_id": [0], "phash": [_phash(7)]})
    b2 = pd.DataFrame({"image_id": [10], "phash": [_phash(7) ^ 1]})
    b3 = pd.DataFrame({"image_id": [20], "phash": [_phash(7) ^ 2]})
    for b in (b1, b2, b3):
        spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)
    q = SI.stream_image_dup(spark, src, str(tmp_path / "ck3"),
                            query_name="img_stream_t3",
                            max_files_per_trigger=1)
    q.awaitTermination(180)
    hits = spark.table("img_stream_t3").toPandas()
    v = _verdicts(hits, [0, 10, 20]).set_index("image_id")
    assert v.loc[0, "is_dup"] == 0
    assert (v.loc[10, "is_dup"], v.loc[10, "dup_of"]) == (1, 0)
    # image 20 is flagged against the ORIGINAL id 0, not the dup 10
    assert (v.loc[20, "is_dup"], v.loc[20, "dup_of"]) == (1, 0)
