"""Streaming cross-batch distinct sketch: with maxFilesPerTrigger=1
each file is a micro-batch; register state max-merges across batches,
and the FINAL streamed state must equal the batch sketch over the
union of all inputs — bit-for-bit, including the float estimate
(max-merge is order-independent and the Python finalize uses the same
literal doubles as the Column finalize)."""

import os
import time

import pandas as pd

from pyspark.sql import functions as F

from zellige_spark.operators import sketch as SK
from zellige_spark.operators import tiles as T
from zellige_spark.streaming import sketch as SS


def _batches(spark, tmp_path):
    src = str(tmp_path / "sk_in")
    os.makedirs(src)
    # two batches over the same few tiles; batch 2 re-sends half of
    # batch 1's ids (no effect on distinct) plus fresh ones
    b1 = pd.DataFrame({
        "id": range(0, 400),
        "lon": [(i % 20) * 3.0 - 30.0 for i in range(400)],
        "lat": [(i % 10) * 4.0 - 20.0 for i in range(400)]})
    b2 = pd.DataFrame({
        "id": list(range(0, 200)) + list(range(400, 600)),
        "lon": [(i % 20) * 3.0 - 30.0 for i in list(range(0, 200)) + list(range(400, 600))],
        "lat": [(i % 10) * 4.0 - 20.0 for i in list(range(0, 200)) + list(range(400, 600))]})
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
    return src


def test_stream_sketch_final_state_equals_batch(spark, tmp_path):
    src = _batches(spark, tmp_path)
    q = SS.stream_tile_sketch(spark, src, str(tmp_path / "ckpt"),
                              zoom=9, query_name="sketch_t1",
                              max_files_per_trigger=1)
    q.awaitTermination(180)
    out = spark.table("sketch_t1").toPandas()
    assert out.n_updates.max() == 2  # cross-batch state was exercised
    # latest changelog row per tile
    last = (out.sort_values("n_updates").groupby(["tile_x", "tile_y"])
               .tail(1).reset_index(drop=True))

    batch = spark.read.parquet(src)
    a = T.assign_tiles(batch, [9]).select("id", "tile_x", "tile_y")
    fin = SK.hll_finalize(SK.hll_registers(a, ["tile_x", "tile_y"], "id"),
                          ["tile_x", "tile_y"]).toPandas()
    want = {(r.tile_x, r.tile_y): (r.hll_sum, r.est_hll)
            for r in fin.itertuples()}
    got = {(r.tile_x, r.tile_y): (r.hll_sum, r.est_hll)
           for r in last.itertuples()}
    assert got == want  # exact, floats included


def test_stream_sketch_duplicate_resend_never_grows_state(spark, tmp_path):
    """Re-sending already-seen ids must not change any register: a
    batch-2 row set identical to batch 1 emits the SAME sums."""
    src = str(tmp_path / "sk_dup")
    os.makedirs(src)
    b = pd.DataFrame({"id": range(100),
                      "lon": [(i % 8) * 5.0 for i in range(100)],
                      "lat": [(i % 4) * 5.0 for i in range(100)]})
    spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b).coalesce(1).write.mode("append").parquet(src)
    q = SS.stream_tile_sketch(spark, src, str(tmp_path / "ckpt2"),
                              zoom=9, query_name="sketch_t2",
                              max_files_per_trigger=1)
    q.awaitTermination(180)
    out = spark.table("sketch_t2").toPandas()
    for (_, _), g in out.groupby(["tile_x", "tile_y"]):
        assert g.hll_sum.nunique() == 1
        assert g.est_hll.nunique() == 1


def test_stream_cms_final_state_equals_batch(spark, tmp_path):
    """Cross-batch count-min sketch: counters are additive, so the
    FINAL streamed probe estimates equal the batch operator over the
    union of all micro-batches exactly — including probes never seen
    (est from colliding counters) and the never-underestimate
    guarantee."""
    from zellige_spark.streaming import cms as SC

    src = _batches(spark, tmp_path)
    probes = [0, 1, 2, 450, 999999]
    q = SC.stream_tile_cms(spark, src, str(tmp_path / "cms_ckpt"),
                           probes, zoom=9, query_name="cms_t1",
                           max_files_per_trigger=1)
    q.awaitTermination(180)
    out = spark.table("cms_t1").toPandas()
    assert out.n_updates.max() == 2  # cross-batch state exercised
    last = (out.sort_values("n_updates")
            .groupby(["tile_x", "tile_y", "probe"])
            .tail(1).reset_index(drop=True))

    batch = spark.read.parquet(src)
    a = T.assign_tiles(batch, [9]).select("id", "tile_x", "tile_y")
    counters = SK.cms_counters(a, ["tile_x", "tile_y"], "id")
    est = SK.cms_estimate(counters, ["tile_x", "tile_y"], probes)
    want = {(r.tile_x, r.tile_y, r.probe): r.est
            for r in est.collect()}
    got = {(r.tile_x, r.tile_y, r.probe): r.est
           for r in last.itertuples()}
    assert got == want  # bit-for-bit, batch == streamed
    # never-underestimate vs the exact truth, and a duplicated id
    # (0 appears in both micro-batches) counts TWICE (frequency, not
    # distinct)
    tru = {(r.tile_x, r.tile_y, r.id): r.cnt
           for r in a.filter(F.col("id").isin(probes))
           .groupBy("tile_x", "tile_y", "id")
           .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert any(v == 2 for v in tru.values())
    for (txv, tyv, p), t in tru.items():
        assert got[(txv, tyv, p)] >= t


def test_stream_bloom_final_state_equals_batch(spark, tmp_path):
    """Cross-batch Bloom filter: words are an OR monoid, so the FINAL
    streamed membership verdicts equal the batch operator over the
    union of all micro-batches exactly — and re-sent ids (batch 2
    replays half of batch 1) can never flip a bit back."""
    from zellige_spark.streaming import bloom as SB

    src = _batches(spark, tmp_path)
    probes = [0, 1, 2, 450, 999999]  # 999999 absent everywhere
    q = SB.stream_tile_bloom(spark, src, str(tmp_path / "bloom_ckpt"),
                             probes, zoom=9, query_name="bloom_t1",
                             max_files_per_trigger=1)
    q.awaitTermination(180)
    out = spark.table("bloom_t1").toPandas()
    assert out.n_updates.max() == 2  # cross-batch state exercised
    last = (out.sort_values("n_updates")
            .groupby(["tile_x", "tile_y", "probe"])
            .tail(1).reset_index(drop=True))

    batch = spark.read.parquet(src)
    a = T.assign_tiles(batch, [9]).select("id", "tile_x", "tile_y")
    words = SK.bloom_words(a, ["tile_x", "tile_y"], "id")
    mem = SK.bloom_member(words, ["tile_x", "tile_y"], probes)
    want = {(r.tile_x, r.tile_y, r.probe): r.member
            for r in mem.collect()}
    got = {(r.tile_x, r.tile_y, r.probe): r.member
           for r in last.itertuples()}
    assert got == want  # bit-for-bit, batch == streamed
    # no false negatives vs the exact truth
    tru = {(r.tile_x, r.tile_y, r.id)
           for r in a.filter(F.col("id").isin(probes)).distinct().collect()}
    assert len(tru) > 0
    for (txv, tyv, p) in tru:
        assert got[(txv, tyv, p)] == 1
