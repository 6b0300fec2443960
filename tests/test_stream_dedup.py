"""Streaming cross-batch exact dedup: with maxFilesPerTrigger=1 each
input file is its own micro-batch, so duplicates re-submitted in a
LATER micro-batch must be caught via the state store (the case
stateless per-batch dropDuplicates misses); verdicts match the batch
twin and keepers emit exactly once."""

import os
import time

import pandas as pd
import pytest

from zellige_spark.streaming import dedup as SD


@pytest.fixture()
def doc_batches(spark, tmp_path):
    """Two parquet files (distinct mtimes => processed as two ordered
    micro-batches): file 2 re-submits half of file 1's contents under
    new doc_ids (re-crawl shape) plus fresh docs."""
    src = str(tmp_path / "stream_in")
    os.makedirs(src)
    b1 = pd.DataFrame({
        "doc_id": range(0, 20),
        "text": [f"doc body {i % 10} lorem" for i in range(20)],  # 10 distinct
        "lang": "en", "source": "crawl1", "n_chars": 20})
    b2 = pd.DataFrame({
        "doc_id": range(100, 115),
        "text": [f"doc body {i % 5} lorem" for i in range(10)]     # dups of b1
              + [f"fresh body {i}" for i in range(5)],             # new
        "lang": "en", "source": "crawl2", "n_chars": 20})
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # file-source orders micro-batches by mtime
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
    return src


def _drain(spark, src, checkpoint, name):
    q = SD.stream_dedup_exact(spark, src, checkpoint, query_name=name,
                              max_files_per_trigger=1)
    q.awaitTermination(180)
    return spark.table(name).toPandas()


def test_streaming_dedup_across_batches(spark, tmp_path, doc_batches):
    out = _drain(spark, doc_batches, str(tmp_path / "ckpt"), "dedup_stream_t1")
    out1 = out[out.doc_id < 100]
    out2 = out[out.doc_id >= 100]
    # micro-batch 1: 10 distinct contents -> 10 keepers + 10 duplicates
    assert len(out1) == 20
    assert out1.is_keeper.sum() == 10
    assert (out1[out1.is_keeper].doc_id < 10).all()  # lowest ids win
    # micro-batch 2: its 10 re-crawled docs are CROSS-batch duplicates
    # (only state can know), 5 fresh docs become keepers
    assert len(out2) == 15
    assert out2.is_keeper.sum() == 5
    dups = out2[~out2.is_keeper]
    assert len(dups) == 10
    assert (dups.keep_doc_id < 20).all()  # point back to batch-1 keepers

    # full verdict set == order-independent batch twin
    got = out.sort_values("doc_id").reset_index(drop=True)
    want = (SD.stream_dedup_batch_twin(spark, doc_batches).toPandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert got[want.columns].equals(want)


def test_streaming_dedup_keeper_emitted_once(spark, tmp_path, doc_batches):
    out = _drain(spark, doc_batches, str(tmp_path / "ckpt2"), "dedup_stream_t2")
    per_fp = out[out.is_keeper].groupby("fingerprint").size()
    assert (per_fp == 1).all()
    # every doc got exactly one verdict
    assert sorted(out.doc_id) == list(range(20)) + list(range(100, 115))
