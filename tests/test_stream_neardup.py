"""Streaming cross-batch NEAR-dup: band-bucket state catches truncated
re-submissions arriving in a LATER micro-batch; bucket hits match the
batch twin; the driver verdicts hash-match the DuckDB oracle."""

import os
import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from zellige_spark.streaming import neardup as SN

WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india "
         "juliet kilo lima mike november oscar papa quebec romeo "
         "sierra tango uniform victor whiskey xray yankee zulu").split()


def _doc(i, n=30):
    rng = np.random.default_rng([17, i])
    return " ".join(WORDS[j] for j in rng.integers(0, len(WORDS), n))


@pytest.fixture()
def near_batches(spark, tmp_path):
    """File 1: 12 distinct docs.  File 2: truncated (~80%) re-crawls of
    6 of them under new ids, plus 4 fresh docs."""
    src = str(tmp_path / "nd_in")
    os.makedirs(src)
    docs = {i: _doc(i) for i in range(12)}
    b1 = pd.DataFrame({
        "doc_id": list(range(12)),
        "text": [docs[i] for i in range(12)],
        "lang": "en", "source": "crawl1", "n_chars": 100})
    trunc = {100 + i: " ".join(docs[i].split()[:24]) for i in range(6)}
    fresh = {200 + i: _doc(1000 + i) for i in range(4)}
    b2 = pd.DataFrame({
        "doc_id": list(trunc) + list(fresh),
        "text": list(trunc.values()) + list(fresh.values()),
        "lang": "en", "source": "crawl2", "n_chars": 100})
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
    return src


def _verdicts(hits: pd.DataFrame, all_ids) -> pd.DataFrame:
    """Per-doc aggregation of bucket hits — the same rule as
    near_dup_verdicts_batch."""
    flagged = hits[hits.flagged]
    agg = (flagged.groupby("doc_id").rep_id.min()
           .rename("dup_of").reset_index())
    out = pd.DataFrame({"doc_id": sorted(all_ids)})
    out = out.merge(agg, on="doc_id", how="left")
    out["is_dup"] = (~out.dup_of.isna()).astype(int)
    out["dup_of"] = out.dup_of.fillna(-1).astype(int)
    return out


def test_streaming_neardup_across_batches(spark, tmp_path, near_batches):
    q = SN.stream_near_dup(spark, near_batches, str(tmp_path / "ck"),
                           query_name="nd_stream_t1",
                           max_files_per_trigger=1)
    q.awaitTermination(180)
    hits = spark.table("nd_stream_t1").toPandas()
    ids = list(range(12)) + [100 + i for i in range(6)] + [200 + i for i in range(4)]
    v = _verdicts(hits, ids).set_index("doc_id")
    # batch-1 docs are all originals (first-seen => reps, not dups)
    assert (v.loc[0:11].is_dup == 0).all()
    # the 6 truncated re-crawls are CROSS-batch near-dups pointing at
    # their batch-1 originals — only band-bucket state can know
    for i in range(6):
        assert v.loc[100 + i, "is_dup"] == 1, i
        assert v.loc[100 + i, "dup_of"] == i
    # fresh docs are not flagged
    assert (v.loc[200:204].is_dup == 0).all()


def test_streaming_neardup_matches_batch_twin(spark, tmp_path, near_batches):
    q = SN.stream_near_dup(spark, near_batches, str(tmp_path / "ck2"),
                           query_name="nd_stream_t2",
                           max_files_per_trigger=1)
    q.awaitTermination(180)
    hits = spark.table("nd_stream_t2").toPandas()
    union = spark.read.parquet(near_batches)
    twin = SN.near_dup_verdicts_batch(union).toPandas()
    ids = twin.doc_id.tolist()
    sv = _verdicts(hits, ids).sort_values("doc_id", ignore_index=True)
    tv = twin.sort_values("doc_id", ignore_index=True)
    assert np.array_equal(sv.doc_id.to_numpy(), tv.doc_id.to_numpy())
    assert np.array_equal(sv.is_dup.to_numpy(), tv.is_dup.to_numpy())
    assert np.array_equal(sv.dup_of.to_numpy(), tv.dup_of.to_numpy())


def test_neardup_driver_query_matches_duckdb(spark):
    import duckdb

    sf = "/root/testdata/sf0.001"
    sp = SN.q_near_dup_verdicts(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    du = con.execute(SN.sql_near_dup_verdicts()).fetchdf()
    assert len(sp) == len(du) > 0
    for c in ["doc_id", "is_dup", "dup_of"]:
        assert np.array_equal(sp[c].to_numpy().astype(np.int64),
                              du[c].to_numpy().astype(np.int64)), c
    # the injected truncations are actually caught
    flagged = sp[sp.doc_id >= 3000000]
    assert flagged.is_dup.mean() > 0.9
    # originals are mostly clean (the bounded-vocab synthetic corpus
    # holds a few GENUINE near-dup pairs; those must point DOWN-id)
    orig = sp[sp.doc_id < 3000000]
    assert orig.is_dup.mean() < 0.05
    hit = orig[orig.is_dup == 1]
    assert (hit.dup_of < hit.doc_id).all()


def test_neardup_state_excludes_duplicates(spark, tmp_path, near_batches):
    """Duplicates must not grow state: a third batch re-truncating the
    same originals still points at the ORIGINAL ids, not at batch-2
    duplicates."""
    src = near_batches
    docs = {i: _doc(i) for i in range(6)}
    b3 = pd.DataFrame({
        "doc_id": [300 + i for i in range(6)],
        "text": [" ".join(docs[i].split()[:25]) for i in range(6)],
        "lang": "en", "source": "crawl3", "n_chars": 100})
    time.sleep(1.1)
    spark.createDataFrame(b3).coalesce(1).write.mode("append").parquet(src)
    q = SN.stream_near_dup(spark, src, str(tmp_path / "ck3"),
                           query_name="nd_stream_t3",
                           max_files_per_trigger=1)
    q.awaitTermination(240)
    hits = spark.table("nd_stream_t3").toPandas()
    ids = (list(range(12)) + [100 + i for i in range(6)]
           + [200 + i for i in range(4)] + [300 + i for i in range(6)])
    v = _verdicts(hits, ids).set_index("doc_id")
    for i in range(6):
        assert v.loc[300 + i, "is_dup"] == 1
        assert v.loc[300 + i, "dup_of"] == i  # the original, not 100+i
