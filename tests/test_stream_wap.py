"""Audited streaming publish (write-audit-publish per micro-batch).

The stream over the synthetic corrupt corpus must reach the same
published state as the oracle-checked batch twin (queries.q_wap_publish
pins the quarantine + tile math against DuckDB; here the STREAM is
pinned byte-identical to the batch pipeline over the same rows), the
quarantine sink must capture exactly the payload-audit rejects, and the
abandon paths (on_fail=skip / raise) must keep poison batches out of
the published chain without losing them from the checkpoint."""

import os

import pytest
from pyspark.sql import functions as F

from zellige_spark.operators import encode as E
from zellige_spark.operators import tiles as T
from zellige_spark.operators.images import with_payload_audit
from zellige_spark.plans.lineage import TileStore
from zellige_spark.queries import _payload_corpus_spark
from zellige_spark.streaming.tiles import read_latest_tiles
from zellige_spark.streaming.wap import (read_publish_log, read_quarantine,
                                         stream_tile_refresh_audited)

SF = "/root/testdata/sf0.001"
ZOOM = 9


def _corpus(spark):
    spark.read.parquet(f"{SF}/customer.parquet") \
        .createOrReplaceTempView("customer")
    # BASELINE input shape: w/h int32, lon/lat double (the SQL corpus
    # derives BIGINT residues and DECIMAL coordinates)
    return (spark.sql(_payload_corpus_spark(coords=True))
            .withColumn("w", F.col("w").cast("int"))
            .withColumn("h", F.col("h").cast("int"))
            .withColumn("lon", F.col("lon").cast("double"))
            .withColumn("lat", F.col("lat").cast("double")))


def _write_batches(imgs, src, n=4):
    # one part file per residue class; maxFilesPerTrigger=1 makes each
    # file its own micro-batch
    for b in range(n):
        (imgs.filter(F.col("image_id") % n == b)
             .coalesce(1).write.mode("append").parquet(src))


def _clean_rows(imgs):
    return (with_payload_audit(imgs)
            .filter(F.col("quarantine") == 0)
            .select(F.col("image_id").cast("string").alias("image_id"),
                    "lon", "lat"))


def _tiles_pdf(df):
    return df.toPandas().sort_values(["tile_x", "tile_y"],
                                     ignore_index=True)


def test_wap_stream_publishes_clean_batches(spark, tmp_path):
    imgs = _corpus(spark)
    src = str(tmp_path / "src")
    _write_batches(imgs, src)
    work = str(tmp_path / "work")

    q, store = stream_tile_refresh_audited(spark, src, work, zoom=ZOOM)
    q.awaitTermination(300)

    log = read_publish_log(work)
    assert len(log) == 4
    assert all(e["published"] for e in log if e["rows_clean"] > 0)
    assert all(e["bad_tiles"] == 0 for e in log)
    # nothing left staged; the chain is exactly the published batches
    sids = store.snapshots()
    assert sids and all(not store.manifest(s).get("staged") for s in sids)
    assert len(sids) == sum(1 for e in log if e["published"])

    # quarantine sink == the payload-audit verdict set, all reason=payload
    quar = read_quarantine(spark, work)
    assert quar.filter(F.col("reason") != "payload").count() == 0
    got = {r.image_id for r in quar.select("image_id").collect()}
    want = {r.image_id for r in with_payload_audit(imgs)
            .filter(F.col("quarantine") == 1).select("image_id").collect()}
    assert got == want and want  # corruption classes actually fired
    assert sum(e["rows_quarantined"] for e in log) == len(want)

    # final published view byte-identical to the batch pipeline over
    # exactly the clean rows (same rows the DuckDB-pinned twin keeps)
    clean = _clean_rows(imgs)
    assert sum(e["rows_clean"] for e in log) == clean.count()
    expected = _tiles_pdf(E.assemble_point_tiles_streaming(
        T.assign_tiles_buffered(clean, zoom=ZOOM)))
    latest = _tiles_pdf(read_latest_tiles(spark, store)
                        .select("zoom", "tile_x", "tile_y", "mvt",
                                "feature_count", "bytes_len"))
    assert len(latest) == len(expected)
    assert (latest["feature_count"].to_numpy()
            == expected["feature_count"].to_numpy()).all()
    assert (latest["mvt"] == expected["mvt"]).all()


def test_wap_abandon_skip_quarantines_batch(spark, tmp_path):
    imgs = _corpus(spark)
    src = str(tmp_path / "src")
    _write_batches(imgs, src)
    work = str(tmp_path / "work")

    # injected audit: first staged snapshot passes, every later one
    # fails — deterministic regardless of file/batch order
    probe = TileStore(os.path.join(work, "store"))
    audit = lambda df: 0 if probe.current_snapshot() is None else 1  # noqa: E731

    q, store = stream_tile_refresh_audited(spark, src, work, zoom=ZOOM,
                                           audit_fn=audit, on_fail="skip")
    q.awaitTermination(300)

    log = read_publish_log(work)
    assert len(log) == 4
    assert sum(1 for e in log if e["published"]) == 1
    # exactly one published snapshot, no staged leftovers (abandoned)
    sids = store.snapshots()
    assert len(sids) == 1
    assert not store.manifest(sids[0]).get("staged")
    assert store.current_snapshot() == sids[0]
    # abandoned batches' staging rows were removed: staging holds only
    # the published batch
    staged_ids = {r.image_id for r in spark.read.parquet(
        os.path.join(work, "staging")).select("image_id").collect()}
    pub = [e for e in log if e["published"]][0]
    assert len(staged_ids) == pub["rows_clean"]

    # every clean row is accounted for: published batch + audit sink
    quar = read_quarantine(spark, work)
    audit_ids = {str(r.image_id) for r in
                 quar.filter(F.col("reason") == "audit")
                 .select("image_id").collect()}
    clean_ids = {r.image_id for r in _clean_rows(imgs)
                 .select("image_id").collect()}
    assert staged_ids | audit_ids == clean_ids
    assert not staged_ids & audit_ids

    # the published view covers exactly the surviving batch's rows
    surv = _clean_rows(imgs).filter(F.col("image_id").isin(list(staged_ids)))
    expected = _tiles_pdf(E.assemble_point_tiles_streaming(
        T.assign_tiles_buffered(surv, zoom=ZOOM)))
    latest = _tiles_pdf(read_latest_tiles(spark, store)
                        .select("zoom", "tile_x", "tile_y", "mvt",
                                "feature_count", "bytes_len"))
    assert (latest["mvt"] == expected["mvt"]).all()


def test_wap_abandon_raise_replays_after_restart(spark, tmp_path):
    imgs = _corpus(spark)
    src = str(tmp_path / "src")
    _write_batches(imgs, src)
    work = str(tmp_path / "work")

    # every audit fails -> batch 0 abandons its snapshot and the raise
    # keeps the checkpoint from advancing
    q, store = stream_tile_refresh_audited(
        spark, src, work, zoom=ZOOM, audit_fn=lambda df: 1, on_fail="raise")
    with pytest.raises(Exception):
        q.awaitTermination(300)

    assert store.current_snapshot() is None
    assert store.snapshots() == []  # staged snapshot was abandoned
    log = read_publish_log(work)
    assert log and not log[-1]["published"] and log[-1]["bad_tiles"] == 1
    # its staging rows were removed — nothing can leak into later folds
    assert not os.path.exists(os.path.join(work, "staging")) or not [
        d for d in os.listdir(os.path.join(work, "staging"))
        if d.startswith("batch=")]

    # restart with a passing audit: the checkpoint REPLAYS the failed
    # batch (exactly-once publish), then drains the rest
    q2, store2 = stream_tile_refresh_audited(spark, src, work, zoom=ZOOM)
    q2.awaitTermination(300)
    clean = _clean_rows(imgs)
    expected = _tiles_pdf(E.assemble_point_tiles_streaming(
        T.assign_tiles_buffered(clean, zoom=ZOOM)))
    latest = _tiles_pdf(read_latest_tiles(spark, store2)
                        .select("zoom", "tile_x", "tile_y", "mvt",
                                "feature_count", "bytes_len"))
    assert len(latest) == len(expected)
    assert (latest["mvt"] == expected["mvt"]).all()
