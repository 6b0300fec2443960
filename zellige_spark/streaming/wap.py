"""Audited streaming publish: write-audit-publish per micro-batch.

``stream_tile_refresh_audited`` extends ``streaming.tiles.stream_tile_
refresh`` with the full curation + governance loop a production ingest
runs on every micro-batch:

1. QUARANTINE — the payload audit (``operators.images.with_payload_
   audit``) runs map-only on the batch; corrupt rows (bad magic /
   length / dims / caption) divert to a quarantine parquet sink keyed
   by batch_id (overwrite => replay-idempotent) and never reach
   staging.
2. WRITE — clean rows stage (image_id, lon, lat ONLY: payload bytes
   never copy into staging) and the touched tiles re-encode from the
   staged history, committing as a ``staged=True`` TileStore snapshot:
   fully written and manifest-committed, but invisible to readers.
3. AUDIT — the staged snapshot is read BACK FROM THE STORE (so the
   audit sees what actually landed on disk, not the in-flight frame)
   and every tile must survive the kernel decoder round-trip
   (``encode.with_tile_integrity``: decode_ok == 1 on all rows).
4. PUBLISH / ABANDON — clean => ``store.publish(sid)`` advances the
   table head atomically; dirty => ``store.abandon(sid)`` plus either
   * ``on_fail="raise"``: the foreachBatch error fails the batch, the
     streaming checkpoint does NOT advance, and a restart replays it —
     transient corruption self-heals, deterministic corruption poisons
     the stream loudly instead of publishing garbage; or
   * ``on_fail="skip"``: the batch's staging rows are removed, its
     clean rows land in the quarantine sink under ``reason=audit``,
     and the stream continues — nothing from the failed batch can leak
     into later refreshes.

Every decision appends one JSON line to ``work_dir/publish_log.jsonl``
(batch_id, snapshot id, published flag, row/tile counts) — the
operator's own metrics surface.

This is the streaming face of Iceberg's public write-audit-publish
pattern (``spark.wap.id`` audit branches); the zellige reference has
no streaming or snapshot story (single-shot GeoJSON -> MVT,
app/Main.hs), so the semantics here follow Iceberg's published design
on top of the same TileStore used by ``plans.lineage``.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import encode as E
from ..operators import tiles as T
from ..operators.images import with_payload_audit
from ..plans.lineage import TileStore
from .tiles import TOUCHED_COLLECT_CAP

#: the BASELINE input-table shape (image_id, bytes, w, h, fmt, caption)
#: plus the geotag the tiling pipeline keys on
SRC_SCHEMA = ("image_id long, bytes binary, w int, h int, fmt string, "
              "caption string, lon double, lat double")

_PAYLOAD_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption",
                 "lon", "lat"]
_FLAG_COLS = ["magic_ok", "len_ok", "dims_ok", "caption_ok"]


def default_tile_audit(layer_name: str = "images", extent: int = 4096):
    """The standard audit: number of staged tiles whose protobuf bytes
    fail the strict kernel decoder round-trip (0 == publishable)."""
    def audit(staged_tiles: DataFrame) -> int:
        t = staged_tiles.select("zoom", "tile_x", "tile_y", "mvt",
                                "feature_count", "bytes_len")
        return (E.with_tile_integrity(t, layer_name=layer_name,
                                      extent=extent)
                .filter(F.col("decode_ok") == 0).count())
    return audit


def stream_tile_refresh_audited(spark: SparkSession, input_path: str,
                                work_dir: str, zoom: int = 6,
                                extent: int = 4096, buffer: int = 128,
                                layer_name: str = "images",
                                touched_cap: int = TOUCHED_COLLECT_CAP,
                                audit_fn=None, on_fail: str = "raise",
                                max_files_per_trigger: int = 1):
    """Start the audited refresh stream.  Returns (query, store).

    ``audit_fn(staged_tiles) -> int`` returns the number of audit
    failures (0 publishes); defaults to the decoder round-trip audit.
    ``on_fail`` is "raise" (fail the batch so the checkpoint replays
    it) or "skip" (quarantine the batch and continue).
    """
    if on_fail not in ("raise", "skip"):
        raise ValueError(f"on_fail must be 'raise' or 'skip', got {on_fail!r}")
    store = TileStore(os.path.join(work_dir, "store"))
    staging = os.path.join(work_dir, "staging")
    quarantine = os.path.join(work_dir, "quarantine")
    log_path = os.path.join(work_dir, "publish_log.jsonl")
    ckpt = os.path.join(work_dir, "ckpt")
    audit = audit_fn or default_tile_audit(layer_name, extent)

    def log(entry: dict) -> None:
        with open(log_path, "a") as f:
            f.write(json.dumps(entry) + "\n")

    def wap_batch(batch_df: DataFrame, batch_id: int) -> None:
        audited = with_payload_audit(batch_df).cache()
        # 1. quarantine the corrupt payloads (idempotent: keyed overwrite)
        (audited.filter(F.col("quarantine") == 1)
                .select(*_PAYLOAD_COLS, *_FLAG_COLS)
                .write.mode("overwrite")
                .parquet(os.path.join(quarantine, "reason=payload",
                                      f"batch={batch_id}")))
        n_bad, n_clean = audited.agg(
            F.sum("quarantine"), F.sum(1 - F.col("quarantine"))).first()
        n_bad, n_clean = int(n_bad or 0), int(n_clean or 0)
        entry = {"batch_id": int(batch_id), "rows_quarantined": n_bad,
                 "rows_clean": n_clean, "snapshot_id": None,
                 "published": False, "tiles": 0, "bad_tiles": 0}
        # the MVT encoder carries image_id as a string property value
        clean = audited.filter(F.col("quarantine") == 0) \
                       .select(F.col("image_id").cast("string")
                               .alias("image_id"), "lon", "lat")
        if n_clean == 0:
            log(entry)
            audited.unpersist()
            return

        # 2. write: stage the clean rows, re-encode the touched tiles
        #    from the full staged history, commit STAGED (invisible)
        batch_dir = os.path.join(staging, f"batch={batch_id}")
        clean.write.mode("overwrite").parquet(batch_dir)
        assigned = T.assign_tiles_buffered(clean, zoom=zoom, extent=extent,
                                           buffer=buffer)
        touched_df = assigned.select("tile_key").distinct()
        n_touched = touched_df.count()
        hist = spark.read.parquet(staging).select("image_id", "lon", "lat")
        hist = T.assign_tiles_buffered(hist, zoom=zoom, extent=extent,
                                       buffer=buffer)
        if n_touched <= touched_cap:
            touched = [r["tile_key"] for r in touched_df.collect()]
            hist = hist.filter(F.col("tile_key").isin(touched))
        else:  # wide batches: never collect an unbounded key list
            hist = hist.join(F.broadcast(touched_df), "tile_key", "left_semi")
        tiles = E.assemble_point_tiles_streaming(
            hist, layer_name=layer_name, extent=extent, buffer=buffer)
        sid = store.commit_tiles(tiles, f"stream batch {batch_id} (staged)",
                                 rows_in=n_clean, staged=True)
        entry["snapshot_id"] = sid
        entry["tiles"] = n_touched

        # 3. audit what landed on disk, 4. publish or abandon
        bad_tiles = int(audit(store.read_tiles(spark, sid)))
        entry["bad_tiles"] = bad_tiles
        if bad_tiles == 0:
            store.publish(sid)
            entry["published"] = True
            log(entry)
            audited.unpersist()
            return
        store.abandon(sid)
        # poison data must never fold into later refreshes
        shutil.rmtree(batch_dir, ignore_errors=True)
        if on_fail == "skip":
            (audited.filter(F.col("quarantine") == 0)
                    .select(*_PAYLOAD_COLS, *_FLAG_COLS)
                    .write.mode("overwrite")
                    .parquet(os.path.join(quarantine, "reason=audit",
                                          f"batch={batch_id}")))
        log(entry)
        audited.unpersist()
        if on_fail == "raise":
            raise RuntimeError(
                f"stream batch {batch_id}: {bad_tiles} tiles failed the "
                f"audit; staged snapshot {sid} abandoned (checkpoint will "
                f"replay the batch)")

    src = (spark.readStream.schema(SRC_SCHEMA)
           .option("maxFilesPerTrigger", int(max_files_per_trigger))
           .parquet(input_path))
    q = (src.writeStream.foreachBatch(wap_batch)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    return q, store


def read_quarantine(spark: SparkSession, work_dir: str) -> DataFrame:
    """All quarantined rows with discovered (reason, batch) partition
    columns — reason='payload' (corrupt input) or 'audit' (member of a
    batch whose staged snapshot failed its tile audit, on_fail='skip')."""
    return spark.read.option("basePath", os.path.join(work_dir, "quarantine")) \
        .parquet(os.path.join(work_dir, "quarantine"))


def read_publish_log(work_dir: str) -> list:
    """The per-batch decision log, in commit order."""
    path = os.path.join(work_dir, "publish_log.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
