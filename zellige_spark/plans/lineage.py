"""Iceberg-lite table store: snapshot/manifest JSON + parquet data,
per-partition lineage, and checkpoint/resume for the tiling job
(north rule: "resumable from Iceberg-snapshot checkpoints with
per-partition lineage and tile-count/row-count metrics").

No Iceberg runtime jars exist in this sandbox, so the adapter emulates
the snapshot model on plain parquet + JSON:

    <root>/
      data/snapshot=<sid>/part-*.parquet     -- tile rows
      lineage/snapshot=<sid>/part-*.parquet  -- per-partition lineage
      deletes/snapshot=<sid>/part-*.parquet  -- tombstoned tile keys
      manifests/<sid>.json                   -- snapshot manifest
      manifests/CURRENT                      -- pointer to latest sid

Snapshot operations mirror Iceberg's: ``append`` (commit_tiles),
``replace`` (compact), ``delete`` (commit_deletes — v2 equality-delete
shape, applied on read until a compaction materializes them), plus the
write-audit-publish staging flow (``staged=True`` -> publish/abandon).

Swapping in real Iceberg is a config change (write.format("iceberg") +
catalog conf) — the commit/resume logic below only relies on
snapshot-id-keyed idempotent writes, which Iceberg provides natively.

Resume contract: tile outputs are keyed (zoom, tile_x, tile_y) and the
encode is deterministic, so recovery = anti-join the planned tile set
against already-committed keys and encode only the remainder; a commit
finalizes by writing the manifest LAST (write-ahead data, manifest as
the atomic commit point).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TileStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)

    # --- snapshot bookkeeping -------------------------------------------------

    def current_snapshot(self) -> Optional[str]:
        cur = os.path.join(self.root, "manifests", "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return f.read().strip() or None

    def manifest(self, sid: str) -> dict:
        with open(os.path.join(self.root, "manifests", f"{sid}.json")) as f:
            return json.load(f)

    def snapshots(self) -> list:
        d = os.path.join(self.root, "manifests")
        return sorted(s[:-5] for s in os.listdir(d) if s.endswith(".json"))

    def _data_path(self, sid: str) -> str:
        return os.path.join(self.root, "data", f"snapshot={sid}")

    def _lineage_path(self, sid: str) -> str:
        return os.path.join(self.root, "lineage", f"snapshot={sid}")

    def _deletes_path(self, sid: str) -> str:
        return os.path.join(self.root, "deletes", f"snapshot={sid}")

    # --- commit ----------------------------------------------------------------

    def commit_tiles(self, tiles: DataFrame, input_desc: str,
                     sid: Optional[str] = None, rows_in: Optional[int] = None,
                     full: bool = False, staged: bool = False,
                     operation: str = "append") -> str:
        """Write tile rows + per-partition lineage, then the manifest
        (manifest-last = atomic commit point).  ``tiles`` must carry
        (zoom, tile_x, tile_y, mvt, feature_count, bytes_len).
        ``full=True`` marks a snapshot that carries EVERY live tile key
        (a compaction does) — the safe truncation point for
        ``expire_snapshots``.

        ``staged=True`` is the write-audit-publish (WAP) pattern
        (Iceberg's audit branch / ``spark.wap.id``): the snapshot is
        fully written and manifest-committed but CURRENT does not
        advance, so readers, ``latest_view`` and resume cannot see it.
        Audit it by ``read_tiles(sid)`` / ``_view_as_of(sid)``, then
        ``publish(sid)`` to make it the table head atomically, or
        ``abandon(sid)`` to drop it.  ``remove_orphans`` never collects
        a staged snapshot (its manifest exists — manifests are the
        liveness authority)."""
        spark = tiles.sparkSession
        sid = sid or uuid.uuid4().hex[:16]
        data_path = self._data_path(sid)

        with_pid = tiles.withColumn("partition_id", F.spark_partition_id())
        with_pid.write.mode("errorifexists").parquet(data_path)

        # lineage from the committed files (exactly what landed on disk)
        committed = spark.read.parquet(data_path)
        lineage = (committed.groupBy("partition_id")
                   .agg(F.count(F.lit(1)).alias("tiles_out"),
                        F.sum("feature_count").alias("rows_out"),
                        F.sum("bytes_len").alias("bytes_out")))
        lineage = lineage.withColumn("snapshot_id", F.lit(sid))
        lineage.write.mode("errorifexists").parquet(self._lineage_path(sid))

        totals = committed.agg(
            F.count(F.lit(1)).alias("tiles"),
            F.sum("feature_count").alias("features"),
            F.sum("bytes_len").alias("bytes")).collect()[0]
        manifest = {
            "snapshot_id": sid,
            "parent_id": self.current_snapshot(),
            "timestamp_ms": int(time.time() * 1000),
            "input": input_desc,
            "operation": operation,
            "full": bool(full),
            "staged": bool(staged),
            "metrics": {
                "rows_in": rows_in,
                "tiles_out": int(totals["tiles"]),
                "features_out": int(totals["features"] or 0),
                "bytes_out": int(totals["bytes"] or 0),
            },
            "data_path": data_path,
            "lineage_path": self._lineage_path(sid),
        }
        self._write_manifest(manifest)
        if not staged:
            self._advance_current(sid)
        return sid

    def _write_manifest(self, manifest: dict) -> None:
        mpath = os.path.join(self.root, "manifests",
                             f"{manifest['snapshot_id']}.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f, indent=2)
        os.rename(mpath + ".tmp", mpath)

    def _advance_current(self, sid: str) -> None:
        cur = os.path.join(self.root, "manifests", "CURRENT")
        with open(cur + ".tmp", "w") as f:
            f.write(sid)
        os.rename(cur + ".tmp", cur)

    # --- write-audit-publish -----------------------------------------------------

    def publish(self, sid: str) -> str:
        """Promote a staged (WAP) snapshot to the table head.  Refuses
        (ValueError) when another commit advanced CURRENT after the
        stage was written — the staged snapshot's parent pointer would
        silently drop that commit from the chain (real Iceberg rebases
        with a retry loop; here the caller re-stages).  Idempotent: a
        crash between the manifest rewrite and the CURRENT advance is
        healed by calling publish again."""
        m = self.manifest(sid)
        head = self.current_snapshot()
        if head not in (m.get("parent_id"), sid):
            raise ValueError(
                f"stale staged snapshot {sid}: parent {m.get('parent_id')} "
                f"is no longer the table head ({head}); abandon and re-stage")
        if m.get("staged"):
            m["staged"] = False
            m["published_ms"] = int(time.time() * 1000)
            self._write_manifest(m)
        if head != sid:
            self._advance_current(sid)
        return sid

    def abandon(self, sid: str) -> None:
        """Drop a staged snapshot that failed its audit: delete the
        manifest FIRST (the liveness authority — the data dirs become
        orphans even if deletion dies mid-way), then its directories.
        Refuses to touch a published snapshot."""
        import shutil

        if not self.manifest(sid).get("staged"):
            raise ValueError(f"snapshot {sid} is published, not staged")
        os.remove(os.path.join(self.root, "manifests", f"{sid}.json"))
        for p in (self._data_path(sid), self._lineage_path(sid),
                  self._deletes_path(sid)):
            shutil.rmtree(p, ignore_errors=True)

    def abandon_stale_staged(self, older_than_ms: int = 0) -> list:
        """Garbage-collect orphaned WAP stages.  A staged snapshot
        whose parent is no longer the table head can never publish
        (``publish`` refuses — its parent pointer would drop a commit
        from the chain), and a writer crash between stage and publish
        leaves exactly that; ``expire_snapshots`` walks only the
        CURRENT chain and ``remove_orphans`` treats manifests as
        liveness, so without this sweep stale stages leak forever.
        Abandons every staged snapshot that is stale (parent != head)
        or older than ``older_than_ms``; a fresh, publishable stage
        (parent == head, younger than the TTL) is never touched.
        Returns the abandoned ids."""
        now_ms = int(time.time() * 1000)
        head = self.current_snapshot()
        out = []
        for sid in self.snapshots():
            m = self.manifest(sid)
            if not m.get("staged"):
                continue
            stale = m.get("parent_id") != head
            aged = older_than_ms > 0 and \
                now_ms - int(m.get("timestamp_ms", 0)) >= older_than_ms
            if stale or aged:
                self.abandon(sid)
                out.append(sid)
        return out

    # --- row-level deletes ---------------------------------------------------------

    def commit_deletes(self, keys: DataFrame, input_desc: str,
                       sid: Optional[str] = None) -> str:
        """Commit a DELETE snapshot — the Iceberg v2 equality-delete
        shape at tile granularity: ``keys`` (zoom, tile_x, tile_y) are
        tombstoned, so every read THROUGH the chain (``latest_view``,
        ``_view_as_of``, ``snapshot_diff``) drops them, while time
        travel to any pre-delete snapshot still shows the bytes.  The
        tombstones are logical until ``compact()`` materializes the
        delete-applied state and ``expire_snapshots()`` drops the
        ancestor data files — the delete -> compact -> expire sequence
        is the hard-delete (imagery-revocation / GDPR) path, after
        which the bytes are physically gone from disk.

        Resume semantics (no resurrection): deleted keys stay
        "completed" in ``completed_tile_keys`` — a deliberate delete
        must not be undone by the next resume run re-encoding the key."""
        spark = keys.sparkSession
        sid = sid or uuid.uuid4().hex[:16]
        dpath = self._deletes_path(sid)
        (keys.select("zoom", "tile_x", "tile_y").distinct()
             .write.mode("errorifexists").parquet(dpath))
        n = spark.read.parquet(dpath).count()
        manifest = {
            "snapshot_id": sid,
            "parent_id": self.current_snapshot(),
            "timestamp_ms": int(time.time() * 1000),
            "input": input_desc,
            "operation": "delete",
            "full": False,
            "staged": False,
            "metrics": {"keys_deleted": int(n)},
            "deletes_path": dpath,
        }
        self._write_manifest(manifest)
        self._advance_current(sid)
        return sid

    def delete_where(self, spark: SparkSession, predicate) -> str:
        """Tombstone every tile key of the CURRENT view matching a
        Column predicate (e.g. a zoom band, a tile_x/tile_y box over a
        revoked region) — ``DELETE FROM tiles WHERE ...``."""
        keys = (self.latest_view(spark).filter(predicate)
                .select("zoom", "tile_x", "tile_y"))
        return self.commit_deletes(keys, input_desc=f"delete where {predicate}")

    def read_deletes(self, spark: SparkSession, sid: str) -> DataFrame:
        return spark.read.parquet(self._deletes_path(sid))

    # --- read ------------------------------------------------------------------

    def read_tiles(self, spark: SparkSession, sid: Optional[str] = None) -> DataFrame:
        sid = sid or self.current_snapshot()
        if sid is None:
            raise FileNotFoundError("no committed snapshot")
        return spark.read.parquet(self._data_path(sid))

    def read_lineage(self, spark: SparkSession, sid: Optional[str] = None) -> DataFrame:
        sid = sid or self.current_snapshot()
        return spark.read.parquet(self._lineage_path(sid))

    def latest_view(self, spark: SparkSession) -> DataFrame:
        """Resolve the snapshot chain to the LATEST version of every
        tile key (newest snapshot wins) — the table's current state."""
        sid = self.current_snapshot()
        if sid is None:
            raise FileNotFoundError("no committed snapshot")
        return self._view_as_of(spark, sid)

    # --- compaction -------------------------------------------------------------

    def compact(self, spark: SparkSession,
                target_file_bytes: int = 128 << 20,
                input_desc: str = "compaction") -> str:
        """Small-files compaction — the day-one 100-TB operational
        concern of any snapshot-per-increment store: resolve the
        snapshot chain to the LATEST version of every tile key, rewrite
        it as ceil(total_bytes / target) range-partitioned files (range
        on (zoom, Morton(tile_x, tile_y)) — the shared CellIndex
        locality key, so each compacted file covers a compact 2-D tile
        BLOCK within its zoom rather than a row-major x-strip, and any
        tile-range predicate keeps pruning files after compaction), and
        commit the result as a NEW snapshot whose parent is the current
        head.  Per-key tile bytes are preserved exactly and pending
        tombstones are MATERIALIZED (a deleted key is absent from the
        compacted files — expire behind this snapshot is the
        hard-delete point, after which the bytes are physically gone
        from disk); history stays
        readable for time travel; resume keeps working unchanged (the
        compacted snapshot carries every key, and the chain walk in
        ``completed_tile_keys`` dedups).  Real Iceberg swaps this for
        rewrite_data_files — same contract."""
        sids = []
        sid = self.current_snapshot()
        while sid is not None:
            sids.append(sid)
            sid = self.manifest(sid).get("parent_id")
        if not sids:
            raise FileNotFoundError("no committed snapshot to compact")
        latest = self.latest_view(spark)
        total = latest.agg(F.sum("bytes_len").alias("b")).collect()[0]["b"] or 1
        nfiles = max(1, -(-int(total) // int(target_file_bytes)))
        from ..operators.tiles import morton_key

        packed = (latest
                  .withColumn("_zk", morton_key(F.col("tile_x"),
                                                F.col("tile_y")))
                  .repartitionByRange(nfiles, "zoom", "_zk")
                  .sortWithinPartitions("zoom", "_zk")
                  .drop("_zk"))
        return self.commit_tiles(
            packed, input_desc=f"{input_desc} of {len(sids)} snapshots",
            full=True, operation="replace")

    def snapshot_diff(self, spark: SparkSession, sid_old: str,
                      sid_new: str) -> DataFrame:
        """Changed-tile detection between two snapshots' RESOLVED
        states — the incremental-publish operator: a map service only
        re-pushes tiles whose bytes changed.  Each side resolves its
        chain AS OF that snapshot (latest version per key), then a full
        outer join on the tile key classifies every key as ``added`` /
        ``removed`` / ``changed`` / ``same`` (byte equality on the MVT
        payload).  Output: (zoom, tile_x, tile_y, change, bytes_old,
        bytes_new).

        Scale shape: two chain resolutions (window over the tile key)
        + one join on the same key — AQE reuses the partitioning; the
        diff never touches raw input rows, only committed tiles."""
        old = (self._view_as_of(spark, sid_old)
               .select("zoom", "tile_x", "tile_y",
                       F.col("mvt").alias("_mvt_old"),
                       F.col("bytes_len").alias("bytes_old")))
        new = (self._view_as_of(spark, sid_new)
               .select("zoom", "tile_x", "tile_y",
                       F.col("mvt").alias("_mvt_new"),
                       F.col("bytes_len").alias("bytes_new")))
        j = old.join(new, ["zoom", "tile_x", "tile_y"], "full_outer")
        change = (F.when(F.col("_mvt_old").isNull(), F.lit("added"))
                   .when(F.col("_mvt_new").isNull(), F.lit("removed"))
                   .when(F.col("_mvt_old") == F.col("_mvt_new"),
                         F.lit("same"))
                   .otherwise(F.lit("changed")))
        return j.select("zoom", "tile_x", "tile_y",
                        change.alias("change"), "bytes_old", "bytes_new")

    def _view_as_of(self, spark: SparkSession, sid: str) -> DataFrame:
        """Chain-resolved latest version of every tile key AS OF
        ``sid`` (walking parents from there).  The newest ACTION per
        key wins — an append contributes its bytes, a delete snapshot
        contributes a tombstone that drops the key (until a younger
        append re-adds it)."""
        from pyspark.sql import Window

        sids = []
        cur = sid
        while cur is not None:
            sids.append(cur)
            if self.manifest(cur).get("full"):
                # a full snapshot carries EVERY live tile key (compaction,
                # dirty refresh), so older history is redundant for
                # resolution — and keys it omits are deleted, not
                # resurrected from older appends
                break
            cur = self.manifest(cur).get("parent_id")
        parts = []
        for i, s in enumerate(sids):
            if self.manifest(s).get("operation") == "delete":
                parts.append(self.read_deletes(spark, s)
                             .withColumn("_age", F.lit(i))
                             .withColumn("_del", F.lit(True)))
            else:
                parts.append(self.read_tiles(spark, s)
                             .drop("partition_id")
                             .withColumn("_age", F.lit(i))
                             .withColumn("_del", F.lit(False)))
        allt = parts[0]
        for p in parts[1:]:
            # Iceberg add/drop-column schema evolution on read: a
            # column absent from an older (or newer) snapshot reads as
            # NULL instead of failing the union — so a chain may mix
            # schema versions and the view keeps every column any
            # snapshot ever carried (tombstone rows carry only the key)
            allt = allt.unionByName(p, allowMissingColumns=True)
        w = Window.partitionBy("zoom", "tile_x", "tile_y").orderBy("_age")
        return (allt.withColumn("_rn", F.row_number().over(w))
                    .filter((F.col("_rn") == 1) & (~F.col("_del")))
                    .drop("_rn", "_age", "_del"))

    # --- retention ----------------------------------------------------------------

    def expire_snapshots(self, keep_last: int = 1) -> list:
        """Iceberg ``expire_snapshots``-lite: truncate chain history
        behind the newest FULL snapshot while keeping at least
        ``keep_last`` snapshots.  Every snapshot here is an incremental
        delta — the chain walk in ``completed_tile_keys`` / ``compact``
        needs all ancestors — so expiry is only safe behind a snapshot
        that carries every live tile key (one produced by ``compact``,
        manifest-flagged ``full``).  Refuses (ValueError) when no such
        truncation point exists: deleting a delta ancestor would
        silently change the latest view and break resume.

        Procedure (crash-safe, manifest-first like commit): rewrite the
        boundary manifest with ``parent_id: null`` (the chain is now
        truncated even if deletion dies mid-way), then delete the
        orphaned manifests and data/lineage directories.  Returns the
        expired snapshot ids, oldest last."""
        import shutil

        chain = []
        sid = self.current_snapshot()
        while sid is not None:
            chain.append(sid)
            sid = self.manifest(sid).get("parent_id")
        if len(chain) <= max(1, keep_last):
            return []
        boundary_i = None
        for i, s in enumerate(chain):
            if i >= keep_last - 1 and self.manifest(s).get("full"):
                boundary_i = i
                break
        if boundary_i is None or boundary_i + 1 >= len(chain):
            if boundary_i is not None:
                return []
            raise ValueError(
                "no full (compacted) snapshot to truncate behind — run "
                "compact() first; expiring delta ancestors would change "
                "the latest view")
        doomed = chain[boundary_i + 1:]
        boundary = chain[boundary_i]
        m = self.manifest(boundary)
        m["parent_id"] = None
        m["expired_ancestors"] = doomed + list(m.get("expired_ancestors", []))
        mpath = os.path.join(self.root, "manifests", f"{boundary}.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(m, f, indent=2)
        os.rename(mpath + ".tmp", mpath)
        for s in doomed:
            try:
                os.remove(os.path.join(self.root, "manifests", f"{s}.json"))
            except FileNotFoundError:
                pass
            shutil.rmtree(self._data_path(s), ignore_errors=True)
            shutil.rmtree(self._lineage_path(s), ignore_errors=True)
            shutil.rmtree(self._deletes_path(s), ignore_errors=True)
        return doomed

    def remove_orphans(self, older_than_s: float = 0.0) -> list:
        """Iceberg ``remove_orphan_files``-lite: delete data/lineage
        directories (and stale ``.tmp`` manifests) whose snapshot id
        has NO committed manifest — exactly what a commit crashed
        between the data write and the manifest-last rename leaves
        behind.  Committed snapshots are untouched by construction
        (the manifest set is the liveness authority), so the latest
        view, resume, and the chain walk are unaffected.

        ``older_than_s`` mirrors Iceberg's age guard: directories
        modified within the last ``older_than_s`` seconds are skipped,
        protecting a commit that is IN FLIGHT right now (its manifest
        simply hasn't landed yet).  The default 0.0 collects
        everything — fine for a quiesced store, wrong under concurrent
        writers; production callers should pass hours, as Iceberg's
        3-day default does.  Returns the orphaned snapshot ids."""
        import shutil

        have = {s for s in self.snapshots()}
        cutoff = time.time() - older_than_s
        removed = []
        for kind in ("data", "lineage", "deletes"):
            base = os.path.join(self.root, kind)
            if not os.path.isdir(base):
                continue
            for d in sorted(os.listdir(base)):
                if not d.startswith("snapshot="):
                    continue
                sid = d[len("snapshot="):]
                path = os.path.join(base, d)
                if sid in have or os.path.getmtime(path) > cutoff:
                    continue
                shutil.rmtree(path, ignore_errors=True)
                if sid not in removed:
                    removed.append(sid)
        mdir = os.path.join(self.root, "manifests")
        for f in os.listdir(mdir):
            if f.endswith(".tmp") and os.path.getmtime(
                    os.path.join(mdir, f)) <= cutoff:
                os.remove(os.path.join(mdir, f))
        return removed

    # --- checkpoint / resume -----------------------------------------------------

    def completed_tile_keys(self, spark: SparkSession) -> Optional[DataFrame]:
        """Tile keys already committed in the current snapshot chain."""
        sid = self.current_snapshot()
        if sid is None:
            return None
        seen = None
        while sid is not None:
            m = self.manifest(sid)
            if m.get("operation") != "delete":
                df = (spark.read.parquet(self._data_path(sid))
                      .select("zoom", "tile_x", "tile_y"))
                seen = df if seen is None else seen.unionAll(df)
            sid = m.get("parent_id")
        # delete snapshots do NOT un-complete a key: a tombstoned key
        # was deliberately removed and resume must not resurrect it
        return seen.distinct() if seen is not None else None

    def remaining_tiles(self, planned: DataFrame) -> DataFrame:
        """Anti-join the planned tile-keyed work against completed keys —
        the resume operator (idempotent: deterministic per-tile bytes)."""
        spark = planned.sparkSession
        done = self.completed_tile_keys(spark)
        if done is None:
            return planned
        return planned.join(F.broadcast(done), ["zoom", "tile_x", "tile_y"], "left_anti")


def encode_resumable(assigned: DataFrame, store: TileStore, input_desc: str,
                     layer_name: str = "images", extent: int = 4096,
                     quantize: int = 1, buffer: int = 128) -> str:
    """Run the streaming tile encode over only the not-yet-committed
    tiles, then commit a new snapshot.  Crash-safe: a failed run leaves
    no manifest, so its partial data directory is ignored by resume
    (manifests are the commit points)."""
    from ..operators import encode as E

    remaining = store.remaining_tiles(assigned)
    tiles = E.assemble_point_tiles_streaming(
        remaining, layer_name=layer_name, extent=extent,
        quantize=quantize, buffer=buffer)
    return store.commit_tiles(tiles, input_desc)


def refresh_dirty_tiles(store: TileStore, new_points: DataFrame,
                        delta_points: DataFrame, zooms,
                        layer_name: str = "images", extent: int = 4096,
                        quantize: int = 1, buffer: int = 128,
                        input_desc: str = "dirty refresh") -> str:
    """Incremental pyramid maintenance: given the NEW full point set and
    the DELTA rows (inserted rows, deleted rows at their old positions,
    and both positions of moved rows), re-encode ONLY the tiles the
    delta touches and splice them into the previous snapshot — byte-
    identical to a full rebuild (test-pinned), at the cost of the dirty
    tiles only.

    The dirty set is the delta's BUFFERED assignment (a point near a
    tile edge dirties the neighbor whose 128/4096 edge band contains
    it) across every requested zoom — exactly the tiles whose MVT bytes
    can change.  Untouched tiles are carried forward from
    ``latest_view`` without re-reading any input rows; dirty tiles that
    end up empty simply vanish (they are excluded from the carry and
    produce no new rows).  Committed ``full=True`` (the snapshot holds
    every live tile), so it is also a safe ``expire_snapshots``
    truncation point.

    Scale shape: at 10^12 rows a daily delta touches a tiny fraction of
    tiles; the cost is one buffered assignment of the delta (map-only),
    one semi join of the new assignment against the dirty keys, the
    re-encode of those tiles, and one anti join over the COMMITTED tile
    table (~10^8 rows of keys+bytes, not 10^12 input rows).  The
    zellige reference re-encodes the world every run (single-shot
    app/Main.hs); this is the engine-side answer to incremental
    publish, composing with ``snapshot_diff`` for the push set."""
    from ..operators import encode as E
    from ..operators import tiles as T

    spark = new_points.sparkSession
    keys = ["zoom", "tile_x", "tile_y"]
    dirty = (T.assign_tiles_buffered(delta_points, zooms=list(zooms),
                                     extent=extent, buffer=buffer)
             .select(*keys).distinct())
    assigned = T.assign_tiles_buffered(new_points, zooms=list(zooms),
                                       extent=extent, buffer=buffer)
    touched = assigned.join(dirty, keys, "left_semi")
    fresh = E.assemble_point_tiles_streaming(
        touched, layer_name=layer_name, extent=extent,
        quantize=quantize, buffer=buffer)
    kept = (store.latest_view(spark)
            .select("zoom", "tile_x", "tile_y", "mvt", "feature_count",
                    "bytes_len")
            .join(dirty, keys, "left_anti"))
    merged = kept.unionByName(fresh.select("zoom", "tile_x", "tile_y",
                                           "mvt", "feature_count",
                                           "bytes_len"))
    return store.commit_tiles(merged, input_desc, full=True,
                              operation="dirty-refresh")
