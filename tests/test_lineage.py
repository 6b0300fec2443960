"""Checkpoint/resume + lineage tests for the Iceberg-lite TileStore."""

import json
import os

from pyspark.sql import functions as F

from zellige_spark import synth
from zellige_spark.operators import encode as E
from zellige_spark.operators import tiles as T
from zellige_spark.plans.lineage import TileStore, encode_resumable


def _assigned(spark, n):
    imgs = synth.images_df(spark, n).select("image_id", "lon", "lat")
    return T.assign_tiles_buffered(imgs, zoom=6)


def test_commit_and_manifest(spark, tmp_path):
    store = TileStore(str(tmp_path / "store"))
    assigned = _assigned(spark, 300)
    tiles = E.assemble_point_tiles_streaming(assigned)
    sid = store.commit_tiles(tiles, "images[0:300)", rows_in=300)
    assert store.current_snapshot() == sid
    m = store.manifest(sid)
    assert m["metrics"]["tiles_out"] > 0
    assert m["metrics"]["features_out"] == assigned.count()
    assert m["parent_id"] is None
    lineage = store.read_lineage(spark).toPandas()
    assert lineage["tiles_out"].sum() == m["metrics"]["tiles_out"]
    assert lineage["rows_out"].sum() == m["metrics"]["features_out"]
    assert (lineage["snapshot_id"] == sid).all()


def test_resume_skips_committed_tiles(spark, tmp_path):
    store = TileStore(str(tmp_path / "store"))
    a300 = _assigned(spark, 300).cache()
    sid1 = encode_resumable(a300, store, "images[0:300)")
    n1 = store.read_tiles(spark, sid1).count()

    # resume over the same work: nothing remains
    assert store.remaining_tiles(a300).count() == 0
    sid2 = encode_resumable(a300, store, "images[0:300) resume")
    assert store.read_tiles(spark, sid2).count() == 0

    # grow the input: only new tiles are encoded
    a500 = _assigned(spark, 500).cache()
    sid3 = encode_resumable(a500, store, "images[0:500)")
    new_tiles = store.read_tiles(spark, sid3)
    old_keys = {(r["tile_x"], r["tile_y"]) for r in store.read_tiles(spark, sid1)
                .select("tile_x", "tile_y").collect()}
    for r in new_tiles.select("tile_x", "tile_y").collect():
        assert (r["tile_x"], r["tile_y"]) not in old_keys
    # union of snapshots covers the full 500-row tile plan
    all_keys = store.completed_tile_keys(spark).count()
    planned = a500.select("zoom", "tile_x", "tile_y").distinct().count()
    assert all_keys == planned


def test_failed_run_leaves_no_commit(spark, tmp_path):
    store = TileStore(str(tmp_path / "store"))
    # simulate a crashed write: data dir exists, no manifest
    os.makedirs(os.path.join(store.root, "data", "snapshot=deadbeef"))
    assert store.current_snapshot() is None
    assert store.remaining_tiles(_assigned(spark, 50)).count() > 0


def test_snapshot_chain(spark, tmp_path):
    store = TileStore(str(tmp_path / "store"))
    sid1 = encode_resumable(_assigned(spark, 100), store, "batch1")
    sid2 = encode_resumable(_assigned(spark, 200), store, "batch2")
    m2 = store.manifest(sid2)
    assert m2["parent_id"] == sid1
    assert store.snapshots() == sorted([sid1, sid2])


def test_compaction_preserves_latest_content_and_packs_files(spark, tmp_path):
    """Compact a 3-snapshot chain (incremental encode + a refreshed
    tile version): the new snapshot holds the LATEST bytes of every
    key in size-targeted range-partitioned files; resume still
    short-circuits; history stays readable."""
    store = TileStore(str(tmp_path / "store"))
    a300 = _assigned(spark, 300).cache()
    a500 = _assigned(spark, 500).cache()
    encode_resumable(a300, store, "images[0:300)")
    encode_resumable(a500, store, "images[0:500)")
    # third snapshot REFRESHES a subset of tiles with new content
    # (re-encode from the larger corpus: overlapping keys, new bytes)
    refreshed = E.assemble_point_tiles_streaming(a500)
    some = refreshed.limit(7).cache()
    store.commit_tiles(some, "refresh 7 tiles")
    chain_len = len(store.snapshots())

    # expected latest view: refreshed keys -> refreshed bytes, others
    # -> their chain version
    expect = {}
    sid = store.current_snapshot()
    age = 0
    rows_by_age = []
    while sid is not None:
        rows_by_age.append(store.read_tiles(spark, sid).collect())
        sid = store.manifest(sid).get("parent_id")
    for rows in rows_by_age:  # youngest first; first writer wins
        for r in rows:
            k = (r["zoom"], r["tile_x"], r["tile_y"])
            expect.setdefault(k, bytes(r["mvt"]))

    csid = store.compact(spark, target_file_bytes=16 << 10)
    got = {(r["zoom"], r["tile_x"], r["tile_y"]): bytes(r["mvt"])
           for r in store.read_tiles(spark, csid).collect()}
    assert got == expect
    # manifest chain intact, metrics recorded
    m = store.manifest(csid)
    assert m["parent_id"] is not None
    assert m["metrics"]["tiles_out"] == len(expect)
    assert "compaction" in m["input"]
    # file sizing: more than one file at a tiny target, and each file
    # covers a disjoint tile-key RANGE (pruning-friendly layout)
    import glob
    files = [f for f in glob.glob(os.path.join(
        store._data_path(csid), "part-*.parquet"))]
    assert len(files) > 1
    # layout key = (zoom, Morton(tile_x, tile_y)): compacted files
    # cover disjoint compact 2-D tile blocks within each zoom
    def morton(x, y):
        out = 0
        for b in range(28):
            out |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return out

    ranges = []
    for f in files:
        pdf = spark.read.parquet(f).select("zoom", "tile_x", "tile_y").toPandas()
        if len(pdf):
            keys = [(z, morton(x, y))
                    for z, x, y in zip(pdf.zoom, pdf.tile_x, pdf.tile_y)]
            assert keys == sorted(keys)  # in-file sort -> row-group prune
            ranges.append((min(keys), max(keys)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # resume after compaction: nothing left to do
    assert store.remaining_tiles(a500).count() == 0


def test_expire_snapshots_truncates_behind_full(spark, tmp_path):
    """expire_snapshots drops chain history behind the newest full
    (compacted) snapshot: latest view and completed keys are unchanged,
    the expired data dirs are physically gone, time travel to expired
    sids fails cleanly."""
    import pytest

    store = TileStore(str(tmp_path / "store"))
    sid1 = store.commit_tiles(
        E.assemble_point_tiles_streaming(_assigned(spark, 200)), "a")
    sid2 = store.commit_tiles(
        E.assemble_point_tiles_streaming(_assigned(spark, 400)), "b")
    c = store.compact(spark)
    sid3 = store.commit_tiles(
        E.assemble_point_tiles_streaming(_assigned(spark, 600)), "c")

    def snap_view():
        pdf = store.latest_view(spark).toPandas()
        return sorted((r.zoom, r.tile_x, r.tile_y, r.feature_count,
                       bytes(r.mvt)) for r in pdf.itertuples())

    pre_view = snap_view()
    pre_keys = sorted(map(tuple, store.completed_tile_keys(spark).collect()))

    expired = store.expire_snapshots(keep_last=1)
    assert set(expired) == {sid1, sid2}
    assert sorted(store.snapshots()) == sorted([c, sid3])
    assert store.manifest(c)["parent_id"] is None
    assert set(store.manifest(c)["expired_ancestors"]) == {sid1, sid2}
    assert not os.path.exists(store._data_path(sid1))
    assert not os.path.exists(store._lineage_path(sid2))

    assert snap_view() == pre_view  # byte-exact latest state
    post_keys = sorted(map(tuple, store.completed_tile_keys(spark).collect()))
    assert post_keys == pre_keys    # resume contract intact
    with pytest.raises(Exception):
        store.read_tiles(spark, sid1).collect()
    # a second expire is a no-op (nothing behind the full boundary)
    assert store.expire_snapshots(keep_last=1) == []


def test_expire_refuses_to_break_delta_chain(spark, tmp_path):
    """Without a full snapshot in range, expiry would silently change
    the latest view — it must refuse; and keep_last always wins over
    an eligible boundary."""
    import pytest

    store = TileStore(str(tmp_path / "store"))
    store.commit_tiles(
        E.assemble_point_tiles_streaming(_assigned(spark, 200)), "a")
    assert store.expire_snapshots(keep_last=1) == []  # nothing to expire
    store.commit_tiles(
        E.assemble_point_tiles_streaming(_assigned(spark, 400)), "b")
    with pytest.raises(ValueError):
        store.expire_snapshots(keep_last=1)  # both are deltas
    c = store.compact(spark)
    store.commit_tiles(
        E.assemble_point_tiles_streaming(_assigned(spark, 500)), "c")
    # chain [s3, c, s2, s1]: keep_last=4 keeps everything
    assert store.expire_snapshots(keep_last=4) == []


def test_snapshot_diff_classifies_changes(spark, tmp_path):
    """snapshot_diff between two resolved states: re-encoded tiles with
    MORE points are 'changed', brand-new tiles 'added', untouched tiles
    'same'; a removed case is exercised by diffing in reverse."""
    store = TileStore(str(tmp_path / "store"))
    s1 = store.commit_tiles(
        E.assemble_point_tiles_streaming(_assigned(spark, 300)), "a")
    s2 = store.commit_tiles(
        E.assemble_point_tiles_streaming(_assigned(spark, 600)), "b")

    d = store.snapshot_diff(spark, s1, s2).toPandas()
    by = d.groupby("change").size().to_dict()
    # images_df(600) extends images_df(300): every tile of s1 also
    # exists in s2's state; tiles whose point set grew are changed
    assert by.get("removed", 0) == 0
    assert by.get("changed", 0) > 0
    # new tiles only if 600-point set hits tiles the 300-point set
    # missed; either way every s1 tile is accounted for
    t1 = store.read_tiles(spark, s1).count()
    assert (by.get("same", 0) + by.get("changed", 0)) == t1

    rev = store.snapshot_diff(spark, s2, s1).toPandas()
    rby = rev.groupby("change").size().to_dict()
    assert rby.get("added", 0) == by.get("removed", 0)
    assert rby.get("removed", 0) == by.get("added", 0)
    assert rby.get("changed", 0) == by.get("changed", 0)
    assert rby.get("same", 0) == by.get("same", 0)

    # byte-level truth: 'same' rows really are byte-equal, 'changed' not
    v1 = {(r.zoom, r.tile_x, r.tile_y): bytes(r.mvt)
          for r in store._view_as_of(spark, s1).collect()}
    v2 = {(r.zoom, r.tile_x, r.tile_y): bytes(r.mvt)
          for r in store._view_as_of(spark, s2).collect()}
    for r in d.itertuples():
        key = (r.zoom, r.tile_x, r.tile_y)
        if r.change == "same":
            assert v1[key] == v2[key]
        elif r.change == "changed":
            assert v1[key] != v2[key]
        elif r.change == "added":
            assert key not in v1 and key in v2


def test_remove_orphans_collects_crashed_commit_only(spark, tmp_path):
    """A commit that crashed between the data write and the
    manifest-last rename leaves orphan data/lineage dirs (and possibly
    a .tmp manifest); remove_orphans deletes exactly those, leaves
    every committed snapshot intact, and respects the in-flight age
    guard."""
    store = TileStore(str(tmp_path / "store"))
    sid1 = encode_resumable(_assigned(spark, 100), store, "batch1")
    before = store.latest_view(spark).count()

    # simulate the crash: orphan data + lineage dirs, stale tmp manifest
    os.makedirs(os.path.join(store.root, "data", "snapshot=deadbeef"))
    os.makedirs(os.path.join(store.root, "lineage", "snapshot=deadbeef"))
    with open(os.path.join(store.root, "manifests", "dead.json.tmp"), "w") as f:
        f.write("{}")

    # age guard: a "just written" orphan survives a 1-hour guard
    assert store.remove_orphans(older_than_s=3600) == []
    assert os.path.isdir(os.path.join(store.root, "data", "snapshot=deadbeef"))

    removed = store.remove_orphans()
    assert removed == ["deadbeef"]
    assert not os.path.exists(os.path.join(store.root, "data", "snapshot=deadbeef"))
    assert not os.path.exists(os.path.join(store.root, "lineage", "snapshot=deadbeef"))
    assert not os.path.exists(os.path.join(store.root, "manifests", "dead.json.tmp"))
    # committed snapshot untouched; latest view identical; resume works
    assert store.snapshots() == [sid1]
    assert store.latest_view(spark).count() == before
    assert store.remove_orphans() == []


def test_schema_evolution_add_column_reads_with_null_backfill(spark, tmp_path):
    """Iceberg add-column evolution on read: a later snapshot commits
    an extra column; latest_view keeps it (NULL for keys whose latest
    version predates the column), the as-of view at the old snapshot
    is unchanged, and resume still sees every key."""
    store = TileStore(str(tmp_path / "store"))
    a1 = _assigned(spark, 100)
    sid1 = encode_resumable(a1, store, "batch1")
    old_cols = set(store.latest_view(spark).columns)

    # batch 2: only NEW keys (the resume path), with an extra per-tile
    # column the v1 schema lacks
    a2 = _assigned(spark, 500)
    remaining = store.remaining_tiles(a2)
    t2 = (E.assemble_point_tiles_streaming(remaining)
          .withColumn("content_crc", F.crc32(F.col("mvt"))))
    sid2 = store.commit_tiles(t2, "batch2-evolved", rows_in=500)

    view = store.latest_view(spark)
    assert "content_crc" in view.columns
    rows = view.select("zoom", "tile_x", "tile_y", "content_crc").collect()
    # batch-2 keys carry the crc; v1-era keys read NULL (backfill)
    assert any(r.content_crc is not None for r in rows)
    assert any(r.content_crc is None for r in rows)
    # time travel to sid1 shows the ORIGINAL schema, untouched
    assert set(store._view_as_of(spark, sid1).columns) == old_cols
    # chain bookkeeping and resume survive the mixed-schema chain
    assert store.manifest(sid2)["parent_id"] == sid1
    assert (store.completed_tile_keys(spark).count()
            == a2.select("zoom", "tile_x", "tile_y").distinct().count())


def test_store_maintenance_lifecycle_end_to_end(spark, tmp_path):
    """The full maintenance cycle in one story: incremental commits ->
    compaction -> retention -> orphan GC, with the latest view
    byte-identical at every step and resume intact at the end."""
    store = TileStore(str(tmp_path / "store"))
    a1, a2 = _assigned(spark, 200), _assigned(spark, 500)
    encode_resumable(a1, store, "batch1")
    encode_resumable(a2, store, "batch2")
    want = {(r.zoom, r.tile_x, r.tile_y): bytes(r.mvt)
            for r in store.latest_view(spark).collect()}

    store.compact(spark, target_file_bytes=1 << 20)
    assert {(r.zoom, r.tile_x, r.tile_y): bytes(r.mvt)
            for r in store.latest_view(spark).collect()} == want

    expired = store.expire_snapshots(keep_last=1)
    assert len(expired) == 2  # both deltas behind the full snapshot
    assert {(r.zoom, r.tile_x, r.tile_y): bytes(r.mvt)
            for r in store.latest_view(spark).collect()} == want

    # a crashed write plus the GC; committed data untouched
    os.makedirs(os.path.join(store.root, "data", "snapshot=feedface"))
    assert store.remove_orphans() == ["feedface"]
    assert {(r.zoom, r.tile_x, r.tile_y): bytes(r.mvt)
            for r in store.latest_view(spark).collect()} == want

    # resume over the maintained store: nothing left to encode
    assert store.remaining_tiles(a2).isEmpty()


def test_delete_tombstones_latest_view_and_time_travel(spark, tmp_path):
    """commit_deletes (Iceberg v2 equality-delete shape): tombstoned
    keys vanish from the latest view and from snapshot_diff's new side
    (classified 'removed'), while time travel to the pre-delete
    snapshot still shows their bytes; a younger append re-adds a key."""
    store = TileStore(str(tmp_path / "store"))
    tiles = E.assemble_point_tiles_streaming(_assigned(spark, 300))
    s1 = store.commit_tiles(tiles, "batch1")
    pre = {(r.zoom, r.tile_x, r.tile_y): bytes(r.mvt)
           for r in store.latest_view(spark).collect()}
    doomed = sorted(pre)[:5]

    dkeys = spark.createDataFrame(
        [{"zoom": z, "tile_x": x, "tile_y": y} for z, x, y in doomed])
    dsid = store.commit_deletes(dkeys, "revoke 5 tiles")
    assert store.manifest(dsid)["operation"] == "delete"
    assert store.manifest(dsid)["metrics"]["keys_deleted"] == 5
    assert store.manifest(s1)["operation"] == "append"

    view = {(r.zoom, r.tile_x, r.tile_y): bytes(r.mvt)
            for r in store.latest_view(spark).collect()}
    assert set(view) == set(pre) - set(doomed)
    for k in view:
        assert view[k] == pre[k]
    # time travel BEFORE the delete: untouched
    old = {(r.zoom, r.tile_x, r.tile_y): bytes(r.mvt)
           for r in store._view_as_of(spark, s1).collect()}
    assert old == pre
    # diff across the delete: exactly the tombstoned keys are removed
    d = store.snapshot_diff(spark, s1, dsid).toPandas()
    removed = {(r.zoom, r.tile_x, r.tile_y)
               for r in d.itertuples() if r.change == "removed"}
    assert removed == set(doomed)
    assert (d.change == "same").sum() == len(pre) - 5

    # a younger append re-adds one deleted key (newest action wins)
    z, x, y = doomed[0]
    readd = store.read_tiles(spark, s1).filter(
        (F.col("zoom") == z) & (F.col("tile_x") == x)
        & (F.col("tile_y") == y)).drop("partition_id")
    store.commit_tiles(readd, "re-add 1 tile")
    view2 = {(r.zoom, r.tile_x, r.tile_y)
             for r in store.latest_view(spark).collect()}
    assert (z, x, y) in view2
    assert len(view2) == len(pre) - 4


def test_delete_does_not_resurrect_on_resume(spark, tmp_path):
    """Resume contract with deletes: a deliberately tombstoned key
    stays 'completed', so re-running the same plan encodes nothing."""
    store = TileStore(str(tmp_path / "store"))
    a = _assigned(spark, 300).cache()
    encode_resumable(a, store, "batch1")
    keys = store.latest_view(spark).select("zoom", "tile_x", "tile_y").limit(3)
    store.commit_deletes(keys, "revoke 3")
    assert store.remaining_tiles(a).count() == 0
    sid = encode_resumable(a, store, "resume after delete")
    assert store.read_tiles(spark, sid).count() == 0
    # and the deleted keys are STILL gone (no resurrection)
    assert store.latest_view(spark).count() == \
        store.completed_tile_keys(spark).count() - 3


def test_delete_compact_expire_is_the_hard_delete_path(spark, tmp_path):
    """delete -> compact -> expire: the compacted snapshot materializes
    the tombstones, and after expiry the revoked bytes are physically
    absent from every parquet file left on disk (GDPR revocation)."""
    import glob

    store = TileStore(str(tmp_path / "store"))
    store.commit_tiles(
        E.assemble_point_tiles_streaming(_assigned(spark, 300)), "batch1")
    pre = {(r.zoom, r.tile_x, r.tile_y): bytes(r.mvt)
           for r in store.latest_view(spark).collect()}
    doomed = sorted(pre)[:4]
    dsid = store.commit_deletes(spark.createDataFrame(
        [{"zoom": z, "tile_x": x, "tile_y": y} for z, x, y in doomed]),
        "revoke 4")

    csid = store.compact(spark)
    assert store.manifest(csid)["operation"] == "replace"
    got = {(r.zoom, r.tile_x, r.tile_y): bytes(r.mvt)
           for r in store.read_tiles(spark, csid).collect()}
    assert set(got) == set(pre) - set(doomed)

    expired = store.expire_snapshots(keep_last=1)
    assert dsid in expired
    assert not os.path.exists(store._deletes_path(dsid))
    # nothing on disk carries a revoked key anymore
    live = set()
    for f in glob.glob(os.path.join(store.root, "data", "snapshot=*",
                                    "part-*.parquet")):
        for r in (spark.read.parquet(f)
                  .select("zoom", "tile_x", "tile_y").collect()):
            live.add((r.zoom, r.tile_x, r.tile_y))
    assert live == set(pre) - set(doomed)
    # view unchanged by the maintenance
    assert {(r.zoom, r.tile_x, r.tile_y): bytes(r.mvt)
            for r in store.latest_view(spark).collect()} == got


def test_wap_stage_audit_publish(spark, tmp_path):
    """Write-audit-publish: a staged snapshot is fully written and
    auditable by sid but invisible to the table head, resume, and the
    orphan GC; publish promotes it atomically and is idempotent."""
    store = TileStore(str(tmp_path / "store"))
    a1 = _assigned(spark, 200).cache()
    s1 = encode_resumable(a1, store, "batch1")
    head_view = store.latest_view(spark).count()

    a2 = _assigned(spark, 500).cache()
    t2 = E.assemble_point_tiles_streaming(store.remaining_tiles(a2))
    staged = store.commit_tiles(t2, "batch2 (staged)", staged=True)
    assert store.current_snapshot() == s1
    assert store.latest_view(spark).count() == head_view
    assert store.remaining_tiles(a2).count() > 0  # staged != completed
    assert store.remove_orphans() == []           # manifest = liveness
    # audit the staged snapshot directly
    audit = store.read_tiles(spark, staged)
    assert audit.count() > 0
    assert store._view_as_of(spark, staged).count() > head_view

    assert store.publish(staged) == staged
    assert store.current_snapshot() == staged
    m = store.manifest(staged)
    assert m["staged"] is False and "published_ms" in m
    assert store.remaining_tiles(a2).count() == 0
    assert store.publish(staged) == staged  # idempotent


def test_wap_stale_parent_refused_and_abandon(spark, tmp_path):
    """A commit that lands after the stage makes the staged snapshot
    stale: publish refuses instead of silently dropping the commit;
    abandon removes the staged snapshot entirely and refuses on a
    published one."""
    import pytest

    store = TileStore(str(tmp_path / "store"))
    s1 = store.commit_tiles(
        E.assemble_point_tiles_streaming(_assigned(spark, 100)), "a")
    staged = store.commit_tiles(
        E.assemble_point_tiles_streaming(_assigned(spark, 200)),
        "b (staged)", staged=True)
    s2 = store.commit_tiles(
        E.assemble_point_tiles_streaming(_assigned(spark, 300)), "c")
    with pytest.raises(ValueError):
        store.publish(staged)
    store.abandon(staged)
    assert staged not in store.snapshots()
    assert not os.path.exists(store._data_path(staged))
    assert store.current_snapshot() == s2
    with pytest.raises(ValueError):
        store.abandon(s2)


def test_refresh_dirty_tiles_matches_full_rebuild(spark, tmp_path):
    """Incremental pyramid maintenance: apply a delta (inserts, deletes,
    moves) via refresh_dirty_tiles and require BYTE equality with a
    from-scratch rebuild of the new state, across two zooms."""
    from zellige_spark.plans.lineage import refresh_dirty_tiles

    zooms = [3, 6]
    old_pdf = synth.gen_images_pandas(0, 400)[["image_id", "lon", "lat"]]
    old = spark.createDataFrame(old_pdf)

    store = TileStore(str(tmp_path / "store"))
    t0 = E.assemble_point_tiles_streaming(
        T.assign_tiles_buffered(old, zooms=zooms))
    store.commit_tiles(t0, "v0", full=True)

    # delta: delete ids 0-49, insert 400-479, move 50-69 (shift lat)
    new_pdf = old_pdf[old_pdf.index >= 50].copy()
    moved = new_pdf["image_id"].isin(
        old_pdf["image_id"].iloc[50:70].tolist())
    new_pdf.loc[moved, "lat"] = new_pdf.loc[moved, "lat"] * 0.5 + 1.0
    ins_pdf = synth.gen_images_pandas(400, 480)[["image_id", "lon", "lat"]]
    import pandas as pd
    new_pdf = pd.concat([new_pdf, ins_pdf], ignore_index=True)
    new = spark.createDataFrame(new_pdf)
    # delta rows: deleted old positions + moved old positions + moved
    # new positions + inserted rows
    delta_pdf = pd.concat([
        old_pdf.iloc[0:70],                 # deletes 0-49 + moved-old 50-69
        new_pdf[new_pdf["image_id"].isin(
            old_pdf["image_id"].iloc[50:70].tolist())],  # moved-new
        ins_pdf,
    ], ignore_index=True)
    delta = spark.createDataFrame(delta_pdf)

    sid = refresh_dirty_tiles(store, new, delta, zooms)
    assert store.current_snapshot() == sid
    assert store.manifest(sid)["operation"] == "dirty-refresh"

    got = (store.latest_view(spark)
           .select("zoom", "tile_x", "tile_y", "mvt", "feature_count")
           .toPandas().sort_values(["zoom", "tile_x", "tile_y"],
                                   ignore_index=True))
    want = (E.assemble_point_tiles_streaming(
                T.assign_tiles_buffered(new, zooms=zooms))
            .select("zoom", "tile_x", "tile_y", "mvt", "feature_count")
            .toPandas().sort_values(["zoom", "tile_x", "tile_y"],
                                    ignore_index=True))
    assert len(got) == len(want)
    assert (got["feature_count"].to_numpy()
            == want["feature_count"].to_numpy()).all()
    assert (got["mvt"] == want["mvt"]).all()

    # the refresh actually skipped work: clean tiles were carried, not
    # re-encoded — verify at z6 some tiles exist that no delta row
    # touches (the carry path is live)
    dirty = (T.assign_tiles_buffered(delta, zooms=zooms)
             .select("zoom", "tile_x", "tile_y").distinct().count())
    assert dirty < len(want)


def test_abandon_stale_staged_collects_only_orphans(spark, tmp_path):
    """WAP-stage GC: a stage orphaned by a competing publish is
    collected; a fresh publishable stage survives; TTL collects it."""
    import time as _time

    from zellige_spark.plans.lineage import refresh_dirty_tiles  # noqa: F401

    store = TileStore(str(tmp_path / "store"))
    t0 = E.assemble_point_tiles_streaming(_assigned(spark, 200))
    base = store.commit_tiles(t0, "base")

    t1 = E.assemble_point_tiles_streaming(_assigned(spark, 250))
    orphan = store.commit_tiles(t1, "stage A", staged=True)
    # competing writer publishes: head moves past orphan's parent
    t2 = E.assemble_point_tiles_streaming(_assigned(spark, 300))
    head2 = store.commit_tiles(t2, "B")
    assert store.current_snapshot() == head2
    # a fresh stage on the NEW head
    fresh = store.commit_tiles(t1, "stage C", staged=True)

    gone = store.abandon_stale_staged()
    assert gone == [orphan]
    assert orphan not in store.snapshots()
    assert fresh in store.snapshots()
    assert not os.path.exists(store._data_path(orphan))

    # TTL sweep collects the fresh one too once it ages out
    _time.sleep(0.05)
    gone2 = store.abandon_stale_staged(older_than_ms=10)
    assert gone2 == [fresh]
    assert store.current_snapshot() == head2  # head untouched
    assert base in store.snapshots()
