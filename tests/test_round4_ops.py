"""Round-4 regressions: exact int64 fids through the Arrow->pandas
boundary, training-mix hash overflow safety, GIF frame-rect validation,
scale-shaped sequence packing, IVF list-count scaling, and the
banded-pairs hot-bucket guard."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

SMALL = "/root/reference/test/integration/small.json"


# ---------------------------------------------------------------------------
# fids >= 2^53 survive the pandas boundary exactly in ALL tile strategies
# ---------------------------------------------------------------------------

def test_feature_tiles_huge_fids_exact(spark):
    """A top-level nullable long crosses Arrow->pandas as float64 when a
    batch holds a null; at 2^60 the float spacing is 256, so BIG/BIG+1/
    BIG+2 would collapse to one value — corrupting both the fid-sorted
    property order and the encoded MVT feature ids.  The miss/value
    split must keep them exact in every assembly strategy."""
    from zellige_spark import io_geojson
    from zellige_spark.kernel import mvt as kmvt
    from zellige_spark.operators import feature_tiles as FT

    base = io_geojson.read_geojson(spark, SMALL).collect()[0]
    BIG = 2 ** 60
    rows = [(BIG + 2, base["geom_type"], base["parts"], json.dumps({"k": "c"})),
            (BIG + 1, base["geom_type"], base["parts"], json.dumps({"k": "b"})),
            (BIG, base["geom_type"], base["parts"], json.dumps({"k": "a"})),
            (None, base["geom_type"], base["parts"], json.dumps({"k": "n"}))]
    feats = spark.createDataFrame(rows, io_geojson.FEATURES_SCHEMA)
    assigned = FT.assign_feature_tiles(feats, zoom=15, extent=2048)

    def pdf_of(df):
        return (df.toPandas()
                  .sort_values(["zoom", "tile_x", "tile_y"], ignore_index=True))

    grouped = pdf_of(FT.assemble_feature_tiles(assigned, layer_name="demo",
                                               extent=2048))
    streamed = pdf_of(FT.assemble_feature_tiles_streaming(
        assigned, layer_name="demo", extent=2048, num_partitions=3))
    salted = pdf_of(FT.assemble_feature_tiles_salted(
        assigned, layer_name="demo", extent=2048, salt=3))
    assert len(grouped) == len(streamed) == len(salted) > 0
    for a, b, c in zip(grouped["mvt"], streamed["mvt"], salted["mvt"]):
        assert bytes(a) == bytes(b) == bytes(c)

    hit = grouped[grouped["feature_count"] == 4]
    assert len(hit) >= 1
    layer = kmvt.decode_tile(bytes(hit.iloc[0]["mvt"]))["demo"]
    ids = [f["id"] for f in layer["features"]]
    # null fid -> counter id 1 first, then the exact huge ids in order
    assert ids == [1, BIG, BIG + 1, BIG + 2]
    # property order follows the exact fid sort (a float key would tie)
    ks = [f["metadata"]["k"][1] for f in layer["features"]]
    assert ks == ["n", "a", "b", "c"]


# ---------------------------------------------------------------------------
# training-mix hash stays in int64 for 10^12-scale doc ids
# ---------------------------------------------------------------------------

def test_mix_hash_no_int64_overflow():
    """doc_id * 2654435761 overflows int64 once doc_id > ~3.47e9 (Spark
    wraps negative => keep-all; DuckDB raises).  The masked form must be
    non-negative and engine-identical for huge and negative ids."""
    import duckdb

    from zellige_spark.operators.text import _MIX_HASH

    ids = [0, 1, 999, 2 ** 31 - 1, 2 ** 31, 2 ** 40, 2 ** 62, -5, -(2 ** 40)]
    con = duckdb.connect()
    for i in ids:
        v = con.execute(
            f"SELECT {_MIX_HASH} FROM (SELECT CAST({i} AS BIGINT) AS doc_id)"
        ).fetchone()[0]
        assert 0 <= v < 1000, (i, v)
        # pure-python reference of the same expression
        ref = (((i % 2147483648 + 2147483648) % 2147483648) * 2654435761) % 1000
        assert v == ref, (i, v, ref)


def test_training_mix_huge_doc_ids(spark):
    """End-to-end: huge doc_ids actually downsample (the overflow bug
    made hash negative => every row kept)."""
    from zellige_spark.operators.text import MIX_RATES, _MIX_HASH

    n = 2000
    base = 2 ** 40
    df = spark.range(n).select((F.lit(base) + F.col("id")).alias("doc_id"))
    kept = df.filter(F.expr(_MIX_HASH) < F.lit(MIX_RATES["de"])).count()
    # rate 500/1000: the Knuth multiply spreads the masked ids ~uniformly
    assert 0.35 * n < kept < 0.65 * n


# ---------------------------------------------------------------------------
# GIF: frame rect outside the logical screen fails cleanly
# ---------------------------------------------------------------------------

def test_gif_frame_rect_outside_screen_raises_giferror():
    from zellige_spark.kernel import gif as kgif

    # build a valid 2x2 single-frame GIF, then corrupt the image
    # descriptor's width to 3 (left 0 + w 3 > W 2)
    frame = np.zeros((2, 2), dtype=np.uint8)
    palette = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    data = bytearray(kgif.encode_gif([frame], palette))
    idx = data.index(0x2C, 13)  # image separator
    import struct

    left, top, w, h = struct.unpack("<HHHH", bytes(data[idx + 1:idx + 9]))
    assert (w, h) == (2, 2)
    data[idx + 5:idx + 7] = struct.pack("<H", 3)
    with pytest.raises(kgif.GifError, match="outside logical screen"):
        kgif.decode_gif(bytes(data))


# ---------------------------------------------------------------------------
# sequence packing: scale-shaped (streaming fold, corpus-derived shards)
# ---------------------------------------------------------------------------

def test_pack_buckets_scales_with_corpus():
    from zellige_spark.operators import text as TXT

    assert TXT.pack_buckets(0) == 8
    assert TXT.pack_buckets(500) == 8            # floor: tiny corpora
    assert TXT.pack_buckets(8 * 4096) == 8
    assert TXT.pack_buckets(8 * 4096 + 1) == 9   # grows past the floor
    assert TXT.pack_buckets(10 ** 12) == -(-10 ** 12 // 4096)  # ~2.4e8 shards
    # no shard ever holds more than ~PACK_TARGET_DOCS docs
    for n in (10 ** 6, 10 ** 9, 10 ** 12):
        assert n / TXT.pack_buckets(n) <= TXT.PACK_TARGET_DOCS


def test_pack_fold_carry_equals_single_batch():
    """The fold-with-carry over many tiny batches must equal one big
    batch — proves no state is lost at Arrow-batch boundaries and peak
    residency is O(batch), not O(shard)."""
    import pandas as pd

    from zellige_spark.operators import text as TXT

    rng = np.random.default_rng(7)
    n = 5000
    pdf = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "n_tokens": rng.integers(1, 300, n).astype(np.int64),
        "bucket": np.repeat(np.arange(5, dtype=np.int32), n // 5),
    })
    whole = pd.concat(TXT._pack_batches([pdf]), ignore_index=True)
    split = pd.concat(
        TXT._pack_batches([pdf.iloc[i:i + 37] for i in range(0, n, 37)]),
        ignore_index=True)
    assert whole.equals(split)
    # over-cap single docs open their own sequence; others respect cap
    fills = whole.groupby(["bucket", "seq_idx"]).agg(
        total=("n_tokens", "sum"), cnt=("doc_id", "count"))
    assert (fills[fills.total > TXT.PACK_CAP].cnt == 1).all()


def test_sequence_pack_multibatch_spark_matches_oracle(spark):
    """Force tiny Arrow batches so every shard spans MANY batches in the
    mapInPandas fold, then hash-compare against the DuckDB oracle — the
    distributed carry path, not just the unit fold."""
    import duckdb

    from zellige_spark.operators import text as TXT

    sf = "/root/testdata/sf0.001"
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "17")
    try:
        sp = TXT.q_sequence_pack(spark, sf).toPandas()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    du = con.execute(TXT.sql_sequence_pack()).fetchdf()
    assert len(sp) == len(du) > 0
    for c in ["doc_id", "bucket", "n_tokens", "seq_idx"]:
        assert np.array_equal(sp[c].to_numpy(), du[c].to_numpy()), c


# ---------------------------------------------------------------------------
# IVF: list count scales with corpus size (the round-3 verdict's last
# quadratic-in-disguise)
# ---------------------------------------------------------------------------

def test_ivf_params_scales_with_corpus():
    from zellige_spark.operators import similarity as SIM

    assert SIM.ivf_params(100).lists == 16          # floor
    assert SIM.ivf_params(100_000).lists == 316     # ~sqrt(n)
    assert SIM.ivf_params(10 ** 12).lists == SIM.IVF_MAX_LISTS
    for n in (100, 10 ** 5, 10 ** 9, 10 ** 12):
        p = SIM.ivf_params(n)
        assert p.sample <= 65536 and p.sample >= min(1024, 8 * p.lists)
        assert p.nprobe == SIM.IVF_NPROBE


@pytest.fixture(scope="module")
def big_emb_dir4(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    n, dim = 100_000, 64
    rng = np.random.default_rng(424242)
    X = rng.standard_normal((n, dim)).astype(np.float32)
    offsets = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    emb = pa.ListArray.from_arrays(offsets, pa.array(X.ravel()))
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": emb})
    d = tmp_path_factory.mktemp("big_emb4")
    pq.write_table(t, str(d / "emb.parquet"))
    return str(d / "emb.parquet"), n, dim


def test_ivf_candidates_sublinear_at_1e5(spark, big_emb_dir4):
    """With lists ~ sqrt(n), per-query candidates are ~nprobe*sqrt(n);
    the old constant 16 lists re-ranked ~n/4 per query (5e5 rows here
    for 20 queries x 1e5 vectors)."""
    from zellige_spark.operators import similarity as SIM

    path, n, dim = big_emb_dir4
    emb = spark.read.parquet(path)
    p = SIM.ivf_params(n)
    C = SIM._ivf_centroids(spark, emb, k=p.lists, sample=p.sample)
    cands = SIM.ivf_candidate_pairs(emb, C, p.nprobe).count()
    # balanced lists => N_QUERIES*nprobe*n/lists ~ 25k; allow 8x skew
    assert 0 < cands <= 8 * SIM.N_QUERIES * p.nprobe * (n // p.lists)
    # hard sublinearity vs the constant-16-list candidate mass
    assert cands < SIM.N_QUERIES * n // 8


# ---------------------------------------------------------------------------
# banded_pairs hot-bucket guard
# ---------------------------------------------------------------------------

def test_banded_pairs_hot_bucket_exact_set(spark):
    """Over-cap buckets take the chunked-cell expansion; the produced
    pair set must be EXACTLY the full in-bucket pair set."""
    import itertools

    from zellige_spark.operators.dedup import banded_pairs

    rows = ([(i, 0, 7) for i in range(50)]          # over-cap bucket (m=50)
            + [(100 + i, 1, 9) for i in range(5)]   # normal bucket
            + [(i, 2, 11) for i in (1, 2)])         # tiny bucket, overlapping ids
    df = spark.createDataFrame(rows, "doc_id long, band int, sig_hash long")
    got = {(r["id_a"], r["id_b"])
           for r in banded_pairs(df, "doc_id", cap=8).collect()}
    exp = (set(itertools.combinations(range(50), 2))
           | set(itertools.combinations(range(100, 105), 2))
           | {(1, 2)})
    assert got == exp


def test_banded_pairs_degenerate_bucket_bounded(spark):
    """Thousands of near-identical docs landing in ONE band bucket (the
    simhash/phash worst case) must stream through bounded cell rows —
    no m^2/2-element array in any single row."""
    from zellige_spark.operators.dedup import banded_pairs

    n = 10_000
    df = spark.range(n).select(F.col("id").alias("doc_id"),
                               F.lit(0).alias("band"),
                               F.lit(42).alias("sig_hash"))
    cnt = banded_pairs(df, "doc_id", cap=64).count()
    assert cnt == n * (n - 1) // 2


# ---------------------------------------------------------------------------
# real-JPEG lossy leg + raster integrity columns
# ---------------------------------------------------------------------------

def test_image_pipeline_jpeg_rows_real_codec(spark):
    """jpeg-format rows run the REAL baseline-JPEG round-trip for the
    lossy leg and still satisfy every invariant (phash over decoded
    pixels, caption, PSNR >= 40 on the second-generation re-encode)."""
    from zellige_spark.operators import images as IM

    out = IM.q_image_pipeline(spark, "/root/testdata/sf0.001").toPandas()
    jp = out[out.fmt == "jpeg"]
    assert len(jp) == 100 and len(out) == 400
    assert jp.phash_ok.all() and jp.caption_ok.all() and jp.psnr_ok.all()
    other = out[out.fmt != "jpeg"]
    assert other.phash_ok.all() and other.psnr_ok.all()


def test_raster_vector_integrity_columns(spark):
    """The in-job verification columns must be green: rect-cover area
    equals the thresholded mask popcount, and the emitted protobuf
    decodes back to feature_count polygons."""
    from zellige_spark import queries as Q

    out = Q.QUERIES["raster_vector"](spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) > 0
    assert out.parity_ok.all()
    assert out.roundtrip_ok.all()
    assert (out.mvt_features == out.feature_count).all()
    assert (out.mask_cells > 0).any()


# ---------------------------------------------------------------------------
# S2 triple equality (Column == numpy kernel == DuckDB CTE) on
# hypothesis-driven adversarial points near face edges at level 14
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_s2_triple_equality_near_face_edges(spark, data):
    """Adversarial manifolds beyond the fixed edge-point pins: points a
    hair off the cube-face meridians (lon = +-45/+-135 +- delta) and
    off the polar-face boundary curve (tan|lat| = max(|cos lon|,
    |sin lon|)), at level 14.  Offsets stay >= 1e-9 deg: ON-lattice
    diagonals are engine-dependent within 1 ulp by design (see
    kernel/s2.py notes), while 1e-9 deg is ~1e5 ulps of margin."""
    import duckdb
    import pandas as pd

    from zellige_spark.kernel import s2 as K
    from zellige_spark.operators import s2cells as S2C

    level = 14
    seed = data.draw(st.integers(0, 2 ** 31 - 1))
    deltas = data.draw(st.lists(
        st.floats(min_value=1e-9, max_value=1e-3, allow_nan=False),
        min_size=6, max_size=6))
    signs = data.draw(st.lists(st.sampled_from([-1.0, 1.0]),
                               min_size=6, max_size=6))
    rng = np.random.default_rng(seed)
    lons, lats = [], []
    for d, s in zip(deltas, signs):
        for base in (-135.0, -45.0, 45.0, 135.0):
            lons.append(base + s * d)
            lats.append(float(rng.uniform(-89.9, 89.9)))
        lon = float(rng.uniform(-180.0, 180.0))
        t = np.radians(lon)
        blat = float(np.degrees(np.arctan(
            max(abs(np.cos(t)), abs(np.sin(t))))))
        for pm in (1.0, -1.0):
            lons.append(lon)
            lats.append(pm * (blat + s * d))
    pdf = pd.DataFrame({"id": np.arange(len(lons), dtype=np.int64),
                        "lon": lons, "lat": lats})

    # Column twin
    sp = (S2C.with_s2_cell(spark.createDataFrame(pdf), level)
          .select("id", "s2_face", "s2_pos", "s2_cid")
          .orderBy("id").toPandas())
    # numpy kernel
    face, _i, _j, pos = K.lonlat_to_cell(pdf.lon.to_numpy(),
                                         pdf.lat.to_numpy(), level)
    cid = K.cid_pack(face, pos, level)
    # DuckDB CTE twin
    con = duckdb.connect()
    con.register("pts_df", pdf)
    q = (f"WITH _pts AS (SELECT id, lon, lat FROM pts_df), "
         f"{S2C.sql_s2_cell_cte('_pts', level, 'id')} "
         f"SELECT id, s2_face, s2_pos, s2_cid FROM _s2_out ORDER BY id")
    du = con.execute(q).fetchdf()

    assert np.array_equal(sp.s2_face.to_numpy(), face)
    assert np.array_equal(sp.s2_pos.to_numpy(), pos)
    assert np.array_equal(sp.s2_cid.to_numpy(), cid)
    assert np.array_equal(du.s2_face.to_numpy().astype(np.int64), face.astype(np.int64))
    assert np.array_equal(du.s2_pos.to_numpy().astype(np.int64), pos.astype(np.int64))
    assert np.array_equal(du.s2_cid.to_numpy().astype(np.int64), cid.astype(np.int64))


# ---------------------------------------------------------------------------
# PNG decoder: all five filter types (spec-complete for 8-bit RGB)
# ---------------------------------------------------------------------------

def test_png_all_filter_types_decode():
    """Hand-build PNGs whose scanlines use Sub/Up/Average/Paeth and
    check decode against a straightforward per-byte reference."""
    import struct
    import zlib

    from zellige_spark import synth

    rng = np.random.default_rng(11)
    h, w = 6, 5
    px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    for ftype in (0, 1, 2, 3, 4):
        flat = px.reshape(h, w * 3).astype(int)
        raws = bytearray()
        prev = [0] * (w * 3)
        for r in range(h):
            line = list(flat[r])
            enc = []
            for i in range(w * 3):
                a = line[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2,
                        4: paeth(a, b, c)}[ftype]
                enc.append((line[i] - pred) % 256)
            raws.append(ftype)
            raws.extend(enc)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (b"\x89PNG\r\n\x1a\n"
                + synth._png_chunk(b"IHDR", ihdr)
                + synth._png_chunk(b"IDAT", zlib.compress(bytes(raws)))
                + synth._png_chunk(b"IEND", b""))
        out = synth.decode_png(data)
        assert np.array_equal(out, px), f"filter {ftype}"


# ---------------------------------------------------------------------------
# IVF-PQ: compression shape, determinism, truthful recall column, floor
# ---------------------------------------------------------------------------

def test_pq_codebooks_and_codes_shape(spark):
    from zellige_spark.operators import similarity as SIM

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = SIM._pq_codebooks(spark, emb)
    dim = len(emb.select("embedding").first()["embedding"])
    assert books.shape == (SIM.PQ_M, SIM.PQ_K, dim // SIM.PQ_M)
    codes = (emb.limit(50)
                .select(SIM.pq_encode_udf(books)(F.col("embedding")).alias("c"))
                .toPandas())
    for c in codes.c:
        arr = np.asarray(c)
        assert arr.shape == (SIM.PQ_M,)
        assert ((arr >= 0) & (arr < SIM.PQ_K)).all()
    # the memory claim: PQ_M bytes vs dim float32s per vector
    assert SIM.PQ_M * 1 < dim * 4 / 8


def test_ann_ivfpq_recall_column_truthful_and_floor(spark):
    from zellige_spark.operators import similarity as SIM

    sf = "/root/testdata/sf0.001"
    a1 = SIM.q_ann_ivfpq(spark, sf).collect()
    a2 = SIM.q_ann_ivfpq(spark, sf).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a2))  # deterministic
    brute = SIM.q_ann_bruteforce(spark, sf).collect()
    b = {}
    for r in brute:
        b.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    a = {}
    for r in a1:
        a.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    per_q = {q: len(a.get(q, set()) & nb) / len(nb) for q, nb in b.items()}
    for r in a1:
        assert r["recall_e3"] == int(per_q[r["query_id"]] * 1000 // 1)
    mean = sum(per_q.values()) / len(per_q)
    # 8-byte codes + 20-deep exact re-rank on a 25%-probed isotropic
    # corpus: well above random (K/n ~ 0.01), below raw-vector IVF
    assert mean >= 0.4, mean


# ---------------------------------------------------------------------------
# deterministic image augmentation
# ---------------------------------------------------------------------------

def test_augment_images_group_laws_and_payloads(spark):
    from zellige_spark import synth
    from zellige_spark.operators import images as IM

    imgs = synth.images_df(spark, 12)
    out = IM.augment_images(imgs).toPandas()
    assert len(out) == 12 * len(IM.AUG_OPS)
    assert out.aug_ok.all()
    # payloads decode and match a driver-side recompute per op
    src = {r.image_id: synth.decode_image(bytes(r.bytes), r.fmt, r.w, r.h)
           for r in imgs.toPandas().itertuples(index=False)}
    for r in out.itertuples(index=False):
        px = np.frombuffer(bytes(r.bytes), dtype=np.uint8).reshape(r.h, r.w, 3)
        exp = np.ascontiguousarray(IM._apply_aug(src[r.image_id], r.aug))
        assert np.array_equal(px, exp), (r.image_id, r.aug)
        assert synth.average_phash(px) == r.phash
    # rotations swap dims; flips keep them
    pdfm = out.merge(imgs.toPandas()[["image_id", "w", "h"]],
                     on="image_id", suffixes=("", "_src"))
    rot = pdfm[pdfm.aug.isin(["rot90", "rot270"])]
    assert (rot.w == rot.h_src).all() and (rot.h == rot.w_src).all()


def test_image_augment_driver_query(spark):
    from zellige_spark import queries as Q

    out = Q.QUERIES["image_augment"](spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) == 150 * 6
    assert (out.aug_ok == 1).all()


def test_ring_fanout_guards():
    from zellige_spark.operators import hexgrid as HX

    with pytest.raises(ValueError, match="coarser index level"):
        HX.ring_offsets(600)
    assert len(HX.ring_offsets(5)) == 91
