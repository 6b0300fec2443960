"""Training-data operator tests: dedup families, similarity search,
text analysis, multimodal image pipeline, streaming windows."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_dedup_exact_finds_injected_dups(spark):
    from zellige_spark.operators import dedup as DD

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # inject literal duplicates
    dup = docs.withColumn("doc_id", F.col("doc_id") + 500000)
    (docs.unionAll(dup)).createOrReplaceTempView("documents")
    out = spark.sql(DD._AUG_SPARK).groupBy(F.md5("nt").alias("fp")) \
        .agg(F.count(F.lit(1)).alias("n")).toPandas()
    assert (out["n"] >= 2).all()  # every fingerprint now appears >= twice


def test_minhash_lsh_equals_exact_jaccard(spark):
    from zellige_spark.operators import dedup as DD

    exact = {(r["doc_a"], r["doc_b"])
             for r in DD.q_dedup_ngram_jaccard(spark, SF).collect()}
    lsh = {(r["doc_a"], r["doc_b"])
           for r in DD.q_dedup_minhash_lsh(spark, SF).collect()}
    assert len(exact) > 0  # injected truncations guarantee pairs
    assert lsh == exact


def test_simhash_blocks_find_truncated_pairs(spark):
    from zellige_spark.operators import dedup as DD

    out = DD.q_dedup_simhash(spark, SF).toPandas()
    # truncated copies (id+1e6) should pair with their originals
    matched = {(a, b) for a, b in zip(out["doc_a"], out["doc_b"])}
    originals_hit = {a for a, b in matched if b == a + 1000000}
    assert len(originals_hit) > 0
    assert (out["hamming"] <= 3).all()


def test_simhash_signature_is_deterministic(spark):
    from zellige_spark.operators import dedup as DD

    aug = DD._augmented(spark, SF).limit(20)
    s1 = DD.simhash_signatures(aug).toPandas().sort_values("doc_id", ignore_index=True)
    s2 = DD.simhash_signatures(aug).toPandas().sort_values("doc_id", ignore_index=True)
    assert (s1["simhash"] == s2["simhash"]).all()


def test_ann_lsh_recall_vs_bruteforce(spark):
    from zellige_spark.operators import similarity as SIM

    brute = SIM.q_ann_bruteforce(spark, SF).toPandas()
    lsh = SIM.q_ann_lsh(spark, SF).toPandas()
    b = {(r.query_id, r.neighbor_id) for r in brute.itertuples()}
    l = {(r.query_id, r.neighbor_id) for r in lsh.itertuples()}
    recall = len(b & l) / len(b)
    # isotropic random embeddings: 8x2-bit bands give ~0.98 per-pair
    # candidate recall; end-to-end top-5 set recall stays high
    assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_ann_ivf_recall_vs_bruteforce(spark):
    from zellige_spark.operators import similarity as SIM

    brute = SIM.q_ann_bruteforce(spark, SF).toPandas()
    ivf = SIM.q_ann_ivf(spark, SF).toPandas()
    b = {(r.query_id, r.neighbor_id) for r in brute.itertuples()}
    v = {(r.query_id, r.neighbor_id) for r in ivf.itertuples()}
    recall = len(b & v) / len(b)
    # random embeddings are the hard case for IVF (neighbors spread
    # across lists); 4-of-16 probes should still recover most of top-5
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # determinism: same centroids, same result
    v2 = {(r.query_id, r.neighbor_id) for r in SIM.q_ann_ivf(spark, SF).toPandas().itertuples()}
    assert v == v2


def test_lang_id_behavior(spark):
    from zellige_spark.operators import text as TXT

    out = TXT.q_lang_id(spark, SF).toPandas()
    # the synthetic corpus is random tech words (not natural language),
    # so accuracy vs the lang column is not meaningful; assert the
    # operator contract: valid labels, deterministic, and docs that DO
    # contain english stopwords classify as english
    assert set(out["pred_lang"]) <= {"en", "de", "fr", "es", "und"}
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    merged = out.merge(docs, on="doc_id")
    has_the = merged["text"].str.contains(" the ")
    en_share = (merged.loc[has_the, "pred_lang"] == "en").mean()
    assert en_share > 0.9


def test_token_count_matches_python(spark):
    from zellige_spark.operators import text as TXT

    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    out = TXT.q_token_count(spark, SF).toPandas().set_index("doc_id")
    for r in docs.itertuples():
        expected = len(r.text.split())
        assert out.loc[r.doc_id, "n_tokens"] == expected, r.doc_id


def test_image_pipeline_invariants(spark):
    from zellige_spark.operators import images as IMG

    out = IMG.q_image_pipeline(spark, SF).toPandas()
    assert len(out) == 400
    assert (out["phash_ok"] == 1).all()
    assert (out["caption_ok"] == 1).all()
    assert (out["psnr_ok"] == 1).all()


def test_resize_block_mean(spark):
    from zellige_spark import synth
    from zellige_spark.operators import images as IMG

    imgs = synth.images_df(spark, 12)
    out = IMG.resize_block_mean(imgs, 8, 8).toPandas()
    assert len(out) == 12
    for r in out.itertuples():
        assert r.w == 8 and r.h == 8
        assert len(bytes(r.bytes)) == 8 * 8 * 3


def test_video_stub_raises(spark):
    from zellige_spark.operators import images as IMG

    # jpeg (kernel/jpeg.py), wav and y4m (kernel/media.py) are REAL
    # since round 3; webp and compressed audio/video stay stubbed
    with pytest.raises(NotImplementedError):
        IMG.decode_any(b"xx", "webp", 4, 4)
    vids = spark.createDataFrame([("v0", b"xx", "mp4")],
                                 "video_id string, bytes binary, fmt string")
    with pytest.raises(Exception, match="NotImplementedError"):
        IMG.sample_video_frames(vids).collect()
    auds = spark.createDataFrame([("a0", b"xx", "mp3")],
                                 "audio_id string, bytes binary, fmt string")
    with pytest.raises(Exception, match="NotImplementedError"):
        IMG.sample_audio_windows(auds).collect()


def test_streaming_windows_match_batch(spark, tmp_path):
    import shutil
    from zellige_spark.streaming import events as EV

    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    spark.read.parquet(f"{SF}/events.parquet").write.parquet(src)
    q = EV.stream_event_windows(spark, src, ckpt)
    q.awaitTermination(120)
    got = spark.sql("select * from event_windows").toPandas() \
        .sort_values(["window_epoch", "event_type"], ignore_index=True)
    exp = EV.q_event_windows(spark, SF).toPandas() \
        .sort_values(["window_epoch", "event_type"], ignore_index=True)
    assert got.equals(exp)


def test_training_mix_matches_duckdb_and_is_deterministic(spark):
    import duckdb
    import numpy as np

    from zellige_spark.operators import text as TXT

    sf = "/root/testdata/sf0.001"
    sp = TXT.q_training_mix(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    du = con.execute(TXT.sql_training_mix()).fetchdf()
    assert len(sp) == len(du) > 0
    for c in ["doc_id", "pred_lang", "n_tokens", "mix_bucket"]:
        assert np.array_equal(sp[c].to_numpy(), du[c].to_numpy()), c
    # reproducible row-for-row (hash sampling, no RNG)
    again = TXT.q_training_mix(spark, sf).toPandas()
    assert np.array_equal(sp["doc_id"].to_numpy(), again["doc_id"].to_numpy())
    # quality gate actually filters and sampling actually drops rows
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert 0 < len(sp) < n_docs
    # sub-unit rates downsample their language deterministically:
    # every kept row's bucket is under its language's rate
    rate = sp.pred_lang.map(TXT.MIX_RATES).fillna(TXT.MIX_RATES["und"])
    assert (sp.mix_bucket.to_numpy() < rate.to_numpy()).all()


def test_sequence_pack_matches_duckdb_and_respects_cap(spark):
    import duckdb
    import numpy as np

    from zellige_spark.operators import text as TXT

    sf = "/root/testdata/sf0.001"
    sp = TXT.q_sequence_pack(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    du = con.execute(TXT.sql_sequence_pack()).fetchdf()
    assert len(sp) == len(du) > 0
    for c in ["doc_id", "bucket", "n_tokens", "seq_idx"]:
        assert np.array_equal(sp[c].to_numpy(), du[c].to_numpy()), c
    # every packed sequence respects the capacity unless it holds a
    # single over-cap document
    fills = sp.groupby(["bucket", "seq_idx"]).agg(
        total=("n_tokens", "sum"), n=("doc_id", "count"))
    over = fills[fills.total > TXT.PACK_CAP]
    assert (over.n == 1).all()
    # packing is dense: multiple docs per sequence on this corpus
    assert (fills.n > 1).any()
    # doc order within a (bucket, seq) is contiguous in doc_id order
    for (_b, _s), grp in sp.groupby(["bucket", "seq_idx"]):
        assert grp.doc_id.is_monotonic_increasing


def test_pii_scrub_handcrafted(spark):
    """Every PII class is replaced by its typed token, counts bill each
    hit to exactly one class (emails scrubbed BEFORE phones so a digit
    run inside an email local part is never double-billed), and clean
    text passes through untouched."""
    from zellige_spark.operators.text import pii_scrub

    rows = [
        (0, "mail me at jane.doe+spam@sub.example.org today"),
        (1, "server 192.168.10.254 and backup 10.0.0.7 are up"),
        (2, "call +44 20 7946 0958 or +1 555 867 5309"),
        (3, "plain caption, nothing sensitive in 2024"),
        (4, "x +15558675309@relay.example.com y"),  # email wins, no phone
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}

    assert out[0]["scrubbed"] == "mail me at <EMAIL> today"
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (1, 0, 0)
    assert out[1]["scrubbed"] == "server <IP> and backup <IP> are up"
    assert out[1]["n_ipv4"] == 2
    assert out[2]["scrubbed"] == "call <PHONE> or <PHONE>"
    assert out[2]["n_phone"] == 2
    assert out[3]["scrubbed"] == rows[3][1]
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 0)
    assert out[4]["scrubbed"] == "x <EMAIL> y"
    assert (out[4]["n_email"], out[4]["n_phone"]) == (1, 0)


def test_pii_scrub_query_matches_duckdb(spark):
    """Value-exact parity of the full planted-PII driver query vs the
    DuckDB oracle at sf0.001 (the driver gate re-checks at sf0.01)."""
    import duckdb
    from zellige_spark.operators.text import q_pii_scrub, sql_pii_scrub

    sdf = (q_pii_scrub(spark, SF).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    odf = (con.execute(sql_pii_scrub()).df()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(sorted(sdf.columns)) == list(sorted(odf.columns))
    for c in sdf.columns:
        assert (sdf[c] == odf[c]).all(), c
    # every planted class fires on its quarter of the corpus
    assert (sdf["n_email"] >= (sdf["doc_id"] % 4 == 0)).all()
    assert sdf["n_phone"].sum() >= (sdf["doc_id"] % 4 == 1).sum()
    assert sdf["n_ipv4"].sum() >= (sdf["doc_id"] % 4 == 2).sum()
