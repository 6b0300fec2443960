"""Round-2 regressions: LSH-bucketed embedding dedup (no crossJoin),
adaptive k-ring kNN on sparse corpora, matmul-UDF ANN at dim=512,
JVM-only SimHash with its DuckDB oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# embed_cosine_dup: candidates->verify, no all-pairs join in the plan
# ---------------------------------------------------------------------------

def test_embed_cosine_dup_no_cartesian(spark):
    from zellige_spark.operators import similarity as SIM

    df = SIM.q_embed_cosine_dup(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # every injected cosine-1 pair (vec_id % 5 == 0 -> +1e6 copy) found
    pairs = {(r["vec_a"], r["vec_b"]) for r in df.collect()}
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    expected = {(v, v + 1000000) for v in range(0, n, 5)}
    assert expected <= pairs


# ---------------------------------------------------------------------------
# adaptive k-ring kNN: equality with brute force on a SPARSE corpus where
# any fixed small ring silently returns wrong/short results
# ---------------------------------------------------------------------------

def _sparse_world(spark, seed=7, n_data=30, n_queries=6):
    rng = np.random.default_rng(seed)
    data = [(f"d{i}", float(rng.uniform(-175, 175)), float(rng.uniform(-80, 80)))
            for i in range(n_data)]
    queries = [(f"q{i}", float(rng.uniform(-175, 175)), float(rng.uniform(-80, 80)))
               for i in range(n_queries)]
    d = spark.createDataFrame(data, "image_id string, lon double, lat double")
    q = spark.createDataFrame(queries, "query_id string, lon double, lat double")
    return q, d


def test_knn_adaptive_equals_brute_on_sparse(spark):
    from zellige_spark.operators import knn as KNN

    q, d = _sparse_world(spark)
    # 30 points over the whole globe at zoom 7 (~2.8 deg cells): ring 1
    # almost always finds < k candidates -> expansion is exercised
    adaptive = KNN.knn_kring_adaptive(q, d, k=5, index_zoom=7, start_ring=1,
                                      data_id="image_id")
    brute = KNN.knn_bruteforce(q, d, k=5, data_id="image_id")
    a = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in adaptive.collect()}
    b = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in brute.collect()}
    assert a == b
    # and the fixed small ring really is insufficient here (the case
    # the adaptive operator exists for)
    fixed = KNN.knn_kring(q, d, k=5, index_zoom=7, max_ring=1, data_id="image_id")
    f = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in fixed.collect()}
    assert f != b


def test_knn_adaptive_fewer_than_k_points(spark):
    from zellige_spark.operators import knn as KNN

    q = spark.createDataFrame([("q0", 10.0, 10.0)],
                              "query_id string, lon double, lat double")
    d = spark.createDataFrame([("d0", -120.0, -40.0), ("d1", 90.0, 60.0)],
                              "image_id string, lon double, lat double")
    out = KNN.knn_kring_adaptive(q, d, k=5, index_zoom=5, start_ring=1,
                                 data_id="image_id").collect()
    assert {r["neighbor_id"] for r in out} == {"d0", "d1"}  # all that exist


# ---------------------------------------------------------------------------
# ANN at dim=512: the matmul-UDF path must survive realistic dims
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dim512_dir(spark, tmp_path_factory):
    rng = np.random.default_rng(512)
    n, dim = 240, 512
    X = rng.standard_normal((n, dim)).astype(np.float32)
    rows = [(i, X[i].tolist(), "x") for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    d = tmp_path_factory.mktemp("dim512")
    df.coalesce(2).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_ann_lsh_dim512(spark, dim512_dir):
    from zellige_spark.operators import similarity as SIM

    brute = SIM.q_ann_bruteforce(spark, dim512_dir).collect()
    lsh = SIM.q_ann_lsh(spark, dim512_dir).collect()
    b = {(r["query_id"], r["neighbor_id"]) for r in brute}
    l = {(r["query_id"], r["neighbor_id"]) for r in lsh}
    assert len(b) == SIM.N_QUERIES * SIM.K
    # isotropic 512-dim: weakest case for sign-LSH; assert it functions
    # and recovers a solid share of the true top-k
    assert len(b & l) / len(b) >= 0.5


def test_ann_ivf_dim512(spark, dim512_dir):
    from zellige_spark.operators import similarity as SIM

    brute = SIM.q_ann_bruteforce(spark, dim512_dir).collect()
    ivf = SIM.q_ann_ivf(spark, dim512_dir).collect()
    b = {(r["query_id"], r["neighbor_id"]) for r in brute}
    v = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    assert len(b & v) / len(b) >= 0.4
    v2 = {(r["query_id"], r["neighbor_id"])
          for r in SIM.q_ann_ivf(spark, dim512_dir).collect()}
    assert v == v2  # deterministic


# ---------------------------------------------------------------------------
# SimHash: pure-JVM plan + DuckDB oracle equality at sf0.001
# ---------------------------------------------------------------------------

def test_phash_near_dup_matches_numpy(spark):
    from zellige_spark.operators import images as IMG

    rng = np.random.default_rng(99)
    base = [int(x) for x in rng.integers(-2**63, 2**63 - 1, 40, dtype=np.int64)]
    rows = [(f"i{k:03d}", p) for k, p in enumerate(base)]
    # inject near-dups at hamming 0..3 (flip 0-3 distinct bits)
    for k in (0, 5, 11, 17):
        flips = int(np.int64(0))
        for bit in range(k % 4):
            flips |= 1 << (7 * bit + 3)
        rows.append((f"i{k:03d}_dup", int(np.int64(base[k] ^ flips))))
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in IMG.phash_near_dup(df, max_hamming=3).collect()}
    # numpy brute force
    ids = [r[0] for r in rows]
    ph = np.array([r[1] for r in rows], dtype=np.int64).view(np.uint64)
    exp = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sorted((ids[i], ids[j]))
            h = bin(int(ph[i] ^ ph[j])).count("1")
            if h <= 3:
                exp.add((a, b, h))
    assert got == exp
    assert len(exp) >= 4  # every injected dup found


def test_bpe_regex_token_count_matches_python(spark):
    import math
    import re

    from zellige_spark.operators import text as TXT

    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    out = TXT.q_token_count(spark, SF).toPandas().set_index("doc_id")
    pat = re.compile(TXT._BPE_RE)
    for r in docs.head(100).itertuples():
        squashed = re.sub(r"\s+", " ", r.text.strip()).lower()
        runs = pat.findall(squashed)
        expected = sum(math.floor((len(t.strip()) + 3) / 4.0) for t in runs)
        assert out.loc[r.doc_id, "n_bpe_regex"] == expected, r.doc_id


def test_embed_quantize_roundtrip_error_bound(spark):
    from zellige_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = SIM.quantize_embeddings(emb).collect()
    src = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in emb.collect()}
    assert len(out) > 0
    for r in out:
        x = src[r["vec_id"]]
        q = np.asarray(r["qvec"], dtype=np.float64)
        deq = q * r["scale"] / 127.0
        # symmetric int8: reconstruction error <= half a quant step
        assert np.abs(deq - x).max() <= r["scale"] / 127.0 / 2 + 1e-12
        assert np.abs(q).max() <= 127


def test_audio_compressed_codec_raises(spark):
    # round 3 made WAV real (kernel/media.py); the remaining stub
    # surface is compressed codecs, which raise inside the UDF
    from zellige_spark.operators import images as IMG

    import pytest as _pytest
    df = spark.createDataFrame([("a0", b"\x00\x01", "mp3")],
                               "audio_id string, bytes binary, fmt string")
    with _pytest.raises(Exception, match="NotImplementedError|decoder library"):
        IMG.sample_audio_windows(df).collect()


def test_simhash_plan_has_no_python(spark):
    from zellige_spark.operators import dedup as DD

    sig = DD.simhash_signatures(DD._augmented(spark, SF))
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # Arrow/BatchEvalPythonExec absent


def test_simhash_matches_duckdb_oracle(spark):
    import duckdb

    from zellige_spark.operators import dedup as DD

    got = {(r["doc_a"], r["doc_b"], r["hamming"])
           for r in DD.q_dedup_simhash(spark, SF).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    exp = {tuple(t) for t in con.execute(DD.sql_dedup_simhash()).fetchall()}
    assert got == exp
    assert len(got) > 0
