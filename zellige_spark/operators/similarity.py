"""Similarity search over the ``embeddings`` table (vec_id,
embedding array<float>, label) — ANN for training-data pipelines.

* ``q_ann_bruteforce`` — exact cosine top-k with broadcast queries; the
  dot product runs JVM-side via higher-order functions
  (zip_with/aggregate), no Python in the scoring loop.  Oracle-checked
  against DuckDB's list_cosine_similarity.
* ``q_ann_lsh`` — random-hyperplane LSH bucketing as the scale path:
  sign-bit signatures over D deterministic hyperplanes, multi-probe on
  band buckets, exact re-rank of candidates.  Recall measured in pytest
  against brute force (no SQL oracle — hyperplanes aren't expressible).
* ``q_embed_cosine_dup`` — embedding near-duplicate pairs
  (cosine >= threshold), oracle-checked.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from ..io_scan import read_sf

K = 5
N_QUERIES = 20
DUP_COS = 0.95
# Small-corpus signature shape: 16 sign-bit planes split into 8 bands
# x 2 bits.  The test corpus is isotropic random (top-5 cosine ~0.36
# => per-plane agreement p~0.62), so recall needs short bands:
# 1-(1-p^2)^8 ~ 0.98.  NEVER use this shape on a large corpus — 2-bit
# bands mean 4 buckets/band, so the band self-join degenerates to
# ~N^2/8 candidate pairs.  ``lsh_params`` below scales the shape with
# corpus size; these constants are only the n <= SMALL_CORPUS leg.
LSH_PLANES = 16
LSH_BAND_BITS = 2
LSH_N_BANDS = LSH_PLANES // LSH_BAND_BITS

# Above this corpus size the signature widens to ceil(log2(n))-bit
# bands (capped at 16 so 4 bands still pack into one int64) with
# Hamming-1 multi-probe (Lv et al., multi-probe LSH) recovering the
# recall that wide bands cost.  16384 = the largest n where even the
# worst small-shape case (4 buckets/band -> n^2/8 candidates) stays
# around ~2k candidates/row — beyond it the wide shape is strictly
# better on any distribution.
SMALL_CORPUS = 16384


class LshParams(NamedTuple):
    planes: int
    band_bits: int
    n_bands: int
    probe: bool  # Hamming-1 multi-probe on the query/left side


def lsh_params(n: int) -> LshParams:
    """Signature shape derived from corpus size so candidate volume
    stays O(n): with b-bit bands a random (isotropic) pair collides in
    one band w.p. 2^-b, so expected candidates ~ L * n^2 / 2^(b+1);
    choosing b ~ log2(n) makes that ~L*n/2.  Recall at wide bands comes
    from Hamming-1 multi-probe: a cos-0.95 pair (per-plane agreement
    p=0.899) survives a 16-bit band w.p. p^16 + 16*p^15*(1-p) ~ 0.51,
    so 4 probed bands give pair recall ~0.94 (vs 0.55 unprobed).
    Candidate-count linearity is pinned by
    ``tests/test_round3_ops.py::test_lsh_candidates_linear_at_1e5``."""
    if n <= SMALL_CORPUS:
        return LshParams(LSH_PLANES, LSH_BAND_BITS, LSH_N_BANDS, False)
    band_bits = min(16, max(8, math.ceil(math.log2(max(n, 2)))))
    n_bands = max(4, 64 // band_bits)
    return LshParams(n_bands * band_bits, band_bits, n_bands, True)


def _dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"


def _norm(a: str) -> str:
    return f"sqrt({_dot(a, a)})"


def _cosine(a: str, b: str) -> str:
    return f"({_dot(a, b)} / ({_norm(a)} * {_norm(b)}))"


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First N_QUERIES vec_ids as queries; exact top-K neighbors by
    cosine among all other vectors."""
    emb = read_sf(spark, sf_dir, "embeddings", spread=True)
    q = F.broadcast(emb.filter(F.col("vec_id") < N_QUERIES)
                       .select(F.col("vec_id").alias("query_id"),
                               F.col("embedding").alias("qv")))
    d = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("dv"))
    scored = (q.crossJoin(d)
               .filter(F.col("query_id") != F.col("neighbor_id"))
               .withColumn("cos", F.expr(_cosine("qv", "dv"))))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= K)
                  .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank")))


def sql_ann_bruteforce() -> str:
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
    ), d AS (
      SELECT vec_id AS neighbor_id, embedding AS dv FROM embeddings
    ), scored AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY list_cosine_similarity(qv, dv) DESC,
                                         neighbor_id ASC) AS rank
      FROM q CROSS JOIN d WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
    FROM scored WHERE rank <= {K}
    """


def q_embed_cosine_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs over a corpus augmented with slightly
    noised copies (vec_id + 1_000_000, every element * 1.01 — a pure
    scaling keeps cosine == 1), so the oracle checks real pairs.

    Scale path: sign-LSH band buckets generate candidates (the same
    candidates->verify shape as dedup_minhash_lsh), exact cosine
    verifies — no crossJoin anywhere in the plan.  A cosine-1 pair has
    bit-identical signatures, so every injected dup is a candidate in
    every band; for borderline pairs (cos just above the 0.95
    threshold) the small-corpus 8x2-bit bands give per-pair candidate
    recall 1-(1-p^2)^8 ~ 1-2e-6 at p=cos->agreement 0.899; at scale
    the shape widens via ``lsh_params`` (log2(n)-bit bands + Hamming-1
    probe) so candidates stay O(n)."""
    emb = read_sf(spark, sf_dir, "embeddings", spread=True)
    emb.createOrReplaceTempView("embeddings")
    aug = spark.sql("""
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id,
               transform(embedding, x -> x * CAST(1.01 AS FLOAT)) AS embedding
        FROM embeddings WHERE vec_id % 5 = 0
    """)
    # parquet metadata count — aug adds ~n/5 noised copies
    n = emb.count()
    p = lsh_params(n + n // 5 + 1)
    dim = int(aug.select(F.size("embedding").alias("d")).first()["d"])
    sig = lsh_signature_udf(dim, p.planes)
    base = aug.select("vec_id", sig(F.col("embedding")).alias("sig"))
    cand = lsh_candidate_pairs(base, p)
    va = aug.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    vb = aug.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    return (cand.join(va, "vec_a").join(vb, "vec_b")
                .withColumn("cos", F.expr(_cosine("va", "vb")))
                .filter(F.col("cos") >= DUP_COS)
                .select("vec_a", "vec_b"))


def sql_embed_cosine_dup() -> str:
    return f"""
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(embedding, x -> CAST(x * CAST(1.01 AS FLOAT) AS FLOAT)) AS embedding
      FROM embeddings WHERE vec_id % 5 = 0
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= {DUP_COS}
    """


# ---------------------------------------------------------------------------
# embedding quantization (int8, symmetric per-vector scale)
# ---------------------------------------------------------------------------

_ABS_MAX = "array_max(transform(embedding, v -> abs(CAST(v AS DOUBLE))))"
# round-half-up via floor(x+0.5): deterministic and identical in Spark
# and DuckDB (their round() builtins disagree on halves)
_QVEC = (f"transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) / {_ABS_MAX}"
         f" * 127.0 + 0.5) AS INT))")


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization (the storage/transfer
    format ANN indexes serve at scale): q_i = round_half_up(x_i/s*127),
    s = max|x|.  Pure Column math; the driver compares integer
    summaries of the quantized vector (full arrays don't merge in the
    oracle harness) — sum/min/max pin every element through the hash."""
    emb = read_sf(spark, sf_dir, "embeddings", spread=True)
    return (emb.filter(F.expr(_ABS_MAX) > 0)
               .select("vec_id",
                       F.expr(f"aggregate({_QVEC}, 0L, (a, q) -> a + q)").alias("q_sum"),
                       F.expr(f"array_min({_QVEC})").cast("int").alias("q_min"),
                       F.expr(f"array_max({_QVEC})").cast("int").alias("q_max"),
                       F.expr(f"CAST(floor({_ABS_MAX} * 1000000000.0) AS BIGINT)")
                        .alias("scale_e9")))


def sql_embed_quantize() -> str:
    mx = "list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))))"
    qv = (f"list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) / {mx}"
          f" * 127.0 + 0.5) AS INT))")
    return f"""
    SELECT vec_id,
           CAST(list_sum({qv}) AS BIGINT) AS q_sum,
           CAST(list_min({qv}) AS INT) AS q_min,
           CAST(list_max({qv}) AS INT) AS q_max,
           CAST(floor({mx} * 1000000000.0) AS BIGINT) AS scale_e9
    FROM embeddings WHERE {mx} > 0
    """


def quantize_embeddings(emb: DataFrame) -> DataFrame:
    """(vec_id, scale double, qvec array<int>) — the full quantized
    column for storage; dequantize(q) = q * scale / 127."""
    return (emb.filter(F.expr(_ABS_MAX) > 0)
               .select("vec_id", F.expr(_ABS_MAX).alias("scale"),
                       F.expr(_QVEC).alias("qvec")))


def medoid_per_group(df: DataFrame, group_cols: list,
                     id_col: str = "vec_id",
                     vec_col: str = "qvec") -> DataFrame:
    """Per-group MEDOID over integer vectors: the member minimizing the
    sum of squared L2 distances to every member of its group (ties
    break to the smallest id) — "the representative image per tile",
    the selection step of corpus curation and per-cell thumbnailing.

    Scale plan — the classic sum-of-squares decomposition makes the
    medoid LINEAR, never a pairwise join:

        sum_b ||a - b||^2  =  k*||a||^2  -  2*(a . S)  +  Q

    with S = element-wise vector sum, Q = sum of squared norms, k =
    group size.  One dim-exploded partial-agg'd shuffle builds S
    (bounded by groups x dim), one agg builds (Q, k), one join brings
    the three stats back (group-stat side is groups-bounded — AQE
    broadcasts it), and per-member cost is O(dim) JVM Column math
    (`zip_with` dot against the joined S).  Everything is exact int64
    — the DuckDB oracle computes the LITERAL pairwise sum, so the
    gate proves the algebraic identity, not a shared implementation.

    Output: group_cols + (k, medoid_id, medoid_cost).
    """
    g = list(group_cols)
    base = df.select(*g, F.col(id_col).alias("_id"),
                     F.col(vec_col).alias("_v")).withColumn(
        "_n2", F.expr("aggregate(_v, 0L, (a, q) -> a + CAST(q AS BIGINT) * q)"))
    dimsum = (base.select(*g, F.posexplode("_v").alias("_i", "_q"))
              .groupBy(*g, "_i").agg(F.sum("_q").alias("_s")))
    svec = (dimsum.groupBy(*g)
            .agg(F.array_sort(F.collect_list(F.struct("_i", "_s")))
                 .getField("_s").alias("_sv")))
    qk = base.groupBy(*g).agg(F.sum("_n2").alias("_qq"),
                              F.count("*").alias("k"))
    stats = svec.join(qk, g)
    cost = (F.col("k") * F.col("_n2")
            - F.lit(2) * F.expr(
                "aggregate(zip_with(_v, _sv, (a, b) -> CAST(a AS BIGINT) * b),"
                " 0L, (acc, x) -> acc + x)")
            + F.col("_qq"))
    scored = base.join(stats, g).withColumn("_cost", cost)
    return (scored.groupBy(*g)
            .agg(F.min("k").alias("k"),
                 F.min(F.struct(F.col("_cost"), F.col("_id"))).alias("_m"))
            .select(*g, F.col("k"),
                    F.col("_m._id").alias("medoid_id"),
                    F.col("_m._cost").alias("medoid_cost")))


MED_GRID = 4   # tile grid side for the medoid driver query


def q_tile_medoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative image per tile: int8-quantize each embedding
    (the `embed_quantize` format), assign a 4x4 tile from the vec_id
    (independent moduli — no phase lock), and pick the per-tile
    medoid by exact integer squared L2 via the linear sum-of-squares
    decomposition.  The oracle recomputes the LITERAL pairwise cost
    matrix, proving the identity end to end."""
    emb = read_sf(spark, sf_dir, "embeddings", spread=True)
    df = (emb.filter(F.expr(_ABS_MAX) > 0)
          .select(F.expr("vec_id * 7919 % 360000 div 90000")
                  .alias("tile_x"),
                  F.expr("(vec_id * 104729 + 13) % 170000 div 42500")
                  .alias("tile_y"),
                  "vec_id", F.expr(_QVEC).alias("qvec")))
    return (medoid_per_group(df, ["tile_x", "tile_y"])
            .orderBy("tile_x", "tile_y"))


def sql_tile_medoid() -> str:
    mx = "list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))))"
    qv = (f"list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) / {mx}"
          f" * 127.0 + 0.5) AS INT))")
    return f"""
    WITH q AS (
      SELECT vec_id * 7919 % 360000 // 90000 AS tx,
             (vec_id * 104729 + 13) % 170000 // 42500 AS ty,
             vec_id, {qv} AS qvec
      FROM embeddings WHERE {mx} > 0
    ), cost AS (
      SELECT a.tx, a.ty, a.vec_id AS ia,
             SUM(list_aggregate(list_transform(list_zip(a.qvec, b.qvec),
                 p -> CAST(p[1] - p[2] AS BIGINT) * (p[1] - p[2])),
                 'sum')) AS c
      FROM q a JOIN q b ON a.tx = b.tx AND a.ty = b.ty
      GROUP BY 1, 2, 3
    ), kk AS (
      SELECT tx, ty, COUNT(*) AS k FROM q GROUP BY 1, 2
    ), sel AS (
      SELECT tx, ty, ia, c,
             row_number() OVER (PARTITION BY tx, ty ORDER BY c, ia) AS rn
      FROM cost
    )
    SELECT CAST(sel.tx AS BIGINT) AS tile_x, CAST(sel.ty AS BIGINT) AS tile_y,
           CAST(k AS BIGINT) AS k,
           CAST(ia AS BIGINT) AS medoid_id, CAST(c AS BIGINT) AS medoid_cost
    FROM sel JOIN kk ON kk.tx = sel.tx AND kk.ty = sel.ty
    WHERE rn = 1
    ORDER BY tile_x, tile_y
    """


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, planes: int = LSH_PLANES, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng([seed, 99])
    return rng.standard_normal((planes, dim))


def _stack(emb: pd.Series) -> np.ndarray:
    """Arrow hands fixed-dim list columns over as an object array of
    per-row ndarrays; stack to (n, dim) float64 for one BLAS matmul."""
    return np.stack(emb.to_numpy()).astype(np.float64, copy=False)


def lsh_signature_udf(dim: int, planes: int = LSH_PLANES, seed: int = 42):
    """Sign-bit signature as an Arrow-batched matrix multiply: one
    ``X @ H.T`` per batch against the broadcast (planes, dim) hyperplane
    matrix, bits packed into a long.  Replaces the inlined-literal SQL
    expression form, whose O(dim x planes) expression tree fell out of
    codegen at realistic dims (>= 512)."""
    H = _hyperplanes(dim, planes, seed)
    weights = (np.uint64(1) << np.arange(planes, dtype=np.uint64))

    @pandas_udf("long")
    def sig(emb: pd.Series) -> pd.Series:
        X = _stack(emb)
        bits = (X @ H.T) > 0.0
        vals = (bits.astype(np.uint64) * weights).sum(axis=1)
        return pd.Series(vals.astype(np.int64))

    return sig


def _explode_bands(df: DataFrame, sig_col: str, p: LshParams,
                   probe: bool = False) -> DataFrame:
    """(vec_id, band, bucket) rows — one per signature band, plus the
    ``band_bits`` Hamming-1 probe buckets per band when ``probe``.

    Deliberately carries ONLY the id: shuffling the embedding payload
    through an L(1+b)-way explode multiplies vector bytes moved by up
    to ~70x; callers join vectors back at verify/re-rank time instead,
    paying a candidate-sized shuffle of ids."""
    mask = (1 << p.band_bits) - 1
    entries = []
    for b in range(p.n_bands):
        base = (F.shiftrightunsigned(F.col(sig_col), p.band_bits * b)
                 .bitwiseAND(F.lit(mask)))
        entries.append(F.struct(F.lit(b).alias("band"), base.alias("bucket")))
        if probe:
            for i in range(p.band_bits):
                entries.append(F.struct(F.lit(b).alias("band"),
                                        base.bitwiseXOR(F.lit(1 << i)).alias("bucket")))
    bands = df.select("vec_id", F.explode(F.array(*entries)).alias("bs"))
    return bands.select("vec_id", "bs.band", "bs.bucket")


def lsh_candidate_pairs(base: DataFrame, p: LshParams) -> DataFrame:
    """Distinct unordered candidate id pairs (vec_a < vec_b) from the
    band self-join of a (vec_id, sig) frame.  The probe side flips each
    band bit once, so pairs within band-Hamming distance 1 are
    candidates even when their exact buckets differ; the unprobed side
    keeps the join's right input at n*L rows."""
    a = (_explode_bands(base, "sig", p, probe=p.probe)
         .select(F.col("vec_id").alias("vec_a"), "band", "bucket"))
    b = (_explode_bands(base, "sig", p, probe=False)
         .select(F.col("vec_id").alias("vec_b"), "band", "bucket"))
    return (a.join(b, ["band", "bucket"])
             .filter(F.col("vec_a") < F.col("vec_b"))
             .select("vec_a", "vec_b").distinct())


IVF_MIN_LISTS = 16
IVF_NPROBE = 4
# Above sqrt(n) = 16384 (n ~ 2.7e8 vectors) the list count stops
# growing: a 16384-centroid assignment matmul is still one broadcast
# numpy constant per Arrow batch, but a bigger driver-side Lloyd
# trainer isn't — past the cap a production deployment would train the
# coarse quantizer hierarchically (IMI) or with distributed mini-batch
# k-means.  At the cap the probe set is nprobe*n/16384 ~ 6.6e4 rows
# per query at n=2.7e8 — bounded, not ~n/4 like a constant 16 lists.
IVF_MAX_LISTS = 16384


class IvfParams(NamedTuple):
    lists: int
    nprobe: int
    sample: int


def ivf_params(n: int) -> IvfParams:
    """Coarse-quantizer shape derived from corpus size — the IVF
    analogue of ``lsh_params``: lists ~ sqrt(n) balances list length
    (n/lists) against probed-list count, so per-query re-rank cost is
    ~nprobe*sqrt(n) (sublinear) instead of the fixed-16-list ~n/4.
    Two legs like ``lsh_params``: at n <= SMALL_CORPUS the round-3
    16-list shape stays (probing 4/16 of a tiny corpus is what keeps
    recall >= 0.5 on an ISOTROPIC test corpus, where IVF recall ~
    fraction probed); above it lists = sqrt(n) >= 128, because at that
    size a quarter-corpus probe is the scale-killer and real corpora
    are clustered.  Cap per the IVF_MAX_LISTS note.  The k-means
    sample scales at 8 vectors per centroid (>= the 1024 round-3
    constant) and stays a bounded driver-side cost.  Candidate-count
    sublinearity is pinned by
    tests/test_round4_ops.py::test_ivf_candidates_sublinear_at_1e5."""
    if n <= SMALL_CORPUS:
        return IvfParams(IVF_MIN_LISTS, IVF_NPROBE, 1024)
    lists = min(int(math.isqrt(int(n))), IVF_MAX_LISTS)
    sample = min(max(1024, 8 * lists), 65536)
    return IvfParams(lists, IVF_NPROBE, sample)


def _ivf_centroids(spark: SparkSession, emb: DataFrame, k: int,
                   sample: int = 1024, iters: int = 5, seed: int = 42) -> np.ndarray:
    """Deterministic driver-side Lloyd's k-means on a bounded sample —
    the coarse quantizer for IVF.  At 10^12 rows the sample stays a
    driver-side constant; training cost is independent of table size.

    The sample is hash-ordered (xxhash64 of the id, fixed seed), not
    id-prefix-ordered: id order on a real corpus correlates with
    content (crawl time, shard), so the first ``sample`` ids would
    train the quantizer on a skewed slice.  Hash order is an unbiased
    deterministic shuffle at the same bounded driver cost."""
    rows = (emb.orderBy(F.xxhash64(F.col("vec_id"), F.lit(seed)), "vec_id")
               .limit(sample).select("embedding").collect())
    X = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    X /= np.linalg.norm(X, axis=1, keepdims=True) + 1e-12
    k = min(k, len(X))  # degenerate tiny corpora: one list per vector
    rng = np.random.default_rng([seed, 4242])
    C = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(iters):
        sims = X @ C.T
        assign = sims.argmax(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                c = members.mean(axis=0)
                C[j] = c / (np.linalg.norm(c) + 1e-12)
    return C


def ivf_toplists_udf(C: np.ndarray, nprobe: int):
    """Top-``nprobe`` IVF lists per vector as an Arrow-batched matmul
    against the broadcast (k, dim) centroid matrix — stable argsort so
    ties break toward the lower list id, matching the previous SQL
    array_sort tie rule."""

    @pandas_udf("array<int>")
    def toplists(emb: pd.Series) -> pd.Series:
        X = _stack(emb)
        sims = X @ C.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    return toplists


def ivf_candidate_pairs(emb: DataFrame, C: np.ndarray, nprobe: int) -> DataFrame:
    """(query_id, neighbor_id, qv, dv) candidates: data side lands in
    its single best list, the N_QUERIES query side probes its top-
    ``nprobe`` lists.  Candidate volume per query is ~nprobe*n/lists;
    with lists ~ sqrt(n) from ``ivf_params`` that is ~nprobe*sqrt(n)
    (pinned sublinear by test_ivf_candidates_sublinear_at_1e5)."""
    lists = ivf_toplists_udf(C, nprobe)
    sims = emb.select("vec_id", "embedding", lists(F.col("embedding")).alias("_lists"))
    d = sims.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("dv"),
                    F.col("_lists")[0].alias("list_id"))
    q = (sims.filter(F.col("vec_id") < N_QUERIES)
             .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"),
                     F.explode("_lists").alias("list_id")))
    return (q.join(d, "list_id")
             .filter(F.col("query_id") != F.col("neighbor_id")))


def q_ann_ivf(spark: SparkSession, sf_dir: str,
              recall_audit: bool = True) -> DataFrame:
    """IVF ANN: coarse k-means quantizer (driver-trained, broadcast as
    a numpy matrix inside an Arrow-batched UDF), data bucketed by
    nearest centroid, queries probe their IVF_NPROBE nearest lists,
    exact cosine re-rank, top-K.  Rows-only for the driver but with a
    self-verifying ``recall_e3`` column vs the in-job exact top-K;
    pytest measures recall vs brute force (incl. dim=512).  Pass
    ``recall_audit=False`` to skip the audit (see ``with_recall``)."""
    emb = read_sf(spark, sf_dir, "embeddings", spread=True)
    p = ivf_params(emb.count())
    C = _ivf_centroids(spark, emb, k=p.lists, sample=p.sample)
    cand = (ivf_candidate_pairs(emb, C, p.nprobe)
            .withColumn("cos", F.expr(_cosine("qv", "dv"))))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    topk = (cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= K)
                .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank")))
    if not recall_audit:
        return topk
    return with_recall(topk, q_ann_bruteforce(spark, sf_dir))


def q_ann_lsh(spark: SparkSession, sf_dir: str,
              recall_audit: bool = True) -> DataFrame:
    """LSH-bucketed ANN: sign-bit band buckets (shape from
    ``lsh_params``) generate candidates — the tiny query side carries
    the Hamming-1 probes at scale — then exact cosine re-rank, top-K.
    Compared to brute force in pytest (recall), and the driver output
    carries a self-verifying ``recall_e3`` column vs the exact top-K
    (computed in-job on the sampled query set).  Pass
    ``recall_audit=False`` to skip the audit (see ``with_recall``)."""
    emb = read_sf(spark, sf_dir, "embeddings", spread=True)
    n = emb.count()
    p = lsh_params(n)
    dim = int(emb.select(F.size("embedding").alias("d")).first()["d"])
    sig = lsh_signature_udf(dim, p.planes)
    base = emb.select("vec_id", sig(F.col("embedding")).alias("sig"))
    q = (_explode_bands(base.filter(F.col("vec_id") < N_QUERIES), "sig", p, probe=p.probe)
         .select(F.col("vec_id").alias("query_id"), "band", "bucket"))
    d = (_explode_bands(base, "sig", p, probe=False)
         .select(F.col("vec_id").alias("neighbor_id"), "band", "bucket"))
    cand_ids = (q.join(d, ["band", "bucket"])
                 .filter(F.col("query_id") != F.col("neighbor_id"))
                 .select("query_id", "neighbor_id").distinct())
    qv = F.broadcast(emb.filter(F.col("vec_id") < N_QUERIES)
                        .select(F.col("vec_id").alias("query_id"),
                                F.col("embedding").alias("qv")))
    dv = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("dv"))
    scored = (cand_ids.join(dv, "neighbor_id").join(qv, "query_id")
                      .withColumn("cos", F.expr(_cosine("qv", "dv"))))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    topk = (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= K)
                  .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank")))
    if not recall_audit:
        return topk
    return with_recall(topk, q_ann_bruteforce(spark, sf_dir))


def with_recall(approx_topk: DataFrame, exact_topk: DataFrame) -> DataFrame:
    """Append per-query ``recall_e3`` = 1000 * |approx ∩ exact| / K as
    an integer column, so the driver's rows-only check becomes a real
    quality gate (pytest asserts a >=0.9 floor on the mean).  The exact
    side is the brute-force top-K restricted to the same N_QUERIES
    sampled queries — a K*N_QUERIES-row frame, broadcast.

    The exact side is a full-corpus brute-force scan, so the audit is
    OPT-OUT at the operator level: every q_ann_* driver query keeps it
    on (the driver's rows-only check then carries its own verification),
    but production callers at 10^12 vectors pass ``recall_audit=False``
    and the plan contains no NestedLoopJoin/CartesianProduct and only
    the index scan — asserted by
    tests/test_round5_ops.py::test_ann_recall_audit_opt_out."""
    hits = (approx_topk.join(
                F.broadcast(exact_topk.select("query_id", "neighbor_id")
                                      .withColumn("_hit", F.lit(1))),
                ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(F.floor(F.sum(F.coalesce(F.col("_hit"), F.lit(0))) * 1000 / K)
                  .cast("int").alias("recall_e3")))
    return approx_topk.join(F.broadcast(hits), "query_id").select(
        "query_id", "neighbor_id", "rank", "recall_e3")


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized ANN — the 10^12-vector MEMORY path.  IVF
# bounds how many candidates a query touches (lists ~ sqrt(n) via
# ivf_params); PQ bounds what each candidate COSTS to hold and score:
# PQ_M one-byte codes per vector (vs dim * 4 bytes raw), scored by
# per-query ADC lookup tables, with an exact re-rank of the small top
# pool to absorb quantization error.  Raw-vector PQ (not residual
# encoding) — simpler, and the re-rank pool covers the difference at
# these pool sizes (documented trade-off).
# ---------------------------------------------------------------------------

PQ_M = 8            # subspaces: codes are PQ_M bytes per vector
PQ_K = 256          # centroids per subspace codebook (one byte's worth)
PQ_RERANK = 4       # exact re-rank pool = PQ_RERANK * K per query


def _pq_codebooks(spark: SparkSession, emb: DataFrame, m: int = PQ_M,
                  k: int = PQ_K, sample: int = 2048, iters: int = 8,
                  seed: int = 42) -> np.ndarray:
    """Driver-side per-subspace Lloyd's k-means on a bounded
    L2-normalized sample -> (m, k, dim/m) codebook tensor.  Like
    `_ivf_centroids`, training cost is a driver-side constant
    independent of corpus size, and the sample is hash-ordered (same
    unbiased deterministic shuffle; see `_ivf_centroids`)."""
    rows = (emb.orderBy(F.xxhash64(F.col("vec_id"), F.lit(seed)), "vec_id")
               .limit(sample).select("embedding").collect())
    X = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    X /= np.linalg.norm(X, axis=1, keepdims=True) + 1e-12
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"PQ requires dim % m == 0 (dim={dim}, m={m})")
    dsub = dim // m
    rng = np.random.default_rng([seed, 909])
    books = np.zeros((m, k, dsub))
    for j in range(m):
        S = X[:, j * dsub:(j + 1) * dsub]
        kk = min(k, len(S))
        C = S[rng.choice(len(S), size=kk, replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(kk):
                mem = S[assign == c]
                if len(mem):
                    C[c] = mem.mean(0)
        books[j, :kk] = C
        if kk < k:
            books[j, kk:] = C[0]  # padding; never the argmin winner twice
    return books


def pq_encode_udf(books: np.ndarray):
    """Arrow-batched encoder: embedding -> PQ_M nearest-centroid codes
    (the per-batch cost is one small matmul-shaped distance per
    subspace against the broadcast codebook tensor)."""
    m, _k, dsub = books.shape

    @pandas_udf("array<int>")
    def enc(emb: pd.Series) -> pd.Series:
        X = _stack(emb).astype(np.float64)
        X /= np.linalg.norm(X, axis=1, keepdims=True) + 1e-12
        codes = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            S = X[:, j * dsub:(j + 1) * dsub]
            # ||s-c||^2 = ||s||^2 - 2 s.c + ||c||^2 via matmul: peak
            # temp is (batch, 256), not the (batch, 256, dsub) a
            # broadcast-subtract would allocate (~1 GB at 64k-row
            # Arrow batches); ||s||^2 is constant per row and argmin
            # ignores it
            d2 = ((books[j] ** 2).sum(1)[None, :] - 2.0 * (S @ books[j].T))
            codes[:, j] = d2.argmin(1)
        return pd.Series(list(codes))

    return enc


def q_ann_ivfpq(spark: SparkSession, sf_dir: str,
                recall_audit: bool = True) -> DataFrame:
    """IVF-PQ ANN: vectors live in their best IVF list as PQ_M-byte
    codes; a query probes its nprobe lists, scores candidates by ADC
    (per-query (m, 256) lookup table over squared subspace distances —
    on L2-normalized vectors L2^2 = 2 - 2cos, so the ADC order is the
    cosine order up to quantization), keeps the top PQ_RERANK*K pool,
    and exact-re-ranks that pool against the raw vectors.  Rows-only
    for the driver but with the self-verifying ``recall_e3`` column;
    pytest pins recall floors and determinism."""
    emb = read_sf(spark, sf_dir, "embeddings", spread=True)
    p = ivf_params(emb.count())
    C = _ivf_centroids(spark, emb, k=p.lists, sample=p.sample)
    books = _pq_codebooks(spark, emb)
    m, _k, dsub = books.shape
    lists = ivf_toplists_udf(C, p.nprobe)
    enc = pq_encode_udf(books)
    base = emb.select("vec_id",
                      lists(F.col("embedding")).alias("_lists"),
                      enc(F.col("embedding")).alias("_codes"))
    d = base.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("_codes"), F.col("_lists")[0].alias("list_id"))
    q = (base.filter(F.col("vec_id") < N_QUERIES)
             .select(F.col("vec_id").alias("query_id"),
                     F.explode("_lists").alias("list_id")))

    # per-query ADC tables: queries are a bounded driver-side set
    qrows = (emb.filter(F.col("vec_id") < N_QUERIES)
                .select("vec_id", "embedding").collect())
    luts = {}
    for r in qrows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        v /= np.linalg.norm(v) + 1e-12
        luts[int(r["vec_id"])] = np.stack([
            ((books[j] - v[j * dsub:(j + 1) * dsub]) ** 2).sum(-1)
            for j in range(m)])

    @pandas_udf("double")
    def adc(qid: pd.Series, codes: pd.Series) -> pd.Series:
        cc = np.stack(codes.to_numpy())
        qi = qid.to_numpy()
        out = np.empty(len(qi))
        idx = np.arange(cc.shape[1])
        for u in np.unique(qi):
            mask = qi == u
            out[mask] = luts[int(u)][idx[None, :], cc[mask]].sum(1)
        return pd.Series(out)

    cand = (q.join(d, "list_id")
             .filter(F.col("query_id") != F.col("neighbor_id"))
             .withColumn("adc", adc(F.col("query_id"), F.col("_codes"))))
    wa = Window.partitionBy("query_id").orderBy(F.col("adc").asc(),
                                                F.col("neighbor_id").asc())
    pool = (cand.withColumn("prank", F.row_number().over(wa))
                .filter(F.col("prank") <= PQ_RERANK * K)
                .select("query_id", "neighbor_id"))
    qv = F.broadcast(emb.filter(F.col("vec_id") < N_QUERIES)
                        .select(F.col("vec_id").alias("query_id"),
                                F.col("embedding").alias("qv")))
    dv = emb.select(F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("dv"))
    rer = (pool.join(dv, "neighbor_id").join(qv, "query_id")
               .withColumn("cos", F.expr(_cosine("qv", "dv"))))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                               F.col("neighbor_id").asc())
    topk = (rer.withColumn("rank", F.row_number().over(w))
               .filter(F.col("rank") <= K)
               .select("query_id", "neighbor_id",
                       F.col("rank").cast("int").alias("rank")))
    if not recall_audit:
        return topk
    return with_recall(topk, q_ann_bruteforce(spark, sf_dir))


# ---------------------------------------------------------------------------
# farthest-point-sampling exemplars (k-center greedy, Gonzalez 1985)
# ---------------------------------------------------------------------------

FPS_K = 3


def _dist2(a: str, b: str) -> str:
    """Exact int64 squared L2 between two int-array columns (BIGINT
    cast BEFORE the multiply — ANSI INT*INT would overflow first)."""
    return (f"aggregate(zip_with({a}, {b}, "
            f"(p, q) -> CAST(p - q AS BIGINT) * (p - q)), "
            f"0L, (acc, x) -> acc + x)")


def fps_per_group(df: DataFrame, group_cols: list, k: int = FPS_K,
                  id_col: str = "vec_id",
                  vec_col: str = "qvec") -> DataFrame:
    """Per-group DIVERSITY exemplars: greedy k-center (farthest-point
    sampling).  `medoid_per_group` picks the most CENTRAL member;
    this picks the best-SPREAD k — seed with the min id, then k-1
    times take the member farthest from the chosen set (exact integer
    squared L2; ties break to the smallest id).  The pair: one
    thumbnail that typifies a tile, k exemplars that cover it —
    the standard diverse-subset step of corpus curation.

    Scale plan: k-center greedy never joins members with members.
    Each of the k-1 rounds is (a) one groups-bounded join bringing
    the newest center's vector to its members (AQE broadcasts the
    center side — one row per group), (b) an O(dim) Column fold
    updating the running min-distance, and (c) one partial-agg'd
    max-struct argmax per group.  Total O(k * rows * dim) work and
    O(k) shuffles, independent of group sizes — no m^2 blowup on a
    dense group.  Members at distance 0 from the chosen set are
    never re-picked (all-duplicate groups emit fewer than k rows —
    coverage is already achieved).

    Output: group_cols + (exemplar_id, pick 1..k, dist2) where dist2
    is the exact squared distance to the previously-chosen set at
    pick time (0 for the seed).
    """
    g = list(group_cols)
    base = df.select(*g, F.col(id_col).alias("_id"),
                     F.col(vec_col).alias("_v"))
    seed_ids = base.groupBy(*g).agg(F.min("_id").alias("_cid"))
    vecs = base.select(*g, F.col("_id").alias("_cid"),
                       F.col("_v").alias("_cv"))
    seed = (seed_ids.join(vecs, g + ["_cid"])
            .select(*g, "_cid", "_cv", F.lit(1).alias("pick"),
                    F.lit(0).cast("long").alias("dist2")))
    picks = [seed]
    cur = (base.join(seed.select(*g, F.col("_cv").alias("_c")), g)
           .withColumn("_dmin", F.expr(_dist2("_v", "_c"))).drop("_c"))
    for r in range(2, k + 1):
        win = (cur.filter(F.col("_dmin") > 0)
               .groupBy(*g)
               .agg(F.max(F.struct(F.col("_dmin").alias("_d"),
                                   (-F.col("_id")).alias("_n"))).alias("_m")))
        nxt = (win.select(*g, (-F.col("_m._n")).alias("_cid"),
                          F.col("_m._d").alias("dist2"))
               .join(vecs, g + ["_cid"])
               .select(*g, "_cid", "_cv", F.lit(r).alias("pick"), "dist2"))
        picks.append(nxt)
        if r < k:
            cur = (cur.join(nxt.select(*g, F.col("_cv").alias("_c")), g)
                   .withColumn("_dmin",
                               F.least(F.col("_dmin"),
                                       F.expr(_dist2("_v", "_c"))))
                   .drop("_c"))
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select(*g, F.col("_cid").alias("exemplar_id"),
                      F.col("pick").cast("int").alias("pick"),
                      F.col("dist2"))


def q_tile_exemplars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity exemplars per tile: same 4x4 tile grid and int8
    quantization as ``tile_medoid``, k=3 farthest-point picks per
    tile.  dist2 is exact int64, so the oracle hash pins the full
    greedy trajectory, not just the chosen ids."""
    emb = read_sf(spark, sf_dir, "embeddings", spread=True)
    df = (emb.filter(F.expr(_ABS_MAX) > 0)
          .select(F.expr("vec_id * 7919 % 360000 div 90000")
                  .alias("tile_x"),
                  F.expr("(vec_id * 104729 + 13) % 170000 div 42500")
                  .alias("tile_y"),
                  "vec_id", F.expr(_QVEC).alias("qvec")))
    return (fps_per_group(df, ["tile_x", "tile_y"], k=FPS_K)
            .orderBy("tile_x", "tile_y", "pick"))


def sql_tile_exemplars() -> str:
    mx = "list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE))))"
    qv = (f"list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) / {mx}"
          f" * 127.0 + 0.5) AS INT))")
    d = ("list_aggregate(list_transform(list_zip({a}, {b}), "
         "p -> CAST(p[1] - p[2] AS BIGINT) * (p[1] - p[2])), 'sum')")
    return f"""
    WITH q AS (
      SELECT vec_id * 7919 % 360000 // 90000 AS tx,
             (vec_id * 104729 + 13) % 170000 // 42500 AS ty,
             vec_id, {qv} AS qvec
      FROM embeddings WHERE {mx} > 0
    ),
    c1 AS (SELECT tx, ty, MIN(vec_id) AS cid FROM q GROUP BY tx, ty),
    d1 AS (
      SELECT q.tx, q.ty, q.vec_id, q.qvec,
             {d.format(a="q.qvec", b="s.qvec")} AS dmin
      FROM q
      JOIN c1 ON c1.tx = q.tx AND c1.ty = q.ty
      JOIN q s ON s.vec_id = c1.cid AND s.tx = q.tx AND s.ty = q.ty
    ),
    c2 AS (
      SELECT tx, ty, vec_id AS cid, dmin FROM (
        SELECT tx, ty, vec_id, dmin,
               row_number() OVER (PARTITION BY tx, ty
                                  ORDER BY dmin DESC, vec_id) AS rn
        FROM d1 WHERE dmin > 0) WHERE rn = 1
    ),
    d2 AS (
      SELECT d1.tx, d1.ty, d1.vec_id, d1.qvec,
             LEAST(d1.dmin, {d.format(a="d1.qvec", b="s.qvec")}) AS dmin
      FROM d1
      JOIN c2 ON c2.tx = d1.tx AND c2.ty = d1.ty
      JOIN q s ON s.vec_id = c2.cid AND s.tx = d1.tx AND s.ty = d1.ty
    ),
    c3 AS (
      SELECT tx, ty, vec_id AS cid, dmin FROM (
        SELECT tx, ty, vec_id, dmin,
               row_number() OVER (PARTITION BY tx, ty
                                  ORDER BY dmin DESC, vec_id) AS rn
        FROM d2 WHERE dmin > 0) WHERE rn = 1
    ),
    allp AS (
      SELECT tx, ty, cid, 1 AS pick, CAST(0 AS BIGINT) AS dist2 FROM c1
      UNION ALL
      SELECT tx, ty, cid, 2, dmin FROM c2
      UNION ALL
      SELECT tx, ty, cid, 3, dmin FROM c3
    )
    SELECT CAST(tx AS BIGINT) AS tile_x, CAST(ty AS BIGINT) AS tile_y,
           CAST(cid AS BIGINT) AS exemplar_id,
           CAST(pick AS INT) AS pick, CAST(dist2 AS BIGINT) AS dist2
    FROM allp ORDER BY tile_x, tile_y, pick
    """


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification over the embedding corpus: each of the
    N_QUERIES query vectors takes the majority label of its exact
    top-K cosine neighbors ((count desc, label asc) tie rule — the
    caption_reconcile argmax applied to labels), with the exact vote
    count.  The baseline eval harness of every embedding space:
    label agreement across the ANN index families is the quality
    gate a production deployment trends.

    Scale shape: composes the exact top-K (broadcast query side; the
    ANN variants swap in transparently) and adds one K*N_QUERIES-row
    label join + a query-bounded min-struct argmax — nothing touches
    the corpus beyond the top-K path itself."""
    emb = read_sf(spark, sf_dir, "embeddings", spread=True)
    topk = q_ann_bruteforce(spark, sf_dir)
    lab = emb.select(F.col("vec_id").alias("neighbor_id"),
                     F.col("label").alias("nbr_label"))
    votes = (topk.join(lab, "neighbor_id")
             .groupBy("query_id", "nbr_label")
             .agg(F.count(F.lit(1)).alias("cnt")))
    per = (votes.groupBy("query_id")
           .agg(F.min(F.struct((-F.col("cnt")).alias("_n"),
                               F.col("nbr_label").alias("_l"))).alias("_m")))
    truth = emb.select(F.col("vec_id").alias("query_id"),
                       F.col("label").alias("true_label"))
    return (per.join(truth, "query_id")
            .select(F.col("query_id").cast("long"),
                    F.col("_m._l").cast("int").alias("pred_label"),
                    (-F.col("_m._n")).cast("long").alias("votes"),
                    F.col("true_label").cast("int"),
                    (F.col("_m._l") == F.col("true_label"))
                    .cast("int").alias("correct"))
            .orderBy("query_id"))


def sql_knn_classify() -> str:
    return f"""
    WITH topk AS ({sql_ann_bruteforce()}),
    votes AS (
      SELECT t.query_id, e.label AS nbr_label, COUNT(*) AS cnt
      FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
      GROUP BY t.query_id, e.label
    ),
    canon AS (
      SELECT query_id, nbr_label, cnt,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cnt DESC, nbr_label) AS rn
      FROM votes
    )
    SELECT CAST(c.query_id AS BIGINT) AS query_id,
           CAST(c.nbr_label AS INT) AS pred_label,
           CAST(c.cnt AS BIGINT) AS votes,
           CAST(e.label AS INT) AS true_label,
           CAST(CASE WHEN c.nbr_label = e.label THEN 1 ELSE 0 END AS INT)
             AS correct
    FROM canon c JOIN embeddings e ON e.vec_id = c.query_id
    WHERE c.rn = 1
    ORDER BY query_id
    """
