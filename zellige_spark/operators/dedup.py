"""Deduplication operators for training-data pipelines over ``documents``.

Five families (SURVEY-mandated training-data ops):

* exact dedup — hash-groupBy on the md5 fingerprint; one shuffle,
  map-side partial agg for free.
* n-gram Jaccard near-dup — character-3-gram shingle sets; pairs with
  Jaccard >= threshold via a shingle-inverted-index self-join.  Exact
  (oracle-checked); O(sum of postings^2) worst case — the small-N
  verifier for the scalable MinHash path.
* MinHash+LSH near-dup — 128 xxhash64-seeded min-hashes, banded LSH
  buckets generate candidates, exact Jaccard verifies (see LSH_BANDS
  note below on the recall/cost knob).
* SimHash — 64-bit token-vote hash via a vectorized pandas UDF; pairs
  within Hamming distance <= d via 4x16-bit band blocking.
* embedding cosine near-dup — see operators/similarity.py.

The near-dup queries run over a corpus UNION'd with deterministic
truncated variants of each document (same derivation in Spark and
DuckDB), so the oracle checks real pairs, not an empty set — the raw
synthetic corpus has no near-duplicates.
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

JACCARD_THRESHOLD = 0.6
MINHASH_PERMS = 128
# 64 bands x 2 rows: P(candidate | j) = 1-(1-j^2)^64; at the 0.6
# threshold the miss probability is (1-0.36)^64 ~= 4e-13, so the
# verified LSH output equals the exact pair set deterministically in
# practice (the driver oracle asserts exact equality).  2-row bands are
# the high-recall end of the knob; drop to 4-row bands when inter-doc
# similarity is low and candidate volume matters more than recall.
LSH_BANDS = 64

# corpus with injected near-duplicates: every doc also appears truncated
# to its first ~80% of characters under doc_id + 1_000_000
_AUG_SPARK = """
SELECT doc_id, lower(regexp_replace(trim(text), '\\\\s+', ' ')) AS nt FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id,
       substring(lower(regexp_replace(trim(text), '\\\\s+', ' ')), 1,
                 CAST(length(lower(regexp_replace(trim(text), '\\\\s+', ' '))) * 4 / 5 AS INT)) AS nt
FROM documents
"""

_AUG_DUCK = """
SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS nt FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id,
       substring(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), 1,
                 CAST(length(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) * 4 // 5 AS INT)) AS nt
FROM documents
"""


def _augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    return spark.sql(_AUG_SPARK)


def _shingles(df: DataFrame) -> DataFrame:
    """Distinct (doc_id, 3-gram shingle) pairs — JVM higher-order
    functions, no Python."""
    # NB: Spark's sequence(1, 0) yields a DESCENDING [1, 0] rather than an
    # empty array, so short docs need the explicit length guard + filter
    return (df
            .withColumn("sh", F.expr(
                "filter(transform(sequence(1, greatest(length(nt) - 2, 1)), "
                "i -> substring(nt, i, 3)), s -> length(s) = 3)"))
            .select("doc_id", F.explode("sh").alias("shingle"))
            .distinct())


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups over the augmented corpus: fingerprint ->
    (representative doc_id, group size).  Truncated docs never collide
    with originals, so groups of size 1 dominate; the query shape is the
    point (hash-groupBy with partial agg)."""
    aug = _augmented(spark, sf_dir)
    return (aug.groupBy(F.md5("nt").alias("fingerprint"))
               .agg(F.min("doc_id").alias("keep_doc_id"),
                    F.count(F.lit(1)).alias("n_copies")))


def sql_dedup_exact() -> str:
    return f"""
    WITH aug AS ({_AUG_DUCK})
    SELECT md5(nt) AS fingerprint, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM aug GROUP BY md5(nt)
    """


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (the oracle-checkable near-dup)
# ---------------------------------------------------------------------------

def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _augmented(spark, sf_dir)
    sh = _shingles(aug).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                     & (F.col("a.doc_id") < F.col("b.doc_id")))
               .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
               .agg(F.count(F.lit(1)).alias("common")))
    out = (common
           .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
           .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
           .withColumn("jaccard", F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")))
           .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
           .select("doc_a", "doc_b"))
    return out


_SQL_SHINGLES = """
    SELECT DISTINCT doc_id,
           unnest(list_transform(generate_series(1, greatest(length(nt) - 2, 0)),
                                 i -> substr(nt, CAST(i AS INT), 3))) AS shingle
    FROM aug
"""


def sql_dedup_ngram_jaccard() -> str:
    return f"""
    WITH aug AS ({_AUG_DUCK}),
    sh AS ({_SQL_SHINGLES}),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE common / CAST(sa.sz + sb.sz - common AS DOUBLE) >= {JACCARD_THRESHOLD}
    """


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path; verified candidates == exact pair set)
# ---------------------------------------------------------------------------

def minhash_signatures(sh: DataFrame, perms: int = MINHASH_PERMS) -> DataFrame:
    """(doc_id, array<long> signature): min over shingles of
    xxhash64(shingle, seed p) for each permutation p — all JVM-side."""
    mins = [F.min(F.xxhash64(F.col("shingle"), F.lit(p))).alias(f"h{p}")
            for p in range(perms)]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select("doc_id", F.array(*[F.col(f"h{p}") for p in range(perms)]).alias("sig"))


def lsh_candidates(sig: DataFrame, bands: int = LSH_BANDS,
                   perms: int = MINHASH_PERMS) -> DataFrame:
    """Band the signature, bucket-join on (band, band-hash)."""
    rows = perms // bands
    banded = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)]).alias("sig_hash"))
            for b in range(bands)])).alias("bs"))
    banded = banded.select("doc_id", "bs.band", "bs.sig_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.sig_hash") == F.col("b.sig_hash"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
             .distinct())


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates -> exact-Jaccard verification.  Output equals the
    exact n-gram pair set whenever LSH recall holds (P(miss) ~ 4e-13 at
    the 0.6 threshold with 64x2 bands; asserted by the shared oracle)."""
    aug = _augmented(spark, sf_dir)
    sh = _shingles(aug).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    cands = lsh_candidates(minhash_signatures(sh))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (cands.join(a, "doc_a").join(b, ["doc_b", "shingle"])
                   .groupBy("doc_a", "doc_b")
                   .agg(F.count(F.lit(1)).alias("common")))
    out = (common
           .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
           .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
           .withColumn("jaccard", F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")))
           .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
           .select("doc_a", "doc_b"))
    return out


# oracle: identical to the exact n-gram pair set
sql_dedup_minhash_lsh = sql_dedup_ngram_jaccard


# ---------------------------------------------------------------------------
# SimHash (vectorized pandas UDF; pairs via 16-bit band blocking)
# ---------------------------------------------------------------------------

def simhash_signatures(df: DataFrame, text_col: str = "nt") -> DataFrame:
    """64-bit SimHash per doc: tokens vote per bit, weighted by count.
    Token hashing is numpy-vectorized inside an Arrow-batched UDF."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                continue
            # FNV-1a 64-bit per token, vectorized over unique tokens
            uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            hs = np.empty(len(uniq), dtype=np.uint64)
            for j, tok in enumerate(uniq):
                h = np.uint64(0xCBF29CE484222325)
                for ch in tok.encode("utf-8"):
                    h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
                hs[j] = h
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            val = 0
            for b in range(64):
                if votes[b] > 0:
                    val |= (1 << b)
            out[i] = val - 0x10000000000000000 if val >= 0x8000000000000000 else val
        return pd.Series(out)

    return df.select("doc_id", simhash(F.col(text_col)).alias("simhash"))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash pairs within Hamming distance <= 3 over the augmented
    corpus, via 4x16-bit band blocking (a pair within distance 3 shares
    at least one exact 16-bit band).  No SQL oracle (bit-level hashing
    not expressible); rows-only + pytest numpy oracle."""
    aug = _augmented(spark, sf_dir)
    sig = simhash_signatures(aug).cache()
    bands = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright("simhash", 16 * b).bitwiseAND(F.lit(0xFFFF)).alias("chunk"))
            for b in range(4)])).alias("bs"))
    bands = bands.select("doc_id", "simhash", "bs.band", "bs.chunk")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                     F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
             .distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", ham.cast("int"))
                .filter(F.col("hamming") <= 3)
                .select("doc_a", "doc_b", "hamming"))
