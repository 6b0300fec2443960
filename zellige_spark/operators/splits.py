"""Leak-free train/val/test splitting — the step between dedup and
training that the dedup families exist to serve.

Splitting by a hash of the DOC id leaks: two near-duplicate documents
hash independently, so ~2·p·(1-p) of every duplicate cluster straddles
train and eval and the eval loss is contaminated.  The leak-free rule
is to hash the duplicate-cluster CANONICAL id (the component from
``dedup.connected_components``) so every member of a cluster lands in
the same split by construction.

Scale plan: components are already the dedup pipeline's output
(O(|E| log n) min-label propagation — |E| is the near-dup pair set,
tiny relative to the corpus); the split itself is one broadcast-free
Column expression per row (Knuth multiplicative hash of the component,
identical BIGINT arithmetic in Spark and DuckDB — the
``text.training_mix`` pattern, including the 31-bit pre-mask that
keeps the product inside int64 at 10^12-row ids).  No shuffle beyond
the component join the caller already paid for.

No reference counterpart (zellige is an encoder); the operator is the
standard leakage guard from public LLM-data-pipeline practice
(e.g. deduplicate-then-split, Lee et al. 2022 "Deduplicating Training
Data Makes Language Models Better" — arXiv 2107.06499).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (_augmented, dedup_canonical, q_dedup_minhash_words,
                    sql_dedup_components)

__all__ = ["leakfree_split", "q_split_leakfree", "sql_split_leakfree"]

# per-mille split thresholds: [0, TRAIN) train, [TRAIN, VAL) val,
# [VAL, 1000) test
SPLIT_TRAIN = 800
SPLIT_VAL = 900

# Knuth multiplicative hash of the COMPONENT id, masked to 31 bits
# first so component * 2654435761 stays inside int64 for any id (the
# text._MIX_HASH overflow rationale, applied to the component column).
_SPLIT_HASH = ("((((component % 2147483648 + 2147483648) % 2147483648)"
               " * 2654435761) % 1000)")

_SPLIT_CASE = (f"CASE WHEN {_SPLIT_HASH} < {SPLIT_TRAIN} THEN 'train' "
               f"WHEN {_SPLIT_HASH} < {SPLIT_VAL} THEN 'val' "
               f"ELSE 'test' END")


def leakfree_split(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, component, split) — split assigned by hashing the
    duplicate-cluster canonical id, so no near-dup pair ever straddles
    splits.  ``docs`` is the full corpus (one row per doc), ``pairs``
    any near-dup pair frame (doc_a, doc_b) — minhash, simhash, or
    their union.  Singleton docs are their own component, so the
    operator degrades to plain hash splitting exactly where leakage is
    impossible."""
    canon = dedup_canonical(docs, pairs, id_col=id_col)
    return canon.withColumn("split", F.expr(_SPLIT_CASE))


def q_split_leakfree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: leak-free split over the augmented corpus using
    the MinHash-words pair graph (same inputs as ``dedup_components``,
    which this composes end to end)."""
    pairs = q_dedup_minhash_words(spark, sf_dir)
    docs = _augmented(spark, sf_dir).select("doc_id")
    return leakfree_split(docs, pairs).orderBy("doc_id")


def sql_split_leakfree() -> str:
    # the component oracle (recursive-CTE transitive closure) wrapped
    # as a subquery, then the same Knuth-hash CASE over the component
    return f"""
    SELECT doc_id, component, {_SPLIT_CASE} AS split
    FROM ({sql_dedup_components()}) comp
    ORDER BY doc_id
    """
