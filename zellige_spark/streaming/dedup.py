"""Custom stateful streaming operator: cross-batch exact dedup.

A continuously-ingesting training pipeline must drop re-crawled /
re-submitted duplicates ACROSS micro-batches, which a stateless
`dropDuplicates` inside one batch can't do and watermarked
`dropDuplicates` only does within the watermark horizon.  This is the
state-store shape: stream keyed by content fingerprint, per-key state
remembers the first-accepted doc, every later arrival is emitted as a
duplicate verdict instead of silently dropped (training pipelines
audit what they discard).

Semantics (batch twin = ``stream_dedup_batch_twin``, equality
test-pinned): within and across batches the LOWEST doc_id with a given
fingerprint is the keeper; every other doc emits one row
(doc_id, fingerprint, keep_doc_id, is_keeper=false).  Keepers emit
with is_keeper=true exactly once, in the batch where first seen.

At scale: state is one (fingerprint -> keep_doc_id) entry per DISTINCT
document content, hash-partitioned by the groupBy — the same layout a
1000-executor state store shards naturally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FP = "md5(lower(regexp_replace(trim(text), '\\\\s+', ' ')))"

OUT_SCHEMA = ("doc_id long, fingerprint string, keep_doc_id long, "
              "is_keeper boolean")


def stream_dedup_exact(spark: SparkSession, input_path: str,
                       checkpoint: str, query_name: str = "dedup_stream",
                       max_files_per_trigger: int | None = None):
    """Start the streaming dedup over a parquet directory stream;
    emits one verdict row per document to the in-memory table
    ``query_name``.  ``max_files_per_trigger=1`` makes each input file
    its own micro-batch, which is how the test exercises CROSS-batch
    state in one run (the memory sink cannot recover a checkpoint
    across runs; a production job uses a foreachBatch/Kafka sink and
    runs continuously)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    reader = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = (reader.parquet(input_path)
            .select("doc_id", F.expr(_FP).alias("fingerprint")))

    state_schema = "keep_doc_id long"

    def dedup(key, pdf_iter, state: GroupState):
        (fp,) = key
        if state.hasTimedOut:  # never set; keep the branch total
            state.remove()
            return
        ids = sorted(d for pdf in pdf_iter for d in pdf["doc_id"].tolist())
        if not ids:
            return
        if state.exists:
            (keeper,) = state.get
            rows = [(d, fp, keeper, False) for d in ids]
        else:
            keeper = ids[0]
            state.update((keeper,))
            rows = [(ids[0], fp, keeper, True)]
            rows += [(d, fp, keeper, False) for d in ids[1:]]
        yield pd.DataFrame(rows, columns=["doc_id", "fingerprint",
                                          "keep_doc_id", "is_keeper"])

    verdicts = (docs.groupBy("fingerprint")
                .applyInPandasWithState(dedup, OUT_SCHEMA, state_schema,
                                        "append",
                                        GroupStateTimeout.NoTimeout))
    return (verdicts.writeStream.outputMode("append")
            .format("memory").queryName(query_name)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def stream_dedup_batch_twin(spark: SparkSession, *paths: str) -> DataFrame:
    """Batch-equivalent verdicts over the union of the same inputs:
    keeper = min doc_id per fingerprint (order-independent, so it
    equals the streaming result whenever batches arrive in doc_id
    order — the test feeds them that way; a keeper that arrives LATER
    than a duplicate is the one cross-batch divergence possible, and
    the streaming first-wins choice is the correct one for a stream)."""
    df = spark.read.parquet(*paths)
    fp = df.select("doc_id", F.expr(_FP).alias("fingerprint"))
    keep = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("keep_doc_id"))
    return (fp.join(keep, "fingerprint")
              .select("doc_id", "fingerprint", "keep_doc_id",
                      (F.col("doc_id") == F.col("keep_doc_id")).alias("is_keeper")))


def q_dedup_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver anchor for the streaming dedup semantics: per-doc keep/
    drop verdicts over a corpus with guaranteed exact duplicates (every
    doc re-submitted under doc_id + 2000000 — the re-crawl shape the
    stream dedups across batches).  Same keeper rule as the stream."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dup = base.withColumn("doc_id", F.col("doc_id") + F.lit(2000000))
    df = base.unionByName(dup)
    fp = df.select("doc_id", F.expr(_FP).alias("fingerprint"))
    keep = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("keep_doc_id"))
    return (fp.join(keep, "fingerprint")
              .select("doc_id", "fingerprint", "keep_doc_id",
                      (F.col("doc_id") == F.col("keep_doc_id"))
                      .cast("int").alias("is_keeper"))
              .orderBy("doc_id"))


def sql_dedup_verdicts() -> str:
    return f"""
    WITH u AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text FROM documents
    ),
    fp AS (
      SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM u
    ),
    keep AS (
      SELECT fingerprint, MIN(doc_id) AS keep_doc_id FROM fp GROUP BY fingerprint
    )
    SELECT fp.doc_id, fp.fingerprint, keep.keep_doc_id,
           CAST(fp.doc_id = keep.keep_doc_id AS INT) AS is_keeper
    FROM fp JOIN keep USING (fingerprint)
    ORDER BY fp.doc_id
    """
