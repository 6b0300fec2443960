"""Custom stateful streaming operator: cross-batch IMAGE near-dup.

The image-modality twin of `streaming/neardup.py`: a continuously
ingesting image crawl re-encounters near-identical images (re-encodes,
recompressions, small crops) whose 64-bit perceptual hashes differ in
a few bits.  The stream keys by phash BAND BUCKET (4 x 16-bit chunks —
pigeonhole: Hamming distance <= 3 shares at least one exact chunk,
`images.phash_near_dup`) and keeps ONE representative per bucket:
a new image is flagged when any of its four buckets holds a
representative within ``MAX_HAM`` Hamming bits.  Duplicates never
enter state, so state is one (rep_id, rep_phash) row per distinct
band bucket of ACCEPTED content — the bounded layout a 1000-executor
state store shards by the groupBy key.

Because the input-table contract carries phash as a materialized
int64 COLUMN, the batch twin has a FULL DuckDB oracle (xor/bit_count
exist in both engines) — no md5 trick needed here.

Semantics (batch twin ``image_dup_verdicts_batch``, stream == twin
whenever batches arrive in image_id order — the same documented
contract as the text streams):

* bucket key = (band b, chunk = (phash >> 16b) & 0xFFFF), b in 0..3;
* representative per bucket = lowest image_id ever seen in it;
* a (image, bucket) hit is FLAGGED when Hamming(phash, rep_phash)
  <= MAX_HAM;
* per-image verdict: is_dup = any flagged bucket; dup_of = lowest
  flagged representative id (-1 when clean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NBANDS = 4
MAX_HAM = 3

OUT_SCHEMA = ("image_id long, band int, rep_id long, hamming int, "
              "flagged boolean")


def banded_phash(images: DataFrame, id_col: str = "image_id",
                 phash_col: str = "phash") -> DataFrame:
    """(image_id, phash, band, chunk) — one row per 16-bit band, pure
    Column math, no shuffle."""
    base = images.select(F.col(id_col).alias("image_id"),
                         F.col(phash_col).alias("phash"))
    return (base.select(
        "image_id", "phash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright("phash", 16 * b)
                      .bitwiseAND(F.lit(0xFFFF)).alias("chunk"))
            for b in range(NBANDS)])).alias("bs"))
        .select("image_id", "phash", "bs.band", "bs.chunk"))


def image_dup_hits_batch(images: DataFrame, id_col: str = "image_id",
                         phash_col: str = "phash") -> DataFrame:
    """Batch twin of the stateful per-bucket stage: rep = min image_id
    in the bucket; every other member emits (image_id, band, rep_id,
    hamming, flagged)."""
    b = banded_phash(images, id_col, phash_col)
    rep = (b.groupBy("band", "chunk")
            .agg(F.min("image_id").alias("rep_id")))
    reps = (b.join(rep, ["band", "chunk"])
             .filter(F.col("image_id") == F.col("rep_id"))
             .select("band", "chunk", "rep_id",
                     F.col("phash").alias("rep_phash")))
    ham = F.bit_count(F.col("phash").bitwiseXOR(F.col("rep_phash"))) \
           .cast("int")
    return (b.join(reps, ["band", "chunk"])
             .filter(F.col("image_id") != F.col("rep_id"))
             .select("image_id", "band", "rep_id", ham.alias("hamming"),
                     (ham <= MAX_HAM).alias("flagged")))


def image_dup_verdicts_batch(images: DataFrame, id_col: str = "image_id",
                             phash_col: str = "phash") -> DataFrame:
    """Per-image verdicts: is_dup = any flagged bucket, dup_of =
    lowest flagged representative (or -1)."""
    hits = image_dup_hits_batch(images, id_col, phash_col)
    per_img = (hits.groupBy("image_id")
               .agg(F.max(F.col("flagged").cast("int")).alias("is_dup"),
                    F.min(F.when(F.col("flagged"), F.col("rep_id")))
                     .alias("_dup_of")))
    base = images.select(F.col(id_col).alias("image_id"))
    return (base.join(per_img, "image_id", "left")
                .select("image_id",
                        F.coalesce("is_dup", F.lit(0)).cast("int")
                         .alias("is_dup"),
                        F.coalesce("_dup_of", F.lit(-1)).alias("dup_of")))


def stream_image_dup(spark: SparkSession, input_path: str, checkpoint: str,
                     query_name: str = "imagedup_stream",
                     max_files_per_trigger: int | None = None):
    """Start the streaming image near-dup over a parquet directory
    stream of (image_id long, phash long); emits one bucket-hit row
    per (image, band) to the in-memory table ``query_name``.  State
    per bucket is (rep_id, rep_phash) — constant size; duplicates
    never grow it."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    reader = spark.readStream.schema("image_id long, phash long")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    imgs = reader.parquet(input_path)
    b = banded_phash(imgs)

    state_schema = "rep_id long, rep_phash long"

    def hit(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:  # never set; keep the branch total
            state.remove()
            return
        members = sorted(
            (int(i), int(p))
            for pdf in pdf_iter
            for i, p in zip(pdf["image_id"].tolist(), pdf["phash"].tolist()))
        if not members:
            return
        if state.exists:
            st = state.get
            rep_id, rep_phash = int(st[0]), int(st[1])
        else:
            rep_id, rep_phash = members[0]
            state.update((rep_id, rep_phash))
            members = members[1:]
        band = int(key[0])
        rows = []
        for i, p in members:
            ham = bin(p ^ rep_phash).count("1")
            rows.append((i, band, rep_id, ham, ham <= MAX_HAM))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "image_id", "band", "rep_id", "hamming", "flagged"])

    hits = (b.groupBy("band", "chunk")
             .applyInPandasWithState(hit, OUT_SCHEMA, state_schema,
                                     "append", GroupStateTimeout.NoTimeout))
    return (hits.writeStream.outputMode("append")
            .format("memory").queryName(query_name)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
