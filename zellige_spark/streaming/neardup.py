"""Custom stateful streaming operator: cross-batch NEAR-dup detection.

The exact-dedup stream (`streaming/dedup.py`) only catches byte-equal
re-crawls; a continuously-ingesting training pipeline also sees
near-identical re-submissions (truncations, boilerplate edits).  This
operator keys the stream by MinHash BAND BUCKET and keeps one
representative per bucket in the state store: a new document is
flagged a near-duplicate when any of its band buckets already holds a
representative whose signature agreement passes ``AGREE_MIN``.
Duplicates never enter state, so state size is one row per distinct
band bucket of ACCEPTED content — the same bounded layout a
1000-executor state store shards by the groupBy key.

Hashing is md5-nibble-decoded to int64 (the `dedup.q_dedup_simhash`
trick) so the signature is bit-identical in Spark and DuckDB and the
batch twin gets a FULL value-level oracle — the xxhash64 scale path
cannot be oracle-checked.  A production deployment swaps ``_hash15``
for xxhash64 and keeps everything else.

Semantics (batch twin ``near_dup_verdicts_batch``, equality
test-pinned; stream == twin whenever batches arrive in doc_id order —
the same documented contract as the exact-dedup stream):

* signature: NP (16) md5-minhashes over the doc's distinct word
  3-shingles; docs with < 3 tokens have no signature and are "new".
* bands: NB (8) bands x 2 rows; bucket key = (band, h_2b, h_2b+1).
* representative per bucket = lowest doc_id ever seen in it.
* a (doc, bucket) hit is FLAGGED when agreement with the rep is
  >= AGREE_MIN of NP (the two banded minhashes agree by construction,
  so a random collision scores ~2/16 — far under 10/16, while an 80%
  truncation overlaps ~0.8 jaccard ~ 12.8/16).
* per-doc verdict: is_dup = any flagged bucket; dup_of = the lowest
  flagged representative id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NP = 16          # minhash permutations
NB = 8           # bands (x 2 rows each)
AGREE_MIN = 10   # flagged when >= this many of NP minhashes agree

_NORM = "lower(regexp_replace(trim(text), '\\\\s+', ' '))"
_NORM_DUCK = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"

OUT_SCHEMA = ("doc_id long, band int, rep_id long, agree int, "
              "flagged boolean")


def _hash15(expr: str) -> str:
    """int64 from the first 15 hex nibbles of md5(expr) — identical
    arithmetic in Spark SQL and DuckDB (both emit lowercase hex)."""
    # each nibble casts to BIGINT BEFORE the scale multiply: scales
    # below 2^31 parse as INT literals and an int*int product past
    # 2^31 is an ANSI ARITHMETIC_OVERFLOW
    terms = " + ".join(
        f"CAST(instr('0123456789abcdef', substr(md5({expr}), {j + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (14 - j)}"
        for j in range(15))
    return f"({terms})"


def _shingle_expr(nt: str) -> str:
    """Distinct word-3-shingle array of normalized-text column ``nt``
    (Spark SQL; arrays_zip of three slices keeps references O(1))."""
    toks = f"split({nt}, ' ')"
    return (
        f"CASE WHEN size({toks}) >= 3 THEN array_distinct(transform("
        f"arrays_zip(slice({toks}, 1, size({toks}) - 2), "
        f"slice({toks}, 2, size({toks}) - 2), "
        f"slice({toks}, 3, size({toks}) - 2)), "
        f"s -> concat_ws(' ', s['0'], s['1'], s['2']))) "
        f"ELSE array() END")


def with_signature(df: DataFrame, text_col: str = "text",
                   barrier: bool = True) -> DataFrame:
    """(doc_id, h0..h{NP-1}) — per-ROW Column math (no shuffle, no
    aggregation), the shape a stream stage needs.  Docs with no
    shingles drop.  ``barrier=False`` for streaming inputs:
    monotonically_increasing_id is disallowed in a streaming plan, so
    the stream pays the (micro-batch-sized) re-inlining instead."""
    nt = _NORM.replace("text", text_col)
    df = df.select("doc_id", F.expr(_shingle_expr(f"({nt})")).alias("_shs"))
    df = df.filter(F.size("_shs") > 0)
    # md5 once per (shingle, perm): higher-order lambdas run
    # INTERPRETED (CodegenFallback) with no common-subexpression
    # elimination, so inlining _hash15's 15 nibble terms into one
    # lambda re-evaluated md5 FIFTEEN times per element — ~300M md5
    # calls at sf0.1, measured 116 s for the batch twin.  A nested
    # transform materializes the md5 hex once and the outer lambda
    # only decodes nibbles: identical values, 1/15th the hashing.
    decode = " + ".join(
        f"CAST(instr('0123456789abcdef', substr(m, {j + 1}, 1)) - 1"
        f" AS BIGINT) * {16 ** (14 - j)}"
        for j in range(15))
    cols = []
    for p in range(NP):
        cols.append(F.expr(
            f"array_min(transform(transform(_shs, "
            f"s -> md5(concat('{p}|', s))), m -> ({decode})))")
            .alias(f"h{p}"))
    out = df.select("doc_id", *cols)
    if barrier:
        # h columns are EXPENSIVE derived expressions (md5 per shingle
        # per perm); without the barrier Catalyst's project collapsing
        # re-inlines them into the signature array AND each exploded
        # band row downstream (~2-8x the hash work — CLAUDE.md pattern)
        out = out.withColumn("_b", F.monotonically_increasing_id())
    return out


def banded(sig: DataFrame) -> DataFrame:
    """Explode NP-wide signatures into NB (doc_id, band, ha, hb, sig)
    bucket rows; ``sig`` rides along for the agreement count."""
    arr = F.array(*[F.col(f"h{p}") for p in range(NP)])
    rows = sig.withColumn("_sig", arr).select(
        "doc_id", "_sig",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.col(f"h{2 * b}").alias("ha"),
                     F.col(f"h{2 * b + 1}").alias("hb"))
            for b in range(NB)])).alias("bs"))
    return rows.select("doc_id", "bs.band", "bs.ha", "bs.hb", "_sig")


def bucket_hits_batch(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Batch twin of the stateful per-bucket stage: rep = min doc_id in
    the bucket; every other member emits (doc_id, band, rep_id, agree,
    flagged)."""
    b = banded(with_signature(df, text_col))
    rep = (b.groupBy("band", "ha", "hb")
            .agg(F.min("doc_id").alias("rep_id")))
    reps = (b.join(rep, ["band", "ha", "hb"])
             .filter(F.col("doc_id") == F.col("rep_id"))
             .select("band", "ha", "hb", "rep_id",
                     F.col("_sig").alias("_rep_sig")))
    agree = F.expr(
        "CAST(size(filter(zip_with(_sig, _rep_sig, (x, y) -> x = y), "
        "v -> v)) AS INT)")
    return (b.join(reps, ["band", "ha", "hb"])
             .filter(F.col("doc_id") != F.col("rep_id"))
             .select("doc_id", "band", "rep_id", agree.alias("agree"),
                     (agree >= AGREE_MIN).alias("flagged")))


def near_dup_verdicts_batch(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc verdicts from the bucket hits: is_dup = any flagged
    bucket, dup_of = lowest flagged rep (or -1)."""
    hits = bucket_hits_batch(df, text_col)
    per_doc = (hits.groupBy("doc_id")
               .agg(F.max(F.col("flagged").cast("int")).alias("is_dup"),
                    F.min(F.when(F.col("flagged"), F.col("rep_id")))
                     .alias("_dup_of")))
    base = df.select("doc_id")
    return (base.join(per_doc, "doc_id", "left")
                .select("doc_id",
                        F.coalesce("is_dup", F.lit(0)).cast("int").alias("is_dup"),
                        F.coalesce("_dup_of", F.lit(-1)).alias("dup_of")))


def stream_near_dup(spark: SparkSession, input_path: str, checkpoint: str,
                    query_name: str = "neardup_stream",
                    max_files_per_trigger: int | None = None):
    """Start the streaming near-dup over a parquet directory stream;
    emits one bucket-hit row per (doc, band) to the in-memory table
    ``query_name`` (the consumer aggregates per-doc verdicts exactly
    like ``near_dup_verdicts_batch`` does).  State per bucket is the
    representative's id + NP minhashes; duplicates never grow it."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    reader = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_path)
    b = banded(with_signature(docs, barrier=False))

    state_schema = ("rep_id long, " +
                    ", ".join(f"s{p} long" for p in range(NP)))

    def hit(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:  # never set; keep the branch total
            state.remove()
            return
        rows = []
        members = sorted(
            (int(d), [int(v) for v in s])
            for pdf in pdf_iter
            for d, s in zip(pdf["doc_id"].tolist(), pdf["_sig"].tolist()))
        if not members:
            return
        if state.exists:
            st = state.get
            rep_id, rep_sig = int(st[0]), [int(v) for v in st[1:]]
        else:
            rep_id, rep_sig = members[0]
            state.update((rep_id, *rep_sig))
            members = members[1:]
        band = int(key[0])
        for d, s in members:
            agree = sum(1 for x, y in zip(s, rep_sig) if x == y)
            rows.append((d, band, rep_id, agree, agree >= AGREE_MIN))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "doc_id", "band", "rep_id", "agree", "flagged"])

    hits = (b.groupBy("band", "ha", "hb")
             .applyInPandasWithState(hit, OUT_SCHEMA, state_schema,
                                     "append", GroupStateTimeout.NoTimeout))
    return (hits.writeStream.outputMode("append")
            .format("memory").queryName(query_name)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


# --- driver query + DuckDB oracle ------------------------------------------

def q_near_dup_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver anchor for the streaming near-dup semantics over a corpus
    with guaranteed near-duplicates: every doc re-submitted truncated
    to ~80% of its characters under doc_id + 3000000 (the re-crawl-
    with-edits shape the stream flags across batches)."""
    from ..io_scan import read_sf

    # spread=True: the 16-permutation md5 signature is heavy per-row
    # Column math pipelined straight onto the scan, and the sf-dir
    # parquet is a single row group (1-2 scan partitions).
    base = read_sf(spark, sf_dir, "documents", spread=True)
    trunc = base.select(
        (F.col("doc_id") + F.lit(3000000)).alias("doc_id"),
        F.expr(f"substring({_NORM}, 1, CAST(length({_NORM}) * 4 / 5 AS INT))"
               ).alias("text"))
    df = base.select("doc_id", "text").unionByName(trunc)
    return near_dup_verdicts_batch(df).orderBy("doc_id")


def sql_near_dup_verdicts() -> str:
    h = _hash15("CAST(p.p AS VARCHAR) || '|' || sh.shingle")
    mins = f"MIN({h})"
    return f"""
    WITH u AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 3000000 AS doc_id,
             substring({_NORM_DUCK}, 1,
                       CAST(length({_NORM_DUCK}) * 4 // 5 AS INT)) AS text
      FROM documents
    ),
    tk AS (SELECT doc_id, string_split({_NORM_DUCK}, ' ') AS toks FROM u),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(CASE WHEN len(toks) >= 3 THEN
                      list_transform(generate_series(1, len(toks) - 2),
                                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                    ELSE [] END) AS shingle
      FROM tk
    ),
    sig AS (
      SELECT sh.doc_id, p.p, {mins} AS h
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {NP - 1})) AS p) p
      GROUP BY sh.doc_id, p.p
    ),
    bands AS (
      SELECT a.doc_id, b.b AS band, a.h AS ha, c.h AS hb
      FROM (SELECT unnest(generate_series(0, {NB - 1})) AS b) b
      JOIN sig a ON a.p = 2 * b.b
      JOIN sig c ON c.doc_id = a.doc_id AND c.p = 2 * b.b + 1
    ),
    rep AS (
      SELECT band, ha, hb, MIN(doc_id) AS rep_id
      FROM bands GROUP BY band, ha, hb
    ),
    pairs AS (
      -- DISTINCT: a pair sharing several band buckets must count its
      -- 16-perm agreement once, not once per shared band
      SELECT DISTINCT m.doc_id, r.rep_id
      FROM bands m
      JOIN rep r ON r.band = m.band AND r.ha = m.ha AND r.hb = m.hb
                AND r.rep_id <> m.doc_id
    ),
    agree AS (
      SELECT pr.doc_id, pr.rep_id,
             SUM(CASE WHEN s1.h = s2.h THEN 1 ELSE 0 END) AS agree
      FROM pairs pr
      JOIN sig s1 ON s1.doc_id = pr.doc_id
      JOIN sig s2 ON s2.doc_id = pr.rep_id AND s2.p = s1.p
      GROUP BY pr.doc_id, pr.rep_id
    ),
    verdict AS (
      SELECT doc_id,
             MAX(CASE WHEN agree >= {AGREE_MIN} THEN 1 ELSE 0 END) AS is_dup,
             MIN(CASE WHEN agree >= {AGREE_MIN} THEN rep_id END) AS dup_of
      FROM agree GROUP BY doc_id
    )
    SELECT u.doc_id,
           CAST(COALESCE(v.is_dup, 0) AS INT) AS is_dup,
           COALESCE(v.dup_of, -1) AS dup_of
    FROM u LEFT JOIN verdict v ON v.doc_id = u.doc_id
    ORDER BY u.doc_id
    """
