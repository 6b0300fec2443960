"""Text-analysis operators for training-data pipelines over the
``documents`` table (doc_id, text, lang, source, n_chars).

Engine-side everything is JVM Column math (no Python in the hot path);
each operator has a matching DuckDB oracle generator so semantics are
pinned by the driver's value-hash gate:

* token counting — whitespace tokens + a BPE-ish wordpiece estimate.
* quality scoring — length, punctuation ratio, stopword ratio,
  mean token length, alpha ratio.
* language ID — stopword-occurrence scores over fixed wordlists,
  argmax with deterministic tie-break.
* fingerprinting — md5 of whitespace-normalized lowercase text
  (content-defined exact-dup key).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..io_scan import read_sf

STOPWORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "que", "es", "de"],
}

PUNCT = [".", ",", "!", "?", ";", ":"]


def _occurrences(col_expr: str, needle: str) -> str:
    """SQL expression: occurrence count of ``needle`` in ``col_expr`` —
    (len(s) - len(replace(s, needle, ''))) / len(needle), identical
    semantics in Spark SQL and DuckDB."""
    esc = needle.replace("'", "''")
    return (f"(length({col_expr}) - length(replace({col_expr}, '{esc}', '')))"
            f" / {len(needle)}")


_NT = "lower(trim(text))"
_PADDED = f"(' ' || {_NT} || ' ')"
# whitespace token count: collapse runs of spaces first
_SQUASHED = f"regexp_replace(trim(text), '\\\\s+', ' ')"
_TOKENS = f"(CASE WHEN length({_SQUASHED}) = 0 THEN 0 ELSE {_occurrences(_SQUASHED, ' ')} + 1 END)"


# BPE-ish subword count: GPT-2-style pre-tokenization (letter runs,
# digit runs, punctuation runs, each with an optional leading space —
# no lookahead, so Java regex and RE2 agree), then each run contributes
# ceil(len/4) subword pieces (wordpiece-style length splitting).
_BPE_RE = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"
_BPE_COUNT_SPARK = (
    f"aggregate(regexp_extract_all(lower({_SQUASHED}), '{_BPE_RE}', 0), 0L, "
    f"(acc, t) -> acc + CAST(floor((length(trim(t)) + 3) / 4.0) AS BIGINT))")
_BPE_COUNT_DUCK = (
    f"CAST(coalesce(list_sum(list_transform("
    f"regexp_extract_all(lower({_SQUASHED}), '{_BPE_RE}'), "
    f"t -> CAST(floor((length(trim(t)) + 3) / 4.0) AS BIGINT))), 0) AS BIGINT)")


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + two subword estimates: the classic
    chars/4 heuristic and a BPE-ish regex segmentation (GPT-2-style
    pre-tokenizer runs, ceil(len/4) pieces per run) — all pure Column
    math, oracle-pinned in DuckDB."""
    df = read_sf(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        F.expr(_TOKENS).cast("long").alias("n_tokens"),
        F.ceil(F.length(F.expr(_SQUASHED)) / F.lit(4)).cast("long").alias("n_bpe_est"),
        F.expr(_BPE_COUNT_SPARK).alias("n_bpe_regex"),
    )


def sql_token_count() -> str:
    return f"""
    SELECT doc_id,
           CAST({_TOKENS} AS BIGINT) AS n_tokens,
           CAST(ceil(length({_SQUASHED}) / 4) AS BIGINT) AS n_bpe_est,
           {_BPE_COUNT_DUCK} AS n_bpe_regex
    FROM documents
    """


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality metrics; ratio expressions use the exact same operation
    order as the oracle SQL, so the IEEE doubles (and thus the value
    hash) match bit-for-bit without any rounding."""
    df = read_sf(spark, sf_dir, "documents")
    punct = " + ".join(_occurrences("text", p) for p in PUNCT)
    stop = " + ".join(_occurrences(_PADDED, f" {w} ") for w in STOPWORDS["en"])
    return df.select(
        "doc_id",
        F.length("text").cast("long").alias("len_chars"),
        F.expr(_TOKENS).cast("long").alias("n_tokens"),
        F.expr(f"CASE WHEN length(text) = 0 THEN 0.0 ELSE "
               f"CAST({punct} AS DOUBLE) / length(text) END").alias("punct_ratio"),
        F.expr(f"CASE WHEN {_TOKENS} = 0 THEN 0.0 ELSE "
               f"CAST({stop} AS DOUBLE) / CAST({_TOKENS} AS DOUBLE) END").alias("stopword_ratio"),
    )


def sql_quality() -> str:
    punct = " + ".join(_occurrences("text", p) for p in PUNCT)
    stop = " + ".join(_occurrences(_PADDED, f" {w} ") for w in STOPWORDS["en"])
    return f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS len_chars,
           CAST({_TOKENS} AS BIGINT) AS n_tokens,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE CAST({punct} AS DOUBLE) / length(text) END AS punct_ratio,
           CASE WHEN {_TOKENS} = 0 THEN 0.0
                ELSE CAST({stop} AS DOUBLE) / CAST({_TOKENS} AS DOUBLE) END AS stopword_ratio
    FROM documents
    """


def _lang_scores() -> dict:
    return {lang: " + ".join(_occurrences(_PADDED, f" {w} ") for w in words)
            for lang, words in STOPWORDS.items()}


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-free stopword language ID: score per language, argmax with
    alphabetical tie-break; 'und' (undetermined) when all scores are 0."""
    df = read_sf(spark, sf_dir, "documents")
    scores = _lang_scores()
    langs = sorted(scores)
    score_cols = [F.expr(scores[l]).alias(f"_s_{l}") for l in langs]
    df = df.select("doc_id", "lang", *score_cols)
    best = F.greatest(*[F.col(f"_s_{l}") for l in langs])
    pred = F.lit("und")
    for l in reversed(langs):  # earlier langs win ties -> apply in reverse
        pred = F.when(F.col(f"_s_{l}") == best, F.lit(l)).otherwise(pred)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    return df.select("doc_id", pred.alias("pred_lang"),
                     (F.col("lang") == pred).cast("int").alias("agrees"))


def sql_lang_id() -> str:
    scores = _lang_scores()
    langs = sorted(scores)
    best = "greatest(" + ", ".join(f"({scores[l]})" for l in langs) + ")"
    case = "CASE "
    case += f"WHEN {best} <= 0 THEN 'und' "
    for l in langs:
        case += f"WHEN ({scores[l]}) = {best} THEN '{l}' "
    case += "ELSE 'und' END"
    return f"""
    SELECT doc_id, {case} AS pred_lang,
           CAST(lang = ({case}) AS INT) AS agrees
    FROM documents
    """


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text — the exact-dedup key (content-defined, stable)."""
    df = read_sf(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        F.md5(F.expr(f"lower({_SQUASHED})")).alias("fingerprint"),
    )


def sql_fingerprint() -> str:
    return f"""
    SELECT doc_id, md5(lower({_SQUASHED})) AS fingerprint FROM documents
    """


# --- training-mix construction ---------------------------------------------

# per-language keep rates for the corpus mix, applied via a
# deterministic integer hash (Knuth multiplicative, identical BIGINT
# arithmetic in Spark and DuckDB — no engine RNG anywhere, so the mix
# is reproducible row-for-row and the oracle hash-matches)
MIX_RATES = {"en": 1000, "de": 500, "fr": 250, "es": 250, "und": 100}  # per-mille
MIX_MIN_TOKENS = 5
MIX_MAX_PUNCT = 0.2
# doc_id is masked to 31 bits BEFORE the Knuth multiply: the raw
# product doc_id * 2654435761 leaves int64 once doc_id > ~3.47e9
# (Spark wraps to a negative whose % stays negative — downsampling
# silently disabled; DuckDB raises), at odds with 10^12-row ids.
# (x % 2^31 + 2^31) % 2^31 is in [0, 2^31) even for negative ids, so
# the product tops out at ~5.7e18 < 2^63 on both engines.
_MIX_HASH = ("((((doc_id % 2147483648 + 2147483648) % 2147483648)"
             " * 2654435761) % 1000)")


def _mix_rate_case(lang_expr: str) -> str:
    whens = " ".join(f"WHEN '{l}' THEN {r}" for l, r in sorted(MIX_RATES.items()))
    return f"(CASE {lang_expr} {whens} ELSE {MIX_RATES['und']} END)"


def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix construction — the step that turns raw documents into
    a training mix: quality gate (min tokens, max punctuation ratio),
    language ID, then per-language downsampling by a deterministic hash
    so the mix ratios are exact and reproducible (no RNG, no
    shuffle-order dependence).  Pure Column math end to end; at 100 TB
    this is a map-only scan that prunes to the kept fraction before
    any downstream shuffle."""
    langs = sorted(STOPWORDS)
    df = read_sf(spark, sf_dir, "documents")
    # Normalize text ONCE per row; the barrier id stops Catalyst
    # project collapsing from re-inlining the normalization tree into
    # every counter downstream.  Counters are per-NEEDLE-LIST aggregate
    # folds over literal arrays (one occurrence template per list, the
    # needle is the lambda variable) instead of N unrolled occurrence
    # expressions: the naive unrolled form exceeded Janino's 64KB
    # method limit for the fused stage and fell back to interpreted
    # execution for the whole pipeline.
    df = df.select(
        "doc_id", "text",
        F.expr(_PADDED).alias("_pad"),
        F.expr(_SQUASHED).alias("_sq"),
        F.monotonically_increasing_id().alias("_barrier"))

    def occ_sum(col: str, needles: list) -> F.Column:
        arr = F.array(*[F.lit(n) for n in needles])
        return F.aggregate(
            arr, F.lit(0).cast("long"),
            lambda acc, w: acc + ((F.length(F.col(col))
                                   - F.length(F.replace(F.col(col), w)))
                                  / F.length(w)).cast("long"))

    n_tokens = F.expr(
        "CASE WHEN length(_sq) = 0 THEN 0 ELSE "
        f"{_occurrences('_sq', ' ')} + 1 END")
    punct_n = occ_sum("text", PUNCT)
    df = df.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.when(F.length("text") == 0, F.lit(0.0))
         .otherwise(punct_n.cast("double") / F.length("text")).alias("punct_ratio"),
        *[occ_sum("_pad", [f" {w} " for w in STOPWORDS[l]]).alias(f"_s_{l}")
          for l in langs],
        F.monotonically_increasing_id().alias("_barrier2"))
    best = F.greatest(*[F.col(f"_s_{l}") for l in langs])
    pred = F.lit("und")
    # the keep-rate is a SIBLING CASE over the same score predicates,
    # not a CASE nested on pred_lang: nesting re-inlines the whole
    # pred expression into every WHEN and blows Janino's 64KB method
    # limit (codegen falls back to interpreted — measured 7x slower)
    rate = F.lit(MIX_RATES["und"])
    for l in reversed(langs):
        match = F.col(f"_s_{l}") == best
        pred = F.when(match, F.lit(l)).otherwise(pred)
        rate = F.when(match, F.lit(MIX_RATES.get(l, MIX_RATES["und"]))).otherwise(rate)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    rate = F.when(best <= 0, F.lit(MIX_RATES["und"])).otherwise(rate)
    df = (df.withColumn("pred_lang", pred).withColumn("_rate", rate)
            .filter((F.col("n_tokens") >= MIX_MIN_TOKENS)
                    & (F.col("punct_ratio") <= MIX_MAX_PUNCT))
            .filter(F.expr(_MIX_HASH) < F.col("_rate")))
    return (df.select("doc_id", "pred_lang", "n_tokens",
                      F.expr(_MIX_HASH).cast("int").alias("mix_bucket"))
            .orderBy("doc_id"))


def sql_training_mix() -> str:
    scores = _lang_scores()
    langs = sorted(scores)
    punct = " + ".join(_occurrences("text", p) for p in PUNCT)
    best = "greatest(" + ", ".join(f"({scores[l]})" for l in langs) + ")"
    case = f"CASE WHEN {best} <= 0 THEN 'und' "
    for l in langs:
        case += f"WHEN ({scores[l]}) = {best} THEN '{l}' "
    case += "ELSE 'und' END"
    return f"""
    WITH scored AS (
      SELECT doc_id,
             CAST({_TOKENS} AS BIGINT) AS n_tokens,
             CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST({punct} AS DOUBLE) / length(text) END AS punct_ratio,
             {case} AS pred_lang
      FROM documents
    )
    SELECT doc_id, pred_lang, n_tokens,
           CAST({_MIX_HASH} AS INT) AS mix_bucket
    FROM scored
    WHERE n_tokens >= {MIX_MIN_TOKENS} AND punct_ratio <= {MIX_MAX_PUNCT}
      AND {_MIX_HASH} < {_mix_rate_case("pred_lang")}
    ORDER BY doc_id
    """


# --- sequence packing ------------------------------------------------------

PACK_CAP = 256            # token capacity of one training sequence
PACK_MIN_BUCKETS = 8      # floor keeps tiny corpora on the old shard count
PACK_TARGET_DOCS = 4096   # docs per shard target — shards GROW with the corpus


def pack_buckets(n_docs: int) -> int:
    """Shard count for sequence packing: ceil(n/PACK_TARGET_DOCS) with a
    floor of PACK_MIN_BUCKETS.  Derived from corpus size (not a
    constant) so no shard ever holds more than ~PACK_TARGET_DOCS docs —
    at 10^12 docs this is ~2.4e8 shards of 4096 docs, each a trivially
    small unit of sequential work.  Mirrors the DuckDB-side expression
    GREATEST(8, CEIL(COUNT(*) / 4096.0)) exactly (integer ceil == float
    ceil for n < 2^52)."""
    return max(PACK_MIN_BUCKETS, -(-int(n_docs) // PACK_TARGET_DOCS))


def _pack_batches(batches):
    """Greedy fixed-capacity packing as a fold-with-carry over Arrow
    batches.  State is three scalars (open bucket, open sequence index,
    fill); rows arrive sorted by (bucket, doc_id) within the partition,
    so a bucket change resets the fold.  Peak resident memory is ONE
    Arrow batch — never a whole shard (the old applyInPandas shape
    materialized 1/buckets of the corpus in a single pandas group).
    The per-row fold is inherently sequential (fill depends on the
    previous row); the loop body is scalar numpy reads, O(batch)."""
    cur = None
    seq = 0
    fill = 0
    for pdf in batches:
        if not len(pdf):
            continue
        bks = pdf["bucket"].to_numpy()
        toks = pdf["n_tokens"].to_numpy()
        out = np.empty(len(pdf), dtype=np.int64)
        for i in range(len(pdf)):
            b, t = bks[i], toks[i]
            if b != cur:
                cur, seq, fill = b, 0, int(t)
            elif fill + t > PACK_CAP:
                seq += 1
                fill = int(t)
            else:
                fill += int(t)
            out[i] = seq
        yield pdf.assign(seq_idx=out)[["doc_id", "bucket", "n_tokens", "seq_idx"]]


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the step after token counting in a training
    pipeline: greedily pack documents (in doc_id order) into
    fixed-capacity sequences.  Greedy packing is SEQUENTIAL by
    definition, so parallelism comes from deterministic shards
    (``doc_id % pack_buckets(n)``); the shard count scales with the
    corpus (see ``pack_buckets``) and each shard streams through a
    sorted-partition ``mapInPandas`` fold-with-carry (the
    encode.py:238 shape) instead of materializing as one pandas group.
    Roll rule (same on both engines): a non-first doc opens a new
    sequence when it would overflow the capacity."""
    df = read_sf(spark, sf_dir, "documents")
    buckets = pack_buckets(df.count())
    toks = df.select(
        "doc_id",
        F.expr(_TOKENS).cast("long").alias("n_tokens"),
        (F.col("doc_id") % buckets).cast("int").alias("bucket"))
    # partitions bounded by the cluster, not the shard count: many
    # complete shards stream through one partition back-to-back
    n_parts = max(1, min(buckets, spark.sparkContext.defaultParallelism * 2))
    out = (toks.repartition(n_parts, "bucket")
               .sortWithinPartitions("bucket", "doc_id")
               .mapInPandas(_pack_batches,
                            "doc_id long, bucket int, n_tokens long, seq_idx long"))
    return out.orderBy("doc_id")


# --- repetition metrics (Gopher / MassiveText quality filtering) -----------

# The corpus has no line structure (synth docs are single-line word
# streams), so the repetition signals are the word-n-gram family from
# the Gopher filtering rules (Rae et al. 2021, table A1): fraction of
# characters in the most frequent 2-gram, and fraction of characters
# in duplicated 3-grams.  Both are exact integer ratios (one IEEE
# division of exact ints on both engines), so the oracle hash-matches.


def _gram_structs(arr: str, n: int) -> str:
    """SQL: array<struct<n:int, gram:string>> of word ``n``-grams of
    array column ``arr`` (words joined by one space) — arrays_zip of n
    slices, so ``arr`` is referenced a constant number of times per row
    (see the project-collapsing note above dedup._sliding3)."""
    ln = f"greatest(size({arr}) - {n - 1}, 0)"
    slices = ", ".join(f"slice({arr}, {i + 1}, {ln})" for i in range(n))
    joined = ", ' ', ".join(f"s['{i}']" for i in range(n))
    return (f"transform(arrays_zip({slices}), "
            f"s -> struct({n} as n, concat({joined}) as gram))")


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics (the Gopher repetition filters):

    * ``top_bigram_frac`` — chars covered by occurrences of the most
      frequent word 2-gram / total chars (ties broken by smallest
      gram, so the answer is deterministic);
    * ``dup_tri_frac`` — chars covered by occurrences of word 3-grams
      that occur more than once / total chars (overlapping occurrences
      counted per occurrence, so highly repetitive docs can read > 1 —
      the filter thresholds on "large", not "<= 1").

    Scale shape: tokenization + gram construction are map-side Column
    math (one explode), then two hash aggregations — (doc, n, gram)
    counts with map-side partial agg, then a per-doc fold.  Shuffle
    volume is O(distinct grams per doc), keys are (doc_id, gram) —
    uniformly spread, no skew even when one document is pathological."""
    df = read_sf(spark, sf_dir, "documents")
    # materialize the token array ONCE behind a nondeterministic
    # barrier: the gram builders reference it 5x per row, and without
    # the barrier project collapsing would re-inline the regex
    # normalization into every slice
    toks = df.select(
        "doc_id",
        F.length(F.expr(_SQUASHED)).cast("long").alias("total_chars"),
        F.split(F.expr(_SQUASHED), " ").alias("t"),
        F.monotonically_increasing_id().alias("_barrier"))
    grams = (toks
             .select("doc_id", "total_chars",
                     F.explode(F.concat(F.expr(_gram_structs("t", 2)),
                                        F.expr(_gram_structs("t", 3)))).alias("g"))
             .select("doc_id", "total_chars",
                     F.col("g.n").alias("n"), F.col("g.gram").alias("gram")))
    cnt = (grams.groupBy("doc_id", "n", "gram")
                .agg(F.count(F.lit(1)).alias("cnt"),
                     F.max("total_chars").alias("total_chars")))
    per_doc = cnt.groupBy("doc_id").agg(
        F.max("total_chars").alias("total_chars"),
        # min over (-cnt, gram): largest count, then smallest gram
        F.min(F.when(F.col("n") == 2,
                     F.struct((-F.col("cnt")).alias("neg"),
                              F.col("gram").alias("gram")))).alias("top"),
        F.sum(F.when((F.col("n") == 3) & (F.col("cnt") > 1),
                     F.col("cnt") * F.length("gram"))
               .otherwise(F.lit(0))).alias("dup_tri_chars"),
        F.sum(F.when(F.col("n") == 2, F.col("cnt"))
               .otherwise(F.lit(0))).alias("n_bigrams"))
    return per_doc.select(
        "doc_id",
        F.col("top.gram").alias("top_bigram"),
        (-F.col("top.neg")).alias("top_bigram_n"),
        (F.expr("CAST((-top.neg) * length(top.gram) AS DOUBLE)")
         / F.col("total_chars")).alias("top_bigram_frac"),
        (F.col("dup_tri_chars").cast("double")
         / F.col("total_chars")).alias("dup_tri_frac"),
        "n_bigrams")


def sql_doc_repetition() -> str:
    return f"""
    WITH base AS (SELECT doc_id, {_SQUASHED} AS sq FROM documents),
    toks AS (SELECT doc_id, CAST(length(sq) AS BIGINT) AS total_chars,
                    string_split(sq, ' ') AS t FROM base),
    grams AS (
      SELECT doc_id, total_chars, 2 AS n, t[i] || ' ' || t[i + 1] AS gram
      FROM toks, UNNEST(range(1, len(t))) AS u(i)
      UNION ALL
      SELECT doc_id, total_chars, 3,
             t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
      FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
    ),
    cnt AS (SELECT doc_id, n, gram, COUNT(*) AS cnt,
                   MAX(total_chars) AS total_chars
            FROM grams GROUP BY doc_id, n, gram),
    top AS (SELECT doc_id, gram, cnt,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY cnt DESC, gram ASC) AS rn
            FROM cnt WHERE n = 2),
    aggd AS (SELECT doc_id, MAX(total_chars) AS total_chars,
                    CAST(SUM(CASE WHEN n = 3 AND cnt > 1
                             THEN cnt * length(gram) ELSE 0 END) AS BIGINT)
                        AS dup_tri_chars,
                    CAST(SUM(CASE WHEN n = 2 THEN cnt ELSE 0 END) AS BIGINT)
                        AS n_bigrams
             FROM cnt GROUP BY doc_id)
    SELECT a.doc_id, t.gram AS top_bigram, CAST(t.cnt AS BIGINT) AS top_bigram_n,
           CAST(t.cnt * length(t.gram) AS DOUBLE) / a.total_chars AS top_bigram_frac,
           CAST(a.dup_tri_chars AS DOUBLE) / a.total_chars AS dup_tri_frac,
           a.n_bigrams
    FROM aggd a JOIN top t ON t.doc_id = a.doc_id AND t.rn = 1
    """


# --- per-source cap (domain balancing) -------------------------------------

DOMAIN_CAP = 15  # kept docs per source


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the domain-balancing step of corpus
    construction (C4/RefinedWeb cap the contribution of any one
    domain): keep at most DOMAIN_CAP docs per ``source``, chosen by
    md5(doc_id) order so the sample is deterministic, content-blind,
    and stable under corpus growth (a doc's keep/drop flips only when
    enough LOWER-hashed docs arrive in its source, never on re-order).

    Scale shape: one shuffle on ``source``; the ``row_number() <= k``
    filter triggers Spark's WindowGroupLimit pushdown, so each map
    task pre-prunes to k rows per source BEFORE the exchange — a hot
    domain with 1e9 docs ships k rows per map partition, not 1e9."""
    from pyspark.sql.window import Window

    df = read_sf(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (df.withColumn("samp_rank", F.row_number().over(w))
              .filter(F.col("samp_rank") <= DOMAIN_CAP)
              .select("doc_id", "source", F.col("samp_rank").cast("int")
                      .alias("samp_rank")))


def sql_domain_cap() -> str:
    return f"""
    SELECT doc_id, source, CAST(samp_rank AS INT) AS samp_rank
    FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                 AS samp_rank
      FROM documents
    ) WHERE samp_rank <= {DOMAIN_CAP}
    """


# --- context-window chunking ------------------------------------------------

CHUNK_TOKS = 64     # tokens per training chunk
CHUNK_STRIDE = 48   # stride between chunk starts (overlap = 16)


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking — split each document into overlapping
    fixed-size token windows (the step that turns long documents into
    training examples; stride < size keeps boundary context).  Chunk k
    starts at token ``k*stride`` while that is inside the document;
    the final chunk may be short.

    Scale shape: MAP-ONLY — tokenize once (behind a collapse barrier),
    explode a start-offset sequence, slice + re-join per chunk.  Zero
    shuffles, zero Python; output size is input tokens x (size/stride)
    amortized, and every executor streams independently — the ideal
    100-TB plan shape."""
    df = read_sf(spark, sf_dir, "documents")
    toks = df.select(
        "doc_id",
        F.split(F.expr(_SQUASHED), " ").alias("t"),
        F.monotonically_increasing_id().alias("_barrier"))
    out = (toks
           .withColumn("start_tok", F.explode(F.expr(
               f"sequence(0, greatest(size(t) - 1, 0), {CHUNK_STRIDE})")))
           .select("doc_id",
                   F.expr(f"start_tok div {CHUNK_STRIDE}").cast("int")
                    .alias("chunk_idx"),
                   F.col("start_tok").cast("int").alias("start_tok"),
                   F.expr(f"slice(t, start_tok + 1, {CHUNK_TOKS})").alias("_c"))
           .select("doc_id", "chunk_idx", "start_tok",
                   F.size("_c").cast("int").alias("n_toks"),
                   F.array_join("_c", " ").alias("chunk_text")))
    return out


def sql_doc_chunks() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split({_SQUASHED}, ' ') AS t FROM documents
    ),
    st AS (
      SELECT doc_id, t, CAST(s AS INT) AS start_tok
      FROM toks, UNNEST(generate_series(0, greatest(len(t) - 1, 0),
                                        {CHUNK_STRIDE})) AS u(s)
    )
    SELECT doc_id,
           CAST(start_tok // {CHUNK_STRIDE} AS INT) AS chunk_idx,
           start_tok,
           CAST(len(list_slice(t, start_tok + 1, start_tok + {CHUNK_TOKS})) AS INT)
               AS n_toks,
           array_to_string(list_slice(t, start_tok + 1, start_tok + {CHUNK_TOKS}), ' ')
               AS chunk_text
    FROM st
    """


# --- salient terms (keyword extraction) ------------------------------------

TOP_TERMS_K = 3


def q_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document salient terms: the TOP_TERMS_K terms ranked by
    (term frequency DESC, document frequency ASC, term ASC) — a
    tf-idf-shaped salience order kept integer-exact (the multiplicative
    tf*ln(N/df) score is float and ulp-unstable across engines; the
    lexicographic (tf, rarity) order preserves "frequent here, rare
    elsewhere" with a hash-exact oracle).

    Scale shape: explode -> (doc, term) tf counts (partial agg), a
    term-keyed join against the vocabulary-sized df table (AQE
    broadcasts it when it fits; web-scale vocab shuffles on term — a
    well-spread key), then a per-doc top-k whose rank<=k filter takes
    the WindowGroupLimit map-side prune."""
    from pyspark.sql.window import Window

    df = read_sf(spark, sf_dir, "documents")
    words = df.select("doc_id",
                      F.explode(F.split(F.expr(_SQUASHED), " ")).alias("term"))
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc())
    return (tf.join(dfreq, "term")
              .withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= TOP_TERMS_K)
              .select("doc_id", "term", "tf", "df",
                      F.col("rank").cast("int").alias("rank")))


def sql_salient_terms() -> str:
    return f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split({_SQUASHED}, ' ')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC)
                 AS rank
      FROM tf JOIN dfreq ON tf.term = dfreq.term
    ) WHERE rank <= {TOP_TERMS_K}
    """


def sql_sequence_pack() -> str:
    nb = f"GREATEST({PACK_MIN_BUCKETS}, CAST(CEIL(COUNT(*) / {PACK_TARGET_DOCS}.0) AS BIGINT))"
    return f"""
    WITH RECURSIVE nb AS (
      SELECT {nb} AS b FROM documents
    ),
    toks AS (
      SELECT doc_id,
             CAST({_TOKENS} AS BIGINT) AS n_tokens,
             CAST(doc_id % nb.b AS INT) AS bucket,
             ROW_NUMBER() OVER (PARTITION BY doc_id % nb.b
                                ORDER BY doc_id) AS rn
      FROM documents, nb
    ),
    step(bucket, rn, doc_id, n_tokens, seq_idx, fill) AS (
      SELECT bucket, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
      FROM toks WHERE rn = 1
      UNION ALL
      SELECT t.bucket, t.rn, t.doc_id, t.n_tokens,
             CASE WHEN s.fill + t.n_tokens > {PACK_CAP}
                  THEN s.seq_idx + 1 ELSE s.seq_idx END,
             CASE WHEN s.fill + t.n_tokens > {PACK_CAP}
                  THEN t.n_tokens ELSE s.fill + t.n_tokens END
      FROM step s JOIN toks t ON t.bucket = s.bucket AND t.rn = s.rn + 1
    )
    SELECT doc_id, bucket, n_tokens, seq_idx
    FROM step ORDER BY doc_id
    """


# --- benchmark decontamination ------------------------------------------
#
# The GPT-3 / Llama training-data step: drop (or at least flag) training
# documents that share an n-gram with the evaluation benchmarks, so test
# answers are not memorized from the corpus.  Public pipelines use word
# 13-grams; the synthetic corpus draws from a ~30-word vocabulary whose
# 13-grams (and even 6-grams) never collide, so the driver query uses
# DECON_N = 4 to exercise the hit path — the operator takes n as a
# parameter and nothing in the plan shape changes with it.

DECON_N = 4        # words per shingle (13 in GPT-3; tiny synthetic vocab)
DECON_EVAL_MOD = 97  # doc_id % MOD == RES selects the "benchmark" docs
DECON_EVAL_RES = 3


def _gram_array(arr: str, n: int) -> str:
    """SQL: array<string> of word ``n``-grams of array column ``arr``
    (words joined by one space) — arrays_zip of n slices, same
    constant-references-per-row shape as `_gram_structs`."""
    ln = f"greatest(size({arr}) - {n - 1}, 0)"
    slices = ", ".join(f"slice({arr}, {i + 1}, {ln})" for i in range(n))
    joined = ", ' ', ".join(f"s['{i}']" for i in range(n))
    return f"transform(arrays_zip({slices}), s -> concat({joined}))"


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training documents sharing any word DECON_N-gram with the
    benchmark subset (doc_id % DECON_EVAL_MOD == DECON_EVAL_RES).

    Output per NON-benchmark document: total shingles, hit occurrences
    (every overlapping occurrence counts), distinct hit shingles, and
    the contaminated 0/1 verdict — all integers, hash-exact.

    Scale shape: the benchmark side is a FIXED eval suite (thousands of
    documents however big the corpus grows), so its distinct-shingle
    set is broadcast; the corpus side is tokenize -> explode -> one
    broadcast-hash semi-ish join, all map-side, then ONE partial-agg'd
    groupBy(doc_id) shuffle of hit counters and a doc_id-keyed left
    join back onto the (id, n_grams) skeleton.  Raw text never
    shuffles; per-row fan-out is bounded by the token count."""
    df = read_sf(spark, sf_dir, "documents")
    is_eval = (F.col("doc_id") % DECON_EVAL_MOD) == DECON_EVAL_RES
    # token array behind a collapse barrier (see q_doc_repetition)
    toks = df.select(
        "doc_id",
        F.split(F.expr(_SQUASHED), " ").alias("t"),
        F.monotonically_increasing_id().alias("_barrier"))
    grams = toks.select(
        "doc_id", F.explode(F.expr(_gram_array("t", DECON_N))).alias("gram"))
    eval_grams = grams.filter(is_eval).select("gram").distinct()
    hits = (grams.filter(~is_eval)
                 .join(F.broadcast(eval_grams), "gram")
                 .groupBy("doc_id")
                 .agg(F.count(F.lit(1)).alias("hit_grams"),
                      F.countDistinct("gram").alias("distinct_hits")))
    skeleton = toks.filter(~is_eval).select(
        "doc_id",
        F.greatest(F.size("t") - (DECON_N - 1), F.lit(0))
         .cast("long").alias("n_grams"))
    return (skeleton.join(hits, "doc_id", "left")
            .select("doc_id", "n_grams",
                    F.coalesce("hit_grams", F.lit(0)).cast("long")
                     .alias("hit_grams"),
                    F.coalesce("distinct_hits", F.lit(0)).cast("long")
                     .alias("distinct_hits"),
                    F.when(F.coalesce("hit_grams", F.lit(0)) > 0, 1)
                     .otherwise(0).cast("int").alias("contaminated")))


def sql_decontaminate() -> str:
    n = DECON_N
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split({_SQUASHED}, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, array_to_string(t[i:i + {n - 1}], ' ') AS gram
      FROM toks, UNNEST(range(1, len(t) - {n - 2})) AS u(i)
    ),
    eval_g AS (
      SELECT DISTINCT gram FROM grams
      WHERE doc_id % {DECON_EVAL_MOD} = {DECON_EVAL_RES}
    ),
    hits AS (
      SELECT g.doc_id,
             CAST(COUNT(*) AS BIGINT) AS hit_grams,
             CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS distinct_hits
      FROM grams g JOIN eval_g e USING (gram)
      WHERE g.doc_id % {DECON_EVAL_MOD} <> {DECON_EVAL_RES}
      GROUP BY g.doc_id
    )
    SELECT t.doc_id,
           CAST(GREATEST(len(t.t) - {n - 1}, 0) AS BIGINT) AS n_grams,
           COALESCE(h.hit_grams, 0) AS hit_grams,
           COALESCE(h.distinct_hits, 0) AS distinct_hits,
           CAST(CASE WHEN COALESCE(h.hit_grams, 0) > 0
                THEN 1 ELSE 0 END AS INT) AS contaminated
    FROM toks t LEFT JOIN hits h ON t.doc_id = h.doc_id
    WHERE t.doc_id % {DECON_EVAL_MOD} <> {DECON_EVAL_RES}
    """


# --- vocabulary growth (Heaps' law) --------------------------------------

VOCAB_LADDER = [50, 100, 200, 500]  # corpus-prefix sizes (doc_id < k)


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: for each corpus prefix
    (documents with ``doc_id < k``), the exact document count, token
    total, distinct-term vocabulary size, and type-token ratio — the
    corpus-health statistic that says whether a crawl is still adding
    novel language or re-crawling the same material (vocabulary should
    grow ~ tokens^beta, beta ~ 0.5).

    Scale shape: one explode + ONE partial-agg'd groupBy(term) reduces
    the corpus to (term, first_doc) — min combines map-side, the
    shuffle ships one row per distinct term; the whole ladder is then
    a single wide conditional-SUM aggregation (one row), joined to the
    token-side ladder (also one row) and unpivoted map-only.  Adding
    rungs widens a row; it never re-reads the corpus."""
    df = read_sf(spark, sf_dir, "documents")
    toks = df.select("doc_id", F.expr(_TOKENS).cast("long").alias("nt"))
    first = (df.select("doc_id",
                       F.explode(F.split(F.expr(_SQUASHED), " "))
                        .alias("term"))
             .filter(F.col("term") != "")
             .groupBy("term").agg(F.min("doc_id").alias("fd")))
    vocab = first.agg(*[
        F.sum(F.when(F.col("fd") < k, 1).otherwise(0)).alias(f"v_{k}")
        for k in VOCAB_LADDER])
    tok = toks.agg(*[c for k in VOCAB_LADDER for c in (
        F.sum(F.when(F.col("doc_id") < k, 1).otherwise(0)).alias(f"d_{k}"),
        F.sum(F.when(F.col("doc_id") < k, F.col("nt"))
               .otherwise(F.lit(0))).alias(f"t_{k}"))])
    ladder = vocab.join(F.broadcast(tok)).select(F.explode(F.array(*[
        F.struct(F.lit(k).cast("long").alias("k"),
                 F.coalesce(F.col(f"d_{k}"), F.lit(0))
                  .cast("long").alias("n_docs"),
                 F.coalesce(F.col(f"t_{k}"), F.lit(0))
                  .cast("long").alias("n_tokens"),
                 F.coalesce(F.col(f"v_{k}"), F.lit(0))
                  .cast("long").alias("vocab"))
        for k in VOCAB_LADDER])).alias("e"))
    return ladder.select(
        F.col("e.k").alias("k"), F.col("e.n_docs").alias("n_docs"),
        F.col("e.n_tokens").alias("n_tokens"),
        F.col("e.vocab").alias("vocab"),
        F.expr("CASE WHEN e.n_tokens = 0 THEN CAST(0 AS DOUBLE) "
               "ELSE CAST(e.vocab AS DOUBLE) / CAST(e.n_tokens AS DOUBLE) "
               "END").alias("ttr"))


def sql_vocab_growth() -> str:
    values = ", ".join(f"({k})" for k in VOCAB_LADDER)
    return f"""
    WITH toks AS (
      SELECT doc_id, CAST({_TOKENS} AS BIGINT) AS nt FROM documents
    ),
    terms AS (
      SELECT doc_id, unnest(string_split({_SQUASHED}, ' ')) AS term
      FROM documents
    ),
    firsts AS (
      SELECT term, MIN(doc_id) AS fd FROM terms
      WHERE term <> '' GROUP BY term
    )
    SELECT CAST(k.k AS BIGINT) AS k,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM toks
            WHERE doc_id < k.k) AS n_docs,
           (SELECT CAST(COALESCE(SUM(nt), 0) AS BIGINT) FROM toks
            WHERE doc_id < k.k) AS n_tokens,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM firsts
            WHERE fd < k.k) AS vocab,
           CASE WHEN (SELECT COALESCE(SUM(nt), 0) FROM toks
                      WHERE doc_id < k.k) = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST((SELECT COUNT(*) FROM firsts WHERE fd < k.k)
                          AS DOUBLE)
                   / CAST((SELECT COALESCE(SUM(nt), 0) FROM toks
                           WHERE doc_id < k.k) AS DOUBLE)
           END AS ttr
    FROM (VALUES {values}) AS k(k)
    ORDER BY k
    """


# --- per-document novelty ---------------------------------------------------

NOVELTY_N = 3  # words per shingle


def q_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty vs the corpus prefix: the fraction of the
    doc's word 3-gram occurrences whose gram FIRST appears in this
    document (min doc_id over the corpus == this doc) — the curation
    signal between exact dedup and near-dup: a re-crawl scores ~0, a
    genuinely new document ~1, boilerplate-heavy pages in between.

    Scale shape: one explode + ONE partial-agg'd groupBy(gram) builds
    the (gram, first_doc) table (min combines map-side; one row per
    distinct gram ships); the gram-keyed join back is the only other
    shuffle, and the per-doc fold is a partial-agg'd count.  Docs too
    short for any gram report novelty 0.0 with n_grams = 0 (identical
    CASE both engines)."""
    df = read_sf(spark, sf_dir, "documents")
    toks = df.select(
        "doc_id",
        F.split(F.expr(_SQUASHED), " ").alias("t"),
        F.monotonically_increasing_id().alias("_barrier"))
    grams = toks.select(
        "doc_id",
        F.explode(F.expr(_gram_array("t", NOVELTY_N))).alias("gram"))
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (grams.join(first, "gram")
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_grams"),
                    F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1)
                           .otherwise(0)).alias("novel_grams")))
    skeleton = df.select("doc_id")
    return (skeleton.join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_grams", F.lit(0)).cast("long")
                     .alias("n_grams"),
                    F.coalesce("novel_grams", F.lit(0)).cast("long")
                     .alias("novel_grams"),
                    F.when(F.coalesce("n_grams", F.lit(0)) == 0,
                           F.lit(0.0).cast("double"))
                     .otherwise(F.coalesce("novel_grams", F.lit(0))
                                .cast("double")
                                / F.coalesce("n_grams", F.lit(0))
                                .cast("double")).alias("novelty"))
            .orderBy("doc_id"))


def sql_doc_novelty() -> str:
    n = NOVELTY_N
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split({_SQUASHED}, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, array_to_string(t[i:i + {n - 1}], ' ') AS gram
      FROM toks, UNNEST(range(1, len(t) - {n - 2})) AS u(i)
    ),
    firsts AS (
      SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY gram
    ),
    per_doc AS (
      SELECT g.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS novel_grams
      FROM grams g JOIN firsts f USING (gram)
      GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_grams, 0) AS n_grams,
           COALESCE(p.novel_grams, 0) AS novel_grams,
           CASE WHEN COALESCE(p.n_grams, 0) = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(COALESCE(p.novel_grams, 0) AS DOUBLE)
                   / CAST(COALESCE(p.n_grams, 0) AS DOUBLE)
           END AS novelty
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
    """


# --- bigram collocation lift (PMI family) ----------------------------------

BIGRAM_MIN = 5  # report floor: bigrams seen at least this often


def q_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram collocations: for every adjacent word pair
    seen >= BIGRAM_MIN times, the observed/expected ratio ("lift" —
    the PMI argument before the log: PMI = ln(lift)) against the
    bigram-position marginals:

      lift = c_xy * N_bigrams / (c_left * c_right)

    carried as the exact int64 fraction lift_num/lift_den with ONE
    correctly-rounded division for the double (the ln is left to the
    consumer — monotone in lift, and dropping it keeps the oracle
    gate exact).

    Scale shape: the explode touches raw rows once and partial-aggs
    into (lhs, rhs) counts — ONE shuffle on a well-spread key; both
    marginals and the total derive FROM the vocab^2-bounded bigram
    table (never a second raw pass), and AQE broadcasts them when
    small.  The split() is evaluated once per row behind a
    nondeterministic barrier column (Catalyst project collapsing
    would otherwise inline it per element)."""
    df = read_sf(spark, sf_dir, "documents")
    toks = df.select(
        F.split(F.expr(_SQUASHED), " ").alias("t"),
        F.monotonically_increasing_id().alias("_barrier"))
    big = (toks.filter(F.size("t") >= 2)
           .select("t", F.explode(F.expr("sequence(2, size(t))"))
                   .alias("i"))
           .select(F.expr("t[i - 2]").alias("lhs"),
                   F.expr("t[i - 1]").alias("rhs")))
    bg = big.groupBy("lhs", "rhs").agg(F.count(F.lit(1)).alias("c_xy"))
    left = bg.groupBy("lhs").agg(F.sum("c_xy").alias("c_left"))
    right = bg.groupBy("rhs").agg(F.sum("c_xy").alias("c_right"))
    tot = bg.agg(F.sum("c_xy").alias("n_bigrams"))
    return (bg.filter(F.col("c_xy") >= BIGRAM_MIN)
            .join(left, "lhs").join(right, "rhs")
            .join(F.broadcast(tot))
            .select("lhs", "rhs",
                    F.col("c_xy").cast("long").alias("c_xy"),
                    F.col("c_left").cast("long").alias("c_left"),
                    F.col("c_right").cast("long").alias("c_right"),
                    F.col("n_bigrams").cast("long").alias("n_bigrams"),
                    (F.col("c_xy") * F.col("n_bigrams")).cast("long")
                    .alias("lift_num"),
                    (F.col("c_left") * F.col("c_right")).cast("long")
                    .alias("lift_den"),
                    ((F.col("c_xy") * F.col("n_bigrams")).cast("double")
                     / (F.col("c_left") * F.col("c_right")).cast("double"))
                    .alias("lift"))
            .orderBy("lhs", "rhs"))


def sql_bigram_lift() -> str:
    return f"""
    WITH toks AS (
      SELECT string_split({_SQUASHED}, ' ') AS t FROM documents
    ),
    big AS (
      SELECT t[i - 1] AS lhs, t[i] AS rhs
      FROM toks, UNNEST(generate_series(2, len(t))) AS u(i)
      WHERE len(t) >= 2
    ),
    bg AS (SELECT lhs, rhs, COUNT(*) AS c_xy FROM big GROUP BY 1, 2),
    l AS (SELECT lhs, SUM(c_xy) AS c_left FROM bg GROUP BY 1),
    r AS (SELECT rhs, SUM(c_xy) AS c_right FROM bg GROUP BY 1),
    tot AS (SELECT SUM(c_xy) AS n_bigrams FROM bg)
    SELECT bg.lhs, bg.rhs,
           CAST(bg.c_xy AS BIGINT) AS c_xy,
           CAST(l.c_left AS BIGINT) AS c_left,
           CAST(r.c_right AS BIGINT) AS c_right,
           CAST(tot.n_bigrams AS BIGINT) AS n_bigrams,
           CAST(bg.c_xy * tot.n_bigrams AS BIGINT) AS lift_num,
           CAST(l.c_left * r.c_right AS BIGINT) AS lift_den,
           CAST(CAST(bg.c_xy * tot.n_bigrams AS BIGINT) AS DOUBLE)
             / CAST(CAST(l.c_left * r.c_right AS BIGINT) AS DOUBLE)
               AS lift
    FROM bg JOIN l USING (lhs) JOIN r USING (rhs) CROSS JOIN tot
    WHERE bg.c_xy >= {BIGRAM_MIN}
    ORDER BY lhs, rhs
    """


# --- Pareto skyline over quality metrics ------------------------------------

SKYLINE_SCHEMA = "doc_id long, m_tokens long, m_negpunct long, m_stop long"


def doc_metrics(docs: DataFrame) -> DataFrame:
    """Three integer maximize-all quality axes per doc: whitespace
    tokens, NEGATED punctuation count (fewer is better), and English
    stopword hits (fluency) — the shared expression strings both
    engines evaluate."""
    punct = " + ".join(_occurrences("text", p) for p in PUNCT)
    stop = " + ".join(_occurrences(_PADDED, f" {w} ")
                      for w in STOPWORDS["en"])
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr(_TOKENS).cast("long").alias("m_tokens"),
        (-F.expr(f"({punct})")).cast("long").alias("m_negpunct"),
        F.expr(f"({stop})").cast("long").alias("m_stop"))


def pareto_skyline(metrics: DataFrame, dims: tuple) -> DataFrame:
    """Skyline (Pareto-optimal set, maximize every dim): rows no
    other row weakly dominates — the multi-objective "best documents"
    query (no single quality score ranks across conflicting axes).

    Scale plan: the skyline operator distributes by ALGEBRA, not by
    luck — skyline(U) == skyline(union of per-partition skylines), so
    phase 1 prunes each Arrow batch to its local skyline inside
    `mapInPandas` (vectorized numpy dominance, never leaves the
    executor), and phase 2 verifies only the surviving candidates
    against each other (a candidates x candidates broadcast join —
    candidate count is output-bounded, orders of magnitude under n).
    Equal metric vectors dominate neither way (both kept — standard
    skyline semantics), so the result is deterministic."""
    import numpy as np

    cols = list(metrics.columns)
    dlist = list(dims)

    def local(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = pdf[dlist].to_numpy()
            keep = np.ones(len(X), dtype=bool)
            for i in range(len(X)):
                dom = (X >= X[i]).all(axis=1) & (X > X[i]).any(axis=1)
                if dom.any():
                    keep[i] = False
            out = pdf[keep]
            if len(out):
                yield out

    cand = metrics.mapInPandas(local, metrics.schema)
    other = cand.select(*[F.col(c).alias(f"_o_{c}") for c in cols])
    ge = [F.col(f"_o_{d}") >= F.col(d) for d in dlist]
    gt = [F.col(f"_o_{d}") > F.col(d) for d in dlist]
    dominated = ge[0]
    for c in ge[1:]:
        dominated = dominated & c
    strictly = gt[0]
    for c in gt[1:]:
        strictly = strictly | c
    hits = (cand.join(F.broadcast(other), dominated & strictly, "left_semi"))
    return cand.join(hits, cols, "left_anti")


def q_doc_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal documents over (tokens, -punctuation, stopword
    fluency) — the multi-objective corpus-curation shortlist."""
    docs = read_sf(spark, sf_dir, "documents")
    m = doc_metrics(docs)
    return (pareto_skyline(m, ("m_tokens", "m_negpunct", "m_stop"))
            .orderBy("doc_id"))


def sql_doc_skyline() -> str:
    punct = " + ".join(_occurrences("text", p) for p in PUNCT)
    stop = " + ".join(_occurrences(_PADDED, f" {w} ")
                      for w in STOPWORDS["en"])
    return f"""
    WITH m AS (
      SELECT doc_id,
             CAST({_TOKENS} AS BIGINT) AS m_tokens,
             CAST(-({punct}) AS BIGINT) AS m_negpunct,
             CAST(({stop}) AS BIGINT) AS m_stop
      FROM documents
    )
    SELECT d.doc_id, d.m_tokens, d.m_negpunct, d.m_stop
    FROM m d
    WHERE NOT EXISTS (
      SELECT 1 FROM m e
      WHERE e.m_tokens >= d.m_tokens
        AND e.m_negpunct >= d.m_negpunct
        AND e.m_stop >= d.m_stop
        AND (e.m_tokens > d.m_tokens OR e.m_negpunct > d.m_negpunct
             OR e.m_stop > d.m_stop)
    )
    ORDER BY d.doc_id
    """


# --- PII redaction --------------------------------------------------------------

# Web-scale caption/document corpora are scrubbed of contact details
# before training.  Patterns are spelled WITHOUT backslashes
# ('[0-9]', '[.]', '[+]' instead of \d, \., \+) so the IDENTICAL
# literal parses to the identical regex on both engines: Spark SQL
# escape-processes backslashes inside string literals while DuckDB
# takes them raw, so any '\\d'-style spelling means different regexes
# on the two sides.  Within this subset (no lookaround, no backrefs,
# greedy bounded quantifiers) Java regex and RE2 produce the same
# leftmost-greedy match set.
#
# Order matters and is part of the contract: emails first (their local
# parts can contain digit runs a later pattern would nibble), then
# dotted quads, then international-format phones (a leading '[+]'
# keeps arbitrary in-corpus digit runs — years, ids — out of scope).
PII_PATTERNS = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}", "<IP>"),
    ("phone", "[+][0-9][0-9 -]{7,}[0-9]", "<PHONE>"),
]


def pii_stages(text_expr: str, engine: str):
    """[(name, count_expr, scrubbed_expr_so_far)] — each class is
    counted on the text with every EARLIER class already scrubbed, so
    the count equals the number of replacements that stage performs
    (an email's digits can't also be billed as a phone)."""
    stages = []
    e = text_expr
    for name, pat, repl in PII_PATTERNS:
        if engine == "duckdb":
            cnt = f"CAST(length(regexp_extract_all({e}, '{pat}')) AS INT)"
            e = f"regexp_replace({e}, '{pat}', '{repl}', 'g')"
        else:
            cnt = f"CAST(regexp_count({e}, '{pat}') AS INT)"
            e = f"regexp_replace({e}, '{pat}', '{repl}')"
        stages.append((name, cnt, e))
    return stages


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add per-class PII hit counts and a fully scrubbed text column —
    map-only JVM Column math (regexp in codegen), no shuffle: the
    100-TB shape is a pure projection ahead of any tokenize/pack."""
    stages = pii_stages(text_col, "spark")
    out = df
    for name, cnt, _ in stages:
        out = out.withColumn(f"n_{name}", F.expr(cnt))
    return out.withColumn("scrubbed", F.expr(stages[-1][2]))


# deterministic planted PII for the driver query: every 4th doc gets an
# email / phone / dotted-quad / nothing appended, derived from doc_id
# with integer-exact arithmetic (identical expression on both engines)
_PII_PLANT = (
    "(text || CASE CAST(doc_id % 4 AS INT) "
    "WHEN 0 THEN ' Contact user' || CAST(doc_id AS STRING) ||"
    " '@mail.example.com for originals.' "
    "WHEN 1 THEN ' Call +1 555 01' || CAST(doc_id % 89 + 10 AS STRING) ||"
    " ' 23 45 now.' "
    "WHEN 2 THEN ' Uploaded from 10.' || CAST(doc_id % 256 AS STRING) ||"
    " '.3.' || CAST(doc_id % 250 AS STRING) || ' last night.' "
    "ELSE ' No contact details.' END)"
)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the documents corpus (emails, dotted quads,
    international phone numbers -> typed placeholder tokens), with
    deterministic planted PII so every class is exercised; outputs the
    per-class hit counts and the md5 + length of the scrubbed text."""
    df = read_sf(spark, sf_dir, "documents")
    stages = pii_stages(_PII_PLANT, "spark")
    scrubbed = stages[-1][2]
    return df.select(
        "doc_id",
        *[F.expr(cnt).alias(f"n_{name}") for name, cnt, _ in stages],
        F.length(F.expr(scrubbed)).alias("scrub_len"),
        F.md5(F.expr(scrubbed)).alias("scrub_md5"),
    )


def sql_pii_scrub() -> str:
    stages = pii_stages(_PII_PLANT, "duckdb")
    scrubbed = stages[-1][2]
    cnts = ",\n           ".join(f"{cnt} AS n_{name}"
                                 for name, cnt, _ in stages)
    return f"""
    SELECT doc_id,
           {cnts},
           CAST(length({scrubbed}) AS INT) AS scrub_len,
           md5({scrubbed}) AS scrub_md5
    FROM documents
    """
