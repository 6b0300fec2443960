"""Deterministic mergeable distinct-count sketch per tile (HLL-style).

The classic approximate-distinct sketch (HyperLogLog) is usually
unauditable across engines because each implementation picks its own
hash.  Here the WHOLE sketch is deterministic integer Column math on a
shared md5-derived 60-bit hash, so DuckDB can recompute the registers
bit-for-bit and the driver's value-hash gate applies to an
*approximate* operator:

* hash: first 15 md5 nibbles of the id string, positionally decoded to
  a non-negative 60-bit BIGINT (the ``dedup_simhash`` md5-nibble
  technique, `dedup.py:401`);
* bucket: ``h % m`` (m = 64 registers);
* rank: position of the lowest set bit of ``h div m`` (the
  Flajolet-Martin geometric observable; trailing-zero form because
  ``bit_count((w & -w) - 1) + 1`` is pure integer SQL on both engines),
  capped at ``RHO_CAP`` for the measure-zero w == 0 case;
* register: ``max(rank)`` per (tile, bucket) — an ordinary partial-agg
  max, which is what makes the sketch MERGEABLE: coarser zooms
  max-merge the finer zoom's registers without touching raw rows
  (the ``zoom_rollup`` cascade, applied to sketch state).

Finalization keeps the harmonic mean exact-then-one-division: the
register sum ``S = sum(2^(RHO_CAP - rho)) + absent * 2^RHO_CAP`` is an
exact BIGINT (every term a power of two, total < 2^61), and the
estimate is ONE IEEE division of a shared literal by S — so even the
float column hash-matches across engines.

At 100 TB: registers are (tile, bucket) rows — at z9 x 64 buckets,
~1.7e7 rows of two longs regardless of input size; the raw table is
touched once, every coarser zoom is arithmetic on registers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_BUCKETS = 64          # registers per tile
RHO_CAP = 55            # rank cap (w has <= 54 bits; w == 0 maps here)
ALPHA_64 = 0.709        # HLL bias constant for m = 64
# exact-integer harmonic sum is scaled by 2^RHO_CAP; fold the scale
# into the one float literal so both engines do a single division
_EST_NUM = ALPHA_64 * M_BUCKETS * M_BUCKETS * float(2 ** RHO_CAP)

_HEXD = "0123456789abcdef"


def md5_hash60(hex_col: str) -> str:
    """SQL (valid in Spark AND DuckDB): positional decode of the first
    15 nibbles of an md5 hex string column into a 60-bit BIGINT."""
    # each nibble is cast to BIGINT before the scale multiply: the small
    # power-of-16 literals fit INT, and INT*INT overflows under ANSI mode
    terms = " + ".join(
        f"CAST(instr('{_HEXD}', substr({hex_col}, {j}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (15 - j)}"
        for j in range(1, 16))
    return f"({terms})"


def rho_rank(w: str) -> str:
    """SQL (both engines): rank of the lowest set bit of non-negative
    BIGINT ``w`` (1-based), RHO_CAP when w == 0."""
    return (f"(CASE WHEN {w} = 0 THEN {RHO_CAP} "
            f"ELSE bit_count(({w} & -{w}) - 1) + 1 END)")


def hll_row_observables(df: DataFrame, key_cols: list, id_col: str,
                        barriers: bool = True) -> DataFrame:
    """(key_cols..., bucket, rho): the per-ROW geometric observable —
    the map-side half of the sketch, exposed separately so the
    streaming operator can feed a stateful max-merge.

    The 15-term nibble decode is materialized ONCE per row behind
    nondeterministic barriers: without them, project collapsing would
    re-inline the md5 hex into all 15 nibble terms and the decoded
    value into every downstream reference (the training_mix lesson).
    ``barriers=False`` is for STREAMING inputs, where Spark forbids
    nondeterministic expressions — there the collapsed projection
    leans on physical-plan common-subexpression elimination (on by
    default) to dedup the repeated md5/decode, which is acceptable
    because the stateful operator downstream is the slow path anyway."""
    def b(i):
        return ([F.monotonically_increasing_id().alias(f"_b{i}")]
                if barriers else [])

    hashed = df.select(
        *key_cols, F.md5(F.col(id_col).cast("string")).alias("_hx"), *b(1))
    hq = hashed.select(
        *key_cols, F.expr(md5_hash60("_hx")).alias("_h"), *b(2))
    wq = hq.select(
        *key_cols,
        F.expr(f"_h % {M_BUCKETS}").alias("bucket"),
        F.expr(f"_h div {M_BUCKETS}").alias("_w"), *b(3))
    return wq.select(*key_cols, "bucket", F.expr(rho_rank("_w")).alias("rho"))


def hll_registers(df: DataFrame, key_cols: list, id_col: str) -> DataFrame:
    """(key_cols..., bucket, rho): max-rank register table — one row
    per (key, occupied bucket).  Pure JVM Column math + one partial-agg
    max; the output is mergeable sketch state."""
    reg = hll_row_observables(df, key_cols, id_col)
    return reg.groupBy(*key_cols, "bucket").agg(F.max("rho").alias("rho"))


def hll_merge(reg: DataFrame, new_keys: dict) -> DataFrame:
    """Merge registers to a coarser key: max over the re-keyed buckets.
    ``new_keys``: output name -> Column over the register frame."""
    keyed = reg.select(
        *[col.alias(name) for name, col in new_keys.items()], "bucket", "rho")
    return keyed.groupBy(*new_keys.keys(), "bucket").agg(
        F.max("rho").alias("rho"))


def _lc_case(v_expr: str) -> str:
    """SQL (both engines): LinearCounting estimate ``m * ln(m / V)`` as
    a 63-entry literal lookup on the empty-register count V — ln() is
    ulp-unstable across engines, but V only takes 64 values, so the
    doubles are computed ONCE in Python and embedded as identical
    literals on both sides."""
    import math

    whens = " ".join(
        f"WHEN {v} THEN {M_BUCKETS * math.log(M_BUCKETS / v)!r}"
        for v in range(1, M_BUCKETS))
    return f"(CASE {v_expr} {whens} ELSE 0.0 END)"


# standard HLL small-range switch: raw estimate below 2.5*m uses
# LinearCounting when any register is empty
_LC_THRESHOLD = 2.5 * M_BUCKETS


def hll_finalize(reg: DataFrame, key_cols: list) -> DataFrame:
    """(key_cols..., hll_sum, est_hll): exact BIGINT harmonic sum over
    the m registers (absent buckets contribute rank 0 == 2^RHO_CAP),
    then the single-division raw estimate with the standard small-range
    LinearCounting correction (literal-table form, engine-exact)."""
    agg = reg.groupBy(*key_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {RHO_CAP} - rho)"))
         .alias("_s_present"),
        F.count(F.lit(1)).alias("_n_present"))
    s = (F.col("_s_present")
         + (F.lit(M_BUCKETS) - F.col("_n_present"))
         * F.lit(1 << RHO_CAP).cast("long"))
    raw = F.lit(_EST_NUM) / s.cast("double")
    v = F.lit(M_BUCKETS) - F.col("_n_present")
    est = F.when((raw <= F.lit(_LC_THRESHOLD)) & (v >= 1),
                 F.expr(_lc_case(f"({M_BUCKETS} - _n_present)"))
                 ).otherwise(raw)
    return agg.select(
        *key_cols,
        s.cast("long").alias("hll_sum"),
        est.alias("est_hll"))


def sql_hll_tile(level_tx: str, level_ty: str, from_clause: str,
                 id_expr: str) -> str:
    """DuckDB CTE computing the finalized sketch per tile directly from
    raw rows — operation-for-operation the Spark math (md5 nibbles,
    % / // split, trailing-zero rank, exact BIGINT sum, one division).
    ``from_clause`` must yield columns used by the tile exprs and
    ``id_expr``."""
    h = md5_hash60("hx")
    raw = f"({_EST_NUM!r} / CAST(hll_sum AS DOUBLE))"
    return f"""
      SELECT tile_x, tile_y, hll_sum,
             CASE WHEN {raw} <= {_LC_THRESHOLD!r} AND v >= 1
                  THEN {_lc_case("v")} ELSE {raw} END AS est_hll
      FROM (
        SELECT tile_x, tile_y,
               CAST(s_present + ({M_BUCKETS} - n_present) * {1 << RHO_CAP} AS BIGINT) AS hll_sum,
               ({M_BUCKETS} - n_present) AS v
        FROM (
          SELECT tile_x, tile_y,
                 CAST(SUM(CAST(1 AS BIGINT) << ({RHO_CAP} - rho)) AS BIGINT) AS s_present,
                 COUNT(*) AS n_present
          FROM (
            SELECT tile_x, tile_y, bucket, MAX(rho) AS rho
            FROM (
              SELECT {level_tx} AS tile_x, {level_ty} AS tile_y,
                     {h} % {M_BUCKETS} AS bucket,
                     {rho_rank(f"(({h}) // {M_BUCKETS})")} AS rho
              FROM (SELECT *, md5(CAST({id_expr} AS VARCHAR)) AS hx
                    FROM {from_clause})
            ) GROUP BY tile_x, tile_y, bucket
          ) GROUP BY tile_x, tile_y
        )
      )
    """


# --- KMV (bottom-k) distinct sketch + sketch set operations ------------------
#
# The HLL sketch above answers "how many distinct"; the KMV (k minimum
# values / bottom-k) sketch additionally supports SET OPERATIONS on
# sketches — intersection / Jaccard between regions ("how many users
# did these two tiles share") — because the k smallest hashes of a
# union are computable from the k smallest hashes of the parts.  Same
# auditability design as HLL: the shared md5-derived 60-bit hash, pure
# integer Column math, and estimates that are a single IEEE expression
# over exact integers, so even the float columns hash-match DuckDB.
#
# Estimator (Bar-Yossef et al., "Counting distinct elements in a data
# stream", RANDOM 2002): with h_(k) the k-th smallest of n distinct
# uniform 60-bit hashes, E[n] ~= (k-1) * 2^60 / h_(k); when a key has
# fewer than k distinct hashes the sketch IS the complete set and the
# count is exact.  (k-1)*2^60 has 5 significant bits — an exact double.

KMV_K = 32
_KMV_NUM = float((KMV_K - 1) * (1 << 60))


def kmv_row_hashes(df: DataFrame, key_cols: list, id_col: str,
                   barriers: bool = True) -> DataFrame:
    """(key_cols..., h): per-ROW md5-derived 60-bit hash.  The md5 hex
    is materialized once behind a barrier (the training_mix / hll
    lesson); ``barriers=False`` for STREAMING inputs, where Spark
    forbids nondeterministic expressions (the hll pattern)."""
    b = ([F.monotonically_increasing_id().alias("_b1")]
         if barriers else [])
    hashed = df.select(
        *key_cols, F.md5(F.col(id_col).cast("string")).alias("_hx"), *b)
    return hashed.select(*key_cols, F.expr(md5_hash60("_hx")).alias("h"))


def kmv_hashes(df: DataFrame, key_cols: list, id_col: str) -> DataFrame:
    """(key_cols..., h): DISTINCT hashes per key — the map side dedups
    partially before the shuffle (dropDuplicates is an aggregate)."""
    return (kmv_row_hashes(df, key_cols, id_col)
            .dropDuplicates([*key_cols, "h"]))


def kmv_sketch(df: DataFrame, key_cols: list, id_col: str,
               k: int = KMV_K) -> DataFrame:
    """(key_cols..., rank, h): the k smallest distinct hashes per key.
    The ``row_number() <= k`` filter takes the WindowGroupLimit
    map-side prune, so sketch state per key is at most k longs however
    many rows the key holds."""
    from pyspark.sql.window import Window

    d = kmv_hashes(df, key_cols, id_col)
    w = Window.partitionBy(*key_cols).orderBy("h")
    return (d.withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= k))


def kmv_merge(bk: DataFrame, new_keys: dict, k: int = KMV_K) -> DataFrame:
    """Merge bottom-k sketches to a coarser key: union the hash lists,
    dedup, re-take the bottom k.  LOSSLESS for the coarser sketch —
    the parent's k smallest distinct hashes are always inside the
    union of its children's bottom-k lists (test-pinned merge ==
    direct)."""
    from pyspark.sql.window import Window

    keyed = bk.select(
        *[col.alias(name) for name, col in new_keys.items()], "h")
    d = keyed.dropDuplicates([*new_keys.keys(), "h"])
    w = Window.partitionBy(*new_keys.keys()).orderBy("h")
    return (d.withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= k))


def kmv_finalize(bk: DataFrame, key_cols: list,
                 k: int = KMV_K) -> DataFrame:
    """(key_cols..., n_sketch, kth_hash, est_kmv): exact count below k
    (the sketch is the complete set), else the one-expression
    (k-1)*2^60 / h_(k) estimate — long→double casts are correctly
    rounded on both engines, so the float column stays hash-exact."""
    g = bk.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max(F.when(F.col("rank") == k, F.col("h"))).alias("_kth"))
    est = (F.when(F.col("_kth").isNull(),
                  F.col("n_sketch").cast("double"))
            .otherwise(F.lit(_KMV_NUM) / F.col("_kth").cast("double")))
    return g.select(*key_cols, "n_sketch",
                    F.coalesce(F.col("_kth"), F.lit(0).cast("long"))
                     .alias("kth_hash"),
                    est.alias("est_kmv"))


def kmv_overlap_x(bk: DataFrame, k: int = KMV_K) -> DataFrame:
    """Sketch-space set intersection between horizontally-adjacent
    tiles: for each pair ((x, y), (x+1, y)) with sketches on both
    sides, rank the UNION's distinct hashes, keep the k smallest, and
    count how many of those belong to both sides (the KMV intersection
    estimator: est = matches * est_union / k).  When the union sketch
    holds fewer than k hashes, both input sketches were complete sets
    and ``matches`` IS the exact intersection size.

    Everything runs on SKETCH rows (<= 2k per pair), never raw data.

    Output: (tile_x, tile_y [left tile], matches, n_union_sketch,
    union_kth, est_inter)."""
    from pyspark.sql.window import Window

    tiles = bk.select("tile_x", "tile_y").distinct()
    rt = tiles.select((F.col("tile_x") - 1).alias("tile_x"), "tile_y")
    pairs = tiles.join(rt, ["tile_x", "tile_y"], "inner")

    a = (bk.join(pairs, ["tile_x", "tile_y"], "semi")
           .select("tile_x", "tile_y", "h",
                   F.lit(1).alias("in_a"), F.lit(0).alias("in_b")))
    b_src = bk.select((F.col("tile_x") - 1).alias("tile_x"),
                      "tile_y", "h")
    b = (b_src.join(pairs, ["tile_x", "tile_y"], "semi")
              .select("tile_x", "tile_y", "h",
                      F.lit(0).alias("in_a"), F.lit(1).alias("in_b")))
    flags = (a.unionByName(b)
              .groupBy("tile_x", "tile_y", "h")
              .agg(F.max("in_a").alias("in_a"),
                   F.max("in_b").alias("in_b")))
    w = Window.partitionBy("tile_x", "tile_y").orderBy("h")
    ranked = (flags.withColumn("rank", F.row_number().over(w))
                   .filter(F.col("rank") <= k))
    g = ranked.groupBy("tile_x", "tile_y").agg(
        F.sum(F.col("in_a") * F.col("in_b")).alias("matches"),
        F.count(F.lit(1)).alias("n_union_sketch"),
        F.max(F.when(F.col("rank") == k, F.col("h"))).alias("_kth"))
    est = (F.when(F.col("_kth").isNull(),
                  F.col("matches").cast("double"))
            .otherwise(F.col("matches").cast("double")
                       * (F.lit(_KMV_NUM) / F.col("_kth").cast("double"))
                       / F.lit(float(k))))
    # standard KMV Jaccard: matches/k on a full union sketch; on a
    # complete (sub-k) union the ratio matches/|A∪B| is EXACT
    jac = (F.when(F.col("_kth").isNull(),
                  F.col("matches").cast("double")
                  / F.col("n_union_sketch").cast("double"))
            .otherwise(F.col("matches").cast("double") / F.lit(float(k))))
    return g.select("tile_x", "tile_y", "matches", "n_union_sketch",
                    F.coalesce(F.col("_kth"), F.lit(0).cast("long"))
                     .alias("union_kth"),
                    est.alias("est_inter"),
                    jac.alias("est_jaccard"))


# --- mergeable fixed-bin histogram quantiles ------------------------------
#
# The quantile member of the mergeable-summary family (HLL distinct /
# KMV set ops above): per-key fixed-bin histograms are sketch state
# that merges by bin-wise SUM — coarse-zoom quantiles come from
# merged fine-zoom state without re-reading raw rows (the
# continuous-aggregate cascade, same shape as hll_merge).  The
# quantile rule is the exact classical one over a binned domain:
# q-th percentile = lower bound of the first bin whose cumulative
# count reaches ceil(q/100 * total) — ALL integer arithmetic, so the
# approximate operator sits under the exact value-hash gate (the bin
# width is the documented resolution).

HIST_BINS = 16
HIST_WIDTH = 64   # value domain [0, HIST_BINS * HIST_WIDTH)


def hist_registers(df: DataFrame, key_cols: list, value_col: str) -> DataFrame:
    """(key_cols..., b0..b{HIST_BINS-1}): per-key bin counts — one
    partial-agg'd groupBy, mergeable sketch state (values past the top
    bin clamp into it)."""
    b = F.expr(f"least(CAST({value_col} AS BIGINT) div {HIST_WIDTH}, "
               f"{HIST_BINS - 1})")
    return (df.withColumn("_bin", b)
            .groupBy(*key_cols)
            .agg(*[F.sum(F.when(F.col("_bin") == i, 1).otherwise(0))
                   .alias(f"b{i}") for i in range(HIST_BINS)]))


def hist_merge(reg: DataFrame, new_keys: dict) -> DataFrame:
    """Merge histograms to a coarser key: bin-wise SUM over the
    re-keyed rows.  ``new_keys``: output name -> Column."""
    keyed = reg.select(
        *[col.alias(name) for name, col in new_keys.items()],
        *[f"b{i}" for i in range(HIST_BINS)])
    return keyed.groupBy(*new_keys.keys()).agg(
        *[F.sum(f"b{i}").alias(f"b{i}") for i in range(HIST_BINS)])


def hist_quantiles(reg: DataFrame, key_cols: list,
                   qs: tuple = (50, 90)) -> DataFrame:
    """Finalize histogram state to exact binned quantiles: per q the
    LOWER BOUND of the first bin whose cumulative count reaches
    rank = ceil(q/100 * total).  Output: key_cols..., n_rows, and one
    ``p{q}`` column per requested percentile — all BIGINT."""
    total = " + ".join(f"b{i}" for i in range(HIST_BINS))
    out = reg.withColumn("n_rows", F.expr(f"({total})"))
    cols = list(key_cols) + [F.col("n_rows")]
    for q in qs:
        cols.append(F.expr(hist_quantile_case(q)).alias(f"p{q}"))
    return out.select(*cols)


def hist_quantile_case(q: int) -> str:
    """SQL CASE selecting the q-th percentile bin lower bound —
    division-free (``cum >= ceil(q*n/100)`` <=> ``100*cum >= q*n`` for
    integers), so the TEXT is shared verbatim with the DuckDB oracle."""
    branches = []
    cum = ""
    for i in range(HIST_BINS):
        cum = f"{cum} + b{i}" if cum else f"b{i}"
        branches.append(f"WHEN ({cum}) * 100 >= n_rows * {q} THEN "
                        f"CAST({i * HIST_WIDTH} AS BIGINT)")
    return ("CASE " + " ".join(branches)
            + f" ELSE CAST({(HIST_BINS - 1) * HIST_WIDTH} AS BIGINT) END")


# --- count-min sketch ------------------------------------------------------
#
# Cormode & Muthukrishnan (2005, public literature): a d x w counter
# grid; every item increments one counter per row (bucket = a slice of
# its hash), a point query reads the MIN over its d counters.  Always
# an OVERestimate (never under), error <= n/w per row with probability
# 1 - 2^-d.  Counters are SUMS, so the sketch is mergeable and
# order-independent — the streaming twin equals the batch operator
# bit-for-bit, and a DuckDB oracle can recompute every counter and
# estimate EXACTLY (the third sketch family under the value-hash gate,
# beside HLL and KMV: CMS answers FREQUENCY, they answer DISTINCT).

CMS_D = 4    # hash rows: 4 disjoint 15-bit slices of the 60-bit hash
CMS_W = 64   # buckets per row (bucket = slice & 63)


def cms_counters(df: DataFrame, key_cols: list, item_col: str,
                 barriers: bool = True) -> DataFrame:
    """(key_cols..., j, b, cnt): the non-zero CMS counters per key.
    Bucket j of an item = bits [15j, 15j+6) of its md5-derived 60-bit
    hash — four structurally independent slices, identical expression
    text on both engines.  One partial-agg'd Exchange over the 4x
    explode; per-key state is bounded by d*w = 256 counters however
    many rows arrive.  ``barriers=False`` for streaming inputs."""
    b1 = ([F.monotonically_increasing_id().alias("_b1")]
          if barriers else [])
    hashed = df.select(
        *key_cols, F.md5(F.col(item_col).cast("string")).alias("_hx"), *b1)
    b2 = ([F.monotonically_increasing_id().alias("_b2")]
          if barriers else [])
    hs = hashed.select(
        *key_cols, F.expr(md5_hash60("_hx")).alias("h"), *b2)
    sends = hs.select(
        *key_cols,
        F.explode(F.expr(
            f"transform(sequence(0, {CMS_D - 1}), j -> struct(j AS j, "
            f"shiftrightunsigned(h, 15 * j) & {CMS_W - 1} AS b))"))
        .alias("e"))
    return (sends.groupBy(*key_cols, F.col("e.j").alias("j"),
                          F.col("e.b").alias("b"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_probe_buckets(items) -> list:
    """Driver-side (item, j, bucket) rows for a literal probe set —
    hashlib.md5 reproduces the engines' md5-nibble decode exactly.
    Shared by the Column plan, the DuckDB oracle's VALUES list, and
    the streaming twin."""
    import hashlib

    out = []
    for it in items:
        h = int(hashlib.md5(str(it).encode()).hexdigest()[:15], 16)
        for j in range(CMS_D):
            out.append((int(it), j, (h >> (15 * j)) & (CMS_W - 1)))
    return out


def cms_estimate(counters: DataFrame, key_cols: list,
                 probes: list) -> DataFrame:
    """(key_cols..., probe, est): the CMS point estimate of each probe
    item's frequency per key — min over the d counters (absent
    counter = 0).  The probe side is a driver-computed literal
    (bounded), broadcast against the distinct-key skeleton so every
    (key, probe) reports even when all its counters are empty."""
    spark = counters.sparkSession
    pdf = spark.createDataFrame(cms_probe_buckets(probes),
                                "probe long, j int, b long")
    keys = counters.select(*key_cols).distinct()
    skel = keys.join(F.broadcast(pdf))
    joined = (skel.join(counters.withColumnRenamed("cnt", "_cnt"),
                        [*key_cols, "j", "b"], "left")
              .select(*key_cols, "probe",
                      F.coalesce("_cnt", F.lit(0)).alias("c")))
    return (joined.groupBy(*key_cols, "probe")
            .agg(F.min("c").alias("est")))


# --- Bloom filter membership sketch ------------------------------------------
#
# Bloom (CACM 1970, public literature): an m-bit array; every item sets
# k bit positions, a membership probe reads them back — all k set =>
# "maybe present" (false positives possible, rate ~ (1-e^{-kn/m})^k),
# any bit clear => DEFINITELY absent (false negatives impossible; the
# query's ``fn_ok`` column asserts that guarantee per probe row).  The
# FOURTH mergeable sketch family: HLL answers distinct, KMV set-ops,
# CMS frequency — Bloom answers MEMBERSHIP.  The bit array is a
# bitwise-OR monoid, so coarser keys merge children's words by OR
# without re-reading raw rows (same cascade as hll_merge), and the
# sketch state is (key, word, bits) integer rows a DuckDB oracle
# recomputes bit-for-bit from the shared md5-derived 60-bit hash.
#
# Layout: BLOOM_M = 256 bits packed as 8x 32-bit words in BIGINTs.
# Positions are the k = 4 disjoint 15-bit hash slices each masked to
# 8 bits (the CMS slicing); 32-bit words keep every shift strictly
# below 32 — DuckDB's BIGINT << overflows at 63, and the margin means
# neither engine ever touches the sign bit.

BLOOM_M = 256   # bits per filter
BLOOM_K = 4     # positions per item: slice j = (h >> 15j) & (BLOOM_M-1)
_BLOOM_W = 32   # bits per packed word -> BLOOM_M // _BLOOM_W = 8 words


def bloom_words(df: DataFrame, key_cols: list, item_col: str,
                barriers: bool = True) -> DataFrame:
    """(key_cols..., w, bits): the non-zero Bloom words per key — one
    partial-agg'd Exchange over the k-way explode (bit_or is an
    ordinary partial aggregate, so map-side combine folds duplicate
    items before any shuffle).  Per-key state is bounded at 8 words
    however many rows arrive.  ``barriers=False`` for streaming inputs
    (the hll/cms pattern); with barriers the 60-bit hash materializes
    once per row and the lambda references stay O(1)."""
    b1 = ([F.monotonically_increasing_id().alias("_b1")]
          if barriers else [])
    hashed = df.select(
        *key_cols, F.md5(F.col(item_col).cast("string")).alias("_hx"), *b1)
    b2 = ([F.monotonically_increasing_id().alias("_b2")]
          if barriers else [])
    hs = hashed.select(
        *key_cols, F.expr(md5_hash60("_hx")).alias("h"), *b2)
    pos = f"(shiftrightunsigned(h, 15 * j) & {BLOOM_M - 1})"
    sends = hs.select(
        *key_cols,
        F.explode(F.expr(
            f"transform(sequence(0, {BLOOM_K - 1}), j -> struct("
            f"CAST({pos} div {_BLOOM_W} AS INT) AS w, "
            f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % {_BLOOM_W} AS INT)) AS mask))"))
        .alias("e"))
    return (sends.groupBy(*key_cols, F.col("e.w").alias("w"))
            .agg(F.bit_or(F.col("e.mask")).alias("bits")))


def bloom_merge(words: DataFrame, new_keys: dict) -> DataFrame:
    """Merge Bloom words to a coarser key: bit_or over the re-keyed
    rows.  OR-associativity makes the merged filter IDENTICAL to one
    built directly from the raw rows (the oracle asserts exactly that:
    Spark merges fine-zoom state, DuckDB rebuilds coarse from raw)."""
    keyed = words.select(
        *[col.alias(name) for name, col in new_keys.items()], "w", "bits")
    return keyed.groupBy(*new_keys.keys(), "w").agg(
        F.bit_or("bits").alias("bits"))


def bloom_probe_words(items) -> list:
    """Driver-side (item, w, need_mask) rows for a literal probe set —
    hashlib.md5 reproduces the engines' md5-nibble decode exactly; the
    k positions collapse per word into one required mask.  Shared by
    the Column plan and the DuckDB oracle's VALUES list."""
    import hashlib

    out = []
    for it in items:
        h = int(hashlib.md5(str(it).encode()).hexdigest()[:15], 16)
        need = {}
        for j in range(BLOOM_K):
            p = (h >> (15 * j)) & (BLOOM_M - 1)
            need[p // _BLOOM_W] = need.get(p // _BLOOM_W, 0) | (1 << (p % _BLOOM_W))
        out.extend((it, w, m) for w, m in sorted(need.items()))
    return out


def bloom_member(words: DataFrame, key_cols: list, probes: list) -> DataFrame:
    """(key_cols..., probe, member): the Bloom membership verdict per
    (key, probe) — member = 1 iff every required word has all its
    probe bits set.  The probe side is a driver-computed literal
    broadcast against the distinct-key skeleton so every (key, probe)
    reports even when the key's words are all absent."""
    spark = words.sparkSession
    # schema inferred: probe keeps the caller's type (long OR string)
    pdf = spark.createDataFrame(bloom_probe_words(probes),
                                ["probe", "w", "need"])
    keys = words.select(*key_cols).distinct()
    skel = keys.join(F.broadcast(pdf))
    joined = (skel.join(words.withColumnRenamed("bits", "_bits"),
                        [*key_cols, "w"], "left")
              .select(*key_cols, "probe",
                      (F.coalesce("_bits", F.lit(0).cast("long"))
                        .bitwiseAND(F.col("need")) == F.col("need"))
                      .cast("int").alias("_hitw")))
    return (joined.groupBy(*key_cols, "probe")
            .agg(F.min("_hitw").alias("member")))


# --- Bloom-pruned join (the bloom-join; Bratbergsengen 1984) ------------------
#
# The classic distributed-join prune: compress the dim side's key set
# into an m-bit Bloom filter (~BLOOM_JOIN_BPE bits per key instead of
# the key bytes themselves), ship it to every task, and drop big-side
# rows that cannot possibly join BEFORE the shuffle.  False positives
# only waste shuffle bytes — the real join removes them — so the
# output is EXACTLY the plain join's (oracle-checkable with ordinary
# join SQL).  False negatives are impossible, which is the property
# that makes the prune sound.
#
# Positions use Kirsch-Mitzenmacher double hashing (g_i = h1 + i*h2
# mod m) on the shared md5-derived 60-bit hash so the filter works at
# any power-of-two m, not just the 256-bit sketch layout.  The filter
# itself is ONE array<long> row built by a distributed bit_or
# aggregate and broadcast; at BLOOM_JOIN_BPE = 10 bits/key the driver
# holds ~1.25 bytes per dim key (10-100x smaller than the keys), and
# BLOOM_JOIN_MAX_WORDS caps the array the way Spark caps its own
# runtime bloom filters — past the cap the fp rate degrades
# gracefully, the result never changes.

BLOOM_JOIN_BPE = 10                 # target bits per distinct dim key
BLOOM_JOIN_K = 4                    # probe positions per key
BLOOM_JOIN_MAX_WORDS = 1 << 20     # 2^26 bits = 8 MiB filter cap


def _bloom_join_positions(m: int) -> str:
    """SQL fragment list: the BLOOM_JOIN_K bit positions of 60-bit
    hash column ``h`` in an m-bit filter (m a power of two) via
    double hashing — h2 is forced odd so it is coprime with m and the
    k positions never collapse onto one."""
    return [f"pmod(pmod(h, {m}) + {i} * (1 + 2 * pmod(h div {m}, {m // 2})), {m})"
            for i in range(BLOOM_JOIN_K)]


def bloom_filter_words(small: DataFrame, key_col: str,
                       m_words: int) -> list:
    """Driver-side list of ``m_words`` longs: the Bloom filter of the
    dim side's DISTINCT keys.  Built distributed (explode k positions,
    bit_or per word — one partial-agg'd Exchange over <= m_words
    rows), then collected: the collect is O(m_words), bounded by the
    cap regardless of dim cardinality."""
    m = m_words * 64
    hs = (small.select(F.md5(F.col(key_col).cast("string")).alias("_hx"),
                       F.monotonically_increasing_id().alias("_b1"))
          .select(F.expr(md5_hash60("_hx")).alias("h"),
                  F.monotonically_increasing_id().alias("_b2")))
    pos_exprs = ", ".join(_bloom_join_positions(m))
    rows = (hs.select(F.explode(F.expr(f"array({pos_exprs})")).alias("p"))
            .groupBy((F.col("p") / 64).cast("int").alias("w"))
            .agg(F.bit_or(F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"))
                .alias("bits"))
            .collect())
    words = [0] * m_words
    for r in rows:
        words[r.w] = r.bits
    return words


def bloom_join_m_words(n_keys: int) -> int:
    """Power-of-two word count targeting BLOOM_JOIN_BPE bits per key,
    capped at BLOOM_JOIN_MAX_WORDS (past the cap fp degrades, results
    never change)."""
    want = max(1, (n_keys * BLOOM_JOIN_BPE + 63) // 64)
    m_words = 1
    while m_words < want:
        m_words *= 2
    return min(m_words, BLOOM_JOIN_MAX_WORDS)


def bloom_prune(big: DataFrame, small: DataFrame, big_key: str,
                small_key: str) -> DataFrame:
    """``big`` minus the rows whose key CANNOT be in ``small`` — the
    map-only half of the bloom-join, exposed separately so callers
    (and tests) can measure the prune.  Never drops a true match
    (no-false-negative); survivors may include false positives.

    The filter rides in a one-row broadcast DataFrame (array<long>
    cell), not a plan literal: a million-word filter would otherwise
    inflate the plan tree, and a broadcast row keeps the bit tests
    inside whole-stage codegen via element_at."""
    n = small.select(small_key).distinct().count()
    m_words = bloom_join_m_words(n)
    words = bloom_filter_words(small.select(small_key).distinct(),
                               small_key, m_words)
    spark = big.sparkSession
    bf = spark.createDataFrame([(words,)], "bf: array<bigint>")
    m = m_words * 64
    # two collapse barriers (the cms_counters lesson): _bb1 pins the
    # md5 hex, _bb2 pins the decoded h — the k*2 position references
    # in the bit tests would otherwise re-inline the 15-term decode
    probed = (big
              .withColumn("_hx", F.md5(F.col(big_key).cast("string")))
              .withColumn("_bb1", F.monotonically_increasing_id())
              .withColumn("h", F.expr(md5_hash60("_hx")))
              .withColumn("_bb2", F.monotonically_increasing_id())
              .crossJoin(F.broadcast(bf)))
    hit = None
    for p in _bloom_join_positions(m):
        t = F.expr(f"(element_at(bf, CAST(({p}) div 64 AS INT) + 1) "
                   f"& shiftleft(CAST(1 AS BIGINT), CAST(({p}) % 64 AS INT))) != 0")
        hit = t if hit is None else (hit & t)
    return probed.filter(hit).drop("_hx", "_bb1", "h", "_bb2", "bf")


def bloom_prune_join(big: DataFrame, small: DataFrame, big_key: str,
                     small_key: str, how: str = "semi") -> DataFrame:
    """``big`` joined to ``small`` with the Bloom prune in front: big
    rows whose key cannot be in the dim side are dropped MAP-ONLY
    before any Exchange; survivors go through the ordinary join, which
    removes the false positives — output == plain join, exactly."""
    pruned = bloom_prune(big, small, big_key, small_key)
    return pruned.join(small, pruned[big_key] == small[small_key], how)
