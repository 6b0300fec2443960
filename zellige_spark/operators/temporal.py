"""As-of (most-recent-match) temporal join.

The classic time-series enrichment the reference pipeline lacks and a
trillion-row event store needs constantly: for every probe row, attach
the latest reference row with the same key whose timestamp is <= the
probe's (e.g. "which error last preceded this click", "what was the
sensor reading in force at event time").

Scale plan — union + window, NOT a range join:
  * tag both inputs, union them (map-only),
  * one shuffle partitioning by key and sorting by (ts, side, id),
  * carry the reference columns forward with last(ignorenulls) over
    ROWS UNBOUNDED PRECEDING .. CURRENT ROW,
  * keep the probe rows.
Cost is a single Exchange over |probes| + |refs| rows with a linear
running-state window — no per-probe candidate fan-out, no interval
explosion, and AQE can split a skewed key's sort spill.  A broadcast
range join would cap the reference side; an interval cross-join would
be quadratic per key.  This shape is how production engines (Flink
temporal join, QuestDB/DuckDB ASOF) execute the operator.

Determinism under timestamp ties: ordering is (ts, side, id) with the
reference side sorting BEFORE a probe at the same timestamp, so equal
timestamps match (inclusive <=) and duplicate reference timestamps
resolve to the max id — the oracle states the same total order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_overlap_join"]


def interval_overlap_join(a: DataFrame, b: DataFrame, chunk: int,
                          a_id: str = "a_id", a_s: str = "a_s",
                          a_e: str = "a_e",
                          b_id: str = "b_id", b_s: str = "b_s",
                          b_e: str = "b_e") -> DataFrame:
    """Interval overlap join: every (a, b) pair of half-open integer
    intervals [s, e) with ``max(s) < min(e)`` — validity-window
    enrichment, downtime attribution, ad-slot matching.  Point probes
    are the ``[ts, ts+1)`` special case.

    Scale plan — chunk bucketing, NOT a theta join: Spark executes a
    raw range predicate as BroadcastNestedLoopJoin (quadratic, and the
    broadcast side must fit in memory).  Instead both sides explode to
    the ``chunk``-width time buckets they cover (a runtime ``sequence``
    fan-out, ascending because e > s is enforced; plan stays O(1)
    bytes), candidates come from ONE equi-join on the bucket key, and
    the exact predicate runs in whole-stage codegen.  A pair sharing
    several buckets is emitted exactly once WITHOUT a distinct shuffle:
    the pair is OWNED by the bucket containing the overlap start
    ``max(a_s, b_s)`` — that bucket is covered by both sides by
    construction, so each pair survives the ownership filter exactly
    once (the ``crossing_pairs`` dedup idea, made shuffle-free).

    Pick ``chunk`` near the median interval length: per-row fan-out is
    ``len/chunk + 1`` buckets and per-bucket candidates stay local.
    Hot buckets (a burst of concurrent intervals) split under AQE
    skew-join like any equi-join.  Zero-or-negative-length intervals
    are dropped (half-open semantics: they contain nothing).
    """
    w = int(chunk)
    if w <= 0:
        raise ValueError("chunk must be a positive integer")

    def spread(df: DataFrame, idc: str, sc: str, ec: str,
               tag: str) -> DataFrame:
        return (df
                .filter(F.col(ec) > F.col(sc))
                .select(F.col(idc).alias(f"{tag}id"),
                        F.col(sc).cast("long").alias(f"{tag}s"),
                        F.col(ec).cast("long").alias(f"{tag}e"))
                .withColumn("_ck", F.explode(F.sequence(
                    F.expr(f"{tag}s div {w}"),
                    F.expr(f"({tag}e - 1) div {w}")))))

    ax = spread(a, a_id, a_s, a_e, "_a")
    bx = spread(b, b_id, b_s, b_e, "_b")
    ov_s = F.greatest("_as", "_bs")
    ov_e = F.least("_ae", "_be")
    return (ax.join(bx, "_ck")
            .filter((ov_s < ov_e)
                    & (F.col("_ck") == F.expr(f"greatest(_as, _bs) div {w}")))
            .select(F.col("_aid").alias(a_id), F.col("_bid").alias(b_id),
                    F.col("_as").alias(a_s), F.col("_ae").alias(a_e),
                    F.col("_bs").alias(b_s), F.col("_be").alias(b_e),
                    ov_s.alias("overlap_s"), ov_e.alias("overlap_e")))


def asof_join(probes: DataFrame, refs: DataFrame, key: str, ts: str,
              probe_cols: list[str], ref_cols: list[str],
              prefix: str = "asof_") -> DataFrame:
    """For each probe row, the latest ref row per ``key`` with
    ``refs[ts] <= probes[ts]`` (inclusive; ties resolved to the ref
    side, then max ``ref_cols[0]``).  Returns the probe columns plus
    each ref column as ``{prefix}{col}`` (null when no ref precedes).

    ``probe_cols`` / ``ref_cols`` are the payload columns to carry;
    ``ref_cols[0]`` must be a unique id (the deterministic tie-break).
    """
    p = probes.select(
        F.col(key).alias("_k"), F.col(ts).alias("_ts"), F.lit(1).alias("_side"),
        F.col(probe_cols[0]).alias("_ord"),
        *[F.col(c) for c in probe_cols],
        *[F.lit(None).cast(refs.schema[c].dataType).alias(f"_r_{c}")
          for c in ref_cols],
    )
    r = refs.select(
        F.col(key).alias("_k"), F.col(ts).alias("_ts"), F.lit(0).alias("_side"),
        F.col(ref_cols[0]).alias("_ord"),
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c)
          for c in probe_cols],
        *[F.col(c).alias(f"_r_{c}") for c in ref_cols],
    )
    w = (Window.partitionBy("_k").orderBy("_ts", "_side", "_ord")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = p.unionByName(r).select(
        "*", *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
               for c in ref_cols])
    return (carried.filter(F.col("_side") == 1)
            .select(*probe_cols, *[f"{prefix}{c}" for c in ref_cols]))
