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

__all__ = ["asof_join"]


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
