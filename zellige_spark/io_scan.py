"""Scan-parallelism floor for the benchmark-scale parquet inputs.

The sf-dir tables are single-file, single-row-group parquet, so Spark's
byte-range splitting cannot parallelize the scan (one row group = one
non-empty task however high ``spark.sql.files.minPartitionNum`` goes):
every map-side stage before the first Exchange of every sf-dir query
was running on 1-3 of the session's cores (measured round 6: the
dedup shingle explode, the ann matmul, every regex/normalize pass).

``read_sf`` therefore round-robin-repartitions small low-parallelism
scans up to the session's default parallelism.  This is scale-adaptive,
not a local-mode constant:

* at real scale inputs split into >= cores file partitions, the
  condition is false and this is a no-op (no extra Exchange);
* the repartition only fires when the scanned bytes are tiny (below
  ``zellige.scan.spreadMinBytes``, default 192 KiB per scan partition),
  so the extra exchange ships at most a few MB to unlock N-way
  downstream parallelism.

Column pruning and filter pushdown still reach the scan: Catalyst
pushes deterministic projects/filters below a round-robin Repartition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_SPREAD_MIN_BYTES = 192 * 1024


def spread_scan(df: DataFrame, size_hint: int = None) -> DataFrame:
    """Raise a low-parallelism scan to the session's default
    parallelism (round-robin) when it is worth it; identity otherwise."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        parts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if parts * 2 >= target:
        return df  # already parallel enough (the at-scale path)
    try:
        min_bytes = int(spark.conf.get("zellige.scan.spreadMinBytes",
                                       str(_SPREAD_MIN_BYTES)))
    except Exception:
        min_bytes = _SPREAD_MIN_BYTES
    if size_hint is not None and size_hint < min_bytes * max(parts, 1):
        return df  # tiny dim: an exchange costs more than it buys
    return df.repartition(target)


def read_sf(spark: SparkSession, sf_dir: str, table: str,
            spread: bool = False) -> DataFrame:
    """Read ``{sf_dir}/{table}.parquet``; with ``spread=True`` apply the
    scan-parallelism floor (file size probed locally when possible).

    ``spread`` is opt-in per call site because it only pays when the
    downstream work per input row dwarfs one small exchange: paired A/B
    (3 alternating cycles, round 6) showed the vector/matmul paths
    gaining ~40% while light Column-math queries lost the ~0.1-0.3 s
    the extra exchange costs.  Callers with Arrow-UDF or wide-agg
    stages directly over the scan should pass spread=True."""
    path = f"{sf_dir}/{table}.parquet"
    df = spark.read.parquet(path)
    if not spread:
        return df
    try:
        size = os.path.getsize(path)
    except OSError:
        size = None
    return spread_scan(df, size_hint=size)
