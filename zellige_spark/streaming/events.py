"""Structured Streaming operators over the ``events`` table
(event_id, ts, user_id, event_type, value, props).

``stream_event_windows`` is the real streaming plan (readStream ->
watermark -> tumbling window agg); ``q_event_windows`` is the identical
batch plan used by the driver's correctness gate (oracle-checked vs
DuckDB).  Sums are taken over integer cents so the aggregate is
order-independent (double summation order varies across partitions and
would break exact value-hash comparison).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CENTS = "CAST(round(value * 100, 0) AS BIGINT)"


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type: row count + exact value
    sum in cents."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.sum(F.expr(_CENTS)).alias("sum_cents"))
              .select(F.unix_timestamp(F.col("win.start")).alias("window_epoch"),
                      "event_type", "n_events", "sum_cents"))


def sql_event_windows() -> str:
    # epoch seconds (BIGINT) rather than raw timestamps: timestamp dtype
    # round-trips differ between the engines; integers hash identically
    return f"""
    SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_epoch,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM({_CENTS}) AS BIGINT) AS sum_cents
    FROM events GROUP BY 1, 2
    """


def q_event_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral profile: event counts by type (pivot-free,
    conditional aggregation) + distinct types — the stateful-enrichment
    shape used to join event streams onto training corpora."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy("user_id")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.countDistinct("event_type").alias("n_types"),
                   F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
                   F.unix_timestamp(F.max("ts")).alias("last_epoch")))


def sql_event_user_stats() -> str:
    return """
    SELECT user_id, COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
           CAST(floor(epoch(MAX(ts))) AS BIGINT) AS last_epoch
    FROM events GROUP BY user_id
    """


def stream_event_windows(spark: SparkSession, input_path: str,
                         checkpoint: str, watermark: str = "2 hours",
                         output_mode: str = "complete",
                         query_name: str = "event_windows",
                         max_files_per_trigger: int | None = None):
    """The streaming form of q_event_windows: file source -> watermark ->
    tumbling window -> in-memory sink.  Late rows beyond the watermark
    are dropped; state is bounded by the watermark horizon.  In
    ``append`` mode a window row emits exactly once, after the
    watermark passes its end — the late-data semantics the
    ``test_stream_*`` suite pins with per-file micro-batches.
    Returns the StreamingQuery (caller awaits/stops)."""
    reader = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = reader.parquet(input_path)
    agg = (ev.withWatermark("ts", watermark)
             .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum(F.expr(_CENTS)).alias("sum_cents"))
             .select(F.unix_timestamp(F.col("win.start")).alias("window_epoch"),
                     "event_type", "n_events", "sum_cents"))
    return (agg.writeStream.outputMode(output_mode)
               .format("memory").queryName(query_name)
               .option("checkpointLocation", checkpoint)
               .trigger(availableNow=True)
               .start())
