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


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view -> click -> purchase): per stage,
    how many users progressed IN ORDER — a later-stage event counts
    only when a qualifying earlier-stage event strictly precedes it
    ((ts, event_id) order; the product-analytics staple).

    Scale shape: epochs as BIGINTs, ONE Exchange — the per-user window
    computes "qualified earlier stage seen strictly before this row"
    flags with ROWS UNBOUNDED PRECEDING .. 1 PRECEDING running maxes,
    and the groupBy(user_id) that follows reuses the window's hash
    partitioning (partition key == grouping key, no second shuffle).
    The per-stage rollup then aggregates the per-user frame (one row
    per user) to three rows; ``rate`` is users_reached / n_users, one
    long->double division under the gate."""
    from pyspark.sql.window import Window

    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("user_id", "event_type",
                  F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
                  "event_id"))
    w = (Window.partitionBy("user_id").orderBy("t", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    is_view = (F.col("event_type") == "view").cast("int")
    flagged = (ev
               .withColumn("seen_view", F.coalesce(F.max(is_view).over(w),
                                                   F.lit(0)))
               .withColumn("q_click",
                           ((F.col("event_type") == "click")
                            & (F.col("seen_view") == 1)).cast("int")))
    flagged = flagged.withColumn(
        "seen_qclick", F.coalesce(F.max("q_click").over(w), F.lit(0)))
    per_user = flagged.groupBy("user_id").agg(
        F.max(is_view).alias("s1"),
        F.max("q_click").alias("s2"),
        F.max(((F.col("event_type") == "purchase")
               & (F.col("seen_qclick") == 1)).cast("int")).alias("s3"))
    tot = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("s1").alias("u1"), F.sum("s2").alias("u2"),
        F.sum("s3").alias("u3"))
    stages = tot.select(
        "n_users",
        F.explode(F.array(
            F.struct(F.lit(1).alias("stage"), F.lit("view").alias("event"),
                     F.col("u1").cast("long").alias("users_reached")),
            F.struct(F.lit(2).alias("stage"), F.lit("click").alias("event"),
                     F.col("u2").cast("long").alias("users_reached")),
            F.struct(F.lit(3).alias("stage"),
                     F.lit("purchase").alias("event"),
                     F.col("u3").cast("long").alias("users_reached"))))
         .alias("e"))
    return stages.select(
        F.col("e.stage").cast("int").alias("stage"),
        F.col("e.event").alias("event"),
        F.col("e.users_reached").alias("users_reached"),
        F.col("n_users").cast("long").alias("n_users"),
        (F.col("e.users_reached").cast("double")
         / F.col("n_users").cast("double")).alias("rate")).orderBy("stage")


def sql_event_funnel() -> str:
    return """
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events
    ),
    f1 AS (
      SELECT user_id, event_type, t, event_id,
             COALESCE(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY t, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS seen_view
      FROM ev
    ),
    f2 AS (
      SELECT *, CASE WHEN event_type = 'click' AND seen_view = 1
                     THEN 1 ELSE 0 END AS q_click
      FROM f1
    ),
    f3 AS (
      SELECT *, COALESCE(MAX(q_click)
                         OVER (PARTITION BY user_id ORDER BY t, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) AS seen_qclick
      FROM f2
    ),
    per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
             MAX(q_click) AS s2,
             MAX(CASE WHEN event_type = 'purchase' AND seen_qclick = 1
                 THEN 1 ELSE 0 END) AS s3
      FROM f3 GROUP BY user_id
    ),
    tot AS (
      SELECT COUNT(*) AS n_users, SUM(s1) AS u1, SUM(s2) AS u2,
             SUM(s3) AS u3
      FROM per_user
    )
    SELECT CAST(s.stage AS INT) AS stage, s.event,
           CAST(CASE s.stage WHEN 1 THEN u1 WHEN 2 THEN u2 ELSE u3 END
                AS BIGINT) AS users_reached,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(CAST(CASE s.stage WHEN 1 THEN u1 WHEN 2 THEN u2 ELSE u3 END
                     AS BIGINT) AS DOUBLE)
             / CAST(CAST(n_users AS BIGINT) AS DOUBLE) AS rate
    FROM tot CROSS JOIN (VALUES (1, 'view'), (2, 'click'),
                                (3, 'purchase')) AS s(stage, event)
    ORDER BY stage
    """


WEEK_US = 7 * 86400 * 1000000


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention analysis (the funnel's sibling): users are
    cohorted by their FIRST active week; for every (cohort_week,
    offset) cell, how many of that cohort were active offset weeks
    later — the product-analytics retention triangle.

    Scale shape: ONE Exchange on user_id reduces raw events to a
    per-user (first_week, active-week set) row — collect_set is
    bounded by the calendar span, not the event count, because weeks
    are pre-deduped per user map-side inside the aggregation; the
    explode + (cohort, offset) count then runs on one row per
    (user, active week).  Weeks are absolute integer epochs div
    WEEK_US — no timestamp comparisons under the gate; ``rate`` is
    retained / cohort_size, one long->double division."""
    # integer week: div truncates toward zero; epochs here are positive
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("user_id",
                  F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) div {WEEK_US}")
                   .alias("week")))
    per_user = ev.groupBy("user_id").agg(
        F.min("week").alias("cohort_week"),
        F.collect_set("week").alias("weeks"))
    uw = per_user.select(
        "user_id", "cohort_week",
        F.explode("weeks").alias("week"))
    cells = (uw.groupBy("cohort_week",
                        (F.col("week") - F.col("cohort_week"))
                        .alias("week_offset"))
               .agg(F.count(F.lit(1)).alias("retained")))
    sizes = (per_user.groupBy("cohort_week")
             .agg(F.count(F.lit(1)).alias("cohort_size")))
    return (cells.join(sizes, "cohort_week")
            .select(F.col("cohort_week").cast("long").alias("cohort_week"),
                    F.col("week_offset").cast("long").alias("week_offset"),
                    F.col("retained").cast("long").alias("retained"),
                    F.col("cohort_size").cast("long").alias("cohort_size"),
                    (F.col("retained").cast("double")
                     / F.col("cohort_size").cast("double")).alias("rate"))
            .orderBy("cohort_week", "week_offset"))


def sql_cohort_retention() -> str:
    return f"""
    WITH ev AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {WEEK_US} AS week
      FROM events
    ),
    cohort AS (
      SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id
    ),
    cells AS (
      SELECT c.cohort_week, ev.week - c.cohort_week AS week_offset,
             COUNT(*) AS retained
      FROM ev JOIN cohort c USING (user_id)
      GROUP BY 1, 2
    ),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size FROM cohort
      GROUP BY cohort_week
    )
    SELECT CAST(cells.cohort_week AS BIGINT) AS cohort_week,
           CAST(cells.week_offset AS BIGINT) AS week_offset,
           CAST(cells.retained AS BIGINT) AS retained,
           CAST(sizes.cohort_size AS BIGINT) AS cohort_size,
           CAST(cells.retained AS DOUBLE)
             / CAST(sizes.cohort_size AS DOUBLE) AS rate
    FROM cells JOIN sizes USING (cohort_week)
    ORDER BY cohort_week, week_offset
    """


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users split into two variants
    (user_id % 2), success = any purchase event; one row with the 2x2
    contingency counts, per-variant conversion rates, and the Pearson
    chi-square statistic chi2 = n*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d))
    — numerator and denominator EXACT integers (int64 through ~1e4
    users per cell; the web-scale upgrade is the map_snap DECIMAL(38)
    pattern), each rate and the statistic ONE long->double division.

    Scale shape: one user-keyed Exchange reduces events to per-user
    (variant, converted) rows with map-side partial max; the 2x2 fold
    is a single-row aggregation."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_user = (ev.groupBy("user_id")
                .agg(F.max((F.col("event_type") == "purchase")
                           .cast("int")).alias("conv"))
                .withColumn("variant", (F.col("user_id") % 2).cast("int")))
    t = per_user.agg(
        F.sum(F.when(F.col("variant") == 0, F.col("conv"))
               .otherwise(0)).alias("a"),
        F.sum(F.when(F.col("variant") == 0, 1 - F.col("conv"))
               .otherwise(0)).alias("b"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv"))
               .otherwise(0)).alias("c"),
        F.sum(F.when(F.col("variant") == 1, 1 - F.col("conv"))
               .otherwise(0)).alias("d"))
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    det = F.col("a") * F.col("d") - F.col("b") * F.col("c")
    den = ((F.col("a") + F.col("b")) * (F.col("c") + F.col("d"))
           * (F.col("a") + F.col("c")) * (F.col("b") + F.col("d")))
    return t.select(
        (F.col("a") + F.col("b")).cast("long").alias("users_a"),
        F.col("a").cast("long").alias("conv_a"),
        (F.col("c") + F.col("d")).cast("long").alias("users_b"),
        F.col("c").cast("long").alias("conv_b"),
        F.when(F.col("a") + F.col("b") == 0, F.lit(0.0).cast("double"))
         .otherwise(F.col("a").cast("double")
                    / (F.col("a") + F.col("b")).cast("double"))
         .alias("rate_a"),
        F.when(F.col("c") + F.col("d") == 0, F.lit(0.0).cast("double"))
         .otherwise(F.col("c").cast("double")
                    / (F.col("c") + F.col("d")).cast("double"))
         .alias("rate_b"),
        (n * det * det).cast("long").alias("chi2_num"),
        den.cast("long").alias("chi2_den"),
        # a degenerate margin (no conversions at all, or a one-variant
        # population) has no defined statistic: report 0.0 on both
        # engines
        F.when(den == 0, F.lit(0.0).cast("double"))
         .otherwise((n * det * det).cast("double") / den.cast("double"))
         .alias("chi2"))


def sql_ab_test() -> str:
    return """
    WITH per_user AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS conv
      FROM events GROUP BY user_id
    ),
    t AS (
      SELECT
        CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END)
             AS BIGINT) AS a,
        CAST(SUM(CASE WHEN variant = 0 THEN 1 - conv ELSE 0 END)
             AS BIGINT) AS b,
        CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END)
             AS BIGINT) AS c,
        CAST(SUM(CASE WHEN variant = 1 THEN 1 - conv ELSE 0 END)
             AS BIGINT) AS d
      FROM per_user
    )
    SELECT CAST(a + b AS BIGINT) AS users_a,
           a AS conv_a,
           CAST(c + d AS BIGINT) AS users_b,
           c AS conv_b,
           CASE WHEN a + b = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE)
           END AS rate_a,
           CASE WHEN c + d = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE)
           END AS rate_b,
           CAST((a + b + c + d) * (a * d - b * c) * (a * d - b * c)
                AS BIGINT) AS chi2_num,
           CAST((a + b) * (c + d) * (a + c) * (b + d) AS BIGINT)
               AS chi2_den,
           CASE WHEN (a + b) * (c + d) * (a + c) * (b + d) = 0
                THEN CAST(0 AS DOUBLE)
                ELSE CAST(CAST((a + b + c + d) * (a * d - b * c)
                               * (a * d - b * c) AS BIGINT) AS DOUBLE)
                   / CAST(CAST((a + b) * (c + d) * (a + c) * (b + d)
                               AS BIGINT) AS DOUBLE)
           END AS chi2
    FROM t
    """
