"""Trajectory operators over ordered geotagged event streams.

NEW relative to the reference (SURVEY.md §2.10 family): the reference
simplifies geometry per *feature* (DouglasPeucker.hs); here the same
kernel runs per *trajectory* — the ordered sequence of a user's
geotagged events — as a distributed groupBy(entity) operator, plus
pure Column-math track statistics.

Scale shape:

- ``track_stats`` is window + aggregation on the SAME key: Spark plans
  ONE Exchange (hashpartitioning on the entity), the window sort and
  the final aggregate both reuse it (plan-asserted).  All leg math is
  JVM Column expressions; float haversine legs are quantized to whole
  meters by ``floor`` BEFORE the sum, so the per-track totals are
  order-independent BIGINTs and the operator stays hash-exact under
  the DuckDB oracle (the raw float sum would be reduction-order-
  dependent and engine-drifting).
- ``simplify_tracks`` shuffles once on the entity key and runs the
  reference-faithful Douglas-Peucker recursion (kernel/simplify.py,
  DouglasPeucker.hs:19-55) per trajectory inside an Arrow-batched
  ``applyInPandas``.  A trajectory must fit in one pandas group —
  bounded by per-entity event counts, the same contract as
  ``event_sessions``; the output carries in-job integrity columns
  (endpoints preserved, every dropped point within epsilon of its
  kept segment) because the recursion itself is not SQL-expressible.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..kernel.simplify import _shortest_distances, douglas_peucker


def haversine_km_clamped(lon1, lat1, lon2, lat2) -> Column:
    """Great-circle distance (km) with the ``asin`` argument clamped at
    1.0 — near-antipodal pairs can push the haversine radicand one ulp
    above 1, where an unclamped ``asin`` returns NaN and ANSI casts
    blow up.  The clamp is mirrored verbatim in the DuckDB oracle SQL
    so both engines evaluate the identical float expression tree."""
    r1 = F.radians(lat1)
    r2 = F.radians(lat2)
    dlat = r2 - r1
    dlon = F.radians(lon2) - F.radians(lon1)
    a = (F.sin(dlat / 2) ** 2 + F.cos(r1) * F.cos(r2) * F.sin(dlon / 2) ** 2)
    return F.lit(2.0 * 6371.0) * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


SQL_HAVERSINE_KM = (
    "2.0 * 6371.0 * asin(least(1.0, sqrt("
    "pow(sin((radians({lat2}) - radians({lat1})) / 2), 2) + "
    "cos(radians({lat1})) * cos(radians({lat2})) * "
    "pow(sin((radians({lon2}) - radians({lon1})) / 2), 2))))")


def track_stats(df: DataFrame, entity_col: str = "user_id",
                ts_col: str = "ts", tiebreak_col: str = "event_id",
                lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Per-entity track statistics over events ordered by
    ``(ts_col, tiebreak_col)``: point count, total path length, longest
    leg, straight-line (first-to-last) displacement, and duration.

    Lengths are whole meters (``floor(haversine_km * 1000)`` per leg,
    then BIGINT sums — exact and reduction-order-independent);
    duration is exact BIGINT epoch seconds (``unix_timestamp``,
    mirrored by DuckDB ``floor(epoch(ts))`` — the repo's established
    epoch rule).  Single-point tracks report zero length and
    displacement.

    Output: (entity, n_points, length_m, max_leg_m, net_m, dur_s).
    """
    order = [F.col(ts_col), F.col(tiebreak_col)]
    w = Window.partitionBy(entity_col).orderBy(*order)
    wfull = w.rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing)
    plon = F.lag(lon_col).over(w)
    plat = F.lag(lat_col).over(w)
    leg_km = haversine_km_clamped(plon, plat, F.col(lon_col), F.col(lat_col))
    leg_m = F.when(plon.isNotNull(),
                   F.floor(leg_km * F.lit(1000.0)).cast("long"))
    e = (df.withColumn("_leg_m", leg_m)
           .withColumn("_es", F.unix_timestamp(F.col(ts_col)))
           .withColumn("_flon", F.first(lon_col).over(w))
           .withColumn("_flat", F.first(lat_col).over(w))
           .withColumn("_llon", F.last(lon_col).over(wfull))
           .withColumn("_llat", F.last(lat_col).over(wfull)))
    g = (e.groupBy(entity_col)
          .agg(F.count(F.lit(1)).alias("n_points"),
               F.coalesce(F.sum("_leg_m"), F.lit(0).cast("long"))
                .alias("length_m"),
               F.coalesce(F.max("_leg_m"), F.lit(0).cast("long"))
                .alias("max_leg_m"),
               (F.max("_es") - F.min("_es")).alias("dur_s"),
               F.min("_flon").alias("_flon"), F.min("_flat").alias("_flat"),
               F.min("_llon").alias("_llon"), F.min("_llat").alias("_llat")))
    net_m = F.floor(
        haversine_km_clamped(F.col("_flon"), F.col("_flat"),
                             F.col("_llon"), F.col("_llat"))
        * F.lit(1000.0)).cast("long")
    return g.select(F.col(entity_col), "n_points", "length_m", "max_leg_m",
                    net_m.alias("net_m"), "dur_s")


def stay_points(df: DataFrame, radius_m: int, max_gap_s: int,
                min_points: int = 2, entity_col: str = "user_id",
                ts_col: str = "ts", tiebreak_col: str = "event_id",
                lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Stay-point (stop) detection: segment each entity's ordered track
    wherever the hop to the previous fix is >= ``radius_m`` meters OR
    >= ``max_gap_s`` seconds, then keep segments with at least
    ``min_points`` fixes — the classic stop/move decomposition of a
    trajectory (NEW vs the reference, which has no temporal ops).

    Scale shape: two window passes and the final aggregate all key on
    the entity, so Spark plans ONE Exchange — hashpartitioning
    (entity) satisfies the groupBy(entity, seg) clustering requirement
    because the partition key is a subset of the grouping keys.  No
    collects, no fan-out: state per row is one lag + one running sum.

    Exactness contract (the repo's oracle rules): hop lengths are
    ``floor(haversine_km * 1000)`` BIGINTs before any comparison, times
    are BIGINT epoch seconds, and the segment centroid is computed in
    integer microdegrees — the synthetic lon/lat are exact DECIMALs in
    both engines, so ``CAST(lon * 1e6 AS BIGINT)`` is exact, the BIGINT
    sum is order-independent, and ``floor(sum / n)`` divides two exact
    integers under IEEE double (sums stay far below 2^53).

    Output: (entity, seg, n_points, start_es, dwell_s,
    c_lon_udeg, c_lat_udeg)."""
    order = [F.col(ts_col), F.col(tiebreak_col)]
    w = Window.partitionBy(entity_col).orderBy(*order)
    leg_km = haversine_km_clamped(F.lag(lon_col).over(w),
                                  F.lag(lat_col).over(w),
                                  F.col(lon_col), F.col(lat_col))
    leg_m = F.floor(leg_km * F.lit(1000.0)).cast("long")
    es = F.unix_timestamp(F.col(ts_col))
    dt = es - F.lag(es).over(w)
    brk = F.when(leg_m.isNull() | (leg_m >= F.lit(int(radius_m)))
                 | (dt >= F.lit(int(max_gap_s))), F.lit(1)) \
           .otherwise(F.lit(0))
    e = (df.withColumn("_es", es)
           .withColumn("_brk", brk)
           .withColumn("_seg", F.sum("_brk").over(w))
           .withColumn("_lon_u", (F.col(lon_col) * F.lit(1000000))
                       .cast("long"))
           .withColumn("_lat_u", (F.col(lat_col) * F.lit(1000000))
                       .cast("long")))
    g = (e.groupBy(entity_col, F.col("_seg").alias("seg"))
          .agg(F.count(F.lit(1)).alias("n_points"),
               F.min("_es").alias("start_es"),
               (F.max("_es") - F.min("_es")).alias("dwell_s"),
               F.floor(F.sum("_lon_u") / F.count(F.lit(1)))
                .cast("long").alias("c_lon_udeg"),
               F.floor(F.sum("_lat_u") / F.count(F.lit(1)))
                .cast("long").alias("c_lat_udeg")))
    return g.filter(F.col("n_points") >= F.lit(int(min_points)))


SQL_BEARING_DEG = (
    "degrees(atan2("
    "sin(radians({lon2}) - radians({lon1})) * cos(radians({lat2})), "
    "cos(radians({lat1})) * sin(radians({lat2})) "
    "- sin(radians({lat1})) * cos(radians({lat2})) "
    "* cos(radians({lon2}) - radians({lon1}))))")


def heading_mix(df: DataFrame, sectors: int = 8,
                entity_col: str = "user_id", ts_col: str = "ts",
                tiebreak_col: str = "event_id", lon_col: str = "lon",
                lat_col: str = "lat") -> DataFrame:
    """Per-entity compass-rose heading distribution: the initial
    great-circle bearing of every leg, bucketed into ``sectors`` equal
    arcs (8 = the classic N/NE/E/... rose), counted per entity — the
    movement-direction profile of a track.

    The bearing is the standard ``atan2`` form; the expression TREE is
    shared verbatim with the oracle SQL (``SQL_BEARING_DEG``), so both
    engines evaluate identical doubles, and only the floor-bucketed
    sector integer is output (atan2 in (-180, 180] -> +360 -> DIV 45
    -> mod, all exact integer steps after the one floor).  Window and
    aggregate key on the entity: ONE Exchange.

    Output: (entity, sector, n_legs)."""
    arc = 360.0 / int(sectors)
    w = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    plon, plat = F.lag(lon_col).over(w), F.lag(lat_col).over(w)
    r1, r2 = F.radians(plat), F.radians(F.col(lat_col))
    dlon = F.radians(F.col(lon_col)) - F.radians(plon)
    brg = F.degrees(F.atan2(
        F.sin(dlon) * F.cos(r2),
        F.cos(r1) * F.sin(r2) - F.sin(r1) * F.cos(r2) * F.cos(dlon)))
    sector = (F.floor((brg + F.lit(360.0)) / F.lit(arc)).cast("long")
              % F.lit(int(sectors)))
    e = df.withColumn("_sector", F.when(plon.isNotNull(), sector))
    return (e.filter(F.col("_sector").isNotNull())
             .groupBy(F.col(entity_col), F.col("_sector").alias("sector"))
             .agg(F.count(F.lit(1)).alias("n_legs")))


def resample_tracks(df: DataFrame, step_s: int = 3600,
                    entity_col: str = "user_id", ts_col: str = "ts",
                    tiebreak_col: str = "event_id",
                    x_col: str = "ux", y_col: str = "uy") -> DataFrame:
    """Time-grid trajectory resampling (gap-fill interpolation, the
    hypertable ``time_bucket_gapfill + interpolate`` analog): emit the
    linearly interpolated integer position at every multiple of
    ``step_s`` seconds covered by each entity's track.

    Each leg (prev fix, fix] owns the grid marks strictly after its
    start and up to its end — half-open intervals make marks unique
    across legs AND guarantee ``T - t1 >= 1 <= dt`` so there is no
    division by zero even on (ts, tiebreak) ties.  The lerp
    ``x1 + (x2-x1)*(T-t1) DIV dt`` is exact integer math; both engines
    truncate integer division toward zero, so the oracle hash-matches
    with no float term anywhere (microdegree deltas * month-scale
    second offsets stay ~1e15, inside int64).

    Scale shape: one Exchange (the entity window), then a map-only
    explode whose fan-out is bounded by track-duration/step_s; marks
    inside a leg never ship a raw ping twice.

    Output: (entity, grid_es, x, y) — one row per covered grid mark."""
    step = int(step_s)
    w = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    es = F.unix_timestamp(F.col(ts_col))
    e = (df.withColumn("_es", es)
           .withColumn("_pes", F.lag(es).over(w))
           .withColumn("_px", F.lag(x_col).over(w))
           .withColumn("_py", F.lag(y_col).over(w)))
    lo = F.expr(f"_pes DIV {step} + 1")
    hi = F.expr(f"_es DIV {step}")
    marks = (F.when(F.col("_pes").isNotNull() & (lo <= hi),
                    F.sequence(lo, hi))
              .otherwise(F.array().cast("array<bigint>")))
    e = e.withColumn("_k", F.explode(marks))
    t = (F.col("_k") * F.lit(step)).alias("grid_es")
    lerp_x = F.expr(
        f"_px + (({x_col} - _px) * (_k * {step} - _pes)) DIV (_es - _pes)")
    lerp_y = F.expr(
        f"_py + (({y_col} - _py) * (_k * {step} - _pes)) DIV (_es - _pes)")
    return e.select(F.col(entity_col), t.cast("long"),
                    lerp_x.cast("long").alias("x"),
                    lerp_y.cast("long").alias("y"))


def _pair_parallelism(df: DataFrame) -> int:
    """Partition count for the candidate-pair -> exact-kernel exchange
    of the track-similarity joins.  The pair rows are tiny (two ids +
    four bounded coordinate arrays) so AQE's byte-based coalescing
    collapses them into one or two partitions and the numpy kernel —
    the entire cost of the operator — runs on one core.  An explicit
    hash repartition on the pair key keeps the kernel spread across
    the cluster; both knobs scale with deployment size, nothing is
    tuned to the local core count."""
    sess = df.sparkSession
    return max(sess.sparkContext.defaultParallelism,
               int(sess.conf.get("spark.sql.shuffle.partitions", "200")))


def _bbox_grid_candidates(pts: DataFrame, tau: int,
                          cell: int | None) -> DataFrame:
    """Candidate entity pairs whose per-entity point-set bboxes are
    within ``tau`` on BOTH axes — the shared blocking stage of the
    track-similarity joins (Hausdorff, Fréchet: both distances are
    >= the bbox gap, so the pruning is lossless for any <= tau match).

    One partial-agg'd shuffle reduces ``pts`` (columns _e, _x, _y) to
    per-entity bboxes; each bbox expands by ceil(tau/2) per side and
    explodes to the ``cell``-width grid cells it covers (pick ``cell``
    near the typical track span — fan-out stays O(1) per entity);
    candidates come from ONE self-equi-join on the cell key.  A pair
    sharing many cells is kept exactly once WITHOUT a distinct: it is
    OWNED by the cell containing the component-wise max of the two
    expanded lower corners, covered by both sides by construction
    (the 1-D interval-join ownership trick per axis; valid under
    Spark's truncating ``div`` because any monotone cell map works).
    Returns (_ea, _eb) with _ea < _eb.
    """
    c = int(cell) if cell is not None else int(tau)
    if c <= 0:
        raise ValueError("cell must be a positive integer")
    e = (int(tau) + 1) // 2   # boxes overlap <=> axis gap <= 2e >= tau
    box = pts.groupBy("_e").agg(
        (F.min("_x") - e).alias("_xlo"), (F.max("_x") + e).alias("_xhi"),
        (F.min("_y") - e).alias("_ylo"), (F.max("_y") + e).alias("_yhi"))
    cells = (box
             .withColumn("_cx", F.explode(F.sequence(
                 F.expr(f"_xlo div {c}"), F.expr(f"_xhi div {c}"))))
             .withColumn("_cy", F.explode(F.sequence(
                 F.expr(f"_ylo div {c}"), F.expr(f"_yhi div {c}")))))
    a = cells.select(F.col("_e").alias("_ea"), F.col("_xlo").alias("_axlo"),
                     F.col("_ylo").alias("_aylo"), "_cx", "_cy")
    b = cells.select(F.col("_e").alias("_eb"), F.col("_xlo").alias("_bxlo"),
                     F.col("_ylo").alias("_bylo"), "_cx", "_cy")
    return (a.join(b, ["_cx", "_cy"])
            .filter((F.col("_ea") < F.col("_eb"))
                    & (F.col("_cx")
                       == F.expr(f"greatest(_axlo, _bxlo) div {c}"))
                    & (F.col("_cy")
                       == F.expr(f"greatest(_aylo, _bylo) div {c}")))
            .select("_ea", "_eb"))


def hausdorff_join(df: DataFrame, tau: int, cell: int | None = None,
                   entity_col: str = "ent", x_col: str = "x",
                   y_col: str = "y") -> DataFrame:
    """Trajectory-similarity join: every entity pair whose symmetric
    Hausdorff distance is <= ``tau`` — "which users move through the
    same places" (track clustering, route-coverage comparison, GPS
    trace entity resolution).  Inputs are integer lattice points
    (entity, x, y); all distances are EXACT int64 squared Euclidean,
    so the operator is hash-exact under a DuckDB oracle.

    Scale plan — bbox grid blocking, never a cartesian pair join:

    1. one partial-agg'd shuffle reduces points to per-entity bboxes;
    2. each bbox, expanded by ceil(tau/2) per side, explodes to the
       ``cell``-width grid cells it covers (pick ``cell`` near the
       typical track span: fan-out stays O(1) per entity) and
       candidates come from ONE self-equi-join on the cell key —
       H(A,B) >= the bbox gap, so any pair beyond tau on either axis
       never shares a cell (lossless pruning).  A pair sharing many
       cells is kept exactly once WITHOUT a distinct: it is OWNED by
       the cell containing the component-wise max of the two expanded
       lower corners (covered by both sides by construction — the
       1-D interval-join ownership trick per axis).
    3. tracks reduce to per-entity coordinate arrays in one
       partial-agg'd shuffle (same reduction as the Fréchet join);
       each candidate pair computes h(A->B), h(B->A) exactly inside
       ONE Arrow-batched pandas UDF — the full int64 d2 matrix is a
       vectorized numpy outer difference, min along each axis, max of
       the mins — and H = max of the two is filtered at tau^2.  A
       track must fit in one Arrow batch row (the ``simplify_tracks``
       contract); work per pair is O(|A|*|B|) SIMD int ops, never
       per-point JVM rows (the previous explode-to-roles + stacked
       groupBy plan shipped candidate_pairs x |A| x |B| x 2 rows
       through aggregation — measured 145 s vs ~8 s at sf0.1).

    Duplicate points only shrink the min/max (set semantics), so no
    distinct pre-pass is needed.
    """
    t = int(tau)
    if t <= 0:
        raise ValueError("tau must be a positive integer")
    pts = df.select(F.col(entity_col).alias("_e"),
                    F.col(x_col).cast("long").alias("_x"),
                    F.col(y_col).cast("long").alias("_y"))
    cand = _bbox_grid_candidates(pts, t, cell)

    trk = pts.groupBy("_e").agg(F.collect_list(F.struct(
        F.col("_x").alias("x"), F.col("_y").alias("y"))).alias("_t"))
    ta = trk.select(F.col("_e").alias("_ea"),
                    F.col("_t").getField("x").alias("_axs"),
                    F.col("_t").getField("y").alias("_ays"))
    tb = trk.select(F.col("_e").alias("_eb"),
                    F.col("_t").getField("x").alias("_bxs"),
                    F.col("_t").getField("y").alias("_bys"))

    @F.pandas_udf("h_ab_sq long, h_ba_sq long")
    def _hd(axs: pd.Series, ays: pd.Series, bxs: pd.Series,
            bys: pd.Series) -> pd.DataFrame:
        # Per-pair loop on purpose: one pair's d2 matrix (~70x70 int64
        # = 36 KB) is L2-resident, so three in-place ops + two axis
        # reductions run at cache speed.  A chunk-padded batched
        # variant (the Fréchet DP treatment) measured 2.2-3.4x SLOWER
        # per pair here: the 40 MB 3D chunks are DRAM-bound on this
        # host's bandwidth knee and the pad cells + masked reductions
        # are pure extra traffic.  The DP needs batching because its
        # row sweep costs ~8 numpy calls per row; this kernel is just
        # 5 calls per PAIR, so Python overhead is already amortized.
        n = len(axs)
        ha = np.empty(n, dtype=np.int64)
        hb = np.empty(n, dtype=np.int64)
        for k in range(n):
            ax = np.asarray(axs[k], dtype=np.int64)
            ay = np.asarray(ays[k], dtype=np.int64)
            bx = np.asarray(bxs[k], dtype=np.int64)
            by = np.asarray(bys[k], dtype=np.int64)
            dx = ax[:, None] - bx[None, :]
            dy = ay[:, None] - by[None, :]
            dx *= dx
            dy *= dy
            dx += dy
            ha[k] = dx.min(axis=1).max()
            hb[k] = dx.min(axis=0).max()
        return pd.DataFrame({"h_ab_sq": ha, "h_ba_sq": hb})

    # asNondeterministic: the h_sq filter below otherwise gets pushed
    # beneath the projection and the kernel is evaluated TWICE (two
    # ArrowEvalPython nodes, guide §4.4 duplication) — the result is
    # pure in the inputs, the marker only stops the optimizer cloning
    # the expensive call.
    res = (cand.join(ta, "_ea").join(tb, "_eb")
           .repartition(_pair_parallelism(df), "_ea", "_eb")
           .withColumn("_h", _hd.asNondeterministic()(
               "_axs", "_ays", "_bxs", "_bys")))
    return (res.withColumn("h_sq", F.greatest("_h.h_ab_sq", "_h.h_ba_sq"))
            .filter(F.col("h_sq") <= F.lit(t) * F.lit(t))
            .select(F.col("_ea").alias("ent_a"), F.col("_eb").alias("ent_b"),
                    F.col("_h.h_ab_sq").alias("h_ab_sq"),
                    F.col("_h.h_ba_sq").alias("h_ba_sq"), "h_sq"))


def frechet_join(df: DataFrame, tau: int, cell: int | None = None,
                 entity_col: str = "ent", order_col: str = "ord",
                 x_col: str = "x", y_col: str = "y") -> DataFrame:
    """ORDERED-track similarity join: entity pairs whose discrete
    Fréchet distance is <= ``tau`` — the leash distance over monotone
    traversals of both tracks ("did these two trajectories follow the
    same route in the same order", the question Hausdorff's set
    semantics cannot ask).  Integer lattice inputs; the <= tau test is
    exact (int64 squared distances against tau^2, no floats).

    Scale plan: candidates come from the shared lossless bbox-grid
    blocking (``_bbox_grid_candidates`` — Fréchet >= Hausdorff >= the
    bbox gap), tracks reduce to sorted per-entity arrays in one
    partial-agg'd shuffle, and each candidate pair runs the classic
    reachability DP — cell (i,j) is reachable iff d2(a_i,b_j) <= tau^2
    and a predecessor (i-1,j), (i,j-1), (i-1,j-1) is — inside ONE
    Arrow-batched pandas UDF.  Pairs are padded to a common rectangle
    in chunks of 512 and the DP row sweep is vectorized across ALL
    pairs of a chunk at once (per-run cummax propagates the within-row
    horizontal moves; padded cells are masked unreachable), so the
    inner loop is O(max_len_a) numpy ops on (chunk, len_b) matrices,
    never per-cell or per-pair-per-row Python.  A track must fit in
    one Arrow batch row — the ``simplify_tracks`` contract.

    Output (matched pairs only): (ent_a, ent_b, n_a, n_b, n_reach)
    where n_reach is the total count of DP-reachable grid cells — a
    full fingerprint of the DP surface, hash-checked by the DuckDB
    recursive-CTE reachability oracle.
    """
    t = int(tau)
    if t <= 0:
        raise ValueError("tau must be a positive integer")
    t2 = t * t

    pts = df.select(F.col(entity_col).alias("_e"),
                    F.col(order_col).alias("_o"),
                    F.col(x_col).cast("long").alias("_x"),
                    F.col(y_col).cast("long").alias("_y"))
    cand = _bbox_grid_candidates(pts, t, cell)
    trk = pts.groupBy("_e").agg(F.sort_array(F.collect_list(F.struct(
        F.col("_o").alias("o"), F.col("_x").alias("x"),
        F.col("_y").alias("y")))).alias("_t"))
    ta = trk.select(F.col("_e").alias("_ea"),
                    F.col("_t").getField("x").alias("_axs"),
                    F.col("_t").getField("y").alias("_ays"))
    tb = trk.select(F.col("_e").alias("_eb"),
                    F.col("_t").getField("x").alias("_bxs"),
                    F.col("_t").getField("y").alias("_bys"))

    @F.pandas_udf("matched boolean, n_reach long")
    def _dp(axs: pd.Series, ays: pd.Series, bxs: pd.Series,
            bys: pd.Series) -> pd.DataFrame:
        # Batched DP: pairs are padded to a common (max_na, max_nb)
        # rectangle per chunk and every row-sweep op runs across ALL
        # pairs of the chunk at once — the per-pair loop version paid
        # ~8 tiny numpy calls per DP row (measured 99 s at sf0.1 for
        # 44.6k candidate pairs; this shape is ~2 s).  Padded cells
        # are masked to ok=False, so they are never reachable and the
        # real cells' reachability (and n_reach) is unchanged.
        n = len(axs)
        matched = np.zeros(n, dtype=bool)
        totals = np.zeros(n, dtype=np.int64)
        CH = 512
        dxb = dyb = None
        for c0 in range(0, n, CH):
            c1 = min(c0 + CH, n)
            p = c1 - c0
            na = np.fromiter((len(axs[k]) for k in range(c0, c1)),
                             np.int64, p)
            nb = np.fromiter((len(bxs[k]) for k in range(c0, c1)),
                             np.int64, p)
            ma, mb = int(na.max()), int(nb.max())
            A_x = np.zeros((p, ma), dtype=np.int64)
            A_y = np.zeros((p, ma), dtype=np.int64)
            B_x = np.zeros((p, mb), dtype=np.int64)
            B_y = np.zeros((p, mb), dtype=np.int64)
            for k in range(p):
                A_x[k, :na[k]] = axs[c0 + k]
                A_y[k, :na[k]] = ays[c0 + k]
                B_x[k, :nb[k]] = bxs[c0 + k]
                B_y[k, :nb[k]] = bys[c0 + k]
            if dxb is None or dxb.shape[1] < ma or dxb.shape[2] < mb:
                dxb = np.empty((CH, ma, mb), dtype=np.int64)
                dyb = np.empty((CH, ma, mb), dtype=np.int64)
            dx = dxb[:p, :ma, :mb]
            dy = dyb[:p, :ma, :mb]
            np.subtract(A_x[:, :, None], B_x[:, None, :], out=dx)
            np.subtract(A_y[:, :, None], B_y[:, None, :], out=dy)
            dx *= dx
            dy *= dy
            dx += dy
            ok = dx <= t2
            ok &= np.arange(ma)[None, :, None] < na[:, None, None]
            ok &= np.arange(mb)[None, None, :] < nb[:, None, None]
            prev = np.zeros((p, mb), dtype=bool)
            shifted = np.empty((p, mb), dtype=bool)
            tot = np.zeros(p, dtype=np.int64)
            mat = np.zeros(p, dtype=bool)
            last_row = na - 1
            last_col = nb - 1
            rows = np.arange(p)
            for i in range(ma):
                okr = ok[:, i, :]
                if i == 0:
                    seed = np.zeros((p, mb), dtype=bool)
                    seed[:, 0] = okr[:, 0]
                else:
                    shifted[:, 0] = False
                    shifted[:, 1:] = prev[:, :-1]
                    np.logical_or(shifted, prev, out=shifted)
                    seed = okr & shifted
                # horizontal propagation within each True-run of okr:
                # reachable from the first seed of the run onward
                runid = np.cumsum(~okr, axis=1)
                runid += 1
                hit = np.maximum.accumulate(
                    np.where(seed, runid, 0), axis=1)
                prev = okr & (hit == runid)
                tot += prev.sum(axis=1)
                cap = last_row == i
                if cap.any():
                    mat[cap] = prev[rows[cap], last_col[cap]]
            matched[c0:c1] = mat
            totals[c0:c1] = tot
        return pd.DataFrame({"matched": matched, "n_reach": totals})

    # Lossless endpoint prefilter: a reachable DP surface must contain
    # both corner cells (0,0) and (na-1,nb-1) — reachability seeds only
    # at (0,0) and `matched` reads the far corner — so any pair whose
    # first points or last points are further than tau apart can never
    # match and is dropped BEFORE the exact kernel (44.6k -> 17.6k
    # candidate pairs at sf0.1).  Cheap JVM column math on the already-
    # collected arrays; the surviving pairs' DP output is unchanged.
    def _end_d2(idx: int) -> Column:
        dx = F.element_at("_axs", idx) - F.element_at("_bxs", idx)
        dy = F.element_at("_ays", idx) - F.element_at("_bys", idx)
        return dx * dx + dy * dy

    # asNondeterministic: stops the matched-filter pushdown from
    # cloning the DP into two ArrowEvalPython evaluations (guide §4.4;
    # same fix as hausdorff_join — the kernel is pure in its inputs).
    res = (cand.join(ta, "_ea").join(tb, "_eb")
           .filter((_end_d2(1) <= F.lit(t2)) & (_end_d2(-1) <= F.lit(t2)))
           .repartition(_pair_parallelism(df), "_ea", "_eb")
           .withColumn("_r", _dp.asNondeterministic()(
               "_axs", "_ays", "_bxs", "_bys")))
    return (res.filter(F.col("_r.matched"))
            .select(F.col("_ea").alias("ent_a"), F.col("_eb").alias("ent_b"),
                    F.size("_axs").cast("long").alias("n_a"),
                    F.size("_bxs").cast("long").alias("n_b"),
                    F.col("_r.n_reach").alias("n_reach")))


def simplify_tracks(df: DataFrame, epsilon_m: float,
                    entity_col: str = "user_id",
                    order_cols: Iterable[str] = ("ts", "event_id"),
                    x_col: str = "x3857", y_col: str = "y3857") -> DataFrame:
    """Douglas-Peucker simplification per trajectory: the reference's
    recursion (kernel/simplify.py ``douglas_peucker``, faithful to
    DouglasPeucker.hs:19-55 incl. the 1-based split) applied to each
    entity's ordered 3857-plane track, distributed as one
    groupBy(entity) + Arrow-batched ``applyInPandas``.

    ``epsilon_m`` is in EPSG:3857 meters (stretched by 1/cos(lat) away
    from the equator, exactly like the reference's tile-space epsilon).

    In-job integrity columns (the op is not SQL-expressible):

    - ``endpoints_ok`` — the kept sequence starts/ends at the input's
      first/last point (DP invariant for n >= 2);
    - ``within_eps_ok`` — every DROPPED point lies within epsilon of
      the kept segment spanning it (the recursion's stop condition,
      re-verified against the actual output);
    - ``kept_idx_checksum`` — Σ (original_index + 1) over kept points,
      a hash-stable fingerprint of WHICH points survived.

    Tracks with fewer than 2 points are kept verbatim (n_kept == n).

    Output: (entity, n_points, n_kept, kept_idx_checksum,
    endpoints_ok, within_eps_ok)."""
    order_cols = list(order_cols)
    eps = float(epsilon_m)
    schema = (f"{entity_col} long, n_points long, n_kept long, "
              "kept_idx_checksum long, endpoints_ok boolean, "
              "within_eps_ok boolean")

    def one_track(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        pts = np.ascontiguousarray(
            pdf[[x_col, y_col]].to_numpy(dtype=np.float64))
        n = len(pts)
        if n < 2:
            kept_idx = list(range(n))
            endpoints_ok = True
            within_ok = True
        else:
            kept = douglas_peucker(eps, pts)
            kept_idx = _kept_indices(pts, kept)
            endpoints_ok = bool(kept_idx and kept_idx[0] == 0
                                and kept_idx[-1] == n - 1)
            within_ok = _dropped_within_eps(pts, kept_idx, eps)
        checksum = sum(i + 1 for i in kept_idx)
        return pd.DataFrame({
            entity_col: [int(pdf[entity_col].iloc[0])],
            "n_points": [n],
            "n_kept": [len(kept_idx)],
            "kept_idx_checksum": [checksum],
            "endpoints_ok": [endpoints_ok],
            "within_eps_ok": [within_ok],
        })

    return df.groupBy(entity_col).applyInPandas(one_track, schema)


def _kept_indices(pts: np.ndarray, kept: np.ndarray) -> list:
    """Recover the original indices of the kept subsequence.  DP output
    points are exact copies of input points in input order, and for
    n >= 2 its first/last elements ARE the input endpoints — so the
    endpoints anchor at 0 and n-1 (a greedy scan would mis-anchor the
    final endpoint onto an earlier bit-identical duplicate), and the
    interior points match by greedy forward scan with bit-exact
    equality (each matches at or before its true index, which is
    < n-1, so the scan is total)."""
    m = len(kept)
    if m == 0:
        return []
    if m == 1:
        return [0]
    idx = [0]
    j = 1
    for p in kept[1:-1]:
        while not (pts[j, 0] == p[0] and pts[j, 1] == p[1]):
            j += 1
        idx.append(j)
        j += 1
    idx.append(len(pts) - 1)
    return idx


def _dropped_within_eps(pts: np.ndarray, kept_idx: list,
                        eps: float) -> bool:
    """Every dropped point must lie within eps of the kept segment
    spanning it — the DP stop condition (dmax <= epsilon before the
    two-endpoint collapse), re-checked against the final output."""
    tol = eps + 1e-9 * max(1.0, eps)
    for a, b in zip(kept_idx, kept_idx[1:]):
        if b - a < 2:
            continue
        d = _shortest_distances(pts[a + 1:b], pts[a], pts[b])
        if float(d.max()) > tol:
            return False
    return True
