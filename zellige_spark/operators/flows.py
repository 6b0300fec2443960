"""Origin-destination flow matrices over trajectories.

"How many trips went from cell A to cell B?" — the flow-map / mobility
matrix over a trillion geotagged events: per (entity, UTC day) take the
first and last position in time order (one trip), assign both ends to
tile cells at a coarse zoom, and count trips + distinct entities per
directed (origin cell, destination cell) pair.

Scale plan: two aggregations, both with map-side partial combine.
(1) trips — groupBy (entity, day) with ``min_by``/``max_by`` keyed on
(ts, id): the combiner reduces every partition to at most one row per
local (entity, day) BEFORE the shuffle, so the Exchange ships trip
endpoints, not raw pings (a window/row_number formulation would shuffle
every raw row).  (2) flows — groupBy the four tile coordinates over the
trip table, whose size is bounded by entities x days regardless of ping
volume.  All tile math is the pure Column 3857 pipeline from
``tiles.py`` (whole-stage codegen, no Python).

Day boundaries use integer microsecond arithmetic
(``unix_micros(ts) div 86400000000``) — identical truncation on Spark
and DuckDB, no float epoch near-midnight hazard, no session-timezone
dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import tiles as T

__all__ = ["od_trips", "od_flows", "tile_transitions", "co_travel"]


def od_trips(df: DataFrame, entity_col: str = "user_id",
             ts_col: str = "ts", id_col: str = "event_id") -> DataFrame:
    """One row per (entity, UTC-day index): ``o``/``d`` structs holding
    the (lon, lat) of the first/last event in ((ts, id)) order.  The
    (ts, id) struct key makes the pick total-order deterministic even
    under timestamp ties."""
    key = F.struct(F.col(ts_col), F.col(id_col))
    pos = F.struct(F.col("lon"), F.col("lat"))
    # ts arrives TIMESTAMP_NTZ; session tz is UTC, so NTZ->TZ cast +
    # unix_micros == DuckDB's epoch_us on the naive value
    day = F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div 86400000000")
    return (df.groupBy(F.col(entity_col), day.alias("day"))
            .agg(F.min_by(pos, key).alias("o"),
                 F.max_by(pos, key).alias("d")))


def od_flows(df: DataFrame, zoom: int, entity_col: str = "user_id",
             ts_col: str = "ts", id_col: str = "event_id") -> DataFrame:
    """Directed flow matrix at ``zoom``: (o_x, o_y, d_x, d_y, n_trips,
    n_users).  Same-cell trips (o == d) are kept — they are the
    stay-home diagonal a mobility analysis needs."""
    t = od_trips(df, entity_col, ts_col, id_col)
    z = F.lit(zoom)
    ox, oy = T.tile_xy(T.x3857(F.col("o.lon")), T.y3857(F.col("o.lat")), z)
    dx, dy = T.tile_xy(T.x3857(F.col("d.lon")), T.y3857(F.col("d.lat")), z)
    return (t.select(F.col(entity_col),
                     ox.alias("o_x"), oy.alias("o_y"),
                     dx.alias("d_x"), dy.alias("d_y"))
            .groupBy("o_x", "o_y", "d_x", "d_y")
            .agg(F.count(F.lit(1)).alias("n_trips"),
                 F.countDistinct(entity_col).alias("n_users")))


def co_travel(df: DataFrame, cell_size: int, bucket_s: int,
              min_cobuckets: int = 2,
              entity_col: str = "user",
              x_col: str = "x", y_col: str = "y",
              es_col: str = "es") -> DataFrame:
    """Co-travel / contact detection: entity pairs that share a
    space-time cell in at least ``min_cobuckets`` DISTINCT time buckets
    (contact tracing, convoy mining, account-farm detection over a
    trillion geotagged pings).

    Blocking semantics (the standard web-scale simplification): two
    entities are "together" in a bucket iff they ping inside the SAME
    (x div cell_size, y div cell_size, es div bucket_s) cell — an
    equi-join key, not a distance predicate, so the pair search never
    goes cartesian.  Callers wanting radius semantics run this at
    ``cell_size >= radius`` as the candidate stage and refine the
    survivors (the ``within_distance_join`` pattern).

    Scale plan: (1) raw pings reduce to DISTINCT
    (entity, cx, cy, bucket) rows — one partial-agg'd Exchange, output
    bounded by entities x buckets however many pings arrive;
    (2) candidate pairs come from ONE self-equi-join on the
    spatiotemporal cell key (AQE skew-join splits a hot stadium cell;
    ``a.ent < b.ent`` keeps each unordered pair once); (3) pair
    support is a partial-agg'd groupBy counting the distinct buckets
    (already distinct by construction) with first/last contact.
    Integer inputs -> every output column is an exact BIGINT.
    """
    occ = (df.select(
        F.col(entity_col).alias("ent"),
        F.expr(f"cast({x_col} as bigint) div {cell_size}").alias("cx"),
        F.expr(f"cast({y_col} as bigint) div {cell_size}").alias("cy"),
        F.expr(f"cast({es_col} as bigint) div {bucket_s}").alias("b"))
        .distinct())
    a = occ.alias("a")
    b = occ.alias("b")
    pairs = (a.join(b, on=[F.col("a.cx") == F.col("b.cx"),
                           F.col("a.cy") == F.col("b.cy"),
                           F.col("a.b") == F.col("b.b"),
                           F.col("a.ent") < F.col("b.ent")])
             .select(F.col("a.ent").alias("user_a"),
                     F.col("b.ent").alias("user_b"),
                     F.col("a.b").alias("b")))
    # the same pair can share several CELLS inside one bucket — support
    # counts distinct BUCKETS, so dedup (pair, bucket) first
    per_bucket = pairs.distinct()
    return (per_bucket.groupBy("user_a", "user_b")
            .agg(F.count(F.lit(1)).alias("n_cobuckets"),
                 F.min("b").alias("first_bucket"),
                 F.max("b").alias("last_bucket"))
            .filter(F.col("n_cobuckets") >= min_cobuckets)
            .select(F.col("user_a").cast("long"),
                    F.col("user_b").cast("long"),
                    F.col("n_cobuckets").cast("long"),
                    F.col("first_bucket").cast("long"),
                    F.col("last_bucket").cast("long")))


def tile_transitions(df: DataFrame, zoom: int,
                     entity_col: str = "user_id",
                     ts_col: str = "ts",
                     id_col: str = "event_id") -> DataFrame:
    """First-order Markov transition matrix between tile cells: every
    consecutive event pair per entity (in (ts, id) total order) is one
    transition; per directed (from, to) cell pair report the count,
    the origin total, the transition probability (ONE correctly-
    rounded long->double division of exact counts), and the
    deterministic rank among the origin's successors (n_trans DESC,
    to_x, to_y — rank 1 is the next-cell prediction).  Self loops are
    kept: the diagonal is the stay probability.

    Scale plan: the consecutive-pair semantics force ONE window
    Exchange on the entity key (lead over (ts, id)); the tile math is
    pure Column 3857 codegen map-side of it, and the transition count
    is a partial-agg'd groupBy over the four tile coordinates.  The
    per-origin totals and ranks run on the transition matrix itself —
    bounded by 4^(2*zoom) rows however many raw events there are."""
    from pyspark.sql.window import Window

    z = F.lit(zoom)
    tx, ty = T.tile_xy(T.x3857(F.col("lon")), T.y3857(F.col("lat")), z)
    cells = df.select(F.col(entity_col).alias("ent"),
                      F.col(ts_col).alias("ts"), F.col(id_col).alias("id"),
                      tx.alias("cx"), ty.alias("cy"))
    trans = (cells
             .select("ent", "ts", "id", "cx", "cy",
                     F.lead("cx").over(
                         Window.partitionBy("ent").orderBy("ts", "id"))
                     .alias("nx"),
                     F.lead("cy").over(
                         Window.partitionBy("ent").orderBy("ts", "id"))
                     .alias("ny"))
             .filter(F.col("nx").isNotNull())
             .groupBy(F.col("cx").alias("from_x"),
                      F.col("cy").alias("from_y"),
                      F.col("nx").alias("to_x"),
                      F.col("ny").alias("to_y"))
             .agg(F.count(F.lit(1)).alias("n_trans")))
    totals = (trans.groupBy("from_x", "from_y")
              .agg(F.sum("n_trans").alias("n_from")))
    wr = Window.partitionBy("from_x", "from_y").orderBy(
        F.col("n_trans").desc(), F.col("to_x"), F.col("to_y"))
    return (trans.join(totals, ["from_x", "from_y"])
            .withColumn("rank", F.row_number().over(wr))
            .select("from_x", "from_y", "to_x", "to_y",
                    F.col("n_trans").cast("long").alias("n_trans"),
                    F.col("n_from").cast("long").alias("n_from"),
                    (F.col("n_trans").cast("double")
                     / F.col("n_from").cast("double")).alias("p"),
                    F.col("rank").cast("int").alias("rank")))


# --- PageRank over the transition graph (exact integer fixed-point) --------

PR_SCALE = 1_000_000
PR_D_NUM = 85      # damping 0.85 as the exact rational 85/100
PR_D_DEN = 100
PR_ITERS = 5


def pagerank_fixed(edges: DataFrame, iters: int = PR_ITERS,
                   scale: int = PR_SCALE) -> DataFrame:
    """PageRank over a weighted edge frame (src, dst, cnt) in EXACT
    integer fixed-point: ranks live at ``scale`` (1e-6 units), each
    edge contribution is the floor r(u)*cnt/out(u), and each update
    is rank' = (1-d)*scale div (d_den*n) + d_num*sum(contrib) div
    d_den — every floor lands at the same place in Spark and DuckDB,
    so a fixed iteration count gives a hash-exact rank vector (the
    deterministic answer to "which tiles do movement flows
    concentrate in").  Dangling nodes get a unit self-loop (the
    standard patch so their mass doesn't leak).

    Scale shape: the rank vector and edge table are graph-bounded
    (tiles, not raw events), so each iteration is one equi-join + one
    partial-agg'd groupBy on the cell-bounded tables; iterations
    localCheckpoint so round r never recomputes rounds < r.  The node
    count (one scalar) is the only driver-side value."""
    e = (edges.groupBy("src", "dst")
         .agg(F.sum("cnt").alias("cnt"))
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    dang = nodes.join(e.select(F.col("src").alias("node")).distinct(),
                      "node", "left_anti")
    e2 = e.unionByName(dang.select(F.col("node").alias("src"),
                                   F.col("node").alias("dst"),
                                   F.lit(1).cast("long").alias("cnt")))
    out = (e2.groupBy("src").agg(F.sum("cnt").alias("outc"))
           .localCheckpoint(eager=True))
    n = nodes.count()
    base = (PR_D_DEN - PR_D_NUM) * scale // (PR_D_DEN * n)
    r = nodes.withColumn("rank", F.lit(scale // n).cast("long"))
    for _ in range(iters):
        contrib = (e2.join(r.withColumnRenamed("node", "src"), "src")
                   .join(out, "src")
                   .select(F.col("dst").alias("node"),
                           F.expr("rank * cnt div outc").alias("c")))
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        r = (nodes.join(sums, "node", "left")
             .select("node",
                     (F.lit(base)
                      + F.expr(f"{PR_D_NUM} * coalesce(s, 0L)"
                               f" div {PR_D_DEN}")).alias("rank"))
             .localCheckpoint(eager=True))
    return r


def tile_pagerank(df: DataFrame, grid: int,
                  iters: int = PR_ITERS) -> DataFrame:
    """PageRank over per-entity tile-transition edges: events carry
    integer coords (x in [0,x_period), y in [0,y_period)) and an
    (ent, ts, id) order; consecutive events form weighted src->dst
    cell edges (self-transitions kept — they model dwell).  Output
    one row per VISITED cell: cell_x, cell_y, out weight, rank_e6."""
    from pyspark.sql import Window

    cw = 360000 // grid
    ch = 170000 // grid
    cells = df.select(
        "ent", "ts", "id",
        (F.expr(f"(x div {cw})") * grid + F.expr(f"(y div {ch})"))
        .alias("node"))
    w = Window.partitionBy("ent").orderBy("ts", "id")
    tr = (cells.withColumn("nxt", F.lead("node").over(w))
          .filter(F.col("nxt").isNotNull())
          .select(F.col("node").alias("src"), F.col("nxt").alias("dst"),
                  F.lit(1).cast("long").alias("cnt")))
    ranks = pagerank_fixed(tr, iters=iters)
    out = (tr.groupBy(F.col("src").alias("node"))
           .agg(F.sum("cnt").alias("out_weight")))
    return (ranks.join(out, "node", "left")
            .select(F.expr(f"node div {grid}").cast("long").alias("cell_x"),
                    (F.col("node") % grid).cast("long").alias("cell_y"),
                    F.coalesce("out_weight", F.lit(0)).cast("long")
                    .alias("out_weight"),
                    F.col("rank").cast("long").alias("rank_e6")))
