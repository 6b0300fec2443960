"""Spatial co-location pattern mining (participation index).

Which category PAIRS tend to occur near each other — "coffee shops
co-locate with bookstores": the classic spatial-data-mining operator
(Shekhar & Huang, "Discovering Spatial Co-location Patterns", SSTD
2001 — public literature; the reference engine has no counterpart).
For every unordered category pair (a, b):

* ``n_pairs``        — neighbor instance pairs (distance <= radius);
* ``part_a/part_b``  — DISTINCT instances of a (resp. b) appearing in
  at least one such pair (the "participating" instances);
* ``pi``             — participation index
  ``min(part_a/total_a, part_b/total_b)`` — the standard prevalence
  measure: high only when BOTH categories usually have the other
  nearby.

Geometry is exact-integer PLANAR: coordinates are integer
(milli)degree lattice points and the neighbor predicate is
``dx^2 + dy^2 <= radius^2`` in int64 — no float distance under the
oracle gate (same design as `segments.crossing_pairs`).  No
antimeridian wrap: the synthetic lattice never straddles it; a
wrapping deployment composes the `hotspots` x-wrap key instead.

Scale shape (no crossJoin at any density):

  point -> one center cell (``x div cell``, ``y div cell``)  [map]
  point -> 3x3 halo cells                      [bounded 9x explode]
  halo equi-join center on the packed cell key [ONE data shuffle]
  exact int64 disc filter + id< dedup          [whole-stage codegen]
  pair -> 2 role rows                          [bounded 2x explode]
  groupBy(category pair)                       [k^2-bounded output]
  broadcast join vs the k-row category totals

Each unordered pair is found exactly once: the halo of the lower-id
point contains the center cell of the higher-id point exactly once
(``cell >= radius`` guarantees disc coverage by the 3x3 halo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_OFF = 1 << 20   # cell-coordinate offset: keeps packed keys positive
_SHIFT = 1 << 32


def colocation_patterns(pts: DataFrame, radius: int,
                        cell: int | None = None,
                        id_col: str = "id", x_col: str = "x",
                        y_col: str = "y", cat_col: str = "cat") -> DataFrame:
    """Participation-index table over integer planar points.

    ``pts``: one row per instance (int64 id / x / y, any cat type).
    ``cell`` defaults to ``radius`` (the minimum making the 3x3 halo
    cover the disc)."""
    if cell is None:
        cell = radius
    if cell < radius:
        raise ValueError(f"cell {cell} < radius {radius}: halo would miss pairs")
    r2 = radius * radius
    base = pts.select(F.col(id_col).alias("id"),
                      F.col(x_col).cast("long").alias("x"),
                      F.col(y_col).cast("long").alias("y"),
                      F.col(cat_col).alias("cat"))
    center = base.select(
        "id", "x", "y", "cat",
        F.expr(f"((x div {cell}) + {_OFF}) * {_SHIFT}"
               f" + ((y div {cell}) + {_OFF})").alias("ck"))
    halo = base.select(
        "id", "x", "y", "cat",
        F.explode(F.expr(
            f"transform(sequence(0, 8), d -> "
            f"((x div {cell}) + (d div 3) - 1 + {_OFF}) * {_SHIFT}"
            f" + ((y div {cell}) + (d % 3) - 1 + {_OFF}))")).alias("ck"))
    l = halo.select(F.col("id").alias("ia"), F.col("x").alias("xa"),
                    F.col("y").alias("ya"), F.col("cat").alias("cata"), "ck")
    r = center.select(F.col("id").alias("ib"), F.col("x").alias("xb"),
                      F.col("y").alias("yb"), F.col("cat").alias("catb"), "ck")
    pairs = (l.join(r, "ck")
              .filter((F.col("ia") < F.col("ib"))
                      & (((F.col("xa") - F.col("xb"))
                          * (F.col("xa") - F.col("xb"))
                          + (F.col("ya") - F.col("yb"))
                          * (F.col("ya") - F.col("yb"))) <= F.lit(r2)))
              .select(F.least("cata", "catb").alias("a"),
                      F.greatest("cata", "catb").alias("b"),
                      "ia", "cata", "ib", "catb"))
    roles = pairs.select(
        "a", "b",
        F.explode(F.array(
            F.struct(F.col("cata").alias("c"), F.col("ia").alias("i")),
            F.struct(F.col("catb").alias("c"), F.col("ib").alias("i"))))
         .alias("e"))
    agg = roles.groupBy("a", "b").agg(
        F.expr("count(1) div 2").alias("n_pairs"),
        F.countDistinct(F.when(F.col("e.c") == F.col("a"),
                               F.col("e.i"))).alias("part_a"),
        F.countDistinct(F.when(F.col("e.c") == F.col("b"),
                               F.col("e.i"))).alias("part_b"))
    totals = base.groupBy("cat").agg(F.count(F.lit(1)).alias("total"))
    ta = totals.select(F.col("cat").alias("a"), F.col("total").alias("total_a"))
    tb = totals.select(F.col("cat").alias("b"), F.col("total").alias("total_b"))
    return (agg.join(F.broadcast(ta), "a").join(F.broadcast(tb), "b")
            .select(F.col("a").alias("cat_a"), F.col("b").alias("cat_b"),
                    "n_pairs", "part_a", "part_b", "total_a", "total_b",
                    F.least(F.col("part_a").cast("double")
                            / F.col("total_a").cast("double"),
                            F.col("part_b").cast("double")
                            / F.col("total_b").cast("double")).alias("pi")))


# --- Ripley's K function --------------------------------------------------
#
# The standard multi-distance point-pattern statistic (Ripley 1976,
# public literature): K(r) = area * E[pairs within r] scaled so that
# complete spatial randomness gives K(r) = pi*r^2 — K above the CSR
# line means clustering at scale r, below means dispersion.  The
# operator reports, per radius in a ladder:
#
#   n_pairs  — unordered point pairs with distance <= r   (exact int)
#   k_hat    — area * 2*n_pairs / n^2                     (one division)
#
# Naive (no edge correction, planar, no x-wrap) — the web-scale
# variant: at 1e12 points the boundary term vanishes; small-study
# deployments apply Ripley's isotropic correction on top.

def ripley_k(pts: DataFrame, radii: list[int],
             x_period: int = 360000, y_period: int = 170000,
             x_col: str = "x", y_col: str = "y",
             id_col: str = "id") -> DataFrame:
    """K-function ladder over integer planar points.

    One halo join at cell = max(radii) finds every candidate pair
    once (same coverage proof as `colocation_patterns`); the exact
    int64 d^2 feeds a single wide aggregation with one conditional
    SUM per radius — the ladder costs nothing beyond the largest
    radius.  Scale shape: 9x bounded explode, ONE cell-key shuffle,
    partial-agg'd global SUMs (one row), map-only unpivot."""
    if not radii or sorted(radii) != radii:
        raise ValueError("radii must be a non-empty ascending ladder")
    cell = radii[-1]
    max_r2 = cell * cell
    base = pts.select(F.col(id_col).alias("id"),
                      F.col(x_col).cast("long").alias("x"),
                      F.col(y_col).cast("long").alias("y"))
    center = base.select(
        "id", "x", "y",
        F.expr(f"((x div {cell}) + {_OFF}) * {_SHIFT}"
               f" + ((y div {cell}) + {_OFF})").alias("ck"))
    halo = base.select(
        "id", "x", "y",
        F.explode(F.expr(
            f"transform(sequence(0, 8), d -> "
            f"((x div {cell}) + (d div 3) - 1 + {_OFF}) * {_SHIFT}"
            f" + ((y div {cell}) + (d % 3) - 1 + {_OFF}))")).alias("ck"))
    l = halo.select(F.col("id").alias("ia"), F.col("x").alias("xa"),
                    F.col("y").alias("ya"), "ck")
    r = center.select(F.col("id").alias("ib"), F.col("x").alias("xb"),
                      F.col("y").alias("yb"), "ck")
    d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
          + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
    pairs = (l.join(r, "ck")
              .filter((F.col("ia") < F.col("ib")) & (d2 <= F.lit(max_r2)))
              .select(d2.alias("d2")))
    counts = pairs.agg(*[
        F.sum(F.when(F.col("d2") <= F.lit(rr * rr), 1).otherwise(0))
         .alias(f"c_{rr}") for rr in radii])
    n_row = base.agg(F.count(F.lit(1)).alias("n"))
    area = x_period * y_period
    ladder = counts.join(F.broadcast(n_row)).select(
        "n",
        F.explode(F.array(*[
            F.struct(F.lit(rr).cast("long").alias("r"),
                     F.coalesce(F.col(f"c_{rr}"), F.lit(0))
                      .cast("long").alias("n_pairs"))
            for rr in radii])).alias("e"))
    return ladder.select(
        F.col("e.r").alias("r"), F.col("e.n_pairs").alias("n_pairs"),
        # exact-int numerator / denominator, ONE rounded division
        ((F.lit(2 * area) * F.col("e.n_pairs")).cast("double")
         / (F.col("n") * F.col("n")).cast("double")).alias("k_hat"))


# --- G function (nearest-neighbor distance distribution) ------------------
#
# The empirical CDF of each point's nearest-neighbor distance
# (Diggle's G, point-pattern analysis; public literature).  Clustered
# patterns rise faster than the CSR curve 1 - exp(-lambda*pi*r^2),
# dispersed/inhibited patterns rise slower.  Complements ripley_k:
# K sees all pairs at scale r, G sees only the closest — an
# inhibition pattern can look CSR to K but not to G.

def g_function(pts: DataFrame, radii: list[int],
               x_col: str = "x", y_col: str = "y",
               id_col: str = "id") -> DataFrame:
    """Per-rung ``n_le`` = exact count of points whose nearest
    neighbor lies within r, and ``g_hat = n_le / n`` (one division).

    Points whose nearest neighbor is beyond max(radii) count in no
    rung (right-censoring at the ladder top — the standard bounded
    estimate; they are still in the ``n`` denominator).  Same
    halo-join scale shape as `ripley_k`, but DIRECTED: every point
    keeps its own min d^2 (one partial-agg'd groupBy(point)), then
    one global wide aggregation builds the whole ladder."""
    if not radii or sorted(radii) != radii:
        raise ValueError("radii must be a non-empty ascending ladder")
    cell = radii[-1]
    max_r2 = cell * cell
    base = pts.select(F.col(id_col).alias("id"),
                      F.col(x_col).cast("long").alias("x"),
                      F.col(y_col).cast("long").alias("y"))
    center = base.select(
        "id", "x", "y",
        F.expr(f"((x div {cell}) + {_OFF}) * {_SHIFT}"
               f" + ((y div {cell}) + {_OFF})").alias("ck"))
    halo = base.select(
        "id", "x", "y",
        F.explode(F.expr(
            f"transform(sequence(0, 8), d -> "
            f"((x div {cell}) + (d div 3) - 1 + {_OFF}) * {_SHIFT}"
            f" + ((y div {cell}) + (d % 3) - 1 + {_OFF}))")).alias("ck"))
    l = halo.select(F.col("id").alias("ia"), F.col("x").alias("xa"),
                    F.col("y").alias("ya"), "ck")
    r = center.select(F.col("id").alias("ib"), F.col("x").alias("xb"),
                      F.col("y").alias("yb"), "ck")
    d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
          + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
    # directed: ia's halo meets ib's center exactly once per (ia, ib)
    nn = (l.join(r, "ck")
           .filter((F.col("ia") != F.col("ib")) & (d2 <= F.lit(max_r2)))
           .groupBy("ia")
           .agg(F.min(d2).alias("nn_d2")))
    counts = nn.agg(*[
        F.sum(F.when(F.col("nn_d2") <= F.lit(rr * rr), 1).otherwise(0))
         .alias(f"c_{rr}") for rr in radii])
    n_row = base.agg(F.count(F.lit(1)).alias("n"))
    ladder = counts.join(F.broadcast(n_row)).select(
        "n",
        F.explode(F.array(*[
            F.struct(F.lit(rr).cast("long").alias("r"),
                     F.coalesce(F.col(f"c_{rr}"), F.lit(0))
                      .cast("long").alias("n_le"))
            for rr in radii])).alias("e"))
    return ladder.select(
        F.col("e.r").alias("r"), F.col("e.n_le").alias("n_le"),
        F.col("n").alias("n"),
        (F.col("e.n_le").cast("double")
         / F.col("n").cast("double")).alias("g_hat"))


# --- F function (empty-space function) ------------------------------------
#
# The third of the classic point-pattern trio (K / G / F): the CDF of
# the distance from a REFERENCE probe lattice to the nearest data
# point — "how far is typical empty space from the pattern".
# Clustered patterns leave big holes (F below CSR), regular patterns
# fill space (F above).  Probes are the deterministic grid x grid
# cell-center lattice over the period box, so both engines enumerate
# the identical probe set.

def f_function(pts: DataFrame, radii: list[int], grid: int = 32,
               x_period: int = 360000, y_period: int = 170000,
               x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Per rung: ``n_le`` = exact count of probe points whose nearest
    data point lies within r, ``n_probes = grid^2``, and
    ``f_hat = n_le / n_probes`` (one division).  Right-censored at the
    ladder top like `g_function`.  Same directed halo-join shape; the
    probe side is generated (`spark.range`), never shuffled raw."""
    if not radii or sorted(radii) != radii:
        raise ValueError("radii must be a non-empty ascending ladder")
    spark = pts.sparkSession
    cell = radii[-1]
    max_r2 = cell * cell
    n_probes = grid * grid
    probes = spark.range(n_probes).select(
        F.col("id").alias("pid"),
        F.expr(f"(id % {grid}) * {x_period} div {grid}"
               f" + {x_period // (2 * grid)}").alias("x"),
        F.expr(f"(id div {grid}) * {y_period} div {grid}"
               f" + {y_period // (2 * grid)}").alias("y"))
    halo = probes.select(
        "pid", "x", "y",
        F.explode(F.expr(
            f"transform(sequence(0, 8), d -> "
            f"((x div {cell}) + (d div 3) - 1 + {_OFF}) * {_SHIFT}"
            f" + ((y div {cell}) + (d % 3) - 1 + {_OFF}))")).alias("ck"))
    data = pts.select(
        F.col(x_col).cast("long").alias("dx"),
        F.col(y_col).cast("long").alias("dy")).select(
        "dx", "dy",
        F.expr(f"((dx div {cell}) + {_OFF}) * {_SHIFT}"
               f" + ((dy div {cell}) + {_OFF})").alias("ck"))
    d2 = ((F.col("x") - F.col("dx")) * (F.col("x") - F.col("dx"))
          + (F.col("y") - F.col("dy")) * (F.col("y") - F.col("dy")))
    nn = (halo.join(data, "ck")
              .filter(d2 <= F.lit(max_r2))
              .groupBy("pid")
              .agg(F.min(d2).alias("nn_d2")))
    counts = nn.agg(*[
        F.sum(F.when(F.col("nn_d2") <= F.lit(rr * rr), 1).otherwise(0))
         .alias(f"c_{rr}") for rr in radii])
    ladder = counts.select(F.explode(F.array(*[
        F.struct(F.lit(rr).cast("long").alias("r"),
                 F.coalesce(F.col(f"c_{rr}"), F.lit(0))
                  .cast("long").alias("n_le"))
        for rr in radii])).alias("e"))
    return ladder.select(
        F.col("e.r").alias("r"), F.col("e.n_le").alias("n_le"),
        F.lit(n_probes).cast("long").alias("n_probes"),
        (F.col("e.n_le").cast("double")
         / F.lit(float(n_probes))).alias("f_hat"))


# --- bivariate cross-K function -------------------------------------------
#
# Ripley's K between TWO point types (cross-K, a.k.a. K_ab): are B
# points clustered around A points at scale r?  The distance-profile
# companion to the categorical participation index above — CSR
# independence gives K_ab(r) = pi*r^2; above = attraction, below =
# repulsion.

def cross_k(left: DataFrame, right: DataFrame, radii: list[int],
            x_period: int = 360000, y_period: int = 170000) -> DataFrame:
    """Cross-K ladder between ``left`` (columns x, y) and ``right``
    (columns x, y) integer planar point sets: per rung the exact
    ordered (a, b) pair count within r and
    ``k_ab = area * n_pairs / (n_a * n_b)`` (one division).  Same
    one-halo-join-serves-the-ladder shape as `ripley_k`; no self-pair
    or double-count concern because the sides are distinct tables."""
    if not radii or sorted(radii) != radii:
        raise ValueError("radii must be a non-empty ascending ladder")
    cell = radii[-1]
    max_r2 = cell * cell
    a = left.select(F.col("x").cast("long").alias("xa"),
                    F.col("y").cast("long").alias("ya"))
    b = right.select(F.col("x").cast("long").alias("xb"),
                     F.col("y").cast("long").alias("yb"))
    halo = a.select(
        "xa", "ya",
        F.explode(F.expr(
            f"transform(sequence(0, 8), d -> "
            f"((xa div {cell}) + (d div 3) - 1 + {_OFF}) * {_SHIFT}"
            f" + ((ya div {cell}) + (d % 3) - 1 + {_OFF}))")).alias("ck"))
    center = b.select(
        "xb", "yb",
        F.expr(f"((xb div {cell}) + {_OFF}) * {_SHIFT}"
               f" + ((yb div {cell}) + {_OFF})").alias("ck"))
    d2 = ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
          + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
    pairs = (halo.join(center, "ck")
                 .filter(d2 <= F.lit(max_r2))
                 .select(d2.alias("d2")))
    counts = pairs.agg(*[
        F.sum(F.when(F.col("d2") <= F.lit(rr * rr), 1).otherwise(0))
         .alias(f"c_{rr}") for rr in radii])
    na = a.agg(F.count(F.lit(1)).alias("n_a"))
    nb = b.agg(F.count(F.lit(1)).alias("n_b"))
    area = x_period * y_period
    ladder = (counts.join(F.broadcast(na)).join(F.broadcast(nb))
              .select("n_a", "n_b", F.explode(F.array(*[
                  F.struct(F.lit(rr).cast("long").alias("r"),
                           F.coalesce(F.col(f"c_{rr}"), F.lit(0))
                            .cast("long").alias("n_pairs"))
                  for rr in radii])).alias("e")))
    return ladder.select(
        F.col("e.r").alias("r"), F.col("e.n_pairs").alias("n_pairs"),
        "n_a", "n_b",
        ((F.lit(area) * F.col("e.n_pairs")).cast("double")
         / (F.col("n_a") * F.col("n_b")).cast("double")).alias("k_ab"))


# --- Knox space-time interaction test -------------------------------------
#
# Knox (1964, public literature): are events that are close in SPACE
# also close in TIME (disease outbreaks, aftershocks, contagion)?
# X = pairs within ds AND dt, compared to the permutation expectation
# E[X] = Ns * Nt / Npairs.  All four pair counts are exact integers;
# the ratio and expectation are single correctly-rounded divisions.


def knox_test(pts: DataFrame, ds: int, dt_s: int,
              id_col: str = "id", x_col: str = "x",
              y_col: str = "y", t_col: str = "es") -> DataFrame:
    """One-row Knox statistic over integer planar points with integer
    epoch-second timestamps.

    Scale plan: the spatial count is the colocation 3x3-halo cell
    join at cell = ds (bounded 9x explode, ONE data shuffle, exact
    int64 disc predicate in codegen) and the space-AND-time count
    rides the same join as a conditional sum — no second pass.  The
    temporal count is the 1-D twin: a 3-bucket halo on t div dt_s.
    Every unordered pair is generated exactly once per join (the
    left side's halo meets the right side's center bucket once).
    Expectation and ratio are exact int64 fractions (|Ns*Nt| needs
    < 2^63 — holds through ~3e9 close pairs per margin; beyond that
    move to DECIMAL(38) per map_snap)."""
    ds2 = ds * ds
    base = pts.select(F.col(id_col).alias("id"),
                      F.col(x_col).cast("long").alias("x"),
                      F.col(y_col).cast("long").alias("y"),
                      F.col(t_col).cast("long").alias("es"))
    center = base.select(
        "id", "x", "y", "es",
        F.expr(f"((x div {ds}) + {_OFF}) * {_SHIFT}"
               f" + ((y div {ds}) + {_OFF})").alias("ck"))
    halo = base.select(
        "id", "x", "y", "es",
        F.explode(F.expr(
            f"transform(sequence(0, 8), d -> "
            f"((x div {ds}) + (d div 3) - 1 + {_OFF}) * {_SHIFT}"
            f" + ((y div {ds}) + (d % 3) - 1 + {_OFF}))")).alias("ck"))
    l = halo.select(F.col("id").alias("ia"), F.col("x").alias("xa"),
                    F.col("y").alias("ya"), F.col("es").alias("ta"), "ck")
    r = center.select(F.col("id").alias("ib"), F.col("x").alias("xb"),
                      F.col("y").alias("yb"), F.col("es").alias("tb"), "ck")
    sp = (l.join(r, "ck")
          .filter((F.col("ia") < F.col("ib"))
                  & (((F.col("xa") - F.col("xb"))
                      * (F.col("xa") - F.col("xb"))
                      + (F.col("ya") - F.col("yb"))
                      * (F.col("ya") - F.col("yb"))) <= F.lit(ds2)))
          .agg(F.count(F.lit(1)).alias("n_space"),
               F.sum(
                   (F.abs(F.col("ta") - F.col("tb")) <= dt_s)
                   .cast("long")).alias("n_both")))
    tc = base.select(F.col("id").alias("ib"), F.col("es").alias("tb"),
                     F.expr(f"es div {dt_s}").alias("tk"))
    th = base.select(F.col("id").alias("ia"), F.col("es").alias("ta"),
                     F.explode(F.expr(
                         f"array(es div {dt_s} - 1, es div {dt_s},"
                         f" es div {dt_s} + 1)")).alias("tk"))
    tp = (th.join(tc, "tk")
          .filter((F.col("ia") < F.col("ib"))
                  & (F.abs(F.col("ta") - F.col("tb")) <= dt_s))
          .agg(F.count(F.lit(1)).alias("n_time")))
    tot = base.agg(F.count(F.lit(1)).alias("n"))
    ex_num = F.col("n_space") * F.col("n_time")
    ex_den = F.expr("n * (n - 1) div 2")
    return (tot.join(F.broadcast(sp)).join(F.broadcast(tp))
            .select(
                F.col("n").cast("long").alias("n"),
                ex_den.cast("long").alias("n_pairs"),
                F.col("n_space").cast("long").alias("n_space"),
                F.col("n_time").cast("long").alias("n_time"),
                F.coalesce(F.col("n_both"), F.lit(0)).cast("long")
                .alias("n_both"),
                ex_num.cast("long").alias("ex_num"),
                ex_den.cast("long").alias("ex_den"),
                (ex_num.cast("double") / ex_den.cast("double"))
                .alias("e_both"),
                (F.coalesce(F.col("n_both"), F.lit(0)) * ex_den)
                .cast("long").alias("knox_num"),
                ex_num.cast("long").alias("knox_den"),
                F.when(ex_num == 0, F.lit(0.0).cast("double"))
                .otherwise(
                    (F.coalesce(F.col("n_both"), F.lit(0)) * ex_den)
                    .cast("double") / ex_num.cast("double"))
                .alias("knox_ratio")))
