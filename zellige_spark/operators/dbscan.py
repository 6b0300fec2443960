"""Exact DBSCAN over integer planar points, grid-blocked.

``hotspots.hotspot_clusters`` is the web-scale grid APPROXIMATION of
density clustering (cell width stands in for eps).  This module is the
exact counterpart: true eps-ball neighborhoods, core/border/noise
roles, and clusters = connected components of the core-core graph —
DBSCAN (Ester et al., KDD'96) with every decision integer-exact so a
DuckDB oracle can re-derive the whole labeling.

Determinism notes (DBSCAN's one underspecified corner): border points
reachable from cores in several clusters take the SMALLEST cluster id
among their core neighbors, and a cluster's id is the smallest core
point id in its component — both total orders, so the labeling is
unique and engine-independent.

Scale plan: the only all-rows operation is the neighbor join, blocked
by grid cells of side exactly ``eps`` — a point's eps-ball is covered
by its 3x3 cell neighborhood, so the join is an equi-join on cell
keys (one shuffle), never a cross join, and each qualifying ordered
pair is produced exactly once (cell indices of a pair within eps
differ by at most 1, and each of the 9 probed cells is distinct).
Everything downstream — degrees, the core set, the component loop
(``dedup.connected_components``, O(|E| log n)) — runs on the pair/core
tables, which are |pairs|-bounded, not corpus-bounded.  The honest
caveat at 10^12 rows: a single cell holding m points contributes
O(m^2) candidate pairs; exact DBSCAN cannot avoid that (the answer
itself is quadratic in a dense blob).  For corpora with pathological
blobs, cap densities upstream (``tile_cap``) or use the grid variant;
the blocking here makes the exact algorithm linear in the TRUE
neighbor-pair count, which is the best an exact method can do.

Requires non-negative integer coordinates (the driver query derives a
quasi-uniform lattice from customer keys with independent coprime
moduli — dependent moduli would collapse the points onto a 1-D
diagonal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import connected_components
from ..io_scan import read_sf

__all__ = ["eps_pairs", "dbscan", "q_dbscan", "sql_dbscan"]

DB_EPS = 10
DB_MIN_PTS = 6   # neighborhood size INCLUDING the point itself
# Knuth-multiplicative-hashed coordinates on a 293x307 box: a LINEAR
# derivation (k*a % m) is a rank-1 lattice — every interior point sees
# the same rigid offset set, so degrees are all-equal and the
# core/border split is knife-edge.  Hashing first gives pseudo-uniform
# scatter (Poisson-like neighborhoods).  The 31-bit pre-mask keeps the
# product inside int64 on both engines (text._MIX_HASH rationale).
DB_X = ("((((c_custkey % 2147483648 + 2147483648) % 2147483648)"
        " * 2654435761) % 2147483648) % 293")
DB_Y = ("(((((c_custkey + 7) % 2147483648 + 2147483648) % 2147483648)"
        " * 2246822519) % 2147483648) % 307")


def eps_pairs(pts: DataFrame, eps: int,
              id_col: str = "point_id") -> DataFrame:
    """Ordered neighbor pairs (ia, ib), ia != ib, within Euclidean
    distance ``eps`` (inclusive, squared-integer test).  Grid-blocked:
    home cell of side eps on the right, 3x3 probe cells on the left;
    the equi-join on cell keys is the only shuffle that sees every
    row.  Each ordered pair appears exactly once (no distinct)."""
    probe = pts.select(
        F.col(id_col).alias("ia"), F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(F.array(*[
            F.struct((F.expr(f"x div {eps}") + dx).alias("cx"),
                     (F.expr(f"y div {eps}") + dy).alias("cy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("c"))
    home = pts.select(F.col(id_col).alias("ib"),
                      F.col("x").alias("xb"), F.col("y").alias("yb"),
                      F.expr(f"x div {eps}").alias("cx"),
                      F.expr(f"y div {eps}").alias("cy"))
    return (probe.select("ia", "xa", "ya",
                         F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
            .join(home, ["cx", "cy"])
            .filter((F.col("ia") != F.col("ib"))
                    & ((F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
                       + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
                       <= F.lit(eps * eps)))
            .select("ia", "ib"))


def dbscan(pts: DataFrame, eps: int, min_pts: int,
           id_col: str = "point_id") -> DataFrame:
    """DBSCAN labeling: (point_id, n_nbr, role, cluster) with
    role 2 = core (eps-ball population incl. self >= min_pts),
    1 = border (non-core within eps of a core), 0 = noise; cluster =
    smallest core id in the component for cores, smallest core
    neighbor's cluster for borders, -1 for noise."""
    pairs = eps_pairs(pts, eps, id_col=id_col).localCheckpoint(eager=True)
    deg = pairs.groupBy(F.col("ia").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_nbr"))
    base = (pts.select(id_col)
            .join(deg, id_col, "left")
            .select(id_col, F.coalesce("n_nbr", F.lit(0)).alias("n_nbr"))
            .withColumn("is_core",
                        (F.col("n_nbr") + 1 >= min_pts).cast("int")))
    # Core set from the degree table alone whenever min_pts > 1 (a
    # zero-neighbor point can never be core then) — same set as
    # base.filter(is_core), but it keeps the corpus scan + left-join
    # OUT of the connected-components lineage: with base in the loop's
    # ancestry, Spark 4.1's size-only stats walk during the CC edge
    # checkpoint's join planning ran for minutes and OOM'd the driver
    # at sf0.1 (observed: SizeInBytesOnlyStatsPlanVisitor hot in
    # thread dumps, then java.lang.OutOfMemoryError in planning); the
    # deg-only lineage plans instantly and also drops a second scan.
    if min_pts > 1:
        cores = (deg.filter(F.col("n_nbr") + 1 >= min_pts)
                 .select(id_col))
    else:
        cores = base.filter(F.col("is_core") == 1).select(id_col)
    core_edges = (pairs
                  .join(cores.withColumnRenamed(id_col, "ia"), "ia")
                  .join(cores.withColumnRenamed(id_col, "ib"), "ib")
                  .filter(F.col("ia") < F.col("ib"))
                  .select(F.col("ia").alias("doc_a"),
                          F.col("ib").alias("doc_b")))
    comps = connected_components(core_edges)
    core_lab = (cores
                .join(comps.withColumnRenamed("node", id_col), id_col, "left")
                .select(id_col,
                        F.coalesce("component", F.col(id_col)).alias("cluster")))
    border_lab = (pairs
                  .join(core_lab.withColumnRenamed(id_col, "ib"), "ib")
                  .groupBy(F.col("ia").alias(id_col))
                  .agg(F.min("cluster").alias("b_cluster")))
    return (base
            .join(core_lab, id_col, "left")
            .join(border_lab, id_col, "left")
            .select(id_col, "n_nbr",
                    F.when(F.col("is_core") == 1, F.lit(2))
                     .when(F.col("b_cluster").isNotNull(), F.lit(1))
                     .otherwise(F.lit(0)).cast("int").alias("role"),
                    F.coalesce(
                        "cluster",
                        F.when(F.col("is_core") == 0, F.col("b_cluster")),
                        F.lit(-1)).alias("cluster")))


def q_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: DBSCAN over customer points on the 293x307
    integer torus (eps=10, min_pts=6 — the sf0.01 density puts the
    mean eps-ball population right at the core threshold, so all three
    roles appear)."""
    cust = read_sf(spark, sf_dir, "customer")
    pts = cust.select(F.col("c_custkey").cast("long").alias("point_id"),
                      F.expr(DB_X).cast("long").alias("x"),
                      F.expr(DB_Y).cast("long").alias("y"))
    return (dbscan(pts, DB_EPS, DB_MIN_PTS)
            .select(F.col("point_id"), F.col("n_nbr").cast("long"),
                    F.col("role").cast("int"),
                    F.col("cluster").cast("long"))
            .orderBy("point_id"))


def sql_dbscan() -> str:
    eps2 = DB_EPS * DB_EPS
    return f"""
    WITH RECURSIVE pts AS (
      SELECT CAST(c_custkey AS BIGINT) AS id,
             CAST({DB_X} AS BIGINT) AS x,
             CAST({DB_Y} AS BIGINT) AS y
      FROM customer
    ),
    nbr AS (
      SELECT a.id AS ia, b.id AS ib
      FROM pts a JOIN pts b
        ON a.id <> b.id
       AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {eps2}
    ),
    deg AS (SELECT ia AS id, COUNT(*) AS n FROM nbr GROUP BY ia),
    core AS (
      SELECT p.id FROM pts p LEFT JOIN deg ON deg.id = p.id
      WHERE COALESCE(deg.n, 0) + 1 >= {DB_MIN_PTS}
    ),
    ce AS (
      SELECT ia, ib FROM nbr
      WHERE ia IN (SELECT id FROM core) AND ib IN (SELECT id FROM core)
    ),
    reach(node, r) AS (
      SELECT ia, ib FROM ce
      UNION
      SELECT reach.node, ce.ib FROM reach JOIN ce ON reach.r = ce.ia
    ),
    comp AS (
      SELECT node, least(node, MIN(r)) AS component FROM reach GROUP BY node
    ),
    corelab AS (
      SELECT core.id, COALESCE(comp.component, core.id) AS cluster
      FROM core LEFT JOIN comp ON comp.node = core.id
    ),
    borderlab AS (
      SELECT nbr.ia AS id, MIN(corelab.cluster) AS b_cluster
      FROM nbr JOIN corelab ON corelab.id = nbr.ib
      WHERE nbr.ia NOT IN (SELECT id FROM core)
      GROUP BY nbr.ia
    )
    SELECT p.id AS point_id,
           CAST(COALESCE(deg.n, 0) AS BIGINT) AS n_nbr,
           CAST(CASE WHEN corelab.id IS NOT NULL THEN 2
                     WHEN borderlab.id IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS role,
           CAST(COALESCE(corelab.cluster, borderlab.b_cluster, -1)
                AS BIGINT) AS cluster
    FROM pts p
    LEFT JOIN deg ON deg.id = p.id
    LEFT JOIN corelab ON corelab.id = p.id
    LEFT JOIN borderlab ON borderlab.id = p.id
    ORDER BY point_id
    """
