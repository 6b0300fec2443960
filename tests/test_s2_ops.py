"""Spark-side S2 index tests: Column twin == numpy kernel, pure-JVM
plan, DuckDB oracle parity, and S2-backed kNN == brute force."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from zellige_spark.kernel import s2 as K
from zellige_spark.operators import knn as KNN
from zellige_spark.operators import s2cells as S2C

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def random_points(spark):
    rng = np.random.default_rng(99)
    n = 20000
    pdf = pd.DataFrame({"id": np.arange(n),
                        "lon": rng.uniform(-180, 180, n),
                        "lat": rng.uniform(-90, 90, n)})
    return pdf, spark.createDataFrame(pdf)


def test_column_twin_matches_kernel(spark, random_points):
    pdf, df = random_points
    level = 12
    out = (S2C.with_s2_cell(df, level)
           .select("id", "s2_face", "s2_i", "s2_j", "s2_pos", "s2_cid")
           .orderBy("id").toPandas())
    face, i, j, pos = K.lonlat_to_cell(pdf.lon.to_numpy(), pdf.lat.to_numpy(), level)
    assert np.array_equal(out.s2_face.to_numpy(), face)
    assert np.array_equal(out.s2_i.to_numpy(), i)
    assert np.array_equal(out.s2_j.to_numpy(), j)
    assert np.array_equal(out.s2_pos.to_numpy(), pos)
    assert np.array_equal(out.s2_cid.to_numpy(), K.cid_pack(face, pos, level))


def test_column_twin_matches_kernel_on_edge_points(spark):
    # poles, antimeridian, equator, face centers and cube-corner
    # directions: the coordinates where clamping/tie-break bugs live
    pts = [(lon, lat)
           for lon in (-180.0, -135.0, -90.0, -45.0, 0.0, 45.0, 90.0, 135.0, 180.0)
           for lat in (-90.0, -45.0, -35.26438968, 0.0, 35.26438968, 45.0, 90.0)]
    pdf = pd.DataFrame({"id": range(len(pts)),
                        "lon": [p[0] for p in pts],
                        "lat": [p[1] for p in pts]})
    level = 11
    out = (S2C.with_s2_cell(spark.createDataFrame(pdf), level)
           .select("id", "s2_face", "s2_pos").orderBy("id").toPandas())
    face, _i, _j, pos = K.lonlat_to_cell(pdf.lon.to_numpy(), pdf.lat.to_numpy(), level)
    assert np.array_equal(out.s2_face.to_numpy(), face)
    assert np.array_equal(out.s2_pos.to_numpy(), pos)


def test_assignment_plan_is_pure_jvm(spark, random_points):
    _, df = random_points
    plan = S2C.with_s2_cell(df, 12)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    assert "Exchange" not in plan  # assignment is shuffle-free


def test_driver_query_matches_duckdb_oracle(spark):
    import duckdb

    sp = (S2C.q_s2_cell_assign(spark, SF)
          .orderBy("c_custkey", "level").toPandas())
    con = duckdb.connect()
    con.execute("CREATE VIEW customer AS SELECT * FROM "
                f"read_parquet('{SF}/customer.parquet')")
    du = con.execute(S2C.sql_s2_cell_assign()
                     + " ORDER BY c_custkey, level").fetchdf()
    assert len(sp) == len(du) > 0
    for c in ["c_custkey", "level", "s2_face", "s2_pos", "s2_cid"]:
        assert np.array_equal(sp[c].to_numpy(), du[c].to_numpy()), c


def test_hierarchy_inside_driver_query(spark):
    out = S2C.q_s2_cell_assign(spark, SF).toPandas()
    by_level = {lv: g.set_index("c_custkey") for lv, g in out.groupby("level")}
    l12, l8 = by_level[12], by_level[8]
    joined = l12.join(l8, rsuffix="_8")
    assert np.array_equal(joined.s2_cid.to_numpy() >> (2 * 4),
                          joined.s2_cid_8.to_numpy())


def test_knn_s2_fixed_ring_equals_brute_on_dense(spark):
    rng = np.random.default_rng(5)
    d = spark.createDataFrame(pd.DataFrame({
        "data_id": np.arange(4000),
        "lon": rng.uniform(-180, 180, 4000),
        "lat": rng.uniform(-85, 85, 4000)}))
    q = spark.createDataFrame(pd.DataFrame({
        "query_id": np.arange(30),
        "lon": rng.uniform(-180, 180, 30),
        "lat": rng.uniform(-85, 85, 30)}))
    got = (S2C.knn_s2_kring(q, d, k=5, level=2, ring=3, data_id="data_id")
           .select("query_id", "neighbor_id", "rank")
           .orderBy("query_id", "rank").toPandas())
    want = (KNN.knn_bruteforce(q, d, k=5, data_id="data_id")
            .select("query_id", "neighbor_id", "rank")
            .orderBy("query_id", "rank").toPandas())
    assert np.array_equal(got.to_numpy(), want.to_numpy())


def test_knn_s2_adaptive_equals_brute_on_sparse(spark):
    # 40 points clustered in one region, queries far away and inside:
    # the fixed-ring contract would need a huge ring; adaptive expands
    rng = np.random.default_rng(3)
    d = spark.createDataFrame(pd.DataFrame({
        "data_id": np.arange(40),
        "lon": rng.uniform(100, 110, 40),
        "lat": rng.uniform(-10, 0, 40)}))
    q = spark.createDataFrame(pd.DataFrame({
        "query_id": [0, 1, 2],
        "lon": [-150.0, 105.0, 30.0],
        "lat": [80.0, -5.0, 45.0]}))
    got = (S2C.knn_s2_adaptive(q, d, k=5, level=4, start_ring=1, data_id="data_id")
           .select("query_id", "neighbor_id", "rank")
           .orderBy("query_id", "rank").toPandas())
    want = (KNN.knn_bruteforce(q, d, k=5, data_id="data_id")
            .select("query_id", "neighbor_id", "rank")
            .orderBy("query_id", "rank").toPandas())
    assert np.array_equal(got.to_numpy(), want.to_numpy())


def test_knn_s2_fewer_than_k(spark):
    d = spark.createDataFrame(pd.DataFrame({
        "data_id": [0, 1], "lon": [10.0, 11.0], "lat": [45.0, 45.5]}))
    q = spark.createDataFrame(pd.DataFrame({
        "query_id": [7], "lon": [-120.0], "lat": [-30.0]}))
    got = (S2C.knn_s2_adaptive(q, d, k=5, level=3, data_id="data_id")
           .orderBy("rank").toPandas())
    assert list(got.neighbor_id) in ([0, 1], [1, 0])
    assert len(got) == 2  # all that exist


def test_repartition_by_s2_locality_ranges_disjoint(spark, tmp_path):
    # range partitioning by the Hilbert cid must yield files whose cid
    # ranges are non-overlapping compact regions — the property that
    # lets cid-range predicates prune files at scale
    rng = np.random.default_rng(11)
    n = 20000
    df = spark.createDataFrame(pd.DataFrame({
        "id": np.arange(n),
        "lon": rng.uniform(-180, 180, n),
        "lat": rng.uniform(-90, 90, n)}))
    out = S2C.repartition_by_s2_locality(df, level=10, partitions=8)
    path = str(tmp_path / "s2layout")
    out.write.parquet(path)
    import glob

    import pyarrow.parquet as pq
    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        t = pq.read_table(f, columns=["s2_cid"])
        c = t.column("s2_cid").to_numpy()
        if len(c):
            ranges.append((c.min(), c.max()))
            # sorted within the file -> row-group stats prune in-file
            assert np.all(np.diff(c) >= 0)
    ranges.sort()
    assert len(ranges) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint cid ranges across files

    # a predicate covering exactly one file's cid range returns exactly
    # that file's rows, and the scan pushes the cid filter down
    back = spark.read.parquet(path)
    lo, hi = int(ranges[2][0]), int(ranges[2][1])
    one_file = back.filter((F.col("s2_cid") >= lo) & (F.col("s2_cid") <= hi))
    per_file_rows = pq.read_table(
        sorted(glob.glob(f"{path}/part-*.parquet"))[0].rsplit("/", 1)[0],
        columns=["s2_cid"]).column("s2_cid").to_numpy()
    want = int(((per_file_rows >= lo) & (per_file_rows <= hi)).sum())
    assert one_file.count() == want > 0
    plan = one_file._jdf.queryExecution().executedPlan().toString()
    assert "s2_cid" in plan and "PushedFilters" in plan


def test_knn_s2_driver_query_matches_brute_oracle(spark):
    from zellige_spark.queries import CUST_LAT, CUST_LON, NAT_LAT, NAT_LON

    got = (S2C.q_knn_s2(spark, SF)
           .orderBy("query_id", "rank").toPandas())
    queries = (spark.read.parquet(f"{SF}/nation.parquet")
               .select(F.col("n_nationkey").alias("query_id"),
                       F.expr(NAT_LON).alias("lon"), F.expr(NAT_LAT).alias("lat")))
    data = (spark.read.parquet(f"{SF}/customer.parquet")
            .select(F.col("c_custkey").alias("data_id"),
                    F.expr(CUST_LON).alias("lon"), F.expr(CUST_LAT).alias("lat")))
    want = (KNN.knn_bruteforce(queries, data, k=5,
                               query_id="query_id", data_id="data_id")
            .select(F.col("query_id").cast("long"),
                    F.col("neighbor_id").cast("long"),
                    F.col("rank").cast("int"))
            .orderBy("query_id", "rank").toPandas())
    assert np.array_equal(got.to_numpy(), want.to_numpy())


def test_s2_polygon_cover_matches_kernel_and_uncompacts(spark):
    """The lattice-sampled S2 covering equals the numpy kernel run over
    the same lattice (triple-equality extension: the DuckDB twin is the
    driver oracle), and the compacted cover uncompacts back to exactly
    the level-6 cell set."""
    from zellige_spark.queries import (PIP_POLY, S2_COVER_LEVEL,
                                       _S2_COVER_LAT0, _S2_COVER_LON0,
                                       _S2_COVER_NI, _S2_COVER_NJ,
                                       q_s2_polygon_cover)

    # numpy twin: same lattice, even-odd ray cast, kernel cell ids
    ii, jj = np.meshgrid(np.arange(_S2_COVER_NI + 1),
                         np.arange(_S2_COVER_NJ + 1))
    lon = _S2_COVER_LON0 + 0.25 * ii.ravel()
    lat = _S2_COVER_LAT0 + 0.25 * jj.ravel()
    verts = np.asarray(PIP_POLY)
    cross = np.zeros(lon.shape, dtype=np.int64)
    for (x1, y1), (x2, y2) in zip(verts[:-1], verts[1:]):
        if y1 == y2:
            continue
        t = (lat - y1) / (y2 - y1)
        xint = x1 + t * (x2 - x1)
        cross += ((lat >= min(y1, y2)) & (lat < max(y1, y2))
                  & (xint > lon)).astype(np.int64)
    ins = (cross % 2) == 1
    want = set(np.unique(
        K.lonlat_to_cid(lon[ins], lat[ins], S2_COVER_LEVEL)).tolist())

    cover = q_s2_polygon_cover(spark, SF).collect()
    assert len(cover) > 0
    levels = {r.level for r in cover}
    assert len(levels) > 1, "cover should be genuinely mixed-level"
    # uncompact to level 6: every cell expands to its 4^(6-l) leaves
    got = set()
    for r in cover:
        span = 4 ** (S2_COVER_LEVEL - r.level)
        base = r.s2_cid * span
        got.update(range(base, base + span))
    assert got == want
