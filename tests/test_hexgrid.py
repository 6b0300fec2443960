"""Hexagonal cell index: DuckDB expression parity, axial-geometry
properties, plan purity, and hex-ring kNN == brute force (the CellIndex
seam's third backend)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from zellige_spark.operators import hexgrid as HX
from zellige_spark.operators import knn as KNN

SF = "/root/testdata/sf0.001"


def test_ring_offsets_counts_and_symmetry():
    for r in (0, 1, 2, 5):
        offs = HX.ring_offsets(r)
        assert len(offs) == 3 * r * r + 3 * r + 1
        assert all((-dq, -dr) in offs for dq, dr in offs)
        assert all(max(abs(dq), abs(dr), abs(dq + dr)) <= r
                   for dq, dr in offs)


def test_hex_assignment_matches_duckdb_on_random_points(spark):
    import duckdb

    rng = np.random.default_rng(4)
    n = 5000
    pdf = pd.DataFrame({"c_custkey": np.arange(n),
                        "lon": rng.uniform(-180, 180, n),
                        "lat": rng.uniform(-85, 85, n)})
    level = 9
    sp = (HX.with_hex_cell(spark.createDataFrame(pdf), level)
          .select("c_custkey", "hq", "hr", "hex_key")
          .orderBy("c_custkey").toPandas())
    con = duckdb.connect()
    con.register("pts", pdf)
    hq, hr = HX.hex_qr_sql(level)
    x = f"least({HX.T.WGS84_MAJOR_RADIUS!r} * radians(lon), {HX.T.MAX_EXTENTS!r})"
    y = (f"greatest({HX.T.WGS84_MAJOR_RADIUS!r} * "
         f"ln(tan(0.25 * pi() + 0.5 * radians(lat))), {-HX.T.MAX_EXTENTS!r})")
    du = con.execute(
        f"WITH proj AS (SELECT c_custkey, {x} AS x3857, {y} AS y3857 FROM pts) "
        f"SELECT c_custkey, {hq} AS hq, {hr} AS hr, "
        f"{HX.hex_key_sql(hq, hr)} AS hex_key FROM proj ORDER BY c_custkey"
    ).fetchdf()
    for c in ("hq", "hr", "hex_key"):
        assert np.array_equal(sp[c].to_numpy().astype(np.int64),
                              du[c].to_numpy().astype(np.int64)), c


def test_hex_cells_are_voronoi_of_centers(spark):
    """Cube rounding must assign each point to its NEAREST hex center
    (that's what makes the cells hexagons)."""
    rng = np.random.default_rng(8)
    n = 2000
    level = 6
    rc = HX.hex_size(level)
    pdf = pd.DataFrame({"c_custkey": np.arange(n),
                        "lon": rng.uniform(-170, 170, n),
                        "lat": rng.uniform(-80, 80, n)})
    out = (HX.T.with_web_mercator(
               HX.with_hex_cell(spark.createDataFrame(pdf), level))
           .select("c_custkey", "hq", "hr", "x3857", "y3857")
           .orderBy("c_custkey").toPandas())
    q = out.hq.to_numpy(dtype=np.float64)
    r = out.hr.to_numpy(dtype=np.float64)
    cx = rc * np.sqrt(3.0) * (q + r / 2.0)
    cy = rc * 1.5 * r
    d_own = np.hypot(out.x3857 - cx, out.y3857 - cy)
    # strictly inside the circumradius, and no neighbor center closer
    assert (d_own <= rc + 1e-6).all()
    for dq, dr in HX.ring_offsets(1):
        if (dq, dr) == (0, 0):
            continue
        nx = rc * np.sqrt(3.0) * ((q + dq) + (r + dr) / 2.0)
        ny = rc * 1.5 * (r + dr)
        d_n = np.hypot(out.x3857 - nx, out.y3857 - ny)
        assert (d_own <= d_n + 1e-6).all(), (dq, dr)


def test_hex_assignment_plan_is_pure_jvm(spark):
    df = spark.range(100).select(
        (F.col("id") * 0.01).alias("lon"), (F.col("id") * 0.005).alias("lat"))
    plan = (HX.with_hex_cell(df, 8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan and "Exchange" not in plan


def _pts(spark, n, seed, id_col):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({id_col: np.arange(n),
                        "lon": rng.uniform(-179, 179, n),
                        "lat": rng.uniform(-80, 80, n)})
    return spark.createDataFrame(pdf)


def test_knn_hex_adaptive_equals_brute_dense(spark):
    q = _pts(spark, 15, 21, "query_id")
    d = _pts(spark, 3000, 22, "data_id")
    brute = KNN.knn_bruteforce(q, d, k=5, query_id="query_id",
                               data_id="data_id").orderBy("query_id", "rank").toPandas()
    hexa = HX.knn_hex_adaptive(q, d, k=5, level=3, start_ring=1,
                               query_id="query_id", data_id="data_id"
                               ).orderBy("query_id", "rank").toPandas()
    assert np.array_equal(brute.neighbor_id.to_numpy(), hexa.neighbor_id.to_numpy())


def test_knn_hex_adaptive_equals_brute_sparse_and_seam(spark):
    """Sparse corpus forces several expansion rounds; queries pinned on
    the antimeridian exercise the seam cap (no early settle on wrapped
    neighbors)."""
    rng = np.random.default_rng(31)
    qpdf = pd.DataFrame({"query_id": np.arange(6),
                         "lon": [-180.0, 179.99, -179.5, 0.0, 55.0, -120.0],
                         "lat": [10.0, -20.0, 45.0, 0.0, -60.0, 70.0]})
    dpdf = pd.DataFrame({"data_id": np.arange(40),
                         "lon": rng.uniform(-180, 180, 40),
                         "lat": rng.uniform(-75, 75, 40)})
    q = spark.createDataFrame(qpdf)
    d = spark.createDataFrame(dpdf)
    brute = KNN.knn_bruteforce(q, d, k=3, query_id="query_id",
                               data_id="data_id").orderBy("query_id", "rank").toPandas()
    hexa = HX.knn_hex_adaptive(q, d, k=3, level=4, start_ring=1,
                               query_id="query_id", data_id="data_id"
                               ).orderBy("query_id", "rank").toPandas()
    assert np.array_equal(brute.neighbor_id.to_numpy(), hexa.neighbor_id.to_numpy())


def _brute_polyfill(verts, level):
    """Independent numpy center-containment polyfill (vectorized
    even-odd ray cast over all candidate cells in the bbox)."""
    import math

    R = 6378137.0
    pts = np.array([[R * math.radians(x),
                     R * math.log(math.tan(0.25 * math.pi
                                           + 0.5 * math.radians(y)))]
                    for x, y in verts])
    size = HX.hex_size(level)
    S = size * math.sqrt(3.0)
    H = size * 1.5
    r0 = math.floor(pts[:, 1].min() / H) - 2
    r1 = math.ceil(pts[:, 1].max() / H) + 2
    cells = []
    for r in range(r0, r1 + 1):
        qlo = math.floor(pts[:, 0].min() / S - r / 2.0) - 2
        qhi = math.ceil(pts[:, 0].max() / S - r / 2.0) + 2
        for q in range(qlo, qhi + 1):
            cells.append((q, r))
    qs = np.array([c[0] for c in cells], dtype=np.float64)
    rs = np.array([c[1] for c in cells], dtype=np.float64)
    cx = S * (qs + rs / 2.0)
    cy = H * rs
    inside = np.zeros(len(cells), dtype=np.int64)
    for (x1, y1), (x2, y2) in zip(pts[:-1], pts[1:]):
        if y1 == y2:
            continue
        t = (cy - y1) / (y2 - y1)
        xint = x1 + t * (x2 - x1)
        hit = (cy >= min(y1, y2)) & (cy < max(y1, y2)) & (xint > cx)
        inside += hit.astype(np.int64)
    return {c for c, k in zip(cells, inside) if k % 2 == 1}


def test_hex_polyfill_matches_numpy_brute_force(spark):
    from zellige_spark.queries import _zonal_polys

    zones = _zonal_polys()
    got = HX.hex_polyfill(spark, zones, HX.POLYFILL_LEVEL).collect()
    by_zone = {}
    for row in got:
        by_zone.setdefault(row.zone, set()).add((row.hq, row.hr))
    assert set(by_zone) == set(zones)
    for z, verts in zones.items():
        want = _brute_polyfill(verts, HX.POLYFILL_LEVEL)
        assert by_zone[z] == want, f"zone {z} cover mismatch"
        assert len(want) > 20  # the fill is substantive, not degenerate
    # hex_key packing is consistent with the assignment-side packing
    one = got[0]
    assert one.hex_key == (one.hq + (1 << 30)) * (1 << 31) + (one.hr + (1 << 30))
