"""Round-6 operator tests: interval overlap join, co-travel — the
temporal/contact join family added on top of the round-5 surface."""

import numpy as np
import pytest


def test_interval_overlap_join_matches_bruteforce(spark):
    """General interval x interval overlap equals the literal range
    predicate; pairs spanning MANY chunks are still emitted exactly
    once (ownership dedup, no distinct); zero-length intervals drop;
    the plan has no cartesian/nested-loop join."""
    from zellige_spark.operators import temporal as TP

    rng = np.random.default_rng(57)
    n_a, n_b = 300, 200
    a_s = rng.integers(0, 100000, n_a)
    a_len = rng.integers(0, 9000, n_a)          # some zero-length
    b_s = rng.integers(0, 100000, n_b)
    b_len = rng.integers(1, 40000, n_b)         # long: many chunks
    a_rows = [(i, int(a_s[i]), int(a_s[i] + a_len[i])) for i in range(n_a)]
    b_rows = [(j, int(b_s[j]), int(b_s[j] + b_len[j])) for j in range(n_b)]
    a = spark.createDataFrame(a_rows, "a_id long, a_s long, a_e long")
    b = spark.createDataFrame(b_rows, "b_id long, b_s long, b_e long")
    out = TP.interval_overlap_join(a, b, chunk=1000)
    got = [(r.a_id, r.b_id, r.overlap_s, r.overlap_e)
           for r in out.collect()]
    assert len(got) == len(set(got)), "ownership dedup emitted a pair twice"

    want = []
    for i, sa, ea in a_rows:
        if ea <= sa:
            continue
        for j, sb, eb in b_rows:
            if max(sa, sb) < min(ea, eb):
                want.append((i, j, max(sa, sb), min(ea, eb)))
    assert sorted(got) == sorted(want)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_join_point_probe_special_case(spark):
    """[ts, ts+1) point probes reduce to point-in-interval semantics:
    inclusive start, exclusive end, boundary instants pinned."""
    from zellige_spark.operators import temporal as TP

    iv = spark.createDataFrame([(1, 100, 200)], "b_id long, b_s long, b_e long")
    pts = spark.createDataFrame(
        [(10, 99), (11, 100), (12, 199), (13, 200)],
        "a_id long, ts long")
    pr = pts.selectExpr("a_id", "ts as a_s", "ts + 1 as a_e")
    got = sorted(r.a_id for r in
                 TP.interval_overlap_join(pr, iv, chunk=50).collect())
    assert got == [11, 12]   # 99 before, 200 at the exclusive end


def test_interval_overlap_join_rejects_bad_chunk(spark):
    from zellige_spark.operators import temporal as TP

    df = spark.createDataFrame([(1, 0, 10)], "a_id long, a_s long, a_e long")
    with pytest.raises(ValueError):
        TP.interval_overlap_join(df, df, chunk=0)


def _brute_hausdorff_pairs(pts_by_ent, tau):
    """Literal all-pairs symmetric Hausdorff over int point sets."""
    ents = sorted(pts_by_ent)
    want = []
    for i, ea in enumerate(ents):
        A = pts_by_ent[ea]
        for eb in ents[i + 1:]:
            B = pts_by_ent[eb]
            d2 = ((A[:, None, 0] - B[None, :, 0]) ** 2
                  + (A[:, None, 1] - B[None, :, 1]) ** 2)
            h_ab = int(d2.min(axis=1).max())
            h_ba = int(d2.min(axis=0).max())
            if max(h_ab, h_ba) <= tau * tau:
                want.append((ea, eb, h_ab, h_ba, max(h_ab, h_ba)))
    return sorted(want)


def test_hausdorff_join_matches_bruteforce(spark):
    """Grid-blocked Hausdorff join equals the literal all-pairs
    max-min recompute on clustered tracks (incl. pairs whose expanded
    bboxes share MANY cells — ownership dedup emits each pair once);
    the plan has no cartesian/nested-loop join."""
    from zellige_spark.operators import trajectories as TRJ

    rng = np.random.default_rng(83)
    pts_by_ent, rows = {}, []
    for ent in range(40):
        hx = int(rng.integers(0, 8)) * 1200
        hy = int(rng.integers(0, 8)) * 1200
        n = int(rng.integers(3, 30))
        xs = hx + rng.integers(0, 900, n)
        ys = hy + rng.integers(0, 900, n)
        pts_by_ent[ent] = np.stack([xs, ys], axis=1).astype(np.int64)
        rows += [(ent, int(x), int(y)) for x, y in zip(xs, ys)]
    a = spark.createDataFrame(rows, "ent long, x long, y long")
    # cell much smaller than the track span => co-homed pairs share
    # ~dozens of cells and exercise the ownership dedup hard
    out = TRJ.hausdorff_join(a, tau=1500, cell=200)
    got = sorted((r.ent_a, r.ent_b, r.h_ab_sq, r.h_ba_sq, r.h_sq)
                 for r in out.collect())
    assert len(got) == len(set(got)), "pair emitted twice"
    assert got == _brute_hausdorff_pairs(pts_by_ent, 1500)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hausdorff_join_negative_coords_and_duplicates(spark):
    """Negative lattice coordinates (truncating div cells) and
    duplicate points collapse correctly; identical tracks read H=0."""
    from zellige_spark.operators import trajectories as TRJ

    rows = [(1, -50, -50), (1, -10, -40), (1, -50, -50),
            (2, -50, -50), (2, -10, -40),
            (3, 400, 400)]
    df = spark.createDataFrame(rows, "ent long, x long, y long")
    got = {(r.ent_a, r.ent_b): (r.h_ab_sq, r.h_ba_sq, r.h_sq)
           for r in TRJ.hausdorff_join(df, tau=100, cell=100).collect()}
    assert got == {(1, 2): (0, 0, 0)}   # ent 3 is beyond tau of both


def _brute_frechet(A, B, tau):
    """Reference reachability DP, plain nested loops: returns
    (corner_reached, n_reachable_cells)."""
    n, m = len(A), len(B)
    ok = [[(A[i][0] - B[j][0]) ** 2 + (A[i][1] - B[j][1]) ** 2
           <= tau * tau for j in range(m)] for i in range(n)]
    reach = [[False] * m for _ in range(n)]
    total = 0
    for i in range(n):
        for j in range(m):
            if not ok[i][j]:
                continue
            if i == 0 and j == 0:
                reach[i][j] = True
            else:
                reach[i][j] = ((i > 0 and reach[i - 1][j])
                               or (j > 0 and reach[i][j - 1])
                               or (i > 0 and j > 0 and reach[i - 1][j - 1]))
            total += reach[i][j]
    return reach[n - 1][m - 1], total


def test_frechet_join_matches_bruteforce_dp(spark):
    """Vectorized per-run-cummax DP equals the literal nested-loop
    reachability DP pair by pair (verdict AND the full n_reach
    surface); every Fréchet match is also a Hausdorff match; ordered
    semantics reject set-equal tracks walked in opposite order at a
    tau that Hausdorff accepts."""
    from zellige_spark.operators import trajectories as TRJ

    rng = np.random.default_rng(29)
    tracks, rows = {}, []
    for ent in range(30):
        hx = int(rng.integers(0, 6)) * 800
        hy = int(rng.integers(0, 6)) * 800
        n = int(rng.integers(2, 25))
        pts = [(hx + int(rng.integers(0, 700)),
                hy + int(rng.integers(0, 700))) for _ in range(n)]
        tracks[ent] = pts
        rows += [(ent, k, x, y) for k, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "ent long, ord long, x long, y long")
    tau = 900
    out = TRJ.frechet_join(df, tau, cell=300, order_col="ord")
    got = sorted((r.ent_a, r.ent_b, r.n_a, r.n_b, r.n_reach)
                 for r in out.collect())

    want = []
    ents = sorted(tracks)
    for i, ea in enumerate(ents):
        for eb in ents[i + 1:]:
            hit, n_reach = _brute_frechet(tracks[ea], tracks[eb], tau)
            if hit:
                want.append((ea, eb, len(tracks[ea]),
                             len(tracks[eb]), n_reach))
    assert got == sorted(want)

    # frechet matches are a subset of hausdorff matches at the same tau
    hd = TRJ.hausdorff_join(
        df.select("ent", "x", "y"), tau, cell=300)
    hd_pairs = {(r.ent_a, r.ent_b) for r in hd.collect()}
    assert {(a, b) for a, b, *_ in got} <= hd_pairs

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_frechet_join_order_sensitivity(spark):
    """Two tracks visiting the SAME points in reverse order: Hausdorff
    0, Fréchet large — the join must reject them at a small tau."""
    from zellige_spark.operators import trajectories as TRJ

    pts = [(0, 0), (1000, 0), (2000, 0), (3000, 0)]
    rows = ([(1, k, x, y) for k, (x, y) in enumerate(pts)]
            + [(2, k, x, y) for k, (x, y) in enumerate(reversed(pts))])
    df = spark.createDataFrame(rows, "ent long, ord long, x long, y long")
    assert TRJ.frechet_join(df, 500, cell=1000).count() == 0
    hd = TRJ.hausdorff_join(df.select("ent", "x", "y"), 500, cell=1000)
    assert [(r.ent_a, r.ent_b, r.h_sq) for r in hd.collect()] == [(1, 2, 0)]
    # at tau >= 3000 the leash can span the reversal
    assert TRJ.frechet_join(df, 3000, cell=1000).count() == 1


def _brute_grid_bfs(seeds, walkable, n, max_d):
    """Reference multi-source BFS with x-wrap, dict-based."""
    from collections import deque
    walk = set(walkable)
    dist = {c: 0 for c in seeds if c in walk}
    q = deque(dist)
    while q:
        x, y = q.popleft()
        d = dist[(x, y)]
        if d >= max_d:
            continue
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = ((x + dx) % n, y + dy)
            if 0 <= nb[1] < n and nb in walk and nb not in dist:
                dist[nb] = d + 1
                q.append(nb)
    return dist


def test_grid_geodesic_detour_and_wrap(spark):
    """A wall forces the BFS around (geodesic > Manhattan); x wraps
    across the antimeridian; seeds outside the walkable set drop;
    max_d truncates the transform."""
    from zellige_spark.operators import tiles as T

    n = 8   # zoom 3
    # walkable: full ring row y=2 (wrap test) plus a U-shaped corridor
    # around a wall at (2,5): (1,4..6), (2,4), (2,6), (3,4..6)
    walk = [(x, 2) for x in range(n)] + [
        (1, 4), (1, 5), (1, 6), (2, 4), (2, 6), (3, 4), (3, 5), (3, 6)]
    seeds = [(7, 2),    # wrap seed on the ring
             (1, 5),    # corridor seed facing the wall
             (5, 5)]    # NOT walkable -> dropped
    sdf = spark.createDataFrame(seeds, "tile_x long, tile_y long")
    wdf = spark.createDataFrame(walk, "tile_x long, tile_y long")
    got = {(r.tile_x, r.tile_y): r.dist
           for r in T.grid_geodesic(sdf, wdf, zoom=3, max_d=4).collect()}
    want = _brute_grid_bfs(seeds, walk, n, 4)
    assert got == want
    assert got[(0, 2)] == 1            # wrapped across x = 0
    assert got[(3, 5)] == 4            # around the wall: 4, not |dx| = 2
    assert (5, 5) not in got           # dropped seed
    assert all(d <= 4 for d in got.values())


def test_grid_geodesic_early_exit_and_zero_horizon(spark):
    """An isolated component drains the frontier before max_d (early
    exit must still return everything reached); max_d=0 returns only
    the walkable seeds."""
    from zellige_spark.operators import tiles as T

    walk = [(0, 0), (0, 1), (5, 5)]
    sdf = spark.createDataFrame([(0, 0)], "tile_x long, tile_y long")
    wdf = spark.createDataFrame(walk, "tile_x long, tile_y long")
    got = {(r.tile_x, r.tile_y): r.dist
           for r in T.grid_geodesic(sdf, wdf, zoom=3, max_d=50).collect()}
    assert got == {(0, 0): 0, (0, 1): 1}
    got0 = {(r.tile_x, r.tile_y): r.dist
            for r in T.grid_geodesic(sdf, wdf, zoom=3, max_d=0).collect()}
    assert got0 == {(0, 0): 0}
    with pytest.raises(ValueError):
        T.grid_geodesic(sdf, wdf, zoom=3, max_d=-1)


def test_hausdorff_join_rejects_bad_params(spark):
    from zellige_spark.operators import trajectories as TRJ

    df = spark.createDataFrame([(1, 0, 0)], "ent long, x long, y long")
    with pytest.raises(ValueError):
        TRJ.hausdorff_join(df, tau=0)
    with pytest.raises(ValueError):
        TRJ.hausdorff_join(df, tau=10, cell=-5)


def test_medoid_matches_bruteforce_pairwise(spark):
    """The linear sum-of-squares decomposition picks the SAME member
    as the literal pairwise-cost argmin, with the same total cost and
    the smallest-id tie-break, across groups of size 1..n."""
    from zellige_spark.operators import similarity as SIM

    rng = np.random.default_rng(91)
    rows, want = [], {}
    for grp in range(6):
        k = [1, 2, 3, 5, 17, 40][grp]
        vecs = rng.integers(-127, 128, size=(k, 8))
        if grp == 2:
            vecs[1] = vecs[0]            # duplicate -> cost tie
        ids = [grp * 1000 + i for i in range(k)]
        for vid, v in zip(ids, vecs):
            rows.append((grp, vid, [int(x) for x in v]))
        d2 = ((vecs[:, None, :].astype(np.int64)
               - vecs[None, :, :]) ** 2).sum(axis=2)
        cost = d2.sum(axis=1)
        best = int(np.lexsort((ids, cost))[0])
        want[grp] = (k, ids[best], int(cost[best]))

    df = spark.createDataFrame(rows, "g long, vec_id long, qvec array<int>")
    out = SIM.medoid_per_group(df, ["g"])
    got = {r.g: (r.k, r.medoid_id, r.medoid_cost) for r in out.collect()}
    assert got == want


def test_medoid_tie_breaks_to_smallest_id(spark):
    """Two identical vectors in a 2-group: equal costs, smaller id wins."""
    from zellige_spark.operators import similarity as SIM

    df = spark.createDataFrame(
        [(0, 7, [1, 2]), (0, 3, [1, 2])],
        "g long, vec_id long, qvec array<int>")
    r = SIM.medoid_per_group(df, ["g"]).collect()[0]
    assert (r.k, r.medoid_id, r.medoid_cost) == (2, 3, 0)


def _brute_quadtree(fine_counts, cap, max_zoom):
    """Literal recursive split over fine-cell counts {(fx,fy): c}."""
    def count_in(z, x, y):
        s = max_zoom - z
        return sum(c for (fx, fy), c in fine_counts.items()
                   if fx >> s == x and fy >> s == y)
    leaves = []
    def rec(z, x, y):
        c = count_in(z, x, y)
        if c == 0:
            return
        if c <= cap or z == max_zoom:
            leaves.append((z, x, y, c))
            return
        for dx in (0, 1):
            for dy in (0, 1):
                rec(z + 1, 2 * x + dx, 2 * y + dy)
    rec(0, 0, 0)
    return sorted(leaves)


def test_quadtree_split_matches_recursive_bruteforce(spark):
    """Closed-form leaf selection (parent-count monotonicity) equals
    the LITERAL recursive split; leaves cover every point exactly once
    (quadtree_assign hits each point once); no non-max leaf exceeds
    the cap."""
    from zellige_spark.operators import tiles as T
    from pyspark.sql import functions as F

    rng = np.random.default_rng(23)
    hot = rng.uniform([-0.5, -0.5], [0.5, 0.5], size=(400, 2))
    bg = rng.uniform([-170.0, -80.0], [170.0, 80.0], size=(250, 2))
    pts = np.vstack([hot, bg])
    df = spark.createDataFrame(
        [(i, float(lo), float(la)) for i, (lo, la) in enumerate(pts)],
        "pid long, lon double, lat double")
    CAP, MZ = 30, 7
    leaves = T.quadtree_split(df, cap=CAP, max_zoom=MZ)
    got = sorted((r.zoom, r.tile_x, r.tile_y, r.n_points)
                 for r in leaves.collect())

    fine = (T.with_web_mercator(df).select(
        *T.tile_xy(F.col("x3857"), F.col("y3857"), F.lit(MZ))).collect())
    counts = {}
    for fx, fy in fine:
        counts[(fx, fy)] = counts.get((fx, fy), 0) + 1
    assert got == _brute_quadtree(counts, CAP, MZ)

    assert sum(n for _, _, _, n in got) == len(pts)
    assert all(n <= CAP for z, _, _, n in got if z < MZ)

    asn = T.quadtree_assign(df, leaves, MZ)
    assert asn.count() == len(pts)
    assert asn.select("pid").distinct().count() == len(pts)


def test_quadtree_split_degenerates(spark):
    """Single-cell pile-up stays one over-cap leaf at max_zoom; a
    corpus under the cap is one z0 leaf; bad params raise."""
    from zellige_spark.operators import tiles as T

    pile = spark.createDataFrame([(i, 10.0001, 20.0001) for i in range(50)],
                                 "pid long, lon double, lat double")
    rows = T.quadtree_split(pile, cap=5, max_zoom=6).collect()
    assert len(rows) == 1 and rows[0].zoom == 6 and rows[0].n_points == 50

    tiny = spark.createDataFrame([(1, 0.0, 0.0), (2, 100.0, -40.0)],
                                 "pid long, lon double, lat double")
    rows = T.quadtree_split(tiny, cap=5, max_zoom=6).collect()
    assert [(r.zoom, r.tile_x, r.tile_y, r.n_points)
            for r in rows] == [(0, 0, 0, 2)]

    with pytest.raises(ValueError):
        T.quadtree_split(tiny, cap=0, max_zoom=6)
    with pytest.raises(ValueError):
        T.quadtree_split(tiny, cap=5, max_zoom=28)
