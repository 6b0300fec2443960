"""Round-5 analytics additions vs independent Python brute
recomputes: Mann-Kendall per-tile trend, the Markov tile-transition
matrix, bigram collocation lift, the Knox space-time test, and the
phash threshold-calibration sweep."""

from __future__ import annotations

import datetime

SF = "/root/testdata/sf0.001"


def test_mann_kendall_matches_bruteforce(spark):
    """S, the tie-corrected variance bracket, and the continuity-
    corrected z all equal the textbook recompute per tile."""
    import math

    import zellige_spark.queries as Q

    out = {(r.tile_x, r.tile_y): r
           for r in Q.q_mann_kendall(spark, SF).collect()}
    assert out, "no tiles"
    pts = Q._customer_points(spark, SF)
    tiled = Q.T.assign_tiles(pts, [Q.TREND_ZOOM]).select(
        "c_custkey", "tile_x", "tile_y")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    rows = (orders.join(tiled, orders.o_custkey == tiled.c_custkey)
            .selectExpr("tile_x", "tile_y",
                        "year(o_orderdate) * 12 + month(o_orderdate) AS m")
            .collect())
    cells = {}
    for r in rows:
        cells.setdefault((r.tile_x, r.tile_y), {}).setdefault(r.m, 0)
        cells[(r.tile_x, r.tile_y)][r.m] += 1
    assert set(cells) == set(out)
    saw_pos = saw_neg = False
    for k, months in cells.items():
        ms = sorted(months)
        ys = [months[m] for m in ms]
        n = len(ys)
        s = sum((yj > yi) - (yj < yi)
                for i, yi in enumerate(ys) for yj in ys[i + 1:])
        tie = {}
        for y in ys:
            tie[y] = tie.get(y, 0) + 1
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in tie.values())
        var_num = n * (n - 1) * (2 * n + 5) - tie_term
        r = out[k]
        assert (r.n_months, r.s_stat, r.var_num, r.var_den) == (
            n, s, var_num, 18)
        if var_num <= 0 or s == 0:
            assert r.z_mk == 0.0
        else:
            corr = s - 1 if s > 0 else s + 1
            assert r.z_mk == corr / math.sqrt(var_num / 18.0)
        saw_pos |= r.z_mk > 0
        saw_neg |= r.z_mk < 0
    assert saw_pos and saw_neg  # real data shows both trend signs


def test_mann_kendall_degenerates(spark, tmp_path):
    """One active month -> var_num 0, z 0; two equal months -> all
    ties, S = 0 and var_num 0 (the tie term swallows the bracket)."""
    import zellige_spark.queries as Q

    cust = spark.read.parquet(f"{SF}/customer.parquet").limit(1)
    sf = str(tmp_path)
    cust.coalesce(1).write.mode("overwrite").parquet(f"{sf}/customer.parquet")
    key = cust.collect()[0].c_custkey
    orders = spark.createDataFrame(
        [(1, key, datetime.date(2024, 3, 5)),
         (2, key, datetime.date(2024, 4, 5))],
        "o_orderkey long, o_custkey long, o_orderdate date")
    orders.coalesce(1).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    rows = Q.q_mann_kendall(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    # two months, one order each: tied pair -> S=0; n=2 bracket 18,
    # tie group t=2 contributes 2*1*9=18 -> var_num 0
    assert (r.n_months, r.s_stat, r.var_num, r.z_mk) == (2, 0, 0, 0.0)


def test_tile_transitions_handcrafted(spark):
    """Two users walking known z1-cell sequences produce exactly the
    expected counts, probabilities, and next-cell ranks (self loop
    kept; rank ties broken by (to_x, to_y))."""
    from zellige_spark.operators import flows as FLW

    # lon centers of z1 cells: west ~ -90 (cx=0), east ~ +90 (cx=1)
    rows = []
    seq_a = [(-90, 0), (90, 0), (-90, 0), (-90, 0)]   # 0->1,1->0,0->0
    seq_b = [(90, 0), (-90, 0)]                       # 1->0
    for i, (lon, lat) in enumerate(seq_a):
        rows.append((1, i, datetime.datetime(2024, 1, 1, 0, i),
                     float(lon), float(lat)))
    for i, (lon, lat) in enumerate(seq_b):
        rows.append((2, i, datetime.datetime(2024, 1, 1, 0, i),
                     float(lon), float(lat)))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, lon double,"
              " lat double")
    out = {(r.from_x, r.from_y, r.to_x, r.to_y): r
           for r in FLW.tile_transitions(df, 1).collect()}
    # y cell at lat=0 for z1 is 0 (upper half) boundary: compute from keys
    ys = {k[1] for k in out}
    assert len(ys) == 1
    y = ys.pop()
    a = out[(0, y, 1, y)]
    assert (a.n_trans, a.n_from) == (1, 2)
    assert a.p == 0.5
    b = out[(0, y, 0, y)]
    assert (b.n_trans, b.n_from, b.p) == (1, 2, 0.5)
    # tie on n_trans within origin 0: rank 1 goes to the lower to_x
    assert b.rank == 1 and a.rank == 2
    c = out[(1, y, 0, y)]
    assert (c.n_trans, c.n_from, c.p, c.rank) == (2, 2, 1.0, 1)
    assert sum(1 for _ in out) == 3


def test_tile_transitions_single_entity_exchange(spark):
    """The raw events feed exactly one entity-keyed window Exchange;
    the rank/total windows run on the grid-bounded transition matrix
    (partition key from_x/from_y, not the raw entity)."""
    import zellige_spark.queries as Q

    df = Q.q_tile_transitions(spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert plan.count("hashpartitioning(ent") <= 2  # lead window + agg
    assert "CartesianProduct" not in plan
    # probabilities sum to 1 per origin
    rows = df.collect()
    from collections import defaultdict
    tot = defaultdict(float)
    cnt = defaultdict(int)
    nfrom = {}
    for r in rows:
        tot[(r.from_x, r.from_y)] += r.n_trans
        cnt[(r.from_x, r.from_y)] += 1
        nfrom[(r.from_x, r.from_y)] = r.n_from
    for k in tot:
        assert tot[k] == nfrom[k]
    # ranks are 1..k per origin
    ranks = defaultdict(set)
    for r in rows:
        ranks[(r.from_x, r.from_y)].add(r.rank)
    for k, s in ranks.items():
        assert s == set(range(1, cnt[k] + 1))


def test_bigram_lift_handcrafted(spark, tmp_path):
    """Known corpus: exact marginals, the >=BIGRAM_MIN floor, the
    repeated-token self-bigram, and the lift fraction itself."""
    from zellige_spark.operators import text as TXT

    docs = ([(i, "x y") for i in range(5)]
            + [(100 + i, "p q") for i in range(5)]
            + [(200 + i, "x q") for i in range(3)]
            + [(300 + i, "a a a") for i in range(3)]
            + [(400, ""), (401, "solo")])
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sf = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {(r.lhs, r.rhs): r
           for r in TXT.q_bigram_lift(spark, sf).collect()}
    # (x,q) seen 3 < 5 is floored out; empty/1-token docs contribute 0
    assert set(out) == {("x", "y"), ("p", "q"), ("a", "a")}
    n = 5 + 5 + 3 + 6  # total bigram instances incl. floored ones
    xy = out[("x", "y")]
    assert (xy.c_xy, xy.c_left, xy.c_right, xy.n_bigrams) == (5, 8, 5, n)
    assert (xy.lift_num, xy.lift_den) == (5 * n, 8 * 5)
    assert xy.lift == (5 * n) / (8 * 5)
    aa = out[("a", "a")]
    assert (aa.c_xy, aa.c_left, aa.c_right) == (6, 6, 6)
    assert aa.lift == (6 * n) / 36
    pq = out[("p", "q")]
    assert (pq.c_xy, pq.c_left, pq.c_right) == (5, 5, 8)


def test_knox_matches_bruteforce_and_detects_interaction(spark):
    """Knox counts equal the literal O(n^2) recompute on a random
    cloud, and a constructed space-time cluster pushes the ratio
    above 1 while a time-shuffled twin stays near 1."""
    import numpy as np

    from zellige_spark.operators import colocation as CL

    rng = np.random.default_rng(23)
    n = 300
    xs = rng.integers(0, 360000, n)
    ys = rng.integers(0, 170000, n)
    ts = rng.integers(0, 2_000_000, n)
    # inject a tight space-time cluster
    xs[:20] = 50000 + rng.integers(0, 500, 20)
    ys[:20] = 60000 + rng.integers(0, 500, 20)
    ts[:20] = 900000 + rng.integers(0, 1000, 20)
    df = spark.createDataFrame(
        [(i, int(xs[i]), int(ys[i]), int(ts[i])) for i in range(n)],
        "id long, x long, y long, es long")
    ds, dt = 2000, 5000
    row = CL.knox_test(df, ds, dt).collect()[0]
    n_space = n_time = n_both = 0
    for i in range(n):
        for j in range(i + 1, n):
            d2 = (int(xs[i]) - int(xs[j])) ** 2 \
                + (int(ys[i]) - int(ys[j])) ** 2
            tdt = abs(int(ts[i]) - int(ts[j]))
            sp = d2 <= ds * ds
            tm = tdt <= dt
            n_space += sp
            n_time += tm
            n_both += sp and tm
    npairs = n * (n - 1) // 2
    assert (row.n, row.n_pairs) == (n, npairs)
    assert (row.n_space, row.n_time, row.n_both) == (
        n_space, n_time, n_both)
    assert row.ex_num == n_space * n_time and row.ex_den == npairs
    assert row.knox_num == n_both * npairs
    assert row.knox_ratio == (n_both * npairs) / (n_space * n_time)
    assert row.knox_ratio > 2  # the injected cluster interacts


def test_phash_threshold_sweep_matches_bruteforce(spark):
    """Every rung's pair and image counts equal the literal O(n^2)
    Hamming recompute (exact by pigeonhole: max rung < band count);
    the ladder is monotone; too-wide ladders are rejected."""
    import numpy as np
    import pytest

    from zellige_spark.operators import images as IM

    rng = np.random.default_rng(31)
    n = 120
    ph = rng.integers(0, 1 << 63, n, dtype=np.int64)
    ph[1] = ph[0] ^ 1                      # ham 1
    ph[3] = ph[2] ^ (1 << 20) ^ (1 << 40)  # ham 2
    ph[5] = ph[4] ^ 0b1111111              # ham 7 (ladder top)
    df = spark.createDataFrame(
        [(i, int(ph[i])) for i in range(n)], "image_id long, phash long")
    rows = IM.phash_threshold_sweep(df).collect()
    want_pairs = {r: 0 for r in IM.SWEEP_LADDER}
    minh = {}
    for i in range(n):
        for j in range(i + 1, n):
            h = bin(int(ph[i]) ^ int(ph[j]) & ((1 << 64) - 1)).count("1")
            for r in IM.SWEEP_LADDER:
                if h <= r:
                    want_pairs[r] += 1
            if h <= 7:
                minh[i] = min(minh.get(i, 64), h)
                minh[j] = min(minh.get(j, 64), h)
    assert [r.h for r in rows] == sorted(IM.SWEEP_LADDER)
    prev_p = prev_i = -1
    for r in rows:
        assert r.n_pairs == want_pairs[r.h]
        assert r.n_total == n
        assert r.n_pairs >= prev_p and r.n_images >= prev_i
        prev_p, prev_i = r.n_pairs, r.n_images
    by_h = {r.h: r for r in rows}
    assert by_h[0].n_pairs == 0 or by_h[0].n_pairs == want_pairs[0]
    assert by_h[1].n_pairs >= 1 and by_h[2].n_pairs >= 2
    assert by_h[7].n_pairs >= 3
    assert by_h[7].n_images == len(minh)
    assert by_h[7].share == len(minh) / n
    with pytest.raises(ValueError):
        IM.phash_threshold_sweep(df, ladder=(0, 8), bands=8)


def test_co_travel_matches_bruteforce_and_plan_has_no_cartesian(spark):
    """Co-travel pair support equals the literal per-pair distinct
    shared-bucket recompute; the candidate stage is an equi-join on
    the spatiotemporal cell key (no cartesian / nested-loop anywhere);
    a pair sharing several CELLS inside one bucket still counts that
    bucket once."""
    import numpy as np

    from zellige_spark.operators import flows as FLW

    rng = np.random.default_rng(41)
    n, users = 400, 12
    ent = rng.integers(0, users, n)
    xs = rng.integers(0, 8000, n)
    ys = rng.integers(0, 6000, n)
    es = rng.integers(0, 50000, n)
    # users 0 and 1 travel together: mirrored pings in 5 buckets,
    # two of them in TWO different cells of the same bucket
    rows = [(int(ent[i]), int(xs[i]), int(ys[i]), int(es[i]))
            for i in range(n)]
    for k in range(5):
        rows.append((0, 100 + 2000 * k, 100, 10000 * k + 5))
        rows.append((1, 110 + 2000 * k, 105, 10000 * k + 9))
    rows.append((0, 5100, 5100, 25))   # same bucket 0, another cell
    rows.append((1, 5105, 5108, 35))
    df = spark.createDataFrame(rows, "user long, x long, y long, es long")
    cell, bucket, mn = 1000, 10000, 2
    got = {(r.user_a, r.user_b):
           (r.n_cobuckets, r.first_bucket, r.last_bucket)
           for r in FLW.co_travel(df, cell, bucket, mn).collect()}

    occ = {}
    for u, x, y, t in rows:
        occ.setdefault(u, set()).add((x // cell, y // cell, t // bucket))
    want = {}
    for a in range(users):
        for b in range(a + 1, users):
            if a not in occ or b not in occ:
                continue
            cells_a, cells_b = occ[a], occ[b]
            shared = {c[2] for c in cells_a
                      if c in cells_b}
            # distinct buckets where ANY cell is shared
            shared = {bk for (cx, cy, bk) in cells_a
                      if (cx, cy, bk) in cells_b}
            if len(shared) >= mn:
                want[(a, b)] = (len(shared), min(shared), max(shared))
    assert got == want
    assert got[(0, 1)][0] >= 5  # the injected convoy survives

    plan = FLW.co_travel(df, cell, bucket, mn)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_theil_sen_matches_bruteforce(spark):
    """The selected median pairwise slope per tile equals the
    fraction-exact Python recompute: sort pairs by the exact rational
    dy/dx (via Fraction), tie-break (dy, dx, m_i), take the lower
    median — and the emitted double is the IEEE division of that
    pair's exact integers."""
    from fractions import Fraction

    import zellige_spark.queries as Q

    out = {(r.tile_x, r.tile_y): r
           for r in Q.q_theil_sen(spark, SF).collect()}
    assert out, "no tiles"
    pts = Q._customer_points(spark, SF)
    tiled = Q.T.assign_tiles(pts, [Q.TREND_ZOOM]).select(
        "c_custkey", "tile_x", "tile_y")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    rows = (orders.join(tiled, orders.o_custkey == tiled.c_custkey)
            .selectExpr("tile_x", "tile_y",
                        "year(o_orderdate) * 12 + month(o_orderdate) AS m")
            .collect())
    cells = {}
    for r in rows:
        cells.setdefault((r.tile_x, r.tile_y), {}).setdefault(r.m, 0)
        cells[(r.tile_x, r.tile_y)][r.m] += 1
    # tiles with >= 2 active months have >= 1 pair and appear
    want_tiles = {k for k, months in cells.items() if len(months) >= 2}
    assert set(out) == want_tiles
    for k, months in cells.items():
        if len(months) < 2:
            continue
        ms = sorted(months)
        pairs = []
        for i, mi in enumerate(ms):
            for mj in ms[i + 1:]:
                dy = months[mj] - months[mi]
                dx = mj - mi
                pairs.append((Fraction(dy, dx), dy, dx, mi))
        pairs.sort()
        med = pairs[(len(pairs) + 1) // 2 - 1]
        r = out[k]
        assert (r.n_pairs, r.slope_num, r.slope_den) == (
            len(pairs), med[1], med[2])
        assert r.sen_slope == med[1] / med[2]
