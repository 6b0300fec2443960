"""Round-7 operator tests: exact DBSCAN and the leak-free
dedup-aware train/val/test split."""

import numpy as np


def _brute_dbscan(xy, eps, min_pts):
    """Reference DBSCAN: numpy all-pairs + union-find over core-core
    edges; border -> min core neighbor's cluster; noise -> -1.
    Returns (n_nbr, role, cluster) per point, matching the operator's
    deterministic tie rules."""
    n = len(xy)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    nbr = (d2 <= eps * eps) & ~np.eye(n, dtype=bool)
    n_nbr = nbr.sum(1)
    core = n_nbr + 1 >= min_pts

    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and nbr[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    cluster = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        if core[i]:
            cluster[i] = find(i)
    role = np.zeros(n, dtype=np.int64)
    role[core] = 2
    for i in range(n):
        if core[i]:
            continue
        cand = [cluster[j] for j in range(n) if core[j] and nbr[i, j]]
        if cand:
            role[i] = 1
            cluster[i] = min(cand)
    return n_nbr, role, cluster


def test_dbscan_matches_bruteforce(spark):
    """Grid-blocked DBSCAN equals the literal all-pairs reference on a
    random integer point set sized so all three roles appear, and the
    plan never falls back to a cartesian join."""
    from zellige_spark.operators.dbscan import dbscan

    rng = np.random.default_rng(171)
    n, eps, min_pts = 400, 9, 5
    xy = rng.integers(0, 160, size=(n, 2)).astype(np.int64)
    pts = spark.createDataFrame(
        [(i, int(xy[i, 0]), int(xy[i, 1])) for i in range(n)],
        "point_id long, x long, y long")
    out = dbscan(pts, eps, min_pts)
    got = {r.point_id: (r.n_nbr, r.role, r.cluster) for r in out.collect()}

    n_nbr, role, cluster = _brute_dbscan(xy, eps, min_pts)
    want = {i: (int(n_nbr[i]), int(role[i]), int(cluster[i]))
            for i in range(n)}
    assert got == want
    assert set(role) == {0, 1, 2}, "test setup must exercise all roles"

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_eps_pairs_each_pair_exactly_once(spark):
    """The 3x3-cell blocking emits every qualifying ORDERED pair
    exactly once — no .distinct() needed (the operator relies on it)."""
    from zellige_spark.operators.dbscan import eps_pairs

    rng = np.random.default_rng(29)
    n, eps = 300, 11
    xy = rng.integers(0, 120, size=(n, 2)).astype(np.int64)
    pts = spark.createDataFrame(
        [(i, int(xy[i, 0]), int(xy[i, 1])) for i in range(n)],
        "point_id long, x long, y long")
    got = [(r.ia, r.ib) for r in eps_pairs(pts, eps).collect()]
    assert len(got) == len(set(got)), "a pair was emitted twice"
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    want = {(i, j) for i in range(n) for j in range(n)
            if i != j and d2[i, j] <= eps * eps}
    assert set(got) == want and len(got) == len(want)


def test_leakfree_split_never_straddles_components(spark):
    """Every near-dup component lands in ONE split; doc coverage is
    total; singletons follow the same hash rule (so the operator
    degrades to plain hash splitting when there are no duplicates)."""
    import pyspark.sql.functions as F

    from zellige_spark.operators.splits import leakfree_split

    n = 2000
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    # chain clusters of size 4 over the first 800 ids: (0,1,2,3), ...
    pairs = (spark.range(800)
             .filter("id % 4 < 3")
             .select(F.col("id").alias("doc_a"),
                     (F.col("id") + 1).alias("doc_b")))
    out = leakfree_split(docs, pairs).cache()
    assert out.count() == n

    # leak check: one split per component
    leaky = (out.groupBy("component")
             .agg(F.countDistinct("split").alias("k"))
             .filter("k > 1"))
    assert leaky.isEmpty()

    # members of a cluster share the split AND the canonical id
    first = {r.doc_id: (r.component, r.split) for r in out.collect()}
    for base in range(0, 800, 4):
        vals = {first[base + o] for o in range(4)}
        assert len(vals) == 1
        assert vals.pop()[0] == base

    # split fractions of the per-mille thresholds (hash is uniform:
    # 1200 singleton components + 200 clusters; allow +-6% absolute)
    frac = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert 0.74 <= frac["train"] / n <= 0.86
    assert set(frac) == {"train", "val", "test"}


def test_leakfree_split_pairs_share_split_end_to_end(spark):
    """End-to-end on the augmented corpus at sf0.001: every MinHash
    near-dup pair has both members in the same split."""
    import pyspark.sql.functions as F

    from zellige_spark.operators.dedup import q_dedup_minhash_words
    from zellige_spark.operators.splits import q_split_leakfree

    sf = "/root/testdata/sf0.001"
    split = q_split_leakfree(spark, sf).select("doc_id", "split")
    pairs = q_dedup_minhash_words(spark, sf)
    assert not pairs.isEmpty(), "corpus must contain near-dup pairs"
    joined = (pairs
              .join(split.withColumnRenamed("doc_id", "doc_a")
                         .withColumnRenamed("split", "split_a"), "doc_a")
              .join(split.withColumnRenamed("doc_id", "doc_b")
                         .withColumnRenamed("split", "split_b"), "doc_b"))
    assert joined.filter(F.col("split_a") != F.col("split_b")).isEmpty()


def test_fps_exemplars_match_bruteforce(spark):
    """Greedy k-center picks equal the literal reference (seed = min
    id, then argmax of min squared distance to the chosen set, ties
    to the smallest id), including the exact dist2 trajectory; an
    all-duplicates group stops early instead of re-picking."""
    import pyspark.sql.functions as F

    from zellige_spark.operators.similarity import fps_per_group

    rng = np.random.default_rng(88)
    rows = []
    vecs = {}
    for grp in range(5):
        for i in range(30):
            vid = grp * 100 + i
            v = rng.integers(-50, 50, size=8).astype(np.int64)
            rows.append((grp, vid, [int(x) for x in v]))
            vecs[vid] = v
    # group 9: every member identical -> only the seed is pickable
    for i in range(6):
        vid = 900 + i
        v = np.full(8, 7, dtype=np.int64)
        rows.append((9, vid, [int(x) for x in v]))
        vecs[vid] = v
    df = spark.createDataFrame(rows, "grp long, vec_id long, qvec array<int>")
    out = fps_per_group(df, ["grp"], k=3)
    got = sorted((r.grp, r.pick, r.exemplar_id, r.dist2)
                 for r in out.collect())

    want = []
    by_grp = {}
    for grp, vid, _ in rows:
        by_grp.setdefault(grp, []).append(vid)
    for grp, ids in by_grp.items():
        ids = sorted(ids)
        chosen = [ids[0]]
        want.append((grp, 1, ids[0], 0))
        for pick in (2, 3):
            best = None
            for vid in ids:
                dmin = min(int(((vecs[vid] - vecs[c]) ** 2).sum())
                           for c in chosen)
                if dmin > 0 and (best is None or dmin > best[0]
                                 or (dmin == best[0] and vid < best[1])):
                    best = (dmin, vid)
            if best is None:
                break
            chosen.append(best[1])
            want.append((grp, pick, best[1], best[0]))
    assert got == sorted((g, p, e, d) for g, p, e, d in want)
    # the all-duplicate group emitted exactly one row
    assert sum(1 for g, _, _, _ in got if g == 9) == 1


# --- emerging hot spot analysis ---------------------------------------------

def _ref_emerging(counts, grid):
    """Literal reference: per-slice Gi* (exact rational 1.96 test),
    per-cell Mann-Kendall over the floor(l*1e6/s) share series, and
    the category CASE — plain Python ints throughout."""
    from collections import Counter

    months = sorted({m for m, _, _ in counts})
    N = grid * grid
    sl = {}
    for m in months:
        arr = np.zeros((grid, grid), dtype=np.int64)
        for (mm, cx, cy), v in counts.items():
            if mm == m:
                arr[cx, cy] = v
        S = int(arr.sum())
        SQ = int((arr * arr).sum())
        for cx in range(grid):
            for cy in range(grid):
                w = l = 0
                for dx in (-1, 0, 1):
                    for dy in (-1, 0, 1):
                        nx = (cx + dx) % grid
                        ny = cy + dy
                        if 0 <= ny < grid:
                            w += 1
                            l += int(arr[nx, ny])
                ni = N * l - w * S
                gi2n = ni * ni * (N - 1)
                gi2d = (N * SQ - S * S) * (N * w - w * w)
                hot = int(ni > 0 and 10000 * gi2n > 38416 * gi2d)
                sl.setdefault((cx, cy), []).append((m, hot, l * 1000000 // S))
    out = {}
    for cell, seq in sl.items():
        seq.sort()
        shares = [s for _, _, s in seq]
        n = len(seq)
        s_stat = sum(int(np.sign(shares[j] - shares[i]))
                     for i in range(n) for j in range(i + 1, n))
        tie_term = sum(t * (t - 1) * (2 * t + 5)
                       for t in Counter(shares).values())
        var_num = n * (n - 1) * (2 * n + 5) - tie_term
        n_hot = sum(h for _, h, _ in seq)
        hot_now = seq[-1][1]
        a = abs(s_stat)
        sig = (var_num > 0 and a > 0
               and 180000 * (a - 1) * (a - 1) > 38416 * var_num)
        trend = (1 if s_stat > 0 else -1) if sig else 0
        if hot_now == 1 and n_hot == 1:
            cat = "new"
        elif hot_now == 1 and trend == 1:
            cat = "intensifying"
        elif hot_now == 1 and trend == -1:
            cat = "diminishing"
        elif hot_now == 1 and n_hot * 10 >= n * 9:
            cat = "persistent"
        elif hot_now == 1:
            cat = "sporadic"
        elif n_hot > 0:
            cat = "formerly"
        else:
            cat = "none"
        out[cell] = (n, n_hot, hot_now, s_stat, var_num, trend, cat)
    return out


def _emerging_cube(grid=10, months=12):
    """Space-time cube exercising every category: a rising block
    (intensifying), a still-hot falling block (diminishing), a flat
    block (persistent), a final-month spike (new), an alternating
    block (sporadic), a block that cools off (formerly), and a
    parity wiggle cell that keeps flat cells' share series
    non-monotone."""
    A = [(3, 0), (3, 1), (4, 0), (4, 1)]   # rising 10 -> 43
    B = [(0, 0), (0, 1), (1, 0), (1, 1)]   # falling 76 -> 43
    P = [(6, 6), (6, 7), (7, 6), (7, 7)]   # flat 40
    D = [(0, 8), (0, 9), (1, 8), (1, 9)]   # month-12 spike 60
    G = [(6, 1), (6, 2), (7, 1), (7, 2)]   # alternating 50/2
    counts = {}
    for m in range(1, months + 1):
        for cx in range(grid):
            for cy in range(grid):
                counts[(m, cx, cy)] = 2
        counts[(m, 8, 4)] = 2 + (m % 2)
        for c in A:
            counts[(m,) + c] = 10 + 3 * (m - 1)
        for c in B:
            counts[(m,) + c] = 76 - 3 * (m - 1)
        for c in P:
            counts[(m,) + c] = 40
        for c in G:
            counts[(m,) + c] = 50 if m % 2 == 0 else 2
        if m == months:
            for c in D:
                counts[(m,) + c] = 60
    return counts


def test_emerging_hotspots_matches_reference(spark):
    """The Spark space-time composite equals the literal reference on
    a cube designed so every one of the seven categories appears."""
    from zellige_spark.operators.emerging import emerging_hotspots

    grid = 10
    counts = _emerging_cube(grid)
    cw, ch = 360000 // grid, 170000 // grid
    rows = []
    for (m, cx, cy), v in counts.items():
        rows.extend([(cx * cw + 5, cy * ch + 5, m)] * v)
    pts = spark.createDataFrame(rows, "x long, y long, m long")
    out = emerging_hotspots(pts, grid)
    got = {(r.cell_x, r.cell_y): (r.n_slices, r.n_hot, r.hot_now,
                                  r.s_stat, r.var_num, r.trend, r.category)
           for r in out.collect()}
    want = {(cx, cy): v for (cx, cy), v in _ref_emerging(counts, grid).items()}
    assert got == want
    cats = {v[-1] for v in got.values()}
    assert cats == {"new", "intensifying", "diminishing", "persistent",
                    "sporadic", "formerly", "none"}


def test_kde_heat_matches_bruteforce(spark):
    """Grid-blocked exact Epanechnikov KDE equals the literal
    all-pairs reference, including kernels reaching ACROSS the x
    wrap; the whole-ring radius guard raises."""
    import pytest

    from zellige_spark.operators.hotspots import kde_heat

    grid, xp, yp, radius = 8, 360000, 170000, 50000
    cw, ch = xp // grid, yp // grid
    rng = np.random.default_rng(314)
    xs = rng.integers(0, xp, 250)
    ys = rng.integers(0, yp, 250)
    # pin events on both sides of the antimeridian so wrap kernels fire
    xs[:10] = rng.integers(0, 2000, 10)
    xs[10:20] = rng.integers(xp - 2000, xp, 10)
    pts = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(xs, ys)], "x long, y long")
    out = kde_heat(pts, grid, radius)
    got = {(r.cell_x, r.cell_y): (r.kde_num, r.n_in) for r in out.collect()}

    r2d = (2 * radius) ** 2
    want = {}
    for cx in range(grid):
        for cy in range(grid):
            num = n_in = 0
            for x, y in zip(xs, ys):
                adx = abs(2 * int(x) - (2 * cx + 1) * cw)
                dx = min(adx, 2 * xp - adx)
                dy = abs(2 * int(y) - (2 * cy + 1) * ch)
                w = max(0, r2d - dx * dx - dy * dy)
                if w > 0:
                    num += w
                    n_in += 1
            want[(cx, cy)] = (num, n_in)
    assert got == want
    assert any(v[1] > 0 for v in want.values())

    with pytest.raises(ValueError):
        kde_heat(pts, grid, radius=10 * cw)


def test_caption_reconcile_majority_and_ties(spark):
    """Majority caption wins; a 2-vs-2 tie resolves to the
    lexicographically smaller caption; agreement is the exact
    per-mille floor; singletons pass through."""
    from zellige_spark.operators.images import caption_reconcile

    pa = 0                       # cluster A phash
    pb = (1 << 20) - 1           # 20 bits from A (> max_hamming)
    pc = ((1 << 8) - 1) << 45    # 8 bits from A, 28 from B
    rows = [
        # cluster of 4 (identical phash), 3-1 majority
        (10, pa, "cat"), (11, pa, "cat"),
        (12, pa, "cat"), (13, pa, "dog"),
        # cluster of 4, 2-2 tie -> 'apple' < 'pear'
        (20, pb, "pear"), (21, pb, "apple"),
        (22, pb, "pear"), (23, pb, "apple"),
        # singleton
        (30, pc, "solo"),
    ]
    images = spark.createDataFrame(
        rows, "image_id long, phash long, caption string")
    out = {r.cluster: (r.n_images, r.n_captions, r.canon_caption,
                       r.agree_millis)
           for r in caption_reconcile(images).collect()}
    assert out == {
        10: (4, 2, "cat", 750),
        20: (4, 2, "apple", 500),
        30: (1, 1, "solo", 1000),
    }


def test_knn_classify_majority_and_ties(spark, tmp_path):
    """kNN vote on a handcrafted corpus: clear majority, a 2-2-1 tie
    resolving to the smaller label, and correct/incorrect flags."""
    from zellige_spark.operators.similarity import q_knn_classify

    # 2 query vectors (id 0, 1) + neighbors placed by cosine on a
    # 2-d plane; K=5, N_QUERIES=20 (only ids < 20 become queries).
    def vec(theta):
        import math
        return [float(math.cos(theta)), float(math.sin(theta))]

    rows = []
    # query 0 at angle 0, label 7: nearest 5 = ids 100..104
    rows.append((0, vec(0.0), 7))
    for i, (ang, lab) in enumerate([(0.01, 3), (0.02, 3), (0.03, 3),
                                    (0.04, 5), (0.05, 5)]):
        rows.append((100 + i, vec(ang), lab))
    # query 1 at angle 2.0, label 5: nearest 5 = 2-2-1 tie -> label 2
    rows.append((1, vec(2.0), 5))
    for i, (ang, lab) in enumerate([(2.01, 9), (2.02, 9), (2.03, 2),
                                    (2.04, 2), (2.05, 5)]):
        rows.append((200 + i, vec(ang), lab))
    # far-away filler so nothing else gets near the queries
    for i in range(10):
        rows.append((300 + i, vec(4.0 + i * 0.01), 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    p = str(tmp_path / "embeddings.parquet")
    df.write.parquet(p)
    # q_knn_classify reads <dir>/embeddings.parquet
    out = {r.query_id: (r.pred_label, r.votes, r.true_label, r.correct)
           for r in q_knn_classify(spark, str(tmp_path)).collect()}
    assert out[0] == (3, 3, 7, 0)
    assert out[1] == (2, 2, 5, 0)


def test_areal_interp_matches_bruteforce_and_conserves(spark):
    """Sequence-explode blocking equals the literal zones x cells
    overlap; per-zone allocations conserve mass up to the documented
    floor quantization (each zone's pieces sum to within
    n_pieces ulps of total * 1e6); a zone inside ONE cell keeps its
    exact full total (the int64-overflow case the split floor
    exists for)."""
    import pyspark.sql.functions as F

    from zellige_spark.operators.areal import areal_interp

    grid, xp, yp = 8, 360000, 170000
    cw, ch = xp // grid, yp // grid
    rng = np.random.default_rng(99)
    rows = []
    for zid in range(40):
        x0 = int(rng.integers(0, xp - 70000))
        y0 = int(rng.integers(0, yp - 50000))
        w = int(rng.integers(1, 70000))
        h = int(rng.integers(1, 50000))
        rows.append((zid, x0, x0 + w, y0, y0 + h,
                     int(rng.integers(1, 100000))))
    # zone fully inside one cell, large area x large total
    rows.append((99, 10, cw - 10, 10, ch - 10, 99999))
    zones = spark.createDataFrame(
        rows, "zone_id long, x0 long, x1 long, y0 long, y1 long, total long")
    out = {(r.cell_x, r.cell_y): (r.n_zones, r.alloc_e6)
           for r in areal_interp(zones, grid).collect()}

    want = {}
    per_zone = {zid: 0 for zid, *_ in rows}
    pieces = {zid: 0 for zid, *_ in rows}
    for cx in range(grid):
        for cy in range(grid):
            nz = alloc = 0
            for zid, x0, x1, y0, y1, total in rows:
                ox = min(x1, (cx + 1) * cw) - max(x0, cx * cw)
                oy = min(y1, (cy + 1) * ch) - max(y0, cy * ch)
                if ox > 0 and oy > 0:
                    nz += 1
                    zarea = (x1 - x0) * (y1 - y0)
                    a = total * ox * oy
                    p = (a // zarea) * 1000000 + (a % zarea) * 1000000 // zarea
                    alloc += p
                    per_zone[zid] += p
                    pieces[zid] += 1
            want[(cx, cy)] = (nz, alloc)
    assert out == want
    for zid, x0, x1, y0, y1, total in rows:
        lo = total * 1000000 - pieces[zid]
        assert lo <= per_zone[zid] <= total * 1000000
    # the single-cell zone keeps its exact total
    assert per_zone[99] == 99999 * 1000000


def test_pagerank_fixed_matches_reference(spark):
    """The fixed-point PageRank equals a literal Python reference on
    a handcrafted graph (hub + chain + dangling node): same floors,
    same dangling self-loop patch, hub ranks highest."""
    from zellige_spark.operators.flows import (PR_D_DEN, PR_D_NUM,
                                               PR_SCALE, pagerank_fixed)

    # 0 -> hub(9), 1 -> 9, 2 -> 9, 9 -> 0, 3 -> 4 (4 dangling)
    raw = [(0, 9, 3), (1, 9, 1), (2, 9, 2), (9, 0, 1), (3, 4, 1)]
    edges = spark.createDataFrame(raw, "src long, dst long, cnt long")
    iters = 5
    got = {r.node: r.rank for r in pagerank_fixed(edges, iters).collect()}

    # literal reference with the identical integer floors
    e = dict(((s, d), c) for s, d, c in raw)
    nodes = sorted({s for s, _, _ in raw} | {d for _, d, _ in raw})
    srcs = {s for s, _, _ in raw}
    for v in nodes:
        if v not in srcs:
            e[(v, v)] = 1
    out = {}
    for (s, _), c in e.items():
        out[s] = out.get(s, 0) + c
    n = len(nodes)
    base = (PR_D_DEN - PR_D_NUM) * PR_SCALE // (PR_D_DEN * n)
    r = {v: PR_SCALE // n for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for (u, v), c in e.items():
            s[v] += r[u] * c // out[u]
        r = {v: base + PR_D_NUM * s[v] // PR_D_DEN for v in nodes}
    assert got == r
    assert max(got, key=got.get) == 9, "the hub must rank highest"


def test_aspect_buckets_argmin_ties_and_batches(spark):
    """Cross-multiplied bucket argmin matches a literal reference,
    an exact score tie resolves to the lower ladder index, and
    batches split in id order within a bucket."""
    from zellige_spark.operators.images import (ASPECT_LADDER,
                                                aspect_bucket_batches)

    rows = []
    # 68:60 scores exactly 8192 against BOTH rung 0 (1024,1024) and
    # rung 1 (1152,896) -> tie -> rung 0
    rows.append((1, 68, 60))
    # representative dims across the ladder
    dims = [(1024, 1024), (1300, 1000), (896, 1152), (1216, 832),
            (832, 1216), (1400, 790), (760, 1350), (1600, 660),
            (600, 1500)]
    for i, (w, h) in enumerate(dims):
        rows.append((10 + i, w, h))
    # one crowded bucket: 10 squares -> batch_size 4 -> batches 0,0,0,0,1,...
    for i in range(10):
        rows.append((100 + i, 512, 512))
    df = spark.createDataFrame(rows, "image_id long, w long, h long")
    out = {r.image_id: (r.bucket_idx, r.bucket_w, r.bucket_h, r.batch_idx)
           for r in aspect_bucket_batches(df, batch_size=4).collect()}

    def ref_bucket(w, h):
        scores = [(abs(w * bh - h * bw), i)
                  for i, (bw, bh) in enumerate(ASPECT_LADDER)]
        return min(scores)[1]

    assert out[1][0] == 0, "tie must resolve to the lower ladder index"
    for iid, w, h in rows:
        bi = ref_bucket(w, h)
        assert out[iid][0] == bi
        assert (out[iid][1], out[iid][2]) == ASPECT_LADDER[bi]
    # every ladder rung got at least one member across the dims set
    assert {out[10 + i][0] for i in range(len(dims))} == set(range(9))
    # the 10 squares + 1024x1024 + tie image share bucket 0: batches
    # of 4 in id order
    sq = sorted(iid for iid in out if out[iid][0] == 0)
    for rank, iid in enumerate(sq):
        assert out[iid][3] == rank // 4


def test_voronoi_assign_matches_bruteforce(spark):
    """Nearest-site assignment equals the literal argmin (wrap-aware
    doubled-coordinate distance, min-id ties) and catchments
    partition the grid."""
    from zellige_spark.operators.geocodes import voronoi_assign

    grid, xp, yp = 8, 360000, 170000
    cw, ch = xp // grid, yp // grid
    sites = [(0, 10000, 20000), (1, 350000, 30000),  # wrap neighbors
             (2, 180000, 85000), (3, 180000, 85000),  # exact tie -> 2
             (4, 90000, 150000)]
    sdf = spark.createDataFrame(sites, "site_id long, sx long, sy long")
    out = {(r.cell_x, r.cell_y): (r.site_id, r.d2_doubled,
                                  r.catchment_cells)
           for r in voronoi_assign(spark, sdf, grid).collect()}

    want = {}
    catch = {}
    for cx in range(grid):
        for cy in range(grid):
            best = None
            for sid, sx, sy in sites:
                adx = abs((2 * cx + 1) * cw - 2 * sx)
                dx = min(adx, 2 * xp - adx)
                dy = abs((2 * cy + 1) * ch - 2 * sy)
                d2 = dx * dx + dy * dy
                if best is None or (d2, sid) < best:
                    best = (d2, sid)
            want[(cx, cy)] = best
            catch[best[1]] = catch.get(best[1], 0) + 1
    for cell, (d2, sid) in want.items():
        assert out[cell][:2] == (sid, d2)
        assert out[cell][2] == catch[sid]
    assert sum(catch.values()) == grid * grid
    assert 3 not in catch, "tie site must lose to the smaller id"
    # site 1 must capture cells across the antimeridian wrap
    assert any(sid == 1 and cx == 0 for (cx, _), (_, sid) in want.items())


def test_tile_freshness_staircase_decay(spark, tmp_path):
    """The staircase decay halves the weight exactly at each
    half-life boundary, ages from the corpus max epoch (not wall
    clock), and sums are exact int64."""
    import datetime

    from zellige_spark.queries import (FRESH_HALF_S, FRESH_SCALE,
                                       q_tile_freshness)

    base = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

    def ts(age_s):
        return base + datetime.timedelta(seconds=1000000 - age_s)

    # event_ids chosen so each row lands in a known cell; ages span
    # 0, just-under-1, exactly-1, and 5 half-lives
    rows = [(1, ts(0), 1, "view", 0.0, ""),
            (2, ts(FRESH_HALF_S - 1), 1, "view", 0.0, ""),
            (3, ts(FRESH_HALF_S), 1, "view", 0.0, ""),
            (4, ts(5 * FRESH_HALF_S), 1, "view", 0.0, "")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    p = str(tmp_path)
    df.write.parquet(p + "/events.parquet")
    out = {(r.cell_x, r.cell_y): (r.freshness, r.n_events, r.last_es)
           for r in q_tile_freshness(spark, p).collect()}

    cw, ch = 360000 // 16, 170000 // 16
    want = {}
    now = max(int(ts(a).timestamp()) for a in
              (0, FRESH_HALF_S - 1, FRESH_HALF_S, 5 * FRESH_HALF_S))
    for eid, t, *_ in rows:
        cell = ((eid * 3571 % 360000) // cw,
                ((eid * 9973 + 7) % 170000) // ch)
        age = now - int(t.timestamp())
        wgt = FRESH_SCALE >> min(age // FRESH_HALF_S, 62)
        f, n, last = want.get(cell, (0, 0, 0))
        want[cell] = (f + wgt, n + 1, max(last, int(t.timestamp())))
    assert out == want
    # boundary semantics are visible in the reference weights: age 0
    # and age H-1 carry the FULL unit, age exactly H carries half,
    # age 5H carries 1/32
    ages = {1: 0, 2: FRESH_HALF_S - 1, 3: FRESH_HALF_S,
            4: 5 * FRESH_HALF_S}
    wgts = {eid: FRESH_SCALE >> (a // FRESH_HALF_S)
            for eid, a in ages.items()}
    assert wgts[1] == wgts[2] == FRESH_SCALE
    assert wgts[3] == FRESH_SCALE // 2 and wgts[4] == FRESH_SCALE // 32


def test_home_work_modal_cells_and_support_gate(spark, tmp_path):
    """Handcrafted pings: home = modal night cell with (count desc,
    cell asc) tie rule, work = modal midday cell, users under the
    support gate emit NULL anchors, hours outside both windows are
    ignored."""
    import datetime

    from zellige_spark.queries import q_home_work

    def row(eid, user, hh):
        ts = datetime.datetime(2024, 3, 1, hh, 30,
                               tzinfo=datetime.timezone.utc)
        return (eid, ts, user, "ping", 0.0, "")

    rows = []
    # user 1: 3 night pings in two cells (2 vs 1 via event ids with
    # known cells), 4 midday pings; user 2: only 2 night pings
    # (below HW_MIN_PINGS=3 -> home NULL), 3 midday; user 3: only
    # 08:00 pings (neither window) -> both NULL
    rows += [row(10, 1, 23), row(10, 1, 2), row(11, 1, 5)]
    rows += [row(12, 1, 11), row(12, 1, 12), row(12, 1, 13),
             row(13, 1, 15)]
    rows += [row(20, 2, 23), row(20, 2, 0)]
    rows += [row(21, 2, 10), row(21, 2, 11), row(22, 2, 12)]
    rows += [row(30, 3, 8), row(30, 3, 8), row(30, 3, 8)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.write.parquet(str(tmp_path) + "/events.parquet")
    out = {r.user_id: r.asDict() for r in
           q_home_work(spark, str(tmp_path)).collect()}

    g, cw, ch = 16, 360000 // 16, 170000 // 16

    def cell(eid):
        return ((eid * 3571 % 360000) // cw) * g \
            + ((eid * 9973 + 7) % 170000) // ch

    assert out[1]["home_cell"] == cell(10) and out[1]["home_n"] == 2
    assert out[1]["night_pings"] == 3
    assert out[1]["work_cell"] == cell(12) and out[1]["work_n"] == 3
    assert out[1]["day_pings"] == 4
    assert out[2]["home_cell"] is None and out[2]["night_pings"] == 0
    assert out[2]["work_cell"] == cell(21) and out[2]["work_n"] == 2
    assert out[2]["day_pings"] == 3
    assert out[3]["home_cell"] is None and out[3]["work_cell"] is None
    assert set(out) == {1, 2, 3}


def test_poi_discovery_invariants(spark):
    """The stay-point -> DBSCAN -> POI composition at sf0.001: every
    POI has >= 2 stays (a dense neighborhood), visitor counts never
    exceed stay counts, centroids sit inside the shifted coordinate
    box, and noise stays are excluded (total POI stays < total
    stays)."""
    from zellige_spark.queries import q_poi_discovery, q_stay_points

    sf = "/root/testdata/sf0.001"
    pois = q_poi_discovery(spark, sf).collect()
    assert len(pois) > 0
    n_stays_total = q_stay_points(spark, sf).count()
    assert sum(r.n_stays for r in pois) < n_stays_total, \
        "DBSCAN must leave some noise stays out"
    for r in pois:
        assert r.n_stays >= 2
        assert 1 <= r.n_users <= r.n_stays
        assert 0 <= r.cx <= 360_000_000 and 0 <= r.cy <= 170_000_000
        assert r.dwell_s > 0


def test_hrw_shards_minimal_movement_invariant(spark):
    """Rendezvous hashing's defining property: when shard 16 joins,
    keys either stay put or move TO shard 16 — never between old
    shards — and roughly 1/17 of keys move; old-shard load is
    roughly balanced."""
    from zellige_spark.queries import HRW_SHARDS, q_hrw_shards

    rows = q_hrw_shards(spark, "/root/testdata/sf0.01").collect()
    n = len(rows)
    assert n > 0
    moved = [r for r in rows if r.moved == 1]
    assert all(r.shard17 == HRW_SHARDS for r in moved), \
        "a key moved between OLD shards"
    assert all(r.shard16 == r.shard17 for r in rows if r.moved == 0)
    # expected ~1/17 ~ 5.9%; allow a wide band for n=500
    assert 0.01 <= len(moved) / n <= 0.15
    # balance: every old shard within 3x of uniform
    from collections import Counter

    load = Counter(r.shard16 for r in rows)
    assert set(load) == set(range(HRW_SHARDS))
    assert max(load.values()) <= 3 * (n // HRW_SHARDS)


def test_pareto_skyline_matches_bruteforce(spark):
    """Two-phase skyline equals the literal NOT-EXISTS reference on
    anti-correlated metrics (a large skyline), across partition
    boundaries, with duplicate metric vectors both kept."""
    from zellige_spark.operators.text import pareto_skyline

    rng = np.random.default_rng(23)
    rows = []
    for i in range(600):
        a = int(rng.integers(0, 1000))
        b = 1000 - a + int(rng.integers(-50, 50))   # anti-correlated
        c = int(rng.integers(0, 30))
        rows.append((i, a, b, c))
    rows.append((900, 1, 1100, 29))     # frontier corner
    rows.append((901, 1, 1100, 29))     # exact duplicate: both kept
    df = (spark.createDataFrame(rows, "doc_id long, m1 long, m2 long, m3 long")
          .repartition(7))
    got = sorted(r.doc_id for r in
                 pareto_skyline(df, ("m1", "m2", "m3")).collect())

    X = np.array([(a, b, c) for _, a, b, c in rows])
    ids = [i for i, *_ in rows]
    want = []
    for i in range(len(X)):
        dom = (X >= X[i]).all(1) & (X > X[i]).any(1)
        if not dom.any():
            want.append(ids[i])
    assert got == sorted(want)
    assert {900, 901} <= set(got), "duplicate optimal vectors both kept"
    assert len(got) > 10, "anti-correlated dims must give a wide skyline"


def test_idw_surface_matches_bruteforce(spark):
    """Halo-blocked IDW equals the literal all-pairs reference
    (integer weights incl. across the x wrap, exact num/den sums,
    one-IEEE-division estimate); the whole-ring radius guard
    raises."""
    import pytest

    from zellige_spark.operators.hotspots import IDW_SCALE, idw_surface

    grid, xp, yp, radius = 8, 360000, 170000, 50000
    cw, ch = xp // grid, yp // grid
    d0 = cw * ch
    rng = np.random.default_rng(271)
    xs = rng.integers(0, xp, 250)
    ys = rng.integers(0, yp, 250)
    vs = rng.integers(-1000, 10000, 250)
    xs[:10] = rng.integers(0, 2000, 10)
    xs[10:20] = rng.integers(xp - 2000, xp, 10)
    pts = spark.createDataFrame(
        [(int(x), int(y), int(v)) for x, y, v in zip(xs, ys, vs)],
        "x long, y long, v long")
    out = idw_surface(pts, grid, radius)
    got = {(r.cell_x, r.cell_y): (r.n_in, r.idw_num, r.idw_den, r.idw_est)
           for r in out.collect()}

    r2d = (2 * radius) ** 2
    want = {}
    for cx in range(grid):
        for cy in range(grid):
            num = den = n_in = 0
            for x, y, v in zip(xs, ys, vs):
                adx = abs(2 * int(x) - (2 * cx + 1) * cw)
                dx = min(adx, 2 * xp - adx)
                dy = abs(2 * int(y) - (2 * cy + 1) * ch)
                d2 = dx * dx + dy * dy
                if d2 < r2d:
                    w = IDW_SCALE // (d2 + d0)
                    num += w * int(v)
                    den += w
                    n_in += 1
            want[(cx, cy)] = (n_in, num, den,
                              num / den if den > 0 else 0.0)
    assert got == want
    assert any(v[0] > 0 for v in want.values())

    with pytest.raises(ValueError):
        idw_surface(pts, grid, radius=10 * cw)


# --- prefix-filter exact set-similarity join --------------------------------

def test_prefix_join_equals_exact_pair_set(spark):
    """The prefix-filtered join returns exactly the threshold pair set
    (recall 1.0 by the prefix-filtering theorem) — compared against an
    independently computed exact word-shingle Jaccard join."""
    from zellige_spark.operators import dedup as DD

    aug = DD._augmented(spark, "/root/testdata/sf0.001")
    sh = DD._shingles_words(aug).cache()
    sizes = {r.doc_id: r.sz for r in
             sh.groupBy("doc_id").count()
               .withColumnRenamed("count", "sz").collect()}
    import collections
    post = collections.defaultdict(list)
    for r in sh.collect():
        post[r.shingle].append(r.doc_id)
    common = collections.Counter()
    for ids in post.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                common[(ids[i], ids[j])] += 1
    want = {(a, b) for (a, b), c in common.items()
            if c / (sizes[a] + sizes[b] - c) >= DD.JACCARD_THRESHOLD}
    got = {(r.doc_a, r.doc_b)
           for r in DD.q_dedup_prefix(spark, "/root/testdata/sf0.001").collect()}
    assert len(want) > 0
    assert got == want


def test_prefix_filter_theorem_holds_on_random_sets():
    """Pure-python pin of the soundness argument with the EXACT integer
    prefix length p = sz - ceil(3*sz/5) + 1: any pair with Jaccard >=
    0.6 under any shared global order must share a prefix element."""
    import random

    rng = random.Random(7)
    univ = list(range(200))
    sets = []
    for _ in range(150):
        base = rng.sample(univ, rng.randint(3, 30))
        sets.append(set(base))
        # guaranteed near-dup: drop ~20% of a copy
        keep = max(3, (len(base) * 4) // 5)
        sets.append(set(base[:keep]))
    order = {u: (rng.random(), u) for u in univ}  # arbitrary global order

    def prefix(s):
        arr = sorted(s, key=lambda u: order[u])
        sz = len(arr)
        p = sz - ((3 * sz + 4) // 5) + 1
        return set(arr[:p])

    checked = 0
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            inter = len(a & b)
            if inter and inter / len(a | b) >= 0.6:
                checked += 1
                assert prefix(a) & prefix(b), (a, b)
    assert checked > 100


def test_prefix_index_is_sublinear_in_postings(spark):
    """The indexed prefix volume is the ~(1-t) fraction of the full
    posting table — the scale claim: candidates are generated from a
    strictly smaller inverted index than the exact all-postings join."""
    from pyspark.sql import functions as F

    from zellige_spark.operators import dedup as DD

    aug = DD._augmented(spark, "/root/testdata/sf0.001")
    arrs = DD._word_shingle_arrays(aug)
    full = arrs.select(F.explode("shs")).count()
    sh = arrs.select("doc_id", F.explode("shs").alias("shingle"))
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    ordered = (sh.join(dfreq, "shingle").groupBy("doc_id")
               .agg(F.array_sort(F.collect_list(F.struct("_df", "shingle")))
                    .alias("_ord")))
    pre_n = (ordered
             .withColumn("_sz", F.size("_ord"))
             .withColumn("_p", F.col("_sz")
                         - F.expr("(3 * _sz + 4) div 5") + F.lit(1))
             .select(F.explode(F.expr("slice(_ord, 1, _p)"))).count())
    # p/sz = sz - ceil(.6 sz) + 1 ~= .4 sz + 1; docs here are large
    # enough that the +1 stays small
    assert pre_n < 0.45 * full


# --- Bloom membership filter -------------------------------------------------

def test_bloom_merge_equals_direct_and_never_misses(spark):
    """bloom_merge(z3 words) == bloom_words built directly at z1 (OR
    associativity, executable); membership never false-negatives; state
    is bounded at 8 words per key with every bit below 2^32."""
    from pyspark.sql import functions as F

    from zellige_spark.operators import sketch as SK

    rows = [(i % 7, (i * 13) % 5, f"u{i % 97}") for i in range(2000)]
    df = spark.createDataFrame(rows, "tile_x long, tile_y long, id string")
    keys = ["tile_x", "tile_y"]
    w_fine = SK.bloom_words(df, keys, "id")
    merged = SK.bloom_merge(w_fine, {
        "tile_x": F.expr("shiftright(tile_x, 1)"),
        "tile_y": F.expr("shiftright(tile_y, 1)")})
    direct = SK.bloom_words(
        df.select(F.expr("shiftright(tile_x, 1)").alias("tile_x"),
                  F.expr("shiftright(tile_y, 1)").alias("tile_y"), "id"),
        keys, "id")
    m = {(r.tile_x, r.tile_y, r.w): r.bits for r in merged.collect()}
    d = {(r.tile_x, r.tile_y, r.w): r.bits for r in direct.collect()}
    assert m == d and len(d) > 0

    # per-key word count <= 8, every word fits in 32 bits
    per_key = w_fine.groupBy(*keys).count().collect()
    assert all(r["count"] <= 8 for r in per_key)
    assert w_fine.filter((F.col("bits") < 0)
                         | (F.col("bits") >= (1 << 32))).count() == 0

    # membership: every truly-present (key, probe) reads member=1
    probes = [f"u{i}" for i in range(0, 97, 9)] + ["absent-a", "absent-b"]
    mem = {(r.tile_x, r.tile_y, r.probe): r.member
           for r in SK.bloom_member(w_fine, keys, probes).collect()}
    truth = {(x, y, i) for (x, y, i) in
             {(r.tile_x, r.tile_y, r.id) for r in df.collect()}}
    for (x, y, p), v in mem.items():
        if (x, y, p) in truth:
            assert v == 1, (x, y, p)
    # the absent probes exist in the verdict table for every key
    n_keys = df.select(*keys).distinct().count()
    assert sum(1 for (x, y, p) in mem if p == "absent-a") == n_keys


def test_bloom_probe_words_match_engine_hash(spark):
    """Driver-side probe masks reproduce the in-plan positions: probing
    a single-item filter with the item itself is a guaranteed hit, and
    the filter's OR of words equals the probe's OR of need masks."""
    from zellige_spark.operators import sketch as SK

    df = spark.createDataFrame([(1, "lonely")], "k long, id string")
    words = {(r.w): r.bits for r in SK.bloom_words(df, ["k"], "id").collect()}
    need = {}
    for _, w, m in SK.bloom_probe_words(["lonely"]):
        need[w] = need.get(w, 0) | m
    assert words == need


def test_bloom_prune_never_drops_matches_and_prunes_most(spark):
    """The map-only Bloom prune keeps EVERY true match (join after
    prune == plain join) while dropping most non-matching big-side
    rows; the filter sizing targets ~10 bits per dim key."""
    from pyspark.sql import functions as F

    from zellige_spark.operators import sketch as SK

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet") \
        .select("o_orderkey", "o_custkey")
    cust = (spark.read.parquet(f"{sf}/customer.parquet")
            .filter(F.col("c_nationkey") == 7).select("c_custkey"))

    got = {r.o_orderkey for r in SK.bloom_prune_join(
        orders, cust, "o_custkey", "c_custkey", how="semi").collect()}
    want = {r.o_orderkey for r in orders.join(
        cust, orders.o_custkey == cust.c_custkey, "semi").collect()}
    assert len(want) > 0 and got == want

    # prune effectiveness: nation 7 holds ~1/25 of customers, so the
    # survivor fraction must be far below 1 (true matches + fp)
    n_big = orders.count()
    n_kept = SK.bloom_prune(orders, cust, "o_custkey", "c_custkey").count()
    assert n_kept >= len(want)          # no false negatives, ever
    assert n_kept < 0.25 * n_big        # and the prune actually bites

    # sizing: power of two, >= 10 bits/key before the cap
    assert SK.bloom_join_m_words(100) == 16        # 1024 bits
    assert SK.bloom_join_m_words(10**9) == SK.BLOOM_JOIN_MAX_WORDS


def test_bloom_prune_empty_dim_drops_everything(spark):
    """An empty dim side yields an all-zero filter: every big-side row
    is pruned map-only and the join returns nothing."""
    from pyspark.sql import functions as F

    from zellige_spark.operators import sketch as SK

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet") \
        .select("o_orderkey", "o_custkey")
    none = (spark.read.parquet(f"{sf}/customer.parquet")
            .filter(F.col("c_nationkey") == -1).select("c_custkey"))
    assert SK.bloom_prune(orders, none, "o_custkey", "c_custkey").count() == 0


def test_containment_join_equals_bruteforce_and_is_directional(spark):
    """The asymmetric prefix-filtered containment join equals the
    literal all-pairs containment set, and it is DIRECTIONAL: the
    truncated corpus variants are contained in their originals (pair
    present one way), while the originals are NOT contained in their
    truncations whenever the original has enough extra shingles."""
    from zellige_spark.operators import dedup as DD

    sf = "/root/testdata/sf0.001"
    aug = DD._augmented(spark, sf)
    sets = {r.doc_id: set(r.shs) for r in
            DD._word_shingle_arrays(aug).collect()}
    want = set()
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a != b and len(sa & sb) * DD._C_DEN >= len(sa) * DD._C_NUM:
                want.add((a, b))
    got = {(r.doc_a, r.doc_b): (r.common, r.sz_a)
           for r in DD.q_dedup_contain(spark, sf).collect()}
    assert set(got) == want and len(want) > 0
    # evidence columns are the exact intersection arithmetic
    for (a, b), (common, sz_a) in got.items():
        assert common == len(sets[a] & sets[b]) and sz_a == len(sets[a])
    # directionality: at least one truncated->original containment
    # whose reverse is absent
    one_way = [(a, b) for (a, b) in want
               if a >= 1000000 and b == a - 1000000 and (b, a) not in want]
    assert len(one_way) > 0


def test_contain_keep_decision_semantics(spark):
    """The containment decision drops exactly the docs dominated by a
    strictly-larger (or tie-break) container: truncated variants drop,
    their originals stay, and untouched docs all stay kept."""
    from zellige_spark.operators import dedup as DD

    sf = "/root/testdata/sf0.001"
    out = {r.doc_id: r.kept
           for r in DD.q_contain_keep(spark, sf).collect()}
    pairs = DD.q_dedup_contain(spark, sf).collect()
    sets = {r.doc_id: set(r.shs) for r in
            DD._word_shingle_arrays(DD._augmented(spark, sf)).collect()}
    want_drop = set()
    for r in pairs:
        sz_b = len(sets[r.doc_b])
        if r.sz_a < sz_b or (r.sz_a == sz_b and r.doc_a > r.doc_b):
            want_drop.add(r.doc_a)
    assert set(out) == set(sets)
    for d, kept in out.items():
        assert kept == (0 if d in want_drop else 1), d
    # the corpus guarantees: some truncations drop, and an original is
    # only ever dropped because it too is dominated (cross-doc
    # containment exists in the corpus) — at least one dropped
    # truncation must still have its original kept
    dropped_truncs = [d for d in want_drop if d >= 1000000]
    assert len(dropped_truncs) > 0
    assert any(out[d - 1000000] == 1 for d in dropped_truncs)
    for d in dropped_truncs:
        if out[d - 1000000] == 0:
            assert (d - 1000000) in want_drop  # dominated, not lost


def test_payload_audit_on_real_synth_images(spark):
    """The quarantine gate over the REAL synthetic image corpus (raw /
    ppm / png payloads from synth.encode_image): every well-formed row
    passes all checks, and hand-corrupted variants trip exactly the
    right verdict."""
    from pyspark.sql import functions as F

    from zellige_spark import synth
    from zellige_spark.operators.images import payload_audit

    imgs = synth.images_df(spark, 120).select(
        "image_id", "bytes", "w", "h", "fmt", "caption")
    out = payload_audit(imgs).toPandas()
    assert len(out) == 120
    assert (out.quarantine == 0).all()
    assert set(out.fmt) == {"raw", "ppm", "png"}

    # corrupt: drop the last byte -> len_ok fails for raw/ppm; zero w
    # -> dims fails everywhere; empty caption -> caption fails
    bad = imgs.withColumn(
        "bytes", F.expr("substring(bytes, 1, CAST(length(bytes) - 1 AS INT))")
    ).withColumn("w", F.lit(0)).withColumn("caption", F.lit(""))
    outb = payload_audit(bad).toPandas()
    assert (outb.quarantine == 1).all()
    assert (outb.dims_ok == 0).all()
    assert (outb.caption_ok == 0).all()
    assert (outb[outb.fmt != "png"].len_ok == 0).all()
    # magic bytes were not touched, so magic_ok stays green
    assert (outb.magic_ok == 1).all()


def test_curated_tiles_consistent_with_audit(spark):
    """The curation capstone's per-tile totals reconcile exactly with
    the standalone audit: sum(n_total) = corpus size, sum(n_kept) =
    clean rows, and quarantined rows are really excluded from the
    byte volume."""
    from zellige_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    tiles = Q.q_curated_tiles(spark, sf).toPandas()
    audit = Q.q_payload_audit(spark, sf).toPandas()
    assert tiles.n_total.sum() == len(audit)
    assert tiles.n_kept.sum() == (audit.quarantine == 0).sum()
    assert (tiles.n_kept <= tiles.n_total).all()
    assert tiles.n_kept.sum() < tiles.n_total.sum()  # corruption bites
    assert (tiles.bytes_kept[tiles.n_kept == 0] == 0).all()


def test_payload_audit_runs_on_streams(spark, tmp_path):
    """The quarantine gate is stateless Column math, so the SAME
    operator runs unchanged on a Structured Stream — verdicts equal
    the batch run row for row."""
    import os
    import pandas as pd

    from zellige_spark import synth
    from zellige_spark.operators.images import payload_audit

    src = str(tmp_path / "pa_in")
    os.makedirs(src)
    batch = synth.images_df(spark, 60).select(
        "image_id", "bytes", "w", "h", "fmt", "caption")
    batch.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (payload_audit(stream).writeStream
         .outputMode("append").format("memory").queryName("pa_stream")
         .option("checkpointLocation", str(tmp_path / "pa_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.image_id: (r.magic_ok, r.len_ok, r.dims_ok, r.caption_ok,
                        r.quarantine)
           for r in spark.table("pa_stream").collect()}
    want = {r.image_id: (r.magic_ok, r.len_ok, r.dims_ok, r.caption_ok,
                         r.quarantine)
            for r in payload_audit(batch).collect()}
    assert got == want and len(want) == 60


def test_image_quality_integrity_columns(spark):
    """Every row of the driver's image_quality query passes both
    in-job verdicts: stat_ok (histogram recompute of the luma sums +
    Popoviciu variance bound + floor-mean bounds inside the UDF) and
    keep_ok (the keep gate re-decided JVM-side from the emitted
    metrics).  Mixed raw/ppm/png + real-JPEG corpus, and the gate
    still splits it non-trivially."""
    from zellige_spark.operators import images as IMG

    out = IMG.q_image_quality(spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) == 400
    assert (out.stat_ok == 1).all()
    assert (out.keep_ok == 1).all()
    assert 0 < out.keep.sum() < len(out)


def test_image_quality_stat_ok_trips_on_bad_math():
    """The Popoviciu bound in stat_ok is live: a contrast exceeding
    range²/4 (what a corrupted variance accumulation would produce)
    fails the same predicate the UDF evaluates."""
    lo, hi, rng = 100, 900, 800
    good_contrast, bad_contrast = rng * rng // 4, rng * rng // 4 + 1
    assert 0 <= good_contrast <= (rng * rng) // 4
    assert not (0 <= bad_contrast <= (rng * rng) // 4)
    assert lo <= (lo + hi) // 2 <= hi
