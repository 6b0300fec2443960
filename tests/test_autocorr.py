"""Global spatial-autocorrelation + lattice point-pattern statistics
(`operators/autocorr.py`) vs an independent numpy brute-force twin,
plus directional sanity on constructed patterns (checkerboard ->
negative Moran / Geary > 1; one hot blob -> positive Moran)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from zellige_spark.operators import autocorr as AC

GRID = 8
XP, YP = 360000, 170000


def _pts_df(spark, xs, ys):
    return spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(xs, ys)], "x long, y long")


def _cell_counts(xs, ys, grid=GRID):
    cw, ch = XP // grid, YP // grid
    z = np.zeros((grid, grid), dtype=np.int64)  # [x][y]
    for x, y in zip(xs, ys):
        z[x // cw][y // ch] += 1
    return z


def _queen(grid, include_self=False):
    """Neighbor lists under the package conventions: x wraps, y
    clamps."""
    nbrs = {}
    for cx in range(grid):
        for cy in range(grid):
            acc = []
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if not include_self and dx == 0 and dy == 0:
                        continue
                    ny = cy + dy
                    if 0 <= ny < grid:
                        acc.append(((cx + dx) % grid, ny))
            nbrs[(cx, cy)] = acc
    return nbrs


def _rand_points(seed, n=400):
    rng = np.random.default_rng(seed)
    return rng.integers(0, XP, n), rng.integers(0, YP, n)


def test_global_autocorr_matches_numpy_bruteforce(spark):
    xs, ys = _rand_points(7)
    z = _cell_counts(xs, ys)
    n = GRID * GRID
    s = int(z.sum())
    d = {(cx, cy): n * int(z[cx][cy]) - s
         for cx in range(GRID) for cy in range(GRID)}
    nbrs = _queen(GRID)
    w = sum(len(v) for v in nbrs.values())
    cross = sum(d[c] * sum(d[j] for j in nbrs[c]) for c in nbrs)
    ssd = sum(v * v for v in d.values())
    gsum = sum((int(z[c[0]][c[1]]) - int(z[j[0]][j[1]])) ** 2
               for c in nbrs for j in nbrs[c])
    row = (AC.global_autocorr(_pts_df(spark, xs, ys), GRID)
           .collect()[0])
    assert row.n_cells == n and row.n_points == s
    assert row.w_joins == w
    assert row.i_num == n * cross and row.i_den == w * ssd
    assert row.c_num == (n - 1) * n * n * gsum
    assert row.c_den == 2 * w * ssd
    assert row.moran_i == pytest.approx(n * cross / (w * ssd))
    assert row.geary_c == pytest.approx(
        (n - 1) * n * n * gsum / (2 * w * ssd))


def test_moran_sign_on_constructed_patterns(spark):
    cw, ch = XP // GRID, YP // GRID
    # checkerboard: one point in every other cell -> repulsion
    xs, ys = [], []
    for cx in range(GRID):
        for cy in range(GRID):
            if (cx + cy) % 2 == 0:
                xs.append(cx * cw + 1)
                ys.append(cy * ch + 1)
    row = AC.global_autocorr(_pts_df(spark, xs, ys), GRID).collect()[0]
    assert row.moran_i < 0 and row.geary_c > 1.0
    # one dense 2x2 blob -> clustering
    xs = [1, 1, cw + 1, cw + 1, 1, cw + 1, 1, cw + 1]
    ys = [1, ch + 1, 1, ch + 1, 1, 1, ch + 1, ch + 1]
    row = AC.global_autocorr(_pts_df(spark, xs, ys), GRID).collect()[0]
    assert row.moran_i > 0 and 0.0 < row.geary_c < 1.0


def test_global_autocorr_degenerate_uniform_is_zero(spark):
    """Exactly one point per cell -> zero variance -> den == 0 and the
    0.0 guard fires on both statistics (mirrors the oracle CASE)."""
    cw, ch = XP // GRID, YP // GRID
    xs, ys = [], []
    for cx in range(GRID):
        for cy in range(GRID):
            xs.append(cx * cw + 1)
            ys.append(cy * ch + 1)
    row = AC.global_autocorr(_pts_df(spark, xs, ys), GRID).collect()[0]
    assert row.i_den == 0 and row.moran_i == 0.0 and row.geary_c == 0.0


def test_getis_ord_matches_numpy_bruteforce(spark):
    xs, ys = _rand_points(11)
    z = _cell_counts(xs, ys)
    n = GRID * GRID
    s = int(z.sum())
    sq = int((z.astype(object) ** 2).sum())
    nbrs = _queen(GRID, include_self=True)
    rows = (AC.getis_ord(_pts_df(spark, xs, ys), GRID)
            .orderBy("cell_x", "cell_y").collect())
    assert len(rows) == n
    gden = n * sq - s * s
    for row in rows:
        c = (row.cell_x, row.cell_y)
        w_i = len(nbrs[c])
        l_i = sum(int(z[j[0]][j[1]]) for j in nbrs[c])
        n_i = n * l_i - w_i * s
        assert row.w_i == w_i and row.l_i == l_i
        assert row.gi_num == n_i
        assert row.gi2_num == n_i * n_i * (n - 1)
        assert row.gi2_den == gden * (n * w_i - w_i * w_i)
        want = np.sign(n_i) * np.sqrt(row.gi2_num / row.gi2_den)
        assert row.gi_star == pytest.approx(want)
    # hot and cold spots both exist on a random pattern
    stars = [r.gi_star for r in rows]
    assert max(stars) > 0 and min(stars) < 0


def test_join_counts_matches_numpy_bruteforce(spark):
    xs, ys = _rand_points(13, n=60)  # sparse -> mixed B/W marks
    z = _cell_counts(xs, ys)
    n = GRID * GRID
    b = {(cx, cy): 1 if z[cx][cy] >= 1 else 0
         for cx in range(GRID) for cy in range(GRID)}
    nbrs = _queen(GRID)
    pairs = set()
    for c in nbrs:
        for j in nbrs[c]:
            k1 = c[0] * GRID + c[1]
            k2 = j[0] * GRID + j[1]
            if k1 < k2:
                pairs.add((k1, k2))
    bb = bw = ww = 0
    for k1, k2 in pairs:
        b1, b2 = b[(k1 // GRID, k1 % GRID)], b[(k2 // GRID, k2 % GRID)]
        if b1 and b2:
            bb += 1
        elif not b1 and not b2:
            ww += 1
        else:
            bw += 1
    nb = sum(b.values())
    j = len(pairs)
    row = AC.join_counts(_pts_df(spark, xs, ys), GRID).collect()[0]
    assert (row.n_black, row.n_joins) == (nb, j)
    assert (row.bb, row.bw, row.ww) == (bb, bw, ww)
    assert row.ebb_num == j * nb * (nb - 1)
    assert row.ebw_num == 2 * j * nb * (n - nb)
    assert row.eww_num == j * (n - nb) * (n - nb - 1)
    assert row.e_den == n * (n - 1)
    assert row.e_bb == pytest.approx(j * nb * (nb - 1) / (n * (n - 1)))


def test_semivariogram_matches_numpy_bruteforce(spark):
    xs, ys = _rand_points(17)
    z = _cell_counts(xs, ys)
    r2 = 8
    offs = AC.variogram_offsets(r2)
    want = {}
    for dx, dy, h2 in offs:
        for cx in range(GRID):
            for cy in range(GRID):
                ny = cy + dy
                if 0 <= ny < GRID:
                    nx = (cx + dx) % GRID
                    npair, sq = want.get(h2, (0, 0))
                    diff = int(z[cx][cy]) - int(z[nx][ny])
                    want[h2] = (npair + 1, sq + diff * diff)
    rows = (AC.semivariogram(_pts_df(spark, xs, ys), GRID, r2)
            .collect())
    assert sorted(r.h2 for r in rows) == sorted(want)
    for row in rows:
        npair, sq = want[row.h2]
        assert (row.n_pairs, row.gamma_num) == (npair, sq)
        assert row.gamma_den == 2 * npair
        assert row.gamma == pytest.approx(sq / (2 * npair))


def test_variogram_offsets_cover_each_pair_once():
    """Half-plane offsets: the union of (o, -o) over the offset set
    covers every (dx, dy) != (0,0) with dx^2+dy^2 <= r2 exactly
    once."""
    r2 = 16
    offs = AC.variogram_offsets(r2)
    seen = set()
    for dx, dy, h2 in offs:
        assert 0 < h2 <= r2 and h2 == dx * dx + dy * dy
        for o in ((dx, dy), (-dx, -dy)):
            assert o not in seen
            seen.add(o)
    full = {(dx, dy) for dx in range(-4, 5) for dy in range(-4, 5)
            if 0 < dx * dx + dy * dy <= r2}
    assert seen == full


def test_lattice_stats_single_exchange_on_raw_rows(spark):
    """The raw point rows feed exactly one partial-agg'd Exchange; all
    neighbor machinery runs on the grid-bounded cell set (the 100-TB
    shape shared by local_moran)."""
    xs, ys = _rand_points(19)
    df = AC.global_autocorr(_pts_df(spark, xs, ys), GRID)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    # the only row-multiplying joins are the broadcast of the 1-row
    # global scalars; no shuffle-side cartesian product anywhere
    assert "CartesianProduct" not in plan
