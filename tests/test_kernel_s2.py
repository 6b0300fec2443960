"""S2 kernel property tests (no Spark; run in seconds).

Bit-level parity with the external s2geometry library is not checkable
in this sandbox (no s2 package); these tests pin the *defining
properties* of the construction instead — Hilbert continuity, the
prefix hierarchy, projection round-trips, neighbor symmetry across
cube faces, exhaustive coverage — which are the invariants the engine
operators rely on.
"""

import numpy as np
import pytest

from zellige_spark.kernel import s2


RNG = np.random.default_rng(20260817)


def test_hilbert_continuity_all_faces():
    # consecutive curve positions are edge-adjacent cells: the defining
    # Hilbert property; fails for any wrong entry in the step tables
    level = 5
    pos = np.arange(4 ** level)
    for face in range(6):
        i, j = s2.pos_to_ij(np.full_like(pos, face), pos, level)
        step = np.abs(np.diff(i)) + np.abs(np.diff(j))
        assert np.all(step == 1)


def test_pos_ij_roundtrip():
    level = 9
    n = 1 << level
    f = RNG.integers(0, 6, 5000)
    i = RNG.integers(0, n, 5000)
    j = RNG.integers(0, n, 5000)
    p = s2.ij_to_pos(f, i, j, level)
    i2, j2 = s2.pos_to_ij(f, p, level)
    assert np.array_equal(i, i2) and np.array_equal(j, j2)


def test_face_uv_roundtrip_unit_vectors():
    v = RNG.normal(size=(5000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    face, u, w = s2.xyz_to_face_uv(v[:, 0], v[:, 1], v[:, 2])
    assert np.all((face >= 0) & (face <= 5))
    assert np.all(np.abs(u) <= 1 + 1e-12) and np.all(np.abs(w) <= 1 + 1e-12)
    x, y, z = s2.face_uv_to_xyz(face, u, w)
    nrm = np.sqrt(x * x + y * y + z * z)
    assert np.allclose(np.stack([x / nrm, y / nrm, z / nrm], axis=1), v, atol=1e-12)


def test_st_uv_roundtrip():
    s = RNG.uniform(0, 1, 20000)
    assert np.allclose(s2.uv_to_st(s2.st_to_uv(s)), s, atol=1e-14)
    u = RNG.uniform(-1, 1, 20000)
    assert np.allclose(s2.st_to_uv(s2.uv_to_st(u)), u, atol=1e-14)


def test_hierarchy_prefix_nesting():
    lon = RNG.uniform(-180, 180, 3000)
    lat = RNG.uniform(-90, 90, 3000)
    f10, i10, j10, p10 = s2.lonlat_to_cell(lon, lat, 10)
    for coarse in (9, 6, 3):
        fc, ic, jc, pc = s2.lonlat_to_cell(lon, lat, coarse)
        d = 10 - coarse
        assert np.array_equal(f10, fc)
        assert np.array_equal(i10 >> d, ic)
        assert np.array_equal(j10 >> d, jc)
        assert np.array_equal(p10 >> (2 * d), pc)
    cid10 = s2.cid_pack(f10, p10, 10)
    cid9 = s2.cid_pack(f10, p10 >> 2, 9)
    assert np.array_equal(cid10 >> 2, cid9)


def test_cell_center_reassigns_to_same_cell():
    lon = RNG.uniform(-180, 180, 3000)
    lat = RNG.uniform(-90, 90, 3000)
    f, i, j, _ = s2.lonlat_to_cell(lon, lat, 8)
    clon, clat = s2.cell_center_lonlat(f, i, j, 8)
    f2, i2, j2, _ = s2.lonlat_to_cell(clon, clat, 8)
    assert np.array_equal(f, f2) and np.array_equal(i, i2) and np.array_equal(j, j2)


def test_coverage_level1_exhaustive():
    cid = s2.lonlat_to_cid(RNG.uniform(-180, 180, 200000),
                           RNG.uniform(-90, 90, 200000), 1)
    assert len(np.unique(cid)) == 6 * 4  # every level-1 cell is hit


def test_neighbor_symmetry_including_cross_face():
    level = 4
    n = 1 << level
    f = RNG.integers(0, 6, 200)
    i = RNG.integers(0, n, 200)
    # force half the sample onto face edges so wraps are exercised
    i[:100] = np.where(RNG.random(100) < 0.5, 0, n - 1)
    j = RNG.integers(0, n, 200)
    nf, ni, nj = s2.neighbors(f, i, j, level)
    for m in range(200):
        me = (int(f[m]), int(i[m]), int(j[m]))
        nbrs = {(int(nf[m, t]), int(ni[m, t]), int(nj[m, t])) for t in range(8)}
        assert me not in nbrs
        assert len(nbrs) >= 7  # 8 normally, 7 at a cube corner
        for t in nbrs:
            bf, bi, bj = s2.neighbors(*[np.array([c]) for c in t], level)
            back = {(int(bf[0, q]), int(bi[0, q]), int(bj[0, q])) for q in range(8)}
            assert me in back


def test_neighbors_cross_face_land_on_other_faces():
    level = 3
    n = 1 << level
    # cell at the u=+1 edge of face 0 must have at least one neighbor
    # on another face
    nf, _, _ = s2.neighbors(np.array([0]), np.array([n - 1]), np.array([n // 2]), level)
    assert (nf != 0).any()


def test_kring_ring1_is_neighbors_plus_self():
    level = 4
    f = RNG.integers(0, 6, 30)
    n = 1 << level
    i = RNG.integers(0, n, 30)
    j = RNG.integers(0, n, 30)
    rings = s2.kring_cids(f, i, j, level, 1)
    nf, ni, nj = s2.neighbors(f, i, j, level)
    for m in range(30):
        cells = {(int(f[m]), int(i[m]), int(j[m]))}
        cells |= {(int(nf[m, t]), int(ni[m, t]), int(nj[m, t])) for t in range(8)}
        arr = np.asarray(sorted(cells), dtype=np.int64)
        pos = s2.ij_to_pos(arr[:, 0], arr[:, 1], arr[:, 2], level)
        expect = np.unique(s2.cid_pack(arr[:, 0], pos, level))
        assert np.array_equal(expect, rings[m])


def test_kring_monotone_and_covers_sphere():
    level = 2
    f, i, j = np.array([0]), np.array([1]), np.array([2])
    sizes = [len(s2.kring_cids(f, i, j, level, r)[0]) for r in (1, 2, 4, 8, 3 * (1 << level))]
    assert sizes == sorted(sizes)
    assert sizes[-1] == 6 * 4 ** level  # full-sphere coverage bound


def test_cell_id_u64_unique_and_face_prefixed():
    lon = RNG.uniform(-180, 180, 1000)
    lat = RNG.uniform(-90, 90, 1000)
    f, _, _, p = s2.lonlat_to_cell(lon, lat, 12)
    u = s2.cell_id_u64(f, p, 12)
    assert np.array_equal((u >> np.uint64(61)).astype(np.int64), f)
    # distinct (face,pos) -> distinct u64
    cid = s2.cid_pack(f, p, 12)
    assert len(np.unique(u)) == len(np.unique(cid))


def test_level_bounds_rejected():
    from zellige_spark.operators import s2cells

    with pytest.raises(ValueError):
        s2cells.with_s2_cell(None, 0)
    with pytest.raises(ValueError):
        s2cells.with_s2_cell(None, s2.MAX_LEVEL + 1)
