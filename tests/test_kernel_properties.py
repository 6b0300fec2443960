"""Property-based kernel tests (hypothesis): encode/decode round trips,
clip invariants, simplification contracts — pure numpy, no Spark."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from zellige_spark.kernel import clip as c
from zellige_spark.kernel import mvt
from zellige_spark.kernel import pipeline as P
from zellige_spark.kernel import simplify as s

coord = st.floats(min_value=-5000, max_value=5000, allow_nan=False,
                  allow_infinity=False)
ipt = st.tuples(st.integers(-100000, 100000), st.integers(-100000, 100000))


@given(st.lists(ipt, min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_point_commands_roundtrip(pts):
    arr = np.array(pts, dtype=np.int64)
    cmds = mvt.point_feature_commands(arr)
    decoded = mvt.decode_geometry(mvt.GEOM_POINT, cmds.tolist())
    # decode drops zero-delta repeats after the first (expand semantics)
    expected = [tuple(arr[0])]
    for p in arr[1:]:
        if tuple(p) != expected[-1] or False:
            pass
    # faithful reference model: consecutive duplicates collapse
    exp = [tuple(arr[0])]
    for p in map(tuple, arr[1:]):
        if p != exp[-1]:
            exp.append(p)
        # duplicate -> zero diff -> dropped on decode
    assert decoded == exp


@given(st.lists(st.lists(ipt, min_size=2, max_size=30), min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_line_commands_roundtrip(lines):
    arrs = [mvt.remove_next_duplicate(np.array(l, dtype=np.int64)) for l in lines]
    arrs = [a for a in arrs if len(a) > 1]
    if not arrs:
        return
    cmds = mvt.line_feature_commands(arrs)
    decoded = mvt.decode_geometry(mvt.GEOM_LINESTRING, cmds.tolist())
    assert [list(map(tuple, a)) for a in arrs] == decoded


@given(st.lists(ipt, min_size=3, max_size=20))
@settings(max_examples=100, deadline=None)
def test_polygon_commands_roundtrip(ring_pts):
    ring = mvt.remove_next_duplicate(np.array(ring_pts, dtype=np.int64))
    if len(ring) < 3:
        return
    closed = np.concatenate([ring, ring[:1]])
    cmds = mvt.polygon_feature_commands([(closed, [])])
    decoded = mvt.decode_geometry(mvt.GEOM_POLYGON, cmds.tolist())
    assert len(decoded) >= 1
    outer, _ = decoded[0]
    # decode re-closes the ring; interior content must match
    assert outer[:-1] == list(map(tuple, ring)) or outer == list(map(tuple, closed))


@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=40))
@settings(max_examples=200, deadline=None)
def test_clip_line_stays_in_window(pts):
    window = (0.0, 0.0, 4096.0, 4096.0)
    out = c.clip_line_qc(window, np.array(pts))
    if out is not None:
        eps = 1e-6  # float intersection math can graze the boundary
        assert (out[:, 0] >= -eps).all() and (out[:, 0] <= 4096 + eps).all()
        assert (out[:, 1] >= -eps).all() and (out[:, 1] <= 4096 + eps).all()


@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=25))
@settings(max_examples=150, deadline=None)
def test_clip_algorithms_agree(pts):
    """QuickClip / Cohen-Sutherland / Liang-Barsky / NLN produce the
    same clipped line (ClipSpec.hs:214-230 generalized)."""
    from zellige_spark.kernel import clip_nln as cn

    window = (10.0, 10.0, 60.0, 60.0)
    arr = np.array(pts)
    outs = [f(window, arr) for f in (c.clip_line_qc, c.clip_line_cs,
                                     c.clip_line_lb, cn.clip_line_nln)]
    if all(o is None for o in outs):
        return
    assert all(o is not None for o in outs)
    for o in outs[1:]:
        assert np.allclose(outs[0], o, rtol=1e-9, atol=1e-9)


@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=25))
@settings(max_examples=150, deadline=None)
def test_sh_clip_inside_window(pts):
    window = (0.0, 0.0, 1000.0, 1000.0)
    ring = np.array(pts + pts[:1])
    out = c.sh_clip_ring(window, ring)
    if out is not None:
        eps = 1e-6
        assert (out >= -eps).all() and (out <= 1000 + eps).all()
        assert (out[0] == out[-1]).all()


@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=40),
       st.floats(min_value=0.1, max_value=50))
@settings(max_examples=150, deadline=None)
def test_dp_preserves_endpoints_and_subset(pts, eps):
    arr = np.array(pts)
    out = s.douglas_peucker(eps, arr)
    assert (out[0] == arr[0]).all()
    assert (out[-1] == arr[-1]).all()
    # every output point exists in the input
    in_set = {tuple(p) for p in arr}
    assert all(tuple(p) in in_set for p in out)


@given(st.lists(st.tuples(coord, coord), min_size=4, max_size=20))
@settings(max_examples=100, deadline=None)
def test_rewind_involution_and_area_negation(pts):
    arr = np.array(pts)
    assert np.array_equal(s.rewind(s.rewind(arr)), arr)
    closed = np.concatenate([arr, arr[:1]])
    a1 = s.surveyor(closed)
    a2 = s.surveyor(s.rewind(closed))
    assert abs(a1 + a2) < 1e-6 * max(1.0, abs(a1))


@given(st.dictionaries(st.text(min_size=1, max_size=8),
                       st.one_of(st.text(max_size=8), st.booleans(),
                                 st.floats(allow_nan=False, allow_infinity=False),
                                 st.integers(-2**40, 2**40), st.none()),
                       max_size=6))
@settings(max_examples=100, deadline=None)
def test_props_roundtrip_through_tile(props):
    feats = [{"fid": 7, "geom_type": "Point", "parts": [[[[10.0, 10.0]]]],
              "props": props}]
    cfg = P.TileConfig(name="t", z=0, x=0, y=0)
    tile = mvt.decode_tile(P.encode_features(feats, cfg))["t"]
    [f] = tile["features"]
    expected = mvt.convert_props(props)
    assert f["metadata"] == expected
