"""Golden-value unit tests ported verbatim from the reference specs
(SURVEY.md §5.2 / FIXTURES.md §4).  Pure numpy — no Spark session."""

import numpy as np
import pytest

from zellige_spark.kernel import clip as c
from zellige_spark.kernel import mercator as m
from zellige_spark.kernel import mvt
from zellige_spark.kernel import simplify as s


# --- SphericalMercatorSpec.hs:26-54 ------------------------------------------

Z18_BBOX = m.tile_bbox(18, 236629, 160842)

@pytest.mark.parametrize("lonlat,expected", [
    ((144.961043, -37.800096), (839.9996700223613, 2194.1081715809173)),
    ((144.960495, -37.800045), (22.762837334737632, 2097.8526471037135)),
    ((144.960599, -37.799549), (177.85887856088198, 1161.7239537991395)),
])
def test_mercator_z18_golden(lonlat, expected):
    x, y = m.lonlat_to_tile_local(np.array([lonlat[0]]), np.array([lonlat[1]]), 2048, 1, Z18_BBOX)
    assert x[0] == expected[0]
    assert y[0] == expected[1]


def test_lon_lat_clamping():
    assert float(m.lon_to_x(200.0)) == m.MAX_EXTENTS
    assert float(m.lat_to_y(-89.9999)) == -m.MAX_EXTENTS


def test_quantize_half_even():
    # newQuantize: Haskell round = half-even (SphericalMercator.hs:96-97)
    assert float(m.quantize(2.0, 3.0)) == 4.0
    assert float(m.quantize(2.0, 1.0)) == 0.0  # 0.5 rounds to even 0
    assert float(m.quantize(2.0, 5.0)) == 4.0  # 2.5 rounds to even 2


def test_tile_bbox_y_inverted():
    min_x, min_y, max_x, max_y = m.tile_bbox(2, 1, 1)
    assert min_y > max_y  # top edge is "min" (SphericalMercator.hs:113-121)
    assert min_x < max_x


def test_tile_assignment_roundtrip():
    # xy3857_to_tile is the inverse of tile_bbox for interior points
    rng = np.random.default_rng(42)
    lon = rng.uniform(-179, 179, 1000)
    lat = rng.uniform(-84, 84, 1000)
    X, Y = m.lon_to_x(lon), m.lat_to_y(lat)
    for z in (0, 3, 9, 14):
        tx, ty = m.xy3857_to_tile(X, Y, z)
        bx0, by0, bx1, by1 = m.tile_bbox(z, tx, ty)
        assert np.all((X >= bx0) & (X <= bx1))
        assert np.all((Y <= by0) & (Y >= by1))  # y-down span


# --- ClipSpec.hs ---------------------------------------------------------------

LINE_WINDOW = (10.0, 10.0, 60.0, 60.0)
LINE_IN = np.array([(5.0, 5.0), (45.0, 50.0), (90.0, 140.0)])
LINE_OUT = [[10.0, 10.625], [45.0, 50.0], [50.0, 60.0]]


from zellige_spark.kernel import clip_nln as cn  # noqa: E402


@pytest.mark.parametrize("fn", [c.clip_line_qc, c.clip_line_cs, c.clip_line_lb,
                                cn.clip_line_nln])
def test_clip_line_all_algorithms(fn):
    # ClipSpec.hs:214-230 — identical result across all 4 algorithms
    assert fn(LINE_WINDOW, LINE_IN).tolist() == LINE_OUT


MULTILINE_IN = [np.array(l, dtype=float) for l in [
    [(11, 11), (59, 59)], [(0, 0), (0, 100)], [(5, 5), (45, 50), (90, 140)],
    [(0, 0), (10, 10)], [(50, 50), (0, 10)], [(0, 0), (60, 60)]]]
MULTILINE_OUT = [
    [[10.0, 10.0], [60.0, 60.0]],
    [[50.0, 50.0], [10.0, 18.0]],
    [[10.0, 10.0], [10.0, 10.0]],
    [[10.0, 10.625], [45.0, 50.0], [50.0, 60.0]],
    [[11.0, 11.0], [59.0, 59.0]],
]


@pytest.mark.parametrize("fn", [c.clip_multiline_qc, c.clip_multiline_cs,
                                c.clip_multiline_lb, cn.clip_multiline_nln])
def test_clip_multiline_reversed_order(fn):
    # ClipSpec.hs:131-138 — 6 lines in, 5 out, reversed order
    assert [l.tolist() for l in fn(LINE_WINDOW, MULTILINE_IN)] == MULTILINE_OUT


RING1 = np.array([(50, 50), (50, 150), (200, 50), (350, 50), (350, 150), (350, 350),
                  (350, 300), (250, 300), (200, 250), (50, 350), (150, 350),
                  (100, 250), (100, 200)], dtype=float)
RING1_CLIPPED = [
    [100.0, 200.0], [100.0, 116.66666666666667], [125.00000000000001, 100.0],
    [300.0, 100.0], [300.0, 300.0], [250.0, 300.0], [200.0, 250.0],
    [124.99999999999999, 300.0], [125.0, 300.0], [100.0, 250.0], [100.0, 200.0]]


def test_sh_polygon_golden():
    # ClipSpec.hs:146-147 (geoResultLinearRing1) incl. non-integral points
    res = c.sh_clip_ring((100.0, 100.0, 300.0, 300.0), RING1)
    assert res.tolist() == RING1_CLIPPED


def test_sh_polygon_ring2():
    ring2 = np.array([(100, 150), (100, 207), (250, 250), (250, 150), (100, 150)], dtype=float)
    res = c.sh_clip_ring((100.0, 100.0, 300.0, 300.0), ring2)
    assert res.tolist() == [[100, 150], [100, 207], [250, 250], [250, 150], [100, 150]]


def test_sh_fully_outside_dropped():
    broken = np.array([(-512, -400), (96, -400), (96, -904), (-512, -904), (-512, -400)], dtype=float)
    assert c.sh_clip_ring((-128.0, -128.0, 2176.0, 2176.0), broken) is None


def test_sh_window_covering_unchanged():
    giant = np.array([(-128, -128), (2176, -128), (2176, 2176), (-128, 2176), (-128, -128)], dtype=float)
    res = c.sh_clip_ring((-128.0, -128.0, 2176.0, 2176.0), giant)
    assert res.tolist() == giant.tolist()


def test_sh_turning_point():
    turning = np.array([(125, 125), (175, 175), (75, 225), (25, 175), (125, 125)], dtype=float)
    res = c.sh_clip_ring((100.0, 100.0, 200.0, 200.0), turning)
    assert res.tolist() == [[125, 125], [175, 175], [125, 200], [100, 200], [100, 137.5], [125, 125]]


def test_polygon_quickclip_whole_polygon_drop():
    # traverse semantics (PolygonQuickClip.hs:30,39): one dead ring
    # kills the whole polygon
    inside = np.array([(10, 10), (20, 10), (20, 20), (10, 20), (10, 10)], dtype=float)
    outside = np.array([(900, 900), (910, 900), (910, 910), (900, 910), (900, 900)], dtype=float)
    w = (0.0, 0.0, 100.0, 100.0)
    assert c.clip_polygon_qc(w, [inside]) is not None
    assert c.clip_polygon_qc(w, [inside, outside]) is None


def test_polygon_quickclip_inside_unchanged_content():
    ring = np.array([(10, 10), (20, 10), (20, 20), (10, 20), (10, 10)], dtype=float)
    out = c.clip_polygon_qc((0.0, 0.0, 100.0, 100.0), [ring])
    assert out is not None and len(out) == 1
    # fully-inside ring: lineToPointXY doubles every interior point
    # (endpoint pairs of adjacent segments) — faithful to the reference
    res = out[0]
    assert (res[0] == res[-1]).all()
    assert {tuple(p) for p in res} == {tuple(p) for p in ring}


def test_point_in_extent_closed_box():
    x = np.array([10.0, 60.0, 9.999, 60.001, 30.0])
    y = np.array([10.0, 60.0, 30.0, 30.0, 30.0])
    assert c.point_in_extent_mask(LINE_WINDOW, x, y).tolist() == [True, True, False, False, True]


def test_segment_to_line_helper():
    # ClipSpec.hs:205-208: [1,2,2,7,7,10,10,11] -> [1,2,7,10,11]
    segs = np.array([[1, 1, 2, 2], [2, 2, 7, 7], [7, 7, 10, 10], [10, 10, 11, 11]], dtype=float)
    out = c._segments_to_line(segs)
    assert out[:, 0].tolist() == [1, 2, 7, 10, 11]


# --- DouglasPeuckerSpec.hs ----------------------------------------------------

LINE_PTS2 = np.array([(24, 173), (26, 170), (24, 166), (27, 162), (37, 161), (45, 157),
                      (48, 152), (46, 143), (40, 140), (34, 137), (26, 134), (24, 130),
                      (24, 125), (28, 121), (36, 118), (46, 117), (63, 121), (76, 125),
                      (82, 120), (86, 111), (88, 103), (90, 91), (95, 87), (107, 89),
                      (107, 104), (106, 117), (109, 129), (119, 131), (131, 131),
                      (139, 134), (138, 143), (131, 152), (119, 154), (111, 149),
                      (105, 143), (91, 139), (80, 142), (81, 152), (76, 163), (67, 161),
                      (59, 149), (63, 138)], dtype=float)


def test_dp_eps1():
    pts = np.array([(0, 0), (10, 1), (20, -1), (30, 50), (40, 60), (50, 70),
                    (60, 81), (70, 90), (80, 90), (90, 90)], dtype=float)
    exp = [[0, 0], [10, 1], [20, -1], [30, 50], [70, 90], [90, 90]]
    assert s.douglas_peucker(1.0, pts).tolist() == exp


def test_dp_eps10():
    exp = [[24, 173], [48, 152], [24, 125], [76, 125], [95, 87], [107, 89],
           [109, 129], [139, 134], [119, 154], [80, 142], [76, 163], [63, 138]]
    assert s.douglas_peucker(10.0, LINE_PTS2).tolist() == exp


def test_dp_eps20():
    exp = [[24, 173], [48, 152], [24, 125], [76, 125], [95, 87], [139, 134],
           [76, 163], [63, 138]]
    assert s.douglas_peucker(20.0, LINE_PTS2).tolist() == exp


# --- WindingOrderSpec.hs ------------------------------------------------------

SIMPLE = np.array([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype=float)
NEG = np.array([(3, 4), (5, 11), (12, 8), (9, 5), (5, 6), (3, 4)], dtype=float)
BIG = np.array([(3186, 2048), (3186, 2037), (3197, 2037), (3197, 2048), (3186, 2048)], dtype=float)


def test_surveyor_goldens():
    assert s.surveyor(SIMPLE) == 16
    assert s.surveyor(NEG) == -30
    assert s.surveyor(BIG) == 121


def test_is_clockwise():
    assert not s.is_clockwise(SIMPLE)
    assert s.is_clockwise(NEG)
    assert not s.is_clockwise(BIG)


def test_rewind_goldens():
    assert s.rewind(SIMPLE).tolist() == [[0, 0], [0, 4], [4, 4], [4, 0], [0, 0]]
    assert s.rewind(NEG).tolist() == [[3, 4], [5, 6], [9, 5], [12, 8], [5, 11], [3, 4]]
    assert s.rewind(BIG).tolist() == [[3186, 2048], [3197, 2048], [3197, 2037], [3186, 2037], [3186, 2048]]


def test_ensure_order():
    assert s.ensure_order(s.CLOCKWISE, SIMPLE).tolist() == s.rewind(SIMPLE).tolist()
    assert s.ensure_order(s.ANTICLOCKWISE, BIG).tolist() == BIG.tolist()


# --- GeoJsonFeatures / MvtFeatures goldens ------------------------------------

def test_coords_to_ipoints_half_even():
    # coordsToPoints uses Haskell round = half-even (GeoJsonFeatures.hs:99-103)
    pts = np.array([(0.5, 1.5), (2.5, 3.5), (-0.5, -1.5)])
    assert mvt.coords_to_ipoints(pts).tolist() == [[0, 2], [2, 4], [0, -2]]


def test_remove_next_duplicate():
    pts = np.array([[2, 2], [2, 10], [2, 10], [3, 3], [2, 2]])
    assert mvt.remove_next_duplicate(pts).tolist() == [[2, 2], [2, 10], [3, 3], [2, 2]]


def test_convert_props():
    # MvtFeaturesSpec.hs:21-27: Number -> Do, String -> St, Bool -> B
    out = mvt.convert_props({"key1": 1.0, "key2": "string", "key3": True,
                             "key4": None, "key5": [1], "key6": {"a": 1}})
    assert out == {"key1": ("do", 1.0), "key2": ("st", "string"), "key3": ("b", True)}


def test_zig():
    assert int(mvt.zig(np.array([0]))[0]) == 0
    assert int(mvt.zig(np.array([-1]))[0]) == 1
    assert int(mvt.zig(np.array([1]))[0]) == 2
    assert int(mvt.zig(np.array([-2]))[0]) == 3
    assert mvt.unzig(1) == -1
    assert mvt.unzig(2) == 1
    for n in (-12345, 0, 7, 4096):
        assert mvt.unzig(int(mvt.zig(np.array([n]))[0])) == n


def test_int_surveyor_interior_detection():
    ring = np.array([[0, 0], [0, 4], [4, 4], [4, 0], [0, 0]])  # CW in y-down? sign check
    a = mvt.int_surveyor(ring)
    assert a is not None
    ring_rev = ring[::-1]
    assert mvt.int_surveyor(ring_rev) == -a
