"""Ports of the remaining mvt-fixtures semantics the reference asserts
(MapnikVectorTileSpec.hs; the fixture .mvt bytes are a submodule not
vendored in /root/reference, so the tiles are reconstructed with OUR
encoder and asserted against the spec's expected decodes):

* 043 (MapnikVectorTileSpec.hs:213-230): six points sharing one key
  ("poi") with six unique values — dictionary sharing across features.
* 053-056 (:265-304): clipped-square polygons at exact extent / +-1 /
  +200 buffer — negative and beyond-extent coordinates round-trip, and
  the clip window itself produces those squares from an oversized ring.
"""

import numpy as np

from zellige_spark.kernel import clip as kclip
from zellige_spark.kernel import mvt


def test_fixture_043_shared_key_unique_values():
    expected_points = [(25, 17), (26, 19), (27, 15), (60, 10), (44, 20), (23, 49)]
    expected_poi = ["swing", "water_fountain", "slide", "bathroom", "tree", "bench"]
    keys = mvt.DictStore()
    values = mvt.DictStore()
    feats = []
    for i, (pt, poi) in enumerate(zip(expected_points, expected_poi), start=1):
        tags = mvt.build_tags({"poi": ("st", poi)}, keys, values)
        cmds = mvt.point_feature_commands(np.array([pt], dtype=np.int64))
        feats.append(mvt.encode_feature(i, tags, mvt.GEOM_POINT, cmds))
    layer = mvt.encode_layer("park_features", feats, keys.items, values.items, 4096)
    tile = mvt.decode_tile(mvt.encode_tile([layer]))

    lyr = tile["park_features"]
    assert lyr["version"] == 2 and len(lyr["features"]) == 6
    assert lyr["keys"] == ["poi"]          # ONE shared key
    assert len(lyr["values"]) == 6         # six unique values
    for f, pt, poi in zip(lyr["features"], expected_points, expected_poi):
        assert f["type"] == mvt.GEOM_POINT
        assert f["geometry"] == [pt]
        assert f["metadata"] == {"poi": ("st", poi)}


CLIPPED_SQUARES = [
    # (fixture, buffer units, lo, hi, type property)
    ("053", 0, 0, 4096, "exact extent"),
    ("054", 1, -1, 4097, "one unit buffer"),
    ("055", -1, 1, 4095, "almost a clipped-square minus one unit"),
    ("056", 200, -200, 4296, "large 200 unit buffer"),
]


def _square_ring(lo, hi):
    return [(lo, lo), (hi, lo), (hi, hi), (lo, hi), (lo, lo)]


def test_fixtures_053_056_clipped_square_roundtrip():
    for fixture, _buf, lo, hi, type_prop in CLIPPED_SQUARES:
        ring = np.array(_square_ring(lo, hi), dtype=np.int64)
        keys = mvt.DictStore()
        values = mvt.DictStore()
        tags = mvt.build_tags({"type": ("st", type_prop)}, keys, values)
        cmds = mvt.polygon_feature_commands([(ring, [])])
        feat = mvt.encode_feature(1, tags, mvt.GEOM_POLYGON, cmds)
        layer = mvt.encode_layer("clipped-square", [feat], keys.items,
                                 values.items, 4096)
        tile = mvt.decode_tile(mvt.encode_tile([layer]))
        lyr = tile["clipped-square"]
        assert len(lyr["features"]) == 1, fixture
        f = lyr["features"][0]
        assert f["type"] == mvt.GEOM_POLYGON
        outer, inners = f["geometry"][0]
        assert outer == _square_ring(lo, hi), fixture  # incl. re-closure
        assert inners == []
        assert f["metadata"] == {"type": ("st", type_prop)}


def test_layer_unknown_fields_roundtrip():
    """Foreign layer fields survive decode -> re-encode
    (VectorTile/Types.hs:23-35 `unknowns` passthrough)."""
    cmds = mvt.point_feature_commands(np.array([[3, 4]], dtype=np.int64))
    feat = mvt.encode_feature(1, [], mvt.GEOM_POINT, cmds)
    layer = mvt.encode_layer("hello", [feat], [], [], 4096)
    foreign = bytes([9 << 3 | 0]) + b"\x2a" + bytes([8 << 3 | 2, 2]) + b"xy"
    tile = mvt.encode_tile([layer + foreign])
    lyr = mvt.decode_tile(tile)["hello"]
    assert lyr["unknowns"] == foreign
    re = mvt.encode_layer(lyr["name"], [feat], lyr["keys"], lyr["values"],
                          lyr["extent"], lyr["version"], lyr["unknowns"])
    assert re == layer + foreign  # byte-preserving re-encode
    lyr2 = mvt.decode_tile(mvt.encode_tile([re]))["hello"]
    assert lyr2["unknowns"] == foreign


def test_clip_window_produces_the_square(extent=4096):
    """The encode-side half of 053/054/056: a polygon far larger than
    the tile clips to EXACTLY the buffered window square."""
    for fixture, buf, lo, hi, _ in CLIPPED_SQUARES:
        if buf < 0:  # 055's ring is inside every window; not a clip case
            continue
        window = kclip.buffered_bbox(buf, extent)
        giant = np.array([(-100000.0, -100000.0), (100000.0, -100000.0),
                          (100000.0, 100000.0), (-100000.0, 100000.0),
                          (-100000.0, -100000.0)])
        rings = kclip.clip_polygon_sh(window, [giant])
        assert rings is not None and len(rings) == 1, fixture
        got = {tuple(p) for p in np.asarray(rings[0]).tolist()}
        assert got == {(lo, lo), (hi, lo), (hi, hi), (lo, hi)}, fixture
