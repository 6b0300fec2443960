"""Ports of the remaining mvt-fixtures semantics: 002, 004-015,
044-045, 047-052, 057-058 (MapnikVectorTileSpec.hs:35-78, :232-265,
:305-310).  As in test_mvt_fixtures_port2.py the fixture binaries are a
git submodule not vendored in /root/reference, so each malformed tile
is reconstructed with raw protobuf field writers and the decode is
asserted against the spec's expected outcome.

Error-string notes: where the reference surfaces its Haskell protobuf
library's message verbatim (006 "Bad wireGet of Enum GeomType", 007/
008/010/013 "Unknown field found or failure parsing field", 045/052
"MoveTo Requires 2 Paramters") this decoder raises its own equivalent
MvtError for the same malformed input; the test matches the shared
semantic fragment.  Divergence: the reference *accepts* fixtures
051/057/058 (gigantic command counts) because its lazy decoder never
forces the phantom coordinates; this decoder validates counts eagerly
and errors — the property the fixtures exist to pin (no memory
over-allocation on hostile counts) is asserted either way.
"""

import numpy as np
import pytest

from zellige_spark.kernel import mvt

POINT_CMDS = mvt.point_feature_commands(np.array([(25, 17)], dtype=np.int64))


def _tile_of_layer_payload(payload: bytes) -> bytes:
    return mvt.encode_tile([payload])


def _plain_layer(feats, keys=(), values=(), name=b"hello",
                 with_version=True, extent=4096) -> bytes:
    out = b""
    if with_version:
        out += mvt._tag(15, 0) + mvt.varint(2)
    out += mvt._len_delim(1, name)
    for f in feats:
        out += mvt._len_delim(2, f)
    for k in keys:
        out += mvt._len_delim(3, k)
    for v in values:
        out += mvt._len_delim(4, v)
    out += mvt._tag(5, 0) + mvt.varint(extent)
    return out


def _feature(fid=None, gtype=mvt.GEOM_POINT, geom=POINT_CMDS, tags=None) -> bytes:
    out = b""
    if fid is not None:
        out += mvt._tag(1, 0) + mvt.varint(fid)
    if tags is not None:
        out += mvt._len_delim(2, mvt.varint_array(np.asarray(tags, dtype=np.uint64)))
    if gtype is not None:
        out += mvt._tag(3, 0) + mvt.varint(gtype)
    if geom is not None:
        out += mvt._len_delim(4, mvt.varint_array(np.asarray(geom, dtype=np.uint64)))
    return out


def test_fixture_002_point_without_id():
    # checkLayer: decodes fine; id falls back to the proto default 0
    tile = _tile_of_layer_payload(_plain_layer([_feature(fid=None)]))
    lyr = mvt.decode_tile(tile)["hello"]
    assert lyr["version"] == 2 and lyr["extent"] == 4096
    assert len(lyr["features"]) == 1
    f = lyr["features"][0]
    assert f["id"] == 0
    assert f["geometry"] == [(25, 17)]


def test_fixture_004_missing_geometry():
    tile = _tile_of_layer_payload(_plain_layer([_feature(fid=1, geom=None)]))
    with pytest.raises(mvt.MvtError, match="No points given!"):
        mvt.decode_tile(tile)


def test_fixture_005_broken_tags_array():
    tile = _tile_of_layer_payload(_plain_layer(
        [_feature(fid=1, tags=[0])], keys=[b"k"],
        values=[mvt._len_delim(1, b"v")]))
    with pytest.raises(mvt.MvtError, match="Uneven number of parameters given."):
        mvt.decode_tile(tile)


def test_fixture_006_invalid_geomtype_8():
    tile = _tile_of_layer_payload(_plain_layer([_feature(fid=1, gtype=8)]))
    with pytest.raises(mvt.MvtError, match="8"):
        mvt.decode_tile(tile)


def test_fixture_007_version_as_string():
    payload = (mvt._len_delim(15, b"2") + mvt._len_delim(1, b"hello")
               + mvt._len_delim(2, _feature(fid=1))
               + mvt._tag(5, 0) + mvt.varint(4096))
    with pytest.raises(mvt.MvtError, match="failure parsing field"):
        mvt.decode_tile(_tile_of_layer_payload(payload))


def test_fixture_008_extent_as_string():
    payload = (mvt._tag(15, 0) + mvt.varint(2) + mvt._len_delim(1, b"hello")
               + mvt._len_delim(2, _feature(fid=1))
               + mvt._len_delim(5, b"4096"))
    with pytest.raises(mvt.MvtError, match="failure parsing field"):
        mvt.decode_tile(_tile_of_layer_payload(payload))


def test_fixture_009_extent_missing_defaults_4096():
    payload = (mvt._tag(15, 0) + mvt.varint(2) + mvt._len_delim(1, b"hello")
               + mvt._len_delim(2, _feature(fid=1)))
    lyr = mvt.decode_tile(_tile_of_layer_payload(payload))["hello"]
    assert lyr["extent"] == 4096
    assert len(lyr["features"]) == 1


def test_fixture_010_value_int_pretending_string():
    bad_value = mvt._tag(1, 0) + mvt.varint(5)  # field 1 (string) wire 0
    tile = _tile_of_layer_payload(_plain_layer(
        [_feature(fid=1, tags=[0, 0])], keys=[b"k"], values=[bad_value]))
    with pytest.raises(mvt.MvtError, match="failure parsing field"):
        mvt.decode_tile(tile)


def test_fixture_011_value_unknown_type():
    alien_value = mvt._tag(9, 0) + mvt.varint(5)  # no legal one-of field
    tile = _tile_of_layer_payload(_plain_layer(
        [_feature(fid=1, tags=[0, 0])], keys=[b"k"], values=[alien_value]))
    with pytest.raises(mvt.MvtError,
                       match="Value decode: No legal Value type offered"):
        mvt.decode_tile(tile)


def test_fixture_012_unknown_layer_version_accepted():
    # spec: decodes, HashMap size 1 (version validation is the
    # caller's concern, not the wire decoder's)
    payload = (mvt._tag(15, 0) + mvt.varint(99) + mvt._len_delim(1, b"hello")
               + mvt._len_delim(2, _feature(fid=1)))
    layers = mvt.decode_tile(_tile_of_layer_payload(payload))
    assert len(layers) == 1
    assert layers["hello"]["version"] == 99


def test_fixture_013_key_as_int():
    payload = (mvt._tag(15, 0) + mvt.varint(2) + mvt._len_delim(1, b"hello")
               + mvt._len_delim(2, _feature(fid=1))
               + mvt._tag(3, 0) + mvt.varint(7))  # key with varint wire
    with pytest.raises(mvt.MvtError, match="failure parsing field"):
        mvt.decode_tile(_tile_of_layer_payload(payload))


def test_fixture_014_layer_without_name():
    payload = (mvt._tag(15, 0) + mvt.varint(2)
               + mvt._len_delim(2, _feature(fid=1)))
    with pytest.raises(mvt.MvtError,
                       match="Required fields missing when processing ProtoName"):
        mvt.decode_tile(_tile_of_layer_payload(payload))


def test_fixture_015_duplicate_layer_names():
    layer = _plain_layer([_feature(fid=1)])
    with pytest.raises(mvt.MvtError, match=r"Duplicate layer name \[hello\]"):
        mvt.decode_tile(mvt.encode_tile([layer, layer]))


def test_fixture_044_geometry_starts_with_closepath():
    ints = [mvt._cmd_int(7, 1)]  # ClosePath first, in a linestring
    tile = _tile_of_layer_payload(_plain_layer(
        [_feature(fid=1, gtype=mvt.GEOM_LINESTRING,
                  geom=np.array(ints, dtype=np.uint64))]))
    with pytest.raises(mvt.MvtError, match="Invalid command sequence"):
        mvt.decode_tile(tile)


@pytest.mark.parametrize("gtype", [mvt.GEOM_POINT, mvt.GEOM_LINESTRING],
                         ids=["045-point", "052-multipoint"])
def test_fixtures_045_052_half_coordinate_moveto(gtype):
    # MoveTo claiming 1 pair but carrying only an x: the reference says
    # "MoveTo Requires 2 Paramters"; here the same defect is caught as
    # an uneven parameter count
    ints = [mvt._cmd_int(1, 1), int(mvt.zig(np.array([5]))[0])]
    tile = _tile_of_layer_payload(_plain_layer(
        [_feature(fid=1, gtype=gtype, geom=np.array(ints, dtype=np.uint64))]))
    with pytest.raises(mvt.MvtError, match="Uneven number of parameters given."):
        mvt.decode_tile(tile)


@pytest.mark.parametrize("count", [2, 0], ids=["047-count-2", "048-count-0"])
def test_fixtures_047_048_closepath_parameter_count(count):
    ring = np.array([(0, 0), (4, 0), (4, 4), (0, 0)], dtype=np.int64)
    good = mvt.polygon_feature_commands([(ring, [])])
    # rewrite the trailing ClosePath(1) with the malformed count
    ints = list(good[:-1]) + [mvt._cmd_int(7, count)]
    tile = _tile_of_layer_payload(_plain_layer(
        [_feature(fid=1, gtype=mvt.GEOM_POLYGON,
                  geom=np.array(ints, dtype=np.uint64))]))
    with pytest.raises(mvt.MvtError,
                       match=f"ClosePath was given a parameter count: {count}"):
        mvt.decode_tile(tile)


@pytest.mark.parametrize("gtype,cmd", [(mvt.GEOM_POINT, 1),
                                       (mvt.GEOM_POINT, 1),
                                       (mvt.GEOM_LINESTRING, 2)],
                         ids=["051-huge-multipoint", "057-gigantic-moveto",
                              "058-gigantic-lineto"])
def test_fixtures_051_057_058_gigantic_command_counts(gtype, cmd):
    # a command integer claiming ~2^28 coordinate pairs backed by one
    # actual pair: the decoder must neither allocate for the claimed
    # count nor hang — it validates the real payload and errors in
    # O(payload) time/space.  (The reference's lazy decoder "just
    # passes" because nothing forces the phantom points; the fixtures'
    # stated purpose — no memory over-allocation — holds either way.)
    import resource
    import time

    huge = (1 << 28) - 1
    prefix = [] if cmd != 2 else [mvt._cmd_int(1, 1), 0, 0]
    ints = prefix + [mvt._cmd_int(cmd, huge), 2, 2]
    tile = _tile_of_layer_payload(_plain_layer(
        [_feature(fid=1, gtype=gtype, geom=np.array(ints, dtype=np.uint64))]))
    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.monotonic()
    with pytest.raises(mvt.MvtError, match="Uneven number of parameters given."):
        mvt.decode_tile(tile)
    assert time.monotonic() - t0 < 5.0
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert after - before < 256 * 1024  # KiB: no 2^28-pair allocation


def test_fixtures_049_050_int32_overflow_coordinates():
    # linestrings whose second point oversteps int32 in x / y: decoded
    # coordinates widen without wrapping
    for (p1, p2) in ([(2147483647, 0), (2147483648, 1)],
                     [(0, -2147483648), (-1, -2147483649)]):
        pts = np.array([p1, p2], dtype=np.int64)
        cmds = mvt.line_feature_commands([pts])
        tile = _tile_of_layer_payload(_plain_layer(
            [_feature(fid=1, gtype=mvt.GEOM_LINESTRING, geom=cmds)]))
        lyr = mvt.decode_tile(tile)["hello"]
        assert lyr["features"][0]["geometry"] == [[tuple(p1), tuple(p2)]]
