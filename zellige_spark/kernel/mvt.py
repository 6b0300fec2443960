"""Mapbox Vector Tile encoding/decoding kernel (pure numpy + stdlib).

Wire-level semantics are pinned against the reference's golden output
(/root/reference/dump/small.mvt, 369 bytes) and its encoder sources:

* zigzag: ``(n << 1) xor (n >> 63)`` arithmetic, truncated to uint32
  (/root/reference/src/Data/Geometry/VectorTile/Internal.hs:263-272).
* command integer: ``(id & 7) | (count << 3)``; ids 1=MoveTo 2=LineTo
  7=ClosePath with count 1 (Internal.hs:276-289).
* delta encoding relative to a running cursor that persists across the
  parts of one feature and resets per feature (Internal.hs:174-256).
* Point feature: single MoveTo with all point diffs (Internal.hs:174-180).
* LineString: per line MoveTo[1] ++ LineTo[n-1] (Internal.hs:199-204).
* Polygon: per ring drop the closing point then MoveTo[1] ++
  LineTo[n-2] ++ ClosePath, recursing into interior rings
  (Internal.hs:246-256).
* int conversion: half-even rounding (coordsToPoints,
  Types/GeoJsonFeatures.hs:99-103) + consecutive-duplicate removal
  (convertAndRemoveDupes, GeoJsonFeatures.hs:96-97).
* Layer wire field order — exactly as the golden bytes:
  version(f15) first, then name(f1), features(f2), keys(f3),
  values(f4), extent(f5).  Feature: id(f1), tags(f2 packed),
  type(f3), geometry(f4 packed).  Value one-of: string=f1, float=f2,
  double=f3, int=f4, uint=f5, sint=f6, bool=f7
  (generated code: .../Vector_tile/Tile/Layer.hs:53-61, Feature.hs:39-44,
  Value.hs:55-64; Tile: layers=f3).
* Dictionary order: per feature, properties iterate in sorted-key
  order; key/value tables are first-seen with dedup across features —
  this reproduces dump/small.mvt byte-for-byte (the reference batch
  path's HashSet order, Internal.hs:369-377, is not portable; the
  golden file pins sorted-key iteration).

Decoder (for tests / conformance only) reproduces the reference's
validation error strings (Internal.hs:174-244, Util.hs:22-28).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

MOVE_TO = 1
LINE_TO = 2
CLOSE_PATH = 7

GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3

# --- Val union -------------------------------------------------------------
# Values are ("st", str|bytes) | ("fl", float) | ("do", float) |
# ("i64"|"w64"|"s64", int) | ("b", bool) — mirroring VectorTile.Val
# (/root/reference/src/Data/Geometry/VectorTile/Types.hs:49-50).

Val = Tuple[str, Union[str, bytes, float, int, bool]]


def convert_props(props: Optional[dict]) -> Dict[str, Val]:
    """JSON-ish property dict -> Val map (convertProps/convertElems,
    /root/reference/src/Data/Geometry/Types/MvtFeatures.hs:45-53):
    str -> St, bool -> B, ANY number -> Do(double); None / list / dict
    silently dropped.
    """
    out: Dict[str, Val] = {}
    if not props:
        return out
    for k, v in props.items():
        if isinstance(v, bool):
            out[k] = ("b", v)
        elif isinstance(v, str):
            out[k] = ("st", v)
        elif isinstance(v, (int, float)):
            out[k] = ("do", float(v))
        # null / arrays / nested objects dropped (MvtFeatures.hs:53)
    return out


# --- int conversion --------------------------------------------------------

def coords_to_ipoints(pts: np.ndarray) -> np.ndarray:
    """Half-even round float coords to int64 (coordsToPoints,
    GeoJsonFeatures.hs:99-103; Haskell ``round`` == np.rint)."""
    return np.rint(np.asarray(pts, dtype=np.float64)).astype(np.int64).reshape(-1, 2)


def remove_next_duplicate(ipts: np.ndarray) -> np.ndarray:
    """Drop consecutive duplicate integer points (SeqHelper
    removeNextDuplicate via convertAndRemoveDupes, GeoJsonFeatures.hs:96-97)."""
    if len(ipts) == 0:
        return ipts
    d = np.ones(len(ipts), dtype=bool)
    d[1:] = (ipts[1:, 0] != ipts[:-1, 0]) | (ipts[1:, 1] != ipts[:-1, 1])
    return ipts[d]


def convert_and_remove_dupes(pts: np.ndarray) -> np.ndarray:
    return remove_next_duplicate(coords_to_ipoints(pts))


def int_surveyor(ring: np.ndarray) -> Optional[float]:
    """Shoelace on an integer ring INCLUDING its closing point; the
    closing point is stripped before the cyclic sum
    (VectorTile/Geometry.hs:33-44).  Negative => interior ring."""
    ring = np.asarray(ring)
    if len(ring) < 2:
        return None
    v = ring[:-1]
    if len(v) == 0:
        return None
    x = v[:, 0].astype(np.float64)
    y = v[:, 1].astype(np.float64)
    yn = np.roll(y, -1)
    yp = np.roll(y, 1)
    return float(np.sum(x * (yn - yp)) / 2.0)


# --- zigzag + commands -----------------------------------------------------

def zig(n: np.ndarray) -> np.ndarray:
    """Zigzag-encode int64 -> uint32 (Internal.hs:263-266)."""
    n = np.asarray(n, dtype=np.int64)
    return ((n << 1) ^ (n >> 63)).astype(np.uint64) & np.uint64(0xFFFFFFFF)


def unzig(n: int) -> int:
    """Inverse zigzag on a uint32 (Internal.hs:268-272): the unzigged
    value is truncated through int32."""
    u = (n >> 1) ^ (-(n & 1) & 0xFFFFFFFF)
    u &= 0xFFFFFFFF
    return u - 0x100000000 if u >= 0x80000000 else u


def _cmd_int(cmd: int, count: int) -> int:
    return (cmd & 7) | (count << 3)


def _deltas(ipts: np.ndarray, cursor: Tuple[int, int]) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Delta-encode points against a running cursor (collapse,
    Internal.hs:408-416); returns (deltas (n,2), new cursor)."""
    if len(ipts) == 0:
        return ipts, cursor
    prev = np.concatenate([np.array([cursor], dtype=np.int64), ipts[:-1]], axis=0)
    return ipts - prev, (int(ipts[-1, 0]), int(ipts[-1, 1]))


def point_feature_commands(ipts: np.ndarray) -> np.ndarray:
    """toCommands @Point (Internal.hs:174-180): one MoveTo with all diffs."""
    deltas, _ = _deltas(ipts, (0, 0))
    z = zig(deltas.reshape(-1))
    return np.concatenate([[np.uint64(_cmd_int(MOVE_TO, len(ipts)))], z]).astype(np.uint64)


def line_feature_commands(lines: Sequence[np.ndarray]) -> np.ndarray:
    """toCommands @LineString (Internal.hs:199-204): cursor threads across
    the feature's lines; per line MoveTo[1] ++ LineTo[n-1]."""
    cursor = (0, 0)
    parts: List[np.ndarray] = []
    for ipts in lines:
        if len(ipts) == 0:
            continue
        deltas, cursor = _deltas(ipts, cursor)
        z = zig(deltas.reshape(-1))
        parts.append(np.concatenate([
            [np.uint64(_cmd_int(MOVE_TO, 1))], z[:2],
            [np.uint64(_cmd_int(LINE_TO, len(ipts) - 1))], z[2:],
        ]).astype(np.uint64))
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(parts)


def polygon_feature_commands(polys: Sequence[Tuple[np.ndarray, Sequence]]) -> np.ndarray:
    """toCommands @Polygon (Internal.hs:246-256).

    ``polys`` is a sequence of (outer_ring_closed_ipts, inner_polys)
    where inner_polys is itself a sequence of the same shape.  The
    closing point of each ring is dropped before encoding; cursor
    threads across rings and nested polygons of the feature.
    """
    cursor = (0, 0)
    parts: List[np.ndarray] = []

    def rec(poly: Tuple[np.ndarray, Sequence]) -> None:
        nonlocal cursor
        ring, inner = poly
        ring = np.asarray(ring, dtype=np.int64).reshape(-1, 2)
        if len(ring) >= 1:
            p = ring[:-1]  # exclude the closing point (Internal.hs:248)
            if len(p) >= 1:
                deltas, new_cursor = _deltas(p, cursor)
                cursor = new_cursor
                z = zig(deltas.reshape(-1))
                parts.append(np.concatenate([
                    [np.uint64(_cmd_int(MOVE_TO, 1))], z[:2],
                    [np.uint64(_cmd_int(LINE_TO, len(p) - 1))], z[2:],
                    [np.uint64(_cmd_int(CLOSE_PATH, 1))],
                ]).astype(np.uint64))
        for ip in inner:
            rec(ip)

    for poly in polys:
        rec(poly)
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(parts)


# --- varint / protobuf writer ----------------------------------------------

def varint_array(values: np.ndarray) -> bytes:
    """Vectorized base-128 varint encoding of a uint64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b""
    # up to 10 bytes for uint64 (we only see uint32-ish values: 5)
    nbytes = 10
    shifts = (np.uint64(7) * np.arange(nbytes, dtype=np.uint64))[None, :]
    chunks = (v[:, None] >> shifts) & np.uint64(0x7F)
    # number of significant 7-bit groups per value (at least 1)
    sig = np.maximum(
        nbytes - ((chunks[:, ::-1] != 0).argmax(axis=1)), 1
    )
    sig = np.where((v == 0), 1, sig)
    idx = np.arange(nbytes)[None, :]
    used = idx < sig[:, None]
    cont = idx < (sig - 1)[:, None]
    out = (chunks | (np.uint64(0x80) * cont)).astype(np.uint8)
    return out[used].tobytes()


def varint(n: int) -> bytes:
    out = bytearray()
    n &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + varint(len(payload)) + payload


def encode_value(val: Val) -> bytes:
    """Value message (one-of); field numbers per Value.hs:55-64."""
    kind, v = val
    if kind == "st":
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        return _len_delim(1, b)
    if kind == "fl":
        return _tag(2, 5) + struct.pack("<f", float(v))
    if kind == "do":
        return _tag(3, 1) + struct.pack("<d", float(v))
    if kind == "i64":
        return _tag(4, 0) + varint(int(v) & 0xFFFFFFFFFFFFFFFF)
    if kind == "w64":
        return _tag(5, 0) + varint(int(v))
    if kind == "s64":
        n = int(v)
        return _tag(6, 0) + varint(((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF)
    if kind == "b":
        return _tag(7, 0) + varint(1 if v else 0)
    raise ValueError(f"unknown Val kind {kind!r}")


def encode_feature(fid: int, tags: Sequence[int], geom_type: int, geometry: np.ndarray) -> bytes:
    """Feature message: id(f1) always written (unfeats sets Just id,
    Internal.hs:386-390), tags(f2, packed, omitted when empty),
    type(f3), geometry(f4, packed)."""
    out = bytearray()
    out += _tag(1, 0) + varint(int(fid))
    if len(tags):
        out += _len_delim(2, varint_array(np.asarray(tags, dtype=np.uint64)))
    out += _tag(3, 0) + varint(geom_type)
    out += _len_delim(4, varint_array(np.asarray(geometry, dtype=np.uint64)))
    return bytes(out)


def encode_layer(name: str, features: Sequence[bytes], keys: Sequence[str],
                 values: Sequence[Val], extent: int, version: int = 2,
                 unknowns: bytes = b"") -> bytes:
    """Layer message in the golden wire order: version, name, features,
    keys, values, extent (matches /root/reference/dump/small.mvt).
    ``unknowns`` re-emits foreign fields preserved by the decoder
    (VectorTile/Types.hs:23-35 ``unknowns`` passthrough), appended after
    the known fields."""
    out = bytearray()
    out += _tag(15, 0) + varint(version)
    out += _len_delim(1, name.encode("utf-8"))
    for f in features:
        out += _len_delim(2, f)
    for k in keys:
        out += _len_delim(3, k.encode("utf-8"))
    for v in values:
        out += _len_delim(4, encode_value(v))
    out += _tag(5, 0) + varint(extent)
    out += unknowns
    return bytes(out)


def encode_tile(layers: Sequence[bytes]) -> bytes:
    out = bytearray()
    for layer in layers:
        out += _len_delim(3, layer)
    return bytes(out)


# --- dictionary builder ------------------------------------------------------

class DictStore:
    """First-seen key/value dictionaries with dedup (KeyStore/ValueStore +
    addKeyValue, MvtFeatures.hs:59-88)."""

    def __init__(self) -> None:
        self.index: Dict = {}
        self.items: List = []

    def add(self, item) -> int:
        ix = self.index.get(item)
        if ix is None:
            ix = len(self.items)
            self.index[item] = ix
            self.items.append(item)
        return ix


def build_tags(props: Dict[str, Val], keys: DictStore, values: DictStore) -> List[int]:
    """Flatten (key_idx, value_idx) pairs iterating props in sorted-key
    order (pins the golden small.mvt byte order; see module docstring)."""
    tags: List[int] = []
    for k in sorted(props):
        tags.append(keys.add(k))
        tags.append(values.add(props[k]))
    return tags


# --- decoder (test oracle) ---------------------------------------------------

class MvtError(Exception):
    pass


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _scan_fields(buf: bytes):
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
            yield field, wire, v
        elif wire == 1:
            yield field, wire, buf[i:i + 8]
            i += 8
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            yield field, wire, buf[i:i + ln]
            i += ln
        elif wire == 5:
            yield field, wire, buf[i:i + 4]
            i += 4
        else:
            raise MvtError(f"unsupported wire type {wire}")


def _packed_varints(payload: bytes) -> List[int]:
    out = []
    i = 0
    while i < len(payload):
        v, i = _read_varint(payload, i)
        out.append(v)
    return out


#: expected protobuf wire type per Value one-of field (string=2,
#: float=5, double=1, int/uint/sint/bool=0) — a known field arriving
#: with the wrong wire type is malformed (mvt-fixture 010: an int
#: pretending to be a string must NOT silently decode)
_VALUE_WIRES = {1: 2, 2: 5, 3: 1, 4: 0, 5: 0, 6: 0, 7: 0}


def decode_value(payload: bytes) -> Val:
    for field, wire, v in _scan_fields(payload):
        if field in _VALUE_WIRES and wire != _VALUE_WIRES[field]:
            raise MvtError(
                f"Unknown field found or failure parsing field {field} in Value")
        if field == 1:
            return ("st", v.decode("utf-8"))
        if field == 2:
            return ("fl", struct.unpack("<f", v)[0])
        if field == 3:
            return ("do", struct.unpack("<d", v)[0])
        if field == 4:
            return ("i64", v - 0x10000000000000000 if v >= 0x8000000000000000 else v)
        if field == 5:
            return ("w64", v)
        if field == 6:
            return ("s64", (v >> 1) ^ -(v & 1))
        if field == 7:
            return ("b", bool(v))
    raise MvtError("Value decode: No legal Value type offered")


def parse_commands(ints: List[int]):
    """Command integers -> [(cmd, [(dx,dy)...])] with the reference's
    validation errors (commands/unsafeParseCmd, Internal.hs:276-309)."""
    out = []
    i = 0
    while i < len(ints):
        n = ints[i]
        i += 1
        cmd = n & 7
        count = n >> 3
        if cmd in (MOVE_TO, LINE_TO):
            params = ints[i:i + count * 2]
            i += count * 2
            if len(params) % 2 != 0 or len(params) != count * 2:
                raise MvtError("Uneven number of parameters given.")
            pts = [(unzig(params[j]), unzig(params[j + 1])) for j in range(0, len(params), 2)]
            out.append((cmd, pts))
        elif cmd == CLOSE_PATH:
            if count != 1:
                raise MvtError(f"ClosePath was given a parameter count: {count}")
            out.append((CLOSE_PATH, []))
        else:
            raise MvtError(f"Invalid command integer {cmd} found in: {n:X}")
    return out


def _expand(cursor: Tuple[int, int], diffs: List[Tuple[int, int]]) -> List[Tuple[int, int]]:
    """expand (Internal.hs:401-406): accumulate diffs onto the cursor,
    dropping zero-diff repeats except in first position."""
    out = []
    x, y = cursor
    for i, (dx, dy) in enumerate(diffs):
        if i != 0 and dx == 0 and dy == 0:
            continue
        x += dx
        y += dy
        out.append((x, y))
    return out


def decode_geometry(geom_type: int, ints: List[int]):
    """Decode command ints into point/line/polygon structures with the
    reference validation semantics (Internal.hs:174-244)."""
    if geom_type == 0:
        # GeomType.UNKNOWN is VALID (mvt-fixture 016): the reference
        # keeps such features in a dedicated _unknowns seq, counts them
        # in numberOfFeatures, and never parses their commands
        # (VectorTile/Types.hs:28,37-38; Internal.hs:168-169 maps any
        # command list to a unit marker).  Geometry decodes to None.
        return None
    cmds = parse_commands(ints)
    if geom_type == GEOM_POINT:
        if not cmds:
            raise MvtError("No points given!")
        if len(cmds) != 1 or cmds[0][0] != MOVE_TO:
            raise MvtError(f"Invalid command found in Point feature: {cmds[0]}")
        return _expand((0, 0), cmds[0][1])
    if geom_type == GEOM_LINESTRING:
        cursor = (0, 0)
        lines = []
        i = 0
        while i < len(cmds):
            if (i + 1 < len(cmds) and cmds[i][0] == MOVE_TO and len(cmds[i][1]) >= 1
                    and cmds[i + 1][0] == LINE_TO):
                pts = _expand(cursor, [cmds[i][1][0]] + cmds[i + 1][1])
                if pts:
                    cursor = pts[-1]
                lines.append(pts)
                i += 2
            else:
                raise MvtError("LineString decode: Invalid command sequence given.")
        return lines
    if geom_type == GEOM_POLYGON:
        cursor = (0, 0)
        rings = []
        i = 0
        while i < len(cmds):
            if (i + 2 < len(cmds) and cmds[i][0] == MOVE_TO and cmds[i + 1][0] == LINE_TO
                    and cmds[i + 2][0] == CLOSE_PATH):
                if not cmds[i][1]:
                    break
                pts = _expand(cursor, [cmds[i][1][0]] + cmds[i + 1][1])
                if pts:
                    cursor = pts[-1]
                    rings.append(pts + [pts[0]])  # re-close in memory (Internal.hs:232)
                i += 3
            else:
                raise MvtError(f"Polygon decode: Invalid command sequence given: {cmds}")
        # regroup interior rings by non-positive shoelace area (Internal.hs:237-244)
        polys = []
        j = 0
        while j < len(rings):
            outer = rings[j]
            inner = []
            j += 1
            while j < len(rings):
                a = int_surveyor(np.asarray(rings[j]))
                if a is not None and a > 0:
                    break
                inner.append((rings[j], []))
                j += 1
            polys.append((outer, inner))
        return polys
    raise MvtError(f"unknown geom type {geom_type}")


def _reencode_field(field: int, wire: int, v) -> bytes:
    """Raw wire bytes of one scanned field (for unknowns passthrough)."""
    if wire == 0:
        return _tag(field, 0) + varint(v)
    if wire == 2:
        return _len_delim(field, bytes(v))
    return _tag(field, wire) + bytes(v)  # fixed64 / fixed32 payloads


def decode_layer(payload: bytes) -> dict:
    version = None  # required proto2 field (fixture 024 errors when absent)
    name = None     # required proto2 field (fixture 023 errors when absent)
    extent = 4096
    keys: List[str] = []
    values: List[Val] = []
    raw_features = []
    unknowns = bytearray()
    # known layer fields must arrive with their declared wire type
    # (mvt-fixtures 007/008/013: version/extent/key encoded as the
    # wrong type must error, matching the reference's protobuf layer)
    layer_wires = {15: 0, 1: 2, 2: 2, 3: 2, 4: 2, 5: 0}
    for field, wire, v in _scan_fields(payload):
        if field in layer_wires and wire != layer_wires[field]:
            raise MvtError(
                f"Unknown field found or failure parsing field {field} in Layer")
        if field == 15:
            version = v
        elif field == 1:
            name = v.decode("utf-8")
        elif field == 2:
            raw_features.append(v)
        elif field == 3:
            keys.append(v.decode("utf-8"))
        elif field == 4:
            values.append(decode_value(v))
        elif field == 5:
            extent = v
        else:  # foreign field: preserve, don't drop (Types.hs:23-35)
            unknowns += _reencode_field(field, wire, v)
    if name is None or version is None:
        # layer name and version are proto2 REQUIRED fields — a tile
        # missing either is malformed (mvt-fixtures 023/024; the
        # reference surfaces its protobuf library's "Required fields
        # missing when processing ProtoName")
        raise MvtError("Required fields missing when processing ProtoName")
    features = []
    for raw in raw_features:
        fid = 0
        tags: List[int] = []
        gtype = None
        geom_ints: List[int] = []
        for field, wire, v in _scan_fields(raw):
            if field == 1:
                fid = v
            elif field == 2:
                tags = _packed_varints(v) if wire == 2 else tags + [v]
            elif field == 3:
                gtype = v
            elif field == 4:
                geom_ints = _packed_varints(v) if wire == 2 else geom_ints + [v]
        if gtype is None:
            # proto3 default: a missing type field reads as
            # GeomType.UNKNOWN (vector_tile.proto 2.1 L41; mvt-fixture
            # 003 decodes successfully).  The reference's "Missing
            # geometry type." branch (Internal.hs:354) is unreachable
            # for wire-level absence because its generated protobuf
            # code applies the same default.
            gtype = 0
        if len(tags) % 2 != 0:
            raise MvtError("Uneven number of parameters given.")
        meta = {keys[tags[i]]: values[tags[i + 1]] for i in range(0, len(tags), 2)}
        features.append({
            "id": fid,
            "metadata": meta,
            "type": gtype,
            "geometry": decode_geometry(gtype, geom_ints),
            "geometry_ints": geom_ints,
        })
    return {"version": version, "name": name, "extent": extent,
            "keys": keys, "values": values, "features": features,
            "unknowns": bytes(unknowns)}


def decode_tile(buf: bytes) -> Dict[str, dict]:
    layers: Dict[str, dict] = {}
    for field, wire, v in _scan_fields(buf):
        if field == 3:
            layer = decode_layer(v)
            if layer["name"] in layers:
                raise MvtError(f"Duplicate layer name [{layer['name']}]")
            layers[layer["name"]] = layer
    return layers
