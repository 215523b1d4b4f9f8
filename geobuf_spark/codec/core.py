"""Pure numpy geobuf codec — the numeric core of the engine.

Implements the delta-encoded varint protobuf feature format of
murphy214/geobuf from scratch in Python/numpy, matching the reference's
wire semantics (parity cites point at /root/reference):

- quantization ``int64(coord * 1e7)`` truncates toward zero
  (geobuf_raw/geom.go:173-179 ``ConvertPt``);
- zigzag ``(v << 1) ^ (v >> 63)`` (geom.go:182-184 ``paramEnc``);
- per-ring delta encoding, first vertex absolute (geom.go:204-246);
- decode accumulates ``sv/1e7`` then applies the reference's hand-rolled
  half-up-on-magnitude rounding (geom.go:78-90 ``round``), replicated
  exactly in :func:`go_round7`;
- feature field layout id/properties/geomtype/geometry/bbox
  (geobuf_raw/write_feature.go:192-263, read_feature.go:9-100);
- file framing ``0x0A + varint(len) + feature`` (writer.go:73-89).

Documented divergences from the reference (quirks we do NOT copy):
- property value field 6 (sint64) is zigzag-decoded here; the reference
  reads it as a plain uint64 (read_feature.go:43-44) which loses the value.
- Go map iteration randomizes property byte order (write_feature.go:212);
  we emit properties in insertion order, so our encoder is byte-stable.
- the reference's ``WritePackedUint64`` (write_primitives.go:71-198) caps
  varints at 8 bytes — identical to standard varints for all values
  < 2**56, which covers every legal coordinate delta; we use standard
  varints (up to 10 bytes), byte-identical on that domain.

Geometry model (columnar, Arrow-friendly):
    coords     flat float64 array, interleaved per vertex (x,y[,z,m...])
    ring_lens  vertices per ring (one entry for Point/LineString/MultiPoint)
    part_rings rings per part (MultiPolygon parts; [n_rings] otherwise)
    geom_type  1 Point, 2 LineString, 3 Polygon, 4 MultiPoint,
               5 MultiLineString, 6 MultiPolygon   (geom.go:59-76)
    dim        coordinate dimension 2..15 (geom.go:24-56)
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

POWER = 10.0**7
_U1 = np.uint64(1)
_U7 = np.uint64(7)
_U0x7F = np.uint64(0x7F)

GEOM_TYPES = {
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
}
GEOM_CODES = {v: k for k, v in GEOM_TYPES.items()}


# ---------------------------------------------------------------------------
# scalar primitives
# ---------------------------------------------------------------------------

def encode_varint(x: int) -> bytes:
    """Standard protobuf varint (pbf.EncodeVarint semantics, ≤10 bytes)."""
    x &= (1 << 64) - 1
    out = bytearray()
    while x > 127:
        out.append(0x80 | (x & 0x7F))
        x >>= 7
    out.append(x)
    return bytes(out)


def decode_varint(buf, pos: int) -> tuple[int, int]:
    """Read one varint starting at pos → (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        b = int(buf[pos])
        pos += 1
        result |= (b & 0x7F) << shift
        if b < 0x80:
            return result & ((1 << 64) - 1), pos
        shift += 7


def zigzag64(v: int) -> int:
    """paramEnc — geom.go:182-184."""
    return ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1)


def unzigzag64(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def convert_pt(c: float) -> int:
    """ConvertPt — geom.go:173-179: int64(c*1e7), Go truncation toward zero."""
    return int(c * POWER)  # python int() truncates toward zero like Go


def go_round7(x):
    """Exact replica of the reference's round(val, 0.5, 7) — geom.go:78-90.

    Go: digit = 1e7*val; _, frac = math.Modf(digit);
        frac >= 0.5 ? Ceil(digit) : Floor(digit); /1e7.
    Modf's frac carries digit's sign, so negative values always Floor
    (asymmetric on purpose — we must match it). Vectorized over ndarray.
    """
    digit = np.asarray(x, dtype=np.float64) * POWER
    frac = digit - np.trunc(digit)
    r = np.where(frac >= 0.5, np.ceil(digit), np.floor(digit))
    out = r / POWER
    return out if isinstance(x, np.ndarray) else float(out)


# ---------------------------------------------------------------------------
# vectorized varint packing (no per-value Python on coordinate paths)
# ---------------------------------------------------------------------------

def varint_lengths(v: np.ndarray) -> np.ndarray:
    """Byte length of each uint64's varint encoding (1..10)."""
    v = v.astype(np.uint64, copy=False)
    n = np.ones(v.shape, dtype=np.int64)
    x = v >> _U7
    while np.any(x):
        n += (x != 0).astype(np.int64)
        x >>= _U7
    return n


def pack_varints(v: np.ndarray) -> bytes:
    """Packed varint bytes of a uint64 vector (WritePackedUint64 semantics,
    write_primitives.go:71-198, sans the length prefix)."""
    v = np.ascontiguousarray(v, dtype=np.uint64)
    if v.size == 0:
        return b""
    lens = varint_lengths(v)
    maxlen = int(lens.max())
    # (N, maxlen) matrix of 7-bit groups with continuation bits
    j = np.arange(maxlen, dtype=np.uint64)
    groups = (v[:, None] >> (j[None, :] * _U7)) & _U0x7F
    cont = np.where(np.arange(maxlen)[None, :] < (lens - 1)[:, None], 0x80, 0)
    mat = (groups | cont.astype(np.uint64)).astype(np.uint8)
    mask = np.arange(maxlen)[None, :] < lens[:, None]
    return mat[mask].tobytes()  # row-major → sequential per-value bytes


def unpack_varints(buf: np.ndarray, start: int, end: int) -> np.ndarray:
    """Decode all packed varints in buf[start:end] → uint64 vector.

    Vectorized: find value boundaries (bytes < 0x80), then combine 7-bit
    groups with a segmented shift — no per-value Python loop.
    """
    seg = buf[start:end]
    if seg.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = seg < 0x80
    ends = np.flatnonzero(is_end)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    maxlen = int(lens.max())
    vals = np.zeros(len(ends), dtype=np.uint64)
    payload = (seg & 0x7F).astype(np.uint64)
    for j in range(maxlen):
        sel = lens > j
        vals[sel] |= payload[starts[sel] + j] << np.uint64(7 * j)
    return vals


def unzigzag_vec(u: np.ndarray) -> np.ndarray:
    return (u >> _U1).astype(np.int64) ^ -((u & _U1).astype(np.int64))


def zigzag_vec(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64, copy=False)
    return (v.astype(np.uint64) << _U1) ^ (v >> np.int64(63)).astype(np.uint64)


def quantize_vec(c: np.ndarray) -> np.ndarray:
    """ConvertPt vectorized — truncation toward zero (geom.go:173-179)."""
    return np.trunc(np.asarray(c, dtype=np.float64) * POWER).astype(np.int64)


# ---------------------------------------------------------------------------
# feature model
# ---------------------------------------------------------------------------

@dataclass
class Feature:
    """Columnar feature: flat coords + ring/part structure (§1.5 mapping)."""

    geom_type: int
    dim: int
    coords: np.ndarray  # flat float64, len = n_vertices * dim
    ring_lens: np.ndarray  # int64 vertices per ring
    part_rings: np.ndarray  # int64 rings per part
    id: int | None = None
    properties: dict = field(default_factory=dict)
    bbox: np.ndarray | None = None  # [w, s, e, n]

    def vertices(self) -> np.ndarray:
        return self.coords.reshape(-1, self.dim)

    def rings(self) -> list[np.ndarray]:
        out, off = [], 0
        for n in self.ring_lens:
            out.append(self.coords[off : off + n * self.dim].reshape(-1, self.dim))
            off += n * self.dim
        return out

    def to_geojson_coords(self):
        """Nested lists in GeoJSON shape for this geometry type."""
        rings = [r.tolist() for r in self.rings()]
        t = self.geom_type
        if t == 1:
            return rings[0][0]
        if t in (2, 4):
            return rings[0]
        if t in (3, 5):
            return rings
        # MultiPolygon: group rings by part_rings
        out, i = [], 0
        for nr in self.part_rings:
            out.append(rings[i : i + nr])
            i += nr
        return out

    @staticmethod
    def from_geojson(geom_type: str, coordinates, id=None, properties=None, dim=None):
        code = GEOM_CODES[geom_type]
        if code == 1:
            parts = [[np.asarray([coordinates], dtype=np.float64)]]
        elif code in (2, 4):
            parts = [[np.asarray(coordinates, dtype=np.float64)]]
        elif code in (3, 5):
            parts = [[np.asarray(r, dtype=np.float64) for r in coordinates]]
        else:
            parts = [[np.asarray(r, dtype=np.float64) for r in poly] for poly in coordinates]
        if dim is None:
            dim = parts[0][0].shape[1] if parts and parts[0] and parts[0][0].size else 2
        ring_lens = np.asarray([len(r) for p in parts for r in p], dtype=np.int64)
        part_rings = np.asarray([len(p) for p in parts], dtype=np.int64)
        if ring_lens.sum() == 0:
            coords = np.empty(0, dtype=np.float64)
        else:
            coords = np.concatenate([r.reshape(-1) for p in parts for r in p])
        return Feature(
            geom_type=code, dim=int(dim), coords=coords, ring_lens=ring_lens,
            part_rings=part_rings, id=id, properties=dict(properties or {}),
        )


def geom_bbox(feat: Feature) -> np.ndarray:
    """Get_BoundingBox — bb.go:10-163: [west, south, east, north] over all
    vertices (Point → degenerate box)."""
    v = feat.vertices()
    if v.size == 0:
        return np.array([0.0, 0.0, 0.0, 0.0])
    return np.array([v[:, 0].min(), v[:, 1].min(), v[:, 0].max(), v[:, 1].max()])


def merge_bboxes(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Push_Two_BoundingBoxs — bb.go:39-60: union of two [W,S,E,N] boxes."""
    return np.array([
        min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3])
    ])


def expand_bboxes(boxes) -> np.ndarray:
    """Expand_BoundingBoxs — bb.go:62-86: fold of merge_bboxes over a list."""
    boxes = [np.asarray(b, dtype=np.float64) for b in boxes]
    if not boxes:
        return np.array([0.0, 0.0, 0.0, 0.0])
    m = np.stack(boxes)
    return np.array([m[:, 0].min(), m[:, 1].min(), m[:, 2].max(), m[:, 3].max()])


def geometry_collection_bbox(feats) -> np.ndarray:
    """BoundingBox_GeometryCollection — bb.go:157-163: extent of a
    collection = fold of member-geometry bboxes."""
    return expand_bboxes([geom_bbox(f) for f in feats])


# ---------------------------------------------------------------------------
# property value variant (README.md:36-45; write_primitives.go:244-286)
# ---------------------------------------------------------------------------

def _write_value(value) -> bytes:
    if isinstance(value, bool):  # before int — bool is an int subclass
        return bytes([18, 2, 56, 1 if value else 0])
    if isinstance(value, str):
        sb = value.encode("utf-8")
        inner = bytes([10]) + encode_varint(len(sb)) + sb
        return bytes([18]) + encode_varint(len(inner)) + inner
    if isinstance(value, float):
        # FloatVal64 — write_primitives.go:228-240: little-endian float64
        return bytes([18, 9, 25]) + struct.pack("<d", value)
    if isinstance(value, int):
        if value >= 0:
            # signed ints take field 4 plain varint (write_primitives.go:264-265)
            vb = encode_varint(value)
        else:
            vb = encode_varint(value & ((1 << 64) - 1))  # two's complement, 10 bytes
        return bytes([18, len(vb) + 1, 32]) + vb
    if isinstance(value, bytes):
        inner = bytes([10]) + encode_varint(len(value)) + value
        return bytes([18]) + encode_varint(len(inner)) + inner
    raise TypeError(f"unsupported property type {type(value)!r}")


def _make_keyvalue(key: str, value) -> bytes:
    # MakeKeyValue — write_feature.go:180-189
    kb = key.encode("utf-8")
    vb = _write_value(value)
    inner = bytes([10]) + encode_varint(len(kb)) + kb + vb
    return bytes([18]) + encode_varint(len(inner)) + inner


def _read_value(buf, pos: int):
    tag = buf[pos]
    pos += 1
    fieldno = tag >> 3
    if fieldno == 1:  # string
        n, pos = decode_varint(buf, pos)
        return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n
    if fieldno == 2:  # float32 LE
        return struct.unpack("<f", bytes(buf[pos : pos + 4]))[0], pos + 4
    if fieldno == 3:  # float64 LE
        return struct.unpack("<d", bytes(buf[pos : pos + 8]))[0], pos + 8
    if fieldno == 4:  # int64 plain varint (two's complement)
        u, pos = decode_varint(buf, pos)
        return (u - (1 << 64)) if u >= (1 << 63) else u, pos
    if fieldno == 5:  # uint64
        u, pos = decode_varint(buf, pos)
        return u, pos
    if fieldno == 6:  # sint64 — zigzag (divergence: reference reads as uint)
        u, pos = decode_varint(buf, pos)
        return unzigzag64(u), pos
    if fieldno == 7:  # bool
        u, pos = decode_varint(buf, pos)
        return bool(u), pos
    raise ValueError(f"unknown property value field {fieldno}")


# ---------------------------------------------------------------------------
# geometry encode (geom.go:171-302)
# ---------------------------------------------------------------------------

def _encode_geometry_values(feat: Feature) -> np.ndarray:
    """uint64 stream for the packed geometry field (pre-varint)."""
    dim = feat.dim
    t = feat.geom_type
    q = quantize_vec(feat.coords).reshape(-1, dim)

    def ring_deltas(qring: np.ndarray) -> np.ndarray:
        # writeline — geom.go:204-246: first vertex absolute, then deltas;
        # delta state resets per ring (fresh pt per readline, geom.go:103-111)
        d = np.empty_like(qring)
        d[0] = qring[0]
        if len(qring) > 1:
            d[1:] = qring[1:] - qring[:-1]
        return zigzag_vec(d.reshape(-1))

    if len(q) == 0:
        raise ValueError(
            "empty geometry cannot be encoded (the wire format has no "
            "empty-coordinates shape); filter such features out")
    if t == 1:
        # writepointbs — geom.go:187-201: only x,y written even when dim>2
        return zigzag_vec(q[0, :2].copy())
    offsets = np.concatenate(([0], np.cumsum(feat.ring_lens)))
    rings = [q[offsets[i] : offsets[i + 1]] for i in range(len(feat.ring_lens))]
    if t in (2, 4):
        return ring_deltas(rings[0])
    if t in (3, 5):
        # writepolygon — geom.go:255-273: per ring varint(len*dim) + deltas
        out = []
        for r in rings:
            out.append(np.array([len(r) * dim], dtype=np.uint64))
            out.append(ring_deltas(r))
        return np.concatenate(out)
    # MultiPolygon — geom.go:276-302: per part varint(n_rings) + polygon body
    out, i = [], 0
    for nr in feat.part_rings:
        out.append(np.array([nr], dtype=np.uint64))
        for r in rings[i : i + nr]:
            out.append(np.array([len(r) * dim], dtype=np.uint64))
            out.append(ring_deltas(r))
        i += nr
    return np.concatenate(out)


def encode_feature(feat: Feature) -> bytes:
    """WriteFeature — write_feature.go:192-263 (current-writer semantics:
    always appends bbox when a geometry exists)."""
    out = bytearray()
    if feat.id is not None:
        out.append(8)
        out += encode_varint(int(feat.id) & ((1 << 64) - 1))
    for k, v in feat.properties.items():
        out += _make_keyvalue(k, v)
    if feat.geom_type:
        code = feat.geom_type if feat.dim == 2 else ((feat.geom_type << 4) + feat.dim)
        out += bytes([24, code])  # makegeomcode — geom.go:71-76
        vals = _encode_geometry_values(feat)
        packed = pack_varints(vals)
        out.append(34)
        out += encode_varint(len(packed))
        out += packed
        # bbox — write_feature.go:249-260: zigzag(int64(c*1e7)) × [W,S,E,N]
        bb = geom_bbox(feat)
        bvals = zigzag_vec(np.array([convert_pt(c) for c in bb], dtype=np.int64))
        bpacked = pack_varints(bvals)
        out.append(42)
        out += encode_varint(len(bpacked))
        out += bpacked
    return bytes(out)


# ---------------------------------------------------------------------------
# feature decode (read_feature.go:9-100)
# ---------------------------------------------------------------------------

def _decode_geometry(vals: np.ndarray, geom_type: int, dim: int, quantized: bool = False):
    """Reconstruct flat coords/ring_lens/part_rings from the uint64 stream.

    ``quantized=False`` replicates readline/readpolygon/readmultipolygon
    (geom.go:92-159): cumulative sum of ``sv/1e7`` per ring in float64, then
    go_round7 on each prefix sum — reference-exact, but carries the
    reference's own float-accumulation error (worst case 2e-7 vs input).

    ``quantized=True`` is the engine's exact path: integer cumsum of the
    raw deltas → int64 lattice coordinates, losslessly invertible.
    """
    if geom_type == 1:
        # writepointbs drops dims > 2 on encode (geom.go:187-201), so only
        # two values exist regardless of the dim embedded in the geom code
        iv = unzigzag_vec(vals[:2])
        coords = iv if quantized else go_round7(iv.astype(np.float64) / POWER)
        return coords, np.array([1], dtype=np.int64), np.array([1], dtype=np.int64)

    def decode_ring(seg: np.ndarray) -> np.ndarray:
        iv = unzigzag_vec(seg).reshape(-1, dim)
        if quantized:
            return np.cumsum(iv, axis=0).reshape(-1)
        pts = iv.astype(np.float64) / POWER
        return go_round7(np.cumsum(pts, axis=0)).reshape(-1)

    if geom_type in (2, 4):
        coords = decode_ring(vals)
        n = len(vals) // dim
        return coords, np.array([n], dtype=np.int64), np.array([1], dtype=np.int64)

    if geom_type in (3, 5):
        rings, ring_lens, i = [], [], 0
        while i < len(vals):
            n = int(vals[i])  # varint len(ring)*dim — geom.go:103-111
            i += 1
            rings.append(decode_ring(vals[i : i + n]))
            ring_lens.append(n // dim)
            i += n
        coords = np.concatenate(rings) if rings else np.empty(0)
        return coords, np.asarray(ring_lens, dtype=np.int64), np.array(
            [len(ring_lens)], dtype=np.int64
        )

    # MultiPolygon — geom.go:113-125
    rings, ring_lens, part_rings, i = [], [], [], 0
    while i < len(vals):
        nr = int(vals[i])
        i += 1
        part_rings.append(nr)
        for _ in range(nr):
            n = int(vals[i])
            i += 1
            rings.append(decode_ring(vals[i : i + n]))
            ring_lens.append(n // dim)
            i += n
    coords = np.concatenate(rings) if rings else np.empty(0)
    return coords, np.asarray(ring_lens, dtype=np.int64), np.asarray(
        part_rings, dtype=np.int64
    )


def decode_properties(frame) -> dict:
    """Properties ONLY — a field walk that jumps id/geometry/bbox bytes via
    their varint length prefixes (ReadKeys-style traversal, reader.go:
    120-142, but parsing values too). Order-tolerant, unlike the strict
    field-ordered full decoder."""
    buf = np.frombuffer(frame, dtype=np.uint8) if isinstance(frame, (bytes, bytearray)) else frame
    pos, n = 0, len(buf)
    props: dict = {}
    while pos < n:
        tag, pos = decode_varint(buf, pos)
        k, w = tag >> 3, tag & 7
        if w == 0:
            _, pos = decode_varint(buf, pos)
        elif w == 2:
            size, pos = decode_varint(buf, pos)
            if k == 2:
                p = pos + 1  # 0x0A key tag
                klen, p = decode_varint(buf, p)
                key = bytes(buf[p : p + klen]).decode("utf-8")
                p += klen + 1  # 0x12 value tag
                _, p = decode_varint(buf, p)  # value message length
                props[key], _ = _read_value(buf, p)
            pos += size
        else:
            raise ValueError(f"unexpected wire type {w} in feature frame")
    return props


def decode_feature(frame: bytes, quantized: bool = False) -> Feature:
    """ReadFeature — read_feature.go:9-100 (strict field order, all optional).

    With ``quantized=True`` coords are exact int64 lattice values (×1e7)."""
    buf = np.frombuffer(frame, dtype=np.uint8)
    pos = 0
    fid = None
    props: dict = {}
    geom_type = 0
    dim = 2
    coords = np.empty(0)
    ring_lens = np.empty(0, dtype=np.int64)
    part_rings = np.empty(0, dtype=np.int64)
    bbox = None

    def read_key(p):
        tag, p = decode_varint(buf, p)
        return tag >> 3, tag & 7, p

    if pos < len(buf):
        k, w, pos = read_key(pos)
    else:
        k = 0
    if pos <= len(buf) and k == 1 and w == 0:
        fid, pos = decode_varint(buf, pos)
        if pos < len(buf):
            k, w, pos = read_key(pos)
        else:
            k = 0
    while k == 2 and w == 2 and pos < len(buf):
        size, pos = decode_varint(buf, pos)
        endpos = pos + size
        pos += 1  # 0x0A key tag
        klen, pos = decode_varint(buf, pos)
        key = bytes(buf[pos : pos + klen]).decode("utf-8")
        pos += klen
        pos += 1  # 0x12 value tag
        _, pos = decode_varint(buf, pos)  # value message length
        props[key], pos = _read_value(buf, pos)
        pos = endpos
        if pos < len(buf):
            k, w, pos = read_key(pos)
        else:
            k = 0
    if k == 3 and w == 0 and pos < len(buf):
        code = int(buf[pos])
        pos += 1
        # geomcode_details — geom.go:59-68
        if code <= 6:
            geom_type, dim = code, 2
        else:
            geom_type, dim = code >> 4, code - ((code >> 4) << 4)
        if geom_type == 1:
            # writepointbs drops dims > 2 (geom.go:187-201): only x,y are
            # on the wire, so the Feature's dim must say 2 or vertices()
            # reshapes a 2-value array into dim-wide rows and breaks
            dim = 2
        if pos < len(buf):
            k, w, pos = read_key(pos)
        else:
            k = 0
    if k == 4 and w == 2 and pos < len(buf):
        size, pos = decode_varint(buf, pos)
        endpos = pos + size
        vals = unpack_varints(buf, pos, endpos)
        coords, ring_lens, part_rings = _decode_geometry(vals, geom_type, dim, quantized)
        pos = endpos
        if pos < len(buf):
            k, w, pos = read_key(pos)
        else:
            k = 0
    if k == 5 and w == 2 and pos < len(buf):
        # readboundingbox — geom.go:161-169: length varint then 4 × sv/1e7
        _, pos = decode_varint(buf, pos)
        vals = unpack_varints(buf, pos, len(buf))[:4]
        bbox = unzigzag_vec(vals).astype(np.float64) / POWER

    dtype = np.int64 if quantized else np.float64
    return Feature(
        geom_type=geom_type, dim=dim, coords=np.asarray(coords, dtype=dtype),
        ring_lens=ring_lens, part_rings=part_rings, id=fid, properties=props,
        bbox=bbox,
    )


# ---------------------------------------------------------------------------
# file framing (writer.go:73-89, reader.go:84-93)
# ---------------------------------------------------------------------------

def write_frames(frames: list[bytes]) -> bytes:
    out = bytearray()
    for f in frames:
        out.append(0x0A)
        out += encode_varint(len(f))
        out += f
    return bytes(out)


def read_frames(data: bytes, skip_metadata: bool = True):
    """Yield raw feature frames from a geobuf buffer/file.

    Skips a leading metadata dummy feature (a point feature whose single
    property key is "metadata" — reader.go:258-274 CheckMetaData); the gob
    payload is Go-specific and intentionally not parsed (our engine's index
    is table partitioning, SURVEY §1.5). Pass skip_metadata=False when the
    bytes are a mid-file range (subfile seeks) where no dummy can occur.
    """
    pos = 0
    first = skip_metadata
    n = len(data)
    while pos < n:
        assert data[pos] == 0x0A, f"bad frame tag {data[pos]:#x} at {pos}"
        pos += 1
        ln, pos = decode_varint(data, pos)
        frame = data[pos : pos + ln]
        pos += ln
        if first:
            first = False
            if _is_metadata_frame(frame):
                continue
        yield frame


def _is_metadata_frame(frame: bytes) -> bool:
    """Metadata-dummy sniff (CheckMetaData parity, reader.go:258-274).

    The reference checks only that feature #1 carries a "metadata"
    property; we additionally require it to be the feature's ONLY
    property, so a legitimate first feature that happens to carry a
    "metadata" key among others is not silently dropped. (A single-
    property feature keyed exactly "metadata" remains ambiguous — the
    reference's own sniff has the same blind spot.)"""
    try:
        buf = np.frombuffer(frame, dtype=np.uint8)
        pos = 0
        tag, pos = decode_varint(buf, pos)
        if tag >> 3 == 1 and tag & 7 == 0:  # optional id
            _, pos = decode_varint(buf, pos)
            tag, pos = decode_varint(buf, pos)
        if tag >> 3 != 2 or tag & 7 != 2:
            return False
        esize, pos = decode_varint(buf, pos)  # map-entry size
        entry_end = pos + esize
        pos += 1  # 0x0A key tag
        klen, pos = decode_varint(buf, pos)
        if bytes(buf[pos : pos + klen]) != b"metadata":
            return False
        # the dummy has exactly ONE property: the next field after this
        # map entry must not be another properties field (tag 0x12)
        return entry_end >= len(buf) or buf[entry_end] != 0x12
    except Exception:
        return False
