"""Vectorized geobuf codec over Spark DataFrames — Arrow batches in, numpy
kernels inside, zero per-row Python on the hot path.

Hot path (the 10^12-page workload): point features with an integer id.
A point frame is [0x08 id] [0x18 code] [0x22 len zz(x) zz(y)]
[0x2A len zz(x) zz(y) zz(x) zz(y)] — *every token is a varint*, so:

- encode: per-row varint byte matrices + cumsum offsets + one scatter into
  a single buffer, wrapped zero-copy into an Arrow BinaryArray;
- decode: one `unpack_varints` pass over the concatenated frames yields a
  flat token stream with exactly 14 tokens per frame → reshape (N, 14).

Generic geometries/properties go through the per-feature core codec inside
mapInPandas — the import/export edge (ConvertGeojson/ConvertGeobuf analog,
convert_geojson.go:153-193), not the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geobuf_spark.codec import core

# ---------------------------------------------------------------------------
# numpy batch kernels (testable without Spark)
# ---------------------------------------------------------------------------

_POINT_TOKENS = 14  # 8,id,24,code,34,glen,gx,gy,42,blen,bx,by0,bx1,by1



class _FrameWriter:
    """Shared scatter helpers for the batch encode kernels: a per-row write
    cursor over one contiguous output buffer. One implementation — the
    kernels previously each carried a verbatim copy, and fixes drifted."""

    def __init__(self, buf: np.ndarray, pos: np.ndarray):
        self.buf = buf
        self.pos = pos.copy()

    def const(self, byte: int):
        self.buf[self.pos] = byte
        self.pos = self.pos + 1

    def mat(self, mat: np.ndarray, lens: np.ndarray):
        for j in range(mat.shape[1]):
            sel = lens > j
            self.buf[self.pos[sel] + j] = mat[sel, j]
        self.pos = self.pos + lens

    def segmented(self, mat, lens, seg_starts, seg_counts, seg_bytes):
        """Scatter a variable count of varints per row: flat byte positions
        via cumsum arithmetic (rows advance by their own byte totals)."""
        tok_off = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=tok_off[1:])
        row_of_tok = np.repeat(np.arange(len(seg_starts)), seg_counts)
        base = self.pos[row_of_tok] + (tok_off[:-1] - tok_off[seg_starts][row_of_tok])
        for j in range(mat.shape[1]):
            sel = lens > j
            self.buf[base[sel] + j] = mat[sel, j]
        self.pos = self.pos + seg_bytes


def _tokenize_frames(frames: pa.Array):
    """Shared decode prologue: concatenated frame buffer → (n, flat bytes,
    all varint tokens, first-token index per frame, tokens per frame)."""
    combined = pa.concat_arrays([frames.cast(pa.binary())])
    n = len(combined)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return 0, np.empty(0, np.uint8), np.empty(0, np.uint64), e, e
    flat = np.frombuffer(combined.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(combined.buffers()[1], dtype=np.int32)
    start, end = int(offs[combined.offset]), int(offs[combined.offset + n])
    seg = flat[start:end]
    tok_ends = np.flatnonzero(seg < 0x80)
    tok_starts_b = np.concatenate(([0], tok_ends[:-1] + 1))
    frame_off = offs[combined.offset : combined.offset + n + 1].astype(np.int64) - start
    counts = np.diff(np.searchsorted(tok_starts_b, frame_off))
    tokens = core.unpack_varints(seg, 0, len(seg))
    first = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=first[1:])
    return n, seg, tokens, first, counts


def _tokenize_geometry(frames: pa.Array, allow_missing: bool = False):
    """Payload-level decode prologue: field-walk every frame for the id
    (tag 0x08), geom code (tag 0x18) and geometry payload (tag 0x22),
    gather the payload byte ranges contiguously, and varint-tokenize ONLY
    those bytes. Unlike `_tokenize_frames`, this tolerates properties,
    missing bbox, and any field order — the same per-field walk the
    reference decoder does (read_feature.go:9-100), batched.

    Returns (n, ids, codes, tokens, first, counts) where tokens are the
    geometry deltas/headers only and first/counts index them per frame.
    With allow_missing=True, geometry-less frames get code -1 and an
    empty token range instead of raising."""
    combined = pa.concat_arrays([frames.cast(pa.binary())])
    n = len(combined)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return 0, e, e, np.empty(0, np.uint64), e, e
    flat = np.frombuffer(combined.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(combined.buffers()[1], dtype=np.int32)
    starts = offs[combined.offset : combined.offset + n].astype(np.int64)
    ends = offs[combined.offset + 1 : combined.offset + n + 1].astype(np.int64)

    ids = np.zeros(n, dtype=np.int64)
    codes = np.full(n, -1, dtype=np.int64)
    g_start = np.full(n, -1, dtype=np.int64)
    g_len = np.zeros(n, dtype=np.int64)
    for active, tag, pstart, plen, v, _ in frame_fields_walk(flat, starts, ends):
        is_id = tag == 0x08
        if is_id.any():
            ids[active[is_id]] = v[is_id].astype(np.int64)
        is_code = tag == 0x18
        if is_code.any():
            sel = active[is_code]
            fresh = codes[sel] < 0
            codes[sel[fresh]] = v[is_code][fresh].astype(np.int64)
        is_geom = tag == 0x22
        if is_geom.any():
            sel = active[is_geom]
            fresh = g_start[sel] < 0
            g_start[sel[fresh]] = pstart[is_geom][fresh]
            g_len[sel[fresh]] = plen[is_geom][fresh]
    # a truncated/corrupt frame whose geometry length overruns its frame
    # boundary would otherwise gather the NEXT frame's bytes — silent
    # cross-frame corruption, not an error
    overrun = (g_start >= 0) & (g_start + g_len > ends)
    if overrun.any():
        raise ValueError(
            f"{int(overrun.sum())} frame(s) with geometry payload running "
            "past the frame end — truncated or corrupt input")
    missing = (codes < 0) | (g_start < 0)
    if missing.any():
        if not allow_missing:
            raise ValueError("frame missing geometry-type or geometry field")
        # geometry-less frames (bare-properties features, e.g. the
        # reference's metadata dummy): sentinel code -1, empty payload —
        # the caller routes them to an empty-geometry output row
        codes[missing] = -1
        g_start[missing] = 0
        g_len[missing] = 0

    byte_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(g_len, out=byte_off[1:])
    total = int(byte_off[-1])
    row_of_byte = np.repeat(np.arange(n), g_len)
    local = np.arange(total, dtype=np.int64) - byte_off[row_of_byte]
    gbuf = flat[g_start[row_of_byte] + local]
    # a payload ending mid-varint (last byte still has the continuation
    # bit) would silently merge its final token with the next frame's
    # first token in the concatenated sweep — line-shaped batches can even
    # pass the counts%dim check and decode wrong values
    tail = byte_off[1:][g_len > 0] - 1
    if len(tail) and (gbuf[tail] >= 0x80).any():
        raise ValueError(
            f"{int((gbuf[tail] >= 0x80).sum())} frame(s) whose geometry "
            "payload ends mid-varint — truncated or corrupt input")
    tokens = core.unpack_varints(gbuf, 0, len(gbuf))
    tok_ends = np.flatnonzero(gbuf < 0x80)
    tok_starts_b = (np.concatenate(([0], tok_ends[:-1] + 1))
                    if len(tok_ends) else np.empty(0, np.int64))
    counts = np.diff(np.searchsorted(tok_starts_b, byte_off))
    first = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=first[1:])
    return n, ids, codes, tokens, first, counts


def _gather_token_group(tokens: np.ndarray, first: np.ndarray,
                        counts: np.ndarray, sel: np.ndarray):
    """Slice the per-frame token ranges of the selected frames into one
    contiguous (tokens, first, counts) triple — the group dispatch step."""
    cnt = counts[sel]
    off = np.zeros(len(sel) + 1, dtype=np.int64)
    np.cumsum(cnt, out=off[1:])
    src = (np.repeat(first[sel], cnt)
           + np.arange(int(off[-1]), dtype=np.int64) - off[:-1].repeat(cnt))
    return tokens[src], off[:-1], cnt


def _varint_matrix(v: np.ndarray):
    """(values → (N,10) byte matrix, lengths) — vectorized varint encode."""
    v = v.astype(np.uint64, copy=False)
    lens = core.varint_lengths(v)
    maxlen = int(lens.max()) if len(v) else 1
    j = np.arange(maxlen, dtype=np.uint64)
    groups = (v[:, None] >> (j[None, :] * np.uint64(7))) & np.uint64(0x7F)
    cont = np.where(np.arange(maxlen)[None, :] < (lens - 1)[:, None], 0x80, 0)
    return (groups | cont.astype(np.uint64)).astype(np.uint8), lens


def encode_points_kernel(ids: np.ndarray, lon: np.ndarray, lat: np.ndarray) -> pa.Array:
    """Encode N point features → Arrow binary array of geobuf frames.

    Wire layout per WriteFeature (write_feature.go:192-263) with geometry
    per writepointbs (geom.go:187-201) and bbox (write_feature.go:249-260,
    degenerate [x,y,x,y] for a point, bb.go:90-95)."""
    n = len(ids)
    qx = core.quantize_vec(lon)
    qy = core.quantize_vec(lat)
    zx = core.zigzag_vec(qx)
    zy = core.zigzag_vec(qy)
    zid = ids.astype(np.uint64)

    mid, lid = _varint_matrix(zid)
    mx, lx = _varint_matrix(zx)
    my, ly = _varint_matrix(zy)
    glen = lx + ly
    blen = 2 * glen
    mgl, lgl = _varint_matrix(glen.astype(np.uint64))
    mbl, lbl = _varint_matrix(blen.astype(np.uint64))

    # per-row frame length
    total = 1 + lid + 2 + 1 + lgl + glen + 1 + lbl + blen
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(total, out=offsets[1:])
    buf = np.empty(offsets[-1], dtype=np.uint8)

    w = _FrameWriter(buf, offsets[:-1])
    put_const, put_mat = w.const, w.mat

    put_const(8)
    put_mat(mid, lid)
    put_const(24)
    put_const(1)  # geom code Point, dim 2
    put_const(34)
    put_mat(mgl, lgl)
    put_mat(mx, lx)
    put_mat(my, ly)
    put_const(42)
    put_mat(mbl, lbl)
    put_mat(mx, lx)
    put_mat(my, ly)
    put_mat(mx, lx)
    put_mat(my, ly)
    assert np.array_equal(w.pos, offsets[1:])

    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(buf.tobytes())],
    )


def decode_points_kernel(frames: pa.Array):
    """Decode N point frames → (id uint64, qx int64, qy int64) — one varint
    sweep over the concatenated buffer, reshape to 14 tokens/frame."""
    combined = pa.concat_arrays([frames.cast(pa.binary())])
    flat = np.frombuffer(combined.buffers()[2], dtype=np.uint8) if combined.buffers()[2] else np.empty(0, np.uint8)
    offs = np.frombuffer(combined.buffers()[1], dtype=np.int32)
    start, end = int(offs[combined.offset]), int(offs[combined.offset + len(combined)])
    tokens = core.unpack_varints(flat, start, end)
    n = len(combined)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e.astype(np.uint64), e, e
    tok = tokens.reshape(n, _POINT_TOKENS)
    # sanity: tags where expected
    assert int(tok[0, 0]) == 8 and int(tok[0, 2]) == 24 and int(tok[0, 4]) == 34
    ids = tok[:, 1]
    qx = core.unzigzag_vec(tok[:, 6])
    qy = core.unzigzag_vec(tok[:, 7])
    return ids, qx, qy


# ---------------------------------------------------------------------------
# DataFrame-level API
# ---------------------------------------------------------------------------

def encode_points(df: DataFrame, id_col: str = "doc_id", lon: str = "lon",
                  lat: str = "lat", out: str = "geobuf") -> DataFrame:
    """(id, lon, lat) → (id, geobuf) via mapInArrow — Arrow RecordBatch in,
    numpy kernel, Arrow out; no pandas materialization anywhere."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(out, T.BinaryType()),
    ])

    def _enc(batches):
        for batch in batches:
            for ci in range(3):
                if batch.column(ci).null_count:
                    raise ValueError(
                        "encode_points: null id/lon/lat (nulls become NaN "
                        "→ INT64_MIN garbage); filter before encoding")
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            lons = batch.column(1).to_numpy(zero_copy_only=False)
            lats = batch.column(2).to_numpy(zero_copy_only=False)
            frames = encode_points_kernel(
                ids.astype(np.int64), lons.astype(np.float64), lats.astype(np.float64)
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), frames], names=[id_col, out]
            )

    return df.select(id_col, lon, lat).mapInArrow(_enc, schema)


def decode_points(df: DataFrame, bin_col: str = "geobuf", id_col: str = "id",
                  quantized: bool = True) -> DataFrame:
    """Decode point frames → columns (id, lon_q, lat_q) or float lon/lat.

    The quantized int64 path is exact (lossless on the 1e-7 lattice); the
    float path applies the reference's go_round7 decode semantics. Arrow
    binary buffers are read in place — no per-row conversion."""
    fields = [
        T.StructField(id_col, T.LongType()),
        T.StructField("lon_q", T.LongType()),
        T.StructField("lat_q", T.LongType()),
    ]
    if not quantized:
        fields += [T.StructField("lon", T.DoubleType()), T.StructField("lat", T.DoubleType())]
    schema = T.StructType(fields)
    names = [f.name for f in fields]

    def _dec(batches):
        for batch in batches:
            frames = batch.column(batch.schema.get_field_index(bin_col))
            # payload field-walk kernel: ~2-4x faster than tokenizing the
            # whole frame (2 payload varints/frame vs 14), and tolerant of
            # props / missing bbox
            ids, qx, qy = decode_points_any_kernel(frames)
            arrays = [
                pa.array(ids.astype(np.int64), type=pa.int64()),
                pa.array(qx, type=pa.int64()),
                pa.array(qy, type=pa.int64()),
            ]
            if not quantized:
                arrays.append(pa.array(core.go_round7(qx.astype(np.float64) / core.POWER)))
                arrays.append(pa.array(core.go_round7(qy.astype(np.float64) / core.POWER)))
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.select(bin_col).mapInArrow(_dec, schema)


def decode_points_agg(df: DataFrame, bin_col: str = "geobuf",
                      parts: int | None = None) -> DataFrame:
    """Fused decode→reduce for point frames: one Arrow pass emits per-batch
    PARTIAL sums (count, Σid, Σlon_q, Σlat_q); the JVM folds the partials.

    This is the engine's lazy-read shape (ReadBoundingBox / LazyFeature
    semantics, reader.go:145-166): when a query reduces over decoded
    values, materializing the decoded columns through a second Arrow serde
    is pure overhead — the same reason Catalyst fuses from_json into the
    aggregate stage. `parts` right-sizes the Python stage: per-task
    dispatch costs ~0.2-0.3 s wall, so many tiny tasks lose to few big
    ones until the kernel work dominates (batch-size tuning, TODO r01)."""
    src = df.select(bin_col)
    if parts:
        src = src.coalesce(parts)
    schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("sum_id", T.LongType()),
        T.StructField("sum_lon_q", T.LongType()),
        T.StructField("sum_lat_q", T.LongType()),
    ])

    def _da(batches):
        c = si = sx = sy = 0
        for b in batches:
            ids, qx, qy = decode_points_any_kernel(b.column(0))
            c += len(ids)
            si += int(ids.sum())
            sx += int(qx.sum())
            sy += int(qy.sum())
        yield pa.RecordBatch.from_arrays(
            [pa.array([v], type=pa.int64()) for v in (c, si, sx, sy)],
            names=["n", "sum_id", "sum_lon_q", "sum_lat_q"])

    partials = src.mapInArrow(_da, schema)
    return partials.agg(
        F.sum("n").alias("n"), F.sum("sum_id").alias("sum_id"),
        F.sum("sum_lon_q").alias("sum_lon_q"),
        F.sum("sum_lat_q").alias("sum_lat_q"))


def decode_lines_agg(df: DataFrame, bin_col: str = "geobuf",
                     parts: int | None = None) -> DataFrame:
    """Fused decode→reduce for line frames: per-batch partials of
    (count, Σ size(coords_q), Σ first-x) — the roads-scan reduce shape —
    folded JVM-side. Same rationale as `decode_points_agg`."""
    src = df.select(bin_col)
    if parts:
        src = src.coalesce(parts)
    schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("sum_size", T.LongType()),
        T.StructField("sum_first_x", T.LongType()),
    ])

    def _da(batches):
        c = sz = fx = 0
        for b in batches:
            ids, coords, nv = decode_lines_kernel(b.column(0))
            if not len(ids):
                continue
            c += len(ids)
            sz += 2 * int(nv.sum())
            starts = np.zeros(len(nv), dtype=np.int64)
            np.cumsum(nv[:-1] * 2, out=starts[1:])
            fx += int(coords[starts].sum())
        yield pa.RecordBatch.from_arrays(
            [pa.array([v], type=pa.int64()) for v in (c, sz, fx)],
            names=["n", "sum_size", "sum_first_x"])

    partials = src.mapInArrow(_da, schema)
    return partials.agg(
        F.sum("n").alias("n"), F.sum("sum_size").alias("sum_size"),
        F.sum("sum_first_x").alias("sum_first_x"))


# ---------------------------------------------------------------------------
# LineString batch kernels — the reference's roads workload, fully vectorized
# (segmented deltas across a flattened batch; no per-row Python)
# ---------------------------------------------------------------------------

def encode_lines_kernel(ids: np.ndarray, coords: np.ndarray, nv: np.ndarray,
                        dim: int = 2, geom_type: int = 2) -> pa.Array:
    """Encode N LineString/MultiPoint features → Arrow binary frames.

    coords: flat float64 interleaved (x0,y0[,z0,…],x1,y1,…) across the
    whole batch; nv: vertices per feature; dim 2–15 (homogeneous per
    batch). MultiPoint (geom_type=4) shares LineString's exact wire shape
    (packed deltas, geom.go:249-252). Wire layout per WriteFeature with
    writeline delta semantics (geom.go:204-246); geom code embeds dim per
    makegeomcode (geom.go:59-76: dim==2 → code=type, else code=type<<4|dim);
    bbox stays 4-valued x/y regardless of dim (bb.go:10-37)."""
    n = len(ids)
    if n == 0:
        return pa.array([], type=pa.binary())
    if not (2 <= dim <= 15):
        raise ValueError(f"dim must be 2..15, got {dim}")
    if geom_type not in (2, 4):
        raise ValueError("encode_lines_kernel handles LineString(2)/MultiPoint(4)")
    if (np.asarray(nv) <= 0).any():
        # reduceat over an empty segment borrows the neighbor's value and
        # silently corrupts every later frame in the batch — reject
        raise ValueError("feature with zero vertices; filter before encoding")
    geom_code = geom_type if dim == 2 else (geom_type << 4) | dim
    q = core.quantize_vec(coords).reshape(-1, dim)  # (total_v, dim)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(nv[:-1], out=starts[1:])
    # segmented delta: d[i] = q[i] - q[i-1], reset at row starts
    d = np.empty_like(q)
    d[0] = q[0]
    d[1:] = q[1:] - q[:-1]
    d[starts] = q[starts]
    zz = core.zigzag_vec(d.reshape(-1))  # interleaved x,y zigzag deltas

    # per-feature bbox from quantized vertices (bb.go:10-37 over lattice)
    ends = starts + nv
    minx = np.minimum.reduceat(q[:, 0], starts)
    maxx = np.maximum.reduceat(q[:, 0], starts)
    miny = np.minimum.reduceat(q[:, 1], starts)
    maxy = np.maximum.reduceat(q[:, 1], starts)
    bbox_zz = core.zigzag_vec(np.stack([minx, miny, maxx, maxy], axis=1).reshape(-1))

    mid, lid = _varint_matrix(ids.astype(np.uint64))
    mg, lg = _varint_matrix(zz)
    mb, lb = _varint_matrix(bbox_zz)
    # per-feature packed-geometry byte length = sum of its delta varints
    tok_starts = dim * starts
    glen = np.add.reduceat(lg, tok_starts)
    blen = lb.reshape(n, 4).sum(axis=1)
    mgl, lgl = _varint_matrix(glen.astype(np.uint64))
    mbl, lbl = _varint_matrix(blen.astype(np.uint64))

    total = 1 + lid + 2 + 1 + lgl + glen + 1 + lbl + blen
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(total, out=offsets[1:])
    buf = np.empty(offsets[-1], dtype=np.uint8)

    w = _FrameWriter(buf, offsets[:-1])
    put_const, put_mat = w.const, w.mat
    put_segmented = w.segmented

    put_const(8)
    put_mat(mid, lid)
    put_const(24)
    put_const(geom_code)  # LineString; dim embedded when > 2
    put_const(34)
    put_mat(mgl, lgl)
    put_segmented(mg, lg, tok_starts, dim * nv, glen)
    put_const(42)
    put_mat(mbl, lbl)
    put_segmented(mb, lb, np.arange(n) * 4, np.full(n, 4), blen)
    assert np.array_equal(w.pos, offsets[1:])

    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(buf.tobytes())],
    )


def _lines_core(ids: np.ndarray, code0: int, tokens: np.ndarray,
                counts: np.ndarray):
    """LineString/MultiPoint decode over geometry-payload tokens: every
    token is a delta, so the even/odd split IS the x/y split (per dim)."""
    n = len(ids)
    dim = 2 if code0 <= 6 else code0 & 0xF
    if int(counts.sum()) % dim or (counts % dim).any():
        raise ValueError("line geometry token count not divisible by dim")
    nv = counts // dim
    d = core.unzigzag_vec(tokens).reshape(-1, dim)
    # segmented cumsum per row
    v_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(nv[:-1], out=v_starts[1:])
    c = np.cumsum(d, axis=0)
    base = np.zeros((n, dim), dtype=np.int64)
    base[1:] = c[v_starts[1:] - 1]
    coords_q = c - np.repeat(base, nv, axis=0)
    return ids, coords_q.reshape(-1), nv


def decode_lines_kernel(frames: pa.Array):
    """Decode N LineString frames → (ids, flat quantized coords, nv).

    Geometry payloads are field-walked out of each frame (properties /
    bbox / field order tolerated — reader parity with read_feature.go),
    gathered contiguously, and swept in one varint pass; segmented cumsum
    (global cumsum minus per-row offset) rebuilds absolute lattice
    coordinates."""
    n, ids, codes, tokens, first, counts = _tokenize_geometry(frames)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    code0 = int(codes[0])
    if not np.all(codes == code0):
        raise ValueError("mixed-dim LineString batch; use decode_geometries")
    return _lines_core(ids, code0, tokens, counts)


def encode_lines(df: DataFrame, id_col: str = "line_id", coords: str = "coords",
                 out: str = "geobuf", dim: int = 2) -> DataFrame:
    """(id, coords flat array<double>) → (id, geobuf) via the vectorized
    LineString kernel (one Arrow pass). `dim` is the vertex width (2=x/y,
    3=x/y/z, … up to 15) of the interleaved coords array."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(out, T.BinaryType()),
    ])

    def _enc(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            carr = batch.column(1)
            flat = carr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            offs = carr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            nv = (offs[1:] - offs[:-1]) // dim
            frames = encode_lines_kernel(ids, flat, nv, dim=dim)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), frames], names=[id_col, out]
            )

    return df.select(id_col, coords).mapInArrow(_enc, schema)


def decode_lines(df: DataFrame, bin_col: str = "geobuf", id_col: str = "line_id") -> DataFrame:
    """LineString frames → (id, coords_q flat array<bigint>) — exact ints."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("coords_q", T.ArrayType(T.LongType())),
    ])

    def _dec(batches):
        for batch in batches:
            frames = batch.column(batch.schema.get_field_index(bin_col))
            ids, coords_q, nv = decode_lines_kernel(frames)
            total_v = int(nv.sum())
            dim = len(coords_q) // total_v if total_v else 2
            offs = np.zeros(len(ids) + 1, dtype=np.int32)
            np.cumsum(nv * dim, out=offs[1:])
            carr = pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()), pa.array(coords_q, type=pa.int64())
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), carr], names=[id_col, "coords_q"]
            )

    return df.select(bin_col).mapInArrow(_dec, schema)


def roundtrip_points(df: DataFrame, id_col: str = "doc_id", lon: str = "lon",
                     lat: str = "lat") -> DataFrame:
    """Fused encode→decode in ONE Python round-trip (bench/verify path):
    proves the wire format while paying serde once."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("lon_q", T.LongType()),
        T.StructField("lat_q", T.LongType()),
    ])

    def _rt(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            lons = batch.column(1).to_numpy(zero_copy_only=False).astype(np.float64)
            lats = batch.column(2).to_numpy(zero_copy_only=False).astype(np.float64)
            frames = encode_points_kernel(ids, lons, lats)
            # payload-walk decode: ~2-4x the fixed 14-token tokenizer
            dids, qx, qy = decode_points_any_kernel(frames)
            yield pa.RecordBatch.from_arrays([
                pa.array(dids.astype(np.int64)), pa.array(qx), pa.array(qy),
            ], names=[id_col, "lon_q", "lat_q"])

    return df.select(id_col, lon, lat).mapInArrow(_rt, schema)


# ---------------------------------------------------------------------------
# generic (any geometry / properties) — the import/export edge
# ---------------------------------------------------------------------------

GEOM_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("geom_type", T.IntegerType()),
    T.StructField("dim", T.IntegerType()),
    T.StructField("coords", T.ArrayType(T.DoubleType())),
    T.StructField("ring_lens", T.ArrayType(T.IntegerType())),
    T.StructField("part_rings", T.ArrayType(T.IntegerType())),
    T.StructField("props_json", T.StringType()),
])


def encode_features_generic(df: DataFrame, out: str = "geobuf") -> DataFrame:
    """Encode rows shaped like GEOM_SCHEMA → geobuf frames (cold path)."""
    import json

    @F.pandas_udf(T.BinaryType())
    def _enc(id_s: pd.Series, gt_s: pd.Series, dim_s: pd.Series, coords_s: pd.Series,
             rl_s: pd.Series, pr_s: pd.Series, props_s: pd.Series) -> pd.Series:
        out_frames = []
        for i in range(len(id_s)):
            props = json.loads(props_s.iloc[i]) if props_s.iloc[i] else {}
            feat = core.Feature(
                geom_type=int(gt_s.iloc[i]), dim=int(dim_s.iloc[i]),
                coords=np.asarray(coords_s.iloc[i], dtype=np.float64),
                ring_lens=np.asarray(rl_s.iloc[i], dtype=np.int64),
                part_rings=np.asarray(pr_s.iloc[i], dtype=np.int64),
                id=None if pd.isna(id_s.iloc[i]) else int(id_s.iloc[i]),
                properties=props,
            )
            out_frames.append(core.encode_feature(feat))
        return pd.Series(out_frames)

    return df.withColumn(
        out,
        _enc(F.col("id"), F.col("geom_type"), F.col("dim"), F.col("coords"),
             F.col("ring_lens"), F.col("part_rings"), F.col("props_json")),
    )


def decode_features_generic(df: DataFrame, bin_col: str = "geobuf") -> DataFrame:
    """Decode arbitrary geobuf frames → GEOM_SCHEMA rows (cold path)."""
    import json

    def _dec(batches):
        for pdf in batches:
            rows = []
            for frame in pdf[bin_col]:
                f = core.decode_feature(bytes(frame))
                rows.append({
                    "id": f.id, "geom_type": f.geom_type, "dim": f.dim,
                    "coords": f.coords.tolist(), "ring_lens": f.ring_lens.tolist(),
                    "part_rings": f.part_rings.tolist(),
                    "props_json": json.dumps(f.properties, sort_keys=True),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in GEOM_SCHEMA.fields])

    return df.select(bin_col).mapInPandas(_dec, GEOM_SCHEMA)


# ---------------------------------------------------------------------------
# Polygon / MultiLineString batch kernels — ring-structured geometries,
# fully vectorized. Wire shape (geom.go:255-273): per ring a varint
# `len(ring)·dim` then that ring's packed zigzag deltas, delta state
# resetting at each ring (readline per ring, geom.go:103-111,127-157).
# MultiPoint shares the LineString layout (packed deltas, no ring counts).
# ---------------------------------------------------------------------------

def encode_rings_kernel(ids: np.ndarray, coords: np.ndarray, ring_nv: np.ndarray,
                        rings_per_feat: np.ndarray, geom_type: int = 3,
                        dim: int = 2) -> pa.Array:
    """Encode N ring-structured features (Polygon=3 / MultiLineString=5).

    coords: flat float64 interleaved across the whole batch; ring_nv:
    vertices per ring (all rings, feature-major); rings_per_feat: rings
    per feature."""
    n = len(ids)
    if n == 0:
        return pa.array([], type=pa.binary())
    if geom_type not in (3, 5):
        raise ValueError("encode_rings_kernel handles Polygon(3)/MultiLineString(5)")
    if not (2 <= dim <= 15):
        raise ValueError(f"dim must be 2..15, got {dim}")
    if (np.asarray(ring_nv) <= 0).any() or (np.asarray(rings_per_feat) <= 0).any():
        raise ValueError("empty ring or zero-ring feature; filter before encoding")
    geom_code = geom_type if dim == 2 else (geom_type << 4) | dim

    q = core.quantize_vec(coords).reshape(-1, dim)  # (total_v, dim)
    R = len(ring_nv)
    v_starts = np.zeros(R, dtype=np.int64)
    np.cumsum(ring_nv[:-1], out=v_starts[1:])
    # per-ring segmented delta (reset each ring — geom.go:127-157)
    d = np.empty_like(q)
    d[0] = q[0]
    d[1:] = q[1:] - q[:-1]
    d[v_starts] = q[v_starts]
    zz = core.zigzag_vec(d.reshape(-1))  # (total_v*dim,) ring-major

    # token stream: per ring [count=nv·dim, deltas…]
    ring_tok_counts = 1 + ring_nv * dim
    ring_tok_offs = np.zeros(R, dtype=np.int64)
    np.cumsum(ring_tok_counts[:-1], out=ring_tok_offs[1:])
    total_toks = int(ring_tok_counts.sum())
    tokens = np.empty(total_toks, dtype=np.uint64)
    tokens[ring_tok_offs] = (ring_nv * dim).astype(np.uint64)
    is_delta = np.ones(total_toks, dtype=bool)
    is_delta[ring_tok_offs] = False
    tokens[is_delta] = zz

    # feature-level grouping
    feat_ring_start = np.zeros(n, dtype=np.int64)
    np.cumsum(rings_per_feat[:-1], out=feat_ring_start[1:])
    feat_tok_start = ring_tok_offs[feat_ring_start]
    feat_tok_counts = np.add.reduceat(ring_tok_counts, feat_ring_start)

    # per-feature bbox over quantized vertices (x/y only, bb.go:10-37)
    feat_v_start = v_starts[feat_ring_start]
    minx = np.minimum.reduceat(q[:, 0], feat_v_start)
    maxx = np.maximum.reduceat(q[:, 0], feat_v_start)
    miny = np.minimum.reduceat(q[:, 1], feat_v_start)
    maxy = np.maximum.reduceat(q[:, 1], feat_v_start)
    bbox_zz = core.zigzag_vec(np.stack([minx, miny, maxx, maxy], axis=1).reshape(-1))

    mid, lid = _varint_matrix(ids.astype(np.uint64))
    mg, lg = _varint_matrix(tokens)
    mb, lb = _varint_matrix(bbox_zz)
    glen = np.add.reduceat(lg, feat_tok_start)
    blen = lb.reshape(n, 4).sum(axis=1)
    mgl, lgl = _varint_matrix(glen.astype(np.uint64))
    mbl, lbl = _varint_matrix(blen.astype(np.uint64))

    total = 1 + lid + 2 + 1 + lgl + glen + 1 + lbl + blen
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(total, out=offsets[1:])
    buf = np.empty(offsets[-1], dtype=np.uint8)
    w = _FrameWriter(buf, offsets[:-1])
    put_const, put_mat = w.const, w.mat
    put_segmented = w.segmented

    put_const(8)
    put_mat(mid, lid)
    put_const(24)
    put_const(geom_code)
    put_const(34)
    put_mat(mgl, lgl)
    put_segmented(mg, lg, feat_tok_start, feat_tok_counts, glen)
    put_const(42)
    put_mat(mbl, lbl)
    put_segmented(mb, lb, np.arange(n) * 4, np.full(n, 4), blen)
    assert np.array_equal(w.pos, offsets[1:])

    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(buf.tobytes())],
    )


def decode_rings_kernel(frames: pa.Array):
    """Decode N ring-structured frames → (ids, flat quantized coords,
    ring_nv, rings_per_feat, geom_type, dim).

    Ring boundaries are data-dependent (each ring announces its token
    count), so the walk iterates max-rings-per-feature times over the
    active frame set — vectorized within each round."""
    n, ids, codes, tokens, first, counts = _tokenize_geometry(frames)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e, e, 0, 2
    code0 = int(codes[0])
    if not np.all(codes == code0):
        raise ValueError("mixed geom-code batch; use decode_geometries")
    return _rings_core(ids, code0, tokens, first, counts)


def _rings_core(ids: np.ndarray, code0: int, tokens: np.ndarray,
                first: np.ndarray, counts: np.ndarray):
    n = len(ids)
    geom_type = code0 if code0 <= 6 else code0 >> 4
    dim = 2 if code0 <= 6 else code0 & 0xF

    # ring walk over geometry-payload tokens [first, first+counts)
    g_end = first + counts
    pos = first.copy()
    ring_feat, ring_start_tok, ring_nv_l = [], [], []
    rings_per_feat = np.zeros(n, dtype=np.int64)
    active = np.flatnonzero(pos < g_end)
    while len(active):
        cnt = tokens[pos[active]].astype(np.int64)  # nv·dim
        ring_feat.append(active.copy())
        ring_start_tok.append(pos[active] + 1)
        ring_nv_l.append(cnt // dim)
        rings_per_feat[active] += 1
        pos[active] += 1 + cnt
        active = active[pos[active] < g_end[active]]
    if not ring_feat:
        e = np.empty(0, dtype=np.int64)
        return ids, e, e, rings_per_feat, geom_type, dim
    # rings discovered round-by-round → reorder feature-major, round-minor
    rf = np.concatenate(ring_feat)
    rs = np.concatenate(ring_start_tok)
    rnv = np.concatenate(ring_nv_l)
    rounds = np.concatenate([np.full(len(a), i) for i, a in enumerate(ring_feat)])
    order = np.lexsort((rounds, rf))
    rf, rs, rnv = rf[order], rs[order], rnv[order]

    # gather delta tokens per ring
    tok_counts = rnv * dim
    R = len(rnv)
    starts = np.zeros(R, dtype=np.int64)
    np.cumsum(tok_counts[:-1], out=starts[1:])
    big = np.repeat(np.arange(R), tok_counts)
    t = np.arange(int(tok_counts.sum()), dtype=np.int64) - starts[big]
    d = core.unzigzag_vec(tokens[rs[big] + t]).reshape(-1, dim)
    # segmented cumsum reset per ring
    v_starts = np.zeros(R, dtype=np.int64)
    np.cumsum(rnv[:-1], out=v_starts[1:])
    c = np.cumsum(d, axis=0)
    base = np.zeros((R, dim), dtype=np.int64)
    base[1:] = c[v_starts[1:] - 1]
    coords_q = c - np.repeat(base, rnv, axis=0)
    return ids, coords_q.reshape(-1), rnv, rings_per_feat, geom_type, dim


def encode_polygons(df: DataFrame, id_col: str = "poly_id", coords: str = "coords",
                    ring_lens: str = "ring_lens", out: str = "geobuf",
                    geom_type: int = 3, dim: int = 2) -> DataFrame:
    """(id, coords flat array<double>, ring_lens array<int>) → (id, geobuf)
    via the vectorized ring kernel (Polygon or MultiLineString)."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(out, T.BinaryType()),
    ])

    def _enc(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            carr = batch.column(1)
            flat = carr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            rarr = batch.column(2)
            ring_nv = rarr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            roffs = rarr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            rings_per_feat = roffs[1:] - roffs[:-1]
            frames = encode_rings_kernel(ids, flat, ring_nv, rings_per_feat,
                                         geom_type=geom_type, dim=dim)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), frames], names=[id_col, out]
            )

    return df.select(id_col, coords, ring_lens).mapInArrow(_enc, schema)


def decode_polygons(df: DataFrame, bin_col: str = "geobuf", id_col: str = "poly_id") -> DataFrame:
    """Ring frames → (id, coords_q flat array<bigint>, ring_lens array<int>)."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("coords_q", T.ArrayType(T.LongType())),
        T.StructField("ring_lens", T.ArrayType(T.IntegerType())),
    ])

    def _dec(batches):
        for batch in batches:
            frames = batch.column(batch.schema.get_field_index(bin_col))
            ids, coords_q, ring_nv, rpf, _, dim = decode_rings_kernel(frames)
            coffs = np.zeros(len(ids) + 1, dtype=np.int32)
            roffs = np.zeros(len(ids) + 1, dtype=np.int32)
            np.cumsum(rpf, out=roffs[1:])
            feat_v = np.add.reduceat(ring_nv, roffs[:-1]) if len(ring_nv) else np.zeros(len(ids), np.int64)
            np.cumsum(feat_v * dim, out=coffs[1:])
            carr = pa.ListArray.from_arrays(
                pa.array(coffs, type=pa.int32()), pa.array(coords_q, type=pa.int64()))
            rarr = pa.ListArray.from_arrays(
                pa.array(roffs, type=pa.int32()), pa.array(ring_nv.astype(np.int32), type=pa.int32()))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), carr, rarr],
                names=[id_col, "coords_q", "ring_lens"])

    return df.select(bin_col).mapInArrow(_dec, schema)


# ---------------------------------------------------------------------------
# MultiPolygon batch kernels — two-level nesting (geom.go:276-302): per
# polygon a varint ring-count, then per ring varint(len·dim) + deltas.
# ---------------------------------------------------------------------------

def encode_multipolygons_kernel(ids: np.ndarray, coords: np.ndarray,
                                ring_nv: np.ndarray, rings_per_poly: np.ndarray,
                                polys_per_feat: np.ndarray, dim: int = 2) -> pa.Array:
    """Encode N MultiPolygon features → Arrow binary frames.

    ring_nv: vertices per ring (all rings, poly-major); rings_per_poly:
    rings per polygon (all polygons, feature-major); polys_per_feat:
    polygons per feature."""
    n = len(ids)
    if n == 0:
        return pa.array([], type=pa.binary())
    geom_code = 6 if dim == 2 else (6 << 4) | dim
    if ((np.asarray(ring_nv) <= 0).any() or (np.asarray(rings_per_poly) <= 0).any()
            or (np.asarray(polys_per_feat) <= 0).any()):
        raise ValueError("empty ring/polygon/feature; filter before encoding")

    q = core.quantize_vec(coords).reshape(-1, dim)
    R = len(ring_nv)
    P = len(rings_per_poly)
    v_starts = np.zeros(R, dtype=np.int64)
    np.cumsum(ring_nv[:-1], out=v_starts[1:])
    d = np.empty_like(q)
    d[0] = q[0]
    d[1:] = q[1:] - q[:-1]
    d[v_starts] = q[v_starts]
    zz = core.zigzag_vec(d.reshape(-1))

    # token stream: per poly [nrings, per ring [cnt, deltas…]]
    ring_tok_counts = 1 + ring_nv * dim                      # per ring
    poly_ring_start = np.zeros(P, dtype=np.int64)
    np.cumsum(rings_per_poly[:-1], out=poly_ring_start[1:])
    poly_tok_counts = 1 + np.add.reduceat(ring_tok_counts, poly_ring_start)
    poly_tok_offs = np.zeros(P, dtype=np.int64)
    np.cumsum(poly_tok_counts[:-1], out=poly_tok_offs[1:])
    total_toks = int(poly_tok_counts.sum())
    tokens = np.empty(total_toks, dtype=np.uint64)
    filled = np.zeros(total_toks, dtype=bool)
    tokens[poly_tok_offs] = rings_per_poly.astype(np.uint64)
    filled[poly_tok_offs] = True
    # ring count tokens: offset of each ring inside the stream
    ring_tok_offs = np.zeros(R, dtype=np.int64)
    np.cumsum(ring_tok_counts[:-1], out=ring_tok_offs[1:])
    # rings shift right by the number of poly-header tokens before them:
    # ring g belongs to poly p(g) → +p(g)+1 headers
    p_of_ring = np.repeat(np.arange(P), rings_per_poly)
    ring_pos = ring_tok_offs + p_of_ring + 1
    tokens[ring_pos] = (ring_nv * dim).astype(np.uint64)
    filled[ring_pos] = True
    tokens[~filled] = zz

    feat_poly_start = np.zeros(n, dtype=np.int64)
    np.cumsum(polys_per_feat[:-1], out=feat_poly_start[1:])
    feat_tok_start = poly_tok_offs[feat_poly_start]
    feat_tok_counts = np.add.reduceat(poly_tok_counts, feat_poly_start)
    feat_ring_start = poly_ring_start[feat_poly_start]
    feat_v_start = v_starts[feat_ring_start]
    minx = np.minimum.reduceat(q[:, 0], feat_v_start)
    maxx = np.maximum.reduceat(q[:, 0], feat_v_start)
    miny = np.minimum.reduceat(q[:, 1], feat_v_start)
    maxy = np.maximum.reduceat(q[:, 1], feat_v_start)
    bbox_zz = core.zigzag_vec(np.stack([minx, miny, maxx, maxy], axis=1).reshape(-1))

    mid, lid = _varint_matrix(ids.astype(np.uint64))
    mg, lg = _varint_matrix(tokens)
    mb, lb = _varint_matrix(bbox_zz)
    glen = np.add.reduceat(lg, feat_tok_start)
    blen = lb.reshape(n, 4).sum(axis=1)
    mgl, lgl = _varint_matrix(glen.astype(np.uint64))
    mbl, lbl = _varint_matrix(blen.astype(np.uint64))

    total = 1 + lid + 2 + 1 + lgl + glen + 1 + lbl + blen
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(total, out=offsets[1:])
    buf = np.empty(offsets[-1], dtype=np.uint8)
    w = _FrameWriter(buf, offsets[:-1])
    put_const, put_mat = w.const, w.mat
    put_segmented = w.segmented

    put_const(8)
    put_mat(mid, lid)
    put_const(24)
    put_const(geom_code)
    put_const(34)
    put_mat(mgl, lgl)
    put_segmented(mg, lg, feat_tok_start, feat_tok_counts, glen)
    put_const(42)
    put_mat(mbl, lbl)
    put_segmented(mb, lb, np.arange(n) * 4, np.full(n, 4), blen)
    assert np.array_equal(w.pos, offsets[1:])

    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(buf.tobytes())],
    )


def decode_multipolygons_kernel(frames: pa.Array):
    """Decode N MultiPolygon frames → (ids, flat quantized coords, ring_nv,
    rings_per_poly, polys_per_feat, dim).

    Two-level jump walk: each round, every active feature consumes either a
    polygon header token or one whole ring — vectorized per round."""
    n, ids, codes, tokens, first, counts = _tokenize_geometry(frames)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e, e, e, 2
    code0 = int(codes[0])
    if not np.all(codes == code0):
        raise ValueError("mixed geom-code batch; use decode_geometries")
    return _multipolygons_core(ids, code0, tokens, first, counts)


def _multipolygons_core(ids: np.ndarray, code0: int, tokens: np.ndarray,
                        first: np.ndarray, counts: np.ndarray):
    n = len(ids)
    if not (code0 == 6 or (code0 > 6 and code0 >> 4 == 6)):
        raise ValueError("not a MultiPolygon batch")
    dim = 2 if code0 <= 6 else code0 & 0xF

    g_end = first + counts
    pos = first.copy()
    rings_left = np.zeros(n, dtype=np.int64)
    polys_per_feat = np.zeros(n, dtype=np.int64)
    # event logs (round-ordered); reordered feature-major afterwards
    poly_feat, poly_nr, poly_seq = [], [], []
    ring_feat, ring_start_tok, ring_nv_l, ring_seq = [], [], [], []
    seq = np.zeros(n, dtype=np.int64)  # per-feature event counter
    active = np.flatnonzero(pos < g_end)
    while len(active):
        hdr = active[rings_left[active] == 0]
        rng = active[rings_left[active] > 0]
        if len(hdr):
            nr = tokens[pos[hdr]].astype(np.int64)
            poly_feat.append(hdr.copy()); poly_nr.append(nr); poly_seq.append(seq[hdr].copy())
            polys_per_feat[hdr] += 1
            rings_left[hdr] = nr
            pos[hdr] += 1
            seq[hdr] += 1
        if len(rng):
            cnt = tokens[pos[rng]].astype(np.int64)
            ring_feat.append(rng.copy()); ring_start_tok.append(pos[rng] + 1)
            ring_nv_l.append(cnt // dim); ring_seq.append(seq[rng].copy())
            rings_left[rng] -= 1
            pos[rng] += 1 + cnt
            seq[rng] += 1
        active = active[pos[active] < g_end[active]]

    # feature-major, stream-ordered reconstruction
    pf = np.concatenate(poly_feat); pn = np.concatenate(poly_nr); ps = np.concatenate(poly_seq)
    po = np.lexsort((ps, pf))
    rings_per_poly = pn[po]
    if ring_feat:
        rf = np.concatenate(ring_feat); rs = np.concatenate(ring_start_tok)
        rnv = np.concatenate(ring_nv_l); rq = np.concatenate(ring_seq)
        ro = np.lexsort((rq, rf))
        rf, rs, rnv = rf[ro], rs[ro], rnv[ro]
    else:
        rnv = np.empty(0, dtype=np.int64); rs = rnv

    tok_counts = rnv * dim
    R = len(rnv)
    starts = np.zeros(R, dtype=np.int64)
    np.cumsum(tok_counts[:-1], out=starts[1:])
    big = np.repeat(np.arange(R), tok_counts)
    t = np.arange(int(tok_counts.sum()), dtype=np.int64) - starts[big]
    d = core.unzigzag_vec(tokens[rs[big] + t]).reshape(-1, dim)
    v_starts = np.zeros(R, dtype=np.int64)
    np.cumsum(rnv[:-1], out=v_starts[1:])
    c = np.cumsum(d, axis=0)
    base = np.zeros((R, dim), dtype=np.int64)
    base[1:] = c[v_starts[1:] - 1]
    coords_q = c - np.repeat(base, rnv, axis=0)
    return ids, coords_q.reshape(-1), rnv, rings_per_poly, polys_per_feat, dim


# ---------------------------------------------------------------------------
# mixed-batch dispatch: group frames by geom code, run each group through
# its specialized kernel — heterogeneous batches stay vectorized instead of
# dropping to the per-feature generic path.
# ---------------------------------------------------------------------------

QUANT_GEOM_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("geom_type", T.IntegerType()),
    T.StructField("dim", T.IntegerType()),
    T.StructField("coords_q", T.ArrayType(T.LongType())),
    T.StructField("ring_lens", T.ArrayType(T.IntegerType())),
    T.StructField("part_rings", T.ArrayType(T.IntegerType())),
])


def _frame_geom_codes(frames: pa.Array) -> np.ndarray:
    """Geom code of every frame without full decode — a field walk, so
    frames with properties or without an id field parse correctly (the
    old fixed-offset scan misread the first property byte as the code)."""
    combined = pa.concat_arrays([frames.cast(pa.binary())])
    flat = np.frombuffer(combined.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(combined.buffers()[1], dtype=np.int32)
    n = len(combined)
    starts = offs[combined.offset : combined.offset + n].astype(np.int64)
    ends = offs[combined.offset + 1 : combined.offset + n + 1].astype(np.int64)
    codes = np.full(n, -1, dtype=np.int64)
    for active, tag, pstart, plen, v, _ in frame_fields_walk(flat, starts, ends):
        is_code = tag == 0x18
        if is_code.any():
            sel = active[is_code]
            first = codes[sel] < 0
            codes[sel[first]] = v[is_code][first].astype(np.int64)
    if (codes < 0).any():
        raise ValueError("frame without a geometry-type field")
    return codes


def _decode_code_group(code0: int, gids: np.ndarray, toks: np.ndarray,
                       first: np.ndarray, cnt: np.ndarray) -> dict:
    """Decode one homogeneous-geom-code group of payload-token frames →
    flat columnar pieces plus per-feature segment lengths:
    ids, gt, dim, coords_q (flat int64), feat_v (vertices/feature),
    ring_nv + rings_pf (ring lengths & rings/feature), pvals + parts_pf
    (part_rings values & parts/feature)."""
    gt = code0 if code0 <= 6 else code0 >> 4
    m = len(gids)
    ones = np.ones(m, dtype=np.int64)
    if gt == 1:
        if (cnt != 2).any():
            raise ValueError("point frame with != 2 geometry values")
        coords = core.unzigzag_vec(toks)
        return dict(ids=gids, gt=1, dim=2,  # writepointbs drops dims > 2
                    coords_q=coords, feat_v=ones, ring_nv=ones,
                    rings_pf=ones, pvals=ones, parts_pf=ones)
    if gt in (2, 4):
        ids, coords, nv = _lines_core(gids, code0, toks, cnt)
        dim = 2 if code0 <= 6 else code0 & 0xF
        return dict(ids=ids, gt=gt, dim=dim, coords_q=coords, feat_v=nv,
                    ring_nv=nv, rings_pf=ones, pvals=ones, parts_pf=ones)
    if gt in (3, 5):
        ids, coords, ring_nv, rpf, _, dim = _rings_core(
            gids, code0, toks, first, cnt)
        ring_off = np.zeros(m, dtype=np.int64)
        np.cumsum(rpf[:-1], out=ring_off[1:])
        feat_v = (np.add.reduceat(ring_nv, ring_off) if len(ring_nv)
                  else np.zeros(m, np.int64))
        return dict(ids=ids, gt=gt, dim=dim, coords_q=coords, feat_v=feat_v,
                    ring_nv=ring_nv, rings_pf=rpf, pvals=rpf, parts_pf=ones)
    if gt == 6:
        ids, coords, ring_nv, rpp, ppf, dim = _multipolygons_core(
            gids, code0, toks, first, cnt)
        poly_off = np.zeros(m, dtype=np.int64)
        np.cumsum(ppf[:-1], out=poly_off[1:])
        rings_pf = (np.add.reduceat(rpp, poly_off) if len(rpp)
                    else np.zeros(m, np.int64))
        ring_off = np.zeros(m, dtype=np.int64)
        np.cumsum(rings_pf[:-1], out=ring_off[1:])
        feat_v = (np.add.reduceat(ring_nv, ring_off) if len(ring_nv)
                  else np.zeros(m, np.int64))
        return dict(ids=ids, gt=6, dim=dim, coords_q=coords, feat_v=feat_v,
                    ring_nv=ring_nv, rings_pf=rings_pf, pvals=rpp,
                    parts_pf=ppf)
    raise ValueError(f"unknown geom type {gt}")


def decode_geometries(df: DataFrame, bin_col: str = "geobuf") -> DataFrame:
    """Decode MIXED geobuf geometry frames → quantized columnar rows.

    ONE field walk + payload tokenize per Arrow batch, then group by the
    FULL geom code — mixed dims and frames carrying properties / bbox /
    any field order all stay on vectorized kernels (points / line-shaped /
    ring-shaped / nested MultiPolygon). Output order within a batch is
    regrouped by code — set semantics, like every distributed decode."""

    def _dec(batches):
        for batch in batches:
            frames = batch.column(batch.schema.get_field_index(bin_col))
            frames = pa.concat_arrays([frames.cast(pa.binary())])
            if len(frames) == 0:
                continue
            _, all_ids, codes, all_tok, all_first, all_cnt = \
                _tokenize_geometry(frames)
            for code in np.unique(codes):
                sel = np.flatnonzero(codes == code)
                toks, first, cnt = _gather_token_group(
                    all_tok, all_first, all_cnt, sel)
                g = _decode_code_group(int(code), all_ids[sel], toks, first, cnt)
                m = len(g["ids"])
                coord_off = np.zeros(m + 1, dtype=np.int32)
                np.cumsum(g["feat_v"] * g["dim"], out=coord_off[1:])
                carr = pa.ListArray.from_arrays(
                    pa.array(coord_off, type=pa.int32()),
                    pa.array(g["coords_q"], type=pa.int64()))
                ring_off = np.zeros(m + 1, dtype=np.int32)
                np.cumsum(g["rings_pf"], out=ring_off[1:])
                rarr = pa.ListArray.from_arrays(
                    pa.array(ring_off, type=pa.int32()),
                    pa.array(g["ring_nv"].astype(np.int32), type=pa.int32()))
                part_off = np.zeros(m + 1, dtype=np.int32)
                np.cumsum(g["parts_pf"], out=part_off[1:])
                parr = pa.ListArray.from_arrays(
                    pa.array(part_off, type=pa.int32()),
                    pa.array(g["pvals"].astype(np.int32), type=pa.int32()))
                yield pa.RecordBatch.from_arrays([
                    pa.array(g["ids"], type=pa.int64()),
                    pa.array(np.full(m, g["gt"], dtype=np.int32)),
                    pa.array(np.full(m, g["dim"], dtype=np.int32)),
                    carr, rarr, parr,
                ], names=[f.name for f in QUANT_GEOM_SCHEMA.fields])

    return df.select(bin_col).mapInArrow(_dec, QUANT_GEOM_SCHEMA)


def decode_features_fast(df: DataFrame, bin_col: str = "geobuf") -> DataFrame:
    """Geobuf frames → GEOM_SCHEMA rows with VECTORIZED geometry decode.

    The per-feature generic decoder costs a Python loop over every vertex
    list; here geometry goes through the payload-token batch kernels
    (reader.go:84-112 streaming scan, batched) and only the dynamic-schema
    properties parse per frame (a short walk over the props region —
    geometry/bbox bytes are jumped via their length prefixes).

    Float coords come from the exact integer lattice (go_round7(q/1e7))
    rather than the reference's per-vertex float accumulation — identical
    on every lattice value, without the reference's ≤2e-7 accumulation
    drift (geom.go:78-90 discussion in SURVEY §1.3)."""
    import json

    def _dec(batches):
        for batch in batches:
            frames = batch.column(batch.schema.get_field_index(bin_col))
            frames = pa.concat_arrays([frames.cast(pa.binary())])
            nrows = len(frames)
            if nrows == 0:
                continue
            _, all_ids, codes, all_tok, all_first, all_cnt = \
                _tokenize_geometry(frames, allow_missing=True)
            # group results, scattered back to original row order
            gt_r = np.zeros(nrows, np.int32)
            dim_r = np.full(nrows, 2, dtype=np.int32)  # bare frames: dim 2
            c_len = np.zeros(nrows, np.int64)
            c_start = np.zeros(nrows, np.int64)
            r_len = np.zeros(nrows, np.int64)
            r_start = np.zeros(nrows, np.int64)
            p_len = np.zeros(nrows, np.int64)
            p_start = np.zeros(nrows, np.int64)
            big_c, big_r, big_p = [], [], []
            cbase = rbase = pbase = 0
            for code in np.unique(codes):
                if code < 0:
                    # bare-properties frames: geom_type 0, empty geometry
                    # (decode_feature parity for all-optional fields)
                    continue
                sel = np.flatnonzero(codes == code)
                toks, first, cnt = _gather_token_group(
                    all_tok, all_first, all_cnt, sel)
                g = _decode_code_group(int(code), all_ids[sel], toks, first, cnt)
                gt_r[sel] = g["gt"]
                dim_r[sel] = g["dim"]
                cl = g["feat_v"] * g["dim"]
                off = np.zeros(len(sel), np.int64)
                np.cumsum(cl[:-1], out=off[1:])
                c_len[sel], c_start[sel] = cl, cbase + off
                off = np.zeros(len(sel), np.int64)
                np.cumsum(g["rings_pf"][:-1], out=off[1:])
                r_len[sel], r_start[sel] = g["rings_pf"], rbase + off
                off = np.zeros(len(sel), np.int64)
                np.cumsum(g["parts_pf"][:-1], out=off[1:])
                p_len[sel], p_start[sel] = g["parts_pf"], pbase + off
                big_c.append(g["coords_q"])
                big_r.append(g["ring_nv"])
                big_p.append(g["pvals"])
                cbase += len(g["coords_q"])
                rbase += len(g["ring_nv"])
                pbase += len(g["pvals"])
            bc = np.concatenate(big_c) if big_c else np.empty(0, np.int64)
            br = np.concatenate(big_r) if big_r else np.empty(0, np.int64)
            bp = np.concatenate(big_p) if big_p else np.empty(0, np.int64)

            def _reorder(vals, starts, lens, out_dtype):
                off = np.zeros(nrows + 1, np.int64)
                np.cumsum(lens, out=off[1:])
                gather = (np.repeat(starts, lens)
                          + np.arange(int(off[-1]), dtype=np.int64)
                          - np.repeat(off[:-1], lens))
                return off, vals[gather].astype(out_dtype)

            c_off, c_vals = _reorder(bc, c_start, c_len, np.int64)
            coords_f = core.go_round7(c_vals.astype(np.float64) / 1e7)
            r_off, r_vals = _reorder(br, r_start, r_len, np.int32)
            p_off, p_vals = _reorder(bp, p_start, p_len, np.int32)

            props_json = pa.array(
                [json.dumps(core.decode_properties(
                    np.frombuffer(frames[i].as_py(), dtype=np.uint8)),
                    sort_keys=True) for i in range(nrows)],
                type=pa.string())
            yield pa.RecordBatch.from_arrays([
                pa.array(all_ids, type=pa.int64()),
                pa.array(gt_r), pa.array(dim_r),
                pa.ListArray.from_arrays(
                    pa.array(c_off.astype(np.int32), type=pa.int32()),
                    pa.array(coords_f, type=pa.float64())),
                pa.ListArray.from_arrays(
                    pa.array(r_off.astype(np.int32), type=pa.int32()),
                    pa.array(r_vals, type=pa.int32())),
                pa.ListArray.from_arrays(
                    pa.array(p_off.astype(np.int32), type=pa.int32()),
                    pa.array(p_vals, type=pa.int32())),
                props_json,
            ], names=[f.name for f in GEOM_SCHEMA.fields])

    return df.select(bin_col).mapInArrow(_dec, GEOM_SCHEMA)


# ---------------------------------------------------------------------------
# properties on the hot path — key/value tables (write_feature.go:180-189,
# write_primitives.go:244-286) encoded vectorized for FIXED prop schemas
# (the web-page shape: every row carries the same keys, e.g. url/lang).
# ---------------------------------------------------------------------------

def encode_points_props_kernel(ids: np.ndarray, lon: np.ndarray, lat: np.ndarray,
                               props: list) -> pa.Array:
    """Encode N point features with fixed-schema properties.

    props: list of (key: str, kind: 'str'|'int', data) where data is
    (flat_utf8: uint8 array, offsets: int64 array len N+1) for 'str' or an
    int64 array for 'int'. Wire order follows WriteFeature: id(1),
    properties(2, one KeyValue per key), type(3), geometry(4), bbox(5)."""
    n = len(ids)
    qx, qy = core.quantize_vec(lon), core.quantize_vec(lat)
    zx, zy = core.zigzag_vec(qx), core.zigzag_vec(qy)
    mid, lid = _varint_matrix(ids.astype(np.uint64))
    mx, lx = _varint_matrix(zx)
    my, ly = _varint_matrix(zy)
    glen = lx + ly
    blen = 2 * glen
    mgl, lgl = _varint_matrix(glen.astype(np.uint64))
    mbl, lbl = _varint_matrix(blen.astype(np.uint64))

    # per-prop length arithmetic + varint matrices
    enc_props = []
    props_total = np.zeros(n, dtype=np.int64)
    for key, kind, data in props:
        kb = key.encode("utf-8")
        if len(kb) >= 128:
            raise ValueError("property key too long")
        if kind == "str":
            flat, offs = data
            slen = offs[1:] - offs[:-1]
            msl, lsl = _varint_matrix(slen.astype(np.uint64))
            val_inner = 1 + lsl + slen            # 0x0A slen s
            mvi, lvi = _varint_matrix(val_inner.astype(np.uint64))
            inner = (2 + len(kb)) + 1 + lvi + val_inner  # key part + 0x12 vi …
            min_, lin = _varint_matrix(inner.astype(np.uint64))
            total = 1 + lin + inner
            enc_props.append((kb, kind, (flat, offs, slen, msl, lsl, mvi, lvi, min_, lin)))
        elif kind == "int":
            mv, lv = _varint_matrix(data.astype(np.uint64))
            val_inner = 1 + lv                    # 0x20 varint(v)
            mvi, lvi = _varint_matrix(val_inner.astype(np.uint64))
            inner = (2 + len(kb)) + 1 + lvi + val_inner
            min_, lin = _varint_matrix(inner.astype(np.uint64))
            total = 1 + lin + inner
            enc_props.append((kb, kind, (mv, lv, mvi, lvi, min_, lin)))
        elif kind == "float":
            # FloatVal64 (write_primitives.go:228-240): 0x19 + 8 LE bytes
            le = np.ascontiguousarray(data, dtype="<f8").view(np.uint8).reshape(n, 8)
            inner = np.full(n, (2 + len(kb)) + 2 + 9, dtype=np.int64)  # 0x12 0x09 0x19 + 8
            min_, lin = _varint_matrix(inner.astype(np.uint64))
            total = 1 + lin + inner
            enc_props.append((kb, kind, (le, min_, lin)))
        else:
            raise ValueError(f"unsupported prop kind {kind!r}")
        props_total += total

    total = 1 + lid + props_total + 2 + 1 + lgl + glen + 1 + lbl + blen
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(total, out=offsets[1:])
    buf = np.empty(offsets[-1], dtype=np.uint8)
    w = _FrameWriter(buf, offsets[:-1])
    put_const, put_mat = w.const, w.mat

    def put_payload(flat, offs, slen):
        # byte-level segmented copy: Arrow utf8 payload is contiguous
        # row-major, so src is one arange; dst re-bases each row at w.pos[i]
        nb = int(slen.sum())
        if nb:
            row_of_byte = np.repeat(np.arange(n), slen)
            local = np.arange(nb, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(slen)[:-1])), slen)
            buf[w.pos[row_of_byte] + local] = flat[int(offs[0]) + np.arange(nb)]
        w.pos = w.pos + slen

    put_const(8)
    put_mat(mid, lid)
    for kb, kind, packed in enc_props:
        if kind == "str":
            flat, offs, slen, msl, lsl, mvi, lvi, min_, lin = packed
            put_const(0x12); put_mat(min_, lin)
            put_const(0x0A); put_const(len(kb))
            for b in kb:
                put_const(b)
            put_const(0x12); put_mat(mvi, lvi)
            put_const(0x0A); put_mat(msl, lsl)
            put_payload(flat, offs, slen)
        elif kind == "int":
            mv, lv, mvi, lvi, min_, lin = packed
            put_const(0x12); put_mat(min_, lin)
            put_const(0x0A); put_const(len(kb))
            for b in kb:
                put_const(b)
            put_const(0x12); put_mat(mvi, lvi)
            put_const(0x20); put_mat(mv, lv)
        else:  # float64
            le, min_, lin = packed
            put_const(0x12); put_mat(min_, lin)
            put_const(0x0A); put_const(len(kb))
            for b in kb:
                put_const(b)
            put_const(0x12); put_const(9)
            put_const(0x19)
            put_mat(le, np.full(n, 8, dtype=np.int64))
    put_const(24)
    put_const(1)
    put_const(34)
    put_mat(mgl, lgl)
    put_mat(mx, lx); put_mat(my, ly)
    put_const(42)
    put_mat(mbl, lbl)
    put_mat(mx, lx); put_mat(my, ly); put_mat(mx, lx); put_mat(my, ly)
    assert np.array_equal(w.pos, offsets[1:])
    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(buf.tobytes())],
    )


def encode_points_with_props(df: DataFrame, id_col: str = "doc_id",
                             lon: str = "lon", lat: str = "lat",
                             props: list | None = None,
                             out: str = "geobuf") -> DataFrame:
    """(id, lon, lat, props…) → (id, geobuf) with the fixed-schema property
    table encoded vectorized (no per-row Python). String and integer
    property columns are supported — the web-page shape (url, lang, …)."""
    props = props or []
    kinds = {}
    for f in df.schema.fields:
        if f.name in props:
            if isinstance(f.dataType, T.StringType):
                kinds[f.name] = "str"
            elif isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType)):
                kinds[f.name] = "int"
            elif isinstance(f.dataType, (T.DoubleType, T.FloatType)):
                kinds[f.name] = "float"
            else:
                raise ValueError(f"unsupported property type for {f.name}: {f.dataType}")
    missing = [p for p in props if p not in kinds]
    if missing:
        raise ValueError(f"property columns not in DataFrame: {missing}")

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField(out, T.BinaryType()),
    ])
    cols = [id_col, lon, lat] + list(props)

    def _enc(batches):
        for batch in batches:
            for ci, cname in enumerate(cols):
                if batch.column(ci).null_count:
                    # a null int64 round-trips through float64 NaN into
                    # INT64_MIN garbage, and a null string's offsets read
                    # as "" — corruption, not data. Fixed-schema contract:
                    # the caller drops or fills nulls first.
                    raise ValueError(
                        f"encode_points_with_props: column {cname!r} has "
                        "null values; geobuf KeyValue has no null encoding "
                        "— filter or fill before encoding")
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            lons = batch.column(1).to_numpy(zero_copy_only=False).astype(np.float64)
            lats = batch.column(2).to_numpy(zero_copy_only=False).astype(np.float64)
            plist = []
            for k, name in enumerate(props):
                arr = batch.column(3 + k)
                if kinds[name] == "str":
                    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
                    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
                        arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
                    flat = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
                    plist.append((name, "str", (flat, offs)))
                elif kinds[name] == "int":
                    plist.append((name, "int",
                                  arr.to_numpy(zero_copy_only=False).astype(np.int64)))
                else:
                    plist.append((name, "float",
                                  arr.to_numpy(zero_copy_only=False).astype(np.float64)))
            frames = encode_points_props_kernel(ids, lons, lats, plist)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), frames], names=[id_col, out]
            )

    return df.select(*cols).mapInArrow(_enc, schema)


# ---------------------------------------------------------------------------
# lazy partial reads over raw frames — LazyFeatureTileID semantics
# (split_combine.go:333-370): decode EXACTLY one property, skipping the
# geometry/bbox bytes entirely; ReadKeys (reader.go:120-142) as the
# all-keys variant. Vectorized: bounded rounds of tag-length jumps.
# ---------------------------------------------------------------------------

def _read_varint_at(flat: np.ndarray, pos: np.ndarray):
    """Vectorized varint read at positions `pos` → (values, byte lengths)."""
    vals = np.zeros(len(pos), dtype=np.uint64)
    lens = np.zeros(len(pos), dtype=np.int64)
    done = np.zeros(len(pos), dtype=bool)
    last = len(flat) - 1
    for j in range(10):
        # clamp: rows already done may point past the buffer (a varint that
        # ends exactly at the frame/buffer boundary)
        b = flat[np.minimum(pos + j, last)]
        use = ~done
        vals[use] |= (b[use].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
        fin = use & (b < 0x80)
        lens[fin] = j + 1
        done |= fin
        if done.all():
            break
    return vals, lens


def lazy_prop_kernel(frames: pa.Array, key: str, max_props: int = 32):
    """(ids, found mask, str values or int values) — walk only the props
    region of each frame; geometry and bbox bytes are never touched.

    Returns (ids int64, kinds int8 per frame: 0=absent, 1=str, 2=int,
    3=float, str_list, int_vals, float_vals). Each frame contributes its
    FIRST property matching `key`."""
    combined = pa.concat_arrays([frames.cast(pa.binary())])
    n = len(combined)
    kb = np.frombuffer(key.encode("utf-8"), dtype=np.uint8)
    klen = len(kb)
    if n == 0:
        return (np.empty(0, np.int64), np.zeros(0, np.int8), [],
                np.empty(0, np.int64), np.empty(0, np.float64))
    flat = np.frombuffer(combined.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(combined.buffers()[1], dtype=np.int32)
    starts = offs[combined.offset : combined.offset + n].astype(np.int64)
    ends = offs[combined.offset + 1 : combined.offset + n + 1].astype(np.int64)

    # id field (tag 0x08) is optional (core.encode_feature with id=None)
    has_id = flat[np.minimum(starts, len(flat) - 1)] == 0x08
    pos = starts.copy()
    ids_u = np.zeros(n, dtype=np.uint64)
    if has_id.any():
        iv, il = _read_varint_at(flat, starts[has_id] + 1)
        ids_u[has_id] = iv
        pos[has_id] = starts[has_id] + 1 + il

    kinds = np.zeros(n, dtype=np.int8)
    sval_start = np.zeros(n, dtype=np.int64)
    sval_len = np.zeros(n, dtype=np.int64)
    ival = np.zeros(n, dtype=np.int64)
    fval = np.zeros(n, dtype=np.float64)

    active = np.flatnonzero((pos < ends) & (flat[np.minimum(pos, len(flat) - 1)] == 0x12))
    for _round in range(max_props):
        if len(active) == 0:
            break
        if _round == max_props - 1:
            raise ValueError(
                f"frame with more than {max_props} properties — raise "
                "max_props (silent truncation would read as a missing key)")
        p = pos[active]
        L, ll = _read_varint_at(flat, p + 1)
        inner = p + 1 + ll              # at 0x0A
        # klen is a varint (multi-byte for keys >= 128 chars) — a single
        # byte load misparses reference-written frames silently
        frame_klen, kll = _read_varint_at(flat, inner + 1)
        key_match = frame_klen.astype(np.int64) == klen
        if key_match.any():
            cand = active[key_match]
            kstart = inner[key_match] + 1 + kll[key_match]
            eq = np.ones(len(cand), dtype=bool)
            for j in range(klen):
                eq &= flat[kstart + j] == kb[j]
            hit = cand[eq & (kinds[cand] == 0)]
            if len(hit):
                # value message begins after the key: 0x12 vlen <field>
                hpos = pos[hit]
                hL, hll = _read_varint_at(flat, hpos + 1)
                hinner = hpos + 1 + hll        # at 0x0A
                hklen, hkll = _read_varint_at(flat, hinner + 1)
                vmsg = hinner + 1 + hkll + hklen.astype(np.int64)  # at 0x12
                vlen, vll = _read_varint_at(flat, vmsg + 1)
                vfield = vmsg + 1 + vll        # first byte of the value body
                tag = flat[vfield]
                is_str = tag == 0x0A
                is_int = tag == 0x20
                is_flt = tag == 0x19
                if is_str.any():
                    h = hit[is_str]
                    slen, sll = _read_varint_at(flat, vfield[is_str] + 1)
                    kinds[h] = 1
                    sval_start[h] = vfield[is_str] + 1 + sll
                    sval_len[h] = slen.astype(np.int64)
                if is_int.any():
                    h = hit[is_int]
                    u, _ = _read_varint_at(flat, vfield[is_int] + 1)
                    v = u.astype(np.int64)  # two's complement wrap
                    kinds[h] = 2
                    ival[h] = v
                if is_flt.any():
                    h = hit[is_flt]
                    b8 = np.stack([flat[vfield[is_flt] + 1 + j] for j in range(8)], axis=1)
                    kinds[h] = 3
                    fval[h] = np.ascontiguousarray(b8).view("<f8").reshape(-1)
        pos[active] = p + 1 + ll + L
        nx = pos[active]
        still = (nx < ends[active]) & (flat[np.minimum(nx, len(flat) - 1)] == 0x12)
        active = active[still]

    strs = [
        bytes(flat[sval_start[i] : sval_start[i] + sval_len[i]]).decode("utf-8")
        if kinds[i] == 1 else None
        for i in range(n)
    ]
    return ids_u.astype(np.int64), kinds, strs, ival, fval


def lazy_property(df: DataFrame, key: str, bin_col: str = "geobuf",
                  value_type: str = "string") -> DataFrame:
    """Extract one property per frame from a geobuf binary column without
    decoding geometry — (id, <key>). value_type: string|bigint|double."""
    spark_t = {"string": T.StringType(), "bigint": T.LongType(),
               "double": T.DoubleType()}[value_type]
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField(key, spark_t),
    ])

    def _lazy(batches):
        for batch in batches:
            frames = batch.column(batch.schema.get_field_index(bin_col))
            ids, kinds, strs, ivals, fvals = lazy_prop_kernel(frames, key)
            if value_type == "string":
                col = pa.array(strs, type=pa.string())
            elif value_type == "bigint":
                col = pa.array([int(ivals[i]) if kinds[i] == 2 else None
                                for i in range(len(ids))], type=pa.int64())
            else:
                col = pa.array([float(fvals[i]) if kinds[i] == 3 else None
                                for i in range(len(ids))], type=pa.float64())
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), col], names=["id", key])

    return df.select(bin_col).mapInArrow(_lazy, schema)


def frame_fields_walk(flat: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                      max_fields: int = 64):
    """Field-level walk over frames: yields per round (active frame idx,
    tag byte, field payload start, payload length). Varint fields report
    length 0 with start at the varint."""
    n = len(starts)
    pos = starts.copy()
    rounds = []
    active = np.flatnonzero(pos < ends)
    for _round in range(max_fields):
        if len(active) == 0:
            break
        if _round == max_fields - 1:
            raise ValueError(
                f"frame with more than {max_fields} fields — raise max_fields "
                "(silent truncation would read as missing data)")
        p = pos[active]
        tag = flat[p]
        wire = tag & 0x7
        # varint fields (wire 0): value right after tag
        v, vl = _read_varint_at(flat, p + 1)
        is_len = wire == 2
        plen = np.where(is_len, v.astype(np.int64), 0)
        pstart = p + 1 + np.where(is_len, vl, 0)
        rounds.append((active.copy(), tag.copy(), pstart, plen, v, vl))
        pos[active] = np.where(is_len, pstart + plen, p + 1 + vl)
        # a field whose payload jump lands past its frame boundary would
        # otherwise drop out of the walk silently — with its tail bytes
        # unparsed, a truncated frame could still decode (e.g. a clipped
        # trailing bbox) instead of failing
        over = pos[active] > ends[active]
        if over.any():
            raise ValueError(
                f"{int(over.sum())} frame(s) with a field payload running "
                "past the frame end — truncated or corrupt input")
        active = active[pos[active] < ends[active]]
    return rounds


def frame_keys_kernel(frames: pa.Array):
    """ReadKeys (reader.go:120-142): property KEYS only — values and
    geometry are skipped. Returns (row_idx, keys list[str])."""
    combined = pa.concat_arrays([frames.cast(pa.binary())])
    n = len(combined)
    if n == 0:
        return np.empty(0, np.int64), []
    flat = np.frombuffer(combined.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(combined.buffers()[1], dtype=np.int32)
    starts = offs[combined.offset : combined.offset + n].astype(np.int64)
    ends = offs[combined.offset + 1 : combined.offset + n + 1].astype(np.int64)
    rows, keys = [], []
    for active, tag, pstart, plen, _, _ in frame_fields_walk(flat, starts, ends):
        sel = tag == 0x12  # properties field
        if not sel.any():
            continue
        for i, ps, pl in zip(active[sel], pstart[sel], plen[sel]):
            # inside KeyValue: 0x0A varint(klen) key …
            kl, kp = core.decode_varint(flat, ps + 1)
            rows.append(int(i))
            keys.append(bytes(flat[kp : kp + kl]).decode("utf-8"))
    return np.asarray(rows, dtype=np.int64), keys


def frame_bbox_kernel(frames: pa.Array):
    """ReadBB (read_feature.go:103-134): bbox by forward field skip — the
    geometry field is JUMPED via its length prefix, its deltas never
    decoded. Returns (found mask, w, s, e, n quantized int64)."""
    combined = pa.concat_arrays([frames.cast(pa.binary())])
    n = len(combined)
    e = np.zeros(n, dtype=np.int64)
    found = np.zeros(n, dtype=bool)
    w, s_, e_, n_ = e.copy(), e.copy(), e.copy(), e.copy()
    if n == 0:
        return found, w, s_, e_, n_
    flat = np.frombuffer(combined.buffers()[2], dtype=np.uint8)
    offs = np.frombuffer(combined.buffers()[1], dtype=np.int32)
    starts = offs[combined.offset : combined.offset + n].astype(np.int64)
    ends = offs[combined.offset + 1 : combined.offset + n + 1].astype(np.int64)
    for active, tag, pstart, plen, _, _ in frame_fields_walk(flat, starts, ends):
        sel = tag == 0x2A
        if not sel.any():
            continue
        hit = active[sel]
        p = pstart[sel]
        vals = np.zeros((len(hit), 4), dtype=np.int64)
        for j in range(4):
            u, ul = _read_varint_at(flat, p)
            vals[:, j] = core.unzigzag_vec(u)
            p = p + ul
        found[hit] = True
        w[hit], s_[hit], e_[hit], n_[hit] = vals[:, 0], vals[:, 1], vals[:, 2], vals[:, 3]
    return found, w, s_, e_, n_


def frame_keys(df: DataFrame, bin_col: str = "geobuf") -> DataFrame:
    """Exploded (key) rows per frame — schema inference over raw frames."""
    schema = T.StructType([T.StructField("key", T.StringType())])

    def _k(batches):
        for batch in batches:
            frames = batch.column(batch.schema.get_field_index(bin_col))
            _, keys = frame_keys_kernel(frames)
            yield pa.RecordBatch.from_arrays([pa.array(keys, type=pa.string())], names=["key"])

    return df.select(bin_col).mapInArrow(_k, schema)


def frame_bbox(df: DataFrame, bin_col: str = "geobuf") -> DataFrame:
    """(w_q, s_q, e_q, n_q) per frame without decoding geometry; frames
    lacking a bbox field (old encoders) yield nulls."""
    schema = T.StructType([
        T.StructField("w_q", T.LongType()), T.StructField("s_q", T.LongType()),
        T.StructField("e_q", T.LongType()), T.StructField("n_q", T.LongType()),
    ])

    def _b(batches):
        for batch in batches:
            frames = batch.column(batch.schema.get_field_index(bin_col))
            found, w, s_, e_, n_ = frame_bbox_kernel(frames)
            def col(v):
                return pa.array([int(v[i]) if found[i] else None for i in range(len(v))],
                                type=pa.int64())
            yield pa.RecordBatch.from_arrays(
                [col(w), col(s_), col(e_), col(n_)], names=["w_q", "s_q", "e_q", "n_q"])

    return df.select(bin_col).mapInArrow(_b, schema)


def decode_points_any_kernel(frames: pa.Array):
    """Decode point frames REGARDLESS of extra fields (properties etc.):
    field-walk to the geometry payload per frame, gather those byte ranges
    into one contiguous buffer, single varint sweep → (ids, qx, qy).
    Stays fully vectorized where `decode_points_kernel`'s fixed 14-token
    layout would break."""
    n, ids, _codes, tokens, _first, counts = _tokenize_geometry(frames)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    if len(tokens) != 2 * n or (counts != 2).any():
        raise ValueError("not a point batch (geometry is not 2 values/frame)")
    tok = tokens.reshape(n, 2)
    return ids, core.unzigzag_vec(tok[:, 0]), core.unzigzag_vec(tok[:, 1])


def decode_points_any(df: DataFrame, bin_col: str = "geobuf",
                      id_col: str = "id") -> DataFrame:
    """DataFrame wrapper of `decode_points_any_kernel` — point frames with
    any extra fields → (id, lon_q, lat_q)."""
    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("lon_q", T.LongType()),
        T.StructField("lat_q", T.LongType()),
    ])

    def _dec(batches):
        for batch in batches:
            frames = batch.column(batch.schema.get_field_index(bin_col))
            ids, qx, qy = decode_points_any_kernel(frames)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), pa.array(qx, type=pa.int64()),
                 pa.array(qy, type=pa.int64())],
                names=[id_col, "lon_q", "lat_q"])

    return df.select(bin_col).mapInArrow(_dec, schema)
