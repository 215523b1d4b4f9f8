"""Clip geometries to rectangles — the TileMap/tileclip.ClipFeature seam
(split_combine.go:40, applied at :373-397): when a feature lands in k
tiles, each tile gets the feature CLIPPED to that tile's bounds.

Sutherland–Hodgman polygon clipping, vectorized across a whole batch of
rings with PER-RING clip rects: each of the 4 clip half-planes is one
pass over every vertex of every ring simultaneously (inside masks +
segment intersections + segmented rebuild) — no per-row or per-ring
Python anywhere in the kernel, so heterogeneous (feature, tile) rows all
clip in one call.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def clip_rings_kernel(coords: np.ndarray, ring_nv: np.ndarray,
                      minx, miny, maxx, maxy):
    """Clip R rings (flat interleaved x,y; ring_nv vertices each) to
    per-ring rects (minx…maxy: scalars or (R,) arrays). Returns
    (flat coords, ring_nv) — rings clipped away come back with 0 vertices."""
    xy = coords.reshape(-1, 2).astype(np.float64)
    R = len(ring_nv)
    ring_nv = np.asarray(ring_nv, dtype=np.int64)
    ring_of = np.repeat(np.arange(R), ring_nv)
    minx = np.broadcast_to(np.asarray(minx, np.float64), (R,))
    miny = np.broadcast_to(np.asarray(miny, np.float64), (R,))
    maxx = np.broadcast_to(np.asarray(maxx, np.float64), (R,))
    maxy = np.broadcast_to(np.asarray(maxy, np.float64), (R,))

    # (axis, sign, per-ring bound): keep sign*coord <= sign*bound
    planes = [(0, 1.0, maxx), (0, -1.0, minx), (1, 1.0, maxy), (1, -1.0, miny)]
    for axis, sign, bounds in planes:
        if len(xy) == 0:
            break
        counts = np.bincount(ring_of, minlength=R)
        starts = np.zeros(R, dtype=np.int64)
        starts[1:] = np.cumsum(counts)[:-1]
        idx = np.arange(len(xy))
        local = idx - starts[ring_of]
        prev_local = np.where(local == 0, counts[ring_of] - 1, local - 1)
        prev = starts[ring_of] + prev_local

        b = bounds[ring_of]
        cur_in = sign * xy[:, axis] <= sign * b + 1e-12
        prev_in = cur_in[prev]

        p, c = xy[prev], xy
        denom = c[:, axis] - p[:, axis]
        denom = np.where(np.abs(denom) < 1e-300, 1e-300, denom)
        t = (b - p[:, axis]) / denom
        inter = p + (c - p) * t[:, None]
        inter[:, axis] = b  # exact on the boundary

        emit_inter = cur_in != prev_in
        emit_vert = cur_in
        n_out = emit_inter.astype(np.int64) + emit_vert.astype(np.int64)
        out_off = np.zeros(len(xy) + 1, dtype=np.int64)
        np.cumsum(n_out, out=out_off[1:])
        total = int(out_off[-1])
        new_xy = np.empty((total, 2), dtype=np.float64)
        new_ring = np.empty(total, dtype=np.int64)
        sel_i = np.flatnonzero(emit_inter)
        new_xy[out_off[:-1][sel_i]] = inter[sel_i]
        new_ring[out_off[:-1][sel_i]] = ring_of[sel_i]
        pos_vert = out_off[:-1] + emit_inter.astype(np.int64)
        sel_v = np.flatnonzero(emit_vert)
        new_xy[pos_vert[sel_v]] = c[sel_v]
        new_ring[pos_vert[sel_v]] = ring_of[sel_v]
        xy, ring_of = new_xy, new_ring

    out_nv = np.bincount(ring_of, minlength=R).astype(np.int64) if len(xy) else \
        np.zeros(R, dtype=np.int64)
    # re-emit ring-major (bincount order == ring order already: passes keep
    # vertices grouped by ring because emission is positionally ordered)
    return xy.reshape(-1), out_nv


def clip_polygons(df: DataFrame, *, coords: str = "coords",
                  ring_lens: str = "ring_lens",
                  minx: str = "tminx", miny: str = "tminy",
                  maxx: str = "tmaxx", maxy: str = "tmaxy") -> DataFrame:
    """Clip each row's polygon rings to its own rect columns (the exploded
    tile-cover shape: one row per (feature, tile), rect = tile bounds).
    The whole Arrow batch clips in ONE kernel call; rows whose geometry is
    clipped away entirely are dropped, as are degenerate (<3 vertex)
    rings."""
    in_cols = df.columns
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name not in (coords, ring_lens)]
        + [T.StructField(coords, T.ArrayType(T.DoubleType())),
           T.StructField(ring_lens, T.ArrayType(T.IntegerType()))]
    )
    keep = [c for c in in_cols if c not in (coords, ring_lens)]
    ix = {c: in_cols.index(c) for c in in_cols}

    def _clip(batches):
        for batch in batches:
            carr = batch.column(ix[coords])
            rarr = batch.column(ix[ring_lens])
            n = len(carr)
            if n == 0:
                continue
            flat = carr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            ring_nv = rarr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            roffs = rarr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            rings_per_row = roffs[1:] - roffs[:-1]
            row_of_ring = np.repeat(np.arange(n), rings_per_row)

            bx0 = batch.column(ix[minx]).to_numpy(zero_copy_only=False)[row_of_ring]
            by0 = batch.column(ix[miny]).to_numpy(zero_copy_only=False)[row_of_ring]
            bx1 = batch.column(ix[maxx]).to_numpy(zero_copy_only=False)[row_of_ring]
            by1 = batch.column(ix[maxy]).to_numpy(zero_copy_only=False)[row_of_ring]

            out_c, out_nv = clip_rings_kernel(flat, ring_nv, bx0, by0, bx1, by1)

            # drop degenerate rings, rebuild per-row structure
            ring_keep = out_nv >= 3
            kept_nv = np.where(ring_keep, out_nv, 0)
            # coords of surviving rings: mask the vertex stream
            vert_ring = np.repeat(np.arange(len(out_nv)), out_nv)
            vmask = ring_keep[vert_ring]
            xy = out_c.reshape(-1, 2)[vmask]
            rows_nv = np.zeros(n, dtype=np.int64)
            np.add.at(rows_nv, row_of_ring, kept_nv)
            rows_nrings = np.zeros(n, dtype=np.int64)
            np.add.at(rows_nrings, row_of_ring, ring_keep.astype(np.int64))
            row_keep = rows_nrings > 0
            if not row_keep.any():
                continue

            take = pa.array(np.flatnonzero(row_keep))
            coffs = np.zeros(int(row_keep.sum()) + 1, dtype=np.int32)
            np.cumsum(rows_nv[row_keep] * 2, out=coffs[1:])
            roffs_out = np.zeros(int(row_keep.sum()) + 1, dtype=np.int32)
            np.cumsum(rows_nrings[row_keep], out=roffs_out[1:])
            surviving_nv = out_nv[ring_keep].astype(np.int32)
            carr_out = pa.ListArray.from_arrays(
                pa.array(coffs), pa.array(xy.reshape(-1), type=pa.float64()))
            rarr_out = pa.ListArray.from_arrays(
                pa.array(roffs_out), pa.array(surviving_nv, type=pa.int32()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(ix[c]).take(take) for c in keep] + [carr_out, rarr_out],
                names=keep + [coords, ring_lens])

    return df.mapInArrow(_clip, out_schema)


def clip_lines_kernel(coords: np.ndarray, line_nv: np.ndarray,
                      minx, miny, maxx, maxy):
    """Clip L polylines to per-line rects (Liang–Barsky per segment,
    vectorized across every segment of every line at once). A polyline
    leaving and re-entering the rect splits into multiple parts.

    Returns (flat coords, part_nv, line_of_part): clipped parts in input
    order, each ≥2 vertices, mapped back to their source line."""
    xy = coords.reshape(-1, 2).astype(np.float64)
    L = len(line_nv)
    line_nv = np.asarray(line_nv, dtype=np.int64)
    v_line = np.repeat(np.arange(L), line_nv)
    # collapse consecutive duplicate vertices first: their zero-length
    # segments are dropped later, and a dropped segment breaks the
    # ksi-consecutive part join — a connected [(0,0),(1,0),(1,0),(2,0)]
    # would otherwise split into two parts (r4 review)
    if len(xy) > 1:
        dup = np.zeros(len(xy), dtype=bool)
        dup[1:] = (v_line[1:] == v_line[:-1]) & (xy[1:] == xy[:-1]).all(axis=1)
        if dup.any():
            xy = xy[~dup]
            line_nv = np.bincount(v_line[~dup], minlength=L).astype(np.int64)
            v_line = np.repeat(np.arange(L), line_nv)
    # segments: vertex i -> i+1 within the same line
    starts = np.zeros(L, dtype=np.int64)
    starts[1:] = np.cumsum(line_nv)[:-1]
    seg_mask = np.ones(len(xy), dtype=bool)
    seg_mask[starts + line_nv - 1] = False  # last vertex of each line
    si = np.flatnonzero(seg_mask)
    if len(si) == 0:
        e = np.empty(0, np.float64)
        return e, np.empty(0, np.int64), np.empty(0, np.int64)
    p = xy[si]
    q = xy[si + 1]
    seg_line = v_line[si]
    bx0 = np.broadcast_to(np.asarray(minx, np.float64), (L,))[seg_line]
    by0 = np.broadcast_to(np.asarray(miny, np.float64), (L,))[seg_line]
    bx1 = np.broadcast_to(np.asarray(maxx, np.float64), (L,))[seg_line]
    by1 = np.broadcast_to(np.asarray(maxy, np.float64), (L,))[seg_line]

    d = q - p
    t0 = np.zeros(len(si))
    t1 = np.ones(len(si))
    keep = np.ones(len(si), dtype=bool)
    for axis, lo, hi in ((0, bx0, bx1), (1, by0, by1)):
        dd = d[:, axis]
        pp = p[:, axis]
        safe = np.where(np.abs(dd) < 1e-300, 1e-300, dd)
        ta = (lo - pp) / safe
        tb = (hi - pp) / safe
        tlo = np.minimum(ta, tb)
        thi = np.maximum(ta, tb)
        parallel = np.abs(dd) < 1e-300
        inside_par = (pp >= lo - 1e-12) & (pp <= hi + 1e-12)
        t0 = np.where(parallel, t0, np.maximum(t0, tlo))
        t1 = np.where(parallel, t1, np.minimum(t1, thi))
        keep &= ~parallel | inside_par
    keep &= t0 <= t1 + 1e-15
    a = p + d * np.clip(t0, 0, 1)[:, None]
    b = p + d * np.clip(t1, 0, 1)[:, None]
    # corner-grazing segments (t0 == t1) clip to a zero-length point — drop
    keep &= np.abs(a - b).max(axis=1) > 1e-12

    ki = np.flatnonzero(keep)
    if len(ki) == 0:
        e = np.empty(0, np.float64)
        return e, np.empty(0, np.int64), np.empty(0, np.int64)
    a, b = a[ki], b[ki]
    kl = seg_line[ki]
    ksi = si[ki]
    # part breaks: different line, non-consecutive segment, or a gap
    # (previous clipped end != this clipped start)
    new_part = np.ones(len(ki), dtype=bool)
    if len(ki) > 1:
        contig = (kl[1:] == kl[:-1]) & (ksi[1:] == ksi[:-1] + 1)
        joined = contig & (np.abs(b[:-1] - a[1:]).max(axis=1) < 1e-12)
        new_part[1:] = ~joined
    part_id = np.cumsum(new_part) - 1
    n_parts = int(part_id[-1]) + 1
    # each part: first segment contributes (a, b); later ones contribute b
    n_pts = np.bincount(part_id, minlength=n_parts) + 1
    out = np.empty((int(n_pts.sum()), 2), dtype=np.float64)
    off = np.zeros(n_parts + 1, dtype=np.int64)
    np.cumsum(n_pts, out=off[1:])
    out[off[:-1]] = a[new_part]
    local = np.arange(len(ki)) - np.flatnonzero(new_part)[part_id]
    out[off[:-1][part_id] + local + 1] = b
    line_of_part = kl[new_part]
    return out.reshape(-1), n_pts.astype(np.int64), line_of_part


def tile_local_kernel(coords: np.ndarray, ring_nv: np.ndarray,
                      west, south, east, north, extent: int = 4096):
    """Snap ring coords to the tile-local integer grid (0..extent, the
    east/north tile edge snapping to extent itself — the MVT convention;
    clamping to extent-1 pulled boundary vertices one cell inward and
    opened 1-cell seams between adjacent tiles, r4 review) and collapse
    consecutive duplicate vertices — the per-zoom simplification every
    vector-tile pipeline applies (coarser zoom ⇒ bigger cells ⇒ more
    collapse). Per-ring bounds arrays; fully vectorized.

    Returns (flat int coords, ring_nv) — rings may shrink; closing
    duplicates (last == first) are also dropped."""
    xy = coords.reshape(-1, 2).astype(np.float64)
    R = len(ring_nv)
    ring_nv = np.asarray(ring_nv, dtype=np.int64)
    ring_of = np.repeat(np.arange(R), ring_nv)
    west = np.broadcast_to(np.asarray(west, np.float64), (R,))[ring_of]
    south = np.broadcast_to(np.asarray(south, np.float64), (R,))[ring_of]
    east = np.broadcast_to(np.asarray(east, np.float64), (R,))[ring_of]
    north = np.broadcast_to(np.asarray(north, np.float64), (R,))[ring_of]

    px = np.clip(np.floor((xy[:, 0] - west) / np.maximum(east - west, 1e-300) * extent),
                 0, extent).astype(np.int64)
    py = np.clip(np.floor((north - xy[:, 1]) / np.maximum(north - south, 1e-300) * extent),
                 0, extent).astype(np.int64)

    # consecutive-duplicate collapse per ring (incl. wrap-around closing dup)
    starts = np.zeros(R, dtype=np.int64)
    starts[1:] = np.cumsum(ring_nv)[:-1]
    idx = np.arange(len(px))
    local = idx - starts[ring_of]
    prev_local = np.where(local == 0, ring_nv[ring_of] - 1, local - 1)
    prev = starts[ring_of] + prev_local
    dup = (px == px[prev]) & (py == py[prev]) & (ring_nv[ring_of] > 1)
    keep = ~dup
    # ensure at least one vertex per nonempty ring survives
    survivors = np.bincount(ring_of[keep], minlength=R)
    need_rescue = (survivors == 0) & (ring_nv > 0)
    if need_rescue.any():
        keep[starts[need_rescue]] = True

    out = np.stack([px[keep], py[keep]], axis=1)
    out_nv = np.bincount(ring_of[keep], minlength=R).astype(np.int64)
    return out.reshape(-1), out_nv


def ring_areas_kernel(coords: np.ndarray, ring_nv: np.ndarray) -> np.ndarray:
    """Signed shoelace area per ring (positive = counter-clockwise),
    vectorized: cross terms per edge, segmented sum via reduceat."""
    xy = coords.reshape(-1, 2).astype(np.float64)
    R = len(ring_nv)
    ring_nv = np.asarray(ring_nv, dtype=np.int64)
    ring_of = np.repeat(np.arange(R), ring_nv)
    starts = np.zeros(R, dtype=np.int64)
    starts[1:] = np.cumsum(ring_nv)[:-1]
    idx = np.arange(len(xy))
    local = idx - starts[ring_of]
    nxt = starts[ring_of] + np.where(local == ring_nv[ring_of] - 1, 0, local + 1)
    cross = xy[:, 0] * xy[nxt, 1] - xy[nxt, 0] * xy[:, 1]
    # reduceat only at NON-empty segment starts, scattered back: with
    # empty rings present (clip_rings_kernel legitimately returns
    # 0-vertex rings) a raw reduceat either raises on a trailing empty
    # start == len(cross) or silently borrows the neighbor's sum
    areas = np.zeros(R, dtype=np.float64)
    nonempty = ring_nv > 0
    if len(cross) and nonempty.any():
        areas[nonempty] = np.add.reduceat(cross, starts[nonempty])
    return areas / 2.0


def normalize_winding_kernel(coords: np.ndarray, ring_nv: np.ndarray,
                             rings_per_feat: np.ndarray):
    """Enforce the vector-tile convention: each feature's FIRST ring
    (outer) winds clockwise in screen space, subsequent rings (holes)
    counter-clockwise. Reversal is one segmented gather — no Python loop.

    Works on lon/lat or grid coords (screen-y grows downward after the
    grid snap, which flips apparent orientation — callers normalize AFTER
    snapping)."""
    xy = coords.reshape(-1, 2).astype(np.float64)
    R = len(ring_nv)
    ring_nv = np.asarray(ring_nv, dtype=np.int64)
    areas = ring_areas_kernel(coords, ring_nv)
    feat_start = np.zeros(len(rings_per_feat), dtype=np.int64)
    feat_start[1:] = np.cumsum(rings_per_feat)[:-1]
    is_outer = np.zeros(R, dtype=bool)
    is_outer[feat_start[np.asarray(rings_per_feat) > 0]] = True
    # screen-space CW has positive shoelace when y grows downward; on
    # grid coords "CW on screen" == positive signed area here
    want_positive = is_outer
    flip = (areas > 0) != want_positive
    if not flip.any():
        return coords.reshape(-1), ring_nv
    ring_of = np.repeat(np.arange(R), ring_nv)
    starts = np.zeros(R, dtype=np.int64)
    starts[1:] = np.cumsum(ring_nv)[:-1]
    idx = np.arange(len(xy))
    local = idx - starts[ring_of]
    rev = starts[ring_of] + (ring_nv[ring_of] - 1 - local)
    src = np.where(flip[ring_of], rev, idx)
    return xy[src].reshape(-1), ring_nv


def clip_polylines(df: DataFrame, *, coords: str = "coords",
                   line_lens: str = "ring_lens",
                   minx: str = "tminx", miny: str = "tminy",
                   maxx: str = "tmaxx", maxy: str = "tmaxy") -> DataFrame:
    """Clip each row's polylines to its own rect columns. A line that
    leaves and re-enters the rect becomes multiple parts (MultiLineString
    shape: `ring_lens` holds part lengths). Rows clipped away are
    dropped. One kernel call per Arrow batch."""
    in_cols = df.columns
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name not in (coords, line_lens)]
        + [T.StructField(coords, T.ArrayType(T.DoubleType())),
           T.StructField(line_lens, T.ArrayType(T.IntegerType()))]
    )
    keep = [c for c in in_cols if c not in (coords, line_lens)]
    ix = {c: in_cols.index(c) for c in in_cols}

    def _clip(batches):
        for batch in batches:
            carr = batch.column(ix[coords])
            rarr = batch.column(ix[line_lens])
            n = len(carr)
            if n == 0:
                continue
            flat = carr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            line_nv = rarr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            roffs = rarr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            lines_per_row = roffs[1:] - roffs[:-1]
            row_of_line = np.repeat(np.arange(n), lines_per_row)

            bx0 = batch.column(ix[minx]).to_numpy(zero_copy_only=False)[row_of_line]
            by0 = batch.column(ix[miny]).to_numpy(zero_copy_only=False)[row_of_line]
            bx1 = batch.column(ix[maxx]).to_numpy(zero_copy_only=False)[row_of_line]
            by1 = batch.column(ix[maxy]).to_numpy(zero_copy_only=False)[row_of_line]

            out_c, part_nv, line_of_part = clip_lines_kernel(
                flat, line_nv, bx0, by0, bx1, by1)
            if len(part_nv) == 0:
                continue
            row_of_part = row_of_line[line_of_part]
            rows_nv = np.zeros(n, dtype=np.int64)
            np.add.at(rows_nv, row_of_part, part_nv)
            rows_np = np.bincount(row_of_part, minlength=n)
            row_keep = rows_np > 0

            take = pa.array(np.flatnonzero(row_keep))
            coffs = np.zeros(int(row_keep.sum()) + 1, dtype=np.int32)
            np.cumsum(rows_nv[row_keep] * 2, out=coffs[1:])
            roffs_out = np.zeros(int(row_keep.sum()) + 1, dtype=np.int32)
            np.cumsum(rows_np[row_keep], out=roffs_out[1:])
            carr_out = pa.ListArray.from_arrays(
                pa.array(coffs), pa.array(out_c, type=pa.float64()))
            rarr_out = pa.ListArray.from_arrays(
                pa.array(roffs_out), pa.array(part_nv.astype(np.int32), type=pa.int32()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(ix[c]).take(take) for c in keep] + [carr_out, rarr_out],
                names=keep + [coords, line_lens])

    return df.mapInArrow(_clip, out_schema)
