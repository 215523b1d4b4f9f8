"""MVT writer round-trips through the spec-conformant parser; end-to-end
tiles from the vector_tiles pipeline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geobuf_spark.functions import mvt as M


def test_polygon_commands_roundtrip_kernel():
    rng = np.random.default_rng(101)
    feats = []
    for _ in range(60):
        nr = int(rng.integers(1, 4))
        feats.append([rng.integers(0, 4096, (int(rng.integers(3, 12)), 2))
                      for _ in range(nr)])
    ring_nv = np.array([len(r) for f in feats for r in f], dtype=np.int64)
    rpf = np.array([len(f) for f in feats], dtype=np.int64)
    coords = np.concatenate([r.reshape(-1) for f in feats for r in f])
    arr = M.polygon_commands_kernel(coords, ring_nv, rpf)
    for i, f in enumerate(feats):
        blob = M.mvt_tile_bytes(M.mvt_layer_bytes(
            "t", [M.mvt_feature_bytes(i, arr[i].as_py())]))
        parsed = M.parse_mvt(blob)
        rings = parsed["layers"][0]["features"][0]["rings"]
        assert len(rings) == len(f), i
        for got, want in zip(rings, f):
            assert got == [tuple(v) for v in want], i


def test_mvt_layer_structure():
    cmds = M.polygon_commands_kernel(
        np.array([0, 0, 10, 0, 10, 10], dtype=np.float64), np.array([3]), np.array([1]))
    blob = M.mvt_tile_bytes(M.mvt_layer_bytes(
        "roads", [M.mvt_feature_bytes(42, cmds[0].as_py())], extent=512))
    t = M.parse_mvt(blob)
    layer = t["layers"][0]
    assert layer["version"] == 2 and layer["name"] == "roads" and layer["extent"] == 512
    feat = layer["features"][0]
    assert feat["id"] == 42 and feat["type"] == M.GEOM_POLYGON
    assert feat["rings"] == [[(0, 0), (10, 0), (10, 10)]]


def test_build_mvt_tiles_end_to_end(spark, sf_small):
    from geobuf_spark.operators import tiling
    from geobuf_spark.sources import minted

    rects = minted.minted_rects(spark, sf_small).limit(60)
    ring = F.array("minx", "miny", "maxx", "miny", "maxx", "maxy", "minx", "maxy")
    polys = rects.select("poly_id", "minx", "miny", "maxx", "maxy",
                         ring.alias("coords"), F.array(F.lit(4)).alias("ring_lens"))
    vt = tiling.vector_tiles(polys, z=4, extent=4096)
    tiles_df = M.build_mvt_tiles(vt, layer_name="rects")
    rows = tiles_df.collect()
    assert len(rows) > 0
    total_feats = 0
    for r in rows:
        parsed = M.parse_mvt(bytes(r.mvt))
        layer = parsed["layers"][0]
        assert layer["name"] == "rects" and layer["version"] == 2
        assert len(layer["features"]) == r.n_features
        total_feats += r.n_features
        for feat in layer["features"]:
            for ringv in feat["rings"]:
                for x, y in ringv:
                    # coords may equal extent: tile-edge vertices snap to
                    # extent itself (MVT convention, r4)
                    assert 0 <= x <= 4096 and 0 <= y <= 4096
    # every (feature, tile) piece became one MVT feature
    assert total_feats == vt.count()


def test_mvt_winding_and_degenerate_rules(spark, sf_small):
    """post-review rules: every encoded outer ring has positive screen-space
    area (spec 4.3.4.4) and every ring has >= 3 vertices."""
    from geobuf_spark.operators import tiling
    from geobuf_spark.operators.clip import ring_areas_kernel
    from geobuf_spark.sources import minted

    rects = minted.minted_rects(spark, sf_small).limit(40)
    ring = F.array("minx", "miny", "maxx", "miny", "maxx", "maxy", "minx", "maxy")
    polys = rects.select("poly_id", "minx", "miny", "maxx", "maxy",
                         ring.alias("coords"), F.array(F.lit(4)).alias("ring_lens"))
    tiles_df = M.build_mvt_tiles(tiling.vector_tiles(polys, z=4, extent=4096))
    for r in tiles_df.collect():
        for feat in M.parse_mvt(bytes(r.mvt))["layers"][0]["features"]:
            for i, ringv in enumerate(feat["rings"]):
                assert len(ringv) >= 3
                flat = np.array(ringv, dtype=np.float64).reshape(-1)
                area = ring_areas_kernel(flat, np.array([len(ringv)]))[0]
                if i == 0:
                    assert area > 0, (feat["id"], area)
    # extent=1: everything degenerates → zero tiles, no crash
    assert M.build_mvt_tiles(tiling.vector_tiles(polys, z=4, extent=1)).count() == 0


def test_parse_mvt_multipart_linestring():
    """MoveTo starts a new part for line geometries (third-party tiles)."""
    # hand-build: MoveTo(0,0) LineTo(5,0) MoveTo(10,10) LineTo(12,10)
    vals = [
        (M.MOVETO & 7) | (1 << 3), 0, 0,
        (M.LINETO & 7) | (1 << 3), 10, 0,        # zz(5)=10
        (M.MOVETO & 7) | (1 << 3), 10, 20,       # zz(5)=10, zz(10)=20
        (M.LINETO & 7) | (1 << 3), 4, 0,         # zz(2)=4
    ]
    from geobuf_spark.codec import core
    payload = b"".join(core.encode_varint(v) for v in vals)
    blob = M.mvt_tile_bytes(M.mvt_layer_bytes(
        "l", [M.mvt_feature_bytes(1, payload, geom_type=2)]))
    feat = M.parse_mvt(blob)["layers"][0]["features"][0]
    assert feat["rings"] == [[(0, 0), (5, 0)], [(10, 10), (12, 10)]]


def test_hex_size_guard():
    import pytest as _pt
    from pyspark.sql import functions as _F
    from geobuf_spark.functions import hexgrid as H
    with _pt.raises(ValueError, match="alias"):
        H.hex_cell(_F.lit(0.0), _F.lit(0.0), 1e-5)


def test_line_commands_kernel_roundtrip():
    """multi-part LINESTRING features: writer→parser exact, fuzzed."""
    rng = np.random.default_rng(71)
    feats = []
    for _ in range(40):
        nparts = int(rng.integers(1, 4))
        feats.append([rng.integers(0, 4096, (int(rng.integers(2, 10)), 2))
                      for _ in range(nparts)])
    part_nv = np.array([len(p) for f in feats for p in f], dtype=np.int64)
    ppf = np.array([len(f) for f in feats], dtype=np.int64)
    coords = np.concatenate([p.reshape(-1) for f in feats for p in f]).astype(np.float64)
    arr = M.line_commands_kernel(coords, part_nv, ppf)
    for i, f in enumerate(feats):
        blob = M.mvt_tile_bytes(M.mvt_layer_bytes(
            "l", [M.mvt_feature_bytes(i, arr[i].as_py(), geom_type=2)]))
        got = M.parse_mvt(blob)["layers"][0]["features"][0]["rings"]
        assert got == [[tuple(v) for v in p] for p in f], i


def test_build_mvt_line_tiles_end_to_end(spark):
    """roads → split+clip per tile → grid snap → LINESTRING MVT blobs."""
    from geobuf_spark.operators import tiling

    rng = np.random.default_rng(83)
    rows = []
    for i in range(30):
        nv = int(rng.integers(2, 10))
        pts = rng.uniform(-50, 50, (nv, 2))
        rows.append((i, float(pts[:,0].min()), float(pts[:,1].min()),
                     float(pts[:,0].max()), float(pts[:,1].max()),
                     pts.reshape(-1).tolist(), [nv]))
    df = spark.createDataFrame(
        rows, "line_id bigint, minx double, miny double, maxx double, maxy double, "
              "coords array<double>, ring_lens array<int>")
    vt = tiling.vector_tiles_lines(df, z=4, extent=256)
    tiles_df = M.build_mvt_tiles(vt, layer_name="roads", extent=256,
                                 id_col="line_id", geom="line")
    rows_out = tiles_df.collect()
    assert len(rows_out) > 0
    total = 0
    for r in rows_out:
        for feat in M.parse_mvt(bytes(r.mvt))["layers"][0]["features"]:
            assert feat["type"] == 2
            total += 1
            for part in feat["rings"]:
                assert len(part) >= 2
                for x, y in part:
                    # coords may equal extent (tile-edge snap, r4)
                    assert 0 <= x <= 256 and 0 <= y <= 256
    assert total == vt.count()


def test_point_commands_kernel_roundtrip():
    """POINT/MULTIPOINT features: one MoveTo carrying all N points
    (spec 4.3.4.2), cursor-cumulative deltas — writer→parser exact,
    fuzzed across multi-part inputs (parts collapse on the wire)."""
    rng = np.random.default_rng(57)
    feats = []
    for _ in range(50):
        nparts = int(rng.integers(1, 3))
        feats.append([rng.integers(0, 4096, (int(rng.integers(1, 8)), 2))
                      for _ in range(nparts)])
    part_nv = np.array([len(p) for f in feats for p in f], dtype=np.int64)
    ppf = np.array([len(f) for f in feats], dtype=np.int64)
    coords = np.concatenate([p.reshape(-1) for f in feats for p in f]).astype(np.int64)
    arr = M.point_commands_kernel(coords, part_nv, ppf)
    for i, f in enumerate(feats):
        blob = M.mvt_tile_bytes(M.mvt_layer_bytes(
            "p", [M.mvt_feature_bytes(i, arr[i].as_py(), geom_type=1)]))
        feat = M.parse_mvt(blob)["layers"][0]["features"][0]
        assert feat["type"] == 1
        # MULTIPOINT has no part structure: parser returns ONE run
        want = [tuple(v) for p in f for v in p]
        assert feat["rings"] == [want], i
    with pytest.raises(ValueError, match="zero points"):
        M.point_commands_kernel(np.array([1, 2]), np.array([0]), np.array([1]))


def test_build_mvt_point_tiles_end_to_end(spark):
    """points → pure-expression tile assign + grid snap → POINT MVT blobs;
    every minted point decodes back at its snapped grid position."""
    from geobuf_spark.operators import tiling
    from geobuf_spark.sources import minted

    pts = minted.minted_points(spark, "/root/testdata/sf0.001").limit(200)
    vp = tiling.vector_tiles_points(pts, z=4, extent=256)
    tiles_df = M.build_mvt_tiles(vp, id_col="doc_id", layer_name="docs",
                                 geom="point")
    rows = tiles_df.collect()
    assert rows and sum(r.n_features for r in rows) == 200
    want = {(r.doc_id, r.z, r.x, r.y): tuple(r.grid_coords)
            for r in vp.collect()}
    seen = 0
    for r in rows:
        parsed = M.parse_mvt(bytes(r.mvt))
        layer = parsed["layers"][0]
        assert layer["name"] == "docs" and layer["version"] == 2
        for feat in layer["features"]:
            assert feat["type"] == 1
            (pt,) = feat["rings"][0]
            assert pt == want[(feat["id"], r.z, r.x, r.y)]
            seen += 1
    assert seen == 200


def test_frames_kernel_matches_scalar_framing():
    """The r3 vectorized tile-framing kernel must be byte-identical to the
    scalar mvt_feature_bytes/mvt_layer_bytes/mvt_tile_bytes golden path."""
    import pyarrow as pa

    rng = np.random.default_rng(11)
    payloads = [rng.integers(0, 256, int(n), dtype=np.uint8).tobytes()
                for n in rng.integers(1, 400, 23)]
    fids = rng.integers(0, 1 << 40, len(payloads)).astype(np.int64)
    fpt = np.array([1, 5, 3, 9, 4, 1])  # partitions the 23 features
    assert fpt.sum() == len(payloads)
    got = M.mvt_tiles_frames_kernel(
        fids, pa.array(payloads, type=pa.binary()), fpt,
        layer_name="tiles-λ", extent=512, gtype=2)
    start = 0
    for t, n in enumerate(fpt):
        feats = [M.mvt_feature_bytes(int(fids[start + i]), payloads[start + i],
                                     geom_type=2) for i in range(n)]
        want = M.mvt_tile_bytes(M.mvt_layer_bytes("tiles-λ", feats, extent=512))
        assert got[t].as_py() == want, f"tile {t} differs"
        start += n


def test_frames_kernel_sliced_input():
    """Arrow slices (nonzero offsets) must not corrupt the payload gather."""
    import pyarrow as pa

    payloads = [bytes([i]) * (i + 1) for i in range(10)]
    arr = pa.array(payloads, type=pa.binary()).slice(4, 6)
    fids = np.arange(4, 10, dtype=np.int64)
    got = M.mvt_tiles_frames_kernel(fids, arr, np.array([6]), "s", 4096, 1)
    feats = [M.mvt_feature_bytes(i, payloads[i], geom_type=1) for i in range(4, 10)]
    want = M.mvt_tile_bytes(M.mvt_layer_bytes("s", feats, extent=4096))
    assert got[0].as_py() == want
