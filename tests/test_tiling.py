"""Tiling job: partitioned write, pruned single-tile reads, promotion."""

import pytest
from pyspark.sql import functions as F

from geobuf_spark.operators import tiling
from geobuf_spark.sources import minted


@pytest.fixture(scope="module")
def assigned(spark, sf_small):
    pts = minted.minted_points(spark, sf_small)
    return tiling.assign_tiles_points(pts, z=5).cache()


def test_write_then_pruned_read(spark, tmp_path, assigned):
    path = str(tmp_path / "tiles")
    tiling.write_tiles(assigned, path)
    # pick a populated tile
    top = tiling.tile_histogram(assigned).orderBy(F.desc("n_features")).first()
    one = tiling.read_tile(spark, path, top.z, top.x, top.y)
    assert one.count() == top.n_features
    # partition pruning: the scan must touch only that tile's directory
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # total preserved
    back = spark.read.parquet(path)
    assert back.count() == assigned.count()


def test_promdella_equals_direct_assignment(spark, sf_small, assigned):
    """promote(z=5 → z=3) must equal assigning directly at z=3."""
    promoted = tiling.promote_to_zoom(assigned, 3).select("doc_id", "z", "x", "y")
    direct = tiling.assign_tiles_points(
        minted.minted_points(spark, sf_small), z=3
    ).select("doc_id", "z", "x", "y")
    got = {tuple(r) for r in promoted.collect()}
    want = {tuple(r) for r in direct.collect()}
    assert got == want


def test_bbox_assignment_covers_points(spark, sf_small):
    """every point inside a rect must land in a tile the rect covers
    (the correctness property behind the cell join)."""
    from geobuf_spark.operators import spatial_join as sj

    pts = minted.minted_points(spark, sf_small)
    rects = minted.minted_rects(spark, sf_small)
    z = 6
    inside = sj.pip_join(pts, rects, z=z, strategy="broadcast")
    pt_tiles = tiling.assign_tiles_points(inside.select("doc_id", "lon", "lat", "poly_id"), z=z)
    rect_tiles = tiling.assign_tiles_bbox(rects, z=z).select(
        "poly_id", F.col("x").alias("rx"), F.col("y").alias("ry"))
    missing = pt_tiles.join(
        rect_tiles,
        (pt_tiles.poly_id == rect_tiles.poly_id) & (F.col("x") == F.col("rx")) & (F.col("y") == F.col("ry")),
        "left_anti",
    )
    assert missing.count() == 0


def test_tile_pyramid_consistency(spark, sf_small):
    """Every pyramid level must (a) preserve total mass, (b) equal a direct
    assignment at that zoom — the reference's level-by-level re-split
    semantics from one aggregation."""
    from geobuf_spark.sources import minted

    pts = minted.minted_points(spark, sf_small)
    a8 = tiling.assign_tiles_points(pts, z=8)
    pyr = tiling.tile_pyramid(a8, z_min=4).cache()
    n = pts.count()
    per_level = {r.z: r.total for r in
                 pyr.groupBy("z").agg(F.sum("n_features").alias("total")).collect()}
    assert set(per_level) == set(range(4, 9))
    assert all(v == n for v in per_level.values()), per_level
    for zz in (4, 6):
        direct = {(r.z, r.x, r.y, r.n_features) for r in
                  tiling.tile_histogram(tiling.assign_tiles_points(pts, z=zz)).collect()}
        got = {(r.z, r.x, r.y, r.n_features) for r in pyr.filter(F.col("z") == zz).collect()}
        assert got == direct, zz


def test_tile_pyramid_rejects_mixed_zoom(spark):
    """Mixed-z input must fail loudly — a silent rollup from the wrong
    starting level halves coarse rows once too often (ADVICE r01)."""
    df = spark.createDataFrame([(8, 10, 20), (7, 5, 10)], "z int, x int, y int")
    with pytest.raises(Exception, match="mixed zoom"):
        tiling.tile_pyramid(df, z_min=4).collect()


def test_bbox_cover_antimeridian_wrap(spark):
    """A box crossing ±180° (minx > maxx) covers the two wrapped x runs —
    not the full lon range, and not the complement (TODO r01)."""
    from geobuf_spark.functions import tiles as TL

    z = 4  # 16 tiles across
    df = spark.createDataFrame(
        [(1, 170.0, -10.0, -170.0, 10.0),   # crosses: x in {15, 0}
         (2, -10.0, -10.0, 10.0, 10.0)],    # normal: x in {7, 8}
        "poly_id long, minx double, miny double, maxx double, maxy double")
    got = {}
    for r in TL.explode_bbox_cover(df, z).collect():
        got.setdefault(r.poly_id, set()).add((r.tile_x, r.tile_y))
    xs1 = {x for x, _ in got[1]}
    xs2 = {x for x, _ in got[2]}
    assert xs1 == {15, 0}, xs1
    assert xs2 == {7, 8}, xs2


def test_vector_tiles_multipolygons_structure(spark):
    """Two-part MultiPolygons keep their part structure through
    cover→clip→snap→regroup; each part lands in its own tile with
    part_rings rebuilt from surviving rings, and the output feeds the MVT
    polygon writer directly."""
    from geobuf_spark.functions import mvt as M

    def sq(x0, y0, s):
        return [x0, y0, x0 + s, y0, x0 + s, y0 + s, x0, y0 + s]

    # part A near (10,10), part B near (100,10) — distinct z4 tiles
    rows = []
    for pid in range(3):
        a = sq(5.0 + pid, 5.0, 2.0)
        b = sq(100.0 + pid, 5.0, 2.0)
        rows.append((pid, min(a[0::2] + b[0::2]), min(a[1::2] + b[1::2]),
                     max(a[0::2] + b[0::2]), max(a[1::2] + b[1::2]),
                     a + b, [4, 4], [1, 1]))
    df = spark.createDataFrame(
        rows, "poly_id long, minx double, miny double, maxx double, "
              "maxy double, coords array<double>, ring_lens array<int>, "
              "part_rings array<int>")
    out = tiling.vector_tiles_multipolygons(df, z=4, extent=256).collect()
    assert out
    for r in out:
        assert sum(r.part_rings) == len(r.ring_lens)
        assert sum(r.ring_lens) * 2 == len(r.grid_coords)
        # each part is tiny vs the tile: it lands whole in ONE tile
        assert len(r.part_rings) == 1
    # all 3 features appear in exactly 2 tiles each (one per part)
    by_pid = {}
    for r in out:
        by_pid.setdefault(r.poly_id, []).append(r)
    assert all(len(v) == 2 for v in by_pid.values())
    # MVT round trip of one regrouped row
    r = out[0]
    import numpy as np
    cmds = M.polygon_commands_kernel(
        np.asarray(r.grid_coords, dtype=np.int64),
        np.asarray(r.ring_lens, dtype=np.int64),
        np.asarray([len(r.ring_lens)], dtype=np.int64))
    blob = M.mvt_tile_bytes(M.mvt_layer_bytes(
        "mp", [M.mvt_feature_bytes(int(r.poly_id), cmds[0].as_py())]))
    rings = M.parse_mvt(blob)["layers"][0]["features"][0]["rings"]
    assert len(rings) == len(r.ring_lens)


def test_bbox_cover_antimeridian_overlapping_runs(spark):
    """Wrapped boxes whose two x runs overlap (coarse zooms) must not
    duplicate (feature, tile) rows (review r2)."""
    from geobuf_spark.functions import tiles as TL

    df = spark.createDataFrame(
        [(1, 170.0, -10.0, -170.0, 10.0)],
        "poly_id long, minx double, miny double, maxx double, maxy double")
    rows = TL.explode_bbox_cover(df, 0).collect()
    assert len(rows) == 1 and (rows[0].tile_x, rows[0].tile_y) == (0, 0)
    # z=1: runs [1..1] + [0..1] overlap at x=1 → exactly {0,1}, no dupes
    rows = TL.explode_bbox_cover(df, 1).collect()
    xs = sorted(r.tile_x for r in rows if r.tile_y == 0)
    assert xs == [0, 1]
