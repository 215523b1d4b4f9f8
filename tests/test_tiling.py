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
