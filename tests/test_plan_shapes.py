

def test_vector_tiles_points_stays_jvm(spark):
    """The point tiling path is pure column expressions — no Python
    evaluation node may appear in its physical plan."""
    from geobuf_spark.operators import tiling
    from geobuf_spark.sources import minted

    pts = minted.minted_points(spark, "/root/testdata/sf0.001")
    plan = tiling.vector_tiles_points(pts, z=6)._jdf.queryExecution() \
        .executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInArrow",
                   "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in plan, marker
