"""Join-strategy planner + physical-plan quality assertions."""

import pytest
from pyspark.sql import functions as F

from geobuf_spark.operators import spatial_join as sj
from geobuf_spark.plans import strategy
from geobuf_spark.sources import minted


def test_choose_strategy_broadcast_small(spark, sf_small):
    pts = minted.minted_points(spark, sf_small)
    rects = minted.minted_rects(spark, sf_small)
    plan = strategy.choose_strategy(pts, rects, z=6)
    assert plan.strategy == "broadcast"
    assert plan.build_rows > 0


def test_choose_strategy_salted_on_hot_cell(spark, sf_small):
    pts = minted.minted_points(spark, sf_small)
    # everything in one cell → pathological skew
    hot = pts.withColumn("lon", F.lit(10.0)).withColumn("lat", F.lit(10.0))
    rects = minted.minted_rects(spark, sf_small)
    plan = strategy.choose_strategy(
        hot, rects, z=6, broadcast_budget_rows=10, skew_threshold_rows=100
    )
    assert plan.strategy == "salted"
    assert plan.salt > 1


def test_planned_join_rows_equal_direct(spark, sf_small):
    pts = minted.minted_points(spark, sf_small)
    rects = minted.minted_rects(spark, sf_small)
    planned, plan = strategy.pip_join_planned(pts, rects, z=6)
    direct = sj.pip_join(pts, rects, z=6, strategy="broadcast")
    assert planned.count() == direct.count()


def test_estimate_cover_rows_matches_explode(spark, sf_small):
    from geobuf_spark.functions import tiles

    rects = minted.minted_rects(spark, sf_small)
    est = strategy.estimate_cover_rows(rects, z=7)
    actual = tiles.explode_bbox_cover(rects, 7).count()
    assert est == actual


# --- physical plan quality ----------------------------------------------------

def test_broadcast_join_is_broadcast(spark, sf_small):
    pts = minted.minted_points(spark, sf_small)
    rects = minted.minted_rects(spark, sf_small)
    plan = sj.pip_join(pts, rects, z=6, strategy="broadcast") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_salted_join_has_no_broadcast_of_probe(spark, sf_small):
    pts = minted.minted_points(spark, sf_small)
    rects = minted.minted_rects(spark, sf_small)
    plan = sj.pip_join(pts, rects, z=6, strategy="salted", salt=4) \
        ._jdf.queryExecution().executedPlan().toString()
    # salted path joins on (cell, salt); the join itself may still be
    # broadcast for a tiny build side, but the salt column must be there
    assert "_salt" in plan


def test_parquet_scan_prunes_columns(spark, sf_small):
    pts = minted.minted_points(spark, sf_small)
    plan = pts._jdf.queryExecution().executedPlan().toString()
    # only doc_id should be read from documents.parquet — text/lang pruned
    assert "ReadSchema: struct<doc_id:bigint>" in plan, plan[-800:]


def test_filter_pushdown_reaches_scan(spark, sf_small):
    df = spark.read.parquet(f"{sf_small}/documents.parquet") \
        .filter(F.col("lang") == "en").select("doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan, plan[-800:]


def test_pip_join_single_shuffle_on_salted(spark, sf_small):
    """salted strategy must add at most the one planned exchange pair."""
    pts = minted.minted_points(spark, sf_small)
    rects = minted.minted_rects(spark, sf_small)
    plan = sj.pip_join(pts, rects, z=6, strategy="shuffle") \
        ._jdf.queryExecution().executedPlan().toString()
    # shuffle-hash hint honored: no sort-merge
    assert "ShuffledHashJoin" in plan


def test_pip_join_s2_broadcast_plan(spark, sf_small):
    pts = minted.minted_points(spark, sf_small)
    rects = minted.minted_rects(spark, sf_small)
    plan = sj.pip_join_s2(pts, rects) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tile_pyramid_single_scan(spark, sf_small):
    """the pyramid must read the input ONCE — every coarser level folds
    the finer aggregate, never rescans the source."""
    from geobuf_spark.operators import tiling

    pts = minted.minted_points(spark, sf_small)
    pyr = tiling.tile_pyramid(tiling.assign_tiles_points(pts, z=8), z_min=5)
    plan = pyr._jdf.queryExecution().executedPlan().toString()
    # the base histogram is checkpointed: union branches read the cached
    # aggregate, never the source — 0 file scans in the final plan
    assert plan.count("FileScan parquet") == 0, plan.count("FileScan parquet")
    assert "Scan ExistingRDD" in plan


def test_lazy_property_scan_reads_only_binary(spark, sf_small, tmp_path):
    """wire-level lazy read over a stored binary table must prune to the
    geobuf column — the columnar analog of not reading geometry bytes."""
    from geobuf_spark.codec import spark_codec
    from geobuf_spark.sources import minted as M

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    pts = M.minted_points(spark, sf_small).join(
        docs.select("doc_id", "lang"), "doc_id")
    enc = spark_codec.encode_points_with_props(pts, props=["lang"])
    p = str(tmp_path / "frames")
    enc.write.parquet(p)
    lazy = spark_codec.lazy_property(spark.read.parquet(p), "lang")
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<geobuf:binary>" in plan, plan[-600:]


def test_salted_default_uses_plan_salt(spark, sf_small):
    # salt=None derives k from the probe histogram (no hot cell at this
    # scale → k=1, no build replication) and returns the same rows
    from geobuf_spark.sources import minted
    pts = minted.minted_points(spark, sf_small)
    rects = minted.minted_rects(spark, sf_small)
    auto = {(r.doc_id, r.poly_id)
            for r in sj.pip_join(pts, rects, z=6, strategy="salted")
            .select("doc_id", "poly_id").collect()}
    bc = {(r.doc_id, r.poly_id)
          for r in sj.pip_join(pts, rects, z=6, strategy="broadcast")
          .select("doc_id", "poly_id").collect()}
    assert auto == bc
