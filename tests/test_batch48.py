"""Batch-48 units: quadkey prefix-range join (vs brute containment and
cover-disjointness invariants) and exact trimmed mean."""
import numpy as np
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.sources import minted

SF = "/root/testdata/sf0.001"


def test_quadkey_range_join_matches_brute_containment(spark):
    pts = minted.minted_points(spark, SF).toPandas()
    rects = minted.minted_rects(spark, SF).toPandas()
    got = set(map(tuple, em.q_quadkey_range_join(spark, SF)
                  .select("doc_id", "poly_id").collect()))
    exp = set()
    for r in rects.itertuples():
        m = pts[(pts.lon >= r.minx) & (pts.lon <= r.maxx)
                & (pts.lat >= r.miny) & (pts.lat <= r.maxy)]
        exp.update((int(d), int(r.poly_id)) for d in m.doc_id)
    assert got == exp and len(exp) > 0


def test_quadkey_range_join_no_duplicate_pairs(spark):
    # adaptive cover cells are disjoint, so the range join must propose
    # each (point, poly) at most once — a dup here means overlapping
    # prefixes (the bug class this plan is prone to)
    df = em.q_quadkey_range_join(spark, SF)
    assert df.count() == df.distinct().count()


def test_quadkey_range_join_plan_is_broadcast_hash(spark):
    plan = em.q_quadkey_range_join(spark, SF) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_trimmed_mean_matches_numpy(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    got = {r["lang"]: r
           for r in em.q_trimmed_mean_chars(spark, SF).collect()}
    for lang, g in docs.groupby("lang"):
        x = np.sort(g["n_chars"].to_numpy(np.int64))
        t = len(x) // 10
        kept = x[t:len(x) - t]
        row = got[lang]
        assert row["n_kept"] == len(kept)
        assert row["sum_kept"] == kept.sum()
        assert row["trimmed_mean_ppm"] == kept.sum() * 10**6 // len(kept)
