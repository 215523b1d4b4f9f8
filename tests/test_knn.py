"""kNN cell-ring expansion vs brute-force oracle — exact row equality."""

import pytest
from pyspark.sql import functions as F

from geobuf_spark.operators import knn as K
from geobuf_spark.sources import minted


@pytest.fixture(scope="module")
def points(spark, sf_small):
    return minted.minted_points(spark, sf_small).cache()


@pytest.fixture(scope="module")
def queries(points):
    return (
        points.filter(F.col("doc_id") % 20 == 0)
        .select(F.col("doc_id").alias("query_id"), "lon", "lat")
        .cache()
    )


@pytest.mark.parametrize("k,z,ring", [(3, 4, 1), (5, 5, 1), (5, 3, 2)])
def test_knn_matches_bruteforce(points, queries, k, z, ring):
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn(points, queries, k, z=z, ring=ring).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn_bruteforce(points, queries, k).collect()
    }
    assert got == want
    assert len(want) == queries.count() * k


def test_knn_fallback_share(points, queries):
    """At a sane zoom most queries resolve in the cell path (the fallback
    must be the exception, or the operator doesn't scale)."""
    k, z, ring = 5, 3, 2
    res = K.knn(points, queries, k, z=z, ring=ring)
    assert res.count() == queries.count() * k


@pytest.mark.parametrize("k,z", [(3, 4), (5, 5)])
def test_knn_adaptive_matches_bruteforce(points, queries, k, z):
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn_adaptive(points, queries, k, z=z, rings=(1, 2, 4)).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn_bruteforce(points, queries, k).collect()
    }
    assert got == want


def test_knn_adaptive_sparse_escalates(spark):
    """A lone far-away query must still get exact neighbors (escalation or
    final brute force), and dense queries must not lose rows."""
    pts = spark.createDataFrame(
        [(i, 10.0 + (i % 10) * 0.01, 50.0 + (i // 10) * 0.01) for i in range(100)]
        + [(900, -150.0, -60.0), (901, -150.2, -60.1), (902, -149.8, -59.9)],
        "doc_id bigint, lon double, lat double",
    )
    qs = spark.createDataFrame(
        [(1000, 10.05, 50.05), (1001, -150.0, -60.0)],
        "query_id bigint, lon double, lat double",
    )
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn_adaptive(pts, qs, 3, z=6, rings=(1, 2)).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn_bruteforce(pts, qs, 3).collect()
    }
    assert got == want


@pytest.mark.parametrize("k,size,ring", [(3, 8.0, 1), (5, 12.0, 1), (5, 4.0, 2)])
def test_knn_hex_matches_bruteforce(points, queries, k, size, ring):
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn_hex(points, queries, k, size_deg=size, ring=ring).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn_bruteforce(points, queries, k).collect()
    }
    assert got == want
    assert len(want) == queries.count() * k


@pytest.mark.parametrize("k,level,radius", [(3, 3, None), (5, 3, None),
                                            (5, 2, 40.0), (5, 4, None)])
def test_knn_s2_matches_bruteforce(points, queries, k, level, radius):
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn_s2(points, queries, k, level=level,
                          radius_deg=radius).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn_bruteforce(points, queries, k).collect()
    }
    assert got == want
    assert len(want) == queries.count() * k


def test_knn_s2_face_edge_resolves_without_fallback(spark, monkeypatch):
    """The cross-face case the same-face block design could never prove:
    query on one side of the lon=45° face-0/1 edge, all neighbors on the
    other. The radius-cover candidates span faces, so the query must
    resolve on the index path — brute force must not run at all."""
    pts = spark.createDataFrame(
        [(1, 44.9, 10.0)] + [(i, 45.1 + 0.01 * i, 10.0) for i in range(2, 30)],
        "doc_id bigint, lon double, lat double")
    qs = pts.filter(F.col("doc_id") == 1) \
        .select(F.col("doc_id").alias("query_id"), "lon", "lat")

    seen = {}
    orig = K.knn_bruteforce

    def spy(points_, queries_, k_, **kw):
        seen["n"] = queries_.count()
        return orig(points_, queries_, k_, **kw)

    monkeypatch.setattr(K, "knn_bruteforce", spy)
    got = {(r.query_id, r.neighbor_id, r.rank)
           for r in K.knn_s2(pts, qs, 3, level=3, radius_deg=2.0).collect()}
    monkeypatch.undo()
    want = {(r.query_id, r.neighbor_id, r.rank)
            for r in orig(pts, qs, 3).collect()}
    assert got == want
    assert seen["n"] == 0


def test_knn_s2_sparse_falls_back_exact(spark):
    """Radius far below the true k-th distance → nothing can resolve
    (the guard must never falsely certify) and the fallback returns the
    exact rows. Includes a pole-adjacent and an antimeridian point."""
    pts = spark.createDataFrame(
        [(i, float(i * 37 % 50) - 25.0, float(i * 61 % 40) - 20.0)
         for i in range(40)] + [(800, -179.9, 0.0), (801, 0.0, 89.5)],
        ["doc_id", "lon", "lat"])
    qs = pts.filter((F.col("doc_id") % 7 == 0) | (F.col("doc_id") >= 800)) \
        .select(F.col("doc_id").alias("query_id"), "lon", "lat")
    got = {(r.query_id, r.neighbor_id, r.rank)
           for r in K.knn_s2(pts, qs, 4, level=4, radius_deg=0.001).collect()}
    want = {(r.query_id, r.neighbor_id, r.rank)
            for r in K.knn_bruteforce(pts, qs, 4).collect()}
    assert got == want


def test_knn_hex_sparse_escalation(spark):
    """Tiny cells → nothing resolves in-ring → the brute-force fallback
    still returns exact rows (the guard may never falsely resolve)."""
    pts = spark.createDataFrame(
        [(i, float(i * 37 % 50) - 25.0, float(i * 61 % 40) - 20.0)
         for i in range(40)], ["doc_id", "lon", "lat"])
    qs = pts.filter(F.col("doc_id") % 7 == 0) \
        .select(F.col("doc_id").alias("query_id"), "lon", "lat")
    got = {(r.query_id, r.neighbor_id, r.rank)
           for r in K.knn_hex(pts, qs, 4, size_deg=0.001, ring=1).collect()}
    want = {(r.query_id, r.neighbor_id, r.rank)
            for r in K.knn_bruteforce(pts, qs, 4).collect()}
    assert got == want


def test_knn_s2_empty_points(spark, sf_small):
    """All three index families agree on the degenerate empty build side:
    zero candidates, zero crashes (s2_radius previously raised TypeError
    on the all-NULL bbox aggregate)."""
    from geobuf_spark.operators import knn as K
    from geobuf_spark.sources import minted

    pts = minted.minted_points(spark, sf_small).filter("doc_id < 0")
    qs = minted.minted_points(spark, sf_small).limit(3) \
        .withColumnRenamed("doc_id", "query_id")
    assert K.knn_s2(pts, qs, k=3).count() == 0


def test_knn_adaptive_default_dense_path(points, queries):
    """rings=None default: optimistic ring-1 pass + budgeted lazy brute
    tail (the dense path the driver query exercises) — exact rows vs
    brute force (r4 review: the default path previously had no pytest)."""
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn_adaptive(points, queries, 5, z=4).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn_bruteforce(points, queries, 5).collect()
    }
    assert got == want


def test_knn_adaptive_default_escalation_path(points, queries, monkeypatch):
    """Force the sparse-regime branches: with the brute budget at 0 the
    loop must escalate through start_ring doubling (ring 1 → planned →
    ×2 …) and still drain to exact rows; with the pass cap exhausted the
    final brute tail covers what remains."""
    monkeypatch.setattr(K, "BRUTE_BUDGET_PAIRS", 0)
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn_adaptive(points, queries, 5, z=6).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn_bruteforce(points, queries, 5).collect()
    }
    assert got == want


def test_knn_adaptive_explicit_rings_honored_past_eight(points, queries):
    """Explicit rings are never truncated by the adaptive pass cap: a
    10-ring ladder (degenerate 1-rings so the frontier survives early
    passes) completes and stays exact."""
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn_adaptive(points, queries, 5, z=6,
                                rings=(1,) * 9 + (8,)).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in K.knn_bruteforce(points, queries, 5).collect()
    }
    assert got == want


def test_knn_label_vote_vs_brute(spark):
    """Majority-vote classification over the exact 5-NN must match a
    python recompute (same dist2/neighbor_id and votes/lang tie orders)."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    pts = {r["doc_id"]: (r["lon"], r["lat"])
           for r in minted.minted_points(spark, sf).collect()}
    langs = {r["doc_id"]: r["lang"] for r in
             spark.read.parquet(f"{sf}/documents.parquet")
             .select("doc_id", "lang").collect()}
    exp = {}
    for q, (qx, qy) in pts.items():
        if q % 20:
            continue
        scored = sorted(
            ((qx - x) ** 2 + (qy - y) ** 2, i)
            for i, (x, y) in pts.items() if i != q)
        votes = {}
        for _, i in scored[:5]:
            votes[langs[i]] = votes.get(langs[i], 0) + 1
        best = sorted(votes.items(), key=lambda t: (-t[1], t[0]))[0]
        exp[q] = (best[0], best[1])
    got = {r["query_id"]: (r["pred_lang"], r["votes"])
           for r in em.queries()["knn_label_vote"](spark, sf).collect()}
    assert got == exp
