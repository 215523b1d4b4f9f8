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
