"""Batch-51 unit: Borůvka round-1 NN-forest components vs a brute
union-find over brute-force nearest neighbors."""
import numpy as np

import __spark_entry__ as em
from geobuf_spark.sources import minted

SF = "/root/testdata/sf0.001"


def test_boruvka_round1_matches_union_find(spark):
    pts = minted.minted_cluster_points_q(spark, SF).toPandas()
    ids = pts["doc_id"].to_numpy(np.int64)
    x = pts["qx"].to_numpy(np.int64)
    y = pts["qy"].to_numpy(np.int64)
    d2 = (x[:, None] - x[None, :]).astype(object) ** 2 \
        + (y[:, None] - y[None, :]).astype(object) ** 2  # exact bigints
    np.fill_diagonal(d2, None)
    parent = {int(i): int(i) for i in ids}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    r2 = em.RADIUS_R ** 2
    n_edges = 0
    for i in range(len(ids)):
        best, bnb = None, None
        for j in range(len(ids)):
            if i == j or d2[i, j] > r2:
                continue
            key = (d2[i, j], int(ids[j]))
            if best is None or key < best:
                best, bnb = key, int(ids[j])
        if bnb is not None:
            n_edges += 1
            ra, rb = find(int(ids[i])), find(bnb)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    assert n_edges > 0
    comp = {}
    for i in ids:
        comp.setdefault(find(int(i)), []).append(int(i))
    exp = {min(v): len(v) for v in comp.values()}
    got = {r["rep"]: r["n_pts"]
           for r in em.q_boruvka_round1(spark, SF).collect()}
    assert got == exp
    # contraction actually happened: fewer clusters than points
    assert len(got) < len(ids)
