"""Batch-57 units: bulk kNN graph and language-profile cosine —
verified against independent numpy/python brute force."""
import numpy as np
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.sources import minted

SF = "/root/testdata/sf0.001"


def test_knn_graph_matches_brute(spark):
    pts = minted.minted_cluster_points_q(spark, SF).toPandas()
    ids = pts["doc_id"].to_numpy(np.int64)
    x, y = pts["qx"].to_numpy(np.int64), pts["qy"].to_numpy(np.int64)
    r2 = em.RADIUS_R ** 2
    exp = {}
    for i in range(len(ids)):
        cand = []
        for j in range(len(ids)):
            if i == j:
                continue
            d2 = int(x[i] - x[j]) ** 2 + int(y[i] - y[j]) ** 2
            if d2 <= r2:
                cand.append((d2, int(ids[j])))
        for rk, (d2, nb) in enumerate(sorted(cand)[:em.KNNG_K], 1):
            exp[(int(ids[i]), rk)] = (nb, d2)
    got = {(r["doc_id"], r["rk"]): (r["nb"], r["dist2"])
           for r in em.q_knn_graph_k3(spark, SF).collect()}
    assert got == exp
    # the graph is non-trivial: some point has all 3 neighbors
    assert any(rk == em.KNNG_K for _, rk in got)


def test_lang_profile_cosine_matches_numpy(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    prof = {}
    for lang, g in docs.groupby("lang"):
        cnt = {}
        for t in g["text"]:
            for w in t.split(" "):
                if w:
                    cnt[w] = cnt.get(w, 0) + 1
        prof[lang] = cnt
    langs = sorted(prof)
    got = {(r["lang_a"], r["lang_b"]): r
           for r in em.q_lang_profile_cosine(spark, SF).collect()}
    assert len(got) == len(langs) * (len(langs) - 1) // 2
    for i, a in enumerate(langs):
        for b in langs[i + 1:]:
            dot = sum(c * prof[b].get(t, 0)
                      for t, c in prof[a].items())
            na2 = sum(c * c for c in prof[a].values())
            nb2 = sum(c * c for c in prof[b].values())
            row = got[(a, b)]
            assert (row["dot"], row["na2"], row["nb2"]) == (dot, na2, nb2)
            cos = dot / np.sqrt(float(na2) * float(nb2))
            assert abs(row["cos_e6"] / 1e6 - cos) < 2e-6
