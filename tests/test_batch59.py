"""Batch-59 units: prefix-filtered set-similarity join (losslessness vs a
no-prefix all-pairs brute) and summed-area-table rectangle counts (vs
direct numpy containment)."""
import numpy as np

import __spark_entry__ as em
from geobuf_spark.operators import dedup
from geobuf_spark.sources import minted

SF = "/root/testdata/sf0.001"


def _brute_shingles(text: str, k: int = 3) -> frozenset:
    toks = text.split(" ")
    n = len(toks)
    out = []
    for i in range(max(n - k + 1, 1)):
        out.append("\x1f".join(toks[i:i + k]))
    return frozenset(out)


def test_ssjoin_prefix_matches_brute(spark):
    docs = em._docs(spark, SF).select("doc_id", "text").toPandas()
    shs = {r.doc_id: _brute_shingles(r.text) for r in docs.itertuples()}
    tau = em.SSJOIN_TAU_PPM
    ids = sorted(shs)
    exp = {}
    # the brute is the FULL all-pairs loop — zero prefix-filter logic, so
    # a match proves the candidate scheme lost nothing
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            inter = len(shs[a] & shs[b])
            na, nb = len(shs[a]), len(shs[b])
            union = na + nb - inter
            if 10**6 * inter >= tau * union:
                exp[(a, b)] = (inter, na, nb, 10**6 * inter // union)
    got = {(r["a"], r["b"]): (r["inter"], r["na"], r["nb"], r["jacc_ppm"])
           for r in dedup.prefix_filter_pairs(
               em._docs(spark, SF), key="doc_id", shingle_k=3,
               tau_ppm=tau).collect()}
    assert got == exp
    assert len(exp) > 0  # fixture actually exercises the join


def test_prefix_filter_tau_sweep(spark):
    # tighter τ must give a subset; τ→1.0 keeps only exact-duplicate sets
    d = em._docs(spark, SF)
    loose = {(r["a"], r["b"]) for r in dedup.prefix_filter_pairs(
        d, key="doc_id", tau_ppm=500_000).collect()}
    tight = {(r["a"], r["b"]): r for r in dedup.prefix_filter_pairs(
        d, key="doc_id", tau_ppm=1_000_000).collect()}
    assert set(tight) <= loose
    for r in tight.values():
        assert r["inter"] == r["na"] == r["nb"]


def test_rect_prefix_counts_matches_brute(spark):
    p = minted.minted_points_q(spark, SF).toPandas()
    cx = (p["qx"] // em.SAT_R).to_numpy(np.int64)
    cy = (p["qy"] // em.SAT_R).to_numpy(np.int64)
    # every minted point must land on the constant dense grid the SAT
    # covers — otherwise inclusion-exclusion silently undercounts
    assert cx.min() >= 0 and cx.max() < em.SAT_W
    assert cy.min() >= 0 and cy.max() < em.SAT_H
    rects = em._sat_rects(spark, SF).toPandas()
    got = {r["rect_id"]: r["n_points"]
           for r in em.q_rect_prefix_counts(spark, SF).collect()}
    assert set(got) == set(rects["rect_id"])
    nonzero = 0
    for r in rects.itertuples():
        exp = int(((cx >= r.x1) & (cx <= r.x2)
                   & (cy >= r.y1) & (cy <= r.y2)).sum())
        assert got[r.rect_id] == exp, r.rect_id
        nonzero += exp > 0
    # the mint must produce a healthy mix of empty and occupied rects
    assert 0 < nonzero < len(rects)
