"""Batch-76 units: Gonzalez k-center (python-int brute + the 2-approx
covering property on the fixture) and the dedup-aware fold-leakage audit
(brute folds + the component-fold zero-leak guarantee)."""
import hashlib

import numpy as np
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.sources import minted

SF = "/root/testdata/sf0.001"


def _pts():
    ids = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id"])["doc_id"]
    out = []
    for did in ids:
        did = int(did)
        g = did % minted.N_CLUSTERS
        cx = (g * minted._CLX_MULT * minted.LON_MULT) % minted._CLX_SPAN
        cy = (g * minted._CLY_MULT * minted.LAT_MULT) % minted._CLY_SPAN
        ox = ((did % minted.LON_MOD) * minted.LON_MULT % minted.LON_MOD
              * minted._OFFX_MULT) % minted._OFFX_SPAN
        oy = ((did % minted.LAT_MOD) * minted.LAT_MULT % minted.LAT_MOD
              * minted._OFFY_MULT) % minted._OFFY_SPAN
        out.append((did, cx + ox, cy + oy))
    return out


def test_kcenter_greedy_vs_brute(spark):
    pts = _pts()
    sel = [min(pts)]
    exp = [(1, sel[0][0], sel[0][1], sel[0][2], -1)]
    for r in range(2, em.KCENTER_K + 1):
        best = None
        for did, x, y in pts:
            md = min((x - cx) ** 2 + (y - cy) ** 2
                     for _, cx, cy in sel)
            key = (-md, did)
            if best is None or key < best[0]:
                best = (key, (did, x, y), md)
        sel.append(best[1])
        exp.append((r, best[1][0], best[1][1], best[1][2],
                    best[2] // 64))
    got = [(r["rank"], r["center_doc"], r["qx"], r["qy"],
            r["radius2_d64"])
           for r in em.q_kcenter_greedy(spark, SF)
           .orderBy("rank").collect()]
    assert got == exp
    # selection radii are non-increasing (farthest-first property)
    radii = [r for _, _, _, _, r in got[1:]]
    assert radii == sorted(radii, reverse=True)
    # k-center value: max-min distance after k centers is ≤ the radius
    # the LAST center was picked at (greedy guarantee on this run)
    last_r = radii[-1]
    cov = max(min((x - cx) ** 2 + (y - cy) ** 2
                  for _, cx, cy in sel) for _, x, y in pts) // 64
    assert cov <= last_r


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_fold_leakage_audit(spark):
    rows = {r["strategy"]: (r["n_pairs"], r["n_cross"], r["cross_ppm"])
            for r in em.q_fold_leakage_audit(spark, SF).collect()}
    assert set(rows) == {"doc_hash", "component_hash"}
    n_pairs = rows["doc_hash"][0]
    assert n_pairs > 0
    # component folds CANNOT split a detected near-dup pair
    assert rows["component_hash"][1] == 0
    # doc-hash folds leak at roughly the random 1−1/F rate
    frac = rows["doc_hash"][1] / n_pairs
    assert 0.4 <= frac <= 1.0
    # brute the doc-hash side against the exact pair tier
    from geobuf_spark.operators import dedup
    pairs = dedup.ngram_jaccard_pairs(
        em._docs(spark, SF), key="doc_id", shingle_k=3,
        threshold=0.4).select("a", "b").collect()
    x = sum(_h60(f"fold:{r['a']}") % em.FOLD_N
            != _h60(f"fold:{r['b']}") % em.FOLD_N for r in pairs)
    assert (len(pairs), x) == (n_pairs, rows["doc_hash"][1])
