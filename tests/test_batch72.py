"""Batch-72 units: discrete Fréchet pairs (pure-python DP brute, the
Fréchet ≥ Hausdorff dominance, and an order-sensitivity fixture) and
ColBERT-style maxsim (numpy brute; maxsim ≥ pooled-dot sanity)."""
import numpy as np
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.sources import minted

SF = "/root/testdata/sf0.001"


def _brute_frechet2(a, b):
    n, m = len(a), len(b)
    d2 = [[(a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2
           for j in range(m)] for i in range(n)]
    c = [[0] * m for _ in range(n)]
    c[0][0] = d2[0][0]
    for j in range(1, m):
        c[0][j] = max(d2[0][j], c[0][j - 1])
    for i in range(1, n):
        c[i][0] = max(d2[i][0], c[i - 1][0])
        for j in range(1, m):
            c[i][j] = max(d2[i][j], min(c[i - 1][j], c[i - 1][j - 1],
                                        c[i][j - 1]))
    return c[n - 1][m - 1]


def test_frechet_pairs_vs_brute(spark):
    wl = minted.cluster_walk_lines_q(spark, SF, k=9, stride=1).toPandas()
    lines = {int(r.doc_id): list(zip([int(x) for x in r.xs_q],
                                     [int(y) for y in r.ys_q]))
             for r in wl.itertuples()}
    per = {}
    for g in set(d % 37 for d in lines):
        mem = sorted(d for d in lines if d % 37 == g)
        for a, b in zip(mem, mem[1:]):
            per[(a, b)] = _brute_frechet2(lines[a], lines[b])
    got = {(r["doc_a"], r["doc_b"]): r["frechet2"]
           for r in em.q_frechet_pairs(spark, SF).collect()}
    assert got == per
    # dominance: Fréchet² ≥ Hausdorff² on every pair
    hd = {(r["doc_a"], r["doc_b"]): r["hausdorff2"]
          for r in em.q_hausdorff_pairs(spark, SF).collect()}
    assert set(hd) == set(got)
    assert all(got[k] >= hd[k] for k in got)


def test_frechet_is_order_sensitive():
    # identical point SETS, opposite traversal order: Hausdorff 0,
    # Fréchet large — the property that justifies the operator
    a = [(i, 0) for i in range(9)]
    b = list(reversed(a))
    assert _brute_frechet2(a, b) == 64  # leash spans the whole line
    assert _brute_frechet2(a, a) == 0


def test_colbert_maxsim_vs_brute(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    sub = 64 // em.MAXSIM_SUB
    S = M.reshape(len(M), em.MAXSIM_SUB, sub)
    exp = {}
    for qi in np.where(ids % em.MAXSIM_EVERY == 0)[0]:
        # maxsim[i] over docs: dots (docs, qsub, vsub)
        dots = np.einsum("qd,nvd->nqv", S[qi], S)
        sc = dots.max(axis=2).sum(axis=1)
        order = sorted((-(sc[k]), ids[k]) for k in range(len(ids))
                       if ids[k] != ids[qi])
        exp[ids[qi]] = [int(v) for _, v in order[:em.MAXSIM_K]]
    got = {}
    for r in em.q_colbert_maxsim(spark, SF).collect():
        got.setdefault(r["query_id"], {})[r["rank"]] = r["neighbor_id"]
    got = {q: [d[k] for k in sorted(d)] for q, d in got.items()}
    assert got == exp
    # sanity: maxsim ≥ the pooled full dot product for any (q, v) pair
    q0 = np.where(ids % em.MAXSIM_EVERY == 0)[0][0]
    v0 = (q0 + 1) % len(ids)
    pooled = float(M[q0] @ M[v0])
    ms = float(np.einsum("qd,vd->qv", S[q0], S[v0]).max(axis=1).sum())
    assert ms >= pooled - 1e-9
