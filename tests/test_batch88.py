"""Batch-88 units: integer power iteration (numpy exact-trajectory brute
+ convergence to the float dominant eigenvector) and Huffman code
lengths (heapq brute + Kraft equality + entropy optimality bounds)."""
import heapq
import math

import numpy as np
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _cov_int(sf):
    e = pd.read_parquet(f"{sf}/embeddings.parquet")
    q = np.floor(np.stack(e["embedding"].to_numpy()).astype("float64")
                 * em.EMB_COV_SCALE).astype(object)  # exact int math
    n = q.shape[0]
    s = q.sum(axis=0)
    sij = q.T @ q
    cov = n * sij - np.outer(s, s)
    return np.array([[int(c) // em.PI_SHIFT if int(c) >= 0
                      else -((-int(c)) // em.PI_SHIFT)
                      for c in row] for row in cov], dtype=object)


def test_power_iteration_vs_numpy_exact(spark):
    # cov_num div 2^20 truncates toward zero in both engines (div / //)
    C = _cov_int(SF)
    d = C.shape[0]
    v = np.array([em.PI_SCALE] * d, dtype=object)
    for _ in range(em.PI_ROUNDS):
        w = C @ v
        m = max(abs(int(x)) for x in w)
        k = m // em.PI_SCALE
        v = np.array([int(x) // k if int(x) >= 0
                      else -((-int(x)) // k) for x in w], dtype=object)
    got = {r["dim"]: r["v"]
           for r in em.q_power_iteration(spark, SF).collect()}
    exp = {i: int(v[i]) for i in range(d)}
    assert got == exp
    # direction converged: |cos| with numpy's dominant eigvec of C'
    Cf = C.astype("float64")
    evals, evecs = np.linalg.eigh(Cf)
    lead = evecs[:, np.argmax(np.abs(evals))]
    vf = np.array([float(x) for x in v])
    cos = abs(vf @ lead) / (np.linalg.norm(vf) * np.linalg.norm(lead))
    assert cos > 0.9  # fixture spectrum is nearly flat (λ1/λ2 ≈ 1.07)
    assert np.abs(Cf).max() > 0  # matrix is nontrivial


def brute_huffman(hist):
    """heapq-based Huffman with the pinned (count, min-label) ties."""
    heap = [(c, t, [t]) for t, c in hist]
    heapq.heapify(heap)
    depth = {t: 0 for t, _ in hist}
    while len(heap) > 1:
        c1, l1, m1 = heapq.heappop(heap)
        c2, l2, m2 = heapq.heappop(heap)
        for t in m1 + m2:
            depth[t] += 1
        heapq.heappush(heap, (c1 + c2, min(l1, l2), m1 + m2))
    return depth


def test_huffman_cost_vs_brute(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    cnt = {}
    for t in d["text"]:
        for tok in t.split(" "):
            cnt[tok] = cnt.get(tok, 0) + 1
    hist = sorted(cnt.items())
    depth = brute_huffman(hist)
    exp = {t: (c, depth[t]) for t, c in hist}
    got = {r["tok"]: (r["cnt"], r["code_len"])
           for r in em.q_huffman_cost(spark, SF).collect()}
    assert got == exp
    # Kraft equality for a full binary tree: Σ 2^-len == 1
    assert sum(2.0 ** -l for _, l in got.values()) == 1.0
    # optimality: H ≤ E[len] < H + 1
    total = sum(c for c, _ in got.values())
    H = -sum((c / total) * math.log2(c / total)
             for c, _ in got.values())
    avg = sum(c * l for c, l in got.values()) / total
    assert H <= avg + 1e-9 and avg < H + 1
    assert len({l for _, l in got.values()}) > 1  # nontrivial tree
