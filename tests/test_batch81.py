"""Batch-81 units: full coreness (INDEPENDENT sequential-peeling brute —
the h-index fixpoint must equal classic core decomposition) and the Gini
decision stump (pandas brute + split-quality properties)."""
import numpy as np
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.operators import graph

SF = "/root/testdata/sf0.001"


def brute_coreness(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {n: len(nb) for n, nb in adj.items()}
    core = {}
    live = dict(deg)
    nbrs = {n: set(nb) for n, nb in adj.items()}
    k = 0
    while live:
        k_min = min(live.values())
        k = max(k, k_min)
        peel = [n for n, d in live.items() if d <= k]
        while peel:
            n = peel.pop()
            if n not in live:
                continue
            core[n] = k
            del live[n]
            for nb in nbrs[n]:
                if nb in live:
                    live[nb] -= 1
                    if live[nb] <= k:
                        peel.append(nb)
    return core


def test_coreness_vs_peeling_brute(spark):
    ed = [(r[0], r[1]) for r in em._host_edges(spark).collect()]
    exp = brute_coreness(ed)
    got = {r["host"]: r["coreness"]
           for r in graph.coreness(
               spark.createDataFrame(ed, ["src", "dst"])).collect()}
    assert got == exp
    # driver-query rollup matches the same distribution
    dist = {}
    for c in exp.values():
        dist[c] = dist.get(c, 0) + 1
    qrows = {r["coreness"]: r["n_hosts"]
             for r in em.q_coreness(spark, SF).collect()}
    assert qrows == dist
    assert max(exp.values()) >= 2  # the graph has a real dense core


def test_coreness_known_graph(spark):
    # K4 (coreness 3) + a bridge node between the cores (coreness 2 —
    # its both neighbors survive 2-core peeling, so it does too) + a
    # triangle (coreness 2) + a true leaf (coreness 1)
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")]
    bridge = [("d", "e"), ("e", "f")]
    tri = [("f", "g"), ("g", "h"), ("h", "f")]
    leaf = [("d", "x")]
    df = spark.createDataFrame(k4 + bridge + tri + leaf, ["src", "dst"])
    got = {r["host"]: r["coreness"]
           for r in graph.coreness(df).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 2, "f": 2,
                   "g": 2, "h": 2, "x": 1}


def test_stump_split_vs_brute(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["lang", "n_chars"])
    lv = (d["n_chars"] // em.STUMP_LEVEL).to_numpy()
    y = (d["lang"] == "en").astype(int).to_numpy()
    levels = np.unique(lv)
    n, p = len(d), int(y.sum())
    best = None
    for t in levels:
        m = lv <= t
        n0, p0 = int(m.sum()), int(y[m].sum())
        if n0 == 0 or n0 == n:
            continue
        sc = ((n0 * n0 - p0 * p0 - (n0 - p0) ** 2) * em.STUMP_Q // n0
              + ((n - n0) ** 2 - (p - p0) ** 2
                 - ((n - n0) - (p - p0)) ** 2) * em.STUMP_Q // (n - n0))
        key = (sc, t)
        if best is None or key < best[0]:
            best = (key, (int(t) * em.STUMP_LEVEL, sc, n0, n - n0, p0,
                          p - p0))
    r = em.q_stump_split(spark, SF).collect()
    assert len(r) == 1
    got = (r[0]["threshold_chars"], r[0]["impurity_scaled"],
           r[0]["n_left"], r[0]["n_right"], r[0]["pos_left"],
           r[0]["pos_right"])
    assert got == best[1]
    # the chosen split must beat the no-split impurity (total Gini)
    no_split = (n * n - p * p - (n - p) ** 2) * em.STUMP_Q // n
    assert got[1] <= no_split
