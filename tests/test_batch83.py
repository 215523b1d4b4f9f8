"""Batch-83 units: k-truss peeling (sequential python peeling as the
independent algorithm — known graphs incl. a cascade-to-empty case, plus
the fixture host graph) and the deterministic Poisson bootstrap (hashlib
brute recomputes every weight, resample mean, and CI rank exactly)."""
import hashlib
import math

import pandas as pd

import __spark_entry__ as em
from geobuf_spark.operators import graph

SF = "/root/testdata/sf0.001"


def brute_ktruss(pairs, k):
    """Sequential peeling: recompute supports, drop < k-2, repeat."""
    E = {tuple(sorted(e)) for e in pairs if e[0] != e[1]}
    while True:
        adj = {}
        for u, v in E:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        sup = {(u, v): len(adj[u] & adj[v]) for u, v in E}
        weak = {e for e in E if sup[e] < k - 2}
        if not weak:
            return sup
        E -= weak


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src string, dst string")


def test_ktruss_known_graphs(spark):
    # K4 (every edge in 2 triangles) + pendant triangle (d,e,f) + a
    # bridge f-g that sits in no triangle: 3-truss keeps K4 and the
    # triangle, drops the bridge
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")]
    pend = [("d", "e"), ("e", "f"), ("d", "f"), ("f", "g")]
    got = {(r["u"], r["v"]): r["support"]
           for r in graph.ktruss(_edges_df(spark, k4 + pend), k=3)
           .collect()}
    assert got == brute_ktruss(k4 + pend, 3)
    assert ("f", "g") not in got and ("d", "e") in got

    # cascade: two triangles sharing edge (2,3); at k=4 the four
    # support-1 edges go first, then (2,3)'s support drops 2→0 and the
    # truss empties — the peeling must cascade, not stop after round 1
    dia = [("1", "2"), ("1", "3"), ("2", "3"), ("2", "4"), ("3", "4")]
    got4 = graph.ktruss(_edges_df(spark, dia), k=4).collect()
    assert got4 == [] and brute_ktruss(dia, 4) == {}
    # and K4 IS a 4-truss (support 2 everywhere)
    gk4 = {(r["u"], r["v"]): r["support"]
           for r in graph.ktruss(_edges_df(spark, k4), k=4).collect()}
    assert gk4 == brute_ktruss(k4, 4)
    assert set(gk4.values()) == {2}


def test_ktruss_fixture_vs_brute(spark):
    pairs = [(r["src_host"], r["dst_host"])
             for r in em._host_edges(spark).collect()]
    exp = brute_ktruss(pairs, em.KTRUSS_K)
    got = {(r["host_a"], r["host_b"]): r["support"]
           for r in em.q_ktruss_edges(spark, SF).collect()}
    assert got == exp
    assert len(got) > 0  # nonvacuous on the fixture


def test_poisson_bootstrap_vs_brute(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang", "n_chars"])
    SEP = "\x1e"

    def weight(doc_id, b):
        u = int(hashlib.md5(f"pb{SEP}{doc_id}{SEP}{b}".encode())
                .hexdigest()[:15], 16)
        for j, t in enumerate(em._PB_T):
            if u < t:
                return j
        return 5

    # thresholds are the Poisson(1) CDF on 60 bits
    cdf = 0.0
    for j in range(5):
        cdf += math.exp(-1.0) / math.factorial(j)
        assert em._PB_T[j] == int(cdf * (1 << 60))

    exp = {}
    for lang, g in d.groupby("lang"):
        xs = g["n_chars"].astype(int).tolist()
        ids = g["doc_id"].astype(int).tolist()
        point = 1000 * sum(xs) // len(xs)
        means = []
        for b in range(em._PB_B):
            ws = [weight(i, b) for i in ids]
            wn = sum(ws)
            if wn > 0:
                s = sum(w * x for w, x in zip(ws, xs))
                means.append((1000 * s // wn, b))
        means.sort()
        exp[lang] = (len(xs), point, means[em._PB_LO - 1][0],
                     means[em._PB_HI - 1][0], len(means))

    rows = em.q_poisson_bootstrap(spark, SF).collect()
    got = {r["lang"]: (r["n_docs"], r["point_m"], r["lo_m"], r["hi_m"],
                       r["n_boot"]) for r in rows}
    assert got == exp
    for n_docs, point, lo, hi, n_boot in got.values():
        assert lo <= hi and n_boot == em._PB_B
