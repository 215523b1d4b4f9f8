"""Batch-89 units: bipartiteness audit (python DFS-components + BFS-
levels brute; crafted even/odd cycles pin both verdicts) and mutual-kNN
pairs (numpy radius/top-k brute from the raw points)."""
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def brute_bipartite(pairs):
    """{rep: (n_nodes, n_edges, n_conflicts, is_bipartite)} — BFS from
    each component's min node, conflicts = edges with equal levels."""
    E = {tuple(sorted(e)) for e in pairs if e[0] != e[1]}
    adj = {}
    for u, v in E:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    seen, out = set(), {}
    for root in sorted(adj):
        if root in seen:
            continue
        lvl = {root: 0}
        frontier = [root]
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in lvl:
                        lvl[w] = lvl[u] + 1
                        nxt.append(w)
            frontier = nxt
        comp = set(lvl)
        seen |= comp
        ce = [e for e in E if e[0] in comp]
        confl = sum(1 for u, v in ce if lvl[u] == lvl[v])
        out[min(comp)] = (len(comp), len(ce), confl, confl == 0)
    return out


def test_bipartite_crafted():
    even = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]  # C4
    odd = [("x", "y"), ("y", "z"), ("z", "x")]               # C3
    out = brute_bipartite(even + odd)
    assert out["a"] == (4, 4, 0, True)
    assert out["x"][3] is False and out["x"][2] >= 1
    # path (a tree) is always bipartite
    path = [("1", "2"), ("2", "3"), ("3", "4")]
    assert brute_bipartite(path)["1"] == (4, 3, 0, True)


def test_bipartite_check_vs_brute(spark):
    pairs = [(r["src_host"], r["dst_host"])
             for r in em._host_edges(spark).collect()]
    exp = brute_bipartite(pairs)
    got = {r["rep_host"]: (r["n_nodes"], r["n_edges"],
                           r["n_conflicts"], r["is_bipartite"])
           for r in em.q_bipartite_check(spark, SF).collect()}
    assert got == exp
    # the web-graph fixture is decisively non-bipartite
    assert any(not v[3] for v in got.values())


def test_mutual_knn_vs_brute(spark):
    from geobuf_spark.sources import minted
    pts = {r["doc_id"]: (r["qx"], r["qy"])
           for r in minted.minted_cluster_points_q(spark, SF).collect()}
    ids = sorted(pts)
    knn = {}
    r2 = em.RADIUS_R * em.RADIUS_R
    for i in ids:
        xi, yi = pts[i]
        cands = []
        for j in ids:
            if i == j:
                continue
            xj, yj = pts[j]
            d2 = (xi - xj) ** 2 + (yi - yj) ** 2
            if d2 <= r2:
                cands.append((d2, j))
        cands.sort()
        knn[i] = {j: (rk + 1, d2)
                  for rk, (d2, j) in enumerate(cands[:em.KNNG_K])}
    exp = {}
    for a in ids:
        for b, (rk_ab, d2) in knn[a].items():
            if a < b and a in knn.get(b, {}):
                exp[(a, b)] = (d2, rk_ab, knn[b][a][0])
    got = {(r["a"], r["b"]): (r["dist2"], r["rk_ab"], r["rk_ba"])
           for r in em.q_mutual_knn(spark, SF).collect()}
    assert got == exp and len(got) > 0
    # mutuality is symmetric by construction; ranks are within k
    for d2, rab, rba in got.values():
        assert 1 <= rab <= em.KNNG_K and 1 <= rba <= em.KNNG_K
