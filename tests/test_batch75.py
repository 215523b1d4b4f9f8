"""Batch-75 units: Apriori frequent triples (pandas brute + a measured
downward-closure prune) and the double-sweep diameter bound (python BFS
brute + sweep-improves and cap-headroom properties)."""
import numpy as np
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _basket_frame():
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type",
                                  "value"])
    day = ev["ts"].astype("datetime64[s]").astype(np.int64) // 86400
    cents = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    item = (ev["event_type"] + "#"
            + np.minimum(cents // 10000, 3).astype(str))
    bk = ev["user_id"].astype(str) + "|" + day.astype(str)
    return pd.DataFrame({"bk": bk, "item": item}).drop_duplicates()


def test_apriori_triples_vs_brute(spark):
    bi = _basket_frame()
    baskets = bi.groupby("bk")["item"].apply(frozenset)
    from itertools import combinations
    cnt = {}
    for b in baskets:
        for tri in combinations(sorted(b), 3):
            cnt[tri] = cnt.get(tri, 0) + 1
    exp = {t: c for t, c in cnt.items() if c >= em.APRIORI_SUP}
    got = {(r["a"], r["b"], r["c"]): r["support"]
           for r in em.q_apriori_triples(spark, SF).collect()}
    assert got == exp
    assert len(got) > 0


def test_apriori_prune_actually_prunes():
    # downward closure must be doing work on the fixture: the number of
    # pair-join candidates that survive the (b, c)-frequent prune is
    # strictly below the unpruned candidate count
    bi = _basket_frame()
    from itertools import combinations
    pair_cnt = {}
    for b in bi.groupby("bk")["item"].apply(frozenset):
        for pr in combinations(sorted(b), 2):
            pair_cnt[pr] = pair_cnt.get(pr, 0) + 1
    f2 = {p for p, c in pair_cnt.items() if c >= em.APRIORI_SUP}
    cand = [(a, b, c) for (a, b) in f2 for (a2, c) in f2
            if a2 == a and b < c]
    pruned = [t for t in cand if (t[1], t[2]) in f2]
    assert 0 < len(pruned) < len(cand)


def _bfs(adj, seed):
    dist = {seed: 0}
    frontier = [seed]
    while frontier:
        nxt = []
        for n in frontier:
            for nb in adj.get(n, ()):
                if nb not in dist:
                    dist[nb] = dist[n] + 1
                    nxt.append(nb)
        frontier = nxt
    return dist


def test_diameter_sweep_vs_brute(spark):
    ed = em._host_edges(spark).collect()
    adj = {}
    for r in ed:
        u, v = r[0], r[1]
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    start = min(adj)
    d1 = _bfs(adj, start)
    ecc1 = max(d1.values())
    far1 = min(h for h, d in d1.items() if d == ecc1)
    d2 = _bfs(adj, far1)
    ecc2 = max(d2.values())
    far2 = min(h for h, d in d2.items() if d == ecc2)
    r = em.q_diameter_sweep(spark, SF).collect()
    assert len(r) == 1
    got = (r[0]["start"], r[0]["far1"], r[0]["ecc1"], r[0]["far2"],
           r[0]["diameter_lb"])
    assert got == (start, far1, ecc1, far2, ecc2)
    # the second sweep must improve (or tie) the first — the reason the
    # double sweep exists — and the cap must not have bound
    assert ecc2 >= ecc1
    assert ecc2 < em.DIAM_CAP
