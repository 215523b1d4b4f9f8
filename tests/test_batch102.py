"""Batch-102 units: linear-threshold cascade (python synchronous replay
+ the fixpoint property: every inactive node is genuinely below its
threshold against the FINAL active set) and rich-club coefficient
(pandas brute + the monotone elite-density profile)."""
import hashlib

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"
SEP = "\x1e"


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _graph(spark):
    pairs = [(r["src_host"], r["dst_host"])
             for r in em._host_edges(spark).collect()]
    E = {tuple(sorted(e)) for e in pairs if e[0] != e[1]}
    adj = {}
    for u, v in E:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return E, adj


def test_influence_spread_vs_brute(spark):
    E, adj = _graph(spark)
    theta = {n: _h60(f"th{SEP}{n}") % 1_000_000 for n in adj}
    active = {n: 0 for n in adj if n.endswith("00.example")}
    r = 0
    while True:
        r += 1
        newly = [n for n in adj if n not in active
                 and len(adj[n] & set(active)) * 1_000_000
                 >= theta[n] * len(adj[n])]
        if not newly:
            break
        for n in newly:
            active[n] = r
        assert r <= em.INF_ROUNDS
    got = {row["host"]: row["round"]
           for row in em.q_influence_spread(spark, SF).collect()}
    assert got == active
    # fixpoint: every non-activated node is strictly below threshold
    # against the FINAL active set
    act = set(active)
    for n in adj:
        if n not in act:
            assert (len(adj[n] & act) * 1_000_000
                    < theta[n] * len(adj[n]))
    assert max(active.values()) >= 2  # multi-hop cascade


def test_rich_club_vs_brute(spark):
    E, adj = _graph(spark)
    deg = {n: len(adj[n]) for n in adj}
    exp = {}
    for k in em.RC_KS:
        elite = {n for n in adj if deg[n] > k}
        ek = sum(1 for u, v in E if u in elite and v in elite)
        nk = len(elite)
        phi = 10**6 * 2 * ek // (nk * (nk - 1)) if nk >= 2 else 0
        exp[k] = (nk, ek, phi)
    got = {r["k"]: (r["n_nodes"], r["n_edges"], r["phi_ppm"])
           for r in em.q_rich_club(spark, SF).collect()}
    assert got == exp
    # the elite gets denser as k rises (until it empties)
    ks = sorted(k for k in got if got[k][0] >= 2)
    phis = [got[k][2] for k in ks]
    assert phis == sorted(phis)
