"""Batch-96 units: Luby MIS (python replay brute + the two defining
properties checked directly — independence and maximality) and BWT
(inverse transform by LF mapping reconstructs every input exactly —
the independent proof — plus run-count brutes and a crafted repetitive
string where BWT clustering wins)."""
import hashlib

import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"
SEP = "\x1e"


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def brute_luby(pairs, rounds):
    E = {tuple(sorted(e)) for e in pairs if e[0] != e[1]}
    adj = {}
    for u, v in E:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    live = set(adj)
    mis = {}
    for r in range(1, rounds + 1):
        if not live:
            return mis
        h = {n: _h60(f"mis{SEP}{n}{SEP}{r}") for n in live}
        win = [n for n in live
               if all((h[n], n) < (h[m], m)
                      for m in adj[n] & live)]
        for n in win:
            mis[n] = r
        dead = set(win) | {m for n in win for m in adj[n]}
        live -= dead
    raise AssertionError("brute_luby: no convergence")


def test_mis_luby_vs_brute(spark):
    pairs = [(r["src_host"], r["dst_host"])
             for r in em._host_edges(spark).collect()]
    exp = brute_luby(pairs, em.MIS_ROUNDS)
    got = {r["host"]: r["round"]
           for r in em.q_mis_luby(spark, SF).collect()}
    assert got == exp
    # defining properties, checked against the graph directly
    E = {tuple(sorted(e)) for e in pairs if e[0] != e[1]}
    adj = {}
    for u, v in E:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    m = set(got)
    for u, v in E:
        assert not (u in m and v in m)          # independent
    for n in adj:
        assert n in m or (adj[n] & m)           # maximal
    assert len(got) > 1 and max(got.values()) > 1  # multi-round run


def bwt(s):
    rots = sorted(s[i:] + s[:i] for i in range(len(s)))
    return "".join(r[-1] for r in rots)


def inverse_bwt(b):
    """LF mapping: repeatedly prepend-sort. O(n²) but n = 33."""
    table = [""] * len(b)
    for _ in range(len(b)):
        table = sorted(b[i] + table[i] for i in range(len(b)))
    return next(t for t in table if t.endswith("\x01"))


def runs(s):
    return 1 + sum(1 for a, b2 in zip(s, s[1:]) if a != b2)


def test_bwt_runs_vs_brute_and_inverse(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    exp = {}
    for r in d.itertuples():
        s = r.text[:em.BWT_PREFIX] + "\x01"
        exp[int(r.doc_id)] = (bwt(s), runs(s), runs(bwt(s)))
    got = {r["doc_id"]: (r["bwt"], r["runs_raw"], r["runs_bwt"])
           for r in em.q_bwt_runs(spark, SF).collect()}
    assert got == exp
    # the transform is invertible — reconstruct every document prefix
    for r in d.itertuples():
        s = r.text[:em.BWT_PREFIX] + "\x01"
        assert inverse_bwt(got[int(r.doc_id)][0]) == s


def test_bwt_crafted_clustering():
    s = "abcabcabcabcabc" + "\x01"
    assert runs(bwt(s)) < runs(s)  # BWT groups equal chars
    assert inverse_bwt(bwt(s)) == s
    assert bwt("banana\x01") == "annb\x01aa"
