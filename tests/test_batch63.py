"""Batch-63 units: synchronous label propagation (vs a pure-python brute,
plus a partitioning-invariance check) and consistent-hash ring sharding
(vs a python-int brute over the same md5 ring)."""
import hashlib

import pandas as pd

import __spark_entry__ as em
from geobuf_spark.operators import graph

SF = "/root/testdata/sf0.001"

# two triangles bridged by one edge, plus an isolated pair; multi-edge
# and self-loop noise must not change votes
LPA_EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("c", "d"),
    ("d", "e"), ("e", "f"), ("f", "d"),
    ("x", "y"),
    ("a", "b"), ("b", "a"),      # multi-edge / reverse dup
    ("e", "e"),                  # self loop
]


def brute_lpa(edges, rounds):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n in adj:
            votes = {}
            for nb in adj[n]:
                votes[lab[nb]] = votes.get(lab[nb], 0) + 1
            votes[lab[n]] = votes.get(lab[n], 0) + 1  # self-vote
            new[n] = min(votes, key=lambda k: (-votes[k], k))
        lab = new
    return lab


def test_lpa_labels_vs_brute(spark):
    df = spark.createDataFrame(LPA_EDGES, ["src", "dst"])
    for rounds in (1, 2, 3):
        got = {r["host"]: r["lab"]
               for r in graph.lpa_labels(df, rounds=rounds).collect()}
        assert got == brute_lpa(LPA_EDGES, rounds), rounds
    # after enough rounds the two triangles collapse onto their min
    # member and the bridge can't merge them (self-vote damping)
    got3 = {r["host"]: r["lab"]
            for r in graph.lpa_labels(df, rounds=3).collect()}
    assert got3["a"] == got3["b"] == got3["c"] == "a"
    assert got3["e"] == got3["f"] == got3["d"]
    assert got3["x"] == got3["y"] == "x"


def test_lpa_partitioning_invariance(spark):
    df = spark.createDataFrame(LPA_EDGES, ["src", "dst"])
    a = sorted(map(tuple, graph.lpa_labels(df, rounds=2).collect()))
    b = sorted(map(tuple,
                   graph.lpa_labels(df.repartition(7), rounds=2).collect()))
    assert a == b


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_consistent_shards_vs_brute(spark):
    ring = sorted((_h60(f"vnode:{v}"), v) for v in range(em.N_VNODES))
    ids = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id"])["doc_id"]
    per = {}
    for did in ids:
        h = _h60(f"doc:{int(did)}")
        tgt = next((v for p, v in ring if p >= h), ring[0][1])
        n, lo, hi = per.get(tgt, (0, None, None))
        per[tgt] = (n + 1, h if lo is None else min(lo, h),
                    h if hi is None else max(hi, h))
    got = {r["vnode"]: (r["n_docs"], r["min_h"], r["max_h"])
           for r in em.q_consistent_shards(spark, SF).collect()}
    assert got == per
    # the ring must actually spread load: many vnodes occupied, and no
    # vnode owns more than a quarter of the corpus
    assert len(got) > em.N_VNODES // 2
    assert max(n for n, _, _ in got.values()) < len(ids) / 4


def test_consistent_shards_bounded_rebalance(spark):
    # THE property consistent hashing buys: removing one vnode moves
    # only the keys that vnode owned — every other assignment is stable
    ring = sorted((_h60(f"vnode:{v}"), v) for v in range(em.N_VNODES))
    ids = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id"])["doc_id"]

    def assign(ring):
        out = {}
        for did in ids:
            h = _h60(f"doc:{int(did)}")
            out[int(did)] = next((v for p, v in ring if p >= h),
                                 ring[0][1])
        return out

    full = assign(ring)
    victim = full[int(ids.iloc[0])]
    reduced = assign([(p, v) for p, v in ring if v != victim])
    moved = {d for d in full if full[d] != reduced[d]}
    assert moved == {d for d, v in full.items() if v == victim}
