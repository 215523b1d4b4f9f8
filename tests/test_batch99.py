"""Batch-99 units: personalized PageRank (python integer replay brute +
locality property: seed-teleport mass concentrates rank on the seeds vs
the global variant) and source histogram overlap (pandas brute + metric
bounds and symmetry-free canonical pairs)."""
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"
SCALE = 1_000_000
DAMP = 850_000


def brute_ppr(pairs, seeds, iters=3):
    nodes = sorted({u for e in pairs for u in e})
    out = {}
    for s, d in pairs:
        out.setdefault(s, []).append(d)
    rank = {n: SCALE if n in seeds else 0 for n in nodes}
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for u, ds in out.items():
            c = rank[u] // len(ds)
            for d in ds:
                s[d] += c
        rank = {n: (SCALE - DAMP if n in seeds else 0)
                + int(DAMP * s[n] / SCALE) for n in nodes}
    return rank


def test_ppr_hosts_vs_brute(spark):
    pairs = [(r["src_host"], r["dst_host"])
             for r in em._host_edges(spark).collect()]
    seeds = {u for e in pairs for u in e
             if u.endswith("00.example")}
    exp = brute_ppr(pairs, seeds)
    got = {r["host"]: r["rank_ppm"]
           for r in em.q_ppr_hosts(spark, SF).collect()}
    assert got == exp
    # locality: seeds keep the teleport floor, and total seed-set rank
    # share is far above the seed share of nodes (personalization)
    n = len(got)
    seed_share_nodes = len(seeds) / n
    seed_share_rank = (sum(got[s] for s in seeds)
                       / max(sum(got.values()), 1))
    assert seed_share_rank > 3 * seed_share_nodes
    for s in seeds:
        assert got[s] >= SCALE - DAMP


def test_source_overlap_vs_brute(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["source", "lang"])
    h = d.groupby(["source", "lang"]).size()
    tot = d.groupby("source").size()
    srcs = sorted(tot.index)
    exp = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = sum(min(h.get((a, l), 0), h.get((b, l), 0))
                        for l in d["lang"].unique())
            exp[(a, b)] = (inter, int(tot[a]), int(tot[b]),
                           10**6 * inter // min(tot[a], tot[b]))
    # pairs with zero shared languages are absent from the join
    exp = {k: v for k, v in exp.items() if v[0] > 0}
    got = {(r["src_a"], r["src_b"]): (r["inter"], r["tot_a"],
                                      r["tot_b"], r["overlap_ppm"])
           for r in em.q_source_overlap(spark, SF).collect()}
    assert got == exp
    for (a, b), (inter, ta, tb, ppm) in got.items():
        assert a < b and 0 < inter <= min(ta, tb)
        assert 0 < ppm <= 10**6
