"""Batch-95 units: per-cluster Euclidean MST (KRUSKAL brute — the third
algorithm next to the engine's Borůvka and the oracle's Prim; unique
MST under the strict (d², a, b) edge order makes equality the proof —
plus the n−1 edge invariant and a crafted tie case) and the join-size
audit (pandas brute + the Cauchy–Schwarz direction: the independence
estimate never exceeds the true self-join size)."""
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def kruskal(pts):
    """pts: [(id, x, y)] → (n, edges, total_d2) via sorted-edge union."""
    n = len(pts)
    if n < 2:
        return (n, 0, 0)
    edges = []
    for i in range(n):
        for j in range(i + 1, n):
            (a, ax, ay), (b, bx, by) = pts[i], pts[j]
            edges.append(((ax - bx) ** 2 + (ay - by) ** 2,
                          min(a, b), max(a, b)))
    edges.sort()
    par = {i: i for i, _, _ in pts}

    def find(x):
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    total, cnt = 0, 0
    for w, a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            par[ra] = rb
            total += w
            cnt += 1
    return (n, cnt, total)


def test_emst_vs_kruskal(spark):
    from geobuf_spark.sources import minted
    rows = minted.minted_cluster_points_q(spark, SF).collect()
    groups = {}
    for r in rows:
        groups.setdefault(r["doc_id"] % minted.N_CLUSTERS, []).append(
            (r["doc_id"], r["qx"], r["qy"]))
    exp = {g: kruskal(sorted(ps)) for g, ps in groups.items()}
    got = {r["gid"]: (r["n_pts"], r["mst_edges"], r["total_d2"])
           for r in em.q_emst_clusters(spark, SF).collect()}
    assert got == exp
    for n, cnt, tot in got.values():
        assert cnt == n - 1 and tot > 0  # spanning-tree invariant


def test_emst_crafted_ties():
    # a unit square: four side edges tie at d²=1, diagonals at 2; the
    # (d², a, b) order picks sides deterministically, total = 3
    sq = [(1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 1, 1)]
    assert kruskal(sq) == (4, 3, 3)
    # collinear chain: MST is the chain itself
    ch = [(1, 0, 0), (2, 5, 0), (3, 9, 0)]
    assert kruskal(ch) == (3, 2, 25 + 16)


def test_join_size_audit_vs_brute(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["lang", "source"])
    e = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    exp = {}
    for name, col in [("documents.lang", d["lang"]),
                      ("documents.source", d["source"]),
                      ("events.user_id", e["user_id"])]:
        vc = col.value_counts()
        n, ndv = int(vc.sum()), len(vc)
        true = int((vc ** 2).sum())
        est = n * n // ndv
        q = 10**6 * (est - true)
        err = (abs(q) // true) * (1 if q >= 0 else -1)  # toward zero
        exp[name] = (n, ndv, est, true, err)
    got = {r["join_key"]: (r["n_rows"], r["ndv"], r["est_size"],
                           r["true_size"], r["err_ppm"])
           for r in em.q_join_size_audit(spark, SF).collect()}
    assert got == exp
    # Cauchy–Schwarz: Σn² ≥ N²/ndv ⇒ the estimate UNDERSHOOTS skewed
    # self-joins (err ≤ 0, strict where the key is skewed)
    for n, ndv, est, true, err in got.values():
        assert est <= true and err <= 0
