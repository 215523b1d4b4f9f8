"""Host-graph PageRank: integer fixed-point semantics vs a brute-force
reference, DuckDB twin equality, and scale-invariance of the arithmetic."""

import duckdb
import pytest

from geobuf_spark.operators import graph

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "c"),            # multi-edge counts twice
    ("e", "a"),                        # e is dangling-source only? no: e->a
    ("b", "f"),                        # f has no out-links (dangling sink)
]


def brute_pagerank_int(edges, iters=3, damping=850_000, scale=1_000_000):
    nodes = sorted({u for e in edges for u in e})
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    r = {n: scale for n in nodes}
    for _ in range(iters):
        agg = {n: 0 for n in nodes}
        for s, d in edges:
            agg[d] += r[s] // out_deg[s]
        r = {n: (scale - damping) + damping * agg[n] // scale for n in nodes}
    return r


def test_pagerank_int_vs_brute(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["host"]: r["rank_ppm"]
           for r in graph.pagerank_int(df, iters=3).collect()}
    assert got == brute_pagerank_int(EDGES, 3)
    # rank mass: every node present, dangling sink keeps base rank floor
    assert set(got) == {"a", "b", "c", "d", "e", "f"}
    assert got["e"] == 150_000          # nothing links to e
    assert got["c"] > got["a"] > got["e"]


def test_pagerank_sql_twin_matches(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["host"]: r["rank_ppm"]
           for r in graph.pagerank_int(df, iters=4).collect()}
    vals = ", ".join(f"('{s}', '{d}')" for s, d in EDGES)
    sql = graph.sql_pagerank_int(
        f"edges AS (SELECT * FROM (VALUES {vals}) v(src, dst))", iters=4)
    con = duckdb.connect()
    oracle = dict(con.sql(sql).fetchall())
    assert got == oracle


def test_pagerank_partition_invariance(spark):
    # integer arithmetic must make the result independent of partitioning
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    a = {r["host"]: r["rank_ppm"]
         for r in graph.pagerank_int(df.repartition(1), 2).collect()}
    b = {r["host"]: r["rank_ppm"]
         for r in graph.pagerank_int(df.repartition(16), 2).collect()}
    assert a == b


def brute_hits_int(edges, iters=2, scale=1_000_000):
    nodes = sorted({u for e in edges for u in e})
    hub = {n: scale for n in nodes}
    auth = {n: 0 for n in nodes}
    for _ in range(iters):
        raw = {n: 0 for n in nodes}
        for s, d in edges:
            raw[d] += hub[s]
        mx = max(max(raw.values()), 1)
        auth = {n: raw[n] * scale // mx for n in nodes}
        raw = {n: 0 for n in nodes}
        for s, d in edges:
            raw[s] += auth[d]
        mx = max(max(raw.values()), 1)
        hub = {n: raw[n] * scale // mx for n in nodes}
    return {n: (hub[n], auth[n]) for n in nodes}


def test_hits_int_vs_brute(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["host"]: (r["hub_ppm"], r["auth_ppm"])
           for r in graph.hits_int(df, iters=2).collect()}
    assert got == brute_hits_int(EDGES, 2)
    # c is the most-linked node: top authority, normalized to SCALE
    assert got["c"][1] == graph.SCALE
    # f never links out: zero hub score
    assert got["f"][0] == 0


def test_hits_sql_twin_matches(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["host"]: (r["hub_ppm"], r["auth_ppm"])
           for r in graph.hits_int(df, iters=3).collect()}
    vals = ", ".join(f"('{s}', '{d}')" for s, d in EDGES)
    sql = graph.sql_hits_int(
        f"edges AS (SELECT * FROM (VALUES {vals}) v(src, dst))", iters=3)
    con = duckdb.connect()
    oracle = {h: (hub, auth) for h, hub, auth in con.sql(sql).fetchall()}
    assert got == oracle


def test_hits_partition_invariance(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    a = {r["host"]: (r["hub_ppm"], r["auth_ppm"])
         for r in graph.hits_int(df.repartition(1), 2).collect()}
    b = {r["host"]: (r["hub_ppm"], r["auth_ppm"])
         for r in graph.hits_int(df.repartition(16), 2).collect()}
    assert a == b


def test_pagerank_empty_and_self_loop(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    assert graph.pagerank_int(empty, 3).count() == 0
    loop = spark.createDataFrame([("x", "x")], ["src", "dst"])
    got = graph.pagerank_int(loop, 3).collect()
    assert len(got) == 1 and got[0]["rank_ppm"] == brute_pagerank_int(
        [("x", "x")], 3)["x"]


# ---------------------------------------------------------------------------
# batch 19: local clustering / resource allocation / BFS
# ---------------------------------------------------------------------------

# K4 on a-b-c-d (every pair linked) + pendant e-a + disjoint edge f-g:
# all K4 nodes have cc = 1 except a (degree 4 with one open pendant wedge).
CLUST_EDGES = [
    ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
    ("e", "a"), ("f", "g"),
    ("b", "a"),  # reverse duplicate must not double-count
]


def test_local_clustering_vs_known(spark):
    df = spark.createDataFrame(CLUST_EDGES, ["src", "dst"])
    got = {r["host"]: (r["degree"], r["n_tri"], r["cc_ppm"])
           for r in graph.local_clustering(df).collect()}
    # e, f, g have degree < 2 → excluded
    assert set(got) == {"a", "b", "c", "d"}
    # a: degree 4 (b,c,d,e), triangles 3 (bcd pairs), cc = 6/12 = 0.5
    assert got["a"] == (4, 3, 500_000)
    # b, c, d: degree 3 inside K4, all 3 wedges closed
    for n in ("b", "c", "d"):
        assert got[n] == (3, 3, 1_000_000)


def test_local_clustering_sql_twin(spark):
    df = spark.createDataFrame(CLUST_EDGES, ["src", "dst"])
    got = {r["host"]: (r["degree"], r["n_tri"], r["cc_ppm"])
           for r in graph.local_clustering(df).collect()}
    vals = ", ".join(f"('{s}', '{d}')" for s, d in CLUST_EDGES)
    sql = graph.sql_local_clustering(
        f"ed AS (SELECT * FROM (VALUES {vals}) v(src, dst))")
    oracle = {h: (d, t, c) for h, d, t, c in duckdb.sql(sql).fetchall()}
    assert got == oracle


def test_resource_allocation_vs_brute(spark):
    df = spark.createDataFrame(CLUST_EDGES, ["src", "dst"])
    got = {(r["host_a"], r["host_b"]): (r["n_common"], r["ra_fp"])
           for r in graph.resource_allocation(df, min_common=1).collect()}
    # brute: undirected simple graph
    und = {tuple(sorted(e)) for e in CLUST_EDGES if e[0] != e[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    exp = {}
    for a in adj:
        for b in adj:
            if a < b and b not in adj[a]:
                common = adj[a] & adj[b]
                if common:
                    exp[(a, b)] = (
                        len(common),
                        sum(graph.RA_SCALE // len(adj[z]) for z in common))
    assert got == exp
    # e-b: common neighbor a (deg 4) → 1/4 mass, and NOT adjacent
    assert got[("b", "e")] == (1, graph.RA_SCALE // 4)


def test_resource_allocation_sql_twin(spark):
    df = spark.createDataFrame(CLUST_EDGES, ["src", "dst"])
    got = {(r["host_a"], r["host_b"]): (r["n_common"], r["ra_fp"])
           for r in graph.resource_allocation(df, min_common=2).collect()}
    vals = ", ".join(f"('{s}', '{d}')" for s, d in CLUST_EDGES)
    sql = graph.sql_resource_allocation(
        f"ed AS (SELECT * FROM (VALUES {vals}) v(src, dst))", min_common=2)
    oracle = {(a, b): (n, fp) for a, b, n, fp in duckdb.sql(sql).fetchall()}
    assert got == oracle
    # existing edges never appear
    assert ("a", "b") not in got


# path graph s-x1-x2-x3-x4 plus seed t adjacent to x3: min-hop semantics
BFS_EDGES = [("s", "x1"), ("x1", "x2"), ("x2", "x3"), ("x3", "x4"),
             ("t", "x3"), ("far1", "far2")]


def test_bfs_hops_min_semantics(spark):
    df = spark.createDataFrame(BFS_EDGES, ["src", "dst"])
    seeds = spark.createDataFrame([("s",), ("t",)], ["host"])
    got = {r["host"]: r["hop"]
           for r in graph.bfs_hops(df, seeds, max_hops=3).collect()}
    # x3 is 3 hops from s but 1 from t → min wins; x4 settles via t at 2
    assert got == {"s": 0, "t": 0, "x1": 1, "x2": 2, "x3": 1, "x4": 2}
    # far1/far2 unreachable → absent


def test_bfs_hops_sql_twin(spark):
    df = spark.createDataFrame(BFS_EDGES, ["src", "dst"])
    nodes = (df.selectExpr("src AS host").union(df.selectExpr("dst"))
             .distinct())
    seeds = nodes.filter("host IN ('s', 't')")
    got = {r["host"]: r["hop"]
           for r in graph.bfs_hops(df, seeds, max_hops=2).collect()}
    vals = ", ".join(f"('{s}', '{d}')" for s, d in BFS_EDGES)
    sql = graph.sql_bfs_hops(
        f"ed AS (SELECT * FROM (VALUES {vals}) v(src, dst))",
        "n IN ('s', 't')", max_hops=2)
    oracle = dict(duckdb.sql(sql).fetchall())
    assert got == oracle


def test_kcore_reaches_fixpoint_and_is_a_2core(spark):
    """KCORE_ROUNDS fixed peeling rounds must reach the fixpoint on the
    fixture: every surviving node has degree >= 2 (a valid 2-core), and
    one additional peeling round changes nothing."""
    import __spark_entry__ as em

    out = em.q_kcore_hosts(spark, "/root/testdata/sf0.001")
    rows = {r["host"]: r["degree"] for r in out.collect()}
    assert rows, "fixture 2-core should be non-empty"
    assert min(rows.values()) >= em.KCORE_K
    # one more round is a no-op
    old = em.KCORE_ROUNDS
    try:
        em.KCORE_ROUNDS = old + 1
        again = {r["host"]: r["degree"]
                 for r in em.q_kcore_hosts(spark,
                                           "/root/testdata/sf0.001").collect()}
    finally:
        em.KCORE_ROUNDS = old
    assert again == rows
