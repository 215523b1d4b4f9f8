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
