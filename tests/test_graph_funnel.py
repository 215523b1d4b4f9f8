"""Batch-11 operators: triangle census, KMV set algebra, funnel attribution."""

import datetime
import itertools

from pyspark.sql import functions as F

from geobuf_spark.operators import graph, sketch


def _brute_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    adj = {n: set() for n in nodes}
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    tri = sum(1 for a, b, c in itertools.combinations(nodes, 3)
              if b in adj[a] and c in adj[a] and c in adj[b])
    wedges = sum(len(adj[n]) * (len(adj[n]) - 1) // 2 for n in nodes)
    return len(nodes), len(und), wedges, tri


def test_triangle_stats_k4(spark):
    # complete graph on 4 nodes: C(4,3)=4 triangles, 12 wedges, cc=1
    edges = [(a, b) for a, b in itertools.combinations("abcd", 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    r = graph.triangle_stats(df).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) \
        == (4, 6, 12, 4)
    assert r["global_cc_x10k"] == 10000


def test_triangle_stats_vs_brute_random(spark):
    # deterministic pseudo-random multigraph with self-loops + duplicate
    # and reversed edges — the canonicalization must collapse them all
    edges = []
    for i in range(400):
        u = f"n{(i * 7919) % 23}"
        v = f"n{(i * i * 31 + 5) % 23}"
        edges.append((u, v))
        if i % 3 == 0:
            edges.append((v, u))  # reversed duplicate
    df = spark.createDataFrame(edges, ["src", "dst"])
    r = graph.triangle_stats(df).collect()[0]
    n, m, w, t = _brute_triangles(edges)
    assert (r["n_nodes"], r["n_edges"], r["n_wedges"], r["n_triangles"]) \
        == (n, m, w, t)


def test_kmv_set_ops_exact_when_under_k(spark):
    # every sketch holds its full set -> all estimates collapse to exact
    a = spark.createDataFrame([(f"x{i}",) for i in range(30)], ["v"])
    b = spark.createDataFrame([(f"x{i}",) for i in range(20, 50)], ["v"])
    r = sketch.kmv_set_ops(a, b, "v", k=64).collect()[0]
    assert (r["a_est"], r["b_est"]) == (30, 30)
    assert r["union_est"] == 50
    assert r["n_common"] == 10
    assert r["inter_est"] == 10
    assert r["jaccard_x10k"] == 10 * 10000 // 50


def test_kmv_set_ops_estimates_in_range(spark):
    # 600 vs 600 values with 200 shared; k=64 estimates should land within
    # a loose 35% of truth (deterministic hash -> deterministic estimate)
    a = spark.createDataFrame([(f"a{i}",) for i in range(400)]
                              + [(f"s{i}",) for i in range(200)], ["v"])
    b = spark.createDataFrame([(f"b{i}",) for i in range(400)]
                              + [(f"s{i}",) for i in range(200)], ["v"])
    r = sketch.kmv_set_ops(a, b, "v", k=64).collect()[0]
    assert 0.65 * 1000 < r["union_est"] < 1.35 * 1000
    assert 0.5 * 200 < r["inter_est"] < 1.5 * 200


def test_funnel_conversion_stages(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    rows = [
        # user 1: full funnel in order
        (1, ts(0), 1, "view", 0.0, ""), (2, ts(1), 1, "click", 0.0, ""),
        (3, ts(2), 1, "purchase", 0.0, ""),
        # user 2: purchase BEFORE click -> stage stops at click
        (4, ts(0), 2, "view", 0.0, ""), (5, ts(2), 2, "click", 0.0, ""),
        (6, ts(1), 2, "purchase", 0.0, ""),
        # user 3: click before any view -> stage 1 only
        (7, ts(0), 3, "click", 0.0, ""), (8, ts(1), 3, "view", 0.0, ""),
        # user 4: no view at all -> stage 0
        (9, ts(0), 4, "click", 0.0, ""), (10, ts(1), 4, "purchase", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"])
    p = str(tmp_path / "events.parquet")
    df.write.parquet(p)

    import __spark_entry__ as em
    out = {r["user_id"]: r for r in
           em.q_funnel_conversion(spark, str(tmp_path)).collect()}
    assert out[1]["funnel_stage"] == 3
    assert out[2]["funnel_stage"] == 2 and out[2]["purchase_ep"] == -1
    assert out[3]["funnel_stage"] == 1 and out[3]["click_ep"] == -1
    assert out[4]["funnel_stage"] == 0 and out[4]["view_ep"] == -1
    # epochs are the actual event times
    assert out[1]["purchase_ep"] == int(ts(2).timestamp())
