"""Batch-71 units: maximal matching (validity + maximality + partition
invariance, fixture where greedy order matters) and topic segmentation
(python brute)."""
import hashlib

import pandas as pd

import __spark_entry__ as em
from geobuf_spark.operators import graph

SF = "/root/testdata/sf0.001"


def test_maximal_matching_valid_and_maximal(spark):
    ed = em._host_edges(spark).select("src_host", "dst_host")
    und = {tuple(sorted((r[0], r[1]))) for r in ed.collect()
           if r[0] != r[1]}
    m = [(r["u"], r["v"]) for r in em.q_maximal_matching(spark, SF)
         .collect()]
    # valid: edges exist, no vertex matched twice
    seen = set()
    for u, v in m:
        assert (u, v) in und
        assert u not in seen and v not in seen
        seen.update((u, v))
    # maximal: every graph edge touches a matched vertex
    for u, v in und:
        assert u in seen or v in seen
    assert len(m) > 0


def test_maximal_matching_partition_invariant(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")],
        ["src", "dst"])
    a = sorted(map(tuple, graph.maximal_matching(df, rounds=4).collect()))
    b = sorted(map(tuple, graph.maximal_matching(df.repartition(5),
                                                 rounds=4).collect()))
    assert a == b
    # on the 4-cycle + chord, the result is a valid maximal matching
    seen = [x for e in a for x in e]
    assert len(seen) == len(set(seen))


def test_maximal_matching_path_graph(spark):
    # path a-b-c-d-e: any maximal matching has exactly 2 edges
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["src", "dst"])
    m = graph.maximal_matching(df, rounds=4).collect()
    assert len(m) == 2
    seen = [x for r in m for x in (r["u"], r["v"])]
    assert len(seen) == len(set(seen))


def brute_segments(text: str, b: int, tau: int):
    tk = text.split(" ")
    nb = -(-len(tk) // b)
    blocks = [sorted(set(tk[k * b:(k + 1) * b])) for k in range(nb)]
    sims = []
    for x in range(nb - 1):
        a, c = set(blocks[x]), set(blocks[x + 1])
        sims.append(10**6 * len(a & c) // len(a | c))
    cuts = sum(s < tau for s in sims)
    return nb, cuts + 1, (min(sims) if sims else -1)


def test_text_segments_vs_brute(spark):
    docs = em._docs(spark, SF).select("doc_id", "text").toPandas()
    exp = {int(r.doc_id): brute_segments(r.text, em.TSEG_BLOCK,
                                         em.TSEG_TAU)
           for r in docs.itertuples()}
    got = {r["doc_id"]: (r["n_blocks"], r["n_segments"], r["min_sim_ppm"])
           for r in em.q_text_segments(spark, SF).collect()}
    assert got == exp
    # τ must actually split the corpus: some docs cut, some uncut
    segs = [v[1] for v in got.values()]
    assert any(s > 1 for s in segs)
    assert any(s == 1 for s in segs)
