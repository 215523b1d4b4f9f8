"""Batch-14 operators: SCD-2 history, ring validity predicates, int8
vector quantization."""

import math

from pyspark.sql import functions as F

from geobuf_spark.functions import geom

SF = "/root/testdata/sf0.001"


def test_scd2_history_interval_properties(spark):
    import __spark_entry__ as em

    rows = em.q_scd2_history(spark, SF).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    t0 = em.SCD2_T0
    p = {r["url"]: r["page_id"] for r in
         __import__("geobuf_spark.sources.pages", fromlist=["pages"])
         .pages(spark, 2000).select("page_id", "url").collect()}
    assert set(by_url) == set(p)
    for url, vs in by_url.items():
        vs.sort(key=lambda r: r["valid_from"])
        pid = p[url]
        expect_versions = 1 + (pid % 5 == 0) + (pid % 3 == 0)
        assert len(vs) == expect_versions, (url, pid)
        # versions number 1..n, intervals chain, exactly one current
        assert [v["version"] for v in vs] == list(range(1, len(vs) + 1))
        assert sum(v["is_current"] for v in vs) == 1
        assert vs[-1]["is_current"] == 1 and vs[-1]["valid_to"] == -1
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] == b["valid_from"] - 1
        assert vs[0]["valid_from"] == t0
        # distinct content hashes (consecutive dedupe worked)
        hs = [v["content_md5"] for v in vs]
        assert len(set(hs)) == len(hs)


def _ring_df(spark, rings):
    rows = [(i, [p[0] for p in r], [p[1] for p in r])
            for i, r in enumerate(rings)]
    return spark.createDataFrame(rows, ["doc_id", "xs_q", "ys_q"])


def test_ring_validity_handcrafted(spark):
    square = [(0, 0), (10, 0), (10, 10), (0, 10)]            # CCW convex
    square_cw = list(reversed(square))                        # CW convex
    bowtie = [(0, 0), (10, 10), (10, 0), (0, 10)]             # 1 crossing
    lshape = [(0, 0), (20, 0), (20, 10), (10, 10), (10, 20), (0, 20)]
    df = _ring_df(spark, [square, square_cw, bowtie, lshape])
    out = {r["doc_id"]: r for r in
           geom.ring_validity_cols(df, k=4).filter(F.col("doc_id") < 3)
           .collect()}
    assert out[0]["area2"] == 200 and out[0]["is_ccw"] == 1
    assert out[0]["is_convex"] == 1 and out[0]["n_self_x"] == 0
    assert out[1]["area2"] == -200 and out[1]["is_ccw"] == 0
    assert out[1]["is_convex"] == 1 and out[1]["n_self_x"] == 0
    assert out[2]["n_self_x"] == 1 and out[2]["is_convex"] == 0
    out6 = {r["doc_id"]: r for r in
            geom.ring_validity_cols(df.filter(F.col("doc_id") == 3), k=6)
            .collect()}
    assert out6[3]["area2"] == 2 * 300 and out6[3]["is_ccw"] == 1
    assert out6[3]["is_convex"] == 0 and out6[3]["n_self_x"] == 0


def _brute_validity(xs, ys):
    k = len(xs)
    mx, my = min(xs), min(ys)
    X = [x - mx for x in xs]
    Y = [y - my for y in ys]

    def cr(a, b, c):
        return (X[b] - X[a]) * (Y[c] - Y[a]) - (Y[b] - Y[a]) * (X[c] - X[a])

    area2 = sum(X[i] * Y[(i + 1) % k] - X[(i + 1) % k] * Y[i]
                for i in range(k))
    crosses = [cr(i, (i + 1) % k, (i + 2) % k) for i in range(k)]
    convex = all(c >= 0 for c in crosses) or all(c <= 0 for c in crosses)

    def opp(a, b):
        return (a > 0 and b < 0) or (a < 0 and b > 0)

    n = 0
    for p1, p2, q1, q2 in geom.ring_pair_indices(k):
        if opp(cr(p1, p2, q1), cr(p1, p2, q2)) \
                and opp(cr(q1, q2, p1), cr(q1, q2, p2)):
            n += 1
    return area2, int(area2 > 0), int(convex), n


def test_ring_validity_vs_brute_on_fixture(spark):
    import __spark_entry__ as em

    out = {r["doc_id"]: r for r in em.q_geom_validity(spark, SF).collect()}
    from geobuf_spark.sources import minted
    wl = minted.minted_walk_lines_q(spark, SF, k=9).collect()
    assert len(wl) == len(out)
    n_nonconvex = 0
    for r in wl:
        a2, ccw, cvx, nx = _brute_validity(r["xs_q"], r["ys_q"])
        o = out[r["doc_id"]]
        assert (o["area2"], o["is_ccw"], o["is_convex"], o["n_self_x"]) \
            == (a2, ccw, cvx, nx), r["doc_id"]
        n_nonconvex += 1 - cvx
    # random walks must actually exercise the non-trivial branches
    assert n_nonconvex > 0
    assert any(out[d]["n_self_x"] > 0 for d in out)


def test_embed_quantize_vs_brute(spark):
    import __spark_entry__ as em

    out = {r["vec_id"]: r for r in em.q_embed_quantize(spark, SF).collect()}
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50).collect()
    for r in emb:
        v = [float(x) for x in r["embedding"]]
        maxabs = max(abs(x) for x in v)
        q = [math.floor(x * 127.0 / maxabs) for x in v]
        o = out[r["vec_id"]]
        assert o["maxabs"] == maxabs
        assert o["q_sum"] == sum(q)
        assert o["q_min"] == min(q) and o["q_max"] == max(q)
        assert -127 <= o["q_min"] and o["q_max"] <= 127
