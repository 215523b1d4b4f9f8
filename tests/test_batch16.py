"""Batch-16 operators: event transitions, link reciprocity, Simpson
diversity, tile anti-join gaps."""

import collections

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_event_transitions_vs_brute(spark):
    import __spark_entry__ as em

    got = {(r["from_type"], r["to_type"]): (r["n"], r["share_ppm"]) for r in
           em.q_event_transitions(spark, SF).collect()}
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .select("user_id", "ts", "event_id", "event_type").collect())
    seqs = {}
    for r in ev:
        seqs.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"]))
    cnt = collections.Counter()
    for s in seqs.values():
        s.sort()
        for a, b in zip(s, s[1:]):
            cnt[(a[2], b[2])] += 1
    outsum = collections.Counter()
    for (f_, _t), n in cnt.items():
        outsum[f_] += n
    brute = {k: (n, n * 1_000_000 // outsum[k[0]]) for k, n in cnt.items()}
    assert got == brute
    # shares per source type sum to ~1e6 (floor loss < n_targets)
    per_from = collections.Counter()
    for (f_, _t), (_n, ppm) in got.items():
        per_from[f_] += ppm
    for f_, s in per_from.items():
        assert 1_000_000 - 5 <= s <= 1_000_000


def test_link_reciprocity_vs_brute(spark):
    import __spark_entry__ as em

    r = em.q_link_reciprocity(spark, SF).collect()[0]
    edges = {(e["src_host"], e["dst_host"]) for e in
             em._page_link_edges(spark, 2000).select(
                 "src_host",
                 F.parse_url(F.col("dst"), F.lit("HOST")).alias("dst_host"))
             .collect() if e["src_host"] != e["dst_host"]}
    recip = sum(1 for (a, b) in edges if (b, a) in edges)
    assert r["n_edges"] == len(edges)
    assert r["n_reciprocal"] == recip
    assert r["reciprocity_ppm"] == recip * 1_000_000 // len(edges)


def test_lang_diversity_simpson_exact(spark):
    import __spark_entry__ as em

    got = {r["source"]: r for r in
           em.q_lang_diversity_simpson(spark, SF).collect()}
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("source", "lang").collect())
    per = collections.Counter((r["source"], r["lang"]) for r in docs)
    bysrc = collections.defaultdict(list)
    for (s, _l), m in per.items():
        bysrc[s].append(m)
    for s, ms in bysrc.items():
        n = sum(ms)
        expect = 1_000_000 - sum(m * m for m in ms) * 1_000_000 // (n * n)
        assert got[s]["n_docs"] == n
        assert got[s]["n_langs"] == len(ms)
        assert got[s]["simpson_ppm"] == expect
        assert 0 <= got[s]["simpson_ppm"] < 1_000_000


def test_tile_gaps_anti_properties(spark):
    import __spark_entry__ as em
    from geobuf_spark.functions import tiles as T
    from geobuf_spark.sources import pages

    gaps = {(r["x"], r["y"]) for r in em.q_tile_gaps_anti(spark, SF).collect()}
    assert gaps  # the drop pattern must leave real holes

    def tset(p):
        return {(r["x"], r["y"]) for r in
                pages.with_minted_geometry(p).select(
                    T.tile_x(F.col("lon"), 7).alias("x"),
                    T.tile_y(F.col("lat"), 7).alias("y")).collect()}

    a = tset(pages.pages(spark, 2000))
    b = tset(pages.pages(spark, 2400).where(
        F.pmod(F.col("page_id"), F.lit(17)) != 3))
    assert gaps == a - b
