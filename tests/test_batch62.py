"""Batch-62 units: MMR diversified top-k greedy chain (vs a pure-python
exact greedy over brute shingle sets) and per-language TF-IDF
characteristic terms (vs a pandas brute)."""
import numpy as np
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _sh3(text: str) -> frozenset:
    t = text.split(" ")
    return frozenset("\x1f".join(t[i:i + 3])
                     for i in range(max(len(t) - 2, 1)))


def brute_mmr(shs: dict, k: int, lam: int):
    sel = []
    chosen = set()
    for r in range(k):
        best = None
        for d in sorted(shs):
            if d in chosen:
                continue
            rel = len(shs[d])
            maxsim = 0
            for s, _ in sel:
                inter = len(shs[d] & shs[s])
                union = rel + len(shs[s]) - inter
                maxsim = max(maxsim, 10**6 * inter // union)
            score = 10**6 * rel - lam * maxsim
            key = (-score, d)
            if best is None or key < best[0]:
                best = (key, d, rel, maxsim, score)
        sel.append((best[1], (r + 1, best[1], best[2], best[3], best[4])))
        chosen.add(best[1])
    return [row for _, row in sel]


def test_mmr_topk_vs_brute(spark):
    docs = em._docs(spark, SF).select("doc_id", "text").toPandas()
    shs = {int(r.doc_id): _sh3(r.text) for r in docs.itertuples()}
    exp = brute_mmr(shs, em.MMR_K, em.MMR_LAM)
    got = [(r["rank"], r["doc_id"], r["rel"], r["maxsim_ppm"], r["score"])
           for r in em.q_mmr_topk(spark, SF)
           .orderBy("rank").collect()]
    assert got == exp
    # the similarity machinery must be EXERCISED on the fixture: after
    # pick 1, at least one candidate overlaps a selected doc (the picked
    # winners themselves can legitimately be orthogonal)
    chosen = {exp[0][1]}
    touched = any(shs[d] & shs[s]
                  for s in chosen for d in shs if d not in chosen)
    assert touched


def test_mmr_select_diversity_flips_pick(spark):
    from geobuf_spark.operators import similarity
    # planted corpus: docs 1,2 are near-identical (2 trails by one
    # shingle), doc 3 is shorter but disjoint. Pure relevance picks
    # (1, 2); MMR must demote 2 below 3 on the similarity penalty.
    d1 = " ".join(f"w{i}" for i in range(30))
    d2 = " ".join(f"w{i}" for i in range(29)) + " zz"
    d3 = " ".join(f"v{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], ["doc_id", "text"])
    got = similarity.mmr_select(df, key="doc_id", k=2, lam=200)
    assert [g[1] for g in got] == [1, 3]
    assert got[1][3] == 0  # doc 3 is disjoint from doc 1
    # and with the penalty off, pure relevance keeps the near-dup
    got0 = similarity.mmr_select(df, key="doc_id", k=2, lam=0)
    assert [g[1] for g in got0] == [1, 2]
    assert got0[1][3] > 900_000  # its similarity was seen, just unpriced


def test_tfidf_top_terms_vs_brute(spark):
    docs = em._docs(spark, SF).select("lang", "text").toPandas()
    tf = {}
    for r in docs.itertuples():
        toks = r.text.split(" ")
        for i in range(max(len(toks) - 2, 1)):
            t = "\x1f".join(toks[i:i + 3])
            tf[(r.lang, t)] = tf.get((r.lang, t), 0) + 1
    langs = sorted({l for l, _ in tf})
    nl = len(langs)
    df_ = {}
    for (l, t) in tf:
        df_.setdefault(t, set()).add(l)
    rows = []
    for lng in langs:
        scored = sorted(
            ((-(10**6 * c * nl // len(df_[t])), t, c) for (l, t), c
             in tf.items() if l == lng))
        for i, (negs, t, c) in enumerate(scored[:3]):
            rows.append((lng, t, c, len(df_[t]), i + 1, -negs))
    got = [(r["lang"], r["term"], r["tf"], r["df"], r["rank"], r["score"])
           for r in em.q_tfidf_top_terms(spark, SF)
           .orderBy("lang", "rank").collect()]
    assert got == rows
    assert len(got) == 3 * nl
    # the idf side must matter somewhere: at least one winning term is
    # NOT corpus-universal (df < nl) — i.e. the ranking isn't raw tf
    assert any(d < nl for _, _, _, d, _, _ in got)
