"""Batch-56 units: rank-biased overlap and longest duplicated-span run —
verified against independent python brute force."""
import hashlib

import numpy as np
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def test_rbo_matches_python(spark):
    p = em.pages.pages(spark, 2000).toPandas()
    p["host"] = p["url"].str.extract(r"https://([^/]+)/")
    p["nb"] = p["text"].str.len()
    h = p.groupby("host").agg(n_pages=("url", "size"),
                              total_bytes=("nb", "sum")).reset_index()
    a = (h.sort_values(["n_pages", "host"],
                       ascending=[False, True])["host"]
         .head(em.RBO_DEPTH).tolist())
    b = (h.sort_values(["total_bytes", "host"],
                       ascending=[False, True])["host"]
         .head(em.RBO_DEPTH).tolist())
    got = {r["d"]: r for r in em.q_rbo_rankings(spark, SF).collect()}
    for d in range(1, em.RBO_DEPTH + 1):
        ov = len(set(a[:d]) & set(b[:d]))
        assert got[d]["ov"] == ov
        assert got[d]["term_ppm"] == (10**6 * ov) // (d * (1 << d))
    # overlap is monotone and the rankings genuinely differ somewhere
    ovs = [got[d]["ov"] for d in range(1, em.RBO_DEPTH + 1)]
    assert ovs == sorted(ovs)
    assert any(got[d]["ov"] < d for d in range(1, em.RBO_DEPTH + 1))


def test_dup_span_maxrun_matches_python(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    grams = {}   # doc -> list of gram strings in positional order
    for r in docs.itertuples():
        w = r.text.split(" ")
        grams[r.doc_id] = [" ".join(w[i:i + 8])
                           for i in range(len(w) - 7)] \
            if len(w) >= 8 else []
    docs_per_gram = {}
    for d, gs in grams.items():
        for g in set(gs):
            docs_per_gram[g] = docs_per_gram.get(g, 0) + 1
    got = {r["doc_id"]: r
           for r in em.q_dup_span_maxrun(spark, SF).collect()}
    some_run = False
    for d, gs in grams.items():
        if not gs:
            assert d not in got
            continue
        flags = [docs_per_gram[g] >= 2 for g in gs]
        best = run = 0
        for f in flags:
            run = run + 1 if f else 0
            best = max(best, run)
        assert got[d]["n_grams"] == len(gs)
        assert got[d]["max_dup_run"] == best
        some_run |= best > 1
    assert some_run  # fixture contains a real contiguous lifted block
