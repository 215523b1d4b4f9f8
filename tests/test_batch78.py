"""Batch-78 units: effective corpus size after near-dup collapse (brute
via exact Jaccard + union-find) and the Zipf rank-frequency fit (python
brute with the same bit-length log2)."""
import numpy as np
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _sh3(text):
    t = text.split(" ")
    return frozenset("\x1f".join(t[i:i + 3])
                     for i in range(max(len(t) - 2, 1)))


def test_effective_tokens_vs_brute(spark):
    docs = em._docs(spark, SF).select("doc_id", "text").toPandas()
    shs = {int(r.doc_id): _sh3(r.text) for r in docs.itertuples()}
    toks = {int(r.doc_id): len(r.text.split(" "))
            for r in docs.itertuples()}
    ids = sorted(shs)
    parent = {d: d for d in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_pairs = 0
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            inter = len(shs[a] & shs[b])
            union = len(shs[a]) + len(shs[b]) - inter
            if union and inter / union >= 0.4:
                n_pairs += 1
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    dup_docs = [d for d in ids if find(d) != d]
    tokens_total = sum(toks.values())
    dropped = sum(toks[d] for d in dup_docs)
    r = em.q_effective_tokens(spark, SF).collect()
    assert len(r) == 1
    got = (r[0]["n_docs"], r[0]["n_dup_docs"], r[0]["tokens_total"],
           r[0]["tokens_effective"], r[0]["savings_ppm"])
    assert got == (len(ids), len(dup_docs), tokens_total,
                   tokens_total - dropped,
                   10**6 * dropped // tokens_total)
    assert n_pairs > 0 and 0 < got[4] < 500_000


def test_zipf_fit_vs_brute(spark):
    docs = em._docs(spark, SF).select("text").toPandas()["text"]
    cnt = {}
    for t in docs:
        for w in t.split(" "):
            cnt[w] = cnt.get(w, 0) + 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [((r + 1).bit_length() - 1, f.bit_length() - 1)
           for r, (_, f) in enumerate(ranked)]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    num, den = n * sxy - sx * sy, n * sxx - sx * sx
    trunc = abs(10**6 * num) // den * (1 if num >= 0 else -1)
    r = em.q_zipf_fit(spark, SF).collect()
    assert len(r) == 1
    got = (r[0]["n_terms"], r[0]["slope_num"], r[0]["slope_den"],
           r[0]["slope_ppm"])
    assert got == (n, num, den, trunc)
    # the shared 31-token vocabulary is roughly uniform in draw, so the
    # slope must sit FAR from the Zipfian −1e6 — the gate reads "not a
    # natural-language rank curve" on this corpus, which is the point
    assert got[3] > -700_000
