"""Batch-87 units: sorted-neighborhood blocking (hashlib/python brute of
the minhash sort key, window pairing, and both metrics) and LZ76 prefix
complexity (clean-room sequential brute + crafted strings with known
factor counts)."""
import hashlib

import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _shingles(text, k=3):
    toks = text.split(" ")
    n = len(toks)
    out = []
    for i in range(max(n - k + 1, 1)):
        out.append("\x1f".join(toks[i:i + k]))
    return set(out)


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_sorted_neighborhood_vs_brute(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    mh = {int(r.doc_id): min(_h60(s) for s in _shingles(r.text))
          for r in d.itertuples()}
    order = sorted(mh, key=lambda i: (mh[i], i))
    cand = set()
    for i in range(len(order)):
        for j in range(i + 1, min(i + em.SN_W, len(order))):
            a, b = order[i], order[j]
            cand.add((min(a, b), max(a, b)))
    # truth: exact 3-shingle Jaccard ≥ 0.4
    sh = {int(r.doc_id): _shingles(r.text) for r in d.itertuples()}
    ids = sorted(sh)
    truth = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sh[a] & sh[b])
            if inter and inter / (len(sh[a]) + len(sh[b]) - inter) >= 0.4:
                truth.add((a, b))
    n = len(ids)
    total = n * (n - 1) // 2
    caught = len(truth & cand)
    exp = (len(truth), len(cand), caught,
           10**6 * caught // len(truth) if truth else 0,
           10**6 * (total - len(cand)) // total)
    r = em.q_sorted_neighborhood(spark, SF).collect()
    assert len(r) == 1
    got = (r[0]["n_true"], r[0]["n_cand"], r[0]["n_caught"],
           r[0]["pc_ppm"], r[0]["rr_ppm"])
    assert got == exp
    assert got[2] <= min(got[0], got[1]) and got[4] > 0


def brute_lz76(s, p):
    """Clean-room LZ76 (find-based, not the engine's loop): factor =
    longest already-seen prefix plus one new char."""
    s = s[:p]
    n = len(s)
    pos, nf = 0, 0
    while pos < n:
        l = 0
        while (pos + l + 1 <= n
               and s[:pos].find(s[pos:pos + l + 1]) >= 0):
            l += 1
        pos += min(l + 1, n - pos)
        nf += 1
    return nf


def test_lz76_crafted():
    assert brute_lz76("aaaaaaaa", 48) == 4   # 'a','a|a','aaa|a','a'
    assert brute_lz76("abcabcabc", 48) == 5  # a,b,c,'abc|a','bc'
    assert brute_lz76("", 48) == 0
    assert brute_lz76("xyz", 48) == 3        # all-new chars
    # truncation: only the first p chars count
    assert brute_lz76("ab" * 100, 4) == brute_lz76("abab", 48)


def test_lz_factors_vs_brute(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    exp = {int(r.doc_id): (min(len(r.text), em.LZ_PREFIX),
                           brute_lz76(r.text, em.LZ_PREFIX))
           for r in d.itertuples()}
    got = {r["doc_id"]: (r["plen"], r["n_factors"])
           for r in em.q_lz_factors(spark, SF).collect()}
    assert got == exp
    ks = {v[1] for v in got.values()}
    assert len(ks) > 3  # complexity actually varies on the fixture
