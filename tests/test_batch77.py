"""Batch-77 units: independence selectivity audit (pandas brute + the
audit must find real correlation or real independence) and the rsync
block delta (python brute + the ≥ n_blocks−1 insertion bound)."""
import hashlib

import numpy as np
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def test_selectivity_audit_vs_brute(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["lang", "source"])
    n = len(d)
    la = d["lang"].value_counts().to_dict()
    so = d["source"].value_counts().to_dict()
    joint = d.groupby(["lang", "source"]).size().to_dict()
    exp = {}
    for lng, na in la.items():
        for src, nb in so.items():
            nj = joint.get((lng, src), 0)
            est = 10**6 * na * nb // (n * n)
            act = 10**6 * nj // n
            exp[(lng, src)] = (est, act, est - act)
    got = {(r["lang"], r["source"]): (r["est_ppm"], r["act_ppm"],
                                      r["err_ppm"])
           for r in em.q_selectivity_audit(spark, SF).collect()}
    assert got == exp
    assert len(got) == len(la) * len(so)
    # marginals must be consistent: act_ppm sums to ~1e6 over the grid
    tot = sum(a for _, a, _ in got.values())
    assert abs(tot - 10**6) <= len(got)  # floor-division slack


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _brute_rsync(text, doc_id, b):
    tk = text.split(" ")
    na = len(tk)
    if na < b:
        return None
    p = _h60(f"ins:{doc_id}") % (na + 1)
    bt = tk[:p] + ["zz1", "zz2", "zz3"] + tk[p:]
    nblocks = na // b
    ah = [_h60(" ".join(tk[k * b:(k + 1) * b])) for k in range(nblocks)]
    whs = {_h60(" ".join(bt[i:i + b]))
           for i in range(len(bt) - b + 1)}
    matched = sum(h in whs for h in ah)
    return (nblocks, matched, len(bt) - matched * b)


def test_rsync_delta_vs_brute(spark):
    docs = em._docs(spark, SF).select("doc_id", "text").toPandas()
    exp = {}
    for r in docs.itertuples():
        v = _brute_rsync(r.text, int(r.doc_id), em.RSYNC_BLOCK)
        if v is not None:
            exp[int(r.doc_id)] = v
    got = {r["doc_id"]: (r["n_blocks"], r["n_matched"],
                         r["literal_tokens"])
           for r in em.q_rsync_delta(spark, SF).collect()}
    assert got == exp
    # a 3-token insertion breaks at most ONE block (hash collisions
    # aside): n_matched ≥ n_blocks − 1, with equality somewhere (the
    # insertion does land inside a block for many docs) and full match
    # somewhere (insertion in the unmatchable tail or at a boundary)
    assert all(m >= nb - 1 for nb, m, _ in got.values())
    assert any(m == nb - 1 for nb, m, _ in got.values())
    assert any(m == nb for nb, m, _ in got.values())
    # delta transfer is the win: literals are far below full size
    tot_lit = sum(l for _, _, l in got.values())
    tot_b = sum(nb * em.RSYNC_BLOCK + 3 for nb, _, _ in got.values())
    assert tot_lit < 0.5 * tot_b
