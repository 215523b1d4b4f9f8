"""Batch-74 units: gap-bounded sequence support (pandas brute) and
quantized-integer Otsu thresholding (brute + float-Otsu cross-check)."""
import numpy as np
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def test_gapped_sequences_vs_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    ev["te"] = ev["ts"].astype("datetime64[s]").astype(np.int64)
    exp = {}
    for uid, g in ev.groupby("user_id"):
        seq = list(g.sort_values(["te", "event_id"])["event_type"])
        for i, a in enumerate(seq):
            for j in range(i + 1, min(i + em.SEQ_GAP, len(seq) - 1) + 1):
                k = (a, seq[j])
                occ, users = exp.get(k, (0, set()))
                users.add(uid)
                exp[k] = (occ + 1, users)
    exp = {k: (len(u), occ) for k, (occ, u) in exp.items()}
    got = {(r["a"], r["b"]): (r["support_users"], r["n_occurrences"])
           for r in em.q_gapped_sequences(spark, SF).collect()}
    assert got == exp
    # the gap bound is load-bearing: occurrences must be strictly fewer
    # than the unbounded ordered-pair count for at least one pair
    tot_unbounded = {}
    for uid, g in ev.groupby("user_id"):
        seq = list(g.sort_values(["te", "event_id"])["event_type"])
        for i, a in enumerate(seq):
            for j in range(i + 1, len(seq)):
                k = (a, seq[j])
                tot_unbounded[k] = tot_unbounded.get(k, 0) + 1
    assert any(got[k][1] < tot_unbounded[k] for k in got)


def test_otsu_threshold_vs_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["value"])
    lv = (np.floor(ev["value"] * 100 + 0.5).astype("int64") // em.OTSU_LEVEL)
    hist = lv.value_counts().sort_index()
    levels = hist.index.to_numpy()
    c = hist.to_numpy()
    sv = levels * c
    n, s = int(c.sum()), int(sv.sum())
    best = None
    for i in range(len(levels)):
        n0 = int(c[:i + 1].sum())
        if n0 >= n:
            continue
        s0 = int(sv[:i + 1].sum())
        ad = abs(s0 * (n - n0) - (s - s0) * n0)
        score = (ad // em.OTSU_Q) ** 2 // (n0 * (n - n0))
        key = (-score, levels[i])
        if best is None or key < best[0]:
            best = (key, (int(levels[i]) * em.OTSU_LEVEL, score, n0,
                          n - n0))
    r = em.q_otsu_threshold(spark, SF).collect()
    assert len(r) == 1
    got = (r[0]["threshold_cents"], r[0]["score"], r[0]["n_low"],
           r[0]["n_high"])
    assert got == best[1]
    # quantization sanity: the picked cut's FLOAT between-class score is
    # within 1% of the float optimum over all cuts
    def fscore(i):
        n0 = c[:i + 1].sum()
        if n0 == 0 or n0 == n:
            return -1.0
        s0 = float(sv[:i + 1].sum())
        return (s0 * (n - n0) - (s - s0) * n0) ** 2 / (n0 * (n - n0))
    fbest = max(fscore(i) for i in range(len(levels)))
    fpick = fscore(int(np.where(levels ==
                                got[0] // em.OTSU_LEVEL)[0][0]))
    assert fpick >= 0.99 * fbest
    # and the split is non-trivial
    assert got[2] > 0 and got[3] > 0
