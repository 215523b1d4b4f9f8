"""Batch-79 units: Haar multiresolution energy (python brute + Parseval
bookkeeping) and the negative-sample audit (python brute over the same
hash draws + the clean-rate property)."""
import hashlib

import numpy as np
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def test_haar_energy_vs_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    day = ev["ts"].astype("datetime64[s]").astype(np.int64) // 86400
    cnt = day.value_counts()
    d0 = int(day.min())
    x = [int(cnt.get(d0 + i, 0)) for i in range(em.HAAR_N)]
    exp = []
    lvl = 1
    while len(x) > 1:
        det = [x[2 * j] - x[2 * j + 1] for j in range(len(x) // 2)]
        app = [x[2 * j] + x[2 * j + 1] for j in range(len(x) // 2)]
        exp.append((lvl, len(det), sum(d * d for d in det)))
        x = app
        lvl += 1
        if lvl > 5:
            break
    got = [(r["level"], r["n_coeffs"], r["energy"])
           for r in em.q_haar_energy(spark, SF).orderBy("level").collect()]
    assert got == exp
    # unnormalized-Haar Parseval: 2^l · Σx² = Σ_level≤l 2^(l−level)·E_l
    # + Σapp². Check at full depth with the final approx (total sum).
    x0 = [int(cnt.get(d0 + i, 0)) for i in range(em.HAAR_N)]
    total = sum(v * v for v in x0)
    s = sum(x0) ** 2  # final approx coefficient (level-5 single sum)
    acc = s
    for lvl_, n_, e_ in got:
        acc += (1 << (5 - lvl_)) * e_
    assert acc == (1 << 5) * total
    # the fixture has real daily structure: some level carries energy
    assert any(e > 0 for _, _, e in got)


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_negative_samples_vs_brute(spark):
    ed = {(r[0], r[1]) for r in em._host_edges(spark).collect()
          if True}
    pe = sorted(set(ed))
    hosts = sorted({h for e in pe for h in e})
    nh = len(hosts)
    n_cand = n_self = n_hit = 0
    sep = "\x1e"
    for (s, d) in pe:
        for k in range(em.NEG_K):
            idx = _h60(f"neg{sep}{s}{sep}{d}{sep}{k}") % nh
            cand = hosts[idx]
            n_cand += 1
            n_self += cand == s
            n_hit += (s, cand) in pe
    rows = em.q_negative_samples(spark, SF).collect()
    assert len(rows) == 1
    got = (rows[0]["n_pos"], rows[0]["n_cand"], rows[0]["n_self"],
           rows[0]["n_hit"], rows[0]["clean_ppm"])
    exp = (len(pe), n_cand, n_self, n_hit,
           10**6 * (n_cand - n_self - n_hit) // n_cand)
    assert got == exp
    # the audit must catch SOME pollution (hash draws do land on real
    # edges/selves occasionally) while most candidates stay clean
    assert got[3] + got[2] > 0
    assert got[4] > 900_000
