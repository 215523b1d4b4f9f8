"""Batch-69 units: winnowing fingerprints (python brute + the ≥w+k−1
shared-run detection guarantee on planted docs) and the log-bucketed p99
histogram (brute + the 2^-4 relative-error bound)."""
import hashlib
import math

import numpy as np
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.operators import dedup

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _brute_winnow(text: str, k: int, w: int) -> set:
    tk = text.split(" ")
    grams = [_h60(" ".join(tk[i:i + k]))
             for i in range(max(len(tk) - k + 1, 1))]
    m = len(grams)
    return {min(grams[j:j + w]) for j in range(max(m - w + 1, 1))}


def test_winnow_fps_vs_brute(spark):
    docs = em._docs(spark, SF).select("doc_id", "text").toPandas()
    per = {}
    for r in docs.itertuples():
        for fp in _brute_winnow(r.text, em.WINNOW_K, em.WINNOW_W):
            per.setdefault(fp, set()).add(r.doc_id)
    ranked = sorted(((len(d), fp) for fp, d in per.items()),
                    key=lambda t: (-t[0], t[1]))[:em.WINNOW_TOP]
    exp = [(fp, nd) for nd, fp in ranked]
    got = [(r["fp"], r["n_docs"])
           for r in em.q_winnow_fps(spark, SF).collect()]
    assert got == exp
    assert got[0][1] > 1  # real cross-doc sharing found


def test_winnow_guarantee_and_density(spark):
    k, w = em.WINNOW_K, em.WINNOW_W
    # two docs sharing an embedded run of exactly w+k-1 tokens amid
    # otherwise disjoint text MUST share a fingerprint
    run = " ".join(f"s{i}" for i in range(w + k - 1))
    a = " ".join(f"a{i}" for i in range(40)) + f" {run} " + \
        " ".join(f"b{i}" for i in range(40))
    c = " ".join(f"c{i}" for i in range(40)) + f" {run} " + \
        " ".join(f"d{i}" for i in range(40))
    df = spark.createDataFrame([(1, a), (2, c)], ["doc_id", "text"])
    out = dedup.winnow_fingerprints(df, key="doc_id", k=k, w=w).collect()
    s1 = {r["fp"] for r in out if r["doc_id"] == 1}
    s2 = {r["fp"] for r in out if r["doc_id"] == 2}
    assert s1 & s2
    # and the shared fps are exactly the run's own grams' minima
    assert (s1 & s2) <= _brute_winnow(run, k, w)
    # density: winnowing keeps ~2/(w+1) of positions — far below 1
    n_grams = 40 + 40 + (w + k - 1) - k + 1 + 2 * (k - 1)
    assert len(s1) < 0.7 * n_grams


def test_log_histogram_p99_bound(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["value", "event_id"])
    v = np.floor(ev["value"] * 100 + 0.5).astype("int64").to_numpy()
    n = len(v)
    rank = math.ceil(n * 0.99)
    exact = int(np.sort(v)[rank - 1])
    sb = em.LOGH_SUB_BITS + 1
    lbs = []
    for x in v:
        sh = max(int(x).bit_length() - sb, 0)
        lbs.append((int(x) >> sh) << sh)
    hist = pd.Series(lbs).value_counts().sort_index()
    cum = hist.cumsum()
    est = int(cum[cum >= rank].index[0])
    r = em.q_log_histogram_p99(spark, SF).collect()
    assert len(r) == 1
    row = (r[0]["n_events"], r[0]["exact_p99"], r[0]["est_p99"],
           r[0]["err_ppm"])
    assert row == (n, exact, est, 10**6 * (exact - est) // exact)
    # the histogram's guarantee: estimate is a lower bound within 2^-4
    assert 0 <= row[1] - row[2]
    assert row[3] <= 10**6 // 16
