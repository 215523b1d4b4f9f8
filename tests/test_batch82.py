"""Batch-82 units: two-level exact top-k (the union-contains-global-topk
proof exercised: local tops vs direct brute) and difference-in-
differences (pandas brute of the same quantized cells)."""
import hashlib

import numpy as np
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def test_topk_two_level_vs_direct(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet", columns=["source"])
    counts = {}
    for s in d["source"]:
        h = f"{s}.example"
        counts[h] = counts.get(h, 0) + 1
    direct = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    exp = [(h, n, i + 1) for i, (h, n) in
           enumerate(direct[:em.TOPK2_K])]
    got = [(r["host"], r["n"], r["rank"])
           for r in em.q_topk_two_level(spark, SF)
           .orderBy("rank").collect()]
    assert got == exp
    # the two-level plan's guarantee, checked by construction: each
    # host's count lives in exactly one hash bucket, so the union of
    # local top-k contains the global top-k
    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    buckets = {}
    for h, n in counts.items():
        buckets.setdefault(h60(h) % em.TOPK2_B, []).append((h, n))
    union = []
    for bs in buckets.values():
        bs.sort(key=lambda kv: (-kv[1], kv[0]))
        union.extend(bs[:em.TOPK2_K])
    assert {h for h, _, _ in exp} <= {h for h, _ in union}


def test_did_purchases_vs_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_type",
                                  "value"])
    p = ev[ev.event_type == "purchase"].copy()
    p["day"] = p["ts"].astype("datetime64[s]").astype(np.int64) // 86400
    p["v"] = np.floor(p["value"] * 100 + 0.5).astype("int64")
    d0 = int(p["day"].min())
    p["treat"] = (p["user_id"] % 2 == 1).astype(int)
    p["after"] = (p["day"] - d0 >= em.DID_SPLIT_DAY).astype(int)
    cells = {}
    for (t, a), g in p.groupby(["treat", "after"]):
        cells[(t, a)] = 1000 * int(g["v"].sum()) // len(g)
    exp = (cells[(1, 0)], cells[(1, 1)], cells[(0, 0)], cells[(0, 1)],
           (cells[(1, 1)] - cells[(1, 0)])
           - (cells[(0, 1)] - cells[(0, 0)]))
    r = em.q_did_purchases(spark, SF).collect()
    assert len(r) == 1
    got = (r[0]["t_before_m"], r[0]["t_after_m"], r[0]["c_before_m"],
           r[0]["c_after_m"], r[0]["did_millicents"])
    assert got == exp
    # all four cells populated — the split is real on the fixture
    assert all(v is not None for v in got)
