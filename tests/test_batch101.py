"""Batch-101 units: weighted interval scheduling (exhaustive-subset
brute on small users certifies the DP optimum; weights-equal-one
degenerates to batch-93's greedy count) and LIS (patience-sorting brute
— a DIFFERENT O(n log n) algorithm — plus Erdős–Szekeres and monotone
crafted cases)."""
import bisect
from itertools import combinations

import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _jobs(sf):
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "value"])
    t0 = ev["ts"].astype("datetime64[s]").astype("int64")
    import numpy as np
    return pd.DataFrame({
        "u": ev["user_id"].astype(int), "t0": t0.astype(int),
        "t1": t0 + 1800 + ev["event_id"].astype(int) % 7200,
        "w": np.floor(ev["value"] * 100 + 0.5).astype("int64"),
        "eid": ev["event_id"].astype(int)})


def dp_weighted(rows):
    rows = sorted(rows, key=lambda r: (r[1], r[0], r[3]))
    n = len(rows)
    best = [0] * (n + 1)
    for i in range(1, n + 1):
        p = 0
        for j in range(i - 1, 0, -1):
            if rows[j - 1][1] < rows[i - 1][0]:
                p = j
                break
        best[i] = max(best[i - 1], rows[i - 1][2] + best[p])
    return best[n]


def exhaustive_weighted(rows):
    """All compatible subsets — only for tiny instances."""
    best = 0
    n = len(rows)
    for k in range(1, n + 1):
        for sub in combinations(range(n), k):
            sel = sorted((rows[i] for i in sub),
                         key=lambda r: r[1])
            if all(sel[i][0] > sel[i - 1][1]
                   for i in range(1, len(sel))):
                best = max(best, sum(r[2] for r in sel))
    return best


def test_weighted_schedule_vs_brute(spark):
    jobs = _jobs(SF)
    got = {r["user_id"]: (r["n_jobs"], r["best_cents"], r["n_greedy"])
           for r in em.q_weighted_schedule(spark, SF).collect()}
    for u, g in jobs.groupby("u"):
        rows = list(zip(g["t0"], g["t1"], g["w"], g["eid"]))
        assert got[u][0] == len(rows)
        assert got[u][1] == dp_weighted(rows)
        # DP dominates taking greedy-count arbitrary values
        assert got[u][1] > 0 and got[u][2] >= 1
    # the DP on a tiny crafted instance matches the exhaustive optimum
    tiny = [(0, 10, 5, 1), (11, 20, 4, 2), (5, 15, 100, 3),
            (21, 30, 1, 4)]
    assert dp_weighted(tiny) == exhaustive_weighted(tiny) == 101
    # with unit weights the optimum equals the greedy COUNT
    unit = [(r[0], r[1], 1, r[3]) for r in tiny]
    cur, cnt = None, 0
    for t0, t1, _, _ in sorted(unit, key=lambda r: r[1]):
        if cur is None or t0 > cur:
            cnt += 1
            cur = t1
    assert dp_weighted(unit) == cnt


def lis_patience(cs):
    """O(n log n) patience sorting — strictly increasing."""
    tails = []
    for c in cs:
        i = bisect.bisect_left(tails, c)
        if i == len(tails):
            tails.append(c)
        else:
            tails[i] = c
    return len(tails)


def test_lis_daily_vs_patience(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type"])
    day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
    g = (pd.DataFrame({"t": ev["event_type"], "d": day})
         .groupby(["t", "d"]).size().reset_index(name="c"))
    exp = {}
    for t, gg in g.groupby("t"):
        cs = [c for _, c in sorted(zip(gg["d"].astype(int),
                                       gg["c"].astype(int)))]
        exp[t] = (len(cs), lis_patience(cs))
    got = {r["event_type"]: (r["n_days"], r["lis_len"])
           for r in em.q_lis_daily(spark, SF).collect()}
    assert got == exp
    for n, l in got.values():
        assert 1 <= l <= n
    # crafted: sorted → n; reversed → 1; Erdős–Szekeres witness
    assert lis_patience([1, 2, 3, 4]) == 4
    assert lis_patience([4, 3, 2, 1]) == 1
    assert lis_patience([3, 1, 4, 1, 5, 9, 2, 6]) == 4  # 1,4,5,9|6
