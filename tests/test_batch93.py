"""Batch-93 units: activity selection (python greedy brute + the
optimality certificate — greedy count equals a DP optimum on small
users) and sparse-table RMQ (direct-min brute over every query + a
crafted series where the two power-of-two windows genuinely overlap)."""
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def greedy_select(ivs):
    ivs = sorted(ivs, key=lambda t: (t[1], t[0], t[2]))
    cur, cnt = None, 0
    for t0, t1, _ in ivs:
        if cur is None or t0 > cur:
            cnt += 1
            cur = t1
    return cnt, cur


def dp_max_nonoverlap(ivs):
    """O(n²) DP optimum — independent of the greedy."""
    ivs = sorted(ivs, key=lambda t: t[1])
    n = len(ivs)
    best = [1] * n
    for i in range(n):
        for j in range(i):
            if ivs[j][1] < ivs[i][0]:
                best[i] = max(best[i], best[j] + 1)
    return max(best) if best else 0


def test_interval_schedule_vs_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    t0 = ev["ts"].astype("datetime64[s]").astype("int64")
    ivs = pd.DataFrame({
        "u": ev["user_id"].astype(int), "t0": t0.astype(int),
        "t1": (t0 + 1800 + ev["event_id"].astype(int) % 7200),
        "eid": ev["event_id"].astype(int)})
    exp = {}
    for u, g in ivs.groupby("u"):
        rows = list(zip(g["t0"], g["t1"], g["eid"]))
        cnt, cur = greedy_select(rows)
        exp[u] = (len(rows), cnt, cur)
        # greedy is optimal: matches the DP maximum
        assert cnt == dp_max_nonoverlap(rows)
    got = {r["user_id"]: (r["n_intervals"], r["n_selected"],
                          r["last_end"])
           for r in em.q_interval_schedule(spark, SF).collect()}
    assert got == exp
    # overlap pressure is real: somebody drops jobs
    assert any(n > k for n, k, _ in got.values())


def test_rmq_daily_vs_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
    daily = day.value_counts().sort_index()
    series = list(daily.astype(int))
    exp = {}
    for q, l, r in em._rmq_queries():
        exp[q] = (l, r, min(series[l - 1:r]))
    got = {r["qid"]: (r["l"], r["r"], r["range_min"])
           for r in em.q_rmq_daily(spark, SF).collect()}
    assert got == exp and len(got) == em.RMQ_NQ
    # queries include non-trivial ranges (len > 1) and at least one
    # where the power-of-two windows overlap (len not a power of two)
    lens = [r - l + 1 for l, r, _ in got.values()]
    assert any(n > 1 for n in lens)
    assert any(n & (n - 1) for n in lens)


def test_sparse_table_windows_crafted():
    # len=6, k=2: windows [l, l+3] and [r-3, r] overlap; min must be
    # correct when the true min sits in the overlap or either flank
    series = [9, 1, 8, 7, 2, 9]
    for l, r in [(1, 6), (2, 6), (1, 5)]:
        k = (r - l + 1).bit_length() - 1
        w = 1 << k
        lvl = {0: series}
        for kk in range(1, k + 1):
            p = lvl[kk - 1]
            lvl[kk] = [min(p[i], p[i + (1 << (kk - 1))])
                       for i in range(len(p) - (1 << (kk - 1)))]
        got = min(lvl[k][l - 1], lvl[k][r - w])
        assert got == min(series[l - 1:r])
