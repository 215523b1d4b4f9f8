"""Batch-91 units: max-burst window (O(n²) all-windows python brute vs
the prefix-min window formulation — including the virtual P0 row and
both tie-breaks) and DTW (clean-room full-matrix DP brute + metric
sanity: identical series → 0, DTW ≤ L1 of aligned series)."""
import numpy as np
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _daily(sf):
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["ts", "event_type"])
    day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
    g = (pd.DataFrame({"t": ev["event_type"], "d": day})
         .groupby(["t", "d"]).size().reset_index(name="c"))
    return {t: sorted(zip(gg["d"].astype(int), gg["c"].astype(int)))
            for t, gg in g.groupby("t")}


def brute_burst(series):
    """All O(n²) windows: (sum, start_day, end_day, len) with the
    max-sum / earliest-end / earliest-start tie order."""
    n = len(series)
    tot = sum(c for _, c in series)
    dev = [n * c - tot for _, c in series]
    best = None
    for j in range(1, n + 1):
        for i in range(0, j):
            s = sum(dev[i:j])
            key = (-s, j, i)
            if best is None or key < best[0]:
                best = (key, (s, series[i][0], series[j - 1][0], j - i))
    return best[1]


def test_max_burst_vs_brute(spark):
    exp = {t: brute_burst(s) for t, s in _daily(SF).items()}
    got = {r["event_type"]: (r["burst_sum"], r["start_day"],
                             r["end_day"], r["w_len"])
           for r in em.q_max_burst_window(spark, SF).collect()}
    assert got == exp
    # deviations sum to zero ⇒ every best window sum is ≥ 0 and the
    # full window is never strictly best unless all windows tie at 0
    for s, *_ in got.values():
        assert s >= 0
    assert any(v[3] < 30 for v in got.values())  # a real sub-window


def brute_dtw(a, b):
    n, m = len(a), len(b)
    D = np.zeros((n, m), dtype=np.int64)
    for i in range(n):
        for j in range(m):
            c = abs(a[i] - b[j])
            if i == 0 and j == 0:
                D[i, j] = c
            elif i == 0:
                D[i, j] = c + D[i, j - 1]
            elif j == 0:
                D[i, j] = c + D[i - 1, j]
            else:
                D[i, j] = c + min(D[i - 1, j], D[i, j - 1],
                                  D[i - 1, j - 1])
    return int(D[-1, -1])


def test_dtw_vs_brute(spark):
    daily = _daily(SF)
    series = {t: [c for _, c in s] for t, s in daily.items()}
    ts = sorted(series)
    exp = {(a, b): brute_dtw(series[a], series[b])
           for i, a in enumerate(ts) for b in ts[i + 1:]}
    got = {(r["type_a"], r["type_b"]): r["dtw"]
           for r in em.q_dtw_daily(spark, SF).collect()}
    assert got == exp and len(got) == 10
    for (a, b), v in got.items():
        l1 = sum(abs(x - y) for x, y in zip(series[a], series[b]))
        assert 0 <= v <= l1  # alignment can only help
    assert brute_dtw([1, 2, 3], [1, 2, 3]) == 0
    # warping beats rigid alignment on a shifted spike
    sa, sb = [0, 9, 0, 0], [0, 0, 9, 0]
    assert brute_dtw(sa, sb) < sum(abs(x - y) for x, y in zip(sa, sb))
