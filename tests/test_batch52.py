"""Batch-52 units: Markov stationary iteration and rolling 7d median —
verified against independent numpy brute force."""
import numpy as np
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _daily():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
    return ev.assign(day=day)


def test_markov_matches_numpy_iteration(spark):
    ev = _daily().sort_values(["user_id", "ts", "event_id"])
    # transition counts over per-user consecutive pairs
    cnt = {}
    for _, g in ev.groupby("user_id"):
        t = g["event_type"].to_numpy()
        for a, b in zip(t[:-1], t[1:]):
            cnt[(a, b)] = cnt.get((a, b), 0) + 1
    srcs = sorted({a for a, _ in cnt})
    rowsum = {p: sum(c for (a, _), c in cnt.items() if a == p)
              for p in srcs}
    v = {p: em.MARKOV_V0 for p in srcs}
    iters = []
    for _ in range(3):
        nv = {}
        for (p, t), c in cnt.items():
            if p in v:
                nv[t] = nv.get(t, 0) + v[p] * c // rowsum[p]
        v = nv
        iters.append(dict(v))
    got = {r["event_type"]: r
           for r in em.q_markov_stationary(spark, SF).collect()}
    for t, row in got.items():
        assert (row["v1"], row["v2"], row["v3"]) == \
            (iters[0][t], iters[1][t], iters[2][t])
    assert set(got) == set(iters[2])
    # mass approximately conserved (integer div only loses ulps)
    assert abs(sum(r["v3"] for r in got.values()) - 10**6) < 100


def test_rolling_median_matches_numpy(spark):
    daily = _daily().groupby("day").size()
    days = daily.index.to_numpy(np.int64)
    got = {r["day"]: r for r in
           em.q_rolling_median_7d(spark, SF).collect()}
    assert set(got) == set(days.tolist())
    for d in days:
        win = daily[(daily.index >= d - 6) & (daily.index <= d)]
        x = np.sort(win.to_numpy(np.int64))
        n = len(x)
        med_x2 = int(x[(n - 1) // 2] + x[n // 2])
        row = got[d]
        assert row["n_win"] == n
        assert row["med_x2"] == med_x2
