"""Batch-104 units: Hodges–Lehmann pseudo-median (python Walsh-average
brute + robustness property: one huge outlier day moves HL far less
than the mean) and the Qn scale core (python pairwise-diff selection
brute + crafted known values + the 50%-breakdown property)."""
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


def brute_hl(series):
    ws = []
    for i in range(len(series)):
        for j in range(i, len(series)):
            ws.append((series[i][1] + series[j][1],
                       series[i][0], series[j][0]))
    ws.sort()
    return (len(ws), ws[(len(ws) + 1) // 2 - 1][0], 2)


def brute_qn(series):
    n = len(series)
    ds = []
    for i in range(n):
        for j in range(i + 1, n):
            ds.append((abs(series[i][1] - series[j][1]),
                       series[i][0], series[j][0]))
    ds.sort()
    h = n // 2 + 1
    k = h * (h - 1) // 2
    return (n, k, ds[k - 1][0])


def test_hl_and_qn_vs_brute(spark):
    daily = _daily(SF)
    exp_hl = {t: brute_hl(s) for t, s in daily.items()}
    got_hl = {r["event_type"]: (r["n_pairs"], r["hl_num"], r["hl_den"])
              for r in em.q_hodges_lehmann(spark, SF).collect()}
    assert got_hl == exp_hl
    exp_qn = {t: brute_qn(s) for t, s in daily.items()}
    got_qn = {r["event_type"]: (r["n_days"], r["k"], r["qn_core"])
              for r in em.q_qn_scale(spark, SF).collect()}
    assert got_qn == exp_qn
    for n, k, q in got_qn.values():
        assert q >= 0 and k == (n // 2 + 1) * (n // 2) // 2


def test_hl_robustness_property():
    mk = lambda cs: list(enumerate(cs))
    base = [10, 11, 12, 13, 14, 15, 16]
    spiked = base[:-1] + [10_000]
    hl_b = brute_hl(mk(base))[1] / 2
    hl_s = brute_hl(mk(spiked))[1] / 2
    mean_shift = (sum(spiked) - sum(base[:-1] + [16])) / len(base)
    assert abs(hl_s - hl_b) < 3          # HL barely moves
    assert mean_shift > 1000             # the mean is dragged


def test_qn_crafted():
    mk = lambda cs: list(enumerate(cs))
    # constant series → all diffs 0
    assert brute_qn(mk([5, 5, 5, 5]))[2] == 0
    # arithmetic sequence 0,2,4,6: diffs sorted [2,2,2,4,4,6]; n=4,
    # h=3, k=3 → third smallest = 2
    assert brute_qn(mk([0, 2, 4, 6])) == (4, 3, 2)
    # 50% breakdown: poisoning 2 of 6 points leaves the core finite
    # and close (k-th smallest diff still among the clean pairs)
    clean = [10, 12, 14, 11, 13, 15]
    poisoned = clean[:4] + [10**6, 2 * 10**6]
    assert brute_qn(mk(poisoned))[2] <= 4
