"""Batch-103 units: Morisita aggregation index (python quadrat brute +
the textbook clumped→under-dispersed multi-scale profile) and the
Wald–Wolfowitz runs ingredients (sequential python brute + crafted
trending/oscillating series with known run counts)."""
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def brute_morisita(pts, cell):
    g = {}
    for x, y in pts:
        k = (x // cell, y // cell)
        g[k] = g.get(k, 0) + 1
    q = len(g)
    n = sum(g.values())
    pw = sum(v * (v - 1) for v in g.values())
    return (q, n, pw, 10**6 * q * pw // (n * (n - 1)))


def test_morisita_vs_brute(spark):
    from geobuf_spark.sources import minted
    pts = [(r["qx"], r["qy"])
           for r in minted.minted_cluster_points_q(spark, SF).collect()]
    exp = {c: brute_morisita(pts, c) for c in em.MOR_CELLS}
    got = {r["cell"]: (r["q_occupied"], r["n_pts"], r["pairs_within"],
                       r["morisita_ppm"])
           for r in em.q_morisita_tiles(spark, SF).collect()}
    assert got == exp
    # textbook profile on the clustered mint: clumped (>1) at cluster
    # scale, monotonically falling as quadrats shrink past it
    ppm = [got[c][3] for c in sorted(em.MOR_CELLS, reverse=True)]
    assert ppm[0] > 10**6 and ppm == sorted(ppm, reverse=True)


def brute_runs(series):
    cs = [c for _, c in series]
    med = sorted(cs)[(len(cs) + 1) // 2 - 1]
    # lower median; ties on (c, d) order — same element by VALUE
    signs = [1 if c > med else 0 for _, c in series if c != med]
    n1 = sum(signs)
    n2 = len(signs) - n1
    runs = sum(1 for i, s in enumerate(signs)
               if i == 0 or s != signs[i - 1])
    return (runs, n1, n2, n1 + n2 + 2 * n1 * n2, n1 + n2)


def test_runs_crafted():
    mk = lambda cs: list(enumerate(cs))
    # alternation (median day excluded) ⇒ many runs
    assert brute_runs(mk([1, 9, 2, 8, 3, 7]))[0] == 4
    # block trend ⇒ exactly 2 runs
    r = brute_runs(mk([1, 2, 3, 7, 8, 9]))
    assert r[0] == 2 and r[1] == 3 and r[2] == 2
    assert (r[3], r[4]) == (3 + 2 + 12, 5)


def test_runs_test_daily_vs_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type"])
    day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
    g = (pd.DataFrame({"t": ev["event_type"], "d": day})
         .groupby(["t", "d"]).size().reset_index(name="c"))
    exp = {}
    for t, gg in g.groupby("t"):
        series = sorted(zip(gg["d"].astype(int), gg["c"].astype(int)))
        exp[t] = brute_runs(series)
    got = {r["event_type"]: (r["n_runs"], r["n1"], r["n2"],
                             r["exp_num"], r["exp_den"])
           for r in em.q_runs_test_daily(spark, SF).collect()}
    assert got == exp
    for runs, n1, n2, num, den in got.values():
        assert 1 <= runs <= n1 + n2 and den == n1 + n2
