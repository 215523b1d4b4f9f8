"""Batch-94 units: isotonic regression (INDEPENDENT sequential stack
PAVA brute — the unique optimum means block equality is the proof —
plus monotonicity/SSE-optimality pins) and seasonal MASE (pandas lag
brute + a crafted seasonal series where the weekly model crushes the
naive scale)."""
from fractions import Fraction

import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def stack_pava(ys):
    """Sequential pool-adjacent-violators with a stack of (sum, len)."""
    st = []
    for y in ys:
        s, l = y, 1
        while st and Fraction(st[-1][0], st[-1][1]) > Fraction(s, l):
            ps, pl = st.pop()
            s, l = s + ps, l + pl
        st.append((s, l))
    out = []
    for s, l in st:
        out.extend([(s, l)] * l)
    return out


def _daily(sf):
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["ts", "event_type"])
    day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
    g = (pd.DataFrame({"t": ev["event_type"], "d": day})
         .groupby(["t", "d"]).size().reset_index(name="c"))
    return {t: sorted(zip(gg["d"].astype(int), gg["c"].astype(int)))
            for t, gg in g.groupby("t")}


def test_isotonic_vs_stack_pava(spark):
    daily = _daily(SF)
    exp = {}
    for t, series in daily.items():
        fits = stack_pava([c for _, c in series])
        for (d, c), (s, l) in zip(series, fits):
            q = 1000 * s
            exp[(t, d)] = (c, s, l, q // l)
    got = {(r["event_type"], r["d"]): (r["c"], r["fit_num"],
                                       r["fit_den"], r["fit_milli"])
           for r in em.q_isotonic_daily(spark, SF).collect()}
    assert got == exp
    # fitted sequence is monotone non-decreasing per type, and pooling
    # actually happened somewhere (the raw series is not monotone)
    pooled = False
    for t, series in daily.items():
        fr = [Fraction(got[(t, d)][1], got[(t, d)][2])
              for d, _ in series]
        assert all(a <= b for a, b in zip(fr, fr[1:]))
        if any(l > 1 for _, _, l, _ in
               (got[(t, d)] for d, _ in series)):
            pooled = True
    assert pooled


def test_pava_crafted():
    # strictly decreasing input pools to one global-mean block
    assert stack_pava([3, 2, 1]) == [(6, 3)] * 3
    # already monotone stays untouched
    assert stack_pava([1, 2, 3]) == [(1, 1), (2, 1), (3, 1)]
    # the classic backtrack case: [1, 3, 2] pools the tail
    assert stack_pava([1, 3, 2]) == [(1, 1), (5, 2), (5, 2)]


def test_mase_seasonal_vs_brute(spark):
    daily = _daily(SF)
    exp = {}
    for t, series in daily.items():
        cs = [c for _, c in series]
        terms = [(abs(cs[i] - cs[i - 7]), abs(cs[i] - cs[i - 1]))
                 for i in range(7, len(cs))]
        m = sum(a for a, _ in terms)
        nv = sum(b for _, b in terms)
        exp[t] = (len(terms), m, nv, 1000 * m // nv)
    got = {r["event_type"]: (r["n_terms"], r["m_abs_sum"],
                             r["naive_abs_sum"], r["mase_milli"])
           for r in em.q_mase_seasonal(spark, SF).collect()}
    assert got == exp
    # crafted: on a pure weekly pattern the seasonal model is perfect
    cs = [10, 20, 30, 40, 30, 20, 10] * 3
    m = sum(abs(cs[i] - cs[i - 7]) for i in range(7, len(cs)))
    nv = sum(abs(cs[i] - cs[i - 1]) for i in range(7, len(cs)))
    assert m == 0 and nv > 0
