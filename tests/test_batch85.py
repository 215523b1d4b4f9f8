"""Batch-85 units: full DBSCAN labels (sequential python DBSCAN with the
same deterministic min-label border spec) and Theil–Sen daily slope
(Fraction-exact lower median, independent of the LCM sort-key trick)."""
from fractions import Fraction

import numpy as np
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def brute_dbscan(pts, eps, min_nbrs):
    """pts: {doc_id: (x, y)} → {doc_id: (cluster, role)} under the
    pinned spec: cluster = min core id in the core-core component,
    border = min neighbouring core cluster, else noise/-1."""
    ids = sorted(pts)
    nbrs = {i: [] for i in ids}
    for i in ids:
        xi, yi = pts[i]
        for j in ids:
            if i == j:
                continue
            xj, yj = pts[j]
            if (xi - xj) ** 2 + (yi - yj) ** 2 <= eps * eps:
                nbrs[i].append(j)
    core = {i for i in ids if len(nbrs[i]) >= min_nbrs}
    # components over core-core edges (plain DFS)
    label = {}
    for s in sorted(core):
        if s in label:
            continue
        comp, stack = [], [s]
        seen = {s}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in nbrs[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    out = {}
    for i in ids:
        if i in core:
            out[i] = (label[i], "core")
        else:
            cl = [label[j] for j in nbrs[i] if j in core]
            out[i] = (min(cl), "border") if cl else (-1, "noise")
    return out


def test_dbscan_clusters_vs_brute(spark):
    from geobuf_spark.sources import minted
    p = {r["doc_id"]: (r["qx"], r["qy"])
         for r in minted.minted_cluster_points_q(spark, SF).collect()}
    exp = brute_dbscan(p, em.DBSCAN_EPS, em.DBSCAN_MIN_NBRS)
    got = {r["doc_id"]: (r["cluster"], r["role"])
           for r in em.q_dbscan_clusters(spark, SF).collect()}
    assert got == exp
    roles = {v[1] for v in got.values()}
    assert roles == {"core", "border", "noise"}  # nonvacuous split
    # cluster ids are core ids; noise is exactly -1
    cores = {i for i, v in got.items() if v[1] == "core"}
    for i, (cl, role) in got.items():
        if role == "noise":
            assert cl == -1
        else:
            assert cl in cores


def test_dbscan_crafted():
    # two 3-point blobs bridged by one border point + one noise point
    pts = {1: (0, 0), 2: (1, 0), 3: (0, 1),          # blob A
           11: (100, 0), 12: (101, 0), 13: (100, 1),  # blob B
           20: (50, 0),                               # isolated noise
           21: (4, 0)}  # one nbr (core 2) within eps → border of A
    out = brute_dbscan(pts, eps=3, min_nbrs=2)
    assert out[1] == (1, "core") and out[2] == (1, "core")
    assert out[11] == (11, "core") and out[13] == (11, "core")
    assert out[20] == (-1, "noise")
    assert out[21] == (1, "border")  # within eps of core 2, not core


def test_theil_sen_vs_fraction_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type"])
    day = (ev["ts"].astype("datetime64[s]").astype("int64")
           // 86400)
    daily = (pd.DataFrame({"t": ev["event_type"], "d": day})
             .groupby(["t", "d"]).size().reset_index(name="c"))
    exp = {}
    for t, g in daily.groupby("t"):
        rows = sorted(zip(g["d"].astype(int), g["c"].astype(int)))
        slopes = []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                num = rows[j][1] - rows[i][1]
                den = rows[j][0] - rows[i][0]
                slopes.append((Fraction(num, den), den, num))
        slopes.sort()
        P = len(slopes)
        _, den, num = slopes[(P + 1) // 2 - 1]
        q = 1000 * num
        milli = (abs(q) // den) * (1 if q >= 0 else -1)  # toward zero
        exp[t] = (len(rows), P, num, den, milli)
    got = {r["event_type"]: (r["n_days"], r["n_pairs"], r["med_num"],
                             r["med_den"], r["slope_milli"])
           for r in em.q_theil_sen_daily(spark, SF).collect()}
    assert got == exp
    # the fixture exercises a negative median (toward-zero division)
    assert any(v[2] < 0 for v in got.values())


def test_theil_sen_robustness_property():
    # an outlier day bends the least-squares slope but not the median
    # of pairwise slopes: flat series + one huge spike
    rows = [(d, 10) for d in range(9)] + [(9, 1000)]
    slopes = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            num = rows[j][1] - rows[i][1]
            den = rows[j][0] - rows[i][0]
            slopes.append((Fraction(num, den), den, num))
    slopes.sort()
    med = slopes[(len(slopes) + 1) // 2 - 1][0]
    assert med == 0  # robust: the spike's 9 pairs lose to 36 flat ones
    xs = np.array([r[0] for r in rows], dtype=float)
    ys = np.array([r[1] for r in rows], dtype=float)
    ls = np.polyfit(xs, ys, 1)[0]
    assert ls > 50  # least squares is dragged; Theil–Sen is not
