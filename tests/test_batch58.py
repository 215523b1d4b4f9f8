"""Batch-58 units: integer Epanechnikov KDE and market-basket lift —
verified against independent python brute force."""
import numpy as np
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.sources import minted

SF = "/root/testdata/sf0.001"


def test_kde_cells_matches_brute(spark):
    p = minted.minted_cluster_points_q(spark, SF).toPandas()
    r = em.KDE_R
    occ = sorted(set(zip(p["qx"] // r, p["qy"] // r)))
    qx = p["qx"].to_numpy(np.int64)
    qy = p["qy"].to_numpy(np.int64)
    got = {(row["cx"], row["cy"]): row
           for row in em.q_kde_cells(spark, SF).collect()}
    assert set(got) == set(occ)
    for cx, cy in occ:
        mx, my = cx * r + r // 2, cy * r + r // 2
        # object dtype: far-away squared distances overflow int64 (the
        # engine never forms them — its ring prefilter bounds d²)
        d2 = (qx - mx).astype(object) ** 2 + (qy - my).astype(object) ** 2
        m = d2 < r * r
        row = got[(cx, cy)]
        assert row["n_in_r"] == int(m.sum())
        assert row["kde"] == int((r * r - d2[m]).sum())


def test_basket_pairs_matches_brute(spark):
    li = (pd.read_parquet(f"{SF}/lineitem.parquet")
          [["l_orderkey", "l_partkey"]].drop_duplicates())
    n = li["l_orderkey"].nunique()
    marg = li.groupby("l_partkey").size().to_dict()
    cnt = {}
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(g["l_partkey"])
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                key = (parts[i], parts[j])
                cnt[key] = cnt.get(key, 0) + 1
    exp = {k: v for k, v in cnt.items() if v >= em.BASKET_MIN}
    got = {(r["pa"], r["pb"]): r
           for r in em.q_basket_pairs(spark, SF).collect()}
    assert set(got) == set(exp)
    for (pa, pb), row in got.items():
        assert row["c_ab"] == exp[(pa, pb)]
        assert (row["c_a"], row["c_b"]) == (marg[pa], marg[pb])
        assert row["lift_ppm"] == \
            n * exp[(pa, pb)] * 10**6 // (marg[pa] * marg[pb])
    # at this sparsity every surviving pair is positively associated
    # (repeat co-occurrence is already signal); the lift still spreads
    lifts = [r["lift_ppm"] for r in got.values()]
    assert max(lifts) > 10**6 and max(lifts) > 2 * min(lifts)
