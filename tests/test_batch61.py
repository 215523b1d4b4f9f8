"""Batch-61 units: constant-folded Voronoi/k-means assignment step (vs an
exact python-int brute, plus a join-free plan pin) and the integer CUSUM
changepoint scan (vs a python brute over the daily series)."""
import numpy as np
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.sources import minted

SF = "/root/testdata/sf0.001"


def _brute_voronoi(doc_ids):
    sites = minted.cluster_centers()
    per = {}
    for did in doc_ids:
        did = int(did)
        g = did % minted.N_CLUSTERS
        cx = (g * minted._CLX_MULT * minted.LON_MULT) % minted._CLX_SPAN
        cy = (g * minted._CLY_MULT * minted.LAT_MULT) % minted._CLY_SPAN
        ox = ((did % minted.LON_MOD) * minted.LON_MULT % minted.LON_MOD
              * minted._OFFX_MULT) % minted._OFFX_SPAN
        oy = ((did % minted.LAT_MOD) * minted.LAT_MULT % minted.LAT_MOD
              * minted._OFFY_MULT) % minted._OFFY_SPAN
        qx, qy = cx + ox, cy + oy
        best = min(((qx - sx) ** 2 + (qy - sy) ** 2, s)
                   for s, sx, sy in sites)
        s = best[1]
        n, sqx, sqy, nown = per.get(s, (0, 0, 0, 0))
        per[s] = (n + 1, sqx + qx, sqy + qy, nown + (g == s))
    return {s: (n, sqx // n, sqy // n, 10**6 * nown // n)
            for s, (n, sqx, sqy, nown) in per.items()}


def test_voronoi_assign_vs_brute(spark):
    ids = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id"])["doc_id"]
    exp = _brute_voronoi(ids.to_numpy(np.int64))
    got = {r["site_id"]: (r["n_points"], r["cent_qx"], r["cent_qy"],
                          r["own_ppm"])
          for r in em.q_voronoi_assign(spark, SF).collect()}
    assert got == exp
    # the clustered mint must actually scatter across many sites, and the
    # offset box must be small enough that most points recover their own
    # center (otherwise own_ppm is a vacuous diagnostic)
    assert len(got) >= 30
    tot = sum(n for n, _, _, _ in got.values())
    own = sum(n * ppm for n, _, _, ppm in got.values())
    assert own / (tot * 10**6) > 0.5


def test_voronoi_assign_plan_is_join_free(spark):
    # the sites are plan-time constants — the assignment must compile to
    # a projection + one aggregation, with NO join operator of any kind
    plan = em.q_voronoi_assign(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def brute_cusum(day_counts: dict):
    days = sorted(day_counts)
    nd, tot = len(days), sum(day_counts.values())
    best = None
    cum = 0
    for d in days:
        cum += day_counts[d] * nd - tot
        key = (-abs(cum), d)
        if best is None or key < best[0]:
            best = (key, (d, cum, day_counts[d], nd, tot))
    assert cum == 0  # telescoping sanity: full-series CUSUM ends at zero
    return best[1]


def test_cusum_days_vs_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    day = (ev["ts"].astype("datetime64[s]").astype(np.int64) // 86400)
    exp = brute_cusum(day.value_counts().to_dict())
    r = em.q_cusum_days(spark, SF).collect()
    assert len(r) == 1
    got = (r[0]["day"], r[0]["cusum_scaled"], r[0]["n_day"],
           r[0]["n_days"], r[0]["total_events"])
    assert got == exp
    assert got[1] != 0  # fixture must exhibit an actual drift extremum
