"""Batch-55 units: SCD2-versioned PIP join and dow-adjusted outliers —
verified against independent pandas brute force."""
import numpy as np
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.sources import minted

SF = "/root/testdata/sf0.001"


def _mulmod_np(a, mult, mod):
    return (a.astype(object) * mult) % mod


def test_pip_versioned_matches_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    s = ev["ts"].astype("datetime64[s]").astype("int64").to_numpy()
    eid = ev["event_id"].to_numpy(np.int64)
    lon = (np.array(_mulmod_np(eid, minted.LON_MULT, minted.LON_MOD),
                    dtype=np.int64) - minted.LON_MOD // 2) / 1e7
    lat = (np.array(_mulmod_np(eid, minted.LAT_MULT, minted.LAT_MOD),
                    dtype=np.int64) - minted.LAT_MOD // 2) / 1e7
    rects = minted.minted_rects(spark, SF).toPandas()
    exp = {}
    for r in rects.itertuples():
        for ver in range(3):
            vf = em.PIPV_T0 + ver * em.PIPV_EPOCH_S
            vt = vf + em.PIPV_EPOCH_S
            m = ((s >= vf) & (s < vt)
                 & (lon >= r.minx + ver * 0.5)
                 & (lon <= r.maxx + ver * 0.5)
                 & (lat >= r.miny) & (lat <= r.maxy))
            if m.any():
                exp[(int(r.poly_id), ver)] = (int(m.sum()),
                                              int(eid[m].min()))
    got = {(r["poly_id"], r["ver"]): (r["n_hits"], r["first_event"])
           for r in em.q_pip_versioned(spark, SF).collect()}
    assert got == exp
    # the version dimension is real: some poly matches in >1 version
    polys = {}
    for (p, v) in got:
        polys.setdefault(p, set()).add(v)
    assert any(len(vs) > 1 for vs in polys.values())


def test_dow_residuals_match_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
    daily = day.value_counts().sort_index()
    dows = daily.index.to_numpy(np.int64) % 7
    x = daily.to_numpy(np.int64)
    got = {r["day"]: r
           for r in em.q_dow_residual_outliers(spark, SF).collect()}
    resids = {}
    for d, xi, dw in zip(daily.index, x, dows):
        n_dow = int((dows == dw).sum())
        s_dow = int(x[dows == dw].sum())
        resids[d] = xi * n_dow - s_dow
    q = sum(v * v for v in resids.values())
    n = len(resids)
    for d, row in got.items():
        assert row["resid"] == resids[d]
        assert row["is_outlier"] == int(
            resids[d] ** 2 * n > em.DOW_K * q)
    # per-dow residuals sum to zero by construction
    for dw in set(dows):
        assert sum(resids[d] for d, w in zip(daily.index, dows)
                   if w == dw) == 0
