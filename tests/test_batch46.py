"""Batch-46 units: cluster diameter, polyline self-intersection, lag-1
autocorrelation — verified against independent numpy/python brute force."""
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as em
from geobuf_spark.sources import minted

SF = "/root/testdata/sf0.001"


def test_cluster_diameter_matches_numpy_brute(spark):
    pts = minted.minted_cluster_points_q(spark, SF).toPandas()
    pts["gid"] = pts["doc_id"] % minted.N_CLUSTERS
    got = {r["gid"]: r for r in em.q_cluster_diameter(spark, SF).collect()}
    assert len(got) == minted.N_CLUSTERS
    for gid, g in pts.groupby("gid"):
        ids = g["doc_id"].to_numpy(np.int64)
        x, y = g["qx"].to_numpy(np.int64), g["qy"].to_numpy(np.int64)
        d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
        iu = np.triu_indices(len(x), 1)
        best = d2[iu].max()
        # smallest packed (a,b) among maxima, with a<b enforced by id sort
        order = np.argsort(ids, kind="mergesort")
        ids, x, y = ids[order], x[order], y[order]
        d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
        packs = [ids[i] * em.DIAM_PACK + ids[j]
                 for i, j in zip(*np.triu_indices(len(x), 1))
                 if d2[i, j] == best]
        row = got[gid]
        assert row["n_pts"] == len(ids)
        assert row["max_d2"] == best
        assert (row["diam_a"], row["diam_b"]) == divmod(min(packs),
                                                        em.DIAM_PACK)


def _cross(o, p, q):
    return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])


def test_line_self_intersect_matches_python_brute(spark):
    wl = minted.cluster_walk_lines_q(spark, SF, k=9, stride=1).toPandas()
    got = dict(em.q_line_self_intersect(spark, SF)
               .rdd.map(lambda r: (r["doc_id"], r["n_self"])).collect())
    total = 0
    for _, r in wl.iterrows():
        pts = list(zip(r["xs_q"], r["ys_q"]))
        n = 0
        for i in range(8):
            for j in range(i + 2, 8):
                a, b, c, d = pts[i], pts[i + 1], pts[j], pts[j + 1]
                d1, d2 = _cross(c, d, a), _cross(c, d, b)
                d3, d4 = _cross(a, b, c), _cross(a, b, d)
                if (d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0 \
                        and (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0:
                    n += 1
        assert got[r["doc_id"]] == n
        total += n
    assert total > 0  # fixture actually exercises the predicate


def test_autocorr_daily_matches_numpy(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
    counts = day.value_counts().sort_index()
    days = counts.index.to_numpy(np.int64)
    x = counts.to_numpy(np.int64)
    keep = np.nonzero(days[1:] == days[:-1] + 1)[0]
    h, t = x[keep], x[keep + 1]
    row = em.q_autocorr_daily(spark, SF).collect()[0]
    assert row["np"] == len(h)
    assert (row["sx"], row["sy"]) == (h.sum(), t.sum())
    assert (row["sxx"], row["syy"], row["sxy"]) == \
        ((h * h).sum(), (t * t).sum(), (h * t).sum())
    n = len(h)
    r = (n * (h * t).sum() - h.sum() * t.sum()) / np.sqrt(
        float(n * (h * h).sum() - h.sum() ** 2)
        * float(n * (t * t).sum() - t.sum() ** 2))
    assert abs(row["r_e6"] / 1e6 - r) < 2e-6
