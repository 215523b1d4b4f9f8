"""Batch-47 units: Fano dispersion, degree assortativity, event RLE —
verified against independent numpy/pandas brute force."""
import numpy as np
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _events():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
    return ev


def test_fano_matches_numpy(spark):
    ev = _events()
    got = {r["event_type"]: r
           for r in em.q_fano_dispersion(spark, SF).collect()}
    for t, g in ev.groupby("event_type"):
        n = g.groupby("day").size().to_numpy(np.int64)
        row = got[t]
        assert row["n_days"] == len(n)
        assert (row["s"], row["ss"]) == (n.sum(), (n * n).sum())
        fano = n.var() / n.mean()  # population variance
        assert abs(row["fano_ppm"] / 1e6 - fano) < 2e-6


def test_assortativity_matches_numpy(spark):
    edges = (em._page_link_edges(spark, 2000)
             .toPandas())
    edges["dst_host"] = edges["dst"].str.extract(r"https://([^/]+)/")
    j = edges.groupby("src_host").size()
    k = edges.groupby("dst_host").size()
    ej = edges["src_host"].map(j).to_numpy(np.int64)
    ek = edges["dst_host"].map(k).to_numpy(np.int64)
    row = em.q_degree_assortativity(spark, SF).collect()[0]
    m = len(edges)
    assert row["m"] == m
    assert (row["sj"], row["sk"]) == (ej.sum(), ek.sum())
    assert (row["sjj"], row["skk"], row["sjk"]) == \
        ((ej * ej).sum(), (ek * ek).sum(), (ej * ek).sum())
    r = np.corrcoef(ej, ek)[0, 1]
    assert abs(row["r_e6"] / 1e6 - r) < 2e-6


def test_event_rle_matches_pandas(spark):
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    hist = {}
    for _, g in ev.groupby("user_id"):
        t = g["event_type"].to_numpy()
        run = 1
        for i in range(1, len(t) + 1):
            if i < len(t) and t[i] == t[i - 1]:
                run += 1
            else:
                key = (t[i - 1], run)
                hist[key] = hist.get(key, 0) + 1
                run = 1
    got = {(r["event_type"], r["run_len"]): r["n_runs"]
           for r in em.q_event_rle(spark, SF).collect()}
    assert got == hist
    # total run length mass must equal the event count (RLE is lossless)
    assert sum(k[1] * v for k, v in got.items()) == len(ev)
