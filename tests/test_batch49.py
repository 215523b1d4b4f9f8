"""Batch-49 units: time-weighted value integral and embedding covariance
moments — verified against independent numpy brute force."""
import numpy as np
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def test_time_weighted_value_matches_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["sec"] = ev["ts"].astype("datetime64[s]").astype("int64")
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(
        np.int64)
    got = {r["user_id"]: r
           for r in em.q_time_weighted_value(spark, SF).collect()}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["sec", "event_id"])
        sec = g["sec"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        if len(g) < 2 or sec[-1] == sec[0]:
            assert uid not in got
            continue
        dt = np.diff(sec)
        num = int((dt * cents[:-1]).sum())
        row = got[uid]
        assert row["n_events"] == len(g)
        assert row["span_s"] == sec[-1] - sec[0]
        assert row["twa_num"] == num
        assert row["twa_cents"] == num // (sec[-1] - sec[0])
    assert len(got) > 0


def test_embed_covariance_matches_numpy(spark):
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    q = np.floor(np.stack(emb["embedding"].to_numpy()).astype(np.float64)
                 * em.EMB_COV_SCALE).astype(np.int64)
    n, d = q.shape
    s = q.sum(axis=0)
    g = q.T @ q  # exact in int64 at this scale
    rows = em.q_embed_covariance(spark, SF).collect()
    assert len(rows) == d * (d + 1) // 2
    for r in rows:
        i, j = r["i"], r["j"]
        assert i <= j
        assert r["n"] == n
        assert (r["s_i"], r["s_j"]) == (s[i], s[j])
        assert r["s_ij"] == g[i, j]
        assert r["cov_num"] == n * g[i, j] - s[i] * s[j]
    # sanity: diagonal covariance numerators are non-negative
    assert all(r["cov_num"] >= 0 for r in rows if r["i"] == r["j"])
