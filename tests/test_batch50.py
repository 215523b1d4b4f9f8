"""Batch-50 units: host fan-out capping and HLL estimate-vs-exact eval."""
import numpy as np
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.operators import sketch

SF = "/root/testdata/sf0.001"


def test_host_cap_sample_invariants(spark):
    rows = em.q_host_cap_sample(spark, SF).collect()
    assert all(r["n_kept"] == min(r["n_pages"], em.HOST_CAP) for r in rows)
    assert any(r["n_pages"] > em.HOST_CAP for r in rows)  # cap binds
    # kept bytes are a strict subset of total bytes on capped hosts
    p = em.pages.pages(spark, 2000).toPandas()
    p["host"] = p["url"].str.extract(r"https://([^/]+)/")
    total = p.groupby("host")["text"].apply(
        lambda s: int(s.str.len().sum()))
    for r in rows:
        if r["n_pages"] > em.HOST_CAP:
            assert 0 < r["kept_bytes"] < total[r["host"]]
        else:
            assert r["kept_bytes"] == total[r["host"]]


def test_host_cap_selection_is_md5_order(spark):
    # brute-check one capped host end-to-end: the kept set must be the
    # HOST_CAP smallest by md5(url)
    import hashlib
    p = em.pages.pages(spark, 2000).toPandas()
    p["host"] = p["url"].str.extract(r"https://([^/]+)/")
    p["md5"] = p["url"].map(
        lambda u: hashlib.md5(u.encode()).hexdigest())
    g = p.groupby("host")
    host = next(h for h, gg in g if len(gg) > em.HOST_CAP)
    gg = g.get_group(host).sort_values(["md5", "url"])
    kept_bytes = int(gg.head(em.HOST_CAP)["text"].str.len().sum())
    row = [r for r in em.q_host_cap_sample(spark, SF).collect()
           if r["host"] == host][0]
    assert row["kept_bytes"] == kept_bytes


def test_hll_error_eval_matches_brute_registers(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet")
    got = {r["event_type"]: r
           for r in em.q_hll_error_eval(spark, SF).collect()}
    from geobuf_spark.functions import phash
    for t, g in ev.groupby("event_type"):
        exact = g["user_id"].nunique()
        row = got[t]
        assert row["exact_n"] == exact
        assert row["err_ppm"] == (row["est_raw"] - exact) * 10**6 // exact
        # register invariants: ≤ m present, s_scaled ≥ m (all-empty floor)
        assert 1 <= row["n_present"] <= 64
        assert row["s_scaled"] >= 64
    # with only 15 distinct users the raw (uncorrected) estimate biases
    # high — the eval exists to SHOW that; just pin it's in a sane band
    assert all(0 < r["est_raw"] < 10**4 for r in got.values())
