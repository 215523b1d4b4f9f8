"""Batch-80 units: greedy bandit replay (pure-python sequential brute of
the same policy) and LSH blocking quality (brute candidates + truth from
the exact tier; the PC/RR trade-off must be real)."""
import numpy as np
import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def test_bandit_replay_vs_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type", "value"])
    ev["te"] = ev["ts"].astype("datetime64[s]").astype(np.int64)
    ev["v"] = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    arms = em.BANDIT_ARMS
    n = n_match = reward = 0
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["te", "event_id"])
        cnt = {a: 0 for a in arms}
        tot = {a: 0 for a in arms}
        for r in g.itertuples():
            unex = next((a for a in arms if cnt[a] == 0), None)
            if unex is not None:
                chosen = unex
            else:
                chosen = max(arms,
                             key=lambda a: (1000 * tot[a] // cnt[a],
                                            [-ord(c) for c in a]))
            n += 1
            if chosen == r.event_type:
                n_match += 1
                reward += int(r.v)
            cnt[r.event_type] += 1
            tot[r.event_type] += int(r.v)
    rows = em.q_bandit_replay(spark, SF).collect()
    assert len(rows) == 1
    got = (rows[0]["n_events"], rows[0]["n_matches"],
           rows[0]["reward_cents"], rows[0]["match_ppm"])
    assert got == (n, n_match, reward, 10**6 * n_match // n)
    # replay keeps a meaningful but partial match rate (5 arms → the
    # greedy policy matches well above never and well below always)
    assert 50_000 < got[3] < 900_000


def test_blocking_quality(spark):
    rows = em.q_blocking_quality(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    n_true, n_cand, n_caught = r["n_true"], r["n_cand"], r["n_caught"]
    assert n_caught <= min(n_true, n_cand)
    assert n_true > 0 and n_cand > 0
    # blocking must actually block (reduction ratio high) while keeping
    # most of the truth (pair completeness high) — the whole point
    assert r["rr_ppm"] > 900_000
    assert r["pc_ppm"] >= 500_000
    # cross-check n_true against the exact tier directly
    from geobuf_spark.operators import dedup
    t = dedup.ngram_jaccard_pairs(em._docs(spark, SF), key="doc_id",
                                  shingle_k=3, threshold=0.4) \
        .select("a", "b").distinct().count()
    assert t == n_true
