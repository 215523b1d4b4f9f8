"""Batch-64 units: nearest-either-direction as-of join (vs a python brute
over the raw events, plus hand-built tie fixtures) and exact collinear
simplification (planted midpoints must vanish, kept sums exact)."""
import numpy as np
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.operators import temporal
from geobuf_spark.sources import minted

SF = "/root/testdata/sf0.001"


def test_asof_nearest_vs_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    ev["te"] = ev["ts"].astype("datetime64[s]").astype(np.int64)
    p = ev[ev.event_type == "purchase"]
    v = ev[ev.event_type == "view"]
    exp = {}
    for r in p.itertuples():
        cands = v[v.user_id == r.user_id]
        best = None
        for c in cands.itertuples():
            dt = int(c.te - r.te)
            if abs(dt) > em.ASOF_NEAR_TOL:
                continue
            key = (abs(dt), dt, c.event_id)
            if best is None or key < best[0]:
                best = (key, (int(c.event_id), dt))
        if best:
            exp[int(r.event_id)] = best[1]
    got = {r["purchase_id"]: (r["view_id"], r["dt_sec"])
           for r in em.q_asof_nearest(spark, SF).collect()}
    assert got == exp
    # the tolerance must bite both ways on the fixture
    assert 0 < len(got) < len(p)
    assert any(dt < 0 for _, dt in got.values())
    assert any(dt > 0 for _, dt in got.values())


def test_asof_nearest_tie_rules(spark):
    # |Δ| tie → backward; equal-ts builds → min rid; out-of-tol drops;
    # dt=0 counts as backward
    left = spark.createDataFrame(
        [(1, 100, 10), (1, 200, 50), (2, 300, 10), (3, 400, 10)],
        ["k", "lid", "t"])
    right = spark.createDataFrame(
        [(1, 7, 5), (1, 8, 15),        # lid=100: |Δ|=5 both → backward 7
         (1, 9, 50), (1, 10, 50),      # lid=200: dt=0 ties → min rid 9
         (2, 11, 500),                 # lid=300: out of tol
         (3, 12, 13), (3, 13, 6)],     # lid=400: forward 3 beats back 4
        ["k", "rid", "t"])
    got = {r["lid"]: (r["rid"], r["dt_sec"])
           for r in temporal.asof_nearest(
               left, right, key="k", ts="t", right_id="rid",
               tol=100).collect()}
    assert got == {100: (7, -5), 200: (9, 0), 400: (12, 3)}


def test_simplify_collinear_planted(spark):
    w = minted.minted_walk_lines_q(spark, SF).toPandas()
    got = {r["doc_id"]: (r["n_after"], r["sum_kept_x"], r["sum_kept_y"])
           for r in em.q_simplify_collinear(spark, SF).collect()}
    assert set(got) == set(w["doc_id"])
    structural = 0
    for r in w.itertuples():
        xs = [int(x) for x in r.xs_q]
        ys = [int(y) for y in r.ys_q]
        # brute: doubled lattice, midpoints interleaved, one-pass marks
        x2, y2 = [], []
        for i in range(17):
            if i % 2 == 0:
                x2.append(2 * xs[i // 2])
                y2.append(2 * ys[i // 2])
            else:
                x2.append(xs[(i - 1) // 2] + xs[(i + 1) // 2])
                y2.append(ys[(i - 1) // 2] + ys[(i + 1) // 2])
        kept = [True] + [
            (x2[i] - x2[i - 1]) * (y2[i + 1] - y2[i - 1])
            - (y2[i] - y2[i - 1]) * (x2[i + 1] - x2[i - 1]) != 0
            for i in range(1, 16)] + [True]
        exp = (sum(kept),
               sum(x for x, k in zip(x2, kept) if k),
               sum(y for y, k in zip(y2, kept) if k))
        assert got[r.doc_id] == exp, r.doc_id
        # every planted midpoint must be gone
        assert all(not kept[i] for i in range(1, 16, 2))
        structural += (exp[0] < 9)
    # the walk mint's steps are constant up to mulmod wraps, so some
    # ORIGINAL triples are exactly collinear too — the pass must be
    # doing real compression beyond the plant on part of the corpus,
    # while wraps keep plenty of lines at exactly the 9 originals
    assert structural > 0
    assert structural < len(w)
