"""Batch-53 units: vocabulary growth, peak concurrency, grid boundary —
verified against independent pandas/python brute force."""
import numpy as np
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.sources import minted

SF = "/root/testdata/sf0.001"


def test_vocab_growth_matches_pandas(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    got = {r["k"]: r for r in em.q_vocab_growth(spark, SF).collect()}
    assert set(got) == set(em.VOCAB_KS)
    for k in em.VOCAB_KS:
        pre = docs[docs["doc_id"] < k]["text"]
        toks = [t for s in pre for t in s.split(" ") if t]
        assert got[k]["total_tokens"] == len(toks)
        assert got[k]["vocab"] == len(set(toks))
    # monotone non-decreasing curve
    vs = [got[k]["vocab"] for k in sorted(em.VOCAB_KS)]
    assert vs == sorted(vs)


def test_peak_concurrency_matches_sweep(spark):
    from geobuf_spark.streaming import windows as W
    raw = spark.read.parquet(f"{SF}/events.parquet")
    sess = W.sessionize(raw, gap_minutes=30).toPandas()
    events = sorted(
        [(int(t), 1) for t in sess["t_start"]]
        + [(int(t), -1) for t in sess["t_end"]],
        key=lambda p: (p[0], -p[1]))
    run, peak, first_t = 0, -1, None
    for t, d in events:
        run += d
        if run > peak:
            peak, first_t = run, t
    row = em.q_peak_concurrency(spark, SF).collect()[0]
    assert row["n_sessions"] == len(sess)
    assert row["peak"] == peak
    assert row["first_peak_t"] == first_t
    assert peak >= 2  # fixture actually overlaps


def test_grid_boundary_matches_python(spark):
    p = minted.minted_cluster_points_q(spark, SF).toPandas()
    occ = set(zip(p["qx"] // em.GRIDB_CELL, p["qy"] // em.GRIDB_CELL))
    hist = {}
    for cx, cy in occ:
        n = sum((cx + dx, cy + dy) in occ
                for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)))
        hist[n] = hist.get(n, 0) + 1
    got = {r["n_nb"]: r["n_cells"]
           for r in em.q_grid_boundary_cells(spark, SF).collect()}
    assert got == hist
