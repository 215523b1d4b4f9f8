"""Batch-66 units: IBLT set reconciliation (planted diffs, capacity
behavior, loud failure) and persistent heavy hitters (pandas brute)."""
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as em
from geobuf_spark.operators import reconcile

SF = "/root/testdata/sf0.001"


def test_iblt_recovers_planted_diff(spark):
    a = spark.range(0, 500).selectExpr("concat('k', id) AS k")
    b = spark.range(13, 520).selectExpr("concat('k', id) AS k")
    got = {r["k"]: r["side"]
           for r in reconcile.reconcile(a, b, key="k",
                                        n_cells=128).collect()}
    exp = {f"k{i}": 1 for i in range(13)}
    exp.update({f"k{i}": -1 for i in range(500, 520)})
    assert got == exp


def test_iblt_identical_sets_empty_diff(spark):
    a = spark.range(0, 300).selectExpr("concat('k', id) AS k")
    out = reconcile.reconcile(a, a, key="k", n_cells=64)
    assert out.count() == 0
    # and the aggregated table itself fully cancels — nothing survives
    # the all-zero filter, so the exchanged state is literally empty
    assert reconcile.iblt_cells(a, a, "k", 64).count() == 0


def test_iblt_overflow_is_loud(spark):
    # diff of 200 keys into 16 cells cannot peel — must raise, never
    # return a silent partial diff
    a = spark.range(0, 200).selectExpr("concat('k', id) AS k")
    b = spark.range(500, 500).selectExpr("concat('k', id) AS k")  # empty
    with pytest.raises(ValueError, match="capacity"):
        reconcile.reconcile(a, b, key="k", n_cells=16)


def test_iblt_state_is_constant_size(spark):
    # the exchanged state is ≤ n_cells rows regardless of corpus size
    a = spark.range(0, 5000).selectExpr("concat('k', id) AS k")
    b = spark.range(3, 5003).selectExpr("concat('k', id) AS k")
    cells = reconcile.iblt_cells(a, b, "k", 64)
    assert cells.count() <= 64
    got, ok = reconcile.iblt_decode(
        [(r["cell"], r["cnt"], r["fp_xor"], r["chk_xor"])
         for r in cells.collect()], 64)
    assert ok and len(got) == 6


def test_persistent_heavy_hitters_vs_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["day"] = ev["ts"].astype("datetime64[s]").astype(np.int64) // 86400
    daily = (ev.groupby(["day", "user_id"]).size()
             .reset_index(name="c"))
    exp = {}
    for day, g in daily.groupby("day"):
        g = g.sort_values(["c", "user_id"],
                          ascending=[False, True]).head(em.PHH_TOP)
        for r in g.itertuples():
            n, s = exp.get(r.user_id, (0, 0))
            exp[r.user_id] = (n + 1, s + r.c)
    exp = {u: v for u, v in exp.items() if v[0] >= em.PHH_MIN_DAYS}
    got = {r["user_id"]: (r["n_days_top"], r["events_on_top_days"])
           for r in em.q_persistent_heavy_hitters(spark, SF).collect()}
    assert got == exp
    n_users = ev["user_id"].nunique()
    assert 0 < len(got) < n_users
