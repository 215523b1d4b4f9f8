"""Batch-84 units: convex hull stats (independent O(n³) hull-edge brute
— NOT the chain — plus hand cases for collinear edge points and
degenerate groups) and token-bucket replay (sequential python state
machine on the fixture, plus a crafted refill/cap/drop scenario)."""
import pandas as pd

import __spark_entry__ as em
from geobuf_spark.operators import temporal
from geobuf_spark.operators.hull import _chain, convex_hull_stats

SF = "/root/testdata/sf0.001"


def brute_hull_stats(pts):
    """O(n³) directed hull-edge test (the oracle's algorithm, in python,
    checked against the chain): returns (n_pts, k, area2, perim2) or
    None for degenerate groups."""
    P = sorted(set(pts))
    edges = []
    for a in P:
        for b in P:
            if a == b:
                continue
            ok = True
            for r in P:
                if r == a or r == b:
                    continue
                cr = ((b[0] - a[0]) * (r[1] - a[1])
                      - (b[1] - a[1]) * (r[0] - a[0]))
                dt = ((r[0] - a[0]) * (b[0] - a[0])
                      + (r[1] - a[1]) * (b[1] - a[1]))
                l2 = ((b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2)
                if not (cr > 0 or (cr == 0 and 0 < dt < l2)):
                    ok = False
                    break
            if ok:
                edges.append((a, b))
    if len(edges) < 3:
        return None
    area2 = abs(sum(p[0] * q[1] - q[0] * p[1] for p, q in edges))
    perim2 = sum((q[0] - p[0]) ** 2 + (q[1] - p[1]) ** 2
                 for p, q in edges)
    return (len(P), len(edges), area2, perim2)


def test_hull_hand_cases():
    # unit square with edge midpoints + center + a duplicate: midpoints
    # and interior are not corners
    sq = [(0, 0), (2, 0), (2, 2), (0, 2), (1, 0), (2, 1), (1, 2),
          (0, 1), (1, 1), (0, 0)]
    h = _chain(sq)
    assert sorted(h) == [(0, 0), (0, 2), (2, 0), (2, 2)]
    assert brute_hull_stats(sq) == (9, 4, 8, 16)
    # all collinear → degenerate in both algorithms
    col = [(0, 0), (1, 1), (2, 2), (3, 3)]
    assert _chain(col) == [] and brute_hull_stats(col) is None
    # two points → degenerate
    assert _chain([(0, 0), (5, 5)]) == []
    # triangle: area2 = |cross|, chain and brute agree
    tri = [(0, 0), (4, 0), (0, 3)]
    assert brute_hull_stats(tri) == (3, 3, 12, 16 + 9 + 25)


def test_hull_fixture_vs_brute(spark):
    from geobuf_spark.sources import minted
    rows = em.q_convex_hull_stats(spark, SF).collect()
    got = {r["gid"]: (r["n_pts"], r["hull_k"], r["area2"], r["perim2"])
           for r in rows}
    pts = (minted.minted_cluster_points_q(spark, SF)).collect()
    groups = {}
    for r in pts:
        groups.setdefault(r["doc_id"] % minted.N_CLUSTERS, []).append(
            (r["qx"], r["qy"]))
    exp = {}
    for g, ps in groups.items():
        b = brute_hull_stats(ps)
        if b is not None:
            exp[g] = b
    assert got == exp and len(got) > 0
    for n_pts, k, area2, perim2 in got.values():
        assert 3 <= k <= n_pts and area2 > 0 and perim2 > 0


def brute_token_bucket(rows, cap, refill):
    out = {}
    by_user = {}
    for u, t, eid in rows:
        by_user.setdefault(u, []).append((t, eid))
    for u, evs in by_user.items():
        evs.sort()
        tokens, drops, t_prev = cap, 0, None
        for t, _ in evs:
            if t_prev is not None:
                tokens = min(cap, tokens + (t - t_prev) // refill)
            if tokens >= 1:
                tokens -= 1
            else:
                drops += 1
            t_prev = t
        out[u] = (len(evs), drops, tokens)
    return out


def test_token_bucket_fixture_vs_brute(spark):
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    t = ev["ts"].astype("datetime64[s]").astype("int64")
    rows = list(zip(ev["user_id"].astype(int), t.astype(int),
                    ev["event_id"].astype(int)))
    exp = brute_token_bucket(rows, em.TB_CAP, em.TB_REFILL)
    got = {r["user_id"]: (r["n_events"], r["n_dropped"],
                          r["final_tokens"])
           for r in em.q_token_bucket(spark, SF).collect()}
    assert got == exp
    assert sum(d for _, d, _ in got.values()) > 0  # limiter engaged


def test_token_bucket_crafted(spark):
    # cap 2, refill 10s: events at t=0,1,2 → third drops (bucket
    # drained, no refill within 2s); t=25 refills by 2 (capped at 2)
    # → accepted; t=26 has 1 token left → accepted; t=27 drops
    df = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate([0, 1, 2, 25, 26, 27])],
        "user_id long, t long, event_id long")
    r = temporal.token_bucket_replay(df, capacity=2, refill_sec=10
                                     ).collect()
    assert len(r) == 1
    assert (r[0]["n_events"], r[0]["n_dropped"],
            r[0]["final_tokens"]) == (6, 2, 0)
