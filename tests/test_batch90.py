"""Batch-90 units: stable matching (SEQUENTIAL textbook Gale–Shapley as
the independent algorithm — the simultaneous engine rounds must land on
the same proposer-optimal matching — plus a no-blocking-pair stability
audit) and deterministic RANSAC (python brute of the hash-paired
candidates and integer inlier test)."""
import hashlib

import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"
SEP = "\x1e"


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _fixture_prefs():
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    users = sorted({int(u) for u in ev["user_id"]})[:em.SM_U]
    S = em.SM_S
    pref = {u: sorted(range(S),
                      key=lambda s: (_h60(f"sm-p{SEP}{u}{SEP}{s}"), s))
            for u in users}
    ah = {(s, u): _h60(f"sm-a{SEP}{s}{SEP}{u}")
          for s in range(S) for u in users}
    return users, S, pref, ah


def sequential_gs(users, S, pref, ah):
    """Textbook one-proposal-at-a-time GS (proposer queue)."""
    ptr = {u: 0 for u in users}
    held = {}
    queue = list(users)
    while queue:
        u = queue.pop(0)
        if ptr[u] >= S:
            continue
        s = pref[u][ptr[u]]
        ptr[u] += 1
        if s not in held:
            held[s] = u
        elif ah[(s, u)] < ah[(s, held[s])]:
            queue.append(held[s])
            held[s] = u
        else:
            queue.append(u)
    return held


def test_stable_matching_vs_sequential_gs(spark):
    users, S, pref, ah = _fixture_prefs()
    held = sequential_gs(users, S, pref, ah)
    exp = {s: (u, pref[u].index(s) + 1) for s, u in held.items()}
    got = {r["slot"]: (r["user"], r["proposer_rank"])
           for r in em.q_stable_matching(spark, SF).collect()}
    assert got == exp
    assert len(got) == S  # proposers > slots ⇒ all slots fill
    # stability: no blocking pair (u prefers s to his outcome AND s
    # prefers u to her holder)
    match_of = {u: s for s, (u, _) in got.items()}
    for u in users:
        rank_limit = (pref[u].index(match_of[u])
                      if u in match_of else S)
        for s in pref[u][:rank_limit]:
            holder = got[s][0]
            assert ah[(s, holder)] < ah[(s, u)], (u, s)


def brute_ransac(pts_by_gid, tol):
    out = {}
    for gid, pts in pts_by_gid.items():
        order = sorted(range(len(pts)),
                       key=lambda k: (_h60(f"rs{SEP}{pts[k][0]}"),
                                      pts[k][0]))
        cands = []
        for t in range(len(order) // 2):
            i, j = order[2 * t], order[2 * t + 1]
            (px, py), (qx, qy) = pts[i][1:], pts[j][1:]
            if (px, py) == (qx, qy):
                continue
            n = 0
            l2 = (qx - px) ** 2 + (qy - py) ** 2
            for _, rx, ry in pts:
                cr = (qx - px) * (ry - py) - (qy - py) * (rx - px)
                if cr * cr <= tol * tol * l2:
                    n += 1
            cands.append((t + 1, n))
        best = max(cands, key=lambda c: (c[1], -c[0]))
        out[gid] = (best[0], best[1], len(pts))
    return out


def test_ransac_line_vs_brute(spark):
    from geobuf_spark.sources import minted
    rows = minted.minted_cluster_points_q(spark, SF).collect()
    groups = {}
    for r in rows:
        groups.setdefault(r["doc_id"] % minted.N_CLUSTERS, []).append(
            (r["doc_id"], r["qx"], r["qy"]))
    exp = brute_ransac(groups, em.RS_TOL)
    got = {r["gid"]: (r["cand_t"], r["n_inliers"], r["n_pts"])
           for r in em.q_ransac_line(spark, SF).collect()}
    assert got == exp
    for t, n, npts in got.values():
        assert 2 <= n <= npts  # the model pair itself is always inlier
    assert any(n > 2 for _, n, _ in got.values())  # real structure
