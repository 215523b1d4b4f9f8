"""Batch-97 units: ear-clipping triangulation (independent python
replay + the area-conservation proof + crafted L-shape with a known
reflex vertex) and the feature-hash collision audit (hashlib brute +
pigeonhole bounds)."""
import hashlib

import pandas as pd

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"
SEP = "\x1e"


def _l_shape(cx, cy, hw, hh):
    x0, x1, x2 = cx - hw, cx, cx + hw
    y0, y1, y2 = cy - hh, cy, cy + hh
    return ([x0, x2, x2, x1, x1, x0], [y0, y0, y1, y1, y2, y2])


def clip_brute(xs, ys):
    xs, ys = list(xs), list(ys)
    tris = []
    while len(xs) >= 3:
        n = len(xs)
        found = None
        for j in range(n):
            p, c, q = (j - 1) % n, j, (j + 1) % n
            cr = ((xs[c] - xs[p]) * (ys[q] - ys[p])
                  - (ys[c] - ys[p]) * (xs[q] - xs[p]))
            if cr <= 0:
                continue
            ok = True
            for k in range(n):
                if k in (p, c, q):
                    continue
                ts = []
                for (a, b) in ((p, c), (c, q), (q, p)):
                    ts.append((xs[b] - xs[a]) * (ys[k] - ys[a])
                              - (ys[b] - ys[a]) * (xs[k] - xs[a]))
                if all(t >= 0 for t in ts):
                    ok = False
                    break
            if ok:
                found = (j, cr)
                break
        assert found is not None
        j, cr = found
        tris.append(abs(cr))
        del xs[j], ys[j]
    return tris


def shoelace2(xs, ys):
    n = len(xs)
    return abs(sum(xs[i] * ys[(i + 1) % n] - xs[(i + 1) % n] * ys[i]
                   for i in range(n)))


def test_ear_crafted_l_shape():
    xs, ys = _l_shape(0, 0, 4, 4)
    # the L has exactly one reflex vertex (the inner corner)
    n = len(xs)
    crosses = [((xs[j] - xs[j - 1]) * (ys[(j + 1) % n] - ys[j - 1])
                - (ys[j] - ys[j - 1]) * (xs[(j + 1) % n] - xs[j - 1]))
               for j in range(n)]
    assert sum(1 for c in crosses if c < 0) == 1
    tris = clip_brute(xs, ys)
    assert len(tris) == 4
    assert sum(tris) == shoelace2(xs, ys)


def test_ear_triangulate_vs_brute(spark):
    got = {r["poly_id"]: (r["n_vertices"], r["n_triangles"],
                          r["tri_area2_sum"], r["ring_area2"])
           for r in em.q_ear_triangulate(spark, SF).collect()}
    p = pd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey"])
    from geobuf_spark.sources.minted import (CX_MULT, CX_MOD, CY_MULT,
                                             CY_MOD)
    for pk in p["p_partkey"].astype(int):
        cx = (pk * CX_MULT) % CX_MOD - CX_MOD // 2
        cy = (pk * CY_MULT) % CY_MOD - CY_MOD // 2
        hw = 10_000_000 + (pk % 100) * 1_000_000
        hh = 8_000_000 + (pk % 80) * 1_000_000
        xs, ys = _l_shape(cx, cy, hw, hh)
        tris = clip_brute(xs, ys)
        exp = (6, len(tris), sum(tris), shoelace2(xs, ys))
        assert got[pk] == exp
        assert exp[2] == exp[3]  # conservation: Σ ears == ring area


def test_hash_collision_audit_vs_brute(spark):
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    e = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    spaces = {
        "tokens": {t for txt in d["text"] for t in txt.split(" ")},
        "users": {str(int(u)) for u in e["user_id"].unique()},
        "docs": {str(int(i)) for i in d["doc_id"]},
    }
    exp = {}
    for name, keys in spaces.items():
        buckets = {}
        for k in keys:
            b = int(hashlib.md5(f"fh{SEP}{k}".encode())
                    .hexdigest()[:15], 16) % em.FH_BUCKETS
            buckets[b] = buckets.get(b, 0) + 1
        exp[name] = (len(keys), len(buckets),
                     sum(n for n in buckets.values() if n > 1),
                     max(buckets.values()))
    got = {r["space"]: (r["n_keys"], r["n_used"], r["n_colliding"],
                        r["max_bucket"])
           for r in em.q_hash_collision_audit(spark, SF).collect()}
    assert got == exp
    for n_keys, n_used, n_coll, mx in got.values():
        assert n_used <= min(n_keys, em.FH_BUCKETS)
        assert mx >= -(-n_keys // em.FH_BUCKETS)  # pigeonhole
