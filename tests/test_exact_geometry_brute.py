"""Independent numpy brute-force oracles for the second-extension exact
geometry operators.

The driver/sweep verification runs the SAME formula in Spark and DuckDB —
a shared algorithmic mistake would pass both. These tests recompute each
result from first principles (O(n²) python/numpy) on sf0.001, so the
algorithm itself is checked, not just its twin-ness."""

import numpy as np
import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _walks(spark, stride):
    from geobuf_spark.sources import minted
    rows = minted.cluster_walk_lines_q(spark, SF, k=9, stride=stride).collect()
    return {r["doc_id"]: (np.array(r["xs_q"], dtype=np.int64),
                          np.array(r["ys_q"], dtype=np.int64)) for r in rows}


def _segments(walks):
    segs = []
    for d, (xs, ys) in walks.items():
        for i in range(8):
            segs.append((d, i, xs[i], ys[i], xs[i + 1], ys[i + 1]))
    return segs


def _cross(ox, oy, px, py, qx, qy):
    return int((px - ox) * (qy - oy) - (py - oy) * (qx - ox))


def _proper(a, b):
    _, _, ax1, ay1, ax2, ay2 = a
    _, _, bx1, by1, bx2, by2 = b
    d1 = _cross(bx1, by1, bx2, by2, ax1, ay1)
    d2 = _cross(bx1, by1, bx2, by2, ax2, ay2)
    d3 = _cross(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = _cross(ax1, ay1, ax2, ay2, bx2, by2)
    opp = lambda u, v: (u > 0 > v) or (u < 0 < v)  # noqa: E731
    return opp(d1, d2) and opp(d3, d4)


def test_segment_xing_join_matches_quadratic_brute(spark):
    got = {(r["doc_a"], r["doc_b"]): r["n_xings"]
           for r in em.q_segment_xing_join(spark, SF).collect()}
    segs = _segments(_walks(spark, stride=7))
    want = {}
    for i, a in enumerate(segs):
        for b in segs[i + 1:]:
            if a[0] == b[0]:
                continue
            if _proper(a, b):
                k = (min(a[0], b[0]), max(a[0], b[0]))
                want[k] = want.get(k, 0) + 1
    assert got == want


def test_hausdorff_pairs_matches_numpy_brute(spark):
    got = {(r["doc_a"], r["doc_b"]): r["hausdorff2"]
           for r in em.q_hausdorff_pairs(spark, SF).collect()}
    walks = _walks(spark, stride=1)
    # successor within cluster (doc_id % 37) in doc_id order
    by_cluster = {}
    for d in sorted(walks):
        by_cluster.setdefault(d % 37, []).append(d)
    want = {}
    for ds in by_cluster.values():
        for a, b in zip(ds, ds[1:]):
            ax, ay = walks[a]
            bx, by = walks[b]
            d2 = ((ax[:, None] - bx[None, :]) ** 2
                  + (ay[:, None] - by[None, :]) ** 2)
            want[(a, b)] = int(max(d2.min(axis=1).max(),
                                   d2.min(axis=0).max()))
    assert got == want


def test_union_area_rects_matches_interval_sweep(spark):
    row = em.q_union_area_rects(spark, SF).collect()[0]
    rects = [(r["x1"], r["y1"], r["x2"], r["y2"])
             for r in em._shifted_rects(spark, SF)
             .filter("poly_id % 5 = 0").collect()]
    xs = sorted({v for r in rects for v in (r[0], r[2])})
    area = 0
    for lo, hi in zip(xs, xs[1:]):
        ivs = sorted((r[1], r[3]) for r in rects if r[0] <= lo and r[2] >= hi)
        cov, cur_lo, cur_hi = 0, None, None
        for y1, y2 in ivs:
            if cur_lo is None:
                cur_lo, cur_hi = y1, y2
            elif y1 > cur_hi:
                cov += cur_hi - cur_lo
                cur_lo, cur_hi = y1, y2
            else:
                cur_hi = max(cur_hi, y2)
        if cur_lo is not None:
            cov += cur_hi - cur_lo
        area += (hi - lo) * cov
    assert row["union_area"] == area
    assert row["n_rects"] == len(rects)


def test_grid_line_density_conserves_total_length(spark):
    """Conservation invariant: the fixed-point per-cell sums must add up
    to the total polyline length — each piece is floored to 2^-20, so
    the defect is bounded by n_pieces quantization ulps."""
    rows = em.q_grid_line_density(spark, SF).collect()
    total_fp = sum(r["len_fp"] for r in rows)
    n_pieces = sum(r["n_pieces"] for r in rows)
    walks = _walks(spark, stride=3)
    exact = 0.0
    for xs, ys in walks.values():
        exact += float(np.sum(np.sqrt(np.diff(xs) ** 2.0
                                      + np.diff(ys) ** 2.0)))
    got = total_fp / (1 << 20)
    assert got <= exact + 1e-6
    assert got >= exact - n_pieces / (1 << 20) - 1e-6


def test_dbscan_core_matches_brute_neighbor_counts(spark):
    from geobuf_spark.sources import minted
    pts = {r["doc_id"]: (r["qx"], r["qy"])
           for r in minted.minted_cluster_points_q(spark, SF).collect()}
    got = {r["doc_id"]: (r["n_nbrs"], r["is_core"])
           for r in em.q_dbscan_core(spark, SF).collect()}
    ids = sorted(pts)
    # float64 on purpose: far-apart pairs overflow int64 squares, and
    # every near-threshold delta (≤ ~2·eps) squares exactly below 2^53
    arr = np.array([pts[i] for i in ids], dtype=np.float64)
    d2 = ((arr[:, None, 0] - arr[None, :, 0]) ** 2
          + (arr[:, None, 1] - arr[None, :, 1]) ** 2)
    eps2 = em.DBSCAN_EPS * em.DBSCAN_EPS
    for k, i in enumerate(ids):
        n = int(((d2[k] <= eps2).sum()) - 1)  # minus self
        assert got[i] == (n, n >= em.DBSCAN_MIN_NBRS), i


def test_skyline_matches_quadratic_dominance(spark):
    t = [(r["doc_id"], r["n_tok"], r["n_types"])
         for r in em.q_skyline_docs(spark, SF).collect()]
    from pyspark.sql import functions as F
    from geobuf_spark.sources.tables import widen  # noqa: F401
    d = (spark.read.parquet(f"{SF}/documents.parquet")
         .select("doc_id",
                 F.size(F.split("text", " ")).cast("bigint").alias("a"),
                 F.size(F.array_distinct(F.split("text", " ")))
                 .cast("bigint").alias("b")).collect())
    pts = [(r["doc_id"], r["a"], r["b"]) for r in d]
    want = []
    for i, x, y in pts:
        dominated = any((x2 >= x and y2 >= y and (x2 > x or y2 > y))
                        for _, x2, y2 in pts)
        if not dominated:
            want.append((i, x, y))
    assert sorted(t) == sorted(want)


def test_route_snap_matches_brute_nearest(spark):
    from geobuf_spark.sources import minted
    got = {r["doc_id"]: (r["seg_doc"], r["seg_i"], r["d2"])
           for r in em.q_route_snap_join(spark, SF).collect()}
    pts = {r["doc_id"]: (r["qx"], r["qy"])
           for r in minted.minted_cluster_points_q(spark, SF).collect()}
    segs = _segments(_walks(spark, stride=7))
    r2 = float(em.SNAP_R) * float(em.SNAP_R)
    want = {}
    for pid, (qx, qy) in pts.items():
        best = None
        for sd, si, ax, ay, bx, by in segs:
            if sd == pid:
                continue
            vx, vy = int(bx - ax), int(by - ay)
            wx, wy = int(qx - ax), int(qy - ay)
            l2 = vx * vx + vy * vy
            if l2 == 0:
                d2 = float(wx * wx + wy * wy)
            else:
                t = min(max(float(wx * vx + wy * vy) / l2, 0.0), 1.0)
                dx, dy = wx - t * vx, wy - t * vy
                d2 = dx * dx + dy * dy
            if d2 <= r2:
                k = (d2, sd, si)
                if best is None or k < best:
                    best = k
        if best is not None:
            want[pid] = (best[1], best[2], best[0])
    assert set(got) == set(want)
    for pid in want:
        assert got[pid][0] == want[pid][0] and got[pid][1] == want[pid][1]
        assert got[pid][2] == pytest.approx(want[pid][2], rel=0, abs=1e-6)
