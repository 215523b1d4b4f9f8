"""Batch-13 operators: adaptive (mixed-level) covering, decay heatmap,
co-citation pairs."""

from pyspark.sql import functions as F

from geobuf_spark.operators import tiling


def _brute_cover(box, z_min, z_max, span_bits=32):
    """Reference recursion: returns {(z, cx, cy, is_full)}."""
    x1, y1, x2, y2 = box
    out = set()

    def rec(z, cx, cy):
        c = 1 << (span_bits - z)
        bx1, by1, bx2, by2 = cx * c, cy * c, (cx + 1) * c, (cy + 1) * c
        if bx1 >= x2 or bx2 <= x1 or by1 >= y2 or by2 <= y1:
            return
        if bx1 >= x1 and bx2 <= x2 and by1 >= y1 and by2 <= y2:
            out.add((z, cx, cy, 1))
            return
        if z == z_max:
            out.add((z, cx, cy, 0))
            return
        for dx in (0, 1):
            for dy in (0, 1):
                rec(z + 1, cx * 2 + dx, cy * 2 + dy)

    c0 = 1 << (span_bits - z_min)
    for cx in range(x1 // c0, (x2 - 1) // c0 + 1):
        for cy in range(y1 // c0, (y2 - 1) // c0 + 1):
            rec(z_min, cx, cy)
    return out


def test_adaptive_cover_vs_brute(spark):
    boxes = [
        # cell-aligned at z=5 (2^27): pure full cells, no boundary
        (1, 1 << 27, 1 << 27, 3 << 27, 2 << 27),
        # generic unaligned box spanning several seed cells
        (2, 123_456_789, 987_654_321, 700_000_000, 1_400_000_000),
        # tiny box strictly inside one leaf cell
        (3, 50_000_000, 50_000_000, 50_000_100, 50_000_200),
    ]
    df = spark.createDataFrame(boxes, ["poly_id", "x1", "y1", "x2", "y2"])
    got = {}
    for r in tiling.adaptive_cover(df, z_min=4, z_max=8).collect():
        got.setdefault(r["poly_id"], set()).add(
            (r["z"], r["cx"], r["cy"], r["is_full"]))
    for pid, *box in boxes:
        assert got[pid] == _brute_cover(tuple(box), 4, 8), pid
    # aligned box produced ONLY full cells
    assert all(f == 1 for (_, _, _, f) in got[1])
    # tiny box: a single partial leaf
    assert got[3] == {(8, 50_000_000 >> 24, 50_000_000 >> 24, 0)}


def test_adaptive_cover_partition_property(spark):
    """Full cells at all levels + partial leaves exactly tile the cover:
    Σ full-cell areas + Σ (leaf ∩ box) areas == box area, and no two
    emitted full cells overlap (disjointness via area accounting)."""
    box = (7, 123_456_789, 987_654_321, 700_000_000, 1_400_000_000)
    df = spark.createDataFrame([box], ["poly_id", "x1", "y1", "x2", "y2"])
    rows = tiling.adaptive_cover(df, z_min=4, z_max=8).collect()
    _, x1, y1, x2, y2 = box
    total = 0
    for r in rows:
        c = 1 << (32 - r["z"])
        bx1, by1 = r["cx"] * c, r["cy"] * c
        bx2, by2 = bx1 + c, by1 + c
        if r["is_full"]:
            assert x1 <= bx1 and bx2 <= x2 and y1 <= by1 and by2 <= y2
            total += c * c
        else:
            w = min(x2, bx2) - max(x1, bx1)
            h = min(y2, by2) - max(y1, by1)
            assert w > 0 and h > 0
            total += w * h
    assert total == (x2 - x1) * (y2 - y1)


def test_adaptive_cover_no_shuffle(spark):
    df = spark.createDataFrame(
        [(1, 100, 100, 900_000_000, 900_000_000)],
        ["poly_id", "x1", "y1", "x2", "y2"])
    plan = tiling.adaptive_cover(df, 4, 8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_tile_heat_decay_weights_are_dyadic(spark):
    import __spark_entry__ as em

    rows = em.q_tile_heat_decay(spark, "/root/testdata/sf0.001").collect()
    assert sum(r["n_pages"] for r in rows) == 2000
    for r in rows:
        # heat is a sum of 2^-k (k ≤ 10): scaled by 2^10 it must be an
        # exact integer — the property that makes the oracle exact
        scaled = r["heat"] * 1024
        assert scaled == int(scaled)
        assert 0 < r["heat"] <= r["n_pages"]


def test_cocitation_pairs_symmetric_brute(spark):
    import __spark_entry__ as em

    got = {(r["host_a"], r["host_b"]): r["n_common"] for r in
           em.q_cocitation_pairs(spark, "/root/testdata/sf0.001").collect()}
    edges = em._page_link_edges(spark, 2000).select(
        "src_host",
        F.parse_url(F.col("dst"), F.lit("HOST")).alias("dst_host")).collect()
    outs = {}
    for r in edges:
        if r["src_host"] != r["dst_host"]:
            outs.setdefault(r["src_host"], set()).add(r["dst_host"])
    brute = {}
    for s, hs in outs.items():
        hs = sorted(hs)
        for i in range(len(hs)):
            for j in range(i + 1, len(hs)):
                brute[(hs[i], hs[j])] = brute.get((hs[i], hs[j]), 0) + 1
    brute = {k: v for k, v in brute.items() if v >= 2}
    assert brute, "fixture must produce co-cited pairs"
    assert got == brute
