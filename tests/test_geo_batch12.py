"""Batch-12 geo operators: areal interpolation, quadtree fit-level,
trajectory steps."""

import hashlib

from pyspark.sql import functions as F

from geobuf_spark.operators import spatial_join as sj

SF = "/root/testdata/sf0.001"


def test_rect_cell_weights_partition_of_unity(spark):
    rows = [
        # exactly one cell
        (1, 10, 10, 90, 90),
        # spans 2x2 cells of size 100
        (2, 50, 50, 150, 150),
        # cell-aligned box
        (3, 0, 0, 200, 100),
    ]
    df = spark.createDataFrame(rows, ["poly_id", "x1", "y1", "x2", "y2"])
    out = sj.rect_cell_weights(df, cell=100).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["poly_id"], []).append(r)
    # overlap areas tile the rectangle exactly
    assert sum(r["overlap_area"] for r in by_id[1]) == 80 * 80
    assert sum(r["overlap_area"] for r in by_id[2]) == 100 * 100
    assert sum(r["overlap_area"] for r in by_id[3]) == 200 * 100
    assert len(by_id[1]) == 1 and by_id[1][0]["weight_ppm"] == 1_000_000
    assert len(by_id[2]) == 4
    # floored ppm weights sum to 1e6 within one ulp per cell
    s = sum(r["weight_ppm"] for r in by_id[2])
    assert 1_000_000 - 4 <= s <= 1_000_000
    # the 2x2 split of rect 2 is symmetric: all four quarters equal
    assert len({r["overlap_area"] for r in by_id[2]}) == 1


def test_quadtree_assign_is_max_fitting_level(spark):
    import __spark_entry__ as em
    from geobuf_spark.functions import tiles
    from geobuf_spark.sources import minted

    out = {r["poly_id"]: r for r in
           em.q_quadtree_assign(spark, SF).collect()}
    r = minted.minted_rects(spark, SF)
    corners = r.select(
        "poly_id",
        tiles.tile_x(F.col("minx"), 8).alias("xa"),
        tiles.tile_x(F.col("maxx"), 8).alias("xb"),
        tiles.tile_y(F.col("maxy"), 8).alias("ya"),
        tiles.tile_y(F.col("miny"), 8).alias("yb")).collect()
    assert len(corners) == len(out)
    for c in corners:
        z = out[c["poly_id"]]["z_fit"]

        def fits(zz):
            s = 1 << (8 - zz)
            return (c["xa"] // s == c["xb"] // s
                    and c["ya"] // s == c["yb"] // s)

        assert fits(z), c
        if z < 8:
            assert not fits(z + 1), c
        # the reported tile is the minx/maxy corner's ancestor at z_fit
        assert out[c["poly_id"]]["qx"] == c["xa"] // (1 << (8 - z))
        assert out[c["poly_id"]]["qy"] == c["ya"] // (1 << (8 - z))


def _hash60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_traj_steps_vs_python_brute(spark):
    import __spark_entry__ as em

    out = {r["user_id"]: r for r in em.q_traj_steps(spark, SF).collect()}
    ev = (spark.read.parquet(f"{SF}/events.parquet")
          .select("user_id", "ts", "event_id").collect())
    traj = {}
    for r in ev:
        px = _hash60(f"tx{r['event_id']}") % 2_000_001 - 1_000_000
        py = _hash60(f"ty{r['event_id']}") % 2_000_001 - 1_000_000
        traj.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], px, py))
    assert set(traj) == set(out)
    for u, pts in traj.items():
        pts.sort()
        steps = [(b[2] - a[2]) ** 2 + (b[3] - a[3]) ** 2
                 for a, b in zip(pts, pts[1:])]
        assert out[u]["n_steps"] == len(steps)
        assert out[u]["sum_step_d2"] == sum(steps)
        assert out[u]["max_step_d2"] == (max(steps) if steps else 0)
        net = (pts[-1][2] - pts[0][2]) ** 2 + (pts[-1][3] - pts[0][3]) ** 2
        assert out[u]["net_d2"] == net
