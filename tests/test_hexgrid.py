"""Hex binning: cube-round invariants, neighbor closure, numpy oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geobuf_spark.functions import hexgrid as H


def _np_hex_qr(lon, lat, s):
    qf = (np.sqrt(3) / 3 * lon - lat / 3) / s
    rf = (2.0 / 3.0 * lat) / s
    sf = -qf - rf
    q0, r0, s0 = np.floor(qf + 0.5), np.floor(rf + 0.5), np.floor(sf + 0.5)
    dq, dr, ds = np.abs(q0 - qf), np.abs(r0 - rf), np.abs(s0 - sf)
    big_q = (dq > dr) & (dq > ds)
    q = np.where(big_q, -r0 - s0, q0)
    r = np.where(~big_q & (dr > ds), -q - s0, r0)
    return q.astype(np.int64), r.astype(np.int64)


def test_hex_cell_matches_numpy_and_is_exact_partition(spark):
    rng = np.random.default_rng(9)
    lon = rng.uniform(-179, 179, 3000)
    lat = rng.uniform(-85, 85, 3000)
    df = spark.createDataFrame(
        [(i, float(lon[i]), float(lat[i])) for i in range(len(lon))],
        "i bigint, lon double, lat double")
    got = {r.i: r.cell for r in df.withColumn(
        "cell", H.hex_cell(F.col("lon"), F.col("lat"), 2.5)).collect()}
    q, r = _np_hex_qr(lon, lat, 2.5)
    want = (q + (1 << 20)) * (1 << 21) + (r + (1 << 20))
    assert all(got[i] == want[i] for i in range(len(lon)))


def test_hex_center_distance_bound(spark):
    """every point's assigned hex center is within one hex circumradius —
    the correctness property of cube rounding."""
    rng = np.random.default_rng(10)
    lon = rng.uniform(-50, 50, 2000)
    lat = rng.uniform(-50, 50, 2000)
    s = 3.0
    q, r = _np_hex_qr(lon, lat, s)
    # center of hex (q, r): x = s*sqrt(3)*(q + r/2), y = s*3/2*r
    cx = s * np.sqrt(3) * (q + r / 2.0)
    cy = s * 1.5 * r
    d = np.hypot(lon - cx, lat - cy)
    assert (d <= s + 1e-9).all(), d.max()


def test_hex_neighbors_cover_adjacent_points(spark):
    """points within one hex size of each other share a cell or are in
    each other's neighbor set (the radius-1 join guarantee)."""
    rng = np.random.default_rng(11)
    base = rng.uniform(-40, 40, (300, 2))
    jitter = base + rng.uniform(-1.2, 1.2, (300, 2))
    rows = [(i, float(base[i][0]), float(base[i][1]),
             float(jitter[i][0]), float(jitter[i][1])) for i in range(300)]
    df = spark.createDataFrame(rows, "i bigint, ax double, ay double, bx double, by double")
    s = 2.0
    out = df.select(
        "i",
        H.hex_cell(F.col("ax"), F.col("ay"), s).alias("ca"),
        H.hex_cell(F.col("bx"), F.col("by"), s).alias("cb"),
        H.hex_neighbors(H.hex_cell(F.col("ax"), F.col("ay"), s)).alias("na"),
    ).collect()
    for r in out:
        assert r.cb in r.na, r.i  # neighbor set includes own cell


def test_hex_sql_twin_matches(spark):
    import duckdb

    rng = np.random.default_rng(12)
    rows = [(i, float(rng.uniform(-179, 179)), float(rng.uniform(-85, 85)))
            for i in range(500)]
    df = spark.createDataFrame(rows, "i bigint, lon double, lat double")
    got = {r.i: r.cell for r in df.withColumn(
        "cell", H.hex_cell(F.col("lon"), F.col("lat"), 1.75)).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (i BIGINT, lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?, ?)", rows)
    want = dict(con.execute(
        f"SELECT i, {H.sql_hex_cell('lon', 'lat', 1.75)} FROM pts").fetchall())
    assert got == want


def test_hex_cover_superset(spark):
    """every point inside a bbox hex-maps into the exploded cover."""
    rng = np.random.default_rng(21)
    boxes = [(int(i), float(a := rng.uniform(-170, 160)), float(b := rng.uniform(-80, 70)),
              float(a + rng.uniform(0.1, 8)), float(b + rng.uniform(0.1, 8)))
             for i in range(40)]
    bdf = spark.createDataFrame(boxes, "box_id int, minx double, miny double, maxx double, maxy double")
    cover = {(r.box_id, r.hex) for r in H.explode_hex_cover(bdf, 2.0).collect()}
    pts = [(bid, float(rng.uniform(mnx, mxx)), float(rng.uniform(mny, mxy)))
           for bid, mnx, mny, mxx, mxy in boxes for _ in range(25)]
    pdf = spark.createDataFrame(pts, "box_id int, lon double, lat double") \
        .withColumn("hex", H.hex_cell(F.col("lon"), F.col("lat"), 2.0))
    for r in pdf.collect():
        assert (r.box_id, r.hex) in cover, (r.box_id, r.lon, r.lat)


def test_pip_join_hex_matches_tile_join(spark):
    from geobuf_spark.operators import spatial_join as sj
    from geobuf_spark.sources import minted

    sf = "/root/testdata/sf0.001"
    pts = minted.minted_points(spark, sf)
    rects = minted.minted_rects(spark, sf)
    want = {(r.doc_id, r.poly_id)
            for r in sj.pip_join(pts, rects, z=6).select("doc_id", "poly_id").collect()}
    got = {(r.doc_id, r.poly_id)
           for r in sj.pip_join_hex(pts, rects, size_deg=3.0).select("doc_id", "poly_id").collect()}
    assert got == want and len(want) > 0
