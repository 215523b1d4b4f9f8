"""S2-lite cell index vs Python oracle; temporal operators vs brute force."""

import math

import pytest
from pyspark.sql import functions as F

from geobuf_spark.functions import cells
from geobuf_spark.operators import temporal
from geobuf_spark.sources import minted


def py_s2_cell(lon, lat, level):
    rl, rp = math.radians(lon), math.radians(lat)
    x, y, z = math.cos(rp) * math.cos(rl), math.cos(rp) * math.sin(rl), math.sin(rp)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        f = 0 if x >= 0 else 3
    elif ay >= az:
        f = 1 if y >= 0 else 4
    else:
        f = 2 if z >= 0 else 5
    u, v = {
        0: (y / x, z / x), 1: (-x / y, z / y), 2: (-x / z, -y / z),
        3: (z / -x, y / -x), 4: (z / -y, x / -y), 5: (-y / -z, -x / -z),
    }[f]
    n = 1 << level
    i = min(max(int(math.floor((u + 1) / 2 * n)), 0), n - 1)
    j = min(max(int(math.floor((v + 1) / 2 * n)), 0), n - 1)
    return (f * n + i) * n + j


@pytest.mark.parametrize("level", [0, 3, 8, 14])
def test_s2_cell_matches_python_oracle(spark, sf_small, level):
    pts = minted.minted_points(spark, sf_small).limit(300)
    rows = pts.withColumn("cell", cells.s2_cell(F.col("lon"), F.col("lat"), level)).collect()
    for r in rows:
        assert r.cell == py_s2_cell(r.lon, r.lat, level), (r.lon, r.lat, level)


def test_s2_parent_consistency(spark, sf_small):
    pts = minted.minted_points(spark, sf_small).limit(300)
    rows = pts.select(
        cells.s2_parent(cells.s2_cell(F.col("lon"), F.col("lat"), 9), 9).alias("p"),
        cells.s2_cell(F.col("lon"), F.col("lat"), 8).alias("direct"),
    ).collect()
    for r in rows:
        assert r.p == r.direct


def test_s2_faces_cover_globe(spark):
    pts = spark.createDataFrame(
        [(0.0, 0.0), (90.0, 0.0), (180.0, 0.0), (-90.0, 0.0), (0.0, 89.0), (0.0, -89.0)],
        "lon double, lat double",
    )
    got = [r.f for r in pts.select(cells.s2_face(F.col("lon"), F.col("lat")).alias("f")).collect()]
    assert got == [0, 1, 3, 4, 2, 5]


def test_asof_join_vs_bruteforce(spark, sf_small):
    ev = spark.read.parquet(f"{sf_small}/events.parquet") \
        .withColumn("ep", F.floor(F.unix_timestamp("ts")).cast("bigint"))
    left = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ep")
    right = ev.filter(F.col("event_type") == "signup") \
        .groupBy("user_id", "ep").agg(F.max("event_id").alias("sid"))
    got = {(r.event_id, r.sid) for r in temporal.asof_join(
        left, right, key="user_id", ts="ep", right_cols=["sid"]).collect()}

    rights = {}
    for r in right.collect():
        rights.setdefault(r.user_id, []).append((r.ep, r.sid))
    want = set()
    for r in left.collect():
        cands = [(ep, sid) for ep, sid in rights.get(r.user_id, []) if ep <= r.ep]
        want.add((r.event_id, max(cands)[1] if cands else None))
    assert got == want


def test_range_bucket_join_vs_bruteforce(spark, sf_small):
    ev = spark.read.parquet(f"{sf_small}/events.parquet") \
        .withColumn("ep", F.floor(F.unix_timestamp("ts")).cast("bigint"))
    left = ev.select("event_id", "user_id", "ep").limit(300)
    # intervals: per user, sessions of [ep, ep+3600] around signups
    right = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ep").alias("lo"), (F.col("ep") + 3600).alias("hi"),
        F.col("event_id").alias("interval_id"),
    )
    got = {(r.event_id, r.interval_id) for r in temporal.range_bucket_join(
        left, right, key="user_id", ts="ep", lo="lo", hi="hi", bucket=600).collect()}
    rs = right.collect()
    want = set()
    for l in left.collect():
        for r in rs:
            if r.user_id == l.user_id and r.lo <= l.ep <= r.hi:
                want.add((l.event_id, r.interval_id))
    assert got == want
    assert want  # non-vacuous


def test_asof_join_null_payload_not_backfilled(spark):
    """the as-of match's genuine NULL column must stay NULL (DuckDB ASOF
    semantics) — not be back-filled from an older row."""
    left = spark.createDataFrame([(1, 6)], "k bigint, t bigint")
    right = spark.createDataFrame(
        [(1, 3, 7, 2), (1, 5, None, 9)], "k bigint, t bigint, c1 int, c2 int")
    out = temporal.asof_join(left, right, key="k", ts="t", right_cols=["c1", "c2"]).collect()
    assert out[0].c1 is None and out[0].c2 == 9

    # duplicate output names are rejected loudly
    import pytest as _pt
    bad_left = spark.createDataFrame([(1, 6, 0)], "k bigint, t bigint, c1 int")
    with _pt.raises(ValueError, match="collide"):
        temporal.asof_join(bad_left, right, key="k", ts="t", right_cols=["c1"])
