"""Skew study: planted hot cell, broadcast vs AQE-shuffle vs planner-salted.

Reconstructs the r1 ad-hoc study as a committed harness (VERDICT r2 #6):
4M probe points with 60% of mass planted inside one z=7 cell, joined to
the sf0.1 minted rectangles. The salted row derives k from
`plans.strategy.plan_salt` over the probe histogram (the r2 static k=16
replicated the build side 16x and lost 5x to AQE); with the planner
bounding replication at ceil(hot/target), salting stays within the same
regime as the plain shuffle instead of being k-fold slower.

Usage: python tools/bench_skew.py [sf_dir]   (min-of-2 warm, one session)
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from geobuf_spark.functions import tiles
from geobuf_spark.operators import spatial_join as sj
from geobuf_spark.plans import strategy as strat
from geobuf_spark.sources import minted

HOT_Z = 7
N_PROBE = 4_000_000
HOT_FRAC = 0.6


def planted_points(spark):
    """(doc_id, lon, lat): HOT_FRAC of rows land in one z=7 cell, the rest
    spread uniformly — deterministic, no RNG (Date/rand are banned in
    driver-visible paths and the study must be re-runnable bit-for-bit)."""
    n_hot = int(N_PROBE * HOT_FRAC)
    base = spark.range(N_PROBE).withColumnRenamed("id", "doc_id")
    # hot cell: z7 tile (70, 50) → lon [16.875, 19.6875), lat ~[21.9, 24.5)
    import math
    n = float(1 << HOT_Z)
    west, east = 70 * 360.0 / n - 180.0, 71 * 360.0 / n - 180.0
    south = math.degrees(math.atan(math.sinh(math.pi * (1 - 2.0 * 51 / n))))
    north = math.degrees(math.atan(math.sinh(math.pi * (1 - 2.0 * 50 / n))))
    # shrink 1% from the edges so every planted row snaps inside the tile
    west, east = west + 0.01 * (east - west), east - 0.01 * (east - west)
    south, north = south + 0.01 * (north - south), north - 0.01 * (north - south)
    frac = (F.col("doc_id") * 2654435761 % 1_000_003) / 1_000_003.0
    frac2 = (F.col("doc_id") * 40503 % 999_983) / 999_983.0
    hot = F.col("doc_id") < n_hot
    lon = F.when(hot, west + frac * (east - west)).otherwise(-180.0 + frac * 360.0)
    lat = F.when(hot, south + frac2 * (north - south)).otherwise(-85.0 + frac2 * 170.0)
    return base.select("doc_id", lon.alias("lon"), lat.alias("lat"))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    pts = planted_points(spark).localCheckpoint()   # build once, time joins only
    rects = minted.minted_rects(spark, sf).localCheckpoint()

    hist = strat.cell_histogram(pts, HOT_Z)
    hot = hist.agg(F.max("n")).first()[0]
    k = strat.plan_salt(hot)
    print(f"probe={N_PROBE} hot_cell_rows={hot} plan_salt k={k}", file=sys.stderr)

    results, counts = {}, {}
    # salt=k passes the planner's already-computed choice into the timed
    # region; salt=None would recompute the 4M-row cell histogram inside
    # every salted trial, a cost the broadcast/shuffle legs never pay
    for name, kwargs in [("broadcast", dict(strategy="broadcast")),
                         ("shuffle_aqe", dict(strategy="shuffle")),
                         ("salted_planner", dict(strategy="salted", salt=int(k)))]:
        walls = []
        for _ in range(2):
            t0 = time.monotonic()
            cnt = sj.pip_join(pts, rects, z=HOT_Z, **kwargs).count()
            walls.append(time.monotonic() - t0)
        results[name] = round(min(walls), 2)
        counts[name] = cnt
    assert len(set(counts.values())) == 1, counts
    print(json.dumps({"rows": counts["broadcast"], "hot_rows": int(hot),
                      "plan_salt_k": int(k), "wall_sec": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
