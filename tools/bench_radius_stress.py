"""Radius-self-join (distance join) stress harness: big-N legs proving the
grid-bucketed pair join holds far past the 500-point driver fixture, plus
a two-parallelism scaling mode for the north-rule evidence set.

The clustered minting keeps the per-point pair degree roughly constant as
N grows (n_clusters scales with N), so output pairs grow ~linearly and the
leg measures the join machinery, not a quadratic blowup.

Legs (min-of-`trials` in ONE session, per-trial loadavg recorded):
  radius  — cluster_points_from(range(N)) → radius_self_join(r) → count.
            Plan: ×9 probe fan-out, one equi-join shuffle pair, integer
            d² refine. The count forces full pair materialization.

Usage: python tools/bench_radius_stress.py [n_points] [trials]
       python tools/bench_radius_stress.py --scaling [n_points] [trials]
Defaults: 5_000_000 points (2_000_000 in --scaling mode), 3 trials.
`--scaling` times the identical leg at local[8] and local[32] on the same
input and reports throughput at both plus efficiency — the distance join
is a fan-out→shuffle→refine shape unlike the map-dominated flagship and
the explode→agg boilerplate samples.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

RADIUS = 9_000_000

SCALING = "--scaling" in sys.argv
_pos = [a for a in sys.argv[1:] if a != "--scaling"]
N_POINTS = int(_pos[0]) if _pos else (2_000_000 if SCALING else 5_000_000)
TRIALS = int(_pos[1]) if len(_pos) > 1 else 3
# ~40 points per cluster box keeps E[pairs] ≈ 4 per point at r=9e6
N_CLUSTERS = max(37, N_POINTS // 40)


# ceiling control + loadavg come from bench.py (repo root is on sys.path)
# so the busy-loop calibration has ONE home
from bench import _raw_cpu_speedup as raw_cpu_speedup  # noqa: E402
from bench import loadavg1  # noqa: E402


def _leg(spark) -> int:
    from pyspark.sql import functions as F

    from geobuf_spark.operators import spatial_join as sj
    from geobuf_spark.sources import minted

    pts = minted.cluster_points_from(
        spark.range(N_POINTS).select(F.col("id").alias("doc_id")),
        n_clusters=N_CLUSTERS)
    return sj.radius_self_join(pts, r=RADIUS).count()


def scaling() -> int:
    from geobuf_spark.session import get_spark

    def run_at(cores: int) -> float:
        # the join OUTPUT is ~100× its shuffle input, so AQE's byte-based
        # coalescing (sized on map output) would starve the heavy probe
        # stage of tasks — keep partitions fine-grained per core
        spark = get_spark(
            f"radius_scaling_{cores}", cores=cores,
            shuffle_partitions=cores * 8,
            extra={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"})
        spark.sparkContext.setLogLevel("ERROR")
        try:
            _leg(spark)  # warmup
            walls = []
            for t in range(TRIALS):
                t0 = time.monotonic()
                n = _leg(spark)
                walls.append(time.monotonic() - t0)
                print(f"local[{cores}] trial {t}: {walls[-1]:.2f}s "
                      f"(pairs={n}, loadavg {loadavg1()})", file=sys.stderr)
            return min(walls)
        finally:
            spark.stop()

    import os
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
    ceiling = raw_cpu_speedup(n, 4 * n)
    lo, hi = run_at(n), run_at(4 * n)
    speedup = lo / hi
    print(json.dumps({
        "metric": f"scaling efficiency local[{n}]→local[{4 * n}], radius "
                  "self-join fan-out→shuffle→refine leg",
        "n_points": N_POINTS, "radius": RADIUS, "trials": TRIALS,
        f"local{n}_sec": round(lo, 2), f"local{4 * n}_sec": round(hi, 2),
        f"local{n}_points_per_sec": round(N_POINTS / lo),
        f"local{4 * n}_points_per_sec": round(N_POINTS / hi),
        "speedup": round(speedup, 3), "efficiency": round(speedup / 4.0, 4),
        "raw_cpu_ceiling_speedup": round(ceiling, 3),
        "efficiency_vs_host_ceiling": round(speedup / min(4.0, ceiling), 4),
    }))
    return 0


def main() -> int:
    from geobuf_spark.session import get_spark

    if SCALING:
        return scaling()

    spark = get_spark("bench_radius_stress", cores=32,
                      extra={"spark.driver.memory": "48g"})
    spark.sparkContext.setLogLevel("ERROR")
    _leg(spark)  # warmup
    walls, loads, n_pairs = [], [], 0
    for t in range(TRIALS):
        loads.append(loadavg1())
        t0 = time.monotonic()
        n_pairs = _leg(spark)
        walls.append(round(time.monotonic() - t0, 2))
        print(f"radius trial {t}: {walls[-1]}s (loadavg {loads[-1]})",
              file=sys.stderr)
    best = min(walls)
    print(json.dumps({
        "n_points": N_POINTS, "n_clusters": N_CLUSTERS, "radius": RADIUS,
        "trials": TRIALS, "walls_sec": walls, "loadavg": loads,
        "min_sec": best, "points_per_sec": round(N_POINTS / best),
        "n_pairs": n_pairs,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
