"""Window/sort-regime stress harness: the fourth scaling-shape sample.

The committed scaling evidence covers map-dominated (flagship),
explode→shuffle→agg (boilerplate), and join-amplified (radius) regimes;
this leg measures the SORT-heavy one — per-entity ordered window
functions (the traj_steps / scd2_history shape): one hash exchange on the
entity key, a per-partition sort, stacked lag/first/last windows sharing
that sort, then a rollup that reuses the partitioning.

A single-box caveat this harness measures EXPLICITLY: a window leg is
shuffle-dominated (the per-row compute is trivial), and local-mode's
shuffle medium — one JVM writing/fetching through one memory bus and one
page cache — is nearly FLAT across core counts, unlike a cluster where
every added node brings its own disks and NIC. So alongside the raw-CPU
ceiling control the scaling mode times a PURE-REPARTITION control (the
fastest any shuffle-bound job can go on this box at each level) and
reports the window leg's efficiency against both. Shuffle dirs go to
tmpfs with compression off — measured 1.27x over the disk default —
so the medium control is as good as this box gives.

Legs (min-of-`trials` in ONE session, per-trial loadavg recorded):
  window — range(N) → minted (entity, ts, px, py) → lag window d² +
           unbounded first/last windows → per-entity rollup → bit_xor
           checksum (forces every window).

Usage: python tools/bench_window_stress.py [n_events] [trials]
       python tools/bench_window_stress.py --scaling [n_events] [trials]
Defaults: 40_000_000 events (20_000_000 in --scaling mode), 3 trials.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SCALING = "--scaling" in sys.argv
_pos = [a for a in sys.argv[1:] if a != "--scaling"]
N_EVENTS = int(_pos[0]) if _pos else (20_000_000 if SCALING else 40_000_000)
TRIALS = int(_pos[1]) if len(_pos) > 1 else 3
EVENTS_PER_ENTITY = 200
N_ENTITIES = max(16, N_EVENTS // EVENTS_PER_ENTITY)

from bench import _raw_cpu_speedup as raw_cpu_speedup  # noqa: E402
from bench import loadavg1  # noqa: E402


def _mint(spark):
    from pyspark.sql import functions as F

    def h(salt):
        return F.xxhash64(F.concat(F.lit(salt), F.col("id").cast("string")))

    return spark.range(N_EVENTS).select(
        (F.col("id") % N_ENTITIES).alias("u"),
        F.pmod(h("t"), F.lit(1 << 31)).alias("ts"),
        F.pmod(h("x"), F.lit(2_000_001)).alias("px"),
        F.pmod(h("y"), F.lit(2_000_001)).alias("py"))


def _leg(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = _mint(spark)
    w = Window.partitionBy("u").orderBy("ts", "px")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    d = e.select(
        "u",
        (F.col("px") - F.lag("px").over(w)).alias("dx"),
        (F.col("py") - F.lag("py").over(w)).alias("dy"),
        F.first("px").over(wf).alias("fx"),
        F.last("px").over(wf).alias("lx"))
    d2 = F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy")
    per = (d.select("u", d2.alias("d2"),
                    ((F.col("lx") - F.col("fx"))
                     * (F.col("lx") - F.col("fx"))).alias("net"))
           .groupBy("u")
           .agg(F.sum("d2").alias("s"), F.max("d2").alias("m"),
                F.min("net").alias("net")))
    row = per.agg(F.expr("bit_xor(s)").alias("cs"),
                  F.count("*").alias("n")).collect()[0]
    return int(row["n"]), int(row["cs"])


def scaling() -> int:
    import os

    from geobuf_spark.session import get_spark

    def run_at(cores: int):
        from pyspark.sql import functions as F

        spark = get_spark(
            f"window_scaling_{cores}", cores=cores,
            shuffle_partitions=cores * 4,
            extra={"spark.local.dir": "/dev/shm/spark-shuffle",
                   "spark.shuffle.compress": "false",
                   "spark.shuffle.spill.compress": "false"})
        spark.sparkContext.setLogLevel("ERROR")
        try:
            _leg(spark)  # warmup
            walls, ctrl = [], []
            e = _mint(spark)
            for t in range(TRIALS):
                t0 = time.monotonic()
                n, cs = _leg(spark)
                walls.append(time.monotonic() - t0)
                t0 = time.monotonic()
                e.repartition(cores * 4, "u") \
                    .agg(F.expr("bit_xor(px)")).collect()
                ctrl.append(time.monotonic() - t0)
                print(f"local[{cores}] trial {t}: {walls[-1]:.2f}s "
                      f"shuffle-only {ctrl[-1]:.2f}s "
                      f"(entities={n}, cs={cs}, loadavg {loadavg1()})",
                      file=sys.stderr)
            return min(walls), min(ctrl)
        finally:
            spark.stop()

    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
    ceiling = raw_cpu_speedup(n, 4 * n)
    lo, lo_sh = run_at(n)
    hi, hi_sh = run_at(4 * n)
    speedup = lo / hi
    shuffle_speedup = lo_sh / hi_sh
    # the leg's non-shuffle (sort + window + rollup) component at each
    # level, and the speedup a cluster-style medium (shuffle scaling with
    # nodes) would allow: compute scales, medium is the box's cap
    compute_speedup = (lo - lo_sh) / max(hi - hi_sh, 1e-9)
    print(json.dumps({
        "metric": f"scaling efficiency local[{n}]→local[{4 * n}], ordered "
                  "window (sort-heavy) leg",
        "n_events": N_EVENTS, "n_entities": N_ENTITIES, "trials": TRIALS,
        f"local{n}_sec": round(lo, 2), f"local{4 * n}_sec": round(hi, 2),
        f"local{n}_events_per_sec": round(N_EVENTS / lo),
        f"local{4 * n}_events_per_sec": round(N_EVENTS / hi),
        "speedup": round(speedup, 3), "efficiency": round(speedup / 4.0, 4),
        "raw_cpu_ceiling_speedup": round(ceiling, 3),
        f"shuffle_only_local{n}_sec": round(lo_sh, 2),
        f"shuffle_only_local{4 * n}_sec": round(hi_sh, 2),
        "shuffle_medium_speedup": round(shuffle_speedup, 3),
        "nonshuffle_compute_speedup": round(compute_speedup, 3),
        "efficiency_vs_host_ceiling": round(speedup / min(4.0, ceiling), 4),
    }))
    return 0


def main() -> int:
    from geobuf_spark.session import get_spark

    if SCALING:
        return scaling()

    spark = get_spark("bench_window_stress", cores=32,
                      extra={"spark.driver.memory": "48g"})
    spark.sparkContext.setLogLevel("ERROR")
    _leg(spark)  # warmup
    walls, loads, n = [], [], 0
    for t in range(TRIALS):
        loads.append(loadavg1())
        t0 = time.monotonic()
        n, _ = _leg(spark)
        walls.append(round(time.monotonic() - t0, 2))
        print(f"window trial {t}: {walls[-1]}s (loadavg {loads[-1]})",
              file=sys.stderr)
    best = min(walls)
    print(json.dumps({
        "n_events": N_EVENTS, "n_entities": N_ENTITIES, "trials": TRIALS,
        "walls_sec": walls, "loadavg": loads, "min_sec": best,
        "events_per_sec": round(N_EVENTS / best),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
