"""Line-level (corpus-hygiene) family stress harness: big-N legs for the
batch-3/4 webtext operators, proving the shapes hold past the toy 2k-page
driver fixtures.

Legs (each min-of-`trials` in ONE session, per-trial loadavg recorded):
  line_clean   — with_body → first-occurrence line filter (zero-shuffle
                 array exprs) → md5 witness → global count+sum reduce.
  boilerplate  — with_body → explode lines → hash agg keyed on md5(line)
                 (the narrow-key form the query docstring prescribes at
                 scale; the 2k-row driver query keys on the string so the
                 value hash pins bytes) → count lines with n_docs >= 20.
  owner        — explode lines → min(struct(ts, page_id)) + count per
                 md5(line): the map-side-combinable attribution shuffle.

Usage: python tools/bench_lines_stress.py [n_pages] [trials]
       python tools/bench_lines_stress.py --scaling [n_pages] [trials]
Defaults: 10_000_000 pages (2_000_000 in --scaling mode — the local[2]
leg would otherwise run for ~10 min per trial), 3 trials. `--scaling`
times the
SHUFFLE-HEAVY boilerplate leg at local[2] and local[8] on the same
input and reports throughput + efficiency — the flagship scaling sample
in bench.py is map-dominated, so this is the complementary north-rule
evidence point for an explode→shuffle→agg shape.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

SCALING = "--scaling" in sys.argv
_pos = [a for a in sys.argv[1:] if a != "--scaling"]
N_PAGES = int(_pos[0]) if _pos else (2_000_000 if SCALING else 10_000_000)
TRIALS = int(_pos[1]) if len(_pos) > 1 else 3


def loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def scaling() -> int:
    from geobuf_spark.session import get_spark
    from geobuf_spark.sources import pages

    def run_at(cores: int) -> float:
        spark = get_spark(f"lines_scaling_{cores}", cores=cores,
                          shuffle_partitions=max(cores, 16))
        spark.sparkContext.setLogLevel("ERROR")
        try:
            def leg():
                lines = pages.with_body(pages.pages(spark, N_PAGES)).select(
                    "page_id", F.explode(F.split("body", "\n")).alias("line"))
                return (lines.groupBy(F.md5("line").alias("k"))
                        .agg(F.countDistinct("page_id").alias("n_docs"))
                        .where(F.col("n_docs") >= 20).count())
            leg()  # warmup
            walls = []
            for t in range(TRIALS):
                t0 = time.monotonic()
                n = leg()
                walls.append(time.monotonic() - t0)
                print(f"local[{cores}] trial {t}: {walls[-1]:.2f}s "
                      f"(n_out={n}, loadavg {loadavg1()})", file=sys.stderr)
            return min(walls)
        finally:
            spark.stop()

    lo, hi = run_at(2), run_at(8)
    speedup = lo / hi
    print(json.dumps({
        "metric": "scaling efficiency local[2]→local[8], boilerplate "
                  "explode→shuffle→agg leg",
        "n_pages": N_PAGES, "trials": TRIALS,
        "local2_sec": round(lo, 2), "local8_sec": round(hi, 2),
        "local2_pages_per_sec": round(N_PAGES / lo),
        "local8_pages_per_sec": round(N_PAGES / hi),
        "speedup": round(speedup, 3), "efficiency": round(speedup / 4.0, 4),
    }))
    return 0


def main() -> int:
    from geobuf_spark.session import get_spark
    from geobuf_spark.sources import pages

    if SCALING:
        return scaling()

    spark = get_spark("bench_lines_stress", cores=32,
                      extra={"spark.driver.memory": "48g"})
    spark.sparkContext.setLogLevel("ERROR")

    def body_df():
        return pages.with_body(pages.pages(spark, N_PAGES))

    def leg_line_clean():
        from geobuf_spark.functions.text import first_occurrence_lines
        kept = first_occurrence_lines(F.col("body"))
        out = body_df().select(
            F.size(kept).alias("n_kept"),
            F.md5(F.array_join(kept, "\n")).alias("clean_md5"))
        r = out.agg(F.count("*"), F.sum("n_kept"),
                    F.min("clean_md5")).collect()[0]
        return int(r[0])

    def leg_boilerplate():
        lines = body_df().select(
            "page_id", F.explode(F.split("body", "\n")).alias("line"))
        agg = (lines.groupBy(F.md5("line").alias("k"))
               .agg(F.countDistinct("page_id").alias("n_docs"))
               .where(F.col("n_docs") >= 20))
        return agg.count()

    def leg_owner():
        lines = body_df().select(
            "page_id", F.unix_timestamp("warc_ts").alias("ts"),
            F.explode(F.split("body", "\n")).alias("line"))
        own = (lines.groupBy(F.md5("line").alias("k"))
               .agg(F.min(F.struct("ts", "page_id")).alias("o"),
                    F.count("*").alias("n")))
        r = own.agg(F.count("*"), F.sum("n")).collect()[0]
        return int(r[0])

    out = {"n_pages": N_PAGES, "trials": TRIALS, "legs": {}}
    for name, fn in [("line_clean", leg_line_clean),
                     ("boilerplate", leg_boilerplate),
                     ("owner", leg_owner)]:
        fn()  # warmup: codegen + shuffle services
        walls, loads, n_out = [], [], 0
        for t in range(TRIALS):
            loads.append(loadavg1())
            t0 = time.monotonic()
            n_out = fn()
            walls.append(round(time.monotonic() - t0, 2))
            print(f"{name} trial {t}: {walls[-1]}s (loadavg {loads[-1]})",
                  file=sys.stderr)
        best = min(walls)
        out["legs"][name] = {
            "walls_sec": walls, "loadavg": loads, "min_sec": best,
            "pages_per_sec": round(N_PAGES / best), "n_out": n_out,
        }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
