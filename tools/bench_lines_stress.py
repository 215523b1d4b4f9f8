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
Defaults: 10_000_000 pages, 3 trials.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> int:
    from geobuf_spark.session import get_spark
    from geobuf_spark.sources import pages

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
