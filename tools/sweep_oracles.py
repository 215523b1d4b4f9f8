"""Full driver-contract sweep: run every `__spark_entry__.queries()` entry
against its `oracle_sql()` DuckDB twin and report rows/schema/value/dtype
matches — a local emulation of the external correctness driver.

Usage:  python tools/sweep_oracles.py [sf_dir] [name ...]
Defaults to /root/testdata/sf0.01 and all queries.

The driver's value hash is column-name-sorted and dtype-sensitive (a DuckDB
HUGEINT sum arriving as float64 hash-mismatches Spark's int64 even when the
values are equal), so this sweep flags dtype-kind differences as failures.
"""
from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(s: pd.DataFrame, o: pd.DataFrame) -> list[str]:
    probs = []
    if sorted(s.columns) != sorted(o.columns):
        return [f"schema: spark={sorted(s.columns)} oracle={sorted(o.columns)}"]
    if len(s) != len(o):
        probs.append(f"rows: spark={len(s)} oracle={len(o)}")
    s, o = norm(s), norm(o)
    for c in s.columns:
        sk, ok = s[c].dtype.kind, o[c].dtype.kind
        if sk != ok and {sk, ok} != {"i", "u"}:
            probs.append(f"dtype[{c}]: spark={s[c].dtype} oracle={o[c].dtype}")
            continue
        if len(s) != len(o):
            continue
        a, b = s[c].to_numpy(), o[c].to_numpy()
        if sk == "f":
            bad = ~(np.isclose(a.astype(float), b.astype(float),
                               rtol=0, atol=1e-9, equal_nan=True))
        else:
            bad = a.astype(str) != b.astype(str)
        if bad.any():
            i = int(np.argmax(bad))
            probs.append(f"values[{c}]: {int(bad.sum())} diff, first@{i}: "
                         f"spark={a[i]!r} oracle={b[i]!r}")
    return probs


def main() -> int:
    import pyspark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # the IVF oracle pins generation-time centroids from the parquet —
    # point it at the sf under test (the external driver compares at sf0.01,
    # which is the generator's default)
    import os
    os.environ["GEOBUF_ORACLE_SF_DIR"] = sf
    spark = (pyspark.sql.SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{sf}/{t}.parquet')")
    qs, os_ = em.queries(), em.oracle_sql()
    n_pass = n_fail = n_noracle = 0
    for i, (name, fn) in enumerate(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[{i:2d}] {name:28s} SPARK-ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in os_:
            print(f"[{i:2d}] {name:28s} no_oracle rows={len(sdf)} "
                  f"({time.time()-t0:.1f}s)")
            n_noracle += 1
            continue
        try:
            odf = con.execute(os_[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"[{i:2d}] {name:28s} ORACLE-ERROR {type(e).__name__}: {e}")
            n_fail += 1
            continue
        probs = compare(sdf, odf)
        if probs:
            n_fail += 1
            print(f"[{i:2d}] {name:28s} FAIL ({time.time()-t0:.1f}s)")
            for p in probs[:4]:
                print(f"       {p}")
        else:
            n_pass += 1
            print(f"[{i:2d}] {name:28s} ok rows={len(sdf)} "
                  f"({time.time()-t0:.1f}s)")
    print(f"\npass={n_pass} fail={n_fail} no_oracle={n_noracle}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
