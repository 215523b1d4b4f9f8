"""Set reconciliation between two corpus snapshots via an Invertible
Bloom Lookup Table (IBLT) — diff two 10^12-row snapshots by exchanging
O(|diff|) state instead of O(n) rows.

Each key is folded into R=3 of C cells; a cell is (count, fp_xor,
chk_xor) where fp is the key's 60-bit fingerprint and chk a second hash
of the fingerprint. Side A inserts with sign +1, side B with −1, so
every key present in BOTH snapshots cancels exactly (count 0, xors 0) —
the aggregated table depends only on the symmetric difference. The table
is a constant-size, fully mergeable DataFrame aggregation (one shuffle of
C×R-cell partials, map-side combinable); decoding peels pure cells on
the driver — O(C), never data-sized.

The cell/fingerprint hashes are the portable md5 bridge
(functions/phash), so python (driver peel), Spark, and DuckDB agree
bit-for-bit. Classic IBLT decode succeeds w.h.p. while |diff| ≲ C/1.3
(Goodrich & Mitzenmacher 2011); failure is DETECTED, not silent — the
peel either empties every cell or reports ok=False.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geobuf_spark.functions import phash

R = 3  # cells per key


def _fp(key_col):
    return phash.hash60(F.concat(F.lit("fp:"), key_col.cast("string")))


def _py_cells(fp: int, n_cells: int) -> list[int]:
    return [phash.py_hash60(f"c{i}:{fp}") % n_cells for i in range(R)]


def _py_chk(fp: int) -> int:
    return phash.py_hash60(f"chk:{fp}")


def iblt_cells(a: DataFrame, b: DataFrame, key: str,
               n_cells: int = 256) -> DataFrame:
    """Aggregate both snapshots into one signed IBLT: (cell, cnt,
    fp_xor, chk_xor), rows only for non-empty cells. `a` and `b` must
    each hold the key column with distinct values."""
    u = (a.select(F.col(key).alias("k"), F.lit(1).alias("sign"))
         .unionByName(b.select(F.col(key).alias("k"),
                               F.lit(-1).alias("sign"))))
    fp = _fp(F.col("k"))
    chk = phash.hash60(F.concat(F.lit("chk:"), fp.cast("string")))
    rows = u.select(fp.alias("fp"), chk.alias("chk"), "sign")
    per_cell = []
    for i in range(R):
        cell = F.pmod(
            phash.hash60(F.concat(F.lit(f"c{i}:"),
                                  F.col("fp").cast("string"))),
            F.lit(n_cells))
        per_cell.append(rows.select(cell.alias("cell"), "fp", "chk",
                                    "sign"))
    allr = per_cell[0]
    for p in per_cell[1:]:
        allr = allr.unionByName(p)
    return (allr.groupBy("cell")
            .agg(F.sum("sign").alias("cnt"),
                 F.expr("bit_xor(fp)").alias("fp_xor"),
                 F.expr("bit_xor(chk)").alias("chk_xor"))
            .filter((F.col("cnt") != 0) | (F.col("fp_xor") != 0)
                    | (F.col("chk_xor") != 0)))


def iblt_decode(cells: list, n_cells: int = 256):
    """Peel the collected IBLT. cells: iterable of (cell, cnt, fp_xor,
    chk_xor). Returns (recovered: {fp: side}, ok: bool) — side +1 means
    only-in-A, −1 only-in-B. ok=False when peeling stalls (diff larger
    than the table supports); recovered is then the partial decode."""
    t = {int(c): [int(n), int(fx), int(cx)] for c, n, fx, cx in cells}
    recovered: dict[int, int] = {}
    progress = True
    while progress:
        progress = False
        for c in list(t):
            if c not in t:
                continue
            cnt, fx, cx = t[c]
            if abs(cnt) == 1 and fx != 0 and _py_chk(fx) == cx:
                side = 1 if cnt == 1 else -1
                recovered[fx] = side
                chk = _py_chk(fx)
                for cc in _py_cells(fx, n_cells):
                    cur = t.get(cc, [0, 0, 0])
                    cur = [cur[0] - side, cur[1] ^ fx, cur[2] ^ chk]
                    if cur == [0, 0, 0]:
                        t.pop(cc, None)
                    else:
                        t[cc] = cur
                progress = True
    return recovered, not t


def reconcile(a: DataFrame, b: DataFrame, key: str,
              n_cells: int = 256) -> DataFrame:
    """Full pipeline: build the signed IBLT, decode on the driver, map
    the recovered fingerprints back to keys with one fingerprint-filter
    scan (|diff| literals — bounded by n_cells). Returns (key, side)
    with side +1 = only in A, −1 = only in B. Raises if the decode
    stalls — a silent partial diff is worse than a loud failure (the
    caller re-runs with a larger table)."""
    got, ok = iblt_decode(
        [(r["cell"], r["cnt"], r["fp_xor"], r["chk_xor"])
         for r in iblt_cells(a, b, key, n_cells).collect()],
        n_cells)
    if not ok:
        raise ValueError(
            f"IBLT decode stalled: diff exceeds capacity of {n_cells} "
            "cells — retry with a larger table")
    u = (a.select(F.col(key).alias("k"), F.lit(1).alias("side"))
         .unionByName(b.select(F.col(key).alias("k"),
                               F.lit(-1).alias("side"))))
    if not got:
        return u.filter(F.lit(False)).select(
            F.col("k").alias(key), F.col("side").cast("int").alias("side"))
    fps = [fp for fp in got]
    return (u.withColumn("_fp", _fp(F.col("k")))
            .filter(F.col("_fp").isin(fps))
            .select(F.col("k").alias(key),
                    F.col("side").cast("int").alias("side")))
