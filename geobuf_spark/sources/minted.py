"""Deterministic minted geometries over the driver's relational tables.

Page/document geometries are minted from integer keys with pure arithmetic
(multiply / modulo / divide by 1e7) so that the *identical* expression runs
in Spark and in the DuckDB oracle, and every coordinate lands exactly on the
geobuf 1e-7 lattice (geom.go:173-179 quantization is then lossless on the
integer path).

Spark builders return DataFrames; ``sql_*`` functions return the equivalent
ANSI-SQL SELECT fragments for the oracle. Keep both sides byte-for-byte the
same arithmetic — the driver hash-compares values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Knuth-style multiplicative constants; values chosen so every coordinate is
# an exact integer number of 1e-7 units and well inside the mercator domain.
LON_MULT, LON_MOD = 2654435761, 3_600_000_000  # lon ∈ [-180, 180)
LAT_MULT, LAT_MOD = 2246822519, 1_700_000_000  # lat ∈ [-85, 85)
CX_MULT, CX_MOD = 40503, 3_300_000_000  # rect/triangle center x ∈ [-165, 165)
CY_MULT, CY_MOD = 104729, 1_400_000_000  # center y ∈ [-70, 70)

_SPLIT = 1 << 15  # (a·b) mod m via b = b1·2^15 + b2 — every intermediate
# stays < 2.5e14, so int64 never overflows on EITHER engine even at
# 10^12-row key ranges (a naive a*MULT overflows both Spark and DuckDB
# once a ≥ ~3.5e9). Identical value to (a*b) % m, identical formula text
# on both sides.


def _mulmod(a, mult: int, mod: int):
    """Spark Column for (a · mult) mod mod, overflow-safe."""
    b1, b2 = mult // _SPLIT, mult % _SPLIT
    ar = a % F.lit(mod)
    t1 = (ar * F.lit(b1)) % F.lit(mod)
    return (t1 * F.lit(_SPLIT) + ar * F.lit(b2)) % F.lit(mod)


def _sql_mulmod(a: str, mult: int, mod: int) -> str:
    b1, b2 = mult // _SPLIT, mult % _SPLIT
    ar = f"(({a}) % {mod})"
    t1 = f"(({ar} * {b1}) % {mod})"
    return f"(({t1} * {_SPLIT} + {ar} * {b2}) % {mod})"


def minted_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One point per document: (doc_id, lon, lat) on the 1e-7 lattice."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lon_q = _mulmod(F.col("doc_id"), LON_MULT, LON_MOD) - F.lit(LON_MOD // 2)
    lat_q = _mulmod(F.col("doc_id"), LAT_MULT, LAT_MOD) - F.lit(LAT_MOD // 2)
    return docs.select(
        "doc_id",
        (lon_q / F.lit(1e7)).alias("lon"),
        (lat_q / F.lit(1e7)).alias("lat"),
    )


SQL_MINTED_POINTS = f"""
SELECT doc_id,
       ({_sql_mulmod('doc_id', LON_MULT, LON_MOD)} - {LON_MOD // 2}) / 1e7 AS lon,
       ({_sql_mulmod('doc_id', LAT_MULT, LAT_MOD)} - {LAT_MOD // 2}) / 1e7 AS lat
FROM documents
"""


def minted_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One axis-aligned rectangle per part: (poly_id, minx, miny, maxx, maxy).

    Mirrors the county build side (FIXTURES.md §2): bbox = the geometry for
    rectangles, so the bbox prefilter (split_combine.go:324-331 Intersect)
    IS the exact containment predicate — SQL-expressible for the oracle."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    cx = _mulmod(F.col("p_partkey"), CX_MULT, CX_MOD) - F.lit(CX_MOD // 2)
    cy = _mulmod(F.col("p_partkey"), CY_MULT, CY_MOD) - F.lit(CY_MOD // 2)
    hw = F.lit(10_000_000) + (F.col("p_partkey") % F.lit(100)) * F.lit(1_000_000)
    hh = F.lit(8_000_000) + (F.col("p_partkey") % F.lit(80)) * F.lit(1_000_000)
    return part.select(
        F.col("p_partkey").alias("poly_id"),
        ((cx - hw) / F.lit(1e7)).alias("minx"),
        ((cy - hh) / F.lit(1e7)).alias("miny"),
        ((cx + hw) / F.lit(1e7)).alias("maxx"),
        ((cy + hh) / F.lit(1e7)).alias("maxy"),
    )


_CX = f"({_sql_mulmod('p_partkey', CX_MULT, CX_MOD)} - {CX_MOD // 2})"
_CY = f"({_sql_mulmod('p_partkey', CY_MULT, CY_MOD)} - {CY_MOD // 2})"
_HW = f"(10000000 + (p_partkey % 100) * 1000000)"
_HH = f"(8000000 + (p_partkey % 80) * 1000000)"

SQL_MINTED_RECTS = f"""
SELECT p_partkey AS poly_id,
       ({_CX} - {_HW}) / 1e7 AS minx,
       ({_CY} - {_HH}) / 1e7 AS miny,
       ({_CX} + {_HW}) / 1e7 AS maxx,
       ({_CY} + {_HH}) / 1e7 AS maxy
FROM part
"""


def minted_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One triangle per part for general point-in-polygon:
    v0=(cx, cy+hh), v1=(cx-hw, cy-hh), v2=(cx+hw, cy-hh)."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    cx = _mulmod(F.col("p_partkey"), CX_MULT, CX_MOD) - F.lit(CX_MOD // 2)
    cy = _mulmod(F.col("p_partkey"), CY_MULT, CY_MOD) - F.lit(CY_MOD // 2)
    hw = F.lit(10_000_000) + (F.col("p_partkey") % F.lit(100)) * F.lit(1_000_000)
    hh = F.lit(8_000_000) + (F.col("p_partkey") % F.lit(80)) * F.lit(1_000_000)
    return part.select(
        F.col("p_partkey").alias("poly_id"),
        (cx / F.lit(1e7)).alias("x0"),
        ((cy + hh) / F.lit(1e7)).alias("y0"),
        ((cx - hw) / F.lit(1e7)).alias("x1"),
        ((cy - hh) / F.lit(1e7)).alias("y1"),
        ((cx + hw) / F.lit(1e7)).alias("x2"),
        ((cy - hh) / F.lit(1e7)).alias("y2"),
    )


SQL_MINTED_TRIANGLES = f"""
SELECT p_partkey AS poly_id,
       {_CX} / 1e7 AS x0,
       ({_CY} + {_HH}) / 1e7 AS y0,
       ({_CX} - {_HW}) / 1e7 AS x1,
       ({_CY} - {_HH}) / 1e7 AS y1,
       ({_CX} + {_HW}) / 1e7 AS x2,
       ({_CY} - {_HH}) / 1e7 AS y2
FROM part
"""


def minted_rings_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-integer CCW rings for the measure operators: rectangles
    (even p_partkey) and triangles (odd), as parallel bigint coordinate
    arrays on the 1e-7 lattice — the exact same center/halfwidth draws as
    minted_rects/minted_triangles, kept as integers so shoelace stats are
    int64-exact. Every edge is a whole multiple of geom.UNIT (hw/hh are
    built from 1e6-unit steps)."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    cx = _mulmod(F.col("p_partkey"), CX_MULT, CX_MOD) - F.lit(CX_MOD // 2)
    cy = _mulmod(F.col("p_partkey"), CY_MULT, CY_MOD) - F.lit(CY_MOD // 2)
    hw = F.lit(10_000_000) + (F.col("p_partkey") % F.lit(100)) * F.lit(1_000_000)
    hh = F.lit(8_000_000) + (F.col("p_partkey") % F.lit(80)) * F.lit(1_000_000)
    is_rect = F.pmod(F.col("p_partkey"), F.lit(2)) == 0
    # rect ring (minx,miny)→(maxx,miny)→(maxx,maxy)→(minx,maxy): CCW
    rect_xs = F.array(cx - hw, cx + hw, cx + hw, cx - hw)
    rect_ys = F.array(cy - hh, cy - hh, cy + hh, cy + hh)
    # triangle ring (cx,cy+hh)→(cx−hw,cy−hh)→(cx+hw,cy−hh): CCW
    tri_xs = F.array(cx, cx - hw, cx + hw)
    tri_ys = F.array(cy + hh, cy - hh, cy - hh)
    return part.select(
        F.col("p_partkey").alias("poly_id"),
        F.when(is_rect, F.lit("rect")).otherwise(F.lit("triangle")).alias("kind"),
        F.when(is_rect, rect_xs).otherwise(tri_xs).alias("xs_q"),
        F.when(is_rect, rect_ys).otherwise(tri_ys).alias("ys_q"),
    )


def sql_minted_ring_coords() -> tuple[list, list, list, list]:
    """The DuckDB coordinate expressions of minted_rings_q's two shapes:
    (rect_xs, rect_ys, tri_xs, tri_ys), each a list of quantized-integer
    SQL expressions over `part`."""
    rect_xs = [f"({_CX} - {_HW})", f"({_CX} + {_HW})",
               f"({_CX} + {_HW})", f"({_CX} - {_HW})"]
    rect_ys = [f"({_CY} - {_HH})", f"({_CY} - {_HH})",
               f"({_CY} + {_HH})", f"({_CY} + {_HH})"]
    tri_xs = [f"{_CX}", f"({_CX} - {_HW})", f"({_CX} + {_HW})"]
    tri_ys = [f"({_CY} + {_HH})", f"({_CY} - {_HH})", f"({_CY} - {_HH})"]
    return rect_xs, rect_ys, tri_xs, tri_ys
