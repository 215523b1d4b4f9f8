"""Raster ↔ vector tile materialization (north-star requirement).

rasterize: points → per-tile pixel grids. A tile at zoom z is divided into
`res × res` pixels; each point maps to (tile, px, py) by pure arithmetic —
the same slippy-map formula at zoom z + log2(res), so the pixel index IS a
higher-zoom tile index and inherits all tile-math tests. Output is sparse
(one row per occupied pixel with a count) — the right shape at 100 TB,
where dense grids would explode; assembling a dense array per tile is a
trivial applyInPandas at the consumer edge.

vectorize: occupied pixels (count ≥ threshold) → axis-aligned boxes by
horizontal run-length merge (consecutive px runs per (tile, py)), the
marching-squares-lite inverse. Runs are found with window functions
(lag + cumsum gap flags) — one shuffle, SQL-expressible, so the DuckDB
oracle runs the identical logic.

Round-trip invariant (tested): vectorize(rasterize(points)) boxes cover
exactly the occupied pixels, and every input point falls inside some box.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geobuf_spark.functions import tiles


def rasterize(points: DataFrame, z: int, res_bits: int = 4,
              lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Sparse raster: (z, x, y, px, py, n) — pixel = tile at zoom z+res_bits."""
    zz = z + res_bits
    fx = tiles.tile_x(F.col(lon), zz)
    fy = tiles.tile_y(F.col(lat), zz)
    res = 1 << res_bits
    return (
        points.withColumn("_fx", fx).withColumn("_fy", fy)
        .select(
            F.lit(z).cast("int").alias("z"),
            (F.col("_fx") / res).cast("bigint").alias("x"),
            (F.col("_fy") / res).cast("bigint").alias("y"),
            F.pmod(F.col("_fx"), F.lit(res)).alias("px"),
            F.pmod(F.col("_fy"), F.lit(res)).alias("py"),
        )
        .groupBy("z", "x", "y", "px", "py")
        .agg(F.count("*").alias("n"))
    )


def sql_rasterize(pts_sql: str, z: int, res_bits: int = 4) -> str:
    """DuckDB twin of rasterize over a points subquery with lon/lat."""
    zz = z + res_bits
    res = 1 << res_bits
    fx, fy = tiles.sql_tile_x("lon", zz), tiles.sql_tile_y("lat", zz)
    return f"""
        SELECT {z} AS z, ({fx}) // {res} AS x, ({fy}) // {res} AS y,
               ({fx}) % {res} AS px, ({fy}) % {res} AS py,
               count(*) AS n
        FROM ({pts_sql})
        GROUP BY 1, 2, 3, 4, 5"""


def vectorize(raster: DataFrame, threshold: int = 1) -> DataFrame:
    """Occupied pixels → horizontal run boxes:
    (z, x, y, py, px0, px1, total) — one row per maximal run."""
    occ = raster.filter(F.col("n") >= threshold)
    w = Window.partitionBy("z", "x", "y", "py").orderBy("px")
    runs = (
        occ.withColumn("_gap", F.when(F.col("px") - F.lag("px").over(w) == 1, 0).otherwise(1))
        .withColumn("_run", F.sum("_gap").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("z", "x", "y", "py", "_run")
        .agg(F.min("px").alias("px0"), F.max("px").alias("px1"), F.sum("n").alias("total"))
        .drop("_run")
    )
    return runs


def sql_vectorize(raster_sql: str, threshold: int = 1) -> str:
    return f"""
        WITH occ AS (SELECT * FROM ({raster_sql}) WHERE n >= {threshold}),
        flagged AS (
            SELECT z, x, y, py, px, n,
                   CASE WHEN px - lag(px) OVER
                        (PARTITION BY z, x, y, py ORDER BY px) = 1
                        THEN 0 ELSE 1 END AS gap
            FROM occ),
        runs AS (
            SELECT z, x, y, py, px, n,
                   sum(gap) OVER (PARTITION BY z, x, y, py ORDER BY px
                                  ROWS UNBOUNDED PRECEDING) AS run
            FROM flagged)
        SELECT z, x, y, py, min(px) AS px0, max(px) AS px1,
               CAST(sum(n) AS BIGINT) AS total
        FROM runs GROUP BY z, x, y, py, run"""


def raster_to_tiles(raster: DataFrame, path: str) -> None:
    """Persist the sparse raster partitioned by tile — the materialization
    sink shared with operators.tiling.write_tiles."""
    from geobuf_spark.operators.tiling import write_tiles

    write_tiles(raster, path)
