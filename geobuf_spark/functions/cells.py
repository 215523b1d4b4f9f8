"""S2-style cube-face cell index as pure Column expressions.

Implements the published S2 cell decomposition shape — unit-sphere point →
cube face (argmax axis) → per-face (u,v) → quantized (i,j) at a level —
with two documented simplifications:

- linear s = (u+1)/2 instead of S2's quadratic area-equalizing transform
  (cell areas vary ~3× across a face; hierarchy/equality semantics are
  unchanged);
- ids pack ((face·2^L + i)·2^L + j) rather than interleaving on a Hilbert
  curve (S2's ordering locality is not needed for equi-join indexing;
  parent/child arithmetic stays (i>>1, j>>1, L-1)).

Face/UV mapping follows the S2 convention:
  face 0 (+x): u=y/x,  v=z/x      face 3 (−x): u=z/(−x), v=y/(−x)
  face 1 (+y): u=−x/y, v=z/y      face 4 (−y): u=z/(−y), v=x/(−y)
  face 2 (+z): u=−x/z, v=−y/z     face 5 (−z): u=−y/(−z), v=−x/(−z)

All expressions are JVM-side (trig + when-chains); the identical arithmetic
is emitted as ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _xyz(lon: Column, lat: Column):
    rl, rp = F.radians(lon), F.radians(lat)
    return F.cos(rp) * F.cos(rl), F.cos(rp) * F.sin(rl), F.sin(rp)


def s2_face(lon: Column, lat: Column) -> Column:
    x, y, z = _xyz(lon, lat)
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    return (
        F.when((ax >= ay) & (ax >= az), F.when(x >= 0, 0).otherwise(3))
        .when(ay >= az, F.when(y >= 0, 1).otherwise(4))
        .otherwise(F.when(z >= 0, 2).otherwise(5))
    )


def _uv(lon: Column, lat: Column):
    x, y, z = _xyz(lon, lat)
    f = s2_face(lon, lat)
    u = (
        F.when(f == 0, y / x).when(f == 1, -x / y).when(f == 2, -x / z)
        .when(f == 3, z / (-x)).when(f == 4, z / (-y)).otherwise(-y / (-z))
    )
    v = (
        F.when(f == 0, z / x).when(f == 1, z / y).when(f == 2, -y / z)
        .when(f == 3, y / (-x)).when(f == 4, x / (-y)).otherwise(-x / (-z))
    )
    return u, v


def s2_cell(lon: Column, lat: Column, level: int) -> Column:
    """64-bit cell id at `level` (0–28): ((face·2^L + i)·2^L + j)."""
    n = 1 << level
    u, v = _uv(lon, lat)
    i = F.least(F.greatest(F.floor((u + 1.0) / 2.0 * n), F.lit(0)), F.lit(n - 1)).cast("bigint")
    j = F.least(F.greatest(F.floor((v + 1.0) / 2.0 * n), F.lit(0)), F.lit(n - 1)).cast("bigint")
    f = s2_face(lon, lat).cast("bigint")
    return (f * n + i) * n + j


def s2_parent(cell: Column, level: int) -> Column:
    """Parent cell id one level up — (i>>1, j>>1, L-1) in packed form."""
    n = 1 << level
    m = 1 << (level - 1)
    j = cell % n
    i = (cell / n).cast("bigint") % n
    f = (cell / (n * n)).cast("bigint")
    return (f * m + F.shiftright(i, 1)) * m + F.shiftright(j, 1)


def sql_s2_cell(lon: str, lat: str, level: int) -> str:
    """The identical arithmetic as ANSI SQL (DuckDB oracle)."""
    n = 1 << level
    x = f"(cos(radians({lat})) * cos(radians({lon})))"
    y = f"(cos(radians({lat})) * sin(radians({lon})))"
    z = f"(sin(radians({lat})))"
    face = (
        f"(CASE WHEN abs({x}) >= abs({y}) AND abs({x}) >= abs({z}) "
        f"THEN (CASE WHEN {x} >= 0 THEN 0 ELSE 3 END) "
        f"WHEN abs({y}) >= abs({z}) THEN (CASE WHEN {y} >= 0 THEN 1 ELSE 4 END) "
        f"ELSE (CASE WHEN {z} >= 0 THEN 2 ELSE 5 END) END)"
    )
    u = (
        f"(CASE {face} WHEN 0 THEN {y}/{x} WHEN 1 THEN -{x}/{y} WHEN 2 THEN -{x}/{z} "
        f"WHEN 3 THEN {z}/(-{x}) WHEN 4 THEN {z}/(-{y}) ELSE -{y}/(-{z}) END)"
    )
    v = (
        f"(CASE {face} WHEN 0 THEN {z}/{x} WHEN 1 THEN {z}/{y} WHEN 2 THEN -{y}/{z} "
        f"WHEN 3 THEN {y}/(-{x}) WHEN 4 THEN {x}/(-{y}) ELSE -{x}/(-{z}) END)"
    )
    i = f"CAST(least(greatest(floor(({u} + 1.0) / 2.0 * {n}), 0), {n - 1}) AS BIGINT)"
    j = f"CAST(least(greatest(floor(({v} + 1.0) / 2.0 * {n}), 0), {n - 1}) AS BIGINT)"
    return f"(({face} * {n} + {i}) * {n} + {j})"
