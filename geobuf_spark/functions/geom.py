"""Planar measure functions over quantized rings — shoelace area and
centroid, exact in integer arithmetic.

geobuf geometries live on the 1e-7 lattice (geom.go:173-179); measures
computed there can stay integer-exact end to end, which is what makes a
DuckDB oracle able to value-hash them. Two tricks keep int64 honest:

- translate to a local origin at the ring's bbox-min corner (shoelace and
  centroid are translation-invariant), so coordinates become small
  non-negative deltas instead of ±1.8e9 absolutes;
- rescale the deltas by a caller-provided `unit` that divides them exactly
  (the minted fixtures' edges are whole multiples of 1e6 lattice units),
  so the cubic centroid numerators stay far below 2^63.

With a CCW ring the signed 2·area is positive and the centroid numerators
Σ (dx_i + dx_j)·cross_ij = 3·area2·(centroid − origin) are non-negative
totals (individual terms may go negative), so Spark's `div` (truncate) and
DuckDB's `//` (floor) agree on every division here.

All pure Column expressions (transform/aggregate over the ring arrays) —
one projection, no shuffle, no Python; the SQL twins expand the same terms
for fixed ring sizes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UNIT = 1_000_000  # 0.1° in 1e-7 lattice units — divides every minted edge


def _deltas(xs: Column, unit: int) -> Column:
    """Local non-negative deltas (v − min) / unit, exact for unit-multiple
    rings (the double divide is exact below 2^53 and the quotient < 2^31)."""
    mn = F.array_min(xs)
    return F.transform(xs, lambda v: ((v - mn) / F.lit(unit)).cast("long"))


def ring_stats_q(xs_q: Column, ys_q: Column, unit: int = UNIT) -> Column:
    """struct(area2_u2, cx_q, cy_q) for an unclosed CCW ring given as
    parallel arrays of quantized (1e-7 lattice) bigint coordinates.

    area2_u2 is twice the enclosed area in unit² lattice measure;
    cx_q/cy_q are the centroid floored back onto the 1e-7 lattice:
    c = origin + (Σ (d_i + d_j)·cross_ij · unit) div (3 · area2).
    """
    n = F.size(xs_q)
    dx, dy = _deltas(xs_q, unit), _deltas(ys_q, unit)
    idx = F.sequence(F.lit(1), n)

    def cross(i):
        j = F.pmod(i, n) + F.lit(1)
        return (F.element_at(dx, i.cast("int")) * F.element_at(dy, j.cast("int"))
                - F.element_at(dx, j.cast("int")) * F.element_at(dy, i.cast("int")))

    def csum(weight):
        return F.aggregate(idx, F.lit(0).cast("long"),
                           lambda acc, i: acc + weight(i))

    area2 = csum(cross)
    cxn = csum(lambda i: (F.element_at(dx, i.cast("int"))
                          + F.element_at(dx, (F.pmod(i, n) + 1).cast("int")))
               * cross(i))
    cyn = csum(lambda i: (F.element_at(dy, i.cast("int"))
                          + F.element_at(dy, (F.pmod(i, n) + 1).cast("int")))
               * cross(i))
    cx = F.array_min(xs_q) + _idiv(cxn * unit, 3 * area2)
    cy = F.array_min(ys_q) + _idiv(cyn * unit, 3 * area2)
    return F.struct(area2.alias("area2_u2"),
                    cx.cast("long").alias("cx_q"),
                    cy.cast("long").alias("cy_q"))


def _idiv(num: Column, den: Column) -> Column:
    """Exact integer floor-division of non-negative bigint Columns (Spark
    has no Column-level `div`). floor(num/den) on doubles can land one off
    when the true quotient sits within an ulp of an integer, so the
    candidate is corrected with integer comparisons — operands stay < 2^53
    here, so the products below never overflow."""
    q = F.floor(num / den).cast("long")
    q = F.when(q * den > num, q - 1).otherwise(q)
    return F.when((q + 1) * den <= num, q + 1).otherwise(q)


def sql_ring_stats_q(xs: list[str], ys: list[str], unit: int = UNIT) -> dict:
    """DuckDB twin of ring_stats_q for a fixed-size ring given as lists of
    quantized-coordinate SQL expressions. Returns {'area2_u2', 'cx_q',
    'cy_q'} expression strings expanding the same local-origin terms."""
    n = len(xs)
    x0, y0 = f"least({', '.join(xs)})", f"least({', '.join(ys)})"
    dx = [f"(({e} - {x0}) // {unit})" for e in xs]
    dy = [f"(({e} - {y0}) // {unit})" for e in ys]
    cross = [f"({dx[i]} * {dy[(i + 1) % n]} - {dx[(i + 1) % n]} * {dy[i]})"
             for i in range(n)]
    area2 = " + ".join(cross)
    cxn = " + ".join(f"({dx[i]} + {dx[(i + 1) % n]}) * {cross[i]}"
                     for i in range(n))
    cyn = " + ".join(f"({dy[i]} + {dy[(i + 1) % n]}) * {cross[i]}"
                     for i in range(n))
    return {
        "area2_u2": f"CAST({area2} AS BIGINT)",
        "cx_q": f"CAST({x0} + ({cxn}) * {unit} // (3 * ({area2})) AS BIGINT)",
        "cy_q": f"CAST({y0} + ({cyn}) * {unit} // (3 * ({area2})) AS BIGINT)",
    }
