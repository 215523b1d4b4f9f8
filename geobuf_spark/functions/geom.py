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
    st = F.struct(
        area2.alias("area2_u2"),
        # non-CCW rings get NO centroid: zero area makes it undefined, and
        # a NEGATIVE area2 (clockwise input — contract violation, still
        # reported in area2_u2) would feed _idiv negative operands where
        # its floor correction and DuckDB's `//` disagree. NULL on BOTH
        # engines instead of NULL-vs-error or off-by-one divergence.
        F.when(area2 > 0, cx.cast("long")).alias("cx_q"),
        F.when(area2 > 0, cy.cast("long")).alias("cy_q"))
    # n < 3 can't form a ring — and must not be EVALUATED: sequence(1, 0)
    # steps DOWN to [1, 0] and element_at(…, 0) throws; when() gates
    # per-row evaluation, so the degenerate rows never touch the math
    return F.when(n >= 3, st)


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
    'cy_q'} expression strings expanding the same local-origin terms.
    Fixed-size rings make the n >= 3 guard a generation-time check; the
    zero-area centroid guard matches ring_stats_q's NULL."""
    n = len(xs)
    if n < 3 or len(ys) != n:
        raise ValueError("ring needs >= 3 vertices and equal-length axes")
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
    guard = f"CASE WHEN ({area2}) > 0 THEN"
    return {
        "area2_u2": f"CAST({area2} AS BIGINT)",
        "cx_q": f"CAST({guard} {x0} + ({cxn}) * {unit} // (3 * ({area2})) END AS BIGINT)",
        "cy_q": f"CAST({guard} {y0} + ({cyn}) * {unit} // (3 * ({area2})) END AS BIGINT)",
    }


# --- one-pass Visvalingam vertex filter ------------------------------------

def vw_simplify_q(xs_q: Column, ys_q: Column, area2_min: int) -> Column:
    """One-pass Visvalingam–Whyatt vertex filter over a quantized polyline:
    keep both endpoints, keep interior vertex i iff the doubled area of the
    triangle (p_{i-1}, p_i, p_{i+1}) — measured on the ORIGINAL neighbors,
    a single pass, not the iterative min-heap — reaches area2_min.

    The cross products run on raw coordinate DIFFERENCES, so the magnitude
    contract is on vertex deltas, not absolutes: |Δx|·|Δy| < 2^62 (the
    minted walk lines keep deltas < 2e7 → products < 4e14). Integer-exact,
    no division anywhere, so the DuckDB twin matches bit-for-bit.

    Returns struct(n_kept int, xy_s string) — the kept vertices rendered
    "x:y" comma-joined (a value-hashable canonical form of the simplified
    line).
    """
    n = F.size(xs_q)

    def X(i):
        return F.element_at(xs_q, i.cast("int"))

    def Y(i):
        return F.element_at(ys_q, i.cast("int"))

    def cross(i):
        return ((X(i) - X(i - 1)) * (Y(i + 1) - Y(i - 1))
                - (X(i + 1) - X(i - 1)) * (Y(i) - Y(i - 1)))

    kept = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == 1) | (i == n) | (F.abs(cross(i)) >= F.lit(area2_min)))
    xy = F.array_join(
        F.transform(kept, lambda i: F.concat(X(i).cast("string"), F.lit(":"),
                                             Y(i).cast("string"))), ",")
    st = F.struct(F.size(kept).alias("n_kept"), xy.alias("xy_s"))
    # n < 2 is not a polyline — and sequence(1, 0) steps DOWN to [1, 0],
    # so the guard must gate EVALUATION (when() does), not just the result
    return F.when(n >= 2, st)


def sql_vw_simplify_q(xs: list[str], ys: list[str], area2_min: int) -> dict:
    """DuckDB twin of vw_simplify_q for a fixed-size polyline given as
    coordinate expression lists — the same keep predicates unrolled.
    Returns {'n_kept', 'xy_s'} expression strings. concat_ws skips the
    NULL fragments of dropped vertices on both engines."""
    n = len(xs)
    if n < 2 or len(ys) != n:
        raise ValueError("polyline needs >= 2 vertices and equal-length axes")

    def cross(i):
        return (f"(({xs[i]} - {xs[i - 1]}) * ({ys[i + 1]} - {ys[i - 1]}) - "
                f"({xs[i + 1]} - {xs[i - 1]}) * ({ys[i]} - {ys[i - 1]}))")

    keeps = ["TRUE" if i in (0, n - 1) else f"(abs({cross(i)}) >= {area2_min})"
             for i in range(n)]
    n_kept = " + ".join(f"(CASE WHEN {k} THEN 1 ELSE 0 END)" for k in keeps)
    frags = ",\n                ".join(
        f"CASE WHEN {k} THEN CAST({x} AS VARCHAR) || ':' || CAST({y} AS VARCHAR) END"
        for k, x, y in zip(keeps, xs, ys))
    return {"n_kept": f"CAST({n_kept} AS INT)",
            "xy_s": f"concat_ws(',', {frags})"}


# --- ring validity: winding, convexity, self-intersection -------------------

def ring_pair_indices(k: int) -> list:
    """Non-adjacent segment pairs (p1, p2, q1, q2) of a closed k-ring —
    the index generation SHARED by the Spark expressions and the SQL twin
    so the two sides can't drift."""
    out = []
    for i in range(k):
        for j in range(i + 1, k):
            if j == i + 1 or (i == 0 and j == k - 1):
                continue
            out.append((i, (i + 1) % k, j, (j + 1) % k))
    return out


def ring_validity_cols(df, k: int, xs: str = "xs_q", ys: str = "ys_q"):
    """Exact geometric-validity predicates for the closed ring over the
    k-vertex quantized polyline: signed doubled area (translated shoelace),
    winding (is_ccw), convexity, and the PROPER self-intersection count —
    the orientation-test primitives every clip/overlay pass relies on,
    surfaced as a validity gate.

    All integer arithmetic on local deltas (v − array_min): the fixture's
    vertex spread is < 2e7, so each cross product stays < 4e14 and sign
    COMPARISONS replace sign products (a product of two crosses would
    overflow int64). Zero shuffles — one projection of unrolled terms.
    """
    mnx, mny = F.array_min(F.col(xs)), F.array_min(F.col(ys))
    sel = list(df.columns)
    named = [F.col(c) for c in df.columns]
    for i in range(k):
        named.append((F.element_at(F.col(xs), i + 1) - mnx).alias(f"_vx{i}"))
        named.append((F.element_at(F.col(ys), i + 1) - mny).alias(f"_vy{i}"))
    d = df.select(*named)
    X = [F.col(f"_vx{i}") for i in range(k)]
    Y = [F.col(f"_vy{i}") for i in range(k)]

    def cr(a, b, c):
        return ((X[b] - X[a]) * (Y[c] - Y[a])
                - (Y[b] - Y[a]) * (X[c] - X[a]))

    def opp(c1, c2):
        return ((c1 > 0) & (c2 < 0)) | ((c1 < 0) & (c2 > 0))

    area2 = None
    for i in range(k):
        j = (i + 1) % k
        t = X[i] * Y[j] - X[j] * Y[i]
        area2 = t if area2 is None else area2 + t
    crosses = [cr(i, (i + 1) % k, (i + 2) % k) for i in range(k)]
    all_nonneg = None
    all_nonpos = None
    for c in crosses:
        nn, np_ = (c >= 0), (c <= 0)
        all_nonneg = nn if all_nonneg is None else (all_nonneg & nn)
        all_nonpos = np_ if all_nonpos is None else (all_nonpos & np_)
    n_self = None
    for p1, p2, q1, q2 in ring_pair_indices(k):
        hit = (opp(cr(p1, p2, q1), cr(p1, p2, q2))
               & opp(cr(q1, q2, p1), cr(q1, q2, p2))).cast("bigint")
        n_self = hit if n_self is None else n_self + hit
    return d.select(
        *sel,
        area2.cast("bigint").alias("area2"),
        (area2 > 0).cast("int").alias("is_ccw"),
        (all_nonneg | all_nonpos).cast("int").alias("is_convex"),
        n_self.alias("n_self_x"))


def sql_ring_validity(k: int) -> dict:
    """DuckDB twins of ring_validity_cols over named delta columns
    vx0..vx{k-1} / vy0..vy{k-1} (callers build those via least())."""
    X = [f"vx{i}" for i in range(k)]
    Y = [f"vy{i}" for i in range(k)]

    def cr(a, b, c):
        return (f"(({X[b]} - {X[a]}) * ({Y[c]} - {Y[a]})"
                f" - ({Y[b]} - {Y[a]}) * ({X[c]} - {X[a]}))")

    def opp(c1, c2):
        return f"(({c1} > 0 AND {c2} < 0) OR ({c1} < 0 AND {c2} > 0))"

    area2 = " + ".join(f"({X[i]} * {Y[(i + 1) % k]} - {X[(i + 1) % k]} * {Y[i]})"
                       for i in range(k))
    crosses = [cr(i, (i + 1) % k, (i + 2) % k) for i in range(k)]
    convex = (f"(({' AND '.join(f'{c} >= 0' for c in crosses)})"
              f" OR ({' AND '.join(f'{c} <= 0' for c in crosses)}))")
    hits = " + ".join(
        f"(CASE WHEN {opp(cr(p1, p2, q1), cr(p1, p2, q2))}"
        f" AND {opp(cr(q1, q2, p1), cr(q1, q2, p2))} THEN 1 ELSE 0 END)"
        for p1, p2, q1, q2 in ring_pair_indices(k))
    return {
        "area2": f"CAST({area2} AS BIGINT)",
        "is_ccw": f"CAST(({area2}) > 0 AS INT)",
        "is_convex": f"CAST({convex} AS INT)",
        "n_self_x": f"CAST({hits} AS BIGINT)",
    }
