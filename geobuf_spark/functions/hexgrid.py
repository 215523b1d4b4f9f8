"""H3-style hexagonal binning as pure Column expressions (+ SQL twins).

Honest scope: this is flat-plane hex binning over lon/lat (pointy-top
axial coordinates with cube rounding — the standard Red-Blob construction),
NOT the icosahedral H3 grid; there are no pentagon cells and no cross-face
continuity. What it shares with H3 and what the engine needs from it:
uniform-ish hex cells as an equi-join/density key whose neighborhoods are
6-regular — better isotropy than square tiles for kNN-ish candidate
generation and density rollups.

All rounding uses floor(x + 0.5) so the Spark expressions and the DuckDB
oracle twins are bit-identical (banker's-rounding differences between
engines can flip edge assignments).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SQRT3 = 1.7320508075688772
_OFF = 1 << 20  # axial offset so packed ids stay positive
_M = 1 << 21


def _rnd(c: Column) -> Column:
    return F.floor(c + F.lit(0.5)).cast("bigint")


def _check_size(size_deg: float) -> None:
    # |q| ≤ (√3/3·180 + 60)/size, |r| ≤ 60/size must stay under the 2^20
    # packing offset or distinct cells alias into one id
    if (0.5774 * 180.0 + 60.0) / size_deg >= (1 << 20):
        raise ValueError(
            f"size_deg={size_deg} too fine for the 2^20 axial packing "
            "offset (cells would alias); use size_deg >= 2e-4")


def hex_qr(lon: Column, lat: Column, size_deg: float):
    """Axial (q, r) of the hex containing (lon, lat) — pointy-top layout,
    cube rounding with largest-error correction."""
    _check_size(size_deg)
    x, y = lon, lat
    qf = (F.lit(SQRT3 / 3.0) * x - F.lit(1.0 / 3.0) * y) / F.lit(size_deg)
    rf = (F.lit(2.0 / 3.0) * y) / F.lit(size_deg)
    sf = -qf - rf
    q0, r0, s0 = _rnd(qf), _rnd(rf), _rnd(sf)
    dq = F.abs(q0.cast("double") - qf)
    dr = F.abs(r0.cast("double") - rf)
    ds = F.abs(s0.cast("double") - sf)
    # fix the axis with the largest rounding error so q + r + s == 0
    q = F.when((dq > dr) & (dq > ds), -r0 - s0).otherwise(q0)
    r = F.when(~((dq > dr) & (dq > ds)) & (dr > ds), -q - s0).otherwise(r0)
    return q, r


def hex_cell(lon: Column, lat: Column, size_deg: float) -> Column:
    """Packed hex cell id: (q + OFF)·2^21 + (r + OFF)."""
    q, r = hex_qr(lon, lat, size_deg)
    return (q + F.lit(_OFF)) * F.lit(_M) + (r + F.lit(_OFF))


def hex_neighbors(cell: Column) -> Column:
    """The 6 neighbor cell ids (axial unit vectors) + the cell itself —
    the radius-1 candidate set for hex-indexed joins."""
    q = (cell / F.lit(_M)).cast("bigint") - F.lit(_OFF)
    r = F.pmod(cell, F.lit(_M)) - F.lit(_OFF)

    def pack(qq, rr):
        return (qq + F.lit(_OFF)) * F.lit(_M) + (rr + F.lit(_OFF))

    deltas = [(0, 0), (1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)]
    return F.array(*[pack(q + dq, r + dr) for dq, dr in deltas])


def sql_hex_cell(lon: str, lat: str, size_deg: float) -> str:
    """Identical arithmetic as ANSI SQL for the DuckDB oracle."""
    qf = f"(({SQRT3 / 3.0!r} * {lon} - {1.0 / 3.0!r} * {lat}) / {size_deg!r})"
    rf = f"(({2.0 / 3.0!r} * {lat}) / {size_deg!r})"
    sf = f"(-{qf} - {rf})"
    q0 = f"CAST(floor({qf} + 0.5) AS BIGINT)"
    r0 = f"CAST(floor({rf} + 0.5) AS BIGINT)"
    s0 = f"CAST(floor({sf} + 0.5) AS BIGINT)"
    dq = f"abs({q0} - {qf})"
    dr = f"abs({r0} - {rf})"
    ds = f"abs({s0} - {sf})"
    big_q = f"({dq} > {dr} AND {dq} > {ds})"
    q = f"(CASE WHEN {big_q} THEN -{r0} - {s0} ELSE {q0} END)"
    r = f"(CASE WHEN NOT {big_q} AND {dr} > {ds} THEN -{q} - {s0} ELSE {r0} END)"
    return f"(({q} + {_OFF}) * {_M} + ({r} + {_OFF}))"


def _qr_frac(lon: Column, lat: Column, size_deg: float):
    qf = (F.lit(SQRT3 / 3.0) * lon - F.lit(1.0 / 3.0) * lat) / F.lit(size_deg)
    rf = (F.lit(2.0 / 3.0) * lat) / F.lit(size_deg)
    return qf, rf


def explode_hex_cover(df, size_deg: float, minx="minx", miny="miny",
                      maxx="maxx", maxy="maxy", out="hex"):
    """flatMap bbox → covering hex cells, pure Column expressions.

    The axial transform is LINEAR in (lon, lat), so a rect maps to a
    parallelogram whose fractional (q, r) extremes sit at the rect's
    corners; cube rounding moves an assignment by at most one cell, so
    corner-extreme integer ranges padded by 1 are a guaranteed superset
    of every hex any in-rect point maps to."""
    _check_size(size_deg)
    corners = [(F.col(minx), F.col(miny)), (F.col(minx), F.col(maxy)),
               (F.col(maxx), F.col(miny)), (F.col(maxx), F.col(maxy))]
    qs = [ _qr_frac(x, y, size_deg)[0] for x, y in corners ]
    rs = [ _qr_frac(x, y, size_deg)[1] for x, y in corners ]
    q0 = F.floor(F.least(*qs)).cast("bigint") - 1
    q1 = F.ceil(F.greatest(*qs)).cast("bigint") + 1
    r0 = F.floor(F.least(*rs)).cast("bigint") - 1
    r1 = F.ceil(F.greatest(*rs)).cast("bigint") + 1
    return (
        df.withColumn("_q", F.explode(F.sequence(q0, q1)))
        .withColumn("_r", F.explode(F.sequence(r0, r1)))
        .withColumn(out, (F.col("_q") + F.lit(_OFF)) * F.lit(_M) + (F.col("_r") + F.lit(_OFF)))
        .drop("_q", "_r")
    )
