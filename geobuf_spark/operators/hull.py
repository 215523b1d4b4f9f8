"""Per-group exact convex hull statistics over integer lattice points.

The 100 TB shape: hulls are computed PER GROUP (cluster, tile, shard) —
each group is bounded (thousands of points at most after the upstream
cell/cluster assignment), so an `applyInPandas` monotone chain per group
is the right split between Catalyst (grouping shuffle, column pruning)
and per-partition imperative code (the inherently sequential Andrew
chain). Nothing collects to the driver; group count scales out.

All arithmetic is exact int64: orientation tests are integer cross
products, the reported area is the unsigned DOUBLED shoelace area (an
integer), the perimeter proxy is the sum of squared edge lengths (an
integer) — so a DuckDB oracle can match the driver's value hash exactly.
The oracle is the INDEPENDENT O(n³) hull-edge characterization: a
directed pair (p,q) is a CCW hull edge iff every other point is strictly
left of it, or collinear and strictly between p and q (that betweenness
clause is what makes collinear boundary points non-vertices, matching
the strict-turn monotone chain). Degenerate groups (<3 strict corners:
fewer than 3 distinct points, or all collinear) are excluded by both
sides.

Reference parity: the reference has no hull operator; this extends its
bbox aggregation family (geobuf.go BoundingBox_* — SURVEY §2.3) to the
exact convex footprint, the next geometry summary a tiling pipeline
needs (hull-based cover beats bbox cover on diagonal clusters).
"""
from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def _chain(pts: list) -> list:
    """Andrew monotone chain, strict turns (collinear points popped) —
    returns the CCW hull corners, or [] if fewer than 3 corners."""
    pts = sorted(set(pts))
    if len(pts) < 3:
        return []

    def build(seq):
        h = []
        for p in seq:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = build(pts)
    upper = build(list(reversed(pts)))
    hull = lower[:-1] + upper[:-1]
    return hull if len(hull) >= 3 else []


def convex_hull_stats(points: DataFrame, group: str = "gid",
                      x: str = "qx", y: str = "qy") -> DataFrame:
    """(group, n_pts, hull_k, area2, perim2) per nondegenerate group:
    distinct-point count, strict hull corner count, unsigned doubled
    shoelace area, and the sum of squared hull edge lengths — every
    value an exact int64 (coords ≤ ~7e7 ⇒ crosses ≤ ~5e15, safe)."""
    schema = (f"{group} long, n_pts long, hull_k int, "
              "area2 long, perim2 long")

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(pdf[group].iloc[0])
        pts = list({(int(a), int(b))
                    for a, b in zip(pdf[x], pdf[y])})
        hull = _chain(pts)
        if not hull:
            return pd.DataFrame(
                columns=[group, "n_pts", "hull_k", "area2", "perim2"]
            ).astype({group: "int64", "n_pts": "int64",
                      "hull_k": "int32", "area2": "int64",
                      "perim2": "int64"})
        area2 = 0
        perim2 = 0
        k = len(hull)
        for i in range(k):
            (x0, y0), (x1, y1) = hull[i], hull[(i + 1) % k]
            area2 += x0 * y1 - x1 * y0
            perim2 += (x1 - x0) ** 2 + (y1 - y0) ** 2
        return pd.DataFrame([{group: gid, "n_pts": len(pts),
                              "hull_k": k, "area2": abs(area2),
                              "perim2": perim2}])

    return (points.select(group, x, y)
            .groupBy(group).applyInPandas(per_group, schema))


def sql_convex_hull_stats(points_sql: str, group: str = "gid",
                          x: str = "qx", y: str = "qy") -> str:
    """DuckDB twin via the O(n³) hull-edge test (independent of the
    chain): directed (a,b) is a CCW hull edge iff every other point r
    has cross(b−a, r−a) > 0, or = 0 with r strictly between a and b.
    Cubic in GROUP size only — the verification tier, not the scale
    path."""
    cross = (f"(b.{x} - a.{x}) * (r.{y} - a.{y}) "
             f"- (b.{y} - a.{y}) * (r.{x} - a.{x})")
    dot = (f"(r.{x} - a.{x}) * (b.{x} - a.{x}) "
           f"+ (r.{y} - a.{y}) * (b.{y} - a.{y})")
    len2 = (f"(b.{x} - a.{x}) * (b.{x} - a.{x}) "
            f"+ (b.{y} - a.{y}) * (b.{y} - a.{y})")
    return f"""
        WITH hp AS (SELECT DISTINCT {group}, {x}, {y}
                    FROM ({points_sql})),
        he AS (SELECT a.{group},
                      a.{x} AS px, a.{y} AS py,
                      b.{x} AS qx2, b.{y} AS qy2
               FROM hp a JOIN hp b ON a.{group} = b.{group}
                   AND (a.{x} <> b.{x} OR a.{y} <> b.{y})
               WHERE NOT EXISTS (
                   SELECT 1 FROM hp r
                   WHERE r.{group} = a.{group}
                     AND (r.{x} <> a.{x} OR r.{y} <> a.{y})
                     AND (r.{x} <> b.{x} OR r.{y} <> b.{y})
                     AND NOT ({cross} > 0
                              OR ({cross} = 0 AND {dot} > 0
                                  AND {dot} < {len2})))),
        hh AS (SELECT {group}, CAST(count(*) AS INT) AS hull_k,
                      CAST(abs(sum(px * qy2 - qx2 * py)) AS BIGINT)
                          AS area2,
                      CAST(sum((qx2 - px) * (qx2 - px)
                               + (qy2 - py) * (qy2 - py)) AS BIGINT)
                          AS perim2
               FROM he GROUP BY 1 HAVING count(*) >= 3),
        hn AS (SELECT {group}, CAST(count(*) AS BIGINT) AS n_pts
               FROM hp GROUP BY 1)
        SELECT hh.{group}, hn.n_pts, hh.hull_k, hh.area2, hh.perim2
        FROM hh JOIN hn USING ({group})"""
