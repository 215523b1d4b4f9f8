"""Join-strategy and skew planning (SURVEY §2.5/§4 custom policies).

The reference has no strategy selection — hot tiles just make big subfiles.
Here the policy is explicit and data-driven:

- `choose_strategy`: broadcast when the exploded build side fits the
  broadcast budget, else shuffle; salted shuffle when the probe-side cell
  histogram shows a hot cell above the skew threshold.
- `plan_salt`: salt factor from the hot-cell mass so no shuffle partition
  receives more than `target_rows_per_task` rows of any one cell.

Both run on aggregates (counts), never on raw rows — planning cost is one
cheap pre-pass, amortized at 100 TB where a mis-planned join costs hours.
AQE remains on as the runtime backstop; this is the compile-time choice.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geobuf_spark.functions import tiles


@dataclass
class JoinPlan:
    strategy: str  # broadcast | shuffle | salted
    salt: int
    build_rows: int
    hot_cell_rows: int
    reason: str


def cell_histogram(points: DataFrame, z: int, lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Probe-side rows per cell — the salting planner's input
    (NumberFeatures per tile, split_combine.go:145, as one agg)."""
    return (
        points.withColumn("cell", tiles.point_cell(F.col(lon), F.col(lat), z))
        .groupBy("cell").agg(F.count("*").alias("n"))
    )


def estimate_cover_rows(polys: DataFrame, z: int) -> int:
    """Exploded build-side size without exploding: Σ tiles-per-bbox —
    GetSizeGrid's fan-out estimate (split_combine.go:44-53) done exactly."""
    x0, x1, y0, y1 = tiles.bbox_tile_range(
        F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"), z
    )
    per = (x1 - x0 + 1) * (y1 - y0 + 1)
    return polys.agg(F.sum(per)).first()[0] or 0


def plan_salt(hot_cell_rows: int, target_rows_per_task: int = 2_000_000,
              max_salt: int = 64) -> int:
    """Salt factor bounding any one cell's share per task at roughly
    target_rows_per_task. Capped at `max_salt` (build-side replication is
    k-fold real work) — when the cap binds, the residual rows/task is
    hot_cell_rows/max_salt; `choose_strategy` surfaces that in its reason
    instead of silently pretending the bound held."""
    if hot_cell_rows <= target_rows_per_task:
        return 1
    return min(max_salt, -(-hot_cell_rows // target_rows_per_task))


def choose_strategy(points: DataFrame, polys: DataFrame, z: int, *,
                    broadcast_budget_rows: int = 5_000_000,
                    skew_threshold_rows: int = 2_000_000,
                    lon: str = "lon", lat: str = "lat") -> JoinPlan:
    build_rows = estimate_cover_rows(polys, z)
    if build_rows <= broadcast_budget_rows:
        # broadcast needs no probe statistics: skip the histogram scan of
        # the (possibly 100 TB) points table entirely
        return JoinPlan("broadcast", 1, build_rows, -1,
                        f"cover rows {build_rows} ≤ budget {broadcast_budget_rows}")
    hist = cell_histogram(points, z, lon, lat)
    hot = hist.agg(F.max("n")).first()[0] or 0
    salt = plan_salt(hot, skew_threshold_rows)
    if salt > 1:
        residual = -(-hot // salt)
        note = "" if residual <= skew_threshold_rows else             f" (salt cap binds: ~{residual} rows/task residual)"
        return JoinPlan("salted", salt, build_rows, hot,
                        f"hot cell {hot} rows > {skew_threshold_rows}, salt={salt}{note}")
    return JoinPlan("shuffle", 1, build_rows, hot,
                    f"cover rows {build_rows} exceed broadcast budget, no hot cell")


def pip_join_planned(points: DataFrame, polys: DataFrame, *, z: int = 6, **kw):
    """pip_join with the strategy chosen from data statistics."""
    from geobuf_spark.operators import spatial_join as sj

    plan = choose_strategy(points, polys, z,
                           lon=kw.get("lon", "lon"), lat=kw.get("lat", "lat"))
    return sj.pip_join(points, polys, z=z, strategy=plan.strategy,
                       salt=plan.salt, **kw), plan


def choose_s2_level(polys: DataFrame, *, max_level: int = 12,
                    cover_budget: int = 1_000_000) -> int:
    """Finest s2 level whose estimated bbox-cover stays under budget.

    Cover per box ≈ (w/cell + 2)·(h/cell + 2) with cell = 90°/2^L — a
    conservative per-face upper bound computed as one aggregate (the s2
    analog of GetSizeGrid, split_combine.go:44-53). Finer levels mean
    sharper pruning (fewer false candidates per cell) but multiply the
    exploded build side; the budget caps broadcast/shuffle bytes."""
    row = polys.agg(
        F.count("*").alias("n"),
        F.sum(F.col("maxx") - F.col("minx")).alias("sw"),
        F.sum(F.col("maxy") - F.col("miny")).alias("sh"),
        F.sum((F.col("maxx") - F.col("minx")) * (F.col("maxy") - F.col("miny"))).alias("sa"),
    ).first()
    n, sw, sh, sa = row.n, row.sw or 0.0, row.sh or 0.0, row.sa or 0.0
    best = 0
    for L in range(max_level + 1):
        cell = 90.0 / (1 << L)
        est = sa / (cell * cell) + 2.0 * (sw + sh) / cell + 4.0 * n
        if est > cover_budget:
            break
        best = L
    return best
