"""Temporal operators Spark lacks natively: as-of join and time-bucketed
range join.

as-of join — for each left row, the latest right row with
`right.ts <= left.ts` (per key). Spark has no ASOF JOIN; the scalable
composition is the classic union-tag-window trick:

  1. union left (tagged probe) and right (tagged build) on (key, ts);
  2. one window pass per key ordered by (ts, tag): last_value of the
     build-side payload, ignoring nulls, gives each probe row its as-of
     match;
  3. filter back to probe rows.

One shuffle on key, no range explosion, skew-safe under AQE — this is the
shape that survives 100 TB, unlike per-key applyInPandas merge_asof (which
materializes whole keys in pandas) or a range self-join (quadratic in hot
keys). DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *, key: str, ts: str,
              right_cols: list[str]) -> DataFrame:
    """For each left row: columns of the latest right row with
    right.ts <= left.ts on the same key (DuckDB ASOF JOIN semantics).
    Left rows with no match yield nulls (left outer)."""
    lcols = left.columns
    overlap = [c for c in right_cols if c in lcols]
    if overlap:
        raise ValueError(
            f"right_cols {overlap} collide with left column names — alias "
            "them first (duplicate output names are ambiguous downstream)")
    # the matched row's payload travels as ONE struct: last(ignorenulls)
    # over it picks whole rows, so a genuine NULL field in the as-of match
    # stays NULL instead of back-filling from an older row
    rstruct_t = "struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols) + ">"
    l = left.select(
        F.col(key).alias("_k"), F.col(ts).alias("_t"),
        F.lit(1).alias("_probe"),
        *[F.col(c) for c in lcols if c not in (key, ts)],
        F.lit(None).cast(rstruct_t).alias("_r"),
    )
    # NULL-ts build rows can never satisfy right.ts <= left.ts; unfiltered
    # they sort to the partition head (NULLS FIRST) and last(ignorenulls)
    # would hand their payload to every early probe row — phantom matches
    # DuckDB's ASOF never produces
    r = right.filter(F.col(ts).isNotNull()).select(
        F.col(key).alias("_k"), F.col(ts).alias("_t"),
        F.lit(0).alias("_probe"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (key, ts)],
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    u = l.unionByName(r)
    # build rows sort before probe rows at equal ts → ties match (<=)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_probe").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select("*", F.last("_r", ignorenulls=True).over(w).alias("_f"))
    out = filled.filter(F.col("_probe") == 1).select(
        F.col("_k").alias(key), F.col("_t").alias(ts),
        *[F.col(c) for c in lcols if c not in (key, ts)],
        *[F.col(f"_f.{c}").alias(c) for c in right_cols],
    )
    return out


def range_bucket_join(left: DataFrame, right: DataFrame, *, key: str,
                      ts: str, lo: str, hi: str, bucket: int) -> DataFrame:
    """left.ts ∈ [right.lo, right.hi] range join via bucketized equi-join:
    explode each right interval over its covered buckets, equi-join on
    (key, bucket), exact filter after — the range analog of the cell join."""
    lb = left.withColumn("_b", (F.col(ts) / bucket).cast("bigint"))
    rb = right.withColumn(
        "_b",
        F.explode(F.sequence((F.col(lo) / bucket).cast("bigint"),
                             (F.col(hi) / bucket).cast("bigint"))),
    )
    return (
        lb.join(rb, [key, "_b"])
        .filter((F.col(ts) >= F.col(lo)) & (F.col(ts) <= F.col(hi)))
        .drop("_b")
    )


def asof_nearest(left: DataFrame, right: DataFrame, *, key: str, ts: str,
                 right_id: str, tol: int) -> DataFrame:
    """For each left row: the id and signed delta of the NEAREST right
    row on the same key within |right.ts − left.ts| ≤ tol, in either
    direction (asof_join is backward-only). Ties on |Δ| prefer the
    backward match; equal-ts right rows resolve to the min right_id.
    Inner semantics — left rows with no candidate in tolerance drop.

    Same shape as asof_join: ONE union + ONE partition-by-key exchange;
    the backward candidate comes from last() over the preceding frame,
    the forward one from first() over the following frame (two sorts,
    one shuffle — Spark reuses the exchange). dt = right.ts − left.ts
    (backward ≤ 0, forward > 0)."""
    l = left.select(
        F.col(key).alias("_k"), F.col(ts).cast("bigint").alias("_t"),
        F.lit(1).alias("_probe"),
        *[F.col(c) for c in left.columns if c not in (key, ts)],
        F.lit(None).cast("struct<t:bigint,rid:bigint>").alias("_r"),
    )
    r = right.filter(F.col(ts).isNotNull()).select(
        F.col(key).alias("_k"), F.col(ts).cast("bigint").alias("_t"),
        F.lit(0).alias("_probe"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (key, ts)],
        F.struct(F.col(ts).cast("bigint").alias("t"),
                 F.col(right_id).cast("bigint").alias("rid")).alias("_r"),
    )
    u = l.unionByName(r)
    # backward: build rows sort BEFORE probes at equal ts (dt=0 counts as
    # backward); among equal-ts builds, rid DESC so last() lands on the
    # min rid. forward: frame starts at the probe, so equal-ts builds
    # (sorted before it) are excluded; rid ASC so first() is the min rid.
    wb = (Window.partitionBy("_k")
          .orderBy(F.col("_t").asc(), F.col("_probe").asc(),
                   F.col("_r.rid").desc())
          .rowsBetween(Window.unboundedPreceding, 0))
    wf = (Window.partitionBy("_k")
          .orderBy(F.col("_t").asc(), F.col("_probe").asc(),
                   F.col("_r.rid").asc())
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    c = (u.withColumn("_b", F.last("_r", ignorenulls=True).over(wb))
         .withColumn("_f", F.first("_r", ignorenulls=True).over(wf))
         .filter(F.col("_probe") == 1))
    db = F.col("_t") - F.col("_b.t")          # ≥ 0 when present
    df_ = F.col("_f.t") - F.col("_t")         # > 0 when present
    ok_b = F.col("_b").isNotNull() & (db <= F.lit(tol))
    ok_f = F.col("_f").isNotNull() & (df_ <= F.lit(tol))
    use_b = ok_b & (~ok_f | (db <= df_))
    out = (c.filter(ok_b | ok_f)
           .select(F.col("_k").alias(key), F.col("_t").alias(ts),
                   *[F.col(c2) for c2 in left.columns
                     if c2 not in (key, ts)],
                   F.when(use_b, F.col("_b.rid"))
                   .otherwise(F.col("_f.rid")).alias(right_id),
                   F.when(use_b, -db).otherwise(df_).alias("dt_sec")))
    return out


def token_bucket_replay(events: DataFrame, *, key: str = "user_id",
                        ts_sec: str = "t", order: str = "event_id",
                        capacity: int = 3,
                        refill_sec: int = 14400) -> DataFrame:
    """Offline replay of a per-key token-bucket rate limiter — the audit
    that sizes a production limiter before it ships: how many requests
    WOULD each key have had throttled under (capacity, refill_sec)?

    Spec (integer-exact, so a recursive-CTE oracle can replay it):
    events per key in (ts_sec, order) order; the bucket starts full;
    each event first refills `(t − t_prev) div refill_sec` tokens
    (capped at capacity; t_prev is the PREVIOUS EVENT's time, accepted
    or not — the fractional remainder deliberately resets, keeping the
    state a single integer), then consumes one token if available, else
    drops. Returns (key, n_events, n_dropped, final_tokens).

    The state machine is inherently sequential per key, so the engine
    side is `applyInPandas` per key — the documented custom-stateful
    seam (same contract as the streaming sessionizer): keys partition
    the shuffle, each group is one key's event list (bounded by per-key
    activity, never corpus-sized), no driver state. The streaming twin
    would be applyInPandasWithState with the identical transition."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    schema = (f"{key} long, n_events long, n_dropped long, "
              "final_tokens long")

    def per_key(pdf):
        import pandas as pd
        pdf = pdf.sort_values([ts_sec, order], kind="mergesort")
        tokens, drops = capacity, 0
        t_prev = None
        for t in pdf[ts_sec].astype("int64"):
            t = int(t)
            if t_prev is not None:
                tokens = min(capacity,
                             tokens + (t - t_prev) // refill_sec)
            if tokens >= 1:
                tokens -= 1
            else:
                drops += 1
            t_prev = t
        return pd.DataFrame([{key: int(pdf[key].iloc[0]),
                              "n_events": len(pdf),
                              "n_dropped": drops,
                              "final_tokens": tokens}])

    return events.groupBy(key).applyInPandas(per_key, schema)


def sql_token_bucket_replay(events_sql: str, *, key: str = "user_id",
                            ts_sec: str = "t", order: str = "event_id",
                            capacity: int = 3,
                            refill_sec: int = 14400) -> str:
    """DuckDB twin: one recursive CTE stepping every key's cursor one
    event per round (depth = max per-key event count). The refill-then-
    consume arithmetic is textually the same integer spec.

    The recursion anchor hardcodes the first event as accepted
    (tokens = capacity - 1, drops = 0), which matches the Spark replay
    only when the bucket starts with at least one token — hence the
    same capacity >= 1 guard as token_bucket_replay (ADVICE r4: the two
    engines would diverge for capacity < 1)."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    avail = (f"least({capacity}, s.tokens + (e.tt - s.t_prev) "
             f"// {refill_sec})")
    return f"""
        WITH RECURSIVE tb_ev AS (
            SELECT {key} AS k, {ts_sec} AS tt,
                   row_number() OVER (PARTITION BY {key}
                       ORDER BY {ts_sec}, {order}) AS rk
            FROM ({events_sql})),
        tb AS (
            SELECT k, rk, tt AS t_prev,
                   {capacity} - 1 AS tokens, 0 AS drops
            FROM tb_ev WHERE rk = 1
            UNION ALL
            SELECT e.k, e.rk, e.tt,
                   CASE WHEN {avail} >= 1 THEN {avail} - 1
                        ELSE {avail} END,
                   s.drops + CASE WHEN {avail} >= 1 THEN 0 ELSE 1 END
            FROM tb s JOIN tb_ev e ON e.k = s.k AND e.rk = s.rk + 1),
        tb_last AS (
            SELECT k, rk, tokens, drops,
                   row_number() OVER (PARTITION BY k
                       ORDER BY rk DESC) AS rr
            FROM tb)
        SELECT k AS {key}, CAST(rk AS BIGINT) AS n_events,
               CAST(drops AS BIGINT) AS n_dropped,
               CAST(tokens AS BIGINT) AS final_tokens
        FROM tb_last WHERE rr = 1"""
