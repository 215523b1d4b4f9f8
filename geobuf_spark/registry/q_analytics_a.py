"""Registry family: exact-statistics / generic analytics extension batches.

Split out of the former __spark_entry__.py monolith (VERDICT r4 #2);
query functions keep their original text, oracles sit beside them in
this module's oracles(). Driver-window ORDER lives in window.py, not here.

Queries here (40):
ab_lift, allen_census, anomaly_days, apriori_triples, autocorr_daily,
basket_pairs, bot_flags, cohens_kappa, copresence_pairs,
customer_pareto, dow_profile, dow_residual_outliers, fano_dispersion,
fk_audit, fold_leakage_audit, gapped_sequences, gini_chars,
k_anonymity_audit, kcenter_greedy, kendall_daily, log_histogram_p99,
mannwhitney_len, max_coverage_hosts, otsu_threshold, outlier_mad,
persistent_heavy_hitters, range_bounds_planner, rolling_median_7d,
rsync_delta, selectivity_audit, shard_balance, ship_delay_stats,
snapshot_reconcile, str_pack, topk_drift, topk_per_group,
trend_slope_weekly, trimmed_mean_chars, two_phase_median, welch_gate
"""
from __future__ import annotations
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from geobuf_spark.codec import spark_codec
from geobuf_spark.functions import text as TXT
from geobuf_spark.functions import geom, hexgrid, phash, tiles
from geobuf_spark.operators import dedup, knn, ranking, similarity, sketch
from geobuf_spark.operators import spatial_join as sj
from geobuf_spark.operators import tiling
from geobuf_spark.sources import minted, pages
from geobuf_spark.streaming import windows as W
from ._shared import *  # noqa: F401,F403
from .q_webtext import q_lang_confusion  # noqa: F401


def q_topk_per_group(spark, sf):
    # top-3 lineitems by extendedprice per returnflag (window op surface)
    from pyspark.sql import Window
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc())
    return (
        li.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "rnk")
    )

def q_outlier_mad(spark, sf):
    # robust per-language length outliers: median and MAD by the exact
    # "lower" order statistic (doc_len_percentiles' integer indexing — no
    # cross-libm interpolation), outlier gate |n_tok − median| > 5·MAD in
    # pure int64. The language spine is tiny, so both join-backs
    # broadcast; the only corpus-scale work is two lang aggregations.
    t = (_docs(spark, sf)
         .select("lang",
                 TXT.token_count(F.col("text")).cast("bigint").alias("n_tok"))
         .localCheckpoint(eager=False))  # shared by m1 and dev

    def med(col_df, val, out):
        g = (col_df.groupBy("lang")
             .agg(F.sort_array(F.collect_list(val)).alias("v"),
                  F.count("*").alias("n")))
        return g.select(
            "lang", F.col("n"),
            F.element_at("v", F.expr("CAST((n - 1) DIV 2 AS INT) + 1"))
            .alias(out))

    m1 = med(t, "n_tok", "median_tokens").withColumnRenamed("n", "n_docs")
    dev = (t.join(F.broadcast(m1), "lang")
           .withColumn("dev", F.abs(F.col("n_tok") - F.col("median_tokens")))
           .localCheckpoint(eager=False))  # shared by m2 and the rollup
    m2 = med(dev.select("lang", F.col("dev").alias("n_tok")), "n_tok",
             "mad_tokens").drop("n")
    return (dev.join(F.broadcast(m2), "lang")
            .groupBy("lang")
            .agg(F.max("n_docs").alias("n_docs"),
                 F.max("median_tokens").alias("median_tokens"),
                 F.max("mad_tokens").alias("mad_tokens"),
                 F.sum(F.when(F.col("dev") > MAD_K * F.col("mad_tokens"),
                              1).otherwise(0)).cast("bigint")
                 .alias("n_outliers")))

def _outlier_mad_sql() -> str:
    ntok = "len(string_split(text, chr(32)))"
    return f"""
        WITH t AS (SELECT lang, CAST({ntok} AS BIGINT) AS n_tok
                   FROM documents),
        m1 AS (SELECT lang, count(*) AS n_docs,
                      (list_sort(list(n_tok)))[CAST((count(*) - 1) // 2
                          AS INT) + 1] AS median_tokens
               FROM t GROUP BY 1),
        dev AS (SELECT t.lang, n_docs, median_tokens,
                       abs(n_tok - median_tokens) AS dev
                FROM t JOIN m1 ON t.lang = m1.lang),
        m2 AS (SELECT lang, (list_sort(list(dev)))[CAST((count(*) - 1) // 2
                          AS INT) + 1] AS mad_tokens
               FROM dev GROUP BY 1)
        SELECT dev.lang, max(n_docs) AS n_docs,
               max(median_tokens) AS median_tokens,
               max(mad_tokens) AS mad_tokens,
               CAST(sum(CASE WHEN dev > {MAD_K} * mad_tokens
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev JOIN m2 ON dev.lang = m2.lang
        GROUP BY 1"""

def q_trend_slope_weekly(spark, sf):
    # burst/decline detection with EXACT integers: per event_type, weekly
    # counts y over week index x, and the least-squares slope as the
    # exact rational (num, den) = (n·Σxy − Σx·Σy, n·Σx² − (Σx)²) — no
    # float regression, so the oracle matches bit-for-bit and the sign
    # IS the trend verdict. Two small aggregations after the weekly
    # rollup; everything stays int64 (weeks ≤ 60, counts ≤ corpus).
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_type", F.expr("unix_timestamp(ts) div 604800").alias("wk"))
    weekly = (e.groupBy("event_type", "wk")
              .agg(F.count("*").alias("y"))
              .withColumn("x", F.col("wk") - F.lit(2840)))  # 2024 epoch wk
    return (weekly.groupBy("event_type")
            .agg(F.count("*").alias("n_weeks"),
                 F.sum("y").alias("total"),
                 (F.count("*") * F.sum(F.col("x") * F.col("y"))
                  - F.sum("x") * F.sum("y")).alias("slope_num"),
                 (F.count("*") * F.sum(F.col("x") * F.col("x"))
                  - F.sum("x") * F.sum("x")).alias("slope_den")))

def _trend_slope_weekly_sql() -> str:
    return """
        WITH e AS (SELECT event_type,
                          CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
                   FROM events),
        weekly AS (SELECT event_type, wk, wk - 2840 AS x,
                          CAST(count(*) AS BIGINT) AS y
                   FROM e GROUP BY 1, 2)
        SELECT event_type, count(*) AS n_weeks,
               CAST(sum(y) AS BIGINT) AS total,
               CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
                   AS slope_num,
               CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
                   AS slope_den
        FROM weekly GROUP BY 1"""

def q_copresence_pairs(spark, sf):
    # trajectory linkage: user pairs co-present in ≥ COPRES_MIN distinct
    # (spatial bin, day) cells — the entity-resolution join over space ×
    # time. Fixture: user cohorts (user_id mod 5) share a minted per-day
    # anchor, events jitter around it, so genuine co-presence exists to
    # find. Distinct bins first (multi-events in one bin count once),
    # then the bin self-join; production caps bin occupancy exactly like
    # the LSH bucket caps. Never all-pairs: candidates exist only inside
    # a shared bin. Pure integer arithmetic (div bins, no floats).
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        "user_id", "event_id", F.expr("unix_timestamp(ts) div 86400")
        .alias("day"))
    g = F.col("user_id") % 5
    cx = minted._mulmod(g * 1009 + F.col("day") * 31,
                        minted.LON_MULT, minted.LON_MOD - 8_000_000)
    cy = minted._mulmod(g * 2003 + F.col("day") * 57,
                        minted.LAT_MULT, minted.LAT_MOD - 8_000_000)
    jx = minted._mulmod(F.col("event_id"), 48271, COPRES_JIT)
    jy = minted._mulmod(F.col("event_id"), 69621, COPRES_JIT)
    bins = (e.select(
                "user_id", "day",
                (cx + jx).cast("bigint").alias("x"),
                (cy + jy).cast("bigint").alias("y"))
            .select("user_id", "day",
                    F.expr(f"x div {COPRES_BIN_X}").alias("tx"),
                    F.expr(f"y div {COPRES_BIN_Y}").alias("ty"))
            .distinct())
    a = bins.select(F.col("user_id").alias("u_a"), "day", "tx", "ty")
    b = bins.select(F.col("user_id").alias("u_b"), "day", "tx", "ty")
    return (a.join(b, ["day", "tx", "ty"])
            .filter(F.col("u_a") < F.col("u_b"))
            .groupBy("u_a", "u_b")
            .agg(F.count("*").alias("n_bins"))
            .filter(F.col("n_bins") >= COPRES_MIN))

def _copresence_pairs_sql() -> str:
    cx = minted._sql_mulmod("((user_id % 5) * 1009 + day * 31)",
                            minted.LON_MULT, minted.LON_MOD - 8_000_000)
    cy = minted._sql_mulmod("((user_id % 5) * 2003 + day * 57)",
                            minted.LAT_MULT, minted.LAT_MOD - 8_000_000)
    jx = minted._sql_mulmod("event_id", 48271, COPRES_JIT)
    jy = minted._sql_mulmod("event_id", 69621, COPRES_JIT)
    return f"""
        WITH e AS (SELECT user_id, event_id,
                          CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
                   FROM events),
        bins AS (SELECT DISTINCT user_id, day,
                        ({cx} + {jx}) // {COPRES_BIN_X} AS tx,
                        ({cy} + {jy}) // {COPRES_BIN_Y} AS ty
                 FROM e)
        SELECT a.user_id AS u_a, b.user_id AS u_b,
               CAST(count(*) AS BIGINT) AS n_bins
        FROM bins a JOIN bins b
          ON a.day = b.day AND a.tx = b.tx AND a.ty = b.ty
             AND a.user_id < b.user_id
        GROUP BY 1, 2 HAVING count(*) >= {COPRES_MIN}"""

def q_shard_balance(spark, sf):
    # shard-assignment audit: hash-shard the corpus into N_SHARDS by the
    # portable hash, report per-shard doc counts and byte totals — the
    # balance check run before any repartition(N, key) write. Includes
    # the min/max witness columns the skew alarm reads. One aggregation.
    d = _docs(spark, sf).select(
        F.pmod(phash.hash60(F.concat(F.lit("shard-"),
                                     F.col("doc_id").cast("string"))),
               F.lit(N_SHARDS)).alias("shard"),
        F.octet_length("text").cast("bigint").alias("b"))
    return (d.groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("b").alias("total_bytes"),
                 F.max("b").alias("max_doc_bytes")))

def _shard_balance_sql() -> str:
    h = phash.sql_hash60("'shard-' || CAST(doc_id AS VARCHAR)")
    return f"""
        SELECT ({h}) % {N_SHARDS} AS shard,
               count(*) AS n_docs,
               CAST(sum(octet_length(encode(text))) AS BIGINT)
                   AS total_bytes,
               CAST(max(octet_length(encode(text))) AS BIGINT)
                   AS max_doc_bytes
        FROM documents GROUP BY 1"""

def q_anomaly_days(spark, sf):
    # burst days in EXACT integers: per event_type, daily counts x with
    # per-type totals (n days, S = Σx, Q = Σx²); day flagged when
    # (n·x − S)² > ANOM_K2 · (n·Q − S²) — algebraically |z| > 2 with the
    # n² cleared, so no float mean/std and the oracle hashes exactly.
    # Two small aggregations over the daily rollup; one day exchange.
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_type", F.expr("unix_timestamp(ts) div 86400").alias("day"))
    daily = e.groupBy("event_type", "day").agg(F.count("*").alias("x"))
    tot = (daily.groupBy("event_type")
           .agg(F.count("*").alias("n"), F.sum("x").alias("s"),
                F.sum(F.col("x") * F.col("x")).alias("q")))
    j = daily.join(F.broadcast(tot), "event_type")
    lhs = (F.col("n") * F.col("x") - F.col("s"))
    rhs = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return (j.filter(lhs * lhs > ANOM_K2 * rhs)
            .select("event_type", "day", "x",
                    (lhs * lhs).alias("dev2_scaled"),
                    rhs.alias("var_scaled")))

def _anomaly_days_sql() -> str:
    return f"""
        WITH e AS (SELECT event_type,
                          CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
                   FROM events),
        daily AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS x
                  FROM e GROUP BY 1, 2),
        tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(x) AS BIGINT) AS s,
                       CAST(sum(x * x) AS BIGINT) AS q
                FROM daily GROUP BY 1)
        SELECT daily.event_type, day, x,
               (n * x - s) * (n * x - s) AS dev2_scaled,
               n * q - s * s AS var_scaled
        FROM daily JOIN tot ON daily.event_type = tot.event_type
        WHERE (n * x - s) * (n * x - s) > {ANOM_K2} * (n * q - s * s)"""

def q_bot_flags(spark, sf):
    # crawler/bot behavior heuristics in exact integers: per user, the
    # peak events-in-any-60s window (RANGE frame over epoch seconds),
    # zero-gap duplicates, and metronome periodicity (identical
    # consecutive inter-arrivals). ONE user exchange shared by the range
    # window, both lags, and the rollup.
    from pyspark.sql import Window as Win
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("te"))
    wr = (Win.partitionBy("user_id").orderBy("te")
          .rangeBetween(-59, 0))
    wo = Win.partitionBy("user_id").orderBy("te", "event_id")
    gap = F.col("te") - F.lag("te").over(wo)
    d = (e.withColumn("burst60", F.count("*").over(wr))
         .withColumn("gap", gap)
         .withColumn("same_gap",
                     (F.col("gap") == F.lag("gap").over(wo)).cast("int")))
    return (d.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.max("burst60").alias("max_burst_60s"),
                 F.sum(F.when(F.col("gap") == 0, 1).otherwise(0))
                 .cast("bigint").alias("n_zero_gaps"),
                 F.coalesce(F.sum("same_gap"), F.lit(0)).cast("bigint")
                 .alias("n_same_gaps"))
            .withColumn("burst_bot",
                        F.col("max_burst_60s") >= BOT_BURST))

def _bot_flags_sql() -> str:
    return f"""
        WITH e AS (SELECT user_id, event_id,
                          CAST(floor(epoch(ts)) AS BIGINT) AS te
                   FROM events),
        g1 AS (SELECT user_id, event_id, te,
                      count(*) OVER (PARTITION BY user_id ORDER BY te
                          RANGE BETWEEN 59 PRECEDING AND CURRENT ROW)
                          AS burst60,
                      te - lag(te) OVER wo AS gap
               FROM e
               WINDOW wo AS (PARTITION BY user_id ORDER BY te, event_id)),
        d AS (SELECT user_id, burst60, gap,
                     CASE WHEN gap = lag(gap) OVER wo2
                          THEN 1 ELSE 0 END AS same_gap
              FROM g1
              WINDOW wo2 AS (PARTITION BY user_id ORDER BY te, event_id))
        SELECT user_id, count(*) AS n_events,
               max(burst60) AS max_burst_60s,
               CAST(sum(CASE WHEN gap = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero_gaps,
               CAST(coalesce(sum(same_gap), 0) AS BIGINT) AS n_same_gaps,
               max(burst60) >= {BOT_BURST} AS burst_bot
        FROM d GROUP BY 1"""

def q_fk_audit(spark, sf):
    # referential-integrity audit across the relational spine: child
    # table sizes + orphan counts for the four FK edges — the
    # data-contract gate a pipeline runs before trusting a snapshot.
    # Four LEFT ANTI joins (each broadcastable on the parent's key set);
    # the result row per edge carries child cardinality as the witness.
    def edge(name, child, ck, parent, pk):
        c = spark.read.parquet(f"{sf}/{child}.parquet").select(
            F.col(ck).alias("k"))
        par = spark.read.parquet(f"{sf}/{parent}.parquet").select(
            F.col(pk).alias("k")).distinct()
        orphans = c.join(par, "k", "left_anti")
        return (c.agg(F.count("*").alias("n_child"))
                .crossJoin(orphans.agg(F.count("*").alias("n_orphans")))
                .select(F.lit(name).alias("fk_edge"), "n_child",
                        "n_orphans"))

    edges = [edge("lineitem.orderkey->orders", "lineitem", "l_orderkey",
                  "orders", "o_orderkey"),
             edge("lineitem.partkey->part", "lineitem", "l_partkey",
                  "part", "p_partkey"),
             edge("orders.custkey->customer", "orders", "o_custkey",
                  "customer", "c_custkey"),
             edge("customer.nationkey->nation", "customer", "c_nationkey",
                  "nation", "n_nationkey")]
    out = edges[0]
    for x in edges[1:]:
        out = out.unionByName(x)
    return out

def _fk_audit_sql() -> str:
    def edge(name, child, ck, parent, pk):
        return f"""
        SELECT '{name}' AS fk_edge,
               (SELECT count(*) FROM {child}) AS n_child,
               (SELECT count(*) FROM {child} c
                WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                  WHERE p.{pk} = c.{ck})) AS n_orphans"""
    return " UNION ALL ".join([
        edge("lineitem.orderkey->orders", "lineitem", "l_orderkey",
             "orders", "o_orderkey"),
        edge("lineitem.partkey->part", "lineitem", "l_partkey",
             "part", "p_partkey"),
        edge("orders.custkey->customer", "orders", "o_custkey",
             "customer", "c_custkey"),
        edge("customer.nationkey->nation", "customer", "c_nationkey",
             "nation", "n_nationkey")])

def q_ship_delay_stats(spark, sf):
    # order-fulfilment latency: days between order date and each line's
    # ship date, exact p50/p90 per order priority (lower-method integer
    # indexing). One broadcastable join (orders keys into lineitem), one
    # priority aggregation.
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderdate")
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate")
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .select("o_orderpriority",
                 F.datediff("l_shipdate", "o_orderdate").cast("bigint")
                 .alias("delay_d")))
    g = (j.groupBy("o_orderpriority")
         .agg(F.sort_array(F.collect_list("delay_d")).alias("v"),
              F.count("*").alias("n_lines"),
              F.sum("delay_d").alias("delay_sum")))

    def pick(num, den, name):
        idx = F.expr(f"CAST((n_lines - 1) * {num} DIV {den} AS INT) + 1")
        return F.element_at("v", idx).alias(name)

    return g.select("o_orderpriority", "n_lines", "delay_sum",
                    pick(5, 10, "p50_delay_d"), pick(9, 10, "p90_delay_d"))

def _ship_delay_stats_sql() -> str:
    return """
        WITH j AS (SELECT o_orderpriority,
                          CAST(date_diff('day', o_orderdate, l_shipdate)
                               AS BIGINT) AS delay_d
                   FROM lineitem JOIN orders
                     ON l_orderkey = o_orderkey)
        SELECT o_orderpriority, count(*) AS n_lines,
               CAST(sum(delay_d) AS BIGINT) AS delay_sum,
               (list_sort(list(delay_d)))[CAST((count(*) - 1) * 5 // 10
                   AS INT) + 1] AS p50_delay_d,
               (list_sort(list(delay_d)))[CAST((count(*) - 1) * 9 // 10
                   AS INT) + 1] AS p90_delay_d
        FROM j GROUP BY 1"""

def q_range_bounds_planner(spark, sf):
    # the repartitionByRange planner surfaced as a query: exact
    # equi-depth boundaries over the doc token-count key (lower-method
    # order statistics at i/N quantiles) + the realized bucket counts —
    # the balance audit a 100 TB writer runs before choosing range
    # bounds. ntile gives both in ONE global-sort window; boundaries are
    # the per-bucket max key.
    from pyspark.sql import Window as Win
    t = _docs(spark, sf).select(
        "doc_id",
        TXT.token_count(F.col("text")).cast("bigint").alias("k"))
    w = Win.orderBy("k", "doc_id")
    b = t.withColumn("bucket", F.ntile(RANGE_BUCKETS).over(w))
    return (b.groupBy("bucket")
            .agg(F.count("*").alias("n_docs"),
                 F.min("k").alias("lo_key"),
                 F.max("k").alias("hi_key")))

def _range_bounds_planner_sql() -> str:
    return f"""
        WITH t AS (SELECT doc_id,
                          CAST(len(string_split(text, chr(32))) AS BIGINT)
                              AS k
                   FROM documents),
        b AS (SELECT k, ntile({RANGE_BUCKETS})
                         OVER (ORDER BY k, doc_id) AS bucket
              FROM t)
        SELECT bucket, count(*) AS n_docs,
               min(k) AS lo_key, max(k) AS hi_key
        FROM b GROUP BY 1"""

def q_ab_lift(spark, sf):
    # A/B readout in exact integers: users hash-split into two arms (the
    # portable bridge hash → reproducible assignment across engines and
    # reruns), per-arm event counts and value cents, and the B-vs-A
    # lift in ppm via integer cross-multiplication. One aggregation.
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        "user_id",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.pmod(phash.hash60(F.concat(F.lit("arm-"),
                                     F.col("user_id").cast("string"))),
               F.lit(2)).alias("arm"))
    g = (e.groupBy("arm")
         .agg(F.countDistinct("user_id").alias("n_users"),
              F.count("*").alias("n_events"),
              F.sum("cents").alias("cents_sum")))
    a = g.filter(F.col("arm") == 0).select(
        F.col("n_users").alias("a_users"), F.col("n_events").alias("a_events"),
        F.col("cents_sum").alias("a_cents"))
    b = g.filter(F.col("arm") == 1).select(
        F.col("n_users").alias("b_users"), F.col("n_events").alias("b_events"),
        F.col("cents_sum").alias("b_cents"))
    return (a.crossJoin(b)
            .withColumn("lift_ppm", F.expr(
                "(b_cents * a_users - a_cents * b_users) * 1000000 "
                "div (a_cents * b_users)")))

def _ab_lift_sql() -> str:
    h = phash.sql_hash60("'arm-' || CAST(user_id AS VARCHAR)")
    return f"""
        WITH e AS (SELECT user_id,
                          CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                          ({h}) % 2 AS arm
                   FROM events),
        g AS (SELECT arm, count(DISTINCT user_id) AS n_users,
                     count(*) AS n_events,
                     CAST(sum(cents) AS BIGINT) AS cents_sum
              FROM e GROUP BY 1)
        SELECT a.n_users AS a_users, a.n_events AS a_events,
               a.cents_sum AS a_cents,
               b.n_users AS b_users, b.n_events AS b_events,
               b.cents_sum AS b_cents,
               (b.cents_sum * a.n_users - a.cents_sum * b.n_users)
                   * 1000000 // (a.cents_sum * b.n_users) AS lift_ppm
        FROM (SELECT * FROM g WHERE arm = 0) a,
             (SELECT * FROM g WHERE arm = 1) b"""

def q_dow_profile(spark, sf):
    # weekly seasonality profile: event volume and value cents by
    # day-of-week × event_type. Epoch-aligned integer dow ((day+4) % 7,
    # 0=Sunday — 1970-01-01 was a Thursday) keeps both engines off their
    # locale-dependent date functions. One aggregation.
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_type",
        F.expr("(unix_timestamp(ts) div 86400 + 4) % 7").alias("dow"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"))
    return (e.groupBy("event_type", "dow")
            .agg(F.count("*").alias("n_events"),
                 F.sum("cents").alias("cents_sum")))

def _dow_profile_sql() -> str:
    return """
        SELECT event_type,
               (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7 AS dow,
               count(*) AS n_events,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents_sum
        FROM events GROUP BY 1, 2"""

def q_customer_pareto(spark, sf):
    # revenue concentration (the 80/20 audit): customers ranked by
    # order-total cents, share of revenue captured by the top 20% of
    # customers in exact ppm, plus the k50 head count — the
    # host_concentration pattern on the relational spine. One customer
    # rollup + one global-sort window over the customer table.
    from pyspark.sql import Window as Win
    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        .alias("cents"))
    c = o.groupBy("o_custkey").agg(F.sum("cents").alias("rev"))
    w = Win.orderBy(F.col("rev").desc(), F.col("o_custkey"))
    wf = Win.rowsBetween(Win.unboundedPreceding, Win.unboundedFollowing)
    r = (c.withColumn("rk", F.row_number().over(w))
         .withColumn("cum", F.sum("rev").over(
             w.rowsBetween(Win.unboundedPreceding, 0)))
         .withColumn("tot", F.sum("rev").over(wf))
         .withColumn("n", F.count("*").over(wf)))
    return (r.agg(
        F.max("n").alias("n_customers"),
        F.max("tot").alias("rev_cents"),
        F.min(F.when(F.col("cum") * 2 >= F.col("tot"), F.col("rk")))
        .alias("k50_customers"),
        F.max(F.when(F.col("rk") * 5 <= F.col("n"),
                     F.expr("cum * 1000000 div tot"))).alias("top20pct_ppm")))

def _customer_pareto_sql() -> str:
    return """
        WITH o AS (SELECT o_custkey,
                          CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                              AS cents
                   FROM orders),
        c AS (SELECT o_custkey, CAST(sum(cents) AS BIGINT) AS rev
              FROM o GROUP BY 1),
        r AS (SELECT rev, o_custkey,
                     row_number() OVER (ORDER BY rev DESC, o_custkey)
                         AS rk,
                     sum(rev) OVER (ORDER BY rev DESC, o_custkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS cum,
                     sum(rev) OVER () AS tot,
                     count(*) OVER () AS n
              FROM c)
        SELECT CAST(max(n) AS BIGINT) AS n_customers,
               CAST(max(tot) AS BIGINT) AS rev_cents,
               CAST(min(CASE WHEN cum * 2 >= tot THEN rk END) AS BIGINT)
                   AS k50_customers,
               CAST(max(CASE WHEN rk * 5 <= n
                             THEN cum * 1000000 // tot END) AS BIGINT)
                   AS top20pct_ppm
        FROM r"""

def q_topk_drift(spark, sf):
    # vocabulary drift between the first and second half of the crawl
    # window: the top-K tokens of each half, their set overlap, and the
    # entered/exited counts — the heavy-hitter change alarm. Two ranked
    # halves from ONE token aggregation (grouping by (half, token)),
    # full-outer-joined on token.
    from pyspark.sql import Window as Win
    p = pages.pages(spark, 2000).select(
        (F.expr("unix_timestamp(warc_ts) div 86400") >= 1700000000 // 86400
         + 183).cast("int").alias("half"),
        F.explode(F.split("text", " ")).alias("w"))
    cnt = p.groupBy("half", "w").agg(F.count("*").alias("c"))
    w = Win.partitionBy("half").orderBy(F.col("c").desc(), F.col("w"))
    top = (cnt.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") <= DRIFT_TOPK)
           .localCheckpoint(eager=False))
    a = top.filter(F.col("half") == 0).select(
        F.col("w").alias("w"), F.lit(1).alias("in_a"))
    b = top.filter(F.col("half") == 1).select(
        F.col("w").alias("w"), F.lit(1).alias("in_b"))
    j = a.join(b, "w", "full_outer")
    return j.agg(
        F.sum(F.when(F.col("in_a").isNotNull()
                     & F.col("in_b").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("n_stayed"),
        F.sum(F.when(F.col("in_a").isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_entered"),
        F.sum(F.when(F.col("in_b").isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_exited"))

def _topk_drift_sql() -> str:
    split_day = 1700000000 // 86400 + 183
    return f"""
        WITH {_pages_cte(2000, 42)},
        p AS (SELECT CASE WHEN ts_epoch // 86400 >= {split_day}
                          THEN 1 ELSE 0 END AS half,
                     unnest(string_split(text, chr(32))) AS w
              FROM txt),
        cnt AS (SELECT half, w, count(*) AS c FROM p GROUP BY 1, 2),
        top AS (SELECT half, w,
                       row_number() OVER (PARTITION BY half
                           ORDER BY c DESC, w) AS rk
                FROM cnt),
        tk AS (SELECT half, w FROM top WHERE rk <= {DRIFT_TOPK}),
        a AS (SELECT w FROM tk WHERE half = 0),
        b AS (SELECT w FROM tk WHERE half = 1)
        SELECT CAST(sum(CASE WHEN a.w IS NOT NULL AND b.w IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_stayed,
               CAST(sum(CASE WHEN a.w IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_entered,
               CAST(sum(CASE WHEN b.w IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exited
        FROM a FULL OUTER JOIN b ON a.w = b.w"""

# ---------------------------------------------------------------------------
# exact corpus statistics — batch 45 (Gini, Kendall τ, χ², Mann-Whitney U)
# ---------------------------------------------------------------------------

def q_gini_chars(spark, sf):
    # corpus-concentration audit: exact Gini coefficient of document
    # character mass per language, as an integer rational —
    # G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over the ascending-sorted
    # sizes. Permuting tied x values leaves Σ i·x unchanged, so the
    # row_number tie order (doc_id) is value-irrelevant; it is pinned
    # only for plan determinism. One shuffle (the per-lang sort window),
    # then a map-side-combinable aggregate. Int64 bound: Σ i·x ≤
    # n²·max(x) ≈ 1.9e13 at sf0.1 — safe through sf100.
    from pyspark.sql import Window as Win
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        "lang", "n_chars", "doc_id")
    w = Win.partitionBy("lang").orderBy("n_chars", "doc_id")
    ranked = d.withColumn("i", F.row_number().over(w))
    return (ranked.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.sum(F.col("i") * F.col("n_chars")).alias("rank_mass"))
            .select("lang", "n_docs", "total_chars",
                    (F.lit(2) * F.col("rank_mass")
                     - (F.col("n_docs") + 1) * F.col("total_chars"))
                    .alias("gini_num"),
                    (F.col("n_docs") * F.col("total_chars"))
                    .alias("gini_den"))
            .withColumn("gini_ppm",
                        F.expr("gini_num * 1000000 div gini_den")))

def _gini_chars_sql() -> str:
    return """
        WITH ranked AS (SELECT lang, n_chars,
                               row_number() OVER (PARTITION BY lang
                                   ORDER BY n_chars, doc_id) AS i
                        FROM documents),
        a AS (SELECT lang, count(*) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS total_chars,
                     CAST(sum(i * n_chars) AS BIGINT) AS rank_mass
              FROM ranked GROUP BY 1)
        SELECT lang, n_docs, total_chars,
               2 * rank_mass - (n_docs + 1) * total_chars AS gini_num,
               n_docs * total_chars AS gini_den,
               (2 * rank_mass - (n_docs + 1) * total_chars) * 1000000
                   // (n_docs * total_chars) AS gini_ppm
        FROM a"""

def q_kendall_daily(spark, sf):
    # exact Kendall τ-a between the daily 'view' and 'purchase' count
    # series: concordant/discordant/tied day pairs by integer sign of
    # (x1−x2)(y1−y2). The series is an aggregate (≤ one row per day),
    # so the d1<d2 pair join is a broadcast nested-loop over a tiny
    # side — quadratic in DAYS, not events; a year is ~66k pairs.
    # Production path for long series is the O(n log n) merge-sort
    # inversion count; this is the exact small-series tier.
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_type", F.expr("unix_timestamp(ts) div 86400").alias("day"))
    daily = (e.filter(F.col("event_type").isin("view", "purchase"))
             .groupBy("day")
             .agg(F.sum(F.expr("if(event_type = 'view', 1, 0)")).alias("x"),
                  F.sum(F.expr("if(event_type = 'purchase', 1, 0)"))
                  .alias("y")))
    a = daily.select(F.col("day").alias("d1"), F.col("x").alias("x1"),
                     F.col("y").alias("y1"))
    b = daily.select(F.col("day").alias("d2"), F.col("x").alias("x2"),
                     F.col("y").alias("y2"))
    s = F.signum((F.col("x1") - F.col("x2")) * (F.col("y1") - F.col("y2")))
    pairs = (a.join(F.broadcast(b), F.col("d1") < F.col("d2"))
             .withColumn("s", s.cast("long")))
    return (pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.expr("if(s = 1, 1, 0)")).alias("concordant"),
        F.sum(F.expr("if(s = -1, 1, 0)")).alias("discordant"),
        F.sum(F.expr("if(s = 0, 1, 0)")).alias("tied"))
        .withColumn("tau_a_ppm",
                    F.expr("(concordant - discordant) * 1000000"
                           " div n_pairs")))

def _kendall_daily_sql() -> str:
    return """
        WITH daily AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400
                                  AS day,
                              sum(CASE WHEN event_type = 'view'
                                       THEN 1 ELSE 0 END) AS x,
                              sum(CASE WHEN event_type = 'purchase'
                                       THEN 1 ELSE 0 END) AS y
                       FROM events
                       WHERE event_type IN ('view', 'purchase')
                       GROUP BY 1),
        p AS (SELECT CAST(sign((a.x - b.x) * (a.y - b.y)) AS BIGINT) AS s
              FROM daily a JOIN daily b ON a.day < b.day),
        agg AS (SELECT count(*) AS n_pairs,
                       CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS concordant,
                       CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS discordant,
                       CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS tied
                FROM p)
        SELECT n_pairs, concordant, discordant, tied,
               (concordant - discordant) * 1000000 // n_pairs AS tau_a_ppm
        FROM agg"""

def q_mannwhitney_len(spark, sf):
    # distribution-shift gate: exact Mann-Whitney U (doubled, so ties
    # stay integral) of n_chars for English vs every other language —
    # U×2 = 2·#{en > other} + #{en = other}, computed from value-count
    # tables with a running less-than prefix sum (one window per
    # comparison), never a pair join: linear in distinct values, not
    # quadratic in docs. auc_ppm = 1e6·U×2 div (2·n_en·n_oth) is the
    # exact AUC of "en docs are longer".
    from pyspark.sql import Window as Win
    d = spark.read.parquet(f"{sf}/documents.parquet").select("lang",
                                                             "n_chars")
    langs = d.filter(F.col("lang") != "en").select(
        F.col("lang").alias("cmp")).distinct()
    en = (d.filter(F.col("lang") == "en")
          .crossJoin(F.broadcast(langs))
          .select("cmp", "n_chars", F.lit(1).alias("is_en")))
    oth = (d.filter(F.col("lang") != "en")
           .select(F.col("lang").alias("cmp"), "n_chars",
                   F.lit(0).alias("is_en")))
    per = (en.unionByName(oth)
           .groupBy("cmp", "n_chars")
           .agg(F.sum("is_en").alias("c_en"),
                F.sum(F.lit(1) - F.col("is_en")).alias("c_oth")))
    w = (Win.partitionBy("cmp").orderBy("n_chars")
         .rowsBetween(Win.unboundedPreceding, -1))
    scored = per.withColumn(
        "less_oth", F.coalesce(F.sum("c_oth").over(w), F.lit(0)))
    return (scored.groupBy("cmp")
            .agg(F.sum("c_en").alias("n_en"),
                 F.sum("c_oth").alias("n_oth"),
                 F.sum(F.col("c_en")
                       * (F.lit(2) * F.col("less_oth") + F.col("c_oth")))
                 .alias("u_x2"))
            .withColumn("auc_ppm",
                        F.expr("u_x2 * 1000000 div (2 * n_en * n_oth)"))
            .withColumnRenamed("cmp", "lang"))

def _mannwhitney_len_sql() -> str:
    return """
        WITH langs AS (SELECT DISTINCT lang AS cmp FROM documents
                       WHERE lang <> 'en'),
        en AS (SELECT langs.cmp, d.n_chars, 1 AS is_en
               FROM documents d, langs WHERE d.lang = 'en'),
        oth AS (SELECT lang AS cmp, n_chars, 0 AS is_en
                FROM documents WHERE lang <> 'en'),
        per AS (SELECT cmp, n_chars,
                       sum(is_en) AS c_en, sum(1 - is_en) AS c_oth
                FROM (SELECT * FROM en UNION ALL SELECT * FROM oth)
                GROUP BY 1, 2),
        scored AS (SELECT cmp, c_en, c_oth,
                          COALESCE(sum(c_oth) OVER (PARTITION BY cmp
                              ORDER BY n_chars
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS less_oth
                   FROM per)
        SELECT cmp AS lang,
               CAST(sum(c_en) AS BIGINT) AS n_en,
               CAST(sum(c_oth) AS BIGINT) AS n_oth,
               CAST(sum(c_en * (2 * less_oth + c_oth)) AS BIGINT) AS u_x2,
               CAST(sum(c_en * (2 * less_oth + c_oth)) AS BIGINT)
                   * 1000000 // (2 * CAST(sum(c_en) AS BIGINT)
                                   * CAST(sum(c_oth) AS BIGINT)) AS auc_ppm
        FROM scored GROUP BY 1"""

def q_autocorr_daily(spark, sf):
    # lag-1 autocorrelation of the daily event-count series: integer
    # moments over consecutive-day pairs (missing days break pairs, not
    # fabricate zeros), r in 1e-6 units from the SAME float expression
    # text both engines evaluate on the same integers (sqrt is IEEE
    # correctly-rounded; identical text ⇒ identical double ⇒ identical
    # floor). The integer moments are the verifiable payload; r_e6 is
    # the dashboard number.
    from pyspark.sql import Window as Win
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        F.expr("unix_timestamp(ts) div 86400").alias("day"))
    daily = e.groupBy("day").agg(F.count("*").alias("x"))
    w = Win.orderBy("day")
    lp = (daily
          .withColumn("nday", F.lead("day").over(w))
          .withColumn("y", F.lead("x").over(w))
          .filter(F.col("nday") == F.col("day") + 1))
    agg = lp.agg(F.count("*").alias("np"),
                 F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                 F.sum(F.col("x") * F.col("x")).alias("sxx"),
                 F.sum(F.col("y") * F.col("y")).alias("syy"),
                 F.sum(F.col("x") * F.col("y")).alias("sxy"))
    return agg.withColumn("r_e6", F.expr(
        "CAST(floor(1000000.0 * CAST(np * sxy - sx * sy AS DOUBLE)"
        " / sqrt(CAST(np * sxx - sx * sx AS DOUBLE)"
        " * CAST(np * syy - sy * sy AS DOUBLE))) AS BIGINT)"))

def _autocorr_daily_sql() -> str:
    return """
        WITH daily AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400
                                  AS day,
                              count(*) AS x
                       FROM events GROUP BY 1),
        lp AS (SELECT day, x,
                      lead(day) OVER (ORDER BY day) AS nday,
                      lead(x) OVER (ORDER BY day) AS y
               FROM daily),
        m AS (SELECT count(*) AS np,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(y * y) AS BIGINT) AS syy,
                     CAST(sum(x * y) AS BIGINT) AS sxy
              FROM lp WHERE nday = day + 1)
        SELECT np, sx, sy, sxx, syy, sxy,
               CAST(floor(1000000.0 * CAST(np * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(np * sxx - sx * sx AS DOUBLE)
                   * CAST(np * syy - sy * sy AS DOUBLE))) AS BIGINT)
                   AS r_e6
        FROM m"""

# ---------------------------------------------------------------------------
# batch 47 — Fano dispersion, degree assortativity, event run-length encoding
# ---------------------------------------------------------------------------

def q_fano_dispersion(spark, sf):
    # over/under-dispersion gate per event_type: exact Fano factor
    # (population variance / mean) of the daily count series as integer
    # ppm — fano = (nd·Σn² − S²)/(nd·S). Poisson arrivals sit at 1e6;
    # bursty traffic reads high, metronome bots low. Two map-side-
    # combinable aggregations, no window.
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_type", F.expr("unix_timestamp(ts) div 86400").alias("day"))
    daily = e.groupBy("event_type", "day").agg(F.count("*").alias("n"))
    return (daily.groupBy("event_type")
            .agg(F.count("*").alias("n_days"),
                 F.sum("n").alias("s"),
                 F.sum(F.col("n") * F.col("n")).alias("ss"))
            .withColumn("fano_ppm",
                        F.expr("(n_days * ss - s * s) * 1000000"
                               " div (n_days * s)")))

def _fano_dispersion_sql() -> str:
    return """
        WITH daily AS (SELECT event_type,
                              CAST(floor(epoch(ts)) AS BIGINT) // 86400
                                  AS day,
                              count(*) AS n
                       FROM events GROUP BY 1, 2),
        m AS (SELECT event_type, count(*) AS n_days,
                     CAST(sum(n) AS BIGINT) AS s,
                     CAST(sum(n * n) AS BIGINT) AS ss
              FROM daily GROUP BY 1)
        SELECT event_type, n_days, s, ss,
               (n_days * ss - s * s) * 1000000 // (n_days * s) AS fano_ppm
        FROM m"""

def q_trimmed_mean_chars(spark, sf):
    # robust corpus statistic: exact 10%-trimmed mean of document length
    # per language — drop exactly ⌊n/10⌋ smallest and largest (by value;
    # tie order can only swap EQUAL values across the trim boundary, so
    # the kept multiset is order-invariant), emit the kept sum and count
    # as integers plus the ppm mean. One sort window + one aggregate.
    from pyspark.sql import Window as Win
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        "lang", "n_chars", "doc_id")
    w = Win.partitionBy("lang").orderBy("n_chars", "doc_id")
    cw = Win.partitionBy("lang")
    ranked = (d.withColumn("i", F.row_number().over(w))
              .withColumn("n", F.count("*").over(cw)))
    kept = ranked.filter((F.col("i") > F.expr("n div 10"))
                         & (F.col("i") <= F.col("n") - F.expr("n div 10")))
    return (kept.groupBy("lang")
            .agg(F.count("*").alias("n_kept"),
                 F.sum("n_chars").alias("sum_kept"))
            .withColumn("trimmed_mean_ppm",
                        F.expr("sum_kept * 1000000 div n_kept")))

def _trimmed_mean_chars_sql() -> str:
    return """
        WITH ranked AS (SELECT lang, n_chars,
                               row_number() OVER (PARTITION BY lang
                                   ORDER BY n_chars, doc_id) AS i,
                               count(*) OVER (PARTITION BY lang) AS n
                        FROM documents),
        kept AS (SELECT lang, n_chars FROM ranked
                 WHERE i > n // 10 AND i <= n - n // 10)
        SELECT lang, count(*) AS n_kept,
               CAST(sum(n_chars) AS BIGINT) AS sum_kept,
               CAST(sum(n_chars) AS BIGINT) * 1000000 // count(*)
                   AS trimmed_mean_ppm
        FROM kept GROUP BY 1"""

def q_rolling_median_7d(spark, sf):
    # exact trailing-7-day rolling MEDIAN of the daily event count — the
    # robust sibling of a rolling mean (one outage day can't drag it).
    # Implemented by value-range contribution (each day fans out to the
    # ≤7 windows it belongs to — missing days shrink the window, never
    # fabricate zeros) + per-window order statistics; med_x2 = lower +
    # upper median, so even windows stay integral.
    from pyspark.sql import Window as Win
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        F.expr("unix_timestamp(ts) div 86400").alias("day"))
    daily = e.groupBy("day").agg(F.count("*").alias("x"))
    contrib = (daily
               .withColumn("w", F.explode(F.sequence(
                   F.col("day"), F.col("day") + 6)))
               .join(daily.select(F.col("day").alias("w")).distinct(),
                     "w"))
    ww = Win.partitionBy("w").orderBy("x", "day")
    cw = Win.partitionBy("w")
    ranked = (contrib.withColumn("i", F.row_number().over(ww))
              .withColumn("n", F.count("*").over(cw)))
    med = (ranked.filter((F.col("i") == F.expr("(n + 1) div 2"))
                         | (F.col("i") == F.expr("n div 2 + 1")))
           .groupBy("w")
           .agg(F.max("n").alias("n_win"),
                # odd windows hit ONE rank — double it; even hit two
                (F.sum("x") * (F.lit(3) - F.count("*"))).alias("med_x2")))
    return med.select(F.col("w").alias("day"), "n_win", "med_x2")

def _rolling_median_7d_sql() -> str:
    return """
        WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400
                              AS day
                   FROM events),
        daily AS (SELECT day, count(*) AS x FROM e GROUP BY 1),
        contrib AS (SELECT d2.day AS w, d1.x, d1.day
                    FROM daily d1
                    JOIN daily d2
                      ON d2.day BETWEEN d1.day AND d1.day + 6),
        ranked AS (SELECT w, x,
                          row_number() OVER (PARTITION BY w
                              ORDER BY x, day) AS i,
                          count(*) OVER (PARTITION BY w) AS n
                   FROM contrib),
        med AS (SELECT w, max(n) AS n_win,
                       CAST(sum(x) * (3 - count(*)) AS BIGINT) AS med_x2
                FROM ranked
                WHERE i = (n + 1) // 2 OR i = n // 2 + 1
                GROUP BY 1)
        SELECT w AS day, n_win, med_x2 FROM med"""

def q_dow_residual_outliers(spark, sf):
    # seasonally-adjusted anomaly gate: remove the day-of-week profile
    # FIRST (resid = x·n_dow − s_dow, integer-scaled so no division),
    # then flag days whose squared residual exceeds K× the corpus
    # residual second moment — the Chebyshev test anomaly_days applies
    # globally, here applied AFTER deseasonalization so a quiet Sunday
    # doesn't read as an outage. Exact integers end to end; per-dow
    # residuals sum to zero by construction, so the gate needs only Q.
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        F.expr("unix_timestamp(ts) div 86400").alias("day"))
    daily = e.groupBy("day").agg(F.count("*").alias("x"))
    dd = daily.withColumn("dow", F.expr("day % 7"))
    prof = dd.groupBy("dow").agg(F.count("*").alias("n_dow"),
                                 F.sum("x").alias("s_dow"))
    rz = (dd.join(F.broadcast(prof), "dow")
          .withColumn("resid",
                      F.col("x") * F.col("n_dow") - F.col("s_dow")))
    tot = rz.agg(F.count("*").alias("n_tot"),
                 F.sum(F.col("resid") * F.col("resid")).alias("q_tot"))
    return (rz.crossJoin(F.broadcast(tot))
            .withColumn("is_outlier",
                        (F.col("resid") * F.col("resid") * F.col("n_tot")
                         > F.lit(DOW_K) * F.col("q_tot")).cast("int"))
            .select("day", "dow", "x", "n_dow", "resid", "is_outlier"))

def _dow_residual_outliers_sql() -> str:
    return f"""
        WITH e AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400
                              AS day
                   FROM events),
        daily AS (SELECT day, count(*) AS x FROM e GROUP BY 1),
        dd AS (SELECT day, x, day % 7 AS dow FROM daily),
        prof AS (SELECT dow, count(*) AS n_dow,
                        CAST(sum(x) AS BIGINT) AS s_dow
                 FROM dd GROUP BY 1),
        rz AS (SELECT day, dd.dow, x, n_dow,
                      x * n_dow - s_dow AS resid
               FROM dd JOIN prof ON dd.dow = prof.dow),
        tot AS (SELECT count(*) AS n_tot,
                       CAST(sum(resid * resid) AS BIGINT) AS q_tot
                FROM rz)
        SELECT day, dow, x, n_dow, resid,
               CAST(CASE WHEN resid * resid * n_tot > {DOW_K} * q_tot
                         THEN 1 ELSE 0 END AS INT) AS is_outlier
        FROM rz, tot"""

def q_basket_pairs(spark, sf):
    # market-basket association over TPC-H: part pairs co-ordered in
    # ≥ BASKET_MIN orders, with support and the exact integer lift
    # lift_ppm = 1e6·N·c_ab div (c_a·c_b). Quadratic per ORDER (≤7
    # lineitems — the bound is the contract, like the LSH bucket caps),
    # linear in orders; part marginals broadcast back onto the pair
    # table.
    li = (spark.read.parquet(f"{sf}/lineitem.parquet")
          .select("l_orderkey", "l_partkey").distinct()
          .localCheckpoint(eager=False))
    a = li.select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("pb"))
    pairs = (a.join(b, "o").filter(F.col("pa") < F.col("pb"))
             .groupBy("pa", "pb").agg(F.count("*").alias("c_ab"))
             .filter(F.col("c_ab") >= BASKET_MIN))
    marg = li.groupBy("l_partkey").agg(F.count("*").alias("c"))
    n = li.select("l_orderkey").distinct().count()
    return (pairs
            .join(F.broadcast(marg.select(F.col("l_partkey").alias("pa"),
                                          F.col("c").alias("c_a"))), "pa")
            .join(F.broadcast(marg.select(F.col("l_partkey").alias("pb"),
                                          F.col("c").alias("c_b"))), "pb")
            .select("pa", "pb", "c_ab", "c_a", "c_b",
                    F.expr(f"{n}L * c_ab * 1000000 div (c_a * c_b)")
                    .alias("lift_ppm")))

def _basket_pairs_sql() -> str:
    return f"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM lineitem),
        pairs AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                         count(*) AS c_ab
                  FROM li a JOIN li b
                    ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey
                  GROUP BY 1, 2
                  HAVING count(*) >= {BASKET_MIN}),
        marg AS (SELECT l_partkey, count(*) AS c FROM li GROUP BY 1),
        n AS (SELECT count(DISTINCT l_orderkey) AS n FROM li)
        SELECT pa, pb, c_ab, ma.c AS c_a, mb.c AS c_b,
               n.n * c_ab * 1000000 // (ma.c * mb.c) AS lift_ppm
        FROM pairs
        JOIN marg ma ON ma.l_partkey = pairs.pa
        JOIN marg mb ON mb.l_partkey = pairs.pb
        CROSS JOIN n"""

def q_allen_census(spark, sf):
    # Allen interval-algebra census over CONSECUTIVE per-user event
    # intervals (the interval_union_time mint): classify each (earlier,
    # next) pair by its exact temporal relation — precedes / meets /
    # overlaps / finished_by / contains / starts / equals / started_by
    # (the 8 relations possible once pairs are ordered by start) — and
    # count pairs + distinct users per relation. This is the diagnostic
    # that sizes session gap thresholds: "do successive intervals chain,
    # overlap, or nest?". Intervals live on a 600 s lattice (start
    # snapped down, duration 1..24 lattice steps) so the boundary
    # relations (meets/starts/finished_by/started_by) actually occur —
    # raw-second timestamps never tie. One window shuffle on user_id,
    # everything else integer comparisons; output ≤8 rows.
    from pyspark.sql import Window as Win
    u = F.unix_timestamp("ts")
    s0 = (u - F.pmod(u, F.lit(600)))
    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        "user_id", s0.alias("s"),
        (s0 + (F.pmod(F.col("event_id"), F.lit(24)) + 1) * 600).alias("e"),
        "event_id")
    w = Win.partitionBy("user_id").orderBy("s", "event_id")
    p = (ev.select("user_id", "s", "e",
                   F.lead("s").over(w).alias("s2"),
                   F.lead("e").over(w).alias("e2"))
         .filter(F.col("s2").isNotNull()))
    s, e, s2, e2 = F.col("s"), F.col("e"), F.col("s2"), F.col("e2")
    rel = (F.when(e < s2, "precedes")
           .when(e == s2, "meets")
           .when((s < s2) & (e < e2), "overlaps")
           .when((s < s2) & (e == e2), "finished_by")
           .when(s < s2, "contains")
           .when(e < e2, "starts")
           .when(e == e2, "equals")
           .otherwise("started_by"))
    return (p.select("user_id", rel.alias("rel"))
            .groupBy("rel")
            .agg(F.count("*").alias("n_pairs"),
                 F.countDistinct("user_id").alias("n_users")))

def _allen_census_sql() -> str:
    return f"""
        WITH ev AS (SELECT user_id,
                           (CAST(floor(epoch(ts)) AS BIGINT) // 600) * 600
                               AS s,
                           (CAST(floor(epoch(ts)) AS BIGINT) // 600) * 600
                               + ((event_id % 24) + 1) * 600 AS e, event_id
                    FROM events),
        p AS (SELECT user_id, s, e,
                     lead(s) OVER (PARTITION BY user_id
                                   ORDER BY s, event_id) AS s2,
                     lead(e) OVER (PARTITION BY user_id
                                   ORDER BY s, event_id) AS e2
              FROM ev)
        SELECT CASE
                 WHEN e < s2 THEN 'precedes'
                 WHEN e = s2 THEN 'meets'
                 WHEN s < s2 AND e < e2 THEN 'overlaps'
                 WHEN s < s2 AND e = e2 THEN 'finished_by'
                 WHEN s < s2 THEN 'contains'
                 WHEN e < e2 THEN 'starts'
                 WHEN e = e2 THEN 'equals'
                 ELSE 'started_by'
               END AS rel,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM p WHERE s2 IS NOT NULL
        GROUP BY 1"""

def q_max_coverage_hosts(spark, sf):
    # greedy maximum-coverage: pick MAXCOV_K hosts whose pages jointly
    # cover the most distinct token trigrams — the "which sites to
    # crawl deeper first" budget allocator (greedy is the classical
    # (1−1/e)-approximation; with a fixed small k it is the standard
    # choice at corpus scale). Round r: per-host gain = |terms \
    # covered| via LEFT ANTI against the covered set (bounded by the
    # selected hosts' vocabularies — Spark broadcasts it), one count
    # agg, one distributed argmax; k bounded single-row collects. By
    # the greedy identity, covered_total = running Σ gains. Oracle:
    # chained CTEs with NOT IN coverage subtraction — an independent
    # formulation of each round.
    from geobuf_spark.functions import text as TXT
    from geobuf_spark.sources import pages as P
    pg = P.pages(spark, 2000, 42)
    toks = F.split("text", " ")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
        lambda i: F.concat_ws("\x1f", F.slice(toks, i, 3)))
    ht = (pg.select(TXT.url_host(F.col("url")).alias("host"),
                    F.explode(grams).alias("term"))
          .distinct().localCheckpoint(eager=False))
    covered = None
    sel, cum = [], 0
    for r in range(MAXCOV_K):
        cand = (ht if covered is None
                else ht.join(covered, "term", "left_anti"))
        gains = cand.groupBy("host").agg(F.count("*").alias("gain"))
        row = (gains.orderBy(F.col("gain").desc(), F.col("host").asc())
               .limit(1).collect()[0])
        cum += int(row["gain"])
        sel.append((r + 1, row["host"], int(row["gain"]), cum))
        new = ht.filter(F.col("host") == row["host"]).select("term")
        covered = (new if covered is None
                   else covered.unionByName(new).distinct())
        covered = covered.localCheckpoint(eager=False)
    return spark.createDataFrame(
        sel, "rank int, host string, gain bigint, covered_total bigint")

def _max_coverage_hosts_sql(k: int = MAXCOV_K) -> str:
    from geobuf_spark.functions import text as TXT
    host = TXT.sql_url_host("url")
    parts = [f"""
        ht AS (SELECT DISTINCT {host} AS host,
                      unnest(list_transform(
                          range(1, greatest(len(string_split(text,
                              chr(32))) - 2, 1) + 1),
                          i -> array_to_string(list_slice(
                              string_split(text, chr(32)), i, i + 2),
                              chr(31)))) AS term
               FROM txt),
        g1 AS (SELECT host, CAST(count(*) AS BIGINT) AS gain FROM ht
               GROUP BY 1),
        p1 AS (SELECT host, gain FROM g1
               ORDER BY gain DESC, host LIMIT 1),
        cov1 AS (SELECT DISTINCT term FROM ht
                 WHERE host = (SELECT host FROM p1))"""]
    for r in range(2, k + 1):
        parts.append(f"""
        g{r} AS (SELECT host, CAST(count(*) AS BIGINT) AS gain FROM ht
                 WHERE term NOT IN (SELECT term FROM cov{r - 1})
                 GROUP BY 1),
        p{r} AS (SELECT host, gain FROM g{r}
                 ORDER BY gain DESC, host LIMIT 1),
        cov{r} AS (SELECT term FROM cov{r - 1}
                   UNION SELECT term FROM ht
                   WHERE host = (SELECT host FROM p{r}))""")
    cums = []
    for r in range(1, k + 1):
        cum = " + ".join(f"(SELECT gain FROM p{j})"
                         for j in range(1, r + 1))
        cums.append(f"SELECT {r} AS rank, host, gain, {cum} AS "
                    f"covered_total FROM p{r}")
    sel = "\n        UNION ALL ".join(cums)
    return (f"WITH {_pages_cte(2000, 42)},{','.join(parts)}"
            f"""
        SELECT CAST(rank AS INT) AS rank, host, gain,
               CAST(covered_total AS BIGINT) AS covered_total
        FROM ({sel})""")

def q_welch_gate(spark, sf):
    # which language pairs differ SIGNIFICANTLY in mean document length
    # — Welch's unequal-variance t² as an EXACT rational inequality
    # (the anomaly_days trick taken cross-group): with S=Σx, Q=Σx²,
    # A_i = n_iQ_i−S_i², D = S_1n_2−S_2n_1,
    #   t² > K  ⟺  D²(n_1−1)(n_2−1) > K·[A_1n_2²(n_2−1)+A_2n_1²(n_1−1)]
    # — denominators cleared, so no float mean/std and the oracle
    # hashes bit-for-bit. Products reach ~1e30 at corpus scale, so both
    # engines compute in wide integers (decimal(38) / HUGEINT). One
    # tiny moments agg (map-side combinable), then a 20×20 source-pair
    # join on the driver-sized moment table (langs are too homogeneous
    # on this corpus to ever flag — sources split 8-9 of 190 pairs);
    # t2_ppm = floor(1e6·t²) reported.
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.col("source").alias("lang"), F.col("n_chars").cast("bigint").alias("x"))
    m = (d.groupBy("lang")
         .agg(F.count("*").alias("n"), F.sum("x").alias("s"),
              F.sum(F.col("x") * F.col("x")).alias("q")))
    a = m.select(*[F.col(c).alias(f"{c}a") for c in ("lang", "n", "s",
                                                     "q")])
    b = m.select(*[F.col(c).alias(f"{c}b") for c in ("lang", "n", "s",
                                                     "q")])
    j = a.join(b, F.col("langa") < F.col("langb"))
    dec = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    D = dec(F.col("sa") * F.col("nb") - F.col("sb") * F.col("na"))
    A1 = dec(F.col("na") * F.col("qa") - F.col("sa") * F.col("sa"))
    A2 = dec(F.col("nb") * F.col("qb") - F.col("sb") * F.col("sb"))
    n1, n2 = F.col("na"), F.col("nb")
    lhs = D * D * dec((n1 - 1) * (n2 - 1))
    den = (A1 * dec(n2 * n2 * (n2 - 1)) + A2 * dec(n1 * n1 * (n1 - 1)))
    return (j.select(F.col("langa").alias("src_a"),
                     F.col("langb").alias("src_b"),
                     n1.cast("bigint").alias("n_a"),
                     n2.cast("bigint").alias("n_b"),
                     F.floor(lhs * 1_000_000 / den).cast("bigint")
                     .alias("t2_ppm"),
                     (lhs > den * WELCH_K).alias("significant"))
            .orderBy("src_a", "src_b"))

def _welch_gate_sql() -> str:
    return f"""
        WITH m AS (SELECT source AS lang, CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(n_chars) AS BIGINT) AS s,
                          CAST(sum(n_chars * n_chars) AS BIGINT) AS q
                   FROM documents GROUP BY 1),
        j AS (SELECT a.lang AS src_a, b.lang AS src_b,
                     a.n AS na, a.s AS sa, a.q AS qa,
                     b.n AS nb, b.s AS sb, b.q AS qb
              FROM m a JOIN m b ON a.lang < b.lang),
        w AS (SELECT src_a, src_b, na, nb,
                     CAST(sa*nb - sb*na AS HUGEINT) AS d,
                     CAST(na*qa - sa*sa AS HUGEINT) AS a1,
                     CAST(nb*qb - sb*sb AS HUGEINT) AS a2
              FROM j),
        t AS (SELECT src_a, src_b, na, nb,
                     d*d*(na-1)*(nb-1) AS lhs,
                     a1*nb*nb*(nb-1) + a2*na*na*(na-1) AS den
              FROM w)
        SELECT src_a, src_b, CAST(na AS BIGINT) AS n_a,
               CAST(nb AS BIGINT) AS n_b,
               CAST(1000000 * lhs // den AS BIGINT) AS t2_ppm,
               lhs > den * {WELCH_K} AS significant
        FROM t ORDER BY 1, 2"""

def q_snapshot_reconcile(spark, sf):
    # diff two crawl snapshots by exchanging O(|diff|) state: both sides
    # fold into a signed 256-cell Invertible Bloom Lookup Table
    # (operators/reconcile.py — constant-size mergeable aggregation,
    # common keys cancel exactly), the driver peels the ~30-key diff,
    # and one fingerprint-filter scan maps fingerprints back to urls.
    # At 10^12 rows per snapshot this moves kilobytes where EXCEPT
    # shuffles terabytes. Snapshots: page ids [0,2000) vs [10,2020) of
    # the same deterministic mint → 10 urls only-in-A, 20 only-in-B.
    # The oracle IS the terabyte plan — two EXCEPTs over the
    # regenerated snapshot tables — so a green row proves the sketch
    # path recovers the exact symmetric difference.
    from geobuf_spark.operators import reconcile
    from geobuf_spark.sources import pages as P
    full = P.pages(spark, 2020, 42).select("page_id", "url")
    a = full.filter(F.col("page_id") < 2000).select("url")
    b = full.filter(F.col("page_id") >= 10).select("url")
    return reconcile.reconcile(a, b, key="url", n_cells=RECON_CELLS)

def _snapshot_reconcile_sql() -> str:
    return f"""
        WITH {_pages_cte(2020, 42)},
        a AS (SELECT url FROM txt WHERE id < 2000),
        b AS (SELECT url FROM txt WHERE id >= 10)
        SELECT url, CAST(1 AS INT) AS side
        FROM (SELECT url FROM a EXCEPT SELECT url FROM b)
        UNION ALL
        SELECT url, CAST(-1 AS INT) AS side
        FROM (SELECT url FROM b EXCEPT SELECT url FROM a)"""

def q_persistent_heavy_hitters(spark, sf):
    # persistence beats volume for capacity planning: users who crack
    # the daily top-PHH_TOP by event count on ≥ PHH_MIN_DAYS of the
    # month (a one-day burst is an anomaly; a every-other-day regular
    # sizes the cache). Daily rollup is map-side combinable; the
    # per-day argmax window partitions by day (tiny frames); ties →
    # min user_id, so the day ranking — and therefore the persistence
    # census — is fully deterministic.
    from pyspark.sql import Window as Win
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        F.expr("unix_timestamp(ts) div 86400").alias("day"), "user_id")
    daily = e.groupBy("day", "user_id").agg(F.count("*").alias("c"))
    w = Win.partitionBy("day").orderBy(F.col("c").desc(),
                                       F.col("user_id").asc())
    top = (daily.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= PHH_TOP))
    return (top.groupBy("user_id")
            .agg(F.count("*").alias("n_days_top"),
                 F.sum("c").alias("events_on_top_days"))
            .filter(F.col("n_days_top") >= PHH_MIN_DAYS)
            .select("user_id",
                    F.col("n_days_top").cast("bigint").alias("n_days_top"),
                    F.col("events_on_top_days").cast("bigint")
                    .alias("events_on_top_days")))

def _persistent_heavy_hitters_sql() -> str:
    return f"""
        WITH d AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400
                       AS day, user_id, count(*) AS c
                   FROM events GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY day
                  ORDER BY c DESC, user_id ASC) AS rn
              FROM d)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_days_top,
               CAST(sum(c) AS BIGINT) AS events_on_top_days
        FROM r WHERE rn <= {PHH_TOP}
        GROUP BY 1 HAVING count(*) >= {PHH_MIN_DAYS}"""

def q_str_pack(spark, sf):
    # Sort-Tile-Recursive R-tree bulk load — THE spatial partitioner for
    # bulk-building an index over 10^12 rects: sort by center x into S
    # vertical slices, sort each slice by center y into S leaves; two
    # sort exchanges total (production swaps the global row_number for
    # repartitionByRange quantile boundaries — range_bounds_planner is
    # that op; the leaf assignment formula is identical). Integer
    # q-unit centers/extents (the county-rect draws before /1e7), so
    # slice/leaf cuts are exact on both engines: leaf =
    # slice·S + (rn_y−1)·S div n_slice. Output per leaf: count + MBR.
    from pyspark.sql import Window as Win
    from geobuf_spark.sources import minted
    part = spark.read.parquet(f"{sf}/part.parquet")
    cx, cy, hw, hh = minted._part_draws()
    r = part.select(F.col("p_partkey").alias("rid"),
                    cx.cast("bigint").alias("cx"),
                    cy.cast("bigint").alias("cy"),
                    (cx - hw).cast("bigint").alias("x1"),
                    (cy - hh).cast("bigint").alias("y1"),
                    (cx + hw).cast("bigint").alias("x2"),
                    (cy + hh).cast("bigint").alias("y2"))
    wx = Win.orderBy(F.col("cx").asc(), F.col("rid").asc())
    wall = Win.partitionBy()
    r = (r.withColumn("rnx", F.row_number().over(wx))
         .withColumn("ntot", F.count("*").over(wall))
         .withColumn("slice", F.expr(f"(rnx - 1) * {STR_S} div ntot")))
    wy = Win.partitionBy("slice").orderBy(F.col("cy").asc(),
                                          F.col("rid").asc())
    ws = Win.partitionBy("slice")
    r = (r.withColumn("rny", F.row_number().over(wy))
         .withColumn("nsl", F.count("*").over(ws))
         .withColumn("leaf", F.expr(
             f"slice * {STR_S} + (rny - 1) * {STR_S} div nsl")))
    return (r.groupBy("leaf")
            .agg(F.count("*").alias("n_rects"),
                 F.min("x1").alias("mbr_x1"), F.min("y1").alias("mbr_y1"),
                 F.max("x2").alias("mbr_x2"), F.max("y2").alias("mbr_y2"))
            .select(F.col("leaf").cast("int").alias("leaf"),
                    F.col("n_rects").cast("bigint").alias("n_rects"),
                    "mbr_x1", "mbr_y1", "mbr_x2", "mbr_y2"))

def _str_pack_sql() -> str:
    from geobuf_spark.sources import minted as M
    cx = f"({M._sql_mulmod('p_partkey', M.CX_MULT, M.CX_MOD)} - {M.CX_MOD // 2})"
    cy = f"({M._sql_mulmod('p_partkey', M.CY_MULT, M.CY_MOD)} - {M.CY_MOD // 2})"
    hw = "(10000000 + (p_partkey % 100) * 1000000)"
    hh = "(8000000 + (p_partkey % 80) * 1000000)"
    return f"""
        WITH r AS (SELECT p_partkey AS rid,
                          CAST({cx} AS BIGINT) AS cx,
                          CAST({cy} AS BIGINT) AS cy,
                          CAST({cx} - {hw} AS BIGINT) AS x1,
                          CAST({cy} - {hh} AS BIGINT) AS y1,
                          CAST({cx} + {hw} AS BIGINT) AS x2,
                          CAST({cy} + {hh} AS BIGINT) AS y2
                   FROM part),
        s AS (SELECT *, row_number() OVER (ORDER BY cx, rid) AS rnx,
                     count(*) OVER () AS ntot
              FROM r),
        s2 AS (SELECT *, (rnx - 1) * {STR_S} // ntot AS slice FROM s),
        t AS (SELECT *, row_number() OVER (PARTITION BY slice
                            ORDER BY cy, rid) AS rny,
                     count(*) OVER (PARTITION BY slice) AS nsl
              FROM s2),
        t2 AS (SELECT *, slice * {STR_S} + (rny - 1) * {STR_S} // nsl
                   AS leaf
               FROM t)
        SELECT CAST(leaf AS INT) AS leaf,
               CAST(count(*) AS BIGINT) AS n_rects,
               min(x1) AS mbr_x1, min(y1) AS mbr_y1,
               max(x2) AS mbr_x2, max(y2) AS mbr_y2
        FROM t2 GROUP BY 1"""

def q_cohens_kappa(spark, sf):
    # inter-rater agreement between the stopword-argmax language
    # predictor and the labeled lang, chance-corrected: κ =
    # (p_o − p_e)/(1 − p_e) as the exact integer rational
    # (N·Σdiag − Σ r_i·c_i) / (N² − Σ r_i·c_i), reported in ppm (floor)
    # — the accept/retrain gate on classifier drift. Builds on the
    # lang_confusion rollup; labels missing on one side contribute 0 to
    # Σrc (inner join). One tiny confusion agg; everything after runs
    # on a ≤|langs|² frame.
    conf = (q_lang_confusion(spark, sf)
            .select("actual", "pred", F.col("n").cast("bigint").alias("n"))
            .localCheckpoint(eager=False))
    tot = conf.agg(F.sum("n").alias("N"),
                   F.sum(F.when(F.col("actual") == F.col("pred"),
                                F.col("n")).otherwise(0)).alias("diag"))
    rows = conf.groupBy(F.col("actual").alias("lbl")).agg(
        F.sum("n").alias("r"))
    cols = conf.groupBy(F.col("pred").alias("lbl")).agg(
        F.sum("n").alias("c"))
    rc = (rows.join(cols, "lbl")
          .agg(F.coalesce(F.sum(F.col("r") * F.col("c")), F.lit(0))
               .alias("src")))
    return (tot.crossJoin(rc)
            .select(F.col("N").cast("bigint").alias("n_docs"),
                    F.col("diag").cast("bigint").alias("n_agree"),
                    F.col("src").cast("bigint").alias("sum_rc"),
                    F.expr("1000000 * (N * diag - src) div (N * N - src)")
                    .cast("bigint").alias("kappa_ppm")))

def _cohens_kappa_sql() -> str:
    return f"""
        WITH conf AS (SELECT actual, pred, CAST(n AS BIGINT) AS n
                      FROM ({_lang_confusion_sql()})),
        tot AS (SELECT CAST(sum(n) AS BIGINT) AS N,
                       CAST(sum(CASE WHEN actual = pred THEN n ELSE 0
                                END) AS BIGINT) AS diag
                FROM conf),
        r AS (SELECT actual AS lbl, CAST(sum(n) AS BIGINT) AS r
              FROM conf GROUP BY 1),
        c AS (SELECT pred AS lbl, CAST(sum(n) AS BIGINT) AS c
              FROM conf GROUP BY 1),
        rc AS (SELECT CAST(coalesce(sum(r.r * c.c), 0) AS BIGINT) AS src
               FROM r JOIN c USING (lbl))
        SELECT N AS n_docs, diag AS n_agree, src AS sum_rc,
               CAST(1000000 * (N * diag - src) // (N * N - src)
                    AS BIGINT) AS kappa_ppm
        FROM tot, rc"""

def q_k_anonymity_audit(spark, sf):
    # k-anonymity release audit over the quasi-identifier tuple (lang,
    # source, length bucket): any combination shared by fewer than
    # K_ANON documents re-identifies its members — the governance gate
    # a corpus release runs before publishing per-document metadata.
    # One map-side-combinable rollup + a filter; output is the
    # violating cells with their sizes.
    d = spark.read.parquet(f"{sf}/documents.parquet")
    return (d.groupBy("lang", "source",
                      F.expr("n_chars div 200").alias("len_bucket"))
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") < K_ANON)
            .select("lang", "source",
                    F.col("len_bucket").cast("bigint").alias("len_bucket"),
                    F.col("n").cast("bigint").alias("n")))

def _k_anonymity_audit_sql() -> str:
    return f"""
        SELECT lang, source, CAST(n_chars // 200 AS BIGINT) AS len_bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2, 3
        HAVING count(*) < {K_ANON}"""

def q_log_histogram_p99(spark, sf):
    # HdrHistogram-style p99: log2 buckets with LOGH_SUB_BITS subbucket
    # bits give a CONSTANT-size mergeable histogram whose percentile
    # estimate carries a guaranteed ≤ 2^-4 relative error — the
    # latency-SLO shape at 10^12 events, where the exact order
    # statistic needs a full sort. This query computes BOTH (bucket =
    # (v >> shift) << shift with shift = max(bitlen−5, 0) — all integer
    # bit ops, bitlen via the binary string length so both engines
    # agree exactly) and reports the estimate, the exact p99, and the
    # realized error in ppm. The exact side's global sort is the cost
    # the histogram avoids; here it doubles as the oracle of the bound.
    from pyspark.sql import Window as Win
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v"),
        "event_id")
    bl = F.length(F.conv(F.col("v").cast("string"), 10, 2))
    shift = F.greatest(bl - F.lit(LOGH_SUB_BITS + 1), F.lit(0))
    b = (e.withColumn("sh", shift)
         .withColumn("lb", F.expr("shiftleft(shiftright(v, sh), sh)")))
    hist = b.groupBy("lb").agg(F.count("*").alias("c"))
    wcum = (Win.orderBy("lb")
            .rowsBetween(Win.unboundedPreceding, 0))
    wall = Win.partitionBy()
    hist = (hist.withColumn("cum", F.sum("c").over(wcum))
            .withColumn("n", F.sum("c").over(wall))
            .withColumn("rank", F.ceil(F.col("n") * 0.99).cast("bigint")))
    est = (hist.filter(F.col("cum") >= F.col("rank"))
           .orderBy("lb").limit(1)
           .select(F.col("lb").alias("est_p99"), "n"))
    wv = Win.orderBy(F.col("v").asc(), F.col("event_id").asc())
    ranked = e.withColumn("rn", F.row_number().over(wv))
    exact = (ranked.join(est.select("n"), F.col("rn")
                         == F.ceil(F.col("n") * 0.99).cast("bigint"))
             .select(F.col("v").alias("exact_p99")))
    return (est.crossJoin(exact)
            .select(F.col("n").cast("bigint").alias("n_events"),
                    "exact_p99", "est_p99",
                    F.expr("1000000 * (exact_p99 - est_p99) div exact_p99")
                    .cast("bigint").alias("err_ppm")))

def _log_histogram_p99_sql() -> str:
    sb = LOGH_SUB_BITS + 1
    return f"""
        WITH e AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT)
                       AS v, event_id
                   FROM events),
        b AS (SELECT v, event_id,
                     greatest(length(bin(v)) - {sb}, 0) AS sh
              FROM e),
        b2 AS (SELECT v, event_id, (v >> sh) << sh AS lb FROM b),
        h AS (SELECT lb, count(*) AS c FROM b2 GROUP BY 1),
        h2 AS (SELECT lb, c, sum(c) OVER (ORDER BY lb) AS cum,
                      sum(c) OVER () AS n
               FROM h),
        est AS (SELECT lb AS est_p99, CAST(n AS BIGINT) AS n
                FROM h2
                WHERE cum >= CAST(ceil(n * 0.99) AS BIGINT)
                ORDER BY lb LIMIT 1),
        r AS (SELECT v, row_number() OVER (ORDER BY v, event_id) AS rn
              FROM e),
        ex AS (SELECT v AS exact_p99 FROM r, est
               WHERE rn = CAST(ceil(est.n * 0.99) AS BIGINT))
        SELECT est.n AS n_events, ex.exact_p99, est.est_p99,
               CAST(1000000 * (ex.exact_p99 - est.est_p99)
                    // ex.exact_p99 AS BIGINT) AS err_ppm
        FROM est, ex"""

def q_two_phase_median(spark, sf):
    # exact median WITHOUT a global sort — the 10^12-row pattern: pass 1
    # is a map-side-combinable bucket histogram (width TPM_BUCKET);
    # the cumulative counts locate the single bucket holding the target
    # rank; pass 2 sorts ONLY that bucket (~n/#buckets rows) and picks
    # the in-bucket offset. At extreme scale the second pass recurses;
    # one level is already enough for any realistic bucket width. The
    # oracle is the INDEPENDENT plan — a direct full-sort order
    # statistic — so a green row checks the rank bookkeeping exactly.
    from pyspark.sql import Window as Win
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v"),
        "event_id")
    h = (e.groupBy(F.expr(f"v div {TPM_BUCKET}").alias("b"))
         .agg(F.count("*").alias("c")))
    wcum = Win.orderBy("b").rowsBetween(Win.unboundedPreceding, 0)
    wall = Win.partitionBy()
    h = (h.withColumn("cum", F.sum("c").over(wcum))
         .withColumn("n", F.sum("c").over(wall))
         .withColumn("k", F.expr("(n + 1) div 2")))
    tgt = (h.filter(F.col("cum") >= F.col("k"))
           .orderBy("b").limit(1)
           .select("b", (F.col("cum") - F.col("c")).alias("cum_prev"),
                   "n", "k", F.col("c").alias("n_in_bucket")))
    cand = e.join(F.broadcast(tgt),
                  F.expr(f"v div {TPM_BUCKET}") == F.col("b"))
    wv = Win.partitionBy("b").orderBy(F.col("v").asc(),
                                      F.col("event_id").asc())
    med = (cand.withColumn("rn", F.row_number().over(wv))
           .filter(F.col("rn") == F.col("k") - F.col("cum_prev")))
    return med.select(F.col("n").cast("bigint").alias("n_events"),
                      F.col("v").alias("median_cents"),
                      (F.col("b") * TPM_BUCKET).cast("bigint")
                      .alias("bucket_lo"),
                      F.col("n_in_bucket").cast("bigint")
                      .alias("n_in_bucket"))

def _two_phase_median_sql() -> str:
    return f"""
        WITH e AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT)
                       AS v, event_id
                   FROM events),
        r AS (SELECT v, row_number() OVER (ORDER BY v, event_id) AS rn,
                     count(*) OVER () AS n
              FROM e)
        SELECT CAST(n AS BIGINT) AS n_events, v AS median_cents,
               CAST((v // {TPM_BUCKET}) * {TPM_BUCKET} AS BIGINT)
                   AS bucket_lo,
               CAST((SELECT count(*) FROM e e2
                     WHERE e2.v // {TPM_BUCKET} = r.v // {TPM_BUCKET})
                    AS BIGINT) AS n_in_bucket
        FROM r WHERE rn = (n + 1) // 2"""

def q_gapped_sequences(spark, sf):
    # sequential-pattern support with a gap bound: for every ordered
    # type pair (a → b), how many USERS have an a-event followed by a
    # b-event within the next SEQ_GAP events (event_motifs_3 counts
    # strictly-consecutive runs; real funnels tolerate noise between
    # steps). Per-user sequence numbers from one window, then a
    # self-join on user with 1 ≤ Δrn ≤ gap — the join fans out at most
    # gap× before the distinct, so it scales linearly in events.
    from pyspark.sql import Window as Win
    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("te"),
        "event_id")
    w = Win.partitionBy("user_id").orderBy("te", "event_id")
    s = ev.withColumn("rn", F.row_number().over(w))
    a = s.select("user_id", F.col("event_type").alias("a"),
                 F.col("rn").alias("ra"))
    b = s.select("user_id", F.col("event_type").alias("b"),
                 F.col("rn").alias("rb"))
    j = (a.join(b, "user_id")
         .filter((F.col("rb") > F.col("ra"))
                 & (F.col("rb") <= F.col("ra") + SEQ_GAP)))
    return (j.groupBy("a", "b")
            .agg(F.countDistinct("user_id").alias("support_users"),
                 F.count("*").alias("n_occurrences"))
            .select("a", "b",
                    F.col("support_users").cast("bigint")
                    .alias("support_users"),
                    F.col("n_occurrences").cast("bigint")
                    .alias("n_occurrences")))

def _gapped_sequences_sql() -> str:
    return f"""
        WITH e AS (SELECT user_id, event_type,
                          CAST(floor(epoch(ts)) AS BIGINT) AS te,
                          event_id
                   FROM events),
        s AS (SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY te, event_id) AS rn
              FROM e)
        SELECT a.event_type AS a, b.event_type AS b,
               CAST(count(DISTINCT a.user_id) AS BIGINT)
                   AS support_users,
               CAST(count(*) AS BIGINT) AS n_occurrences
        FROM s a JOIN s b ON a.user_id = b.user_id
                         AND b.rn > a.rn AND b.rn <= a.rn + {SEQ_GAP}
        GROUP BY 1, 2"""

def q_otsu_threshold(spark, sf):
    # Otsu's optimal threshold on the event-value histogram — the
    # unsupervised "split cheap from expensive" binarization. Integer
    # scan: level = cents div OTSU_LEVEL; for every candidate cut t
    # (class 0 = level ≤ t), between-class separation is the monotone
    # transform |S0·n1 − S1·n0|² / (n0·n1) of w0w1(μ0−μ1)². To keep
    # the whole scan in int64 at any corpus size, |diff| is quantized
    # (div OTSU_Q) before squaring — BOTH engines run the identical
    # quantized formula, so the argmax (ties → lowest cut) is fully
    # deterministic, and the pytest cross-checks the pick against the
    # float Otsu optimum. One tiny histogram agg + cumulative sums
    # over ≤256 levels.
    from pyspark.sql import Window as Win
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        F.expr(f"CAST(floor(value * 100 + 0.5) AS BIGINT)"
               f" div {OTSU_LEVEL}").alias("lv"))
    h = e.groupBy("lv").agg(F.count("*").alias("c"),
                            F.sum("lv").alias("sv"))
    wcum = Win.orderBy("lv").rowsBetween(Win.unboundedPreceding, 0)
    wall = Win.partitionBy()
    d = (h.withColumn("n0", F.sum("c").over(wcum))
         .withColumn("s0", F.sum(F.col("sv")).over(wcum))
         .withColumn("n", F.sum("c").over(wall))
         .withColumn("s", F.sum(F.col("sv")).over(wall))
         .filter(F.col("n0") < F.col("n"))
         .withColumn("ad", F.abs(F.col("s0") * (F.col("n") - F.col("n0"))
                                 - (F.col("s") - F.col("s0"))
                                 * F.col("n0")))
         .withColumn("score", F.expr(
             f"((ad div {OTSU_Q}) * (ad div {OTSU_Q}))"
             " div (n0 * (n - n0))")))
    return (d.orderBy(F.col("score").desc(), F.col("lv").asc()).limit(1)
            .select((F.col("lv") * OTSU_LEVEL).cast("bigint")
                    .alias("threshold_cents"),
                    F.col("score").cast("bigint").alias("score"),
                    F.col("n0").cast("bigint").alias("n_low"),
                    (F.col("n") - F.col("n0")).cast("bigint")
                    .alias("n_high")))

def _otsu_threshold_sql() -> str:
    return f"""
        WITH e AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT)
                       // {OTSU_LEVEL} AS lv
                   FROM events),
        h AS (SELECT lv, count(*) AS c, sum(lv) AS sv FROM e
              GROUP BY 1),
        d AS (SELECT lv,
                     sum(c) OVER (ORDER BY lv) AS n0,
                     sum(sv) OVER (ORDER BY lv) AS s0,
                     sum(c) OVER () AS n, sum(sv) OVER () AS s
              FROM h),
        f AS (SELECT lv, n0, n - n0 AS n1,
                     abs(s0 * (n - n0) - (s - s0) * n0) AS ad
              FROM d WHERE n0 < n),
        sc AS (SELECT lv, n0, n1,
                      ((ad // {OTSU_Q}) * (ad // {OTSU_Q}))
                          // (n0 * n1) AS score
               FROM f)
        SELECT CAST(lv * {OTSU_LEVEL} AS BIGINT) AS threshold_cents,
               CAST(score AS BIGINT) AS score,
               CAST(n0 AS BIGINT) AS n_low, CAST(n1 AS BIGINT) AS n_high
        FROM sc ORDER BY score DESC, lv ASC LIMIT 1"""

def q_apriori_triples(spark, sf):
    # frequent 3-itemsets by the Apriori levelwise plan — the
    # market-basket generalization of basket_pairs: candidates for
    # level 3 come ONLY from joining frequent pairs that share their
    # first item, then the (b, c) subset must itself be frequent (the
    # downward-closure prune) before any counting happens. At corpus
    # scale this is the difference between counting C(n_items, 3)
    # triples and counting a few survivors; the pytest measures the
    # prune. Basket building is one distinct; each level is a
    # self-join + count, all map-side combinable.
    bi = _baskets(spark, sf).localCheckpoint(eager=False)
    f1 = (bi.groupBy("item").agg(F.count("*").alias("s"))
          .filter(F.col("s") >= APRIORI_SUP).select("item"))
    b1 = bi.join(F.broadcast(f1), "item")
    p = (b1.select("bk", F.col("item").alias("a"))
         .join(b1.select("bk", F.col("item").alias("b")), "bk")
         .filter(F.col("a") < F.col("b")))
    f2 = (p.groupBy("a", "b").agg(F.count("*").alias("s"))
          .filter(F.col("s") >= APRIORI_SUP).select("a", "b")
          .localCheckpoint(eager=False))
    cand = (f2.join(f2.select(F.col("a").alias("a"),
                              F.col("b").alias("c")), "a")
            .filter(F.col("b") < F.col("c")))
    cand = (cand.join(f2.select(F.col("a").alias("b"),
                                F.col("b").alias("c")), ["b", "c"]))
    t = (cand.join(b1.select("bk", F.col("item").alias("a")), "a")
         .join(b1.select("bk", F.col("item").alias("b")),
               ["bk", "b"])
         .join(b1.select("bk", F.col("item").alias("c")),
               ["bk", "c"]))
    return (t.groupBy("a", "b", "c").agg(F.count("*").alias("support"))
            .filter(F.col("support") >= APRIORI_SUP)
            .select("a", "b", "c",
                    F.col("support").cast("bigint").alias("support")))

def _apriori_triples_sql() -> str:
    return f"""
        WITH e AS (SELECT CAST(user_id AS VARCHAR) || '|' ||
                          CAST(CAST(floor(epoch(ts)) AS BIGINT) // 86400
                               AS VARCHAR) AS bk,
                          event_type || '#' ||
                          CAST(least(CAST(floor(value * 100 + 0.5)
                                          AS BIGINT) // 10000, 3)
                               AS VARCHAR) AS item
                   FROM events),
        bi AS (SELECT DISTINCT bk, item FROM e),
        f1 AS (SELECT item FROM bi GROUP BY 1
               HAVING count(*) >= {APRIORI_SUP}),
        b1 AS (SELECT bi.bk, bi.item FROM bi JOIN f1 USING (item)),
        f2 AS (SELECT x.item AS a, y.item AS b
               FROM b1 x JOIN b1 y ON x.bk = y.bk AND x.item < y.item
               GROUP BY 1, 2 HAVING count(*) >= {APRIORI_SUP}),
        cand AS (SELECT p.a, p.b, q.b AS c
                 FROM f2 p JOIN f2 q ON p.a = q.a AND p.b < q.b),
        cand2 AS (SELECT cand.a, cand.b, cand.c
                  FROM cand JOIN f2 r ON r.a = cand.b AND r.b = cand.c),
        t AS (SELECT x.bk, cand2.a, cand2.b, cand2.c
              FROM cand2
              JOIN b1 x ON x.item = cand2.a
              JOIN b1 y ON y.bk = x.bk AND y.item = cand2.b
              JOIN b1 z ON z.bk = x.bk AND z.item = cand2.c)
        SELECT a, b, c, CAST(count(*) AS BIGINT) AS support
        FROM t GROUP BY 1, 2, 3 HAVING count(*) >= {APRIORI_SUP}"""

def q_kcenter_greedy(spark, sf):
    # Gonzalez farthest-point-first k-center — the coreset/landmark
    # picker (2-approx for the k-center objective): start from the min
    # doc_id, then k−1 rounds of "argmax over points of min distance to
    # the chosen centers". Chosen centers are plan-time literals each
    # round (bounded k), so every round is ONE projection + ONE
    # distributed argmax — the MMR/max-coverage chained-argmax shape on
    # exact decimal d² (coordinate deltas square past int64). Output:
    # each center with the covering radius² it was selected at (the
    # k-center objective after its round), radius² div 64 to stay in
    # BIGINT.
    from geobuf_spark.sources import minted
    pts = minted.minted_cluster_points_q(spark, sf)
    first = pts.orderBy("doc_id").limit(1).collect()[0]
    sel = [(1, int(first["doc_id"]), int(first["qx"]), int(first["qy"]),
            -1)]
    for r in range(2, KCENTER_K + 1):
        dists = []
        for _, _, cx, cy, _ in sel:
            dx = (F.col("qx") - F.lit(cx)).cast("decimal(11,0)")
            dy = (F.col("qy") - F.lit(cy)).cast("decimal(11,0)")
            dists.append(dx * dx + dy * dy)
        mind = dists[0] if len(dists) == 1 else F.least(*dists)
        row = (pts.withColumn("md", mind)
               .orderBy(F.col("md").desc(), F.col("doc_id").asc())
               .limit(1).collect()[0])
        sel.append((r, int(row["doc_id"]), int(row["qx"]),
                    int(row["qy"]), int(row["md"]) // 64))
    return spark.createDataFrame(
        sel, "rank int, center_doc bigint, qx bigint, qy bigint, "
             "radius2_d64 bigint")

def _kcenter_greedy_sql(k: int = KCENTER_K) -> str:
    from geobuf_spark.sources import minted
    d2 = ("CAST(p.qx - c.qx AS HUGEINT) * (p.qx - c.qx)"
          " + CAST(p.qy - c.qy AS HUGEINT) * (p.qy - c.qy)")
    parts = [f"""
        pts AS ({minted.sql_minted_cluster_points_q()}),
        c1 AS (SELECT 1 AS rank, doc_id, qx, qy,
                      CAST(-1 AS HUGEINT) AS md
               FROM pts ORDER BY doc_id LIMIT 1)"""]
    for r in range(2, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT doc_id, qx, qy FROM c{j}" for j in range(1, r))
        parts.append(f"""
        m{r} AS (SELECT p.doc_id, p.qx, p.qy, min({d2}) AS md
                 FROM pts p CROSS JOIN ({prev}) c
                 GROUP BY 1, 2, 3),
        c{r} AS (SELECT {r} AS rank, doc_id, qx, qy, md FROM m{r}
                 ORDER BY md DESC, doc_id ASC LIMIT 1)""")
    sel = "\n        UNION ALL ".join(
        f"SELECT rank, doc_id, qx, qy, md FROM c{j}"
        for j in range(1, k + 1))
    return (f"WITH {','.join(parts)}"
            f"""
        SELECT CAST(rank AS INT) AS rank, doc_id AS center_doc, qx, qy,
               CASE WHEN rank = 1 THEN CAST(-1 AS BIGINT)
                    ELSE CAST(md // 64 AS BIGINT) END AS radius2_d64
        FROM ({sel})""")

def q_fold_leakage_audit(spark, sf):
    # train/test split hygiene for near-duplicate corpora: hash-fold
    # assignment leaks — a near-dup pair split across folds lets the
    # model memorize test data. Two strategies audited side by side on
    # the exact-Jaccard pair graph: 'doc_hash' (fold by doc id hash —
    # pairs cross folds at roughly the random 1−1/F rate) vs
    # 'component_hash' (fold by the dup-component representative —
    # crossings are ZERO by construction). One pair computation (the
    # ngram_jaccard tier), one component pass, then counting.
    from geobuf_spark.functions import phash
    from geobuf_spark.operators import dedup
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf), key="doc_id",
                                      shingle_k=3, threshold=0.4)
    pairs = pairs.select("a", "b").localCheckpoint(eager=False)
    comp = dedup.near_dup_components(pairs)

    def fold_of(col):
        return F.pmod(phash.hash60(F.concat(F.lit("fold:"),
                                            col.cast("string"))),
                      F.lit(FOLD_N))

    rep = comp.select(F.col("doc_id").alias("d"),
                      fold_of(F.col("rep_id")).alias("cf"))
    j = (pairs
         .withColumn("fa", fold_of(F.col("a")))
         .withColumn("fb", fold_of(F.col("b")))
         .join(rep.withColumnRenamed("d", "a")
               .withColumnRenamed("cf", "ca"), "a")
         .join(rep.withColumnRenamed("d", "b")
               .withColumnRenamed("cf", "cb"), "b"))
    agg = j.agg(
        F.count("*").alias("n_pairs"),
        F.sum((F.col("fa") != F.col("fb")).cast("bigint"))
        .alias("x_doc"),
        F.sum((F.col("ca") != F.col("cb")).cast("bigint"))
        .alias("x_comp"))
    out = agg.select(
        F.explode(F.array(
            F.struct(F.lit("doc_hash").alias("strategy"),
                     F.col("n_pairs").alias("n_pairs"),
                     F.col("x_doc").alias("n_cross")),
            F.struct(F.lit("component_hash").alias("strategy"),
                     F.col("n_pairs").alias("n_pairs"),
                     F.col("x_comp").alias("n_cross")))).alias("s"))
    return out.select(
        F.col("s.strategy").alias("strategy"),
        F.col("s.n_pairs").cast("bigint").alias("n_pairs"),
        F.col("s.n_cross").cast("bigint").alias("n_cross"),
        F.expr("1000000 * s.n_cross div s.n_pairs").cast("bigint")
        .alias("cross_ppm"))

def _fold_leakage_audit_sql() -> str:
    from geobuf_spark.functions import phash
    fa = phash.sql_hash60("'fold:' || CAST(a AS VARCHAR)")
    fb = phash.sql_hash60("'fold:' || CAST(b AS VARCHAR)")
    fr = phash.sql_hash60("'fold:' || CAST(rep_id AS VARCHAR)")
    return f"""
        WITH RECURSIVE {_ngram_sql()},
        pr AS (SELECT a, b FROM pairs),
        edges AS (SELECT a AS u, b AS v FROM pr
                  UNION SELECT b, a FROM pr),
        walk(u, label) AS (
            SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT e.u, w.label FROM edges e JOIN walk w ON e.v = w.u),
        comp AS (SELECT u AS doc_id, min(label) AS rep_id FROM walk
                 GROUP BY u),
        cf AS (SELECT doc_id, {fr} % {FOLD_N} AS cfold FROM comp),
        jl AS (SELECT pr.a, pr.b,
                      {fa} % {FOLD_N} AS fa, {fb} % {FOLD_N} AS fb,
                      x.cfold AS ca, y.cfold AS cb
               FROM pr JOIN cf x ON x.doc_id = pr.a
                       JOIN cf y ON y.doc_id = pr.b),
        agg AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                       CAST(sum(CASE WHEN fa <> fb THEN 1 ELSE 0 END)
                            AS BIGINT) AS x_doc,
                       CAST(sum(CASE WHEN ca <> cb THEN 1 ELSE 0 END)
                            AS BIGINT) AS x_comp
                FROM jl)
        SELECT 'doc_hash' AS strategy, n_pairs, x_doc AS n_cross,
               CAST(1000000 * x_doc // n_pairs AS BIGINT) AS cross_ppm
        FROM agg
        UNION ALL
        SELECT 'component_hash', n_pairs, x_comp,
               CAST(1000000 * x_comp // n_pairs AS BIGINT)
        FROM agg"""

def q_selectivity_audit(spark, sf):
    # the cardinality-estimation error a histogram-only planner makes:
    # for every (lang, source) value pair, compare the
    # independence-assumption estimate n_a·n_b/N against the TRUE
    # conjunctive count — exactly what Spark's CBO does with column
    # stats, made measurable. est/act in exact ppm of N; err signed.
    # Three tiny aggregations (two marginals + one joint), broadcast
    # everywhere.
    d = spark.read.parquet(f"{sf}/documents.parquet")
    n = d.count()
    la = d.groupBy("lang").agg(F.count("*").alias("na"))
    so = d.groupBy("source").agg(F.count("*").alias("nb"))
    joint = d.groupBy("lang", "source").agg(F.count("*").alias("nj"))
    j = (la.crossJoin(so)
         .join(joint, ["lang", "source"], "left")
         .withColumn("nj", F.coalesce(F.col("nj"), F.lit(0))))
    return (j.select(
        "lang", "source",
        F.expr(f"1000000 * na * nb div ({n} * CAST({n} AS BIGINT))")
        .cast("bigint").alias("est_ppm"),
        F.expr(f"1000000 * nj div {n}").cast("bigint").alias("act_ppm"))
        .withColumn("err_ppm",
                    (F.col("est_ppm") - F.col("act_ppm")).cast("bigint")))

def _selectivity_audit_sql() -> str:
    return """
        WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        la AS (SELECT lang, CAST(count(*) AS BIGINT) AS na
               FROM documents GROUP BY 1),
        so AS (SELECT source, CAST(count(*) AS BIGINT) AS nb
               FROM documents GROUP BY 1),
        joint AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS nj
                  FROM documents GROUP BY 1, 2),
        j AS (SELECT la.lang, so.source, la.na, so.nb,
                     coalesce(joint.nj, 0) AS nj, n.n
              FROM la CROSS JOIN so CROSS JOIN n
              LEFT JOIN joint ON joint.lang = la.lang
                             AND joint.source = so.source)
        SELECT lang, source,
               CAST(1000000 * na * nb // (n * n) AS BIGINT) AS est_ppm,
               CAST(1000000 * nj // n AS BIGINT) AS act_ppm,
               CAST(1000000 * na * nb // (n * n)
                    - 1000000 * nj // n AS BIGINT) AS err_ppm
        FROM j"""

def q_rsync_delta(spark, sf):
    # incremental-crawl storage: how much of a re-fetched page does the
    # rsync block protocol re-use? Version B = the doc with a planted
    # 3-token insertion at a content-derived position; A's fixed
    # RSYNC_BLOCK-token blocks match against EVERY B window by hash —
    # an insertion breaks at most the ONE block it lands inside, so
    # n_matched ≥ n_blocks − 1 and the literal tail is the insertion
    # plus the broken block (pytest pins the bound). All array
    # expressions on one row — zero joins, zero shuffles; the block
    # hashes use the portable bridge so DuckDB replays the match.
    from geobuf_spark.functions import phash
    d = _docs(spark, sf)
    toks = F.split("text", " ")
    nA = F.size(toks)
    p = F.pmod(phash.hash60(F.concat(F.lit("ins:"),
                                     F.col("doc_id").cast("string"))),
               nA + 1)
    ins = F.array(F.lit("zz1"), F.lit("zz2"), F.lit("zz3"))
    btoks = F.concat(F.slice(toks, 1, p), ins,
                     F.slice(toks, p + 1, nA - p))
    nb_blocks = nA.cast("int") / F.lit(RSYNC_BLOCK)
    nblocks = F.floor(nb_blocks).cast("int")
    ah = F.transform(
        F.sequence(F.lit(0), nblocks - 1),
        lambda k: phash.hash60(F.concat_ws(
            " ", F.slice(toks, k * RSYNC_BLOCK + 1, RSYNC_BLOCK))))
    nB = F.size(btoks)
    wh = F.transform(
        F.sequence(F.lit(1), nB - (RSYNC_BLOCK - 1)),
        lambda i: phash.hash60(F.concat_ws(
            " ", F.slice(btoks, i, RSYNC_BLOCK))))
    matched = F.size(F.filter(ah, lambda h: F.array_contains(wh, h)))
    out = d.filter(nA >= RSYNC_BLOCK).select(
        "doc_id", nblocks.cast("bigint").alias("n_blocks"),
        matched.cast("bigint").alias("n_matched"),
        (nB - matched * RSYNC_BLOCK).cast("bigint")
        .alias("literal_tokens"))
    return out

def _rsync_delta_sql() -> str:
    from geobuf_spark.functions import phash
    b = RSYNC_BLOCK
    ph = phash.sql_hash60("'ins:' || CAST(doc_id AS VARCHAR)")
    bh = phash.sql_hash60(
        f"array_to_string(list_slice(tk, k * {b} + 1, (k + 1) * {b}),"
        f" chr(32))")
    wh = phash.sql_hash60(
        f"array_to_string(list_slice(bt, i, i + {b - 1}), chr(32))")
    return f"""
        WITH d AS (SELECT doc_id, string_split(text, chr(32)) AS tk
                   FROM documents),
        e AS (SELECT doc_id, tk, len(tk) AS na,
                     {ph} % (len(tk) + 1) AS p
              FROM d WHERE len(tk) >= {b}),
        v AS (SELECT doc_id, tk, na,
                     list_concat(list_concat(
                         list_slice(tk, 1, p), ['zz1', 'zz2', 'zz3']),
                         list_slice(tk, p + 1, na)) AS bt
              FROM e),
        h AS (SELECT doc_id, na // {b} AS nblocks,
                     list_transform(range(0, na // {b}),
                                    k -> {bh}) AS ah,
                     list_transform(range(1, len(bt) - {b - 1} + 1),
                                    i -> {wh}) AS whs,
                     len(bt) AS nb2
              FROM v)
        SELECT doc_id, CAST(nblocks AS BIGINT) AS n_blocks,
               CAST(len(list_filter(ah, x -> list_contains(whs, x)))
                    AS BIGINT) AS n_matched,
               CAST(nb2 - len(list_filter(ah,
                        x -> list_contains(whs, x))) * {b} AS BIGINT)
                   AS literal_tokens
        FROM h"""


def oracles() -> dict[str, str]:
    """DuckDB oracle twins for this module's queries."""
    out = {
        "topk_per_group": """
            SELECT l_returnflag, l_orderkey, l_linenumber, rnk FROM (
                SELECT l_returnflag, l_orderkey, l_linenumber,
                       row_number() OVER (PARTITION BY l_returnflag
                           ORDER BY l_extendedprice DESC, l_orderkey ASC,
                                    l_linenumber ASC) AS rnk
                FROM lineitem) t
            WHERE rnk <= 3""",
        "outlier_mad": _outlier_mad_sql(),
        "trend_slope_weekly": _trend_slope_weekly_sql(),
        "copresence_pairs": _copresence_pairs_sql(),
        "shard_balance": _shard_balance_sql(),
        "anomaly_days": _anomaly_days_sql(),
        "bot_flags": _bot_flags_sql(),
        "fk_audit": _fk_audit_sql(),
        "ship_delay_stats": _ship_delay_stats_sql(),
        "range_bounds_planner": _range_bounds_planner_sql(),
        "ab_lift": _ab_lift_sql(),
        "dow_profile": _dow_profile_sql(),
        "customer_pareto": _customer_pareto_sql(),
        "topk_drift": _topk_drift_sql(),
        "gini_chars": _gini_chars_sql(),
        "kendall_daily": _kendall_daily_sql(),
        "mannwhitney_len": _mannwhitney_len_sql(),
        "autocorr_daily": _autocorr_daily_sql(),
        "fano_dispersion": _fano_dispersion_sql(),
        "trimmed_mean_chars": _trimmed_mean_chars_sql(),
        "rolling_median_7d": _rolling_median_7d_sql(),
        "dow_residual_outliers": _dow_residual_outliers_sql(),
        "basket_pairs": _basket_pairs_sql(),
        "allen_census": _allen_census_sql(),
        "max_coverage_hosts": _max_coverage_hosts_sql(),
        "welch_gate": _welch_gate_sql(),
        "snapshot_reconcile": _snapshot_reconcile_sql(),
        "persistent_heavy_hitters": _persistent_heavy_hitters_sql(),
        "str_pack": _str_pack_sql(),
        "cohens_kappa": _cohens_kappa_sql(),
        "k_anonymity_audit": _k_anonymity_audit_sql(),
        "log_histogram_p99": _log_histogram_p99_sql(),
        "two_phase_median": _two_phase_median_sql(),
        "gapped_sequences": _gapped_sequences_sql(),
        "otsu_threshold": _otsu_threshold_sql(),
        "apriori_triples": _apriori_triples_sql(),
        "kcenter_greedy": _kcenter_greedy_sql(),
        "fold_leakage_audit": _fold_leakage_audit_sql(),
        "selectivity_audit": _selectivity_audit_sql(),
        "rsync_delta": _rsync_delta_sql(),
    }
    return out
