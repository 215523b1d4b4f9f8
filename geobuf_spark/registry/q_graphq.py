"""Registry family: host-graph and graph-analytics queries.

Split out of the former __spark_entry__.py monolith (VERDICT r4 #2);
query functions keep their original text, oracles sit beside them in
this module's oracles(). Driver-window ORDER lives in window.py, not here.

Queries here (32):
bfs_hops3, bipartite_check, boruvka_round1, cluster_diameter,
clustering_coeff, consistent_shards, coreness, dag_layers,
dbscan_clusters, dbscan_core, degree_assortativity, diameter_sweep,
emst_clusters, hits_hosts, influence_spread, kcore_hosts,
ktruss_edges, link_prediction_ra, link_reciprocity, lpa_communities,
markov_predict_eval, markov_stationary, maximal_matching, mis_luby,
pagerank_hosts, power_iteration, ppr_hosts, redirect_resolve,
rich_club, sssp_w3, stable_matching, triangle_hosts
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


def q_hits_hosts(spark, sf):
    # HITS hubs/authorities over the host link graph — 2 integer
    # fixed-point iterations with max-normalization (one 1-row global agg
    # per half-step, broadcast back); every step BIGINT so the DuckDB twin
    # chains the identical CTEs. One shuffle per half-step.
    from geobuf_spark.operators import graph
    e = _page_link_edges(spark, 2000).select(
        F.col("src_host").alias("src"),
        TXT.url_host(F.col("dst")).alias("dst"))
    r = graph.hits_int(e, iters=2)
    return (r.orderBy(F.desc("auth_ppm"), F.desc("hub_ppm"), F.asc("host"))
             .limit(25))

def q_triangle_hosts(spark, sf):
    # exact triangle census + global clustering coefficient of the host
    # link graph — the cohesion measure pagerank/HITS (importance) don't
    # give. Degree-ordered compact-forward orientation bounds the wedge
    # join; see graph.triangle_stats for the 10^8-host plan notes.
    from geobuf_spark.operators import graph
    ed = _page_link_edges(spark, 2000).select(
        "src_host", TXT.url_host(F.col("dst")).alias("dst_host"))
    return graph.triangle_stats(ed, "src_host", "dst_host")

def _triangle_hosts_sql() -> str:
    """Oracle for q_triangle_hosts: regenerated link edges mapped to host
    pairs, then the brute u<v<w three-way join (graph.sql_triangle_stats)."""
    from geobuf_spark.operators import graph
    cte = (_links_cte() + f""",
        ed AS (SELECT src_host AS src, {TXT.sql_url_host('dst')} AS dst
               FROM e)""")
    return graph.sql_triangle_stats(cte, "src", "dst")

def q_link_reciprocity(spark, sf):
    # graph reciprocity: the share of directed host links whose reverse
    # edge also exists — one row (n_edges, n_reciprocal,
    # reciprocity_ppm). Distinct directed pairs, then a self-join on the
    # swapped key; left_semi keeps it set-shaped.
    e = (_page_link_edges(spark, 2000)
         .select("src_host", TXT.url_host(F.col("dst")).alias("dst_host"))
         .filter(F.col("src_host") != F.col("dst_host"))
         .distinct().localCheckpoint(eager=False))
    rev = e.select(F.col("dst_host").alias("src_host"),
                   F.col("src_host").alias("dst_host"))
    recip = e.join(rev, ["src_host", "dst_host"], "left_semi")
    return (e.agg(F.count("*").alias("n_edges"))
            .crossJoin(recip.agg(F.count("*").alias("n_reciprocal")))
            .select("n_edges", "n_reciprocal",
                    F.expr("n_reciprocal * 1000000 div n_edges")
                    .alias("reciprocity_ppm")))

def _link_reciprocity_sql() -> str:
    """Oracle for q_link_reciprocity over the regenerated edges."""
    return f"""
        WITH {_links_cte()},
        ed AS (SELECT DISTINCT src_host AS s, {TXT.sql_url_host('dst')} AS d
               FROM e WHERE src_host <> {TXT.sql_url_host('dst')}),
        r AS (SELECT count(*) AS n_reciprocal
              FROM ed a WHERE EXISTS (SELECT 1 FROM ed b
                                      WHERE b.s = a.d AND b.d = a.s)),
        n AS (SELECT count(*) AS n_edges FROM ed)
        SELECT CAST(n_edges AS BIGINT) AS n_edges,
               CAST(n_reciprocal AS BIGINT) AS n_reciprocal,
               CAST(n_reciprocal * 1000000 // n_edges AS BIGINT)
                   AS reciprocity_ppm
        FROM n, r"""

def q_pagerank_hosts(spark, sf):
    # Host-authority PageRank over the link graph — 3 synchronous integer
    # fixed-point iterations (operators/graph.pagerank_int): every step is
    # BIGINT arithmetic, so the result is bit-exact across engines and
    # partitionings (no float summation-order sensitivity) and the DuckDB
    # oracle chains the SAME iterations as CTEs. One shuffle per iteration
    # (edges ⋈ ranks, groupBy dst with partial sums); rank/degree tables
    # are hosts-sized, broadcast by AQE when they fit. Top-25 by rank with
    # a (rank_ppm, host) total order.
    from geobuf_spark.operators import graph
    e = _page_link_edges(spark, 2000).select(
        F.col("src_host").alias("src"),
        TXT.url_host(F.col("dst")).alias("dst"))
    r = graph.pagerank_int(e, iters=3)
    return r.orderBy(F.desc("rank_ppm"), F.asc("host")).limit(25)

def q_clustering_coeff(spark, sf):
    # per-host LOCAL clustering coefficient — triangle_hosts gives the
    # global census, this grades each host's neighborhood cohesion
    # (link-farm rings score near 1e6 ppm, organic hubs near 0). Exact
    # integers end-to-end; the compact-forward orientation finds each
    # triangle once and ONE explode credits its three corners
    # (graph.local_clustering for the 10^8-host plan notes).
    from geobuf_spark.operators import graph
    return graph.local_clustering(_host_edges(spark), "src_host", "dst_host")

def _clustering_coeff_sql() -> str:
    """Oracle for q_clustering_coeff: brute per-corner wedge close over
    the regenerated edges (graph.sql_local_clustering)."""
    from geobuf_spark.operators import graph
    return graph.sql_local_clustering(_host_edges_cte(), "src", "dst")

def q_link_prediction_ra(spark, sf):
    # link prediction by resource allocation: non-adjacent host pairs
    # ranked by Σ 1/deg(z) over common neighbors z, in exact pico-units
    # (RA beats raw common-neighbor counts by discounting promiscuous
    # hubs, and unlike Adamic-Adar needs no log — so the fixed-point form
    # hashes identically on both engines). min_common=2 is the same
    # fan-out cap contract as cocitation_pairs.
    from geobuf_spark.operators import graph
    return graph.resource_allocation(_host_edges(spark),
                                     "src_host", "dst_host", min_common=2)

def _link_prediction_ra_sql() -> str:
    from geobuf_spark.operators import graph
    return graph.sql_resource_allocation(_host_edges_cte(), "src", "dst",
                                         min_common=2)

def q_bfs_hops3(spark, sf):
    # multi-source BFS: hop distance (≤3) from the round-number seed
    # hosts (site*00.example) over the undirected host graph — the
    # "crawl frontier depth" query. Each round is one join + one min-agg
    # shuffle with lineage checkpoints (graph.bfs_hops); the oracle
    # unrolls the same rounds as CTEs.
    from geobuf_spark.operators import graph
    ed = _host_edges(spark)
    nodes = (ed.select(F.col("src_host").alias("host"))
             .unionByName(ed.select(F.col("dst_host").alias("host")))
             .distinct())
    seeds = nodes.filter(F.col("host").endswith("00.example"))
    return graph.bfs_hops(ed, seeds, max_hops=3,
                          src="src_host", dst="dst_host")

def _bfs_hops3_sql() -> str:
    from geobuf_spark.operators import graph
    return graph.sql_bfs_hops(_host_edges_cte(),
                              "n LIKE '%00.example'", max_hops=3,
                              src="src", dst="dst")

def q_dbscan_core(spark, sf):
    # DBSCAN's expensive step — eps-neighbourhood counting — as a 3x3
    # grid-cell join over the clustered point mint (point-level density,
    # vs hotspot_clusters' tile-count density): each point probes its 9
    # neighbour cells at cell = eps, exact integer d² ≤ eps² refine, core
    # flag at ≥ DBSCAN_MIN_NBRS. Never all-pairs; cells bound candidates
    # by local density, the 100 TB shape (salting applies to hot cells).
    p = minted.minted_cluster_points_q(spark, sf)
    a = (p.select(F.col("doc_id").alias("a_id"),
                  F.col("qx").alias("ax"), F.col("qy").alias("ay"))
         .withColumn("dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
         .withColumn("dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
         .withColumn("cx", F.expr(f"ax div {DBSCAN_EPS} + dx"))
         .withColumn("cy", F.expr(f"ay div {DBSCAN_EPS} + dy")))
    b = p.select(F.col("doc_id").alias("b_id"),
                 F.col("qx").alias("bx"), F.col("qy").alias("by"),
                 F.expr(f"qx div {DBSCAN_EPS}").alias("cx"),
                 F.expr(f"qy div {DBSCAN_EPS}").alias("cy"))
    nbrs = (a.join(b, ["cx", "cy"])
            .filter((F.col("a_id") != F.col("b_id"))
                    & ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
                       + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
                       <= DBSCAN_EPS * DBSCAN_EPS))
            .groupBy("a_id").agg(F.count("*").alias("n_nbrs")))
    return (p.select(F.col("doc_id"), F.col("qx"), F.col("qy"))
            .join(nbrs.withColumnRenamed("a_id", "doc_id"), "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_nbrs", F.lit(0)).alias("n_nbrs"),
                    (F.coalesce("n_nbrs", F.lit(0)) >= DBSCAN_MIN_NBRS)
                    .alias("is_core")))

def _dbscan_core_sql() -> str:
    eps = DBSCAN_EPS
    return f"""
        WITH p AS ({minted.sql_minted_cluster_points_q()}),
        a AS (SELECT doc_id AS a_id, qx AS ax, qy AS ay,
                     qx // {eps} + dxs.dx AS cx, qy // {eps} + dys.dy AS cy
              FROM p,
              LATERAL (SELECT unnest(range(-1, 2)) AS dx) dxs,
              LATERAL (SELECT unnest(range(-1, 2)) AS dy) dys),
        b AS (SELECT doc_id AS b_id, qx AS bx, qy AS by,
                     qx // {eps} AS cx, qy // {eps} AS cy
              FROM p),
        n AS (SELECT a_id, count(*) AS n_nbrs
              FROM a JOIN b ON a.cx = b.cx AND a.cy = b.cy
                           AND a_id <> b_id
              WHERE (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
                    <= {eps * eps}
              GROUP BY 1)
        SELECT p.doc_id, coalesce(n.n_nbrs, 0) AS n_nbrs,
               coalesce(n.n_nbrs, 0) >= {DBSCAN_MIN_NBRS} AS is_core
        FROM p LEFT JOIN n ON p.doc_id = n.a_id"""

def q_kcore_hosts(spark, sf):
    # k-core decomposition (k=2) by synchronous peeling over the host
    # link graph: drop degree-<k nodes, re-derive degrees, repeat — the
    # graph-cleaning pass that strips leaf chains before community /
    # centrality work. KCORE_ROUNDS fixed rounds (pytest pins the
    # fixpoint on this fixture); each round is one degree aggregation +
    # two semi-joins, lineage cut per round like the pagerank iterations.
    und = (_host_edges(spark, 2000)
           .filter(F.col("src_host") != F.col("dst_host"))
           .select(F.least("src_host", "dst_host").alias("u"),
                   F.greatest("src_host", "dst_host").alias("v"))
           .distinct()
           .localCheckpoint(eager=False))
    e = und
    for _ in range(KCORE_ROUNDS):
        deg = (e.select(F.col("u").alias("n"))
               .unionByName(e.select(F.col("v").alias("n")))
               .groupBy("n").agg(F.count("*").alias("c")))
        keep = deg.filter(F.col("c") >= KCORE_K).select("n")
        e = (e.join(keep.withColumnRenamed("n", "u"), "u", "left_semi")
             .join(keep.withColumnRenamed("n", "v"), "v", "left_semi")
             .localCheckpoint(eager=False))
    return (e.select(F.col("u").alias("n"))
            .unionByName(e.select(F.col("v").alias("n")))
            .groupBy("n").agg(F.count("*").alias("degree"))
            .select(F.col("n").alias("host"), "degree"))

def _kcore_hosts_sql() -> str:
    parts = [f"""{_host_edges_cte()},
        ke0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u,
                       greatest(src, dst) AS v
                FROM ed WHERE src <> dst)"""]
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(f"""
        kd{r} AS MATERIALIZED (SELECT n, count(*) AS c FROM (
                      SELECT u AS n FROM ke{r - 1}
                      UNION ALL SELECT v AS n FROM ke{r - 1})
                  GROUP BY 1),
        kk{r} AS (SELECT n FROM kd{r} WHERE c >= {KCORE_K}),
        ke{r} AS MATERIALIZED (SELECT e.u, e.v FROM ke{r - 1} e
                  JOIN kk{r} a ON e.u = a.n JOIN kk{r} b ON e.v = b.n)""")
    final = KCORE_ROUNDS
    return ("WITH " + ",".join(parts) + f"""
        SELECT n AS host, count(*) AS degree FROM (
            SELECT u AS n FROM ke{final}
            UNION ALL SELECT v AS n FROM ke{final})
        GROUP BY 1""")

def q_cluster_diameter(spark, sf):
    # exact per-cluster diameter: max pairwise d² inside each minted
    # cluster with a deterministic witness pair (smallest (a,b) among
    # maxima, via packed-min — never min(a),min(b) across different
    # pairs). Equi-join on the cluster id only — quadratic in CLUSTER
    # size, never corpus size; the 100 TB path runs convex hull +
    # rotating calipers per cluster, this is the exact small-cluster
    # tier. d² ≤ (7e7)² ≈ 5e15 — int64-safe.
    p = (minted.minted_cluster_points_q(spark, sf)
         .withColumn("gid", F.col("doc_id") % minted.N_CLUSTERS))
    a = p.select("gid", F.col("doc_id").alias("a_id"),
                 F.col("qx").alias("ax"), F.col("qy").alias("ay"))
    b = p.select("gid", F.col("doc_id").alias("b_id"),
                 F.col("qx").alias("bx"), F.col("qy").alias("by"))
    d2 = ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
          + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")))
    pairs = (a.join(b, ["gid"]).filter(F.col("a_id") < F.col("b_id"))
             .select("gid", "a_id", "b_id", d2.alias("d2"))
             .localCheckpoint(eager=False))  # feeds max + witness passes
    mx = pairs.groupBy("gid").agg(F.max("d2").alias("max_d2"))
    npts = p.groupBy("gid").agg(F.count("*").alias("n_pts"))
    wit = (pairs.join(mx, "gid")
           .filter(F.col("d2") == F.col("max_d2"))
           .groupBy("gid")
           .agg(F.min(F.col("a_id") * DIAM_PACK + F.col("b_id"))
                .alias("pack")))
    return (npts.join(mx, "gid").join(wit, "gid")
            .select("gid", "n_pts", "max_d2",
                    F.expr(f"pack div {DIAM_PACK}").alias("diam_a"),
                    F.expr(f"pack % {DIAM_PACK}").alias("diam_b")))

def _cluster_diameter_sql() -> str:
    pts = minted.sql_minted_cluster_points_q()
    return f"""
        WITH p AS (SELECT doc_id, qx, qy, doc_id % {minted.N_CLUSTERS}
                       AS gid
                   FROM ({pts})),
        pr AS (SELECT a.gid, a.doc_id AS a_id, b.doc_id AS b_id,
                      (a.qx - b.qx) * (a.qx - b.qx)
                      + (a.qy - b.qy) * (a.qy - b.qy) AS d2
               FROM p a JOIN p b
                 ON a.gid = b.gid AND a.doc_id < b.doc_id),
        mx AS (SELECT gid, max(d2) AS max_d2 FROM pr GROUP BY 1),
        np AS (SELECT gid, count(*) AS n_pts FROM p GROUP BY 1),
        w AS (SELECT pr.gid,
                     min(a_id * {DIAM_PACK} + b_id) AS pack
              FROM pr JOIN mx ON pr.gid = mx.gid AND pr.d2 = mx.max_d2
              GROUP BY 1)
        SELECT np.gid, np.n_pts, mx.max_d2,
               pack // {DIAM_PACK} AS diam_a,
               pack % {DIAM_PACK} AS diam_b
        FROM np JOIN mx ON np.gid = mx.gid JOIN w ON np.gid = w.gid"""

def q_degree_assortativity(spark, sf):
    # link-graph mixing structure: Pearson correlation between the
    # source's out-degree and the target's in-degree across EDGES —
    # negative r = hubs point at leaves (web-like), positive = rich club.
    # Integer moments (the verifiable payload) + r_e6 from shared float
    # text, exactly the autocorr_daily recipe. Degree tables are
    # host-sized → AQE broadcasts them onto the edge stream; one edge
    # scan, no edge-side shuffle beyond the two degree aggs.
    e = _page_link_edges(spark, 2000).select(
        F.col("src_host").alias("src"),
        TXT.url_host(F.col("dst")).alias("dst"))
    outd = e.groupBy("src").agg(F.count("*").alias("j"))
    ind = e.groupBy("dst").agg(F.count("*").alias("k"))
    em = e.join(outd, "src").join(ind, "dst")
    agg = em.agg(F.count("*").alias("m"),
                 F.sum("j").alias("sj"), F.sum("k").alias("sk"),
                 F.sum(F.col("j") * F.col("j")).alias("sjj"),
                 F.sum(F.col("k") * F.col("k")).alias("skk"),
                 F.sum(F.col("j") * F.col("k")).alias("sjk"))
    return agg.withColumn("r_e6", F.expr(
        "CAST(floor(1000000.0 * CAST(m * sjk - sj * sk AS DOUBLE)"
        " / sqrt(CAST(m * sjj - sj * sj AS DOUBLE)"
        " * CAST(m * skk - sk * sk AS DOUBLE))) AS BIGINT)"))

def _degree_assortativity_sql(n: int = 2000, seed: int = 42) -> str:
    return f"""
        WITH {_links_cte(n, seed)},
        ed AS (SELECT src_host AS src, {TXT.sql_url_host('dst')} AS dst
               FROM e),
        outd AS (SELECT src, count(*) AS j FROM ed GROUP BY 1),
        ind AS (SELECT dst, count(*) AS k FROM ed GROUP BY 1),
        em AS (SELECT outd.j, ind.k
               FROM ed JOIN outd ON ed.src = outd.src
                       JOIN ind ON ed.dst = ind.dst),
        m AS (SELECT count(*) AS m,
                     CAST(sum(j) AS BIGINT) AS sj,
                     CAST(sum(k) AS BIGINT) AS sk,
                     CAST(sum(j * j) AS BIGINT) AS sjj,
                     CAST(sum(k * k) AS BIGINT) AS skk,
                     CAST(sum(j * k) AS BIGINT) AS sjk
              FROM em)
        SELECT m, sj, sk, sjj, skk, sjk,
               CAST(floor(1000000.0 * CAST(m * sjk - sj * sk AS DOUBLE)
                   / sqrt(CAST(m * sjj - sj * sj AS DOUBLE)
                   * CAST(m * skk - sk * sk AS DOUBLE))) AS BIGINT)
                   AS r_e6
        FROM m"""

# ---------------------------------------------------------------------------
# batch 51 — Borůvka round 1: nearest-neighbor forest components
# ---------------------------------------------------------------------------

def q_boruvka_round1(spark, sf):
    # the first round of distributed Borůvka / single-linkage (HDBSCAN's
    # skeleton): every point contracts along its exact nearest-neighbor
    # edge, components of the NN forest become the round-1 clusters.
    # NN from the grid-bucketed radius join (exact lattice d², min per
    # point with a deterministic (d², nb) tie-break); components via
    # min-label + pointer jumping (operators/dedup.near_dup_components —
    # O(log diameter) rounds). Points with no neighbor inside RADIUS_R
    # stay singletons. Output: one row per cluster (rep, size).
    from geobuf_spark.sources.tables import widen
    p = widen(minted.minted_cluster_points_q(spark, sf), spark)
    pairs = sj.radius_self_join(p, r=RADIUS_R)
    both = (pairs.select(F.col("id_a").alias("doc_id"),
                         F.col("id_b").alias("nb"), "dist2")
            .unionByName(pairs.select(F.col("id_b").alias("doc_id"),
                                      F.col("id_a").alias("nb"), "dist2"))
            .localCheckpoint(eager=False))  # feeds min + argmin passes
    nnd = both.groupBy("doc_id").agg(F.min("dist2").alias("nn_d2"))
    nn = (both.join(nnd, "doc_id")
          .filter(F.col("dist2") == F.col("nn_d2"))
          .groupBy("doc_id").agg(F.min("nb").alias("nb")))
    edges = nn.select(F.least("doc_id", "nb").alias("u"),
                      F.greatest("doc_id", "nb").alias("v")).distinct()
    comp = dedup.near_dup_components(edges, "u", "v")
    lab = (p.select("doc_id").join(comp, "doc_id", "left")
           .select("doc_id",
                   F.coalesce("rep_id", "doc_id").alias("rep")))
    return lab.groupBy("rep").agg(F.count("*").alias("n_pts"))

def _boruvka_round1_sql() -> str:
    pts = minted.sql_minted_cluster_points_q()
    return f"""
        WITH RECURSIVE p AS ({pts}),
        cand AS (SELECT a.doc_id, b.doc_id AS nb,
                        CAST(a.qx - b.qx AS HUGEINT) * (a.qx - b.qx)
                        + CAST(a.qy - b.qy AS HUGEINT) * (a.qy - b.qy)
                            AS d2
                 FROM p a JOIN p b ON a.doc_id <> b.doc_id),
        inr AS (SELECT doc_id, nb, d2 FROM cand
                WHERE d2 <= {RADIUS_R}::HUGEINT * {RADIUS_R}),
        nnd AS (SELECT doc_id, min(d2) AS nn_d2 FROM inr GROUP BY 1),
        nn AS (SELECT inr.doc_id, min(nb) AS nb
               FROM inr JOIN nnd ON inr.doc_id = nnd.doc_id
                    AND inr.d2 = nnd.nn_d2
               GROUP BY 1),
        e0 AS (SELECT DISTINCT least(doc_id, nb) AS u,
                      greatest(doc_id, nb) AS v
               FROM nn),
        edges AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
        walk(u, label) AS (
            SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT e.u, w.label FROM edges e JOIN walk w ON e.v = w.u),
        comp AS (SELECT u AS doc_id, min(label) AS rep_id
                 FROM walk GROUP BY u)
        SELECT coalesce(c.rep_id, p.doc_id) AS rep,
               count(*) AS n_pts
        FROM p LEFT JOIN comp c ON c.doc_id = p.doc_id
        GROUP BY 1"""

def q_markov_stationary(spark, sf):
    # behavioral steady state: the empirical event-type transition
    # matrix (per-user consecutive pairs) powered 3 integer fixed-point
    # iterations from the uniform ppm vector — the Markov sibling of
    # pagerank_int, same bit-exactness argument. The matrix is
    # |types|² = 25 rows, so every join broadcasts; the only real
    # shuffle is the transition-pair count.
    from pyspark.sql import Window as Win
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        "user_id", "event_type", "ts", "event_id")
    w = Win.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (e.withColumn("nxt", F.lead("event_type").over(w))
             .filter(F.col("nxt").isNotNull()))
    trans = (pairs.groupBy(F.col("event_type").alias("p"),
                           F.col("nxt").alias("t"))
             .agg(F.count("*").alias("c")))
    rowsum = trans.groupBy("p").agg(F.sum("c").alias("r"))
    trans = trans.join(rowsum, "p").localCheckpoint(eager=False)
    v = (trans.select(F.col("p").alias("event_type")).distinct()
         .withColumn("v", F.lit(MARKOV_V0).cast("bigint")))
    outs = []
    for _ in range(3):
        v = _markov_step(v, trans).localCheckpoint(eager=False)
        outs.append(v)
    out = (outs[0].withColumnRenamed("v", "v1")
           .join(outs[1].withColumnRenamed("v", "v2"), "event_type")
           .join(outs[2].withColumnRenamed("v", "v3"), "event_type"))
    return out

def _markov_stationary_sql() -> str:
    step = """
        v{n} AS (SELECT t AS event_type,
                        CAST(sum(v * c // r) AS BIGINT) AS v
                 FROM trans JOIN v{m} ON trans.p = v{m}.event_type
                 GROUP BY 1)"""
    return f"""
        WITH pr AS (SELECT user_id, event_type, ts, event_id,
                           lead(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS nxt
                    FROM events),
        cnt AS (SELECT event_type AS p, nxt AS t, count(*) AS c
                FROM pr WHERE nxt IS NOT NULL GROUP BY 1, 2),
        rs AS (SELECT p, CAST(sum(c) AS BIGINT) AS r FROM cnt GROUP BY 1),
        trans AS (SELECT cnt.p, cnt.t, CAST(c AS BIGINT) AS c, r
                  FROM cnt JOIN rs ON cnt.p = rs.p),
        v0 AS (SELECT DISTINCT p AS event_type,
                      {MARKOV_V0}::BIGINT AS v
               FROM trans),
        {step.format(n=1, m=0)},
        {step.format(n=2, m=1)},
        {step.format(n=3, m=2)}
        SELECT v1.event_type, v1.v AS v1, v2.v AS v2, v3.v AS v3
        FROM v1 JOIN v2 USING (event_type) JOIN v3 USING (event_type)"""

def q_redirect_resolve(spark, sf):
    # canonical redirect resolution — the URL-graph fixpoint every crawl
    # dedup runs before grouping by final target: follow next-hops to
    # the terminal with POINTER DOUBLING (state[i] ← state[state[i]],
    # depths add), so a depth-d chain resolves in ⌈log₂ d⌉ rounds of
    # self-joins instead of d sequential hops — the only shape that
    # works when 10^12 urls hide 1000-hop chains. Converges or raises
    # (a partial resolve would alias distinct targets).
    ids = spark.range(REDIR_N).select(F.col("id").cast("bigint"))
    st = ids.select(
        "id", _redir_parent_col().alias("nxt"),
        F.when(F.col("id") % 5 == 0, F.lit(0)).otherwise(F.lit(1))
        .cast("bigint").alias("depth"))
    for _ in range(8):  # covers depth ≤ 2^8
        hop = st.select(F.col("id").alias("nxt"),
                        F.col("nxt").alias("nxt2"),
                        F.col("depth").alias("d2"))
        st = (st.join(hop, "nxt")
              .select("id", F.col("nxt2").alias("nxt"),
                      (F.col("depth") + F.col("d2")).alias("depth"))
              .localCheckpoint(eager=True))
    unresolved = st.filter(F.col("nxt") % 5 != 0).limit(1).count()
    if unresolved:
        raise RuntimeError("redirect_resolve: chains deeper than 2^8")
    return (st.select("id", F.col("nxt").alias("final_id"), "depth")
            .groupBy("final_id")
            .agg(F.count("*").alias("n_urls"),
                 F.max("depth").alias("max_depth"),
                 F.sum("depth").alias("total_hops")))

def _redirect_resolve_sql() -> str:
    return f"""
        WITH RECURSIVE ids AS (SELECT CAST(t.id AS BIGINT) AS id
                               FROM range({REDIR_N}) t(id)),
        par AS (SELECT id,
                       CASE WHEN id % 5 = 0 THEN id
                            ELSE greatest(id - (1 + id % 3), 0) END
                           AS nxt
                FROM ids),
        walk(id, cur, depth) AS (
            SELECT id, id, CAST(0 AS BIGINT) FROM ids
            UNION
            SELECT w.id, p.nxt, w.depth + 1
            FROM walk w JOIN par p ON p.id = w.cur
            WHERE w.cur % 5 <> 0),
        fin AS (SELECT id, cur AS final_id, depth FROM walk
                WHERE cur % 5 = 0)
        SELECT final_id, count(*) AS n_urls,
               max(depth) AS max_depth,
               CAST(sum(depth) AS BIGINT) AS total_hops
        FROM fin GROUP BY 1"""

def _host_wedges_cte() -> str:
    h = phash.sql_hash60("least(src, dst) || '>' || greatest(src, dst)")
    return (_host_edges_cte() + f""",
        wed AS (SELECT src, dst, {h} % 90 + 10 AS w FROM ed)""")

def q_sssp_w3(spark, sf):
    # bounded-hop WEIGHTED shortest path from the seed hosts over the
    # link graph with minted integer latencies — the weighted sibling of
    # bfs_hops3 ("cheapest crawl route within 3 hops"). Bellman-Ford
    # with a changed-set frontier (graph.sssp_bounded): round k relaxes
    # only nodes improved in round k-1, so the per-round join shrinks as
    # the wave settles. The oracle is the INDEPENDENT algorithm — full
    # ≤3-edge walk enumeration with one final min, no relaxation — so a
    # green row checks the frontier delta argument end to end.
    from geobuf_spark.operators import graph
    ed = _host_wedges(spark)
    nodes = (ed.select(F.col("src").alias("host"))
             .unionByName(ed.select(F.col("dst").alias("host")))
             .distinct())
    seeds = nodes.filter(F.col("host").endswith("00.example"))
    return graph.sssp_bounded(ed, seeds, max_rounds=3)

def _sssp_w3_sql() -> str:
    from geobuf_spark.operators import graph
    return graph.sql_sssp_bounded(_host_wedges_cte(),
                                  "n LIKE '%00.example'", max_rounds=3)

def q_lpa_communities(spark, sf):
    # community detection over the host link graph by 2 rounds of
    # deterministic synchronous label propagation (graph.lpa_labels:
    # neighbor-majority + one self-vote, ties → lexicographically
    # smallest label — partitioning-invariant by construction). Output
    # is the community census (label, n_hosts), the input to "sample
    # training pages per community" stratification. Oracle: the same
    # rounds as MATERIALIZED chained CTEs — independent engine, same
    # fixpoint; a python brute guards the shared-formula blindness.
    from geobuf_spark.operators import graph
    lab = graph.lpa_labels(
        _host_edges(spark).select(F.col("src_host").alias("src"),
                                  F.col("dst_host").alias("dst")),
        rounds=2)
    return (lab.groupBy(F.col("lab").alias("community"))
            .agg(F.count("*").alias("n_hosts"),
                 F.min("host").alias("first_host")))

def _lpa_communities_sql() -> str:
    from geobuf_spark.operators import graph
    inner = graph.sql_lpa_labels(_host_edges_cte(), rounds=2)
    return f"""
        SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_hosts,
               min(host) AS first_host
        FROM ({inner}) GROUP BY 1"""

def q_consistent_shards(spark, sf):
    # consistent-hashing ring assignment — the shard router that keeps
    # rebalance bounded to 1/V of keys when a vnode joins/leaves. The
    # V=64 vnode ring positions are hash60("vnode:v") computed at PLAN
    # TIME in python (phash.py_hash60 is bit-identical to both engines'
    # column md5), so assignment is a pure projection: successor = the
    # (count of ring positions < h)-th entry of the sorted-position
    # constant array, wrapping past the top — no join, no broadcast;
    # the only exchange is the 64-group balance rollup. Oracle: the
    # INDEPENDENT plan — range()-minted ring, cross join, FILTERed min
    # successor, wrap via global min.
    from geobuf_spark.functions import phash
    ring = sorted((phash.py_hash60(f"vnode:{v}"), v)
                  for v in range(N_VNODES))
    pos_arr = F.array(*[F.lit(p).cast("bigint") for p, _ in ring])
    ids_arr = F.array(*[F.lit(v) for _, v in ring])
    d = _docs(spark, sf).select(
        "doc_id",
        phash.hash60(F.concat(F.lit("doc:"),
                              F.col("doc_id").cast("string"))).alias("h"))
    cnt = F.size(F.filter(pos_arr, lambda p: p < F.col("h")))
    vnode = F.element_at(ids_arr, F.pmod(cnt, F.lit(N_VNODES)) + F.lit(1))
    return (d.withColumn("vnode", vnode)
            .groupBy("vnode")
            .agg(F.count("*").alias("n_docs"),
                 F.min("h").alias("min_h"), F.max("h").alias("max_h"))
            .select(F.col("vnode").cast("int").alias("vnode"),
                    F.col("n_docs").cast("bigint").alias("n_docs"),
                    "min_h", "max_h"))

def _consistent_shards_sql() -> str:
    from geobuf_spark.functions import phash
    vh = phash.sql_hash60("'vnode:' || CAST(v AS VARCHAR)")
    dh = phash.sql_hash60("'doc:' || CAST(doc_id AS VARCHAR)")
    return f"""
        WITH ring AS (SELECT CAST(v AS INT) AS vnode,
                             {vh} AS pos
                      FROM (SELECT CAST(range AS BIGINT) AS v
                            FROM range(0, {N_VNODES}))),
        docs AS (SELECT doc_id, {dh} AS h FROM documents),
        succ AS (SELECT d.doc_id, d.h,
                        coalesce(min(r.pos) FILTER (WHERE r.pos >= d.h),
                                 min(r.pos)) AS tpos
                 FROM docs d CROSS JOIN ring r
                 GROUP BY 1, 2)
        SELECT r.vnode, CAST(count(*) AS BIGINT) AS n_docs,
               min(s.h) AS min_h, max(s.h) AS max_h
        FROM succ s JOIN ring r ON r.pos = s.tpos
        GROUP BY 1"""

def q_maximal_matching(spark, sf):
    # deterministic distributed maximal matching over the host link
    # graph (graph.maximal_matching): handshake rounds on the portable
    # edge-hash order, so the matching — and the 2-approx vertex cover
    # its endpoints form — is partitioning-invariant. The matched pairs
    # are the "merge these two mirrors first" worklist. Oracle: the
    # same rounds as MATERIALIZED CTEs; the pytest independently checks
    # validity (no shared vertex) and maximality (no live edge left).
    from geobuf_spark.operators import graph
    return graph.maximal_matching(
        _host_edges(spark).select(F.col("src_host").alias("src"),
                                  F.col("dst_host").alias("dst")),
        rounds=12)

def _maximal_matching_sql() -> str:
    from geobuf_spark.operators import graph
    return graph.sql_maximal_matching(_host_edges_cte(), rounds=12)

def q_diameter_sweep(spark, sf):
    # graph-diameter lower bound by the classic double BFS sweep: full
    # BFS from the lexicographically smallest host → farthest node w
    # (ties → min host); full BFS from w → its eccentricity, which
    # lower-bounds the diameter (and is exact on trees). Each BFS runs
    # the bfs_hops frontier loop to exhaustion under a DIAM_CAP budget.
    # Output one row: the two sweep endpoints and both eccentricities.
    from geobuf_spark.operators import graph
    ed = (_host_edges(spark)
          .select(F.col("src_host").alias("src"),
                  F.col("dst_host").alias("dst")))
    nodes = (ed.select(F.col("src").alias("host"))
             .unionByName(ed.select(F.col("dst").alias("host")))
             .distinct())
    seed0 = nodes.orderBy("host").limit(1)
    b1 = graph.bfs_hops(ed, seed0, max_hops=DIAM_CAP)
    far1 = (b1.orderBy(F.col("hop").desc(), F.col("host").asc())
            .limit(1).collect()[0])
    b2 = graph.bfs_hops(ed, spark.createDataFrame(
        [(far1["host"],)], ["host"]), max_hops=DIAM_CAP)
    far2 = (b2.orderBy(F.col("hop").desc(), F.col("host").asc())
            .limit(1).collect()[0])
    start = seed0.collect()[0]["host"]
    return spark.createDataFrame(
        [(start, far1["host"], int(far1["hop"]), far2["host"],
          int(far2["hop"]))],
        "start string, far1 string, ecc1 int, far2 string, "
        "diameter_lb int")

def _diameter_sweep_sql() -> str:
    from geobuf_spark.operators import graph
    b1 = graph.sql_bfs_hops(_host_edges_cte(), "n = (SELECT min(n) "
                            "FROM nodes)", max_hops=DIAM_CAP)
    # second sweep: seed = argmax hop of sweep 1 (ties → min host)
    b2 = graph.sql_bfs_hops(
        _host_edges_cte(),
        "n = (SELECT host FROM s1 ORDER BY hop DESC, host LIMIT 1)",
        max_hops=DIAM_CAP)
    return f"""
        WITH s1 AS ({b1}),
        s2 AS ({b2}),
        f1 AS (SELECT host, hop FROM s1
               ORDER BY hop DESC, host LIMIT 1),
        f2 AS (SELECT host, hop FROM s2
               ORDER BY hop DESC, host LIMIT 1),
        st AS (SELECT min(host) AS start FROM s1 WHERE hop = 0)
        SELECT st.start, f1.host AS far1, CAST(f1.hop AS INT) AS ecc1,
               f2.host AS far2, CAST(f2.hop AS INT) AS diameter_lb
        FROM st, f1, f2"""

def q_coreness(spark, sf):
    # full k-core decomposition of the host graph (kcore_hosts peels
    # only k=2): coreness per node via the h-index fixpoint
    # (graph.coreness — c(v) ← h-index of neighbors' values, converges
    # to the exact coreness, convergence-or-raise). The crawl scheduler
    # reads it as "how deep in the mutually-dense web is this host".
    # Oracle: the SAME rounds fixed-length MATERIALIZED; the pytest's
    # sequential peeling is the independent algorithm.
    from geobuf_spark.operators import graph
    c = graph.coreness(
        _host_edges(spark).select(F.col("src_host").alias("src"),
                                  F.col("dst_host").alias("dst")),
        max_rounds=20)
    return (c.groupBy("coreness")
            .agg(F.count("*").alias("n_hosts"),
                 F.min("host").alias("first_host")))

def _coreness_sql() -> str:
    from geobuf_spark.operators import graph
    inner = graph.sql_coreness(_host_edges_cte(), rounds=20)
    return f"""
        SELECT coreness, CAST(count(*) AS BIGINT) AS n_hosts,
               min(host) AS first_host
        FROM ({inner}) GROUP BY 1"""

def q_ktruss_edges(spark, sf):
    # 3-truss of the host link graph: every surviving edge sits in ≥1
    # triangle WITHIN the surviving subgraph — the cohesion peel that
    # kills star-spam which survives k-core (a k-truss is a (k−1)-core
    # but not conversely; kcore_hosts/coreness grade nodes, this grades
    # edges). graph.ktruss is the compact-forward support + peeling
    # fixpoint, convergence-or-raise; the oracle runs the SAME rounds
    # fixed-length MATERIALIZED; the pytest's sequential peeling is the
    # independent algorithm.
    from geobuf_spark.operators import graph
    t = graph.ktruss(
        _host_edges(spark).select(F.col("src_host").alias("src"),
                                  F.col("dst_host").alias("dst")),
        k=KTRUSS_K, max_rounds=KTRUSS_ROUNDS)
    return t.select(F.col("u").alias("host_a"),
                    F.col("v").alias("host_b"), "support")

def _ktruss_edges_sql() -> str:
    from geobuf_spark.operators import graph
    inner = graph.sql_ktruss(_host_edges_cte(), k=KTRUSS_K,
                             rounds=KTRUSS_ROUNDS)
    return f"""
        SELECT u AS host_a, v AS host_b, support FROM ({inner})"""

def q_dbscan_clusters(spark, sf):
    # FULL deterministic DBSCAN (dbscan_core stops at the core flags):
    # cluster id = min core doc_id reachable through core-core eps-edges
    # (min-label + pointer-jump components — dedup.near_dup_components);
    # border points (non-core with a core eps-neighbour) take the MIN
    # neighbouring cluster id — classic DBSCAN leaves border assignment
    # scan-order-dependent, this spec pins the deterministic min so a
    # SQL oracle can replay it; everything else is noise (cluster −1).
    # Never all-pairs: candidates come from the 3×3 cell join, labels
    # from O(log diameter) rounds.
    from geobuf_spark.operators import dedup
    p = minted.minted_cluster_points_q(spark, sf)
    pr = _dbscan_nbr_pairs_spark(spark, sf).localCheckpoint(eager=False)
    core = (pr.groupBy("a_id").agg(F.count("*").alias("n"))
            .filter(F.col("n") >= DBSCAN_MIN_NBRS)
            .select(F.col("a_id").alias("doc_id"))
            .localCheckpoint(eager=False))
    ce = (pr.join(core.withColumnRenamed("doc_id", "a_id"), "a_id")
          .join(core.withColumnRenamed("doc_id", "b_id"), "b_id")
          .filter(F.col("a_id") < F.col("b_id"))
          .select(F.col("a_id").alias("a"), F.col("b_id").alias("b")))
    cc = dedup.near_dup_components(ce)  # (doc_id, rep_id)
    corelab = (core.join(cc, "doc_id", "left")
               .select("doc_id",
                       F.coalesce("rep_id", "doc_id").alias("cluster"))
               .localCheckpoint(eager=False))
    border = (pr.join(corelab.withColumnRenamed("doc_id", "b_id")
                      .withColumnRenamed("cluster", "bcl"), "b_id")
              .join(corelab.select(F.col("doc_id").alias("a_id"))
                    .withColumn("is_core", F.lit(1)), "a_id", "left_anti")
              .groupBy("a_id").agg(F.min("bcl").alias("cluster"))
              .select(F.col("a_id").alias("doc_id"), "cluster"))
    labeled = (corelab.withColumn("role", F.lit("core"))
               .unionByName(border.withColumn("role", F.lit("border"))))
    return (p.select("doc_id").join(labeled, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("cluster", F.lit(-1)).cast("bigint")
                    .alias("cluster"),
                    F.coalesce("role", F.lit("noise")).alias("role")))

def _dbscan_clusters_sql() -> str:
    eps = DBSCAN_EPS
    return f"""
        WITH RECURSIVE p AS ({minted.sql_minted_cluster_points_q()}),
        a AS (SELECT doc_id AS a_id, qx AS ax, qy AS ay,
                     qx // {eps} + dxs.dx AS cx, qy // {eps} + dys.dy AS cy
              FROM p,
              LATERAL (SELECT unnest(range(-1, 2)) AS dx) dxs,
              LATERAL (SELECT unnest(range(-1, 2)) AS dy) dys),
        b AS (SELECT doc_id AS b_id, qx AS bx, qy AS by,
                     qx // {eps} AS cx, qy // {eps} AS cy
              FROM p),
        pr AS (SELECT a_id, b_id FROM a JOIN b
                   ON a.cx = b.cx AND a.cy = b.cy
               WHERE a_id <> b_id
                 AND (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
                     <= {eps * eps}),
        core AS (SELECT a_id AS doc_id FROM pr GROUP BY 1
                 HAVING count(*) >= {DBSCAN_MIN_NBRS}),
        ce AS (SELECT pr.a_id AS u, pr.b_id AS v FROM pr
               JOIN core c1 ON c1.doc_id = pr.a_id
               JOIN core c2 ON c2.doc_id = pr.b_id),
        walk(u, label) AS (
            SELECT u, u AS label FROM (SELECT DISTINCT u FROM ce)
            UNION
            SELECT e.u, w.label FROM ce e JOIN walk w ON e.v = w.u),
        rep AS (SELECT u, min(label) AS rep FROM walk GROUP BY u),
        corelab AS (SELECT c.doc_id,
                           coalesce(r.rep, c.doc_id) AS cluster
                    FROM core c LEFT JOIN rep r ON r.u = c.doc_id),
        border AS (SELECT pr.a_id AS doc_id, min(cl.cluster) AS cluster
                   FROM pr JOIN corelab cl ON cl.doc_id = pr.b_id
                   WHERE pr.a_id NOT IN (SELECT doc_id FROM corelab)
                   GROUP BY 1)
        SELECT p.doc_id,
               CAST(coalesce(cl.cluster, bo.cluster, -1) AS BIGINT)
                   AS cluster,
               CASE WHEN cl.doc_id IS NOT NULL THEN 'core'
                    WHEN bo.doc_id IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS role
        FROM p LEFT JOIN corelab cl ON cl.doc_id = p.doc_id
               LEFT JOIN border bo ON bo.doc_id = p.doc_id"""

def q_power_iteration(spark, sf):
    # dominant eigenvector of the embedding covariance by quantized
    # integer power iteration — the PCA first component, computed so
    # both engines produce BIT-IDENTICAL vectors: the covariance
    # numerator (embed_covariance's exact integers) is downscaled by
    # 2^20 into a deterministic int64 matrix C', and each round is
    # w = C'·v followed by v ← w div (max|w| div SCALE) — integer-only
    # normalization (toward-zero div matches across engines), no floats
    # anywhere. PI_ROUNDS rounds from the all-ones vector; the pytest checks
    # the exact integer trajectory against numpy AND that the direction
    # converges to numpy's float dominant eigenvector of C'.
    e = _emb(spark, sf)
    q = e.select("vec_id", F.posexplode(
        F.transform("embedding",
                    lambda x: F.floor(x.cast("double") * EMB_COV_SCALE)
                    .cast("bigint"))).alias("i", "qi"))
    a = q.select("vec_id", "i", "qi")
    b = q.select("vec_id", F.col("i").alias("j"),
                 F.col("qi").alias("qj"))
    mom = (a.join(b, "vec_id").filter(F.col("i") <= F.col("j"))
           .groupBy("i", "j")
           .agg(F.count("*").alias("n"), F.sum("qi").alias("s_i"),
                F.sum("qj").alias("s_j"),
                F.sum(F.col("qi") * F.col("qj")).alias("s_ij")))
    upper = mom.select("i", "j", F.expr(
        f"(n * s_ij - s_i * s_j) div {PI_SHIFT}").alias("c"))
    C = (upper.unionByName(
            upper.filter(F.col("i") != F.col("j"))
            .select(F.col("j").alias("i"), F.col("i").alias("j"), "c"))
         .localCheckpoint(eager=False))
    v = C.select(F.col("i").alias("j")).distinct() \
         .withColumn("v", F.lit(PI_SCALE).cast("bigint"))
    for _ in range(PI_ROUNDS):
        w = (C.join(v, "j")
             .groupBy("i").agg(F.sum(F.col("c") * F.col("v"))
                               .alias("w")))
        m = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        v = (w.crossJoin(F.broadcast(m))
             .select(F.col("i").alias("j"),
                     F.expr(f"w div (m div {PI_SCALE})").alias("v"))
             .localCheckpoint(eager=False))
    return v.select(F.col("j").cast("int").alias("dim"),
                    F.col("v").cast("bigint").alias("v"))

def _power_iteration_sql() -> str:
    steps = []
    for r in range(1, PI_ROUNDS + 1):
        steps.append(f"""
        w{r} AS (SELECT c.i, CAST(sum(c.c * v.v) AS BIGINT) AS w
                 FROM pic c JOIN v{r - 1} v ON v.j = c.j GROUP BY 1),
        m{r} AS (SELECT max(abs(w)) AS m FROM w{r}),
        v{r} AS MATERIALIZED (
            SELECT w.i AS j, CAST(w.w // (m.m // {PI_SCALE}) AS BIGINT)
                       AS v
            FROM w{r} w, m{r} m)""")
    return f"""
        WITH q AS (SELECT vec_id, i - 1 AS i,
                          CAST(floor(CAST(e AS DOUBLE)
                                     * {EMB_COV_SCALE}) AS BIGINT)
                              AS qi
                   FROM (SELECT vec_id, unnest(embedding) AS e,
                                generate_subscripts(embedding, 1) AS i
                         FROM embeddings)),
        mom AS (SELECT a.i, b.i AS j, count(*) AS n,
                       sum(a.qi) AS s_i, sum(b.qi) AS s_j,
                       sum(a.qi * b.qi) AS s_ij
                FROM q a JOIN q b ON a.vec_id = b.vec_id
                    AND a.i <= b.i
                GROUP BY 1, 2),
        upperc AS (SELECT i, j,
                          CAST((n * s_ij - s_i * s_j) // {PI_SHIFT}
                               AS BIGINT) AS c
                   FROM mom),
        pic AS MATERIALIZED (
            SELECT i, j, c FROM upperc
            UNION ALL
            SELECT j AS i, i AS j, c FROM upperc WHERE i <> j),
        v0 AS (SELECT DISTINCT j, CAST({PI_SCALE} AS BIGINT) AS v
               FROM pic),
        {','.join(steps)}
        SELECT CAST(j AS INT) AS dim, v FROM v{PI_ROUNDS}"""

def q_bipartite_check(spark, sf):
    # per-component bipartiteness audit of the host graph — the odd-
    # cycle detector (a bipartite link structure is the mirror/feed
    # signature; odd cycles mean organic cross-linking). ONE fused
    # min-label loop computes components AND BFS levels: each node
    # starts as its own label; synchronous min-propagation spreads the
    # component minimum (the representative) outward exactly one hop
    # per round, so the round of a node's LAST label improvement is its
    # BFS distance from the rep. Level parity two-colors the component;
    # an edge joining EQUAL levels witnesses an odd cycle. Converge-or-
    # raise within BIP_CAP; the oracle runs the same rounds fixed-
    # length (past the fixpoint they are no-ops). O(E) per round, no
    # transitive closure anywhere.
    ed = _host_edges(spark).select(F.col("src_host").alias("src"),
                                   F.col("dst_host").alias("dst"))
    und = (ed.select(F.least("src", "dst").alias("u"),
                     F.greatest("src", "dst").alias("v"))
           .filter(F.col("u") != F.col("v")).distinct()
           .localCheckpoint(eager=False))
    adj = (und.select(F.col("u").alias("n"), F.col("v").alias("nb"))
           .unionAll(und.select(F.col("v").alias("n"),
                                F.col("u").alias("nb")))
           .localCheckpoint(eager=False))
    st = (adj.select("n").distinct()
          .select("n", F.col("n").alias("lab"), F.lit(0).alias("hop")))
    converged = False
    for r in range(1, BIP_CAP + 1):
        cand = (adj.join(st.select(F.col("n").alias("nb"),
                                   F.col("lab").alias("nlab")), "nb")
                .groupBy("n").agg(F.min("nlab").alias("cand")))
        new = (st.join(cand, "n")
               .select("n",
                       F.least("lab", "cand").alias("newlab"),
                       F.when(F.col("cand") < F.col("lab"), F.lit(r))
                       .otherwise(F.col("hop")).alias("hop"),
                       F.col("lab").alias("old"))
               .localCheckpoint(eager=True))
        changed = new.filter(F.col("newlab") != F.col("old")) \
                     .limit(1).count()
        st = new.select("n", F.col("newlab").alias("lab"), "hop")
        if changed == 0:
            converged = True
            break
    if not converged:
        raise ValueError(
            f"bipartite_check did not converge in {BIP_CAP} rounds")
    ec = (und.join(st.select(F.col("n").alias("u"),
                             F.col("lab").alias("rep"),
                             F.col("hop").alias("hu")), "u")
          .join(st.select(F.col("n").alias("v"),
                          F.col("hop").alias("hv")), "v"))
    per = (ec.groupBy("rep")
           .agg(F.count("*").alias("n_edges"),
                F.sum((F.col("hu") == F.col("hv")).cast("long"))
                .alias("n_conflicts")))
    nn = st.groupBy("lab").agg(F.count("*").alias("n_nodes"))
    return (per.join(nn.withColumnRenamed("lab", "rep"), "rep")
            .select(F.col("rep").alias("rep_host"),
                    F.col("n_nodes").cast("bigint"),
                    F.col("n_edges").cast("bigint"),
                    F.col("n_conflicts").cast("bigint"),
                    (F.col("n_conflicts") == 0).alias("is_bipartite")))

def _bipartite_check_sql() -> str:
    steps = []
    for r in range(1, BIP_CAP + 1):
        p = r - 1
        steps.append(f"""
        c{r} AS (SELECT a.n, min(s.lab) AS cand
                 FROM adj a JOIN s{p} s ON s.n = a.nb GROUP BY 1),
        s{r} AS MATERIALIZED (
            SELECT s.n, least(s.lab, c.cand) AS lab,
                   CASE WHEN c.cand < s.lab THEN {r} ELSE s.hop END
                       AS hop
            FROM s{p} s JOIN c{r} c ON c.n = s.n)""")
    return f"""
        WITH {_host_edges_cte()},
        und AS (SELECT DISTINCT least(src, dst) AS u,
                                greatest(src, dst) AS v
                FROM ed WHERE src <> dst),
        adj AS (SELECT u AS n, v AS nb FROM und
                UNION ALL SELECT v AS n, u AS nb FROM und),
        s0 AS MATERIALIZED (
            SELECT n, n AS lab, 0 AS hop
            FROM (SELECT DISTINCT n FROM adj)),
        {','.join(steps)},
        lv AS (SELECT n, lab, hop FROM s{BIP_CAP}),
        ec AS (SELECT lu.lab AS rep, lu.hop AS hu, lw.hop AS hv
               FROM und JOIN lv lu ON lu.n = und.u
                        JOIN lv lw ON lw.n = und.v),
        per AS (SELECT rep, count(*) AS n_edges,
                       sum(CASE WHEN hu = hv THEN 1 ELSE 0 END)
                           AS n_conflicts
                FROM ec GROUP BY 1),
        nn AS (SELECT lab AS rep, count(*) AS n_nodes FROM lv
               GROUP BY 1)
        SELECT per.rep AS rep_host,
               CAST(n_nodes AS BIGINT) AS n_nodes,
               CAST(n_edges AS BIGINT) AS n_edges,
               CAST(n_conflicts AS BIGINT) AS n_conflicts,
               n_conflicts = 0 AS is_bipartite
        FROM per JOIN nn USING (rep)"""

def q_stable_matching(spark, sf):
    # proposer-optimal stable matching by SIMULTANEOUS-proposal
    # Gale–Shapley (all free proposers propose each round, acceptors
    # hold their best; converges to the same unique proposer-optimal
    # matching as the sequential algorithm): the assignment-with-
    # preferences shape (crawl slots, shard leases, reviewer routing).
    # Preferences are deterministic md5 orders — proposer u ranks slots
    # by hash60('sm-p',u,s), slot s compares proposers by
    # hash60('sm-a',s,u) directly (unique ⇒ tie-free). Pointers only
    # ever advance (each proposer walks his list once — the classic
    # O(U·S) total-work bound), converge-or-raise within SM_ROUNDS; the
    # oracle replays the same rounds fixed-length.
    from geobuf_spark.functions import phash
    from pyspark.sql import Window as Win
    users = (spark.read.parquet(f"{sf}/events.parquet")
             .select("user_id").distinct()
             .withColumn("urk", F.row_number().over(
                 Win.orderBy("user_id")))
             .filter(F.col("urk") <= SM_U).select(F.col("user_id")
                                                  .alias("u")))
    slots = spark.range(SM_S).select(F.col("id").alias("s"))
    cart = users.crossJoin(F.broadcast(slots))
    pref = (cart.select("u", "s",
                        phash.hash60_parts(F.lit("sm-p"), F.col("u"),
                                           F.col("s")).alias("ph"))
            .withColumn("rk", F.row_number().over(
                Win.partitionBy("u").orderBy("ph", "s")))
            .select("u", "s", "rk").localCheckpoint(eager=False))
    apref = (cart.select("s", "u",
                         phash.hash60_parts(F.lit("sm-a"), F.col("s"),
                                            F.col("u")).alias("ah"))
             .localCheckpoint(eager=False))
    ptr = users.select("u", F.lit(1).alias("ptr"))
    held = spark.createDataFrame([], "s long, u long")
    converged = False
    for _ in range(SM_ROUNDS):
        free = (ptr.filter(F.col("ptr") <= SM_S)
                .join(held.select("u"), "u", "left_anti"))
        prefj = pref.select(F.col("u").alias("pu"),
                            F.col("s").alias("ps"),
                            F.col("rk").alias("prk"))
        props = (free.join(prefj, (free["u"] == F.col("pu"))
                           & (free["ptr"] == F.col("prk")))
                 .select(F.col("ps").alias("s"),
                         F.col("pu").alias("u"))
                 .localCheckpoint(eager=True))
        if props.count() == 0:
            converged = True
            break
        cont = props.unionByName(held)
        aprefj = apref.select(F.col("s").alias("as2"),
                              F.col("u").alias("au2"), "ah")
        held = (cont.join(aprefj, (cont["s"] == F.col("as2"))
                          & (cont["u"] == F.col("au2")))
                .groupBy("s").agg(F.expr("min_by(u, ah)").alias("u"))
                .localCheckpoint(eager=True))
        ptr = (ptr.join(props.select("u").withColumn("adv", F.lit(1)),
                        "u", "left")
               .select("u", (F.col("ptr")
                             + F.coalesce("adv", F.lit(0))).alias("ptr"))
               .localCheckpoint(eager=True))
    if not converged:
        raise ValueError(
            f"stable_matching did not converge in {SM_ROUNDS} rounds")
    preff = pref.select(F.col("u").alias("fu"),
                        F.col("s").alias("fs"),
                        F.col("rk").alias("frk"))
    return (held.join(preff, (held["u"] == F.col("fu"))
                      & (held["s"] == F.col("fs")))
            .select(F.col("fs").cast("bigint").alias("slot"),
                    F.col("fu").cast("bigint").alias("user"),
                    F.col("frk").cast("int").alias("proposer_rank")))

def _stable_matching_sql() -> str:
    from geobuf_spark.functions import phash
    ph = phash.sql_hash60_parts("'sm-p'", "u", "s")
    ah = phash.sql_hash60_parts("'sm-a'", "s", "u")
    steps = []
    for r in range(1, SM_ROUNDS + 1):
        p = r - 1
        steps.append(f"""
        fr{r} AS (SELECT p.u, p.ptr FROM p{p} p
                  WHERE p.ptr <= {SM_S}
                    AND p.u NOT IN (SELECT u FROM h{p})),
        pr{r} AS (SELECT pr.s, pr.u FROM fr{r} f
                  JOIN pref pr ON pr.u = f.u AND pr.rk = f.ptr),
        h{r} AS MATERIALIZED (
            SELECT c.s, arg_min(c.u, a.ah) AS u
            FROM (SELECT s, u FROM pr{r}
                  UNION ALL SELECT s, u FROM h{p}) c
            JOIN apref a ON a.s = c.s AND a.u = c.u
            GROUP BY c.s),
        p{r} AS MATERIALIZED (
            SELECT p.u, p.ptr + CASE WHEN p.u IN (SELECT u FROM pr{r})
                                     THEN 1 ELSE 0 END AS ptr
            FROM p{p} p)""")
    return f"""
        WITH su AS (SELECT u FROM (
                SELECT user_id AS u, row_number() OVER
                    (ORDER BY user_id) AS urk
                FROM (SELECT DISTINCT user_id FROM events))
            WHERE urk <= {SM_U}),
        sl AS (SELECT unnest(range(0, {SM_S})) AS s),
        cart AS (SELECT u, s FROM su, sl),
        pref AS MATERIALIZED (
            SELECT u, s, row_number() OVER (PARTITION BY u
                ORDER BY {ph}, s) AS rk
            FROM cart),
        apref AS MATERIALIZED (
            SELECT s, u, {ah} AS ah FROM cart),
        p0 AS (SELECT u, 1 AS ptr FROM su),
        h0 AS (SELECT CAST(NULL AS BIGINT) AS s,
                      CAST(NULL AS BIGINT) AS u WHERE false),
        {','.join(steps)}
        SELECT CAST(h.s AS BIGINT) AS slot, CAST(h.u AS BIGINT)
                   AS "user",
               CAST(pr.rk AS INT) AS proposer_rank
        FROM h{SM_ROUNDS} h JOIN pref pr ON pr.u = h.u AND pr.s = h.s"""

def q_markov_predict_eval(spark, sf):
    # does the event-transition matrix actually predict? Train on even
    # user_ids (transition counts prev→next), predict the argmax next
    # type (tie → lexicographic min), evaluate on odd users'
    # transitions — the honest train/eval split version of
    # markov_stationary's matrix. Per prev type: eval count, hits,
    # accuracy ppm, and the predicted label. Window lag per user, two
    # aggregations, exact integers end to end.
    from pyspark.sql import Window as Win
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        "user_id", "ts", "event_id", "event_type")
    wu = Win.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (e.withColumn("nxt", F.lead("event_type").over(wu))
          .filter(F.col("nxt").isNotNull())
          .select("user_id", F.col("event_type").alias("prev"), "nxt"))
    train = (tr.filter(F.col("user_id") % 2 == 0)
             .groupBy("prev", "nxt").agg(F.count("*").alias("c")))
    wp = Win.partitionBy("prev").orderBy(F.col("c").desc(),
                                         F.col("nxt").asc())
    pred = (train.withColumn("rk", F.row_number().over(wp))
            .filter(F.col("rk") == 1)
            .select("prev", F.col("nxt").alias("predicted")))
    ev = (tr.filter(F.col("user_id") % 2 == 1)
          .join(pred, "prev")
          .groupBy("prev", "predicted")
          .agg(F.count("*").alias("n_eval"),
               F.sum((F.col("nxt") == F.col("predicted")).cast("long"))
               .alias("n_hits")))
    return ev.select("prev", "predicted",
                     F.col("n_eval").cast("bigint"),
                     F.col("n_hits").cast("bigint"),
                     F.expr("1000000 * n_hits div n_eval")
                     .cast("bigint").alias("acc_ppm"))

def _markov_predict_eval_sql() -> str:
    return """
        WITH e AS (SELECT user_id, event_type, ts, event_id
                   FROM events),
        tr AS (SELECT user_id, event_type AS prev,
                      lead(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS nxt
               FROM e),
        t2 AS (SELECT * FROM tr WHERE nxt IS NOT NULL),
        train AS (SELECT prev, nxt, count(*) AS c FROM t2
                  WHERE user_id % 2 = 0 GROUP BY 1, 2),
        pred AS (SELECT prev, nxt AS predicted FROM (
                     SELECT prev, nxt, row_number() OVER (
                         PARTITION BY prev ORDER BY c DESC, nxt ASC)
                         AS rk
                     FROM train) WHERE rk = 1),
        ev AS (SELECT t2.prev, predicted, count(*) AS n_eval,
                      sum(CASE WHEN nxt = predicted THEN 1 ELSE 0 END)
                          AS n_hits
               FROM t2 JOIN pred ON pred.prev = t2.prev
               WHERE user_id % 2 = 1
               GROUP BY 1, 2)
        SELECT prev, predicted, CAST(n_eval AS BIGINT) AS n_eval,
               CAST(n_hits AS BIGINT) AS n_hits,
               CAST(1000000 * n_hits // n_eval AS BIGINT) AS acc_ppm
        FROM ev"""

# ---------------------------------------------------------------------------
# batch 95 — Euclidean MST per cluster (full Borůvka), join-size audit
# ---------------------------------------------------------------------------

def q_emst_clusters(spark, sf):
    # exact Euclidean minimum spanning tree per cluster. Clusters are
    # BOUNDED groups (the convex-hull argument), so the right 100 TB
    # shape is one shuffle on the cluster id + an in-task algorithm via
    # applyInPandas — distributed Borůvka rounds are for graphs that
    # don't partition (boruvka_round1 demonstrates that tier; a first
    # cut of THIS query ran CC-per-round distributed and cost minutes
    # on 500 points — wrong altitude). Edge order is the strict total
    # order (d², a, b): all "weights" distinct ⇒ the MST is unique ⇒
    # the in-task BORŮVKA here, the oracle's recursive PRIM, and the
    # pytest's KRUSKAL must agree exactly — three algorithms, one tree.
    p = (minted.minted_cluster_points_q(spark, sf)
         .withColumn("gid", F.col("doc_id") % minted.N_CLUSTERS))
    schema = "gid long, n_pts long, mst_edges long, total_d2 long"

    def boruvka(pdf):
        import pandas as pd
        gid = int(pdf["gid"].iloc[0])
        pts = sorted((int(i), int(x), int(y)) for i, x, y in
                     zip(pdf["doc_id"], pdf["qx"], pdf["qy"]))
        n = len(pts)
        if n < 2:
            return pd.DataFrame([{"gid": gid, "n_pts": n,
                                  "mst_edges": 0, "total_d2": 0}])
        edges = []
        for i in range(n):
            for j in range(i + 1, n):
                (a, ax, ay), (b, bx, by) = pts[i], pts[j]
                edges.append(((ax - bx) ** 2 + (ay - by) ** 2, a, b))
        lab = {i: i for (i, _, _) in pts}

        def find(x):
            while lab[x] != x:
                lab[x] = lab[lab[x]]
                x = lab[x]
            return x

        total, cnt = 0, 0
        while cnt < n - 1:
            best = {}
            for w, a, b in edges:
                ra, rb = find(a), find(b)
                if ra == rb:
                    continue
                for r in (ra, rb):
                    if r not in best or (w, a, b) < best[r]:
                        best[r] = (w, a, b)
            if not best:
                raise ValueError("emst: disconnected cluster")
            for w, a, b in set(best.values()):
                ra, rb = find(a), find(b)
                if ra != rb:
                    lab[max(ra, rb)] = min(ra, rb)
                    total += w
                    cnt += 1
        return pd.DataFrame([{"gid": gid, "n_pts": n,
                              "mst_edges": cnt, "total_d2": total}])

    return p.groupBy("gid").applyInPandas(boruvka, schema)

def _emst_clusters_sql() -> str:
    return f"""
        WITH RECURSIVE ep AS (
            SELECT doc_id % {minted.N_CLUSTERS} AS gid, doc_id, qx, qy
            FROM ({minted.sql_minted_cluster_points_q()})),
        pr AS (SELECT x.gid, x.doc_id AS a, y.doc_id AS b,
                      (x.qx - y.qx) * (x.qx - y.qx)
                      + (x.qy - y.qy) * (x.qy - y.qy) AS d2
               FROM ep x JOIN ep y ON x.gid = y.gid
                   AND x.doc_id < y.doc_id),
        prd AS (SELECT gid, a, b, d2 FROM pr
                UNION ALL SELECT gid, b, a, d2 FROM pr),
        np AS (SELECT gid, count(*) AS n FROM ep GROUP BY 1),
        st AS (
            SELECT gid, [min(doc_id)] AS visited,
                   CAST(0 AS BIGINT) AS total, 0 AS cnt
            FROM ep GROUP BY gid
            UNION ALL
            SELECT s.gid, list_append(s.visited, pk.y),
                   s.total + pk.d2, s.cnt + 1
            FROM st s JOIN np ON np.gid = s.gid,
            LATERAL (SELECT p.b AS y, p.d2 FROM prd p
                     WHERE p.gid = s.gid
                       AND list_contains(s.visited, p.a)
                       AND NOT list_contains(s.visited, p.b)
                     ORDER BY p.d2, p.a, p.b LIMIT 1) pk
            WHERE s.cnt < np.n - 1)
        SELECT CAST(st.gid AS BIGINT) AS gid,
               CAST(np.n AS BIGINT) AS n_pts,
               CAST(cnt AS BIGINT) AS mst_edges,
               CAST(total AS BIGINT) AS total_d2
        FROM st JOIN np ON np.gid = st.gid WHERE st.cnt = np.n - 1"""

def q_mis_luby(spark, sf):
    # maximal independent set on the host graph by Luby's algorithm —
    # THE distributed symmetry-breaking primitive (scheduling
    # non-interfering hosts, picking cluster exemplars): each round a
    # live node joins the MIS iff its (hash, node) key is strictly
    # smallest in its live neighborhood — the per-round hash
    # hash60('mis', n, r) replaces Luby's fresh coins deterministically
    # — then winners and their neighbors leave. O(log n) expected
    # rounds, converge-or-raise; the oracle replays the same fixed
    # rounds. Output is the MIS with the round each node joined.
    from geobuf_spark.functions import phash
    ed = _host_edges(spark).select(F.col("src_host").alias("src"),
                                   F.col("dst_host").alias("dst"))
    und = (ed.select(F.least("src", "dst").alias("u"),
                     F.greatest("src", "dst").alias("v"))
           .filter(F.col("u") != F.col("v")).distinct())
    adj = (und.select(F.col("u").alias("n"), F.col("v").alias("nb"))
           .unionAll(und.select(F.col("v").alias("n"),
                                F.col("u").alias("nb")))
           .localCheckpoint(eager=True))
    live = adj.select("n").distinct().localCheckpoint(eager=True)
    mis = spark.createDataFrame([], "host string, round int")
    converged = False
    for r in range(1, MIS_ROUNDS + 1):
        h = phash.hash60_parts(F.lit("mis"), F.col("n"), F.lit(r))
        keyed = live.select("n", h.alias("h"))
        nbk = (adj.join(keyed.withColumnRenamed("n", "nb")
                        .withColumnRenamed("h", "nbh"), "nb")
               .join(live.withColumnRenamed("n", "nb2"),
                     F.col("nb") == F.col("nb2"))
               .groupBy("n")
               .agg(F.min(F.struct("nbh", "nb")).alias("mn")))
        cand = (keyed.join(nbk, "n", "left")
                .filter(F.col("mn").isNull()
                        | (F.struct(F.col("h"), F.col("n"))
                           < F.col("mn"))))
        winners = (cand.select("n").localCheckpoint(eager=True))
        if winners.limit(1).count() == 0:
            converged = live.limit(1).count() == 0
            break
        mis = mis.unionByName(
            winners.select(F.col("n").alias("host"),
                           F.lit(r).alias("round")))
        killed = (winners.unionByName(
            adj.join(winners, "n").select(F.col("nb").alias("n")))
            .distinct())
        live = (live.join(killed, "n", "left_anti")
                .localCheckpoint(eager=True))
        if live.limit(1).count() == 0:
            converged = True
            break
    if not converged:
        raise ValueError(
            f"mis_luby did not converge in {MIS_ROUNDS} rounds")
    return mis.select("host", F.col("round").cast("int"))

def _mis_luby_sql() -> str:
    from geobuf_spark.functions import phash
    steps = []
    for r in range(1, MIS_ROUNDS + 1):
        p = r - 1
        h = phash.sql_hash60_parts("'mis'", "n", str(r))
        steps.append(f"""
        k{r} AS (SELECT n, {h} AS h FROM l{p}),
        nk{r} AS (SELECT a.n, min(struct_pack(h := k.h, nb := a.nb))
                      AS mn
                  FROM adj a JOIN k{r} k ON k.n = a.nb
                  GROUP BY a.n),
        w{r} AS MATERIALIZED (
            SELECT k.n FROM k{r} k LEFT JOIN nk{r} x ON x.n = k.n
            WHERE x.mn IS NULL
               OR struct_pack(h := k.h, nb := k.n) < x.mn),
        m{r} AS (SELECT n AS host, {r} AS rnd FROM w{r}),
        l{r} AS MATERIALIZED (
            SELECT n FROM l{p}
            WHERE n NOT IN (SELECT n FROM w{r})
              AND n NOT IN (SELECT a.nb FROM adj a
                            JOIN w{r} w ON w.n = a.n))""")
    allm = " UNION ALL ".join(f"SELECT host, rnd FROM m{r}"
                              for r in range(1, MIS_ROUNDS + 1))
    return f"""
        WITH {_host_edges_cte()},
        und AS (SELECT DISTINCT least(src, dst) AS u,
                                greatest(src, dst) AS v
                FROM ed WHERE src <> dst),
        adj AS (SELECT u AS n, v AS nb FROM und
                UNION ALL SELECT v AS n, u AS nb FROM und),
        l0 AS (SELECT DISTINCT n FROM adj),
        {','.join(steps)}
        SELECT host, CAST(rnd AS INT) AS round FROM ({allm})"""

# ---------------------------------------------------------------------------
# batch 99 — personalized PageRank, source histogram overlap
# ---------------------------------------------------------------------------


def q_ppr_hosts(spark, sf):
    # personalized (seed-teleport) PageRank — seed-relative authority,
    # the TrustRank/topic-rank variant: the (1−d) teleport mass lands
    # only on the site*00.example seed hosts (the bfs_hops3 seed set),
    # so rank measures reachability-weighted proximity to the trusted
    # core instead of global importance. Same integer fixed-point
    # iteration as pagerank_hosts (bit-reproducible, one shuffle per
    # iteration; graph.ppr_int).
    from geobuf_spark.operators import graph
    ed = _host_edges(spark).select(F.col("src_host").alias("src"),
                                   F.col("dst_host").alias("dst"))
    nodes = (ed.select(F.col("src").alias("host"))
             .unionByName(ed.select(F.col("dst").alias("host")))
             .distinct())
    seeds = nodes.filter(F.col("host").endswith("00.example"))
    return graph.ppr_int(ed, seeds, iters=3)

def _ppr_hosts_sql() -> str:
    from geobuf_spark.operators import graph
    edges = (_host_edges_cte()
             + ", edges AS (SELECT src, dst FROM ed)")
    return graph.sql_ppr_int(edges, "host LIKE '%00.example'",
                             iters=3)

def q_dag_layers(spark, sf):
    # longest-path layering of the host DAG — the critical-path /
    # topological-depth operator (build schedulers and lineage engines
    # read it as "earliest stage this node can run in"): edges oriented
    # lexicographically src<dst (acyclic BY CONSTRUCTION — every cycle
    # needs a descent), layer(v) = 1 + max over predecessors, settled
    # by synchronous relaxation in depth rounds, converge-or-raise; the
    # oracle replays the same rounds fixed-length. Output also rolls up
    # the layer histogram invariantly checked by the brute.
    ed = _host_edges(spark).select(F.col("src_host").alias("a"),
                                   F.col("dst_host").alias("b"))
    dag = (ed.select(F.least("a", "b").alias("u"),
                     F.greatest("a", "b").alias("v"))
           .filter(F.col("u") != F.col("v")).distinct()
           .localCheckpoint(eager=False))
    nodes = (dag.select(F.col("u").alias("host"))
             .unionByName(dag.select(F.col("v").alias("host")))
             .distinct())
    lay = nodes.select("host", F.lit(0).alias("layer"))
    converged = False
    for _ in range(DAG_ROUNDS):
        cand = (dag.join(lay.withColumnRenamed("host", "u")
                         .withColumnRenamed("layer", "ul"), "u")
                .groupBy(F.col("v").alias("host"))
                .agg((F.max("ul") + 1).alias("cl")))
        new = (lay.join(cand, "host", "left")
               .select("host", F.greatest(
                   "layer", F.coalesce("cl", F.lit(0))).alias("layer"))
               .localCheckpoint(eager=True))
        changed = (new.join(lay.withColumnRenamed("layer", "old"),
                            "host")
                   .filter(F.col("layer") != F.col("old"))
                   .limit(1).count())
        lay = new
        if changed == 0:
            converged = True
            break
    if not converged:
        raise ValueError(
            f"dag_layers did not converge in {DAG_ROUNDS} rounds")
    return (lay.groupBy("layer")
            .agg(F.count("*").alias("n_hosts"),
                 F.min("host").alias("first_host"))
            .select(F.col("layer").cast("int"),
                    F.col("n_hosts").cast("bigint"), "first_host"))

def _dag_layers_sql() -> str:
    steps = []
    for r in range(1, DAG_ROUNDS + 1):
        p = r - 1
        steps.append(f"""
        dc{r} AS (SELECT d.v AS host, max(l.layer) + 1 AS cl
                  FROM dag d JOIN dl{p} l ON l.host = d.u
                  GROUP BY 1),
        dl{r} AS MATERIALIZED (
            SELECT l.host, greatest(l.layer, coalesce(c.cl, 0))
                       AS layer
            FROM dl{p} l LEFT JOIN dc{r} c ON c.host = l.host)""")
    return f"""
        WITH {_host_edges_cte()},
        dag AS (SELECT DISTINCT least(src, dst) AS u,
                                greatest(src, dst) AS v
                FROM ed WHERE src <> dst),
        dn AS (SELECT u AS host FROM dag
               UNION SELECT v FROM dag),
        dl0 AS (SELECT host, 0 AS layer FROM dn),
        {','.join(steps)}
        SELECT CAST(layer AS INT) AS layer,
               CAST(count(*) AS BIGINT) AS n_hosts,
               min(host) AS first_host
        FROM dl{DAG_ROUNDS} GROUP BY 1"""

def q_influence_spread(spark, sf):
    # deterministic linear-threshold cascade from the trusted seed set
    # (the influence-maximization evaluation primitive): node n has
    # threshold θ(n) = hash60('th', n) mod 1e6; it activates when the
    # ACTIVE fraction of its neighborhood reaches θ — integer test
    # active_nbrs·1e6 ≥ θ·deg, no division. Activation is monotone, so
    # synchronous rounds converge (converge-or-raise; fixed-round
    # oracle). Output: every activated host with its activation round —
    # the cascade horizon audit.
    from geobuf_spark.functions import phash
    ed = _host_edges(spark).select(F.col("src_host").alias("src"),
                                   F.col("dst_host").alias("dst"))
    und = (ed.select(F.least("src", "dst").alias("u"),
                     F.greatest("src", "dst").alias("v"))
           .filter(F.col("u") != F.col("v")).distinct())
    adj = (und.select(F.col("u").alias("n"), F.col("v").alias("nb"))
           .unionAll(und.select(F.col("v").alias("n"),
                                F.col("u").alias("nb")))
           .localCheckpoint(eager=True))
    deg = adj.groupBy("n").agg(F.count("*").alias("deg"))
    thr = (deg.select("n", "deg",
                      (F.pmod(phash.hash60_parts(F.lit("th"),
                                                 F.col("n")),
                              F.lit(1_000_000))).alias("theta"))
           .localCheckpoint(eager=True))
    active = (adj.select("n").distinct()
              .filter(F.col("n").endswith("00.example"))
              .withColumn("round", F.lit(0))
              .localCheckpoint(eager=True))
    converged = False
    for r in range(1, INF_ROUNDS + 1):
        acts = (adj.join(active.select(F.col("n").alias("nb")), "nb")
                .groupBy("n").agg(F.count("*").alias("na")))
        newly = (acts.join(thr, "n")
                 .filter(F.col("na") * 1_000_000
                         >= F.col("theta") * F.col("deg"))
                 .join(active.select("n"), "n", "left_anti")
                 .select("n", F.lit(r).alias("round")))
        newly = newly.localCheckpoint(eager=True)
        if newly.limit(1).count() == 0:
            converged = True
            break
        active = active.unionByName(newly).localCheckpoint(eager=True)
    if not converged:
        raise ValueError(
            f"influence_spread did not converge in {INF_ROUNDS}")
    return active.select(F.col("n").alias("host"),
                         F.col("round").cast("int"))

def _influence_spread_sql() -> str:
    from geobuf_spark.functions import phash
    th = phash.sql_hash60_parts("'th'", "n")
    steps = []
    for r in range(1, INF_ROUNDS + 1):
        p = r - 1
        steps.append(f"""
        ic{r} AS (SELECT a.n, count(*) AS na
                  FROM adj a JOIN ia{p} x ON x.n = a.nb
                  GROUP BY 1),
        ia{r} AS MATERIALIZED (
            SELECT n, rnd FROM ia{p}
            UNION ALL
            SELECT c.n, {r} AS rnd
            FROM ic{r} c JOIN ith t ON t.n = c.n
            WHERE c.na * 1000000 >= t.theta * t.deg
              AND c.n NOT IN (SELECT n FROM ia{p}))""")
    return f"""
        WITH {_host_edges_cte()},
        und AS (SELECT DISTINCT least(src, dst) AS u,
                                greatest(src, dst) AS v
                FROM ed WHERE src <> dst),
        adj AS (SELECT u AS n, v AS nb FROM und
                UNION ALL SELECT v AS n, u AS nb FROM und),
        ith AS (SELECT n, count(*) AS deg, {th} % 1000000 AS theta
                FROM adj GROUP BY n),
        ia0 AS (SELECT DISTINCT n, 0 AS rnd FROM adj
                WHERE n LIKE '%00.example'),
        {','.join(steps)}
        SELECT n AS host, CAST(rnd AS INT) AS round
        FROM ia{INF_ROUNDS}"""

def q_rich_club(spark, sf):
    # rich-club coefficient of the host graph: do high-degree hosts
    # link to EACH OTHER more densely than chance (the elite-core
    # signature of scale-free webs)? For each degree threshold k:
    # φ(k) = 2·E_k / (N_k·(N_k−1)) over the subgraph of nodes with
    # deg > k, in exact ppm. One degree rollup + one threshold-tagged
    # edge join per k (k list is a constant).
    ed = _host_edges(spark).select(F.col("src_host").alias("src"),
                                   F.col("dst_host").alias("dst"))
    und = (ed.select(F.least("src", "dst").alias("u"),
                     F.greatest("src", "dst").alias("v"))
           .filter(F.col("u") != F.col("v")).distinct()
           .localCheckpoint(eager=False))
    deg = (und.select(F.col("u").alias("n"))
           .unionAll(und.select(F.col("v").alias("n")))
           .groupBy("n").agg(F.count("*").alias("deg"))
           .localCheckpoint(eager=False))
    out = None
    for k in RC_KS:
        elite = deg.filter(F.col("deg") > k).select("n")
        nk = elite.count()
        ek = (und.join(elite.withColumnRenamed("n", "u"), "u")
              .join(elite.withColumnRenamed("n", "v"), "v").count())
        phi = (10**6 * 2 * ek // (nk * (nk - 1))
               if nk >= 2 else 0)
        row = spark.createDataFrame(
            [(k, nk, ek, phi)],
            "k int, n_nodes bigint, n_edges bigint, phi_ppm bigint")
        out = row if out is None else out.unionByName(row)
    return out

def _rich_club_sql() -> str:
    legs = []
    for k in RC_KS:
        legs.append(f"""
        SELECT {k} AS k,
               CAST((SELECT count(*) FROM rdeg WHERE deg > {k})
                    AS BIGINT) AS n_nodes,
               CAST((SELECT count(*) FROM und
                     JOIN rdeg a ON a.n = und.u AND a.deg > {k}
                     JOIN rdeg b ON b.n = und.v AND b.deg > {k})
                    AS BIGINT) AS n_edges,
               CAST(CASE WHEN (SELECT count(*) FROM rdeg
                               WHERE deg > {k}) >= 2
                    THEN 1000000 * 2 * (SELECT count(*) FROM und
                        JOIN rdeg a ON a.n = und.u AND a.deg > {k}
                        JOIN rdeg b ON b.n = und.v AND b.deg > {k})
                        // ((SELECT count(*) FROM rdeg WHERE deg > {k})
                            * ((SELECT count(*) FROM rdeg
                                WHERE deg > {k}) - 1))
                    ELSE 0 END AS BIGINT) AS phi_ppm""")
    return f"""
        WITH {_host_edges_cte()},
        und AS (SELECT DISTINCT least(src, dst) AS u,
                                greatest(src, dst) AS v
                FROM ed WHERE src <> dst),
        rdeg AS (SELECT n, count(*) AS deg FROM (
                     SELECT u AS n FROM und
                     UNION ALL SELECT v FROM und) GROUP BY 1)
        {' UNION ALL '.join(legs)}"""

def _pagerank_hosts_sql(n: int = 2000, seed: int = 42, k: int = 25) -> str:
    """Oracle for q_pagerank_hosts: the SAME 3 integer fixed-point
    iterations chained as CTEs (operators/graph.sql_pagerank_int) — exact
    because every step is BIGINT arithmetic."""
    from geobuf_spark.operators.graph import sql_pagerank_int
    edges_cte = f"""{_links_cte(n, seed)},
        edges AS (SELECT src_host AS src,
                         {TXT.sql_url_host('dst')} AS dst
                  FROM e)"""
    pr = sql_pagerank_int(edges_cte, iters=3)
    return f"""
        {pr}
        ORDER BY rank_ppm DESC, host
        LIMIT {k}"""

def _hits_hosts_sql(n: int = 2000, seed: int = 42, k: int = 25) -> str:
    """Oracle for q_hits_hosts: the SAME 2 integer max-normalized HITS
    iterations chained as CTEs (operators/graph.sql_hits_int)."""
    from geobuf_spark.operators.graph import sql_hits_int
    edges_cte = f"""{_links_cte(n, seed)},
        edges AS (SELECT src_host AS src,
                         {TXT.sql_url_host('dst')} AS dst
                  FROM e)"""
    return f"""
        SELECT host, hub_ppm, auth_ppm FROM (
        {sql_hits_int(edges_cte, iters=2)}
        ) t
        ORDER BY auth_ppm DESC, hub_ppm DESC, host
        LIMIT {k}"""


def oracles() -> dict[str, str]:
    """DuckDB oracle twins for this module's queries."""
    out = {
        "hits_hosts": _hits_hosts_sql(),
        "triangle_hosts": _triangle_hosts_sql(),
        "link_reciprocity": _link_reciprocity_sql(),
        "pagerank_hosts": _pagerank_hosts_sql(),
        "clustering_coeff": _clustering_coeff_sql(),
        "link_prediction_ra": _link_prediction_ra_sql(),
        "bfs_hops3": _bfs_hops3_sql(),
        "dbscan_core": _dbscan_core_sql(),
        "kcore_hosts": _kcore_hosts_sql(),
        "cluster_diameter": _cluster_diameter_sql(),
        "degree_assortativity": _degree_assortativity_sql(),
        "boruvka_round1": _boruvka_round1_sql(),
        "markov_stationary": _markov_stationary_sql(),
        "redirect_resolve": _redirect_resolve_sql(),
        "sssp_w3": _sssp_w3_sql(),
        "lpa_communities": _lpa_communities_sql(),
        "consistent_shards": _consistent_shards_sql(),
        "maximal_matching": _maximal_matching_sql(),
        "diameter_sweep": _diameter_sweep_sql(),
        "coreness": _coreness_sql(),
        "ktruss_edges": _ktruss_edges_sql(),
        "dbscan_clusters": _dbscan_clusters_sql(),
        "power_iteration": _power_iteration_sql(),
        "bipartite_check": _bipartite_check_sql(),
        "stable_matching": _stable_matching_sql(),
        "markov_predict_eval": _markov_predict_eval_sql(),
        "emst_clusters": _emst_clusters_sql(),
        "mis_luby": _mis_luby_sql(),
        "ppr_hosts": _ppr_hosts_sql(),
        "dag_layers": _dag_layers_sql(),
        "influence_spread": _influence_spread_sql(),
        "rich_club": _rich_club_sql(),
    }
    return out
