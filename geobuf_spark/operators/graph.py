"""Host-graph analytics for web corpora — PageRank over (src, dst) edges.

The web-payload side of the graft needs link-graph signals (host authority
feeds crawl prioritization and quality filtering). PageRank here is the
classic iterative join+aggregate, expressed so it is bit-reproducible
across engines and machines:

- ranks are BIGINT micro-units (1e6 = 1.0), every step is integer
  arithmetic (integer division per out-edge, integer sums) — no float
  summation-order sensitivity, so a DuckDB oracle can chain the same
  iterations as CTEs and match the driver's value hash exactly;
- each iteration is ONE shuffle (edges ⋈ ranks on src, then groupBy dst
  with map-side partial sums). Rank/degree tables are hosts-sized — at
  10^12 pages that is ~10^8 hosts, well under fact size, so Spark's AQE
  broadcasts them when they fit and falls back to shuffle joins when not;
  nothing here collects to the driver.

Dangling-node mass (hosts with no out-links) leaks, as in the simplified
formulation; damping keeps totals bounded. Multi-edges count with
multiplicity (a host linking twice contributes twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # rank 1.0 in micro-units


def pagerank_int(edges: DataFrame, iters: int = 3,
                 damping_ppm: int = 850_000) -> DataFrame:
    """Integer fixed-point PageRank over an edge list (src, dst).

    Returns (host, rank_ppm) for every node in the graph. rank_ppm is the
    micro-unit rank after `iters` synchronous iterations starting from
    uniform 1.0; new_rank = (SCALE - damping) + damping * Σ contrib / SCALE
    with contrib = rank(src) // out_deg(src), all integer ops.
    """
    e = edges.select(F.col("src").cast("string").alias("src"),
                     F.col("dst").cast("string").alias("dst"))
    nodes = (e.select(F.col("src").alias("host"))
              .unionByName(e.select(F.col("dst").alias("host")))
              .distinct())
    out_deg = e.groupBy(F.col("src").alias("host")).agg(
        F.count("*").alias("out_deg"))
    base = F.lit(SCALE - damping_ppm)
    ranks = nodes.select("host", F.lit(SCALE).cast("bigint").alias("rank_ppm"))
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("host", "src"), "src")
             .join(out_deg.withColumnRenamed("host", "src"), "src")
             .select(F.col("dst").alias("host"),
                     (F.col("rank_ppm") / F.col("out_deg"))
                     .cast("bigint").alias("c")))
        agg = contrib.groupBy("host").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(agg, "host", "left")
                 .select("host",
                         (base + F.lit(damping_ppm)
                          * F.coalesce(F.col("s"), F.lit(0))
                          / F.lit(SCALE)).cast("bigint").alias("rank_ppm")))
    return ranks


def sql_pagerank_int(edges_cte: str, iters: int = 3,
                     damping_ppm: int = 850_000) -> str:
    """DuckDB twin of pagerank_int: chains the same integer iterations as
    CTEs over an edge CTE named `edges(src, dst)`. Returns a full WITH
    clause ending in a SELECT of (host, rank_ppm).

    Integer division notes: Spark's (bigint / bigint).cast(bigint) is
    truncation toward zero of the double quotient — exact for these
    magnitudes (< 2^53), so DuckDB's `//` floor-division matches on the
    non-negative values used here.
    """
    base = SCALE - damping_ppm
    cte = [edges_cte,
           """nodes AS (SELECT src AS host FROM edges
                        UNION SELECT dst FROM edges),
        out_deg AS (SELECT src AS host, count(*) AS out_deg
                    FROM edges GROUP BY 1),
        r0 AS (SELECT host, CAST(1000000 AS BIGINT) AS rank_ppm FROM nodes)"""]
    prev = "r0"
    for i in range(1, iters + 1):
        cte.append(f"""c{i} AS (SELECT e.dst AS host,
                       r.rank_ppm // d.out_deg AS c
                FROM edges e
                JOIN {prev} r ON r.host = e.src
                JOIN out_deg d ON d.host = e.src),
        a{i} AS (SELECT host, sum(c) AS s FROM c{i} GROUP BY 1),
        r{i} AS (SELECT n.host,
                        CAST({base} + {damping_ppm} * coalesce(a.s, 0)
                             // {SCALE} AS BIGINT) AS rank_ppm
                 FROM nodes n LEFT JOIN a{i} a ON a.host = n.host)""")
        prev = f"r{i}"
    return ("WITH " + ",\n        ".join(cte)
            + f"\n        SELECT host, rank_ppm FROM {prev}")
