"""Deterministic synthetic Common-Crawl-style pages table (BASELINE.json
input_hint): (url, warc_ts, html, text, lang) + minted point geometry.

Generated entirely with Column expressions over spark.range — distributed,
seeded, no driver-side loops; the same generator scales from 10^3 rows in
tests to any size on a cluster. `text` is the byte-identity invariant: no
stage may transform it (verified by test_pages_invariant).

Geometry minting follows FIXTURES.md §1: lon/lat are md5(url)-derived
integers on the 1e-7 lattice, so geobuf quantization is lossless on the
integer path.

Every derivation hashes with md5 (not murmur3/sha1/xxhash64) so the
external correctness driver's DuckDB oracle can regenerate the table
bit-identically — see functions/phash.py for the bridge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geobuf_spark.functions import phash

LANGS = ["en", "de", "fr", "es", "pt", "zh", "ja", "ru", "it", "nl", "pl", "tr"]
WORDS = [
    "data", "page", "web", "crawl", "spark", "tile", "join", "index", "query",
    "scan", "merge", "sort", "hash", "cell", "point", "polygon", "stream",
    "batch", "vector", "token", "model", "train", "text", "html", "link",
    "node", "edge", "graph", "table", "row", "column", "shard", "block",
    "byte", "frame", "codec", "delta", "varint", "proto", "zoom", "layer",
]


def pages(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """n synthetic pages, deterministic in (n, seed)."""
    df = spark.range(n).withColumn("h", F.md5(F.concat(F.lit(f"s{seed}-"), F.col("id"))))
    site = F.pmod(F.conv(F.substring("h", 1, 6), 16, 10).cast("bigint"), F.lit(1000))
    url = F.concat(F.lit("https://site"), site, F.lit(".example/"), F.substring("h", 7, 12))
    n_tokens = (F.pmod(F.conv(F.substring("h", 19, 4), 16, 10).cast("bigint"), F.lit(180)) + 10)
    words_arr = F.array(*[F.lit(w) for w in WORDS])
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_tokens),
            lambda i: F.element_at(
                words_arr,
                (F.pmod(phash.hash60(F.concat(F.lit("w"), F.col("id"), F.lit("-"), i)),
                        F.lit(len(WORDS))) + 1).cast("int"),
            ),
        ),
    )
    langs_arr = F.array(*[F.lit(x) for x in LANGS])
    lang = F.element_at(langs_arr, (F.pmod(F.conv(F.substring("h", 23, 4), 16, 10).cast("bigint"), F.lit(len(LANGS))) + 1).cast("int"))
    # md5 is 32 hex chars — the timestamp draws from a second hash instead
    # of sha1's chars 27..34
    warc_ts = F.timestamp_seconds(
        F.lit(1700000000)
        + F.pmod(F.conv(F.substring(F.md5(F.concat(F.lit("ts-"), F.col("h"))), 1, 8), 16, 10)
                 .cast("bigint"), F.lit(365 * 86400))
    )
    out = df.select(
        F.col("id").alias("page_id"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        text.alias("text"),
        lang.alias("lang"),
    )
    html = F.encode(
        F.concat(F.lit("<html><head><title>"), F.col("url"),
                 F.lit("</title></head><body><p>"), F.col("text"),
                 F.lit("</p></body></html>")),
        "utf-8",
    )
    return out.withColumn("html", html)


def with_minted_geometry(pages_df: DataFrame) -> DataFrame:
    """Mint a lattice point per page from md5(url) (FIXTURES.md §1):
    lon = (int(md5(url)[:8],16) % 3.6e9)/1e7 - 180, lat likewise."""
    h = F.md5(F.col("url"))
    lon_q = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(3_600_000_000)) - F.lit(1_800_000_000)
    lat_q = F.pmod(F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint"), F.lit(1_700_000_000)) - F.lit(850_000_000)
    return pages_df.withColumn("lon", lon_q / F.lit(1e7)).withColumn("lat", lat_q / F.lit(1e7))

# ---------------------------------------------------------------------------
# Multi-paragraph body minting — the line-level (CCNet-style) job surface.
# The site number is re-extracted from the url (not re-derived from the md5
# draw) so the Spark and DuckDB definitions share ONE source of truth.
# ---------------------------------------------------------------------------

BOILER_VARIANTS = 37
BOILER_HEADER = "boilerplate cookie notice v"
BOILER_FOOTER = "subscribe to the example newsletter"
_SITE_RE = r"site(\d+)\.example"


def site_of(url: Column) -> "Column":
    """Integer site number embedded in the minted url."""
    return F.regexp_extract(url, _SITE_RE, 1).cast("int")


def with_body(pages_df: DataFrame) -> DataFrame:
    """Append a newline-joined multi-paragraph `body`: a site-cohort
    boilerplate header (site % BOILER_VARIANTS picks the variant), the page
    text, the header REPEATED for every 5th page (the within-doc duplicate
    line), and a global footer on even sites. concat_ws skips the NULL
    branches identically in Spark and DuckDB (sql_body_cte twin)."""
    site = site_of(F.col("url"))
    header = F.concat(F.lit(BOILER_HEADER),
                      F.pmod(site, F.lit(BOILER_VARIANTS)).cast("string"))
    body = F.concat_ws(
        "\n",
        header,
        F.col("text"),
        F.when(F.pmod(F.col("page_id"), F.lit(5)) == 0, header),
        F.when(F.pmod(site, F.lit(2)) == 0, F.lit(BOILER_FOOTER)),
    )
    return pages_df.withColumn("body", body)


def sql_body_cte(prefix: str = "") -> str:
    """DuckDB twin of with_body: a CTE clause extending {prefix}txt with
    (site, body). Append after a _pages_cte(...) fragment."""
    p = prefix
    site = f"CAST(regexp_extract(url, '{_SITE_RE}', 1) AS INT)"
    header = f"'{BOILER_HEADER}' || CAST({site} % {BOILER_VARIANTS} AS VARCHAR)"
    return f"""{p}bdy AS (SELECT id, url, lang, ts_epoch, text, {site} AS site,
                concat_ws(chr(10),
                    {header},
                    text,
                    CASE WHEN id % 5 = 0 THEN {header} END,
                    CASE WHEN {site} % 2 = 0 THEN '{BOILER_FOOTER}' END) AS body
         FROM {p}txt)"""
