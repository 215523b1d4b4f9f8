"""Text/web-payload operator tests: n-gram dup stats, URL host extraction,
and the html→text byte-identity extraction (BASELINE.json input_hint)."""

import pyspark.sql.functions as F
import pytest

from geobuf_spark.functions import text as TXT
from geobuf_spark.sources import pages


def brute_dup_frac(text: str, n: int = 3):
    ws = text.split(" ")
    grams = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)] if len(ws) >= n else []
    total, uniq = len(grams), len(set(grams))
    return total, uniq, (total - uniq) / total if total else 0.0


def test_word_ngrams_known(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("x y",), ("solo",), ("a a a a a",)], ["text"])
    out = [r[0] for r in
           df.select(TXT.word_ngrams(F.col("text"), 3)).collect()]
    assert out[0] == ["a b c", "b c d"]
    # short docs: the `when` guard must yield [], not a descending-sequence
    # artifact
    assert out[1] == [] and out[2] == []
    assert out[3] == ["a a a"] * 3


def test_dup_ngram_columns_vs_brute(spark, sf_small):
    d = (spark.read.parquet(f"{sf_small}/documents.parquet")
         .select("doc_id", "text").limit(200))
    got = {r["doc_id"]: (r["n_grams"], r["n_uniq_grams"], r["dup_gram_frac"])
           for r in TXT.dup_ngram_columns(d, "text", 3).collect()}
    for r in d.collect():
        total, uniq, frac = brute_dup_frac(r["text"], 3)
        assert got[r["doc_id"]] == (total, uniq, pytest.approx(frac, abs=0.0))


def test_url_host(spark):
    p = pages.pages(spark, 50)
    rows = p.select("url", TXT.url_host(F.col("url")).alias("host")).collect()
    for r in rows:
        assert r["host"] == r["url"].split("://", 1)[1].split("/", 1)[0]
        assert r["host"].startswith("site") and r["host"].endswith(".example")


def test_html_extract_byte_identity(spark):
    # the north-rule invariant in-engine: text recovered from the html
    # binary payload must be byte-identical to the text column, per url
    p = pages.pages(spark, 500)
    bad = (
        p.select(
            "text",
            F.regexp_extract(F.decode(F.col("html"), "utf-8"),
                             "<p>(.*)</p>", 1).alias("ext"))
        .where(F.col("ext") != F.col("text"))
        .count()
    )
    assert bad == 0


URL_NORM_CASES = [
    # (input, expected)
    ("HTTPS://Site1.Example/AbC", "https://site1.example/AbC"),  # host lower, path kept
    ("https://a.example:443/x", "https://a.example/x"),          # default https port
    ("http://a.example:80/x", "http://a.example/x"),             # default http port
    ("https://a.example:8443/x", "https://a.example:8443/x"),    # non-default port kept
    ("http://a.example:443/x", "http://a.example:443/x"),        # :443 on http kept
    ("https://a.example/x#frag", "https://a.example/x"),         # fragment dropped
    ("https://a.example/x?a=1&utm_source=s&b=2", "https://a.example/x?a=1&b=2"),
    ("https://a.example/x?utm_source=s&utm_medium=m", "https://a.example/x"),
    ("https://a.example/x?", "https://a.example/x"),             # empty query dropped
    ("https://a.example/", "https://a.example"),                 # bare root slash
    ("https://a.example", "https://a.example"),
    ("HTTPS://A.EXAMPLE:443/p?utm_x=1#f", "https://a.example/p"),
    ("not a url", "not a url"),                                  # passthrough
    ("/relative/path", "/relative/path"),
]


def test_url_normalize_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in URL_NORM_CASES], ["u"])
    got = [r[0] for r in df.select(TXT.url_normalize(F.col("u"))).collect()]
    assert got == [e for _, e in URL_NORM_CASES]


def test_url_normalize_duckdb_twin(spark):
    # the DuckDB twin must match the engine byte-for-byte on the same battery
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u, _ in URL_NORM_CASES])
    got = [r[0] for r in
           con.sql(f"SELECT {TXT.sql_url_normalize('u')} FROM t").fetchall()]
    assert got == [e for _, e in URL_NORM_CASES]


def test_extract_links(spark):
    html = ('<html><body><a href="https://x.example/1">a</a>'
            '<p>noise <a href="http://y.example/2?q=1">b</a></p>'
            '<a class="c" href="https://z.example/3">c</a></body></html>')
    df = spark.createDataFrame([(html,), ("<p>no links</p>",)], ["h"])
    got = [r[0] for r in df.select(TXT.extract_links(F.col("h"))).collect()]
    # the regex keys on the `<a href="` prefix: the class-first anchor is
    # out of scope by design (documented operator contract)
    assert got[0] == ["https://x.example/1", "http://y.example/2?q=1"]
    assert got[1] == []


def test_keep_latest_matches_window_and_breaks_ties(spark):
    from pyspark.sql import Window

    from geobuf_spark.operators import dedup

    rows = [
        ("u1", 100, 1, "a"), ("u1", 200, 2, "b"),   # plain latest
        ("u2", 300, 3, "c"), ("u2", 300, 4, "d"),   # ts tie -> max page_id
        ("u3", 50, 5, "e"),                          # singleton
    ]
    df = spark.createDataFrame(rows, ["url", "warc_ts", "page_id", "payload"])
    got = {r["url"]: (r["n_captures"], r["page_id"], r["warc_ts"], r["payload"])
           for r in dedup.keep_latest(df, "url", "warc_ts", "page_id",
                                      ["payload"]).collect()}
    assert got == {"u1": (2, 2, 200, "b"), "u2": (2, 4, 300, "d"),
                   "u3": (1, 5, 50, "e")}
    # equivalence with the row_number-window form (the oracle's shape)
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"), F.desc("page_id"))
    win = (df.withColumn("rn", F.row_number().over(w))
             .withColumn("n", F.count("*").over(Window.partitionBy("url")))
             .where("rn = 1"))
    assert {(r["url"], r["n"], r["page_id"]) for r in win.collect()} == \
           {(u, n, p) for u, (n, p, _, _) in got.items()}


def test_extract_link_anchors_pairs_with_links(spark):
    """The href and anchor-text regexes must pick the SAME tag set so a
    positional zip yields aligned (href, text) pairs."""
    html = ('<html><body><a href="https://a.example/1">alpha</a>'
            'noise <a href="https://b.example/2">beta gamma</a>'
            '<a href="https://c.example/3">d</a></body></html>')
    df = spark.createDataFrame([(html,)], ["h"])
    r = df.select(TXT.extract_links(F.col("h")).alias("l"),
                  TXT.extract_link_anchors(F.col("h")).alias("a")).collect()[0]
    assert r["l"] == ["https://a.example/1", "https://b.example/2",
                      "https://c.example/3"]
    assert r["a"] == ["alpha", "beta gamma", "d"]
    import duckdb
    got = duckdb.sql(
        f"SELECT {TXT.sql_extract_link_anchors('h')} FROM "
        f"(SELECT '{html}' AS h)").fetchone()[0]
    assert got == ["alpha", "beta gamma", "d"]


def test_anchor_text_topk_vs_brute(spark):
    """The shipped query's per-host top-3 must match a python recompute
    over its own collected edge table (the query mints at n=2000)."""
    import __spark_entry__ as em

    edges = em._page_link_edges_anchored(spark, 2000).collect()
    brute = {}
    for r in edges:
        host = r["dst"].split("/")[2]
        brute.setdefault(host, {}).setdefault(r["anchor"], [0])[0] += 1
    exp = set()
    for host, counts in brute.items():
        ranked = sorted(((n[0], a) for a, n in counts.items()),
                        key=lambda t: (-t[0], t[1]))
        for i, (n, a) in enumerate(ranked[:3], 1):
            exp.add((host, i, a, n))
    got = {tuple(r) for r in em.queries()["anchor_text_topk"](
        spark, "/root/testdata/sf0.001").collect()}
    assert got == exp


def test_host_mirrors_vs_brute(spark):
    """Every emitted pair must be a planted (m{k}, site{k}) mirror —
    page texts are unique, so no cross-site pair can share a fingerprint —
    and shared/j_ppm must match a python recompute from the page table."""
    import __spark_entry__ as em

    rows = pages.pages(spark, 1500).select("page_id", "url", "text").collect()
    site_fps, mirror_fps = {}, {}
    for r in rows:
        host = r["url"].split("/")[2]
        site_fps.setdefault(host, set()).add(r["text"])
        if r["page_id"] % 3 == 0:
            mirror_fps.setdefault("m" + host[4:], set()).add(r["text"])
    exp = set()
    for mh, fps in mirror_fps.items():
        sh = "site" + mh[1:]
        shared = len(fps & site_fps[sh])
        union = len(fps) + len(site_fps[sh]) - shared
        j = shared * 1_000_000 // union
        if j >= 300_000:
            a, b = sorted((mh, sh))
            exp.add((a, b, shared, j))
    got = {tuple(r) for r in em.queries()["host_mirrors"](
        spark, "/root/testdata/sf0.001").collect()}
    assert got == exp and got
    for host_a, host_b, _, _ in got:
        assert host_a.startswith("m") and host_b == "site" + host_a[1:]
