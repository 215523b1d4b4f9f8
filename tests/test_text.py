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
