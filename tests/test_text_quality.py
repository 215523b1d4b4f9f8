"""Batch-10 text-quality operators: Gopher rules, top-n-gram repetition,
PII scrubbing, corpus-rare-token ratio."""

import collections

import pytest
from pyspark.sql import functions as F

from geobuf_spark.functions import text as TXT


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_gopher_columns_handcrafted(spark):
    filler = " ".join(["the", "and"] * 12)  # 24 tokens, all alpha, stops
    rows = [
        (0, filler),                          # passes every rule
        (1, "the and of to in"),              # 5 tokens -> too short
        (2, " ".join(["12345"] * 30)),        # no alpha, no stops
        (3, " ".join(["antidisestablishmentarianism"] * 25)
            + " the and"),                    # mean token len > 10 chars
    ]
    out = {r["doc_id"]: r for r in
           TXT.gopher_columns(_df(spark, rows)).collect()}

    assert out[0]["n_tokens"] == 24
    assert out[0]["alpha_frac_x10k"] == 10000
    assert out[0]["stop_hits"] == 24
    # "the and " repeated: mean token len = (len-n+1)/n = (31*3+16? ) exact:
    text0 = rows[0][1]
    n0 = len(text0.split(" "))
    assert out[0]["mean_token_len_x100"] == (len(text0) - n0 + 1) * 100 // n0
    assert out[0]["gopher_pass"] == 1

    assert out[1]["n_tokens"] == 5 and out[1]["gopher_pass"] == 0
    assert out[2]["alpha_frac_x10k"] == 0
    assert out[2]["stop_hits"] == 0 and out[2]["gopher_pass"] == 0
    assert out[3]["mean_token_len_x100"] > TXT.GOPHER_MEAN_LEN_HI_X100
    assert out[3]["gopher_pass"] == 0


def test_top_run_columns_vs_brute(spark):
    # deterministic pseudo-random docs over a tiny vocab so 2-gram modes
    # and ties actually occur; brute force = collections.Counter
    vocab = ["a", "b", "c"]
    rows = []
    for d in range(40):
        toks = [vocab[(d * 7 + i * i) % 3] for i in range(2 + d % 9)]
        rows.append((d, " ".join(toks)))
    out = {r["doc_id"]: r for r in
           TXT.top_run_columns(_df(spark, rows), n=2).collect()}
    for d, text in rows:
        ws = text.split(" ")
        grams = [" ".join(ws[i:i + 2]) for i in range(len(ws) - 1)]
        if not grams:
            assert out[d]["top_count"] == 0 and out[d]["top_gram"] == ""
            continue
        cnt = collections.Counter(grams)
        mc = max(cnt.values())
        expect = min(g for g, c in cnt.items() if c == mc)
        assert out[d]["top_count"] == mc, (d, text)
        assert out[d]["top_gram"] == expect, (d, text)


def test_pii_scrub_bytes_and_counts(spark):
    rows = [
        (0, "mail me at a.b+tag@sub.example.co or +44-123-4567 now"),
        (1, "no pii here at all"),
        (2, "two mails x@y.io z@w.org and +1-555-0000"),
    ]
    df = _df(spark, rows)
    ne, np_ = TXT.pii_counts(F.col("text"))
    got = {r["doc_id"]: r for r in df.select(
        "doc_id", ne.alias("ne"), np_.alias("np"),
        TXT.scrub_pii(F.col("text")).alias("clean")).collect()}
    assert (got[0]["ne"], got[0]["np"]) == (1, 1)
    assert got[0]["clean"] == "mail me at <EMAIL> or <PHONE> now"
    # untouched text survives byte-for-byte
    assert (got[1]["ne"], got[1]["np"]) == (0, 0)
    assert got[1]["clean"] == rows[1][1]
    assert (got[2]["ne"], got[2]["np"]) == (2, 1)
    assert got[2]["clean"] == "two mails <EMAIL> <EMAIL> and <PHONE>"


def test_rare_token_ratio_exact_and_partitioning_invariant(spark):
    # corpus: 'x' appears 6 times (frequent), singletons r0..r3 are rare
    rows = [
        (0, "x x r0 r1"),
        (1, "x x x r2"),
        (2, "x r3 x x"),
    ]
    def run(df):
        return {r["doc_id"]: r for r in
                TXT.rare_token_ratio(df, min_count=3).collect()}

    out = run(_df(spark, rows))
    assert (out[0]["n_tokens_total"], out[0]["n_rare"]) == (4, 2)
    assert out[0]["rare_x10k"] == 5000
    assert (out[1]["n_tokens_total"], out[1]["n_rare"]) == (4, 1)
    assert out[1]["rare_x10k"] == 2500
    assert (out[2]["n_tokens_total"], out[2]["n_rare"]) == (4, 1)
    # result must not depend on the physical partitioning of the corpus
    assert run(_df(spark, rows).repartition(7)) == out


def test_batch10_shuffle_budgets(spark):
    """gopher/top_ngram pay only the widen() round-robin (a no-op at
    production row-group counts); pii_scrub is a pure expression chain;
    rare_token_ratio is the two-level aggregation (per-(doc,tok) combine +
    token totals; the totals join broadcasts). No Python, no cartesian."""
    import __spark_entry__ as em

    budgets = {"gopher_quality_flags": 1, "top_ngram_frac": 1,
               "pii_scrub": 0, "rare_token_ratio": 2}
    for q, budget in budgets.items():
        df = em.queries()[q](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == budget, f"{q}\n{plan}"
        for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInArrow",
                       "FlatMapGroupsInPandas", "MapInPandas",
                       "CartesianProduct", "BroadcastNestedLoop"):
            assert marker not in plan, f"{q}: {marker}"


def test_zipf_corpus_has_rare_tail(spark):
    import __spark_entry__ as em

    z = em._zipf_docs(spark, n=300, m=40)
    toks = z.select(F.explode(F.split("text", " ")).alias("t"))
    freq = toks.groupBy("t").count().collect()
    counts = {r["t"]: r["count"] for r in freq}
    total = sum(counts.values())
    # Zipf head: rank-1 token ('w1048576' is floor(2^20/1)=2^20 only when
    # u=0; the head is w1) dominates; and a real rare tail exists
    assert counts.get("w1", 0) > total * 0.3
    assert sum(1 for c in counts.values() if c < 3) > 50
