"""Sketch operators (KMV / Bloom / Count-Min / HLL): estimator properties
vs exact answers, bit-identical DuckDB twins, and bounded-size /
JVM-only plan shapes."""

import duckdb
import pytest
from pyspark.sql import functions as F

from geobuf_spark.operators import sketch

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).cache()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{DOCS}'")
    return c


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------

def test_kmv_exact_below_k(spark, docs):
    """Groups with < k distinct values must report the exact count (the 20
    sources hold ~25 docs each at sf0.001 — all under k=64)."""
    est = sketch.kmv_distinct(docs, ["source"], "doc_id", k=64)
    truth = {r["source"]: r["d"] for r in
             docs.groupBy("source").agg(F.countDistinct("doc_id").alias("d")).collect()}
    small = {r["source"]: r["est_distinct"] for r in est.collect()
             if truth[r["source"]] < 64}
    assert small  # the fixture has at least one sub-64 group
    for src, e in small.items():
        assert e == truth[src]


def test_kmv_estimate_within_bound(spark, docs):
    """k=16 KMV standard error is ~1/sqrt(k-2) ≈ 27%; assert 3 sigma."""
    est = {r["lang"]: r["est_distinct"]
           for r in sketch.kmv_distinct(docs, ["lang"], "doc_id", k=16).collect()}
    truth = {r["lang"]: r["d"] for r in
             docs.groupBy("lang").agg(F.countDistinct("doc_id").alias("d")).collect()}
    for lang, t in truth.items():
        assert abs(est[lang] - t) <= max(0.8 * t, 16), (lang, est[lang], t)


def test_kmv_duplicates_invisible(spark, docs):
    """KMV is a distinct-count sketch: doubling every row can't move it."""
    once = _rows(sketch.kmv_distinct(docs, ["lang"], "doc_id", k=16))
    twice = _rows(sketch.kmv_distinct(docs.unionAll(docs), ["lang"], "doc_id", k=16))
    assert once == twice


def test_kmv_matches_duckdb(spark, docs, con):
    spark_rows = _rows(
        sketch.kmv_distinct(docs, ["lang"], "doc_id", k=16)
        .select(F.col("lang").alias("grp"), "n_kmv", "kth_hash", "est_distinct"))
    sql = sketch.sql_kmv_distinct("documents", "lang", "doc_id", k=16)
    duck_rows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert spark_rows == duck_rows


def test_kmv_k_bounds():
    import pandas as pd  # noqa: F401  (parity with other guards)
    with pytest.raises(ValueError):
        sketch.kmv_distinct(None, ["g"], "v", k=1)
    with pytest.raises(ValueError):
        sketch.kmv_distinct(None, ["g"], "v", k=65)


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_bounded_fp(spark, docs):
    members = docs.filter(F.col("lang") == "en").select(
        F.col("doc_id").cast("string").alias("key")).distinct()
    bloom = sketch.bloom_build(members, "key", m_bits=1 << 14, n_hashes=5)
    assert bloom.count() <= (1 << 14) // 64  # sketch size is bounded

    probe = docs.select(F.col("doc_id").cast("string").alias("key"),
                        "lang").distinct()
    got = sketch.bloom_probe(probe.select("key"), "key", bloom,
                             m_bits=1 << 14, n_hashes=5)
    joined = {r["key"]: r["bloom_maybe"] for r in got.collect()}
    truth = {r["key"] for r in members.collect()}
    fp = 0
    for r in probe.collect():
        if r["key"] in truth:
            assert joined[r["key"]], "false negative"
        elif joined[r["key"]]:
            fp += 1
    n, m, k = len(truth), 1 << 14, 5
    expected_fp_rate = (1 - (1 - 1 / m) ** (k * n)) ** k
    non_members = probe.count() - len(truth)
    # generous: 10x the analytic rate plus slack for tiny samples
    assert fp <= max(5, 10 * expected_fp_rate * non_members), fp


def test_bloom_matches_duckdb(spark, docs, con):
    members = docs.filter(F.col("lang") == "en").select(
        F.col("doc_id").cast("string").alias("key")).distinct()
    bloom = sketch.bloom_build(members, "key", m_bits=1 << 13, n_hashes=4)
    probe = docs.select(F.col("doc_id").cast("string").alias("key")).distinct()
    spark_rows = _rows(sketch.bloom_probe(probe, "key", bloom,
                                          m_bits=1 << 13, n_hashes=4))
    cte = sketch.sql_bloom_cte(
        "(SELECT DISTINCT CAST(doc_id AS VARCHAR) AS k FROM documents "
        " WHERE lang = 'en')",
        "(SELECT DISTINCT CAST(doc_id AS VARCHAR) AS k FROM documents)",
        "k", "k", m_bits=1 << 13, n_hashes=4)
    duck_rows = sorted(tuple(r) for r in con.execute(
        f"WITH {cte} SELECT key, bloom_maybe FROM bloomed").fetchall())
    assert spark_rows == duck_rows


def test_bloom_m_must_be_word_aligned():
    with pytest.raises(ValueError):
        sketch.bloom_build(None, "k", m_bits=100)


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

def test_cms_never_underestimates(spark, docs):
    cms = sketch.cms_build(docs, "lang", depth=4, width=64)
    items = docs.select("lang").distinct()
    est = {r["item"]: r["cms_est"]
           for r in sketch.cms_query(cms, items, "lang", depth=4, width=64).collect()}
    truth = {r["lang"]: r["c"] for r in
             docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    for lang, t in truth.items():
        assert est[lang] >= t, (lang, est[lang], t)
        # width=64 over 5 items: collisions possible but error ≤ total/width·e
        assert est[lang] <= t + docs.count(), lang


def test_cms_sketch_size_bounded(spark, docs):
    cms = sketch.cms_build(docs, "text", depth=4, width=32)
    assert cms.count() <= 4 * 32


def test_cms_matches_duckdb(spark, docs, con):
    spark_rows = _rows(sketch.cms_build(docs, "lang", depth=4, width=64))
    cte = sketch.sql_cms_cte("documents", "lang", depth=4, width=64)
    duck_rows = sorted(tuple(r) for r in con.execute(
        f"WITH {cte} SELECT row, bucket, cnt FROM cms").fetchall())
    assert spark_rows == duck_rows


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------

def test_hll_registers_exact_recompute(spark, docs):
    """Registers must equal a direct python recompute of the same hashes."""
    from geobuf_spark.functions import phash
    hashes = [r["h"] for r in docs.select(
        phash.hash60(F.concat(F.lit("hll\x1e"),
                              F.col("doc_id").cast("string"))).alias("h"))
        .collect()]
    b, width = 6, 54
    regs = {}
    for h in hashes:
        bucket, rest = h & 63, h >> b
        rho = width + 1 if rest == 0 else width - rest.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    got = {r["bucket"]: r["r"]
           for r in sketch.hll_registers(docs, "doc_id", b=6).collect()}
    assert got == regs


def test_hll_estimate_accuracy(spark, docs):
    """m=64 → rel std err ~13%; assert 3 sigma on the 500-distinct fixture
    (raw estimate — n >> 2.5m so no linear-counting regime)."""
    est = sketch.hll_estimate(sketch.hll_registers(docs, "doc_id", b=6), b=6)
    row = est.collect()[0]
    truth = docs.select("doc_id").distinct().count()
    assert truth * 0.6 <= row["est_raw"] <= truth * 1.4, (row["est_raw"], truth)
    assert row["m"] == 64
    assert row["n_present"] + row["n_zero"] == 64


def test_hll_duplicates_invisible(spark, docs):
    once = _rows(sketch.hll_estimate(sketch.hll_registers(docs, "doc_id", b=5), b=5))
    twice = _rows(sketch.hll_estimate(
        sketch.hll_registers(docs.unionAll(docs), "doc_id", b=5), b=5))
    assert once == twice


def test_hll_matches_duckdb(spark, docs, con):
    spark_rows = _rows(sketch.hll_estimate(sketch.hll_registers(docs, "doc_id", b=6), b=6))
    cte = sketch.sql_hll_cte("documents", "doc_id", b=6)
    duck_rows = sorted(tuple(r) for r in con.execute(
        f"WITH {cte} SELECT m, n_present, n_zero, s_scaled, est_raw FROM hll"
    ).fetchall())
    assert spark_rows == duck_rows


def test_hll_b_bounds():
    with pytest.raises(ValueError):
        sketch.hll_registers(None, "v", b=3)
    with pytest.raises(ValueError):
        sketch.hll_registers(None, "v", b=7)


# ---------------------------------------------------------------------------
# plan shapes — all four sketches stay JVM-side and aggregate map-side
# ---------------------------------------------------------------------------

def test_sketch_plans_jvm_only(spark, docs):
    plans = {
        "kmv": _plan(sketch.kmv_distinct(docs, ["lang"], "doc_id", k=16)),
        "bloom": _plan(sketch.bloom_build(docs, "lang", m_bits=1 << 10)),
        "cms": _plan(sketch.cms_build(docs, "lang", width=64)),
        "hll": _plan(sketch.hll_estimate(sketch.hll_registers(docs, "doc_id"))),
    }
    for name, plan in plans.items():
        for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInArrow",
                       "FlatMapGroupsInPandas", "MapInPandas",
                       "CartesianProduct", "BroadcastNestedLoop"):
            assert marker not in plan, f"{name}: {marker}"
    # every sketch build must partial-aggregate before its shuffle so the
    # shuffle carries sketch-sized data, not input-sized data
    for name in ("bloom", "cms"):
        assert "partial" in plans[name].lower(), plans[name]
    # HLL global fold: exactly the hash-agg exchange + the final
    # single-partition gather
    assert plans["hll"].count("Exchange") == 2, plans["hll"]


def test_sketch_entry_query_shuffle_budgets(spark):
    """Exchange budgets for the four registered sketch queries — each
    shuffle past the widen() lift carries sketch-sized (constant) data:
    kmv = widen + distinct + lang window (the final lang agg reuses the
    window's partitioning); hll = widen + hash agg + 1-row gather; bloom/
    cms pay two widened scans, their build agg, the probe-side distinct,
    and a BroadcastExchange for the filter join (never a shuffle join —
    the build side is ≤ sketch-size by construction)."""
    import __spark_entry__ as em

    budgets = {"sketch_kmv_lang": 3, "sketch_hll_docs": 3,
               "sketch_cms_lang": 5, "sketch_bloom_doc_gate": 6}
    for q, budget in budgets.items():
        plan = _plan(em.queries()[q](spark, "/root/testdata/sf0.001"))
        assert plan.count("Exchange") == budget, f"{q}\n{plan}"
        for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInArrow",
                       "FlatMapGroupsInPandas", "MapInPandas",
                       "CartesianProduct", "BroadcastNestedLoop",
                       "SortMergeJoin", "ShuffledHashJoin"):
            assert marker not in plan, f"{q}: {marker}"


def test_bloom_probe_broadcasts_filter(spark, docs):
    members = docs.select(F.col("doc_id").cast("string").alias("key"))
    bloom = sketch.bloom_build(members, "key", m_bits=1 << 12)
    plan = _plan(sketch.bloom_probe(members, "key", bloom, m_bits=1 << 12))
    assert "BroadcastHashJoin" in plan, plan
