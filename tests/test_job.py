"""End-to-end job: lineage, metrics, idempotent resume, output integrity."""

from pyspark.sql import functions as F

from geobuf_spark.jobs.tile_pages import run_job


def test_tile_pages_job_end_to_end(spark, tmp_path, sf_small):
    out = str(tmp_path / "job_out")
    r1 = run_job(spark, n_pages=5000, sf_dir=sf_small, out=out, zoom=8, run_id="r1")
    assert r1["commit"]["status"] == "committed"
    assert r1["rows_joined"] > 0

    data = spark.read.parquet(f"{out}/data")
    assert data.count() == r1["rows_joined"]
    assert {"z", "x", "y"} <= set(data.columns)

    # lineage totals match output
    lin = spark.read.parquet(f"{out}/_lineage")
    assert lin.agg(F.sum("n_rows")).first()[0] == r1["rows_joined"]

    # metrics recorded for all four stages
    met = spark.read.parquet(f"{out}/_metrics")
    stages = {r.stage for r in met.collect()}
    assert stages == {"synthesize_pages", "codec_roundtrip", "pip_join", "tile_assign_commit"}

    # resume with same run id: idempotent no-op, data unchanged
    r2 = run_job(spark, n_pages=5000, sf_dir=sf_small, out=out, zoom=8, run_id="r1")
    assert r2["commit"]["status"] == "already_committed"
    assert spark.read.parquet(f"{out}/data").count() == r1["rows_joined"]

    # deterministic rerun under a new run id yields identical content
    r3 = run_job(spark, n_pages=5000, sf_dir=sf_small, out=out, zoom=8, run_id="r2")
    assert r3["commit"]["status"] == "committed"
    lin2 = spark.read.parquet(f"{out}/_lineage")
    # two lineage generations, equal per-partition fingerprints
    gens = lin2.groupBy("z", "x", "y", "content_xor").agg(F.count("*").alias("c"))
    assert gens.filter(F.col("c") != 2).count() == 0


def test_clean_corpus_job(spark, tmp_path, sf_small):
    from geobuf_spark.jobs.clean_corpus import run_job as clean_run

    out = str(tmp_path / "corpus_out")
    r = clean_run(spark, sf_small, out, "c1", min_tokens=5, jaccard=0.8,
                  max_dup_span=0.9)
    rows = r["rows"]
    # monotone shrinkage through the funnel
    assert rows["input"] >= rows["lang"] >= rows["mirror"] >= rows["exact"] \
        >= rows["near"] >= rows["span"] >= rows["quality"] > 0
    # the stock fixture has no mirrored sources: the gate is a no-op here
    assert rows["mirror"] == rows["lang"]
    data = spark.read.parquet(f"{out}/data")
    assert data.count() == rows["quality"]
    assert "lang" in data.columns and "n_tokens" in data.columns
    # kept docs contain no exact duplicates by construction
    assert data.select("text").distinct().count() == data.count()
    met = spark.read.parquet(f"{out}/_metrics")
    stages = {x.stage for x in met.collect()}
    assert {"load", "lang_filter", "mirror_gate", "exact_dedup",
            "near_dedup", "span_dedup_gate", "quality_gate", "commit"} <= stages
    # idempotent rerun
    r2 = clean_run(spark, sf_small, out, "c1", min_tokens=5, jaccard=0.8)
    assert r2["commit"]["status"] == "already_committed"


def test_clean_corpus_mirror_gate(spark, tmp_path, sf_small):
    """Planted mirror source: src_m carries copies of most of src0's texts
    plus one lightly edited page. The gate must drop ALL of src_m —
    including the near-mirror page that exact dedup could never catch —
    and must keep the canonical src0 docs intact."""
    from pyspark.sql import functions as F

    from geobuf_spark.jobs.clean_corpus import run_job as clean_run

    base = spark.read.parquet(f"{sf_small}/documents.parquet")
    donors = base.filter(F.col("source") == "src0")
    n_donor = donors.count()
    mirror = donors.limit(n_donor - 1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.col("text"), F.col("lang"), F.lit("src_m").alias("source"),
        F.col("n_chars"))
    near = donors.orderBy(F.desc("doc_id")).limit(1).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" edited tail")).alias("text"),
        F.col("lang"), F.lit("src_m").alias("source"), F.col("n_chars"))
    src = str(tmp_path / "mirror_sf")
    base.unionByName(mirror).unionByName(near) \
        .write.parquet(f"{src}/documents.parquet")

    out = str(tmp_path / "mirror_out")
    r = clean_run(spark, src, out, "m1", min_tokens=5, jaccard=0.8,
                  max_dup_span=0.9, mirror_jaccard=0.5)
    rows = r["rows"]
    # every src_m doc is gone at the mirror gate (n_donor copies + 1 near)
    assert rows["lang"] - rows["mirror"] == n_donor
    data = spark.read.parquet(f"{out}/data")
    assert data.filter(F.col("text").contains("edited tail")).count() == 0
    # ...and the base corpus is POSITIVELY untouched: the gate removes the
    # planted source before any dedup stage sees it, so the run's final
    # output must equal a baseline run on the unpolluted fixture exactly
    base_out = str(tmp_path / "base_out")
    clean_run(spark, sf_small, base_out, "m0", min_tokens=5, jaccard=0.8,
              max_dup_span=0.9, mirror_jaccard=0.5)
    base_ids = {r["doc_id"] for r in spark.read.parquet(f"{base_out}/data")
                .select("doc_id").collect()}
    out_ids = {r["doc_id"] for r in data.select("doc_id").collect()}
    assert out_ids == base_ids and out_ids
