"""Similarity search over embedding columns.

- brute-force cosine top-k: the exactness baseline. Queries are broadcast
  as a dense numpy matrix; each partition computes a vectorized
  (batch × queries) GEMM in a pandas UDF — Arrow in, BLAS inside, no
  per-row Python. Global top-k per query via window.
- LSH-bucketed ANN (random hyperplane signatures, pure expressions): the
  scale path — candidates share a signature band, so the join is linear;
  recall measured against the brute-force baseline in tests.

At 10^12 vectors the brute-force path is a full scan per query batch —
still the right tool for small query sets (GEMM is ~free per row); the LSH
path bounds work when query sets are large.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def brute_force_topk(vectors: DataFrame, queries: DataFrame, k: int,
                     vec_id: str = "vec_id", emb: str = "embedding",
                     query_id: str = "query_id") -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank), self excluded,
    ties broken by neighbor id."""
    qrows = queries.select(query_id, emb).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30)

    spark = vectors.sparkSession
    b_qids = spark.sparkContext.broadcast(qids)
    b_qmat = spark.sparkContext.broadcast(qnorm)

    out_schema = T.StructType([
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cos", T.DoubleType()),
    ])

    def _score(batches):
        qi, qm = b_qids.value, b_qmat.value
        for pdf in batches:
            ids = pdf[vec_id].to_numpy(np.int64)
            mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[emb]])
            if len(mat) == 0:
                continue
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
            cos = mat @ qm.T  # (batch, nq)
            n_batch, nq = cos.shape
            yield pd.DataFrame({
                "query_id": np.repeat(qi, n_batch),
                "neighbor_id": np.tile(ids, nq),
                "cos": cos.T.reshape(-1),
            })

    scored = vectors.select(vec_id, emb).mapInPandas(_score, out_schema)
    scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hyperplanes(dim: int, nbits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim))


def lsh_signatures(vectors: DataFrame, nbits: int = 16, seed: int = 7,
                   vec_id: str = "vec_id", emb: str = "embedding") -> DataFrame:
    """Random-hyperplane signature as a bigint — computed with
    F.aggregate/zip_with expressions (JVM-side dot products)."""
    first = vectors.select(F.size(emb).alias("d")).first()
    dim = first.d
    planes = _hyperplanes(dim, nbits, seed)
    sig = None
    for b in range(nbits):
        plane = F.array(*[F.lit(float(v)) for v in planes[b]])
        dot = F.aggregate(
            F.zip_with(F.col(emb), plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        bit = F.when(dot > 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint") * F.lit(1 << b)
        sig = bit if sig is None else sig + bit
    return vectors.select(F.col(vec_id), F.col(emb), sig.alias("lsh_sig"))


def ann_topk(vectors: DataFrame, queries: DataFrame, k: int, *, nbits: int = 16,
             bands: int = 4, seed: int = 7, vec_id: str = "vec_id",
             emb: str = "embedding", query_id: str = "query_id") -> DataFrame:
    """Approximate top-k: candidates share ≥1 signature band; exact cosine
    re-rank on candidates only (expression dot product — JVM-side)."""
    width = nbits // bands
    sv = lsh_signatures(vectors, nbits, seed, vec_id, emb)
    sq = lsh_signatures(queries.withColumnRenamed(query_id, vec_id), nbits, seed, vec_id, emb) \
        .withColumnRenamed(vec_id, "query_id").withColumnRenamed(emb, "qemb") \
        .withColumnRenamed("lsh_sig", "qsig")

    def bandcol(sig, i):
        return F.shiftrightunsigned(sig, i * width).bitwiseAND(F.lit((1 << width) - 1))

    v_b = sv.select(
        vec_id, emb,
        F.posexplode(F.array(*[bandcol(F.col("lsh_sig"), i) for i in range(bands)])).alias("band", "bucket"),
    )
    q_b = sq.select(
        "query_id", "qemb",
        F.posexplode(F.array(*[bandcol(F.col("qsig"), i) for i in range(bands)])).alias("band", "bucket"),
    )
    cand = (
        q_b.join(v_b, ["band", "bucket"])
        .filter(F.col(vec_id) != F.col("query_id"))
        .dropDuplicates(["query_id", vec_id])
    )
    dot = F.aggregate(
        F.zip_with(F.col(emb), F.col("qemb"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))
    cos = dot / F.greatest(norm(emb) * norm("qemb"), F.lit(1e-30))
    scored = cand.withColumn("cos", cos)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(vec_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(vec_id).alias("neighbor_id"), "rank")
    )
