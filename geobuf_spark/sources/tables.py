"""Driver-provided parquet tables (TPC-H-ish star schema + documents/embeddings)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def widen(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Raise scan parallelism to the session's cores when the input's
    natural split count is below it (single-row-group small files).

    Parquet can't split below row-group granularity, so a one-row-group
    file pins every downstream narrow stage to one task. At production
    scale inputs carry thousands of row groups and this is a no-op — the
    round-robin shuffle only ever pays for itself on tiny inputs where the
    shuffled bytes are trivially small."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
