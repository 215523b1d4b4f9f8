"""Convenience sinks — ReadGeobufCSV (read_geobuf_stdout.go:188-221) and
friends as partitioned Spark writes."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv_pipe(df: DataFrame, path: str, cols: list[str] | None = None) -> None:
    """Pipe-delimited CSV export, one file per task — the reference's CSV
    dump (top-50 tag columns + Bounds/Type/Geometry) generalized to any
    column projection; Catalyst prunes the scan to `cols`."""
    out = df.select(*cols) if cols else df
    out.write.mode("overwrite").option("sep", "|").option("header", True).csv(path)


def write_json_lines(df: DataFrame, path: str) -> None:
    """Line-delimited JSON of whole rows (to_json on the JVM, no Python)."""
    df.write.mode("overwrite").json(path)
