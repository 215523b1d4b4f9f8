"""Geobuf file ingest/export — the ConvertGeojson/ConvertGeobuf edge
(convert_geojson.go:153-193) plus whole-file scan (ReaderFile, reader.go:64-80).

Ingest: `binaryFile` source → frame splitter in mapInArrow → one row per
feature frame (metadata dummy skipped, reader.go:258-274 semantics). A
geobuf file is a single stream, so splitting is single-task per file;
`repartition` afterwards distributes decode. At scale, many files (the
reference's subfiles) parallelize naturally.

Export: collect frames to the driver and write one framed file — inherently
a single-writer edge, like the reference's Writer (writer.go:43-89); for
distributed export use the partitioned-table sink (operators.tiling).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from geobuf_spark.codec import core


def read_geobuf(spark: SparkSession, path: str, repartition: int | None = None) -> DataFrame:
    """Geobuf file(s) → DataFrame of raw frames (frame_idx, geobuf)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("geobuf", T.BinaryType()),
    ])

    def _split(batches):
        for batch in batches:
            paths = batch.column(0).to_pylist()
            contents = batch.column(1)
            out_p, out_i, out_f = [], [], []
            for row in range(len(contents)):
                data = contents[row].as_py()
                for i, frame in enumerate(core.read_frames(data)):
                    out_p.append(paths[row])
                    out_i.append(i)
                    out_f.append(bytes(frame))
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_p), pa.array(out_i, type=pa.int64()),
                 pa.array(out_f, type=pa.binary())],
                names=["path", "frame_idx", "geobuf"],
            )

    frames = files.mapInArrow(_split, schema)
    return frames.repartition(repartition) if repartition else frames


def write_geobuf(df: DataFrame, out_path: str, bin_col: str = "geobuf") -> int:
    """Frames → one framed geobuf file (driver-side single-writer edge)."""
    frames = [bytes(r[0]) for r in df.select(bin_col).collect()]
    data = core.write_frames(frames)
    with open(out_path, "wb") as f:
        f.write(data)
    return len(frames)


def decoded_features(spark: SparkSession, path: str, repartition: int | None = None,
                     fast: bool = True) -> DataFrame:
    """Geobuf file → fully decoded feature rows.

    `fast=True` (default) runs geometry through the payload-token batch
    kernels (decode_features_fast — vectorized, reader.go:84-112 scan
    semantics) with only the dynamic properties parsed per frame.
    `fast=False` keeps the per-feature generic decoder, needed only for
    geometry-less frames (a bare-properties feature)."""
    from geobuf_spark.codec import spark_codec

    frames = read_geobuf(spark, path, repartition)
    if fast:
        return spark_codec.decode_features_fast(frames, bin_col="geobuf")
    return spark_codec.decode_features_generic(frames, bin_col="geobuf")


_ = np  # numpy retained for kernel parity


def write_geobuf_indexed(df: DataFrame, out_path: str, key_col: str,
                         bin_col: str = "geobuf") -> dict:
    """Splitter.Combine parity (split_combine.go:186-232): one framed file
    physically clustered by key, plus a key → [start, end) byte-range
    index sidecar (`<out>.idx.json` — replacing the Go-gob metadata dummy
    feature with a portable JSON manifest).

    The write is a driver-side export edge (single file, like the
    reference's Writer); frames arrive pre-grouped by one shuffle
    (repartition+sortWithinPartitions is overkill for an edge — a keyed
    collect preserves grouping)."""
    import json

    rows = df.select(key_col, bin_col).collect()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(str(r[0]), []).append(bytes(r[1]))
    index = {}
    pos = 0
    with open(out_path, "wb") as f:
        for key in sorted(by_key):
            start = pos
            data = core.write_frames(by_key[key])  # single framing impl
            f.write(data)
            pos += len(data)
            index[key] = {"positions": [start, pos],
                          "number_features": len(by_key[key]),
                          "size": pos - start}
    meta = {"file_size": pos, "number_features": sum(
        v["number_features"] for v in index.values()), "files": index}
    with open(out_path + ".idx.json", "w") as f:
        json.dump(meta, f)
    return meta


def read_geobuf_subfile(spark: SparkSession, path: str, key: str) -> DataFrame:
    """SubFileSeek/SubFileNext/SubFileBytes parity (reader.go:278-304):
    seek directly to one key's byte range — bytes outside it are never
    read — and scan only its frames."""
    import json

    with open(path + ".idx.json") as f:
        meta = json.load(f)
    ent = meta["files"].get(key)
    if ent is None:
        return spark.createDataFrame(
            [], T.StructType([T.StructField("frame_idx", T.LongType()),
                              T.StructField("geobuf", T.BinaryType())]))
    start, end = ent["positions"]
    with open(path, "rb") as f:
        f.seek(start)
        blob = f.read(end - start)
    # mid-file ranges written by write_geobuf_indexed never contain the
    # metadata dummy — skip the sniff so a user feature whose only
    # property is named "metadata" is not silently dropped
    frames = [(i, bytearray(fr))
              for i, fr in enumerate(core.read_frames(blob, skip_metadata=False))]
    return spark.createDataFrame(frames, "frame_idx bigint, geobuf binary")
