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


def decoded_features(spark: SparkSession, path: str, repartition: int | None = None) -> DataFrame:
    """Geobuf file → fully decoded feature rows (generic cold path)."""
    from geobuf_spark.codec import spark_codec

    return spark_codec.decode_features_generic(
        read_geobuf(spark, path, repartition), bin_col="geobuf"
    )


_ = np  # numpy retained for kernel parity
