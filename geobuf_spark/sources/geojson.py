"""GeoJSON ingest — ConvertGeojson (convert_geojson.go:153-166) Spark-first.

Line-delimited GeoJSON (the reference's test_data/ld.geojson shape) maps to
`spark.read.text` + `from_json`: distributed parse, no brace-matching
chunker needed (ReadChunk's 10 MB splitter, convert_geojson.go:45-107, is
an artifact of single-process streaming). A whole-file FeatureCollection is
the driver-edge fallback (json.load → parallelize), like the reference's
one-shot path.

Output rows use the engine's columnar geometry model (codec.spark_codec
GEOM_SCHEMA) and re-encode to geobuf frames via the generic kernel — the
full geojson2geobuf pipeline.
"""

from __future__ import annotations

import json

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geobuf_spark.codec import core
from geobuf_spark.codec.spark_codec import GEOM_SCHEMA


def _feature_to_row(feat: dict) -> dict:
    g = feat.get("geometry") or {}
    f = core.Feature.from_geojson(
        g["type"], g["coordinates"], id=feat.get("id"),
        properties=feat.get("properties") or {},
    )
    return {
        "id": None if f.id is None else int(f.id),
        "geom_type": f.geom_type, "dim": f.dim,
        "coords": f.coords.tolist(), "ring_lens": f.ring_lens.tolist(),
        "part_rings": f.part_rings.tolist(),
        "props_json": json.dumps(f.properties, sort_keys=True),
    }


_ARROW_SCHEMA = pa.schema([
    ("id", pa.int64()),
    ("geom_type", pa.int32()),
    ("dim", pa.int32()),
    ("coords", pa.list_(pa.float64())),
    ("ring_lens", pa.list_(pa.int32())),
    ("part_rings", pa.list_(pa.int32())),
    ("props_json", pa.string()),
])


def read_geojson_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line-delimited GeoJSON file(s) → GEOM_SCHEMA rows (distributed)."""
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 1)

    def _parse(batches):
        for batch in batches:
            rows = []
            for raw in batch.column(0).to_pylist():
                s = raw.strip().rstrip(",")
                if s in ("", "[", "]", "{", "}"):
                    continue
                rows.append(_feature_to_row(json.loads(s)))
            arrays = [
                pa.array([r[name] for r in rows], type=field.type)
                for name, field in zip(_ARROW_SCHEMA.names, _ARROW_SCHEMA)
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=_ARROW_SCHEMA)

    return lines.mapInArrow(_parse, GEOM_SCHEMA)


def read_feature_collection(spark: SparkSession, path: str,
                            parallelism: int = 8) -> DataFrame:
    """Whole-file FeatureCollection → GEOM_SCHEMA rows (driver edge)."""
    with open(path) as f:
        fc = json.load(f)
    rows = [_feature_to_row(feat) for feat in fc["features"]]
    return spark.createDataFrame(rows, GEOM_SCHEMA).repartition(parallelism)


def geojson_to_geobuf(spark: SparkSession, in_path: str, out_path: str,
                      line_delimited: bool = False) -> int:
    """The geojson2geobuf CLI as one job: parse → encode → framed file."""
    from geobuf_spark.codec.spark_codec import encode_features_generic
    from geobuf_spark.sources.geobuf_file import write_geobuf

    df = (read_geojson_lines if line_delimited else read_feature_collection)(spark, in_path)
    return write_geobuf(encode_features_generic(df), out_path)
