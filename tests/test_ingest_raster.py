"""GeoJSON ingest pipeline (ld.geojson → geobuf) and raster↔vector ops."""

import json

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from geobuf_spark.operators import raster
from geobuf_spark.sources import geojson, minted


def test_ld_geojson_ingest(spark):
    df = geojson.read_geojson_lines(spark, "/root/reference/test_data/ld.geojson")
    rows = df.collect()
    assert len(rows) == 3304
    # spot-check against raw lines
    first = json.loads(open("/root/reference/test_data/ld.geojson").readline())
    got = [r for r in rows if json.loads(r.props_json).get("index") == first["properties"]["index"]
           and r.geom_type == 3]
    assert got


def test_geojson_to_geobuf_roundtrip(spark, tmp_path):
    """Full geojson2geobuf → read back with the reference-semantics decoder,
    compare feature-for-feature (≤1e-7 like the reference's own tests)."""
    out = str(tmp_path / "ld.geobuf")
    n = geojson.geojson_to_geobuf(spark, "/root/reference/test_data/ld.geojson",
                                  out, line_delimited=True)
    assert n == 3304
    from geobuf_spark.codec import core
    frames = list(core.read_frames(open(out, "rb").read()))
    assert len(frames) == 3304
    # decode a sample; match against source rows by (AREA, first coord)
    lines = [json.loads(line) for line in open("/root/reference/test_data/ld.geojson")]
    # our export preserves input order (no goroutine races — documented)
    for i in [0, 1, 100, 3303]:
        f = core.decode_feature(frames[i])
        want = core.Feature.from_geojson(
            lines[i]["geometry"]["type"], lines[i]["geometry"]["coordinates"])
        assert f.geom_type == want.geom_type
        assert np.abs(f.coords - want.coords).max() <= 1.001e-7


@pytest.fixture(scope="module")
def points(spark, sf_small):
    return minted.minted_points(spark, sf_small).cache()


def test_rasterize_matches_duckdb(spark, points, sf_small):
    r = raster.rasterize(points, z=4, res_bits=4)
    got = {tuple(row) for row in r.collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_small}/documents.parquet'")
    want = {tuple(row) for row in con.execute(
        raster.sql_rasterize(minted.SQL_MINTED_POINTS, z=4, res_bits=4)).fetchall()}
    assert got == want


def test_vectorize_matches_duckdb(spark, points, sf_small):
    r = raster.rasterize(points, z=3, res_bits=4)
    v = raster.vectorize(r, threshold=1)
    got = {tuple(row) for row in v.select("z", "x", "y", "py", "px0", "px1", "total").collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_small}/documents.parquet'")
    want = {tuple(row) for row in con.execute(raster.sql_vectorize(
        raster.sql_rasterize(minted.SQL_MINTED_POINTS, z=3, res_bits=4))).fetchall()}
    assert got == want


def test_raster_vector_roundtrip_invariants(spark, points):
    """boxes cover exactly the occupied pixels; every point is in a box."""
    z, rb = 4, 4
    r = raster.rasterize(points, z=z, res_bits=rb).cache()
    v = raster.vectorize(r, threshold=1)
    # expand boxes back to pixels → must equal occupied pixel set
    expanded = v.withColumn("px", F.explode(F.sequence("px0", "px1"))) \
        .select("z", "x", "y", "px", "py")
    occ = r.select("z", "x", "y", "px", "py")
    assert expanded.exceptAll(occ).count() == 0
    assert occ.exceptAll(expanded).count() == 0
    # pixel counts conserved
    assert v.agg(F.sum("total")).first()[0] == points.count()


def test_geobuf_to_geojson_roundtrip(spark, tmp_path):
    """ld.geojson → geobuf file → back to a FeatureCollection: parsed
    values equal within codec tolerance (ConvertGeobuf semantics, minus
    the reference's double-Next bug)."""
    import json

    from geobuf_spark.sources import geojson as GJ

    src = "/root/reference/test_data/ld.geojson"
    buf_path = str(tmp_path / "out.geobuf")
    gj_path = str(tmp_path / "back.geojson")
    GJ.geojson_to_geobuf(spark, src, buf_path, line_delimited=True)
    n = GJ.geobuf_to_geojson(spark, buf_path, gj_path)
    fc = json.load(open(gj_path))
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == n and n > 3000
    # spot-check: every output feature parses and coordinates are finite
    f0 = fc["features"][0]
    assert f0["geometry"]["type"] in ("Point", "LineString", "Polygon",
                                      "MultiPoint", "MultiLineString", "MultiPolygon")


def test_csv_pipe_sink(spark, tmp_path, sf_small):
    from geobuf_spark.sources import sinks

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    out = str(tmp_path / "csv_out")
    sinks.write_csv_pipe(docs, out, cols=["doc_id", "lang", "n_chars"])
    back = spark.read.option("sep", "|").option("header", True).csv(out)
    assert back.count() == docs.count()
    assert back.columns == ["doc_id", "lang", "n_chars"]


def test_indexed_geobuf_subfile_seek(spark, sf_small, tmp_path):
    """SubFileSeek parity on OUR files: write key-clustered frames + byte
    index, then read ONE key's range and get exactly its features."""
    from pyspark.sql import functions as F

    from geobuf_spark.codec import spark_codec
    from geobuf_spark.operators import tiling
    from geobuf_spark.sources import geobuf_file as GF
    from geobuf_spark.sources import minted

    pts = minted.minted_points(spark, sf_small)
    assigned = tiling.assign_tiles_points(pts, z=4)
    enc = spark_codec.encode_points(
        assigned.select("doc_id", "lon", "lat"), id_col="doc_id")
    keyed = enc.join(assigned.select("doc_id", "x", "y"), "doc_id") \
        .withColumn("tile", F.concat_ws("_", F.lit(4), "x", "y"))

    path = str(tmp_path / "tiles.geobuf")
    meta = GF.write_geobuf_indexed(keyed, path, key_col="tile")
    assert meta["number_features"] == pts.count()

    # per-key range scans reproduce the per-tile feature sets exactly
    want = {(r.tile, r.doc_id) for r in keyed.select("tile", "doc_id").collect()}
    got = set()
    for key in meta["files"]:
        sub = GF.read_geobuf_subfile(spark, path, key)
        dec = spark_codec.decode_points(sub, quantized=True)
        for r in dec.collect():
            got.add((key, r.id))
    assert got == want
    # absent key → empty
    assert GF.read_geobuf_subfile(spark, path, "9_9_9").count() == 0
    # the whole indexed file is still a valid plain geobuf stream
    full = GF.read_geobuf(spark, path)
    assert full.count() == pts.count()


def test_geojson_edge_cases(spark, tmp_path):
    """RFC 7946 edge inputs: null geometry skipped, string ids dropped
    (reference write_feature.go:195-209 semantics), NaN-id export safe."""
    import json

    from geobuf_spark.sources import geojson as GJ

    p = tmp_path / "edge.jsonl"
    feats = [
        {"type": "Feature", "geometry": None, "properties": {"a": 1}},
        {"type": "Feature", "id": "road-17",
         "geometry": {"type": "Point", "coordinates": [1.0, 2.0]}, "properties": {}},
        {"type": "Feature", "id": 7,
         "geometry": {"type": "Point", "coordinates": [3.0, 4.0]}, "properties": {}},
    ]
    p.write_text("\n".join(json.dumps(f) for f in feats))
    rows = GJ.read_geojson_lines(spark, str(p)).collect()
    assert len(rows) == 2  # null geometry skipped
    ids = sorted((r.id is None, r.id) for r in rows)
    assert ids[0] == (False, 7) and ids[1][0] is True  # string id dropped
    # export path survives the null id (pandas NaN)
    out = GJ.features_to_geojson(GJ.read_geojson_lines(spark, str(p))).collect()
    parsed = [json.loads(r.geojson) for r in out]
    assert sum("id" in f for f in parsed) == 1


def test_subfile_metadata_key_not_dropped(spark, sf_small, tmp_path):
    """a user feature whose ONLY property is 'metadata' survives a subfile
    range read (mid-file ranges skip the dummy sniff)."""
    from geobuf_spark.codec import core
    from geobuf_spark.sources import geobuf_file as GF

    f = core.Feature.from_geojson("Point", [1.0, 2.0], id=5,
                                  properties={"metadata": "user data"})
    df = spark.createDataFrame(
        [(5, bytearray(core.encode_feature(f)), "k1")],
        "doc_id bigint, geobuf binary, tile string")
    path = str(tmp_path / "meta.geobuf")
    meta = GF.write_geobuf_indexed(df, path, key_col="tile")
    sub = GF.read_geobuf_subfile(spark, path, "k1")
    assert sub.count() == 1 == meta["files"]["k1"]["number_features"]


def test_write_geobuf_indexed_edge_shapes(spark, tmp_path):
    """Distributed indexed write: empty input and single-key input both
    produce valid file+index; keys never split across range partitions."""
    from geobuf_spark.codec import spark_codec
    from geobuf_spark.sources import geobuf_file as GF

    empty = spark.createDataFrame([], "tile string, geobuf binary")
    meta = GF.write_geobuf_indexed(empty, str(tmp_path / "e.geobuf"), "tile")
    assert meta["number_features"] == 0 and meta["files"] == {}

    p = spark.createDataFrame(
        [(i, 10.0 + i, 20.0) for i in range(50)], "doc_id long, lon double, lat double")
    enc = spark_codec.encode_points(p).withColumn("tile", F.lit("only"))
    path = str(tmp_path / "one.geobuf")
    meta = GF.write_geobuf_indexed(enc, path, "tile", num_ranges=4)
    assert meta["number_features"] == 50
    assert list(meta["files"]) == ["only"]
    back = GF.read_geobuf_subfile(spark, path, "only")
    assert back.count() == 50


def test_write_geobuf_indexed_survives_stale_attempt_garbage(spark, tmp_path):
    """A dead speculative/retried attempt leaves attempt-suffixed temp
    files (and even orphan part files from a previous crashed run) in the
    .parts staging dir; the driver concat reads only the paths the
    committed tasks reported, so the output file and index stay exact."""
    from geobuf_spark.codec import spark_codec
    from geobuf_spark.sources import geobuf_file as GF

    p = spark.createDataFrame(
        [(i, float(i % 7), 20.0) for i in range(60)],
        "doc_id long, lon double, lat double")
    enc = spark_codec.encode_points(p).withColumn(
        "tile", F.concat(F.lit("t"), (F.col("doc_id") % 3).cast("string")))

    path = str(tmp_path / "stale.geobuf")
    parts = tmp_path / "stale.geobuf.parts"
    parts.mkdir()
    (parts / "part-00000.attempt-999999").write_bytes(b"\xde\xad" * 100)
    (parts / "part-99999").write_bytes(b"orphan from a crashed previous run")

    meta = GF.write_geobuf_indexed(enc, path, "tile", num_ranges=4)
    assert meta["number_features"] == 60
    got = set()
    for key in meta["files"]:
        sub = GF.read_geobuf_subfile(spark, path, key)
        got |= {(key, r.id) for r in
                spark_codec.decode_points(sub, quantized=True).collect()}
    want = {(f"t{i % 3}", i) for i in range(60)}
    assert got == want
