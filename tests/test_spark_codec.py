"""Spark-level geobuf codec: encode/decode round trips on DataFrames."""

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from geobuf_spark.codec import core
from geobuf_spark.codec import spark_codec as sc
from geobuf_spark.sources import minted


def test_points_roundtrip_df(spark, sf_small):
    pts = minted.minted_points(spark, sf_small)
    enc = sc.encode_points(pts)
    dec = sc.decode_points(enc, quantized=True)
    got = {(r.id, r.lon_q, r.lat_q) for r in dec.collect()}
    want = {
        (r.doc_id, core.convert_pt(r.lon), core.convert_pt(r.lat))
        for r in pts.collect()
    }
    assert got == want


def test_points_frames_reference_decodable(spark, sf_small):
    """Every Spark-encoded frame parses with the reference-semantics core
    decoder — proving wire compatibility, not just self-consistency."""
    pts = minted.minted_points(spark, sf_small).limit(50)
    coords = {r.doc_id: (r.lon, r.lat) for r in pts.collect()}
    rows = sc.encode_points(pts).collect()
    assert len(rows) == len(coords)
    for r in rows:
        f = core.decode_feature(bytes(r.geobuf), quantized=True)
        assert f.id == r.doc_id
        assert core.GEOM_TYPES[f.geom_type] == "Point"
        lon, lat = coords[r.doc_id]
        assert f.coords[0] == core.convert_pt(lon)
        assert f.coords[1] == core.convert_pt(lat)
        # current-writer bbox present (write_feature.go:249-260)
        assert f.bbox is not None and len(f.bbox) == 4


def test_generic_roundtrip_df(spark):
    import json

    feats = [
        (1, 3, 2, [0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 0.0], [4], [1], json.dumps({"name": "sq"})),
        (2, 2, 2, [10.5, -3.25, 11.0, -3.5], [2], [1], json.dumps({"k": 7})),
        (3, 6, 2, [0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 0.0,
                   5.0, 5.0, 6.0, 5.0, 6.0, 6.0, 5.0, 5.0], [4, 4], [1, 1], "{}"),
    ]
    df = spark.createDataFrame(feats, schema=sc.GEOM_SCHEMA)
    enc = sc.encode_features_generic(df)
    dec = sc.decode_features_generic(enc)
    got = {r.id: r for r in dec.collect()}
    for fid, gt, dim, coords, rl, pr, props in feats:
        r = got[fid]
        assert r.geom_type == gt and r.dim == dim
        assert list(r.ring_lens) == rl and list(r.part_rings) == pr
        assert np.abs(np.array(r.coords) - np.array(coords)).max() <= 1e-7
        assert json.loads(r.props_json) == json.loads(props)


def test_kernel_empty_batch():
    arr = sc.encode_points_kernel(
        np.empty(0, np.int64), np.empty(0, np.float64), np.empty(0, np.float64)
    )
    ids, qx, qy = sc.decode_points_kernel(pa.array([], type=pa.binary()))
    assert len(arr) == 0 and len(ids) == 0 and len(qx) == 0 and len(qy) == 0


# ---------------------------------------------------------------------------
# vectorized property tables (fixed schema) on the point hot path
# ---------------------------------------------------------------------------

def test_points_props_kernel_byte_parity():
    import numpy as np

    rng = np.random.default_rng(47)
    n = 300
    ids = rng.integers(0, 2**40, n)
    lon = rng.uniform(-170, 170, n); lat = rng.uniform(-80, 80, n)
    langs = [["en", "de", "fr", "zh-Hant", ""][i % 5] for i in range(n)]
    urls = [f"https://example.com/page/{i}?q=é{i%7}" for i in range(n)]
    nchars = rng.integers(0, 1_000_000, n)
    flat_l = np.frombuffer("".join(langs).encode("utf-8"), dtype=np.uint8)
    offs_l = np.concatenate(([0], np.cumsum([len(s.encode()) for s in langs]))).astype(np.int64)
    flat_u = np.frombuffer("".join(urls).encode("utf-8"), dtype=np.uint8)
    offs_u = np.concatenate(([0], np.cumsum([len(s.encode()) for s in urls]))).astype(np.int64)
    arr = sc.encode_points_props_kernel(ids, lon, lat, [
        ("url", "str", (flat_u, offs_u)),
        ("lang", "str", (flat_l, offs_l)),
        ("n_chars", "int", nchars),
    ])
    for i in range(0, n, 23):
        cf = core.Feature.from_geojson(
            "Point", [lon[i], lat[i]], id=int(ids[i]),
            properties={"url": urls[i], "lang": langs[i], "n_chars": int(nchars[i])})
        assert core.encode_feature(cf) == arr[i].as_py(), i
    # round-trip through the reference-semantics decoder
    f = core.decode_feature(arr[5].as_py())
    assert f.properties == {"url": urls[5], "lang": langs[5], "n_chars": int(nchars[5])}


def test_encode_points_with_props_dataframe(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    from geobuf_spark.sources import minted

    pts = minted.minted_points(spark, sf_small).join(
        docs.select("doc_id", "lang", "n_chars"), "doc_id")
    enc = sc.encode_points_with_props(pts, props=["lang", "n_chars"])
    rows = enc.orderBy("doc_id").limit(20).collect()
    src = {r.doc_id: (r.lang, r.n_chars) for r in pts.orderBy("doc_id").limit(20).collect()}
    for r in rows:
        f = core.decode_feature(bytes(r.geobuf))
        assert (f.properties["lang"], f.properties["n_chars"]) == src[r.doc_id]
        assert f.id == r.doc_id and f.geom_type == 1


def test_points_props_kernel_float_parity():
    import numpy as np

    rng = np.random.default_rng(53)
    n = 100
    ids = np.arange(n); lon = rng.uniform(-170, 170, n); lat = rng.uniform(-80, 80, n)
    vals = rng.standard_normal(n) * 1e6
    arr = sc.encode_points_props_kernel(ids, lon, lat, [("score", "float", vals)])
    for i in range(0, n, 13):
        cf = core.Feature.from_geojson("Point", [lon[i], lat[i]], id=int(ids[i]),
                                       properties={"score": float(vals[i])})
        assert core.encode_feature(cf) == arr[i].as_py(), i
    f = core.decode_feature(arr[3].as_py())
    assert f.properties["score"] == vals[3]


def test_lazy_property_extraction(spark, sf_small):
    """LazyFeatureTileID parity: pull ONE property out of real frames
    without touching geometry; values equal the full generic decode."""
    import numpy as np

    from geobuf_spark.sources import minted

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    pts = minted.minted_points(spark, sf_small).join(
        docs.select("doc_id", "lang", "n_chars"), "doc_id")
    enc = sc.encode_points_with_props(pts, props=["lang", "n_chars"]).cache()

    lazy_lang = {r.id: r.lang for r in sc.lazy_property(enc, "lang").collect()}
    lazy_n = {r.id: r.n_chars
              for r in sc.lazy_property(enc, "n_chars", value_type="bigint").collect()}
    src = {r.doc_id: (r.lang, r.n_chars) for r in pts.collect()}
    assert len(lazy_lang) == len(src)
    for k, (lang, n_chars) in src.items():
        assert lazy_lang[k] == lang, k
        assert lazy_n[k] == n_chars, k
    # absent key → all None
    miss = sc.lazy_property(enc, "nope").collect()
    assert all(r.nope is None for r in miss)
    enc.unpersist()


def test_lazy_property_kernel_direct():
    import numpy as np

    rng = np.random.default_rng(61)
    n = 50
    ids = np.arange(n)
    lon = rng.uniform(-10, 10, n); lat = rng.uniform(-10, 10, n)
    tiles = [f"9/{i}/{i*2}" for i in range(n)]
    flat = np.frombuffer("".join(tiles).encode(), dtype=np.uint8)
    offs = np.concatenate(([0], np.cumsum([len(t) for t in tiles]))).astype(np.int64)
    scores = rng.standard_normal(n)
    arr = sc.encode_points_props_kernel(ids, lon, lat, [
        ("TILEID", "str", (flat, offs)),
        ("score", "float", scores),
    ])
    got_ids, kinds, strs, ivals, fvals = sc.lazy_prop_kernel(arr, "TILEID")
    assert got_ids.tolist() == ids.tolist()
    assert (kinds == 1).all()
    assert strs == tiles
    _, k2, _, _, f2 = sc.lazy_prop_kernel(arr, "score")
    assert (k2 == 3).all() and np.array_equal(f2, scores)


def test_frame_keys_and_bbox_wire_level(spark, sf_small):
    import numpy as np

    from geobuf_spark.sources import minted

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    pts = minted.minted_points(spark, sf_small).join(
        docs.select("doc_id", "lang", "n_chars"), "doc_id")
    enc = sc.encode_points_with_props(pts, props=["lang", "n_chars"]).cache()

    # ReadKeys parity: distinct keys over all frames
    keys = {r.key for r in sc.frame_keys(enc).distinct().collect()}
    assert keys == {"lang", "n_chars"}

    # ReadBB parity: bbox without decoding geometry == quantized point box
    bb = sc.frame_bbox(enc)
    rows = bb.collect()
    src = {r.doc_id: (r.lon, r.lat) for r in pts.collect()}
    # degenerate point bbox: w==e==qx, s==n==qy — check the multiset matches
    got = sorted((r.w_q, r.s_q, r.e_q, r.n_q) for r in rows)
    want = sorted(
        (int(core.quantize_vec(np.array([lo]))[0]), int(core.quantize_vec(np.array([la]))[0]),
         int(core.quantize_vec(np.array([lo]))[0]), int(core.quantize_vec(np.array([la]))[0]))
        for lo, la in src.values())
    assert got == want
    enc.unpersist()


def test_frame_bbox_missing_field():
    """county.geobuf was written by an older encoder with NO bbox field —
    the wire-level reader must yield not-found, not garbage."""
    import numpy as np
    import pyarrow as pa

    from geobuf_spark.codec.core import read_frames

    data = open("/root/reference/test_data/county.geobuf", "rb").read()
    frames = []
    for i, fr in enumerate(read_frames(data)):
        frames.append(fr)
        if i >= 50:
            break
    arr = pa.array(frames, type=pa.binary())
    found, *_ = sc.frame_bbox_kernel(arr)
    assert not found.any()
    # but keys ARE readable from the same frames
    rows, keys = sc.frame_keys_kernel(arr)
    assert "AREA" in set(keys) and "COLORKEY" in set(keys)


def test_decode_points_any_with_props(spark, sf_small):
    """props-bearing point frames decode vectorized: coords equal the
    source lattice, ids preserved — no 14-token layout assumption."""
    import numpy as np

    from geobuf_spark.sources import minted

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    pts = minted.minted_points(spark, sf_small).join(
        docs.select("doc_id", "lang", "n_chars"), "doc_id")
    enc = sc.encode_points_with_props(pts, props=["lang", "n_chars"])
    frames = pa.array([bytes(r.geobuf) for r in enc.collect()], type=pa.binary())
    ids, qx, qy = sc.decode_points_any_kernel(frames)
    src = {r.doc_id: (r.lon, r.lat) for r in pts.collect()}
    for i in range(len(ids)):
        lo, la = src[int(ids[i])]
        assert qx[i] == core.quantize_vec(np.array([lo]))[0]
        assert qy[i] == core.quantize_vec(np.array([la]))[0]
    # also works on prop-less frames (same results as the fixed-layout path)
    enc2 = sc.encode_points_kernel(np.arange(10), np.linspace(-5, 5, 10), np.linspace(2, 3, 10))
    a1 = sc.decode_points_any_kernel(enc2)
    a2 = sc.decode_points_kernel(enc2)
    assert np.array_equal(a1[1], a2[1]) and np.array_equal(a1[2], a2[2])


def test_review_regressions():
    """Pinned repros from the round-1 codec review."""
    import numpy as np

    # (a) mixed-batch dispatch on props-bearing frames
    flat_l = np.frombuffer(b"ende", dtype=np.uint8); offs_l = np.array([0, 2, 4])
    arr = sc.encode_points_props_kernel(
        np.array([1, 2]), np.array([1.0, 2.0]), np.array([3.0, 4.0]),
        [("lang", "str", (flat_l, offs_l))])
    assert sc._frame_geom_codes(arr).tolist() == [1, 1]
    # (b) id-less frames: lazy read still finds the property
    f = core.Feature.from_geojson("Point", [1.0, 2.0], properties={"lang": "en"})
    a2 = pa.array([core.encode_feature(f)], type=pa.binary())
    _, kinds, strs, _, _ = sc.lazy_prop_kernel(a2, "lang")
    assert kinds.tolist() == [1] and strs == ["en"]
    # (c) zero-vertex / zero-ring features rejected loudly
    with pytest.raises(ValueError, match="zero vertices"):
        sc.encode_lines_kernel(np.array([1, 2]), np.array([0.1, 0.2]), np.array([1, 0]))
    with pytest.raises(ValueError, match="empty ring"):
        sc.encode_rings_kernel(np.array([1]), np.empty(0), np.empty(0, np.int64),
                               np.array([0]))


def test_s2_parent_exact_at_high_levels(spark):
    """integer parent arithmetic: exact where double division rounds."""
    from pyspark.sql import functions as F
    from geobuf_spark.functions import cells

    level = 27
    n = 1 << level
    rows = [(int((2 * n + 1) * n + (n - 1)),), (int((5 * n + n - 1) * n + 0),)]
    df = spark.createDataFrame(rows, "cell bigint")
    got = [r.p for r in df.select(cells.s2_parent(F.col("cell"), level).alias("p")).collect()]
    m = 1 << (level - 1)
    want = []
    for (cell,) in rows:
        j = cell & (n - 1); i = (cell >> level) & (n - 1); f = cell >> (2 * level)
        want.append((f * m + (i >> 1)) * m + (j >> 1))
    assert got == want


def test_s2_cover_antimeridian_split(spark):
    import numpy as np
    from geobuf_spark.functions import cells

    r, c = cells.s2_cover_bbox_kernel([179.9], [-0.05], [-179.9], [0.05], 12)
    pairs = list(zip(r.tolist(), c.tolist()))
    assert len(pairs) < 200 and len(pairs) == len(set(pairs))
    # seam superset via the Spark expression itself
    pts = spark.createDataFrame(
        [(179.95, 0.0), (-179.95, 0.01)], "lon double, lat double")
    from pyspark.sql import functions as F
    cells_got = {row.cell for row in
                 pts.withColumn("cell", cells.s2_cell(F.col("lon"), F.col("lat"), 12)).collect()}
    assert cells_got <= set(c.tolist())


def test_lazy_readers_long_property_keys():
    """Keys >= 128 bytes encode their length as a multi-byte varint; the
    lazy walkers must read it as a varint, not one byte (ADVICE r01)."""
    long_key = "k" * 130
    frames = []
    for fid in range(8):
        feat = core.Feature(
            geom_type=1, dim=2,
            coords=np.array([10.0 + fid, 20.0]),
            ring_lens=np.array([1], np.int64),
            part_rings=np.array([1], np.int64),
            id=fid,
            properties={long_key: fid * 11, "short": f"s{fid}"},
        )
        frames.append(core.encode_feature(feat))
    arr = pa.array(frames, type=pa.binary())

    ids, kinds, strs, ivals, fvals = sc.lazy_prop_kernel(arr, long_key)
    assert ids.tolist() == list(range(8))
    assert kinds.tolist() == [2] * 8
    assert ivals.tolist() == [fid * 11 for fid in range(8)]
    # the SECOND property (after the long-key one) must still be reachable
    _, k2, s2, _, _ = sc.lazy_prop_kernel(arr, "short")
    assert k2.tolist() == [1] * 8
    assert s2 == [f"s{fid}" for fid in range(8)]

    rows, keys = sc.frame_keys_kernel(arr)
    by_row = {}
    for r, k in zip(rows.tolist(), keys):
        by_row.setdefault(r, []).append(k)
    assert all(v == [long_key, "short"] for v in by_row.values())


def test_encode_props_rejects_nulls(spark):
    """Null prop values used to round-trip through float64 NaN into
    INT64_MIN varints (and null strings into "") — must raise instead
    (ADVICE r01: geobuf KeyValue has no null encoding)."""
    df = spark.createDataFrame(
        [(1, 10.0, 20.0, "a", 5), (2, 11.0, 21.0, None, 6),
         (3, 12.0, 22.0, "c", None)],
        "doc_id long, lon double, lat double, name string, rank long")
    with pytest.raises(Exception, match="null"):
        sc.encode_points_with_props(df, props=["name", "rank"]).collect()
    with pytest.raises(Exception, match="null"):
        sc.encode_points(
            df.withColumn("lon", F.when(F.col("doc_id") == 2, None)
                          .otherwise(F.col("lon")))).collect()
    # null-free slice still encodes fine
    clean = df.filter(F.col("doc_id") == 1)
    assert sc.encode_points_with_props(clean, props=["name", "rank"]).count() == 1


def test_fused_decode_agg_matches_materializing_path(spark):
    """decode_points_agg / decode_lines_agg (single-Arrow-pass partials)
    must equal decode + JVM aggregate exactly."""
    import numpy as np

    from geobuf_spark.sources import minted
    p = minted.minted_points(spark, "/root/testdata/sf0.001") \
        .select(F.col("doc_id"), "lon", "lat")
    enc = sc.encode_points(p)
    fused = sc.decode_points_agg(enc, parts=4).collect()[0]
    d = sc.decode_points(enc)
    full = d.agg(F.count("*"), F.sum("id"), F.sum("lon_q"), F.sum("lat_q")).collect()[0]
    assert list(fused) == list(full)

    rng = np.random.default_rng(3)
    n = 500
    nv = rng.integers(2, 12, n).astype(np.int64)
    c = rng.uniform(-170, 170, int(nv.sum()) * 2)
    arr = sc.encode_lines_kernel(np.arange(n), c, nv)
    df = spark.createDataFrame([(bytearray(arr[i].as_py()),) for i in range(n)],
                               "geobuf binary")
    fusedl = sc.decode_lines_agg(df, parts=2).collect()[0]
    dl = sc.decode_lines(df)
    fulll = dl.agg(F.count("*"), F.sum(F.size("coords_q")),
                   F.sum(F.element_at("coords_q", 1))).collect()[0]
    assert list(fusedl) == list(fulll)


def test_truncated_frames_raise_not_corrupt():
    """A frame whose geometry length overruns its boundary must raise —
    the gather would otherwise read the NEXT frame's bytes (review r2)."""
    import numpy as np

    f = core.encode_feature(core.Feature(
        geom_type=1, dim=2, coords=np.array([100.0, 50.0]),
        ring_lens=np.array([1], np.int64), part_rings=np.array([1], np.int64),
        id=5))
    # geometry payload spans bytes 6..16 in this frame — cut inside it
    # (cutting only the trailing bbox leaves geometry decodable, which is
    # correct lazy-read behavior, not corruption)
    for cut in (12, 8, 5):
        arr = pa.array([f, f[:cut]], type=pa.binary())
        with pytest.raises(ValueError, match="truncated or corrupt"):
            sc.decode_points_any_kernel(arr)
    # intact frames still decode
    ids, qx, qy = sc.decode_points_any_kernel(pa.array([f, f], type=pa.binary()))
    assert ids.tolist() == [5, 5] and qx.tolist() == [10**9] * 2
