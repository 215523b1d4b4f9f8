"""JVM decode path (codec/jvm/GbCodec.java) — exact parity vs the Arrow
kernels it twins. The jar is committed, so these run everywhere; if the
jar were deleted AND no JDK existed, register() returns False and the
suite skips rather than fails (the JVM path is an optional accelerator,
the Arrow kernels are the portable contract).
"""
import numpy as np
import pyarrow as pa
import pytest

from geobuf_spark.codec import jvm_codec, spark_codec


@pytest.fixture(scope="module")
def jvm(spark):
    if not jvm_codec.register(spark):
        pytest.skip("no gb-codec.jar and no JDK to build it")
    return spark


def _frames_df(spark, frames):
    return spark.createDataFrame(
        pa.table({"geobuf": frames}).to_pandas())


def test_register_idempotent(jvm):
    assert jvm_codec.register(jvm) is True
    assert jvm_codec.register(jvm) is True


def test_point_agg_parity(jvm):
    rng = np.random.default_rng(11)
    n = 5000
    ids = rng.integers(0, 2**40, n).astype(np.int64)
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    df = _frames_df(jvm, spark_codec.encode_points_kernel(ids, lon, lat))
    a = spark_codec.decode_points_agg(df).collect()[0]
    j = jvm_codec.decode_points_agg_jvm(df).collect()[0]
    assert a == j


def test_point_decode_parity(jvm):
    rng = np.random.default_rng(12)
    n = 300
    ids = np.arange(n, dtype=np.int64)
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    df = _frames_df(jvm, spark_codec.encode_points_kernel(ids, lon, lat))
    a = {r["id"]: (r["lon_q"], r["lat_q"])
         for r in spark_codec.decode_points_any(df).collect()}
    b = {r["id"]: (r["lon_q"], r["lat_q"])
         for r in jvm_codec.decode_points_jvm(df).collect()}
    assert a == b


@pytest.mark.parametrize("dim", [2, 3, 5])
def test_line_decode_parity(jvm, dim):
    rng = np.random.default_rng(20 + dim)
    n, nv = 200, 7
    ids = np.arange(n, dtype=np.int64) * 3 + 1
    flat = rng.uniform(-170, 170, n * nv * dim)
    nvs = np.full(n, nv, dtype=np.int64)
    df = _frames_df(
        jvm, spark_codec.encode_lines_kernel(ids, flat, nvs, dim=dim))
    a = {r["line_id"]: list(r["coords_q"])
         for r in spark_codec.decode_lines(df).collect()}
    b = {r["line_id"]: list(r["coords_q"])
         for r in jvm_codec.decode_lines_jvm(df).collect()}
    assert a == b


def test_line_agg_parity(jvm):
    rng = np.random.default_rng(31)
    n, nv = 2000, 12
    ids = rng.permutation(n).astype(np.int64)
    flat = rng.uniform(-179, 179, n * nv * 2)
    nvs = np.full(n, nv, dtype=np.int64)
    df = _frames_df(
        jvm, spark_codec.encode_lines_kernel(ids, flat, nvs, dim=2))
    a = spark_codec.decode_lines_agg(df).collect()[0]
    j = jvm_codec.decode_lines_agg_jvm(df).collect()[0]
    assert a == j


def test_corrupt_frame_raises(jvm):
    # truncated payload (mid-varint) must fail the task on the JVM path
    # exactly as the Arrow path does
    ids = np.array([1], dtype=np.int64)
    frames = spark_codec.encode_points_kernel(
        ids, np.array([10.0]), np.array([20.0]))
    buf = bytes(frames[0].as_py())[:-1]  # drop the final varint byte
    df = _frames_df(jvm, pa.array([buf], type=pa.binary()))
    with pytest.raises(Exception):
        jvm_codec.decode_points_agg_jvm(df).collect()
    with pytest.raises(Exception):
        spark_codec.decode_points_agg(df).collect()


def test_point_encode_byte_parity(jvm):
    """gb_point_enc frames are byte-identical to the Arrow kernel's,
    including negative coords, the 1e-7 lattice, and large ids."""
    rng = np.random.default_rng(21)
    n = 4000
    ids = np.concatenate([np.arange(n - 4, dtype=np.int64),
                          np.array([0, 1, 2**40, 2**62], dtype=np.int64)])
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    df = jvm.createDataFrame(
        pa.table({"doc_id": ids, "lon": lon, "lat": lat}).to_pandas())
    a = spark_codec.encode_points(df).orderBy("doc_id").collect()
    b = jvm_codec.encode_points_jvm(df).orderBy("doc_id").collect()
    assert [bytes(r.geobuf) for r in a] == [bytes(r.geobuf) for r in b]


def _poly_fixture(rng, n):
    """Random multi-ring polygons: (rows, ids, flat, ring_nv, rings_per_feat)."""
    rows, flat, ring_nv, rpf = [], [], [], []
    for i in range(n):
        r = int(rng.integers(1, 4))
        nvs = [int(rng.integers(3, 12)) for _ in range(r)]
        c = rng.uniform(-180, 180, sum(nvs) * 2)
        rows.append((i * 7 + 1, c.tolist(), nvs))
        flat.append(c)
        ring_nv.extend(nvs)
        rpf.append(r)
    return (rows, np.array([r[0] for r in rows], dtype=np.int64),
            np.concatenate(flat), np.array(ring_nv, dtype=np.int64),
            np.array(rpf, dtype=np.int64))


def test_poly_encode_byte_parity(jvm):
    """gb_poly_enc frames are byte-identical to encode_rings_kernel
    (Polygon, dim 2), across ring counts 1-3 and negative coords."""
    import pandas as pd
    rng = np.random.default_rng(41)
    rows, ids, flat, ring_nv, rpf = _poly_fixture(rng, 400)
    df = jvm.createDataFrame(
        pd.DataFrame(rows, columns=["poly_id", "coords", "ring_lens"]))
    a = spark_codec.encode_polygons(df).orderBy("poly_id").collect()
    b = jvm_codec.encode_polygons_jvm(df).orderBy("poly_id").collect()
    assert [bytes(r.geobuf) for r in a] == [bytes(r.geobuf) for r in b]


def test_poly_decode_parity(jvm):
    """gb_poly_dec matches decode_rings_kernel: same ring_lens, same
    absolute quantized coords with per-ring delta reset."""
    rng = np.random.default_rng(42)
    _, ids, flat, ring_nv, rpf = _poly_fixture(rng, 300)
    df = _frames_df(
        jvm, spark_codec.encode_rings_kernel(ids, flat, ring_nv, rpf))
    a = {r["poly_id"]: (list(r["coords_q"]), list(r["ring_lens"]))
         for r in spark_codec.decode_polygons(df).collect()}
    b = {r["poly_id"]: (list(r["coords_q"]), list(r["ring_lens"]))
         for r in jvm_codec.decode_polygons_jvm(df).collect()}
    assert a == b


def test_poly_agg_and_corrupt(jvm):
    rng = np.random.default_rng(43)
    _, ids, flat, ring_nv, rpf = _poly_fixture(rng, 500)
    frames = spark_codec.encode_rings_kernel(ids, flat, ring_nv, rpf)
    df = _frames_df(jvm, frames)
    row = jvm_codec.decode_polygons_agg_jvm(df).collect()[0]
    assert row["n"] == 500
    assert row["sum_id"] == int(ids.sum())
    assert row["sum_rings"] == int(rpf.sum())
    assert row["sum_coord_tokens"] == int(ring_nv.sum()) * 2
    # a ring count token overrunning the payload must fail the task. Use
    # lattice-small coords (quantized deltas are single-byte varints, so
    # glen < 128 and every byte offset is fixed): frame = 0x08 id | 0x18 3
    # | 0x22 glen | count deltas... — corrupt the count token at gi+2.
    tiny = spark_codec.encode_rings_kernel(
        np.array([5], dtype=np.int64),
        np.array([1e-7, 2e-7, 3e-7, 1e-7, 2e-7, 4e-7]),
        np.array([3], dtype=np.int64), np.array([1], dtype=np.int64))
    buf = bytearray(bytes(tiny[0].as_py()))
    gi = buf.index(0x22)
    assert buf[gi + 1] < 0x80 and buf[gi + 2] == 6  # glen 1 byte; count 3*2
    buf[gi + 2] = 0x7E  # claims 126 tokens; payload has 6
    dfc = _frames_df(jvm, pa.array([bytes(buf)], type=pa.binary()))
    with pytest.raises(Exception):
        jvm_codec.decode_polygons_jvm(dfc).collect()


def test_line_encode_byte_parity_and_roundtrip(jvm):
    """gb_line_enc frames are byte-identical to encode_lines_kernel, and
    the JVM decode of the JVM encode recovers the quantized vertices."""
    import pandas as pd
    rng = np.random.default_rng(22)
    n = 500
    rows = []
    for i in range(n):
        nv = int(rng.integers(2, 60))
        c = rng.uniform(-180, 180, nv * 2)
        rows.append((i, c.tolist()))
    df = jvm.createDataFrame(pd.DataFrame(rows, columns=["line_id", "coords"]))
    a = spark_codec.encode_lines(df).orderBy("line_id").collect()
    b = jvm_codec.encode_lines_jvm(df).orderBy("line_id").collect()
    assert [bytes(r.geobuf) for r in a] == [bytes(r.geobuf) for r in b]
    enc = jvm_codec.encode_lines_jvm(df)
    dec = {r.line_id: list(r.coords_q)
           for r in jvm_codec.decode_lines_jvm(enc).collect()}
    from geobuf_spark.codec import core
    for i, c in rows:
        assert dec[i] == core.quantize_vec(np.array(c)).tolist()


def test_frames_split_parity(jvm, tmp_path):
    """gb_frames (JVM stream splitter) vs core.read_frames byte-parity on
    a framed multi-feature stream, and the full many-files read plan
    (read_geobuf_files_jvm) vs the python mapInArrow reader."""
    from pyspark.sql import functions as F

    from geobuf_spark.codec import core

    ids = np.arange(50, dtype=np.int64)
    enc = spark_codec.encode_points_kernel(
        ids, ids * 0.001, ids * -0.002)
    frames = [bytes(enc[i].as_py()) for i in range(len(ids))]
    stream = core.write_frames(frames)

    # splitter parity on one stream
    got = (jvm.createDataFrame([(stream,)], "content binary")
           .select(F.posexplode(F.expr("gb_frames(content)")))
           .orderBy("pos").collect())
    assert [bytes(r[1]) for r in got] == frames
    assert [bytes(f) for f in core.read_frames(stream)] == frames

    # many-files plan parity vs the python reader
    d = tmp_path / "many"
    d.mkdir()
    for i in range(4):
        part = frames[i * 12:(i + 1) * 12]
        (d / f"part-{i}.geobuf").write_bytes(core.write_frames(part))
    jdf = jvm_codec.read_geobuf_files_jvm(jvm, str(d))
    from geobuf_spark.sources import geobuf_file
    pdf = geobuf_file.read_geobuf(jvm, str(d))
    jb = sorted(bytes(r["geobuf"]) for r in jdf.collect())
    pb = sorted(bytes(r["geobuf"]) for r in pdf.collect())
    assert jb == pb == sorted(frames[:48])

    # truncated stream fails loudly
    with pytest.raises(Exception):
        (jvm.createDataFrame([(stream[:-1],)], "content binary")
         .select(F.explode(F.expr("gb_frames(content)"))).collect())


def test_roundtrip_points_jvm_parity(jvm):
    """gb_point(gb_point_enc(...)) codegen round-trip returns the same
    quantized lattice values as the Arrow-kernel round-trip."""
    from geobuf_spark.codec import jvm_codec as jc
    from geobuf_spark.sources import pages

    p = (pages.with_minted_geometry(pages.pages(jvm, 500))
         .select("page_id", "lon", "lat"))
    a = sorted(tuple(r) for r in
               spark_codec.roundtrip_points(p, id_col="page_id").collect())
    b = sorted(tuple(r) for r in
               jc.roundtrip_points_jvm(p, id_col="page_id").collect())
    assert a == b


def test_point_enc_tie_lattice_parity(jvm):
    """Cross-engine encode parity under adversarial inputs: uniform
    floats mixed with exact half-ulp tie candidates on the 1e-7 lattice
    (the rounding boundary where two implementations of go_round7 would
    first diverge). 6k frames, byte-for-byte."""
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    n = 6000
    ids = rng.integers(0, 1 << 40, n)
    lon = np.concatenate([
        rng.uniform(-180, 180, n // 2),
        (rng.integers(-1_800_000_000, 1_800_000_000, n // 4) + 0.5) / 1e7,
        rng.integers(-1_800_000_000, 1_800_000_000, n - n // 2 - n // 4) / 1e7,
    ])
    lat = np.concatenate([
        rng.uniform(-90, 90, n // 2),
        (rng.integers(-900_000_000, 900_000_000, n // 4) + 0.5) / 1e7,
        rng.integers(-900_000_000, 900_000_000, n - n // 2 - n // 4) / 1e7,
    ])
    py = [bytes(f.as_py()) for f in spark_codec.encode_points_kernel(
        ids.astype(np.int64), lon, lat)]
    df = jvm.createDataFrame(pd.DataFrame(
        {"id": ids.astype("int64"), "lon": lon, "lat": lat}))
    jv = [bytes(r[0]) for r in
          df.select(F.expr("gb_point_enc(id, lon, lat)")).collect()]
    assert py == jv


def test_line_poly_enc_random_parity(jvm):
    """Random lines and two-ring polygons: python batch kernels vs JVM
    encoders, byte-for-byte (hypothesis-free fixed seeds — each case is
    one Spark job, so a handful of seeded draws beats per-example jobs)."""
    import pandas as pd
    from pyspark.sql import functions as F

    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        n = 300
        ids = np.arange(n, dtype=np.int64)
        nv = rng.integers(2, 30, n)
        flat = []
        for k in nv:
            flat.append(np.round(rng.uniform(-180, 180, int(k) * 2), 7))
        coords = [c.tolist() for c in flat]
        py = [bytes(f.as_py()) for f in spark_codec.encode_lines_kernel(
            ids, np.concatenate(flat), nv.astype(np.int64), dim=2)]
        df = jvm.createDataFrame(pd.DataFrame(
            {"id": ids, "coords": coords}))
        jv = [bytes(r[0]) for r in
              df.select(F.expr("gb_line_enc(id, coords)")).collect()]
        assert py == jv, f"line mismatch seed {seed}"

        # two-ring polygons over the same draws
        nv2 = rng.integers(2, 8, n)
        flat2 = [np.round(rng.uniform(-85, 85, int(k) * 2), 7) for k in nv2]
        ring_flat = [np.concatenate([a, b]) for a, b in zip(flat, flat2)]
        ring_nv = np.stack([nv, nv2], axis=1).astype(np.int64)
        pyp = [bytes(f.as_py()) for f in spark_codec.encode_rings_kernel(
            ids, np.concatenate(ring_flat), ring_nv.reshape(-1),
            np.full(n, 2, dtype=np.int64))]
        dfp = jvm.createDataFrame(pd.DataFrame({
            "id": ids, "coords": [c.tolist() for c in ring_flat],
            "ring_nv": [[int(a), int(b)] for a, b in zip(nv, nv2)]}))
        jvp = [bytes(r[0]) for r in
               dfp.select(F.expr("gb_poly_enc(id, coords, ring_nv)")).collect()]
        assert pyp == jvp, f"poly mismatch seed {seed}"
