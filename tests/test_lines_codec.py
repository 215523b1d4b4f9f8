"""Vectorized LineString batch codec: byte parity with the per-feature
reference-semantics encoder, exact round trips, DataFrame wrappers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geobuf_spark.codec import core
from geobuf_spark.codec import spark_codec as sc


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(7)
    n = 500
    nv = rng.integers(2, 50, n).astype(np.int64)
    coords = rng.integers(-1_700_000_000, 1_700_000_000, int(nv.sum()) * 2) / 1e7
    ids = rng.integers(0, 2**40, n)
    return ids, coords, nv


def test_lines_kernel_byte_parity(batch):
    ids, coords, nv = batch
    arr = sc.encode_lines_kernel(ids, coords, nv)
    starts = np.concatenate(([0], np.cumsum(nv)[:-1]))
    for i in range(len(ids)):
        span = coords[2 * starts[i] : 2 * (starts[i] + nv[i])]
        cf = core.Feature.from_geojson("LineString", span.reshape(-1, 2).tolist(), id=int(ids[i]))
        assert core.encode_feature(cf) == arr[i].as_py(), i


def test_lines_kernel_roundtrip(batch):
    ids, coords, nv = batch
    arr = sc.encode_lines_kernel(ids, coords, nv)
    dids, dcoords, dnv = sc.decode_lines_kernel(arr)
    assert np.array_equal(dids, ids)
    assert np.array_equal(dnv, nv)
    assert np.array_equal(dcoords, core.quantize_vec(coords))


def test_lines_dataframe_roundtrip(spark):
    from bench import synth_lines

    lines = synth_lines(spark, 2000).cache()
    enc = sc.encode_lines(lines)
    dec = sc.decode_lines(enc)
    got = {r.line_id: list(r.coords_q) for r in dec.collect()}
    want = {
        r.line_id: list(core.quantize_vec(np.asarray(r.coords)))
        for r in lines.collect()
    }
    assert got == want


@pytest.fixture(scope="module")
def batch3d():
    rng = np.random.default_rng(11)
    n = 300
    nv = rng.integers(2, 40, n).astype(np.int64)
    coords = rng.integers(-1_700_000_000, 1_700_000_000, int(nv.sum()) * 3) / 1e7
    ids = rng.integers(0, 2**40, n)
    return ids, coords, nv


def test_lines_kernel_dim3_byte_parity(batch3d):
    # geom code embeds dim per makegeomcode (geom.go:59-76): 2<<4|3 = 0x23
    ids, coords, nv = batch3d
    arr = sc.encode_lines_kernel(ids, coords, nv, dim=3)
    starts = np.concatenate(([0], np.cumsum(nv)[:-1]))
    for i in range(0, len(ids), 7):
        span = coords[3 * starts[i] : 3 * (starts[i] + nv[i])]
        cf = core.Feature.from_geojson("LineString", span.reshape(-1, 3).tolist(), id=int(ids[i]))
        assert cf.dim == 3
        assert core.encode_feature(cf) == arr[i].as_py(), i


def test_lines_kernel_dim3_roundtrip(batch3d):
    ids, coords, nv = batch3d
    arr = sc.encode_lines_kernel(ids, coords, nv, dim=3)
    dids, dcoords, dnv = sc.decode_lines_kernel(arr)
    assert np.array_equal(dids, ids)
    assert np.array_equal(dnv, nv)
    assert np.array_equal(dcoords, core.quantize_vec(coords))
    # and the per-feature reference-semantics decoder agrees on dim
    f0 = core.decode_feature(arr[0].as_py(), quantized=True)
    assert f0.dim == 3 and f0.geom_type == 2


def test_lines_dataframe_dim3_roundtrip(spark):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(200):
        nv = int(rng.integers(2, 20))
        c = (rng.integers(-1_000_000_000, 1_000_000_000, nv * 3) / 1e7).tolist()
        rows.append((i, c))
    df = spark.createDataFrame(rows, "line_id bigint, coords array<double>")
    dec = sc.decode_lines(sc.encode_lines(df, dim=3))
    got = {r.line_id: list(r.coords_q) for r in dec.collect()}
    want = {i: list(core.quantize_vec(np.asarray(c))) for i, c in rows}
    assert got == want
