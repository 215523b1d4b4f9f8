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
