"""Batch-19 units: Hilbert clustering key, Moran's I, collocation lift."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from geobuf_spark.functions import tiles
from geobuf_spark.operators import raster


def _xy2d_scalar(n, x, y):
    """Textbook rotate-and-accumulate Hilbert index (the published scalar
    form the vectorized kernel must reproduce)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_np_matches_scalar_and_is_a_space_filling_curve():
    z = 5
    n = 1 << z
    xs = np.repeat(np.arange(n), n)
    ys = np.tile(np.arange(n), n)
    got = tiles.hilbert_np(xs, ys, z)
    exp = np.array([_xy2d_scalar(n, int(a), int(b)) for a, b in zip(xs, ys)])
    assert (got == exp).all()
    # bijection onto [0, n²) and unit-step adjacency along the curve —
    # the locality property that makes it the better clustering key
    order = np.argsort(got)
    assert (np.sort(got) == np.arange(n * n)).all()
    step = np.abs(np.diff(xs[order])) + np.abs(np.diff(ys[order]))
    assert (step == 1).all()


def test_hilbert_sql_twin_bit_exact_full_grid():
    import duckdb
    z = 6
    n = 1 << z
    inner = (f"SELECT id, CAST(id // {n} AS BIGINT) AS x, "
             f"CAST(id % {n} AS BIGINT) AS y FROM range({n * n}) t(id)")
    q = tiles.sql_hilbert_wrap(inner, ["id", "x", "y"], z=z)
    df = duckdb.sql(q + " ORDER BY id").df()
    exp = tiles.hilbert_np(df.x.to_numpy(), df.y.to_numpy(), z)
    assert (df.hilbert.to_numpy() == exp).all()


def test_with_hilbert_key_kernel(spark):
    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 16).alias("x"),
        (F.col("id") % 13).alias("y"))
    out = tiles.with_hilbert_key(df, z=8).toPandas().sort_values("doc_id")
    exp = tiles.hilbert_np(out.x.to_numpy(), out.y.to_numpy(), 8)
    assert (out.hilbert.to_numpy() == exp).all()
    assert list(out.columns) == ["doc_id", "x", "y", "hilbert"]


def test_hilbert_locality_beats_morton_on_window_ranges():
    """A bbox window decomposes into fewer contiguous key ranges under the
    Hilbert order than the Z-order — the pruning win the key exists for."""
    z = 6
    n = 1 << z

    def n_ranges(keys):
        ks = np.sort(keys)
        return int(1 + (np.diff(ks) > 1).sum())

    hil_total = mor_total = 0
    for wx in (3, 11, 40):
        xs = np.repeat(np.arange(wx, wx + 12), 12)
        ys = np.tile(np.arange(17, 29), 12)
        hil_total += n_ranges(tiles.hilbert_np(xs, ys, z))
        # morton via the same spread ladder the engine uses
        import duckdb
        mk = duckdb.sql(
            "SELECT " + tiles.sql_morton_key("x", "y", z) + " AS m FROM ("
            "SELECT unnest($xs) AS x, unnest($ys) AS y)",
            params={"xs": [int(v) for v in xs], "ys": [int(v) for v in ys]},
        ).df().m.to_numpy()
        mor_total += n_ranges(mk)
    assert hil_total < mor_total


def test_morans_i_hand_case(spark):
    # two dense cells side by side + one far singleton: positive
    # autocorrelation, exact integers checked by hand
    rows = [(0, 0, 4), (1, 0, 4), (10, 10, 1)]
    df = spark.createDataFrame(rows, "x long, y long, n long")
    out = raster.morans_i(df).collect()[0]
    # n=3, S=9, Q=33; pairs: (0,0)<->(1,0) both directions → W=2,
    # A=32, B=16; num = 9*32 - 27*16 + 81*2 = 18; den = 9*33 - 3*81 = 54
    assert (out.n_cells, out.w_pairs) == (3, 2)
    assert (out.num_scaled, out.den_scaled) == (18, 54)
    assert out.morans_i == pytest.approx((3 / 2) * (18 / 54))


def test_morans_i_zero_variance_is_null(spark):
    rows = [(0, 0, 2), (1, 0, 2)]
    df = spark.createDataFrame(rows, "x long, y long, n long")
    out = raster.morans_i(df).collect()[0]
    assert out.den_scaled == 0 and out.morans_i is None
