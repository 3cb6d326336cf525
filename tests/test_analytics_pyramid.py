"""tile_pyramid: numpy oracle parity, mergeability, plan shape."""

import numpy as np
from pyspark.sql import functions as F

from geomesa_spark.functions import cells as C
from geomesa_spark.operators.analytics import tile_pyramid


def _cell(lon, lat, bits):
    n = 1 << C.XY_BITS
    x = np.clip(np.floor((np.asarray(lon) + 180.0) / 360.0 * n), 0, n - 1)
    y = np.clip(np.floor((np.asarray(lat) + 90.0) / 180.0 * n), 0, n - 1)
    from geomesa_spark.functions.cells import _spread2_np

    z = (_spread2_np(x.astype(np.int64))
         | (_spread2_np(y.astype(np.int64)) << np.uint64(1))).astype(np.int64)
    return z >> (2 * (C.XY_BITS - bits))


def test_tile_pyramid_oracle(spark):
    rng = np.random.default_rng(2)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    wv = rng.integers(1, 100, 2000)
    df = spark.createDataFrame(
        [(float(a), float(b), int(c)) for a, b, c in zip(lon, lat, wv)],
        "lon double, lat double, v long",
    )
    got = {
        (r.bits, r.cell): (r.n, r.w)
        for r in tile_pyramid(df, max_bits=6, min_bits=2,
                              weight_col="v").collect()
    }
    exp = {}
    for b in range(2, 7):
        cells = _cell(lon, lat, b)
        for c, v in zip(cells, wv):
            k = (b, int(c))
            n0, w0 = exp.get(k, (0, 0))
            exp[k] = (n0 + 1, w0 + int(v))
    assert got == exp
    # every level's totals are the corpus totals
    for b in range(2, 7):
        assert sum(n for (bb, _), (n, _) in got.items() if bb == b) == 2000
    # level 2 really is the sum of its level-3 children
    for (b, c), (n, w) in got.items():
        if b == 3:
            pn, pw = got[(2, c >> 2)]
            assert pn >= n and pw >= w


def test_tile_pyramid_mergeable(spark):
    df = spark.createDataFrame(
        [(10.0, 10.0), (10.0, 10.0), (-50.0, 30.0)], "lon double, lat double"
    )
    a = tile_pyramid(df.limit(2), max_bits=4)
    b_ = tile_pyramid(
        df.subtract(df.limit(2)) if False else
        spark.createDataFrame([(-50.0, 30.0)], "lon double, lat double"),
        max_bits=4,
    )
    merged = {
        (r.bits, r.cell): r.n
        for r in a.unionByName(b_).groupBy("bits", "cell")
        .agg(F.sum("n").alias("n")).collect()
    }
    full = {(r.bits, r.cell): r.n
            for r in tile_pyramid(df, max_bits=4).collect()}
    assert merged == full


def test_tile_pyramid_plan(spark):
    df = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double")
    plan = tile_pyramid(df, max_bits=4)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Python" not in plan
    # two aggregation exchanges, both partial-aggregated
    assert plan.count("Exchange hashpartitioning") == 2
