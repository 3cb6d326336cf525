"""Golden tests for Z2/Z3 cell encoding.

Modeled on the reference's curve unit tests
(geomesa-z3/src/test/scala/org/locationtech/geomesa/curve/Z3Test.scala:20-80):
golden bit patterns for split/combine, apply/unapply round trips at
min/max, and seeded randomized round-trip checks.
"""

import numpy as np
import pytest

from geomesa_spark.functions import cells as C


def test_z3_golden_bit_patterns():
    # Z3(x,y,t).z = split(x) | split(y)<<1 | split(t)<<2 (Z3.scala:83-88)
    assert C.z3_encode_np(np.array([1]), np.array([0]), np.array([0]))[0] == 1
    assert C.z3_encode_np(np.array([0]), np.array([1]), np.array([0]))[0] == 2
    assert C.z3_encode_np(np.array([0]), np.array([0]), np.array([1]))[0] == 4
    assert C.z3_encode_np(np.array([1]), np.array([1]), np.array([1]))[0] == 7
    # max values round-trip
    mx = (1 << C.XY_BITS) - 1
    mt = (1 << C.T_BITS) - 1
    z = C.z3_encode_np(np.array([mx]), np.array([mx]), np.array([mt]))
    x, y, t = C.z3_decode_np(z)
    assert (x[0], y[0], t[0]) == (mx, mx, mt)


def test_z2_golden_bit_patterns():
    assert C.z2_encode_np(np.array([1]), np.array([0]))[0] == 1
    assert C.z2_encode_np(np.array([0]), np.array([1]))[0] == 2
    assert C.z2_encode_np(np.array([3]), np.array([3]))[0] == 15
    assert C.z2_encode_np(np.array([0b101]), np.array([0b011]))[0] == 0b011011


def test_round_trip_random():
    rng = np.random.default_rng(42)
    x = rng.integers(0, 1 << C.XY_BITS, 10000)
    y = rng.integers(0, 1 << C.XY_BITS, 10000)
    t = rng.integers(0, 1 << C.T_BITS, 10000)
    zx, zy = C.z2_decode_np(C.z2_encode_np(x, y))
    assert (zx == x).all() and (zy == y).all()
    ax, ay, at = C.z3_decode_np(C.z3_encode_np(x, y, t))
    assert (ax == x).all() and (ay == y).all() and (at == t).all()


def test_z_order_locality():
    # nearby grid coords share high bits: parent-prefix property
    a = C.z2_encode_np(np.array([100]), np.array([200]))[0]
    b = C.z2_encode_np(np.array([101]), np.array([200]))[0]
    assert a >> 4 == b >> 4 or a >> 2 == b >> 2 or abs(a - b) < 16


def test_normalization_bounds():
    assert C.lon_to_x_np(np.array([-180.0]))[0] == 0
    assert C.lon_to_x_np(np.array([180.0]))[0] == (1 << C.XY_BITS) - 1
    assert C.lat_to_y_np(np.array([-90.0]))[0] == 0
    assert C.lat_to_y_np(np.array([90.0]))[0] == (1 << C.XY_BITS) - 1
    # 0.0 maps to exactly the midpoint cell
    assert C.lon_to_x_np(np.array([0.0]))[0] == 1 << (C.XY_BITS - 1)


def test_week_seconds():
    # 2010-05-07T00:00:00Z = 1273190400 epoch; week = 2105
    es = 1273190400
    assert es // C.SECONDS_IN_WEEK == 2105
    assert es % C.SECONDS_IN_WEEK == 86400  # one day into epoch week 2105


def test_spark_numpy_parity(spark):
    """Spark column encode must equal the numpy twin bit-for-bit."""
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    n = 2000
    pdf = pd.DataFrame(
        {
            "lon": rng.uniform(-180, 180, n),
            "lat": rng.uniform(-90, 90, n),
            "es": rng.integers(1273190400, 1278190400, n),
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        df.select(
            "lon",
            "lat",
            "es",
            C.z2_cell(F.col("lon"), F.col("lat")).alias("z2"),
            C.z3_combine(
                C.lon_to_x(F.col("lon")),
                C.lat_to_y(F.col("lat")),
                C.time_to_t((F.col("es") % C.SECONDS_IN_WEEK).cast("long")),
            ).alias("z3"),
        )
        .toPandas()
        .sort_index()
    )
    exp_z2 = C.z2_encode_np(C.lon_to_x_np(out.lon.values), C.lat_to_y_np(out.lat.values))
    exp_z3 = C.z3_encode_np(
        C.lon_to_x_np(out.lon.values),
        C.lat_to_y_np(out.lat.values),
        C.time_to_t_np(out.es.values % C.SECONDS_IN_WEEK),
    )
    assert (out.z2.values == exp_z2).all()
    assert (out.z3.values == exp_z3).all()
