"""XYZ tiles / quadkeys: Bing spec example, tri-parity, prefixes."""

import numpy as np
from pyspark.sql import functions as F

from geomesa_spark.functions.tiles import (
    quadkey_col, quadkey_np, quadkey_to_tile, tile_cols, tile_np,
)


def test_bing_spec_example():
    # Bing Maps tile-system doc: lat 40.0156, lon -105.2713 at
    # level 3 -> tile (1, 3) -> quadkey "023"
    tx, ty = tile_np(np.array([-105.2713]), np.array([40.0156]), 3)
    assert (tx[0], ty[0]) == (1, 3)
    assert quadkey_np(tx, ty, 3) == ["023"]
    assert quadkey_to_tile("023") == (3, 1, 3)


def test_tile_tri_parity(spark):
    rng = np.random.default_rng(12)
    lon = rng.uniform(-180, 180, 3000)
    lat = rng.uniform(-88, 88, 3000)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)],
        "lon double, lat double",
    )
    Z = 9
    cx, cy = tile_cols("lon", "lat", Z)
    rows = df.select(
        cx.alias("tx"), cy.alias("ty"),
    ).withColumn("qk", quadkey_col(F.col("tx"), F.col("ty"), Z)).collect()
    nx, ny = tile_np(lon, lat, Z)
    nq = quadkey_np(nx, ny, Z)
    for r, a, b, q in zip(rows, nx, ny, nq):
        assert (r.tx, r.ty, r.qk) == (a, b, q)


def test_quadkey_prefix_is_ancestor():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-85, 85, 500)
    x9, y9 = tile_np(lon, lat, 9)
    x5, y5 = tile_np(lon, lat, 5)
    q9 = quadkey_np(x9, y9, 9)
    q5 = quadkey_np(x5, y5, 5)
    for a, b in zip(q9, q5):
        assert a.startswith(b)
    # and the parent tile is the child >> (9-5)
    assert np.array_equal(x5, x9 >> 4) and np.array_equal(y5, y9 >> 4)


def test_mercator_clamp_poles():
    tx, ty = tile_np(np.array([0.0, 0.0]), np.array([89.9, -89.9]), 4)
    assert ty[0] == 0 and ty[1] == 15  # clamped into the valid band


def test_quadkey_root_level(spark):
    # z=0: the root tile's quadkey is the empty string (matches
    # quadkey_np), not a concat() error
    from geomesa_spark.functions.tiles import quadkey_col, quadkey_np

    df = spark.range(1).select(
        quadkey_col(F.lit(0).cast("long"), F.lit(0).cast("long"), 0)
        .alias("qk")
    )
    assert df.collect()[0].qk == ""
    assert quadkey_np([0], [0], 0) == [""]
