"""Base-32 geohash: encode/decode/bounds/cover/neighbors.

Reference parity targets: geomesa-utils geohash/GeoHash.scala
(encode + base-32 render + bbox decode, GeoHashTest.scala's known
values), RectangleGeoHashIterator.scala (rectangle cover),
TouchingGeoHashes.scala (neighbors)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.functions import geohash as GH

RNG = np.random.default_rng(20260818)


def _rand_pts(n):
    lon = RNG.uniform(-180.0, 180.0, n)
    lat = RNG.uniform(-90.0, 90.0, n)
    return lon, lat


# --- numpy twins ---------------------------------------------------------


def test_known_values():
    # published spec examples (also GeoHashTest.scala:31-45 style)
    assert GH.geohash_encode_np(np.array([-5.603]), np.array([42.605]), 5)[0] == "ezs42"
    assert (
        GH.geohash_encode_np(np.array([10.40744]), np.array([57.64911]), 11)[0]
        == "u4pruydqqvj"
    )
    # prefix property: coarser hash is a prefix of the finer one
    for n in range(1, 11):
        assert (
            GH.geohash_encode_np(np.array([10.40744]), np.array([57.64911]), n)[0]
            == "u4pruydqqvj"[:n]
        )


def test_roundtrip_bounds_contain_point():
    lon, lat = _rand_pts(5000)
    for n in (1, 4, 7, 12):
        gh = GH.geohash_encode_np(lon, lat, n)
        b = GH.geohash_bounds_np(gh, n)
        assert (b[:, 0] <= lon).all() and (lon <= b[:, 1]).all()
        assert (b[:, 2] <= lat).all() and (lat <= b[:, 3]).all()
        # cell widths are the dyadic split
        total = 5 * n
        assert np.allclose(b[:, 1] - b[:, 0], 360.0 / (1 << ((total + 1) // 2)))
        assert np.allclose(b[:, 3] - b[:, 2], 180.0 / (1 << (total // 2)))


def test_decode_rejects_bad_chars():
    with pytest.raises(ValueError):
        GH.geohash_decode_np(np.array(["ezs4a"]), 5)  # 'a' not in alphabet


def test_neighbors_known():
    assert set(GH.geohash_neighbors_np("ezs42", 5)) == {
        "ezs48", "ezs49", "ezs43", "ezs41", "ezs40", "ezefp", "ezefr", "ezefx",
    }
    # dateline wrap: west neighbor of the westmost cell is the eastmost
    west = GH.geohash_encode_np(np.array([-179.9]), np.array([0.1]), 4)[0]
    ns = GH.geohash_neighbors_np(west, 4)
    bounds = GH.geohash_bounds_np(np.array(ns), 4)
    assert (bounds[:, 1] > 179.0).any()
    # pole: top row has only 5 neighbors (no row above)
    top = GH.geohash_encode_np(np.array([0.1]), np.array([89.99]), 4)[0]
    assert len(GH.geohash_neighbors_np(top, 4)) == 5


# --- Spark columns mirror the twins --------------------------------------


def test_spark_encode_decode_parity(spark):
    lon, lat = _rand_pts(2000)
    df = spark.createDataFrame(
        list(zip(lon.tolist(), lat.tolist())), "lon double, lat double"
    )
    for n in (5, 9, 12):
        got = (
            df.select(GH.geohash_col(F.col("lon"), F.col("lat"), n).alias("gh"))
            .toPandas()["gh"]
            .values
        )
        assert (got == GH.geohash_encode_np(lon, lat, n)).all()
        ix, iy = GH.geohash_decode_xy(F.col("gh"), n)
        dec = (
            df.select(GH.geohash_col(F.col("lon"), F.col("lat"), n).alias("gh"))
            .select("gh", ix.alias("ix"), iy.alias("iy"),
                    GH.geohash_bounds(F.col("gh"), n).alias("b"))
            .toPandas()
        )
        eix, eiy = GH.geohash_decode_np(dec["gh"].values, n)
        assert (dec["ix"].values == eix).all() and (dec["iy"].values == eiy).all()
        eb = GH.geohash_bounds_np(dec["gh"].values, n)
        gb = np.array(
            [[r["lon_min"], r["lon_max"], r["lat_min"], r["lat_max"]]
             for r in dec["b"]]
        )
        assert (gb == eb).all()  # bit-exact: same dyadic arithmetic


def test_spark_decode_invalid_is_null(spark):
    df = spark.createDataFrame([("ezs42",), ("ezs4a",), ("zz",)], "gh string")
    z = df.select(GH.geohash_decode_z(F.col("gh"), 5).alias("z")).toPandas()["z"]
    assert z.notna().tolist() == [True, False, False]


def test_no_python_in_encode_plan(spark):
    df = spark.range(100).select(
        (F.col("id") % 360 - 180.0).cast("double").alias("lon"),
        (F.col("id") % 180 - 90.0).cast("double").alias("lat"),
    )
    plan = df.select(
        GH.geohash_col(F.col("lon"), F.col("lat"), 9).alias("gh")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


# --- rectangle cover ------------------------------------------------------


def test_cover_matches_bruteforce(spark):
    box = (-10.4, 40.3, 1.7, 48.9)
    n = 4  # 20 bits: 1024 x 1024 grid
    got = sorted(
        GH.geohash_cover_df(spark, box, n).toPandas()["geohash"].tolist()
    )
    # brute force: every grid cell whose bbox intersects the closed box
    nx, ny = 1 << 10, 1 << 10
    ix = np.arange(nx)
    lon_min, lon_max = ix * 360.0 / nx - 180.0, (ix + 1) * 360.0 / nx - 180.0
    keep_x = ix[(lon_max >= box[0]) & (lon_min <= box[2])]
    iy = np.arange(ny)
    lat_min, lat_max = iy * 180.0 / ny - 90.0, (iy + 1) * 180.0 / ny - 90.0
    keep_y = iy[(lat_max >= box[1]) & (lat_min <= box[3])]
    gx, gy = np.meshgrid(keep_x, keep_y)
    lon_c = (gx.ravel() + 0.5) * 360.0 / nx - 180.0
    lat_c = (gy.ravel() + 0.5) * 180.0 / ny - 90.0
    exp = sorted(GH.geohash_encode_np(lon_c, lat_c, n).tolist())
    assert got == exp


def test_cover_edge_on_boundary(spark):
    # right/top edges exactly on a cell boundary include the touching
    # cell (closed-box semantics): 0.0 is a boundary at every precision
    got = GH.geohash_cover_df(spark, (-0.1, -0.1, 0.0, 0.0), 2).toPandas()
    b = GH.geohash_bounds_np(got["geohash"].values, 2)
    assert ((b[:, 0] == 0.0) & (b[:, 2] == 0.0)).any()  # NE touching cell

    with pytest.raises(ValueError):
        GH.geohash_cover_df(spark, (10.0, 0.0, -10.0, 1.0), 3)


def test_cover_tall_box_chunked(spark):
    """A lat run longer than _COVER_CHUNK is exploded in bounded
    chunks; the row set is identical to the unchunked formula."""
    n = 9  # lat 22 bits: ~4.3e-5 deg cells
    box = (0.0, 10.0, 1e-9, 10.7)  # 1-2 columns, ~16k rows tall
    got = GH.geohash_cover_df(spark, box, n)
    cnt = got.count()
    ny = 1 << 22
    iy0 = int((10.0 + 90.0) / 180.0 * ny)
    iy1 = int((10.7 + 90.0) / 180.0 * ny)
    nx = 1 << 23
    ix0 = int((0.0 + 180.0) / 360.0 * nx)
    ix1 = int((1e-9 + 180.0) / 360.0 * nx)
    assert cnt == (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
    assert cnt > 4096  # actually exercises >1 chunk
    assert got.distinct().count() == cnt  # no chunk-seam duplicates


def test_bad_precision():
    with pytest.raises(ValueError):
        GH.geohash_encode_np(np.array([0.0]), np.array([0.0]), 13)
    with pytest.raises(ValueError):
        GH.geohash_encode_np(np.array([0.0]), np.array([0.0]), 0)
