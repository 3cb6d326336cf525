"""Co-occurrence self-join vs a brute O(n^2) numpy oracle."""

import math

import numpy as np
import pytest

from geomesa_spark.operators.cooccur import (
    cooccurrence_join,
    meters_to_safe_degrees,
)

R = 6371008.8


def _hav(lon1, lat1, lon2, lat2):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    a = (
        math.sin(math.radians(lat2 - lat1) / 2) ** 2
        + math.cos(rl1) * math.cos(rl2)
        * math.sin(math.radians(lon2 - lon1) / 2) ** 2
    )
    return 2 * R * math.asin(math.sqrt(a))


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    n = 600
    # clustered so real pairs exist
    lon = np.concatenate([
        rng.normal(10, 0.05, n // 3),
        rng.normal(10.2, 0.05, n // 3),
        rng.uniform(-179, 179, n - 2 * (n // 3)),
    ])
    lat = np.concatenate([
        rng.normal(45, 0.05, n // 3),
        rng.normal(45.1, 0.05, n // 3),
        rng.uniform(-85, 85, n - 2 * (n // 3)),
    ])
    ts = rng.integers(0, 5000, n)
    return [
        (i, float(lon[i]), float(lat[i]), int(ts[i])) for i in range(n)
    ]


def _brute(corpus, dist_deg, eps):
    pairs = {}
    for i, (ia, lona, lata, ta) in enumerate(corpus):
        for ib, lonb, latb, tb in corpus[i + 1:]:
            d2 = (lona - lonb) ** 2 + (lata - latb) ** 2
            if d2 <= dist_deg**2 and abs(ta - tb) <= eps:
                a, b = min(ia, ib), max(ia, ib)
                pairs[(a, b)] = abs(ta - tb)
    return pairs


def test_planar_matches_brute(spark, corpus):
    df = spark.createDataFrame(
        corpus, "id long, lon double, lat double, es long"
    ).repartition(7)
    out = cooccurrence_join(df, 0.1, 600, "id", "es").collect()
    got = {(r.id_a, r.id_b): r.dt_s for r in out}
    assert len(out) == len(got), "no duplicate pairs"
    want = _brute(corpus, 0.1, 600)
    assert got == want
    assert len(want) > 50  # the fixture really exercises pairs


def test_haversine_idl_pair(spark):
    rows = [
        (1, -179.99, 10.0, 100),
        (2, 179.99, 10.0, 150),   # ~2.2 km across the antimeridian
        (3, 0.0, 10.0, 120),
    ]
    df = spark.createDataFrame(rows, "id long, lon double, lat double, es long")
    deg = meters_to_safe_degrees(5000, max_abs_lat=60)
    out = cooccurrence_join(
        df, deg, 100, "id", "es", metric="haversine", dist_m=5000
    ).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}
    d = _hav(-179.99, 10.0, 179.99, 10.0)
    assert out[0].dist_m == pytest.approx(d, rel=1e-9)
    assert d < 5000


def test_boundary_bucket_edges(spark):
    # pair straddling a time-bucket boundary and a cell boundary
    rows = [
        (1, 9.999, 45.0, 599),
        (2, 10.001, 45.0, 601),  # adjacent buckets (eps=600), adjacent cells
    ]
    df = spark.createDataFrame(rows, "id long, lon double, lat double, es long")
    out = cooccurrence_join(df, 0.1, 600, "id", "es").collect()
    assert len(out) == 1 and out[0].dt_s == 2


def test_exact_radius_inclusive(spark):
    rows = [(1, 0.0, 0.0, 0), (2, 0.1, 0.0, 0)]
    df = spark.createDataFrame(rows, "id long, lon double, lat double, es long")
    # dist exactly 0.1 deg -> dist2 == dist_deg^2 (inclusive <=)
    out = cooccurrence_join(df, 0.1, 10, "id", "es").collect()
    assert len(out) == 1


def test_plan_no_cartesian_no_python(spark, corpus):
    df = spark.createDataFrame(
        corpus, "id long, lon double, lat double, es long"
    )
    plan = (
        cooccurrence_join(df, 0.1, 600, "id", "es")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan


def test_meters_to_safe_degrees():
    assert meters_to_safe_degrees(111195.0802340276, 0.0) == pytest.approx(1.0)
    assert meters_to_safe_degrees(1000, 85) > meters_to_safe_degrees(1000, 0)
    with pytest.raises(ValueError):
        meters_to_safe_degrees(1000, 90.0)
