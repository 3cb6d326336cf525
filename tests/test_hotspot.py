"""Gi* hotspot cells vs a brute numpy oracle."""

import math

import numpy as np
import pytest

from geomesa_spark.operators.hotspot import hotspot_cells, gi_star_expr


def _oracle(lons, lats, bits, ring, weights=None):
    n = 1 << bits
    xs = np.clip(np.floor((lons + 180.0) / 360.0 * float(n)), 0, n - 1).astype(int)
    ys = np.clip(np.floor((lats + 90.0) / 180.0 * float(n)), 0, n - 1).astype(int)
    w = np.ones(len(lons), dtype=int) if weights is None else weights
    cells = {}
    for x, y, wi in zip(xs, ys, w):
        cells[(x, y)] = cells.get((x, y), 0) + int(wi)
    N = len(cells)
    W = sum(cells.values())
    Q = sum(v * v for v in cells.values())
    mean = W / N
    s = math.sqrt(Q / N - mean * mean)
    out = {}
    for (x, y), v in cells.items():
        nbr_n, nbr_sum = 0, 0
        for dx in range(-ring, ring + 1):
            for dy in range(-ring, ring + 1):
                kx = (x + dx) % n
                ky = y + dy
                if 0 <= ky < n and (kx, ky) in cells:
                    nbr_n += 1
                    nbr_sum += cells[(kx, ky)]
        gi = None
        if N > 1 and s > 0:
            denom = s * math.sqrt((N * nbr_n - nbr_n * nbr_n) / (N - 1.0))
            if denom > 0:
                gi = (nbr_sum - mean * nbr_n) / denom
        out[(x, y)] = (v, nbr_n, nbr_sum, gi)
    return out


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(7)
    # dense blob + sparse background => real hot spot
    blob_lon = rng.normal(10.0, 2.0, 400)
    blob_lat = rng.normal(20.0, 2.0, 400)
    bg_lon = rng.uniform(-179, 179, 300)
    bg_lat = rng.uniform(-85, 85, 300)
    return (
        np.concatenate([blob_lon, bg_lon]),
        np.concatenate([blob_lat, bg_lat]),
    )


def test_matches_oracle(spark, pts):
    lons, lats = pts
    df = spark.createDataFrame(
        list(zip(lons.tolist(), lats.tolist())), "lon double, lat double"
    )
    got = {
        (r.x, r.y): (r.w, r.nbr_n, r.nbr_sum, r.gi_star)
        for r in hotspot_cells(df, bits=5, ring=1).collect()
    }
    want = _oracle(lons, lats, bits=5, ring=1)
    assert set(got) == set(want)
    for k, (w, nn, ns, gi) in want.items():
        gw, gn, gs_, ggi = got[k]
        assert (gw, gn, gs_) == (w, nn, ns), k
        if gi is None:
            assert ggi is None
        else:
            assert ggi == pytest.approx(gi, rel=1e-12)
    # the blob cell must be the max-gi cell and clearly hot
    hot = max(want.items(), key=lambda kv: -1 if kv[1][3] is None else kv[1][3])
    assert want[hot[0]][3] > 3.0


def test_antimeridian_wrap(spark):
    # mass just west of the IDL must appear in the window of the
    # first column's cells (x wraps cyclically)
    rows = [(-179.9, 0.5)] * 5 + [(179.9, 0.5)] * 3 + [(0.0, 50.0)]
    df = spark.createDataFrame(rows, "lon double, lat double")
    out = {
        (r.x, r.y): r for r in hotspot_cells(df, bits=4, ring=1).collect()
    }
    n = 1 << 4
    east = out[(0, 8)]       # -179.9 -> x=0
    west = out[(n - 1, 8)]   # 179.9 -> x=15
    assert east.nbr_sum == 8 and west.nbr_sum == 8  # each sees the other
    assert east.nbr_n == 2 and west.nbr_n == 2


def test_weighted(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 10), (0.1, 0.1, 5), (100.0, 50.0, 1)],
        "lon double, lat double, wt int",
    )
    out = {(r.x, r.y): r for r in hotspot_cells(
        df, bits=3, ring=1, weight_col="wt").collect()}
    # first two share a cell at bits=3
    vals = sorted(r.w for r in out.values())
    assert vals == [1, 15]


def test_plan_no_python(spark, pts):
    lons, lats = pts
    df = spark.createDataFrame(
        list(zip(lons.tolist(), lats.tolist())), "lon double, lat double"
    )
    plan = (
        hotspot_cells(df, bits=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_space_time_matches_oracle(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    # burst: dense blob only in bucket 1; background spread over buckets
    bl = rng.normal(10, 1.5, 250)
    bb = rng.normal(20, 1.5, 250)
    bt = rng.integers(86400, 2 * 86400, 250)  # bucket 1
    gl = rng.uniform(-179, 179, 250)
    gb = rng.uniform(-85, 85, 250)
    gt = rng.integers(0, 4 * 86400, 250)
    lons = np.concatenate([bl, gl])
    lats = np.concatenate([bb, gb])
    ts = np.concatenate([bt, gt])
    df = spark.createDataFrame(
        list(zip(lons.tolist(), lats.tolist(), [int(x) for x in ts])),
        "lon double, lat double, es long",
    )
    from geomesa_spark.operators.hotspot import hotspot_cells_st

    got = {
        (r.x, r.y, r.tb): (r.w, r.nbr_n, r.nbr_sum, r.gi_star)
        for r in hotspot_cells_st(
            df, "es", bits=5, ring=1, time_bucket_s=86400, time_ring=1
        ).collect()
    }
    # brute oracle
    n = 1 << 5
    xs = np.clip(np.floor((lons + 180.0) / 360.0 * float(n)), 0, n - 1).astype(int)
    ys = np.clip(np.floor((lats + 90.0) / 180.0 * float(n)), 0, n - 1).astype(int)
    tb = (ts // 86400).astype(int)
    bins = {}
    for k in zip(xs, ys, tb):
        bins[k] = bins.get(k, 0) + 1
    N = len(bins)
    W = sum(bins.values())
    Q = sum(v * v for v in bins.values())
    mean = W / N
    s = math.sqrt(Q / N - mean * mean)
    assert set(got) == set(bins)
    for (x, y, t), v in bins.items():
        nn = ns = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dt in (-1, 0, 1):
                    k = ((x + dx) % n, y + dy, t + dt)
                    if 0 <= k[1] < n and k in bins:
                        nn += 1
                        ns += bins[k]
        w, gn, gs_, gi = got[(x, y, t)]
        assert (w, gn, gs_) == (v, nn, ns)
        want_gi = (ns - mean * nn) / (
            s * math.sqrt((N * nn - nn * nn) / (N - 1.0))
        )
        assert gi == pytest.approx(want_gi, rel=1e-12)
    # the burst bin must dominate; the same cell in other buckets must not
    hot = max(got.items(), key=lambda kv: kv[1][3])
    assert hot[0][2] == 1 and hot[1][3] > 3.0
