"""Centrography (mean center / std distance / deviational ellipse)
and quadrat CSR analysis vs numpy oracles + engineered geometries."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.pointpat import (
    centrography, quadrat_counts, quadrat_test,
)

FP = 10_000_000


def _pts(spark, xy, w=None, grp=None):
    rows = []
    for i, (x, y) in enumerate(xy):
        rows.append((
            float(x), float(y),
            int(w[i]) if w is not None else 1,
            grp[i] if grp is not None else "a",
        ))
    return spark.createDataFrame(
        rows, "lon double, lat double, wt long, g string"
    )


def _np_moments(xy, w=None):
    xq = np.round(np.asarray(xy)[:, 0] * FP).astype(np.int64)
    yq = np.round(np.asarray(xy)[:, 1] * FP).astype(np.int64)
    w = np.ones(len(xq), dtype=np.int64) if w is None else np.asarray(w)
    n = int(w.sum())
    sx, sy = int((xq * w).sum()), int((yq * w).sum())
    sxx = int((xq.astype(object) ** 2 * w).sum())
    syy = int((yq.astype(object) ** 2 * w).sum())
    sxy = int((xq.astype(object) * yq * w).sum())
    mx, my = sx / n / FP, sy / n / FP
    vx = sxx / n / (FP * FP) - mx * mx
    vy = syy / n / (FP * FP) - my * my
    cxy = sxy / n / (FP * FP) - mx * my
    return n, mx, my, vx, vy, cxy


def test_centrography_matches_numpy(spark):
    rng = np.random.default_rng(11)
    # anisotropic: stretched along a 30-degree-from-north axis
    t = np.radians(30.0)
    base = rng.normal(0, 1, (400, 2)) * [0.5, 2.0]
    rot = np.array([[np.cos(t), np.sin(t)], [-np.sin(t), np.cos(t)]])
    xy = base @ rot.T + [12.0, 47.0]
    w = rng.integers(1, 5, 400)
    out = centrography(_pts(spark, xy, w=w), weight_col="wt").collect()
    assert len(out) == 1
    r = out[0]
    n, mx, my, vx, vy, cxy = _np_moments(xy, w)
    assert r.n == n
    assert r.mean_x == pytest.approx(mx, abs=1e-9)
    assert r.mean_y == pytest.approx(my, abs=1e-9)
    assert r.vx == pytest.approx(vx, rel=1e-9)
    assert r.vy == pytest.approx(vy, rel=1e-9)
    assert r.cxy == pytest.approx(cxy, rel=1e-9)
    assert r.sd_dist == pytest.approx(np.sqrt(vx + vy), rel=1e-9)
    # independent eigendecomposition
    evals, evecs = np.linalg.eigh([[vx, cxy], [cxy, vy]])
    assert r.sigma_major == pytest.approx(np.sqrt(evals[1]), rel=1e-9)
    assert r.sigma_minor == pytest.approx(np.sqrt(evals[0]), rel=1e-9)
    vec = evecs[:, 1]
    bearing = np.degrees(np.arctan2(vec[0], vec[1])) % 180.0
    assert r.theta_deg == pytest.approx(bearing, abs=1e-6)
    # the construction stretched along ~30 degrees from north
    assert abs(r.theta_deg - 30.0) < 5.0


def test_centrography_grouped_and_axis_aligned(spark):
    # east-west line -> bearing 90; north-south -> 0; NE diagonal -> 45
    ew = [(x, 5.0) for x in np.linspace(0, 1, 20)]
    ns = [(5.0, y) for y in np.linspace(0, 1, 20)]
    ne = [(v, v) for v in np.linspace(0, 1, 20)]
    xy = ew + ns + ne
    grp = ["ew"] * 20 + ["ns"] * 20 + ["ne"] * 20
    out = {
        r.g: r
        for r in centrography(_pts(spark, xy, grp=grp), by=["g"]).collect()
    }
    assert out["ew"].theta_deg == pytest.approx(90.0)
    assert out["ns"].theta_deg == pytest.approx(0.0)
    assert out["ne"].theta_deg == pytest.approx(45.0, abs=1e-6)
    assert out["ew"].sigma_minor == pytest.approx(0.0, abs=1e-9)
    assert out["ns"].mean_x == pytest.approx(5.0)
    # a 1-D pattern's std distance equals its major sigma
    assert out["ne"].sd_dist == pytest.approx(out["ne"].sigma_major,
                                              rel=1e-12)


def test_quadrat_counts_and_edges(spark):
    # 2x2 grid over [0,1]^2; right/top edges close into the last bin
    xy = [(0.1, 0.1), (0.9, 0.1), (0.1, 0.9), (1.0, 1.0), (0.5, 0.5)]
    got = {
        (r.cx, r.cy): r.c
        for r in quadrat_counts(
            _pts(spark, xy), (0, 0, 1, 1), 2, 2
        ).collect()
    }
    # (0.5, 0.5) floors into cell (1,1); (1.0, 1.0) clamps into (1,1)
    assert got == {(0, 0): 1, (1, 0): 1, (0, 1): 1, (1, 1): 2}
    # outside the window: dropped
    got2 = quadrat_counts(
        _pts(spark, [(2.0, 2.0), (-0.1, 0.5)]), (0, 0, 1, 1), 2, 2
    ).count()
    assert got2 == 0


def test_quadrat_test_separates_patterns(spark):
    rng = np.random.default_rng(5)
    nx = ny = 6

    def stats(xy):
        r = quadrat_test(_pts(spark, xy), (0, 0, 1, 1), nx, ny).collect()
        assert len(r) == 1
        return r[0]

    # perfectly regular: one point per quadrat -> chi2 == 0 exactly
    reg = [((i + 0.5) / nx, (j + 0.5) / ny)
           for i in range(nx) for j in range(ny)]
    r = stats(reg)
    assert r.n == 36 and r.ssq == 36 and r.chi2 == 0.0 and r.vmr == 0.0

    # CSR: vmr near 1
    csr = rng.uniform(0, 1, (720, 2))
    r = stats(csr.tolist())
    assert 0.6 < r.vmr < 1.5
    # closed form vs a numpy recount including empty cells
    cx = np.minimum(nx - 1, (csr[:, 0] * nx).astype(int))
    cy = np.minimum(ny - 1, (csr[:, 1] * ny).astype(int))
    counts = np.zeros((nx, ny))
    for a, b in zip(cx, cy):
        counts[a, b] += 1
    mean = counts.sum() / (nx * ny)
    chi2_direct = ((counts - mean) ** 2 / mean).sum()
    assert r.chi2 == pytest.approx(chi2_direct, rel=1e-12)

    # one-cell cluster: vmr >> 1
    clus = rng.uniform(0, 1 / 6, (720, 2))
    r = stats(clus.tolist())
    assert r.vmr > 100

    # empty window: n == 0, chi2 NULL (0/0), not a crash
    r = stats([(5.0, 5.0)])
    assert r.n == 0 and r.chi2 is None


def test_quadrat_validates(spark):
    with pytest.raises(ValueError, match="nx"):
        quadrat_test(_pts(spark, [(0.5, 0.5)]), (0, 0, 1, 1), 0, 2)
    with pytest.raises(ValueError, match="extent"):
        quadrat_test(_pts(spark, [(0.5, 0.5)]), (1, 0, 0, 1), 2, 2)
