"""Trajectory simplification vs an independent recursive python RDP."""

import math

import numpy as np
import pytest

from geomesa_spark.operators.simplify import (
    radial_keep_np,
    rdp_keep_np,
    simplify_tracks,
)


def _rdp_recursive(pts, tol):
    """Independent textbook recursive RDP (pure python, no numpy)."""
    if len(pts) <= 2:
        return list(pts)
    ax, ay = pts[0]
    bx, by = pts[-1]
    dx, dy = bx - ax, by - ay
    seg2 = dx * dx + dy * dy
    best, bi = -1.0, 0
    for i in range(1, len(pts) - 1):
        px, py = pts[i]
        if seg2 == 0.0:
            d2 = (px - ax) ** 2 + (py - ay) ** 2
        else:
            cr = (px - ax) * dy - (py - ay) * dx
            d2 = cr * cr / seg2
        if d2 > best:
            best, bi = d2, i
    if best > tol * tol:
        left = _rdp_recursive(pts[: bi + 1], tol)
        right = _rdp_recursive(pts[bi:], tol)
        return left[:-1] + right
    return [pts[0], pts[-1]]


def test_rdp_mask_matches_recursive_oracle():
    rng = np.random.default_rng(5)
    for _ in range(20):
        n = int(rng.integers(2, 60))
        lon = np.cumsum(rng.uniform(-1, 1, n))
        lat = np.cumsum(rng.uniform(-1, 1, n))
        tol = float(rng.uniform(0.05, 2.0))
        keep = rdp_keep_np(lon, lat, tol)
        got = list(zip(lon[keep], lat[keep]))
        want = _rdp_recursive(list(zip(lon, lat)), tol)
        assert got == want


def test_rdp_straight_line_collapses():
    lon = np.linspace(0, 10, 50)
    lat = lon * 2.0
    keep = rdp_keep_np(lon, lat, 1e-9)
    assert keep.sum() == 2 and keep[0] and keep[-1]


def test_radial_mask():
    lon = np.array([0.0, 0.05, 0.2, 0.21, 0.5])
    lat = np.zeros(5)
    keep = radial_keep_np(lon, lat, 0.1)
    # 0 kept; 0.05 within tol; 0.2 kept (anchor moves); 0.21 within;
    # 0.5 kept (also last)
    assert keep.tolist() == [True, False, True, False, True]


def test_distributed_matches_local(spark):
    rng = np.random.default_rng(9)
    rows = []
    for t in range(40):
        n = int(rng.integers(1, 80))
        ts = np.sort(rng.choice(100000, n, replace=False))
        lon = np.cumsum(rng.uniform(-0.5, 0.5, n)) + float(rng.uniform(-90, 90))
        lat = np.cumsum(rng.uniform(-0.5, 0.5, n)) / 2
        for i in range(n):
            rows.append((f"t{t}", int(ts[i]), float(lon[i]), float(lat[i])))
    df = spark.createDataFrame(
        rows, "track string, es long, lon double, lat double"
    ).repartition(7)
    for algo, fn in (("rdp", rdp_keep_np), ("radial", radial_keep_np)):
        out = simplify_tracks(df, "track", "es", 0.4, algorithm=algo)
        got = {(r.track, r.es) for r in out.collect()}
        want = set()
        tracks = {}
        for t, es, lon, lat in sorted(rows):
            tracks.setdefault(t, []).append((es, lon, lat))
        for t, pts in tracks.items():
            lon = np.array([p[1] for p in pts])
            lat = np.array([p[2] for p in pts])
            keep = fn(lon, lat, 0.4)
            want.update((t, pts[i][0]) for i in range(len(pts)) if keep[i])
        assert got == want, algo
        # endpoints survive; reduction actually happened
        assert len(got) < len(rows)


def test_all_columns_preserved(spark):
    df = spark.createDataFrame(
        [("t", 1, 0.0, 0.0, "payload-a"), ("t", 2, 1.0, 0.0, "payload-b"),
         ("t", 3, 2.0, 0.0, "payload-c")],
        "track string, es long, lon double, lat double, extra string",
    )
    out = simplify_tracks(df, "track", "es", 0.1).collect()
    # collinear middle dropped, payloads ride along untouched
    assert sorted(r.extra for r in out) == ["payload-a", "payload-c"]


def test_empty_and_tiny_masks():
    assert rdp_keep_np(np.array([]), np.array([]), 0.1).tolist() == []
    assert radial_keep_np(np.array([]), np.array([]), 0.1).tolist() == []
    assert rdp_keep_np(np.array([1.0]), np.array([2.0]), 0.1).tolist() == [True]
    assert radial_keep_np(np.array([1.0]), np.array([2.0]), 0.1).tolist() == [True]


def test_validation_spark(spark):
    df = spark.createDataFrame([("t", 1, 0.0, 0.0)],
                               "track string, es long, lon double, lat double")
    with pytest.raises(ValueError):
        simplify_tracks(df, "track", "es", 0.1, algorithm="nope")
    with pytest.raises(ValueError):
        simplify_tracks(df, "track", "es", -0.1)
