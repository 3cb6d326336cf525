"""Viewshed (observer line-of-sight) vs an independent python oracle
plus engineered wall / flat-plane / hole / height semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.functions import cells as C
from geomesa_spark.operators.raster import TILE_SCHEMA, viewshed

FP = 1_000_000


def _tiles_from_world(spark, world, bits, px, py):
    n = 1 << bits
    rows = []
    for cix in range(n):
        for ciy in range(n):
            cell = int(C.z2_encode_np(
                np.asarray([cix]), np.asarray([ciy]))[0])
            t = world[ciy * py:(ciy + 1) * py, cix * px:(cix + 1) * px]
            tile = [
                None if np.isnan(v) else float(v) for v in t.ravel()
            ]
            rows.append((bits, cell, px, py, tile))
    return spark.createDataFrame(rows, TILE_SCHEMA)


def _oracle(wfp, observers, radius, obs_h=0):
    """Brute-force viewshed with the operator's exact contract:
    nearest-pixel (round-half-up) sampling at integer steps along the
    dominant axis, strict cross-multiplied blocking, NaN (missing)
    samples never block."""
    H, W = len(wfp), len(wfp[0])

    def elev(x, y):
        if 0 <= x < W and 0 <= y < H:
            return wfp[y][x]
        return None

    out = {}
    for ox, oy in observers:
        oe = elev(ox, oy)
        if oe is None:
            continue
        oe += obs_h
        for gx in range(max(0, ox - radius), min(W, ox + radius + 1)):
            for gy in range(max(0, oy - radius),
                            min(H, oy + radius + 1)):
                te = elev(gx, gy)
                if te is None:
                    continue
                d = max(abs(gx - ox), abs(gy - oy))
                blocked = False
                for k in range(1, d):
                    sx = (2 * (ox * (d - k) + gx * k) + d) // (2 * d)
                    sy = (2 * (oy * (d - k) + gy * k) + d) // (2 * d)
                    ek = elev(sx, sy)
                    if ek is not None and (ek - oe) * d > (te - oe) * k:
                        blocked = True
                        break
                out[(ox, oy, gx, gy)] = (d, not blocked)
    return out


def _collect(vs):
    return {
        (r.obs_gx, r.obs_gy, r.gx, r.gy): (r.d, r.visible)
        for r in vs.collect()
    }


def test_viewshed_matches_oracle(spark):
    """Random rough terrain, three observers, radius crossing tile
    seams — exact match against the brute-force oracle."""
    BITS, PX, PY = 1, 8, 8
    rng = np.random.default_rng(7)
    world = rng.normal(500.0, 80.0, (2 * PY, 2 * PX))
    tiles = _tiles_from_world(spark, world, BITS, PX, PY)
    wfp = np.floor(world * FP).astype(np.int64)
    observers = [(3, 3), (8, 8), (14, 2)]
    obs_df = spark.createDataFrame(observers, "gx long, gy long")
    got = _collect(viewshed(tiles, obs_df, BITS, radius=6))
    want = _oracle(wfp.tolist(), observers, 6)
    assert got == want
    # sanity: rough terrain at this variance must block something
    assert any(not v for _, v in got.values())
    assert any(v for (_, _, gx, gy), (d, v) in got.items() if d >= 4)


def test_viewshed_flat_plane_all_visible(spark):
    """Grazing equality does not block: a flat plane is fully
    visible (0 > 0 is false for every sample)."""
    world = np.full((8, 8), 100.0)
    tiles = _tiles_from_world(spark, world, 0, 8, 8)
    obs = spark.createDataFrame([(4, 4)], "gx long, gy long")
    got = _collect(viewshed(tiles, obs, 0, radius=4))
    assert len(got) == 64  # the 9x9 window clipped to the 8x8 world
    assert all(v for _, v in got.values())


def test_viewshed_wall_and_observer_height(spark):
    """A wall hides everything behind it along the row; raising the
    eye above the wall restores visibility."""
    world = np.full((8, 8), 100.0)
    world[4, 4] = 200.0  # wall pixel between observer and far side
    tiles = _tiles_from_world(spark, world, 0, 8, 8)
    obs = spark.createDataFrame([(1, 4)], "gx long, gy long")
    got = _collect(viewshed(tiles, obs, 0, radius=6))
    # in front of / on the wall: visible (the wall pixel itself is a
    # target with no higher sample in between)
    for gx in (2, 3, 4):
        assert got[(1, 4, gx, 4)][1], gx
    # strictly behind the wall on the same row: blocked
    for gx in (5, 6, 7):
        assert not got[(1, 4, gx, 4)][1], gx
    # the binding target is the ground JUST behind the wall: (5,4)
    # at 100, d=4 with the 200-wall at k=3, needs
    # oe + (100-oe)*3/4 >= 200, i.e. oe >= 500; at exactly 500 the
    # wall grazes the sightline and grazing is VISIBLE (strict
    # blocking), one fp-unit lower it blocks
    tall = _collect(
        viewshed(tiles, obs, 0, radius=6, observer_height_fp=400 * FP)
    )
    assert all(v for _, v in tall.values())
    short = _collect(
        viewshed(tiles, obs, 0, radius=6,
                 observer_height_fp=400 * FP - 1)
    )
    assert not short[(1, 4, 5, 4)][1]


def test_viewshed_holes_do_not_block(spark):
    """Missing pixels: never block as samples, never emit as targets,
    and an observer standing on one emits nothing."""
    world = np.full((8, 8), 100.0)
    world[4, 4] = np.nan  # hole where the wall was
    world[4, 2] = np.nan
    tiles = _tiles_from_world(spark, world, 0, 8, 8)
    obs = spark.createDataFrame(
        [(1, 4), (2, 4)], "gx long, gy long"
    )  # (2,4) stands on a hole
    got = _collect(viewshed(tiles, obs, 0, radius=6))
    assert not any((a, b) == (2, 4) for (a, b, _, _) in got)
    # far side of the hole is visible (hole does not block)
    assert got[(1, 4, 7, 4)][1]
    # the hole pixels themselves are not targets
    assert (1, 4, 4, 4) not in got and (1, 4, 2, 4) not in got


def test_viewshed_adjacent_always_visible(spark):
    """d <= 1 has no intermediate samples: even a pit next to a
    spike is visible."""
    world = np.full((8, 8), 100.0)
    world[3, 3] = 5000.0
    world[3, 4] = 1.0
    tiles = _tiles_from_world(spark, world, 0, 8, 8)
    obs = spark.createDataFrame([(3, 3)], "gx long, gy long")
    got = _collect(viewshed(tiles, obs, 0, radius=2))
    assert got[(3, 3, 4, 3)][1] and got[(3, 3, 3, 3)][1]


def test_viewshed_validates(spark):
    world = np.full((8, 8), 1.0)
    tiles = _tiles_from_world(spark, world, 0, 8, 8)
    obs = spark.createDataFrame([(1, 1)], "gx long, gy long")
    with pytest.raises(ValueError, match="radius"):
        viewshed(tiles, obs, 0, radius=0)


def test_viewshed_plan_shape(spark):
    """The observer side broadcasts and the lattice is never crossed
    with itself: no CartesianProduct, and the only nested-loop join
    is the bounded observer-window pairing."""
    world = np.full((16, 16), 1.0)
    tiles = _tiles_from_world(spark, world, 0, 16, 16)
    obs = spark.createDataFrame([(5, 5)], "gx long, gy long")
    plan = viewshed(tiles, obs, 0, radius=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
