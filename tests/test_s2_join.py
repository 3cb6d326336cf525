"""S2 polygon polyfill + broadcast PIP join.

The polyfill property test is the load-bearing one: the mixed-level
cover never misses an inside point (safe prune), never flags a false
interior (the refine-skipping fast path must be exact), and its
emitted cells are pairwise spatially disjoint (which is what makes
the single ancestor-explode join duplicate-free).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.functions import geometry as G
from geomesa_spark.functions import s2 as S
from geomesa_spark.operators.s2_join import pip_join_s2, s2_cover_pdf

RNG = np.random.default_rng(20260820)


def rand_lonlat(n: int):
    lon = RNG.uniform(-180.0, 180.0, n)
    lat = np.degrees(np.arcsin(RNG.uniform(-1.0, 1.0, n)))
    return lon, lat


POLYS = [
    ("rect", "POLYGON ((10 20, 80 20, 80 60, 10 60, 10 20))"),
    ("tri", "POLYGON ((-120 -40, -60 -45, -90 10, -120 -40))"),
    (
        "hole",
        "POLYGON ((0 -30, 40 -30, 40 10, 0 10, 0 -30),"
        " (10 -20, 30 -20, 30 0, 10 0, 10 -20))",
    ),
    ("idl", "POLYGON ((170 -10, 190 -10, 190 15, 170 15, 170 -10))"),
    ("polar", "POLYGON ((-180 80, 180 80, 180 90, -180 90, -180 80))"),
]


def _brute(pid_wkt, lon, lat):
    geom = G.normalize_idl(G.parse_wkt(pid_wkt))
    return G.contains(geom, lon, lat)


def test_polyfill_conservative_interior_disjoint():
    lon, lat = rand_lonlat(100_000)
    pc = S.s2_cell_np(lon, lat, 12)
    for pid, wkt in POLYS:
        geom = G.normalize_idl(G.parse_wkt(wkt))
        cells, levels, interior = S.s2_polyfill(geom, 12, 4096)
        assert 0 < len(cells) <= 4096
        inside = G.contains(geom, lon, lat)
        cov = np.zeros(len(lon), bool)
        intr = np.zeros(len(lon), bool)
        for c, lv, it in zip(cells.tolist(), levels.tolist(), interior.tolist()):
            m = S.s2_parent_np(pc, lv) == c
            cov |= m
            if it:
                intr |= m
        assert not (inside & ~cov).any(), pid      # never misses
        assert not (intr & ~inside).any(), pid     # interior is exact
        # pairwise spatially disjoint: no emitted cell is an ancestor
        # of another (ancestor range containment check)
        ranges = sorted(
            S.s2_range_np(int(c), int(lv))
            for c, lv in zip(cells.tolist(), levels.tolist())
        )
        assert all(
            ranges[k + 1][0] > ranges[k][1] for k in range(len(ranges) - 1)
        ), pid


def test_polyfill_budget_degrades_not_fails():
    geom = G.normalize_idl(G.parse_wkt(POLYS[0][1]))
    cells, levels, interior = S.s2_polyfill(geom, 18, max_cells=64)
    assert 0 < len(cells) <= 64
    # still conservative at the tiny budget
    lon, lat = rand_lonlat(20_000)
    pc = S.s2_cell_np(lon, lat, 18)
    cov = np.zeros(len(lon), bool)
    for c, lv in zip(cells.tolist(), levels.tolist()):
        cov |= S.s2_parent_np(pc, lv) == c
    inside = G.contains(geom, lon, lat)
    assert not (inside & ~cov).any()


def test_pip_join_s2_matches_brute_force(spark):
    lon, lat = rand_lonlat(30_000)
    pdf = spark.createDataFrame(
        [(int(k), float(a), float(b)) for k, (a, b) in enumerate(zip(lon, lat))],
        "id long, lon double, lat double",
    )
    got = sorted(
        (r["id"], r["poly_id"])
        for r in pip_join_s2(pdf, POLYS).select("id", "poly_id").collect()
    )
    want = sorted(
        (int(k), pid)
        for pid, wkt in POLYS
        for k in np.nonzero(_brute(wkt, lon, lat))[0]
    )
    assert got == want


def test_pip_join_s2_plan_shape(spark):
    """No Python, no cartesian, broadcast hash join, one Generate
    (the ancestor explode doubling as the encode barrier)."""
    pdf = spark.createDataFrame([(0, 1.0, 2.0)], "id long, lon double, lat double")
    plan = (
        pip_join_s2(pdf, POLYS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for marker in (
        "BatchEvalPython",
        "ArrowEvalPython",
        "FlatMapGroupsInPandas",
        "MapInPandas",
    ):
        assert marker not in plan, marker


def test_pip_join_s2_empty_layer(spark):
    pdf = spark.createDataFrame([(0, 1.0, 2.0)], "id long, lon double, lat double")
    out = pip_join_s2(pdf, [])
    assert out.count() == 0
    assert out.columns == ["id", "lon", "lat", "poly_id"]


def test_cover_pdf_levels_bounded():
    cover = s2_cover_pdf(POLYS, level=12, max_cells=4096)
    assert set(cover.columns) == {"pcell", "plevel", "interior", "poly_id"}
    assert cover["plevel"].between(0, 12).all()
    assert cover.groupby("poly_id").size().le(4096).all()
