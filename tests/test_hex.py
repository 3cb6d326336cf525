"""hex binning: column/SQL/numpy tri-parity + lattice invariants."""

import numpy as np
from pyspark.sql import functions as F

from geomesa_spark.functions.hex import (
    SQRT3, hex_cell_cols, hex_cell_np, hex_cell_sql, hex_center_cols,
)


def test_hex_tri_parity(spark):
    rng = np.random.default_rng(19)
    xs = rng.uniform(-180, 180, 4000)
    ys = rng.uniform(-90, 90, 4000)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(xs, ys)],
        "x double, y double",
    )
    hq, hr = hex_cell_cols(F.col("x"), F.col("y"), 2.5)
    sq, sr = hex_cell_sql("x", "y", 2.5)
    rows = df.select(
        hq.alias("cq"), hr.alias("cr"),
        F.expr(sq).alias("eq"), F.expr(sr).alias("er"),
    ).collect()
    nq, nr = hex_cell_np(xs, ys, 2.5)
    for r, a, b in zip(rows, nq, nr):
        assert r.cq == r.eq == a and r.cr == r.er == b


def test_hex_center_roundtrip(spark):
    # every cell's center maps back to that cell, and points snap to
    # their NEAREST center (sampled)
    rng = np.random.default_rng(4)
    cells = [(int(q), int(r)) for q, r in
             zip(rng.integers(-40, 40, 200), rng.integers(-40, 40, 200))]
    df = spark.createDataFrame(cells, "hq long, hr long")
    cx, cy = hex_center_cols(F.col("hq"), F.col("hr"), 1.5)
    bq, br = hex_cell_cols(cx, cy, 1.5)
    out = df.select("hq", "hr", bq.alias("bq"), br.alias("br")).collect()
    assert all(r.hq == r.bq and r.hr == r.br for r in out)


def test_hex_nearest_center():
    # brute force: assigned cell center is the closest center
    rng = np.random.default_rng(10)
    xs = rng.uniform(-20, 20, 500)
    ys = rng.uniform(-20, 20, 500)
    s = 2.0
    hq, hr = hex_cell_np(xs, ys, s)
    # candidate centers: a lattice patch around each point's cell
    for i in range(0, 500, 17):
        best, bd = None, 1e18
        for dq in range(-2, 3):
            for dr in range(-2, 3):
                q, r = int(hq[i]) + dq, int(hr[i]) + dr
                cx = s * (SQRT3 * q + SQRT3 / 2.0 * r)
                cy = s * 1.5 * r
                d = (xs[i] - cx) ** 2 + (ys[i] - cy) ** 2
                if d < bd - 1e-12:
                    bd, best = d, (q, r)
        assert best == (int(hq[i]), int(hr[i])), (i, best, hq[i], hr[i])
