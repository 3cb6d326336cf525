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


def test_hotspot_hex_oracle(spark):
    # numpy mirror of the integer-moment pipeline on a hot blob
    import numpy as np
    from geomesa_spark.operators.hotspot import hotspot_hex

    rng = np.random.default_rng(31)
    pts = [(float(rng.normal(5, 1.5)), float(rng.normal(0, 1.0)))
           for _ in range(800)]
    pts += [(float(rng.uniform(-60, 60)), float(rng.uniform(-40, 40)))
            for _ in range(400)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    S = 1.2
    got = {(r.hq, r.hr): (r.w, r.nbr_n, r.nbr_sum, r.gi_star)
           for r in hotspot_hex(df, S, ring=1).collect()}

    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    q, r = hex_cell_np(xs, ys, S)
    occ = {}
    for a, b in zip(q, r):
        occ[(int(a), int(b))] = occ.get((int(a), int(b)), 0) + 1
    offs = [(dq, dr) for dq in (-1, 0, 1) for dr in (-1, 0, 1)
            if max(abs(dq), abs(dr), abs(dq + dr)) <= 1]
    assert len(offs) == 7  # hex disk: self + 6 neighbors
    N = len(occ)
    W = sum(occ.values())
    Q = sum(v * v for v in occ.values())
    m = float(W) / N
    s = np.sqrt(float(Q) / N - m * m)
    exp = {}
    for (a, b), w in occ.items():
        nn = ns = 0
        for dq, dr in offs:
            k = (a + dq, b + dr)
            if k in occ:
                nn += 1
                ns += occ[k]
        denom = s * np.sqrt((float(N) * nn - float(nn) * nn) / (N - 1.0))
        gi = (float(ns) - m * nn) / denom if denom > 0 else None
        exp[(a, b)] = (w, nn, ns)
        if gi is not None:
            assert abs(got[(a, b)][3] - gi) < 1e-9, (a, b)
    assert {k: v[:3] for k, v in got.items()} == exp
    # the engineered blob is hot
    hot_cell = hex_cell_np(np.array([5.0]), np.array([0.0]), S)
    hot = got[(int(hot_cell[0][0]), int(hot_cell[1][0]))]
    assert hot[3] > 5.0
