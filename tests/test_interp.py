"""idw_grid: numpy oracle parity (fixed mode exact, float mode approx)."""

import numpy as np
import pytest

from geomesa_spark.operators.interp import idw_grid


def _oracle_fixed(pts, bits, ring, w_scale):
    n = 1 << bits
    cw, ch = 360.0 / n, 180.0 / n
    cells = {}
    for lon, lat, v in pts:
        x = int(min(n - 1, max(0, np.floor((lon + 180.0) / 360.0 * n))))
        y = int(min(n - 1, max(0, np.floor((lat + 90.0) / 180.0 * n))))
        for dx in range(-ring, ring + 1):
            for dyy in range(-ring, ring + 1):
                tx, ty = (x + dx) % n, y + dyy
                if not (0 <= ty < n):
                    continue
                clon = (tx + 0.5) * cw - 180.0
                clat = (ty + 0.5) * ch - 90.0
                dl = abs(lon - clon)
                dl = min(dl, 360.0 - dl)
                d2 = dl * dl + (lat - clat) ** 2
                w = int(np.floor(w_scale * (cw * cw) / (cw * cw + d2)))
                c = cells.setdefault((tx, ty), [0, 0, 0])
                c[0] += 1
                c[1] += w
                c[2] += w * v
    return {
        k: (c[0], c[1], c[2], (c[2] / c[1]) if c[1] > 0 else None)
        for k, c in cells.items()
    }


def test_idw_fixed_oracle(spark):
    rng = np.random.default_rng(13)
    pts = [
        (float(rng.uniform(-180, 180)), float(rng.uniform(-90, 90)),
         int(rng.integers(0, 10_000_000)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double, v long")
    got = {
        (r.x, r.y): (r.n_samples, r.den, r.num, r.value)
        for r in idw_grid(df, "v", bits=4, ring=2).collect()
    }
    exp = _oracle_fixed(pts, 4, 2, 1_000_000)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == exp[k], (k, got[k], exp[k])


def test_idw_antimeridian_continuity(spark):
    # one sample just west of the IDL must reach cells just east
    df = spark.createDataFrame(
        [(179.9, 0.0, 1000)], "lon double, lat double, v long"
    )
    got = {(r.x, r.y): r.den for r in
           idw_grid(df, "v", bits=4, ring=1).collect()}
    n = 1 << 4
    xs = {x for x, _ in got}
    assert n - 1 in xs and 0 in xs  # wrapped across the dateline
    # wrapped-x weight uses the SHORT delta, so it's comparable to
    # the home cell's neighbor, not ~360 deg away
    assert got[(0, 8)] > 0.5 * got[(n - 1, 8)]


def test_idw_float_mode_close_to_true_idw(spark):
    rng = np.random.default_rng(4)
    pts = [
        (float(rng.uniform(-10, 10)), float(rng.uniform(-10, 10)),
         float(rng.uniform(0, 100)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double, v double")
    rows = idw_grid(df, "v", bits=6, ring=2, fixed=False).collect()
    n = 1 << 6
    cw, ch = 360.0 / n, 180.0 / n
    eps = (cw * 1e-6) ** 2
    for i in rng.choice(len(rows), size=10, replace=False):
        r = rows[int(i)]
        clon = (r.x + 0.5) * cw - 180.0
        clat = (r.y + 0.5) * ch - 90.0
        num = den = 0.0
        cnt = 0
        for lon, lat, v in pts:
            x = int(np.floor((lon + 180.0) / 360.0 * n))
            y = int(np.floor((lat + 90.0) / 180.0 * n))
            if max(abs((x - r.x + n // 2) % n - n // 2), abs(y - r.y)) <= 2:
                dl = min(abs(lon - clon), 360 - abs(lon - clon))
                w = 1.0 / (dl * dl + (lat - clat) ** 2 + eps)
                num += w * v
                den += w
                cnt += 1
        assert cnt == r.n_samples
        assert r.value == pytest.approx(num / den, rel=1e-9)


def test_idw_fixed_rejects_double_value(spark):
    df = spark.createDataFrame([(0.0, 0.0, 1.5)],
                               "lon double, lat double, v double")
    with pytest.raises(ValueError, match="integral"):
        idw_grid(df, "v")


def test_idw_plan_no_python(spark):
    df = spark.createDataFrame([(0.0, 0.0, 10)],
                               "lon double, lat double, v long")
    plan = idw_grid(df, "v")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
