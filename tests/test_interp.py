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


def test_areal_interpolate_vs_brute(spark):
    """areal_interpolate vs a python center-in-polygon oracle:
    exact shares, overlap summation, sliver fallback, guards."""
    import math

    import numpy as np

    from geomesa_spark.functions import cells as C
    from geomesa_spark.operators.interp import areal_interpolate

    BITS, FP = 5, 1_000_000
    n = 1 << BITS
    zones = [
        ("a", "POLYGON ((0 0, 40 0, 40 30, 0 30, 0 0))", 1000.0),
        ("b", "POLYGON ((20 10, 70 10, 70 50, 20 50, 20 10))", 500.5),
        # sliver smaller than one cell at bits=5 (11.25 x 5.6 deg)
        ("s", "POLYGON ((100 20, 100.1 20, 100.1 20.1, 100 20.1, 100 20))",
         77.0),
    ]
    got = {r.cell: (r.total_fp, r.value) for r in areal_interpolate(
        spark, zones, BITS, fp_scale=FP).collect()}

    def inside(px, py, ring):
        # even-odd ray cast
        c = False
        for i in range(len(ring) - 1):
            (x0, y0), (x1, y1) = ring[i], ring[i + 1]
            if (y0 > py) != (y1 > py):
                xi = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
                if px < xi:
                    c = not c
        return c

    rings = {
        "a": [(0, 0), (40, 0), (40, 30), (0, 30), (0, 0)],
        "b": [(20, 10), (70, 10), (70, 50), (20, 50), (20, 10)],
        "s": [(100, 20), (100.1, 20), (100.1, 20.1), (100, 20.1),
              (100, 20)],
    }
    exp: dict[int, int] = {}
    for zid, _, v in zones:
        cells_in = []
        for ix in range(n):
            for iy in range(n):
                lon = (ix + 0.5) / n * 360.0 - 180.0
                lat = (iy + 0.5) / n * 180.0 - 90.0
                if inside(lon, lat, rings[zid]):
                    cells_in.append(int(C.z2_encode_np(
                        np.asarray([ix]), np.asarray([iy]))[0]))
        vfp = int(math.floor(v * FP))
        if cells_in:
            share = vfp // len(cells_in)
            for c in cells_in:
                exp[c] = exp.get(c, 0) + share
        else:
            assert zid == "s"
            # fallback: bbox-center cell
            cxm = min(n - 1, max(0, int((100.05 + 180) / 360 * n)))
            cym = min(n - 1, max(0, int((20.05 + 90) / 180 * n)))
            c = int(C.z2_encode_np(
                np.asarray([cxm]), np.asarray([cym]))[0])
            exp[c] = exp.get(c, 0) + vfp
    assert {k: v for k, v in got.items()} == {
        k: (v, v / FP) for k, v in exp.items()}
    # mass conservation up to the documented quantization: the
    # dropped remainder is < 1 fixed-point unit per (zone, cell)
    # MEMBERSHIP (overlapping zones each contribute their own)
    tot = sum(v for v, _ in got.values())
    vtot = sum(int(math.floor(v * FP)) for _, _, v in zones)
    memberships = sum(
        max(1, sum(1 for ix in range(n) for iy in range(n)
                   if inside((ix + 0.5) / n * 360.0 - 180.0,
                             (iy + 0.5) / n * 180.0 - 90.0, rings[z])))
        for z, _, _ in zones)
    assert 0 <= vtot - tot < memberships

    with pytest.raises(ValueError):
        areal_interpolate(spark, [("x", "POLYGON ((0 0, 1 0, 1 1, 0 0))",
                                   -1.0)], BITS)
    with pytest.raises(ValueError):
        areal_interpolate(spark, zones, 14, cell_budget=10)
    with pytest.raises(ValueError):
        areal_interpolate(spark, [], BITS)
    with pytest.raises(ValueError):
        areal_interpolate(
            spark,
            [("a", rings and zones[0][1], 1.0),
             ("a", zones[1][1], 2.0)], BITS)


def test_distance_surface(spark):
    """EucDistance/EucAllocation vs a brute numpy oracle over all
    cells within the ring: exact d2/winner (total (d2, id) ties),
    dateline wrap continuity, absent-beyond-ring contract."""
    import numpy as np

    from geomesa_spark.operators.interp import distance_surface

    BITS, RING = 4, 2
    n = 1 << BITS
    cw, ch = 360.0 / n, 180.0 / n
    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 60)
    lat = rng.uniform(-90, 90, 60)
    # dateline straddler + an exact duplicate position (tie -> min id)
    lon[0], lat[0] = 179.9, 10.0
    lon[1], lat[1] = -179.9, 10.0
    lon[2], lat[2] = lon[3], lat[3] = 42.0, -31.0
    rows = [(int(i), float(lon[i]), float(lat[i]))
            for i in range(len(lon))]
    df = spark.createDataFrame(rows, "tid long, lon double, lat double")
    got = {(r.x, r.y): r for r in distance_surface(
        df, "tid", bits=BITS, ring=RING).collect()}

    want = {}
    for i in range(len(lon)):
        x = min(n - 1, max(0, int(np.floor((lon[i] + 180.0) / 360.0 * n))))
        y = min(n - 1, max(0, int(np.floor((lat[i] + 90.0) / 180.0 * n))))
        for dx in range(-RING, RING + 1):
            for dy in range(-RING, RING + 1):
                tx, ty = (x + dx) % n, y + dy
                if not (0 <= ty < n):
                    continue
                clon = (tx + 0.5) * cw - 180.0
                clat = (ty + 0.5) * ch - 90.0
                dl = abs(lon[i] - clon)
                dl = min(dl, 360.0 - dl)
                dyv = lat[i] - clat
                d2 = dl * dl + dyv * dyv
                k = (tx, ty)
                cur = want.get(k)
                cand = (d2, i)
                if cur is None or cand < (cur[0], cur[1]):
                    want[k] = (d2, i, want[k][2] + 1 if cur else 1)
                elif cur is not None:
                    want[k] = (cur[0], cur[1], cur[2] + 1)
    assert set(got) == set(want)
    for k, r in got.items():
        d2, tid, nc = want[k]
        assert r.d2 == d2 and r.nearest_id == tid, k
        assert r.n_candidates == nc
        assert r.dist == np.sqrt(d2)
    # the duplicate position tie broke to the smaller id somewhere
    assert any(r.nearest_id == 2 for r in got.values())
    assert not any(r.nearest_id == 3 for r in got.values())


def test_distance_surface_narrow_grid_raises(spark):
    """Review fix: 2*ring >= 2^bits would wrap offsets onto the same
    cell and double-count n_candidates — refuse."""
    import pytest

    from geomesa_spark.operators.interp import distance_surface

    df = spark.createDataFrame([(0, 0.0, 0.0)],
                               "tid long, lon double, lat double")
    with pytest.raises(ValueError, match="ring"):
        distance_surface(df, "tid", bits=2, ring=2)
