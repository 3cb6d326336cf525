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


def _mk_oracle(series):
    """(s, var_num, mk_z) for one list of (t, v) — brute force."""
    vs = [v for _, v in sorted(series)]
    n = len(vs)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (vs[j] > vs[i]) - (vs[j] < vs[i])
    from collections import Counter
    tt = sum(c * (c - 1) * (2 * c + 5) for c in Counter(vs).values())
    var_num = n * (n - 1) * (2 * n + 5) - tt
    if var_num <= 0:
        return s, var_num, None
    z = (float(s) - (1.0 if s > 0 else -1.0 if s < 0 else 0.0)) / math.sqrt(
        var_num / 18.0
    )
    return s, var_num, z


def test_mann_kendall_oracle(spark):
    from geomesa_spark.operators.hotspot import mann_kendall

    rng = np.random.default_rng(11)
    rows, series = [], {}
    for k in range(50):
        n = int(rng.integers(1, 13))
        vs = rng.integers(0, 5, n)  # small range -> heavy ties
        series[k] = [(t, int(v)) for t, v in enumerate(vs)]
        rows += [(k, t, int(v)) for t, v in series[k]]
    df = spark.createDataFrame(rows, "k long, t long, v long")
    got = {r.k: (r.n_bins, r.s, r.var_num, r.mk_z)
           for r in mann_kendall(df, ["k"], "t", "v").collect()}
    assert set(got) == set(series)
    for k, ser in series.items():
        s, vn, z = _mk_oracle(ser)
        nb, gs, gv, gz = got[k]
        assert (nb, gs, gv) == (len(ser), s, vn), k
        # identical IEEE sequence: one division, one sqrt -> exact
        assert gz == z, k


def test_emerging_hotspots_patterns(spark):
    """Engineered corpus: one cell ramps up (intensifying), one is
    hot only in the final bucket (new), one only early
    (formerly_hot) — verified against an independent python
    pipeline (ST-Gi* + Mann-Kendall + the classification rules)."""
    from geomesa_spark.operators.hotspot import emerging_hotspots

    rng = np.random.default_rng(23)
    DAY = 86400
    lons, lats, ts = [], [], []

    def put(lon, lat, day, cnt):
        lons.extend(lon + rng.uniform(-0.5, 0.5, cnt))
        lats.extend(lat + rng.uniform(-0.5, 0.5, cnt))
        ts.extend(rng.integers(day * DAY, (day + 1) * DAY, cnt))

    for d, c in enumerate([2, 4, 8, 16, 32, 64]):
        put(10.0, 20.0, d, c)          # ramp -> intensifying
    put(-60.0, -30.0, 5, 60)           # last day only -> new
    put(120.0, 40.0, 0, 60)            # first day only -> formerly_hot
    for d in range(6):                 # sparse background
        put_lon = rng.uniform(-170, 170, 25)
        put_lat = rng.uniform(-80, 80, 25)
        lons.extend(put_lon)
        lats.extend(put_lat)
        ts.extend(rng.integers(d * DAY, (d + 1) * DAY, 25))

    df = spark.createDataFrame(
        list(zip([float(x) for x in lons], [float(y) for y in lats],
                 [int(t) for t in ts])),
        "lon double, lat double, es long",
    )
    got = {(r.x, r.y): r for r in emerging_hotspots(
        df, "es", bits=5, ring=1, time_bucket_s=DAY, time_ring=1
    ).collect()}

    # independent python pipeline
    n = 1 << 5
    la, lo, ta = np.asarray(lats), np.asarray(lons), np.asarray(ts)
    xs = np.clip(np.floor((lo + 180.0) / 360.0 * n), 0, n - 1).astype(int)
    ys = np.clip(np.floor((la + 90.0) / 180.0 * n), 0, n - 1).astype(int)
    tb = (ta // DAY).astype(int)
    bins = {}
    for k in zip(xs, ys, tb):
        bins[k] = bins.get(k, 0) + 1
    N, W, Q = len(bins), sum(bins.values()), sum(v * v for v in bins.values())
    mean = W / N
    sd = math.sqrt(Q / N - mean * mean)
    gi = {}
    for (x, y, t), v in bins.items():
        nn = ns = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dt in (-1, 0, 1):
                    k = ((x + dx) % n, y + dy, t + dt)
                    if 0 <= k[1] < n and k in bins:
                        nn += 1
                        ns += bins[k]
        gi[(x, y, t)] = (ns - mean * nn) / (
            sd * math.sqrt((N * nn - nn * nn) / (N - 1.0))
        )
    last_tb = max(t for _, _, t in bins)
    exp = {}
    for (x, y) in {(x, y) for x, y, _ in bins}:
        ser = [(t, v) for (bx, by, t), v in bins.items()
               if (bx, by) == (x, y)]
        s, vn, z = _mk_oracle(ser)
        hots = [t for (t, _) in ser if gi[(x, y, t)] >= 1.96]
        n_hot, last_hot = len(hots), int(last_tb in hots)
        if last_hot and n_hot == 1:
            pat = "new"
        elif last_hot and z is not None and z >= 1.96:
            pat = "intensifying"
        elif last_hot and z is not None and z <= -1.96:
            pat = "diminishing"
        elif last_hot:
            pat = "persistent"
        elif n_hot > 0:
            pat = "formerly_hot"
        else:
            pat = "none"
        exp[(x, y)] = (len(ser), s, vn, n_hot, last_hot, pat)

    assert set(got) == set(exp)
    for k, (nb, s, vn, n_hot, last_hot, pat) in exp.items():
        r = got[k]
        assert (r.n_bins, r.s, r.var_num) == (nb, s, vn), k
        assert (r.n_hot, r.last_hot, r.pattern) == (n_hot, last_hot, pat), k

    # the three engineered cells land on their intended labels
    def cell(lon, lat):
        return (int(np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1)),
                int(np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, n - 1)))

    assert got[cell(10.0, 20.0)].pattern == "intensifying"
    assert got[cell(-60.0, -30.0)].pattern == "new"
    assert got[cell(120.0, 40.0)].pattern == "formerly_hot"


def test_emerging_plan_no_python(spark):
    from geomesa_spark.operators.hotspot import emerging_hotspots

    df = spark.createDataFrame(
        [(0.0, 0.0, 0), (1.0, 1.0, 86400)], "lon double, lat double, es long"
    )
    plan = (
        emerging_hotspots(df, "es", bits=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan


def test_sen_slope(spark):
    """Theil-Sen vs a brute python median of pairwise slopes: odd
    and even pair counts, ties, a single-bin key (NULL), and exact
    engineered slopes."""
    import numpy as np

    from geomesa_spark.operators.hotspot import sen_slope

    rows = []
    # key a: strict linear trend v = 3t -> sen exactly 3
    for t in range(6):
        rows.append(("a", t, 3 * t))
    # key b: noisy with duplicates/ties
    rng = np.random.default_rng(5)
    for t in range(9):
        rows.append(("b", t, int(rng.integers(0, 7))))
    # key c: two bins (one pair, even-median trivial)
    rows += [("c", 0, 10), ("c", 5, 0)]
    # key d: single bin -> no pair -> absent
    rows += [("d", 3, 1)]
    df = spark.createDataFrame(rows, "k string, tb long, w long")
    got = {r.k: r for r in sen_slope(df, ["k"], "tb", "w").collect()}

    def brute(kv):
        sl = sorted(
            (vj - vi) / (tj - ti)
            for i, (ti, vi) in enumerate(kv)
            for tj, vj in kv
            if tj > ti
        )
        m = len(sl)
        return (sl[m // 2] if m % 2 else
                (sl[m // 2 - 1] + sl[m // 2]) / 2.0), m

    data = {}
    for k, t, v in rows:
        data.setdefault(k, []).append((t, v))
    for k in ("a", "b", "c"):
        want, m = brute(data[k])
        assert got[k].n_pairs == m, k
        assert got[k].sen == want, (k, got[k].sen, want)
    assert got["a"].sen == 3.0
    assert "d" not in got


def test_sen_slope_rejects_float_values(spark):
    """Review fix: a float value column would silently truncate —
    raise instead (the idw_grid fixed-mode contract)."""
    from geomesa_spark.operators.hotspot import sen_slope

    df = spark.createDataFrame(
        [("a", 0, 1.5), ("a", 1, 2.5)], "k string, tb long, w double")
    with pytest.raises(ValueError, match="integral"):
        sen_slope(df, ["k"], "tb", "w")
