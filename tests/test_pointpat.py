"""Point-pattern statistics: brute-force oracle parity + plan shape."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.pointpat import (
    colocation_pi,
    knox_test,
    ripley_k,
)


def _corpus(n=400, seed=7):
    rng = np.random.default_rng(seed)
    # half clustered (20 blobs), half uniform background
    cx = rng.uniform(-5, 5, 20)
    cy = rng.uniform(-5, 5, 20)
    k = rng.integers(0, 20, n // 2)
    lon = np.concatenate([
        cx[k] + rng.normal(0, 0.05, n // 2),
        rng.uniform(-6, 6, n - n // 2),
    ])
    lat = np.concatenate([
        cy[k] + rng.normal(0, 0.05, n // 2),
        rng.uniform(-6, 6, n - n // 2),
    ])
    t = rng.uniform(0, 100000, n)
    cat = rng.choice(["a", "b", "c"], n, p=[0.5, 0.3, 0.2])
    return [
        (i, float(lon[i]), float(lat[i]), float(t[i]), str(cat[i]))
        for i in range(n)
    ]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, lon double, lat double, t double, cat string"
    )


def test_ripley_k_vs_brute(spark):
    rows = _corpus()
    n = len(rows)
    R_MAX, BINS, AREA = 0.8, 8, 144.0
    out = {r["bin"]: r for r in ripley_k(
        _df(spark, rows), "id", R_MAX, BINS, AREA
    ).collect()}
    assert set(out) == set(range(1, BINS + 1))

    pts = np.array([(r[1], r[2]) for r in rows])
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    iu = np.triu_indices(n, 1)
    # only pairs the operator mines (d2 <= r_max^2, eps_pairs filter)
    d2p = d2[iu][d2[iu] <= R_MAX * R_MAX]
    dr = R_MAX / BINS
    bins = np.ceil(np.sqrt(d2p) / dr).clip(1, BINS)
    for b in range(1, BINS + 1):
        exp_bin = int(np.sum(bins == b))
        exp_cum = int(np.sum(bins <= b))
        r = out[b]
        assert r["n_pairs"] == exp_bin
        assert r["cum_pairs"] == exp_cum
        k = AREA * 2.0 * r["cum_pairs"] / (n * (n - 1.0))
        assert r["k_est"] == pytest.approx(k, rel=1e-12)
        assert r["l_est"] == pytest.approx(math.sqrt(k / math.pi), rel=1e-12)
        assert r["r"] == pytest.approx(b * dr, rel=1e-12)
    # the clustered corpus reads clustered: L(r) - r > 0 at small r
    assert out[1]["l_est"] > out[1]["r"]


def test_knox_vs_brute(spark):
    rows = _corpus(n=300, seed=11)
    n = len(rows)
    DELTA, TAU = 0.5, 9000.0
    got = knox_test(_df(spark, rows), "id", "t", DELTA, TAU).collect()
    assert len(got) == 1
    g = got[0]
    pts = np.array([(r[1], r[2]) for r in rows])
    ts = np.array([r[3] for r in rows])
    iu = np.triu_indices(n, 1)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)[iu]
    dt = np.abs(ts[:, None] - ts[None, :])[iu]
    X = int(np.sum(d2 <= DELTA * DELTA))
    Y = int(np.sum(dt <= TAU))
    O = int(np.sum((d2 <= DELTA * DELTA) & (dt <= TAU)))
    T = n * (n - 1) // 2
    assert (g["n_points"], g["pairs_total"]) == (n, T)
    assert (g["space_pairs"], g["time_pairs"], g["st_pairs"]) == (X, Y, O)
    assert g["expected_st"] == pytest.approx(X * Y / T, rel=1e-12)
    assert g["knox_ratio"] == pytest.approx(O * T / (X * Y), rel=1e-12)


def test_colocation_vs_brute(spark):
    rows = _corpus(n=350, seed=23)
    R = 0.4
    got = {
        (r["cat_a"], r["cat_b"]): r
        for r in colocation_pi(_df(spark, rows), "id", "cat", R).collect()
    }
    pts = np.array([(r[1], r[2]) for r in rows])
    cats = np.array([r[4] for r in rows])
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    close = d2 <= R * R
    uniq = sorted(set(cats))
    exp = {}
    for a in uniq:
        for b in uniq:
            if a > b:
                continue
            n_a = int((cats == a).sum())
            n_b = int((cats == b).sum())
            ab = int(np.sum((cats == a) & close[:, cats == b].any(1)))
            ba = int(np.sum((cats == b) & close[:, cats == a].any(1)))
            if ab or ba:
                exp[(a, b)] = (n_a, n_b, ab, ba)
    assert set(got) == set(exp)
    for k, (n_a, n_b, ab, ba) in exp.items():
        r = got[k]
        assert (r["n_a"], r["n_b"]) == (n_a, n_b)
        assert (r["n_a_with_b"], r["n_b_with_a"]) == (ab, ba)
        assert r["pr_ab"] == pytest.approx(ab / n_a, rel=1e-12)
        assert r["pr_ba"] == pytest.approx(ba / n_b, rel=1e-12)
        assert r["pi"] == pytest.approx(min(ab / n_a, ba / n_b), rel=1e-12)


def test_pointpat_args_and_plans(spark):
    df = _df(spark, _corpus(n=40, seed=3))
    for bad in (
        lambda: ripley_k(df, "id", -1.0, 4, 1.0),
        lambda: ripley_k(df, "id", 1.0, 0, 1.0),
        lambda: ripley_k(df, "id", 1.0, 4, 0.0),
        lambda: knox_test(df, "id", "t", 0.0, 1.0),
        lambda: knox_test(df, "id", "t", 1.0, -1.0),
        lambda: colocation_pi(df, "id", "cat", 0.0),
    ):
        with pytest.raises(ValueError):
            bad()
    for frame in (
        ripley_k(df, "id", 0.5, 4, 144.0),
        knox_test(df, "id", "t", 0.5, 1000.0),
        colocation_pi(df, "id", "cat", 0.5),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
        assert "CartesianProduct" not in plan
        # BroadcastNestedLoopJoin appears only as the intended
        # single-row stats crossJoin (the hotspot convention)


def test_ripley_cross_k_vs_brute(spark):
    rows = _corpus(n=380, seed=31)
    n = len(rows)
    R_MAX, BINS, AREA = 0.9, 6, 144.0
    from geomesa_spark.operators.pointpat import ripley_cross_k

    out = {r["bin"]: r for r in ripley_cross_k(
        _df(spark, rows), "id", "cat", "a", "b", R_MAX, BINS, AREA
    ).collect()}
    assert set(out) == set(range(1, BINS + 1))

    pts = np.array([(r[1], r[2]) for r in rows])
    cats = np.array([r[4] for r in rows])
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    ia = np.where(cats == "a")[0]
    ib = np.where(cats == "b")[0]
    n_a, n_b = len(ia), len(ib)
    dab = d2[np.ix_(ia, ib)].ravel()
    dab = dab[dab <= R_MAX * R_MAX]
    dr = R_MAX / BINS
    bins = np.ceil(np.sqrt(dab) / dr).clip(1, BINS)
    for b in range(1, BINS + 1):
        r = out[b]
        assert r["n_pairs"] == int((bins == b).sum())
        assert r["cum_pairs"] == int((bins <= b).sum())
        k = AREA * r["cum_pairs"] / (n_a * float(n_b))
        assert r["k_est"] == pytest.approx(k, rel=1e-12)
        assert r["l_est"] == pytest.approx(math.sqrt(k / math.pi), rel=1e-12)
    with pytest.raises(ValueError):
        ripley_cross_k(_df(spark, rows), "id", "cat", "a", "a",
                       R_MAX, BINS, AREA)


def test_space_time_k_vs_brute(spark):
    rows = _corpus(n=320, seed=41)
    n = len(rows)
    from geomesa_spark.operators.pointpat import space_time_k

    R_MAX, TAU, NR, NT, AREA, TLEN = 0.8, 20000.0, 4, 3, 144.0, 100000.0
    out = {(r["rb"], r["tb"]): r for r in space_time_k(
        _df(spark, rows), "id", "t", R_MAX, TAU, NR, NT, AREA, TLEN
    ).collect()}
    assert set(out) == {(a, b) for a in range(1, NR + 1)
                        for b in range(1, NT + 1)}
    pts = np.array([(r[1], r[2]) for r in rows])
    ts = np.array([r[3] for r in rows])
    iu = np.triu_indices(n, 1)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)[iu]
    dt = np.abs(ts[:, None] - ts[None, :])[iu]
    keep = (d2 <= R_MAX * R_MAX) & (dt <= TAU)
    dr, dw = R_MAX / NR, TAU / NT
    rb = np.ceil(np.sqrt(d2[keep]) / dr).clip(1, NR)
    tb = np.ceil(dt[keep] / dw).clip(1, NT)
    for (a, b), r in out.items():
        assert r["n_pairs"] == int(((rb == a) & (tb == b)).sum())
        cum = int(((rb <= a) & (tb <= b)).sum())
        assert r["cum_pairs"] == cum
        k = AREA * TLEN * 2.0 * cum / (n * (n - 1.0))
        assert r["k_est"] == pytest.approx(k, rel=1e-12)
        assert r["r"] == pytest.approx(a * dr, rel=1e-12)
        assert r["tau"] == pytest.approx(b * dw, rel=1e-12)
    with pytest.raises(ValueError):
        space_time_k(_df(spark, rows), "id", "t", R_MAX, 0.0, 4, 3,
                     AREA, TLEN)


def test_g_function_vs_brute(spark):
    """nn_dist + g_function vs a numpy brute nearest-neighbor
    oracle, including censoring and the CSR/clustered ordering."""
    from geomesa_spark.operators.pointpat import g_function, nn_dist

    rows = _corpus()
    n = len(rows)
    R_MAX, BINS = 0.5, 5
    df = _df(spark, rows)

    pts = np.array([(r[1], r[2]) for r in rows])
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nn2 = d2.min(axis=1)

    # nn_dist: exact min d2 per point, censored beyond r_max
    got = {r["id"]: r for r in nn_dist(df, R_MAX, "id").collect()}
    exp_ids = {i for i in range(n) if nn2[i] <= R_MAX * R_MAX}
    assert set(got) == exp_ids
    for i in exp_ids:
        assert got[i]["nn_d2"] == nn2[i]
        assert got[i]["nn_dist"] == math.sqrt(nn2[i])

    out = {r["bin"]: r for r in g_function(
        df, R_MAX, BINS, "id").collect()}
    assert set(out) == set(range(1, BINS + 1))
    dr = R_MAX / BINS
    kept = np.sqrt(nn2[nn2 <= R_MAX * R_MAX])
    bins = np.ceil(kept / dr).clip(1, BINS)
    for b in range(1, BINS + 1):
        r = out[b]
        assert r["n_pts"] == int(np.sum(bins == b))
        assert r["cum_pts"] == int(np.sum(bins <= b))
        assert r["g_est"] == r["cum_pts"] / n
        assert r["r"] == pytest.approx(b * dr, rel=1e-12)
    # the clustered half pulls G above CSR at small r:
    # G_csr(r) = 1 - exp(-lambda * pi * r^2) over the 12x12 window
    lam = n / 144.0
    r1 = out[1]["r"]
    g_csr = 1.0 - math.exp(-lam * math.pi * r1 * r1)
    assert out[1]["g_est"] > g_csr

    with pytest.raises(ValueError):
        g_function(df, 0.0, 5, "id")
    with pytest.raises(ValueError):
        g_function(df, 1.0, 0, "id")
    plan = g_function(df, R_MAX, BINS, "id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_f_and_j_function_vs_brute(spark):
    """f_function/j_function vs numpy brute cross-NN, plus the
    CSR/clustered/inhibited J ordering."""
    from geomesa_spark.operators.pointpat import (
        f_function, j_function, probe_grid,
    )

    rows = _corpus()
    n = len(rows)
    R_MAX, BINS, NX, NY = 0.5, 5, 12, 12
    df = _df(spark, rows)
    ref = probe_grid(spark, (-6.0, -6.0, 6.0, 6.0), NX, NY)
    refs = ref.collect()
    assert len(refs) == NX * NY
    # grid geometry: first center at (-5.5, -5.5), steps of 1.0
    by_rid = {r.rid: (r.lon, r.lat) for r in refs}
    assert by_rid[0] == (-5.5, -5.5)
    assert by_rid[1] == (-4.5, -5.5)
    assert by_rid[NX] == (-5.5, -4.5)

    pts = np.array([(r[1], r[2]) for r in rows])
    rpts = np.array([by_rid[i] for i in range(NX * NY)])
    d2 = ((rpts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    nn2 = d2.min(axis=1)
    kept = np.sqrt(nn2[nn2 <= R_MAX * R_MAX])
    dr = R_MAX / BINS
    bins = np.ceil(kept / dr).clip(1, BINS)

    out = {r["bin"]: r for r in f_function(
        df, ref, R_MAX, BINS, "id").collect()}
    assert set(out) == set(range(1, BINS + 1))
    for b in range(1, BINS + 1):
        r = out[b]
        assert r["n_ref"] == int(np.sum(bins == b))
        assert r["cum_ref"] == int(np.sum(bins <= b))
        assert r["f_est"] == r["cum_ref"] / (NX * NY)

    # J: join of the two curves; brute both sides
    dpp = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(dpp, np.inf)
    gnn = np.sqrt(dpp.min(1))
    gk = gnn[gnn <= R_MAX]
    gbins = np.ceil(gk / dr).clip(1, BINS)
    jout = {r["bin"]: r for r in j_function(
        df, ref, R_MAX, BINS, "id").collect()}
    for b in range(1, BINS + 1):
        r = jout[b]
        cg, cf = int(np.sum(gbins <= b)), int(np.sum(bins <= b))
        assert (r["cum_pts"], r["cum_ref"]) == (cg, cf)
        if cf < NX * NY:
            want = ((n - cg) / n) / ((NX * NY - cf) / (NX * NY))
            assert r["j_est"] == want
        else:
            assert r["j_est"] is None
    # the clustered corpus: voids push F below G -> J < 1 at small r
    assert jout[2]["j_est"] is None or jout[2]["j_est"] < 1.0

    with pytest.raises(ValueError):
        probe_grid(spark, (0.0, 0.0, 1.0, 1.0), 0, 5)
    with pytest.raises(ValueError):
        probe_grid(spark, (1.0, 0.0, 1.0, 1.0), 5, 5)
    plan = j_function(df, ref, R_MAX, BINS, "id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
