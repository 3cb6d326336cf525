"""Kalman smoothing vs an independent matrix-form implementation."""

import numpy as np
import pytest

from geomesa_spark.operators.kalman import kalman_np, kalman_smooth


def _matrix_rts(ts, z, mv, av):
    """Independent oracle: textbook 2-state Kalman + RTS with
    explicit numpy matrices (np.linalg.inv) — a different code path
    from the scalar production form."""
    n = len(z)
    H = np.array([[1.0, 0.0]])
    R = np.array([[mv]])
    xf = np.zeros((n, 2)); Pf = np.zeros((n, 2, 2))
    xp = np.zeros((n, 2)); Pp = np.zeros((n, 2, 2))
    x = np.array([z[0], 0.0])
    P = np.array([[mv, 0.0], [0.0, mv * 1000.0]])
    for k in range(n):
        if k:
            dt = ts[k] - ts[k - 1]
            Fm = np.array([[1.0, dt], [0.0, 1.0]])
            Q = av * np.array([
                [dt ** 4 / 4.0, dt ** 3 / 2.0],
                [dt ** 3 / 2.0, dt ** 2],
            ])
            x = Fm @ xf[k - 1]
            P = Fm @ Pf[k - 1] @ Fm.T + Q
        xp[k], Pp[k] = x, P
        S = H @ P @ H.T + R
        K = P @ H.T @ np.linalg.inv(S)
        x = x + (K @ (np.array([[z[k]]]) - H @ x.reshape(2, 1))).ravel()
        P = (np.eye(2) - K @ H) @ P
        xf[k], Pf[k] = x, P
    xs = xf.copy()
    for k in range(n - 2, -1, -1):
        dt = ts[k + 1] - ts[k]
        Fm = np.array([[1.0, dt], [0.0, 1.0]])
        C = Pf[k] @ Fm.T @ np.linalg.inv(Pp[k + 1])
        xs[k] = xf[k] + C @ (xs[k + 1] - xp[k + 1])
    return xs[:, 0], xs[:, 1]


def test_kalman_np_vs_matrix_oracle():
    rng = np.random.default_rng(11)
    for trial in range(5):
        n = int(rng.integers(2, 60))
        ts = np.cumsum(rng.uniform(0.5, 30.0, n))
        z = np.cumsum(rng.normal(0, 0.01, n)) + rng.normal(0, 1e-4, n)
        mv, av = 1e-8, 1e-12
        gx, gv = kalman_np(ts, z, mv, av)
        ex, ev = _matrix_rts(ts, z, mv, av)
        assert np.allclose(gx, ex, rtol=0, atol=1e-12)
        assert np.allclose(gv, ev, rtol=0, atol=1e-12)
    # single fix: position = the fix, velocity = 0
    gx, gv = kalman_np(np.array([5.0]), np.array([3.3]), 1e-8, 1e-12)
    assert gx[0] == pytest.approx(3.3, abs=1e-9) and gv[0] == 0.0


def test_kalman_smooth_denoises(spark):
    """End-to-end: smoothing beats the raw fixes on a known
    trajectory; velocity estimate converges to truth; gap reset."""
    rng = np.random.default_rng(3)
    rows, truth = [], {}
    V = 0.001  # deg/s east
    for tk in range(6):
        y0 = float(tk)
        for i in range(120):
            t = 10.0 * i
            x_true = 0.01 * V * 0 + V * t
            lon = x_true + float(rng.normal(0, 1e-4))
            lat = y0 + float(rng.normal(0, 1e-4))
            rows.append((f"t{tk}", t, lon, lat))
            truth[(f"t{tk}", t)] = (x_true, y0)
    df = spark.createDataFrame(
        rows, "track string, ts double, lon double, lat double")
    out = kalman_smooth(
        df, meas_std=1e-4, accel_std=1e-7).collect()
    assert len(out) == len(rows)
    err_raw, err_sm, verr = [], [], []
    for r in out:
        xt, yt = truth[(r.track, r.ts)]
        err_raw.append((r.lon - xt) ** 2 + (r.lat - yt) ** 2)
        err_sm.append((r.smooth_lon - xt) ** 2 + (r.smooth_lat - yt) ** 2)
        if r.ts > 200:  # after convergence
            verr.append(abs(r.v_lon - V))
    assert np.mean(err_sm) < 0.25 * np.mean(err_raw)
    assert np.median(verr) < 0.2 * V

    # gap reset: two runs separated by an outage smooth independently
    seg = [("g", 0.0 + i, 0.0 + 0.001 * i, 0.0) for i in range(20)]
    seg += [("g", 10000.0 + i, 5.0 + 0.001 * i, 2.0) for i in range(20)]
    gdf = spark.createDataFrame(
        seg, "track string, ts double, lon double, lat double")
    got = {r.ts: r for r in kalman_smooth(
        gdf, meas_std=1e-4, accel_std=1e-7, max_gap_s=60.0).collect()}
    # the first fix after the gap starts fresh at its own position
    assert got[10000.0].smooth_lat == pytest.approx(2.0, abs=1e-3)
    assert got[19.0].smooth_lat == pytest.approx(0.0, abs=1e-3)

    with pytest.raises(ValueError):
        kalman_smooth(df, meas_std=0.0)
    with pytest.raises(ValueError):
        kalman_smooth(df, max_gap_s=-1.0)
