"""Kalman track smoothing: constant-velocity filter + RTS smoother.

GPS fixes are noisy; downstream consumers (map matching, flow
fields, speed profiling) want the denoised trajectory and its
velocity estimate.  The classic answer is a per-axis
constant-velocity Kalman filter with white-acceleration process
noise, followed by the Rauch–Tung–Striebel backward smoother —
sequential by construction, so this is one of the engine's few
per-group Python escape hatches (the ``simplify_tracks`` /
``dtw_join`` contract: ``applyInPandas`` on the track key, numpy
inside, never corpus-wide Python).

Model (per axis, axes independent — diagonal noise):

    state  [x, v];  F = [[1, dt], [0, 1]]
    Q      = accel_var · [[dt⁴/4, dt³/2], [dt³/2, dt²]]
    z      = x + N(0, meas_var)

Coordinates are planar degrees (the exact-double oracle-mode metric
the track layer documents; smoothing is local, so curvature never
matters at fix spacing).  Dateline-straddling tracks must be
shifted/split by the caller — a smoother that averaged across a
±180 jump would hallucinate positions; ``max_gap_s`` splits are the
supported outage mechanism.

Rows are PRESERVED, never filtered: every input row comes back with
four added columns (smooth_lon, smooth_lat, v_lon, v_lat).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["kalman_smooth", "kalman_np"]


def kalman_np(
    ts: np.ndarray,
    z: np.ndarray,
    meas_var: float,
    accel_var: float,
) -> tuple[np.ndarray, np.ndarray]:
    """One-axis constant-velocity Kalman + RTS over ONE gap-free
    segment (ts ascending).  Returns (smoothed positions, smoothed
    velocities).  Explicit 2×2 scalar algebra — the numpy twin the
    pytest oracle cross-checks against a matrix-form implementation.
    """
    n = len(z)
    # filtered / predicted moments per step
    xf = np.empty((n, 2))
    pf = np.empty((n, 3))  # symmetric P as (p00, p01, p11)
    xp = np.empty((n, 2))
    pp = np.empty((n, 3))
    # init: position = first fix, velocity 0 with wide prior
    x0, v0 = float(z[0]), 0.0
    p00, p01, p11 = float(meas_var), 0.0, float(meas_var) * 1000.0
    xp[0] = (x0, v0)
    pp[0] = (p00, p01, p11)
    for k in range(n):
        if k:
            dt = float(ts[k] - ts[k - 1])
            x0 = xf[k - 1, 0] + xf[k - 1, 1] * dt
            v0 = xf[k - 1, 1]
            f00, f01, f11 = pf[k - 1]
            # F P F^T for F = [[1, dt], [0, 1]]
            p00 = f00 + dt * (f01 + f01) + dt * dt * f11
            p01 = f01 + dt * f11
            p11 = f11
            q = float(accel_var)
            p00 += q * dt ** 4 / 4.0
            p01 += q * dt ** 3 / 2.0
            p11 += q * dt ** 2
            xp[k] = (x0, v0)
            pp[k] = (p00, p01, p11)
        # update with z[k]
        s = p00 + float(meas_var)
        k0 = p00 / s
        k1 = p01 / s
        innov = float(z[k]) - x0
        xf[k] = (x0 + k0 * innov, v0 + k1 * innov)
        pf[k] = (
            (1.0 - k0) * p00,
            (1.0 - k0) * p01,
            p11 - k1 * p01,
        )
        p00, p01, p11 = pf[k]
        x0, v0 = xf[k]
    # RTS backward (positions/velocities only; the smoothed
    # covariances are not propagated — nothing downstream reads them)
    xs = xf.copy()
    for k in range(n - 2, -1, -1):
        dt = float(ts[k + 1] - ts[k])
        f00, f01, f11 = pf[k]
        # C = P_k F^T inv(P'_{k+1})
        a00 = f00 + dt * f01  # (P F^T)[0,0]
        a01 = f01             # (P F^T)[0,1]
        a10 = f01 + dt * f11
        a11 = f11
        q00, q01, q11 = pp[k + 1]
        det = q00 * q11 - q01 * q01
        i00, i01, i11 = q11 / det, -q01 / det, q00 / det
        c00 = a00 * i00 + a01 * i01
        c01 = a00 * i01 + a01 * i11
        c10 = a10 * i00 + a11 * i01
        c11 = a10 * i01 + a11 * i11
        dx0 = xs[k + 1, 0] - xp[k + 1, 0]
        dx1 = xs[k + 1, 1] - xp[k + 1, 1]
        xs[k, 0] = xf[k, 0] + c00 * dx0 + c01 * dx1
        xs[k, 1] = xf[k, 1] + c10 * dx0 + c11 * dx1
        # (smoothed covariances kept implicit; positions/velocities
        # are the product)
    return xs[:, 0], xs[:, 1]


def kalman_smooth(
    df: DataFrame,
    track_col: str = "track",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    meas_std: float = 1e-4,
    accel_std: float = 1e-6,
    max_gap_s: float | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Smooth every track's fixes (see module docstring).

    `meas_std` — GPS noise, degrees (1e-4 ≈ 11 m at the equator);
    `accel_std` — process white acceleration, degrees/s² (how fast
    velocity is allowed to change; small = stiffer smoothing);
    `max_gap_s` — a time gap larger than this RESETS the filter
    (each maximal gap-free run smooths independently — no
    hallucinated positions across outages).

    Returns all input columns + (smooth_lon, smooth_lat, v_lon,
    v_lat), one output row per input row."""
    if meas_std <= 0 or accel_std <= 0:
        raise ValueError("meas_std and accel_std must be positive")
    if max_gap_s is not None and max_gap_s <= 0:
        raise ValueError("max_gap_s must be positive")
    mv = float(meas_std) ** 2
    av = float(accel_std) ** 2
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("smooth_lon", T.DoubleType()),
            T.StructField("smooth_lat", T.DoubleType()),
            T.StructField("v_lon", T.DoubleType()),
            T.StructField("v_lat", T.DoubleType()),
        ]
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(
            drop=True
        )
        ts = pdf[ts_col].to_numpy(dtype=np.float64)
        lon = pdf[lon_col].to_numpy(dtype=np.float64)
        lat = pdf[lat_col].to_numpy(dtype=np.float64)
        if max_gap_s is None:
            bounds = [0, len(ts)]
        else:
            cuts = np.nonzero(np.diff(ts) > float(max_gap_s))[0] + 1
            bounds = [0, *cuts.tolist(), len(ts)]
        sx = np.empty_like(lon)
        sy = np.empty_like(lat)
        vx = np.empty_like(lon)
        vy = np.empty_like(lat)
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            sx[b0:b1], vx[b0:b1] = kalman_np(ts[b0:b1], lon[b0:b1], mv, av)
            sy[b0:b1], vy[b0:b1] = kalman_np(ts[b0:b1], lat[b0:b1], mv, av)
        out = pdf.copy()
        out["smooth_lon"] = sx
        out["smooth_lat"] = sy
        out["v_lon"] = vx
        out["v_lat"] = vy
        return out

    return df.groupBy(track_col).applyInPandas(smooth, schema=schema)
