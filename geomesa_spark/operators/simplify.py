"""Trajectory simplification: per-track point reduction.

A tracking corpus at 10^12 points is mostly redundant — a vehicle on
a straight road emits thousands of collinear fixes.  These operators
reduce each track to the points that carry shape information, the
standard preprocessing before tube-select / track rendering / trip
mining (the reference leaves this to GeoTools' client-side
``DouglasPeuckerSimplifier``; here it runs distributed).

This is the engine's ONE legitimate use of per-group Python
(``applyInPandas``): both algorithms are inherently sequential per
track (RDP recurses on the worst offender; radial keeps a running
anchor), so no fixed composition of window functions expresses them
— exactly the "custom operator" escape hatch the UDF policy reserves
for semantics built-ins can't express (COVERAGE §2.10).  The group
key is the track, so per-task memory is one track's points (the same
bound as every track window in ``tracks.py``), Arrow moves the
batches, and the inner loops are numpy-vectorized over whole
segments — per-row Python never runs.

Both algorithms use planar degree geometry (the tolerance is in
coordinate units): simplification is a rendering/storage heuristic,
and the oracle tests pin the exact planar semantics.  Split tracks
at the antimeridian first (geometry.normalize_idl conventions) if
±180 wraps matter for your data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["simplify_tracks", "rdp_keep_np", "radial_keep_np"]


def rdp_keep_np(lon: np.ndarray, lat: np.ndarray, tol: float) -> np.ndarray:
    """Ramer-Douglas-Peucker keep mask (iterative stack, numpy
    perpendicular distances per segment — no per-point Python in the
    distance math). Endpoints always kept."""
    n = len(lon)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay, bx, by = lon[a], lat[a], lon[b], lat[b]
        px = lon[a + 1:b]
        py = lat[a + 1:b]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            # degenerate segment: distance to the (coincident) endpoints
            d2 = (px - ax) ** 2 + (py - ay) ** 2
        else:
            # perpendicular distance to the INFINITE line through a-b
            # (classic RDP; offsets beyond the endpoints still measure
            # against the line)
            cross = (px - ax) * dy - (py - ay) * dx
            d2 = cross * cross / seg2
        i = int(np.argmax(d2))
        if d2[i] > tol * tol:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def radial_keep_np(lon: np.ndarray, lat: np.ndarray, tol: float) -> np.ndarray:
    """Radial-distance decimation keep mask: keep a point when it is
    > tol from the LAST KEPT point (running anchor — sequential by
    definition). First and last points always kept."""
    n = len(lon)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = True
    ax, ay = lon[0], lat[0]
    t2 = tol * tol
    for i in range(1, n):
        d2 = (lon[i] - ax) ** 2 + (lat[i] - ay) ** 2
        if d2 > t2:
            keep[i] = True
            ax, ay = lon[i], lat[i]
    if n > 1:
        keep[-1] = True
    return keep


def simplify_tracks(
    df: DataFrame,
    track_col: str,
    ts_col: str,
    tolerance: float,
    lon_col: str = "lon",
    lat_col: str = "lat",
    algorithm: str = "rdp",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Return the subset of rows each track keeps after
    simplification (all input columns preserved — the span-invariant
    contract: rows are FILTERED, never altered).

    `tolerance` is in coordinate degrees. `algorithm`: 'rdp'
    (shape-preserving, the reference's client-side simplifier run
    distributed) or 'radial' (cheaper, density-capping)."""
    if algorithm not in ("rdp", "radial"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if tolerance < 0:
        raise ValueError("tolerance must be >= 0")
    fn = rdp_keep_np if algorithm == "rdp" else radial_keep_np
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    schema = df.schema

    def simplify(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        keep = fn(
            pdf[lon_col].to_numpy(dtype=np.float64),
            pdf[lat_col].to_numpy(dtype=np.float64),
            float(tolerance),
        )
        return pdf.loc[keep]

    return df.groupBy(track_col).applyInPandas(simplify, schema=schema)
