"""Hexagonal binning: axial hex-grid cell assignment as column ops.

The hex-density map is the standard alternative to square tiles
(uniform neighbor distance, no diagonal-adjacency artifacts — the
reason H3 exists).  This is NOT an H3 port: it is a flat planar
pointy-top hex lattice in coordinate units (adequate for regional
analytics; pair with an equal-area projection for global fairness),
chosen because every step is exact-double arithmetic expressible
identically in any engine.

Algorithm (Red Blob Games' axial/cube formulation, public domain):
fractional axial coordinates

    q = (SQRT3_3·x − THIRD·y) / size        r = (TWO_THIRDS·y) / size

then cube rounding (x=q, z=r, y=−x−z; round each; re-derive the
axis with the largest rounding error so x+y+z = 0).  Rounding is
written as floor(v + 0.5) — floor is exact IEEE and identical in
every engine, sidestepping round()'s HALF_UP/HALF_EVEN dialect
differences.  Constants are inlined with full repr so the Spark
column expression and the SQL oracle fold the same doubles.

`hex_cell_cols` returns (hq, hr) integer axial cells;
`hex_center_cols` inverts to the cell center; `hex_cell_sql` emits
the equivalent SQL (the shared-expression gate convention);
`hex_cell_np` is the numpy twin.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "hex_cell_cols", "hex_center_cols", "hex_cell_sql", "hex_cell_np",
]

SQRT3_3 = math.sqrt(3.0) / 3.0
TWO_THIRDS = 2.0 / 3.0
THIRD = 1.0 / 3.0
SQRT3 = math.sqrt(3.0)


def _round_col(v: Column) -> Column:
    return F.floor(v + F.lit(0.5))


def hex_cell_cols(
    x: Column, y: Column, size: float
) -> tuple[Column, Column]:
    """Axial hex cell (hq, hr) as long columns; `size` = hex
    circumradius in coordinate units."""
    s = float(size)
    q = (F.lit(SQRT3_3) * x - F.lit(THIRD) * y) / F.lit(s)
    r = (F.lit(TWO_THIRDS) * y) / F.lit(s)
    cy = -q - r
    rx, ry, rz = _round_col(q), _round_col(cy), _round_col(r)
    dx = F.abs(rx - q)
    dy = F.abs(ry - cy)
    dz = F.abs(rz - r)
    hq = F.when((dx > dy) & (dx > dz), -ry - rz).otherwise(rx)
    hr = F.when(
        (dx > dy) & (dx > dz), rz
    ).when(dy > dz, rz).otherwise(-rx - ry)
    return hq.cast("long"), hr.cast("long")


def hex_center_cols(
    hq: Column, hr: Column, size: float
) -> tuple[Column, Column]:
    """Invert: the (x, y) center of an axial cell."""
    s = float(size)
    cx = F.lit(s) * (F.lit(SQRT3) * hq + F.lit(SQRT3) / F.lit(2.0) * hr)
    cy = F.lit(s) * (F.lit(1.5) * hr)
    return cx, cy


def hex_cell_sql(x: str, y: str, size: float) -> tuple[str, str]:
    """The SAME arithmetic as SQL text (evaluated verbatim by any
    engine with IEEE doubles — the canonical-expression gate
    convention). Returns (hq_sql, hr_sql)."""
    s = float(size)
    q = f"(({SQRT3_3!r} * {x} - {THIRD!r} * {y}) / {s!r})"
    r = f"(({TWO_THIRDS!r} * {y}) / {s!r})"
    cy = f"(-{q} - {r})"
    rx = f"floor({q} + 0.5)"
    ry = f"floor({cy} + 0.5)"
    rz = f"floor({r} + 0.5)"
    dx = f"abs({rx} - {q})"
    dy = f"abs({ry} - {cy})"
    dz = f"abs({rz} - {r})"
    big_x = f"({dx} > {dy} AND {dx} > {dz})"
    hq = (
        f"CAST(CASE WHEN {big_x} THEN -{ry} - {rz} ELSE {rx} END AS BIGINT)"
    )
    hr = (
        f"CAST(CASE WHEN {big_x} THEN {rz}"
        f" WHEN {dy} > {dz} THEN {rz}"
        f" ELSE -{rx} - {ry} END AS BIGINT)"
    )
    return hq, hr


def hex_cell_np(
    x: np.ndarray, y: np.ndarray, size: float
) -> tuple[np.ndarray, np.ndarray]:
    """numpy twin (bit-identical to the column form)."""
    s = float(size)
    q = (SQRT3_3 * np.asarray(x, dtype=np.float64)
         - THIRD * np.asarray(y, dtype=np.float64)) / s
    r = (TWO_THIRDS * np.asarray(y, dtype=np.float64)) / s
    cy = -q - r
    rx = np.floor(q + 0.5)
    ry = np.floor(cy + 0.5)
    rz = np.floor(r + 0.5)
    dx = np.abs(rx - q)
    dy = np.abs(ry - cy)
    dz = np.abs(rz - r)
    big_x = (dx > dy) & (dx > dz)
    big_y = ~big_x & (dy > dz)
    hq = np.where(big_x, -ry - rz, rx)
    hr = np.where(big_x, rz, np.where(big_y, rz, -rx - ry))
    return hq.astype(np.int64), hr.astype(np.int64)
