"""Z-order (Morton) space and space-time curve cell encoding.

Re-creates the reference's Z2/Z3 curves as *pure Spark column
expressions* (bitwise shift/and/or — stays inside whole-stage
codegen, no Python on the hot path) plus numpy twins used by the
driver-side cover planner and tests.

Reference parity:
- bit-interleave `split`/`combine`: geomesa-z3/src/main/scala/org/
  locationtech/geomesa/curve/Z3.scala:61-88 (magic-number spread)
- precision: 21 bits lon, 21 bits lat, 20 bits time-in-week —
  geomesa-z3/.../curve/SpaceFillingCurve.scala:30-33
- week chunking: epoch week prefix + seconds-in-current-week —
  geomesa-accumulo/.../data/tables/Z3Table.scala:40-51

The encoded cell is a `long` column; `week:int` is a separate
column used as the partition key (the analog of the reference's
2-byte epoch-week row-key prefix).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

XY_BITS = 21          # bits per spatial dimension (both Z2 and Z3)
T_BITS = 20           # bits for time-in-week (Z3)
XY_SIZE = 1 << XY_BITS
T_SIZE = 1 << T_BITS
SECONDS_IN_WEEK = 7 * 24 * 60 * 60  # 604800

# ---------------------------------------------------------------------------
# index-space normalization (lon/lat/time -> integer grid coordinates)
# ---------------------------------------------------------------------------


def lon_to_x(lon: Column, bits: int = XY_BITS) -> Column:
    """lon in [-180,180] -> integer in [0, 2^bits)."""
    n = 1 << bits
    ix = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n)))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), ix)).cast("long")


def lat_to_y(lat: Column, bits: int = XY_BITS) -> Column:
    n = 1 << bits
    iy = F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n)))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), iy)).cast("long")


def secs_in_week(dtg: Column) -> Column:
    """Seconds into the epoch week of `dtg` (Z3Table.scala:48-51).

    pmod, not %: Spark's % follows the sign, so pre-1970 timestamps
    (negative epoch seconds) would yield a negative offset that
    time_to_t clamps to index 0 — while week() and the planner's
    z3-range math use floor semantics and expect the offset near the
    TOP of that week, silently excluding matching rows."""
    es = F.unix_timestamp(dtg)
    return F.pmod(es, F.lit(SECONDS_IN_WEEK)).cast("long")


def week(dtg: Column) -> Column:
    """Epoch week number (the reference's 2-byte week prefix)."""
    return F.floor(F.unix_timestamp(dtg) / F.lit(SECONDS_IN_WEEK)).cast("int")


def time_to_t(sec_in_week: Column, bits: int = T_BITS) -> Column:
    n = 1 << bits
    it = F.floor(sec_in_week / F.lit(float(SECONDS_IN_WEEK)) * F.lit(float(n)))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), it)).cast("long")


# ---------------------------------------------------------------------------
# bit spreading (Spark columns) — Z3.scala:61-79 magic numbers
# ---------------------------------------------------------------------------

_SPREAD2 = [
    (32, 0x00000000FFFFFFFF),
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]

_SPREAD3 = [
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
]


def _spread2_col(x: Column) -> Column:
    x = x.bitwiseAND(F.lit(0x7FFFFFFF))
    for shift, mask in _SPREAD2:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def _spread3_col(x: Column) -> Column:
    x = x.bitwiseAND(F.lit(0x1FFFFF))
    for shift, mask in _SPREAD3:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def z2_combine(x: Column, y: Column) -> Column:
    """Interleave integer grid coords -> Z2 cell (42-bit long)."""
    return _spread2_col(x).bitwiseOR(F.shiftleft(_spread2_col(y), 1))


def z3_combine(x: Column, y: Column, t: Column) -> Column:
    """Interleave x/y/t -> Z3 cell (62-bit long), Z3.scala:83-88."""
    return (
        _spread3_col(x)
        .bitwiseOR(F.shiftleft(_spread3_col(y), 1))
        .bitwiseOR(F.shiftleft(_spread3_col(t), 2))
    )


def z2_cell(lon: Column, lat: Column, bits: int = XY_BITS) -> Column:
    """lon/lat columns -> Z2 cell id at `bits` per-dim resolution."""
    return z2_combine(lon_to_x(lon, bits), lat_to_y(lat, bits))


def z3_cell(lon: Column, lat: Column, dtg: Column) -> Column:
    """lon/lat/dtg columns -> (within-week) Z3 cell id."""
    return z3_combine(
        lon_to_x(lon), lat_to_y(lat), time_to_t(secs_in_week(dtg))
    )


def grid_snap_cols(
    lon: Column,
    lat: Column,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
) -> tuple[Column, Column]:
    """(i, j) pixel indices for a W×H grid over `bbox`, clamped to
    range — the ONE shared GridSnap.scala:21-100 analog (batch
    density, streaming density, and rasterization must snap
    identically or their grids silently diverge)."""
    xmin, ymin, xmax, ymax = bbox
    dx = (xmax - xmin) / width
    dy = (ymax - ymin) / height
    i = F.least(
        F.lit(width - 1),
        F.greatest(F.lit(0), F.floor((lon - F.lit(xmin)) / F.lit(dx))),
    ).cast("int")
    j = F.least(
        F.lit(height - 1),
        F.greatest(F.lit(0), F.floor((lat - F.lit(ymin)) / F.lit(dy))),
    ).cast("int")
    return i, j


def cell_parent(cell: Column, child_bits: int, parent_bits: int) -> Column:
    """Z2 parent cell: drop the low interleaved bits.

    The analog of the reference's geohash-prefix containment
    (coarser cell = key prefix, IndexSchema.scala geohash levels).
    """
    drop = 2 * (child_bits - parent_bits)
    return F.shiftrightunsigned(cell, drop)


# ---------------------------------------------------------------------------
# numpy twins (driver-side planner + tests; also used inside pandas UDFs)
# ---------------------------------------------------------------------------


def _spread2_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x7FFFFFFF)
    for shift, mask in _SPREAD2:
        x = (x | (x << np.uint64(shift))) & np.uint64(mask)
    return x


def _spread3_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x1FFFFF)
    for shift, mask in _SPREAD3:
        x = (x | (x << np.uint64(shift))) & np.uint64(mask)
    return x


_SQUASH2 = [
    (1, 0x3333333333333333),
    (2, 0x0F0F0F0F0F0F0F0F),
    (4, 0x00FF00FF00FF00FF),
    (8, 0x0000FFFF0000FFFF),
    (16, 0x00000000FFFFFFFF),
]

_SQUASH3 = [
    (2, 0x10C30C30C30C30C3),
    (4, 0x100F00F00F00F00F),
    (8, 0x1F0000FF0000FF),
    (16, 0x1F00000000FFFF),
    (32, 0x1FFFFF),
]


def squash2_col(z: Column) -> Column:
    """Column form of _squash2_np (inverse bit spread), JVM-side —
    the ONE shared de-interleave so the magic masks live beside
    their _SPREAD2/_SQUASH2 twins (a re-typed copy with one wrong
    mask would silently corrupt exact-cover filters). Use
    `squash2_col(cell)` for x and
    `squash2_col(shiftrightunsigned(cell, 1))` for y."""
    z = z.bitwiseAND(F.lit(0x5555555555555555))
    for shift, mask in _SQUASH2:
        z = z.bitwiseOR(F.shiftrightunsigned(z, shift)).bitwiseAND(F.lit(mask))
    return z


def _squash2_np(z: np.ndarray) -> np.ndarray:
    """Inverse of _spread2_np (de-interleave every other bit)."""
    z = np.asarray(z, dtype=np.uint64) & np.uint64(0x5555555555555555)
    for shift, mask in _SQUASH2:
        z = (z | (z >> np.uint64(shift))) & np.uint64(mask)
    return z


def _squash3_np(z: np.ndarray) -> np.ndarray:
    """Inverse of _spread3_np (Z3.scala:72-79 `combine`)."""
    z = np.asarray(z, dtype=np.uint64) & np.uint64(0x1249249249249249)
    for shift, mask in _SQUASH3:
        z = (z | (z >> np.uint64(shift))) & np.uint64(mask)
    return z


def z2_encode_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return (_spread2_np(x) | (_spread2_np(y) << np.uint64(1))).astype(np.int64)


def z2_decode_np(z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    z = np.asarray(z, dtype=np.uint64)
    return (
        _squash2_np(z).astype(np.int64),
        _squash2_np(z >> np.uint64(1)).astype(np.int64),
    )


def z3_encode_np(x: np.ndarray, y: np.ndarray, t: np.ndarray) -> np.ndarray:
    return (
        _spread3_np(x)
        | (_spread3_np(y) << np.uint64(1))
        | (_spread3_np(t) << np.uint64(2))
    ).astype(np.int64)


def z3_decode_np(z: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    z = np.asarray(z, dtype=np.uint64)
    return (
        _squash3_np(z).astype(np.int64),
        _squash3_np(z >> np.uint64(1)).astype(np.int64),
        _squash3_np(z >> np.uint64(2)).astype(np.int64),
    )


def lon_to_x_np(lon: np.ndarray, bits: int = XY_BITS) -> np.ndarray:
    n = 1 << bits
    ix = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * float(n))
    return np.clip(ix, 0, n - 1).astype(np.int64)


def lat_to_y_np(lat: np.ndarray, bits: int = XY_BITS) -> np.ndarray:
    n = 1 << bits
    iy = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * float(n))
    return np.clip(iy, 0, n - 1).astype(np.int64)


def time_to_t_np(sec_in_week: np.ndarray, bits: int = T_BITS) -> np.ndarray:
    n = 1 << bits
    it = np.floor(
        np.asarray(sec_in_week, dtype=np.float64) / float(SECONDS_IN_WEEK) * float(n)
    )
    return np.clip(it, 0, n - 1).astype(np.int64)


def x_to_lon_range(ix: np.ndarray, bits: int = XY_BITS) -> tuple[np.ndarray, np.ndarray]:
    """Grid coord -> [lon_min, lon_max) extent of that index column."""
    n = float(1 << bits)
    ix = np.asarray(ix, dtype=np.float64)
    return ix / n * 360.0 - 180.0, (ix + 1.0) / n * 360.0 - 180.0


def y_to_lat_range(iy: np.ndarray, bits: int = XY_BITS) -> tuple[np.ndarray, np.ndarray]:
    n = float(1 << bits)
    iy = np.asarray(iy, dtype=np.float64)
    return iy / n * 180.0 - 90.0, (iy + 1.0) / n * 180.0 - 90.0
