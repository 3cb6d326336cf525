"""Web-mercator XYZ tiles and Bing-style quadkeys.

The slippy-map grid every tile server speaks (z/x/y PNG pyramids,
Bing quadkeys, TMS): lon maps linearly, lat through the mercator
stretch y = (1 − ln(tan(π/4 + φ/2))/π)/2, clamped to the standard
±85.05112878° web-mercator band.  The quadkey is the z/x/y triple
as a base-4 string whose PREFIXES are ancestors — the same
containment-by-prefix property as the geohash strings
(functions/geohash.py), so a `startswith` or string BETWEEN selects
a tile's descendants.

Determinism contract (the s2.py convention): radians are ONE
correctly-rounded multiply by the shared DEG2RAD constant (Java's
toRadians divides by 180 first — a different last-ulp), the mercator
expression is built ONCE as SQL text and evaluated verbatim by Spark
(`F.expr`) and the DuckDB oracle, so only ln/tan themselves could
diverge — and a divergence flips a tile only when the true
coordinate sits within ~1e-16 of a 1/2^z boundary.

`tile_sql` returns the (tx, ty) SQL; `tile_cols`/`quadkey_col` are
the Spark column forms built FROM that SQL; `tile_np`/`quadkey_np`
are the numpy twins; `quadkey_to_tile` inverts the string.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tile_sql", "tile_cols", "quadkey_col", "quadkey_np",
    "tile_np", "quadkey_to_tile", "MAX_MERC_LAT",
]

DEG2RAD = 0.017453292519943295  # double nearest pi/180 (s2 shared)
PI = math.pi
PI_4 = math.pi / 4.0
MAX_MERC_LAT = 85.05112878


def tile_sql(lon: str, lat: str, z: int) -> tuple[str, str]:
    """(tx_sql, ty_sql) — the canonical shared expressions."""
    n = 1 << z
    clat = (
        f"greatest({-MAX_MERC_LAT!r}, least({MAX_MERC_LAT!r}, {lat}))"
    )
    tx = (
        f"CAST(greatest(0, least({n - 1}, "
        f"floor(({lon} + 180.0) / 360.0 * {float(n)!r}))) AS BIGINT)"
    )
    ty = (
        f"CAST(greatest(0, least({n - 1}, floor("
        f"(1.0 - ln(tan({PI_4!r} + ({clat} * {DEG2RAD!r}) / 2.0)) / {PI!r})"
        f" / 2.0 * {float(n)!r}))) AS BIGINT)"
    )
    return tx, ty


def tile_cols(lon: str, lat: str, z: int) -> tuple[Column, Column]:
    """(tx, ty) columns — F.expr over the SAME SQL text the oracle
    runs (lon/lat are column NAMES, the shared-expression gate
    convention)."""
    tx, ty = tile_sql(lon, lat, z)
    return F.expr(tx), F.expr(ty)


def quadkey_col(tx: Column, ty: Column, z: int) -> Column:
    """Base-4 quadkey string of a (tx, ty) tile at level z: digit k
    (MSB first) = ty bit << 1 | tx bit — prefix = ancestor."""
    if z == 0:
        return F.lit("")  # the root tile's quadkey is the empty string
    digits = [
        F.substring(
            F.lit("0123"),
            (
                F.shiftrightunsigned(ty, z - k).bitwiseAND(F.lit(1))
                * F.lit(2)
                + F.shiftrightunsigned(tx, z - k).bitwiseAND(F.lit(1))
                + F.lit(1)
            ).cast("int"),
            1,
        )
        for k in range(1, z + 1)
    ]
    return F.concat(*digits)


def tile_np(
    lon: np.ndarray, lat: np.ndarray, z: int
) -> tuple[np.ndarray, np.ndarray]:
    n = 1 << z
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64),
                  -MAX_MERC_LAT, MAX_MERC_LAT)
    tx = np.clip(np.floor((lon + 180.0) / 360.0 * float(n)), 0, n - 1)
    merc = (1.0 - np.log(np.tan(PI_4 + (lat * DEG2RAD) / 2.0)) / PI) / 2.0
    ty = np.clip(np.floor(merc * float(n)), 0, n - 1)
    return tx.astype(np.int64), ty.astype(np.int64)


def quadkey_np(tx: np.ndarray, ty: np.ndarray, z: int) -> list:
    out = []
    for a, b in zip(np.asarray(tx), np.asarray(ty)):
        s = ""
        for k in range(1, z + 1):
            s += "0123"[(((int(b) >> (z - k)) & 1) << 1)
                         | ((int(a) >> (z - k)) & 1)]
        out.append(s)
    return out


def quadkey_to_tile(qk: str) -> tuple[int, int, int]:
    """(z, tx, ty) from a quadkey string."""
    tx = ty = 0
    for ch in qk:
        d = int(ch)
        if not 0 <= d <= 3:
            raise ValueError(f"invalid quadkey digit {ch!r}")
        tx = (tx << 1) | (d & 1)
        ty = (ty << 1) | (d >> 1)
    return len(qk), tx, ty
