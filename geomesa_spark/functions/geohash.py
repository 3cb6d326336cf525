"""Base-32 geohash strings: encode / decode / rectangle cover.

Reference surface: geomesa-utils geohash package —
`GeoHash.scala` (apply/encode at arbitrary bit precision, base-32
string form, bounding-box decode) and `RectangleGeoHashIterator.scala`
(enumerate every geohash at a fixed precision touching a query
rectangle).  The reference builds hashes one bisection step at a time
per row; here the whole column is encoded with O(log bits) bitwise
ops (the same spread/interleave used for Z2 cells) entirely JVM-side
— no Python in the row path.

Bit layout (public geohash spec, matches GeoHash.scala:238-263):
total bits T = 5 * nchars, alternating lon,lat starting with lon at
the MOST significant bit; lon gets ceil(T/2) bits, lat floor(T/2).
With `spread(v)` placing bit i of v at bit 2i:

    T even:  z = spread(ix) << 1 | spread(iy)
    T odd :  z = spread(ix)      | spread(iy) << 1

then each 5-bit group of z maps to one char of the public base-32
alphabet (GeoHash.scala:30 `base32`).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from geomesa_spark.functions import cells as C

# public geohash alphabet (GeoHash.scala:30)
ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

MAX_CHARS = 12  # 60 bits — the spec's full precision

_COVER_CHUNK = 4096  # max in-row array length in geohash_cover_df


def _bits(nchars: int) -> tuple[int, int, int]:
    if not 1 <= nchars <= MAX_CHARS:
        raise ValueError(f"nchars must be in [1, {MAX_CHARS}], got {nchars}")
    total = 5 * nchars
    return total, (total + 1) // 2, total // 2


# ---------------------------------------------------------------------------
# Spark column encode / decode
# ---------------------------------------------------------------------------


def geohash_z(lon: Column, lat: Column, nchars: int) -> Column:
    """Interleaved geohash bits as a long (before base-32 rendering)."""
    total, lon_bits, lat_bits = _bits(nchars)
    ix = C.lon_to_x(lon, lon_bits)
    iy = C.lat_to_y(lat, lat_bits)
    sx, sy = C._spread2_col(ix), C._spread2_col(iy)
    if total % 2 == 0:
        return F.shiftleft(sx, 1).bitwiseOR(sy)
    return sx.bitwiseOR(F.shiftleft(sy, 1))


def _z_to_string(z: Column, nchars: int) -> Column:
    chars = [
        F.lit(ALPHABET).substr(
            (
                F.shiftrightunsigned(z, 5 * (nchars - 1 - i))
                .bitwiseAND(F.lit(31))
                .cast("int")
                + F.lit(1)
            ),
            F.lit(1),
        )
        for i in range(nchars)
    ]
    return F.concat(*chars)


def geohash_col(lon: Column, lat: Column, nchars: int) -> Column:
    """lon/lat columns -> geohash string at `nchars` precision.

    GeoHash.scala `apply(lon, lat, prec)` + `hash` (base-32 form),
    vectorized: one interleave + nchars substring lookups, all JVM.
    """
    return _z_to_string(geohash_z(lon, lat, nchars), nchars)


def geohash_decode_z(gh: Column, nchars: int) -> Column:
    """geohash string -> interleaved bits (inverse of _z_to_string).

    Unknown characters make the result NULL (instr returns 0 ->
    value -1 -> guarded below), matching GeoHash.scala's require().
    """
    vals = [
        F.instr(F.lit(ALPHABET), F.substring(gh, i + 1, 1)).cast("long")
        - F.lit(1)
        for i in range(nchars)
    ]
    z = F.lit(0).cast("long")
    bad = F.lit(False)
    for i, v in enumerate(vals):
        z = z.bitwiseOR(F.shiftleft(v, 5 * (nchars - 1 - i)))
        bad = bad | (v < 0)
    return F.when(bad | (F.length(gh) != nchars), F.lit(None)).otherwise(z)


def geohash_decode_xy(gh: Column, nchars: int) -> tuple[Column, Column]:
    """geohash string -> (ix, iy) integer grid coords (lon/lat cells).

    GeoHash.scala decode: the cell's grid position at lon_bits /
    lat_bits resolution; bounds follow as ix * 360/2^lon_bits - 180.
    """
    total, _, _ = _bits(nchars)
    z = geohash_decode_z(gh, nchars)
    if total % 2 == 0:
        ix = C.squash2_col(F.shiftrightunsigned(z, 1))
        iy = C.squash2_col(z)
    else:
        ix = C.squash2_col(z)
        iy = C.squash2_col(F.shiftrightunsigned(z, 1))
    return ix, iy


def geohash_bounds(gh: Column, nchars: int) -> Column:
    """geohash string -> struct(lon_min, lon_max, lat_min, lat_max).

    The cell's bounding box (GeoHash.scala bbox/getPoint — the point
    form is the box center). Dyadic cell widths keep the arithmetic
    IEEE-exact for lon_bits/lat_bits <= 30.
    """
    _, lon_bits, lat_bits = _bits(nchars)
    ix, iy = geohash_decode_xy(gh, nchars)
    wx = 360.0 / (1 << lon_bits)
    wy = 180.0 / (1 << lat_bits)
    fx, fy = ix.cast("double"), iy.cast("double")
    return F.struct(
        (fx * F.lit(wx) - F.lit(180.0)).alias("lon_min"),
        ((fx + F.lit(1.0)) * F.lit(wx) - F.lit(180.0)).alias("lon_max"),
        (fy * F.lit(wy) - F.lit(90.0)).alias("lat_min"),
        ((fy + F.lit(1.0)) * F.lit(wy) - F.lit(90.0)).alias("lat_max"),
    )


# ---------------------------------------------------------------------------
# rectangle cover (RectangleGeoHashIterator analog, distributed)
# ---------------------------------------------------------------------------


def geohash_cover_df(
    spark: SparkSession,
    bbox: tuple[float, float, float, float],
    nchars: int,
    out_col: str = "geohash",
) -> DataFrame:
    """Every geohash at `nchars` precision whose cell intersects the
    closed bbox (xmin, ymin, xmax, ymax) — one row per hash.

    RectangleGeoHashIterator.scala walks the grid row-major on one
    thread; here the lon range is a distributed `spark.range` and
    each task explodes its lat run, so a continent-scale cover at
    fine precision parallelizes. Right/top edges exactly on a cell
    boundary include the touching cell (closed-box semantics, like
    the iterator's <= upper-corner loop).

    IDL note: callers pass pre-split boxes (xmin <= xmax); the
    planner's idl_safe_boxes handles wrap.
    """
    xmin, ymin, xmax, ymax = bbox
    if xmin > xmax or ymin > ymax:
        raise ValueError(f"bbox not normalized: {bbox}")
    total, lon_bits, lat_bits = _bits(nchars)
    nx, ny = 1 << lon_bits, 1 << lat_bits

    def lo(v, off, span, n):
        return min(n - 1, max(0, int(np.floor((v + off) / span * n))))

    ix0 = lo(xmin, 180.0, 360.0, nx)
    ix1 = lo(xmax, 180.0, 360.0, nx)
    iy0 = lo(ymin, 90.0, 180.0, ny)
    iy1 = lo(ymax, 90.0, 180.0, ny)

    # lat run exploded in bounded chunks: a single sequence(iy0, iy1)
    # materializes the whole run as ONE in-row array — at fine
    # precision over a tall box that is millions of longs per row,
    # blowing task memory. Two nested explodes keep every
    # intermediate array <= _COVER_CHUNK while emitting the same rows.
    rows = spark.range(ix0, ix1 + 1).withColumnRenamed("id", "ix")
    starts = rows.select(
        "ix",
        F.explode(
            F.sequence(F.lit(iy0), F.lit(iy1), F.lit(_COVER_CHUNK))
        ).alias("iy_start"),
    )
    grid = starts.select(
        "ix",
        F.explode(
            F.sequence(
                F.col("iy_start"),
                F.least(
                    F.col("iy_start") + F.lit(_COVER_CHUNK - 1), F.lit(iy1)
                ),
            )
        ).alias("iy"),
    )
    sx, sy = C._spread2_col(F.col("ix")), C._spread2_col(F.col("iy"))
    z = (
        F.shiftleft(sx, 1).bitwiseOR(sy)
        if total % 2 == 0
        else sx.bitwiseOR(F.shiftleft(sy, 1))
    )
    return grid.select(_z_to_string(z, nchars).alias(out_col))


# ---------------------------------------------------------------------------
# numpy twins (tests / driver-side decisions / pandas-UDF interior)
# ---------------------------------------------------------------------------


def geohash_encode_np(
    lon: np.ndarray, lat: np.ndarray, nchars: int
) -> np.ndarray:
    total, lon_bits, lat_bits = _bits(nchars)
    ix = np.clip(
        np.floor((np.asarray(lon) + 180.0) / 360.0 * (1 << lon_bits)),
        0,
        (1 << lon_bits) - 1,
    ).astype(np.uint64)
    iy = np.clip(
        np.floor((np.asarray(lat) + 90.0) / 180.0 * (1 << lat_bits)),
        0,
        (1 << lat_bits) - 1,
    ).astype(np.uint64)
    sx, sy = C._spread2_np(ix), C._spread2_np(iy)
    z = (sx << np.uint64(1)) | sy if total % 2 == 0 else sx | (sy << np.uint64(1))
    lut = np.frombuffer(ALPHABET.encode(), dtype=np.uint8)
    out = np.empty((len(z), nchars), dtype=np.uint8)
    for i in range(nchars):
        out[:, i] = lut[
            ((z >> np.uint64(5 * (nchars - 1 - i))) & np.uint64(31)).astype(
                np.int64
            )
        ]
    return out.view(f"S{nchars}").ravel().astype(str)


def geohash_decode_np(
    gh: np.ndarray, nchars: int
) -> tuple[np.ndarray, np.ndarray]:
    """geohash strings -> (ix, iy) grid coords; raises on bad chars."""
    total = 5 * nchars
    inv = np.full(128, -1, dtype=np.int64)
    for i, ch in enumerate(ALPHABET):
        inv[ord(ch)] = i
    b = (
        np.asarray(gh, dtype=f"S{nchars}")
        .view(np.uint8)
        .reshape(-1, nchars)
        .astype(np.int64)
    )
    vals = inv[b]
    if (vals < 0).any():
        raise ValueError("invalid geohash character")
    z = np.zeros(len(b), dtype=np.uint64)
    for i in range(nchars):
        z |= vals[:, i].astype(np.uint64) << np.uint64(5 * (nchars - 1 - i))
    if total % 2 == 0:
        ix, iy = C._squash2_np(z >> np.uint64(1)), C._squash2_np(z)
    else:
        ix, iy = C._squash2_np(z), C._squash2_np(z >> np.uint64(1))
    return ix.astype(np.int64), iy.astype(np.int64)


def geohash_bounds_np(gh: np.ndarray, nchars: int) -> np.ndarray:
    """geohash strings -> (n, 4) [lon_min, lon_max, lat_min, lat_max]."""
    _, lon_bits, lat_bits = _bits(nchars)
    ix, iy = geohash_decode_np(gh, nchars)
    wx, wy = 360.0 / (1 << lon_bits), 180.0 / (1 << lat_bits)
    return np.stack(
        [
            ix * wx - 180.0,
            (ix + 1) * wx - 180.0,
            iy * wy - 90.0,
            (iy + 1) * wy - 90.0,
        ],
        axis=1,
    )


def geohash_neighbors_np(gh: str, nchars: int) -> list[str]:
    """The 8 neighbors of one hash (TouchingGeoHashes.scala analog):
    decode to grid coords, offset, wrap lon, drop off-pole lat, and
    re-encode — no per-bit border tables."""
    _, lon_bits, lat_bits = _bits(nchars)
    nx, ny = 1 << lon_bits, 1 << lat_bits
    ix, iy = geohash_decode_np(np.array([gh]), nchars)
    out = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == dy == 0:
                continue
            jx, jy = (int(ix[0]) + dx) % nx, int(iy[0]) + dy
            if not 0 <= jy < ny:
                continue
            lon = (jx + 0.5) * 360.0 / nx - 180.0
            lat = (jy + 0.5) * 180.0 / ny - 90.0
            out.append(str(geohash_encode_np(np.array([lon]), np.array([lat]), nchars)[0]))
    return out
