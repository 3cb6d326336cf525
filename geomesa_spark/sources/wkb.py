"""WKB (well-known binary) geometry codec.

The reference persists geometries as WKB inside Accumulo values
(``WKBUtils.scala`` wrapping JTS's WKBReader/Writer); a user
migrating stored data arrives with WKB bytes in parquet, not WKT
text.  This module decodes that column to the engine's WKT form
(which feeds ``geom_data.geom_table(_native)`` and every geometry
operator) and encodes back for export.

Implementation notes:

- The OGC WKB layout is public: per geometry, 1 byte byte-order
  (0=BE, 1=LE), uint32 type code (1..6 = Point/LineString/Polygon/
  MultiPoint/MultiLineString/MultiPolygon), then counts + float64
  coordinates.  EWKB's SRID flag (0x20000000) is accepted and the
  SRID skipped (the engine is EPSG:4326 throughout, like the
  reference's default CRS).
- Decode runs as ``mapInPandas`` over the binary column — the
  media.py Arrow-stage convention.  Per-row dispatch is Python (the
  format is variable-length and heterogeneous), but each ring's
  coordinate block is ONE ``np.frombuffer`` bulk read, so the hot
  loop is per-ring, not per-vertex.  Like the pure-Python Avro OCF
  reader, this is an ingest-boundary cost paid once, not a
  per-query path.
- Coordinates render with ``repr(float)`` — CPython's shortest
  round-trip form, value-exact through the WKT parsers (the
  convert/export convention).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["wkb_to_wkt_py", "wkt_to_wkb_py", "decode_wkb", "encode_wkb"]

_TYPES = {1: "POINT", 2: "LINESTRING", 3: "POLYGON",
          4: "MULTIPOINT", 5: "MULTILINESTRING", 6: "MULTIPOLYGON"}
_CODES = {v: k for k, v in _TYPES.items()}
_EWKB_SRID = 0x20000000
_EWKB_ZM = 0xC0000000  # EWKB Z/M high bits — rejected, never stripped


def _coords(buf: memoryview, off: int, n: int, lt: bool):
    dt = "<f8" if lt else ">f8"
    arr = np.frombuffer(buf, dtype=dt, count=2 * n, offset=off)
    return arr.reshape(n, 2), off + 16 * n


def _pts_txt(xy: np.ndarray) -> str:
    return ", ".join(f"{x!r} {y!r}" for x, y in xy.tolist())


def _parse(buf: memoryview, off: int) -> tuple[str, int]:
    lt = buf[off] == 1
    e = "<" if lt else ">"
    (code,) = struct.unpack_from(f"{e}I", buf, off + 1)
    off += 5
    if code & _EWKB_ZM:
        raise ValueError(
            f"unsupported WKB type 0x{code:08x}: EWKB Z/M dimensions"
            " (XY only)"
        )
    if code & _EWKB_SRID:
        off += 4  # skip SRID (engine is EPSG:4326 throughout)
        code &= ~_EWKB_SRID
    kind = _TYPES.get(code)
    if kind is None:
        # ISO WKB encodes Z/M/ZM as code + 1000/2000/3000
        raise ValueError(f"unsupported WKB geometry type code {code}"
                         " (XY only; Z/M unsupported)")
    if kind == "POINT":
        xy, off = _coords(buf, off, 1, lt)
        return f"POINT ({_pts_txt(xy)})", off
    if kind == "LINESTRING":
        (n,) = struct.unpack_from(f"{e}I", buf, off)
        xy, off = _coords(buf, off + 4, n, lt)
        return f"LINESTRING ({_pts_txt(xy)})", off
    if kind == "POLYGON":
        (nr,) = struct.unpack_from(f"{e}I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(f"{e}I", buf, off)
            xy, off = _coords(buf, off + 4, n, lt)
            rings.append(f"({_pts_txt(xy)})")
        return "POLYGON (" + ", ".join(rings) + ")", off
    # MULTI*: each member is a full nested WKB geometry
    (nm,) = struct.unpack_from(f"{e}I", buf, off)
    off += 4
    parts = []
    for _ in range(nm):
        wkt, off = _parse(buf, off)
        body = wkt[wkt.index("("):]
        parts.append(body if kind != "MULTIPOINT" else body)
    return f"{kind} (" + ", ".join(parts) + ")", off


def wkb_to_wkt_py(b: bytes) -> str:
    """Decode one WKB/EWKB blob to WKT (XY only)."""
    wkt, off = _parse(memoryview(b), 0)
    if off != len(b):
        raise ValueError(f"trailing bytes after WKB geometry "
                         f"({len(b) - off} of {len(b)})")
    return wkt


def _ring_bytes(xy) -> bytes:
    a = np.asarray(xy, dtype="<f8")
    return struct.pack("<I", len(a)) + a.tobytes()


def _encode_geom(kind: str, rings: list, poly_starts: list) -> bytes:
    if kind == "POINT":
        x, y = rings[0][0]
        return struct.pack("<bI", 1, 1) + struct.pack("<2d", x, y)
    if kind == "LINESTRING":
        return struct.pack("<bI", 1, 2) + _ring_bytes(rings[0])
    if kind == "POLYGON":
        out = struct.pack("<bII", 1, 3, len(rings))
        return out + b"".join(_ring_bytes(r) for r in rings)
    if kind == "MULTIPOINT":
        out = struct.pack("<bII", 1, 4, len(rings))
        return out + b"".join(
            _encode_geom("POINT", [r], []) for r in rings
        )
    if kind == "MULTILINESTRING":
        out = struct.pack("<bII", 1, 5, len(rings))
        return out + b"".join(
            _encode_geom("LINESTRING", [r], []) for r in rings
        )
    if kind == "MULTIPOLYGON":
        bounds = list(poly_starts) + [len(rings)]
        out = struct.pack("<bII", 1, 6, len(poly_starts))
        return out + b"".join(
            _encode_geom("POLYGON", rings[a:b], [0])
            for a, b in zip(bounds, bounds[1:])
        )
    raise ValueError(f"unsupported WKT kind {kind!r}")


def wkt_to_wkb_py(wkt: str) -> bytes:
    """Encode WKT (XY, the engine's geometry grammar — parsed by the
    same `functions.geometry.parse_wkt` every operator uses) as
    little-endian WKB."""
    from geomesa_spark.functions.geometry import parse_wkt

    g = parse_wkt(wkt)
    return _encode_geom(g.kind, g.rings, g.poly_starts)


def decode_wkb(
    df: DataFrame, wkb_col: str = "geom_wkb", wkt_col: str = "geom_wkt"
) -> DataFrame:
    """Append a WKT column decoded from a binary WKB column —
    Arrow-batched mapInPandas, all other columns passed through."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, {wkt_col} string"

    def gen(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[wkt_col] = [
                None if b is None else wkb_to_wkt_py(bytes(b))
                for b in pdf[wkb_col]
            ]
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def encode_wkb(
    df: DataFrame, wkt_col: str = "geom_wkt", wkb_col: str = "geom_wkb"
) -> DataFrame:
    """Append a little-endian WKB binary column from a WKT column."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    schema = f"{fields}, {wkb_col} binary"

    def gen(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[wkb_col] = [
                None if w is None else wkt_to_wkb_py(w)
                for w in pdf[wkt_col]
            ]
            yield pdf

    return df.mapInPandas(gen, schema=schema)
