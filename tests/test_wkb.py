"""WKB codec: round-trip, endianness, EWKB SRID, operator decode."""

import struct

import numpy as np
import pytest

from geomesa_spark.functions.geometry import parse_wkt
from geomesa_spark.sources.wkb import (
    decode_wkb, encode_wkb, wkb_to_wkt_py, wkt_to_wkb_py,
)

CASES = [
    "POINT (1.5 -2.25)",
    "LINESTRING (0.0 0.0, 1.0 1.0, 2.5 -0.5)",
    "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))",
    "POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0), "
    "(2.0 2.0, 3.0 2.0, 3.0 3.0, 2.0 3.0, 2.0 2.0))",  # hole
    "MULTIPOINT ((1.0 2.0), (3.0 4.0))",
    "MULTILINESTRING ((0.0 0.0, 1.0 1.0), (5.0 5.0, 6.0 5.0, 6.0 6.0))",
    "MULTIPOLYGON (((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 0.0)), "
    "((5.0 5.0, 8.0 5.0, 8.0 8.0, 5.0 8.0, 5.0 5.0), "
    "(6.0 6.0, 7.0 6.0, 7.0 7.0, 6.0 6.0)))",
]


def _geom_eq(a, b):
    ga, gb = parse_wkt(a), parse_wkt(b)
    assert ga.kind == gb.kind
    assert len(ga.rings) == len(gb.rings)
    for ra, rb in zip(ga.rings, gb.rings):
        assert np.array_equal(ra, rb)
    assert ga.poly_starts == gb.poly_starts


def test_roundtrip_all_kinds():
    for wkt in CASES:
        _geom_eq(wkb_to_wkt_py(wkt_to_wkb_py(wkt)), wkt)


def test_roundtrip_random_precision():
    rng = np.random.default_rng(6)
    for _ in range(50):
        pts = ", ".join(
            f"{float(x)!r} {float(y)!r}"
            for x, y in zip(rng.uniform(-180, 180, 5),
                            rng.uniform(-90, 90, 5))
        )
        wkt = f"LINESTRING ({pts})"
        _geom_eq(wkb_to_wkt_py(wkt_to_wkb_py(wkt)), wkt)


def test_big_endian_and_ewkb_srid():
    # hand-build a big-endian point and an EWKB little-endian point
    be = struct.pack(">bI2d", 0, 1, 3.5, -7.25)
    assert wkb_to_wkt_py(be) == "POINT (3.5 -7.25)"
    ewkb = struct.pack("<bII2d", 1, 1 | 0x20000000, 4326, 3.5, -7.25)
    assert wkb_to_wkt_py(ewkb) == "POINT (3.5 -7.25)"


def test_errors():
    with pytest.raises(ValueError, match="unsupported WKB"):
        wkb_to_wkt_py(struct.pack("<bI", 1, 99))
    with pytest.raises(ValueError, match="trailing"):
        wkb_to_wkt_py(struct.pack("<bI2d", 1, 1, 0, 0) + b"x")
    # Z flag (0x80000000) -> unsupported
    with pytest.raises(ValueError, match="unsupported WKB"):
        wkb_to_wkt_py(struct.pack("<bI3d", 1, 0x80000001, 1, 2, 3))


def test_decode_wkb_operator(spark):
    rows = [(i, wkt_to_wkb_py(w)) for i, w in enumerate(CASES)] + [
        (len(CASES), None)
    ]
    df = spark.createDataFrame(rows, "gid int, geom_wkb binary")
    out = {r.gid: r.geom_wkt
           for r in decode_wkb(df).collect()}
    for i, w in enumerate(CASES):
        _geom_eq(out[i], w)
    assert out[len(CASES)] is None
    # encode back and compare bytes (LE canonical form)
    rt = encode_wkb(
        decode_wkb(df).drop("geom_wkb").filter("geom_wkt IS NOT NULL")
    ).collect()
    for r in rt:
        assert bytes(r.geom_wkb) == wkt_to_wkb_py(r.geom_wkt)


def test_decode_feeds_geom_table(spark):
    # the migration path: WKB parquet -> decode -> geom_table_native
    from geomesa_spark.operators.geom_data import geom_table_native

    df = spark.createDataFrame(
        [(1, wkt_to_wkb_py("POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, "
                           "0.0 4.0, 0.0 0.0))"))],
        "gid int, geom_wkb binary",
    )
    g = geom_table_native(decode_wkb(df)).collect()[0]
    assert g.kind == "POLYGON" and (g.xmin, g.ymax) == (0.0, 4.0)
    assert len(g.edges) == 4
