"""MVT encoding: decode round-trip via the independent reader,
golden-hash determinism, and composition from the tile cutters."""

import hashlib

import pytest
from pyspark.sql import functions as F

from geomesa_spark.sources.mvt import decode_tile, encode_tile, mvt_encode


def test_encode_decode_roundtrip_pure():
    feats = [
        (3, 3, [[(0, 0), (4096, 0), (4096, 4096), (0, 4096)],
                [(100, 100), (200, 100), (200, 200)]]),
        (9, 3, [[(5, 5), (50, 5), (30, 60)]]),
    ]
    blob = encode_tile(feats, layer_name="roads", extent=4096)
    t = decode_tile(blob)
    assert t["name"] == "roads" and t["extent"] == 4096 \
        and t["version"] == 2
    assert [(f["id"], f["type"], f["parts"]) for f in t["features"]] \
        == [(fid, g, parts) for fid, g, parts in feats]


def test_mvt_encode_polygons(spark):
    from geomesa_spark.operators.tilecut import tile_cut

    wkt = ("POLYGON ((-50.3 -20.7, 61.2 -20.7, 61.2 41.9, "
           "-50.3 41.9, -50.3 -20.7))")
    df = spark.createDataFrame(
        [(4, wkt)], "geom_id long, geom_wkt string"
    )
    cut = tile_cut(df, 3)
    tiles = mvt_encode(cut, kind="polygon", layer_name="areas")
    rows = tiles.collect()
    src = {}
    for r in cut.collect():
        src.setdefault((r.tx, r.ty), {}).setdefault(4, []).append(
            (r.ring_i, [(p.px, p.py) for p in r.pts])
        )
    assert {(r.tx, r.ty) for r in rows} == set(src)
    for r in rows:
        t = decode_tile(bytes(r.mvt))
        assert t["name"] == "areas" and r.n_features == 1
        f = t["features"][0]
        assert f["id"] == 4 and f["type"] == 3
        assert f["parts"] == [p for _, p in sorted(src[(r.tx, r.ty)][4])]
    # determinism: same input -> byte-identical blobs on a rerun
    h1 = sorted(hashlib.sha256(bytes(r.mvt)).hexdigest() for r in rows)
    h2 = sorted(
        hashlib.sha256(bytes(r.mvt)).hexdigest()
        for r in mvt_encode(cut, kind="polygon", layer_name="areas")
        .collect()
    )
    assert h1 == h2


def test_mvt_encode_lines_multi_feature(spark):
    from geomesa_spark.operators.tilecut import tile_cut_lines

    mk = lambda c: "LINESTRING (" + ", ".join(  # noqa: E731
        f"{x} {y}" for x, y in c) + ")"
    df = spark.createDataFrame(
        [(1, mk([(10.0, 10.0), (10.2, 10.1), (10.4, 10.3)])),
         (2, mk([(10.1, 10.05), (10.3, 10.2)]))],
        "geom_id long, geom_wkt string",
    )
    cut = tile_cut_lines(df, 4)
    rows = mvt_encode(cut, kind="line").collect()
    assert len(rows) == 1 and rows[0].n_features == 2
    t = decode_tile(bytes(rows[0].mvt))
    assert [f["id"] for f in t["features"]] == [1, 2]
    assert all(f["type"] == 2 for f in t["features"])
    n_src = {r.geom_id: [(p.px, p.py) for p in r.pts]
             for r in cut.collect()}
    assert t["features"][0]["parts"] == [n_src[1]]
    assert t["features"][1]["parts"] == [n_src[2]]
    with pytest.raises(ValueError):
        mvt_encode(cut, kind="nope")


def test_mvt_point_command_shape_and_negative_id():
    """Spec 4.3.4.2: multi-point features are ONE MoveTo with count =
    n (never repeated MoveTos); negative ids raise instead of
    hanging the varint loop."""
    from geomesa_spark.sources.mvt import _geometry

    blob = encode_tile(
        [(5, 1, [[(10, 20)], [(30, 40)]])], layer_name="pts"
    )
    t = decode_tile(blob)
    assert t["features"][0]["parts"] == [[(10, 20)], [(30, 40)]]
    geom = _geometry([[(10, 20)], [(30, 40)]], closed=False, point=True)
    # first byte: command id 1 (MoveTo), count 2 -> (2 << 3) | 1 = 17
    assert geom[0] == 17
    with pytest.raises(ValueError):
        encode_tile([(-3, 1, [[(0, 0)]])])


def test_mvt_encode_null_id_raises(spark):
    """A non-numeric id casts to NULL long; the packer must raise a
    clear remap-upstream error instead of an opaque int(nan) crash."""
    from geomesa_spark.operators.tilecut import tile_cut_points

    pts = spark.createDataFrame(
        [("doc-x", 10.0, 10.0)], "geom_id string, lon double, lat double"
    )
    cut = tile_cut_points(pts, 3)
    # ANSI (Spark 4 default): the cast itself raises; non-ANSI: the
    # cast yields NULL and the packer's pd.isna guard raises the
    # clear remap-upstream message — both loud, neither opaque
    with pytest.raises(
        Exception, match="CAST_INVALID_INPUT|non-negative long"
    ):
        mvt_encode(cut, kind="point").collect()
    ansi0 = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="non-negative long"):
            mvt_encode(tile_cut_points(pts, 3), kind="point").collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi0)
