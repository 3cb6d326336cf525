"""Non-point density rasterization vs a numpy oracle replicating the
same edge-walk / centroid-coverage semantics."""

import numpy as np
import pytest

from geomesa_spark.functions import geometry as G
from geomesa_spark.operators.rasterize import density_geoms, parse_geoms

BBOX = (-10.0, -10.0, 10.0, 10.0)
W = H = 20  # 1-degree pixels


def oracle(rows):
    cw = (BBOX[2] - BBOX[0]) / W
    ch = (BBOX[3] - BBOX[1]) / H
    acc = {}
    for key, wkt, weight in rows:
        geom = G.parse_wkt(wkt)
        px = set()
        edges = []
        for ring in geom.rings:
            if len(ring) < 2:
                edges.append((ring[0][0], ring[0][1], ring[0][0], ring[0][1]))
            for k in range(len(ring) - 1):
                edges.append((ring[k][0], ring[k][1], ring[k + 1][0], ring[k + 1][1]))
        for x0, y0, x1, y1 in edges:
            n = max(1, int(np.ceil(max(abs(x1 - x0) / (cw * 0.5),
                                       abs(y1 - y0) / (ch * 0.5)))))
            for s in range(n + 1):
                t = s / n
                lon = x0 + t * (x1 - x0)
                lat = y0 + t * (y1 - y0)
                if not (BBOX[0] <= lon <= BBOX[2] and BBOX[1] <= lat <= BBOX[3]):
                    continue
                i = min(W - 1, max(0, int(np.floor((lon - BBOX[0]) / cw))))
                j = min(H - 1, max(0, int(np.floor((lat - BBOX[1]) / ch))))
                px.add((i, j))
        if geom.kind in ("POLYGON", "MULTIPOLYGON"):
            for i in range(W):
                for j in range(H):
                    cx = BBOX[0] + (i + 0.5) * cw
                    cy = BBOX[1] + (j + 0.5) * ch
                    if G.contains(geom, np.array([cx]), np.array([cy]))[0]:
                        px.add((i, j))
        for p in px:
            acc[p] = acc.get(p, 0.0) + weight
    return acc


ROWS = [
    ("a", "LINESTRING (-8 -8, 8 8)", 1.0),
    ("b", "POLYGON ((-5 -5, 5 -5, 5 5, -5 5, -5 -5))", 2.0),
    ("c", "POINT (7.5 -7.5)", 3.0),
    ("d", "LINESTRING (-9 9, 9 9, 9 -9)", 1.5),
]


def test_density_geoms_matches_oracle(spark):
    df = spark.createDataFrame(ROWS, "key string, wkt string, w double")
    parsed = parse_geoms(df, "wkt", "key", "w")
    got = {
        (r.i, r.j): r.weight
        for r in density_geoms(parsed, BBOX, W, H).collect()
    }
    want = oracle(ROWS)
    assert got == pytest.approx(want)


def test_polygon_with_hole(spark):
    rows = [("h", "POLYGON ((-6 -6, 6 -6, 6 6, -6 6, -6 -6), (-2 -2, 2 -2, 2 2, -2 2, -2 -2))", 1.0)]
    df = spark.createDataFrame(rows, "key string, wkt string, w double")
    got = {
        (r.i, r.j): r.weight
        for r in density_geoms(parse_geoms(df, "wkt", "key", "w"), BBOX, W, H).collect()
    }
    want = oracle(rows)
    assert got == pytest.approx(want)
    # a pixel centered inside the hole, away from its boundary walk,
    # must be absent: hole is (-2..2)^2 -> pixel centered (0.5, 0.5)
    # is on the boundary walk? boundary cells are included; interior
    # hole pixel away from edges: none at this resolution with the
    # walk included, so just check the oracle equivalence above.


def test_windowed_density_clips_edge_walk(spark):
    """A continental edge against a zoomed-in window: results equal
    the unwindowed semantics restricted to the bbox, and the exploded
    sample count stays proportional to the window, not the edge."""
    from pyspark.sql import functions as F
    from geomesa_spark.operators import rasterize as R

    geoms = R.parse_geoms(
        spark.createDataFrame(
            [("long", "LINESTRING (-170 0.05, 170 0.05)"),
             ("inwin", "LINESTRING (0.02 0.01, 0.08 0.09)")],
            "gid string, geom_wkt string",
        ),
        "geom_wkt",
        "gid",
    )
    bbox = (0.0, 0.0, 0.1, 0.1)
    out = R.density_geoms(geoms, bbox, 64, 64)
    rows = out.collect()
    assert rows  # both geometries cross the window
    keys_hit = {r.i for r in rows}
    assert keys_hit  # sanity
    # the long edge contributes exactly its in-window pixels: row of
    # pixels at lat 0.05 -> j = floor(0.05/ (0.1/64)) = 32
    total = out.agg(F.sum("weight")).collect()[0][0]
    assert total >= 64  # the long line covers the full row of 64 px
