"""track_hulls: gift-wrapping oracle parity + degenerate kinds."""

import numpy as np

from geomesa_spark.operators.simplify import hull_np, track_hulls


def _gift_wrap(pts):
    """Independent jarvis-march hull (set of vertex tuples, strict
    turns -> minimal vertex set)."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return set(pts)
    start = pts[0]
    hull = [start]
    cur = start
    prev_dir = None
    while True:
        cand = None
        for p in pts:
            if p == cur:
                continue
            if cand is None:
                cand = p
                continue
            cross = (cand[0] - cur[0]) * (p[1] - cur[1]) - (
                cand[1] - cur[1]
            ) * (p[0] - cur[0])
            if cross < 0 or (
                cross == 0
                and (p[0] - cur[0]) ** 2 + (p[1] - cur[1]) ** 2
                > (cand[0] - cur[0]) ** 2 + (cand[1] - cur[1]) ** 2
            ):
                cand = p
        if cand == start:
            break
        hull.append(cand)
        cur = cand
        if len(hull) > len(pts):  # collinear degenerate guard
            break
    return set(hull)


def test_hull_np_vs_gift_wrap():
    rng = np.random.default_rng(9)
    for _ in range(50):
        n = int(rng.integers(1, 60))
        pts = [
            (float(x), float(y))
            for x, y in zip(
                rng.integers(-5, 6, n).astype(float),
                rng.integers(-5, 6, n).astype(float),
            )
        ]
        lon = np.array([p[0] for p in pts])
        lat = np.array([p[1] for p in pts])
        idx = hull_np(lon, lat)
        got = {(lon[i], lat[i]) for i in idx}
        distinct = set(pts)
        if len(got) <= 2:
            # degenerate: endpoints of the collinear extent
            assert len(distinct) <= 2 or _collinear(distinct)
            continue
        assert got == _gift_wrap(pts)
        # CCW + starts at lex-min
        assert (lon[idx[0]], lat[idx[0]]) == min(distinct)
        area2 = sum(
            lon[idx[i]] * lat[idx[(i + 1) % len(idx)]]
            - lon[idx[(i + 1) % len(idx)]] * lat[idx[i]]
            for i in range(len(idx))
        )
        assert area2 > 0


def _collinear(pts):
    pts = sorted(pts)
    (x0, y0), (x1, y1) = pts[0], pts[-1]
    return all(
        abs((x1 - x0) * (y - y0) - (y1 - y0) * (x - x0)) == 0
        for x, y in pts
    )


def test_track_hulls(spark):
    rows = (
        [("sq", x, y) for x in (0.0, 1.0) for y in (0.0, 1.0)]
        + [("sq", 0.5, 0.5), ("sq", 1.0, 0.5)]  # interior + edge point
        + [("line", 0.0, 0.0), ("line", 1.0, 1.0), ("line", 2.0, 2.0)]
        + [("dot", 5.0, 5.0), ("dot", 5.0, 5.0)]
    )
    df = spark.createDataFrame(rows, "track string, lon double, lat double")
    got = {r.track: r for r in track_hulls(df, "track").collect()}
    sq = got["sq"]
    assert (sq.n_points, sq.n_hull, sq.area) == (6, 4, 1.0)
    assert sq.hull_wkt == (
        "POLYGON ((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 1.0, 0.0 0.0))"
    )
    ln = got["line"]
    assert (ln.n_hull, ln.area) == (2, 0.0)
    assert ln.hull_wkt == "LINESTRING (0.0 0.0, 2.0 2.0)"
    dot = got["dot"]
    assert (dot.n_points, dot.n_hull) == (2, 1)
    assert dot.hull_wkt == "POINT (5.0 5.0)"


def test_track_hulls_roundtrip_parses(spark):
    # hull WKT must parse back through the engine's own WKT parser
    from geomesa_spark.operators.geom_data import geom_table_native

    rng = np.random.default_rng(3)
    rows = [
        ("t", float(rng.uniform(-10, 10)), float(rng.uniform(-5, 5)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "track string, lon double, lat double")
    hulls = track_hulls(df, "track").withColumnRenamed(
        "hull_wkt", "geom_wkt"
    )
    g = geom_table_native(hulls).collect()[0]
    assert g.kind == "POLYGON" and len(g.edges) == g.n_hull
