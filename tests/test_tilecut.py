"""Vector-tile cutting vs an exact python Sutherland–Hodgman mirror
(identical IEEE expression order, so quantized integers match
exactly away from half-quantum boundaries)."""

import math

import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.tilecut import tile_cut

DEG2RAD = 0.017453292519943295
PI_4 = math.pi / 4.0
MAXLAT = 85.05112878


def merc(lon, lat):
    clat = max(-MAXLAT, min(MAXLAT, lat))
    mx = (lon + 180.0) / 360.0
    my = (1.0 - math.log(math.tan(PI_4 + (clat * DEG2RAD) / 2.0))
          / math.pi) / 2.0
    return mx, my


def clip_pass(pts, axis, bound, keep_le):
    if len(pts) < 3:
        return []
    out = []
    for i in range(len(pts)):
        cur, prv = pts[i], pts[i - 1]
        c = cur[0] if axis == "x" else cur[1]
        p = prv[0] if axis == "x" else prv[1]
        cin = c <= bound if keep_le else c >= bound
        pin = p <= bound if keep_le else p >= bound

        def inter():
            t = (bound - p) / (c - p)
            if axis == "x":
                return (bound, prv[1] + t * (cur[1] - prv[1]))
            return (prv[0] + t * (cur[0] - prv[0]), bound)

        if cin and pin:
            out.append(cur)
        elif cin and not pin:
            out.append(inter())
            out.append(cur)
        elif pin:
            out.append(inter())
    return out


def brute_tiles(rings_ll, z, extent=4096):
    n = 1 << z
    # strip closing dup like the engine
    rings = []
    for r in rings_ll:
        pts = [merc(x, y) for (x, y) in r]
        if len(pts) > 1 and pts[0] == pts[-1]:
            pts = pts[:-1]
        rings.append(pts)
    allp = [p for r in rings for p in r]
    xs = [p[0] for p in allp]
    ys = [p[1] for p in allp]
    cl = lambda v: max(0, min(n - 1, int(math.floor(v))))  # noqa: E731
    tx0, tx1 = cl(min(xs) * n), cl(max(xs) * n)
    ty0, ty1 = cl(min(ys) * n), cl(max(ys) * n)
    out = {}
    for tx in range(tx0, tx1 + 1):
        for ty in range(ty0, ty1 + 1):
            bx0, by0 = tx * (1.0 / n), ty * (1.0 / n)
            bx1, by1 = (tx + 1) * (1.0 / n), (ty + 1) * (1.0 / n)
            for ri, r in enumerate(rings):
                c = r
                for axis, bound, keep in (("x", bx0, False),
                                          ("x", bx1, True),
                                          ("y", by0, False),
                                          ("y", by1, True)):
                    c = clip_pass(c, axis, bound, keep)
                if len(c) >= 3:
                    q = [
                        (int(math.floor((x - bx0) * n * extent + 0.5)),
                         int(math.floor((y - by0) * n * extent + 0.5)))
                        for (x, y) in c
                    ]
                    out[(tx, ty, ri)] = q
    return out


def _wkt(rings):
    return "POLYGON (" + ", ".join(
        "(" + ", ".join(f"{x} {y}" for x, y in r) + ")" for r in rings
    ) + ")"


def _run(spark, rings_list, z):
    df = spark.createDataFrame(
        [(i, _wkt(r)) for i, r in enumerate(rings_list)],
        "geom_id long, geom_wkt string",
    )
    got = {}
    for row in tile_cut(df, z).collect():
        got[(row.geom_id, row.tx, row.ty, row.ring_i)] = [
            (p.px, p.py) for p in row.pts
        ]
        assert row.z == z and row.n_pts == len(row.pts)
    return got


def test_tile_cut_multi_tile_square(spark):
    """A mid-latitude box spanning a 3x3-ish tile range at z=3:
    every emitted tile ring matches the python mirror exactly, and
    interior tiles carry the full-extent box."""
    sq = [[(-50.3, -20.7), (61.2, -20.7), (61.2, 41.9),
           (-50.3, 41.9), (-50.3, -20.7)]]
    got = _run(spark, [sq], 3)
    want = brute_tiles(sq, 3)
    assert {(0, tx, ty, ri): q for (tx, ty, ri), q in want.items()} == got
    assert len(want) >= 6
    # an interior tile is the full extent box
    interior = [q for q in want.values()
                if all(p in ((0, 0), (4096, 0), (4096, 4096), (0, 4096))
                       for p in q)]
    assert interior, "expected at least one full-extent interior tile"


def test_tile_cut_hole_and_inside(spark):
    """Shell + hole clip independently (ring_i 0/1); a triangle fully
    inside one tile round-trips; sub-3-vertex clips drop."""
    poly = [
        [(-10.0, -10.0), (30.0, -10.0), (30.0, 30.0), (-10.0, 30.0),
         (-10.0, -10.0)],
        [(5.0, 5.0), (15.0, 5.0), (15.0, 15.0), (5.0, 15.0), (5.0, 5.0)],
    ]
    tri = [[(100.1, 40.2), (100.9, 40.2), (100.5, 40.8), (100.1, 40.2)]]
    got = _run(spark, [poly, tri], 5)
    want0 = brute_tiles(poly, 5)
    want1 = brute_tiles(tri, 5)
    assert got == {
        **{(0, tx, ty, ri): q for (tx, ty, ri), q in want0.items()},
        **{(1, tx, ty, ri): q for (tx, ty, ri), q in want1.items()},
    }
    assert any(ri == 1 for (_, _, _, ri) in got)  # hole rings present
    assert len([k for k in got if k[0] == 1]) == 1  # tri in ONE tile


def test_tile_cut_guards(spark):
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame(
        [(0, "POINT (1 2)")], "geom_id long, geom_wkt string"
    )
    with pytest.raises(Exception):
        tile_cut(df, 3).collect()
    big = spark.createDataFrame(
        [(0, _wkt([[(-179.0, -80.0), (179.0, -80.0), (179.0, 80.0),
                    (-179.0, 80.0), (-179.0, -80.0)]]))],
        "geom_id long, geom_wkt string",
    )
    with pytest.raises((Exception, Py4JJavaError)):
        tile_cut(big, 10, max_tiles_per_geom=100).collect()
    with pytest.raises(ValueError):
        tile_cut(big, 40)


def test_tile_cut_plan_no_python(spark):
    df = spark.createDataFrame(
        [(0, _wkt([[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]]))],
        "geom_id long, geom_wkt string",
    )
    plan = tile_cut(df, 4)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def lb_clip(x0, y0, x1, y1, bx0, by0, bx1, by1):
    dx, dy = x1 - x0, y1 - y0
    t0, t1 = 0.0, 1.0
    for p, q in ((-dx, x0 - bx0), (dx, bx1 - x0),
                 (-dy, y0 - by0), (dy, by1 - y0)):
        if p == 0:
            if q < 0:
                return None
            continue
        r = q / p
        if p < 0:
            t0 = max(t0, r)
        else:
            t1 = min(t1, r)
    if not (t0 < t1):
        return None
    return (x0 + t0 * dx, y0 + t0 * dy, x0 + t1 * dx, y0 + t1 * dy)


def brute_line_tiles(coords_ll, z, extent=4096):
    n = 1 << z
    pts = [merc(x, y) for (x, y) in coords_ll]
    segs = list(zip(pts[:-1], pts[1:]))
    cl = lambda v: max(0, min(n - 1, int(math.floor(v))))  # noqa: E731
    per_tile = {}
    for si, ((x0, y0), (x1, y1)) in enumerate(segs):
        for tx in range(cl(min(x0, x1) * n), cl(max(x0, x1) * n) + 1):
            for ty in range(cl(min(y0, y1) * n), cl(max(y0, y1) * n) + 1):
                b = (tx * (1.0 / n), ty * (1.0 / n),
                     (tx + 1) * (1.0 / n), (ty + 1) * (1.0 / n))
                c = lb_clip(x0, y0, x1, y1, *b)
                if c is not None:
                    per_tile.setdefault((tx, ty), []).append((si, c))
    out = {}
    for (tx, ty), ss in per_tile.items():
        ss.sort()
        parts, li, last = [], -10, None
        for si, (cx0, cy0, cx1, cy1) in ss:
            if li == si - 1 and last == (cx0, cy0):
                parts[-1].append((cx1, cy1))
            else:
                parts.append([(cx0, cy0), (cx1, cy1)])
            li, last = si, (cx1, cy1)
        bx0, by0 = tx * (1.0 / n), ty * (1.0 / n)
        for pi, part in enumerate(parts):
            out[(tx, ty, pi)] = [
                (int(math.floor((x - bx0) * n * extent + 0.5)),
                 int(math.floor((y - by0) * n * extent + 0.5)))
                for (x, y) in part
            ]
    return out


def test_tile_cut_lines_vs_mirror(spark):
    """Random walks crossing many tiles at z=6: every emitted part
    matches the python Liang–Barsky + re-chain mirror exactly,
    including re-entry (multiple parts per tile)."""
    import numpy as np

    from geomesa_spark.operators.tilecut import tile_cut_lines

    rng = np.random.default_rng(11)
    lines = []
    for i in range(25):
        x = float(rng.uniform(-150, 150))
        y = float(rng.uniform(-60, 60))
        pts = [(x, y)]
        for _ in range(int(rng.integers(3, 30))):
            x += float(rng.uniform(-6, 6))
            y += float(rng.uniform(-6, 6))
            pts.append((max(-179.9, min(179.9, x)),
                        max(-84.0, min(84.0, y))))
        lines.append(pts)
    df = spark.createDataFrame(
        [(i, "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in c) + ")")
         for i, c in enumerate(lines)],
        "geom_id long, geom_wkt string",
    )
    got = {}
    for r in tile_cut_lines(df, 6).collect():
        assert r.z == 6 and r.n_pts == len(r.pts) >= 2
        got[(r.geom_id, r.tx, r.ty, r.part_i)] = [
            (p.px, p.py) for p in r.pts
        ]
    want = {}
    for i, c in enumerate(lines):
        for (tx, ty, pi), q in brute_line_tiles(c, 6).items():
            want[(i, tx, ty, pi)] = q
    assert got == want
    # nontrivial chaining somewhere: at least one part with > 2 pts
    assert any(len(v) > 2 for v in want.values())


def test_tile_cut_lines_chaining_and_guards(spark):
    from geomesa_spark.operators.tilecut import tile_cut_lines

    # a 3-segment chain inside ONE tile -> one 4-point part
    c = [(10.0, 10.0), (10.2, 10.1), (10.4, 10.3), (10.6, 10.2)]
    df = spark.createDataFrame(
        [(7, "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in c) + ")")],
        "geom_id long, geom_wkt string",
    )
    rows = tile_cut_lines(df, 4).collect()
    assert len(rows) == 1 and rows[0].n_pts == 4 and rows[0].part_i == 0
    # POLYGON input raises; zoom out of range raises
    bad = spark.createDataFrame(
        [(0, "POLYGON ((0 0, 1 0, 1 1, 0 0))")],
        "geom_id long, geom_wkt string",
    )
    with pytest.raises(Exception):
        tile_cut_lines(bad, 4).collect()
    with pytest.raises(ValueError):
        tile_cut_lines(df, 31)


def test_enforce_winding(spark):
    from geomesa_spark.operators.tilecut import enforce_winding

    def area2(pts):
        s = 0
        for i in range(len(pts)):
            x0, y0 = pts[i]
            x1, y1 = pts[(i + 1) % len(pts)]
            s += x0 * y1 - x1 * y0
        return s

    shell_ccw = [(0, 0), (0, 100), (100, 100), (100, 0)]   # 2A < 0
    hole_cw = [(10, 10), (10, 20), (20, 20), (20, 10)][::-1]
    rows = [(0, 0, shell_ccw), (0, 1, hole_cw),
            (1, 0, shell_ccw[::-1])]  # already CW -> untouched
    df = spark.createDataFrame(
        [(g, r, [{"px": x, "py": y} for x, y in p]) for g, r, p in rows],
        "geom_id long, ring_i int, "
        "pts array<struct<px:int,py:int>>",
    )
    got = {(r.geom_id, r.ring_i): [(p.px, p.py) for p in r.pts]
           for r in enforce_winding(df).collect()}
    assert area2(got[(0, 0)]) > 0 and area2(got[(0, 1)]) < 0
    assert got[(1, 0)] == shell_ccw[::-1]
    assert got[(0, 0)] == shell_ccw[::-1]


def test_tile_cut_points_and_mvt(spark):
    from geomesa_spark.operators.tilecut import tile_cut_points
    from geomesa_spark.sources.mvt import decode_tile, mvt_encode

    pts = [(1, 10.0, 20.0), (2, 10.3, 20.2), (3, -100.0, -45.0)]
    df = spark.createDataFrame(pts, "geom_id long, lon double, lat double")
    cut = tile_cut_points(df, 6)
    rows = {r.geom_id: r for r in cut.collect()}
    n = 1 << 6
    for gid, lon, lat in pts:
        mx, my = merc(lon, lat)
        r = rows[gid]
        assert (r.tx, r.ty) == (int(mx * n), int(my * n))
        bx0, by0 = r.tx / n, r.ty / n
        assert [(p.px, p.py) for p in r.pts] == [
            (int(math.floor((mx - bx0) * n * 4096 + 0.5)),
             int(math.floor((my - by0) * n * 4096 + 0.5)))
        ]
        assert r.n_pts == 1 and r.part_i == 0
    tiles = mvt_encode(cut, kind="point").collect()
    decoded = {}
    for t in tiles:
        d = decode_tile(bytes(t.mvt))
        for f in d["features"]:
            assert f["type"] == 1
            decoded[f["id"]] = f["parts"]
    assert set(decoded) == {1, 2, 3}
    assert decoded[1] == [[(p.px, p.py) for p in rows[1].pts]]


def test_tile_cut_null_vertex_raises(spark):
    """An unparseable vertex must raise loudly, not clamp the bbox
    and silently drop the geometry.  Under ANSI (the Spark 4
    default) the CAST itself raises; under non-ANSI sessions the
    cast yields NULL and the explicit NULL-vertex guard must fire —
    both paths are loud, neither drops."""
    df = spark.createDataFrame(
        [(7, "POLYGON ((0 0, 1 abc, 1 1, 0 0))")],
        "geom_id long, geom_wkt string",
    )
    with pytest.raises(Exception, match="CAST_INVALID_INPUT|NULL vertex"):
        tile_cut(df, 3).collect()
    ansi0 = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="NULL vertex"):
            tile_cut(df, 3).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi0)
