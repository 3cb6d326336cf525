"""Distributed convex hull vs an independent exhaustive hull-edge
oracle (all-pairs half-plane characterization, not a chain)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.hull import convex_hull, hull_edges

FP = 10_000_000


def _pts(spark, xy, grp=None):
    rows = [
        (float(x), float(y), grp[i] if grp is not None else "a")
        for i, (x, y) in enumerate(xy)
    ]
    return spark.createDataFrame(rows, "lon double, lat double, g string")


def _oracle_vertices(xy):
    """Exhaustive: q is a hull vertex iff some directed edge (q, r)
    has every other point strictly left or collinear-within — i.e.
    q is an endpoint of a hull edge.  Single/collinear degenerates
    handled by direct reasoning (extremes)."""
    q = {(int(round(x * FP)), int(round(y * FP))) for x, y in xy}
    pts = sorted(q)
    if len(pts) <= 2:
        return set(pts)
    P = np.array(pts, dtype=object)
    n = len(P)
    verts = set()
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            a, b = P[i], P[j]
            d = P - a
            cr = (b[0] - a[0]) * d[:, 1] - (b[1] - a[1]) * d[:, 0]
            on = cr == 0
            within = (
                on
                & (np.minimum(a[0], b[0]) <= P[:, 0])
                & (P[:, 0] <= np.maximum(a[0], b[0]))
                & (np.minimum(a[1], b[1]) <= P[:, 1])
                & (P[:, 1] <= np.maximum(a[1], b[1]))
            )
            if np.all((cr > 0) | within):
                verts.add(tuple(a))
                verts.add(tuple(b))
    return verts


def _got_vertices(verts_df, g=None):
    rows = verts_df.collect()
    if g is not None:
        rows = [r for r in rows if r.g == g]
    return {
        (int(round(r.x * FP)), int(round(r.y * FP))): r.vertex_idx
        for r in rows
    }


def test_hull_matches_exhaustive_oracle(spark):
    rng = np.random.default_rng(3)
    blobs = {
        "gauss": rng.normal(0, 3, (300, 2)) + [10, 20],
        "ring": np.c_[np.cos(np.linspace(0, 2 * np.pi, 40, False)),
                      np.sin(np.linspace(0, 2 * np.pi, 40, False))] * 5,
        "box": rng.uniform(-1, 1, (200, 2)) * [30, 0.5],
    }
    xy = np.vstack(list(blobs.values()))
    grp = sum([[g] * len(v) for g, v in blobs.items()], [])
    out = convex_hull(_pts(spark, xy, grp), by=["g"])
    for g, v in blobs.items():
        got = set(_got_vertices(out, g))
        want = _oracle_vertices(v)
        assert got == want, (g, len(got), len(want))
    # the ring's 40 generators are all extreme (worst case: no
    # reduction possible) — every one survives
    assert len(_got_vertices(out, "ring")) == 40


def test_hull_ccw_order_and_containment(spark):
    rng = np.random.default_rng(8)
    xy = rng.normal(0, 2, (500, 2))
    vd = convex_hull(_pts(spark, xy))
    ed = hull_edges(vd).collect()
    verts = sorted(
        ((r.vertex_idx, r.x, r.y) for r in vd.collect())
    )
    # starts at the lexicographic minimum
    assert (verts[0][1], verts[0][2]) == min((x, y) for _, x, y in verts)
    # CCW: positive signed area, every input point left of every edge
    area2 = sum(
        e.ax * e.by_ - e.bx * e.ay for e in ed
    )
    assert area2 > 0
    for e in ed:
        cr = (e.bx - e.ax) * (xy[:, 1] - e.ay) - (e.by_ - e.ay) * (
            xy[:, 0] - e.ax
        )
        assert (cr >= -1e-6).all()
    assert len(ed) == len(verts)  # cyclic: one edge per vertex


def test_hull_degenerates_and_duplicates(spark):
    # collinear -> two extremes, one edge; single point -> no edges
    xy = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (1.0, 1.0), (0.5, 0.5)]
    grp = ["line"] * 5
    xy += [(7.0, 7.0), (7.0, 7.0)]
    grp += ["dot"] * 2
    vd = convex_hull(_pts(spark, xy, grp), by=["g"])
    ed = hull_edges(vd, by=["g"])
    line_v = _got_vertices(vd, "line")
    assert set(line_v) == {(0, 0), (2 * FP, 2 * FP)}
    dot_v = _got_vertices(vd, "dot")
    assert set(dot_v) == {(7 * FP, 7 * FP)}
    edges = {r.g: [] for r in ed.collect()}
    for r in ed.collect():
        edges[r.g].append((r.ax, r.ay, r.bx, r.by_))
    assert len(edges.get("line", [])) == 1
    assert "dot" not in edges


def test_hull_shard_invariance(spark):
    rng = np.random.default_rng(21)
    xy = rng.uniform(-50, 50, (400, 2))
    one = _got_vertices(convex_hull(_pts(spark, xy), shards=1))
    many = _got_vertices(convex_hull(_pts(spark, xy), shards=64))
    assert one == many  # same vertices AND same CCW indices


def test_hull_plan_is_two_pandas_stages(spark):
    rng = np.random.default_rng(2)
    xy = rng.normal(0, 1, (100, 2))
    plan = convex_hull(_pts(spark, xy))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 2
    assert "CartesianProduct" not in plan

def test_polygon_area(spark):
    from geomesa_spark.operators.hull import polygon_area

    # unit square + interior noise -> exact area 1; collinear -> 0
    rng = np.random.default_rng(4)
    sq = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)] + [
        tuple(p) for p in rng.uniform(0.01, 0.99, (100, 2))
    ]
    ln = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0)]
    xy = sq + ln
    grp = ["sq"] * len(sq) + ["ln"] * len(ln)
    edges = hull_edges(
        convex_hull(_pts(spark, xy, grp), by=["g"]), by=["g"]
    )
    got = {r.g: r for r in polygon_area(edges, by=["g"]).collect()}
    assert got["sq"].area == 1.0
    assert got["sq"].area2_fp == 2 * FP * FP
    assert got["sq"].n_edges == 4
    assert got["ln"].area == 0.0 and got["ln"].n_edges == 1

    # random cloud: matches the numpy shoelace of the oracle hull
    xy2 = rng.normal(0, 5, (400, 2))
    e2 = hull_edges(convex_hull(_pts(spark, xy2)))
    a = polygon_area(e2).collect()[0]
    verts = sorted(_oracle_vertices(xy2))
    import math
    cx = sum(x for x, _ in verts) / len(verts)
    cy = sum(y for _, y in verts) / len(verts)
    ring = sorted(verts, key=lambda p: math.atan2(p[1]-cy, p[0]-cx))
    s = sum(ring[i][0]*ring[(i+1) % len(ring)][1]
            - ring[(i+1) % len(ring)][0]*ring[i][1]
            for i in range(len(ring)))
    assert a.area2_fp == abs(s)


def test_polygon_area_overflow_and_open_segment(spark):
    """Two defects the first cut had: raw shoelace terms at
    world-offset coordinates exceed int64 (decimal(38,0) now), and a
    2-vertex degenerate hull's single OPEN segment doesn't telescope
    (a segment off the origin has a nonzero raw cross term — the
    n_edges >= 3 ring gate reports 0)."""
    from geomesa_spark.operators.hull import polygon_area

    # unit square translated far from the origin: each cross term is
    # ~(300*FP)^2 = 9e18 > 2^63, but the exact area is still 1.
    off = 300.0
    sq = [(off, off), (off + 1, off), (off + 1, off + 1), (off, off + 1)]
    # collinear segment NOT through the origin: raw cross != 0
    ln = [(5.0, 7.0), (6.0, 8.0), (7.0, 9.0)]
    xy = sq + ln
    grp = ["sq"] * len(sq) + ["ln"] * len(ln)
    edges = hull_edges(
        convex_hull(_pts(spark, xy, grp), by=["g"]), by=["g"]
    )
    got = {r.g: r for r in polygon_area(edges, by=["g"]).collect()}
    assert got["sq"].area == 1.0
    assert got["sq"].area2_fp == 2 * FP * FP
    assert got["ln"].n_edges == 1
    assert got["ln"].area2_fp == 0 and got["ln"].area == 0.0


def test_polygon_moments(spark):
    """Area/perimeter/centroid vs direct python over the oracle hull:
    unit square (known closed forms), segment degenerate (perimeter
    kept, ring moments zeroed), random cloud vs exact shoelace."""
    from geomesa_spark.operators.hull import polygon_moments

    sq = [(2.0, 3.0), (4.0, 3.0), (4.0, 5.0), (2.0, 5.0), (3.0, 4.0)]
    ln = [(5.0, 7.0), (6.0, 8.0), (7.0, 9.0)]
    xy = sq + ln
    grp = ["sq"] * len(sq) + ["ln"] * len(ln)
    edges = hull_edges(
        convex_hull(_pts(spark, xy, grp), by=["g"]), by=["g"]
    )
    got = {r.g: r for r in polygon_moments(edges, by=["g"]).collect()}
    s = got["sq"]
    assert s.area == 4.0 and s.n_edges == 4
    assert s.perimeter == 8.0
    assert s.cx == 3.0 and s.cy == 4.0
    l = got["ln"]
    assert l.n_edges == 1 and l.area == 0.0 and l.cx is None
    # open segment keeps its length: sqrt(8) quantized to fp units
    import math
    assert l.perim_fp == int(math.floor(
        math.sqrt(float((2 * FP) ** 2 + (2 * FP) ** 2)) + 0.5))

    # random cloud: moments match python ints over the oracle hull
    rng = np.random.default_rng(11)
    xy2 = rng.normal(50, 20, (300, 2))
    e2 = hull_edges(convex_hull(_pts(spark, xy2)))
    m = polygon_moments(e2).collect()[0]
    verts = sorted(_oracle_vertices(xy2))
    cx = sum(x for x, _ in verts) / len(verts)
    cy = sum(y for _, y in verts) / len(verts)
    ring = sorted(verts, key=lambda p: math.atan2(p[1]-cy, p[0]-cx))
    a2 = sx = sy = 0
    pf = 0
    for i in range(len(ring)):
        (ax, ay), (bx, by) = ring[i], ring[(i+1) % len(ring)]
        c = ax*by - bx*ay
        a2 += c
        sx += (ax+bx)*c
        sy += (ay+by)*c
        pf += int(math.floor(math.sqrt(float(
            (bx-ax)**2 + (by-ay)**2)) + 0.5))
    assert m.area2_fp == a2 and m.perim_fp == pf
    assert m.cx == float(sx) / (3.0 * float(a2)) / FP
    assert m.cy == float(sy) / (3.0 * float(a2)) / FP


def test_oracle_edge_characterization_degenerate_dedup():
    """Review fix (oracle-side): the O(n³) directed hull-edge
    characterization qualifies BOTH directions of an all-collinear
    group's segment, while hull_edges emits it once — the gate
    oracles now keep only the ascending direction for degenerate
    groups.  Pinned here directly in DuckDB on a fabricated group."""
    import duckdb

    con = duckdb.connect()
    con.execute("""CREATE TABLE tq AS SELECT * FROM (VALUES
        ('d', 0, 0), ('d', 10, 10), ('d', 20, 20),
        ('t', 0, 0), ('t', 10, 0), ('t', 0, 10)) v(g, xq, yq)""")
    q = """
SELECT c.g, c.ax, c.ay, c.bx, c.by2
FROM (
  SELECT a.g, a.xq AS ax, a.yq AS ay, b.xq AS bx, b.yq AS by2
  FROM tq a JOIN tq b
    ON a.g = b.g AND (a.xq <> b.xq OR a.yq <> b.yq)
) c
WHERE NOT EXISTS (
  SELECT 1 FROM tq p
  WHERE p.g = c.g
    AND NOT (
      (c.bx - c.ax) * (p.yq - c.ay)
        - (c.by2 - c.ay) * (p.xq - c.ax) > 0
      OR (
        (c.bx - c.ax) * (p.yq - c.ay)
          - (c.by2 - c.ay) * (p.xq - c.ax) = 0
        AND p.xq BETWEEN least(c.ax, c.bx) AND greatest(c.ax, c.bx)
        AND p.yq BETWEEN least(c.ay, c.by2) AND greatest(c.ay, c.by2)
      )
    )
)
AND NOT (
  (c.ax, c.ay) > (c.bx, c.by2)
  AND NOT EXISTS (
    SELECT 1 FROM tq p2
    WHERE p2.g = c.g
      AND (c.bx - c.ax) * (p2.yq - c.ay)
          - (c.by2 - c.ay) * (p2.xq - c.ax) <> 0
  )
)
"""
    rows = con.execute(q).fetchall()
    deg = [r for r in rows if r[0] == "d"]
    tri = [r for r in rows if r[0] == "t"]
    # degenerate group: exactly ONE ascending segment (hull_edges
    # parity); triangle group: its 3 CCW edges, untouched
    assert deg == [("d", 0, 0, 20, 20)]
    assert len(tri) == 3
