"""snap_nearest: brute-force python oracle parity + guards."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from geomesa_spark.operators.snap import segments_table, snap_nearest


def _brute(pts, segs, md):
    out = {}
    for pid, px, py in pts:
        best = None
        for sid, sord, x0, y0, x1, y1 in segs:
            vx, vy = x1 - x0, y1 - y0
            l2 = vx * vx + vy * vy
            t = 0.0
            if l2 > 0:
                t = min(1.0, max(0.0, ((px - x0) * vx + (py - y0) * vy) / l2))
            qx, qy = x0 + t * vx, y0 + t * vy
            d2 = (px - qx) ** 2 + (py - qy) ** 2
            if d2 <= md * md:
                key = (d2, sid, sord, t, qx, qy)
                if best is None or key < best:
                    best = key
        if best is not None:
            out[pid] = best
    return out


def test_snap_nearest_oracle(spark):
    rng = np.random.default_rng(17)
    segs = []
    for sid in range(40):
        x0, y0 = float(rng.uniform(-30, 30)), float(rng.uniform(-20, 20))
        for sord in range(3):
            x1 = x0 + float(rng.uniform(-2, 2))
            y1 = y0 + float(rng.uniform(-1, 1))
            segs.append((sid, sord, x0, y0, x1, y1))
            x0, y0 = x1, y1
    pts = [
        (i, float(rng.uniform(-35, 35)), float(rng.uniform(-25, 25)))
        for i in range(400)
    ]
    pdf = spark.createDataFrame(pts, "pid long, lon double, lat double")
    sdf = spark.createDataFrame(
        segs, "gid long, seg int, x0 double, y0 double, x1 double, y1 double"
    )
    got = {
        r.pid: (r.dist2, r.gid, r.seg, r.frac, r.snap_lon, r.snap_lat)
        for r in snap_nearest(pdf, sdf, 3.0, "pid", bits=6).collect()
    }
    exp = _brute(pts, segs, 3.0)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == exp[k], (k, got[k], exp[k])
    assert len(exp) > 100  # meaningful coverage


def test_segments_table(spark):
    from geomesa_spark.operators.geom_data import geom_table_native

    df = spark.createDataFrame(
        [(1, "LINESTRING (0 0, 1 1, 2 0)")], "gid long, geom_wkt string"
    )
    segs = segments_table(geom_table_native(df)).collect()
    assert [(r.gid, r.seg, r.x0, r.y0, r.x1, r.y1) for r in segs] == [
        (1, 0, 0.0, 0.0, 1.0, 1.0),
        (1, 1, 1.0, 1.0, 2.0, 0.0),
    ]


def test_snap_cell_budget_raises(spark):
    pdf = spark.createDataFrame([(1, 0.0, 0.0)],
                                "pid long, lon double, lat double")
    sdf = spark.createDataFrame(
        [(1, 0, -170.0, -80.0, 170.0, 80.0)],
        "gid long, seg int, x0 double, y0 double, x1 double, y1 double",
    )
    with pytest.raises(Exception, match="grid cells"):
        snap_nearest(pdf, sdf, 1.0, "pid", bits=6, cell_budget=16).collect()


def test_snap_antimeridian_wrap(spark):
    # segment just west of the IDL; point just east: planar distance
    # is ~360 (documented), so NO match — but the wrap must not
    # produce a crash or a false cell collision either way
    pdf = spark.createDataFrame(
        [(1, -179.9, 0.0), (2, 179.85, 0.1)],
        "pid long, lon double, lat double",
    )
    sdf = spark.createDataFrame(
        [(7, 0, 179.7, 0.0, 179.95, 0.0)],
        "gid long, seg int, x0 double, y0 double, x1 double, y1 double",
    )
    got = {r.pid for r in snap_nearest(pdf, sdf, 0.5, "pid").collect()}
    assert got == {2}


def test_snap_plan_no_python(spark):
    pdf = spark.createDataFrame([(1, 0.0, 0.0)],
                                "pid long, lon double, lat double")
    sdf = spark.createDataFrame(
        [(1, 0, 0.0, 0.0, 1.0, 0.0)],
        "gid long, seg int, x0 double, y0 double, x1 double, y1 double",
    )
    plan = snap_nearest(pdf, sdf, 1.0, "pid")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
