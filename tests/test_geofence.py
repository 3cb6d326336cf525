"""Geofence enter/exit vs a python state-machine oracle."""

import pytest
from pyspark.sql import functions as F

from geomesa_spark.functions import cells as C
from geomesa_spark.functions import geometry as G
from geomesa_spark.operators.geofence import geofence_events

FENCES = [
    ("box_a", G.box_wkt(0.0, 0.0, 10.0, 10.0)),
    ("box_b", G.box_wkt(5.0, 5.0, 25.0, 25.0)),  # overlaps box_a
]


def _pts(spark, rows):
    df = spark.createDataFrame(
        rows, "track string, es long, lon double, lat double"
    )
    return df.withColumn("cell", C.z2_cell(F.col("lon"), F.col("lat")))


def _oracle(rows, fences, include_open=False):
    """Brute state machine over the sorted track timeline."""
    geoms = {fid: G.parse_wkt(w) for fid, w in fences}
    import numpy as np

    tracks = {}
    for t, es, lon, lat in sorted(rows):
        tracks.setdefault(t, []).append((es, lon, lat))
    ev = set()
    for t, pts in tracks.items():
        for fid, geom in geoms.items():
            inside = [
                bool(G.contains(geom, np.array([lon]), np.array([lat]))[0])
                for _, lon, lat in pts
            ]
            for i, (es, lon, lat) in enumerate(pts):
                if inside[i] and (i == 0 or not inside[i - 1]):
                    ev.add((t, fid, "enter", es, i + 1))
                if inside[i] and i + 1 < len(pts) and not inside[i + 1]:
                    ev.add((t, fid, "exit", es, i + 1))
                if (
                    include_open
                    and inside[i]
                    and i + 1 == len(pts)
                ):
                    ev.add((t, fid, "open", es, i + 1))
    return ev


ROWS = [
    # track x: out -> in_a -> in_both -> in_b -> out -> in_a (ends inside)
    ("x", 10, -5.0, -5.0),
    ("x", 20, 2.0, 2.0),
    ("x", 30, 7.0, 7.0),
    ("x", 40, 20.0, 20.0),
    ("x", 50, 40.0, 40.0),
    ("x", 60, 1.0, 9.0),
    # track y: single isolated inside point (enter AND exit same seq)
    ("y", 5, -50.0, 0.0),
    ("y", 6, 3.0, 3.0),
    ("y", 7, -50.0, 0.0),
    # track z: never inside
    ("z", 1, 100.0, 50.0),
    ("z", 2, 120.0, 60.0),
]


def _got(df):
    return {
        (r.track, r.fence_id, r.event, r.ts, r.seq) for r in df.collect()
    }


def test_transitions_match_oracle(spark):
    out = geofence_events(_pts(spark, ROWS), FENCES, "track", "es")
    assert _got(out) == _oracle(ROWS, FENCES)


def test_include_open(spark):
    out = geofence_events(
        _pts(spark, ROWS), FENCES, "track", "es", include_open=True
    )
    want = _oracle(ROWS, FENCES, include_open=True)
    assert _got(out) == want
    # track x ends inside box_a -> open row exists
    assert ("x", "box_a", "open", 60, 6) in want


def test_isolated_point_enters_and_exits(spark):
    out = geofence_events(_pts(spark, ROWS), FENCES, "track", "es")
    got = _got(out)
    assert ("y", "box_a", "enter", 6, 2) in got
    assert ("y", "box_a", "exit", 6, 2) in got


def test_plan_no_python_no_cartesian(spark):
    plan = (
        geofence_events(_pts(spark, ROWS), FENCES, "track", "es")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
