"""hausdorff_join: brute-force python oracle parity."""

import math

import numpy as np

from geomesa_spark.operators.trajsim import hausdorff_join


def _brute(A, B):
    def h(X, Y):
        return max(
            min((ax - bx) ** 2 + (ay - by) ** 2 for bx, by in Y)
            for ax, ay in X
        )
    return math.sqrt(max(h(A, B), h(B, A)))


def test_hausdorff_oracle(spark):
    rng = np.random.default_rng(15)
    tracks = {
        f"t{i}": [
            (float(rng.uniform(-10, 10)), float(rng.uniform(-5, 5)))
            for _ in range(int(rng.integers(3, 25)))
        ]
        for i in range(12)
    }
    prs = [("t0", "t1"), ("t2", "t3"), ("t4", "t9"), ("t5", "t5"),
           ("t10", "t11")]
    pts = spark.createDataFrame(
        [(t, x, y) for t, ps in tracks.items() for x, y in ps],
        "track string, lon double, lat double",
    )
    pairs = spark.createDataFrame(prs, "track_a string, track_b string")
    got = {(r.track_a, r.track_b): r.hausdorff
           for r in hausdorff_join(pts, pairs).collect()}
    exp = {(a, b): _brute(tracks[a], tracks[b]) for a, b in prs}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == exp[k], (k, got[k], exp[k])
    assert got[("t5", "t5")] == 0.0  # self-distance


def test_hausdorff_asymmetry_direction(spark):
    # A inside B's extent but B far outside A's: directed distances
    # differ; symmetric H takes the max
    A = [(0.0, 0.0), (1.0, 0.0)]
    B = [(0.0, 0.0), (1.0, 0.0), (10.0, 0.0)]
    pts = spark.createDataFrame(
        [("a", x, y) for x, y in A] + [("b", x, y) for x, y in B],
        "track string, lon double, lat double",
    )
    pairs = spark.createDataFrame([("a", "b")],
                                  "track_a string, track_b string")
    out = hausdorff_join(pts, pairs).collect()
    assert out[0].hausdorff == 9.0  # h(b->a) dominates


def test_hausdorff_plan_no_python_no_cartesian(spark):
    pts = spark.createDataFrame(
        [("a", 0.0, 0.0), ("b", 1.0, 1.0)],
        "track string, lon double, lat double",
    )
    pairs = spark.createDataFrame([("a", "b")],
                                  "track_a string, track_b string")
    plan = hausdorff_join(pts, pairs)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
