"""co_travel: resample-align + per-tick eps pairs, python oracle."""

import numpy as np

from geomesa_spark.operators.cooccur import co_travel


def _oracle(tracks, step, eps, min_shared, max_gap=None):
    # resample each track (linear interp), pair counts per tick
    grids = {}
    for t, pts in tracks.items():
        pts = sorted(pts)
        out = {}
        if pts[0][0] % step == 0:
            out[pts[0][0]] = (pts[0][1], pts[0][2])
        for (e0, x0, y0), (e1, x1, y1) in zip(pts, pts[1:]):
            if max_gap is not None and e1 - e0 > max_gap:
                continue
            k = e0 // step + 1
            while k * step <= e1:
                fr = (k * step - e0) / (e1 - e0)
                out[k * step] = (x0 + (x1 - x0) * fr, y0 + (y1 - y0) * fr)
                k += 1
        grids[t] = out
    counts = {}
    names = sorted(grids)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            shared = [
                t for t in grids[a]
                if t in grids[b]
                and (grids[a][t][0] - grids[b][t][0]) ** 2
                + (grids[a][t][1] - grids[b][t][1]) ** 2 <= eps * eps
            ]
            if len(shared) >= min_shared:
                counts[(a, b)] = (
                    len(shared), min(shared), max(shared)
                )
    return counts


def test_co_travel_oracle(spark):
    rng = np.random.default_rng(5)
    tracks = {}
    # 3 convoys of 3 tracks each + 6 loners
    tid = 0
    for c in range(3):
        bx, by = float(rng.uniform(-50, 50)), float(rng.uniform(-30, 30))
        for _ in range(3):
            ox, oy = float(rng.uniform(-0.02, 0.02)), float(
                rng.uniform(-0.02, 0.02)
            )
            es = 0
            pts = []
            for _ in range(40):
                es += int(rng.integers(50, 200))
                pts.append(
                    (es, bx + es * 1e-4 + ox, by + oy)
                )
            tracks[f"t{tid:02d}"] = pts
            tid += 1
    for _ in range(6):
        es = 0
        pts = []
        for _ in range(40):
            es += int(rng.integers(50, 200))
            pts.append(
                (es, float(rng.uniform(-170, 170)),
                 float(rng.uniform(-80, 80)))
            )
        tracks[f"t{tid:02d}"] = pts
        tid += 1

    rows = [
        (t, e, x, y) for t, pts in tracks.items() for e, x, y in pts
    ]
    df = spark.createDataFrame(
        rows, "track string, es long, lon double, lat double"
    )
    got = {
        (r.track_a, r.track_b): (r.n_shared, r.first_ts, r.last_ts)
        for r in co_travel(df, 0.1, 100, 10, "track", "es").collect()
    }
    exp = _oracle(tracks, 100, 0.1, 10)
    assert got == exp
    assert len(exp) == 9  # 3 convoys x C(3,2)


def test_co_travel_plan_no_python(spark):
    df = spark.createDataFrame(
        [("a", 0, 0.0, 0.0), ("a", 500, 0.01, 0.0),
         ("b", 0, 0.0, 0.001), ("b", 500, 0.01, 0.001)],
        "track string, es long, lon double, lat double",
    )
    out = co_travel(df, 0.1, 100, 2, "track", "es")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    rows = out.collect()
    assert [(r.track_a, r.track_b, r.n_shared) for r in rows] == [
        ("a", "b", 6)
    ]
