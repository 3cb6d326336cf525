"""DBSCAN: brute-force python oracle parity + plan shape."""

import math

import numpy as np
import pytest

from geomesa_spark.operators.cluster import dbscan, eps_pairs


def _brute_dbscan(pts, eps, min_pts):
    """Reference DBSCAN with the operator's deterministic label
    rules: cluster = min core id of the core component, border =
    min cluster among core neighbors, noise absent."""
    n = len(pts)
    ids = sorted(pts)
    nb = {i: set() for i in ids}
    for i in ids:
        for j in ids:
            if i < j:
                dx = pts[i][0] - pts[j][0]
                dy = pts[i][1] - pts[j][1]
                if dx * dx + dy * dy <= eps * eps:
                    nb[i].add(j)
                    nb[j].add(i)
    core = {i for i in ids if len(nb[i]) + 1 >= min_pts}
    # components over core-core edges
    label = {i: i for i in core}

    def find(x):
        while label[x] != x:
            label[x] = label[label[x]]
            x = label[x]
        return x

    for i in core:
        for j in nb[i]:
            if j in core:
                a, b = find(i), find(j)
                if a != b:
                    label[max(a, b)] = min(a, b)
    out = {}
    for i in core:
        out[i] = (find(i), True)
    for i in ids:
        if i in core:
            continue
        cand = [out[j][0] for j in nb[i] if j in core]
        if cand:
            out[i] = (min(cand), False)
    return out


def test_dbscan_oracle_parity(spark):
    rng = np.random.default_rng(7)
    pts = {}
    pid = 0
    # three blobs + sparse noise
    for cx, cy, k in [(0.0, 0.0, 60), (3.0, 3.0, 40), (-4.0, 1.0, 25)]:
        for _ in range(k):
            pts[pid] = (
                cx + float(rng.normal(0, 0.15)),
                cy + float(rng.normal(0, 0.15)),
            )
            pid += 1
    for _ in range(30):
        pts[pid] = (
            float(rng.uniform(-10, 10)),
            float(rng.uniform(-8, 8)),
        )
        pid += 1
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts.items()],
        "id long, lon double, lat double",
    )
    got = {
        r.id: (r.cluster, r.is_core)
        for r in dbscan(df, 0.5, 5, "id", metric="planar").collect()
    }
    exp = _brute_dbscan(pts, 0.5, 5)
    assert got == exp
    # sanity: the three blobs exist as distinct clusters
    assert len({c for c, _ in exp.values()}) >= 3


def test_dbscan_min_pts_1_isolated_points(spark):
    # every point core; isolated points are singleton clusters
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.001, 0.0), (3, 50.0, 50.0)],
        "id long, lon double, lat double",
    )
    got = {
        r.id: (r.cluster, r.is_core)
        for r in dbscan(df, 0.01, 1, "id").collect()
    }
    assert got == {1: (1, True), 2: (1, True), 3: (3, True)}


def test_eps_pairs_exactly_once_antimeridian(spark):
    # pair straddling the dateline: wrap keys generate the candidate
    # but the PLANAR predicate correctly rejects it (360 deg apart);
    # a same-side pair emits exactly one row
    df = spark.createDataFrame(
        [(1, 179.95, 0.0), (2, -179.95, 0.0), (3, 179.96, 0.0)],
        "id long, lon double, lat double",
    )
    rows = eps_pairs(df, 0.5, "id").collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 3)]


def test_eps_pairs_haversine(spark):
    # haversine mode: dateline neighbors DO match geodesically
    df = spark.createDataFrame(
        [(1, 179.95, 0.0), (2, -179.95, 0.0)],
        "id long, lon double, lat double",
    )
    rows = eps_pairs(
        df, 0.5, "id", metric="haversine", dist_m=12000.0
    ).collect()
    assert len(rows) == 1
    assert rows[0].dist_m == pytest.approx(
        math.radians(0.1) * 6371008.8, rel=1e-6
    )


def test_dbscan_plan_no_python_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, float(i) * 0.001, 0.0) for i in range(50)],
        "id long, lon double, lat double",
    )
    out = dbscan(df, 0.01, 3, "id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # result is checkpointed; assert on the BUILD plan of eps_pairs
    pplan = (
        eps_pairs(df, 0.01, "id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for p in (plan, pplan):
        assert "Python" not in p, p
        assert "CartesianProduct" not in p, p
        assert "BroadcastNestedLoopJoin" not in p, p
    assert out.count() == 50


def _brute_st_dbscan(pts, eps, eps_t, min_pts):
    """pts: id -> (x, y, t). Two-eps neighborhood (ST-DBSCAN)."""
    ids = sorted(pts)
    nb = {i: set() for i in ids}
    for i in ids:
        for j in ids:
            if i < j:
                dx = pts[i][0] - pts[j][0]
                dy = pts[i][1] - pts[j][1]
                if (dx * dx + dy * dy <= eps * eps
                        and abs(pts[i][2] - pts[j][2]) <= eps_t):
                    nb[i].add(j)
                    nb[j].add(i)
    core = {i for i in ids if len(nb[i]) + 1 >= min_pts}
    label = {i: i for i in core}

    def find(x):
        while label[x] != x:
            label[x] = label[label[x]]
            x = label[x]
        return x

    for i in core:
        for j in nb[i]:
            if j in core:
                a, b = find(i), find(j)
                if a != b:
                    label[max(a, b)] = min(a, b)
    out = {}
    for i in core:
        out[i] = (find(i), True)
    for i in ids:
        if i in core:
            continue
        cand = [out[j][0] for j in nb[i] if j in core]
        if cand:
            out[i] = (min(cand), False)
    return out


def test_st_dbscan_oracle_parity(spark):
    rng = np.random.default_rng(19)
    pts = {}
    pid = 0
    # one PLACE busy in three separate episodes -> three ST clusters
    # (plain DBSCAN would merge them into one), plus a moving blob
    for ep in range(3):
        for _ in range(30):
            pts[pid] = (
                float(rng.normal(0, 0.1)),
                float(rng.normal(0, 0.1)),
                float(ep * 10000 + rng.uniform(0, 600)),
            )
            pid += 1
    for _ in range(40):
        pts[pid] = (
            5.0 + float(rng.normal(0, 0.12)),
            5.0 + float(rng.normal(0, 0.12)),
            float(rng.uniform(0, 1200)),
        )
        pid += 1
    for _ in range(25):  # noise
        pts[pid] = (
            float(rng.uniform(-10, 10)),
            float(rng.uniform(-8, 8)),
            float(rng.uniform(0, 30000)),
        )
        pid += 1
    df = spark.createDataFrame(
        [(i, x, y, t) for i, (x, y, t) in pts.items()],
        "id long, lon double, lat double, t double",
    )
    got = {
        r.id: (r.cluster, r.is_core)
        for r in dbscan(
            df, 0.5, 5, "id", metric="planar", t_col="t", eps_t=900.0
        ).collect()
    }
    exp = _brute_st_dbscan(pts, 0.5, 900.0, 5)
    assert got == exp
    # the one place really did split into its three temporal episodes
    place_clusters = {exp[i][0] for i in range(90) if i in exp}
    assert len(place_clusters) == 3
    # plain DBSCAN on the same points merges them
    flat = {
        r.id: r.cluster
        for r in dbscan(df, 0.5, 5, "id", metric="planar").collect()
    }
    assert len({flat[i] for i in range(90) if i in flat}) == 1


def test_st_eps_pairs_exactly_once_bucket_straddle(spark):
    # pair within eps_t but in adjacent time buckets: counted once
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 899.0), (2, 0.01, 0.0, 901.0),
         (3, 0.01, 0.0, 5000.0)],
        "id long, lon double, lat double, t double",
    )
    out = eps_pairs(
        df, 0.5, "id", metric="planar", t_col="t", eps_t=900.0
    ).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]


def test_st_eps_pairs_args_validation(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)],
                               "id long, lon double, lat double")
    with pytest.raises(ValueError, match="only for with_dt"):
        eps_pairs(df, 0.5, "id", t_col="t")
    with pytest.raises(ValueError, match="eps_t requires t_col"):
        eps_pairs(df, 0.5, "id", eps_t=1.0)
    with pytest.raises(ValueError, match="with_dt requires t_col"):
        eps_pairs(df, 0.5, "id", with_dt=True)
    with pytest.raises(ValueError, match="eps_t"):
        eps_pairs(df, 0.5, "id", t_col="t", eps_t=0.0)


def test_dbscan_duplicate_collapse_parity(spark):
    """Exact-duplicate coordinates collapse to weighted reps before
    mining; result must equal the point-level brute oracle."""
    rng = np.random.default_rng(11)
    pts = {}
    pid = 0
    for cx, cy, k in [(0.0, 0.0, 30), (2.5, 2.5, 20)]:
        for _ in range(k):
            pts[pid] = (cx + rng.normal(0, 0.3), cy + rng.normal(0, 0.3))
            pid += 1
    # duplicate stacks: 7 copies at one coord, 3 at another, 2 at a
    # lonely coord (non-core under min_pts=5 unless neighbors help)
    for coord, k in [((0.1, 0.1), 7), ((2.6, 2.4), 3), ((9.0, 9.0), 2)]:
        for _ in range(k):
            pts[pid] = coord
            pid += 1
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in pts.items()],
        "id long, lon double, lat double",
    )
    got = {
        r.id: (r.cluster, r.is_core)
        for r in dbscan(df, 0.5, 5, "id").collect()
    }
    assert got == _brute_dbscan(pts, 0.5, 5)


def test_dbscan_colocated_hot_cell_bounded(spark):
    """10^4 co-located points: the collapse makes the mining cost one
    representative row (5*10^7 pairs never materialize) and the
    labels stay exact — every duplicate is core and clusters to the
    minimum id, and a nearby point (core too: 10^4 neighbors) joins
    the same cluster."""
    n = 10_000
    rows = [(i, 10.0, 10.0) for i in range(n)]
    rows.append((n, 10.0, 10.3))        # near the POI -> core, same cluster
    rows.append((n + 1, 50.0, 50.0))    # noise: absent
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    out = dbscan(df, 0.5, 5, "id").collect()
    got = {r.id: (r.cluster, r.is_core) for r in out}
    assert len(got) == n + 1            # noise point absent
    for i in range(n + 1):
        assert got[i] == (0, True)


def test_eps_pairs_cell_budget_guard(spark):
    """cell_budget raises loudly on a quadratic hot cell and stays
    silent when the densest cell fits."""
    hot = spark.createDataFrame(
        [(i, 0.0, 0.0) for i in range(200)], "id long, lon double, lat double"
    )
    with pytest.raises(ValueError, match="hot-cell budget"):
        eps_pairs(hot, 0.5, "id", cell_budget=10_000).count()
    # same points, generous budget: runs and emits all C(200,2) pairs
    assert eps_pairs(hot, 0.5, "id", cell_budget=100_000).count() == 19_900
    spread = spark.createDataFrame(
        [(i, i * 0.9 - 90.0, 0.0) for i in range(200)],
        "id long, lon double, lat double",
    )
    assert eps_pairs(spread, 0.5, "id", cell_budget=10).count() == 0
