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


def _brute_viterbi(track_pts, cand_by_ts, sig2, bt, sw=0.0):
    """Exhaustive max over ALL candidate paths (exact oracle)."""
    import itertools
    import math

    tss = sorted(cand_by_ts)
    best_path, best_score = None, -math.inf
    for path in itertools.product(*[range(len(cand_by_ts[t])) for t in tss]):
        score = 0.0
        for s, t in enumerate(tss):
            d2, gid, _, _, qx, qy = cand_by_ts[t][path[s]]
            score += -d2 / sig2
            if s:
                pt = tss[s - 1]
                pd2, pgid, _, _, pqx, pqy = cand_by_ts[pt][path[s - 1]]
                (ax, ay), (bx, by) = track_pts[pt], track_pts[t]
                dpp = math.hypot(bx - ax, by - ay)
                dq = math.hypot(qx - pqx, qy - pqy)
                score += -abs(dq - dpp) / bt
                if gid != pgid:
                    score -= sw
        # the operator's documented tie rule: among optimal paths,
        # the one whose REVERSED index tuple is lexicographically
        # smallest (final state argmax-first, then each backward
        # predecessor argmax-first)
        key = tuple(reversed(path))
        if score > best_score or (
            score == best_score and key < tuple(reversed(best_path))
        ):
            best_score, best_path = score, path
    return {t: best_path[s] for s, t in enumerate(tss)}


def test_map_match_vs_brute(spark):
    """map_match vs exhaustive path enumeration: every track's
    Viterbi pick equals the brute-force argmax over all candidate
    paths (tie order included)."""
    from geomesa_spark.operators.snap import map_match, snap_candidates

    rng = np.random.default_rng(23)
    # dense small net so fixes see several candidates
    segs = []
    for sid in range(12):
        x0, y0 = float(rng.uniform(0, 4)), float(rng.uniform(0, 4))
        x1, y1 = x0 + float(rng.uniform(-1, 1)), y0 + float(rng.uniform(-1, 1))
        segs.append((sid, 0, x0, y0, x1, y1))
    sdf = spark.createDataFrame(
        segs, "gid long, seg int, x0 double, y0 double, x1 double, y1 double"
    )
    rows = []
    for tk in range(6):
        x, y = rng.uniform(0.5, 3.5), rng.uniform(0.5, 3.5)
        for ts in range(5):
            x += rng.uniform(-0.3, 0.3); y += rng.uniform(-0.3, 0.3)
            rows.append((f"t{tk}", float(ts), float(x), float(y)))
    pdf = spark.createDataFrame(rows, "track string, ts double, lon double, lat double")
    MD, K, SW = 1.0, 4, 1.5
    sig2 = 2.0 * (MD / 4.0) ** 2
    got = map_match(
        pdf, sdf, MD, max_candidates=K, switch_cost=SW
    ).collect()

    # oracle: rebuild the candidate sets exactly as the operator
    # does (snap_candidates + top-K by (dist2, gid, seg))
    pts_struct = spark.createDataFrame(
        [((tk, ts), x, y) for tk, ts, x, y in rows],
        "pid struct<tk:string,ts:double>, lon double, lat double")
    cands = snap_candidates(pts_struct, sdf, MD, "pid").collect()
    by_pt = {}
    for r in cands:
        by_pt.setdefault((r.pid.tk, r.pid.ts), []).append(
            (r.dist2, r.gid, r.seg, r.frac, r.snap_lon, r.snap_lat))
    exp = {}
    for tk in {r[0] for r in rows}:
        track_pts = {ts: (x, y) for t2, ts, x, y in rows if t2 == tk}
        cbt = {
            ts: sorted(by_pt[(tk, ts)])[:K]
            for ts in track_pts if (tk, ts) in by_pt
        }
        if not cbt:
            continue
        pick = _brute_viterbi(track_pts, cbt, sig2, MD, SW)
        for ts, i in pick.items():
            d2, gid, seg, frac, qx, qy = cbt[ts][i]
            exp[(tk, ts)] = (gid, seg, d2, frac, qx, qy)
    assert {(r.track, r.ts) for r in got} == set(exp)
    for r in got:
        e = exp[(r.track, r.ts)]
        assert (r.gid, r.seg, r.dist2, r.frac, r.snap_lon, r.snap_lat) == e


def test_map_match_beats_nearest_on_parallel_roads(spark):
    """The engineered case HMM exists for: two parallel roads 0.02
    apart, a noisy track driving road A — per-point nearest snap
    flips to road B on noisy fixes; map_match stays on A."""
    from geomesa_spark.operators.snap import map_match

    segs = [
        (0, 0, 0.0, 0.0, 10.0, 0.0),      # road A (the true route)
        (1, 0, 0.0, 0.02, 10.0, 0.02),    # parallel road B
    ]
    sdf = spark.createDataFrame(
        segs, "gid long, seg int, x0 double, y0 double, x1 double, y1 double"
    )
    rng = np.random.default_rng(5)
    rows = []
    for ts in range(40):
        # truth: on A; noise sigma 0.008 flips ~1/4 of fixes past
        # the 0.01 midline
        rows.append(("t", float(ts), 0.25 * ts,
                     float(rng.normal(0.0, 0.008))))
    pdf = spark.createDataFrame(
        rows, "track string, ts double, lon double, lat double")
    nearest_flips = sum(1 for _, ts, x, y in rows if abs(y - 0.02) < abs(y))
    assert nearest_flips > 0  # the corpus genuinely tempts a flip
    # pure NK (switch_cost=0) also flips here: the norm transition
    # is blind to lateral sign and a 0.013-deg excursion genuinely
    # reads as "near road B" — position-only data cannot refute it
    nk = map_match(pdf, sdf, 0.1, sigma=0.008).collect()
    assert any(r.gid == 1 for r in nk)
    # the road-change prior is what keeps the chain on the true
    # road: a flip must buy 2*switch_cost of emission advantage
    # (max single-fix advantage here ~0.9 << 6)
    got = map_match(
        pdf, sdf, 0.1, sigma=0.008, switch_cost=3.0
    ).collect()
    assert len(got) == 40
    assert {r.gid for r in got} == {0}


def test_map_match_args(spark):
    from geomesa_spark.operators.snap import map_match

    pdf = spark.createDataFrame(
        [("t", 0.0, 1.0, 1.0)], "track string, ts double, lon double, lat double")
    sdf = spark.createDataFrame(
        [(0, 0, 0.0, 0.0, 2.0, 0.0)],
        "gid long, seg int, x0 double, y0 double, x1 double, y1 double")
    with pytest.raises(ValueError):
        map_match(pdf, sdf, 1.0, sigma=0.0)
    with pytest.raises(ValueError):
        map_match(pdf, sdf, 1.0, max_candidates=0)
    # single-fix track: emission argmax = nearest segment
    out = map_match(pdf, sdf, 2.0).collect()
    assert len(out) == 1 and out[0].gid == 0 and out[0].snap_lat == 0.0


def test_map_match_exact_tie_rule(spark):
    """An engineered exact tie (fixes on the midline between two
    identical parallel segments) pins the documented rule: the
    reversed-path-lexicographic minimum among optimal paths."""
    from geomesa_spark.operators.snap import map_match

    segs = [
        (0, 0, 0.0, -1.0, 10.0, -1.0),
        (1, 0, 0.0, 1.0, 10.0, 1.0),
    ]
    sdf = spark.createDataFrame(
        segs, "gid long, seg int, x0 double, y0 double, x1 double, y1 double"
    )
    # both fixes exactly on y=0: emissions tie (d2=1 to each road);
    # transitions tie by symmetry (stay-stay vs flip-flip)
    rows = [("t", 0.0, 2.0, 0.0), ("t", 1.0, 4.0, 0.0)]
    pdf = spark.createDataFrame(
        rows, "track string, ts double, lon double, lat double")
    got = sorted(
        (r.ts, r.gid) for r in map_match(pdf, sdf, 2.0).collect()
    )
    # candidates per fix sort (d2, gid, seg) -> index 0 = gid 0.
    # staying (0,0) has dq == dpp (zero transition penalty) and ties
    # (1,1); reversed-lex minimum picks (0,0).
    assert got == [(0.0, 0), (1.0, 0)]
