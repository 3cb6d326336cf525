"""S2-style cell id tests: Hilbert correctness, inverses, Spark parity.

The Hilbert continuity test is the load-bearing one — it proves the
orientation tables trace a genuine Hilbert curve (every consecutive
position pair is edge-adjacent in the grid), which is the property
that makes ancestor ranges contiguous and cell-range scans an index.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.functions import s2 as S

RNG = np.random.default_rng(20260819)


def rand_lonlat(n: int):
    lon = RNG.uniform(-180.0, 180.0, n)
    # uniform in sin(lat) -> uniform on the sphere, hits all faces
    lat = np.degrees(np.arcsin(RNG.uniform(-1.0, 1.0, n)))
    return lon, lat


def test_hilbert_continuity_all_faces():
    """Consecutive curve positions are edge-adjacent cells."""
    for level in (1, 2, 3, 5):
        n = 1 << (2 * level)
        for face in range(6):
            fa = np.full(n, face, dtype=np.int64)
            pos = np.arange(n, dtype=np.int64)
            i, j = S.hilbert_ij_np(fa, pos, level)
            step = np.abs(np.diff(i)) + np.abs(np.diff(j))
            assert (step == 1).all(), (face, level)


def test_hilbert_is_bijection_and_inverse():
    level = 6
    n = 1 << (2 * level)
    for face in (0, 1):
        fa = np.full(n, face, dtype=np.int64)
        pos = np.arange(n, dtype=np.int64)
        i, j = S.hilbert_ij_np(fa, pos, level)
        assert len(set(zip(i.tolist(), j.tolist()))) == n
        back = S.hilbert_pos_np(fa, i, j, level)
        np.testing.assert_array_equal(back, pos)


def test_st_uv_inverses():
    u = RNG.uniform(-1.0, 1.0, 10_000)
    s = S.st_from_uv_np(u)
    assert ((s >= 0.0) & (s <= 1.0)).all()
    np.testing.assert_allclose(S.uv_from_st_np(s), u, atol=1e-15)


def test_face_uv_matches_xyz_roundtrip():
    """face/(u,v) reprojected through the face frame recovers the
    original direction (the uv tables are mutually consistent)."""
    lon, lat = rand_lonlat(5_000)
    face, u, v = S.face_uv_np(lon, lat)
    assert set(np.unique(face)) <= set(range(6))
    assert (np.abs(u) <= 1.0 + 1e-12).all() and (np.abs(v) <= 1.0 + 1e-12).all()
    x, y, z = S._xyz_np(lon, lat)
    one = np.ones_like(u)
    frames = [
        (one, u, v), (-u, one, v), (-u, -v, one),
        (-one, -v, -u), (v, -one, -u), (v, u, -one),
    ]
    for f in range(6):
        m = face == f
        fx, fy, fz = (a[m] for a in frames[f])
        norm = np.sqrt(fx * fx + fy * fy + fz * fz)
        np.testing.assert_allclose(fx / norm, x[m], atol=1e-12)
        np.testing.assert_allclose(fy / norm, y[m], atol=1e-12)
        np.testing.assert_allclose(fz / norm, z[m], atol=1e-12)


def test_encode_decode_roundtrip_np():
    lon, lat = rand_lonlat(20_000)
    for level in (4, 12, 30):
        cell = S.s2_cell_np(lon, lat, level)
        face, i, j = S.s2_decode_np(cell, level)
        f2, u, v = S.face_uv_np(lon, lat)
        np.testing.assert_array_equal(face, f2)
        np.testing.assert_array_equal(i, S.ij_np(S.st_from_uv_np(u), level))
        np.testing.assert_array_equal(j, S.ij_np(S.st_from_uv_np(v), level))
        # trailing-bit level marker
        lsb = np.int64(1 << (2 * (S.MAX_LEVEL - level)))
        assert ((cell & (2 * lsb - 1)) == lsb).all()


def test_center_within_cell():
    lon, lat = rand_lonlat(2_000)
    level = 10
    cell = S.s2_cell_np(lon, lat, level)
    clon, clat = S.s2_center_np(cell, level)
    assert S.s2_cell_np(clon, clat, level).tolist() == cell.tolist()


def test_parent_and_range_containment():
    lon, lat = rand_lonlat(10_000)
    child = S.s2_cell_np(lon, lat, 14)
    parent = S.s2_parent_np(child, 6)
    # parent computed structurally == parent computed by re-encoding
    np.testing.assert_array_equal(parent, S.s2_cell_np(lon, lat, 6))
    # every child falls inside its parent's [min, max] range
    for p in np.unique(parent)[:50]:
        lo, hi = S.s2_range_np(int(p), 6)
        m = parent == p
        assert ((child[m] >= lo) & (child[m] <= hi)).all()
    # and no child of a DIFFERENT parent falls in that range
    p0 = int(np.unique(parent)[0])
    lo, hi = S.s2_range_np(p0, 6)
    outside = child[parent != p0]
    assert not ((outside >= lo) & (outside <= hi)).any()


def test_range_scan_equals_parent_filter():
    """BETWEEN on the encoded column == ancestor membership: the
    contiguous-range property that makes the id an index key."""
    lon, lat = rand_lonlat(30_000)
    cell = S.s2_cell_np(lon, lat, 12)
    parent = S.s2_parent_np(cell, 3)
    p0 = int(np.sort(np.unique(parent))[len(np.unique(parent)) // 2])
    lo, hi = S.s2_range_np(p0, 3)
    np.testing.assert_array_equal((cell >= lo) & (cell <= hi), parent == p0)


def test_spark_matches_numpy(spark):
    lon, lat = rand_lonlat(8_000)
    pdf = spark.createDataFrame(
        [(int(k), float(a), float(b)) for k, (a, b) in enumerate(zip(lon, lat))],
        "id long, lon double, lat double",
    )
    level = 12
    out = (
        S.with_s2_cell(pdf, F.col("lon"), F.col("lat"), level, out="cell")
        .select("id", "cell", S.s2_token_col(F.col("cell")).alias("token"))
        .orderBy("id")
        .collect()
    )
    want = S.s2_cell_np(lon, lat, level)
    got = np.array([r["cell"] for r in out], dtype=np.int64)
    np.testing.assert_array_equal(got, want)
    # token: lowercase hex of the uint64 value, trailing zeros stripped
    for r, w in zip(out[:100], want[:100]):
        full = format(np.uint64(w), "016x")
        assert r["token"] == full.rstrip("0")


def test_spark_decode_and_parent(spark):
    lon, lat = rand_lonlat(4_000)
    pdf = spark.createDataFrame(
        [(int(k), float(a), float(b)) for k, (a, b) in enumerate(zip(lon, lat))],
        "id long, lon double, lat double",
    )
    level = 10
    face, i, j = S.s2_decode_ij(F.col("cell"), level)
    rows = (
        S.with_s2_cell(pdf, F.col("lon"), F.col("lat"), level, out="cell")
        .select(
            "id",
            "cell",
            face.alias("face"),
            i.alias("i"),
            j.alias("j"),
            S.s2_parent_col(F.col("cell"), 4).alias("parent"),
        )
        .orderBy("id")
        .collect()
    )
    wf, wi, wj = S.s2_decode_np(
        np.array([r["cell"] for r in rows], dtype=np.int64), level
    )
    np.testing.assert_array_equal([r["face"] for r in rows], wf)
    np.testing.assert_array_equal([r["i"] for r in rows], wi)
    np.testing.assert_array_equal([r["j"] for r in rows], wj)
    np.testing.assert_array_equal(
        [r["parent"] for r in rows], S.s2_cell_np(lon, lat, 4)
    )


def test_spark_plan_is_pure_codegen(spark):
    """No Python evaluation in the encode plan; face/i/j stages stay
    whole-stage codegen (the final projection carries the aggregate()
    fold, which is JVM-interpreted by design — the atomicity trade
    documented on _hilbert_fold_col)."""
    pdf = spark.range(100).select(
        (F.col("id") / 10.0 - 5.0).alias("lon"), (F.col("id") / 20.0).alias("lat")
    )
    plan = (
        S.with_s2_cell(pdf, F.col("lon"), F.col("lat"), 12, out="c")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "*(" in plan  # inner stages still codegen


def test_filter_on_derived_cell_plans_and_runs(spark):
    """Regression: a range predicate on the freshly-derived cell
    column must survive predicate pushdown without exponential alias
    substitution (the staged-projection form OOM'd the driver
    planning `cell BETWEEN lo AND hi`)."""
    lon, lat = rand_lonlat(5_000)
    pdf = spark.createDataFrame(
        [(int(k), float(a), float(b)) for k, (a, b) in enumerate(zip(lon, lat))],
        "id long, lon double, lat double",
    )
    enc = S.with_s2_cell(pdf, F.col("lon"), F.col("lat"), 12, out="cell")
    cells = S.s2_cell_np(lon, lat, 12)
    parents = S.s2_parent_np(cells, 3)
    p0 = int(np.sort(np.unique(parents))[0])
    lo, hi = S.s2_range_np(p0, 3)
    got = sorted(
        r["id"]
        for r in enc.where(F.col("cell").between(lo, hi)).select("id").collect()
    )
    want = np.nonzero(parents == p0)[0].tolist()
    assert got == want and len(want) > 0


def test_level_validation(spark):
    with pytest.raises(ValueError):
        S.with_s2_cell(spark.range(1), F.lit(0.0), F.lit(0.0), 31)


# --- region cover + range scan ------------------------------------------


COVER_BOXES = [
    (10.0, 20.0, 80.0, 60.0),
    (-30.0, 70.0, 30.0, 90.0),      # touches the north pole
    (100.0, -90.0, 140.0, -60.0),   # south polar band
    (-0.5, -0.5, 0.5, 0.5),         # tiny equatorial
    (170.0, -10.0, 180.0, 10.0),    # seam-adjacent
    (-179.9, -89.9, 179.9, 89.9),   # near-world
]


def test_cover_is_conservative_and_budgeted():
    lon, lat = rand_lonlat(100_000)
    for bb in COVER_BOXES:
        xmin, ymin, xmax, ymax = bb
        inside = (lon >= xmin) & (lon <= xmax) & (lat >= ymin) & (lat <= ymax)
        cells = S.s2_cell_np(lon, lat, 12)
        ranges = S.s2_cover_ranges(bb, 12, max_cells=256)
        assert 0 < len(ranges) <= 256
        covered = np.zeros(len(lon), dtype=bool)
        for lo, hi in ranges:
            covered |= (cells >= lo) & (cells <= hi)
        # NEVER misses an inside point (safe prune)...
        assert not (inside & ~covered).any(), bb
        # ...and the ranges are sorted, merged, non-overlapping
        flat = [b for r in ranges for b in r]
        assert flat == sorted(flat)
        assert all(
            ranges[k + 1][0] > ranges[k][1] + 1 for k in range(len(ranges) - 1)
        )


def test_cover_rejects_idl_box():
    with pytest.raises(ValueError):
        S.s2_cover_ranges((170.0, 0.0, -170.0, 10.0), 8)


def test_s2_bbox_scan_matches_direct_filter(spark):
    lon, lat = rand_lonlat(20_000)
    pdf = spark.createDataFrame(
        [(int(k), float(a), float(b)) for k, (a, b) in enumerate(zip(lon, lat))],
        "id long, lon double, lat double",
    )
    for bb in COVER_BOXES[:4]:
        xmin, ymin, xmax, ymax = bb
        got = sorted(
            r["id"]
            for r in S.s2_bbox_scan(
                pdf, F.col("lon"), F.col("lat"), bb, 12
            ).select("id").collect()
        )
        want = np.nonzero(
            (lon >= xmin) & (lon <= xmax) & (lat >= ymin) & (lat <= ymax)
        )[0].tolist()
        assert got == want, bb


def test_s2_bbox_scan_stored_cell_column(spark, tmp_path):
    """The 10^12-row layout: cells STORED at ingest (parquet round
    trip), scan filters the stored column with plain BETWEENs — same
    rows as the direct filter, and the range predicates reach the
    parquet source as PushedFilters (row-group min/max pruning).
    `cell_col=` must point at a stored/materialized column; pointing
    it at a derived expression re-creates the substitution blowup
    the derived path avoids (s2_bbox_scan docstring)."""
    lon, lat = rand_lonlat(10_000)
    pdf = spark.createDataFrame(
        [(int(k), float(a), float(b)) for k, (a, b) in enumerate(zip(lon, lat))],
        "id long, lon double, lat double",
    )
    path = str(tmp_path / "s2_store")
    S.with_s2_cell(pdf, F.col("lon"), F.col("lat"), 12, out="cell").write.parquet(
        path
    )
    stored = spark.read.parquet(path)
    bb = COVER_BOXES[0]
    scan = S.s2_bbox_scan(
        stored, F.col("lon"), F.col("lat"), bb, 12, cell_col="cell",
        max_cells=32,
    )
    got = sorted(r["id"] for r in scan.select("id").collect())
    xmin, ymin, xmax, ymax = bb
    want = np.nonzero(
        (lon >= xmin) & (lon <= xmax) & (lat >= ymin) & (lat <= ymax)
    )[0].tolist()
    assert got == want
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "cell" in plan.split(
        "PushedFilters", 1
    )[1][:2000]
