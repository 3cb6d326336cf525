"""Property-based invariants (hypothesis) for the curve encoding,
range planning, and IDL normalization.

The reference's tests use hand-seeded randomness (`new Random(-574)`,
Z3Test.scala:20-80); these go further: machine-checked invariants
over the whole input domain. Pure numpy/driver code — no Spark
session, so the suite stays fast.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geomesa_spark.functions import cells as C
from geomesa_spark.functions import geometry as G
from geomesa_spark.plans import cover as V

lon = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lat = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)


@given(x=st.integers(0, C.XY_SIZE - 1), y=st.integers(0, C.XY_SIZE - 1))
def test_z2_roundtrip(x, y):
    z = C.z2_encode_np(np.array([x]), np.array([y]))
    dx, dy = C.z2_decode_np(z)
    assert (int(dx[0]), int(dy[0])) == (x, y)


@given(
    x=st.integers(0, C.XY_SIZE - 1),
    y=st.integers(0, C.XY_SIZE - 1),
    t=st.integers(0, C.T_SIZE - 1),
)
def test_z3_roundtrip(x, y, t):
    z = C.z3_encode_np(np.array([x]), np.array([y]), np.array([t]))
    dx, dy, dt = C.z3_decode_np(z)
    assert (int(dx[0]), int(dy[0]), int(dt[0])) == (x, y, t)


@given(ln=lon, lt=lat)
def test_cell_parent_is_prefix(ln, lt):
    """A finer cell's parent at any coarser resolution equals the
    direct encoding at that resolution (the geohash-prefix law)."""
    fine = C.z2_encode_np(
        C.lon_to_x_np(np.array([ln])), C.lat_to_y_np(np.array([lt]))
    )
    for bits in (4, 8, 12):
        direct = C.z2_encode_np(
            C.lon_to_x_np(np.array([ln]), bits),
            C.lat_to_y_np(np.array([lt]), bits),
        )
        parent = int(fine[0]) >> (2 * (C.XY_BITS - bits))
        assert parent == int(direct[0])


@settings(max_examples=60)
@given(
    x0=lon, y0=lat, w=st.floats(0.0, 40.0), h=st.floats(0.0, 40.0),
    ln=lon, lt=lat,
)
def test_zranges_superset(x0, y0, w, h, ln, lt):
    """Every point inside a bbox encodes into some emitted z-range
    (the cover is a superset — false positives allowed, false
    negatives never)."""
    x1, y1 = min(x0 + w, 180.0), min(y0 + h, 90.0)
    if not (x0 <= ln <= x1 and y0 <= lt <= y1):
        return
    bits = 8
    ranges = V.zranges_2d(x0, y0, x1, y1, bits=bits, max_ranges=32)
    cell = int(
        C.z2_encode_np(
            C.lon_to_x_np(np.array([ln]), bits),
            C.lat_to_y_np(np.array([lt]), bits),
        )[0]
    )
    assert any(lo <= cell <= hi for lo, hi in ranges)


@settings(max_examples=40)
@given(
    x=st.floats(-170, 150), y=st.floats(-80, 60),
    dx=st.floats(1.0, 20.0), dy=st.floats(1.0, 20.0),
    fx=st.floats(0.05, 0.95), fy=st.floats(0.05, 0.9),
)
def test_polyfill_superset(x, y, dx, dy, fx, fy):
    """A point inside a triangle lands in the triangle's cell cover."""
    wkt = f"POLYGON (({x} {y}, {x + dx} {y}, {x + dx / 2} {y + dy}, {x} {y}))"
    geom = G.parse_wkt(wkt)
    # interior sample: barycentric-ish point safely inside
    px = x + dx * (0.25 + fx * 0.5 * (1 - fy))
    py = y + dy * fy * 0.5
    if not bool(G.contains(geom, np.array([px]), np.array([py]))[0]):
        return
    cells_, interior, bits = V.polyfill_detail(geom, 10)
    cell = int(
        C.z2_encode_np(
            C.lon_to_x_np(np.array([px]), bits),
            C.lat_to_y_np(np.array([py]), bits),
        )[0]
    )
    assert cell in set(int(c) for c in cells_)


@given(
    rs=st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 200)),
        min_size=0, max_size=20,
    )
)
def test_merge_ranges_preserves_set(rs):
    ranges = [(lo, lo + w) for lo, w in rs]
    merged = V.merge_ranges(ranges)
    # disjoint, sorted, non-adjacent
    for (a0, a1), (b0, b1) in zip(merged, merged[1:]):
        assert a1 + 1 < b0
    covered = set()
    for lo, hi in ranges:
        covered.update(range(lo, hi + 1))
    mcovered = set()
    for lo, hi in merged:
        mcovered.update(range(lo, hi + 1))
    assert covered == mcovered


@settings(max_examples=60)
@given(
    x0=st.floats(100.0, 179.0), w=st.floats(10.0, 120.0),
    y0=st.floats(-80.0, 70.0), h=st.floats(1.0, 20.0),
    ln=lon, lt=lat,
)
def test_normalize_idl_containment_equivalence(x0, w, y0, h, ln, lt):
    """An IDL-crossing box polygon, normalized, contains exactly the
    points the unwrapped-longitude test contains."""
    x1 = x0 + w  # may exceed 180 -> crosses the IDL
    y1 = min(y0 + h, 90.0)
    wkt = f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
    ng = G.normalize_idl(G.parse_wkt(wkt))
    got = bool(G.contains(ng, np.array([ln]), np.array([lt]))[0])
    ln_u = ln + 360.0 if ln < x0 - 180.0 else ln
    exp = (x0 < ln_u < x1) and (y0 < lt < y1)
    # boundary-coincident samples are tolerance-level (as in JTS):
    # skip them instead of asserting either way. The +-180 seam is a
    # boundary the split itself introduces (cut-line edges), so
    # points on it are boundary cases too.
    eps = 1e-9
    on_boundary = (
        min(abs(ln_u - x0), abs(ln_u - x1)) < eps
        or min(abs(lt - y0), abs(lt - y1)) < eps
        or 180.0 - abs(ln) < eps
    )
    if not on_boundary:
        assert got == exp


@settings(max_examples=200)
@given(
    qlon=lon,
    qlat=lat,
    log_m=st.floats(min_value=0.0, max_value=7.0),  # 1 m .. 10,000 km
    bearing=st.floats(min_value=0.0, max_value=2 * np.pi),
    frac=st.floats(min_value=0.0, max_value=1.0),
)
def test_geodesic_buffer_box_covers_every_disc_point(
    qlon, qlat, log_m, bearing, frac
):
    """Conservativeness invariant for the shared pruning helper: ANY
    point within `meters` great-circle distance of the query lies
    inside geodesic_buffer_box (after IDL split). Destination points
    are generated by the exact spherical direct formula at a random
    bearing and fraction of the radius."""
    import math

    R = 6371008.8
    meters = 10.0 ** log_m
    box = G.geodesic_buffer_box(qlon, qlat, qlon, qlat, meters)
    r = (meters * frac) / R
    p1 = math.radians(qlat)
    sy = math.asin(
        math.sin(p1) * math.cos(r)
        + math.cos(p1) * math.sin(r) * math.cos(bearing)
    )
    dlon = math.atan2(
        math.sin(bearing) * math.sin(r) * math.cos(p1),
        math.cos(r) - math.sin(p1) * math.sin(sy),
    )
    x = math.degrees(math.radians(qlon) + dlon)
    if x > 180.0:
        x -= 360.0
    if x < -180.0:
        x += 360.0
    y = math.degrees(sy)
    eps = 1e-9
    ok = any(
        (bx[0] - eps <= x <= bx[2] + eps)
        and (bx[1] - eps <= y <= bx[3] + eps)
        for bx in G.idl_safe_boxes(*box)
    )
    assert ok, (qlon, qlat, meters, bearing, frac, (x, y), box)
