"""morans_i: numpy oracle parity + statistical sanity."""

import numpy as np
import pytest

from geomesa_spark.operators.moran import morans_i


def _oracle(weights, n, ring=1):
    """weights: {(x,y): w} occupied cells. Mirrors the operator's
    integer-moment algebra EXACTLY (incl. the double forms)."""
    occ = dict(weights)
    per = {}
    for (x, y), w in occ.items():
        nn = ns = 0
        for dx in range(-ring, ring + 1):
            for dy in range(-ring, ring + 1):
                if dx == 0 and dy == 0:
                    continue
                k = ((x + dx) % n, y + dy)
                if k in occ:
                    nn += 1
                    ns += occ[k]
        per[(x, y)] = (w, nn, ns)
    N = len(occ)
    W = sum(w for w, _, _ in per.values())
    Q = sum(w * w for w, _, _ in per.values())
    S0 = sum(nn for _, nn, _ in per.values())
    B = sum(w * nn for w, nn, _ in per.values())
    Cs = sum(ns for _, _, ns in per.values())
    A = sum(w * ns for w, _, ns in per.values())
    m = float(W) / N
    denom = float(Q) - 2 * m * W + m * m * N
    g = None
    if S0 > 0 and denom > 0:
        g = (float(N) / S0) * (float(A) - m * B - m * Cs + m * m * S0) / denom
    out = {}
    for k, (w, nn, ns) in per.items():
        li = None
        if denom > 0:
            li = (float(w) - m) * (float(ns) - float(nn) * m) / (denom / N)
        out[k] = (w, nn, ns, li, g, S0, N)
    return out


def test_moran_oracle_parity(spark):
    rng = np.random.default_rng(23)
    pts = []
    # clustered mass (positive autocorrelation) + scatter
    for _ in range(400):
        pts.append((float(rng.normal(20, 8)), float(rng.normal(10, 5))))
    for _ in range(200):
        pts.append((float(rng.uniform(-180, 180)),
                    float(rng.uniform(-90, 90))))
    df = spark.createDataFrame(pts, "lon double, lat double")
    got = {
        (r.x, r.y): (r.w, r.nbr_n, r.nbr_sum, r.local_i, r.global_i,
                     r.s0, r.n_cells)
        for r in morans_i(df, bits=5).collect()
    }
    n = 1 << 5
    weights = {}
    for lon, lat in pts:
        x = int(min(n - 1, max(0, np.floor((lon + 180.0) / 360.0 * n))))
        y = int(min(n - 1, max(0, np.floor((lat + 90.0) / 180.0 * n))))
        weights[(x, y)] = weights.get((x, y), 0) + 1
    exp = _oracle(weights, n)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == exp[k], (k, got[k], exp[k])
    g = next(iter(got.values()))[4]
    assert g > 0.15  # clustered mass -> clear positive autocorrelation


def test_moran_uniform_degenerates_null(spark):
    # every occupied cell weight 1, perfectly uniform 2x2 block:
    # variance 0 -> NULL statistics, not a crash or a fake number
    df = spark.createDataFrame(
        [(0.1, 0.1), (10.1, 0.1), (0.1, 10.1), (10.1, 10.1)],
        "lon double, lat double",
    )
    rows = morans_i(df, bits=5).collect()
    assert all(r.local_i is None and r.global_i is None for r in rows)


def test_moran_plan_no_python(spark):
    df = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double")
    plan = morans_i(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "BroadcastExchange" in plan  # the one-row moments join


def test_geary_oracle_and_sanity(spark):
    """gearys_c vs a brute python mirror of the integer algebra,
    plus statistical sanity: clustered < 1, ~uniform ≈ 1."""
    import math

    from geomesa_spark.operators.moran import gearys_c

    rng = np.random.default_rng(31)

    def run(pts, bits=5, ring=1):
        df = spark.createDataFrame(pts, "lon double, lat double")
        row = gearys_c(df, bits=bits, ring=ring).collect()[0]
        n = 1 << bits
        occ = {}
        for lon, lat in pts:
            x = int(min(n - 1, max(0, math.floor((lon + 180) / 360 * n))))
            y = int(min(n - 1, max(0, math.floor((lat + 90) / 180 * n))))
            occ[(x, y)] = occ.get((x, y), 0) + 1
        per = {}
        for (x, y), w in occ.items():
            nn = ns = 0
            for dx in range(-ring, ring + 1):
                for dy in range(-ring, ring + 1):
                    if dx == 0 and dy == 0:
                        continue
                    k = ((x + dx) % n, y + dy)
                    if k in occ and 0 <= y + dy < n:
                        nn += 1
                        ns += occ[k]
            per[(x, y)] = (w, nn, ns)
        N = len(occ)
        S0 = sum(nn for _, nn, _ in per.values())
        W = sum(w for w, _, _ in per.values())
        Q = sum(w * w for w, _, _ in per.values())
        A = sum(w * ns for w, _, ns in per.values())
        G1 = sum(w * w * nn for w, nn, _ in per.values())
        assert (row.n_cells, row.s0, row.sum_w, row.sum_q,
                row.sum_a, row.sum_g1) == (N, S0, W, Q, A, G1)
        m = float(W) / N
        denom = float(Q) - 2 * m * W + m * m * N
        if S0 > 0 and denom > 0:
            c = (float(N) - 1.0) * (float(G1) - float(A)) / (
                float(S0) * denom)
            assert row.geary_c == pytest.approx(c, rel=1e-12)
            return row.geary_c
        assert row.geary_c is None
        return None

    # brute direct-definition cross-check on a small pattern:
    # C = ((N-1)/(2 S0)) * sum w_ij (xi-xj)^2 / sum (xi - mean)^2
    pts_small = [(float(lon), float(lat))
                 for lon, lat in zip(rng.uniform(-20, 20, 120),
                                     rng.uniform(-20, 20, 120))]
    c_small = run(pts_small, bits=4)
    n = 1 << 4
    occ = {}
    for lon, lat in pts_small:
        x = int(min(n - 1, max(0, math.floor((lon + 180) / 360 * n))))
        y = int(min(n - 1, max(0, math.floor((lat + 90) / 180 * n))))
        occ[(x, y)] = occ.get((x, y), 0) + 1
    keys = list(occ)
    num = s0 = 0
    for i, a in enumerate(keys):
        for b in keys:
            if a == b:
                continue
            dx = (a[0] - b[0]) % n
            if min(dx, n - dx) <= 1 and abs(a[1] - b[1]) <= 1:
                num += (occ[a] - occ[b]) ** 2
                s0 += 1
    mean = sum(occ.values()) / len(occ)
    var = sum((v - mean) ** 2 for v in occ.values())
    c_direct = (len(occ) - 1) / (2 * s0) * num / var
    assert c_small == pytest.approx(c_direct, rel=1e-9)

    # clustered: most mass in a few cells, smooth neighborhoods
    clustered = []
    for _ in range(12):
        cx, cy = rng.uniform(-40, 40), rng.uniform(-40, 40)
        for _ in range(60):
            clustered.append((float(cx + rng.normal(0, 8)),
                              float(cy + rng.normal(0, 8))))
    c_clu = run(clustered, bits=5)
    # scattered uniform
    c_uni = run([(float(lon), float(lat))
                 for lon, lat in zip(rng.uniform(-170, 170, 700),
                                     rng.uniform(-80, 80, 700))], bits=5)
    assert c_clu < c_uni
    assert c_clu < 1.0


def test_join_counts_oracle_and_mc(spark):
    """join_counts vs a brute python mirror (labels, edges, degrees,
    counts exact) AND a Monte-Carlo permutation null validating the
    analytic expected/variance (the Cliff-Ord moment formula)."""
    import math

    from geomesa_spark.operators.moran import join_counts

    rng = np.random.default_rng(17)
    BITS, RING = 4, 1
    n = 1 << BITS
    # two spatial blocks of labels + mixed noise
    pts = []
    for _ in range(300):
        lon, lat = rng.uniform(-170, -20), rng.uniform(-80, 0)
        pts.append((float(lon), float(lat), "red"))
    for _ in range(300):
        lon, lat = rng.uniform(20, 170), rng.uniform(0, 80)
        pts.append((float(lon), float(lat), "blue"))
    for _ in range(150):
        pts.append((float(rng.uniform(-170, 170)),
                    float(rng.uniform(-80, 80)),
                    str(rng.choice(["red", "blue", "green"]))))
    df = spark.createDataFrame(pts, "lon double, lat double, cat string")
    got = {r.label: r for r in join_counts(
        df, "cat", bits=BITS, ring=RING).collect()}

    # python mirror
    per = {}
    for lon, lat, cat in pts:
        x = int(min(n - 1, max(0, math.floor((lon + 180) / 360 * n))))
        y = int(min(n - 1, max(0, math.floor((lat + 90) / 180 * n))))
        per.setdefault((x, y), {}).setdefault(cat, 0)
        per[(x, y)][cat] += 1
    labels = {
        k: max(v.items(), key=lambda it: (it[1], it[0]))[0]
        for k, v in per.items()
    }
    cells = list(labels)
    edges = []
    half = [(dx, dy) for dx in range(-RING, RING + 1)
            for dy in range(-RING, RING + 1)
            if dx > 0 or (dx == 0 and dy > 0)]
    for (x, y) in cells:
        for dx, dy in half:
            k = ((x + dx) % n, y + dy)
            if 0 <= y + dy < n and k in labels:
                edges.append(((x, y), k))
    E = len(edges)
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    K2 = sum(v * v for v in deg.values())
    N = len(cells)
    from collections import Counter

    nb = Counter(labels.values())
    j_same = Counter()
    for a, b in edges:
        if labels[a] == labels[b]:
            j_same[labels[a]] += 1
    assert set(got) == set(nb)
    for lab, r in got.items():
        assert (r.n_label, r.j_same, r.n_cells, r.n_edges, r.sum_k2) \
            == (nb[lab], j_same.get(lab, 0), N, E, K2)
        b = nb[lab]
        eta2 = b * (b - 1) / (N * (N - 1))
        eta3 = b * (b - 1) * (b - 2) / (N * (N - 1) * (N - 2))
        eta4 = (b * (b - 1) * (b - 2) * (b - 3)
                / (N * (N - 1) * (N - 2) * (N - 3)))
        mu = E * eta2
        var = (E * eta2 + (K2 - 2 * E) * eta3
               + (E * E + E - K2) * eta4 - mu * mu)
        assert r.expected_j == pytest.approx(mu, rel=1e-12)
        assert r.var_j == pytest.approx(var, rel=1e-12)
        if var > 0:
            assert r.z == pytest.approx(
                (j_same.get(lab, 0) - mu) / math.sqrt(var), rel=1e-12)

    # the blocked labels read strongly positive
    assert got["red"].z > 3 and got["blue"].z > 3

    # Monte-Carlo null: permute labels over cells, empirical mean/var
    # of J_LL must match the analytic formula
    lab_list = list(labels.values())
    reds = sum(1 for v in lab_list if v == "red")
    b = reds
    eta2 = b * (b - 1) / (N * (N - 1))
    eta3 = b * (b - 1) * (b - 2) / (N * (N - 1) * (N - 2))
    eta4 = (b * (b - 1) * (b - 2) * (b - 3)
            / (N * (N - 1) * (N - 2) * (N - 3)))
    mu = E * eta2
    var = (E * eta2 + (K2 - 2 * E) * eta3
           + (E * E + E - K2) * eta4 - mu * mu)
    idx = {c: i for i, c in enumerate(cells)}
    eidx = [(idx[a], idx[b_]) for a, b_ in edges]
    samples = []
    arr = np.array(lab_list)
    for _ in range(4000):
        p = rng.permutation(arr)
        mask = p == "red"
        samples.append(sum(1 for i, j in eidx if mask[i] and mask[j]))
    s = np.array(samples, dtype=float)
    assert s.mean() == pytest.approx(mu, rel=0.05)
    assert s.var() == pytest.approx(var, rel=0.15)
