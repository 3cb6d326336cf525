"""PageRank vs an independent python integer replay and structural
properties (star center ranks highest, chain decays, damping=den
sanity)."""

import numpy as np
import pytest

from geomesa_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _brute(pairs, rounds, num=85, den=100, scale=10**9):
    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    od = {}
    for a, _ in pairs:
        od[a] = od.get(a, 0) + 1
    t = scale * (den - num) // den
    r = {n: scale for n in nodes}
    for _ in range(rounds):
        inn = {n: 0 for n in nodes}
        for a, b in pairs:
            inn[b] += r[a] // od[a]
        r = {n: t + (num * inn[n]) // den for n in nodes}
    return r


def test_pagerank_exact_replay(spark):
    rng = np.random.default_rng(6)
    n = 120
    pairs = {(int(rng.integers(0, n)), int(rng.integers(0, n)))
             for _ in range(600)}
    pairs = sorted(pairs)
    got = {r.node: r for r in pagerank(
        _edges(spark, pairs), rounds=8).collect()}
    want = _brute(pairs, 8)
    assert {k: v.rank_fp for k, v in got.items()} == want
    for r in got.values():
        assert r.rank == float(r.rank_fp) / 1e9


def test_pagerank_structure(spark):
    # star: 20 leaves -> center; center collects all damped mass
    star = [(i, 100) for i in range(20)]
    got = {r.node: r.rank_fp for r in pagerank(
        _edges(spark, star), rounds=12).collect()}
    assert got[100] == max(got.values())
    assert all(got[i] == got[0] for i in range(20))
    # chain decays along 0 -> 1 -> 2 (but 0, with no inflow, floors
    # at the teleport)
    chain = [(0, 1), (1, 2)]
    g2 = {r.node: r.rank_fp for r in pagerank(
        _edges(spark, chain), rounds=12).collect()}
    assert g2[1] > g2[0] and g2[2] > g2[0]

    with pytest.raises(ValueError):
        pagerank(_edges(spark, chain), rounds=0)
    with pytest.raises(ValueError):
        pagerank(_edges(spark, chain), damping_num=100)


def test_triangle_counts(spark):
    """Triangles/clustering vs a brute python enumeration: random
    graph, complete K5 (every node C(4,2)=6 triangles, clustering
    1), path (0 triangles), direction/dup/self-loop folding."""
    from geomesa_spark.operators.graph import (
        transitivity, triangle_counts,
    )

    rng = np.random.default_rng(17)
    n = 60
    pairs = {(int(rng.integers(0, n)), int(rng.integers(0, n)))
             for _ in range(500)}
    # noise: duplicates both directions + self loops
    raw = sorted(pairs) + [(b, a) for a, b in sorted(pairs)][:50] \
        + [(3, 3), (7, 7)]
    got = {r.node: r for r in triangle_counts(
        _edges(spark, raw)).collect()}

    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    n_tri = 0
    for a, b in und:
        # count each triangle once: (a, b) with a < b plus c > b
        for c in (adj[a] & adj[b]):
            if a < b < c:
                n_tri += 1
                for v in (a, b, c):
                    tri[v] += 1
    assert set(got) == set(adj)
    for v in adj:
        assert got[v].degree == len(adj[v]), v
        assert got[v].triangles == tri[v], v
        d = len(adj[v])
        want_c = (2.0 * tri[v] / (d * (d - 1.0))) if d >= 2 else None
        assert got[v].clustering == want_c, v
    t = transitivity(_edges(spark, raw)).collect()[0]
    assert t.n_triangles == n_tri
    assert t.n_wedges == sum(
        d * (d - 1) // 2 for d in map(len, adj.values()))

    # K5: all triangles, clustering exactly 1
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    g5 = {r.node: r for r in triangle_counts(_edges(spark, k5)).collect()}
    assert all(r.triangles == 6 and r.clustering == 1.0
               for r in g5.values())
    # path: no triangles
    path = [(i, i + 1) for i in range(6)]
    gp = transitivity(_edges(spark, path)).collect()[0]
    assert gp.n_triangles == 0 and gp.transitivity == 0.0
    # wedge-free graph (one edge): transitivity undefined -> NULL
    ge = transitivity(_edges(spark, [(0, 1)])).collect()[0]
    assert ge.n_wedges == 0 and ge.transitivity is None


def test_k_core(spark):
    """k-core peeling vs brute python peeling (the k-core is unique
    regardless of deletion order): K4 with pendant tails, random
    graph at several k, empty core, k validation."""
    from geomesa_spark.operators.graph import k_core

    def brute(pairs, k):
        und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
        while True:
            deg = {}
            for a, b in und:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            drop = {v for v, d in deg.items() if d < k}
            if not drop:
                return und
            und = {(a, b) for a, b in und
                   if a not in drop and b not in drop}

    # K4 (0-3) + tail 3-10-11 + pendant 0-20
    g = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    g += [(3, 10), (10, 11), (0, 20)]
    for k in (1, 2, 3, 4):
        got = {(r.a, r.b) for r in k_core(_edges(spark, g), k).collect()}
        assert got == brute(g, k), k
    assert k_core(_edges(spark, g), 3).count() == 6  # K4 only
    assert k_core(_edges(spark, g), 4).count() == 0

    rng = np.random.default_rng(23)
    pairs = sorted({(int(rng.integers(0, 80)), int(rng.integers(0, 80)))
                    for _ in range(300)})
    for k in (2, 4, 6):
        got = {(r.a, r.b)
               for r in k_core(_edges(spark, pairs), k).collect()}
        assert got == brute(pairs, k), k

    import pytest as _pt
    with _pt.raises(ValueError):
        k_core(_edges(spark, g), 0)


def test_trustrank_sources(spark):
    """Seeded teleport (TrustRank): exact python replay; nodes
    unreachable from the seed set stay at exactly 0."""
    from geomesa_spark.operators.graph import pagerank

    rng = np.random.default_rng(41)
    # two components: 0-39 (contains seeds), 100-119 (seedless)
    pairs = {(int(rng.integers(0, 40)), int(rng.integers(0, 40)))
             for _ in range(200)}
    pairs |= {(int(rng.integers(100, 120)), int(rng.integers(100, 120)))
              for _ in range(60)}
    pairs = sorted(pairs)
    seeds = [0, 1, 2, 3]
    sdf = spark.createDataFrame([(s,) for s in seeds], "seed long")
    got = {r.node: r.rank_fp for r in pagerank(
        _edges(spark, pairs), rounds=7, sources=sdf).collect()}

    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    od = {}
    for a, _ in pairs:
        od[a] = od.get(a, 0) + 1
    scale, num, den = 10**9, 85, 100
    t = scale * (den - num) // den
    r = {v: (scale if v in seeds else 0) for v in nodes}
    for _ in range(7):
        inn = {v: 0 for v in nodes}
        for a, b in pairs:
            inn[b] += r[a] // od[a]
        r = {v: (t if v in seeds else 0) + (num * inn[v]) // den
             for v in nodes}
    assert got == r
    assert all(got[v] == 0 for v in nodes if v >= 100)
    assert all(got[s] > 0 for s in seeds)


def test_neighbor_overlap(spark):
    """Common-neighbor / Jaccard scores vs brute python sets: known
    K4 overlaps, zero-overlap pairs, absent-node NULLs."""
    from geomesa_spark.operators.graph import neighbor_overlap

    rng = np.random.default_rng(47)
    pairs_g = sorted({(int(rng.integers(0, 50)), int(rng.integers(0, 50)))
                      for _ in range(220)})
    edges = _edges(spark, pairs_g)
    adj = {}
    for a, b in pairs_g:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    cand = [(i, (i * 7 + 3) % 50) for i in range(50)]
    cand += [(0, 999)]  # absent node
    cdf = spark.createDataFrame(cand, "u long, v long")
    got = {(r.u, r.v): r for r in neighbor_overlap(edges, cdf).collect()}
    assert len(got) == len(set(cand))
    for u, v in set(cand):
        r = got[(u, v)]
        nu, nv = adj.get(u), adj.get(v)
        if nu is None or nv is None:
            missing = (nu is None and u == 999) or v == 999
            assert r.jaccard is None
            continue
        cn = len(nu & nv)
        assert r.cn == cn, (u, v)
        assert r.deg_u == len(nu) and r.deg_v == len(nv)
        want_j = (float(cn) / float(len(nu) + len(nv) - cn)
                  if len(nu) + len(nv) - cn > 0 else None)
        assert r.jaccard == want_j, (u, v)


def test_hits(spark):
    """HITS vs exact python replay: bipartite hub/authority
    separation, directed semantics (reversal swaps roles)."""
    from geomesa_spark.operators.graph import hits

    rng = np.random.default_rng(53)
    # hubs 0..4 point at authorities 100..109, plus noise
    pairs = {(h, a) for h in range(5) for a in range(100, 110)
             if rng.random() < 0.8}
    pairs |= {(int(rng.integers(200, 240)), int(rng.integers(200, 240)))
              for _ in range(60)}
    pairs = sorted({(a, b) for a, b in pairs if a != b})
    got = {r.node: r for r in hits(_edges(spark, pairs), rounds=4).collect()}

    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    h = {v: 1 for v in nodes}
    for _ in range(4):
        a = {v: 0 for v in nodes}
        for s, d in pairs:
            a[d] += h[s]
        h = {v: 0 for v in nodes}
        for s, d in pairs:
            h[s] += a[d]
    ma, mh = max(a.values()), max(h.values())
    for v in nodes:
        r = got[v]
        assert (r.auth_fp, r.hub_fp) == (a[v], h[v]), v
        assert r.authority == (float(a[v]) / ma if ma > 0 else None)
        assert r.hub == (float(h[v]) / mh if mh > 0 else None)
    # hubs have hub score, no authority; authorities the reverse
    assert all(got[v].auth_fp == 0 for v in range(5))
    assert all(got[v].hub_fp == 0 for v in range(100, 110))
    top_auth = max(nodes, key=lambda v: got[v].auth_fp)
    assert 100 <= top_auth < 110


def test_neighbor_overlap_duplicate_candidates(spark):
    """Review fix: duplicate candidate rows must not multiply cn or
    re-expand the output."""
    from geomesa_spark.operators.graph import neighbor_overlap

    g = [(0, 1), (0, 2), (3, 1), (3, 2), (0, 3)]
    cand = [(0, 3)] * 4  # heavily duplicated
    out = neighbor_overlap(
        _edges(spark, g),
        spark.createDataFrame(cand, "u long, v long"),
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.cn == 2  # common neighbors {1, 2}
    assert r.jaccard == 2.0 / (3 + 3 - 2)


def _kruskal(canon_edges):
    """Independent MSF oracle: Kruskal with union-find over the
    unique (w, a, b) total order."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for w, a, b in sorted(
        (w, a, b) for (a, b), w in canon_edges.items()
    ):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            out.add((a, b, w))
    return out


def _canon(weighted):
    canon = {}
    for a, b, w in weighted:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        canon[k] = min(canon.get(k, w), w)
    return canon


def test_boruvka_mst_matches_kruskal(spark):
    """Random weighted graph (duplicate edges, both directions,
    self-loops): the Borůvka forest equals an independent Kruskal —
    the (w, a, b) total order makes the forest unique."""
    from geomesa_spark.operators.graph import boruvka_mst

    rng = np.random.default_rng(23)
    n = 150
    weighted = [
        (int(rng.integers(0, n)), int(rng.integers(0, n)),
         int(rng.integers(1, 50)))
        for _ in range(900)
    ] + [(5, 5, 1), (9, 9, 2)]
    df = spark.createDataFrame(weighted, "src long, dst long, w long")
    got = boruvka_mst(df)
    rows = got.collect()
    assert {(r.a, r.b, r.w) for r in rows} == _kruskal(_canon(weighted))
    # forest invariant: |edges| = n_nodes - n_components, no dups
    assert len(rows) == len({(r.a, r.b) for r in rows})
    # rounds are 1-based and small (components halve per round)
    assert all(1 <= r.round <= 10 for r in rows)


def test_boruvka_mst_disconnected_and_chain(spark):
    """Two disconnected cliques -> spanning forest of both; a long
    chain exercises multi-round component merging (chained hooks)."""
    from geomesa_spark.operators.graph import boruvka_mst

    tri = [(0, 1, 5), (1, 2, 3), (0, 2, 4),
           (10, 11, 7), (11, 12, 2), (10, 12, 9)]
    df = spark.createDataFrame(tri, "src long, dst long, w long")
    got = {(r.a, r.b, r.w) for r in boruvka_mst(df).collect()}
    assert got == {(1, 2, 3), (0, 2, 4), (11, 12, 2), (10, 11, 7)}

    chain = [(i, i + 1, 100 + i) for i in range(64)]
    df2 = spark.createDataFrame(chain, "src long, dst long, w long")
    rows = boruvka_mst(df2).collect()
    # every chain edge is a bridge -> all 64 in the forest
    assert {(r.a, r.b, r.w) for r in rows} == {
        (a, b, w) for a, b, w in chain
    }

    with pytest.raises(ValueError):
        boruvka_mst(
            spark.createDataFrame(
                [(0, 1, 1.5)], "src long, dst long, w double"
            )
        )


def test_single_linkage_cut(spark):
    """Dendrogram cut: two tight pairs bridged by an expensive edge
    split at a threshold between the two scales."""
    from geomesa_spark.operators.graph import boruvka_mst, single_linkage

    e = [(0, 1, 2), (2, 3, 3), (1, 2, 50)]
    msf = boruvka_mst(
        spark.createDataFrame(e, "src long, dst long, w long")
    )
    lo = {(r.node, r.cluster)
          for r in single_linkage(msf, 10).collect()}
    assert lo == {(0, 0), (1, 0), (2, 2), (3, 2)}
    hi = {(r.node, r.cluster)
          for r in single_linkage(msf, 100).collect()}
    assert hi == {(0, 0), (1, 0), (2, 0), (3, 0)}


def _bfs(adj, s):
    dist = {s: 0}
    frontier = [s]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def test_closeness_vs_bfs(spark):
    """Closeness/eccentricity for 12 pivot sources vs a python BFS
    on a random undirected graph with an unreachable island."""
    from geomesa_spark.operators.graph import closeness

    rng = np.random.default_rng(31)
    n = 80
    pairs = sorted({
        (int(rng.integers(0, n)), int(rng.integers(0, n)))
        for _ in range(200)
    }) + [(200, 201), (201, 202)]  # island
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    srcs = sorted(adj)[::7]
    got = {r.src: r for r in closeness(
        spark.createDataFrame(pairs, "src long, dst long"),
        spark.createDataFrame([(s,) for s in srcs], "node long"),
    ).collect()}
    assert set(got) == set(srcs)
    for s in srcs:
        d = _bfs(adj, s)
        r = got[s]
        assert r.n_reached == len(d)
        assert r.total_dist == sum(d.values())
        assert r.eccentricity == max(d.values())
        if sum(d.values()) > 0:
            assert r.closeness == (len(d) - 1) / float(sum(d.values()))
        else:
            assert r.closeness is None


def test_closeness_directed(spark):
    """directed=True follows edge direction: a one-way chain reaches
    forward only."""
    from geomesa_spark.operators.graph import closeness

    chain = [(0, 1), (1, 2), (2, 3)]
    got = {r.src: r for r in closeness(
        spark.createDataFrame(chain, "src long, dst long"),
        spark.createDataFrame([(0,), (3,)], "node long"),
        directed=True,
    ).collect()}
    assert (got[0].n_reached, got[0].total_dist,
            got[0].eccentricity) == (4, 6, 3)
    assert (got[3].n_reached, got[3].total_dist) == (1, 0)
    assert got[3].closeness is None


def _lpa_brute(pairs, rounds):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {u: u for u in adj}
    for _ in range(rounds):
        new = {}
        for u in adj:
            cnt = {}
            for v in adj[u]:
                cnt[lab[v]] = cnt.get(lab[v], 0) + 1
            new[u] = min(cnt, key=lambda l: (-cnt[l], l))
        lab = new
    return lab


def test_label_propagation_replay_and_structure(spark):
    """Fixed-round synchronous LPA vs a python replay; two cliques
    joined by one bridge edge resolve to two communities."""
    from geomesa_spark.operators.graph import label_propagation

    rng = np.random.default_rng(41)
    n = 70
    pairs = sorted({
        (int(rng.integers(0, n)), int(rng.integers(0, n)))
        for _ in range(260)
    })
    got = {r.node: r.label for r in label_propagation(
        spark.createDataFrame(pairs, "src long, dst long"), rounds=4
    ).collect()}
    assert got == _lpa_brute(pairs, 4)

    cl = [(a, b) for base in (0, 100)
          for a in range(base, base + 8)
          for b in range(a + 1, base + 8)] + [(7, 100)]
    got2 = {r.node: r.label for r in label_propagation(
        spark.createDataFrame(cl, "src long, dst long"), rounds=6
    ).collect()}
    assert all(got2[u] == got2[0] for u in range(8))
    assert all(got2[u] == got2[100] for u in range(100, 108))
    assert got2[0] != got2[100]

    with pytest.raises(ValueError):
        label_propagation(
            spark.createDataFrame(cl, "src long, dst long"), rounds=0
        )


def test_assortativity(spark):
    """Star (negative, exactly -1), clique path... vs the numpy
    Pearson of endpoint degrees over the stub list."""
    from geomesa_spark.operators.graph import assortativity

    def brute(pairs):
        canon = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
        deg = {}
        for a, b in canon:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        xs, ys = [], []
        for a, b in canon:
            xs += [deg[a], deg[b]]
            ys += [deg[b], deg[a]]
        return np.corrcoef(xs, ys)[0, 1]

    star = [(0, i) for i in range(1, 9)] + [(1, 2)]
    r = assortativity(
        spark.createDataFrame(star, "src long, dst long")
    ).collect()[0]
    assert r.m == 9
    assert abs(r.assortativity - brute(star)) < 1e-12

    rng = np.random.default_rng(53)
    pairs = sorted({
        (int(rng.integers(0, 40)), int(rng.integers(0, 40)))
        for _ in range(150)
    })
    r2 = assortativity(
        spark.createDataFrame(pairs, "src long, dst long")
    ).collect()[0]
    assert abs(r2.assortativity - brute(pairs)) < 1e-12

    # 3-regular graph (K4): zero degree variance -> NULL
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r3 = assortativity(
        spark.createDataFrame(k4, "src long, dst long")
    ).collect()[0]
    assert r3.assortativity is None
