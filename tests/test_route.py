"""Routing operators vs an independent heapq Dijkstra oracle."""

import heapq

import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.route import (
    edges_from_segments,
    grid_cost_edges,
    isochrone,
    od_matrix,
    segment_nodes,
    sssp,
)


def _dijkstra(edges, sources):
    """(dist, src) per node with the engine's (dist, src) tie order."""
    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
    best = {}
    heap = [(0, s, s) for s in sorted(set(sources))]
    heapq.heapify(heap)
    while heap:
        dist, src, node = heapq.heappop(heap)
        if node in best and best[node] <= (dist, src):
            continue
        best[node] = (dist, src)
        for d, w in adj.get(node, []):
            cand = (dist + w, src)
            if d not in best or cand < best[d]:
                heapq.heappush(heap, (dist + w, src, d))
    return best


def _bellman_rounds(edges, sources, rounds):
    """Exactly-R-round relaxation (the `rounds=` contract)."""
    best = {s: (0, s) for s in set(sources)}
    for _ in range(rounds):
        nxt = dict(best)
        for s, d, w in edges:
            if s in best:
                cand = (best[s][0] + w, best[s][1])
                if d not in nxt or cand < nxt[d]:
                    nxt[d] = min(cand, nxt.get(d, cand))
        best = nxt
    return best


EDGES = [
    # two routes 1->5: 1-2-3-5 (cost 6) vs 1-4-5 (cost 7); 6 isolated
    (1, 2, 2), (2, 1, 2),
    (2, 3, 2), (3, 2, 2),
    (3, 5, 2), (5, 3, 2),
    (1, 4, 3), (4, 1, 3),
    (4, 5, 4), (5, 4, 4),
    (7, 8, 1), (8, 7, 1),
]


def _edges_df(spark, rows=EDGES):
    return spark.createDataFrame(rows, "src long, dst long, w long")


def _src_df(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def test_sssp_matches_dijkstra(spark):
    out = {
        r["node"]: (r["dist"], r["src"])
        for r in sssp(_edges_df(spark), _src_df(spark, [1, 7])).collect()
    }
    assert out == _dijkstra(EDGES, [1, 7])
    # node 6 never appears anywhere; unreachable stays absent
    assert 6 not in out


def test_sssp_tie_breaks_on_min_source(spark):
    # node 3 is cost 2 from both source 1 and source 5 -> src 1 wins
    edges = [(1, 3, 2), (3, 1, 2), (5, 3, 2), (3, 5, 2)]
    out = {
        r["node"]: (r["dist"], r["src"])
        for r in sssp(_edges_df(spark, edges), _src_df(spark, [1, 5])).collect()
    }
    assert out[3] == (2, 1)
    assert out == _dijkstra(edges, [1, 5])


def test_sssp_rounds_bounded_hops(spark):
    # chain 1-2-3-4-5 with unit weights: R rounds reach R hops
    chain = [(i, i + 1, 1) for i in range(1, 5)]
    for rounds in (1, 2, 3):
        out = {
            r["node"]: (r["dist"], r["src"])
            for r in sssp(
                _edges_df(spark, chain), _src_df(spark, [1]), rounds=rounds
            ).collect()
        }
        assert out == _bellman_rounds(chain, [1], rounds)
        assert max(n for n in out) == 1 + rounds


def test_sssp_negative_weight_raises(spark):
    with pytest.raises(ValueError, match="non-negative"):
        sssp(_edges_df(spark, [(1, 2, -1)]), _src_df(spark, [1]))


def test_sssp_non_convergence_raises(spark):
    chain = [(i, i + 1, 1) for i in range(1, 8)]
    with pytest.raises(RuntimeError, match="converge"):
        sssp(_edges_df(spark, chain), _src_df(spark, [1]), max_rounds=3)


def test_per_source_and_od_matrix(spark):
    dists = {
        (r["src"], r["node"]): r["dist"]
        for r in sssp(
            _edges_df(spark), _src_df(spark, [1, 5]), per_source=True
        ).collect()
    }
    for src in (1, 5):
        solo = _dijkstra(EDGES, [src])
        for node, (d, _) in solo.items():
            assert dists[(src, node)] == d
    od = {
        (r["src"], r["node"]): r["dist"]
        for r in od_matrix(
            _edges_df(spark), _src_df(spark, [1, 5]), _src_df(spark, [4, 2])
        ).collect()
    }
    assert od == {(1, 2): 2, (1, 4): 3, (5, 2): 4, (5, 4): 4}


def test_isochrone_bands(spark):
    out = sssp(_edges_df(spark), _src_df(spark, [1]))
    bands = {
        r["node"]: r["band"]
        for r in isochrone(out, [2, 4]).collect()
    }
    # dists from 1: {1:0, 2:2, 3:4, 4:3, 5:6}; 5 beyond last band
    assert bands == {1: 2, 2: 2, 3: 4, 4: 4}
    with pytest.raises(ValueError):
        isochrone(out, [4, 2])


def test_grid_cost_edges(spark):
    cells = spark.createDataFrame(
        [(0, 0, 5), (1, 0, 7), (0, 1, 9), (5, 5, 1)],
        "gx long, gy long, cost long",
    )
    key = lambda gx, gy: gx * 4294967296 + gy  # noqa: E731
    got = {(r["src"], r["dst"]): r["w"] for r in grid_cost_edges(cells).collect()}
    # only occupied neighbors link; entering a cell costs its value
    assert got == {
        (key(0, 0), key(1, 0)): 7,
        (key(0, 0), key(0, 1)): 9,
        (key(1, 0), key(0, 0)): 5,
        (key(0, 1), key(0, 0)): 5,
    }
    got8 = grid_cost_edges(cells, neighborhood=8).collect()
    assert {(r["src"], r["dst"]) for r in got8} >= set(got) | {
        (key(1, 0), key(0, 1)),
        (key(0, 1), key(1, 0)),
    }


def test_road_graph_from_segments(spark):
    """A 4x4 manhattan grid of LINESTRING roads: quantized endpoints
    merge into shared junctions; converged sssp matches Dijkstra on
    the fixed-point weights."""
    from geomesa_spark.operators.snap import segments_table

    rows = []
    gid = 0
    for i in range(4):
        for j in range(3):
            # horizontal + vertical unit segments on a 0.01-deg grid
            rows.append((gid, [(j * 0.01, i * 0.01, (j + 1) * 0.01, i * 0.01)]))
            gid += 1
            rows.append((gid, [(i * 0.01, j * 0.01, i * 0.01, (j + 1) * 0.01)]))
            gid += 1
    geoms = spark.createDataFrame(
        rows,
        "gid long, edges array<struct<x0: double, y0: double, "
        "x1: double, y1: double>>",
    )
    segs = segments_table(geoms)
    edges = edges_from_segments(segs)
    nodes = segment_nodes(segs)
    # 16 junctions on the 4x4 lattice, all edges fixed-point ~0.01 deg
    assert nodes.count() == 16
    erows = [(r["src"], r["dst"], r["w"]) for r in edges.collect()]
    assert len(erows) == 48  # 24 undirected segments, both directions
    assert all(w == 10000 for _, _, w in erows)
    origin = nodes.orderBy("x", "y").limit(1)
    got = {
        r["node"]: r["dist"]
        for r in sssp(edges, origin.select("node")).collect()
    }
    oracle = _dijkstra(erows, [origin.collect()[0]["node"]])
    assert got == {n: d for n, (d, _) in oracle.items()}
    # corner-to-corner = 6 unit hops
    assert max(got.values()) == 60000


def test_sssp_plan_has_no_cartesian(spark):
    plan = sssp(
        _edges_df(spark), _src_df(spark, [1]), rounds=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

def _dijkstra_paths(edges, sources):
    """Independent oracle for (dist, src, par): full label-correcting
    with the engine's offer model — par = min node id among ALL
    offers of the final (dist, src) value across synchronous rounds."""
    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
    best = {s: (0, s, s) for s in set(sources)}
    while True:
        offers = {}
        for u, (du, su, _) in best.items():
            for v, w in adj.get(u, []):
                cand = (du + w, su, u)
                if v not in offers or cand < offers[v]:
                    offers[v] = cand
        nxt = dict(best)
        for v, cand in offers.items():
            if v not in nxt or cand < nxt[v]:
                nxt[v] = cand
        if nxt == best:
            return best
        best = nxt


def test_sssp_parents_and_paths(spark):
    from geomesa_spark.operators.route import shortest_paths

    labels = sssp(
        _edges_df(spark), _src_df(spark, [1, 7]), return_parent=True
    )
    got = {
        r["node"]: (r["dist"], r["src"], r["par"])
        for r in labels.collect()
    }
    want = _dijkstra_paths(EDGES, [1, 7])
    assert got == want
    # sources point at themselves
    assert got[1][2] == 1 and got[7][2] == 7

    paths = shortest_paths(labels, _src_df(spark, [5, 8, 6]))
    rows = {}
    for r in paths.collect():
        rows.setdefault(r["tgt"], {})[r["seq"]] = r["node"]
    # unreached target 6 emits nothing
    assert set(rows) == {5, 8}
    p5 = [rows[5][i] for i in range(len(rows[5]))]
    assert p5 == [5, 3, 2, 1]  # the cost-6 route, target-first
    assert [rows[8][i] for i in range(len(rows[8]))] == [8, 7]
    # path validity: consecutive pairs are edges, weights sum to dist
    ew = {(s, d): w for s, d, w in EDGES}
    assert sum(ew[(p5[i + 1], p5[i])] for i in range(3)) == got[5][0]


def test_shortest_paths_guards(spark):
    from geomesa_spark.operators.route import shortest_paths

    chain = [(i, i + 1, 1) for i in range(1, 6)]
    labels = sssp(
        _edges_df(spark, chain), _src_df(spark, [1]), return_parent=True
    )
    with pytest.raises(RuntimeError, match="max_hops"):
        shortest_paths(labels, _src_df(spark, [6]), max_hops=2)
    # per_source mode carries parents too
    ps = sssp(
        _edges_df(spark), _src_df(spark, [1, 5]),
        per_source=True, return_parent=True,
    )
    got = {
        (r["src"], r["node"]): r["par"] for r in ps.collect()
    }
    assert got[(1, 3)] == 2 and got[(5, 3)] == 5
