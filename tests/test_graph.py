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
