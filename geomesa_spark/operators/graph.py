"""PageRank over an edge frame — the graph-centrality companion to
the engine's other iterative graph operators (``route.sssp`` for
distances, ``dedup.dup_components`` for components).

The training-data use is domain authority: a link graph of
registered domains (``url.registered_domain_col``) ranked by
PageRank is the classic crawl-quality signal; the spatial use is
road-network centrality over ``route.edges_from_segments`` output.

Scale shape (one round):

1. ``contrib``: edges (pre-joined ONCE with the source out-degree,
   repartitioned on src and persisted — the sssp edge contract) join
   the rank frame on src; each edge carries ``r div out`` — an exact
   int64 share.
2. ONE partial-aggregated groupBy dst sums incoming shares.
3. every node (including in-degree-0 nodes) re-ranks as
   ``t_fp + (d_num · Σshare) div d_den`` — teleport plus damped
   inflow, all int64.

Rounds are driver-synchronized with per-round localCheckpoint
lineage truncation (the sssp contract); the round count is FIXED
(``rounds=``) so the result is a well-defined quantity of its own —
the bounded-hop ``sssp(rounds=R)`` precedent — rather than a
tolerance race.  PageRank contracts geometrically at the damping
factor, so ~20 rounds ≈ 1e-2·d^20 relative error.

Determinism / exactness: ranks are fp-scaled int64 (``r_scale``);
every share is an integer floor division and every update integer
arithmetic, so the result is bit-identical under any partitioning
or schedule, and a SQL oracle can replay the rounds exactly.
Flooring drops < 1 fp unit per edge per round — at the default
scale that is 1e-9 relative, far below the truncation error of any
float implementation.  Overflow bound: a node's inflow is at most
the total mass n·r_scale, so n · r_scale · d_num must stay below
2^63 (raise r_scale for small graphs, lower it for billion-node
ones; the default leaves room for ~10^8 nodes).

Classic simplifications, documented: dangling nodes (no out-edges)
leak their damped mass (no redistribution), so ranks are relative
scores, not a normalized distribution; multi-edges act as integer
weights (dedup first for the unweighted semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "PR_RANK_SQL"]

# the emitted double: one division of the canonical integer rank
PR_RANK_SQL = "CAST({r} AS DOUBLE) / {scale}"


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    rounds: int = 20,
    damping_num: int = 85,
    damping_den: int = 100,
    r_scale: int = 1_000_000_000,
) -> DataFrame:
    """Fixed-round integer PageRank.  Returns (node, rank_fp, rank)
    where rank_fp is the exact int64 fixed-point score after
    ``rounds`` synchronous iterations from the uniform start
    r_0 = r_scale, and rank = rank_fp / r_scale (``PR_RANK_SQL``).
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if not (0 < damping_num < damping_den):
        raise ValueError("damping must satisfy 0 < num < den")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(F.col("node"))
        .persist()
    )
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("_od"))
    ew = (
        e.join(deg, "src")
        .repartition(F.col("src"))
        .persist()
    )
    t_fp = int(r_scale) * (damping_den - damping_num) // damping_den
    ranks = nodes.select(
        "node", F.lit(int(r_scale)).cast("long").alias("rank_fp")
    ).localCheckpoint()
    for _ in range(rounds):
        contrib = (
            ew.join(
                ranks.select(
                    F.col("node").alias("src"), "rank_fp"
                ),
                "src",
            )
            .select(
                "dst",
                F.expr("rank_fp div _od").alias("_sh"),
            )
            .groupBy("dst")
            .agg(F.sum("_sh").alias("_in"))
        )
        ranks = (
            nodes.join(
                contrib.withColumnRenamed("dst", "node"), "node", "left"
            )
            .select(
                "node",
                (
                    F.lit(t_fp)
                    + F.expr(
                        f"({damping_num} * coalesce(_in, 0L))"
                        f" div {damping_den}"
                    )
                ).cast("long").alias("rank_fp"),
            )
            .localCheckpoint()
        )
    out = ranks.select(
        "node",
        "rank_fp",
        F.expr(
            PR_RANK_SQL.format(r="rank_fp", scale=repr(float(r_scale)))
        ).alias("rank"),
    )
    nodes.unpersist()
    ew.unpersist()
    return out
