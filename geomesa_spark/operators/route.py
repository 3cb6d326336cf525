"""Distributed routing over spatial graphs: multi-source shortest
path, cost-distance surfaces, road networks from segment tables,
isochrone banding, and bounded origin-destination matrices.

The reference has no routing surface (its trajectory layer stops at
tube-select / proximity); this extends the engine's motion analytics
the way `hotspot`/`moran` extend density — the "analytics a tracking
corpus needs" family.  Graph inputs reuse the existing machinery:
`snap.segments_table` rows become road edges, and the density grid
(the `hotspot` lattice) becomes a cost surface.

Algorithm: frontier Bellman-Ford relaxation with driver-synced
convergence — the distributed-SSSP shape every bulk-synchronous
graph system uses (Pregel / GraphX shortestPaths; delta-stepping is
the same relaxation with a bucketed frontier):

- state is ONE row per reached node: (node, dist, src) with the
  minimum (dist, src) struct — O(nodes), never O(nodes x sources)
  unless `per_source=True` is requested;
- each round relaxes ONLY the frontier (nodes whose label changed
  last round) through the edge list: one shuffle join on the edge
  key + one min-struct aggregate, both partial-aggregated;
- edges are repartitioned on the join key ONCE and persisted, so
  every round moves only the (much smaller) frontier;
- lineage is truncated per round with localCheckpoint (the
  `dedup.dup_components` convention — self-referential loops double
  the logical plan otherwise);
- convergence is a `limit(1).count()` scan of the just-checkpointed
  chg flag; rounds are O(weighted-diameter hop count), and the loop
  raises rather than returning silently partial distances.

Exactness: weights must be non-negative int64 (fixed-point — the
engine-wide `fp_scale` convention), so `dist` is an exact integer
sum and min-struct ties break on the total (dist, src) order:
results are identical under any partitioning and any round schedule.

Scale notes: per-round cost is bounded by the frontier's adjacency,
not the corpus; state never exceeds one row per reachable node; the
weighted-hop diameter bounds the round count (roads: a few hundred
even continental — each round is cheap once the frontier collapses).
`rounds=R` runs EXACTLY R relaxation rounds and returns the R-hop-
bounded distances (a well-defined quantity of its own — e.g.
transfer-limited transit reachability) — the oracle gate pins that
form with an unrolled-CTE SQL twin; pytest proves the converged form
against an independent Dijkstra oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "grid_cost_edges",
    "edges_from_segments",
    "segment_nodes",
    "sssp",
    "shortest_paths",
    "isochrone",
    "od_matrix",
]


def grid_node(gx: Column, gy: Column) -> Column:
    """Pack grid coords into one int64 node id: gx * 2^32 + gy.
    (Plain multiplication, not bit-ops, so the same arithmetic
    renders verbatim into SQL oracles.)"""
    return (gx.cast("long") * F.lit(4294967296).cast("long") + gy.cast("long"))


def grid_cost_edges(
    cells: DataFrame,
    *,
    x_col: str = "gx",
    y_col: str = "gy",
    cost_col: str = "cost",
    neighborhood: int = 4,
) -> DataFrame:
    """Cost-surface edges between occupied neighbor cells.

    Input: one row per OCCUPIED cell (gx, gy, cost) with int64 cost;
    output: directed edges (src, dst, w) where entering a cell costs
    that cell's value (the classic cost-distance convention — ESRI
    cost distance uses the average of the two cells; destination-cost
    keeps the weight a single exact int64, and the two differ by a
    telescoping half-cost at the endpoints only).  4- or 8-neighbor.

    Built as a neighbor-key equi-join (each cell emits its
    neighborhood's keys once, joined back against the occupied set) —
    never a cross join; cost is O(occupied x neighborhood).
    """
    if neighborhood not in (4, 8):
        raise ValueError("neighborhood must be 4 or 8")
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if neighborhood == 8:
        offs += [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    gx, gy = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    left = cells.select(
        grid_node(gx, gy).alias("src"),
        F.explode(
            F.array(*[
                F.struct(
                    (gx + F.lit(dx)).alias("nx"), (gy + F.lit(dy)).alias("ny")
                )
                for dx, dy in offs
            ])
        ).alias("_n"),
    ).select("src", grid_node(F.col("_n.nx"), F.col("_n.ny")).alias("dst"))
    right = cells.select(
        grid_node(gx, gy).alias("dst"),
        F.col(cost_col).cast("long").alias("w"),
    )
    return left.join(right, "dst").select("src", "dst", "w")


def segment_nodes(
    segments: DataFrame, *, scale: int = 10_000_000
) -> DataFrame:
    """Distinct quantized junction nodes of a segment table with
    representative coordinates: (node, x, y).  Node id packs the
    quantized (x, y) as qx * 2^32 + qy (signed, exact: |qx| <= 1.8e9
    at the default 1e-7-deg scale keeps the product inside int64 and
    |qy| < 2^31 keeps the pack injective), so endpoints shared by
    different segments merge into one junction.
    """
    out = None
    for xc, yc in (("x0", "y0"), ("x1", "y1")):
        qx = F.round(F.col(xc) * F.lit(float(scale))).cast("long")
        qy = F.round(F.col(yc) * F.lit(float(scale))).cast("long")
        part = segments.select(
            (qx * F.lit(4294967296) + qy).alias("node"),
            (qx.cast("double") / F.lit(float(scale))).alias("x"),
            (qy.cast("double") / F.lit(float(scale))).alias("y"),
        )
        out = part if out is None else out.unionByName(part)
    return out.groupBy("node").agg(
        F.min("x").alias("x"), F.min("y").alias("y")
    )


def edges_from_segments(
    segments: DataFrame,
    *,
    scale: int = 10_000_000,
    fp_scale: int = 1_000_000,
    metric: str = "planar",
    bidirectional: bool = True,
) -> DataFrame:
    """Road-network edges from `snap.segments_table` rows.

    Endpoints quantize to `scale` (1e7 = ~1 cm in degrees) so shared
    junctions collapse to one node; weight is the segment length in
    fixed-point (`round(len * fp_scale)`, int64 — the engine-wide
    exactness convention).  metric='planar' is exact-degree length
    (the oracle mode), 'haversine' the production meters metric.
    Zero-length segments (both endpoints on one node) are dropped —
    they would be self-loops, which relaxation ignores anyway.
    """
    qx0 = F.round(F.col("x0") * F.lit(float(scale))).cast("long")
    qy0 = F.round(F.col("y0") * F.lit(float(scale))).cast("long")
    qx1 = F.round(F.col("x1") * F.lit(float(scale))).cast("long")
    qy1 = F.round(F.col("y1") * F.lit(float(scale))).cast("long")
    node0 = qx0 * F.lit(4294967296) + qy0
    node1 = qx1 * F.lit(4294967296) + qy1
    if metric == "planar":
        dx = F.col("x1") - F.col("x0")
        dy = F.col("y1") - F.col("y0")
        length = F.sqrt(dx * dx + dy * dy)
    elif metric == "haversine":
        # the track layer's sphere (functions/geometry.py refine
        # sphere R = 6371008.8 m)
        r = F.lit(6371008.8)
        lat0, lat1 = F.radians("y0"), F.radians("y1")
        dlat = (lat1 - lat0) / 2.0
        dlon = (F.radians("x1") - F.radians("x0")) / 2.0
        a = (
            F.sin(dlat) * F.sin(dlat)
            + F.cos(lat0) * F.cos(lat1) * F.sin(dlon) * F.sin(dlon)
        )
        length = 2.0 * r * F.asin(F.sqrt(a))
    else:
        raise ValueError("metric must be 'planar' or 'haversine'")
    w = F.round(length * F.lit(float(fp_scale))).cast("long")
    fwd = segments.select(
        node0.alias("src"), node1.alias("dst"), w.alias("w")
    ).filter(F.col("src") != F.col("dst"))
    if not bidirectional:
        return fwd
    rev = segments.select(
        node1.alias("src"), node0.alias("dst"), w.alias("w")
    ).filter(F.col("src") != F.col("dst"))
    return fwd.unionByName(rev)


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    *,
    node_col: str = "node",
    per_source: bool = False,
    rounds: int | None = None,
    max_rounds: int = 100,
    return_parent: bool = False,
    sync_every: int = 4,
) -> DataFrame:
    """Multi-source shortest-path distances by frontier Bellman-Ford.

    `edges`: directed (src, dst, w) with NON-NEGATIVE int64 weights
    (fixed-point); emit both directions for undirected graphs
    (`edges_from_segments(bidirectional=True)` does).
    `sources`: one `node_col` row per source (duplicates are fine).

    Default output: (node, dist, src) — every REACHED node with its
    exact integer distance to the nearest source and that source's
    id, ties broken by the total (dist, src) order.  State is one
    row per reached node regardless of source count — the scalable
    "nearest facility" form.

    `per_source=True`: (node, src, dist) for EVERY (reached node,
    source) pair — the OD-matrix building block.  State grows to
    O(nodes x sources); bound the source set accordingly (documented
    scale contract, like `hausdorff_join`'s candidate bound).

    `rounds=R` returns R-hop-bounded distances (each round extends
    optimal paths by one edge — the textbook Bellman-Ford
    invariant); once labels stop changing the remaining rounds are
    the identity, so the loop exits early with a bit-identical
    result when a probe sees an empty frontier.  `rounds=None`
    iterates to convergence and RAISES if `max_rounds` arrives while
    labels still change.

    `sync_every` batches the convergence probe: K rounds build
    lazily, then ONE count materializes all K pending checkpoints in
    a single job — the driver round trips drop K-fold.  Results are
    IDENTICAL for any value (rounds are fully synchronous
    regardless; labels are a fixed point once converged, so overshot
    rounds relax an empty frontier at near-zero cost); only the
    wall-clock sync overhead changes.  `max_rounds` still bounds the
    TOTAL rounds run (rounded up to the batch edge).

    `return_parent=True` adds `par` — the node's predecessor on an
    optimal path (= itself at sources), feeding ``shortest_paths``.
    Parents ride the min-struct as a third tie key, so the winner is
    the MINIMUM node id among optimal predecessors: deterministic
    under any partitioning and any round schedule (every optimal
    predecessor re-offers when it last changes, and min is
    order-free).  Parent-only changes never re-enter the frontier —
    a node's offers to its neighbors carry its OWN id, not its
    parent — so the flag costs no extra rounds.
    """
    e = edges.select(
        F.col("src").alias("e_src"),
        F.col("dst").alias("e_dst"),
        F.col("w").cast("long").alias("e_w"),
    )
    neg = e.filter(F.col("e_w") < 0).limit(1).count()
    if neg:
        raise ValueError("sssp requires non-negative weights")
    # one-time layout: every round joins the frontier on e_src
    e = e.repartition(F.col("e_src")).persist()

    keys = ["node", "s_src"] if per_source else ["node"]
    labels = (
        sources.select(F.col(node_col).cast("long").alias("node"))
        .distinct()
        .select(
            "node",
            F.lit(0).cast("long").alias("dist"),
            F.col("node").alias("s_src"),
            F.col("node").alias("par"),
            F.lit(True).alias("chg"),
        )
        .localCheckpoint(eager=True)
    )

    n_rounds = rounds if rounds is not None else max_rounds
    converged = rounds is not None
    # checkpoints are LAZY: lineage truncates either way, and the
    # convergence probe below is a FULL count (not limit(1)) so it
    # both reads the chg flag and materializes every partition of the
    # checkpoint in the same single job — one driver round trip per
    # sync_every relaxation rounds, not one per round.  Fixed-rounds
    # mode probes too: once no label changed, every remaining round
    # relaxes an EMPTY frontier and min-merges each label with only
    # itself — the identity — so breaking early returns a result
    # bit-identical to running all R rounds while skipping their
    # stage chains (closeness(rounds=16) on an eccentricity-4 graph
    # runs ~8 rounds of stages, not 16).
    old_t = "struct<dist:bigint,s_src:bigint>"
    # the frontier is the STREAM side of the relax join whenever the
    # edge table broadcasts, and each label checkpoint is AQE-coalesced
    # to a handful of partitions (its BYTES are tiny) — but the join
    # EXPANDS it by the mean degree, so streaming those few partitions
    # serializes millions of offer rows through one or two tasks
    # (observed: a 7 s single-task SortAggregate at mean degree ~190).
    # An explicit width-pinned repartition on the join key costs one
    # tiny-frame shuffle and IS the join's required distribution, so a
    # shuffle join gets it for free and a broadcast-edges join streams
    # at full width.
    n_wide = labels.sparkSession.sparkContext.defaultParallelism
    for i in range(n_rounds):
        frontier = labels.filter("chg").repartition(
            n_wide, F.col("node")
        )
        relaxed = frontier.join(e, frontier["node"] == e["e_src"]).select(
            F.col("e_dst").alias("node"),
            (F.col("dist") + F.col("e_w")).alias("dist"),
            "s_src",
            # the offer's parent is the OFFERING node itself
            F.col("e_src").alias("par"),
            F.lit(None).cast(old_t).alias("_old"),
        )
        # the incumbent label rides the union tagged with its own
        # (dist, s_src) so ONE groupBy yields both the min-merge and
        # the change flag — each key holds at most one incumbent, so
        # max(_old) IS it (NULL for first-reached nodes); the
        # old-vs-new join this replaces was a full extra shuffle of
        # the label frame every round
        cur = labels.select(
            "node", "dist", "s_src", "par",
            F.struct("dist", "s_src").cast(old_t).alias("_old"),
        )
        merged = (
            cur.unionByName(relaxed)
            .groupBy(*keys)
            .agg(
                F.min(F.struct("dist", "s_src", "par")).alias("_m"),
                F.max("_old").alias("_o"),
            )
        )
        is_probe = (i + 1) % max(1, int(sync_every)) == 0 or i + 1 == n_rounds
        # probe rounds checkpoint EAGERLY: the one materialization job
        # computes the whole pending batch with full stage parallelism
        # and caches it, so the chg count (and the next batch's double
        # read of the label frame) scan cached blocks — a LAZY probe
        # chain instead materializes inside AQE's broadcast-collect
        # thread, single-threaded and re-derived per consumer
        labels = merged.select(
            "node",
            F.col("_m.dist").alias("dist"),
            F.col("_m.s_src").alias("s_src"),
            F.col("_m.par").alias("par"),
            # parent-only changes deliberately excluded: a node's
            # offers carry its own id, never its parent
            (
                F.col("_o").isNull()
                | (F.col("_m.dist") != F.col("_o.dist"))
                | (F.col("_m.s_src") != F.col("_o.s_src"))
            ).alias("chg"),
        ).localCheckpoint(eager=is_probe)
        if is_probe:
            if labels.filter("chg").count() == 0:
                converged = True
                break
    if rounds is not None:
        # materialize the lazy chain while the edge cache is still
        # alive, so unpersist below can't force an R-deep recompute
        labels = labels.localCheckpoint(eager=True)
    e.unpersist()
    if not converged:
        raise RuntimeError(
            f"sssp did not converge in {max_rounds} rounds; raise "
            "max_rounds (weighted-hop diameter exceeds the budget)"
        )
    cols = ["node", "dist", F.col("s_src").alias("src")] + (
        ["par"] if return_parent else []
    )
    out = labels.select(*cols)
    if per_source:
        return out.select(
            "node", "src", "dist", *(["par"] if return_parent else [])
        )
    return out


def isochrone(
    dist_df: DataFrame,
    bands: list[int],
    *,
    dist_col: str = "dist",
) -> DataFrame:
    """Band each reached node by the FIRST threshold its distance
    fits (bands in ascending fixed-point units); nodes beyond the
    last band are dropped.  Output adds `band` (the threshold value)
    — reachability rings ready for cell rollup or contouring."""
    if sorted(bands) != list(bands) or not bands:
        raise ValueError("bands must be ascending and non-empty")
    expr = F.lit(None).cast("long")
    for b in reversed(bands):
        expr = F.when(F.col(dist_col) <= F.lit(b), F.lit(b)).otherwise(expr)
    return dist_df.withColumn("band", expr).filter(F.col("band").isNotNull())


def od_matrix(
    edges: DataFrame,
    sources: DataFrame,
    targets: DataFrame,
    *,
    node_col: str = "node",
    max_rounds: int = 100,
) -> DataFrame:
    """Origin-destination distances: per-source SSSP restricted to
    the target set — (src, node, dist) for every reachable (source,
    target) pair.  State is O(nodes x sources); bound the source set
    (the `per_source` contract)."""
    dists = sssp(
        edges,
        sources,
        node_col=node_col,
        per_source=True,
        max_rounds=max_rounds,
    )
    tgt = targets.select(F.col(node_col).cast("long").alias("node")).distinct()
    return dists.join(tgt, "node").select("src", "node", "dist")


def shortest_paths(
    labels: DataFrame,
    targets: DataFrame,
    *,
    node_col: str = "node",
    max_hops: int = 10_000,
    sync_every: int = 8,
) -> DataFrame:
    """Materialize optimal source->target routes by walking the
    `par` pointers of ``sssp(..., return_parent=True)`` output.

    Returns (tgt, seq, node): seq counts hops FROM THE TARGET (seq 0
    = the target row, the largest seq = the source) — reverse per
    tgt for travel order.  Unreached targets emit nothing.

    Shape: the walker set (one row per unfinished target) broadcasts
    against the persisted parent table each hop — the parent table
    never shuffles, and per-round cost is one in-memory scan.  Total
    cost is O(longest path x parent-table scan): bound the target
    set (the ``per_source`` contract); for whole-graph closures use
    the pointer-doubling machinery (``raster.flow_accumulation``)
    instead.  `sync_every` hops build lazily between termination
    probes (the sssp convention — one materializing count per batch;
    finished walkers produce empty steps, so overshoot is free).
    Raises past `max_hops` — zero-weight cycles can produce parent
    cycles (see sssp), and a walk that long means the input was not
    a converged label table.
    """
    par = labels.select(
        F.col("node").alias("p_node"), F.col("par").alias("p_par")
    ).persist()
    walker = (
        targets.select(F.col(node_col).cast("long").alias("tgt"))
        .distinct()
        .join(par, F.col("tgt") == F.col("p_node"))
        .select(
            "tgt",
            F.col("tgt").alias("node"),
            F.lit(0).cast("long").alias("seq"),
        )
        .localCheckpoint(eager=True)
    )
    out = walker
    hops = 0
    batch = max(1, int(sync_every))
    while True:
        # probe exactly at the max_hops boundary so the guard fires
        # before running meaningfully past it
        for _ in range(max(1, min(batch, max_hops + 1 - hops))):
            step = (
                F.broadcast(walker)
                .join(par, walker["node"] == par["p_node"])
                .filter(F.col("p_par") != F.col("node"))
                .select(
                    "tgt",
                    F.col("p_par").alias("node"),
                    (F.col("seq") + 1).alias("seq"),
                )
                .localCheckpoint(eager=False)
            )
            out = out.unionByName(step).localCheckpoint(eager=False)
            walker = step
            hops += 1
        # ONE job materializes the whole batch's pending checkpoints
        if walker.count() == 0:
            break
        if hops > max_hops:
            par.unpersist()
            raise RuntimeError(
                f"shortest_paths exceeded max_hops={max_hops}: "
                "parent cycle (zero-weight edges) or an unconverged "
                "label table"
            )
    # materialize `out` while `par` is still cached
    out = out.localCheckpoint(eager=True)
    par.unpersist()
    return out
