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

from geomesa_spark.session import local_checkpoint as _lckpt

__all__ = [
    "pagerank", "PR_RANK_SQL",
    "triangle_counts", "transitivity", "k_core", "neighbor_overlap",
    "hits", "HITS_NORM_SQL",
    "boruvka_mst", "single_linkage",
    "closeness", "CLOSENESS_SQL",
    "label_propagation",
    "assortativity", "ASSORTATIVITY_SQL",
    "CLUSTERING_SQL", "JACCARD_SQL",
    "TRANSITIVITY_SQL",
]

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
    sources: DataFrame | None = None,
) -> DataFrame:
    """Fixed-round integer PageRank.  Returns (node, rank_fp, rank)
    where rank_fp is the exact int64 fixed-point score after
    ``rounds`` synchronous iterations from the uniform start
    r_0 = r_scale, and rank = rank_fp / r_scale (``PR_RANK_SQL``).

    ``sources=`` restricts the teleport to a seed node set (one
    column, any name) — personalized PageRank / TrustRank: seeds
    start at r_scale and keep the teleport income, every other node
    starts at 0 and earns rank only through damped inflow from the
    seed-reachable web (the seed-quality-propagation crawl filter,
    Gyöngyi et al. 2004).  The seed flag rides the node frame, so
    the per-round cost is unchanged."""
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
    )
    if sources is not None:
        seed = sources.select(
            F.col(sources.columns[0]).alias("node"),
            F.lit(True).alias("_seed"),
        ).distinct()
        nodes = nodes.join(seed, "node", "left").select(
            "node", F.coalesce(F.col("_seed"), F.lit(False)).alias("_seed")
        )
    else:
        nodes = nodes.select("node", F.lit(True).alias("_seed"))
    nodes = nodes.repartition(F.col("node")).persist()
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("_od"))
    ew = (
        e.join(deg, "src")
        .repartition(F.col("src"))
        .persist()
    )
    t_fp = int(r_scale) * (damping_den - damping_num) // damping_den
    ranks = nodes.select(
        "node",
        F.when(F.col("_seed"), F.lit(int(r_scale)))
        .otherwise(F.lit(0)).cast("long").alias("rank_fp"),
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
                    F.when(F.col("_seed"), F.lit(t_fp))
                    .otherwise(F.lit(0))
                    + F.expr(
                        f"({damping_num} * coalesce(_in, 0L))"
                        f" div {damping_den}"
                    )
                ).cast("long").alias("rank_fp"),
            )
            # LAZY: the fixed-round chain materializes as ONE job at
            # the eager checkpoint below (sssp fixed-rounds contract)
            .localCheckpoint(eager=False)
        )
    ranks = ranks.localCheckpoint(eager=True)
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


# local clustering coefficient: 2·tri / (deg·(deg−1)) — one shared
# double form over exact int64 counts; NULL below degree 2
CLUSTERING_SQL = (
    "CASE WHEN {d} >= 2 THEN 2.0 * CAST({t} AS DOUBLE)"
    " / (CAST({d} AS DOUBLE) * (CAST({d} AS DOUBLE) - 1.0)) END"
)

# global transitivity: 3·triangles / wedges (NULL on a wedge-free
# graph)
TRANSITIVITY_SQL = (
    "CASE WHEN {w} > 0 THEN 3.0 * CAST({t} AS DOUBLE)"
    " / CAST({w} AS DOUBLE) END"
)


def _undirected(edges: DataFrame, src_col: str, dst_col: str):
    """Canonical undirected simple edges (a < b): self-loops dropped,
    direction and duplicates folded."""
    s, d = F.col(src_col), F.col(dst_col)
    return (
        edges.filter(s != d)
        .select(
            F.least(s, d).alias("a"), F.greatest(s, d).alias("b")
        )
        .distinct()
    )


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over
    the undirected simple graph (direction/duplicates folded,
    self-loops dropped).

    The degree-ordering orientation (the classic O(m^1.5) bound):
    every edge orients from its lower-(degree, id) endpoint to the
    higher, so each triangle has exactly ONE wedge node with two
    out-edges — the wedge self-join on that node, filtered to the
    (rank_v < rank_w) half, plus one closing-edge equi-join counts
    each triangle exactly once, and the wedge fan-out per node is
    bounded by its ORIENTED out-degree, O(√m) on any graph (no
    hub-squared blowup).  Two shuffles on the wedge key + one on the
    closing key; all exact int64.

    Returns (node, degree, triangles, clustering) for every node of
    the graph — ``clustering`` via ``CLUSTERING_SQL`` (NULL below
    degree 2)."""
    und = _undirected(edges, src_col, dst_col)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    da = deg.select(
        F.col("node").alias("a"), F.col("degree").alias("_da")
    )
    db = deg.select(
        F.col("node").alias("b"), F.col("degree").alias("_db")
    )
    a_lower = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    ori = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_lower, F.col("a")).otherwise(F.col("b"))
            .alias("u"),
            F.when(a_lower, F.col("b")).otherwise(F.col("a"))
            .alias("v"),
            F.when(a_lower, F.col("_db")).otherwise(F.col("_da"))
            .alias("_dv"),
        )
    )
    e1 = ori.select("u", F.col("v").alias("v1"),
                    F.col("_dv").alias("_d1"))
    e2 = ori.select("u", F.col("v").alias("v2"),
                    F.col("_dv").alias("_d2"))
    wedge_half = (F.col("_d1") < F.col("_d2")) | (
        (F.col("_d1") == F.col("_d2")) & (F.col("v1") < F.col("v2"))
    )
    wedges = e1.join(e2, "u").filter(wedge_half).select(
        "u", "v1", "v2"
    )
    closing = ori.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tri = wedges.join(closing, ["v1", "v2"])
    per_node = (
        tri.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    out = deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
        .alias("triangles"),
    )
    return out.withColumn(
        "clustering",
        F.expr(CLUSTERING_SQL.format(d="degree", t="triangles")),
    )


def transitivity(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Global clustering (transitivity): ONE row
    (n_triangles, n_wedges, transitivity) — 3·tri/wedges over exact
    int64 totals (each triangle closes 3 of the Σ deg·(deg−1)/2
    wedges)."""
    tc = triangle_counts(edges, src_col, dst_col)
    return tc.agg(
        F.expr("sum(triangles) div 3").alias("n_triangles"),
        F.expr("sum(degree * (degree - 1)) div 2").alias("n_wedges"),
    ).withColumn(
        "transitivity",
        F.expr(
            TRANSITIVITY_SQL.format(t="n_triangles", w="n_wedges")
        ),
    )


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    max_iter: int = 100,
) -> DataFrame:
    """The k-core: the maximal subgraph of the undirected simple
    graph in which every node has degree >= k — the classic
    link-spam / noise peel (and the engine's fourth graph primitive
    after distances, components, and triangles).

    Synchronous peeling: each round drops every node whose degree
    within the SURVIVING subgraph is < k, until a fixed point.  One
    degree groupBy + one semi-join per round over the surviving
    edges (localCheckpointed — the sssp lineage contract); rounds
    are data-bounded (the degeneracy ordering's depth, typically
    single digits) and a non-converged loop raises at ``max_iter``
    rather than returning a partial core.  Synchronous deletion is
    deterministic under any partitioning — the surviving set after
    each round is schedule-independent, so an oracle can replay the
    rounds exactly.

    Returns the surviving undirected canonical edges
    (a, b) with a < b; an empty frame when the k-core is empty."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cur = _lckpt(_undirected(edges, src_col, dst_col))
    for _ in range(max_iter):
        deg = (
            cur.select(F.col("a").alias("node"))
            .unionByName(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").cast("long").alias("_d"))
        )
        keep = deg.filter(F.col("_d") >= k).select("node")
        nxt = (
            cur.join(
                keep.withColumnRenamed("node", "a"), "a", "semi"
            )
            .join(keep.withColumnRenamed("node", "b"), "b", "semi")
            .select("a", "b")
        )
        nxt = _lckpt(nxt)
        if nxt.count() == cur.count():
            return nxt
        cur = nxt
    raise RuntimeError(
        f"k_core did not converge within max_iter={max_iter} rounds"
    )


# Jaccard neighbor overlap: cn / (du + dv − cn) — exact ints, ONE
# division; NULL when either endpoint is absent from the graph
JACCARD_SQL = (
    "CASE WHEN {du} IS NOT NULL AND {dv} IS NOT NULL"
    " AND {du} + {dv} - {cn} > 0"
    " THEN CAST({cn} AS DOUBLE)"
    " / CAST({du} + {dv} - {cn} AS DOUBLE) END"
)


def neighbor_overlap(
    edges: DataFrame,
    pairs: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Link-prediction scores for CANDIDATE pairs: common-neighbor
    count and Jaccard overlap of the two neighborhoods over the
    undirected simple graph — the caller bounds the pair set (the
    hausdorff_join contract: candidates from an LSH bucket, a
    wedge sample, a recommender shortlist — never all-pairs).

    Shape: two adjacency equi-joins land each pair's common
    neighbors (cost Σ deg(u) over candidates), ONE partial-
    aggregated groupBy counts them, one degree join each side.
    All exact int64; jaccard = one division (``JACCARD_SQL``),
    NULL for endpoints absent from the graph.

    Returns (u, v, cn, deg_u, deg_v, jaccard)."""
    und = _undirected(edges, src_col, dst_col)
    adj = und.select(
        F.col("a").alias("_n0"), F.col("b").alias("_nb")
    ).unionByName(
        und.select(F.col("b").alias("_n0"), F.col("a").alias("_nb"))
    )
    deg = adj.groupBy("_n0").agg(
        F.count("*").cast("long").alias("_d")
    )
    # duplicate candidate rows would multiply cn (and re-expand on
    # the final join), so the pair set dedups here — bounded by the
    # candidate count the caller already owns
    p = pairs.select(
        F.col(u_col).alias("u"), F.col(v_col).alias("v")
    ).distinct()
    cn = (
        p.join(adj.withColumnRenamed("_n0", "u"), "u")
        .join(
            adj.select(F.col("_n0").alias("v"), "_nb"),
            ["v", "_nb"],
        )
        .groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("cn"))
    )
    out = (
        p.join(cn, ["u", "v"], "left")
        .join(
            deg.select(F.col("_n0").alias("u"),
                       F.col("_d").alias("deg_u")),
            "u", "left",
        )
        .join(
            deg.select(F.col("_n0").alias("v"),
                       F.col("_d").alias("deg_v")),
            "v", "left",
        )
        .select(
            "u", "v",
            F.coalesce(F.col("cn"), F.lit(0)).cast("long").alias("cn"),
            "deg_u", "deg_v",
        )
    )
    return out.withColumn(
        "jaccard",
        F.expr(JACCARD_SQL.format(du="deg_u", dv="deg_v", cn="cn")),
    )


# normalized emission: one division of the exact integer score by
# the exact integer maximum (NULL-safe on the empty graph)
HITS_NORM_SQL = (
    "CASE WHEN {mx} > 0 THEN CAST({x} AS DOUBLE)"
    " / CAST({mx} AS DOUBLE) END"
)


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    rounds: int = 4,
) -> DataFrame:
    """HITS hubs and authorities (Kleinberg 1999) over the DIRECTED
    simple graph: ``rounds`` synchronous unnormalized integer
    iterations from h_0 = 1 — authority = Σ hub over in-links, hub =
    Σ authority over out-links — then ONE normalization division per
    column on output (max-normalized doubles; the exact int64
    iterates are also returned).

    Unnormalized integer rounds keep every value exact and make the
    iteration SQL-replayable with no per-round scalar; the price is
    growth ~ (max degree)² per round, so values must satisfy
    (2·max_deg)^(2·rounds) < 2^63 — four rounds on a web-ish graph.
    Under ANSI mode an overflow raises loudly rather than wrapping;
    raise ``rounds`` only for low-degree graphs.  Per round: two
    edge-by-score joins + two partial-aggregated groupBys (the
    pagerank contract; edges persisted once per direction).

    Returns (node, auth_fp, hub_fp, authority, hub)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = edges.filter(F.col(src_col) != F.col(dst_col)).select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint()  # one filter+distinct, reused 3x
    # each persisted frame is partitioned on the key its round JOINS
    # on, so the edge side of every round is shuffle-free
    by_src = e.repartition(F.col("src")).persist()
    by_dst = e.repartition(F.col("dst")).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    hub = nodes.select(
        "node", F.lit(1).cast("long").alias("h")
    ).localCheckpoint()
    auth = None
    for _ in range(rounds):
        auth = (
            by_src.join(
                hub.select(F.col("node").alias("src"), "h"), "src"
            )
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
            .withColumnRenamed("dst", "node")
        )
        auth = nodes.join(auth, "node", "left").select(
            "node", F.coalesce(F.col("a"), F.lit(0)).alias("a")
        ).localCheckpoint(eager=False)
        hub = (
            by_dst.join(
                auth.select(F.col("node").alias("dst"), "a"), "dst"
            )
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
            .withColumnRenamed("src", "node")
        )
        hub = nodes.join(hub, "node", "left").select(
            "node", F.coalesce(F.col("h"), F.lit(0)).alias("h")
        ).localCheckpoint(eager=False)
    # materialize the lazy round chain (one job each) while the edge
    # caches are alive; rounds ran fully lazily above
    hub = hub.localCheckpoint(eager=True)
    auth = auth.localCheckpoint(eager=True)
    mx = F.broadcast(
        hub.join(auth, "node").agg(
            F.max("a").alias("_ma"), F.max("h").alias("_mh")
        )
    )
    out = (
        auth.withColumnRenamed("a", "auth_fp")
        .join(hub.withColumnRenamed("h", "hub_fp"), "node")
        .crossJoin(mx)
        .select(
            "node", "auth_fp", "hub_fp",
            F.expr(HITS_NORM_SQL.format(x="auth_fp", mx="_ma"))
            .alias("authority"),
            F.expr(HITS_NORM_SQL.format(x="hub_fp", mx="_mh"))
            .alias("hub"),
        )
    )
    for fr in (by_src, by_dst, nodes):
        fr.unpersist()
    return out


def boruvka_mst(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    *,
    max_rounds: int = 40,
) -> DataFrame:
    """Minimum spanning forest by synchronous Borůvka rounds — the
    bulk-synchronous MST every distributed graph system uses (each
    round every component hooks its cheapest outgoing edge, then
    components merge; the component count at least halves, so
    O(log n) rounds).  Spatial use: single-linkage clustering of a
    kNN/Delaunay-ish neighbor graph (``single_linkage``); network
    use: backbone extraction from ``route.edges_from_segments``
    weights.

    Weights must be an integer type (the engine-wide fixed-point
    convention — quantize floats upstream); multi-edges fold to
    their minimum weight and the undirected canonical (a < b) form
    dedups direction.  Ties break on the total (w, a, b) order, and
    since each canonical edge's (w, a, b) key is distinct the
    spanning forest is UNIQUE — any correct MST algorithm agrees,
    which is what the pytest oracle (an independent Kruskal)
    checks; the SQL gate replays the rounds exactly.

    Per round: one label join per endpoint, one per-component
    min-struct aggregate (partial-aggregated) to pick hook edges,
    then pointer DOUBLING over the hook forest (one row per active
    component; the unique edge order makes its only cycles mutual
    2-cycles, broken toward the smaller id) to merge labels — never
    over the full edge list.  Labels are localCheckpointed per round
    (the sssp lineage contract), checkpoints lazy with eager probes
    (the sssp sync_every contract).

    Returns (a, b, w, round) — the forest edges with the 1-based
    round that added them (deterministic; rounds past the fixed
    point add nothing, so replaying extra rounds is idempotent).
    """
    wt = edges.schema[w_col].dataType.simpleString()
    if wt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"boruvka_mst requires an integer weight column, got "
            f"{w_col}:{wt} — fixed-point-scale floats upstream "
            "(multiply + cast to long) so ties and sums stay exact"
        )
    s, d = F.col(src_col), F.col(dst_col)
    ce = (
        edges.filter(s != d)
        .select(
            F.least(s, d).alias("a"),
            F.greatest(s, d).alias("b"),
            F.col(w_col).cast("long").alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )
    ce = _lckpt(ce, eager=True)
    labels = (
        ce.select(F.col("a").alias("node"))
        .unionByName(ce.select(F.col("b").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("comp"))
    )
    labels = _lckpt(labels, eager=True)
    spark = edges.sparkSession
    mst = spark.createDataFrame(
        [], "a long, b long, w long, round int"
    )
    for rnd in range(1, max_rounds + 1):
        la = labels.select(
            F.col("node").alias("a"), F.col("comp").alias("ca")
        )
        lb = labels.select(
            F.col("node").alias("b"), F.col("comp").alias("cb")
        )
        cross = (
            ce.join(la, "a")
            .join(lb, "b")
            .filter(F.col("ca") != F.col("cb"))
        )
        # LAZY checkpoint + FULL count: one job both materializes the
        # round's pending chain (last round's labels/mst ride in) and
        # answers the termination probe — the eager-per-frame form
        # cost four driver-synchronized jobs per round
        cross = _lckpt(cross, eager=False)
        if cross.count() == 0:
            return mst
        both = cross.select(
            F.col("ca").alias("_comp"), "a", "b", "w", "ca", "cb"
        ).unionByName(
            cross.select(
                F.col("cb").alias("_comp"), "a", "b", "w", "ca", "cb"
            )
        )
        # cheapest outgoing edge per component: ONE min-struct on the
        # unique total order (w, a, b); ca/cb ride along
        pick = _lckpt(
            both.groupBy("_comp")
            .agg(F.min(F.struct("w", "a", "b", "ca", "cb")).alias("_m"))
            .select(
                "_comp",
                F.col("_m.a").alias("a"),
                F.col("_m.b").alias("b"),
                F.col("_m.w").alias("w"),
                F.col("_m.ca").alias("ca"),
                F.col("_m.cb").alias("cb"),
            ),
            eager=False,
        )
        # both endpoints of a mutual cheapest edge pick the same
        # (a, b, w) edge — full-row distinct folds it to ONE forest
        # edge (deterministic, unlike a keyed dropDuplicates over
        # rows that differ in _comp)
        sel = pick.select("a", "b", "w").distinct()
        mst = _lckpt(
            mst.unionByName(
                sel.select("a", "b", "w", F.lit(rnd).alias("round"))
            ),
            eager=False,
        )
        # merge via the HOOK FOREST: parent(comp) = the opposite
        # component of its own cheapest edge.  Under the unique
        # (w, a, b) total order the pointer graph's only cycles are
        # MUTUAL pairs (Borůvka's classic invariant), broken toward
        # the smaller id so each merge tree has exactly one
        # self-rooted node; pointer DOUBLING (par <- par∘par) then
        # reaches the root in O(log depth) single-self-join rounds —
        # a third of the shuffles of the general min-label
        # connected-components loop this replaces, on a frame with
        # exactly one row per active component.
        par = pick.select(
            "_comp",
            F.when(F.col("ca") == F.col("_comp"), F.col("cb"))
            .otherwise(F.col("ca")).alias("_par"),
        )
        p2 = par.select(
            F.col("_comp").alias("_pc"), F.col("_par").alias("_pp")
        )
        par = _lckpt(
            par.join(p2, par["_par"] == p2["_pc"], "left")
            .select(
                "_comp",
                F.when(
                    F.col("_pp") == F.col("_comp"),
                    F.least(F.col("_comp"), F.col("_par")),
                )
                .otherwise(F.col("_par")).alias("_par"),
            ),
            eager=True,
        )
        for dbl in range(1, 65):
            p2 = par.select(
                F.col("_comp").alias("_pc"), F.col("_par").alias("_pp")
            )
            new_par = F.coalesce(F.col("_pp"), F.col("_par"))
            is_probe = dbl % 2 == 0
            par = _lckpt(
                par.join(p2, par["_par"] == p2["_pc"], "left")
                .select(
                    "_comp",
                    new_par.alias("_par"),
                    (new_par != F.col("_par")).alias("_chg"),
                ),
                eager=is_probe,
            )
            if is_probe and par.filter("_chg").count() == 0:
                break
        else:
            raise RuntimeError(
                "boruvka_mst merge did not converge — hook-chain "
                "depth exceeds 2^64, impossible"
            )
        remap = par.select(
            F.col("_comp").alias("comp"), F.col("_par").alias("_nc")
        )
        labels = _lckpt(
            labels.join(remap, "comp", "left")
            .select(
                "node",
                F.coalesce(F.col("_nc"), F.col("comp")).alias("comp"),
            ),
            eager=False,
        )
    raise RuntimeError(
        f"boruvka_mst did not converge in {max_rounds} rounds — "
        "components halve per round, so this graph would need "
        f"> 2^{max_rounds} nodes"
    )


def single_linkage(
    msf: DataFrame,
    threshold: int,
) -> DataFrame:
    """Single-linkage clusters at distance ``threshold`` from a
    stored ``boruvka_mst`` forest: clusters = connected components
    of the forest edges with w <= threshold (the classic dendrogram
    cut — the MSF is the single-linkage dendrogram, so ONE stored
    forest serves every threshold without touching the full graph
    again).  Returns (node, cluster) with cluster = min member id;
    nodes whose every incident forest edge exceeds the threshold are
    absent (singletons — union the node frame back if needed)."""
    from .dedup import dup_components

    cut = msf.filter(F.col("w") <= F.lit(int(threshold)))
    return dup_components(cut, a_col="a", b_col="b").select(
        F.col("doc").alias("node"), F.col("canon").alias("cluster")
    )


# closeness: (n_reached - 1) / Σdist — exact ints, ONE division;
# NULL for an isolated source (nothing reached beyond itself)
CLOSENESS_SQL = (
    "CASE WHEN {td} > 0 THEN (CAST({nr} AS DOUBLE) - 1.0)"
    " / CAST({td} AS DOUBLE) END"
)


def closeness(
    edges: DataFrame,
    sources: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    directed: bool = False,
    max_rounds: int = 100,
    rounds: int | None = None,
) -> DataFrame:
    """Closeness centrality + eccentricity for a BOUNDED source set
    — the sampled-pivot form every large-graph system uses (exact
    all-nodes closeness is n BFS sweeps; picking the pivots is the
    caller's sampling policy, e.g. ``sample.hash_sample`` over the
    node frame).  State is O(|sources| x reached) per the
    ``route.sssp(per_source=True)`` contract.

    Runs unit-weight per-source BFS through ``route.sssp`` (frontier
    Bellman-Ford, exact integer hop distances, schedule-independent)
    and folds each source's distance vector into the classic
    centrality summary.

    Returns one row per source node:
    (src, n_reached, total_dist, eccentricity, closeness) where
    n_reached INCLUDES the source itself, total_dist = Σ hop
    distances (exact int64), eccentricity = max hop distance, and
    closeness = (n_reached - 1) / total_dist (``CLOSENESS_SQL`` —
    the component-local convention; multiply by (n_reached - 1)/(n - 1)
    for Wasserman-Faust normalization if the caller knows n).
    NULL closeness for sources that reach nothing.

    ``rounds=R`` computes the EXACTLY-R-hop bounded form (the
    ``sssp(rounds=)`` precedent — a well-defined quantity of its
    own, and the form a hop-capped SQL oracle can replay); the
    default iterates to convergence.
    """
    from .route import sssp

    e = edges.filter(F.col(src_col) != F.col(dst_col)).select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct().withColumn("w", F.lit(1).cast("long"))
    src = sources.select(
        F.col(sources.columns[0]).cast("long").alias("node")
    ).distinct()
    d = sssp(
        e, src, per_source=True, max_rounds=max_rounds, rounds=rounds
    )
    out = d.groupBy(F.col("src")).agg(
        F.count(F.lit(1)).cast("long").alias("n_reached"),
        F.sum("dist").cast("long").alias("total_dist"),
        F.max("dist").cast("long").alias("eccentricity"),
    )
    return out.withColumn(
        "closeness",
        F.expr(CLOSENESS_SQL.format(nr="n_reached", td="total_dist")),
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    rounds: int = 4,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the undirected simple graph: every node starts
    as its own community, then each round SIMULTANEOUSLY adopts the
    most frequent label among its neighbors (ties -> minimum label;
    isolated labels keep themselves).  The round count is FIXED —
    synchronous LPA has no convergence guarantee (bipartite-ish
    regions oscillate), so the fixed-round form is the well-defined
    deterministic quantity (the ``pagerank(rounds=)`` precedent) and
    the SQL oracle replays the same rounds exactly.

    Per round: one adjacency join + one (node, label) count groupBy
    + one per-node min-struct argmax — all partial-aggregated exact
    int64, bit-identical under any partitioning (the (-count, label)
    struct is a total order).  Adjacency is repartitioned on the
    join key once and persisted (the pagerank edge contract).

    Returns (node, label) after ``rounds`` rounds — label = the
    community id (a member node id).
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    und = _undirected(edges, src_col, dst_col)
    adj = (
        und.select(F.col("a").alias("node"), F.col("b").alias("_nb"))
        .unionByName(
            und.select(F.col("b").alias("node"), F.col("a").alias("_nb"))
        )
        .repartition(F.col("_nb"))
        .persist()
    )
    labels = _lckpt(
        adj.select("node").distinct().select(
            "node", F.col("node").alias("label")
        ),
        eager=True,
    )
    for _ in range(rounds):
        votes = (
            adj.join(
                labels.select(
                    F.col("node").alias("_nb"), "label"
                ),
                "_nb",
            )
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.min(F.struct((-F.col("_c")).alias("_nc"), "label"))
                .alias("_m")
            )
            .select("node", F.col("_m.label").alias("label"))
        )
        # LAZY: the fixed-round chain runs as ONE job at the final
        # eager materialization (the sssp fixed-rounds contract) —
        # per-round eager checkpoints cost a driver sync each
        labels = _lckpt(labels, eager=False)
    # materialize while the adjacency cache is alive, so unpersist
    # can't force a rounds-deep recompute later
    labels = labels.localCheckpoint(eager=True)
    adj.unpersist()
    return labels


# degree assortativity (Newman 2002, eq. 4): the Pearson correlation
# of endpoint degrees over all 2m directed edge stubs — every sum is
# an exact integer (decimal 38,0), ONE double division at the end;
# NULL when the denominator is 0 (degree-regular graph)
ASSORTATIVITY_SQL = (
    "CASE WHEN {m} * {s2} - {s1} * {s1} <> 0"
    " THEN CAST({m} * {sxy} - {s1} * {s1} AS DOUBLE)"
    " / CAST({m} * {s2} - {s1} * {s1} AS DOUBLE) END"
)


def assortativity(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Degree assortativity of the undirected simple graph: the
    Pearson correlation of the degrees at either end of an edge
    (positive = hubs link hubs, negative = hub-and-spoke — the
    classic web/social topology diagnostic, Newman 2002).

    Over the 2m directed stubs (x = source-end degree, y = other-end
    degree; symmetric, so Σx = Σy and Σx² = Σy²) the coefficient is
    r = (2m·Σxy − (Σx)²) / (2m·Σx² − (Σx)²).  All four sums are
    exact decimal(38,0) aggregates (degree products overflow int64
    on web-scale hub graphs) from ONE degree join + ONE aggregate;
    the division is the only double op (``ASSORTATIVITY_SQL``).
    Exactness bound: the final products need (Σx²)² < 10^38, i.e.
    Σ deg² < 10^19 — beyond that (10^10+ stubs of 10^4+ mean degree)
    the decimal caps and the result is NULL, not silently wrong.

    Returns ONE row (m, s1, s2, sxy, assortativity) — m = undirected
    edge count; NULL assortativity on degree-regular graphs (zero
    variance)."""
    und = _undirected(edges, src_col, dst_col)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("_d"))
    )
    stubs = und.select(
        F.col("a").alias("_x"), F.col("b").alias("_y")
    ).unionByName(
        und.select(F.col("b").alias("_x"), F.col("a").alias("_y"))
    )
    dx = deg.select(F.col("node").alias("_x"), F.col("_d").alias("_dx"))
    dy = deg.select(F.col("node").alias("_y"), F.col("_d").alias("_dy"))
    j = stubs.join(dx, "_x").join(dy, "_y")
    dec = "decimal(38,0)"
    agg = j.agg(
        F.expr("CAST(count(1) div 2 AS BIGINT)").alias("m"),
        F.sum(F.col("_dx").cast(dec)).alias("s1"),
        # cast BEFORE multiplying: long·long raises on ANSI overflow
        # for web-scale hub degrees; decimal(38,0) products are exact
        F.sum(F.col("_dx").cast(dec) * F.col("_dx").cast(dec)).alias("s2"),
        F.sum(F.col("_dx").cast(dec) * F.col("_dy").cast(dec)).alias("sxy"),
    )
    two_m = "(CAST(2 AS decimal(38,0)) * CAST(m AS decimal(38,0)))"
    return agg.withColumn(
        "assortativity",
        F.expr(
            ASSORTATIVITY_SQL.format(m=two_m, s1="s1", s2="s2", sxy="sxy")
        ),
    )
