"""Hot-spot detection: Getis-Ord Gi* over the engine's integer grid.

The reference's DensityProcess (``DensityProcess.scala``, our
``operators/analytics.density`` / ``rasterize.py``) renders WHERE the
mass is; Gi* (Getis & Ord 1992, the standard hot-spot statistic)
says where the mass is SIGNIFICANTLY above the corpus mean — the
difference between a heat map and an anomaly detector.

Scale design: three bounded stages, no Python, no cartesian —

1. one partial-aggregated groupBy onto grid cells (the density
   shape: output bounded by 4^bits, not corpus size);
2. neighborhood sums by exploding each OCCUPIED cell onto its
   (2·ring+1)² neighbor keys and re-aggregating — a second groupBy
   bounded by occupied_cells × window size, never corpus², with
   longitude wrapping at the antimeridian (x is cyclic, y clamps at
   the poles — the IDL convention everywhere in this engine);
3. corpus moments (N, Σw, Σw²) as ONE broadcast row.

Determinism: every aggregate is exact int64; the z-score is derived
from those integers through +,-,*,/ and sqrt only — all IEEE
correctly-rounded, and the formula is ONE canonical SQL string
(``GI_STAR_SQL``) evaluated verbatim by Spark (``F.expr``) and by
the DuckDB oracle, so the doubles hash-compare exactly (the
url_normalize shared-expression convention).

Gi* here is over the OCCUPIED cells: the statistic's universe N is
the set of cells with at least one observation, and a cell's
neighborhood statistics count its occupied neighbors (`nbr_n`, with
the cell itself — the * variant).  Empty cells carry no sample and
emit no row; the choice is pinned by the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.functions import cells as C

__all__ = [
    "hotspot_cells", "hotspot_cells_st", "hotspot_st_from_bins",
    "hotspot_hex", "GI_STAR_SQL",
    "mann_kendall", "sen_slope", "emerging_hotspots",
    "MK_Z_SQL", "PATTERN_SQL", "SEN_SQL",
]

# (S - mean*n) / (s * sqrt((N*n - n^2) / (N-1))) with
# mean = W/N, s = sqrt(Q/N - mean^2); NULL when the denominator
# degenerates (uniform counts or N=1). Placeholders: {S}=nbr_sum,
# {n}=nbr_n, {N}=n_cells, {W}=sum_w, {Q}=sum_q — all int64 columns.
GI_STAR_SQL = (
    "CASE WHEN {N} > 1"
    " AND sqrt(CAST({Q} AS DOUBLE)/{N} - (CAST({W} AS DOUBLE)/{N})*(CAST({W} AS DOUBLE)/{N})) > 0"
    " THEN (CAST({S} AS DOUBLE) - (CAST({W} AS DOUBLE)/{N})*{n})"
    " / (sqrt(CAST({Q} AS DOUBLE)/{N} - (CAST({W} AS DOUBLE)/{N})*(CAST({W} AS DOUBLE)/{N}))"
    " * sqrt((CAST({N} AS DOUBLE)*{n} - CAST({n} AS DOUBLE)*{n}) / ({N} - 1.0)))"
    " END"
)


def gi_star_expr(S="nbr_sum", n="nbr_n", N="n_cells", W="sum_w", Q="sum_q") -> str:
    return GI_STAR_SQL.format(S=S, n=n, N=N, W=W, Q=Q)


def hotspot_cells(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bits: int = 6,
    ring: int = 1,
    weight_col: str | None = None,
) -> DataFrame:
    """Gi* per occupied grid cell at resolution `bits` (2^bits ×
    2^bits world grid), neighborhood = the (2·ring+1)² window.

    Returns (x, y, w, nbr_n, nbr_sum, gi_star): the cell's own
    weight, its occupied-neighbor count and weight sum (self
    included), and the Gi* z-score (NULL when degenerate).
    `weight_col` (int) sums that column instead of counting rows."""
    n = 1 << bits
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    cells = (
        df.select(
            C.lon_to_x(F.col(lon_col), bits).alias("x"),
            C.lat_to_y(F.col(lat_col), bits).alias("y"),
            w.alias("_w"),
        )
        .groupBy("x", "y")
        .agg(F.sum("_w").alias("w"))
    )
    offsets = [(dx, dy) for dx in range(-ring, ring + 1)
               for dy in range(-ring, ring + 1)]
    # each occupied cell contributes its weight to every neighbor's
    # window: x wraps (cyclic longitude), y out-of-range drops (poles)
    contrib = cells.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.pmod(F.col("x") + F.lit(dx), F.lit(n)).alias("tx"),
                    (F.col("y") + F.lit(dy)).alias("ty"),
                )
                for dx, dy in offsets
            ])
        ).alias("t"),
        "w",
    ).select(
        F.col("t.tx").alias("x"), F.col("t.ty").alias("y"), "w"
    ).filter((F.col("y") >= 0) & (F.col("y") < n))
    nbr = contrib.groupBy("x", "y").agg(
        F.count("*").cast("long").alias("nbr_n"),
        F.sum("w").alias("nbr_sum"),
    )
    stats = F.broadcast(
        cells.agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum("w").alias("sum_w"),
            F.sum(F.col("w") * F.col("w")).alias("sum_q"),
        )
    )
    return (
        cells.join(nbr, ["x", "y"], "inner")  # occupied cells only
        .crossJoin(stats)
        .withColumn("gi_star", F.expr(gi_star_expr()))
        .select("x", "y", "w", "nbr_n", "nbr_sum", "gi_star")
    )


def hotspot_cells_st(
    df: DataFrame,
    ts_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bits: int = 6,
    ring: int = 1,
    time_bucket_s: int = 86400,
    time_ring: int = 1,
    weight_col: str | None = None,
) -> DataFrame:
    """Space-time Gi*: the hot-spot statistic over (cell, time
    bucket) bins — a cell is hot only if its neighborhood is dense
    IN THAT TIME WINDOW (the emerging-hotspot bin statistic; plain
    ``hotspot_cells`` would call a cell hot that was busy once,
    months ago).

    Same three bounded stages as ``hotspot_cells`` with the
    neighborhood extended to (2·ring+1)² × (2·time_ring+1) bins:
    occupied bins explode onto their spatiotemporal neighbor keys
    (x wraps, y clamps, t is unbounded — edge buckets simply have
    fewer occupied neighbors, pinned by the oracle), and the corpus
    moments are over occupied BINS.  Determinism contract identical
    (exact int64 aggregates + the shared ``GI_STAR_SQL``).

    Returns (x, y, tb, w, nbr_n, nbr_sum, gi_star)."""
    ticks = (
        F.unix_timestamp(F.col(ts_col))
        if dict(df.dtypes)[ts_col].startswith("timestamp")
        else F.col(ts_col).cast("long")
    )
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    cells = (
        df.select(
            C.lon_to_x(F.col(lon_col), bits).alias("x"),
            C.lat_to_y(F.col(lat_col), bits).alias("y"),
            F.floor(ticks / F.lit(time_bucket_s)).cast("long").alias("tb"),
            w.alias("_w"),
        )
        .groupBy("x", "y", "tb")
        .agg(F.sum("_w").alias("w"))
    )
    return hotspot_st_from_bins(cells, bits, ring=ring, time_ring=time_ring)


def hotspot_st_from_bins(
    cells: DataFrame,
    bits: int,
    ring: int = 1,
    time_ring: int = 1,
) -> DataFrame:
    """Gi* over PRE-AGGREGATED (x, y, tb, w) bins — the stage
    ``hotspot_cells_st`` runs after its binning groupBy, exposed so
    accumulated bin STATE (streaming/hotspot.py merges per-batch
    deltas into a bounded bin table) feeds the identical statistic.
    Same neighborhood/moments/z stages and determinism contract."""
    n = 1 << bits
    offsets = [
        (dx, dy, dt)
        for dx in range(-ring, ring + 1)
        for dy in range(-ring, ring + 1)
        for dt in range(-time_ring, time_ring + 1)
    ]
    contrib = cells.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.pmod(F.col("x") + F.lit(dx), F.lit(n)).alias("tx"),
                    (F.col("y") + F.lit(dy)).alias("ty"),
                    (F.col("tb") + F.lit(dt)).alias("tt"),
                )
                for dx, dy, dt in offsets
            ])
        ).alias("t"),
        "w",
    ).select(
        F.col("t.tx").alias("x"), F.col("t.ty").alias("y"),
        F.col("t.tt").alias("tb"), "w",
    ).filter((F.col("y") >= 0) & (F.col("y") < n))
    nbr = contrib.groupBy("x", "y", "tb").agg(
        F.count("*").cast("long").alias("nbr_n"),
        F.sum("w").alias("nbr_sum"),
    )
    stats = F.broadcast(
        cells.agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum("w").alias("sum_w"),
            F.sum(F.col("w") * F.col("w")).alias("sum_q"),
        )
    )
    return (
        cells.join(nbr, ["x", "y", "tb"], "inner")
        .crossJoin(stats)
        .withColumn("gi_star", F.expr(gi_star_expr()))
        .select("x", "y", "tb", "w", "nbr_n", "nbr_sum", "gi_star")
    )


# Mann-Kendall z with the continuity correction: z = (S -+ 1)/sqrt(var),
# 0 when S = 0, NULL when the variance degenerates (n < 2 or all values
# tied). {S} = the integer sign sum, {V} = 18*var as an exact int64
# (n(n-1)(2n+5) - tie correction), so the only float ops are one
# division and one sqrt — the GI_STAR_SQL determinism contract.
MK_Z_SQL = (
    "CASE WHEN {V} > 0 THEN"
    " (CAST({S} AS DOUBLE)"
    " - CASE WHEN {S} > 0 THEN 1.0 WHEN {S} < 0 THEN -1.0 ELSE 0.0 END)"
    " / sqrt(CAST({V} AS DOUBLE) / 18.0)"
    " END"
)

# Emerging-hotspot classification (the ESRI emerging-hot-spot
# taxonomy, reduced to the exactly-decidable core): evaluated over
# (last_hot, n_hot, mk_z) by BOTH engines verbatim.
PATTERN_SQL = (
    "CASE WHEN last_hot = 1 AND n_hot = 1 THEN 'new'"
    " WHEN last_hot = 1 AND mk_z >= {tz} THEN 'intensifying'"
    " WHEN last_hot = 1 AND mk_z <= -{tz} THEN 'diminishing'"
    " WHEN last_hot = 1 THEN 'persistent'"
    " WHEN n_hot > 0 THEN 'formerly_hot'"
    " ELSE 'none' END"
)


def mk_z_expr(S="s", V="var_num") -> str:
    return MK_Z_SQL.format(S=S, V=V)


def mann_kendall(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    v_col: str,
) -> DataFrame:
    """Mann-Kendall trend test per key: S = sum over ordered bin
    pairs of sign(v_j - v_i), tie-corrected variance, and the
    continuity-corrected z — the standard monotone-trend statistic
    (Mann 1945, Kendall 1975; the trend stage of ESRI's emerging
    hot spot analysis).

    Scale shape: the pair term is a per-key equi-join — O(T^2) with
    T = bins per key, caller-bounded (days per analysis window),
    never corpus^2 (the hausdorff_join contract).  S, the tie sum,
    and 18*var are exact int64, so both engines agree bit-for-bit;
    z adds one division and one sqrt (``MK_Z_SQL``).

    Returns key_cols + (n_bins, s, var_num, mk_z) — var_num = 18*var;
    mk_z NULL when var degenerates (n < 2 or all values tied)."""
    b = df.select(
        *key_cols,
        F.col(t_col).alias("_t"),
        F.col(v_col).cast("long").alias("_v"),
    )
    n = b.groupBy(*key_cols).agg(F.count("*").cast("long").alias("n_bins"))
    li = b.select(*key_cols, F.col("_t").alias("_ti"),
                  F.col("_v").alias("_vi"))
    rj = b.select(*key_cols, F.col("_t").alias("_tj"),
                  F.col("_v").alias("_vj"))
    sgn = (
        F.when(F.col("_vj") > F.col("_vi"), 1)
        .when(F.col("_vj") < F.col("_vi"), -1)
        .otherwise(0)
    )
    s = (
        li.join(rj, key_cols)
        .filter(F.col("_ti") < F.col("_tj"))
        .groupBy(*key_cols)
        .agg(F.sum(sgn).cast("long").alias("s"))
    )
    g = F.col("_g")
    ties = (
        b.groupBy(*key_cols, "_v")
        .agg(F.count("*").cast("long").alias("_g"))
        .groupBy(*key_cols)
        .agg(
            F.sum(g * (g - 1) * (2 * g + 5)).cast("long").alias("_tt")
        )
    )
    nb = F.col("n_bins")
    return (
        n.join(s, key_cols, "left")
        .join(ties, key_cols, "left")
        .select(
            *key_cols,
            "n_bins",
            F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("s"),
            (nb * (nb - 1) * (2 * nb + 5)
             - F.coalesce(F.col("_tt"), F.lit(0)))
            .cast("long").alias("var_num"),
        )
        .withColumn("mk_z", F.expr(mk_z_expr()))
    )


def emerging_hotspots(
    df: DataFrame,
    ts_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bits: int = 6,
    ring: int = 1,
    time_bucket_s: int = 86400,
    time_ring: int = 1,
    weight_col: str | None = None,
    hot_z: float = 1.96,
    trend_z: float = 1.96,
) -> DataFrame:
    """Emerging hot spot analysis: classify each occupied cell by how
    its space-time Gi* hot bins evolve — the composition ESRI ships
    on top of the space-time cube (``hotspot_cells_st`` is the bin
    statistic; this adds the per-cell Mann-Kendall trend on bin
    weights and a pattern label).

    A bin is HOT when its gi_star >= `hot_z`; "last" is the GLOBAL
    newest time bucket (a cell absent from it is not currently hot).
    Patterns (``PATTERN_SQL``): new (hot now, never before),
    intensifying / diminishing (hot now, weight trend |z| >=
    `trend_z`), persistent (hot now, no significant trend),
    formerly_hot, none.

    The bin frame is lazily localCheckpointed: three downstream
    consumers (per-cell rollup, MK pairs, tie groups) re-read the
    materialized bins instead of re-running the three-stage Gi*
    pipeline.  Returns (x, y, n_bins, n_hot, last_hot, s, var_num,
    mk_z, pattern)."""
    st = hotspot_cells_st(
        df, ts_col, lon_col=lon_col, lat_col=lat_col, bits=bits,
        ring=ring, time_bucket_s=time_bucket_s, time_ring=time_ring,
        weight_col=weight_col,
    ).localCheckpoint(eager=False)
    last = F.broadcast(st.agg(F.max("tb").alias("_lt")))
    hot = F.when(F.col("gi_star") >= F.lit(float(hot_z)), 1).otherwise(0)
    per_cell = (
        st.crossJoin(last)
        .groupBy("x", "y")
        .agg(
            F.sum(hot).cast("long").alias("n_hot"),
            F.max(
                F.when((F.col("tb") == F.col("_lt")) & (hot == 1), 1)
                .otherwise(0)
            ).cast("long").alias("last_hot"),
        )
    )
    mk = mann_kendall(st, ["x", "y"], "tb", "w")
    return (
        per_cell.join(mk, ["x", "y"])
        .withColumn(
            "pattern", F.expr(PATTERN_SQL.format(tz=float(trend_z)))
        )
        .select(
            "x", "y", "n_bins", "n_hot", "last_hot", "s", "var_num",
            "mk_z", "pattern",
        )
    )


def hotspot_hex(
    df: DataFrame,
    size: float,
    lon_col: str = "lon",
    lat_col: str = "lat",
    ring: int = 1,
    weight_col: str | None = None,
) -> DataFrame:
    """Gi* over the HEX lattice (functions/hex.py): the same three
    bounded stages as ``hotspot_cells`` with hexagonal contiguity —
    a hex's neighborhood at ring 1 is its 6 touching cells + itself
    (uniform center distance, no diagonal-adjacency artifact — the
    reason analysts bin hexes), ring 2 adds the 12 next ring, etc.
    Axial-coordinate rings are the standard cube-distance disk:
    all (dq, dr) with max(|dq|, |dr|, |dq+dr|) <= ring.

    Hex keys are unbounded integers (no pmod wrap: the lattice is
    planar — split at the antimeridian like every planar operator
    here). Determinism contract identical to hotspot_cells (exact
    int64 aggregates + the shared GI_STAR_SQL).

    Returns (hq, hr, w, nbr_n, nbr_sum, gi_star)."""
    from geomesa_spark.functions.hex import hex_cell_cols

    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    hq, hr = hex_cell_cols(F.col(lon_col), F.col(lat_col), size)
    cells = (
        df.select(hq.alias("hq"), hr.alias("hr"), w.alias("_w"))
        .groupBy("hq", "hr")
        .agg(F.sum("_w").alias("w"))
    )
    offsets = [
        (dq, dr)
        for dq in range(-ring, ring + 1)
        for dr in range(-ring, ring + 1)
        if max(abs(dq), abs(dr), abs(dq + dr)) <= ring
    ]
    contrib = cells.select(
        F.explode(
            F.array(*[
                F.struct(
                    (F.col("hq") + F.lit(dq)).alias("tq"),
                    (F.col("hr") + F.lit(dr)).alias("tr"),
                )
                for dq, dr in offsets
            ])
        ).alias("t"),
        "w",
    ).select(F.col("t.tq").alias("hq"), F.col("t.tr").alias("hr"), "w")
    nbr = contrib.groupBy("hq", "hr").agg(
        F.count("*").cast("long").alias("nbr_n"),
        F.sum("w").alias("nbr_sum"),
    )
    stats = F.broadcast(
        cells.agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum("w").alias("sum_w"),
            F.sum(F.col("w") * F.col("w")).alias("sum_q"),
        )
    )
    return (
        cells.join(nbr, ["hq", "hr"], "inner")
        .crossJoin(stats)
        .withColumn("gi_star", F.expr(gi_star_expr()))
        .select("hq", "hr", "w", "nbr_n", "nbr_sum", "gi_star")
    )


# Sen estimate = the mean of the one or two middle order statistics
# of the pairwise slopes: one division of a 1-2-term double sum by
# its exact count (addition of two doubles is commutative, so the
# merge order never shows)
SEN_SQL = "CAST({ss} AS DOUBLE) / CAST({cnt} AS DOUBLE)"


def sen_slope(
    df: DataFrame,
    key_cols: list[str],
    t_col: str,
    v_col: str,
) -> DataFrame:
    """Theil–Sen slope per key: the median of all pairwise slopes
    (v_j − v_i)/(t_j − t_i) over t_i < t_j — the robust trend
    MAGNITUDE that pairs with ``mann_kendall``'s trend *direction*
    in emerging-hotspot analysis (Sen 1968; ESRI reports both).

    Scale shape: the same per-key pair equi-join as ``mann_kendall``
    — O(T²) with T = bins per key, caller-bounded, never corpus².
    Every slope is ONE double division of two exact int64 deltas
    (identical IEEE result in any engine); the median is an order
    statistic — rank (m+1)//2, averaged with rank m//2+1 when m is
    even — so the result is deterministic under any partitioning
    (equal-slope rank ties select equal values).

    Returns key_cols + (n_pairs, sen); keys with no strictly-ordered
    pair are absent (nothing to estimate)."""
    for c, role in ((t_col, "t_col"), (v_col, "v_col")):
        if dict(df.dtypes)[c] not in (
            "bigint", "int", "smallint", "tinyint"
        ):
            raise ValueError(
                f"sen_slope: {role} {c!r} must be integral — a cast "
                "would silently truncate; pre-scale floats with "
                "floor(v * scale) (the idw_grid fixed-mode contract)"
            )
    b = df.select(
        *key_cols,
        F.col(t_col).cast("long").alias("_t"),
        F.col(v_col).cast("long").alias("_v"),
    )
    li = b.select(*key_cols, F.col("_t").alias("_ti"),
                  F.col("_v").alias("_vi"))
    rj = b.select(*key_cols, F.col("_t").alias("_tj"),
                  F.col("_v").alias("_vj"))
    slopes = (
        li.join(rj, key_cols)
        .filter(F.col("_ti") < F.col("_tj"))
        .select(
            *key_cols,
            (
                (F.col("_vj") - F.col("_vi"))
                / (F.col("_tj") - F.col("_ti"))
            ).alias("_s"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols)
    ranked = slopes.select(
        *key_cols,
        "_s",
        F.row_number().over(w.orderBy("_s")).alias("_rk"),
        F.count("*").over(w).alias("_m"),
    )
    mid = ranked.filter(
        (F.col("_rk") >= F.expr("(_m + 1) div 2"))
        & (F.col("_rk") <= F.expr("_m div 2 + 1"))
    )
    agg = mid.groupBy(*key_cols).agg(
        F.max("_m").cast("long").alias("n_pairs"),
        F.sum("_s").alias("_ss"),
        F.count("*").cast("long").alias("_cnt"),
    )
    return agg.select(
        *key_cols,
        "n_pairs",
        F.expr(SEN_SQL.format(ss="_ss", cnt="_cnt")).alias("sen"),
    )
