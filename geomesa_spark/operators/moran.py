"""Moran's I spatial autocorrelation over the engine's integer grid.

`hotspot_cells` (Gi*) scores each cell; Moran's I answers the prior
question — is there ANY spatial structure?  The global statistic
(Moran 1950) is the correlation between a cell's weight and its
neighbors'; the per-cell decomposition (local Moran / LISA, Anselin
1995) classifies each cell as a high-high / low-low cluster core or
a high-low outlier.  Same universe convention as Gi*: OCCUPIED cells
only, binary queen contiguity over the (2·ring+1)² window (self
EXCLUDED — Moran's w_ii = 0, unlike Gi*'s self-included star), x
cyclic at the antimeridian, y clamped at the poles.

Scale design (the hotspot shape): one partial-aggregated groupBy
onto cells, one bounded neighbor-key explode + re-aggregate, then
ONE reduce to six integer corpus moments

    N  = occupied cells            W  = Σ x_i       Q  = Σ x_i²
    S0 = Σ n_i (directed pairs)    B  = Σ x_i·n_i
    C  = Σ S_i                     A  = Σ x_i·S_i

(x_i = cell weight, n_i / S_i = occupied-neighbor count / weight
sum).  Both statistics are algebraic in these integers:

    Σ_i z_i·(Σ_j w_ij z_j) = A − m·B − m·C + m²·S0   (z = x − m,
    m = W/N), Σ z_i² = Q − 2mW + m²N

so every SUM the engines compute is exact int64 (order-independent)
and the doubles are derived through ONE canonical SQL string
evaluated verbatim by Spark and DuckDB (the GI_STAR_SQL convention)
— the statistics hash-compare bit-for-bit.  Overflow bound:
A ≤ N·max(x)²·window, the idw_grid caveat family — at planetary
count scales pre-divide the weight column.

Returns one row per occupied cell: (x, y, w, nbr_n, nbr_sum,
local_i, global_i, s0, n_cells) — global columns constant (one
broadcast row), local_i NULL only when the variance degenerates
(all cells equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.functions import cells as C

__all__ = [
    "morans_i", "gearys_c", "join_counts",
    "MORAN_LOCAL_SQL", "MORAN_GLOBAL_SQL", "GEARY_GLOBAL_SQL",
    "JC_MU_SQL", "JC_VAR_SQL", "JC_Z_SQL",
]

# m = W/N and m2 = (Q - 2mW + m^2 N)/N spelled inline; placeholders
# are int64 column names. Local: I_i = z_i * (S_i - n_i*m) / m2.
_M = "(CAST({W} AS DOUBLE)/{N})"
MORAN_LOCAL_SQL = (
    "CASE WHEN (CAST({Q} AS DOUBLE) - 2*" + _M + "*{W} + " + _M + "*" + _M
    + "*{N}) > 0 THEN"
    " (CAST({x} AS DOUBLE) - " + _M + ")"
    " * (CAST({S} AS DOUBLE) - CAST({n} AS DOUBLE)*" + _M + ")"
    " / ((CAST({Q} AS DOUBLE) - 2*" + _M + "*{W} + " + _M + "*" + _M
    + "*{N}) / {N})"
    " END"
)
# Global: (N/S0) * (A - m*B - m*C + m^2*S0) / (Q - 2mW + m^2 N)
MORAN_GLOBAL_SQL = (
    "CASE WHEN {S0} > 0 AND (CAST({Q} AS DOUBLE) - 2*" + _M + "*{W} + "
    + _M + "*" + _M + "*{N}) > 0 THEN"
    " (CAST({N} AS DOUBLE) / {S0})"
    " * (CAST({A} AS DOUBLE) - " + _M + "*{B} - " + _M + "*{C} + "
    + _M + "*" + _M + "*{S0})"
    " / (CAST({Q} AS DOUBLE) - 2*" + _M + "*{W} + " + _M + "*" + _M
    + "*{N})"
    " END"
)


# Geary's C (Geary 1954): C = ((N-1)/(2·S0)) · Σ w_ij (x_i - x_j)²
# / Σ (x_i - x̄)².  The pair term needs only ONE extra integer
# moment: Σ_ij w_ij (x_i - x_j)² = 2·(G1 - A) with G1 = Σ x_i²·n_i
# (adjacency is symmetric, so Σ_i Σ_j∈N(i) x_j² = G1 too).  Under no
# structure C ≈ 1; clustering pulls it below 1, dispersion above —
# the local-difference complement of Moran's covariance form.
GEARY_GLOBAL_SQL = (
    "CASE WHEN {S0} > 0 AND (CAST({Q} AS DOUBLE) - 2*" + _M + "*{W} + "
    + _M + "*" + _M + "*{N}) > 0 THEN"
    " (CAST({N} AS DOUBLE) - 1.0)"
    " * (CAST({G1} AS DOUBLE) - CAST({A} AS DOUBLE))"
    " / (CAST({S0} AS DOUBLE)"
    " * (CAST({Q} AS DOUBLE) - 2*" + _M + "*{W} + " + _M + "*" + _M
    + "*{N}))"
    " END"
)


def geary_global_expr(G1="sum_g1", A="sum_a", S0="s0", N="n_cells",
                      W="sum_w", Q="sum_q") -> str:
    return GEARY_GLOBAL_SQL.format(G1=G1, A=A, S0=S0, N=N, W=W, Q=Q)


def moran_local_expr(x="w", S="nbr_sum", n="nbr_n", N="n_cells",
                     W="sum_w", Q="sum_q") -> str:
    return MORAN_LOCAL_SQL.format(x=x, S=S, n=n, N=N, W=W, Q=Q)


def moran_global_expr(A="sum_a", B="sum_b", C="sum_c", S0="s0",
                      N="n_cells", W="sum_w", Q="sum_q") -> str:
    return MORAN_GLOBAL_SQL.format(A=A, B=B, C=C, S0=S0, N=N, W=W, Q=Q)


def _neighbor_frame(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    bits: int,
    ring: int,
    weight_col: str | None,
) -> DataFrame:
    """Occupied cells with queen-contiguity neighbor aggregates
    (self excluded): (x, y, w, nbr_n, nbr_sum) — shared by
    morans_i and gearys_c."""
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
    offsets = [
        (dx, dy)
        for dx in range(-ring, ring + 1)
        for dy in range(-ring, ring + 1)
        if not (dx == 0 and dy == 0)  # w_ii = 0
    ]
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
    # isolated occupied cells keep n_i = S_i = 0 (left join): they
    # contribute to N/W/Q but not to the pair terms
    return cells.join(nbr, ["x", "y"], "left").select(
        "x", "y", "w",
        F.coalesce(F.col("nbr_n"), F.lit(0).cast("long")).alias("nbr_n"),
        F.coalesce(F.col("nbr_sum"), F.lit(0).cast("long")).alias("nbr_sum"),
    )


def morans_i(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bits: int = 6,
    ring: int = 1,
    weight_col: str | None = None,
) -> DataFrame:
    """Global + local Moran's I per occupied grid cell (see module
    docstring for the exact statistic and determinism contract)."""
    joined = _neighbor_frame(df, lon_col, lat_col, bits, ring, weight_col)
    stats = F.broadcast(
        joined.agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum("w").alias("sum_w"),
            F.sum(F.col("w") * F.col("w")).alias("sum_q"),
            F.sum("nbr_n").alias("s0"),
            F.sum(F.col("w") * F.col("nbr_n")).alias("sum_b"),
            F.sum("nbr_sum").alias("sum_c"),
            F.sum(F.col("w") * F.col("nbr_sum")).alias("sum_a"),
        )
    )
    return (
        joined.crossJoin(stats)
        .withColumn("local_i", F.expr(moran_local_expr()))
        .withColumn("global_i", F.expr(moran_global_expr()))
        .select(
            "x", "y", "w", "nbr_n", "nbr_sum",
            "local_i", "global_i", "s0", "n_cells",
        )
    )


def gearys_c(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bits: int = 6,
    ring: int = 1,
    weight_col: str | None = None,
) -> DataFrame:
    """Global Geary's C over the occupied-cell lattice — the
    local-difference complement of Moran's I (Moran correlates a
    cell with its neighborhood; Geary sums squared NEIGHBOR
    DIFFERENCES, so it is more sensitive to local scale).  Same
    universe, contiguity, and determinism contract as ``morans_i``;
    the pair term costs one extra integer moment (module docstring
    comment on ``GEARY_GLOBAL_SQL``).

    Returns ONE row (n_cells, s0, sum_w, sum_q, sum_a, sum_g1,
    geary_c) — geary_c NULL when the variance or edge set
    degenerates; ≈1 under no structure, <1 clustered, >1
    dispersed."""
    joined = _neighbor_frame(df, lon_col, lat_col, bits, ring, weight_col)
    return (
        joined.agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum("nbr_n").alias("s0"),
            F.sum("w").alias("sum_w"),
            F.sum(F.col("w") * F.col("w")).alias("sum_q"),
            F.sum(F.col("w") * F.col("nbr_sum")).alias("sum_a"),
            F.sum(F.col("w") * F.col("w") * F.col("nbr_n")).alias("sum_g1"),
        )
        .withColumn("geary_c", F.expr(geary_global_expr()))
    )


# Join-count statistics (Cliff & Ord 1981): for label L on the
# occupied-cell lattice, J_LL = same-label rook/queen joins; under
# nonfree (permutation) sampling with E edges, K2 = sum of squared
# cell degrees, n cells and nb labeled-L cells:
#   eta_k = nb(nb-1)...(nb-k+1) / (n(n-1)...(n-k+1))
#   E[J]  = E * eta2
#   Var   = E*eta2 + (K2 - 2E)*eta3
#           + (E^2 + E - K2)*eta4 - (E*eta2)^2
# (E[J^2] partitions ordered edge pairs: equal (E, two shared
# cells), sharing one endpoint (sum k_i(k_i-1) = K2 - 2E, three
# cells), disjoint (the rest, four cells); the pytest validates mean
# AND variance against a Monte-Carlo permutation null).  All inputs
# exact int64; mu/var/z are ONE shared string each.
_JC_N = "CAST({n} AS DOUBLE)"
_JC_B = "CAST({nb} AS DOUBLE)"
_JC_ETA2 = (
    "(" + _JC_B + "*(" + _JC_B + "-1.0))"
    "/(" + _JC_N + "*(" + _JC_N + "-1.0))"
)
_JC_ETA3 = (
    "(" + _JC_B + "*(" + _JC_B + "-1.0)*(" + _JC_B + "-2.0))"
    "/(" + _JC_N + "*(" + _JC_N + "-1.0)*(" + _JC_N + "-2.0))"
)
_JC_ETA4 = (
    "(" + _JC_B + "*(" + _JC_B + "-1.0)*(" + _JC_B + "-2.0)"
    "*(" + _JC_B + "-3.0))"
    "/(" + _JC_N + "*(" + _JC_N + "-1.0)*(" + _JC_N + "-2.0)"
    "*(" + _JC_N + "-3.0))"
)
JC_MU_SQL = "CAST({E} AS DOUBLE) * " + _JC_ETA2
JC_VAR_SQL = (
    "CAST({E} AS DOUBLE) * " + _JC_ETA2
    + " + (CAST({K2} AS DOUBLE) - 2.0*CAST({E} AS DOUBLE)) * " + _JC_ETA3
    + " + (CAST({E} AS DOUBLE)*CAST({E} AS DOUBLE)"
    " + CAST({E} AS DOUBLE) - CAST({K2} AS DOUBLE)) * " + _JC_ETA4
    + " - (CAST({E} AS DOUBLE) * " + _JC_ETA2 + ")"
    " * (CAST({E} AS DOUBLE) * " + _JC_ETA2 + ")"
)
JC_Z_SQL = (
    "CASE WHEN {n} > 3 AND ({VAR}) > 0 THEN"
    " (CAST({J} AS DOUBLE) - ({MU})) / sqrt({VAR}) END"
)


def jc_exprs(J="j_same", E="n_edges", K2="sum_k2", n="n_cells",
             nb="n_label") -> tuple[str, str, str]:
    """(mu, var, z) shared strings over the named int64 columns."""
    mu = JC_MU_SQL.format(E=E, n=n, nb=nb)
    var = JC_VAR_SQL.format(E=E, K2=K2, n=n, nb=nb)
    z = JC_Z_SQL.format(J=J, MU=mu, VAR=var, n=n)
    return mu, var, z


def join_counts(
    df: DataFrame,
    cat_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bits: int = 6,
    ring: int = 1,
) -> DataFrame:
    """Join-count statistics per label — spatial autocorrelation for
    CATEGORICAL marks (Moran/Geary need a numeric weight): does land
    use / event type / language form spatial blocks?  Each occupied
    cell takes its majority label (ties to the greater label string
    — deterministic), edges are queen contiguity within `ring`, and
    every label L gets its same-label join count J_LL with the
    classical one-vs-rest z-score under the permutation null.

    Bounded everywhere: cells groupBy, one HALF-window explode (each
    undirected edge materializes exactly once — requires the lattice
    wider than the window, 2^bits > 2*ring), label-bounded output.
    Counts exact int64; mu/var/z via the shared JC_* strings
    (pytest-validated against a Monte-Carlo permutation null).

    Returns (label, n_label, j_same, n_cells, n_edges, sum_k2,
    expected_j, var_j, z) — z NULL when the variance degenerates or
    n <= 3."""
    n = 1 << bits
    if n <= 2 * ring:
        raise ValueError("lattice must be wider than the window")
    per = (
        df.select(
            C.lon_to_x(F.col(lon_col), bits).alias("x"),
            C.lat_to_y(F.col(lat_col), bits).alias("y"),
            F.col(cat_col).alias("cat"),
        )
        .groupBy("x", "y", "cat")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    mx = per.groupBy("x", "y").agg(F.max("cnt").alias("_mc"))
    labeled = (
        per.join(mx, ["x", "y"])
        .filter(F.col("cnt") == F.col("_mc"))
        .groupBy("x", "y")
        .agg(F.max("cat").alias("label"))
    )
    half = [
        (dx, dy)
        for dx in range(-ring, ring + 1)
        for dy in range(-ring, ring + 1)
        if dx > 0 or (dx == 0 and dy > 0)
    ]
    # HALF-window explode from each labeled cell, keeping the origin:
    # an undirected edge materializes exactly once (the reverse
    # displacement is never in the half set, and 2^bits > 2*ring
    # keeps the pmod wrap from aliasing a second meeting)
    ed = (
        labeled.select(
            F.col("x").alias("ox"), F.col("y").alias("oy"),
            F.col("label").alias("label_a"),
            F.explode(
                F.array(*[
                    F.struct(
                        F.pmod(F.col("x") + F.lit(dx), F.lit(n)).alias("x"),
                        (F.col("y") + F.lit(dy)).alias("y"),
                    )
                    for dx, dy in half
                ])
            ).alias("t"),
        )
        .select(
            "ox", "oy", "label_a",
            F.col("t.x").alias("x"), F.col("t.y").alias("y"),
        )
        .filter((F.col("y") >= 0) & (F.col("y") < n))
        .join(
            labeled.select("x", "y", F.col("label").alias("label_b")),
            ["x", "y"],
        )
    )
    # degrees: each edge counts at BOTH endpoints
    ends = ed.select(
        F.col("x").alias("kx"), F.col("y").alias("ky")
    ).unionAll(
        ed.select(F.col("ox").alias("kx"), F.col("oy").alias("ky"))
    )
    degs = ends.groupBy("kx", "ky").agg(
        F.count("*").cast("long").alias("k")
    )
    glob = F.broadcast(
        labeled.agg(F.count("*").cast("long").alias("n_cells"))
        .crossJoin(ed.agg(F.count("*").cast("long").alias("n_edges")))
        .crossJoin(
            degs.agg(
                F.coalesce(F.sum(F.col("k") * F.col("k")), F.lit(0))
                .cast("long").alias("sum_k2")
            )
        )
    )
    sizes = labeled.groupBy("label").agg(
        F.count("*").cast("long").alias("n_label")
    )
    same = (
        ed.filter(F.col("label_a") == F.col("label_b"))
        .groupBy(F.col("label_a").alias("label"))
        .agg(F.count("*").cast("long").alias("j_same"))
    )
    mu, var, z = jc_exprs()
    return (
        sizes.join(same, "label", "left")
        .withColumn(
            "j_same", F.coalesce(F.col("j_same"), F.lit(0)).cast("long")
        )
        .crossJoin(glob)
        .select(
            "label", "n_label", "j_same", "n_cells", "n_edges", "sum_k2",
            F.expr(mu).alias("expected_j"),
            F.expr(var).alias("var_j"),
            F.expr(z).alias("z"),
        )
    )
