"""Point-pattern statistics: Ripley's K, the Knox space-time
interaction test, and colocation participation indices.

The reference's analytic layer answers "where is the mass"
(``DensityProcess.scala``) and this engine's hotspot/moran modules
answer "where is it anomalous"; these operators answer the pattern
questions a point-process analyst asks next:

- ``ripley_k`` — is the pattern clustered or dispersed, and AT WHAT
  SCALE?  (Ripley 1976: K(r) = expected excess neighbors within r,
  normalized by intensity; L(r) = sqrt(K/pi) linearizes it so CSR is
  the diagonal.)
- ``knox_test`` — do events cluster in space AND time TOGETHER
  (contagion), beyond what the marginal space and time clusterings
  imply?  (Knox 1964: observed close-pair count vs the independence
  expectation X*Y/T.)
- ``colocation_pi`` — which event CATEGORIES co-occur spatially?
  (Shekhar & Huang 2001 participation index: the weakest directional
  participation ratio of the category pair.)

Scale design: every statistic reduces to PAIR MINING, and all pair
mining here reuses the ``cluster.eps_pairs`` single-meeting-cell
self-join (grid keys at the radius, left side explodes the 3x3[x3]
neighborhood, right side stays home, each qualifying pair
materializes exactly once) — the quadratic term is bounded by the
densest cell, never corpus², and everything else is bounded
aggregation (bins, category pairs, one stats row).  No Python in any
plan.

Determinism (the GI_STAR_SQL convention): all counts are exact
int64; every derived double is ONE shared SQL string over those
integers (``RIPLEY_K_SQL``/``RIPLEY_L_SQL``/``KNOX_RATIO_SQL``/
``PART_RATIO_SQL``), evaluated verbatim by Spark and the DuckDB
oracle, so values hash-compare exactly.

Edge corrections: ``ripley_k`` is the NAIVE (uncorrected) estimator
— border effects bias K downward near the study-area boundary; the
standard corrections (Ripley isotropic, translation) need per-pair
boundary geometry and are a caller-side refinement.  The distance
metric is the planar oracle mode (flat-earth degrees, the
point_dist2_col convention); pass pre-projected coordinates for
metric work near the poles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.operators.cluster import eps_pairs

__all__ = [
    "ripley_k", "ripley_cross_k", "space_time_k", "knox_test",
    "colocation_pi",
    "RIPLEY_K_SQL", "RIPLEY_XK_SQL", "RIPLEY_L_SQL", "RIPLEY_BIN_SQL",
    "RIPLEY_R_SQL", "STK_K_SQL", "KNOX_EXPECTED_SQL", "KNOX_RATIO_SQL",
    "PAIRS_TOTAL_SQL", "PART_RATIO_SQL", "PART_PI_SQL",
]


# K(r) = A * 2*cum / (n * (n - 1)) — cum = unordered pairs within r
RIPLEY_K_SQL = (
    "{A} * (2.0 * CAST({C} AS DOUBLE))"
    " / (CAST({n} AS DOUBLE) * (CAST({n} AS DOUBLE) - 1.0))"
)
# bivariate K_ab(r) = A * cross_pairs / (n_a * n_b) — each unordered
# A-B pair is exactly one term of the double sum when a != b
RIPLEY_XK_SQL = (
    "{A} * CAST({C} AS DOUBLE)"
    " / (CAST({na} AS DOUBLE) * CAST({nb} AS DOUBLE))"
)
# L(r) = sqrt(K(r) / pi) — the variance-stabilized form; under CSR
# L(r) = r, so L(r) - r reads directly as clustering excess
RIPLEY_L_SQL = "sqrt(({K}) / 3.141592653589793)"
# distance-bin assignment from the exact squared distance: bin b
# covers ((b-1)*dr, b*dr]; dist-0 pairs land in bin 1; the LEAST
# guards the one-ulp case where sqrt(d2) rounds a hair above r_max
RIPLEY_BIN_SQL = (
    "LEAST({nb}, GREATEST(1, CAST(ceil(sqrt({d2}) / {dr}) AS BIGINT)))"
)
RIPLEY_R_SQL = "CAST({bin} AS DOUBLE) * {dr}"

# space-time K (Diggle et al. 1995, naive form): K(s,t) = A * T *
# ordered-pairs(d<=s, dt<=t) / (n(n-1)) — under spatio-temporal CSR
# K(s,t) = pi*s^2 * 2t (for |dt| <= t both directions)
STK_K_SQL = (
    "{A} * {T} * (2.0 * CAST({C} AS DOUBLE))"
    " / (CAST({n} AS DOUBLE) * (CAST({n} AS DOUBLE) - 1.0))"
)
# linear (no sqrt) bin for the time axis: bin b covers
# ((b-1)*dw, b*dw]; dt=0 lands in bin 1
STK_TBIN_SQL = (
    "LEAST({nb}, GREATEST(1, CAST(ceil(({d}) / {dw}) AS BIGINT)))"
)

# n*(n-1) is always even, and the double division is exact below
# 2^53 (n < ~9.4e7 — document, don't silently wrap)
PAIRS_TOTAL_SQL = (
    "CAST(CAST({n} AS DOUBLE) * (CAST({n} AS DOUBLE) - 1.0) / 2.0 AS BIGINT)"
)
# E[O] under space/time independence = X*Y/T with T = n(n-1)/2
KNOX_EXPECTED_SQL = (
    "2.0 * CAST({X} AS DOUBLE) * CAST({Y} AS DOUBLE)"
    " / (CAST({n} AS DOUBLE) * (CAST({n} AS DOUBLE) - 1.0))"
)
KNOX_RATIO_SQL = (
    "CASE WHEN {X} > 0 AND {Y} > 0 THEN"
    " CAST({O} AS DOUBLE) * CAST({n} AS DOUBLE)"
    " * (CAST({n} AS DOUBLE) - 1.0)"
    " / (2.0 * CAST({X} AS DOUBLE) * CAST({Y} AS DOUBLE)) END"
)

PART_RATIO_SQL = "CAST({c} AS DOUBLE) / CAST({n} AS DOUBLE)"
PART_PI_SQL = "LEAST({pa}, {pb})"


def _lit(x: float) -> str:
    """Shortest round-trip double literal — parsed to the identical
    double by Spark and DuckDB."""
    return repr(float(x))


def ripley_k(
    df: DataFrame,
    id_col: str,
    r_max: float,
    n_bins: int,
    area: float,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Ripley's K (and L) at `n_bins` evenly spaced radii up to
    `r_max`, naive estimator over a study area of size `area`
    (squared coordinate units — the caller's region, e.g. the bbox
    area; intensity normalization only, no edge correction).

    One eps_pairs mining pass at r_max (quadratic term bounded by
    the densest r_max-cell), one bounded groupBy onto `n_bins`
    distance bins, one tiny cumulative window over the bin axis, and
    a broadcast count row.  Empty bins materialize with zero counts
    (the full K curve, not just occupied radii).

    Returns (bin, r, n_pairs, cum_pairs, k_est, l_est) — n_pairs =
    unordered pairs in ((bin-1)*dr, bin*dr]; zero pairs → K=0.
    Precondition: n >= 2 points (K divides by n(n-1); below that the
    statistic is undefined and k_est/l_est come back NULL)."""
    if r_max <= 0:
        raise ValueError("r_max must be positive")
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if area <= 0:
        raise ValueError("area must be positive")
    dr = float(r_max) / int(n_bins)
    pairs = eps_pairs(
        df, float(r_max), id_col, lon_col=lon_col, lat_col=lat_col,
        metric="planar",
    )
    stats = F.broadcast(
        df.agg(F.count("*").cast("long").alias("n_points"))
    )
    k_sql = RIPLEY_K_SQL.format(A=_lit(area), C="cum_pairs", n="n_points")
    return _k_curve(df.sparkSession, pairs, int(n_bins), dr, stats, k_sql)


def _k_curve(spark, pairs, n_bins, dr, stats, k_sql):
    """Shared curve assembly: bin mined pair distances, densify the
    bin axis, cumulative-sum (tiny single-partition window over
    n_bins rows), broadcast the count row, derive K and L."""
    binned = (
        pairs.select(
            F.expr(
                RIPLEY_BIN_SQL.format(nb=n_bins, d2="dist2", dr=_lit(dr))
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )
    axis = spark.range(1, n_bins + 1).select(F.col("id").alias("bin"))
    from pyspark.sql import Window

    cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        axis.join(binned, "bin", "left")
        .withColumn("n_pairs", F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long"))
        .withColumn("cum_pairs", F.sum("n_pairs").over(cum).cast("long"))
        .crossJoin(stats)
        .select(
            "bin",
            F.expr(RIPLEY_R_SQL.format(bin="bin", dr=_lit(dr))).alias("r"),
            "n_pairs",
            "cum_pairs",
            F.expr(k_sql).alias("k_est"),
            F.expr(RIPLEY_L_SQL.format(K=k_sql)).alias("l_est"),
        )
    )


def ripley_cross_k(
    df: DataFrame,
    id_col: str,
    cat_col: str,
    cat_a: str,
    cat_b: str,
    r_max: float,
    n_bins: int,
    area: float,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Bivariate (cross-type) Ripley's K: K_ab(r) = A * (A-B pairs
    within r) / (n_a * n_b) — does category `cat_a` cluster AROUND
    category `cat_b` (attraction, L_ab(r) > r) or avoid it
    (repulsion)?  The inferential counterpart of ``colocation_pi``'s
    single-radius participation ratio.

    Mining runs over the two categories' UNION (one eps_pairs pass,
    same bounded single-meeting-cell join), then keeps the cross
    pairs — each unordered A-B pair is exactly one term of the
    double sum.  Same naive-estimator caveat as ``ripley_k``; use
    ``ripley_k`` for the univariate case (the denominator differs:
    n(n-1), self-pairs excluded).  Precondition: both categories
    non-empty (K divides by n_a*n_b; otherwise k_est/l_est are
    NULL).

    Returns (bin, r, n_pairs, cum_pairs, k_est, l_est)."""
    if r_max <= 0:
        raise ValueError("r_max must be positive")
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if area <= 0:
        raise ValueError("area must be positive")
    if cat_a == cat_b:
        raise ValueError("cat_a == cat_b: use ripley_k on that category")
    dr = float(r_max) / int(n_bins)
    pts = df.select(
        F.col(id_col).alias("id"), F.col(cat_col).alias("cat"),
        F.col(lon_col).alias("_plon"), F.col(lat_col).alias("_plat"),
    ).filter(F.col("cat").isin([cat_a, cat_b]))
    pairs = eps_pairs(
        pts, float(r_max), "id", lon_col="_plon", lat_col="_plat",
        metric="planar",
    )
    ca = pts.select(F.col("id").alias("id_a"), F.col("cat").alias("cat_a"))
    cb = pts.select(F.col("id").alias("id_b"), F.col("cat").alias("cat_b"))
    cross = (
        pairs.join(ca, "id_a").join(cb, "id_b")
        .filter(F.col("cat_a") != F.col("cat_b"))
    )
    stats = F.broadcast(
        pts.agg(
            F.sum(F.when(F.col("cat") == cat_a, 1).otherwise(0))
            .cast("long").alias("n_a"),
            F.sum(F.when(F.col("cat") == cat_b, 1).otherwise(0))
            .cast("long").alias("n_b"),
        )
    )
    k_sql = RIPLEY_XK_SQL.format(
        A=_lit(area), C="cum_pairs", na="n_a", nb="n_b"
    )
    return _k_curve(df.sparkSession, cross, int(n_bins), dr, stats, k_sql)


def space_time_k(
    df: DataFrame,
    id_col: str,
    t_col: str,
    r_max: float,
    tau_max: float,
    n_r: int,
    n_t: int,
    area: float,
    t_len: float,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Space-time K function (Diggle et al. 1995, naive estimator):
    the full K(s, t) surface on an n_r × n_t grid of radii up to
    `r_max` and time lags up to `tau_max` — where ``knox_test``
    answers "is there interaction at (delta, tau)?", this shows the
    interaction at every scale pair (its ratio against the product
    of the marginal K's is the interaction surface analysts plot).

    ONE eps_pairs pass in two-eps mode with the pair's |dt| carried
    (`with_dt`), one bounded 2-D bin groupBy, a dense n_r × n_t axis
    grid, and the 2-D cumulative as two tiny windows (prefix over r
    within each t row, then over t within each r column).  `area` /
    `t_len` are the study region's area and time length (intensity
    normalization only — no edge correction, the ripley_k caveat on
    both axes).

    Returns (rb, tb, r, tau, n_pairs, cum_pairs, k_est)."""
    if r_max <= 0 or tau_max <= 0:
        raise ValueError("r_max and tau_max must be positive")
    if n_r < 1 or n_t < 1:
        raise ValueError("n_r and n_t must be >= 1")
    if area <= 0 or t_len <= 0:
        raise ValueError("area and t_len must be positive")
    dr = float(r_max) / int(n_r)
    dtau = float(tau_max) / int(n_t)
    pairs = eps_pairs(
        df, float(r_max), id_col, lon_col=lon_col, lat_col=lat_col,
        metric="planar", t_col=t_col, eps_t=float(tau_max), with_dt=True,
    )
    binned = (
        pairs.select(
            F.expr(
                RIPLEY_BIN_SQL.format(nb=int(n_r), d2="dist2", dr=_lit(dr))
            ).alias("rb"),
            F.expr(
                STK_TBIN_SQL.format(nb=int(n_t), d="dt", dw=_lit(dtau))
            ).alias("tb"),
        )
        .groupBy("rb", "tb")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )
    spark = df.sparkSession
    grid = (
        spark.range(1, int(n_r) + 1).select(F.col("id").alias("rb"))
        .crossJoin(
            spark.range(1, int(n_t) + 1).select(F.col("id").alias("tb"))
        )
    )
    stats = F.broadcast(
        df.agg(F.count("*").cast("long").alias("n_points"))
    )
    from pyspark.sql import Window

    wr = Window.partitionBy("tb").orderBy("rb").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("rb").orderBy("tb").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    k_sql = STK_K_SQL.format(
        A=_lit(area), T=_lit(t_len), C="cum_pairs", n="n_points"
    )
    return (
        grid.join(binned, ["rb", "tb"], "left")
        .withColumn(
            "n_pairs", F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long")
        )
        .withColumn("_cr", F.sum("n_pairs").over(wr))
        .withColumn("cum_pairs", F.sum("_cr").over(wt).cast("long"))
        .crossJoin(stats)
        .select(
            "rb", "tb",
            F.expr(RIPLEY_R_SQL.format(bin="rb", dr=_lit(dr))).alias("r"),
            F.expr(RIPLEY_R_SQL.format(bin="tb", dr=_lit(dtau))).alias("tau"),
            "n_pairs", "cum_pairs",
            F.expr(k_sql).alias("k_est"),
        )
    )


def _time_close_pairs(
    df: DataFrame, id_col: str, t_col: str, tau: float
) -> DataFrame:
    """Unordered-pair COUNT frame (one row) of pairs with
    |t_a - t_b| <= tau — the eps_pairs single-meeting-bucket join on
    the time axis alone (bucket width tau, left explodes ±1, right
    stays home, id_a < id_b)."""
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(t_col).cast("double").alias("t"),
    ).withColumn(
        "tb", F.floor(F.col("t") / F.lit(float(tau))).cast("long")
    )
    left = b.select(
        F.col("id").alias("id_a"),
        F.col("t").alias("t_a"),
        F.explode(
            F.array(*[(F.col("tb") + F.lit(d)).alias("k") for d in (-1, 0, 1)])
        ).alias("k"),
    )
    right = b.select(
        F.col("id").alias("id_b"),
        F.col("t").alias("t_b"),
        F.col("tb").alias("k"),
    )
    return (
        left.join(right, "k")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.col("t_a") - F.col("t_b")) <= F.lit(float(tau)))
        .agg(F.count("*").cast("long").alias("time_pairs"))
    )


def knox_test(
    df: DataFrame,
    id_col: str,
    t_col: str,
    delta: float,
    tau: float,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Knox space-time interaction test: O = pairs close in space
    (planar distance <= `delta`) AND time (|dt| <= `tau`), compared
    with the independence expectation E[O] = X*Y/T (X = space-close
    pairs, Y = time-close pairs, T = all pairs).  ratio >> 1 reads
    as contagion — cases near each other in space are ALSO near in
    time beyond what the two marginals imply.

    Two bounded pair-mining passes — ONE spatial eps_pairs pass with
    the pair's |dt| carried yields X and O together (the dominant
    quadratic stage runs once), and the single-meeting-bucket join on
    the time axis yields Y — each quadratic term bounded by its
    densest cell/bucket.  `tau` in the units of
    `t_col` (epoch seconds for timestamps upstream).  Exact for
    n < ~9.4e7 points (n(n-1) must stay under 2^53; the pair COUNTS
    are exact int64 at any n).

    Returns ONE row (n_points, pairs_total, space_pairs, time_pairs,
    st_pairs, expected_st, knox_ratio); knox_ratio NULL when either
    marginal is empty."""
    if delta <= 0 or tau <= 0:
        raise ValueError("delta and tau must be positive")
    n_row = F.broadcast(df.agg(F.count("*").cast("long").alias("n_points")))
    # ONE spatial mining pass (dt carried) yields both X and O — the
    # dominant quadratic stage is not duplicated
    sp = F.broadcast(
        eps_pairs(
            df, float(delta), id_col, lon_col=lon_col, lat_col=lat_col,
            metric="planar", t_col=t_col, with_dt=True,
        ).agg(
            F.count("*").cast("long").alias("space_pairs"),
            F.coalesce(
                F.sum(
                    F.when(F.col("dt") <= F.lit(float(tau)), 1)
                    .otherwise(0)
                ),
                F.lit(0),
            ).cast("long").alias("st_pairs"),
        )
    )
    time_ = F.broadcast(_time_close_pairs(df, id_col, t_col, float(tau)))
    return (
        n_row.crossJoin(sp).crossJoin(time_)
        .select(
            "n_points",
            F.expr(PAIRS_TOTAL_SQL.format(n="n_points")).alias("pairs_total"),
            "space_pairs",
            "time_pairs",
            "st_pairs",
            F.expr(
                KNOX_EXPECTED_SQL.format(
                    X="space_pairs", Y="time_pairs", n="n_points"
                )
            ).alias("expected_st"),
            F.expr(
                KNOX_RATIO_SQL.format(
                    O="st_pairs", X="space_pairs", Y="time_pairs",
                    n="n_points",
                )
            ).alias("knox_ratio"),
        )
    )


def colocation_pi(
    df: DataFrame,
    id_col: str,
    cat_col: str,
    radius: float,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Colocation participation index per unordered category pair
    (Shekhar & Huang 2001, distance-neighborhood form): PR(a→b) =
    fraction of category-a points with at least one category-b
    neighbor within `radius`; PI{a,b} = min of the two directions —
    the support-style measure colocation miners threshold.

    eps_pairs mining at `radius`, two id-joins to recover
    categories, a directed distinct (participant, own cat, nbr cat),
    and category-bounded aggregation — output is category pairs,
    never points.  Self-pairs (a == b within one category) are
    reported too (PI of a category with itself = fraction of its
    points having a same-category neighbor).

    Category pairs with NO qualifying point pair emit no row (their
    PI is 0; emitting the cross product of all categories would be
    unbounded output for high-cardinality columns).

    Returns (cat_a, cat_b, n_a, n_b, n_a_with_b, n_b_with_a, pr_ab,
    pr_ba, pi) with cat_a <= cat_b."""
    if radius <= 0:
        raise ValueError("radius must be positive")
    pts = df.select(
        F.col(id_col).alias("id"), F.col(cat_col).alias("cat"),
        F.col(lon_col).alias("_plon"), F.col(lat_col).alias("_plat"),
    )
    pairs = eps_pairs(
        pts, float(radius), "id", lon_col="_plon", lat_col="_plat",
        metric="planar",
    )
    ca = pts.select(F.col("id").alias("id_a"), F.col("cat").alias("cat_a"))
    cb = pts.select(F.col("id").alias("id_b"), F.col("cat").alias("cat_b"))
    tagged = pairs.join(ca, "id_a").join(cb, "id_b")
    directed = tagged.select(
        F.col("id_a").alias("pid"),
        F.col("cat_a").alias("own"),
        F.col("cat_b").alias("nbr"),
    ).unionByName(
        tagged.select(
            F.col("id_b").alias("pid"),
            F.col("cat_b").alias("own"),
            F.col("cat_a").alias("nbr"),
        )
    ).distinct()
    part = directed.groupBy("own", "nbr").agg(
        F.count("*").cast("long").alias("n_part")
    )
    sizes = F.broadcast(
        pts.groupBy("cat").agg(F.count("*").cast("long").alias("n_cat"))
    )
    # canonical unordered pair: own <= nbr carries the (a→b) counts,
    # the swapped direction joins in as (b→a)
    fwd = (
        part.filter(F.col("own") <= F.col("nbr"))
        .select(
            F.col("own").alias("cat_a"), F.col("nbr").alias("cat_b"),
            F.col("n_part").alias("n_a_with_b"),
        )
    )
    rev = (
        part.filter(F.col("own") >= F.col("nbr"))
        .select(
            F.col("nbr").alias("cat_a"), F.col("own").alias("cat_b"),
            F.col("n_part").alias("n_b_with_a"),
        )
    )
    pr_ab = PART_RATIO_SQL.format(c="n_a_with_b", n="n_a")
    pr_ba = PART_RATIO_SQL.format(c="n_b_with_a", n="n_b")
    return (
        fwd.join(rev, ["cat_a", "cat_b"], "inner")
        .join(sizes.select(F.col("cat").alias("cat_a"),
                           F.col("n_cat").alias("n_a")), "cat_a")
        .join(sizes.select(F.col("cat").alias("cat_b"),
                           F.col("n_cat").alias("n_b")), "cat_b")
        .select(
            "cat_a", "cat_b", "n_a", "n_b", "n_a_with_b", "n_b_with_a",
            F.expr(pr_ab).alias("pr_ab"),
            F.expr(pr_ba).alias("pr_ba"),
            F.expr(PART_PI_SQL.format(pa=pr_ab, pb=pr_ba)).alias("pi"),
        )
    )


# G(r) = fraction of points whose nearest neighbor is within r —
# one division of canonical int64 counts
NN_G_SQL = "CAST({C} AS DOUBLE) / CAST({n} AS DOUBLE)"


def nn_dist(
    df: DataFrame,
    r_max: float,
    id_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Per-point nearest-neighbor distance, censored at `r_max`:
    one eps_pairs mining pass at r_max (quadratic term bounded by
    the densest r_max-cell, never corpus²), both directions of each
    unordered pair, one partial-aggregated min per point.  Points
    with NO neighbor within r_max are ABSENT from the output (the
    censoring convention G-function analysis expects — they count
    in the denominator, not in any bin).

    Returns (id, nn_d2, nn_dist) — nn_d2 the exact squared degree
    distance, nn_dist its IEEE-exact sqrt."""
    pairs = eps_pairs(
        df, float(r_max), id_col, lon_col=lon_col, lat_col=lat_col,
        metric="planar",
    )
    both = pairs.select(F.col("id_a").alias("id"), "dist2").unionAll(
        pairs.select(F.col("id_b").alias("id"), "dist2")
    )
    return (
        both.groupBy("id")
        .agg(F.min("dist2").alias("nn_d2"))
        .withColumn("nn_dist", F.sqrt(F.col("nn_d2")))
    )


def g_function(
    df: DataFrame,
    r_max: float,
    n_bins: int,
    id_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    _with_n: bool = False,
) -> DataFrame:
    """Nearest-neighbor distance CDF — the G function, the
    first-order complement of Ripley's K (K counts ALL neighbors
    per radius; G asks only about the FIRST).  Under CSR
    G(r) = 1 - exp(-λπr²); clustered patterns rise faster, inhibited
    patterns slower.  Same estimator family as ``ripley_k``: naive
    (border-uncorrected), censored at r_max.

    Shape: nn_dist (one eps_pairs pass + one min) binned once onto
    the r axis, dense axis join, one tiny cumulative window, one
    broadcast count row.  g_est = cum_pts / n (ALL points — the
    censored ones hold the denominator down, exactly as spatstat's
    raw G does).

    Returns (bin, r, n_pts, cum_pts, g_est)."""
    if r_max <= 0:
        raise ValueError("r_max must be positive")
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    dr = float(r_max) / int(n_bins)
    nn = nn_dist(df, r_max, id_col, lon_col=lon_col, lat_col=lat_col)
    binned = (
        nn.select(
            F.expr(
                RIPLEY_BIN_SQL.format(nb=int(n_bins), d2="nn_d2", dr=_lit(dr))
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("n_pts"))
    )
    spark = df.sparkSession
    axis = spark.range(1, int(n_bins) + 1).select(F.col("id").alias("bin"))
    from pyspark.sql import Window

    cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stats = F.broadcast(
        df.agg(F.count("*").cast("long").alias("n_points"))
    )
    out = (
        axis.join(binned, "bin", "left")
        .withColumn(
            "n_pts", F.coalesce(F.col("n_pts"), F.lit(0)).cast("long")
        )
        .withColumn("cum_pts", F.sum("n_pts").over(cum).cast("long"))
        .crossJoin(stats)
        .select(
            "bin",
            F.expr(RIPLEY_R_SQL.format(bin="bin", dr=_lit(dr))).alias("r"),
            "n_pts",
            "cum_pts",
            F.expr(
                NN_G_SQL.format(C="cum_pts", n="n_points")
            ).alias("g_est"),
            "n_points",  # j_function reuses the denominator
        )
    )
    return out if _with_n else out.drop("n_points")


# J(r) = (1 - G(r)) / (1 - F(r)) from the four exact int64 counts —
# every step (int->double casts, two subtractions, three divisions)
# is IEEE-exact, so both engines bit-agree; undefined once F hits 1
J_SQL = (
    "CASE WHEN {cf} < {nf} THEN"
    " ((CAST({ng} AS DOUBLE) - CAST({cg} AS DOUBLE))"
    " / CAST({ng} AS DOUBLE))"
    " / ((CAST({nf} AS DOUBLE) - CAST({cf} AS DOUBLE))"
    " / CAST({nf} AS DOUBLE)) END"
)


def probe_grid(
    spark,
    bbox: tuple[float, float, float, float],
    nx: int,
    ny: int,
) -> DataFrame:
    """Deterministic empty-space probe lattice for ``f_function``:
    nx·ny cell centers over `bbox`, distributed via spark.range (no
    driver data).  Returns (rid, lon, lat)."""
    if nx < 1 or ny < 1:
        raise ValueError("nx and ny must be >= 1")
    xmin, ymin, xmax, ymax = (float(v) for v in bbox)
    if xmax <= xmin or ymax <= ymin:
        raise ValueError("bbox must have positive extent")
    wx = (xmax - xmin) / nx
    wy = (ymax - ymin) / ny
    gy = (F.col("id") / nx).cast("long").cast("double")
    return spark.range(0, nx * ny).select(
        F.col("id").alias("rid"),
        (F.lit(xmin) + (F.col("id") % nx + F.lit(0.5)) * F.lit(wx))
        .alias("lon"),
        (F.lit(ymin) + (gy + F.lit(0.5)) * F.lit(wy)).alias("lat"),
    )


def nn_dist_cross(
    ref: DataFrame,
    pts: DataFrame,
    r_max: float,
    ref_id_col: str,
    id_col: str,
    ref_lon_col: str = "lon",
    ref_lat_col: str = "lat",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Distance from each REF point to its nearest PATTERN point,
    censored at r_max — the empty-space measurement under the F
    function.  One eps_pairs pass over the tagged union (the
    ripley_cross_k trick), cross pairs only, one min per ref point.

    Ids are carried as strings internally (the union must share one
    id type); the output `rid` is the ref id CAST TO STRING.

    Returns (rid, nn_d2, nn_dist); refs with no pattern point
    within r_max are absent (censored)."""
    a = ref.select(
        F.struct(
            F.lit(0).alias("c"),
            F.col(ref_id_col).cast("string").alias("k"),
        ).alias("_id"),
        F.col(ref_lon_col).alias("_lon"),
        F.col(ref_lat_col).alias("_lat"),
    )
    b = pts.select(
        F.struct(
            F.lit(1).alias("c"),
            F.col(id_col).cast("string").alias("k"),
        ).alias("_id"),
        F.col(lon_col).alias("_lon"),
        F.col(lat_col).alias("_lat"),
    )
    pairs = eps_pairs(
        a.unionAll(b), float(r_max), "_id",
        lon_col="_lon", lat_col="_lat", metric="planar",
    )
    # cross pairs: exactly one endpoint is a ref (c=0)
    cross = pairs.filter(F.col("id_a.c") != F.col("id_b.c")).select(
        F.when(F.col("id_a.c") == 0, F.col("id_a.k"))
        .otherwise(F.col("id_b.k")).alias("rid"),
        "dist2",
    )
    return (
        cross.groupBy("rid")
        .agg(F.min("dist2").alias("nn_d2"))
        .withColumn("nn_dist", F.sqrt(F.col("nn_d2")))
    )


def f_function(
    pts: DataFrame,
    ref: DataFrame,
    r_max: float,
    n_bins: int,
    id_col: str,
    ref_id_col: str = "rid",
    lon_col: str = "lon",
    lat_col: str = "lat",
    ref_lon_col: str = "lon",
    ref_lat_col: str = "lat",
    _with_n: bool = False,
) -> DataFrame:
    """Empty-space F function: the CDF of the distance from a probe
    location (``probe_grid`` or any reference frame) to the nearest
    pattern point.  Under CSR F = G; clustering leaves big voids
    (F < G), inhibition fills space evenly (F > G).

    Same pipeline as ``g_function`` with the cross-NN distances;
    f_est = cum_ref / n_ref (ALL probes — censored ones hold the
    denominator).  Returns (bin, r, n_ref, cum_ref, f_est)."""
    if r_max <= 0:
        raise ValueError("r_max must be positive")
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    dr = float(r_max) / int(n_bins)
    nn = nn_dist_cross(
        ref, pts, r_max, ref_id_col, id_col,
        ref_lon_col=ref_lon_col, ref_lat_col=ref_lat_col,
        lon_col=lon_col, lat_col=lat_col,
    )
    binned = (
        nn.select(
            F.expr(
                RIPLEY_BIN_SQL.format(
                    nb=int(n_bins), d2="nn_d2", dr=_lit(dr)
                )
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").cast("long").alias("n_ref"))
    )
    spark = pts.sparkSession
    axis = spark.range(1, int(n_bins) + 1).select(F.col("id").alias("bin"))
    from pyspark.sql import Window

    cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stats = F.broadcast(
        ref.agg(F.count("*").cast("long").alias("n_probes"))
    )
    out = (
        axis.join(binned, "bin", "left")
        .withColumn(
            "n_ref", F.coalesce(F.col("n_ref"), F.lit(0)).cast("long")
        )
        .withColumn("cum_ref", F.sum("n_ref").over(cum).cast("long"))
        .crossJoin(stats)
        .select(
            "bin",
            F.expr(RIPLEY_R_SQL.format(bin="bin", dr=_lit(dr))).alias("r"),
            "n_ref",
            "cum_ref",
            F.expr(
                NN_G_SQL.format(C="cum_ref", n="n_probes")
            ).alias("f_est"),
            "n_probes",  # j_function reuses the denominator
        )
    )
    return out if _with_n else out.drop("n_probes")


def j_function(
    pts: DataFrame,
    ref: DataFrame,
    r_max: float,
    n_bins: int,
    id_col: str,
    ref_id_col: str = "rid",
    lon_col: str = "lon",
    lat_col: str = "lat",
    ref_lon_col: str = "lon",
    ref_lat_col: str = "lat",
) -> DataFrame:
    """The van Lieshout–Baddeley J function: J = (1−G)/(1−F) — the
    scale-free one-number-per-radius summary (CSR J=1, clustered
    J<1, inhibited J>1), assembled from the G and F curves on the
    same radius axis by ONE bin equi-join.  All four inputs to J
    are exact int64 counts; the ratio is the shared J_SQL (every
    step IEEE-exact).  J is NULL once F saturates at 1.

    Returns (bin, r, n_pts, cum_pts, g_est, n_ref, cum_ref, f_est,
    j_est)."""
    # each curve carries its own denominator (one aggregation per
    # side total — no re-count of the pattern or probe frames here)
    g = g_function(
        pts, r_max, n_bins, id_col, lon_col=lon_col, lat_col=lat_col,
        _with_n=True,
    ).withColumnRenamed("r", "_rg")
    f = f_function(
        pts, ref, r_max, n_bins, id_col, ref_id_col=ref_id_col,
        lon_col=lon_col, lat_col=lat_col,
        ref_lon_col=ref_lon_col, ref_lat_col=ref_lat_col,
        _with_n=True,
    )
    return (
        g.join(f, "bin")
        .select(
            "bin", "r", "n_pts", "cum_pts", "g_est",
            "n_ref", "cum_ref", "f_est",
            F.expr(
                J_SQL.format(
                    cg="cum_pts", ng="n_points",
                    cf="cum_ref", nf="n_probes",
                )
            ).alias("j_est"),
        )
    )


# ---------------------------------------------------------------------------
# centrography: mean center, standard distance, deviational ellipse
# ---------------------------------------------------------------------------

# coordinate moments quantize to fp int64 and sum as DECIMAL(38,0)
# (HUGEINT in the oracle) — exact at any corpus size; every derived
# double is one shared string over those integers, evaluated verbatim
# by both engines.  Var/cov use the raw-moment form S2/n - mean²:
# deterministic IEEE composition (the TERRAIN_* convention), with the
# catastrophic-cancellation caveat documented on `centrography`.
CENTRO_MEAN_SQL = "CAST({S} AS DOUBLE) / CAST({n} AS DOUBLE) / {fp}"
CENTRO_VAR_SQL = (
    "CAST({S2} AS DOUBLE) / CAST({n} AS DOUBLE) / ({fp} * {fp})"
    " - ({m}) * ({m})"
)
CENTRO_COV_SQL = (
    "CAST({Sxy} AS DOUBLE) / CAST({n} AS DOUBLE) / ({fp} * {fp})"
    " - ({mx}) * ({my})"
)
CENTRO_SDD_SQL = "sqrt(({vx}) + ({vy}))"


def centrography(
    pts: DataFrame,
    *,
    lon_col: str = "lon",
    lat_col: str = "lat",
    weight_col: str | None = None,
    by: list[str] | None = None,
    fp_scale: int = 10_000_000,
) -> DataFrame:
    """Centrographic summary — mean center, standard distance, and
    the standard deviational ellipse (Yuill 1971, the CrimeStat /
    ESRI "directional distribution" statistic) — per group.

    ONE partial-aggregated groupBy computes the exact integer
    moments (n or Σw, Σx, Σy, Σx², Σy², Σxy on fp-quantized
    coordinates, summed as decimal(38,0) so planetary corpora cannot
    overflow); every derived quantity is arithmetic on that single
    row.  mean/var/cov/std-distance use only IEEE-exact shared
    strings (``CENTRO_*_SQL`` — gate-comparable); the ellipse
    orientation and axes need atan2/sqrt of intermediate products,
    so ``theta_deg``/``sigma_major``/``sigma_minor`` are
    numpy-verified in pytest rather than hash-gated (the terrain
    aspect precedent).

    Variance uses the raw-moment form S2/n - mean² — exact integer
    inputs, but the subtraction cancels catastrophically when the
    pattern's extent is tiny relative to its distance from the
    origin (sub-meter clusters thousands of km from (0,0) lose ~9
    significant digits and stay fine at fp_scale=1e7); pre-shift
    coordinates for finer work.

    Ellipse convention: axes are the RAW standard deviations along
    the principal directions (no ESRI sqrt(2) inflation);
    theta_deg is the major axis' compass bearing in [0, 180).

    Returns (by..., n, mean_x, mean_y, vx, vy, cxy, sd_dist,
    theta_deg, sigma_major, sigma_minor).
    """
    keys = list(by) if by else []
    fp = float(fp_scale)
    xq = F.round(F.col(lon_col) * F.lit(fp)).cast("long")
    yq = F.round(F.col(lat_col) * F.lit(fp)).cast("long")
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    dec = "decimal(38,0)"
    # cast BEFORE multiplying: xq² fits int64 but xq²·w need not —
    # decimal arithmetic keeps every per-row product exact
    xd, yd = xq.cast(dec), yq.cast(dec)
    base = pts.select(
        *keys,
        (w).alias("_w"),
        (xd * w).alias("_sx"),
        (yd * w).alias("_sy"),
        (xd * xq * w).alias("_sxx"),
        (yd * yq * w).alias("_syy"),
        (xd * yq * w).alias("_sxy"),
    )
    mom = base.groupBy(*keys).agg(
        F.sum("_w").alias("n"),
        F.sum("_sx").alias("sx"),
        F.sum("_sy").alias("sy"),
        F.sum("_sxx").alias("sxx"),
        F.sum("_syy").alias("syy"),
        F.sum("_sxy").alias("sxy"),
    )
    fp_r = repr(fp)
    mx = CENTRO_MEAN_SQL.format(S="sx", n="n", fp=fp_r)
    my = CENTRO_MEAN_SQL.format(S="sy", n="n", fp=fp_r)
    vx = CENTRO_VAR_SQL.format(S2="sxx", n="n", fp=fp_r, m=mx)
    vy = CENTRO_VAR_SQL.format(S2="syy", n="n", fp=fp_r, m=my)
    cxy = CENTRO_COV_SQL.format(Sxy="sxy", n="n", fp=fp_r, mx=mx, my=my)
    out = mom.select(
        *keys,
        "n",
        F.expr(mx).alias("mean_x"),
        F.expr(my).alias("mean_y"),
        F.expr(vx).alias("vx"),
        F.expr(vy).alias("vy"),
        F.expr(cxy).alias("cxy"),
        F.expr(CENTRO_SDD_SQL.format(vx=vx, vy=vy)).alias("sd_dist"),
    )
    # principal axes: sigma² = (vx+vy)/2 ± sqrt(((vx-vy)/2)² + cxy²);
    # major-axis bearing from the eigenvector — atan2 is libm, so
    # these columns are pytest-verified, not hash-gated
    half_tr = (F.col("vx") + F.col("vy")) / 2.0
    disc = F.sqrt(
        ((F.col("vx") - F.col("vy")) / 2.0) ** 2 + F.col("cxy") ** 2
    )
    # eigenvector for the larger eigenvalue, expressed as the compass
    # bearing of the major axis (clockwise from north, [0, 180))
    theta = (
        F.degrees(
            F.atan2(
                F.col("cxy"),
                (F.col("vy") - F.col("vx")) / 2.0 + disc,
            )
        )
        + F.lit(360.0)
    ) % 180.0
    return (
        out.withColumn(
            "sigma_major", F.sqrt(F.greatest(half_tr + disc, F.lit(0.0)))
        )
        .withColumn(
            "sigma_minor", F.sqrt(F.greatest(half_tr - disc, F.lit(0.0)))
        )
        .withColumn(
            "theta_deg",
            # axis-aligned degenerates: atan2(0, 0) would misreport
            F.when(
                (F.col("cxy") == 0.0) & (F.col("vy") >= F.col("vx")),
                F.lit(0.0),
            )
            .when(F.col("cxy") == 0.0, F.lit(90.0))
            .otherwise(theta),
        )
    )


# ---------------------------------------------------------------------------
# quadrat analysis (chi-square CSR test)
# ---------------------------------------------------------------------------

# chi² = Σ(c - n/nq)² / (n/nq) = nq·Σc² / n - n over ALL nq window
# cells (empties contribute their expectation only — folded into the
# closed form, no empty-cell rows materialize); VMR = chi² / (nq - 1)
QUADRAT_CHI2_SQL = (
    "CASE WHEN {n} = 0 THEN NULL ELSE"
    " CAST({nq} AS DOUBLE) * CAST({ssq} AS DOUBLE) / CAST({n} AS DOUBLE)"
    " - CAST({n} AS DOUBLE) END"
)
QUADRAT_VMR_SQL = (
    "CASE WHEN {nq} = 1 THEN NULL ELSE"
    " ({chi2}) / (CAST({nq} AS DOUBLE) - 1.0) END"
)


def quadrat_counts(
    pts: DataFrame,
    bbox: tuple[float, float, float, float],
    nx: int,
    ny: int,
    *,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Occupied quadrat counts over an nx x ny grid of the window:
    (cx, cy, c).  Points outside the window are dropped; the right/
    top edges close into the last row/column (the grid_snap
    convention).  Pure filter + one partial-aggregated groupBy."""
    if nx < 1 or ny < 1:
        raise ValueError("nx and ny must be >= 1")
    x0, y0, x1, y1 = (float(v) for v in bbox)
    if not (x1 > x0 and y1 > y0):
        raise ValueError("bbox must have positive extent")
    lon, lat = F.col(lon_col), F.col(lat_col)
    cx = F.least(
        F.lit(nx - 1),
        F.floor((lon - x0) / F.lit(x1 - x0) * nx),
    ).cast("long")
    cy = F.least(
        F.lit(ny - 1),
        F.floor((lat - y0) / F.lit(y1 - y0) * ny),
    ).cast("long")
    return (
        pts.filter(
            (lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1)
        )
        .select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count("*").cast("long").alias("c"))
    )


def quadrat_test(
    pts: DataFrame,
    bbox: tuple[float, float, float, float],
    nx: int,
    ny: int,
    *,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Quadrat chi-square test of complete spatial randomness
    (Fisher's index-of-dispersion form): one row (nq, n, ssq, chi2,
    vmr) where chi² = nq·Σc²/n − n over ALL nq = nx·ny quadrats —
    empty cells never materialize (their contribution is the closed
    form's), so the plan is the occupied groupBy plus one global
    aggregate.  Under CSR chi² ~ χ²(nq−1): VMR ≈ 1, >1 clustered,
    <1 dispersed/inhibited."""
    counts = quadrat_counts(
        pts, bbox, nx, ny, lon_col=lon_col, lat_col=lat_col
    )
    nq = nx * ny
    stats = counts.agg(
        F.lit(nq).cast("long").alias("nq"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n"),
        F.coalesce(F.sum(F.col("c") * F.col("c")), F.lit(0))
        .cast("long")
        .alias("ssq"),
    )
    chi2 = QUADRAT_CHI2_SQL.format(nq="nq", ssq="ssq", n="n")
    return stats.select(
        "nq", "n", "ssq",
        F.expr(chi2).alias("chi2"),
        F.expr(QUADRAT_VMR_SQL.format(chi2=chi2, nq="nq")).alias("vmr"),
    )
