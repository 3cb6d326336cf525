"""Inverse-distance-weighted (IDW) spatial interpolation onto a grid.

The surface-from-samples step (sensor fields, signal strength,
bathymetry): each grid cell estimates its value as the weighted mean
of nearby samples, weights falling off with distance.  The reference
community runs this client-side over a full scan (GeoTools
gridcoverage interpolators); here it is the engine's bounded-scatter
shape — the `hotspot_cells` neighbor explode with a weight attached.

Scale design: each SAMPLE scatters to its (2·ring+1)² neighbor grid
cells (x wraps at the antimeridian, y clamps-drops at the poles —
the engine's IDL convention), then ONE partial-aggregated groupBy
folds (weight, weight·value) per cell.  Cost is rows × window size,
output bounded by 4^bits; no Python, no cartesian.

Determinism (`fixed=True`, the oracle mode): float sums depend on
partition merge order, so the fixed-point convention applies
(smooth_density_fixed): integer weights w = floor(w_scale · h² /
(h² + d²)) where h is the cell width — the smoothed
inverse-distance-squared kernel, bounded in (0, w_scale], so the
per-cell Σw·v and Σw are pure int64 sums (order-independent) and
`value` is ONE division of two canonical integers — bit-exact on
any engine.  The smoothing length also removes 1/d²'s singularity
at d→0 (no overflow, no eps tuning).  `value_col` must be integral
in this mode (pre-fixed-point, the smooth_density_fixed contract).
Overflow bound: |Σ w·v| ≤ n_cell_samples · w_scale · max|v| must
stay under 2^63 — size w_scale to the corpus (the default leaves
~9·10³ headroom at v ≤ 10⁹).

`fixed=False` is the production mode: true 1/(d²+eps) double
weights, double sums (statistically identical, merge-order floats).

Distances are planar squared degrees with the longitude delta
wrapped (min(|Δ|, 360−|Δ|)) so interpolation is continuous across
the antimeridian, matching the cyclic x key.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.functions import cells as C

__all__ = ["idw_grid", "distance_surface", "areal_interpolate"]


def idw_grid(
    df: DataFrame,
    value_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bits: int = 6,
    ring: int = 2,
    fixed: bool = True,
    w_scale: int = 1_000_000,
    eps: float | None = None,
) -> DataFrame:
    """IDW estimate per grid cell within `ring` cells of any sample.

    Returns (x, y, n_samples, den, num, value): the contributing
    sample count, Σw (int64 for fixed mode), Σw·v, and num/den.
    `value` is defined as CAST(num AS DOUBLE)/CAST(den AS DOUBLE) —
    num can exceed 2^53, so the cast itself rounds; engines
    reproduce this form bit-for-bit, exact-rational division (e.g.
    python int/int) differs in the last ulp."""
    n = 1 << bits
    cw = 360.0 / n
    ch = 180.0 / n
    offsets = [
        (dx, dy)
        for dx in range(-ring, ring + 1)
        for dy in range(-ring, ring + 1)
    ]
    base = df.select(
        F.col(lon_col).alias("_lon"),
        F.col(lat_col).alias("_lat"),
        F.col(value_col).alias("_v"),
        C.lon_to_x(F.col(lon_col), bits).alias("_x"),
        C.lat_to_y(F.col(lat_col), bits).alias("_y"),
    )
    scattered = base.select(
        "_lon", "_lat", "_v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.pmod(F.col("_x") + F.lit(dx), F.lit(n)).alias("tx"),
                        (F.col("_y") + F.lit(dy)).alias("ty"),
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("t"),
    ).select(
        "_lon", "_lat", "_v",
        F.col("t.tx").alias("x"), F.col("t.ty").alias("y"),
    ).filter((F.col("y") >= 0) & (F.col("y") < n))
    # target cell center; wrapped lon delta (antimeridian continuity)
    clon = (F.col("x") + F.lit(0.5)) * F.lit(cw) - F.lit(180.0)
    clat = (F.col("y") + F.lit(0.5)) * F.lit(ch) - F.lit(90.0)
    dl = F.abs(F.col("_lon") - clon)
    dl = F.least(dl, F.lit(360.0) - dl)
    dy_ = F.col("_lat") - clat
    d2 = dl * dl + dy_ * dy_
    if fixed:
        if not dict(df.dtypes)[value_col] in (
            "bigint", "int", "smallint", "tinyint"
        ):
            raise ValueError(
                "fixed=True requires an integral value_col "
                "(pre-scale doubles with floor(v * scale))"
            )
        h2 = F.lit(cw * cw)
        w = F.floor(F.lit(float(w_scale)) * h2 / (h2 + d2)).cast("long")
        pairs = scattered.select(
            "x", "y",
            w.alias("_w"),
            (w * F.col("_v").cast("long")).alias("_wv"),
        )
        agg = pairs.groupBy("x", "y").agg(
            F.count("*").cast("long").alias("n_samples"),
            F.sum("_w").alias("den"),
            F.sum("_wv").alias("num"),
        )
        return agg.withColumn(
            "value",
            F.when(
                F.col("den") > 0,
                F.col("num").cast("double") / F.col("den").cast("double"),
            ),
        )
    e = eps if eps is not None else (cw * 1e-6) ** 2
    w = F.lit(1.0) / (d2 + F.lit(float(e)))
    pairs = scattered.select(
        "x", "y", w.alias("_w"), (w * F.col("_v")).alias("_wv")
    )
    agg = pairs.groupBy("x", "y").agg(
        F.count("*").cast("long").alias("n_samples"),
        F.sum("_w").alias("den"),
        F.sum("_wv").alias("num"),
    )
    return agg.withColumn("value", F.col("num") / F.col("den"))


AREAL_VALUE_SQL = "CAST({S} AS DOUBLE) / CAST({fp} AS DOUBLE)"


def areal_interpolate(
    spark,
    zones: list[tuple[str, str, float]],
    bits: int,
    fp_scale: int = 1_000_000,
    cell_budget: int = 2_000_000,
) -> DataFrame:
    """Areal interpolation: reallocate zone-level magnitudes
    (population per district, emissions per state) onto the Z2 grid
    at `bits` — the polygon→surface mass transfer every choropleth
    downstream pipeline needs.  `zones` is [(zone_id, wkt, value)],
    the broadcast-scale layer convention of ``zonal_stats``.

    Method: each zone's value spreads UNIFORMLY over the grid cells
    whose CENTER falls inside it (the simple areal weighting
    estimator on the center-point approximation — cell/area
    fractions degenerate to center tests at fine `bits`).  Candidate
    cells come from each zone's bbox (driver-side bounds over the
    broadcast layer, `cell_budget` guard), dedup to one distributed
    centers frame, and membership is ONE ``pip_join_broadcast``.

    Determinism: per-zone share = v_fp div n (exact integer
    division — values must be >= 0, where div == floor-div in both
    engines; the dropped remainder is the defined quantization,
    < n/fp_scale per zone).  Per-cell totals are int64 sums —
    merge-order independent, mergeable across ingest partitions.
    A zone whose bbox grid catches NO center (a sliver narrower
    than a cell) falls back to the single cell containing its bbox
    center, so no mass vanishes silently.

    Returns (cell, total_fp, value) with value = total_fp/fp_scale
    (one division, AREAL_VALUE_SQL)."""
    import numpy as np

    from geomesa_spark.functions import cells as C
    from geomesa_spark.functions import geometry as G
    from geomesa_spark.operators.spatial_join import pip_join_broadcast

    if not zones:
        raise ValueError("zones must be non-empty")
    if any(v < 0 for _, _, v in zones):
        raise ValueError("zone values must be >= 0 (mass)")
    ids = [zid for zid, _, _ in zones]
    if len(set(ids)) != len(ids):
        raise ValueError("zone ids must be unique")
    n = 1 << bits
    ranges = []
    fallback = {}
    total_cand = 0
    for zid, wkt, v in zones:
        g = G.parse_wkt(wkt)
        xmin, ymin, xmax, ymax = g.bounds
        ix0 = int(C.lon_to_x_np(np.asarray([xmin]), bits)[0])
        ix1 = int(C.lon_to_x_np(np.asarray([xmax]), bits)[0])
        iy0 = int(C.lat_to_y_np(np.asarray([ymin]), bits)[0])
        iy1 = int(C.lat_to_y_np(np.asarray([ymax]), bits)[0])
        total_cand += (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
        ranges.append((zid, ix0, ix1, iy0, iy1))
        cxm = int(C.lon_to_x_np(np.asarray([(xmin + xmax) / 2.0]), bits)[0])
        cym = int(C.lat_to_y_np(np.asarray([(ymin + ymax) / 2.0]), bits)[0])
        fallback[zid] = int(
            C.z2_encode_np(np.asarray([cxm]), np.asarray([cym]))[0]
        )
    if total_cand > cell_budget:
        raise ValueError(
            f"areal_interpolate: {total_cand} candidate cells exceeds "
            f"cell_budget={cell_budget} — use coarser bits"
        )
    rng_df = spark.createDataFrame(
        ranges, "zid string, ix0 long, ix1 long, iy0 long, iy1 long"
    )
    centers = (
        rng_df.select(
            F.explode(F.sequence("ix0", "ix1")).alias("ix"), "iy0", "iy1"
        )
        .select("ix", F.explode(F.sequence("iy0", "iy1")).alias("iy"))
        .distinct()
        .select(
            C.z2_combine(F.col("ix"), F.col("iy")).alias("cell"),
            ((F.col("ix").cast("double") + F.lit(0.5)) / F.lit(float(n))
             * F.lit(360.0) - F.lit(180.0)).alias("lon"),
            ((F.col("iy").cast("double") + F.lit(0.5)) / F.lit(float(n))
             * F.lit(180.0) - F.lit(90.0)).alias("lat"),
        )
        .withColumn("pcell", C.z2_cell(F.col("lon"), F.col("lat")))
    )
    # bounded by cell_budget rows; pinned because three consumers
    # (counts, shares, the hit_zones collect) would otherwise each
    # re-run the broadcast PIP join
    inside = pip_join_broadcast(
        centers, [(zid, wkt) for zid, wkt, _ in zones],
        cell_col="pcell",
    ).select("cell", F.col("poly_id").alias("zid")).localCheckpoint()
    vals = F.broadcast(spark.createDataFrame(
        [(zid, int(math.floor(v * fp_scale))) for zid, _, v in zones],
        "zid string, v_fp long",
    ))
    counts = inside.groupBy("zid").agg(
        F.count("*").cast("long").alias("n_cells")
    )
    shares = (
        inside.join(F.broadcast(counts), "zid")
        .join(vals, "zid")
        .select("cell", F.expr("v_fp div n_cells").alias("share_fp"))
    )
    hit_zones = {r["zid"] for r in counts.select("zid").collect()}
    missed = [
        (fallback[zid], int(math.floor(v * fp_scale)))
        for zid, _, v in zones
        if zid not in hit_zones
    ]
    if missed:
        shares = shares.unionAll(
            spark.createDataFrame(missed, "cell long, share_fp long")
        )
    return (
        shares.groupBy("cell")
        .agg(F.sum("share_fp").alias("total_fp"))
        .withColumn(
            "value",
            F.expr(AREAL_VALUE_SQL.format(S="total_fp", fp=fp_scale)),
        )
    )


def distance_surface(
    df: DataFrame,
    id_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    bits: int = 6,
    ring: int = 2,
) -> DataFrame:
    """Euclidean distance + allocation surface (the EucDistance /
    EucAllocation map-algebra pair, discrete Voronoi within reach):
    for every grid cell within `ring` cells of ANY target, the
    distance from the cell center to the nearest target and that
    target's id.

    Same bounded-scatter shape as `idw_grid`: each TARGET scatters to
    its (2·ring+1)² neighbor cells (x wraps at the antimeridian, y
    clamps at the poles), then ONE partial-aggregated min(struct)
    per cell — cost is targets × window, output bounded by 4^bits,
    no Python, no cartesian.  Cells farther than `ring` cells from
    every target are ABSENT (the documented reach bound; widen the
    ring or coarsen bits for full coverage).

    Determinism: d² is the planar wrapped-longitude squared-degree
    form (every operation IEEE-exact and identical across engines —
    the idw_grid convention), and the winner is the total
    (d², id) struct minimum, so ties break to the smallest target
    id.  `dist` = one sqrt of the canonical d².

    Returns (x, y, n_candidates, d2, dist, nearest_id).  Requires
    2·ring < 2^bits: on a narrower grid the wrapped dx offsets
    collapse onto the same cell and would double-count
    n_candidates."""
    n = 1 << bits
    if 2 * ring >= n:
        raise ValueError(
            f"distance_surface: 2*ring ({2 * ring}) must be < "
            f"2^bits ({n}) — wrapped offsets would collide"
        )
    cw = 360.0 / n
    ch = 180.0 / n
    offsets = [
        (dx, dy)
        for dx in range(-ring, ring + 1)
        for dy in range(-ring, ring + 1)
    ]
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(lon_col).alias("_lon"),
        F.col(lat_col).alias("_lat"),
        C.lon_to_x(F.col(lon_col), bits).alias("_x"),
        C.lat_to_y(F.col(lat_col), bits).alias("_y"),
    )
    scattered = base.select(
        "_id", "_lon", "_lat",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.pmod(F.col("_x") + F.lit(dx), F.lit(n)).alias("tx"),
                        (F.col("_y") + F.lit(dy)).alias("ty"),
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("t"),
    ).select(
        "_id", "_lon", "_lat",
        F.col("t.tx").alias("x"), F.col("t.ty").alias("y"),
    ).filter((F.col("y") >= 0) & (F.col("y") < n))
    clon = (F.col("x") + F.lit(0.5)) * F.lit(cw) - F.lit(180.0)
    clat = (F.col("y") + F.lit(0.5)) * F.lit(ch) - F.lit(90.0)
    dl = F.abs(F.col("_lon") - clon)
    dl = F.least(dl, F.lit(360.0) - dl)
    dy_ = F.col("_lat") - clat
    d2 = dl * dl + dy_ * dy_
    agg = (
        scattered.select(
            "x", "y",
            F.struct(
                d2.alias("d2"), F.col("_id").alias("nearest_id")
            ).alias("_s"),
        )
        .groupBy("x", "y")
        .agg(
            F.count("*").cast("long").alias("n_candidates"),
            F.min("_s").alias("_w"),
        )
    )
    return agg.select(
        "x", "y", "n_candidates",
        F.col("_w.d2").alias("d2"),
        F.sqrt(F.col("_w.d2")).alias("dist"),
        F.col("_w.nearest_id").alias("nearest_id"),
    )
