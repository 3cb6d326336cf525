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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.functions import cells as C

__all__ = ["idw_grid"]


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
