"""Trajectory similarity: discrete Hausdorff distance over candidate
track pairs.

`co_travel` finds pairs that move together tick-for-tick; Hausdorff
answers the SHAPE question — how far apart are two tracks' paths as
point sets, regardless of timing (route dedup, corridor conformance,
"same road, different day").  H(A,B) = max(h(A→B), h(B→A)) with
h(A→B) = max_{a∈A} min_{b∈B} d(a,b) — the classic symmetric discrete
Hausdorff.

Scale design: NEVER all track pairs — the caller supplies candidate
pairs (from `co_travel`, `eps_pairs` over track centroids, an OD-cell
match, …) and a bounded point set per track (resampled every k-th
tick, or `simplify_tracks` output).  The per-pair cross term is then
|A|·|B| with both factors caller-bounded, produced by two equi-joins
on the pair key — no cartesian over the corpus.  Both directions run
in ONE plan: the (pair, side, probe-point) min fold, then the pair
max — two partial-aggregated shuffles.

Determinism: planar squared distances folded through min/max only
(exact IEEE — the stop_detect/dwithin gate convention); the final
sqrt is correctly rounded.  Duplicate coordinates collapse inside
min/max (Hausdorff is a set distance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.functions import geometry_sql as GS

__all__ = ["hausdorff_join"]


def hausdorff_join(
    pts: DataFrame,
    pairs: DataFrame,
    track_col: str = "track",
    lon_col: str = "lon",
    lat_col: str = "lat",
    a_col: str = "track_a",
    b_col: str = "track_b",
) -> DataFrame:
    """Symmetric discrete Hausdorff distance per candidate pair.

    pts: one row per (track, point); pairs: (track_a, track_b)
    candidates. Returns (track_a, track_b, hausdorff) in the
    coordinate units (planar degrees for lon/lat)."""
    p = pts.select(
        F.col(track_col).alias("_t"),
        F.col(lon_col).alias("_x"),
        F.col(lat_col).alias("_y"),
    )
    pr = pairs.select(F.col(a_col).alias("ta"), F.col(b_col).alias("tb"))
    # side 0: probe = A's points, target = B; side 1: the reverse.
    # One union keeps both directions in a single min/max pipeline.
    probes = pr.join(
        p.withColumnRenamed("_t", "ta"), "ta"
    ).select(
        "ta", "tb", F.lit(0).alias("side"),
        F.col("_x").alias("px"), F.col("_y").alias("py"),
    ).unionByName(
        pr.join(p.withColumnRenamed("_t", "tb"), "tb").select(
            "ta", "tb", F.lit(1).alias("side"),
            F.col("_x").alias("px"), F.col("_y").alias("py"),
        )
    )
    targets = pr.join(
        p.withColumnRenamed("_t", "tb"), "tb"
    ).select(
        "ta", "tb", F.lit(0).alias("side"),
        F.col("_x").alias("tx"), F.col("_y").alias("ty"),
    ).unionByName(
        pr.join(p.withColumnRenamed("_t", "ta"), "ta").select(
            "ta", "tb", F.lit(1).alias("side"),
            F.col("_x").alias("tx"), F.col("_y").alias("ty"),
        )
    )
    d2 = GS.point_dist2_col(
        F.col("px"), F.col("py"), F.col("tx"), F.col("ty")
    )
    inner = (
        probes.join(targets, ["ta", "tb", "side"])
        .groupBy("ta", "tb", "side", "px", "py")
        .agg(F.min(d2).alias("_min_d2"))
    )
    return (
        inner.groupBy(F.col("ta").alias(a_col), F.col("tb").alias(b_col))
        .agg(F.sqrt(F.max("_min_d2")).alias("hausdorff"))
    )
