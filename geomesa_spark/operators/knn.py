"""k-nearest-neighbor join: expanding cell-ring search.

Reference algorithm (KNNQuery.scala:56-81, GeoHashSpiral.scala:
41-151): per query point, seed a geohash sized to the estimated
distance, spiral outward over touching geohashes with a priority
queue, keep best-k, shrink the max search distance as k fills.

DataFrame re-expression: rounds of a *broadcast* candidate-cell join.
Round r joins data points whose cell lies in the (2r+1)² square
around each query's cell; per-query top-k via window row_number;
the round stops when every query's kth distance is below the ring's
inner radius (no point outside the square can beat it) — the same
shrink-as-you-fill convergence, but batched over all query points at
once instead of a per-query driver loop (§3.3 notes the reference
iterates queries single-threaded on the client).

Distances are squared-degree euclidean (matching the reference's
degree-space GeoHashSpiral ordering for small distances); callers
needing meters re-rank the final k rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_spark.functions import cells as C

DEFAULT_KNN_BITS = 8
MAX_ROUNDS = 8


def _ring_cells(
    queries: list[tuple[str, float, float]], radius_cells: int, bits: int
) -> pd.DataFrame:
    """Candidate cells in the (2r+1)^2 square around each query."""
    n = 1 << bits
    frames = []
    off = np.arange(-radius_cells, radius_cells + 1, dtype=np.int64)
    ox, oy = np.meshgrid(off, off)
    ox = ox.ravel()
    oy = oy.ravel()
    for qid, qlon, qlat in queries:
        cx = int(C.lon_to_x_np(np.asarray([qlon]), bits)[0])
        cy = int(C.lat_to_y_np(np.asarray([qlat]), bits)[0])
        # longitude wraps at the antimeridian (GeoHashSpiral's
        # touching-geohash neighborhoods wrap the same way);
        # latitude clamps at the poles
        gx = (cx + ox) % n
        gy = cy + oy
        m = (gy >= 0) & (gy < n)
        frame = pd.DataFrame(
            {
                "qid": qid,
                "qcell": C.z2_encode_np(gx[m], gy[m]),
                "qlon": qlon,
                "qlat": qlat,
            }
        )
        # a ring wider than the grid wraps onto itself: dedup so no
        # candidate point is matched (and ranked) twice
        frames.append(frame.drop_duplicates(["qcell"]))
    return pd.concat(frames, ignore_index=True)


METERS_PER_DEG_LAT = 111194.93  # pi * R_mean / 180


def _dist_col(lon_col: str, lat_col: str, metric: str):
    if metric == "haversine":
        from geomesa_spark.functions import geometry_sql as GS

        return GS.haversine_m_col(
            F.col(lon_col), F.col(lat_col), F.col("qlon"), F.col("qlat")
        )
    return (
        (F.col(lon_col) - F.col("qlon")) * (F.col(lon_col) - F.col("qlon"))
        + (F.col(lat_col) - F.col("qlat")) * (F.col(lat_col) - F.col("qlat"))
    )


def _inner_bound(inner_deg: float, qlat: float, metric: str) -> float:
    """Largest distance value guaranteed closer than the unexplored
    ring exterior. Planar: inner radius squared. Haversine: a
    conservative meters bound — latitude separation is exact, and
    longitudinal cells shrink by cos(lat), so take the min of both
    directions at the latitude band the ring spans."""
    if metric == "planar":
        return inner_deg * inner_deg
    band = min(89.9, abs(qlat) + inner_deg)
    scale = min(1.0, 2.0 * np.cos(np.radians(band)))
    return inner_deg * METERS_PER_DEG_LAT * max(scale, 0.0)


def knn_join(
    points: DataFrame,
    queries: list[tuple[str, float, float]],
    k: int,
    bits: int = DEFAULT_KNN_BITS,
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell_col: str = "cell",
    cell_bits: int = C.XY_BITS,
    max_rounds: int = MAX_ROUNDS,
    tiebreak_col: str | None = None,
    metric: str = "planar",
) -> DataFrame:
    """Top-k nearest data points per query point.

    `queries`: [(qid, lon, lat)] (small, broadcast side).
    `metric`: "planar" ranks by squared euclidean degrees (the Z2
    index space, output column `dist2`); "haversine" ranks by
    great-circle meters (geodetic parity with the reference's
    GeoTools distance calc, output column `dist2` holds meters).
    Returns (qid, dist2, rank, *points columns).
    """
    if metric not in ("planar", "haversine"):
        raise ValueError(metric)
    spark = points.sparkSession
    cell_h = 180.0 / (1 << bits)  # smaller of the two cell extents
    # deterministic total order even when distinct ids share a
    # coordinate (ties broken identically by any oracle engine)
    tiebreak = [F.col(tiebreak_col).asc()] if tiebreak_col else []

    pts = points.withColumn(
        "_pcell", C.cell_parent(F.col(cell_col), cell_bits, bits)
    ).persist()
    n_pts = pts.count()  # materializes the cache for every round

    unresolved = list(queries)
    results: list[DataFrame] = []
    round_caches: list[DataFrame] = []
    # density-informed first ring: expect ~k candidates in round one
    # (GeoHashSpiral seeds its geohash size from the estimated
    # distance the same way, GeoHashSpiral.scala:41-51); overshoot is
    # harmless (more candidates), undershoot just adds a round.
    lam = max(n_pts, 1) / float(4 ** bits)
    radius = int(min(max(1, np.ceil(0.5 * np.sqrt(k / max(lam, 1e-9)))), 8))
    for _ in range(max_rounds):
        if not unresolved:
            break
        cand_pdf = _ring_cells(unresolved, radius, bits)
        cand = F.broadcast(spark.createDataFrame(cand_pdf))
        joined = pts.join(cand, pts["_pcell"] == cand["qcell"], "inner")
        d2 = _dist_col(lon_col, lat_col, metric)
        w = Window.partitionBy("qid").orderBy(
            d2.asc(), F.col(lon_col).asc(), F.col(lat_col).asc(), *tiebreak
        )
        topk = (
            joined.withColumn("dist2", d2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .drop("qcell", "qlon", "qlat")
        ).persist()  # stats collect + final union reuse one computation
        round_caches.append(topk)
        # convergence: kth distance must beat the ring's inner radius
        inner = radius * cell_h
        stats = (
            topk.groupBy("qid")
            .agg(F.count(F.lit(1)).alias("cnt"), F.max("dist2").alias("kth"))
            .collect()
        )
        qlat = {q[0]: q[2] for q in unresolved}
        done_ids = {
            r.qid
            for r in stats
            if r.cnt >= k
            and float(r.kth)
            <= _inner_bound(inner, qlat.get(r.qid, 0.0), metric)
        }
        # queries whose square already spans the whole grid are done too
        n = 1 << bits
        if radius >= n:
            done_ids = {q[0] for q in unresolved}
        if done_ids:
            results.append(topk.filter(F.col("qid").isin(list(done_ids))))
        unresolved = [q for q in unresolved if q[0] not in done_ids]
        radius *= 2

    if unresolved:
        # fall back: exact scan for stragglers (bounded, rare)
        rem = F.broadcast(
            spark.createDataFrame(
                pd.DataFrame(unresolved, columns=["qid", "qlon", "qlat"])
            )
        )
        joined = points.crossJoin(rem)
        d2 = _dist_col(lon_col, lat_col, metric)
        w = Window.partitionBy("qid").orderBy(
            d2.asc(), F.col(lon_col).asc(), F.col(lat_col).asc(), *tiebreak
        )
        topk = (
            joined.withColumn("dist2", d2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .drop("qlon", "qlat")
        )
        results.append(topk)

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r, allowMissingColumns=True)
    # materialize (bounded: <= k rows per query), then release every
    # round's cached blocks — a long-lived driver would otherwise
    # leak executor storage memory on every knn_join call
    out = out.drop("_pcell").localCheckpoint(eager=True)
    pts.unpersist()
    for t in round_caches:
        t.unpersist()
    return out
