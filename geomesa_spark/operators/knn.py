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
    """Candidate cells in the (2r+1)^2 square around each query.

    Polar-cap path (GeoHashSpiral.scala:96-151 handles pole adjacency
    the same way — neighborhoods near a pole span all longitudes):
    when the query's latitude band |qlat| + r*cell_h reaches 90°, the
    square's longitudinal exit can be arbitrarily short (walking over
    the pole), so the candidate region becomes the FULL band — every
    longitude column, rows from cy-r up to the query's pole. Any
    non-candidate point is then >= r*cell_h of LATITUDE away, which
    keeps the haversine convergence bound positive (`_inner_bound`)."""
    n = 1 << bits
    cell_h = 180.0 / n
    frames = []
    off = np.arange(-radius_cells, radius_cells + 1, dtype=np.int64)
    ox, oy = np.meshgrid(off, off)
    ox = ox.ravel()
    oy = oy.ravel()
    for qid, qlon, qlat in queries:
        cx = int(C.lon_to_x_np(np.asarray([qlon]), bits)[0])
        cy = int(C.lat_to_y_np(np.asarray([qlat]), bits)[0])
        if abs(qlat) + radius_cells * cell_h >= 90.0:
            # full polar band: all columns x rows [cy-r, n) (north)
            # or [0, cy+r] (south)
            if qlat >= 0:
                rows = np.arange(max(cy - radius_cells, 0), n, dtype=np.int64)
            else:
                rows = np.arange(
                    0, min(cy + radius_cells, n - 1) + 1, dtype=np.int64
                )
            gx, gy = np.meshgrid(np.arange(n, dtype=np.int64), rows)
            gx = gx.ravel()
            gy = gy.ravel()
            m = np.ones(len(gx), dtype=bool)
        else:
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
    from geomesa_spark.functions import geometry_sql as GS

    # the ONE shared planar kernel — a private copy must stay
    # bit-identical to point_dist2_col for oracle parity
    return GS.point_dist2_col(
        F.col(lon_col), F.col(lat_col), F.col("qlon"), F.col("qlat")
    )


def _inner_bound_col(inner_deg: float, qlat_col, metric: str):
    """Column form of `_inner_bound` (per-query convergence bound
    evaluated inside the aggregate — no driver-side per-query state)."""
    if metric == "planar":
        return F.lit(inner_deg * inner_deg)
    band = F.abs(qlat_col) + F.lit(inner_deg)
    scale = F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), F.lit(2.0) * F.cos(F.radians(band)))
    )
    return F.when(
        band >= F.lit(90.0), F.lit(inner_deg * METERS_PER_DEG_LAT)
    ).otherwise(F.lit(inner_deg * METERS_PER_DEG_LAT) * scale)


def _inner_bound(inner_deg: float, qlat: float, metric: str) -> float:
    """Largest distance value guaranteed closer than the unexplored
    ring exterior. Planar: inner radius squared. Haversine: a
    conservative meters bound — latitude separation is exact, and
    longitudinal cells shrink by cos(lat), so take the min of both
    directions at the latitude band the ring spans.

    Polar band (|qlat| + inner >= 90): the candidate generators
    expand to EVERY longitude column up to the pole under exactly
    this predicate (`_ring_cells` / the `_polar` branch in
    `knn_join_df`), so the only unexplored exit is in latitude and
    the pure latitude-separation bound inner*M_LAT is exact — a
    polar query therefore converges like any other instead of
    burning all rounds with a 0 bound and falling into the
    corpus-wide cross join (r3 VERDICT #1)."""
    if metric == "planar":
        return inner_deg * inner_deg
    band = abs(qlat) + inner_deg
    if band >= 90.0:
        return inner_deg * METERS_PER_DEG_LAT
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


def knn_join_df(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    bits: int = DEFAULT_KNN_BITS,
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell_col: str = "cell",
    cell_bits: int = C.XY_BITS,
    max_rounds: int = MAX_ROUNDS,
    tiebreak_col: str | None = None,
    metric: str = "planar",
    qid_col: str = "qid",
    qlon_col: str = "qlon",
    qlat_col: str = "qlat",
    debug_plans: list | None = None,
) -> DataFrame:
    """kNN *join*: top-k nearest data points per query row, with the
    query set as a DataFrame of any size.

    `knn_join` mirrors the reference's process semantics (KNNQuery.
    scala:56-81 — a small client-held query set) and keeps the query
    list on the driver; that API cannot express a kNN join against
    millions of query points. This variant is fully distributed:

    - candidate cells come from two JVM `explode(sequence(-r, r))`s
      around each query's grid coordinate (longitude wraps via pmod,
      latitude clamps; wrapped duplicates dropped per query) — no
      per-query driver work, no literal blow-up at large radii;
    - each round is ONE cell-keyed shuffle join over every
      unresolved query (at corpus scale, bucket the point table by
      the parent cell to make this a shuffle-free co-located join);
    - convergence (kth distance <= ring inner bound) is an aggregate
      + left_anti join; the only driver-side value per round is the
      unresolved-query count;
    - per-round state is localCheckpoint'ed so lineage stays O(1).

    Rounds double the square radius; queries whose square would
    cover the whole grid fall through to one exact cross join
    (also the fewer-than-k-points backstop). Queries whose latitude
    band reaches a pole switch to a full-longitude polar band (see
    `_inner_bound`), so a polar-concentrated query set converges in
    rounds like any other instead of cross-joining the corpus.
    Returns (qid, dist2, rank, *points columns).

    `debug_plans`: pass a list to receive ("round"|"fallback",
    executed-plan string) per result branch — the final result is
    localCheckpoint'ed (O(1) lineage), which truncates its plan, so
    tests assert join strategies through this hook.
    """
    if metric not in ("planar", "haversine"):
        raise ValueError(metric)
    n = 1 << bits
    cell_h = 180.0 / n
    tiebreak = [F.col(tiebreak_col).asc()] if tiebreak_col else []

    pts = points.withColumn(
        "_pcell", C.cell_parent(F.col(cell_col), cell_bits, bits)
    ).persist()
    n_pts = pts.count()
    lam = max(n_pts, 1) / float(4 ** bits)
    radius = int(min(max(1, np.ceil(0.5 * np.sqrt(k / max(lam, 1e-9)))), 8))

    unresolved = (
        queries.select(
            F.col(qid_col).alias("qid"),
            F.col(qlon_col).cast("double").alias("qlon"),
            F.col(qlat_col).cast("double").alias("qlat"),
        )
        .withColumn("_qx", C.lon_to_x(F.col("qlon"), bits))
        .withColumn("_qy", C.lat_to_y(F.col("qlat"), bits))
        .localCheckpoint(eager=True)
    )
    results: list[DataFrame] = []
    caches: list[DataFrame] = []
    for _ in range(max_rounds):
        if (2 * radius + 1) ** 2 >= 4 ** bits:
            break  # square covers the grid: exact scan is cheaper
        if unresolved.isEmpty():
            break
        r = radius
        inner = r * cell_h
        # polar band (matches `_inner_bound`'s predicate exactly):
        # the square's longitudinal exit near a pole can be
        # arbitrarily short, so expand to EVERY longitude column up
        # to the query's pole — the only unexplored exit is then in
        # latitude and the convergence bound stays positive. One
        # sequence builder with per-row column bounds (a when() on
        # the BOUNDS, not a chain of array-builder branches).
        polar = (F.abs(F.col("qlat")) + F.lit(inner)) >= F.lit(90.0)
        dx_lo = F.when(polar, F.lit(0)).otherwise(F.lit(-r))
        dx_hi = F.when(polar, F.lit(n - 1)).otherwise(F.lit(r))
        dy_lo = F.when(
            polar & (F.col("qlat") < 0), -F.col("_qy").cast("int")
        ).otherwise(F.lit(-r))
        dy_hi = F.when(
            polar & (F.col("qlat") >= 0), F.lit(n - 1) - F.col("_qy").cast("int")
        ).otherwise(F.lit(r))
        cand = (
            unresolved.withColumn("_dx", F.explode(F.sequence(dx_lo, dx_hi)))
            .withColumn("_dy", F.explode(F.sequence(dy_lo, dy_hi)))
            .withColumn(
                "_gx",
                F.when(polar, F.col("_dx")).otherwise(
                    F.pmod(F.col("_qx") + F.col("_dx"), F.lit(n))
                ),
            )
            .withColumn("_gy", F.col("_qy") + F.col("_dy"))
            .filter((F.col("_gy") >= 0) & (F.col("_gy") < n))
            .withColumn("_qcell", C.z2_combine(F.col("_gx"), F.col("_gy")))
            .dropDuplicates(["qid", "_qcell"])
            .select("qid", "qlon", "qlat", "_qcell")
        )
        joined = pts.join(cand, pts["_pcell"] == cand["_qcell"], "inner")
        d2 = _dist_col(lon_col, lat_col, metric)
        w = Window.partitionBy("qid").orderBy(
            d2.asc(), F.col(lon_col).asc(), F.col(lat_col).asc(), *tiebreak
        )
        topk = (
            joined.withColumn("dist2", d2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .drop("_qcell")
            .persist()
        )
        caches.append(topk)
        stats = topk.groupBy("qid").agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.max("dist2").alias("_kth"),
            F.max("qlat").alias("_qlat"),
        )
        done = stats.filter(
            (F.col("_cnt") >= k)
            & (F.col("_kth") <= _inner_bound_col(inner, F.col("_qlat"), metric))
        ).select("qid")
        round_res = topk.join(done, "qid", "left_semi").drop("qlon", "qlat")
        if debug_plans is not None:
            debug_plans.append(
                ("round", round_res._jdf.queryExecution().executedPlan().toString())
            )
        results.append(round_res)
        unresolved = unresolved.join(done, "qid", "left_anti").localCheckpoint(
            eager=True
        )
        radius *= 2

    if not results or not unresolved.isEmpty():
        # exact fallback for stragglers (and tiny corpora): one cross
        # join of the remaining queries against the point table.
        # Also taken when `results` is empty (e.g. an empty query
        # set broke out of round 0) so the union below always has a
        # correctly-schemed seed instead of raising IndexError.
        joined = pts.crossJoin(unresolved.select("qid", "qlon", "qlat"))
        d2 = _dist_col(lon_col, lat_col, metric)
        w = Window.partitionBy("qid").orderBy(
            d2.asc(), F.col(lon_col).asc(), F.col(lat_col).asc(), *tiebreak
        )
        fb = (
            joined.withColumn("dist2", d2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .drop("qlon", "qlat")
        )
        if debug_plans is not None:
            debug_plans.append(
                ("fallback", fb._jdf.queryExecution().executedPlan().toString())
            )
        results.append(fb)

    out = results[0]
    for rdf in results[1:]:
        out = out.unionByName(rdf, allowMissingColumns=True)
    out = out.drop("_pcell").localCheckpoint(eager=True)
    pts.unpersist()
    for t in caches:
        t.unpersist()
    return out
