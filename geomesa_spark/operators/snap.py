"""Nearest-segment snapping: the map-matching primitive.

Assigning each GPS fix to the nearest road / cable / runway segment
is step one of every map-matching pipeline.  The reference community
does it client-side (GeoTools `DistanceOp` per feature over a full
scan); here it is one distributed cell equi-join:

1. `segments_table` explodes a parsed geometry layer
   (``geom_data.geom_table``'s ``edges`` array — reference WKT
   machinery, `GeometryUtils.scala`) into one row per segment.
2. Each segment scatters to every grid cell overlapping its bbox
   EXPANDED by `max_dist` (x wraps at the antimeridian, y clamps at
   the poles): any point within max_dist of the segment lives in one
   of those cells, so the point side joins on its single home cell —
   no point-side explode, no distinct pass.  Fan-out per segment is
   ((len_x + 2·max_dist)/cell + 1)·((len_y + 2·max_dist)/cell + 1);
   a `cell_budget` raise (not a silent drop) catches layers whose
   segments are huge relative to the grid — pick `bits` so road-ish
   segments touch a handful of cells.
3. Point→segment distance is the exact planar projection form
   (t = clamp(((p−a)·(b−a))/|b−a|², 0, 1), d² to the clamped foot):
   +, −, *, / only — IEEE-exact, so the oracle hash-compares.
4. One partial-aggregatable ``min(struct(d2, seg, …))`` per point
   picks the winner; `d2` ties break on the segment key, so the
   result is deterministic under any partitioning (GeoTools
   DistanceOp ties are scan-order).

Like the geometry-layer dwithin joins, distances are PLANAR degrees
(the far side of the dateline genuinely is ~360° away in this
metric); split IDL-crossing lines first (`split_idl_wkt`) and size
`max_dist` for the latitudes in play.  Returns one row per point
that has a segment within `max_dist`; unmatched points are absent
(left-join the output to keep them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "segments_table", "snap_candidates", "snap_nearest", "map_match",
]


def segments_table(
    geoms: DataFrame, id_col: str = "gid", edges_col: str = "edges"
) -> DataFrame:
    """One row per segment of a parsed geometry layer: (id, seg,
    x0, y0, x1, y1) with `seg` the 0-based ordinal within the
    geometry. Input is `geom_data.geom_table(_native)` output (or
    anything with an array<struct<x0,y0,x1,y1>> edge column)."""
    return geoms.select(
        F.col(id_col),
        F.posexplode(F.col(edges_col)).alias("seg", "_e"),
    ).select(
        id_col, "seg",
        F.col("_e.x0").alias("x0"), F.col("_e.y0").alias("y0"),
        F.col("_e.x1").alias("x1"), F.col("_e.y1").alias("y1"),
    )


def snap_candidates(
    points: DataFrame,
    segments: DataFrame,
    max_dist: float,
    id_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    seg_id_col: str = "gid",
    seg_ord_col: str = "seg",
    bits: int = 6,
    cell_budget: int = 4096,
) -> DataFrame:
    """EVERY segment within `max_dist` planar degrees per point —
    the candidate generator ``snap_nearest`` reduces and
    ``map_match`` runs Viterbi over.  One cell equi-join (segment
    side scattered to its expanded-bbox cells, point side joins its
    single home cell), exact planar projection.

    Returns one row per (point, candidate segment): (<id_col>,
    <seg_id_col>, <seg_ord_col>, dist2, frac, snap_lon, snap_lat)."""
    if max_dist <= 0:
        raise ValueError("max_dist must be positive")
    n = 1 << bits
    cw = 360.0 / n
    ch = 180.0 / n
    md = float(max_dist)

    def x_cell(v):
        return F.floor((v + F.lit(180.0)) / F.lit(cw)).cast("long")

    def y_cell(v):
        return F.floor((v + F.lit(90.0)) / F.lit(ch)).cast("long")

    sxlo = x_cell(F.least("x0", "x1") - F.lit(md))
    sxhi = x_cell(F.greatest("x0", "x1") + F.lit(md))
    sylo = F.greatest(F.lit(0), y_cell(F.least("y0", "y1") - F.lit(md)))
    syhi = F.least(
        F.lit(n - 1), y_cell(F.greatest("y0", "y1") + F.lit(md))
    )
    n_cells = (sxhi - sxlo + 1) * (syhi - sylo + 1)
    guard = F.when(
        n_cells > F.lit(int(cell_budget)),
        F.raise_error(
            F.concat(
                F.lit(
                    f"snap_candidates: a segment covers more than "
                    f"{cell_budget} grid cells at bits={bits} — "
                    f"use coarser bits or split the layer: "
                ),
                n_cells.cast("string"),
            )
        ),
    ).otherwise(F.lit(1))
    seg = segments.select(
        F.col(seg_id_col).alias("_sid"),
        F.col(seg_ord_col).alias("_sord"),
        "x0", "y0", "x1", "y1",
    ).where(guard == 1)
    scattered = (
        seg.select(
            "*",
            F.explode(F.sequence(sxlo, sxhi)).alias("_cx"),
        )
        .select("*", F.explode(F.sequence(sylo, syhi)).alias("cy"))
        .select(
            "_sid", "_sord", "x0", "y0", "x1", "y1", "cy",
            F.pmod(F.col("_cx"), F.lit(n)).alias("cx"),
        )
    )
    pts = points.select(
        F.col(id_col).alias("_pid"),
        F.col(lon_col).alias("_px"),
        F.col(lat_col).alias("_py"),
    ).withColumns(
        {
            "cx": F.least(F.lit(n - 1), F.greatest(F.lit(0),
                                                   x_cell(F.col("_px")))),
            "cy": F.least(F.lit(n - 1), F.greatest(F.lit(0),
                                                   y_cell(F.col("_py")))),
        }
    )
    j = pts.join(scattered, ["cx", "cy"], "inner")
    vx = F.col("x1") - F.col("x0")
    vy = F.col("y1") - F.col("y0")
    l2 = vx * vx + vy * vy
    traw = (F.col("_px") - F.col("x0")) * vx + (F.col("_py") - F.col("y0")) * vy
    t = F.when(
        l2 > 0,
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), traw / l2)),
    ).otherwise(F.lit(0.0))
    qx = F.col("x0") + t * vx
    qy = F.col("y0") + t * vy
    dx = F.col("_px") - qx
    dy = F.col("_py") - qy
    d2 = dx * dx + dy * dy
    return j.select(
        F.col("_pid").alias(id_col),
        F.col("_sid").alias(seg_id_col),
        F.col("_sord").alias(seg_ord_col),
        d2.alias("dist2"),
        t.alias("frac"),
        qx.alias("snap_lon"),
        qy.alias("snap_lat"),
    ).filter(F.col("dist2") <= F.lit(md * md))


def snap_nearest(
    points: DataFrame,
    segments: DataFrame,
    max_dist: float,
    id_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    seg_id_col: str = "gid",
    seg_ord_col: str = "seg",
    bits: int = 6,
    cell_budget: int = 4096,
) -> DataFrame:
    """Nearest segment within `max_dist` planar degrees per point.

    Returns (<id_col>, <seg_id_col>, <seg_ord_col>, dist2, frac,
    snap_lon, snap_lat): squared distance, position along the
    segment in [0,1], and the foot of the perpendicular (the
    map-matched coordinate).  One partial-aggregatable
    ``min(struct(d2, seg, …))`` per point picks the winner; `d2`
    ties break on the segment key, so the result is deterministic
    under any partitioning."""
    cand = snap_candidates(
        points, segments, max_dist, id_col,
        lon_col=lon_col, lat_col=lat_col,
        seg_id_col=seg_id_col, seg_ord_col=seg_ord_col,
        bits=bits, cell_budget=cell_budget,
    )
    best = cand.groupBy(id_col).agg(
        F.min(
            F.struct(
                F.col("dist2").alias("d2"),
                F.col(seg_id_col).alias("sid"),
                F.col(seg_ord_col).alias("sord"),
                F.col("frac").alias("frac"),
                F.col("snap_lon").alias("qx"),
                F.col("snap_lat").alias("qy"),
            )
        ).alias("b")
    )
    return best.select(
        id_col,
        F.col("b.sid").alias(seg_id_col),
        F.col("b.sord").alias(seg_ord_col),
        F.col("b.d2").alias("dist2"),
        F.col("b.frac").alias("frac"),
        F.col("b.qx").alias("snap_lon"),
        F.col("b.qy").alias("snap_lat"),
    )


def map_match(
    points: DataFrame,
    segments: DataFrame,
    max_dist: float,
    track_col: str = "track",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
    seg_id_col: str = "gid",
    seg_ord_col: str = "seg",
    sigma: float | None = None,
    beta: float | None = None,
    switch_cost: float = 0.0,
    max_candidates: int = 8,
    bits: int = 6,
    cell_budget: int = 4096,
) -> DataFrame:
    """HMM map matching (Newson & Krakauer 2009, network-free form):
    pick the segment SEQUENCE that best explains each track, not the
    per-point nearest segment — at intersections and parallel roads
    the nearest segment flips with GPS noise; the path that moves
    consistently does not.

    Model (planar degrees, matching the snap metric):

    - states per point: its `snap_candidates` within `max_dist`,
      kept to the `max_candidates` best by (dist2, sid, sord) — a
      deterministic total order;
    - emission  log p = -dist2 / (2σ²)            (GPS noise);
    - transition log p = -| |q_i q_j| − |p_i p_j| | / β
      − switch_cost·[sid_i ≠ sid_j]  (the snap positions should
      move like the raw fixes move; the classic route-distance form
      needs a graph — this straight-line form is the standard
      network-free surrogate.  The norm term is blind to LATERAL
      sign, so a single outlier fix toward a parallel road looks
      geometrically plausible; `switch_cost` is the explicit
      road-change prior practical matchers add — a flip must buy
      2·switch_cost of emission advantage.  0 = pure
      Newson-Krakauer);
    - Viterbi per track.  Exact score ties resolve to the path
      whose REVERSED index tuple is lexicographically smallest
      (the final fix takes its lowest-indexed optimal state, then
      each step backward its lowest-indexed optimal predecessor —
      argmax-first at every step).  Deterministic under any
      partitioning; candidate index = the (dist2, sid, sord) total
      order above.

    σ defaults to max_dist/4, β to max_dist.  Points with NO
    candidate are absent from the output; the transition then spans
    the gap between the two adjacent MATCHED fixes (their raw
    displacement is what the snap displacement is compared to, so an
    outage does not derail the chain — a documented contract).

    Scale shape: candidate generation is the distributed cell join;
    the DP is the per-track escape hatch (``applyInPandas`` on the
    track key, numpy transition matrices per step — the dtw_join
    contract: inherently sequential per group, never corpus-wide).

    Returns (<track_col>, <ts_col>, <seg_id_col>, <seg_ord_col>,
    dist2, frac, snap_lon, snap_lat)."""
    import pandas as pd

    if sigma is None:
        sigma = max_dist / 4.0
    if beta is None:
        beta = float(max_dist)
    if sigma <= 0 or beta <= 0:
        raise ValueError("sigma and beta must be positive")
    if switch_cost < 0:
        raise ValueError("switch_cost must be >= 0")
    if max_candidates < 1:
        raise ValueError("max_candidates must be >= 1")

    pid = F.struct(
        F.col(track_col).alias("tk"), F.col(ts_col).alias("ts")
    )
    pts = points.select(
        pid.alias("_pid"),
        F.col(lon_col).alias("_px"), F.col(lat_col).alias("_py"),
    )
    cand = snap_candidates(
        pts, segments, max_dist, "_pid",
        lon_col="_px", lat_col="_py",
        seg_id_col=seg_id_col, seg_ord_col=seg_ord_col,
        bits=bits, cell_budget=cell_budget,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_pid").orderBy(
        "dist2", seg_id_col, seg_ord_col
    )
    top = (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= int(max_candidates))
        .drop("_rk")
    )
    # re-attach raw coordinates for the transition term
    top = top.join(
        pts.select("_pid", "_px", "_py"), "_pid"
    ).select(
        F.col("_pid.tk").alias("_tk"), F.col("_pid.ts").alias("_ts"),
        "_px", "_py",
        F.col(seg_id_col).alias("_sid"),
        F.col(seg_ord_col).alias("_sord"),
        "dist2", "frac", "snap_lon", "snap_lat",
    )

    sig2 = 2.0 * float(sigma) * float(sigma)
    bt = float(beta)
    sw = float(switch_cost)

    ts_f: T.StructField = points.schema[ts_col]
    tk_f: T.StructField = points.schema[track_col]
    sid_f = segments.schema[seg_id_col]
    sord_f = segments.schema[seg_ord_col]
    schema = T.StructType([
        T.StructField(track_col, tk_f.dataType),
        T.StructField(ts_col, ts_f.dataType),
        T.StructField(seg_id_col, sid_f.dataType),
        T.StructField(seg_ord_col, sord_f.dataType),
        T.StructField("dist2", T.DoubleType()),
        T.StructField("frac", T.DoubleType()),
        T.StructField("snap_lon", T.DoubleType()),
        T.StructField("snap_lat", T.DoubleType()),
    ])

    def _viterbi(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(
            ["_ts", "dist2", "_sid", "_sord"], kind="mergesort"
        )
        out_rows = []
        tk = pdf["_tk"].iloc[0]
        # one state set per fix, in time order; unmatched fixes are
        # absent upstream, so consecutive steps may span an outage
        chain = [g for _, g in pdf.groupby("_ts", sort=True)]
        prev_score = -chain[0]["dist2"].to_numpy() / sig2
        back: list[np.ndarray] = []
        for s in range(1, len(chain)):
            a, b = chain[s - 1], chain[s]
            qa = a[["snap_lon", "snap_lat"]].to_numpy()
            qb = b[["snap_lon", "snap_lat"]].to_numpy()
            pa = a[["_px", "_py"]].to_numpy()[0]
            pb = b[["_px", "_py"]].to_numpy()[0]
            dpp = float(np.hypot(*(pb - pa)))
            dq = np.hypot(
                qa[:, None, 0] - qb[None, :, 0],
                qa[:, None, 1] - qb[None, :, 1],
            )
            trans = -np.abs(dq - dpp) / bt
            if sw > 0.0:
                sa = a["_sid"].to_numpy()
                sb = b["_sid"].to_numpy()
                trans = trans - sw * (sa[:, None] != sb[None, :])
            tot = prev_score[:, None] + trans
            # ties -> lowest previous candidate index (argmax
            # returns the first maximum)
            bk = tot.argmax(axis=0)
            emis = -b["dist2"].to_numpy() / sig2
            prev_score = tot[bk, np.arange(tot.shape[1])] + emis
            back.append(bk)
        # backtrack
        idx = int(prev_score.argmax())
        picks = [idx]
        for bk in reversed(back):
            idx = int(bk[idx])
            picks.append(idx)
        picks.reverse()
        for s, pick in enumerate(picks):
            r = chain[s].iloc[pick]
            out_rows.append((
                tk, r["_ts"], r["_sid"], r["_sord"],
                r["dist2"], r["frac"],
                r["snap_lon"], r["snap_lat"],
            ))
        return pd.DataFrame(out_rows, columns=[
            track_col, ts_col, seg_id_col, seg_ord_col,
            "dist2", "frac", "snap_lon", "snap_lat",
        ])

    return top.groupBy("_tk").applyInPandas(_viterbi, schema=schema)
