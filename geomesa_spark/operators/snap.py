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

__all__ = ["segments_table", "snap_nearest"]


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
    map-matched coordinate)."""
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
                    f"snap_nearest: a segment covers more than "
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
    cand = j.select(
        "_pid",
        F.struct(
            d2.alias("d2"),
            F.col("_sid").alias("sid"),
            F.col("_sord").alias("sord"),
            t.alias("frac"),
            qx.alias("qx"),
            qy.alias("qy"),
        ).alias("_c"),
    ).filter(F.col("_c.d2") <= F.lit(md * md))
    best = cand.groupBy("_pid").agg(F.min("_c").alias("b"))
    return best.select(
        F.col("_pid").alias(id_col),
        F.col("b.sid").alias(seg_id_col),
        F.col("b.sord").alias(seg_ord_col),
        F.col("b.d2").alias("dist2"),
        F.col("b.frac").alias("frac"),
        F.col("b.qx").alias("snap_lon"),
        F.col("b.qy").alias("snap_lat"),
    )
