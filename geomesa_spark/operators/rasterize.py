"""Non-point density rasterization: multipoints, linestrings,
polygons onto the density grid.

Reference: DensityIterator.scala:81-118 — multipoints contribute
each vertex, linestrings are walked cell-by-cell
(GridSnap.generateLineCoordSet), polygons contribute every coverage
cell whose centroid lies inside. Each feature counts a given pixel
at most once (the iterator dedups per feature).

Spark form: a one-off `mapInPandas` derives each geometry's edge
array (WKT parse — derivation, not the aggregation hot path), then
everything is JVM column ops:

- line walk  = explode(edges) -> explode(sequence(0, steps)) ->
  linear interpolation -> grid snap -> distinct(key, i, j)
- polygon    = explode its bbox pixel window -> centroid-in-polygon
  via the even-odd edge aggregate -> (key, i, j)
- final      = groupBy(i, j).sum(weight) — the same partial/final
  hash aggregation as the point density operator.

The per-edge step count samples at half-pixel pitch, a superset of
the reference's DDA walk on convex pixels (both are approximations;
the oracle tests replicate this walk exactly in numpy).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_spark.functions import geometry as G
from geomesa_spark.functions import geometry_sql as GS

EDGES_ROW_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("weight", T.DoubleType()),
        T.StructField("edges", GS.EDGE_SCHEMA),
    ]
)


def parse_geoms(
    df: DataFrame,
    wkt_col: str,
    key_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """(key, kind, weight, edges) per input geometry row — the only
    Python step (WKT parsing), Arrow-batched."""
    has_w = weight_col is not None

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                geom = G.parse_wkt(pdf[wkt_col].iat[i])
                rows.append(
                    (
                        str(pdf[key_col].iat[i]),
                        geom.kind,
                        float(pdf[weight_col].iat[i]) if has_w else 1.0,
                        GS.geom_edges(geom)
                        or [
                            (
                                float(geom.rings[0][0][0]),
                                float(geom.rings[0][0][1]),
                                float(geom.rings[0][0][0]),
                                float(geom.rings[0][0][1]),
                            )
                        ],
                    )
                )
            yield pd.DataFrame(rows, columns=["key", "kind", "weight", "edges"])

    return df.mapInPandas(gen, schema=EDGES_ROW_SCHEMA)


def _grid_ij(lon, lat, bbox, width, height):
    xmin, ymin, xmax, ymax = bbox
    dx = (xmax - xmin) / width
    dy = (ymax - ymin) / height
    i = F.least(
        F.lit(width - 1), F.greatest(F.lit(0), F.floor((lon - F.lit(xmin)) / F.lit(dx)))
    ).cast("int")
    j = F.least(
        F.lit(height - 1), F.greatest(F.lit(0), F.floor((lat - F.lit(ymin)) / F.lit(dy)))
    ).cast("int")
    return i, j


def density_geoms(
    geoms: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
) -> DataFrame:
    """Density grid over parsed geometries (`parse_geoms` output).

    Returns (i, j, weight). Lines/points walk edges; polygons add
    their centroid-covered pixels; each (key, pixel) counts once.
    """
    xmin, ymin, xmax, ymax = bbox
    cw = (xmax - xmin) / width
    ch = (ymax - ymin) / height

    base = geoms.select("key", "kind", "weight", "edges")

    # --- edge walk (points degenerate to single-sample edges) ---
    e = base.select("key", "weight", F.explode("edges").alias("e"))
    steps = F.greatest(
        F.lit(1),
        F.ceil(
            F.greatest(
                F.abs(F.col("e.x1") - F.col("e.x0")) / F.lit(cw * 0.5),
                F.abs(F.col("e.y1") - F.col("e.y0")) / F.lit(ch * 0.5),
            )
        ),
    ).cast("int")
    walked = e.select(
        "key",
        "weight",
        "e",
        F.explode(F.sequence(F.lit(0), steps)).alias("s"),
        steps.alias("n"),
    )
    t = F.col("s").cast("double") / F.col("n").cast("double")
    lon = F.col("e.x0") + t * (F.col("e.x1") - F.col("e.x0"))
    lat = F.col("e.y0") + t * (F.col("e.y1") - F.col("e.y0"))
    i, j = _grid_ij(lon, lat, bbox, width, height)
    line_px = (
        walked.filter(
            lon.between(F.lit(xmin), F.lit(xmax))
            & lat.between(F.lit(ymin), F.lit(ymax))
        )
        .select("key", "weight", i.alias("i"), j.alias("j"))
    )

    # --- polygon interior: pixel-centroid containment ---
    polys = base.filter(F.col("kind").isin("POLYGON", "MULTIPOLYGON"))
    bx0 = F.aggregate(
        F.col("edges"), F.lit(float("inf")), lambda a, ed: F.least(a, ed["x0"])
    )
    bx1 = F.aggregate(
        F.col("edges"), F.lit(float("-inf")), lambda a, ed: F.greatest(a, ed["x0"])
    )
    by0 = F.aggregate(
        F.col("edges"), F.lit(float("inf")), lambda a, ed: F.least(a, ed["y0"])
    )
    by1 = F.aggregate(
        F.col("edges"), F.lit(float("-inf")), lambda a, ed: F.greatest(a, ed["y0"])
    )
    i0, j0 = _grid_ij(bx0, by0, bbox, width, height)
    i1, j1 = _grid_ij(bx1, by1, bbox, width, height)
    grid = (
        polys.select("key", "weight", "edges", i0.alias("i0"), i1.alias("i1"),
                     j0.alias("j0"), j1.alias("j1"))
        .select(
            "key", "weight", "edges",
            F.explode(F.sequence("i0", "i1")).alias("i"), "j0", "j1",
        )
        .select(
            "key", "weight", "edges", "i",
            F.explode(F.sequence("j0", "j1")).alias("j"),
        )
    )
    cx = F.lit(xmin) + (F.col("i") + 0.5) * F.lit(cw)
    cy = F.lit(ymin) + (F.col("j") + 0.5) * F.lit(ch)
    poly_px = grid.filter(GS.contains_col(F.col("edges"), cx, cy)).select(
        "key", "weight", "i", "j"
    )

    # each feature counts a pixel once (DeDup per feature, then sum)
    px = line_px.unionByName(poly_px).dropDuplicates(["key", "i", "j"])
    return px.groupBy("i", "j").agg(F.sum("weight").alias("weight"))
