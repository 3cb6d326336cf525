"""SQL-callable spatial functions + the SQL entry point.

The reference exposes a SQL surface through GeoMesaSparkSql
(geomesa-compute/src/main/scala/org/locationtech/geomesa/compute/spark/sql/GeoMesaSparkSql.scala):
CQL spatial predicates are pulled out of the WHERE clause, pushed to
the store, and the residual SQL runs on Spark (:144-159, :311). This
engine collapses that: the spatial predicates ARE Spark SQL
functions, registered as **SQL scalar UDFs** (CREATE TEMPORARY
FUNCTION ... RETURN <expr>, Spark 4) — pure Catalyst expressions, so
they inline into whole-stage codegen, push down where possible, and
involve zero Python.

`register_sql_functions(spark)` installs:

  st_within_bbox(lon, lat, xmin, ymin, xmax, ymax) -> boolean
  st_dwithin_point(lon, lat, x, y, dist_deg)       -> boolean
  st_contains_edges(edges, lon, lat)               -> boolean
      even-odd ray cast over array<struct<x0,y0,x1,y1>>
  st_z2(lon, lat)                                  -> bigint
  st_week(ts)                                      -> int
  st_intersects_edges(a, b, a_poly, b_poly)        -> boolean
      geometry-vs-geometry intersects over two edge arrays
      (vertex-in both directions + proper crossings)
  st_dwithin_edges(a, b, d, a_poly, b_poly)        -> boolean
      distance(A, B) <= d degrees (crossing = 0, else endpoint-
      decomposed segment distance; containment counts)

`edges_sql(wkt)` renders a polygon's edge array as a SQL literal for
use with st_contains_edges in raw SQL strings.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from geomesa_spark.functions import cells as C
from geomesa_spark.functions import geometry as G
from geomesa_spark.functions import geometry_sql as GS


def _spread2_sql(var: str) -> str:
    """Z2 bit-spread as a single nested SQL expression (matches
    cells._SPREAD2; the JVM wraps shifts so no pre-mask needed)."""
    e = f"(CAST({var} AS BIGINT) & {0x7FFFFFFF})"
    for shift, mask in C._SPREAD2:
        e = f"(({e} | ({e} << {shift})) & {mask})"
    return e


def z2_sql(lon: str, lat: str, bits: int = C.XY_BITS) -> str:
    n = 1 << bits
    x = f"least({n - 1}, greatest(0, floor(({lon}+180.0)/360.0*{float(n)})))"
    y = f"least({n - 1}, greatest(0, floor(({lat}+90.0)/180.0*{float(n)})))"
    return f"({_spread2_sql(x)} | ({_spread2_sql(y)} << 1))"


def edges_sql(wkt: str) -> str:
    """SQL literal array<struct<x0,y0,x1,y1>> for a geometry's edges."""
    parts = [
        f"named_struct('x0', {x0!r}D, 'y0', {y0!r}D, 'x1', {x1!r}D, 'y1', {y1!r}D)"
        for x0, y0, x1, y1 in GS.geom_edges(G.parse_wkt(wkt))
    ]
    return "array(" + ", ".join(parts) + ")"


def register_sql_functions(spark: SparkSession) -> None:
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION st_within_bbox(
             lon DOUBLE, lat DOUBLE, xmin DOUBLE, ymin DOUBLE,
             xmax DOUBLE, ymax DOUBLE) RETURNS BOOLEAN
           RETURN lon BETWEEN xmin AND xmax AND lat BETWEEN ymin AND ymax"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION st_dwithin_point(
             lon DOUBLE, lat DOUBLE, x DOUBLE, y DOUBLE, d DOUBLE)
           RETURNS BOOLEAN
           RETURN (lon-x)*(lon-x) + (lat-y)*(lat-y) <= d*d"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION st_contains_edges(
             edges ARRAY<STRUCT<x0: DOUBLE, y0: DOUBLE,
                                x1: DOUBLE, y1: DOUBLE>>,
             lon DOUBLE, lat DOUBLE) RETURNS BOOLEAN
           RETURN aggregate(
             edges, 0,
             (acc, e) -> acc + CASE WHEN ((e.y0 > lat) != (e.y1 > lat))
                 AND lon < e.x0 + (lat - e.y0) * (e.x1 - e.x0)
                                  / (e.y1 - e.y0)
               THEN 1 ELSE 0 END) % 2 = 1"""
    )
    spark.sql(
        f"""CREATE OR REPLACE TEMPORARY FUNCTION st_z2(
              lon DOUBLE, lat DOUBLE) RETURNS BIGINT
            RETURN {z2_sql("lon", "lat")}"""
    )
    spark.sql(
        f"""CREATE OR REPLACE TEMPORARY FUNCTION st_week(ts TIMESTAMP)
            RETURNS INT
            RETURN CAST(floor(unix_timestamp(ts) / {C.SECONDS_IN_WEEK}) AS INT)"""
    )
    _register_geom_geom(spark)


_EDGE_T = "ARRAY<STRUCT<x0: DOUBLE, y0: DOUBLE, x1: DOUBLE, y1: DOUBLE>>"


def _cross_sql(s: str, px: str, py: str) -> str:
    """Orientation of point (px,py) vs edge-struct variable `s`."""
    return (f"(({s}.x1-{s}.x0)*({py}-{s}.y0)"
            f" - ({s}.y1-{s}.y0)*({px}-{s}.x0))")


def _ptseg_d2_sql(px: str, py: str, s: str) -> str:
    """Clamped-projection squared point-to-segment distance."""
    dx, dy = f"({s}.x1-{s}.x0)", f"({s}.y1-{s}.y0)"
    ln2 = f"(CASE WHEN {dx}*{dx}+{dy}*{dy} = 0.0 THEN 1.0 ELSE {dx}*{dx}+{dy}*{dy} END)"
    t = (f"least(1.0, greatest(0.0, (({px}-{s}.x0)*{dx}"
         f" + ({py}-{s}.y0)*{dy}) / {ln2}))")
    cx, cy = f"({s}.x0 + {t}*{dx})", f"({s}.y0 + {t}*{dy})"
    return f"(({px}-{cx})*({px}-{cx}) + ({py}-{cy})*({py}-{cy}))"


def _contains_sql(edges: str, px: str, py: str) -> str:
    """Even-odd containment inlined as SQL (a SQL UDF cannot invoke
    another SQL UDF from inside a lambda body — the analyzer loses
    the outer lambda variable during function inlining)."""
    return (
        f"(aggregate({edges}, 0, (acc, ce) -> acc + CASE WHEN"
        f" ((ce.y0 > {py}) != (ce.y1 > {py}))"
        f" AND {px} < ce.x0 + ({py} - ce.y0)*(ce.x1-ce.x0)/(ce.y1-ce.y0)"
        f" THEN 1 ELSE 0 END) % 2 = 1)"
    )


def _register_geom_geom(spark: SparkSession) -> None:
    cross_pair = (
        f"((({_cross_sql('ae', 'be.x0', 'be.y0')} > 0)"
        f" != ({_cross_sql('ae', 'be.x1', 'be.y1')} > 0))"
        f" AND (({_cross_sql('be', 'ae.x0', 'ae.y0')} > 0)"
        f" != ({_cross_sql('be', 'ae.x1', 'ae.y1')} > 0)))"
    )
    spark.sql(
        f"""CREATE OR REPLACE TEMPORARY FUNCTION st_intersects_edges(
              a {_EDGE_T}, b {_EDGE_T}, a_poly BOOLEAN, b_poly BOOLEAN)
            RETURNS BOOLEAN
            RETURN (b_poly AND (
                      EXISTS(a, e -> {_contains_sql('b', 'e.x0', 'e.y0')})
                   OR EXISTS(a, e -> {_contains_sql('b', 'e.x1', 'e.y1')})))
               OR (a_poly AND (
                      EXISTS(b, e -> {_contains_sql('a', 'e.x0', 'e.y0')})
                   OR EXISTS(b, e -> {_contains_sql('a', 'e.x1', 'e.y1')})))
               OR EXISTS(a, ae -> EXISTS(b, be -> {cross_pair}))"""
    )
    seg_d2 = (
        f"(CASE WHEN {cross_pair} THEN 0.0 ELSE least("
        f"{_ptseg_d2_sql('ae.x0', 'ae.y0', 'be')}, "
        f"{_ptseg_d2_sql('ae.x1', 'ae.y1', 'be')}, "
        f"{_ptseg_d2_sql('be.x0', 'be.y0', 'ae')}, "
        f"{_ptseg_d2_sql('be.x1', 'be.y1', 'ae')}) END)"
    )
    spark.sql(
        f"""CREATE OR REPLACE TEMPORARY FUNCTION st_dwithin_edges(
              a {_EDGE_T}, b {_EDGE_T}, d DOUBLE,
              a_poly BOOLEAN, b_poly BOOLEAN)
            RETURNS BOOLEAN
            RETURN st_intersects_edges(a, b, a_poly, b_poly)
               OR EXISTS(a, ae -> EXISTS(b, be -> {seg_d2} <= d*d))"""
    )


def execute_sql(spark: SparkSession, sql: str, tables: dict | None = None):
    """GeoMesaSparkSql.execute analog: register doc tables as temp
    views, make the st_* functions available, run one SQL statement.
    Spatial predicates in the WHERE clause are ordinary Catalyst
    expressions — pushdown/pruning happen natively, no CQL pre-pass
    needed (the pre-pass only exists in the reference because its
    store could not evaluate SQL)."""
    register_sql_functions(spark)
    for name, df in (tables or {}).items():
        df.createOrReplaceTempView(name)
    return spark.sql(sql)
