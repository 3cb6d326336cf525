"""geomesa_spark — a PySpark-native spatial-join + tiling engine.

Re-creates the query surface of GeoMesa (reference: vpipkt/geomesa,
1.2.0-SNAPSHOT) as an idiomatic PySpark engine: Z2/Z3 space(-time)
curve cell encoding as pure DataFrame bitwise column expressions,
driver-side geometry→cell-cover planning, point-in-polygon /
kNN / proximity / tube joins, density + temporal-density + map
aggregations, BIN export, raster↔vector tile alignment, streaming
keyed-upsert views, and large-scale training-data ops (dedup,
similarity search, text analysis).

Architecture notes (vs the reference):
- The reference executes on Accumulo tablet servers with server-side
  iterators; this engine declares logical plans with the DataFrame
  API and lets Catalyst/Tungsten/AQE pick physical strategies.
- The reference's four physical index tables (z3, st_idx, records,
  attr_idx — see SURVEY.md §1.1) collapse into one columnar table
  with derived `week`/`cell` columns; partition pruning replaces
  row-key range scans.
- Exact geometry predicates run as JVM higher-order-function
  aggregates over broadcast edge arrays (functions/geometry_sql);
  numpy twins exist only for driver-side planning and test oracles.
  No Python — vectorized or otherwise — on any refine/aggregate hot
  path; Arrow-batched mapInPandas is reserved for derivation stages
  (WKT parse, media decode, corpus synthesis).
"""

from geomesa_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
