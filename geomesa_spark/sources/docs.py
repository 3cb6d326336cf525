"""Interleaved text+media document table: synthesis and span extraction.

The engine's canonical input (driver `input_hint`):

    docs(doc_id: string,
         spans: array<struct<kind:string, text:string,
                             media_ref:string, offset:int>>)

Each document carries interleaved `text` / `media` spans plus one
`geo` span (WKT POINT payload) and one `time` span (ISO instant) —
the analog of a SimpleFeature's default-geometry and dtg attributes
(SimpleFeatureTypes.scala:525 spec `*geom:Point:srid=4326`, dtg).

**Invariant:** every operator must carry `spans` through unmodified
and never reorder within a row. Enrichment only *adds* columns.

Synthesis is fully distributed and deterministic: values derive from
`splitmix64(doc_index)` arithmetic (counter-based, partition-order
independent) — no driver-side data generation, so the same code
synthesizes 10^5 rows locally or 10^12 on a cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_spark.functions import cells as C

SPAN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", SPAN_SCHEMA),
    ]
)

# deterministic corpus window (2 epoch weeks+, exercises week-boundary
# logic of Z3Table.secondsInCurrentWeek, Z3Table.scala:48-51)
T0_EPOCH = 1272672000  # 2010-05-01T00:00:00Z
T1_EPOCH = 1277942399  # 2010-06-30T23:59:59Z

# skew clusters ("cities") for hot-cell testing (FIXTURES.md F1)
CITY_CENTERS = [(-73.98, 40.75), (2.35, 48.86), (139.69, 35.68)]
CITY_FRACTION = 0.5  # half of docs land in cities => heavy skew
CITY_SIGMA = 0.5     # degrees


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based deterministic hash (public splitmix64 constants)."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(x: np.ndarray, salt: int) -> np.ndarray:
    """uniform [0,1) derived from (index, salt)."""
    h = _splitmix64(x.astype(np.uint64) * np.uint64(2654435761) + np.uint64(salt))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _synth_batch(idx: np.ndarray) -> pd.DataFrame:
    n = len(idx)
    # location: mixture of world-uniform and gaussian city clusters
    in_city = _u01(idx, 1) < CITY_FRACTION
    which = (_u01(idx, 2) * len(CITY_CENTERS)).astype(np.int64)
    cx = np.array([c[0] for c in CITY_CENTERS])[which]
    cy = np.array([c[1] for c in CITY_CENTERS])[which]
    # Box-Muller from two deterministic uniforms
    u1 = np.clip(_u01(idx, 3), 1e-12, 1.0)
    u2 = _u01(idx, 4)
    g1 = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)
    g2 = np.sqrt(-2.0 * np.log(u1)) * np.sin(2 * np.pi * u2)
    lon = np.where(in_city, np.clip(cx + g1 * CITY_SIGMA, -180, 180),
                   _u01(idx, 5) * 360.0 - 180.0)
    lat = np.where(in_city, np.clip(cy + g2 * CITY_SIGMA, -90, 90),
                   _u01(idx, 6) * 180.0 - 90.0)
    lon = np.round(lon, 6)
    lat = np.round(lat, 6)
    es = (T0_EPOCH + _u01(idx, 7) * (T1_EPOCH - T0_EPOCH)).astype(np.int64)
    n_extra = 2 + (_splitmix64(idx.astype(np.uint64) + np.uint64(8)) % np.uint64(5)).astype(np.int64)

    iso = pd.to_datetime(es, unit="s", utc=True).strftime("%Y-%m-%dT%H:%M:%SZ")
    rows = []
    words = np.array(["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
                      "golf", "hotel", "india", "juliet"])
    for i in range(n):
        k = int(idx[i])
        spans = []
        off = 0
        ne = int(n_extra[i])
        for j in range(ne):
            if j % 2 == 0:
                w = words[int(_splitmix64(np.array([k * 31 + j], dtype=np.uint64))[0] % 10)]
                spans.append(("text", f"{w} span {j} of doc {k}", None, off))
            else:
                spans.append(("media", None, f"media://bucket/{k % 1024}/{k}_{j}.bin", off))
            off += 16
        spans.append(("geo", f"POINT ({lon[i]} {lat[i]})", None, off))
        spans.append(("time", iso[i], None, off + 16))
        rows.append((f"doc{k:012d}", spans))
    return pd.DataFrame(rows, columns=["doc_id", "spans"])


def synth_docs(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic synthesis of n interleaved documents."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches):
        for pdf in batches:
            yield _synth_batch(pdf["id"].to_numpy())

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(gen, schema=DOCS_SCHEMA)
    )


def extract_geometry(docs: DataFrame, bits: int = C.XY_BITS) -> DataFrame:
    """Enrich docs with lon/lat/dtg/week/cell — all JVM-side built-ins.

    The geometry lives in the `kind='geo'` span as WKT POINT; dtg in
    the `kind='time'` span. Extraction is pure Spark SQL (filter +
    regexp_extract) so the hot path stays in whole-stage codegen —
    no Python. `spans` is carried through untouched (invariant).
    """
    geo_txt = F.element_at(
        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("geo")), 1
    )["text"]
    time_txt = F.element_at(
        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("time")), 1
    )["text"]
    num = r"([-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)"
    lon = F.regexp_extract(geo_txt, rf"POINT \({num} {num}\)", 1).cast("double")
    lat = F.regexp_extract(geo_txt, rf"POINT \({num} {num}\)", 2).cast("double")
    dtg = F.to_timestamp(time_txt, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return (
        docs.withColumn("lon", lon)
        .withColumn("lat", lat)
        .withColumn("dtg", dtg)
        .withColumn("week", C.week(F.col("dtg")))
        .withColumn("cell", C.z2_cell(F.col("lon"), F.col("lat"), bits))
        .withColumn(
            "z3",
            C.z3_combine(
                C.lon_to_x(F.col("lon")),
                C.lat_to_y(F.col("lat")),
                C.time_to_t(C.secs_in_week(F.col("dtg"))),
            ),
        )
    )


def write_docs_table(
    docs: DataFrame, path: str, bits: int = C.XY_BITS, layout: str = "z2"
) -> None:
    """Persist enriched docs partitioned by week, z-sorted in-file.

    The layout analog of the reference's index tables: `week`
    directory partition (epoch-week row-key prefix,
    Z3Table.scala:120-128) and a space(-time) curve sort order inside
    files so Parquet row-group min/max stats prune curve ranges (the
    analog of tablet row-range scans). layout="z2" sorts by the
    spatial cell (ST-table analog, best for pure-spatial queries);
    layout="z3" sorts by the within-week space-time curve (z3-table
    analog, best for space+time queries). The reference keeps BOTH
    as separate physical tables; write both layouts only if the
    workload needs them.
    """
    _write_enriched(extract_geometry(docs, bits), path, layout)


def _sort_col(df: DataFrame, layout: str) -> str:
    """Layout -> in-file sort column. 'z2'/'z3' are the curve tables;
    'attr:<col>' sorts files by an attribute so parquet row-group
    min/max stats prune attribute predicates (the AttributeIndexJob
    analog, geomesa-jobs/…/index/AttributeIndexJob.scala — a covering
    attribute-sorted copy instead of a separate index table)."""
    if layout.startswith("attr:"):
        col = layout[len("attr:"):]
        if col not in df.columns:
            raise ValueError(f"attr layout column {col!r} not in table")
        return col
    return {"z2": "cell", "z3": "z3"}[layout]


def _write_enriched(df: DataFrame, path: str, layout: str) -> None:
    # the in-partition sort MUST lead with the partition column:
    # FileFormatWriter requires task rows ordered by the partitionBy
    # columns and injects its own non-stable sort on (week) when the
    # incoming ordering doesn't start with them — which silently
    # destroyed the secondary curve order (observed: 0 of 9 files
    # curve-sorted before the fix). With (week, curve) the writer's
    # requirement is already satisfied and the curve order survives
    # into parquet row groups.
    (
        df.repartition("week")
        .sortWithinPartitions("week", _sort_col(df, layout))
        .write.mode("overwrite")
        .partitionBy("week")
        .parquet(path)
    )


def reindex_docs_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    bits: int = C.XY_BITS,
    layout: str = "z2",
    ecql: str | None = None,
    id_col: str = "doc_id",
) -> None:
    """Rewrite a stored docs table into a new layout / key resolution —
    the geomesa-jobs index-maintenance analog:

    * SchemaCopyJob (SchemaCopyJob.scala:36-60): read the old table,
      optionally filter with ECQL (the job's CQL_IN arg), decode and
      re-encode every feature into a fresh table (spans are the
      serialized feature; enrichment re-derives from them, so format
      improvements apply to old data).
    * SortedIndexUpdateJob (SortedIndexUpdateJob.scala:38-77): the
      Z2 `cell` keys are re-derived at the CURRENT `bits`, i.e. rows
      move to the new key format. `z3` is a FIXED-format structure
      engine-wide (the planner's zranges_3d always uses
      XY_BITS/T_BITS, like the reference's fixed Z3 schema) and is
      re-derived at that fixed resolution.
    * AttributeIndexJob: layout='attr:<col>' writes an
      attribute-sorted copy (parquet stats prune on the attribute).

    Distributed end-to-end: one scan, narrow re-enrichment, the same
    week-repartition + in-file curve sort as write_docs_table — no
    driver state, safe at any table size. Spans carry through
    unmodified (north-rule invariant).
    """
    raw = spark.read.parquet(src_path).select(id_col, "spans")
    enriched = extract_geometry(raw, bits)
    if ecql:
        from geomesa_spark.plans.ecql import ecql_scan

        enriched = ecql_scan(enriched, ecql, id_col=id_col)
    _write_enriched(enriched, dst_path, layout)
