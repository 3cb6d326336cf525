"""Aggregation analytics: density, temporal density, unique, map-agg,
BIN export, point2point.

All reference aggregations are partial (per-tablet iterator) + final
(client merge) — exactly Spark's partial/final HashAggregate model
(SURVEY.md §2.4), so every operator here is built-in `groupBy().agg()`
with zero Python in the aggregation path. Only the BIN byte-packer
uses a (vectorized numpy) mapInPandas stage, because its output is a
binary format.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geomesa_spark.functions import cells as C


def density(
    df: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    weight_col: str | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """2-D heatmap: snap each point to a W×H grid pixel, sum weights.

    Reference: Z3DensityIterator.scala:129-187 (per-tablet partial
    grids) + client merge (:251-297); grid snapping GridSnap.scala:
    21-100. Here: one `groupBy(i, j).sum(weight)` — Catalyst plans
    partial+final hash aggregation, the exact same execution shape,
    with whole-stage codegen instead of per-key Scala callbacks.

    Returns (i:int, j:int, weight) — i column, j row, like GridSnap.
    """
    xmin, ymin, xmax, ymax = bbox
    i, j = C.grid_snap_cols(F.col(lon_col), F.col(lat_col), bbox, width, height)
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        df.filter(
            F.col(lon_col).between(F.lit(xmin), F.lit(xmax))
            & F.col(lat_col).between(F.lit(ymin), F.lit(ymax))
        )
        .groupBy(i.alias("i"), j.alias("j"))
        .agg(F.sum(w).alias("weight"))
    )


def temporal_density(
    df: DataFrame,
    t0_epoch: int,
    t1_epoch: int,
    buckets: int,
    dtg_col: str = "dtg",
) -> DataFrame:
    """Time-series histogram: bucket dtg into `buckets` over [t0,t1).

    Reference: TemporalDensityIterator.scala:63-78,125-131 (TimeSnap
    buckets per tablet, client merges the series). Returns
    (bucket:int, n:long).
    """
    span = t1_epoch - t0_epoch
    es = F.unix_timestamp(F.col(dtg_col))
    b = F.floor((es - F.lit(t0_epoch)) * F.lit(buckets) / F.lit(span)).cast("int")
    return (
        df.filter((es >= F.lit(t0_epoch)) & (es < F.lit(t1_epoch)))
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def unique_values(
    df: DataFrame,
    attr: str,
    histogram: bool = True,
    sort_by: str | None = None,
    descending: bool = False,
) -> DataFrame:
    """Distinct values of an attribute, optional counts and sort.

    Reference: UniqueProcess.scala:33-127 (+ index row-skipping
    UniqueAttributeIterator — obsolete here: Parquet column pruning
    reads just the one column, and partial aggregation dedups
    map-side before the shuffle).
    """
    if histogram:
        out = df.groupBy(F.col(attr).alias("value")).agg(
            F.count(F.lit(1)).alias("n")
        )
    else:
        out = df.select(F.col(attr).alias("value")).distinct()
    if sort_by:
        c = F.col(sort_by)
        out = out.orderBy(c.desc() if descending else c.asc())
    return out


def map_aggregate(df: DataFrame, map_col: str) -> DataFrame:
    """Element-wise sum of a Map[K,Int] attribute across rows.

    Reference: MapAggregatingIterator.scala:47-57,79-98 (per-tablet
    partial map merge + client final merge). Spark form: explode →
    partial/final sum per key. Returns (key, total).
    """
    return (
        df.select(F.explode(F.col(map_col)).alias("key", "value"))
        .groupBy("key")
        .agg(F.sum("value").alias("total"))
    )


def map_aggregate_as_map(df: DataFrame, map_col: str) -> DataFrame:
    """Single-row variant returning one MapType column (exact
    reference output shape)."""
    return map_aggregate(df, map_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("key"), F.col("total")))
        ).alias("merged")
    )


def gaussian_stencil(radius_px: int) -> list[tuple[int, int, float]]:
    """Normalized circular gaussian stencil (di, dj, weight): sigma =
    r/3, truncated at r, weights summing to 1 — the kernel both
    smoothing variants (and any external oracle) must share."""
    import math

    sigma = max(radius_px / 3.0, 1e-9)
    offs = []
    for di in range(-radius_px, radius_px + 1):
        for dj in range(-radius_px, radius_px + 1):
            if di * di + dj * dj <= radius_px * radius_px:
                offs.append(
                    (di, dj, math.exp(-(di * di + dj * dj) / (2 * sigma * sigma)))
                )
    norm = sum(w for _, _, w in offs)
    return [(di, dj, w / norm) for di, dj, w in offs]


def gaussian_stencil_fixed(
    radius_px: int, scale: int = 1_000_000
) -> list[tuple[int, int, int]]:
    """The stencil with int64 fixed-point weights round(w * scale) —
    integer sums are order-independent, so a smoothed grid built from
    these is bit-reproducible on any engine/partitioning (the same
    trick as dedup.FIXED_SCALE for embedding dots)."""
    return [
        (di, dj, int(round(w * scale))) for di, dj, w in gaussian_stencil(radius_px)
    ]


def smooth_density(
    grid: DataFrame,
    width: int,
    height: int,
    radius_px: int = 10,
) -> DataFrame:
    """Kernel-density smoothing of a density grid (i, j, weight).

    Reference: DensityProcess.scala:38-75 delegates to GeoTools
    HeatmapSurface(radiusPixels) — a gaussian kernel surface. Here
    each filled pixel scatters its weight over a (2r+1)^2 gaussian
    stencil (sigma = r/3, truncated at r) via one explode + the same
    partial/final sum as density itself. Distributed end-to-end —
    no driver-side surface construction.
    Returns (i, j, weight:double).
    """
    offs = gaussian_stencil(radius_px)
    kernel = F.array(
        *[
            F.struct(
                F.lit(di).alias("di"), F.lit(dj).alias("dj"),
                F.lit(w).alias("kw"),
            )
            for di, dj, w in offs
        ]
    )
    scattered = grid.select(
        F.col("i"), F.col("j"), F.col("weight"), F.explode(kernel).alias("k")
    ).select(
        (F.col("i") + F.col("k.di")).alias("i"),
        (F.col("j") + F.col("k.dj")).alias("j"),
        (F.col("weight").cast("double") * F.col("k.kw")).alias("w"),
    )
    return (
        scattered.filter(
            F.col("i").between(0, width - 1) & F.col("j").between(0, height - 1)
        )
        .groupBy("i", "j")
        .agg(F.sum("w").alias("weight"))
    )


def smooth_density_fixed(
    grid: DataFrame,
    width: int,
    height: int,
    radius_px: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact-arithmetic smoothing: integer stencil weights
    (`gaussian_stencil_fixed`), so the per-pixel sums are pure int64
    arithmetic — order-independent and bit-reproducible across
    engines and partitionings (the oracle-parity variant of
    `smooth_density`; `weight` in the input grid must be integral,
    e.g. a count or an already-fixed-point weight).
    Returns (i, j, weight:long) with weight in units of 1/scale.
    """
    offs = gaussian_stencil_fixed(radius_px, scale)
    kernel = F.array(
        *[
            F.struct(
                F.lit(di).alias("di"), F.lit(dj).alias("dj"),
                F.lit(kw).cast("long").alias("kw"),
            )
            for di, dj, kw in offs
        ]
    )
    scattered = grid.select(
        F.col("i"), F.col("j"), F.col("weight"), F.explode(kernel).alias("k")
    ).select(
        (F.col("i") + F.col("k.di")).alias("i"),
        (F.col("j") + F.col("k.dj")).alias("j"),
        (F.col("weight").cast("long") * F.col("k.kw")).alias("w"),
    )
    return (
        scattered.filter(
            F.col("i").between(0, width - 1) & F.col("j").between(0, height - 1)
        )
        .groupBy("i", "j")
        .agg(F.sum("w").alias("weight"))
    )


def heatmap(
    df: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    radius_px: int = 10,
    weight_col: str | None = None,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Density + kernel smoothing (the full DensityProcess analog)."""
    return smooth_density(
        density(df, bbox, width, height, weight_col, lon_col, lat_col),
        width, height, radius_px,
    )


BIN_SCHEMA = T.StructType([T.StructField("chunk", T.BinaryType())])


def bin_export(
    df: DataFrame,
    track_col: str,
    dtg_col: str = "dtg",
    lon_col: str = "lon",
    lat_col: str = "lat",
    label_col: str | None = None,
    sort_within: bool = True,
    track_hash_col: str | None = None,
) -> DataFrame:
    """Pack features into the 16-byte (24 with label) LE "BIN" format.

    Record layout (Convert2ViewerFunction.scala:86-147):
      int32 trackId-hash | int32 epoch-seconds | float32 lat | float32 lon
      [| int64 label]
    In-chunk time sort mirrors BinSorter (BinAggregatingIterator.scala:
    172-174) via sortWithinPartitions — no global shuffle.
    `track_hash_col` overrides the default murmur3 track hash with a
    caller-provided int32 column (e.g. `portable_hash32` when the
    packed bytes must be reproducible outside the JVM).
    Returns one binary chunk per partition (the client concatenates).
    """
    tid = (
        F.col(track_hash_col).cast("int")
        if track_hash_col
        else F.hash(F.col(track_col))
    )
    cols = [
        tid.alias("tid"),
        F.unix_timestamp(F.col(dtg_col)).cast("int").alias("secs"),
        F.col(lat_col).cast("float").alias("blat"),
        F.col(lon_col).cast("float").alias("blon"),
    ]
    if label_col:
        cols.append(F.col(label_col).cast("long").alias("label"))
    sel = df.select(*cols)
    if sort_within:
        sel = sel.sortWithinPartitions("secs")

    labeled = label_col is not None

    def pack(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            if labeled:
                rec = np.zeros(
                    n,
                    dtype=np.dtype(
                        [("tid", "<i4"), ("secs", "<i4"), ("lat", "<f4"),
                         ("lon", "<f4"), ("label", "<i8")]
                    ),
                )
                rec["label"] = pdf["label"].to_numpy()
            else:
                rec = np.zeros(
                    n,
                    dtype=np.dtype(
                        [("tid", "<i4"), ("secs", "<i4"), ("lat", "<f4"),
                         ("lon", "<f4")]
                    ),
                )
            rec["tid"] = pdf["tid"].to_numpy()
            rec["secs"] = pdf["secs"].to_numpy()
            rec["lat"] = pdf["blat"].to_numpy()
            rec["lon"] = pdf["blon"].to_numpy()
            yield pd.DataFrame({"chunk": [rec.tobytes()]})

    return sel.mapInPandas(pack, schema=BIN_SCHEMA)


def portable_hash32(col: Column) -> Column:
    """Signed-int32 hash reproducible on any engine: first 4 bytes of
    md5 of the value's string form (the same construction the dedup
    family uses for shingle hashes). Use as `track_hash_col` when BIN
    bytes must be comparable against a non-JVM oracle."""
    # the unsigned step IS dedup.shingle_hash(md5) — shared so the
    # cross-engine-reproducible construction cannot drift between the
    # BIN track hash and the minhash family
    from geomesa_spark.operators.dedup import shingle_hash

    h = shingle_hash(col.cast("string"), fn="md5")
    return (
        F.when(h >= F.lit(1 << 31), h - F.lit(1 << 32)).otherwise(h).cast("int")
    )


BIN_ROW_SCHEMA = T.StructType(
    [
        T.StructField("tid", T.IntegerType()),
        T.StructField("secs", T.IntegerType()),
        T.StructField("lat", T.FloatType()),
        T.StructField("lon", T.FloatType()),
    ]
)
BIN_ROW_SCHEMA_LABELED = T.StructType(
    BIN_ROW_SCHEMA.fields + [T.StructField("label", T.LongType())]
)


def bin_unpack(chunks: DataFrame, labeled: bool = False) -> DataFrame:
    """Distributed inverse of `bin_export`: chunk rows -> field rows.

    One vectorized numpy `frombuffer` per chunk inside mapInPandas —
    the exact byte layout round-trips, which is what the correctness
    gate exercises (pack+unpack == identity on the packed fields)."""
    dt = (
        np.dtype([("tid", "<i4"), ("secs", "<i4"), ("lat", "<f4"),
                  ("lon", "<f4"), ("label", "<i8")])
        if labeled
        else np.dtype([("tid", "<i4"), ("secs", "<i4"), ("lat", "<f4"),
                       ("lon", "<f4")])
    )
    schema = BIN_ROW_SCHEMA_LABELED if labeled else BIN_ROW_SCHEMA

    def gen(batches):
        for pdf in batches:
            for chunk in pdf["chunk"]:
                if not chunk:
                    continue
                rec = np.frombuffer(chunk, dtype=dt)
                yield pd.DataFrame({k: rec[k] for k in rec.dtype.names})

    return chunks.mapInPandas(gen, schema=schema)


def bin_decode(chunks: list[bytes], labeled: bool = False) -> pd.DataFrame:
    """Client-side decode of BIN chunks (test/export helper)."""
    dt = (
        np.dtype([("tid", "<i4"), ("secs", "<i4"), ("lat", "<f4"),
                  ("lon", "<f4"), ("label", "<i8")])
        if labeled
        else np.dtype([("tid", "<i4"), ("secs", "<i4"), ("lat", "<f4"),
                       ("lon", "<f4")])
    )
    arrs = [np.frombuffer(c, dtype=dt) for c in chunks if c]
    rec = np.concatenate(arrs) if arrs else np.empty(0, dtype=dt)
    return pd.DataFrame({k: rec[k] for k in rec.dtype.names})


def point2point(
    df: DataFrame,
    group_col: str,
    dtg_col: str = "dtg",
    lon_col: str = "lon",
    lat_col: str = "lat",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Convert ordered points to consecutive line segments per group.

    Reference: Point2PointProcess.scala:112 (sliding pairs of
    dtg-sorted points per group attribute). Spark: lead() over a
    partitioned window — one shuffle on the group key.
    """
    order = [dtg_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(group_col).orderBy(*order)
    out = df.select(
        F.col(group_col).alias("group"),
        F.col(dtg_col).alias("t1"),
        F.lead(dtg_col).over(w).alias("t2"),
        F.col(lon_col).alias("x1"),
        F.col(lat_col).alias("y1"),
        F.lead(lon_col).over(w).alias("x2"),
        F.lead(lat_col).over(w).alias("y2"),
    )
    return out.filter(F.col("t2").isNotNull())


def hash_attribute(
    df: DataFrame,
    attr: str,
    modulo: int,
    out_col: str = "hash",
    portable: bool = True,
) -> DataFrame:
    """Append `hash(attr) % modulo` in [0, modulo) — the
    HashAttributeProcess analog (geomesa-process/.../
    HashAttributeProcess.scala:86), used to bucket features for
    sampling/sharding. `portable=True` (default) uses the md5-prefix
    hash so buckets reproduce on any engine; `portable=False` uses
    the JVM murmur3 `F.hash` (faster, JVM-only)."""
    h = portable_hash32(F.col(attr)) if portable else F.hash(F.col(attr))
    return df.withColumn(out_col, F.pmod(h, F.lit(modulo)).cast("int"))


def count_by_day(df: DataFrame, dtg_col: str = "dtg") -> DataFrame:
    """GeoMesaSpark demo aggregation (GeoMesaSpark.scala:156-166)."""
    return (
        df.groupBy(F.date_format(F.col(dtg_col), "yyyyMMdd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _safe_string(c: Column) -> Column:
    """HistogramJob.safeString (HistogramJob.scala:129-134): null or
    empty-string attribute values histogram as the literal 'null'."""
    return F.coalesce(F.nullif(c.cast("string"), F.lit("")), F.lit("null"))


def histogram_job(
    df: DataFrame,
    attribute: str,
    group_by: list[str] | None = None,
    unique_by: list[str] | None = None,
    transforms: dict[str, Column] | None = None,
    where: Column | str | None = None,
) -> DataFrame:
    """Attribute histogram with group-by / unique-by semantics —
    the geomesa-jobs HistogramJob analog (HistogramJob.scala:33-108).

    * ``transforms`` — derived attributes (the job's TRANSFORM_IN
      ``name=expression`` list), applied before anything else, so
      group/unique/attribute names may refer to them.
    * ``where`` — the CQL_IN filter analog (compose with plans.ecql
      for CQL text).
    * ``unique_by`` — rows are first deduplicated on the stringified
      (group_by + unique_by + attribute) tuple (the job keeps one
      feature per distinct tuple, HistogramJob.scala:86-90), so the
      final count is "distinct unique_by combinations per
      (group, attribute value)".
    * every grouping value goes through safeString: null/'' -> 'null'.

    Scale: one (or two, with unique_by) partial-aggregated hash
    shuffles over string keys — the Scalding groupBy/aggregate
    pipeline re-expressed as native groupBy so Catalyst map-side
    combines; no Python, no driver state. Output: group columns,
    the attribute value column, and ``count``.
    """
    group_by = list(group_by or [])
    unique_by = list(unique_by or [])
    if len(group_by) + len(unique_by) > 8:
        # HistogramJob.scala:68 — tuple-arity bound in the reference
        raise ValueError("can't group by + unique by more than 8 attributes")
    for name, expr in (transforms or {}).items():
        df = df.withColumn(name, expr)
    if where is not None:
        df = df.filter(where)
    keys = [_safe_string(F.col(a)).alias(a) for a in group_by + [attribute]]
    if unique_by:
        uniq = [_safe_string(F.col(a)).alias(a) for a in unique_by]
        df = df.select(*keys, *uniq).dropDuplicates()
    else:
        df = df.select(*keys)
    return df.groupBy(*(group_by + [attribute])).agg(
        F.count(F.lit(1)).alias("count")
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct counting — mergeable cardinality at 100 TB
# ---------------------------------------------------------------------------

# 60 hash bits: 15 md5 hex chars parse into a signed BIGINT without
# overflow on any engine (2^60 < 2^63)
_HLL_HASH_BITS = 60


def _hll_alpha(m: int) -> float:
    """The standard HLL bias constant (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _bit_length_col(x: Column, max_bits: int) -> Column:
    """bit_length(x) for 0 <= x < 2^max_bits as a CASE chain of
    integer comparisons — exact and engine-portable, unlike
    floor(log2(x)) whose last-ulp behavior differs across libm
    implementations at/near powers of two."""
    expr = F.lit(0)
    for k in range(1, max_bits + 1):
        # built bottom-up: the outermost WHEN checks the highest
        # threshold, so the chain resolves on the first (largest)
        # power of two <= x
        expr = F.when(x >= F.lit(1 << (k - 1)).cast("long"), F.lit(k)).otherwise(expr)
    return expr


def hll_distinct(
    df: DataFrame,
    col: str,
    p: int = 12,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Approximate distinct count via a from-scratch HyperLogLog
    whose every step is DETERMINISTIC and engine-exact — unlike
    `approx_count_distinct`, whose sketch is Spark-private, this one
    reproduces bit-for-bit on any engine (the DuckDB oracle runs the
    same integer register math), so estimates are stable across
    partitionings, retries, and engines.

    Why it scales: exact countDistinct shuffles every distinct value;
    HLL reduces each partition to m = 2^p registers with a map-side
    combinable MAX — the shuffle carries O(m) rows per partition no
    matter how many distinct values exist, and register sets merge
    associatively (the same property the reference exploits in its
    Stat iterators' mergeable summaries, geomesa-utils stats).

    Register math: 60 hash bits from md5 (15 hex chars -> BIGINT),
    top p bits = register index, rank = leading zeros of the
    remaining (60-p) bits + 1 (CASE-chain bit_length, no libm). The
    harmonic sum is computed in INTEGER units of 2^-(60-p+1):
    sum(2^(60-p+1-rank)) as BIGINT — float summation order never
    enters, so partial aggregation order cannot perturb the result.
    The raw estimate alpha*m^2/S is one IEEE multiply+divide. The
    small-range linear-counting correction (zeros present and
    E <= 2.5m) uses ln() — documented caveat: ln's last ulp may
    differ across engines; the oracle gate pins the raw branch.

    Returns (group_by..., approx_distinct double, n_registers,
    sum_units, zero_registers) — the raw components expose the
    mergeable state for callers persisting sketches."""
    gb = list(group_by or [])
    m = 1 << p
    rem_bits = _HLL_HASH_BITS - p
    max_rank = rem_bits + 1
    v = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    # top p bits via shiftright — NOT float division, which would
    # round: a 60-bit value exceeds a double's 53-bit mantissa
    bucket = F.shiftright(v, rem_bits)
    rem = v % F.lit(1 << rem_bits).cast("long")
    rank = (F.lit(max_rank) - _bit_length_col(rem, rem_bits)).cast("int")
    # NULL values hash to a NULL bucket (md5(NULL) = NULL cascades)
    # rather than being filtered out, so a group whose values are ALL
    # NULL still emits a row — countDistinct semantics report 0 for
    # such groups, not absence (the linear-counting branch returns
    # m*ln(m/m) = 0 exactly, engine-exact since ln(1) is exact).
    regs = (
        df.select(*gb, bucket.alias("_b"), rank.alias("_r"))
        .groupBy(*gb, "_b")
        .agg(F.max("_r").alias("_mr"))
    )
    # integer harmonic sum: 2^-rank in units of 2^-max_rank
    # (F.shiftleft requires a literal int bit count; the SQL form
    # accepts a column); the NULL-bucket row contributes NULL -> the
    # sum skips it and count(_b) excludes it
    unit = F.expr(f"shiftleft(cast(1 as bigint), {max_rank} - _mr)")
    agg = regs.groupBy(*gb).agg(
        F.coalesce(F.sum(unit), F.lit(0).cast("long")).alias("_s"),
        F.count(F.col("_b")).alias("_nreg"),
    )
    zeros = F.lit(m) - F.col("_nreg")
    # absent registers contribute 2^0 = 1 each -> max_rank units each
    s_units = F.col("_s") + zeros * F.lit(1 << max_rank).cast("long")
    alpha = _hll_alpha(m)
    raw = F.lit(alpha * m * m * float(1 << max_rank)) / s_units.cast("double")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((zeros > 0) & (raw <= F.lit(2.5 * m)), lc).otherwise(raw)
    return agg.select(
        *gb,
        est.alias("approx_distinct"),
        F.col("_nreg").alias("n_registers"),
        s_units.alias("sum_units"),
        zeros.cast("long").alias("zero_registers"),
    )


# ---------------------------------------------------------------------------
# Count-Min frequency sketch
# ---------------------------------------------------------------------------


def _cm_bucket(val: Column, row: int, width: int, hash_fn: str) -> Column:
    """Row-`row`'s bucket for `val`: salted hash pmod width.

    md5 path: 15 hex chars -> non-negative 60-bit int, bit-portable
    to any SQL engine (the shingle_hash convention). xxhash path:
    Spark-native, ~6x faster, masked non-negative before pmod."""
    salted = F.concat(val, F.lit(f":{row}"))
    if hash_fn == "xxhash":
        h = F.xxhash64(salted).bitwiseAND(F.lit((1 << 62) - 1))
    else:
        h = F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(width)).cast("int")


def cm_sketch(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """Count-Min frequency sketch (Cormode & Muthukrishnan 2005) as a
    mergeable (r, bucket, cnt) frame — `depth` independent salted
    hash rows of `width` counters; a point estimate is the MIN of a
    value's `depth` counters and only ever over-counts.

    The sketch answers "how often does X occur?" over a corpus too
    big to groupBy per value: one explode to `depth` rows per input
    row, then one partial-aggregated groupBy — map-side combine
    collapses every partition to <= depth*width rows before the
    exchange, so shuffle volume is O(depth * width * partitions)
    regardless of input size or value cardinality (the reason to
    sketch instead of counting exactly). Absent (r, bucket) pairs
    mean zero (cm_lookup coalesces). Sketches over different batches
    or partitionings merge by union + re-groupBy summing cnt, and the
    md5 path is bit-portable, so estimates reproduce on any engine.

    `weight_col` sums that column instead of counting rows (weighted
    frequency). Estimate error: cnt_true <= est <= cnt_true +
    eps * total with eps = e / width at confidence 1 - (1/e)^depth.
    """
    v = F.col(col).cast("string")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = df.select(
        F.posexplode(
            F.array(*[_cm_bucket(v, r, width, hash_fn) for r in range(depth)])
        ).alias("r", "bucket"),
        w.alias("_w"),
    )
    return rows.groupBy("r", "bucket").agg(F.sum("_w").alias("cnt"))


def cm_lookup(
    sketch: DataFrame,
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "md5",
    out: str = "est",
) -> DataFrame:
    """Point-query a cm_sketch: for each distinct value of `df.col`,
    the estimate is the MIN over its `depth` counters (0 when a
    counter row is absent). depth/width/hash_fn must match the
    sketch's build parameters. The probe side explodes to `depth`
    rows per distinct value and joins the sketch on (r, bucket) —
    broadcast-sized whenever depth*width is, which it is by design."""
    probes = (
        df.select(F.col(col).cast("string").alias("val"))
        .distinct()
        .select(
            "val",
            F.posexplode(
                F.array(
                    *[_cm_bucket(F.col("val"), r, width, hash_fn) for r in range(depth)]
                )
            ).alias("r", "bucket"),
        )
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy("val")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out))
    )


# ---------------------------------------------------------------------------
# Bloom filter (deterministic, engine-portable)
# ---------------------------------------------------------------------------


def bloom_build(
    df: DataFrame,
    col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    hash_fn: str = "md5",
) -> DataFrame:
    """Bloom filter of `df.col` as a frame of SET bit indices — the
    semi-join pruning structure: probe misses are definite, hits may
    be false positives (rate ~ (1 - e^(-kn/m))^k).

    Where Spark's built-in bloom_filter_agg builds an opaque binary
    whose layout is engine-private, this one is a DETERMINISTIC set
    of int64 bit positions (salted portable hashes pmod n_bits, the
    cm_sketch convention): reproducible on any engine, storable as a
    plain table, and mergeable across batches by union+distinct.
    Shuffle volume is bounded by min(rows * n_hashes, n_bits)
    distinct indices after map-side partial aggregation.
    """
    v = F.col(col).cast("string")
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        _cm_bucket(v, r, n_bits, hash_fn).cast("long")
                        for r in range(n_hashes)
                    ]
                )
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    bloom: DataFrame,
    df: DataFrame,
    col: str,
    id_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    hash_fn: str = "md5",
    out: str = "might_contain",
) -> DataFrame:
    """Append `out`: false means `col`'s value is DEFINITELY not in
    the filtered set (safe to prune); true means probably present.
    Parameters must match bloom_build's; `id_col` must be unique per
    row (the verdict is computed per id and joined back). The bit set
    broadcasts — its row count is capped by n_bits — so each probe
    row costs n_hashes exploded broadcast lookups plus one
    partial-aggregated count per id; no per-row Python, no UDF."""
    v = F.col(col).cast("string")
    probes = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.array(
                *[
                    _cm_bucket(v, r, n_bits, hash_fn).cast("long")
                    for r in range(n_hashes)
                ]
            )
        ).alias("bit"),
    )
    verdict = (
        probes.join(F.broadcast(bloom.withColumn("__set", F.lit(1))), "bit", "left")
        .groupBy("__id")
        .agg((F.count("__set") == F.lit(n_hashes)).alias(out))
    )
    return df.join(
        verdict, F.col(id_col) == F.col("__id"), "left"
    ).drop("__id")


def tile_pyramid(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    max_bits: int = 8,
    min_bits: int = 0,
    weight_col: str | None = None,
) -> DataFrame:
    """Multi-resolution tile rollup: per-cell counts/weights at EVERY
    zoom level in [min_bits, max_bits] — the pre-aggregation a map
    tile server (or the reference's geohash-prefix IndexSchema
    levels, `IndexSchema.scala`) reads instead of rescanning the
    corpus per zoom.

    Two bounded phases: one partial-aggregated groupBy onto the
    FINEST cells (corpus -> <= 4^max_bits rows), then each finest
    cell explodes to its ancestor chain (Z2 parent = drop 2 low bits
    per level, `cells.cell_parent` — the geohash-prefix containment
    property) and re-aggregates.  The level fan-out multiplies the
    AGGREGATED cells, never the corpus: total phase-2 input is
    <= (levels+1) * occupied(max_bits), and the whole pyramid is
    SUM-mergeable (ingest a new partition, aggregate its pyramid,
    add — the rollup never rescans history).

    Returns (bits, cell, n, w): level, cell id at that level, row
    count, weight sum (= n when weight_col is None; int64 both)."""
    if not 0 <= min_bits <= max_bits <= C.XY_BITS:
        raise ValueError("need 0 <= min_bits <= max_bits <= XY_BITS")
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    fine = (
        df.select(
            C.cell_parent(
                C.z2_cell(F.col(lon_col), F.col(lat_col)),
                C.XY_BITS, max_bits,
            ).alias("cell"),
            w.alias("_w"),
        )
        .groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("_w").alias("w"),
        )
    )
    levels = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("bits"),
                    C.cell_parent(F.col("cell"), max_bits, b).alias("pcell"),
                )
                for b in range(min_bits, max_bits + 1)
            ]
        )
    )
    return (
        fine.select("n", "w", levels.alias("l"))
        .groupBy(
            F.col("l.bits").alias("bits"), F.col("l.pcell").alias("cell")
        )
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("w").cast("long").alias("w"),
        )
    )


def zonal_stats(
    df: DataFrame,
    zones: list[tuple[str, str]],
    value_col: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    fp_scale: int = 1_000_000,
    **pip_kwargs,
) -> DataFrame:
    """Zonal statistics: per-polygon aggregates of a point value
    column — the classic raster/GIS summary (mean sensor reading per
    district, count per AOI) as ONE broadcast PIP join + one
    partial-aggregated groupBy. `zones` is the (zone_id, wkt) layer
    (broadcast — use geom_data joins for huge layers).

    Deterministic contract: count/min/max are exact; the sum is the
    int64 fixed-point `sum_fp` = Σ floor(v·fp_scale) (float sums are
    merge-order dependent — the heatmap convention) and `mean_fp` =
    CAST(sum_fp AS DOUBLE)/n, one division of canonical integers
    (divide by fp_scale for units).

    Returns (zone, n, vmin, vmax, sum_fp, mean_fp)."""
    from geomesa_spark.operators.spatial_join import pip_join_broadcast

    cell_col = pip_kwargs.pop("cell_col", "cell")
    if cell_col not in df.columns:
        df = df.withColumn(
            cell_col, C.z2_cell(F.col(lon_col), F.col(lat_col))
        )
    joined = pip_join_broadcast(
        df, zones, lon_col=lon_col, lat_col=lat_col,
        cell_col=cell_col, **pip_kwargs
    )
    vfp = F.floor(F.col(value_col) * F.lit(float(fp_scale))).cast("long")
    return (
        joined.withColumn("_vfp", vfp)
        .groupBy(F.col("poly_id").alias("zone"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
            F.sum("_vfp").alias("sum_fp"),
        )
        .withColumn(
            "mean_fp",
            F.col("sum_fp").cast("double") / F.col("n").cast("double"),
        )
    )
