"""Temporal joins: as-of, point-in-interval, interval-overlap.

Beyond-reference operators (like operators/pack.py and sample.py):
the reference's feature model is (geometry, dtg) and its temporal
algebra stops at predicate pushdown (during/before/after rewrites,
``plans/planner.py``), but a training-data pipeline over event
streams needs the three classic temporal joins that plain Spark SQL
only expresses as BroadcastNestedLoopJoin / CartesianProduct theta
joins:

- **as-of join** — enrich each left row with the most recent right
  row at-or-before (or earliest at-or-after) its timestamp.
- **point-in-interval join** — match events to the keyed time
  windows that contain them.
- **interval-overlap join** — all pairs of keyed intervals that
  overlap.

Scale design (why these survive 100 TB where the naive theta join
does not):

- ``asof_join`` is the union-tag trick: tag right rows 0 / left rows
  1, union, ONE shuffle on the key, and a per-key running
  ``last(right_payload, ignorenulls)`` window ordered by
  (ts, tag) delivers every left row its match in a single sort pass
  — no range-condition join ever exists in the plan, so Catalyst
  cannot pick a nested-loop strategy. Per-key cost is the sort;
  a hot key is bounded by its own rows (same profile as any per-key
  window) and never multiplies against the other side.
- ``interval_join`` / ``overlap_join`` discretize time into
  fixed-width buckets: intervals explode over the O(len/width)
  buckets they cover, points map to exactly ONE bucket, and the
  match becomes a plain (key, bucket) equi-join Catalyst shuffles
  or broadcasts like any other — with the exact predicate applied
  after. A (point, interval) pair meets in exactly the point's
  bucket, so the inner join needs no dedup; overlapping interval
  pairs meet in every shared bucket, so ``overlap_join`` assigns
  each pair the single bucket containing max(start_l, start_r)
  (bucketing is monotone, so that bucket is exactly
  greatest(bucket(start_l), bucket(start_r)) and is covered by both
  sides whenever the intervals truly overlap).

All three are pure DataFrame compositions (no Python in any physical
plan) and SQL-expressible for the DuckDB oracle gates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join", "overlap_join", "snapshot_diff"]


def _keys(on: str | Sequence[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def _is_timestamp(df: DataFrame, col: str) -> bool:
    return dict(df.dtypes)[col].startswith("timestamp")


def _ticks(df: DataFrame, col: str) -> Column:
    """A monotone integer clock for bucketing / tolerance: epoch
    micros for timestamps, the value itself for integral columns."""
    if _is_timestamp(df, col):
        # NTZ-safe: parquet timestamps read as TIMESTAMP_NTZ in recent
        # Spark; cast to LTZ is the identity under the UTC session TZ
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.col(col).cast("long")


def _width_ticks(df: DataFrame, ts_col: str, width) -> int:
    """Bucket width in tick units: seconds for timestamp columns
    (converted to micros), raw units for integer columns."""
    w = int(round(width * 1_000_000)) if _is_timestamp(df, ts_col) else int(width)
    if w <= 0:
        raise ValueError(f"bucket width must be positive, got {width}")
    return w


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    *,
    direction: str = "backward",
    tolerance: float | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Left-outer as-of join: each left row gains the right row with
    the greatest ``right_ts`` <= its ``left_ts`` (``backward``; ties
    at equal timestamps match) or the least ``right_ts`` >= it
    (``forward``), within the same ``on`` key. Right rows must be
    unique per (key, ts) — reduce them first (e.g. groupBy.max) or
    the winner among equal-timestamp rows is unspecified.

    ``tolerance`` (seconds for timestamp columns, raw units for
    integer columns) nulls out matches further than that from the
    left timestamp. Right columns appear prefixed (the matched
    timestamp as ``{prefix}{right_ts}``); unmatched left rows keep
    NULLs. Right rows with a NULL timestamp never match; left rows
    with a NULL timestamp match nothing.

    One Exchange on the key + one per-key sort — no range join, no
    nested loop, regardless of key skew or table sizes.
    """
    keys = _keys(on)
    right_ts = right_ts or left_ts
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    payload = [c for c in right.columns if c not in keys and c != right_ts]

    l_struct = F.struct(*[F.col(c) for c in left.columns])
    r_struct = F.struct(
        F.col(right_ts).alias("__mts"), *[F.col(c) for c in payload]
    )
    l_type = left.select(l_struct.alias("x")).schema[0].dataType
    r_type = right.select(r_struct.alias("x")).schema[0].dataType

    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__src"),
        l_struct.alias("__l"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    r_side = right.where(F.col(right_ts).isNotNull()).select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__src"),
        F.lit(None).cast(l_type).alias("__l"),
        r_struct.alias("__r"),
    )
    both = r_side.unionByName(l_side)

    # right rows sort before left rows at equal ts, so at-or-before /
    # at-or-after includes exact-timestamp matches in both directions
    order = (
        [F.col("__t").asc_nulls_first(), F.col("__src").asc()]
        if direction == "backward"
        else [F.col("__t").desc_nulls_last(), F.col("__src").asc()]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__r", ignorenulls=True).over(w)
    # a NULL left timestamp must not inherit the running match
    matched = F.when(F.col("__t").isNotNull(), matched)

    out = both.withColumn("__m", matched).where(F.col("__src") == 1)

    if tolerance is not None:
        if tolerance < 0:
            raise ValueError(f"tolerance must be >= 0, got {tolerance}")
        tol = _width_ticks(left, left_ts, tolerance) if tolerance > 0 else 0
        lt = _ticks(out, "__t")
        mt = (
            F.unix_micros(F.col("__m.__mts").cast("timestamp"))
            if _is_timestamp(right, right_ts)
            else F.col("__m.__mts").cast("long")
        )
        gap = (lt - mt) if direction == "backward" else (mt - lt)
        out = out.withColumn(
            "__m", F.when(gap <= F.lit(tol), F.col("__m"))
        )

    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        F.col("__m.__mts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in payload],
    )


def _covered_buckets(start_ticks: Column, end_ticks: Column, w: int) -> Column:
    """Bucket indices [floor(start/w) .. floor((end-1)/w)] covered by
    the half-open tick interval [start, end)."""
    return F.sequence(
        F.floor(start_ticks / F.lit(w)),
        F.floor((end_ticks - F.lit(1)) / F.lit(w)),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | Sequence[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    *,
    bucket_width,
    how: str = "inner",
    prefix: str = "i_",
) -> DataFrame:
    """Match each point row to every same-key interval row whose
    half-open window [start, end) contains its timestamp.

    ``bucket_width`` (seconds for timestamps, raw units for integer
    clocks) sets the discretization: each interval is exploded over
    the ~len/width buckets it covers — size it near the TYPICAL
    interval length so the fan-out stays O(1) per interval. Points
    land in exactly one bucket, so the equi-join emits each matching
    pair exactly once and needs no dedup. ``how`` is ``inner`` or
    ``left`` (points with no covering interval kept with NULLs).
    Interval columns appear prefixed; rows with NULL or empty
    (end <= start) windows match nothing.
    """
    keys = _keys(on)
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    w = _width_ticks(points, point_ts, bucket_width)

    ivl_payload = [c for c in intervals.columns if c not in keys]
    s_ticks = _ticks(intervals, start_col)
    e_ticks = _ticks(intervals, end_col)
    ivl = (
        intervals.where(
            F.col(start_col).isNotNull()
            & F.col(end_col).isNotNull()
            & (e_ticks > s_ticks)
        )
        .withColumn("__b", F.explode(_covered_buckets(s_ticks, e_ticks, w)))
        .select(
            *[F.col(k) for k in keys],
            F.col("__b"),
            F.struct(*[F.col(c) for c in ivl_payload]).alias("__i"),
        )
    )
    pts = points.withColumn(
        "__b", F.floor(_ticks(points, point_ts) / F.lit(w))
    )
    # alias both sides: the two frames often share lineage (windows
    # derived from the same event table), and qualified names are the
    # only self-join-safe way to write the condition
    pts, ivl = pts.alias("__pts"), ivl.alias("__ivl")
    pt = _ticks_q("__pts", point_ts, points)
    cond = [F.col(f"__pts.{k}") == F.col(f"__ivl.{k}") for k in keys] + [
        F.col("__pts.__b") == F.col("__ivl.__b"),
        pt >= _ticks_q("__ivl", f"__i.{start_col}", intervals, start_col),
        pt < _ticks_q("__ivl", f"__i.{end_col}", intervals, end_col),
    ]
    joined = pts.join(ivl, cond, "inner" if how == "inner" else "left_outer")
    return joined.select(
        *[F.col(f"__pts.{c}").alias(c) for c in points.columns],
        *[F.col(f"__ivl.__i.{c}").alias(f"{prefix}{c}") for c in ivl_payload],
    )


def _ticks_q(
    alias: str, path: str, src: DataFrame, field: str | None = None
) -> Column:
    """Tick clock for an alias-qualified (possibly struct-nested)
    column; `src`/`field` supply the dtype of the underlying column."""
    c = F.col(f"{alias}.{path}")
    if _is_timestamp(src, field or path):
        return F.unix_micros(c.cast("timestamp"))
    return c.cast("long")


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    *,
    bucket_width,
    l_prefix: str = "l_",
    r_prefix: str = "r_",
) -> DataFrame:
    """All same-key pairs of half-open intervals that overlap
    (``l_start < r_end AND r_start < l_end``), emitted exactly once.

    Both sides explode over their covered buckets and equi-join on
    (key, bucket); a pair that overlaps shares the bucket containing
    max(l_start, r_start) — and because bucketing is monotone, that
    bucket index is exactly greatest(bucket(l_start),
    bucket(r_start)), which the join keeps as the pair's single
    responsible bucket (no post-join dropDuplicates Exchange).
    Output columns are the key plus both sides' non-key columns
    under their prefixes. Rows with NULL or empty windows never
    match.
    """
    keys = _keys(on)
    w = _width_ticks(left, l_start, bucket_width)

    def explode_side(df: DataFrame, s: str, e: str, tag: str) -> DataFrame:
        payload = [c for c in df.columns if c not in keys]
        st, et = _ticks(df, s), _ticks(df, e)
        return (
            df.where(F.col(s).isNotNull() & F.col(e).isNotNull() & (et > st))
            .withColumn("__b", F.explode(_covered_buckets(st, et, w)))
            .withColumn("__s", F.floor(st / F.lit(w)))
            .select(
                *[F.col(k) for k in keys],
                F.col("__b"),
                F.col("__s"),
                F.struct(*[F.col(c) for c in payload]).alias(tag),
            )
        )

    ls = explode_side(left, l_start, l_end, "__lp").alias("__ls")
    rs = explode_side(right, r_start, r_end, "__rp").alias("__rs")
    cond = [F.col(f"__ls.{k}") == F.col(f"__rs.{k}") for k in keys] + [
        F.col("__ls.__b") == F.col("__rs.__b"),
        # responsibility: only the bucket of max(l_start, r_start)
        F.col("__ls.__b") == F.greatest(F.col("__ls.__s"), F.col("__rs.__s")),
        _ticks_q("__ls", f"__lp.{l_start}", left, l_start)
        < _ticks_q("__rs", f"__rp.{r_end}", right, r_end),
        _ticks_q("__rs", f"__rp.{r_start}", right, r_start)
        < _ticks_q("__ls", f"__lp.{l_end}", left, l_end),
    ]
    l_payload = [c for c in left.columns if c not in keys]
    r_payload = [c for c in right.columns if c not in keys]
    return ls.join(rs, cond, "inner").select(
        *[F.col(f"__ls.{k}").alias(k) for k in keys],
        *[F.col(f"__ls.__lp.{c}").alias(f"{l_prefix}{c}") for c in l_payload],
        *[F.col(f"__rs.__rp.{c}").alias(f"{r_prefix}{c}") for c in r_payload],
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Entity-level diff between two table snapshots: which ids were
    added, removed, or changed — the day-over-day audit every
    ingest/live-view pipeline runs (the reference's replay/live
    consumers answer "what changed" by re-reading; this is the
    one-pass set form).

    ONE full-outer equi-join on the id (equal partitioning on both
    sides — no broadcast assumption, snapshots are both corpus-
    sized); `compare_cols` inequality is null-safe (`<=>` negated),
    so NULL -> value and value -> NULL count as changes. Unchanged
    rows are dropped (the output is bounded by the churn, not the
    corpus). compare_cols=None diffs membership only (added/removed).

    Returns (<id_col>, change) with change in
    ('added', 'removed', 'changed')."""
    cols = list(compare_cols or [])
    o = old.select(
        F.col(id_col),
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"_o_{c}") for c in cols],
    )
    n = new.select(
        F.col(id_col),
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"_n_{c}") for c in cols],
    )
    j = o.join(n, id_col, "full_outer")
    changed = F.lit(False)
    for c in cols:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(id_col, "change")
    )
