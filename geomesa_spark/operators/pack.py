"""Global running totals + token-budget shard packing, distributed.

A training-data pipeline packs documents into fixed token-budget
shards in a deterministic global order. The naive Spark form —
``SUM(tokens) OVER (ORDER BY key)`` with no PARTITION BY — collapses
the whole dataset into ONE task (Exchange SinglePartition): correct
at 10^5 rows, dead at 10^12. This module computes the same result
with the classic two-pass distributed prefix sum:

  1. range-repartition on the order key (equal keys co-located,
     partition index = key order), pinned with localCheckpoint so
     the sampled range boundaries cannot differ between the two
     passes (a re-executed non-deterministic exchange would pair
     pass-2 rows with pass-1 offsets from different boundaries);
  2. per-partition totals — ONE driver collect of exactly
     `num_partitions` rows (bounded, not data-sized);
  3. exclusive prefix offsets broadcast-joined back on partition id;
  4. intra-partition running sum via a JVM window PARTITION BY the
     partition id (parallelism = num_partitions, never 1).

The only Exchange in pass 4 hashes on the partition id — P balanced
groups — so wall-clock scales with executors. At 10^12 rows, pass
``assume_partitioned=True`` with an input whose partition-index
order already equals global key order AND whose partitioning is
deterministic across the two passes (a MATERIALIZED layout:
localCheckpoint/cache, or a sorted table read through a
bucket-order-preserving plan). Two things that look safe but are
NOT: a lazy repartitionByRange (its sampled range boundaries differ
per execution, pairing pass-2 rows with pass-1 offsets from
different partitions — observed as wrong totals at 3000 rows) and a
plain parquet read-back (the file scan bins files by SIZE, not name
order).

No reference analog (GeoMesa has no packing operator) — this is one
of the beyond-reference training-pipeline operators, alongside
operators/dedup.py and operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PID = "__pack_pid"


def running_total(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    out_col: str = "cum",
    num_partitions: int | None = None,
    assume_partitioned: bool = False,
) -> DataFrame:
    """Inclusive running total of `value_col` in global `key_cols`
    order, without a single-partition window. NULL values count as 0.

    Keys must be globally unique for a deterministic result (ties
    within a partition have no defined order); doc_id-style keys are.
    Totals use 64-bit integer arithmetic end-to-end — no doubles, so
    no 2^53 precision cliff at corpus scale.
    """
    spark = df.sparkSession
    if not assume_partitioned:
        p = num_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )
        df = df.repartitionByRange(p, *key_cols).localCheckpoint()
    part = df.withColumn(PID, F.spark_partition_id())

    v = F.coalesce(F.col(value_col).cast("long"), F.lit(0))
    totals = (
        part.groupBy(PID).agg(F.sum(v).alias("t")).orderBy(PID).collect()
    )
    # exclusive prefix offsets; partitions with no rows simply don't
    # appear (no rows to join back to)
    off, acc = [], 0
    for r in totals:
        off.append((r[PID], acc))
        acc += r["t"] or 0
    offsets = spark.createDataFrame(
        off or [(0, 0)], f"{PID} int, __pack_off long"
    )

    w = (
        Window.partitionBy(PID)
        .orderBy(*key_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        part.join(F.broadcast(offsets), PID, "left")
        .withColumn(
            out_col,
            F.coalesce(F.col("__pack_off"), F.lit(0)) + F.sum(v).over(w),
        )
        .drop(PID, "__pack_off")
    )


def token_shards(
    df: DataFrame,
    token_col: str,
    budget: int,
    key_cols: list[str],
    cum_col: str = "cum_tokens",
    shard_col: str = "shard",
    num_partitions: int | None = None,
    assume_partitioned: bool = False,
) -> DataFrame:
    """Assign each row to a fixed token-budget shard in global key
    order: shard = (tokens before this row) div budget — a row that
    straddles a boundary belongs to the shard where it starts, so
    every shard except the last holds >= budget tokens and shard ids
    are dense from 0.

    Integral `div` keeps the arithmetic exact at any corpus size.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    out = running_total(
        df,
        token_col,
        key_cols,
        out_col=cum_col,
        num_partitions=num_partitions,
        assume_partitioned=assume_partitioned,
    )
    # SQL `div` = exact 64-bit integral division (try_divide/floor
    # would round-trip through DOUBLE and lose exactness past 2^53)
    return out.withColumn(
        shard_col,
        F.expr(
            f"({cum_col} - coalesce(cast({token_col} as long), 0L))"
            f" div {int(budget)}"
        ),
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 512,
    stride: int | None = None,
) -> DataFrame:
    """Split each document into fixed-size token windows — the
    example-shaping step between cleaning and `token_shards` packing.
    Windows start at 0, ``stride``, 2*stride, … while the start is
    inside the document, so a doc with n tokens emits
    ``ceil(n / stride)`` chunks (0 for empty/NULL text); the last
    window is the (possibly short) suffix. ``stride < chunk_size``
    gives the standard overlapping sliding window.

    Output: (id_col, chunk_id, n_tokens, chunk_text) — one row per
    window, chunk_id dense from 0 in document order.

    Scale: a narrow per-row explode — no shuffle, no Python, no
    driver state; the generate fan-out is bounded by corpus tokens /
    stride. The token array is let-bound through the explode (the
    sequence length n is computed once per row), and an empty
    sequence guard keeps zero-token docs from raising on
    sequence(0, -1) — same hazard as media.frame_sample_plan.
    """
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    stride = chunk_size if stride is None else stride
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "), lambda x: x != ""
    )
    # let-bind the token array behind a Generate barrier (explode of a
    # 1-element array): CollapseProject would otherwise inline the
    # lambda-bearing split into BOTH size() and slice(), and lambda
    # expressions are excluded from codegen subexpression elimination
    with_toks = df.select(F.col(id_col), F.explode(F.array(toks)).alias("_tk"))
    n = F.size("_tk")
    n_chunks = F.ceil(n / F.lit(stride)).cast("long")
    starts = F.when(n > 0, F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).otherwise(
        F.array().cast("array<int>")
    )
    ex = with_toks.select(
        F.col(id_col),
        F.col("_tk"),
        F.explode(starts).alias("chunk_id"),
    )
    window = F.slice(F.col("_tk"), F.col("chunk_id") * stride + 1, chunk_size)
    return ex.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(window).cast("long").alias("n_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )
