"""Attribute statistics collection — the query-planning metadata the
reference keeps per attribute, computed as one distributed pass.

Reference parity: the reference stores per-attribute cardinality
hints that steer index selection (geomesa-utils
``stats/Cardinality.scala:11-16`` — high/low/unknown — consumed by
the attribute-index strategy) and audits per-query stats
(``geomesa-accumulo .. stats/Stat.scala``, already covered by
``plans/lineage.py``). `attr_stats` is the collection side: bounds,
counts, distinct counts and a cardinality classification per
attribute, the inputs a cost-based scan chooser needs.
`numeric_profile` adds exact moments and quantiles for one numeric
column on a fixed-point lattice.

Scale notes: `attr_stats` is ONE aggregation pass; the exact
distinct counts expand the input k-fold (one Expand row per
attribute) but remain partial-aggregated before the single-row
final — for planning metadata over many attributes at warehouse
scale, flip ``exact_ndv=False`` to HyperLogLog++ sketches
(`approx_count_distinct`), which cuts the Expand to mergeable
sketch buffers. `numeric_profile` aggregates exact integer moments
on a caller-chosen fixed-point scale — sums of longs are
order-independent, so the derived mean/variance are bit-reproducible
across partitionings (double summation would not be), and exact
`percentile` keeps a per-group value multiset (bounded by the
column's distinct fixed-point values; use approx quantiles beyond
that).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attr_stats", "numeric_profile"]


def attr_stats(
    df: DataFrame,
    cols: Sequence[str],
    *,
    low_cardinality_max: int = 1000,
    exact_ndv: bool = True,
) -> DataFrame:
    """One row per attribute: total rows, non-null count, distinct
    count, min/max (string-rendered, so heterogeneous attribute
    types coexist in one frame), and the reference's
    high/low cardinality class (``Cardinality.scala``): ``low`` when
    ndv <= `low_cardinality_max`, else ``high`` — low-cardinality
    attributes are the ones worth an attribute index / dictionary
    encoding.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    ndv = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_ndv
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__cnt_{c}"),
            ndv(c).alias(f"__ndv_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__cnt_{c}").alias("n_values"),
                F.col(f"__ndv_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
                F.when(
                    F.col(f"__ndv_{c}") <= F.lit(low_cardinality_max), "low"
                )
                .otherwise("high")
                .alias("cardinality"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("s")).select("s.*")


def numeric_profile(df: DataFrame, col: str, *, scale: int = 1_000_000,
                    quantiles: Sequence[float] = (0.25, 0.5, 0.75, 0.95)) -> DataFrame:
    """Exact moments + quantiles of one numeric column on the
    fixed-point lattice round(x * scale): one row with counts and
    min/max/sum as longs (order-independent, so the derived mean/std
    are reproducible across partition layouts — which a raw double
    sum is not), the sum of squares as an exact decimal(38,0)
    rendered to string (fx^2 overflows int64 already at ~10^4 rows
    of 9-digit fx values; 38 digits survive 10^12 rows), and exact
    linear-interpolation percentiles of the fixed-point values
    (dyadic fractions like .25/.5/.75 interpolate exactly).
    """
    fx = F.round(F.col(col) * F.lit(scale)).cast("long")
    d = df.select(fx.alias("__fx"), F.col(col).isNull().alias("__isnull"))
    qs = list(quantiles)
    sumsq = F.sum(F.col("__fx").cast("decimal(38,0)") * F.col("__fx"))
    row = d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col("__fx")).alias("n_values"),
        F.min("__fx").alias("min_fx"),
        F.max("__fx").alias("max_fx"),
        F.sum("__fx").alias("sum_fx"),
        sumsq.alias("__sumsq"),
        F.count_distinct(F.col("__fx")).alias("n_distinct_fx"),
        F.expr(
            f"percentile(__fx, array({', '.join(str(q) for q in qs)}))"
        ).alias("__q"),
    )
    row = row.withColumn("sumsq_fx", F.col("__sumsq").cast("string"))
    mean = F.col("sum_fx") / F.col("n_values")
    var = F.col("__sumsq").cast("double") / F.col("n_values") - mean * mean
    out = row.withColumn("mean_fx", mean).withColumn(
        "std_fx", F.sqrt(F.greatest(var, F.lit(0.0)))
    )
    for i, q in enumerate(qs):
        out = out.withColumn(
            f"p{int(round(q * 100)):02d}_fx", F.col("__q")[i]
        )
    return out.drop("__q", "__sumsq")
