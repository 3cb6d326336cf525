"""Temporal joins (as-of / interval / overlap) + attribute stats:
edge semantics the gate queries don't reach — ties, tolerance,
direction, NULL and empty windows, self-join lineage, bucket-width
independence, plan shape (no nested loop anywhere)."""

import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.stats import attr_stats, numeric_profile
from geomesa_spark.operators.temporal import (
    asof_join,
    interval_join,
    overlap_join,
)


def _left(spark):
    return spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 10, "d"), (3, 7, "e")],
        "k long, ts long, tag string",
    )


def _right(spark):
    return spark.createDataFrame(
        [(1, 10, 100), (1, 15, 150), (2, 11, 211), (9, 1, 900)],
        "k long, ts long, val long",
    )


def test_asof_backward_ties_and_misses(spark):
    got = {
        r["tag"]: (r["r_ts"], r["r_val"])
        for r in asof_join(_left(spark), _right(spark), "k", "ts").collect()
    }
    assert got == {
        "a": (10, 100),   # equal timestamp matches (at-or-before)
        "b": (15, 150),
        "c": (None, None),  # before every right row
        "d": (None, None),  # right ts 11 > 10
        "e": (None, None),  # key with no right rows at all
    }


def test_asof_forward_and_tolerance(spark):
    got = {
        r["tag"]: r["r_ts"]
        for r in asof_join(
            _left(spark), _right(spark), "k", "ts", direction="forward"
        ).collect()
    }
    assert got == {"a": 10, "b": None, "c": 10, "d": 11, "e": None}
    tol = {
        r["tag"]: r["r_ts"]
        for r in asof_join(
            _left(spark),
            _right(spark),
            "k",
            "ts",
            direction="forward",
            tolerance=2,
        ).collect()
    }
    assert tol == {"a": 10, "b": None, "c": None, "d": 11, "e": None}


def test_asof_null_timestamps(spark):
    left = spark.createDataFrame(
        [(1, None, "x"), (1, 20, "y")], "k long, ts long, tag string"
    )
    right = spark.createDataFrame(
        [(1, None, 1), (1, 10, 2)], "k long, ts long, val long"
    )
    got = {
        r["tag"]: r["r_val"] for r in asof_join(left, right, "k", "ts").collect()
    }
    # NULL-ts right rows never match; NULL-ts left rows match nothing
    assert got == {"x": None, "y": 2}


def test_asof_no_nested_loop_in_plan(spark):
    plan = asof_join(
        _left(spark), _right(spark), "k", "ts"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_empty_right_keeps_schema(spark):
    empty = _right(spark).where(F.lit(False))
    out = asof_join(_left(spark), empty, "k", "ts")
    assert out.columns == ["k", "ts", "tag", "r_ts", "r_val"]
    assert out.where(F.col("r_val").isNotNull()).count() == 0
    assert out.count() == 5


def _points(spark):
    return spark.createDataFrame(
        [(1, 10, "p1"), (1, 25, "p2"), (2, 10, "p3")],
        "k long, ts long, pid string",
    )


def _windows(spark):
    return spark.createDataFrame(
        [
            (1, 5, 15, "w1"),
            (1, 10, 11, "w2"),
            (1, 25, 25, "w_empty"),   # end == start: matches nothing
            (1, None, 40, "w_null"),  # NULL bound: matches nothing
            (2, 0, 100, "w3"),
        ],
        "k long, start long, end long, wid string",
    )


@pytest.mark.parametrize("width", [1, 3, 1000])
def test_interval_join_width_independent(spark, width):
    got = {
        (r["pid"], r["i_wid"])
        for r in interval_join(
            _points(spark),
            _windows(spark),
            "k",
            "ts",
            "start",
            "end",
            bucket_width=width,
        ).collect()
    }
    # half-open: p1@10 in [5,15) and [10,11); p2@25 NOT in [25,25);
    assert got == {("p1", "w1"), ("p1", "w2"), ("p3", "w3")}


def test_interval_join_left_keeps_unmatched(spark):
    out = interval_join(
        _points(spark),
        _windows(spark),
        "k",
        "ts",
        "start",
        "end",
        bucket_width=7,
        how="left",
    )
    got = {(r["pid"], r["i_wid"]) for r in out.collect()}
    assert got == {("p1", "w1"), ("p1", "w2"), ("p3", "w3"), ("p2", None)}


def test_interval_join_self_lineage(spark):
    """Both sides derived from the same parent frame — the common
    gate shape — must not trip Spark's ambiguous-self-join check."""
    ev = _points(spark)
    ivl = ev.select(
        "k", F.col("ts").alias("start"), (F.col("ts") + 20).alias("end"),
        F.col("pid").alias("wid"),
    )
    got = {
        (r["pid"], r["i_wid"])
        for r in interval_join(
            ev, ivl, "k", "ts", "start", "end", bucket_width=8
        ).collect()
    }
    assert got == {
        ("p1", "p1"), ("p2", "p2"), ("p3", "p3"), ("p2", "p1"),
    }


@pytest.mark.parametrize("width", [1, 6, 10_000])
def test_overlap_join_exactly_once(spark, width):
    a = spark.createDataFrame(
        [(1, 0, 10, "a1"), (1, 20, 30, "a2"), (2, 0, 5, "a3")],
        "k long, s long, e long, aid string",
    )
    b = spark.createDataFrame(
        [(1, 9, 21, "b1"), (1, 10, 20, "b2"), (2, 5, 6, "b3")],
        "k long, s long, e long, bid string",
    )
    rows = overlap_join(
        a, b, "k", "s", "e", "s", "e", bucket_width=width
    ).collect()
    pairs = [(r["l_aid"], r["r_bid"]) for r in rows]
    # half-open: a1 x b1 overlap on [9,10); a2 x b1 on [20,21);
    # a1 x b2 do NOT ([0,10) vs [10,20)); a3 x b3 do NOT ([0,5) vs [5,6))
    assert sorted(pairs) == [("a1", "b1"), ("a2", "b1")]
    assert len(pairs) == len(set(pairs)), "pair emitted twice"


def test_overlap_join_no_nested_loop(spark):
    a = _windows(spark).where(F.col("start").isNotNull())
    plan = overlap_join(
        a, a, "k", "start", "end", "start", "end", bucket_width=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_timestamp_clock_parity(spark):
    """Timestamp columns behave exactly like their epoch-micros
    integer twins (same matches, seconds-based widths)."""
    pts = _points(spark)
    win = _windows(spark).where(F.col("start").isNotNull())
    as_ts = lambda df, cols: df.select(  # noqa: E731
        *[
            F.timestamp_micros((F.col(c) * 1_000_000).cast("long")).alias(c)
            if c in cols
            else F.col(c)
            for c in df.columns
        ]
    )
    got = {
        (r["pid"], r["i_wid"])
        for r in interval_join(
            as_ts(pts, {"ts"}),
            as_ts(win, {"start", "end"}),
            "k",
            "ts",
            "start",
            "end",
            bucket_width=3.0,
        ).collect()
    }
    assert got == {("p1", "w1"), ("p1", "w2"), ("p3", "w3")}


def test_attr_stats_and_cardinality(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, None), (None, "y")],
        "a long, b string",
    )
    got = {r["column"]: r.asDict() for r in attr_stats(
        df, ["a", "b"], low_cardinality_max=2
    ).collect()}
    assert got["a"]["n_rows"] == 4 and got["a"]["n_values"] == 3
    assert got["a"]["n_distinct"] == 3 and got["a"]["cardinality"] == "high"
    assert (got["a"]["min_value"], got["a"]["max_value"]) == ("1", "3")
    assert got["b"]["n_distinct"] == 2 and got["b"]["cardinality"] == "low"
    with pytest.raises(ValueError):
        attr_stats(df, [])


def test_numeric_profile_exact_moments(spark):
    df = spark.createDataFrame(
        [(0.001,), (0.002,), (0.003,), (None,)], "v double"
    )
    row = numeric_profile(df, "v", scale=1000, quantiles=(0.5,)).collect()[0]
    assert (row["n_rows"], row["n_values"]) == (4, 3)
    assert (row["min_fx"], row["max_fx"], row["sum_fx"]) == (1, 3, 6)
    assert row["sumsq_fx"] == "14"  # decimal(38,0), string-rendered
    assert row["mean_fx"] == 2.0
    assert abs(row["std_fx"] - (2 / 3) ** 0.5) < 1e-12
    assert row["p50_fx"] == 2.0
