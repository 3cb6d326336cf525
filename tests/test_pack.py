"""Distributed prefix sum + token-budget shard packing (operators/pack)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.pack import running_total, token_shards

RNG = np.random.default_rng(7)


def _docs(spark, n=5000):
    toks = RNG.integers(1, 400, n).tolist()
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tok int"
    )


def test_running_total_matches_numpy(spark):
    df = _docs(spark)
    got = (
        running_total(df, "n_tok", ["doc_id"], num_partitions=16)
        .orderBy("doc_id")
        .toPandas()
    )
    assert (got["cum"].values == np.cumsum(got["n_tok"].values)).all()


def test_null_values_count_as_zero(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "doc_id long, n_tok int"
    )
    got = (
        running_total(df, "n_tok", ["doc_id"], num_partitions=4)
        .orderBy("doc_id")
        .toPandas()
    )
    assert got["cum"].tolist() == [10, 10, 15]


def test_token_shards_semantics(spark):
    df = _docs(spark, 2000)
    got = (
        token_shards(df, "n_tok", budget=1000, key_cols=["doc_id"],
                     num_partitions=8)
        .orderBy("doc_id")
        .toPandas()
    )
    cum = np.cumsum(got["n_tok"].values)
    assert (got["cum_tokens"].values == cum).all()
    exp_shard = (cum - got["n_tok"].values) // 1000
    assert (got["shard"].values == exp_shard).all()
    # dense shard ids from 0 (max token 399 < budget, so no budget
    # window can be skipped); with start-based assignment a full
    # shard holds >= budget - max_token + 1 tokens, not >= budget
    shards = got.groupby("shard")["n_tok"].sum()
    assert sorted(shards.index) == list(range(len(shards)))
    assert (shards.iloc[:-1] >= 1000 - int(got["n_tok"].max()) + 1).all()


def test_no_single_partition_exchange(spark):
    """The whole point: the naive global window is SinglePartition;
    this operator must never be."""
    df = _docs(spark, 1000)
    plan = (
        token_shards(df, "n_tok", budget=500, key_cols=["doc_id"],
                     num_partitions=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
    # and the naive form IS, proving the assertion has teeth
    from pyspark.sql import Window
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    naive = df.withColumn("cum", F.sum("n_tok").over(w))
    assert "SinglePartition" in (
        naive._jdf.queryExecution().executedPlan().toString()
    )


def test_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, n_tok int")
    assert (
        token_shards(df, "n_tok", budget=10, key_cols=["doc_id"],
                     num_partitions=4).count()
        == 0
    )


def test_bad_budget(spark):
    with pytest.raises(ValueError):
        token_shards(_docs(spark, 10), "n_tok", budget=0, key_cols=["doc_id"])


def test_assume_partitioned_skips_repartition(spark):
    """The 10^12-row path: input whose partition-index order already
    equals global key order skips the repartition + checkpoint and
    still agrees. The layout must be MATERIALIZED (here:
    localCheckpoint) — a lazy repartitionByRange re-samples its range
    boundaries per pass and pairs pass-2 rows with pass-1 offsets
    from different partitions (observed: 3000-row mismatch)."""
    df = _docs(spark, 3000).repartitionByRange(6, "doc_id").localCheckpoint()
    got = (
        running_total(df, "n_tok", ["doc_id"], assume_partitioned=True)
        .orderBy("doc_id")
        .toPandas()
    )
    assert (got["cum"].values == np.cumsum(got["n_tok"].values)).all()
