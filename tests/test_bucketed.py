"""Bucketed layout: cell-keyed joins and aggregations run without a
shuffle Exchange (the co-located join strategy for 100 TB)."""

import pandas as pd
import numpy as np
from pyspark.sql import functions as F

from geomesa_spark.functions import cells as C
from geomesa_spark.sources.bucketed import read_bucketed, write_bucketed


def _pts(spark, n, seed):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{seed}_{i}" for i in range(n)],
            "lon": rng.uniform(-180, 180, n),
            "lat": rng.uniform(-90, 90, n),
        }
    )
    df = spark.createDataFrame(pdf)
    return df.withColumn(
        "pcell", C.cell_parent(C.z2_cell(F.col("lon"), F.col("lat")), C.XY_BITS, 6)
    )


def test_cobucketed_join_and_agg_no_shuffle(spark, tmp_path):
    import shutil

    # warehouse.dir is a static conf: tables land in the session's
    # default warehouse; clean both catalog entries and any leftover
    # directories from crashed runs
    for t in ("b_left", "b_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    write_bucketed(_pts(spark, 3000, 1), "b_left", bucket_col="pcell", n_buckets=8)
    write_bucketed(_pts(spark, 2000, 2), "b_right", bucket_col="pcell", n_buckets=8)
    left = read_bucketed(spark, "b_left")
    right = read_bucketed(spark, "b_right").select(
        F.col("pcell"), F.col("doc_id").alias("rid")
    )

    # disable broadcast so the planner picks the sort-merge join the
    # bucketing is designed for (at 100 TB neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = left.join(right, "pcell")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert "SortMergeJoin" in plan
        # results still correct vs a plain (shuffled) join
        plain = _pts(spark, 3000, 1).join(
            _pts(spark, 2000, 2).select(
                F.col("pcell"), F.col("doc_id").alias("rid")
            ),
            "pcell",
        )
        assert joined.count() == plain.count()

        agg = left.groupBy("pcell").count()
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan, aplan  # bucket-key agg: map-side only
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    got = {r.pcell: r["count"] for r in agg.collect()}
    exp = {r.pcell: r["count"] for r in _pts(spark, 3000, 1).groupBy("pcell").count().collect()}
    assert got == exp
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")
