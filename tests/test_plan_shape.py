"""Physical-plan shape assertions: the scale guarantees.

These tests pin the properties that make the engine viable at 100 TB:
predicate/partition pruning reaches the parquet scan, small sides
broadcast, and the hot paths contain no Python evaluation nodes.
"""

import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.spatial_join import pip_join_broadcast
from geomesa_spark.plans.planner import QuerySpec, scan
from geomesa_spark.sources.docs import synth_docs, write_docs_table


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def stored(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("docs") / "tbl")
    write_docs_table(synth_docs(spark, 5000), path)
    return spark.read.parquet(path)


def test_week_partition_pruning(spark, stored):
    from datetime import datetime, timezone

    spec = QuerySpec(
        bbox=(-10, -10, 10, 10),
        t0=datetime(2010, 5, 2, tzinfo=timezone.utc),
        t1=datetime(2010, 5, 9, tzinfo=timezone.utc),
    )
    p = plan_of(scan(stored, spec))
    # week is a directory-partition column: the filter must appear as
    # a partition filter on the scan, not a post-scan filter
    assert "PartitionFilters" in p
    assert "week" in p.split("PartitionFilters", 1)[1][:400]


def test_cell_range_predicates_pushed(spark, stored):
    spec = QuerySpec(bbox=(-10, -10, 10, 10))
    p = plan_of(scan(stored, spec))
    # stored cell column -> range predicates reach PushedFilters so
    # parquet row-group stats skip (the Z2 range-scan analog)
    pushed = p.split("PushedFilters", 1)[1][:2000]
    assert "cell" in pushed and "GreaterThanOrEqual" in pushed


def test_derived_cell_skips_ranges(spark):
    # derived (non-stored) cell column: no OR-of-ranges is emitted
    # (they cannot prune and they blow up codegen)
    docs = synth_docs(spark, 100)
    from geomesa_spark.sources.docs import extract_geometry

    ge = extract_geometry(docs)
    spec = QuerySpec(bbox=(-10, -10, 10, 10))
    p = plan_of(scan(ge, spec))
    assert p.count("cell#") < 40  # no 200-term OR over the cell expr


def test_column_pruning_projection(spark, stored):
    p = plan_of(stored.select("doc_id", "lon"))
    sched = p.split("ReadSchema", 1)[1][:200]
    assert "doc_id" in sched and "lon" in sched
    assert "spans" not in sched  # covering-index analog: spans unread


def test_pip_broadcast_no_python_no_shuffle(spark, stored):
    out = pip_join_broadcast(
        stored, [("p1", "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))")]
    )
    p = plan_of(out)
    assert "BroadcastHashJoin" in p
    # the whole join+refine is JVM-side: no Arrow/Python eval nodes
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # and no shuffle of the document table
    assert "Exchange hashpartitioning" not in p


def test_pip_output_preserves_spans(spark, stored):
    out = pip_join_broadcast(
        stored, [("p1", "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0))")]
    )
    assert "spans" in out.columns  # span-sequence invariant carrier
    row = out.select("spans").first()
    assert row is not None and len(row.spans) >= 2


def test_geom_join_refine_is_jvm(spark):
    """After geom_table's one Arrow parse stage, the geometry join
    (cover, dedup, nested-HOF refine) must contain no further Python
    eval nodes, and the polygon cover/edge tables must broadcast."""
    from geomesa_spark.operators import geom_data as GD

    src = spark.createDataFrame(
        [("a", "LINESTRING (0 0, 5 5, 9 2)")], "gid string, geom_wkt string"
    )
    out = GD.geom_join_broadcast(
        GD.geom_table(src), [("p", "POLYGON ((1 1, 8 1, 4 8, 1 1))")], bits=5
    )
    import re

    p = plan_of(out)
    # exactly one Python stage: the WKT parse (ingest); zero in the
    # join/refine pipeline above it (formatted explain prints every
    # node twice — once in the tree, once in the details section —
    # so count distinct node headers)
    assert p.count("ArrowEvalPython") == 0
    assert len(set(re.findall(r"\((\d+)\) MapInPandas", p))) == 1
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def test_geom_table_native_no_python(spark):
    from geomesa_spark.operators import geom_data as GD

    src = spark.createDataFrame(
        [("a", "POLYGON ((0 0, 5 0, 2 4, 0 0))")], "gid string, geom_wkt string"
    )
    p = plan_of(GD.geom_table_native(src))
    assert "MapInPandas" not in p and "EvalPython" not in p


def test_knn_df_no_python(spark):
    """The DataFrame kNN join is pure JVM: candidate generation is
    explode(sequence), ranking is a window — no Python stages."""
    import pandas as pd
    from geomesa_spark.functions import cells as C
    from geomesa_spark.operators.knn import knn_join_df

    pts = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b"], "lon": [0.0, 1.0], "lat": [0.0, 1.0]})
    ).withColumn("cell", C.z2_cell(F.col("lon"), F.col("lat")))
    qs = spark.createDataFrame(
        pd.DataFrame({"qid": ["q"], "qlon": [0.5], "qlat": [0.5]})
    )
    out = knn_join_df(pts, qs, 1)
    p = plan_of(out)
    assert "EvalPython" not in p and "MapInPandas" not in p


def test_budgeted_cover_stays_jvm(spark):
    """The budgeted multi-resolution cover (rb column + shifted cell
    array + supercover walk) is pure column ops: over the all-JVM
    parser the whole pipeline has zero Python eval nodes."""
    from geomesa_spark.operators import geom_data as GD

    src = spark.createDataFrame(
        [("a", "LINESTRING (-150 -60, 140 70)"),
         ("b", "POLYGON ((-120 -30, 60 -30, 60 30, -120 30, -120 -30))")],
        "gid string, geom_wkt string",
    )
    plan = (
        GD.geom_cover_cells(GD.geom_table_native(src), 10, budget=128)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
