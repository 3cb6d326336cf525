"""Z3 (space+time) index layout: pruning + correctness parity."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from geomesa_spark.plans.planner import QuerySpec, scan
from geomesa_spark.sources.docs import extract_geometry, synth_docs, write_docs_table


@pytest.fixture(scope="module")
def z3_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("z3docs") / "tbl")
    write_docs_table(synth_docs(spark, 8000), path, layout="z3")
    return spark.read.parquet(path)


SPEC = QuerySpec(
    bbox=(-20.0, -20.0, 25.0, 30.0),
    t0=datetime(2010, 5, 4, tzinfo=timezone.utc),
    t1=datetime(2010, 5, 18, tzinfo=timezone.utc),
)


def test_z3_scan_parity(spark, z3_table):
    got = {r.doc_id for r in scan(z3_table, SPEC).select("doc_id").collect()}
    # oracle: direct filters on the derived columns (no curve preds)
    e0 = int(SPEC.t0.timestamp())
    e1 = int(SPEC.t1.timestamp())
    want = {
        r.doc_id
        for r in z3_table.filter(
            F.col("lon").between(-20.0, 25.0)
            & F.col("lat").between(-20.0, 30.0)
            & (F.unix_timestamp("dtg") >= e0)
            & (F.unix_timestamp("dtg") < e1)
        ).collect()
    }
    assert got == want and len(got) > 0


def test_z3_ranges_in_pushed_filters(spark, z3_table):
    p = z3_table.sparkSession.sparkContext._jvm.PythonSQLUtils.explainString(
        scan(z3_table, SPEC)._jdf.queryExecution(), "formatted"
    )
    pushed = p.split("PushedFilters", 1)[1].split("ReadSchema", 1)[0]
    assert "z3" in pushed  # curve ranges reach the parquet reader


def test_z3_scan_week_boundary(spark, z3_table):
    # interval fully inside one week: single week predicate, parity
    spec = QuerySpec(
        bbox=(-180.0, -90.0, 180.0, 90.0),
        t0=datetime(2010, 5, 10, 6, 0, tzinfo=timezone.utc),
        t1=datetime(2010, 5, 11, 18, 0, tzinfo=timezone.utc),
    )
    got = scan(z3_table, spec).count()
    e0, e1 = int(spec.t0.timestamp()), int(spec.t1.timestamp())
    want = z3_table.filter(
        (F.unix_timestamp("dtg") >= e0) & (F.unix_timestamp("dtg") < e1)
    ).count()
    assert got == want and got > 0
