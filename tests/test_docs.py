"""Interleaved-doc synthesis + span extraction + invariant checks."""

import numpy as np
from pyspark.sql import functions as F

from geomesa_spark.functions import cells as C
from geomesa_spark.sources import docs as D


def test_synth_deterministic(spark):
    a = D.synth_docs(spark, 200, partitions=4).orderBy("doc_id").collect()
    b = D.synth_docs(spark, 200, partitions=7).orderBy("doc_id").collect()
    assert a == b  # partition-count independent
    assert len(a) == 200
    assert a[0].doc_id == "doc000000000000"


def test_span_structure(spark):
    rows = D.synth_docs(spark, 50, partitions=2).collect()
    for r in rows:
        kinds = [s.kind for s in r.spans]
        assert kinds.count("geo") == 1
        assert kinds.count("time") == 1
        offsets = [s.offset for s in r.spans]
        assert offsets == sorted(offsets)  # strictly increasing order
        assert all(o2 > o1 for o1, o2 in zip(offsets, offsets[1:]))


def test_extract_geometry_jvm_side(spark):
    docs = D.synth_docs(spark, 500, partitions=4)
    enr = D.extract_geometry(docs)
    pdf = enr.select("doc_id", "lon", "lat", "dtg", "week", "cell", "z3").toPandas()
    assert pdf.lon.between(-180, 180).all()
    assert pdf.lat.between(-90, 90).all()
    assert pdf.dtg.notna().all()
    # weeks span the corpus window (>= 2 distinct epoch weeks)
    assert pdf.week.nunique() >= 8
    # cell matches numpy encode of extracted lon/lat
    exp = C.z2_encode_np(C.lon_to_x_np(pdf.lon.values), C.lat_to_y_np(pdf.lat.values))
    assert (pdf.cell.values == exp).all()


def test_spans_invariant_carried(spark):
    """Enrichment must not alter the spans column (north_rule invariant)."""
    docs = D.synth_docs(spark, 100, partitions=2)
    before = {r.doc_id: r.spans for r in docs.collect()}
    after = {r.doc_id: r.spans for r in D.extract_geometry(docs).select("doc_id", "spans").collect()}
    assert before == after


def test_skew_exists(spark):
    """City clusters must produce hot cells (needed by skew tests)."""
    enr = D.extract_geometry(D.synth_docs(spark, 5000, partitions=4))
    counts = (
        enr.groupBy(C.cell_parent(F.col("cell"), C.XY_BITS, 6).alias("c"))
        .count()
        .toPandas()
    )
    top = counts["count"].max()
    med = counts["count"].median()
    assert top > 20 * med  # heavy skew by construction


def test_reindex_docs_table(spark, tmp_path):
    """SchemaCopy / SortedIndexUpdate / AttributeIndex analogs: rows
    survive, keys re-derive at the new resolution, files re-sort to
    the requested layout, ECQL filters apply, spans stay intact."""
    src = str(tmp_path / "src")
    docs = D.synth_docs(spark, 800, partitions=4)
    D.write_docs_table(docs, src, bits=C.XY_BITS, layout="z2")

    def in_file_sorted(path, col):
        import glob as _g

        for part in _g.glob(f"{path}/week=*/*.parquet"):
            vals = [r[0] for r in spark.read.parquet(part).select(col).collect()]
            assert vals == sorted(vals), (part, col)

    # z3 re-layout at a coarser spatial resolution
    dst = str(tmp_path / "z3")
    D.reindex_docs_table(spark, src, dst, bits=12, layout="z3")
    out = spark.read.parquet(dst)
    a = spark.read.parquet(src)
    assert out.count() == a.count()
    # keys re-derived at bits=12
    row = out.select("lon", "lat", "cell").first()
    enc = C.z2_encode_np(
        C.lon_to_x_np(np.array([row.lon]), 12), C.lat_to_y_np(np.array([row.lat]), 12)
    )[0]
    assert row.cell == enc
    in_file_sorted(dst, "z3")
    # spans invariant: byte-identical per doc
    before = {r.doc_id: r.spans for r in a.select("doc_id", "spans").collect()}
    after = {r.doc_id: r.spans for r in out.select("doc_id", "spans").collect()}
    assert before == after

    # attribute layout (AttributeIndexJob analog)
    dst2 = str(tmp_path / "attr")
    D.reindex_docs_table(spark, src, dst2, layout="attr:lat")
    in_file_sorted(dst2, "lat")

    # ECQL filter (SchemaCopyJob CQL_IN)
    dst3 = str(tmp_path / "filtered")
    D.reindex_docs_table(
        spark, src, dst3, ecql="BBOX(geom, -30, -30, 30, 30)"
    )
    got = spark.read.parquet(dst3)
    exp = a.filter(
        (F.col("lon") >= -30) & (F.col("lon") <= 30)
        & (F.col("lat") >= -30) & (F.col("lat") <= 30)
    )
    assert got.count() == exp.count() > 0

    # unknown attr column refuses
    import pytest

    with pytest.raises(ValueError):
        D.reindex_docs_table(spark, src, str(tmp_path / "bad"), layout="attr:nope")
