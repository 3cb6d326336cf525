"""Version compaction + history truncation for versioned parquet
dirs — including crash-recovery resume from a committed staging dir."""

import pytest

from geomesa_spark.sources.tableio import (
    ParquetVersionedIO,
    compact_versions,
    truncate_history,
)


def _mk(spark, root, versions):
    io = ParquetVersionedIO(spark, root)
    for v, rows in versions.items():
        io.write_version(
            spark.createDataFrame(rows, "fp string, val long"), v
        )
    return io


def test_compact_merges_into_top_slot(spark, tmp_path):
    io = _mk(spark, str(tmp_path / "acc"), {
        0: [("a", 1), ("b", 2)],
        1: [("c", 3)],
        4: [("d", 4)],
    })
    assert compact_versions(io) == 4
    assert io.versions() == [4]
    got = {r["fp"]: r["val"] for r in io.read_version(4).collect()}
    assert got == {"a": 1, "b": 2, "c": 3, "d": 4}


def test_compact_upto_keeps_later_versions(spark, tmp_path):
    io = _mk(spark, str(tmp_path / "acc"), {
        0: [("a", 1)], 1: [("b", 2)], 2: [("c", 3)],
    })
    assert compact_versions(io, upto=1) == 1
    assert io.versions() == [1, 2]
    merged = {r["fp"] for r in io.read_version(1).collect()}
    assert merged == {"a", "b"}
    assert {r["fp"] for r in io.read_version(2).collect()} == {"c"}


def test_compact_noop_cases(spark, tmp_path):
    empty = ParquetVersionedIO(spark, str(tmp_path / "none"))
    assert compact_versions(empty) is None
    one = _mk(spark, str(tmp_path / "one"), {3: [("a", 1)]})
    assert compact_versions(one) == 3
    assert one.versions() == [3]


def test_compact_resumes_from_committed_staging(spark, tmp_path):
    """Simulated crash between steps 2 and 3: inputs deleted, staging
    committed but not yet swapped — the next call must recover every
    row from staging."""
    root = str(tmp_path / "acc")
    io = _mk(spark, root, {0: [("a", 1)], 1: [("b", 2)]})
    # step 1 by hand: committed staging targeting slot 1
    union = io.read_version(0).unionByName(io.read_version(1))
    union.write.mode("overwrite").parquet(f"{root}/compact_tmp_1")
    # step 2 by hand: inputs gone
    jvm, _, fs = io._fs()
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/v=0"), True)
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/v=1"), True)
    assert io.versions() == []
    assert compact_versions(io) == 1
    got = {r["fp"]: r["val"] for r in io.read_version(1).collect()}
    assert got == {"a": 1, "b": 2}


def test_compact_discards_torn_staging(spark, tmp_path):
    root = str(tmp_path / "acc")
    io = _mk(spark, root, {0: [("a", 1)], 1: [("b", 2)]})
    # a torn step-1 write: staging dir without _SUCCESS
    io.read_version(0).write.mode("overwrite").parquet(
        f"{root}/compact_tmp_9"
    )
    jvm, _, fs = io._fs()
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/compact_tmp_9/_SUCCESS"), True)
    assert compact_versions(io) == 1
    assert io.versions() == [1]
    got = {r["fp"]: r["val"] for r in io.read_version(1).collect()}
    assert got == {"a": 1, "b": 2}  # torn dir ignored, not resurrected


def test_compact_preserves_read_accepted(spark, tmp_path):
    """End-to-end with the ingest pipeline's reader: compaction must
    be invisible to read_accepted."""
    from geomesa_spark.streaming import read_accepted

    root = str(tmp_path / "acc")
    io = _mk(spark, root, {
        0: [("a", 1)], 1: [("b", 2)], 2: [("c", 3)],
    })
    before = {(r["fp"], r["val"]) for r in read_accepted(spark, root).collect()}
    compact_versions(io)
    after = {(r["fp"], r["val"]) for r in read_accepted(spark, root).collect()}
    assert before == after


def test_truncate_history(spark, tmp_path):
    io = _mk(spark, str(tmp_path / "state"), {
        0: [("a", 1)], 1: [("a", 2)], 2: [("a", 3)],
    })
    assert truncate_history(io, keep_last=1) == [0, 1]
    assert io.versions() == [2]
    assert io.read_latest().collect()[0]["val"] == 3
    assert truncate_history(io, keep_last=5) == []
    with pytest.raises(ValueError):
        truncate_history(io, keep_last=0)
