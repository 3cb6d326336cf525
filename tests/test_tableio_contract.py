"""VersionedTableIO CONTRACT suite (VERDICT r4 item 7).

One test matrix, parametrized over every `io=` implementation, so the
Iceberg adapter is verified the day a catalog exists: the `iceberg`
param constructs `IcebergVersionedIO` against catalog name `ice` and
SKIPS (documented) while no Iceberg runtime is configured — configure
`spark.sql.catalog.ice` (org.apache.iceberg.spark.SparkCatalog) and
the identical assertions run against real snapshots.

Contract under test (tableio module docstring):
- write_version commits the FULL keyed state atomically;
- versions() lists committed versions ascending;
- read_version / read_latest(before) resolve exact states, `before`
  exclusive (the at-least-once foreachBatch replay rule);
- torn writes are never observed as versions.
"""

import pytest

from geomesa_spark.sources.tableio import (
    IcebergVersionedIO,
    ParquetVersionedIO,
)


def _rows(io, version):
    return {
        (r.k, r.v) for r in io.read_version(version).collect()
    }


def _latest_rows(io, before=None):
    df = io.read_latest(before=before)
    return None if df is None else {(r.k, r.v) for r in df.collect()}


@pytest.fixture(params=["parquet", "iceberg"])
def io_factory(request, spark, tmp_path):
    """Returns (make(name) -> io, tear(io, version) -> bool).

    `tear` simulates a crashed mid-commit batch; it returns False
    when the implementation has no observable torn state (Iceberg
    snapshots are atomic by design, so there is nothing to tear).
    """
    if request.param == "parquet":

        def make(name):
            return ParquetVersionedIO(spark, str(tmp_path / name))

        def tear(io, version):
            # a crashed write leaves the directory without _SUCCESS
            jvm = spark.sparkContext._jvm
            p = jvm.org.apache.hadoop.fs.Path(
                f"{io.root}/v={version}/_SUCCESS"
            )
            fs = p.getFileSystem(
                spark.sparkContext._jsc.hadoopConfiguration()
            )
            fs.delete(p, False)
            return True

        return make, tear

    if not spark.conf.get("spark.sql.catalog.ice", None):
        pytest.skip(
            "no Iceberg runtime in this sandbox — configure "
            "spark.sql.catalog.ice=org.apache.iceberg.spark.SparkCatalog "
            "and this exact contract matrix runs against "
            "IcebergVersionedIO (snapshot-per-version, VERSION AS OF)"
        )

    def make(name):
        return IcebergVersionedIO(spark, f"ice.contract.{name}")

    def tear(io, version):
        return False  # Iceberg commits are atomic: nothing to tear

    return make, tear


def _state(spark, pairs):
    return spark.createDataFrame(list(pairs), "k long, v string")


def test_empty_store(spark, io_factory):
    make, _ = io_factory
    io = make("empty")
    assert io.versions() == []
    assert io.read_latest() is None
    assert io.read_latest(before=5) is None


def test_versions_ascending_and_roundtrip(spark, io_factory):
    make, _ = io_factory
    io = make("rt")
    # committed out of order: versions() must still be ascending
    io.write_version(_state(spark, [(1, "a"), (2, "b")]), 5)
    io.write_version(_state(spark, [(1, "a0")]), 2)
    io.write_version(_state(spark, [(3, "c"), (4, "d")]), 9)
    assert io.versions() == [2, 5, 9]
    assert _rows(io, 2) == {(1, "a0")}
    assert _rows(io, 5) == {(1, "a"), (2, "b")}
    assert _rows(io, 9) == {(3, "c"), (4, "d")}


def test_read_latest_before_is_exclusive(spark, io_factory):
    """`before` exists because foreachBatch is at-least-once: a
    replayed batch N folds from N's PREDECESSOR, never from what a
    crashed attempt of N itself wrote."""
    make, _ = io_factory
    io = make("before")
    for v in (0, 1, 2):
        io.write_version(_state(spark, [(v, f"s{v}")]), v)
    assert _latest_rows(io) == {(2, "s2")}
    assert _latest_rows(io, before=2) == {(1, "s1")}
    assert _latest_rows(io, before=1) == {(0, "s0")}
    assert _latest_rows(io, before=0) is None


def test_rewrite_same_version_wins(spark, io_factory):
    """A replayed batch overwrites its own version; the retry's
    content is what readers observe, with no duplicate version."""
    make, _ = io_factory
    io = make("retry")
    io.write_version(_state(spark, [(1, "crashed-attempt")]), 3)
    io.write_version(_state(spark, [(1, "retry"), (2, "ok")]), 3)
    assert io.versions() == [3]
    assert _rows(io, 3) == {(1, "retry"), (2, "ok")}


def test_torn_write_never_observed(spark, io_factory):
    make, tear = io_factory
    io = make("torn")
    io.write_version(_state(spark, [(1, "good")]), 0)
    io.write_version(_state(spark, [(1, "torn")]), 1)
    if not tear(io, 1):
        return  # atomic-commit implementation: nothing to tear
    assert io.versions() == [0]
    assert _latest_rows(io) == {(1, "good")}
    assert _latest_rows(io, before=2) == {(1, "good")}
