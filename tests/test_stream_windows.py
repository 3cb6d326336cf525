"""Streaming windowed aggregations (availableNow over a file source)."""

import json
import os

from pyspark.sql import types as T

from geomesa_spark.streaming.windows import (
    streaming_density,
    streaming_temporal_density,
)

SCHEMA = T.StructType(
    [
        T.StructField("dtg", T.TimestampType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ]
)


def _feed(dirpath, rows):
    os.makedirs(dirpath, exist_ok=True)
    p = os.path.join(dirpath, "batch.json")
    with open(p + ".tmp", "w") as f:
        for t, lon, lat in rows:
            f.write(json.dumps({"dtg": t, "lon": lon, "lat": lat}) + "\n")
    os.rename(p + ".tmp", p)


ROWS = [
    ("2024-01-01T00:00:10", 1.0, 1.0),
    ("2024-01-01T00:00:20", 2.0, 2.0),
    ("2024-01-01T00:01:10", 3.0, 3.0),
    ("2024-01-01T00:03:30", -50.0, -50.0),
]


def test_streaming_temporal_density(spark, tmp_path):
    src = str(tmp_path / "src")
    _feed(src, ROWS)
    stream = spark.readStream.schema(SCHEMA).json(src)
    out = streaming_temporal_density(stream, window_sec=60)
    q = (
        out.writeStream.format("memory")
        .queryName("td_win")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.start.strftime("%H:%M"): r.n
        for r in spark.sql("select * from td_win").collect()
    }
    assert got == {"00:00": 2, "00:01": 1, "00:03": 1}


def test_streaming_density(spark, tmp_path):
    src = str(tmp_path / "src2")
    _feed(src, ROWS)
    stream = spark.readStream.schema(SCHEMA).json(src)
    out = streaming_density(
        stream, (-180.0, -90.0, 180.0, 90.0), 36, 18, window_sec=3600
    )
    q = (
        out.writeStream.format("memory")
        .queryName("d_win")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.i, r.j): r.n for r in spark.sql("select * from d_win").collect()}
    # lon 1-3 -> i=18, lat 1-3 -> j=9 ; lon -50 -> i=13, lat -50 -> j=4
    assert got == {(18, 9): 3, (13, 4): 1}
