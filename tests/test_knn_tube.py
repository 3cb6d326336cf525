"""kNN + tube-select correctness vs brute-force oracles (reference
golden-result style: process tests under test/resources/process/knn,
tubeselect)."""

import numpy as np
import pandas as pd
import pytest

from geomesa_spark.operators import knn as K
from geomesa_spark.operators import tube as TU
from geomesa_spark.sources import docs as D


@pytest.fixture(scope="module")
def enriched(spark):
    df = D.extract_geometry(D.synth_docs(spark, 3000, partitions=4)).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def pdf(enriched):
    return enriched.select("doc_id", "lon", "lat", "dtg").toPandas()


def _brute_knn(pdf, qlon, qlat, k):
    d2 = (pdf.lon.values - qlon) ** 2 + (pdf.lat.values - qlat) ** 2
    order = np.lexsort((pdf.lat.values, pdf.lon.values, d2))
    return [pdf.doc_id.values[i] for i in order[:k]]


def test_knn_matches_bruteforce(enriched, pdf):
    queries = [
        ("q_city", -73.98, 40.75),   # dense cluster: converges round 1
        ("q_ocean", -140.0, -40.0),  # sparse: forces ring expansion
        ("q_paris", 2.35, 48.86),
    ]
    k = 10
    out = K.knn_join(enriched, queries, k=k).select("qid", "doc_id", "rank").toPandas()
    for qid, qlon, qlat in queries:
        got = out[out.qid == qid].sort_values("rank").doc_id.to_list()
        exp = _brute_knn(pdf, qlon, qlat, k)
        assert got == exp, f"{qid}: {got} != {exp}"


def test_knn_k_larger_than_matches(spark):
    small = D.extract_geometry(D.synth_docs(spark, 20, partitions=2))
    out = K.knn_join(small, [("q", 0.0, 0.0)], k=50).toPandas()
    assert len(out) == 20  # returns all available


def test_tube_select_matches_bruteforce(enriched, pdf):
    # track crossing the NYC cluster
    track = [
        (D.T0_EPOCH + 3 * 86400, -75.0, 40.0),
        (D.T0_EPOCH + 4 * 86400, -73.5, 41.0),
        (D.T0_EPOCH + 5 * 86400, -72.0, 41.5),
    ]
    buf = 0.8
    delta = 2 * 86400
    out = TU.tube_select(enriched, track, buf, delta)
    got = {r.doc_id for r in out.select("doc_id").collect()}

    # oracle: point within buf of ANY segment with time in that
    # segment's [ts1-delta, ts2+delta]
    es = (pdf.dtg.astype("int64") // 10**9).values
    exp = set()
    for (t1, x1, y1), (t2, x2, y2) in zip(track, track[1:]):
        dx, dy = x2 - x1, y2 - y1
        ln2 = dx * dx + dy * dy
        t = np.clip(((pdf.lon.values - x1) * dx + (pdf.lat.values - y1) * dy) / ln2, 0, 1)
        d2 = (pdf.lon.values - (x1 + t * dx)) ** 2 + (pdf.lat.values - (y1 + t * dy)) ** 2
        m = (d2 <= buf * buf) & (es >= t1 - delta) & (es <= t2 + delta)
        exp.update(pdf.doc_id.values[m])
    assert got == exp


def test_tube_nofill(enriched, pdf):
    track = [(D.T0_EPOCH + 86400, -73.98, 40.75)]
    out = TU.tube_select(enriched, track, 0.5, 86400, gap_fill="nofill")
    got = {r.doc_id for r in out.select("doc_id").collect()}
    es = (pdf.dtg.astype("int64") // 10**9).values
    d2 = (pdf.lon.values + 73.98) ** 2 + (pdf.lat.values - 40.75) ** 2
    m = (d2 <= 0.25) & (np.abs(es - (D.T0_EPOCH + 86400)) <= 86400)
    assert got == set(pdf.doc_id.values[m])


def test_knn_join_df_matches_bruteforce(spark):
    """DataFrame-native kNN join vs brute force, including IDL-wrap
    and polar queries and a query set larger than the driver-list
    API was designed for."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from geomesa_spark.functions import cells as C
    from geomesa_spark.operators.knn import knn_join_df

    rng = np.random.default_rng(42)
    n = 3000
    pdf = pd.DataFrame(
        {
            "doc_id": [f"p{i}" for i in range(n)],
            "lon": rng.uniform(-180, 180, n),
            "lat": rng.uniform(-90, 90, n),
        }
    )
    pts = spark.createDataFrame(pdf).withColumn(
        "cell", C.z2_cell(F.col("lon"), F.col("lat"))
    )
    qpdf = pd.DataFrame(
        {
            "qid": [f"q{i}" for i in range(120)],
            "qlon": list(rng.uniform(-180, 180, 117)) + [179.9, -179.9, 0.0],
            "qlat": list(rng.uniform(-90, 90, 117)) + [0.0, 0.0, 89.9],
        }
    )
    out = knn_join_df(
        pts, spark.createDataFrame(qpdf), 7, tiebreak_col="doc_id"
    )
    got = {}
    for r in out.collect():
        got.setdefault(r.qid, []).append((r.rank, r.doc_id))
    assert len(got) == 120
    for _, q in qpdf.iterrows():
        d2 = (pdf.lon - q.qlon) ** 2 + (pdf.lat - q.qlat) ** 2
        exp = list(
            pdf.assign(d=d2)
            .sort_values(["d", "lon", "lat", "doc_id"])
            .head(7)
            .doc_id
        )
        assert [d for _, d in sorted(got[q.qid])] == exp, q.qid


def test_knn_join_df_fewer_than_k(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from geomesa_spark.functions import cells as C
    from geomesa_spark.operators.knn import knn_join_df

    pts = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b"], "lon": [0.0, 10.0], "lat": [0.0, 5.0]})
    ).withColumn("cell", C.z2_cell(F.col("lon"), F.col("lat")))
    qs = spark.createDataFrame(
        pd.DataFrame({"qid": ["q"], "qlon": [1.0], "qlat": [1.0]})
    )
    rows = knn_join_df(pts, qs, 5, tiebreak_col="doc_id").collect()
    assert {r.doc_id for r in rows} == {"a", "b"}


def test_tube_empty_track(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from geomesa_spark.functions import cells as C
    from geomesa_spark.operators.tube import tube_select

    pts = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": ["a"], "lon": [0.0], "lat": [0.0],
            "dtg": [pd.Timestamp("2024-01-01")],
        })
    ).withColumn("cell", C.z2_cell(F.col("lon"), F.col("lat")))
    assert tube_select(pts, [], 1.0, 60).count() == 0


def test_tube_meters_buffer(spark):
    """Meters buffer converts at the track centroid latitude
    (TubeBuilder.scala:50-60 rule, poleward-conservative) — results
    equal the degree-space tube at the converted buffer."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from geomesa_spark.functions import cells as C
    from geomesa_spark.functions import geometry as G
    from geomesa_spark.operators.tube import tube_select

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "doc_id": [f"p{i}" for i in range(800)],
        "lon": rng.uniform(-20, 40, 800),
        "lat": rng.uniform(30, 70, 800),
        "dtg": pd.to_datetime(
            rng.integers(1704067200, 1706659200, 800), unit="s", utc=True
        ),
    })
    pts = spark.createDataFrame(pdf).withColumn(
        "cell", C.z2_cell(F.col("lon"), F.col("lat"))
    )
    track = [(1704672000, 2.0, 48.0), (1705276800, 10.0, 52.0)]
    M = 300_000.0
    got = {r.doc_id for r in tube_select(
        pts, track, M, 172800, gap_fill="line", buffer_in_meters=True
    ).collect()}
    # single-step at the centroid latitude: TubeBuilder.scala:50-60
    # parity (the converted value IS the tube's match radius)
    c_lat = (48.0 + 52.0) / 2
    deg = G.meters_to_degrees(M, c_lat)
    exp = {r.doc_id for r in tube_select(
        pts, track, deg, 172800, gap_fill="line"
    ).collect()}
    assert got == exp and got


def test_knn_join_df_empty_queries(spark):
    """An empty query set returns an empty, correctly-schemed result
    instead of IndexError (ADVICE r2, knn.py:361)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from geomesa_spark.functions import cells as C
    from geomesa_spark.operators import knn as K

    pts = (
        spark.createDataFrame(
            pd.DataFrame(
                [(f"p{i}", float(i), float(i)) for i in range(20)],
                columns=["doc_id", "lon", "lat"],
            )
        )
        .withColumn("cell", C.z2_cell(F.col("lon"), F.col("lat")))
    )
    queries = spark.createDataFrame(
        pd.DataFrame([], columns=["qid", "qlon", "qlat"]),
        "qid string, qlon double, qlat double",
    )
    out = K.knn_join_df(pts, queries, k=3)
    assert out.count() == 0
    assert {"qid", "dist2", "rank", "doc_id"} <= set(out.columns)


def test_tube_crosses_antimeridian(spark):
    """Join-family review regression: a track segment crossing the
    IDL was treated as a world-spanning planar segment — matching
    points near lon 0 (~20,000 km off track) and missing true
    matches across the seam. Segments now split at ±180."""
    import pandas as pd
    from pyspark.sql import functions as F

    from geomesa_spark.functions import cells as C
    from geomesa_spark.operators.tube import tube_select

    pdf = pd.DataFrame({
        "doc_id": ["east", "west", "equator_far"],
        "lon": [179.85, -179.85, 0.0],
        "lat": [0.0, 0.05, 0.0],
        "dtg": pd.to_datetime([1704672000 + 100] * 3, unit="s", utc=True),
    })
    pts = spark.createDataFrame(pdf).withColumn(
        "cell", C.z2_cell(F.col("lon"), F.col("lat"))
    )
    track = [(1704672000, 179.8, 0.0), (1704672200, -179.8, 0.1)]
    got = {r.doc_id for r in tube_select(
        pts, track, 0.3, 3600, gap_fill="line"
    ).collect()}
    assert got == {"east", "west"}


def test_tube_gap_fill_validated(spark):
    import pandas as pd
    import pytest as _pytest
    from pyspark.sql import functions as F

    from geomesa_spark.functions import cells as C
    from geomesa_spark.operators.tube import tube_select

    pts = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a"], "lon": [0.0], "lat": [0.0],
                      "dtg": pd.to_datetime([0], unit="s", utc=True)})
    ).withColumn("cell", C.z2_cell(F.col("lon"), F.col("lat")))
    with _pytest.raises(ValueError, match="gap_fill"):
        tube_select(pts, [(0, 0.0, 0.0)], 1.0, 60, gap_fill="LINE")
