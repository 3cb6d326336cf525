"""Analytics operators vs numpy/pandas oracles (density grids, time
series, BIN byte layout — the reference's iterator-test style,
DensityIteratorTest / TemporalDensityIteratorTest /
BinAggregatingIteratorTest analogs)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators import analytics as A
from geomesa_spark.sources import docs as D


@pytest.fixture(scope="module")
def enriched(spark):
    df = D.extract_geometry(D.synth_docs(spark, 3000, partitions=4)).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def pdf(enriched):
    return enriched.select("doc_id", "lon", "lat", "dtg").toPandas()


def test_density_matches_numpy(enriched, pdf):
    bbox = (-180.0, -90.0, 180.0, 90.0)
    W, H = 36, 18
    out = A.density(enriched, bbox, W, H).toPandas()
    i = np.clip(np.floor((pdf.lon.values + 180.0) / 10.0), 0, W - 1).astype(int)
    j = np.clip(np.floor((pdf.lat.values + 90.0) / 10.0), 0, H - 1).astype(int)
    exp = pd.DataFrame({"i": i, "j": j}).groupby(["i", "j"]).size()
    got = out.set_index(["i", "j"])["weight"]
    assert got.sort_index().to_dict() == exp.sort_index().to_dict()
    assert got.sum() == len(pdf)


def test_temporal_density(enriched, pdf):
    out = A.temporal_density(enriched, D.T0_EPOCH, D.T1_EPOCH + 1, 24).toPandas()
    es = pdf.dtg.astype("int64") // 10**9
    b = ((es - D.T0_EPOCH) * 24 // (D.T1_EPOCH + 1 - D.T0_EPOCH)).astype(int)
    exp = b.value_counts().sort_index()
    got = out.set_index("bucket")["n"].sort_index()
    assert got.to_dict() == exp.to_dict()


def test_unique_values(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"v": ["a", "b", "a", "c", "a", "b"]})
    )
    out = A.unique_values(df, "v", sort_by="n", descending=True).toPandas()
    assert out.iloc[0].to_list() == ["a", 3]
    assert set(out.value) == {"a", "b", "c"}


def test_map_aggregate(spark):
    df = spark.createDataFrame(
        [({"a": 1, "b": 2},), ({"a": 5, "c": 7},)], ["m"]
    )
    out = {r.key: r.total for r in A.map_aggregate(df, "m").collect()}
    assert out == {"a": 6, "b": 2, "c": 7}
    merged = A.map_aggregate_as_map(df, "m").collect()[0].merged
    assert merged == {"a": 6, "b": 2, "c": 7}


def test_bin_export_byte_layout(spark):
    pdf_in = pd.DataFrame(
        {
            "track": ["t1", "t1", "t2"],
            "dtg": pd.to_datetime(
                ["2010-05-07 10:00:00", "2010-05-07 09:00:00", "2010-05-07 11:00:00"],
                utc=True,
            ),
            "lon": [40.0, 41.0, 42.0],
            "lat": [6.0, 7.0, 8.0],
        }
    )
    df = spark.createDataFrame(pdf_in).coalesce(1)
    chunks = [r.chunk for r in A.bin_export(df, "track").collect()]
    dec = A.bin_decode(chunks)
    assert len(dec) == 3
    # 16-byte records, little-endian: verify against manual pack
    assert len(chunks[0]) == 3 * 16
    # within-chunk sort by secs (BinSorter parity)
    assert list(dec.secs) == sorted(dec.secs)
    assert set(dec.lon.astype(float).round(1)) == {40.0, 41.0, 42.0}
    # labeled variant = 24 bytes
    df2 = df.withColumn("lbl", F.lit(9).cast("long"))
    chunks2 = [r.chunk for r in A.bin_export(df2, "track", label_col="lbl").collect()]
    dec2 = A.bin_decode(chunks2, labeled=True)
    assert len(chunks2[0]) == 3 * 24
    assert (dec2.label == 9).all()


def test_point2point(spark):
    pdf_in = pd.DataFrame(
        {
            "track": ["a", "a", "a", "b"],
            "dtg": pd.to_datetime(
                ["2010-01-01", "2010-01-02", "2010-01-03", "2010-01-01"], utc=True
            ),
            "lon": [0.0, 1.0, 2.0, 5.0],
            "lat": [0.0, 1.0, 2.0, 5.0],
        }
    )
    df = spark.createDataFrame(pdf_in)
    out = A.point2point(df, "track").toPandas()
    a = out[out.group == "a"].sort_values("t1")
    assert len(a) == 2 and len(out) == 2  # track b has no pair
    assert a.iloc[0][["x1", "y1", "x2", "y2"]].to_list() == [0.0, 0.0, 1.0, 1.0]


def test_count_by_day(enriched, pdf):
    out = A.count_by_day(enriched).toPandas()
    exp = pdf.dtg.dt.strftime("%Y%m%d").value_counts()
    got = out.set_index("day")["n"]
    assert got.to_dict() == exp.to_dict()


def test_histogram_job_semantics(spark):
    import pytest
    from pyspark.sql import functions as F

    rows = [
        # (city, kind, user)
        ("nyc", "click", "u1"),
        ("nyc", "click", "u1"),   # same user: collapses under unique_by
        ("nyc", "click", "u2"),
        ("nyc", "view", "u1"),
        ("sf", "click", "u3"),
        ("sf", None, "u4"),       # null attribute -> 'null'
        ("sf", "", "u5"),         # empty attribute -> 'null'
        (None, "view", "u6"),     # null group -> 'null'
    ]
    df = spark.createDataFrame(rows, "city string, kind string, user string")

    # plain histogram: counts rows
    plain = {
        (r.city, r.kind): r["count"]
        for r in A.histogram_job(df, "kind", group_by=["city"]).collect()
    }
    assert plain[("nyc", "click")] == 3
    assert plain[("sf", "null")] == 2        # null + '' merge as 'null'
    assert plain[("null", "view")] == 1

    # unique_by: distinct users per (city, kind)
    uniq = {
        (r.city, r.kind): r["count"]
        for r in A.histogram_job(
            df, "kind", group_by=["city"], unique_by=["user"]
        ).collect()
    }
    assert uniq[("nyc", "click")] == 2       # u1 deduped

    # transforms + where compose
    t = {
        (r.up, r.kind): r["count"]
        for r in A.histogram_job(
            df,
            "kind",
            group_by=["up"],
            transforms={"up": F.upper("city")},
            where=F.col("kind") == "click",
        ).collect()
    }
    assert t[("NYC", "click")] == 3 and ("SF", "view") not in t

    # the reference's 8-attribute tuple bound (HistogramJob.scala:68)
    with pytest.raises(ValueError):
        A.histogram_job(df, "kind", group_by=["a"] * 5, unique_by=["b"] * 4)


# --- HyperLogLog ---


def _py_hll(values, p):
    import hashlib
    import math

    m = 1 << p
    rem_bits = 60 - p
    max_rank = rem_bits + 1
    regs = {}
    for x in values:
        v = int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)
        b = v >> rem_bits
        rem = v % (1 << rem_bits)
        rank = max_rank - rem.bit_length()
        regs[b] = max(regs.get(b, 0), rank)
    s = sum(1 << (max_rank - r) for r in regs.values())
    zeros = m - len(regs)
    s += zeros * (1 << max_rank)
    from geomesa_spark.operators.analytics import _hll_alpha

    raw = _hll_alpha(m) * m * m * float(1 << max_rank) / float(s)
    if zeros > 0 and raw <= 2.5 * m:
        return m * math.log(m / zeros), len(regs), s, zeros
    return raw, len(regs), s, zeros


def test_hll_matches_python_oracle(spark):
    from geomesa_spark.operators.analytics import hll_distinct

    vals = [f"user{i % 1377}" for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "u string")
    for p in (6, 12):
        r = hll_distinct(df, "u", p=p).collect()[0]
        est, nreg, s, zeros = _py_hll(set(vals), p)
        assert r.n_registers == nreg and r.sum_units == s
        assert r.zero_registers == zeros
        assert r.approx_distinct == pytest.approx(est, rel=1e-12)


def test_hll_accuracy_and_grouping(spark):
    from geomesa_spark.operators.analytics import hll_distinct

    rows = [(i % 3, f"v{(i * 2654435761) % (1000 * (1 + i % 3))}")
            for i in range(60000)]
    df = spark.createDataFrame(rows, "g int, u string")
    out = {r.g: r.approx_distinct for r in
           hll_distinct(df, "u", p=12, group_by=["g"]).collect()}
    exact = {g: len({u for gg, u in rows if gg == g}) for g in (0, 1, 2)}
    for g in (0, 1, 2):
        assert abs(out[g] - exact[g]) / exact[g] < 0.1, (g, out[g], exact[g])


def test_hll_partitioning_invariant(spark):
    """The sketch is deterministic under ANY partitioning — integer
    register math, no float-order dependence."""
    from geomesa_spark.operators.analytics import hll_distinct

    rows = [(f"x{i}",) for i in range(4000)]
    a = hll_distinct(
        spark.createDataFrame(rows, "u string").repartition(1), "u"
    ).collect()[0]
    b = hll_distinct(
        spark.createDataFrame(rows, "u string").repartition(37), "u"
    ).collect()[0]
    assert (a.approx_distinct, a.sum_units) == (b.approx_distinct, b.sum_units)


def test_hll_all_null_group_reports_zero(spark):
    """countDistinct semantics: a group whose values are all NULL
    appears with estimate 0.0, not silently missing (review fix)."""
    from geomesa_spark.operators.analytics import hll_distinct

    rows = [("a", f"v{i}") for i in range(200)] + [("b", None)] * 50
    df = spark.createDataFrame(rows, "g string, u string")
    out = {r.g: r for r in hll_distinct(df, "u", p=4, group_by=["g"]).collect()}
    assert set(out) == {"a", "b"}
    assert out["b"].approx_distinct == 0.0
    assert out["b"].n_registers == 0 and out["b"].zero_registers == 16
    assert abs(out["a"].approx_distinct - 200) / 200 < 0.5  # p=4: coarse


def test_cm_sketch_overestimates_and_lookup(spark):
    """Count-Min invariants: every point estimate >= the true count;
    with width >> cardinality most estimates are exact; the lookup
    returns 0-floored minima for values never inserted."""
    from geomesa_spark.operators.analytics import cm_lookup, cm_sketch

    rng = __import__("numpy").random.default_rng(5)
    vocab = [f"w{i}" for i in range(50)]
    # zipf-ish: w0 heaviest
    vals = [vocab[min(int(rng.exponential(8)), 49)] for _ in range(5000)]
    true = {}
    for v in vals:
        true[v] = true.get(v, 0) + 1
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    sk = cm_sketch(df, "t", depth=4, width=256)
    est = {
        r.val: r.est
        for r in cm_lookup(
            sk, spark.createDataFrame([(v,) for v in vocab], "t string"),
            "t", depth=4, width=256,
        ).collect()
    }
    assert set(est) == set(vocab)
    exact = 0
    for v, t in true.items():
        assert est[v] >= t, v  # CM never undercounts
        exact += est[v] == t
    assert exact >= 0.9 * len(true)  # width 256 >> 50 distinct
    for v in vocab:
        if v not in true:
            assert est[v] >= 0


def test_cm_sketch_merge_and_weighted(spark):
    """Sketches over two halves union+re-aggregate to the whole-corpus
    sketch (mergeability — the distributed-ingest property), and
    weight_col sums weights instead of counting rows."""
    import pyspark.sql.functions as F

    from geomesa_spark.operators.analytics import cm_sketch

    rows = [(i, f"k{i % 7}", i % 3 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "i long, t string, w int")
    whole = {(r.r, r.bucket): r.cnt for r in cm_sketch(df, "t", 3, 64).collect()}
    h1 = cm_sketch(df.where("i < 200"), "t", 3, 64)
    h2 = cm_sketch(df.where("i >= 200"), "t", 3, 64)
    merged = {
        (r.r, r.bucket): r.cnt
        for r in h1.unionByName(h2)
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert merged == whole

    wsk = {
        (r.r, r.bucket): r.cnt
        for r in cm_sketch(df, "t", 3, 64, weight_col="w").collect()
    }
    # weighted counts: same buckets, each cnt = sum of weights there
    assert set(wsk) == set(whole)
    assert sum(wsk.values()) == 3 * sum(w for _, _, w in rows)


def test_bloom_no_false_negatives_and_prunes(spark):
    """Bloom invariants: every inserted value probes true (no false
    negatives, the guarantee pruning relies on); most absent values
    probe false at a low load factor; filters over disjoint batches
    merge by union+distinct to the whole-set filter."""
    from geomesa_spark.operators.analytics import bloom_build, bloom_probe

    members = [(i, f"in{i}") for i in range(500)]
    others = [(1000 + i, f"out{i}") for i in range(500)]
    mdf = spark.createDataFrame(members, "id long, v string")
    bloom = bloom_build(mdf, "v", n_bits=1 << 14, n_hashes=5)

    probed = {
        r.id: r.might_contain
        for r in bloom_probe(
            bloom,
            spark.createDataFrame(members + others, "id long, v string"),
            "v", "id", n_bits=1 << 14, n_hashes=5,
        ).collect()
    }
    assert all(probed[i] for i, _ in members)  # no false negatives
    fp = sum(probed[i] for i, _ in others)
    assert fp < 25  # ~0.2% expected at this load; 5% is generous

    merged = (
        bloom_build(mdf.where("id < 250"), "v", 1 << 14, 5)
        .unionByName(bloom_build(mdf.where("id >= 250"), "v", 1 << 14, 5))
        .distinct()
    )
    assert sorted(r.bit for r in merged.collect()) == sorted(
        r.bit for r in bloom.collect()
    )
