"""Deterministic sampling + sessionization (operators/sample)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.sample import (
    hash_sample,
    sessionize,
    stratified_sample,
)


def _docs(spark, n=4000, parts=4):
    rows = [(i, ["en", "fr", "de", "zz"][i % 4]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string").repartition(
        parts
    )


def test_hash_sample_deterministic_and_layout_independent(spark):
    a = set(
        hash_sample(_docs(spark, parts=2), "doc_id", 0.3)
        .toPandas()["doc_id"]
    )
    b = set(
        hash_sample(_docs(spark, parts=13), "doc_id", 0.3)
        .toPandas()["doc_id"]
    )
    assert a == b and len(a) > 0
    # roughly the requested fraction (binomial, 4k draws)
    assert abs(len(a) / 4000 - 0.3) < 0.03
    # nested fractions: the 10% sample is a subset of the 30% sample
    c = set(
        hash_sample(_docs(spark), "doc_id", 0.1).toPandas()["doc_id"]
    )
    assert c <= a
    # different salt -> different (independent) selection
    d = set(
        hash_sample(_docs(spark), "doc_id", 0.3, salt="v2")
        .toPandas()["doc_id"]
    )
    assert d != a


def test_hash_sample_bounds(spark):
    df = _docs(spark, 100)
    assert hash_sample(df, "doc_id", 0.0).count() == 0
    assert hash_sample(df, "doc_id", 1.0).count() == 100
    with pytest.raises(ValueError):
        hash_sample(df, "doc_id", 1.5)


def test_stratified_exact_quota_and_determinism(spark):
    got = stratified_sample(
        _docs(spark), "doc_id", "lang", quota=40
    ).toPandas()
    assert got.groupby("lang").size().tolist() == [40, 40, 40, 40]
    again = stratified_sample(
        _docs(spark, parts=17), "doc_id", "lang", quota=40
    ).toPandas()
    assert set(map(tuple, got.values.tolist())) == set(
        map(tuple, again.values.tolist())
    )


def test_stratified_small_stratum_keeps_all(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "fr")], "doc_id long, lang string"
    )
    got = stratified_sample(df, "doc_id", "lang", quota=10).toPandas()
    assert len(got) == 3
    with pytest.raises(ValueError):
        stratified_sample(df, "doc_id", "lang", quota=0)


def test_stratified_null_keys_rank_last(spark):
    """NULL keys hash to NULL buckets; they must not hog the quota."""
    rows = [(None, "en")] * 5 + [(float(i), "en") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id double, lang string")
    got = stratified_sample(df, "doc_id", "lang", quota=10).toPandas()
    assert got["doc_id"].notna().all()


def test_sessionize_vs_pandas_oracle(spark):
    rng = np.random.default_rng(3)
    n = 3000
    users = rng.integers(0, 50, n)
    ts = np.sort(rng.integers(0, 500_000, n))
    pdf = pd.DataFrame(
        {"eid": np.arange(n), "user_id": users,
         "ts": pd.to_datetime(ts, unit="s", utc=True)}
    )
    df = spark.createDataFrame(pdf)
    got = (
        sessionize(df, "user_id", "ts", gap_seconds=3600)
        .orderBy("eid")
        .toPandas()
    )
    # pandas oracle
    o = pdf.sort_values(["user_id", "ts"]).copy()
    gap = o.groupby("user_id")["ts"].diff().dt.total_seconds()
    o["session_id"] = (
        (gap.isna() | (gap > 3600)).astype(int).groupby(o["user_id"]).cumsum()
    )
    exp = o.sort_values("eid")["session_id"].values
    assert (got["session_id"].values == exp).all()


def test_sessionize_gap_boundary_is_same_session(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 3600), (3, 7201)], "eid long, es long"
    ).select("eid", F.to_timestamp(F.col("es").cast("timestamp")).alias("ts"),
             F.lit(7).alias("user_id"))
    got = (
        sessionize(df, "user_id", "ts", gap_seconds=3600)
        .orderBy("eid").toPandas()["session_id"].tolist()
    )
    # gap == 3600 stays (strict >); 3601 starts a new session
    assert got == [1, 1, 2]
    with pytest.raises(ValueError):
        sessionize(df, "user_id", "ts", gap_seconds=0)


def test_no_single_partition_and_no_python(spark):
    df = _docs(spark, 500)
    for out in (
        hash_sample(df, "doc_id", 0.5),
        stratified_sample(df, "doc_id", "lang", quota=5),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
        assert "Python" not in plan and "Arrow" not in plan


def test_mixture_sample_recipe_and_nesting(spark):
    from geomesa_spark.operators.sample import (
        HASH_BUCKETS,
        mixture_sample,
        sample_hash,
    )

    docs = _docs(spark, 4000)  # 1000 per lang en/fr/de/zz
    weights = {"en": 3, "fr": 1}
    out = mixture_sample(docs, "doc_id", "lang", weights, total=400).toPandas()
    # unlisted domains are dropped
    assert set(out["lang"]) <= {"en", "fr"}
    # achieved counts are binomial around the integer-cut targets
    got = out.groupby("lang")["doc_id"].count()
    assert abs(got.get("en", 0) - 300) < 60 and abs(got.get("fr", 0) - 100) < 40
    # selection is exactly the hash filter at the integer cuts the
    # docstring promises (python recomputation)
    cut = {
        "en": (HASH_BUCKETS * 400 * 3) // (4 * 1000),
        "fr": (HASH_BUCKETS * 400 * 1) // (4 * 1000),
    }
    buckets = (
        docs.select("doc_id", "lang", sample_hash(F.col("doc_id")).alias("b"))
        .toPandas()
        .set_index("doc_id")
    )
    expect = {
        i
        for i, r in buckets.iterrows()
        if r["lang"] in cut and r["b"] < cut[r["lang"]]
    }
    assert set(out["doc_id"]) == expect
    # nested: a smaller total selects a subset of a larger one
    small = mixture_sample(docs, "doc_id", "lang", weights, total=100).toPandas()
    assert set(small["doc_id"]) <= set(out["doc_id"])
    # layout independence
    relaid = mixture_sample(
        _docs(spark, 4000, parts=13), "doc_id", "lang", weights, total=400
    ).toPandas()
    assert set(relaid["doc_id"]) == set(out["doc_id"])


def test_mixture_sample_saturates_small_domain(spark):
    from geomesa_spark.operators.sample import mixture_sample

    # fr has 1000 rows but its target is 5000 -> keep ALL fr rows
    docs = _docs(spark, 4000)
    out = (
        mixture_sample(docs, "doc_id", "lang", {"fr": 1}, total=5000)
        .toPandas()
    )
    assert len(out) == 1000 and set(out["lang"]) == {"fr"}


def test_mixture_sample_validation(spark):
    from geomesa_spark.operators.sample import mixture_sample

    docs = _docs(spark, 40)
    with pytest.raises(ValueError):
        mixture_sample(docs, "doc_id", "lang", {"en": 1}, total=0)
    with pytest.raises(ValueError):
        mixture_sample(docs, "doc_id", "lang", {}, total=10)
    with pytest.raises(ValueError):
        mixture_sample(docs, "doc_id", "lang", {"en": 0}, total=10)
    # a weights-only domain with zero rows yields an empty frame, not
    # a divide-by-zero
    assert (
        mixture_sample(docs, "doc_id", "lang", {"nope": 1}, total=10).count()
        == 0
    )


# --- epoch_shuffle -------------------------------------------------------


def _epoch_oracle(n, seed, n_shards):
    """Python twin: md5 bucket, contiguous shard ranges, in-shard
    order by (bucket, key)."""
    import hashlib

    rows = []
    for i in range(n):
        b = int(
            hashlib.md5(f"epoch{seed}:{i}".encode()).hexdigest()[:8], 16
        ) % 1_000_000
        rows.append((i, b, (b * n_shards) // 1_000_000))
    out = {}
    for shard in range(n_shards):
        members = sorted(
            [(b, i) for i, b, s in rows if s == shard]
        )
        for pos, (_, i) in enumerate(members, start=1):
            out[i] = (shard, pos)
    return out


def test_epoch_shuffle_matches_oracle_and_layouts(spark):
    from geomesa_spark.operators.sample import epoch_shuffle

    want = _epoch_oracle(4000, seed=7, n_shards=8)
    for parts in (3, 11):
        got = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in epoch_shuffle(
                _docs(spark, parts=parts), "doc_id", seed=7, n_shards=8
            ).collect()
        }
        assert got == want


def test_epoch_shuffle_seeds_independent_and_no_single_partition(spark):
    from geomesa_spark.operators.sample import epoch_shuffle

    d = _docs(spark, n=2000)
    a = epoch_shuffle(d, "doc_id", seed=1, n_shards=4)
    b = epoch_shuffle(d, "doc_id", seed=2, n_shards=4)
    pa = {r["doc_id"]: (r["shard"], r["pos"]) for r in a.collect()}
    pb = {r["doc_id"]: (r["shard"], r["pos"]) for r in b.collect()}
    assert pa != pb  # fresh permutation per epoch
    # every shard is a contiguous hash range covering all rows exactly once
    assert sorted(pa) == list(range(2000))
    # the per-shard window never collapses to a single partition
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan

    with pytest.raises(ValueError):
        epoch_shuffle(d, "doc_id", seed=1, n_shards=0)


def test_priority_sample_ht_estimator_and_determinism(spark):
    """DLT invariants: (1) layout-independent sample; (2) when the
    population fits in k, everything is kept with est = w*1e6;
    (3) the HT estimate is unbiased: one draw lands within a few
    sigma (rel std ~6% here — numpy-simulated; salt "" sits at -17%,
    2.8 sigma) and the 4-salt mean tightens toward the true total;
    (4) every est >= its own w*1e6 (tau floors, never shrinks)."""
    from geomesa_spark.operators.sample import priority_sample

    rng = np.random.default_rng(9)
    rows = [(i, int(rng.integers(1, 500))) for i in range(2000)]
    total = sum(w for _, w in rows)
    df = spark.createDataFrame(rows, "doc_id long, wt int")

    a = priority_sample(df.repartition(1), "doc_id", "wt", 200).collect()
    b = priority_sample(df.repartition(17), "doc_id", "wt", 200).collect()
    assert sorted((r.doc_id, r.est_weight_fp) for r in a) == sorted(
        (r.doc_id, r.est_weight_fp) for r in b
    )
    assert len(a) == 200
    w_of = dict(rows)
    for r in a:
        assert r.est_weight_fp >= w_of[r.doc_id] * 1_000_000
    est_total = sum(r.est_weight_fp for r in a) / 1e6
    assert abs(est_total - total) / total < 0.25  # ~4 sigma single draw
    # unbiasedness spot-check on a pinned salt set (numpy-simulated:
    # this population's single-draw rel std is 6.7%, the 400-salt
    # mean bias is -0.5% +- 0.3%, and these 8 salts' mean is -4.5%)
    means = [est_total]
    for salt in ("s1:", "s2:", "s3:", "x0y", "x1y", "x2y", "x3y"):
        s = priority_sample(df, "doc_id", "wt", 200, salt=salt).collect()
        means.append(sum(r.est_weight_fp for r in s) / 1e6)
    mean_est = sum(means) / len(means)
    assert abs(mean_est - total) / total < 0.08

    # n <= k: keep all, tau = 0, est = exact weight
    small = priority_sample(df.where("doc_id < 50"), "doc_id", "wt", 200).collect()
    assert len(small) == 50
    assert all(r.est_weight_fp == w_of[r.doc_id] * 1_000_000 for r in small)


def test_priority_sample_weight_validation(spark):
    from geomesa_spark.operators.sample import priority_sample

    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, -4)], "doc_id long, wt int"
    )
    out = priority_sample(df, "doc_id", "wt", 5).collect()
    assert [r.doc_id for r in out] == [1]  # non-positive weights excluded

    with pytest.raises(ValueError):
        priority_sample(df, "doc_id", "wt", 0)

    big = spark.createDataFrame([(1, 10_000_000)], "doc_id long, wt long")
    with pytest.raises(Exception, match="overflows"):
        priority_sample(big, "doc_id", "wt", 5).collect()


def test_spatial_split_blocked(spark):
    """spatial_split: block purity, determinism, nested fractions,
    pure-filter plan."""
    import numpy as np

    from geomesa_spark.functions import cells as C
    from geomesa_spark.operators.sample import spatial_split

    rng = np.random.default_rng(9)
    rows = [
        (i, float(rng.uniform(-179, 179)), float(rng.uniform(-89, 89)))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    out = spatial_split(df, 0.3, bits=4).collect()
    assert len(out) == 4000
    # block purity: every block entirely test or entirely train
    by_block = {}
    for r in out:
        by_block.setdefault(r.split_block, set()).add(r.is_test)
    assert all(len(v) == 1 for v in by_block.values())
    # the block id is the coarse z2 cell
    for r in out[:100]:
        lon = next(x for i, x, y in rows if i == r.id)
        lat = next(y for i, x, y in rows if i == r.id)
        ix = min(15, max(0, int((lon + 180.0) / 360.0 * 16)))
        iy = min(15, max(0, int((lat + 90.0) / 180.0 * 16)))
        assert r.split_block == int(
            C.z2_encode_np(np.asarray([ix]), np.asarray([iy]))[0])
    # fraction lands near target at block granularity
    frac = sum(1 for r in out if r.is_test) / len(out)
    assert 0.15 < frac < 0.45
    # nested: the 0.1 test set is a subset of the 0.3 test set
    t1 = {r.id for r in spatial_split(df, 0.1, bits=4).collect()
          if r.is_test}
    t3 = {r.id for r in out if r.is_test}
    assert t1 <= t3
    # determinism under repartition
    out2 = spatial_split(df.repartition(7), 0.3, bits=4).collect()
    assert {(r.id, r.is_test) for r in out2} == {
        (r.id, r.is_test) for r in out}
    with pytest.raises(ValueError):
        spatial_split(df, 1.5)
    plan = spatial_split(df, 0.3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
