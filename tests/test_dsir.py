"""DSIR importance resampling (operators/dsir) vs python oracles."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.dsir import (
    dsir_model,
    dsir_sample,
    dsir_weights,
    hashed_feature_counts,
)

B = 512
SCALE = 1_000_000


def _bucket(w1, w2):
    h = int(hashlib.md5(f"{w1} {w2}".encode()).hexdigest()[:8], 16)
    return h % B


def _feats(text):
    toks = [t for t in text.split(" ") if t]
    out = {}
    for a, b in zip(toks, toks[1:]):
        k = _bucket(a, b)
        out[k] = out.get(k, 0) + 1
    return out


def _corpus_counts(texts):
    c = {}
    for t in texts:
        for k, n in _feats(t).items():
            c[k] = c.get(k, 0) + n
    return c


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(7)
    spark_words = ["spark", "query", "join", "shuffle", "partition"]
    news_words = ["election", "market", "weather", "sports", "city"]

    def doc(words, n):
        return " ".join(rng.choice(words, n))

    target = [doc(spark_words, 30) for _ in range(40)]
    source = [doc(news_words, 30) for _ in range(40)] + [
        doc(spark_words + news_words, 30) for _ in range(40)
    ]
    # candidates: half sparky, half newsy, a few featureless
    cand = (
        [(i, doc(spark_words, 25)) for i in range(30)]
        + [(i + 30, doc(news_words, 25)) for i in range(30)]
        + [(60, "solo"), (61, "")]
    )
    tdf = spark.createDataFrame([(t,) for t in target], "text string")
    sdf = spark.createDataFrame([(t,) for t in source], "text string")
    cdf = spark.createDataFrame(cand, "doc_id long, text string")
    tm = dsir_model(tdf, buckets=B)
    sm = dsir_model(sdf, buckets=B)
    return target, source, cand, tm, sm, cdf


def test_models_match_python_counts(data):
    target, source, cand, tm, sm, cdf = data
    got = {r["bucket"]: r["c"] for r in tm[0].collect()}
    want = _corpus_counts(target)
    assert got == want
    assert tm[1] == sum(want.values()) and tm[2] == B


def test_feature_counts_match(data):
    target, source, cand, tm, sm, cdf = data
    got = {}
    for r in hashed_feature_counts(cdf, buckets=B).collect():
        got.setdefault(r["doc_id"], {})[r["bucket"]] = r["cnt"]
    for i, text in cand:
        want = _feats(text)
        assert got.get(i, {}) == want, i


def test_fixed_point_weights_match_oracle(data):
    target, source, cand, tm, sm, cdf = data
    ct = _corpus_counts(target)
    cs = _corpus_counts(source)
    rows = {
        r["doc_id"]: (r["n_feats"], r["score_fp"])
        for r in dsir_weights(cdf, tm, sm).collect()
    }
    for i, text in cand:
        f = _feats(text)
        n = sum(f.values())
        if n == 0:
            assert rows[i] == (0, None)
            continue
        s = sum(
            cnt * (((ct.get(b, 0) + 1) * SCALE) // (cs.get(b, 0) + 1))
            for b, cnt in f.items()
        )
        assert rows[i] == (n, s // n), i


def test_log_weights_match_numpy(data):
    target, source, cand, tm, sm, cdf = data
    ct = _corpus_counts(target)
    cs = _corpus_counts(source)
    nt, ns = tm[1], sm[1]
    rows = {
        r["doc_id"]: (r["n_feats"], r["log_weight"])
        for r in dsir_weights(cdf, tm, sm, log_space=True).collect()
    }
    for i, text in cand:
        f = _feats(text)
        if not f:
            assert rows[i][1] is None
            continue
        w = sum(
            cnt
            * (
                math.log((ct.get(b, 0) + 1) / (nt + B))
                - math.log((cs.get(b, 0) + 1) / (ns + B))
            )
            for b, cnt in f.items()
        )
        assert rows[i][1] == pytest.approx(w, rel=1e-9), i


def test_selection_prefers_target_like_docs(data):
    target, source, cand, tm, sm, cdf = data
    top = [r["doc_id"] for r in dsir_sample(cdf, tm, sm, k=25).collect()]
    assert len(top) == 25
    # sparky candidates are ids 0..29; newsy 30..59
    assert all(i < 30 for i in top)


def test_gumbel_resample_deterministic(data):
    target, source, cand, tm, sm, cdf = data
    a = [r["doc_id"] for r in dsir_sample(cdf, tm, sm, k=20, gumbel=True).collect()]
    b = [r["doc_id"] for r in dsir_sample(cdf, tm, sm, k=20, gumbel=True).collect()]
    assert a == b and len(a) == 20
    c = [
        r["doc_id"]
        for r in dsir_sample(cdf, tm, sm, k=20, gumbel=True, salt="x").collect()
    ]
    assert a != c  # fresh noise per salt


def test_models_broadcast_and_bucket_mismatch(data):
    target, source, cand, tm, sm, cdf = data
    plan = (
        dsir_weights(cdf, tm, sm)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "BatchEvalPython" not in plan
    bad = (sm[0], sm[1], B * 2)
    with pytest.raises(ValueError):
        dsir_weights(cdf, tm, bad)
