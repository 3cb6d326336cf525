"""Bigram-LM quality scoring (lm_score) and BM25 search (bm25_topk)."""

import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators import text as X

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the hat"),
    (2, "dog runs fast dog runs far"),
    (3, "the"),          # 1 token -> zero bigrams
    (4, ""),             # empty -> zero bigrams
    (5, "  the   cat  "),  # padded whitespace, 2 tokens
    (6, "zz yy xx ww"),  # every bigram unseen elsewhere
]


def _train(rows):
    c12, c1, w2 = Counter(), Counter(), set()
    for _, t in rows:
        tk = [w for w in t.split(" ") if w]
        for i in range(len(tk) - 1):
            c12[(tk[i], tk[i + 1])] += 1
            c1[tk[i]] += 1
            w2.add(tk[i + 1])
    return c12, c1, len(w2)


def test_lm_score_fixed_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = X.bigram_lm(df)
    got = {r.doc_id: r for r in X.lm_score(df, model).collect()}
    c12, c1, V = _train(DOCS)
    assert V == model[2]
    for did, t in DOCS:
        tk = [w for w in t.split(" ") if w]
        n = max(len(tk) - 1, 0)
        r = got[did]
        assert r.n_bigrams == n
        if n == 0:
            assert r.score_fp is None and r.oov_bigrams == 0
            continue
        ps = [
            ((c12[(tk[i], tk[i + 1])] + 1) * 1_000_000) // (c1[tk[i]] + V)
            for i in range(n)
        ]
        assert r.score_fp == sum(ps) // n
        assert r.oov_bigrams == sum(
            1 for i in range(n) if c12[(tk[i], tk[i + 1])] == 0
        )


def test_lm_score_heldout_oov_and_ranking(spark):
    """A held-out in-domain doc outscores gibberish; unseen bigrams
    count as OOV and unseen contexts fall back to the uniform
    smoothed floor."""
    train = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = X.bigram_lm(train)
    test = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "qq pp rr ss tt")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in X.lm_score(test, model).collect()}
    assert got[101].oov_bigrams == 4
    assert got[100].score_fp > got[101].score_fp
    # unseen context w1: denominator is exactly alpha*V
    _, _, V = model
    assert got[101].score_fp == ((0 + 1) * 1_000_000) // V


def test_lm_score_log_space_matches_numpy(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = X.bigram_lm(df)
    got = {r.doc_id: r for r in X.lm_score(df, model, log_space=True).collect()}
    c12, c1, V = _train(DOCS)
    for did, t in DOCS:
        tk = [w for w in t.split(" ") if w]
        if len(tk) < 2:
            assert got[did].avg_logprob is None
            continue
        lp = np.mean([
            math.log((c12[(tk[i], tk[i + 1])] + 1) / (c1[tk[i]] + V))
            for i in range(len(tk) - 1)
        ])
        assert abs(got[did].avg_logprob - lp) < 1e-12


def _bm25_fixed_oracle(rows, queries, k):
    texts = dict(rows)
    tf = {d: Counter(w for w in t.split(" ") if w) for d, t in rows}
    N = len(rows)
    T = sum(sum(c.values()) for c in tf.values())
    allterms = {t for ts in queries.values() for t in ts}
    dfreq = {t: sum(1 for d in tf if tf[d].get(t, 0) > 0) for t in allterms}
    out = {}
    for qid, terms in queries.items():
        sc = {}
        for d in tf:
            dl = sum(tf[d].values())
            s, m = 0, 0
            for t in set(terms):
                f = tf[d].get(t, 0)
                if f == 0:
                    continue
                m += 1
                idf = ((N - dfreq[t]) * 1_000_000) // dfreq[t]
                s += (idf * (f * 44 * T)) // (f * 20 * T + 6 * T + dl * 18 * N)
            if m:
                sc[d] = (s, m)
        out[qid] = sorted(sc.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    return out


def test_bm25_fixed_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = {"a": ["cat", "dog"], "b": ["the", "nosuch"], "c": ["mat"]}
    got = X.bm25_topk(df, queries, k=3).collect()
    want = _bm25_fixed_oracle(DOCS, queries, 3)
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {q for q, w in want.items() if w}
    for qid, rows_ in by_q.items():
        assert [r.doc_id for r in rows_] == [d for d, _ in want[qid]]
        assert [r.score_fp for r in rows_] == [s for d, (s, m) in want[qid]]
        assert [r.n_terms for r in rows_] == [m for d, (s, m) in want[qid]]
        assert [r.rank for r in rows_] == list(range(1, len(rows_) + 1))


def test_bm25_float_matches_numpy(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = {"a": ["cat", "dog", "runs"]}
    got = X.bm25_topk(df, queries, k=4, scoring="float").collect()
    tf = {d: Counter(w for w in t.split(" ") if w) for d, t in DOCS}
    N = len(DOCS)
    T = sum(sum(c.values()) for c in tf.values())
    avgdl = T / N
    dfreq = {t: sum(1 for d in tf if tf[d].get(t, 0) > 0) for t in queries["a"]}
    sc = {}
    for d in tf:
        dl = sum(tf[d].values())
        s = 0.0
        for t in set(queries["a"]):
            f = tf[d].get(t, 0)
            if f == 0:
                continue
            idf = math.log((N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl / avgdl))
        if s != 0.0:
            sc[d] = s
    want = sorted(sc.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    rows_ = sorted(got, key=lambda r: r.rank)
    assert [r.doc_id for r in rows_] == [d for d, _ in want]
    for r, (_, s) in zip(rows_, want):
        assert abs(r.score - s) < 1e-12


def test_bm25_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        X.bm25_topk(df, {"a": ["x"]}, k=0)
    with pytest.raises(ValueError):
        X.bm25_topk(df, {"a": ["x"]}, scoring="exact")


def test_lm_and_bm25_no_python_in_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = X.bigram_lm(df)
    plans = [
        X.lm_score(df, model)._jdf.queryExecution().executedPlan().toString(),
        X.bm25_topk(df, {"a": ["cat"]}, k=2)
        ._jdf.queryExecution().executedPlan().toString(),
    ]
    for p in plans:
        assert "Python" not in p and "Pandas" not in p


def test_bm25_query_dataframe_input(spark):
    """DataFrame query input (the distributed form) matches the dict
    form, and duplicate terms collapse (set semantics)."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(
        [("a", "cat"), ("a", "cat"), ("a", "dog")],
        "query_id string, term string",
    )
    got1 = sorted(
        X.bm25_topk(df, qdf, k=3).collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    got2 = sorted(
        X.bm25_topk(df, {"a": ["cat", "dog"]}, k=3).collect(),
        key=lambda r: (r.query_id, r.rank),
    )
    assert [(r.doc_id, r.score_fp) for r in got1] == [
        (r.doc_id, r.score_fp) for r in got2
    ]


def test_rrf_fuse(spark):
    """Reciprocal-rank fusion vs a brute python fold: overlap and
    disjoint docs, duplicate rows folding to best rank, topk cut,
    and the (rrf DESC, doc_id) tie order."""
    from geomesa_spark.operators.ann import rrf_fuse

    la = [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3),
          ("q2", 20, 1), ("q2", 21, 2),
          ("q2", 21, 5)]  # duplicate -> min rank 2
    lb = [("q1", 11, 1), ("q1", 13, 2),
          ("q2", 22, 1), ("q2", 20, 2)]
    fa = spark.createDataFrame(la, "qid string, doc_id long, rank int")
    fb = spark.createDataFrame(lb, "qid string, doc_id long, rank int")
    got = rrf_fuse([fa, fb]).collect()

    def brute():
        ra, rb = {}, {}
        for q, d, r in la:
            ra[(q, d)] = min(ra.get((q, d), 10**9), r)
        for q, d, r in lb:
            rb[(q, d)] = min(rb.get((q, d), 10**9), r)
        out = {}
        for (q, d) in set(ra) | set(rb):
            s = 0.0
            s += 1.0 / (60 + ra[(q, d)]) if (q, d) in ra else 0.0
            s = s + (1.0 / (60 + rb[(q, d)]) if (q, d) in rb else 0.0)
            out[(q, d)] = s
        return out

    want = brute()
    assert {(r.qid, r.doc_id): r.rrf for r in got} == want
    # per-query rank order is (rrf desc, doc_id)
    for q in ("q1", "q2"):
        rows = sorted([r for r in got if r.qid == q],
                      key=lambda r: r.rank)
        assert [ (r.doc_id,) for r in rows ] == [
            (d,) for (qq, d), s in sorted(
                want.items(), key=lambda kv: (-kv[1], kv[0][1])
            ) if qq == q
        ]
    # rank_i columns surface the per-list provenance
    r11 = {r.doc_id: (r.rank_0, r.rank_1) for r in got if r.qid == "q1"}
    assert r11[11] == (2, 1) and r11[10] == (1, None) \
        and r11[13] == (None, 2)
    # topk cut
    cut = rrf_fuse([fa, fb], topk=2).collect()
    assert all(r.rank <= 2 for r in cut)
    assert len([r for r in cut if r.qid == "q1"]) == 2
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([fa], k=0)


def test_rrf_fuse_hybrid_composition(spark):
    """End-to-end hybrid stack: BM25 + dense cosine fused — a doc
    ranked mid-tier by both lists overtakes docs that only one list
    returned (the RRF consensus effect)."""
    from geomesa_spark.operators.ann import cosine_topk, rrf_fuse

    docs = [
        (0, "spark joins tables fast"),
        (1, "spark query engine"),
        (2, "cats and dogs"),
        (3, "spark spark spark query"),
        (4, "unrelated text entirely"),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    sparse = X.bm25_topk(ddf, {"q0": ["spark", "query"]}, k=4).select(
        F.col("query_id").alias("qid"), F.col("doc_id"), "rank"
    )
    rng = np.random.default_rng(7)
    base = rng.normal(size=8)
    vecs = [
        (100, [float(x) for x in base + rng.normal(scale=2.0, size=8)]),
        (0, [float(x) for x in base + rng.normal(scale=0.4, size=8)]),
        (1, [float(x) for x in base + rng.normal(scale=0.1, size=8)]),
        (2, [float(x) for x in -base]),
        (3, [float(x) for x in base + rng.normal(scale=0.2, size=8)]),
        (4, [float(x) for x in rng.normal(size=8)]),
    ]
    edf = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    dense = cosine_topk(
        edf, edf.filter(F.col("vec_id") == 100), 4,
    ).select(
        F.lit("q0").alias("qid"), F.col("vec_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse([sparse, dense], topk=5).collect()
    by_rank = [r.doc_id for r in sorted(fused, key=lambda r: r.rank)]
    # docs 1 and 3 appear high in BOTH lists; doc 2 (dense-only,
    # anti-correlated) and doc 4 must not beat them
    assert set(by_rank[:2]) == {1, 3}
