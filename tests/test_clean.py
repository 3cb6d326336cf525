"""Corpus cleaning operators: line-level dedup (C4/RefinedWeb
boilerplate removal), PII redaction, token-window chunking.
Each is checked against an independent pure-Python oracle."""

import math
import re

import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators import dedup as D
from geomesa_spark.operators import pack as P
from geomesa_spark.operators import text as X

DOCS = [
    (0, "alpha beta\ncookie banner text\ngamma delta\n\nepsilon"),
    (1, "cookie banner text\nzeta eta"),
    (2, "theta iota\ncookie banner text"),
    (3, "unique line one\nunique line two"),
    (4, ""),
    (5, None),
    (6, "cookie banner text"),  # doc that empties entirely
]


def _oracle_line_dedup(rows, min_count=2):
    counts = {}
    for _, t in rows:
        for ln in (t or "").split("\n"):
            if ln:
                counts[ln] = counts.get(ln, 0) + 1
    out = {}
    for i, t in rows:
        lines = [ln for ln in (t or "").split("\n") if ln]
        kept = [ln for ln in lines if counts[ln] < min_count]
        out[i] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


def test_line_dedup_matches_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in D.line_dedup(df).collect()
    }
    assert got == _oracle_line_dedup(DOCS)
    # the boilerplate line is gone from every doc, order preserved
    assert got[0][0] == "alpha beta\ngamma delta\nepsilon"
    assert got[6] == ("", 1, 1)  # fully-emptied doc survives
    assert got[4] == ("", 0, 0) and got[5] == ("", 0, 0)


def test_line_dedup_threshold_and_min_chars(spark):
    rows = [(0, "aa\nbb"), (1, "aa\ncc"), (2, "aa\nbb")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # min_count=3: only 'aa' (3 occurrences) is boilerplate, 'bb' (2) stays
    got = {r["doc_id"]: r["text"] for r in D.line_dedup(df, min_count=3).collect()}
    assert got == {0: "bb", 1: "cc", 2: "bb"}
    # min_chars drops short lines without counting them as duplicates
    df2 = spark.createDataFrame([(0, "x\nlong line"), (1, "x\nother")],
                                "doc_id long, text string")
    got2 = {r["doc_id"]: (r["text"], r["n_lines"]) for r in
            D.line_dedup(df2, min_chars=2).collect()}
    assert got2 == {0: ("long line", 1), 1: ("other", 1)}
    with pytest.raises(ValueError):
        D.line_dedup(df, min_count=1)


PII_CASES = [
    ("reach me at bob.smith+spam@mail-host.co.uk today",
     "reach me at <EMAIL> today"),
    ("server 10.0.255.3 rebooted", "server <IP> rebooted"),
    ("call +1 (415) 555-0199 now", "call <PHONE> now"),
    ("call 415.555.0199", "call <PHONE>"),
    # order: numeric email local part must not leak a phone match
    ("12345678901@example.com", "<EMAIL>"),
    # dotted quad must redact as IP, not phone
    ("ip 192.168.1.1 end", "ip <IP> end"),
    ("no pii here", "no pii here"),
    ("", ""),
]


def test_redact_pii(spark):
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(PII_CASES)],
                               "i long, t string")
    got = [r["r"] for r in
           df.select("i", X.redact_pii(F.col("t")).alias("r")).orderBy("i").collect()]
    assert got == [want for _, want in PII_CASES]
    with pytest.raises(ValueError):
        X.redact_pii(F.col("t"), kinds=("email", "ssn"))


def test_redact_pii_matches_python_regex(spark):
    # the Spark (Java-regex) result must equal the same chain run by
    # Python's re module — the cross-dialect guarantee the DuckDB
    # oracle gate relies on
    texts = [t for t, _ in PII_CASES] + [
        "a@b.co 1.2.3.4 +44 20 7946 0958 mixed", "v6 fe80::1 untouched",
        "999.999.999.999 still quad-shaped", "(020) 7946-0958",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = [r["r"] for r in
           df.select("i", X.redact_pii(F.col("t")).alias("r")).orderBy("i").collect()]
    for t, g in zip(texts, got):
        want = t
        for _, pat, tok in X.PII_PATTERNS:
            want = re.sub(pat, tok, want)
        assert g == want, t


def _oracle_chunks(rows, chunk, stride):
    out = []
    for i, t in rows:
        tk = [w for w in (t or "").split(" ") if w]
        n = len(tk)
        for c in range(math.ceil(n / stride)):
            w = tk[c * stride : c * stride + chunk]
            out.append((i, c, len(w), " ".join(w)))
    return sorted(out)


@pytest.mark.parametrize("chunk,stride", [(4, 4), (4, 2), (3, 5)])
def test_chunk_tokens_matches_oracle(spark, chunk, stride):
    rows = [
        (0, "a b c d e f g h i"),
        (1, "a b c"),
        (2, "single"),
        (3, ""),
        (4, None),
        (5, "  padded   tokens  "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in P.chunk_tokens(df, chunk_size=chunk, stride=stride).collect()
    )
    assert got == _oracle_chunks(rows, chunk, stride)


def test_chunk_tokens_validation(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        P.chunk_tokens(df, chunk_size=0)
    with pytest.raises(ValueError):
        P.chunk_tokens(df, chunk_size=4, stride=0)


def test_clean_ops_no_python_in_plan(spark):
    """All three cleaners stay JVM-side: no BatchEvalPython /
    ArrowEvalPython / FlatMapGroupsInPandas in any physical plan."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plans = [
        D.line_dedup(df)._jdf.queryExecution().executedPlan().toString(),
        df.select(X.redact_pii(F.col("text")))
        ._jdf.queryExecution().executedPlan().toString(),
        P.chunk_tokens(df, chunk_size=4)
        ._jdf.queryExecution().executedPlan().toString(),
    ]
    for p in plans:
        assert "Python" not in p and "Pandas" not in p


def _oracle_substring(rows, L, min_count=2):
    from collections import Counter

    wins = Counter()
    toks_by = {}
    for i, t in rows:
        tk = [w for w in (t or "").split(" ") if w]
        toks_by[i] = tk
        for s in range(len(tk) - L + 1):
            wins[" ".join(tk[s : s + L])] += 1
    out = {}
    for i, tk in toks_by.items():
        covered = set()
        for s in range(len(tk) - L + 1):
            if wins[" ".join(tk[s : s + L])] >= min_count:
                covered.update(range(s, s + L))
        kept = [w for p, w in enumerate(tk) if p not in covered]
        out[i] = (" ".join(kept), len(tk), len(tk) - len(kept))
    return out


SUB_DOCS = [
    # docs 0/1 share a 5-token span at DIFFERENT offsets (line-dedup
    # would miss it; rolling windows catch it)
    (0, "x1 x2 the quick brown fox jumps y1 y2"),
    (1, "z1 the quick brown fox jumps z2 z3 z4"),
    (2, "unrelated words only here nothing shared"),
    # within-doc repetition: both copies excised
    (3, "a b c d a b c d"),
    (4, "tiny"),
    (5, ""),
    (6, None),
]


@pytest.mark.parametrize("L", [3, 4])
def test_substring_dedup_matches_oracle(spark, L):
    df = spark.createDataFrame(SUB_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in D.substring_dedup(df, length=L, min_count=2).collect()
    }
    assert got == _oracle_substring(SUB_DOCS, L)


def test_substring_dedup_offset_invariance(spark):
    """The shared span is excised from both docs even though it sits
    at offset 2 in one and offset 1 in the other."""
    df = spark.createDataFrame(SUB_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["text"]
           for r in D.substring_dedup(df, length=5).collect()}
    assert got[0] == "x1 x2 y1 y2"
    assert got[1] == "z1 z2 z3 z4"
    assert got[2] == SUB_DOCS[2][1]  # untouched
    assert got[4] == "tiny"          # shorter than L: no windows


def test_substring_dedup_validation_and_plan(spark):
    df = spark.createDataFrame(SUB_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        D.substring_dedup(df, length=1)
    with pytest.raises(ValueError):
        D.substring_dedup(df, min_count=1)
    p = D.substring_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in p and "Pandas" not in p
