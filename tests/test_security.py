"""Row-level visibility filtering (geomesa-security analog):
Accumulo VisibilityEvaluator grammar + scan-time predicate."""

import pandas as pd
import pytest

from geomesa_spark.plans.security import (
    VisibilityError,
    evaluate,
    visibility_filter,
)


def test_grammar_cases():
    auths = {"admin", "audit", "system"}
    assert evaluate("admin", auths)
    assert not evaluate("secret", auths)
    assert evaluate("admin&audit", auths)
    assert not evaluate("admin&secret", auths)
    assert evaluate("admin|secret", auths)
    assert evaluate("(admin&secret)|system", auths)
    assert evaluate("admin&(audit|secret)", auths)
    assert not evaluate("secret&(audit|admin)", auths)
    assert evaluate('"label with spaces?"|admin', auths)
    assert evaluate(None, auths) and evaluate("", auths) and evaluate("  ", auths)
    # nested
    assert evaluate("((admin))", auths)
    assert evaluate("(admin&audit)|(secret&other)", auths)


def test_grammar_rejects_malformed():
    for bad in ["admin&", "&admin", "admin&audit|x", "(admin", "admin)",
                "a b", 'a&"unterminated']:
        with pytest.raises(VisibilityError):
            evaluate(bad, {"admin", "audit"})


def test_visibility_filter(spark):
    rows = [
        ("r1", "admin"),
        ("r2", "admin&secret"),
        ("r3", "admin|secret"),
        ("r4", None),
        ("r5", ""),
        ("r6", "secret"),
        ("r7", "(admin&audit)|secret"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "visibility"])
    )
    got = {
        r.doc_id
        for r in visibility_filter(df, {"admin", "audit"}).collect()
    }
    assert got == {"r1", "r3", "r4", "r5", "r7"}
    # no auths: only unlabelled rows
    got0 = {r.doc_id for r in visibility_filter(df, set()).collect()}
    assert got0 == {"r4", "r5"}
    # the predicate is a plain isin/isNull — pushable, no Python
    plan = visibility_filter(df, {"admin"})._jdf.queryExecution().optimizedPlan().toString()
    assert "pythonUDF" not in plan and "ArrowEval" not in plan


def test_quoted_operator_lookalike_labels():
    """Quoted labels whose text looks like grammar tokens are LABELS,
    not operators (r3 review finding)."""
    assert evaluate('"&"', {"&"}) is True
    assert evaluate('"&"', {"admin"}) is False
    assert evaluate('"("|admin', {"admin"}) is True
    assert evaluate('admin&"|"', {"admin", "|"}) is True
    assert evaluate('""', {"x"}) is False  # empty label: never granted


def test_quoted_escapes():
    """Accumulo ColumnVisibility.quote() escapes: \\\" and \\\\ inside
    quoted terms (r3 review round 2)."""
    assert evaluate('"a\\"b"', {'a"b'}) is True
    assert evaluate('"a\\"b"', {"ab"}) is False
    assert evaluate('"a\\\\b"', {"a\\b"}) is True
    assert evaluate('"a\\\\b"&x', {"a\\b", "x"}) is True
    with pytest.raises(VisibilityError):
        evaluate('"a\\"', {"a"})  # escape eats the closer: unterminated


def test_malformed_visibility_hides_row_not_scan(spark):
    """Reference parity (Accumulo VisibilityFilter): a malformed
    expression hides ITS row (fail closed) and the scan continues —
    one corrupt label must not abort a billion-row query (r3 ADVICE)."""
    rows = [
        ("ok1", "admin"),
        ("bad1", "admin&"),          # trailing operator
        ("bad2", "(admin"),          # unbalanced paren
        ("bad3", "a&b|c"),           # mixed ops without parens
        ("ok2", None),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "visibility"])
    )
    got = {r.doc_id for r in visibility_filter(df, {"admin"}).collect()}
    assert got == {"ok1", "ok2"}
