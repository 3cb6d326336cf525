"""Row-level visibility filtering (geomesa-security analog).

The reference stores an Accumulo column-visibility expression per
feature and lets the tablet server drop rows the scanner's
authorizations don't satisfy (geomesa-security's
AuthorizationsProvider + per-feature SecurityUtils.setFeatureVisibility
labels; evaluation is Accumulo's VisibilityEvaluator). VERDICT r2
noted the trivial Spark analog is a row-level column predicate — this
module supplies it:

- `evaluate(expr, auths)` — the boolean-expression grammar Accumulo
  uses (labels, `&`, `|`, parentheses, quoted labels), evaluated
  against an authorization set. Empty/NULL expression = visible to
  everyone (Accumulo's convention).
- `visibility_filter(df, auths, vis_col)` — scan-time row filter.
  Visibility VOCABULARIES are tiny in practice (a handful of label
  combinations across billions of rows — the reference relies on the
  same property to cache parsed expressions), so the filter collects
  the DISTINCT expressions (bounded, raises past `max_distinct`),
  evaluates each once on the driver, and pushes one `isin(allowed)`
  predicate down to the scan — fully JVM row filtering, parquet
  dictionary/stats friendly, no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class VisibilityError(ValueError):
    pass


def _tokenize(expr: str) -> list[tuple[str, str]]:
    """Tagged tokens ("op", ch) / ("label", text): a QUOTED label is
    always a label even when its text looks like an operator
    ('"&"', '"("', '""' are legal Accumulo quoted terms)."""
    toks: list[tuple[str, str]] = []
    i, n = 0, len(expr)
    while i < n:
        ch = expr[i]
        if ch.isspace():
            i += 1
        elif ch in "&|()":
            toks.append(("op", ch))
            i += 1
        elif ch == '"':
            # Accumulo quoted terms escape \" and \\ inside quotes
            # (ColumnVisibility.quote()); unescape while scanning
            buf: list[str] = []
            j = i + 1
            closed = False
            while j < n:
                cj = expr[j]
                if cj == "\\" and j + 1 < n and expr[j + 1] in ('"', "\\"):
                    buf.append(expr[j + 1])
                    j += 2
                elif cj == '"':
                    closed = True
                    break
                else:
                    buf.append(cj)
                    j += 1
            if not closed:
                raise VisibilityError(f"unterminated quote in {expr!r}")
            toks.append(("label", "".join(buf)))
            i = j + 1
        else:
            j = i
            while j < n and (expr[j].isalnum() or expr[j] in "_-.:/"):
                j += 1
            if j == i:
                raise VisibilityError(f"bad character {ch!r} in {expr!r}")
            toks.append(("label", expr[i:j]))
            i = j
    return toks


def evaluate(expr: str | None, auths: set[str] | frozenset[str]) -> bool:
    """Accumulo visibility grammar against an authorization set.

    `a&b` requires both, `a|b` either, parentheses nest; `&` and `|`
    may not be mixed at one level without parentheses (Accumulo
    rejects `a&b|c` too). Empty/None = unlabelled row, visible."""
    if expr is None or not expr.strip():
        return True
    toks = _tokenize(expr)
    pos = 0

    def parse() -> bool:
        nonlocal pos
        vals: list[bool] = [parse_term()]
        op: str | None = None
        while pos < len(toks) and toks[pos] in (("op", "&"), ("op", "|")):
            cur = toks[pos][1]
            if op is None:
                op = cur
            elif cur != op:
                raise VisibilityError(
                    f"mixed & and | without parentheses in {expr!r}"
                )
            pos += 1
            vals.append(parse_term())
        return all(vals) if op in (None, "&") else any(vals)

    def parse_term() -> bool:
        nonlocal pos
        if pos >= len(toks):
            raise VisibilityError(f"unexpected end of expression {expr!r}")
        tag, t = toks[pos]
        if tag == "op" and t == "(":
            pos += 1
            v = parse()
            if pos >= len(toks) or toks[pos] != ("op", ")"):
                raise VisibilityError(f"unbalanced parentheses in {expr!r}")
            pos += 1
            return v
        if tag == "op":
            raise VisibilityError(f"unexpected {t!r} in {expr!r}")
        pos += 1
        return t in auths

    out = parse()
    if pos != len(toks):
        raise VisibilityError(f"trailing tokens in {expr!r}")
    return out


def visibility_filter(
    df: DataFrame,
    auths: set[str] | list[str],
    vis_col: str = "visibility",
    max_distinct: int = 100_000,
) -> DataFrame:
    """Rows whose visibility expression the auth set satisfies.

    One distinct-scan of the (tiny-vocabulary) expression column,
    driver-side evaluation per DISTINCT expression, then a single
    pushable `isNull OR isin(allowed)` predicate — the Spark analog
    of server-side visibility filtering at scan time.

    Malformed expressions hide their rows rather than aborting the
    scan: Accumulo's VisibilityFilter catches parse failures and
    suppresses the row (a bad label must fail CLOSED — the row stays
    invisible to everyone), so a single corrupt expression in a
    billion-row table cannot take down the query."""
    auth_set = frozenset(auths)
    distinct = [
        r[0]
        for r in df.select(vis_col).distinct().limit(max_distinct + 1).collect()
    ]
    if len(distinct) > max_distinct:
        raise VisibilityError(
            f"more than {max_distinct} distinct visibility expressions; "
            "per-row visibility this diverse needs a dedicated evaluator"
        )

    def _visible(v: str) -> bool:
        try:
            return evaluate(v, auth_set)
        except VisibilityError:
            # reference parity: unparseable visibility -> row hidden,
            # scan continues (Accumulo VisibilityFilter.accept)
            return False

    allowed = [v for v in distinct if v is not None and _visible(v)]
    pred: Column = F.col(vis_col).isin(allowed) if allowed else F.lit(False)
    if any(v is None or not str(v).strip() for v in distinct):
        # unlabelled rows (NULL / blank) are visible to everyone
        pred = pred | F.col(vis_col).isNull() | (
            F.trim(F.col(vis_col)) == ""
        )
    return df.filter(pred)
