"""Byte-pair-encoding tokenizer training and application.

The tokenizer-training pass of a pre-training pipeline (Sennrich et
al. 2016; the GPT-2 lineage trains the same loop byte-level): learn
a ranked merge list from corpus statistics, then tokenize with it.

Scale design — the key reduction is that BPE statistics live on the
WORD-FREQUENCY table, not the corpus: one corpus pass folds documents
into (word, count) distinct rows (bounded by the word-form
vocabulary, orders of magnitude below corpus size), and the entire
merge loop then runs over that table.  Each merge round is:

1. adjacent-pair counts: one slice/zip explode over the per-word
   token arrays, weighted by word count, ONE partial-aggregated
   groupBy — cost O(distinct-word tokens), never corpus;
2. winner selection: a single driver row —
   ``orderBy(count DESC, a, b).first()`` (a deterministic total
   order, so training is reproducible under any partitioning);
3. merge application: a JVM ``aggregate`` fold over each word's
   token array (left-to-right greedy, token-identity match — the
   defined BPE application order), guarded by an ``arrays_overlap``
   prefilter so untouched words skip the fold; the words frame
   localCheckpoints per round (the sssp lineage contract).

This is the straightforward recount-per-round formulation: real
single-box trainers keep incremental pair-count deltas; here the
recount is one bounded shuffle over the distinct-word table per
merge, which is the honest distributed trade (the table a 100 TB
corpus reduces to is typically 10⁷-10⁸ word forms).

``bpe_encode`` applies a learned merge list to documents.  Merge
application is inherently sequential per word (each merge rewrites
the token sequence the next one scans), so it is the engine's
documented per-row escape hatch (the wkb/avro codec precedent):
``mapInPandas`` with a per-batch word→tokens memo — each DISTINCT
word in a batch tokenizes once.

No oracle gate: the merge fold is a sequential recurrence (the
map_match/dtw/kalman precedent); pytest + the verify drive hold it
against an independent from-scratch python BPE implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_train", "bpe_encode", "word_counts"]

_EOW = "</w>"


def word_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One corpus pass -> the (word, count) frequency table BPE
    trains on (whitespace word boundaries; merges never cross
    words)."""
    return (
        df.select(
            F.explode(
                F.split(F.col(text_col), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("count"))
    )


def _merge_fold(a: str, b: str):
    """Left-to-right greedy merge of adjacent (a, b) token pairs —
    token-identity match, the defined BPE application order."""
    merged = F.array(F.lit(a + b))

    def step(acc, x):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), merged),
        ).otherwise(F.concat(acc, F.array(x)))

    return lambda col: F.aggregate(
        col, F.array().cast("array<string>"), step
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 100,
    min_count: int = 2,
    eow: str | None = _EOW,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; stops
    early when the best pair's weighted count falls below
    ``min_count``.  Words start as character symbols plus the
    end-of-word marker (``eow=None`` trains without one).  Returns
    the ranked merge list [(a, b), ...] — the driver-side artifact
    every encoder needs in hand (it IS the tokenizer)."""
    wc = word_counts(df, text_col)
    toks = F.split(F.col("word"), "")
    if eow:
        toks = F.concat(toks, F.array(F.lit(eow)))
    words = wc.select(
        toks.alias("toks"), F.col("count")
    ).localCheckpoint()

    merges: list[tuple[str, str]] = []
    n = F.size(F.col("toks"))
    for _ in range(int(n_merges)):
        pairs = (
            words.filter(n >= 2)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("toks"), 1, n - 1).alias("a"),
                        F.slice(F.col("toks"), 2, n - 1).alias("b"),
                    )
                ).alias("p"),
                "count",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("count").alias("c"))
        )
        best = pairs.orderBy(
            F.col("c").desc(), F.col("a"), F.col("b")
        ).first()
        if best is None or best["c"] < min_count:
            break
        a, b = best["a"], best["b"]
        merges.append((a, b))
        fold = _merge_fold(a, b)
        touched = F.arrays_overlap(
            F.col("toks"), F.array(F.lit(a))
        ) & F.arrays_overlap(F.col("toks"), F.array(F.lit(b)))
        # per-round localCheckpoint truncates the fold lineage (the
        # sssp contract); superseded checkpoint blocks are reclaimed
        # by the ContextCleaner once unreferenced
        words = words.select(
            F.when(touched, fold(F.col("toks")))
            .otherwise(F.col("toks"))
            .alias("toks"),
            "count",
        ).localCheckpoint()
    return merges


def _encode_word(word: str, merges, eow: str | None) -> list[str]:
    toks = list(word)
    if eow:
        toks.append(eow)
    for a, b in merges:
        if a not in toks or b not in toks:
            continue
        out: list[str] = []
        for t in toks:
            if out and out[-1] == a and t == b:
                out[-1] = a + b
            else:
                out.append(t)
        toks = out
    return toks


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    *,
    eow: str | None = _EOW,
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: whitespace
    words, each encoded by applying the merges in rank order
    (sequential per word — the documented per-row boundary).  A
    per-batch word→tokens memo tokenizes each distinct word once.
    Appends ``out_col`` (array<string>)."""
    import pandas as pd

    from pyspark.sql import types as T

    ranked = [tuple(m) for m in merges]
    # NOTE: df.schema is the DataFrame's CACHED StructType and
    # StructType.add mutates in place — build a fresh copy or the
    # source frame's column list silently grows
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    import re

    # the SAME word boundary as word_counts' Java regex \s+: Java's
    # \s is the ASCII class [ \t\n\x0b\f\r] (python str.split()
    # and python \s are Unicode-aware and would split e.g. NBSP,
    # silently dropping characters the trainer learned merges over)
    _ws = re.compile("[ \t\n\x0b\f\r]+")

    def enc(batches):
        memo: dict[str, list[str]] = {}

        def doc_tokens(text):
            out: list[str] = []
            if text is None:
                return out
            for w in _ws.split(text):
                if not w:
                    continue
                t = memo.get(w)
                if t is None:
                    t = _encode_word(w, ranked, eow)
                    memo[w] = t
                out.extend(t)
            return out

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(
                [doc_tokens(t) for t in pdf[text_col]],
                index=pdf.index, dtype=object,
            )
            yield pdf

    return df.mapInPandas(enc, schema=out_schema)
