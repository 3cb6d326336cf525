"""BPE training/encoding vs an INDEPENDENT from-scratch python
implementation (dict-based pair counting, its own merge scanner)."""

import numpy as np

from geomesa_spark.operators.bpe import bpe_encode, bpe_train, word_counts

EOW = "</w>"


def _ref_train(word_count, n_merges, min_count=2, eow=EOW):
    """Reference trainer: (word, count) dict -> ranked merges."""
    words = {}
    for w, c in word_count.items():
        toks = tuple(list(w) + ([eow] if eow else []))
        words[toks] = words.get(toks, 0) + c
    merges = []
    for _ in range(n_merges):
        pc = {}
        for toks, c in words.items():
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] = pc.get(
                    (toks[i], toks[i + 1]), 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        nxt = {}
        for toks, c in words.items():
            out = []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        words = nxt
    return merges


def _ref_encode(text, merges, eow=EOW):
    out = []
    for w in text.split():
        toks = list(w) + ([eow] if eow else [])
        for a, b in merges:
            nt = []
            for t in toks:
                if nt and nt[-1] == a and t == b:
                    nt[-1] = a + b
                else:
                    nt.append(t)
            toks = nt
        out.extend(toks)
    return out


def _corpus(rng, n_docs=60):
    vocab = ["low", "lower", "lowest", "newer", "wider", "new",
             "widest", "render", "rendering", "ender"]
    docs = []
    for i in range(n_docs):
        k = rng.integers(3, 12)
        docs.append((i, " ".join(rng.choice(vocab, k))))
    return docs


def test_bpe_train_matches_reference(spark):
    rng = np.random.default_rng(13)
    docs = _corpus(rng)
    df = spark.createDataFrame(docs, "doc_id long, text string")

    wc = {}
    for _, t in docs:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    # engine word counts match
    got_wc = {r.word: r["count"] for r in word_counts(df).collect()}
    assert got_wc == wc

    for nm in (5, 30):
        got = bpe_train(df, n_merges=nm)
        want = _ref_train(wc, nm)
        assert got == want, (nm, got[:5], want[:5])
    # min_count early stop: a singleton-only corpus learns nothing
    one = spark.createDataFrame([(0, "zq xv")], "doc_id long, text string")
    assert bpe_train(one, n_merges=10, min_count=2) == []


def test_bpe_encode_matches_reference(spark):
    rng = np.random.default_rng(14)
    docs = _corpus(rng)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = bpe_train(df, n_merges=25)
    assert len(merges) > 5
    enc = {r.doc_id: list(r.bpe_tokens)
           for r in bpe_encode(df, merges).collect()}
    for i, t in docs:
        assert enc[i] == _ref_encode(t, merges), i
    # round-trip: concatenating tokens (minus eow) rebuilds the text
    for i, t in docs:
        assert "".join(enc[i]).replace(EOW, " ").strip() == t
    # aaa self-overlap: merge (a,a) applies left-to-right greedily
    tri = spark.createDataFrame(
        [(0, "aaa aaa aaa")], "doc_id long, text string")
    m = bpe_train(tri, n_merges=1, eow=None)
    assert m == [("a", "a")]
    out = bpe_encode(tri, m, eow=None).collect()[0].bpe_tokens
    assert list(out) == ["aa", "a"] * 3


def test_bpe_unicode_whitespace_boundary(spark):
    """Review fix: the encoder must use the SAME ASCII whitespace
    class as the trainer's Java \\s+ — a NBSP-joined token is ONE
    word on both sides (python str.split() would split it and
    silently drop the NBSP)."""
    docs = [(0, "aa bb aa bb aa bb")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    wc = {r.word: r["count"] for r in word_counts(df).collect()}
    assert wc == {"aa bb": 3}
    merges = bpe_train(df, n_merges=3, eow=None)
    enc = bpe_encode(df, merges, eow=None).collect()[0].bpe_tokens
    # round-trip: no characters were dropped
    assert "".join(enc) == "aa bb" * 3
