"""Unigram-LM tokenizer gates: the Spark trainer/encoder vs an
INDEPENDENT pure-Python implementation of the same spec (module
docstring of ocr_spark/functions/unigram.py), built here from scratch —
different data structures, no shared segmentation code beyond the spec.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest


# --- independent reference ---------------------------------------------------


def _ref_words(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                c[w] += 1
    return c


def _ref_seed(words: Counter, max_len: int, seed_size: int) -> dict[str, int]:
    sub: Counter = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for ln in range(1, min(max_len, len(w) - i) + 1):
                sub[w[i : i + ln]] += f
    counts = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    counts.update(dict(multi))
    return counts


def _ref_viterbi(word, counts, max_len):
    total = sum(counts.values())
    v = len(counts)
    unk = math.log(1 / (total + v)) - 10.0

    # DP table of (score, -npieces, pieces); explicit spec tie-breaks
    table = {0: (0.0, 0, ())}
    for i in range(1, len(word) + 1):
        options = []
        for ln in range(1, min(max_len, i) + 1):
            p = word[i - ln : i]
            if i - ln not in table:
                continue
            if p in counts:
                lp = math.log((counts[p] + 1) / (total + v))
            elif ln == 1:
                lp = unk
            else:
                continue
            s, nn, seq = table[i - ln]
            options.append((s + lp, nn - 1, seq + (p,)))
        if options:
            # max score, then max -npieces (fewer), then min piece tuple
            mx = max(o[0] for o in options)
            options = [o for o in options if o[0] == mx]
            mn = max(o[1] for o in options)
            options = [o for o in options if o[1] == mn]
            table[i] = min(options, key=lambda o: o[2])
    return table[len(word)][2]


def _ref_train(texts, vocab_size, seed_size, em_iters, max_len):
    words = _ref_words(texts)
    counts = _ref_seed(words, max_len, seed_size)
    for _ in range(em_iters):
        used: Counter = Counter()
        for w, f in words.items():
            for p in _ref_viterbi(w, counts, max_len):
                used[p] += f
        nxt = {p: 0 for p in counts if len(p) == 1}
        nxt.update(used)
        counts = nxt
    keep = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:vocab_size]
    final = dict(keep)
    final.update({p: c for p, c in counts.items() if len(p) == 1})
    return sorted(final.items())


@pytest.fixture(scope="module")
def corpus():
    # repetitive structure so multi-char pieces win probability mass
    return [
        "the internet archive crawls the internet every day",
        "crawling the archive of the internet takes a while",
        "internet pages archive well when the crawler is polite",
        "every polite crawler archives internet pages daily",
        "the daily crawl archives every internet page it sees",
    ] * 3


@pytest.fixture(scope="module")
def corpus_df(spark, corpus):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )


def test_unigram_train_equals_reference(spark, corpus, corpus_df):
    from ocr_spark.functions.unigram import unigram_train

    got = unigram_train(
        corpus_df, vocab_size=64, seed_size=96, em_iters=2, max_piece_len=5
    )
    want = _ref_train(corpus, 64, 96, 2, 5)
    assert got == want
    # multi-char pieces actually won mass (the trainer is not degenerate)
    assert any(len(p) > 1 and c > 0 for p, c in got)


def test_unigram_encode_equals_reference_and_coverage(
    spark, corpus, corpus_df
):
    from ocr_spark.functions.unigram import (
        unigram_encode,
        unigram_train,
        viterbi_segment,
        _logp_of,
    )

    vocab = unigram_train(
        corpus_df, vocab_size=64, seed_size=96, em_iters=2, max_piece_len=5
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in unigram_encode(corpus_df, vocab, max_piece_len=5).collect()
    }
    counts = dict(vocab)
    for i, t in enumerate(corpus):
        words = [w for w in t.lower().split(" ") if w]
        toks = sum(len(_ref_viterbi(w, counts, 5)) for w in words)
        assert got[i] == (len(words), toks), i

    # coverage: segmentation concatenates back to the word, incl. unknown
    logp, unk = _logp_of(counts)
    for w in ["zzzqqq", "internet", "archive2026", "a"]:
        seg = viterbi_segment(w, logp, 5, unk)
        assert "".join(seg) == w


def test_unigram_partitioning_invariance(spark, corpus, corpus_df):
    from ocr_spark.functions.unigram import unigram_train

    a = unigram_train(
        corpus_df.repartition(1), vocab_size=48, seed_size=64,
        em_iters=2, max_piece_len=4,
    )
    b = unigram_train(
        corpus_df.repartition(16), vocab_size=48, seed_size=64,
        em_iters=2, max_piece_len=4,
    )
    assert a == b


def test_unigram_registry_rows(spark):
    """Registry faces run at sf0.001 and emit sane, deterministic rows."""
    from ocr_spark.queries import QUERIES
    import ocr_spark.queries_corpusml  # noqa: F401

    sf = "/root/testdata/sf0.001"
    vocab = QUERIES["tokenizer_unigram_vocab"](spark, sf).collect()
    assert len(vocab) > 30
    assert all(r["count"] >= 0 for r in vocab)
    enc = QUERIES["tokenizer_unigram_encode"](spark, sf).collect()
    assert enc and all(
        r["n_tokens"] >= r["n_words"] for r in enc if r["n_words"]
    )
