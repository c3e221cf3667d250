"""BPE trainer/encoder vs an independent pure-Python reference
(functions/bpe.py has no SQL oracle — the iterative argmax is not a single
query — so this file IS its correctness gate)."""

from __future__ import annotations

import random
from collections import Counter

from ocr_spark.functions.bpe import bpe_encode, bpe_train


def ref_bpe_train(texts: list[str], n_merges: int):
    wf = Counter(w for t in texts for w in t.lower().split(" ") if w)
    words = {w: list(w) for w in wf}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            f = wf[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_bpe_train_matches_reference_classic(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "low new lower newer",
    ]
    got = bpe_train(_docs(spark, texts), n_merges=12)
    assert got == ref_bpe_train(texts, 12)
    # the classic outcome: whole common words end up as single tokens
    merged_tokens = {l + r for l, r, _ in got}
    assert "low" in merged_tokens and "new" in merged_tokens


def test_bpe_train_matches_reference_random_corpus(spark):
    rng = random.Random(17)
    vocab = ["spark", "scale", "shuffle", "spill", "scan", "sort"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
        for _ in range(40)
    ]
    n = 20
    got = bpe_train(_docs(spark, texts), n_merges=n)
    assert got == ref_bpe_train(texts, n)
    assert len(got) == n  # corpus is rich enough to sustain all rounds
    # training is partitioning-invariant
    got2 = bpe_train(_docs(spark, texts).repartition(7), n_merges=n)
    assert got2 == got


def test_bpe_encode_invariants(spark):
    texts = ["low lower lowest", "new newer newest", "lownew"]
    df = _docs(spark, texts)
    merges = bpe_train(df, n_merges=10)
    out = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(texts):
        ws = [w for w in t.lower().split(" ") if w]
        r = out[i]
        assert r["n_words"] == len(ws)
        # tokens never exceed chars, never undershoot words
        assert len(ws) <= r["n_tokens"] <= sum(len(w) for w in ws)
        # the sample re-concatenates to a prefix of the original words
        assert "".join(r["tokens_sample"]) == "".join(ws)[: len(
            "".join(r["tokens_sample"])
        )]


def test_bpe_stops_when_no_pair_repeats(spark):
    # all words distinct single chars -> zero merges possible
    got = bpe_train(_docs(spark, ["a b c d", "e f g"]), n_merges=5)
    assert got == []
