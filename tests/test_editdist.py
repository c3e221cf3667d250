"""Edit-distance near-dup join (functions/editdist.py).

The load-bearing property is RECALL COMPLETENESS of the deletion-
neighborhood blocking for max_dist=1: every pair the brute-force
all-pairs levenshtein finds must come out of the blocked join. Verified
here with a pure-Python reference over typo corpora that hit every edit
kind (substitution / insertion / deletion) at every position class
(first char, interior, last char) — plus the precision direction
(dist > 1 pairs never survive), the short-key mega-bucket guard, and the
star-pass keeper semantics.
"""

from __future__ import annotations

import pytest

from ocr_spark.functions.editdist import (
    MIN_KEY_LEN,
    editdist_keepers,
    editdist_pairs,
    normalized_key,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _norm_key(text: str, key_len: int = 24) -> str:
    return "".join(c for c in text.lower() if c == " " or "a" <= c <= "z")[
        :key_len
    ]


def _brute_pairs(docs: list[tuple[int, str]]) -> set[tuple[int, int, int]]:
    keyed = [
        (i, _norm_key(t)) for i, t in docs if len(_norm_key(t)) >= MIN_KEY_LEN
    ]
    out = set()
    for x in range(len(keyed)):
        for y in range(x + 1, len(keyed)):
            (ia, ka), (ib, kb) = keyed[x], keyed[y]
            d = _lev(ka, kb)
            if d <= 1:
                lo, hi = min(ia, ib), max(ia, ib)
                out.add((lo, hi, d))
    return out


BASE = "the quick brown fox jump"  # 24 chars, the full key


def _typo_corpus() -> list[tuple[int, str]]:
    docs = [
        (0, BASE),
        (1, BASE),  # exact dup -> dist 0
        (2, "zhe quick brown fox jump"),  # substitution, first char
        (3, "the quick crown fox jump"),  # substitution, interior
        (4, "the quick brown fox jumq"),  # substitution, last char
        (5, "he quick brown fox jumps"),  # deletion of first char (+tail)
        (6, "the quickbrown fox jumps"),  # deleted space (+tail char)
        (7, "the quick browns fox jum"),  # insertion, interior
        (8, "athe quick brown fox jum"),  # insertion, first char
        (9, "the quack crown fox jump"),  # dist 2 from BASE (1 from #3)
        (10, "completely different txt"),
        (11, "tiny"),  # below MIN_KEY_LEN -> excluded
        (12, "12345 !!!"),  # normalizes to len < MIN_KEY_LEN -> excluded
    ]
    assert len(_norm_key(BASE)) == 24
    return docs


@pytest.fixture(scope="module")
def typo_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in _typo_corpus()], "doc_id bigint, text string"
    )


def test_blocked_join_equals_brute_force(spark, typo_df):
    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in editdist_pairs(typo_df).collect()
    }
    want = _brute_pairs(_typo_corpus())
    assert got == want
    # the corpus genuinely exercises both distances and all edit kinds
    assert any(d == 0 for *_, d in want)
    assert sum(d == 1 for *_, d in want) >= 6


@pytest.mark.parametrize("pos", range(0, 24, 5))
@pytest.mark.parametrize("kind", ["sub", "ins", "del"])
def test_single_edit_always_recalled(spark, kind, pos):
    s = BASE
    if kind == "sub":
        other = s[:pos] + ("x" if s[pos] != "x" else "y") + s[pos + 1 :]
    elif kind == "ins":
        other = s[:pos] + "x" + s[pos:]
    else:
        other = s[:pos] + s[pos + 1 :]
    df = spark.createDataFrame(
        [(0, s), (1, other)], "doc_id bigint, text string"
    )
    rows = editdist_pairs(df).collect()
    # keys are the normalized 24-char prefixes; an insertion pushes the
    # last char out, so the KEY distance can differ from the string edit —
    # recompute the truth on the keys themselves
    want = _lev(_norm_key(s), _norm_key(other))
    if want <= 1:
        assert [(r["doc_a"], r["doc_b"], r["dist"]) for r in rows] == [
            (0, 1, want)
        ]
    else:
        assert rows == []


def test_short_keys_never_join(spark):
    # a mega-bucket of identical short keys must be excluded up front
    df = spark.createDataFrame(
        [(i, "hot key") for i in range(50)], "doc_id bigint, text string"
    )
    assert editdist_pairs(df).count() == 0
    assert editdist_keepers(df).count() == 0


def test_keepers_star_pass(spark, typo_df):
    reps = {r["doc_id"]: r["rep"] for r in editdist_keepers(typo_df).collect()}
    # eligible docs only (11, 12 excluded)
    assert set(reps) == {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10}
    # expected star pass from the brute-force edge set:
    # rep(d) = min(d, min neighbor of d)
    nbrs: dict[int, set[int]] = {d: set() for d in reps}
    for a, b, _ in _brute_pairs(_typo_corpus()):
        nbrs[a].add(b)
        nbrs[b].add(a)
    for d in reps:
        assert reps[d] == min({d} | nbrs[d]), d
    # spot semantics: exact dup collapses, singleton keeps itself, and the
    # corpus has at least one chain where the star pass differs from full
    # transitivity (doc 9 links via 3, not directly to 0)
    assert reps[1] == 0
    assert reps[10] == 10
    assert 9 in nbrs[3] and 9 not in nbrs[0]


def test_keeper_invariant_under_partitioning(spark, typo_df):
    a = sorted(
        map(tuple, editdist_keepers(typo_df.repartition(1)).collect())
    )
    b = sorted(
        map(tuple, editdist_keepers(typo_df.repartition(7, "doc_id")).collect())
    )
    assert a == b


def test_normalized_key_matches_python(spark):
    texts = [
        "MiXeD CaSe 123 !@# words",
        "  leading  spaces",
        "exactly-twenty-four-chars and MORE tail",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["k"]
        for r in df.select("doc_id", normalized_key().alias("k")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _norm_key(t), t


def test_plan_has_no_nested_loop(spark, typo_df):
    plan = editdist_pairs(typo_df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scale_plan_reuses_variant_exchange(spark):
    """At non-broadcast scale the self-join's two sides are the same
    subplan: the variant explode + its shuffle must be computed ONCE
    (ReusedExchange in the executed adaptive plan)."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        df = editdist_pairs(
            spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        )
        df.collect()  # AQE finalizes reuse only on execution
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, old)
    assert "ReusedExchange" in plan
    assert "CartesianProduct" not in plan


# --- sorted-neighborhood blocking -------------------------------------------


def test_sorted_neighborhood_interior_edits_recall_complete(spark):
    """Clusters of size <= the neighborhood window whose edits are
    interior (past the block prefix, before the reversed block prefix)
    sort adjacently in at least one pass — recall equals brute force on
    such a corpus, and every emitted pair verifies ed <= 1 (precision is
    exact by construction)."""
    from ocr_spark.functions.editdist import sorted_neighborhood_pairs

    bases = [
        "the quick brown fox jump",
        "pack my box with five do",
        "how vexingly daft zebras",
        "sphinx of black quartz j",
        "waltz bad nymph for quic",
    ]
    docs: list[tuple[int, str]] = []
    i = 0
    for b in bases:
        docs.append((i, b)); i += 1
        # substitution at position 10: interior for both sort orders
        docs.append((i, b[:10] + ("x" if b[10] != "x" else "y") + b[11:]))
        i += 1
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in sorted_neighborhood_pairs(df).collect()
    }
    want = _brute_pairs([(d, _norm_key(t)) for d, t in docs])
    assert got == want
    assert len(want) == len(bases)  # one ed=1 pair per cluster


def test_sorted_neighborhood_subset_of_brute_force(spark):
    """On the oracle corpus the SN pairs are a SUBSET of all true ed<=1
    pairs (the blocking is a documented recall heuristic, never a
    precision one)."""
    from ocr_spark.functions.editdist import (
        normalized_key,
        sorted_neighborhood_pairs,
    )

    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in sorted_neighborhood_pairs(df).collect()
    }
    keys = [
        (r["doc_id"], r["k"])
        for r in df.select(
            "doc_id", normalized_key().alias("k")
        ).filter("length(k) >= 8").collect()
    ]
    want = _brute_pairs(keys)
    assert got <= want
    assert got  # non-empty at sf0.01 (prefix-tie clusters exist)


def test_sorted_neighborhood_single_window_exchange(spark):
    """Both passes ride ONE window Exchange: the pass id is part of the
    partition key, so the union never doubles the shuffle count."""
    from ocr_spark.functions.editdist import sorted_neighborhood_pairs

    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = (
        sorted_neighborhood_pairs(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exactly 2 exchanges: the window partition + the final distinct
    import re

    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex == 2, plan
