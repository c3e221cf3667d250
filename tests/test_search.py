"""Semantic tests for queries_search: each query runs through its REAL
graded path (a crafted ``documents.parquet`` in a tmp sf_dir) and is
compared against an independent pure-Python reference — not the DuckDB
oracle (tests/test_oracle.py already replicates the driver gate at
sf0.01, value-hash included).

Plan pins: BM25 query-time scoring broadcasts the query terms and the
corpus stats (the postings stream never reshuffles for them) and plans
the top-k as TakeOrderedAndProject, never a global Sort+Exchange; the
phrase match broadcasts the 1-row derived phrase into both postings
filters.
"""

from __future__ import annotations

import math
import random
from collections import Counter

from ocr_spark.queries import QUERIES
import ocr_spark.queries_search as srch  # registers; constants
from tests.test_corpusml import _write_documents
from tests.test_plans import _plan

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa",
]


def _mk_corpus(n_docs=60, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        n = rng.randint(0, 40)  # includes empty and 1-word docs
        text = " ".join(rng.choice(WORDS) for _ in range(n))
        rows.append((i, text, "en", f"s{i % 4}"))
    return rows


def _tokens(text):
    return [w for w in text.split(" ") if w != ""]


# --- pure-Python references ---------------------------------------------------------


def _ref_postings(rows):
    out = set()
    for doc_id, text, _, _ in rows:
        toks = _tokens(text)
        for term, tf in Counter(toks).items():
            out.add((term, doc_id, tf, len(toks)))
    return out


def _ref_bm25(rows, k1=1.2, b=0.75, n_query=3, topk=20):
    docs = {r[0]: _tokens(r[1]) for r in rows}
    df = Counter()
    for toks in docs.values():
        df.update(set(toks))
    qt = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:n_query]
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    scores = {}
    for doc_id, toks in docs.items():
        tfs = Counter(toks)
        c = 0
        nm = 0
        for term, dfr in qt:
            tf = tfs.get(term, 0)
            if tf == 0:
                continue
            nm += 1
            idf = math.log(1.0 + (n_docs - dfr + 0.5) / (dfr + 0.5))
            tfn = tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(toks) / avgdl)
            )
            # Python round() is banker's; the engines round half UP for
            # positives — use floor(x + 0.5) to mirror them exactly.
            c += int(math.floor(idf * tfn * 1e4 + 0.5))
        if nm:
            scores[doc_id] = (c, nm)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))
    return {(d, s, nm) for d, (s, nm) in ranked[:topk]}


def _ref_phrase(rows):
    bg = Counter()
    for _, text, _, _ in rows:
        toks = _tokens(text)
        for i in range(len(toks) - 1):
            bg[toks[i] + " " + toks[i + 1]] += 1
    if not bg:
        return None, set()
    top = sorted(bg.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    w1, w2 = top.split(" ")
    out = set()
    for doc_id, text, _, _ in rows:
        toks = _tokens(text)
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == w1 and toks[i + 1] == w2
        )
        if n:
            out.add((doc_id, top, n))
    return top, out


# --- semantic gates ------------------------------------------------------------------


def test_postings_matches_reference(spark, tmp_path):
    rows = _mk_corpus()
    sf = _write_documents(tmp_path, rows)
    got = {
        (r.term, r.doc_id, r.tf, r.dl)
        for r in QUERIES["search_postings"](spark, sf).collect()
    }
    assert got == _ref_postings(rows)


def test_bm25_matches_reference(spark, tmp_path):
    rows = _mk_corpus()
    sf = _write_documents(tmp_path, rows)
    got = {
        (r.doc_id, r.score_e4, r.n_match)
        for r in QUERIES["search_bm25_topk"](spark, sf).collect()
    }
    assert got == _ref_bm25(rows)
    assert len(got) == srch.BM25_TOPK


def test_bm25_ranks_heavier_tf_higher(spark, tmp_path):
    # Two docs, same length, one saturated with the query term: BM25 must
    # rank the heavier-tf doc first (and both above a non-matching doc).
    rows = [
        (0, " ".join(["alpha"] * 8 + ["beta"] * 2), "en", "s"),
        (1, " ".join(["alpha"] * 2 + ["beta"] * 8), "en", "s"),
        (2, " ".join(["gamma"] * 10), "en", "s"),
        (3, " ".join(["alpha", "beta", "gamma"] * 4), "en", "s"),
    ]
    sf = _write_documents(tmp_path, rows)
    res = {
        r.doc_id: r.score_e4
        for r in QUERIES["search_bm25_topk"](spark, sf).collect()
    }
    # query terms are the 3 highest-df terms = alpha, beta, gamma here
    assert res[3] > res[0] and res[3] > res[1]  # matches all three terms
    assert 0 in res and 1 in res and 2 in res


def test_phrase_matches_reference(spark, tmp_path):
    rows = _mk_corpus(seed=23)
    sf = _write_documents(tmp_path, rows)
    top, ref = _ref_phrase(rows)
    got = {
        (r.doc_id, r.bigram, r.n_occ)
        for r in QUERIES["search_phrase"](spark, sf).collect()
    }
    assert got == ref
    assert all(b == top for _, b, _ in got)


def test_phrase_overlapping_occurrences(spark, tmp_path):
    # "a a a a" contains the bigram "a a" 3 times (overlapping): the
    # positional join must count positions, not disjoint matches.
    rows = [(0, "a a a a", "en", "s"), (1, "a b a a", "en", "s")]
    sf = _write_documents(tmp_path, rows)
    got = {
        (r.doc_id, r.n_occ)
        for r in QUERIES["search_phrase"](spark, sf).collect()
    }
    assert got == {(0, 3), (1, 1)}


# --- plan pins -----------------------------------------------------------------------


def test_bm25_plan_broadcasts_and_takeordered(spark, tmp_path):
    sf = _write_documents(tmp_path, _mk_corpus())
    plan = _plan(QUERIES["search_bm25_topk"](spark, sf))
    # query terms + stats reach the postings via broadcast, never shuffle
    assert plan.count("BroadcastExchange") >= 2
    # top-k is per-partition heads + driver merge, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_phrase_plan_broadcasts_derived_phrase(spark, tmp_path):
    sf = _write_documents(tmp_path, _mk_corpus())
    plan = _plan(QUERIES["search_phrase"](spark, sf))
    assert "BroadcastExchange" in plan


def test_keywords_tfidf_matches_python_reference(spark, tmp_path):
    """Top-k tf-idf keywords vs a plain-Python recomputation."""
    import math

    import pyspark.sql.functions as F

    rows = [
        (0, "apple banana apple cherry"),
        (1, "banana banana date"),
        (2, "apple egg egg egg fig"),
        (3, ""),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string").withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from ocr_spark.queries_search import KW_TOPK, q_search_keywords_tfidf

    got = {
        (r.doc_id, r.kw_rank): (r.term, r.w_e4)
        for r in q_search_keywords_tfidf(spark, str(tmp_path)).collect()
    }

    n_docs = len(rows)
    toks = {d: [t for t in s.split(" ") if t] for d, s in rows}
    df_counts: dict = {}
    for d, ts in toks.items():
        for t in set(ts):
            df_counts[t] = df_counts.get(t, 0) + 1
    want = {}
    for d, ts in toks.items():
        if not ts:
            continue
        scored = []
        for t in set(ts):
            w = (
                ts.count(t) / len(ts)
                * (math.log((1 + n_docs) / (1 + df_counts[t])) + 1)
            )
            scored.append((round(w * 1e4), t))
        scored.sort(key=lambda x: (-x[0], x[1]))
        for i, (w_e4, t) in enumerate(scored[:KW_TOPK], start=1):
            want[(d, i)] = (t, w_e4)
    assert got == want


def test_rake_python_reference(spark):
    """search_rake_keyphrases equals an independent Python RAKE replay
    (stopword segmentation, <=3-word candidates, degree/freq e4 scores,
    (score desc, phrase) top-3)."""
    from collections import defaultdict

    from ocr_spark import spec
    from ocr_spark.queries import QUERIES, t
    import ocr_spark.queries_search  # noqa: F401

    sf = "/root/testdata/sf0.01"
    got = defaultdict(dict)
    for r in QUERIES["search_rake_keyphrases"](spark, sf).collect():
        got[r["doc_id"]][r["rank"]] = (r["phrase"], r["score_e4"])

    stops = set(spec.STOPWORDS["en"])
    for r in t(spark, sf, "documents").select("doc_id", "text").collect():
        words = [w for w in r["text"].lower().split(" ") if w]
        phrases, cur = [], []
        for w in words:
            if w in stops:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
        phrases = [p for p in phrases if len(p) <= 3]
        freq, degree = defaultdict(int), defaultdict(int)
        for p in phrases:
            for w in p:
                freq[w] += 1
                degree[w] += len(p)
        scored = {}
        for p in phrases:
            s = sum(degree[w] * 10000 // freq[w] for w in p)
            scored[" ".join(p)] = s
        top = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        want = {i + 1: kv for i, kv in enumerate(top)}
        assert got.get(r["doc_id"], {}) == want, r["doc_id"]
