"""Full-text retrieval operators: inverted-index build, BM25 ranked
search, and positional phrase matching.

A webtext corpus is not only filtered and deduplicated — it is SEARCHED:
retrieval-augmented training, eval-set mining, and corpus debugging all
want "which documents match this query, ranked". The Spark-first shapes:

* ``search_postings`` — the classic inverted-index build: one explode of
  the token array and ONE shuffle on (term, doc_id). Document length (the
  BM25 ``dl``) is computed map-side from the token array and carried
  *through* the explode as a grouping column (functionally dependent on
  doc_id, so it adds no cardinality), which removes the postings⋈docs
  join every naive formulation pays. At 100 TB this is the linear index
  pass; partitioning the output by term is what makes query-time pruned.
* ``search_bm25_topk`` — query-time scoring. Query terms and the corpus
  stats (N, avgdl, per-term df) are tiny and BROADCAST; the corpus-sized
  postings stream joins against them map-side, so the only shuffles are
  the index build itself and the final per-doc score aggregation over the
  *matched* postings (a few rows per query term per doc, not the corpus).
  The top-k is TakeOrderedAndProject (per-partition heads + driver merge
  of k rows), never a global sort.
* ``search_phrase`` — the standard positional-postings phrase plan:
  postings carry token positions; a phrase "w1 w2" is p1 ⋈ p2 on
  (doc_id, p2.pos = p1.pos + 1) with each side pre-filtered to one term.
  Only the term-filtered slivers of the index shuffle. The phrase itself
  is data-derived (the corpus's most frequent bigram) so the query is
  deterministic at every scale factor with no hard-coded vocabulary.

Float determinism follows the engine convention (see queries_webgraph's
quality-LR notes): the single libm call (ln for idf) and the IEEE-exact
arithmetic around it are quantized to e4 fixed-point PER (term, doc)
posting, and everything after that is BIGINT — so cross-engine equality
is integer equality and aggregation order cannot matter. BM25 constants
k1 = 1.2, b = 0.75 are written as e-notation literals ("12e-1") because a
plain decimal literal parses as DECIMAL in DuckDB but DOUBLE in Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.queries import register, t
from ocr_spark.queries_textml import _WORDS_SPARK, _WORDS_SQL

# BM25 constants (Robertson/Okapi defaults).
BM25_K1 = "12e-1"  # 1.2
BM25_B = "75e-2"   # 0.75
BM25_TOPK = 20
N_QUERY_TERMS = 3

# Shared oracle CTE: tokenized docs with dl, and the (term, doc_id, tf, dl)
# postings. len() returns BIGINT in DuckDB; Spark sizes are cast to match.
_POSTINGS_CTE_SQL = f"""
d AS (
  SELECT doc_id, {_WORDS_SQL} AS words FROM documents
), tok AS (
  SELECT doc_id, CAST(len(words) AS BIGINT) AS dl, unnest(words) AS term
  FROM d
), post AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf, dl
  FROM tok GROUP BY term, doc_id, dl
)
"""


def _postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, doc_id, tf, dl) inverted index. dl rides the explode so no
    join back to the documents table is ever needed."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_WORDS_SPARK.format(col="text")).alias("words")
    )
    tok = d.select(
        "doc_id",
        F.size("words").cast("bigint").alias("dl"),
        F.explode("words").alias("term"),
    )
    return tok.groupBy("term", "doc_id", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    ).select("term", "doc_id", "tf", "dl")


@register(
    "search_postings",
    f"""
WITH {_POSTINGS_CTE_SQL}
SELECT term, doc_id, tf, dl FROM post
""",
)
def q_search_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: every (term, doc_id, tf, dl) posting is under
    the driver value-hash, so tokenization, tf counting, and the dl
    carry-through are all graded row-exactly."""
    return _postings(spark, sf_dir)


# --- BM25 ranked search --------------------------------------------------------------
# idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))        (one libm call)
# tfnorm   = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
# contrib  = round(idf * tfnorm * 1e4)  → BIGINT per (term, doc) posting
# score_e4 = sum(contrib) per doc       → integer aggregation, order-free
# Query terms are the corpus's N_QUERY_TERMS highest-df terms (ties by
# term ASC) — deterministic, data-derived, no fixed vocabulary.

_IDF_SQL = (
    "ln(1e0 + (CAST(n_docs - df AS DOUBLE) + 5e-1)"
    " / (CAST(df AS DOUBLE) + 5e-1))"
)
_TFNORM_SQL = (
    f"CAST(tf AS DOUBLE) * ({BM25_K1} + 1e0)"
    f" / (CAST(tf AS DOUBLE) + {BM25_K1}"
    f" * (1e0 - {BM25_B} + {BM25_B} * CAST(dl AS DOUBLE) / avgdl))"
)
_CONTRIB_SQL = (
    f"CAST(round({_IDF_SQL} * {_TFNORM_SQL} * 1e4, 0) AS BIGINT)"
)


@register(
    "search_bm25_topk",
    f"""
WITH {_POSTINGS_CTE_SQL},
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term
), qt AS (
  SELECT term, df FROM df ORDER BY df DESC, term ASC LIMIT {N_QUERY_TERMS}
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(len(words)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM d
), contrib AS (
  SELECT post.doc_id, {_CONTRIB_SQL} AS c_e4
  FROM post JOIN qt ON post.term = qt.term CROSS JOIN stats
)
SELECT doc_id, CAST(sum(c_e4) AS BIGINT) AS score_e4,
  CAST(count(*) AS BIGINT) AS n_match
FROM contrib GROUP BY doc_id
ORDER BY score_e4 DESC, doc_id ASC LIMIT {BM25_TOPK}
""",
)
def q_search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{k}: highest-df query terms, e4-quantized per-posting
    contributions, integer per-doc sums, TakeOrderedAndProject top-k."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_WORDS_SPARK.format(col="text")).alias("words")
    )
    post = _postings(spark, sf_dir)
    # df is vocabulary-sized; the top-N query terms and the 1-row corpus
    # stats are broadcast so scoring never reshuffles the postings.
    df_ = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qt = df_.orderBy(F.col("df").desc(), F.col("term").asc()).limit(
        N_QUERY_TERMS
    )
    stats = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.sum(F.size("words").cast("bigint")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    contrib = (
        post.join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.expr(_CONTRIB_SQL).alias("c_e4"))
    )
    scored = contrib.groupBy("doc_id").agg(
        F.sum("c_e4").cast("bigint").alias("score_e4"),
        F.count(F.lit(1)).cast("bigint").alias("n_match"),
    )
    return scored.orderBy(
        F.col("score_e4").desc(), F.col("doc_id").asc()
    ).limit(BM25_TOPK)


# --- positional phrase match ---------------------------------------------------------
# The phrase is the corpus's most frequent adjacent bigram (ties: bigram
# ASC). Derivation is map-side array math; the MATCH is the real
# positional-postings self-join — the plan a phrase query runs against an
# index at scale, where only the two term-filtered slivers move.


@register(
    "search_phrase",
    f"""
WITH d AS (
  SELECT doc_id, {_WORDS_SQL} AS words FROM documents
), d2 AS (
  SELECT doc_id, words FROM d WHERE len(words) >= 2
), e AS (
  SELECT doc_id, words, unnest(range(1, len(words))) AS i FROM d2
), bg AS (
  SELECT words[i] || ' ' || words[i + 1] AS bigram, count(*) AS n
  FROM e GROUP BY 1
), top1 AS (
  SELECT bigram FROM bg ORDER BY n DESC, bigram ASC LIMIT 1
)
SELECT e.doc_id, top1.bigram AS bigram,
  CAST(count(*) AS BIGINT) AS n_occ
FROM e CROSS JOIN top1
WHERE e.words[e.i] || ' ' || e.words[e.i + 1] = top1.bigram
GROUP BY e.doc_id, top1.bigram
""",
)
def q_search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc occurrence counts of the corpus's top bigram, matched via
    the positional-postings self-join (p2.pos = p1.pos + 1)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_WORDS_SPARK.format(col="text")).alias("words")
    ).where(F.size("words") >= 2)
    # Top bigram: map-side sequence/element_at (sequence(1, n-1) is safe —
    # n >= 2 here; Spark's sequence DESCENDS for stop < start, hence the
    # filter above) then one agg. Vocabulary²-bounded, tiny.
    bg = d.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(words) - 1), i ->"
                " concat(element_at(words, i), ' ',"
                " element_at(words, i + 1)))"
            )
        ).alias("bigram")
    ).groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    top1 = bg.orderBy(F.col("n").desc(), F.col("bigram").asc()).limit(1)

    # Positional postings (doc_id, pos, term); pos is 1-based to match the
    # oracle's 1-based list indexing.
    pos = d.select(
        "doc_id", F.posexplode("words").alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    w1 = F.split(F.col("bigram"), " ").getItem(0)
    w2 = F.split(F.col("bigram"), " ").getItem(1)
    phrase = F.broadcast(top1.select(
        "bigram", w1.alias("w1"), w2.alias("w2")
    ))
    p1 = pos.crossJoin(phrase).where(F.col("term") == F.col("w1")).select(
        "doc_id", "pos", "bigram"
    )
    p2 = pos.crossJoin(phrase).where(F.col("term") == F.col("w2")).select(
        F.col("doc_id").alias("doc_id2"), F.col("pos").alias("pos2")
    )
    hits = p1.join(
        p2,
        (F.col("doc_id") == F.col("doc_id2"))
        & (F.col("pos2") == F.col("pos") + 1),
    )
    return hits.groupBy("doc_id", "bigram").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ")
    )


# --- tf-idf keyword extraction --------------------------------------------------------
# The per-document "what is this page about" signal that feeds corpus data
# cards, topic sampling, and search snippets. sklearn-style smooth idf
# (one libm call, quantized e4 per posting BEFORE the window):
#   idf(t)  = ln((1 + N) / (1 + df(t))) + 1
#   w(t, d) = tf / dl * idf(t)
#   keep the top KW_TOPK terms per doc by (w_e4 DESC, term ASC)
# Plan: postings (one explode + one shuffle) ⋈ df on term — df is
# vocabulary-sized, so this is an honest same-key shuffle join, NOT a
# broadcast — then ONE window per doc_id. The window partition is bounded
# by a document's distinct-term count (≤ dl), so no skew: there is no
# "viral term" problem because the partition key is doc_id, not term.

KW_TOPK = 5

_KW_W_E4_SQL = (
    "CAST(round(CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE)"
    " * (ln((1e0 + CAST(n_docs AS DOUBLE)) / (1e0 + CAST(df AS DOUBLE)))"
    " + 1e0) * 1e4, 0) AS BIGINT)"
)


@register(
    "search_keywords_tfidf",
    f"""
WITH {_POSTINGS_CTE_SQL},
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term
), nd AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), w AS (
  SELECT post.doc_id, post.term, {_KW_W_E4_SQL} AS w_e4
  FROM post JOIN df ON post.term = df.term CROSS JOIN nd
), r AS (
  SELECT doc_id, term, w_e4,
    row_number() OVER (PARTITION BY doc_id
                       ORDER BY w_e4 DESC, term ASC) AS kw_rank
  FROM w
)
SELECT doc_id, CAST(kw_rank AS INT) AS kw_rank, term, w_e4
FROM r WHERE kw_rank <= {KW_TOPK}
""",
)
def q_search_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{KW_TOPK} tf-idf keywords per document, e4-quantized per posting
    so the ranking (and the hash) is pure integer comparison."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    post = _postings(spark, sf_dir)
    df_ = post.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    nd = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    w = (
        post.join(df_, "term")
        .crossJoin(F.broadcast(nd))
        .select("doc_id", "term", F.expr(_KW_W_E4_SQL).alias("w_e4"))
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("w_e4").desc(), F.col("term").asc()
    )
    return (
        w.withColumn("kw_rank", F.row_number().over(win))
        .filter(F.col("kw_rank") <= KW_TOPK)
        .select("doc_id", F.col("kw_rank").cast("int"), "term", "w_e4")
    )


# --- query-dependent snippets ---------------------------------------------------------
# The search-results face: for every document matching the query term, the
# +/-2-word window around its FIRST occurrence. The query term is data-
# derived (the corpus's highest-df term, ties by term ASC — same derivation
# as BM25's query set). Spark shape: NO explode at all — first-occurrence
# position is one array_position per row and the window is one slice, so
# the whole match+snippet pass is map-side against the broadcast query
# term; at 100 TB only the (rare) per-doc result rows move.

SNIP_W = 5  # window width in words (2 left + hit + 2 right)


@register(
    "search_snippets",
    f"""
WITH {_POSTINGS_CTE_SQL},
df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term
), qt AS (
  SELECT term AS qterm FROM df ORDER BY df DESC, term ASC LIMIT 1
), d2 AS (
  SELECT doc_id, words AS w, qterm,
    CAST(list_position(words, qterm) AS INT) AS pos
  FROM d CROSS JOIN qt
)
SELECT doc_id, qterm, pos,
  array_to_string(
    w[greatest(1, pos - 2) : least(len(w), greatest(1, pos - 2) + {SNIP_W} - 1)],
    ' ') AS snippet
FROM d2 WHERE pos > 0
""",
)
def q_search_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence snippet per matching doc; position and window both
    under the value hash (an off-by-one in the slice breaks it)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_WORDS_SPARK.format(col="text")).alias("w")
    )
    post = _postings(spark, sf_dir)
    qt = (
        post.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(1)
        .select(F.col("term").alias("qterm"))
    )
    d2 = d.crossJoin(F.broadcast(qt)).select(
        "doc_id",
        "w",
        "qterm",
        F.expr("CAST(array_position(w, qterm) AS INT)").alias("pos"),
    )
    return d2.filter(F.col("pos") > 0).select(
        "doc_id",
        "qterm",
        "pos",
        F.expr(
            f"array_join(slice(w, greatest(1, pos - 2),"
            f" least(size(w), greatest(1, pos - 2) + {SNIP_W} - 1)"
            f" - greatest(1, pos - 2) + 1), ' ')"
        ).alias("snippet"),
    )


# --- RAKE keyphrase extraction (round 4 close) ---------------------------------------
# Rose et al. 2010: candidate phrases are maximal stopword-free word
# runs; each word scores degree/freq (degree = sum of the lengths of
# the phrases it appears in, freq = its occurrence count among
# candidates), and a phrase scores the sum of its member word scores —
# per-document, corpus-free (the complement of tf-idf, which needs the
# corpus df join). Integer spelling: word score e4 = degree * 10000 DIV
# freq; phrase score = sum of member e4 scores; top-3 phrases per doc
# by (score desc, phrase asc). Phrase segmentation is gaps-and-islands:
# phrase id = running count of stopword boundaries in (doc, pos) order
# — every exchange in the plan is doc-keyed. Candidates cap at 3 words
# (RAKE's usual adjoining limit), dropped beyond, documented here.

_RAKE_TOPK = 3
_RAKE_MAXLEN = 3


def _rake_sql() -> str:
    from ocr_spark.queries import EN_STOP_SQL

    return f"""
WITH w AS (
  SELECT doc_id, pos, wd,
    CASE WHEN list_contains({EN_STOP_SQL}, wd) THEN 1 ELSE 0 END AS st
  FROM (
    SELECT doc_id,
      generate_subscripts(ws, 1) AS pos, unnest(ws) AS wd
    FROM (
      SELECT doc_id,
        list_filter(string_split(lower(text), ' '), x -> x != '') AS ws
      FROM documents
    )
  )
),
seg AS (
  SELECT doc_id, pos, wd, st,
    sum(st) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS UNBOUNDED PRECEDING) AS pid
  FROM w
),
ph AS (
  SELECT doc_id, pid,
    array_to_string(list(wd ORDER BY pos), ' ') AS phrase,
    list(wd ORDER BY pos) AS members,
    count(*) AS plen
  FROM seg WHERE st = 0
  GROUP BY 1, 2
  HAVING count(*) <= {_RAKE_MAXLEN}
),
ws AS (
  SELECT doc_id, wd,
    count(*) AS freq, sum(plen) AS degree
  FROM (SELECT doc_id, plen, unnest(members) AS wd FROM ph)
  GROUP BY 1, 2
),
psc AS (
  SELECT m.doc_id, m.pid, m.phrase,
    sum(ws.degree * 10000 // ws.freq) AS score_e4
  FROM (SELECT doc_id, pid, phrase, unnest(members) AS wd FROM ph) m
  JOIN ws ON ws.doc_id = m.doc_id AND ws.wd = m.wd
  GROUP BY 1, 2, 3
),
dedup AS (
  SELECT doc_id, phrase, max(score_e4) AS score_e4
  FROM psc GROUP BY 1, 2
)
SELECT doc_id, phrase, CAST(score_e4 AS BIGINT) AS score_e4,
  CAST(rk AS BIGINT) AS rank
FROM (
  SELECT doc_id, phrase, score_e4,
    row_number() OVER (PARTITION BY doc_id
                       ORDER BY score_e4 DESC, phrase) AS rk
  FROM dedup
) WHERE rk <= {_RAKE_TOPK}
"""


@register("search_rake_keyphrases", _rake_sql())
def q_search_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc RAKE top-3 keyphrases, integer degree/freq scores, every
    exchange doc-keyed (block comment)."""
    from pyspark.sql import Window

    from ocr_spark.queries import EN_STOP_SPARK

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "filter(split(lower(text), ' '), x -> x != '')"
        ).alias("ws"),
    )
    w = d.select(
        "doc_id", F.posexplode("ws").alias("pos0", "wd")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "wd",
        F.expr(
            f"CASE WHEN array_contains({EN_STOP_SPARK}, wd)"
            " THEN 1 ELSE 0 END"
        ).alias("st"),
    )
    wseg = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    seg = w.withColumn("pid", F.sum("st").over(wseg))
    ph = (
        seg.filter(F.col("st") == 0)
        .groupBy("doc_id", "pid")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(pos, wd))), s -> s.wd), ' ')"
            ).alias("phrase"),
            F.expr(
                "transform(array_sort(collect_list(struct(pos, wd))),"
                " s -> s.wd)"
            ).alias("members"),
            F.count("*").alias("plen"),
        )
        .filter(F.col("plen") <= _RAKE_MAXLEN)
    )
    m = ph.select(
        "doc_id", "pid", "phrase", "plen",
        F.explode("members").alias("wd"),
    )
    ws = m.groupBy("doc_id", "wd").agg(
        F.count("*").alias("freq"), F.sum("plen").alias("degree")
    )
    psc = (
        m.join(ws, ["doc_id", "wd"])
        .groupBy("doc_id", "pid", "phrase")
        .agg(
            F.expr("sum(degree * 10000 DIV freq)").alias("score_e4")
        )
    )
    dedup = psc.groupBy("doc_id", "phrase").agg(
        F.max("score_e4").alias("score_e4")
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.desc("score_e4"), F.asc("phrase")
    )
    return (
        dedup.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _RAKE_TOPK)
        .select(
            "doc_id", "phrase",
            F.col("score_e4").cast("bigint"),
            F.col("rk").cast("bigint").alias("rank"),
        )
    )
