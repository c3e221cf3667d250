"""Training-set preparation operators: context-window chunking, group-keyed
holdout splitting, and the cross-split near-dup leakage guard.

These are the steps between a cleaned corpus and a data loader: documents
get cut into model-context-sized token windows, assigned to train/val/test
at the GROUP level (site/source, never per-doc — per-doc splits leak
near-duplicate content across the boundary), and the split is then audited
against the MinHash candidate pairs so no near-dup pair straddles it.

Same contract as every other registry module: declarative DataFrame plans
with exactly-equivalent DuckDB oracles (value-hash checked by the driver
and tests/test_oracle.py); all randomness is md5-derived so both engines
compute identical bits; no Python UDFs; integer/string arithmetic only in
checked outputs. Plan shapes pinned in tests/test_plans.py; python
reference gates in tests/test_trainprep.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.queries import register, t
from ocr_spark.queries_textml import (
    _bands_sql,
    _minhash_sql_base,
    _WORDS_SPARK,
    _WORDS_SQL,
    NUM_PERMS,
    minhash_candidate_pairs,
)

# --- context-window chunking --------------------------------------------------------
# A model with a fixed context consumes fixed-size token windows; retrieval
# corpora want overlapping windows so no span is split across a boundary
# without context. W tokens per chunk, stride S (overlap W-S). Chunk count
# for an n-token doc: 1 if n <= W else 1 + ceil((n-W)/S) — pure integer
# arithmetic, identical in both engines. The plan is map-side only: words,
# chunk count, sequence-explode, slice — no shuffle anywhere; at 100 TB the
# chunk table is produced at scan parallelism and the explode's row
# amplification (~n/S rows per doc) is the unavoidable output size, not a
# plan artifact.

CHUNK_W = 64  # tokens per window
CHUNK_S = 48  # stride (overlap = 16)


@register(
    "pipe_chunk_windows",
    f"""
WITH d AS (
  SELECT doc_id, {_WORDS_SQL} AS words FROM documents
), c AS (
  SELECT doc_id, words, len(words) AS n,
    CASE WHEN len(words) <= {CHUNK_W} THEN 1
         ELSE CAST((len(words) - {CHUNK_W} + {CHUNK_S} - 1) // {CHUNK_S}
              AS BIGINT) + 1 END AS n_chunks
  FROM d
), e AS (
  -- scalar-list range + unnest: duckdb 1.0 rejects lateral column args
  -- to the generate_series TABLE function, but the list form is row-wise
  SELECT doc_id, words, unnest(range(0, n_chunks)) AS ci FROM c
)
SELECT doc_id, CAST(ci AS INT) AS chunk_id,
  CAST(len(words[ci * {CHUNK_S} + 1 : ci * {CHUNK_S} + {CHUNK_W}]) AS INT)
    AS n_tok,
  md5(array_to_string(
    words[ci * {CHUNK_S} + 1 : ci * {CHUNK_S} + {CHUNK_W}], ' '))
    AS chunk_md5
FROM e
""",
)
def q_pipe_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (W=64, S=48). The md5 of every
    chunk's exact text is under the driver hash, so window boundaries,
    clamping at the tail, and the empty-doc arm are all graded."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_WORDS_SPARK.format(col="text")).alias("words")
    )
    n = F.size("words").cast("bigint")
    n_chunks = F.when(n <= CHUNK_W, F.lit(1).cast("bigint")).otherwise(
        F.floor((n - CHUNK_W + CHUNK_S - 1) / CHUNK_S) + 1
    )
    c = d.select(
        "doc_id", "words",
        F.posexplode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1))
        .alias("_p", "ci"),
    )
    chunk = F.slice(
        F.col("words"), F.col("ci").cast("int") * CHUNK_S + 1, CHUNK_W
    )
    return c.select(
        "doc_id",
        F.col("ci").cast("int").alias("chunk_id"),
        F.size(chunk).alias("n_tok"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


# --- group-keyed holdout split ------------------------------------------------------
# The split key is the GROUP (source/site), not the document: two near-dup
# pages from one site must land in the same split or the holdout is
# contaminated. Assignment is a pure function of md5(seed || group) against
# fixed hex-prefix thresholds — map-only, no shuffle, identical on every
# engine/retry/cluster size, and stable when the corpus grows (adding docs
# to a group never moves the group).

SPLIT_SEED = "split-seed-1:"
_T_TRAIN = "e6"  # 230/256 ~ 90%
_T_VAL = "f3"    # 13/256  ~ 5%; rest ~5% test


def split_expr(group_col: str) -> F.Column:
    """train/val/test from the group key's seeded md5 prefix."""
    h = F.substring(F.md5(F.concat(F.lit(SPLIT_SEED), F.col(group_col))), 1, 2)
    return (
        F.when(h < _T_TRAIN, F.lit("train"))
        .when(h < _T_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def _split_sql(group_col: str) -> str:
    return (
        f"CASE WHEN substring(md5('{SPLIT_SEED}' || {group_col}), 1, 2)"
        f" < '{_T_TRAIN}' THEN 'train'"
        f" WHEN substring(md5('{SPLIT_SEED}' || {group_col}), 1, 2)"
        f" < '{_T_VAL}' THEN 'val' ELSE 'test' END"
    )


@register(
    "pipe_split_holdout",
    f"""
SELECT doc_id, source, {_split_sql('source')} AS split
FROM documents
""",
)
def q_pipe_split_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc split assignment derived from the doc's GROUP hash. Map-only
    scan+project; the per-group single-split invariant is structural (the
    assignment is a function of the group key alone) and pinned in
    tests/test_trainprep.py."""
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", "source", split_expr("source").alias("split"))


# --- cross-split leakage guard ------------------------------------------------------
# Group-keyed splitting prevents within-site leakage by construction, but
# near-duplicate content ALSO crosses sites (syndication, mirrors). The
# guard joins the MinHash band candidate pairs to the split assignment and
# flags every pair whose endpoints fall in different splits — the list a
# pipeline either drops from train or uses to veto the split seed. Cost is
# the candidate-pair join (linear band shuffle, documented in
# queries_textml) plus two broadcast-sized lookups of the per-doc split —
# at 100 TB the split column rides the existing dedup pass for free.

@register(
    "pipe_split_leakage",
    _minhash_sql_base(NUM_PERMS)
    + _bands_sql()
    + f"""
, pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.bi = b.bi AND a.band = b.band AND a.doc_id < b.doc_id
), sp AS (
  SELECT doc_id, {_split_sql('source')} AS split FROM documents
)
SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b,
  CAST(sa.split != sb.split AS INT) AS is_leak
FROM pairs p
JOIN sp sa ON p.doc_a = sa.doc_id
JOIN sp sb ON p.doc_b = sb.doc_id
""",
)
def q_pipe_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every near-dup candidate pair annotated with its endpoints' splits
    and an is_leak flag (1 = the pair straddles the holdout boundary).
    Emitting all pairs rather than only leaks keeps the driver row nonzero
    and puts the whole split join under the value hash."""
    docs = t(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, materialize_bands=True)
    sp = docs.select("doc_id", split_expr("source").alias("split"))
    sa = sp.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
        "split", "split_a"
    )
    sb = sp.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
        "split", "split_b"
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b", "split_a", "split_b",
            (F.col("split_a") != F.col("split_b")).cast("int")
            .alias("is_leak"),
        )
    )


# --- contrastive triplets (anchor / positive / hash-picked negatives) -------------
# The training-pair construction step for embedding/retrieval models:
# each document anchors a triplet family — positive = its same-source
# successor in doc_id order (the "related document" proxy; NULL for the
# last doc of a source, kept so the anchor set stays complete), and 3
# negatives drawn by hashing (anchor, slot) into the doc-id space and
# keeping only partners from a DIFFERENT source (filtered negative
# sampling: a draw landing on the anchor's own source is discarded, so
# the realized count per anchor is <= 3 with an expected (1 - 1/S)
# fraction kept — documented, not resampled, which keeps the pipeline
# one deterministic pass).
#
# Scale shape: positives are one source-keyed window Exchange; negative
# draws are map-side column math fanned x3, resolved by ONE equi-join on
# the drawn id (shuffle bounded by 3|corpus|), and the max-id normalizer
# is a 1-row broadcast. Never a cross join, never rejection loops.

_TRIP_SLOTS = 3

_TRIP_DRAW_SQL = (
    "list_aggregate(list_transform(generate_series(1, 13), k ->"
    " CAST(strpos('0123456789abcdef', substr(md5(CAST(anchor_id AS"
    " VARCHAR) || '#' || CAST(slot AS VARCHAR)), k, 1)) - 1 AS BIGINT)"
    " * (1 << (4 * (13 - k)))), 'sum')"
)

_TRIP_SQL = f"""
WITH d AS (SELECT doc_id, source FROM documents),
mx AS (SELECT max(doc_id) AS mx FROM d),
pos AS (
  SELECT doc_id, source,
    lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS pos_id
  FROM d
),
draws AS (
  SELECT p.doc_id AS anchor_id, p.source AS anchor_source, s.slot,
    {_TRIP_DRAW_SQL.replace("anchor_id", "p.doc_id")} % (mx.mx + 1)
      AS partner
  FROM d p, mx,
    (SELECT unnest([{", ".join(str(i) for i in range(1, _TRIP_SLOTS + 1))}])
       AS slot) s
)
SELECT n.anchor_id, n.anchor_source, pos.pos_id,
       CAST(n.slot AS BIGINT) AS slot,
       nd.doc_id AS neg_id, nd.source AS neg_source
FROM draws n
JOIN d nd ON nd.doc_id = n.partner AND nd.source != n.anchor_source
JOIN pos ON pos.doc_id = n.anchor_id
"""


@register("pipe_triplets", _TRIP_SQL)
def q_pipe_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive triplet construction: same-source-successor positives
    (one source window), md5-slot-drawn cross-source negatives resolved
    by one id equi-join against a broadcast max-id normalizer. See the
    block comment for the filtered-sampling yield contract."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    mx = d.agg(F.max("doc_id").alias("mx"))
    w = Window.partitionBy("source").orderBy("doc_id")
    pos = d.select(
        "doc_id", "source", F.lead("doc_id").over(w).alias("pos_id")
    )
    slots = ", ".join(str(i) for i in range(1, _TRIP_SLOTS + 1))
    draws = (
        d.crossJoin(F.broadcast(mx))
        .select(
            F.col("doc_id").alias("anchor_id"),
            F.col("source").alias("anchor_source"),
            F.expr(f"explode(array({slots}))").alias("slot"),
            "mx",
        )
        .select(
            "anchor_id",
            "anchor_source",
            "slot",
            F.expr(
                "CAST(conv(substring(md5(concat(CAST(anchor_id AS"
                " STRING), '#', CAST(slot AS STRING))), 1, 13), 16, 10)"
                " AS BIGINT) % (mx + 1)"
            ).alias("partner"),
        )
    )
    nd = d.select(
        F.col("doc_id").alias("neg_id"), F.col("source").alias("neg_source")
    )
    out = (
        draws.join(nd, draws["partner"] == nd["neg_id"])
        .filter(F.col("neg_source") != F.col("anchor_source"))
        .join(
            pos.select(
                F.col("doc_id").alias("anchor_id"), "pos_id"
            ),
            "anchor_id",
        )
    )
    return out.select(
        "anchor_id", "anchor_source", "pos_id",
        F.col("slot").cast("bigint").alias("slot"),
        "neg_id", "neg_source",
    )


# --- T5-style span corruption (round 4 close) -----------------------------------------
# The denoising-objective example builder (Raffel et al. 2020): mask
# contiguous word spans, replace each with a sentinel token, and emit
# (input_text, target_text) where the target lists each sentinel
# followed by the words it hides. Deterministic variant: the word
# sequence partitions into fixed 20-word windows; window k of a doc
# masks the 3-word span starting at md5("sc#doc#k") % (len-2) (window
# shorter than 3 words masks nothing), so spans never overlap and both
# engines rebuild byte-identical examples. All JVM array HOFs over one
# scan — corruption is a narrow map at any corpus size.

_SC_WIN = 20
_SC_LEN = 3

_SC_H = (
    "CAST(conv(substring(md5(concat('sc#', CAST(doc_id AS STRING), '#',"
    " CAST(k AS STRING))), 1, 13), 16, 10) AS BIGINT)"
)
_SC_H_SQL = (
    "list_aggregate(list_transform(generate_series(1, 13), q ->"
    " CAST(strpos('0123456789abcdef', substr(md5('sc#' ||"
    " CAST(doc_id AS VARCHAR) || '#' || CAST(k AS VARCHAR)), q, 1)) - 1"
    " AS BIGINT) * (1 << (4 * (13 - q)))), 'sum')"
)

_SC_WORDS = "filter(split(text, ' '), x -> x != '')"
_SC_WORDS_SQL = "list_filter(string_split(text, ' '), x -> x != '')"

# per window k: ww = its word slice, o = span offset (0-based), sentinel
_SC_INPUT = f"""
array_join(flatten(transform(sequence(0,
    CAST((size(w) + {_SC_WIN} - 1) div {_SC_WIN} AS INT) - 1), k ->
  CASE WHEN size(slice(w, k * {_SC_WIN} + 1, {_SC_WIN})) >= {_SC_LEN}
  THEN concat(
    slice(slice(w, k * {_SC_WIN} + 1, {_SC_WIN}), 1,
      CAST({_SC_H} % (size(slice(w, k * {_SC_WIN} + 1, {_SC_WIN}))
           - {_SC_LEN - 1}) AS INT)),
    array(concat('<extra_id_', CAST(k AS STRING), '>')),
    slice(slice(w, k * {_SC_WIN} + 1, {_SC_WIN}),
      CAST({_SC_H} % (size(slice(w, k * {_SC_WIN} + 1, {_SC_WIN}))
           - {_SC_LEN - 1}) AS INT) + {_SC_LEN + 1},
      size(slice(w, k * {_SC_WIN} + 1, {_SC_WIN}))))
  ELSE slice(w, k * {_SC_WIN} + 1, {_SC_WIN}) END)), ' ')
"""

_SC_TARGET = f"""
array_join(flatten(transform(sequence(0,
    CAST((size(w) + {_SC_WIN} - 1) div {_SC_WIN} AS INT) - 1), k ->
  CASE WHEN size(slice(w, k * {_SC_WIN} + 1, {_SC_WIN})) >= {_SC_LEN}
  THEN concat(
    array(concat('<extra_id_', CAST(k AS STRING), '>')),
    slice(slice(w, k * {_SC_WIN} + 1, {_SC_WIN}),
      CAST({_SC_H} % (size(slice(w, k * {_SC_WIN} + 1, {_SC_WIN}))
           - {_SC_LEN - 1}) AS INT) + 1, {_SC_LEN}))
  ELSE array() END)), ' ')
"""


def _sc_sql() -> str:
    ww = f"list_slice(w, k * {_SC_WIN} + 1, k * {_SC_WIN} + {_SC_WIN})"
    o = f"({_SC_H_SQL} % (len({ww}) - {_SC_LEN - 1}))"
    inp = f"""
array_to_string(flatten(list_transform(generate_series(0,
    CAST((len(w) + {_SC_WIN} - 1) // {_SC_WIN} AS INT) - 1), k ->
  CASE WHEN len({ww}) >= {_SC_LEN}
  THEN list_concat(list_concat(
    list_slice({ww}, 1, {o}),
    ['<extra_id_' || CAST(k AS VARCHAR) || '>']),
    list_slice({ww}, {o} + {_SC_LEN + 1}, len({ww})))
  ELSE {ww} END)), ' ')
"""
    tgt = f"""
array_to_string(flatten(list_transform(generate_series(0,
    CAST((len(w) + {_SC_WIN} - 1) // {_SC_WIN} AS INT) - 1), k ->
  CASE WHEN len({ww}) >= {_SC_LEN}
  THEN list_concat(['<extra_id_' || CAST(k AS VARCHAR) || '>'],
    list_slice({ww}, {o} + 1, {o} + {_SC_LEN}))
  ELSE [] END)), ' ')
"""
    return f"""
SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
  {inp} AS input_text, {tgt} AS target_text
FROM (SELECT doc_id, {_SC_WORDS_SQL} AS w FROM documents)
WHERE len(w) > 0
"""


@register("pipe_span_corruption", _sc_sql())
def q_pipe_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 denoising examples: 3-word spans masked per 20-word window at
    md5-derived offsets, sentinel tokens in the input, sentinel+words in
    the target. Narrow map; oracle rebuilds both texts byte-for-byte."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_SC_WORDS).alias("w")
    )
    return d.filter(F.expr("size(w) > 0")).select(
        "doc_id",
        F.expr("CAST(size(w) AS BIGINT)").alias("n_words"),
        F.expr(_SC_INPUT).alias("input_text"),
        F.expr(_SC_TARGET).alias("target_text"),
    )


# --- fill-in-the-middle (FIM) transform ----------------------------------------------
# The infilling objective for code/completion models (Bavarian et al.
# 2022): split each document at two hash-derived word positions into
# (prefix, middle, suffix) and emit the PSM reordering
# <fim_prefix> P <fim_suffix> S <fim_middle> M — the model learns to
# generate the middle given both sides. Cut points c1 <= c2 come from
# md5("fim{1,2}#doc") % (n_words + 1), so both engines rebuild the
# exact same example; empty segments are legal (the objective's own
# edge cases) and the round-trip P+M+S == original is pytest-pinned.
# One narrow map, like span corruption. (DuckDB gotcha under the
# hash: array_to_string of an EMPTY list is NULL there, '' in Spark
# — every oracle-side join is coalesce'd.)

_FIM_H = (
    "CAST(conv(substring(md5(concat('fim{n}#', CAST(doc_id AS STRING))),"
    " 1, 13), 16, 10) AS BIGINT)"
)
_FIM_H_SQL = (
    "list_aggregate(list_transform(generate_series(1, 13), q ->"
    " CAST(strpos('0123456789abcdef', substr(md5('fim{n}#' ||"
    " CAST(doc_id AS VARCHAR)), q, 1)) - 1 AS BIGINT)"
    " * (1 << (4 * (13 - q)))), 'sum')"
)


def _fim_sql() -> str:
    h1 = _FIM_H_SQL.format(n=1)
    h2 = _FIM_H_SQL.format(n=2)
    return f"""
SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
  CAST(c1 AS BIGINT) AS c1, CAST(c2 AS BIGINT) AS c2,
  '<fim_prefix> ' || coalesce(array_to_string(list_slice(w, 1, c1), ' '), '')
  || ' <fim_suffix> ' || coalesce(array_to_string(
       list_slice(w, c2 + 1, len(w)), ' '), '')
  || ' <fim_middle> ' || coalesce(array_to_string(
       list_slice(w, c1 + 1, c2), ' '), '') AS psm_text
FROM (
  SELECT doc_id, w,
    least({h1} % (len(w) + 1), {h2} % (len(w) + 1)) AS c1,
    greatest({h1} % (len(w) + 1), {h2} % (len(w) + 1)) AS c2
  FROM (SELECT doc_id, {_SC_WORDS_SQL} AS w FROM documents)
  WHERE len(w) > 0
)
"""


@register("pipe_fim_transform", _fim_sql())
def q_pipe_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIM/PSM infilling examples with md5-derived cut points (block
    comment): (doc_id, n_words, c1, c2, psm_text), narrow map."""
    h1 = _FIM_H.format(n=1)
    h2 = _FIM_H.format(n=2)
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_SC_WORDS).alias("w")
    ).filter(F.expr("size(w) > 0"))
    cut = d.select(
        "doc_id",
        "w",
        F.expr(
            f"least({h1} % (size(w) + 1), {h2} % (size(w) + 1))"
        ).alias("c1"),
        F.expr(
            f"greatest({h1} % (size(w) + 1), {h2} % (size(w) + 1))"
        ).alias("c2"),
    )
    return cut.select(
        "doc_id",
        F.expr("CAST(size(w) AS BIGINT)").alias("n_words"),
        F.col("c1").cast("bigint"),
        F.col("c2").cast("bigint"),
        F.expr(
            "concat('<fim_prefix> ',"
            " array_join(slice(w, 1, CAST(c1 AS INT)), ' '),"
            " ' <fim_suffix> ',"
            " array_join(slice(w, CAST(c2 AS INT) + 1,"
            "   size(w) - CAST(c2 AS INT)), ' '),"
            " ' <fim_middle> ',"
            " array_join(slice(w, CAST(c1 AS INT) + 1,"
            "   CAST(c2 AS INT) - CAST(c1 AS INT)), ' '))"
        ).alias("psm_text"),
    )


# --- preference pairs (DPO/RLHF data construction) -----------------------------------
# Preference-tuning datasets pair a better response with a worse one.
# Over a corpus the deterministic analogue ranks docs WITHIN EACH SOURCE
# by an integer quality score and pairs the i-th best with the i-th
# worst (i <= 5), keeping only pairs with a strictly positive margin.
# Quality here is the integer e4 stopword-density + length proxy (the
# text_quality family's arithmetic without its float weights):
#   q_e4 = hits * 10000 DIV n_words + least(n_chars, 2000)
# One source-keyed window Exchange; pair construction is a self-join of
# the two rank columns on (source, i) — rank-bounded, never doc x doc.

_DPO_PAIRS = 5

_DPO_Q_SPARK = (
    f"CAST(size(filter(split(lower(text), ' '), t -> array_contains("
    f"{{stops}}, t))) * 10000 AS BIGINT)"
    " DIV greatest(size(filter(split(text, ' '), x -> x != '')), 1)"
    " + least(n_chars, 2000L)"
)
_DPO_Q_SQL = (
    "CAST(len(list_filter(string_split(lower(text), ' '),"
    " t -> list_contains({stops}, t))) * 10000 AS BIGINT)"
    " // greatest(len(list_filter(string_split(text, ' '),"
    " x -> x != '')), 1)"
    " + least(n_chars, 2000)"
)


def _dpo_sql() -> str:
    from ocr_spark.queries import EN_STOP_SQL

    q = _DPO_Q_SQL.format(stops=EN_STOP_SQL)
    return f"""
WITH q AS (
  SELECT source, doc_id, {q} AS q_e4 FROM documents
),
r AS (
  SELECT source, doc_id, q_e4,
    row_number() OVER (PARTITION BY source
                       ORDER BY q_e4 DESC, doc_id) AS rb,
    row_number() OVER (PARTITION BY source
                       ORDER BY q_e4 ASC, doc_id DESC) AS rw
  FROM q
)
SELECT b.source, CAST(b.rb AS BIGINT) AS pair_idx,
  b.doc_id AS chosen_id, w.doc_id AS rejected_id,
  CAST(b.q_e4 - w.q_e4 AS BIGINT) AS margin_e4
FROM r b JOIN r w ON w.source = b.source AND w.rw = b.rb
WHERE b.rb <= {_DPO_PAIRS} AND b.q_e4 > w.q_e4
"""


@register("pipe_dpo_pairs", _dpo_sql())
def q_pipe_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference pairs per source: i-th best vs i-th worst by the
    integer quality proxy, strict-margin filter (block comment)."""
    from pyspark.sql import Window

    from ocr_spark.queries import EN_STOP_SPARK

    d = t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.expr(_DPO_Q_SPARK.format(stops=EN_STOP_SPARK)).alias("q_e4"),
    )
    wb = Window.partitionBy("source").orderBy(
        F.desc("q_e4"), F.asc("doc_id")
    )
    ww = Window.partitionBy("source").orderBy(
        F.asc("q_e4"), F.desc("doc_id")
    )
    r = d.select(
        "source", "doc_id", "q_e4",
        F.row_number().over(wb).alias("rb"),
        F.row_number().over(ww).alias("rw"),
    )
    b = r.filter(F.col("rb") <= _DPO_PAIRS).select(
        "source",
        F.col("rb").alias("pair_idx"),
        F.col("doc_id").alias("chosen_id"),
        F.col("q_e4").alias("qb"),
    )
    w = r.select(
        F.col("source").alias("wsource"),
        F.col("rw").alias("wrank"),
        F.col("doc_id").alias("rejected_id"),
        F.col("q_e4").alias("qw"),
    )
    return (
        b.join(
            w,
            (F.col("wsource") == F.col("source"))
            & (F.col("wrank") == F.col("pair_idx")),
        )
        .filter(F.col("qb") > F.col("qw"))
        .select(
            "source",
            F.col("pair_idx").cast("bigint"),
            "chosen_id",
            "rejected_id",
            F.expr("CAST(qb - qw AS BIGINT)").alias("margin_e4"),
        )
    )
