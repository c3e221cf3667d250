"""Training-data pipeline operators: dedup, similarity search, text analysis,
multimodal stubs (task brief "beyond the reference" requirements).

All hash-based operators use md5 (identical hex in Spark and DuckDB) so even
the MinHash/SimHash outputs are value-checked against the oracle — no
engine-specific hash functions in checked paths.
"""

from __future__ import annotations

import hashlib as _hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_spark.queries import _LANG_CASE_SPARK, _LANG_CASE_SQL, register, t
from ocr_spark import spec

# --- exact dedup ---------------------------------------------------------------

@register(
    "dedup_exact",
    """
SELECT md5(text) AS digest, count(*) AS n_dups, min(doc_id) AS keeper
FROM documents GROUP BY md5(text)
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("digest")).agg(
        F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper")
    )


# --- MinHash signatures + LSH candidate pairs ------------------------------------
# Shingles: word 3-grams. Signature_i = min over shingles of a Broder-style
# linear permutation hash (see the block comment below) — identical integer
# arithmetic in both engines, so the signatures are value-checked against
# the oracle. Standard banding: NUM_PERMS perms split into BANDS bands of
# ROWS_PER_BAND rows; candidate pair iff any full band matches.
#
# Skew safety (the 100 TB property): a doc with < 3 words has NO shingles and
# therefore no meaningful MinHash — at web scale that segment (near-empty /
# boilerplate-only pages) is huge, and routing it into any shared band key
# would create one quadratic mega-bucket in the self-join. Such docs are
# excluded from banding entirely (``size(sh) > 0``); exact dedup (md5 groupBy)
# still covers them. tests/test_textml_scale.py asserts the max band-bucket
# size stays bounded on a 10k near-empty-doc corpus.

NUM_PERMS = 16
BANDS = 4
ROWS_PER_BAND = NUM_PERMS // BANDS

# Production default: 64 perms / 16 bands (still 4 rows per band). Banding
# math (P[candidate] = 1 - (1 - s^r)^b): both widths put the S-curve
# threshold (1/b)^(1/r) at a near-dup-ish Jaccard, but the MISS rate at the
# s=0.8 operating point differs decisively — 16/4 misses 1-(1-0.8^4)^4 ≈
# 12.4% of true 0.8-dups, 64/16 misses (1-0.8^4)^16 ≈ 0.022%. The false-
# positive side stays cheap: at s=0.3, P ≈ 0.12 (64/16) vs 0.032 (16/4) —
# candidates are verified exactly (dedup_jaccard) anyway, so the extra
# verify work is the price of 560x fewer missed dups. Signature cost is
# linear in width (one shingle hash + num_perms multiply-add-mods per
# shingle); bench.py records the measured 16-vs-64 cost on this host as
# dedup_minhash_{pairs,groups}_64p16b. The registry queries keep 16/4 so
# the sf0.01 DuckDB oracle compare stays cheap; both widths run through
# the same parameterized pipeline.
PROD_NUM_PERMS = 64
PROD_BANDS = 16

# NB: guarded with IF, not greatest(size-2, 0): Spark's sequence(1, 0) is a
# DESCENDING [1, 0] (not empty), which under ANSI mode turns a < 3-word doc
# into an element_at out-of-bounds error
_SHINGLES_SPARK = (
    "IF(size(w) < 3, array(),"
    " transform(sequence(1, size(w) - 2),"
    " i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1),"
    " element_at(w, i + 2))))"
)
_SHINGLES_SQL = (
    "list_transform(generate_series(1, greatest(len(w) - 2, 0)),"
    " i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])"
)

# empty tokens (doubled/leading/trailing separators) are dropped before
# shingling: otherwise every whitespace-only doc collapses onto the same
# degenerate shingle -> identical signature -> one quadratic band bucket
_WORDS_SPARK = "filter(split({col}, ' '), x -> x != '')"
_WORDS_SQL = "list_filter(string_split(text, ' '), x -> x != '')"


# Permutations are Broder-style linear hashes over ONE md5 per shingle:
# h(s) = first 7 hex digits of md5(s) as an integer (28 bits), then
# sig_i = min over shingles of (a_i * h(s) + b_i) mod P with P prime and
# deterministic md5-derived (a_i, b_i). The round-1 form computed num_perms
# separate md5('s<i>|'||s) per shingle — 16x the hashing for the same
# statistical machinery; the linear form is one hash + num_perms
# multiply-add-mods. Bounds: a_i < P < 2^29, h < 2^28 → a*h+b < 2^57, no
# bigint overflow in either engine (Spark ANSI would error, not wrap).

_MH_PRIME = 536_870_909  # largest prime < 2^29


def _mh_const(tag: str, i: int) -> int:
    return int(_hashlib.md5(f"{tag}{i}".encode()).hexdigest()[:7], 16)


def _mh_ab(num_perms: int) -> tuple[list[int], list[int]]:
    a = [_mh_const("a", i) % (_MH_PRIME - 1) + 1 for i in range(num_perms)]
    b = [_mh_const("b", i) % _MH_PRIME for i in range(num_perms)]
    return a, b


# shingle -> 28-bit integer hash, both dialects (md5 hex is lowercase in both)
_SHASH_SPARK = "CAST(conv(substring(md5(s), 1, 7), 16, 10) AS BIGINT)"
_SHASH_SQL = (
    "list_aggregate(list_transform(generate_series(1, 7),"
    " k -> CAST(strpos('0123456789abcdef', substr(md5(s), k, 1)) - 1"
    " AS BIGINT) * (1 << (4 * (7 - k)))), 'sum')"
)


# The signature array is generated with one EXPLICIT slot per permutation
# (scalar a_i/b_i literals baked in), not a loop indexing literal arrays:
# element_at(array(<16 literals>), i) inside a lambda re-materializes the
# literal array per element evaluation in both engines — measured ~20s at
# sf0.1 vs ~1s for the expanded form (the same hoisting lesson as the
# stopword arrays in queries.py).
def _sigs_spark(num_perms: int) -> str:
    a, b = _mh_ab(num_perms)
    slots = ", ".join(
        f"array_min(transform(hv, v -> pmod({ai}L * v + {bi}L,"
        f" {_MH_PRIME}L)))"
        for ai, bi in zip(a, b)
    )
    return f"array({slots})"


def _sigs_sql(num_perms: int) -> str:
    a, b = _mh_ab(num_perms)
    slots = ", ".join(
        f"list_aggregate(list_transform(hv, v -> ({ai} * v + {bi})"
        f" % {_MH_PRIME}), 'min')"
        for ai, bi in zip(a, b)
    )
    return f"[{slots}]"


def _minhash_sql_base(num_perms: int) -> str:
    return f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
shd AS (SELECT doc_id, {_SHINGLES_SQL} AS sh FROM w),
hvd AS (
  SELECT doc_id, list_transform(sh, s -> {_SHASH_SQL}) AS hv
  FROM shd WHERE len(sh) > 0
),
sig AS (
  SELECT doc_id, {_sigs_sql(num_perms)} AS sigs FROM hvd
)
"""


def _bands_sql(
    bands: int = BANDS, rows_per_band: int = ROWS_PER_BAND
) -> str:
    """DuckDB CTE continuing ``_minhash_sql_base``: one (doc_id, bi, band)
    row per signature band — the oracle mirror of minhash_band_keys."""
    return f"""
, bands AS (
  SELECT doc_id, CAST(b AS INT) AS bi,
    array_to_string(sigs[b * {rows_per_band} + 1 : b * {rows_per_band}
      + {rows_per_band}], '#') AS band
  FROM sig, generate_series(0, {bands - 1}) AS t(b)
)"""


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = NUM_PERMS,
) -> DataFrame:
    """(id, sigs: array<bigint>[num_perms]) for every doc with >=1 shingle.

    Per-row map only — scale-safe. Docs without shingles (< 3 words) are
    dropped here by design; see the module comment on the mega-bucket."""
    # the shingle-existence filter is expressed on the WORDS (>= 3 nonempty
    # tokens <=> >= 1 shingle) and applied before any derivation: a filter
    # on size(sh) pushes below the projection and forces the whole
    # words->shingles chain to be computed twice per row (measured ~4x the
    # cost of the derivations themselves at sf0.1)
    d = docs.filter(
        F.expr(f"size({_WORDS_SPARK.format(col=text_col)}) >= 3")
    )
    d = d.withColumn("w", F.expr(_WORDS_SPARK.format(col=text_col)))
    d = d.withColumn("sh", F.expr(_SHINGLES_SPARK))
    d = d.withColumn("hv", F.expr(f"transform(sh, s -> {_SHASH_SPARK})"))
    return d.select(F.col(id_col), F.expr(_sigs_spark(num_perms)).alias("sigs"))


def minhash_band_keys(
    sig: DataFrame,
    bands: int = BANDS,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """Explode a signature into (doc_id, bi, band) — band = the concatenated
    rows of band bi. The LSH shuffle key."""
    return sig.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"concat_ws('#', transform(slice(sigs, b * {rows_per_band}"
                f" + 1, {rows_per_band}), x -> CAST(x AS STRING))))"
            )
        ).alias("bi", "band"),
    )


def minhash_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = NUM_PERMS,
    bands: int = BANDS,
    materialize_bands: bool = False,
) -> DataFrame:
    """LSH banding self-join: shuffle on the (bi, band) key — a hash join
    over band buckets, never an all-pairs comparison.

    The two join sides are identical subplans, and ReuseExchange USED to
    compute the signature pipeline once; under Spark 4.1's AQE that reuse
    no longer fires (measured r05: 0 ReusedExchange, the 64-perm shingle
    pipeline and its scan ran twice). ``materialize_bands=True`` eagerly
    localCheckpoints the (doc_id, bi, band) frame so both sides read the
    materialized copy (~35% faster at production width, sf0.1). Default
    stays False so funnel/pipeline composition keeps the lazy contract;
    the standalone graded/bench entries opt in. EAGER when True: Spark
    jobs run at DataFrame-construction time.

    Caveat at scale: the OUTPUT is inherently quadratic in the size of a
    true duplicate cluster (1M identical docs = 5·10^11 pairs) — that is a
    property of "emit all candidate pairs", not of the plan. For the dedup
    DECISION use :func:`minhash_group_reps`, whose output is linear."""
    sig = minhash_signatures(docs, text_col, id_col, num_perms)
    b = minhash_band_keys(sig, bands, num_perms // bands)
    if materialize_bands:
        b = b.localCheckpoint(eager=True)
    a_, b_ = b.alias("a"), b.alias("b")
    return (
        a_.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_group_reps(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = NUM_PERMS,
    bands: int = BANDS,
    materialize_bands: bool = False,
) -> DataFrame:
    """The scale-safe dedup DECISION: each doc mapped to a cluster
    representative (the minimum doc_id over every bucket the doc shares) —
    one star-pattern pass, so the output is LINEAR in the corpus no matter
    how large a duplicate cluster is, unlike the all-pairs listing. Docs
    whose rep equals themselves are the keepers. (A single pass
    under-merges chains A~B~C where A,C never share a bucket; iterate
    rep-of-rep to a fixpoint for full connected components — each iteration
    is the same two linear shuffles.)

    The band-keys frame feeds two non-identical consumers (bucket-min agg
    + join back), which Spark never exchange-reuses, so the signature
    pipeline runs twice by default. ``materialize_bands=True`` (EAGER:
    jobs at construction time) localCheckpoints it once — same trade and
    same measured ~35% win as :func:`minhash_candidate_pairs`; the
    groupBy-min + AQE-skew-splittable join-back shape is kept either way
    (a window over (bi, band) would hot-spot on viral buckets)."""
    sig = minhash_signatures(docs, text_col, id_col, num_perms)
    b = minhash_band_keys(sig, bands, num_perms // bands)
    if materialize_bands:
        b = b.localCheckpoint(eager=True)
    bmin = b.groupBy("bi", "band").agg(F.min("doc_id").alias("bmin"))
    return (
        b.join(bmin, ["bi", "band"])
        .groupBy("doc_id")
        .agg(F.min("bmin").alias("rep"))
    )


@register(
    "dedup_minhash_sig",
    _minhash_sql_base(NUM_PERMS)
    + "SELECT doc_id, array_to_string(sigs, '#') AS sigs_str FROM sig",
)
def q_dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the signature is exposed '#'-joined rather than as array<bigint>: the
    # driver's pandas canonicalizer sorts/hashes raw cells and list cells are
    # unhashable there (r02 red row); the join is lossless and mirrored in
    # the DuckDB oracle
    sig = minhash_signatures(t(spark, sf_dir, "documents"))
    return sig.select(
        "doc_id",
        F.array_join(
            F.expr("transform(sigs, x -> CAST(x AS STRING))"), "#"
        ).alias("sigs_str"),
    )


@register(
    "dedup_minhash_pairs",
    _minhash_sql_base(NUM_PERMS)
    + _bands_sql()
    + """
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.bi = b.bi AND a.band = b.band AND a.doc_id < b.doc_id
""",
)
def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_candidate_pairs(
        t(spark, sf_dir, "documents"), materialize_bands=True
    )


@register(
    "dedup_minhash_groups",
    _minhash_sql_base(NUM_PERMS)
    + _bands_sql()
    + """
, bm AS (
  SELECT bi, band, min(doc_id) AS bmin FROM bands GROUP BY bi, band
)
SELECT b.doc_id, min(bm.bmin) AS rep
FROM bands b JOIN bm ON b.bi = bm.bi AND b.band = bm.band
GROUP BY b.doc_id
""",
)
def q_dedup_minhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_group_reps(
        t(spark, sf_dir, "documents"), materialize_bands=True
    )


@register(
    "dedup_minhash_prod",
    _minhash_sql_base(PROD_NUM_PERMS)
    + _bands_sql(PROD_BANDS, PROD_NUM_PERMS // PROD_BANDS)
    + """
, bm AS (
  SELECT bi, band, min(doc_id) AS bmin FROM bands GROUP BY bi, band
)
SELECT b.doc_id, min(bm.bmin) AS rep
FROM bands b JOIN bm ON b.bi = bm.bi AND b.band = bm.band
GROUP BY b.doc_id
""",
)
def q_dedup_minhash_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup decision at the PRODUCTION MinHash width (64 perms / 16
    bands — see the PROD_NUM_PERMS banding math above): driver-graded
    evidence that the parameterized signature/banding pipeline is correct
    at the width a real near-dup pass uses, not only at the 16-perm oracle
    width. Same linear-output star-pass plan as dedup_minhash_groups."""
    return minhash_group_reps(
        t(spark, sf_dir, "documents"),
        num_perms=PROD_NUM_PERMS,
        bands=PROD_BANDS,
        materialize_bands=True,
    )


_CC_SQL = (
    # the recursive reachability walk needs the RECURSIVE keyword on the
    # shared CTE list; the walk itself is over the doc-doc pair edges of the
    # band buckets — fine for an sf0.01 oracle, quadratic in dup-cluster
    # size at scale, which is exactly why the Spark side propagates over the
    # bipartite doc-bucket graph instead (functions/graph.py module note)
    _minhash_sql_base(NUM_PERMS).replace("WITH w AS", "WITH RECURSIVE w AS", 1)
    + _bands_sql()
    + """
, edges AS (
  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
  FROM bands a JOIN bands b
    ON a.bi = b.bi AND a.band = b.band AND a.doc_id <> b.doc_id
),
reach AS (
  SELECT doc_id, doc_id AS r FROM sig
  UNION
  SELECT e.dst AS doc_id, reach.r
  FROM reach JOIN edges e ON e.src = reach.doc_id
)
SELECT doc_id, min(r) AS rep FROM reach GROUP BY doc_id
"""
)


@register("dedup_cc", _CC_SQL)
def q_dedup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL connected-components dedup decision: min-label propagation to a
    fixpoint over the doc–bucket bipartite graph
    (functions/graph.bucket_connected_components), closing the star-pass
    under-merge caveat of dedup_minhash_groups — chains A~B~C where A and C
    never share a band bucket now land in one cluster. Output is linear in
    the corpus (one (doc_id, rep) row per banded doc); every round is two
    linear shuffles and pair edges are never materialized, so a 1M-copy
    cluster costs 1M membership rows, not 5·10^11 pair rows. Oracle: DuckDB
    recursive-CTE reachability over the same band graph."""
    from ocr_spark.functions.graph import bucket_connected_components

    sig = minhash_signatures(t(spark, sf_dir, "documents"))
    return bucket_connected_components(minhash_band_keys(sig))


# --- SimHash (16-bit, md5-derived bit planes) -------------------------------------

_HI = "('8','9','a','b','c','d','e','f')"

_SIMHASH_SPARK = (
    "aggregate(transform(sequence(1, 16), j -> IF("
    " aggregate(w, 0, (acc, t) -> acc +"
    f" IF(substring(md5(t), j, 1) IN {_HI}, 1, -1)) > 0,"
    " shiftleft(1, j - 1), 0)), 0, (s, v) -> s + v)"
)
_SIMHASH_SQL = (
    "list_aggregate(list_transform(generate_series(1, 16), j -> CASE WHEN"
    " list_aggregate(list_transform(w, t -> CASE WHEN"
    f" substr(md5(t), j, 1) IN {_HI} THEN 1 ELSE -1 END), 'sum') > 0"
    " THEN (1 << (j - 1)) ELSE 0 END), 'sum')"
)


@register(
    "dedup_simhash",
    f"""
SELECT doc_id, CAST({_SIMHASH_SQL} AS INT) AS simhash16
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
""",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").withColumn("w", F.split("text", " "))
    return d.select(
        "doc_id", F.expr(_SIMHASH_SPARK).cast("int").alias("simhash16")
    )


# --- n-gram Jaccard near-dup --------------------------------------------------

@register(
    "dedup_jaccard",
    _minhash_sql_base(NUM_PERMS)
    + _bands_sql()
    + """
, cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.bi = b.bi AND a.band = b.band AND a.doc_id < b.doc_id
), d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents
)
SELECT c.doc_a, c.doc_b,
  CAST(round(
    len(list_filter(da.ws, x -> list_contains(db.ws, x))) * 1000000.0
    / (len(da.ws) + len(db.ws)
       - len(list_filter(da.ws, x -> list_contains(db.ws, x)))),
    0) AS BIGINT) AS jaccard_ppm
FROM cand c
JOIN d da ON da.doc_id = c.doc_a
JOIN d db ON db.doc_id = c.doc_b
""",
)
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard, VERIFY stage of the standard LSH near-dup
    pipeline: candidates come from the MinHash band buckets (the same
    bucketed equi-join as dedup_minhash_pairs — linear-ish, never
    all-pairs), then each candidate pair is scored exactly. This replaces
    the round-1/2 doc_id-window candidate device, which existed only to
    make the oracle cheap and said nothing about real similarity locality.

    Scale shape: band self-join shuffles on the band key; the two
    score-side joins are hash joins on doc_id, moving only candidate rows
    plus each doc's distinct-word set — all linear in corpus + candidate
    count."""
    docs = t(spark, sf_dir, "documents")
    cand = minhash_candidate_pairs(docs, materialize_bands=True)
    d = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("ws")
    )
    a = d.alias("a")
    b = d.alias("b")
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws")))
    union = F.size(F.col("a.ws")) + F.size(F.col("b.ws")) - inter
    return (
        cand.join(a, F.col("doc_a") == F.col("a.doc_id"))
        .join(b, F.col("doc_b") == F.col("b.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(inter * 1000000.0 / union, 0)
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )


# --- similarity search over embeddings ---------------------------------------

from ocr_spark.queries_fns import _DOT_SPARK, _DOT_SQL, _NORM_SPARK, _NORM_SQL  # noqa: E402


@register(
    "sim_cosine_topk",
    f"""
SELECT e.vec_id, e.label,
  CAST(round({_DOT_SQL}
    / ({_NORM_SQL.format(col='embedding')} * {_NORM_SQL.format(col='probe')}),
    6) AS DOUBLE) AS cosine
FROM embeddings e
CROSS JOIN (SELECT embedding AS probe FROM embeddings WHERE vec_id = 0) p
WHERE e.vec_id <> 0
ORDER BY cosine DESC, e.vec_id
LIMIT 20
""",
)
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the exact baseline). At cluster scale this
    is a broadcast of the probe + a TakeOrderedAndProject — no shuffle of
    the embedding table itself."""
    e = t(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("probe"))
    cos = F.expr(
        f"round({_DOT_SPARK} / ({_NORM_SPARK.format(col='embedding')}"
        f" * {_NORM_SPARK.format(col='probe')}), 6)"
    ).cast("double")
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(20)
    )


# Random-hyperplane LSH: plane j's component for dim d is +1/-1 from
# md5("p<j>_<d>") — deterministic CONSTANTS, so the whole sign matrix is
# precomputed here (same md5, hashlib side) and embedded as a literal. The
# round-1 expression re-evaluated 8 planes x 64 dims of md5() per ROW — 512
# interpreted hash calls per vector — which dominated every bucket-using
# query (bucket values are bit-identical to the old form; the oracle checks
# that).

_DIM = 64  # driver embeddings dimension (verified across all SFs)
_N_PLANES = 8


def _plane_sign(j: int, d: int) -> float:
    h = _hashlib.md5(f"p{j}_{d}".encode()).hexdigest()[0]
    return 1.0 if h in "89abcdef" else -1.0


_PLANES = [
    [_plane_sign(j, d) for d in range(1, _DIM + 1)]
    for j in range(1, _N_PLANES + 1)
]
_PLANES_SPARK = "array(" + ", ".join(
    "array(" + ", ".join(f"{v}D" for v in row) + ")" for row in _PLANES
) + ")"
_PLANES_SQL = "[" + ", ".join(
    "[" + ", ".join(str(v) for v in row) + "]" for row in _PLANES
) + "]"

_BUCKET_SPARK = (
    f"CAST(aggregate(transform(sequence(1, {_N_PLANES}), j -> IF("
    f"aggregate(zip_with(embedding, element_at({_PLANES_SPARK}, j),"
    " (x, p) -> CAST(x AS DOUBLE) * p), CAST(0.0 AS DOUBLE),"
    " (s, v) -> s + v) > 0D, shiftleft(1, j - 1), 0)),"
    " 0, (s, v) -> s + v) AS INT)"
)
_BUCKET_SQL = (
    f"CAST(list_aggregate(list_transform(generate_series(1, {_N_PLANES}),"
    " j -> CASE WHEN list_aggregate(list_transform("
    " generate_series(1, len(embedding)),"
    f" d -> CAST(embedding[d] AS DOUBLE) * ({_PLANES_SQL})[j][d]), 'sum') > 0"
    " THEN (1 << (j - 1)) ELSE 0 END), 'sum') AS INT)"
)


def _bucket_sql_tag(tag: str, n_planes: int = _N_PLANES) -> str:
    """DuckDB bucket expr for an arbitrary plane family `tag` — the oracle
    mirror of functions.ann.bucket_expr (tag 'p' reproduces _BUCKET_SQL's
    values bit-for-bit; other tags are the extra LSH tables)."""
    from ocr_spark.functions.ann import _sign

    planes = "[" + ", ".join(
        "[" + ", ".join(
            str(_sign(tag, j, d)) for d in range(1, _DIM + 1)
        ) + "]"
        for j in range(1, n_planes + 1)
    ) + "]"
    return (
        f"CAST(list_aggregate(list_transform(generate_series(1, {n_planes}),"
        " j -> CASE WHEN list_aggregate(list_transform("
        " generate_series(1, len(embedding)),"
        f" d -> CAST(embedding[d] AS DOUBLE) * ({planes})[j][d]), 'sum') > 0"
        " THEN (1 << (j - 1)) ELSE 0 END), 'sum') AS INT)"
    )


@register(
    "sim_ann_lsh",
    f"SELECT vec_id, {_BUCKET_SQL} AS bucket FROM embeddings",
)
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bit random-hyperplane LSH bucket per vector (the ANN scale path:
    search only within the probe's bucket; a shuffle on `bucket` replaces
    the all-pairs scan)."""
    e = t(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.expr(_BUCKET_SPARK).alias("bucket"))


@register(
    "sim_ann_search",
    f"""
WITH b AS (
  SELECT vec_id, label, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
), p AS (
  SELECT vec_id AS probe_id, embedding AS probe, bucket AS pbucket
  FROM b WHERE vec_id % 50 = 0
), scored AS (
  SELECT p.probe_id, c.vec_id, c.label,
    CAST(round({_DOT_SQL}
      / ({_NORM_SQL.format(col='embedding')} * {_NORM_SQL.format(col='probe')}),
      6) AS DOUBLE) AS cosine
  FROM b c JOIN p ON c.bucket = p.pbucket AND c.vec_id <> p.probe_id
)
SELECT probe_id, vec_id, label, cosine FROM (
  SELECT probe_id, vec_id, label, cosine,
    row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= 5
""",
)
def q_sim_ann_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN scale path: candidates restricted to each probe's own LSH
    bucket (single-probe, no Hamming fan-out — the recall/cost floor the
    multiprobe variant improves on), exact cosine re-rank within the
    bucket, per-probe window top-k.

    CHANGED post-r03 grading: the r03 form used ONE probe (vec_id=0),
    whose bucket happens to be empty of co-residents at sf0.01, so the
    driver row was green on 0 rows — no value-hash signal. Now a probe
    TABLE (vec_id % 50 = 0 → 10 probes at sf0.01, 18 result rows), same
    plan family as production batch ANN: probes broadcast while small (at
    cluster scale the identical plan shuffles both sides on `bucket`),
    candidates never leave their bucket, ranking shuffle keyed by
    probe_id. Leads the r05 regrade list (see _PRIORITY_R05 note)."""
    e = t(spark, sf_dir, "embeddings").withColumn(
        "bucket", F.expr(_BUCKET_SPARK)
    )
    probes = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe"),
        F.col("bucket").alias("pbucket"),
    )
    cos = F.expr(
        f"round({_DOT_SPARK} / ({_NORM_SPARK.format(col='embedding')}"
        f" * {_NORM_SPARK.format(col='probe')}), 6)"
    ).cast("double")
    scored = e.join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("pbucket"))
        & (F.col("vec_id") != F.col("probe_id")),
    ).select("probe_id", "vec_id", "label", cos.alias("cosine"))
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "dedup_embcos",
    f"""
WITH b AS (
  SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
), c AS (
  SELECT a.vec_id AS vec_a, bb.vec_id AS vec_b,
         a.embedding AS embedding, bb.embedding AS probe
  FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
), s AS (
  SELECT vec_a, vec_b,
    CAST(round({_DOT_SQL}
      / ({_NORM_SQL.format(col='embedding')} * {_NORM_SQL.format(col='probe')}),
      6) AS DOUBLE) AS cosine
  FROM c
)
SELECT vec_a, vec_b, cosine FROM s WHERE cosine >= 0.3
""",
)
def q_dedup_embcos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (the fifth dedup family from the brief):
    candidate pairs are generated by the SAME random-hyperplane LSH buckets
    as the ANN path — a self-equi-join on `bucket`, never an all-pairs scan
    (mirrors minhash_candidate_pairs' banding; at scale the shuffle key is
    the bucket id and a vector only meets its bucket-mates) — then exact
    cosine prunes to pairs above the threshold."""
    e = t(spark, sf_dir, "embeddings").withColumn("bucket", F.expr(_BUCKET_SPARK))
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("embedding"),
        F.col("bucket").alias("bkt_a"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("probe"),
        F.col("bucket").alias("bkt_b"),
    )
    cos = F.expr(
        f"round({_DOT_SPARK} / ({_NORM_SPARK.format(col='embedding')}"
        f" * {_NORM_SPARK.format(col='probe')}), 6)"
    ).cast("double")
    return (
        a.join(
            b,
            (F.col("bkt_a") == F.col("bkt_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.3)
    )


@register(
    "sim_ann_multiprobe",
    f"""
WITH b AS (
  SELECT vec_id, label, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
), p AS (
  SELECT vec_id AS probe_id, embedding AS probe,
    unnest([bucket] || list_transform(generate_series(1, {_N_PLANES}),
      j -> xor(bucket, CAST(1 << (j - 1) AS INT)))) AS pbucket
  FROM b WHERE vec_id % 100 = 0
), scored AS (
  SELECT p.probe_id, c.vec_id, c.label,
    CAST(round({_DOT_SQL}
      / ({_NORM_SQL.format(col='embedding')} * {_NORM_SQL.format(col='probe')}),
      6) AS DOUBLE) AS cosine
  FROM b c JOIN p ON c.bucket = p.pbucket AND c.vec_id <> p.probe_id
)
SELECT probe_id, vec_id, label, cosine FROM (
  SELECT probe_id, vec_id, label, cosine,
    row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= 5
""",
)
def q_sim_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN — the actual training-data shape: a probe TABLE, not one
    vector. TRUE multi-probe: each probe is exploded into its own bucket
    plus the {_N_PLANES} Hamming-distance-1 neighbor buckets (one
    hyperplane flipped), so near-misses on a single plane still surface —
    the standard recall lever for hyperplane LSH. The candidate side stays
    an equi-join on `bucket` (probes broadcast while small; at larger
    probe counts the same plan shuffles both sides on `bucket`), then
    per-probe window top-k. Probe fan-out is 1 + n_planes rows per probe —
    a constant factor on the SMALL side only; each candidate still meets a
    probe at most once (the probed buckets are distinct), so no dedup
    stage is needed. Never all-pairs; the ranking shuffle is keyed by
    probe_id — all scale-safe."""
    e = t(spark, sf_dir, "embeddings").withColumn("bucket", F.expr(_BUCKET_SPARK))
    probes = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {_N_PLANES}), j -> IF(j = 0,"
                " bucket, CAST(bucket ^ shiftleft(1, j - 1) AS INT)))"
            )
        ).alias("pbucket"),
    )
    cos = F.expr(
        f"round({_DOT_SPARK} / ({_NORM_SPARK.format(col='embedding')}"
        f" * {_NORM_SPARK.format(col='probe')}), 6)"
    ).cast("double")
    scored = (
        e.join(
            F.broadcast(probes),
            (F.col("bucket") == F.col("pbucket"))
            & (F.col("vec_id") != F.col("probe_id")),
        )
        .select("probe_id", "vec_id", "label", cos.alias("cosine"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "sim_ann_2table",
    f"""
WITH b0 AS (SELECT vec_id, {_BUCKET_SQL} AS bucket FROM embeddings),
p0 AS (SELECT vec_id AS probe_id, bucket FROM b0 WHERE vec_id % 100 = 0),
b1 AS (SELECT vec_id, {_bucket_sql_tag('p1t')} AS bucket FROM embeddings),
p1 AS (SELECT vec_id AS probe_id, bucket FROM b1 WHERE vec_id % 100 = 0)
SELECT DISTINCT probe_id, vec_id FROM (
  SELECT p0.probe_id, c.vec_id FROM b0 c JOIN p0 ON c.bucket = p0.bucket
  UNION ALL
  SELECT p1.probe_id, c.vec_id FROM b1 c JOIN p1 ON c.bucket = p1.bucket
) u
WHERE vec_id <> probe_id
""",
)
def q_sim_ann_2table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH candidate generation (functions/ann.py's recall
    lever, driver-graded): the union of bucket equi-joins under two
    independent md5-derived plane families, deduped — every table is the
    same scale-safe bucket-keyed join, and adding tables multiplies the
    small probe side only. Recall effect measured in BENCH/ANN.md."""
    from ocr_spark.functions.ann import lsh_candidates

    e = t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe"),
    )
    return lsh_candidates(e, probes, n_planes=8, n_tables=2)


# IVF (inverted-file) ANN skeleton: a deterministic coarse quantizer (K seed
# centroids), per-vector assignment to its nearest centroid (the inverted
# list), probe search restricted to the nprobe nearest lists. The argmin
# key is a scalar composite — round(L2 * 1e6) * K + cent_id — so both
# engines pick the same list (quantized distance, cent_id tie-break) with
# plain min()/arg_min (DuckDB 1.0 has no struct-keyed arg_min).

_IVF_K = 8
_IVF_NPROBE = 2

_L2_SQL = (
    "list_aggregate(list_transform(generate_series(1, len({v})),"
    " d -> (CAST({v}[d] AS DOUBLE) - CAST({c}[d] AS DOUBLE))"
    " * (CAST({v}[d] AS DOUBLE) - CAST({c}[d] AS DOUBLE))), 'sum')"
)
_L2_SPARK = (
    "aggregate(zip_with({v}, {c}, (x, y) ->"
    " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
    " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
    " CAST(0.0 AS DOUBLE), (s, z) -> s + z)"
)
_IVF_KEY_SQL = (
    f"CAST(round(({{d}}) * 1000000, 0) AS BIGINT) * {_IVF_K} + {{cid}}"
)
_IVF_KEY_SPARK = (
    f"CAST(round(({{d}}) * 1000000, 0) AS BIGINT) * {_IVF_K} + {{cid}}"
)


_IVF_DOT = _DOT_SQL.replace("embedding", "a.embedding").replace(
    "probe", "p.probe"
)
_IVF_NE = _NORM_SQL.format(col="a.embedding")
_IVF_NP = _NORM_SQL.format(col="p.probe")


@register(
    "sim_ann_ivf",
    f"""
WITH cent AS (
  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
  WHERE vec_id < {_IVF_K}
), assign AS (
  SELECT e.vec_id, e.label, e.embedding,
    CAST(min({_IVF_KEY_SQL.format(
        d=_L2_SQL.format(v='e.embedding', c='c.cvec'), cid='c.cent_id')})
      % {_IVF_K} AS BIGINT) AS list_id
  FROM embeddings e CROSS JOIN cent c
  GROUP BY e.vec_id, e.label, e.embedding
), probe_lists AS (
  SELECT c.cent_id AS plist
  FROM cent c CROSS JOIN (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0) p
  ORDER BY {_IVF_KEY_SQL.format(
      d=_L2_SQL.format(v='p.pv', c='c.cvec'), cid='c.cent_id')}
  LIMIT {_IVF_NPROBE}
)
SELECT a.vec_id, a.label,
  CAST(round({_IVF_DOT}
    / ({_IVF_NE} * {_IVF_NP}), 6) AS DOUBLE) AS cosine
FROM assign a
JOIN probe_lists pl ON a.list_id = pl.plist
CROSS JOIN (SELECT embedding AS probe FROM embeddings WHERE vec_id = 0) p
WHERE a.vec_id <> 0
ORDER BY cosine DESC, a.vec_id
LIMIT 10
""",
)
def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: K-seed coarse quantizer → inverted lists → probe the nprobe
    nearest lists → exact cosine top-k inside them. At scale: the centroid
    table is tiny and broadcast (assignment is a per-row map over the
    vectors, one pass); the inverted-list restriction replaces the full scan
    with ~nprobe/K of the data, shuffled only by the final top-k
    (TakeOrderedAndProject — no global sort)."""
    e = t(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )
    key = F.expr(
        _IVF_KEY_SPARK.format(
            d=_L2_SPARK.format(v="embedding", c="cvec"), cid="cent_id"
        )
    )
    assign = (
        e.crossJoin(F.broadcast(cent))
        .withColumn("_k", key)
        .groupBy("vec_id", "label", "embedding")
        .agg(F.min("_k").alias("_mk"))
        .select(
            "vec_id", "label", "embedding",
            (F.col("_mk") % _IVF_K).cast("bigint").alias("list_id"),
        )
    )
    probe = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("pv")
    )
    probe_lists = (
        cent.crossJoin(F.broadcast(probe))
        .select(
            "cent_id",
            F.expr(
                _IVF_KEY_SPARK.format(
                    d=_L2_SPARK.format(v="pv", c="cvec"), cid="cent_id"
                )
            ).alias("_k"),
        )
        .orderBy("_k")
        .limit(_IVF_NPROBE)
        .select(F.col("cent_id").alias("plist"))
    )
    pv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("probe"))
    cos = F.expr(
        f"round({_DOT_SPARK} / ({_NORM_SPARK.format(col='embedding')}"
        f" * {_NORM_SPARK.format(col='probe')}), 6)"
    ).cast("double")
    return (
        assign.join(F.broadcast(probe_lists), F.col("list_id") == F.col("plist"))
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(pv))
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )


_IVF_SAMPLE_MOD = 5  # ivf_train_centroids default train-sample stride


@register(
    "sim_ann_ivf_trained",
    f"""
WITH seeds AS (
  SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings
  WHERE vec_id < {_IVF_K}
), tassign AS (
  SELECT e.vec_id, e.embedding,
    CAST(min({_IVF_KEY_SQL.format(
        d=_L2_SQL.format(v='e.embedding', c='c.cvec'), cid='c.cent_id')})
      % {_IVF_K} AS BIGINT) AS list_id
  FROM embeddings e CROSS JOIN seeds c
  WHERE e.vec_id % {_IVF_SAMPLE_MOD} = 0
  GROUP BY e.vec_id, e.embedding
), dims AS (
  SELECT list_id, generate_subscripts(embedding, 1) AS d,
    unnest(embedding) AS v
  FROM tassign
), means AS (
  SELECT list_id, d, avg(CAST(v AS DOUBLE)) AS m
  FROM dims GROUP BY list_id, d
), tvecs AS (
  SELECT list_id, list(CAST(m AS REAL) ORDER BY d) AS tvec
  FROM means GROUP BY list_id
), cent AS (
  SELECT s.cent_id, coalesce(t.tvec, s.cvec) AS cvec
  FROM seeds s LEFT JOIN tvecs t ON s.cent_id = t.list_id
), assign AS (
  SELECT e.vec_id, e.label, e.embedding,
    CAST(min({_IVF_KEY_SQL.format(
        d=_L2_SQL.format(v='e.embedding', c='c.cvec'), cid='c.cent_id')})
      % {_IVF_K} AS BIGINT) AS list_id
  FROM embeddings e CROSS JOIN cent c
  GROUP BY e.vec_id, e.label, e.embedding
), probe_lists AS (
  SELECT c.cent_id AS plist
  FROM cent c CROSS JOIN (SELECT embedding AS pv FROM embeddings WHERE vec_id = 0) p
  ORDER BY {_IVF_KEY_SQL.format(
      d=_L2_SQL.format(v='p.pv', c='c.cvec'), cid='c.cent_id')}
  LIMIT {_IVF_NPROBE}
)
SELECT a.vec_id, a.label,
  CAST(round({_IVF_DOT}
    / ({_IVF_NE} * {_IVF_NP}), 6) AS DOUBLE) AS cosine
FROM assign a
JOIN probe_lists pl ON a.list_id = pl.plist
CROSS JOIN (SELECT embedding AS probe FROM embeddings WHERE vec_id = 0) p
WHERE a.vec_id <> 0
ORDER BY cosine DESC, a.vec_id
LIMIT 10
""",
)
def q_sim_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with TRAINED centroids (round-4 regrade of the ann.py
    maturity work): seeds = first K vectors, ONE Lloyd iteration on the
    deterministic vec_id%5 sample (functions/ann.ivf_train_centroids —
    broadcast-argmin assignment on the quantized scalar key, one shuffle
    keyed by (list_id, dim) for the per-dim means), then the same
    inverted-list probe search as sim_ann_ivf over the trained table.
    DuckDB mirrors the full train+search pipeline — seeds → sample
    assignment → per-dim means (REAL-cast like the Spark side) →
    fallback-coalesce → quantized reassignment → nprobe lists → exact
    cosine top-10."""
    from ocr_spark.functions.ann import ivf_train_centroids, ivf_topk

    e = t(spark, sf_dir, "embeddings")
    cent = ivf_train_centroids(e, _IVF_K, _IVF_SAMPLE_MOD)
    probes = e.filter(F.col("vec_id") == 0).select(
        F.lit(0).cast("long").alias("probe_id"),
        F.col("embedding").alias("probe"),
    )
    topk = ivf_topk(
        e, cent, probes, nprobe=_IVF_NPROBE, k=10, n_lists=_IVF_K
    )
    return (
        topk.join(e.select("vec_id", "label"), "vec_id")
        .select("vec_id", "label", "cosine")
    )


# --- text analysis -------------------------------------------------------------

_LANGS = list(spec.STOPWORDS.keys())


def _hits_spark(lg: str) -> str:
    from ocr_spark.queries import _spark_array

    return (
        f"size(filter(w, t -> array_contains("
        f"{_spark_array(spec.STOPWORDS[lg])}, lower(t))))"
    )


def _hits_sql(lg: str) -> str:
    from ocr_spark.queries import _sql_list

    return (
        f"len(list_filter(w, t -> list_contains("
        f"{_sql_list(spec.STOPWORDS[lg])}, lower(t))))"
    )


def _argmax_case(hits_fn) -> str:
    # fixed tie order: first language in _LANGS order with the max hit count
    conds = []
    for lg in _LANGS:
        others = " AND ".join(
            f"{hits_fn(lg)} >= {hits_fn(o)}" for o in _LANGS if o != lg
        )
        conds.append(f"WHEN {others} THEN '{lg}'")
    return "CASE " + " ".join(conds) + " ELSE 'und' END"


@register(
    "text_langid",
    f"""
SELECT doc_id, lang AS lang_true, {_argmax_case(_hits_sql)} AS lang_pred
FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)
""",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hit counts are materialized as columns first (one filter scan per
    # language), then the argmax CASE compares plain int columns — the
    # naive inline form re-runs each filter scan per pairwise comparison.
    # (A token -> language-bitmask map was tried and did NOT help: Spark map
    # literals are array-backed, so element_at is a linear scan over all
    # ~500 keys — the same work as the 5 per-language array scans.)
    d = t(spark, sf_dir, "documents").withColumn("w", F.split("text", " "))
    for lg in _LANGS:
        d = d.withColumn(f"h_{lg}", F.expr(_hits_spark(lg)))
    argmax = _argmax_case(lambda lg: f"h_{lg}")
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_true"),
        F.expr(argmax).alias("lang_pred"),
    )


def with_langid(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Add the stopword-hit-argmax language prediction as ``out_col``.

    The production lang-recovery move for un-tagged crawl data (WARC
    archives carry no language tag): same frozen per-language hit counting
    as the ``text_langid`` registry row, pure JVM column exprs, no
    shuffle. Docs matching no list at all predict 'und'.
    """
    d = df.withColumn("_liw", F.split(F.col(text_col), " "))
    for lg in _LANGS:
        d = d.withColumn(
            f"_lih_{lg}", F.expr(_hits_spark(lg).replace("w,", "_liw,"))
        )
    argmax = _argmax_case(lambda lg: f"_lih_{lg}")
    return d.withColumn(out_col, F.expr(argmax)).drop(
        "_liw", *(f"_lih_{lg}" for lg in _LANGS)
    )


@register(
    "text_quality",
    f"""
SELECT doc_id,
  CAST(round(
    0.4 * least(1.0, n_chars / 500.0)
  + 0.3 * (len(list_filter(w, t -> list_contains({_LANG_CASE_SQL}, lower(t))))
           * 1.0 / len(w))
  + 0.3 * least(1.0, len(w) / 80.0), 6) AS DOUBLE) AS quality
FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w FROM documents)
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hoist the per-language stopword array OUT of the lambda: a lambda body
    # re-evaluates its expressions per array element, so inlining the CASE
    # would rebuild the ~100-element array once per token (measured 100x
    # slower at sf0.1)
    d = (
        t(spark, sf_dir, "documents")
        .withColumn("w", F.split("text", " "))
        .withColumn("stops", F.expr(_LANG_CASE_SPARK))
    )
    return d.select(
        "doc_id",
        F.expr(
            "CAST(round(0.4 * least(1.0D, n_chars / 500.0D)"
            " + 0.3 * (size(filter(w, t -> array_contains(stops,"
            " lower(t)))) * 1.0D / size(w))"
            " + 0.3 * least(1.0D, size(w) / 80.0D), 6) AS DOUBLE)"
        ).alias("quality"),
    )


@register(
    "text_tokens",
    """
SELECT doc_id,
  len(string_split(text, ' ')) AS n_ws_tokens,
  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_ish
FROM documents WHERE doc_id % 8 = 0
""",
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 8 == 0)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.expr("regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')").alias("n_bpe_ish"),
    )


@register(
    "text_fingerprint",
    """
SELECT doc_id,
  md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp_md5,
  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
    AS fp_bag
FROM documents
""",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("fp_md5"),
        F.md5(
            F.array_join(F.sort_array(F.array_distinct(F.split("text", " "))), " ")
        ).alias("fp_bag"),
    )


# --- multimodal stubs -------------------------------------------------------------

@register(
    "mm_decode_stub",
    """
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  CAST(octet_length(encode(text)) % 640 AS INT) AS fake_width,
  CAST(octet_length(encode(text)) % 480 AS INT) AS fake_height
FROM documents WHERE doc_id % 13 = 0
""",
)
def q_mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: treat a binary column as an opaque media payload
    and run a mapInPandas feature-extraction stage. Real decode is stubbed
    (no image/audio libs in this container — see
    ocr_spark.operators.multimodal) but the Spark-side schema, batching and
    UDF signature are real and value-checked via the deterministic fake."""
    from ocr_spark.operators.multimodal import decode_features

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0)
    payload = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return decode_features(payload, id_col="doc_id")


@register(
    "mm_resize_stub",
    """
SELECT doc_id, 128 AS width, 128 AS height,
  hex(encode(substring(text, 1, 256))) AS resized_hex,
  CAST(octet_length(encode(substring(text, 1, 256))) AS INT) AS resized_bytes
FROM documents WHERE doc_id % 17 = 0
-- driver tables' text is pure ASCII (verified at every SF), so char slicing
-- here equals the engine's byte slicing
""",
)
def q_mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-stage plumbing (binary in -> binary out + typed dims via
    mapInPandas); the deterministic fake is value-checked by the oracle.
    The binary output is hex-encoded at the query boundary ONLY — the
    driver's pandas canonicalizer cannot hash bytearray cells (r02 red
    row); resize_images itself still produces real binary."""
    from ocr_spark.operators.multimodal import resize_images

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 0)
    payload = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    out = resize_images(payload, 128, 128, id_col="doc_id")
    return out.withColumn("resized_hex", F.hex("resized")).drop("resized")


@register(
    "mm_frames_stub",
    """
WITH v AS (
  SELECT doc_id, text, 1 + length(text) % 4 AS n_frames
  FROM documents WHERE doc_id % 19 = 0
)
SELECT doc_id,
  CAST(unnest(generate_series(0, n_frames - 1)) AS INT) AS frame_idx,
  hex(encode(substring(text,
    unnest(generate_series(0, n_frames - 1))
      * greatest(1, length(text) // n_frames) + 1, 16))) AS frame_hex
FROM v
-- ASCII text (verified): char offsets/lengths equal the engine's byte math
""",
)
def q_mm_frames_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one payload row -> N frame rows via
    mapInPandas fan-out; deterministic fake, value-checked. Frames are
    hex-encoded at the query boundary only (driver canonicalizer cannot
    hash bytearray cells — r02 red row); sample_frames stays binary."""
    from ocr_spark.operators.multimodal import sample_frames

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 19 == 0)
    payload = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    out = sample_frames(payload, id_col="doc_id", max_frames=4)
    return out.withColumn("frame_hex", F.hex("frame")).drop("frame")


# --- language-recovering extraction under the value hash ------------------------------
# Grades operators/extract.extract_pages_langid end to end: synthesize
# UNTAGGED (lang=NULL) pages whose stopword filler is drawn from the TRUE
# language's frozen list, run the REAL path (parse -> full-block-text
# langid -> per-block density re-score -> classify -> assemble), and the
# oracle recomputes everything — the per-language hit counts, the argmax
# tie order, the density against the PREDICTED language's list, and the
# content decision — in closed form. A wrong prediction, a wrong re-score
# list, or a density computed against DEFAULT_LANG all break the hash.

_LID_FILLERS = {
    lg: " ".join(sorted(ws)[:12]) for lg, ws in spec.STOPWORDS.items()
}
_LID_K_SQL = "greatest(1, CAST(round(n_chars / 80.0, 0) AS INT))"
_LID_FILLER_CASE_SQL = "CASE " + " ".join(
    f"WHEN lang = '{lg}' THEN '{f} '" for lg, f in _LID_FILLERS.items()
) + " ELSE 'the of and ' END"


def _lid_oracle() -> str:
    from ocr_spark.queries import _LANG_CASE_SQL

    argmax = _argmax_case(_hits_sql)
    return f"""
WITH f AS (
  SELECT doc_id,
    trim(regexp_replace(
      repeat({_LID_FILLER_CASE_SQL}, {_LID_K_SQL}) || text,
      '\\s+', ' ', 'g')) AS ptext
  FROM documents
), ww AS (
  SELECT doc_id, ptext, string_split(ptext, ' ') AS w FROM f
), pred AS (
  SELECT doc_id, ptext, w, {argmax} AS lang FROM ww
), c AS (
  SELECT doc_id, ptext, lang,
    length(ptext) AS tl,
    len(w) AS nw,
    len(list_filter(w, t -> list_contains({_LANG_CASE_SQL},
        trim(lower(t), '.,;:!?"''()[]{{}}')))) AS ns
  FROM pred
), r AS (
  SELECT doc_id, lang,
    CASE WHEN tl >= 20 AND ns * 1.0 / nw >= 0.30 THEN ptext ELSE '' END
      AS extracted_text
  FROM c
)
SELECT 'lid://' || CAST(doc_id AS VARCHAR) AS url,
       lang AS lang_rec,
       extracted_text,
       sha256(extracted_text) AS text_sha256
FROM r
"""


@register("extract_langid_wrapped", None)  # oracle built lazily below
def q_extract_langid_wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_spark.operators.extract import extract_pages_langid

    d = t(spark, sf_dir, "documents")
    filler = "CASE " + " ".join(
        f"WHEN lang = '{lg}' THEN '{f} '"
        for lg, f in _LID_FILLERS.items()
    ) + " ELSE 'the of and ' END"
    pages = d.select(
        F.concat(F.lit("lid://"), F.col("doc_id").cast("string")).alias(
            "url"
        ),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><body><p>"),
                F.expr(f"repeat({filler}, {_LID_K_SQL})"),
                F.col("text"),
                F.lit("</p></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),  # UNTAGGED: the point
    )
    ex = extract_pages_langid(pages)
    return ex.select(
        "url",
        F.col("lang").alias("lang_rec"),
        "extracted_text",
        "text_sha256",
    )


# --- containment near-dup (round 4 late) ----------------------------------------------
# Broder's OTHER similarity measure: containment c(A,B) = |A∩B| / |A| over
# shingle sets. Resemblance (Jaccard) LSH structurally MISSES asymmetric
# pairs — a 30-word quote embedded in a 3000-word page has Jaccard ≈ 0.01
# but containment ≈ 1.0 — and quote/subset detection is exactly what a
# training-corpus pipeline needs when pages wholesale-embed other pages.
# Candidates therefore do NOT come from the resemblance bands; they come
# from a shingle inverted index:
#
#   inv    = (shingle, doc) over DISTINCT per-doc 3-word shingles (linear)
#   df cap = shingles shared by > MAX_DF docs are dropped from candidate
#            generation (boilerplate stop-shingles; the same knob as the
#            substring family's max_df — without it one viral shingle
#            makes a quadratic bucket)
#   pairs  = self-join on the shingle key, count shared shingles per pair,
#            keep pairs sharing >= MIN_SHARED (prunes incidental overlap
#            before the expensive verify)
#   verify = EXACT containment from the full (uncapped) shingle sets —
#            the df cap only gates candidate generation, never the score.
#
# Quadratic only within a df-capped shingle's posting list (<= MAX_DF^2
# per shingle), the same documented bound as every LSH bucket join here.

CONT_MAX_DF = 64     # posting-list cap for candidate generation
CONT_MIN_SHARED = 3  # shared distinct shingles to become a candidate pair


@register(
    "dedup_containment",
    f"""
WITH w0 AS (
  SELECT doc_id, {_WORDS_SQL} AS w FROM documents
), d AS (
  SELECT doc_id,
    list_distinct({_SHINGLES_SQL}) AS sh
  FROM w0
), inv AS (
  SELECT doc_id, unnest(sh) AS s FROM d
), keep AS (
  SELECT s FROM inv GROUP BY s
  HAVING count(*) BETWEEN 2 AND {CONT_MAX_DF}
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM (SELECT i.doc_id, i.s FROM inv i JOIN keep USING (s)) a
  JOIN (SELECT i.doc_id, i.s FROM inv i JOIN keep USING (s)) b
    ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= {CONT_MIN_SHARED}
)
SELECT c.doc_a, c.doc_b,
  CAST(round(len(list_filter(da.sh, x -> list_contains(db.sh, x)))
    * 1000000.0 / len(da.sh), 0) AS BIGINT) AS cont_a_ppm,
  CAST(round(len(list_filter(da.sh, x -> list_contains(db.sh, x)))
    * 1000000.0 / len(db.sh), 0) AS BIGINT) AS cont_b_ppm
FROM cand c
JOIN d da ON da.doc_id = c.doc_a
JOIN d db ON db.doc_id = c.doc_b
""",
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-set containment pairs (quote/subset detection — the
    asymmetric near-dup family resemblance LSH cannot see). Candidates
    from a df-capped shingle inverted index, scores EXACT from the full
    sets; see the block comment for the scale bounds."""
    docs = t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.expr(_WORDS_SPARK.format(col="text")).alias("w")
    ).select(
        "doc_id", F.array_distinct(F.expr(_SHINGLES_SPARK)).alias("sh")
    )
    return _containment_pairs(d)


def _containment_pairs(d: DataFrame) -> DataFrame:
    # The (doc_id, sh) relation feeds FOUR consumers (the inverted index
    # twice through the candidate self-join, then both sides of the
    # exact-score join). Its lineage — regex tokenize + shingle hash +
    # array_distinct — is the most expensive map in this query, so it is
    # materialized ONCE via localCheckpoint (executor-local blocks,
    # lineage truncated, cleaned by the ContextCleaner when the frame is
    # GC'd): measured 24.5s -> 2.3s at sf0.1 (BENCH/ADJUDICATION_r04.md).
    # At corpus scale the artifact is the same class of thing a MinHash
    # signature table is — doc-keyed, disk-spillable — while the
    # alternative re-runs the priciest map 4x at ANY scale.
    d = d.localCheckpoint(eager=True)
    inv = d.select("doc_id", F.explode("sh").alias("s"))
    keep = (
        inv.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= CONT_MAX_DF))
        .select("s")
    )
    capped = inv.join(keep, "s")
    a = capped.alias("ca")
    b = capped.alias("cb")
    cand = (
        a.join(
            b,
            (F.col("ca.s") == F.col("cb.s"))
            & (F.col("ca.doc_id") < F.col("cb.doc_id")),
        )
        .groupBy(
            F.col("ca.doc_id").alias("doc_a"),
            F.col("cb.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= CONT_MIN_SHARED)
        .select("doc_a", "doc_b")
    )
    da = d.alias("da")
    db = d.alias("db")
    inter = F.size(F.array_intersect(F.col("da.sh"), F.col("db.sh")))
    return (
        cand.join(da, F.col("doc_a") == F.col("da.doc_id"))
        .join(db, F.col("doc_b") == F.col("db.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(inter * 1000000.0 / F.size(F.col("da.sh")), 0)
            .cast("bigint")
            .alias("cont_a_ppm"),
            F.round(inter * 1000000.0 / F.size(F.col("db.sh")), 0)
            .cast("bigint")
            .alias("cont_b_ppm"),
        )
    )


# --- late-interaction retrieval (ColBERT MaxSim, round 4 close) -----------------------
# Modern neural retrieval scores a query against MULTI-VECTOR documents:
# score(q, d) = sum over query tokens of the max cosine against any doc
# token (Khattab & Zaharia 2020). The driver tables carry one vector per
# doc, so token sets are synthesized deterministically as 4 circular
# rotations of the base embedding (a pure permutation: norm-preserving,
# identical arithmetic in both engines) — the INTERACTION algebra
# (explode -> per-query-token max -> sum), not the encoder, is what this
# entry grades. Cosines quantize to e6 BIGINTs BEFORE any aggregation so
# max/sum order can never move a bit (the fn_vector float-fold is
# per-row sequential; cross-row aggregation must be integer).
#
# Scale shape: doc tokens are a x4 map-side explode, the query's 4
# tokens broadcast, the 16-cosines-per-doc compute is narrow, and ONE
# vec_id-keyed aggregation chain (max then sum share the exchange)
# feeds TakeOrderedAndProject. At ColBERT widths (32 tokens x 128 dims)
# the same plan holds with the explode factor as the knob.

_MAXSIM_TOKENS = 4
_MAXSIM_SHIFT = 16  # rotation stride per synthesized token


def _rot_spark(col: str, t: str) -> str:
    s = f"({t} * {_MAXSIM_SHIFT})"
    return (
        f"concat(slice({col}, {s} + 1, {_DIM} - {s}),"
        f" slice({col}, 1, {s}))"
    )


def _rot_sql(col: str, t: str) -> str:
    s = f"({t} * {_MAXSIM_SHIFT})"
    return f"list_concat({col}[{s} + 1:{_DIM}], {col}[1:{s}])"


_MAXSIM_COS_SQL = (
    "CAST(round(list_aggregate(list_transform(generate_series(1,"
    f" {_DIM}), i -> CAST(dvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)),"
    " 'sum') / (sqrt(list_aggregate(list_transform(dvec, x ->"
    " CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    " * sqrt(list_aggregate(list_transform(qvec, x ->"
    " CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))"
    " * 1000000, 0) AS BIGINT)"
)

_MAXSIM_COS_SPARK = (
    "CAST(round(aggregate(zip_with(dvec, qvec, (x, y) ->"
    " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE),"
    " (s, v) -> s + v) / (sqrt(aggregate(transform(dvec, x ->"
    " CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE),"
    " (s, v) -> s + v)) * sqrt(aggregate(transform(qvec, x ->"
    " CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE),"
    " (s, v) -> s + v)))"
    " * 1000000, 0) AS BIGINT)"
)

_MAXSIM_SQL = f"""
WITH q AS (
  SELECT t AS qt, {_rot_sql("embedding", "t")} AS qvec
  FROM (SELECT embedding FROM embeddings WHERE vec_id = 0),
       generate_series(0, {_MAXSIM_TOKENS - 1}) AS g(t)
),
d AS (
  SELECT vec_id, label, t AS dt, {_rot_sql("embedding", "t")} AS dvec
  FROM embeddings, generate_series(0, {_MAXSIM_TOKENS - 1}) AS g(t)
  WHERE vec_id != 0
),
c AS (
  SELECT d.vec_id, d.label, q.qt, {_MAXSIM_COS_SQL} AS c_e6
  FROM d, q
),
m AS (
  SELECT vec_id, label, qt, max(c_e6) AS mx
  FROM c GROUP BY 1, 2, 3
)
SELECT vec_id, label, CAST(sum(mx) AS BIGINT) AS score_e6
FROM m GROUP BY 1, 2
ORDER BY score_e6 DESC, vec_id
LIMIT 20
"""


@register("sim_maxsim", _MAXSIM_SQL)
def q_sim_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style MaxSim top-20: x4 token explode both sides, e6
    integer cosines, per-(doc, query-token) max then per-doc sum on one
    exchange, TakeOrderedAndProject. See block comment."""
    e = t(spark, sf_dir, "embeddings")
    tok = (
        f"explode(transform(sequence(0, {_MAXSIM_TOKENS - 1}),"
        f" t -> struct(t AS tt, {_rot_spark('embedding', 't')} AS tv)))"
    )
    d = (
        e.filter(F.col("vec_id") != 0)
        .select("vec_id", "label", F.expr(tok).alias("_d"))
        .select(
            "vec_id", "label",
            F.col("_d.tt").alias("dt"), F.col("_d.tv").alias("dvec"),
        )
    )
    q = (
        e.filter(F.col("vec_id") == 0)
        .select(F.expr(tok).alias("_q"))
        .select(F.col("_q.tt").alias("qt"), F.col("_q.tv").alias("qvec"))
    )
    c = d.crossJoin(F.broadcast(q)).select(
        "vec_id", "label", "qt",
        F.expr(_MAXSIM_COS_SPARK).alias("c_e6"),
    )
    m = c.groupBy("vec_id", "label", "qt").agg(F.max("c_e6").alias("mx"))
    return (
        m.groupBy("vec_id", "label")
        .agg(F.sum("mx").cast("bigint").alias("score_e6"))
        .orderBy(F.desc("score_e6"), "vec_id")
        .limit(20)
    )


# --- readability scoring (round 4 close) ----------------------------------------------
# Flesch reading-ease as an INTEGER-EXACT pipeline signal: the classic
# 206.835 - 1.015*(W/S) - 84.6*(Y/W) with every ratio spelled as a
# cross-multiplied floor division over e3-scaled constants, so both
# engines compute identical BIGINTs (float spellings of the two ratios
# would drift in the last ulp across engines). Syllables use the
# standard vowel-run proxy (maximal [aeiouy]+ runs, floor 1 per word);
# sentences are terminal-punctuation counts, floor 1. One narrow map —
# readability joins quality/gopher/C4 as a per-doc filter signal that
# costs nothing extra at 100 TB.

_READ_W = "size(filter(split(text, ' '), x -> x != ''))"
_READ_W_SQL = "len(list_filter(string_split(text, ' '), x -> x != ''))"
_READ_S = "greatest(CAST(regexp_count(text, '[.!?]') AS BIGINT), 1L)"
_READ_S_SQL = "greatest(CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT), 1)"
_READ_Y = (
    "aggregate(filter(split(lower(text), ' '), x -> x != ''),"
    " CAST(0 AS BIGINT), (s, w) -> s + greatest(CAST("
    "regexp_count(w, '[aeiouy]+') AS BIGINT), 1L))"
)
_READ_Y_SQL = (
    "list_aggregate(list_transform(list_filter(string_split(lower(text),"
    " ' '), x -> x != ''), w -> greatest(CAST(len(regexp_extract_all(w,"
    " '[aeiouy]+')) AS BIGINT), 1)), 'sum')"
)

_READ_SCORE = (
    "206835 - (1015 * nw * 1000) DIV (ns * 1000)"
    " - (84600 * ny) DIV nw"
)
_READ_SCORE_SQL = (
    "206835 - (1015 * nw * 1000) // (ns * 1000)"
    " - (84600 * ny) // nw"
)
_READ_BAND = (
    "CASE WHEN score_e3 >= 70000 THEN 'easy'"
    " WHEN score_e3 >= 50000 THEN 'medium' ELSE 'hard' END"
)

_READ_SQL = f"""
SELECT doc_id, nw, ns, ny,
  CAST({_READ_SCORE_SQL} AS BIGINT) AS score_e3,
  {_READ_BAND} AS band
FROM (
  SELECT doc_id, {_READ_W_SQL} AS nw, {_READ_S_SQL} AS ns,
         {_READ_Y_SQL} AS ny
  FROM documents
) WHERE nw > 0
"""


@register("text_readability", _READ_SQL)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per doc, integer-exact e3 score + band
    (block comment): one narrow map over the scan, no shuffle."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"CAST({_READ_W} AS BIGINT)").alias("nw"),
        F.expr(_READ_S).alias("ns"),
        F.expr(_READ_Y).alias("ny"),
    )
    return (
        d.filter(F.col("nw") > 0)
        .withColumn(
            "score_e3", F.expr(f"CAST({_READ_SCORE} AS BIGINT)")
        )
        .withColumn("band", F.expr(_READ_BAND))
    )


# --- lexicon sentiment scoring (round 4 close) ----------------------------------------
# AFINN-style integer sentiment: each word carries a -5..5 valence from
# a frozen lexicon; a document's score is the sum, its normalized score
# the e4 per-word average, its label a thresholded verdict. Sentiment
# words are INJECTED deterministically by doc_id arithmetic (the C4
# synthesis pattern) so every valence arm and both label polarities
# fire over the synthetic corpus; division runs on NON-NEGATIVE
# operands only (sign factored out — both engines truncate toward
# zero today, but the determinism contract here never leans on
# negative-division semantics); the lexicon lives as a foldable map
# literal, the lookup is one element_at per word — a narrow map filter
# signal like readability.

_SENT_LEX = {
    "good": 3, "great": 3, "excellent": 5, "amazing": 4, "love": 3,
    "happy": 3, "best": 3, "wonderful": 4, "perfect": 5, "nice": 2,
    "bad": -3, "terrible": -5, "awful": -4, "hate": -3, "worst": -3,
    "poor": -2, "horrible": -5, "sad": -2, "broken": -2, "wrong": -2,
}

_SENT_MAP_SPARK = "map(" + ", ".join(
    f"'{w}', {v}" for w, v in sorted(_SENT_LEX.items())
) + ")"
_SENT_INJECT_SPARK = """
concat(filter(split(lower(text), ' '), x -> x != ''),
  element_at(array(
    array('good', 'great'), array('bad'),
    array('terrible', 'awful'), array('excellent'),
    CAST(array() AS ARRAY<STRING>)
  ), CAST(doc_id % 5 AS INT) + 1))
"""

_SENT_CASE_SQL = "CASE " + " ".join(
    f"WHEN x = '{w}' THEN {v}" for w, v in sorted(_SENT_LEX.items())
) + " ELSE 0 END"
_SENT_INJECT_SQL = """
list_concat(list_filter(string_split(lower(text), ' '), x -> x != ''),
  list_extract([
    ['good', 'great'], ['bad'], ['terrible', 'awful'], ['excellent'],
    []
  ], CAST(doc_id % 5 AS INT) + 1))
"""

_SENT_SQL = f"""
SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
  CAST(score AS BIGINT) AS score,
  CAST(CASE WHEN score < 0 THEN -((-score) * 10000 // len(w))
       ELSE score * 10000 // len(w) END AS BIGINT) AS per_word_e4,
  CASE WHEN score > 0 THEN 'pos' WHEN score < 0 THEN 'neg'
       ELSE 'neu' END AS label
FROM (
  SELECT doc_id, w,
    list_sum(list_transform(w, x -> {_SENT_CASE_SQL})) AS score
  FROM (SELECT doc_id, {_SENT_INJECT_SQL} AS w FROM documents)
) WHERE len(w) > 0
"""


@register("text_sentiment", _SENT_SQL)
def q_text_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer lexicon sentiment per doc: valence sum, e4 per-word
    average, thresholded label (block comment)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_SENT_INJECT_SPARK).alias("w")
    ).filter(F.expr("size(w) > 0"))
    s = d.select(
        "doc_id",
        "w",
        F.expr(
            "aggregate(w, CAST(0 AS BIGINT), (s, x) -> s +"
            f" coalesce(element_at({_SENT_MAP_SPARK}, x), 0))"
        ).alias("score"),
    )
    return s.select(
        "doc_id",
        F.expr("CAST(size(w) AS BIGINT)").alias("n_words"),
        F.col("score").cast("bigint"),
        F.expr(
            "CAST(CASE WHEN score < 0 THEN"
            " -((-score) * 10000 DIV size(w))"
            " ELSE score * 10000 DIV size(w) END AS BIGINT)"
        ).alias("per_word_e4"),
        F.expr(
            "CASE WHEN score > 0 THEN 'pos' WHEN score < 0 THEN 'neg'"
            " ELSE 'neu' END"
        ).alias("label"),
    )


# --- zlib compressibility (round 4 close) ---------------------------------------------
# The entropy-proxy quality signal real corpus filters use (repetitive
# boilerplate compresses far better than natural prose — Gopher-family
# pipelines threshold on exactly this): per doc, the zlib-level-6
# compressed size of the utf-8 text and the e4 ratio. stdlib zlib is
# deterministic for a fixed level/strategy, but no SQL engine replays
# DEFLATE — rows-only by design (like the tokenizer trainers), gated in
# tests/test_corpusml.py by invariant checks plus a direct python-zlib
# replay. Arrow-batched iterator UDF: the justified-UDF case (per-doc
# byte compression), never per-row plan-side Python.


@register("text_compressibility", None)
def q_text_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bytes, n_compressed, ratio_e4) via stdlib zlib level
    6 in an Arrow-batched UDF; ratio_e4 = compressed * 10000 DIV raw."""
    import pandas as pd

    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def comp(it):
        import zlib

        for pdf in it:
            ids, nb, nc = [], [], []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                raw = (txt or "").encode("utf-8")
                ids.append(did)
                nb.append(len(raw))
                nc.append(len(zlib.compress(raw, 6)))
            yield pd.DataFrame(
                {"doc_id": ids, "n_bytes": nb, "n_compressed": nc}
            )

    out = d.mapInPandas(
        comp, "doc_id long, n_bytes long, n_compressed long"
    )
    return out.filter(F.col("n_bytes") > 0).select(
        "doc_id",
        "n_bytes",
        "n_compressed",
        F.expr(
            "CAST(n_compressed * 10000 DIV n_bytes AS BIGINT)"
        ).alias("ratio_e4"),
    )
