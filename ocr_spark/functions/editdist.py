"""Edit-distance near-dup join via deletion-neighborhood blocking.

The fuzzy-key dedup path of the corpus funnel: find document pairs whose
normalized key (a cleaned fixed-length text prefix — in practice a title,
canonical URL, or citation string) is within Levenshtein distance 1,
WITHOUT an all-pairs comparison. Blocking is the symmetric-delete scheme
(FastSS / SymSpell): index every key under its full deletion-1
neighborhood (the key itself plus every single-character deletion) and
equi-join on the variant. Completeness for max_dist=1 is a theorem, not a
heuristic:

  ed(a, b) = 0  -> identity variants collide;
  ed(a, b) = 1, substitution at i -> deleting position i from BOTH yields
    the same string;
  ed(a, b) = 1, insertion/deletion -> the longer side's deletion at the
    edited position equals the shorter side's identity variant.

So every true pair shares >= 1 variant, candidates are verified with the
exact `levenshtein` built-in (JVM-side; DuckDB has the same function, so
the whole pipeline is value-hash oracled), and false positives cannot
survive. tests/test_editdist.py pins the recall-completeness property
against a brute-force reference on synthetic typo corpora.

Scale shape (the 100 TB story):

- Variant fan-out is len(key)+1 rows per doc — linear, bounded by the
  fixed KEY_LEN cap (<= 25 rows at KEY_LEN=24), all map-side.
- The self-join shuffles on the variant string: a hash join over
  neighborhood buckets, never doc x doc. Both sides are the same subplan,
  so Spark's ReuseExchange computes the variant explode ONCE.
- Bucket sizes are bounded by how many keys fall in one deletion
  neighborhood. The degenerate mega-bucket (at web scale: millions of
  near-empty / template pages sharing one short key) is excluded up
  front: keys shorter than ``min_key_len`` never enter the index — the
  exact-dedup layer (md5 groupBy) already covers identical short texts.
  This mirrors the shingle-less-doc guard in the MinHash pipeline.
- Like minhash_candidate_pairs, the PAIRS output is inherently quadratic
  in a true-dup cluster's size; the dedup DECISION (`editdist_keepers`)
  is a linear star pass over the verified edges.

Extending to max_dist=k is the same scheme with all <=k-deletion variants
(O(len^k) fan-out — practical for k<=2 on short keys); this module fixes
k=1, the common title/URL-typo case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY_LEN = 24
MIN_KEY_LEN = 8
MAX_DIST = 1


def normalized_key(
    text_col: str = "text", key_len: int = KEY_LEN
) -> F.Column:
    """Lowercased [a-z ]-only prefix of the text — the fuzzy-match key.
    Deterministic and identical in DuckDB:
    substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'), 1, key_len)."""
    return F.substring(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", ""),
        1,
        key_len,
    )


def _variants_expr(key_col: str) -> str:
    """array of the key's deletion-1 neighborhood: the key itself (i=0)
    plus the key with character i removed (i=1..len). array_distinct
    because adjacent equal characters make duplicate variants (deleting
    either 'o' of 'foo' -> 'fo')."""
    k = key_col
    return (
        f"array_distinct(transform(sequence(0, length({k})), i -> "
        f"IF(i = 0, {k}, concat(left({k}, i - 1), "
        f"substring({k}, i + 1, length({k}))))))"
    )


def editdist_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    key_len: int = KEY_LEN,
    min_key_len: int = MIN_KEY_LEN,
) -> DataFrame:
    """(id, k, var): one row per (doc, deletion-neighborhood variant).
    Map-side only — the explode is the write side of the LSH-style
    variant shuffle."""
    e = docs.select(
        F.col(id_col).alias("doc_id"),
        normalized_key(text_col, key_len).alias("k"),
    ).filter(F.length("k") >= min_key_len)
    return e.select(
        "doc_id", "k", F.explode(F.expr(_variants_expr("k"))).alias("var")
    )


def editdist_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    key_len: int = KEY_LEN,
    min_key_len: int = MIN_KEY_LEN,
    max_dist: int = MAX_DIST,
) -> DataFrame:
    """Verified near-dup pairs (doc_a < doc_b, dist = levenshtein of the
    normalized keys, dist <= max_dist). Complete for max_dist <= 1 by the
    symmetric-delete theorem (module docstring); exact thereafter —
    levenshtein runs only on DISTINCT candidate pairs, after the
    pair-multiplicity from shared variants is collapsed."""
    v = editdist_candidates(docs, text_col, id_col, key_len, min_key_len)
    a, b = v.alias("a"), v.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.var") == F.col("b.var"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.k").alias("ka"),
            F.col("b.k").alias("kb"),
        )
        .distinct()
    )
    return cand.filter(
        F.levenshtein("ka", "kb") <= max_dist
    ).select(
        "doc_a",
        "doc_b",
        F.levenshtein("ka", "kb").cast("int").alias("dist"),
    )


def editdist_keepers(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    key_len: int = KEY_LEN,
    min_key_len: int = MIN_KEY_LEN,
    max_dist: int = MAX_DIST,
) -> DataFrame:
    """The linear dedup DECISION: every eligible doc mapped to
    rep = min(doc_id over itself and its verified neighbors) — one star
    pass over the verified edges, same semantics (and the same
    transitive-chain caveat) as minhash_group_reps: A~B~C where A,C are
    not themselves within max_dist keeps B with min(A,B) while C gets
    min(B,C). Chains needing full transitivity go through
    functions.graph.bucket_connected_components on the pairs."""
    pairs = editdist_pairs(
        docs, text_col, id_col, key_len, min_key_len, max_dist
    )
    nb = (
        pairs.select(F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("nbr"))
        .unionAll(
            pairs.select(
                F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("nbr")
            )
        )
        .groupBy("doc_id")
        .agg(F.min("nbr").alias("mn"))
    )
    e = docs.select(
        F.col(id_col).alias("doc_id"),
        normalized_key(text_col, key_len).alias("k"),
    ).filter(F.length("k") >= min_key_len)
    return e.join(nb, "doc_id", "left").select(
        "doc_id",
        F.least(F.col("doc_id"), F.coalesce("mn", "doc_id")).alias("rep"),
    )


# --- multi-pass sorted-neighborhood blocking --------------------------------
# Hernandez & Stolfo 1995: sort the corpus by a discriminating key and
# compare each record only to its w-1 predecessors in sort order — the
# classic record-linkage blocking scheme, complementary to the deletion
# neighborhood above (SymSpell is recall-complete for ed<=1 but pays a
# variant fan-out; sorted neighborhood costs ONE window pass at any edit
# budget but is recall-heuristic: a pair straddling the window is missed).
# The standard mitigation is multi-pass with independent keys — here the
# normalized key forward and reversed, so an edit near the front of the
# key (which scatters the forward sort order) still collides in the
# reverse pass.
#
# Scale shape: the sort is never global — rows partition by the key's
# 4-char block prefix, the neighborhood window runs inside each block
# (one Exchange for both passes: pass id is part of the partition key),
# and each row emits at most w-1 candidate pairs. The lost-at-block-
# boundary pairs are part of the documented heuristic, NOT a shuffle
# artifact: block(a) == block(b) whenever the keys share their first 4
# chars, which an interior edit preserves in both passes.

SN_WINDOW = 4  # compare to w-1 = 3 predecessors
SN_BLOCK_LEN = 4  # sort-key prefix that bounds a window partition


def sorted_neighborhood_pairs(
    df: DataFrame,
    window: int = SN_WINDOW,
    block_len: int = SN_BLOCK_LEN,
    key_len: int = KEY_LEN,
    min_key_len: int = MIN_KEY_LEN,
    max_dist: int = MAX_DIST,
) -> DataFrame:
    """Verified near-dup pairs by two-pass sorted-neighborhood blocking:
    (doc_a, doc_b, dist) with dist = levenshtein of the normalized keys,
    dist <= max_dist, doc_a < doc_b. Candidates are each row's w-1
    sort-order predecessors in the forward and reversed key orders."""
    from pyspark.sql import Window

    keys = (
        df.select(
            "doc_id", normalized_key(key_len=key_len).alias("k")
        ).filter(F.length("k") >= min_key_len)
    )
    passes = keys.select(
        F.lit(0).alias("p"), "doc_id", "k", F.col("k").alias("sk")
    ).unionByName(
        keys.select(
            F.lit(1).alias("p"), "doc_id", "k",
            F.reverse(F.col("k")).alias("sk"),
        )
    )
    w = Window.partitionBy(
        "p", F.substring("sk", 1, block_len)
    ).orderBy("sk", "doc_id")
    lag_cols = []
    for j in range(1, window):
        lag_cols.append(F.lag("doc_id", j).over(w).alias(f"d{j}"))
        lag_cols.append(F.lag("k", j).over(w).alias(f"k{j}"))
    lagged = passes.select("p", "doc_id", "k", *lag_cols)
    structs = ", ".join(
        f"struct(d{j} AS pd, k{j} AS pk)" for j in range(1, window)
    )
    cand = lagged.select(
        "doc_id",
        "k",
        F.explode(
            F.expr(f"filter(array({structs}), s -> s.pd IS NOT NULL)")
        ).alias("prev"),
    )
    return (
        cand.select(
            F.least("doc_id", "prev.pd").alias("doc_a"),
            F.greatest("doc_id", "prev.pd").alias("doc_b"),
            F.expr("CAST(levenshtein(k, prev.pk) AS INT)").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )
