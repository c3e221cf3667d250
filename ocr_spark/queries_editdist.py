"""Driver registry: edit-distance near-dup join (deletion-neighborhood
blocking + exact levenshtein verify — functions/editdist.py).

Both engines have the same `levenshtein` built-in and the same string
slicing semantics, so the full pipeline — key normalization, deletion-1
variant generation, the variant self-join, and the exact verify — is
value-hash oracled end-to-end. At the synthetic sf scales every surviving
pair is an exact prefix tie (dist=0); dist=1 recall-completeness is pinned
against brute force on typo corpora in tests/test_editdist.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ocr_spark.functions.editdist import (
    KEY_LEN,
    MIN_KEY_LEN,
    editdist_keepers,
    editdist_pairs,
)
from ocr_spark.queries import register, t

# shared CTE prefix: normalized keys -> eligible docs -> deletion-1
# variants -> distinct candidate pairs (the DuckDB mirror of
# editdist_candidates + the self-join in editdist_pairs)
_CAND_CTES = f"""
WITH d AS (
  SELECT doc_id,
    substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'), 1, {KEY_LEN})
      AS k
  FROM documents
), e AS (
  SELECT doc_id, k FROM d WHERE len(k) >= {MIN_KEY_LEN}
), v AS (
  SELECT doc_id, k,
    unnest(list_distinct(list_transform(range(0, len(k) + 1), i ->
      CASE WHEN i = 0 THEN k
           ELSE substr(k, 1, i - 1) || substr(k, i + 1, len(k)) END)))
      AS var
  FROM e
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.k AS ka, b.k AS kb
  FROM v a JOIN v b ON a.var = b.var AND a.doc_id < b.doc_id
)"""

_PAIRS_ORACLE = (
    _CAND_CTES
    + """
SELECT doc_a, doc_b, CAST(levenshtein(ka, kb) AS INT) AS dist
FROM cand WHERE levenshtein(ka, kb) <= 1
"""
)

_KEEPERS_ORACLE = (
    _CAND_CTES
    + """
, pairs AS (
  SELECT doc_a, doc_b FROM cand WHERE levenshtein(ka, kb) <= 1
), nb AS (
  SELECT doc_id, min(nbr) AS mn FROM (
    SELECT doc_a AS doc_id, doc_b AS nbr FROM pairs
    UNION ALL
    SELECT doc_b AS doc_id, doc_a AS nbr FROM pairs
  ) GROUP BY doc_id
)
SELECT e.doc_id, least(e.doc_id, coalesce(nb.mn, e.doc_id)) AS rep
FROM e LEFT JOIN nb USING (doc_id)
"""
)


@register("dedup_editdist_pairs", _PAIRS_ORACLE)
def q_dedup_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified ed<=1 near-dup pairs over the normalized 24-char text key.
    Deletion-neighborhood blocking (complete for ed<=1 by the
    symmetric-delete theorem), exact levenshtein verify on distinct
    candidates; never an all-pairs comparison."""
    return editdist_pairs(t(spark, sf_dir, "documents"))


@register("dedup_editdist_keepers", _KEEPERS_ORACLE)
def q_dedup_editdist_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The linear dedup decision over the verified ed<=1 edges: one star
    pass, rep = min(self, neighbors) per eligible doc."""
    return editdist_keepers(t(spark, sf_dir, "documents"))


# --- sorted-neighborhood blocking (multi-pass) ------------------------------
# The window-over-sort-order complement of the deletion-neighborhood
# join: one Exchange keyed by (pass, 4-char block prefix), each row
# compared to its 3 sort-order predecessors, forward AND reversed key
# passes (functions/editdist.sorted_neighborhood_pairs). The oracle
# replays both passes' lag windows verbatim — candidate generation,
# not just the verified output, sits under the value hash.

_SN_CTES = f"""
WITH d AS (
  SELECT doc_id,
    substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'), 1, {KEY_LEN})
      AS k
  FROM documents
), e AS (
  SELECT doc_id, k FROM d WHERE len(k) >= {MIN_KEY_LEN}
), p AS (
  SELECT 0 AS p, doc_id, k, k AS sk FROM e
  UNION ALL
  SELECT 1 AS p, doc_id, k, reverse(k) AS sk FROM e
), l AS (
  SELECT p, doc_id, k,
    lag(doc_id, 1) OVER w AS d1, lag(k, 1) OVER w AS k1,
    lag(doc_id, 2) OVER w AS d2, lag(k, 2) OVER w AS k2,
    lag(doc_id, 3) OVER w AS d3, lag(k, 3) OVER w AS k3
  FROM p
  WINDOW w AS (PARTITION BY p, substr(sk, 1, 4) ORDER BY sk, doc_id)
), c AS (
  SELECT doc_id, k,
    unnest([
      {{'pd': d1, 'pk': k1}},
      {{'pd': d2, 'pk': k2}},
      {{'pd': d3, 'pk': k3}}
    ]) AS v
  FROM l
)"""

_SN_ORACLE = (
    _SN_CTES
    + """
SELECT DISTINCT least(doc_id, v.pd) AS doc_a,
       greatest(doc_id, v.pd) AS doc_b,
       CAST(levenshtein(k, v.pk) AS INT) AS dist
FROM c
WHERE v.pd IS NOT NULL AND levenshtein(k, v.pk) <= 1
"""
)


@register("dedup_sorted_neighborhood", _SN_ORACLE)
def q_dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass sorted-neighborhood near-dup pairs: block by the sort
    key's 4-char prefix, window over (key, doc_id) order, compare each
    row to its 3 predecessors in the forward and reversed key orders,
    exact levenshtein verify. The recall-heuristic, fan-out-free sibling
    of dedup_editdist_pairs."""
    from ocr_spark.functions.editdist import sorted_neighborhood_pairs

    return sorted_neighborhood_pairs(t(spark, sf_dir, "documents"))
