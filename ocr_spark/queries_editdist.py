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
