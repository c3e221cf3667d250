"""Registry entries for the data-quality constraint suite
(operators/dq.py — the Deequ pattern: N constraints, ONE table scan).

The suite below mixes passing and deliberately-failing constraints so
the verdict booleans carry hash signal in both directions; every metric
is integer e6 so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ocr_spark.operators.dq import dq_check
from ocr_spark.queries import register, t

_LANGS = ("en", "zh", "es", "de", "fr")

# (kind, name, args..., threshold/bounds) — see operators/dq.py header.
DOC_CONSTRAINTS: list[tuple] = [
    ("complete", "text_complete", "text", 1_000_000),
    ("unique", "docid_unique", "doc_id", 1_000_000),
    ("in_set", "lang_domain", "lang", _LANGS, 1_000_000),
    ("between", "nchars_bounds", "n_chars", 1, 100_000, 1_000_000),
    ("matches", "source_format", "source", "^src[0-9]+$", 1_000_000),
    ("satisfies", "nchars_is_len", "n_chars = length(text)", 1_000_000),
    ("mean_between", "nchars_mean", "n_chars",
     100 * 1_000_000, 500 * 1_000_000),
    ("row_count_between", "size_floor", 1, 10**12),
    # deliberately tight: most documents exceed 100 chars, so this
    # verdict row lands passed=false and exercises the failure leg
    ("between", "nchars_tight", "n_chars", 1, 100, 900_000),
]


@register(
    "dq_suite",
    """
WITH a AS (
  SELECT count(*) AS total,
    count(text) AS s0,
    count(DISTINCT doc_id) AS s1,
    count(*) FILTER (WHERE lang IN ('en','zh','es','de','fr')) AS s2,
    count(*) FILTER (WHERE n_chars >= 1 AND n_chars <= 100000) AS s3,
    count(*) FILTER (WHERE regexp_matches(source, '^src[0-9]+$')) AS s4,
    count(*) FILTER (WHERE n_chars = length(text)) AS s5,
    sum(CAST(n_chars AS BIGINT)) AS s6,
    count(*) FILTER (WHERE n_chars >= 1 AND n_chars <= 100) AS s7
  FROM documents
),
v AS (
  SELECT 'text_complete' AS name, 'complete' AS kind,
    (s0 * 1000000) // total AS metric_e6,
    1000000 AS lo_e6, 1000000 AS hi_e6 FROM a
  UNION ALL SELECT 'docid_unique', 'unique',
    (s1 * 1000000) // total, 1000000, 1000000 FROM a
  UNION ALL SELECT 'lang_domain', 'in_set',
    (s2 * 1000000) // total, 1000000, 1000000 FROM a
  UNION ALL SELECT 'nchars_bounds', 'between',
    (s3 * 1000000) // total, 1000000, 1000000 FROM a
  UNION ALL SELECT 'source_format', 'matches',
    (s4 * 1000000) // total, 1000000, 1000000 FROM a
  UNION ALL SELECT 'nchars_is_len', 'satisfies',
    (s5 * 1000000) // total, 1000000, 1000000 FROM a
  UNION ALL SELECT 'nchars_mean', 'mean_between',
    (s6 * 1000000) // total, 100000000, 500000000 FROM a
  UNION ALL SELECT 'size_floor', 'row_count_between',
    total, 1, 1000000000000 FROM a
  UNION ALL SELECT 'nchars_tight', 'between',
    (s7 * 1000000) // total, 900000, 1000000 FROM a
)
SELECT name, kind, CAST(metric_e6 AS BIGINT) AS metric_e6,
  CAST(lo_e6 AS BIGINT) AS lo_e6, CAST(hi_e6 AS BIGINT) AS hi_e6,
  metric_e6 >= lo_e6 AND metric_e6 <= hi_e6 AS passed
FROM v
""",
)
def q_dq_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the 9-constraint documents suite through the single-pass
    compiler: completeness, uniqueness, set membership, range, regex,
    cross-column consistency, scaled mean, table size, and one
    deliberately failing range check. The oracle recomputes every
    verdict with FILTER aggregates + integer division."""
    return dq_check(t(spark, sf_dir, "documents"), DOC_CONSTRAINTS)


# The streaming suite drops the uniqueness check (count-distinct is not
# sum-mergeable across micro-batches; streaming uniqueness is the HLL
# path, stream_hll_registers) — everything else folds exactly.
STREAM_DOC_CONSTRAINTS: list[tuple] = [
    c for c in DOC_CONSTRAINTS if c[0] != "unique"
]


@register(
    "stream_dq_metrics",
    """
WITH a AS (
  SELECT count(*) AS total,
    count(text) AS s0,
    count(*) FILTER (WHERE lang IN ('en','zh','es','de','fr')) AS s2,
    count(*) FILTER (WHERE n_chars >= 1 AND n_chars <= 100000) AS s3,
    count(*) FILTER (WHERE regexp_matches(source, '^src[0-9]+$')) AS s4,
    count(*) FILTER (WHERE n_chars = length(text)) AS s5,
    sum(CAST(n_chars AS BIGINT)) AS s6,
    count(*) FILTER (WHERE n_chars >= 1 AND n_chars <= 100) AS s7
  FROM documents
),
v AS (
  SELECT 'text_complete' AS name, 'complete' AS kind,
    (s0 * 1000000) // total AS metric_e6,
    1000000 AS lo_e6, 1000000 AS hi_e6 FROM a
  UNION ALL SELECT 'lang_domain', 'in_set',
    (s2 * 1000000) // total, 1000000, 1000000 FROM a
  UNION ALL SELECT 'nchars_bounds', 'between',
    (s3 * 1000000) // total, 1000000, 1000000 FROM a
  UNION ALL SELECT 'source_format', 'matches',
    (s4 * 1000000) // total, 1000000, 1000000 FROM a
  UNION ALL SELECT 'nchars_is_len', 'satisfies',
    (s5 * 1000000) // total, 1000000, 1000000 FROM a
  UNION ALL SELECT 'nchars_mean', 'mean_between',
    (s6 * 1000000) // total, 100000000, 500000000 FROM a
  UNION ALL SELECT 'size_floor', 'row_count_between',
    total, 1, 1000000000000 FROM a
  UNION ALL SELECT 'nchars_tight', 'between',
    (s7 * 1000000) // total, 900000, 1000000 FROM a
)
SELECT name, kind, CAST(metric_e6 AS BIGINT) AS metric_e6,
  CAST(lo_e6 AS BIGINT) AS lo_e6, CAST(hi_e6 AS BIGINT) AS hi_e6,
  metric_e6 >= lo_e6 AND metric_e6 <= hi_e6 AS passed
FROM v
""",
)
def q_stream_dq_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DQ monitoring as a driver-visible query: the documents
    table arrives as 3 file micro-batches, each commits its ONE counter
    row exactly-once, and the SUM-folded verdicts must equal batch
    dq_check over the whole table — the merge law under the value hash
    (the oracle is the batch computation; any mis-merge, double-commit,
    or dropped batch breaks a metric)."""
    import os
    import tempfile

    from ocr_spark.streaming.incremental import (
        dq_stream_verdicts,
        incremental_dq,
    )

    d = t(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="ocr-spark-stream-dq-")
    src = os.path.join(work, "src")
    d.repartition(3).write.parquet(src)
    out = os.path.join(work, "counters")
    ckpt = os.path.join(work, "ckpt")
    writer, _ = incremental_dq(
        spark, src, d.schema, out, ckpt, STREAM_DOC_CONSTRAINTS
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return dq_stream_verdicts(spark, out, STREAM_DOC_CONSTRAINTS)
