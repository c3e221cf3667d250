"""Equivalence + invariance properties (SURVEY.md §5.3).

The fused pipeline (production) and the exploded op-by-op pipeline are two
formulations of SPEC.md over the same parser; their outputs must be
byte-identical, and neither may depend on partition counts or on the salted
repartition path — this is the determinism precondition that makes the
byte-identity gate hold on a real cluster where partitioning is arbitrary.
"""

from __future__ import annotations

import pytest

N_PARTS = 8


def _canon(rows):
    out = {}
    for r in rows:
        key = (r.url, None if r.warc_ts is None else r.warc_ts.isoformat())
        spans = [(s.block_id, s.start, s.end, s.label) for s in r.spans]
        out[key] = (
            r.extracted_text, r.text_sha256, spans, r.n_blocks,
            r.n_content_blocks, r.part_id, r.lang,
        )
    return out


@pytest.fixture(scope="module")
def fused(spark, fixture_df):
    from ocr_spark.operators.extract import extract_pages

    return _canon(extract_pages(fixture_df, num_parts=N_PARTS).collect())


def test_exploded_equals_fused(spark, fixture_df, fused):
    from ocr_spark.operators.exploded import extract_pages_exploded

    exploded = _canon(
        extract_pages_exploded(fixture_df, num_parts=N_PARTS).collect()
    )
    assert exploded == fused


def test_parallelism_invariance(spark, fixture_df, fused):
    from ocr_spark.operators.extract import extract_pages

    for n in (1, 2, 17):
        got = _canon(
            extract_pages(fixture_df.repartition(n), num_parts=N_PARTS).collect()
        )
        assert got == fused, f"repartition({n}) changed output"


def test_salted_path_invariance(spark, fixture_df, fused):
    """Op 21: the skew-salted exchange must not change a single byte."""
    from ocr_spark.operators.extract import extract_pages

    got = _canon(
        extract_pages(fixture_df, num_parts=N_PARTS, repartition=16).collect()
    )
    assert got == fused


def test_salted_balance_under_viral_url(spark):
    """The skew claim behind op 21, pinned without timing: on a corpus
    where HALF the rows are one identical url, a host-keyed repartition
    puts that half in one partition, while the salted layout bounds every
    partition near the mean (wall-clock evidence: BENCH/SKEW.md)."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.extract import salted, with_part_id
    from scripts.skew_bench import viral_pages

    pages = viral_pages(spark, 4000)
    parts = 16
    host = F.parse_url("url", F.lit("HOST"))

    def max_rows(df):
        return (
            df.groupBy(F.spark_partition_id().alias("p")).count()
            .agg(F.max("count")).collect()[0][0]
        )

    hot = max_rows(pages.repartition(parts, host))
    bal = max_rows(salted(with_part_id(pages, parts), parts))
    mean = 4000 / parts
    assert hot >= 2000          # the viral half serializes into one task
    assert bal < 3 * mean, bal  # salted: every task near the mean


def test_exploded_parallelism_invariance(spark, fixture_df, fused):
    """The exploded path shuffles twice (window + groupBy) — its output must
    still be independent of the incoming partitioning."""
    from ocr_spark.operators.exploded import extract_pages_exploded

    got = _canon(
        extract_pages_exploded(
            fixture_df.repartition(13), num_parts=N_PARTS
        ).collect()
    )
    assert got == fused
