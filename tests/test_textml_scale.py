"""Scale-safety tests for the MinHash LSH path (VERDICT round-1 item 2).

The failure mode being guarded: docs with < 3 words have no shingles, and at
web scale that segment (near-empty / boilerplate-only pages) is huge. If they
all landed on one shared band key (the round-1 ``coalesce(..., '')`` bug),
the band self-join would go quadratic on exactly that segment. The fix drops
shingle-less docs from banding entirely; these tests pin that behavior.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from ocr_spark.queries_textml import (
    BANDS,
    NUM_PERMS,
    minhash_band_keys,
    minhash_candidate_pairs,
    minhash_signatures,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_near_empty_docs_never_enter_banding(spark):
    # 10k docs with < 3 words each: no shingles -> no signatures -> no bands
    rows = [(i, ["", "a", "b c", "  "][i % 4]) for i in range(10_000)]
    d = _docs(spark, rows)
    sig = minhash_signatures(d)
    assert sig.count() == 0
    assert minhash_candidate_pairs(d).count() == 0


def test_max_band_bucket_bounded_on_mixed_corpus(spark):
    # 10k near-empty docs + 200 real docs of which 50 are exact dups of one
    # text: the biggest band bucket must be the dup cluster (50), NOT the
    # near-empty population (10k) — i.e. no quadratic mega-bucket.
    near_empty = [(i, "x") for i in range(10_000)]
    dup_text = "the quick brown fox jumps over the lazy dog again and again"
    dups = [(20_000 + i, dup_text) for i in range(50)]
    uniques = [
        (30_000 + i, f"unique document number {i} with its own distinct words "
                     f"alpha{i} beta{i} gamma{i}")
        for i in range(150)
    ]
    d = _docs(spark, near_empty + dups + uniques)
    bands = minhash_band_keys(minhash_signatures(d))
    top = (
        bands.groupBy("bi", "band")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]["mx"]
    )
    assert top == 50, f"largest band bucket {top}, expected the 50-dup cluster"

    t0 = time.perf_counter()
    pairs = minhash_candidate_pairs(d)
    # all 50*49/2 dup pairs must surface (identical docs share every band)
    n_dup_pairs = pairs.filter(
        (F.col("doc_a") >= 20_000) & (F.col("doc_b") < 30_000)
    ).count()
    assert n_dup_pairs == 50 * 49 // 2
    assert time.perf_counter() - t0 < 60


def test_signature_width():
    assert NUM_PERMS >= 16 and BANDS >= 4
