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


# --- containment near-dup (round 4 late) --------------------------------------

def test_containment_finds_asymmetric_quote_pair(spark, tmp_path):
    """The motivating case: a short doc quoted verbatim inside a long doc
    has Jaccard ~ |A|/|B| (tiny — resemblance LSH misses it) but
    containment(A in B) = 1.0. Scores must equal an independent
    pure-Python shingle-set reference, and the viral boilerplate shingle
    shared by every doc must not create candidates on its own (df cap +
    min-shared prune)."""
    from pyspark.sql import functions as F

    from ocr_spark.queries import all_queries
    from ocr_spark.queries_textml import CONT_MIN_SHARED

    quote = " ".join(f"q{i}" for i in range(12))  # 12 words, 10 shingles
    boiler = "accept all cookies"  # one shingle, shared by EVERY doc
    docs = [
        (0, quote),  # the quoted original
        (1, " ".join(f"b{i}" for i in range(200)) + " " + quote),  # quotes 0
        (2, " ".join(f"c{i}" for i in range(150))),  # unrelated long doc
        (3, boiler + " " + " ".join(f"d{i}" for i in range(40))),
        (4, boiler + " " + " ".join(f"e{i}" for i in range(40))),
    ]
    # docs 3/4 share ONLY the boiler shingles ('accept all cookies' plus
    # the two bridge shingles into their unique tails are NOT shared) —
    # below CONT_MIN_SHARED, so no 3-4 candidate.

    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, s, "en", "t", len(s)) for i, s in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")

    got = {
        (r.doc_a, r.doc_b): (r.cont_a_ppm, r.cont_b_ppm)
        for r in all_queries()["dedup_containment"](spark, sf).collect()
    }

    # independent reference
    def sh(text):
        ws = [w for w in text.split(" ") if w]
        return set(
            " ".join(ws[i:i + 3]) for i in range(len(ws) - 2)
        ) if len(ws) >= 3 else set()

    sets = {i: sh(s) for i, s in docs}
    inter01 = len(sets[0] & sets[1])
    assert inter01 >= CONT_MIN_SHARED
    want01 = (
        int(round(inter01 * 1e6 / len(sets[0]))),
        int(round(inter01 * 1e6 / len(sets[1]))),
    )
    assert got[(0, 1)] == want01
    assert got[(0, 1)][0] == 1_000_000  # A fully contained in B
    assert got[(0, 1)][1] < 100_000     # while B barely resembles A
    assert (3, 4) not in got            # boiler-only overlap pruned
    assert all(a < b for a, b in got)   # canonical pair order
