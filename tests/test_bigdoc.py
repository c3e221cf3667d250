"""Byte/spans identity on LARGE documents vs the frozen reference.

The golden fixtures top out well under 100 blocks, but the span-offset
prefix sum is computed with log-doubling passes whose depth grows with the
block count (2000 blocks exercises 11 levels vs ~7 for fixtures) and the
segment-wise smoothing takes different paths on long edge-free runs. This
test compares the Spark pipeline against goldenref on synthetic documents at
block counts straddling every power-of-two boundary up to MAX_BLOCKS, plus
adversarial label patterns (all-content, all-boilerplate, rare edges, edge
at each end).
"""

from __future__ import annotations

from ocr_spark import spec
from ocr_spark.schemas import PAGES_SCHEMA

GOOD = "<p>the of it is and to in that for on as with at by from up about</p>"
SHORT = "<p>xx</p>"                      # 'short' -> non-edge
BAD = '<p><a href="/x">all link text here</a></p>'  # link-density -> bad edge


def _doc(i, body_html):
    return (
        f"https://big.example.com/{i}", None,
        f"<html><body>{body_html}</body></html>".encode(), None, "en",
    )


def _pattern_docs():
    docs = []
    i = 0
    # block counts straddling doubling boundaries + the MAX_BLOCKS cap
    for n in (1, 2, 3, 31, 32, 33, 63, 64, 65, 255, 256, 257, 1000,
              spec.MAX_BLOCKS, spec.MAX_BLOCKS + 50):
        docs.append(_doc(i := i + 1, (SHORT + GOOD) * (n // 2) + SHORT * (n % 2)))
    # adversarial label shapes at a deep-ish size
    n = 700
    docs.append(_doc(i := i + 1, GOOD * n))          # all edges (content)
    docs.append(_doc(i := i + 1, SHORT * n))         # no edges at all
    docs.append(_doc(i := i + 1, BAD * n))           # all bad edges
    docs.append(_doc(i := i + 1, GOOD + SHORT * n))  # one edge at the start
    docs.append(_doc(i := i + 1, SHORT * n + GOOD))  # one edge at the end
    docs.append(_doc(i := i + 1, SHORT * 300 + BAD + SHORT * 300 + GOOD
                     + SHORT * 300))                 # sparse interior edges
    return docs


def test_bigdoc_matches_goldenref(spark):
    from ocr_spark.goldenref import extract_document
    from ocr_spark.operators.extract import extract_pages

    docs = _pattern_docs()
    df = spark.createDataFrame(docs, PAGES_SCHEMA).repartition(8)
    got = {r.url: r for r in extract_pages(df).collect()}
    assert len(got) == len(docs)
    for url, _, html, _, lang in docs:
        want = extract_document(url, html, lang)
        g = got[url]
        assert g.extracted_text == want["extracted_text"], url
        assert g.text_sha256 == want["text_sha256"], url
        spans = [(s.block_id, s.start, s.end, s.label) for s in g.spans]
        wspans = [
            (s["block_id"], s["start"], s["end"], s["label"])
            for s in want["spans"]
        ]
        assert spans == wspans, url
        assert g.n_blocks == want["n_blocks"], url
        assert g.n_content_blocks == want["n_content_blocks"], url
