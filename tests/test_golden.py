"""The byte-identity gate (BASELINE.json:6,15): Spark pipeline vs goldens.

Golden outputs are produced by the frozen single-threaded reference
``ocr_spark.goldenref`` (standing in for the empty reference checkout —
SURVEY.md §0/§5.1) and committed at tests/fixtures/golden.json.
"""

from __future__ import annotations

import pytest


def _spark_results(spark, fixture_df):
    from ocr_spark.operators.extract import extract_pages

    out = {}
    for r in extract_pages(fixture_df).collect():
        key = (r.url, r.warc_ts.isoformat())
        out[key] = r
    return out


@pytest.fixture(scope="module")
def extracted(spark, fixture_df):
    return _spark_results(spark, fixture_df)


def test_goldenref_is_stable(golden_records):
    """Regenerating goldens from the frozen reference must match the
    committed file — catches accidental spec drift."""
    from ocr_spark.gen import fixture_pages
    from ocr_spark.goldenref import extract_document

    regen = {}
    for page in fixture_pages():
        g = extract_document(page["url"], page["html"], page["lang"])
        regen[(page["url"], page["warc_ts"].isoformat())] = g
    assert len(regen) == len(golden_records)
    for rec in golden_records:
        g = regen[(rec["url"], rec["warc_ts"])]
        assert g["extracted_text"] == rec["extracted_text"], rec["url"]
        assert g["text_sha256"] == rec["text_sha256"], rec["url"]
        assert g["links"] == rec["links"], rec["url"]
        assert g["meta"] == rec["meta"], rec["url"]
        assert g["tables"] == rec["tables"], rec["url"]


def test_links_exact(spark, fixture_df, golden_records):
    """SPEC §5 gate: pipeline outlinks == golden reference, per url, exact
    (href bytes, anchor bytes, link_id order)."""
    from ocr_spark.operators.extract import extract_outlinks

    got: dict = {}
    for r in extract_outlinks(fixture_df).collect():
        got.setdefault((r.url, r.warc_ts.isoformat()), []).append(
            (r.link_id, r.href, r.anchor)
        )
    for rec in golden_records:
        want = [
            (lk["link_id"], lk["href"], lk["anchor"]) for lk in rec["links"]
        ]
        have = sorted(got.get((rec["url"], rec["warc_ts"]), []))
        assert have == want, rec["url"]


def test_meta_exact(spark, fixture_df, golden_records):
    """SPEC §6 gate: pipeline page metadata == golden reference, per url,
    byte-exact across all four fields."""
    from ocr_spark.operators.extract import extract_metadata

    got = {
        (r.url, r.warc_ts.isoformat()): {
            "title": r.title,
            "description": r.description,
            "canonical": r.canonical,
            "og_title": r.og_title,
        }
        for r in extract_metadata(fixture_df).collect()
    }
    for rec in golden_records:
        assert got[(rec["url"], rec["warc_ts"])] == rec["meta"], rec["url"]


def test_tables_exact(spark, fixture_df, golden_records):
    """SPEC §7 gate: pipeline table-cell fragments == golden reference,
    per url, exact (ids, header flag, cell bytes, document order)."""
    from ocr_spark.operators.extract import extract_tables

    got: dict = {}
    for r in extract_tables(fixture_df).collect():
        got.setdefault((r.url, r.warc_ts.isoformat()), []).append(
            (r.table_id, r.row_id, r.cell_id, r.header, r.cell_text)
        )
    for rec in golden_records:
        want = [
            (c["table_id"], c["row_id"], c["cell_id"], c["header"], c["text"])
            for c in rec["tables"]
        ]
        have = sorted(got.get((rec["url"], rec["warc_ts"]), []))
        assert have == sorted(want), rec["url"]


def test_rowcount(extracted, golden_records):
    assert len(extracted) == len(golden_records)


def test_byte_identical_text(extracted, golden_records):
    for rec in golden_records:
        r = extracted[(rec["url"], rec["warc_ts"])]
        assert r.extracted_text == rec["extracted_text"], rec["url"]
        assert r.text_sha256 == rec["text_sha256"], rec["url"]


def test_spans_exact(extracted, golden_records):
    for rec in golden_records:
        r = extracted[(rec["url"], rec["warc_ts"])]
        got = [[s.block_id, s.start, s.end, s.label] for s in r.spans]
        want = [[s["block_id"], s["start"], s["end"], s["label"]] for s in rec["spans"]]
        assert got == want, rec["url"]


def test_block_counts(extracted, golden_records):
    for rec in golden_records:
        r = extracted[(rec["url"], rec["warc_ts"])]
        assert r.n_blocks == rec["n_blocks"], rec["url"]
        assert r.n_content_blocks == rec["n_content_blocks"], rec["url"]


def test_span_offsets_consistent(extracted):
    """Spans must tile extracted_text exactly: text[start:end] is the block
    text and blocks are separated by exactly one SEP char."""
    from ocr_spark.spec import SEP

    for r in extracted.values():
        prev_end = None
        for s in r.spans:
            if prev_end is not None:
                assert s.start == prev_end + len(SEP)
            segment = r.extracted_text[s.start : s.end]
            assert SEP not in segment
            prev_end = s.end
        if r.spans:
            assert r.spans[-1].end == len(r.extracted_text)
