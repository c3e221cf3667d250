"""Regenerate the golden extraction fixtures (run after any SPEC.md change).

Usage: python scripts/make_goldens.py

Writes tests/fixtures/golden.json: one record per fixture page with the
frozen reference outputs from ocr_spark.goldenref (single-threaded, pure
Python — SURVEY.md §5.1). The Spark pipeline is gated byte-identical against
this file by tests/test_golden.py.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from ocr_spark.gen import fixture_pages  # noqa: E402
from ocr_spark.goldenref import extract_document  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "golden.json"


def main() -> None:
    records = []
    for page in fixture_pages():
        g = extract_document(page["url"], page["html"], page["lang"])
        records.append(
            {
                "url": page["url"],
                "warc_ts": page["warc_ts"].isoformat(),
                "lang": page["lang"],
                "kind": g["kind"],
                "extracted_text": g["extracted_text"],
                "text_sha256": g["text_sha256"],
                "spans": g["spans"],
                "n_blocks": g["n_blocks"],
                "n_content_blocks": g["n_content_blocks"],
                "links": g["links"],
                "meta": g["meta"],
                "tables": g["tables"],
            }
        )
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(records, indent=1, ensure_ascii=False))
    print(f"wrote {len(records)} golden records -> {OUT}")


if __name__ == "__main__":
    main()
