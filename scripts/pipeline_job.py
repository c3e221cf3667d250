"""Crawl-to-training-corpus: the WHOLE engine as one launchable job.

    .warc.gz archive ──ingest──► pages table ──extract──► documents
      ──[host/line curation]──► quality filter ──► exact dedup
      ──► MinHash near-dedup (CC optional) ──► contamination screen
      ──► stratified sample ──► token packing ──► packed corpus
                                                   + funnel report

Usage (same launch mode as every other job)::

    zip -qr engine.zip ocr_spark
    spark-submit --master <cluster> --py-files engine.zip \\
        scripts/pipeline_job.py <out_dir> [n_pages] [budget] [warc_dir] \\
        [--full-cc] [--substr-clean] [--host-gate] [--line-dedup]

Thin deterministic composition of the two production jobs — no third
implementation of any stage:

* stage 1 = scripts/warc_ingest_job.run_warc_ingest_job (synth mode when
  no ``warc_dir``: writes a real ``.warc.gz`` archive from deterministic
  pages, ingests its own archive, and FAILS LOUDLY if one record framed
  or sliced wrong — the round-trip digest check rides along);
* stage 2 = scripts/corpus_job.run_corpus_job pointed at stage 1's pages
  table (extraction -> funnel -> packing, all stage decisions
  md5/integer-exact and cluster-size-invariant).

The ingested pages carry lang=NULL — extraction's stopword features fall
back to the frozen DEFAULT_LANG set (spec.stopword_set), which is the
honest production situation for un-tagged crawl data.

Scale notes: stage 1 is shuffle-free (binaryFile + one narrow mapInArrow
split); stage 2 stages the extracted table once (one write + cheap
re-scans instead of ~7 re-parses) and every dedup/sampling decision is a
hash threshold or a bucketed join — see scripts/corpus_job.py and
ocr_spark/operators/corpus.py for the per-stage plan audit.

Prints ONE JSON line: both stage reports plus end-to-end wall seconds and
pages->kept-tokens totals.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))


def run_pipeline_job(
    spark,
    out_dir: str,
    n_pages: int = 20000,
    budget: int = 2048,
    warc_dir: str | None = None,
    full_cc: bool = False,
    substr_clean: bool = False,
    host_gate: bool = False,
    line_dedup: bool = False,
) -> dict:
    from corpus_job import run_corpus_job
    from warc_ingest_job import run_warc_ingest_job

    out = pathlib.Path(out_dir)
    t0 = time.perf_counter()

    pages_df = None
    if warc_dir is None:
        # synth mode: archive the corpus-funnel generator (injected
        # exact/near dups, quality rejects, contamination carriers) rather
        # than the link-graph generator, whose all-boilerplate bodies the
        # funnel correctly reduces to nothing
        from ocr_spark.gen import corpus_pages

        pages_df = corpus_pages(spark, n_pages)

    ingest = run_warc_ingest_job(
        spark, str(out / "ingest"), n_pages=n_pages, warc_dir=warc_dir,
        pages_df=pages_df,
    )
    corpus = run_corpus_job(
        spark,
        str(out / "corpus"),
        budget=budget,
        pages_location=str(out / "ingest" / "pages"),
        full_cc=full_cc,
        substr_clean=substr_clean,
        host_gate=host_gate,
        line_dedup=line_dedup,
        # the archive carries no language tag: recover it with the frozen
        # stopword-argmax predictor so quality scores against the right list
        lang_recover=True,
    )

    wall = time.perf_counter() - t0
    report = {
        "out": str(out),
        "pages_in": ingest["n_rows"],
        "kept_rows": corpus["kept_rows"],
        "kept_tokens": corpus["kept_tokens"],
        "sequences": corpus["sequences"],
        "ingest": ingest,
        "corpus": corpus,
        "wall_sec": round(wall, 3),
        "pages_per_sec": (
            round(ingest["n_rows"] / wall, 1) if wall > 0 else None
        ),
    }
    (out / "pipeline.json").write_text(json.dumps(report, indent=2))
    return report


def main() -> None:
    flags = {"--full-cc", "--substr-clean", "--host-gate", "--line-dedup"}
    argv = [a for a in sys.argv[1:] if a not in flags]
    if not argv:
        print(__doc__)
        sys.exit(2)
    out_dir = argv[0]
    n_pages = int(argv[1]) if len(argv) > 1 else 20000
    budget = int(argv[2]) if len(argv) > 2 else 2048
    warc_dir = argv[3] if len(argv) > 3 else None

    from ocr_spark.session import build_session

    spark = build_session(app_name="pipeline")
    try:
        print(json.dumps(run_pipeline_job(
            spark, out_dir, n_pages, budget, warc_dir,
            full_cc="--full-cc" in sys.argv[1:],
            substr_clean="--substr-clean" in sys.argv[1:],
            host_gate="--host-gate" in sys.argv[1:],
            line_dedup="--line-dedup" in sys.argv[1:],
        )))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
