"""SPEC.md §7 table product: plan shape + the cap-independence rules the
golden corpus can't economically cover (MAX_BLOCKS x MAX_TABLE_CELLS
interaction needs 2000-block documents).

Semantics are primarily gated by tests/test_golden.py::test_tables_exact
(12-fixture family, two independent parser implementations byte-agree);
this file pins the execution plan and the §7.5 cap independence.
"""

from __future__ import annotations

import re


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_extract_tables_plan_is_narrow(spark, fixture_df):
    """One MapInArrow hop + JVM explode, zero Exchange: ingest-shaped."""
    from ocr_spark.operators.extract import extract_tables

    plan = _plan(extract_tables(fixture_df))
    assert "Exchange" not in plan
    assert len(re.findall(r"^\(\d+\) MapInArrow", plan, re.M)) == 1
    assert "BatchEvalPython" not in plan


def test_records_join_builds_on_filtered_headers(spark):
    """web_table_records: the header side is filtered before the join (one
    row per table column), and the plan has no cartesian/nested-loop."""
    import __spark_entry__ as em

    df = em.queries()["web_table_records"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cell_cap_independent_of_block_cap():
    """§7.5: MAX_BLOCKS and MAX_TABLE_CELLS do not interact. A document
    whose block cap is exhausted BEFORE its table still emits cell
    fragments; blocks stay capped."""
    from ocr_spark import spec
    from ocr_spark.html_blocks import parse_payload

    filler = b"".join(
        b"<p>filler block %d</p>" % i for i in range(spec.MAX_BLOCKS + 5)
    )
    html = filler + b"<table><tr><td>late cell</td></tr></table>"
    kind, blocks, links, meta, tables = parse_payload(html, "en")
    assert kind == "html"
    assert len(blocks) == spec.MAX_BLOCKS
    assert tables == [
        {
            "table_id": 0,
            "row_id": 0,
            "cell_id": 0,
            "header": False,
            "text": "late cell",
        }
    ]


def test_cell_cap_applies_across_tables():
    """§7.6: the fragment cap is per DOCUMENT, summed across tables."""
    from ocr_spark import spec
    from ocr_spark.html_blocks import parse_payload

    per_table = spec.MAX_TABLE_CELLS // 2
    one = b"".join(
        b"<tr><td>a %d</td></tr>" % i for i in range(per_table)
    )
    two = b"".join(
        b"<tr><td>b %d</td></tr>" % i for i in range(per_table + 10)
    )
    html = b"<table>" + one + b"</table><table>" + two + b"</table>"
    _, _, _, _, tables = parse_payload(html, "en")
    assert len(tables) == spec.MAX_TABLE_CELLS
    n_second = sum(1 for c in tables if c["table_id"] == 1)
    assert n_second == spec.MAX_TABLE_CELLS - per_table


def test_pdf_and_empty_payloads_have_no_tables():
    import json

    from ocr_spark.html_blocks import parse_payload

    pdf = json.dumps(
        {"kind": "pdf", "blocks": [
            {"text": "cell-like", "x0": 0, "y0": 0, "x1": 10, "y1": 10}
        ]}
    ).encode()
    assert parse_payload(pdf, "en")[4] == []
    assert parse_payload(None, "en")[4] == []
    assert parse_payload(b"", "en")[4] == []


def test_incremental_tables_two_waves_exactly_once(spark, tmp_path):
    """§7 cell fragments as a stream: two waves of page files through one
    checkpoint — each page's cells land exactly once; an idle re-run
    appends nothing."""
    import pyspark.sql.functions as F

    from ocr_spark.streaming.incremental import incremental_tables

    src = tmp_path / "pages"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def write_wave(n, start, name):
        rows = [
            (
                f"https://t{i}.example/p",
                f"<table><tr><th>h</th></tr><tr><td>cell {i}</td></tr>"
                f"</table>".encode(),
            )
            for i in range(start, start + n)
        ]
        df = spark.createDataFrame(rows, "url string, html binary").select(
            "url",
            F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("warc_ts"),
            "html",
            F.lit(None).cast("string").alias("text"),
            F.lit("en").alias("lang"),
        )
        df.coalesce(1).write.mode("append").parquet(str(src))

    def run():
        writer, _ = incremental_tables(
            spark, str(src), out, ckpt, run_id="tables-stream-test"
        )
        writer.trigger(availableNow=True).start().awaitTermination()

    write_wave(10, 0, "w1")
    run()
    got1 = spark.read.parquet(f"{out}/data")
    assert got1.count() == 20  # 1 header + 1 body cell per page

    write_wave(5, 10, "w2")
    run()
    got2 = spark.read.parquet(f"{out}/data")
    assert got2.count() == 30
    assert got2.select("url", "table_id", "cell_id").distinct().count() == 30

    run()  # idle re-run: nothing appended
    assert spark.read.parquet(f"{out}/data").count() == 30
