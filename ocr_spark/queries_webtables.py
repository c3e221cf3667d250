"""Registry entries for the SPEC.md §7 table product (round 4 late).

The famous structured-data face of a crawl: price grids, standings,
infobox rows. Three entries, all running the REAL single-hop parse
(mapInArrow -> cell-fragment explode, ocr_spark/operators/extract.py
``extract_tables``) over HTML synthesized deterministically from the
``documents`` table, graded by first-principles DuckDB oracles that
re-derive every fragment from the frozen §7 event rules without seeing a
byte of the parser:

- ``extract_tables_wrapped``: the fragment product itself — a 3-row
  table with a th header row, a nested inner table in a cell (innermost-
  open attribution), and a trailing cell AFTER the inner table returns to
  the outer table's fragment counter.
- ``web_table_shapes``: per-(url, table) shape profile (n_rows, n_cells,
  n_header_cells) — the scan that finds "real" data tables (many rows,
  headered) vs layout tables at corpus scale; one narrow parse + one
  groupBy Exchange on the (url, table_id) key.
- ``web_table_records``: table -> records: header cells name the columns,
  body cells join by column position (rank of cell_id within the row) —
  the htmltable-to-rows transform of a structured-extraction pipeline.
  Window + self-join on (url, table_id, col_idx); the nested-table cell
  diverting to its own table_id (so the outer row 2 has ONE cell, which
  maps to the FIRST header) is frozen §7 semantics the oracle mirrors.

Scale notes (100 TB): the parse stays the one Arrow hop shared with the
flagship (no second Python crossing); shapes is a single partial-agg
shuffle keyed by (url, table_id) — no skew beyond MAX_TABLE_CELLS=500
fragments per document by the §7.6 cap, which bounds any one url's
contribution; records adds one window + one shuffle join on the same key,
and the header side is filtered BEFORE the join so the build side is one
row per (table, column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_spark.queries import register, t


def _table_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    return d.select(
        F.concat(F.lit("tbl://"), did).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><body><table>"
                      "<tr><th>k one</th><th>k two</th></tr>"
                      "<tr><td>r"), did,
                F.lit("</td><td>"), F.col("n_chars").cast("string"),
                F.lit("</td></tr><tr><td>"
                      "<table><tr><td>n"), did,
                F.lit("</td></tr></table>"
                      "</td><td>tail "), did,
                F.lit("</td></tr></table><p>prose outside the table"
                      "</p></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
        F.lit("en").alias("lang"),
    )


# Expected fragments per document, from the §7 event trace:
#   outer table id 0: (r0,c0,th,'k one') (r0,c1,th,'k two')
#                     (r1,c2,td,'r{id}') (r1,c3,td,'{n_chars}')
#                     (r2,c4,td,'tail {id}')
#   inner table id 1: (r0,c0,td,'n{id}')
_FRAGMENTS_ORACLE = """
WITH d AS (
  SELECT 'tbl://' || CAST(doc_id AS VARCHAR) AS url,
         CAST(doc_id AS VARCHAR) AS did,
         CAST(n_chars AS VARCHAR) AS nc
  FROM documents
)
SELECT url, CAST(0 AS INT) AS table_id, CAST(0 AS INT) AS row_id,
       CAST(0 AS INT) AS cell_id, TRUE AS header, 'k one' AS cell_text
FROM d
UNION ALL
SELECT url, 0, 0, 1, TRUE, 'k two' FROM d
UNION ALL
SELECT url, 0, 1, 2, FALSE, 'r' || did FROM d
UNION ALL
SELECT url, 0, 1, 3, FALSE, nc FROM d
UNION ALL
SELECT url, 1, 0, 0, FALSE, 'n' || did FROM d
UNION ALL
SELECT url, 0, 2, 4, FALSE, 'tail ' || did FROM d
"""


@register("extract_tables_wrapped", _FRAGMENTS_ORACLE)
def q_extract_tables_wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_spark.operators.extract import extract_tables

    cells = extract_tables(_table_pages(spark, sf_dir))
    return cells.select(
        "url", "table_id", "row_id", "cell_id", "header", "cell_text"
    )


_SHAPES_ORACLE = """
WITH d AS (
  SELECT 'tbl://' || CAST(doc_id AS VARCHAR) AS url FROM documents
)
SELECT url, CAST(0 AS INT) AS table_id, CAST(3 AS INT) AS n_rows,
       CAST(5 AS BIGINT) AS n_cells, CAST(2 AS BIGINT) AS n_header_cells
FROM d
UNION ALL
SELECT url, 1, 1, 1, 0 FROM d
"""


@register("web_table_shapes", _SHAPES_ORACLE)
def q_web_table_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_spark.operators.extract import extract_tables

    cells = extract_tables(_table_pages(spark, sf_dir))
    return cells.groupBy("url", "table_id").agg(
        (F.max("row_id") + F.lit(1)).cast("int").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.col("header").cast("bigint")).alias("n_header_cells"),
    )


_RECORDS_ORACLE = """
WITH d AS (
  SELECT 'tbl://' || CAST(doc_id AS VARCHAR) AS url,
         CAST(doc_id AS VARCHAR) AS did,
         CAST(n_chars AS VARCHAR) AS nc
  FROM documents
)
SELECT url, CAST(0 AS INT) AS table_id, CAST(1 AS INT) AS row_id,
       'k one' AS col_name, 'r' || did AS value
FROM d
UNION ALL
SELECT url, 0, 1, 'k two', nc FROM d
UNION ALL
SELECT url, 0, 2, 'k one', 'tail ' || did FROM d
"""


@register("web_table_records", _RECORDS_ORACLE)
def q_web_table_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headered table -> records: body cells keyed by the header cell at
    the same column position. Column position = rank of cell_id within the
    (url, table_id, row_id) group (cell_id is the per-table fragment
    counter, so rank-within-row recovers the column). The inner table's
    lone cell lives under its OWN table_id with no header row, so the
    inner join drops it — only headered tables produce records."""
    from ocr_spark.operators.extract import extract_tables

    cells = extract_tables(_table_pages(spark, sf_dir))
    w = Window.partitionBy("url", "table_id", "row_id").orderBy("cell_id")
    pos = cells.withColumn("col_idx", F.row_number().over(w))
    headers = pos.filter(
        (F.col("row_id") == 0) & F.col("header")
    ).select("url", "table_id", "col_idx", F.col("cell_text").alias("col_name"))
    body = pos.filter(F.col("row_id") > 0).select(
        "url", "table_id", "row_id", "col_idx",
        F.col("cell_text").alias("value"),
    )
    return body.join(headers, ["url", "table_id", "col_idx"]).select(
        "url", "table_id", "row_id", "col_name", "value"
    )


@register("stream_tables", _FRAGMENTS_ORACLE)
def q_stream_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §7 table product as a STREAM, graded by the same first-
    principles fragment oracle as the batch entry: the synthetic table
    pages are written as page FILES, consumed by the Structured-Streaming
    file source (availableNow), parsed by the same single-hop path, and
    committed exactly-once per micro-batch — a dropped batch, a replayed
    duplicate, or a parse divergence between the batch and stream paths
    all break the hash."""
    import os
    import tempfile

    from ocr_spark.streaming.incremental import incremental_tables

    work = tempfile.mkdtemp(prefix="ocr-spark-stream-tables-")
    src_dir = os.path.join(work, "pages")
    pages = _table_pages(spark, sf_dir).withColumn(
        # the file-source schema carries (url, warc_ts, html, text, lang);
        # give recrawl-dedup a real event time
        "warc_ts", F.to_timestamp(F.lit("2026-01-01 00:00:00"))
    ).withColumn("text", F.lit(None).cast("string"))
    pages.select("url", "warc_ts", "html", "text", "lang").repartition(
        4
    ).write.mode("overwrite").parquet(src_dir)
    writer, _ = incremental_tables(
        spark, src_dir, os.path.join(work, "out"),
        os.path.join(work, "ckpt"), run_id="stream-tables-q",
    )
    writer.trigger(availableNow=True).start().awaitTermination()
    cells = spark.read.parquet(os.path.join(work, "out", "data"))
    return cells.select(
        "url", "table_id", "row_id", "cell_id", "header", "cell_text"
    )


# --- heading outline -------------------------------------------------------------------
# The document-structure product next to tables: the h1..h6 outline in
# document order (block_id), with the heading level as an integer. Needs
# NO parser change — §1 blocks already carry their context tag; this is a
# JVM-side filter over the same single-hop parse. The wrapped entry
# synthesizes a 2-level outline with a decoy (an h2 inside <svg> must NOT
# appear: skip regions suppress its data events) and a paragraph between
# headings (must not appear either).


def _outline_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    return d.select(
        F.concat(F.lit("toc://"), did).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("<html><body><h1>title "), did,
                F.lit("</h1><p>body paragraph between</p>"
                      "<svg><h2>ghost heading</h2></svg>"
                      "<h2>section one</h2><p>more body</p>"
                      "<h2>section "), did,
                F.lit("</h2></body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
        F.lit("en").alias("lang"),
    )


# block ids in document order: h1=0, p=1, h2(section one)=2, p=3, h2=4
_OUTLINE_ORACLE = """
WITH d AS (
  SELECT 'toc://' || CAST(doc_id AS VARCHAR) AS url,
         CAST(doc_id AS VARCHAR) AS did
  FROM documents
)
SELECT url, CAST(0 AS INT) AS block_id, CAST(1 AS INT) AS level,
       'title ' || did AS heading
FROM d
UNION ALL
SELECT url, 2, 2, 'section one' FROM d
UNION ALL
SELECT url, 4, 2, 'section ' || did FROM d
"""


@register("extract_outline", _OUTLINE_ORACLE)
def q_extract_outline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_spark.operators.extract import parse_pages

    parsed = parse_pages(_outline_pages(spark, sf_dir))
    heads = parsed.select(
        "url",
        F.explode(
            F.expr(
                "filter(blocks, b -> b.tag IN"
                " ('h1','h2','h3','h4','h5','h6'))"
            )
        ).alias("b"),
    )
    return heads.select(
        "url",
        F.col("b.block_id").alias("block_id"),
        F.expr("CAST(substring(b.tag, 2, 1) AS INT)").alias("level"),
        F.col("b.text").alias("heading"),
    )
