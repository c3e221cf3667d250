"""The driver-verification query registry (SURVEY.md §2, __spark_entry__.py).

Each entry pairs a PySpark DataFrame query with the ANSI-SQL oracle DuckDB
runs on the same parquet tables. The driver compares row-count + schema +
order-insensitive value hash at sf0.01; tests/test_oracle.py replicates that
comparison locally and strictly.

Cross-engine determinism rules used throughout (SURVEY.md §3.3):

- every computed column is aliased identically on both sides;
- floating-point aggregates go through exact integer/bigint arithmetic
  (``round(x*100) -> sum bigint -> /100.0``) so partial-aggregation order
  can never change a bit;
- all window orderings carry a unique tie-break column;
- hashes use md5/sha256 (identical hex in Spark and DuckDB) — never
  engine-specific hash functions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_spark import spec

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _sql_list(words) -> str:
    items = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(words))
    return f"[{items}]"


def _spark_array(words) -> str:
    items = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(words))
    return f"array({items})"


EN_STOP_SQL = _sql_list(spec.STOPWORDS["en"])
EN_STOP_SPARK = _spark_array(spec.STOPWORDS["en"])

# stopword list resolver keyed on the row's lang (both dialects)
_LANG_CASE_SQL = "CASE " + " ".join(
    f"WHEN lang = '{lg}' THEN {_sql_list(ws)}" for lg, ws in spec.STOPWORDS.items()
) + f" ELSE {EN_STOP_SQL} END"
# Spark side uses a constant map literal instead of a CASE chain: one foldable
# expression + an O(1) per-row lookup, instead of N branches each constructing
# a ~100-element array (the CASE form measured 10x slower at sf0.1)
_STOPMAP_SPARK = "map(" + ", ".join(
    f"'{lg}', {_spark_array(ws)}" for lg, ws in spec.STOPWORDS.items()
) + ")"
_LANG_CASE_SPARK = (
    f"coalesce(element_at({_STOPMAP_SPARK}, lang), {EN_STOP_SPARK})"
)

# ---------------------------------------------------------------------------
# Flagship: end-to-end extraction with a full SQL oracle (SURVEY §2 op 11-17).
#
# Wraps documents.text into a 3-block HTML page (nav boilerplate / one content
# paragraph prefixed with stopword-rich filler / footer boilerplate), runs the
# REAL extraction pipeline (mapInArrow HTML parse -> classify -> smooth ->
# assemble), and the oracle recomputes SPEC.md §2 semantics directly in SQL:
# nav and footer have link_density > 0.33 -> boilerplate; the paragraph is
# content iff text_len >= 20 and stopword_density >= 0.30 (its link_density
# is 0 and its only edge neighbors are bad, so smoothing reduces to exactly
# that predicate).
# ---------------------------------------------------------------------------

_PREFIX_UNIT = "the is a of to in and it with for "


@register(
    "extract_wrapped",
    f"""
WITH feats AS (
  SELECT doc_id,
    trim(regexp_replace(
      repeat('{_PREFIX_UNIT}',
             greatest(1, CAST(round(n_chars / 60.0, 0) AS INT))) || text,
      '\\s+', ' ', 'g')) AS ptext
  FROM documents
), c AS (
  SELECT doc_id, ptext,
    length(ptext) AS tl,
    len(string_split(ptext, ' ')) AS nw,
    len(list_filter(string_split(ptext, ' '),
        w -> list_contains({EN_STOP_SQL},
                           trim(lower(w), '.,;:!?"''()[]{{}}')))) AS ns
  FROM feats
), r AS (
  SELECT doc_id,
    CASE WHEN tl >= 20 AND ns * 1.0 / nw >= 0.30 THEN ptext ELSE '' END
      AS extracted_text
  FROM c
)
SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
       extracted_text,
       sha256(extracted_text) AS text_sha256,
       3 AS n_blocks,
       CASE WHEN extracted_text = '' THEN 0 ELSE 1 END AS n_content_blocks
FROM r
""",
)
def q_extract_wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_spark.operators.extract import extract_pages

    docs = t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit('<html><body><nav><a href="/a">one link</a> '
                      '<a href="/b">two link</a></nav><p>'),
                F.expr(
                    f"repeat('{_PREFIX_UNIT}',"
                    " greatest(1, CAST(round(n_chars / 60.0, 0) AS INT)))"
                ),
                F.col("text"),
                F.lit('</p><footer><a href="/t">terms</a> c</footer>'
                      "</body></html>"),
            ),
            "UTF-8",
        ).alias("html"),
        F.col("text"),
        F.lit("en").alias("lang"),
    )
    ex = extract_pages(pages)
    return ex.select(
        "url",
        "extracted_text",
        "text_sha256",
        F.col("n_blocks").cast("int").alias("n_blocks"),
        F.col("n_content_blocks").cast("int").alias("n_content_blocks"),
    )


# --- A. scans --------------------------------------------------------------

@register(
    "scan_counts",
    " UNION ALL ".join(
        f"SELECT '{tb}' AS tbl, count(*) AS n FROM {tb}" for tb in TABLES
    ),
)
def q_scan_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for tb in TABLES:
        d = t(spark, sf_dir, tb).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(tb).alias("tbl"), "n"
        )
        out = d if out is None else out.unionByName(d)
    return out


@register("gen_pages", None)  # deterministic generator: rows-only driver check
def q_gen_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 op 3: seeded synthetic Common-Crawl-style pages, pure column
    expressions (no external data, no per-row Python)."""
    from ocr_spark.gen import bench_pages

    p = bench_pages(spark, 2000)
    return p.select(
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.octet_length("html").alias("n_bytes"),
        F.sha2(F.coalesce(F.col("html"), F.lit(b"")), 256).alias("html_sha256"),
        "lang",
    )


@register("scan_pages", None)  # table-layer round trip: rows-only driver check
def q_scan_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 ops 1+4: write a pages table through the manifest-layer
    layout and read it back with the spec'd schema."""
    import tempfile

    from ocr_spark.gen import bench_pages
    from ocr_spark.operators.runner import read_pages

    path = tempfile.mkdtemp(prefix="ocr-spark-scan-pages-") + "/pages"
    bench_pages(spark, 500).write.mode("overwrite").parquet(path)
    p = read_pages(spark, path)
    return p.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.octet_length("html")).alias("bytes"),
    )


_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
       time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS win_end,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


@register("stream_tumbling_counts", _TUMBLING_SQL)
def q_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 op 52 as a driver-visible query, via the scalable pattern:
    incremental rollup through ``foreachBatch``. Each micro-batch appends its
    PARTIAL per-window counts to a batch-scoped parquet location (no
    unbounded streaming state, no complete-mode/memory-sink driver
    materialization), and one batch aggregation compacts the partials —
    equal to the batch ``window()`` agg no matter how the availableNow drain
    split micro-batches. Equality with the batch agg is asserted in
    tests/test_streaming.py for the pages pipeline; round-4 close
    upgrades this from rows-only to a VALUE-HASH oracle (DuckDB
    time_bucket — Spark's window() is epoch-aligned exactly like it),
    the same promotion stream_dedup_minhash got earlier in the round."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F2

    # the file stream source requires a DIRECTORY of files
    work = tempfile.mkdtemp(prefix="ocr-spark-stream-q-")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(src_dir, "events.parquet"))
    out_dir = os.path.join(work, "partials")

    def commit(bdf: DataFrame, bid: int) -> None:
        (
            bdf.groupBy(F2.window("ts", "1 hour").alias("win"))
            .agg(F2.count(F2.lit(1)).alias("n_part"))
            .select(
                F2.col("win.start").alias("win_start"),
                F2.col("win.end").alias("win_end"),
                "n_part",
            )
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={bid}"))
        )

    q = (
        spark.readStream.schema(t(spark, sf_dir, "events").schema)
        .parquet(src_dir)
        .writeStream.foreachBatch(commit)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(out_dir)
        .groupBy("win_start", "win_end")
        .agg(F2.sum("n_part").alias("n"))
    )


def _stream_dedup_minhash_oracle() -> str:
    # batch-equivalent restatement of the streaming kept counts (round-4
    # upgrade from rows-only): batch 0 keeps the within-batch star-pass
    # survivors (rep == doc_id) plus every signature-less doc (< 3 words →
    # no shingles → nothing to band); batch 1 is an exact recrawl, so every
    # BANDED star survivor matches its own batch-0 band keys in the store
    # and is suppressed — only the signature-less docs survive again.
    # (Resolved lazily via _LAZY_ORACLES: queries_textml imports this
    # module for @register, so importing it back at module scope here
    # would be circular.)
    from ocr_spark.queries_textml import (
        _bands_sql,
        _minhash_sql_base,
        NUM_PERMS,
    )

    return (
        _minhash_sql_base(NUM_PERMS)
        + _bands_sql()
        + """
, bm AS (SELECT bi, band, min(doc_id) AS bmin FROM bands GROUP BY bi, band)
, rep AS (
  SELECT b.doc_id, min(bm.bmin) AS rep
  FROM bands b JOIN bm ON b.bi = bm.bi AND b.band = bm.band
  GROUP BY b.doc_id
)
, nosig AS (
  SELECT count(*) AS n FROM documents d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM sig)
)
, keep1 AS (SELECT count(*) AS n FROM rep WHERE rep = doc_id)
SELECT CAST(0 AS INTEGER) AS batch_seq,
  CAST((SELECT n FROM nosig) + (SELECT n FROM keep1) AS BIGINT) AS rows_kept
UNION ALL
SELECT CAST(1 AS INTEGER) AS batch_seq,
  CAST((SELECT n FROM nosig) AS BIGINT) AS rows_kept
"""
    )


@register("stream_dedup_minhash", None)  # oracle via _LAZY_ORACLES below
def q_stream_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup suppression as a driver-visible query: the
    documents table arrives as TWO identical micro-batches
    (maxFilesPerTrigger=1 over two copies of the file); the first batch
    keeps its within-batch star-pass survivors, the second — an exact
    recrawl of the whole corpus — is suppressed entirely against the
    band-key store (signature-less docs, which band nowhere, survive both
    waves). Returns one (batch_seq, rows_kept) row per micro-batch from
    the exactly-once manifest; deterministic regardless of which copy the
    file source picks first. VALUE-checked against a batch-equivalent
    DuckDB oracle (round-4 upgrade from rows-only); semantics + crash
    windows pinned in tests/test_streaming.py."""
    import os
    import shutil
    import tempfile

    from ocr_spark.streaming.incremental import incremental_dedup_minhash

    work = tempfile.mkdtemp(prefix="ocr-spark-stream-mh-")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    for i in (1, 2):
        shutil.copy(
            f"{sf_dir}/documents.parquet",
            os.path.join(src_dir, f"wave{i}.parquet"),
        )
    docs = (
        spark.readStream.schema(t(spark, sf_dir, "documents").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select("doc_id", "text")
    )
    writer, committer = incremental_dedup_minhash(
        docs, os.path.join(work, "out"), os.path.join(work, "ckpt")
    )
    writer.trigger(availableNow=True).start().awaitTermination()
    recs = [
        (seq, bid)
        for seq, bid in enumerate(sorted(committer.committed()))
    ]
    import json as _json

    rows = [
        (
            seq,
            _json.loads(committer._record(bid).read_text())["rows"],
        )
        for seq, bid in recs
    ]
    return spark.createDataFrame(rows, "batch_seq int, rows_kept long")


def _stream_dedup_cc_oracle() -> str:
    # batch-equivalent kept counts for the full_cc streaming mode: batch 0
    # keeps one doc per CONNECTED COMPONENT of the band graph (recursive
    # reachability, the same oracle device as dedup_cc) plus every
    # signature-less doc; batch 1 — an exact recrawl — keeps only the
    # signature-less docs (the store now carries the band keys of ALL seen
    # docs, so every banded doc matches). Lazy via _LAZY_ORACLES
    # (circular import, same as stream_dedup_minhash).
    from ocr_spark.queries_textml import (
        _bands_sql,
        _minhash_sql_base,
        NUM_PERMS,
    )

    return (
        _minhash_sql_base(NUM_PERMS).replace(
            "WITH w AS", "WITH RECURSIVE w AS", 1
        )
        + _bands_sql()
        + """
, edges AS (
  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
  FROM bands a JOIN bands b
    ON a.bi = b.bi AND a.band = b.band AND a.doc_id <> b.doc_id
),
reach AS (
  SELECT doc_id, doc_id AS r FROM sig
  UNION
  SELECT e.dst AS doc_id, reach.r
  FROM reach JOIN edges e ON e.src = reach.doc_id
),
rep AS (SELECT doc_id, min(r) AS rep FROM reach GROUP BY doc_id),
nosig AS (
  SELECT count(*) AS n FROM documents d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM sig)
),
keep1 AS (SELECT count(*) AS n FROM rep WHERE rep = doc_id)
SELECT CAST(0 AS INTEGER) AS batch_seq,
  CAST((SELECT n FROM nosig) + (SELECT n FROM keep1) AS BIGINT) AS rows_kept
UNION ALL
SELECT CAST(1 AS INTEGER) AS batch_seq,
  CAST((SELECT n FROM nosig) AS BIGINT) AS rows_kept
"""
    )


@register("stream_dedup_cc", None)  # oracle via _LAZY_ORACLES below
def q_stream_dedup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full_cc streaming suppressor as a driver-visible query (round
    4): same two-wave drive as stream_dedup_minhash but with
    ``full_cc=True`` — within-batch TRUE connected components and an
    all-docs band-key store, so the kept counts equal the batch CC
    decision: one keeper per component + signature-less docs in wave 1,
    signature-less docs only in wave 2. Oracle: DuckDB recursive-CTE
    reachability (the dedup_cc device) restated as per-batch counts."""
    import os
    import shutil
    import tempfile

    from ocr_spark.streaming.incremental import incremental_dedup_minhash

    work = tempfile.mkdtemp(prefix="ocr-spark-stream-cc-")
    src_dir = os.path.join(work, "src")
    os.makedirs(src_dir)
    for i in (1, 2):
        shutil.copy(
            f"{sf_dir}/documents.parquet",
            os.path.join(src_dir, f"wave{i}.parquet"),
        )
    docs = (
        spark.readStream.schema(t(spark, sf_dir, "documents").schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select("doc_id", "text")
    )
    writer, committer = incremental_dedup_minhash(
        docs, os.path.join(work, "out"), os.path.join(work, "ckpt"),
        full_cc=True,
    )
    writer.trigger(availableNow=True).start().awaitTermination()
    import json as _json

    rows = [
        (
            seq,
            _json.loads(committer._record(bid).read_text())["rows"],
        )
        for seq, bid in enumerate(sorted(committer.committed()))
    ]
    return spark.createDataFrame(rows, "batch_seq int, rows_kept long")


# --- B. projection / filter / derivation ------------------------------------

@register(
    "project_prune",
    "SELECT doc_id, lang FROM documents WHERE doc_id % 7 = 0",
)
def q_project_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", "lang")
    )


@register(
    "filter_pred",
    "SELECT doc_id, n_chars FROM documents WHERE lang = 'en' AND n_chars > 100",
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.filter((F.col("lang") == "en") & (F.col("n_chars") > 100)).select(
        "doc_id", "n_chars"
    )


@register(
    "derive_host",
    """
SELECT doc_id,
  regexp_extract('https://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR),
                 'https?://([^/]+)/', 1) AS host,
  regexp_extract('https://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR),
                 'https?://[^/]+(/.*)$', 1) AS path
FROM documents
""",
)
def q_derive_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").withColumn(
        "url",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/d/"),
            F.col("doc_id").cast("string"),
        ),
    )
    return d.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
    )


@register(
    "derive_hashes",
    "SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256 "
    "FROM documents",
)
def q_derive_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
    )


# --- C. extraction-core analogs on driver tables -----------------------------

@register(
    "explode_blocks",
    """
SELECT doc_id,
  unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
  unnest(string_split(text, ' ')) AS word
FROM documents WHERE doc_id % 10 = 0
""",
)
def q_explode_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )


@register(
    "classify_blocks",
    f"""
SELECT doc_id, tl AS text_len, nw AS n_words, ns AS n_stop,
  CASE WHEN tl < {spec.LEN_SHORT} THEN 'short'
       WHEN ns * 1.0 / nw >= {spec.STOP_GOOD} THEN 'good'
       WHEN ns * 1.0 / nw >= {spec.STOP_NEAR} THEN 'near'
       ELSE 'bad' END AS label
FROM (
  SELECT doc_id, length(text) AS tl, len(string_split(text, ' ')) AS nw,
    len(list_filter(string_split(text, ' '),
        w -> list_contains({_LANG_CASE_SQL}, lower(w)))) AS ns
  FROM documents
)
""",
)
def q_classify_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    # `stops` is hoisted out of the lambda: lambda bodies are re-evaluated
    # per array element, which would rebuild the stopword array per token
    d = d.withColumn("stops", F.expr(_LANG_CASE_SPARK)).select(
        "doc_id",
        F.length("text").alias("tl"),
        F.size(F.split("text", " ")).alias("nw"),
        F.expr(
            "size(filter(split(text, ' '), w -> "
            "array_contains(stops, lower(w))))"
        ).alias("ns"),
    )
    dens = F.col("ns") * 1.0 / F.col("nw")
    return d.select(
        "doc_id",
        F.col("tl").alias("text_len"),
        F.col("nw").alias("n_words"),
        F.col("ns").alias("n_stop"),
        F.when(F.col("tl") < spec.LEN_SHORT, "short")
        .when(dens >= spec.STOP_GOOD, "good")
        .when(dens >= spec.STOP_NEAR, "near")
        .otherwise("bad")
        .alias("label"),
    )


@register(
    "smooth_labels",
    """
SELECT event_id, event_type,
  lag(event_type) OVER w AS prev_type,
  lead(event_type) OVER w AS next_type,
  CASE WHEN event_type = 'click'
        AND (lag(event_type) OVER w = 'error'
             OR lead(event_type) OVER w = 'error')
       THEN 'error_adjacent' ELSE event_type END AS smoothed
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_smooth_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    nxt = F.lead("event_type").over(w)
    return e.select(
        "event_id",
        "event_type",
        prev.alias("prev_type"),
        nxt.alias("next_type"),
        F.when(
            (F.col("event_type") == "click")
            & ((prev == "error") | (nxt == "error")),
            "error_adjacent",
        ).otherwise(F.col("event_type")).alias("smoothed"),
    )


# NOTE: (l_orderkey, l_linenumber) is NOT unique in the driver's synthetic
# lineitem — the window order must be total, or running sums are ambiguous
# across engines. The tie-break chain below includes every column that
# contributes to the output, so residual ties are exact-duplicate rows and
# produce identical output multisets regardless of order.
_SPAN_ORDER_SQL = "l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice"


@register(
    "span_offsets",
    f"""
SELECT l_orderkey, l_linenumber,
  CAST(coalesce(sum(CAST(l_quantity AS BIGINT)) OVER (
    PARTITION BY l_orderkey ORDER BY {_SPAN_ORDER_SQL}
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off,
  CAST(coalesce(sum(CAST(l_quantity AS BIGINT)) OVER (
    PARTITION BY l_orderkey ORDER BY {_SPAN_ORDER_SQL}
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
    + CAST(l_quantity AS BIGINT) AS BIGINT) AS end_off
FROM lineitem
""",
)
def q_span_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy(
            "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice",
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    qty = F.col("l_quantity").cast("bigint")
    start = F.coalesce(F.sum(qty).over(w), F.lit(0)).cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        start.alias("start_off"),
        (start + qty).cast("bigint").alias("end_off"),
    )


@register(
    "stopword_density",
    f"""
SELECT doc_id,
  CAST(round(len(list_filter(string_split(text, ' '),
      w -> list_contains({EN_STOP_SQL}, lower(w)))) * 1000000.0
    / len(string_split(text, ' ')), 0) AS BIGINT) AS stop_ppm
FROM documents WHERE lang = 'en'
""",
)
def q_stopword_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    return d.select(
        "doc_id",
        F.expr(
            f"CAST(round(size(filter(split(text, ' '), w -> "
            f"array_contains({EN_STOP_SPARK}, lower(w)))) * 1000000.0"
            f" / size(split(text, ' ')), 0) AS BIGINT)"
        ).alias("stop_ppm"),
    )


# The driver's CORRECTNESS_r{N}.json keeps only the FIRST 50 registry
# entries in iteration order, so the registry is rotated each round to keep
# every entry's driver row at most two rounds old. Round-4 priority order
# (executing the plan recorded here at the end of round 3):
#   1. `join_cross` FIRST — its source changed after its last driver
#      grading (SQL VALUES literal replaced createDataFrame(list) in
#      c240d27), so it needs the freshest possible row;
#   2. the other 32 entries whose freshest driver row is r02 (everything
#      past position 50 in CORRECTNESS_r03.json: sim_ann_ivf …
#      agg_custom_pandas);
#   3. `extract_wrapped` — the flagship keeps a fresh driver row every
#      round by policy;
#   4. `stream_dedup_minhash` — upgraded this round from rows-only to a
#      DuckDB value-hash oracle, so the first hash grading must land;
#   5. anything newly registered in r04 (lands in the head automatically):
#      stream_dedup_cc, sim_ann_ivf_trained, pipe_pack_hashed, then the
#      queries_corpusml block (dedup_substr_spans, dedup_substr_clean,
#      dedup_substr_prod, text_ppl_proxy, text_gopher_rules,
#      text_collocations, pipe_mix_domains, pipe_shuffle_shard,
#      sim_ann_pq, tokenizer_bpe_merges, tokenizer_bpe_encode) —
#      head 49 + scan_counts = exactly the 50-cap; the registry is FULL
#      for r04, nothing more may be added ahead of the tail this round;
#   6. everything r03-graded goes to the tail list.
#
# ROUND-5 ROTATION PLAN (do this at the start of r05): FIRST in
# _PRIORITY_R05 goes sim_ann_search — changed post-r03-grading (the r03
# single-probe form was green on 0 rows at sf0.01, zero hash signal; now a
# 10-probe batch with per-probe window top-k, 18 rows — locally
# oracle-verified, but its freshest driver row predates the code, the same
# situation join_cross led r04 for). Then: the r04 head is
# EXACTLY the 50-cap (35 rotation + 14 corpus-block-2 + extract_links),
# so the entries missing an r04 row are (a) the 13 LATE round-4 webgraph
# entries past the cap (graph_hostlinks, graph_pagerank,
# dedup_lines_boiler, pipe_dsir, quality_lr_weights, quality_lr_score,
# pipe_url_filter, pipe_host_filter, graph_anchor_text, text_normalize,
# stream_hostlinks, quality_lr_prod, pipe_dsir_prod — brand new, NEVER
# driver-graded; they must lead _PRIORITY_R05) and (b)
# _R03_DRIVER_GRADED minus scan_counts — 46 entries, all r03-green. Build
# _PRIORITY_R05 = [the 13 late entries, then the 8 web-ingest entries added
# after the round-close (scan_warc_roundtrip, scan_warc_gzip,
# stream_warc_ingest, web_wet_roundtrip, web_cdx, web_crawl_diff,
# web_crawl_schedule, pipe_robots_filter — also never driver-graded), then
# the 3 weburl entries (web_url_canon, web_url_dedup_canon,
# web_sitemap_parse — same status), then web_frontier, extract_meta and
# web_wat_roundtrip (round-4 close additions, never graded), then the
# queries_trainprep block (pipe_chunk_windows, pipe_split_holdout,
# pipe_split_leakage — same status), then the queries_search block
# (search_postings, search_bm25_topk, search_phrase — same status), then
# the queries_media block (mm_decode_bmp, mm_resize_bmp, mm_audio_wav —
# real codec-free decode, same status), then the queries_tables block
# (table_snap_timetravel, table_snap_merge, table_snap_evolve,
# table_snap_rollback — snapshot table layer, same status), then the
# queries_cluster block (cluster_kmeans, dedup_semantic — integer-exact
# k-means + SemDeDup, same status) and graph_hits (HITS beside
# PageRank, same status), then the final late-r04 additions (all
# never-graded): profile_table, table_snap_cdc, table_zorder_key,
# table_mv_maintain, sketch_bloom_seen, sketch_cms_heavy,
# sketch_hll_distinct, sketch_hist_quantile, stream_hll_registers,
# events_sessionize, events_funnel, events_retention, graph_triangles,
# dedup_editdist_pairs, dedup_editdist_keepers (SymSpell near-dup join),
# extract_tables_wrapped, web_table_shapes, web_table_records (the SPEC §7
# table product — golden-gated AND oracle-graded, never driver-graded),
# dedup_para_keepfirst, dedup_para_survivors (CCNet keep-first paragraph
# dedup, groupBy-min skew shape), search_keywords_tfidf (e4 tf-idf top-5),
# graph_host_components (site families, CC over the real parsed host
# graph), mm_phash_dedup (aHash image dedup through the real BMP decode),
# extract_langid_wrapped (language-recovering extraction under the hash),
# search_snippets (explode-free first-occurrence windows), stream_tables
# (the §7 product through the streaming committer, batch-oracle-graded),
# extract_outline (h1..h6 structure product, svg-decoy pinned),
# stream_join_static + stream_join_interval (streaming joins: broadcast
# stream-static enrich, watermarked stream-stream interval join — real
# availableNow drains under batch value-hash oracles), text_ppl_kn
# (interpolated Kneser-Ney bigram LM, two-corpus-pass persist shape),
# pipe_ppl_buckets (CCNet head/middle/tail terciles, integer-exact
# percentile_disc over the distinct-score histogram), dedup_containment
# (Broder containment over a df-capped shingle inverted index — the
# asymmetric quote/subset pairs resemblance LSH misses),
# scan_jsonl_roundtrip + scan_csv_roundtrip + scan_orc_roundtrip
# (text-format connectors: hostile-column exports read back under the
# value hash — escaping/dialect/timestamp/nested-type coverage),
# mm_decode_png (REAL stdlib-zlib PNG decode: chunk CRCs, multi-IDAT
# inflate, all five scanline filters, grey/RGB/RGBA, reject families),
# mm_decode_gif (REAL hand-rolled LZW GIF decode: bit unpacking, code
# growth, clear codes, cScSc, interlace under a placement checksum),
# mm_audio_frames (per-64-sample-frame integer energy + zero crossings)
# and mm_sniff_decode (magic-byte dispatch over mixed BMP/PNG/GIF
# payloads, per-branch closed-form oracle), tpch_q1/q3/q5/q6/q18 (the
# named TPC-H suite through the spark.sql entry point, identical query
# text on both engines, integer-cents revenue), events_resample
# (gap-filled 6h time-series densification, broadcast dense axis),
# mm_decode_tiff (REAL byte-order-honoring baseline TIFF: II/MM IFD
# walk, inline-vs-offset values, multi-strip assembly under chk),
# events_anomaly (rolling z-score outlier flags, integer cross-multiplied
# 3-sigma test, one event_type Exchange for all three frame aggregates),
# mm_mp4_meta (REAL ISO-BMFF box walk: version-aware mvhd/tkhd/mdhd,
# u64 largesize + v1 durations, order-sensitive handler checksum),
# dq_suite (Deequ-pattern constraint suite: 9 checks compiled into ONE
# scan + single-row agg, integer-e6 verdicts, both pass/fail polarities),
# mm_decode_jpeg (REAL baseline JPEG: canonical Huffman entropy decode,
# DC prediction + restart resets, byte unstuffing, 4:2:0 upsample,
# exact DC-only roundtrip under the placement checksum),
# stream_dq_metrics (streaming DQ monitoring: one exactly-once counter
# row per micro-batch, SUM-folded verdicts equal batch dq_check — the
# merge law under the value hash; uniqueness rejected as non-mergeable),
# events_range_frame (time-RANGE window frames: value-bounded trailing
# 6h, tie-order-free), win_ntile_buckets (ntile quartiles over a unique
# order), fn_pivot (listed-values PIVOT as one conditional-agg pass),
# tpch_q4/q12/q14/q19/q22 (suite growth: EXISTS->semi, conditional
# counts, promo share, OR-of-ANDs residual hash join, scalar-subquery +
# NOT EXISTS->anti; plan shapes pinned in tests/test_plans.py),
# tpch_q13 (LEFT OUTER with ON-residual + two-level aggregation),
# mm_sniff_all (FIVE-format magic dispatch: bmp/png/gif/tiff/jpeg each
# graded in its own closed-form oracle CASE arm), fn_unpivot (stack:
# wide->long with explicit zero cells — the reshape pair of fn_pivot),
# tpch_q2/q7/q8/q9/q10/q11/q15/q16/q17/q20/q21 (suite COMPLETION — all 22
# named queries now run through the SQL entry point; the partsupp-built
# four treat lineitem as the part-supplier catalog; plan pins for
# Q2/Q16/Q17/Q20/Q21 in tests/test_plans.py), scan_xml_roundtrip (Spark 4
# built-in xml source: entity escaping, null-as-omitted-element, struct/
# array nesting under the hash — avro stays env-blocked like Iceberg, the
# jar is not in the sandbox), join_lateral (correlated LATERAL subquery,
# identical text both engines, WindowGroupLimit plan pinned), agg_rollup
# (ROLLUP + grouping() — CUBE's prefix-hierarchy pair, one Expand pinned),
# win_cume_dist (tie-safe empirical-CDF window), fn_xml_parse +
# fn_csv_parse (from_xml/from_csv in-COLUMN parse expressions — the
# per-value siblings of the file connectors, quoted-delimiter and
# attribute coverage), web_feed_items (RSS-style channel assembly ->
# from_xml ARRAY<STRUCT> -> explode), pipe_sample_systematic
# (stride-walk weighted sampling: exact-BIGINT budget law, md5-permuted
# per-bucket prefix sums — the low-variance pair of the Bernoulli
# stratified sampler; property-tested in tests/test_corpus.py),
# graph_bfs_dist (multi-source BFS frontier expansion vs a recursive-CTE
# oracle — crawl-depth reachability; functions/graph.bfs_distances),
# events_scd2 (SCD2 validity intervals via gaps-and-islands; current row
# open), pipe_c4_rules (C4 line-level cleaning, Raffel et al. 2020:
# terminal-punct/>=3-word line gates, lorem-ipsum/javascript drops,
# curly-brace + <3-line doc rejection — lines synthesized
# deterministically, both polarities fire), sketch_source_jaccard
# (source-vs-source MinHash similarity matrix with the exact Jaccard
# audit column riding along), sim_random_projection (Achlioptas +-1 JL
# projection 64d->8d, literal sign arrays, zero exchanges), stream_scd2
# (streaming SCD2 maintenance: exactly-once append-only purchase log +
# read-side interval fold sharing events_scd2's code path — intervals are
# deliberately log-structured, not merge-maintained; see
# incremental_scd2's docstring), sql_recursive_cte (WITH RECURSIVE month
# spine, fact aggregated BEFORE the broadcast join — UnionLoop never
# touches corpus-sized data, plan-pinned), fn_variant (VARIANT
# parse_json -> variant_get typed paths incl. nested/array/missing),
# fn_sql_udf (catalog CREATE FUNCTION ... RETURN <expr>, Catalyst
# inlines — no Python node, pushdown through the call site pinned),
# agg_group_by_all (GROUP BY ALL / ORDER BY ALL sugar -> plain
# partial/final agg, identical text both engines), set_union_byname
# (UNION ALL BY NAME schema-evolution union vs DuckDB's native BY NAME),
# join_dpp (dynamic partition pruning: month-partitioned fact side-write,
# join-derived month set lands in the scan's PartitionFilters as a
# dynamicpruningexpression — plan-pinned; oracle recomputes from raw
# parquet), join_runtime_bloom (runtime bloom_filter_agg +
# might_contain probe guard under floored thresholds on an isolated
# newSession, conf non-leak pinned), privacy_k_anon (k-anonymous
# release: pseudonymize + generalize + suppress QI groups < K, one
# QI-keyed window exchange — plan-pinned), privacy_l_div (l-diversity
# homogeneity audit per QI group), sketch_hll_merge (the merge algebra
# graded end-to-end: per-source register tables, their MAX-fold, and a
# direct global build agree bucket-for-bucket under one oracle — the
# property distributed sketching rests on), events_ewma (integer-exact
# EWMA over a bounded 16-row window frame: powers-of-two cent weights,
# BIGINT throughout, one user-keyed exchange), sketch_hist_merge (the
# SUM-monoid merge law beside HLL's MAX — per-source histograms fold to
# the global table, P50 at bucket -1, exact median at -2),
# join_temporal_scd2 (as-of tier enrichment against the SCD2 dim as a
# union-fold: one user-keyed window, no interval join, no explode —
# oracle spells the interval join independently), events_seqpattern
# (MATCH_RECOGNIZE-style funnel counting: per-user event history as one
# deterministic string, pattern negations as regex, ONE groupBy instead
# of k-way self-joins; regex scan parity verified cross-engine),
# scan_csv_corrupt (PERMISSIVE quarantine: three malformed classes
# reconstructed closed-form by the oracle — parse/null/raw-line split
# under the hash), udtf_table_arg (Spark 4 TABLE-argument UDTF with
# PARTITION BY/ORDER BY: stateful per-group Python, oracle's lag/groupBy
# checks the partition-and-order contract; parenthesized multi-key ORDER
# BY parser quirk recorded), scan_merge_schema (mergeSchema
# evolution-on-read: v1/v2 parquet generations union to the superset
# schema, v1 rows NULL the added columns — oracle reconstructs the null
# pattern closed-form), fn_collation (Spark 4 UTF8_LCASE collated
# grouping — comparison-level case folding, case-preserving
# representatives re-lowered on output; oracle is the lower() rewrite),
# fn_try_arith (ANSI-mode try_divide/try_add/try_to_number error
# containment; oracle spells each failure arm as CASE since DuckDB's own
# ANSI addition would raise — and floor() on both sides of the divide
# because bare double->BIGINT casts truncate in Spark but round in
# DuckDB) —
# pipe_sample_reservoir (A-ES weighted reservoir, integer-exact
# max-of-w-draws priorities, TakeOrderedAndProject merge law),
# dedup_sorted_neighborhood (two-pass SN blocking: one window Exchange,
# lag candidates, exact levenshtein verify), graph_label_prop
# (synchronous LPA communities over a planted-6-community graph, finer
# than CC across sparse bridges), events_ab_test (two-proportion z-test
# readout, cross-multiplied verdict, planted-uplift polarity),
# pipe_triplets (contrastive anchor/positive/negative construction),
# stream_reservoir (the reservoir merge law under the exactly-once
# streaming committer, batch-oracle-graded), tokenizer_unigram_vocab +
# tokenizer_unigram_encode (SentencePiece unigram Viterbi-EM — rows-only
# like the BPE pair, pytest-gated vs an independent reference),
# profile_join_advisor (broadcast/salt/shuffle advisory profile, all
# arms fire), sim_maxsim (ColBERT MaxSim late interaction, e6-integer
# cosines before any aggregation), text_readability (integer Flesch),
# events_forecast_naive (seasonal-naive backtest), events_ab_test,
# events_cohort_ltv (cohort LTV curve), graph_ppr (personalized
# PageRank, seed-scoped teleport), join_bucketed (the co-located
# bucketed join under the value hash end-to-end), scan_json_corrupt
# (PERMISSIVE JSON quarantine: class-specific whole-row vs field-level
# null semantics), events_path_analysis (Markov transition matrix),
# pipe_span_corruption + pipe_fim_transform (T5 denoising + FIM/PSM
# infilling example builders, round-trip pinned), sketch_kmv_jaccard
# (bottom-k/theta sketch: merge law as literal kth equality, KMV
# Jaccard), pipe_dpo_pairs (preference pairs by quality rank),
# web_redirects (pointer-doubling redirect resolution + cycle flags),
# table_snap_wap (branch/tag write-audit-publish on the snapshot
# layer), mm_image_tiles (ViT-style patching through the real BMP
# decode), events_attribution (linear + last-touch in one relation),
# events_cohort_ltv and events_forecast_naive siblings as listed above,
# events_rfm (RFM quartile segmentation), text_sentiment (integer
# lexicon valence with injected polarity arms), quality_lr_calibration
# (reliability diagram over the trained LR scores),
# search_rake_keyphrases (corpus-free RAKE top-3, gaps-and-islands
# segmentation), events_survival (Kaplan-Meier churn with censoring,
# sequential-fold float product), graph_2hop_recs (df-capped wedge
# co-occurrence recommendations), text_compressibility (zlib entropy
# proxy — rows-only by design like the tokenizer trainers),
# profile_dataset_card (one-row datasheet, Gini-Simpson balance),
# events_active_users (DAU/WAU/MAU + stickiness, exact rolling
# distinct over the user-day relation), events_streaks (longest
# consecutive-day islands per user), events_heatmap (dense 7x24
# usage matrix, explicit zero cells), pipe_pack_ffd (first-fit-
# decreasing whole-doc packing, rows-only like the tokenizer trainers) —
# plus anything registered after THIS note's last update (cross-check
# against CORRECTNESS_r04's key set: no-driver-row-EVER leads), then as
# many of those 46 as fit in this file's order], then extract_wrapped — the
# handful of r03-green fn_* rows that fall past the cap rotate forward in
# r06 (they are the lowest-risk rows in the registry). Demote this round's
# head to the tail list. Verify with `list(all_queries())[:50]` before
# committing.
_PRIORITY_R04 = [
    # (1) changed after its last driver grading — grade first
    "join_cross",
    # (2) freshest driver row is r02 (rotated out by the r03 50-cap)
    "sim_ann_ivf", "text_langid", "text_quality", "text_tokens",
    "text_fingerprint", "mm_decode_stub", "gen_pages", "scan_pages",
    "stream_tumbling_counts", "agg_approx_distinct", "project_prune",
    "filter_pred", "derive_host", "derive_hashes", "explode_blocks",
    "classify_blocks", "smooth_labels", "span_offsets", "stopword_density",
    "join_broadcast", "join_shuffle", "join_salted", "join_anti",
    "join_semi", "join_range", "join_asof", "agg_basic", "agg_distinct",
    "agg_groupingsets", "agg_collect", "agg_percentile",
    "agg_custom_pandas",
    # (3) flagship: fresh row every round
    "extract_wrapped",
    # (4) rows-only in r03, value-hash oracle added this round
    "stream_dedup_minhash",
    # (5) the rest of the frozen r04 head-50, listed EXPLICITLY so a new
    # registration in an early-imported module (e.g. queries_joins_aggs)
    # cannot displace the window mid-round — insertion order alone proved
    # fragile the day profile_table landed at slot 36 and pushed
    # extract_links past the cap.
    "stream_dedup_cc", "sim_ann_ivf_trained", "pipe_pack_hashed",
    "dedup_substr_spans", "text_ppl_proxy", "text_gopher_rules",
    "pipe_mix_domains", "pipe_shuffle_shard", "sim_ann_pq",
    "dedup_substr_clean", "dedup_substr_prod", "text_collocations",
    "tokenizer_bpe_merges", "tokenizer_bpe_encode", "extract_links",
]

# Everything with a green hash (or rows-only-by-design) driver row in
# CORRECTNESS_r03.json — registered LAST so a 50-entry cap lands on them
# before anything needing a fresh row. scan_counts leads so a basic
# scan stays near the window edge if the cap ever grows.
_R03_DRIVER_GRADED = [
    "scan_counts",
    "udf_grouped_map", "win_rownum_dedup", "win_rank_topk", "win_laglead",
    "win_frame_sum", "sort_global", "topk", "set_union", "set_except",
    "set_intersect", "fn_string", "fn_binary", "fn_datetime", "fn_math",
    "fn_array", "fn_map", "fn_json", "fn_vector", "fn_window_batch",
    "udf_scalar_iter", "udf_map_arrow",
    "dedup_minhash_sig", "mm_resize_stub", "mm_frames_stub",
    "dedup_minhash_prod", "dedup_cc", "sim_ann_2table",
    "pipe_url_canon", "pipe_repetition", "pipe_contamination",
    "pipe_sample_stratified", "pipe_pack_sequences", "pipe_scrub_pii",
    "pipe_quality_filter", "pipe_funnel",
    "join_range_bucket", "udtf_blocks", "dedup_exact", "dedup_minhash_pairs",
    "dedup_minhash_groups", "dedup_simhash", "dedup_jaccard", "dedup_embcos",
    "sim_cosine_topk", "sim_ann_lsh", "sim_ann_search", "sim_ann_multiprobe",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # importing the sibling modules populates the registry
    from ocr_spark import queries_joins_aggs  # noqa: F401
    from ocr_spark import queries_fns  # noqa: F401
    from ocr_spark import queries_textml  # noqa: F401
    from ocr_spark import queries_pipeline  # noqa: F401
    from ocr_spark import queries_corpusml  # noqa: F401
    from ocr_spark import queries_webgraph  # noqa: F401
    from ocr_spark import queries_webingest  # noqa: F401
    from ocr_spark import queries_weburl  # noqa: F401
    from ocr_spark import queries_trainprep  # noqa: F401
    from ocr_spark import queries_search  # noqa: F401
    from ocr_spark import queries_media  # noqa: F401
    from ocr_spark import queries_tables  # noqa: F401
    from ocr_spark import queries_cluster  # noqa: F401
    from ocr_spark import queries_sketch  # noqa: F401
    from ocr_spark import queries_events  # noqa: F401
    from ocr_spark import queries_editdist  # noqa: F401
    from ocr_spark import queries_webtables  # noqa: F401
    from ocr_spark import queries_paradedup  # noqa: F401
    from ocr_spark import queries_streamjoin  # noqa: F401
    from ocr_spark import queries_formats  # noqa: F401
    from ocr_spark import queries_tpch  # noqa: F401
    from ocr_spark import queries_dq  # noqa: F401
    from ocr_spark import queries_sql4  # noqa: F401
    from ocr_spark import queries_scaleopt  # noqa: F401
    from ocr_spark import queries_privacy  # noqa: F401

    prio = [k for k in _PRIORITY_R04 if k in QUERIES]
    tail = set(_R03_DRIVER_GRADED)
    new = [k for k in QUERIES if k not in set(prio) and k not in tail]
    last = [k for k in _R03_DRIVER_GRADED if k in QUERIES]
    return {k: QUERIES[k] for k in prio + new + last}


# oracles whose SQL needs the sibling modules (circular at import time);
# built on first all_oracles() call, after all_queries() has imported them
def _extract_langid_oracle() -> str:
    from ocr_spark.queries_textml import _lid_oracle

    return _lid_oracle()


_LAZY_ORACLES: dict[str, Callable[[], str]] = {
    "stream_dedup_minhash": _stream_dedup_minhash_oracle,
    "stream_dedup_cc": _stream_dedup_cc_oracle,
    "extract_langid_wrapped": _extract_langid_oracle,
}


def all_oracles() -> dict[str, str]:
    q = all_queries()
    for name, make in _LAZY_ORACLES.items():
        if name not in ORACLES:
            ORACLES[name] = make()
    return {k: ORACLES[k] for k in q if k in ORACLES}
