"""Text-format connector round-trips: JSONL, CSV, ORC under the value hash.

`documents.text` in the synthetic tables is serialization-benign (no
newlines, quotes or separators), so each round trip here adds a
deterministic doc_id-derived `tricky` column that concentrates the failure
modes of text formats — embedded double quotes, a field-internal newline,
a comma, a backslash, a non-ASCII codepoint — plus an instant-typed
timestamp and (for the formats that carry them) a nested struct and an
array. The DuckDB oracle rebuilds every value arithmetically from the
parquet table and NEVER sees the exported bytes: the hash therefore covers
the writer's escaping/quoting, the reader's dialect, timestamp
serialization both ways, and nested-type JSON encoding. A lossy dialect
(unquoted newline, mangled escape, timezone-shifted timestamp, PERMISSIVE
null-out) breaks the hash.

Scale notes: these are IO-edge operators — the in-plan tmp-dir write is
the test harness, not the production shape. Production exports control
shard count explicitly (sources/textfmt.write_jsonl(num_shards=...)); gzip
shards are the unit of read parallelism (not splittable), so the writer's
shard size is a first-class knob. Reads are schema-mandatory: inference
over 100 TB of JSONL is a full extra scan, refused by construction.
"""
from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.queries import register, t
from ocr_spark.sources import textfmt

# One expression per engine, same value per row: every hostile character a
# text format must escape, derived from columns both engines can see.
_TRICKY_SPARK = (
    "concat('q=\"', split(text, ' ')[0], '\",', char(10),"
    " 'u=é', char(92), CAST(doc_id % 7 AS STRING))"
)
_TRICKY_SQL = (
    "'q=\"' || split_part(text, ' ', 1) || '\",' || chr(10)"
    " || 'u=é' || chr(92) || CAST(doc_id % 7 AS VARCHAR)"
)
_TS_SPARK = "timestamp_seconds(1600000000 + doc_id * 3600)"
_TS_US_SQL = "(1600000000 + doc_id * 3600) * 1000000"

_NESTED_SQL = f"""
SELECT doc_id, lang, source, n_chars, text,
  {_TRICKY_SQL} AS tricky,
  {_TS_US_SQL} AS ts_us,
  lang AS meta_lang, n_chars AS meta_n,
  array_to_string(list_slice(string_split(text, ' '), 1, 3), '|') AS toks3
FROM documents
"""

_FLAT_SQL = f"""
SELECT doc_id, lang, source, n_chars, text,
  {_TRICKY_SQL} AS tricky,
  {_TS_US_SQL} AS ts_us
FROM documents
"""


def _hostile(spark: SparkSession, sf_dir: str, nested: bool) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars", "text",
        F.expr(_TRICKY_SPARK).alias("tricky"),
        F.expr(_TS_SPARK).alias("ts"),
    )
    if nested:
        d = d.withColumn(
            "meta", F.expr("named_struct('ml', lang, 'mn', n_chars)")
        ).withColumn("toks", F.expr("slice(split(text, ' '), 1, 3)"))
    return d


def _unpack(back: DataFrame, nested: bool) -> DataFrame:
    cols = [
        F.col("doc_id"), F.col("lang"), F.col("source"), F.col("n_chars"),
        F.col("text"), F.col("tricky"),
        F.unix_micros("ts").alias("ts_us"),
    ]
    if nested:
        cols += [
            F.col("meta.ml").alias("meta_lang"),
            F.col("meta.mn").alias("meta_n"),
            F.concat_ws("|", "toks").alias("toks3"),
        ]
    return back.select(*cols)


@register("scan_jsonl_roundtrip", _NESTED_SQL)
def q_scan_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + hostile columns → 4 `.json.gz` JSONL shards → explicit-
    schema read-back. JSON string escaping (\\n, \\", backslash, unicode),
    instant-preserving timestamp serialization, struct and array encoding
    are all under the hash — the oracle recomputes values from parquet and
    never parses a JSON byte."""
    base = _hostile(spark, sf_dir, nested=True)
    work = tempfile.mkdtemp(prefix="ocr-spark-jsonl-")
    path = os.path.join(work, "export")
    textfmt.write_jsonl(base, path, num_shards=4)
    return _unpack(textfmt.read_jsonl(spark, path, base.schema), nested=True)


@register("scan_csv_roundtrip", _FLAT_SQL)
def q_scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract through headered CSV: the tricky field carries an
    embedded quote, comma AND newline, so the writer must quote+double and
    the reader must parse multiLine records — a lossy dialect nulls or
    shears the field and breaks the hash. (No struct/array: CSV is flat.)"""
    base = _hostile(spark, sf_dir, nested=False)
    work = tempfile.mkdtemp(prefix="ocr-spark-csv-")
    path = os.path.join(work, "export")
    textfmt.write_csv(base, path, num_shards=4)
    return _unpack(textfmt.read_csv(spark, path, base.schema), nested=False)


@register("scan_orc_roundtrip", _NESTED_SQL)
def q_scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar sibling: ORC write/read with nested types. Binary-safe by
    construction — this entry gates the ORC type mapping (timestamp,
    struct, array) rather than escaping."""
    base = _hostile(spark, sf_dir, nested=True)
    work = tempfile.mkdtemp(prefix="ocr-spark-orc-")
    path = os.path.join(work, "export")
    textfmt.write_orc(base, path, num_shards=4)
    return _unpack(textfmt.read_orc(spark, path), nested=True)


# XML-specific hostile column: the characters the XML writer must entity-
# escape (`<`, `&`, a pre-escaped-looking literal '&amp;' that a double-
# unescaping reader would mangle) plus the newline and unicode the other
# formats carry. No value-edge whitespace: the xml reader's
# ignoreSurroundingSpaces trims it by design (see sources/textfmt.read_xml).
_XTRICKY_SPARK = (
    "concat('<a href=\"x\">&', split(text, ' ')[0], '</a>', char(10),"
    " 'é&amp;raw', CAST(doc_id % 7 AS STRING))"
)
_XTRICKY_SQL = (
    "'<a href=\"x\">&' || split_part(text, ' ', 1) || '</a>' || chr(10)"
    " || 'é&amp;raw' || CAST(doc_id % 7 AS VARCHAR)"
)

_XML_SQL = f"""
SELECT doc_id, lang, source, n_chars, text,
  {_XTRICKY_SQL} AS tricky,
  {_TS_US_SQL} AS ts_us,
  CASE WHEN doc_id % 10 = 0 THEN NULL ELSE lang END AS maybe_lang,
  lang AS meta_lang, n_chars AS meta_n,
  array_to_string(list_slice(string_split(text, ' '), 1, 3), '|') AS toks3
FROM documents
"""


@register("scan_avro_roundtrip", _NESTED_SQL)
def q_scan_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-oriented sibling: Avro write/read with nested types — the
    schema-evolution interchange of Kafka/streaming ecosystems. The r04
    VERDICT queued a one-time probe; it found the avro classes bundled
    inside spark-sql itself (only the short-name registration is missing),
    so this runs for real via textfmt's full-classname spelling. Binary-
    safe by construction — this entry gates the Avro type mapping
    (micros timestamp, record, array) rather than escaping."""
    base = _hostile(spark, sf_dir, nested=True)
    work = tempfile.mkdtemp(prefix="ocr-spark-avro-")
    path = os.path.join(work, "export")
    textfmt.write_avro(base, path, num_shards=4)
    return _unpack(textfmt.read_avro(spark, path), nested=True)


@register("scan_xml_roundtrip", _XML_SQL)
def q_scan_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + XML-hostile columns → 4 XML shards (Spark 4 built-in
    xml source) → explicit-schema read-back. Under the hash: text-node
    entity escaping (`<`, `&`, and a literal '&amp;' a double-unescaping
    reader would mangle), field-internal newlines, null-as-omitted-element
    (maybe_lang), instant-preserving timestamps, struct nesting and
    repeated-element arrays. The oracle rebuilds every value from parquet
    and never parses an XML byte."""
    base = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars", "text",
        F.expr(_XTRICKY_SPARK).alias("tricky"),
        F.expr(_TS_SPARK).alias("ts"),
        F.expr(
            "CASE WHEN doc_id % 10 = 0 THEN NULL ELSE lang END"
        ).alias("maybe_lang"),
        F.expr("named_struct('ml', lang, 'mn', n_chars)").alias("meta"),
        F.expr("slice(split(text, ' '), 1, 3)").alias("toks"),
    )
    work = tempfile.mkdtemp(prefix="ocr-spark-xml-")
    path = os.path.join(work, "export")
    textfmt.write_xml(base, path, num_shards=4)
    back = textfmt.read_xml(spark, path, base.schema)
    return back.select(
        "doc_id", "lang", "source", "n_chars", "text", "tricky",
        F.unix_micros("ts").alias("ts_us"),
        "maybe_lang",
        F.col("meta.ml").alias("meta_lang"),
        F.col("meta.mn").alias("meta_n"),
        F.concat_ws("|", "toks").alias("toks3"),
    )


# --- PERMISSIVE corrupt-record quarantine -----------------------------------

# the three malformed-row classes, derived from doc_id so the oracle can
# reconstruct every line closed-form: %7==3 short row (missing column),
# %7==5 type-corrupt int field, %7==6 extra trailing token
_CORRUPT_LINE_SPARK = """
CASE
  WHEN doc_id % 7 = 3 THEN concat(doc_id, ',', lang)
  WHEN doc_id % 7 = 5 THEN concat(doc_id, ',', lang, ',xx', n_chars)
  WHEN doc_id % 7 = 6 THEN concat(doc_id, ',', lang, ',', n_chars, ',extra')
  ELSE concat(doc_id, ',', lang, ',', n_chars)
END
"""

_CORRUPT_LINE_DUCK = """
CASE
  WHEN doc_id % 7 = 3 THEN doc_id || ',' || lang
  WHEN doc_id % 7 = 5 THEN doc_id || ',' || lang || ',xx' || n_chars
  WHEN doc_id % 7 = 6 THEN doc_id || ',' || lang || ',' || n_chars
                           || ',extra'
  ELSE doc_id || ',' || lang || ',' || n_chars
END
"""

_CSV_CORRUPT_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN doc_id % 7 IN (3, 5) THEN NULL
            ELSE CAST(n_chars AS BIGINT) END AS n_chars,
       CASE WHEN doc_id % 7 IN (3, 5, 6)
            THEN {_CORRUPT_LINE_DUCK} END AS raw_line,
       CAST(doc_id % 7 IN (3, 5, 6) AS BIGINT) AS quarantined
FROM documents
ORDER BY doc_id
"""


@register("scan_csv_corrupt", _CSV_CORRUPT_SQL)
def q_scan_csv_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode corrupt-record quarantine: the operational
    ingestion contract at corpus scale, where a 100 TB read must NOT die
    on (or silently drop) the handful of malformed lines every real
    crawl export contains.

    Three malformed classes are synthesized deterministically (short
    row, type-corrupt int, extra token) and read back with an explicit
    schema + columnNameOfCorruptRecord: good fields parse, failed
    fields null out, and the RAW LINE lands in the quarantine column —
    rows-in == rows-out, every byte of every bad line preserved for
    replay. The oracle reconstructs each line and its expected parse
    closed-form, so the exact null-vs-value split per malformed class
    sits under the hash. (FAILFAST is the same reader one option away;
    DROPMALFORMED is the mode you never use on provenance-bearing
    corpora.)"""
    base = t(spark, sf_dir, "documents").selectExpr(
        f"{_CORRUPT_LINE_SPARK} AS value"
    )
    work = tempfile.mkdtemp(prefix="ocr-spark-csvcorrupt-")
    path = os.path.join(work, "export")
    base.write.text(path)
    schema = ("doc_id LONG, lang STRING, n_chars LONG, raw_line STRING")
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "raw_line")
        .csv(path)
        .select(
            "doc_id", "lang", "n_chars", "raw_line",
            F.isnotnull("raw_line").cast("bigint").alias("quarantined"),
        )
        .orderBy("doc_id")
    )


# --- schema evolution on read (mergeSchema) ---------------------------------

_MERGE_SCHEMA_SQL = """
SELECT doc_id, lang,
       CASE WHEN doc_id % 2 = 0 THEN NULL
            ELSE CAST(n_chars AS BIGINT) END AS n_chars,
       CASE WHEN doc_id % 2 = 0 THEN CAST(NULL AS VARCHAR)
            ELSE source END AS source,
       CAST(doc_id % 2 = 1 AS BIGINT) AS from_v2
FROM documents
ORDER BY doc_id
"""


@register("scan_merge_schema", _MERGE_SCHEMA_SQL)
def q_scan_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: generation v1 wrote (doc_id, lang),
    generation v2 added (n_chars, source). ``mergeSchema=true`` unions
    the footers into one superset schema — v1 rows surface the added
    columns as NULL, exactly the contract a years-long 100 TB corpus
    depends on when new extraction fields land mid-crawl. (The default
    read picks ONE footer and would silently DROP the new columns if it
    sampled a v1 file — the option is the difference between a schema
    surprise at read time and a correct union.) Even docs are v1, odd
    v2; the oracle reconstructs the null pattern closed-form."""
    d = t(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="ocr-spark-mergeschema-")
    path = os.path.join(work, "tbl")
    d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.parquet(
        path
    )
    (
        d.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "lang", F.col("n_chars").cast("long"), "source")
        .write.mode("append")
        .parquet(path)
    )
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.select(
        "doc_id", "lang", "n_chars", "source",
        F.isnotnull("source").cast("bigint").alias("from_v2"),
    ).orderBy("doc_id")


# --- JSON corrupt-record quarantine (round 4 close) --------------------------
# The JSON sibling of scan_csv_corrupt — same operational contract,
# DIFFERENT failure semantics, which is exactly what this entry pins:
# a structurally-broken record (truncated object) quarantines the WHOLE
# row (all fields null + raw line), but a type-corrupt FIELD in valid
# JSON partially parses — the other fields survive and the raw line is
# STILL quarantined (CSV nulls nothing else on an extra token; JSON
# ignores unknown fields entirely, so the extra-field class parses
# clean here where CSV's extra-token class fails). Verified empirically
# against Spark 4 and spelled closed-form in the oracle.

_JSON_CORRUPT_LINE_SPARK = """
CASE
  WHEN doc_id % 7 = 3 THEN
    concat('{"doc_id": ', doc_id, ', "lang": "', lang, '"')
  WHEN doc_id % 7 = 5 THEN
    concat('{"doc_id": ', doc_id, ', "lang": "', lang,
           '", "n_chars": "xx', n_chars, '"}')
  WHEN doc_id % 7 = 6 THEN
    concat('{"doc_id": ', doc_id, ', "lang": "', lang,
           '", "n_chars": ', n_chars, ', "extra": 1}')
  ELSE
    concat('{"doc_id": ', doc_id, ', "lang": "', lang,
           '", "n_chars": ', n_chars, '}')
END
"""

_JSON_CORRUPT_SQL = """
SELECT
  CASE WHEN doc_id % 7 = 3 THEN NULL ELSE doc_id END AS doc_id,
  CASE WHEN doc_id % 7 = 3 THEN NULL ELSE lang END AS lang,
  CASE WHEN doc_id % 7 IN (3, 5) THEN NULL ELSE n_chars END AS n_chars,
  CASE
    WHEN doc_id % 7 = 3 THEN
      '{"doc_id": ' || doc_id || ', "lang": "' || lang || '"'
    WHEN doc_id % 7 = 5 THEN
      '{"doc_id": ' || doc_id || ', "lang": "' || lang
      || '", "n_chars": "xx' || n_chars || '"}'
    ELSE NULL
  END AS raw_line,
  CAST(CASE WHEN doc_id % 7 IN (3, 5) THEN 1 ELSE 0 END AS BIGINT)
    AS quarantined
FROM documents
"""


@register("scan_json_corrupt", _JSON_CORRUPT_SQL)
def q_scan_json_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSON quarantine: four deterministically synthesized
    line classes (good / truncated object / type-corrupt field /
    ignored extra field) read back with an explicit schema +
    columnNameOfCorruptRecord. Rows-in == rows-out; the class-specific
    whole-row-vs-field-level null pattern sits under the value hash
    (block comment)."""
    base = t(spark, sf_dir, "documents").selectExpr(
        f"{_JSON_CORRUPT_LINE_SPARK} AS value"
    )
    work = tempfile.mkdtemp(prefix="ocr-spark-jsoncorrupt-")
    path = os.path.join(work, "export")
    base.write.text(path)
    return (
        spark.read.schema(
            "doc_id LONG, lang STRING, n_chars LONG, raw_line STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "raw_line")
        .json(path)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "raw_line",
            F.expr(
                "CAST(CASE WHEN raw_line IS NOT NULL THEN 1 ELSE 0 END"
                " AS BIGINT)"
            ).alias("quarantined"),
        )
    )
