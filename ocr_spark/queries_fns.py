"""Scalar-function surface + UDF/UDTF operators (SURVEY.md §2 groups H/J).

Every query is value-checked against DuckDB unless noted. Per-row scalar
double math (log1p/pow/...) is IEEE-identical across engines but libm last-ulp
differences exist for transcendentals — those columns are rounded to 6-9
decimals on BOTH sides.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.queries import register, t

# --- H42. strings ------------------------------------------------------------

@register(
    "fn_string",
    """
SELECT p_partkey,
  lower(p_name) AS lname,
  trim(p_name) AS tname,
  length(p_name) AS name_len,
  substring(p_name, 1, 4) AS name4,
  concat_ws('|', p_brand, p_type) AS brand_type,
  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
  levenshtein(p_brand, 'Brand#13') AS lev,
  translate(p_type, 'AEO', 'aeo') AS ptrans
FROM part
""",
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.trim("p_name").alias("tname"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name4"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devowel"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.levenshtein("p_brand", F.lit("Brand#13")).alias("lev"),
        F.translate("p_type", "AEO", "aeo").alias("ptrans"),
    )


# --- H43. binary ---------------------------------------------------------------

@register(
    "fn_binary",
    """
SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  to_base64(encode(substring(text, 1, 12))) AS head_b64,
  CASE WHEN decode(encode(text)) = text THEN 1 ELSE 0 END AS roundtrip_ok
FROM documents WHERE doc_id % 5 = 0
""",
)
def q_fn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    enc = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(enc).alias("n_bytes"),
        F.base64(F.encode(F.substring("text", 1, 12), "UTF-8")).alias("head_b64"),
        F.when(F.decode(enc, "UTF-8") == F.col("text"), 1).otherwise(0).alias(
            "roundtrip_ok"
        ),
    )


# --- H44. datetime ---------------------------------------------------------------

@register(
    "fn_datetime",
    """
SELECT event_id,
  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
  CAST(year(ts) AS INT) AS y,
  CAST(month(ts) AS INT) AS m,
  CAST(floor(epoch(ts)) AS BIGINT) AS unix_s,
  CAST(ts AS DATE) AS d,
  CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS days_since
FROM events WHERE event_id % 3 = 0
""",
)
def q_fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").filter(F.col("event_id") % 3 == 0)
    return e.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day_ts"),
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        F.unix_timestamp("ts").cast("bigint").alias("unix_s"),
        F.to_date("ts").alias("d"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("int")
        .alias("days_since"),
    )


# --- H45. math ---------------------------------------------------------------

@register(
    "fn_math",
    """
SELECT event_id,
  CAST(round(ln(1 + value), 6) AS DOUBLE) AS log1p_v,
  CAST(round(pow(value, 2), 4) AS DOUBLE) AS v_sq,
  CAST(round(value, 1) AS DOUBLE) AS v_r1,
  CAST(greatest(value, 100.0) AS DOUBLE) AS v_hi,
  CAST(least(value, 100.0) AS DOUBLE) AS v_lo,
  CAST(abs(value - 150.0) AS DOUBLE) AS v_dev
FROM events WHERE event_id % 4 = 0
""",
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").filter(F.col("event_id") % 4 == 0)
    v = F.col("value")
    return e.select(
        "event_id",
        F.round(F.log1p(v), 6).cast("double").alias("log1p_v"),
        F.round(F.pow(v, 2), 4).cast("double").alias("v_sq"),
        F.round(v, 1).cast("double").alias("v_r1"),
        F.greatest(v, F.lit(100.0)).cast("double").alias("v_hi"),
        F.least(v, F.lit(100.0)).cast("double").alias("v_lo"),
        F.abs(v - 150.0).cast("double").alias("v_dev"),
    )


# --- H46. arrays / higher-order functions --------------------------------------

@register(
    "fn_array",
    """
SELECT doc_id,
  len(string_split(text, ' ')) AS n_tokens,
  array_to_string(list_slice(list_sort(string_split(text, ' ')), 1, 5), ',')
    AS first5_sorted,
  len(list_filter(string_split(text, ' '), w -> length(w) > 5)) AS n_long,
  CAST(list_aggregate(list_transform(string_split(text, ' '),
       w -> length(w)), 'sum') AS BIGINT) AS sum_word_len,
  CASE WHEN len(list_filter(string_split(text, ' '), w -> w = 'spark')) > 0
       THEN 1 ELSE 0 END AS has_spark
FROM documents WHERE doc_id % 9 = 0
""",
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 9 == 0)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_join(F.slice(F.sort_array(toks), 1, 5), ",").alias("first5_sorted"),
        F.size(F.filter(toks, lambda w: F.length(w) > 5)).alias("n_long"),
        F.aggregate(
            F.transform(toks, F.length),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("bigint").alias("sum_word_len"),
        F.when(F.exists(toks, lambda w: w == F.lit("spark")), 1)
        .otherwise(0)
        .alias("has_spark"),
    )


# --- H47. maps ---------------------------------------------------------------

@register(
    "fn_map",
    """
SELECT doc_id,
  lang AS m_lang,
  CAST(n_chars AS VARCHAR) AS m_chars,
  'lang,n_chars' AS m_keys
FROM documents WHERE doc_id % 11 = 0
""",
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds a real MapType column, then projects scalars out of it so the
    oracle can value-check (DuckDB MAP literals hash differently)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    m = F.create_map(
        F.lit("lang"), F.col("lang"),
        F.lit("n_chars"), F.col("n_chars").cast("string"),
    )
    d = d.withColumn("m", m)
    return d.select(
        "doc_id",
        F.element_at("m", "lang").alias("m_lang"),
        F.element_at("m", "n_chars").alias("m_chars"),
        F.array_join(F.map_keys("m"), ",").alias("m_keys"),
    )


# --- H48. json ---------------------------------------------------------------

@register(
    "fn_json",
    """
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
  CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) > 50
       THEN 'hi' ELSE 'lo' END AS k_bucket
FROM events WHERE event_id % 2 = 0
""",
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").filter(F.col("event_id") % 2 == 0)
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("k_val"),
        F.when(k > 50, "hi").otherwise("lo").alias("k_bucket"),
    )


# --- H49. vector math over array<float> -----------------------------------------

_DOT_SPARK = (
    "aggregate(zip_with(embedding, probe, (x, y) ->"
    " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE),"
    " (s, v) -> s + v)"
)
_NORM_SPARK = (
    "sqrt(aggregate(transform({col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (s, v) -> s + v))"
)
_DOT_SQL = (
    "list_aggregate(list_transform(generate_series(1, len(embedding)),"
    " i -> CAST(embedding[i] AS DOUBLE) * CAST(probe[i] AS DOUBLE)), 'sum')"
)
_NORM_SQL = (
    "sqrt(list_aggregate(list_transform({col},"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
)


@register(
    "fn_vector",
    f"""
SELECT e.vec_id,
  CAST(round({_DOT_SQL}
    / ({_NORM_SQL.format(col='embedding')} * {_NORM_SQL.format(col='probe')}),
    6) AS DOUBLE) AS cosine
FROM embeddings e
CROSS JOIN (SELECT embedding AS probe FROM embeddings WHERE vec_id = 0) p
WHERE e.vec_id % 7 = 0
""",
)
def q_fn_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("probe")
    )
    joined = e.filter(F.col("vec_id") % 7 == 0).crossJoin(F.broadcast(probe))
    cos = F.expr(
        f"round({_DOT_SPARK} / ({_NORM_SPARK.format(col='embedding')}"
        f" * {_NORM_SPARK.format(col='probe')}), 6)"
    ).cast("double")
    return joined.select("vec_id", cos.alias("cosine"))


# --- I52 batch variant: tumbling window --------------------------------------

@register(
    "fn_window_batch",
    """
SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start,
  count(*) AS n,
  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
FROM events GROUP BY 1
""",
)
def q_fn_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
                .cast("double") / 100.0
            ).alias("sum_value"),
        )
        .select(F.col("w.start").alias("win_start"), "n", "sum_value")
    )


# --- J57. scalar-iter pandas UDF ------------------------------------------------

@register(
    "udf_scalar_iter",
    """
SELECT doc_id, md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_md5
FROM documents WHERE doc_id % 6 = 0
""",
)
def q_udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR_ITER pandas UDF (op 57 pattern): per-batch Python with
    amortized setup — here the hashlib import + normalization."""
    from ocr_spark.functions.udfs import norm_md5

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 6 == 0)
    return d.select("doc_id", norm_md5("text").alias("norm_md5"))


# --- J60. mapInArrow whole-partition transform ----------------------------------

@register(
    "udf_map_arrow",
    "SELECT doc_id, CAST(length(text) AS INT) AS py_len FROM documents",
)
def q_udf_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (op 60): lowest-overhead Arrow batch path; computes the
    value in Python so the oracle genuinely checks the Python results."""
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            texts = b.column("text").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pa.array([len(x) for x in texts], type=pa.int32()),
                ],
                names=["doc_id", "py_len"],
            )

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(fn, "doc_id bigint, py_len int")


# --- J61. Python UDTF --------------------------------------------------------

@register(
    "udtf_blocks",
    """
SELECT doc_id,
  unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS pos,
  unnest(string_split(text, ' ')) AS word
FROM documents WHERE doc_id % 50 = 0
""",
)
def q_udtf_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF (op 61): one input row -> many output rows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield i, w

    spark.udtf.register("split_words", SplitWords)
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    d.createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        "SELECT doc_id, s.pos, s.word FROM udtf_docs_in,"
        " LATERAL split_words(text) s"
    )


# --- relational pivot ---------------------------------------------------------

_PIVOT_LANGS = ("en", "zh", "es", "de", "fr")


@register(
    "fn_pivot",
    """
SELECT source,
  CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS en,
  CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS zh,
  CAST(count(*) FILTER (WHERE lang = 'es') AS BIGINT) AS es,
  CAST(count(*) FILTER (WHERE lang = 'de') AS BIGINT) AS de,
  CAST(count(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS fr,
  CAST(coalesce(sum(n_chars) FILTER (WHERE lang = 'en'), 0) AS BIGINT)
    AS en_chars
FROM documents
GROUP BY source
""",
)
def q_fn_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: the wide-format reshape (one column per pivot value).
    The value list is EXPLICIT — ``pivot(col, values)`` — which is the
    scale-correct form: an unlisted pivot costs an extra distinct scan
    to discover values and can explode the schema; a listed one compiles
    to a single pass of conditional aggregates (the exact FILTER
    aggregation the oracle spells out). Missing cells are coalesced to
    0 so the wide frame has no engine-dependent nulls."""
    d = t(spark, sf_dir, "documents")
    wide = (
        d.groupBy("source")
        .pivot("lang", list(_PIVOT_LANGS))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
    )
    cols = [F.col("source")]
    cols += [
        F.coalesce(F.col(f"{lg}_n"), F.lit(0))
        .cast("bigint")
        .alias(lg)
        for lg in _PIVOT_LANGS
    ]
    cols.append(
        F.coalesce(F.col("en_chars"), F.lit(0))
        .cast("bigint")
        .alias("en_chars")
    )
    return wide.select(*cols)


@register(
    "fn_unpivot",
    """
WITH langs AS (
  SELECT unnest(['en','zh','es','de','fr']) AS lang
),
counts AS (
  SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang
)
SELECT s.source, l.lang,
  CAST(coalesce(c.n, 0) AS BIGINT) AS n
FROM (SELECT DISTINCT source FROM documents) s
CROSS JOIN langs l
LEFT JOIN counts c ON c.source = s.source AND c.lang = l.lang
""",
)
def q_fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (stack): the wide->long reshape back from fn_pivot's
    output — one row per (source, lang) INCLUDING explicit zero cells
    (the wide frame's dense grid is the contract; a bare GROUP BY would
    drop empty combinations). stack() is a Generate, not a shuffle: the
    only Exchange is the pivot aggregation's own."""
    d = t(spark, sf_dir, "documents")
    wide = (
        d.groupBy("source")
        .pivot("lang", list(_PIVOT_LANGS))
        .agg(F.count(F.lit(1)))
    )
    pairs = ", ".join(f"'{lg}', coalesce({lg}, 0)" for lg in _PIVOT_LANGS)
    return wide.select(
        "source",
        F.expr(
            f"stack({len(_PIVOT_LANGS)}, {pairs}) AS (lang, n)"
        ),
    ).select("source", "lang", F.col("n").cast("bigint").alias("n"))


# --- semi-structured in-column parsing: from_xml / from_csv ----------------------------
# The source-level connectors (queries_formats.py) gate whole-FILE
# round-trips; these two gate the per-VALUE parse functions — the shape a
# crawl actually presents (an XML sitemap fragment or CSV line inside a
# string column of an already-loaded table). Synthesize-then-parse: the
# string is assembled from columns both engines see, Spark parses it back
# with an explicit schema, and the oracle recomputes the fields directly —
# the hash fails if the parser drops, shears or retypes anything.

_XML_CELL = (
    "concat('<d id=\"', CAST(doc_id AS STRING), '\"><lg>', lang,"
    " '</lg><w>', split(text, ' ')[0], '</w><n>',"
    " CAST(n_chars AS STRING), '</n></d>')"
)

_FN_XML_SQL = """
SELECT doc_id, doc_id AS xid, lang AS xlang,
  split_part(text, ' ', 1) AS xword, n_chars AS xn
FROM documents
"""


@register("fn_xml_parse", _FN_XML_SQL)
def q_fn_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_xml over a string column: per-row XML fragment with an
    ATTRIBUTE (reads back as _id), three typed child elements, explicit
    schema (no inference). Entirely JVM-side — the parse is a catalyst
    expression, not a UDF."""
    d = t(spark, sf_dir, "documents")
    p = F.expr(
        f"from_xml({_XML_CELL}, '_id BIGINT, lg STRING, w STRING, n BIGINT')"
    )
    return d.select(
        "doc_id",
        p.getField("_id").alias("xid"),
        p.getField("lg").alias("xlang"),
        p.getField("w").alias("xword"),
        p.getField("n").cast("bigint").alias("xn"),
    )


_CSV_CELL = (
    "concat('\"', source, ',x\",', CAST(doc_id AS STRING), ',', lang,"
    " ',', CAST(n_chars AS STRING))"
)

_FN_CSV_SQL = """
SELECT doc_id, source || ',x' AS qf, doc_id AS cid,
  lang AS clang, n_chars AS cn
FROM documents
"""


@register("fn_csv_parse", _FN_CSV_SQL)
def q_fn_csv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_csv over a string column: the first field is QUOTED AND
    CONTAINS THE DELIMITER — a parser that splits on raw commas shears
    the row and breaks the hash. Explicit schema, default RFC-4180
    quoting, JVM-side expression."""
    d = t(spark, sf_dir, "documents")
    p = F.expr(
        f"from_csv({_CSV_CELL}, 'qf STRING, cid BIGINT, clang STRING,"
        f" cn BIGINT')"
    )
    return d.select(
        "doc_id",
        p.getField("qf").alias("qf"),
        p.getField("cid").alias("cid"),
        p.getField("clang").alias("clang"),
        p.getField("cn").cast("bigint").alias("cn"),
    )


# --- J61b. Python UDTF with TABLE argument (partitioned polymorphic) ---------

@register(
    "udtf_table_arg",
    """
WITH g AS (
  SELECT source, n_chars,
         n_chars - lag(n_chars) OVER (
           PARTITION BY source ORDER BY n_chars, doc_id) AS gap
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap,
       CAST(min(n_chars) AS BIGINT) AS min_len,
       CAST(max(n_chars) AS BIGINT) AS max_len
FROM g GROUP BY source
ORDER BY source
""",
)
def q_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 UDTF over a TABLE argument with PARTITION BY / ORDER BY:
    the engine feeds each source's rows to ONE UDTF instance in the
    declared order (eval per row, terminate per partition) — arbitrary
    stateful per-group Python where a window would need the whole frame
    spelled as SQL. The digest here (largest gap between consecutive
    sorted lengths) is deliberately window-expressible so the DuckDB
    lag/groupBy oracle checks the partition-and-order contract itself:
    a dropped ORDER BY or a split partition changes max_gap.

    Scale: one hash shuffle on the partition key, per-partition
    sequential state of O(1) — the UDTF sibling of applyInPandas, for
    when state doesn't fit a window spec. (Multiple ORDER BY keys need
    parentheses in the TVF argument — parser quirk worth recording.)"""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="source string, n_docs bigint, max_gap bigint,"
        " min_len bigint, max_len bigint"
    )
    class SourceDigest:
        def __init__(self):
            self._src = None
            self._n = 0
            self._prev = None
            self._maxgap = 0
            self._min = None
            self._max = None

        def eval(self, row):
            self._src = row["source"]
            v = row["n_chars"]
            self._n += 1
            if self._prev is not None:
                self._maxgap = max(self._maxgap, v - self._prev)
            self._prev = v
            self._min = v if self._min is None else min(self._min, v)
            self._max = v if self._max is None else max(self._max, v)

        def terminate(self):
            yield self._src, self._n, self._maxgap, self._min, self._max

    spark.udtf.register("source_digest", SourceDigest)
    t(spark, sf_dir, "documents").createOrReplaceTempView("udtf_digest_in")
    return spark.sql(
        "SELECT * FROM source_digest(TABLE(udtf_digest_in)"
        " PARTITION BY source ORDER BY (n_chars, doc_id))"
        " ORDER BY source"
    )
