"""Spark 4 SQL-surface block: the language features a warehouse user
migrating TO this engine in 2026 actually writes — recursive CTEs,
the VARIANT semi-structured type, catalog SQL UDFs, GROUP BY ALL — each
graded under the driver value hash, and (where DuckDB speaks the same
grammar) with IDENTICAL query text on both engines, extending the
portability gate the TPC-H suite established.

Determinism contract unchanged: recursion depths are data-bounded and
engine-independent, variant extraction returns typed values recomputed
arithmetically by the oracle, and every aggregate is exact BIGINT.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.queries import register, t


# --- recursive CTE: calendar spine ------------------------------------------------------
# The classic "calendar dimension without a table": a month spine spanning
# the orders range, LEFT-joined so zero-order months survive with n = 0.
# IDENTICAL text on both engines (Spark 4.1 ships WITH RECURSIVE).
# Scale shape: aggregate the fact table FIRST (one scan, partial/final
# pair over ~80 month keys), then LEFT JOIN the 80-row recursive spine
# against that tiny aggregate — the spine-side recursion (UnionLoop)
# never touches corpus-sized data and the join broadcasts. The naive
# spelling (months LEFT JOIN orders ... GROUP BY m) would drag every
# fact row through a join before aggregating, and LeftOuter can only
# build-right, so the big side could never be the hash side.
# Recursions whose working set IS corpus-sized (reachability) belong to
# the iterative DataFrame loops (graph_bfs_dist, dedup_cc), not to CTEs.

_RCTE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT TIMESTAMP '1995-01-01 00:00:00'
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months
  WHERE m < TIMESTAMP '2001-08-01 00:00:00'
),
om AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         CAST(count(o_orderkey) AS BIGINT) AS n
  FROM orders GROUP BY 1
)
SELECT months.m, CAST(coalesce(om.n, 0) AS BIGINT) AS n_orders
FROM months LEFT JOIN om USING (m)
ORDER BY m
"""


@register("sql_recursive_cte", _RCTE_SQL)
def q_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE month spine + left join: gap months appear with
    n_orders = 0 (the property a GROUP BY over existing dates cannot
    give). Same text runs on DuckDB."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RCTE_SQL)


# --- VARIANT: schema-on-read semi-structured extraction ---------------------------------
# Spark 4's VARIANT is the open-schema column type (binary-encoded JSON
# with typed path access; shreddable to columnar at the parquet layer).
# The cell is synthesized from columns both engines see, so the oracle
# recomputes every extracted value without parsing a byte — the hash
# gates parse_json + variant_get's path walk, numeric typing, nested
# objects, arrays, and the null-on-missing-path contract.

_VCELL = (
    "concat('{\"id\": ', CAST(doc_id AS STRING),"
    " ', \"meta\": {\"lang\": \"', lang, '\", \"n\": ',"
    " CAST(n_chars AS STRING), '},"
    " \"tags\": [\"', source, '\", \"t', CAST(doc_id % 5 AS STRING),"
    " '\"]}')"
)

_VARIANT_SQL = """
SELECT doc_id,
  doc_id AS vid,
  lang AS vlang,
  n_chars AS vn,
  source AS tag0,
  't' || CAST(doc_id % 5 AS VARCHAR) AS tag1,
  CAST(NULL AS BIGINT) AS vmissing
FROM documents
"""


@register("fn_variant", _VARIANT_SQL)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_json -> VARIANT -> variant_get typed paths ($.id, nested
    $.meta.*, array elements, and a missing path that must yield NULL
    rather than error). At 100 TB the variant column shreds into parquet
    so these paths prune like real columns; the open schema costs
    nothing at read time for paths you don't touch."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(f"variant_get(parse_json({_VCELL}), '$.id', 'bigint')")
        .alias("vid"),
        F.expr(f"variant_get(parse_json({_VCELL}), '$.meta.lang', 'string')")
        .alias("vlang"),
        F.expr(f"variant_get(parse_json({_VCELL}), '$.meta.n', 'bigint')")
        .alias("vn"),
        F.expr(f"variant_get(parse_json({_VCELL}), '$.tags[0]', 'string')")
        .alias("tag0"),
        F.expr(f"variant_get(parse_json({_VCELL}), '$.tags[1]', 'string')")
        .alias("tag1"),
        F.expr(f"variant_get(parse_json({_VCELL}), '$.nope.deep', 'bigint')")
        .alias("vmissing"),
    )


# --- catalog SQL UDF ---------------------------------------------------------------------
# CREATE FUNCTION ... RETURN <expr>: the warehouse function library
# surface. The body is a pure SQL expression, so Catalyst INLINES it —
# the plan is identical to writing the expression by hand (no UDF call
# boundary, full codegen/pushdown), which is exactly why a migrating
# user's function library costs nothing here. The oracle inlines the
# same expression textually.

_SQLUDF_ORACLE = """
SELECT doc_id,
  CAST(round(
    CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
      AS DOUBLE) * 1000000.0 / n_chars, 0) AS BIGINT) AS wpk
FROM documents
WHERE n_chars > 0
"""


@register("fn_sql_udf", _SQLUDF_ORACLE)
def q_fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDF (words-per-kilochar density, e6-quantized) defined
    with CREATE FUNCTION and used in a query; Catalyst inlines the body,
    so 'Python' never appears in the plan and the filter still pushes
    down past the call site."""
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS words_per_kchar")
    spark.sql(
        "CREATE TEMPORARY FUNCTION words_per_kchar(txt STRING, nc BIGINT)"
        " RETURNS BIGINT RETURN CAST(round("
        " CAST(size(filter(split(txt, ' '), x -> x != '')) AS DOUBLE)"
        " * 1000000.0 / nc, 0) AS BIGINT)"
    )
    return spark.sql(
        "SELECT doc_id, words_per_kchar(text, n_chars) AS wpk"
        " FROM documents WHERE n_chars > 0"
    )


# --- GROUP BY ALL / ORDER BY ALL -----------------------------------------------------------
# DuckDB's ergonomic grouping shorthand, adopted by Spark: every
# non-aggregate select item is a group key. Same text on both engines.

_GBA_SQL = """
SELECT lang, source, count(*) AS n,
  CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents
GROUP BY ALL
ORDER BY ALL
"""


@register("agg_group_by_all", _GBA_SQL)
def q_agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL — identical text on both engines;
    compiles to exactly the explicit-keys aggregate (one partial/final
    pair), purely a parser-level surface."""
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_GBA_SQL)


# --- UNION BY NAME ---------------------------------------------------------------------
# Column-name-resolved union (schema evolution across exports: newer
# shards carry an extra column, older ones resolve it to NULL).

_UBN_SQL = """
SELECT doc_id, lang, CAST(NULL AS BIGINT) AS extra FROM documents
WHERE doc_id % 2 = 0
UNION ALL BY NAME
SELECT lang, n_chars AS extra, doc_id FROM documents
WHERE doc_id % 2 = 1
"""


@register("set_union_byname", _UBN_SQL)
def q_set_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): the two branches present
    their columns in DIFFERENT orders and one lacks `extra` — positional
    UNION would silently cross-type the columns; by-name resolution is
    the schema-evolution-safe form every multi-generation export needs.
    The oracle is DuckDB's native UNION ALL BY NAME."""
    d = t(spark, sf_dir, "documents")
    a = d.filter("doc_id % 2 = 0").select("doc_id", "lang")
    b = d.filter("doc_id % 2 = 1").select(
        "lang", F.col("n_chars").alias("extra"), "doc_id"
    )
    return a.unionByName(b, allowMissingColumns=True)


# --- collated (case-insensitive) semantics ----------------------------------

_COLLATION_SQL = """
WITH noised AS (
  SELECT CASE WHEN doc_id % 2 = 1 THEN upper(lang) ELSE lang END AS lang_n,
         n_chars
  FROM documents
)
SELECT lower(lang_n) AS lang_norm,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM noised
GROUP BY 1
ORDER BY 1
"""


@register("fn_collation", _COLLATION_SQL)
def q_fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: GROUP BY a UTF8_LCASE-collated column merges
    case variants at the COMPARISON level — no lower() rewrite of the
    data, and the same collation drives joins, DISTINCT and ORDER BY
    consistently once declared on the column. The input is
    deterministically case-noised (odd doc_ids upper-cased) so the
    collation has real work; the oracle is the classic lower() rewrite,
    and the grouped key is re-lowered explicitly on output because a
    collated group's representative string is whichever variant the
    engine saw (case-PRESERVING equality, a real semantic to pin).
    Scale: identical partial/final agg plan — collation changes the
    hash/compare functions, not the shuffle shape."""
    t(spark, sf_dir, "documents").createOrReplaceTempView("collation_in")
    return spark.sql(
        """
WITH noised AS (
  SELECT CASE WHEN doc_id % 2 = 1 THEN upper(lang) ELSE lang END
           COLLATE UTF8_LCASE AS lang_n,
         n_chars
  FROM collation_in
)
SELECT lower(lang_n) AS lang_norm,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM noised
GROUP BY lang_n
ORDER BY lang_norm
"""
    )


# --- ANSI-safe arithmetic (try_* family) ------------------------------------

_TRY_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 5 = 0 THEN NULL
            ELSE CAST(floor(n_chars * 1000000.0 / (doc_id % 5)) AS BIGINT)
       END AS per_slot_e6,
       CASE WHEN doc_id % 2000 > 999 THEN NULL
            ELSE doc_id % 2000 END AS guarded_sum,
       CASE WHEN doc_id % 4 = 0 THEN NULL ELSE CAST(doc_id AS BIGINT) END
         AS parsed
FROM documents
ORDER BY doc_id
"""


@register("fn_try_arith", _TRY_SQL)
def q_fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The try_* arithmetic family under ANSI mode (ON in Spark 4):
    division by zero, BIGINT overflow and malformed numeric parses
    return NULL through try_divide / try_add / try_to_number instead of
    killing the job — the per-row error containment a 10^12-row pipeline
    needs (one poisoned row must not fail a stage; the NULLs are then
    countable as a DQ metric). Error sites are derived from doc_id so
    the oracle can spell each outcome as a CASE — which it must, since
    DuckDB's own ANSI addition would raise on the same overflow: the
    try probe adds doc_id%2000 to within 1000 of BIGINT max, so residues
    past 999 overflow to NULL and the oracle writes that arm as a pure
    CASE, never evaluating the sum."""
    d = t(spark, sf_dir, "documents")
    return d.selectExpr(
        "doc_id",
        # div-by-zero slot when doc_id % 5 == 0
        # floor() both engines: a bare BIGINT cast truncates in Spark
        # but rounds in DuckDB on the .67 fractions
        "CAST(floor(try_divide(n_chars * 1000000, doc_id % 5)) AS BIGINT)"
        " AS per_slot_e6",
        # overflow probe: MAX-999 + m overflows exactly when m > 999;
        # the survivor arm round-trips back to m via try_subtract
        "try_subtract(try_add(doc_id % 2000, 9223372036854774808),"
        " 9223372036854774808) AS guarded_sum",
        # malformed parse when doc_id % 4 == 0 ('x' prefix)
        "CAST(try_to_number(CASE WHEN doc_id % 4 = 0"
        " THEN concat('x', doc_id) ELSE CAST(doc_id AS STRING) END,"
        " '999999999') AS BIGINT) AS parsed",
    ).orderBy("doc_id")
