"""Web-ingestion & crawl-index queries: the archive-side of the engine.

A Common-Crawl-scale corpus does not start life as a parquet table — it
starts as WARC archive files plus the artifacts crawls are operated with:
the CDX capture index (SURT key, digest, file/offset — what makes a petabyte
of WARC randomly addressable), snapshot-over-snapshot diffs (what changed
between two crawls drives recrawl scheduling and incremental extraction),
and robots.txt scoping (longest-prefix allow/deny per host). This module
grades those four faces end-to-end on the driver tables:

- `scan_warc_roundtrip` / `scan_warc_gzip`: synthesize a deterministic
  archive from `documents` (JVM record framing via sources/warc.record_expr,
  per-shard member concat), then run the REAL Arrow-batched record splitter
  (sources/warc.parse_warc) and report what it recovered. The oracle
  reconstructs (url, date, length, digest) from `documents` first-principles
  — it never sees the WARC bytes, so header serialization, framing, gzip
  member splitting, HTTP-block peeling, and payload slicing are all under
  the hash.
- `web_cdx`: the capture index — SURT canonicalization computed by real
  string ops on the url, byte-exact record offsets within each shard file
  computed from the ACTUAL framed record bytes (octet_length of
  record_expr) with a window prefix-sum; the oracle derives every offset
  arithmetically from the frozen record grammar (tests/test_webingest.py
  pins the Spark-side bytes against the same formula).
- `web_crawl_diff`: two crawl snapshots (deterministic churn: every 3rd url
  changed, every 5th dropped, every 7th adds a new url) → per-url
  added/removed/changed/same via one full outer join on the url key.
- `pipe_robots_filter`: per-host rule sets (deny '/private/' everywhere,
  even hosts deny '/w/', hosts ≡0 (mod 3) re-allow '/w/open/'), decided by
  longest-matching-prefix with allow winning ties (the Google/RFC 9309
  rule). Rules are a broadcast dim; the decision is one window over the
  matched candidates.

Scale notes: archive ingest is shuffle-free (whole files are the task unit
— see sources/warc.py; the groupBy-shard here exists only to SYNTHESIZE an
archive in-plan, a test-harness cost the read path never pays). CDX is
map-side expressions + one window keyed on the shard file — exactly as
parallel as the archive layout. The crawl diff shuffles both snapshots once
on url (sort-merge; co-partitioned at 100 TB by bucketing both snapshots on
url). Robots rules are thousands of rows per crawl — broadcast, never
shuffled; ties resolved in-window without a second pass.

Cross-engine determinism: dates are built with integer lpad arithmetic (no
timestamp/timezone functions on either engine); digests are md5 over UTF-8
bytes (Spark md5(encode(..)) ≡ DuckDB md5(varchar)); lengths are
octet_length everywhere (byte counts, not codepoints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_spark.queries import register, t
from ocr_spark.sources import warc

# ---------------------------------------------------------------------------
# shared synthesis: documents → deterministic pages for the archive
# ---------------------------------------------------------------------------
# url:  https://s{doc_id%5}.src.example/d/{doc_id}
# date: 2024-01-01T{doc_id%24}:{doc_id*7%60}:{doc_id*13%60}Z  (lpad-2 fields)
# html: utf-8 bytes of documents.text

_URL_SQL = (
    "'https://s' || CAST(doc_id % 5 AS VARCHAR) || '.src.example/d/' "
    "|| CAST(doc_id AS VARCHAR)"
)
_DATE_SQL = (
    "'2024-01-01T' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') || ':' "
    "|| lpad(CAST((doc_id * 7) % 60 AS VARCHAR), 2, '0') || ':' "
    "|| lpad(CAST((doc_id * 13) % 60 AS VARCHAR), 2, '0') || 'Z'"
)


def _synth_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    return d.select(
        "doc_id",
        F.concat(
            F.lit("https://s"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".src.example/d/"), did,
        ).alias("url"),
        F.concat(
            F.lit("2024-01-01T"),
            F.lpad((F.col("doc_id") % 24).cast("string"), 2, "0"), F.lit(":"),
            F.lpad(((F.col("doc_id") * 7) % 60).cast("string"), 2, "0"),
            F.lit(":"),
            F.lpad(((F.col("doc_id") * 13) % 60).cast("string"), 2, "0"),
            F.lit("Z"),
        ).alias("warc_date"),
        F.encode("text", "UTF-8").alias("html"),
    )


# the oracle's view of the recovered records — first-principles, no WARC
_ROUNDTRIP_ORACLE = f"""
SELECT
  {_URL_SQL} AS url,
  {_DATE_SQL} AS warc_date,
  octet_length(encode(text)) AS n_bytes,
  md5(text) AS payload_md5
FROM documents
"""


def _roundtrip(spark: SparkSession, sf_dir: str, gzip_members: bool) -> DataFrame:
    pages = _synth_pages(spark, sf_dir).drop("doc_id")
    blobs = warc.blobs_by_shard(pages, num_files=8, gzip_members=gzip_members)
    rec = warc.parse_warc(blobs.select(F.col("blob").alias("content")))
    return rec.select(
        "url",
        "warc_date",
        F.octet_length("html").alias("n_bytes"),
        F.md5("html").alias("payload_md5"),
    )


@register("scan_warc_roundtrip", _ROUNDTRIP_ORACLE)
def q_scan_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JVM WARC framing → 8 multi-record archive blobs → the
    real Arrow splitter → recovered records. Hash covers header round-trip,
    record framing, HTTP peeling, and byte-exact payloads."""
    return _roundtrip(spark, sf_dir, gzip_members=False)


@register("scan_warc_gzip", _ROUNDTRIP_ORACLE)
def q_scan_warc_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract over `.warc.gz` framing: one deterministic gzip member
    per record, split at member boundaries by the streaming inflater."""
    return _roundtrip(spark, sf_dir, gzip_members=True)


@register("stream_warc_ingest", _ROUNDTRIP_ORACLE)
def q_stream_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous archive ingest as a driver-visible query: write the
    synthetic corpus as real `.warc.gz` files, ingest them with the
    Structured-Streaming binaryFile source + exactly-once batch committer
    (streaming/incremental.incremental_warc_ingest, availableNow), then
    report what landed in the pages table. Same first-principles oracle as
    the batch round-trips: a dropped, duplicated, or corrupted record
    anywhere in the stream path breaks the hash."""
    import os
    import tempfile

    from ocr_spark.streaming.incremental import incremental_warc_ingest

    work = tempfile.mkdtemp(prefix="ocr-spark-stream-warc-")
    archive = os.path.join(work, "archive")
    pages = _synth_pages(spark, sf_dir).drop("doc_id")
    warc.write_warc(pages, archive, num_files=4, gzip_members=True)
    writer, _ = incremental_warc_ingest(
        spark, archive, os.path.join(work, "out"),
        os.path.join(work, "ckpt"), run_id="stream-warc-q",
    )
    writer.trigger(availableNow=True).start().awaitTermination()
    ingested = spark.read.parquet(os.path.join(work, "out", "data"))
    return ingested.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
        .alias("warc_date"),
        F.octet_length("html").alias("n_bytes"),
        F.md5("html").alias("payload_md5"),
    )


@register("web_wet_roundtrip", _ROUNDTRIP_ORACLE)
def q_web_wet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WET (conversion-record) sidecar round-trip: text payloads framed
    bare with Content-Type text/plain — exercising the splitter's
    no-HTTP-block path — through gzip members and back. Same
    first-principles oracle: identical recovered values prove the two
    framings carry the same payloads byte-exactly."""
    pages = _synth_pages(spark, sf_dir).drop("doc_id")
    blobs = warc.blobs_by_shard(pages, num_files=8, gzip_members=True,
                                warc_type="conversion")
    rec = warc.parse_warc(blobs.select(F.col("blob").alias("content")))
    return rec.select(
        "url",
        "warc_date",
        F.octet_length("html").alias("n_bytes"),
        F.md5("html").alias("payload_md5"),
    )


# the WAT payload is built by explicit concat (NOT to_json) so the oracle
# can reconstruct the exact bytes arithmetically; the production write_wat
# (to_json) is gated json.loads-level by tests/test_warc.py instead
_WAT_JSON_SQL = (
    "'{{\"title\":\"Doc ' || CAST(doc_id AS VARCHAR) || '\",\"rank\":' "
    "|| CAST(doc_id % 10 AS VARCHAR) || '}}'"
)

_WAT_ORACLE = f"""
SELECT
  {_URL_SQL} AS url,
  {_DATE_SQL} AS warc_date,
  octet_length(encode({_WAT_JSON_SQL.format()})) AS n_bytes,
  md5({_WAT_JSON_SQL.format()}) AS payload_md5
FROM documents
"""


@register("web_wat_roundtrip", _WAT_ORACLE)
def q_web_wat_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WAT (metadata-record) sidecar round-trip: per-capture JSON
    payloads framed with Content-Type application/json, recovered by the
    splitter's metadata-types scope — the oracle rebuilds the JSON string
    and its md5 arithmetically, so record framing, type filtering and
    byte-exact payload recovery all sit under the hash."""
    did = F.col("doc_id").cast("string")
    pages = _synth_pages(spark, sf_dir).select(
        "url",
        "warc_date",
        F.encode(
            F.concat(F.lit('{"title":"Doc '), did, F.lit('","rank":'),
                     (F.col("doc_id") % 10).cast("string"), F.lit("}")),
            "UTF-8",
        ).alias("html"),
    )
    blobs = warc.blobs_by_shard(pages, num_files=8, gzip_members=True,
                                warc_type="metadata")
    rec = warc.parse_warc(blobs.select(F.col("blob").alias("content")),
                          types=frozenset(("metadata",)))
    return rec.select(
        "url",
        "warc_date",
        F.octet_length("html").alias("n_bytes"),
        F.md5("html").alias("payload_md5"),
    )


# ---------------------------------------------------------------------------
# CDX capture index
# ---------------------------------------------------------------------------
# Record grammar constants (sources/warc.record_expr, pinned by
# tests/test_webingest.py::test_cdx_length_formula):
#   http_len   = 62 + len(str(plen)) + plen
#   record_len = 157 + octet_length(url) + len(str(http_len)) + http_len

_CDX_ORACLE = f"""
WITH p AS (
  SELECT doc_id,
    {_URL_SQL} AS url,
    {_DATE_SQL} AS warc_date,
    octet_length(encode(text)) AS plen,
    md5(text) AS digest,
    doc_id % 8 AS shard
  FROM documents
), r AS (
  SELECT *,
    62 + length(CAST(plen AS VARCHAR)) + plen AS http_len
  FROM p
), s AS (
  SELECT *,
    157 + octet_length(encode(url)) + length(CAST(http_len AS VARCHAR))
      + http_len AS rec_len
  FROM r
)
SELECT
  'part-' || lpad(CAST(shard AS VARCHAR), 4, '0') || '.warc' AS filename,
  CAST(coalesce(sum(rec_len) OVER (
    PARTITION BY shard ORDER BY url
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
    AS warc_offset,
  'example,src,s' || CAST(doc_id % 5 AS VARCHAR) || ')/d/'
    || CAST(doc_id AS VARCHAR) AS surt,
  warc_date,
  digest,
  CAST(rec_len AS BIGINT) AS rec_len
FROM s
"""


@register("web_cdx", _CDX_ORACLE)
def q_web_cdx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capture index that makes an archive randomly addressable:
    (filename, offset, SURT, date, digest, record length) per capture.

    SURT and offsets are computed from the REAL artifacts — the SURT by
    generic string ops on the url column (host extract → label reverse →
    comma join), offsets by octet_length of the actual framed record bytes,
    prefix-summed per shard file — while the oracle re-derives both from
    first principles (host arithmetic; the frozen record grammar). Map-side
    expressions + one window partitioned by the shard file: the index costs
    exactly one pass over the archive layout at any scale."""
    pages = _synth_pages(spark, sf_dir)
    host = F.regexp_extract("url", r"^https?://([^/]+)", 1)
    path = F.regexp_replace("url", r"^https?://[^/]*", "")
    surt = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","), F.lit(")"), path
    )
    rec_len = F.octet_length(
        warc.record_expr(F.col("url"), F.col("warc_date"), F.col("html"))
    ).cast("bigint")
    w = (
        Window.partitionBy("shard")
        .orderBy("url")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pages.select(
            (F.col("doc_id") % 8).alias("shard"),
            "url", "warc_date",
            F.md5("html").alias("digest"),
            surt.alias("surt"),
            rec_len.alias("rec_len"),
        )
        .select(
            F.concat(
                F.lit("part-"), F.lpad(F.col("shard").cast("string"), 4, "0"),
                F.lit(".warc"),
            ).alias("filename"),
            F.coalesce(F.sum("rec_len").over(w), F.lit(0)).alias("warc_offset"),
            "surt", "warc_date", "digest", "rec_len",
        )
    )


# ---------------------------------------------------------------------------
# crawl-over-crawl diff
# ---------------------------------------------------------------------------
# snapshot A: every document. snapshot B: urls doc_id%5==4 dropped
# ("removed"), doc_id%3==0 re-crawled with new content ("changed"),
# doc_id%7==0 contributes a brand-new url at doc_id+100000 ("added").

_DIFF_ORACLE = f"""
WITH a AS (
  SELECT {_URL_SQL} AS url, md5(text) AS digest FROM documents
), b0 AS (
  SELECT {_URL_SQL} AS url,
    CASE WHEN doc_id % 3 = 0 THEN md5(text || ' v2') ELSE md5(text) END
      AS digest
  FROM documents WHERE doc_id % 5 <> 4
), b AS (
  SELECT url, digest FROM b0
  UNION ALL
  SELECT 'https://s' || CAST(doc_id % 5 AS VARCHAR) || '.src.example/d/'
           || CAST(doc_id + 100000 AS VARCHAR) AS url,
         md5(text || ' new') AS digest
  FROM documents WHERE doc_id % 7 = 0
)
SELECT
  coalesce(a.url, b.url) AS url,
  CASE
    WHEN a.url IS NULL THEN 'added'
    WHEN b.url IS NULL THEN 'removed'
    WHEN a.digest <> b.digest THEN 'changed'
    ELSE 'same'
  END AS status
FROM a FULL OUTER JOIN b ON a.url = b.url
"""


@register("web_crawl_diff", _DIFF_ORACLE)
def q_web_crawl_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-over-snapshot diff: one full outer join of (url → digest)
    maps, classified added/removed/changed/same. At archive scale both
    sides come from the CDX index (url, digest) — bucket both by url and
    the join is co-partitioned, zero extra exchange."""
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://s"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".src.example/d/"), F.col("doc_id").cast("string"),
    )
    a = d.select(url.alias("url"), F.md5(F.encode("text", "UTF-8")).alias("digest"))
    b_kept = d.filter(F.col("doc_id") % 5 != 4).select(
        url.alias("url"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.md5(F.encode(F.concat(F.col("text"), F.lit(" v2")), "UTF-8")),
        )
        .otherwise(F.md5(F.encode("text", "UTF-8")))
        .alias("digest"),
    )
    b_new = d.filter(F.col("doc_id") % 7 == 0).select(
        F.concat(
            F.lit("https://s"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".src.example/d/"),
            (F.col("doc_id") + 100000).cast("string"),
        ).alias("url"),
        F.md5(F.encode(F.concat(F.col("text"), F.lit(" new")), "UTF-8"))
        .alias("digest"),
    )
    b = b_kept.unionByName(b_new)
    j = a.withColumnRenamed("digest", "a_digest").join(
        b.withColumnRenamed("digest", "b_digest"),
        on="url", how="full_outer",
    )
    # full-outer `on="url"` coalesces the key column for us
    status = (
        F.when(F.col("a_digest").isNull(), "added")
        .when(F.col("b_digest").isNull(), "removed")
        .when(F.col("a_digest") != F.col("b_digest"), "changed")
        .otherwise("same")
    )
    return j.select("url", status.alias("status"))


# ---------------------------------------------------------------------------
# recrawl scheduling with per-host politeness budget
# ---------------------------------------------------------------------------
# The operational consumer of the crawl diff: changed pages recrawl first,
# new discoveries next, stable pages last — but a polite crawler fetches at
# most C urls per host per cycle, so the schedule is a per-host window:
# slot = rank within host by (priority, url), cycle = slot div C. One
# window keyed on host; at archive scale the partition count is the host
# count and hot hosts stay bounded BY CONSTRUCTION (the budget cap is the
# skew control — a 10M-page host simply spans more cycles, it cannot fan
# into one giant task's output).

_POLITENESS_C = 3

_SCHEDULE_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
    {_URL_SQL} AS url,
    's' || CAST(doc_id % 5 AS VARCHAR) || '.src.example' AS host,
    CASE
      WHEN doc_id % 5 = 4 THEN 'removed'
      WHEN doc_id % 3 = 0 THEN 'changed'
      ELSE 'same'
    END AS status
  FROM documents
), live AS (
  SELECT url, host, status,
    CASE status WHEN 'changed' THEN 0 WHEN 'added' THEN 1 ELSE 2 END
      AS priority
  FROM d WHERE status <> 'removed'
  UNION ALL
  SELECT 'https://s' || CAST(doc_id % 5 AS VARCHAR) || '.src.example/d/'
           || CAST(doc_id + 100000 AS VARCHAR) AS url,
         's' || CAST(doc_id % 5 AS VARCHAR) || '.src.example' AS host,
         'added' AS status, 1 AS priority
  FROM documents WHERE doc_id % 7 = 0
), slotted AS (
  SELECT *,
    row_number() OVER (PARTITION BY host ORDER BY priority, url) AS slot
  FROM live
)
SELECT url, host, status, priority,
  CAST((slot - 1) // {_POLITENESS_C} AS BIGINT) AS cycle
FROM slotted
"""


@register("web_crawl_schedule", _SCHEDULE_ORACLE)
def q_web_crawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl schedule from the snapshot diff (same churn model as
    web_crawl_diff): priority 0 = changed, 1 = newly discovered, 2 =
    stable; per-host politeness budget of _POLITENESS_C fetches per cycle
    assigned by one window — removed urls leave the frontier."""
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://s"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".src.example/d/"), F.col("doc_id").cast("string"),
    )
    host = F.concat(
        F.lit("s"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".src.example"),
    )
    status = (
        F.when(F.col("doc_id") % 5 == 4, "removed")
        .when(F.col("doc_id") % 3 == 0, "changed")
        .otherwise("same")
    )
    existing = (
        d.select(url.alias("url"), host.alias("host"),
                 status.alias("status"))
        .filter(F.col("status") != "removed")
        .withColumn(
            "priority",
            F.when(F.col("status") == "changed", 0).otherwise(2),
        )
    )
    discovered = d.filter(F.col("doc_id") % 7 == 0).select(
        F.concat(
            F.lit("https://s"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".src.example/d/"), (F.col("doc_id") + 100000).cast("string"),
        ).alias("url"),
        host.alias("host"),
        F.lit("added").alias("status"),
        F.lit(1).alias("priority"),
    )
    live = existing.unionByName(discovered)
    w = Window.partitionBy("host").orderBy("priority", "url")
    return live.select(
        "url", "host", "status", "priority",
        F.floor((F.row_number().over(w) - 1) / _POLITENESS_C)
        .cast("bigint").alias("cycle"),
    )


# ---------------------------------------------------------------------------
# robots.txt scoping
# ---------------------------------------------------------------------------
# Hosts h0..h6 (.robots.example). Rule sets:
#   every host:        deny  '/private/'
#   even h:            deny  '/w/'
#   h % 3 == 0:        allow '/w/open/'
#   every host:        allow ''            (the no-match default)
# URL paths cycle by doc_id % 4:
#   0: /w/open/{id}   1: /w/{id}   2: /private/{id}   3: /p/{id}
# Longest matching prefix wins; equal length → allow wins (RFC 9309).

_ROBOTS_ORACLE = """
WITH hosts AS (
  SELECT CAST(range AS BIGINT) AS h,
    'h' || CAST(range AS VARCHAR) || '.robots.example' AS host
  FROM range(7)
), rules AS (
  SELECT host, '/private/' AS prefix, 0 AS is_allow FROM hosts
  UNION ALL SELECT host, '/w/', 0 FROM hosts WHERE h % 2 = 0
  UNION ALL SELECT host, '/w/open/', 1 FROM hosts WHERE h % 3 = 0
  UNION ALL SELECT host, '', 1 FROM hosts
), urls AS (
  SELECT doc_id,
    'h' || CAST(doc_id % 7 AS VARCHAR) || '.robots.example' AS host,
    CASE doc_id % 4
      WHEN 0 THEN '/w/open/' || CAST(doc_id AS VARCHAR)
      WHEN 1 THEN '/w/' || CAST(doc_id AS VARCHAR)
      WHEN 2 THEN '/private/' || CAST(doc_id AS VARCHAR)
      ELSE '/p/' || CAST(doc_id AS VARCHAR)
    END AS path
  FROM documents
), cand AS (
  SELECT u.doc_id, u.host, u.path, r.prefix, r.is_allow,
    row_number() OVER (
      PARTITION BY u.doc_id
      ORDER BY length(r.prefix) DESC, r.is_allow DESC
    ) AS rn
  FROM urls u JOIN rules r
    ON u.host = r.host AND strpos(u.path, r.prefix) = 1
)
SELECT doc_id, host, path,
  CASE WHEN is_allow = 1 THEN 'allow' ELSE 'deny' END AS verdict,
  prefix AS matched_prefix
FROM cand WHERE rn = 1
"""


@register("pipe_robots_filter", _ROBOTS_ORACLE)
def q_pipe_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 longest-prefix-match robots scoping. The rules table (a few
    thousand rows per crawl) joins broadcast on host; a matched-candidate
    window ordered by (prefix length desc, allow desc) picks the verdict —
    the empty-prefix allow row makes 'no rule matched → allowed' fall out
    of the same window instead of needing a second anti-join pass."""
    d = t(spark, sf_dir, "documents")
    hosts = spark.range(7).select(
        F.col("id").alias("h"),
        F.concat(F.lit("h"), F.col("id").cast("string"),
                 F.lit(".robots.example")).alias("host"),
    )
    rules = (
        hosts.select("host", F.lit("/private/").alias("prefix"),
                     F.lit(0).alias("is_allow"))
        .unionByName(
            hosts.filter(F.col("h") % 2 == 0).select(
                "host", F.lit("/w/").alias("prefix"), F.lit(0).alias("is_allow"))
        )
        .unionByName(
            hosts.filter(F.col("h") % 3 == 0).select(
                "host", F.lit("/w/open/").alias("prefix"),
                F.lit(1).alias("is_allow"))
        )
        .unionByName(
            hosts.select("host", F.lit("").alias("prefix"),
                         F.lit(1).alias("is_allow"))
        )
    )
    did = F.col("doc_id").cast("string")
    urls = d.select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"),
                 F.lit(".robots.example")).alias("host"),
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("/w/open/"), did))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("/w/"), did))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("/private/"), did))
        .otherwise(F.concat(F.lit("/p/"), did))
        .alias("path"),
    )
    cand = urls.join(F.broadcast(rules), on="host", how="inner").filter(
        F.col("path").startswith(F.col("prefix"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.length("prefix").desc(), F.col("is_allow").desc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id", "host", "path",
            F.when(F.col("is_allow") == 1, "allow").otherwise("deny")
            .alias("verdict"),
            F.col("prefix").alias("matched_prefix"),
        )
    )


# ---------------------------------------------------------------------------
# the composed crawl loop: diff -> robots scoping -> politeness budget
# ---------------------------------------------------------------------------
# web_frontier is the operational composition the three pieces above exist
# for, as ONE plan: the live frontier from the snapshot diff (changed /
# discovered / stable priorities, removed urls gone), scoped by robots
# rules (longest-prefix, allow-wins — denied urls must drop BEFORE budget
# assignment so they never consume a host's fetch slots), then per-host
# politeness cycles over the survivors. Rules over the frontier hosts:
#   every host:     allow ''        (no-match default)
#   every host:     deny  '/d/9'    (id prefix 9...)
#   hosts h%2==0:   deny  '/d/1'
#   hosts h%3==0:   allow '/d/12'   (re-allow ids 12... where '/d/1' denies)
# Shuffle shape: one broadcast join (rules), one per-url window (verdict —
# key cardinality = frontier size, no skew), one per-host window (cycles —
# the politeness cap bounds hot hosts by construction).

_FRONTIER_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
    {_URL_SQL} AS url,
    's' || CAST(doc_id % 5 AS VARCHAR) || '.src.example' AS host,
    CASE
      WHEN doc_id % 5 = 4 THEN 'removed'
      WHEN doc_id % 3 = 0 THEN 'changed'
      ELSE 'same'
    END AS status
  FROM documents
), live AS (
  SELECT url, host, status,
    CASE status WHEN 'changed' THEN 0 WHEN 'added' THEN 1 ELSE 2 END
      AS priority
  FROM d WHERE status <> 'removed'
  UNION ALL
  SELECT 'https://s' || CAST(doc_id % 5 AS VARCHAR) || '.src.example/d/'
           || CAST(doc_id + 100000 AS VARCHAR) AS url,
         's' || CAST(doc_id % 5 AS VARCHAR) || '.src.example' AS host,
         'added' AS status, 1 AS priority
  FROM documents WHERE doc_id % 7 = 0
), rules AS (
  SELECT 's' || CAST(range AS VARCHAR) || '.src.example' AS host,
         '' AS prefix, 1 AS is_allow FROM range(5)
  UNION ALL SELECT 's' || CAST(range AS VARCHAR) || '.src.example',
         '/d/9', 0 FROM range(5)
  UNION ALL SELECT 's' || CAST(range AS VARCHAR) || '.src.example',
         '/d/1', 0 FROM range(5) WHERE range % 2 = 0
  UNION ALL SELECT 's' || CAST(range AS VARCHAR) || '.src.example',
         '/d/12', 1 FROM range(5) WHERE range % 3 = 0
), verdicts AS (
  SELECT l.*, r.is_allow,
    row_number() OVER (
      PARTITION BY l.url
      ORDER BY length(r.prefix) DESC, r.is_allow DESC
    ) AS rn
  FROM live l JOIN rules r
    ON l.host = r.host
   AND strpos(substr(l.url, 9 + length(l.host)), r.prefix) = 1
), allowed AS (
  SELECT url, host, status, priority FROM verdicts
  WHERE rn = 1 AND is_allow = 1
), slotted AS (
  SELECT *,
    row_number() OVER (PARTITION BY host ORDER BY priority, url) AS slot
  FROM allowed
)
SELECT url, host, status, priority,
  CAST((slot - 1) // {_POLITENESS_C} AS BIGINT) AS cycle
FROM slotted
"""


def _live_frontier(d: DataFrame) -> DataFrame:
    """The schedule's live set: kept urls with diff-derived priorities plus
    newly discovered urls (same churn model as web_crawl_diff)."""
    url = F.concat(
        F.lit("https://s"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".src.example/d/"), F.col("doc_id").cast("string"),
    )
    host = F.concat(
        F.lit("s"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".src.example"),
    )
    status = (
        F.when(F.col("doc_id") % 5 == 4, "removed")
        .when(F.col("doc_id") % 3 == 0, "changed")
        .otherwise("same")
    )
    existing = (
        d.select(url.alias("url"), host.alias("host"), status.alias("status"))
        .filter(F.col("status") != "removed")
        .withColumn(
            "priority",
            F.when(F.col("status") == "changed", 0).otherwise(2),
        )
    )
    discovered = d.filter(F.col("doc_id") % 7 == 0).select(
        F.concat(
            F.lit("https://s"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".src.example/d/"), (F.col("doc_id") + 100000).cast("string"),
        ).alias("url"),
        host.alias("host"),
        F.lit("added").alias("status"),
        F.lit(1).alias("priority"),
    )
    return existing.unionByName(discovered)


@register("web_frontier", _FRONTIER_ORACLE)
def q_web_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl loop end-to-end as one plan: diff-derived live frontier →
    robots longest-prefix scoping (broadcast rules; denied urls drop
    before budgeting) → per-host politeness cycles over the survivors."""
    live = _live_frontier(t(spark, sf_dir, "documents"))
    hosts = spark.range(5).select(
        F.concat(F.lit("s"), F.col("id").cast("string"),
                 F.lit(".src.example")).alias("host"),
        F.col("id").alias("h"),
    )
    rules = (
        hosts.select("host", F.lit("").alias("prefix"),
                     F.lit(1).alias("is_allow"))
        .unionByName(hosts.select(
            "host", F.lit("/d/9").alias("prefix"), F.lit(0).alias("is_allow")))
        .unionByName(hosts.filter(F.col("h") % 2 == 0).select(
            "host", F.lit("/d/1").alias("prefix"), F.lit(0).alias("is_allow")))
        .unionByName(hosts.filter(F.col("h") % 3 == 0).select(
            "host", F.lit("/d/12").alias("prefix"), F.lit(1).alias("is_allow")))
    )
    path = F.substring(
        F.col("url"), F.lit(9) + F.length("host"), F.lit(2 ** 31 - 1)
    )
    cand = live.join(F.broadcast(rules), on="host", how="inner").filter(
        path.startswith(F.col("prefix"))
    )
    wv = Window.partitionBy("url").orderBy(
        F.length("prefix").desc(), F.col("is_allow").desc()
    )
    allowed = (
        cand.withColumn("rn", F.row_number().over(wv))
        .filter((F.col("rn") == 1) & (F.col("is_allow") == 1))
        .select("url", "host", "status", "priority")
    )
    wc = Window.partitionBy("host").orderBy("priority", "url")
    return allowed.select(
        "url", "host", "status", "priority",
        F.floor((F.row_number().over(wc) - 1) / _POLITENESS_C)
        .cast("bigint").alias("cycle"),
    )


# --- RSS-style feed parse ---------------------------------------------------------------

_FEED_ITEM = (
    "concat('<item><t>', split(text, ' ')[0], '_', CAST(doc_id AS STRING),"
    " '</t><l>https://', source, '.example.com/d/',"
    " CAST(doc_id AS STRING), '</l><n>', CAST(n_chars AS STRING),"
    " '</n></item>')"
)

_FEED_SQL = """
SELECT source,
  split_part(text, ' ', 1) || '_' || CAST(doc_id AS VARCHAR) AS title,
  'https://' || source || '.example.com/d/' || CAST(doc_id AS VARCHAR)
    AS link,
  n_chars
FROM documents
"""


@register("web_feed_items", _FEED_SQL)
def q_web_feed_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS/Atom-style feed ingestion: one feed document per source
    (synthesized here by assembling the per-source channel XML — the
    same synthesize-then-operate device as derive_host), parsed back
    with from_xml's nested ARRAY<STRUCT> schema (repeated <item>
    elements gather into the array) and exploded to one row per item.
    The graded path is the PARSE side — at crawl scale feeds arrive as
    fetched bytes and the per-feed item count is bounded (a feed is one
    page), so collect_list here stands in for the fetcher's payload, not
    for an unbounded aggregation."""
    d = t(spark, sf_dir, "documents")
    feed = (
        d.select("source", "doc_id", F.expr(_FEED_ITEM).alias("istr"))
        .groupBy("source")
        .agg(
            F.expr(
                "concat('<channel><title>', source, '</title>',"
                " array_join(transform(sort_array(collect_list("
                "struct(doc_id, istr))), s -> s.istr), ''),"
                " '</channel>')"
            ).alias("fx")
        )
    )
    parsed = feed.select(
        "source",
        F.expr(
            "from_xml(fx, 'title STRING,"
            " item ARRAY<STRUCT<t: STRING, l: STRING, n: BIGINT>>')"
        ).alias("p"),
    )
    return parsed.select("source", F.explode("p.item").alias("it")).select(
        "source",
        F.col("it.t").alias("title"),
        F.col("it.l").alias("link"),
        F.col("it.n").cast("bigint").alias("n_chars"),
    )
