"""WARC source: framing round-trips, gzip members, damage tolerance, and the
binaryFile → pages e2e path (SURVEY §2 sources; BASELINE input_hint upstream
format)."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from ocr_spark.sources import warc


def _pages(spark, n=40, start=0):
    """Deterministic pages-shaped frame: url/date/payload from a range."""
    return spark.range(start, start + n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string")).alias("url"),
        F.date_format(
            F.timestamp_seconds(F.lit(946684800) + F.col("id") * 61),
            "yyyy-MM-dd'T'HH:mm:ss'Z'",
        ).alias("warc_date"),
        F.encode(
            F.concat(F.lit("<html><body><p>doc "), F.col("id").cast("string"),
                     F.lit(" é中</p></body></html>")),
            "UTF-8",
        ).alias("html"),
    )


def _expected(spark, n=40):
    return {
        (r["url"], r["warc_date"], bytes(r["html"]))
        for r in _pages(spark, n).collect()
    }


def test_single_record_roundtrip_python():
    """record_expr framing is parseable by split_records, byte-exact payload."""
    # build the record bytes by hand with the same grammar as record_expr
    payload = "<html><body>é x</body></html>".encode()
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://a.example/x\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        + b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )
    out = list(warc.split_records(rec * 3))
    assert out == [
        ("https://a.example/x", "2024-01-01T00:00:00Z", payload)
    ] * 3


def test_jvm_record_matches_python_grammar(spark):
    """The JVM record_expr and the Python parser are inverse functions."""
    df = _pages(spark, 10)
    rec = df.select(
        warc.record_expr(F.col("url"), F.col("warc_date"), F.col("html"))
        .alias("rec"),
        "url", "warc_date", "html",
    )
    for r in rec.collect():
        got = list(warc.split_records(bytes(r["rec"])))
        assert got == [(r["url"], r["warc_date"], bytes(r["html"]))]


def test_multi_record_blob_and_parse_warc(spark):
    """blobs_by_shard concatenates shard files; parse_warc recovers every
    record exactly once (no dupes, no drops) with byte-exact payloads."""
    blobs = warc.blobs_by_shard(_pages(spark), num_files=4)
    assert blobs.count() <= 4
    got = warc.parse_warc(blobs.select(F.col("blob").alias("content")))
    rows = {
        (r["url"], r["warc_date"], bytes(r["html"])) for r in got.collect()
    }
    assert rows == _expected(spark)


def test_gzip_member_blob(spark):
    """.warc.gz framing: one gzip member per record, split at member
    boundaries, identical record set."""
    blobs = warc.blobs_by_shard(_pages(spark), num_files=3, gzip_members=True)
    first = bytes(blobs.first()["blob"])
    assert first[:2] == b"\x1f\x8b"  # member framing, not whole-file gzip
    got = warc.parse_warc(blobs.select(F.col("blob").alias("content")))
    rows = {
        (r["url"], r["warc_date"], bytes(r["html"])) for r in got.collect()
    }
    assert rows == _expected(spark)


def test_damage_tolerance():
    """Garbage between records, a corrupt Content-Length, a non-response
    record, and a truncated tail are all skipped without raising."""
    payload = b"<p>ok</p>"
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Length: "
        + str(len(payload)).encode() + b"\r\n\r\n" + payload
    )

    def rec(url: bytes, ctype: bytes = b"response", clen: bytes | None = None):
        return (
            b"WARC/1.0\r\nWARC-Type: " + ctype + b"\r\n"
            b"WARC-Target-URI: " + url + b"\r\n"
            b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            + b"Content-Length: "
            + (clen if clen is not None else str(len(http)).encode())
            + b"\r\n\r\n" + http + b"\r\n\r\n"
        )

    buf = (
        b"\x00garbage\x00" + rec(b"https://a.example/1")
        + rec(b"https://a.example/2", clen=b"NaN")     # damaged header
        + rec(b"https://a.example/3", ctype=b"request")  # skipped type
        + rec(b"https://a.example/4")
        + rec(b"https://a.example/5")[:40]              # truncated tail
    )
    urls = [u for (u, _, _) in warc.split_records(buf)]
    assert urls == ["https://a.example/1", "https://a.example/4"]


def test_truncated_gzip_member():
    full = b"WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    member = gzip.compress(full)
    # second member cut mid-stream: first decodes fully; whatever bytes the
    # cut member held are salvaged (split_records drops any cut record), and
    # nothing raises
    out = list(warc._gunzip_members(member + member[: len(member) // 2]))
    assert out[0] == full
    assert len(out) <= 2 and all(full.startswith(m) or m == full for m in out)


def test_read_warc_e2e(spark, tmp_path):
    """write_warc → binaryFile → read_warc recovers the pages table shape
    (url, warc_ts timestamp, html) for both plain and gzip archives."""
    for gz in (False, True):
        d = tmp_path / ("gz" if gz else "plain")
        n = warc.write_warc(_pages(spark), str(d), num_files=4,
                            gzip_members=gz)
        assert 1 <= n <= 4
        back = warc.read_warc(spark, str(d))
        assert back.schema["warc_ts"].dataType.typeName() == "timestamp"
        rows = {
            (
                r["url"],
                r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"),
                bytes(r["html"]),
            )
            for r in back.collect()
        }
        assert rows == _expected(spark)


def test_null_payload_and_null_key_rows(spark):
    """NULL html frames as an empty capture body; NULL url/date rows are
    dropped instead of NULL-poisoning the shard blob's binary fold."""
    rows = [
        ("https://a.example/1", "2024-01-01T00:00:00Z", b"<p>x</p>"),
        ("https://a.example/2", "2024-01-01T00:00:00Z", None),
        (None, "2024-01-01T00:00:00Z", b"dropped"),
        ("https://a.example/3", None, b"dropped"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_date string, html binary")
    blobs = warc.blobs_by_shard(df, num_files=1)
    got = sorted(
        (r["url"], bytes(r["html"]))
        for r in warc.parse_warc(
            blobs.select(F.col("blob").alias("content"))
        ).collect()
    )
    assert got == [
        ("https://a.example/1", b"<p>x</p>"),
        ("https://a.example/2", b""),
    ]


def test_warc_ingest_job_end_to_end(spark, tmp_path):
    """Self-contained job: synth pages → real .warc.gz archive → binaryFile
    ingest → pages table, with the built-in round-trip digest check."""
    from scripts.warc_ingest_job import run_warc_ingest_job

    rep = run_warc_ingest_job(spark, str(tmp_path / "wi"), n_pages=300,
                              num_files=4)
    assert rep["n_rows"] == 300
    assert rep["roundtrip_ok"] is True
    assert 1 <= rep["n_archive_files"] <= 4
    back = spark.read.parquet(str(tmp_path / "wi" / "pages"))
    assert set(back.columns) == {"url", "warc_ts", "html", "text", "lang"}


def test_wet_conversion_records(spark, tmp_path):
    """Conversion (WET) records: bare text/plain payload, no HTTP block —
    framed by the same JVM grammar, recovered by the same splitter; and
    write_wet produces .warc.wet.gz files from extraction-shaped output."""
    blobs = warc.blobs_by_shard(_pages(spark), num_files=3,
                                warc_type="conversion")
    first = bytes(blobs.first()["blob"])
    assert b"WARC-Type: conversion\r\n" in first
    assert b"HTTP/1.1" not in first  # bare payload, no embedded HTTP
    got = warc.parse_warc(blobs.select(F.col("blob").alias("content")))
    rows = {
        (r["url"], r["warc_date"], bytes(r["html"])) for r in got.collect()
    }
    assert rows == _expected(spark)

    ex = spark.range(20).select(
        F.concat(F.lit("https://w.example/"), F.col("id").cast("string"))
        .alias("url"),
        F.timestamp_seconds(F.lit(946684800) + F.col("id")).alias("warc_ts"),
        F.concat(F.lit("text "), F.col("id").cast("string"))
        .alias("extracted_text"),
    )
    n = warc.write_wet(ex, str(tmp_path / "wet"), num_files=2)
    files = list((tmp_path / "wet").glob("*.warc.wet.gz"))
    assert len(files) == n >= 1
    back = warc.read_warc(spark, str(tmp_path / "wet"))
    texts = {bytes(r["html"]).decode() for r in back.collect()}
    assert texts == {f"text {i}" for i in range(20)}


def test_archive_to_extraction_runner(spark, tmp_path):
    """The whole crawl path composes: .warc.gz archive → ingest → pages
    table → the resumable extraction runner, producing extracted text with
    lineage — a reference user's end-to-end flow starting from archives."""
    from scripts.warc_ingest_job import run_warc_ingest_job
    from ocr_spark.operators.runner import read_pages, run_extract

    run_warc_ingest_job(spark, str(tmp_path / "wi"), n_pages=200, num_files=2)
    pages = read_pages(spark, str(tmp_path / "wi" / "pages"))
    rep = run_extract(spark, pages, str(tmp_path / "ex"), run_id="warc-e2e",
                      num_parts=4, parts_per_batch=4)
    assert len(rep["parts_done_now"]) == 4
    data = spark.read.parquet(str(tmp_path / "ex" / "data"))
    assert data.count() == 200
    assert data.filter("extracted_text IS NOT NULL").count() > 0


def test_incremental_warc_ingest_exactly_once(spark, tmp_path):
    """Continuous archive ingest: two waves of archive files through the
    same checkpoint — every record lands exactly once; an idle re-run
    appends nothing."""
    from ocr_spark.streaming.incremental import incremental_warc_ingest

    archive = tmp_path / "archive"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        writer, committer = incremental_warc_ingest(
            spark, str(archive), out, ckpt, run_id="warc-stream-test")
        writer.trigger(availableNow=True).start().awaitTermination()
        return committer

    warc.write_warc(_pages(spark, 40), str(archive), num_files=2,
                    gzip_members=True, prefix="w1")
    run()
    got1 = spark.read.parquet(f"{out}/data")
    assert got1.count() == 40

    warc.write_warc(_pages(spark, 20, start=40), str(archive), num_files=2,
                    prefix="w2")
    run()
    got2 = spark.read.parquet(f"{out}/data")
    assert got2.count() == 60
    assert got2.select("url").distinct().count() == 60  # exactly-once
    assert set(got2.columns) >= {"url", "warc_ts", "html", "text", "lang"}

    run()  # no new files: nothing appended
    assert spark.read.parquet(f"{out}/data").count() == 60


def test_parse_plan_is_narrow(spark):
    """The splitter is one mapInArrow hop over the file scan — no Exchange
    before it (files are the unit of parallelism; shuffle-free ingest)."""
    blobs = warc.blobs_by_shard(_pages(spark), num_files=2)
    plan = warc.parse_warc(
        blobs.select(F.col("blob").alias("content"))
    )._jdf.queryExecution().executedPlan().toString()
    head = plan.split("Exchange")[0]
    assert "MapInArrow" in head  # the parse happens before any exchange


def test_wat_metadata_records(spark, tmp_path):
    """Metadata (WAT) records: application/json payload framed by the same
    JVM grammar; write_wat → read_wat round-trips the extract_metadata
    shape exactly (json.loads-level, so key order is irrelevant), and the
    page splitter SKIPS metadata records (type scoping both ways)."""
    meta = spark.range(25).select(
        F.concat(F.lit("https://m.example/"), F.col("id").cast("string"))
        .alias("url"),
        F.timestamp_seconds(F.lit(946684800) + F.col("id")).alias("warc_ts"),
        F.concat(F.lit("Title "), F.col("id").cast("string")).alias("title"),
        F.when(F.col("id") % 2 == 0,
               F.concat(F.lit("desc "), F.col("id").cast("string")))
        .otherwise(F.lit("")).alias("description"),
        F.concat(F.lit("https://m.example/c/"), F.col("id").cast("string"))
        .alias("canonical"),
        F.lit("").alias("og_title"),
    )
    n = warc.write_wat(meta, str(tmp_path / "wat"), num_files=2)
    files = list((tmp_path / "wat").glob("*.warc.wat.gz"))
    assert len(files) == n >= 1
    raw = files[0].read_bytes()
    first_rec = next(warc.parse_blob(raw, frozenset(("metadata",))))
    assert first_rec[2].startswith(b"{")  # bare JSON payload, no HTTP block
    back = warc.read_wat(spark, str(tmp_path / "wat"))
    key = lambda rows: sorted(  # noqa: E731
        (r["url"], r["warc_ts"].isoformat(), r["title"], r["description"],
         r["canonical"], r["og_title"]) for r in rows
    )
    assert key(back.collect()) == key(meta.collect())

    # type scoping: the pages splitter must skip metadata records entirely
    blobs = spark.read.format("binaryFile").load(str(tmp_path / "wat"))
    assert warc.parse_warc(blobs.select("content")).count() == 0


def test_mixed_type_archive_scoping(spark):
    """One blob holding response + conversion + metadata + warcinfo
    records: each reader sees exactly its own types."""
    p = _pages(spark, n=6)
    resp = warc.blobs_by_shard(p, num_files=1).select("blob")
    conv = warc.blobs_by_shard(p, num_files=1, warc_type="conversion").select("blob")
    md = warc.blobs_by_shard(
        p.withColumn("html", F.encode(F.lit('{"k":1}'), "UTF-8")),
        num_files=1, warc_type="metadata",
    ).select("blob")
    warcinfo = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: application/warc-fields"
        b"\r\nContent-Length: 9\r\n\r\nrobots: x\r\n\r\n"
    )
    blob = (
        warcinfo
        + bytes(resp.first()["blob"])
        + bytes(md.first()["blob"])
        + bytes(conv.first()["blob"])
    )
    df = spark.createDataFrame([(blob,)], "content binary")
    assert warc.parse_warc(df).count() == 12            # response + conversion
    assert warc.parse_warc(
        df, types=frozenset(("metadata",))).count() == 6
    assert warc.parse_warc(
        df, types=frozenset(("response",))).count() == 6
