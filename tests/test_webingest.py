"""Unit gates for queries_webingest: the CDX record-length formula pinned
against real framed bytes, crawl-diff and robots semantics checked against
independent Python references, and the broadcast plan for the rules join."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark import queries_webingest as wi
from ocr_spark.sources import warc
from tests.conftest import SF_SMALL


def test_cdx_length_formula(spark):
    """The oracle derives record offsets from the frozen grammar
    record_len = 157 + octet_len(url) + len(str(http_len)) + http_len,
    http_len = 62 + len(str(plen)) + plen. Pin the formula against the
    ACTUAL bytes record_expr produces, over real documents payloads."""
    pages = wi._synth_pages(spark, SF_SMALL)
    checked = pages.select(
        F.octet_length(
            warc.record_expr(F.col("url"), F.col("warc_date"), F.col("html"))
        ).alias("actual"),
        F.octet_length("url").alias("ulen"),
        F.octet_length("html").alias("plen"),
    ).withColumn(
        "http_len",
        F.lit(62) + F.length(F.col("plen").cast("string")) + F.col("plen"),
    ).withColumn(
        "predicted",
        F.lit(157) + F.col("ulen")
        + F.length(F.col("http_len").cast("string")) + F.col("http_len"),
    )
    bad = checked.filter(F.col("actual") != F.col("predicted")).count()
    assert bad == 0 and checked.count() > 0


def test_crawl_diff_matches_python_reference(spark):
    import duckdb

    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM '{SF_SMALL}/documents.parquet'").fetchall()]
    expect = {}
    for i in ids:
        url = f"https://s{i % 5}.src.example/d/{i}"
        if i % 5 == 4:
            expect[url] = "removed"
        elif i % 3 == 0:
            expect[url] = "changed"
        else:
            expect[url] = "same"
        if i % 7 == 0:
            expect[f"https://s{i % 5}.src.example/d/{i + 100000}"] = "added"
    got = {
        r["url"]: r["status"]
        for r in wi.q_web_crawl_diff(spark, SF_SMALL).collect()
    }
    assert got == expect


def _robots_verdict(h: int, path: str) -> tuple[str, str]:
    rules = [("/private/", 0), ("", 1)]
    if h % 2 == 0:
        rules.append(("/w/", 0))
    if h % 3 == 0:
        rules.append(("/w/open/", 1))
    matched = [r for r in rules if path.startswith(r[0])]
    matched.sort(key=lambda r: (-len(r[0]), -r[1]))
    prefix, allow = matched[0]
    return ("allow" if allow else "deny", prefix)


def test_robots_matches_python_reference(spark):
    import duckdb

    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM '{SF_SMALL}/documents.parquet'").fetchall()]
    expect = {}
    for i in ids:
        h = i % 7
        path = ["/w/open/", "/w/", "/private/", "/p/"][i % 4] + str(i)
        expect[i] = (f"h{h}.robots.example", path) + _robots_verdict(h, path)
    got = {
        r["doc_id"]: (r["host"], r["path"], r["verdict"], r["matched_prefix"])
        for r in wi.q_pipe_robots_filter(spark, SF_SMALL).collect()
    }
    assert got == expect


def test_robots_covers_all_arms(spark):
    """The synthetic corpus actually exercises allow-by-longest,
    deny-by-longest, and the empty-prefix default."""
    rows = wi.q_pipe_robots_filter(spark, SF_SMALL).collect()
    arms = {(r["verdict"], r["matched_prefix"]) for r in rows}
    assert ("allow", "/w/open/") in arms   # re-allow beats /w/ deny
    assert ("deny", "/w/") in arms         # even-host deny
    assert ("deny", "/private/") in arms   # global deny
    assert ("allow", "") in arms           # no-match default


def test_crawl_schedule_matches_python_reference(spark):
    """Schedule semantics vs an independent reference: removed urls leave
    the frontier, priority order inside each host, ≤ C urls per (host,
    cycle), cycles dense from 0."""
    import duckdb
    from collections import defaultdict

    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM '{SF_SMALL}/documents.parquet'").fetchall()]
    frontier = []
    for i in ids:
        host = f"s{i % 5}.src.example"
        if i % 5 != 4:
            pri = 0 if i % 3 == 0 else 2
            status = "changed" if i % 3 == 0 else "same"
            frontier.append((host, pri, f"https://{host}/d/{i}", status))
        if i % 7 == 0:
            frontier.append((host, 1, f"https://{host}/d/{i + 100000}", "added"))
    expect = {}
    byhost = defaultdict(list)
    for host, pri, url, status in frontier:
        byhost[host].append((pri, url, status))
    for host, rows in byhost.items():
        for slot, (pri, url, status) in enumerate(sorted(rows)):
            expect[url] = (host, status, pri, slot // wi._POLITENESS_C)
    got = {
        r["url"]: (r["host"], r["status"], r["priority"], r["cycle"])
        for r in wi.q_web_crawl_schedule(spark, SF_SMALL).collect()
    }
    assert got == expect
    per_cycle = defaultdict(int)
    for url, (host, _, _, cycle) in got.items():
        per_cycle[(host, cycle)] += 1
    assert max(per_cycle.values()) <= wi._POLITENESS_C


def test_cdx_offsets_address_real_bytes(spark):
    """The closure on web_cdx: build the archive with the index's exact
    layout (shard = doc_id % 8, records sorted by url), then FETCH a
    sample of records by the index's (filename, offset, length) and check
    byte-exact payloads — any error in the offset arithmetic, the window
    frame, or the record grammar misaligns the slice and fails here."""
    pages = wi._synth_pages(spark, SF_SMALL).withColumn(
        "shard", (F.col("doc_id") % 8).cast("int")
    )
    blobs = warc.blobs_by_shard(
        pages.select("url", "warc_date", "html", "shard"),
        num_files=8, shard_col="shard",
    ).withColumn(
        "filename",
        F.concat(F.lit("part-"), F.lpad(F.col("shard").cast("string"), 4, "0"),
                 F.lit(".warc")),
    ).select("filename", F.col("blob").alias("content"))

    cdx = wi.q_web_cdx(spark, SF_SMALL)
    sample = cdx.filter(F.crc32(F.col("surt")) % 5 == 0).select(
        "filename", "warc_offset", "rec_len", "digest"
    )
    n_sample = sample.count()
    assert n_sample > 10

    fetched = warc.fetch_by_index(blobs, sample)
    got = {r["url"]: (r["warc_date"], bytes(r["html"]))
           for r in fetched.collect()}
    assert len(got) == n_sample
    expect = {
        r["url"]: (r["warc_date"], bytes(r["html"]))
        for r in pages.collect()
    }
    for url, v in got.items():
        assert expect[url] == v


def test_robots_rules_join_is_broadcast(spark):
    plan = (
        wi.q_pipe_robots_filter(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan.split("Window")[0]


def test_frontier_matches_python_reference(spark):
    """web_frontier = diff-live set → robots scoping → politeness cycles,
    replayed by an independent Python implementation (plain dicts + sorts,
    no SQL)."""
    import duckdb

    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM '{SF_SMALL}/documents.parquet'").fetchall()]
    live = []
    for i in ids:
        host = f"s{i % 5}.src.example"
        if i % 5 != 4:
            status = "changed" if i % 3 == 0 else "same"
            live.append((f"https://{host}/d/{i}", host, status,
                         0 if status == "changed" else 2))
        if i % 7 == 0:
            live.append((f"https://{host}/d/{i + 100000}", host, "added", 1))

    def allowed(host: str, path: str) -> bool:
        h = int(host[1])
        rules = [("", 1), ("/d/9", 0)]
        if h % 2 == 0:
            rules.append(("/d/1", 0))
        if h % 3 == 0:
            rules.append(("/d/12", 1))
        matched = sorted(
            (r for r in rules if path.startswith(r[0])),
            key=lambda r: (-len(r[0]), -r[1]),
        )
        return matched[0][1] == 1

    kept = [row for row in live
            if allowed(row[1], row[0][8 + len(row[1]):])]
    expect = {}
    by_host: dict[str, list] = {}
    for row in kept:
        by_host.setdefault(row[1], []).append(row)
    for host, rows in by_host.items():
        rows.sort(key=lambda r: (r[3], r[0]))
        for slot, row in enumerate(rows):
            expect[row[0]] = (row[1], row[2], row[3],
                              slot // wi._POLITENESS_C)

    got = {
        r["url"]: (r["host"], r["status"], r["priority"], r["cycle"])
        for r in wi.q_web_frontier(spark, SF_SMALL).collect()
    }
    assert got == expect
    # robots ran BEFORE budgeting: every (host, cycle) is filled to the cap
    # before the next cycle opens
    per = {}
    for host, _status, _prio, cyc in got.values():
        per.setdefault(host, {}).setdefault(cyc, 0)
        per[host][cyc] += 1
    for host, cyc_counts in per.items():
        top = max(cyc_counts)
        for c in range(top):
            assert cyc_counts[c] == wi._POLITENESS_C, (host, c)


def test_frontier_rules_join_is_broadcast(spark):
    plan = (
        wi.q_web_frontier(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
