"""Seeded differential tests for the session-4 entries: the registry
queries run end-to-end over an ADVERSARIAL synthetic events/customer
table (timestamp ties, tier-boundary values, single-event users) and
must match pure-Python references computed independently here.

The DuckDB oracles grade these entries on the driver tables; this file
grades them on inputs built to hit the edges those tables may miss —
one Spark job per operator (the repo's fuzz pattern: per-example
hypothesis jobs would pay session overhead per example).
"""

from __future__ import annotations

import datetime as dt
import random
import re

import pytest


@pytest.fixture(scope="module")
def fuzz_sf_dir(spark, tmp_path_factory):
    """A tiny sf-dir whose events.parquet is adversarial: 12 users over a
    60-minute window with second-granularity timestamps (forced ties),
    purchase values straddling the 500-cent tier boundary, and users
    with 0/1/many purchases."""
    rng = random.Random(20260820)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for _ in range(400):
        uid = rng.randint(0, 11)
        ts = base + dt.timedelta(seconds=rng.randint(0, 3600))
        etype = rng.choice(
            ["view", "click", "purchase", "signup", "error", "purchase"]
        )
        # cents near multiples of 500 so tiers flip on small deltas
        cents = rng.choice([0, 1, 499, 500, 501, 999, 1000, 1499, 2500])
        rows.append((eid, ts, uid, etype, cents / 100.0, "{}"))
        eid += 1
    d = tmp_path_factory.mktemp("fuzz_sf")
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    ).write.parquet(str(d / "events.parquet"))
    return str(d), rows


def _purchases(rows):
    return sorted(
        (
            (r[1], r[0], r[2], int(round(r[4] * 100)))
            for r in rows
            if r[3] == "purchase"
        ),
        key=lambda x: (x[2], x[0], x[1]),
    )  # (ts, event_id, user, cents) sorted by user, ts, event_id


def test_events_ewma_matches_python(spark, fuzz_sf_dir):
    from ocr_spark.queries import QUERIES
    import ocr_spark.queries_events  # noqa: F401

    d, rows = fuzz_sf_dir
    got = {
        r["event_id"]: (r["n_in"], r["num"], r["den"], r["ewma_e6"])
        for r in QUERIES["events_ewma"](spark, d).collect()
    }
    per_user: dict[int, list] = {}
    for ts, eid, uid, cents in _purchases(rows):
        per_user.setdefault(uid, []).append((ts, eid, cents))
    exp = {}
    for uid, evs in per_user.items():
        for i in range(len(evs)):
            frame = [c for _, _, c in evs[max(0, i - 15): i + 1]]
            num = sum(c * (1 << j) for j, c in enumerate(frame))
            den = (1 << len(frame)) - 1
            exp[evs[i][1]] = (len(frame), num, den, num * 10**6 // den)
    assert got == exp


def test_events_seqpattern_matches_python(spark, fuzz_sf_dir):
    from ocr_spark.queries import QUERIES
    import ocr_spark.queries_events  # noqa: F401

    d, rows = fuzz_sf_dir
    got = {
        r["user_id"]: (r["n_events"], r["n_funnels"], r["converted"])
        for r in QUERIES["events_seqpattern"](spark, d).collect()
    }
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r[2], []).append((r[1], r[0], r[3][0]))
    exp = {}
    for uid, evs in per_user.items():
        seq = "".join(c for _, _, c in sorted(evs))
        n = len(re.findall(r"v[^ep]*c[^ep]*p", seq))
        exp[uid] = (len(evs), n, int(n > 0))
    assert got == exp


def _scd2_changes(per_user_purchases):
    """(vf, version, tier) change points per user, islands by tier run."""
    out = {}
    for uid, evs in per_user_purchases.items():
        changes, prev = [], None
        for ts, eid, cents in evs:
            tier = cents // 500
            if prev is None or tier != prev:
                changes.append((ts, len(changes) + 1, tier))
            prev = tier
        out[uid] = changes
    return out


def test_join_temporal_scd2_matches_python(spark, fuzz_sf_dir):
    from ocr_spark.queries import QUERIES
    import ocr_spark.queries_events  # noqa: F401

    d, rows = fuzz_sf_dir
    got = {
        r["event_id"]: (r["tier_asof"], r["tier_since"])
        for r in QUERIES["join_temporal_scd2"](spark, d).collect()
    }
    per_user: dict[int, list] = {}
    for ts, eid, uid, cents in _purchases(rows):
        per_user.setdefault(uid, []).append((ts, eid, cents))
    # change points: first purchase of each equal-tier run; islands are
    # keyed on the (ts, event_id)-ordered walk, matching scd2's lag+sum
    changes = _scd2_changes(per_user)
    exp = {}
    for r in rows:
        if r[3] != "view":
            continue
        eid, ts, uid = r[0], r[1], r[2]
        cand = [c for c in changes.get(uid, []) if c[0] <= ts]
        if not cand:
            exp[eid] = (-1, None)
        else:
            # among equal-vf changes the later version wins (empty
            # interval [t, t) never matches)
            vf, _, tier = max(cand, key=lambda c: (c[0], c[1]))
            exp[eid] = (tier, vf)
    assert got == exp


def test_privacy_k_anon_release_law(spark):
    """Release law on the real table: every released row's QI group has
    >= K members IN THE RELEASE, the release is exactly the rows of
    source QI groups of size >= K, and no direct identifier survives."""
    from ocr_spark.queries import QUERIES
    from ocr_spark.queries_privacy import _K
    import ocr_spark.queries_privacy  # noqa: F401

    sf = "/root/testdata/sf0.001"
    rel = QUERIES["privacy_k_anon"](spark, sf).collect()
    assert rel and all(r["group_n"] >= _K for r in rel)
    assert "c_custkey" not in rel[0].asDict() and "c_name" not in rel[0].asDict()

    src = spark.read.parquet(f"{sf}/customer.parquet").collect()
    from collections import Counter

    grp = Counter(
        (c["c_mktsegment"], int(c["c_acctbal"] // 1000)) for c in src
    )
    # released rows = exactly the members of groups with n >= K
    assert len(rel) == sum(n for n in grp.values() if n >= _K)
    for r in rel:
        assert grp[(r["c_mktsegment"], r["bal_band"])] == r["group_n"]


def test_scan_csv_corrupt_quarantine_law(spark):
    """Quarantine law: rows-in == rows-out, every malformed row carries
    its raw line byte-exactly, and no well-formed row is quarantined."""
    from ocr_spark.queries import QUERIES
    import ocr_spark.queries_formats  # noqa: F401

    sf = "/root/testdata/sf0.001"
    out = QUERIES["scan_csv_corrupt"](spark, sf).collect()
    n_src = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert len(out) == n_src
    for r in out:
        if r["doc_id"] % 7 in (3, 5, 6):
            assert r["quarantined"] == 1
            assert r["raw_line"].startswith(f"{r['doc_id']},")
        else:
            assert r["quarantined"] == 0 and r["raw_line"] is None
