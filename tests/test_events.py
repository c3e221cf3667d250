"""Event-analytics gates (queries_events.py): each query replayed by an
independent pure-Python reference over the sf0.001 events table, plus the
plan properties the 100 TB story rests on (one user-keyed Exchange chain,
no event×event join, no Python)."""

from __future__ import annotations

import collections

import duckdb
import pytest

from ocr_spark.queries_events import (
    SESSION_GAP_US,
    _FUNNEL_STEPS,
    q_events_funnel,
    q_events_retention,
    q_events_sessionize,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def raw_events():
    rows = duckdb.sql(
        f"SELECT user_id, event_id, epoch_us(ts) AS us, event_type,"
        f" CAST(ts AS DATE) AS d"
        f" FROM read_parquet('{SF_SMALL}/events.parquet')"
    ).fetchall()
    return rows


def test_sessionize_matches_reference(spark, raw_events):
    by_user = collections.defaultdict(list)
    for u, eid, us, _t, _d in raw_events:
        by_user[u].append((us, eid))
    want = {}
    for u, evs in by_user.items():
        idx = 0
        prev = None
        for us, _eid in sorted(evs):
            if prev is None or us - prev > SESSION_GAP_US:
                idx += 1
            key = (u, idx)
            n, lo, hi = want.get(key, (0, us, us))
            want[key] = (n + 1, min(lo, us), max(hi, us))
            prev = us
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.first_us, r.last_us)
        for r in q_events_sessionize(spark, SF_SMALL).collect()
    }
    assert got == want


def test_funnel_matches_reference(spark, raw_events):
    by_user = collections.defaultdict(list)
    for u, _eid, us, typ, _d in raw_events:
        by_user[u].append((us, typ))
    want = {}
    for u, evs in by_user.items():
        t_prev = None
        reached = 0
        for step in _FUNNEL_STEPS:
            cand = [
                us
                for us, typ in evs
                if typ == step and (t_prev is None or us > t_prev)
            ]
            if not cand:
                break
            t_prev = min(cand)
            reached += 1
        want[u] = reached
    got = {
        r.user_id: r.reached
        for r in q_events_funnel(spark, SF_SMALL).collect()
    }
    assert got == want


def test_retention_matches_reference(spark, raw_events):
    days = {(u, d) for u, _e, _us, _t, d in raw_events}
    cohort = {}
    for u, d in days:
        cohort[u] = min(cohort.get(u, d), d)
    want = collections.Counter(
        (cohort[u], (d - cohort[u]).days) for u, d in days
    )
    got = {
        (r.cohort_day, r.day_offset): r.n_users
        for r in q_events_retention(spark, SF_SMALL).collect()
    }
    assert got == dict(want)
    # offset 0 row per cohort covers every cohort member
    n_users = len({u for u, _d in days})
    assert sum(v for (c, o), v in got.items() if o == 0) == n_users


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_sessionize_single_exchange_no_python(spark):
    plan = _plan(q_events_sessionize(spark, SF_SMALL))
    assert plan.count("+- Exchange") + plan.count(":- Exchange") == 1
    assert "Python" not in plan


def test_funnel_no_cartesian_no_python(spark):
    plan = _plan(q_events_funnel(spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan


def test_resample_gap_fill(spark):
    """events_resample: the dense axis is complete (types x full bucket
    range), empty buckets are explicit zero rows, and populated buckets
    match an independent Python fold."""
    from collections import defaultdict

    import __spark_entry__ as em

    from tests.conftest import SF_SMALL

    got = em.queries()["events_resample"](spark, SF_SMALL).collect()
    rows = spark.read.parquet(f"{SF_SMALL}/events.parquet").collect()
    step = 6 * 3600 * 1_000_000
    import datetime as dt

    def us(ts):
        return int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)

    agg = defaultdict(lambda: [0, 0])
    buckets = [us(r.ts) // step for r in rows]
    for r, b in zip(rows, buckets):
        a = agg[(r.event_type, b)]
        a[0] += 1
        a[1] += int(round(r.value * 100))
    types = {r.event_type for r in rows}
    full = range(min(buckets), max(buckets) + 1)
    expect = {
        (ty, b * step): tuple(agg[(ty, b)]) for ty in types for b in full
    }
    gotmap = {
        (r.event_type, r.bucket_start_us): (r.n, r.value_cents) for r in got
    }
    assert gotmap == expect
    assert any(v == (0, 0) for v in gotmap.values())  # real gaps exist


def test_ab_test_python_z_reference_and_polarities(spark):
    """events_ab_test: verdicts equal a float z-squared reference
    computed from the emitted counts; the planted-uplift metric is
    significant, and at least one organic metric is not (both verdict
    polarities carry signal at the oracle SF)."""
    from ocr_spark.queries import QUERIES
    import ocr_spark.queries_events  # noqa: F401

    rows = QUERIES["events_ab_test"](spark, "/root/testdata/sf0.01").collect()
    assert {r["metric"] for r in rows} == {
        "purchase", "click", "error", "planted"
    }
    by_metric = {}
    for r in rows:
        n1, c1 = r["n_control"], r["c_control"]
        n2, c2 = r["n_treat"], r["c_treat"]
        n, c = n1 + n2, c1 + c2
        p1, p2, p = c1 / n1, c2 / n2, c / n
        if 0 < p < 1:
            z2 = (p1 - p2) ** 2 / (p * (1 - p) * (1 / n1 + 1 / n2))
        else:
            z2 = 0.0
        assert r["significant"] == (1 if z2 > 1.96**2 else 0), r
        by_metric[r["metric"]] = r["significant"]
    assert by_metric["planted"] == 1
    assert 0 in {by_metric[m] for m in ("purchase", "click", "error")}


def test_forecast_naive_python_reference(spark):
    """events_forecast_naive equals a pure-Python seasonal-naive replay
    (6h cent buckets, lag-4 forecast, floored MAE)."""
    from collections import defaultdict

    from ocr_spark.queries import QUERIES, t
    import ocr_spark.queries_events  # noqa: F401

    sf = "/root/testdata/sf0.01"
    got = {
        r["event_type"]: (r["n_evals"], r["sae_c"], r["mae_c"])
        for r in QUERIES["events_forecast_naive"](spark, sf).collect()
    }
    buckets = defaultdict(int)
    for r in t(spark, sf, "events").select(
        "event_type", "ts", "value"
    ).collect():
        from datetime import timezone

        us = int(
            r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1_000_000
        )
        buckets[(r["event_type"], us // 21_600_000_000)] += int(
            round(r["value"] * 100)
        )
    series = defaultdict(dict)
    for (et, b), v in buckets.items():
        series[et][b] = v
    want = {}
    for et, s in series.items():
        ordered = sorted(s)
        errs = [
            abs(s[b] - s[ordered[i - 4]])
            for i, b in enumerate(ordered)
            if i >= 4
        ]
        if errs:
            want[et] = (len(errs), sum(errs), sum(errs) // len(errs))
    assert got == want


def test_cohort_ltv_python_reference(spark):
    """events_cohort_ltv equals a pure-Python replay: cohort by first
    active day over ALL events, revenue from purchases only, running
    cent sums, floored per-member LTV."""
    from collections import defaultdict

    from ocr_spark.queries import QUERIES, t
    import ocr_spark.queries_events  # noqa: F401

    sf = "/root/testdata/sf0.01"
    got = {
        (r["cohort_day"], r["day_offset"]): (
            r["n_users"], r["cum_rev_c"], r["ltv_c"]
        )
        for r in QUERIES["events_cohort_ltv"](spark, sf).collect()
    }
    first, rev = {}, defaultdict(int)
    for r in t(spark, sf, "events").select(
        "user_id", "ts", "event_type", "value"
    ).collect():
        d = r["ts"].date()
        u = r["user_id"]
        first[u] = min(first.get(u, d), d)
        if r["event_type"] == "purchase":
            rev[(u, d)] += int(round(r["value"] * 100))
    sz = defaultdict(int)
    for u, cd in first.items():
        sz[cd] += 1
    cr = defaultdict(int)
    for (u, d), c in rev.items():
        cr[(first[u], (d - first[u]).days)] += c
    want = {}
    for cd in {k[0] for k in cr}:
        cum = 0
        for off in sorted(k[1] for k in cr if k[0] == cd):
            cum += cr[(cd, off)]
            want[(cd, off)] = (sz[cd], cum, cum // sz[cd])
    assert got == want


def test_path_analysis_python_reference(spark):
    """events_path_analysis equals a pure-Python transition-matrix
    replay over (ts, event_id)-ordered user histories."""
    from collections import defaultdict

    from ocr_spark.queries import QUERIES, t
    import ocr_spark.queries_events  # noqa: F401

    sf = "/root/testdata/sf0.01"
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p_e6"])
        for r in QUERIES["events_path_analysis"](spark, sf).collect()
    }
    hist = defaultdict(list)
    for r in t(spark, sf, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect():
        hist[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    tr = defaultdict(int)
    for evs in hist.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            tr[(a, b)] += 1
    tot = defaultdict(int)
    for (a, _b), n in tr.items():
        tot[a] += n
    want = {
        k: (n, n * 1_000_000 // tot[k[0]]) for k, n in tr.items()
    }
    assert got == want


def test_attribution_python_reference(spark):
    """events_attribution equals a pure-Python replay: 24h trailing
    touch windows per purchase, floored linear shares, latest-touch
    flag with (ts, event_id) tie-break."""
    from collections import defaultdict
    from datetime import timezone

    from ocr_spark.queries import QUERIES, t
    import ocr_spark.queries_events  # noqa: F401

    sf = "/root/testdata/sf0.01"
    got = {
        (r["purchase_id"], r["touch_id"]): (
            r["touch_type"], r["n_touches"], r["share_e6"], r["last_touch"]
        )
        for r in QUERIES["events_attribution"](spark, sf).collect()
    }
    by_user = defaultdict(lambda: {"p": [], "t": []})
    for r in t(spark, sf, "events").select(
        "user_id", "event_id", "ts", "event_type"
    ).collect():
        us = int(
            r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1_000_000
        )
        if r["event_type"] == "purchase":
            by_user[r["user_id"]]["p"].append((r["event_id"], us))
        elif r["event_type"] in ("view", "click"):
            by_user[r["user_id"]]["t"].append(
                (r["event_id"], us, r["event_type"])
            )
    want = {}
    for u, d in by_user.items():
        for pid, pus in d["p"]:
            touches = [
                (tid, tus, ty)
                for tid, tus, ty in d["t"]
                if tus <= pus and tus > pus - 86_400_000_000
            ]
            if not touches:
                continue
            n = len(touches)
            last = max(touches, key=lambda x: (x[1], x[0]))[0]
            for tid, _tus, ty in touches:
                want[(pid, tid)] = (
                    ty, n, 1_000_000 // n, 1 if tid == last else 0
                )
    assert got == want


def test_rfm_python_reference(spark):
    """events_rfm equals a pure-Python ntile replay over the user
    rollup (SQL ntile: first n % 4 buckets get the extra row)."""
    from collections import defaultdict
    from datetime import timezone

    from ocr_spark.queries import QUERIES, t
    import ocr_spark.queries_events  # noqa: F401

    sf = "/root/testdata/sf0.01"
    got = {
        r["user_id"]: (
            r["freq"], r["spend_c"], r["r_score"], r["f_score"],
            r["m_score"], r["segment"],
        )
        for r in QUERIES["events_rfm"](spark, sf).collect()
    }
    u = defaultdict(lambda: [0, 0, 0])  # last_us, freq, spend
    for r in t(spark, sf, "events").select(
        "user_id", "ts", "event_type", "value"
    ).collect():
        us = int(
            r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1_000_000
        )
        a = u[r["user_id"]]
        a[0] = max(a[0], us)
        a[1] += 1
        if r["event_type"] == "purchase":
            a[2] += int(round(r["value"] * 100))

    def ntiles(keyed):
        n = len(keyed)
        base, extra = divmod(n, 4)
        out = {}
        i = 0
        for b in range(4):
            size = base + (1 if b < extra else 0)
            for _ in range(size):
                out[keyed[i][1]] = b + 1
                i += 1
        return out

    rs = ntiles(sorted((v[0], k) for k, v in u.items()))
    fs = ntiles(sorted((v[1], k) for k, v in u.items()))
    ms = ntiles(sorted((v[2], k) for k, v in u.items()))
    for k, v in u.items():
        seg = f"{rs[k]}{fs[k]}{ms[k]}"
        assert got[k] == (v[1], v[2], rs[k], fs[k], ms[k], seg), k


def test_survival_km_python_reference(spark):
    """events_survival equals a pure-Python Kaplan-Meier replay over
    the planted activity windows; the curve is non-increasing, starts
    <= 1e6, and both churn and censoring arms are populated."""
    from collections import defaultdict
    import math

    from ocr_spark.queries import QUERIES, t
    import ocr_spark.queries_events  # noqa: F401

    sf = "/root/testdata/sf0.01"
    rows = sorted(
        QUERIES["events_survival"](spark, sf).collect(),
        key=lambda r: r["day"],
    )
    got = {
        r["day"]: (r["n_risk"], r["n_churned"], r["surv_e6"]) for r in rows
    }

    ev = t(spark, sf, "events").select("user_id", "ts").collect()
    base = min(r["ts"].date() for r in ev)
    spans = defaultdict(list)
    for r in ev:
        d = r["ts"].date()
        if (d - base).days < 5 + (r["user_id"] * 7) % 25:
            spans[r["user_id"]].append(d)
    dend = max(max(ds) for ds in spans.values())
    life, cens = {}, {}
    for u, ds in spans.items():
        life[u] = (max(ds) - min(ds)).days
        cens[u] = 1 if (dend - max(ds)).days <= 3 else 0
    days = sorted({v for v in life.values()})
    want = {}
    surv = 1.0
    for t_ in days:
        n = sum(1 for u in life if life[u] >= t_)
        d = sum(1 for u in life if life[u] == t_ and cens[u] == 0)
        surv *= (n - d) / n
        want[t_] = (n, d, math.floor(surv * 1e6))
    assert got == want
    vals = [got[t_][2] for t_ in days]
    assert vals == sorted(vals, reverse=True)
    assert vals[0] <= 1_000_000
    assert any(got[t_][1] > 0 for t_ in days)  # churn fires
    assert sum(cens.values()) > 0  # censoring fires


def test_active_users_python_reference(spark):
    """events_active_users equals a pure-Python DAU/WAU/MAU replay."""
    from collections import defaultdict
    from datetime import timedelta

    from ocr_spark.queries import QUERIES, t
    import ocr_spark.queries_events  # noqa: F401

    sf = "/root/testdata/sf0.01"
    got = {
        r["day"]: (r["dau"], r["wau"], r["mau"], r["stickiness_e6"])
        for r in QUERIES["events_active_users"](spark, sf).collect()
    }
    by_day = defaultdict(set)
    for r in t(spark, sf, "events").select("user_id", "ts").collect():
        by_day[r["ts"].date()].add(r["user_id"])
    want = {}
    for d in by_day:
        wau = set().union(
            *(by_day.get(d - timedelta(days=k), set()) for k in range(7))
        )
        mau = set().union(
            *(by_day.get(d - timedelta(days=k), set()) for k in range(28))
        )
        dau = len(by_day[d])
        want[d] = (dau, len(wau), len(mau), dau * 1_000_000 // len(mau))
    assert got == want


def test_streaks_python_reference(spark):
    """events_streaks equals a pure-Python islands replay."""
    from collections import defaultdict
    from datetime import timedelta

    from ocr_spark.queries import QUERIES, t
    import ocr_spark.queries_events  # noqa: F401

    sf = "/root/testdata/sf0.01"
    got = {
        r["user_id"]: (r["longest_streak"], r["n_streaks"], r["best_start"])
        for r in QUERIES["events_streaks"](spark, sf).collect()
    }
    days = defaultdict(set)
    for r in t(spark, sf, "events").select("user_id", "ts").collect():
        days[r["user_id"]].add(r["ts"].date())
    for u, ds in days.items():
        runs = []
        cur = None
        for d in sorted(ds):
            if cur and d == cur[1] + timedelta(days=1):
                cur = (cur[0], d)
            else:
                if cur:
                    runs.append(cur)
                cur = (d, d)
        runs.append(cur)
        mx = max((b - a).days + 1 for a, b in runs)
        best = min(a for a, b in runs if (b - a).days + 1 == mx)
        assert got[u] == (mx, len(runs), best), u


def test_heatmap_dense_axis_and_reference(spark):
    """events_heatmap: all 168 cells present, zeros explicit, populated
    cells match a Python fold with ISO day-of-week."""
    from collections import defaultdict

    from ocr_spark.queries import QUERIES, t
    import ocr_spark.queries_events  # noqa: F401

    sf = "/root/testdata/sf0.01"
    rows = QUERIES["events_heatmap"](spark, sf).collect()
    assert len(rows) == 7 * 24
    got = {(r["dow"], r["hod"]): (r["n"], r["val_c"]) for r in rows}
    agg = defaultdict(lambda: [0, 0])
    for r in t(spark, sf, "events").select("ts", "value").collect():
        k = (r["ts"].isoweekday(), r["ts"].hour)
        agg[k][0] += 1
        agg[k][1] += int(round(r["value"] * 100))
    for k, v in got.items():
        assert v == tuple(agg.get(k, [0, 0])), k
