"""Join-strategy advisor gates: verdict rules vs a pure-Python replay,
and the all-arms-fire guarantee the registry entry's grading relies on."""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_ORACLE
from ocr_spark.queries import QUERIES, t
import ocr_spark.queries_scaleopt  # noqa: F401


def test_advisor_reference_and_all_arms(spark):
    rows = {
        r["join_name"]: r
        for r in QUERIES["profile_join_advisor"](spark, SF_ORACLE).collect()
    }
    assert set(rows) == {"li_supplier", "li_orders", "li_orders_hot"}
    assert {r["verdict"] for r in rows.values()} == {
        "broadcast", "shuffle", "salt"
    }

    li = [
        (r["l_orderkey"], r["l_suppkey"])
        for r in t(spark, SF_ORACLE, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .collect()
    ]
    n_orders = t(spark, SF_ORACLE, "orders").count()
    n_supp = t(spark, SF_ORACLE, "supplier").count()

    def profile(keys, dim_rows):
        c = Counter(keys)
        fact, n_keys, mx = len(keys), len(c), max(c.values())
        if dim_rows <= 500:
            v = "broadcast"
        elif mx * 20 > fact:
            v = "salt"
        else:
            v = "shuffle"
        return fact, dim_rows, n_keys, mx, v

    want = {
        "li_supplier": profile([s for _, s in li], n_supp),
        "li_orders": profile([o for o, _ in li], n_orders),
        "li_orders_hot": profile(
            [0 if o % 2 == 0 else o for o, _ in li], n_orders
        ),
    }
    for name, r in rows.items():
        assert (
            r["fact_rows"], r["dim_rows"], r["n_keys"],
            r["max_key_cnt"], r["verdict"],
        ) == want[name], name
