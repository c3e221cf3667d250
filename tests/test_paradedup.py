"""CCNet keep-first paragraph dedup: independent pure-Python reference +
the skew-shape plan pin (groupBy-min formulation, no window over the
paragraph-hash key).
"""

from __future__ import annotations

import math
import re


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _py_reference(rows, w=20):
    """rows: [(doc_id, text)] -> {doc_id: (kept_text, n_kept, n_segs)} —
    written from the CCNet description, not from the Spark code."""
    instances = []  # (doc_id, pos, seg) in instance-key order
    for doc_id, text in rows:
        ws = [t for t in text.split(" ") if t != ""]
        if not ws:
            continue
        n_segs = math.ceil(len(ws) / w)
        for p in range(n_segs):
            seg = " ".join(ws[p * w : p * w + w])
            instances.append((doc_id, p, seg, n_segs))
    seen: set[str] = set()
    kept: dict[int, list[tuple[int, str, int]]] = {}
    for doc_id, p, seg, n_segs in sorted(instances):
        key = seg.lower()
        if key in seen:
            continue
        seen.add(key)
        kept.setdefault(doc_id, []).append((p, seg, n_segs))
    return {
        d: (
            " ".join(s for _, s, _ in sorted(v)),
            len(v),
            v[0][2],
        )
        for d, v in kept.items()
    }


def test_keepfirst_matches_python_reference(spark, tmp_path):
    rows = [
        (0, "a b c d e " * 8),                      # 40 words -> 2 segs
        (1, "a b c d e " * 8),                      # exact dup of doc 0
        (2, "a b c d e " * 4 + "x y z q r " * 4),   # seg0 dup, seg1 fresh
        (3, "A B C D E " * 4),                      # case-folds onto seg0
        (4, ""),                                    # empty: no output row
        (5, "u v w"),                               # single short seg
        (6, "u v w"),                               # later copy of doc 5
    ]
    import pyspark.sql.functions as F

    spark.createDataFrame(rows, "doc_id bigint, text string").withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from ocr_spark.queries_paradedup import (
        q_dedup_para_keepfirst,
        q_dedup_para_survivors,
    )

    got = {
        r.doc_id: (r.kept_text, r.n_kept, r.n_segs)
        for r in q_dedup_para_keepfirst(spark, str(tmp_path)).collect()
    }
    want = _py_reference(rows)
    assert got == want

    surv = sorted(
        r.doc_id for r in q_dedup_para_survivors(spark, str(tmp_path)).collect()
    )
    want_surv = sorted(
        d for d, (_, n_kept, n_segs) in want.items()
        if n_kept * 10 >= n_segs * 3
    )
    assert surv == want_surv
    # the exact dup and the case-fold dup lost everything
    assert 1 not in got and 3 not in got and 6 not in got


def test_plan_has_no_window_over_paragraph_hash(spark):
    """The hot-paragraph skew guard: first-instance selection must be a
    partial-aggregable groupBy (HashAggregate pair), NOT a row_number
    window partitioned by the hash key."""
    from ocr_spark.queries_paradedup import q_dedup_para_keepfirst

    plan = _plan(q_dedup_para_keepfirst(spark, "/root/testdata/sf0.001"))
    assert "Window" not in plan, plan
    assert re.search(r"HashAggregate", plan)
    assert "BatchEvalPython" not in plan
