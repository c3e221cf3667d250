"""DQ constraint suite: per-kind verdicts, edge cases, single-scan plan."""

from __future__ import annotations

from ocr_spark.operators.dq import dq_check

E6 = 1_000_000


def _verdicts(df, constraints):
    return {r["name"]: r for r in dq_check(df, constraints).collect()}


def _frame(spark):
    rows = [
        (1, "alpha", "en", 5),
        (2, "beta", "en", 4),
        (3, None, "xx", 9),
        (3, "gamma", "de", 5),
    ]
    return spark.createDataFrame(rows, "id bigint, s string, lang string, n bigint")


class TestKinds:
    def test_complete(self, spark):
        v = _verdicts(_frame(spark), [("complete", "c", "s", E6)])["c"]
        assert v["metric_e6"] == 750_000 and not v["passed"]

    def test_unique(self, spark):
        v = _verdicts(_frame(spark), [("unique", "u", "id", E6)])["u"]
        assert v["metric_e6"] == 750_000 and not v["passed"]

    def test_in_set(self, spark):
        v = _verdicts(
            _frame(spark), [("in_set", "l", "lang", ("en", "de"), 700_000)]
        )["l"]
        assert v["metric_e6"] == 750_000 and v["passed"]

    def test_between_and_matches(self, spark):
        vs = _verdicts(
            _frame(spark),
            [
                ("between", "b", "n", 4, 5, 700_000),
                ("matches", "m", "s", "^[a-z]+$", 750_000),
            ],
        )
        assert vs["b"]["metric_e6"] == 750_000 and vs["b"]["passed"]
        # null s row fails the regex membership
        assert vs["m"]["metric_e6"] == 750_000 and vs["m"]["passed"]

    def test_satisfies_cross_column(self, spark):
        v = _verdicts(
            _frame(spark),
            [("satisfies", "x", "n = length(s)", 500_000)],
        )["x"]
        assert v["metric_e6"] == 750_000 and v["passed"]

    def test_mean_and_rowcount(self, spark):
        vs = _verdicts(
            _frame(spark),
            [
                ("mean_between", "mean", "n", 5 * E6, 6 * E6),
                ("row_count_between", "rc", 4, 4),
            ],
        )
        assert vs["mean"]["metric_e6"] == 23 * E6 // 4  # 5.75e6
        assert vs["mean"]["passed"]
        assert vs["rc"]["metric_e6"] == 4 and vs["rc"]["passed"]

    def test_empty_table_ratios_are_zero(self, spark):
        df = _frame(spark).where("id < 0")
        vs = _verdicts(
            df,
            [
                ("complete", "c", "s", E6),
                ("row_count_between", "rc", 1, 10),
            ],
        )
        assert vs["c"]["metric_e6"] == 0 and not vs["c"]["passed"]
        assert vs["rc"]["metric_e6"] == 0 and not vs["rc"]["passed"]

    def test_verdict_row_per_constraint_in_order(self, spark):
        names = [r["name"] for r in dq_check(
            _frame(spark),
            [("complete", "a", "s", 0), ("complete", "b", "lang", 0)],
        ).collect()]
        assert names == ["a", "b"]


class TestPlanShape:
    def test_single_scan_single_exchange(self, spark, tmp_path):
        """The whole suite must compile to ONE pass over the table:
        one parquet scan, partial/final agg (plus the distinct Expand),
        no join, no second scan."""
        p = str(tmp_path / "t")
        _frame(spark).write.parquet(p)
        df = dq_check(
            spark.read.parquet(p),
            [
                ("complete", "c", "s", E6),
                ("unique", "u", "id", E6),
                ("between", "b", "n", 1, 9, E6),
                ("mean_between", "m", "n", 0, 10 * E6),
                ("row_count_between", "rc", 1, 100),
            ],
        )
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # one scan node = one "Location:" detail line in formatted output
        assert plan.count("Location:") == 1
        assert "Join" not in plan
        assert df.count() == 5


def test_registry_suite_has_both_verdict_polarities(spark):
    from ocr_spark.queries_dq import DOC_CONSTRAINTS, q_dq_suite

    rows = q_dq_suite(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == len(DOC_CONSTRAINTS)
    passed = {r["name"]: r["passed"] for r in rows}
    assert passed["docid_unique"] and passed["lang_domain"]
    assert not passed["nchars_tight"]


class TestStreamingFold:
    def test_fold_equals_batch_any_slicing(self, spark):
        """SUM-folded per-slice counters == batch dq_check: the merge
        law, over an adversarial 3-way slicing."""
        from ocr_spark.operators.dq import (
            dq_check,
            dq_fold_verdicts,
            dq_partial_counts,
        )

        df = _frame(spark)
        cons = [
            ("complete", "c", "s", E6),
            ("between", "b", "n", 4, 5, 700_000),
            ("mean_between", "m", "n", 5 * E6, 6 * E6),
            ("row_count_between", "rc", 4, 4),
        ]
        slices = [
            df.where("id = 1"),
            df.where("id = 2"),
            df.where("id = 3"),
            df.where("id < 0"),  # an empty micro-batch
        ]
        counters = slices[0].sparkSession.createDataFrame(
            [r for s in slices for r in dq_partial_counts(s, cons).collect()]
        )
        folded = {
            r["name"]: r for r in dq_fold_verdicts(counters, cons).collect()
        }
        batch = {r["name"]: r for r in dq_check(df, cons).collect()}
        assert folded == batch

    def test_unique_rejected_up_front(self, spark):
        import pytest as _pytest

        from ocr_spark.operators.dq import dq_partial_counts

        with _pytest.raises(ValueError, match="not sum-mergeable"):
            dq_partial_counts(_frame(spark), [("unique", "u", "id", E6)])

    def test_stream_restart_does_not_double_count(self, spark, tmp_path):
        """Drain availableNow twice over the same checkpoint: replayed
        batches hit the manifest guard, counters stay single-counted."""
        from ocr_spark.streaming.incremental import (
            dq_stream_verdicts,
            incremental_dq,
        )

        df = _frame(spark)
        cons = [("row_count_between", "rc", 4, 4)]
        src = str(tmp_path / "src")
        df.repartition(2).write.parquet(src)
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        for _ in range(2):
            writer, _c = incremental_dq(
                spark, src, df.schema, out, ckpt, cons
            )
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
        v = dq_stream_verdicts(spark, out, cons).collect()[0]
        assert v["metric_e6"] == 4 and v["passed"]
