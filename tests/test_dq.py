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
