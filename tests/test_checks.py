"""End-to-end VerificationSuite tests (parity: VerificationSuiteTest.scala)."""

import pytest

from deequ_spark import (Check, CheckLevel, CheckStatus, ConstraintStatus,
                         DataTypeInstances, VerificationSuite)


class TestVerificationSuite:
    def test_success(self, df_missing):
        check = (Check(CheckLevel.ERROR, "basic")
                 .has_size(lambda n: n == 12)
                 .is_complete("item")
                 .has_completeness("att1", lambda v: v == 0.5)
                 .has_completeness("att2", lambda v: v == 0.75))
        result = VerificationSuite().on_data(df_missing).add_check(check).run()
        assert result.status == CheckStatus.SUCCESS

    def test_error_level(self, df_missing):
        check = (Check(CheckLevel.ERROR, "failing")
                 .is_complete("att1"))
        result = VerificationSuite().on_data(df_missing).add_check(check).run()
        assert result.status == CheckStatus.ERROR

    def test_warning_level(self, df_missing):
        check = Check(CheckLevel.WARNING, "warn").is_complete("att1")
        result = VerificationSuite().on_data(df_missing).add_check(check).run()
        assert result.status == CheckStatus.WARNING

    def test_max_severity_wins(self, df_missing):
        warn = Check(CheckLevel.WARNING, "w").is_complete("att1")
        err = Check(CheckLevel.ERROR, "e").is_complete("att2")
        ok = Check(CheckLevel.ERROR, "ok").is_complete("item")
        result = (VerificationSuite().on_data(df_missing)
                  .add_checks([warn, err, ok]).run())
        assert result.status == CheckStatus.ERROR
        assert result.check_results[ok].status == CheckStatus.SUCCESS

    def test_where_retrofit(self, df_numeric):
        check = (Check(CheckLevel.ERROR, "filtered")
                 .has_min("att1", lambda v: v == 4.0).where("item > 3"))
        result = VerificationSuite().on_data(df_numeric).add_check(check).run()
        assert result.status == CheckStatus.SUCCESS

    def test_numeric_constraints(self, df_numeric):
        check = (Check(CheckLevel.ERROR, "stats")
                 .has_min("att1", lambda v: v == 1.0)
                 .has_max("att1", lambda v: v == 6.0)
                 .has_mean("att1", lambda v: v == 3.5)
                 .has_sum("att1", lambda v: v == 21.0)
                 .is_non_negative("att1")
                 .is_less_than_or_equal_to("att2", "att1", lambda v: v < 1.0)
                 .has_correlation("att1", "att2", lambda v: v > 0.9))
        result = VerificationSuite().on_data(df_numeric).add_check(check).run()
        statuses = {str(cr.constraint): cr.status
                    for cr in result.check_results[check].constraint_results}
        assert result.status == CheckStatus.SUCCESS, statuses

    def test_uniqueness_constraints(self, df_unique):
        check = (Check(CheckLevel.ERROR, "uniq")
                 .is_unique("unique")
                 .is_primary_key("unique")
                 .has_uniqueness(("nonUnique",), lambda v: v == 0.5)
                 .has_distinctness(("unique",), lambda v: v == 1.0))
        result = VerificationSuite().on_data(df_unique).add_check(check).run()
        assert result.status == CheckStatus.SUCCESS

    def test_contained_in(self, df_full):
        ok = Check(CheckLevel.ERROR, "in").is_contained_in("att1", ["a", "b"])
        bad = Check(CheckLevel.ERROR, "notin").is_contained_in("att1", ["a"])
        result = VerificationSuite().on_data(df_full).add_checks([ok, bad]).run()
        assert result.check_results[ok].status == CheckStatus.SUCCESS
        assert result.check_results[bad].status == CheckStatus.ERROR

    def test_data_type(self, spark):
        df = spark.createDataFrame([("1",), ("2",)], "v string")
        check = (Check(CheckLevel.ERROR, "dt")
                 .has_data_type("v", DataTypeInstances.INTEGRAL))
        result = VerificationSuite().on_data(df).add_check(check).run()
        assert result.status == CheckStatus.SUCCESS

    def test_check_results_dataframe(self, spark, df_missing):
        check = Check(CheckLevel.ERROR, "df-out").is_complete("att1")
        result = VerificationSuite().on_data(df_missing).add_check(check).run()
        out = result.check_results_as_dataframe(spark)
        rows = out.collect()
        assert len(rows) == 1
        assert rows[0]["check_status"] == "Error"
        assert rows[0]["constraint_status"] == "Failure"

    def test_metrics_dataframe(self, spark, df_missing):
        check = Check(CheckLevel.ERROR, "m").is_complete("item").has_size(lambda n: n > 0)
        result = VerificationSuite().on_data(df_missing).add_check(check).run()
        metrics = {(r["name"], r["instance"]): r["value"]
                   for r in result.success_metrics_as_dataframe(spark).collect()}
        assert metrics[("Completeness", "item")] == 1.0
        assert metrics[("Size", "*")] == 12.0

    def test_row_level_results(self, df_numeric):
        check = (Check(CheckLevel.ERROR, "rows_ok")
                 .satisfies("att1 > 3", "att1 gt 3", lambda v: True))
        result = VerificationSuite().on_data(df_numeric).add_check(check).run()
        annotated = result.row_level_results_as_dataframe(df_numeric)
        flags = [r["rows_ok"] for r in annotated.orderBy("item").collect()]
        assert flags == [False, False, False, True, True, True]

    def test_precondition_failure_is_constraint_failure(self, df_full):
        check = Check(CheckLevel.ERROR, "pre").has_min("att1", lambda v: True)
        result = VerificationSuite().on_data(df_full).add_check(check).run()
        assert result.status == CheckStatus.ERROR


class TestStateMerge:
    def test_merge_equals_union(self, spark, df_numeric):
        """metric(merge(state(A), state(B))) == metric(state(A ∪ B))."""
        from deequ_spark import (Completeness, Correlation, Kurtosis, Maximum,
                                 Mean, Minimum, Size, Skewness,
                                 StandardDeviation, Sum, Variance)
        part_a = df_numeric.filter("item <= 3")
        part_b = df_numeric.filter("item > 3")
        analyzers = [Size(), Completeness("att1"), Minimum("att1"),
                     Maximum("att1"), Mean("att1"), Sum("att1"),
                     StandardDeviation("att1"), Variance("att1"),
                     Skewness("att2"), Kurtosis("att2"),
                     Correlation("att1", "att2")]
        for analyzer in analyzers:
            sa = analyzer.compute_state_from(part_a)
            sb = analyzer.compute_state_from(part_b)
            merged_metric = analyzer.compute_metric_from_state(sa.merge(sb))
            union_metric = analyzer.calculate(df_numeric)
            assert merged_metric.value == pytest.approx(union_metric.value), analyzer

    def test_frequencies_merge(self, spark, df_unique):
        from deequ_spark import Uniqueness
        analyzer = Uniqueness(("nonUnique",))
        part_a = df_unique.filter("unique <= 3")
        part_b = df_unique.filter("unique > 3")
        merged = analyzer.compute_state_from(part_a).merge(
            analyzer.compute_state_from(part_b))
        assert analyzer.compute_metric_from_state(merged).value == \
            analyzer.calculate(df_unique).value

    def test_hll_merge(self, spark, df_unique):
        from deequ_spark import ApproxCountDistinct
        analyzer = ApproxCountDistinct("unique")
        part_a = df_unique.filter("unique <= 3")
        part_b = df_unique.filter("unique > 3")
        merged = analyzer.compute_state_from(part_a).merge(
            analyzer.compute_state_from(part_b))
        assert analyzer.compute_metric_from_state(merged).value == 6.0
