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


class TestAnalysisBasedConstraintReferenceParity:
    """Transcribed from /root/reference/src/test/scala/com/amazon/deequ/
    constraints/AnalysisBasedConstraintTest.scala (line refs per test).
    The SampleAnalyzer stand-in is Completeness on the F4 fixture, whose
    metric value for a complete column is 1.0 — same shape as the
    reference's sample (1.0 iff the column exists)."""

    def _evaluate(self, constraint, df):
        from deequ_spark import do_analysis_run
        ctx = do_analysis_run(df, constraint.required_analyzers)
        return constraint.evaluate(ctx.metric_map)

    def test_assertion_on_metric_value(self, df_numeric):
        """:100-127 — success/failure/exact failure message."""
        from deequ_spark import Completeness
        from deequ_spark.constraints import (AnalysisBasedConstraint,
                                             ConstraintStatus)
        ok = self._evaluate(
            AnalysisBasedConstraint(Completeness("att1"), lambda v: v == 1.0),
            df_numeric)
        assert ok.status == ConstraintStatus.SUCCESS
        assert ok.message is None and ok.metric is not None

        bad = self._evaluate(
            AnalysisBasedConstraint(Completeness("att1"), lambda v: v != 1.0),
            df_numeric)
        assert bad.status == ConstraintStatus.FAILURE
        assert bad.message == \
            "Value: 1.0 does not meet the constraint requirement!"
        assert bad.metric is not None

        missing_col = self._evaluate(
            AnalysisBasedConstraint(Completeness("someMissingColumn"),
                                    lambda v: v == 1.0), df_numeric)
        assert missing_col.status == ConstraintStatus.FAILURE
        assert missing_col.metric is not None

    def test_value_picker_applied(self, df_numeric):
        """:129-148 — picker transforms the metric value before assert."""
        from deequ_spark import Completeness
        from deequ_spark.constraints import (AnalysisBasedConstraint,
                                             ConstraintStatus)
        doubler = lambda v: v * 2  # noqa: E731 — the reference valueDoubler
        assert self._evaluate(
            AnalysisBasedConstraint(Completeness("att1"), lambda v: v == 2.0,
                                    value_picker=doubler),
            df_numeric).status == ConstraintStatus.SUCCESS
        assert self._evaluate(
            AnalysisBasedConstraint(Completeness("att1"), lambda v: v != 2.0,
                                    value_picker=doubler),
            df_numeric).status == ConstraintStatus.FAILURE

    def test_missing_analysis_message(self, df_numeric):
        """:150-177 — evaluating against an empty metric map fails with
        the exact MissingAnalysis wording and NO metric."""
        from deequ_spark import Completeness
        from deequ_spark.constraints import (AnalysisBasedConstraint,
                                             ConstraintStatus)
        c = AnalysisBasedConstraint(Completeness("att1"), lambda v: v == 1.0)
        result = c.evaluate({})
        assert result.status == ConstraintStatus.FAILURE
        assert result.message == "Missing Analysis, can't run the constraint!"
        assert result.metric is None

    def test_problematic_value_picker_message(self, df_numeric):
        """:191-227 — a raising picker fails with the exact
        ProblematicMetricPicker wording and the metric still attached."""
        from deequ_spark import Completeness
        from deequ_spark.constraints import (AnalysisBasedConstraint,
                                             ConstraintStatus)

        def problematic(value):
            raise RuntimeError("Something wrong with this picker")

        c = AnalysisBasedConstraint(Completeness("att1"), lambda v: v == 1.0,
                                    value_picker=problematic)
        result = self._evaluate(c, df_numeric)
        assert result.status == ConstraintStatus.FAILURE
        assert result.message.startswith(
            "Can't retrieve the value to assert on")
        assert result.message.endswith("!")
        assert result.metric is not None
        # against an empty map the missing-analysis path wins (:220-225)
        empty = c.evaluate({})
        assert empty.message == "Missing Analysis, can't run the constraint!"
        assert empty.metric is None

    def test_hint_appended_to_failure(self, df_numeric):
        """:229-245 — hint text appends to the exact failure message."""
        from deequ_spark import Completeness
        from deequ_spark.constraints import (AnalysisBasedConstraint,
                                             ConstraintStatus)
        c = AnalysisBasedConstraint(Completeness("att1"), lambda v: v == 0.9,
                                    hint="Value should be like ...!")
        result = self._evaluate(c, df_numeric)
        assert result.status == ConstraintStatus.FAILURE
        assert result.message == ("Value: 1.0 does not meet the constraint "
                                  "requirement! Value should be like ...!")

    def test_throwing_assertion_message(self, df_numeric):
        """:247-262 — assertion exception message wrapped exactly."""
        from deequ_spark import Completeness
        from deequ_spark.constraints import (AnalysisBasedConstraint,
                                             ConstraintStatus)

        def failing(value):
            raise RuntimeError("-test-")

        result = self._evaluate(
            AnalysisBasedConstraint(Completeness("att1"), failing),
            df_numeric)
        assert result.status == ConstraintStatus.FAILURE
        assert result.message == "Can't execute the assertion: -test-!"
        assert result.metric is not None


class TestDataTypeConstraintReferenceParity:
    """Transcribed from ConstraintsTest.scala:280-300 — typed ratios
    exclude NULL rows from the denominator; Numeric = Fractional +
    Integral (Constraint.scala:1108-1132, 1178-1202)."""

    def _status(self, spark, rows, schema, dtype, assertion):
        from deequ_spark import (Check, CheckLevel, ConstrainableDataTypes,
                                 VerificationSuite)
        df = spark.createDataFrame(rows, schema)
        check = Check(CheckLevel.ERROR, "dt").has_data_type(
            "column", dtype, assertion)
        result = VerificationSuite().on_data(df).add_check(check).run()
        return list(result.check_results[check].constraint_results
                    )[0].status

    def test_fractional_double_column(self, spark):
        """:283-287 — native doubles are 100% Fractional."""
        from deequ_spark import ConstrainableDataTypes
        from deequ_spark.constraints import ConstraintStatus
        assert self._status(spark, [(1.0,), (2.0,)], "column double",
                            ConstrainableDataTypes.FRACTIONAL,
                            lambda v: v == 1.0) == ConstraintStatus.SUCCESS

    def test_fractional_string_column_half(self, spark):
        """:289-293 — ["1", "2.0"]: one Integral + one Fractional →
        Fractional ratio 0.5."""
        from deequ_spark import ConstrainableDataTypes
        from deequ_spark.constraints import ConstraintStatus
        assert self._status(spark, [("1",), ("2.0",)], "column string",
                            ConstrainableDataTypes.FRACTIONAL,
                            lambda v: v == 0.5) == ConstraintStatus.SUCCESS

    def test_numeric_sums_fractional_and_integral(self, spark):
        """:295-299 — Numeric over ["1", "2.0"] = 0.5 + 0.5 = 1.0."""
        from deequ_spark import ConstrainableDataTypes
        from deequ_spark.constraints import ConstraintStatus
        assert self._status(spark, [("1",), ("2.0",)], "column string",
                            ConstrainableDataTypes.NUMERIC,
                            lambda v: v == 1.0) == ConstraintStatus.SUCCESS

    def test_null_rows_excluded_from_typed_denominator(self, spark):
        """Constraint.scala:1178-1196 — ["1", "2", null]: Integral ratio
        is 2/2 = 1.0 (Unknown excluded), while NULL ratio is 1/3."""
        from deequ_spark import ConstrainableDataTypes
        from deequ_spark.constraints import ConstraintStatus
        rows = [("1",), ("2",), (None,)]
        assert self._status(spark, rows, "column string",
                            ConstrainableDataTypes.INTEGRAL,
                            lambda v: v == 1.0) == ConstraintStatus.SUCCESS
        assert self._status(spark, rows, "column string",
                            ConstrainableDataTypes.NULL,
                            lambda v: abs(v - 1 / 3) < 1e-12) == \
            ConstraintStatus.SUCCESS

    def test_absent_type_is_zero(self, spark):
        """ratioTypes: absolute == 0 → 0.0 (no division)."""
        from deequ_spark import ConstrainableDataTypes
        from deequ_spark.constraints import ConstraintStatus
        assert self._status(spark, [("abc",), ("def",)], "column string",
                            ConstrainableDataTypes.BOOLEAN,
                            lambda v: v == 0.0) == ConstraintStatus.SUCCESS


class TestAnalyzerContextReferenceParity:
    """Transcribed from /root/reference/src/test/scala/com/amazon/deequ/
    analyzers/runners/AnalyzerContextTest.scala over getDfFull
    (FixtureSupport:127-136)."""

    @pytest.fixture(scope="class")
    def results(self, spark):
        from deequ_spark import (Completeness, Distinctness, Histogram,
                                 Size, Uniqueness, do_analysis_run)
        df = spark.createDataFrame(
            [("1", "a", "c"), ("2", "a", "c"), ("3", "a", "c"),
             ("4", "b", "d")], "item string, att1 string, att2 string")
        return do_analysis_run(df, [
            Size(), Size(where="att2 == 'd'"), Distinctness(("item",)),
            Completeness("att1"), Uniqueness(("att1", "att2")),
            Histogram("att1")])

    EXPECTED = {
        ("Column", "att1", "Histogram.abs.a", 3.0),
        ("Dataset", "*", "Size", 4.0),
        ("Multicolumn", "att1,att2", "Uniqueness", 0.25),
        ("Column", "att1", "Histogram.bins", 2.0),
        ("Column", "att1", "Completeness", 1.0),
        ("Column", "item", "Distinctness", 1.0),
        ("Column", "att1", "Histogram.abs.b", 1.0),
        ("Column", "att1", "Histogram.ratio.a", 0.75),
        ("Dataset", "*", "Size (where: att2 == 'd')", 1.0),
        ("Column", "att1", "Histogram.ratio.b", 0.25),
    }

    def test_success_metrics_as_dataframe(self, spark, results):
        """:33-55 — flattened rows with the filtered Size decorated as
        'Size (where: ...)' (AnalyzerContext.scala:117-127)."""
        got = {tuple(r) for r in
               results.success_metrics_as_dataframe(spark).collect()}
        assert got == self.EXPECTED

    def test_restrict_to_requested_analyzers(self, spark, results):
        """:57-75."""
        from deequ_spark import Completeness, Uniqueness
        got = {tuple(r) for r in results.success_metrics_as_dataframe(
            spark, [Completeness("att1"),
                    Uniqueness(("att1", "att2"))]).collect()}
        assert got == {
            ("Column", "att1", "Completeness", 1.0),
            ("Multicolumn", "att1,att2", "Uniqueness", 0.25)}

    def test_success_metrics_as_json(self, results):
        """:77-101 — same rows through the JSON surface."""
        import json
        rows = json.loads(results.success_metrics_as_json())
        got = {(r["entity"], r["instance"], r["name"], r["value"])
               for r in rows}
        assert got == self.EXPECTED

    def test_json_restricted(self, results):
        """:103-121."""
        import json
        from deequ_spark import Completeness, Uniqueness
        rows = json.loads(results.success_metrics_as_json(
            [Completeness("att1"), Uniqueness(("att1", "att2"))]))
        assert {(r["entity"], r["instance"], r["name"], r["value"])
                for r in rows} == {
            ("Column", "att1", "Completeness", 1.0),
            ("Multicolumn", "att1,att2", "Uniqueness", 0.25)}


class TestVerificationResultReferenceParity:
    """Transcribed from /root/reference/src/test/scala/com/amazon/deequ/
    VerificationResultTest.scala:122-147 — the check-results DataFrame
    shape and exact failure messages (Size renders as Long)."""

    def test_check_results_dataframe_rows(self, spark):
        from deequ_spark import (Check, CheckLevel, VerificationSuite)
        df = spark.createDataFrame(
            [("1", "a", "c"), ("2", "a", "c"), ("3", "a", "c"),
             ("4", "b", "d")], "item string, att1 string, att2 string")
        c1 = Check(CheckLevel.ERROR, "group-1").is_complete("att1")
        c2 = (Check(CheckLevel.ERROR, "group-2-E")
              .has_size(lambda n: n > 5, hint="Should be greater than 5!")
              .is_complete("att2"))
        c3 = Check(CheckLevel.WARNING, "group-2-W").has_distinctness(
            ("item",), lambda v: v < 0.8, hint="Should be smaller than 0.8!")
        result = (VerificationSuite().on_data(df)
                  .add_check(c1).add_check(c2).add_check(c3).run())
        rows = {(r["check"], r["constraint_status"], r["constraint_message"])
                for r in result.check_results_as_dataframe(spark).collect()}
        # Size asserts on Long → "Value: 4", not "Value: 4.0"
        assert ("group-2-E", "Failure",
                "Value: 4 does not meet the constraint requirement! "
                "Should be greater than 5!") in rows
        assert ("group-2-W", "Failure",
                "Value: 1.0 does not meet the constraint requirement! "
                "Should be smaller than 0.8!") in rows
        assert ("group-1", "Success", "") in rows
        out = result.check_results_as_dataframe(spark)
        assert out.columns == ["check", "check_level", "check_status",
                               "constraint", "constraint_status",
                               "constraint_message"]
        levels = {r["check"]: (r["check_level"], r["check_status"])
                  for r in out.collect()}
        assert levels["group-1"] == ("Error", "Success")
        assert levels["group-2-E"] == ("Error", "Error")
        assert levels["group-2-W"] == ("Warning", "Warning")


class TestVerificationAggregateWith:
    """VerificationRunBuilder.aggregateWith parity
    (VerificationRunBuilder.scala:98-116): checks evaluate against the
    merged initial+delta states."""

    def test_check_sees_cumulative_size(self, spark):
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 InMemoryStateProvider, Size,
                                 VerificationSuite, do_analysis_run)
        initial = spark.createDataFrame([(i,) for i in range(8)], "v int")
        delta = spark.createDataFrame([(i,) for i in range(4)], "v int")
        prior = InMemoryStateProvider()
        do_analysis_run(initial, [Size()], save_states_with=prior)
        # 12 rows only exist across BOTH partitions
        check = Check(CheckLevel.ERROR, "cumulative").has_size(
            lambda n: n == 12)
        result = (VerificationSuite().on_data(delta).add_check(check)
                  .aggregate_with(prior).run())
        assert result.status == CheckStatus.SUCCESS
        # without the prior states the same check fails
        alone = VerificationSuite().on_data(delta).add_check(check).run()
        assert alone.status == CheckStatus.ERROR


class TestPartitionedTableIntegration:
    """Transcribed from /root/reference/src/test/scala/com/amazon/deequ/
    analyzers/PartitionedTableIntegrationTest.scala — verify each
    partition independently (saving states + per-partition metrics),
    then verify the WHOLE table scan-free from the merged states."""

    def test_partitioned_verification(self, spark, tmp_path):
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 FileSystemMetricsRepository,
                                 InMemoryStateProvider, ResultKey, Size,
                                 VerificationSuite)
        check = (Check(CheckLevel.ERROR, "table checks")
                 .is_complete("item")
                 .is_complete("origin")
                 .is_contained_in("marketplace", ["EU", "NA"])
                 .is_non_negative("sales"))
        part_a = spark.createDataFrame(
            [("item1", "DE", 10, "EU"), ("item2", "FR", 20, "EU"),
             ("item3", None, 5, "EU")],
            "item string, origin string, sales int, marketplace string")
        part_b = spark.createDataFrame(
            [("item4", "US", 3, "NA"), ("item5", "US", 14, "NA")],
            "item string, origin string, sales int, marketplace string")
        repo = FileSystemMetricsRepository(str(tmp_path / "metrics.json"))
        now = 1700000000
        states = []
        for name, data in (("partitionA", part_a), ("partitionB", part_b)):
            provider = InMemoryStateProvider()
            result = (VerificationSuite().on_data(data).add_check(check)
                      .save_states_with(provider)
                      .use_repository(repo)
                      .save_or_append_result(
                          ResultKey(now, {"target": name}))
                      .run())
            states.append(provider)
            # partitionA has a null origin → is_complete("origin") fails
            expected = (CheckStatus.ERROR if name == "partitionA"
                        else CheckStatus.SUCCESS)
            assert result.status == expected, name
        table_key = ResultKey(now, {"target": "table"})
        table_result = VerificationSuite.run_on_aggregated_states(
            part_a, checks=[check], state_loaders=states,
            metrics_repository=repo,
            save_or_append_results_with_key=table_key)
        # the union still carries the null origin
        assert table_result.status == CheckStatus.ERROR
        from deequ_spark import Completeness
        stored = repo.load_by_key(table_key).metric_map
        assert stored[Completeness("item")].value == 1.0
        # merged completeness of origin = 4 present / 5 rows
        assert stored[Completeness("origin")].value == pytest.approx(0.8)
        by_constraint = {str(cr.constraint): cr.status.value
                         for cr in table_result.check_results[check]
                         .constraint_results}
        assert any("origin" in k and v == "Failure"
                   for k, v in by_constraint.items())
        assert sum(1 for v in by_constraint.values()
                   if v == "Success") == 3


class TestMetricFlattenParity:
    """Transcribed from metrics/MetricsTests.scala:25-66."""

    def test_double_metric_flattens_to_itself(self):
        from deequ_spark.metrics import DoubleMetric, Entity
        ok = DoubleMetric(Entity.COLUMN, "metric-name", "instance-name", 50.0)
        assert ok.flattened == [ok]
        bad = DoubleMetric(Entity.COLUMN, "metric-name", "instance-name",
                           None, ValueError("x"))
        assert bad.flattened == [bad]

    def test_histogram_metric_flatten(self):
        from deequ_spark.metrics import (Distribution, DistributionValue,
                                         Entity, HistogramMetric)
        dist = Distribution({"a": DistributionValue(6, 0.6),
                             "b": DistributionValue(4, 0.4)}, 2)
        metric = HistogramMetric(Entity.COLUMN, "Histogram",
                                 "instance-name", dist)
        got = {(m.name, m.value) for m in metric.flattened}
        assert got == {("Histogram.bins", 2.0), ("Histogram.abs.a", 6.0),
                       ("Histogram.abs.b", 4.0), ("Histogram.ratio.a", 0.6),
                       ("Histogram.ratio.b", 0.4)}

    def test_histogram_metric_flatten_error(self):
        from deequ_spark.metrics import Entity, HistogramMetric
        exc = ValueError("boom")
        metric = HistogramMetric(Entity.COLUMN, "Histogram",
                                 "instance-name", None, exc)
        flat = metric.flattened
        assert len(flat) == 1
        assert flat[0].name == "Histogram.bins"
        assert not flat[0].is_success and flat[0].error is exc


class TestVerificationSuiteTail:
    """Remaining VerificationSuiteTest.scala behaviors."""

    def test_no_constraints_still_runs_analysis(self, spark):
        """:888-906 — required analyzers without any check: Success
        status, metrics computed."""
        from deequ_spark import (CheckStatus, Size, VerificationSuite)
        df = spark.createDataFrame(
            [("1", "a", "c"), ("2", "a", "c"), ("3", "a", "c"),
             ("4", "b", "d")], "item string, att1 string, att2 string")
        result = (VerificationSuite().on_data(df)
                  .add_required_analyzer(Size()).run())
        assert result.status == CheckStatus.SUCCESS
        rows = {tuple(r) for r in
                result.success_metrics_as_dataframe(spark).collect()}
        assert rows == {("Dataset", "*", "Size", 4.0)}

    def test_constraint_result_order_preserved(self, spark):
        """:1185-1212 — constraint_results keep the add order and pair
        1:1 with the check's constraints."""
        from deequ_spark import Check, CheckLevel, VerificationSuite
        df = spark.createDataFrame([(1,), (2,), (3,)], "att1 int")
        check = (Check(CheckLevel.ERROR, "check")
                 .is_complete("att1")
                 .satisfies("att1 > 0", "att1 is positive", lambda v: v == 1.0))
        result = VerificationSuite().on_data(df).add_check(check).run()
        crs = result.check_results[check].constraint_results
        names = [str(cr.constraint) for cr in crs]
        assert "Completeness" in names[0]
        assert "positive" in names[1] or "Compliance" in names[1]


class TestCustomSqlCheckParity:
    """Transcribed from checks/CustomSqlCheckTest.scala:28-80 — the
    CustomSQL metric reads Dataset.*.CustomSQL by default."""

    @pytest.fixture(scope="class")
    def df_cic(self, spark):
        rows = [("1", "a", "f"), ("2", "b", "d"), ("3", "a", None),
                ("4", "a", "f"), ("5", "b", None), ("6", "a", "f")]
        return spark.createDataFrame(rows,
                                     "item string, att1 string, att2 string")

    def test_succeeds_and_metric_identity(self, spark, df_cic):
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 VerificationSuite)
        check = Check(CheckLevel.ERROR, "custom-sql-test").custom_sql(
            "SELECT COUNT(*) FROM primary", lambda v: v == 6.0)
        result = VerificationSuite().on_data(df_cic).add_check(check).run()
        assert result.status == CheckStatus.SUCCESS
        rows = [tuple(r) for r in
                result.success_metrics_as_dataframe(spark).collect()
                if r["name"] == "CustomSQL"]
        assert rows == [("Dataset", "*", "CustomSQL", 6.0)]

    def test_fails_when_assertion_fails(self, df_cic):
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 VerificationSuite)
        check = Check(CheckLevel.ERROR, "custom-sql-test").custom_sql(
            "SELECT COUNT(*) FROM primary", lambda v: v > 10.0)
        assert (VerificationSuite().on_data(df_cic).add_check(check).run()
                .status == CheckStatus.ERROR)

    def test_complex_query(self, df_cic):
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 VerificationSuite)
        check = Check(CheckLevel.ERROR, "custom-sql-test").custom_sql(
            "SELECT COUNT(*) FROM primary WHERE att2 IS NOT NULL",
            lambda v: v == 4.0)
        assert (VerificationSuite().on_data(df_cic).add_check(check).run()
                .status == CheckStatus.SUCCESS)


class TestFromAnalyzerFromConstraint:
    """AnalysisBasedConstraintTest.scala:82-98 — convert any analyzer to
    a constraint and a constraint to a Check."""

    def test_convert_analyzer_to_check(self, spark, df_missing):
        from deequ_spark import (Check, CheckStatus, Completeness, Size,
                                 VerificationSuite)
        from deequ_spark.constraints import from_analyzer
        c1 = from_analyzer(Completeness("att1"), lambda d: d > 1)
        check1 = Check.from_constraint(c1, "Completeness att1")
        result = VerificationSuite().on_data(df_missing).add_check(check1).run()
        assert result.status == CheckStatus.ERROR  # completeness <= 1
        c2 = from_analyzer(Size(), lambda n: n > 0)
        check2 = Check.from_constraint(c2, "Size")
        ok = VerificationSuite().on_data(df_missing).add_check(check2).run()
        assert ok.status == CheckStatus.SUCCESS


class TestColumnConditionParity:
    """Behavioral transcription of checks/ColumnConditionTest.scala:26-38
    — isEachNotNull is the AND of per-column IS NOT NULL, isAnyNotNull
    the OR — via areComplete / areAnyComplete."""

    @pytest.fixture(scope="class")
    def df_cc(self, spark):
        rows = [("a", "x", "1"), ("b", None, "2"), (None, None, "3"),
                (None, None, None)]
        return spark.createDataFrame(rows,
                                     "att1 string, att2 string, att3 string")

    def test_are_complete_is_each_not_null(self, spark, df_cc):
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 VerificationSuite)
        # rows where ALL of (att1, att2) non-null: 1 of 4 → fails
        check = Check(CheckLevel.ERROR, "each").are_complete(
            ["att1", "att2"])
        result = VerificationSuite().on_data(df_cc).add_check(check).run()
        assert result.status == CheckStatus.ERROR
        ok = Check(CheckLevel.ERROR, "each3").are_complete(["att3"])
        res3 = (VerificationSuite()
                .on_data(df_cc.where("att3 IS NOT NULL"))
                .add_check(ok).run())
        assert res3.status == CheckStatus.SUCCESS

    def test_are_any_complete_is_any_not_null(self, spark, df_cc):
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 VerificationSuite)
        # rows where ANY of (att1, att3) non-null: 3 rows pass, last
        # all-null row fails the 1.0 assertion
        check = Check(CheckLevel.ERROR, "any").are_any_complete(
            ["att1", "att3"])
        result = VerificationSuite().on_data(df_cc).add_check(check).run()
        assert result.status == CheckStatus.ERROR
        sub = df_cc.where("att1 IS NOT NULL OR att3 IS NOT NULL")
        ok = Check(CheckLevel.ERROR, "any2").are_any_complete(
            ["att1", "att3"])
        assert (VerificationSuite().on_data(sub).add_check(ok).run()
                .status == CheckStatus.SUCCESS)


class TestFilterableCheckParity:
    """FilterableCheckTest.scala:31-64 'build correctly' — .where()
    retrofits onto the LAST constraint only, visible through
    required_analyzers()."""

    def test_build_correctly(self):
        from deequ_spark import Check, CheckLevel
        from deequ_spark.analyzers.scan import Completeness, Compliance
        check = (Check(CheckLevel.ERROR, "someCheck")
                 .is_complete("col1")
                 .is_complete("col2").where("marketplace = 'EU'")
                 .has_completeness("col3", lambda v: v >= 0.9)
                 .where("marketplace = 'NA'")
                 .satisfies("someCol > 5", "const1", columns=("someCol",))
                 .satisfies("someCol > 10", "const2", columns=("someCol",))
                 .where("marketplace = 'EU'"))
        completeness = sorted(
            [a for a in check.required_analyzers()
             if isinstance(a, Completeness)], key=lambda a: a.column)
        assert [a.where for a in completeness] == \
            [None, "marketplace = 'EU'", "marketplace = 'NA'"]
        compliance = sorted(
            [a for a in check.required_analyzers()
             if isinstance(a, Compliance)], key=lambda a: a.instance_name)
        assert [a.where for a in compliance] == [None, "marketplace = 'EU'"]


class TestFrequencyStateMerge:
    """StatesTest.scala:27-60 'merge correctly' — FrequenciesAndNumRows
    of two splits union-merge to the combined frequency table."""

    def test_merge(self, spark):
        from deequ_spark.analyzers.grouping import compute_frequencies
        da = spark.createDataFrame([("A",), ("A",), ("B",)], "att1 string")
        db = spark.createDataFrame([("A",), ("C",), ("C",)], "att1 string")
        merged = compute_frequencies(da, ["att1"]).merge(
            compute_frequencies(db, ["att1"]))
        freqs = {r["att1"]: r["absolute"]
                 for r in merged.frequencies.collect()}
        assert freqs == {"A": 3, "B": 1, "C": 2}
        assert merged.num_rows == 6


class TestVerificationSuiteRowLevelAggregation:
    """VerificationSuiteTest.scala:143-234 — the two remaining top-of-file
    fixtures: multi-constraint row-level aggregation (:143) and the
    7-check uniqueness battery over getDfWithUniqueColumns (:168)."""

    def test_aggregates_all_constraint_results(self, spark):
        """:143-166 — a check's row column is the AND of its constraint
        rows; column order is data columns then check columns."""
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 VerificationSuite)
        data = spark.createDataFrame(
            [("1", "a", "f"), ("2", "b", "d"), ("3", "a", None),
             ("4", "a", "f"), ("5", "b", None), ("6", "a", "f")],
            "item string, att1 string, att2 string")
        check = (Check(CheckLevel.ERROR, "rule1")
                 .is_complete("att1").is_complete("att2"))
        result = VerificationSuite().on_data(data).add_check(check).run()
        assert result.status == CheckStatus.ERROR
        rl = result.row_level_results_as_dataframe(data)
        assert rl.columns == ["item", "att1", "att2", "rule1"]
        got = [r["rule1"] for r in rl.orderBy("item").collect()]
        assert got == [True, True, False, True, False, True]

    def test_uniqueness_battery(self, spark):
        """:168-233 — hasUniqueness / isUnique / isPrimaryKey /
        hasUniqueValueRatio row-level truth over the uniqueness-spectrum
        fixture (FixtureSupport.scala:326-339)."""
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 VerificationSuite)
        data = spark.createDataFrame(
            [("1", "0", "3", "1", "5", "0"),
             ("2", "0", "3", "2", "6", "0"),
             ("3", "0", "3", None, "7", "0"),
             ("4", "5", None, "3", "0", "4"),
             ("5", "6", None, "4", "0", "5"),
             ("6", "7", None, "5", "0", "6")],
            "unique string, nonUnique string, nonUniqueWithNulls string, "
            "uniqueWithNulls string, onlyUniqueWithOtherNonUnique string, "
            "halfUniqueCombinedWithNonUnique string")
        is_one = lambda v: v == 1.0  # noqa: E731 — Check.IsOne
        checks = [
            Check(CheckLevel.ERROR, "rule1").has_uniqueness(
                ("nonUnique", "halfUniqueCombinedWithNonUnique"), is_one),
            Check(CheckLevel.ERROR, "rule2").has_uniqueness(
                ("nonUnique", "onlyUniqueWithOtherNonUnique"), is_one),
            Check(CheckLevel.ERROR, "rule3").has_uniqueness(
                ("unique", "nonUniqueWithNulls"), is_one),
            Check(CheckLevel.ERROR, "rule4").is_unique("unique"),
            Check(CheckLevel.ERROR, "rule5").is_unique("nonUnique"),
            Check(CheckLevel.ERROR, "rule6").is_primary_key(
                "uniqueWithNulls"),
            Check(CheckLevel.ERROR, "rule7").has_unique_value_ratio(
                ("nonUnique",), lambda v: v == 0.75),
        ]
        suite = VerificationSuite().on_data(data)
        for c in checks:
            suite = suite.add_check(c)
        result = suite.run()
        assert result.status == CheckStatus.ERROR
        rl = result.row_level_results_as_dataframe(data)
        assert set(rl.columns) == set(data.columns) | {
            f"rule{i}" for i in range(1, 8)}
        rows = rl.orderBy("unique").collect()
        expected = {
            "rule1": [False, False, False, True, True, True],
            "rule2": [True] * 6,
            "rule3": [True] * 6,
            "rule4": [True] * 6,
            "rule5": [False, False, False, True, True, True],
            # DELIBERATE divergence: the reference currently lets NULL
            # key rows pass isPrimaryKey row-level and carries a TODO
            # "fix how primaryKey works (nulls should be false)"
            # (VerificationSuiteTest.scala:227-229). We implement the
            # TO-BE behavior: a NULL primary-key row fails.
            "rule6": [True, True, False, True, True, True],
            "rule7": [False, False, False, True, True, True],
        }
        for rule, exp in expected.items():
            assert [r[rule] for r in rows] == exp, rule


class TestVerificationSuiteAnalysisConfig:
    """VerificationSuiteTest.scala:818-1013 — required analyzers merge
    into the checks' fused run; repository save/reuse/overwrite
    semantics."""

    @pytest.fixture()
    def df_full4(self, spark):
        return spark.createDataFrame(
            [("1", "a", "c"), ("2", "a", "c"), ("3", "a", "c"),
             ("4", "b", "d")], "item string, att1 string, att2 string")

    @pytest.fixture()
    def df_ci(self, spark):
        return spark.createDataFrame(
            [("1", "a", "f"), ("2", "b", "d"), ("3", "a", None),
             ("4", "a", "f"), ("5", "b", None), ("6", "a", "f")],
            "item string, att1 string, att2 string")

    def _success_rows(self, spark, result):
        from deequ_spark.runners.analysis_runner import AnalyzerContext
        ctx = AnalyzerContext(result.metrics.metric_map)
        return {tuple(r) for r in
                ctx.success_metrics_as_dataframe(spark).collect()}

    def test_mandatory_analysis(self, spark, df_full4):
        """:818-854 — exact success-metric rows incl. MutualInformation
        −(0.75·ln0.75 + 0.25·ln0.25)."""
        import math

        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 Completeness, MutualInformation, Size,
                                 Uniqueness, VerificationSuite)
        check = (Check(CheckLevel.ERROR, "group-1")
                 .is_complete("att1")
                 .has_completeness("att1", lambda v: v == 1.0))
        result = (VerificationSuite().on_data(df_full4).add_check(check)
                  .add_required_analyzers([
                      Size(), Completeness("att2"), Uniqueness(("att2",)),
                      MutualInformation(("att1", "att2"))]).run())
        assert result.status == CheckStatus.SUCCESS
        mi = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
        got = self._success_rows(spark, result)
        assert {("Dataset", "*", "Size", 4.0),
                ("Column", "att1", "Completeness", 1.0),
                ("Column", "att2", "Completeness", 1.0),
                ("Column", "att2", "Uniqueness", 0.25)} <= got
        (mi_row,) = [r for r in got if r[2] == "MutualInformation"]
        assert mi_row[3] == pytest.approx(mi)

    def test_mandatory_analysis_with_filters(self, spark, df_ci):
        """:856-886 — where-decorated metric names with the filter."""
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 VerificationSuite)
        c1 = (Check(CheckLevel.ERROR, "group-1")
              .has_completeness("att2", lambda v: v > 0.7)
              .where("att1 = 'a'"))
        c2 = (Check(CheckLevel.ERROR, "group-2")
              .is_unique("att1").where("item < 3"))
        result = (VerificationSuite().on_data(df_ci)
                  .add_check(c1).add_check(c2).run())
        assert result.status == CheckStatus.SUCCESS
        got = self._success_rows(spark, result)
        assert ("Column", "att2", "Completeness (where: att1 = 'a')",
                0.75) in got
        assert ("Column", "att1", "Uniqueness (where: item < 3)",
                1.0) in got

    def test_save_results_if_specified(self, spark, df_numeric):
        """:944-963 — saveOrAppendResult persists exactly the run's
        metrics."""
        from deequ_spark import (Completeness, InMemoryMetricsRepository,
                                 ResultKey, Size, VerificationSuite)
        repo = InMemoryMetricsRepository()
        key = ResultKey(0, {})
        result = (VerificationSuite().on_data(df_numeric)
                  .use_repository(repo)
                  .add_required_analyzers([Size(), Completeness("item")])
                  .save_or_append_result(key).run())
        loaded = repo.load_by_key(key)
        assert loaded is not None
        for a, m in result.metrics.metric_map.items():
            assert loaded.metric_map[a].value == m.value

    def test_conflicting_saved_value_overwritten(self, spark, df_numeric):
        """:989-1013 — saveOrAppendResult OVERWRITES a previously stored
        metric for the same analyzer under the same key."""
        from deequ_spark import (Completeness, InMemoryMetricsRepository,
                                 ResultKey, Size, VerificationSuite)
        from deequ_spark.metrics import DoubleMetric, Entity
        from deequ_spark.runners.analysis_runner import AnalyzerContext
        repo = InMemoryMetricsRepository()
        key = ResultKey(0, {})
        analyzers = [Size(), Completeness("item")]
        expected = (VerificationSuite().on_data(df_numeric)
                    .use_repository(repo)
                    .add_required_analyzers(analyzers).run())
        stale = AnalyzerContext()
        stale.metric_map[Size()] = DoubleMetric(Entity.DATASET, "", "",
                                                100.0)
        repo.save(key, stale)
        (VerificationSuite().on_data(df_numeric).use_repository(repo)
         .add_required_analyzers(analyzers)
         .save_or_append_result(key).run())
        loaded = repo.load_by_key(key)
        assert loaded.metric_map[Size()].value == \
            expected.metrics.metric_map[Size()].value == 6.0

    def test_reuse_existing_results(self, spark, df_numeric):
        """:908-942 (behavioral part) — metrics reused from the
        repository equal freshly computed ones."""
        from deequ_spark import (Distinctness, InMemoryMetricsRepository,
                                 ResultKey, Uniqueness, VerificationSuite)
        reused = Distinctness(("att1", "att2"))
        first = (VerificationSuite().on_data(df_numeric)
                 .add_required_analyzer(reused).run())
        repo = InMemoryMetricsRepository()
        key = ResultKey(0, {})
        from deequ_spark.runners.analysis_runner import AnalyzerContext
        repo.save(key, AnalyzerContext(first.metrics.metric_map))
        analyzers = [reused, Uniqueness(("att2", "item"))]
        second = (VerificationSuite().on_data(df_numeric)
                  .use_repository(repo)
                  .reuse_existing_results_for_key(key)
                  .add_required_analyzers(analyzers).run())
        vals = {type(a).__name__: m.value
                for a, m in second.metrics.metric_map.items()}
        assert vals["Distinctness"] == first.metrics.metric_map[reused].value
        assert "Uniqueness" in vals


class TestContainedInEscaping:
    """VerificationSuiteTest.scala:1391-1440 + :1633-1671 — isContainedIn
    must survive single quotes and the full special-character zoo in
    allowed values (SQL-injection-shaped strings escape correctly)."""

    SPECIAL = ("Trying !o include: @ll the #$peci@l charac%ers possib^e & "
               "test* that (out)~[here] {which} i`s great?\";")

    @pytest.fixture()
    def df_escape(self, spark):
        rows = [("'foo'", 50), ("Yes This's My Name", 29), ("It's foo", 33),
                ("foo", 22), ("foo '' name", 22), ("'''", 25), ("", 25),
                (self.SPECIAL, 25)]
        return spark.createDataFrame(rows, "name string, age int")

    def test_escape_characters(self, df_escape):
        """:1391-1440 — succeed on the full value list; empty and subset
        lists fail with the exact 0.125 message."""
        name_data = ["'foo'", "Yes This's My Name", "It's foo", "foo",
                     "foo '' name", "'''", "", self.SPECIAL]
        ok_name = (Check(CheckLevel.ERROR, "shouldSucceedForName")
                   .is_contained_in("name", name_data))
        ok_age = (Check(CheckLevel.ERROR, "shouldSucceedForAge")
                  .is_contained_in("age", ["22", "25", "29", "33", "50"]))
        fail_empty = (Check(CheckLevel.ERROR, "shouldFailForEmptyName")
                      .is_contained_in("name", []))
        fail_subset = (Check(CheckLevel.ERROR, "shouldFailForSubsetNameList")
                       .is_contained_in("name", [""]))
        result = (VerificationSuite().on_data(df_escape)
                  .add_checks([ok_name, ok_age, fail_empty, fail_subset])
                  .run())
        assert result.check_results[ok_name].status == CheckStatus.SUCCESS
        assert result.check_results[ok_age].status == CheckStatus.SUCCESS
        for bad in (fail_empty, fail_subset):
            cr = result.check_results[bad]
            assert cr.status == CheckStatus.ERROR
            assert cr.constraint_results[0].message == \
                "Value: 0.125 does not meet the constraint requirement!"

    def test_single_quotes(self, spark):
        """:1633-1671 — quoted variety values, metric exactly 1.0."""
        df = spark.createDataFrame(
            [("Versicolor",), ("Virginica's",), ("Setosa",),
             ("Versicolor",), ("Virginica's",)], "variety string")
        check = (Check(CheckLevel.ERROR, "single quote check")
                 .is_contained_in("variety",
                                  ["Versicolor", "Virginica's", "Setosa"]))
        result = VerificationSuite().on_data(df).add_check(check).run()
        assert result.status == CheckStatus.SUCCESS
        (cr,) = result.check_results[check].constraint_results
        assert cr.status == ConstraintStatus.SUCCESS
        assert cr.metric is not None and cr.metric.value == 1.0


class TestVerificationSuiteStateHooks:
    """VerificationSuiteTest.scala:1138-1183 — saveStatesWith persists
    the run's states (Sum 18, Completeness 6/6); aggregateWith doubles
    them against stored priors (Sum 36, Completeness 6/12 = 0.5)."""

    def test_save_states_with(self, df_numeric):
        """:1138-1159."""
        from deequ_spark import (Completeness, InMemoryStateProvider, Sum,
                                 VerificationSuite)
        provider = InMemoryStateProvider()
        (VerificationSuite().on_data(df_numeric)
         .add_required_analyzers([Sum("att2"), Completeness("att1")])
         .save_states_with(provider).run())
        assert provider.load(Sum("att2")).sum_value == 18.0
        cs = provider.load(Completeness("att1"))
        assert (cs.num_matches, cs.count) == (6, 6)

    def test_aggregate_with(self, df_numeric):
        """:1161-1183 — priors SumState(18) + NumMatchesAndCount(0, 6)."""
        from deequ_spark import (Completeness, InMemoryStateProvider, Sum,
                                 VerificationSuite)
        from deequ_spark.analyzers.base import NumMatchesAndCount, SumState
        prior = InMemoryStateProvider()
        prior.persist(Sum("att2"), SumState(18.0))
        prior.persist(Completeness("att1"), NumMatchesAndCount(0, 6))
        result = (VerificationSuite().on_data(df_numeric)
                  .add_required_analyzers([Sum("att2"),
                                           Completeness("att1")])
                  .aggregate_with(prior).run())
        metrics = {type(a).__name__: m.value
                   for a, m in result.metrics.metric_map.items()}
        assert metrics["Sum"] == 36.0
        assert metrics["Completeness"] == 0.5
