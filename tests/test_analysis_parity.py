"""AnalysisTest.scala transcriptions — the reference's oldest runner-level
test family (431 LoC): configured-analyzer result sets, dotted/case-variant
column resolution, exact basic statistics over getDfWithNumericValues, and
the exception taxonomy (NoSuchColumn / WrongColumnType / NoColumnsSpecified
/ NumberOfSpecifiedColumns / IllegalAnalyzerParameter / metric-calculation
wrap with scan-group isolation). Line refs per test."""

import pytest

from deequ_spark import (ApproxCountDistinct, ApproxQuantile, ColumnRange,
                         Completeness, CountDistinct, Distinctness,
                         InterquartileRange, Kurtosis, MaxLength, Maximum,
                         Mean, MinLength, Minimum, Size, Skewness,
                         StandardDeviation, Uniqueness, Variance,
                         do_analysis_run)
from deequ_spark.analyzers.base import (IllegalAnalyzerParameterError,
                                        NoSuchColumnError,
                                        WrongColumnTypeError)
from deequ_spark.analyzers.grouping import (Entropy, Histogram,
                                            MutualInformation)


@pytest.fixture(scope="module")
def df_full(spark):
    """FixtureSupport.getDfFull."""
    return spark.createDataFrame(
        [("1", "a", "c"), ("2", "a", "c"), ("3", "a", "c"), ("4", "b", "d")],
        "item string, att1 string, att2 string")


@pytest.fixture(scope="module")
def df_numeric_values(spark):
    """FixtureSupport.getDfWithNumericValues."""
    return spark.createDataFrame(
        [("1", 1, 0, 0, None), ("2", 2, 0, 0, None), ("3", 3, 0, 0, None),
         ("4", 4, 5, 4, 5.0), ("5", 5, 6, 6, 6.0), ("6", 6, 7, 7, 7.0)],
        "item string, att1 int, att2 int, att3 int, attNull double")


def _success_rows(ctx):
    return {(m.entity.value, m.instance, m.name, m.value)
            for m in ctx.metric_map.values() if m.is_success}


class TestConfiguredAnalyzers:
    """AnalysisTest.scala:37-105."""

    def test_results_for_configured_analyzers(self, df_full):
        """:37-63 — Size/Distinctness/Completeness/Uniqueness rows."""
        ctx = do_analysis_run(df_full, [
            Size(), Distinctness(("item",)), Completeness("att1"),
            Uniqueness(("att1", "att2"))])
        assert _success_rows(ctx) == {
            ("Dataset", "*", "Size", 4.0),
            ("Column", "item", "Distinctness", 1.0),
            ("Column", "att1", "Completeness", 1.0),
            ("Multicolumn", "att1,att2", "Uniqueness", 0.25)}

    def test_period_in_column_name(self, spark):
        """:65-86 — getDfWithPeriodInName; the analyzer takes the
        user-quoted name "`item.one`" verbatim and it becomes the metric
        instance."""
        df = spark.createDataFrame(
            [("1", "a", "c"), ("2", "a", "c"), ("3", "a", "c"),
             ("4", "b", "d")],
            ["item.one", "att1", "att2"])
        ctx = do_analysis_run(df, [
            Size(), Distinctness(("`item.one`",)), Completeness("att1"),
            Uniqueness(("att1", "att2"))])
        assert _success_rows(ctx) == {
            ("Dataset", "*", "Size", 4.0),
            ("Column", "`item.one`", "Distinctness", 1.0),
            ("Column", "att1", "Completeness", 1.0),
            ("Multicolumn", "att1,att2", "Uniqueness", 0.25)}

    def test_case_insensitive_columns(self, df_full, spark):
        """:88-113 — with spark.sql.caseSensitive=false (the default),
        upper-cased analyzer columns resolve and stay upper-cased in the
        metric instance."""
        assert spark.conf.get("spark.sql.caseSensitive",
                              "false").lower() == "false"
        ctx = do_analysis_run(df_full, [
            Size(), Distinctness(("ITEM",)), Completeness("ATT1"),
            Uniqueness(("ATT1", "ATT2"))])
        assert _success_rows(ctx) == {
            ("Dataset", "*", "Size", 4.0),
            ("Column", "ITEM", "Distinctness", 1.0),
            ("Column", "ATT1", "Completeness", 1.0),
            ("Multicolumn", "ATT1,ATT2", "Uniqueness", 0.25)}


class TestBasicStatistics:
    """AnalysisTest.scala:115-168 — exact values on att1 = 1..6."""

    def test_basic_statistics(self, df_numeric_values):
        analyzers = [Mean("att1"), StandardDeviation("att1"),
                     Variance("att1"), Skewness("att1"), Kurtosis("att1"),
                     Minimum("att1"), Maximum("att1"), ColumnRange("att1"),
                     InterquartileRange("att1"),
                     ApproxQuantile("att1", 0.5),
                     ApproxCountDistinct("att1"), CountDistinct(("att1",))]
        ctx = do_analysis_run(df_numeric_values, analyzers)
        metrics = list(ctx.metric_map.values())
        assert len(metrics) == len(analyzers)
        by_name = {m.name: m for m in metrics}
        assert by_name["Mean"].value == 3.5
        assert by_name["StandardDeviation"].value == \
            pytest.approx(1.707825127659933)
        assert by_name["Variance"].value == pytest.approx(2.9166666666666665)
        assert by_name["Range"].value == 5.0
        assert by_name["Skewness"].value == pytest.approx(0.0, abs=1e-12)
        assert (by_name["Minimum"].instance, by_name["Minimum"].value) == \
            ("att1", 1.0)
        assert (by_name["Maximum"].instance, by_name["Maximum"].value) == \
            ("att1", 6.0)
        assert by_name["ApproxCountDistinct"].value == 6.0
        assert by_name["CountDistinct"].value == 6.0
        # :139 — the quantile is embedded in the metric name
        assert by_name["ApproxQuantile-0.5"].value == 3.0

    def test_string_length_statistics(self, spark):
        """:170-199 — getDfWithVariableStringLengthValues: '' to 'dddd'."""
        df = spark.createDataFrame(
            [("",), ("a",), ("bb",), ("ccc",), ("dddd",)], "att1 string")
        ctx = do_analysis_run(df, [MaxLength("att1"), MinLength("att1")])
        by_name = {m.name: m for m in ctx.metric_map.values()}
        assert (by_name["MaxLength"].instance,
                by_name["MaxLength"].value) == ("att1", 4.0)
        assert (by_name["MinLength"].instance,
                by_name["MinLength"].value) == ("att1", 0.0)


class TestExceptionTaxonomy:
    """AnalysisTest.scala:201-282 — each mis-configuration yields a
    FAILURE METRIC of the matching exception type; the run never raises."""

    def test_non_existing_column(self, df_numeric_values):
        """:201-211."""
        a = Mean("nonExistingColumnName")
        m = do_analysis_run(df_numeric_values, [a]).metric_map[a]
        assert not m.is_success
        assert isinstance(m.error, NoSuchColumnError)

    def test_non_numeric_column(self, df_full):
        """:213-224."""
        a = Mean("att2")
        m = do_analysis_run(df_full, [a]).metric_map[a]
        assert not m.is_success
        assert isinstance(m.error, WrongColumnTypeError)

    def test_no_columns_specified(self, df_numeric_values):
        """:226-237 — Distinctness(Seq.empty)."""
        a = Distinctness(())
        m = do_analysis_run(df_numeric_values, [a]).metric_map[a]
        assert not m.is_success
        assert isinstance(m.error, ValueError)

    def test_wrong_number_of_columns(self, df_numeric_values):
        """:239-250 — MutualInformation over a single column."""
        a = MutualInformation(("att2",))
        m = do_analysis_run(df_numeric_values, [a]).metric_map[a]
        assert not m.is_success
        assert isinstance(m.error, ValueError)

    def test_histogram_too_many_bins(self, df_numeric_values):
        """:252-263 — maxDetailBins = Integer.MAX_VALUE."""
        a = Histogram("att2", max_detail_bins=2 ** 31 - 1)
        m = do_analysis_run(df_numeric_values, [a]).metric_map[a]
        assert not m.is_success
        assert isinstance(m.error, ValueError)

    def test_quantile_out_of_range(self, df_numeric_values):
        """:265-276 — ApproxQuantile("att2", 1.1)."""
        a = ApproxQuantile("att2", 1.1)
        m = do_analysis_run(df_numeric_values, [a]).metric_map[a]
        assert not m.is_success
        assert isinstance(m.error, IllegalAnalyzerParameterError)
        assert "closed interval [0, 1]" in str(m.error)
        assert "1.1" in str(m.error)

    def test_quantile_error_out_of_range(self, df_numeric_values):
        """:278-289 — relativeError = -0.1."""
        a = ApproxQuantile("att2", 0.5, -0.1)
        m = do_analysis_run(df_numeric_values, [a]).metric_map[a]
        assert not m.is_success
        assert isinstance(m.error, IllegalAnalyzerParameterError)
        assert "Relative error" in str(m.error)

    def test_metric_calculation_wraps_exception(self, df_numeric_values):
        """:291-311 — a throwing fromAggregationResult becomes that
        analyzer's failure metric."""
        class FailingMean(Mean):
            def from_aggregation_result(self, result, offset):
                raise ValueError("-test-mean-failing-")

        a = FailingMean("att1")
        m = do_analysis_run(df_numeric_values, [a]).metric_map[a]
        assert not m.is_success
        assert "-test-mean-failing-" in str(m.error)


class TestScanShareIsolation:
    """AnalysisTest.scala:313-365 'Scan-shareable Analysis'."""

    def test_state_failure_does_not_fail_siblings(self, df_numeric_values):
        """:315-340 — one bad fromAggregationResult; Min/Max survive."""
        class FailingMean(Mean):
            def from_aggregation_result(self, result, offset):
                raise ValueError("-test-mean-failing-")

        fm = FailingMean("att1")
        ctx = do_analysis_run(df_numeric_values,
                              [fm, Minimum("att1"), Maximum("att1")])
        assert not ctx.metric_map[fm].is_success
        assert ctx.metric_map[Minimum("att1")].value == 1.0
        assert ctx.metric_map[Maximum("att1")].value == 6.0

    def test_aggregation_failure_fails_group(self, df_numeric_values):
        """:342-365 — aggregationFunctions() raising fails every analyzer
        fused into the same scan."""
        class AggFailingMean(Mean):
            def aggregation_functions(self):
                raise ValueError("-test-agg-failing-")

        fm = AggFailingMean("att1")
        ctx = do_analysis_run(df_numeric_values,
                              [fm, Minimum("att1"), Maximum("att1")])
        assert not ctx.metric_map[fm].is_success
        assert not ctx.metric_map[Minimum("att1")].is_success
        assert not ctx.metric_map[Maximum("att1")].is_success


class TestGroupingAnalysisIsolation:
    """AnalysisTest.scala:367-427 'Grouping Analysis'."""

    def test_state_failure_does_not_fail_siblings(self, df_numeric_values):
        """:369-396 — a throwing second-stage leaves Entropy/Uniqueness
        intact on the shared frequency table."""
        class FailingDistinctness(Distinctness):
            def value_from(self, result, offset, num_rows):
                raise ValueError("-test-distinctness-failing-")

            def compute_metric_from_state(self, state):
                raise ValueError("-test-distinctness-failing-")

        fd = FailingDistinctness(("att1",))
        ctx = do_analysis_run(df_numeric_values,
                              [fd, Entropy("att1"), Uniqueness(("att1",))])
        assert not ctx.metric_map[fd].is_success
        assert ctx.metric_map[Uniqueness(("att1",))].value == 1.0
        assert ctx.metric_map[Entropy("att1")].is_success

    def test_aggregation_failure_fails_group(self, df_numeric_values):
        """:398-427 — aggregationFunctions() raising fails all fused
        grouping analyzers."""
        class AggFailingDistinctness(Distinctness):
            def aggregation_functions(self):
                raise ValueError("-test-agg-failing-")

        fd = AggFailingDistinctness(("att1",))
        ctx = do_analysis_run(df_numeric_values,
                              [fd, Entropy("att1"), Uniqueness(("att1",))])
        assert not ctx.metric_map[fd].is_success
        assert not ctx.metric_map[Entropy("att1")].is_success
        assert not ctx.metric_map[Uniqueness(("att1",))].is_success
