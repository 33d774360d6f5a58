"""All-NULL-column semantics transcribed from the reference's
analyzers/NullHandlingTests.scala: which analyzers yield empty-state
FAILURES, which yield defined values, and how all-null rows group."""

import pytest

from deequ_spark import (ApproxCountDistinct, ApproxQuantile, Completeness,
                         Correlation, CountDistinct, DataType,
                         DuplicateRowCount, Entropy, InterquartileRange,
                         Kurtosis, Maximum, MaxLength, Mean, Minimum,
                         MinLength, MutualInformation, ColumnRange, Size,
                         Skewness, StandardDeviation, Sum, Variance)
from deequ_spark.analyzers.base import EmptyStateError


@pytest.fixture(scope="module")
def null_df(spark):
    """dataWithNullColumns (NullHandlingTests.scala:36-57)."""
    rows = [(None, None, None, float(i)) for i in range(1, 9)]
    return spark.createDataFrame(
        rows, "stringCol string, numericCol double, numericCol2 double, "
              "numericCol3 double")


def _assert_empty_state_failure(metric):
    assert not metric.is_success
    assert isinstance(metric.error, EmptyStateError)


class TestAllNullColumns:
    """NullHandlingTests.scala:60-141."""

    def test_defined_metrics(self, null_df):
        assert Size().calculate(null_df).value == 8.0
        assert Completeness("stringCol").calculate(null_df).value == 0.0
        assert CountDistinct(("stringCol",)).calculate(null_df).value == 0.0
        assert ApproxCountDistinct("stringCol").calculate(null_df).value == 0.0
        dist = DataType("stringCol").calculate(null_df).value
        assert dist.values["Unknown"].ratio == 1.0

    @pytest.mark.parametrize("analyzer", [
        Mean("numericCol"), StandardDeviation("numericCol"),
        Variance("numericCol"), Skewness("numericCol"),
        Kurtosis("numericCol"), Minimum("numericCol"), Maximum("numericCol"),
        ColumnRange("numericCol"), InterquartileRange("numericCol"),
        MinLength("stringCol"), MaxLength("stringCol"), Sum("numericCol"),
        ApproxQuantile("numericCol", 0.5), Entropy("stringCol"),
        MutualInformation(("numericCol", "numericCol2")),
        MutualInformation(("numericCol", "numericCol3")),
        Correlation("numericCol", "numericCol2"),
        Correlation("numericCol", "numericCol3"),
    ], ids=lambda a: f"{type(a).__name__}-{a.instance}")
    def test_empty_state_failures(self, analyzer, null_df):
        _assert_empty_state_failure(analyzer.calculate(null_df))

    def test_empty_states(self, null_df):
        assert Mean("numericCol").compute_state_from(null_df) is None
        assert Minimum("numericCol").compute_state_from(null_df) is None
        assert Sum("numericCol").compute_state_from(null_df) is None
        freq_state = CountDistinct(("stringCol",)).compute_state_from(null_df)
        assert freq_state is not None
        assert freq_state.num_rows == 0
        assert freq_state.frequencies.count() == 0


class TestDuplicateRowCountNulls:
    """NullHandlingTests.scala:163-186."""

    def test_all_null_rows_excluded(self, spark):
        df = spark.createDataFrame(
            [(None, None), (None, None), ("a", "b")],
            "col1 string, col2 string")
        m = DuplicateRowCount(("col1", "col2")).calculate(df)
        assert m.is_success and m.value == 0.0

    def test_partial_nulls_group_together(self, spark):
        df = spark.createDataFrame(
            [("a", None), ("a", None), ("b", "c")],
            "col1 string, col2 string")
        m = DuplicateRowCount(("col1", "col2")).calculate(df)
        assert m.is_success and m.value == 2.0
