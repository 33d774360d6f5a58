"""Per-analyzer fixture sweep (VERDICT r6 #8): transcriptions of the
reference's per-analyzer test files whose assertions were not yet
mirrored by our suite — RangeTest.scala, VarianceTest.scala,
SkewnessTest.scala, KurtosisTest.scala, ZerosCountTest.scala,
InterquartileRangeTest.scala, DuplicateRowCountTest.scala,
MinimumTest/MaximumTest/CompletenessTest (where-filters-all-rows
fixtures). Line refs per test. Row-level truth tables for these
analyzers live in tests/test_reference_parity.py; all-null behavior in
test_null_handling_parity.py; generic state merges in
test_state_aggregation_parity.py — this file pins the VALUE fixtures,
type coverage, and the distinctive merge/edge cases."""

from decimal import Decimal

import pytest

from deequ_spark import (ColumnRange, DuplicateRowCount,
                         InterquartileRange, Kurtosis, Maximum, Minimum,
                         Skewness, StandardDeviation, Variance, ZerosCount,
                         do_analysis_run)
from deequ_spark.analyzers.base import EmptyStateError


@pytest.fixture(scope="module")
def df_numeric_values(spark):
    """FixtureSupport.getDfWithNumericValues: item 1..6, att1 1..6,
    att2 [0,0,0,5,6,7], att3 [0,0,0,4,6,7], attNull [null×3,5,6,7]."""
    return spark.createDataFrame(
        [("1", 1, 0, 0, None), ("2", 2, 0, 0, None), ("3", 3, 0, 0, None),
         ("4", 4, 5, 4, 5.0), ("5", 5, 6, 6, 6.0), ("6", 6, 7, 7, 7.0)],
        "item string, att1 int, att2 int, att3 int, attNull double")


@pytest.fixture(scope="module")
def df_full(spark):
    """FixtureSupport.getDfFull — att1 is a STRING column."""
    return spark.createDataFrame(
        [("1", "a", "c"), ("2", "a", "c"), ("3", "a", "c"), ("4", "b", "d")],
        "item string, att1 string, att2 string")


def calc(df, analyzer):
    return do_analysis_run(df, [analyzer]).metric_map[analyzer]


def value(df, analyzer):
    m = calc(df, analyzer)
    assert m.is_success, m.error
    return m.value


class TestRangeParity:
    """RangeTest.scala (line refs per case)."""

    def test_numeric_value(self, df_numeric_values):
        """:34-39 — att1 1..6 → range 5."""
        assert value(df_numeric_values, ColumnRange("att1")) == 5.0

    def test_equals_max_minus_min(self, df_numeric_values):
        """:41-47."""
        mn = value(df_numeric_values, Minimum("att1"))
        mx = value(df_numeric_values, Maximum("att1"))
        assert value(df_numeric_values, ColumnRange("att1")) == mx - mn

    def test_non_numeric_fails(self, df_full):
        """:49-52."""
        assert not calc(df_full, ColumnRange("att1")).is_success

    def test_where_clause(self, df_numeric_values):
        """:54-59 — item != '6' → 1..5 → range 4."""
        assert value(df_numeric_values,
                     ColumnRange("att1", where="item != '6'")) == 4.0

    def test_all_null_is_empty_state(self, spark):
        """:61-69 — all-null column → failure (None state)."""
        df = spark.createDataFrame([(None,)] * 3, "value double")
        m = calc(df, ColumnRange("value"))
        assert not m.is_success and isinstance(m.error, EmptyStateError)

    @pytest.mark.parametrize("rows,schema,expected", [
        ([(42.0,)], "value double", 0.0),                     # :71-75
        ([(5.0,), (5.0,), (5.0,), (5.0,)], "value double", 0.0),  # :77-81
        ([(1.0,), (None,), (3.0,), (None,), (5.0,)], "value double",
         4.0),                                                # :83-92
        ([(1.0,), (2.0,), (3.0,)], "value double", 2.0),      # :94-98
        ([(1,), (2,), (3,)], "value long", 2.0),              # :100-104
        ([(1.0,), (2.0,), (3.0,)], "value float", 2.0),       # :106-111
        ([(Decimal("1.00"),), (Decimal("2.00"),), (Decimal("3.00"),)],
         "value decimal(10,2)", 2.0),                         # :113-122
    ])
    def test_values_and_types(self, spark, rows, schema, expected):
        df = spark.createDataFrame(rows, schema)
        assert value(df, ColumnRange("value")) == expected

    def test_metric_metadata(self, df_numeric_values):
        """:124-131."""
        m = calc(df_numeric_values, ColumnRange("att1"))
        assert (m.entity.value, m.name, m.instance) == \
            ("Column", "Range", "att1")

    def test_merge_states(self, spark, df_numeric_values):
        """:133-156 — half states merge to the overall metric."""
        from deequ_spark import InMemoryStateProvider
        from deequ_spark.runners.analysis_runner import \
            run_on_aggregated_states
        a = ColumnRange("att1")
        overall = value(df_numeric_values, a)
        h1 = df_numeric_values.where("item <= '3'")
        h2 = df_numeric_values.where("item > '3'")
        s1, s2 = InMemoryStateProvider(), InMemoryStateProvider()
        do_analysis_run(h1, [a], save_states_with=s1)
        do_analysis_run(h2, [a], save_states_with=s2)
        merged = run_on_aggregated_states(df_numeric_values, [a], [s1, s2])
        assert merged.metric_map[a].value == overall


class TestVarianceParity:
    """VarianceTest.scala."""

    def test_numeric_value(self, df_numeric_values):
        """:34-38 — population variance of 1..6."""
        assert value(df_numeric_values, Variance("att1")) == \
            pytest.approx(2.9166666666666665)

    def test_equals_stddev_squared(self, df_numeric_values):
        """:40-45."""
        sd = value(df_numeric_values, StandardDeviation("att1"))
        assert value(df_numeric_values, Variance("att1")) == \
            pytest.approx(sd * sd, abs=1e-10)

    def test_non_numeric_fails(self, df_full):
        """:47-50."""
        assert not calc(df_full, Variance("att1")).is_success

    @pytest.mark.parametrize("rows,schema,expected", [
        ([(42.0,)], "value double", 0.0),                      # :68-72
        ([(5.0,)] * 4, "value double", 0.0),                   # :74-78
        ([(1.0,), (None,), (3.0,), (None,), (5.0,)], "value double",
         8.0 / 3.0),                                           # :80-89
        ([(1.0,), (2.0,), (3.0,)], "value double", 2.0 / 3.0),  # :91-97
    ])
    def test_values(self, spark, rows, schema, expected):
        assert value(spark.createDataFrame(rows, schema),
                     Variance("value")) == pytest.approx(expected)

    def test_all_null_fails(self, spark):
        """:58-66."""
        df = spark.createDataFrame([(None,)] * 3, "value double")
        assert not calc(df, Variance("value")).is_success


class TestSkewnessParity:
    """SkewnessTest.scala."""

    def test_symmetric_is_zero(self, df_numeric_values):
        """:34-39 — 1..6 symmetric around 3.5."""
        assert value(df_numeric_values, Skewness("att1")) == 0.0

    def test_right_skew_positive(self, spark):
        """:41-47 — [1,1,1,1,10] → exactly 1.5."""
        df = spark.createDataFrame([(1.0,)] * 4 + [(10.0,)], "value double")
        assert value(df, Skewness("value")) == pytest.approx(1.5, abs=1e-10)

    def test_left_skew_negative(self, spark):
        """:49-55 — [1,10,10,10,10] → exactly −1.5."""
        df = spark.createDataFrame([(1.0,)] + [(10.0,)] * 4, "value double")
        assert value(df, Skewness("value")) == pytest.approx(-1.5,
                                                             abs=1e-10)

    def test_non_numeric_fails(self, df_full):
        """:57-60."""
        assert not calc(df_full, Skewness("att1")).is_success

    def test_identical_values_zero(self, spark):
        """:79-83 — all identical → 0.0 (Skewness.scala:36-40), NOT an
        error."""
        df = spark.createDataFrame([(5.0,)] * 4, "value double")
        assert value(df, Skewness("value")) == 0.0

    def test_long_type_zero(self, spark):
        """:85-89."""
        df = spark.createDataFrame([(i,) for i in range(1, 7)],
                                   "value long")
        assert value(df, Skewness("value")) == 0.0

    def test_metadata(self, df_numeric_values):
        """:102-109."""
        m = calc(df_numeric_values, Skewness("att1"))
        assert (m.entity.value, m.name, m.instance) == \
            ("Column", "Skewness", "att1")


class TestKurtosisParity:
    """KurtosisTest.scala."""

    def test_uniform_platykurtic(self, df_numeric_values):
        """:34-41 — 1..6 → excess kurtosis −1.2685714285714285."""
        assert value(df_numeric_values, Kurtosis("att1")) == \
            pytest.approx(-1.2685714285714285, abs=1e-10)

    def test_identical_values_zero(self, spark):
        """:43-47 — all identical → 0.0 (Kurtosis.scala:36-39)."""
        df = spark.createDataFrame([(5.0,)] * 4, "value double")
        assert value(df, Kurtosis("value")) == 0.0

    def test_non_numeric_fails(self, df_full):
        """:49-52."""
        assert not calc(df_full, Kurtosis("att1")).is_success

    def test_long_type_negative(self, spark):
        """:73-78."""
        df = spark.createDataFrame([(i,) for i in range(1, 7)],
                                   "value long")
        assert value(df, Kurtosis("value")) < 0.0


class TestZerosCountParity:
    """ZerosCountTest.scala."""

    def test_counts_zeros(self, df_numeric_values):
        """:34-39 — att2 [0,0,0,5,6,7] → 3."""
        assert value(df_numeric_values, ZerosCount("att2")) == 3.0

    def test_no_zeros(self, df_numeric_values):
        """:41-46."""
        assert value(df_numeric_values, ZerosCount("att1")) == 0.0

    def test_where_clause(self, df_numeric_values):
        """:59-64 — item != '1' drops one zero → 2."""
        assert value(df_numeric_values,
                     ZerosCount("att2", where="item != '1'")) == 2.0

    def test_non_numeric_fails(self, df_full):
        """:54-57."""
        assert not calc(df_full, ZerosCount("att1")).is_success

    @pytest.mark.parametrize("rows,schema,expected", [
        ([(0.0,), (0.0,), (0.0,)], "value double", 3.0),       # :48-52
        ([(0.0,), (None,), (0.0,), (None,), (5.0,)], "value double",
         2.0),                                                 # :66-74
        ([(None,)] * 3, "value double", 0.0),                  # :76-84
        ([(0,), (1,), (0,), (2,), (0,)], "value int", 3.0),    # :86-90
        ([(0,), (1,), (0,)], "value long", 2.0),               # :92-96
        ([(0.0,), (1.0,), (0.0,)], "value float", 2.0),        # :98-103
        ([(Decimal("0.00"),), (Decimal("1.00"),), (Decimal("0.00"),)],
         "value decimal(10,2)", 2.0),                          # :105-114
    ])
    def test_values_and_types(self, spark, rows, schema, expected):
        assert value(spark.createDataFrame(rows, schema),
                     ZerosCount("value")) == expected


class TestInterquartileRangeParity:
    """InterquartileRangeTest.scala."""

    def test_numeric_value(self, df_numeric_values):
        """:32-39 — 1..6: Q1=2.25, Q3=4.75 → IQR 2.5."""
        assert value(df_numeric_values, InterquartileRange("att1")) == 2.5

    def test_q3_minus_q1(self, spark):
        """:40-47 — [1,3,5,7,9]: Q1=3, Q3=7 → 4."""
        df = spark.createDataFrame([(v,) for v in (1.0, 3.0, 5.0, 7.0,
                                                   9.0)], "value double")
        assert value(df, InterquartileRange("value")) == 4.0

    def test_non_numeric_fails(self, df_full):
        """:48-53."""
        assert not calc(df_full, InterquartileRange("att1")).is_success

    @pytest.mark.parametrize("rows,schema,expected", [
        ([(42.0,)], "value double", 0.0),                      # :74-80
        ([(5.0,)] * 4, "value double", 0.0),                   # :82-87
        ([(i,) for i in range(1, 7)], "value long", 2.5),      # :89-94
    ])
    def test_values(self, spark, rows, schema, expected):
        assert value(spark.createDataFrame(rows, schema),
                     InterquartileRange("value")) == expected


class TestDuplicateRowCountParity:
    """DuplicateRowCountTest.scala."""

    @pytest.mark.parametrize("rows,cols,expected", [
        ([("a", 1), ("b", 2), ("a", 1), ("c", 3), ("a", 1)],
         ("col1", "col2"), 3.0),                               # :31-40
        ([("a", 1), ("b", 2), ("c", 3)], ("col1", "col2"), 0.0),  # :41-48
        ([("a", 1), ("a", 1), ("a", 1)], ("col1", "col2"), 3.0),  # :50-57
        ([("a", 1)], ("col1", "col2"), 0.0),                   # :59-64
        ([("a", 1), ("b", 2), ("a", 1), ("b", 2), ("c", 3)],
         ("col1", "col2"), 4.0),                               # :66-74
        ([("a", 1), ("a", None), ("a", None)],
         ("col1", "col2"), 2.0),   # :76-86 NULLs equal for grouping
        ([(None, None), (None, None), ("a", 1)],
         ("col1", "col2"), 0.0),   # :88-98 all-null rows excluded
        ([("a", 1), ("b", 2), ("a", 1), ("c", 3)], (), 2.0),
        # :131-139 empty columns = all columns
    ])
    def test_counts(self, spark, rows, cols, expected):
        df = spark.createDataFrame(rows, "col1 string, col2 int")
        assert value(df, DuplicateRowCount(cols)) == expected

    def test_subset_of_columns(self, spark):
        """:100-108."""
        df = spark.createDataFrame(
            [("a", 1, "x"), ("a", 2, "y"), ("b", 3, "z")],
            "col1 string, col2 int, col3 string")
        assert value(df, DuplicateRowCount(("col1",))) == 2.0

    def test_where_clause(self, spark):
        """:110-119 + :121-129."""
        df = spark.createDataFrame(
            [("a", 1, "active"), ("a", 1, "inactive"), ("a", 1, "active"),
             ("b", 2, "active")], "col1 string, col2 int, status string")
        cols = ("col1", "col2", "status")
        assert value(df, DuplicateRowCount(
            cols, where="status = 'active'")) == 2.0
        assert value(df, DuplicateRowCount(
            cols, where="status = 'nonexistent'")) == 0.0

    def test_empty_dataframe(self, spark):
        """:141-152."""
        df = spark.createDataFrame([], "col1 string, col2 int")
        assert value(df, DuplicateRowCount(("col1", "col2"))) == 0.0

    def test_merge_across_partitions(self, spark):
        """:154-186 — a group unique per partition becomes a duplicate
        after the state merge; overlapping groups sum their counts."""
        from deequ_spark import InMemoryStateProvider
        from deequ_spark.runners.analysis_runner import \
            run_on_aggregated_states
        a = DuplicateRowCount(("col1", "col2"))
        schema = "col1 string, col2 int"
        for rows_a, rows_b, expected in [
            ([("a", 1), ("b", 2)], [("a", 1), ("c", 3)], 2.0),
            ([("a", 1), ("a", 1), ("b", 2)], [("a", 1), ("c", 3)], 3.0),
        ]:
            s1, s2 = InMemoryStateProvider(), InMemoryStateProvider()
            dfa = spark.createDataFrame(rows_a, schema)
            do_analysis_run(dfa, [a], save_states_with=s1)
            do_analysis_run(spark.createDataFrame(rows_b, schema), [a],
                            save_states_with=s2)
            merged = run_on_aggregated_states(dfa, [a], [s1, s2])
            assert merged.metric_map[a].value == expected

    def test_row_level_through_verification(self, spark):
        """:188-229 — hasDuplicateRowCount passes at == 2; row-level:
        duplicate rows false, unique rows true; empty columns resolve to
        all columns."""
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 VerificationSuite)
        df = spark.createDataFrame([("a", 1), ("b", 2), ("a", 1),
                                    ("c", 3)], "col1 string, col2 int")
        result = (VerificationSuite().on_data(df)
                  .add_check(Check(CheckLevel.ERROR, "dup-check")
                             .has_duplicate_row_count(("col1", "col2"),
                                                      lambda v: v == 2))
                  .run())
        assert result.status == CheckStatus.SUCCESS
        rl = result.row_level_results_as_dataframe(df)
        flags = {(r["col1"]): r["dup-check"] for r in rl.collect()}
        assert flags == {"a": False, "b": True, "c": True}
        result2 = (VerificationSuite().on_data(df)
                   .add_check(Check(CheckLevel.ERROR, "dup-empty-cols")
                              .has_duplicate_row_count((),
                                                       lambda v: v == 2))
                   .run())
        assert result2.status == CheckStatus.SUCCESS


class TestWhereFiltersAllRows:
    """MinimumTest.scala:63-75 / MaximumTest.scala:63-75 /
    CompletenessTest.scala:74-85 — a where clause that filters ALL rows
    yields a FAILURE metric (0/0 state) for Minimum, Maximum and
    Completeness alike."""

    def test_minimum_maximum_fail_empty(self, df_numeric_values):
        for a in (Minimum("att1", where="att1 > 100"),
                  Maximum("att1", where="att1 > 100")):
            m = calc(df_numeric_values, a)
            assert not m.is_success
            assert isinstance(m.error, EmptyStateError)

    def test_completeness_fails_empty(self, df_numeric_values):
        from deequ_spark import Completeness
        m = calc(df_numeric_values, Completeness("att1",
                                                 where="att1 > 100"))
        assert not m.is_success


class TestDistinctnessVsCountDistinct:
    """DistinctnessTest.scala:39-83 — the two analyzers disagree on
    NULLs: Distinctness excludes the null group (3 non-null distinct / 5
    non-null rows = 0.6) while hasNumberOfDistinctValues counts the
    NullValue histogram bin (4 bins); in distinct-value mode the
    histogram's 'ratio' carries the ABSOLUTE frequency."""

    @pytest.fixture(scope="class")
    def df_distinct(self, spark):
        return spark.createDataFrame(
            [("a", None), ("a", None), (None, "x"), ("b", "x"),
             ("b", "x"), ("c", "y")], "att1 string, att2 string")

    def test_null_behaviors_differ(self, df_distinct):
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 VerificationSuite)
        result = (VerificationSuite().on_data(df_distinct.select("att1"))
                  .add_check(Check(CheckLevel.ERROR, "d1").has_distinctness(
                      ("att1",), lambda v: abs(v - 0.6) < 0.01))
                  .add_check(Check(CheckLevel.ERROR, "d2")
                             .has_number_of_distinct_values(
                                 "att1", lambda v: v == 4))
                  .run())
        assert result.status == CheckStatus.SUCCESS

    def test_distinct_value_count_histogram(self, df_distinct):
        """:60-83 — the backing HistogramMetric carries absolute
        frequencies in the ratio slot, with the NullValue bin present."""
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 VerificationSuite)
        result = (VerificationSuite().on_data(df_distinct)
                  .add_check(Check(CheckLevel.ERROR, "d1")
                             .has_number_of_distinct_values(
                                 "att1", lambda v: v == 4.0))
                  .run())
        assert result.status == CheckStatus.SUCCESS
        (metric,) = list(result.metrics.metric_map.values())
        dist = {k: v.ratio for k, v in metric.value.values.items()}
        assert dist == {"a": 2.0, "b": 2.0, "c": 1.0, "NullValue": 1.0}


class TestColumnCountParity:
    """ColumnCountTest.scala:31-44 — column count of the 5-column
    string fixture, via state and via metric."""

    def test_column_count(self, spark):
        from deequ_spark.analyzers.scan import ColumnCount
        df = spark.createDataFrame(
            [("a", "b", "c", "d", "e")],
            "`Address Line 1` string, `Address Line 2` string, "
            "`Address Line 3` string, city string, state string")
        a = ColumnCount()
        m = calc(df, a)
        assert m.is_success and m.value == 5.0


# ---------------------------------------------------------------------------
# ComplianceTest.scala — fullColumn row-level truth tables, transcribed
# case-for-case (line refs per test). The reference asserts on
# metric.fullColumn selected against the input df; our equivalent surface
# is Compliance.row_level_results().
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def df_nationality(spark):
    """ComplianceTest.scala:76-84 inline fixture (NULL in where column)."""
    return spark.createDataFrame(
        [("1", "USA", "AUS"), ("2", "GER", "AUS"), ("3", "USA", None),
         ("4", "GER", None), ("5", "USA", "USA")],
        "item string, championnationality string, runnerupnationality string")


def _row_level(df, analyzer, order="item"):
    rows = (df.withColumn("new", analyzer.row_level_results())
            .orderBy(order).collect())
    return [r["new"] for r in rows]


class TestComplianceFullColumnParity:
    """ComplianceTest.scala:27-235 (every case in the file)."""

    def _mk(self, **kw):
        from deequ_spark import Compliance
        return Compliance(**kw)

    def test_row_level_for_columns(self, df_numeric_values):
        """:28-37 — att1 > 3."""
        a = self._mk(instance_name="rule1", predicate="att1 > 3",
                     columns=("att1",))
        assert _row_level(df_numeric_values, a) == \
            [False, False, False, True, True, True]

    def test_row_level_for_null_columns(self, df_numeric_values):
        """:39-48 — attNull > 3: three-valued SQL keeps NULL rows NULL."""
        a = self._mk(instance_name="rule1", predicate="attNull > 3",
                     columns=("att1",))
        assert _row_level(df_numeric_values, a) == \
            [None, None, None, True, True, True]

    def test_filtered_with_null(self, df_numeric_values):
        """:50-61 — att1 > 4 where att2 != 0, FilteredRowOutcome.NULL."""
        from deequ_spark import AnalyzerOptions, FilteredRowOutcome
        a = self._mk(instance_name="rule1", predicate="att1 > 4",
                     where="att2 != 0",
                     analyzer_options=AnalyzerOptions(
                         filtered_row=FilteredRowOutcome.NULL))
        assert _row_level(df_numeric_values, a) == \
            [None, None, None, False, True, True]

    def test_filtered_with_true(self, df_numeric_values):
        """:63-74 — same rule, FilteredRowOutcome.TRUE."""
        from deequ_spark import AnalyzerOptions, FilteredRowOutcome
        a = self._mk(instance_name="rule1", predicate="att1 > 4",
                     where="att2 != 0",
                     analyzer_options=AnalyzerOptions(
                         filtered_row=FilteredRowOutcome.TRUE))
        assert _row_level(df_numeric_values, a) == \
            [True, True, True, False, True, True]

    def test_null_in_where_column_treated_as_filtered(self, df_nationality):
        """:76-103 — NULL in the where column ⇒ row is filtered ⇒ TRUE."""
        from deequ_spark import AnalyzerOptions, FilteredRowOutcome
        a = self._mk(instance_name="rule1",
                     predicate="championnationality IN ('USA', 'AUS')",
                     where="runnerupnationality = 'AUS'",
                     analyzer_options=AnalyzerOptions(
                         filtered_row=FilteredRowOutcome.TRUE))
        assert _row_level(df_nationality, a) == \
            [True, False, True, True, True]

    PRED_BOUNDS = ("`att1` IS NULL OR (`att1` >= 2 AND `att1` <= 5)")

    def test_compliance_in_bounds(self, df_numeric_values):
        """:105-124 — isContainedIn-range style predicate."""
        a = self._mk(instance_name="att1 between 2 and 5",
                     predicate=self.PRED_BOUNDS, columns=("att3",))
        assert _row_level(df_numeric_values, a) == \
            [False, True, True, True, True, False]

    def test_in_bounds_filtered_as_null(self, df_numeric_values):
        """:126-147 — where att1 < 4, NULL outcome for filtered rows."""
        from deequ_spark import AnalyzerOptions, FilteredRowOutcome
        a = self._mk(instance_name="att1 between 2 and 5",
                     predicate=self.PRED_BOUNDS, where="att1 < 4",
                     columns=("att3",),
                     analyzer_options=AnalyzerOptions(
                         filtered_row=FilteredRowOutcome.NULL))
        assert _row_level(df_numeric_values, a) == \
            [False, True, True, None, None, None]

    def test_in_bounds_filtered_as_true(self, df_numeric_values):
        """:149-170 — TRUE outcome for filtered rows."""
        from deequ_spark import AnalyzerOptions, FilteredRowOutcome
        a = self._mk(instance_name="att1 between 2 and 5",
                     predicate=self.PRED_BOUNDS, where="att1 < 4",
                     columns=("att3",),
                     analyzer_options=AnalyzerOptions(
                         filtered_row=FilteredRowOutcome.TRUE))
        assert _row_level(df_numeric_values, a) == \
            [False, True, True, True, True, True]

    PRED_ARRAY = "`att1` IS NULL OR `att1` IN ('3','4','5')"

    def test_compliance_in_array(self, df_numeric_values):
        """:172-191 — isContainedIn-values style predicate."""
        a = self._mk(instance_name="att1 contained in 3,4,5",
                     predicate=self.PRED_ARRAY, columns=("att3",))
        assert _row_level(df_numeric_values, a) == \
            [False, False, True, True, True, False]

    def test_in_array_filtered_as_null(self, df_numeric_values):
        """:193-214 — where att1 < 5, NULL outcome."""
        from deequ_spark import AnalyzerOptions, FilteredRowOutcome
        a = self._mk(instance_name="att1 contained in 3,4,5",
                     predicate=self.PRED_ARRAY, where="att1 < 5",
                     columns=("att3",),
                     analyzer_options=AnalyzerOptions(
                         filtered_row=FilteredRowOutcome.NULL))
        assert _row_level(df_numeric_values, a) == \
            [False, False, True, True, None, None]

    def test_in_array_filtered_as_true(self, df_numeric_values):
        """:216-237 — TRUE outcome."""
        from deequ_spark import AnalyzerOptions, FilteredRowOutcome
        a = self._mk(instance_name="att1 contained in 3,4,5",
                     predicate=self.PRED_ARRAY, where="att1 < 5",
                     columns=("att3",),
                     analyzer_options=AnalyzerOptions(
                         filtered_row=FilteredRowOutcome.TRUE))
        assert _row_level(df_numeric_values, a) == \
            [False, False, True, True, True, True]

    def test_preserve_full_column_when_where_filters_all_rows(
            self, df_numeric_values):
        """:239-250 — empty state, failed metric, row-level still defined
        (all rows filtered ⇒ TRUE under the default treatment)."""
        a = self._mk(instance_name="att1 positive", predicate="att1 > 0",
                     where="att1 > 100")
        state = a.compute_state_from(df_numeric_values)
        assert state is None
        m = a.compute_metric_from_state(state)
        assert not m.is_success
        assert _row_level(df_numeric_values, a) == [True] * 6

    def test_null_row_level_when_where_filters_all_rows(
            self, df_numeric_values):
        """:252-268 — with FilteredRowOutcome.NULL every outcome is NULL."""
        from deequ_spark import AnalyzerOptions, FilteredRowOutcome
        a = self._mk(instance_name="att1 positive", predicate="att1 > 0",
                     where="att1 > 100",
                     analyzer_options=AnalyzerOptions(
                         filtered_row=FilteredRowOutcome.NULL))
        assert _row_level(df_numeric_values, a) == [None] * 6


# ---------------------------------------------------------------------------
# MinLengthTest.scala / MaxLengthTest.scala — the reference asserts on
# element_at(fullColumn, 2): the per-row NullBehavior-transformed length.
# Our equivalent is the analyzer's internal _value() column.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def df_empty_column(spark):
    """FixtureSupport.getEmptyColumnDataDf (FixtureSupport.scala:31-42)."""
    return spark.createDataFrame(
        [(0, "", "a", "f"), (1, "", "b", "d"), (2, "", "a", None),
         (3, "", "a", "f"), (4, "", "b", None), (5, "", "a", "f")],
        "id int, att1 string, att2 string, att3 string")


@pytest.fixture(scope="module")
def df_string_columns(spark):
    """FixtureSupport.getDfWithStringColumns (:411-425) — Country is
    'India' in all 8 rows."""
    rows = [
        (0, "India", "Xavier House, 2nd Floor",
         "St. Peter Colony, Perry Road", "Bandra (West)"),
        (1, "India", "503 Godavari", "Sir Pochkhanwala Road", "Worli"),
        (2, "India", "4/4 Seema Society", "N Dutta Road, Four Bungalows",
         "Andheri"),
        (3, "India", "1001D Abhishek Apartments", "Juhu Versova Road",
         "Andheri"),
        (4, "India", "95, Hill Road", None, None),
        (5, "India", "90 Cuffe Parade", "Taj President Hotel",
         "Cuffe Parade"),
        (6, "India", "4, Seven PM", "Sir Pochkhanwala Rd", "Worli"),
        (7, "India", "1453 Sahar Road", None, None),
    ]
    return spark.createDataFrame(
        rows, "id int, Country string, `Address Line 1` string, "
              "`Address Line 2` string, `Address Line 3` string")


def _lengths(df, analyzer):
    rows = (df.withColumn("new", analyzer._value().cast("double"))
            .orderBy("id").collect())
    return [r["new"] for r in rows]


class TestMinLengthFullColumnParity:
    """MinLengthTest.scala (line refs per case)."""

    def test_non_null_columns(self, df_string_columns):
        """:40-49 — Country is 'India' everywhere → 5.0 per row."""
        from deequ_spark import MinLength
        a = MinLength("Country")
        assert a.compute_state_from(df_string_columns).min_value == 5.0
        assert _lengths(df_string_columns, a) == [5.0] * 8

    def test_null_columns_default_ignore(self, df_empty_column):
        """:51-61 — NULL rows stay NULL under Ignore."""
        from deequ_spark import MinLength
        a = MinLength("att3")
        assert _lengths(df_empty_column, a) == \
            [1.0, 1.0, None, 1.0, None, 1.0]

    def test_null_behavior_fail(self, df_empty_column):
        """:63-74 — NULL → Double.MinValue sentinel."""
        from deequ_spark import AnalyzerOptions, MinLength, NullBehavior
        from deequ_spark.analyzers.scan import DOUBLE_MIN_VALUE
        a = MinLength("att3", None,
                      analyzer_options=AnalyzerOptions(
                          null_behavior=NullBehavior.FAIL))
        assert _lengths(df_empty_column, a) == \
            [1.0, 1.0, DOUBLE_MIN_VALUE, 1.0, DOUBLE_MIN_VALUE, 1.0]

    def test_null_behavior_empty_string(self, df_empty_column):
        """:76-87 — NULL → length 0."""
        from deequ_spark import AnalyzerOptions, MinLength, NullBehavior
        a = MinLength("att3", None,
                      analyzer_options=AnalyzerOptions(
                          null_behavior=NullBehavior.EMPTY_STRING))
        assert _lengths(df_empty_column, a) == \
            [1.0, 1.0, 0.0, 1.0, 0.0, 1.0]

    def test_blank_strings(self, df_empty_column):
        """:89-98 — att1 is '' everywhere → 0.0 per row."""
        from deequ_spark import MinLength
        a = MinLength("att1")
        assert a.compute_state_from(df_empty_column).min_value == 0.0
        assert _lengths(df_empty_column, a) == [0.0] * 6


class TestMaxLengthFullColumnParity:
    """MaxLengthTest.scala (line refs per case)."""

    def test_non_null_columns(self, df_string_columns):
        """:40-49."""
        from deequ_spark import MaxLength
        a = MaxLength("Country")
        assert a.compute_state_from(df_string_columns).max_value == 5.0
        assert _lengths(df_string_columns, a) == [5.0] * 8

    def test_null_columns_default_ignore(self, df_empty_column):
        """:51-61."""
        from deequ_spark import MaxLength
        a = MaxLength("att3")
        assert _lengths(df_empty_column, a) == \
            [1.0, 1.0, None, 1.0, None, 1.0]

    def test_null_behavior_fail(self, df_empty_column):
        """:63-74 — NULL → Double.MaxValue sentinel."""
        from deequ_spark import AnalyzerOptions, MaxLength, NullBehavior
        from deequ_spark.analyzers.scan import DOUBLE_MAX_VALUE
        a = MaxLength("att3", None,
                      analyzer_options=AnalyzerOptions(
                          null_behavior=NullBehavior.FAIL))
        assert _lengths(df_empty_column, a) == \
            [1.0, 1.0, DOUBLE_MAX_VALUE, 1.0, DOUBLE_MAX_VALUE, 1.0]

    def test_blank_strings(self, df_empty_column):
        """:76-85."""
        from deequ_spark import MaxLength
        a = MaxLength("att1")
        assert a.compute_state_from(df_empty_column).max_value == 0.0
        assert _lengths(df_empty_column, a) == [0.0] * 6


# ---------------------------------------------------------------------------
# MinimumTest.scala / MaximumTest.scala / CompletenessTest.scala — the last
# fullColumn-internal families (COVERAGE.md residual): the reference asserts
# element_at(fullColumn, 2) carries the raw per-row value for Min/Max, and
# the boolean isNotNull (with filtered-row treatment) for Completeness.
# ---------------------------------------------------------------------------

def _values(df, column, order="item"):
    from pyspark.sql import functions as F
    rows = (df.withColumn("new", F.col(column).cast("double"))
            .orderBy(order).collect())
    return [r["new"] for r in rows]


class TestMinimumFullColumnParity:
    """MinimumTest.scala (line refs per case)."""

    def test_row_level_values(self, df_numeric_values):
        """:40-49 — fullColumn slot 2 is the raw att1 value per row."""
        a = Minimum("att1")
        assert a.compute_state_from(df_numeric_values).min_value == 1.0
        assert _values(df_numeric_values, "att1") == \
            [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]

    def test_row_level_values_with_null(self, df_numeric_values):
        """:51-61 — NULLs stay NULL."""
        a = Minimum("attNull")
        assert a.compute_state_from(df_numeric_values).min_value == 5.0
        assert _values(df_numeric_values, "attNull") == \
            [None, None, None, 5.0, 6.0, 7.0]

    def test_preserve_full_column_when_where_filters_all(
            self, df_numeric_values):
        """:63-75 — empty state, EmptyState failure metric, row-level
        column still constructible."""
        a = Minimum("att1", where="att1 > 100")
        state = a.compute_state_from(df_numeric_values)
        assert state is None
        m = a.compute_metric_from_state(state)
        assert not m.is_success
        assert isinstance(m.error, EmptyStateError)
        assert a.row_level_results() is not None


class TestMaximumFullColumnParity:
    """MaximumTest.scala (line refs per case)."""

    def test_row_level_values(self, df_numeric_values):
        """:40-49."""
        a = Maximum("att1")
        assert a.compute_state_from(df_numeric_values).max_value == 6.0
        assert _values(df_numeric_values, "att1") == \
            [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]

    def test_row_level_values_with_null(self, df_numeric_values):
        """:51-61."""
        a = Maximum("attNull")
        assert a.compute_state_from(df_numeric_values).max_value == 7.0
        assert _values(df_numeric_values, "attNull") == \
            [None, None, None, 5.0, 6.0, 7.0]

    def test_preserve_full_column_when_where_filters_all(
            self, df_numeric_values):
        """:63-75."""
        a = Maximum("att1", where="att1 > 100")
        state = a.compute_state_from(df_numeric_values)
        assert state is None
        m = a.compute_metric_from_state(state)
        assert not m.is_success
        assert isinstance(m.error, EmptyStateError)
        assert a.row_level_results() is not None


@pytest.fixture(scope="module")
def df_complete_incomplete(spark):
    """FixtureSupport.getDfCompleteAndInCompleteColumns."""
    return spark.createDataFrame(
        [("1", "a", "f"), ("2", "b", "d"), ("3", "a", None),
         ("4", "a", "f"), ("5", "b", None), ("6", "a", "f")],
        "item string, att1 string, att2 string")


class TestCompletenessFullColumnParity:
    """CompletenessTest.scala (line refs per case) — fullColumn is the
    boolean isNotNull with filtered-row treatment; our surface is
    Completeness.row_level_results()."""

    def test_row_level_for_columns(self, df_string_columns):
        """:31-41 — Address Line 3 null in rows 4 and 7."""
        from deequ_spark import Completeness
        a = Completeness("Address Line 3")
        assert _row_level(df_string_columns, a, order="id") == \
            [True, True, True, True, False, True, True, False]

    def test_filtered_as_null(self, df_complete_incomplete):
        """:43-57 — where att1 = 'a', FilteredRowOutcome.NULL."""
        from deequ_spark import (AnalyzerOptions, Completeness,
                                 FilteredRowOutcome)
        a = Completeness("att2", where="att1 = \"a\"",
                         analyzer_options=AnalyzerOptions(
                             filtered_row=FilteredRowOutcome.NULL))
        assert _row_level(df_complete_incomplete, a) == \
            [True, None, False, True, None, True]

    def test_filtered_as_true(self, df_complete_incomplete):
        """:59-72 — default treatment keeps filtered rows TRUE."""
        from deequ_spark import Completeness
        a = Completeness("att2", where="att1 = \"a\"")
        assert _row_level(df_complete_incomplete, a) == \
            [True, True, False, True, True, True]

    def test_all_filtered_null_outcomes(self, df_numeric_values):
        """:86-99 — where filters everything + NULL treatment ⇒ all
        NULL."""
        from deequ_spark import (AnalyzerOptions, Completeness,
                                 FilteredRowOutcome)
        a = Completeness("att1", where="att1 > 100",
                         analyzer_options=AnalyzerOptions(
                             filtered_row=FilteredRowOutcome.NULL))
        assert _row_level(df_numeric_values, a) == [None] * 6
