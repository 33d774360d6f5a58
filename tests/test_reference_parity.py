"""Reference row-level / filtered-row / NullBehavior parity suite.

Every case here is TRANSCRIBED from the reference's own end-to-end tests —
fixture data, rule construction, and expected per-row outcomes:

- /root/reference/src/test/scala/com/amazon/deequ/VerificationSuiteTest.scala
  ("generate a result that contains row-level results" family, :235-800,
   and the where-filters-all-rows family, :2206-2400)
- /root/reference/src/test/scala/com/amazon/deequ/analyzers/UniquenessTest.scala
  (:93-185 row-level fixtures)
- fixtures: /root/reference/src/test/scala/com/amazon/deequ/utils/
  FixtureSupport.scala (getDfCompleteAndInCompleteColumnsAndVarLengthStrings
  :188, getDfCompleteAndInCompleteColumnsWithIntId :162,
  getDfWithNumericValues :250, getDfWithUniqueColumns :326)

The semantics under test (Analyzer.scala:277-292 AnalyzerOptions,
Constraint.scala:1214-1288 row-level assertion truth tables):
filtered rows → TRUE by default / NULL via FilteredRowOutcome.NULL;
in-scope NULL values follow NullBehavior (Ignore → NULL outcome,
Fail → false / sentinel length, EmptyString → length 0).
"""

import pytest

from deequ_spark import (AnalyzerOptions, Check, CheckLevel, CheckStatus,
                         FilteredRowOutcome, NullBehavior, VerificationSuite)


def _run_row_level(df, checks):
    suite = VerificationSuite().on_data(df)
    for c in checks:
        suite.add_check(c)
    result = suite.run()
    return result, result.row_level_results_as_dataframe(df)


def _column(annotated, order_col, name):
    rows = annotated.orderBy(order_col).select(order_col, name).collect()
    return [r[name] for r in rows]


@pytest.fixture(scope="module")
def df_var_length(spark):
    """getDfCompleteAndInCompleteColumnsAndVarLengthStrings
    (FixtureSupport.scala:188-199)."""
    return spark.createDataFrame(
        [("1", "a", "f", 1, 1), ("22", "b", "d", 2, None),
         ("333", "a", None, 3, 3), ("4444", "a", "f", 4, 4),
         ("55555", "b", None, 5, None), ("666666", "a", "f", 6, 6)],
        "item string, att1 string, att2 string, val1 int, val2 int")


@pytest.fixture(scope="module")
def df_int_id(spark):
    """getDfCompleteAndInCompleteColumnsWithIntId (FixtureSupport.scala:162)."""
    return spark.createDataFrame(
        [(1, "a", "f"), (2, "b", "d"), (3, "a", None),
         (4, "a", "f"), (5, "b", None), (6, "a", "f")],
        "item int, att1 string, att2 string")


@pytest.fixture(scope="module")
def df_numeric(spark):
    """getDfWithNumericValues (FixtureSupport.scala:250-261)."""
    return spark.createDataFrame(
        [("1", 1, 0, 0, None), ("2", 2, 0, 0, None), ("3", 3, 0, 0, None),
         ("4", 4, 5, 4, 5), ("5", 5, 6, 6, 6), ("6", 6, 7, 7, 7)],
        "item string, att1 int, att2 int, att3 int, attNull int")


@pytest.fixture(scope="module")
def df_unique_cols(spark):
    """getDfWithUniqueColumns (FixtureSupport.scala:326-339)."""
    return spark.createDataFrame(
        [("1", "0", "3", "1", "5", "0"), ("2", "0", "3", "2", "6", "0"),
         ("3", "0", "3", None, "7", "0"), ("4", "5", None, "3", "0", "4"),
         ("5", "6", None, "4", "0", "5"), ("6", "7", None, "5", "0", "6")],
        "unique string, nonUnique string, nonUniqueWithNulls string, "
        "uniqueWithNulls string, onlyUniqueWithOtherNonUnique string, "
        "halfUniqueCombinedWithNonUnique string")


class TestRowLevelResultsUnfiltered:
    """VerificationSuiteTest.scala:235-330
    "generate a result that contains row-level results"."""

    def test_eleven_rules(self, df_var_length):
        fail_opts = AnalyzerOptions(null_behavior=NullBehavior.FAIL)
        checks = [
            Check(CheckLevel.ERROR, "rule1").is_complete("att1"),
            Check(CheckLevel.ERROR, "rule2")
                .has_completeness("att2", lambda v: v > 0.7),
            Check(CheckLevel.ERROR, "rule3").is_primary_key("item"),
            Check(CheckLevel.ERROR, "rule4")
                .has_min_length("item", lambda v: v >= 1,
                                analyzer_options=fail_opts),
            Check(CheckLevel.ERROR, "rule5")
                .has_max_length("item", lambda v: v <= 1,
                                analyzer_options=fail_opts),
            Check(CheckLevel.ERROR, "rule6").has_pattern("att2", "[a-z]"),
            Check(CheckLevel.ERROR, "rule7").has_min("val1", lambda v: v > 1),
            Check(CheckLevel.ERROR, "rule8").has_max("val1", lambda v: v <= 3),
            Check(CheckLevel.ERROR, "rule9")
                .satisfies("item < 1000", "rule9", columns=["item"]),
            Check(CheckLevel.ERROR, "rule10").are_unique(["item", "att1"]),
            Check(CheckLevel.ERROR, "rule11").are_unique(["att1", "att2"]),
        ]
        result, annotated = _run_row_level(df_var_length, checks)
        assert result.status == CheckStatus.ERROR
        expected = {
            "rule1": [True, True, True, True, True, True],
            "rule2": [True, True, False, True, False, True],
            "rule3": [True, True, True, True, True, True],
            "rule4": [True, True, True, True, True, True],
            "rule5": [True, False, False, False, False, False],
            "rule6": [True, True, False, True, False, True],
            "rule7": [False, True, True, True, True, True],
            "rule8": [True, True, True, False, False, False],
            "rule9": [True, True, True, False, False, False],
            "rule10": [True, True, True, True, True, True],
            # non unique for rows 1,4,6 — (a,f) occurs three times
            "rule11": [False, True, True, False, True, False],
        }
        for rule, exp in expected.items():
            assert _column(annotated, "val1", rule) == exp, rule


class TestFilteredRowsTrue:
    """VerificationSuiteTest.scala:329-418 "row-level results with true for
    filtered rows" (default FilteredRowOutcome.TRUE)."""

    def test_eight_rules(self, df_int_id):
        checks = [
            Check(CheckLevel.ERROR, "rule1")
                .has_completeness("att2", lambda v: v > 0.7)
                .where("att1 = 'a'"),
            Check(CheckLevel.ERROR, "rule2")
                .has_uniqueness("att1", lambda v: v > 0.5),
            Check(CheckLevel.ERROR, "rule3")
                .is_unique("att1").where("item < 3"),
            Check(CheckLevel.ERROR, "rule4")
                .has_min("item", lambda v: v > 3).where("item > 3"),
            Check(CheckLevel.ERROR, "rule5")
                .has_max("item", lambda v: v < 4).where("item < 4"),
            Check(CheckLevel.ERROR, "rule6")
                .has_pattern("att2", "(^f)").where("item < 4"),
            Check(CheckLevel.ERROR, "rule7")
                .is_primary_key("item").where("item < 3"),
            Check(CheckLevel.ERROR, "rule8")
                .has_unique_value_ratio(["att1"], lambda v: v >= 0.5)
                .where("item < 4"),
        ]
        result, annotated = _run_row_level(df_int_id, checks)
        assert result.status == CheckStatus.ERROR
        expected = {
            "rule1": [True, True, False, True, True, True],
            "rule2": [False, False, False, False, False, False],
            "rule3": [True, True, True, True, True, True],
            "rule4": [True, True, True, True, True, True],
            "rule5": [True, True, True, True, True, True],
            "rule6": [True, False, False, True, True, True],
            "rule7": [True, True, True, True, True, True],
            "rule8": [False, True, False, True, True, True],
        }
        for rule, exp in expected.items():
            assert _column(annotated, "item", rule) == exp, rule


class TestFilteredRowsNull:
    """VerificationSuiteTest.scala:418-508 "row-level results with null for
    filtered rows" (FilteredRowOutcome.NULL)."""

    def test_eight_rules(self, df_int_id):
        opts = AnalyzerOptions(filtered_row=FilteredRowOutcome.NULL)
        checks = [
            Check(CheckLevel.ERROR, "rule1")
                .has_completeness("att2", lambda v: v > 0.7,
                                  analyzer_options=opts)
                .where("att1 = 'a'"),
            Check(CheckLevel.ERROR, "rule2")
                .has_uniqueness("att1", lambda v: v > 0.5,
                                analyzer_options=opts),
            Check(CheckLevel.ERROR, "rule3")
                .is_unique("att1", analyzer_options=opts).where("item < 3"),
            Check(CheckLevel.ERROR, "rule4")
                .has_min("item", lambda v: v > 3, analyzer_options=opts)
                .where("item > 3"),
            Check(CheckLevel.ERROR, "rule5")
                .has_max("item", lambda v: v < 4, analyzer_options=opts)
                .where("item < 4"),
            Check(CheckLevel.ERROR, "rule6")
                .has_pattern("att2", "(^f)", analyzer_options=opts)
                .where("item < 4"),
            Check(CheckLevel.ERROR, "rule7")
                .is_primary_key("item", analyzer_options=opts)
                .where("item < 4"),
            Check(CheckLevel.ERROR, "rule8")
                .has_unique_value_ratio(["att1"], lambda v: v >= 0.5,
                                        analyzer_options=opts)
                .where("item < 4"),
        ]
        result, annotated = _run_row_level(df_int_id, checks)
        assert result.status == CheckStatus.ERROR
        expected = {
            # att1='a' scope; filtered rows 2,5 → NULL; row 3 in scope null att2
            "rule1": [True, None, False, True, None, True],
            "rule2": [False, False, False, False, False, False],
            "rule3": [True, True, None, None, None, None],
            "rule4": [None, None, None, True, True, True],
            "rule5": [True, True, True, None, None, None],
            "rule6": [True, False, False, None, None, None],
            "rule7": [True, True, True, None, None, None],
            "rule8": [False, True, False, None, None, None],
        }
        for rule, exp in expected.items():
            assert _column(annotated, "item", rule) == exp, rule


class TestComplianceRowLevel:
    """VerificationSuiteTest.scala:508-580 "compliance row-level results":
    isContainedIn passes NULLs (predicate embeds `col IS NULL OR ...`)."""

    def test_six_rules(self, df_numeric):
        opts = AnalyzerOptions(filtered_row=FilteredRowOutcome.NULL)
        checks = [
            Check(CheckLevel.ERROR, "rule1")
                .is_contained_in_range("attNull", 0, 6, False, False),
            Check(CheckLevel.ERROR, "rule2")
                .is_contained_in_range("attNull", 0, 6, False, False)
                .where("att1 < 4"),
            Check(CheckLevel.ERROR, "rule3")
                .is_contained_in_range("attNull", 0, 6, False, False,
                                       analyzer_options=opts)
                .where("att1 < 4"),
            Check(CheckLevel.ERROR, "rule4")
                .is_contained_in("att2", ["5", "6", "7"]),
            Check(CheckLevel.ERROR, "rule5")
                .is_contained_in("att2", ["5", "6", "7"])
                .where("att1 > 3"),
            Check(CheckLevel.ERROR, "rule6")
                .is_contained_in("att2", ["5", "6", "7"],
                                 analyzer_options=opts)
                .where("att1 > 3"),
        ]
        result, annotated = _run_row_level(df_numeric, checks)
        assert result.status == CheckStatus.ERROR
        expected = {
            # attNull: null,null,null,5,6,7; 0<x<6 strict; NULL passes
            "rule1": [True, True, True, True, False, False],
            "rule2": [True, True, True, True, True, True],
            "rule3": [True, True, True, None, None, None],
            "rule4": [False, False, False, True, True, True],
            "rule5": [True, True, True, True, True, True],
            "rule6": [None, None, None, True, True, True],
        }
        for i, (rule, exp) in enumerate(expected.items(), 1):
            col = [c for c in annotated.columns
                   if c not in df_numeric.columns][i - 1]
            assert _column(annotated, "item", col) == exp, rule


class TestNullColumnValues:
    """VerificationSuiteTest.scala:579-650 "row-level results for null
    column values": in-scope NULL under default Ignore → NULL outcome."""

    def test_four_rules(self, df_var_length):
        checks = [
            Check(CheckLevel.ERROR, "rule1").has_min("val2", lambda v: v > 2),
            Check(CheckLevel.ERROR, "rule2").has_max("val2", lambda v: v <= 3),
            Check(CheckLevel.ERROR, "rule3").has_pattern("att2", r"\w"),
            Check(CheckLevel.ERROR, "rule4")
                .satisfies("val2 > 3", "rule4", columns=["val2"]),
        ]
        result, annotated = _run_row_level(df_var_length, checks)
        assert result.status == CheckStatus.ERROR
        expected = {
            "rule1": [False, None, True, True, None, True],
            "rule2": [True, None, True, False, None, False],
            "rule3": [True, True, False, True, False, True],
            "rule4": [False, None, False, True, None, True],
        }
        for rule, exp in expected.items():
            assert _column(annotated, "val1", rule) == exp, rule


class TestLengthNullBehaviorFail:
    """VerificationSuiteTest.scala:666-740 "length row-level results with
    nullBehavior fail": NULL string → false in scope, filtered rows follow
    the FilteredRowOutcome."""

    def test_six_rules(self, df_var_length):
        fail = AnalyzerOptions(null_behavior=NullBehavior.FAIL)
        fail_null = AnalyzerOptions(null_behavior=NullBehavior.FAIL,
                                    filtered_row=FilteredRowOutcome.NULL)
        fail_true = AnalyzerOptions(null_behavior=NullBehavior.FAIL,
                                    filtered_row=FilteredRowOutcome.TRUE)
        checks = [
            Check(CheckLevel.ERROR, "rule1")
                .has_min_length("att2", lambda v: v >= 1,
                                analyzer_options=fail),
            Check(CheckLevel.ERROR, "rule2")
                .has_max_length("att2", lambda v: v <= 1,
                                analyzer_options=fail),
            Check(CheckLevel.ERROR, "rule3")
                .has_min_length("att2", lambda v: v >= 1,
                                analyzer_options=fail_null)
                .where("val1 < 5"),
            Check(CheckLevel.ERROR, "rule4")
                .has_max_length("att2", lambda v: v <= 1,
                                analyzer_options=fail_null)
                .where("val1 < 5"),
            Check(CheckLevel.ERROR, "rule5")
                .has_min_length("att2", lambda v: v >= 1,
                                analyzer_options=fail_true)
                .where("val1 < 5"),
            Check(CheckLevel.ERROR, "rule6")
                .has_max_length("att2", lambda v: v <= 1,
                                analyzer_options=fail_true)
                .where("val1 < 5"),
        ]
        result, annotated = _run_row_level(df_var_length, checks)
        assert result.status == CheckStatus.ERROR
        expected = {
            "rule1": [True, True, False, True, False, True],
            "rule2": [True, True, False, True, False, True],
            "rule3": [True, True, False, True, None, None],
            "rule4": [True, True, False, True, None, None],
            "rule5": [True, True, False, True, True, True],
            "rule6": [True, True, False, True, True, True],
        }
        for rule, exp in expected.items():
            assert _column(annotated, "val1", rule) == exp, rule


class TestLengthNullBehaviorEmpty:
    """VerificationSuiteTest.scala:740-820 "length row-level results with
    nullBehavior empty": NULL string asserts as length 0."""

    def test_six_rules(self, df_var_length):
        empty = AnalyzerOptions(null_behavior=NullBehavior.EMPTY_STRING)
        empty_null = AnalyzerOptions(null_behavior=NullBehavior.EMPTY_STRING,
                                     filtered_row=FilteredRowOutcome.NULL)
        empty_true = AnalyzerOptions(null_behavior=NullBehavior.EMPTY_STRING,
                                     filtered_row=FilteredRowOutcome.TRUE)
        checks = [
            Check(CheckLevel.ERROR, "rule1")
                .has_min_length("att2", lambda v: v >= 1,
                                analyzer_options=empty),
            Check(CheckLevel.ERROR, "rule2")
                .has_max_length("att2", lambda v: v < 2,
                                analyzer_options=empty),
            Check(CheckLevel.ERROR, "rule3")
                .has_min_length("att2", lambda v: v >= 1,
                                analyzer_options=empty_null)
                .where("val1 < 5"),
            Check(CheckLevel.ERROR, "rule4")
                .has_max_length("att2", lambda v: v < 2,
                                analyzer_options=empty_null)
                .where("val1 < 5"),
            Check(CheckLevel.ERROR, "rule5")
                .has_min_length("att2", lambda v: v >= 1,
                                analyzer_options=empty_true)
                .where("val1 < 5"),
            Check(CheckLevel.ERROR, "rule6")
                .has_max_length("att2", lambda v: v < 2,
                                analyzer_options=empty_true)
                .where("val1 < 5"),
        ]
        result, annotated = _run_row_level(df_var_length, checks)
        assert result.status == CheckStatus.ERROR
        expected = {
            "rule1": [True, True, False, True, False, True],
            "rule2": [True, True, True, True, True, True],
            "rule3": [True, True, False, True, None, None],
            "rule4": [True, True, True, True, None, None],
            "rule5": [True, True, False, True, True, True],
            "rule6": [True, True, True, True, True, True],
        }
        for rule, exp in expected.items():
            assert _column(annotated, "val1", rule) == exp, rule

    def test_filtered_min_max_length_empty_success(self, df_var_length):
        """VerificationSuiteTest.scala:628-666 "confirm that minLength and
        maxLength properly filters with nullBehavior empty"."""
        opts = AnalyzerOptions(null_behavior=NullBehavior.EMPTY_STRING,
                               filtered_row=FilteredRowOutcome.NULL)
        checks = [
            Check(CheckLevel.ERROR, "rule1")
                .has_min_length("item", lambda v: v > 3,
                                analyzer_options=opts)
                .where("val1 > 3"),
            Check(CheckLevel.ERROR, "rule2")
                .has_max_length("item", lambda v: v <= 3,
                                analyzer_options=opts)
                .where("val1 < 4"),
        ]
        result, annotated = _run_row_level(df_var_length, checks)
        assert result.status == CheckStatus.SUCCESS
        assert _column(annotated, "val1", "rule1") == \
            [None, None, None, True, True, True]
        assert _column(annotated, "val1", "rule2") == \
            [True, True, True, None, None, None]


class TestWhereFiltersAllRows:
    """VerificationSuiteTest.scala:2206-2400: a where clause matching zero
    rows → EmptyState due to filter → constraint SUCCESS, row-level all
    filtered-outcome."""

    def test_min_max_all_filtered_true(self, df_numeric):
        check = (Check(CheckLevel.ERROR, "min-max-where-zero-match")
                 .has_min("att1", lambda v: v >= 0.0).where("att1 > 100")
                 .has_max("att1", lambda v: v <= 1000.0).where("att1 > 100"))
        result, annotated = _run_row_level(df_numeric, [check])
        assert result.status == CheckStatus.SUCCESS
        col = [c for c in annotated.columns if c not in df_numeric.columns][0]
        assert _column(annotated, "item", col) == [True] * 6

    def test_min_where_would_fail_is_success(self, df_numeric):
        check = (Check(CheckLevel.ERROR, "min-where-would-fail")
                 .has_min("att1", lambda v: v >= 10.0).where("att1 > 100"))
        result, _ = _run_row_level(df_numeric, [check])
        assert result.status == CheckStatus.SUCCESS

    def test_min_max_all_filtered_null(self, df_numeric):
        opts = AnalyzerOptions(filtered_row=FilteredRowOutcome.NULL)
        check = (Check(CheckLevel.ERROR, "min-max-where-zero-match-null")
                 .has_min("att1", lambda v: v >= 0.0, analyzer_options=opts)
                 .where("att1 > 100")
                 .has_max("att1", lambda v: v <= 1000.0, analyzer_options=opts)
                 .where("att1 > 100"))
        result, annotated = _run_row_level(df_numeric, [check])
        assert result.status == CheckStatus.SUCCESS
        col = [c for c in annotated.columns if c not in df_numeric.columns][0]
        assert _column(annotated, "item", col) == [None] * 6

    def test_min_where_matches_and_fails(self, df_numeric):
        check = (Check(CheckLevel.ERROR, "min-where-legit-fail")
                 .has_min("att1", lambda v: v >= 10.0).where("att1 > 3"))
        result, _ = _run_row_level(df_numeric, [check])
        assert result.status == CheckStatus.ERROR

    def test_is_complete_all_filtered(self, df_numeric):
        check = (Check(CheckLevel.ERROR, "complete-where-zero-match")
                 .is_complete("att1").where("att1 > 100"))
        result, annotated = _run_row_level(df_numeric, [check])
        assert result.status == CheckStatus.SUCCESS
        col = [c for c in annotated.columns if c not in df_numeric.columns][0]
        assert _column(annotated, "item", col) == [True] * 6

    def test_is_complete_matches_nulls_fails(self, df_numeric):
        check = (Check(CheckLevel.ERROR, "complete-where-legit-fail")
                 .is_complete("attNull").where("att1 > 0"))
        result, _ = _run_row_level(df_numeric, [check])
        assert result.status == CheckStatus.ERROR

    def test_max_where_matches_and_fails(self, df_numeric):
        check = (Check(CheckLevel.ERROR, "max-where-legit-fail")
                 .has_max("att1", lambda v: v <= 3.0).where("att1 > 3"))
        result, _ = _run_row_level(df_numeric, [check])
        assert result.status == CheckStatus.ERROR

    def test_satisfies_all_filtered(self, df_numeric):
        check = (Check(CheckLevel.ERROR, "satisfies-where-zero-match")
                 .satisfies("att1 > 0", "att1 positive").where("att1 > 100"))
        result, annotated = _run_row_level(df_numeric, [check])
        assert result.status == CheckStatus.SUCCESS
        col = [c for c in annotated.columns if c not in df_numeric.columns][0]
        assert _column(annotated, "item", col) == [True] * 6

    def test_satisfies_where_matches_and_fails(self, df_numeric):
        check = (Check(CheckLevel.ERROR, "satisfies-where-legit-fail")
                 .satisfies("att1 > 10", "att1 big").where("att1 > 3"))
        result, _ = _run_row_level(df_numeric, [check])
        assert result.status == CheckStatus.ERROR

    def test_is_complete_all_filtered_null(self, df_numeric):
        opts = AnalyzerOptions(filtered_row=FilteredRowOutcome.NULL)
        check = (Check(CheckLevel.ERROR, "complete-where-null")
                 .is_complete("att1", analyzer_options=opts)
                 .where("att1 > 100"))
        result, annotated = _run_row_level(df_numeric, [check])
        assert result.status == CheckStatus.SUCCESS
        col = [c for c in annotated.columns if c not in df_numeric.columns][0]
        assert _column(annotated, "item", col) == [None] * 6

    def test_satisfies_all_filtered_null(self, df_numeric):
        opts = AnalyzerOptions(filtered_row=FilteredRowOutcome.NULL)
        check = (Check(CheckLevel.ERROR, "satisfies-where-null")
                 .satisfies("att1 > 0", "att1 positive",
                            analyzer_options=opts)
                 .where("att1 > 100"))
        result, annotated = _run_row_level(df_numeric, [check])
        assert result.status == CheckStatus.SUCCESS
        col = [c for c in annotated.columns if c not in df_numeric.columns][0]
        assert _column(annotated, "item", col) == [None] * 6


class TestUniquenessRowLevelFixtures:
    """UniquenessTest.scala:93-185 row-level fixtures on
    getDfWithUniqueColumns."""

    def _annotate(self, df, **kwargs):
        check = Check(CheckLevel.ERROR, "u")
        check.has_uniqueness(kwargs.pop("columns"), lambda v: v == 1.0,
                             **kwargs)
        if "where" in kwargs:
            pass
        return check

    def _row_level(self, df, columns, where=None, analyzer_options=None):
        check = Check(CheckLevel.ERROR, "u").has_uniqueness(
            columns, lambda v: v == 1.0, analyzer_options=analyzer_options)
        if where is not None:
            check = check.where(where)
        _, annotated = _run_row_level(df, [check])
        return _column(annotated, "unique", "u")

    def test_multiple_columns(self, df_unique_cols):
        got = self._row_level(
            df_unique_cols,
            ["onlyUniqueWithOtherNonUnique", "nonUniqueWithNulls"])
        assert got == [True, True, True, False, False, False]

    def test_uniqueness_with_nulls_all_unique(self, df_unique_cols):
        """A lone NULL group is unique (window keeps NULL partitions)."""
        got = self._row_level(df_unique_cols, ["uniqueWithNulls"])
        assert got == [True, True, True, True, True, True]

    def test_filtered_null_outcome(self, df_unique_cols):
        got = self._row_level(
            df_unique_cols, ["onlyUniqueWithOtherNonUnique"],
            where="unique < 4",
            analyzer_options=AnalyzerOptions(
                filtered_row=FilteredRowOutcome.NULL))
        assert got == [True, True, True, None, None, None]

    def test_filtered_null_outcome_multi(self, df_unique_cols):
        got = self._row_level(
            df_unique_cols,
            ["halfUniqueCombinedWithNonUnique", "nonUnique"],
            where="unique > 2",
            analyzer_options=AnalyzerOptions(
                filtered_row=FilteredRowOutcome.NULL))
        assert got == [None, None, True, True, True, True]

    def test_filtered_true_outcome(self, df_unique_cols):
        got = self._row_level(
            df_unique_cols, ["onlyUniqueWithOtherNonUnique"],
            where="unique < 4")
        assert got == [True, True, True, True, True, True]

    def test_filtered_true_outcome_multi(self, df_unique_cols):
        got = self._row_level(
            df_unique_cols,
            ["halfUniqueCombinedWithNonUnique", "nonUnique"],
            where="unique > 2")
        assert got == [True, True, True, True, True, True]


class TestLengthFailSentinelMetrics:
    """MinLength.scala:64 / MaxLength.scala:64: NullBehavior.Fail injects
    Scala Double.MinValue/MaxValue for NULLs so the length *metric* itself
    trips the assertion (not NaN — Spark orders NaN greater than any value,
    which would silently drop the sentinel from min())."""

    def test_min_length_fail_metric_is_double_min(self, spark):
        from deequ_spark import MinLength, do_analysis_run
        from deequ_spark.analyzers.scan import DOUBLE_MIN_VALUE
        df = spark.createDataFrame([("ab",), (None,), ("xyz",)], "s string")
        a = MinLength("s", analyzer_options=AnalyzerOptions(
            null_behavior=NullBehavior.FAIL))
        m = do_analysis_run(df, [a]).metric_map[a]
        assert m.is_success and m.value == DOUBLE_MIN_VALUE

    def test_max_length_fail_metric_is_double_max(self, spark):
        from deequ_spark import MaxLength, do_analysis_run
        from deequ_spark.analyzers.scan import DOUBLE_MAX_VALUE
        df = spark.createDataFrame([("ab",), (None,), ("xyz",)], "s string")
        a = MaxLength("s", analyzer_options=AnalyzerOptions(
            null_behavior=NullBehavior.FAIL))
        m = do_analysis_run(df, [a]).metric_map[a]
        assert m.is_success and m.value == DOUBLE_MAX_VALUE

    def test_empty_string_metric(self, spark):
        from deequ_spark import MaxLength, MinLength, do_analysis_run
        df = spark.createDataFrame([("ab",), (None,), ("xyz",)], "s string")
        mn = MinLength("s", analyzer_options=AnalyzerOptions(
            null_behavior=NullBehavior.EMPTY_STRING))
        mx = MaxLength("s", analyzer_options=AnalyzerOptions(
            null_behavior=NullBehavior.EMPTY_STRING))
        ctx = do_analysis_run(df, [mn, mx])
        assert ctx.metric_map[mn].value == 0.0
        assert ctx.metric_map[mx].value == 3.0


@pytest.fixture(scope="module")
def df_where_clause(spark):
    """getDfForWhereClause (FixtureSupport.scala:438-447)."""
    return spark.createDataFrame(
        [(1, "Acme", "90210", "CA", "Los Angeles"),
         (2, "Acme", "90211", "CA", "Los Angeles"),
         (3, "Robocorp", None, "NJ", None),
         (4, "Robocorp", None, "NY", "New York")],
        "ID int, Company string, ZipCode string, State string, City string")


class TestEqualityMinMaxFilteredRows:
    """VerificationSuiteTest.scala:1673-1795 "== based Min/Max checks and
    filtered row behavior" on getDfWithNumericValues."""

    def _checks(self, opts):
        return [
            Check(CheckLevel.ERROR, "equality-check-1")
            .has_min("att1", lambda v: v == 4, analyzer_options=opts)
            .where("att1 > 3")
            .has_max("att1", lambda v: v == 4, analyzer_options=opts)
            .where("att1 > 3"),
            Check(CheckLevel.ERROR, "equality-check-2")
            .has_min("att2", lambda v: v == 7, analyzer_options=opts)
            .where("att2 > 4")
            .has_max("att2", lambda v: v == 7, analyzer_options=opts)
            .where("att2 > 4"),
            Check(CheckLevel.ERROR, "equality-check-3")
            .has_min("att3", lambda v: v == 0, analyzer_options=opts)
            .where("att3 = 0")
            .has_max("att3", lambda v: v == 0, analyzer_options=opts)
            .where("att3 = 0"),
        ]

    def _assert_all(self, df_numeric, opts, filtered):
        result, annotated = _run_row_level(df_numeric, self._checks(opts))
        statuses = {c.description: r.status
                    for c, r in result.check_results.items()}
        assert statuses["equality-check-1"] == CheckStatus.ERROR
        assert statuses["equality-check-2"] == CheckStatus.ERROR
        assert statuses["equality-check-3"] == CheckStatus.SUCCESS
        f = filtered
        expected = {
            # att1: 1,2,3 filtered; in-scope 4,5,6 → ==4: [T,F,F]
            "equality-check-1": [f, f, f, True, False, False],
            # att2: 0,0,0 filtered (not > 4); 5,6,7 → ==7: [F,F,T]
            "equality-check-2": [f, f, f, False, False, True],
            # att3: 0,0,0 in scope → ==0 all T; 4,6,7 filtered
            "equality-check-3": [True, True, True, f, f, f],
        }
        for rule, exp in expected.items():
            assert _column(annotated, "item", rule) == exp, rule
        metrics = {(m.instance, m.name): m.value
                   for m in result.metrics.metric_map.values()
                   if m.is_success}
        assert metrics[("att1", "Minimum")] == 4.0
        assert metrics[("att1", "Maximum")] == 6.0
        assert metrics[("att2", "Minimum")] == 5.0
        assert metrics[("att2", "Maximum")] == 7.0
        assert metrics[("att3", "Minimum")] == 0.0
        assert metrics[("att3", "Maximum")] == 0.0

    def test_filtered_null(self, df_numeric):
        self._assert_all(df_numeric,
                         AnalyzerOptions(filtered_row=FilteredRowOutcome.NULL),
                         None)

    def test_filtered_true(self, df_numeric):
        self._assert_all(df_numeric,
                         AnalyzerOptions(filtered_row=FilteredRowOutcome.TRUE),
                         True)


class TestEqualityMinMaxNullRows:
    """VerificationSuiteTest.scala:1784-1878 "== based Min/Max checks and
    null row behavior" on attNull = [null,null,null,5,6,7]."""

    def _run(self, df_numeric, opts):
        check = (Check(CheckLevel.ERROR, "equality-check")
                 .has_min("attNull", lambda v: v == 6, analyzer_options=opts)
                 .has_max("attNull", lambda v: v == 6, analyzer_options=opts))
        return _run_row_level(df_numeric, [check])

    def test_null_rows_stay_null(self, df_numeric):
        result, annotated = self._run(
            df_numeric, AnalyzerOptions(null_behavior=NullBehavior.IGNORE))
        assert list(result.check_results.values())[0].status \
            == CheckStatus.ERROR
        assert _column(annotated, "item", "equality-check") == \
            [None, None, None, False, True, False]

    def test_null_rows_fail(self, df_numeric):
        result, annotated = self._run(
            df_numeric, AnalyzerOptions(null_behavior=NullBehavior.FAIL))
        assert list(result.check_results.values())[0].status \
            == CheckStatus.ERROR
        assert _column(annotated, "item", "equality-check") == \
            [False, False, False, False, True, False]


class TestEqualityLengthFilteredRows:
    """VerificationSuiteTest.scala:1879-1960 "==/!= based MinLength/
    MaxLength checks and filtered row behavior" on getDfForWhereClause."""

    def _checks(self, opts):
        return [
            Check(CheckLevel.ERROR, "length-equality-check-1")
            .has_min_length("Company", lambda v: v == 8,
                            analyzer_options=opts).where("ID > 2")
            .has_max_length("Company", lambda v: v == 8,
                            analyzer_options=opts).where("ID > 2"),
            Check(CheckLevel.ERROR, "length-equality-check-2")
            .has_min_length("ZipCode", lambda v: v == 4,
                            analyzer_options=opts).where("ID in (1, 2, 3)")
            .has_max_length("ZipCode", lambda v: v == 4,
                            analyzer_options=opts).where("ID in (1, 2, 3)"),
            Check(CheckLevel.ERROR, "length-equality-check-3")
            .has_min_length("City", lambda v: v != 0,
                            analyzer_options=opts).where("ID <= 2")
            .has_max_length("City", lambda v: v != 0,
                            analyzer_options=opts).where("ID <= 2"),
        ]

    def _assert_all(self, df_where_clause, opts, f):
        result, annotated = _run_row_level(df_where_clause,
                                           self._checks(opts))
        statuses = {c.description: r.status
                    for c, r in result.check_results.items()}
        assert statuses["length-equality-check-1"] == CheckStatus.SUCCESS
        assert statuses["length-equality-check-2"] == CheckStatus.ERROR
        assert statuses["length-equality-check-3"] == CheckStatus.SUCCESS
        expected = {
            # Company len: Acme=4 (filtered rows 1,2), Robocorp=8 → ==8
            "length-equality-check-1": [f, f, True, True],
            # ZipCode len: 5,5,null (in scope 1-3) → ==4 fails; row4 filtered
            "length-equality-check-2": [False, False, False, f],
            # City: rows 1,2 in scope len 11 → !=0 true; rows 3,4 filtered
            "length-equality-check-3": [True, True, f, f],
        }
        for rule, exp in expected.items():
            assert _column(annotated, "ID", rule) == exp, rule

    def test_filtered_null(self, df_where_clause):
        # NullBehavior.EmptyString so the in-scope NULL ZipCode row stays
        # definite-false (len 0 != 4), as the reference fixture expects
        self._assert_all(df_where_clause, AnalyzerOptions(
            null_behavior=NullBehavior.EMPTY_STRING,
            filtered_row=FilteredRowOutcome.NULL), None)

    def test_filtered_true(self, df_where_clause):
        self._assert_all(df_where_clause, AnalyzerOptions(
            null_behavior=NullBehavior.EMPTY_STRING,
            filtered_row=FilteredRowOutcome.TRUE), True)


class TestEqualityLengthNullRows:
    """VerificationSuiteTest.scala:1969-2060 "==/!= based MinLength/
    MaxLength checks and null row behavior" — City lengths 11,11,null,8;
    assertion 0 <= len <= 8."""

    def _run(self, df_where_clause, opts):
        assertion = lambda d: (d >= 0.0) & (d <= 8.0)  # noqa: E731
        check = (Check(CheckLevel.ERROR, "length-check")
                 .has_min_length("City", assertion, analyzer_options=opts)
                 .has_max_length("City", assertion, analyzer_options=opts))
        return _run_row_level(df_where_clause, [check])

    def _metrics(self, result):
        return {(m.instance, m.name): m.value
                for m in result.metrics.metric_map.values() if m.is_success}

    def test_ignore(self, df_where_clause):
        result, annotated = self._run(
            df_where_clause, AnalyzerOptions(null_behavior=NullBehavior.IGNORE))
        assert _column(annotated, "ID", "length-check") == \
            [False, False, None, True]
        m = self._metrics(result)
        assert m[("City", "MinLength")] == 8.0
        assert m[("City", "MaxLength")] == 11.0

    def test_fail(self, df_where_clause):
        from deequ_spark.analyzers.scan import (DOUBLE_MAX_VALUE,
                                                DOUBLE_MIN_VALUE)
        result, annotated = self._run(
            df_where_clause, AnalyzerOptions(null_behavior=NullBehavior.FAIL))
        assert _column(annotated, "ID", "length-check") == \
            [False, False, False, True]
        m = self._metrics(result)
        assert m[("City", "MinLength")] == DOUBLE_MIN_VALUE
        assert m[("City", "MaxLength")] == DOUBLE_MAX_VALUE

    def test_empty_string(self, df_where_clause):
        result, annotated = self._run(
            df_where_clause,
            AnalyzerOptions(null_behavior=NullBehavior.EMPTY_STRING))
        assert _column(annotated, "ID", "length-check") == \
            [False, False, True, True]
        m = self._metrics(result)
        assert m[("City", "MinLength")] == 0.0
        assert m[("City", "MaxLength")] == 11.0


class TestInvalidColumnTypeRowLevel:
    """VerificationSuiteTest.scala:2061-2117: a constraint whose metric
    failed a precondition (numeric analyzer on a string column, pattern on
    an int column) contributes lit(false) to its check's row-level
    column."""

    def test_invalid_columns_all_false(self, spark):
        df = spark.createDataFrame(
            [("1", 1, "blue"), ("2", 2, "green"), ("3", 3, "blue"),
             ("4", 4, "red"), ("5", 5, "purple")],
            "id string, id2 int, color string")
        checks = [
            Check(CheckLevel.ERROR, "min check on id")
            .has_min("id", lambda v: v >= 3).is_complete("id"),
            Check(CheckLevel.ERROR, "min check on id2")
            .has_min("id2", lambda v: v >= 3).is_complete("id2"),
            Check(CheckLevel.ERROR, "pattern check on id2")
            .has_pattern("id2", "[0-3]+"),
            Check(CheckLevel.ERROR, "pattern check on id")
            .has_pattern("id", "[0-3]+"),
        ]
        _, annotated = _run_row_level(df, checks)
        expected = {
            "min check on id": [False] * 5,
            "min check on id2": [False, False, True, True, True],
            "pattern check on id2": [False] * 5,
            "pattern check on id": [True, True, True, False, False],
        }
        for rule, exp in expected.items():
            assert _column(annotated, "id2", rule) == exp, rule


class TestSatisfiesRowLevel:
    """VerificationSuiteTest.scala:2117-2200 "yield correct results for
    satisfies check" — 14 assertion/where combinations."""

    def test_satisfies_matrix(self, spark):
        df = spark.createDataFrame(
            [(1, "blue"), (2, "green"), (3, "blue"), (4, "red"),
             (5, "purple")], "id int, color string")
        cond, where = "color in ('blue')", "id <= 3"
        cfg = [
            ("check with >", lambda d: d > 0.5, CheckStatus.ERROR, None),
            ("check with >=", lambda d: d >= 0.35, CheckStatus.SUCCESS, None),
            ("check with <", lambda d: d < 0.3, CheckStatus.ERROR, None),
            ("check with <=", lambda d: d <= 0.4, CheckStatus.SUCCESS, None),
            ("check with =", lambda d: d == 0.4, CheckStatus.SUCCESS, None),
            ("check with > / <", lambda d: (d > 0.0) and (d < 0.5),
             CheckStatus.SUCCESS, None),
            ("check with >= / <=", lambda d: (d >= 0.41) and (d <= 1.1),
             CheckStatus.ERROR, None),
            ("check w/ where and with >", lambda d: d > 0.7,
             CheckStatus.ERROR, where),
            ("check w/ where and with >=", lambda d: d >= 0.66,
             CheckStatus.SUCCESS, where),
            ("check w/ where and with <", lambda d: d < 0.6,
             CheckStatus.ERROR, where),
            ("check w/ where and with <=", lambda d: d <= 0.67,
             CheckStatus.SUCCESS, where),
            ("check w/ where and with =", lambda d: d == 0.66,
             CheckStatus.ERROR, where),
            ("check w/ where and with > / <", lambda d: (d > 0.0) and (d < 0.5),
             CheckStatus.ERROR, where),
            ("check w/ where and with >= / <=",
             lambda d: (d >= 0.41) and (d <= 1.1), CheckStatus.SUCCESS, where),
        ]
        checks = []
        for name, assertion, _status, w in cfg:
            c = (Check(CheckLevel.ERROR, name)
                 .satisfies(cond, f"Constraint for check: {name}", assertion))
            if w:
                c = c.where(w)
            checks.append(c)
        result, annotated = _run_row_level(df, checks)
        statuses = {c.description: r.status
                    for c, r in result.check_results.items()}
        for name, _a, status, _w in cfg:
            assert statuses[name] == status, name
        for name, _a, _s, w in cfg:
            got = _column(annotated, "id", name)
            if w:
                assert got == [True, False, True, True, True], name
            else:
                assert got == [True, False, True, False, False], name


class TestPatternMatchRowLevelFixtures:
    """analyzers/PatternMatchTest.scala:28-105 on getDfWithStringColumns
    (space-containing column names, NULL addresses on ids 4 and 7)."""

    @pytest.fixture(scope="class")
    def df_addresses(self, spark):
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

    def _row_level(self, df, column, pattern, where=None, options=None):
        from deequ_spark import PatternMatch
        from pyspark.sql import functions as F
        a = PatternMatch(column, pattern, where, options)
        col = a.row_level_results()
        return [r["new"] for r in
                df.withColumn("new", col).orderBy("id").collect()]

    def test_digits_anywhere(self, df_addresses):
        got = self._row_level(df_addresses, "Address Line 1", r"\d")
        assert got == [True] * 8

    def test_starts_with_digit(self, df_addresses):
        got = self._row_level(df_addresses, "Address Line 1", r"(^[0-4])")
        assert got == [False, False, True, True, False, False, True, True]

    def test_starts_with_digit_filtered_true(self, df_addresses):
        got = self._row_level(
            df_addresses, "Address Line 1", r"(^[0-4])", where="id < 5",
            options=AnalyzerOptions(filtered_row=FilteredRowOutcome.TRUE))
        assert got == [False, False, True, True, False, True, True, True]

    def test_nulls_are_false(self, df_addresses):
        got = self._row_level(df_addresses, "Address Line 2", r"\w")
        assert got == [True, True, True, True, False, True, True, False]

    def test_nulls_filtered_true(self, df_addresses):
        got = self._row_level(
            df_addresses, "Address Line 2", r"\w", where="id < 5",
            options=AnalyzerOptions(filtered_row=FilteredRowOutcome.TRUE))
        assert got == [True, True, True, True, False, True, True, True]

    def test_nulls_filtered_null(self, df_addresses):
        got = self._row_level(
            df_addresses, "Address Line 2", r"\w", where="id < 5",
            options=AnalyzerOptions(filtered_row=FilteredRowOutcome.NULL))
        assert got == [True, True, True, True, False, None, None, None]
