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
