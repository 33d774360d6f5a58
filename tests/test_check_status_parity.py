"""Check-status parity fixtures transcribed from the reference's
checks/CheckTest.scala (case names cited per class). These pin METRIC-level
check/constraint outcomes — the complement of the row-level truth tables in
test_reference_parity.py. Fixture data from utils/FixtureSupport.scala."""

import math

import pytest

from deequ_spark import (AnalyzerOptions, Check, CheckLevel, CheckStatus,
                         ConstraintStatus, DataTypeInstances, NullBehavior,
                         VerificationSuite)


def _run(df, *checks):
    suite = VerificationSuite().on_data(df)
    for c in checks:
        suite.add_check(c)
    result = suite.run()
    return {c.description: r for c, r in result.check_results.items()}, result


def _statuses(result_for_check):
    return [cr.status for cr in result_for_check.constraint_results]


@pytest.fixture(scope="module")
def df_full(spark):
    """getDfFull (FixtureSupport.scala:127-136)."""
    return spark.createDataFrame(
        [("1", "a", "c"), ("2", "a", "c"), ("3", "a", "c"), ("4", "b", "d")],
        "item string, att1 string, att2 string")


@pytest.fixture(scope="module")
def df_incomplete(spark):
    """getDfCompleteAndInCompleteColumns (FixtureSupport.scala:149-160)."""
    return spark.createDataFrame(
        [("1", "a", "f"), ("2", "b", "d"), ("3", "a", None),
         ("4", "a", "f"), ("5", "b", None), ("6", "a", "f")],
        "item string, att1 string, att2 string")


@pytest.fixture(scope="module")
def df_numeric(spark):
    return spark.createDataFrame(
        [("1", 1, 0, 0, None), ("2", 2, 0, 0, None), ("3", 3, 0, 0, None),
         ("4", 4, 5, 4, 5), ("5", 5, 6, 6, 6), ("6", 6, 7, 7, 7)],
        "item string, att1 int, att2 int, att3 int, attNull int")


@pytest.fixture(scope="module")
def df_unique_cols(spark):
    return spark.createDataFrame(
        [("1", "0", "3", "1", "5", "0"), ("2", "0", "3", "2", "6", "0"),
         ("3", "0", "3", None, "7", "0"), ("4", "5", None, "3", "0", "4"),
         ("5", "6", None, "4", "0", "5"), ("6", "7", None, "5", "0", "6")],
        "unique string, nonUnique string, nonUniqueWithNulls string, "
        "uniqueWithNulls string, onlyUniqueWithOtherNonUnique string, "
        "halfUniqueCombinedWithNonUnique string")


@pytest.fixture(scope="module")
def df_distinct(spark):
    """getDfWithDistinctValues (FixtureSupport.scala:341-352)."""
    return spark.createDataFrame(
        [("a", None), ("a", None), (None, "x"), ("b", "x"), ("b", "x"),
         ("c", "y")], "att1 string, att2 string")


class TestCompletenessStatus:
    """CheckTest.scala:53-110."""

    def test_completeness_levels_and_filters(self, df_incomplete):
        check1 = (Check(CheckLevel.ERROR, "group-1")
                  .is_complete("att1")
                  .has_completeness("att1", lambda v: v == 1.0))
        check2 = (Check(CheckLevel.ERROR, "group-2-E")
                  .has_completeness("att2", lambda v: v > 0.8))   # 0.75 is wrong: 4/6
        check3 = (Check(CheckLevel.WARNING, "group-2-W")
                  .has_completeness("att2", lambda v: v > 0.8))
        check4 = (Check(CheckLevel.ERROR, "group-3")
                  .is_complete("att2").where("att2 is NOT NULL")
                  .has_completeness("att2", lambda v: v == 1.0)
                  .where("att2 is NOT NULL"))
        got, _ = _run(df_incomplete, check1, check2, check3, check4)
        assert got["group-1"].status == CheckStatus.SUCCESS
        assert got["group-2-E"].status == CheckStatus.ERROR
        assert got["group-2-W"].status == CheckStatus.WARNING
        assert got["group-3"].status == CheckStatus.SUCCESS

    def test_completeness_with_where(self, spark):
        df = spark.createDataFrame(
            [(1, "Acme", "90210", "CA", "Los Angeles"),
             (2, "Acme", "90211", "CA", "Los Angeles"),
             (3, "Robocorp", None, "NJ", None),
             (4, "Robocorp", None, "NY", "New York")],
            "ID int, Company string, ZipCode string, State string, "
            "City string")
        check = (Check(CheckLevel.ERROR, "group-3")
                 .has_completeness("ZipCode", lambda v: v > 0.6)
                 .where("City is NOT NULL"))
        got, _ = _run(df, check)
        assert got["group-3"].status == CheckStatus.SUCCESS


class TestUniquenessStatus:
    """CheckTest.scala:171-315."""

    def test_is_unique_variants(self, df_unique_cols):
        check = (Check(CheckLevel.ERROR, "group-1")
                 .is_unique("unique")
                 .is_unique("uniqueWithNulls")
                 .is_unique("halfUniqueCombinedWithNonUnique")
                 .where("nonUnique > 0")
                 .is_unique("nonUnique")
                 .is_unique("nonUniqueWithNulls")
                 .are_unique(["nonUnique", "onlyUniqueWithOtherNonUnique"])
                 .are_unique(["nonUnique", "halfUniqueCombinedWithNonUnique"]))
        got, _ = _run(df_unique_cols, check)
        r = _statuses(got["group-1"])
        assert r[0] == ConstraintStatus.SUCCESS
        assert r[1] == ConstraintStatus.SUCCESS
        assert r[2] == ConstraintStatus.SUCCESS
        assert r[3] == ConstraintStatus.FAILURE
        assert r[4] == ConstraintStatus.FAILURE
        assert r[5] == ConstraintStatus.SUCCESS
        assert r[6] == ConstraintStatus.FAILURE
        assert got["group-1"].status == CheckStatus.ERROR

    def test_primary_key(self, df_unique_cols):
        check = (Check(CheckLevel.ERROR, "primary-key-check")
                 .is_primary_key("unique")
                 .is_primary_key("halfUniqueCombinedWithNonUnique",
                                 "onlyUniqueWithOtherNonUnique")
                 .is_primary_key("halfUniqueCombinedWithNonUnique")
                 .where("nonUnique > 0")
                 .is_primary_key("nonUnique"))
        got, _ = _run(df_unique_cols, check)
        r = _statuses(got["primary-key-check"])
        # each is_primary_key(col) = completeness + uniqueness constraints;
        # first three succeed, the last (nonUnique) fails on uniqueness
        assert all(s == ConstraintStatus.SUCCESS for s in r[:-1])
        assert r[-1] == ConstraintStatus.FAILURE

    def test_distinctness(self, df_distinct):
        check = (Check(CheckLevel.ERROR, "distinctness-check")
                 .has_distinctness(["att1"], lambda v: v == 3.0 / 5)
                 .has_distinctness(["att1"], lambda v: v == 2.0 / 3)
                 .where("att2 is not null")
                 .has_distinctness(["att1", "att2"], lambda v: v == 4.0 / 6)
                 .has_distinctness(["att2"], lambda v: v == 1.0))
        got, _ = _run(df_distinct, check)
        r = _statuses(got["distinctness-check"])
        assert r == [ConstraintStatus.SUCCESS, ConstraintStatus.SUCCESS,
                     ConstraintStatus.SUCCESS, ConstraintStatus.FAILURE]

    def test_has_uniqueness_fractions(self, df_unique_cols):
        is_one = lambda v: v == 1.0  # noqa: E731
        check = (Check(CheckLevel.ERROR, "group-1-u")
                 .has_uniqueness("nonUnique", lambda f: f == 0.5)
                 .has_uniqueness("nonUnique", lambda f: f < 0.6)
                 .has_uniqueness(["halfUniqueCombinedWithNonUnique",
                                  "nonUnique"], lambda f: f == 0.5)
                 .has_uniqueness(["onlyUniqueWithOtherNonUnique",
                                  "nonUnique"], is_one)
                 .has_uniqueness("unique", is_one)
                 .has_uniqueness("uniqueWithNulls", is_one)
                 .has_uniqueness(["nonUnique",
                                  "halfUniqueCombinedWithNonUnique"], is_one)
                 .where("nonUnique > 0")
                 .has_uniqueness("halfUniqueCombinedWithNonUnique", is_one)
                 .where("nonUnique > 0"))
        got, _ = _run(df_unique_cols, check)
        assert got["group-1-u"].status == CheckStatus.SUCCESS

    def test_duplicate_row_count(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("b", 2), ("a", 1), ("c", 3)], "col1 string, col2 int")
        check = (Check(CheckLevel.ERROR, "duplicate-row-count-check")
                 .has_duplicate_row_count(["col1", "col2"], lambda v: v == 2))
        got, _ = _run(df, check)
        assert got["duplicate-row-count-check"].status == CheckStatus.SUCCESS

    def test_unique_value_ratio(self, df_unique_cols):
        check = (Check(CheckLevel.ERROR, "unique-value-ratio-check")
                 .has_unique_value_ratio(
                     ["nonUnique", "halfUniqueCombinedWithNonUnique"],
                     lambda v: v == 0.75)
                 .has_unique_value_ratio(
                     ["nonUnique", "halfUniqueCombinedWithNonUnique"],
                     lambda v: v == 1.0).where("nonUnique > 0")
                 .has_unique_value_ratio(["nonUnique"], lambda v: v == 1.0)
                 .where("nonUnique > 0"))
        got, _ = _run(df_unique_cols, check)
        assert got["unique-value-ratio-check"].status == CheckStatus.SUCCESS


class TestSizeAndSatisfiesStatus:
    """CheckTest.scala:317-382."""

    def test_size_levels(self, df_incomplete):
        n = df_incomplete.count()
        c1 = Check(CheckLevel.ERROR, "group-1-S-1").has_size(lambda s: s == n)
        c2 = Check(CheckLevel.WARNING, "group-1-S-2").has_size(lambda s: s == n)
        c3 = Check(CheckLevel.ERROR, "group-1-E").has_size(lambda s: s != n)
        c4 = Check(CheckLevel.WARNING, "group-1-W").has_size(lambda s: s != n)
        c5 = (Check(CheckLevel.WARNING, "group-1-W-Range")
              .has_size(lambda s: (s > 0) and (s < n + 1)))
        got, _ = _run(df_incomplete, c1, c2, c3, c4, c5)
        assert got["group-1-S-1"].status == CheckStatus.SUCCESS
        assert got["group-1-S-2"].status == CheckStatus.SUCCESS
        assert got["group-1-E"].status == CheckStatus.ERROR
        assert got["group-1-W"].status == CheckStatus.WARNING
        assert got["group-1-W-Range"].status == CheckStatus.SUCCESS

    def test_satisfies_columns(self, df_numeric):
        c1 = (Check(CheckLevel.ERROR, "group-1")
              .satisfies("att1 > 0", "rule1", columns=["att1"]))
        c2 = (Check(CheckLevel.ERROR, "group-2-to-fail")
              .satisfies("att1 > 3", "rule2", columns=["att1"]))
        c3 = (Check(CheckLevel.ERROR, "group-2-to-succeed")
              .satisfies("att1 > 3", "rule3", lambda v: v == 0.5,
                         columns=["att1"]))
        got, _ = _run(df_numeric, c1, c2, c3)
        assert got["group-1"].status == CheckStatus.SUCCESS
        assert got["group-2-to-fail"].status == CheckStatus.ERROR
        assert got["group-2-to-succeed"].status == CheckStatus.SUCCESS

    def test_conditional_satisfies(self, df_numeric):
        ok = (Check(CheckLevel.ERROR, "group-1a")
              .satisfies("att1 < att2", "rule1", columns=["att1"])
              .where("att1 > 3"))
        fail = (Check(CheckLevel.ERROR, "group-1b")
                .satisfies("att2 > 0", "rule2", columns=["att1"])
                .where("att1 > 0"))
        half = (Check(CheckLevel.ERROR, "group-1c")
                .satisfies("att2 > 0", "rule3", lambda v: v == 0.5,
                           columns=["att1"]).where("att1 > 0"))
        got, _ = _run(df_numeric, ok, fail, half)
        assert got["group-1a"].status == CheckStatus.SUCCESS
        assert got["group-1b"].status == CheckStatus.ERROR
        assert got["group-1c"].status == CheckStatus.SUCCESS


class TestComparisonStatus:
    """CheckTest.scala:383-527."""

    def test_less_than(self, df_numeric):
        cases = [
            ("lt-where", Check(CheckLevel.ERROR, "lt-where")
             .is_less_than("att1", "att2").where("item > 3"), CheckStatus.SUCCESS),
            ("lt", Check(CheckLevel.ERROR, "lt")
             .is_less_than("att1", "att2"), CheckStatus.ERROR),
            ("lt-half", Check(CheckLevel.ERROR, "lt-half")
             .is_less_than("att1", "att2", lambda v: v == 0.5),
             CheckStatus.SUCCESS),
            ("lt-wrong", Check(CheckLevel.ERROR, "lt-wrong")
             .is_less_than("att1", "att2", lambda v: v == 0.4),
             CheckStatus.ERROR),
            ("le-where", Check(CheckLevel.ERROR, "le-where")
             .is_less_than_or_equal_to("att1", "att3").where("item > 3"),
             CheckStatus.SUCCESS),
            ("le", Check(CheckLevel.ERROR, "le")
             .is_less_than_or_equal_to("att1", "att3"), CheckStatus.ERROR),
            ("gt-where", Check(CheckLevel.ERROR, "gt-where")
             .is_greater_than("att2", "att1").where("item > 3"),
             CheckStatus.SUCCESS),
            ("gt", Check(CheckLevel.ERROR, "gt")
             .is_greater_than("att2", "att1"), CheckStatus.ERROR),
            ("ge-where", Check(CheckLevel.ERROR, "ge-where")
             .is_greater_than_or_equal_to("att3", "att1").where("item > 3"),
             CheckStatus.SUCCESS),
            ("ge", Check(CheckLevel.ERROR, "ge")
             .is_greater_than_or_equal_to("att3", "att1"), CheckStatus.ERROR),
        ]
        got, _ = _run(df_numeric, *[c for _, c, _s in cases])
        for name, _c, status in cases:
            assert got[name].status == status, name

    def test_non_negative_positive(self, df_numeric):
        c1 = Check(CheckLevel.ERROR, "nn").is_non_negative("item")
        c2 = Check(CheckLevel.ERROR, "pos").is_positive("item")
        got, _ = _run(df_numeric, c1, c2)
        assert got["nn"].status == CheckStatus.SUCCESS
        assert got["pos"].status == CheckStatus.SUCCESS

    def test_space_column_names(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (-1, "d")],
            "`my column` long, other string")
        check = (Check(CheckLevel.ERROR, "space check")
                 .is_non_negative("my column"))
        got, _ = _run(df, check)
        assert got["space check"].status == CheckStatus.ERROR

    def test_negative_bigint(self, spark):
        df = spark.createDataFrame([(-99999999999,), (1,), (2,)], "val long")
        check = Check(CheckLevel.ERROR, "bigint check").is_non_negative("val")
        got, _ = _run(df, check)
        assert got["bigint check"].status == CheckStatus.ERROR

    def test_positive_zero_fails(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (0, "c")], "`my column` long, other string")
        check = Check(CheckLevel.ERROR, "space check").is_positive("my column")
        got, _ = _run(df, check)
        assert got["space check"].status == CheckStatus.ERROR

    def test_space_names_in_comparison(self, spark):
        df = spark.createDataFrame([(1, 2), (3, 4), (5, 0)],
                                   "`col a` int, `col b` int")
        check = (Check(CheckLevel.ERROR, "comparison check")
                 .is_less_than("col a", "col b"))
        got, _ = _run(df, check)
        assert got["comparison check"].status == CheckStatus.ERROR


class TestRangeStatus:
    """CheckTest.scala:528-600 — set and interval isContainedIn."""

    def test_value_sets(self, df_distinct):
        c1 = (Check(CheckLevel.ERROR, "a1")
              .is_contained_in("att1", ["a", "b", "c"]))
        c2 = (Check(CheckLevel.ERROR, "a2")
              .is_contained_in("att1", ["a", "b"]))
        c3 = (Check(CheckLevel.ERROR, "a3")
              .is_contained_in("att1", ["a"], lambda v: v == 0.5))
        got, _ = _run(df_distinct, c1, c2, c3)
        assert got["a1"].status == CheckStatus.SUCCESS
        assert got["a2"].status == CheckStatus.ERROR
        # 'a' rows = 2 of 6, NULL row passes → 3/6 = 0.5
        assert got["a3"].status == CheckStatus.SUCCESS

    def test_numeric_intervals(self, df_numeric):
        # att2 = 0,0,0,5,6,7
        cases = [
            ("nr1", 0, 7, True, True, CheckStatus.SUCCESS),
            ("nr2", 1, 7, True, True, CheckStatus.ERROR),
            ("nr3", 0, 6, True, True, CheckStatus.ERROR),
            ("nr4", 0, 7, False, False, CheckStatus.ERROR),
            ("nr5", -1, 8, False, False, CheckStatus.SUCCESS),
            ("nr6", 0, 7, True, False, CheckStatus.ERROR),
            ("nr7", 0, 8, True, False, CheckStatus.SUCCESS),
            ("nr8", 0, 7, False, True, CheckStatus.ERROR),
            ("nr9", -1, 7, False, True, CheckStatus.SUCCESS),
        ]
        checks = [Check(CheckLevel.ERROR, name)
                  .is_contained_in_range("att2", lo, hi, ilo, ihi)
                  for name, lo, hi, ilo, ihi, _s in cases]
        got, _ = _run(df_numeric, *checks)
        for name, _lo, _hi, _ilo, _ihi, status in cases:
            assert got[name].status == status, name

    def test_single_quotes_in_values(self, spark):
        df = spark.createDataFrame(
            [("a", None, "Already Has "), ("a", None, " Can't Proceed"),
             (None, "can't", "Already Has "), ("b", "help", " Can't Proceed"),
             ("b", "but", "Already Has "), ("c", "wouldn't", " Can't Proceed")],
            "att1 string, att2 string, reason string")
        check = (Check(CheckLevel.ERROR, "a")
                 .is_contained_in("att2", ["can't", "help", "but",
                                           "wouldn't"]))
        got, _ = _run(df, check)
        assert got["a"].status == CheckStatus.SUCCESS


class TestStatsStatus:
    """CheckTest.scala:901-1041 — entropy/MI/basic stats/quantiles."""

    def test_entropy(self, df_full):
        expected = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
        c1 = (Check(CheckLevel.ERROR, "e1")
              .has_entropy("att1", lambda v: abs(v - expected) < 1e-12))
        c2 = (Check(CheckLevel.ERROR, "e2")
              .has_entropy("att1", lambda v: v == 0).where("att2 = 'c'"))
        c3 = (Check(CheckLevel.ERROR, "e3")
              .has_entropy("att1", lambda v: abs(v - expected) > 1e-12))
        got, _ = _run(df_full, c1, c2, c3)
        assert got["e1"].status == CheckStatus.SUCCESS
        assert got["e2"].status == CheckStatus.SUCCESS
        assert got["e3"].status == CheckStatus.ERROR

    def test_mutual_information(self, df_full):
        c1 = (Check(CheckLevel.ERROR, "mi")
              .has_mutual_information(
                  "att1", "att2", lambda v: abs(v - 0.5623) < 0.0001))
        c2 = (Check(CheckLevel.ERROR, "mi-where")
              .has_mutual_information("att1", "att2", lambda v: v == 0)
              .where("att2 = 'c'"))
        got, _ = _run(df_full, c1, c2)
        assert got["mi"].status == CheckStatus.SUCCESS
        assert got["mi-where"].status == CheckStatus.SUCCESS

    def test_basic_stats(self, df_numeric):
        check = (Check(CheckLevel.ERROR, "stats")
                 .has_min("att1", lambda v: v == 1.0)
                 .has_max("att1", lambda v: v == 6.0)
                 .has_range("att1", lambda v: v == 5.0)
                 .has_interquartile_range("att1", lambda v: v == 2.5)
                 .has_mean("att1", lambda v: v == 3.5)
                 .has_sum("att1", lambda v: v == 21.0)
                 .has_standard_deviation(
                     "att1", lambda v: abs(v - 1.707825127659933) < 1e-12)
                 .has_variance(
                     "att1", lambda v: abs(v - 2.9166666666666665) < 1e-12)
                 .has_skewness("att1", lambda v: abs(v) < 1e-12)
                 .has_kurtosis("att1", lambda v: v < 0.0)
                 .has_approx_count_distinct("att1", lambda v: v == 6.0)
                 .has_approx_quantile("att1", 0.5, lambda v: v == 3.0)
                 .has_exact_quantile("att1", 0.5, lambda v: v == 3.5))
        got, _ = _run(df_numeric, check)
        assert got["stats"].status == CheckStatus.SUCCESS, \
            [(str(cr.constraint), cr.message)
             for cr in got["stats"].constraint_results
             if cr.status != ConstraintStatus.SUCCESS]

    def test_correlation_informative_and_nan(self, spark):
        informative = spark.createDataFrame(
            [(1, 4), (2, 5), (3, 6)], "att1 int, att2 int")
        uninformative = spark.createDataFrame(
            [(1, 0), (2, 0), (3, 0)], "att1 int, att2 int")
        c1 = (Check(CheckLevel.ERROR, "corr")
              .has_correlation("att1", "att2", lambda v: v == 1.0))
        got1, _ = _run(informative, c1)
        assert got1["corr"].status == CheckStatus.SUCCESS
        c2 = (Check(CheckLevel.ERROR, "corr-nan")
              .has_correlation("att1", "att2", math.isnan))
        got2, _ = _run(uninformative, c2)
        assert got2["corr-nan"].status == CheckStatus.SUCCESS

    def test_mean_and_quantiles_with_filter(self, df_numeric):
        checks = [
            Check(CheckLevel.ERROR, "m1").has_mean("att1", lambda v: v == 3.5),
            Check(CheckLevel.ERROR, "m2")
            .has_mean("att1", lambda v: v == 5.0).where("att2 > 0"),
            Check(CheckLevel.ERROR, "q1")
            .has_approx_quantile("att1", 0.5, lambda v: v == 3.0),
            Check(CheckLevel.ERROR, "q2")
            .has_approx_quantile("att1", 0.5, lambda v: v == 5.0)
            .where("att2 > 0"),
            Check(CheckLevel.ERROR, "eq1")
            .has_exact_quantile("att1", 0.5, lambda v: v == 3.5),
            Check(CheckLevel.ERROR, "eq2")
            .has_exact_quantile("att1", 0.5, lambda v: v == 5.0)
            .where("att2 > 0"),
        ]
        got, _ = _run(df_numeric, *checks)
        for name in ("m1", "m2", "q1", "q2", "eq1", "eq2"):
            assert got[name].status == CheckStatus.SUCCESS, name

    def test_length_stats(self, spark):
        df = spark.createDataFrame([("",), ("a",), ("bb",), ("ccc",),
                                    ("dddd",)], "att1 string")
        check = (Check(CheckLevel.ERROR, "len")
                 .has_min_length("att1", lambda v: v == 0.0)
                 .has_max_length("att1", lambda v: v == 4.0))
        got, _ = _run(df, check)
        assert got["len"].status == CheckStatus.SUCCESS

    def test_length_stats_with_where(self, spark):
        df = spark.createDataFrame(
            [("1", "a", "f", 1, 1), ("22", "b", "d", 2, None),
             ("333", "a", None, 3, 3), ("4444", "a", "f", 4, 4),
             ("55555", "b", None, 5, None), ("666666", "a", "f", 6, 6)],
            "item string, att1 string, att2 string, val1 int, val2 int")
        opts = AnalyzerOptions(null_behavior=NullBehavior.EMPTY_STRING)
        check = (Check(CheckLevel.ERROR, "len-where")
                 .has_min_length("item", lambda v: v >= 4.0,
                                 analyzer_options=opts).where("val1 > 3")
                 .has_max_length("item", lambda v: v <= 3.0,
                                 analyzer_options=opts).where("val1 <= 3"))
        got, _ = _run(df, check)
        assert got["len-where"].status == CheckStatus.SUCCESS


class TestPatternStatus:
    """CheckTest.scala:1043-1260 — built-in pattern families and data
    types, each with a where-filtered variant."""

    def _two_row(self, spark, valid, invalid):
        return spark.createDataFrame([(valid, "valid"), (invalid, "invalid")],
                                     "value string, type string")

    def test_email(self, spark):
        df = self._two_row(spark, "someone@somewhere.org", "someone@else")
        c1 = (Check(CheckLevel.ERROR, "e1")
              .contains_email("value", lambda v: v == 0.5))
        c2 = (Check(CheckLevel.ERROR, "e2")
              .contains_email("value", lambda v: v == 1.0)
              .where("type = 'valid'"))
        got, _ = _run(df, c1, c2)
        assert got["e1"].status == CheckStatus.SUCCESS
        assert got["e2"].status == CheckStatus.SUCCESS

    def test_credit_card(self, spark):
        df = self._two_row(spark, "4111 1111 1111 1111", "9999888877776666")
        c1 = (Check(CheckLevel.ERROR, "cc1")
              .contains_credit_card_number("value", lambda v: v == 0.5))
        c2 = (Check(CheckLevel.ERROR, "cc2")
              .contains_credit_card_number("value", lambda v: v == 1.0)
              .where("type = 'valid'"))
        got, _ = _run(df, c1, c2)
        assert got["cc1"].status == CheckStatus.SUCCESS
        assert got["cc2"].status == CheckStatus.SUCCESS

    def test_ssn(self, spark):
        df = self._two_row(spark, "111-05-1130", "something else")
        c1 = (Check(CheckLevel.ERROR, "s1")
              .contains_social_security_number("value", lambda v: v == 0.5))
        c2 = (Check(CheckLevel.ERROR, "s2")
              .contains_social_security_number("value", lambda v: v == 1.0)
              .where("type = 'valid'"))
        got, _ = _run(df, c1, c2)
        assert got["s1"].status == CheckStatus.SUCCESS
        assert got["s2"].status == CheckStatus.SUCCESS

    def test_url(self, spark):
        df = self._two_row(
            spark, "https://www.example.com/foo/?bar=baz&inga=42&quux",
            "http:// shouldfail.com")
        c1 = (Check(CheckLevel.ERROR, "u1")
              .contains_url("value", lambda v: v == 0.5))
        c2 = (Check(CheckLevel.ERROR, "u2")
              .contains_url("value", lambda v: v == 1.0)
              .where("type = 'valid'"))
        got, _ = _run(df, c1, c2)
        assert got["u1"].status == CheckStatus.SUCCESS
        assert got["u2"].status == CheckStatus.SUCCESS

    def test_data_type(self, spark):
        df = self._two_row(spark, "2", "1.0")
        c1 = (Check(CheckLevel.ERROR, "dt1")
              .has_data_type("value", DataTypeInstances.INTEGRAL,
                             lambda v: v == 0.5))
        c2 = (Check(CheckLevel.ERROR, "dt2")
              .has_data_type("value", DataTypeInstances.INTEGRAL,
                             lambda v: v == 1.0).where("type = 'integral'"))
        # fixture uses ("2","integral"), ("1.0","fractional")
        df = spark.createDataFrame([("2", "integral"), ("1.0", "fractional")],
                                   "value string, type string")
        got, _ = _run(df, c1, c2)
        assert got["dt1"].status == CheckStatus.SUCCESS
        assert got["dt2"].status == CheckStatus.SUCCESS

    def test_scientific_notation_fractional(self, spark):
        df = spark.createDataFrame(
            [("1.0",), ("1.0000",), ("1.0001",), ("1.0E-3",), ("1.0e-3",),
             ("1E-3",)], "val string")
        c1 = (Check(CheckLevel.ERROR, "they're all fractional")
              .has_data_type("val", DataTypeInstances.FRACTIONAL,
                             lambda v: v == 1.0))
        c2 = Check(CheckLevel.ERROR, "they're positive").is_non_negative("val")
        got, _ = _run(df, c1, c2)
        assert got["they're all fractional"].status == CheckStatus.SUCCESS
        assert got["they're positive"].status == CheckStatus.SUCCESS


class TestDatasetMatchStatus:
    """CheckTest.scala:1499-1630 doesDatasetMatch on the informative
    (att1=1,2,3 / att2=4,5,6) fixture."""

    @pytest.fixture(scope="class")
    def informative(self, spark):
        return spark.createDataFrame([(1, 4), (2, 5), (3, 6)],
                                     "att1 int, att2 int")

    def test_basic_sync(self, informative):
        c1 = (Check(CheckLevel.ERROR, "sync1")
              .does_dataset_match(informative, {"att1": "att1"},
                                  lambda v: v > 0.9))
        c2 = (Check(CheckLevel.ERROR, "sync2")
              .does_dataset_match(informative, {"att1": "att1"},
                                  lambda v: v > 0.9,
                                  match_col_map={"att1": "att1"}))
        got, _ = _run(informative, c1, c2)
        assert got["sync1"].status == CheckStatus.SUCCESS
        assert got["sync2"].status == CheckStatus.SUCCESS

    def test_missing_column_fails(self, informative):
        renamed = informative.withColumnRenamed("att1", "att1_renamed")
        check = (Check(CheckLevel.ERROR, "missing-col")
                 .does_dataset_match(renamed, {"att1": "att1"},
                                     lambda v: v > 0.9))
        got, _ = _run(informative, check)
        assert got["missing-col"].status == CheckStatus.ERROR

    def test_row_count_mismatch_fails(self, informative):
        filtered = informative.filter("att1 > 2")
        check = (Check(CheckLevel.ERROR, "rowcount")
                 .does_dataset_match(filtered, {"att1": "att1"},
                                     lambda v: v > 0.9))
        got, _ = _run(informative, check)
        assert got["rowcount"].status == CheckStatus.ERROR

    def test_partial_match_thresholds(self, informative, spark):
        from pyspark.sql import functions as F
        modified = informative.withColumn(
            "att1", F.when(F.col("att1") == 3, 4).otherwise(F.col("att1")))
        strict = (Check(CheckLevel.ERROR, "strict")
                  .does_dataset_match(modified, {"att1": "att1"},
                                      lambda v: v > 0.9))
        loose = (Check(CheckLevel.ERROR, "loose")
                 .does_dataset_match(modified, {"att1": "att1"},
                                     lambda v: v > 0.6))
        got, _ = _run(informative, strict, loose)
        assert got["strict"].status == CheckStatus.ERROR
        assert got["loose"].status == CheckStatus.SUCCESS

    def test_multi_column_key(self, informative):
        check = (Check(CheckLevel.ERROR, "multi")
                 .does_dataset_match(informative,
                                     {"att1": "att1", "att2": "att2"},
                                     lambda v: v > 0.9))
        got, _ = _run(informative, check)
        assert got["multi"].status == CheckStatus.SUCCESS


class TestIllDefinedCheckIsolation:
    """VerificationSuiteTest.scala:1242-1390: ill-defined checks (missing
    columns, type mismatches, throwing assertions) fail ALONE — sibling
    well-defined checks in the same fused run still succeed."""

    @pytest.fixture(scope="class")
    def name_age(self, spark):
        return spark.createDataFrame(
            [("Max", 21), ("Sarah", 34), ("Ayman", 19)],
            "name string, age int")

    def test_missing_columns_and_type_errors_isolated(self, name_age):
        ok = Check(CheckLevel.ERROR, "shouldSucceedForValue").is_complete("name")
        missing = Check(CheckLevel.ERROR, "missingComplete").is_complete("fake")
        age_ok = (Check(CheckLevel.ERROR, "shouldSucceedForAge")
                  .is_contained_in_range("age", 1, 100))
        age_fail = (Check(CheckLevel.ERROR, "shouldFailForAge")
                    .is_contained_in_range("age", 1, 19))
        missing_range = (Check(CheckLevel.ERROR, "missingRange")
                         .is_contained_in_range("fakeColumn", 10, 90))
        string_range = (Check(CheckLevel.ERROR, "stringRange")
                        .is_contained_in_range("name", 1, 3))
        missing_completeness = (Check(CheckLevel.ERROR, "missingCompleteness")
                                .has_completeness("fake", lambda x: x > 0))
        sync = (Check(CheckLevel.ERROR, "syncOk")
                .does_dataset_match(name_age, {"age": "age"},
                                    lambda v: v > 0.99))
        got, _ = _run(name_age, ok, missing, age_ok, age_fail, missing_range,
                      string_range, missing_completeness, sync)
        assert got["shouldSucceedForValue"].status == CheckStatus.SUCCESS
        assert got["shouldSucceedForAge"].status == CheckStatus.SUCCESS
        assert got["syncOk"].status == CheckStatus.SUCCESS
        for bad in ("missingComplete", "shouldFailForAge", "missingRange",
                    "stringRange", "missingCompleteness"):
            assert got[bad].status == CheckStatus.ERROR, bad
        # missing-column failures carry the column name in the message
        msg = got["missingComplete"].constraint_results[0].message
        assert "fake" in msg

    def test_throwing_assertion_isolated(self, name_age):
        ok = Check(CheckLevel.ERROR, "fine").is_complete("name")

        def boom(_):
            raise ValueError("borked")

        throwing = Check(CheckLevel.ERROR, "shouldThrow").has_size(boom)
        got, _ = _run(name_age, ok, throwing)
        assert got["fine"].status == CheckStatus.SUCCESS
        assert got["shouldThrow"].status == CheckStatus.ERROR
        assert "borked" in got["shouldThrow"].constraint_results[0].message


class TestCustomSqlParity:
    """analyzers/CustomSqlTest.scala:31-104 on getDfWithStringColumns."""

    @pytest.fixture(scope="class")
    def df_addr(self, spark):
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

    def test_single_value(self, df_addr):
        from deequ_spark import CustomSql
        m = CustomSql("SELECT COUNT(*) FROM primary "
                      "WHERE `Address Line 2` IS NOT NULL").calculate(df_addr)
        assert m.is_success and m.value == 6.0

    def test_multiple_rows_fail(self, df_addr):
        from deequ_spark import CustomSql
        m = CustomSql("SELECT `Address Line 2` FROM primary "
                      "WHERE `Address Line 2` IS NOT NULL").calculate(df_addr)
        assert not m.is_success
        assert "row" in str(m.error)

    def test_multiple_columns_fail(self, df_addr):
        from deequ_spark import CustomSql
        m = CustomSql(
            "SELECT `Address Line 1`, `Address Line 2` FROM primary "
            "WHERE `Address Line 3` like 'Bandra%'").calculate(df_addr)
        assert not m.is_success
        assert "column" in str(m.error)

    def test_syntax_error_carries_message(self, df_addr):
        from deequ_spark import CustomSql
        m = CustomSql("SELECT `foo` FROM primary").calculate(df_addr)
        assert not m.is_success
        assert "foo" in str(m.error)

    def test_disambiguator_becomes_instance(self, df_addr):
        from deequ_spark import CustomSql
        from deequ_spark.metrics import Entity
        a = CustomSql("SELECT COUNT(*) FROM primary "
                      "WHERE `Address Line 2` IS NOT NULL", "statement1")
        m = a.calculate(df_addr)
        assert m.is_success and m.value == 6.0
        assert m.name == "CustomSQL"
        assert m.entity == Entity.DATASET
        assert m.instance == "statement1"


class TestZerosCountParity:
    """analyzers/ZerosCountTest.scala:34-125."""

    def test_fixture_values(self, spark, df_numeric):
        from deequ_spark import ZerosCount
        assert ZerosCount("att2").calculate(df_numeric).value == 3.0
        assert ZerosCount("att1").calculate(df_numeric).value == 0.0
        assert ZerosCount("att2", where="item != '1'") \
            .calculate(df_numeric).value == 2.0
        m = ZerosCount("att1").calculate(df_numeric)
        from deequ_spark.metrics import Entity
        assert m.entity == Entity.COLUMN and m.name == "ZerosCount" \
            and m.instance == "att1"

    def test_all_zero_and_types(self, spark):
        from deequ_spark import ZerosCount
        assert ZerosCount("v").calculate(
            spark.createDataFrame([(0.0,)] * 3, "v double")).value == 3.0
        assert ZerosCount("v").calculate(
            spark.createDataFrame([(0,), (1,), (0,), (2,), (0,)],
                                  "v int")).value == 3.0
        assert ZerosCount("v").calculate(
            spark.createDataFrame([(0,), (1,), (0,)], "v long")).value == 2.0
        from decimal import Decimal
        assert ZerosCount("v").calculate(
            spark.createDataFrame([(Decimal("0.00"),), (Decimal("1.00"),),
                                   (Decimal("0.00"),)],
                                  "v decimal(10,2)")).value == 2.0

    def test_nulls_not_zeros(self, spark):
        from deequ_spark import ZerosCount
        df = spark.createDataFrame(
            [(0.0,), (None,), (0.0,), (None,), (5.0,)], "value double")
        assert ZerosCount("value").calculate(df).value == 2.0
        all_null = spark.createDataFrame([(None,)] * 3, "value double")
        assert ZerosCount("value").calculate(all_null).value == 0.0

    def test_non_numeric_fails(self, spark, df_full):
        from deequ_spark import ZerosCount
        assert not ZerosCount("att1").calculate(df_full).is_success

    def test_merge_states(self, spark, df_numeric):
        from deequ_spark import ZerosCount
        a = ZerosCount("att2")
        half1 = df_numeric.where("item <= 3")
        half2 = df_numeric.where("item > 3")
        merged = a.compute_state_from(half1).merge(a.compute_state_from(half2))
        assert a.compute_metric_from_state(merged).value == \
            a.calculate(df_numeric).value


class TestCustomAggregatorParity:
    """analyzers/CustomAggregatorTest.scala:40-110: the reference's
    (counts, total) state shape renders count/total ratios; lambda and
    zero-total failures surface as failure metrics."""

    def test_counts_become_ratios(self, spark):
        from deequ_spark import AggregatedMetricState, CustomAggregator
        df = spark.createDataFrame([(1,)], "id int")
        a = CustomAggregator(
            lambda _: AggregatedMetricState({"ProductA": 50, "ProductB": 45},
                                            100), "ProductSales")
        m = a.calculate(df)
        assert m.is_success
        assert m.value["ProductA"] == 0.5
        assert m.value["ProductB"] == 0.45

    def test_empty_counts_ok(self, spark):
        from deequ_spark import AggregatedMetricState, CustomAggregator
        df = spark.createDataFrame([(1,)], "id int")
        a = CustomAggregator(lambda _: AggregatedMetricState({}, 100),
                             "WebsiteTraffic")
        m = a.calculate(df)
        assert m.is_success and m.value == {}

    def test_lambda_failure_is_failure_metric(self, spark):
        from deequ_spark import CustomAggregator
        df = spark.createDataFrame([(1,)], "id int")

        def boom(_):
            raise RuntimeError("Test failure")

        m = CustomAggregator(boom, "ProductSales").calculate(df)
        assert not m.is_success
        assert "Test failure" in str(m.error)

    def test_state_merge_sums_counts(self, spark):
        from deequ_spark import AggregatedMetricState
        merged = (AggregatedMetricState({"a": 2}, 10)
                  .merge(AggregatedMetricState({"a": 3, "b": 5}, 10)))
        assert merged.counts == {"a": 5, "b": 5} and merged.total == 20
        assert merged.ratios == {"a": 0.25, "b": 0.25}


class TestHistogramConstraintStatus:
    """CheckTest.scala:595-700 "check status for histogram constraints" on
    getDfCompleteAndInCompleteColumns (att1 a×4/b×2; att2 f×3,d×1,null×2)."""

    def test_value_and_ratio_assertions(self, df_incomplete):
        c1 = (Check(CheckLevel.ERROR, "basic-categorical-tests")
              .has_number_of_distinct_values("att1", lambda v: v < 10)
              .has_histogram_values("att1", lambda d: d["a"].absolute == 4)
              .has_histogram_values("att1", lambda d: d["b"].absolute == 2)
              .has_histogram_values("att1", lambda d: d["a"].ratio > 0.6)
              .has_histogram_values("att1", lambda d: d["b"].ratio < 0.4))
        c2 = (Check(CheckLevel.ERROR, "filtered-constraint-tests")
              .has_histogram_values("att1", lambda d: d["a"].absolute == 3)
              .where("att2 is not null")
              .has_histogram_values("att1", lambda d: d["b"].absolute == 1)
              .where("att2 is not null"))
        c3 = (Check(CheckLevel.ERROR, "null-handling-tests")
              .has_number_of_distinct_values("att2", lambda v: v == 3)
              .has_number_of_distinct_values("att2", lambda v: v == 2)
              .where("att1 = 'a'")
              .has_histogram_values("att2", lambda d: d["f"].absolute == 3)
              .has_histogram_values("att2", lambda d: d["d"].absolute == 1)
              .has_histogram_values(
                  "att2", lambda d: d["NullValue"].absolute == 2)
              .has_histogram_values("att2", lambda d: d["f"].ratio == 3 / 6.0)
              .has_histogram_values("att2", lambda d: d["d"].ratio == 1 / 6.0)
              .has_histogram_values(
                  "att2", lambda d: d["NullValue"].ratio == 2 / 6.0))
        c4 = (Check(CheckLevel.ERROR, "edge-case-tests")
              .has_histogram_values(
                  "att1", lambda d: "nonexistent" not in d.values)
              .has_histogram_values("att2", lambda d: d["f"].ratio <= 1.0)
              .has_histogram_values("att2", lambda d: d["d"].ratio >= 0.0))
        c5 = (Check(CheckLevel.ERROR, "complex-filter-tests")
              .has_histogram_values("att1", lambda d: d["a"].absolute >= 1)
              .where("att2 = 'f'")
              .has_histogram_values("att2", lambda d: d["f"].absolute >= 2)
              .where("att1 in ('a', 'b')"))
        c6 = (Check(CheckLevel.ERROR, "maxBins-parameter-tests")
              .has_histogram_values("att1", lambda d: d["a"].absolute == 4,
                                    max_bins=10)
              .has_histogram_values("att2", lambda d: d["f"].absolute == 3,
                                    max_bins=5)
              .has_histogram_values("att2", lambda d: "d" not in d.values,
                                    max_bins=1))
        c8 = (Check(CheckLevel.ERROR, "failure-tests")
              .has_number_of_distinct_values("unKnownColumn",
                                             lambda v: v == 3))
        got, _ = _run(df_incomplete, c1, c2, c3, c4, c5, c6, c8)
        for ok in ("basic-categorical-tests", "filtered-constraint-tests",
                   "null-handling-tests", "edge-case-tests",
                   "complex-filter-tests", "maxBins-parameter-tests"):
            assert got[ok].status == CheckStatus.SUCCESS, (
                ok, [(str(cr.constraint), cr.message)
                     for cr in got[ok].constraint_results
                     if cr.status != ConstraintStatus.SUCCESS])
        assert got["failure-tests"].status == CheckStatus.ERROR

    def test_count_aggregation_default(self, spark):
        df = spark.createDataFrame(
            [("a", 10), ("a", 20), ("b", 30), ("b", 40)],
            "category string, value int")
        check = (Check(CheckLevel.ERROR, "aggregate-function-tests")
                 .has_histogram_values("category",
                                       lambda d: d["a"].absolute == 2))
        got, _ = _run(df, check)
        assert got["aggregate-function-tests"].status == CheckStatus.SUCCESS

    def test_column_named_count(self, spark):
        """CheckTest.scala:673-695 — a user column named 'count' must not
        collide with internal frequency bookkeeping."""
        df = spark.createDataFrame(
            [("id_0", 1), ("id_1", 2), ("id_2", 3)], "id string, count int")
        check = (Check(CheckLevel.ERROR, "count column check")
                 .has_number_of_distinct_values("count", lambda v: v == 3))
        got, _ = _run(df, check)
        assert got["count column check"].status == CheckStatus.SUCCESS

    def test_sum_aggregation_with_count_column(self, spark):
        from deequ_spark import AnalysisRunner, Histogram
        df = spark.createDataFrame(
            [("a", 10, 1), ("a", 20, 2), ("b", 30, 3)],
            "category string, value int, count int")
        analyzer = Histogram("category", sum_column="value")
        ctx = AnalysisRunner.on_data(df).add_analyzer(analyzer).run()
        m = ctx.metric_map[analyzer]
        assert m.is_success
        assert m.value["a"].absolute == 30


class TestHistogramBinnedConstraintStatus:
    """CheckTest.scala:700-780 "check status for histogram binned
    constraints" re-expressed in this engine's Distribution shape (ordered
    label→DistributionValue dict + null_count)."""

    @pytest.fixture(scope="class")
    def df_binned(self, spark):
        vals = [10.0, 12.0, 15.0, 18.0, 20.0, 25.0, 28.0, 30.0, 32.0, 35.0,
                40.0, 42.0, 45.0, 48.0, 50.0, 55.0, 58.0, 60.0, 65.0, None]
        return spark.createDataFrame(
            [(i + 1, v) for i, v in enumerate(vals)], "id int, value double")

    def _freqs(self, dist):
        return [dv.absolute for dv in dist.values.values()]

    def test_binned_constraints(self, df_binned):
        checks = [
            Check(CheckLevel.ERROR, "bin-specific-tests")
            .has_histogram_binned_values(
                "value", lambda d: self._freqs(d)[0] >= 1, bin_count=5)
            .has_histogram_binned_values(
                "value", lambda d: self._freqs(d)[-1] >= 0, bin_count=5),
            Check(CheckLevel.ERROR, "null-handling-tests")
            .has_histogram_binned_values(
                "value", lambda d: d.null_count == 1, bin_count=5),
            Check(CheckLevel.ERROR, "distribution-shape-tests")
            .has_histogram_binned_values(
                "value",
                lambda d: sum(1 for f in self._freqs(d) if f > 0) >= 3,
                bin_count=5)
            .has_histogram_binned_values(
                "value", lambda d: any(f > 2 for f in self._freqs(d)),
                bin_count=5)
            .has_histogram_binned_values(
                "value", lambda d: all(f <= 20 for f in self._freqs(d)),
                bin_count=5),
            Check(CheckLevel.ERROR, "bin-structure-tests")
            .has_histogram_binned_bins("value", lambda n: n >= 5, bin_count=5)
            .has_histogram_binned_values(
                "value", lambda d: d.number_of_bins >= 5, bin_count=5),
            Check(CheckLevel.ERROR, "filtered-binned-tests")
            .has_histogram_binned_values(
                "value", lambda d: any(f > 0 for f in self._freqs(d)),
                bin_count=5).where("id <= 10")
            .has_histogram_binned_bins(
                "value", lambda n: n >= 3, bin_count=5).where("value > 20"),
        ]
        got, _ = _run(df_binned, *checks)
        for name in ("bin-specific-tests", "null-handling-tests",
                     "distribution-shape-tests", "bin-structure-tests",
                     "filtered-binned-tests"):
            assert got[name].status == CheckStatus.SUCCESS, (
                name, [(str(cr.constraint), cr.message)
                       for cr in got[name].constraint_results
                       if cr.status != ConstraintStatus.SUCCESS])


class TestFilterableCheckBuild:
    """checks/FilterableCheckTest.scala:32-66 — .where() retrofits the
    filter onto exactly the LAST constraint."""

    def test_where_targets_last_constraint_only(self):
        from deequ_spark import Completeness, Compliance
        check = (Check(CheckLevel.ERROR, "someCheck")
                 .is_complete("col1")
                 .is_complete("col2").where("marketplace = 'EU'")
                 .has_completeness("col3", lambda v: v >= 0.9)
                 .where("marketplace = 'NA'")
                 .satisfies("someCol > 5", "const1", columns=["someCol"])
                 .satisfies("someCol > 10", "const2", columns=["someCol"])
                 .where("marketplace = 'EU'"))
        completeness = sorted(
            (a for a in check.required_analyzers()
             if isinstance(a, Completeness)), key=lambda a: a.column)
        assert [a.where for a in completeness] == \
            [None, "marketplace = 'EU'", "marketplace = 'NA'"]
        compliance = sorted(
            (a for a in check.required_analyzers()
             if isinstance(a, Compliance)), key=lambda a: a.instance)
        assert [a.where for a in compliance] == [None, "marketplace = 'EU'"]
