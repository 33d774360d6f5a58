"""Suggestion-rule parity: shouldBeApplied decision tables transcribed from
/root/reference/src/test/scala/com/amazon/deequ/suggestions/rules/
ConstraintRulesTest.scala (fake-profile fixtures, :39-820). These are pure
driver-side predicates — no Spark session needed."""

import pytest

from deequ_spark import DataTypeInstances
from deequ_spark.metrics import Distribution, DistributionValue
from deequ_spark.profiles import ColumnProfile
from deequ_spark.suggestions import (CategoricalRangeRule,
                                     CompleteIfCompleteRule,
                                     FractionalCategoricalRangeRule,
                                     NonNegativeNumbersRule,
                                     RetainCompletenessRule, RetainTypeRule,
                                     UniqueIfApproximatelyUniqueRule,
                                     WaldIntervalStrategy)


def string_profile(completeness=1.0, approx_distinct=100,
                   data_type=DataTypeInstances.STRING, inferred=False,
                   histogram=None, column="col1"):
    return ColumnProfile(column, completeness, approx_distinct, data_type,
                         inferred, {}, histogram)


def numeric_profile(minimum, completeness=1.0,
                    data_type=DataTypeInstances.FRACTIONAL):
    return ColumnProfile("col1", completeness, 100, data_type, False, {},
                         None, mean=10.0, maximum=100.0, minimum=minimum,
                         sum=10000.0, std_dev=1.0)


def dist(pairs, n_bins=None):
    return Distribution({k: DistributionValue(a, r) for k, a, r in pairs},
                        number_of_bins=n_bins or len(pairs))


class TestCompleteIfCompleteRule:
    """ConstraintRulesTest.scala:39-85."""

    def test_decision_table(self):
        complete = string_profile(1.0)
        incomplete = string_profile(0.25)
        assert CompleteIfCompleteRule().should_be_applied(complete, 1000)
        assert not CompleteIfCompleteRule().should_be_applied(incomplete, 1000)


class TestRetainCompletenessRule:
    """ConstraintRulesTest.scala:134-150."""

    def test_decision_table(self):
        complete = string_profile(1.0)
        ten_percent = string_profile(0.1)
        incomplete = string_profile(0.25)
        wald = WaldIntervalStrategy()
        assert not RetainCompletenessRule().should_be_applied(complete, 1000)
        assert not RetainCompletenessRule(0.05, 0.9).should_be_applied(
            complete, 1000)
        assert RetainCompletenessRule(0.05, 0.9).should_be_applied(
            ten_percent, 1000)
        assert RetainCompletenessRule(0.0).should_be_applied(ten_percent, 1000)
        assert RetainCompletenessRule(0.0).should_be_applied(incomplete, 1000)
        assert RetainCompletenessRule().should_be_applied(incomplete, 1000)
        assert not RetainCompletenessRule(
            interval_strategy=wald).should_be_applied(complete, 1000)
        assert RetainCompletenessRule(0.05, 0.9, wald).should_be_applied(
            ten_percent, 1000)


class TestUniqueIfApproximatelyUniqueRule:
    """ConstraintRulesTest.scala:237-252."""

    def test_decision_table(self):
        assert UniqueIfApproximatelyUniqueRule().should_be_applied(
            string_profile(approx_distinct=100), 100)
        assert UniqueIfApproximatelyUniqueRule().should_be_applied(
            string_profile(approx_distinct=95), 100)
        assert not UniqueIfApproximatelyUniqueRule().should_be_applied(
            string_profile(approx_distinct=91), 100)
        assert not UniqueIfApproximatelyUniqueRule().should_be_applied(
            string_profile(approx_distinct=20), 100)


class TestRetainTypeRule:
    """ConstraintRulesTest.scala:300-340."""

    def test_decision_table(self):
        D = DataTypeInstances
        for dt in (D.STRING, D.UNKNOWN):
            assert not RetainTypeRule().should_be_applied(
                string_profile(data_type=dt, inferred=True), 100), dt
        for dt in (D.STRING, D.BOOLEAN, D.FRACTIONAL, D.INTEGRAL):
            assert not RetainTypeRule().should_be_applied(
                string_profile(data_type=dt, inferred=False), 100), dt
        for dt in (D.BOOLEAN, D.FRACTIONAL, D.INTEGRAL):
            assert RetainTypeRule().should_be_applied(
                string_profile(data_type=dt, inferred=True), 100), dt


class TestCategoricalRangeRule:
    """ConstraintRulesTest.scala:380-470."""

    NON_SKEWED = [("a", 5, 0.0), ("b", 10, 0.0), ("c", 1, 0.0)] + \
        [(chr(ord("d") + i), 4, 0.0) for i in range(8)]
    SKEWED = [("a", 17, 0.85), ("b", 1, 0.05), ("c", 1, 0.05),
              ("d", 1, 0.05)]
    FLG = [("0", 6, 0.6), ("1", 4, 0.4)]

    def test_decision_table(self):
        D = DataTypeInstances
        rule = CategoricalRangeRule()
        assert rule.should_be_applied(
            string_profile(histogram=dist(self.NON_SKEWED)), 100)
        assert rule.should_be_applied(
            string_profile(data_type=D.INTEGRAL,
                           histogram=dist(self.NON_SKEWED)), 100)
        assert rule.should_be_applied(
            string_profile(histogram=dist(self.FLG)), 10)
        assert rule.should_be_applied(
            string_profile(data_type=D.INTEGRAL,
                           histogram=dist(self.FLG)), 10)
        assert not rule.should_be_applied(
            string_profile(histogram=dist(self.SKEWED)), 100)
        assert not rule.should_be_applied(string_profile(), 100)
        assert not rule.should_be_applied(
            string_profile(data_type=D.BOOLEAN), 100)
        # empty histogram: the reference's 0/0 is NaN and fails the check
        assert not rule.should_be_applied(
            string_profile(data_type=D.BOOLEAN, histogram=dist([], 0)), 20)
        assert not rule.should_be_applied(
            string_profile(histogram=dist([], 0)), 20)


class TestFractionalCategoricalRangeRule:
    """ConstraintRulesTest.scala:557-660."""

    FRACTIONAL_RANGE = [("Y", 42, 0.42), ("'Y'", 1, 0.01), ("N", 57, 0.57)]
    ACTUAL_RANGE = [("Y", 5, 0.4), ("N", 10, 0.6)]
    SOMEWHAT_SKEWED = [("a", 85, 0.85), ("b", 7, 0.07), ("c", 2, 0.07),
                       ("d", 1, 0.01)]
    SKEWED = [("a", 17, 0.79), ("b", 1, 0.07), ("c", 1, 0.07),
              ("d", 1, 0.07)]

    def test_decision_table(self):
        D = DataTypeInstances
        rule = FractionalCategoricalRangeRule()
        for dt in (D.STRING, D.INTEGRAL):
            assert rule.should_be_applied(
                string_profile(data_type=dt,
                               histogram=dist(self.SOMEWHAT_SKEWED)), 100), dt
            assert rule.should_be_applied(
                string_profile(data_type=dt,
                               histogram=dist(self.FRACTIONAL_RANGE)), 100), dt
            assert not rule.should_be_applied(
                string_profile(data_type=dt,
                               histogram=dist(self.SKEWED)), 100), dt
            assert not rule.should_be_applied(
                string_profile(data_type=dt,
                               histogram=dist(self.ACTUAL_RANGE)), 100), dt
            assert not rule.should_be_applied(
                string_profile(data_type=dt), 100), dt
        assert not rule.should_be_applied(
            string_profile(data_type=D.BOOLEAN), 100)
        assert not rule.should_be_applied(
            string_profile(data_type=D.BOOLEAN, histogram=dist([], 0)), 20)


class TestNonNegativeNumbersRule:
    """ConstraintRulesTest.scala:757-795."""

    def test_decision_table(self):
        assert not NonNegativeNumbersRule().should_be_applied(
            numeric_profile(-1.76), 100)
        assert NonNegativeNumbersRule().should_be_applied(
            numeric_profile(0.0), 100)
        assert NonNegativeNumbersRule().should_be_applied(
            numeric_profile(0.05), 100)


class TestRetainCompletenessCandidateBounds:
    """ConstraintRulesTest.scala:186-210: the Wald/Wilson interval lower
    bound becomes the suggested completeness threshold (2-decimal
    truncation semantics)."""

    def test_wald_bound(self):
        from deequ_spark.suggestions import WaldIntervalStrategy
        interval = WaldIntervalStrategy().calculate_target_confidence_interval(
            0.5, 100)
        assert interval.lower_bound == 0.4

    def test_wilson_bound(self):
        from deequ_spark.suggestions import WilsonScoreIntervalStrategy
        interval = (WilsonScoreIntervalStrategy()
                    .calculate_target_confidence_interval(0.4, 100))
        assert interval.lower_bound == 0.3


class TestRetainTypeSuggestsDetectedType:
    """RetainTypeRule.scala:40-58 — the suggested type IS the detected
    type, and the applied constraint must SUCCEED on the same data (an
    Integral→Fractional widening fails: the Fractional regex rejects
    plain integers)."""

    def test_integral_column_suggests_integral_and_passes(self, spark):
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 ConstraintSuggestionRunner,
                                 VerificationSuite)
        df = spark.createDataFrame([(str(i),) for i in range(1, 7)],
                                   "item string")
        out = ConstraintSuggestionRunner().on_data(df).run()
        retain = [s for ss in out["suggestions"].values() for s in ss
                  if s.rule_name == "RetainTypeRule"]
        assert retain, "RetainTypeRule did not fire"
        s = retain[0]
        assert "INTEGRAL" in s.code_for_constraint
        assert "has type Integral" in s.description
        check = s.apply(Check(CheckLevel.ERROR, "retain"))
        result = VerificationSuite().on_data(df).add_check(check).run()
        assert result.status == CheckStatus.SUCCESS


class TestSuggestionAndVerificationIntegration:
    """Transcribed from SuggestionAndVerificationIntegrationTest.scala:
    every suggested constraint must SUCCEED when verified against the
    data it was suggested from — incl. a period in a column name
    (FixtureSupport.getDfWithPeriodInName:427-436)."""

    def _assert_all_suggestions_pass(self, spark, df):
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 ConstraintSuggestionRunner,
                                 VerificationSuite)
        from deequ_spark.suggestions import (DEFAULT_RULES,
                                             UniqueIfApproximatelyUniqueRule)
        # the reference test runs Rules.DEFAULT + the uniqueness rule —
        # numeric-stat rules (HasMin etc.) are NOT in the self-verifying
        # set (they bind to the UNCASTED column, both engines)
        out = (ConstraintSuggestionRunner().on_data(df)
               .add_constraint_rules(list(DEFAULT_RULES)
                                     + [UniqueIfApproximatelyUniqueRule()])
               .run())
        check = Check(CheckLevel.ERROR, "group-1")
        n = 0
        for ss in out["suggestions"].values():
            for s in ss:
                check = s.apply(check)
                n += 1
        assert n > 0, "no suggestions produced"
        result = VerificationSuite().on_data(df).add_check(check).run()
        failing = [str(cr.constraint)
                   for cr in result.check_results[check].constraint_results
                   if cr.status.value != "Success"]
        assert result.status == CheckStatus.SUCCESS, failing

    def test_period_in_column_name(self, spark):
        df = spark.createDataFrame(
            [("1", "a", "c"), ("2", "a", "c"), ("3", "a", "c"),
             ("4", "b", "d")], ["item.one", "att1", "att2"])
        self._assert_all_suggestions_pass(spark, df)

    def test_mixed_types_fixture(self, spark):
        """Same property over a numeric/string/null mix. One documented
        exception: CategoricalRangeRule's `col IN (...)` predicate is
        NULL-intolerant in the reference (CategoricalRangeRule.scala:70
        columnCondition has no IS NULL escape), so on the 75%-complete
        `cat` column that one suggestion legitimately fails
        verification."""
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 ConstraintSuggestionRunner,
                                 VerificationSuite)
        from deequ_spark.suggestions import (DEFAULT_RULES,
                                             UniqueIfApproximatelyUniqueRule)
        rows = [(i, float(i) if i % 5 else 0.0,
                 None if i % 4 == 0 else f"cat{i % 3}") for i in range(1, 41)]
        df = spark.createDataFrame(rows, "id int, val double, cat string")
        out = (ConstraintSuggestionRunner().on_data(df)
               .add_constraint_rules(list(DEFAULT_RULES)
                                     + [UniqueIfApproximatelyUniqueRule()])
               .run())
        check = Check(CheckLevel.ERROR, "group-1")
        for ss in out["suggestions"].values():
            for s in ss:
                check = s.apply(check)
        result = VerificationSuite().on_data(df).add_check(check).run()
        failing = [str(cr.constraint)
                   for cr in result.check_results[check].constraint_results
                   if cr.status.value != "Success"]
        assert failing == ["AnalysisBasedConstraint(Compliance('cat' has "
                           "value range 'cat0', 'cat1', 'cat2'))"]


class TestConstraintSuggestionResultJson:
    """ConstraintSuggestionResultTest.scala transcriptions (line refs per
    test): the exact suggestion SET that Rules.DEFAULT +
    UniqueIfApproximatelyUniqueRule produces on getDfFull, rendered through
    the constraint_suggestions / evaluation_results JSON emitters. The
    reference's constraint_name / code_for_constraint strings are Scala
    toString artifacts (e.g. "CompletenessConstraint(Completeness(att2,
    None,None))", ".isComplete(\"att2\")"); our Python idiom emits
    "CompletenessConstraint(att2)" / ".is_complete(\"att2\")" — the
    semantic payload (column, rule, current value, description, evaluation
    status) is transcribed exactly."""

    @staticmethod
    def _run(spark, df, split=None):
        from deequ_spark.suggestions import (ConstraintSuggestionRunner,
                                             DEFAULT_RULES)
        runner = (ConstraintSuggestionRunner().on_data(df)
                  .add_constraint_rules(list(DEFAULT_RULES)))
        if split is not None:
            runner = runner.use_train_test_split_with_test_set_ratio(*split)
        return runner.run()

    @pytest.fixture(scope="class")
    def df_full(self, spark):
        return spark.createDataFrame(
            [("1", "a", "c"), ("2", "a", "c"), ("3", "a", "c"),
             ("4", "b", "d")], "item string, att1 string, att2 string")

    EXPECTED = {
        # (column, rule, current_value, description)
        ("att2", "CompleteIfCompleteRule", "Completeness: 1.0",
         "'att2' is not null"),
        ("att1", "CompleteIfCompleteRule", "Completeness: 1.0",
         "'att1' is not null"),
        ("item", "CompleteIfCompleteRule", "Completeness: 1.0",
         "'item' is not null"),
        ("item", "RetainTypeRule", "DataType: Integral",
         "'item' has type Integral"),
        ("item", "NonNegativeNumbersRule", "Minimum: 1.0",
         "'item' has no negative values"),
        ("item", "UniqueIfApproximatelyUniqueRule", "ApproxDistinctness: 1.0",
         "'item' is unique"),
    }

    def test_constraint_suggestions_json(self, spark, df_full):
        """:31-120 getConstraintSuggestionsAsJson — six suggestions, exact
        payload, reference rule descriptions."""
        import json
        from deequ_spark.suggestions import (RULE_DESCRIPTIONS,
                                             constraint_suggestions_to_json)
        res = self._run(spark, df_full)
        rows = json.loads(
            constraint_suggestions_to_json(res["suggestions"])
        )["constraint_suggestions"]
        assert {(r["column_name"], r["suggesting_rule"], r["current_value"],
                 r["description"]) for r in rows} == self.EXPECTED
        for r in rows:
            assert r["rule_description"] == \
                RULE_DESCRIPTIONS[r["suggesting_rule"]]
            assert r["code_for_constraint"].startswith(".")
            assert set(r) == {"constraint_name", "column_name",
                              "current_value", "description",
                              "suggesting_rule", "rule_description",
                              "code_for_constraint"}

    def test_evaluation_results_json_with_split(self, spark, df_full):
        """:122-224 — testsetRatio 0.1 on 4 rows leaves an (almost surely)
        empty test set: every suggested constraint evaluates to Failure."""
        import json
        from deequ_spark.suggestions import evaluation_results_to_json
        res = self._run(spark, df_full, split=(0.1, 0))
        rows = json.loads(evaluation_results_to_json(
            res["suggestions"], res.get("verification_result"))
        )["constraint_suggestions"]
        assert {(r["column_name"], r["suggesting_rule"], r["current_value"],
                 r["description"]) for r in rows} == self.EXPECTED
        assert all(r["constraint_result_on_test_set"] == "Failure"
                   for r in rows)

    def test_evaluation_results_json_without_split(self, spark, df_full):
        """:226-330 — without a train/test split every status is
        "Unknown"."""
        import json
        from deequ_spark.suggestions import evaluation_results_to_json
        res = self._run(spark, df_full)
        rows = json.loads(evaluation_results_to_json(
            res["suggestions"], res.get("verification_result"))
        )["constraint_suggestions"]
        assert {(r["column_name"], r["suggesting_rule"], r["current_value"],
                 r["description"]) for r in rows} == self.EXPECTED
        assert all(r["constraint_result_on_test_set"] == "Unknown"
                   for r in rows)

    def test_period_in_column_name_json(self, spark):
        """:269-330 — getDfWithPeriodInName: the dotted column flows
        through profiling, every item rule fires on it, and the generated
        code strings target the dotted name."""
        import json
        from deequ_spark.suggestions import constraint_suggestions_to_json
        df = spark.createDataFrame(
            [("1", "a", "c"), ("2", "a", "c"), ("3", "a", "c"),
             ("4", "b", "d")], ["item.one", "att1", "att2"])
        res = self._run(spark, df)
        rows = json.loads(
            constraint_suggestions_to_json(res["suggestions"])
        )["constraint_suggestions"]
        assert {(r["column_name"], r["suggesting_rule"]) for r in rows} == {
            ("item.one", "CompleteIfCompleteRule"),
            ("item.one", "RetainTypeRule"),
            ("item.one", "NonNegativeNumbersRule"),
            ("item.one", "UniqueIfApproximatelyUniqueRule"),
            ("att1", "CompleteIfCompleteRule"),
            ("att2", "CompleteIfCompleteRule")}
        for r in rows:
            if r["column_name"] == "item.one":
                assert "item.one" in r["code_for_constraint"]
