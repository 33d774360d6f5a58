"""PyDeequ API compatibility (deequ_spark/compat.py): the reference's
public Python wrapper (pydeequ package) exposes a camelCase fluent API
with leading-SparkSession constructors. These tests run PyDeequ-style
code VERBATIM (shapes from the pydeequ README quickstart) against
deequ_spark to prove a PyDeequ user can switch without edits."""

import pytest

from deequ_spark import (AnalysisRunner, Check, CheckLevel, CheckStatus,
                         Completeness, ConstraintSuggestionRunner,
                         FileSystemMetricsRepository,
                         InMemoryMetricsRepository, ResultKey, Size,
                         VerificationSuite)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, "Thingy A", "awesome thing.", "high", 0),
         (2, "Thingy B", "available at http://thingb.com", None, 0),
         (3, None, None, "low", 5),
         (4, "Thingy D", "checkout https://thingd.ca", "low", 10),
         (5, "Thingy E", None, "high", 12)],
        "id long, productName string, description string, priority string, numViews long")


class TestPyDeequQuickstart:
    def test_verification_quickstart_verbatim(self, spark, df):
        """pydeequ README 'Data Quality Checks' shape."""
        check = Check(spark, CheckLevel.Warning, "Review Check")
        checkResult = (VerificationSuite(spark)
                       .onData(df)
                       .addCheck(
                           check.hasSize(lambda x: x >= 3)
                           .hasMin("numViews", lambda x: x == 0)
                           .isComplete("productName")
                           .isUnique("id")
                           .isContainedIn("priority", ["high", "low"])
                           .isNonNegative("numViews"))
                       .run())
        assert checkResult.status == CheckStatus.WARNING
        rows = checkResult.checkResultsAsDataFrame(spark).collect()
        statuses = {r["constraint_status"] for r in rows}
        assert statuses == {"Success", "Failure"}   # completeness fails

    def test_analyzer_runner_camel_static(self, spark, df):
        """pydeequ README 'Analyzers' shape: AnalysisRunner.onData."""
        result = (AnalysisRunner.onData(df)
                  .addAnalyzer(Size())
                  .addAnalyzer(Completeness("productName"))
                  .run())
        vals = {(m.instance, m.name): m.value
                for m in result.metric_map.values()}
        assert vals[("*", "Size")] == 5.0
        assert vals[("productName", "Completeness")] == 0.8

    def test_repository_spark_first_constructors(self, spark, df, tmp_path):
        """pydeequ README 'Repository' shape: spark-first constructors,
        camelCase loaders."""
        repo = FileSystemMetricsRepository(spark, str(tmp_path / "m.json"))
        key = ResultKey(spark, 1_700_000_000_000, {"tag": "release"})
        (VerificationSuite(spark).onData(df)
         .addCheck(Check(spark, CheckLevel.Error, "c").hasSize(
             lambda x: x == 5))
         .useRepository(repo).saveOrAppendResult(key).run())
        loaded = (repo.load().withTagValues({"tag": "release"})
                  .getSuccessMetricsAsDataFrame(spark))
        assert loaded.count() >= 1
        mem = InMemoryMetricsRepository(spark)   # spark-first tolerated
        assert mem.load().get_success_metrics_as_dataframe(spark).count() == 0

    def test_suggestions_camel(self, spark, df):
        """pydeequ README 'Constraint Suggestions' shape."""
        from deequ_spark.suggestions import DEFAULT
        suggestionResult = (ConstraintSuggestionRunner(spark)
                            .onData(df)
                            .addConstraintRule(DEFAULT())
                            .run())
        assert suggestionResult["suggestions"]

    def test_profiler_camel(self, spark, df):
        from deequ_spark import ColumnProfilerRunner
        result = (ColumnProfilerRunner(spark)
                  .onData(df)
                  .run())
        assert "numViews" in result

    def test_native_snake_case_untouched(self, spark, df):
        check = Check(CheckLevel.ERROR, "native")
        res = (VerificationSuite().on_data(df)
               .add_check(check.has_size(lambda x: x == 5)).run())
        assert res.status == CheckStatus.SUCCESS

    def test_unknown_attribute_still_raises(self, spark):
        with pytest.raises(AttributeError):
            Check(spark, CheckLevel.Warning, "x").hasNoSuchThing
        with pytest.raises(AttributeError):
            VerificationSuite(spark).notAMethod

    def test_full_pydeequ_check_method_surface(self, spark):
        """Every public method name from pydeequ/checks.py resolves."""
        from deequ_spark.compat import snake_candidates
        names = """hasSize hasColumnCount isComplete areComplete
        haveCompleteness areAnyComplete haveAnyCompleteness isUnique
        isPrimaryKey hasUniqueness hasDistinctness hasUniqueValueRatio
        hasNumberOfDistinctValues hasHistogramValues kllSketchSatisfies
        hasMin hasMax hasMean hasSum hasStandardDeviation
        hasApproxCountDistinct hasApproxQuantile hasMinLength
        hasMaxLength hasEntropy hasMutualInformation hasCorrelation
        satisfies hasPattern containsCreditCardNumber containsEmail
        containsURL containsSocialSecurityNumber hasDataType
        isNonNegative isPositive isLessThan isLessThanOrEqualTo
        isGreaterThan isGreaterThanOrEqualTo isContainedIn
        hasCompleteness evaluate where""".split()
        c = Check(spark, CheckLevel.Warning, "surface")
        missing = [n for n in names
                   if not any(hasattr(c, s)
                              for s in list(snake_candidates(n)) + [n])]
        assert missing == []
