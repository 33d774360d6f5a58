"""Exact-value unit tests per scan-shareable analyzer on tiny fixtures —
the reference's test strategy (AnalyzerTests.scala, SURVEY §5)."""

import math

import pytest

from deequ_spark import (ApproxCountDistinct, ApproxQuantile, ApproxQuantiles,
                         ColumnCount, ColumnExists, ColumnRange, Completeness,
                         Compliance, Correlation, CustomSql, DataType,
                         DataTypeInstances, ExactQuantile, InterquartileRange,
                         Kurtosis, Maximum, MaxLength, Mean, Minimum,
                         MinLength, PatternMatch, RatioOfSums, Size, Skewness,
                         StandardDeviation, Sum, Variance, ZerosCount,
                         determine_type)


def value(analyzer, df):
    metric = analyzer.calculate(df)
    assert metric.is_success, f"{analyzer}: {metric.error}"
    return metric.value


class TestCompleteness:
    def test_missing(self, df_missing):
        assert value(Completeness("att1"), df_missing) == 0.5
        assert value(Completeness("att2"), df_missing) == 0.75

    def test_full(self, df_full):
        assert value(Completeness("att1"), df_full) == 1.0

    def test_filtered(self, df_missing):
        # rows 1..4: att1 = a, b, null, a → 3/4
        assert value(Completeness("att1", "item <= 4"), df_missing) == 0.75

    def test_missing_column_fails(self, df_full):
        metric = Completeness("nope").calculate(df_full)
        assert not metric.is_success


class TestSize:
    def test_size(self, df_missing):
        assert value(Size(), df_missing) == 12.0

    def test_filtered(self, df_missing):
        assert value(Size(where="item <= 3"), df_missing) == 3.0


class TestBasicStats:
    def test_min_max(self, df_numeric):
        assert value(Minimum("att1"), df_numeric) == 1.0
        assert value(Maximum("att1"), df_numeric) == 6.0

    def test_min_max_filtered(self, df_numeric):
        assert value(Minimum("att1", "item > 3"), df_numeric) == 4.0
        assert value(Maximum("att1", "item < 4"), df_numeric) == 3.0

    def test_mean_sum(self, df_numeric):
        assert value(Mean("att1"), df_numeric) == 3.5
        assert value(Sum("att1"), df_numeric) == 21.0

    def test_stddev_variance(self, df_numeric):
        assert value(Variance("att1"), df_numeric) == pytest.approx(35.0 / 12.0)
        assert value(StandardDeviation("att1"), df_numeric) == pytest.approx(
            math.sqrt(35.0 / 12.0))

    def test_range(self, df_numeric):
        assert value(ColumnRange("att1"), df_numeric) == 5.0

    def test_zeros(self, df_numeric):
        assert value(ZerosCount("att2"), df_numeric) == 3.0

    def test_ratio_of_sums(self, df_numeric):
        assert value(RatioOfSums("att1", "att2"), df_numeric) == pytest.approx(21.0 / 18.0)

    def test_correlation_perfect(self, spark):
        df = spark.createDataFrame([(1, 2.0), (2, 4.0), (3, 6.0)], "a int, b double")
        assert value(Correlation("a", "b"), df) == pytest.approx(1.0)

    def test_skewness_symmetric(self, spark):
        df = spark.createDataFrame([(1,), (2,), (3,)], "a int")
        assert value(Skewness("a"), df) == pytest.approx(0.0)

    def test_kurtosis_uniform2(self, spark):
        # two-point distribution → kurtosis = -2
        df = spark.createDataFrame([(0,), (1,)], "a int")
        assert value(Kurtosis("a"), df) == pytest.approx(-2.0)


class TestQuantiles:
    def test_exact_median(self, df_numeric):
        assert value(ExactQuantile("att1", 0.5), df_numeric) == 3.5

    def test_iqr(self, df_numeric):
        # 1..6: p25 = 2.25, p75 = 4.75 → IQR 2.5
        assert value(InterquartileRange("att1"), df_numeric) == pytest.approx(2.5)

    def test_approx_quantile(self, df_numeric):
        assert value(ApproxQuantile("att1", 0.5), df_numeric) in (3.0, 4.0)

    def test_approx_quantiles(self, df_numeric):
        result = value(ApproxQuantiles("att1", (0.25, 0.5, 0.75)), df_numeric)
        assert set(result.keys()) == {"0.25", "0.5", "0.75"}


class TestCompliance:
    def test_predicate(self, df_numeric):
        assert value(Compliance("rule", "att1 > 3"), df_numeric) == 0.5

    def test_filtered(self, df_numeric):
        assert value(Compliance("rule", "att1 > 3", "item >= 4"), df_numeric) == 1.0


class TestPatternMatch:
    def test_pattern(self, spark):
        df = spark.createDataFrame(
            [("foo@bar.com",), ("nope",), ("a@b.io",)], "email string")
        from deequ_spark import Patterns
        assert value(PatternMatch("email", Patterns.EMAIL), df) == pytest.approx(2 / 3)


class TestLengths:
    def test_min_max_length(self, spark):
        df = spark.createDataFrame(
            [("",), ("a",), ("bb",), ("ccc",), ("dddd",)], "s string")
        assert value(MinLength("s"), df) == 0.0
        assert value(MaxLength("s"), df) == 4.0

    def test_null_behavior_empty_string(self, spark):
        from deequ_spark import NullBehavior
        df = spark.createDataFrame([("ab",), (None,)], "s string")
        assert value(MinLength("s"), df) == 2.0  # Ignore
        assert value(MinLength("s", null_behavior=NullBehavior.EMPTY_STRING), df) == 0.0


class TestApproxCountDistinct:
    def test_small_exact(self, df_missing):
        assert value(ApproxCountDistinct("item"), df_missing) == 12.0
        assert value(ApproxCountDistinct("att1"), df_missing) == 2.0


class TestDataType:
    def test_integral(self, spark):
        df = spark.createDataFrame([("1",), ("2",), ("3",)], "v string")
        dist = value(DataType("v"), df)
        assert determine_type(dist) == DataTypeInstances.INTEGRAL

    def test_fractional_wins(self, spark):
        df = spark.createDataFrame([("1",), ("2.5",)], "v string")
        dist = value(DataType("v"), df)
        assert determine_type(dist) == DataTypeInstances.FRACTIONAL

    def test_string(self, spark):
        df = spark.createDataFrame([("1",), ("abc",)], "v string")
        dist = value(DataType("v"), df)
        assert determine_type(dist) == DataTypeInstances.STRING

    def test_boolean(self, spark):
        df = spark.createDataFrame([("true",), ("false",)], "v string")
        dist = value(DataType("v"), df)
        assert determine_type(dist) == DataTypeInstances.BOOLEAN

    def test_native_numeric_column(self, df_numeric):
        dist = value(DataType("att1"), df_numeric)
        assert determine_type(dist) == DataTypeInstances.INTEGRAL


class TestMetadata:
    def test_column_count(self, df_full):
        assert value(ColumnCount(), df_full) == 3.0

    def test_column_exists(self, df_full):
        assert value(ColumnExists("att1"), df_full) == 1.0
        assert value(ColumnExists("nope"), df_full) == 0.0


class TestCustomSql:
    def test_scalar(self, df_numeric):
        assert value(CustomSql("SELECT SUM(att1) FROM primary"), df_numeric) == 21.0

    def test_bad_shape(self, df_numeric):
        metric = CustomSql("SELECT att1 FROM primary").calculate(df_numeric)
        assert not metric.is_success


class TestEmbeddingQuality:
    """Fused-scan quality metrics for vector columns (beyond-reference;
    analyzers/embedding.py)."""

    @pytest.fixture(scope="class")
    def vec_df(self, spark):
        return spark.createDataFrame(
            [(1, [3.0, 4.0]), (2, None), (3, [1.0]),
             (4, [float("nan"), 1.0]), (5, [0.0, 0.0]), (6, [6.0, 8.0])],
            "id long, vec array<double>")

    def test_metrics(self, vec_df):
        from deequ_spark import EmbeddingQuality, do_analysis_run
        ctx = do_analysis_run(vec_df, [EmbeddingQuality("vec", 2)])
        m = next(iter(ctx.metric_map.values()))
        assert m.is_success, m.error
        v = m.value
        assert v["n_rows"] == 6 and v["n_null"] == 1
        assert v["n_dim_mismatch"] == 1 and v["n_nan"] == 1
        assert v["n_zero_norm"] == 1 and v["n_valid"] == 3
        assert v["mean_norm"] == pytest.approx(5.0)     # norms 0, 5, 10
        assert v["min_norm"] == 0.0 and v["max_norm"] == 10.0

    def test_state_merge_exact(self, vec_df):
        from deequ_spark import EmbeddingQuality
        a = EmbeddingQuality("vec", 2)
        merged = a.compute_state_from(vec_df.where("id <= 3")).merge(
            a.compute_state_from(vec_df.where("id > 3")))
        direct = a.compute_state_from(vec_df)
        assert merged == direct                 # integer micro-unit state

    def test_fuses_with_other_analyzers(self, vec_df):
        """EmbeddingQuality shares the fused scan with scan analyzers."""
        from deequ_spark import EmbeddingQuality, Size, do_analysis_run
        ctx = do_analysis_run(vec_df, [Size(), EmbeddingQuality("vec", 2)])
        assert all(m.is_success for m in ctx.metric_map.values())
        assert ctx.metric_map[Size()].value == 6.0

    def test_missing_column_fails_cleanly(self, vec_df):
        from deequ_spark import EmbeddingQuality, do_analysis_run
        ctx = do_analysis_run(vec_df, [EmbeddingQuality("nope", 2)])
        m = next(iter(ctx.metric_map.values()))
        assert not m.is_success

    def test_null_elements_count_as_nan_bucket(self, spark):
        """r4 advice: a right-dim vector containing NULL elements made
        EXISTS(isnan) NULL, leaving the row outside every bucket. It must
        land in n_nan so the buckets partition n_rows."""
        from deequ_spark import EmbeddingQuality, do_analysis_run
        df = spark.createDataFrame(
            [(1, [3.0, 4.0]), (2, [None, 1.0]), (3, [1.0, None]),
             (4, None), (5, [1.0])],
            "id long, vec array<double>")
        ctx = do_analysis_run(df, [EmbeddingQuality("vec", 2)])
        v = next(iter(ctx.metric_map.values())).value
        assert v["n_nan"] == 2.0 and v["n_valid"] == 1.0
        assert (v["n_null"] + v["n_dim_mismatch"] + v["n_nan"]
                + v["n_valid"]) == v["n_rows"] == 5.0

    def test_check_dsl_integration(self, vec_df):
        """has_embedding_quality runs inside a normal VerificationSuite."""
        from deequ_spark import (Check, CheckLevel, CheckStatus,
                                 VerificationSuite)
        strict = (Check(CheckLevel.ERROR, "vectors ok")
                  .has_embedding_quality(
                      "vec", 2, lambda v: v["n_dim_mismatch"] == 0
                      and v["n_nan"] == 0))
        lenient = (Check(CheckLevel.ERROR, "norms sane")
                   .has_embedding_quality(
                       "vec", 2, lambda v: v["max_norm"] <= 10.0))
        result = (VerificationSuite().on_data(vec_df)
                  .add_check(strict).add_check(lenient).run())
        assert result.check_results[strict].status == CheckStatus.ERROR
        assert result.check_results[lenient].status == CheckStatus.SUCCESS
