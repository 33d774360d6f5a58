"""Robust-statistics analyzers (deequ_spark/analyzers/robust.py): MAD and
MAD-based outlier detection. Expectations come from independent numpy
computations and hand-derived fixtures, never the analyzer's own output.

No reference counterpart — extends the data-quality algebra with the
Hampel/Leys robust-scale rule the reference's stddev analyzers lack.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deequ_spark import (MedianAbsoluteDeviation, RobustOutlierCount,
                         mad_outlier_flags)
from deequ_spark.analyzers.robust import MAD_CONSISTENCY


def _np_mad(values):
    a = np.asarray(values, dtype=float)
    med = np.percentile(a, 50, method="linear")
    return med, float(np.percentile(np.abs(a - med), 50, method="linear"))


class TestMAD:
    def test_matches_numpy_on_clean_data(self, spark):
        vals = [1.0, 2.0, 4.0, 7.0, 11.0, 16.0, 22.0]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        m = MedianAbsoluteDeviation("x").calculate(df)
        assert m.is_success
        _, mad = _np_mad(vals)
        assert m.value == pytest.approx(mad)

    def test_robust_to_extreme_outlier(self, spark):
        vals = [10.0, 11.0, 12.0, 13.0, 14.0]
        df_clean = spark.createDataFrame([(v,) for v in vals], "x double")
        df_dirty = spark.createDataFrame(
            [(v,) for v in vals + [1e15]], "x double")
        clean = MedianAbsoluteDeviation("x").calculate(df_clean).value
        dirty = MedianAbsoluteDeviation("x").calculate(df_dirty).value
        # one absurd value barely moves MAD (stddev would explode ~1e14x)
        assert dirty <= 2 * clean

    def test_where_filter(self, spark):
        rows = [(1.0, "a"), (2.0, "a"), (3.0, "a"), (1000.0, "b")]
        df = spark.createDataFrame(rows, "x double, g string")
        m = MedianAbsoluteDeviation("x", where="g = 'a'").calculate(df)
        _, mad = _np_mad([1.0, 2.0, 3.0])
        assert m.value == pytest.approx(mad)

    def test_empty_and_bad_column_fail_as_metrics(self, spark):
        df = spark.createDataFrame([], "x double")
        assert not MedianAbsoluteDeviation("x").calculate(df).is_success
        df2 = spark.createDataFrame([("s",)], "x string")
        m = MedianAbsoluteDeviation("x").calculate(df2)
        assert not m.is_success

    def test_state_does_not_merge(self, spark):
        df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
        st = MedianAbsoluteDeviation("x").compute_state_from(df)
        with pytest.raises(NotImplementedError):
            st.merge(st)


class TestRobustOutlierCount:
    def test_counts_planted_outliers(self, spark):
        rng = np.random.default_rng(7)
        clean = rng.normal(100.0, 5.0, 500).tolist()
        planted = [1000.0, -1000.0, 800.0]
        df = spark.createDataFrame([(float(v),) for v in clean + planted],
                                   "x double")
        m = RobustOutlierCount("x", k=3.0).calculate(df)
        assert m.is_success
        # independent recomputation of the same rule
        med, mad = _np_mad(clean + planted)
        cut = 3.0 * MAD_CONSISTENCY * mad
        expected = sum(1 for v in clean + planted if abs(v - med) > cut)
        assert m.value == pytest.approx(expected / (len(clean) + 3))
        assert expected >= 3                 # all planted ones caught

    def test_zero_mad_fallback(self, spark):
        # >50% identical values → MAD 0 → any x != median is an outlier
        vals = [5.0] * 8 + [9.0, 7.0]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        m = RobustOutlierCount("x").calculate(df)
        assert m.value == pytest.approx(2 / 10)

    def test_k_must_be_positive(self, spark):
        df = spark.createDataFrame([(1.0,)], "x double")
        m = RobustOutlierCount("x", k=-1.0).calculate(df)
        assert not m.is_success

    def test_rides_verification_suite(self, spark):
        from deequ_spark import do_analysis_run
        df = spark.createDataFrame(
            [(float(v),) for v in [1, 2, 3, 4, 5, 9999]], "x double")
        ctx = do_analysis_run(df, [MedianAbsoluteDeviation("x"),
                                   RobustOutlierCount("x", k=3.0)])
        vals = {type(a).__name__: m.value
                for a, m in ctx.metric_map.items() if m.is_success}
        assert vals["MedianAbsoluteDeviation"] == pytest.approx(1.5)
        assert vals["RobustOutlierCount"] == pytest.approx(1 / 6)


class TestMadOutlierFlags:
    def test_row_level_flags(self, spark):
        rows = [(1, 10.0), (2, 11.0), (3, 12.0), (4, 13.0), (5, 14.0),
                (6, 500.0), (7, None)]
        df = spark.createDataFrame(rows, "id long, x double")
        out = {r["id"]: r["x_outlier"]
               for r in mad_outlier_flags(df, "x", k=3.0).collect()}
        assert out[6] is True
        assert all(out[i] is False for i in (1, 2, 3, 4, 5))
        assert out[7] is None                # NULL stays unjudged

    def test_flag_is_pure_expression(self, spark):
        df = spark.createDataFrame([(1, 10.0)], "id long, x double")
        out = mad_outlier_flags(df, "x")
        plan = out._jdf.queryExecution().explainString(
            out.sparkSession._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        assert "EvalPython" not in plan      # flag is JVM-side


class TestRobustChecks:
    def test_check_passes_and_fails(self, spark):
        from deequ_spark import Check, CheckLevel, CheckStatus, \
            VerificationSuite
        df = spark.createDataFrame(
            [(float(v),) for v in [10, 11, 12, 13, 14, 9999]], "x double")
        ok = Check(CheckLevel.ERROR, "robust ok") \
            .has_mad("x", lambda v: v == 1.5) \
            .has_mad_outlier_ratio("x", lambda r: r <= 0.2, k=3.0)
        bad = Check(CheckLevel.ERROR, "robust bad") \
            .has_mad_outlier_ratio("x", lambda r: r == 0.0, k=3.0)
        res = (VerificationSuite().on_data(df)
               .add_check(ok).add_check(bad).run())
        assert res.check_results[ok].status == CheckStatus.SUCCESS
        assert res.check_results[bad].status == CheckStatus.ERROR

    def test_check_where_scope(self, spark):
        from deequ_spark import Check, CheckLevel, CheckStatus, \
            VerificationSuite
        rows = [(float(v), "a") for v in [1, 2, 3, 4, 5]] + [(999.0, "b")]
        df = spark.createDataFrame(rows, "x double, g string")
        c = Check(CheckLevel.ERROR, "scoped") \
            .has_mad_outlier_ratio("x", lambda r: r == 0.0) \
            .where("g = 'a'")
        res = VerificationSuite().on_data(df).add_check(c).run()
        assert res.check_results[c].status == CheckStatus.SUCCESS


class TestMADAnomalyStrategy:
    def test_flags_spike_in_polluted_history(self, spark):
        from deequ_spark import BatchNormalStrategy, MADStrategy
        # history polluted by one past incident (500); current point 40
        history = [10.0, 11.0, 9.0, 10.0, 500.0, 10.0, 11.0, 10.0, 9.0,
                   10.0, 40.0]
        search = (10, 11)
        mad_hits = MADStrategy(k=3.0).detect(history, search)
        assert len(mad_hits) == 1 and mad_hits[0].value == 40.0
        # the Gaussian strategy's stddev is inflated by the 500 → blind
        normal_hits = BatchNormalStrategy().detect(history, search)
        assert normal_hits == []

    def test_degenerate_mad_flags_any_change(self):
        from deequ_spark import MADStrategy
        vals = [5.0] * 9 + [5.1]
        hits = MADStrategy().detect(vals, (9, 10))
        assert len(hits) == 1

    def test_no_false_positive_on_clean_series(self):
        from deequ_spark import MADStrategy
        vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2]
        assert MADStrategy(k=3.0).detect(vals, (5, 6)) == []

    def test_k_validated(self):
        from deequ_spark import MADStrategy
        with pytest.raises(ValueError, match="k must be positive"):
            MADStrategy(k=0)

    def test_rides_anomaly_check(self, spark):
        from deequ_spark import (AnomalyCheckConfig, InMemoryMetricsRepository,
                                 MADStrategy, ResultKey, Size,
                                 VerificationSuite, CheckStatus)
        repo = InMemoryMetricsRepository()
        df_small = spark.range(10).toDF("x")
        for t in range(5):
            (VerificationSuite().on_data(df_small)
             .use_repository(repo).save_or_append_result(ResultKey(t))
             .add_anomaly_check(MADStrategy(k=3.0), Size(),
                                AnomalyCheckConfig(description="size"))
             .run())
        df_big = spark.range(1000).toDF("x")
        res = (VerificationSuite().on_data(df_big)
               .use_repository(repo).save_or_append_result(ResultKey(5))
               .add_anomaly_check(MADStrategy(k=3.0), Size(),
                                  AnomalyCheckConfig(description="size"))
               .run())
        assert res.status != CheckStatus.SUCCESS
