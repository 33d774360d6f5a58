"""Performance-shape tests: the scan-sharing contract itself.

Parity: AnalysisRunnerTests.scala:61-110 — N scan-shareable analyzers must
produce exactly ONE Spark job; a bucket of grouping analyzers at most two.
"""

import pytest

from deequ_spark import (ApproxQuantile, Completeness, Compliance,
                         CountDistinct, Distinctness, Entropy, Maximum, Mean,
                         Minimum, Size, StandardDeviation, Sum, Uniqueness,
                         do_analysis_run)


def count_jobs(spark, fn):
    tracker = spark.sparkContext.statusTracker()
    # AQE legitimately splits one action into several jobs; the contract
    # under test is "one ACTION = one pass", so measure with AQE off
    import uuid
    group = f"fusion-test-{uuid.uuid4().hex[:8]}"
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setJobGroup(group, group)
    try:
        result = fn()
    finally:
        spark.sparkContext.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    after = tracker.getJobIdsForGroup(group) or []
    return len(after), result


class TestScanSharing:
    def test_six_analyzers_one_job(self, spark, df_numeric):
        analyzers = [Size(), Completeness("att1"), Completeness("att2"),
                     Compliance("c1", "att1 > 0"), Compliance("c2", "att2 > 0"),
                     ApproxQuantile("att1", 0.5)]
        n_jobs, ctx = count_jobs(spark, lambda: do_analysis_run(df_numeric, analyzers))
        assert len(ctx.metric_map) == 6
        assert all(m.is_success for m in ctx.metric_map.values())
        assert n_jobs == 1, f"expected 1 fused job, saw {n_jobs}"

    def test_fused_equals_standalone(self, df_numeric):
        analyzers = [Size(), Minimum("att1"), Maximum("att1"), Mean("att1"),
                     Sum("att1"), StandardDeviation("att1")]
        fused = do_analysis_run(df_numeric, analyzers)
        for a in analyzers:
            standalone = a.calculate(df_numeric)
            assert fused.metric_map[a].value == standalone.value


class TestGroupingSharing:
    def test_shared_group_by_single_job(self, spark, df_unique):
        analyzers = [Uniqueness(("nonUnique",)), Entropy("nonUnique"),
                     Distinctness(("nonUnique",)), CountDistinct(("nonUnique",))]
        n_jobs, ctx = count_jobs(spark, lambda: do_analysis_run(df_unique, analyzers))
        assert len(ctx.metric_map) == 4
        assert all(m.is_success for m in ctx.metric_map.values())
        # reference needs 2 jobs here (AnalysisRunnerTests.scala:87-107);
        # we recover num_rows inside the fused agg → 1 job
        assert n_jobs <= 2, f"expected ≤2 jobs, saw {n_jobs}"

    def test_mixed_scan_and_grouping(self, spark, df_unique):
        analyzers = [Size(), Mean("unique"), Uniqueness(("nonUnique",)),
                     Entropy("nonUnique")]
        n_jobs, ctx = count_jobs(spark, lambda: do_analysis_run(df_unique, analyzers))
        assert all(m.is_success for m in ctx.metric_map.values())
        assert n_jobs <= 3


class TestDQDLFusion:
    def test_aggregate_rules_one_fused_scan(self, spark, df_numeric):
        """All aggregate DQDL rules batch into ONE VerificationSuite run
        with ONE fused scan job (parity: DQDLExecutor.scala:28-60)."""
        from deequ_spark.dqdl import EvaluateDataQuality
        rules = """Rules = [
            RowCount > 0,
            Completeness "att1" >= 0,
            Mean "att1" > 0,
            Sum "att1" > 0,
            StandardDeviation "att1" >= 0,
            ZerosCount "att2" >= 0,
            Variance "att1" >= 0,
            Skewness "att1" between -10 and 10,
            Kurtosis "att1" between -10 and 10,
            ColumnCorrelation "att1" "att2" between -1 and 1,
            Range "att1" >= 0 ]"""
        n_jobs, out = count_jobs(
            spark, lambda: EvaluateDataQuality.process(df_numeric, rules)
            .collect())
        # 1 fused scan + 1 createDataFrame job for the result rows
        assert n_jobs <= 2, f"expected <=2 jobs for 11 rules, saw {n_jobs}"
        assert all(r["Outcome"] == "Passed" for r in out)


class TestHistogramJobFusion:
    def test_histogram_two_jobs(self, spark, df_unique):
        """Histogram = exactly 2 jobs: one fused (n_bins + num_rows) agg
        over the frequency table, one top-N collect. The former third job
        (a separate total collect at state-build time) was fused in r6
        (r5 verdict finding #3)."""
        from deequ_spark import Histogram
        a = Histogram("nonUnique")
        n_jobs, ctx = count_jobs(spark, lambda: do_analysis_run(df_unique, [a]))
        m = ctx.metric_map[a]
        assert m.is_success
        assert n_jobs <= 2, f"expected <=2 jobs for histogram, saw {n_jobs}"
        dist = m.value
        assert dist.values["0"].absolute == 3
        assert sum(dv.absolute for dv in dist.values.values()) == 6

    def test_standalone_grouping_metric_fuses_num_rows(self, spark, df_unique):
        """compute_state_from + compute_metric_from_state standalone path:
        building the state runs NO job (num_rows is lazy) and the metric
        needs ONE fused agg job."""
        from deequ_spark import Uniqueness
        a = Uniqueness(("nonUnique",))
        state = a.compute_state_from(df_unique)
        assert state._num_rows is None          # no job ran yet
        n_jobs, m = count_jobs(
            spark, lambda: a.compute_metric_from_state(state))
        assert m.is_success and abs(m.value - 0.5) < 1e-12
        assert state._num_rows == 6             # recovered inside the agg
        assert n_jobs == 1, f"expected 1 fused job, saw {n_jobs}"
