"""Checks-DSL completion tests: doesDatasetMatch, isNewestPointNonAnomalous
(parity: Check.scala:542-563, 689-719, 1511-1568)."""

import pytest

from deequ_spark import (AbsoluteChangeStrategy, Check, CheckLevel,
                        CheckStatus, InMemoryMetricsRepository, ResultKey,
                        Size, VerificationSuite, do_analysis_run)
from deequ_spark.comparison import DatasetMatchAnalyzer, DatasetMatchState


@pytest.fixture()
def ds_pair(spark):
    ds1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id int, s string, v int")
    ds2 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 99), (3, "c", 30)], "id int, s string, v int")
    return ds1, ds2


def test_does_dataset_match(ds_pair):
    ds1, ds2 = ds_pair
    result = (VerificationSuite().on_data(ds1)
              .add_check(Check(CheckLevel.ERROR, "match")
                         .does_dataset_match(ds2, {"id": "id"},
                                             lambda v: v == pytest.approx(2 / 3)))
              .run())
    assert result.status == CheckStatus.SUCCESS


def test_dataset_match_analyzer_in_run(ds_pair):
    ds1, ds2 = ds_pair
    a = DatasetMatchAnalyzer(ds2, {"id": "id"}, {"v": "v"})
    ctx = do_analysis_run(ds1, [a, Size()])
    m = ctx.metric(a)
    assert m.is_success and m.value == pytest.approx(2 / 3)


def test_dataset_match_state_merges():
    s = DatasetMatchState(2, 3) + DatasetMatchState(4, 5)
    assert (s.matched, s.total) == (6, 8)


def test_dataset_match_missing_key(ds_pair):
    ds1, ds2 = ds_pair
    m = DatasetMatchAnalyzer(ds2, {"nope": "id"}).calculate(ds1)
    assert not m.is_success


def test_is_newest_point_non_anomalous(spark, df_full):
    repo = InMemoryMetricsRepository()
    # seed history: size=4 at two past dates
    for date in (1000, 2000):
        ctx = do_analysis_run(df_full, [Size()])
        repo.save(ResultKey(date, {}), ctx)

    strategy = AbsoluteChangeStrategy(max_rate_increase=1.0,
                                      max_rate_decrease=-1.0)
    ok = (VerificationSuite().on_data(df_full)
          .add_check(Check(CheckLevel.ERROR, "anomaly")
                     .is_newest_point_non_anomalous(repo, strategy, Size()))
          .run())
    assert ok.status == CheckStatus.SUCCESS

    # 3x the rows → size jumps 4 → 12, beyond +-1 change → anomalous
    bigger = df_full.union(df_full).union(df_full)
    bad = (VerificationSuite().on_data(bigger)
           .add_check(Check(CheckLevel.ERROR, "anomaly")
                      .is_newest_point_non_anomalous(repo, strategy, Size()))
           .run())
    assert bad.status == CheckStatus.ERROR


class TestNearDuplicateRatio:
    """Corpus-hygiene analyzer (analyzers/corpus.py NearDuplicateRatio):
    the llm dedup operators as a regular dataset metric + Check."""

    def _corpus(self, spark):
        rows = [(i, "the quick brown fox jumps over the lazy dog tonight")
                for i in range(4)]
        rows += [(10 + i, f"completely distinct document body number {i} "
                          f"with unrelated content {i * 7}")
                 for i in range(6)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_ratio_per_method(self, spark):
        from deequ_spark import NearDuplicateRatio, do_analysis_run
        df = self._corpus(spark)
        for method in ("minhash", "jaccard", "exact"):
            ctx = do_analysis_run(df, [NearDuplicateRatio(
                "doc_id", "text", threshold=0.8, method=method)])
            (metric,) = ctx.metric_map.values()
            # 4 identical docs -> 3 losers of 10, under every method
            assert metric.is_success and metric.value == 0.3, method

    def test_where_scopes_the_corpus(self, spark):
        from deequ_spark import NearDuplicateRatio, do_analysis_run
        ctx = do_analysis_run(self._corpus(spark), [NearDuplicateRatio(
            "doc_id", "text", method="exact", where="doc_id < 10")])
        (metric,) = ctx.metric_map.values()
        assert metric.value == 0.75          # 3 losers of the 4 in scope

    def test_empty_corpus_is_failure_metric(self, spark):
        from deequ_spark import NearDuplicateRatio, do_analysis_run
        df = spark.createDataFrame([], "doc_id long, text string")
        ctx = do_analysis_run(df, [NearDuplicateRatio("doc_id", "text")])
        (metric,) = ctx.metric_map.values()
        assert not metric.is_success
        assert "Empty corpus" in str(metric.error)

    def test_missing_column_precondition(self, spark):
        from deequ_spark import NearDuplicateRatio, do_analysis_run
        df = spark.createDataFrame([(1, "x")], "doc_id long, body string")
        ctx = do_analysis_run(df, [NearDuplicateRatio("doc_id", "text")])
        (metric,) = ctx.metric_map.values()
        assert not metric.is_success

    def test_state_merge_is_counter_sum(self):
        from deequ_spark.analyzers.corpus import NearDupState
        merged = NearDupState(3, 10) + NearDupState(1, 5)
        assert (merged.losers, merged.total) == (4, 15)
        assert merged.ratio == pytest.approx(4 / 15)

    def test_check_builder_pass_and_fail(self, spark):
        from deequ_spark import Check, CheckLevel, VerificationSuite
        df = self._corpus(spark)
        ok = (VerificationSuite().on_data(df)
              .add_check(Check(CheckLevel.ERROR, "loose")
                         .has_near_duplicate_ratio(
                             "doc_id", "text", lambda r: r <= 0.5))
              .run())
        assert ok.status == CheckStatus.SUCCESS
        bad = (VerificationSuite().on_data(df)
               .add_check(Check(CheckLevel.ERROR, "tight")
                          .has_near_duplicate_ratio(
                              "doc_id", "text", lambda r: r <= 0.2))
               .run())
        assert bad.status == CheckStatus.ERROR
