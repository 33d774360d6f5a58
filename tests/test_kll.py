"""KLL sketch analyzer tests (SURVEY §2c).

Mirrors the reference's KLL coverage (KLLSketchTest / KLLRunner behavior):
quantile accuracy, bucket distribution shape, semigroup merge property,
integration with the shared analysis run and the check DSL.
"""

import numpy as np
import pytest

from deequ_spark import (Check, CheckLevel, CheckStatus, Completeness,
                         KLLParameters, KLLSketch, Mean, Size,
                         VerificationSuite, do_analysis_run,
                         run_on_aggregated_states)
from deequ_spark.analyzers.kll import KLLSketchCore, compute_kll_states


@pytest.fixture(scope="module")
def df_uniform(spark):
    vals = [(float(i),) for i in range(1, 1001)]
    return spark.createDataFrame(vals, "v double").repartition(4)


def test_kll_quantiles_close_to_exact(df_uniform):
    metric = KLLSketch("v").calculate(df_uniform)
    assert metric.is_success
    dist = metric.value
    # k=2048 over n=1000 → the sketch holds everything: near-exact ranks
    assert dist.quantile(0.5) == pytest.approx(500, abs=5)
    assert dist.quantile(0.25) == pytest.approx(250, abs=5)
    assert dist.min_value == 1.0
    assert dist.max_value == 1000.0


def test_kll_bucket_distribution(df_uniform):
    dist = KLLSketch("v", KLLParameters(2048, 0.64, 10)).calculate(df_uniform).value
    assert len(dist.buckets) == 10
    assert sum(b.count for b in dist.buckets) == 1000
    # uniform data → ~100 per equal-width bucket
    for b in dist.buckets:
        assert b.count == pytest.approx(100, abs=10)
    assert dist.buckets[0].low_value == 1.0
    assert dist.buckets[-1].high_value == 1000.0


def test_kll_core_accuracy_large():
    rng = np.random.default_rng(7)
    data = rng.normal(100, 15, 100_000)
    s = KLLSketchCore()
    s.update_batch(data)
    for q in (0.1, 0.5, 0.9):
        exact = float(np.quantile(data, q))
        assert s.quantile(q) == pytest.approx(exact, rel=0.02)


def test_kll_merge_matches_union():
    rng = np.random.default_rng(11)
    data = rng.uniform(0, 1000, 50_000)
    a, b, u = KLLSketchCore(), KLLSketchCore(seed=5), KLLSketchCore()
    a.update_batch(data[:25_000])
    b.update_batch(data[25_000:])
    u.update_batch(data)
    m = a.merge(b)
    assert m.count == u.count == 50_000
    assert m.min_value == u.min_value
    assert m.max_value == u.max_value
    for q in (0.25, 0.5, 0.75):
        assert m.quantile(q) == pytest.approx(u.quantile(q), rel=0.02)
    # merge is PURE: inputs unchanged, so provider-held states survive
    assert a.count == 25_000 and b.count == 25_000


def test_kll_aggregated_states_idempotent(df_uniform):
    """run_on_aggregated_states twice over the same providers must not
    double-count (regression: in-place sketch merge)."""
    from deequ_spark import InMemoryStateProvider, run_on_aggregated_states
    pa, pb = InMemoryStateProvider(), InMemoryStateProvider()
    analyzer = KLLSketch("v")
    do_analysis_run(df_uniform.where("v <= 500"), [analyzer], save_states_with=pa)
    do_analysis_run(df_uniform.where("v > 500"), [analyzer], save_states_with=pb)
    first = run_on_aggregated_states(df_uniform, [analyzer], [pa, pb])
    second = run_on_aggregated_states(df_uniform, [analyzer], [pa, pb])
    n1 = sum(b.count for b in first.metric_map[analyzer].value.buckets)
    n2 = sum(b.count for b in second.metric_map[analyzer].value.buckets)
    assert n1 == n2 == 1000


def test_kll_shares_one_pass_with_scan_analyzers(df_uniform):
    """KLL runs alongside fused scan analyzers; two KLL columns share one
    extra pass (states computed together)."""
    df = df_uniform.withColumn("w", df_uniform.v * 2)
    states = compute_kll_states(df, [KLLSketch("v"), KLLSketch("w")])
    assert len(states) == 2
    ctx = do_analysis_run(df, [Size(), Mean("v"), Completeness("v"),
                               KLLSketch("v")])
    assert len(ctx.metric_map) == 4
    assert all(m.is_success for m in ctx.metric_map.values())


def test_kll_check_dsl(df_uniform):
    result = (VerificationSuite().on_data(df_uniform)
              .add_check(Check(CheckLevel.ERROR, "kll")
                         .kll_sketch_satisfies(
                             "v", lambda d: 450 <= d.quantile(0.5) <= 550))
              .run())
    assert result.status == CheckStatus.SUCCESS


def test_kll_non_numeric_fails(df_full):
    metric = KLLSketch("att1").calculate(df_full)
    assert not metric.is_success


def test_histogram_binned_check_methods(df_uniform):
    result = (VerificationSuite().on_data(df_uniform)
              .add_check(Check(CheckLevel.ERROR, "binned")
                         .has_histogram_binned_bins("v", lambda n: n == 5,
                                                    bin_count=5)
                         .has_histogram_binned_values(
                             "v", lambda d: sum(v.absolute
                                                for v in d.values.values()) == 1000,
                             bin_count=5))
              .run())
    assert result.status == CheckStatus.SUCCESS


class TestReferenceParityFixtures:
    """Exact-value fixtures transcribed from the reference KLL suites.

    The reference compactor is DETERMINISTIC (NonSampleCompactor.scala:43-68
    — the random-offset branch is commented out; the offset just toggles),
    so its test fixtures pin exact sketch states. We rebuild those states
    through ``KLLSketchCore.reconstruct`` (the same serde surface the
    reference fixtures use, QuantileNonSample.scala:46-60) and must
    reproduce the exact published outputs.
    """

    def test_profile_fixture_six_values(self):
        """KLLProfileTest.scala:59-76 — att1 = 1.0..6.0 profiled with
        KLLParameters(2, 0.64, 2); sketch state data=[[5,6],[1,3]],
        expected BucketDistribution [1.0,3.5)→4, [3.5,6.0]→2."""
        from deequ_spark.analyzers.kll import _bucket_distribution
        s = KLLSketchCore.reconstruct(2, 0.64, [[5.0, 6.0], [1.0, 3.0]])
        assert s.count == 6
        assert (s.min_value, s.max_value) == (1.0, 6.0)
        dist = _bucket_distribution(s, KLLParameters(2, 0.64, 2))
        assert [(b.low_value, b.high_value, b.count)
                for b in dist.buckets] == [(1.0, 3.5, 4), (3.5, 6.0, 2)]

    def test_profile_fixture_thirty_values(self):
        """KLLProfileTest.scala:100-135 — att1 = 1.0..30.0 with
        KLLParameters(2, 0.64, 2); state data=[[27,28,29,30],[25],
        [1,6,10,15,19,23]], expected [1.0,15.5)→16, [15.5,30.0]→14."""
        from deequ_spark.analyzers.kll import _bucket_distribution
        s = KLLSketchCore.reconstruct(
            2, 0.64, [[27.0, 28.0, 29.0, 30.0], [25.0],
                      [1.0, 6.0, 10.0, 15.0, 19.0, 23.0]])
        assert s.count == 30
        dist = _bucket_distribution(s, KLLParameters(2, 0.64, 2))
        assert [(b.low_value, b.high_value, b.count)
                for b in dist.buckets] == [(1.0, 15.5, 16), (15.5, 30.0, 14)]

    def test_rank_inclusive_semantics(self):
        """QuantileNonSample.scala:163-171 getRank: inclusive weighted rank
        (the state is the one KLLDistanceTest.scala:31-38 reconstructs)."""
        s = KLLSketchCore.reconstruct(4, 0.64, [[1.0, 2.0, 3.0, 4.0]])
        assert [s.rank(v) for v in (0.5, 1.0, 2.0, 4.0, 9.0)] == \
            [0.0, 1.0, 2.0, 4.0, 4.0]

    def test_exact_mode_quantiles(self):
        """n < sketchSize → zero compaction → quantiles are EXACT order
        statistics (both engines agree bit-for-bit in exact mode)."""
        s = KLLSketchCore(2048, 0.64)
        s.update_batch(np.arange(1.0, 101.0))
        assert sum(1 for c in s.compactors if c.size) == 1  # no compaction
        assert s.quantile(0.25) == 25.0
        assert s.quantile(0.5) == 50.0
        assert s.quantile(0.75) == 75.0
        assert s.rank(50.0) == 50.0


class TestKLLProbabilisticBands:
    """Behavioral transcription of KLLProbTest.scala (stream length scaled
    1e6 → 1e5 for test time; same epsilon = 100/k error contract)."""

    @pytest.mark.parametrize("k", [100, 1000, 50000])
    def test_zoom_in_stream_rank_band(self, k):
        """KLLProbTest.scala:28-56 — stream 1, n, 2, n-1, ...; every
        sampled rank estimate within epsilon * n."""
        n = 100_000
        eps = 100.0 / k
        s = KLLSketchCore(k, 0.64)
        arr = np.empty(n)
        arr[0::2] = np.arange(1, n // 2 + 1)
        arr[1::2] = n + 1 - np.arange(1, n // 2 + 1)
        s.update_batch(arr)
        step = max(int(np.ceil(eps * 0.2 * n)), 1)
        for counter in range(1, n, step):
            assert abs(s.rank(counter) - counter) < eps * n

    @pytest.mark.parametrize("k", [100, 1000])
    def test_merged_stream_rank_band(self, k):
        """KLLProbTest.scala:89-122 — 10 sketches over consecutive 10k
        blocks (zoom-in order within each), merged; same error band."""
        part, merges = 10_000, 10
        eps = 100.0 / k
        merged = KLLSketchCore(k, 0.64)
        for m in range(merges):
            nxt = KLLSketchCore(k, 0.64, seed=100 + m)
            arr = np.empty(part)
            arr[0::2] = np.arange(1, part // 2 + 1) + m * part
            arr[1::2] = m * part + part + 1 - np.arange(1, part // 2 + 1)
            nxt.update_batch(arr)
            merged = merged.merge(nxt)
        n = part * merges
        assert merged.count == n
        step = max(int(np.ceil(eps * 0.2 * n)), 1)
        for counter in range(1, n, step):
            assert abs(merged.rank(counter) - counter) < eps * n
