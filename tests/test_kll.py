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
