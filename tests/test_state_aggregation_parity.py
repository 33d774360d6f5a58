"""State-aggregation parity (StateAggregationTests.scala:33-66): for every
mergeable analyzer, merging the states of two partitions must produce the
SAME metric as a direct computation over the union."""

import pytest

from deequ_spark import (ApproxCountDistinct, Completeness, Compliance,
                         Correlation, CountDistinct, Distinctness, Entropy,
                         Kurtosis, Maximum, MaxLength, Mean, Minimum,
                         MinLength, MutualInformation, Size, Skewness,
                         StandardDeviation, Sum, Uniqueness, UniqueValueRatio,
                         Variance)


@pytest.fixture(scope="module")
def split_data(spark):
    """Two partitions in the reference fixture's shape: repeated attribute
    groups plus two deterministic numeric columns."""
    def rows(offset, attrs):
        return [(f"item{offset + i}", attrs[i % len(attrs)],
                 f"v{(offset + i) % 7}",
                 float((offset + i) % 13) / 3.0,
                 float((offset * 7 + i * 3) % 11))
                for i in range(20)]
    schema = ("item string, attribute string, value string, "
              "numbersA double, numbersB double")
    a = spark.createDataFrame(
        rows(0, ["facets-0", "value", "facets-0", "facets-0"]), schema)
    b = spark.createDataFrame(
        rows(20, ["keyword-0", "keyword-0", "facets-0"]), schema)
    return a, b, a.union(b)


ANALYZERS = [
    Size(),
    Uniqueness(("attribute", "value")),
    Distinctness(("attribute",)),
    CountDistinct(("value",)),
    UniqueValueRatio(("attribute", "value")),
    Completeness("attribute"),
    Compliance("attribute", "attribute like '%facets%'",
               columns=("attribute",)),
    MutualInformation(("numbersA", "numbersB")),
    Correlation("numbersA", "numbersB"),
    Entropy("attribute"),
    Mean("numbersA"),
    Sum("numbersA"),
    Minimum("numbersA"),
    Maximum("numbersA"),
    StandardDeviation("numbersA"),
    Variance("numbersA"),
    Skewness("numbersA"),
    Kurtosis("numbersA"),
    MinLength("attribute"),
    MaxLength("attribute"),
]


@pytest.mark.parametrize("analyzer", ANALYZERS,
                         ids=lambda a: f"{type(a).__name__}-{a.instance}")
def test_merged_state_equals_direct(analyzer, split_data):
    a, b, ab = split_data
    state_a = analyzer.compute_state_from(a)
    state_b = analyzer.compute_state_from(b)
    merged = state_a.merge(state_b)
    from_merge = analyzer.compute_metric_from_state(merged)
    direct = analyzer.calculate(ab)
    assert from_merge.is_success and direct.is_success, (
        from_merge.error or direct.error)
    assert from_merge.value == pytest.approx(direct.value, rel=1e-9)


def test_approx_count_distinct_merge(split_data):
    """HLL sketches merge; estimates are identical because the merged
    sketch is the same object Spark would build over the union."""
    a, b, ab = split_data
    analyzer = ApproxCountDistinct("value")
    merged = (analyzer.compute_state_from(a)
              .merge(analyzer.compute_state_from(b)))
    assert analyzer.compute_metric_from_state(merged).value == \
        analyzer.calculate(ab).value


class TestAnalysisRunnerBuilder:
    """AnalysisRunnerTests.scala:373-410 builder semantics."""

    def test_duplicate_analyzers_raise(self, spark):
        from deequ_spark import AnalysisRunner
        df = spark.createDataFrame([(1,)], "att1 int")
        with pytest.raises(ValueError):
            (AnalysisRunner.on_data(df)
             .add_analyzers([Size(), Completeness("att1"), Size()]))

    def test_filtered_variants_coexist(self, spark):
        from deequ_spark import AnalysisRunner
        df = spark.createDataFrame([(0, 1), (2, 3)], "att1 int, att2 int")
        ctx = (AnalysisRunner.on_data(df)
               .add_analyzers([Size(), Size(where="att1 = 0"),
                               Size(where="att2 > 0")])
               .run())
        vals = {a.where: m.value for a, m in ctx.metric_map.items()}
        assert vals == {None: 2.0, "att1 = 0": 1.0, "att2 > 0": 2.0}

    def test_no_size_added_for_frequency_only(self, spark):
        from deequ_spark import AnalysisRunner
        df = spark.createDataFrame([("a",), ("b",)], "att1 string")
        ctx = (AnalysisRunner.on_data(df)
               .add_analyzer(Distinctness(("att1",))).run())
        assert not any(type(a).__name__ == "Size"
                       for a in ctx.metric_map)

    def test_builder_with_repository(self, spark):
        from deequ_spark import (AnalysisRunner, InMemoryMetricsRepository,
                                 ResultKey)
        df = spark.createDataFrame([(1,), (2,)], "att1 int")
        repo = InMemoryMetricsRepository()
        key = ResultKey.make(1000)
        ctx = (AnalysisRunner.on_data(df).add_analyzer(Size())
               .use_repository(repo).save_or_append_result(key).run())
        assert ctx.metric_map[Size()].value == 2.0
        assert repo.load_by_key(key).metric_map[Size()].value == 2.0
