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


class TestIncrementalAnalysisParity:
    """Transcribed from /root/reference/src/test/scala/com/amazon/deequ/
    analyzers/IncrementalAnalysisTest.scala (line refs per test): a delta
    scanned with aggregate_with=<prior states> must reproduce the
    non-incremental metrics over initial ∪ delta exactly."""

    def test_incremental_equals_full(self, spark, split_data):
        """:30-58 — Size/Uniqueness/Completeness/Entropy via the runner's
        aggregate_with path."""
        from deequ_spark import InMemoryStateProvider, do_analysis_run
        initial, delta, _ = split_data
        everything = initial.union(delta)
        analyzers = [Size(), Uniqueness(("attribute",)),
                     Completeness("item"), Entropy("attribute"),
                     Completeness("attribute"), Entropy("value")]
        prior = InMemoryStateProvider()
        do_analysis_run(initial, analyzers, save_states_with=prior)
        incremental = do_analysis_run(delta, analyzers,
                                      aggregate_with=prior)
        full = do_analysis_run(everything, analyzers)
        for a in analyzers:
            assert incremental.metric_map[a].value == \
                pytest.approx(full.metric_map[a].value, rel=1e-12), str(a)

    def test_incremental_shared_scan_compliances(self, spark, split_data):
        """:60-85 — compliances sharing one fused scan stay exact."""
        from deequ_spark import InMemoryStateProvider, do_analysis_run
        initial, delta, _ = split_data
        everything = initial.union(delta)
        analyzers = [
            Compliance("attributeNonNull", "attribute IS NOT NULL"),
            Compliance("categoryAttribute", "attribute LIKE 'facets%'"),
            Compliance("attributeKeyword", "attribute LIKE '%keyword%'"),
            Completeness("item"), Completeness("attribute")]
        prior = InMemoryStateProvider()
        do_analysis_run(initial, analyzers, save_states_with=prior)
        results = do_analysis_run(delta, analyzers, aggregate_with=prior)
        for a, m in results.metric_map.items():
            assert m.value == pytest.approx(
                a.calculate(everything).value, rel=1e-12), str(a)

    def test_incremental_grouping_metrics(self, spark, split_data):
        """:87-105 — Uniqueness+Entropy on the shared frequency table."""
        from deequ_spark import InMemoryStateProvider, do_analysis_run
        initial, delta, _ = split_data
        everything = initial.union(delta)
        analyzers = [Uniqueness(("value",)), Entropy("value")]
        prior = InMemoryStateProvider()
        do_analysis_run(initial, analyzers, save_states_with=prior)
        results = do_analysis_run(delta, analyzers, aggregate_with=prior)
        for a, m in results.metric_map.items():
            assert m.value == pytest.approx(
                a.calculate(everything).value, rel=1e-12), str(a)

    def test_chained_deltas_via_saved_merged_states(self, spark, split_data):
        """aggregate_with + save_states_with chains: the merged states
        persisted after delta 1 feed delta 2."""
        from deequ_spark import InMemoryStateProvider, do_analysis_run
        initial, delta, _ = split_data
        d1 = delta.where("item < 'item30'")
        d2 = delta.where("item >= 'item30'")
        analyzers = [Size(), Mean("numbersA"), Uniqueness(("attribute",))]
        s0, s1 = InMemoryStateProvider(), InMemoryStateProvider()
        do_analysis_run(initial, analyzers, save_states_with=s0)
        do_analysis_run(d1, analyzers, aggregate_with=s0,
                        save_states_with=s1)
        final = do_analysis_run(d2, analyzers, aggregate_with=s1)
        full = do_analysis_run(initial.union(delta), analyzers)
        for a in analyzers:
            assert final.metric_map[a].value == \
                pytest.approx(full.metric_map[a].value, rel=1e-12), str(a)

    def test_builder_aggregate_with(self, spark, split_data):
        """AnalysisRunBuilder fluent surface for aggregateWith."""
        from deequ_spark import InMemoryStateProvider
        from deequ_spark.runners.analysis_runner import AnalysisRunner
        initial, delta, _ = split_data
        prior = InMemoryStateProvider()
        (AnalysisRunner.on_data(initial).add_analyzer(Size())
         .save_states_with(prior).run())
        ctx = (AnalysisRunner.on_data(delta).add_analyzer(Size())
               .aggregate_with(prior).run())
        assert ctx.metric_map[Size()].value == \
            initial.count() + delta.count()


class TestStateProviderRestoreGrid:
    """Transcribed from analyzers/StateProviderTest.scala:34-131 — for
    every state-ful analyzer: persist its state through a provider, load
    it back, and the metric computed FROM THE RESTORED STATE must equal a
    direct computation. Runs the same grid over InMemory and FileSystem
    providers."""

    @pytest.fixture(scope="class")
    def some_data(self, spark):
        # StateProviderTest someData shape: item/att1/count/price
        rows = [("1", "a", 17, 1.3), ("2", None, 12, 76.0),
                ("3", "b", 15, 89.0), ("4", "b", 12, 12.7),
                ("5", None, 1, 1.0), ("6", "a", 21, 78.0),
                ("7", None, 12, 0.0)]
        return spark.createDataFrame(
            rows, "item string, att1 string, count int, price double")

    def _grid(self):
        from deequ_spark import (ApproxCountDistinct, DuplicateRowCount,
                                 Kurtosis, MaxLength, MinLength,
                                 PatternMatch)
        from deequ_spark.analyzers.scan import (ColumnRange, DataType,
                                                ExactQuantile,
                                                InterquartileRange,
                                                ZerosCount)
        return [
            Size(), ZerosCount("price"), Completeness("att1"),
            Compliance("att1eq", "att1 = 'b'"),
            PatternMatch("att1", r"[a-z]"),
            Sum("price"), Mean("price"), Minimum("price"), Maximum("price"),
            ColumnRange("price"), InterquartileRange("price"),
            StandardDeviation("price"), Variance("price"),
            Skewness("price"), Kurtosis("price"),
            MaxLength("att1"), MinLength("att1"),
            DataType("item"), ApproxCountDistinct("att1"),
            Correlation("count", "price"),
            Uniqueness(("att1",)), Uniqueness(("att1", "count")),
            Entropy("att1"), DuplicateRowCount(("att1", "count")),
            ExactQuantile("price", 0.5),
        ]

    def _assert_restores(self, provider, analyzers, data):
        from deequ_spark import do_analysis_run
        direct = do_analysis_run(data, analyzers)
        for a in analyzers:
            state = a.compute_state_from(data)
            provider.persist(a, state)
        for a in analyzers:
            restored = provider.load(a)
            assert restored is not None, str(a)
            m = a.compute_metric_from_state(restored)
            d = direct.metric_map[a]
            assert m.is_success and d.is_success, str(a)
            if isinstance(m.value, float) and isinstance(d.value, float):
                assert m.value == pytest.approx(d.value, rel=1e-9), str(a)

    def test_in_memory_restore(self, some_data):
        from deequ_spark import InMemoryStateProvider
        self._assert_restores(InMemoryStateProvider(), self._grid(),
                              some_data)

    def test_filesystem_restore(self, tmp_path, spark, some_data):
        from deequ_spark import FileSystemStateProvider
        provider = FileSystemStateProvider(str(tmp_path / "grid"), spark)
        self._assert_restores(provider, self._grid(), some_data)

    def test_filesystem_overwrite_guard(self, tmp_path, some_data):
        """StateProviderTest.scala:134-176 — a second persist fails
        unless allow_overwrite=True."""
        from deequ_spark import FileSystemStateProvider
        provider = FileSystemStateProvider(str(tmp_path / "guard"))
        a = Mean("price")
        state = a.compute_state_from(some_data)
        provider.persist(a, state)
        with pytest.raises(FileExistsError, match="already exists"):
            provider.persist(a, state)
        lax = FileSystemStateProvider(str(tmp_path / "lax"),
                                      allow_overwrite=True)
        lax.persist(a, state)
        lax.persist(a, state)      # overwrite succeeds
        m = a.compute_metric_from_state(lax.load(a))
        assert m.value == pytest.approx(36.857142857142854)
