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

    def test_in_memory_and_filesystem_restore(self, tmp_path, spark,
                                              some_data):
        """One merged grid over BOTH providers: states and the direct
        metrics are computed ONCE (they are provider-independent), each
        provider round-trips the same states — halves the ~100 Spark
        actions the two separate grid tests paid (r13 suite budget)."""
        from deequ_spark import (FileSystemStateProvider,
                                 InMemoryStateProvider, do_analysis_run)
        analyzers = self._grid()
        providers = [InMemoryStateProvider(),
                     FileSystemStateProvider(str(tmp_path / "grid"), spark)]
        direct = do_analysis_run(some_data, analyzers)
        for a in analyzers:
            state = a.compute_state_from(some_data)
            for provider in providers:
                provider.persist(a, state)
        for provider in providers:
            for a in analyzers:
                restored = provider.load(a)
                assert restored is not None, str(a)
                m = a.compute_metric_from_state(restored)
                d = direct.metric_map[a]
                assert m.is_success and d.is_success, str(a)
                if isinstance(m.value, float) and isinstance(d.value, float):
                    assert m.value == pytest.approx(d.value, rel=1e-9), str(a)

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


class TestIncrementalAnalyzerParity:
    """Transcribed from analyzers/IncrementalAnalyzerTest.scala (line
    refs per test): initial (3 rows) + delta (2 rows) + moreDelta
    snapshots — per-analyzer initial/delta/merged EXACT values."""

    @pytest.fixture(scope="class")
    def initial(self, spark):
        return spark.createDataFrame(
            [("1", "a", 12), ("2", None, 12), ("3", "b", 12)],
            "item string, att1 string, count int")

    @pytest.fixture(scope="class")
    def delta(self, spark):
        return spark.createDataFrame(
            [("4", "b", 12), ("5", None, 12)],
            "item string, att1 string, count int")

    @pytest.fixture(scope="class")
    def more_delta(self, spark):
        return spark.createDataFrame(
            [("6", "a", 12), ("7", None, 12)],
            "item string, att1 string, count int")

    def _trio(self, analyzer, initial, delta):
        s1 = analyzer.compute_state_from(initial)
        s2 = analyzer.compute_state_from(delta)
        return (analyzer.compute_metric_from_state(s1).value,
                analyzer.compute_metric_from_state(s2).value,
                analyzer.compute_metric_from_state(s1.merge(s2)).value)

    def test_size(self, initial, delta):
        """:32-53."""
        from deequ_spark import Size
        assert self._trio(Size(), initial, delta) == (3.0, 2.0, 5.0)

    def test_compliance(self, initial, delta):
        """:56-78 — 1/3, 1/2, merged 2/5."""
        from deequ_spark import Compliance
        i, d, m = self._trio(Compliance("att1", "att1 = 'b'",
                                        columns=("att1",)), initial, delta)
        assert i == pytest.approx(1 / 3) and d == 0.5 and m == 0.4

    def test_completeness(self, initial, delta):
        """:80-102 — 2/3, 1/2, merged 3/5."""
        from deequ_spark import Completeness
        i, d, m = self._trio(Completeness("att1"), initial, delta)
        assert i == pytest.approx(2 / 3) and d == 0.5 and m == 0.6

    def test_uniqueness_single(self, initial, delta):
        """:104-124 — 1.0, 1.0, merged 1/3."""
        from deequ_spark import Uniqueness
        i, d, m = self._trio(Uniqueness(("att1",)), initial, delta)
        assert (i, d) == (1.0, 1.0) and m == pytest.approx(1 / 3)

    def test_uniqueness_combination(self, initial, delta):
        """:126-148 — (att1, count): 1.0, 1.0, merged 0.2."""
        from deequ_spark import Uniqueness
        i, d, m = self._trio(Uniqueness(("att1", "count")), initial, delta)
        assert (i, d) == (1.0, 1.0) and m == pytest.approx(0.2)

    def test_entropy(self, initial, delta):
        """:150-174 — incremental equals non-incremental."""
        from deequ_spark import Entropy
        a = Entropy("att1")
        i, d, m = self._trio(a, initial, delta)
        assert i == pytest.approx(a.calculate(initial).value)
        assert d == pytest.approx(a.calculate(delta).value)
        assert m == pytest.approx(a.calculate(initial.union(delta)).value)

    def test_approx_quantile_merge(self, spark):
        """:177-201 — median of merged KLL/approx states == exact 0.0."""
        from deequ_spark import ApproxQuantile
        first = spark.createDataFrame(
            [("1", 0.0), ("2", 1.0), ("3", 2.0)], "item string, att1 double")
        second = spark.createDataFrame(
            [("1", -2.0), ("2", -1.0)], "item string, att1 double")
        a = ApproxQuantile("att1", 0.5)
        merged = a.compute_state_from(first).merge(
            a.compute_state_from(second))
        summed = a.compute_metric_from_state(merged).value
        direct = a.calculate(first.union(second)).value
        assert direct == 0.0 and summed == direct

    def test_entropy_three_snapshots(self, initial, delta, more_delta):
        """:203-241 — chained merges track the non-incremental series."""
        from deequ_spark import Entropy
        a = Entropy("att1")
        s1 = a.compute_state_from(initial)
        s12 = s1.merge(a.compute_state_from(delta))
        s123 = s12.merge(a.compute_state_from(more_delta))
        assert a.compute_metric_from_state(s1).value == \
            pytest.approx(a.calculate(initial).value)
        assert a.compute_metric_from_state(s12).value == \
            pytest.approx(a.calculate(initial.union(delta)).value)
        assert a.compute_metric_from_state(s123).value == \
            pytest.approx(a.calculate(
                initial.union(delta).union(more_delta)).value)

    def test_histogram_state_sum_no_error(self, spark):
        """StateAggregationIntegrationTest.scala:269-284 (DEEQU-189) —
        summing two histogram states of the same data does not throw."""
        from deequ_spark.analyzers.grouping import Histogram
        data = spark.createDataFrame(
            [(1, "Thingy A", "awesome thing.", "high", 0),
             (2, "Thingy B", "available at http://thingb.com", None, 0),
             (3, None, None, "low", 5),
             (4, "Thingy D", "checkout https://thingd.ca", "low", 10),
             (5, "Thingy E", None, "high", 12)],
            "id int, productName string, description string, "
            "priority string, numViews int")
        a = Histogram("id")
        s1 = a.compute_state_from(data)
        s2 = a.compute_state_from(data)
        merged = s1.merge(s2)
        m = a.compute_metric_from_state(merged)
        assert m.is_success and m.value.number_of_bins == 5
