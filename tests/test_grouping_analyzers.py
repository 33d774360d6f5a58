"""Exact-value tests for frequency-based analyzers (FIXTURES.md F5/F6)."""

import math

import pytest

from deequ_spark import (CountDistinct, Distinctness, DuplicateRowCount,
                         Entropy, Histogram, HistogramBinned,
                         MutualInformation, Uniqueness, UniqueValueRatio)


def value(analyzer, df):
    metric = analyzer.calculate(df)
    assert metric.is_success, f"{analyzer}: {metric.error}"
    return metric.value


class TestUniqueness:
    def test_unique_column(self, df_unique):
        assert value(Uniqueness(("unique",)), df_unique) == 1.0

    def test_non_unique(self, df_unique):
        # nonUnique = (0,0,0,5,6,7): 3 singleton groups of 6 rows
        assert value(Uniqueness(("nonUnique",)), df_unique) == 0.5

    def test_multi_column(self, df_unique):
        assert value(Uniqueness(("unique", "nonUnique")), df_unique) == 1.0

    def test_null_groups_excluded(self, df_distinct):
        # att1 = (a,a,null,b,b,c): groups a:2 b:2 c:1 over 5 non-null rows
        assert value(Uniqueness(("att1",)), df_distinct) == pytest.approx(1 / 5)


class TestUniqueValueRatio:
    def test_ratio(self, df_unique):
        # nonUnique: 4 groups, 3 unique → 0.75
        assert value(UniqueValueRatio(("nonUnique",)), df_unique) == 0.75


class TestDistinctness:
    def test_distinctness(self, df_distinct):
        assert value(Distinctness(("att1",)), df_distinct) == pytest.approx(3 / 5)

    def test_full(self, df_unique):
        assert value(Distinctness(("unique",)), df_unique) == 1.0


class TestCountDistinct:
    def test_count(self, df_distinct):
        assert value(CountDistinct(("att1",)), df_distinct) == 3.0


class TestEntropy:
    def test_entropy(self, df_distinct):
        # frequencies (2,2,1) over 5
        expected = -(0.4 * math.log(0.4) * 2 + 0.2 * math.log(0.2))
        assert value(Entropy("att1"), df_distinct) == pytest.approx(expected)

    def test_uniform(self, df_full):
        # att2 = c,c,c,d → -(0.75 ln 0.75 + 0.25 ln 0.25)
        expected = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
        assert value(Entropy("att2"), df_full) == pytest.approx(expected)


class TestDuplicateRowCount:
    def test_duplicates(self, df_unique):
        # nonUnique groups: {0:3, 5:1, 6:1, 7:1} → 3 rows in duplicate groups
        assert value(DuplicateRowCount(("nonUnique",)), df_unique) == 3.0

    def test_no_duplicates(self, df_unique):
        assert value(DuplicateRowCount(("unique",)), df_unique) == 0.0


class TestMutualInformation:
    def test_identical_columns_equals_entropy(self, spark):
        df = spark.createDataFrame(
            [("a", "a"), ("a", "a"), ("b", "b"), ("c", "c")], "x string, y string")
        mi = value(MutualInformation(("x", "y")), df)
        ent = value(Entropy("x"), df)
        assert mi == pytest.approx(ent)

    def test_independent(self, spark):
        rows = [(x, y) for x in "ab" for y in "cd"]
        df = spark.createDataFrame(rows, "x string, y string")
        assert value(MutualInformation(("x", "y")), df) == pytest.approx(0.0, abs=1e-9)


class TestHistogram:
    def test_values(self, df_full):
        dist = value(Histogram("att1"), df_full)
        assert dist.number_of_bins == 2
        assert dist["a"].absolute == 3
        assert dist["a"].ratio == 0.75
        assert dist["b"].absolute == 1

    def test_nulls_bucketed(self, df_distinct):
        dist = value(Histogram("att1"), df_distinct)
        assert dist["NullValue"].absolute == 1
        assert dist.number_of_bins == 4

    def test_top_n_and_tail(self, df_full):
        dist = value(Histogram("att1", max_detail_bins=1), df_full)
        assert len(dist.values) == 1
        assert dist.number_of_bins == 2
        assert dist.tail_count == 1

    def test_sum_aggregation(self, spark):
        df = spark.createDataFrame(
            [("a", 10), ("a", 20), ("b", 5)], "k string, v int")
        dist = value(Histogram("k", sum_column="v"), df)
        assert dist["a"].absolute == 30
        assert dist["b"].absolute == 5


class TestHistogramBinned:
    def test_equal_width(self, spark):
        df = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
        dist = value(HistogramBinned("v", bin_count=3), df)
        assert dist.number_of_bins == 3
        assert sum(dv.absolute for dv in dist.values.values()) == 10

    def test_custom_edges(self, spark):
        df = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
        dist = value(HistogramBinned("v", custom_edges=(0.0, 5.0, 10.0)), df)
        counts = [dv.absolute for dv in dist.values.values()]
        assert counts == [5, 5]


class TestRowLevelUniqueness:
    def test_row_level_column(self, spark):
        from deequ_spark import Check, CheckLevel, CheckStatus, VerificationSuite
        df = spark.createDataFrame(
            [("1", "a"), ("2", "a"), ("3", "b"), ("4", None)],
            "id string, g string")
        check = Check(CheckLevel.ERROR, "uniq").is_unique("g")
        result = VerificationSuite().on_data(df).add_check(check).run()
        annotated = result.row_level_results_as_dataframe(df)
        got = {r["id"]: r["uniq"] for r in annotated.collect()}
        # duplicated 'a' rows fail; 'b' passes; a LONE null group is unique
        # (reference UniquenessTest "row-level results for uniqueness with
        # null": uniqueWithNulls → all true — the window count partitions
        # NULLs together rather than dropping them)
        assert got == {"1": False, "2": False, "3": True, "4": True}

    def test_row_level_uniqueness_two_nulls_fail(self, spark):
        from deequ_spark import Check, CheckLevel, VerificationSuite
        df = spark.createDataFrame(
            [("1", "a"), ("2", None), ("3", None)], "id string, g string")
        check = Check(CheckLevel.ERROR, "uniq").is_unique("g")
        result = VerificationSuite().on_data(df).add_check(check).run()
        got = {r["id"]: r["uniq"] for r in
               result.row_level_results_as_dataframe(df).collect()}
        assert got == {"1": True, "2": False, "3": False}


class TestHistogramBinnedOverflow:
    """include_overflow_bins parity (HistogramBinned.scala:62-268): ±Inf
    under/overflow bins capture out-of-range values; the last interior
    bin's upper edge becomes inclusive so the data max stays interior."""

    def test_custom_edges_overflow(self, spark):
        from deequ_spark import HistogramBinned, do_analysis_run
        df = spark.createDataFrame(
            [(-5.0,), (0.0,), (2.0,), (5.0,), (7.0,), (10.0,), (99.0,)],
            "v double")
        a = HistogramBinned("v", custom_edges=(0.0, 5.0, 10.0),
                            include_overflow_bins=True)
        dist = do_analysis_run(df, [a]).metric_map[a].value
        counts = [dv.absolute for dv in dist.values.values()]
        # [-inf,0): -5 | [0,5): 0,2 | [5,10]: 5,7,10 (max inclusive) | (10,inf]: 99
        assert counts == [1, 2, 3, 1]
        assert dist.number_of_bins == 4

    def test_custom_edges_without_overflow_drops(self, spark):
        from deequ_spark import HistogramBinned, do_analysis_run
        df = spark.createDataFrame(
            [(-5.0,), (0.0,), (2.0,), (5.0,), (7.0,), (10.0,), (99.0,)],
            "v double")
        a = HistogramBinned("v", custom_edges=(0.0, 5.0, 10.0))
        dist = do_analysis_run(df, [a]).metric_map[a].value
        counts = [dv.absolute for dv in dist.values.values()]
        # out-of-range (-5, 99) silently excluded; last bin inclusive
        assert counts == [2, 3]

    def test_equal_width_overflow(self, spark):
        from deequ_spark import HistogramBinned, do_analysis_run
        df = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
        a = HistogramBinned("v", bin_count=4, include_overflow_bins=True)
        dist = do_analysis_run(df, [a]).metric_map[a].value
        counts = [dv.absolute for dv in dist.values.values()]
        # interior = 2 bins over [0,9]: [0,4.5) → 5 values, [4.5,9] → 5;
        # ±Inf bins empty but PRESENT
        assert counts == [0, 5, 5, 0]
        assert dist.number_of_bins == 4

    def test_bin_count_minimum_with_overflow(self, spark):
        from deequ_spark import HistogramBinned, do_analysis_run
        df = spark.createDataFrame([(1.0,)], "v double")
        a = HistogramBinned("v", bin_count=2, include_overflow_bins=True)
        m = do_analysis_run(df, [a]).metric_map[a]
        assert not m.is_success  # binCount >= 3 required (scala :104-107)

    def test_unsorted_custom_edges_are_sorted(self, spark):
        from deequ_spark import HistogramBinned, do_analysis_run
        df = spark.createDataFrame([(1.0,), (6.0,)], "v double")
        a = HistogramBinned("v", custom_edges=(10.0, 0.0, 5.0))
        dist = do_analysis_run(df, [a]).metric_map[a].value
        assert [dv.absolute for dv in dist.values.values()] == [1, 1]


class TestHistogramBinningUdf:
    """binning_udf contract (r4 advice): a Column-returning callable stays
    a pure JVM expression; scalar callables route through an Arrow-batched
    pandas_udf — never a row-at-a-time Python UDF."""

    def test_column_expression_fast_path(self, spark):
        from pyspark.sql import functions as F
        df = spark.createDataFrame([(1,), (5,), (20,), (30,)], "v int")
        a = Histogram("v", binning_udf=lambda c: F.when(c < 10, "small")
                      .otherwise("big"))
        dist = value(a, df)
        assert dist["small"].absolute == 2 and dist["big"].absolute == 2

    def test_column_fast_path_plan_has_no_python(self, spark):
        from pyspark.sql import functions as F
        df = spark.createDataFrame([(1,), (20,)], "v int")
        a = Histogram("v", binning_udf=lambda c: F.when(c < 10, "small")
                      .otherwise("big"))
        state = a.compute_state_from(df)
        plan = (state.frequencies._jdf.queryExecution().executedPlan()
                .toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_scalar_callable_uses_arrow_not_row_udf(self, spark):
        df = spark.createDataFrame([(1,), (5,), (20,), (30,)], "v int")
        a = Histogram("v", binning_udf=lambda v: "small" if v < 10 else "big")
        state = a.compute_state_from(df)
        plan = (state.frequencies._jdf.queryExecution().executedPlan()
                .toString())
        assert "BatchEvalPython" not in plan     # no pickled row-at-a-time
        dist = a.compute_metric_from_state(state).value
        assert dist["small"].absolute == 2 and dist["big"].absolute == 2

    def test_scalar_callable_null_passthrough(self, spark):
        df = spark.createDataFrame([(1,), (None,)], "v int")
        a = Histogram("v", binning_udf=lambda v: "x")
        dist = value(a, df)
        assert dist["x"].absolute == 1
        assert dist["NullValue"].absolute == 1

    def test_raising_column_callable_surfaces_at_analysis_time(self, spark):
        """A Column-accepting hook with a genuine bug must surface its own
        error at analysis time — NOT be silently retried as a pandas_udf
        and fail confusingly executor-side (r5 verdict finding #2)."""
        from deequ_spark import do_analysis_run
        df = spark.createDataFrame([(1,)], "v int")

        def buggy_hook(c):
            raise RuntimeError("typo in binning hook")

        a = Histogram("v", binning_udf=buggy_hook)
        m = do_analysis_run(df, [a]).metric_map[a]
        assert not m.is_success
        assert "typo in binning hook" in str(m.error)


class TestHistogramBinnedReferenceFixtures:
    """Transcribed from /root/reference/src/test/scala/com/amazon/deequ/
    analyzers/HistogramBinnedTest.scala (line refs per test)."""

    def _bins(self, dist):
        return [dv.absolute for dv in dist.values.values()]

    def test_equal_width_integer(self, spark):
        """:34-82 — 14 values, 5 equal bins over [1, 30]."""
        data = spark.createDataFrame(
            [(v,) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 15, 20, 25, 30]],
            "values int")
        dist = value(HistogramBinned("values", bin_count=5), data)
        assert dist.number_of_bins == 5
        assert self._bins(dist) == [6, 4, 1, 1, 2]
        ratios = [dv.ratio for dv in dist.values.values()]
        assert ratios[0] == pytest.approx(6 / 14, abs=0.001)
        assert ratios[4] == pytest.approx(2 / 14, abs=0.001)

    def test_all_null_data(self, spark):
        """:298-315 — SUCCESS with zero bins, nulls tracked separately."""
        data = spark.createDataFrame([(None,)] * 4, "values double")
        dist = value(HistogramBinned("values", bin_count=3), data)
        assert dist.number_of_bins == 0
        assert dist.values == {}
        assert dist.null_count == 4

    def test_empty_bins_and_nulls(self, spark):
        """:317-345 — gaps keep empty bins; nulls separate."""
        data = spark.createDataFrame([(1.0,), (None,), (9.0,), (None,)],
                                     "values double")
        dist = value(HistogramBinned("values", bin_count=5), data)
        assert dist.number_of_bins == 5
        assert self._bins(dist) == [1, 0, 0, 0, 1]
        assert dist.null_count == 2

    def test_boundary_values(self, spark):
        """:549-577 — edge-exact values, last custom bin inclusive."""
        data = spark.createDataFrame(
            [(v,) for v in [0.0, 5.0, 10.0, 15.0, 20.0]], "values double")
        dist = value(HistogramBinned(
            "values", custom_edges=(0.0, 5.0, 10.0, 20.0)), data)
        assert self._bins(dist) == [1, 1, 3]

    def test_gaps_with_empty_bins(self, spark):
        """:578-603."""
        data = spark.createDataFrame([(1.0,), (19.0,)], "values double")
        dist = value(HistogramBinned(
            "values", custom_edges=(0.0, 5.0, 10.0, 15.0, 20.0)), data)
        assert self._bins(dist) == [1, 0, 0, 1]

    def test_overflow_custom_edges(self, spark):
        """:674-703."""
        data = spark.createDataFrame(
            [(v,) for v in [1.0, 5.0, 15.0, 25.0]], "values double")
        dist = value(HistogramBinned("values", custom_edges=(0.0, 10.0, 20.0),
                                     include_overflow_bins=True), data)
        assert dist.number_of_bins == 4
        assert self._bins(dist) == [0, 2, 1, 1]

    def test_overflow_auto_edges(self, spark):
        """:705-727 — binCount 5 with overflow = 3 interior + 2 empty
        overflow; max stays interior."""
        data = spark.createDataFrame(
            [(float(v),) for v in range(1, 6)], "values double")
        dist = value(HistogramBinned("values", bin_count=5,
                                     include_overflow_bins=True), data)
        assert dist.number_of_bins == 5
        bins = self._bins(dist)
        assert bins[0] == 0 and bins[4] == 0
        assert sum(bins) == 5

    def test_no_duplicate_infinity_edges(self, spark):
        """:729-749 — user-provided ±Inf edges are not duplicated; the
        boundary value 20.0 stays in the last interior bin."""
        data = spark.createDataFrame(
            [(v,) for v in [1.0, 5.0, 20.0, 25.0]], "values double")
        dist = value(HistogramBinned(
            "values",
            custom_edges=(float("-inf"), 0.0, 10.0, 20.0, float("inf")),
            include_overflow_bins=True), data)
        assert dist.number_of_bins == 4
        assert self._bins(dist) == [0, 2, 1, 1]

    def test_nulls_separate_from_overflow(self, spark):
        """:750-776."""
        data = spark.createDataFrame(
            [(-5.0,), (None,), (5.0,), (25.0,), (None,)], "values double")
        dist = value(HistogramBinned("values", custom_edges=(0.0, 10.0, 20.0),
                                     include_overflow_bins=True), data)
        assert dist.number_of_bins == 4
        assert self._bins(dist) == [1, 1, 0, 1]
        assert dist.null_count == 2

    def test_out_of_range_dropped_nulls_counted(self, spark):
        """:975-997 — overflow disabled: out-of-range silently dropped,
        nulls still tallied."""
        data = spark.createDataFrame(
            [(-5.0,), (None,), (5.0,), (25.0,)], "values double")
        dist = value(HistogramBinned("values",
                                     custom_edges=(0.0, 10.0, 20.0)), data)
        assert self._bins(dist) == [1, 0]
        assert dist.null_count == 1

    def test_single_value_single_bin(self, spark):
        """:1035-1050 — constant column → ONE [v, v] bin, bin_count
        ignored."""
        data = spark.createDataFrame([(5.0,)] * 5, "values double")
        dist = value(HistogramBinned("values", bin_count=10), data)
        assert dist.number_of_bins == 1
        assert self._bins(dist) == [5]

    def test_single_value_with_overflow(self, spark):
        """:1051-1071."""
        data = spark.createDataFrame([(5.0,)] * 3, "values double")
        dist = value(HistogramBinned("values", bin_count=5,
                                     include_overflow_bins=True), data)
        assert dist.number_of_bins == 3
        assert self._bins(dist) == [0, 3, 0]

    def test_single_value_with_nulls(self, spark):
        """:1072-1090."""
        data = spark.createDataFrame(
            [(5.0,), (None,), (5.0,), (None,), (5.0,)], "values double")
        dist = value(HistogramBinned("values", bin_count=10), data)
        assert dist.number_of_bins == 1
        assert self._bins(dist) == [3]
        assert dist.null_count == 2

    def test_too_few_custom_edges_fails(self, spark):
        """:1128-1133."""
        data = spark.createDataFrame([(1.0,)], "values double")
        from deequ_spark import do_analysis_run
        a = HistogramBinned("values", custom_edges=(1.0,))
        assert not do_analysis_run(data, [a]).metric_map[a].is_success
