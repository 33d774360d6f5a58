"""Transcriptions of /root/reference/src/test/scala/com/amazon/deequ/
repository/AnalysisResultSerdeTest.scala (703 LoC — the reference's
largest serde surface; line refs per test) against our reference-wire
serde (deequ_spark/repository.py to_deequ_json / from_deequ_json /
serialize_reference_* / deserialize_reference_*).

JSON fixtures are compared STRUCTURALLY (json.loads equality with nulls
normalized away) rather than byte-for-byte: gson omits null fields and
has its own key ordering, both of which are formatting, not wire
content.
"""

import json
import math

import pytest

from deequ_spark.metrics import (Distribution, DistributionValue,
                                 DoubleMetric, Entity, HistogramMetric,
                                 KeyedDoubleMetric)
from deequ_spark.repository import (ResultKey, deserialize_reference_metric,
                                    from_deequ_json,
                                    serialize_reference_analyzer,
                                    serialize_reference_metric, to_deequ_json)
from deequ_spark.runners.analysis_runner import AnalyzerContext


def _norm(obj):
    """Drop null-valued keys recursively (gson omits them on the wire)."""
    if isinstance(obj, dict):
        return {k: _norm(v) for k, v in obj.items() if v is not None}
    if isinstance(obj, list):
        return [_norm(v) for v in obj]
    return obj


def roundtrip(entries):
    """serialize → deserialize → assert analyzers and metric values
    survive (AnalysisResultSerdeTest.scala:680-695
    assertCorrectlyConvertsAnalysisResults)."""
    back = from_deequ_json(to_deequ_json(entries))
    assert len(back) == len(entries)
    for (key, ctx), (key2, ctx2) in zip(entries, back):
        assert key2 == key
        assert len(ctx2.metric_map) == len(ctx.metric_map), (
            set(map(repr, ctx.metric_map)) - set(map(repr, ctx2.metric_map)))
        for a, m in ctx.metric_map.items():
            assert a in ctx2.metric_map, repr(a)
            m2 = ctx2.metric_map[a]
            if isinstance(m.value, (int, float)):
                assert m2.value == m.value
    return back


def ctx_of(*pairs):
    ctx = AnalyzerContext()
    for a, m in pairs:
        ctx.metric_map[a] = m
    return ctx


def dm(name, instance, value, entity=Entity.COLUMN):
    return DoubleMetric(entity, name, instance, value)


# epoch of LocalDate.of(2017,10,14).atTime(10,10,10) UTC (:135-136)
DATE_TIME = 1507975810


class TestAnalysisResultSerde:
    def test_all_successful_values_roundtrip(self):
        """:35-140 'analysis results serialization with successful Values'
        — one context holding (nearly) every analyzer variant, two result
        keys, survives serialize→deserialize."""
        from deequ_spark import (ApproxCountDistinct, ColumnRange,
                                 Completeness, Compliance, Correlation,
                                 CountDistinct, DataType, Distinctness,
                                 DuplicateRowCount, Entropy, ExactQuantile,
                                 Histogram, InterquartileRange, Kurtosis,
                                 Maximum, MaxLength, Mean, Minimum,
                                 MinLength, MutualInformation, RatioOfSums,
                                 Size, Skewness, StandardDeviation, Sum,
                                 Uniqueness, UniqueValueRatio, Variance,
                                 ZerosCount)
        from deequ_spark.analyzers.scan import AnalyzerOptions, NullBehavior
        opts = AnalyzerOptions(null_behavior=NullBehavior.IGNORE)
        ctx = ctx_of(
            (Size(), dm("Size", "*", 5.0, Entity.DATASET)),
            (ZerosCount("ColumnA"), dm("ZerosCount", "ColumnA", 0.0)),
            (DuplicateRowCount(("ColumnA", "ColumnB")),
             dm("DuplicateRowCount", "ColumnA,ColumnB", 5.0,
                Entity.MULTICOLUMN)),
            (Completeness("ColumnA", analyzer_options=opts),
             dm("Completeness", "ColumnA", 5.0)),
            (Compliance("rule1", "att1 > 3", columns=("att1",),
                        analyzer_options=opts),
             dm("Compliance", "rule1", 5.0)),
            (ApproxCountDistinct("columnA", "test"),
             dm("ApproxCountDistinct", "columnA", 5.0)),
            (CountDistinct(("columnA", "columnB")),
             dm("CountDistinct", "columnA,columnB", 5.0)),
            (Distinctness(("columnA", "columnB")),
             dm("Distinctness", "columnA,columnB", 5.0)),
            (Correlation("firstColumn", "secondColumn", "test"),
             dm("Correlation", "firstColumn,secondColumn", 5.0)),
            (UniqueValueRatio(("columnA", "columnB")),
             dm("UniqueValueRatio", "columnA,columnB", 5.0)),
            (Uniqueness(("ColumnA",)), dm("Uniqueness", "ColumnA", 5.0)),
            (Uniqueness(("ColumnA", "ColumnB")),
             dm("Uniqueness", "ColumnA,ColumnB", 5.0)),
            (Histogram("ColumnA"),
             HistogramMetric(Entity.COLUMN, "Histogram", "ColumnA",
                             Distribution({"some": DistributionValue(
                                 10, 0.5)}, 10))),
            (Histogram("ColumnA", max_detail_bins=5),
             HistogramMetric(Entity.COLUMN, "Histogram", "ColumnA",
                             Distribution({"some": DistributionValue(
                                 10, 0.5)}, 10))),
            (Histogram("ColumnA", where="id > 5"),
             HistogramMetric(Entity.COLUMN, "Histogram", "ColumnA",
                             Distribution({"filtered": DistributionValue(
                                 3, 0.6)}, 5))),
            (Entropy("ColumnA"), dm("Entropy", "ColumnA", 5.0)),
            (MutualInformation(("ColumnA", "ColumnB")),
             dm("MutualInformation", "ColumnA,ColumnB", 5.0,
                Entity.MULTICOLUMN)),
            (Minimum("ColumnA"), dm("Minimum", "ColumnA", 5.0)),
            (Maximum("ColumnA"), dm("Maximum", "ColumnA", 5.0)),
            (ColumnRange("ColumnA"), dm("Range", "ColumnA", 5.0)),
            (InterquartileRange("ColumnA"),
             dm("InterquartileRange", "ColumnA", 2.5)),
            (Mean("ColumnA"), dm("Mean", "ColumnA", 5.0)),
            (Sum("ColumnA"), dm("Sum", "ColumnA", 5.0)),
            (RatioOfSums("ColumnA", "ColumnB"),
             dm("RatioOfSums", "ColumnA,ColumnB", 5.0)),
            (StandardDeviation("ColumnA"),
             dm("StandardDeviation", "ColumnA", 5.0)),
            (Variance("ColumnA"), dm("Variance", "ColumnA", 5.0)),
            (Skewness("ColumnA"), dm("Skewness", "ColumnA", 0.0)),
            (Kurtosis("ColumnA"), dm("Kurtosis", "ColumnA", 0.0)),
            (DataType("ColumnA"), dm("DataType", "ColumnA", 5.0)),
            (MinLength("ColumnA"), dm("MinLength", "ColumnA", 5.0)),
            (MaxLength("ColumnA"), dm("MaxLength", "ColumnA", 5.0)),
            (ExactQuantile("ColumnA", 0.5),
             dm("ExactQuantile", "ColumnA", 5.0)),
        )
        roundtrip([(ResultKey(DATE_TIME, (("Region", "EU"),)), ctx),
                   (ResultKey(DATE_TIME, (("Region", "NA"),)), ctx)])

    def test_pattern_match_regex_roundtrip(self):
        """:143-168 'also work for regex with broken ==' — the analyzer
        survives by column/pattern-string/where, and the metric exactly."""
        from deequ_spark import PatternMatch
        from deequ_spark.analyzers.scan import Patterns
        analyzer = PatternMatch("patternRule1", Patterns.EMAIL)
        metric = dm("PatternMatch", "ColumnA", 5.0)
        (key2, ctx2), = roundtrip([(ResultKey(DATE_TIME, (("Region", "EU"),)),
                                    ctx_of((analyzer, metric)))])
        (cloned_analyzer, cloned_metric), = ctx2.metric_map.items()
        assert cloned_analyzer.column == analyzer.column
        assert cloned_analyzer.pattern == analyzer.pattern
        assert cloned_analyzer.where == analyzer.where
        assert cloned_metric == metric

    def test_mixed_values_fail(self):
        """:170-195 'with mixed Values should fail' — serializing a
        context holding a FAILED metric raises."""
        from deequ_spark import Completeness, Size
        ctx = ctx_of(
            (Size(), dm("Size", "*", 5.0, Entity.DATASET)),
            (Completeness("ColumnA"),
             DoubleMetric(Entity.COLUMN, "Completeness", "ColumnA", None,
                          ValueError("Some"))))
        with pytest.raises(ValueError, match="failed metrics"):
            to_deequ_json([(ResultKey(DATE_TIME, (("Region", "EU"),)), ctx)])

    def test_approx_quantile_roundtrip(self):
        """:197-205."""
        from deequ_spark import ApproxQuantile
        analyzer = ApproxQuantile("col", 0.5, relative_error=0.2)
        roundtrip([(ResultKey(0, ()),
                    ctx_of((analyzer, dm("ApproxQuantile", "col", 0.5))))])

    def test_approx_quantiles_keyed_roundtrip(self):
        """:200-213 — KeyedDoubleMetric payload restores as a map."""
        from deequ_spark import ApproxQuantiles
        quartiles = {"0.25": 10.0, "0.5": 20.0, "0.75": 30.0}
        analyzer = ApproxQuantiles("col", (0.25, 0.5, 0.75),
                                   relative_error=0.2)
        metric = KeyedDoubleMetric(Entity.COLUMN, "ApproxQuantiles", "col",
                                   quartiles)
        (_, ctx2), = roundtrip([(ResultKey(0, ()), ctx_of((analyzer,
                                                           metric)))])
        assert ctx2.metric_map[analyzer].value == quartiles

    def test_exact_quantile_roundtrip(self):
        """:215-223."""
        from deequ_spark import ExactQuantile
        analyzer = ExactQuantile("col", 0.5)
        roundtrip([(ResultKey(0, ()),
                    ctx_of((analyzer, dm("ExactQuantile", "col", 0.5))))])

    @staticmethod
    def _kll_metric(buckets, params, data):
        from deequ_spark.analyzers.kll import (BucketDistribution,
                                               BucketValue, KLLMetric,
                                               KLLParameters, KLLSketchCore)
        p = KLLParameters(int(params[0]), params[1], len(buckets))
        sketch = KLLSketchCore.reconstruct(p.sketch_size, p.shrinking_factor,
                                           data)
        return KLLMetric(Entity.COLUMN, "KLL", "col", BucketDistribution(
            [BucketValue(*b) for b in buckets], p, sketch))

    def _assert_kll_roundtrip(self, analyzer, metric):
        (_, ctx2), = from_deequ_json(to_deequ_json(
            [(ResultKey(0, ()), ctx_of((analyzer, metric)))]))
        assert analyzer in ctx2.metric_map
        bd, bd2 = metric.value, ctx2.metric_map[analyzer].value
        assert bd2.buckets == bd.buckets
        assert bd2.parameters.sketch_size == bd.parameters.sketch_size
        assert bd2.parameters.shrinking_factor == pytest.approx(
            bd.parameters.shrinking_factor)
        assert [list(l) for l in bd2.sketch.compactors] == \
            [list(l) for l in bd.sketch.compactors]

    def test_kll_sketch_roundtrip(self):
        """:225-240 — buckets + parameters [sketchSize, shrinkingFactor]
        + per-level compactor data all survive."""
        from deequ_spark import KLLParameters, KLLSketch
        analyzer = KLLSketch("col", KLLParameters(200, 2.0 / 3.0, 10))
        metric = self._kll_metric([(0.0, 10.0, 5), (10.0, 20.0, 3)],
                                  [200.0, 2.0 / 3.0],
                                  [[1.0, 2.0], [3.0, 4.0]])
        self._assert_kll_roundtrip(analyzer, metric)

    def test_kll_sketch_without_parameters_roundtrip(self):
        """:242-256 — KLLSketch('col') with default parameters."""
        from deequ_spark import KLLSketch
        analyzer = KLLSketch("col")
        metric = self._kll_metric([(0.0, 100.0, 10)], [1000.0, 0.5],
                                  [[5.0, 15.0]])
        self._assert_kll_roundtrip(analyzer, metric)

    # --- byte-level fixtures (:258-448), compared structurally ----------

    HISTOGRAM_COUNT_JSON = """[{
      "resultKey": {"dataSetDate": 0, "tags": {}},
      "analyzerContext": {"metricMap": [
        {"analyzer": {"analyzerName": "Histogram", "column": "columnA",
                      "maxDetailBins": 1000},
         "metric": {"metricName": "HistogramMetric", "column": "columnA",
                    "numberOfBins": 10,
                    "value": {"numberOfBins": 10, "values": {
                        "some": {"absolute": 10, "ratio": 0.5}}}}}]}}]"""

    HISTOGRAM_SUM_JSON = """[{
      "resultKey": {"dataSetDate": 0, "tags": {}},
      "analyzerContext": {"metricMap": [
        {"analyzer": {"analyzerName": "Histogram", "column": "columnA",
                      "maxDetailBins": 1000, "aggregateFunction": "sum",
                      "aggregateColumn": "columnB"},
         "metric": {"metricName": "HistogramMetric", "column": "columnA",
                    "numberOfBins": 10,
                    "value": {"numberOfBins": 10, "values": {
                        "some": {"absolute": 10, "ratio": 0.5}}}}}]}}]"""

    @staticmethod
    def _hist_ctx(sum_column=None):
        from deequ_spark import Histogram
        analyzer = (Histogram("columnA", sum_column=sum_column)
                    if sum_column else Histogram("columnA"))
        metric = HistogramMetric(
            Entity.COLUMN, "Histogram", "columnA",
            Distribution({"some": DistributionValue(10, 0.5)}, 10))
        return analyzer, ctx_of((analyzer, metric))

    def test_histogram_count_serialization_backward_compatible(self):
        """:421-428 — count histogram serializes to the fixture shape
        (no aggregateFunction/aggregateColumn fields)."""
        _, ctx = self._hist_ctx()
        got = _norm(json.loads(to_deequ_json([(ResultKey(0, ()), ctx)])))
        assert got == _norm(json.loads(self.HISTOGRAM_COUNT_JSON))

    def test_histogram_sum_serialization(self):
        """:430-434 — sum histogram carries aggregateFunction=sum +
        aggregateColumn."""
        _, ctx = self._hist_ctx(sum_column="columnB")
        got = _norm(json.loads(to_deequ_json([(ResultKey(0, ()), ctx)])))
        assert got == _norm(json.loads(self.HISTOGRAM_SUM_JSON))

    def test_histogram_count_deserialization(self):
        """:436-442."""
        from deequ_spark import Histogram
        (key, ctx), = from_deequ_json(self.HISTOGRAM_COUNT_JSON)
        assert key == ResultKey(0, ())
        m = ctx.metric_map[Histogram("columnA")]
        assert m.value["some"] == DistributionValue(10, 0.5)
        assert m.value.number_of_bins == 10

    def test_histogram_sum_deserialization(self):
        """:444-450 — the deserialized analyzer keys on the SUM variant."""
        from deequ_spark import Histogram
        (_, ctx), = from_deequ_json(self.HISTOGRAM_SUM_JSON)
        assert Histogram("columnA", sum_column="columnB") in ctx.metric_map
        assert Histogram("columnA") not in ctx.metric_map

    HISTOGRAM_BINNED_JSON = """[{
      "resultKey": {"dataSetDate": 0, "tags": {}},
      "analyzerContext": {"metricMap": [
        {"analyzer": {"analyzerName": "HistogramBinned",
                      "column": "columnA", "binCount": 5},
         "metric": {"metricName": "HistogramBinnedMetric",
                    "column": "columnA", "numberOfBins": 2,
                    "value": {"numberOfBins": 2, "bins": [
                        {"binStart": 0.0, "binEnd": 10.0,
                         "frequency": 5, "ratio": 0.5},
                        {"binStart": 10.0, "binEnd": 20.0,
                         "frequency": 5, "ratio": 0.5}]}}}]}}]"""

    HISTOGRAM_BINNED_NULLS_JSON = """[{
      "resultKey": {"dataSetDate": 0, "tags": {}},
      "analyzerContext": {"metricMap": [
        {"analyzer": {"analyzerName": "HistogramBinned",
                      "column": "columnA", "binCount": 3},
         "metric": {"metricName": "HistogramBinnedMetric",
                    "column": "columnA", "numberOfBins": 2,
                    "value": {"numberOfBins": 2, "bins": [
                        {"binStart": 0.0, "binEnd": 15.0,
                         "frequency": 4, "ratio": 0.4},
                        {"binStart": 15.0, "binEnd": 30.0,
                         "frequency": 4, "ratio": 0.4}],
                      "nullCount": 2}}}]}}]"""

    @staticmethod
    def _binned_ctx(bin_count, bins, null_count=0):
        from deequ_spark import HistogramBinned
        analyzer = HistogramBinned("columnA", bin_count=bin_count)
        values = {}
        for i, (lo, hi, freq, ratio) in enumerate(bins):
            label = f"[{lo:.6g}, {hi:.6g}" + ("]" if i == len(bins) - 1
                                              else ")")
            values[label] = DistributionValue(freq, ratio)
        metric = HistogramMetric(
            Entity.COLUMN, "Histogram", "columnA",
            Distribution(values, len(bins), null_count=null_count))
        return analyzer, ctx_of((analyzer, metric))

    def test_histogram_binned_serialization(self):
        """:451-459 — binned distribution serializes to the bins-array
        wire shape."""
        _, ctx = self._binned_ctx(5, [(0.0, 10.0, 5, 0.5),
                                      (10.0, 20.0, 5, 0.5)])
        got = _norm(json.loads(to_deequ_json([(ResultKey(0, ()), ctx)])))
        assert got == _norm(json.loads(self.HISTOGRAM_BINNED_JSON))

    def test_histogram_binned_deserialization(self):
        """:461-469."""
        from deequ_spark import HistogramBinned
        (_, ctx), = from_deequ_json(self.HISTOGRAM_BINNED_JSON)
        m = ctx.metric_map[HistogramBinned("columnA", bin_count=5)]
        assert m.value.number_of_bins == 2
        assert m.value["[0, 10)"].absolute == 5
        assert m.value["[10, 20]"].absolute == 5

    def test_histogram_binned_null_count_roundtrips(self):
        """:471-495 — nullCount serializes and deserializes."""
        _, ctx = self._binned_ctx(3, [(0.0, 15.0, 4, 0.4),
                                      (15.0, 30.0, 4, 0.4)], null_count=2)
        text = to_deequ_json([(ResultKey(0, ()), ctx)])
        assert _norm(json.loads(text)) == _norm(
            json.loads(self.HISTOGRAM_BINNED_NULLS_JSON))
        (_, ctx2), = from_deequ_json(text)
        (m2,) = ctx2.metric_map.values()
        assert m2.value.null_count == 2

    def test_histogram_binned_custom_edges_roundtrip(self):
        """:497-578 — customEdges ride the analyzer; bins the metric."""
        from deequ_spark import HistogramBinned
        analyzer = HistogramBinned(
            "income", custom_edges=(0.0, 40000.0, 100000.0, 200000.0))
        values = {"[0, 40000)": DistributionValue(2, 0.4),
                  "[40000, 100000)": DistributionValue(2, 0.4),
                  "[100000, 200000]": DistributionValue(1, 0.2)}
        metric = HistogramMetric(Entity.COLUMN, "Histogram", "income",
                                 Distribution(values, 3))
        text = to_deequ_json([(ResultKey(0, ()),
                               ctx_of((analyzer, metric)))])
        obj = json.loads(text)[0]["analyzerContext"]["metricMap"][0]
        assert obj["analyzer"]["customEdges"] == [0.0, 40000.0, 100000.0,
                                                  200000.0]
        assert [b["binStart"] for b in obj["metric"]["value"]["bins"]] == \
            [0.0, 40000.0, 100000.0]
        (_, ctx2), = from_deequ_json(text)
        assert analyzer in ctx2.metric_map
        assert ctx2.metric_map[analyzer].value["[40000, 100000)"] == \
            DistributionValue(2, 0.4)

    def test_histogram_binned_overflow_infinity_roundtrip(self):
        """:580-597 'HistogramBinned with overflow' — ±Infinity edges
        survive the round trip (gson lenient ↔ python json allow_nan)."""
        from deequ_spark import HistogramBinned
        analyzer = HistogramBinned("values", custom_edges=(0.0, 10.0, 20.0),
                                   include_overflow_bins=True)
        inf = math.inf
        values = {"[-inf, 0)": DistributionValue(1, 0.25),
                  "[0, 10)": DistributionValue(1, 0.25),
                  "[10, 20)": DistributionValue(1, 0.25),
                  "[20, inf]": DistributionValue(1, 0.25)}
        metric = HistogramMetric(Entity.COLUMN, "Histogram", "values",
                                 Distribution(values, 4))
        text = to_deequ_json([(ResultKey(0, ()), ctx_of((analyzer,
                                                         metric)))])
        bins = json.loads(text)[0]["analyzerContext"]["metricMap"][0][
            "metric"]["value"]["bins"]
        assert bins[0]["binStart"] == -inf and bins[3]["binEnd"] == inf
        (_, ctx2), = from_deequ_json(text)
        assert analyzer in ctx2.metric_map
        m2 = ctx2.metric_map[analyzer]
        assert sum(v.absolute for v in m2.value.values.values()) == 4

    def test_distribution_tail_count_roundtrip(self):
        """:599-614 'Distribution with tailCount' — tailCount appears in
        the JSON and survives."""
        from deequ_spark import Histogram
        analyzer = Histogram("category", max_detail_bins=3)
        metric = HistogramMetric(
            Entity.COLUMN, "Histogram", "category",
            Distribution({"A": DistributionValue(5, 0.5),
                          "B": DistributionValue(3, 0.3)}, 5, tail_count=2))
        text = to_deequ_json([(ResultKey(0, ()), ctx_of((analyzer,
                                                         metric)))])
        assert "tailCount" in text
        (_, ctx2), = from_deequ_json(text)
        m2 = ctx2.metric_map[analyzer]
        assert m2.value.tail_count == 2 and m2.value.number_of_bins == 5

    def test_distribution_without_tail_has_no_tail_count(self):
        """:616-629 — no tail → tailCount absent from the wire."""
        from deequ_spark import Histogram
        analyzer = Histogram("category")
        metric = HistogramMetric(
            Entity.COLUMN, "Histogram", "category",
            Distribution({"A": DistributionValue(5, 0.5),
                          "B": DistributionValue(5, 0.5)}, 2))
        text = to_deequ_json([(ResultKey(0, ()), ctx_of((analyzer,
                                                         metric)))])
        assert "tailCount" not in text
        (_, ctx2), = from_deequ_json(text)
        assert ctx2.metric_map[analyzer].value.tail_count == 0


class TestSimpleResultSerde:
    def test_success_metrics_with_tags(self, spark):
        """AnalysisResultSerdeTest.scala:632-703 SimpleResultSerdeTest —
        the simplified success-metric rows over getDfFull, EXACT expected
        values including MutualInformation 0.5623351446188083."""
        from deequ_spark import (Completeness, Distinctness,
                                 InMemoryMetricsRepository, MaxLength,
                                 MinLength, MutualInformation, ResultKey,
                                 Size, Uniqueness, do_analysis_run)
        df = spark.createDataFrame(
            [("1", "a", "c"), ("2", "a", "c"), ("3", "a", "c"),
             ("4", "b", "d")], "item string, att1 string, att2 string")
        ctx = do_analysis_run(df, [
            Size(), Distinctness(("item",)), Completeness("att1"),
            Uniqueness(("att1",)), Distinctness(("att1",)),
            Completeness("att2"), Uniqueness(("att2",)),
            MutualInformation(("att1", "att2")), MinLength("att1"),
            MaxLength("att1")])
        repo = InMemoryMetricsRepository()
        repo.save(ResultKey(1507975810, {"region": "EU"}), ctx)
        rows = json.loads(repo.load().get_success_metrics_as_json())
        got = {(r["entity"], r["instance"], r["name"]):
               (r["value"], r["region"], r["dataset_date"]) for r in rows}
        expected = {
            ("Column", "item", "Distinctness"): 1.0,
            ("Column", "att1", "Completeness"): 1.0,
            ("Column", "att2", "Completeness"): 1.0,
            ("Multicolumn", "att1,att2", "MutualInformation"):
                pytest.approx(0.5623351446188083),
            ("Dataset", "*", "Size"): 4.0,
            ("Column", "att1", "Uniqueness"): 0.25,
            ("Column", "att1", "Distinctness"): 0.5,
            ("Column", "att1", "MinLength"): 1.0,
            ("Column", "att1", "MaxLength"): 1.0,
            ("Column", "att2", "Uniqueness"): 0.25,
        }
        for k, v in expected.items():
            assert k in got, k
            value, region, date = got[k]
            assert value == v, k
            assert (region, date) == ("EU", 1507975810)


class TestAnalysisResultParity:
    """Transcribed from repository/AnalysisResultTest.scala (line refs
    per test): the simplified success-metric surface of ONE analysis
    result — exact rows, tag-name sanitization, duplicate-column
    suffixing, withTags / forAnalyzers restriction, empty context."""

    DATE_ONE = 1507975810

    EXPECTED = {
        ("Dataset", "*", "Size"): 4.0,
        ("Column", "item", "Distinctness"): 1.0,
        ("Column", "att1", "Completeness"): 1.0,
        ("Multicolumn", "att1,att2", "Uniqueness"): 0.25,
    }

    @pytest.fixture(scope="class")
    def results(self, spark):
        from deequ_spark import (Completeness, Distinctness, Size,
                                 Uniqueness, do_analysis_run)
        df = spark.createDataFrame(
            [("1", "a", "c"), ("2", "a", "c"), ("3", "a", "c"),
             ("4", "b", "d")], "item string, att1 string, att2 string")
        return do_analysis_run(df, [Size(), Distinctness(("item",)),
                                    Completeness("att1"),
                                    Uniqueness(("att1", "att2"))])

    def _loader(self, tags, results):
        from deequ_spark import InMemoryMetricsRepository
        repo = InMemoryMetricsRepository()
        repo.save(ResultKey(self.DATE_ONE, tags), results)
        return repo.load()

    def test_dataframe_formatted_as_expected(self, spark, results):
        """:43-63."""
        df = self._loader({"Region": "EU"}, results) \
            .get_success_metrics_as_dataframe(spark)
        assert set(df.columns) == {"entity", "instance", "name", "value",
                                   "dataset_date", "region"}
        got = {(r["entity"], r["instance"], r["name"]):
               (r["value"], r["dataset_date"], r["region"])
               for r in df.collect()}
        assert got == {k: (v, self.DATE_ONE, "EU")
                       for k, v in self.EXPECTED.items()}

    def test_json_formatted_as_expected(self, results):
        """:65-88."""
        rows = json.loads(self._loader({"Region": "EU"}, results)
                          .get_success_metrics_as_json())
        got = {(r["entity"], r["instance"], r["name"]):
               (r["value"], r["dataset_date"], r["region"]) for r in rows}
        assert got == {k: (v, self.DATE_ONE, "EU")
                       for k, v in self.EXPECTED.items()}

    def test_invalid_tag_name_sanitized(self, spark, results):
        """:138-183 — tag 'Re%%^gion!/' becomes column 'region'."""
        df = self._loader({"Re%%^gion!/": "EU"}, results) \
            .get_success_metrics_as_dataframe(spark)
        assert "region" in df.columns
        assert {r["region"] for r in df.collect()} == {"EU"}
        rows = json.loads(self._loader({"Re%%^gion!/": "EU"}, results)
                          .get_success_metrics_as_json())
        assert all(r["region"] == "EU" for r in rows)

    def test_duplicate_column_name_suffixed(self, spark, results):
        """:185-232 — tag 'name' collides with the metric column →
        'name_2'."""
        df = self._loader({"name": "EU"}, results) \
            .get_success_metrics_as_dataframe(spark)
        assert "name_2" in df.columns and "name" in df.columns
        by_name = {r["name"]: r["name_2"] for r in df.collect()}
        assert by_name == {"Size": "EU", "Distinctness": "EU",
                           "Completeness": "EU", "Uniqueness": "EU"}

    def test_with_tags_restriction(self, spark, results):
        """:234-281 — only the requested tag becomes a column."""
        loader = self._loader({"Region": "EU", "Env": "test"}, results)
        df = loader.get_success_metrics_as_dataframe(
            spark, with_tags=["Region"])
        assert "region" in df.columns and "env" not in df.columns
        rows = json.loads(loader.get_success_metrics_as_json(
            with_tags=["Region"]))
        assert all("env" not in r and r["region"] == "EU" for r in rows)

    def test_for_analyzers_restriction(self, spark, results):
        """:90-136 'only include requested metrics'."""
        from deequ_spark import Completeness, Size
        loader = self._loader({"Region": "EU"}, results) \
            .for_analyzers([Size(), Completeness("att1")])
        df = loader.get_success_metrics_as_dataframe(spark)
        assert {(r["entity"], r["name"]) for r in df.collect()} == \
            {("Dataset", "Size"), ("Column", "Completeness")}

    def test_empty_context_empty_dataframe(self, spark):
        """:283-300."""
        from deequ_spark import InMemoryMetricsRepository
        from deequ_spark.runners.analysis_runner import AnalyzerContext
        repo = InMemoryMetricsRepository()
        repo.save(ResultKey(self.DATE_ONE, {"Region": "EU"}),
                  AnalyzerContext())
        df = repo.load().get_success_metrics_as_dataframe(spark)
        assert df.count() == 0
