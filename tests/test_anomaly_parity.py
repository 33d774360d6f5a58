"""Anomaly-strategy parity fixtures transcribed from the reference's own
test suite (/root/reference/src/test/scala/com/amazon/deequ/
anomalydetection/{RelativeRateOfChange,AbsoluteChange,SimpleThreshold,
BatchNormal,OnlineNormal}StrategyTest.scala). The Gaussian fixtures use
``new Random(1).nextGaussian()`` — replicated below with a bit-exact
java.util.Random port (48-bit LCG + Marsaglia polar method), so the
expected anomaly INDEX SETS are the reference's own."""

import math

import numpy as np
import pytest

from deequ_spark.anomaly import (AbsoluteChangeStrategy, BatchNormalStrategy,
                                 OnlineNormalStrategy,
                                 RelativeRateOfChangeStrategy,
                                 SimpleThresholdStrategy)


class JavaRandom:
    """java.util.Random: 48-bit LCG; nextGaussian is the polar method
    (two uniforms per round, second value cached)."""
    MULT = 0x5DEECE66D
    ADD = 0xB
    MASK = (1 << 48) - 1

    def __init__(self, seed):
        self.seed = (seed ^ self.MULT) & self.MASK
        self._next_g = None

    def _next(self, bits):
        self.seed = (self.seed * self.MULT + self.ADD) & self.MASK
        return self.seed >> (48 - bits)

    def next_double(self):
        hi = self._next(26)
        lo = self._next(27)
        return ((hi << 27) + lo) / float(1 << 53)

    def next_gaussian(self):
        if self._next_g is not None:
            g, self._next_g = self._next_g, None
            return g
        while True:
            v1 = 2 * self.next_double() - 1
            v2 = 2 * self.next_double() - 1
            s = v1 * v1 + v2 * v2
            if 0 < s < 1:
                break
        mult = math.sqrt(-2 * math.log(s) / s)
        self._next_g = v2 * mult
        return v1 * mult


def _indices(anomalies):
    return [a.index for a in anomalies]


class TestRelativeRateOfChangeParity:
    """RelativeRateOfChangeStrategyTest.scala:25-125."""

    @pytest.fixture(scope="class")
    def data(self):
        return [1.0 if i < 20 or i > 30 else (float(i) if i % 2 == 0 else 1.0)
                for i in range(51)]

    def test_all_anomalies(self, data):
        s = RelativeRateOfChangeStrategy(0.5, 2.0)
        assert _indices(s.detect(data)) == list(range(20, 32))

    def test_interval(self, data):
        s = RelativeRateOfChangeStrategy(0.5, 2.0)
        assert _indices(s.detect(data, (25, 50))) == list(range(25, 32))

    def test_no_min_rate(self, data):
        s = RelativeRateOfChangeStrategy(-math.inf, 1.0)
        assert _indices(s.detect(data)) == list(range(20, 31, 2))

    def test_no_max_rate(self, data):
        s = RelativeRateOfChangeStrategy(0.5, math.inf)
        assert _indices(s.detect(data)) == list(range(21, 32, 2))

    def test_extreme_rates_no_anomalies(self, data):
        s = RelativeRateOfChangeStrategy(-1.7976931348623157e308,
                                         1.7976931348623157e308)
        assert s.detect(data) == []

    def test_first_order_diff(self):
        s = RelativeRateOfChangeStrategy(0.5, 2.0)
        got = list(s._transform(np.asarray([1.0, 2.0, 4.0, 1.0, 2.0, 8.0])))
        assert got == [2.0, 2.0, 0.25, 2.0, 4.0]

    def test_second_order_diff_is_direct_ratio(self):
        """diff(v, 2) = v[i]/v[i-2], NOT ratio-of-ratios (scala :86-92)."""
        s = RelativeRateOfChangeStrategy(0.5, 2.0, order=2)
        got = list(s._transform(np.asarray([1.0, 2.0, 4.0, 1.0, 2.0, 8.0])))
        assert got == [4.0, 0.5, 0.5, 8.0]

    def test_third_order_diff(self):
        s = RelativeRateOfChangeStrategy(0.5, 2.0, order=3)
        got = list(s._transform(np.asarray([1.0, 5.0, -10.0, 3.0, 100.0, 0.01, 0.006])))
        assert got == pytest.approx([3.0, 20.0, -0.001, 0.002])

    def test_higher_order_index_attribution(self):
        data = [0.0, 1.0, 3.0, 6.0, 18.0, 72.0]
        s = RelativeRateOfChangeStrategy(-math.inf, 8.0, order=2)
        assert _indices(s.detect(data)) == [2, 5]
        assert _indices(s.detect(data, (5, 6))) == [5]


class TestAbsoluteChangeParity:
    """AbsoluteChangeStrategyTest.scala:25-130."""

    @pytest.fixture(scope="class")
    def data(self):
        return [1.0 if i < 20 or i > 30
                else (float(i) if i % 2 == 0 else -float(i))
                for i in range(51)]

    def test_all_anomalies(self, data):
        s = AbsoluteChangeStrategy(-2.0, 2.0)
        assert _indices(s.detect(data)) == list(range(20, 32))

    def test_interval(self, data):
        s = AbsoluteChangeStrategy(-2.0, 2.0)
        assert _indices(s.detect(data, (25, 50))) == list(range(25, 32))

    def test_no_min_rate(self, data):
        s = AbsoluteChangeStrategy(-math.inf, 1.0)
        assert _indices(s.detect(data)) == list(range(20, 31, 2))

    def test_no_max_rate(self, data):
        s = AbsoluteChangeStrategy(-1.0, math.inf)
        assert _indices(s.detect(data)) == list(range(21, 32, 2))

    def test_second_order_diff_is_iterated(self):
        """Absolute diff DOES iterate (scala :92-98) — asymmetric with the
        relative strategy's direct ratio."""
        s = AbsoluteChangeStrategy(-2.0, 2.0, order=2)
        got = list(s._transform(np.asarray([1.0, 2.0, 4.0, 1.0, 2.0, 8.0])))
        assert got == [1.0, -5.0, 4.0, 5.0]

    def test_third_order_diff(self):
        s = AbsoluteChangeStrategy(-2.0, 2.0, order=3)
        got = list(s._transform(np.asarray([1.0, 5.0, -10.0, 3.0, 100.0, 0.01, 0.0065])))
        assert got == pytest.approx([47.0, 56.0, -280.99, 296.9765])

    def test_higher_order_index_attribution(self):
        data = [0.0, 1.0, 3.0, 6.0, 18.0, 72.0]
        s = AbsoluteChangeStrategy(-math.inf, 8.0, order=2)
        assert _indices(s.detect(data)) == [4, 5]


class TestSimpleThresholdParity:
    """SimpleThresholdStrategyTest.scala:22-60."""

    DATA = [-1.0, 2.0, 3.0, 0.5]

    def test_above_threshold(self):
        s = SimpleThresholdStrategy(upper_bound=1.0)
        assert _indices(s.detect(self.DATA, (0, 4))) == [1, 2]
        assert _indices(s.detect(self.DATA)) == [1, 2]

    def test_empty_input(self):
        assert SimpleThresholdStrategy(upper_bound=1.0).detect([]) == []

    def test_upper_and_lower(self):
        s = SimpleThresholdStrategy(lower_bound=-0.5, upper_bound=1.0)
        assert _indices(s.detect(self.DATA)) == [0, 1, 2]

    def test_unordered_thresholds_raise(self):
        with pytest.raises(ValueError):
            SimpleThresholdStrategy(lower_bound=2.0, upper_bound=1.0)


def _gaussian_fixture(n, bump_range):
    r = JavaRandom(1)
    dist = [r.next_gaussian() for _ in range(n)]
    for i in bump_range:
        dist[i] += i + (i % 2 * -2 * i)
    return dist


class TestBatchNormalParity:
    """BatchNormalStrategyTest.scala:25-80 — new Random(1) Gaussian base
    with a ±i bump on indices 20..30."""

    @pytest.fixture(scope="class")
    def data(self):
        return _gaussian_fixture(50, range(20, 31))

    def test_interval(self, data):
        s = BatchNormalStrategy(1.0, 1.0)
        assert _indices(s.detect(data, (25, 50))) == list(range(25, 31))

    def test_no_lower_factor(self, data):
        s = BatchNormalStrategy(None, 1.0)
        assert _indices(s.detect(data, (20, 31))) == list(range(20, 31, 2))

    def test_no_upper_factor(self, data):
        s = BatchNormalStrategy(1.0, None)
        assert _indices(s.detect(data, (10, 30))) == list(range(21, 30, 2))

    def test_interval_excluded_from_stats(self):
        data = [1.0, 1.0, 1.0, 1000.0, 500.0, 1.0]
        s = BatchNormalStrategy(3.0, 3.0)
        assert _indices(s.detect(data, (3, 5))) == [3, 4]


class TestOnlineNormalParity:
    """OnlineNormalStrategyTest.scala:25-100 — new Random(1) Gaussian base
    (51 values) with a ±i bump on indices 20..30."""

    @pytest.fixture(scope="class")
    def data(self):
        return _gaussian_fixture(51, range(20, 31))

    def test_all_anomalies(self, data):
        s = OnlineNormalStrategy(3.5, 3.5, ignore_start_percentage=0.2)
        assert _indices(s.detect(data)) == list(range(20, 31))

    def test_interval(self, data):
        s = OnlineNormalStrategy(1.5, 1.5, ignore_start_percentage=0.2)
        assert _indices(s.detect(data, (25, 31))) == list(range(25, 31))

    def test_no_lower_factor(self, data):
        s = OnlineNormalStrategy(None, 1.5)
        assert _indices(s.detect(data)) == list(range(20, 31, 2))

    def test_no_upper_factor(self, data):
        s = OnlineNormalStrategy(1.5, None)
        assert _indices(s.detect(data)) == list(range(21, 30, 2))

    def test_empty_input(self):
        s = OnlineNormalStrategy(1.5, 1.5, ignore_start_percentage=0.2)
        assert s.detect([]) == []

    def test_extreme_factors_no_anomalies(self, data):
        s = OnlineNormalStrategy(1.7976931348623157e308,
                                 1.7976931348623157e308)
        assert s.detect(data) == []

    def test_requires(self):
        with pytest.raises(ValueError):
            OnlineNormalStrategy(None, None)
        with pytest.raises(ValueError):
            OnlineNormalStrategy(-1.0, 1.0)
        with pytest.raises(ValueError):
            OnlineNormalStrategy(1.0, 1.0, ignore_start_percentage=1.5)


class TestHoltWintersParity:
    """seasonal/HoltWintersTest.scala:25-140 — weekly seasonality
    (period 7), deviation-based anomaly on the search interval. The
    Gaussian base series uses scala.util.Random(42), which delegates to
    java.util.Random — replicated bit-exactly by JavaRandom."""

    @pytest.fixture(scope="class")
    def two_weeks(self):
        r = JavaRandom(42)
        base = [1, 1, 1.2, 1.3, 1.5, 2.1, 1.9] * 2
        return [b + r.next_gaussian() for b in base]

    def _hw(self):
        from deequ_spark.anomaly import HoltWinters
        return HoltWinters(period=7)

    def test_start_after_end_raises(self, two_weeks):
        with pytest.raises(ValueError, match="Start must be before end"):
            self._hw().detect(two_weeks, (1, 1))

    def test_empty_series_raises(self):
        with pytest.raises(ValueError, match="empty"):
            self._hw().detect([], (0, 2 ** 31 - 1))

    def test_negative_interval_raises(self, two_weeks):
        with pytest.raises(ValueError, match="strictly positive"):
            self._hw().detect(two_weeks, (-2, -1))

    def test_too_few_data_raises(self):
        with pytest.raises(ValueError, match="two full cycles"):
            self._hw().detect([1.0, 2.0, 3.0], (0, 2 ** 31 - 1))

    def test_interval_beyond_series_empty(self, two_weeks):
        assert self._hw().detect(two_weeks, (100, 110)) == []

    def test_no_anomaly_for_normal_errors(self, two_weeks):
        series = two_weeks + [two_weeks[0]]
        assert self._hw().detect(series, (14, 15)) == []

    def test_predict_an_anomaly(self, two_weeks):
        series = two_weeks + [0.0]
        found = self._hw().detect(series, (14, 2 ** 31 - 1))
        assert _indices(found) == [14]

    def test_no_anomalies_on_longer_series(self, two_weeks):
        series = two_weeks + two_weeks
        assert self._hw().detect(series, (26, 2 ** 31 - 1)) == []

    def test_constant_series_no_anomalies(self):
        series = [1.0] * 21
        assert self._hw().detect(series, (14, 2 ** 31 - 1)) == []

    def test_constant_with_single_error(self):
        series = [1.0] * 20 + [0.0]
        found = self._hw().detect(series, (14, 2 ** 31 - 1))
        assert _indices(found) == [20]

    def test_exact_linear_trend_no_anomalies(self):
        series = [float(t) for t in range(48)]
        assert self._hw().detect(series, (36, 2 ** 31 - 1)) == []

    def test_linear_plus_seasonal_no_anomalies(self):
        series = [math.sin(2 * math.pi / 7 * t) + t for t in range(48)]
        assert self._hw().detect(series, (36, 2 ** 31 - 1)) == []

    def test_wrong_training_data(self):
        series = [0.0, 1, 1, 1, 1, 1, 1] * 2 + [1.0] * 7
        found = self._hw().detect(series, (14, 21))
        assert _indices(found) == [14]


class TestAnomalyDetectorTimeline:
    """Transcribed from /root/reference/src/test/scala/com/amazon/deequ/
    anomalydetection/AnomalyDetectorTest.scala (line refs per test) —
    the mocked strategy is replaced by SimpleThresholdStrategy instances
    whose index-space behavior is fully determined."""

    def test_ignores_missing_values(self):
        """:33-43 — None points drop out before index mapping."""
        from deequ_spark import (AnomalyDetector, DataPoint,
                                 SimpleThresholdStrategy)
        data = [DataPoint(0, 1.0), DataPoint(1, 2.0),
                DataPoint(2, None), DataPoint(3, 1.0)]
        detector = AnomalyDetector(SimpleThresholdStrategy(upper_bound=1.5))
        result = detector.detect_anomalies_in_history(data, (0, 4))
        assert [(a.index, a.value) for a in result.anomalies] == [(1, 2.0)]

    def test_only_detects_in_time_range(self):
        """:45-52 — [2, 4) time window maps to index window (2, 4)."""
        from deequ_spark import (AnomalyDetector, DataPoint,
                                 SimpleThresholdStrategy)
        data = [DataPoint(0, -1.0), DataPoint(1, 2.0),
                DataPoint(2, 3.0), DataPoint(3, 0.5)]
        detector = AnomalyDetector(
            SimpleThresholdStrategy(lower_bound=-0.5, upper_bound=1.0))
        result = detector.detect_anomalies_in_history(data, (2, 4))
        # -1.0 (t=0) and 2.0 (t=1) are outside the window; 3.0 at t=2 hits
        assert [(a.index, a.value) for a in result.anomalies] == [(2, 3.0)]

    def test_unordered_interval_raises(self):
        """:54-58."""
        from deequ_spark import (AnomalyDetector, DataPoint,
                                 SimpleThresholdStrategy)
        detector = AnomalyDetector(SimpleThresholdStrategy(upper_bound=1.0))
        with pytest.raises(ValueError):
            detector.detect_anomalies_in_history(
                [DataPoint(0, 1.0)], (4, 2))

    def test_time_gaps_map_to_indices(self):
        """:60-74 — times 200..2000 step 200; window [200, 401) covers
        exactly the first two points, anomalies keyed by original time."""
        from deequ_spark import (AnomalyDetector, DataPoint,
                                 SimpleThresholdStrategy)
        data = [DataPoint(i * 200, 5.0) for i in range(1, 11)]
        detector = AnomalyDetector(SimpleThresholdStrategy(upper_bound=1.0))
        result = detector.detect_anomalies_in_history(data, (200, 401))
        assert [(a.index, a.value) for a in result.anomalies] == \
            [(200, 5.0), (400, 5.0)]

    def test_unordered_input_sorted_by_time(self):
        """:76-105 — unordered input sorts by time; anomalies come back
        keyed by the original timestamps in time order."""
        from deequ_spark import (AnomalyDetector, DataPoint,
                                 SimpleThresholdStrategy)
        data = [DataPoint(10, -1.0), DataPoint(25, 2.0),
                DataPoint(11, 3.0), DataPoint(0, 0.5)]
        detector = AnomalyDetector(
            SimpleThresholdStrategy(lower_bound=-0.5, upper_bound=1.0))
        result = detector.detect_anomalies_in_history(data)
        assert [(a.index, a.value) for a in result.anomalies] == \
            [(10, -1.0), (11, 3.0), (25, 2.0)]

    def test_is_new_point_anomalous(self):
        """AnomalyDetector.scala:38-64 — history guard + windowed check of
        only the new point."""
        from deequ_spark import (AnomalyDetector, DataPoint,
                                 SimpleThresholdStrategy)
        detector = AnomalyDetector(
            SimpleThresholdStrategy(lower_bound=-0.5, upper_bound=1.0))
        history = [DataPoint(0, 0.5), DataPoint(1, 0.9)]
        hit = detector.is_new_point_anomalous(history, DataPoint(2, 5.0))
        assert [(a.index, a.value) for a in hit.anomalies] == [(2, 5.0)]
        ok = detector.is_new_point_anomalous(history, DataPoint(2, 0.1))
        assert ok.anomalies == []
        with pytest.raises(ValueError, match="in history range"):
            detector.is_new_point_anomalous(history, DataPoint(1, 0.1))
        with pytest.raises(ValueError, match="must not be empty"):
            detector.is_new_point_anomalous([], DataPoint(2, 0.1))


class TestHistoryUtils:
    """Transcribed from anomalydetection/HistoryUtilsTest.scala:26-47."""

    def test_extract_metric_value(self):
        from deequ_spark.anomaly import extract_metric_value
        from deequ_spark.metrics import DoubleMetric, Entity
        failed = DoubleMetric(Entity.COLUMN, "metric-name", "instance-name",
                              None, ValueError("x"))
        ok = DoubleMetric(Entity.COLUMN, "metric-name", "instance-name", 50.0)
        assert extract_metric_value(None) is None
        assert extract_metric_value(failed) is None
        assert extract_metric_value(ok) == 50.0

    def test_extract_metric_values(self):
        from deequ_spark.anomaly import DataPoint, extract_metric_values
        from deequ_spark.metrics import DoubleMetric, Entity
        failed = DoubleMetric(Entity.COLUMN, "metric-name", "instance-name",
                              None, ValueError("x"))
        ok = DoubleMetric(Entity.COLUMN, "metric-name", "instance-name", 50.0)
        out = extract_metric_values([(0, None), (1, failed), (2, ok)])
        assert out == [DataPoint(0, None), DataPoint(1, None),
                       DataPoint(2, 50.0)]


class TestRateOfChangeStrategyAlias:
    """RateOfChangeStrategyTest.scala:26-45 — the deprecated
    RateOfChangeStrategy is AbsoluteChangeStrategy by another name
    (RateOfChangeStrategy.scala:19-31); the whole test file is one case."""

    def test_detect_all_anomalies_if_no_interval_specified(self):
        from deequ_spark.anomaly import RateOfChangeStrategy
        data = [1.0 if i < 20 or i > 30 else
                (float(i) if i % 2 == 0 else float(-i))
                for i in range(51)]
        s = RateOfChangeStrategy(-2.0, 2.0)
        anomalies = s.detect(data)
        assert _indices(anomalies) == list(range(20, 32))
        # Anomaly(Option(data(i)), 1.0): each anomaly carries the raw value
        for a in anomalies:
            assert a.value == data[a.index]
