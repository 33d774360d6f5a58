"""Anomaly detection over metric time-series.

Reference parity: /root/reference/src/main/scala/com/amazon/deequ/
anomalydetection/{SimpleThresholdStrategy,BaseChangeStrategy,
AbsoluteChangeStrategy,RelativeRateOfChangeStrategy,BatchNormalStrategy,
OnlineNormalStrategy,seasonal/HoltWinters}.scala (1030 LoC).

Pure driver-side numpy — input is a Vector[Double] of historical metric
values; no Spark work. HoltWinters replaces the reference's BOBYQA
optimizer with a coarse-to-fine grid search (no scipy dependency).
"""

from __future__ import annotations

import bisect
import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class Anomaly:
    index: int
    value: float
    detail: Optional[str] = None


@dataclass
class DetectionResult:
    anomalies: List[Anomaly] = field(default_factory=list)


@dataclass
class DataPoint:
    """Timestamped metric observation (parity:
    anomalydetection/AnomalyDetector.scala DataPoint[Double] — a None
    metric_value marks a missing observation)."""
    time: int
    metric_value: Optional[float] = None


class AnomalyDetector:
    """Timeline wrapper around a strategy (parity: AnomalyDetector.scala):
    drops missing values, sorts by time, maps the [start, end) TIME
    interval onto index space via insertion points, and keys detected
    anomalies back by their original timestamps."""

    def __init__(self, strategy: "AnomalyDetectionStrategy"):
        self.strategy = strategy

    def is_new_point_anomalous(self, historical_data_points: Sequence[DataPoint],
                               new_point: DataPoint) -> DetectionResult:
        """Parity: AnomalyDetector.scala:38-64 isNewPointAnomalous."""
        if not historical_data_points:
            raise ValueError("historicalDataPoints must not be empty!")
        sorted_points = sorted(historical_data_points, key=lambda p: p.time)
        last_time = sorted_points[-1].time
        if last_time >= new_point.time:
            raise ValueError(
                "Can't decide which range to use for anomaly detection. "
                f"New data point with time {new_point.time} is in history "
                f"range ({sorted_points[0].time} - {last_time})!")
        return self.detect_anomalies_in_history(
            list(sorted_points) + [new_point],
            (new_point.time, _MAX_TIME))

    def detect_anomalies_in_history(
            self, data_series: Sequence[DataPoint],
            search_interval: Tuple[int, int] = None) -> DetectionResult:
        """Parity: AnomalyDetector.scala:66-101 — search_interval is a
        half-open [start, end) TIME window; anomalies come back keyed by
        timestamp (Anomaly.index carries the time)."""
        start, end = search_interval if search_interval is not None \
            else (_MIN_TIME, _MAX_TIME)
        if start > end:
            raise ValueError("The first interval element has to be smaller "
                             "or equal to the last.")
        present = [p for p in data_series if p.metric_value is not None]
        present.sort(key=lambda p: p.time)
        times = [p.time for p in present]
        values = [float(p.metric_value) for p in present]
        lower = bisect.bisect_left(times, start)
        upper = bisect.bisect_left(times, end)
        found = self.strategy.detect(values, (lower, upper))
        return DetectionResult([
            Anomaly(times[a.index], a.value, a.detail) for a in found])


_MIN_TIME = -(2 ** 63)
_MAX_TIME = 2 ** 63 - 1


def extract_metric_value(metric) -> Optional[float]:
    """Optional metric → optional value (parity: HistoryUtils.scala:44-46
    — failed metrics read as missing observations)."""
    if metric is None or not metric.is_success:
        return None
    return metric.value


def extract_metric_values(dated_metrics) -> List[DataPoint]:
    """Seq[(date, Option[Metric])] → Seq[DataPoint] (parity:
    HistoryUtils.scala:33-35)."""
    return [DataPoint(date, extract_metric_value(m))
            for date, m in dated_metrics]


class AnomalyDetectionStrategy:
    def detect(self, values: Sequence[float],
               search_interval: Optional[Tuple[int, int]] = None
               ) -> List[Anomaly]:
        raise NotImplementedError

    def _bounds(self, values, search_interval):
        lo, hi = (0, len(values)) if search_interval is None else search_interval
        return max(lo, 0), min(hi, len(values))


@dataclass
class SimpleThresholdStrategy(AnomalyDetectionStrategy):
    """Parity: SimpleThresholdStrategy.scala:25-60."""
    lower_bound: float = -math.inf
    upper_bound: float = math.inf

    def __post_init__(self):
        # parity: SimpleThresholdStrategy.scala require(lower <= upper)
        if self.lower_bound > self.upper_bound:
            raise ValueError("The lower bound must be smaller or equal to "
                             "the upper bound.")

    def detect(self, values, search_interval=None):
        lo, hi = self._bounds(values, search_interval)
        return [Anomaly(i, v, f"outside [{self.lower_bound}, {self.upper_bound}]")
                for i, v in enumerate(values)
                if lo <= i < hi and not (self.lower_bound <= v <= self.upper_bound)]


class BaseChangeStrategy(AnomalyDetectionStrategy):
    """Nth-order differencing with bounds
    (parity: BaseChangeStrategy.scala:24-100)."""

    def __init__(self, max_rate_decrease=-math.inf, max_rate_increase=math.inf,
                 order: int = 1):
        self.max_rate_decrease = max_rate_decrease
        self.max_rate_increase = max_rate_increase
        self.order = order

    def _transform(self, arr: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def detect(self, values, search_interval=None):
        arr = np.asarray(values, dtype=float)
        if len(arr) <= self.order:
            return []
        diffs = self._transform(arr)
        lo, hi = self._bounds(values, search_interval)
        out = []
        for i in range(max(lo, self.order), hi):
            d = diffs[i - self.order]
            if not (self.max_rate_decrease <= d <= self.max_rate_increase):
                out.append(Anomaly(i, float(arr[i]),
                                   f"change {d} outside "
                                   f"[{self.max_rate_decrease}, {self.max_rate_increase}]"))
        return out


class AbsoluteChangeStrategy(BaseChangeStrategy):
    """Parity: AbsoluteChangeStrategy.scala."""

    def _transform(self, arr):
        return np.diff(arr, n=self.order)


class RelativeRateOfChangeStrategy(BaseChangeStrategy):
    """Parity: RelativeRateOfChangeStrategy.scala — the DIRECT ratio
    v[i]/v[i-order], NOT an iterated ratio-of-ratios (the reference's own
    diff fixtures pin this: diff([1,2,4,1,2,8], 2) = [4, 0.5, 0.5, 8] =
    v[i]/v[i-2]; RelativeRateOfChangeStrategyTest.scala:80-100). Division
    follows IEEE: x/0 = ±Inf, 0/0 = NaN — NaN fails both bounds, so a
    0-to-0 step reads as an anomaly, same as the reference's Scala
    doubles."""

    def _transform(self, arr):
        with np.errstate(divide="ignore", invalid="ignore"):
            return arr[self.order:] / arr[:-self.order]


# deprecated backwards-compat alias: the reference's old RateOfChangeStrategy
# "actually detects absolute changes so it has been migrated to
# AbsoluteChangeStrategy" (RateOfChangeStrategy.scala:19-31)
RateOfChangeStrategy = AbsoluteChangeStrategy


@dataclass
class MADStrategy(AnomalyDetectionStrategy):
    """Robust variant of BatchNormalStrategy: median ± k·1.4826·MAD over
    the reference window (excluding the search interval by default).

    No reference counterpart — the reference's Gaussian strategies break
    when the history itself contains anomalies (one spike inflates the
    stddev until nothing else is flagged); MAD has a 50% breakdown
    point, so a metric time-series polluted by past incidents still
    yields tight bounds (same Hampel rule as analyzers/robust.py).
    Degenerate MAD = 0 (over half the history identical) flags any
    value different from the median."""
    k: float = 3.0
    include_interval: bool = False

    def __post_init__(self):
        if self.k <= 0:
            raise ValueError("k must be positive")

    def detect(self, values, search_interval=None):
        arr = np.asarray(values, dtype=float)
        lo, hi = self._bounds(values, search_interval)
        ref = arr if self.include_interval \
            else np.concatenate([arr[:lo], arr[hi:]])
        if len(ref) == 0:
            raise ValueError("no data points to estimate the distribution")
        med = float(np.percentile(ref, 50))
        mad = float(np.percentile(np.abs(ref - med), 50))
        if mad > 0:
            cut = self.k * 1.4826 * mad
            lower, upper = med - cut, med + cut
        else:
            lower = upper = med
        return [Anomaly(i, float(v), f"outside [{lower}, {upper}]")
                for i, v in enumerate(arr) if lo <= i < hi
                and not (lower <= v <= upper)]


@dataclass
class BatchNormalStrategy(AnomalyDetectionStrategy):
    """Mean ± k·stddev over a trailing window excluding the search interval
    (parity: BatchNormalStrategy.scala:33-90)."""
    lower_deviation_factor: Optional[float] = 3.0
    upper_deviation_factor: Optional[float] = 3.0
    include_interval: bool = False

    def detect(self, values, search_interval=None):
        arr = np.asarray(values, dtype=float)
        lo, hi = self._bounds(values, search_interval)
        if self.include_interval:
            ref = arr
        else:
            ref = np.concatenate([arr[:lo], arr[hi:]])
        if len(ref) == 0:
            raise ValueError("no data points to estimate the distribution")
        mean, std = float(np.mean(ref)), float(np.std(ref))
        lower = (mean - self.lower_deviation_factor * std
                 if self.lower_deviation_factor is not None else -math.inf)
        upper = (mean + self.upper_deviation_factor * std
                 if self.upper_deviation_factor is not None else math.inf)
        return [Anomaly(i, float(v), f"outside [{lower}, {upper}]")
                for i, v in enumerate(arr) if lo <= i < hi
                and not (lower <= v <= upper)]


@dataclass
class OnlineNormalStrategy(AnomalyDetectionStrategy):
    """Incremental mean/stddev that can exclude detected anomalies
    (parity: OnlineNormalStrategy.scala:39-140, verified against the
    reference's own Gaussian fixtures in tests/test_anomaly_parity.py).

    Reference-exact details: the running stats are updated with the
    current value BEFORE the bound check (so a point is compared against
    statistics that include it); the first ``len·ignore_start_percentage``
    indices and points outside the search interval are never anomalies
    and always enter the stats; a missing deviation factor behaves as
    Double.MaxValue (bound collapses to the mean when stddev is 0)."""
    lower_deviation_factor: Optional[float] = 3.0
    upper_deviation_factor: Optional[float] = 3.0
    ignore_start_percentage: float = 0.1
    ignore_anomalies: bool = True

    def __post_init__(self):
        if self.lower_deviation_factor is None \
                and self.upper_deviation_factor is None:
            raise ValueError("At least one factor has to be specified.")
        if (self.lower_deviation_factor or 0) < 0 \
                or (self.upper_deviation_factor or 0) < 0:
            raise ValueError("Factors cannot be smaller than zero.")
        if not 0 <= self.ignore_start_percentage <= 1:
            raise ValueError("Percentage of start values to ignore must "
                             "be in interval [0, 1].")

    def compute_stats_and_anomalies(self, values, search_interval=None):
        """(mean, stddev, is_anomaly) per index —
        OnlineNormalStrategy.scala:66-118 computeStatsAndAnomalies."""
        arr = np.asarray(values, dtype=float)
        lo, hi = self._bounds(values, search_interval)
        max_f = 1.7976931348623157e308           # Double.MaxValue getOrElse
        lo_f = (self.lower_deviation_factor
                if self.lower_deviation_factor is not None else max_f)
        up_f = (self.upper_deviation_factor
                if self.upper_deviation_factor is not None else max_f)
        skip = len(arr) * self.ignore_start_percentage
        mean = var = sn = 0.0
        out = []
        for i, v in enumerate(arr):
            last_mean, last_var, last_sn = mean, var, sn
            mean = v if i == 0 else last_mean + (v - last_mean) / (i + 1)
            sn += (v - last_mean) * (v - mean)
            var = sn / (i + 1)
            std = math.sqrt(var)
            upper = mean + up_f * std
            lower = mean - lo_f * std
            if i < skip or i < lo or i >= hi or lower <= v <= upper:
                out.append((mean, std, False))
            else:
                if self.ignore_anomalies:
                    mean, var, sn = last_mean, last_var, last_sn
                out.append((mean, std, True))
        return out

    def detect(self, values, search_interval=None):
        lo, hi = self._bounds(values, search_interval)
        stats = self.compute_stats_and_anomalies(values, search_interval)
        return [Anomaly(i, float(values[i]),
                        f"mean {stats[i][0]}, stddev {stats[i][1]}")
                for i in range(lo, hi) if stats[i][2]]


class HoltWinters(AnomalyDetectionStrategy):
    """Additive triple exponential smoothing (ETS(A,A)) with the
    reference's train/forecast split: fit on the data BEFORE the search
    interval, forecast into it, and flag points whose absolute forecast
    error exceeds 1.96 × the sample stddev of the |training residuals|
    (parity: seasonal/HoltWinters.scala:90-250, outcome-verified against
    HoltWintersTest.scala fixtures in tests/test_anomaly_parity.py).
    The reference's breeze LBFGSB parameter search is replaced by a grid
    over (alpha, beta, gamma) minimizing the same training RSS — the
    container has no scipy, and the fixtures are threshold-robust."""

    def __init__(self, period: int = 7):
        self.period = period

    def _additive_holt_winters(self, series, n_forecast, a, b, g):
        """HoltWinters.scala:90-140 additiveHoltWinters: returns
        (forecasts, training residuals)."""
        m = self.period
        level = [float(sum(series[:m])) / m]
        trend = [(float(sum(series[m:2 * m])) - float(sum(series[:m])))
                 / (m * m)]
        season = [float(v) - level[0] for v in series[:m]]
        y = [level[0] + trend[0] + season[0]]
        full = list(series)
        n = len(series)
        for t in range(n + n_forecast):
            if t >= n:
                full.append(level[-1] + trend[-1] + season[len(season) - m])
            level.append(a * (full[t] - season[t])
                         + (1 - a) * (level[t] + trend[t]))
            trend.append(b * (level[t + 1] - level[t]) + (1 - b) * trend[t])
            season.append(g * (full[t] - level[t] - trend[t])
                          + (1 - g) * season[t])
            y.append(level[t + 1] + trend[t + 1] + season[t + 1])
        residuals = [sv - fv for fv, sv in zip(y, series)]
        return full[n:], residuals

    def detect(self, values, search_interval=None):
        # requirement parity: seasonal/HoltWinters.scala:204-217 requires
        # (messages pinned by HoltWintersTest.scala:33-68)
        arr = np.asarray(values, dtype=float)
        if search_interval is None:
            # reference default (0, IntMax) can never satisfy
            # start >= 2·period; our no-interval convenience trains on the
            # first two cycles and tests everything after
            search_interval = (2 * self.period, 2 ** 31 - 1)
        start, end = search_interval
        if start >= end:
            raise ValueError("Start must be before end")
        if start < 0 or end < 0:
            raise ValueError(
                "The search interval needs to be strictly positive")
        if len(arr) == 0:
            raise ValueError("Provided data series is empty")
        if start < 2 * self.period:
            raise ValueError(
                "Need at least two full cycles of data to estimate model")

        n_forecast = (1 if start >= len(arr)
                      else min(end, len(arr)) - start)
        training = arr[:start]
        grid = [0.0, 0.05, 0.1, 0.2, 0.3, 0.5, 0.7, 0.9, 1.0]
        best, best_rss = None, math.inf
        for a in grid:
            for b in grid:
                for g in grid:
                    _, resid = self._additive_holt_winters(
                        training, n_forecast, a, b, g)
                    rss = float(sum(r * r for r in resid))
                    if rss < best_rss:
                        best_rss, best = rss, (a, b, g)
        forecasts, residuals = self._additive_holt_winters(
            training, n_forecast, *best)
        abs_resid = np.abs(residuals)
        sd = float(np.std(abs_resid, ddof=1)) if len(abs_resid) > 1 else 0.0
        test = arr[start:]
        return [Anomaly(start + i, float(v),
                        f"Forecasted {f} for observed value {v}")
                for i, (v, f) in enumerate(zip(test, forecasts))
                if abs(v - f) > 1.96 * sd]


# --- wiring into VerificationSuite -----------------------------------------

@dataclass
class AnomalyCheckConfig:
    """Parity: applicability of isNewestPointNonAnomalous
    (checks/Check.scala:1511-1568)."""
    level: "object" = None  # CheckLevel; resolved lazily to avoid cycle
    description: str = "Anomaly check"
    with_tag_values: Optional[dict] = None
    after_date: Optional[int] = None
    before_date: Optional[int] = None


class AnomalyCheck:
    """Built by VerificationRunBuilder.add_anomaly_check
    (parity: VerificationRunBuilder.scala:226-243)."""

    def __init__(self, strategy: AnomalyDetectionStrategy, analyzer,
                 config: Optional[AnomalyCheckConfig] = None):
        self.strategy = strategy
        self.analyzer = analyzer
        self.config = config or AnomalyCheckConfig()

    def to_check(self, repository):
        from .checks import Check, CheckLevel
        level = self.config.level or CheckLevel.WARNING
        check = Check(level, self.config.description)
        strategy, analyzer, config = self.strategy, self.analyzer, self.config

        def assertion(current_value: float) -> bool:
            points: List[DataPoint] = []
            if repository is not None:
                loader = repository.load()
                if config.with_tag_values:
                    loader = loader.with_tag_values(config.with_tag_values)
                if config.after_date is not None:
                    loader = loader.after(config.after_date)
                if config.before_date is not None:
                    loader = loader.before(config.before_date)
                points = extract_metric_values(
                    (key.dataset_date,
                     next((m for a, m in ctx.metric_map.items()
                           if a == analyzer), None))
                    for key, ctx in loader.get())
                # non-numeric successful metrics (e.g. a Distribution)
                # become MISSING observations — the date stays on the
                # timeline rather than vanishing; bool is excluded
                # explicitly (it is an int subclass, not a metric value)
                points = [p if (isinstance(p.metric_value, (int, float))
                                and not isinstance(p.metric_value, bool))
                          else DataPoint(p.time, None)
                          for p in points]
            if not points:
                # no usable history: only the point itself can flag (e.g.
                # SimpleThresholdStrategy); change/normal strategies pass
                anomalies = strategy.detect([current_value], (0, 1))
                return len(anomalies) == 0
            # reference isNewestPointNonAnomalous: history keyed and
            # SORTED by ResultKey.dataSetDate, new point strictly after
            new_time = max(p.time for p in points) + 1
            result = AnomalyDetector(strategy).is_new_point_anomalous(
                points, DataPoint(new_time, float(current_value)))
            return len(result.anomalies) == 0

        from .constraints import AnalysisBasedConstraint
        check._cells.append({
            "factory": lambda w: AnalysisBasedConstraint(
                analyzer, assertion,
                name=f"AnomalyConstraint({analyzer.name}({analyzer.instance}))"),
            "where": None, "filterable": False})
        return check
