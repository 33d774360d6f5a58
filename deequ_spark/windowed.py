"""Windowed metrics — data-quality metrics per event-time window.

Beyond the reference (which has no time-windowing at all): compute any set
of scan-shareable analyzers per tumbling/sliding event-time window in ONE
``groupBy(window(ts)).agg(...)`` job — the windowed generalization of the
engine's fused scan (runners/analysis_runner.py). The same aggregation
plan applied to a streaming DataFrame with a watermark gives late-data-
tolerant streaming quality metrics (Structured Streaming windowed aggs).

Scale notes: one shuffle keyed by window bucket; partial aggregation
happens map-side, so the shuffled volume is O(windows × analyzers), not
O(rows). Skew only arises if one window holds most events — use smaller
windows or sliding offsets then.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analyzers.base import ScanShareableAnalyzer


def _fused_aggregations(analyzers: Sequence[ScanShareableAnalyzer]
                        ) -> Tuple[List, List[int]]:
    aggregations, offsets, current = [], [], 0
    for a in analyzers:
        aggs = a.aggregation_functions()
        aggregations.extend(aggs)
        offsets.append(current)
        current += len(aggs)
    return aggregations, offsets


def windowed_agg_plan(df: DataFrame, ts_col: str, window_duration: str,
                      analyzers: Sequence[ScanShareableAnalyzer],
                      slide_duration: Optional[str] = None,
                      watermark: Optional[str] = None) -> DataFrame:
    """The lazy fused plan: one row per window with every analyzer's raw
    aggregate columns. Works on batch AND streaming DataFrames (pass
    ``watermark`` for streams so state can be evicted)."""
    for a in analyzers:
        if not isinstance(a, ScanShareableAnalyzer):
            raise ValueError(f"{type(a).__name__} is not scan-shareable; "
                             "windowed metrics fuse scan analyzers only")
    aggregations, _ = _fused_aggregations(analyzers)
    data = df
    if watermark is not None:
        data = data.withWatermark(ts_col, watermark)
    win = (F.window(ts_col, window_duration, slide_duration)
           if slide_duration else F.window(ts_col, window_duration))
    return data.groupBy(win.alias("window")).agg(*aggregations)


def windowed_metrics(df: DataFrame, ts_col: str, window_duration: str,
                     analyzers: Sequence[ScanShareableAnalyzer],
                     slide_duration: Optional[str] = None,
                     max_windows: int = 100_000) -> DataFrame:
    """(window_start, window_end, entity, instance, name, value) — one
    fused job over all windows and analyzers. Metric extraction runs on
    the driver over one collected row per window (windows ≪ rows).

    The driver materialization is BOUNDED: more than ``max_windows``
    windows raises (a years-long scan at 1-minute windows is ~10⁶ rows —
    that is a plan mistake, not a metrics series). For unbounded ranges
    use ``windowed_agg_plan``, which returns the aggregated DataFrame
    without collecting."""
    # a non-scan-shareable analyzer is a programming error, not a data
    # error — raise, don't convert to a failure row
    for a in analyzers:
        if not isinstance(a, ScanShareableAnalyzer):
            raise ValueError(f"{type(a).__name__} is not scan-shareable; "
                             "windowed metrics fuse scan analyzers only")
    out = []

    # screen preconditions against the schema first (mirrors the batch
    # runner): a bad column/type yields an error row with a NULL window
    # instead of failing the whole fused aggregation at analysis time
    schema = df.schema
    runnable: List[ScanShareableAnalyzer] = []
    for a in analyzers:
        try:
            for check in a.preconditions():
                check(schema)
            runnable.append(a)
        except Exception as exc:  # noqa: BLE001
            _append_metric_rows(out, None, None, a.to_failure_metric(exc))
    if not runnable:
        return _rows_to_df(df.sparkSession, out)

    _, offsets = _fused_aggregations(runnable)
    guard_error = None
    try:
        # limit(max_windows+1): the guard rides the same job — no extra
        # count pass, and at most max_windows+1 rows ever reach the driver
        rows = windowed_agg_plan(df, ts_col, window_duration, runnable,
                                 slide_duration).limit(max_windows + 1) \
            .collect()
        if len(rows) > max_windows:
            guard_error = ValueError(
                f"windowed_metrics would collect more than {max_windows} "
                "windows to the driver; narrow the time range / widen the "
                "window, raise max_windows, or use windowed_agg_plan() "
                "which returns the aggregated DataFrame uncollected")
    except Exception:  # noqa: BLE001
        # lazily-parsed expression errors (e.g. bad `where` SQL) surface at
        # plan-build or collect time — isolate with one windowed agg per
        # analyzer
        for a in runnable:
            try:
                single = windowed_agg_plan(df, ts_col, window_duration, [a],
                                           slide_duration).collect()
                for row in single:
                    state = a.from_aggregation_result(row, 1)
                    _append_metric_rows(
                        out, row["window"]["start"], row["window"]["end"],
                        a.compute_metric_from_state(state))
            except Exception as exc:  # noqa: BLE001
                _append_metric_rows(out, None, None, a.to_failure_metric(exc))
        return _rows_to_df(df.sparkSession, out)
    if guard_error is not None:
        raise guard_error
    for row in rows:
        start, end = row["window"]["start"], row["window"]["end"]
        for a, offset in zip(runnable, offsets):
            try:
                state = a.from_aggregation_result(row, offset + 1)
                metric = a.compute_metric_from_state(state)
            except Exception as exc:  # noqa: BLE001
                metric = a.to_failure_metric(exc)
            _append_metric_rows(out, start, end, metric)
    return _rows_to_df(df.sparkSession, out)


def _append_metric_rows(out: List, start, end, metric) -> None:
    """Keyed metrics flatten to one row per sub-metric; failures surface
    as NULL value + error text, never vanish."""
    flat = getattr(metric, "flattened", None)
    for m in (flat if flat is not None else [metric]):
        if m.is_success and isinstance(m.value, (int, float)):
            out.append((start, end, m.entity.value, m.instance,
                        m.name, float(m.value), None))
        else:
            out.append((start, end, m.entity.value, m.instance,
                        m.name, None, str(m.error)))


def _rows_to_df(spark, out: List) -> DataFrame:
    return spark.createDataFrame(
        out, "window_start timestamp, window_end timestamp, entity string, "
             "instance string, name string, value double, error string")
