"""Sliced analysis — every scan-shareable analyzer computed PER DATA
SLICE in one fused groupBy pass.

The engine's core trick (reference AnalysisRunner.scala:355-371: N
analyzers fuse into ONE ``df.agg``) extended to the per-partition
quality question every lake has — "Completeness of email per SOURCE",
"mean price per ingest DAY" — without running one filtered pass per
slice: the same fused expression list runs under
``groupBy(slice_cols)``, so N analyzers × G slices cost ONE shuffle,
identical to a single groupBy aggregation of the data.

Driver-side output is one metric row per (slice, analyzer) — bounded by
``max_slices`` (high-cardinality slice columns belong in a grouping
analyzer, not a slicer).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analyzers.base import ScanShareableAnalyzer
from .checks import Check, CheckStatus
from .metrics import Metric

__all__ = ["sliced_metrics", "sliced_verification",
           "sliced_grouped_metrics"]


def _fused(df: DataFrame, slice_cols: List[str],
           analyzers: Sequence[ScanShareableAnalyzer],
           max_slices: int):
    for a in analyzers:
        if not isinstance(a, ScanShareableAnalyzer):
            raise ValueError(
                f"{type(a).__name__} is not scan-shareable; sliced "
                "analysis fuses aggregation expressions — grouping "
                "analyzers (Uniqueness/Histogram/...) need their own "
                "frequency pass per design")
    aggregations, offsets = [], []
    current = len(slice_cols)          # slice key columns come first
    for a in analyzers:
        aggs = a.aggregation_functions()
        aggregations.extend(aggs)
        offsets.append(current)
        current += len(aggs)
    rows = (df.groupBy(*[F.col(c) for c in slice_cols])
            .agg(*aggregations)
            .limit(max_slices + 1).collect())
    if len(rows) > max_slices:
        raise ValueError(
            f"more than max_slices={max_slices} slices; a slice column "
            "this granular belongs in a grouping analyzer")
    return rows, offsets


def sliced_metrics(df: DataFrame, slice_cols: Union[str, Sequence[str]],
                   analyzers: Sequence[ScanShareableAnalyzer],
                   max_slices: int = 10_000
                   ) -> Dict[Tuple, Dict[ScanShareableAnalyzer, Metric]]:
    """``{slice_key_tuple: {analyzer: Metric}}`` — all metrics for all
    slices from ONE aggregation job. Precondition failures surface as
    failure metrics (never exceptions), matching the runner contract."""
    cols = [slice_cols] if isinstance(slice_cols, str) else list(slice_cols)
    for a in analyzers:
        for check in a.preconditions():
            check(df.schema)
    rows, offsets = _fused(df, cols, analyzers, max_slices)
    out: Dict[Tuple, Dict[ScanShareableAnalyzer, Metric]] = {}
    for row in rows:
        key = tuple(row[i] for i in range(len(cols)))
        out[key] = {
            a: a.metric_from_aggregation_result(row, off)
            for a, off in zip(analyzers, offsets)}
    return out


def sliced_grouped_metrics(df: DataFrame,
                           slice_cols: Union[str, Sequence[str]],
                           analyzers,
                           max_slices: int = 10_000
                           ) -> Dict[Tuple, Dict]:
    """Frequency-based analyzers (Uniqueness / UniqueValueRatio /
    Distinctness / CountDistinct / Entropy / DuplicateRowCount) computed
    PER SLICE in the reference's two-job grouping contract
    (AnalysisRunner.scala:582-605), with the slice key fused into both
    stages:

    * job 1 — ONE frequency table ``groupBy(slice_cols + grouping_cols)``
      (the same shuffle a single grouped aggregation pays);
    * job 2 — ALL analyzers' second-stage aggregates PLUS per-slice
      num_rows recovery (``SUM(absolute)``) under ``groupBy(slice_cols)``
      over that (already shuffled, much smaller) table.

    All analyzers must share one ``grouping_columns``/``where`` pair —
    the same precondition the runner's grouping fusion has; mixed
    buckets just call this once per bucket. Returns
    ``{slice_key_tuple: {analyzer: Metric}}``.
    """
    from .analyzers.grouping import (COUNT_COL,
                                     ScanShareableFrequencyBasedAnalyzer)
    cols = [slice_cols] if isinstance(slice_cols, str) else list(slice_cols)
    analyzers = list(analyzers)
    if not analyzers:
        return {}
    for a in analyzers:
        if not isinstance(a, ScanShareableFrequencyBasedAnalyzer):
            raise ValueError(
                f"{type(a).__name__} does not fuse over a shared "
                "frequency table (Histogram-style analyzers build their "
                "own result rows); use sliced_metrics for scan-shareable "
                "analyzers")
    group_cols = list(analyzers[0].grouping_columns)
    wheres = {a.where for a in analyzers}
    for a in analyzers[1:]:
        if list(a.grouping_columns) != group_cols:
            raise ValueError(
                "all analyzers must share one grouping-column set "
                f"(got {group_cols} vs {list(a.grouping_columns)}); "
                "call once per bucket, as the runner's fusion does")
    if len(wheres) > 1:
        raise ValueError(
            f"all analyzers must share one where filter (got {wheres})")

    # frequencies_plan semantics per slice: the at-least-one-non-null
    # guard must range over the ANALYZER grouping columns only (a row
    # with all-null grouping values is excluded regardless of its
    # slice key — GroupingAnalyzers.scala:64-109), so the plan is built
    # here rather than delegated
    where = analyzers[0].where
    filtered = df.filter(where) if where is not None else df
    at_least_one = None
    for name in group_cols:
        c = F.col(name).isNotNull()
        at_least_one = c if at_least_one is None else (at_least_one | c)
    freq = (filtered.select(*cols, *group_cols).where(at_least_one)
            .groupBy(*[F.col(c) for c in cols + group_cols])
            .agg(F.count(F.lit(1)).alias(COUNT_COL)))
    aggregations, offsets = [], []
    current = len(cols)
    for a in analyzers:
        aggs = a.aggregation_functions()
        aggregations.extend(aggs)
        offsets.append(current)
        current += len(aggs)
    # coalesce(1) before the limit: the post-agg output is one row per
    # slice (tiny), and CollectLimit over many shuffle partitions runs
    # one JOB per scale-up round — fused into a single partition the
    # whole pipeline is exactly the two jobs the contract promises
    rows = (freq.groupBy(*[F.col(c) for c in cols])
            .agg(*aggregations,
                 F.sum(F.col(COUNT_COL)).alias("__num_rows"))
            .coalesce(1).limit(max_slices + 1).collect())
    if len(rows) > max_slices:
        raise ValueError(
            f"more than max_slices={max_slices} slices; a slice column "
            "this granular belongs in the grouping columns themselves")
    out: Dict[Tuple, Dict] = {}
    for row in rows:
        key = tuple(row[i] for i in range(len(cols)))
        n = int(row["__num_rows"] or 0)
        out[key] = {
            a: a.metric_from_aggregation_result(row, off, n)
            for a, off in zip(analyzers, offsets)}
    return out


def sliced_verification(df: DataFrame,
                        slice_cols: Union[str, Sequence[str]],
                        check: Check,
                        max_slices: int = 10_000) -> Dict[Tuple, CheckStatus]:
    """Evaluate ONE Check independently on every slice — per-source /
    per-day quality gates from a single fused pass. Returns
    ``{slice_key_tuple: CheckStatus}``.

    Restricted to checks whose constraints ride scan-shareable
    analyzers (the overwhelmingly common case: completeness, compliance,
    min/max/mean/size bounds...)."""
    analyzers = list(dict.fromkeys(check.required_analyzers()))
    metrics_by_slice = sliced_metrics(df, slice_cols, analyzers,
                                      max_slices=max_slices)
    return {key: check.evaluate(mm).status
            for key, mm in metrics_by_slice.items()}
