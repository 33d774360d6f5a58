"""Robust-statistics analyzers: median absolute deviation and
MAD-based outlier detection.

No reference counterpart — the reference's spread analyzers
(StandardDeviation.scala, ApproxQuantile.scala) are all moment- or
quantile-based; mean/stddev outlier rules break down exactly when the
data is dirty (one 10¹⁵ sentinel value inflates σ until nothing is an
outlier). MAD = median(|x − median(x)|) has a 50% breakdown point, which
is why it's the standard robust scale estimate (Hampel 1974; Leys et al.
2013 for the |x−med| > k·1.4826·MAD decision rule).

Spark shape: exact medians are computed with ``F.percentile`` — one
whole-stage-codegen aggregation job per pass. MAD is inherently
two-pass (the inner median must be known before deviations exist);
outlier counting adds a third single-pass aggregate. Like ExactQuantile,
the state does not merge algebraically — use recomputation (or
ApproxQuantile sketches) for incremental pipelines.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .base import (Analyzer, DoubleMetric, EmptyStateError, Entity, State,
                   conditional_selection, has_column, is_numeric)

__all__ = ["MedianAbsoluteDeviation", "RobustOutlierCount", "MADState",
           "mad_outlier_flags", "MAD_CONSISTENCY"]

# E[MAD] = σ/1.4826 for a normal distribution — the consistency constant
# that makes k·1.4826·MAD comparable to k·σ thresholds
MAD_CONSISTENCY = 1.4826


@dataclass(frozen=True)
class MADState(State):
    """(median, mad, n) — exact quantile states don't merge; recompute."""
    median: float
    mad: float
    n: int

    def merge(self, other):
        raise NotImplementedError(
            "MAD has no mergeable state (exact medians); recompute on the "
            "union or use ApproxQuantile sketches for incremental runs.")


@dataclass(frozen=True, eq=False)
class MedianAbsoluteDeviation(Analyzer):
    """MAD of a numeric column: median(|x − median(x)|), exact.

    Two aggregation jobs (median, then median of absolute deviations) —
    each a single fused pass, nothing row-sized on the driver."""
    column: str
    where: Optional[str] = None

    name = "MedianAbsoluteDeviation"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [has_column(self.column), is_numeric(self.column)]

    def _selection(self) -> Column:
        return conditional_selection(
            F.col(self.column), self.where).cast("double")

    def compute_state_from(self, df: DataFrame) -> Optional[MADState]:
        sel = self._selection()
        med = df.agg(F.percentile(sel, F.lit(0.5))).collect()[0][0]
        if med is None:
            return None
        row = df.agg(
            F.percentile(F.abs(sel - F.lit(float(med))), F.lit(0.5)),
            F.count(sel)).collect()[0]
        return MADState(float(med), float(row[0]), int(row[1]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(
                EmptyStateError("Empty state (no rows) — cannot compute MAD"))
        return DoubleMetric(self.entity, self.name, self.instance, state.mad)


@dataclass(frozen=True, eq=False)
class RobustOutlierCount(Analyzer):
    """Fraction of rows with |x − median| > k · 1.4826 · MAD — the
    robust z-score rule (k=3 ≈ "beyond 3 sigma" on clean data, but immune
    to the outliers themselves inflating the scale).

    Degenerate guard: when MAD = 0 (over half the values identical) any
    deviation is infinitely many MADs out; the rule then falls back to
    "x ≠ median counts as an outlier", the standard convention.

    Three aggregation jobs, each one fused pass."""
    column: str
    k: float = 3.0
    where: Optional[str] = None

    name = "RobustOutlierCount"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        def valid_k(schema):
            if self.k <= 0:
                raise ValueError("k must be positive")
        return [has_column(self.column), is_numeric(self.column), valid_k]

    def compute_state_from(self, df: DataFrame):
        from .base import NumMatchesAndCount
        mad_state = MedianAbsoluteDeviation(
            self.column, self.where).compute_state_from(df)
        if mad_state is None:
            return None
        sel = conditional_selection(
            F.col(self.column), self.where).cast("double")
        flag = _outlier_condition(sel, mad_state.median, mad_state.mad,
                                  self.k)
        row = df.agg(F.sum(flag.cast("long")), F.count(sel)).collect()[0]
        return NumMatchesAndCount(int(row[0] or 0), int(row[1]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(
                EmptyStateError("Empty state (no rows)"))
        return DoubleMetric(self.entity, self.name, self.instance,
                            state.metric_value)


def _outlier_condition(sel: Column, median: float, mad: float,
                       k: float) -> Column:
    if mad > 0:
        cut = k * MAD_CONSISTENCY * mad
        return F.abs(sel - F.lit(median)) > F.lit(cut)
    return sel != F.lit(median)


def mad_outlier_flags(df: DataFrame, column: str, k: float = 3.0,
                      where: Optional[str] = None,
                      output_col: Optional[str] = None) -> DataFrame:
    """Row-level companion: adds ``<column>_outlier`` (boolean; NULL for
    NULL/filtered values) using the same two-pass median/MAD + one
    map-only flag projection. The flag column is a plain expression, so
    downstream filters push into the scan."""
    state = MedianAbsoluteDeviation(column, where).compute_state_from(df)
    out = output_col or f"{column}_outlier"
    if state is None:
        return df.withColumn(out, F.lit(None).cast("boolean"))
    sel = conditional_selection(F.col(column), where).cast("double")
    return df.withColumn(
        out, F.when(sel.isNotNull(),
                    _outlier_condition(sel, state.median, state.mad, k)))
