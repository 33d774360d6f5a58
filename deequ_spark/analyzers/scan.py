"""Scan-shareable analyzers (SURVEY §2a) — every analyzer here compiles to
aggregate ``Column`` expressions fused into ONE ``df.agg(...)`` by the runner.

Reference parity (semantics only, Spark-first implementation):
/root/reference/src/main/scala/com/amazon/deequ/analyzers/{Size,Completeness,
Compliance,PatternMatch,Minimum,Maximum,MinLength,MaxLength,Mean,Sum,
StandardDeviation,Variance,Skewness,Kurtosis,Correlation,ZerosCount,
RatioOfSums,Range,InterquartileRange,ExactQuantile,ApproxQuantile,
ApproxQuantiles,ApproxCountDistinct,DataType,CustomSql,CustomAggregator,
ColumnCount,ColumnExists}.scala

Notably NOT ported: the 7 custom Catalyst aggregates
(analyzers/catalyst/Stateful*.scala) — replaced by Spark built-ins
(``stddev_pop``/``skewness``/``kurtosis``/``corr``/``approx_count_distinct``/
``approx_percentile``/``percentile``) plus expression-only data-type inference
(``rlike`` sums), so the hot path stays inside whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import pandas

from pyspark.sql import Column, DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from ..metrics import (Distribution, DistributionValue, DoubleMetric, Entity,
                       HistogramMetric, KeyedDoubleMetric, Metric,
                       metric_from_failure)
from .base import (Analyzer, CorrelationState, EmptyStateError,
                   FourthMomentState, MaxState, MeanState, MinState,
                   NumMatches, NumMatchesAndCount, ScanShareableAnalyzer,
                   StandardDeviationState, State, SumState, ThirdMomentState,
                   conditional_count, conditional_selection, has_column,
                   if_no_nulls_in, is_not_nested, is_numeric, is_string)


def _col(name: str) -> Column:
    if len(name) >= 2 and name.startswith("`") and name.endswith("`"):
        return F.col(name)  # user-quoted (reference accepts "`item.one`")
    return F.col(f"`{name}`") if "." in name or " " in name else F.col(name)


class NullBehavior(str, Enum):
    """Parity: Analyzer.scala:280-283."""
    IGNORE = "Ignore"
    EMPTY_STRING = "EmptyString"
    FAIL = "Fail"


class FilteredRowOutcome(str, Enum):
    """Row-level outcome for rows excluded by an analyzer's ``where``
    filter. Parity: Analyzer.scala:285-292 (default TRUE per
    https://github.com/awslabs/deequ issue 530)."""
    TRUE = "TRUE"
    NULL = "NULL"


@dataclass(frozen=True)
class AnalyzerOptions:
    """Row-level behavior knobs. Parity: Analyzer.scala:277-278."""
    null_behavior: NullBehavior = NullBehavior.IGNORE
    filtered_row: FilteredRowOutcome = FilteredRowOutcome.TRUE


# Scala Double.MinValue/MaxValue — the NullBehavior.Fail sentinels the
# reference injects for NULL strings so the min/max metric itself fails the
# assertion (MinLength.scala:64, MaxLength.scala:64). NOT sys.float_info.min
# (smallest positive); Scala Double.MinValue is the most-negative double.
DOUBLE_MIN_VALUE = -1.7976931348623157e308
DOUBLE_MAX_VALUE = 1.7976931348623157e308


def _filtered_outcome_expr(options: Optional[AnalyzerOptions]) -> Column:
    fr = options.filtered_row if options is not None else FilteredRowOutcome.TRUE
    if fr == FilteredRowOutcome.TRUE:
        return F.lit(True)
    return F.lit(None).cast("boolean")


def _assertion_column(value: Column, assertion) -> Column:
    """Apply a Python ``float -> bool`` assertion per row, Arrow-vectorized.

    The reference ships the assertion to executors as a row-at-a-time Scala
    UDF (Constraint.scala:1227 sparkAssertion); we use a pandas_udf so the
    transfer is Arrow-batched. Fast path: try the assertion directly on the
    pandas Series — comparison-style lambdas (``lambda v: v >= 3``) are
    already elementwise. Fall back to a per-element map for assertions that
    don't broadcast (``lambda v: 0 < v < 10`` raises on a Series).
    NULL in → NULL out (the caller decides NULL semantics separately).
    """
    @F.pandas_udf("boolean")
    def _apply(s: pandas.Series) -> pandas.Series:
        notna = s.notna()
        try:
            out = assertion(s)
            if not hasattr(out, "__len__") or len(out) != len(s):
                raise TypeError("assertion did not broadcast")
            out = pandas.Series(out, index=s.index).astype("boolean")
        except Exception:
            out = s.map(lambda v: (None if pandas.isna(v)
                                   else bool(assertion(float(v))))
                        ).astype("boolean")
        return out.where(notna, None)

    return _apply(value)


# ---------------------------------------------------------------------------


@dataclass(frozen=True, eq=False)
class Size(ScanShareableAnalyzer):
    """Row count. Parity: Size.scala:36-54."""
    where: Optional[str] = None

    name = "Size"
    entity = Entity.DATASET

    @property
    def instance(self) -> str:
        return "*"

    def columns_referenced(self):
        return None if self.where else []

    def aggregation_functions(self) -> List[Column]:
        return [conditional_count(self.where)]

    def from_aggregation_result(self, result: Row, offset: int) -> Optional[NumMatches]:
        if not if_no_nulls_in(result, offset):
            return NumMatches(0)
        return NumMatches(int(result[offset]))

    def compute_metric_from_state(self, state: Optional[NumMatches]) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, float(state.num_matches))


@dataclass(frozen=True, eq=False)
class Completeness(ScanShareableAnalyzer):
    """Fraction of non-null values. Parity: Completeness.scala:30-84."""
    column: str
    where: Optional[str] = None
    analyzer_options: Optional[AnalyzerOptions] = None

    name = "Completeness"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [has_column(self.column), is_not_nested(self.column)]

    def aggregation_functions(self) -> List[Column]:
        selection = conditional_selection(_col(self.column), self.where)
        return [F.sum(selection.isNotNull().cast("long")),
                conditional_count(self.where)]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset, 2):
            return None
        return NumMatchesAndCount(int(result[offset]), int(result[offset + 1]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.metric_value)

    def row_level_column(self) -> Column:
        return _col(self.column).isNotNull()

    def row_level_results(self, assertion=None) -> Column:
        """Truth table (Completeness.scala:79-84
        conditionalSelectionFilteredFromColumns):
        where TRUE → isNotNull; where FALSE → filtered outcome (TRUE/NULL
        per options); where NULL → NULL (neither when-branch matches).
        The metric-level assertion is NOT applied per row (the reference
        wraps Completeness in a plain RowLevelConstraint)."""
        base = _col(self.column).isNotNull()
        if self.where is None:
            return base
        w = F.expr(self.where)
        return (F.when(~w, _filtered_outcome_expr(self.analyzer_options))
                .when(w, base))


@dataclass(frozen=True, eq=False)
class Compliance(ScanShareableAnalyzer):
    """Fraction of rows satisfying a SQL predicate. Parity: Compliance.scala:41-73.

    Powers is_non_negative / is_contained_in / is_less_than / satisfies(...).
    """
    instance_name: str
    predicate: str
    where: Optional[str] = None
    columns: Tuple[str, ...] = ()
    analyzer_options: Optional[AnalyzerOptions] = None

    name = "Compliance"

    @property
    def instance(self) -> str:
        return self.instance_name

    def columns_referenced(self):
        return list(self.columns) if self.columns and not self.where else None

    def aggregation_functions(self) -> List[Column]:
        summation = F.sum(
            conditional_selection(F.expr(self.predicate).cast("int"), self.where))
        return [summation, conditional_count(self.where)]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset, 2):
            return None
        return NumMatchesAndCount(int(result[offset]), int(result[offset + 1]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.metric_value)

    def row_level_column(self) -> Column:
        return F.expr(self.predicate)

    def row_level_results(self, assertion=None) -> Column:
        """Truth table (Compliance.scala:75-86 rowLevelResults):
        TRUE treatment: where FALSE *or NULL* → true; where TRUE → raw
        predicate (may be NULL for three-valued predicates over NULLs).
        NULL treatment: where TRUE → raw predicate; else NULL."""
        p = F.expr(self.predicate)
        if self.where is None:
            return p
        w = F.expr(self.where)
        opts = self.analyzer_options
        if opts is not None and opts.filtered_row == FilteredRowOutcome.NULL:
            return F.when(w, p)
        return F.when(~w | w.isNull(), F.lit(True)).otherwise(p)


@dataclass(frozen=True, eq=False)
class PatternMatch(ScanShareableAnalyzer):
    """Fraction of values matching a regex. Parity: PatternMatch.scala:41-122."""
    column: str
    pattern: str
    where: Optional[str] = None
    analyzer_options: Optional[AnalyzerOptions] = None

    name = "PatternMatch"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [has_column(self.column), is_string(self.column)]

    def _matches(self) -> Column:
        col = conditional_selection(_col(self.column), self.where)
        return (F.regexp_extract(col, self.pattern, 0) != F.lit("")).cast("long")

    def aggregation_functions(self) -> List[Column]:
        return [F.sum(self._matches()), conditional_count(self.where)]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset, 2):
            return None
        return NumMatchesAndCount(int(result[offset]), int(result[offset + 1]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.metric_value)

    def row_level_column(self) -> Column:
        return F.regexp_extract(_col(self.column), self.pattern, 0) != F.lit("")

    def row_level_results(self, assertion=None) -> Column:
        """Truth table (PatternMatch.scala:89-101 rowLevelResults):
        match expr is when(match,1).otherwise(0) — NULL column → 0 (false),
        never NULL in scope. TRUE treatment: where FALSE → true; where NULL
        falls through to the match expr (the reference's whereNotCondition
        omits the isNull arm Compliance has — asymmetry kept for parity).
        NULL treatment: where TRUE → match; FALSE/NULL → NULL."""
        match01 = (F.when(F.regexp_extract(_col(self.column), self.pattern, 0)
                          != F.lit(""), F.lit(1)).otherwise(F.lit(0)))
        if self.where is None:
            return match01.cast("boolean")
        w = F.expr(self.where)
        opts = self.analyzer_options
        if opts is not None and opts.filtered_row == FilteredRowOutcome.NULL:
            return F.when(w, match01).cast("boolean")
        return F.when(~w, F.lit(1)).otherwise(match01).cast("boolean")


class Patterns:
    """Built-in patterns. Parity: checks/Check.scala:1106-1177 (Patterns object)."""
    # emailregex.com general pattern (PatternMatch.scala:110-111) — note it
    # REQUIRES a dotted domain, so "someone@else" does not count as an
    # e-mail (CheckTest.scala:1053 pins that)
    EMAIL = r"""(?:[a-z0-9!#$%&'*+/=?^_`{|}~-]+(?:\.[a-z0-9!#$%&'*+/=?^_`{|}~-]+)*|"(?:[\x01-\x08\x0b\x0c\x0e-\x1f\x21\x23-\x5b\x5d-\x7f]|\\[\x01-\x09\x0b\x0c\x0e-\x7f])*")@(?:(?:[a-z0-9](?:[a-z0-9-]*[a-z0-9])?\.)+[a-z0-9](?:[a-z0-9-]*[a-z0-9])?|\[(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?|[a-z0-9-]*[a-z0-9]:(?:[\x01-\x08\x0b\x0c\x0e-\x1f\x21-\x5a\x53-\x7f]|\\[\x01-\x09\x0b\x0c\x0e-\x7f])+)\])"""
    URL = r"""(https?|ftp)://[^\s/$.?#].[^\s]*"""
    SOCIAL_SECURITY_NUMBER_US = r"""((?!219-09-9999|078-05-1120)(?!666|000|9\d{2})\d{3}-(?!00)\d{2}-(?!0{4})\d{4})|((?!219 09 9999|078 05 1120)(?!666|000|9\d{2})\d{3} (?!00)\d{2} (?!0{4})\d{4})|((?!219099999|078051120)(?!666|000|9\d{2})\d{3}(?!00)\d{2}(?!0{4})\d{4})"""
    CREDITCARD = r"""\b(?:3[47]\d{2}([\ \-]?)\d{6}\1\d|(?:(?:4\d|5[1-5]|65)\d{2}|6011)([\ \-]?)\d{4}\2\d{4}\2)\d{4}\b"""


def _asserted_value_row_level(value: Column, raw_is_null: Column,
                              assertion, where: Optional[str],
                              options: Optional[AnalyzerOptions],
                              null_value_outcome: Column) -> Column:
    """Shared truth table for value-asserted row-level outcomes
    (Constraint.scala:1214-1242 getUpdatedRowLevelAssertion +
    Analyzer.scala:528-541 conditionalSelectionWithAugmentedOutcome):
    where FALSE *or NULL* → filtered outcome (TRUE/NULL per options);
    in scope, value NULL → ``null_value_outcome`` (Fail → false, else NULL);
    in scope, value present → assertion(value) per row."""
    asserted = _assertion_column(value, assertion) if assertion is not None \
        else value.isNotNull()
    in_scope = F.when(raw_is_null, null_value_outcome).otherwise(asserted)
    if where is None:
        return in_scope
    w = F.expr(where)
    return F.when(w, in_scope).otherwise(_filtered_outcome_expr(options))


def _null_value_outcome(options: Optional[AnalyzerOptions]) -> Column:
    nb = options.null_behavior if options is not None else NullBehavior.IGNORE
    if nb == NullBehavior.FAIL:
        return F.lit(False)
    return F.lit(None).cast("boolean")


@dataclass(frozen=True, eq=False)
class Minimum(ScanShareableAnalyzer):
    """Parity: Minimum.scala:45-80."""
    column: str
    where: Optional[str] = None
    analyzer_options: Optional[AnalyzerOptions] = None

    name = "Minimum"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [has_column(self.column), is_numeric(self.column)]

    def aggregation_functions(self) -> List[Column]:
        return [F.min(conditional_selection(_col(self.column), self.where)).cast("double")]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset):
            return None
        return MinState(float(result[offset]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.min_value)

    def row_level_results(self, assertion=None) -> Column:
        value = _col(self.column).cast("double")
        return _asserted_value_row_level(
            value, _col(self.column).isNull(), assertion, self.where,
            self.analyzer_options, _null_value_outcome(self.analyzer_options))


@dataclass(frozen=True, eq=False)
class Maximum(ScanShareableAnalyzer):
    """Parity: Maximum.scala:45-80."""
    column: str
    where: Optional[str] = None
    analyzer_options: Optional[AnalyzerOptions] = None

    name = "Maximum"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [has_column(self.column), is_numeric(self.column)]

    def aggregation_functions(self) -> List[Column]:
        return [F.max(conditional_selection(_col(self.column), self.where)).cast("double")]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset):
            return None
        return MaxState(float(result[offset]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.max_value)

    def row_level_results(self, assertion=None) -> Column:
        value = _col(self.column).cast("double")
        return _asserted_value_row_level(
            value, _col(self.column).isNull(), assertion, self.where,
            self.analyzer_options, _null_value_outcome(self.analyzer_options))


def _length_value(column: str, null_behavior: NullBehavior,
                  fail_sentinel: float) -> Column:
    """NullBehavior-transformed length value (MinLength.scala:60-71,
    MaxLength.scala:60-71): EmptyString → NULL reads as length 0; Fail →
    NULL reads as the Scala Double.MinValue/MaxValue sentinel so the
    min/max metric itself trips the assertion; Ignore → NULL stays NULL
    (excluded from min/max, row-level outcome NULL)."""
    col = _col(column)
    if null_behavior == NullBehavior.EMPTY_STRING:
        col = F.coalesce(col, F.lit(""))
    length = F.length(col).cast("double")
    if null_behavior == NullBehavior.FAIL:
        length = F.when(_col(column).isNull(),
                        F.lit(fail_sentinel)).otherwise(length)
    return length




class _LengthAnalyzer(ScanShareableAnalyzer):
    """Shared NullBehavior/row-level machinery for MinLength/MaxLength."""

    _fail_sentinel: float = 0.0

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [has_column(self.column), is_string(self.column)]

    def effective_null_behavior(self) -> NullBehavior:
        """analyzer_options wins over the legacy null_behavior field."""
        if self.analyzer_options is not None:
            return self.analyzer_options.null_behavior
        return self.null_behavior

    def _value(self) -> Column:
        return _length_value(self.column, self.effective_null_behavior(),
                             self._fail_sentinel)

    def row_level_results(self, assertion=None) -> Column:
        """Constraint.scala:1244-1274
        getUpdatedRowLevelAssertionForLengthConstraint: the assertion runs
        on the NullBehavior-transformed length, so Fail's sentinel fails it
        and EmptyString asserts on 0.0; a NULL value (only possible under
        Ignore) → NULL outcome."""
        value = self._value()
        return _asserted_value_row_level(
            value, value.isNull(), assertion, self.where,
            self.analyzer_options, F.lit(None).cast("boolean"))


@dataclass(frozen=True, eq=False)
class MinLength(_LengthAnalyzer):
    """Parity: MinLength.scala:34-80."""
    column: str
    where: Optional[str] = None
    null_behavior: NullBehavior = NullBehavior.IGNORE
    analyzer_options: Optional[AnalyzerOptions] = None

    name = "MinLength"
    _fail_sentinel = DOUBLE_MIN_VALUE

    def aggregation_functions(self) -> List[Column]:
        return [F.min(conditional_selection(self._value(), self.where))]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset):
            return None
        return MinState(float(result[offset]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.min_value)


@dataclass(frozen=True, eq=False)
class MaxLength(_LengthAnalyzer):
    """Parity: MaxLength.scala:34-80."""
    column: str
    where: Optional[str] = None
    null_behavior: NullBehavior = NullBehavior.IGNORE
    analyzer_options: Optional[AnalyzerOptions] = None

    name = "MaxLength"
    _fail_sentinel = DOUBLE_MAX_VALUE

    def aggregation_functions(self) -> List[Column]:
        return [F.max(conditional_selection(self._value(), self.where))]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset):
            return None
        return MaxState(float(result[offset]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.max_value)


@dataclass(frozen=True, eq=False)
class Mean(ScanShareableAnalyzer):
    """Parity: Mean.scala:36-53 — (sum, count) kept separate so states merge."""
    column: str
    where: Optional[str] = None

    name = "Mean"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [has_column(self.column), is_numeric(self.column)]

    def aggregation_functions(self) -> List[Column]:
        sel = conditional_selection(_col(self.column), self.where)
        # sum natively, cast after: exact (overflow-checked) for decimal
        # inputs, identical to double-sum for float inputs
        return [F.sum(sel).cast("double"), F.count(sel)]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset, 2):
            return None
        return MeanState(float(result[offset]), int(result[offset + 1]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.metric_value)


@dataclass(frozen=True, eq=False)
class Sum(ScanShareableAnalyzer):
    """Parity: Sum.scala:36-52."""
    column: str
    where: Optional[str] = None

    name = "Sum"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [has_column(self.column), is_numeric(self.column)]

    def aggregation_functions(self) -> List[Column]:
        return [F.sum(conditional_selection(_col(self.column), self.where)).cast("double")]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset):
            return None
        return SumState(float(result[offset]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.sum_value)


class _MomentAnalyzer(ScanShareableAnalyzer):
    """Shared machinery for StdDev/Variance/Skewness/Kurtosis.

    Spark-first: metric values come from Spark's numerically-stable built-in
    moment aggregates; the mergeable Welford state (n, avg, m2[, m3[, m4]])
    is *derived* from the same single-pass result, replacing the reference's
    custom Catalyst aggregates (catalyst/StatefulStdDevPop.scala:27 etc.)
    with zero custom JVM code.
    """

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [has_column(self.column), is_numeric(self.column)]

    def _sel(self) -> Column:
        return conditional_selection(_col(self.column), self.where).cast("double")


@dataclass(frozen=True, eq=False)
class StandardDeviation(_MomentAnalyzer):
    """Population stddev. Parity: StandardDeviation.scala:25-70."""
    column: str
    where: Optional[str] = None

    name = "StandardDeviation"

    def aggregation_functions(self) -> List[Column]:
        sel = self._sel()
        return [F.count(sel), F.avg(sel), F.var_pop(sel)]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset, 3):
            return None
        n = float(result[offset])
        if n == 0:
            return None
        return StandardDeviationState(n, float(result[offset + 1]),
                                      float(result[offset + 2]) * n)

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.stddev)


@dataclass(frozen=True, eq=False)
class Variance(_MomentAnalyzer):
    """Population variance. Parity: Variance.scala:25-70."""
    column: str
    where: Optional[str] = None

    name = "Variance"

    def aggregation_functions(self) -> List[Column]:
        sel = self._sel()
        return [F.count(sel), F.avg(sel), F.var_pop(sel)]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset, 3):
            return None
        n = float(result[offset])
        if n == 0:
            return None
        return StandardDeviationState(n, float(result[offset + 1]),
                                      float(result[offset + 2]) * n)

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.variance)


@dataclass(frozen=True, eq=False)
class Skewness(_MomentAnalyzer):
    """Population skewness sqrt(n)·m3/m2^1.5. Parity: Skewness.scala:25-69."""
    column: str
    where: Optional[str] = None

    name = "Skewness"

    def aggregation_functions(self) -> List[Column]:
        sel = self._sel()
        return [F.count(sel), F.avg(sel), F.var_pop(sel), F.skewness(sel)]

    def from_aggregation_result(self, result: Row, offset: int):
        # skewness itself is NULL for zero-variance input — the state is
        # still well-defined (m3 = 0), so only require (count, avg, var)
        if not if_no_nulls_in(result, offset, 3):
            return None
        n = float(result[offset])
        if n == 0:
            return None
        avg = float(result[offset + 1])
        m2 = float(result[offset + 2]) * n
        skew = result[offset + 3]
        m3 = float(skew) * (m2 ** 1.5) / (n ** 0.5) if (skew is not None and m2 > 0) else 0.0
        return ThirdMomentState(n, avg, m2, m3)

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.skewness)


@dataclass(frozen=True, eq=False)
class Kurtosis(_MomentAnalyzer):
    """Excess kurtosis n·m4/m2² − 3. Parity: Kurtosis.scala:25-75."""
    column: str
    where: Optional[str] = None

    name = "Kurtosis"

    def aggregation_functions(self) -> List[Column]:
        sel = self._sel()
        return [F.count(sel), F.avg(sel), F.var_pop(sel), F.skewness(sel), F.kurtosis(sel)]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset, 3):
            return None
        n = float(result[offset])
        if n == 0:
            return None
        avg = float(result[offset + 1])
        m2 = float(result[offset + 2]) * n
        skew = result[offset + 3]
        kurt = result[offset + 4]
        m3 = float(skew) * (m2 ** 1.5) / (n ** 0.5) if (skew is not None and m2 > 0) else 0.0
        m4 = (float(kurt) + 3.0) * m2 * m2 / n if (kurt is not None and m2 > 0) else 0.0
        return FourthMomentState(n, avg, m2, m3, m4)

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.kurtosis)


@dataclass(frozen=True, eq=False)
class Correlation(ScanShareableAnalyzer):
    """Pearson correlation. Parity: Correlation.scala:26-79."""
    first_column: str
    second_column: str
    where: Optional[str] = None

    name = "Correlation"
    entity = Entity.MULTICOLUMN

    @property
    def instance(self) -> str:
        return f"{self.first_column},{self.second_column}"

    def preconditions(self):
        return [has_column(self.first_column), is_numeric(self.first_column),
                has_column(self.second_column), is_numeric(self.second_column)]

    def columns_referenced(self):
        return None if self.where else [self.first_column, self.second_column]

    def aggregation_functions(self) -> List[Column]:
        # rows where either side is null are excluded (pairwise deletion),
        # matching Spark's corr and the reference's StatefulCorrelation
        both = F.expr(
            f"`{self.first_column}` IS NOT NULL AND `{self.second_column}` IS NOT NULL")
        cond = both if self.where is None else (both & F.expr(self.where))
        x = F.when(cond, _col(self.first_column)).cast("double")
        y = F.when(cond, _col(self.second_column)).cast("double")
        return [F.count(x), F.avg(x), F.avg(y),
                F.covar_pop(x, y), F.var_pop(x), F.var_pop(y)]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset, 6):
            return None
        n = float(result[offset])
        if n == 0:
            return None
        return CorrelationState(
            n, float(result[offset + 1]), float(result[offset + 2]),
            float(result[offset + 3]) * n, float(result[offset + 4]) * n,
            float(result[offset + 5]) * n)

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.correlation)


@dataclass(frozen=True, eq=False)
class ZerosCount(ScanShareableAnalyzer):
    """Number of zero values. Parity: ZerosCount.scala:25-48."""
    column: str
    where: Optional[str] = None

    name = "ZerosCount"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [has_column(self.column), is_numeric(self.column)]

    def aggregation_functions(self) -> List[Column]:
        sel = conditional_selection(_col(self.column), self.where)
        return [F.sum(F.when(sel == 0, 1).otherwise(0)).cast("long")]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset):
            return None
        return NumMatches(int(result[offset]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance,
                            float(state.num_matches))


@dataclass(frozen=True, eq=False)
class RatioOfSums(ScanShareableAnalyzer):
    """sum(numerator)/sum(denominator). Parity: RatioOfSums.scala:54-85."""
    numerator: str
    denominator: str
    where: Optional[str] = None

    name = "RatioOfSums"
    entity = Entity.MULTICOLUMN

    @property
    def instance(self) -> str:
        return f"{self.numerator},{self.denominator}"

    def preconditions(self):
        return [has_column(self.numerator), is_numeric(self.numerator),
                has_column(self.denominator), is_numeric(self.denominator)]

    def columns_referenced(self):
        return None if self.where else [self.numerator, self.denominator]

    def aggregation_functions(self) -> List[Column]:
        return [
            F.sum(conditional_selection(_col(self.numerator), self.where)).cast("double"),
            F.sum(conditional_selection(_col(self.denominator), self.where)).cast("double"),
        ]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset, 2):
            return None
        return _RatioState(float(result[offset]), float(result[offset + 1]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        if state.denominator == 0:
            return self.to_failure_metric(
                ZeroDivisionError("sum of denominator is zero"))
        return DoubleMetric(self.entity, self.name, self.instance,
                            state.numerator / state.denominator)


@dataclass(frozen=True)
class _RatioState(State):
    numerator: float
    denominator: float

    def merge(self, other):
        return _RatioState(self.numerator + other.numerator,
                           self.denominator + other.denominator)


@dataclass(frozen=True)
class RangeState(State):
    min_value: float
    max_value: float

    def merge(self, other):
        return RangeState(min(self.min_value, other.min_value),
                          max(self.max_value, other.max_value))


@dataclass(frozen=True, eq=False)
class ColumnRange(ScanShareableAnalyzer):
    """max − min. Parity: Range.scala:25-72 (metricValue = max − min)."""
    column: str
    where: Optional[str] = None

    name = "Range"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [has_column(self.column), is_numeric(self.column)]

    def aggregation_functions(self) -> List[Column]:
        sel = conditional_selection(_col(self.column), self.where)
        return [F.min(sel).cast("double"), F.max(sel).cast("double")]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset, 2):
            return None
        return RangeState(float(result[offset]), float(result[offset + 1]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance,
                            state.max_value - state.min_value)


@dataclass(frozen=True)
class _QuantileState(State):
    """Exact-quantile states don't merge algebraically — recompute instead."""
    value: Any

    def merge(self, other):
        raise NotImplementedError(
            "Exact quantiles have no mergeable state; recompute on the union "
            "or use ApproxQuantile (mergeable sketch).")


@dataclass(frozen=True, eq=False)
class ExactQuantile(ScanShareableAnalyzer):
    """Exact percentile (linear interpolation). Parity: ExactQuantile.scala:42-83."""
    column: str
    quantile: float
    where: Optional[str] = None

    name = "ExactQuantile"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        def valid_q(schema):
            if not (0.0 <= self.quantile <= 1.0):
                raise ValueError("quantile must be in [0, 1]")
        return [has_column(self.column), is_numeric(self.column), valid_q]

    def aggregation_functions(self) -> List[Column]:
        sel = conditional_selection(_col(self.column), self.where).cast("double")
        return [F.percentile(sel, F.lit(self.quantile))]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset):
            return None
        return _QuantileState(float(result[offset]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.value)


@dataclass(frozen=True, eq=False)
class InterquartileRange(ScanShareableAnalyzer):
    """p75 − p25, exact. Parity: InterquartileRange.scala:53-94."""
    column: str
    where: Optional[str] = None

    name = "InterquartileRange"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [has_column(self.column), is_numeric(self.column)]

    def aggregation_functions(self) -> List[Column]:
        sel = conditional_selection(_col(self.column), self.where).cast("double")
        return [F.percentile(sel, F.array(F.lit(0.25), F.lit(0.75)))]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset):
            return None
        q25, q75 = result[offset]
        if q25 is None or q75 is None:
            return None
        return _QuantileState(float(q75) - float(q25))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.value)


@dataclass
class ApproxQuantileState(State):
    """MERGEABLE quantile state — a KLL sketch over the column (parity:
    ApproxQuantileState's percentileDigest, which merges across
    partitions/snapshots; we back it with the same KLL core the KLLSketch
    analyzer uses — identical rank-error class to the digest).

    The FUSED scan path keeps Spark's ``approx_percentile`` (JVM-side,
    whole-stage-codegen) and yields a scalar `_QuantileState` snapshot;
    this sketch state comes from ``compute_state_from`` and is the one to
    persist when incremental merging is needed
    (IncrementalAnalyzerTest.scala:177-201)."""

    sketch: Any

    def merge(self, other: "ApproxQuantileState") -> "ApproxQuantileState":
        return ApproxQuantileState(self.sketch.merge(other.sketch))


def _quantile_param_checks(quantiles, relative_error: float):
    """Parity: ApproxQuantile.scala:58-67 PARAM_CHECKS — quantile and
    relativeError must both lie in the closed interval [0, 1]; violations
    become failure metrics via preconditions (AnalysisTest.scala:237-262),
    with the reference's exact messages."""
    from .base import IllegalAnalyzerParameterError

    def check(schema) -> None:
        for q in quantiles:
            if q < 0.0 or q > 1.0:
                raise IllegalAnalyzerParameterError(
                    "Quantile parameter must be in the closed interval "
                    f"[0, 1]. Currently, the value is: {q}!")
        if relative_error < 0.0 or relative_error > 1.0:
            raise IllegalAnalyzerParameterError(
                "Relative error parameter must be in the closed interval "
                f"[0, 1]. Currently, the value is: {relative_error}!")
    return check


def _quantile_sketch_state(df, column: str, where: Optional[str],
                           relative_error: float):
    """One Arrow pass building the mergeable KLL-backed quantile state."""
    from .kll import KLLParameters, KLLSketch, compute_kll_states
    data = df.filter(where) if where is not None else df
    # sketch size from the requested error: k ≈ 2/ε bounds rank error ~ε
    k = max(2048, int(2.0 / max(relative_error, 1e-6)))
    probe = KLLSketch(column, KLLParameters(sketch_size=k))
    state = compute_kll_states(data, [probe]).get(probe)
    if state is None or state.sketch.count == 0:
        return None
    return ApproxQuantileState(state.sketch)


@dataclass(frozen=True, eq=False)
class ApproxQuantile(ScanShareableAnalyzer):
    """Approximate quantile (Greenwald-Khanna via Spark's approx_percentile).
    Parity: ApproxQuantile.scala:50-75; default relativeError 0.01 (:53)."""
    column: str
    quantile: float
    relative_error: float = 0.01
    where: Optional[str] = None

    @property
    def name(self) -> str:
        """Metric name embeds the quantile — ApproxQuantile.scala:97
        emits s"ApproxQuantile-$quantile" (AnalysisTest.scala:139 asserts
        "ApproxQuantile-0.5")."""
        return f"ApproxQuantile-{self.quantile}"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [_quantile_param_checks((self.quantile,), self.relative_error),
                has_column(self.column), is_numeric(self.column)]

    def aggregation_functions(self) -> List[Column]:
        sel = conditional_selection(_col(self.column), self.where).cast("double")
        accuracy = int(1.0 / max(self.relative_error, 1e-6))
        return [F.approx_percentile(sel, F.lit(self.quantile), F.lit(accuracy))]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset):
            return None
        return _QuantileState(float(result[offset]))

    def compute_state_from(self, df):
        """Standalone state is the MERGEABLE sketch (see
        ApproxQuantileState); the fused runner path stays on
        approx_percentile."""
        return _quantile_sketch_state(df, self.column, self.where,
                                      self.relative_error)

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        value = (state.sketch.quantile(self.quantile)
                 if isinstance(state, ApproxQuantileState) else state.value)
        return DoubleMetric(self.entity, self.name, self.instance,
                            float(value))


@dataclass(frozen=True, eq=False)
class ApproxQuantiles(ScanShareableAnalyzer):
    """Many quantiles, one digest. Parity: ApproxQuantiles.scala:39-95."""
    column: str
    quantiles: Tuple[float, ...]
    relative_error: float = 0.01
    where: Optional[str] = None

    name = "ApproxQuantiles"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [_quantile_param_checks(self.quantiles, self.relative_error),
                has_column(self.column), is_numeric(self.column)]

    def aggregation_functions(self) -> List[Column]:
        sel = conditional_selection(_col(self.column), self.where).cast("double")
        accuracy = int(1.0 / max(self.relative_error, 1e-6))
        qs = F.array(*[F.lit(q) for q in self.quantiles])
        return [F.approx_percentile(sel, qs, F.lit(accuracy))]

    def from_aggregation_result(self, result: Row, offset: int):
        if not if_no_nulls_in(result, offset):
            return None
        return _QuantileState(
            {str(q): float(v) for q, v in zip(self.quantiles, result[offset])})

    def compute_state_from(self, df):
        """Mergeable sketch state, as for ApproxQuantile."""
        return _quantile_sketch_state(df, self.column, self.where,
                                      self.relative_error)

    def compute_metric_from_state(self, state) -> Metric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        if isinstance(state, ApproxQuantileState):
            value = {str(q): float(state.sketch.quantile(q))
                     for q in self.quantiles}
        else:
            value = state.value
        return KeyedDoubleMetric(self.entity, self.name, self.instance, value)


@dataclass(frozen=True)
class ApproxCountDistinctState(State):
    """HLL sketch bytes (Spark 3.5 hll_sketch_agg) — truly mergeable across
    runs via hll_union, unlike a plain approx count. ``estimate`` is cached
    when the fused scan already computed it; None after a merge."""
    sketch_bytes: bytes
    estimate: Optional[float] = None

    def merge(self, other):
        from .hll import merge_hll_sketches
        # empty sketch (zero rows seen) is the semigroup identity
        if not self.sketch_bytes:
            return other
        if not other.sketch_bytes:
            return self
        return ApproxCountDistinctState(
            merge_hll_sketches(self.sketch_bytes, other.sketch_bytes))


@dataclass(frozen=True, eq=False)
class ApproxCountDistinct(ScanShareableAnalyzer):
    """HLL++ distinct estimate. Parity: ApproxCountDistinct.scala:26-70,
    catalyst/StatefulHyperloglogPlus.scala:37-191 (relativeSD=0.05 at :158).

    Spark-first: uses the built-in DataSketches HLL (hll_sketch_agg, Spark
    3.5+) so the state is a mergeable binary sketch — no hand-rolled word
    arrays (HLLConstants.scala) needed.
    """
    column: str
    where: Optional[str] = None

    name = "ApproxCountDistinct"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [has_column(self.column), is_not_nested(self.column)]

    def _selection(self) -> Column:
        # hll_sketch_agg accepts int/long/string/binary only — canonical
        # string form for every other type (float, double, decimal, date…)
        sel = conditional_selection(_col(self.column), self.where)
        return sel.cast("string")

    def aggregation_functions(self) -> List[Column]:
        sel = self._selection()
        # lgConfigK=12 ≈ relative error 0.0163 ≤ reference's 0.05 contract.
        # Catalyst de-duplicates the identical hll_sketch_agg, so the
        # estimate costs nothing extra in the fused scan.
        return [F.hll_sketch_agg(sel, F.lit(12)),
                F.hll_sketch_estimate(F.hll_sketch_agg(sel, F.lit(12)))]

    def from_aggregation_result(self, result: Row, offset: int):
        if result[offset] is None:
            # empty/all-NULL input: the reference's HLL++ yields an empty
            # sketch estimating 0.0 (StatefulHyperloglogPlus), not a failure
            return ApproxCountDistinctState(b"", 0.0)
        return ApproxCountDistinctState(bytes(result[offset]),
                                        float(result[offset + 1]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        est = state.estimate
        if est is None:
            if not state.sketch_bytes:
                est = 0.0
            else:
                from .hll import estimate_hll
                est = float(estimate_hll(state.sketch_bytes))
        return DoubleMetric(self.entity, self.name, self.instance, est)


# --- data-type inference ----------------------------------------------------

class DataTypeInstances(str, Enum):
    UNKNOWN = "Unknown"
    FRACTIONAL = "Fractional"
    INTEGRAL = "Integral"
    BOOLEAN = "Boolean"
    STRING = "String"


# Parity: catalyst/StatefulDataType.scala:37-39 (regexes)
FRACTIONAL_RE = r"^(-|\+)? ?\d+((\.\d+)|((?:\.\d+)?[Ee][-+]?\d+))$"
INTEGRAL_RE = r"^(-|\+)? ?\d+$"
BOOLEAN_RE = r"^(true|false)$"


@dataclass(frozen=True)
class DataTypeHistogram(State):
    num_null: int
    num_fractional: int
    num_integral: int
    num_boolean: int
    num_string: int

    def merge(self, other):
        return DataTypeHistogram(
            self.num_null + other.num_null,
            self.num_fractional + other.num_fractional,
            self.num_integral + other.num_integral,
            self.num_boolean + other.num_boolean,
            self.num_string + other.num_string)

    def to_distribution(self) -> Distribution:
        total = (self.num_null + self.num_fractional + self.num_integral
                 + self.num_boolean + self.num_string)
        total = max(total, 1)
        vals = {
            DataTypeInstances.UNKNOWN.value: DistributionValue(self.num_null, self.num_null / total),
            DataTypeInstances.FRACTIONAL.value: DistributionValue(self.num_fractional, self.num_fractional / total),
            DataTypeInstances.INTEGRAL.value: DistributionValue(self.num_integral, self.num_integral / total),
            DataTypeInstances.BOOLEAN.value: DistributionValue(self.num_boolean, self.num_boolean / total),
            DataTypeInstances.STRING.value: DistributionValue(self.num_string, self.num_string / total),
        }
        return Distribution(vals, number_of_bins=5)


def determine_type(dist: Distribution) -> DataTypeInstances:
    """Decision rule. Parity: DataType.scala:118-143."""
    def ratio(key: DataTypeInstances) -> float:
        dv = dist.values.get(key.value)
        return dv.ratio if dv else 0.0

    if ratio(DataTypeInstances.UNKNOWN) == 1.0:
        return DataTypeInstances.UNKNOWN
    if ratio(DataTypeInstances.STRING) > 0.0 or (
            ratio(DataTypeInstances.BOOLEAN) > 0.0 and
            (ratio(DataTypeInstances.INTEGRAL) > 0.0 or
             ratio(DataTypeInstances.FRACTIONAL) > 0.0)):
        return DataTypeInstances.STRING
    if ratio(DataTypeInstances.BOOLEAN) > 0.0:
        return DataTypeInstances.BOOLEAN
    if ratio(DataTypeInstances.FRACTIONAL) > 0.0:
        return DataTypeInstances.FRACTIONAL
    return DataTypeInstances.INTEGRAL


@dataclass(frozen=True, eq=False)
class DataType(ScanShareableAnalyzer):
    """Per-row type-inference histogram. Parity: DataType.scala:153-189.

    Spark-first: pure ``rlike`` sums instead of the reference's UDAF
    (catalyst/StatefulDataType.scala) — stays in whole-stage codegen.
    """
    column: str
    where: Optional[str] = None

    name = "DataType"

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [has_column(self.column), is_not_nested(self.column)]

    def aggregation_functions(self) -> List[Column]:
        sel = conditional_selection(_col(self.column).cast("string"), self.where)
        in_scope = (F.expr(self.where).cast("long") if self.where
                    else F.lit(1).cast("long"))
        is_null = F.sum(F.when(sel.isNull() & (in_scope == 1), 1).otherwise(0))
        frac = F.sum(sel.rlike(FRACTIONAL_RE).cast("long"))
        integ = F.sum(sel.rlike(INTEGRAL_RE).cast("long"))
        boolean = F.sum(sel.rlike(BOOLEAN_RE).cast("long"))
        total = conditional_count(self.where)
        return [is_null, frac, integ, boolean, total]

    def from_aggregation_result(self, result: Row, offset: int):
        if result[offset] is None:
            return None
        num_null = int(result[offset])
        frac = int(result[offset + 1] or 0)
        integ = int(result[offset + 2] or 0)
        boolean = int(result[offset + 3] or 0)
        total = int(result[offset + 4] or 0)
        num_string = total - num_null - frac - integ - boolean
        return DataTypeHistogram(num_null, frac, integ, boolean, num_string)

    def compute_metric_from_state(self, state) -> Metric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return HistogramMetric(Entity.COLUMN, self.name, self.instance,
                               state.to_distribution())


@dataclass(frozen=True, eq=False)
class ColumnCount(Analyzer):
    """Number of columns. Parity: ColumnCount.scala:24-60."""

    name = "ColumnCount"
    entity = Entity.DATASET

    @property
    def instance(self) -> str:
        return "*"

    def compute_state_from(self, df: DataFrame):
        return NumMatches(len(df.columns))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance,
                            float(state.num_matches))


@dataclass(frozen=True, eq=False)
class ColumnExists(Analyzer):
    """1.0 iff column present. Parity: ColumnExists.scala:29-64."""
    column: str

    name = "ColumnExists"

    @property
    def instance(self) -> str:
        return self.column

    def compute_state_from(self, df: DataFrame):
        return NumMatches(1 if self.column in df.columns else 0)

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance,
                            float(state.num_matches))


@dataclass(frozen=True, eq=False)
class CustomSql(Analyzer):
    """Arbitrary SQL producing exactly one numeric cell.
    Parity: CustomSql.scala:40-95; ``disambiguator`` overrides the metric
    instance so two statements don't collide in the metric map
    (CustomSqlTest.scala:89-104)."""
    expression: str
    disambiguator: Optional[str] = None

    name = "CustomSQL"
    entity = Entity.DATASET

    @property
    def instance(self) -> str:
        # the reference's default disambiguator is "*"
        # (CustomSql.scala:40) — the metric reads Dataset.*.CustomSQL
        return self.disambiguator if self.disambiguator is not None else "*"

    def compute_state_from(self, df: DataFrame):
        spark = df.sparkSession
        df.createOrReplaceTempView("primary")
        result = spark.sql(self.expression)
        if len(result.columns) != 1:
            raise ValueError("Custom SQL did not return exactly one column")
        rows = result.limit(2).collect()
        if len(rows) != 1:
            raise ValueError("Custom SQL did not return exactly one row")
        return SumState(float(rows[0][0]))

    def compute_metric_from_state(self, state) -> DoubleMetric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        return DoubleMetric(self.entity, self.name, self.instance, state.sum_value)


@dataclass(frozen=True)
class AggregatedMetricState:
    """The reference's CustomAggregator state shape: attribute COUNTS plus
    a total, rendered as count/total ratios in the metric
    (analyzers/CustomAggregator.scala AggregatedMetricState). Counts and
    totals merge additively, so merged partitions yield exact combined
    ratios — merging the ratios themselves would not."""
    counts: Dict[str, int]
    total: int

    def merge(self, other: "AggregatedMetricState") -> "AggregatedMetricState":
        merged = dict(self.counts)
        for k, v in other.counts.items():
            merged[k] = merged.get(k, 0) + v
        return AggregatedMetricState(merged, self.total + other.total)

    @property
    def ratios(self) -> Dict[str, float]:
        if self.total <= 0:
            raise ValueError("Metric computation failed: total is not positive")
        return {k: v / self.total for k, v in self.counts.items()}


@dataclass(frozen=True, eq=False)
class CustomAggregator(Analyzer):
    """User-supplied DataFrame → aggregation → keyed metric.
    Parity: CustomAggregator.scala:40-75. The function may return either a
    plain ``{key: value}`` dict (values reported as-is) or an
    ``AggregatedMetricState(counts, total)`` (reported as count/total
    ratios, the reference contract)."""
    agg_function: Callable[[DataFrame], Any]
    instance_name: str = "custom"

    name = "CustomAggregator"
    entity = Entity.DATASET

    @property
    def instance(self) -> str:
        return self.instance_name

    def _key(self):
        return (type(self).__name__, self.instance_name, id(self.agg_function))

    def compute_state_from(self, df: DataFrame):
        result = self.agg_function(df)
        if isinstance(result, AggregatedMetricState):
            return result
        return _KeyedState(dict(result))

    def compute_metric_from_state(self, state) -> Metric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        values = (state.ratios if isinstance(state, AggregatedMetricState)
                  else state.values)
        return KeyedDoubleMetric(self.entity, self.name, self.instance, values)


@dataclass(frozen=True)
class _KeyedState(State):
    values: Any

    def merge(self, other):
        merged = dict(self.values)
        for k, v in other.values.items():
            merged[k] = merged.get(k, 0.0) + v
        return _KeyedState(merged)
