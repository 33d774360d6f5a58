"""Analyzer core: State algebra + Analyzer base classes.

Reference parity: ``com.amazon.deequ.analyzers.Analyzer``
(/root/reference/src/main/scala/com/amazon/deequ/analyzers/Analyzer.scala:40-160,
333-444, 494-567).

Design (Spark-first, NOT a port of the Scala class hierarchy):
  * A *State* is a mergeable sufficient statistic (commutative semigroup,
    ``merge``) — lives on the driver as a tiny dataclass; the distributed
    part of the computation is always a Spark aggregate expression.
  * A *ScanShareableAnalyzer* contributes ``aggregation_functions()`` —
    a list of ``pyspark.sql.Column`` aggregate expressions. The runner
    fuses ALL analyzers' expressions into ONE ``df.agg(...)`` call
    (offset-based slicing, parity AnalysisRunner.scala:355-371), so N
    analyzers cost a single pass over 100 TB.
  * ``where`` filters are compiled INTO the aggregates via ``F.when`` so
    differently-filtered analyzers still share one scan
    (parity Analyzer.scala:494-567).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..metrics import DoubleMetric, Entity, Metric, metric_from_failure

# ---------------------------------------------------------------------------
# Preconditions (parity: Analyzer.scala:333-444)
# ---------------------------------------------------------------------------

NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


class PreconditionError(ValueError):
    pass


class NoSuchColumnError(PreconditionError):
    pass


class WrongColumnTypeError(PreconditionError):
    pass


class EmptyStateError(ValueError):
    """Raised when a metric is requested from an empty (no-data) state."""


class IllegalAnalyzerParameterError(PreconditionError):
    """Parity: runners.IllegalAnalyzerParameterException — an analyzer was
    constructed with an out-of-range parameter; surfaces as a failure
    metric through the precondition machinery, never as a thrown error
    from the run (AnalysisTest.scala:228-262)."""


def _case_sensitive_resolution() -> bool:
    """Mirror of Analyzer.scala:340-343 — column lookups follow the
    session's spark.sql.caseSensitive (default false)."""
    try:
        from pyspark.sql import SparkSession
        session = SparkSession.getActiveSession()
        if session is not None:
            return session.conf.get(
                "spark.sql.caseSensitive", "false").lower() == "true"
    except Exception:
        pass
    return False


def find_field(schema: T.StructType, column: str) -> T.StructField:
    # Accept user-quoted names ("`item.one`") like the reference, whose
    # analyzers resolve them through Spark (AnalysisTest.scala:63-86)
    lookup = (column[1:-1] if len(column) >= 2 and column.startswith("`")
              and column.endswith("`") else column)
    for f in schema.fields:
        if f.name == lookup:
            return f
    if not _case_sensitive_resolution():  # Analyzer.scala:354-361
        for f in schema.fields:
            if f.name.lower() == lookup.lower():
                return f
    raise NoSuchColumnError(f"Input data does not include column {column}!")


def has_column(column: str):
    def check(schema: T.StructType) -> None:
        find_field(schema, column)
    return check


def is_numeric(column: str):
    def check(schema: T.StructType) -> None:
        f = find_field(schema, column)
        if not isinstance(f.dataType, NUMERIC_TYPES):
            raise WrongColumnTypeError(
                f"Expected type of column {column} to be one of numeric types, "
                f"but found {f.dataType.simpleString()} instead!")
    return check


def is_string(column: str):
    def check(schema: T.StructType) -> None:
        f = find_field(schema, column)
        if not isinstance(f.dataType, T.StringType):
            raise WrongColumnTypeError(
                f"Expected type of column {column} to be StringType, "
                f"but found {f.dataType.simpleString()} instead!")
    return check


def is_not_nested(column: str):
    def check(schema: T.StructType) -> None:
        f = find_field(schema, column)
        if isinstance(f.dataType, (T.StructType, T.MapType, T.ArrayType)):
            raise WrongColumnTypeError(
                f"Unsupported nested column type of column {column}: "
                f"{f.dataType.simpleString()}!")
    return check


# ---------------------------------------------------------------------------
# where-filter plumbing (parity: Analyzer.scala:494-567)
# ---------------------------------------------------------------------------

def conditional_selection(col: Column, where: Optional[str]) -> Column:
    """Project ``col`` only where the filter holds (else NULL)."""
    if where is None:
        return col
    return F.when(F.expr(where), col)


def conditional_count(where: Optional[str]) -> Column:
    if where is None:
        return F.count(F.lit(1))
    return F.sum(F.expr(where).cast("long"))


def if_no_nulls_in(result: Row, offset: int, how_many: int = 1) -> bool:
    return all(result[offset + i] is not None for i in range(how_many))


# ---------------------------------------------------------------------------
# States
# ---------------------------------------------------------------------------

class State(ABC):
    """Mergeable sufficient statistic (parity: Analyzer.scala:40-58)."""

    @abstractmethod
    def merge(self, other: "State") -> "State":
        ...

    def __add__(self, other):
        return self.merge(other)


@dataclass(frozen=True)
class NumMatchesAndCount(State):
    """(matches, count) → ratio metric (Analyzer.scala:172-190)."""
    num_matches: int
    count: int

    def merge(self, other: "NumMatchesAndCount") -> "NumMatchesAndCount":
        return NumMatchesAndCount(self.num_matches + other.num_matches,
                                  self.count + other.count)

    @property
    def metric_value(self) -> float:
        if self.count == 0:
            raise EmptyStateError("Empty state (no rows) — cannot compute metric")
        return self.num_matches / self.count


@dataclass(frozen=True)
class NumMatches(State):
    num_matches: int

    def merge(self, other: "NumMatches") -> "NumMatches":
        return NumMatches(self.num_matches + other.num_matches)


@dataclass(frozen=True)
class MinState(State):
    min_value: float

    def merge(self, other: "MinState") -> "MinState":
        return MinState(min(self.min_value, other.min_value))


@dataclass(frozen=True)
class MaxState(State):
    max_value: float

    def merge(self, other: "MaxState") -> "MaxState":
        return MaxState(max(self.max_value, other.max_value))


@dataclass(frozen=True)
class SumState(State):
    sum_value: float

    def merge(self, other: "SumState") -> "SumState":
        return SumState(self.sum_value + other.sum_value)


@dataclass(frozen=True)
class MeanState(State):
    total: float
    count: int

    def merge(self, other: "MeanState") -> "MeanState":
        return MeanState(self.total + other.total, self.count + other.count)

    @property
    def metric_value(self) -> float:
        if self.count == 0:
            raise EmptyStateError("Empty state (no rows) — cannot compute mean")
        return self.total / self.count


@dataclass(frozen=True)
class StandardDeviationState(State):
    """Welford-style mergeable (n, avg, m2) (parity: Analyzer.scala:240-260).

    Built from Spark's stable ``var_pop``/``avg`` built-ins rather than a
    custom Catalyst aggregate; merged with the parallel-Welford combine.
    """
    n: float
    avg: float
    m2: float

    def merge(self, other: "StandardDeviationState") -> "StandardDeviationState":
        n = self.n + other.n
        delta = other.avg - self.avg
        avg = self.avg + delta * other.n / n
        m2 = self.m2 + other.m2 + delta * delta * self.n * other.n / n
        return StandardDeviationState(n, avg, m2)

    @property
    def stddev(self) -> float:
        return (self.m2 / self.n) ** 0.5

    @property
    def variance(self) -> float:
        return self.m2 / self.n


@dataclass(frozen=True)
class ThirdMomentState(State):
    """(n, avg, m2, m3) for Skewness (parity: Skewness.scala:25-45)."""
    n: float
    avg: float
    m2: float
    m3: float

    def merge(self, other: "ThirdMomentState") -> "ThirdMomentState":
        n = self.n + other.n
        d = other.avg - self.avg
        avg = self.avg + d * other.n / n
        m2 = self.m2 + other.m2 + d * d * self.n * other.n / n
        m3 = (self.m3 + other.m3
              + d ** 3 * self.n * other.n * (self.n - other.n) / (n * n)
              + 3.0 * d * (self.n * other.m2 - other.n * self.m2) / n)
        return ThirdMomentState(n, avg, m2, m3)

    @property
    def skewness(self) -> float:
        # all values identical → 0.0, not an error (Skewness.scala:36-40)
        if self.m2 == 0:
            return 0.0
        return (self.n ** 0.5) * self.m3 / (self.m2 ** 1.5)


@dataclass(frozen=True)
class FourthMomentState(State):
    """(n, avg, m2, m3, m4) for Kurtosis (parity: Kurtosis.scala:25-50)."""
    n: float
    avg: float
    m2: float
    m3: float
    m4: float

    def merge(self, other: "FourthMomentState") -> "FourthMomentState":
        n = self.n + other.n
        d = other.avg - self.avg
        avg = self.avg + d * other.n / n
        m2 = self.m2 + other.m2 + d * d * self.n * other.n / n
        m3 = (self.m3 + other.m3
              + d ** 3 * self.n * other.n * (self.n - other.n) / (n * n)
              + 3.0 * d * (self.n * other.m2 - other.n * self.m2) / n)
        m4 = (self.m4 + other.m4
              + d ** 4 * self.n * other.n
              * (self.n ** 2 - self.n * other.n + other.n ** 2) / (n ** 3)
              + 6.0 * d * d * (self.n ** 2 * other.m2 + other.n ** 2 * self.m2) / (n * n)
              + 4.0 * d * (self.n * other.m3 - other.n * self.m3) / n)
        return FourthMomentState(n, avg, m2, m3, m4)

    @property
    def kurtosis(self) -> float:
        # all values identical → 0.0, not an error (Kurtosis.scala:36-39)
        if self.m2 == 0:
            return 0.0
        return self.n * self.m4 / (self.m2 * self.m2) - 3.0


@dataclass(frozen=True)
class CorrelationState(State):
    """(n, xAvg, yAvg, ck, xMk, yMk) (parity: Correlation.scala:26-60)."""
    n: float
    x_avg: float
    y_avg: float
    ck: float
    x_mk: float
    y_mk: float

    def merge(self, other: "CorrelationState") -> "CorrelationState":
        n = self.n + other.n
        dx = other.x_avg - self.x_avg
        dy = other.y_avg - self.y_avg
        x_avg = self.x_avg + dx * other.n / n
        y_avg = self.y_avg + dy * other.n / n
        ck = self.ck + other.ck + dx * dy * self.n * other.n / n
        x_mk = self.x_mk + other.x_mk + dx * dx * self.n * other.n / n
        y_mk = self.y_mk + other.y_mk + dy * dy * self.n * other.n / n
        return CorrelationState(n, x_avg, y_avg, ck, x_mk, y_mk)

    @property
    def correlation(self) -> float:
        # zero variance → NaN, not an error: the reference's Scala double
        # division yields Success(NaN) and its own CheckTest asserts
        # hasCorrelation(..., isNaN) SUCCEEDS on a constant column
        # (CheckTest.scala:973-976 contextUninformative)
        denom = (self.x_mk * self.y_mk) ** 0.5
        if denom == 0:
            return float("nan")
        return self.ck / denom


# ---------------------------------------------------------------------------
# Analyzer base classes
# ---------------------------------------------------------------------------

class Analyzer(ABC):
    """Computes a State from data, renders a Metric from the State.

    Identity matters: the runner de-duplicates analyzers by equality
    (parity AnalysisRunner.scala:117-120) — subclasses are dataclasses or
    define ``_key()``.
    """

    name: str = "Analyzer"
    entity: Entity = Entity.COLUMN

    @property
    @abstractmethod
    def instance(self) -> str:
        ...

    def preconditions(self) -> List[Any]:
        return []

    def additional_preconditions(self) -> List[Any]:
        return []

    # --- standalone computation path -------------------------------------
    @abstractmethod
    def compute_state_from(self, df: DataFrame) -> Optional[State]:
        ...

    @abstractmethod
    def compute_metric_from_state(self, state: Optional[State]) -> Metric:
        ...

    def to_failure_metric(self, exc: BaseException) -> Metric:
        return metric_from_failure(exc, self.name, self.instance, self.entity)

    def calculate(self, df: DataFrame) -> Metric:
        """Run this analyzer alone (parity Analyzer.scala:126-147).

        Prefer ``AnalysisRunner.do_analysis_run`` which fuses many
        analyzers into one pass.
        """
        try:
            for check in self.preconditions():
                check(df.schema)
            state = self.compute_state_from(df)
            return self.compute_metric_from_state(state)
        except Exception as exc:  # noqa: BLE001 — metric carries the error
            return self.to_failure_metric(exc)

    # --- identity ---------------------------------------------------------
    def _key(self):
        return (type(self).__name__,) + tuple(sorted(self.__dict__.items()))

    def __eq__(self, other):
        return type(self) is type(other) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def __repr__(self):
        args = ", ".join(f"{k}={v!r}" for k, v in self.__dict__.items())
        return f"{type(self).__name__}({args})"


class ScanShareableAnalyzer(Analyzer):
    """Analyzer expressible as aggregate Columns over one scan
    (parity: Analyzer.scala:162-200)."""

    @abstractmethod
    def aggregation_functions(self) -> List[Column]:
        ...

    @abstractmethod
    def from_aggregation_result(self, result: Row, offset: int) -> Optional[State]:
        ...

    def columns_referenced(self) -> Optional[List[str]]:
        """Columns this analyzer reads, for scan pruning; None = unknown/all."""
        col = getattr(self, "column", None)
        where = getattr(self, "where", None)
        if col is None or where is not None:
            return None
        return [col]

    def compute_state_from(self, df: DataFrame) -> Optional[State]:
        aggs = self.aggregation_functions()
        result = df.agg(*aggs).collect()[0]
        return self.from_aggregation_result(result, 0)

    def metric_from_aggregation_result(self, result: Row, offset: int) -> Metric:
        try:
            state = self.from_aggregation_result(result, offset)
            return self.compute_metric_from_state(state)
        except Exception as exc:  # noqa: BLE001
            return self.to_failure_metric(exc)

