"""Constraints — assertions over metrics.

Reference parity: /root/reference/src/main/scala/com/amazon/deequ/
constraints/{Constraint,AnalysisBasedConstraint}.scala
(AnalysisBasedConstraint.scala:43-135: look up the analyzer's metric,
apply optional value picker, run the assertion lambda).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable, Dict, Optional

from .analyzers.base import Analyzer
from .metrics import Metric


class ConstraintStatus(str, Enum):
    SUCCESS = "Success"
    FAILURE = "Failure"


@dataclass
class ConstraintResult:
    constraint: "Constraint"
    status: ConstraintStatus
    message: Optional[str] = None
    metric: Optional[Metric] = None


class Constraint:
    """Base constraint."""

    def __init__(self, name: str, hint: Optional[str] = None):
        self.name = name
        self.hint = hint

    def evaluate(self, metric_map: Dict[Analyzer, Metric]) -> ConstraintResult:
        raise NotImplementedError

    @property
    def required_analyzers(self):
        return []

    def __repr__(self):
        return self.name


# exact reference wording (AnalysisBasedConstraint.scala:137-139)
MISSING_ANALYSIS_MSG = "Missing Analysis, can't run the constraint!"
ASSERTION_EXCEPTION_MSG = "Can't execute the assertion"
PROBLEMATIC_PICKER_MSG = "Can't retrieve the value to assert on"


class AnalysisBasedConstraint(Constraint):
    """Constraint over one analyzer's metric
    (parity: AnalysisBasedConstraint.scala:43-135)."""

    def __init__(self, analyzer: Analyzer,
                 assertion: Callable[[Any], bool],
                 value_picker: Optional[Callable[[Any], Any]] = None,
                 hint: Optional[str] = None,
                 name: Optional[str] = None):
        super().__init__(
            name or f"{type(self).__name__}({analyzer.name}({analyzer.instance}))",
            hint)
        self.analyzer = analyzer
        self.assertion = assertion
        self.value_picker = value_picker

    @property
    def required_analyzers(self):
        return [self.analyzer]

    def evaluate(self, metric_map: Dict[Analyzer, Metric]) -> ConstraintResult:
        metric = metric_map.get(self.analyzer)
        if metric is None:
            return ConstraintResult(self, ConstraintStatus.FAILURE,
                                    MISSING_ANALYSIS_MSG, None)
        if not metric.is_success:
            # Empty state caused by the analyzer's own WHERE clause → no
            # matching rows exist to violate the constraint → Success
            # (parity: AnalysisBasedConstraint.scala:94-113
            # isEmptyDueToFilter; same FilterableAnalyzer assumption — the
            # analyzer's `where` field IS its filter condition).
            from .analyzers.base import EmptyStateError
            if (isinstance(metric.error, EmptyStateError)
                    and getattr(self.analyzer, "where", None) is not None):
                return ConstraintResult(self, ConstraintStatus.SUCCESS,
                                        None, metric)
            return ConstraintResult(
                self, ConstraintStatus.FAILURE,
                f"metric computation failed: {metric.error}", metric)
        # value-picker failures and assertion failures carry DISTINCT
        # messages (AnalysisBasedConstraint.scala:87-92, 118-129)
        try:
            value = metric.value
            if self.value_picker is not None:
                value = self.value_picker(value)
        except Exception as exc:  # noqa: BLE001
            return ConstraintResult(
                self, ConstraintStatus.FAILURE,
                f"{PROBLEMATIC_PICKER_MSG}: {exc}!", metric)
        try:
            ok = bool(self.assertion(value))
        except Exception as exc:  # noqa: BLE001
            return ConstraintResult(
                self, ConstraintStatus.FAILURE,
                f"{ASSERTION_EXCEPTION_MSG}: {exc}!", metric)
        if ok:
            return ConstraintResult(self, ConstraintStatus.SUCCESS, None, metric)
        msg = (f"Value: {value} does not meet the constraint requirement!"
               + (f" {self.hint}" if self.hint else ""))
        return ConstraintResult(self, ConstraintStatus.FAILURE, msg, metric)


def named_constraint(constraint: Constraint, name: str) -> Constraint:
    constraint.name = name
    return constraint


def from_analyzer(analyzer: Analyzer, assertion: Callable[[Any], bool],
                  hint: Optional[str] = None) -> Constraint:
    """Generic analyzer→constraint bridge (parity: Constraint.fromAnalyzer,
    AnalysisBasedConstraintTest.scala:82-98)."""
    return AnalysisBasedConstraint(analyzer, assertion, hint=hint)
