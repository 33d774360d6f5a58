"""Constraint suggestion — profile the data, then apply rules that propose
checks.

Reference parity: /root/reference/src/main/scala/com/amazon/deequ/
suggestions/ConstraintSuggestionRunner.scala:33-157 and rules/
{CompleteIfCompleteRule,RetainCompletenessRule,RetainTypeRule,
CategoricalRangeRule,FractionalCategoricalRangeRule,NonNegativeNumbersRule,
UniqueIfApproximatelyUniqueRule,HasMin,HasMax,HasMean,HasStandardDeviation,
HasMinLength,HasMaxLength}.scala (1923 LoC total).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame

from .checks import Check, CheckLevel
from .compat import CamelCaseMixin, PyDeequCompatMeta
from .profiles import ColumnProfile, profile_columns
from .analyzers.scan import DataTypeInstances


@dataclass
class ConstraintSuggestion:
    constraint_name: str
    column_name: str
    current_value: str
    description: str
    rule_name: str
    code_for_constraint: str
    apply: Callable[[Check], Check]


class SuggestionRule:
    name = "SuggestionRule"

    def should_be_applied(self, profile: ColumnProfile, num_records: int) -> bool:
        raise NotImplementedError

    def candidate(self, profile: ColumnProfile,
                  num_records: int) -> ConstraintSuggestion:
        raise NotImplementedError


class CompleteIfCompleteRule(SuggestionRule):
    """Parity: rules/CompleteIfCompleteRule.scala."""
    name = "CompleteIfCompleteRule"

    def should_be_applied(self, profile, num_records):
        return profile.completeness == 1.0

    def candidate(self, profile, num_records):
        col = profile.column
        return ConstraintSuggestion(
            f"CompletenessConstraint({col})", col, "Completeness: 1.0",
            f"'{col}' is not null", self.name,
            f'.is_complete("{col}")',
            lambda check: check.is_complete(col))


@dataclass
class ConfidenceInterval:
    """Parity: interval/ConfidenceIntervalStrategy.scala ConfidenceInterval."""
    lower_bound: float
    upper_bound: float


def _round2(value: float, up: bool) -> float:
    """BigDecimal setScale(2, DOWN/UP) semantics — truncate toward / away
    from zero at two decimals (parity: Wald/WilsonScoreIntervalStrategy)."""
    from decimal import ROUND_DOWN, ROUND_UP, Decimal
    # Decimal(repr(value)) — the shortest decimal string, matching Scala's
    # BigDecimal(double) construction; Decimal(value) would expand the exact
    # binary fraction (0.30 → 0.29999...) and truncate DOWN one cent short
    return float(Decimal(repr(value)).quantize(
        Decimal("0.01"), rounding=ROUND_UP if up else ROUND_DOWN))


class ConfidenceIntervalStrategy:
    """Parity: interval/ConfidenceIntervalStrategy.scala."""

    DEFAULT_CONFIDENCE = 0.95

    def calculate_target_confidence_interval(
            self, p_hat: float, num_records: int,
            confidence: float = DEFAULT_CONFIDENCE) -> ConfidenceInterval:
        raise NotImplementedError

    @staticmethod
    def _validate(p_hat: float, confidence: float) -> None:
        if not 0.0 <= p_hat <= 1.0:
            raise ValueError("pHat must be between 0.0 and 1.0")
        if not 0.0 <= confidence <= 1.0:
            raise ValueError("confidence must be between 0.0 and 1.0")

    @staticmethod
    def calculate_z_score(confidence: float) -> float:
        from statistics import NormalDist
        return NormalDist().inv_cdf(1 - (1.0 - confidence) / 2.0)


class WaldIntervalStrategy(ConfidenceIntervalStrategy):
    """p ± z·√(p(1−p)/n) — the reference's (deprecated but DEFAULT)
    strategy (parity: interval/WaldIntervalStrategy.scala)."""

    def calculate_target_confidence_interval(
            self, p_hat, num_records,
            confidence=ConfidenceIntervalStrategy.DEFAULT_CONFIDENCE):
        self._validate(p_hat, confidence)
        margin = (self.calculate_z_score(confidence)
                  * math.sqrt(p_hat * (1 - p_hat) / num_records))
        return ConfidenceInterval(_round2(p_hat - margin, up=False),
                                  _round2(p_hat + margin, up=True))


class WilsonScoreIntervalStrategy(ConfidenceIntervalStrategy):
    """Wilson score interval — better coverage for small n / extreme p
    (parity: interval/WilsonScoreIntervalStrategy.scala)."""

    def calculate_target_confidence_interval(
            self, p_hat, num_records,
            confidence=ConfidenceIntervalStrategy.DEFAULT_CONFIDENCE):
        self._validate(p_hat, confidence)
        z = self.calculate_z_score(confidence)
        z_sq_over_n = z * z / num_records
        factor = 1.0 / (1 + z_sq_over_n)
        adjusted = p_hat + z_sq_over_n / 2
        margin = z * math.sqrt(p_hat * (1 - p_hat) / num_records
                               + z_sq_over_n / (4 * num_records))
        return ConfidenceInterval(_round2(factor * (adjusted - margin), up=False),
                                  _round2(factor * (adjusted + margin), up=True))


DEFAULT_INTERVAL_STRATEGY: ConfidenceIntervalStrategy = WaldIntervalStrategy()


class RetainCompletenessRule(SuggestionRule):
    """Suggest a lower bound from a binomial confidence interval —
    strategy selectable, reference default Wald
    (parity: rules/RetainCompletenessRule.scala:37-66 +
    interval/{Wald,WilsonScore}IntervalStrategy.scala)."""
    name = "RetainCompletenessRule"

    def __init__(self, min_completeness: float = 0.2,
                 max_completeness: float = 1.0,
                 interval_strategy: Optional[ConfidenceIntervalStrategy] = None):
        self.min_completeness = min_completeness
        self.max_completeness = max_completeness
        self.interval_strategy = interval_strategy or DEFAULT_INTERVAL_STRATEGY

    def should_be_applied(self, profile, num_records):
        return (self.min_completeness <= profile.completeness
                < self.max_completeness)

    def candidate(self, profile, num_records):
        col = profile.column
        p, n = profile.completeness, max(num_records, 1)
        interval = self.interval_strategy.calculate_target_confidence_interval(p, n)
        lower = max(0.0, interval.lower_bound)
        return ConstraintSuggestion(
            f"CompletenessConstraint({col})", col, f"Completeness: {p}",
            f"'{col}' has less than {int((1 - lower) * 100)}% missing values",
            self.name, f'.has_completeness("{col}", lambda v: v >= {lower})',
            lambda check: check.has_completeness(col, lambda v: v >= lower))


class RetainTypeRule(SuggestionRule):
    """Parity: rules/RetainTypeRule.scala."""
    name = "RetainTypeRule"

    def should_be_applied(self, profile, num_records):
        return (profile.is_data_type_inferred and profile.data_type in
                (DataTypeInstances.INTEGRAL, DataTypeInstances.FRACTIONAL,
                 DataTypeInstances.BOOLEAN))

    def candidate(self, profile, num_records):
        col, dtype = profile.column, profile.data_type
        # suggest the DETECTED type (RetainTypeRule.scala:42-57) — an
        # Integral→Fractional widening would FAIL when applied, since the
        # Fractional regex rejects plain integers
        return ConstraintSuggestion(
            f"AnalysisBasedConstraint(DataType({col}))", col,
            f"DataType: {dtype.value}",
            f"'{col}' has type {dtype.value}", self.name,
            f'.has_data_type("{col}", DataTypeInstances.{dtype.name}, '
            f'lambda v: v == 1.0)',
            lambda check: check.has_data_type(col, dtype, lambda v: v == 1.0))


def _sql_name(col: str) -> str:
    """Backtick-quote a column for use inside a generated SQL predicate
    (no-op when the profiler already quoted it)."""
    if col.startswith("`") and col.endswith("`") and len(col) >= 2:
        return col
    return f"`{col}`" if ("." in col or " " in col) else col


class CategoricalRangeRule(SuggestionRule):
    """Parity: rules/CategoricalRangeRule.scala — suggest is_contained_in
    when the histogram covers the column with few distinct values."""
    name = "CategoricalRangeRule"

    def should_be_applied(self, profile, num_records):
        """CategoricalRangeRule.scala:35-52: String/Integral columns only;
        ratio of distinct values occurring once must be ≤ 0.1 (an empty
        histogram is 0/0 = NaN in the reference and fails the check)."""
        if profile.histogram is None or profile.data_type not in (
                DataTypeInstances.STRING, DataTypeInstances.INTEGRAL):
            return False
        entries = profile.histogram.values
        if not entries:
            return False
        unique_ratio = sum(1 for dv in entries.values()
                           if dv.absolute == 1) / len(entries)
        return unique_ratio <= 0.1

    def candidate(self, profile, num_records):
        """CategoricalRangeRule.scala:54-84 — categories ordered by
        popularity (frequency desc), SQL-escaped; the suggested constraint
        is a Compliance whose INSTANCE is the description and whose
        predicate is `col` IN (...); currentValue is "Compliance: 1"."""
        col = profile.column
        by_popularity = sorted(
            ((k, dv) for k, dv in profile.histogram.values.items()
             if k != "NullValue"),
            key=lambda kv: (-kv[1].absolute, kv[0]))
        categories = [k for k, _ in by_popularity]
        categories_sql = ", ".join(
            "'" + c.replace("'", "''") + "'" for c in categories)
        description = f"'{col}' has value range {categories_sql}"
        condition = f"{_sql_name(col)} IN ({categories_sql})"
        return ConstraintSuggestion(
            f"ComplianceConstraint(Compliance({description},{condition}))",
            col, "Compliance: 1", description, self.name,
            # code string lists values alphabetically (stable for tooling);
            # description/condition keep the reference's popularity order
            f'.is_contained_in("{col}", {sorted(categories)!r})',
            lambda check: check.satisfies(condition, description,
                                          columns=[col]))


class FractionalCategoricalRangeRule(SuggestionRule):
    """Parity: rules/FractionalCategoricalRangeRule.scala — top categories
    covering ≥ targetDataCoverageFraction."""
    name = "FractionalCategoricalRangeRule"

    def __init__(self, target_coverage: float = 0.9,
                 interval_strategy: Optional[ConfidenceIntervalStrategy] = None):
        self.target_coverage = target_coverage
        self.interval_strategy = interval_strategy or DEFAULT_INTERVAL_STRATEGY

    def _top_categories(self, profile):
        """Categories by ratio desc until cumulative coverage reaches the
        target — the one crossing the line is included
        (FractionalCategoricalRangeRule.scala:105-124); key tiebreak for
        determinism (Scala Map order is arbitrary on ties)."""
        items = sorted(profile.histogram.values.items(),
                       key=lambda kv: (-kv[1].ratio, kv[0]))
        covered, top = 0.0, []
        for k, dv in items:
            if covered < self.target_coverage:
                covered += dv.ratio
                top.append((k, dv))
        return top, covered

    def should_be_applied(self, profile, num_records):
        """FractionalCategoricalRangeRule.scala:40-61: String/Integral
        columns; once-occurring distinct ratio ≤ 0.4 AND the top
        categories covering the target leave some tail (ratio sum < 1 —
        otherwise the non-fractional CategoricalRangeRule applies)."""
        if profile.histogram is None or profile.data_type not in (
                DataTypeInstances.STRING, DataTypeInstances.INTEGRAL):
            return False
        entries = profile.histogram.values
        if not entries:
            return False
        unique_ratio = sum(1 for dv in entries.values()
                           if dv.absolute == 1) / len(entries)
        _top, ratio_sums = self._top_categories(profile)
        return unique_ratio <= 0.4 and ratio_sums < 1

    def candidate(self, profile, num_records):
        """FractionalCategoricalRangeRule.scala:63-103 — popularity-ordered
        SQL-escaped categories; the suggested constraint is a Compliance
        whose INSTANCE is the description, predicate `col` IN (...),
        assertion >= the Wald/Wilson lower bound on the observed coverage;
        currentValue "Compliance: <coverage>"."""
        col = profile.column
        top, ratio_sums = self._top_categories(profile)
        categories = [k for k, _ in top if k != "NullValue"]
        # assertion threshold = lower bound of the binomial confidence
        # interval around the observed coverage (:81-84)
        threshold = max(0.0, self.interval_strategy
                        .calculate_target_confidence_interval(
                            min(ratio_sums, 1.0), max(num_records, 1))
                        .lower_bound)
        categories_sql = ", ".join(
            "'" + c.replace("'", "''") + "'" for c in categories)
        description = (f"'{col}' has value range {categories_sql} for at "
                       f"least {threshold * 100}% of values")
        condition = f"{_sql_name(col)} IN ({categories_sql})"
        hint = f"It should be above {threshold}!"
        return ConstraintSuggestion(
            f"ComplianceConstraint(Compliance({description},{condition}))",
            col, f"Compliance: {ratio_sums}", description, self.name,
            # code string lists values alphabetically (stable for tooling)
            f'.is_contained_in("{col}", {sorted(categories)!r}, '
            f'lambda v: v >= {threshold})',
            lambda check, c2=condition, d2=description, t=threshold,
            h2=hint: check.satisfies(c2, d2, lambda v: v >= t, hint=h2,
                                     columns=[col]))


class NonNegativeNumbersRule(SuggestionRule):
    """Parity: rules/NonNegativeNumbersRule.scala."""
    name = "NonNegativeNumbersRule"

    def should_be_applied(self, profile, num_records):
        return profile.is_numeric and profile.minimum is not None \
            and profile.minimum >= 0

    def candidate(self, profile, num_records):
        """NonNegativeNumbersRule.scala:36-53 — the Compliance instance IS
        the description, predicate "col >= 0"."""
        col = profile.column
        description = f"'{col}' has no negative values"
        return ConstraintSuggestion(
            f"ComplianceConstraint({col} is non-negative)", col,
            f"Minimum: {profile.minimum}", description,
            self.name, f'.is_non_negative("{col}")',
            lambda check: check.satisfies(f"{_sql_name(col)} >= 0",
                                          description, columns=[col]))


class UniqueIfApproximatelyUniqueRule(SuggestionRule):
    """Parity: rules/UniqueIfApproximatelyUniqueRule.scala."""
    name = "UniqueIfApproximatelyUniqueRule"

    def should_be_applied(self, profile, num_records):
        if num_records == 0 or math.isnan(profile.approx_num_distinct):
            return False
        return abs(profile.approx_num_distinct / num_records - 1.0) <= 0.08

    def candidate(self, profile, num_records):
        col = profile.column
        return ConstraintSuggestion(
            f"UniquenessConstraint({col})", col,
            f"ApproxDistinctness: {profile.approx_num_distinct / max(num_records, 1)}",
            f"'{col}' is unique", self.name, f'.is_unique("{col}")',
            lambda check: check.is_unique(col))


class HasMinRule(SuggestionRule):
    name = "HasMin"

    def should_be_applied(self, profile, num_records):
        return profile.minimum is not None

    def candidate(self, profile, num_records):
        col, v = profile.column, profile.minimum
        return ConstraintSuggestion(
            f"MinimumConstraint({col})", col, f"Minimum: {v}",
            f"'{col}' >= {v}", self.name,
            f'.has_min("{col}", lambda x: x >= {v})',
            lambda check: check.has_min(col, lambda x: x >= v))


class HasMaxRule(SuggestionRule):
    name = "HasMax"

    def should_be_applied(self, profile, num_records):
        return profile.maximum is not None

    def candidate(self, profile, num_records):
        col, v = profile.column, profile.maximum
        return ConstraintSuggestion(
            f"MaximumConstraint({col})", col, f"Maximum: {v}",
            f"'{col}' <= {v}", self.name,
            f'.has_max("{col}", lambda x: x <= {v})',
            lambda check: check.has_max(col, lambda x: x <= v))


class HasMeanRule(SuggestionRule):
    name = "HasMean"

    def should_be_applied(self, profile, num_records):
        return profile.mean is not None

    def candidate(self, profile, num_records):
        col, v = profile.column, profile.mean
        lo, hi = v * 0.9, v * 1.1
        return ConstraintSuggestion(
            f"MeanConstraint({col})", col, f"Mean: {v}",
            f"'{col}' mean within 10% of {v}", self.name,
            f'.has_mean("{col}", lambda x: {min(lo, hi)} <= x <= {max(lo, hi)})',
            lambda check: check.has_mean(
                col, lambda x: min(lo, hi) <= x <= max(lo, hi)))


class HasStandardDeviationRule(SuggestionRule):
    name = "HasStandardDeviation"

    def should_be_applied(self, profile, num_records):
        return profile.std_dev is not None

    def candidate(self, profile, num_records):
        col, v = profile.column, profile.std_dev
        lo, hi = v * 0.9, v * 1.1
        return ConstraintSuggestion(
            f"StandardDeviationConstraint({col})", col, f"StdDev: {v}",
            f"'{col}' stddev within 10% of {v}", self.name,
            f'.has_standard_deviation("{col}", lambda x: {lo} <= x <= {hi})',
            lambda check: check.has_standard_deviation(
                col, lambda x: lo <= x <= hi))


class HasMinLengthRule(SuggestionRule):
    name = "HasMinLength"

    def should_be_applied(self, profile, num_records):
        return profile.min_length is not None

    def candidate(self, profile, num_records):
        col, v = profile.column, profile.min_length
        return ConstraintSuggestion(
            f"MinLengthConstraint({col})", col, f"MinLength: {v}",
            f"'{col}' length >= {v}", self.name,
            f'.has_min_length("{col}", lambda x: x >= {v})',
            lambda check: check.has_min_length(col, lambda x: x >= v))


class HasMaxLengthRule(SuggestionRule):
    name = "HasMaxLength"

    def should_be_applied(self, profile, num_records):
        return profile.max_length is not None

    def candidate(self, profile, num_records):
        col, v = profile.column, profile.max_length
        return ConstraintSuggestion(
            f"MaxLengthConstraint({col})", col, f"MaxLength: {v}",
            f"'{col}' length <= {v}", self.name,
            f'.has_max_length("{col}", lambda x: x <= {v})',
            lambda check: check.has_max_length(col, lambda x: x <= v))


# rule sets (parity: ConstraintSuggestionRunner.scala:33-45 / Rules.scala)
class EmbeddingQualityIfVectorRule(SuggestionRule):
    """Beyond the reference: an array column whose element count is
    CONSTANT across the profile (min_size == max_size > 0) is treated as
    an embedding column — suggest pinning its dimension contract and
    NaN-freeness via has_embedding_quality."""
    name = "EmbeddingQualityIfVectorRule"

    def should_be_applied(self, profile, num_records):
        # numeric_elements gates out e.g. constant-size array<string>
        # columns — EmbeddingQuality's isnan/x*x expressions would throw
        # on them under ANSI, breaking the suggested-constraint contract
        return (profile.min_size is not None
                and profile.max_size is not None
                and profile.min_size == profile.max_size
                and profile.min_size > 0
                and profile.numeric_elements is True)

    def candidate(self, profile, num_records):
        col, dim = profile.column, int(profile.min_size)
        return ConstraintSuggestion(
            f"EmbeddingQualityConstraint({col})", col,
            f"EmbeddingDim: {dim}",
            f"'{col}' vectors are {dim}-dimensional without NaNs",
            self.name,
            f'.has_embedding_quality("{col}", {dim}, lambda v: '
            'v["n_dim_mismatch"] == 0 and v["n_nan"] == 0)',
            lambda check: check.has_embedding_quality(
                col, dim,
                lambda v: v["n_dim_mismatch"] == 0 and v["n_nan"] == 0))


DEFAULT_RULES: List[SuggestionRule] = [
    CompleteIfCompleteRule(), RetainCompletenessRule(), RetainTypeRule(),
    CategoricalRangeRule(), FractionalCategoricalRangeRule(),
    NonNegativeNumbersRule(), UniqueIfApproximatelyUniqueRule(),
    EmbeddingQualityIfVectorRule(),
]
STRING_RULES: List[SuggestionRule] = [HasMinLengthRule(), HasMaxLengthRule()]
NUMERICAL_RULES: List[SuggestionRule] = [
    HasMinRule(), HasMaxRule(), HasMeanRule(), HasStandardDeviationRule()]
EXTENDED_RULES: List[SuggestionRule] = DEFAULT_RULES + STRING_RULES + NUMERICAL_RULES


def DEFAULT() -> List[SuggestionRule]:
    """PyDeequ parity: ``addConstraintRule(DEFAULT())`` expands to the
    default rule set (pydeequ/suggestions.py DEFAULT)."""
    return list(DEFAULT_RULES)


def EXTENDED() -> List[SuggestionRule]:
    """PyDeequ-style factory for the extended rule set."""
    return list(EXTENDED_RULES)


# exact reference wording per rule (rules/*.scala ruleDescription)
RULE_DESCRIPTIONS = {
    "CategoricalRangeRule": "If we see a categorical range for a column, "
        "we suggest an IS IN (...) constraint",
    "CompleteIfCompleteRule": "If a column is complete in the sample, "
        "we suggest a NOT NULL constraint",
    "FractionalCategoricalRangeRule": "If we see a categorical range for "
        "most values in a column, we suggest an IS IN (...) constraint "
        "that should hold for most values",
    "HasMax": "If we see a numeric column, we suggest a corresponding "
        "Maximum value constraint",
    "HasMaxLength": "If we see a string column, we suggest a corresponding "
        "Maximum length constraint",
    "HasMean": "If we see a numeric column, we suggest a corresponding "
        "Mean value constraint",
    "HasMin": "If we see a numeric column, we suggest a corresponding "
        "Minimum value constraint",
    "HasMinLength": "If we see a string column, we suggest a corresponding "
        "Minimum length constraint",
    "HasStandardDeviation": "If we see a numeric column, we suggest a "
        "corresponding standard deviation value constraint",
    "NonNegativeNumbersRule": "If we see only non-negative numbers in a "
        "column, we suggest a corresponding constraint",
    "RetainCompletenessRule": "If a column is incomplete in the sample, "
        "we model its completeness as a binomial variable, estimate a "
        "confidence interval and use this to define a lower bound for the "
        "completeness",
    "RetainTypeRule": "If we detect a non-string type, we suggest a "
        "type constraint",
    "UniqueIfApproximatelyUniqueRule": "If the ratio of approximate num "
        "distinct values in a column is close to the number of records "
        "(within the error of the HLL sketch), we suggest a UNIQUE "
        "constraint",
}


def _suggestion_json_obj(s: ConstraintSuggestion) -> Dict[str, object]:
    return {
        "constraint_name": s.constraint_name,
        "column_name": s.column_name,
        "current_value": s.current_value,
        "description": s.description,
        "suggesting_rule": s.rule_name,
        "rule_description": RULE_DESCRIPTIONS.get(s.rule_name, ""),
        "code_for_constraint": s.code_for_constraint,
    }


def constraint_suggestions_to_json(
        suggestions: Dict[str, List[ConstraintSuggestion]]) -> str:
    """Parity: ConstraintSuggestion.scala:57-79 ConstraintSuggestions
    .toJson — {"constraint_suggestions": [shared properties...]}."""
    import json
    flat = [s for col in suggestions.values() for s in col]
    return json.dumps(
        {"constraint_suggestions": [_suggestion_json_obj(s) for s in flat]},
        indent=2)


def evaluation_results_to_json(
        suggestions: Dict[str, List[ConstraintSuggestion]],
        verification_result) -> str:
    """Parity: ConstraintSuggestion.scala:81-118 evaluationResultsToJson —
    each suggestion zipped with its constraint's status on the test set
    ("Unknown" when no result exists)."""
    import json
    flat = [s for col in suggestions.values() for s in col]
    statuses: List[str] = []
    if verification_result is not None and verification_result.check_results:
        first = next(iter(verification_result.check_results.values()))
        statuses = [r.status.value if hasattr(r.status, "value")
                    else str(r.status) for r in first.constraint_results]
    rows = []
    for i, s in enumerate(flat):
        obj = _suggestion_json_obj(s)
        obj["constraint_result_on_test_set"] = (
            statuses[i] if i < len(statuses) else "Unknown")
        rows.append(obj)
    return json.dumps({"constraint_suggestions": rows}, indent=2)


class ConstraintSuggestionRunner(CamelCaseMixin,
                                 metaclass=PyDeequCompatMeta):
    """PyDeequ-compatible: ``ConstraintSuggestionRunner(spark)
    .onData(df).addConstraintRule(...)`` runs verbatim (compat.py)."""

    __strip_leading_spark__ = True
    def on_data(self, data: DataFrame) -> "ConstraintSuggestionRunBuilder":
        return ConstraintSuggestionRunBuilder(data)


class ConstraintSuggestionRunBuilder(CamelCaseMixin):
    def __init__(self, data: DataFrame):
        self._data = data
        self._rules: List[SuggestionRule] = []
        self._columns: Optional[List[str]] = None
        self._train_test_ratio: Optional[float] = None
        self._repository = None
        self._reuse_key = None
        self._fail_if_results_missing = False
        self._save_key = None
        self._suggestions_json_path: Optional[str] = None
        self._profiles_json_path: Optional[str] = None
        self._evaluation_json_path: Optional[str] = None

    def add_constraint_rules(self, rules: List[SuggestionRule]):
        self._rules.extend(rules)
        return self

    def add_constraint_rule(self, rule):
        """PyDeequ parity: accepts one rule OR an iterable (PyDeequ's
        DEFAULT() expands to the whole default rule set)."""
        if isinstance(rule, (list, tuple, set)):
            self._rules.extend(rule)
        else:
            self._rules.append(rule)
        return self

    def restrict_to_columns(self, columns: List[str]):
        self._columns = columns
        return self

    def use_train_test_split_with_test_set_ratio(self, ratio: float,
                                                 seed: int = 42):
        self._train_test_ratio = ratio
        self._seed = seed
        return self

    def use_repository(self, repository):
        """Parity: ConstraintSuggestionRunBuilder.useRepository."""
        self._repository = repository
        return self

    def reuse_existing_results_for_key(self, key,
                                       fail_if_results_missing: bool = False):
        """Parity: reuseExistingResultsForKey
        (ConstraintSuggestionRunnerTest.scala:41-84)."""
        self._reuse_key = key
        self._fail_if_results_missing = fail_if_results_missing
        return self

    def save_or_append_result(self, key):
        """Parity: saveOrAppendResult — the profiling passes' analyzer
        metrics land in the repository for other runners
        (ConstraintSuggestionRunnerTest.scala:86-137)."""
        self._save_key = key
        return self

    def save_constraint_suggestions_json_to_path(self, path: str):
        self._suggestions_json_path = path
        return self

    def save_column_profiles_json_to_path(self, path: str):
        self._profiles_json_path = path
        return self

    def save_evaluation_results_json_to_path(self, path: str):
        self._evaluation_json_path = path
        return self

    def run(self) -> Dict[str, object]:
        """Returns {"suggestions": {column: [ConstraintSuggestion]},
        "verification_result": optional result on the held-out split}
        (parity: ConstraintSuggestionRunner.scala:97-157)."""
        rules = self._rules or list(EXTENDED_RULES)
        data = self._data
        test_df = None
        if self._train_test_ratio is not None:
            train_df, test_df = data.randomSplit(
                [1 - self._train_test_ratio, self._train_test_ratio],
                seed=getattr(self, "_seed", 42))
            data = train_df

        # numRecords comes from the Size analyzer run through the same
        # repository plumbing — with reuse_existing_results_for_key a
        # replayed run needs ZERO Spark jobs, like the reference
        # (ConstraintSuggestionRunnerTest.scala:41-66 jobNumberReusing == 0)
        from .analyzers.scan import Size
        from .runners.analysis_runner import do_analysis_run
        size_ctx = do_analysis_run(
            data, [Size()],
            metrics_repository=self._repository,
            reuse_existing_results_for_key=self._reuse_key,
            fail_if_results_missing=self._fail_if_results_missing,
            save_or_append_results_with_key=self._save_key)
        num_records = int(size_ctx.metric_map[Size()].value)
        profiles = profile_columns(
            data, self._columns,
            metrics_repository=self._repository,
            reuse_existing_results_for_key=self._reuse_key,
            fail_if_results_missing=self._fail_if_results_missing,
            save_or_append_results_with_key=self._save_key)

        suggestions: Dict[str, List[ConstraintSuggestion]] = {}
        for col, profile in profiles.items():
            for rule in rules:
                try:
                    if rule.should_be_applied(profile, num_records):
                        suggestions.setdefault(col, []).append(
                            rule.candidate(profile, num_records))
                except Exception:  # noqa: BLE001 — a rule must not kill the run
                    continue

        verification_result = None
        if test_df is not None and suggestions:
            from .verification import VerificationSuite
            check = Check(CheckLevel.WARNING, "suggested constraints")
            for col_suggestions in suggestions.values():
                for s in col_suggestions:
                    check = s.apply(check)
            verification_result = (VerificationSuite().on_data(test_df)
                                   .add_check(check).run())

        if self._suggestions_json_path is not None:
            with open(self._suggestions_json_path, "w", encoding="utf-8") as f:
                f.write(constraint_suggestions_to_json(suggestions))
        if self._profiles_json_path is not None:
            from .profiles import column_profiles_to_json
            with open(self._profiles_json_path, "w", encoding="utf-8") as f:
                f.write(column_profiles_to_json(profiles))
        if self._evaluation_json_path is not None:
            with open(self._evaluation_json_path, "w", encoding="utf-8") as f:
                f.write(evaluation_results_to_json(suggestions,
                                                   verification_result))

        return {"suggestions": suggestions,
                "verification_result": verification_result,
                # parity: ConstraintSuggestionResult.columnProfiles /
                # .numRecordsUsedForProfiling
                "column_profiles": profiles,
                "num_records_used_for_profiling": num_records}
