"""Check DSL — the assertion surface (SURVEY §2e).

Reference parity: /root/reference/src/main/scala/com/amazon/deequ/checks/
Check.scala:79-1480 (builder methods with line refs in each docstring-free
method below mapping 1:1), CheckWithLastConstraintFilterable.scala
(``.where(...)`` retrofits a filter onto the last-added constraint).

Python-first shape: ``Check`` is a fluent builder collecting constraint
*factories* parameterized by the retrofittable filter; assertions are plain
``float -> bool`` callables.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

from .analyzers.base import Analyzer
from .analyzers.grouping import (CountDistinct, Distinctness, DuplicateRowCount,
                                 Entropy, Histogram, HistogramBinned,
                                 MutualInformation, Uniqueness,
                                 UniqueValueRatio)
from .analyzers.scan import (ApproxCountDistinct, ApproxQuantile, ColumnCount,
                             ColumnExists, ColumnRange, Completeness,
                             Compliance, Correlation, CustomSql, DataType,
                             DataTypeInstances, ExactQuantile,
                             InterquartileRange, Kurtosis, Maximum, MaxLength,
                             Mean, Minimum, MinLength, PatternMatch, Patterns,
                             RatioOfSums, Size, Skewness, StandardDeviation,
                             Sum, Variance, ZerosCount)
from .compat import CamelCaseMixin, PyDeequCompatMeta
from .constraints import (AnalysisBasedConstraint, Constraint,
                          ConstraintResult, ConstraintStatus)
from .metrics import Distribution, Metric


class CheckLevel(str, Enum):
    ERROR = "Error"
    WARNING = "Warning"
    # PyDeequ-style aliases (same values -> Enum aliases, not new members)
    Error = "Error"
    Warning = "Warning"


class CheckStatus(str, Enum):
    SUCCESS = "Success"
    WARNING = "Warning"
    ERROR = "Error"


IS_ONE: Callable[[float], bool] = lambda v: v == 1.0


class ConstrainableDataTypes(str, Enum):
    """Parity: ConstrainableDataTypes in Constraint.scala — the type
    vocabulary hasDataType accepts (NUMERIC sums Fractional+Integral)."""
    NULL = "Null"
    FRACTIONAL = "Fractional"
    INTEGRAL = "Integral"
    BOOLEAN = "Boolean"
    STRING = "String"
    NUMERIC = "Numeric"


@dataclass
class CheckResult:
    check: "Check"
    status: CheckStatus
    constraint_results: List[ConstraintResult] = field(default_factory=list)


class Check(CamelCaseMixin, metaclass=PyDeequCompatMeta):
    """A named set of constraints sharing a severity level
    (parity: Check.scala:79-116). PyDeequ-compatible: camelCase method
    access and a tolerated leading SparkSession argument (compat.py), so
    ``Check(spark, CheckLevel.Warning, \"desc\").hasSize(...)`` runs
    verbatim."""

    __strip_leading_spark__ = True

    def __init__(self, level: CheckLevel, description: str,
                 constraints: Optional[List] = None):
        self.level = CheckLevel(level)
        self.description = description
        # list of dicts {factory: where -> Constraint, where: Optional[str]}
        self._cells: List[dict] = list(constraints or [])

    # -- plumbing ----------------------------------------------------------

    def _add(self, factory: Callable[[Optional[str]], Constraint],
             filterable: bool = True) -> "Check":
        self._cells.append({"factory": factory, "where": None,
                            "filterable": filterable})
        return self

    def where(self, condition: str) -> "Check":
        """Retrofit a filter onto the last constraint
        (parity: CheckWithLastConstraintFilterable.scala)."""
        if not self._cells or not self._cells[-1]["filterable"]:
            raise ValueError("last constraint does not support .where()")
        self._cells[-1]["where"] = condition
        return self

    @property
    def constraints(self) -> List[Constraint]:
        return [c["factory"](c["where"]) for c in self._cells]

    def required_analyzers(self) -> List[Analyzer]:
        out = []
        for c in self.constraints:
            out.extend(c.required_analyzers)
        return out

    def evaluate(self, metric_map: Dict[Analyzer, Metric]) -> CheckResult:
        """Parity: Check.scala:1455-1467."""
        results = [c.evaluate(metric_map) for c in self.constraints]
        any_failed = any(r.status == ConstraintStatus.FAILURE for r in results)
        if not any_failed:
            status = CheckStatus.SUCCESS
        elif self.level == CheckLevel.ERROR:
            status = CheckStatus.ERROR
        else:
            status = CheckStatus.WARNING
        return CheckResult(self, status, results)

    # -- size / shape (Check.scala:129,135,212) ----------------------------

    def has_size(self, assertion, hint=None) -> "Check":
        # the reference asserts on Long (Constraint.scala:126-128,
        # valuePicker _.toLong) — failure messages read "Value: 4", not
        # "Value: 4.0"
        return self._add(lambda w: AnalysisBasedConstraint(
            Size(where=w), assertion, value_picker=lambda v: int(v),
            hint=hint, name=f"SizeConstraint(Size(None,{w}))"))

    def has_column_count(self, assertion, hint=None) -> "Check":
        # Long-valued like Size (Constraint.scala:133-135)
        return self._add(lambda w: AnalysisBasedConstraint(
            ColumnCount(), assertion, value_picker=lambda v: int(v),
            hint=hint), filterable=False)

    def has_column(self, column: str, hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            ColumnExists(column), IS_ONE, hint=hint), filterable=False)

    # -- completeness (Check.scala:187-273) --------------------------------

    def is_complete(self, column: str, hint=None,
                    analyzer_options=None) -> "Check":
        return self.has_completeness(column, IS_ONE, hint, analyzer_options)

    def has_completeness(self, column: str, assertion, hint=None,
                         analyzer_options=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            Completeness(column, w, analyzer_options), assertion, hint=hint))

    def are_complete(self, columns: Sequence[str], hint=None) -> "Check":
        for c in columns:
            self.is_complete(c, hint)
        return self

    def have_completeness(self, columns: Sequence[str], assertion, hint=None) -> "Check":
        for c in columns:
            self.has_completeness(c, assertion, hint)
        return self

    def are_any_complete(self, columns: Sequence[str], hint=None) -> "Check":
        pred = " OR ".join(f"`{c}` IS NOT NULL" for c in columns)
        return self.satisfies(pred, f"AnyComplete({','.join(columns)})", IS_ONE, hint)

    def have_any_completeness(self, columns: Sequence[str], assertion, hint=None) -> "Check":
        pred = " OR ".join(f"`{c}` IS NOT NULL" for c in columns)
        return self.satisfies(pred, f"AnyCompleteness({','.join(columns)})",
                              assertion, hint)

    # -- uniqueness (Check.scala:289-485) ----------------------------------

    def is_unique(self, column: str, hint=None,
                  analyzer_options=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            Uniqueness((column,), w, analyzer_options), IS_ONE, hint=hint))

    def are_unique(self, columns: Sequence[str], hint=None,
                   analyzer_options=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            Uniqueness(tuple(columns), w, analyzer_options), IS_ONE, hint=hint))

    def is_primary_key(self, column: str, *columns: str, hint=None,
                       analyzer_options=None) -> "Check":
        cols = [column, *columns]
        for c in cols:
            self.is_complete(c, hint, analyzer_options)
        return self.are_unique(cols, hint, analyzer_options)

    def has_uniqueness(self, columns, assertion, hint=None,
                       analyzer_options=None) -> "Check":
        cols = (columns,) if isinstance(columns, str) else tuple(columns)
        return self._add(lambda w: AnalysisBasedConstraint(
            Uniqueness(cols, w, analyzer_options), assertion, hint=hint))

    def has_distinctness(self, columns, assertion, hint=None) -> "Check":
        cols = (columns,) if isinstance(columns, str) else tuple(columns)
        return self._add(lambda w: AnalysisBasedConstraint(
            Distinctness(cols, w), assertion, hint=hint))

    def has_unique_value_ratio(self, columns, assertion, hint=None,
                               analyzer_options=None) -> "Check":
        cols = (columns,) if isinstance(columns, str) else tuple(columns)
        return self._add(lambda w: AnalysisBasedConstraint(
            UniqueValueRatio(cols, w, analyzer_options), assertion, hint=hint))

    # -- counts (Check.scala:150-184,564,1015) -----------------------------

    def has_zeros_count(self, column: str, assertion, hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            ZerosCount(column, w), assertion, hint=hint))

    def has_duplicate_row_count(self, columns, assertion=None, hint=None) -> "Check":
        """Reference arg order: hasDuplicateRowCount(Seq(cols), assertion)
        (Check.scala). A bare callable first argument still works
        (legacy call style: all-columns duplicate count)."""
        if callable(columns):
            columns, assertion = (), columns
        return self._add(lambda w: AnalysisBasedConstraint(
            DuplicateRowCount(tuple(columns), w), assertion, hint=hint))

    def has_number_of_distinct_values(self, column: str, assertion,
                                      binning_udf=None, max_bins: int = 1000,
                                      hint=None) -> "Check":
        # computeFrequenciesAsRatio=false (Check.scala:564-574): the
        # distinct-value count needs no total, so the backing histogram's
        # ratio slot carries the ABSOLUTE frequency (DistinctnessTest
        # :60-83 pins this quirk)
        return self._add(lambda w: AnalysisBasedConstraint(
            Histogram(column, binning_udf, max_bins, w,
                      compute_frequencies_as_ratio=False), assertion,
            value_picker=lambda dist: float(dist.number_of_bins), hint=hint))

    def has_approx_count_distinct(self, column: str, assertion, hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            ApproxCountDistinct(column, w), assertion, hint=hint))

    # -- distribution (Check.scala:591-663) --------------------------------

    def has_histogram_values(self, column: str, assertion,
                             binning_udf=None, max_bins: int = 1000,
                             hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            Histogram(column, binning_udf, max_bins, w), assertion, hint=hint))

    def has_histogram_binned_values(self, column: str, assertion,
                                    bin_count: Optional[int] = None,
                                    custom_edges=None, hint=None,
                                    include_overflow_bins=False) -> "Check":
        """Assertion over the binned Distribution (Check.scala:615-638)."""
        return self._add(lambda w: AnalysisBasedConstraint(
            HistogramBinned(column, bin_count, custom_edges, w,
                            include_overflow_bins),
            assertion, hint=hint))

    def has_histogram_binned_bins(self, column: str, assertion,
                                  bin_count: Optional[int] = None,
                                  custom_edges=None, hint=None,
                                  include_overflow_bins=False) -> "Check":
        """Assertion over the number of bins (Check.scala:639-662)."""
        return self._add(lambda w: AnalysisBasedConstraint(
            HistogramBinned(column, bin_count, custom_edges, w,
                            include_overflow_bins),
            lambda dist: assertion(dist.number_of_bins), hint=hint))

    def kll_sketch_satisfies(self, column: str, assertion,
                             kll_parameters=None, hint=None) -> "Check":
        """Assertion over the KLL BucketDistribution (Check.scala:663-719)."""
        from .analyzers.kll import KLLSketch
        return self._add(lambda w: AnalysisBasedConstraint(
            KLLSketch(column, kll_parameters), assertion, hint=hint),
            filterable=False)

    def has_embedding_quality(self, column: str, expected_dim: int,
                              assertion, hint=None) -> "Check":
        """Assertion over the EmbeddingQuality keyed-metric dict
        (``n_rows``/``n_null``/``n_dim_mismatch``/``n_nan``/
        ``n_zero_norm``/``n_valid``/``mean_norm``/``min_norm``/
        ``max_norm``) — vector-column data quality inside a normal
        verification run (beyond the reference)."""
        from .analyzers.embedding import EmbeddingQuality
        return self._add(lambda w: AnalysisBasedConstraint(
            EmbeddingQuality(column, expected_dim, where=w), assertion,
            hint=hint))

    # -- statistics (Check.scala:720-1034) ---------------------------------

    def has_entropy(self, column: str, assertion, hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            Entropy(column, w), assertion, hint=hint))

    def has_mutual_information(self, column_a: str, column_b: str, assertion,
                               hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            MutualInformation((column_a, column_b), w), assertion, hint=hint))

    def has_approx_quantile(self, column: str, quantile: float, assertion,
                            relative_error: float = 0.01, hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            ApproxQuantile(column, quantile, relative_error, w), assertion, hint=hint))

    def has_exact_quantile(self, column: str, quantile: float, assertion,
                           hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            ExactQuantile(column, quantile, w), assertion, hint=hint))

    def has_min_length(self, column: str, assertion, hint=None,
                       analyzer_options=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            MinLength(column, w, analyzer_options=analyzer_options),
            assertion, hint=hint))

    def has_max_length(self, column: str, assertion, hint=None,
                       analyzer_options=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            MaxLength(column, w, analyzer_options=analyzer_options),
            assertion, hint=hint))

    def has_min(self, column: str, assertion, hint=None,
                analyzer_options=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            Minimum(column, w, analyzer_options), assertion, hint=hint))

    def has_max(self, column: str, assertion, hint=None,
                analyzer_options=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            Maximum(column, w, analyzer_options), assertion, hint=hint))

    def has_range(self, column: str, assertion, hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            ColumnRange(column, w), assertion, hint=hint))

    def has_interquartile_range(self, column: str, assertion, hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            InterquartileRange(column, w), assertion, hint=hint))

    def has_mean(self, column: str, assertion, hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            Mean(column, w), assertion, hint=hint))

    def has_sum(self, column: str, assertion, hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            Sum(column, w), assertion, hint=hint))

    def has_standard_deviation(self, column: str, assertion, hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            StandardDeviation(column, w), assertion, hint=hint))

    def has_variance(self, column: str, assertion, hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            Variance(column, w), assertion, hint=hint))

    def has_skewness(self, column: str, assertion, hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            Skewness(column, w), assertion, hint=hint))

    def has_kurtosis(self, column: str, assertion, hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            Kurtosis(column, w), assertion, hint=hint))

    def has_correlation(self, column_a: str, column_b: str, assertion,
                        hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            Correlation(column_a, column_b, w), assertion, hint=hint))

    def has_ratio_of_sums(self, numerator: str, denominator: str, assertion,
                          hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            RatioOfSums(numerator, denominator, w), assertion, hint=hint))

    # -- predicates (Check.scala:1059-1454) --------------------------------

    def satisfies(self, column_condition: str, constraint_name: str,
                  assertion=IS_ONE, hint=None, columns=(),
                  analyzer_options=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            Compliance(constraint_name, column_condition, w, tuple(columns),
                       analyzer_options),
            assertion, hint=hint))

    def has_pattern(self, column: str, pattern: str, assertion=IS_ONE,
                    name=None, hint=None, analyzer_options=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            PatternMatch(column, pattern, w, analyzer_options),
            assertion, hint=hint,
            name=name or f"PatternMatchConstraint({column},{pattern})"))

    def contains_credit_card_number(self, column: str, assertion=IS_ONE,
                                    hint=None) -> "Check":
        return self.has_pattern(column, Patterns.CREDITCARD, assertion,
                                f"containsCreditCardNumber({column})", hint)

    def contains_email(self, column: str, assertion=IS_ONE, hint=None) -> "Check":
        return self.has_pattern(column, Patterns.EMAIL, assertion,
                                f"containsEmail({column})", hint)

    def contains_url(self, column: str, assertion=IS_ONE, hint=None) -> "Check":
        return self.has_pattern(column, Patterns.URL, assertion,
                                f"containsURL({column})", hint)

    def contains_social_security_number(self, column: str, assertion=IS_ONE,
                                        hint=None) -> "Check":
        return self.has_pattern(column, Patterns.SOCIAL_SECURITY_NUMBER_US,
                                assertion, f"containsSocialSecurityNumber({column})",
                                hint)

    def has_data_type(self, column: str, data_type,
                      assertion=IS_ONE, hint=None) -> "Check":
        """Accepts ConstrainableDataTypes or DataTypeInstances. Reference
        semantics (Constraint.scala:1108-1132, 1178-1202): typed ratios
        exclude Unknown (NULL) rows from the DENOMINATOR; Numeric =
        Fractional + Integral; Null/Unknown uses the plain all-rows
        ratio."""
        def pure(dist: Distribution, key: str) -> float:
            dv = dist.values.get(key)
            absolute = dv.absolute if dv else 0
            if absolute == 0:
                return 0.0
            total = sum(v.absolute for v in dist.values.values())
            unknown_dv = dist.values.get("Unknown")
            unknown = unknown_dv.absolute if unknown_dv else 0
            return absolute / (total - unknown)

        type_name = getattr(data_type, "name", str(data_type)).upper()

        def picker(dist: Distribution) -> float:
            if type_name in ("NULL", "UNKNOWN"):
                dv = dist.values.get("Unknown")
                return dv.ratio if dv else 0.0
            if type_name == "NUMERIC":
                return pure(dist, "Fractional") + pure(dist, "Integral")
            return pure(dist, type_name.capitalize())

        return self._add(lambda w: AnalysisBasedConstraint(
            DataType(column, w), assertion, value_picker=picker, hint=hint))

    def is_non_negative(self, column: str, assertion=IS_ONE, hint=None) -> "Check":
        return self.satisfies(
            f"COALESCE(CAST(`{column}` AS DOUBLE), 0.0) >= 0",
            f"{column} is non-negative", assertion, hint, columns=[column])

    def is_positive(self, column: str, assertion=IS_ONE, hint=None) -> "Check":
        return self.satisfies(
            f"COALESCE(CAST(`{column}` AS DOUBLE), 1.0) > 0",
            f"{column} is positive", assertion, hint, columns=[column])

    def is_less_than(self, column_a: str, column_b: str, assertion=IS_ONE,
                     hint=None) -> "Check":
        return self.satisfies(f"`{column_a}` < `{column_b}`",
                              f"{column_a} is less than {column_b}",
                              assertion, hint, columns=[column_a, column_b])

    def is_less_than_or_equal_to(self, column_a: str, column_b: str,
                                 assertion=IS_ONE, hint=None) -> "Check":
        return self.satisfies(f"`{column_a}` <= `{column_b}`",
                              f"{column_a} is less than or equal to {column_b}",
                              assertion, hint, columns=[column_a, column_b])

    def is_greater_than(self, column_a: str, column_b: str, assertion=IS_ONE,
                        hint=None) -> "Check":
        return self.satisfies(f"`{column_a}` > `{column_b}`",
                              f"{column_a} is greater than {column_b}",
                              assertion, hint, columns=[column_a, column_b])

    def is_greater_than_or_equal_to(self, column_a: str, column_b: str,
                                    assertion=IS_ONE, hint=None) -> "Check":
        return self.satisfies(f"`{column_a}` >= `{column_b}`",
                              f"{column_a} is greater than or equal to {column_b}",
                              assertion, hint, columns=[column_a, column_b])

    def is_contained_in(self, column: str, allowed_values: Sequence[Any],
                        assertion=IS_ONE, hint=None,
                        analyzer_options=None) -> "Check":
        """Parity: Check.scala:1326-1454 (string/numeric variants). An
        EMPTY value list behaves as [''] — the reference's
        mkString("'", "','", "'") yields '' for an empty array, so the
        predicate admits only empty strings and NULLs
        (VerificationSuiteTest.scala:1410-1439 pins 0.125 on the
        escape-character fixture for both [] and [''])."""
        if not allowed_values:
            allowed_values = [""]
        if all(isinstance(v, (int, float)) and not isinstance(v, bool)
               for v in allowed_values):
            values = ", ".join(str(v) for v in allowed_values)
        else:
            escaped = [str(v).replace("'", "\\'") for v in allowed_values]
            values = ", ".join(f"'{v}'" for v in escaped)
        pred = f"`{column}` IS NULL OR `{column}` IN ({values})"
        return self.satisfies(pred, f"{column} contained in {values}",
                              assertion, hint, columns=[column],
                              analyzer_options=analyzer_options)

    def is_contained_in_range(self, column: str, lower_bound: float,
                              upper_bound: float,
                              include_lower_bound: bool = True,
                              include_upper_bound: bool = True,
                              hint=None, analyzer_options=None) -> "Check":
        """Numeric-interval variant; NULLs pass (completeness is a separate
        concern). Parity: Check.scala:1430-1448 isContainedIn(lower,upper)."""
        lo = ">=" if include_lower_bound else ">"
        hi = "<=" if include_upper_bound else "<"
        pred = (f"`{column}` IS NULL OR "
                f"(`{column}` {lo} {lower_bound} AND `{column}` {hi} {upper_bound})")
        return self.satisfies(
            pred, f"{column} between {lower_bound} and {upper_bound}",
            IS_ONE, hint, columns=[column], analyzer_options=analyzer_options)

    # -- misc (Check.scala:309,542) ----------------------------------------

    def custom_sql(self, expression: str, assertion, hint=None) -> "Check":
        return self._add(lambda w: AnalysisBasedConstraint(
            CustomSql(expression), assertion, hint=hint), filterable=False)

    def does_dataset_match(self, other: Any, col_key_map: Dict[str, str],
                           assertion, match_col_map: Optional[Dict[str, str]] = None,
                           hint=None) -> "Check":
        """Row-match ratio against another DataFrame joined on a key map
        (parity: Check.scala:542-563 doesDatasetMatch)."""
        from .comparison import DatasetMatchAnalyzer
        return self._add(lambda w: AnalysisBasedConstraint(
            DatasetMatchAnalyzer(other, col_key_map, match_col_map),
            assertion, hint=hint), filterable=False)

    def has_near_duplicate_ratio(self, id_col: str, text_col: str,
                                 assertion, threshold: float = 0.8,
                                 method: str = "minhash",
                                 shingle_n: int = 3, hint=None) -> "Check":
        """Near-duplicate LOSER fraction of the corpus (the mass a
        keep-one-per-cluster dedup would remove) must satisfy the
        assertion — corpus hygiene as a regular data-quality constraint
        (no reference counterpart; analyzer = NearDuplicateRatio over
        the llm dedup operators). Typical use:
        ``check.has_near_duplicate_ratio('doc_id', 'text',
        lambda r: r <= 0.2)``."""
        from .analyzers.corpus import NearDuplicateRatio
        return self._add(lambda w: AnalysisBasedConstraint(
            NearDuplicateRatio(id_col, text_col, threshold, method,
                               shingle_n, where=w),
            assertion, hint=hint))

    def has_mad(self, column: str, assertion, hint=None) -> "Check":
        """Median absolute deviation of a numeric column must satisfy
        the assertion — the robust scale bound stddev checks can't give
        on dirty data (no reference counterpart; analyzers/robust.py)."""
        from .analyzers.robust import MedianAbsoluteDeviation
        return self._add(lambda w: AnalysisBasedConstraint(
            MedianAbsoluteDeviation(column, where=w), assertion, hint=hint))

    def has_mad_outlier_ratio(self, column: str, assertion,
                              k: float = 3.0, hint=None) -> "Check":
        """Fraction of rows beyond k·1.4826·MAD of the median (Hampel
        robust z-score) must satisfy the assertion. Unlike a stddev
        rule, the outliers themselves cannot inflate the scale and mask
        each other. Typical use:
        ``check.has_mad_outlier_ratio('price', lambda r: r <= 0.01)``."""
        from .analyzers.robust import RobustOutlierCount
        return self._add(lambda w: AnalysisBasedConstraint(
            RobustOutlierCount(column, k, where=w), assertion, hint=hint))

    def has_functional_dependency(self, determinant, dependent: str,
                                  assertion=None, hint=None) -> "Check":
        """Fraction of rows whose ``determinant`` group holds exactly ONE
        distinct ``dependent`` value must satisfy the assertion (default:
        == 1.0, a strict FD). 'order_id → customer_id must never
        disagree' as a regular constraint (no reference counterpart;
        diagnostics.fd_violations is the standalone drill-down)."""
        from .analyzers.scan import CustomAggregator

        det = [determinant] if isinstance(determinant, str) \
            else list(determinant)

        _compute_memo = {}

        def make_compute(w):
            # Close over the chained .where() filter — CustomAggregator
            # gets the full DataFrame, so the slice must be applied here
            # or the filter would be silently dropped. Memoized per
            # filter: CustomAggregator identity includes
            # id(agg_function), and the factory runs once for
            # required_analyzers() and once for constraints — both must
            # see the SAME function object to share one metric slot.
            if w not in _compute_memo:
                def compute(df, _w=w):
                    from .diagnostics import fd_violations
                    rep = fd_violations(
                        df.where(_w) if _w is not None else df,
                        det, dependent, top_n=0)
                    return {"compliance": rep["compliance"]}
                _compute_memo[w] = compute
            return _compute_memo[w]

        name = f"FD({','.join(det)}->{dependent})"
        return self._add(lambda w: AnalysisBasedConstraint(
            CustomAggregator(make_compute(w), name),
            (assertion or (lambda v: v == 1.0)),
            value_picker=lambda d: d["compliance"], hint=hint))

    def is_newest_point_non_anomalous(self, repository, strategy,
                                      analyzer: Analyzer,
                                      with_tag_values: Optional[Dict[str, str]] = None,
                                      after_date: Optional[int] = None,
                                      before_date: Optional[int] = None,
                                      hint=None) -> "Check":
        """Anomaly gate: the metric's newest value, appended to its
        repository history, must not be flagged by the strategy
        (parity: Check.scala:689-719, 1511-1568)."""
        def assertion(current_value: float) -> bool:
            history = []
            loader = repository.load()
            if with_tag_values:
                loader = loader.with_tag_values(with_tag_values)
            if after_date is not None:
                loader = loader.after(after_date)
            if before_date is not None:
                loader = loader.before(before_date)
            for _key, ctx in loader.get():
                for a, m in ctx.metric_map.items():
                    if a == analyzer and m.is_success \
                            and isinstance(m.value, (int, float)):
                        history.append(float(m.value))
            series = history + [float(current_value)]
            idx = len(series) - 1
            return len(strategy.detect(series, (idx, idx + 1))) == 0

        return self._add(lambda w: AnalysisBasedConstraint(
            analyzer, assertion,
            name=f"AnomalyConstraint({analyzer.name}({analyzer.instance}))",
            hint=hint), filterable=False)

    def add_constraint(self, constraint: Constraint) -> "Check":
        return self._add(lambda w: constraint, filterable=False)

    @staticmethod
    def from_constraint(constraint: Constraint, description: str,
                        level: "CheckLevel" = None) -> "Check":
        """Build a one-constraint Check (parity: Check.fromConstraint,
        AnalysisBasedConstraintTest.scala:82-98)."""
        return Check(level or CheckLevel.ERROR,
                     description).add_constraint(constraint)
