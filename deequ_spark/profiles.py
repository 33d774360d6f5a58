"""Column profiler — 3-pass profile of every column.

Reference parity: /root/reference/src/main/scala/com/amazon/deequ/profiles/
{ColumnProfiler,ColumnProfile}.scala (1445 LoC):
  pass 1 (:124-244): Size + per-column Completeness/ApproxCountDistinct/
          DataType (+ Min/MaxLength for strings)
  pass 2 (:295-313, 488-510): numeric stats on native-numeric columns and
          string columns whose inferred type is numeric (cast first)
  pass 3: full histograms for columns with approxNumDistinct ≤ threshold
          (DEFAULT_CARDINALITY_THRESHOLD = 120, ColumnProfiler.scala:103)

Every pass is ONE fused scan via do_analysis_run — the whole profile of a
100-column table costs 3 passes + one grouping job per low-cardinality
column.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .compat import CamelCaseMixin, PyDeequCompatMeta
from .analyzers.base import NUMERIC_TYPES
from .analyzers.grouping import Histogram
from .analyzers.scan import (AnalyzerOptions, ApproxCountDistinct,
                             ApproxQuantiles, Completeness, Compliance,
                             DataType, DataTypeInstances, ExactQuantile,
                             Kurtosis, Maximum, MaxLength, Mean, Minimum,
                             MinLength, NullBehavior, Size, Skewness,
                             StandardDeviation, Sum, Variance, ZerosCount,
                             determine_type)
from .metrics import Distribution
from .runners.analysis_runner import do_analysis_run

DEFAULT_CARDINALITY_THRESHOLD = 120


@dataclass
class ColumnProfile:
    column: str
    completeness: float = float("nan")
    approx_num_distinct: float = float("nan")
    data_type: DataTypeInstances = DataTypeInstances.UNKNOWN
    is_data_type_inferred: bool = False
    type_counts: Dict[str, int] = field(default_factory=dict)
    histogram: Optional[Distribution] = None
    # numeric extension (parity: NumericColumnProfile)
    mean: Optional[float] = None
    maximum: Optional[float] = None
    minimum: Optional[float] = None
    sum: Optional[float] = None
    std_dev: Optional[float] = None
    skewness: Optional[float] = None
    kurtosis: Optional[float] = None
    variance: Optional[float] = None
    zeros_count: Optional[int] = None
    range: Optional[float] = None
    interquartile_range: Optional[float] = None
    approx_percentiles: Optional[Dict[str, float]] = None
    kll: Optional[object] = None       # BucketDistribution when enabled
    # string extension
    min_length: Optional[float] = None
    max_length: Optional[float] = None
    # array extension (beyond reference): element-count range — equal
    # min/max means a consistent embedding dimension
    min_size: Optional[float] = None
    max_size: Optional[float] = None
    # True when the array's element type is numeric (schema fact, no scan)
    numeric_elements: Optional[bool] = None

    @property
    def is_numeric(self) -> bool:
        return self.mean is not None or self.minimum is not None


class ColumnProfilerRunner(CamelCaseMixin, metaclass=PyDeequCompatMeta):
    """Fluent runner (parity: ColumnProfilerRunner.scala).
    PyDeequ-compatible: ``ColumnProfilerRunner(spark).onData(df)``."""

    __strip_leading_spark__ = True

    def on_data(self, data: DataFrame) -> "ColumnProfilerRunBuilder":
        return ColumnProfilerRunBuilder(data)


class ColumnProfilerRunBuilder(CamelCaseMixin):
    def __init__(self, data: DataFrame):
        self._data = data
        self._columns: Optional[List[str]] = None
        self._low_cardinality_threshold = DEFAULT_CARDINALITY_THRESHOLD
        self._with_histograms = True
        self._kll_parameters = None
        self._repository = None
        self._reuse_key = None
        self._fail_if_results_missing = False
        self._save_key = None
        self._json_path: Optional[str] = None

    def restrict_to_columns(self, columns: List[str]):
        self._columns = columns
        return self

    def with_low_cardinality_histogram_threshold(self, threshold: int):
        self._low_cardinality_threshold = threshold
        return self

    def with_histograms(self, enabled: bool):
        self._with_histograms = enabled
        return self

    def with_kll_profiling(self, kll_parameters=None):
        """Attach a KLL quantile sketch to each numeric profile (parity:
        ColumnProfilerRunBuilder.withKLLProfiling/setKLLParameters,
        ColumnProfilerRunBuilder.scala:116-131). All KLL columns share ONE
        extra Arrow pass."""
        from .analyzers.kll import KLLParameters
        self._kll_parameters = kll_parameters or KLLParameters()
        return self

    def use_repository(self, repository) -> "ColumnProfilerRunBuilder":
        """Parity: ColumnProfilerRunBuilder.useRepository."""
        self._repository = repository
        return self

    def reuse_existing_results_for_key(
            self, key, fail_if_results_missing: bool = False
    ) -> "ColumnProfilerRunBuilder":
        """Parity: ColumnProfilerRunBuilder.reuseExistingResultsForKey —
        stored metrics satisfy the profile passes without re-scanning;
        with ``fail_if_results_missing`` a gap raises instead of running
        (ColumnProfilerRunnerTest.scala:162-174)."""
        self._reuse_key = key
        self._fail_if_results_missing = fail_if_results_missing
        return self

    def save_or_append_result(self, key) -> "ColumnProfilerRunBuilder":
        """Parity: ColumnProfilerRunBuilder.saveOrAppendResult — the
        profile passes' analyzer metrics land in the repository so OTHER
        runners can reuse them (ColumnProfilerRunnerTest.scala:68-86)."""
        self._save_key = key
        return self

    def save_column_profiles_json_to_path(
            self, path: str) -> "ColumnProfilerRunBuilder":
        """Parity: saveColumnProfilesJsonToPath
        (ColumnProfilerRunnerTest.scala:145-160)."""
        self._json_path = path
        return self

    def run(self) -> Dict[str, ColumnProfile]:
        profiles = profile_columns(
            self._data, self._columns,
            low_cardinality_threshold=self._low_cardinality_threshold,
            with_histograms=self._with_histograms,
            kll_parameters=self._kll_parameters,
            metrics_repository=self._repository,
            reuse_existing_results_for_key=self._reuse_key,
            fail_if_results_missing=self._fail_if_results_missing,
            save_or_append_results_with_key=self._save_key)
        if self._json_path is not None:
            with open(self._json_path, "w", encoding="utf-8") as f:
                f.write(column_profiles_to_json(profiles))
        return profiles


def profile_columns(data: DataFrame, columns: Optional[List[str]] = None,
                    low_cardinality_threshold: int = DEFAULT_CARDINALITY_THRESHOLD,
                    with_histograms: bool = True,
                    kll_parameters=None,
                    metrics_repository=None,
                    reuse_existing_results_for_key=None,
                    fail_if_results_missing: bool = False,
                    save_or_append_results_with_key=None) -> Dict[str, ColumnProfile]:
    # repository args thread into every underlying analysis pass, so a
    # profile run saves reusable analyzer metrics / replays stored ones
    # with zero Spark jobs (ColumnProfilerRunner.scala + its tests)
    repo_kwargs = dict(
        metrics_repository=metrics_repository,
        reuse_existing_results_for_key=reuse_existing_results_for_key,
        fail_if_results_missing=fail_if_results_missing,
        save_or_append_results_with_key=save_or_append_results_with_key)
    cols = columns or data.columns
    schema = {f.name: f.dataType for f in data.schema.fields}
    profiles: Dict[str, ColumnProfile] = {c: ColumnProfile(c) for c in cols}

    # ---- pass 1: generic stats, one fused scan --------------------------
    # array columns get a derived size column so their element-count range
    # (the embedding dimension, when min == max) rides the same fused scan
    array_cols = [c for c in cols if isinstance(schema[c], T.ArrayType)]
    aug = data
    for c in array_cols:
        aug = aug.withColumn(f"__dq_size_{c}",
                             F.size(F.col(f"`{c}`")))
        profiles[c].numeric_elements = isinstance(
            schema[c].elementType, NUMERIC_TYPES)
    # Size rides the fused scan like the reference's pass 1
    # (ColumnProfiler.scala:124-244) — it isn't part of any column's
    # profile, but a repository-saving run stores it for other runners
    pass1: List = [Size()]
    for c in cols:
        if isinstance(schema[c], (T.ArrayType, T.MapType, T.StructType)):
            # Completeness keeps reference parity (rejects nested types);
            # the profiler still wants a completeness number for vector/
            # struct columns — an IS NOT NULL Compliance is the same ratio
            pass1.append(Compliance(c, f"`{c}` IS NOT NULL"))
        else:
            pass1.append(Completeness(c))
        pass1.append(ApproxCountDistinct(c))
        if isinstance(schema[c], T.StringType):
            pass1.append(DataType(c))
            # the profiler reads NULL strings as length 0, so min_length of
            # a nullable column is 0 (ColumnProfiler.scala:272-277
            # AnalyzerOptions(NullBehavior.EmptyString))
            empty = AnalyzerOptions(null_behavior=NullBehavior.EMPTY_STRING)
            pass1.append(MinLength(c, analyzer_options=empty))
            pass1.append(MaxLength(c, analyzer_options=empty))
    for c in array_cols:
        pass1.append(Minimum(f"__dq_size_{c}"))
        pass1.append(Maximum(f"__dq_size_{c}"))
    ctx1 = do_analysis_run(aug, pass1, **repo_kwargs)
    for a, m in ctx1.metric_map.items():
        if not m.is_success:
            continue
        if a.instance.startswith("__dq_size_"):
            p = profiles[a.instance[len("__dq_size_"):]]
            if a.name == "Minimum":
                p.min_size = m.value
            elif a.name == "Maximum":
                p.max_size = m.value
            continue
        if a.name == "Size":
            continue                      # dataset-level, not a column fact
        p = profiles[a.instance]
        if a.name in ("Completeness", "Compliance"):
            p.completeness = m.value
        elif a.name == "ApproxCountDistinct":
            p.approx_num_distinct = m.value
        elif a.name == "MinLength":
            p.min_length = m.value
        elif a.name == "MaxLength":
            p.max_length = m.value
        elif a.name == "DataType":
            p.type_counts = {k: dv.absolute for k, dv in m.value.values.items()}
            p.data_type = determine_type(m.value)
            p.is_data_type_inferred = True

    for c in cols:
        if isinstance(schema[c], NUMERIC_TYPES):
            p = profiles[c]
            p.data_type = (DataTypeInstances.FRACTIONAL
                           if isinstance(schema[c], (T.FloatType, T.DoubleType,
                                                     T.DecimalType))
                           else DataTypeInstances.INTEGRAL)
        elif isinstance(schema[c], T.BooleanType):
            profiles[c].data_type = DataTypeInstances.BOOLEAN

    # ---- pass 2: numeric stats (cast inferred-numeric strings) ----------
    numeric_native = [c for c in cols if isinstance(schema[c], NUMERIC_TYPES)]
    numeric_inferred = [
        c for c in cols
        if isinstance(schema[c], T.StringType)
        and profiles[c].data_type in (DataTypeInstances.INTEGRAL,
                                      DataTypeInstances.FRACTIONAL)]
    casted = data
    for c in numeric_inferred:
        # backtick-escape: a period in a column name must not parse
        # as struct access (SuggestionAndVerificationIntegrationTest)
        casted = casted.withColumn(c, F.col(f"`{c}`").cast("double"))
    numeric_cols = numeric_native + numeric_inferred
    if numeric_cols:
        deciles = tuple(i / 10 for i in range(1, 10))
        pass2 = []
        for c in numeric_cols:
            pass2 += [Minimum(c), Maximum(c), Mean(c), Sum(c),
                      StandardDeviation(c), Skewness(c), Kurtosis(c),
                      Variance(c), ZerosCount(c),
                      ExactQuantile(c, 0.25), ExactQuantile(c, 0.75),
                      ApproxQuantiles(c, deciles)]
        if kll_parameters is not None:
            # the runner routes all KLL analyzers to ONE shared Arrow pass
            from .analyzers.kll import KLLSketch
            pass2 += [KLLSketch(c, kll_parameters) for c in numeric_cols]
        ctx2 = do_analysis_run(casted, pass2, **repo_kwargs)
        setters = {"Minimum": "minimum", "Maximum": "maximum", "Mean": "mean",
                   "Sum": "sum", "StandardDeviation": "std_dev",
                   "Skewness": "skewness", "Kurtosis": "kurtosis",
                   "Variance": "variance", "ZerosCount": "zeros_count",
                   "ApproxQuantiles": "approx_percentiles",
                   "KLL": "kll"}
        quartiles: Dict[str, Dict[float, float]] = {}
        for a, m in ctx2.metric_map.items():
            if not m.is_success:
                continue
            if a.name == "ExactQuantile":
                quartiles.setdefault(a.instance, {})[a.quantile] = m.value
            elif a.name in setters:
                setattr(profiles[a.instance], setters[a.name], m.value)
        for c in numeric_cols:
            p = profiles[c]
            if p.maximum is not None and p.minimum is not None:
                p.range = p.maximum - p.minimum
            q = quartiles.get(c, {})
            if 0.25 in q and 0.75 in q:
                p.interquartile_range = q[0.75] - q[0.25]

    # ---- pass 3: histograms for low-cardinality columns -----------------
    if with_histograms:
        hist_cols = [c for c in cols
                     if profiles[c].approx_num_distinct == profiles[c].approx_num_distinct
                     and profiles[c].approx_num_distinct <= low_cardinality_threshold]
        if hist_cols:
            ctx3 = do_analysis_run(
                data, [Histogram(c, max_detail_bins=low_cardinality_threshold + 1)
                       for c in hist_cols], **repo_kwargs)
            for a, m in ctx3.metric_map.items():
                if m.is_success:
                    profiles[a.instance].histogram = m.value

    return profiles


def column_profiles_to_json(profiles: Dict[str, ColumnProfile]) -> str:
    """Serialize profiles to the reference's JSON wire shape
    (ColumnProfile.scala:86-214 ``ColumnProfiles.toJson``): a
    ``{"columns": [...]}`` document, numeric fields only when present,
    histograms as [{value, count, ratio}], KLL as
    {buckets, sketch:{parameters:{c,k}, data}}."""
    import json

    columns = []
    for profile in profiles.values():
        d: Dict[str, Any] = {
            "column": profile.column,
            "dataType": profile.data_type.value
            if hasattr(profile.data_type, "value") else str(profile.data_type),
            "isDataTypeInferred": str(profile.is_data_type_inferred).lower(),
            "completeness": profile.completeness,
            "approximateNumDistinctValues": profile.approx_num_distinct,
        }
        if profile.histogram is not None:
            d["histogram"] = [
                {"value": name, "count": dv.absolute, "ratio": dv.ratio}
                for name, dv in profile.histogram.values.items()]
        for attr, key in (("zeros_count", "zerosCount"), ("mean", "mean"),
                          ("maximum", "maximum"), ("minimum", "minimum"),
                          ("range", "range"),
                          ("interquartile_range", "interquartileRange"),
                          ("sum", "sum"), ("std_dev", "stdDev"),
                          ("variance", "variance"),
                          ("skewness", "skewness"),
                          ("kurtosis", "kurtosis"),
                          ("min_length", "minLength"),
                          ("max_length", "maxLength")):
            v = getattr(profile, attr)
            if v is not None:
                d[key] = v
        if profile.kll is not None:
            kll = profile.kll
            d["kll"] = {
                "buckets": [{"low_value": b.low_value,
                             "high_value": b.high_value,
                             "count": b.count} for b in kll.buckets],
                "sketch": {
                    "parameters": {
                        "c": kll.parameters.shrinking_factor,
                        "k": float(kll.parameters.sketch_size),
                    },
                    # the reference stores compactor data as a JSON string
                    "data": json.dumps([
                        [float(v) for v in level]
                        for level in kll.sketch.compactors if len(level)]),
                },
            }
        if profile.approx_percentiles:
            d["approxPercentiles"] = [
                profile.approx_percentiles[q]
                for q in sorted(profile.approx_percentiles)]
        columns.append(d)
    return json.dumps({"columns": columns}, indent=2)
