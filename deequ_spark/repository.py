"""Metrics repository — persisted metric time-series keyed by ResultKey.

Reference parity: /root/reference/src/main/scala/com/amazon/deequ/repository/
{MetricsRepository,MetricsRepositoryMultipleResultsLoader}.scala:25-59,
fs/FileSystemMetricsRepository.scala, memory/InMemoryMetricsRepository.scala,
AnalysisResultSerde.scala (JSON serde of every analyzer+metric).
"""

from __future__ import annotations

import json
import os
import re
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from .analyzers.base import Analyzer
from .compat import CamelCaseMixin, PyDeequCompatMeta
from .metrics import (Distribution, DistributionValue, DoubleMetric, Entity,
                      HistogramMetric, KeyedDoubleMetric, Metric)
from .runners.analysis_runner import AnalyzerContext


@dataclass(frozen=True)
class ResultKey(metaclass=PyDeequCompatMeta):
    __strip_leading_spark__ = True      # PyDeequ: ResultKey(spark, date, tags)

    """Parity: MetricsRepository.scala:25-30. ``tags`` accepts a dict (as in
    the reference API) and is normalized to a sorted tuple so keys hash."""
    dataset_date: int
    tags: Tuple[Tuple[str, str], ...] = ()

    def __post_init__(self):
        if isinstance(self.tags, dict):
            object.__setattr__(self, "tags", tuple(sorted(self.tags.items())))

    @staticmethod
    def make(dataset_date: Optional[int] = None,
             tags: Optional[Dict[str, str]] = None) -> "ResultKey":
        date = dataset_date if dataset_date is not None else int(time.time() * 1000)
        return ResultKey(date, tuple(sorted((tags or {}).items())))

    @property
    def tag_dict(self) -> Dict[str, str]:
        return dict(self.tags)


# --- analyzer/metric serde --------------------------------------------------

def serialize_analyzer(analyzer: Analyzer) -> Dict[str, Any]:
    params = {}
    for k, v in analyzer.__dict__.items():
        if callable(v):
            continue
        if isinstance(v, tuple):
            v = list(v)
        params[k] = v
    return {"analyzerType": type(analyzer).__name__, "params": params}


def deserialize_analyzer(data: Dict[str, Any]) -> Analyzer:
    from .analyzers import grouping, scan
    name = data["analyzerType"]
    cls = getattr(scan, name, None) or getattr(grouping, name, None)
    if cls is None:
        raise ValueError(f"Unknown analyzer type {name}")
    params = dict(data["params"])
    for k, v in params.items():
        if isinstance(v, list):
            params[k] = tuple(v)
    return cls(**params)


def serialize_metric(metric: Metric) -> Dict[str, Any]:
    out = metric.as_dict()
    out["metricType"] = type(metric).__name__
    return out


def deserialize_metric(data: Dict[str, Any]) -> Metric:
    entity = Entity(data["entity"])
    mtype = data.get("metricType", "DoubleMetric")
    if "value" not in data:
        return DoubleMetric(entity, data["name"], data["instance"], None,
                            RuntimeError(data.get("error", "unknown")))
    value = data["value"]
    if mtype == "KeyedDoubleMetric":
        return KeyedDoubleMetric(entity, data["name"], data["instance"], value)
    if mtype == "HistogramMetric":
        dist = Distribution(
            {k: DistributionValue(v["absolute"], v["ratio"])
             for k, v in value["values"].items()},
            value["numberOfBins"], value.get("tailCount", 0))
        return HistogramMetric(entity, data["name"], data["instance"], dist)
    return DoubleMetric(entity, data["name"], data["instance"], float(value))


def serialize_context(key: ResultKey, context: AnalyzerContext) -> Dict[str, Any]:
    return {
        "resultKey": {"dataSetDate": key.dataset_date, "tags": key.tag_dict},
        "analyzerContext": [
            {"analyzer": serialize_analyzer(a), "metric": serialize_metric(m)}
            for a, m in context.metric_map.items()
        ],
    }


def deserialize_context(data: Dict[str, Any]) -> Tuple[ResultKey, AnalyzerContext]:
    rk = data["resultKey"]
    key = ResultKey(rk["dataSetDate"],
                    tuple(sorted((rk.get("tags") or {}).items())))
    ctx = AnalyzerContext()
    ac = data["analyzerContext"]
    if isinstance(ac, dict) and "metricMap" in ac:
        # the reference engine's wire format (AnalysisResultSerde.scala) —
        # a repository written by it loads here unchanged
        for item in ac["metricMap"]:
            try:
                analyzer = deserialize_reference_analyzer(item["analyzer"])
                ctx.metric_map[analyzer] = \
                    deserialize_reference_metric(item["metric"])
            except Exception:  # noqa: BLE001 — skip unknown entries
                continue
        return key, ctx
    for item in ac:
        try:
            analyzer = deserialize_analyzer(item["analyzer"])
        except Exception:  # noqa: BLE001 — skip unknown analyzers
            continue
        ctx.metric_map[analyzer] = deserialize_metric(item["metric"])
    return key, ctx


# --- query DSL --------------------------------------------------------------

class MetricsRepositoryMultipleResultsLoader(CamelCaseMixin):
    """Parity: MetricsRepositoryMultipleResultsLoader.scala:33-59."""

    def __init__(self, entries: List[Tuple[ResultKey, AnalyzerContext]]):
        self._entries = list(entries)
        self._tag_filter: Optional[Dict[str, str]] = None
        self._before: Optional[int] = None
        self._after: Optional[int] = None
        self._analyzers: Optional[List[Analyzer]] = None

    def with_tag_values(self, tags: Dict[str, str]):
        self._tag_filter = tags
        return self

    def before(self, date: int):
        self._before = date
        return self

    def after(self, date: int):
        self._after = date
        return self

    def for_analyzers(self, analyzers: List[Analyzer]):
        self._analyzers = list(analyzers)
        return self

    def get(self) -> List[Tuple[ResultKey, AnalyzerContext]]:
        out = []
        for key, ctx in self._entries:
            if self._before is not None and key.dataset_date > self._before:
                continue
            if self._after is not None and key.dataset_date < self._after:
                continue
            if self._tag_filter is not None:
                tags = key.tag_dict
                if not all(tags.get(k) == v for k, v in self._tag_filter.items()):
                    continue
            if self._analyzers is not None:
                filtered = AnalyzerContext({
                    a: m for a, m in ctx.metric_map.items()
                    if a in self._analyzers})
                out.append((key, filtered))
            else:
                out.append((key, ctx))
        return sorted(out, key=lambda e: e[0].dataset_date)

    def _simplified_rows(self, with_tags=None):
        """Flattened successful metrics joined with their ResultKey: one
        column per tag seen across ANY key (null where a key lacks it),
        plus dataset_date (parity:
        MetricsRepositoryMultipleResultsLoader.scala
        getSuccessMetricsAsDataFrame/Json and its test expectations).
        ``with_tags`` restricts which tags become columns
        (AnalysisResult.scala getSuccessMetricsAsDataFrame withTags)."""
        entries = self.get()
        tag_names = sorted({t for key, _ in entries for t in key.tag_dict
                            if with_tags is None or t in with_tags})
        # tag → output column, parity AnalysisResult.scala:110-135
        # (formatTagColumnNameInDataFrame/Json): strip non-[A-Za-z0-9_],
        # lowercase, and suffix '_2' when the name collides with a metric
        # column — so a tag named 'name' or 'value' can never silently
        # overwrite metric data in the simplified output
        taken = {"entity", "instance", "name", "value", "dataset_date"}
        col_for = {}
        for t in tag_names:
            col = re.sub(r"[^A-Za-z0-9_]", "", t).lower()
            while col in taken:
                col = col + "_2"
            taken.add(col)
            col_for[t] = col
        rows = []
        for key, ctx in entries:
            tags = key.tag_dict
            for analyzer, metric in ctx.metric_map.items():
                where = getattr(analyzer, "where", None)
                flattened = getattr(metric, "flattened", None)
                for m in (flattened if flattened is not None else [metric]):
                    if not m.is_success or isinstance(m.value, bool) \
                            or not isinstance(m.value, (int, float)):
                        continue
                    name = (f"{m.name} (where: {where})"
                            if where is not None else m.name)
                    row = {"entity": m.entity.value, "instance": m.instance,
                           "name": name, "value": float(m.value),
                           "dataset_date": key.dataset_date}
                    for t in tag_names:
                        row[col_for[t]] = tags.get(t)
                    rows.append(row)
        return rows, [col_for[t] for t in tag_names]

    def get_success_metrics_as_dataframe(self, spark,
                                         with_tags=None) -> "Any":
        from pyspark.sql import types as T
        rows, tag_names = self._simplified_rows(with_tags)
        schema = T.StructType(
            [T.StructField("entity", T.StringType()),
             T.StructField("instance", T.StringType()),
             T.StructField("name", T.StringType()),
             T.StructField("value", T.DoubleType()),
             T.StructField("dataset_date", T.LongType())]
            + [T.StructField(t, T.StringType()) for t in tag_names])
        return spark.createDataFrame(
            [tuple(r[f.name] for f in schema.fields) for r in rows], schema)

    def get_success_metrics_as_json(self, with_tags=None) -> str:
        rows, _ = self._simplified_rows(with_tags)
        return json.dumps(rows)


def _successful_only(context: AnalyzerContext) -> AnalyzerContext:
    """Repositories persist only SUCCESSFUL metrics (parity:
    FileSystemMetricsRepositoryTest.scala:67-92 'save should ignore
    failed result metrics when saving')."""
    return AnalyzerContext({a: m for a, m in context.metric_map.items()
                            if m.is_success})


class MetricsRepository:
    def save(self, key: ResultKey, context: AnalyzerContext) -> None:
        raise NotImplementedError

    def load_by_key(self, key: ResultKey) -> Optional[AnalyzerContext]:
        raise NotImplementedError

    def load(self) -> MetricsRepositoryMultipleResultsLoader:
        raise NotImplementedError


class InMemoryMetricsRepository(CamelCaseMixin, MetricsRepository,
                                metaclass=PyDeequCompatMeta):
    __strip_leading_spark__ = True      # PyDeequ passes spark first

    """Parity: memory/InMemoryMetricsRepository.scala."""

    def __init__(self):
        self._store: Dict[ResultKey, AnalyzerContext] = {}

    def save(self, key: ResultKey, context: AnalyzerContext) -> None:
        context = _successful_only(context)
        existing = self._store.get(key)
        if existing is not None:
            context = existing + context
        self._store[key] = AnalyzerContext(dict(context.metric_map))

    def load_by_key(self, key: ResultKey) -> Optional[AnalyzerContext]:
        return self._store.get(key)

    def load(self) -> MetricsRepositoryMultipleResultsLoader:
        return MetricsRepositoryMultipleResultsLoader(list(self._store.items()))


class FileSystemMetricsRepository(CamelCaseMixin, MetricsRepository,
                                  metaclass=PyDeequCompatMeta):
    __strip_leading_spark__ = True      # PyDeequ passes spark first

    """JSON-file-backed repository
    (parity: fs/FileSystemMetricsRepository.scala)."""

    def __init__(self, path: str, format: str = "native"):
        """``format="deequ"`` writes the reference engine's JSON wire
        format (readable by it); reads auto-detect either format."""
        if format not in ("native", "deequ"):
            raise ValueError("format must be 'native' or 'deequ'")
        self.path = path
        self.format = format

    def _read_all(self) -> List[Dict[str, Any]]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return json.load(f)

    def _write_all(self, entries: List[Dict[str, Any]]) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entries, f, default=str)
        os.replace(tmp, self.path)

    def save(self, key: ResultKey, context: AnalyzerContext) -> None:
        entries = self._read_all()
        serialized_key = {"dataSetDate": key.dataset_date, "tags": key.tag_dict}
        merged = _successful_only(context)
        kept = []
        for e in entries:
            if e["resultKey"] == serialized_key:
                _, existing = deserialize_context(e)
                merged = existing + merged
            else:
                kept.append(e)
        if self.format == "deequ":
            kept.append(json.loads(to_deequ_json([(key, merged)]))[0])
        else:
            kept.append(serialize_context(key, merged))
        self._write_all(kept)

    def load_by_key(self, key: ResultKey) -> Optional[AnalyzerContext]:
        for e in self._read_all():
            k, ctx = deserialize_context(e)
            if k == key:
                return ctx
        return None

    def load(self) -> MetricsRepositoryMultipleResultsLoader:
        return MetricsRepositoryMultipleResultsLoader(
            [deserialize_context(e) for e in self._read_all()])


class SparkTableMetricsRepository(MetricsRepository):
    """Metrics as rows of a Spark table (append-only; any catalog/format)
    so the metric time-series is queryable with plain SQL at cluster scale
    (parity: sparktable/SparkMetricsRepository.scala)."""

    SCHEMA = ("dataset_date long, tags map<string,string>, "
              "serialized_context string")

    def __init__(self, spark, table_name: str, path: Optional[str] = None):
        self.spark = spark
        self.table = table_name
        self.path = path

    def _table_exists(self) -> bool:
        return self.spark.catalog.tableExists(self.table)

    def save(self, key: ResultKey, context: AnalyzerContext) -> None:
        context = _successful_only(context)
        row = [(key.dataset_date, key.tag_dict,
                json.dumps(serialize_context(key, context), default=str))]
        writer = (self.spark.createDataFrame(row, self.SCHEMA)
                  .write.mode("append").format("parquet"))
        if self.path:
            writer = writer.option("path", self.path)
        writer.saveAsTable(self.table)

    def _entries(self) -> List[Tuple[ResultKey, AnalyzerContext]]:
        if not self._table_exists():
            return []
        merged: Dict[ResultKey, AnalyzerContext] = {}
        for r in self.spark.table(self.table).collect():
            k, ctx = deserialize_context(json.loads(r["serialized_context"]))
            merged[k] = merged[k] + ctx if k in merged else ctx
        return list(merged.items())

    def load_by_key(self, key: ResultKey) -> Optional[AnalyzerContext]:
        for k, ctx in self._entries():
            if k == key:
                return ctx
        return None

    def load(self) -> MetricsRepositoryMultipleResultsLoader:
        return MetricsRepositoryMultipleResultsLoader(self._entries())


# --- reference wire-format interop ------------------------------------------
# Read/write the reference engine's repository JSON
# (repository/AnalysisResultSerde.scala) so an existing metrics repository
# written by it can be loaded here unchanged, and vice versa:
#   [{"resultKey": {"dataSetDate": ..., "tags": {...}},
#     "analyzerContext": {"metricMap": [{"analyzer": {"analyzerName": ...},
#                                        "metric": {"metricName": ...}}]}}]

def _ref_opts_load(obj):
    from .analyzers.scan import (AnalyzerOptions, FilteredRowOutcome,
                                 NullBehavior)
    o = obj.get("analyzerOptions")
    if not o:
        return None
    return AnalyzerOptions(NullBehavior(o["nullBehavior"]),
                           FilteredRowOutcome(o["filteredRow"]))


def _ref_opts_dump(analyzer):
    opts = getattr(analyzer, "analyzer_options", None)
    if opts is None:
        return None
    return {"nullBehavior": opts.null_behavior.value,
            "filteredRow": opts.filtered_row.value}


def deserialize_reference_analyzer(obj: Dict[str, Any]) -> Analyzer:
    """AnalysisResultSerde.scala:478-700 AnalyzerDeserializer."""
    from .analyzers import grouping, scan

    name = obj["analyzerName"]
    col = obj.get("column")
    where = obj.get("where")
    cols = tuple(obj.get("columns") or ())
    opts = _ref_opts_load(obj)

    if name == "Size":
        return scan.Size(where=where)
    if name == "Compliance":
        return scan.Compliance(obj["instance"], obj["predicate"], where,
                               cols, opts)
    if name == "PatternMatch":
        return scan.PatternMatch(col, obj["pattern"], where, opts)
    if name == "RatioOfSums":
        return scan.RatioOfSums(obj["numerator"], obj["denominator"], where)
    if name == "Correlation":
        return scan.Correlation(obj["firstColumn"], obj["secondColumn"],
                                where)
    if name == "ApproxQuantile":
        return scan.ApproxQuantile(col, obj["quantile"],
                                   obj.get("relativeError", 0.01), where)
    if name == "ApproxQuantiles":
        qs = tuple(float(q) for q in str(obj["quantiles"]).split(","))
        return scan.ApproxQuantiles(col, qs, obj.get("relativeError", 0.01))
    if name == "ExactQuantile":
        return scan.ExactQuantile(col, obj["quantile"], where)
    if name == "Histogram":
        return grouping.Histogram(
            col, max_detail_bins=obj.get("maxDetailBins", 1000), where=where,
            sum_column=obj.get("aggregateColumn"))
    if name == "HistogramBinned":
        edges = obj.get("customEdges")
        return grouping.HistogramBinned(
            col, bin_count=obj.get("binCount"),
            custom_edges=tuple(edges) if edges else None, where=where,
            include_overflow_bins=bool(obj.get("includeOverflowBins")))
    if name == "KLLSketch":
        from .analyzers.kll import KLLParameters, KLLSketch
        params = None
        if "sketchSize" in obj:
            params = KLLParameters(obj["sketchSize"], obj["shrinkingFactor"],
                                   obj["numberOfBuckets"])
        return KLLSketch(col, params)
    if name == "Range":
        return scan.ColumnRange(col, where)
    if name in ("Minimum", "Maximum", "MinLength", "MaxLength",
                "Completeness"):
        return getattr(scan, name)(col, where, analyzer_options=opts)
    if name in ("ZerosCount", "Sum", "Mean", "StandardDeviation", "Variance",
                "Skewness", "Kurtosis", "DataType", "ApproxCountDistinct",
                "InterquartileRange", "Entropy"):
        cls = getattr(scan, name, None) or getattr(grouping, name)
        return cls(col, where)
    if name in ("Uniqueness", "UniqueValueRatio"):
        return getattr(grouping, name)(cols, where, analyzer_options=opts)
    if name in ("CountDistinct", "Distinctness", "MutualInformation",
                "DuplicateRowCount"):
        kwargs = {} if name == "CountDistinct" else {"where": where}
        return getattr(grouping, name)(cols, **kwargs)
    raise ValueError(f"Unknown reference analyzer {name}")


def serialize_reference_analyzer(analyzer: Analyzer) -> Dict[str, Any]:
    """Inverse mapping — emits the reference's analyzer JSON shape."""
    name = type(analyzer).__name__
    out: Dict[str, Any] = {}
    ref_name = {"ColumnRange": "Range"}.get(name, name)
    out["analyzerName"] = ref_name
    for our, ref in (("column", "column"), ("where", "where"),
                     ("pattern", "pattern"),
                     ("instance_name", "instance"), ("predicate", "predicate"),
                     ("numerator", "numerator"), ("denominator", "denominator"),
                     ("first_column", "firstColumn"),
                     ("second_column", "secondColumn"),
                     ("quantile", "quantile"),
                     ("relative_error", "relativeError"),
                     ("max_detail_bins", "maxDetailBins"),
                     ("bin_count", "binCount"),
                     ("include_overflow_bins", "includeOverflowBins"),
                     ("sum_column", "aggregateColumn")):
        v = getattr(analyzer, our, None)
        if v is not None and v is not False:
            out[ref] = v
    if name == "Entropy":
        # the reference serializes Entropy with a single COLUMN field
        out["column"] = analyzer.columns[0]
    elif getattr(analyzer, "columns", None) and name != "Histogram":
        out["columns"] = list(analyzer.columns)
        out.pop("column", None)
    if getattr(analyzer, "custom_edges", None):
        out["customEdges"] = list(analyzer.custom_edges)
    if getattr(analyzer, "quantiles", None):
        out["quantiles"] = ",".join(f"{q:g}" for q in analyzer.quantiles)
    if getattr(analyzer, "sum_column", None):
        # AnalysisResultSerde.scala Histogram.Sum branch: the aggregate
        # function rides as a discriminator next to aggregateColumn
        out["aggregateFunction"] = "sum"
    if name == "KLLSketch":
        p = analyzer.kll_parameters
        out["sketchSize"] = p.sketch_size
        out["shrinkingFactor"] = p.shrinking_factor
        out["numberOfBuckets"] = p.number_of_buckets
    opts = _ref_opts_dump(analyzer)
    if opts:
        out["analyzerOptions"] = opts
    if "where" not in out:
        out["where"] = None
    return out


def deserialize_reference_metric(obj: Dict[str, Any]) -> Metric:
    """AnalysisResultSerde.scala:829-900 MetricDeserializer."""
    kind = obj["metricName"]
    if kind == "DoubleMetric":
        return DoubleMetric(Entity(obj["entity"]), obj["name"],
                            obj["instance"], float(obj["value"]))
    if kind == "KeyedDoubleMetric":
        return KeyedDoubleMetric(Entity(obj["entity"]), obj["name"],
                                 obj["instance"], dict(obj["value"]))
    if kind in ("HistogramMetric", "HistogramBinnedMetric"):
        value = obj["value"]
        if "bins" in value:   # DistributionBinned
            values = {
                f"[{b['binStart']:.6g}, {b['binEnd']:.6g}"
                + ("]" if i == len(value["bins"]) - 1 else ")"):
                DistributionValue(b["frequency"], b.get("ratio", 0.0))
                for i, b in enumerate(value["bins"])}
            dist = Distribution(values, value.get("numberOfBins", len(values)),
                                null_count=value.get("nullCount", 0))
        else:
            dist = Distribution(
                {k: DistributionValue(v["absolute"], v["ratio"])
                 for k, v in value["values"].items()},
                value.get("numberOfBins", len(value["values"])),
                tail_count=value.get("tailCount", 0))
        return HistogramMetric(Entity.COLUMN, "Histogram", obj["column"], dist)
    if kind == "KLLMetric":
        # AnalysisResultSerde.scala:874-881 + BucketDistribution(De)Serializer
        # :1005-1071: value = {buckets[{lowValue,highValue,count}],
        # parameters[sketchSize, shrinkingFactor], data[[level-0…]…]}
        from .analyzers.kll import (BucketDistribution, BucketValue,
                                    KLLMetric, KLLParameters, KLLSketchCore)
        v = obj["value"]
        params = KLLParameters(int(v["parameters"][0]),
                               float(v["parameters"][1]),
                               max(len(v["buckets"]), 1))
        sketch = KLLSketchCore.reconstruct(
            params.sketch_size, params.shrinking_factor, v["data"])
        buckets = [BucketValue(float(b["lowValue"]), float(b["highValue"]),
                               int(b["count"])) for b in v["buckets"]]
        return KLLMetric(Entity.COLUMN, "KLL", obj["column"],
                         BucketDistribution(buckets, params, sketch))
    raise ValueError(f"Unknown reference metric {kind}")


_BIN_LABEL = None  # compiled lazily


def _parse_bin_label(label: str):
    """Invert the '[lo, hi)' / '[lo, hi]' interval labels our binned
    histograms use as Distribution keys back to (binStart, binEnd)."""
    global _BIN_LABEL
    if _BIN_LABEL is None:
        _BIN_LABEL = re.compile(r"^\[([^,]+), ([^)\]]+)[)\]]$")
    m = _BIN_LABEL.match(label)
    if not m:
        return None
    try:
        return float(m.group(1)), float(m.group(2))
    except ValueError:
        return None


def serialize_reference_metric(metric: Metric,
                               analyzer: Optional[Analyzer] = None
                               ) -> Dict[str, Any]:
    if not metric.is_success:
        raise ValueError("Unable to serialize failed metrics.")
    if isinstance(metric, KeyedDoubleMetric):
        return {"metricName": "KeyedDoubleMetric",
                "entity": metric.entity.value, "instance": metric.instance,
                "name": metric.name, "value": dict(metric.value)}
    if type(metric).__name__ == "KLLMetric":
        bd = metric.value
        return {"metricName": "KLLMetric", "column": metric.instance,
                "value": {
                    "buckets": [{"lowValue": b.low_value,
                                 "highValue": b.high_value,
                                 "count": b.count} for b in bd.buckets],
                    "parameters": [float(bd.parameters.sketch_size),
                                   float(bd.parameters.shrinking_factor)],
                    "data": [[float(x) for x in lvl]
                             for lvl in bd.sketch.compactors]}}
    if isinstance(metric, HistogramMetric):
        dist = metric.value
        # a BINNED histogram (HistogramBinned analyzer, or interval keys
        # throughout) serializes as the reference's HistogramBinnedMetric
        # bins array — binStart/binEnd recovered from the interval labels;
        # ±inf overflow edges survive (json emits them as ±Infinity,
        # matching gson's lenient writer)
        parsed = [(_parse_bin_label(k), v) for k, v in dist.values.items()]
        is_binned = (type(analyzer).__name__ == "HistogramBinned"
                     or (parsed and all(p[0] is not None for p in parsed)))
        if is_binned and all(p[0] is not None for p in parsed):
            value: Dict[str, Any] = {
                "numberOfBins": dist.number_of_bins,
                "bins": [{"binStart": lo, "binEnd": hi,
                          "frequency": dv.absolute, "ratio": dv.ratio}
                         for (lo, hi), dv in parsed]}
            if dist.null_count:
                value["nullCount"] = dist.null_count
            return {"metricName": "HistogramBinnedMetric",
                    "column": metric.instance,
                    "numberOfBins": dist.number_of_bins, "value": value}
        value = {"numberOfBins": dist.number_of_bins, "values": {
            k: {"absolute": v.absolute, "ratio": v.ratio}
            for k, v in dist.values.items()}}
        if dist.tail_count:
            value["tailCount"] = dist.tail_count
        return {"metricName": "HistogramMetric", "column": metric.instance,
                "numberOfBins": dist.number_of_bins, "value": value}
    return {"metricName": "DoubleMetric", "entity": metric.entity.value,
            "instance": metric.instance, "name": metric.name,
            "value": float(metric.value)}


def from_deequ_json(text: str) -> List[Tuple[ResultKey, AnalyzerContext]]:
    """Load entries from the reference engine's serialized repository."""
    out = []
    for rec in json.loads(text):
        rk = rec["resultKey"]
        key = ResultKey(rk["dataSetDate"],
                        tuple(sorted((rk.get("tags") or {}).items())))
        ctx = AnalyzerContext()
        for item in rec["analyzerContext"]["metricMap"]:
            try:
                analyzer = deserialize_reference_analyzer(item["analyzer"])
                ctx.metric_map[analyzer] = \
                    deserialize_reference_metric(item["metric"])
            except Exception:  # noqa: BLE001 — skip unknown entries
                continue
        out.append((key, ctx))
    return out


def to_deequ_json(entries: List[Tuple[ResultKey, AnalyzerContext]]) -> str:
    """Serialize entries in the reference engine's repository format."""
    recs = []
    for key, ctx in entries:
        metric_map = []
        for a, m in ctx.metric_map.items():
            # a FAILED metric is a serialization error, matching
            # AnalysisResultSerdeTest 'with mixed Values should fail'
            # (callers that want lenient writes filter with
            # _successful_only first, as the repositories do)
            metric_map.append({"analyzer": serialize_reference_analyzer(a),
                               "metric": serialize_reference_metric(m, a)})
        recs.append({"resultKey": {"dataSetDate": key.dataset_date,
                                   "tags": key.tag_dict},
                     "analyzerContext": {"metricMap": metric_map}})
    return json.dumps(recs)
