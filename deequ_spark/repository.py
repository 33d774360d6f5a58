"""Metrics repository — persisted metric time-series keyed by ResultKey.

Reference parity: /root/reference/src/main/scala/com/amazon/deequ/repository/
{MetricsRepository,MetricsRepositoryMultipleResultsLoader}.scala:25-59,
fs/FileSystemMetricsRepository.scala, memory/InMemoryMetricsRepository.scala,
AnalysisResultSerde.scala (JSON serde of every analyzer+metric).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from .analyzers.base import Analyzer
from .metrics import (Distribution, DistributionValue, DoubleMetric, Entity,
                      HistogramMetric, KeyedDoubleMetric, Metric)
from .runners.analysis_runner import AnalyzerContext


@dataclass(frozen=True)
class ResultKey:
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
    key = ResultKey(rk["dataSetDate"], tuple(sorted(rk.get("tags", {}).items())))
    ctx = AnalyzerContext()
    for item in data["analyzerContext"]:
        try:
            analyzer = deserialize_analyzer(item["analyzer"])
        except Exception:  # noqa: BLE001 — skip unknown analyzers
            continue
        ctx.metric_map[analyzer] = deserialize_metric(item["metric"])
    return key, ctx


# --- query DSL --------------------------------------------------------------

class MetricsRepositoryMultipleResultsLoader:
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

    def get_success_metrics_as_json(self) -> str:
        return json.dumps([serialize_context(k, c) for k, c in self.get()])


class MetricsRepository:
    def save(self, key: ResultKey, context: AnalyzerContext) -> None:
        raise NotImplementedError

    def load_by_key(self, key: ResultKey) -> Optional[AnalyzerContext]:
        raise NotImplementedError

    def load(self) -> MetricsRepositoryMultipleResultsLoader:
        raise NotImplementedError


class InMemoryMetricsRepository(MetricsRepository):
    """Parity: memory/InMemoryMetricsRepository.scala."""

    def __init__(self):
        self._store: Dict[ResultKey, AnalyzerContext] = {}

    def save(self, key: ResultKey, context: AnalyzerContext) -> None:
        existing = self._store.get(key)
        if existing is not None:
            context = existing + context
        self._store[key] = AnalyzerContext(dict(context.metric_map))

    def load_by_key(self, key: ResultKey) -> Optional[AnalyzerContext]:
        return self._store.get(key)

    def load(self) -> MetricsRepositoryMultipleResultsLoader:
        return MetricsRepositoryMultipleResultsLoader(list(self._store.items()))


class FileSystemMetricsRepository(MetricsRepository):
    """JSON-file-backed repository
    (parity: fs/FileSystemMetricsRepository.scala)."""

    def __init__(self, path: str):
        self.path = path

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
        merged = context
        kept = []
        for e in entries:
            if e["resultKey"] == serialized_key:
                _, existing = deserialize_context(e)
                merged = existing + merged
            else:
                kept.append(e)
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
