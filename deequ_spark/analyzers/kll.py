"""KLL quantile sketch analyzer (SURVEY §2c).

Reference parity (semantics only):
/root/reference/src/main/scala/com/amazon/deequ/analyzers/KLLSketch.scala:90-177
(analyzer, defaults sketchSize=2048 shrinkingFactor=0.64 buckets<=100),
runners/KLLRunner.scala:88-123 (one extra pass for ALL KLL columns combined:
per-partition sketches merged into one), QuantileNonSample.scala:25-306 +
NonSampleCompactor.scala:29-80 (the sketch itself).

Spark-first implementation: instead of the reference's
``rdd.mapPartitions(...).treeReduce`` over JVM objects, we run ONE
Arrow-batched ``mapInPandas`` pass that builds a numpy-backed KLL sketch per
(partition, column) and emits it pickled; the tiny per-partition sketches
(~k doubles each) are merged on the driver (the merge is a commutative
semigroup, so this is equivalent to treeReduce and keeps the State
incremental/persistable). All KLL analyzers in a run share the single pass.

The sketch follows the published KLL algorithm (Karnin, Lang, Liberty,
"Optimal quantile approximation in streams", FOCS'16) with lazy compaction
and geometrically decaying level capacities (shrinking factor c), the same
scheme as the reference's QuantileNonSample.
"""

from __future__ import annotations

import math
import pickle
import random
from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from ..metrics import Entity, Metric, metric_from_failure
from .base import Analyzer, State, has_column, is_numeric


@dataclass(frozen=True)
class KLLParameters:
    """Parity: KLLParameters.scala / KLLSketch.scala:175-177."""

    sketch_size: int = 2048
    shrinking_factor: float = 0.64
    number_of_buckets: int = 100


class KLLSketchCore:
    """Mergeable KLL sketch over doubles (driver- and executor-side)."""

    __slots__ = ("k", "c", "compactors", "size", "max_size", "count",
                 "min_value", "max_value", "_rng")

    def __init__(self, k: int = 2048, c: float = 0.64, seed: int = 41):
        self.k = k
        self.c = c
        self.compactors: List[np.ndarray] = [np.empty(0)]
        self.size = 0
        self.max_size = self._capacity(0)
        self.count = 0
        self.min_value = math.inf
        self.max_value = -math.inf
        # deterministic offsets → reproducible tests; seed varies per
        # partition via reseed() so merged sketches stay unbiased
        self._rng = random.Random(seed)

    def _capacity(self, level: int) -> int:
        height = len(self.compactors)
        depth = height - level - 1
        return max(2, int(math.ceil(self.k * (self.c ** depth))) + 1)

    def _total_capacity(self) -> int:
        return sum(self._capacity(lvl) for lvl in range(len(self.compactors)))

    def _grow(self) -> None:
        self.compactors.append(np.empty(0))
        self.max_size = self._total_capacity()

    def update_batch(self, values: np.ndarray) -> None:
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        self.count += int(values.size)
        self.min_value = min(self.min_value, float(values.min()))
        self.max_value = max(self.max_value, float(values.max()))
        # append in capacity-sized chunks so level 0 never balloons
        chunk = max(self._capacity(0), 1)
        for start in range(0, values.size, chunk):
            part = values[start:start + chunk]
            self.compactors[0] = np.concatenate([self.compactors[0], part])
            self.size += part.size
            while self.size >= self.max_size:
                self._compress()

    def _compress(self) -> None:
        for level in range(len(self.compactors)):
            if self.compactors[level].size >= self._capacity(level):
                if level + 1 >= len(self.compactors):
                    self._grow()
                items = np.sort(self.compactors[level])
                offset = self._rng.randrange(2)
                promoted = items[offset::2]
                self.compactors[level + 1] = np.concatenate(
                    [self.compactors[level + 1], promoted])
                self.compactors[level] = np.empty(0)
                self.size = sum(c.size for c in self.compactors)
                self.max_size = self._total_capacity()
                return
        # nothing exceeded capacity (can happen right after merge): done
        self.size = sum(c.size for c in self.compactors)

    @classmethod
    def reconstruct(cls, k: int, c: float,
                    data: Sequence[Sequence[float]]) -> "KLLSketchCore":
        """Rebuild a sketch from per-level compactor arrays (parity:
        QuantileNonSample.scala:46-60 ``reconstruct`` — the serde surface
        the reference test fixtures use). Level i items carry weight 2^i;
        ``count`` is recovered as the total weight."""
        s = cls(k, c)
        s.compactors = [np.asarray(level, dtype=np.float64)
                        for level in data]
        if not s.compactors:
            s.compactors = [np.empty(0)]
        s.size = sum(lvl.size for lvl in s.compactors)
        s.max_size = s._total_capacity()
        s.count = int(sum(lvl.size * (1 << i)
                          for i, lvl in enumerate(s.compactors)))
        nonempty = [lvl for lvl in s.compactors if lvl.size]
        if nonempty:
            s.min_value = float(min(lvl.min() for lvl in nonempty))
            s.max_value = float(max(lvl.max() for lvl in nonempty))
        return s

    def copy(self) -> "KLLSketchCore":
        import copy as _copy
        dup = KLLSketchCore.__new__(KLLSketchCore)
        dup.k, dup.c = self.k, self.c
        dup.compactors = [arr.copy() for arr in self.compactors]
        dup.size, dup.max_size = self.size, self.max_size
        dup.count = self.count
        dup.min_value, dup.max_value = self.min_value, self.max_value
        dup._rng = _copy.deepcopy(self._rng)
        return dup

    def merge(self, other: "KLLSketchCore") -> "KLLSketchCore":
        """Pure semigroup merge: returns a NEW sketch, never mutates either
        input (provider-held states must survive repeated merges)."""
        out = self.copy()
        while len(out.compactors) < len(other.compactors):
            out._grow()
        for lvl, items in enumerate(other.compactors):
            if items.size:
                out.compactors[lvl] = np.concatenate(
                    [out.compactors[lvl], items])
        out.size = sum(c.size for c in out.compactors)
        out.count += other.count
        out.min_value = min(out.min_value, other.min_value)
        out.max_value = max(out.max_value, other.max_value)
        while out.size >= out.max_size:
            out._compress()
        return out

    # -- queries ----------------------------------------------------------

    def _weighted_items(self) -> Tuple[np.ndarray, np.ndarray]:
        vals, weights = [], []
        for lvl, items in enumerate(self.compactors):
            if items.size:
                vals.append(items)
                weights.append(np.full(items.size, 2 ** lvl, dtype=np.float64))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def rank(self, value: float) -> float:
        """Estimated number of items <= value (scaled to true count)."""
        v, w = self._weighted_items()
        if v.size == 0:
            return 0.0
        total = w.sum()
        mask = v <= value
        return float(w[mask].sum() / total * self.count)

    def quantile(self, q: float) -> float:
        v, w = self._weighted_items()
        if v.size == 0:
            return math.nan
        if q <= 0:
            return self.min_value
        if q >= 1:
            return self.max_value
        cum = np.cumsum(w)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        idx = min(idx, v.size - 1)
        return float(v[idx])


@dataclass
class KLLState(State):
    """Mergeable KLL state. Parity: KLLState in KLLSketch.scala."""

    sketch: KLLSketchCore
    parameters: KLLParameters = field(default_factory=KLLParameters)

    def merge(self, other: "KLLState") -> "KLLState":
        merged = self.sketch.merge(other.sketch)
        return KLLState(merged, self.parameters)

    # alias used by incremental runners
    __add__ = merge


@dataclass(frozen=True)
class BucketValue:
    """Parity: metrics/BucketDistribution.scala (BucketValue)."""

    low_value: float
    high_value: float
    count: int


@dataclass
class BucketDistribution:
    """Equal-width bucketed view of the sketch + direct quantile access.

    Parity: metrics/BucketDistribution.scala — assertion surface of
    ``kllSketchSatisfies``.
    """

    buckets: List[BucketValue]
    parameters: KLLParameters
    sketch: KLLSketchCore

    def quantile(self, q: float) -> float:
        return self.sketch.quantile(q)

    def argmax(self) -> int:
        counts = [b.count for b in self.buckets]
        return int(np.argmax(counts)) if counts else -1

    @property
    def min_value(self) -> float:
        return self.sketch.min_value

    @property
    def max_value(self) -> float:
        return self.sketch.max_value

    def as_dict(self) -> Dict[str, Any]:
        return {
            "parameters": {
                "sketchSize": self.parameters.sketch_size,
                "shrinkingFactor": self.parameters.shrinking_factor,
                "numberOfBuckets": self.parameters.number_of_buckets,
            },
            "buckets": [
                {"lowValue": b.low_value, "highValue": b.high_value,
                 "count": b.count} for b in self.buckets
            ],
        }


@dataclass
class KLLMetric(Metric):
    """Parity: metrics/KLLMetric.scala."""

    value: Optional[BucketDistribution] = None
    error: Optional[BaseException] = None

    def as_dict(self) -> Dict[str, Any]:
        d = {"entity": self.entity.value, "instance": self.instance,
             "name": self.name}
        if self.value is not None:
            d["value"] = self.value.as_dict()
        else:
            d["error"] = str(self.error)
        return d

    @property
    def flattened(self):
        """Parity: KLLMetric.scala:103-120 — one ``KLL.buckets`` count
        metric plus per-bucket ``KLL.low``/``KLL.high``/``KLL.count``
        DoubleMetrics; a failed metric flattens to a single failed
        ``KLL.buckets``. Without this, success_metrics_as_json /
        _simplified_rows would call float() on a BucketDistribution."""
        from ..metrics import DoubleMetric
        if not self.is_success:
            return [DoubleMetric(self.entity, f"{self.name}.buckets",
                                 self.instance, None, self.error)]
        out = [DoubleMetric(self.entity, f"{self.name}.buckets",
                            self.instance, float(len(self.value.buckets)))]
        for b in self.value.buckets:
            out.append(DoubleMetric(self.entity, f"{self.name}.low",
                                    self.instance, float(b.low_value)))
            out.append(DoubleMetric(self.entity, f"{self.name}.high",
                                    self.instance, float(b.high_value)))
            out.append(DoubleMetric(self.entity, f"{self.name}.count",
                                    self.instance, float(b.count)))
        return out


def _bucket_distribution(sketch: KLLSketchCore,
                         params: KLLParameters) -> BucketDistribution:
    """Parity: KLLSketch.scala:120-150 — equal-width buckets from the
    sketch's CDF between the EXACT global min/max."""
    n_buckets = params.number_of_buckets
    lo, hi = sketch.min_value, sketch.max_value
    if sketch.count == 0 or not math.isfinite(lo):
        return BucketDistribution([], params, sketch)
    if hi <= lo:
        return BucketDistribution(
            [BucketValue(lo, hi, sketch.count)], params, sketch)
    width = (hi - lo) / n_buckets
    buckets: List[BucketValue] = []
    # difference of ROUNDED cumulative ranks → bucket counts telescope to
    # exactly sketch.count (per-bucket rounding would leak mass)
    prev_cum = 0
    for i in range(n_buckets):
        b_lo = lo + i * width
        b_hi = hi if i == n_buckets - 1 else lo + (i + 1) * width
        cum = (sketch.count if i == n_buckets - 1
               else int(round(sketch.rank(b_hi))))
        buckets.append(BucketValue(b_lo, b_hi, cum - prev_cum))
        prev_cum = cum
    return BucketDistribution(buckets, params, sketch)


@dataclass(frozen=True, eq=False)
class KLLSketch(Analyzer):
    """KLL quantile sketch analyzer.

    Parity: KLLSketch.scala:90-177. Runs in ONE extra Arrow pass shared by
    all KLL analyzers in the same run (runner hook `run_kll_analyzers`).
    """

    column: str
    kll_parameters: KLLParameters = KLLParameters()

    name = "KLL"
    entity = Entity.COLUMN

    def __init__(self, column: str,
                 kll_parameters: Optional[KLLParameters] = None):
        object.__setattr__(self, "column", column)
        object.__setattr__(self, "kll_parameters",
                           kll_parameters or KLLParameters())

    @property
    def instance(self) -> str:
        return self.column

    def __eq__(self, other):
        return (isinstance(other, KLLSketch)
                and self.column == other.column
                and self.kll_parameters == other.kll_parameters)

    def __hash__(self):
        return hash(("KLLSketch", self.column, self.kll_parameters))

    def preconditions(self):
        return [has_column(self.column), is_numeric(self.column)]

    def columns_referenced(self):
        return [self.column]

    def compute_state_from(self, df: DataFrame) -> Optional[KLLState]:
        states = compute_kll_states(df, [self])
        return states.get(self)

    def compute_metric_from_state(self, state: Optional[KLLState]) -> Metric:
        if state is None or state.sketch.count == 0:
            return self.to_failure_metric(
                ValueError(f"Empty KLL state for column {self.column}"))
        dist = _bucket_distribution(state.sketch, self.kll_parameters)
        return KLLMetric(self.entity, self.name, self.instance, dist)

    def to_failure_metric(self, exc: BaseException) -> Metric:
        return KLLMetric(self.entity, self.name, self.instance, None,
                         exc if isinstance(exc, Exception) else Exception(str(exc)))

    def calculate(self, df: DataFrame) -> Metric:
        try:
            for check in self.preconditions():
                check(df.schema)
            return self.compute_metric_from_state(self.compute_state_from(df))
        except Exception as exc:  # noqa: BLE001
            return self.to_failure_metric(exc)


def compute_kll_states(data: DataFrame,
                       analyzers: Sequence[KLLSketch]
                       ) -> Dict[KLLSketch, KLLState]:
    """ONE extra pass for ALL KLL columns combined
    (parity: KLLRunner.scala:88-123, mapPartitions+treeReduce → here
    mapInPandas + driver-side semigroup merge of ~numPartitions tiny
    sketches)."""
    if not analyzers:
        return {}
    columns = sorted({a.column for a in analyzers})
    params_by_col: Dict[str, KLLParameters] = {}
    for a in analyzers:
        # one sketch per column; sized by the largest request
        prev = params_by_col.get(a.column)
        if prev is None or a.kll_parameters.sketch_size > prev.sketch_size:
            params_by_col[a.column] = a.kll_parameters
    params_items = sorted(params_by_col.items())

    projected = data.select(
        *[F.col(c).cast("double").alias(c) for c in columns])

    def sketch_partitions(batches: Iterator["pd.DataFrame"]):  # noqa: F821
        import pandas as pd  # local import for executor
        sketches = {
            col: KLLSketchCore(p.sketch_size, p.shrinking_factor,
                               seed=hash(col) & 0x7FFFFFFF)
            for col, p in params_items
        }
        saw_data = False
        for batch in batches:
            if not saw_data and len(batch):
                # per-partition reseed keeps compaction offsets independent
                for i, s in enumerate(sketches.values()):
                    s._rng.seed((id(batch) ^ (i * 2654435761)) & 0x7FFFFFFF)
                saw_data = True
            for col, sk in sketches.items():
                sk.update_batch(batch[col].to_numpy(dtype=np.float64,
                                                    na_value=np.nan))
        if saw_data:
            yield pd.DataFrame({
                "column": list(sketches.keys()),
                "sketch": [pickle.dumps(s) for s in sketches.values()],
            })

    rows = projected.mapInPandas(
        sketch_partitions, schema="column string, sketch binary").collect()

    merged: Dict[str, KLLSketchCore] = {}
    for row in rows:
        sk = pickle.loads(row["sketch"])
        if row["column"] in merged:
            merged[row["column"]] = merged[row["column"]].merge(sk)
        else:
            merged[row["column"]] = sk

    out: Dict[KLLSketch, KLLState] = {}
    for a in analyzers:
        sk = merged.get(a.column)
        if sk is not None and sk.count > 0:
            # each analyzer gets its OWN sketch so a later per-analyzer
            # state merge cannot double-count through a shared object
            out[a] = KLLState(sk.copy(), a.kll_parameters)
    return out
