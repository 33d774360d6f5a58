"""Metric model.

Reference parity: ``com.amazon.deequ.metrics.Metric``
(/root/reference/src/main/scala/com/amazon/deequ/metrics/Metric.scala:23-96).
A metric is (entity, name, instance, value-or-error). We use plain Python
dataclasses; ``value`` is the success payload and ``error`` the failure one
(Scala's ``Try[T]``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Dict, Optional


class Entity(str, Enum):
    DATASET = "Dataset"
    COLUMN = "Column"
    MULTICOLUMN = "Multicolumn"


@dataclass(frozen=True)
class DistributionValue:
    """One histogram bin: absolute count + ratio.

    Parity: metrics/HistogramMetric.scala (Distribution/DistributionValue).
    """

    absolute: int
    ratio: float


@dataclass(frozen=True)
class Distribution:
    values: Dict[str, DistributionValue]
    number_of_bins: int
    tail_count: int = 0
    # binned histograms track NULLs separately from data bins
    # (parity: HistogramBinned.scala DistributionBinned.nullCount)
    null_count: int = 0

    def __getitem__(self, key: str) -> DistributionValue:
        return self.values[key]

    def as_dict(self) -> Dict[str, Any]:
        return {
            "numberOfBins": self.number_of_bins,
            "tailCount": self.tail_count,
            "values": {
                k: {"absolute": v.absolute, "ratio": v.ratio}
                for k, v in self.values.items()
            },
        }


@dataclass
class Metric:
    """Base metric; ``value`` is None iff ``error`` is set."""

    entity: Entity
    name: str
    instance: str
    value: Optional[Any] = None
    error: Optional[BaseException] = None

    @property
    def is_success(self) -> bool:
        return self.error is None

    def as_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {
            "entity": self.entity.value,
            "name": self.name,
            "instance": self.instance,
        }
        if self.is_success:
            v = self.value
            if isinstance(v, Distribution):
                v = v.as_dict()
            out["value"] = v
        else:
            out["error"] = f"{type(self.error).__name__}: {self.error}"
        return out


@dataclass
class DoubleMetric(Metric):
    """Single-double metric — the dominant kind (Metric.scala:63-72)."""

    value: Optional[float] = None

    @property
    def flattened(self):
        return [self]


@dataclass
class KeyedDoubleMetric(Metric):
    """Map[str, float] payload, e.g. ApproxQuantiles (Metric.scala:74-91)."""

    value: Optional[Dict[str, float]] = None

    @property
    def flattened(self):
        if not self.is_success:
            return [DoubleMetric(self.entity, self.name, self.instance, None, self.error)]
        return [
            DoubleMetric(self.entity, f"{self.name}.{k}", self.instance, v)
            for k, v in sorted(self.value.items())
        ]


@dataclass
class HistogramMetric(Metric):
    """Distribution payload (metrics/HistogramMetric.scala)."""

    value: Optional[Distribution] = None

    @property
    def flattened(self):
        if not self.is_success:
            # failure flattens to ONE .bins metric carrying the error
            # (MetricsTests.scala "flatten ... in case of an error")
            return [DoubleMetric(Entity.COLUMN, f"{self.name}.bins",
                                 self.instance, None, self.error)]
        out = [
            DoubleMetric(
                Entity.COLUMN, f"{self.name}.bins", self.instance,
                float(self.value.number_of_bins),
            )
        ]
        for k, dv in self.value.values.items():
            out.append(DoubleMetric(Entity.COLUMN, f"{self.name}.abs.{k}", self.instance, float(dv.absolute)))
            out.append(DoubleMetric(Entity.COLUMN, f"{self.name}.ratio.{k}", self.instance, dv.ratio))
        # tailCount only when a tail exists (HistogramMetric.scala:55-59)
        if self.value.tail_count > 0:
            out.append(DoubleMetric(Entity.COLUMN, f"{self.name}.tailCount",
                                    self.instance, float(self.value.tail_count)))
        return out


def metric_from_failure(exc: BaseException, name: str, instance: str,
                        entity: Entity = Entity.COLUMN) -> DoubleMetric:
    return DoubleMetric(entity=entity, name=name, instance=instance, value=None, error=exc)
