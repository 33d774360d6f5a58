"""Applicability checker — validate that a Check / set of Analyzers CAN
run against a schema before touching real (expensive) data.

Reference parity: /root/reference/src/main/scala/com/amazon/deequ/analyzers/
applicability/Applicability.scala:47-244 — generate a few rows of random
data matching the schema in-memory, run the check/analyzers on them, and
report per-constraint/per-analyzer applicability (an analyzer that needs a
numeric column fails fast on a string schema, without scanning anything).
"""

from __future__ import annotations

import datetime
import random
import string
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .analyzers.base import Analyzer
from .checks import Check


def _random_value(dtype: T.DataType, rng: random.Random):
    if isinstance(dtype, T.StringType):
        return "".join(rng.choice(string.ascii_letters) for _ in range(8))
    if isinstance(dtype, (T.IntegerType, T.LongType)):
        return rng.randrange(0, 1000)
    if isinstance(dtype, T.ShortType):
        return rng.randrange(0, 100)
    if isinstance(dtype, T.ByteType):
        return rng.randrange(0, 100)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return rng.random() * 100.0
    if isinstance(dtype, T.DecimalType):
        from decimal import Decimal
        return Decimal(rng.randrange(0, 10 ** min(dtype.precision, 6))) \
            / (10 ** dtype.scale)
    if isinstance(dtype, T.BooleanType):
        return rng.choice([True, False])
    if isinstance(dtype, T.TimestampType):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(
            seconds=rng.randrange(0, 10_000_000))
    if isinstance(dtype, T.DateType):
        return datetime.date(2024, 1, 1) + datetime.timedelta(
            days=rng.randrange(0, 365))
    if isinstance(dtype, T.BinaryType):
        return bytes(rng.randrange(256) for _ in range(8))
    if isinstance(dtype, T.ArrayType):
        return [_random_value(dtype.elementType, rng) for _ in range(3)]
    return None


def generate_random_data(spark: SparkSession, schema: T.StructType,
                         num_rows: int = 4, seed: int = 42):
    """A tiny in-memory DataFrame matching ``schema``
    (parity: Applicability.scala:56-163)."""
    rng = random.Random(seed)
    rows = [tuple(_random_value(f.dataType, rng) for f in schema.fields)
            for _ in range(num_rows)]
    return spark.createDataFrame(rows, schema)


@dataclass
class ApplicabilityResult:
    """Parity: CheckApplicability / AnalyzersApplicability."""

    is_applicable: bool
    failures: Dict[str, str] = field(default_factory=dict)


class Applicability:
    """Parity: Applicability.scala:47-244 — same trick, PySpark-native."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def is_applicable(self, check_or_analyzers, schema: T.StructType
                      ) -> ApplicabilityResult:
        try:
            data = generate_random_data(self.spark, schema)
        except Exception as exc:  # noqa: BLE001 — unsupported field type
            return ApplicabilityResult(False, {"<schema>": str(exc)})
        failures: Dict[str, str] = {}
        if isinstance(check_or_analyzers, Check):
            from .verification import VerificationSuite
            result = (VerificationSuite().on_data(data)
                      .add_check(check_or_analyzers).run())
            check_result = result.check_results[check_or_analyzers]
            for cr in check_result.constraint_results:
                # a failed ASSERTION on random data is still applicable;
                # only metric-computation errors mean "not applicable"
                if cr.status.value != "Success" and cr.message \
                        and cr.message.startswith("metric computation failed"):
                    failures[str(cr.constraint)] = str(cr.message)
        else:
            analyzers: Sequence[Analyzer] = check_or_analyzers
            for a in analyzers:
                metric = a.calculate(data)
                if not metric.is_success:
                    failures[f"{a.name}({a.instance})"] = str(metric.error)
        return ApplicabilityResult(not failures, failures)
