"""Embedding-column quality analyzer — data-quality metrics for ML/vector
tables, integrated into the fused-scan analyzer framework (beyond the
reference, which predates vector columns; follows the same
State/Metric algebra as analyzers/scan.py).

Metrics for an ``array<float|double>`` column, all from ONE fused scan:

* ``n_rows`` / ``n_null`` — completeness of the vector column;
* ``n_dim_mismatch`` — rows whose vector length differs from the
  declared dimension (these crash BLAS batches downstream);
* ``n_nan`` — rows containing NaN components;
* ``n_zero_norm`` — valid rows with zero L2 norm (undefined cosine);
* ``n_valid`` — rows usable for similarity search;
* ``mean_norm`` / ``min_norm`` / ``max_norm`` — L2-norm distribution of
  the valid rows.

Norms are accumulated as ``floor(norm · 1e6)`` integer micro-units, so
the state merge is EXACT (integer semigroup — no float reassociation
across partitions) and any ANSI-SQL engine replays the values
bit-for-bit: the same trick the streaming verification uses for sums.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import Column, Row
from pyspark.sql import functions as F

from ..metrics import Entity, KeyedDoubleMetric, Metric
from .base import (EmptyStateError, ScanShareableAnalyzer, State,
                   conditional_count, has_column, if_no_nulls_in)


@dataclass(frozen=True)
class EmbeddingStatsState(State):
    n: int
    n_null: int
    n_dim_mismatch: int
    n_nan: int
    n_zero_norm: int
    n_valid: int
    sum_norm_micro: int
    min_norm_micro: Optional[int]
    max_norm_micro: Optional[int]

    def merge(self, other: "EmbeddingStatsState") -> "EmbeddingStatsState":
        def opt(f, a, b):
            if a is None:
                return b
            if b is None:
                return a
            return f(a, b)
        return EmbeddingStatsState(
            self.n + other.n,
            self.n_null + other.n_null,
            self.n_dim_mismatch + other.n_dim_mismatch,
            self.n_nan + other.n_nan,
            self.n_zero_norm + other.n_zero_norm,
            self.n_valid + other.n_valid,
            self.sum_norm_micro + other.sum_norm_micro,
            opt(min, self.min_norm_micro, other.min_norm_micro),
            opt(max, self.max_norm_micro, other.max_norm_micro))


@dataclass(frozen=True, eq=False)
class EmbeddingQuality(ScanShareableAnalyzer):
    """Fused-scan quality metrics for an embedding column (see module
    docstring). ``expected_dim`` declares the contract dimension; rows
    deviating from it are counted (and excluded from norm stats)."""
    column: str
    expected_dim: int
    where: Optional[str] = None

    name = "EmbeddingQuality"
    entity = Entity.COLUMN

    @property
    def instance(self) -> str:
        return self.column

    def preconditions(self):
        return [has_column(self.column)]

    def _exprs(self):
        vec = F.col(self.column)
        is_null = vec.isNull()
        dim_ok = ~is_null & (F.size(vec) == self.expected_dim)
        # coalesce: a NULL *element* makes EXISTS(isnan) NULL (three-valued
        # logic), which would leave the row outside every bucket; count it
        # as NaN-like so n_null+n_dim_mismatch+n_nan+n_valid == n_rows
        has_nan = dim_ok & F.coalesce(
            F.exists(vec, lambda x: x.isNull() | F.isnan(x.cast("double"))),
            F.lit(True))
        valid = dim_ok & ~has_nan
        norm = F.sqrt(F.aggregate(
            F.transform(vec, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x))
        norm_micro = F.floor(norm * F.lit(1e6)).cast("long")
        return is_null, dim_ok, has_nan, valid, norm_micro

    def aggregation_functions(self) -> List[Column]:
        is_null, dim_ok, has_nan, valid, norm_micro = self._exprs()
        cond = (F.expr(self.where) if self.where else F.lit(True))

        def csum(flag):
            return F.sum(F.when(cond & flag, 1).otherwise(0).cast("long"))

        vmicro = F.when(cond & valid, norm_micro)
        return [conditional_count(self.where),
                csum(is_null),
                csum(~is_null & (F.size(F.col(self.column))
                                 != self.expected_dim)),
                csum(has_nan),
                csum(valid & (norm_micro == 0)),
                csum(valid),
                F.coalesce(F.sum(vmicro), F.lit(0).cast("long")),
                F.min(vmicro),
                F.max(vmicro)]

    def from_aggregation_result(self, result: Row, offset: int):
        # the 6 count/csum fields are NULL exactly when the input had no
        # rows (SQL SUM over zero rows) → clean empty state, matching the
        # other analyzers' EmptyStateError path; min/max stay legitimately
        # NULL whenever no row is valid, so they are NOT part of the check
        if not if_no_nulls_in(result, offset, 6):
            return None
        return EmbeddingStatsState(
            int(result[offset]), int(result[offset + 1]),
            int(result[offset + 2]), int(result[offset + 3]),
            int(result[offset + 4]), int(result[offset + 5]),
            int(result[offset + 6]),
            None if result[offset + 7] is None else int(result[offset + 7]),
            None if result[offset + 8] is None else int(result[offset + 8]))

    def compute_metric_from_state(self, state) -> Metric:
        if state is None:
            return self.to_failure_metric(EmptyStateError("Empty state"))
        values = {
            "n_rows": float(state.n),
            "n_null": float(state.n_null),
            "n_dim_mismatch": float(state.n_dim_mismatch),
            "n_nan": float(state.n_nan),
            "n_zero_norm": float(state.n_zero_norm),
            "n_valid": float(state.n_valid),
            "mean_norm": ((state.sum_norm_micro / state.n_valid) / 1e6
                          if state.n_valid else 0.0),
            "min_norm": (state.min_norm_micro / 1e6
                         if state.min_norm_micro is not None else 0.0),
            "max_norm": (state.max_norm_micro / 1e6
                         if state.max_norm_micro is not None else 0.0),
        }
        return KeyedDoubleMetric(self.entity, self.name, self.instance,
                                 values)
