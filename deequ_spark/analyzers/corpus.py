"""Corpus-level data-quality analyzers over LLM-pipeline operators.

Bridges the two halves of the engine: the dedup operators in
``deequ_spark.llm`` become regular analyzers, so corpus health rides
the same VerificationSuite / Check / repository / anomaly machinery as
every reference metric — "near-duplicate ratio must stay under 20%,
alert when it jumps batch-over-batch" is now one check plus one
anomaly strategy, no bespoke plumbing.

No reference counterpart (the reference has no corpus operators);
the analyzer contract follows DatasetMatchAnalyzer
(comparison.py:256-322) — standalone compute path, mergeable counter
state.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .base import (Analyzer, DoubleMetric, Entity, State,
                   metric_from_failure)

__all__ = ["NearDuplicateRatio", "NearDupState"]


@dataclass
class NearDupState(State):
    """(losers, total) counter pair. Merging SUMS the pair — exact when
    the merged partitions were deduplicated against each other (one
    corpus split for scale), a LOWER BOUND when they were deduplicated
    independently (cross-partition duplicates go uncounted)."""

    losers: int
    total: int

    def merge(self, other: "NearDupState") -> "NearDupState":
        return NearDupState(self.losers + other.losers,
                            self.total + other.total)

    __add__ = merge

    @property
    def ratio(self) -> float:
        return self.losers / self.total if self.total else 0.0


class NearDuplicateRatio(Analyzer):
    """Fraction of documents that are near-duplicate LOSERS — the mass
    a keep-one-per-cluster dedup pass would remove. ``method``:

    * ``'minhash'`` (default) — MinHash-LSH candidates, exact-Jaccard
      verified, connected components (the scalable path: banded, hot
      buckets star-capped).
    * ``'jaccard'`` — exact shingle-Jaccard pairs via the df-capped
      inverted index (small/medium corpora; no probabilistic recall).
    * ``'exact'`` — byte-identical text only (hash groupBy).

    The metric is DATASET-scoped with instance = the text column. An
    optional ``where`` filter scopes the corpus (three-valued row-level
    semantics do not apply — this is a dataset metric)."""

    name = "NearDuplicateRatio"
    entity = Entity.DATASET

    def __init__(self, id_col: str, text_col: str,
                 threshold: float = 0.8, method: str = "minhash",
                 shingle_n: int = 3, where: Optional[str] = None):
        if method not in ("minhash", "jaccard", "exact"):
            raise ValueError(
                "method must be 'minhash', 'jaccard' or 'exact'")
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold
        self.method = method
        self.shingle_n = shingle_n
        self.where = where

    @property
    def instance(self) -> str:
        return self.text_col

    def preconditions(self):
        def cols_exist(schema):
            names = [f.name for f in schema.fields]
            for c in (self.id_col, self.text_col):
                if c not in names:
                    raise ValueError(
                        f"Input data does not include column {c}!")
        return [cols_exist]

    def columns_referenced(self):
        return [self.id_col, self.text_col]

    def compute_state_from(self, df: DataFrame) -> Optional[NearDupState]:
        from ..llm.dedup import (deduplicate_exact,
                                 jaccard_similarity_pairs,
                                 minhash_lsh_pairs,
                                 near_duplicate_components)
        if self.where:
            df = df.where(self.where)
        df = df.select(self.id_col, self.text_col)
        total = df.count()
        if total == 0:
            return NearDupState(0, 0)
        if self.method == "exact":
            kept = deduplicate_exact(df, [self.text_col]).count()
            return NearDupState(total - kept, total)
        if self.method == "minhash":
            pairs = minhash_lsh_pairs(df, self.id_col, self.text_col,
                                      self.threshold,
                                      shingle_n=self.shingle_n)
        else:
            pairs = jaccard_similarity_pairs(df, self.id_col,
                                             self.text_col,
                                             self.threshold,
                                             shingle_n=self.shingle_n)
        comps = near_duplicate_components(pairs)
        losers = comps.where(F.col("id") != F.col("component")).count()
        return NearDupState(int(losers), int(total))

    def compute_metric_from_state(self, state):
        if state is None or state.total == 0:
            return metric_from_failure(
                ValueError("Empty corpus — ratio undefined"), self.name,
                self.instance, Entity.DATASET)
        return DoubleMetric(Entity.DATASET, self.name, self.instance,
                            state.ratio)
