"""Streaming token-distribution drift monitoring.

The streaming counterpart of :func:`deequ_spark.llm.search.corpus_drift`:
watch a document stream and score every micro-batch's token
distribution against a FIXED reference corpus — the standing guard for
"the crawler broke / the upstream source changed" between full-corpus
refreshes.

PSI practice fixes the binning at the reference: the comparison
vocabulary is the reference's top-``top_n`` tokens, everything else
(including tokens the reference never saw) folds into one
``__OTHER__`` bucket. That makes the per-batch state O(top_n) — one
small groupBy per batch, a driver-side PSI/L∞ over ≤ top_n+1 floats —
regardless of stream volume, and every batch is scored against the
same yardstick.

Scale design: the reference head is computed ONCE (one
map-side-combined groupBy + TakeOrdered on the baseline); per batch,
tokens explode map-only, a BROADCAST semi-join restricts them to the
reference vocabulary (tiny by construction) and one combinable groupBy
produces ≤ top_n rows. Nothing unbounded accumulates: ``cumulative``
mode folds integer count dicts on the driver, O(top_n) memory.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..distance import l_infinity_distance, psi
from ..llm.search import WORD_PATTERN, token_frequencies, word_tokens

__all__ = ["StreamingDriftMonitor", "DriftBatchResult"]


@dataclass
class DriftBatchResult:
    """Drift scores for one micro-batch (and cumulatively, so far)."""

    batch_id: int
    n_tokens: int
    psi: float
    l_infinity: float
    cumulative_psi: float
    alert: bool
    counts: Dict[str, int] = field(repr=False, default_factory=dict)


class StreamingDriftMonitor:
    """``foreachBatch`` hook scoring each micro-batch's token
    distribution against the reference. ``psi_threshold`` (when set)
    raises the ``alert`` flag on a batch whose PSI exceeds it — the
    conventional alarm levels are 0.1 (investigate) and 0.25 (act).

    Pass the instance itself (callable) to ``foreachBatch``; read
    ``results`` / ``latest`` afterwards."""

    def __init__(self, baseline_df: DataFrame, text_col: str,
                 top_n: int = 200,
                 psi_threshold: Optional[float] = None,
                 pattern: str = WORD_PATTERN):
        self.text_col = text_col
        self.top_n = top_n
        self.psi_threshold = psi_threshold
        self.pattern = pattern
        head = token_frequencies(baseline_df, text_col, top_n,
                                 pattern).collect()
        total = (baseline_df
                 .select(F.explode(word_tokens(F.col(text_col), pattern))
                         .alias("t"))
                 .agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"])
        if not head or not total:
            raise ValueError("baseline corpus has no tokens")
        self.vocab = sorted(r["token"] for r in head)
        self.reference: Dict[str, float] = {
            r["token"]: float(r["freq"]) for r in head}
        self.reference["__OTHER__"] = float(
            total - sum(self.reference.values()))
        self._cum_counts: Dict[str, float] = {}
        self.results: List[DriftBatchResult] = []

    # -- the foreachBatch hook -------------------------------------------

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        toks = batch_df.select(
            F.explode(word_tokens(F.col(self.text_col), self.pattern))
            .alias("t"))
        keys = spark.createDataFrame([(k,) for k in self.vocab],
                                     "t string")
        got = (toks.join(F.broadcast(keys), "t")
               .groupBy("t").agg(F.count(F.lit(1)).alias("c")).collect())
        total = toks.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]
        counts = {k: 0.0 for k in self.vocab}
        counts.update({r["t"]: float(r["c"]) for r in got})
        counts["__OTHER__"] = float(total) - sum(
            counts[k] for k in self.vocab)

        for k, v in counts.items():
            self._cum_counts[k] = self._cum_counts.get(k, 0.0) + v

        batch_psi = psi(self.reference, counts) if total else 0.0
        cum_psi = psi(self.reference, self._cum_counts) \
            if sum(self._cum_counts.values()) else 0.0
        linf = l_infinity_distance(self.reference, counts) \
            if total else 0.0
        self.results.append(DriftBatchResult(
            int(batch_id), int(total), batch_psi, linf, cum_psi,
            self.psi_threshold is not None
            and batch_psi > self.psi_threshold,
            counts))

    __call__ = foreach_batch

    @property
    def latest(self) -> Optional[DriftBatchResult]:
        return self.results[-1] if self.results else None
