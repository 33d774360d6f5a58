"""Streaming frequent items — bounded-state Misra-Gries per hash bucket.

The unbounded-state trap: a streaming ``groupBy(value).count()`` keeps
one state row per DISTINCT value forever — on a URL/user-id column the
state store grows with the stream and eventually dominates checkpoint
time.  This operator keeps a **fixed** amount of state regardless of
cardinality: values are hashed into ``num_buckets`` groups and each
group's state is ONE Misra-Gries summary of ``capacity`` counters
(``diagnostics.misra_gries_fold`` — the same fold the batch operator
uses per partition), so total state is ``num_buckets * capacity``
(value, count) slots, period.

Soundness: a value's every occurrence lands in its one hash bucket, so
any value whose running total exceeds ``bucket_mass / (capacity + 1)``
is guaranteed a surviving counter (the MG undercount bound).  Survivor
counts are LOWER bounds, not exact — for an exact final answer feed the
survivors into the verify pass (:func:`verify_heavy_hitters`, a
broadcast semi-join + exact count over the at-rest data), which is
precisely the batch operator's pass 2.  The split mirrors the batch
design: bounded-state candidate generation where cardinality lives,
exact verification only over the tiny candidate set.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deequ_spark.diagnostics import misra_gries_fold

__all__ = ["streaming_heavy_hitters", "verify_heavy_hitters"]


def streaming_heavy_hitters(stream: DataFrame, column: str,
                            capacity: int = 64,
                            num_buckets: int = 32) -> DataFrame:
    """Maintain frequent-item candidates over a stream of ``column``
    values with bounded state; emits (bucket, value, mg_count) rows in
    UPDATE mode after each micro-batch (the current survivors of every
    bucket the batch touched; mg_count is a lower bound on the value's
    true running count).

    Values are tracked as strings (state-schema stability across types);
    NULLs are ignored.  State per bucket: two arrays of length <=
    ``capacity``.  The bucket hash spreads update work over
    ``num_buckets`` tasks — state never grows with distinct-value count.
    """
    if capacity < 1 or num_buckets < 1:
        raise ValueError("capacity and num_buckets must be >= 1")
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    prepared = (stream
                .select(F.col(column).cast("string").alias("value"))
                .where(F.col("value").isNotNull())
                .withColumn("bucket",
                            F.pmod(F.xxhash64("value"),
                                   F.lit(num_buckets)).cast("int")))

    output_schema = "bucket int, value string, mg_count long"
    state_schema = "vals array<string>, counts array<long>"

    def update_bucket(key: Tuple, pdfs: Iterator[pandas.DataFrame],
                      state: GroupState) -> Iterator[pandas.DataFrame]:
        if state.exists:
            vals, counts = state.get
            counters = dict(zip(list(vals), [int(c) for c in counts]))
        else:
            counters = {}
        for pdf in pdfs:
            counters = misra_gries_fold(
                counters, pdf["value"].value_counts(dropna=True).items(),
                capacity)
        state.update((list(counters.keys()),
                      [int(c) for c in counters.values()]))
        yield pandas.DataFrame({
            "bucket": [key[0]] * len(counters),
            "value": list(counters.keys()),
            "mg_count": [int(c) for c in counters.values()]})

    return (prepared.groupBy("bucket")
            .applyInPandasWithState(update_bucket, output_schema,
                                    state_schema, "update",
                                    GroupStateTimeout.NoTimeout))


def verify_heavy_hitters(df: DataFrame, column: str,
                         candidates: DataFrame,
                         min_fraction: float) -> DataFrame:
    """Exact-verify streaming candidates against the at-rest data: the
    batch pass 2 — broadcast the (tiny) candidate values, semi-join,
    exact count, keep ``count >= min_fraction * total``.  Returns
    (value, count, fraction), exact, provided ``min_fraction * total``
    exceeds every bucket's MG undercount bound (with the defaults,
    total/65 per bucket — amply true for any real threshold)."""
    from deequ_spark.diagnostics import verify_hitter_candidates
    if not (0.0 < min_fraction <= 1.0):
        raise ValueError("min_fraction must be in (0, 1]")
    values = (df.select(F.col(column).cast("string").alias("value"))
              .where(F.col("value").isNotNull()))
    return verify_hitter_candidates(values, candidates, min_fraction)
