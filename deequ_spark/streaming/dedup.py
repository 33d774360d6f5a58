"""Streaming deduplication — exact dedup over an unbounded stream with
bounded state.

Beyond the reference (no streaming there). Two flavors:

* ``streaming_deduplicate``: Spark's ``dropDuplicatesWithinWatermark`` —
  keeps one row per key among rows whose event times fall within the
  watermark delay of each other; state for a key is dropped once the
  watermark passes it, so state size is bounded by the key arrival rate ×
  the delay window, NOT by stream history. This is the only way exact
  dedup survives an unbounded 100 TB/day stream.
* ``streaming_deduplicate_exact``: plain ``dropDuplicates`` on a stream —
  state grows with the number of distinct keys FOREVER; only valid for
  key spaces known to be bounded (e.g. enum-like columns). Exposed with
  that warning because the reference-parity semantics (global exact
  dedup) are sometimes genuinely wanted.

Content-based dedup composes with ``llm.text.fingerprint``: add a
fingerprint column first, then dedup on it — the state then stores an
8-byte hash per document instead of the text.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_deduplicate(stream: DataFrame, keys: Sequence[str],
                          ts_col: str, delay: str = "10 minutes"
                          ) -> DataFrame:
    """Watermarked streaming dedup: one row per ``keys`` within the
    ``delay`` window, state evicted as the watermark advances."""
    wm = stream.withWatermark(ts_col, delay)
    try:
        return wm.dropDuplicatesWithinWatermark(list(keys))
    except AttributeError:  # Spark < 3.5 fallback: include ts in the key
        return wm.dropDuplicates(list(keys) + [ts_col])


def streaming_deduplicate_exact(stream: DataFrame, keys: Sequence[str],
                                ts_col: Optional[str] = None,
                                delay: str = "10 minutes") -> DataFrame:
    """Global exact dedup on a stream. WARNING: state is O(distinct keys)
    over the WHOLE stream lifetime — use only for bounded key spaces; for
    unbounded keys use :func:`streaming_deduplicate`. A watermark (when
    ``ts_col`` is given) still lets Spark drop late rows."""
    if ts_col is not None:
        stream = stream.withWatermark(ts_col, delay)
    return stream.dropDuplicates(list(keys))


def streaming_fingerprint_deduplicate(stream: DataFrame, text_col: str,
                                      ts_col: str, delay: str = "10 minutes",
                                      fingerprint_col: str = "__fp"
                                      ) -> DataFrame:
    """Content dedup for document streams: normalize + fingerprint the
    text (8-byte state per doc instead of the full text), then
    watermarked dedup on the fingerprint."""
    from ..llm.text import fingerprint
    with_fp = stream.withColumn(fingerprint_col,
                                fingerprint(F.col(text_col)))
    return (streaming_deduplicate(with_fp, [fingerprint_col], ts_col, delay)
            .drop(fingerprint_col))
