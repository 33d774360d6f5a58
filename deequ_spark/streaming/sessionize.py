"""Sessionization — gap-based event sessions, batch and streaming.

Beyond the reference (no streaming there at all). Two implementations of
the same semantics (events of one key belong to the same session while
consecutive gaps are <= ``gap_seconds``):

* ``sessionize`` (batch): pure window expressions — lag + cumulative sum
  of session-break flags. One shuffle on the key column; stays entirely
  in whole-stage codegen. SQL-expressible, so it sits under the DuckDB
  oracle gate.
* ``sessionize_stream`` (streaming): ``applyInPandasWithState`` keeps one
  open session per key in group state and emits sessions as they CLOSE
  (a new event arrives more than the gap after the last one, or the
  state times out). This is the engine's example of a custom stateful
  streaming operator the built-in aggregates can't express.

Scale notes: both shuffle once on the key. Skewed keys (one user with
millions of events) dominate a partition — pre-split such keys by day
before sessionizing if needed.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import pandas

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _epoch_seconds(col: Column, dtype=None) -> Column:
    """Timestamp-ish column -> seconds-since-epoch as double.

    TIMESTAMP stores an instant, so ``CAST(x AS DOUBLE)`` is exact and
    DST-free. TIMESTAMP_NTZ (parquet with isAdjustedToUTC=0) stores
    zone-less wall-clock fields; routing it through a TIMESTAMP cast
    interprets those fields in the *session* zone, and across a DST
    transition two wall clocks 30 min apart can map to instants 90 min
    apart (fall-back), wrongly splitting/merging sessions. So when the
    caller tells us the column is NTZ we compute wall-clock seconds
    directly from the date/time fields — no time zone is consulted
    anywhere, so the result is the same in every session zone. Numeric
    inputs survive the timestamp round-trip unchanged.
    """
    if isinstance(dtype, TimestampNTZType):
        return (F.unix_date(col.cast("date")).cast("double") * 86400.0
                + F.hour(col).cast("double") * 3600.0
                + F.minute(col).cast("double") * 60.0
                + F.date_part(F.lit("SECOND"), col).cast("double"))
    return col.cast("timestamp").cast("double")


def sessionize(df: DataFrame, key_col: str, ts_col: str,
               gap_seconds: int = 1800,
               session_col: str = "session_id") -> DataFrame:
    """Assign a per-key session index (0-based, ordered by time) to every
    event. A session breaks when the gap to the previous event exceeds
    ``gap_seconds``."""
    ts_type = df.schema[ts_col].dataType
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_break = (prev_ts.isNull()
                | (_epoch_seconds(F.col(ts_col), ts_type)
                   - _epoch_seconds(prev_ts, ts_type) > gap_seconds))
    return df.withColumn(
        session_col,
        F.sum(is_break.cast("long")).over(w) - F.lit(1))


def session_stats(df: DataFrame, key_col: str, ts_col: str,
                  gap_seconds: int = 1800) -> DataFrame:
    """One row per (key, session): event count, start, end, duration."""
    ts_type = df.schema[ts_col].dataType
    with_sessions = sessionize(df, key_col, ts_col, gap_seconds)
    return (with_sessions
            .groupBy(key_col, "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"))
            .withColumn("duration_sec",
                        _epoch_seconds(F.col("session_end"), ts_type)
                        - _epoch_seconds(F.col("session_start"), ts_type)))


def sessionize_stream(events: DataFrame, key_col: str, ts_col: str,
                      gap_seconds: int = 1800,
                      timeout_ms: Optional[int] = None) -> DataFrame:
    """Streaming sessionization: emits one row per CLOSED session
    (key, session_start, session_end, n_events). The open session per key
    lives in group state; it closes when a later event arrives more than
    ``gap_seconds`` after its end — or, when ``timeout_ms`` is set, when
    the state times out on processing time (long-running streams; note
    that with Trigger.AvailableNow a processing-time timeout keeps the
    query in a state-cleanup loop, so leave it None for drain-style runs).

    Pattern: ``applyInPandasWithState`` — the custom-stateful-operator
    escape hatch for semantics windowed aggregates can't express.
    """
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    output_schema = (f"{key_col} long, session_start double, "
                     "session_end double, n_events long")
    state_schema = "session_start double, session_end double, n_events long"

    def close_sessions(key: Tuple, pdfs: Iterator[pandas.DataFrame],
                       state: GroupState) -> Iterator[pandas.DataFrame]:
        closed = []
        if timeout_ms is not None and state.hasTimedOut:
            (start, end, n) = state.get
            closed.append((key[0], start, end, n))
            state.remove()
        else:
            if state.exists:
                start, end, n = state.get
            else:
                start, end, n = None, None, 0
            ts_values = []
            for pdf in pdfs:
                ts_values.extend(pdf["__ts_sec"].tolist())
            for t in sorted(ts_values):
                if start is None:
                    start, end, n = t, t, 1
                elif t - end > gap_seconds:
                    closed.append((key[0], start, end, n))
                    start, end, n = t, t, 1
                else:
                    end, n = t, n + 1
            state.update((start, end, n))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
        yield pandas.DataFrame(
            closed, columns=[key_col, "session_start", "session_end",
                             "n_events"])

    timeout_conf = (GroupStateTimeout.ProcessingTimeTimeout
                    if timeout_ms is not None
                    else GroupStateTimeout.NoTimeout)
    prepared = events.withColumn(
        "__ts_sec",
        _epoch_seconds(F.col(ts_col), events.schema[ts_col].dataType))
    return (prepared.groupBy(key_col)
            .applyInPandasWithState(close_sessions, output_schema,
                                    state_schema, "append", timeout_conf))
