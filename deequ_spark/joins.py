"""Temporal joins — as-of join and point-in-interval join over DataFrames.

Spark has no ASOF JOIN (kdb's ``aj``, pandas ``merge_asof``, DuckDB
``ASOF JOIN``): match each left row to the nearest right row at-or-before
(or at-or-after) its timestamp, optionally per key. The naive encodings
are a range self-join (quadratic blow-up) or a per-key ``collect_list``
(unbounded task memory) — both die at scale.

This implementation uses the UNION + WINDOW trick: tag both sides,
union them on ``(by, ts, side)``, and let ONE window sort carry the most
recent right payload forward (``last(payload, ignorenulls=True)``).
Cost = one shuffle on the ``by`` key (the same shuffle an equi-join
would pay), O(1) state per row, no per-key materialization — a
100 TB-safe plan whenever keys are reasonably distributed (skewed keys
hit the same wall as any window; see diagnostics.key_skew_report).

For the keyless (global) as-of join a single window partition would
serialize on one task, so that path instead BROADCASTS the right side
(guarded by ``broadcast_limit``) and binary-searches it per Arrow batch
(``np.searchsorted``) — map-only over the left, the standard shape when
joining a huge event stream to a small reference series (exchange
rates, config changes, sensor calibrations).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import pandas  # noqa: F401 — pandas_udf type hints resolve at module scope
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: Union[str, Sequence[str], None] = None,
              right_cols: Optional[Sequence[str]] = None,
              direction: str = "backward",
              tolerance: Optional[float] = None,
              suffix: str = "_r",
              broadcast_limit: int = 5_000_000) -> DataFrame:
    """As-of join: for every left row, the nearest right row by ``on``.

    - ``direction='backward'`` (default): greatest right ``on`` ≤ left
      ``on`` (inclusive — equal timestamps match, DuckDB/pandas default).
    - ``direction='forward'``: smallest right ``on`` ≥ left ``on``.
    - ``direction='nearest'``: whichever of the two is closer by |Δ|;
      exact tie → backward (pandas ``merge_asof`` convention).
    - ``by``: equality key(s) matched before the temporal condition.
    - ``right_cols``: right columns to carry (default: all but ``on`` and
      ``by``); appended as ``<name><suffix>`` plus ``<on><suffix>`` (the
      matched timestamp). Unmatched rows keep NULLs (left join).
    - ``tolerance``: max |left.on − right.on| in SECONDS; farther matches
      are nulled out.

    ``on`` must be a timestamp or numeric column present in both inputs.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest'")
    by_list: List[str] = ([by] if isinstance(by, str) else list(by or []))
    default_cols = [c for c in right.columns
                    if c != on and c not in by_list]
    rcols = list(right_cols) if right_cols is not None else default_cols
    # A right row with NULL `on` can never be a temporal match, but if
    # left in it would corrupt both paths: in the broadcast path a NULL
    # becomes NaN at the front of the sorted numpy array (violating
    # searchsorted's precondition for EVERY lookup), and in the windowed
    # path it sorts first and its payload could be carried forward as a
    # bogus match.
    right = right.where(F.col(on).isNotNull())
    if by_list:
        return _asof_windowed(left, right, on, by_list, rcols, direction,
                              tolerance, suffix)
    return _asof_broadcast(left, right, on, rcols, direction, tolerance,
                           suffix, broadcast_limit)


def _epoch_micros(col, dtype: str):
    """Epoch micros for ordering/lag math. TIMESTAMP → unix_micros;
    TIMESTAMP_NTZ → zone-free wall-clock field arithmetic (unix_micros
    rejects NTZ, and casting NTZ through TIMESTAMP would warp intervals
    across DST transitions in a zoned session — see sessionize); numerics
    → double unchanged."""
    if dtype == "timestamp_ntz":
        return ((F.unix_date(col.cast("date")).cast("long") * 86400
                 + F.hour(col).cast("long") * 3600
                 + F.minute(col).cast("long") * 60) * 1_000_000
                + F.round(F.date_part(F.lit("SECOND"), col) * 1e6)
                .cast("long")).cast("double")
    if dtype.startswith("timestamp"):
        return F.unix_micros(col).cast("double")
    return col.cast("double")


def _asof_windowed(left, right, on, by_list, rcols, direction, tolerance,
                   suffix):
    payload = F.struct(F.col(on).alias("__mt"),
                       *[F.col(c) for c in rcols]).alias("__p")
    # union frame: left's full row + NULL payload; right contributes the
    # by/ts keys + payload with NULL left columns
    lcols = left.columns
    l_side = left.select(
        *lcols, F.lit(1).alias("__side"),
        F.lit(None).cast(right.select(payload).schema["__p"].dataType)
        .alias("__p"))
    r_side = right.select(
        *[F.col(c) if c in by_list + [on] else F.lit(None)
          .cast(dict(left.dtypes).get(c, "string")).alias(c)
          for c in lcols],
        F.lit(0).alias("__side"), payload)
    both = l_side.unionByName(r_side)

    if direction == "backward":
        # right (side 0) sorts before left at equal ts → inclusive match
        w = (Window.partitionBy(*by_list)
             .orderBy(F.col(on).asc(), F.col("__side").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        matched = F.last("__p", ignorenulls=True).over(w)
    elif direction == "forward":
        # left (side 1) sorts before right at equal ts → the following
        # frame still sees an equal-ts right row → inclusive
        w = (Window.partitionBy(*by_list)
             .orderBy(F.col(on).asc(), F.col("__side").desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        matched = F.first("__p", ignorenulls=True).over(w)
    else:
        # nearest: BOTH frames over ONE sort (right-before-left ties):
        # backward is equal-ts inclusive, forward is equal-ts exclusive
        # — harmless, since an equal-ts match has distance 0 via
        # backward already. Picks the smaller |Δ|; exact tie → backward
        # (pandas merge_asof convention).
        base = (Window.partitionBy(*by_list)
                .orderBy(F.col(on).asc(), F.col("__side").asc()))
        bw = F.last("__p", ignorenulls=True).over(
            base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        fw = F.first("__p", ignorenulls=True).over(
            base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        on_type = dict(left.dtypes)[on]
        d_bw = F.abs(_epoch_micros(F.col(on), on_type)
                     - _epoch_micros(bw["__mt"], on_type))
        d_fw = F.abs(_epoch_micros(fw["__mt"], on_type)
                     - _epoch_micros(F.col(on), on_type))
        matched = (F.when(bw.isNull(), fw)
                   .when(fw.isNull(), bw)
                   .when(d_fw < d_bw, fw).otherwise(bw))

    # A left row with NULL ts has no temporal position — force no-match
    # (the broadcast path's searchsorted maps NaN ts to idx=-1 likewise).
    out = (both.withColumn("__m", F.when(F.col(on).isNotNull(), matched))
           .where(F.col("__side") == 1))
    return _emit(out, left, on, rcols, tolerance, suffix)


def _asof_broadcast(left, right, on, rcols, direction, tolerance, suffix,
                    broadcast_limit):
    import numpy as np

    n = right.count()
    if n > broadcast_limit:
        raise ValueError(
            f"keyless asof_join broadcasts the right side; {n} rows exceed "
            f"broadcast_limit={broadcast_limit}. Pass a 'by' key (windowed "
            "path) or raise the limit explicitly.")
    on_type = dict(right.dtypes)[on]
    numify = lambda c: _epoch_micros(F.col(c), on_type)  # noqa: E731
    rows = (right.select(numify(on).alias("__t"), F.col(on).alias("__mt"),
                         *[F.col(c) for c in rcols])
            .orderBy("__t").collect())
    r_ts = np.array([r["__t"] for r in rows], dtype="float64")

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def match_idx(ts: pandas.Series) -> pandas.Series:
        t = ts.to_numpy(dtype="float64", na_value=np.nan)
        bw = np.searchsorted(r_ts, t, side="right") - 1
        fw = np.searchsorted(r_ts, t, side="left")
        fw = np.where(fw >= len(r_ts), -1, fw)
        if direction == "backward":
            idx = bw
        elif direction == "forward":
            idx = fw
        else:  # nearest: smaller |Δ|; tie → backward (pandas convention)
            d_bw = np.where(bw >= 0, np.abs(t - r_ts[np.maximum(bw, 0)]),
                            np.inf)
            d_fw = np.where(fw >= 0, np.abs(r_ts[np.maximum(fw, 0)] - t),
                            np.inf)
            idx = np.where(d_fw < d_bw, fw, bw)
        idx = np.where(np.isnan(t), -1, idx)
        return pandas.Series(idx.astype("int64"))

    # matched index → payload via a BROADCAST hash join on the index —
    # the indexed right side stays a (bounded) DataFrame, never literal
    # expressions in the plan. Columns are __asof_-prefixed so right
    # payload names can shadow left names without ambiguity.
    spark = left.sparkSession
    from pyspark.sql.types import LongType, StructField, StructType
    idx_schema = StructType(
        [StructField("__asof_i", LongType(), False),
         StructField("__asof_mt",
                     right.select(on).schema[0].dataType, True)]
        + [StructField(f"__asof_{c}", right.select(c).schema[0].dataType,
                       True) for c in rcols])
    idx_rows = [tuple([i, r["__mt"]] + [r[c] for c in rcols])
                for i, r in enumerate(rows)]
    right_indexed = spark.createDataFrame(idx_rows, idx_schema)

    out = (left.withColumn("__asof_i", match_idx(numify(on)))
           .join(F.broadcast(right_indexed), "__asof_i", "left"))
    out = out.withColumn(
        "__m", F.struct(F.col("__asof_mt").alias("__mt"),
                        *[F.col(f"__asof_{c}").alias(c) for c in rcols]))
    return _emit(out, left, on, rcols, tolerance, suffix)


def _emit(out, left, on, rcols, tolerance, suffix):
    """Apply tolerance mask and project left.* + matched columns."""
    m = F.col("__m")
    if tolerance is not None:
        on_type = dict(left.dtypes)[on]
        lag = F.abs(_epoch_micros(F.col(on), on_type)
                    - _epoch_micros(m["__mt"], on_type))
        if on_type.startswith("timestamp"):
            lag = lag / F.lit(1_000_000.0)
        m = F.when(lag <= F.lit(float(tolerance)), m)
    return out.select(
        *left.columns,
        m["__mt"].alias(f"{on}{suffix}"),
        *[m[c].alias(f"{c}{suffix}") for c in rcols])


def interval_join(left: DataFrame, right: DataFrame, on: str,
                  start: str, end: str,
                  by: Union[str, Sequence[str], None] = None,
                  bin_width: Optional[float] = None,
                  max_bins_per_interval: int = 10_000,
                  how: str = "inner") -> DataFrame:
    """Point-in-interval join: left rows where ``start ≤ on ≤ end`` of a
    right interval (inclusive both ends), optionally per ``by`` key.

    Spark plans a naive ``l.on BETWEEN r.start AND r.end`` join as a
    BroadcastNestedLoopJoin (every left row probes every right interval —
    quadratic, the classic range-join trap). This implementation
    BUCKETIZES the axis: each right interval is exploded onto the bins it
    covers, left rows map to their single bin, and the match becomes an
    EQUI-join on ``(by…, bin)`` followed by the exact range filter —
    one hash shuffle each side, work proportional to output size plus
    interval/bin coverage.

    ``bin_width`` (axis units: seconds for timestamps, column units for
    numerics) defaults to the right side's MEDIAN interval length — ~2
    bins per interval, the standard balance between explode factor and
    bucket selectivity. ``max_bins_per_interval`` guards the explode on
    degenerate giant intervals (they error rather than OOM; raise the
    width or the cap explicitly for such data).

    ``how='inner'`` emits matches only (a left row can match several
    intervals); ``how='left'`` also keeps unmatched left rows with NULL
    right columns.
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    by_list: List[str] = ([by] if isinstance(by, str) else list(by or []))
    clash = (set(left.columns) & set(right.columns)) - set(by_list)
    if clash:
        raise ValueError(
            f"left and right share non-key column names {sorted(clash)}; "
            "rename one side before interval_join (the output carries "
            "both sides' columns)")
    on_type = dict(left.dtypes)[on]
    l_num = _epoch_micros(F.col(on), on_type)
    r_start = _epoch_micros(F.col(start), dict(right.dtypes)[start])
    r_end = _epoch_micros(F.col(end), dict(right.dtypes)[end])
    unit = 1e6 if on_type.startswith("timestamp") else 1.0

    if bin_width is None:
        med = (right.select(((r_end - r_start) / F.lit(unit))
                            .alias("__len"))
               .agg(F.expr("percentile(__len, 0.5)").alias("m"))
               .collect()[0]["m"])
        bin_width = float(med) if med and med > 0 else 1.0
    w = float(bin_width) * unit

    r_bin_first = F.floor(r_start / w)
    r_bin_last = F.floor(r_end / w)
    n_bins = (r_bin_last - r_bin_first + 1)
    overflow = right.where(n_bins > max_bins_per_interval)
    if overflow.limit(1).count() > 0:
        raise ValueError(
            f"an interval spans more than max_bins_per_interval="
            f"{max_bins_per_interval} bins at bin_width={bin_width}; "
            "raise bin_width or the cap")

    r_cols = [c for c in right.columns if c not in by_list]
    r_binned = right.select(
        *by_list, *r_cols,
        F.explode(F.sequence(r_bin_first, r_bin_last)).alias("__bin"),
        r_start.alias("__rs"), r_end.alias("__re"))
    l_binned = left.select(
        *left.columns, F.floor(l_num / w).alias("__bin"),
        l_num.alias("__ln"))

    cond = [l_binned["__bin"] == r_binned["__bin"]]
    for k in by_list:
        cond.append(l_binned[k].eqNullSafe(r_binned[k]))
    matched = (l_binned.join(r_binned, cond, "inner")
               .where((F.col("__ln") >= F.col("__rs"))
                      & (F.col("__ln") <= F.col("__re")))
               .select(*[l_binned[c] for c in left.columns],
                       *[r_binned[c] for c in r_cols]))
    if how == "inner":
        return matched
    # 'left': append unmatched left rows with NULL right columns. Bin
    # collisions that fail the exact range filter are NOT matches, so the
    # anti-join must run against the MATCHED set, which identifies rows by
    # their full column tuple — callers with duplicate left rows should
    # add a unique id column first.
    matched_keys = matched.select(*left.columns).distinct()
    unmatched = (left.join(matched_keys, list(left.columns), "left_anti")
                 .select(*left.columns,
                         *[F.lit(None).cast(dict(right.dtypes)[c])
                           .alias(c) for c in r_cols]))
    return matched.unionByName(unmatched)


def rolling_stats(df: DataFrame, on: str, value: str,
                  window_seconds: float,
                  by: Union[str, Sequence[str], None] = None,
                  stats: Sequence[str] = ("avg", "count"),
                  suffix: Optional[str] = None) -> DataFrame:
    """Trailing-window statistics per row: for each row, aggregate
    ``value`` over rows of the same ``by`` key whose ``on`` lies in
    ``[row.on − window_seconds, row.on]`` (inclusive both ends — the
    row itself is in its own window).

    Spark shape: ONE window with a RANGE frame over the numeric view of
    ``on`` (epoch micros for timestamps) — one shuffle on ``by``, O(1)
    frame state per row, no self-join (the naive encoding is a range
    self-join that explodes quadratically on dense keys).

    ``stats`` ⊆ {avg, sum, count, min, max, stddev}; outputs are named
    ``<value>_roll_<stat>`` (or ``<stat><suffix>``). Keyless = one
    global ordering: fine for a single series, serializes on one task
    for a huge one — pass ``by`` at scale.
    """
    supported = {"avg": F.avg, "sum": F.sum, "count": F.count,
                 "min": F.min, "max": F.max, "stddev": F.stddev_samp}
    bad = [s for s in stats if s not in supported]
    if bad:
        raise ValueError(f"unsupported stats {bad}; "
                         f"supported: {sorted(supported)}")
    by_list = [by] if isinstance(by, str) else list(by or [])
    on_type = dict(df.dtypes)[on]
    t = _epoch_micros(F.col(on), on_type)
    unit = 1e6 if on_type.startswith("timestamp") else 1.0
    # range offsets are integral: micros for timestamps, whole column
    # units for numerics (fractional numeric windows truncate)
    w = (Window.partitionBy(*by_list).orderBy(t.asc())
         .rangeBetween(-int(round(window_seconds * unit)), 0))
    out = df
    for s in stats:
        name = f"{s}{suffix}" if suffix else f"{value}_roll_{s}"
        out = out.withColumn(name, supported[s](F.col(value)).over(w))
    return out


def salted_join(left: DataFrame, right: DataFrame,
                on: Union[str, Sequence[str]], num_salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Replicated-salt equi-join — the skew weapon for when the hot-key
    side is too big to broadcast WHOLE but each key's partner rows are
    small.  A plain shuffle join puts every row of a hot key into one
    task; AQE's skew-join splits the *partition* but still co-locates
    each key.  Salting splits the KEY itself: the big (left) side gets a
    salt in [0, num_salts), the small (right) side is replicated once
    per salt value (``explode(sequence(...))`` — map-only, x num_salts
    rows moved, the price of the spread), and the join key becomes
    (key, salt) so a hot key fans out over num_salts tasks.

    The result is row-for-row identical to ``left.join(right, on, how)``
    — every left row matches exactly the one right replica carrying its
    salt — so the transform is pure plan surgery, oracle-checkable
    against the plain join.  Salt assignment hashes the left row's
    columns (deterministic; fully-duplicate rows share a salt, which
    only matters if the hot key's rows are all identical).  Supported
    ``how``: inner, left (an unmatched right row would otherwise
    surface once per replica).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if num_salts < 1:
        raise ValueError("num_salts must be >= 1")
    on_cols = [on] if isinstance(on, str) else list(on)
    # '__salt' is a working column; silently overwriting (then dropping)
    # a user column of that name would corrupt the result
    if "__salt" in left.columns or "__salt" in right.columns \
            or "__salt" in on_cols:
        raise ValueError(
            "salted_join reserves the '__salt' column name; rename the "
            "existing '__salt' column before joining")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                  F.lit(num_salts)).cast("int")
    lhs = left.withColumn("__salt", salt)
    rhs = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))))
    out = lhs.join(rhs, on_cols + ["__salt"], how)
    return out.drop("__salt")
