"""Dataset comparison operators (SURVEY §2d).

Reference parity: /root/reference/src/main/scala/com/amazon/deequ/comparison/
{DataSynchronization,ReferentialIntegrity,RowCountMatch,SchemaMatch}.scala
(650 LoC).

Scale notes (100 TB):
  * ReferentialIntegrity uses a LEFT ANTI join (not EXCEPT as the reference
    does, ReferentialIntegrity.scala:61) — anti join needs no dedup shuffle
    of the probe side and broadcasts when the reference side is small.
  * DataSynchronization counts matches inside ONE inner-join aggregation;
    Catalyst picks broadcast vs sort-merge by stats/AQE.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analyzers.base import Analyzer
from .metrics import DoubleMetric, Entity, metric_from_failure


@dataclass
class ComparisonResult:
    passed: Optional[bool]
    ratio: Optional[float] = None
    error: Optional[str] = None


class DataSynchronization:
    """Row-match ratio of two datasets joined on a key map
    (parity: DataSynchronization.scala:94-207)."""

    @staticmethod
    def column_match(ds1: DataFrame, ds2: DataFrame,
                     col_key_map: Dict[str, str],
                     comp_cols: Optional[Dict[str, str]] = None,
                     assertion: Callable[[float], bool] = lambda v: v == 1.0
                     ) -> ComparisonResult:
        missing1 = [c for c in col_key_map if c not in ds1.columns]
        missing2 = [c for c in col_key_map.values() if c not in ds2.columns]
        if missing1 or missing2:
            return ComparisonResult(None, error=f"missing key columns "
                                                f"{missing1 + missing2}")
        # key uniqueness precondition on BOTH sides (parity :224-243 —
        # duplicate keys on either side multiply join rows, so matched
        # could exceed n1 and the ratio could exceed 1.0)
        n1 = ds1.count()
        if ds1.select(*col_key_map.keys()).distinct().count() != n1:
            return ComparisonResult(None, error="keys not unique in ds1")
        if ds2.select(*col_key_map.values()).distinct().count() != ds2.count():
            return ComparisonResult(None, error="keys not unique in ds2")

        if comp_cols is None:
            keys1 = set(col_key_map.keys())
            keys2 = set(col_key_map.values())
            non_key1 = [c for c in ds1.columns if c not in keys1]
            non_key2 = [c for c in ds2.columns if c not in keys2]
            if sorted(non_key1) != sorted(non_key2):
                return ComparisonResult(
                    None, error="non-key columns differ; pass comp_cols")
            comp_cols = {c: c for c in non_key1}

        a, b = ds1.alias("a"), ds2.alias("b")
        join_cond = None
        for k1, k2 in col_key_map.items():
            eq = F.col(f"a.{k1}").eqNullSafe(F.col(f"b.{k2}"))
            join_cond = eq if join_cond is None else (join_cond & eq)
        match_cond = None
        for c1, c2 in comp_cols.items():
            eq = F.col(f"a.{c1}").eqNullSafe(F.col(f"b.{c2}"))
            match_cond = eq if match_cond is None else (match_cond & eq)

        # single aggregation over the join: matched rows / ds1 rows
        matched = (a.join(b, join_cond, "inner")
                   .agg(F.sum(match_cond.cast("long")).alias("m"))
                   .collect()[0]["m"]) or 0
        ratio = matched / n1 if n1 else 0.0
        return ComparisonResult(assertion(ratio), ratio)

    @staticmethod
    def match_counts(ds1: DataFrame, ds2: DataFrame,
                     col_key_map: Dict[str, str],
                     comp_cols: Optional[Dict[str, str]] = None
                     ) -> "tuple[int, int]":
        """(matched rows, ds1 rows) — the mergeable sufficient statistic
        behind DatasetMatchState (parity: DatasetMatchAnalyzer.scala:66-95).

        Raises ValueError when the join keys are not unique in either
        dataset (parity: DataSynchronization.scala:224-243) — duplicate
        keys would multiply left-join rows and silently inflate both
        matched and total.
        """
        if ds1.select(*col_key_map.keys()).distinct().count() != ds1.count():
            raise ValueError("DatasetMatch: join keys are not unique in the "
                             "primary dataset")
        if ds2.select(*col_key_map.values()).distinct().count() != ds2.count():
            raise ValueError("DatasetMatch: join keys are not unique in the "
                             "dataset to compare")
        if comp_cols is None:
            keys1 = set(col_key_map.keys())
            keys2 = set(col_key_map.values())
            non_key1 = [c for c in ds1.columns if c not in keys1]
            non_key2 = [c for c in ds2.columns if c not in keys2]
            common = sorted(set(non_key1) & set(non_key2))
            comp_cols = {c: c for c in common}
        a, b = ds1.alias("a"), ds2.alias("b")
        join_cond = None
        for k1, k2 in col_key_map.items():
            eq = F.col(f"a.{k1}").eqNullSafe(F.col(f"b.{k2}"))
            join_cond = eq if join_cond is None else (join_cond & eq)
        match_cond = F.lit(True)
        for c1, c2 in comp_cols.items():
            match_cond = match_cond & F.col(f"a.{c1}").eqNullSafe(F.col(f"b.{c2}"))
        # ONE job: total via count over ds1, matched via join agg — fused
        # by computing both sides of a union-free agg on the left join
        joined = a.join(b, join_cond, "left")
        row = joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(match_cond, 1).otherwise(0)).alias("m")).collect()[0]
        return int(row["m"] or 0), int(row["n"] or 0)

    @staticmethod
    def column_match_row_level(ds1: DataFrame, ds2: DataFrame,
                               col_key_map: Dict[str, str],
                               comp_cols: Optional[Dict[str, str]] = None,
                               outcome_column: str = "data_sync_outcome"
                               ) -> DataFrame:
        """Annotate ds1 with a boolean column
        (parity: DataSynchronization.scala:155-207)."""
        if comp_cols is None:
            keys1 = set(col_key_map.keys())
            comp_cols = {c: c for c in ds1.columns if c not in keys1}
        a, b = ds1.alias("a"), ds2.alias("b")
        join_cond = None
        for k1, k2 in col_key_map.items():
            eq = F.col(f"a.{k1}").eqNullSafe(F.col(f"b.{k2}"))
            join_cond = eq if join_cond is None else (join_cond & eq)
        match_cond = None
        for c1, c2 in comp_cols.items():
            eq = F.col(f"a.{c1}").eqNullSafe(F.col(f"b.{c2}"))
            match_cond = eq if match_cond is None else (match_cond & eq)
        return (a.join(b, join_cond, "left")
                .select("a.*", F.coalesce(match_cond, F.lit(False))
                        .alias(outcome_column)))


class ReferentialIntegrity:
    """Fraction of primary-side keys present in the reference side
    (parity: ReferentialIntegrity.scala:48-120)."""

    @staticmethod
    def subset_check(primary: DataFrame, primary_cols: Sequence[str],
                     reference: DataFrame, reference_cols: Sequence[str],
                     assertion: Callable[[float], bool] = lambda v: v == 1.0
                     ) -> ComparisonResult:
        if any(c not in primary.columns for c in primary_cols) or \
                any(c not in reference.columns for c in reference_cols):
            return ComparisonResult(None, error="missing columns")
        n = primary.count()
        if n == 0:
            return ComparisonResult(None, error="primary dataset is empty")
        ref_proj = reference.select(
            *[F.col(c).alias(p) for c, p in zip(reference_cols, primary_cols)])
        # left ANTI join: rows whose key has no match — no dedup pass needed,
        # broadcastable when the reference key set is small
        missing = (primary.select(*primary_cols)
                   .join(ref_proj, on=list(primary_cols), how="left_anti")
                   .count())
        ratio = (n - missing) / n
        return ComparisonResult(assertion(ratio), ratio)

    @staticmethod
    def subset_check_row_level(primary: DataFrame, primary_cols: Sequence[str],
                               reference: DataFrame,
                               reference_cols: Sequence[str],
                               outcome_column: str = "referential_outcome"
                               ) -> DataFrame:
        ref_proj = (reference
                    .select(*[F.col(c).alias(p)
                              for c, p in zip(reference_cols, primary_cols)])
                    .distinct()
                    .withColumn("__ref_present", F.lit(True)))
        joined = primary.join(ref_proj, on=list(primary_cols), how="left")
        return joined.select(
            *primary.columns,
            F.coalesce(F.col("__ref_present"), F.lit(False)).alias(outcome_column))


class RowCountMatch:
    """Parity: RowCountMatch.scala:31-60."""

    @staticmethod
    def match_row_counts(primary: DataFrame, reference: DataFrame,
                         assertion: Callable[[float], bool] = lambda v: v == 1.0
                         ) -> ComparisonResult:
        ref_count = reference.count()
        primary_count = primary.count()
        # Glue edge semantics (RowCountMatchTest.scala:139-159): empty
        # reference → ratio = Infinity (NaN when BOTH are empty); the
        # assertion still runs — NaN comparisons are all False, so a
        # threshold assertion fails while a tautology passes
        if ref_count == 0:
            ratio = math.inf if primary_count > 0 else math.nan
        else:
            ratio = primary_count / ref_count
        return ComparisonResult(bool(assertion(ratio)), ratio)


class SchemaMatch:
    """Fraction of the PRIMARY's (name, type) pairs present identically in
    the reference (parity: SchemaMatch.scala:30-51 — ratio denominator is
    the primary column count; empty schemas and differing column counts
    hard-fail at ratio 0 without running the assertion)."""

    @staticmethod
    def match_schema(primary: DataFrame, reference: DataFrame,
                     assertion: Callable[[float], bool] = lambda v: v == 1.0
                     ) -> ComparisonResult:
        p = {f.name: f.dataType.simpleString() for f in primary.schema.fields}
        r = {f.name: f.dataType.simpleString() for f in reference.schema.fields}
        if not p or not r:
            return ComparisonResult(
                False, 0.0, error="One or both DataFrames have no columns")
        if len(p) != len(r):
            return ComparisonResult(False, 0.0,
                                    error="Column counts do not match")
        matching = sum(1 for name, tpe in p.items() if r.get(name) == tpe)
        ratio = matching / len(p)
        return ComparisonResult(bool(assertion(ratio)), ratio)


@dataclass
class DatasetMatchState:
    """Mergeable (matched, total) pair
    (parity: DatasetMatchState.scala:35-41)."""

    matched: int
    total: int

    def merge(self, other: "DatasetMatchState") -> "DatasetMatchState":
        return DatasetMatchState(self.matched + other.matched,
                                 self.total + other.total)

    __add__ = merge

    @property
    def ratio(self) -> float:
        return self.matched / self.total if self.total else 0.0


class DatasetMatchAnalyzer(Analyzer):
    """Analyzer wrapper over DataSynchronization so dataset matching joins
    the regular metric pipeline — usable in VerificationSuite /
    do_analysis_run like any other analyzer
    (parity: DatasetMatchAnalyzer.scala:66-110)."""

    def __init__(self, df_to_compare: DataFrame, col_key_map: Dict[str, str],
                 match_col_map: Optional[Dict[str, str]] = None):
        self.df_to_compare = df_to_compare
        self.col_key_map = dict(col_key_map)
        self.match_col_map = dict(match_col_map) if match_col_map else None

    name = "DatasetMatch"
    entity = Entity.DATASET

    @property
    def instance(self) -> str:
        return ",".join(self.col_key_map)

    def _key(self):
        return (type(self).__name__, tuple(sorted(self.col_key_map.items())),
                tuple(sorted(self.match_col_map.items()))
                if self.match_col_map else None,
                id(self.df_to_compare))

    def __eq__(self, other):
        return (isinstance(other, DatasetMatchAnalyzer)
                and self._key() == other._key())

    def __hash__(self):
        return hash(self._key())

    def preconditions(self):
        def keys_exist(schema):
            for k in self.col_key_map:
                if k not in [f.name for f in schema.fields]:
                    raise ValueError(
                        f"Input data does not include column {k}!")
        return [keys_exist]

    def columns_referenced(self):
        return None  # joins the full row set; no pruning

    def compute_state_from(self, df: DataFrame) -> Optional[DatasetMatchState]:
        matched, total = DataSynchronization.match_counts(
            df, self.df_to_compare, self.col_key_map, self.match_col_map)
        return DatasetMatchState(matched, total)

    def compute_metric_from_state(self, state):
        if state is None or state.total == 0:
            return metric_from_failure(
                ValueError("No rows to match"), self.name, self.instance,
                Entity.DATASET)
        return DoubleMetric(Entity.DATASET, self.name, self.instance,
                            state.ratio)

    def to_failure_metric(self, exc: BaseException):
        return metric_from_failure(exc, self.name, self.instance,
                                   Entity.DATASET)

    def calculate(self, df: DataFrame):
        try:
            for check in self.preconditions():
                check(df.schema)
            return self.compute_metric_from_state(self.compute_state_from(df))
        except Exception as exc:  # noqa: BLE001
            return self.to_failure_metric(exc)


def table_diff(old: DataFrame, new: DataFrame, keys,
               compare_cols=None) -> dict:
    """Snapshot diff between two versions of a table: how many rows were
    added / removed / changed / unchanged, plus per-column change counts
    for the changed rows — the regression check between two pipeline
    runs (DataSynchronization answers "what fraction matches"; this
    answers "what exactly moved").

    Plan: ONE full-outer null-safe join on ``keys``. Changed-vs-unchanged
    is decided by comparing one ``xxhash64`` over the compared columns
    per side (wide tables pay one hash, not C column comparisons in the
    join output); per-column counters then run only as conditional sums
    over the changed rows. Everything aggregates to a fixed-size dict —
    nothing row-shaped reaches the driver.

    Spark's ``xxhash64`` SKIPS null inputs entirely, so hashing the raw
    columns would make ('x', NULL) and (NULL, 'x') collide — a value
    shifting across a NULL column would be reported unchanged. Each
    column is therefore paired with its ``isNull()`` flag in the hash,
    making every position null-discriminating.

    ``compare_cols`` defaults to the non-key columns both sides share.
    Key uniqueness per side is assumed (diff of multisets needs a
    row-number pre-step).
    """
    from pyspark.sql import functions as F
    keys = [keys] if isinstance(keys, str) else list(keys)
    if compare_cols is None:
        compare_cols = [c for c in old.columns
                        if c in new.columns and c not in keys]
    def _null_safe_hash():
        return F.xxhash64(*[part for c in compare_cols
                            for part in (F.col(c), F.col(c).isNull())])
    o = old.select(*keys,
                   *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
                   _null_safe_hash().alias("__o_h"), F.lit(1).alias("__o"))
    n = new.select(*keys,
                   *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
                   _null_safe_hash().alias("__n_h"), F.lit(1).alias("__n"))
    cond = None
    for k in keys:
        e = o[k].eqNullSafe(n[k])
        cond = e if cond is None else (cond & e)
    j = o.join(n, cond, "full_outer")
    in_old, in_new = F.col("__o").isNotNull(), F.col("__n").isNotNull()
    changed = in_old & in_new & (F.col("__o_h") != F.col("__n_h"))
    aggs = [
        F.sum((in_new & ~in_old).cast("long")).alias("added"),
        F.sum((in_old & ~in_new).cast("long")).alias("removed"),
        F.sum(changed.cast("long")).alias("changed"),
        F.sum((in_old & in_new
               & (F.col("__o_h") == F.col("__n_h"))).cast("long"))
        .alias("unchanged"),
    ]
    for c in compare_cols:
        aggs.append(F.sum(
            (changed & ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")))
            .cast("long")).alias(f"__col_{c}"))
    row = j.agg(*aggs).collect()[0]
    return {
        "added": int(row["added"] or 0),
        "removed": int(row["removed"] or 0),
        "changed": int(row["changed"] or 0),
        "unchanged": int(row["unchanged"] or 0),
        "changed_by_column": {c: int(row[f"__col_{c}"] or 0)
                              for c in compare_cols},
    }
