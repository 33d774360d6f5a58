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

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
        # key uniqueness precondition (parity :101-113)
        n1 = ds1.count()
        if ds1.select(*col_key_map.keys()).distinct().count() != n1:
            return ComparisonResult(None, error="keys not unique in ds1")

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
        if ref_count == 0:
            return ComparisonResult(None, error="reference dataset is empty")
        ratio = primary.count() / ref_count
        return ComparisonResult(assertion(ratio), ratio)


class SchemaMatch:
    """Fraction of (name, type) pairs matching (parity: SchemaMatch.scala:30-60)."""

    @staticmethod
    def match_schema(primary: DataFrame, reference: DataFrame,
                     assertion: Callable[[float], bool] = lambda v: v == 1.0
                     ) -> ComparisonResult:
        p = {f.name: f.dataType.simpleString() for f in primary.schema.fields}
        r = {f.name: f.dataType.simpleString() for f in reference.schema.fields}
        all_names = set(p) | set(r)
        if not all_names:
            return ComparisonResult(None, error="both schemas empty")
        matching = sum(1 for name in all_names
                       if name in p and name in r and p[name] == r[name])
        ratio = matching / len(all_names)
        return ComparisonResult(assertion(ratio), ratio)


@dataclass(frozen=True, eq=False)
class DatasetMatchAnalyzer:
    """Analyzer wrapper over DataSynchronization so dataset matching joins
    the regular metric pipeline (parity: DatasetMatchAnalyzer.scala:66-110)."""

    def __init__(self, df_to_compare: DataFrame, col_key_map: Dict[str, str],
                 match_col_map: Optional[Dict[str, str]] = None):
        object.__setattr__(self, "df_to_compare", df_to_compare)
        object.__setattr__(self, "col_key_map", dict(col_key_map))
        object.__setattr__(self, "match_col_map", match_col_map)

    name = "DatasetMatch"
    entity = Entity.DATASET

    @property
    def instance(self) -> str:
        return ",".join(self.col_key_map)

    def _key(self):
        return (type(self).__name__, tuple(sorted(self.col_key_map.items())),
                id(self.df_to_compare))

    def calculate(self, df: DataFrame):
        result = DataSynchronization.column_match(
            df, self.df_to_compare, self.col_key_map, self.match_col_map,
            assertion=lambda v: True)
        if result.error:
            return metric_from_failure(RuntimeError(result.error), self.name,
                                       self.instance, Entity.DATASET)
        return DoubleMetric(Entity.DATASET, self.name, self.instance, result.ratio)
