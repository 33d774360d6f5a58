"""Row-level schema validation — compile a declared schema to one boolean
Column, split valid/invalid rows, cast.

Reference parity: /root/reference/src/main/scala/com/amazon/deequ/schema/
RowLevelSchemaValidator.scala:183-282 (282 LoC).

Scale note: validation is a single projection + two filters over one scan
(no aggregation); Catalyst pushes the conjunction into the scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class ColumnDefinition:
    name: str
    is_nullable: bool = True

    def cast_expression(self) -> Column:
        return F.col(self.name)

    def validation(self) -> Column:
        cond = F.lit(True)
        if not self.is_nullable:
            cond = F.col(self.name).isNotNull()
        return cond


@dataclass
class StringColumnDefinition(ColumnDefinition):
    min_length: Optional[int] = None
    max_length: Optional[int] = None
    matches: Optional[str] = None

    def validation(self) -> Column:
        cond = super().validation()
        col = F.col(self.name)
        present = col.isNotNull()
        if self.min_length is not None:
            cond = cond & (~present | (F.length(col) >= self.min_length))
        if self.max_length is not None:
            cond = cond & (~present | (F.length(col) <= self.max_length))
        if self.matches is not None:
            cond = cond & (~present |
                           (F.regexp_extract(col, self.matches, 0) != F.lit("")))
        return cond


@dataclass
class IntColumnDefinition(ColumnDefinition):
    min_value: Optional[int] = None
    max_value: Optional[int] = None

    def cast_expression(self) -> Column:
        return F.col(self.name).try_cast("int").alias(self.name)

    def validation(self) -> Column:
        cond = super().validation()
        col = F.col(self.name)
        present = col.isNotNull()
        casted = col.try_cast("int")
        cond = cond & (~present | casted.isNotNull())
        if self.min_value is not None:
            cond = cond & (~present | (casted >= self.min_value))
        if self.max_value is not None:
            cond = cond & (~present | (casted <= self.max_value))
        return cond


@dataclass
class DecimalColumnDefinition(ColumnDefinition):
    precision: int = 10
    scale: int = 0

    def cast_expression(self) -> Column:
        return (F.col(self.name)
                .try_cast(f"decimal({self.precision},{self.scale})")
                .alias(self.name))

    def validation(self) -> Column:
        cond = super().validation()
        col = F.col(self.name)
        present = col.isNotNull()
        casted = col.try_cast(f"decimal({self.precision},{self.scale})")
        return cond & (~present | casted.isNotNull())


@dataclass
class TimestampColumnDefinition(ColumnDefinition):
    mask: str = "yyyy-MM-dd HH:mm:ss"

    def cast_expression(self) -> Column:
        return F.try_to_timestamp(F.col(self.name), F.lit(self.mask)).alias(self.name)

    def validation(self) -> Column:
        cond = super().validation()
        col = F.col(self.name)
        present = col.isNotNull()
        casted = F.try_to_timestamp(col, F.lit(self.mask))
        return cond & (~present | casted.isNotNull())


class RowLevelSchema:
    """Fluent schema builder (parity: RowLevelSchema.scala)."""

    def __init__(self, column_definitions: Optional[List[ColumnDefinition]] = None):
        self.column_definitions = list(column_definitions or [])

    def with_string_column(self, name, is_nullable=True, min_length=None,
                           max_length=None, matches=None):
        self.column_definitions.append(StringColumnDefinition(
            name, is_nullable, min_length, max_length, matches))
        return self

    def with_int_column(self, name, is_nullable=True, min_value=None,
                        max_value=None):
        self.column_definitions.append(IntColumnDefinition(
            name, is_nullable, min_value, max_value))
        return self

    def with_decimal_column(self, name, precision, scale, is_nullable=True):
        self.column_definitions.append(DecimalColumnDefinition(
            name, is_nullable, precision, scale))
        return self

    def with_timestamp_column(self, name, mask, is_nullable=True):
        self.column_definitions.append(TimestampColumnDefinition(
            name, is_nullable, mask))
        return self


@dataclass
class RowLevelSchemaValidationResult:
    valid_rows: DataFrame
    num_valid_rows: int
    invalid_rows: DataFrame
    num_invalid_rows: int


def validate_schema(data: DataFrame,
                    schema: RowLevelSchema) -> RowLevelSchemaValidationResult:
    """Parity: RowLevelSchemaValidator.validate (:183-282)."""
    cond = F.lit(True)
    for definition in schema.column_definitions:
        cond = cond & definition.validation()

    data = data.withColumn("__deequ_valid", cond)
    valid = (data.where(F.col("__deequ_valid"))
             .select(*[d.cast_expression() for d in schema.column_definitions]))
    invalid = data.where(~F.col("__deequ_valid")).drop("__deequ_valid")
    # two counts over the (typically cached upstream) input; kept lazy here
    return RowLevelSchemaValidationResult(
        valid, valid.count(), invalid, invalid.count())
