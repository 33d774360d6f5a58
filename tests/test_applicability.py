"""Applicability checker tests (parity: ApplicabilityTest.scala shapes)."""

from pyspark.sql import types as T

from deequ_spark import Check, CheckLevel, Completeness, Mean, Minimum
from deequ_spark.applicability import Applicability, generate_random_data

SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("qty", T.IntegerType()),
    T.StructField("price", T.DoubleType()),
    T.StructField("ts", T.TimestampType()),
])


def test_generate_random_data(spark):
    df = generate_random_data(spark, SCHEMA, num_rows=5)
    assert df.count() == 5
    assert df.schema == SCHEMA


def test_applicable_check(spark):
    check = (Check(CheckLevel.ERROR, "ok")
             .is_complete("name")
             .has_min("price", lambda v: v >= -1e9)
             .has_mean("qty", lambda v: True))
    result = Applicability(spark).is_applicable(check, SCHEMA)
    assert result.is_applicable, result.failures


def test_failed_assertion_still_applicable(spark):
    check = Check(CheckLevel.ERROR, "strict").has_size(lambda n: n > 1e12)
    result = Applicability(spark).is_applicable(check, SCHEMA)
    assert result.is_applicable


def test_inapplicable_wrong_type(spark):
    check = Check(CheckLevel.ERROR, "bad").has_mean("name", lambda v: True)
    result = Applicability(spark).is_applicable(check, SCHEMA)
    assert not result.is_applicable
    assert len(result.failures) == 1


def test_inapplicable_missing_column(spark):
    result = Applicability(spark).is_applicable(
        [Completeness("nope"), Mean("price"), Minimum("qty")], SCHEMA)
    assert not result.is_applicable
    assert list(result.failures) == ["Completeness(nope)"]
