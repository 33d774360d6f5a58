"""Transcriptions of /root/reference/src/test/scala/com/amazon/deequ/
comparison/RowCountMatchTest.scala (159 LoC) and SchemaMatchTest.scala
(111 LoC), line refs per test — including the Glue edge semantics
(empty reference → Infinity ratio, both empty → NaN)."""

import math

from deequ_spark import RowCountMatch, SchemaMatch


def states(spark, rows):
    return spark.createDataFrame(rows, "`State Name` string, "
                                       "`State Abbreviation` string")


class TestRowCountMatchParity:
    def test_equal_counts_ratio_one(self, spark):
        """:24-43 'return ratio of 1.0 when row counts are equal'."""
        primary = states(spark, [("California", "CA"), ("New York", "NY"),
                                 ("Oregon", "OR")])
        reference = states(spark, [("Texas", "TX"), ("Washington", "WA"),
                                   ("Montana", "MT")])
        res = RowCountMatch.match_row_counts(primary, reference,
                                             lambda r: r == 1.0)
        assert res.passed and res.ratio == 1.0

    def test_primary_lower_than_reference(self, spark):
        """:45-94 — seven assertions over ratio 4/7 ≈ 0.571."""
        primary = states(spark, [("California", "CA"), ("New York", "NY"),
                                 ("New Jersey", "NJ"), ("Oregon", "OR")])
        reference = states(spark, [
            ("California", "CA"), ("New York", "NY"), ("New Jersey", "NJ"),
            ("Oregon", "OR"), ("Texas", "TX"), ("Washington", "WA"),
            ("Montana", "MT")])
        expected = 4.0 / 7.0
        m = RowCountMatch.match_row_counts
        assert not m(primary, reference, lambda r: r == 1.0).passed
        assert m(primary, reference, lambda r: r != 1.0).passed
        assert m(primary, reference, lambda r: r >= 0.57).passed
        assert not m(primary, reference,
                     lambda r: 0.8 <= r <= 0.9).passed
        assert m(primary, reference,
                 lambda r: not (0.8 <= r <= 0.9)).passed
        assert not m(primary, reference,
                     lambda r: not (0.5 <= r <= 0.58)).passed
        res = m(primary, reference, lambda r: r < 0.58)
        assert res.passed and res.ratio == expected

    def test_primary_higher_than_reference(self, spark):
        """:96-132 — ratio 1.5."""
        primary = states(spark, [
            ("California", "CA"), ("New York", "NY"), ("New Jersey", "NJ"),
            ("Oregon", "OR"), ("Texas", "TX"), ("Washington", "WA")])
        reference = states(spark, [
            ("California", "CA"), ("New York", "NY"), ("New Jersey", "NJ"),
            ("Oregon", "OR")])
        m = RowCountMatch.match_row_counts
        assert m(primary, reference, lambda r: r >= 1.0).passed
        assert not m(primary, reference, lambda r: r < 1.0).passed
        assert not m(primary, reference,
                     lambda r: 0.9 <= r <= 1.2).passed
        res = m(primary, reference, lambda r: 0.9 <= r <= 1.55)
        assert res.passed and res.ratio == 1.5

    def test_empty_reference_is_infinity(self, spark):
        """:137-147 'return Infinity when reference dataset is empty' —
        Glue semantics; a tautological assertion still passes."""
        primary = states(spark, [("California", "CA")])
        reference = spark.createDataFrame([], "x int")
        res = RowCountMatch.match_row_counts(primary, reference,
                                             lambda r: True)
        assert res.passed and math.isinf(res.ratio)

    def test_both_empty_is_nan(self, spark):
        """:149-157 'return NaN when both datasets are empty' — NaN
        comparisons are all False, so the assertion fails."""
        primary = spark.createDataFrame([], "x int")
        reference = spark.createDataFrame([], "x int")
        res = RowCountMatch.match_row_counts(primary, reference,
                                             lambda r: r >= 0.9)
        assert not res.passed and math.isnan(res.ratio)


class TestSchemaMatchParity:
    def test_equal_schemas(self, spark):
        """SchemaMatchTest.scala:24-40 — data differs, schemas equal →
        ratio 1.0."""
        primary = spark.createDataFrame(
            [(1, "California", "CA")],
            "id int, `State Name` string, `State Abbreviation` string")
        reference = spark.createDataFrame(
            [(3, "New Jersey", "NJ")],
            "id int, `State Name` string, `State Abbreviation` string")
        res = SchemaMatch.match_schema(primary, reference, lambda r: r > 0.9)
        assert res.passed and res.ratio == 1.0

    def test_partial_match_two_thirds(self, spark):
        """:42-58 — one column renamed: 2 of the primary's 3 columns
        match (the denominator is the PRIMARY column count,
        SchemaMatch.scala:45)."""
        primary = spark.createDataFrame(
            [(1, "California", "CA")],
            "id int, `State Name` string, `State Abbreviation` string")
        reference = spark.createDataFrame(
            [(3, "New Jersey", "NJ")],
            "id int, `State Name` string, `Abbreviation` string")
        res = SchemaMatch.match_schema(primary, reference,
                                       lambda r: r > 0.65)
        assert res.passed and res.ratio == 2.0 / 3.0

    def test_no_match_fails(self, spark):
        """:60-74 — disjoint names fail an == 1.0 assertion."""
        primary = spark.createDataFrame(
            [(1, "California", "CA")],
            "id int, `State Name` string, `State Abbreviation` string")
        reference = spark.createDataFrame(
            [(3, "New Jersey", "NJ", "Garden State")],
            "`Number` int, `Full State Name` string, `Abbreviation` string,"
            " `Nickname` string")
        assert not SchemaMatch.match_schema(primary, reference,
                                            lambda r: r == 1.0).passed

    def test_column_order_irrelevant(self, spark):
        """:76-92 — same (name, type) set in a different order → 1.0."""
        primary = spark.createDataFrame(
            [(1, "CA")], "id int, `State Abbreviation` string")
        reference = spark.createDataFrame(
            [("CA", 3)], "`State Abbreviation` string, id int")
        res = SchemaMatch.match_schema(primary, reference,
                                       lambda r: r == 1.0)
        assert res.passed and res.ratio == 1.0

    def test_empty_reference_schema_fails(self, spark):
        """:94-103 — reference with NO columns fails."""
        primary = spark.createDataFrame(
            [(1, "CA")], "id int, `State Abbreviation` string")
        reference = spark.createDataFrame([], "x int").drop("x")
        assert not SchemaMatch.match_schema(primary, reference,
                                            lambda r: r == 1.0).passed

    def test_type_mismatch_same_name_fails(self, spark):
        """:105-110 — same names, one type differs → < 1.0."""
        primary = spark.createDataFrame([(1, "test")],
                                        "id int, name string")
        reference = spark.createDataFrame([("1", "test")],
                                          "id string, name string")
        assert not SchemaMatch.match_schema(primary, reference,
                                            lambda r: r == 1.0).passed
