"""Transcription of /root/reference/src/test/scala/com/amazon/deequ/
schema/RowLevelSchemaValidatorTest.scala (265 LoC; line refs per test):
the valid/invalid row split, per-type constraint edges, and the cast
behavior of the valid side."""

from decimal import Decimal

from deequ_spark import RowLevelSchema, validate_schema


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestRowLevelSchemaValidatorParity:
    def test_null_constraints(self, spark):
        """:27-57 'correctly enforce null constraints'."""
        data = _df(spark, [
            ("123", "Product A", "2012-07-22 22:59:59"),
            ("N/A", "Product B", None),
            ("456", None, "2012-07-22 22:59:59"),
            (None, "Product C", "2012-07-22 22:59:59")],
            "id string, name string, event_time string")
        schema = (RowLevelSchema()
                  .with_int_column("id", is_nullable=False)
                  .with_string_column("name", max_length=10)
                  .with_timestamp_column("event_time",
                                         mask="yyyy-MM-dd HH:mm:ss",
                                         is_nullable=False))
        result = validate_schema(data, schema)
        assert result.num_valid_rows == 2
        valid_ids = {r["id"] for r in result.valid_rows.select("id").collect()}
        assert valid_ids == {123, 456}
        assert result.num_invalid_rows == 2
        invalid_ids = {r["id"]
                       for r in result.invalid_rows.select("id").collect()}
        assert len(invalid_ids) == 2
        assert "123" not in invalid_ids and "456" not in invalid_ids

    def test_string_constraints(self, spark):
        """:59-84 — min/max length with a non-nullable column."""
        data = _df(spark, [("Hello",), ("H.",), ("Hello World",),
                           ("Spaaaa" + "a" * 52 + "m",), (None,)],
                   "name string")
        schema = RowLevelSchema().with_string_column(
            "name", is_nullable=False, min_length=3, max_length=11)
        result = validate_schema(data, schema)
        assert result.num_valid_rows == 2
        valid = {r["name"] for r in result.valid_rows.collect()}
        assert valid == {"Hello", "Hello World"}
        assert result.num_invalid_rows == 3
        assert result.invalid_rows.count() == 3

    def test_string_regex_filter(self, spark):
        """:86-118 'correctly filter string columns according to regexes'
        — NULL passes a nullable regex column; valid/invalid disjoint."""
        data = _df(spark, [("Hello",), ("hello",), ("hello123",),
                           ("hello world",), ("Spaaaa" + "a" * 52 + "m",),
                           ("&&%%%/&/&/&asdaf",), (None,)], "name string")
        schema = RowLevelSchema().with_string_column(
            "name", matches=r"^[a-z0-9_\-\s]+$")
        result = validate_schema(data, schema)
        assert result.num_valid_rows == 4
        valid = {r["name"] for r in result.valid_rows.collect()}
        assert valid == {"hello", "hello123", "hello world", None}
        invalid = {r["name"] for r in result.invalid_rows.collect()}
        assert result.num_invalid_rows == 3
        assert valid & invalid == set()

    def test_integer_constraints(self, spark):
        """:120-147 — cast failures AND out-of-range both invalid."""
        data = _df(spark, [("123",), ("N/A",), ("456",), ("999999",),
                           ("-9",), ("-100000",), (None,)], "id string")
        schema = RowLevelSchema().with_int_column(
            "id", is_nullable=False, min_value=-10, max_value=1000)
        result = validate_schema(data, schema)
        assert result.num_valid_rows == 3
        assert {r["id"] for r in result.valid_rows.collect()} == {123, 456,
                                                                  -9}
        assert result.num_invalid_rows == 4
        assert result.invalid_rows.count() == 4

    def test_decimal_constraints(self, spark):
        """:149-178 — precision/scale cast edges: '299.000' and '1295'
        cast to scale 2; '###'/'n/a'/null invalid."""
        data = _df(spark, [("299.000",), ("1295",), ("###",), ("-19.99",),
                           ("-99.99",), ("n/a",), (None,)], "amount string")
        schema = RowLevelSchema().with_decimal_column(
            "amount", precision=10, scale=2, is_nullable=False)
        result = validate_schema(data, schema)
        assert result.num_valid_rows == 4
        valid = {r["amount"] for r in result.valid_rows.collect()}
        assert valid == {Decimal("299.00"), Decimal("1295.00"),
                         Decimal("-19.99"), Decimal("-99.99")}
        assert result.num_invalid_rows == 3

    def test_timestamp_constraints(self, spark):
        """:180-205 — mask parse failures and NULL all invalid when
        non-nullable."""
        data = _df(spark, [("2012-07-22 22:59:59",), ("N/A",),
                           ("2012-07-22 22:21:59",), ("yesterday night",),
                           (None,)], "created string")
        schema = RowLevelSchema().with_timestamp_column(
            "created", mask="yyyy-MM-dd HH:mm:ss", is_nullable=False)
        result = validate_schema(data, schema)
        assert result.num_valid_rows == 2
        assert result.valid_rows.count() == 2
        assert result.num_invalid_rows == 3
        invalid = {r["created"] for r in result.invalid_rows.collect()}
        assert {"N/A", "yesterday night", None} <= invalid

    def test_integration(self, spark):
        """:207-264 'pass a simple integration test' — the valid side is
        CAST (id int, event_time timestamp), the invalid side keeps the
        original string schema."""
        data = _df(spark, [
            ("123", "Product A", "2012-07-22 22:59:59"),
            ("N/A", "Product B", None),
            (None, "Product C", None),
            ("456", "Product D, a must buy", "2012-07-22 22:59:59"),
            ("789", "Product D, another must buy", "2012-07-22 22:59:59"),
            ("101", "Product E", "2012-07-22 22:59:59"),
            ("103", "Product F", "yesterday morning")],
            "id string, name string, event_time string")
        schema = (RowLevelSchema()
                  .with_int_column("id", is_nullable=False)
                  .with_string_column("name", max_length=10)
                  .with_timestamp_column("event_time",
                                         mask="yyyy-MM-dd HH:mm:ss"))
        result = validate_schema(data, schema)
        assert result.num_valid_rows == 2
        fields = dict(result.valid_rows.dtypes)
        assert fields == {"id": "int", "name": "string",
                          "event_time": "timestamp"}
        valid_names = [r["name"] for r in result.valid_rows.collect()]
        assert sorted(valid_names) == ["Product A", "Product E"]
        inv_fields = dict(result.invalid_rows.dtypes)
        assert inv_fields["id"] == "string" and inv_fields["name"] == "string"
        invalid_names = [r["name"] for r in result.invalid_rows.collect()]
        assert len(invalid_names) == result.num_invalid_rows == 5
        assert sum(n.startswith("Product D") for n in invalid_names) == 2
        assert sum(n.startswith("Product C") for n in invalid_names) == 1
        assert sum(n.startswith("Product B") for n in invalid_names) == 1
