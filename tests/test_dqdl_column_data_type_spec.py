"""ColumnDataTypeSpec.scala transcriptions (line refs per test): the full
end-to-end grid — nested/dotted columns, empty data, DATE with `with
format` tags (full + partial formats), numeric/boolean/decimal/timestamp
types, thresholds, where clauses, error handling, NOT_EQUALS, and multiple
independent rules. Executor semantics per RuleEvaluationHelper.scala:
NULL fails `= TYPE`, zero in-scope rows pass with "No rows matched"."""

import pytest

from deequ_spark.dqdl import EvaluateDataQuality


def _one(df, ruleset):
    (row,) = EvaluateDataQuality.process(df, ruleset).collect()
    return row


class TestColumnDataTypeGeneral:
    """ColumnDataTypeSpec.scala:26-71."""

    def test_nested_columns(self, spark):
        """:28-42 — struct field access info._1 ≡ our info.date."""
        df = spark.createDataFrame(
            [(1, ("2023-01-01", "NY")), (2, ("2023-02-15", "WI")),
             (3, ("2023-03-20", "TX"))],
            "id int, info struct<_1: string, _2: string>")
        row = _one(df, 'Rules=[ColumnDataType "info._1" = "DATE"]')
        assert row["Outcome"] == "Passed"

    def test_dotted_column_name(self, spark):
        """:44-58 — a literal dot, backtick-quoted in the rule."""
        df = spark.createDataFrame(
            [(1, "2023-01-01"), (2, "2023-02-15"), (3, "2023-03-20")],
            ["id", "Some.Date"])
        row = _one(df, 'Rules=[ColumnDataType "`Some.Date`" = "DATE"]')
        assert row["Outcome"] == "Passed"

    def test_empty_dataframe(self, spark):
        """:60-71 — zero rows pass."""
        df = spark.createDataFrame([], "id int, date_col string")
        row = _one(df, 'Rules=[ColumnDataType "date_col" = "DATE"]')
        assert row["Outcome"] == "Passed"
        assert "No rows matched" in row["FailureReason"]


@pytest.fixture()
def iso_dates(spark):
    return spark.createDataFrame(
        [(1, "2023-01-01"), (2, "2023-02-15"), (3, "2023-03-20")],
        "id int, date_col string")


class TestColumnDataTypeDate:
    """ColumnDataTypeSpec.scala:73-300."""

    def test_pass_all_castable(self, iso_dates):
        """:75-91 — metric 1.0."""
        row = _one(iso_dates, 'Rules = [ColumnDataType "date_col" = "DATE"]')
        assert row["Outcome"] == "Passed"
        assert list(row["EvaluatedMetrics"].values()) == [1.0]

    def test_fail_some_not_castable(self, spark):
        """:93-107."""
        df = spark.createDataFrame(
            [(1, "2023-01-01"), (2, "not-a-date"), (3, "2023-03-20")],
            "id int, date_col string")
        row = _one(df, 'Rules = [ColumnDataType "date_col" = "DATE"]')
        assert row["Outcome"] == "Failed"

    def test_fail_none_castable_metric_zero(self, spark):
        """:109-125 — metric 0.0."""
        df = spark.createDataFrame(
            [(1, "not-a-date"), (2, "also-not-a-date"),
             (3, "still-not-a-date")], "id int, date_col string")
        row = _one(df, 'Rules = [ColumnDataType "date_col" = "DATE"]')
        assert row["Outcome"] == "Failed"
        assert list(row["EvaluatedMetrics"].values()) == [0.0]

    def test_format_iso(self, iso_dates):
        """:127-141."""
        row = _one(iso_dates, 'Rules = [ColumnDataType "date_col" = "DATE" '
                              'with format = "yyyy-MM-dd"]')
        assert row["Outcome"] == "Passed"

    def test_format_dd_mm_yyyy(self, spark):
        """:143-157."""
        df = spark.createDataFrame(
            [(1, "01-01-2023"), (2, "15-02-2023"), (3, "20-03-2023")],
            "id int, date_col string")
        row = _one(df, 'Rules = [ColumnDataType "date_col" = "DATE" '
                       'with format = "dd-MM-yyyy"]')
        assert row["Outcome"] == "Passed"

    def test_format_mm_dd_yyyy(self, spark):
        """:159-173."""
        df = spark.createDataFrame(
            [(1, "01-01-2023"), (2, "02-15-2023"), (3, "03-20-2023")],
            "id int, date_col string")
        row = _one(df, 'Rules = [ColumnDataType "date_col" = "DATE" '
                       'with format = "MM-dd-yyyy"]')
        assert row["Outcome"] == "Passed"

    def test_fail_non_iso_without_format(self, spark):
        """:175-189."""
        df = spark.createDataFrame(
            [(1, "01-01-2023"), (2, "15-02-2023"), (3, "20-03-2023")],
            "id int, date_col string")
        row = _one(df, 'Rules = [ColumnDataType "date_col" = "DATE"]')
        assert row["Outcome"] == "Failed"

    @pytest.mark.parametrize("fmt,values", [
        ("MM/yyyy", ["01/2023", "02/2023", "03/2023"]),      # :191-205
        ("yyyy-MM", ["2023-01", "2023-02", "2023-03"]),      # :207-221
        ("MM-yyyy", ["01-2023", "02-2023", "03-2023"]),      # :223-237
        ("dd-MM", ["01-01", "15-02", "20-03"]),              # :239-253
    ])
    def test_partial_formats(self, spark, fmt, values):
        df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                                   "id int, date_col string")
        row = _one(df, f'Rules = [ColumnDataType "date_col" = "DATE" '
                       f'with format = "{fmt}"]')
        assert row["Outcome"] == "Passed"

    def test_invalid_format_tag_fails(self, spark):
        """:255-269."""
        df = spark.createDataFrame(
            [(1, "2023-01-01"), (2, "2023-02-15")],
            "id int, date_col string")
        row = _one(df, 'Rules = [ColumnDataType "date_col" = "DATE" '
                       'with format = "invalid-format"]')
        assert row["Outcome"] == "Failed"

    def test_wrong_format_for_data_fails(self, spark):
        """:270-284."""
        df = spark.createDataFrame(
            [(1, "2023-01-01"), (2, "2023-02-15")],
            "id int, date_col string")
        row = _one(df, 'Rules = [ColumnDataType "date_col" = "DATE" '
                       'with format = "dd-MM-yyyy"]')
        assert row["Outcome"] == "Failed"

    def test_slash_format(self, spark):
        """:285-300."""
        df = spark.createDataFrame(
            [(1, "01/01/2023"), (2, "15/02/2023"), (3, "20/03/2023")],
            "id int, date_col string")
        row = _one(df, 'Rules = [ColumnDataType "date_col" = "DATE" '
                       'with format = "dd/MM/yyyy"]')
        assert row["Outcome"] == "Passed"


class TestColumnDataTypeOtherTypes:
    """ColumnDataTypeSpec.scala:302-458."""

    def test_double_pass(self, spark):
        """:304-318."""
        df = spark.createDataFrame(
            [(1, "1.5"), (2, "2.75"), (3, "3.0")], "id int, col string")
        assert _one(df, 'Rules = [ColumnDataType "col" = "DOUBLE"]'
                    )["Outcome"] == "Passed"

    def test_double_fail(self, spark):
        """:320-337."""
        df = spark.createDataFrame(
            [(1, "1.5"), (2, "not-a-number"), (3, "3.0")],
            "id int, col string")
        row = _one(df, 'Rules = [ColumnDataType "col" = "DOUBLE"]')
        assert row["Outcome"] == "Failed"

    def test_integer_pass(self, spark):
        """:339-353."""
        df = spark.createDataFrame(
            [(1, "100"), (2, "200"), (3, "300")], "id int, col string")
        assert _one(df, 'Rules = [ColumnDataType "col" = "INTEGER"]'
                    )["Outcome"] == "Passed"

    def test_long_pass(self, spark):
        """:355-369."""
        df = spark.createDataFrame(
            [(1, "10000000000"), (2, "20000000000")], "id int, col string")
        assert _one(df, 'Rules = [ColumnDataType "col" = "LONG"]'
                    )["Outcome"] == "Passed"

    def test_float_pass(self, spark):
        """:371-385."""
        df = spark.createDataFrame(
            [(1, "1.5"), (2, "2.5")], "id int, col string")
        assert _one(df, 'Rules = [ColumnDataType "col" = "FLOAT"]'
                    )["Outcome"] == "Passed"

    def test_boolean_pass(self, spark):
        """:388-405."""
        df = spark.createDataFrame(
            [(1, "true"), (2, "false"), (3, "true")], "id int, col string")
        assert _one(df, 'Rules = [ColumnDataType "col" = "BOOLEAN"]'
                    )["Outcome"] == "Passed"

    def test_decimal_pass(self, spark):
        """:407-423."""
        df = spark.createDataFrame(
            [(1, "12.34"), (2, "56.78")], "id int, col string")
        assert _one(df, 'Rules = [ColumnDataType "col" = "DECIMAL(4,2)"]'
                    )["Outcome"] == "Passed"

    def test_decimal_with_spaces(self, spark):
        """:425-439."""
        df = spark.createDataFrame(
            [(1, "12.34"), (2, "56.78")], "id int, col string")
        assert _one(df, 'Rules = [ColumnDataType "col" = "DECIMAL(4, 2)"]'
                    )["Outcome"] == "Passed"

    def test_timestamp_pass(self, spark):
        """:441-458."""
        df = spark.createDataFrame(
            [(1, "2023-01-01 10:30:00"), (2, "2023-02-15 14:45:30")],
            "id int, col string")
        assert _one(df, 'Rules = [ColumnDataType "col" = "TIMESTAMP"]'
                    )["Outcome"] == "Passed"


class TestColumnDataTypeThresholdSpec:
    """ColumnDataTypeSpec.scala:460-512."""

    @pytest.fixture()
    def df_three_quarters(self, spark):
        return spark.createDataFrame(
            [(1, "100"), (2, "200"), (3, "not-a-number"), (4, "400")],
            "id int, col string")

    def test_threshold_met(self, df_three_quarters):
        """:462-477 — 0.75 > 0.7."""
        row = _one(df_three_quarters,
                   'Rules = [ColumnDataType "col" = "INTEGER" '
                   'with threshold > 0.7]')
        assert row["Outcome"] == "Passed"

    def test_threshold_not_met(self, df_three_quarters):
        """:479-494."""
        row = _one(df_three_quarters,
                   'Rules = [ColumnDataType "col" = "INTEGER" '
                   'with threshold > 0.8]')
        assert row["Outcome"] == "Failed"
        assert "does not meet the constraint requirement" in \
            row["FailureReason"]

    def test_threshold_exact(self, df_three_quarters):
        """:496-512 — >= 0.75 passes on exactly 0.75."""
        row = _one(df_three_quarters,
                   'Rules = [ColumnDataType "col" = "INTEGER" '
                   'with threshold >= 0.75]')
        assert row["Outcome"] == "Passed"


class TestColumnDataTypeWhere:
    """ColumnDataTypeSpec.scala:514-566."""

    def test_where_clause(self, spark):
        """:516-534 — only id <= 2 in scope, both castable → 1.0."""
        df = spark.createDataFrame(
            [(1, "2023-01-01"), (2, "2023-02-15"), (3, "not-a-date"),
             (4, "2023-04-20")], "id int, date_col string")
        row = _one(df, 'Rules = [ColumnDataType "date_col" = "DATE" '
                       'where "id <= 2"]')
        assert row["Outcome"] == "Passed"
        assert list(row["EvaluatedMetrics"].values()) == [1.0]

    def test_where_filters_everything(self, spark):
        """:535-550."""
        df = spark.createDataFrame(
            [(1, "2023-01-01"), (2, "2023-02-15")],
            "id int, date_col string")
        row = _one(df, 'Rules = [ColumnDataType "date_col" = "DATE" '
                       'where "id > 10"]')
        assert row["Outcome"] == "Passed"
        assert "No rows matched" in row["FailureReason"]

    def test_invalid_where_clause(self, spark):
        """:551-566."""
        df = spark.createDataFrame(
            [(1, "2023-01-01"), (2, "2023-02-15")],
            "id int, date_col string")
        row = _one(df, 'Rules = [ColumnDataType "date_col" = "DATE" '
                       'where "invalid%%clause"]')
        assert row["Outcome"] == "Failed"
        assert "where clause is invalid" in row["FailureReason"]


class TestColumnDataTypeErrors:
    """ColumnDataTypeSpec.scala:568-600."""

    def test_unrecognized_type(self, spark):
        """:570-582."""
        df = spark.createDataFrame([(1, "value")], "id int, col string")
        row = _one(df, 'Rules = [ColumnDataType "col" = "UNKNOWN_TYPE"]')
        assert row["Outcome"] == "Failed"
        assert "Unrecognized data type" in row["FailureReason"]

    def test_missing_column(self, spark):
        """:584-596."""
        df = spark.createDataFrame([(1, "value")], "id int, col string")
        row = _one(df, 'Rules = [ColumnDataType "nonexistent" = "DATE"]')
        assert row["Outcome"] == "Failed"
        assert "does not exist" in row["FailureReason"]


class TestColumnDataTypeNotEquals:
    """ColumnDataTypeSpec.scala:598-632."""

    def test_not_equals_pass(self, spark):
        """:600-614."""
        df = spark.createDataFrame(
            [(1, "not-a-date"), (2, "also-not-a-date"),
             (3, "still-not-a-date")], "id int, col string")
        assert _one(df, 'Rules = [ColumnDataType "col" != "DATE"]'
                    )["Outcome"] == "Passed"

    def test_not_equals_fail(self, spark):
        """:616-632."""
        df = spark.createDataFrame(
            [(1, "2023-01-01"), (2, "not-a-date"), (3, "2023-03-20")],
            "id int, col string")
        assert _one(df, 'Rules = [ColumnDataType "col" != "DATE"]'
                    )["Outcome"] == "Failed"


class TestColumnDataTypeMultipleRules:
    """ColumnDataTypeSpec.scala:634-656."""

    def test_independent_rules(self, spark):
        df = spark.createDataFrame(
            [(1, "2023-01-01", "100"), (2, "2023-02-15", "200"),
             (3, "2023-03-20", "not-a-number")],
            "id int, date_col string, int_col string")
        rows = EvaluateDataQuality.process(
            df, 'Rules = [ColumnDataType "date_col" = "DATE", '
                'ColumnDataType "int_col" = "INTEGER"]').collect()
        assert len(rows) == 2
        by_rule = {r["Rule"]: r["Outcome"] for r in rows}
        assert by_rule['ColumnDataType "date_col" = "DATE"'] == "Passed"
        assert by_rule['ColumnDataType "int_col" = "INTEGER"'] == "Failed"


class TestColumnDataTypeRuleSpecTail:
    """ColumnDataTypeRuleSpec.scala translator-level cases not exercised
    by the end-to-end Spec: special-character columns, unsupported
    operators, missing TargetColumn, case-insensitive type names."""

    def test_special_character_column(self, spark):
        """:168-177 — dashes in the column name resolve (backtick
        quoting)."""
        df = spark.createDataFrame([(1, "100"), (2, "200")],
                                   ["id", "column-with-dashes"])
        row = _one(df, 'Rules=[ColumnDataType "column-with-dashes" '
                       '= "INTEGER"]')
        assert row["Outcome"] == "Passed"

    def test_unsupported_operator_in(self, spark):
        """:135-158 — IN / NOT_IN are unsupported operators."""
        df = spark.createDataFrame([(1, "x")], "id int, col string")
        row = _one(df, 'Rules=[ColumnDataType "col" in ["DATE"]]')
        assert row["Outcome"] == "Failed"
        assert "supports EQUALS" in row["FailureReason"]

    def test_missing_target_column(self, spark):
        """:179-189."""
        df = spark.createDataFrame([(1, "x")], "id int, col string")
        row = _one(df, 'Rules=[ColumnDataType = "DATE"]')
        assert row["Outcome"] == "Failed"
        assert "TargetColumn" in row["FailureReason"]

    def test_case_insensitive_type_name(self, spark):
        """:160-166 — 'date' lowercase resolves."""
        df = spark.createDataFrame([(1, "2023-01-01")],
                                   "id int, col string")
        row = _one(df, 'Rules=[ColumnDataType "col" = "date"]')
        assert row["Outcome"] == "Passed"
