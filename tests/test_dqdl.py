"""DQDL subset tests (parity: dqdl/EvaluateDataQualitySpec.scala shapes)."""

import pytest

from deequ_spark.dqdl import (DQDLParseError, EvaluateDataQuality, parse,
                              to_checks)


def _outcomes(df):
    return {r["Rule"]: r["Outcome"] for r in df.collect()}


class TestParser:
    def test_basic(self):
        rs = parse('Rules = [RowCount > 10, IsComplete "item"]')
        assert len(rs.rules) == 2
        assert rs.rules[0].rule_type == "RowCount"
        assert rs.rules[0].condition.op == ">"
        assert rs.rules[1].parameters == ["item"]

    def test_between_in_matches(self):
        rs = parse('Rules = [ColumnLength "item" between 0 and 10, '
                   'ColumnValues "att1" in ["a", "b"], '
                   'ColumnValues "att1" matches "[ab]"]')
        assert rs.rules[0].condition.kind == "between"
        assert rs.rules[1].condition.values == ["a", "b"]
        assert rs.rules[2].condition.kind == "matches"

    def test_not_in_and_where(self):
        rs = parse('Rules = [ColumnValues "att1" not in ["z"] '
                   'where "att2 IS NOT NULL"]')
        assert rs.rules[0].condition.negated
        assert rs.rules[0].where == "att2 IS NOT NULL"

    def test_composite(self):
        rs = parse('Rules = [(IsComplete "item") and (IsUnique "item")]')
        comp = rs.rules[0]
        assert comp.operator == "and"
        assert len(comp.rules) == 2

    def test_errors(self):
        with pytest.raises(DQDLParseError):
            parse('NotRules = [RowCount > 1]')
        with pytest.raises(DQDLParseError):
            parse('Rules = [RowCount > ]')
        with pytest.raises(DQDLParseError):
            to_checks(parse('Rules = [Bogus "x" > 1]'))


class TestExecution:
    def test_aggregate_rules(self, df_full):
        out = EvaluateDataQuality.process(df_full, """Rules = [
            RowCount = 4, ColumnCount = 3, IsComplete "item",
            Completeness "att1" >= 1.0, IsUnique "item",
            Uniqueness "att1" < 0.5,
            DistinctValuesCount "att1" = 2 ]""")
        oc = _outcomes(out)
        assert all(v == "Passed" for v in oc.values()), oc

    def test_numeric_stat_rules(self, df_numeric):
        out = EvaluateDataQuality.process(df_numeric, """Rules = [
            Mean "att1" between 3 and 4,
            Sum "att1" = 21,
            StandardDeviation "att1" between 1.7 and 1.71,
            Entropy "att2" > 0 ]""")
        oc = _outcomes(out)
        assert all(v == "Passed" for v in oc.values()), oc

    def test_failing_rules(self, df_full):
        out = EvaluateDataQuality.process(
            df_full, 'Rules = [RowCount > 100, IsUnique "att1"]')
        oc = _outcomes(out)
        assert all(v == "Failed" for v in oc.values()), oc
        reasons = {r["Rule"]: r["FailureReason"] for r in out.collect()}
        assert any(reasons.values())

    def test_column_values_and_length(self, df_full):
        out = EvaluateDataQuality.process(df_full, """Rules = [
            ColumnValues "att1" in ["a", "b"],
            ColumnValues "item" between 0 and 5,
            ColumnLength "item" = 1,
            ColumnValues "att2" not in ["z"] ]""")
        assert all(v == "Passed" for v in _outcomes(out).values())

    def test_where_clause(self, df_full):
        # att2 = 'c' only for att1 = 'a' rows
        out = EvaluateDataQuality.process(
            df_full, 'Rules = [ColumnValues "att2" in ["c"] '
                     'where "att1 = \'a\'"]')
        assert all(v == "Passed" for v in _outcomes(out).values())

    def test_custom_sql(self, df_full):
        out = EvaluateDataQuality.process(
            df_full,
            'Rules = [CustomSql "select count(*) from primary" = 4]')
        assert all(v == "Passed" for v in _outcomes(out).values())

    def test_composite_or(self, df_full):
        out = EvaluateDataQuality.process(
            df_full, 'Rules = [(RowCount > 100) or (RowCount = 4)]')
        assert all(v == "Passed" for v in _outcomes(out).values())

    def test_composite_and_fails(self, df_full):
        out = EvaluateDataQuality.process(
            df_full, 'Rules = [(RowCount > 100) and (RowCount = 4)]')
        assert all(v == "Failed" for v in _outcomes(out).values())

    def test_evaluated_metrics_exposed(self, df_full):
        """Keys use the Glue DQDL vocabulary 'Entity.instance.Name'
        (ExecutableRule.scala evaluatedMetricName: Size maps to
        Dataset.*.RowCount)."""
        out = EvaluateDataQuality.process(df_full, 'Rules = [RowCount = 4]')
        row = out.collect()[0]
        assert row["EvaluatedMetrics"] == {"Dataset.*.RowCount": 4.0}

    def test_composite_or_multi_constraint_member(self, df_full):
        """IsPrimaryKey expands to several constraints; 'or' must evaluate
        per MEMBER rule (regression: per-constraint any())."""
        # att1 is complete but NOT unique; att2 is complete but not unique
        out = EvaluateDataQuality.process(
            df_full, 'Rules = [(IsPrimaryKey "att1") or (IsUnique "att2")]')
        assert all(v == "Failed" for v in _outcomes(out).values())
        out2 = EvaluateDataQuality.process(
            df_full, 'Rules = [(IsPrimaryKey "att1") or (IsUnique "item")]')
        assert all(v == "Passed" for v in _outcomes(out2).values())

    def test_where_applies_to_all_member_constraints(self, df_missing):
        # att1 is null for items 3,6,7,10,11,12 — restrict to item <= 2
        # where IsPrimaryKey's completeness AND uniqueness both hold
        out = EvaluateDataQuality.process(
            df_missing,
            'Rules = [IsPrimaryKey "att1" where "CAST(item AS INT) <= 2"]')
        assert all(v == "Passed" for v in _outcomes(out).values())

    def test_quote_escaping_in_literals(self, spark):
        df = spark.createDataFrame([("O'Brien",), ("Smith",)], "name string")
        out = EvaluateDataQuality.process(
            df, 'Rules = [ColumnValues "name" in ["O\'Brien", "Smith"]]')
        assert all(v == "Passed" for v in _outcomes(out).values())

    def test_column_names_match_pattern(self, df_full):
        out = EvaluateDataQuality.process(
            df_full, 'Rules = [ColumnNamesMatchPattern "(item|att.*)"]')
        assert all(v == "Passed" for v in _outcomes(out).values())
        out2 = EvaluateDataQuality.process(
            df_full, 'Rules = [ColumnNamesMatchPattern "att.*"]')
        assert all(v == "Failed" for v in _outcomes(out2).values())

    def test_data_freshness(self, spark):
        import datetime
        now = datetime.datetime.now()
        df = spark.createDataFrame(
            [(now - datetime.timedelta(hours=1),),
             (now - datetime.timedelta(hours=2),)], "ts timestamp")
        fresh = EvaluateDataQuality.process(
            df, 'Rules = [DataFreshness "ts" <= 1 days]')
        assert all(v == "Passed" for v in _outcomes(fresh).values())
        stale = EvaluateDataQuality.process(
            df, 'Rules = [DataFreshness "ts" <= 30 minutes]')
        assert all(v == "Failed" for v in _outcomes(stale).values())

    def test_in_with_null_keyword(self, df_missing):
        # att1 in {a, b, NULL} covers every row of F1
        out = EvaluateDataQuality.process(
            df_missing, 'Rules = [ColumnValues "att1" in ["a", "b", NULL]]')
        assert all(v == "Passed" for v in _outcomes(out).values())


class TestExtendedRuleTypes:
    """The remainder of the reference's 25-entry converter map plus the
    specially-handled dataset-level rules (DQDLRuleTranslator.scala:69-160)."""

    def test_numeric_converter_map(self, df_numeric):
        out = EvaluateDataQuality.process(df_numeric, """Rules = [
            ZerosCount "att2" = 3,
            UniqueValueRatio "att1" = 1.0,
            Range "att1" = 5,
            InterquartileRange "att1" between 2 and 4,
            Variance "att1" between 2.9 and 3.0,
            Skewness "att1" between -1 and 1,
            Kurtosis "att1" between -2 and 2,
            ColumnCorrelation "att1" "att2" > 0.8,
            DuplicateRowCount = 0 ]""")
        oc = _outcomes(out)
        assert all(v == "Passed" for v in oc.values()), oc

    def test_column_data_type(self, spark):
        df = spark.createDataFrame(
            [("1",), ("2",), ("x",), (None,)], "v string")
        out = EvaluateDataQuality.process(
            df, 'Rules = [ColumnDataType "v" = "INTEGER"]')
        # 2 of 4 values cast cleanly -> Failed
        assert all(v == "Failed" for v in _outcomes(out).values())
        # executor semantics (RuleEvaluationHelper.scala): a NULL value
        # does NOT cast, so it fails `= TYPE` — 2/3 ratio → Failed
        ints = spark.createDataFrame([("1",), ("2",), (None,)], "v string")
        out2 = EvaluateDataQuality.process(
            ints, 'Rules = [ColumnDataType "v" = "INTEGER"]')
        assert all(v == "Failed" for v in _outcomes(out2).values())
        row = out2.collect()[0]
        assert abs(row["EvaluatedMetrics"]
                   ["Column.v.ColumnDataType.Compliance"] - 2 / 3) < 1e-9
        no_nulls = spark.createDataFrame([("1",), ("2",)], "v string")
        out3 = EvaluateDataQuality.process(
            no_nulls, 'Rules = [ColumnDataType "v" = "INTEGER"]')
        assert all(v == "Passed" for v in _outcomes(out3).values())

    def test_column_data_type_unsupported(self, df_full):
        """ColumnDataTypeSpec.scala:570-582 — an unrecognized type is a
        FAILED rule row, not a thrown error."""
        out = EvaluateDataQuality.process(
            df_full, 'Rules = [ColumnDataType "att1" = "BLOB"]')
        (row,) = out.collect()
        assert row["Outcome"] == "Failed"
        assert "Unrecognized data type" in row["FailureReason"]

    def test_dataset_rules(self, spark, df_full):
        # SchemaMatch needs EQUAL column counts (SchemaMatch.scala:38-40
        # hard-fails on a count mismatch): 3 columns with one renamed →
        # ratio 2/3, inside the between bound
        ref = spark.createDataFrame(
            [("1", "a", "x"), ("2", "a", "y"), ("3", "a", "z"),
             ("4", "b", "w")], "item string, att1 string, other string")
        out = EvaluateDataQuality.process(df_full, """Rules = [
            RowCountMatch "ref" = 1.0,
            SchemaMatch "ref" between 0.6 and 0.7,
            ReferentialIntegrity "item" "ref.item" = 1.0,
            DatasetMatch "ref" "item->item" "att1->att1" = 1.0,
            AggregateMatch "sum(att1)" "sum(ref.att1)" = 1.0 ]""",
            additional_datasets={"ref": ref})
        oc = _outcomes(out)
        # AggregateMatch on a string column fails (sums are NULL); the
        # other four dataset rules pass
        assert oc['RowCountMatch "ref" = 1'] == "Passed"
        assert oc['SchemaMatch "ref" between 0.6 and 0.7'] == "Passed"
        assert oc['ReferentialIntegrity "item" "ref.item" = 1'] == "Passed"
        assert oc['DatasetMatch "ref" "item->item" "att1->att1" = 1'] == "Passed"
        assert oc['AggregateMatch "sum(att1)" "sum(ref.att1)" = 1'] == "Failed"

    def test_aggregate_match_numeric(self, spark, df_numeric):
        half = df_numeric.limit(3)
        out = EvaluateDataQuality.process(df_numeric, """Rules = [
            AggregateMatch "sum(att1)" "sum(half.att1)" = 3.5,
            AggregateMatch "avg(att1)" "avg(half.att1)" = 1.75 ]""",
            additional_datasets={"half": half})
        assert all(v == "Passed" for v in _outcomes(out).values())

    def test_referential_integrity_partial(self, spark, df_full):
        ref = spark.createDataFrame([("1",), ("2",)], "item string")
        out = EvaluateDataQuality.process(
            df_full,
            'Rules = [ReferentialIntegrity "item" "ref.item" = 0.5]',
            additional_datasets={"ref": ref})
        assert all(v == "Passed" for v in _outcomes(out).values())

    def test_dataset_rule_missing_alias(self, df_full):
        out = EvaluateDataQuality.process(
            df_full, 'Rules = [RowCountMatch "nope" = 1.0]')
        rows = out.collect()
        assert rows[0]["Outcome"] == "Failed"
        assert "nope" in rows[0]["FailureReason"]

    def test_dataset_rule_in_composite_rejected(self, df_full):
        with pytest.raises(DQDLParseError):
            EvaluateDataQuality.process(
                df_full,
                'Rules = [(RowCount > 0) and (RowCountMatch "x" = 1.0)]')

    def test_mixed_order_preserved(self, spark, df_full):
        ref = spark.createDataFrame([("1",)], "item string")
        out = EvaluateDataQuality.process(df_full, """Rules = [
            RowCount = 4,
            RowCountMatch "ref" = 4.0,
            IsComplete "att1" ]""", additional_datasets={"ref": ref})
        rules = [r["Rule"] for r in out.collect()]
        assert rules == ['RowCount = 4', 'RowCountMatch "ref" = 4',
                         'IsComplete "att1"']
        assert all(v == "Passed" for v in _outcomes(out).values())


class TestProcessRows:
    """Parity: EvaluateDataQuality.processRows (EvaluateDataQuality.scala:96-139)."""

    def test_row_level_columns(self, df_full):
        out = EvaluateDataQuality.process_rows(df_full, """Rules = [
            ColumnValues "att1" in ["a"],
            IsComplete "att2" ]""")["annotatedData"]
        rows = out.collect()
        assert len(rows) == 4
        # att1 = 'b' on item 4 only
        by_item = {r["item"]: r['ColumnValues "att1" in ["a"]'] for r in rows}
        assert by_item == {"1": True, "2": True, "3": True, "4": False}
        assert all(r['IsComplete "att2"'] for r in rows)

    def test_aggregate_rules_add_no_column(self, df_full):
        out = EvaluateDataQuality.process_rows(
            df_full, 'Rules = [RowCount = 4]')["annotatedData"]
        assert out.columns == df_full.columns

    def test_referential_integrity_row_level(self, spark, df_full):
        ref = spark.createDataFrame([("1",), ("2",)], "item string")
        out = EvaluateDataQuality.process_rows(
            df_full,
            'Rules = [ReferentialIntegrity "item" "ref.item" = 0.5]',
            additional_datasets={"ref": ref})["annotatedData"]
        col = 'ReferentialIntegrity "item" "ref.item" = 0.5'
        by_item = {r["item"]: r[col] for r in out.collect()}
        assert by_item == {"1": True, "2": True, "3": False, "4": False}

    def test_dataset_match_row_level(self, spark, df_full):
        ref = df_full.limit(2)
        out = EvaluateDataQuality.process_rows(
            df_full,
            'Rules = [DatasetMatch "ref" "item->item" = 0.5]',
            additional_datasets={"ref": ref})["annotatedData"]
        col = 'DatasetMatch "ref" "item->item" = 0.5'
        matched = sum(1 for r in out.collect() if r[col])
        assert matched == 2


class TestCustomSqlRowLevel:
    """CustomSql WITHOUT a numeric condition is the row-level variant: the
    SQL selects the PASSING rows (parity: CustomSqlRowLevelExecutor)."""

    def test_outcome_and_ratio(self, df_full):
        out = EvaluateDataQuality.process(
            df_full,
            'Rules = [CustomSql "select item from primary where att1 = \'a\'"]')
        row = out.collect()[0]
        assert row["Outcome"] == "Failed"         # only 3 of 4 rows pass
        assert row["EvaluatedMetrics"]["Dataset.*.CustomSQL.Compliance"] \
            == 0.75

    def test_all_rows_pass(self, df_full):
        out = EvaluateDataQuality.process(
            df_full, 'Rules = [CustomSql "select item from primary"]')
        assert out.collect()[0]["Outcome"] == "Passed"

    def test_row_level_column(self, df_full):
        rule = 'CustomSql "select item from primary where att1 = \'a\'"'
        out = EvaluateDataQuality.process_rows(
            df_full, f"Rules = [{rule}]")["annotatedData"]
        assert out.count() == 4                   # join never multiplies rows
        by_item = {r["item"]: r[rule] for r in out.collect()}
        assert by_item == {"1": True, "2": True, "3": True, "4": False}

    def test_invalid_sql_fails_gracefully(self, df_full):
        out = EvaluateDataQuality.process(
            df_full, 'Rules = [CustomSql "select broken (("]')
        row = out.collect()[0]
        assert row["Outcome"] == "Failed"
        assert "Error executing SQL" in row["FailureReason"]

    def test_foreign_column_rejected(self, df_full):
        out = EvaluateDataQuality.process(
            df_full,
            'Rules = [CustomSql "select item, 1 as not_a_col from primary"]')
        row = out.collect()[0]
        assert row["Outcome"] == "Failed"
        assert "not_a_col" in row["FailureReason"]

    def test_numeric_condition_still_aggregate(self, df_full):
        out = EvaluateDataQuality.process(
            df_full, 'Rules = [CustomSql "select count(*) from primary" = 4]')
        assert out.collect()[0]["Outcome"] == "Passed"


class TestReferenceDQDLParity:
    """Outcome parity against the reference's own DQDL spec corpus —
    rule strings and expected outcomes transcribed from
    /root/reference/src/test/scala/com/amazon/deequ/dqdl/
    EvaluateDataQualitySpec.scala (ColumnCount operator table :80-150) and
    translation/rules/ColumnValuesRuleSpec.scala (NULL/bound semantics:
    BETWEEN exclusive :88, IN null-fails :102, NOT IN null-passes :116,
    != null-passes :284, NOT BETWEEN null-fails :300, = NULL :320)."""

    # EvaluateDataQualitySpec.scala:80-150 — 4-column DataFrame
    COLUMN_COUNT_CASES = {
        "ColumnCount = 4": True, "ColumnCount = 3": False,
        "ColumnCount = 5": False, "ColumnCount = 4.0": True,
        "ColumnCount = 4.9": False,
        "ColumnCount != 4": False, "ColumnCount != 3": True,
        "ColumnCount != 5": True,
        "ColumnCount > 3": True, "ColumnCount > 4": False,
        "ColumnCount > 5": False, "ColumnCount > 3.9": True,
        "ColumnCount > 3.01": True, "ColumnCount > 10": False,
        "ColumnCount > 10.0": False,
        "ColumnCount >= 4": True, "ColumnCount >= 3": True,
        "ColumnCount >= 5": False, "ColumnCount >= 5.554": False,
        "ColumnCount < 5": True, "ColumnCount < 4": False,
        "ColumnCount < 3": False, "ColumnCount < 4.1": True,
        "ColumnCount <= 4": True, "ColumnCount <= 5": True,
        "ColumnCount <= 3": False, "ColumnCount <= 5.2": True,
        # between is EXCLUSIVE on both ends
        "ColumnCount between 2 and 5": True,
        "ColumnCount between 4 and 5": False,
        "ColumnCount between 3 and 4": False,
        "ColumnCount between 5 and 6": False,
        "ColumnCount between 1 and 3": False,
        "ColumnCount between 3.9 and 6": True,
        "ColumnCount between 2 and 5.4454": True,
        "ColumnCount between 3.5 and 4.5": True,
        "ColumnCount not between 5 and 6": True,
        "ColumnCount not between 4 and 5": True,
        "ColumnCount not between 3 and 5": False,
        "ColumnCount not between 1 and 10": False,
        "ColumnCount not in [1,4]": False,
        "ColumnCount not in [10,40]": True,
        "ColumnCount not in [1,2,3]": True,
        "ColumnCount not in [4]": False,
        "ColumnCount not in [1,2,3,5,6]": True,
    }

    def test_column_count_operator_table(self, spark):
        df = spark.createDataFrame(
            [("JFK14", 15, "New York", "NY"), ("SEA53", 20, "Seattle", "WA")],
            "building string, floors int, city string, state string")
        for rule, expect_pass in self.COLUMN_COUNT_CASES.items():
            out = EvaluateDataQuality.process(df, f"Rules=[{rule}]")
            oc = _outcomes(out)
            got = list(oc.values())[0]
            assert got == ("Passed" if expect_pass else "Failed"), \
                f"{rule}: got {got}"

    def test_between_exclusive_bounds_row_level(self, spark):
        # boundary values 18 and 65 FAIL an exclusive between
        df = spark.createDataFrame([(18,), (30,), (65,)], "age int")
        out = EvaluateDataQuality.process(
            df, 'Rules=[ColumnValues "age" between 18 and 65]')
        assert list(_outcomes(out).values()) == ["Failed"]
        interior = spark.createDataFrame([(19,), (30,), (64,)], "age int")
        out2 = EvaluateDataQuality.process(
            interior, 'Rules=[ColumnValues "age" between 18 and 65]')
        assert list(_outcomes(out2).values()) == ["Passed"]

    def test_between_null_fails(self, spark):
        df = spark.createDataFrame([(30,), (None,)], "age int")
        out = EvaluateDataQuality.process(
            df, 'Rules=[ColumnValues "age" between 18 and 65]')
        assert list(_outcomes(out).values()) == ["Failed"]

    def test_in_nulls_fail(self, spark):
        df = spark.createDataFrame([(1,), (None,)], "status_code int")
        out = EvaluateDataQuality.process(
            df, 'Rules=[ColumnValues "status_code" in [1, 2, 3]]')
        assert list(_outcomes(out).values()) == ["Failed"]

    def test_not_in_nulls_pass(self, spark):
        df = spark.createDataFrame([(None,), (200,)], "error_code int")
        out = EvaluateDataQuality.process(
            df, 'Rules=[ColumnValues "error_code" not in [500, 503]]')
        assert list(_outcomes(out).values()) == ["Passed"]

    def test_not_equals_nulls_pass(self, spark):
        df = spark.createDataFrame([(None,), (1,)], "status int")
        out = EvaluateDataQuality.process(
            df, 'Rules=[ColumnValues "status" != 0]')
        assert list(_outcomes(out).values()) == ["Passed"]

    def test_not_between_nulls_fail(self, spark):
        df = spark.createDataFrame([(5,), (25,)], "value int")
        out = EvaluateDataQuality.process(
            df, 'Rules=[ColumnValues "value" not between 10 and 20]')
        assert list(_outcomes(out).values()) == ["Passed"]
        # boundary values pass not-between (complement of exclusive)
        df2 = spark.createDataFrame([(10,), (20,)], "value int")
        out2 = EvaluateDataQuality.process(
            df2, 'Rules=[ColumnValues "value" not between 10 and 20]')
        assert list(_outcomes(out2).values()) == ["Passed"]
        df3 = spark.createDataFrame([(5,), (None,)], "value int")
        out3 = EvaluateDataQuality.process(
            df3, 'Rules=[ColumnValues "value" not between 10 and 20]')
        assert list(_outcomes(out3).values()) == ["Failed"]

    def test_equals_null(self, spark):
        df = spark.createDataFrame(
            [(None,), (None,)], "optional_field int")
        out = EvaluateDataQuality.process(
            df, 'Rules=[ColumnValues "optional_field" = NULL]')
        assert list(_outcomes(out).values()) == ["Passed"]
        df2 = spark.createDataFrame([(None,), (1,)], "optional_field int")
        out2 = EvaluateDataQuality.process(
            df2, 'Rules=[ColumnValues "optional_field" = NULL]')
        assert list(_outcomes(out2).values()) == ["Failed"]

    def test_row_count_and_failure_fields(self, spark):
        """EvaluateDataQualitySpec.scala:48-60, 410-430."""
        df = spark.createDataFrame(
            [("1", "a", "c"), ("2", "b", "c"), ("3", "a", "c"),
             ("4", "b", "d")], "item string, att1 string, att2 string")
        out = EvaluateDataQuality.process(df, "Rules=[RowCount < 10]")
        row = out.collect()[0]
        assert row["Outcome"] == "Passed"
        assert row["FailureReason"] is None
        out2 = EvaluateDataQuality.process(df, "Rules=[ColumnCount = 10]")
        row2 = out2.collect()[0]
        assert row2["Outcome"] == "Failed"
        assert row2["FailureReason"]


class TestDQDLDateValues:
    """Date-operand ColumnValues parity
    (EvaluateDataQualitySpec.scala:1880-2040)."""

    def _dates(self, spark, vals=("2022-02-01", "2022-03-01", "2022-04-01"),
               col="order_date"):
        return spark.createDataFrame(
            [(i + 1, v) for i, v in enumerate(vals)],
            f"id int, `{col}` string")

    def _outcome(self, df, ruleset):
        return list(_outcomes(EvaluateDataQuality.process(df, ruleset)).values())[0]

    def test_greater_than(self, spark):
        df = self._dates(spark)
        assert self._outcome(
            df, 'Rules=[ColumnValues "order_date" > "2022-01-01"]') == "Passed"
        assert self._outcome(
            df, 'Rules=[ColumnValues "order_date" > "2023-01-01"]') == "Failed"

    def test_less_than(self, spark):
        df = self._dates(spark)
        assert self._outcome(
            df, 'Rules=[ColumnValues "order_date" < "2023-01-01"]') == "Passed"

    def test_between_dates(self, spark):
        df = self._dates(spark)
        assert self._outcome(
            df, 'Rules=[ColumnValues "order_date" between "2022-01-01" '
                'and "2022-12-31"]') == "Passed"

    def test_date_in_set(self, spark):
        df = self._dates(spark, ("2022-01-05", "2022-01-05", "2022-03-15"))
        assert self._outcome(
            df, 'Rules=[ColumnValues "order_date" in '
                '["2022-01-05", "2022-03-15"]]') == "Passed"

    def test_typed_date_column(self, spark):
        from pyspark.sql import functions as F
        df = self._dates(spark, ("2022-02-01", "2022-03-01", "2022-07-01"))
        df = df.withColumn("order_date", F.col("order_date").cast("date"))
        assert self._outcome(
            df, 'Rules=[ColumnValues "order_date" >= "2022-02-01"]') == "Passed"

    def test_column_name_with_spaces(self, spark):
        df = self._dates(spark, col="Some Date")
        assert self._outcome(
            df, 'Rules=[ColumnValues "Some Date" > "2022-01-01"]') == "Passed"

    def test_nulls_fail_comparison_but_pass_not_equals(self, spark):
        df = spark.createDataFrame(
            [(1, "2022-02-01"), (2, None), (3, "2022-04-01")],
            "id int, order_date string")
        assert self._outcome(
            df, 'Rules=[ColumnValues "order_date" > "2022-01-01"]') == "Failed"
        assert self._outcome(
            df, 'Rules=[ColumnValues "order_date" != "2099-01-01"]') == "Passed"
        assert self._outcome(
            df, 'Rules=[ColumnValues "order_date" not in ["2099-01-01"]]'
        ) == "Passed"

    def test_where_clause(self, spark):
        df = self._dates(spark, ("2021-06-01", "2022-03-01", "2022-04-01"))
        assert self._outcome(
            df, 'Rules=[ColumnValues "order_date" > "2022-01-01" '
                'where "id > 1"]') == "Passed"

    def test_dynamic_now_expression(self, spark):
        df = self._dates(spark)
        assert self._outcome(
            df, 'Rules=[ColumnValues "order_date" < (now() - 1 days)]'
        ) == "Passed"

    def test_null_in_where_column_filters_row(self, spark):
        df = spark.createDataFrame(
            [("1", "USA", "AUS"), ("2", "GER", "AUS"), ("3", "USA", None),
             ("4", "GER", None), ("5", "USA", "USA")],
            "item string, championnationality string, "
            "runnerupnationality string")
        out = EvaluateDataQuality.process(
            df, 'Rules=[ColumnValues "championnationality" in ["USA","AUS"] '
                'where "runnerupnationality = \'AUS\'"]')
        row = out.collect()[0]
        assert row["Outcome"] == "Failed"   # 1 of 2 in-scope rows passes


class TestDQDLDatasetRulesParity:
    """Dataset-level rule parity (EvaluateDataQualitySpec.scala:965-1870)."""

    def _one(self, df, ruleset, refs=None):
        out = EvaluateDataQuality.process(df, ruleset,
                                          additional_datasets=refs or {})
        return out.collect()[0]

    def test_row_count_match(self, spark):
        primary = spark.createDataFrame(
            [(str(i), n) for i, n in enumerate(
                ["Alice", "Bob", "Charlie", "Joshua Z"], 1)],
            "id string, name string")
        ref = spark.createDataFrame(
            [(str(i), n) for i, n in enumerate(
                ["Dave", "Eve", "Frank", "Grace", "Henry", "Ivy", "Jack"], 1)],
            "id string, name string")
        row = self._one(primary, 'Rules=[RowCountMatch "ref" >= 0.5]',
                        {"ref": ref})
        assert row["Outcome"] == "Passed"

    def test_referential_integrity_partial(self, spark):
        primary = spark.createDataFrame(
            [("California", "CA"), ("New York", "NY"), ("New York", "NY"),
             ("Texas", "TX")],
            "`State Name` string, `State Abbreviation` string")
        ref = spark.createDataFrame([("CA",), ("NY",), ("FL",)],
                                    "`State Abbreviation` string")
        row = self._one(
            primary, 'Rules=[ReferentialIntegrity "State Abbreviation" '
                     '"ref.State Abbreviation" > 0.6]', {"ref": ref})
        assert row["Outcome"] == "Passed"
        strict = self._one(
            primary, 'Rules=[ReferentialIntegrity "State Abbreviation" '
                     '"ref.State Abbreviation" > 0.9]', {"ref": ref})
        assert strict["Outcome"] == "Failed"

    def test_referential_integrity_multi_column(self, spark):
        primary = spark.createDataFrame(
            [("Canada", "CA"), ("New York", "NY")],
            "`State Name` string, `State Abbreviation` string")
        ref = spark.createDataFrame(
            [("California", "CA"), ("New York", "NY"), ("Texas", "TX")],
            "`State Name` string, `State Abbreviation` string")
        row = self._one(
            primary,
            'Rules=[ReferentialIntegrity "State Name,State Abbreviation" '
            '"ref.{State Name,State Abbreviation}" > 0.4]', {"ref": ref})
        assert row["Outcome"] == "Passed"

    def test_referential_integrity_renamed_columns(self, spark):
        primary = spark.createDataFrame(
            [("Seattle", "WA"), ("Portland", "OR")],
            "city string, state string")
        ref = spark.createDataFrame(
            [("Seattle", "WA"), ("Portland", "OR"), ("Denver", "CO")],
            "ref_city string, ref_state string")
        row = self._one(
            primary, 'Rules=[ReferentialIntegrity "city,state" '
                     '"ref.{ref_city,ref_state}" = 1.0]', {"ref": ref})
        assert row["Outcome"] == "Passed"

    def test_aggregate_match_same_dataset(self, spark):
        df = spark.createDataFrame(
            [(100.0, 100.0), (200.0, 200.0), (300.0, 300.0)],
            "colA double, colB double")
        row = self._one(df, 'Rules=[AggregateMatch "sum(colA)" '
                            '"sum(colB)" = 1.0]')
        assert row["Outcome"] == "Passed"

    def test_aggregate_match_zero_over_zero_is_one(self, spark):
        primary = spark.createDataFrame([(0.0,)], "value double")
        ref = spark.createDataFrame([(0.0,)], "value double")
        row = self._one(primary, 'Rules=[AggregateMatch "sum(value)" '
                                 '"sum(ref.value)" = 1.0]', {"ref": ref})
        assert row["Outcome"] == "Passed"

    def test_aggregate_match_avg_ignores_nulls(self, spark):
        primary = spark.createDataFrame(
            [(10.0,), (None,), (20.0,), (None,)], "value double")
        ref = spark.createDataFrame([(15.0,), (15.0,)], "value double")
        row = self._one(primary, 'Rules=[AggregateMatch "avg(value)" '
                                 '"avg(ref.value)" = 1.0]', {"ref": ref})
        assert row["Outcome"] == "Passed"


class TestColumnNamesMatchPatternParity:
    """EvaluateDataQualitySpec.scala:1508-1600."""

    def _one(self, df, ruleset):
        return EvaluateDataQuality.process(df, ruleset).collect()[0]

    def test_all_match(self, spark):
        df = spark.createDataFrame([("a", "b")], "col_one string, col_two string")
        row = self._one(df, 'Rules=[ColumnNamesMatchPattern "col_.*"]')
        assert row["Outcome"] == "Passed"

    def test_one_nonmatching_fails(self, spark):
        df = spark.createDataFrame([("a", "b", "c")],
                                   "col_one string, col_two string, other string")
        row = self._one(df, 'Rules=[ColumnNamesMatchPattern "col_.*"]')
        assert row["Outcome"] == "Failed"

    def test_zero_matches_fails(self, spark):
        df = spark.createDataFrame(
            [("a", "b")], "`State Name` string, `State Abbreviation` string")
        row = self._one(df, 'Rules=[ColumnNamesMatchPattern "Province.*"]')
        assert row["Outcome"] == "Failed"

    def test_character_class_pattern(self, spark):
        df = spark.createDataFrame(
            [("a", "b", "c")],
            "`Building Code` string, `Building_Code` string, "
            "`Building.Code` string")
        row = self._one(
            df, r'Rules = [ ColumnNamesMatchPattern "Building[\s|_|\.]Code" ]')
        assert row["Outcome"] == "Passed"
        partial = self._one(
            df, r'Rules = [ ColumnNamesMatchPattern "Building\s*Code" ]')
        assert partial["Outcome"] == "Failed"


class TestDataFreshnessParity:
    """dqdl/DataFreshnessSpec.scala:28-150 — freshness over nested
    columns, dotted literal names, empty frames, and the full operator
    surface with duration units."""

    def _one(self, df, ruleset):
        return EvaluateDataQuality.process(df, ruleset).collect()[0]

    def _state_df(self, spark):
        import datetime
        now = datetime.datetime.now()
        rows = [(i + 1, name, abbr,
                 (now - datetime.timedelta(days=d)).isoformat(sep=" "))
                for i, (name, abbr, d) in enumerate([
                    ("California", "CA", 1), ("New York", "NY", 2),
                    ("New Jersey", "NJ", 3), ("Oregon", "OR", 5)])]
        return spark.createDataFrame(
            rows, "ID int, `State Name` string, `State Abbreviation` string, "
                  "`Some Date` string")

    def test_nested_column(self, spark):
        import datetime
        today = datetime.date.today()
        rows = [(i, ((today - datetime.timedelta(days=i)).isoformat(), st))
                for i, st in enumerate(["NY", "WI", "TX", "CA"], 1)]
        df = spark.createDataFrame(
            rows, "id int, state struct<_1: string, _2: string>")
        row = self._one(df, 'Rules=[DataFreshness "state._1" < 200 hours]')
        assert row["Outcome"] == "Passed"

    def test_dotted_literal_column(self, spark):
        import datetime
        today = datetime.date.today()
        df = spark.createDataFrame(
            [("California", "CA",
              (today - datetime.timedelta(days=1)).isoformat())],
            "`State Name` string, `State Abbreviation` string, "
            "`Some.Date` string")
        row = self._one(df, 'Rules=[DataFreshness "`Some.Date`" < 200 hours]')
        assert row["Outcome"] == "Passed"

    def test_empty_dataframe_passes(self, spark):
        df = spark.createDataFrame(
            [], "`State Name` string, `State Abbreviation` string, "
                "`Some Date` string")
        row = self._one(df, 'Rules=[DataFreshness "Some Date" < 200 hours]')
        assert row["Outcome"] == "Passed"

    def test_between_operators(self, spark):
        df = self._state_df(spark)
        assert self._one(df, 'Rules=[DataFreshness "Some Date" '
                             'between 12 hours and 60 hours]'
                         )["Outcome"] == "Failed"
        assert self._one(df, 'Rules=[DataFreshness "Some Date" '
                             'not between 50 hours and 90 hours]'
                         )["Outcome"] == "Failed"

    def test_comparison_operators(self, spark):
        df = self._state_df(spark)
        assert self._one(df, 'Rules=[DataFreshness "Some Date" >= 50 hours]'
                         )["Outcome"] == "Failed"
        assert self._one(df, 'Rules=[DataFreshness "Some Date" > 1 minutes]'
                         )["Outcome"] == "Passed"
        assert self._one(df, 'Rules=[DataFreshness "Some Date" < 10 days]'
                         )["Outcome"] == "Passed"


class TestProcessRowsReferenceContract:
    """EvaluateDataQualityRowLevelSpec.scala:29-180 — the processRows
    result-map contract."""

    def test_three_keys_and_original_unchanged(self, df_full):
        results = EvaluateDataQuality.process_rows(
            df_full, 'Rules=[IsComplete "item"]')
        for key in ("originalData", "ruleOutcomes", "rowLevelOutcomes"):
            assert key in results, key
        assert results["originalData"].collect() == df_full.collect()
        outcomes = results["ruleOutcomes"].collect()
        assert len(outcomes) == 1 and outcomes[0]["Outcome"] == "Passed"

    def test_row_level_schema_and_all_passed(self, df_full):
        rl = EvaluateDataQuality.process_rows(
            df_full, 'Rules=[IsComplete "item"]')["rowLevelOutcomes"]
        for c in ("DataQualityRulesPass", "DataQualityRulesFail",
                  "DataQualityRulesSkip", "DataQualityEvaluationResult"):
            assert c in rl.columns, c
        rows = rl.collect()
        assert len(rows) == 4
        assert all(r["DataQualityEvaluationResult"] == "Passed" for r in rows)
        # original data columns preserved
        for c in df_full.columns:
            assert c in rl.columns

    def test_pass_fail_arrays(self, spark):
        df = spark.createDataFrame([("1", "a"), (None, "b")],
                                   "id string, value string")
        rule = 'IsComplete "id"'
        rl = EvaluateDataQuality.process_rows(
            df, f"Rules=[{rule}]")["rowLevelOutcomes"]
        by_val = {r["value"]: r for r in rl.collect()}
        assert rule in by_val["a"]["DataQualityRulesPass"]
        assert by_val["a"]["DataQualityRulesFail"] == []
        assert by_val["b"]["DataQualityRulesPass"] == []
        assert rule in by_val["b"]["DataQualityRulesFail"]

    def test_mixed_pass_fail_outcomes(self, spark):
        df = spark.createDataFrame(
            [("1", "a"), (None, "b"), ("3", None)],
            "id string, name string")
        rl = EvaluateDataQuality.process_rows(
            df, 'Rules=[IsComplete "id", IsComplete "name"]'
        )["rowLevelOutcomes"]
        got = sorted((r["id"] or "NULL", r["DataQualityEvaluationResult"])
                     for r in rl.collect())
        assert got == [("1", "Passed"), ("3", "Failed"), ("NULL", "Failed")]

    def test_aggregate_rules_in_skip(self, df_full):
        rl = EvaluateDataQuality.process_rows(
            df_full, "Rules=[RowCount > 0]")["rowLevelOutcomes"]
        for r in rl.collect():
            assert r["DataQualityRulesSkip"] != []

    def test_row_count_preserved(self, spark):
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(6)], "item int, att1 double")
        rl = EvaluateDataQuality.process_rows(
            df, 'Rules=[IsComplete "item", IsUnique "item", RowCount > 0]'
        )["rowLevelOutcomes"]
        assert rl.count() == df.count()


class TestCustomSqlRowLevelSpec:
    """Transcribed from /root/reference/src/test/scala/com/amazon/deequ/
    dqdl/CustomSqlRowLevelSpec.scala (line refs per test)."""

    RULESET = ('Rules=[CustomSql "SELECT id, name FROM primary '
               'WHERE name IS NOT NULL"]')

    def _run(self, spark, rows, ruleset):
        df = spark.createDataFrame(rows, "id string, name string")
        return df, EvaluateDataQuality.process_rows(df, ruleset)

    def _row_outcomes(self, res, df):
        rl = res["rowLevelOutcomes"]
        by_id = {r["id"]: r["DataQualityEvaluationResult"]
                 for r in rl.collect()}
        return [by_id[r["id"]] for r in df.orderBy("id").collect()]

    def test_pass_when_all_rows_match(self, spark):
        """:28-44."""
        df, res = self._run(spark, [("1", "Alice"), ("2", "Bob"),
                                    ("3", "Charlie")], self.RULESET)
        assert res["ruleOutcomes"].collect()[0]["Outcome"] == "Passed"
        assert self._row_outcomes(res, df) == ["Passed"] * 3

    def test_fail_when_not_all_rows_match(self, spark):
        """:46-64 — incl. the exact compliance metric key and value."""
        df, res = self._run(spark, [("1", "Alice"), ("2", None),
                                    ("3", "Charlie")], self.RULESET)
        rule_row = res["ruleOutcomes"].collect()[0]
        assert rule_row["Outcome"] == "Failed"
        metrics = rule_row["EvaluatedMetrics"]
        key = next(k for k in metrics if "CustomSQL.Compliance" in k)
        assert abs(metrics[key] - 2.0 / 3.0) < 0.01
        assert self._row_outcomes(res, df) == ["Passed", "Failed", "Passed"]

    def test_threshold_pass(self, spark):
        """:66-83 — with threshold > 0.5 passes at 2/3; per-row outcomes
        stay row-accurate."""
        ruleset = ('Rules=[CustomSql "SELECT id, name FROM primary '
                   'WHERE name IS NOT NULL" with threshold > 0.5]')
        df, res = self._run(spark, [("1", "Alice"), ("2", None),
                                    ("3", "Charlie")], ruleset)
        assert res["ruleOutcomes"].collect()[0]["Outcome"] == "Passed"
        assert self._row_outcomes(res, df) == ["Passed", "Failed", "Passed"]

    def test_threshold_fail(self, spark):
        """:85-102 — with threshold > 0.9 fails at 2/3."""
        ruleset = ('Rules=[CustomSql "SELECT id, name FROM primary '
                   'WHERE name IS NOT NULL" with threshold > 0.9]')
        df, res = self._run(spark, [("1", "Alice"), ("2", None),
                                    ("3", "Charlie")], ruleset)
        assert res["ruleOutcomes"].collect()[0]["Outcome"] == "Failed"
        assert self._row_outcomes(res, df) == ["Passed", "Failed", "Passed"]

    def test_scalar_custom_sql_still_deequ_path(self, spark):
        """:104-114 — a CustomSql WITH a condition stays aggregate."""
        df = spark.createDataFrame([("1", "Alice"), ("2", "Bob")],
                                   "id string, name string")
        out = EvaluateDataQuality.process(
            df, 'Rules=[CustomSql "SELECT COUNT(*) FROM primary" > 0]')
        assert out.collect()[0]["Outcome"] == "Passed"

    def test_invalid_sql_fails_rule_and_rows(self, spark):
        """:116-130."""
        df, res = self._run(
            spark, [("1", "Alice")],
            'Rules=[CustomSql "SELECT nonexistent FROM primary"]')
        assert res["ruleOutcomes"].collect()[0]["Outcome"] == "Failed"
        rl = res["rowLevelOutcomes"].collect()
        assert all(r["DataQualityEvaluationResult"] == "Failed" for r in rl)

    def test_empty_dataframe_fails(self, spark):
        """:152-161."""
        df = spark.createDataFrame([], "id string, name string")
        res = EvaluateDataQuality.process_rows(
            df, 'Rules=[CustomSql "SELECT id, name FROM primary"]')
        assert res["ruleOutcomes"].collect()[0]["Outcome"] == "Failed"


class TestColumnDataTypeThreshold:
    """ColumnDataTypeRule.scala:168-175 — `with threshold` asserts the
    matching ratio instead of requiring every row to cast."""

    def test_threshold_pass_and_fail(self, spark):
        df = spark.createDataFrame(
            [("1",), ("2",), ("x",), ("4",)], "v string")
        out = EvaluateDataQuality.process(
            df, 'Rules=[ColumnDataType "v" = "INTEGER" with threshold > 0.7]')
        assert out.collect()[0]["Outcome"] == "Passed"   # 3/4 = 0.75
        out2 = EvaluateDataQuality.process(
            df, 'Rules=[ColumnDataType "v" = "INTEGER" with threshold > 0.8]')
        assert out2.collect()[0]["Outcome"] == "Failed"
        # without a threshold every row must cast
        out3 = EvaluateDataQuality.process(
            df, 'Rules=[ColumnDataType "v" = "INTEGER"]')
        assert out3.collect()[0]["Outcome"] == "Failed"


class TestColumnValuesKeywordOperands:
    """Glue keyword operands inside ColumnValues in-lists (transcribed
    from ColumnValuesRuleSpec.scala:168-264): NULL / EMPTY /
    WHITESPACES_ONLY with exact predicate semantics."""

    @pytest.fixture(scope="class")
    def df_kw(self, spark):
        rows = [("1", "x"), ("2", ""), ("3", "  "), ("4", None)]
        return spark.createDataFrame(rows, "id string, v string")

    def _row_map(self, df, ruleset):
        rl = EvaluateDataQuality.process_rows(df, ruleset)["rowLevelOutcomes"]
        return {r["id"]: r["DataQualityEvaluationResult"]
                for r in rl.collect()}

    def test_in_null_keyword(self, df_kw):
        """:168-183 — in [NULL] passes exactly the NULL rows."""
        got = self._row_map(df_kw, 'Rules=[ColumnValues "v" in [NULL]]')
        assert got == {"1": "Failed", "2": "Failed", "3": "Failed",
                       "4": "Passed"}

    def test_in_empty_keyword(self, df_kw):
        """:184-199 — in [EMPTY] means v = '' (bare predicate as the
        reference emits it: a NULL row evaluates NULL and follows the
        row-level NULL mapping, it is NOT explicitly failed)."""
        got = self._row_map(df_kw, 'Rules=[ColumnValues "v" in [EMPTY]]')
        assert got["1"] == "Failed" and got["2"] == "Passed"
        assert got["3"] == "Failed"

    def test_in_whitespaces_only_keyword(self, df_kw):
        """:200-216 — whitespace-only but NOT empty."""
        got = self._row_map(
            df_kw, 'Rules=[ColumnValues "v" in [WHITESPACES_ONLY]]')
        assert got["1"] == "Failed" and got["2"] == "Failed"
        assert got["3"] == "Passed"

    def test_plain_in_list_nulls_fail(self, df_kw):
        """ColumnValuesRuleSpec.scala:101-113 — numeric/plain IN emits
        `col IS NOT NULL AND col IN (...)`: NULL rows FAIL explicitly."""
        got = self._row_map(df_kw, 'Rules=[ColumnValues "v" in ["x", ""]]')
        assert got == {"1": "Passed", "2": "Passed", "3": "Failed",
                       "4": "Failed"}

    def test_not_in_null_keyword_nulls_fail(self, df_kw):
        """:217-232 — not in [NULL] == IS NOT NULL."""
        got = self._row_map(df_kw, 'Rules=[ColumnValues "v" not in [NULL]]')
        assert got == {"1": "Passed", "2": "Passed", "3": "Passed",
                       "4": "Failed"}

    def test_not_in_empty_keyword(self, df_kw):
        """:233-248 — not in [EMPTY]: NULLs pass (not listed)."""
        got = self._row_map(df_kw, 'Rules=[ColumnValues "v" not in [EMPTY]]')
        assert got == {"1": "Passed", "2": "Failed", "3": "Passed",
                       "4": "Passed"}

    def test_not_in_whitespaces_only(self, df_kw):
        """:249-264."""
        got = self._row_map(
            df_kw, 'Rules=[ColumnValues "v" not in [WHITESPACES_ONLY]]')
        assert got == {"1": "Passed", "2": "Passed", "3": "Failed",
                       "4": "Passed"}

    def test_mixed_keywords_and_literals(self, df_kw):
        """in ["x", EMPTY, NULL] — literals + keywords compose as OR."""
        got = self._row_map(
            df_kw, 'Rules=[ColumnValues "v" in ["x", EMPTY, NULL]]')
        assert got == {"1": "Passed", "2": "Passed", "3": "Failed",
                       "4": "Passed"}


class TestNestedCompositeRules:
    """Transcribed from EvaluateDataQualitySpec.scala:1602-1683 —
    arbitrarily nested and/or composites. Fixture:
    FixtureSupport getDfWithNumericValues (4 columns)."""

    @pytest.fixture(scope="class")
    def df_numeric_values(self, spark):
        rows = [("1", 1, 0, 0), ("2", 2, 0, 0), ("3", 3, 0, 0),
                ("4", 4, 5, 4), ("5", 5, 6, 6), ("6", 6, 7, 7)]
        return spark.createDataFrame(
            rows, "item string, att1 int, att2 int, att3 int")

    def _outcome(self, df, ruleset):
        row = EvaluateDataQuality.process(df, ruleset).collect()[0]
        return row["Outcome"], row

    def test_nested_or_of_and(self, df_numeric_values):
        """:1625-1634."""
        out, _ = self._outcome(
            df_numeric_values,
            'Rules=[(RowCount > 0) or '
            '((IsComplete "att2") and (IsUnique "att2"))]')
        assert out == "Passed"

    def test_complex_nested(self, df_numeric_values):
        """:1673-1683."""
        out, _ = self._outcome(
            df_numeric_values,
            'Rules=[((RowCount > 0) and (ColumnCount = 4)) or '
            '((Mean "att2" > 0) and (Sum "att3" > 0))]')
        assert out == "Passed"

    def test_nested_all_branches_fail(self, df_numeric_values):
        out, _ = self._outcome(
            df_numeric_values,
            'Rules=[((RowCount < 0) and (ColumnCount = 4)) or '
            '((Mean "att2" > 100) and (Sum "att3" > 0))]')
        assert out == "Failed"

    def test_and_failure_has_reason_and_metrics(self, df_numeric_values):
        """:1636-1671 — failed composite carries a FailureReason; metrics
        collected from ALL nested rules."""
        out, row = self._outcome(
            df_numeric_values,
            'Rules=[(Mean "att2" > 100) and (Sum "att3" > 100)]')
        assert out == "Failed"
        assert row["FailureReason"]
        out2, row2 = self._outcome(
            df_numeric_values,
            'Rules=[(Mean "att2" > 0) and (Sum "att3" > 0)]')
        assert out2 == "Passed"
        metrics = row2["EvaluatedMetrics"]
        assert any("Mean" in k and "att2" in k for k in metrics)
        assert any("Sum" in k and "att3" in k for k in metrics)


class TestEvaluatedMetricsVocabulary:
    """EvaluatedMetrics keys use the reference's DQDL metric vocabulary
    (DeequMetricMapping entries in dqdl/translation/rules/*.scala and
    EvaluateDataQualitySpec expectations like 'Column.att2.Mean')."""

    @pytest.fixture(scope="class")
    def df_vocab(self, spark):
        rows = [("1", 1, 0), ("2", 2, 5), ("3", 3, 6)]
        return spark.createDataFrame(rows, "item string, att1 int, att2 int")

    def _metrics(self, df, ruleset):
        return EvaluateDataQuality.process(df, ruleset).collect()[0][
            "EvaluatedMetrics"]

    def test_mean_and_sum_keys(self, df_vocab):
        m = self._metrics(df_vocab,
                          'Rules=[(Mean "att1" > 0) and (Sum "att2" > 0)]')
        assert m["Column.att1.Mean"] == 2.0
        assert m["Column.att2.Sum"] == 11.0

    def test_size_maps_to_rowcount(self, df_vocab):
        assert self._metrics(df_vocab, "Rules=[RowCount > 0]") == \
            {"Dataset.*.RowCount": 3.0}

    def test_length_keys(self, df_vocab):
        m = self._metrics(
            df_vocab, 'Rules=[ColumnLength "item" between 0 and 5]')
        assert "Column.item.LengthCompliance" in m

    def test_column_values_compliance_key(self, df_vocab):
        m = self._metrics(df_vocab, 'Rules=[ColumnValues "att1" > 0]')
        assert "Column.att1.ColumnValues.Compliance" in m
        assert m["Column.att1.ColumnValues.Compliance"] == 1.0

    def test_correlation_key(self, df_vocab):
        m = self._metrics(
            df_vocab,
            'Rules=[ColumnCorrelation "att1" "att2" between -1.1 and 1.1]')
        assert any(k.endswith(".ColumnCorrelation") for k in m)


class TestColumnNamesMatchPatternEdgeCases:
    """EvaluateDataQualitySpec.scala:1574-1601 + the executor semantics
    (ColumnNamesMatchPatternExecutor.scala:32-46)."""

    def test_invalid_regex_raises(self, spark):
        """:1574-1586 — an invalid pattern raises OUT of process with the
        exact message, never a failure row."""
        df = spark.createDataFrame([("a", "b")],
                                   ["col_one", "col_two"])
        with pytest.raises(ValueError, match="Invalid regex pattern"):
            EvaluateDataQuality.process(
                df, 'Rules = [ ColumnNamesMatchPattern "[invalid(" ]')

    def test_empty_dataframe_passes_with_nan(self, spark):
        """:1587-1601 — zero columns: Passed with a NaN ratio metric."""
        import math
        from pyspark.sql import types as T
        df = spark.createDataFrame([], T.StructType([]))
        row = EvaluateDataQuality.process(
            df, 'Rules=[ColumnNamesMatchPattern "col_.*"]').collect()[0]
        assert row["Outcome"] == "Passed"
        assert math.isnan(
            row["EvaluatedMetrics"]["Dataset.*.ColumnNamesPatternMatchRatio"])

    def test_search_not_fullmatch(self, spark):
        """Executor uses findAllMatchIn (SEARCH semantics): a pattern
        matching a SUBSTRING of every name passes."""
        df = spark.createDataFrame([("a", "b")],
                                   ["prefix_col_one", "col_two_suffix"])
        row = EvaluateDataQuality.process(
            df, 'Rules=[ColumnNamesMatchPattern "col_"]').collect()[0]
        assert row["Outcome"] == "Passed"

    def test_missing_reference_failure_reason(self, spark):
        """:1064-1076 — RowCountMatch against an unknown alias fails with
        'not found in additional data sources'."""
        df = spark.createDataFrame([("1", "a")], "id string, value string")
        row = EvaluateDataQuality.process(
            df, 'Rules=[RowCountMatch "missing" >= 0.5]').collect()[0]
        assert row["Outcome"] == "Failed"
        assert "not found in additional data sources" in row["FailureReason"]


class TestRowLevelComposites:
    """Transcribed from EvaluateDataQualityRowLevelSpec.scala:275-345 —
    composite rules evaluate PER ROW following their and/or structure."""

    def _outcomes(self, spark, rows, schema, ruleset):
        df = spark.createDataFrame(rows, schema)
        rl = EvaluateDataQuality.process_rows(df, ruleset)["rowLevelOutcomes"]
        return [r["DataQualityEvaluationResult"] for r in rl.collect()]

    def test_or_composite(self, spark):
        """:275-292."""
        got = self._outcomes(
            spark, [("1", "a"), (None, "b"), ("3", None), (None, None)],
            "id string, name string",
            'Rules=[(IsComplete "id") or (IsComplete "name")]')
        assert got == ["Passed", "Passed", "Passed", "Failed"]

    def test_and_composite(self, spark):
        """:294-311."""
        got = self._outcomes(
            spark, [("1", "a"), (None, "b"), ("3", None), (None, None)],
            "id string, name string",
            'Rules=[(IsComplete "id") and (IsComplete "name")]')
        assert got == ["Passed", "Failed", "Failed", "Failed"]

    def test_nested_composite(self, spark):
        """:313-329."""
        got = self._outcomes(
            spark, [("1", "a", "x"), (None, "b", "y"), (None, None, "z")],
            "id string, name string, code string",
            'Rules=[(IsComplete "id") or '
            '((IsComplete "name") and (IsComplete "code"))]')
        assert got == ["Passed", "Passed", "Failed"]

    def test_multiple_independent_composites(self, spark):
        """:331-345 — overall row outcome fails if ANY rule fails."""
        got = self._outcomes(
            spark, [("1", "a"), (None, "b")], "id string, name string",
            'Rules=[(IsComplete "id") or (IsComplete "name"), '
            '(IsComplete "id") and (IsComplete "name")]')
        assert got == ["Passed", "Failed"]

    def test_null_values_in_composite(self, spark):
        """:446-465 shape — OR rescues rows failing one member."""
        got = self._outcomes(
            spark, [("a", None), (None, "b"), (None, None)],
            "x string, y string",
            'Rules=[(IsComplete "x") or (IsComplete "y")]')
        assert got == ["Passed", "Passed", "Failed"]


class TestRowLevelSpecEdges:
    """EvaluateDataQualityRowLevelSpec.scala remaining edges."""

    def test_data_freshness_is_skip(self, spark):
        """:467-486 — DataFreshness has no row-level support: every row
        lists it under DataQualityRulesSkip."""
        import datetime
        today = datetime.date.today()
        df = spark.createDataFrame(
            [("1", str(today - datetime.timedelta(days=1))),
             ("2", str(today - datetime.timedelta(days=5))),
             ("3", str(today))], "id string, date string")
        rl = EvaluateDataQuality.process_rows(
            df, 'Rules=[DataFreshness "date" <= 3 days]')["rowLevelOutcomes"]
        for r in rl.collect():
            assert 'DataFreshness "date" <= 3 days' in r["DataQualityRulesSkip"]

    def test_is_complete_with_where(self, spark):
        """:488-505 — out-of-scope rows pass (FilteredRowOutcome TRUE)."""
        df = spark.createDataFrame(
            [("1", "a", "active"), (None, "b", "active"),
             ("3", "c", "inactive"), (None, "d", "inactive")],
            "id string, name string, status string")
        rl = EvaluateDataQuality.process_rows(
            df, "Rules=[IsComplete \"id\" where \"status = 'active'\"]"
        )["rowLevelOutcomes"]
        got = [r["DataQualityEvaluationResult"] for r in rl.collect()]
        assert got == ["Passed", "Failed", "Passed", "Passed"]

    def test_referential_integrity_row_level(self, spark):
        """:507-530 — RI rule passes at 2/3 >= 0.6 and preserves row
        count in the row-level frame."""
        prim = spark.createDataFrame(
            [("CA", "California"), ("TX", "Texas"), ("ZZ", "Invalid")],
            "code string, name string")
        ref = spark.createDataFrame([("CA",), ("NY",), ("TX",)],
                                    "state_code string")
        res = EvaluateDataQuality.process_rows(
            prim, 'Rules=[ReferentialIntegrity "code" "ref.state_code" >= 0.6]',
            additional_datasets={"ref": ref})
        assert res["ruleOutcomes"].collect()[0]["Outcome"] == "Passed"
        assert res["rowLevelOutcomes"].count() == 3


class TestColumnLengthRuleSpecParity:
    """Transcribed from dqdl/translation/rules/ColumnLengthRuleSpec.scala
    (behavioral form: each operator shape evaluated over a fixture whose
    expected outcome is hand-derived; line refs per test)."""

    @pytest.fixture(scope="class")
    def df_len(self, spark):
        # lengths: 1, 3, 5, 7
        return spark.createDataFrame(
            [("a", "x"), ("abc", "x"), ("abcde", "y"), ("abcdefg", "y")],
            "`Col A` string, grp string")

    def _outcome(self, df, ruleset):
        row = EvaluateDataQuality.process(df, ruleset).collect()[0]
        return row["Outcome"]

    def test_greater_than(self, df_len):
        """:30-46."""
        assert self._outcome(df_len,
                             'Rules=[ColumnLength "Col A" > 0]') == "Passed"
        assert self._outcome(df_len,
                             'Rules=[ColumnLength "Col A" > 3]') == "Failed"

    def test_less_than(self, df_len):
        """:48-62."""
        assert self._outcome(df_len,
                             'Rules=[ColumnLength "Col A" < 8]') == "Passed"
        assert self._outcome(df_len,
                             'Rules=[ColumnLength "Col A" < 7]') == "Failed"

    def test_between_bounds_exclusive(self, df_len):
        """:64-79 — Glue between is EXCLUSIVE both ends."""
        assert self._outcome(
            df_len, 'Rules=[ColumnLength "Col A" between 0 and 8]') == \
            "Passed"
        assert self._outcome(
            df_len, 'Rules=[ColumnLength "Col A" between 1 and 8]') == \
            "Failed"

    def test_equals_constant_length(self, spark):
        """:81-96."""
        df = spark.createDataFrame([("ab", 1), ("cd", 2)],
                                   "`Col A` string, n int")
        assert self._outcome(df, 'Rules=[ColumnLength "Col A" = 2]') == \
            "Passed"
        assert self._outcome(df, 'Rules=[ColumnLength "Col A" = 3]') == \
            "Failed"

    def test_quoted_column_name(self, df_len):
        """:98-110 — space-bearing column names survive quoting."""
        assert self._outcome(df_len,
                             'Rules=[ColumnLength "Col A" >= 1]') == "Passed"

    def test_where_clause(self, df_len):
        """:112-144 — GREATER_THAN and BETWEEN with where clauses."""
        assert self._outcome(
            df_len,
            'Rules=[ColumnLength "Col A" > 4 where "grp = \'y\'"]') == \
            "Passed"
        assert self._outcome(
            df_len,
            'Rules=[ColumnLength "Col A" between 2 and 8 '
            'where "grp = \'y\'"]') == "Passed"
        assert self._outcome(
            df_len,
            'Rules=[ColumnLength "Col A" > 4 where "grp = \'x\'"]') == \
            "Failed"

    def test_in_and_not_in(self, df_len):
        """:146-176 — IN / NOT_IN over length sets."""
        assert self._outcome(
            df_len, 'Rules=[ColumnLength "Col A" in [1, 3, 5, 7]]') == \
            "Passed"
        assert self._outcome(
            df_len, 'Rules=[ColumnLength "Col A" in [1, 3]]') == "Failed"
        assert self._outcome(
            df_len, 'Rules=[ColumnLength "Col A" not in [2, 4, 6]]') == \
            "Passed"
        assert self._outcome(
            df_len, 'Rules=[ColumnLength "Col A" not in [1]]') == "Failed"


class TestDQDLTranslatorExecutorParserSpecs:
    """Transcriptions of the three small DQDL infrastructure spec files:
    DQDLRuleTranslatorSpec.scala, DQDLExecutorSpec.scala,
    DefaultDQDLParserTest.scala (line refs per test). Our surface is
    EvaluateDataQuality.process — the translator/executor assertions are
    observed through rule outcomes and EvaluatedMetrics keys."""

    @pytest.fixture(scope="class")
    def df_full4(self, spark):
        return spark.createDataFrame(
            [("1", "a", "c"), ("2", "a", "c"), ("3", "a", "c"),
             ("4", "b", "d")], "item string, att1 string, att2 string")

    def test_row_count_metric_name(self, df_full4):
        """DQDLRuleTranslatorSpec.scala:44-56 — RowCount evaluates under
        the Glue metric key Dataset.*.RowCount."""
        out = EvaluateDataQuality.process(df_full4, "Rules=[RowCount > 10]")
        (row,) = out.collect()
        assert row["EvaluatedMetrics"] == {"Dataset.*.RowCount": 4.0}

    def test_column_count_metric_name(self, df_full4):
        """:37-42 + :58-63 — ColumnCount = 3 under Dataset.*.ColumnCount."""
        out = EvaluateDataQuality.process(df_full4, "Rules=[ColumnCount = 3]")
        (row,) = out.collect()
        assert row["Outcome"] == "Passed"
        assert row["EvaluatedMetrics"] == {"Dataset.*.ColumnCount": 3.0}

    def test_scalar_custom_sql_metric_name(self, df_full4):
        """:79-85 — scalar CustomSql keys Dataset.*.CustomSQL."""
        out = EvaluateDataQuality.process(
            df_full4, 'Rules=[CustomSql "select count(*) from primary" > 0]')
        (row,) = out.collect()
        assert row["Outcome"] == "Passed"
        assert set(row["EvaluatedMetrics"]) == {"Dataset.*.CustomSQL"}

    def test_row_level_custom_sql_metric_name(self, df_full4):
        """:87-93 + CustomSqlRowLevelSpec.scala:58 — condition-less
        CustomSql routes to the row-level executor and keys
        Dataset.*.CustomSQL.Compliance."""
        out = EvaluateDataQuality.process(
            df_full4,
            'Rules=[CustomSql "select item from primary where att1 = \'a\'"]')
        (row,) = out.collect()
        assert set(row["EvaluatedMetrics"]) == \
            {"Dataset.*.CustomSQL.Compliance"}
        assert row["EvaluatedMetrics"]["Dataset.*.CustomSQL.Compliance"] \
            == 0.75

    def test_executor_multiple_row_count_rules(self, df_full4):
        """DQDLExecutorSpec.scala:33-66 — two RowCount rules, different
        outcomes, each carrying the 4.0 metric."""
        out = EvaluateDataQuality.process(
            df_full4, "Rules=[RowCount < 10, RowCount < 3]")
        rows = {r["Rule"]: r for r in out.collect()}
        passing = rows["RowCount < 10"]
        assert passing["Outcome"] == "Passed"
        assert passing["EvaluatedMetrics"] == {"Dataset.*.RowCount": 4.0}
        failing = rows["RowCount < 3"]
        assert failing["Outcome"] == "Failed"
        assert failing["EvaluatedMetrics"] == {"Dataset.*.RowCount": 4.0}

    def test_parser_valid_rules(self):
        """DefaultDQDLParserTest.scala:33-48 — two rules with exact
        toString renderings."""
        rs = parse("Rules = [ RowCount > 1, ColumnCount = 3]")
        assert len(rs.rules) == 2
        by_type = {r.rule_type: r for r in rs.rules}
        assert by_type["RowCount"].describe() == "RowCount > 1"
        assert by_type["ColumnCount"].describe() == "ColumnCount = 3"

    def test_parser_invalid_raises_parsing_error(self):
        """:50-56 — invalid DQDL raises with 'Parsing Error' in the
        message."""
        with pytest.raises(DQDLParseError, match="Parsing Error"):
            parse("invalid")
