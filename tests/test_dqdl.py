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
        out = EvaluateDataQuality.process(df_full, 'Rules = [RowCount = 4]')
        row = out.collect()[0]
        assert row["EvaluatedMetrics"] == {"Size(*)": 4.0}
