"""DQDL — declarative Data Quality Definition Language (subset).

Reference parity: /root/reference/src/main/scala/com/amazon/deequ/dqdl/
(4275 LoC). The reference delegates parsing to an external Java ANTLR
parser (util/DefaultDQDLParser.scala:49-60) and translates rules via
DQDLRuleTranslator.scala:69-160; this is an independent recursive-descent
implementation of the same language surface:

    Rules = [ RowCount > 10, IsComplete "col",
              Completeness "col" >= 0.95,
              ColumnValues "col" between 1 and 100 where "other > 0",
              ColumnLength "col" < 32,
              CustomSql "select count(*) from primary" = 5,
              (IsComplete "a") and (IsUnique "a") ]

Supported rule types — the reference's full 25-entry converter map
(DQDLRuleTranslator.scala:69-94): RowCount, ColumnCount, ColumnExists,
IsComplete, Completeness, IsUnique, IsPrimaryKey, Uniqueness,
UniqueValueRatio, DistinctValuesCount, Entropy, Mean, Sum,
StandardDeviation, Variance, Skewness, Kurtosis, ZerosCount, Range,
InterquartileRange, ColumnCorrelation, DuplicateRowCount, ColumnValues,
ColumnLength, CustomSql — plus the specially-handled types
(:109-160): ColumnDataType, ColumnNamesMatchPattern, DataFreshness,
composite ``and``/``or``, row-level CustomSql (no condition → the SQL
selects the passing rows), and the dataset-level rules RowCountMatch,
SchemaMatch, ReferentialIntegrity, DatasetMatch, AggregateMatch
(resolved against ``additional_datasets`` aliases).
Conditions: ``> >= < <= = !=``, ``between a and b``, ``in [..]``,
``not in [..]``, ``matches "regex"``; optional ``where "<sql>"``.

Execution batches every rule into ONE VerificationSuite run, so all
aggregate rules share a single fused scan (parity:
DQDLExecutor.scala:28-60).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from .checks import Check, CheckLevel, CheckStatus


class DQDLParseError(ValueError):
    pass


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"""
    \s*(?:
      (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<number>-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)
    | (?P<op><=|>=|!=|=|<|>)
    | (?P<punct>[\[\](),+-])
    | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""", re.VERBOSE)


def _tokenize(text: str) -> List[Tuple[str, str]]:
    tokens, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise DQDLParseError(f"Unexpected character at {pos}: "
                                 f"{text[pos:pos + 20]!r}")
        pos = m.end()
        for kind in ("string", "number", "op", "punct", "word"):
            val = m.group(kind)
            if val is not None:
                tokens.append((kind, val))
                break
    return tokens


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class KeywordOperand:
    """Glue DQDL special keyword inside an in-list: EMPTY (empty string)
    or WHITESPACES_ONLY (parity: KeywordStringOperand,
    ColumnValuesRuleSpec.scala:184-264). NULL is modeled as plain None."""
    name: str  # "EMPTY" | "WHITESPACES_ONLY"


@dataclass(frozen=True)
class NowExpr:
    """Dynamic `now()` operand, optionally offset: `(now() - 3 days)`
    (Glue DQDL date expressions, EvaluateDataQualitySpec.scala:1993-2005).
    Rendered lazily as SQL so `now` is evaluation time, not parse time."""
    sign: str = ""            # "", "-" or "+"
    amount: float = 0.0
    unit: str = "days"        # days / hours / minutes

    def sql(self) -> str:
        if not self.sign:
            return "current_timestamp()"
        return (f"(current_timestamp() {self.sign} "
                f"INTERVAL {self.amount:g} {self.unit.upper()})")


@dataclass
class Condition:
    """One of: cmp(op, value) / between(lo, hi) / in_set(values, negated) /
    matches(regex)."""
    kind: str
    op: Optional[str] = None
    value: Any = None
    low: Optional[float] = None
    high: Optional[float] = None
    values: Optional[List[Any]] = None
    negated: bool = False
    unit: Optional[str] = None         # days/hours/minutes (DataFreshness)
    low_unit: Optional[str] = None     # per-operand duration units
    high_unit: Optional[str] = None

    def assertion(self) -> Callable[[float], bool]:
        """Metric-level assertion for aggregate rules.

        ``between`` is EXCLUSIVE on both ends — Glue DQDL semantics pinned
        by the reference's own spec corpus (EvaluateDataQualitySpec.scala:
        "ColumnCount between 4 and 5" is Failed at count 4, "between 3.9
        and 6" Passed); ``not between`` is its complement."""
        if self.kind == "cmp":
            v = float(self.value)
            return {
                ">": lambda x: x > v, ">=": lambda x: x >= v,
                "<": lambda x: x < v, "<=": lambda x: x <= v,
                "=": lambda x: x == v, "!=": lambda x: x != v,
            }[self.op]
        if self.kind == "between":
            lo, hi = self.low, self.high
            if self.negated:
                return lambda x: not (lo < x < hi)
            return lambda x: lo < x < hi
        if self.kind == "in":
            vals = {float(v) for v in self.values}
            if self.negated:
                return lambda x: x not in vals
            return lambda x: x in vals
        raise DQDLParseError(f"condition {self.kind} not valid here")

    def sql_predicate(self, expr: str) -> str:
        """Row-level SQL predicate for ColumnValues / ColumnLength."""
        def lit(v):
            if v is None:
                return "NULL"
            if isinstance(v, NowExpr):
                return v.sql()
            if isinstance(v, str):
                return "'" + v.replace("'", "''") + "'"
            return f"{v:g}" if isinstance(v, float) else repr(v)
        if self.kind == "cmp":
            if self.value is None:
                # "= NULL" / "!= NULL" (NullNumericOperand,
                # ColumnValuesRuleSpec.scala:320-340)
                return (f"{expr} IS NULL" if self.op == "="
                        else f"{expr} IS NOT NULL")
            if self.op == "!=":
                # NULLs PASS a not-equals rule (ColumnValuesRuleSpec.scala:
                # 284-298 "status IS NULL OR status != 0.0")
                return f"({expr} IS NULL OR {expr} <> {lit(self.value)})"
            return f"{expr} {self.op} {lit(self.value)}"
        if self.kind == "between":
            if self.negated:
                # NULLs FAIL not-between (ColumnValuesRuleSpec.scala:300-318
                # "value IS NOT NULL AND (value <= 10.0 OR value >= 20.0)")
                return (f"({expr} IS NOT NULL AND ({expr} <= {lit(self.low)}"
                        f" OR {expr} >= {lit(self.high)}))")
            # EXCLUSIVE bounds (ColumnValuesRuleSpec.scala:88-99 "BETWEEN
            # numeric rule with exclusive bounds"); NULL comparisons are
            # NULL → the row fails, matching the reference's paired
            # isComplete constraint
            return f"({expr} > {lit(self.low)} AND {expr} < {lit(self.high)})"
        if self.kind == "in":
            # exact mirror of the reference's constructComplianceCondition
            # (ColumnValuesRule.scala:237-270) + the numeric IN/NOT_IN
            # null-handling grid (:147-163): positive terms OR-join,
            # negated terms AND-join; listed values only match non-NULL
            # rows explicitly
            plain = [v for v in self.values
                     if v is not None and not isinstance(v, KeywordOperand)]
            has_null = any(v is None for v in self.values)
            keywords = {v.name for v in self.values
                        if isinstance(v, KeywordOperand)}
            items = ", ".join(lit(v) for v in plain)
            conds = []
            if self.negated:
                if has_null:
                    conds.append(f"{expr} IS NOT NULL")
                if "EMPTY" in keywords:
                    conds.append(f"{expr} != ''")
                if "WHITESPACES_ONLY" in keywords:
                    conds.append(f"(LENGTH(TRIM({expr})) > 0"
                                 f" OR LENGTH({expr}) = 0)")
                if plain:
                    conds.append(f"({expr} IS NULL"
                                 f" OR {expr} NOT IN ({items}))")
                return ("(" + " AND ".join(conds) + ")") if conds else "TRUE"
            if has_null:
                conds.append(f"{expr} IS NULL")
            if "EMPTY" in keywords:
                conds.append(f"{expr} = ''")
            if "WHITESPACES_ONLY" in keywords:
                conds.append(f"(LENGTH(TRIM({expr})) = 0"
                             f" AND LENGTH({expr}) > 0)")
            if plain:
                conds.append(f"({expr} IS NOT NULL"
                             f" AND {expr} IN ({items}))")
            if not conds:
                return "FALSE"
            return conds[0] if len(conds) == 1 else "(" + " OR ".join(conds) + ")"
        if self.kind == "matches":
            pattern = str(self.value).replace("'", "''")
            return f"{expr} RLIKE '{pattern}'"
        raise DQDLParseError(f"condition {self.kind} not valid here")

    def describe(self) -> str:
        def fmt(v):
            if isinstance(v, KeywordOperand):
                return v.name
            if isinstance(v, float):
                return f"{v:g}"
            if isinstance(v, str):
                return f'"{v}"'
            return str(v)
        if self.kind == "cmp":
            base = f"{self.op} {fmt(self.value)}"
            return f"{base} {self.unit}" if self.unit else base
        if self.kind == "between":
            neg = "not " if self.negated else ""
            return f"{neg}between {fmt(self.low)} and {fmt(self.high)}"
        if self.kind == "in":
            body = "[" + ", ".join(fmt(v) for v in self.values) + "]"
            return ("not in " if self.negated else "in ") + body
        if self.kind == "matches":
            return f"matches \"{self.value}\""
        return self.kind


@dataclass
class DQRule:
    rule_type: str
    parameters: List[str] = field(default_factory=list)
    condition: Optional[Condition] = None
    where: Optional[str] = None
    # Glue `with threshold <cond>` (rule.getThresholdCondition in the
    # reference's DQDL model) — asserts on the passing-row RATIO for
    # row-level rules instead of requiring all rows to pass
    threshold_condition: Optional[Condition] = None
    # Glue `with <tag> = "<value>"` tags (rule.getTags), e.g.
    # ColumnDataType ... with format = "dd-MM-yyyy"
    tags: Dict[str, str] = field(default_factory=dict)

    def describe(self) -> str:
        parts = [self.rule_type] + [f'"{p}"' for p in self.parameters]
        if self.condition:
            parts.append(self.condition.describe())
        if self.where:
            parts.append(f'where "{self.where}"')
        if self.threshold_condition:
            parts.append(f"with threshold "
                         f"{self.threshold_condition.describe()}")
        for tag, value in self.tags.items():
            parts.append(f'with {tag} = "{value}"')
        return " ".join(parts)


@dataclass
class DQCompositeRule:
    operator: str                     # "and" | "or"
    rules: List["DQRule"]

    def describe(self) -> str:
        op = f" {self.operator} "
        return op.join(f"({r.describe()})" for r in self.rules)


@dataclass
class DQRuleset:
    rules: List[Any]                  # DQRule | DQCompositeRule


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

class _Parser:
    def __init__(self, tokens: List[Tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self, offset: int = 0) -> Optional[Tuple[str, str]]:
        j = self.i + offset
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> Tuple[str, str]:
        if self.i >= len(self.toks):
            raise DQDLParseError("Unexpected end of input")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, value: str) -> None:
        kind, val = self.next()
        if val.lower() != value.lower():
            raise DQDLParseError(f"Expected {value!r}, got {val!r}")

    def _string(self) -> str:
        kind, val = self.next()
        if kind != "string":
            raise DQDLParseError(f"Expected quoted string, got {val!r}")
        return val[1:-1].replace('\\"', '"').strip()

    def _number(self) -> float:
        kind, val = self.next()
        if kind != "number":
            raise DQDLParseError(f"Expected number, got {val!r}")
        return float(val)

    def _value(self) -> Any:
        kind, val = self.next()
        if kind == "string":
            return val[1:-1].replace('\\"', '"')
        if kind == "number":
            return float(val)
        if kind == "word" and val.upper() == "NULL":
            return None
        if kind == "word" and val.upper() in ("EMPTY", "WHITESPACES_ONLY"):
            return KeywordOperand(val.upper())
        raise DQDLParseError(f"Expected literal, got {val!r}")

    def _operand(self) -> Any:
        """A condition operand: literal, or a dynamic date expression —
        `now()` / `(now() - 3 days)` (Glue DQDL date operands)."""
        nxt = self.peek()
        if nxt and nxt[1] == "(":
            self.next()
            expr = self._now_expr()
            kind, val = self.next()
            if val != ")":
                raise DQDLParseError(f"Expected ')', got {val!r}")
            return expr
        if nxt and nxt[0] == "word" and nxt[1].lower() == "now":
            return self._now_expr()
        return self._value()

    def _maybe_unit(self) -> Optional[str]:
        """Consume a trailing duration word (days/hours/minutes) if present
        — DQDL duration operands like `between 12 hours and 60 hours`."""
        nxt = self.peek()
        if nxt and nxt[0] == "word":
            unit = nxt[1].lower().rstrip("s") + "s"
            if unit in ("days", "hours", "minutes"):
                self.next()
                return unit
        return None

    def _now_expr(self) -> NowExpr:
        kind, val = self.next()
        if kind != "word" or val.lower() != "now":
            raise DQDLParseError(f"Expected now(), got {val!r}")
        if self.next()[1] != "(" or self.next()[1] != ")":
            raise DQDLParseError("Expected now()")
        nxt = self.peek()
        if nxt and nxt[1] in ("-", "+"):
            sign = self.next()[1]
            amount = self._number()
            kind, unit = self.next()
            unit_l = unit.lower().rstrip("s") + "s"
            if kind != "word" or unit_l not in ("days", "hours", "minutes"):
                raise DQDLParseError(f"Expected days/hours/minutes, got {unit!r}")
            return NowExpr(sign, amount, unit_l)
        return NowExpr()

    def parse_ruleset(self) -> DQRuleset:
        self.expect("Rules")
        self.expect("=")
        self.expect("[")
        rules = [self.parse_rule()]
        while self.peek() and self.peek()[1] == ",":
            self.next()
            rules.append(self.parse_rule())
        self.expect("]")
        return DQRuleset(rules)

    def parse_rule(self):
        # composite: (Rule) and (Rule) ... — ARBITRARILY NESTED, e.g.
        # ((A) and (B)) or ((C) and (D))
        # (EvaluateDataQualitySpec.scala:1625-1683 nested composite rules)
        if self.peek() and self.peek()[1] == "(":
            return self._parse_composite_chain()
        return self.parse_simple_rule()

    def _parse_composite_chain(self, depth: int = 0):
        members, operator = [self._parse_term(depth)], None
        while True:
            nxt = self.peek()
            if nxt and nxt[0] == "word" and nxt[1].lower() in ("and", "or"):
                op = self.next()[1].lower()
                if operator and op != operator:
                    raise DQDLParseError("mixed and/or without parens")
                operator = op
                members.append(self._parse_term(depth))
                continue
            break
        if len(members) == 1:
            return members[0]
        return DQCompositeRule(operator or "and", members)

    MAX_COMPOSITE_DEPTH = 50   # stack-safety cap for hostile inputs

    def _parse_term(self, depth: int = 0):
        if depth > self.MAX_COMPOSITE_DEPTH:
            raise DQDLParseError(
                f"composite nesting deeper than {self.MAX_COMPOSITE_DEPTH}")
        self.expect("(")
        if self.peek() and self.peek()[1] == "(":
            node = self._parse_composite_chain(depth + 1)
        else:
            node = self.parse_simple_rule()
        self.expect(")")
        return node

    def parse_simple_rule(self) -> DQRule:
        kind, rtype = self.next()
        if kind != "word":
            raise DQDLParseError(f"Expected rule type, got {rtype!r}")
        rule = DQRule(rtype)
        # parameters: one or more quoted strings
        while self.peek() and self.peek()[0] == "string":
            rule.parameters.append(self._string())
        rule.condition = self.parse_condition()
        # optional trailing clauses in any order: where "...", with
        # threshold <cond> (CustomSqlRowLevelRule.scala:30-34,
        # ColumnDataTypeRule.scala:168-171)
        while True:
            nxt = self.peek()
            if nxt and nxt[0] == "word" and nxt[1].lower() == "where":
                self.next()
                rule.where = self._string()
                continue
            if nxt and nxt[0] == "word" and nxt[1].lower() == "with":
                self.next()
                kind, name = self.next() or (None, None)
                if kind != "word":
                    raise DQDLParseError(
                        f"Expected a tag name after 'with', got {name!r}")
                if name.lower() == "threshold":
                    rule.threshold_condition = self.parse_condition()
                    if rule.threshold_condition is None:
                        raise DQDLParseError(
                            "Expected a condition after 'with threshold'")
                else:
                    # generic Glue tag: with <name> = "<value>"
                    eq = self.next()
                    if eq is None or eq[1] != "=":
                        raise DQDLParseError(
                            f"Expected '=' after tag {name!r}")
                    rule.tags[name] = self._string()
                continue
            break
        return rule

    def parse_condition(self) -> Optional[Condition]:
        nxt = self.peek()
        if nxt is None:
            return None
        kind, val = nxt
        if kind == "op":
            self.next()
            cond = Condition("cmp", op=val, value=self._operand())
            nxt2 = self.peek()
            if nxt2 and nxt2[0] == "word" and nxt2[1].lower() in (
                    "days", "day", "hours", "hour", "minutes", "minute"):
                cond.unit = self.next()[1].lower().rstrip("s") + "s"
            return cond
        if kind == "word" and val.lower() == "between":
            self.next()
            lo = self._operand()
            lo_unit = self._maybe_unit()
            self.expect("and")
            hi = self._operand()
            hi_unit = self._maybe_unit()
            return Condition("between", low=lo, high=hi,
                             unit=lo_unit or hi_unit,
                             low_unit=lo_unit, high_unit=hi_unit)
        if kind == "word" and val.lower() == "in":
            self.next()
            return Condition("in", values=self._bracket_list())
        if kind == "word" and val.lower() == "not":
            self.next()
            nxt2 = self.peek()
            if nxt2 and nxt2[0] == "word" and nxt2[1].lower() == "between":
                self.next()
                lo = self._operand()
                lo_unit = self._maybe_unit()
                self.expect("and")
                hi = self._operand()
                hi_unit = self._maybe_unit()
                return Condition("between", low=lo, high=hi, negated=True,
                                 unit=lo_unit or hi_unit,
                                 low_unit=lo_unit, high_unit=hi_unit)
            self.expect("in")
            return Condition("in", values=self._bracket_list(), negated=True)
        if kind == "word" and val.lower() == "matches":
            self.next()
            return Condition("matches", value=self._string())
        return None

    def _bracket_list(self) -> List[Any]:
        self.expect("[")
        vals = [self._value()]
        while self.peek() and self.peek()[1] == ",":
            self.next()
            vals.append(self._value())
        self.expect("]")
        return vals


def parse(ruleset: str) -> DQRuleset:
    try:
        parser = _Parser(_tokenize(ruleset))
        parsed = parser.parse_ruleset()
    except DQDLParseError as exc:
        # DefaultDQDLParser.scala:49-60 wraps parser failures in
        # IllegalArgumentException("Parsing Error: ...")
        if "Parsing Error" in str(exc):
            raise
        raise DQDLParseError(f"Parsing Error: {exc}") from None
    trailing = parser.peek()
    if trailing is not None:
        raise DQDLParseError(
            f"Unexpected input after ruleset: {trailing[1]!r}")
    return parsed


# ---------------------------------------------------------------------------
# translation to Checks (parity: DQDLRuleTranslator.scala:69-160)
# ---------------------------------------------------------------------------

class ColumnNamesMatchPattern:
    """Schema-level analyzer: fraction of column NAMES fully matching a
    regex (parity: DQDL ColumnNamesMatchPattern,
    DQDLRuleTranslator.scala:109-160 special types). Metadata-only — no
    data scan."""

    from .metrics import Entity as _Entity
    name = "ColumnNamesMatchPattern"
    entity = _Entity.DATASET

    def __init__(self, pattern: str):
        self.pattern = pattern

    @property
    def instance(self) -> str:
        return self.pattern

    def __eq__(self, other):
        return (isinstance(other, ColumnNamesMatchPattern)
                and self.pattern == other.pattern)

    def __hash__(self):
        return hash(("ColumnNamesMatchPattern", self.pattern))

    def preconditions(self):
        return []

    def columns_referenced(self):
        return []

    def compile(self):
        """Invalid regexes raise out of the run like the reference's
        IllegalArgumentException
        (ColumnNamesMatchPatternExecutor.scala:32-35)."""
        try:
            return re.compile(self.pattern)
        except re.error as exc:
            raise ValueError(
                f"Invalid regex pattern '{self.pattern}' for "
                f"ColumnNamesMatchPattern rule") from exc

    def unmatched_columns(self, df: DataFrame):
        rx = self.compile()
        # SEARCH semantics (findAllMatchIn), not full match
        # (ColumnNamesMatchPatternExecutor.scala:38)
        return [n for n in df.columns if rx.search(n) is None]

    def compute_state_from(self, df: DataFrame):
        from .analyzers.base import NumMatchesAndCount
        names = [f.name for f in df.schema.fields]
        matching = len(names) - len(self.unmatched_columns(df))
        return NumMatchesAndCount(matching, len(names))

    def compute_metric_from_state(self, state):
        from .metrics import DoubleMetric, Entity
        if state is None:
            return self.to_failure_metric(ValueError("no state"))
        # zero columns → NaN ratio with a PASSED outcome downstream
        # (ColumnNamesMatchPatternExecutor.scala:39-46, spec :1587-1601)
        value = (float("nan") if state.count == 0
                 else state.num_matches / state.count)
        return DoubleMetric(Entity.DATASET, self.name, self.instance, value)

    def to_failure_metric(self, exc: BaseException):
        from .metrics import Entity, metric_from_failure
        return metric_from_failure(exc, self.name, self.instance,
                                   Entity.DATASET)

    def calculate(self, df: DataFrame):
        try:
            return self.compute_metric_from_state(self.compute_state_from(df))
        except Exception as exc:  # noqa: BLE001
            return self.to_failure_metric(exc)

_AGG_RULES = {
    "RowCount": lambda c, r, a: c.has_size(a),
    "ColumnCount": lambda c, r, a: c.has_column_count(a),
    "Completeness": lambda c, r, a: c.has_completeness(r.parameters[0], a),
    "Uniqueness": lambda c, r, a: c.has_uniqueness(tuple(r.parameters), a),
    "DistinctValuesCount": lambda c, r, a:
        c.has_number_of_distinct_values(r.parameters[0], a),
    "Entropy": lambda c, r, a: c.has_entropy(r.parameters[0], a),
    "Mean": lambda c, r, a: c.has_mean(r.parameters[0], a),
    "Sum": lambda c, r, a: c.has_sum(r.parameters[0], a),
    "StandardDeviation": lambda c, r, a:
        c.has_standard_deviation(r.parameters[0], a),
    # remainder of the reference's 25-entry converter map
    # (DQDLRuleTranslator.scala:69-94)
    "ZerosCount": lambda c, r, a: c.has_zeros_count(r.parameters[0], a),
    "UniqueValueRatio": lambda c, r, a:
        c.has_unique_value_ratio(tuple(r.parameters), a),
    "Range": lambda c, r, a: c.has_range(r.parameters[0], a),
    "InterquartileRange": lambda c, r, a:
        c.has_interquartile_range(r.parameters[0], a),
    "Variance": lambda c, r, a: c.has_variance(r.parameters[0], a),
    "Skewness": lambda c, r, a: c.has_skewness(r.parameters[0], a),
    "Kurtosis": lambda c, r, a: c.has_kurtosis(r.parameters[0], a),
    "ColumnCorrelation": lambda c, r, a:
        c.has_correlation(r.parameters[0], r.parameters[1], a),
    "DuplicateRowCount": lambda c, r, a:
        c.has_duplicate_row_count(tuple(r.parameters), a),
}

# ColumnDataType "col" = "TYPE" (parity: ColumnDataTypeRule.scala:88-101)
_DQDL_TYPE_MAP = {
    "BOOLEAN": "boolean", "DATE": "date", "TIMESTAMP": "timestamp",
    "INTEGER": "int", "DOUBLE": "double", "FLOAT": "float", "LONG": "bigint",
}
_DECIMAL_RE = re.compile(r"DECIMAL\((\d+),\s*(\d+)\)", re.IGNORECASE)

# ColumnDataTypeRule.scala:31-41 — the closed set of date formats the
# `with format` tag accepts; partial formats are completed with a literal
# day/year before parsing (handlePartialDates :150-170)
_FULL_DATE_FORMATS = {"dd-MM-yyyy", "MM-dd-yyyy", "yyyy-MM-dd",
                      "dd/MM/yyyy", "MM/dd/yyyy", "yyyy/MM/dd"}
_PARTIAL_DATE_COMPLETION = {
    "MM-yyyy": ("'01-' || ", "", "dd-MM-yyyy"),
    "yyyy-MM": ("", " || '-01'", "yyyy-MM-dd"),
    "MM/yyyy": ("'01/' || ", "", "dd/MM/yyyy"),
    "yyyy/MM": ("", " || '/01'", "yyyy/MM/dd"),
    "dd-MM": ("", " || '-2000'", "dd-MM-yyyy"),
    "dd/MM": ("", " || '/2000'", "dd/MM/yyyy"),
    "MM/dd": ("", " || '/2000'", "MM/dd/yyyy"),
    "MM-dd": ("", " || '-2000'", "MM-dd-yyyy"),
}


def _column_data_type_cast_ok(col: str, spark_type: str,
                              tags: Dict[str, str]) -> str:
    """SQL predicate: the value casts cleanly to the target type, honoring
    the `with format` tag for DATE (ColumnDataTypeRule.scala:85-113
    castColumnToSparkType; try_to_date instead of to_date because Spark 4
    runs ANSI-on and to_date would throw on malformed input)."""
    if spark_type == "date":
        if tags and "format" not in tags:
            # isUnsupportedTagsFormat → untranslatable rule
            raise DQDLParseError("Unsupported rule format")
        fmt = tags.get("format")
        if fmt:
            if fmt in _FULL_DATE_FORMATS:
                return (f"try_to_date(cast({col} AS string), '{fmt}') "
                        f"IS NOT NULL")
            if fmt in _PARTIAL_DATE_COMPLETION:
                pre, post, out_fmt = _PARTIAL_DATE_COMPLETION[fmt]
                expr = f"{pre}cast({col} AS string){post}"
                return f"try_to_date({expr}, '{out_fmt}') IS NOT NULL"
            return "false"  # invalid format tag fails every row
    return f"try_cast({col} AS {spark_type}) IS NOT NULL"

# dataset-level rules need additional datasets and dedicated executors
# (parity: DQDLExecutor.scala:28-60 non-deequ branch)
_DATASET_RULE_TYPES = {"RowCountMatch", "SchemaMatch", "ReferentialIntegrity",
                       "DatasetMatch", "AggregateMatch"}


def _is_dataset_rule(rule) -> bool:
    rt = getattr(rule, "rule_type", None)
    # CustomSql WITHOUT a numeric condition is the row-level variant and
    # runs through a dedicated executor (parity: DQDLRuleTranslator
    # CustomSql branch + CustomSqlRowLevelExecutor.scala)
    return rt in _DATASET_RULE_TYPES or (
        rt == "CustomSql" and getattr(rule, "condition", None) is None)


def _custom_sql_row_level(df: DataFrame, sql: str, outcome_col: str):
    """Row-level CustomSql (parity: CustomSqlRowLevelExecutor.scala:34-150):
    the statement selects the PASSING rows of `primary`; they are matched
    back to the input rows by null-safe equality on every returned column.
    Returns (annotated_df, ratio, error) — exactly one of ratio/error set.

    Unlike the reference we de-duplicate the SQL result before the left
    join so a duplicated match can never multiply primary rows."""
    from pyspark.sql import functions as F
    spark = df.sparkSession
    total = df.count()
    if total == 0:
        return None, None, ("Custom SQL rule could not be evaluated due to "
                            "data frame being empty")
    try:
        sql_df = spark.sql(sql)
        sql_cols = list(sql_df.columns)
        df_cols = set(df.columns)
        if not any(c in df_cols for c in sql_cols):
            return None, None, (
                "The output from CustomSQL must contain at least one column "
                "that matches the input dataset")
        extra = [c for c in sql_cols if c not in df_cols]
        if extra:
            return None, None, (
                "The columns returned from the SQL statement should only "
                f"belong to the primary table. Columns not found: "
                f"{', '.join(extra)}")
        renamed = [f"__dq_{c}" for c in sql_cols]
        matches = (sql_df
                   .select(*[F.col(c).alias(r)
                             for c, r in zip(sql_cols, renamed)])
                   .dropDuplicates(renamed)
                   .withColumn("__dq_match", F.lit(True)))
        join_cond = None
        for c, r in zip(sql_cols, renamed):
            eq = df[c].eqNullSafe(F.col(r))
            join_cond = eq if join_cond is None else (join_cond & eq)
        out = (df.join(matches, join_cond, "left")
               .withColumn(outcome_col,
                           F.coalesce(F.col("__dq_match"), F.lit(False)))
               .drop(*renamed, "__dq_match"))
        matched = out.filter(F.col(f"`{outcome_col}`")).count()
        return out, matched / total, None
    except Exception as exc:  # noqa: BLE001
        return None, None, f"Error executing SQL statement: {exc}"


def _quote_col(col: str) -> str:
    """Spaces/dashes/other special characters get backticks; explicit user
    backticks pass through (a LITERAL dotted column name, e.g.
    `Some.Date`); bare dots are struct field access and stay unquoted
    (DataFreshnessSpec "nested columns" vs "columns with . in name";
    ColumnDataTypeRuleSpec "column names with special characters")."""
    if "`" in col:
        return col
    needs_quote = any(not (c.isalnum() or c in "_.") for c in col)
    return f"`{col}`" if needs_quote else col


def _translate_into(check: Check, rule: DQRule) -> Check:
    rt = rule.rule_type
    cond = rule.condition
    n_before = len(check._cells)  # noqa: SLF001 — for where retrofitting
    if rt in _AGG_RULES:
        if cond is None:
            raise DQDLParseError(f"{rt} requires a condition")
        check = _AGG_RULES[rt](check, rule, cond.assertion())
    elif rt == "ColumnExists":
        check = check.has_column(rule.parameters[0])
    elif rt == "IsComplete":
        check = check.is_complete(rule.parameters[0])
    elif rt == "IsUnique":
        check = check.is_unique(rule.parameters[0])
    elif rt == "IsPrimaryKey":
        check = check.is_primary_key(*rule.parameters)
    elif rt == "ColumnValues":
        if cond is None:
            raise DQDLParseError("ColumnValues requires a condition")
        pred = cond.sql_predicate(_quote_col(rule.parameters[0]))
        check = check.satisfies(pred, rule.describe(), lambda v: v == 1.0)
    elif rt == "ColumnLength":
        if cond is None:
            raise DQDLParseError("ColumnLength requires a condition")
        pred = cond.sql_predicate(f"length({_quote_col(rule.parameters[0])})")
        check = check.satisfies(pred, rule.describe(), lambda v: v == 1.0)
    elif rt == "CustomSql":
        if cond is None:
            raise DQDLParseError("CustomSql requires a condition")
        check = check.custom_sql(rule.parameters[0], cond.assertion())
    elif rt == "ColumnNamesMatchPattern":
        import math as _math
        from .constraints import AnalysisBasedConstraint
        analyzer = ColumnNamesMatchPattern(rule.parameters[0])
        analyzer.compile()   # invalid regex raises BEFORE any Spark work
        # zero-column frames yield a NaN ratio and PASS (no unmatched
        # columns exist, ColumnNamesMatchPatternExecutor.scala:39-46)
        check._cells.append({  # noqa: SLF001
            "factory": lambda w: AnalysisBasedConstraint(
                analyzer,
                lambda ratio: _math.isnan(ratio) or ratio == 1.0),
            "where": None, "filterable": False})
    elif rt == "ColumnDataType":
        if cond is None or cond.kind != "cmp" or cond.op not in ("=", "!=") \
                or not isinstance(cond.value, str):
            raise DQDLParseError(
                'ColumnDataType requires = "TYPE" or != "TYPE"')
        type_name = cond.value.upper()
        dec = _DECIMAL_RE.fullmatch(type_name)
        spark_type = (f"decimal({dec.group(1)},{dec.group(2)})" if dec
                      else _DQDL_TYPE_MAP.get(type_name))
        if spark_type is None:
            raise DQDLParseError(
                f"Unsupported ColumnDataType {cond.value!r}")
        col = _quote_col(rule.parameters[0])
        # try_cast / try_to_date (never throw under ANSI mode): a value HAS
        # the type iff it casts cleanly; NULLs are out of scope like the
        # reference's FilteredRowOutcome.TRUE
        cast_ok = _column_data_type_cast_ok(col, spark_type, rule.tags)
        ok = f"({cast_ok} OR {col} IS NULL)"
        pred = ok if cond.op == "=" else f"(NOT {ok} OR {col} IS NULL)"
        # `with threshold` asserts the matching RATIO instead of 1.0
        # (ColumnDataTypeRule.scala:168-175 getAssertion)
        assertion = (rule.threshold_condition.assertion()
                     if rule.threshold_condition is not None
                     else (lambda v: v == 1.0))
        check = check.satisfies(pred, rule.describe(), assertion)
    elif rt in _DATASET_RULE_TYPES:
        raise DQDLParseError(
            f"{rt} is dataset-level: it runs through "
            "EvaluateDataQuality.process (with additional_datasets) as a "
            "top-level rule, not inside a composite")
    elif rt == "DataFreshness":
        def to_sec(v, unit):
            return {"days": 86400, "hours": 3600, "minutes": 60}[
                unit or "days"] * float(v)
        col = _quote_col(rule.parameters[0])
        # try_cast-to-timestamp: accepts date-only strings, fractional
        # seconds, and typed date/timestamp columns; malformed values go
        # NULL (row fails) instead of throwing under ANSI mode
        age = (f"(unix_timestamp(current_timestamp()) - "
               f"unix_timestamp(try_cast({col} AS TIMESTAMP)))")
        if cond is not None and cond.kind == "cmp":
            op = "<>" if cond.op == "!=" else cond.op
            pred = f"{age} {op} {to_sec(cond.value, cond.unit)}"
        elif cond is not None and cond.kind == "between":
            lo = to_sec(cond.low, cond.low_unit or cond.unit)
            hi = to_sec(cond.high, cond.high_unit or cond.unit)
            if cond.negated:
                pred = (f"({age} IS NOT NULL AND "
                        f"({age} <= {lo} OR {age} >= {hi}))")
            else:
                pred = f"({age} > {lo} AND {age} < {hi})"
        else:
            raise DQDLParseError(
                "DataFreshness requires a comparison or between condition "
                "with days|hours|minutes units")
        # where='true' is a no-op filter that routes an EMPTY input through
        # the empty-state-due-to-filter carve-out → Passed, matching the
        # reference's RuleEvaluationHelper totalCount==0 → Passed
        # (RuleEvaluationHelper.scala:70, DataFreshnessSpec "work for empty
        # dataframes")
        check = check.satisfies(pred, rule.describe(), lambda v: v == 1.0)
        check._cells[-1]["where"] = "true"  # noqa: SLF001
    else:
        raise DQDLParseError(f"Unsupported DQDL rule type: {rt}")
    if rule.where:
        # retrofit the filter onto EVERY constraint this rule added (a rule
        # like IsPrimaryKey expands to several constraints)
        new_cells = check._cells[n_before:]  # noqa: SLF001
        filterable = [c for c in new_cells if c["filterable"]]
        if not filterable:
            raise DQDLParseError(
                f"{rt} does not support a where clause")
        for cell in filterable:
            cell["where"] = rule.where
    return check


def to_checks(ruleset: DQRuleset,
              level: CheckLevel = CheckLevel.ERROR) -> List[Check]:
    """One Check per rule so each rule reports its own outcome; all checks
    run in ONE suite (shared fused scan). For composite rules the check
    records each member's constraint range so and/or evaluates per MEMBER
    rule, not per constraint (IsPrimaryKey expands to several)."""
    checks = []
    for rule in ruleset.rules:
        check = Check(level, rule.describe())

        def build(node):
            # returns an eval-tree node over constraint index spans —
            # nested composites evaluate recursively; leaves carry their
            # rule type + params so EvaluatedMetrics keys can use the
            # DQDL metric vocabulary
            nonlocal check
            if isinstance(node, DQCompositeRule):
                return {"op": node.operator,
                        "children": [build(m) for m in node.rules]}
            start = len(check._cells)  # noqa: SLF001
            check = _translate_into(check, node)
            return {"span": (start, len(check._cells)),  # noqa: SLF001
                    "rule_type": node.rule_type,
                    "params": list(node.parameters)}

        check._dqdl_eval_tree = build(rule)  # noqa: SLF001
        checks.append(check)
    return checks


# ---------------------------------------------------------------------------
# execution (parity: EvaluateDataQuality.scala:48-69, DQDLExecutor.scala:28-60)
# ---------------------------------------------------------------------------

_AGG_EXPR_RE = re.compile(r"(sum|avg)\s*\((.+)\)\s*$", re.IGNORECASE)


def _column_data_type_plan(df: DataFrame, rule: DQRule):
    """Validate one ColumnDataType rule. Returns either
    ("row", finished_result_tuple) for untranslatable rules, or
    ("agg", (total_expr, passed_expr)) contributing two SQL aggregate
    expressions to the shared scan."""
    from pyspark.sql import functions as F

    name = rule.describe()
    cond = rule.condition
    if cond is None or cond.kind != "cmp" or cond.op not in ("=", "!=") \
            or not isinstance(cond.value, str):
        return "row", (name, "Failed",
                       "ColumnDataType rule only supports EQUALS (=) or "
                       "NOT_EQUALS (!=) operators", {})
    type_name = cond.value.upper()
    dec = _DECIMAL_RE.fullmatch(type_name)
    spark_type = (f"decimal({dec.group(1)},{dec.group(2)})" if dec
                  else _DQDL_TYPE_MAP.get(type_name))
    if spark_type is None:
        return "row", (name, "Failed",
                       f"Unrecognized data type: {cond.value}", {})
    if not rule.parameters or not rule.parameters[0]:
        return "row", (name, "Failed",
                       "ColumnDataType rule requires a TargetColumn "
                       "parameter", {})
    column = rule.parameters[0]
    col = _quote_col(column)
    try:
        df.select(F.expr(col))
    except Exception:  # noqa: BLE001
        return "row", (name, "Failed",
                       f"Column {column} does not exist in the dataset", {})
    try:
        cast_ok = _column_data_type_cast_ok(col, spark_type, rule.tags)
    except DQDLParseError as exc:
        return "row", (name, "Failed", str(exc), {})
    is_equals = cond.op == "="
    outcome = (f"CASE WHEN ({cast_ok}) THEN {str(is_equals).lower()} "
               f"ELSE {str(not is_equals).lower()} END")
    in_scope = "true"
    if rule.where:
        try:
            df.where(rule.where)
        except Exception:  # noqa: BLE001
            return "row", (name, "Failed",
                           "The provided where clause is invalid", {})
        in_scope = f"({rule.where})"
    return "agg", (f"sum(CASE WHEN {in_scope} THEN 1 ELSE 0 END)",
                   f"sum(CASE WHEN ({in_scope}) AND ({outcome}) THEN 1 "
                   f"ELSE 0 END)")


def _execute_column_data_type_rules(df: DataFrame,
                                    rules: List[DQRule]) -> Dict[int, tuple]:
    """Dedicated ColumnDataType executor (executors/
    ColumnDataTypeExecutor.scala + RuleEvaluationHelper.scala
    evaluateRuleAgainstColumn): per-row outcome is
    when(castSuccessful, isEquals).otherwise(!isEquals) — a NULL value
    FAILS `= TYPE` and PASSES `!= TYPE`; missing column / invalid where /
    unrecognized type / bad tags become Failed rows with the reference's
    reasons; zero in-scope rows → Passed("No rows matched the filter").

    Scale: ALL ColumnDataType rules in the ruleset fuse into ONE
    df.agg(...) — two count expressions per rule in a single scan (the
    reference runs one evaluateRuleAgainstColumn pass per rule,
    RuleEvaluationHelper.scala:58-71; at 100 TB, N extra scans)."""
    from pyspark.sql import functions as F

    results: Dict[int, tuple] = {}
    agg_rules: List[Tuple[int, DQRule]] = []
    agg_exprs: List[str] = []
    for i, rule in enumerate(rules):
        kind, payload = _column_data_type_plan(df, rule)
        if kind == "row":
            results[i] = payload
        else:
            agg_rules.append((i, rule))
            agg_exprs.extend(payload)
    if not agg_rules:
        return results
    row = df.agg(*[F.expr(e).alias(f"__c{j}")
                   for j, e in enumerate(agg_exprs)]).collect()[0]
    for slot, (i, rule) in enumerate(agg_rules):
        name = rule.describe()
        total = int(row[2 * slot] or 0)
        if total == 0:
            results[i] = (name, "Passed", "No rows matched the filter", {})
            continue
        ratio = int(row[2 * slot + 1] or 0) / total
        column = rule.parameters[0]
        metrics = {f"Column.{column}.ColumnDataType.Compliance": ratio}
        assertion = (rule.threshold_condition.assertion()
                     if rule.threshold_condition is not None
                     else (lambda v: v == 1.0))
        if assertion(ratio):
            results[i] = (name, "Passed", None, metrics)
        else:
            results[i] = (
                name, "Failed",
                f"Value: {ratio} does not meet the constraint requirement.",
                metrics)
    return results


def _execute_dataset_rule(df: DataFrame, rule: DQRule,
                          additional_datasets) -> tuple:
    """Dedicated executors for the reference's non-deequ rule types
    (DQDLExecutor.scala:28-60; executors/ package): RowCountMatch,
    SchemaMatch, ReferentialIntegrity, DatasetMatch, AggregateMatch.
    Returns one result row (Rule, Outcome, FailureReason, metrics)."""
    from pyspark.sql import functions as F
    from .comparison import (ComparisonResult, DataSynchronization,
                             ReferentialIntegrity, RowCountMatch, SchemaMatch)

    rt, cond = rule.rule_type, rule.condition
    try:
        if rt == "CustomSql":          # row-level variant (no condition)
            _, ratio, error = _custom_sql_row_level(
                df, rule.parameters[0], "__dq_outcome")
            if error is not None:
                return (rule.describe(), "Failed", error, {})
            # default: all returned rows must pass; `with threshold <cond>`
            # asserts the passing-row ratio instead
            # (CustomSqlRowLevelRule.scala:30-34)
            if rule.threshold_condition is not None:
                passed = rule.threshold_condition.assertion()(ratio)
            else:
                passed = ratio == 1.0
            outcome = "Passed" if passed else "Failed"
            reason = None if passed else \
                f"Value: {ratio} does not meet the constraint requirement."
            return (rule.describe(), outcome, reason,
                    # CustomSqlRowLevelSpec.scala:58 metric key
                    {"Dataset.*.CustomSQL.Compliance": float(ratio)})
        if cond is None:
            raise DQDLParseError(f"{rt} requires a numeric condition")
        if rule.where:
            raise DQDLParseError(f"{rt} does not support a where clause")
        assertion = cond.assertion()

        def ref(alias: str) -> DataFrame:
            if alias == "primary":
                return df
            if not additional_datasets or alias not in additional_datasets:
                raise DQDLParseError(
                    f"Dataset {alias!r} not found in additional data "
                    "sources; pass it via additional_datasets")
            return additional_datasets[alias]

        if rt == "RowCountMatch":
            res = RowCountMatch.match_row_counts(
                df, ref(rule.parameters[0]), assertion)
        elif rt == "SchemaMatch":
            res = SchemaMatch.match_schema(
                df, ref(rule.parameters[0]), assertion)
        elif rt == "ReferentialIntegrity":
            # params: "pcol1,pcol2" and "alias.{rcol1,rcol2}" | "alias.rcol"
            # (parity: ReferentialIntegrityRule.scala patterns)
            pcols = [c.strip() for c in rule.parameters[0].split(",")]
            m = re.fullmatch(r"(.+?)\.\{(.+)\}", rule.parameters[1]) \
                or re.fullmatch(r"(.+)\.([^.{}]+)", rule.parameters[1])
            if m is None:
                raise DQDLParseError(
                    "ReferentialIntegrity reference must be "
                    '"alias.column" or "alias.{col1,col2}"')
            rcols = [c.strip() for c in m.group(2).split(",")]
            res = ReferentialIntegrity.subset_check(
                df, pcols, ref(m.group(1)), rcols, assertion)
        elif rt == "DatasetMatch":
            # params: alias, "k1->r1,k2", optional match mappings
            # (parity: DatasetMatchRule.parseColumnMappings)
            def mappings(spec):
                out = {}
                for part in spec.split(","):
                    halves = [p.strip() for p in part.split("->")]
                    out[halves[0]] = halves[1] if len(halves) == 2 \
                        else halves[0]
                return out
            key_map = mappings(rule.parameters[1])
            comp = (mappings(rule.parameters[2])
                    if len(rule.parameters) > 2 else None)
            res = DataSynchronization.column_match(
                df, ref(rule.parameters[0]), key_map, comp, assertion)
        elif rt == "AggregateMatch":
            # params: "sum(col)" and "sum(alias.col)" — ratio of the two
            # aggregates (parity: AggregateMatchRule.scala)
            def agg_value(expr: str) -> float:
                m = _AGG_EXPR_RE.fullmatch(expr.strip())
                if m is None:
                    raise DQDLParseError(
                        f"AggregateMatch supports sum()/avg(), got {expr!r}")
                op, colref = m.group(1).lower(), m.group(2).strip()
                alias, _, col = colref.rpartition(".")
                alias = alias or "primary"
                fn = F.sum if op == "sum" else F.avg
                row = ref(alias).agg(fn(F.col(f"`{col}`"))).collect()[0]
                if row[0] is None:
                    raise DQDLParseError(f"{expr!r} aggregated to NULL")
                return float(row[0])
            v1 = agg_value(rule.parameters[0])
            v2 = agg_value(rule.parameters[1])
            if v2 == 0.0:
                # 0/0 counts as a perfect match (EvaluateDataQualitySpec
                # "divide by zero (0/0 = 1.0)"); nonzero/0 is infinitely off
                ratio = 1.0 if v1 == 0.0 else float("inf")
            else:
                ratio = v1 / v2
            res = ComparisonResult(assertion(ratio), ratio)
        else:  # pragma: no cover — guarded by _is_dataset_rule
            raise DQDLParseError(f"Unsupported dataset rule {rt}")
    except Exception as exc:  # noqa: BLE001 — rule errors never kill the run
        return (rule.describe(), "Failed", str(exc), {})

    metrics = {rt: float(res.ratio)} if res.ratio is not None else {}
    outcome = "Passed" if res.passed else "Failed"
    return (rule.describe(), outcome, res.error, metrics)


class EvaluateDataQuality:
    @staticmethod
    def process(df: DataFrame, ruleset: str,
                level: CheckLevel = CheckLevel.ERROR,
                additional_datasets=None) -> DataFrame:
        """Run a DQDL ruleset against a DataFrame; returns one row per rule:
        (Rule, Outcome, FailureReason, EvaluatedMetrics). Rules needing a
        second dataset (RowCountMatch, SchemaMatch, ReferentialIntegrity,
        DatasetMatch, AggregateMatch) resolve aliases from
        ``additional_datasets`` (dict alias -> DataFrame)."""
        from .verification import VerificationSuite

        spark = df.sparkSession
        # CustomSql refers to the dataset as `primary`; additional datasets
        # are registered under their aliases (parity:
        # CustomSqlRowLevelExecutor.scala:34-90)
        df.createOrReplaceTempView("primary")
        for alias, d in (additional_datasets or {}).items():
            d.createOrReplaceTempView(alias)
        parsed = parse(ruleset)

        def _dedicated(r):
            return (_is_dataset_rule(r)
                    or getattr(r, "rule_type", None) == "ColumnDataType")

        deequ_rules = [r for r in parsed.rules if not _dedicated(r)]
        checks = to_checks(DQRuleset(deequ_rules), level)
        check_results = {}
        if checks:
            suite = VerificationSuite().on_data(df)
            for c in checks:
                suite = suite.add_check(c)
            check_results = suite.run().check_results

        # emit rows in ruleset order: deequ-backed rules pull from the one
        # suite run, dataset rules + ColumnDataType run through their
        # dedicated executors (DQDLExecutor.scala:44); all ColumnDataType
        # rules share ONE fused scan
        cdt_rules = [r for r in parsed.rules
                     if getattr(r, "rule_type", None) == "ColumnDataType"]
        cdt_results = (_execute_column_data_type_rules(df, cdt_rules)
                       if cdt_rules else {})
        cdt_iter = iter(range(len(cdt_rules)))
        check_iter = iter(checks)
        rows = []
        for rule in parsed.rules:
            if getattr(rule, "rule_type", None) == "ColumnDataType":
                rows.append(cdt_results[next(cdt_iter)])
            elif _is_dataset_rule(rule):
                rows.append(_execute_dataset_rule(df, rule,
                                                  additional_datasets))
            else:
                check = next(check_iter)
                rows.append(_check_result_row(check, check_results[check]))
        return spark.createDataFrame(
            rows, "Rule string, Outcome string, FailureReason string, "
                  "EvaluatedMetrics map<string,double>")

    ORIGINAL_DATA_KEY = "originalData"
    RULE_OUTCOMES_KEY = "ruleOutcomes"
    ROW_LEVEL_OUTCOMES_KEY = "rowLevelOutcomes"
    ANNOTATED_DATA_KEY = "annotatedData"   # extra: per-rule boolean columns
    ROW_LEVEL_PASS = "DataQualityRulesPass"
    ROW_LEVEL_FAIL = "DataQualityRulesFail"
    ROW_LEVEL_SKIP = "DataQualityRulesSkip"
    ROW_LEVEL_OUTCOME_COLUMN = "DataQualityEvaluationResult"

    @staticmethod
    def process_rows(df: DataFrame, ruleset: str,
                     level: CheckLevel = CheckLevel.ERROR,
                     additional_datasets=None) -> dict:
        """Row-level outcomes in the reference's processRows contract
        (EvaluateDataQuality.scala:37-39,96-139 +
        execution/RowLevelResultHelper.scala:26-29): a dict with
        ``originalData`` (unchanged input), ``ruleOutcomes`` (the
        per-rule outcome table of :meth:`process`), and
        ``rowLevelOutcomes`` — the input rows plus
        ``DataQualityRulesPass`` / ``DataQualityRulesFail`` /
        ``DataQualityRulesSkip`` (arrays of rule strings) and
        ``DataQualityEvaluationResult`` ("Passed" iff no rule failed on
        the row; rules without row semantics land in skip). The extra
        ``annotatedData`` key exposes the underlying per-rule boolean
        columns (this engine's richer surface; a NULL there means the rule
        filtered the row out — counted in neither pass nor fail).

        Scale note: the deequ-backed columns are a pure projection fused
        into the scan; each join-backed rule adds one (broadcastable)
        left join; the pass/fail arrays are array-literal expressions on
        top — still no shuffle."""
        from pyspark.sql import functions as F

        parsed = parse(ruleset)
        annotated = _process_rows_impl(df, ruleset, level,
                                       additional_datasets)
        rule_names = [r.describe() for r in parsed.rules]
        # DataFreshness is dataset-level in the reference executor — its
        # row column (our richer internal surface) is demoted to SKIP
        # (EvaluateDataQualityRowLevelSpec.scala:467-486)
        no_row_level = {r.describe() for r in parsed.rules
                        if getattr(r, "rule_type", None) == "DataFreshness"}
        row_level_cols = [n for n in rule_names
                          if n in annotated.columns and n not in no_row_level]
        skip = [n for n in rule_names if n not in row_level_cols]

        def arr(pred):
            items = [F.when(pred(F.col(f"`{n}`")), F.lit(n)) for n in
                     row_level_cols]
            if not items:
                return F.array().cast("array<string>")
            return F.filter(F.array(*items), lambda x: x.isNotNull())

        passes = arr(lambda c: c == True)  # noqa: E712 — three-valued
        fails = arr(lambda c: c == False)  # noqa: E712
        row_level = (annotated
                     .withColumn(EvaluateDataQuality.ROW_LEVEL_PASS, passes)
                     .withColumn(EvaluateDataQuality.ROW_LEVEL_FAIL, fails)
                     .withColumn(EvaluateDataQuality.ROW_LEVEL_SKIP,
                                 F.array(*[F.lit(n) for n in skip])
                                 .cast("array<string>"))
                     .withColumn(
                         EvaluateDataQuality.ROW_LEVEL_OUTCOME_COLUMN,
                         F.when(F.size(F.col(
                             EvaluateDataQuality.ROW_LEVEL_FAIL)) == 0,
                             F.lit("Passed")).otherwise(F.lit("Failed"))))
        row_level = row_level.drop(*row_level_cols)
        return {
            EvaluateDataQuality.ORIGINAL_DATA_KEY: df,
            EvaluateDataQuality.RULE_OUTCOMES_KEY:
                EvaluateDataQuality.process(df, ruleset, level,
                                            additional_datasets),
            EvaluateDataQuality.ROW_LEVEL_OUTCOMES_KEY: row_level,
            EvaluateDataQuality.ANNOTATED_DATA_KEY: annotated,
        }


def _process_rows_impl(df: DataFrame, ruleset: str, level: CheckLevel,
                       additional_datasets) -> DataFrame:
    from pyspark.sql import functions as F
    from .verification import VerificationSuite
    from .comparison import DataSynchronization, ReferentialIntegrity

    df.createOrReplaceTempView("primary")
    for alias, d in (additional_datasets or {}).items():
        d.createOrReplaceTempView(alias)
    parsed = parse(ruleset)
    deequ_rules = [r for r in parsed.rules if not _is_dataset_rule(r)]
    out = df
    if deequ_rules:
        checks = to_checks(DQRuleset(deequ_rules), level)
        suite = VerificationSuite().on_data(df)
        for c in checks:
            suite = suite.add_check(c)
        out = suite.run().row_level_results_as_dataframe(df)

    def ref(alias: str) -> DataFrame:
        if alias == "primary":
            return df
        if not additional_datasets or alias not in additional_datasets:
            raise DQDLParseError(
                f"Dataset {alias!r} not found in additional data sources; "
                "pass it via additional_datasets")
        return additional_datasets[alias]

    # row-level-capable dataset rules annotate via their join executors
    # (parity: ReferentialIntegrity.scala:94-120,
    # DataSynchronization.scala:155-207); RowCountMatch / SchemaMatch /
    # AggregateMatch are dataset-level only and add no column
    for rule in parsed.rules:
        if getattr(rule, "rule_type", None) == "CustomSql" \
                and getattr(rule, "condition", None) is None:
            annotated, _, error = _custom_sql_row_level(
                out, rule.parameters[0], rule.describe())
            if error is not None:
                out = out.withColumn(rule.describe(), F.lit(False))
            else:
                out = annotated
        elif getattr(rule, "rule_type", None) == "ReferentialIntegrity":
            pcols = [c.strip() for c in rule.parameters[0].split(",")]
            m = re.fullmatch(r"(.+?)\.\{(.+)\}", rule.parameters[1]) \
                or re.fullmatch(r"(.+)\.([^.{}]+)", rule.parameters[1])
            if m is None:
                raise DQDLParseError(
                    "ReferentialIntegrity reference must be "
                    '"alias.column" or "alias.{col1,col2}"')
            rcols = [c.strip() for c in m.group(2).split(",")]
            out = ReferentialIntegrity.subset_check_row_level(
                out, pcols, ref(m.group(1)), rcols,
                outcome_column=rule.describe())
        elif getattr(rule, "rule_type", None) == "DatasetMatch":
            key_map = {}
            for part in rule.parameters[1].split(","):
                halves = [p.strip() for p in part.split("->")]
                key_map[halves[0]] = halves[1] if len(halves) == 2 \
                    else halves[0]
            comp = None
            if len(rule.parameters) > 2:
                comp = {}
                for part in rule.parameters[2].split(","):
                    halves = [p.strip() for p in part.split("->")]
                    comp[halves[0]] = halves[1] if len(halves) == 2 \
                        else halves[0]
            out = DataSynchronization.column_match_row_level(
                out, ref(rule.parameters[0]), key_map, comp,
                outcome_column=rule.describe())
    return out


# deequ metric name → Glue DQDL metric vocabulary
# (DeequMetricMapping entries in dqdl/translation/rules/*.scala)
_DQDL_METRIC_NAMES = {
    "Size": "RowCount",
    "MinLength": "MinimumLength",
    "MaxLength": "MaximumLength",
    "Correlation": "ColumnCorrelation",
    "CountDistinct": "DistinctValuesCount",
    "Histogram.bins": "DistinctValuesCount",
}


def _metric_key(cr, rule_type: Optional[str], params) -> str:
    """EvaluatedMetrics key in the reference's 'Entity.instance.Name'
    shape (ExecutableRule.scala evaluatedMetricName + the
    DeequMetricMapping vocabulary)."""
    m = cr.metric
    entity, instance, name = m.entity.value, m.instance, m.name
    if name == "Compliance":
        # our Compliance instance is the rule description — the reference
        # keys by the TARGET column with a rule-typed compliance name
        if rule_type == "ColumnValues":
            return f"Column.{params[0]}.ColumnValues.Compliance"
        if rule_type == "ColumnLength":
            return f"Column.{params[0]}.LengthCompliance"
        if rule_type == "ColumnDataType":
            return f"Column.{params[0]}.ColumnDataType.Compliance"
        if rule_type == "CustomSql":
            return "Dataset.*.CustomSQL"
    if rule_type == "ColumnNamesMatchPattern":
        return "Dataset.*.ColumnNamesPatternMatchRatio"
    name = _DQDL_METRIC_NAMES.get(name, name)
    return f"{entity}.{instance}.{name}"


def _check_result_row(check, check_result) -> tuple:
    statuses = [cr.status.value == "Success"
                for cr in check_result.constraint_results]

    def ev(node):
        if "span" in node:
            s, e = node["span"]
            return all(statuses[s:e])
        vals = [ev(c) for c in node["children"]]
        return any(vals) if node["op"] == "or" else all(vals)

    tree = getattr(check, "_dqdl_eval_tree", None)
    passed = ev(tree) if tree is not None else all(statuses)

    # constraint index → owning simple rule (for DQDL metric naming)
    rule_at: Dict[int, Tuple[Optional[str], list]] = {}

    def index_leaves(node):
        if node is None:
            return
        if "span" in node:
            s, e = node["span"]
            for i in range(s, e):
                rule_at[i] = (node.get("rule_type"), node.get("params", []))
        else:
            for c in node["children"]:
                index_leaves(c)

    index_leaves(tree)
    reasons = "; ".join(
        str(cr.message) for cr in check_result.constraint_results
        if cr.status.value != "Success" and cr.message)
    metrics = {}
    for i, cr in enumerate(check_result.constraint_results):
        if (cr.metric is not None and cr.metric.is_success
                and isinstance(cr.metric.value, (int, float))):
            rt, params = rule_at.get(i, (None, []))
            metrics[_metric_key(cr, rt, params)] = float(cr.metric.value)
    return (check.description, "Passed" if passed else "Failed",
            reasons or None, metrics)
