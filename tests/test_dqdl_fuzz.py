"""DQDL parser fuzz/property tests.

The reference delegates parsing to a battle-tested external ANTLR parser
(util/DefaultDQDLParser.scala); our hand-rolled recursive-descent parser
needs adversarial coverage instead: any input must either parse or raise
DQDLParseError — never hang, never escape a different exception — and
valid rulesets must parse to the expected structure. Pure-Python tests
(no Spark session).
"""

import string

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from deequ_spark.dqdl import DQCompositeRule, DQDLParseError, DQRule, parse

FUZZ = settings(max_examples=250, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])

RULE_TYPES = ["RowCount", "ColumnCount", "IsComplete", "Completeness",
              "IsUnique", "Uniqueness", "UniqueValueRatio", "Entropy",
              "Mean", "Sum", "StandardDeviation", "Variance", "Skewness",
              "Kurtosis", "ZerosCount", "Range", "InterquartileRange",
              "DuplicateRowCount", "ColumnLength", "DistinctValuesCount"]

col_names = st.text(alphabet=string.ascii_letters + "_", min_size=1,
                    max_size=12)
numbers = st.one_of(
    st.integers(min_value=-10**9, max_value=10**9),
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False,
              allow_infinity=False))


@st.composite
def simple_rules(draw):
    """A valid (rule_text, rule_type, has_condition) triple."""
    rtype = draw(st.sampled_from(RULE_TYPES))
    col = draw(col_names)
    op = draw(st.sampled_from([">", ">=", "<", "<=", "=", "!="]))
    v = draw(numbers)
    shape = draw(st.sampled_from(["cmp", "between"]))
    if rtype in ("RowCount", "ColumnCount", "DuplicateRowCount"):
        params = ""
    else:
        params = f' "{col}"'
    if shape == "cmp":
        cond = f" {op} {v}"
    else:
        lo, hi = sorted([draw(numbers), draw(numbers)])
        cond = f" between {lo} and {hi}"
    return f"{rtype}{params}{cond}", rtype


@given(st.lists(simple_rules(), min_size=1, max_size=8))
@FUZZ
def test_valid_rulesets_parse_to_expected_structure(rules):
    text = "Rules = [ " + ", ".join(r[0] for r in rules) + " ]"
    parsed = parse(text)
    assert len(parsed.rules) == len(rules)
    for rule, (_, rtype) in zip(parsed.rules, rules):
        assert isinstance(rule, DQRule)
        assert rule.rule_type == rtype
        assert rule.condition is not None


@given(st.text(max_size=200))
@FUZZ
def test_arbitrary_text_never_escapes_parse_error(garbage):
    """Any input parses or raises DQDLParseError — no hangs, no other
    exception types (ANTLR-grade robustness for the hand-rolled parser)."""
    try:
        parse(garbage)
    except DQDLParseError:
        pass


@given(st.text(alphabet='Rules=[](),"<>!.0123456789 abcdefIsCompletand',
               max_size=120))
@FUZZ
def test_near_grammar_soup_never_escapes_parse_error(soup):
    """Alphabet biased toward grammar tokens to hit deeper parser states."""
    try:
        parse(soup)
    except DQDLParseError:
        pass


@given(st.integers(min_value=0, max_value=120))
@FUZZ
def test_every_truncation_parses_or_raises_cleanly(cut):
    text = ('Rules = [ (IsComplete "a") and (IsUnique "b"), '
            'ColumnValues "c" not in [1, 2, NULL] where "c > 0", '
            'CustomSql "select 1" = 1 ]')
    try:
        parse(text[:cut])
    except DQDLParseError:
        pass


def test_wide_composite_chain_no_hang():
    """1000-member composite — the composite loop is iterative, so width
    must not hang or hit the recursion limit."""
    members = " and ".join(f'(IsComplete "c{i}")' for i in range(1000))
    parsed = parse(f"Rules = [ {members} ]")
    assert len(parsed.rules) == 1
    assert isinstance(parsed.rules[0], DQCompositeRule)
    assert len(parsed.rules[0].rules) == 1000


def test_deep_bracket_nesting_rejected_cleanly():
    # moderate nesting is now LEGAL (nested composites,
    # EvaluateDataQualitySpec.scala:1625-1683)...
    rule = parse("Rules = [ " + "(" * 10 + 'IsComplete "a"'
                 + ")" * 10 + " ]").rules[0]
    assert rule.rule_type == "IsComplete"
    # ...but hostile depth still fails with a clean parse error, never a
    # RecursionError
    with pytest.raises(DQDLParseError, match="nesting deeper"):
        parse("Rules = [ " + "(" * 1000 + 'IsComplete "a"'
              + ")" * 1000 + " ]")


def test_mixed_and_or_without_parens_rejected():
    with pytest.raises(DQDLParseError, match="mixed and/or"):
        parse('Rules = [ (IsComplete "a") and (IsUnique "b") '
              'or (RowCount > 1) ]')


def test_trailing_garbage_rejected():
    with pytest.raises(DQDLParseError, match="after ruleset"):
        parse('Rules = [ RowCount > 1 ] RowCount > 2')


def test_empty_and_whitespace_rejected():
    for bad in ("", "   ", "Rules", "Rules =", "Rules = [",
                "Rules = [ ]", "Rules = [ , ]"):
        with pytest.raises(DQDLParseError):
            parse(bad)


def test_unterminated_string_rejected():
    with pytest.raises(DQDLParseError):
        parse('Rules = [ IsComplete "unterminated ]')


@given(st.lists(simple_rules(), min_size=1, max_size=4, unique_by=lambda r: r[0]))
@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_generated_rules_execute_end_to_end(spark_session_holder, rules):
    """Any parseable generated ruleset must also TRANSLATE and EXECUTE:
    EvaluateDataQuality.process returns per-rule outcomes (Passed/Failed),
    never an exception — rules referencing absent columns fail gracefully
    with an error outcome."""
    from deequ_spark.dqdl import EvaluateDataQuality
    spark = spark_session_holder["spark"]
    df = spark_session_holder["df"]
    text = "Rules = [ " + ", ".join(r[0] for r in rules) + " ]"
    out = EvaluateDataQuality.process(df, text).collect()
    assert len(out) == len(rules)
    assert all(r["Outcome"] in ("Passed", "Failed") for r in out)


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    df = spark.createDataFrame(
        [(i, float(i), f"s{i}") for i in range(10)],
        "a long, b double, c string")
    return {"spark": spark, "df": df}
