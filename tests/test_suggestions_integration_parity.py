"""ConstraintSuggestionsIntegrationTest.scala transcription: the 10k-row
java.util.Random(0) synthetic dataset (bit-exact LCG replica) run through
Rules.EXTENDED, asserting the same (analyzer, assertion) facts the
reference asserts per column — existence AND absence of specific suggested
constraints, with their assertion lambdas probed at the reference's
boundary values. Line refs per assertion."""

import pytest

from deequ_spark import Check, CheckLevel
from deequ_spark.constraints import AnalysisBasedConstraint
from deequ_spark.suggestions import (EXTENDED_RULES, NonNegativeNumbersRule,
                                     ConstraintSuggestionRunner)


class JavaRandom:
    """java.util.Random 48-bit LCG with the exact nextInt(bound)/
    nextBoolean/nextDouble sequences (same engine as
    tests/test_anomaly_parity.JavaRandom, extended with bounded ints)."""
    MULT = 0x5DEECE66D
    ADD = 0xB
    MASK = (1 << 48) - 1

    def __init__(self, seed):
        self.seed = (seed ^ self.MULT) & self.MASK

    def _next(self, bits):
        self.seed = (self.seed * self.MULT + self.ADD) & self.MASK
        return self.seed >> (48 - bits)

    def next_double(self):
        return ((self._next(26) << 27) + self._next(27)) / float(1 << 53)

    def next_boolean(self):
        return self._next(1) != 0

    def next_int(self, bound):
        if (bound & -bound) == bound:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) >= 0:
                return val

    def next_string(self, length):
        """scala.util.Random.nextString: chars are nextInt(0xD7FF)+1."""
        return "".join(chr(self.next_int(0xD800 - 1) + 1)
                       for _ in range(length))


def _suggested_pairs(result):
    """Flatten suggestions to (analyzer, assertion) pairs by applying each
    suggestion to a fresh Check — the reference test introspects
    AnalysisBasedConstraint.analyzer/.assertion the same way (:233-276)."""
    pairs = []
    for col_suggestions in result["suggestions"].values():
        for s in col_suggestions:
            check = s.apply(Check(CheckLevel.WARNING, "probe"))
            for c in check.constraints:
                inner = getattr(c, "inner", c)
                if isinstance(inner, AnalysisBasedConstraint):
                    pairs.append((inner.analyzer, inner.assertion, s))
    return pairs


def _exists(pairs, func):
    return any(func(a, f) for a, f, _ in pairs)


class TestSuggestionsIntegration:
    """ConstraintSuggestionsIntegrationTest.scala:45-199."""

    NUM_RECORDS = 10000
    CATEGORIES = ("DE", "NA", "IN", "EU")
    MIN_LEN, MAX_LEN = 5, 15

    @pytest.fixture(scope="class")
    def result(self, spark):
        rng = JavaRandom(0)
        rows = []
        for i in range(self.NUM_RECORDS):
            marketplace = self.CATEGORIES[rng.next_int(len(self.CATEGORIES))]
            measurement = rng.next_double()
            property_a = str(rng.next_boolean()).lower()
            measurement2 = str(rng.next_int(100) - 0.5)
            d = rng.next_double()
            measurement3 = str(d) if d >= 0.5 else None
            length = self.MIN_LEN + rng.next_int(
                self.MAX_LEN - self.MIN_LEN + 1)
            description = rng.next_string(length)
            rows.append((f"id{i}", marketplace, measurement, property_a,
                         measurement2, measurement3, description, None,
                         None))
        df = spark.createDataFrame(
            rows, "id string, marketplace string, measurement double, "
                  "propertyA string, measurement2 string, "
                  "measurement3 string, description string, "
                  "allNullColumn string, allNullColumn2 double")
        res = (ConstraintSuggestionRunner().on_data(df)
               .add_constraint_rules(list(EXTENDED_RULES)).run())
        return res

    @pytest.fixture(scope="class")
    def pairs(self, result):
        return _suggested_pairs(result)

    def test_num_records_used_for_profiling(self, result):
        """:110."""
        assert result["num_records_used_for_profiling"] == self.NUM_RECORDS

    def test_id_complete_and_unique_no_type(self, pairs):
        """:112-126 — IS NOT NULL + UNIQUE for id; no DataType
        suggestion for a plain string column."""
        assert _exists(pairs, lambda a, f: type(a).__name__ == "Completeness"
                       and a.instance == "id" and f(1.0))
        assert _exists(pairs, lambda a, f: type(a).__name__ == "Uniqueness"
                       and a.instance == "id" and f(1.0))
        assert not _exists(pairs, lambda a, f:
                           type(a).__name__ == "DataType"
                           and a.instance == "id")

    def test_marketplace_categorical_range(self, pairs, result):
        """:128-152 — completeness + a value-range Compliance carrying
        exactly the four categories."""
        assert _exists(pairs, lambda a, f: type(a).__name__ == "Completeness"
                       and a.instance == "marketplace" and f(1.0))
        range_pairs = [(a, f, s) for a, f, s in pairs
                       if type(a).__name__ == "Compliance"
                       and a.instance.startswith(
                           "'marketplace' has value range")]
        assert range_pairs and all(f(1.0) for _, f, _ in range_pairs)
        # the suggested code carries the category values themselves
        _, _, s = range_pairs[0]
        for cat in self.CATEGORIES:
            assert f"'{cat}'" in s.code_for_constraint

    def test_measurement_non_negative_no_type(self, pairs):
        """:154-170 — fractional double: complete, non-negative, no
        DataType suggestion asserting 1.0."""
        assert _exists(pairs, lambda a, f: type(a).__name__ == "Completeness"
                       and a.instance == "measurement" and f(1.0))
        assert _exists(pairs, lambda a, f: type(a).__name__ == "Compliance"
                       and a.instance ==
                       "'measurement' has no negative values" and f(1.0))
        assert not _exists(pairs, lambda a, f:
                           type(a).__name__ == "DataType"
                           and a.instance == "measurement" and f(1.0))

    def test_property_a_boolean_type(self, pairs):
        """:172-183 — Boolean-typed string column gets a DataType
        suggestion."""
        assert _exists(pairs, lambda a, f: type(a).__name__ == "Completeness"
                       and a.instance == "propertyA" and f(1.0))
        assert _exists(pairs, lambda a, f: type(a).__name__ == "DataType"
                       and a.instance == "propertyA" and f(1.0))

    def test_measurement2_fractional_no_range(self, pairs):
        """:185-199+150-168 — string column of fractionals including -0.5:
        DataType suggestion exists, but no positivity/non-negativity."""
        assert _exists(pairs, lambda a, f: type(a).__name__ == "Completeness"
                       and a.instance == "measurement2" and f(1.0))
        assert _exists(pairs, lambda a, f: type(a).__name__ == "DataType"
                       and a.instance == "measurement2" and f(1.0))
        assert not _exists(pairs, lambda a, f:
                           type(a).__name__ == "Compliance" and a.instance ==
                           "'measurement2' has only positive values"
                           and f(1.0))
        assert not _exists(pairs, lambda a, f:
                           type(a).__name__ == "Compliance" and a.instance ==
                           "'measurement2' has no negative values"
                           and f(1.0))

    def test_measurement3_bounded_completeness(self, pairs):
        """:170-178 — ~50% complete: the suggested completeness bound
        accepts 0.8 and rejects 0.2."""
        assert _exists(pairs, lambda a, f: type(a).__name__ == "Completeness"
                       and a.instance == "measurement3" and f(0.8))
        assert not _exists(pairs, lambda a, f:
                           type(a).__name__ == "Completeness"
                           and a.instance == "measurement3" and f(0.2))

    def test_description_length_bounds(self, pairs):
        """:180-189 — MinLength accepts exactly >=5, MaxLength <=15."""
        assert _exists(pairs, lambda a, f: type(a).__name__ == "MinLength"
                       and a.instance == "description"
                       and f(self.MIN_LEN) and not f(self.MIN_LEN - 1))
        assert _exists(pairs, lambda a, f: type(a).__name__ == "MaxLength"
                       and a.instance == "description"
                       and f(self.MAX_LEN) and not f(self.MAX_LEN + 1))


class TestNonNegativitySingleRule:
    """ConstraintSuggestionsIntegrationTest.scala:201-231."""

    def test_non_negativity_for_positive_data(self, spark):
        """:201-215 — values {0, 1, null} → exactly one suggestion."""
        df = spark.createDataFrame([(0,), (1,), (None,)], "some int")
        res = (ConstraintSuggestionRunner().on_data(df)
               .add_constraint_rules([NonNegativeNumbersRule()]).run())
        assert sum(len(v) for v in res["suggestions"].values()) == 1

    def test_non_negativity_for_strictly_positive(self, spark):
        """:217-231 — values {1, null} → exactly one suggestion."""
        df = spark.createDataFrame([(1,), (None,)], "some int")
        res = (ConstraintSuggestionRunner().on_data(df)
               .add_constraint_rules([NonNegativeNumbersRule()]).run())
        assert sum(len(v) for v in res["suggestions"].values()) == 1
