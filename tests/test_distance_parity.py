"""Distance-measure parity fixtures transcribed from the reference's
KLL/KLLDistanceTest.scala (exact expected values, line refs per test)."""

import math

import numpy as np
import pytest

from deequ_spark.analyzers.kll import KLLSketchCore
from deequ_spark.distance import categorical_distance, numerical_distance


def _sketch(values):
    sk = KLLSketchCore()
    sk.update_batch(np.asarray(values, dtype=float))
    return sk


class TestNumericalDistance:
    """KLLDistanceTest.scala:31-48."""

    def test_linf_simple(self):
        s1, s2 = _sketch([1, 2, 3, 4]), _sketch([2, 3, 4, 5])
        assert numerical_distance(s1, s2,
                                  correct_for_low_numbers=True) == 0.25

    def test_linf_robust(self):
        s1, s2 = _sketch([1, 2, 3, 4]), _sketch([2, 3, 4, 5])
        assert numerical_distance(s1, s2) == 0.0


class TestCategoricalLInfinity:
    """KLLDistanceTest.scala:49-104."""

    S1 = {"a": 10, "b": 20, "c": 25, "d": 10, "e": 5}
    S2 = {"a": 11, "b": 20, "c": 25, "d": 10, "e": 10}

    def test_linf_simple(self):
        assert categorical_distance(self.S1, self.S2,
                                    correct_for_low_numbers=True) \
            == pytest.approx(0.06015037593984962, abs=1e-15)

    def test_linf_robust(self):
        assert categorical_distance(self.S1, self.S2) == 0.0

    def test_linf_simple_different_bins(self):
        s2 = {"f": 11, "a": 20, "c": 25, "d": 10, "e": 10}
        assert categorical_distance(self.S1, s2,
                                    correct_for_low_numbers=True) \
            == pytest.approx(0.2857142857142857, abs=1e-15)

    def test_linf_robust_different_bins(self):
        s2 = {"f": 11, "a": 20, "c": 25, "d": 10, "e": 10}
        assert categorical_distance(self.S1, s2) == 0.0

    BIG1 = {"a": 207, "b": 20, "c": 25, "d": 14, "e": 25, "g": 13}
    BIG2 = {"a": 22, "b": 20, "c": 25, "d": 12, "e": 13, "f": 15}

    def test_linf_robust_alpha_003(self):
        assert categorical_distance(self.BIG1, self.BIG2, alpha=0.003) \
            == pytest.approx(0.2726338046550349, abs=1e-14)

    def test_linf_robust_alpha_01(self):
        assert categorical_distance(self.BIG1, self.BIG2, alpha=0.1) \
            == pytest.approx(0.33774199396969184, abs=1e-14)


class TestCategoricalChiSquare:
    """KLLDistanceTest.scala:105-215."""

    def test_stats_with_missing_bins(self):
        s1 = {"a": 207, "b": 20, "c": 25, "d": 14, "e": 25, "g": 13}
        s2 = {"a": 223, "b": 20, "c": 25, "d": 12, "e": 13, "f": 15}
        got = categorical_distance(s1, s2, correct_for_low_numbers=True,
                                   method="chisquare")
        assert got == pytest.approx(28.175042782458068, rel=1e-12)

    def test_pvalue_with_missing_bins(self):
        s1 = {"a": 207, "b": 20, "c": 25, "d": 14, "e": 25, "g": 13}
        s2 = {"a": 223, "b": 20, "c": 25, "d": 12, "e": 13, "f": 15}
        got = categorical_distance(s1, s2, method="chisquare")
        assert got == pytest.approx(3.3640191298478506e-5, rel=1e-9)

    def test_pvalue_plain(self):
        s1 = {"a": 207, "b": 20, "c": 25, "d": 14, "e": 25}
        s2 = {"a": 223, "b": 20, "c": 25, "d": 12, "e": 13}
        got = categorical_distance(s1, s2, method="chisquare")
        assert got == pytest.approx(0.013227994814265176, rel=1e-12)

    def test_stats_regroup_two_categories_after_normalizing(self):
        s1 = {"a": 100, "b": 20, "c": 25, "d": 10, "e": 5, "f": 2}
        s2 = {"a": 100, "b": 22, "c": 25, "d": 5, "e": 13, "f": 2}
        got = categorical_distance(s1, s2, correct_for_low_numbers=True,
                                   method="chisquare")
        assert got == pytest.approx(8.789790456457125, rel=1e-12)

    def test_stats_regroup_yates(self):
        baseline = {"a": 100, "b": 40, "c": 30, "e": 4}
        sample = {"a": 100, "b": 40, "c": 30, "d": 10}
        got = categorical_distance(sample, baseline,
                                   correct_for_low_numbers=True,
                                   method="chisquare")
        assert got == pytest.approx(0.38754325259515626, rel=1e-12)

    def test_stats_regroup_two_categories(self):
        baseline = {"a": 100, "b": 4, "c": 3, "d": 34}
        sample = {"a": 100, "b": 4, "c": 3, "d": 27}
        got = categorical_distance(sample, baseline,
                                   correct_for_low_numbers=True,
                                   method="chisquare")
        assert got == pytest.approx(1.1507901668129925, rel=1e-12)

    def test_stats_regroup_small_categories_below_20_percent(self):
        baseline = {"a": 100, "b": 2, "c": 1, "d": 34, "e": 20, "f": 20,
                    "g": 20, "h": 20}
        sample = {"a": 100, "b": 4, "c": 3, "d": 27, "e": 20, "f": 20,
                  "g": 20, "h": 20}
        got = categorical_distance(sample, baseline,
                                   correct_for_low_numbers=True,
                                   method="chisquare")
        assert got == pytest.approx(6.827423492761593, rel=1e-12)

    def test_nan_when_dimensions_too_small_after_regrouping(self):
        baseline = {"a": 100, "b": 4, "c": 3}
        sample = {"a": 100, "b": 4, "c": 3}
        got = categorical_distance(sample, baseline,
                                   correct_for_low_numbers=True,
                                   method="chisquare")
        assert math.isnan(got)

    def test_nan_when_expected_below_minimum(self):
        got = categorical_distance({"a": 10, "b": 20}, {"b": 20},
                                   method="chisquare")
        assert math.isnan(got)

    def test_nan_when_categories_do_not_match(self):
        got = categorical_distance({"a": 15, "b": 20}, {"c": 20, "d": 20},
                                   method="chisquare")
        assert math.isnan(got)

    def test_sample_categories_below_minimum(self):
        got = categorical_distance({"a": 30}, {"a": 20, "b": 20},
                                   method="chisquare")
        assert got == pytest.approx(4.3204630539861455e-8, rel=1e-9)


class TestPSIParity:
    """KLLDistanceTest.scala:215-232 — PSI over decile buckets."""

    def test_psi_deciles(self):
        from deequ_spark.distance import psi
        expected = dict(zip(
            "abcdefghij", [428, 425, 414, 427, 440, 447, 380, 386, 444, 386]))
        actual = dict(zip(
            "abcdefghij", [426, 437, 429, 391, 469, 433, 360, 443, 371, 418]))
        got = psi(expected, actual)
        assert got == pytest.approx(0.007406694184014186, rel=1e-12)
