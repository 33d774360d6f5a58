"""Distribution distance measures for profile comparison.

Reference parity: /root/reference/src/main/scala/com/amazon/deequ/analyzers/
Distance.scala:26-349 — categorical L∞ (:271), chi-square with Yates
regrouping (:136-269), PSI (:329), numerical Kolmogorov–Smirnov (:56).

Pure driver-side math over histogram/quantile summaries.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence


def l_infinity_distance(sample1: Dict[str, float],
                        sample2: Dict[str, float]) -> float:
    """L∞ over normalized categorical frequencies (parity: Distance.scala:271)."""
    n1, n2 = sum(sample1.values()), sum(sample2.values())
    if n1 == 0 or n2 == 0:
        return 1.0 if (n1 or n2) else 0.0
    keys = set(sample1) | set(sample2)
    return max(abs(sample1.get(k, 0.0) / n1 - sample2.get(k, 0.0) / n2)
               for k in keys)


def psi(expected: Dict[str, float], actual: Dict[str, float],
        epsilon: float = 1e-4) -> float:
    """Population Stability Index (parity: Distance.scala:329)."""
    ne, na = sum(expected.values()), sum(actual.values())
    if ne == 0 or na == 0:
        return float("inf")
    total = 0.0
    for k in set(expected) | set(actual):
        pe = max(expected.get(k, 0.0) / ne, epsilon)
        pa = max(actual.get(k, 0.0) / na, epsilon)
        total += (pa - pe) * math.log(pa / pe)
    return total


def chi_square_statistic(expected: Dict[str, float],
                         actual: Dict[str, float],
                         min_expected: float = 5.0,
                         ) -> Optional[float]:
    """Chi-square test statistic with regrouping of small expected bins
    (Yates-style regrouping, parity: Distance.scala:136-269). Returns None
    when fewer than 2 usable bins remain."""
    ne, na = sum(expected.values()), sum(actual.values())
    if ne == 0 or na == 0:
        return None
    # scale expected to the actual sample size
    scaled = {k: v / ne * na for k, v in expected.items()}
    # regroup bins whose expected count < min_expected into one bucket
    big = {k: v for k, v in scaled.items() if v >= min_expected}
    small_exp = sum(v for k, v in scaled.items() if k not in big)
    small_act = sum(v for k, v in actual.items() if k not in big)
    bins = [(scaled[k], actual.get(k, 0.0)) for k in big]
    if small_exp > 0:
        bins.append((small_exp, small_act))
    if len(bins) < 2:
        return None
    return sum((a - e) ** 2 / e for e, a in bins if e > 0)


def chi_square_p_value(statistic: float, dof: int) -> float:
    """Upper-tail p-value via the regularized incomplete gamma function
    (series/continued-fraction, no scipy)."""
    if statistic < 0 or dof < 1:
        return 1.0
    return 1.0 - _gamma_inc_lower_reg(dof / 2.0, statistic / 2.0)


def _gamma_inc_lower_reg(s: float, x: float) -> float:
    if x <= 0:
        return 0.0
    if x < s + 1:
        # series expansion
        term = 1.0 / s
        total = term
        k = s
        for _ in range(500):
            k += 1
            term *= x / k
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        return total * math.exp(-x + s * math.log(x) - math.lgamma(s))
    # continued fraction for the upper function
    tiny = 1e-300
    b = x + 1 - s
    c = 1 / tiny
    d = 1 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - s)
        b += 2
        d = an * d + b
        d = tiny if abs(d) < tiny else d
        c = b + an / c
        c = tiny if abs(c) < tiny else c
        d = 1 / d
        delta = d * c
        h *= delta
        if abs(delta - 1) < 1e-15:
            break
    upper = math.exp(-x + s * math.log(x) - math.lgamma(s)) * h
    return 1.0 - upper


def ks_distance(quantiles1: Sequence[float],
                quantiles2: Sequence[float]) -> float:
    """Approximate two-sample Kolmogorov–Smirnov distance from matched
    quantile sketches (parity: Distance.scala:56 — reference uses KLL
    sketches; we compare equi-probability quantile vectors)."""
    if len(quantiles1) != len(quantiles2) or not quantiles1:
        raise ValueError("need two equal-length, non-empty quantile vectors")
    m = len(quantiles1)
    merged = sorted(set(quantiles1) | set(quantiles2))

    def cdf(qs, v):
        count = sum(1 for q in qs if q <= v)
        return count / m

    return max(abs(cdf(quantiles1, v) - cdf(quantiles2, v)) for v in merged)


# --- reference-exact Distance API -------------------------------------------
# Parity: Distance.scala:26-349 — the categoricalDistance/numericalDistance
# surface with linf_simple vs linf_robust selection and the chi-square
# Yates/Cochran regrouping rules, verified against the reference's own
# KLLDistanceTest fixtures (tests/test_distance_parity.py).

CHISQUARE_MIN_DIMENSION = 2
DEFAULT_ABS_THRESHOLD_YATES = 5
DEFAULT_PERC_THRESHOLD_YATES = 0.2
DEFAULT_ABS_THRESHOLD_COCHRAN = 10
DEFAULT_C_ALPHA = 1.8          # Knuth TAOCP vol 2, Eq. (15) §3.3.1 (α≈0.003)


def _select_metrics(linf_simple: float, n: float, m: float,
                    correct_for_low_numbers: bool,
                    alpha: Optional[float]) -> float:
    if correct_for_low_numbers:
        return linf_simple
    c_alpha = (math.sqrt(-math.log(alpha / 2) / 2) if alpha is not None
               else DEFAULT_C_ALPHA)
    return max(0.0, linf_simple - c_alpha * math.sqrt((n + m) / (n * m)))


def categorical_distance(sample1: Dict[str, float], sample2: Dict[str, float],
                         correct_for_low_numbers: bool = False,
                         method: str = "linf",
                         alpha: Optional[float] = None,
                         abs_threshold_yates: int = DEFAULT_ABS_THRESHOLD_YATES,
                         perc_threshold_yates: float = DEFAULT_PERC_THRESHOLD_YATES,
                         abs_threshold_cochran: int = DEFAULT_ABS_THRESHOLD_COCHRAN,
                         ) -> float:
    """Distance.scala:99-120 categoricalDistance. ``method`` is "linf"
    (L∞, robust unless correct_for_low_numbers) or "chisquare" (p-value,
    or the raw statistic when correct_for_low_numbers)."""
    if method == "linf":
        n = float(sum(sample1.values()))
        m = float(sum(sample2.values()))
        linf = max((abs(sample1.get(k, 0) / n - sample2.get(k, 0) / m)
                    for k in set(sample1) | set(sample2)), default=0.0)
        return _select_metrics(linf, n, m, correct_for_low_numbers, alpha)
    if method != "chisquare":
        raise ValueError("method must be 'linf' or 'chisquare'")
    return _categorical_chi_square(sample1, sample2, correct_for_low_numbers,
                                   abs_threshold_yates, perc_threshold_yates,
                                   abs_threshold_cochran)


def _categorical_chi_square(sample, expected, correct_for_low_numbers,
                            abs_yates, perc_yates, abs_cochran) -> float:
    # normalize the baseline to the observed total over SHARED keys only
    # (Distance.scala:140-152)
    sample_sum = float(sum(v for k, v in sample.items() if k in expected))
    expected_sum = float(sum(expected.values()))
    s = {k: float(v) for k, v in sample.items()}
    e = {k: v / expected_sum * sample_sum for k, v in expected.items()}

    # Yates/Cochran regrouping (Distance.scala:195-241): while too many
    # expected bins sit below threshold, merge the smallest into the
    # second smallest (key tiebreak for determinism)
    while len(e) >= CHISQUARE_MIN_DIMENSION:
        if len(e) > CHISQUARE_MIN_DIMENSION:
            thresh, max_below = abs_yates, int(perc_yates * len(e))
        else:
            thresh, max_below = abs_cochran, 0
        below = sum(1 for v in e.values() if v < thresh)
        if below <= max_below:
            break
        k_min = min(e, key=lambda k: (e[k], k))
        v_min, s_min = e.pop(k_min), s.pop(k_min, 0.0)
        k_2nd = min(e, key=lambda k: (e[k], k))
        e[k_2nd] += v_min
        s[k_2nd] = s.get(k_2nd, 0.0) + s_min

    if len(e) < CHISQUARE_MIN_DIMENSION:
        return float("nan")
    # goodness-of-fit over the EXPECTED keys (sample-only keys drop out),
    # as mllib Statistics.chiSqTest does (Distance.scala:247-268)
    obs = {k: s.get(k, 0.0) for k in e}
    obs_sum, e_sum = sum(obs.values()), sum(e.values())
    scale = obs_sum / e_sum if e_sum else 1.0
    stat = sum((obs[k] - e[k] * scale) ** 2 / (e[k] * scale) for k in e)
    if correct_for_low_numbers:
        return stat
    return chi_square_p_value(stat, len(e) - 1)


def numerical_distance(sketch1, sketch2,
                       correct_for_low_numbers: bool = False,
                       alpha: Optional[float] = None) -> float:
    """L∞ over the CDFs of two KLL sketches (Distance.scala:56-75
    numericalDistance). ``sketch1``/``sketch2`` are KLLSketchCore objects
    (weighted compactor items)."""
    def weighted_items(sk):
        out = {}
        for level, arr in enumerate(sk.compactors):
            w = 1 << level
            for v in arr:
                out[float(v)] = out.get(float(v), 0) + w
        return out

    w1, w2 = weighted_items(sketch1), weighted_items(sketch2)

    def rank_of(items):
        total, ranks = 0.0, {}
        for v in sorted(items):
            total += items[v]
            ranks[v] = total
        return ranks, total

    r1, n = rank_of(w1)
    r2, m = rank_of(w2)

    def rank(ranks, v):
        best = 0.0
        for item, r in ranks.items():
            if item <= v:
                best = max(best, r)
        return best

    linf = max((abs(rank(r1, k) / n - rank(r2, k) / m)
                for k in set(w1) | set(w2)), default=0.0)
    return _select_metrics(linf, n, m, correct_for_low_numbers, alpha)
