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
