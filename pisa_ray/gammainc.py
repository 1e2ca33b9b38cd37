"""Regularized incomplete gamma function and Gamma-distribution quantile.

Pure-Python/stdlib implementations of the classic numerical algorithms
(power series for ``x < a+1``, modified Lentz continued fraction
otherwise — Abramowitz & Stegun §6.5, the standard public formulation),
used by the Taily threshold estimator (``tools.taily_thresholds``) where
the reference links boost::math::gamma_distribution through the external
``taily`` library (/root/reference/tools/taily_thresholds.hpp:10-16).

No scipy in this environment; per-query scalar evaluation is all the
caller needs, so plain ``math`` is the right tool (no numpy round-trips).
"""

from __future__ import annotations

import math

_EPS = 1e-15
_ITMAX = 800
_TINY = 1e-300


def gammainc_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x) = γ(a,x) / Γ(a).

    P(a, 0) = 0, P(a, ∞) = 1; monotone increasing in x.
    """
    if a <= 0.0:
        raise ValueError("shape a must be positive")
    if x < 0.0:
        raise ValueError("x must be non-negative")
    if x == 0.0:
        return 0.0
    # log prefactor x^a e^-x / Γ(a); underflows to 0 for huge x (P→1 branch
    # handles that through q→0).
    lpre = a * math.log(x) - x - math.lgamma(a)
    if x < a + 1.0:
        # power series: γ(a,x) = x^a e^-x Σ_{n≥0} x^n / (a (a+1) … (a+n))
        ap = a
        term = 1.0 / a
        total = term
        for _ in range(_ITMAX):
            ap += 1.0
            term *= x / ap
            total += term
            if abs(term) < abs(total) * _EPS:
                break
        return min(1.0, math.exp(lpre) * total)
    # continued fraction (modified Lentz) for Q(a, x), then P = 1 - Q
    b = x + 1.0 - a
    c = 1.0 / _TINY
    d = 1.0 / b if b != 0.0 else 1.0 / _TINY
    h = d
    for i in range(1, _ITMAX):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < _TINY:
            d = _TINY
        c = b + an / c
        if abs(c) < _TINY:
            c = _TINY
        d = 1.0 / d
        delt = d * c
        h *= delt
        if abs(delt - 1.0) < _EPS:
            break
    q = math.exp(lpre) * h if lpre > -745.0 else 0.0
    return max(0.0, 1.0 - q)


def gamma_ppf(shape: float, scale: float, q: float) -> float:
    """Quantile x with P(shape, x/scale) = q (Gamma CDF inverse).

    Bracketed bisection: ~110 halvings reach double precision and the
    CDF is cheap, so no Newton polish is needed; deterministic across
    platforms (no libm quantile differences to chase).
    """
    if not (0.0 <= q <= 1.0):
        raise ValueError("q must be in [0, 1]")
    if scale <= 0.0:
        raise ValueError("scale must be positive")
    if q == 0.0:
        return 0.0
    if q == 1.0:
        return math.inf
    lo, hi = 0.0, shape + 10.0 * math.sqrt(shape) + 10.0
    while gammainc_p(shape, hi) < q:
        hi *= 2.0
        if hi > 1e300:
            return math.inf
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if mid == lo or mid == hi:
            break
        if gammainc_p(shape, mid) < q:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi) * scale
