"""Numerical quadrature rules (reference `include/mitsuba/core/quad.h`:
`gauss_legendre`, `composite_simpson`, `composite_simpson_38`).

Host-side numpy: rules are generated at setup time and consumed either by
numpy post-processing (chi2 expected-mass integration) or baked into jnp
constants.  The reference computes Gauss-Legendre nodes with a Newton
iteration on Legendre polynomials; numpy's Golub-Welsch (`leggauss`) gives
the same nodes to machine precision.
"""

from __future__ import annotations

import numpy as np


def gauss_legendre(n: int):
    """Nodes and weights of the n-point Gauss-Legendre rule on [-1, 1]
    (exact for polynomials of degree <= 2n - 1)."""
    if n < 1:
        raise ValueError("need at least one node")
    x, w = np.polynomial.legendre.leggauss(n)
    return x.astype(np.float64), w.astype(np.float64)


def gauss_legendre01(n: int):
    """Gauss-Legendre rule mapped to [0, 1] (weights sum to 1)."""
    x, w = gauss_legendre(n)
    return 0.5 * (x + 1.0), 0.5 * w


def composite_simpson(n: int):
    """Nodes and weights of the composite Simpson rule with n samples on
    [-1, 1] (n odd, >= 3; reference `quad.h` composite_simpson)."""
    if n < 3 or n % 2 == 0:
        raise ValueError("composite Simpson needs an odd n >= 3")
    h = 2.0 / (n - 1)
    x = -1.0 + h * np.arange(n)
    w = np.full(n, 2.0, np.float64)
    w[1::2] = 4.0
    w[0] = w[-1] = 1.0
    return x, w * (h / 3.0)


def composite_simpson_38(n: int):
    """Composite Simpson 3/8 rule with n samples on [-1, 1]
    (n = 3k + 1; reference `quad.h` composite_simpson_38)."""
    if n < 4 or (n - 1) % 3 != 0:
        raise ValueError("Simpson 3/8 needs n = 3k + 1, n >= 4")
    h = 2.0 / (n - 1)
    x = -1.0 + h * np.arange(n)
    w = np.full(n, 3.0, np.float64)
    w[3::3] = 2.0
    w[0] = w[-1] = 1.0
    return x, w * (3.0 * h / 8.0)


def integrate(f, a: float, b: float, n: int = 32, rule=gauss_legendre):
    """Integrate callable f over [a, b] with an n-point rule."""
    x, w = rule(n)
    xm = 0.5 * (b - a) * (x + 1.0) + a
    return 0.5 * (b - a) * float(np.sum(w * np.asarray(f(xm))))
