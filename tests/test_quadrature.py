"""Quadrature rules: polynomial exactness on the reference triangle.

Exact value of int_T x^p y^q dx = p! q! / (p+q+2)!.
"""

import math

import numpy as np
import pytest

from tpuwave.core.quadrature import gauss_simplex


def exact_monomial(p, q):
    return math.factorial(p) * math.factorial(q) / math.factorial(p + q + 2)


@pytest.mark.parametrize("n,npts,degree", [(1, 1, 1), (2, 3, 2), (3, 7, 5), (4, 16, 7)])
def test_exactness(n, npts, degree):
    rule = gauss_simplex(n)
    assert rule.n_points == npts
    assert rule.degree == degree
    assert rule.weights.sum() == pytest.approx(0.5, rel=1e-14)
    assert (rule.weights > 0).all()
    x, y = rule.points[:, 0], rule.points[:, 1]
    assert (x >= 0).all() and (y >= 0).all() and (x + y <= 1 + 1e-14).all()
    for p in range(degree + 1):
        for q in range(degree + 1 - p):
            got = float(np.sum(rule.weights * x**p * y**q))
            assert got == pytest.approx(exact_monomial(p, q), rel=1e-12, abs=1e-15), \
                f"monomial x^{p} y^{q} not exact for rule n={n}"


def test_degree_plus_one_not_exact():
    # sanity: the 3-point rule must NOT integrate degree-3 exactly
    rule = gauss_simplex(2)
    x = rule.points[:, 0]
    got = float(np.sum(rule.weights * x**3))
    assert got != pytest.approx(exact_monomial(3, 0), rel=1e-12)


def test_unknown_rule():
    with pytest.raises(ValueError):
        gauss_simplex(7)
