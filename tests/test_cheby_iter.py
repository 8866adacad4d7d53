"""Chebyshev-iteration solver: symbol bounds vs dense spectrum, solve
equivalence with CG on the implicit fast-path systems."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuwave.models.fast import FastWaveSolver
from tpuwave.solve.cg import pcg
from tpuwave.solve.cheby_iter import (block_contraction,
                                      chebyshev_coefficients,
                                      chebyshev_solve,
                                      stencil_symbol_bounds)


def make_solver(nel=(12, 10), dt=8e-4, beta=0.25):
    return FastWaveSolver(nel, ((0.0, 0.0), (1.0, 1.0)), dt, beta=beta,
                          lumped=False, dtype=jnp.float64)


def dense_constrained(apply_c, shape):
    n = shape[0] * shape[1]
    cols = []
    for j in range(n):
        e = jnp.zeros(n, jnp.float64).at[j].set(1.0).reshape(shape)
        cols.append(np.asarray(apply_c(e)).reshape(-1))
    return np.stack(cols, axis=1)


def test_symbol_bounds_contain_dense_spectrum():
    s = make_solver()
    lo, hi = stencil_symbol_bounds(s.system.stencil)
    a = dense_constrained(s._constrained(s.system), s.shape)
    assert np.allclose(a, a.T, atol=1e-14)
    eig = np.linalg.eigvalsh(a)
    assert lo < eig[0] and eig[-1] < hi, (lo, eig[0], eig[-1], hi)
    # and the bounds are tight enough to be useful (not >2x slack)
    assert hi / eig[-1] < 1.5 and eig[0] / lo < 2.5


def test_mass_symbol_positive():
    # the consistent P1 mass symbol must be positive (SPD circulant) —
    # this is what makes M + c*K chebyshev-solvable with analytic bounds
    s = make_solver()
    lo, hi = stencil_symbol_bounds(s.mass.stencil)
    assert lo > 0.0
    assert hi / lo < 20.0  # bounded conditioning independent of h


def test_chebyshev_solve_matches_cg():
    s = make_solver()
    apply_c = s._constrained(s.system)
    lo, hi = stencil_symbol_bounds(s.system.stencil)
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.normal(size=s.shape))
    rhs = jnp.where(s.interior, rhs, 0.0)
    x0 = jnp.zeros(s.shape, jnp.float64)

    ref = pcg(apply_c, rhs, x0, precond_inv_diag=s._inv_diag)
    che = chebyshev_solve(apply_c, rhs, x0, lam_min=lo, lam_max=hi,
                          degree=8)
    assert bool(ref.converged) and bool(che.converged)
    nrm = float(jnp.linalg.norm(ref.x))
    assert float(jnp.linalg.norm(ref.x - che.x)) < 2e-6 * nrm
    # pinned rows stay exactly zero
    assert float(jnp.abs(jnp.where(s.interior, 0.0, che.x)).max()) == 0.0
    # true residual meets the ReductionControl contract
    r_true = float(jnp.linalg.norm(rhs - apply_c(che.x)))
    r0 = float(jnp.linalg.norm(rhs))
    assert r_true <= max(1e-12, 1.2e-6 * r0)


def test_block_count_matches_theory():
    s = make_solver()
    apply_c = s._constrained(s.system)
    lo, hi = stencil_symbol_bounds(s.system.stencil)
    rng = np.random.default_rng(1)
    rhs = jnp.where(s.interior, jnp.asarray(rng.normal(size=s.shape)), 0.0)
    x0 = jnp.zeros(s.shape, jnp.float64)
    res = chebyshev_solve(apply_c, rhs, x0, lam_min=lo, lam_max=hi, degree=8)
    # guaranteed contraction per block -> predicted block count is an
    # upper bound for reaching 1e-6 relative
    q = block_contraction(lo, hi, 8)
    import math
    max_blocks = math.ceil(math.log(1e-6) / math.log(q))
    assert int(res.iterations) <= 8 * max_blocks


def test_coefficients_reject_bad_bounds():
    import pytest
    with pytest.raises(ValueError):
        chebyshev_coefficients(-1.0, 2.0, 4)
    with pytest.raises(ValueError):
        chebyshev_coefficients(3.0, 2.0, 4)
