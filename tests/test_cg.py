"""CG solver: correctness, ReductionControl stopping semantics, warm start."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuwave.solve.cg import pcg


def make_spd(n, cond=50.0, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eigs = np.geomspace(1.0, cond, n)
    return q @ np.diag(eigs) @ q.T


def test_solves_spd():
    a = make_spd(40)
    rng = np.random.default_rng(1)
    x_true = rng.normal(size=40)
    b = a @ x_true
    res = pcg(lambda v: jnp.asarray(a) @ v, jnp.asarray(b), jnp.zeros(40))
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, rtol=1e-3, atol=1e-6)
    # residual satisfies the ReductionControl target
    r = b - a @ np.asarray(res.x)
    assert np.linalg.norm(r) <= max(1e-12, 1e-6 * np.linalg.norm(b))


def test_zero_iterations_when_converged():
    a = make_spd(10)
    x = np.ones(10)
    b = a @ x
    res = pcg(lambda v: jnp.asarray(a) @ v, jnp.asarray(b), jnp.asarray(x))
    assert int(res.iterations) == 0


def test_warm_start_fewer_iterations():
    a = make_spd(60, cond=200.0)
    rng = np.random.default_rng(2)
    x_true = rng.normal(size=60)
    b = a @ x_true
    cold = pcg(lambda v: jnp.asarray(a) @ v, jnp.asarray(b), jnp.zeros(60))
    warm = pcg(lambda v: jnp.asarray(a) @ v, jnp.asarray(b),
               jnp.asarray(x_true + 1e-5 * rng.normal(size=60)))
    assert int(warm.iterations) < int(cold.iterations)


def test_jacobi_preconditioner_helps():
    # strongly diagonally-scaled SPD system
    rng = np.random.default_rng(3)
    d = np.geomspace(1, 1e4, 80)
    a = np.diag(d) + 0.1 * np.eye(80)
    b = rng.normal(size=80)
    plain = pcg(lambda v: jnp.asarray(a) @ v, jnp.asarray(b), jnp.zeros(80))
    prec = pcg(lambda v: jnp.asarray(a) @ v, jnp.asarray(b), jnp.zeros(80),
               precond_inv_diag=jnp.asarray(1.0 / np.diag(a)))
    assert int(prec.iterations) < int(plain.iterations)
    np.testing.assert_allclose(np.asarray(prec.x), np.linalg.solve(a, b),
                               rtol=1e-4, atol=1e-8)


def test_max_iter_cap():
    a = make_spd(50, cond=1e8, seed=4)
    b = np.ones(50)
    res = pcg(lambda v: jnp.asarray(a) @ v, jnp.asarray(b), jnp.zeros(50),
              max_iter=3)
    assert int(res.iterations) == 3
    assert not bool(res.converged)
