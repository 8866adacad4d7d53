"""Chebyshev preconditioner: correctness + iteration reduction on the
stiffness-dominated theta u-system (the case where the reference needs
AMG)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuwave.models.discretization import Discretization
from tpuwave.models.theta import ThetaSolver
from tpuwave.ops.operators import constrain_system
from tpuwave.solve.cg import pcg
from tpuwave.solve.chebyshev import (ChebyshevPreconditioner,
                                     estimate_lambda_max)
from tpuwave.utils.params import load_params

from tests.test_schemes import standing_mode


def stiff_dominated_system(nel=40, dt=0.2):
    """CN u-system with theta*dt/h >> 1: cond ~ 1 + (theta dt)^2 lam_K."""
    p = load_params(standing_mode(Nel=str(nel), Dt=str(dt), T=str(dt)))
    d = Discretization(p)
    s = ThetaSolver(d)
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.normal(size=d.n_dofs))
    g = jnp.zeros(d.n_dofs)
    x_prev = jnp.zeros(d.n_dofs)
    apply_c, rhs_c, x0 = constrain_system(
        s.matrix_u, s.diag_u, d.boundary_mask, g, rhs, x_prev)
    return s, d, apply_c, rhs_c, x0


def test_lambda_max_estimate_sane():
    s, d, apply_c, rhs_c, x0 = stiff_dominated_system()
    lmax = estimate_lambda_max(s.matrix_u, 1.0 / s.diag_u, d.n_dofs)
    # D^{-1}A of an SPD FEM operator: lambda_max in (1, ~2.5], inflated 1.2x
    assert 1.0 < lmax < 4.0


def test_chebyshev_cg_fewer_iterations_same_solution():
    s, d, apply_c, rhs_c, x0 = stiff_dominated_system()
    jac = pcg(apply_c, rhs_c, x0, precond_inv_diag=1.0 / s.diag_u)

    lmax = estimate_lambda_max(s.matrix_u, 1.0 / s.diag_u, d.n_dofs)
    cheb = ChebyshevPreconditioner(s.matrix_u, s.diag_u, lambda_max=lmax,
                                   degree=4)
    che = pcg(apply_c, rhs_c, x0, precond_inv_diag=cheb)

    assert bool(jac.converged) and bool(che.converged)
    # same solution to CG tolerance
    nrm = float(jnp.linalg.norm(jac.x))
    assert float(jnp.linalg.norm(jac.x - che.x)) < 1e-4 * nrm
    # the polynomial preconditioner cuts the ITERATION count (and with it
    # the number of global psum reductions — the latency cost at scale)
    # by ~40-50% on this system (measured: 65 -> 36 at degree 4)
    assert int(che.iterations) < 0.65 * int(jac.iterations), \
        (int(jac.iterations), int(che.iterations))


def test_theta_solver_chebyshev_mode_runs():
    # stiffness-dominated regime (theta*dt/h ~ 4): where chebyshev pays
    p = load_params(standing_mode(Nel="40", Dt="0.2", T="1.0"))
    d = Discretization(p)
    s_j = ThetaSolver(d)
    s_c = ThetaSolver(d, precond="chebyshev")
    st_j = s_j.initial_state()
    st_c = s_c.initial_state()
    t = 0.0
    while t < p.t_final:
        t += p.dt
        st_j, info_j = s_j.step(st_j, t)
        st_c, info_c = s_c.step(st_c, t)
    nrm = float(jnp.linalg.norm(st_j.u))
    assert float(jnp.linalg.norm(st_j.u - st_c.u)) < 1e-4 * nrm
    # fewer or equal u-solve iterations (mass-dominated cases may tie)
    assert int(info_c["iterations_1"]) <= int(info_j["iterations_1"]) + 1


def test_unknown_precond_raises():
    p = load_params(standing_mode(Nel="8"))
    d = Discretization(p)
    with pytest.raises(ValueError, match="preconditioner"):
        ThetaSolver(d, precond="amg")
