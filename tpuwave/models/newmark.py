"""Newmark-beta time stepper (explicit central difference / average accel).

Exactly the scheme of the reference ``WaveNewmark`` (src/WaveNewmark.cpp;
documented WaveNewmark.hpp:24-37). One SPD solve per step:

  (M + beta dt^2 K) a^{n+1} = F^{n+1} - K z,
      z = u^n + dt v^n + dt^2 (1/2 - beta) a^n
  u^{n+1} = z + beta dt^2 a^{n+1}
  v^{n+1} = v^n + dt [(1-gamma) a^n + gamma a^{n+1}]

Acceleration Dirichlet data (reference solve_a, WaveNewmark.cpp:177-262):
  beta > 0:  a|b = (g(t^{n+1}) - z|b) / (beta dt^2)   (so u^{n+1}|b = g)
  beta = 0:  a|b = (g(t^{n+1}) - 2 g(t^n) + g(t^{n-1})) / dt^2

Consistent initial acceleration: M a^0 = F(0) - K u^0 with
a^0|b = (g(dt) - 2 g(0) + g(-dt)) / dt^2 (reference run(), :298-390).

The consistent-mass CG path gives numerical parity with the reference even
at beta = 0; a lumped-mass explicit fast path (no CG at all) is provided
for performance runs (see ``explicit_lumped_step``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuwave.models._scan import ScanMixin
from tpuwave.models.discretization import Discretization
from tpuwave.ops.operators import constrain_system
from tpuwave.solve.cg import pcg

__all__ = ["NewmarkSolver", "NewmarkState"]


class NewmarkState(NamedTuple):
    u: jax.Array
    v: jax.Array
    a: jax.Array


class NewmarkSolver(ScanMixin):
    method_name = "newmark"

    def __init__(self, disc: Discretization, *, lumped_explicit: bool = False,
                 precond: str = "jacobi", cheby_degree: int = 3):
        self.disc = disc
        p = disc.params
        self.beta = p.beta
        self.gamma = p.gamma
        self.dt = p.dt
        #: performance mode: diagonal (row-sum lumped) mass, no CG. Only
        #: meaningful at beta = 0; parity mode keeps consistent-mass CG.
        self.lumped_explicit = bool(lumped_explicit) and p.beta <= 1e-12
        #: tpuwave extension: rebuild K(t^{n+1}) inside each step (the
        #: elastic force in Newmark acts at t^{n+1}; see theta.py note)
        self.time_dep_c = p.time_dependent_c and p.c.time_dependent
        if precond == "auto":
            # mg when the a-system is stiffness-dominated on an
            # mg-eligible discretisation, jacobi otherwise (beta=0 ->
            # the a-system is M -> always jacobi)
            from tpuwave.solve.multigrid import auto_precond
            precond = auto_precond(disc, p.beta * p.dt * p.dt)
        #: resolved preconditioner choice ('jacobi'/'chebyshev'/'mg')
        self.precond = precond
        self.cheby_degree = int(cheby_degree)

        # matrix_a = M + beta dt^2 K (WaveNewmark.cpp:110-112)
        self.matrix_a = disc.mass.axpy(p.beta * p.dt * p.dt, disc.stiffness)
        self.diag_a = self.matrix_a.diagonal()
        self.prec_a = 1.0 / self.diag_a
        if precond == "chebyshev" and not self.time_dep_c:
            from tpuwave.solve.chebyshev import (ChebyshevPreconditioner,
                                                 estimate_lambda_max)
            lmax = estimate_lambda_max(self.matrix_a, self.prec_a,
                                       getattr(disc, "n_vec", disc.n_dofs))
            self.prec_a = ChebyshevPreconditioner(
                self.matrix_a, self.diag_a, lambda_max=lmax,
                degree=cheby_degree)
        elif precond == "mg":
            # geometric multigrid for the a-system (solve/multigrid.py) —
            # pays at large beta dt^2/h^2. With `Time Dependent C` the
            # hierarchy is frozen at the t=0 rms wave speed (a fixed SPD
            # V-cycle stays a valid preconditioner for the per-step-
            # varying system; see models/theta.py).
            from tpuwave.models.theta import _frozen_c_ref
            from tpuwave.solve.multigrid import gmg_flat_preconditioner
            self.prec_a = gmg_flat_preconditioner(
                disc, p.beta * p.dt * p.dt,
                c_ref=_frozen_c_ref(disc) if self.time_dep_c else None)
        elif precond not in ("jacobi", "chebyshev"):
            raise ValueError(f"Unknown preconditioner {precond!r}")

        self._step = jax.jit(self._step_impl)

    def method_params_suffix(self) -> str:
        from tpuwave.utils.naming import clean_double
        return "-gamma" + clean_double(self.gamma) + "-beta" + clean_double(self.beta)

    # ------------------------------------------------------------------
    def _boundary_accel(self, t, z=None):
        """Acceleration boundary values at t^{n+1} = t."""
        d, dt = self.disc, self.dt
        if self.beta > 1e-12:
            g_np1 = d.boundary_values(d.params.g, t)
            return (g_np1 - z) / (self.beta * dt * dt)
        g_p = d.boundary_values(d.params.g, t)
        g_0 = d.boundary_values(d.params.g, t - dt)
        g_m = d.boundary_values(d.params.g, t - 2.0 * dt)
        return (g_p - 2.0 * g_0 + g_m) / (dt * dt)

    def initial_state(self) -> NewmarkState:
        """Interpolate u0, v0 and solve M a0 = F(0) - K u0 (ref :292-390)."""
        d, dt = self.disc, self.dt
        u0 = d.interpolate(d.params.u0)
        v0 = d.interpolate(d.params.v0)

        rhs = -d.stiffness(u0)
        if d.has_forcing:
            rhs = rhs + d.load_vector(0.0)

        g_p = d.boundary_values(d.params.g, dt)
        g_0 = d.boundary_values(d.params.g, 0.0)
        g_m = d.boundary_values(d.params.g, -dt)
        a0_bc = (g_p - 2.0 * g_0 + g_m) / (dt * dt)

        if self.lumped_explicit:
            # diagonal-mass a0 so the whole trajectory is solve-free
            a0 = jnp.where(d.boundary_mask, a0_bc, rhs / d.lumped_mass)
            self.initial_iterations = 0
            return NewmarkState(u=u0, v=v0, a=a0)

        zeros = jnp.zeros_like(u0)
        apply_m, rhs_c, x0 = constrain_system(
            d.mass, d.mass_diag, d.boundary_mask, a0_bc, rhs, zeros)
        res = pcg(apply_m, rhs_c, x0, precond_inv_diag=1.0 / d.mass_diag)
        self.initial_iterations = int(res.iterations)
        return NewmarkState(u=u0, v=v0, a=res.x)

    def _step_impl(self, state: NewmarkState, t):
        d = self.disc
        dt, beta, gamma = self.dt, self.beta, self.gamma
        u_n, v_n, a_n = state.u, state.v, state.a

        # z = u^n + dt v^n + dt^2 (0.5 - beta) a^n  (WaveNewmark.cpp:123-126)
        z = u_n + dt * v_n + (dt * dt * (0.5 - beta)) * a_n
        if self.time_dep_c:
            k_np1 = d.stiffness_at(t)
            matrix_a = d.mass.axpy(beta * dt * dt, k_np1)
            diag_a = matrix_a.diagonal()
            # mg: frozen-coefficient V-cycle from __init__ (see theta.py)
            prec_a = self.prec_a if self.precond == "mg" else 1.0 / diag_a
            rhs = -k_np1(z)
        else:
            matrix_a, diag_a, prec_a = self.matrix_a, self.diag_a, self.prec_a
            rhs = -d.stiffness(z)
        if d.has_forcing:
            rhs = rhs + d.load_vector(t)

        if self.lumped_explicit:
            # diag-mass inverse; boundary rows overridden with the BC value
            a_bc = self._boundary_accel(t, z)
            a_np1 = jnp.where(d.boundary_mask, a_bc, rhs / d.lumped_mass)
            iters = jnp.asarray(0, jnp.int32)
        else:
            a_bc = self._boundary_accel(t, z)
            apply_a, rhs_c, x0 = constrain_system(
                matrix_a, diag_a, d.boundary_mask, a_bc, rhs, a_n)
            if self.time_dep_c and self.precond == "chebyshev":
                # per-step traced Gershgorin bound on the CONSTRAINED
                # operator (see theta.py note on boundary preservation)
                from tpuwave.solve.chebyshev import chebyshev_apply
                lmax = jnp.max(matrix_a.abs_row_sums() / diag_a)
                deg = self.cheby_degree

                def prec_a(r, _a=apply_a, _d=prec_a, _l=lmax):
                    return chebyshev_apply(_a, _d, r, lambda_max=_l,
                                           degree=deg)
            res = pcg(apply_a, rhs_c, x0, precond_inv_diag=prec_a)
            a_np1, iters = res.x, res.iterations

        # Newmark update (WaveNewmark.cpp:264-278)
        u_np1 = z + (beta * dt * dt) * a_np1
        v_np1 = v_n + dt * ((1.0 - gamma) * a_n + gamma * a_np1)

        new_state = NewmarkState(u=u_np1, v=v_np1, a=a_np1)
        info = {
            "iterations_1": iters,
            "iterations_2": jnp.asarray(0, jnp.int32),
            "norm_u": jnp.linalg.norm(u_np1),
            "norm_v": jnp.linalg.norm(v_np1),
        }
        return new_state, info

    def step(self, state: NewmarkState, t):
        return self._step(state, t)
