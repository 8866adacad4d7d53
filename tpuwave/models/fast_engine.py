"""Product-surface adapters for the fast grid-stencil engines.

The reference's mains run its one (best) engine directly
(/root/reference/src/main-newmark.cpp:24-169, src/main-theta.cpp:23-152).
tpuwave's CLI equivalents historically always built the gather-path parity
``Discretization``; the stencil/Pallas fast paths were Python-API-only and
restricted to homogeneous boundaries and zero forcing.

This module closes both gaps: :class:`FastThetaSolver` and
:class:`FastNewmarkSolver` implement the EXACT parity step algebra of
models/theta.py / models/newmark.py — symmetric Dirichlet elimination with
time-dependent g (reference solve_u/solve_v WaveTheta.cpp:251-339), the
derived acceleration boundary formulas (WaveNewmark.cpp:177-262), the
theta-weighted quadrature-consistent forcing (WaveTheta.cpp:119-186), the
consistent a0 solve (WaveNewmark.cpp:298-390), and the same
ReductionControl stopping contract — but on the constant 7-point grid
stencils of ops/stencil.py instead of the gather -> batched-matvec ->
segment_sum path (measured ~11x faster per operator apply). Driven
presets (sine-membrane, oscillating-boundary, square-pulsing) therefore
run at grid-stencil speed with trajectories matching the parity engine to
solver tolerance.

State vectors stay FLAT (n_dofs,) so the run driver's diagnostics/IO
(models/runner.py, via the parity ``Discretization``) work unchanged; the
steppers reshape to the (ny+1, nx+1) vertex grid internally (free: the P1
DoF numbering is row-major over the grid, core/mesh.py:12).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpuwave.models._scan import ScanMixin
from tpuwave.models.discretization import Discretization
from tpuwave.models.fast import FastWaveSolver
from tpuwave.solve.cg import pcg

__all__ = ["FastGridState", "FastThetaSolver", "FastNewmarkSolver",
           "fast_engine_ineligible_reason", "make_fast_solver"]


class FastGridState(NamedTuple):
    u: jax.Array   # flat (n_dofs,)
    v: jax.Array
    a: jax.Array   # consistent acceleration (Newmark); zeros for theta


def fast_engine_ineligible_reason(disc) -> Optional[str]:
    """None when ``disc`` can run on the grid-stencil engine, else why not.

    Eligibility = the compile-time-constant-stencil set: structured
    rectangle triangulation, P1 elements, spatially-and-temporally
    constant wave speed (`Time Dependent C` runs route to the parity
    engine, whose per-step operator rebuild supports them).
    """
    from tpuwave.core.mesh import StructuredTriMesh
    p = disc.params
    if type(disc) is not Discretization or \
            type(disc.mesh) is not StructuredTriMesh:
        return "mesh is not a generated structured rectangle"
    if p.r != 1:
        return f"fast engine is P1-only (R = {p.r})"
    if p.c.constant_value is None:
        return "wave speed C is not a constant expression"
    if p.time_dependent_c:
        return "Time Dependent C needs the per-step operator rebuild of " \
               "the parity engine"
    if min(p.nel) < 2:
        return "mesh has no interior band (Nel < 2)"
    return None


def make_fast_solver(disc: Discretization, family: str, *,
                     precond: str = "jacobi", cheby_degree: int = 3):
    """Factory used by the CLI ``--engine fast|auto`` routing."""
    if family == "theta":
        return FastThetaSolver(disc, precond=precond,
                               cheby_degree=cheby_degree)
    if family == "newmark":
        return FastNewmarkSolver(disc, precond=precond,
                                 cheby_degree=cheby_degree)
    raise ValueError(f"unknown solver family {family!r}")


class _FastEngineBase(ScanMixin):
    """Shared plumbing: operators, boundary/forcing data, elimination."""

    def __init__(self, disc: Discretization, *, precond: str = "jacobi",
                 cheby_degree: int = 3):
        reason = fast_engine_ineligible_reason(disc)
        if reason is not None:
            raise ValueError(f"fast engine unavailable: {reason}")
        self.disc = disc
        p = disc.params
        self.dt = p.dt
        self.fs = FastWaveSolver(
            p.nel, p.geometry, p.dt, c=float(p.c.constant_value),
            scheme=self.method_name, beta=p.beta, gamma=p.gamma,
            theta=p.theta, lumped=False, dtype=disc.dtype)
        fs = self.fs
        self.dtype = fs.dtype
        self._max_iter = 10000 if self.dtype == jnp.float64 else 2000

        # problem data as jittable grid-plane evaluators
        self._g = p.g
        self._dgdt = p.dgdt
        self._f = p.f if not p.f.is_zero else None

        # preconditioner for the implicit system (M + coef K); the theta
        # v-system is the bare mass — mesh-independent conditioning,
        # Jacobi always (models/fast.py::_theta_step note)
        coef = (p.beta * p.dt * p.dt if self.method_name == "newmark"
                else (p.theta * p.dt) ** 2)
        if precond == "auto":
            from tpuwave.solve.multigrid import auto_precond
            precond = auto_precond(disc, coef)
        self.precond = precond
        if precond == "jacobi":
            self._prec_sys = 1.0 / fs.system.stencil[1][1]
        elif precond == "mg":
            self._prec_sys = fs.gmg_preconditioner()
        elif precond == "chebyshev":
            # AMG stand-in with the ANALYTIC stencil-symbol bound for
            # lambda_max(D^-1 A) (solve/cheby_iter.py) — no power
            # iteration needed on the constant stencil
            from tpuwave.solve.chebyshev import ChebyshevPreconditioner
            from tpuwave.solve.cheby_iter import stencil_symbol_bounds
            hi = stencil_symbol_bounds(fs.system.stencil)[1]
            diag = fs.system.stencil[1][1]
            self._prec_sys = ChebyshevPreconditioner(
                fs.system, jnp.asarray(diag, self.dtype),
                lambda_max=hi / diag, degree=cheby_degree)
        else:
            raise ValueError(f"Unknown preconditioner {precond!r}")
        self._prec_mass = 1.0 / fs.mass.stencil[1][1]

        self._step = jax.jit(self._step_impl)

    # -- helpers -------------------------------------------------------
    def _plane(self, expr, t):
        """expr(x, y, t) on the full vertex grid (only boundary entries
        are ever consumed; interior values are masked away). Coordinates
        are iota-generated inside the trace — no captured HBM constants."""
        if expr.is_zero:
            return jnp.zeros(self.fs.shape, self.dtype)
        cv = expr.constant_value
        if cv is not None:
            return jnp.full(self.fs.shape, cv, self.dtype)
        xs, ys = self.fs.grid_coords()
        return jnp.broadcast_to(jnp.asarray(
            expr.evaluate(xs, ys, t), self.dtype), self.fs.shape)

    def _constrain(self, op, rhs, g_plane, x_prev, *, g_zero: bool):
        """Grid-plane form of ops.operators.constrain_system (deal.II
        apply_boundary_values with eliminate_columns=true): pinned
        diagonal boundary rows, rhs lifted by -A(g 1_b), warm start with
        boundary entries set to g. ``g_zero`` statically skips the lift
        apply for homogeneous data."""
        fs = self.fs
        diag = op.stencil[1][1]
        if g_zero:
            def apply_c(w):
                return jnp.where(fs.interior,
                                 op(jnp.where(fs.interior, w, 0.0)), diag * w)
            rhs_c = jnp.where(fs.interior, rhs, 0.0)
            x0 = jnp.where(fs.interior, x_prev, 0.0)
            return apply_c, rhs_c, x0
        g_ext = jnp.where(fs.boundary, g_plane, 0.0)

        def apply_c(w):
            return jnp.where(fs.interior,
                             op(jnp.where(fs.interior, w, 0.0)), diag * w)
        rhs_c = jnp.where(fs.interior, rhs - op(g_ext), diag * g_ext)
        x0 = jnp.where(fs.boundary, g_ext, x_prev)
        return apply_c, rhs_c, x0

    def _abs_tol(self, rhs, x0, op):
        return self.fs._solve_abs_tol(rhs, x0, op)

    def _solve(self, op, rhs, g_plane, x_prev, precond, *, g_zero: bool):
        apply_c, rhs_c, x0 = self._constrain(op, rhs, g_plane, x_prev,
                                             g_zero=g_zero)
        return pcg(apply_c, rhs_c, x0, precond_inv_diag=precond,
                   abs_tol=self._abs_tol(rhs_c, x0, op),
                   max_iter=self._max_iter, reduction=self.fs.cg_reduction)

    def step(self, state: FastGridState, t):
        return self._step(state, t)


class FastThetaSolver(_FastEngineBase):
    """theta-method on the grid stencils — parity algebra of
    models/theta.py (reference WaveTheta.cpp:119-339) at fast-path speed,
    including time-dependent Dirichlet g and theta-weighted forcing."""

    method_name = "theta"

    def method_params_suffix(self) -> str:
        from tpuwave.utils.naming import clean_double
        return "-theta" + clean_double(self.fs.theta)

    def initial_state(self) -> FastGridState:
        d = self.disc
        u0 = jnp.asarray(d.interpolate(d.params.u0), self.dtype)
        v0 = jnp.asarray(d.interpolate(d.params.v0), self.dtype)
        return FastGridState(u=u0, v=v0, a=jnp.zeros_like(u0))

    def _step_impl(self, state: FastGridState, t):
        fs = self.fs
        dt, th = self.dt, fs.theta
        u = state.u.reshape(fs.shape)
        v = state.v.reshape(fs.shape)
        mu, ku, mv = fs.mass(u), fs.stiff(u), fs.mass(v)

        if self._f is not None:
            f_avg = (th * fs.grid_load(self._f.evaluate, t)
                     + (1.0 - th) * fs.grid_load(self._f.evaluate, t - dt))
        else:
            f_avg = None

        # u system (WaveTheta.cpp:119-186, 251-294)
        rhs_u = mu - (dt * dt * th * (1.0 - th)) * ku + dt * mv
        if f_avg is not None:
            rhs_u = rhs_u + (th * dt * dt) * f_avg
        res_u = self._solve(fs.system, rhs_u, self._plane(self._g, t), u,
                            self._prec_sys, g_zero=self._g.is_zero)
        u_new = res_u.x.astype(self.dtype)

        # v system (WaveTheta.cpp:188-249, 296-339)
        rhs_v = mv - (dt * (1.0 - th)) * ku - (dt * th) * fs.stiff(u_new)
        if f_avg is not None:
            rhs_v = rhs_v + dt * f_avg
        res_v = self._solve(fs.mass, rhs_v, self._plane(self._dgdt, t), v,
                            self._prec_mass, g_zero=self._dgdt.is_zero)
        v_new = res_v.x.astype(self.dtype)

        new_state = FastGridState(u=u_new.reshape(-1), v=v_new.reshape(-1),
                                  a=state.a)
        info = {
            "iterations_1": res_u.iterations,
            "iterations_2": res_v.iterations,
            "norm_u": jnp.linalg.norm(u_new),
            "norm_v": jnp.linalg.norm(v_new),
        }
        return new_state, info


class FastNewmarkSolver(_FastEngineBase):
    """Newmark-beta on the grid stencils — parity algebra of
    models/newmark.py (reference WaveNewmark.cpp:116-390) at fast-path
    speed: consistent-mass a-solve (also at beta = 0), derived
    acceleration boundary formulas, consistent a0, per-step forcing."""

    method_name = "newmark"

    def method_params_suffix(self) -> str:
        from tpuwave.utils.naming import clean_double
        return ("-gamma" + clean_double(self.fs.gamma)
                + "-beta" + clean_double(self.fs.beta))

    # -- acceleration boundary data (WaveNewmark.cpp:177-262) ----------
    def _accel_bc_plane(self, t, z):
        fs, dt = self.fs, self.dt
        if fs.beta > 1e-12:
            return (self._plane(self._g, t) - z) / (fs.beta * dt * dt)
        g_p = self._plane(self._g, t)
        g_0 = self._plane(self._g, t - dt)
        g_m = self._plane(self._g, t - 2.0 * dt)
        return (g_p - 2.0 * g_0 + g_m) / (dt * dt)

    def initial_state(self) -> FastGridState:
        """u0, v0 interpolation + consistent M a0 = F(0) - K u0 with
        a0|b = (g(dt) - 2 g(0) + g(-dt)) / dt^2 (reference :298-390)."""
        d, fs, dt = self.disc, self.fs, self.dt
        u0 = jnp.asarray(d.interpolate(d.params.u0), self.dtype)
        v0 = jnp.asarray(d.interpolate(d.params.v0), self.dtype)
        u0g = u0.reshape(fs.shape)
        rhs = -fs.stiff(u0g)
        if self._f is not None:
            rhs = rhs + fs.grid_load(self._f.evaluate, 0.0)
        g_p = self._plane(self._g, dt)
        g_0 = self._plane(self._g, 0.0)
        g_m = self._plane(self._g, -dt)
        a0_bc = (g_p - 2.0 * g_0 + g_m) / (dt * dt)
        res = self._solve(fs.mass, rhs, a0_bc, jnp.zeros_like(u0g),
                          self._prec_mass, g_zero=self._g.is_zero)
        self.initial_iterations = int(res.iterations)
        return FastGridState(u=u0, v=v0,
                             a=res.x.astype(self.dtype).reshape(-1))

    def _step_impl(self, state: FastGridState, t):
        fs = self.fs
        dt, beta, gamma = self.dt, fs.beta, fs.gamma
        u = state.u.reshape(fs.shape)
        v = state.v.reshape(fs.shape)
        a = state.a.reshape(fs.shape)

        # z = u + dt v + dt^2 (1/2 - beta) a  (WaveNewmark.cpp:123-126)
        z = u + dt * v + (dt * dt * (0.5 - beta)) * a
        rhs = -fs.stiff(z)
        if self._f is not None:
            rhs = rhs + fs.grid_load(self._f.evaluate, t)

        a_bc = self._accel_bc_plane(t, z)
        res = self._solve(fs.system, rhs, a_bc, a, self._prec_sys,
                          g_zero=self._g.is_zero)
        a_new = res.x.astype(self.dtype)

        u_new = z + (beta * dt * dt) * a_new
        v_new = v + dt * ((1.0 - gamma) * a + gamma * a_new)
        new_state = FastGridState(u=u_new.reshape(-1).astype(self.dtype),
                                  v=v_new.reshape(-1).astype(self.dtype),
                                  a=a_new.reshape(-1))
        info = {
            "iterations_1": res.iterations,
            "iterations_2": jnp.asarray(0, jnp.int32),
            "norm_u": jnp.linalg.norm(u_new),
            "norm_v": jnp.linalg.norm(v_new),
        }
        return new_state, info
