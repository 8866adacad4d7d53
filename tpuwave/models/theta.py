"""theta-method time stepper (Forward Euler / Crank-Nicolson / Backward Euler).

First-order-system reformulation of the wave equation, exactly the scheme of
the reference ``WaveTheta`` (src/WaveTheta.cpp; update equations documented
in WaveTheta.hpp:28-44). Per step, two SPD solves:

  (M + (theta dt)^2 K) u^{n+1} = M u^n - dt^2 th(1-th) K u^n + dt M v^n
                                 + th dt^2 (th f^{n+1} + (1-th) f^n)
  M v^{n+1} = M v^n - dt (1-th) K u^n - dt th K u^{n+1}
                                 + dt (th f^{n+1} + (1-th) f^n)

with Dirichlet data u|dOmega = g(t^{n+1}) and v|dOmega = dg/dt(t^{n+1})
imposed by symmetric elimination (reference solve_u/solve_v,
WaveTheta.cpp:251-339). Both solves are consistent-mass CG, warm-started —
even for theta = 0, matching the reference (SURVEY.md 'critical
implementation fact').

The whole step body is ONE jit program: rhs assembly, BC elimination, and
both CG solves fuse into a single XLA computation per step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpuwave.models._scan import ScanMixin
from tpuwave.models.discretization import Discretization
from tpuwave.ops.operators import constrain_system
from tpuwave.solve.cg import pcg

__all__ = ["ThetaSolver", "ThetaState"]


def _frozen_c_ref(disc) -> float:
    """Reference constant for the frozen-coefficient mg hierarchy under
    `Time Dependent C`: rms of c(x, y, 0) over the DoF support points."""
    import numpy as np
    x = np.asarray(disc.dof_coords[:, 0], dtype=float)
    y = np.asarray(disc.dof_coords[:, 1], dtype=float)
    cv = np.broadcast_to(
        np.asarray(disc.params.c.evaluate(x, y, 0.0), dtype=float), x.shape)
    return float(np.sqrt(np.mean(cv ** 2)))


class ThetaState(NamedTuple):
    u: jax.Array
    v: jax.Array
    #: K(t^n) payload (``Discretization.stiffness_payload_at``) carried
    #: across steps when `Time Dependent C` is enabled, else None: the
    #: K^{n+1} built on one step is the next step's K^n, halving the
    #: per-step operator builds.
    k_payload: Optional[jax.Array] = None


class ThetaSolver(ScanMixin):
    method_name = "theta"

    def __init__(self, disc: Discretization, *, precond: str = "jacobi",
                 cheby_degree: int = 3):
        self.disc = disc
        p = disc.params
        self.theta = p.theta
        self.dt = p.dt
        #: tpuwave extension: rebuild K(t) inside each step from c(x, y, t)
        #: (see Params.time_dependent_c). The u-system matrix then varies
        #: per step, so its diagonal/preconditioner are traced per step too.
        self.time_dep_c = p.time_dependent_c and p.c.time_dependent
        if precond == "auto":
            # mg when the u-system is stiffness-dominated on an
            # mg-eligible discretisation, jacobi otherwise
            from tpuwave.solve.multigrid import auto_precond
            precond = auto_precond(disc, (p.theta * p.dt) ** 2)
        #: resolved preconditioner choice ('jacobi'/'chebyshev'/'mg')
        self.precond = precond
        self.cheby_degree = int(cheby_degree)

        # matrix_u = M + (theta dt)^2 K; matrix_v = M (WaveTheta.cpp:110-116),
        # merged into single fused element operators.
        self.matrix_u = disc.mass.axpy((p.theta * p.dt) ** 2, disc.stiffness)
        self.matrix_v = disc.mass
        self.diag_u = self.matrix_u.diagonal()
        self.diag_v = disc.mass_diag
        self.prec_u = 1.0 / self.diag_u
        self.prec_v = 1.0 / self.diag_v
        if precond == "chebyshev" and not self.time_dep_c:
            # AMG stand-in for the stiffness-dominated u-system
            # (solve/chebyshev.py); the mass-dominated v-system keeps Jacobi
            from tpuwave.solve.chebyshev import (ChebyshevPreconditioner,
                                                 estimate_lambda_max)
            lmax = estimate_lambda_max(self.matrix_u, self.prec_u,
                                       getattr(disc, "n_vec", disc.n_dofs))
            self.prec_u = ChebyshevPreconditioner(
                self.matrix_u, self.diag_u, lambda_max=lmax,
                degree=cheby_degree)
        elif precond == "mg":
            # geometric multigrid V-cycle for the u-system: dt-independent
            # CG iteration counts in the large-dt (stiffness-dominated)
            # regime (solve/multigrid.py; structured discretisations).
            # With `Time Dependent C` the hierarchy is built ONCE from the
            # rms wave speed at t = 0 (frozen coefficient): a fixed SPD
            # V-cycle remains a valid CG preconditioner for the per-step-
            # varying SPD system — CG re-converges every solve, only the
            # iteration count degrades gracefully as |c(t) - c_ref| grows
            # (measured in tests/test_tdep_c.py).
            from tpuwave.solve.multigrid import gmg_flat_preconditioner
            self.prec_u = gmg_flat_preconditioner(
                disc, (p.theta * p.dt) ** 2,
                c_ref=_frozen_c_ref(disc) if self.time_dep_c else None)
        elif precond not in ("jacobi", "chebyshev"):
            raise ValueError(f"Unknown preconditioner {precond!r}")

        self._step = jax.jit(self._step_impl)

    def method_params_suffix(self) -> str:
        from tpuwave.utils.naming import clean_double
        return "-theta" + clean_double(self.theta)

    # ------------------------------------------------------------------
    def initial_state(self) -> ThetaState:
        d = self.disc
        u0 = d.interpolate(d.params.u0)
        v0 = d.interpolate(d.params.v0)
        pay = d.stiffness_payload_at(0.0) if self.time_dep_c else None
        return ThetaState(u=u0, v=v0, k_payload=pay)

    def _step_impl(self, state: ThetaState, t):
        """Advance from t^n = t - dt to t^{n+1} = t (time already incremented,
        as in the reference run loop WaveTheta.cpp:374-375)."""
        d = self.disc
        th, dt = self.theta, self.dt
        u_n, v_n = state.u, state.v

        pay_np1 = None
        if self.time_dep_c:
            # theta-weighted evaluation of the time-varying operator:
            # K^n acts on the explicit terms, K^{n+1} on the implicit ones.
            # K^n is the payload CARRIED in the scan state (built as
            # K^{n+1} on the previous step), so only one operator build
            # happens per step; the None fallback keeps external callers
            # that construct a bare ThetaState(u, v) working.
            if state.k_payload is not None:
                k_n = d.stiffness_from_payload(state.k_payload)
            else:
                k_n = d.stiffness_at(t - dt)
            pay_np1 = d.stiffness_payload_at(t)
            k_np1 = d.stiffness_from_payload(pay_np1)
            matrix_u = d.mass.axpy((th * dt) ** 2, k_np1)
            diag_u = matrix_u.diagonal()
            # mg: the frozen-coefficient V-cycle built in __init__ stays
            # the preconditioner for every (varying) per-step system
            prec_u = self.prec_u if self.precond == "mg" else 1.0 / diag_u
            ku = k_n(u_n)
        else:
            k_np1 = d.stiffness
            matrix_u, diag_u, prec_u = self.matrix_u, self.diag_u, self.prec_u
            ku = d.stiffness(u_n)

        mu = d.mass(u_n)
        mv = d.mass(v_n)

        if d.has_forcing:
            f_avg = th * d.load_vector(t) + (1.0 - th) * d.load_vector(t - dt)
        else:
            f_avg = None

        # ---- u system (WaveTheta.cpp:119-186, 251-294) -------------------
        rhs_u = mu - (dt * dt * th * (1.0 - th)) * ku + dt * mv
        if f_avg is not None:
            rhs_u = rhs_u + (th * dt * dt) * f_avg

        g_np1 = d.boundary_values(d.params.g, t)
        apply_u, rhs_u_c, x0_u = constrain_system(
            matrix_u, diag_u, d.boundary_mask, g_np1, rhs_u, u_n)
        if self.time_dep_c and self.precond == "chebyshev":
            # per-step spectrum bound: Gershgorin on D^-1 A with a TRACED
            # lambda_max (chebyshev_apply). Built on the CONSTRAINED
            # operator so the preconditioner preserves the pinned
            # boundary subspace (the Gershgorin bound of the
            # unconstrained matrix still majorises it: constrained
            # boundary rows are pure diagonal, interior rows only lose
            # entries).
            from tpuwave.solve.chebyshev import chebyshev_apply
            lmax = jnp.max(matrix_u.abs_row_sums() / diag_u)
            deg = self.cheby_degree

            def prec_u(r, _a=apply_u, _d=prec_u, _l=lmax):
                return chebyshev_apply(_a, _d, r, lambda_max=_l, degree=deg)
        res_u = pcg(apply_u, rhs_u_c, x0_u, precond_inv_diag=prec_u)
        u_np1 = res_u.x

        # ---- v system (WaveTheta.cpp:188-249, 296-339) -------------------
        rhs_v = mv - (dt * (1.0 - th)) * ku - (dt * th) * k_np1(u_np1)
        if f_avg is not None:
            rhs_v = rhs_v + dt * f_avg

        dg_np1 = d.boundary_values(d.params.dgdt, t)
        apply_v, rhs_v_c, x0_v = constrain_system(
            self.matrix_v, self.diag_v, d.boundary_mask, dg_np1, rhs_v, v_n)
        res_v = pcg(apply_v, rhs_v_c, x0_v, precond_inv_diag=self.prec_v)
        v_np1 = res_v.x

        new_state = ThetaState(u=u_np1, v=v_np1, k_payload=pay_np1)
        info = {
            "iterations_1": res_u.iterations,
            "iterations_2": res_v.iterations,
            "norm_u": jnp.linalg.norm(u_np1),
            "norm_v": jnp.linalg.norm(v_np1),
        }
        return new_state, info

    def step(self, state: ThetaState, t):
        return self._step(state, t)
