"""P2 (R = 2) product-surface fast engine on the plane-stencil operators.

The reference's one engine is degree-generic — ``FE_SimplexP<dim>(r)`` at
/root/reference/src/WaveEquationBase.cpp:74-84 serves r in {1, 2}
identically, including driven Dirichlet data, forcing, and the derived
acceleration boundary formulas (WaveNewmark.cpp:116-262,
WaveTheta.cpp:119-339). tpuwave's P2 fast paths historically covered only
homogeneous BCs / zero forcing (models/fast_p2.py), so ``--engine auto``
dropped every R=2 run onto the gather-path parity engine.

This module closes that gap: :class:`FastP2ThetaSolver` and
:class:`FastP2NewmarkSolver` implement the EXACT parity step algebra of
models/theta.py / models/newmark.py on the four P2 DoF planes
(ops/stencil_p2.py) — symmetric Dirichlet elimination with time-dependent
g on vertex AND edge-midpoint boundary planes, the three derived
acceleration boundary formulas, the quadrature-consistent P2 load (r+1
rule = gauss_simplex(3)), the consistent a0 solve, and the same
ReductionControl stopping contract — with the full wave-speed class
(constant, spatially varying via :class:`P2VarcoefStencil`, and
`Time Dependent C` with the K(t) scale planes rebuilt inside the jitted
step, the theta family carrying K(t^n) across steps).

State vectors stay FLAT (n_dofs,) in the core.mesh numbering (vertices,
h/v/d edge midpoints — pure reshapes to planes), so the run driver's
diagnostics/IO work unchanged through either the parity
``Discretization`` or the O(grid) :class:`P2GridDiagnostics`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuwave.core.mesh import FeSpace, StructuredTriMesh
from tpuwave.core.quadrature import gauss_simplex
from tpuwave.models._scan import ScanMixin
from tpuwave.models.fast_engine import FastGridState
from tpuwave.models.p2_diag import (P2GridDiagnostics, p2_interpolate_flat,
                                    p2_plane_coords)
from tpuwave.ops.assembly import element_mass_class, element_stiffness_class
from tpuwave.ops.stencil_p2 import (_P2_POSITIONS, _PLANES, P2PlaneStencil,
                                    P2VarcoefStencil, p2_plane_shapes,
                                    p2_varcoef_data, planes_to_flat)
from tpuwave.solve.cg import pcg
from tpuwave.solve.multigrid import _p2_interior_flat
from tpuwave.utils.params import Params

__all__ = ["FastP2ThetaSolver", "FastP2NewmarkSolver"]


class _P2Op(NamedTuple):
    """Flat P2 operator triple: apply(u), assembled flat diagonal, and an
    upper eigenvalue bound (f32 backward-error floor / Chebyshev)."""
    apply: object
    diag: object
    lam_hi: object


def _gershgorin_plane_stencil(op: P2PlaneStencil) -> float:
    """max over output planes of sum |coeff| — a Gershgorin row-sum bound
    on the constant P2 block-stencil (host float)."""
    sums = {p: 0.0 for p in _PLANES}
    for (pa, _pb, _ox, _oy), c in op.coeffs.items():
        sums[pa] += abs(c)
    return max(sums.values())


class _FastP2EngineBase(ScanMixin):
    """Shared plumbing: plane operators, boundary/forcing data,
    symmetric Dirichlet elimination on the flat P2 vector."""

    def __init__(self, problem, *, precond: str = "jacobi",
                 cheby_degree: int = 3, use_pallas=None,
                 pallas_block_rows: int = 64,
                 pallas_interpret: bool = False):
        if isinstance(problem, Params):
            disc = P2GridDiagnostics(problem)
        else:
            disc = problem
        self.disc = disc
        p = disc.params
        if p.r != 2:
            raise ValueError("FastP2*Solver needs R = 2")
        self.mesh = StructuredTriMesh(p.nel, p.geometry)
        self.space = FeSpace(self.mesh, 2)
        self.nx, self.ny = self.mesh.nx, self.mesh.ny
        self.dtype = disc.dtype
        self.dt = p.dt
        self.theta, self.beta, self.gamma = p.theta, p.beta, p.gamma
        self.n_dofs = self.space.n_dofs
        self._max_iter = 10000 if self.dtype == jnp.float64 else 2000

        c_const = p.c.constant_value
        self.time_dep_c = p.time_dependent_c and p.c.time_dependent
        if self.time_dep_c:
            self._c_mode = "tdep"
        elif c_const is None:
            self._c_mode = "varcoef"
        else:
            self._c_mode = "const"
        self._c_eval = p.c.evaluate
        self._g = p.g
        self._dgdt = p.dgdt
        self._f = p.f if not p.f.is_zero else None

        # NB every O(n_dofs) array this engine needs (interior/boundary
        # masks, assembled diagonals, varcoef scale planes) is built
        # INSIDE the trace from iota / jnp.full — a concrete array
        # closed over by the jitted step lowers to an HLO literal, and
        # at the 4096^2 bench scale (67.1M DoF) the ~1.2 GB of literals
        # exceed the axon remote-compile request limit (measured
        # HTTP 413). Hence the property/thunk structure below.
        quad = gauss_simplex(3)                       # assembly rule r + 1
        self.mass = P2PlaneStencil(
            self.space, element_mass_class(self.space, quad), self.dtype)
        self._mass_lam = _gershgorin_plane_stencil(self.mass)

        #: system coefficient: M + coef * K
        self.coef = (p.beta * p.dt * p.dt if self.method_name == "newmark"
                     else (p.theta * p.dt) ** 2)

        self._k_unit_lam = _gershgorin_plane_stencil(P2PlaneStencil(
            self.space, element_stiffness_class(self.space, quad, 1.0),
            self.dtype))
        if self._c_mode == "const":
            self._stiff = P2PlaneStencil(
                self.space,
                element_stiffness_class(self.space, quad,
                                        float(c_const) ** 2), self.dtype)
            self._stiff_lam = _gershgorin_plane_stencil(self._stiff)
            self._sys_stencil = self.mass.axpy(self.coef, self._stiff) \
                if self.coef != 0.0 else None
            self._sys_lam = (_gershgorin_plane_stencil(self._sys_stencil)
                             if self._sys_stencil is not None else None)
        else:
            # varcoef/tdep: the operator is rebuilt from iota-generated
            # scale planes INSIDE each step trace (for varcoef the c(x,y)
            # evaluation repeats per step — the price of keeping the HLO
            # free of O(n_dofs) literals; see the __init__ note)
            self._stiff = None
            self._sys_stencil = None
            self._sys_lam = None

        # preconditioner for the implicit system (the theta v-system is
        # the bare mass — mesh-independent conditioning, Jacobi always)
        # fused canvas solve path: the state is laid out as four equal
        # zero-padded canvases for the DURATION OF EACH SOLVE and every
        # CG matvec (and the mg smoothing applies) runs through the
        # Mosaic block-stencil kernel (ops/pallas_p2.py). rhs assembly
        # and the boundary lift stay XLA (one unconstrained apply per
        # solve — the matvecs dominate). Constant-coefficient operators
        # only; auto-on for f32 on an accelerator like the P1 engine.
        self._pblock = int(pallas_block_rows)
        self._pinterp = bool(pallas_interpret)
        if use_pallas is None:
            try:
                on_accel = jax.devices()[0].platform not in ("cpu",)
            except Exception:
                on_accel = False
            use_pallas = (on_accel and self.dtype == jnp.float32
                          and self._c_mode == "const")
        self._use_pallas = bool(use_pallas) and self._c_mode == "const"
        if self._use_pallas:
            from tpuwave.ops.stencil_p2 import canvas_shape
            self._cshape = canvas_shape(self.nx, self.ny,
                                        row_multiple=self._pblock,
                                        col_multiple=128)
            hc = self._cshape[0]
            if hc // self._pblock < 2 or hc < self._pblock + 16:
                self._use_pallas = False

        if precond == "auto":
            from tpuwave.solve.multigrid import auto_precond
            precond = auto_precond(disc, self.coef)
        self.precond = precond
        self.cheby_degree = int(cheby_degree)
        if precond == "mg":
            # (p+h)-multigrid V-cycle (solve/multigrid.py). Non-constant /
            # time-dependent c freezes the hierarchy at the rms wave speed
            # (a FIXED SPD V-cycle stays a valid CG preconditioner for a
            # varying SPD system — models/theta.py frozen-coefficient note)
            from tpuwave.solve.multigrid import p2_gmg_for_system
            c_ref = (float(c_const) if c_const is not None
                     else self._frozen_c_ref())
            self._prec_sys = p2_gmg_for_system(
                (self.nx, self.ny), p.geometry, c_ref, self.coef,
                dtype=self.dtype)
        elif precond in ("jacobi", "chebyshev"):
            self._prec_sys = None   # derived from the (per-step) system op
        else:
            raise ValueError(f"Unknown preconditioner {precond!r}")

        if self._use_pallas and precond == "mg":
            if self._sys_stencil is None:
                self._use_pallas = False   # coef == 0 + forced mg: flat
            else:
                # canvas-native (p+h) V-cycle: the smoothing applies run
                # through the fused kernel; interior mask rebuilt from
                # iota inside the trace (no O(n_dofs) HLO literals)
                from tpuwave.ops.pallas_p2 import (
                    coeffs_to_static, p2_constrained_apply_pallas)
                from tpuwave.ops.stencil_p2 import _PLANES
                from tpuwave.solve.multigrid import (
                    P2CanvasGmgPreconditioner)
                flat_pre = self._prec_sys
                st = self._sys_stencil
                coeffs = coeffs_to_static(st.coeffs)
                diags = tuple(float(st.plane_diag[q]) for q in _PLANES)
                inv_diag = 1.0 / jnp.asarray(
                    [st.plane_diag[q] for q in _PLANES],
                    self.dtype).reshape(4, 1, 1)
                pblock, pinterp = self._pblock, self._pinterp
                nx, ny = self.nx, self.ny

                def apply_c(xc):
                    return p2_constrained_apply_pallas(
                        xc, coeffs=coeffs, diags=diags, nx=nx, ny=ny,
                        block_rows=pblock, interpret=pinterp)

                self._prec_sys = P2CanvasGmgPreconditioner(
                    apply_c, None, inv_diag, flat_pre.sm_theta,
                    flat_pre.sm_coeffs, flat_pre.p1_cycle, nx, ny,
                    self._cshape)

        self._step = jax.jit(self._step_impl)

    # -- wave-speed machinery -------------------------------------------
    def _frozen_c_ref(self) -> float:
        """rms of c(x, y, 0) over the DoF support points, computed from
        iota plane coordinates (no O(n_dofs) host arrays)."""
        tot = cnt = 0.0
        for pl, (xs, ys) in p2_plane_coords(self.mesh, jnp.float64).items():
            cv = jnp.broadcast_to(jnp.asarray(
                self._c_eval(xs, ys, 0.0), jnp.float64), xs.shape)
            tot += float(jnp.sum(cv ** 2))
            cnt += cv.size
        return float(np.sqrt(tot / cnt))

    def _tdep_data(self):
        try:
            return self.__tdep_cache
        except AttributeError:
            pass
        self.__tdep_cache = p2_varcoef_data(self.space, gauss_simplex(3))
        return self.__tdep_cache

    def _tdep_scales(self, t):
        """(2, Q, ny, nx) planes det * w_q * c^2(x_ekq, t) (traceable;
        same algebra as models/fast_p2.py::P2FastSolver._tdep_scales)."""
        G, frac, w, det = self._tdep_data()
        ny, nx = self.ny, self.nx
        (x0, y0) = self.mesh.origin
        hx, hy = self.mesh.hx, self.mesh.hy
        ix = jax.lax.broadcasted_iota(self.dtype, (ny, nx), 1)
        iy = jax.lax.broadcasted_iota(self.dtype, (ny, nx), 0)
        rows = []
        for k in range(2):
            qrows = []
            for q in range(frac.shape[1]):
                fx, fy = float(frac[k, q, 0]), float(frac[k, q, 1])
                c2 = jnp.asarray(self._c_eval(
                    x0 + (ix + fx) * hx, y0 + (iy + fy) * hy, t),
                    self.dtype) ** 2
                c2 = jnp.broadcast_to(c2, (ny, nx))
                qrows.append((det * float(w[q])) * c2)
            rows.append(jnp.stack(qrows))
        return jnp.stack(rows)

    def _k_from_scales(self, s) -> _P2Op:
        """Varcoef K operator; lam_hi by the SPD majorant
        K(c) <= max(c^2) K(1), so lam(K(c)) <= max(c^2) * lam(K(1))."""
        G, frac, w, det = self._tdep_data()
        op = P2VarcoefStencil(self.space, s, G, self.dtype)
        wdet = jnp.asarray(det * np.asarray(w), self.dtype)   # (Q,)
        c2max = jnp.max(s / wdet[None, :, None, None])
        return _P2Op(op, op.diagonal(), c2max * self._k_unit_lam)

    # -- lazily-built O(n_dofs) structures (see __init__ note) ----------
    @property
    def interior(self):
        return _p2_interior_flat(self.nx, self.ny)

    @property
    def boundary(self):
        return jnp.logical_not(self.interior)

    @property
    def _mass_op(self) -> _P2Op:
        return _P2Op(self.mass, self.mass.diagonal(), self._mass_lam)

    @property
    def _prec_mass(self):
        return 1.0 / self.mass.diagonal()

    def _k_at(self, t) -> _P2Op:
        if self._c_mode == "const":
            return _P2Op(self._stiff, self._stiff.diagonal(),
                         self._stiff_lam)
        if self._c_mode == "varcoef":
            return self._k_from_scales(self._tdep_scales(0.0))
        return self._k_from_scales(self._tdep_scales(t))

    def _system_of(self, k_op: _P2Op) -> _P2Op:
        """M + coef * K as a single operator (merged constant stencil
        when K is constant-coefficient, varcoef-with-constant-part
        otherwise)."""
        coef = self.coef
        if coef == 0.0:   # theta = 0 / beta = 0: the system is bare mass
            return self._mass_op
        if self._sys_stencil is not None:
            return _P2Op(self._sys_stencil, self._sys_stencil.diagonal(),
                         self._sys_lam)
        sys_op = self.mass.axpy_varcoef(coef, k_op.apply)
        return _P2Op(sys_op, sys_op.diagonal(),
                     self._mass_lam + coef * k_op.lam_hi)

    def _system_at(self, k_op: _P2Op) -> _P2Op:
        return self._system_of(k_op)

    def _sys_precond(self, sys_op: _P2Op):
        """Resolve the preconditioner for (this step's) system operator."""
        if self.precond == "mg":
            return self._prec_sys
        inv_diag = 1.0 / sys_op.diag
        if self.precond == "jacobi":
            return inv_diag
        # chebyshev on the CONSTRAINED apply; the Gershgorin bound of the
        # unconstrained operator majorises it (pinned rows pure diagonal)
        from tpuwave.solve.chebyshev import chebyshev_apply
        apply_c = self._constrained_apply(sys_op)
        lmax = sys_op.lam_hi / jnp.min(jnp.asarray(sys_op.diag))
        deg = self.cheby_degree

        def prec(r):
            return chebyshev_apply(apply_c, inv_diag, r, lambda_max=lmax,
                                   degree=deg)
        return prec

    # -- problem data ----------------------------------------------------
    def _flat(self, expr, t):
        """expr(x, y, t) at ALL DoF support points (flat vector; only
        boundary entries are ever consumed — interior values are masked
        away). Coordinates are iota-generated inside the trace."""
        return p2_interpolate_flat(self.mesh, expr, t, self.dtype)

    def _load_data(self):
        try:
            return self.__load_cache
        except AttributeError:
            pass
        from tpuwave.ops.stencil import P1_CLASS_CORNERS
        quad = gauss_simplex(3)
        sh = self.space.shape_at(quad)
        vals = np.asarray(sh.values)                    # (Q, 6)
        ref = np.asarray(quad.points)
        frac = np.empty((2, len(ref), 2))
        for k in range(2):
            c0, c1, c2_ = (np.asarray(c, float) for c in P1_CLASS_CORNERS[k])
            frac[k] = (c0[None]
                       + ref[:, 0:1] * (c1 - c0)[None]
                       + ref[:, 1:2] * (c2_ - c0)[None])
        self.__load_cache = (vals, frac, np.asarray(quad.weights),
                             float(self.mesh.det_j))
        return self.__load_cache

    def grid_load(self, t):
        """Quadrature-consistent P2 load vector (flat), by the assembly
        r+1 rule — the plane counterpart of the reference's per-step
        forcing cell loop (WaveTheta.cpp:164-172):
        L_i = sum_T det w_q phi_i(q) f(x_Tq), scattered to the six
        incident plane positions by slice-adds."""
        vals, frac, w, det = self._load_data()
        ny, nx = self.ny, self.nx
        (x0, y0) = self.mesh.origin
        hx, hy = self.mesh.hx, self.mesh.hy
        ix = jax.lax.broadcasted_iota(self.dtype, (ny, nx), 1)
        iy = jax.lax.broadcasted_iota(self.dtype, (ny, nx), 0)
        shapes = p2_plane_shapes(nx, ny)
        out = {p: jnp.zeros(shapes[p], self.dtype) for p in _PLANES}
        f_eval = self._f.evaluate
        for k in range(2):
            pos = _P2_POSITIONS[k]
            for q in range(frac.shape[1]):
                fx, fy = float(frac[k, q, 0]), float(frac[k, q, 1])
                fv = jnp.broadcast_to(jnp.asarray(
                    f_eval(x0 + (ix + fx) * hx, y0 + (iy + fy) * hy, t),
                    self.dtype), (ny, nx))
                for a in range(6):
                    pa, (ox, oy) = pos[a]
                    out[pa] = out[pa].at[oy:oy + ny, ox:ox + nx].add(
                        (det * float(w[q]) * float(vals[q, a])) * fv)
        return planes_to_flat(out)

    # -- Dirichlet elimination ------------------------------------------
    def _constrained_apply(self, op: _P2Op):
        interior = self.interior

        def apply_c(w):
            return jnp.where(interior,
                             op.apply(jnp.where(interior, w, 0.0)),
                             op.diag * w)
        return apply_c

    def _constrain(self, op: _P2Op, rhs, g_flat, x_prev, *, g_zero: bool):
        """Flat form of ops.operators.constrain_system (deal.II
        apply_boundary_values with eliminate_columns=true). ``g_zero``
        statically skips the lift apply for homogeneous data."""
        interior = self.interior
        apply_c = self._constrained_apply(op)
        if g_zero:
            rhs_c = jnp.where(interior, rhs, 0.0)
            x0 = jnp.where(interior, x_prev, 0.0)
            return apply_c, rhs_c, x0
        g_ext = jnp.where(self.boundary, g_flat, 0.0)
        rhs_c = jnp.where(interior, rhs - op.apply(g_ext),
                          op.diag * g_ext)
        x0 = jnp.where(self.boundary, g_ext, x_prev)
        return apply_c, rhs_c, x0

    def _abs_tol(self, rhs, x0, op: _P2Op):
        """Reference 1e-12 floor in f64; backward-error floor in f32
        (models/fast.py::_solve_abs_tol rationale)."""
        if self.dtype == jnp.float64:
            return 1e-12
        eta = 8 * float(jnp.finfo(self.dtype).eps)
        return eta * (op.lam_hi * jnp.linalg.norm(x0)
                      + jnp.linalg.norm(rhs))

    def _solve(self, op: _P2Op, rhs, g_flat, x_prev, precond, *,
               g_zero: bool):
        if self._use_pallas:
            return self._solve_canvas(op, rhs, g_flat, x_prev,
                                      g_zero=g_zero)
        apply_c, rhs_c, x0 = self._constrain(op, rhs, g_flat, x_prev,
                                             g_zero=g_zero)
        return pcg(apply_c, rhs_c, x0, precond_inv_diag=precond,
                   abs_tol=self._abs_tol(rhs_c, x0, op),
                   max_iter=self._max_iter)

    def _solve_canvas(self, op: _P2Op, rhs, g_flat, x_prev, *,
                      g_zero: bool):
        """Fused canvas solve (P1 engine's _solve_pallas twin): the flat
        rhs/warm-start/boundary data are laid out as four zero-padded
        canvases, the lift uses ONE unconstrained XLA canvas apply, and
        every CG matvec (plus the mg smoothing) is the Mosaic
        block-stencil kernel. Same elimination algebra and stopping
        contract as the flat path — interpret-mode equivalence pinned in
        tests/test_fast_engine_p2.py."""
        from tpuwave.ops.pallas_p2 import (coeffs_to_static,
                                           p2_constrained_apply_pallas)
        from tpuwave.ops.stencil_p2 import (_PLANES, canvases_to_planes,
                                            flat_to_planes,
                                            planes_to_canvases,
                                            planes_to_flat)
        from tpuwave.solve.multigrid import _p2_canvas_interior
        nx, ny = self.nx, self.ny
        cshape = self._cshape
        st = op.apply                      # const P2PlaneStencil
        coeffs = coeffs_to_static(st.coeffs)
        diags = tuple(float(st.plane_diag[q]) for q in _PLANES)
        diag_c = jnp.asarray([st.plane_diag[q] for q in _PLANES],
                             self.dtype).reshape(4, 1, 1)

        def to_c(x):
            return planes_to_canvases(flat_to_planes(x, nx, ny), cshape)

        def apply_p(xc):
            return p2_constrained_apply_pallas(
                xc, coeffs=coeffs, diags=diags, nx=nx, ny=ny,
                block_rows=self._pblock, interpret=self._pinterp)

        interior_c = _p2_canvas_interior(nx, ny, cshape)
        if g_zero:
            rhs_cv = jnp.where(interior_c, to_c(rhs), 0.0)
            x0_cv = jnp.where(interior_c, to_c(x_prev), 0.0)
        else:
            g_cv = to_c(jnp.where(self.boundary, g_flat, 0.0))
            rhs_cv = jnp.where(interior_c,
                               to_c(rhs) - st.apply_canvases(g_cv),
                               diag_c * g_cv)
            x0_cv = jnp.where(interior_c, to_c(x_prev), g_cv)

        # canvas-appropriate preconditioner (the flat arrays the caller
        # resolved do not fit the canvas layout)
        if self.precond == "mg" and st is self._sys_stencil:
            prec = self._prec_sys          # canvas-native V-cycle
        elif self.precond == "chebyshev" and st is self._sys_stencil:
            from tpuwave.solve.chebyshev import chebyshev_apply
            lmax = op.lam_hi / min(float(st.plane_diag[q])
                                   for q in _PLANES)
            deg = self.cheby_degree
            inv_d = 1.0 / diag_c

            def prec(r):
                return chebyshev_apply(apply_p, inv_d, r,
                                       lambda_max=lmax, degree=deg)
        else:
            prec = 1.0 / diag_c            # jacobi (mass solves too)

        res = pcg(apply_p, rhs_cv, x0_cv, precond_inv_diag=prec,
                  abs_tol=self._abs_tol(rhs_cv, x0_cv, op),
                  max_iter=self._max_iter)
        x_flat = planes_to_flat(canvases_to_planes(res.x, nx, ny))
        return res._replace(x=x_flat)

    def step(self, state: FastGridState, t):
        return self._step(state, t)


class FastP2ThetaSolver(_FastP2EngineBase):
    """theta-method on the P2 planes — parity algebra of models/theta.py
    (reference WaveTheta.cpp:119-339) at plane-stencil speed, including
    time-dependent Dirichlet g on vertex AND edge-midpoint planes,
    theta-weighted forcing, and variable / time-dependent wave speed."""

    method_name = "theta"

    def method_params_suffix(self) -> str:
        from tpuwave.utils.naming import clean_double
        return "-theta" + clean_double(self.theta)

    def initial_state(self) -> FastGridState:
        d = self.disc
        u0 = jnp.asarray(d.interpolate(d.params.u0), self.dtype)
        v0 = jnp.asarray(d.interpolate(d.params.v0), self.dtype)
        pay = self._tdep_scales(0.0) if self._c_mode == "tdep" else None
        return FastGridState(u=u0, v=v0, a=jnp.zeros_like(u0),
                             k_payload=pay)

    def _step_impl(self, state: FastGridState, t):
        dt, th = self.dt, self.theta
        u, v = state.u, state.v

        pay_np1 = None
        if self._c_mode == "tdep":
            # K^n from the carried payload (built as K^{n+1} last step);
            # K^{n+1} rebuilt from c(x, y, t) — one build per step
            k_n = (self._k_from_scales(state.k_payload)
                   if state.k_payload is not None
                   else self._k_at(t - dt))
            pay_np1 = self._tdep_scales(t)
            k_np1 = self._k_from_scales(pay_np1)
        else:
            k_n = k_np1 = self._k_at(t)
        sys_op = self._system_at(k_np1)
        prec_sys = self._sys_precond(sys_op)

        mu, ku, mv = self.mass(u), k_n.apply(u), self.mass(v)

        if self._f is not None:
            f_avg = (th * self.grid_load(t)
                     + (1.0 - th) * self.grid_load(t - dt))
        else:
            f_avg = None

        # u system (WaveTheta.cpp:119-186, 251-294)
        rhs_u = mu - (dt * dt * th * (1.0 - th)) * ku + dt * mv
        if f_avg is not None:
            rhs_u = rhs_u + (th * dt * dt) * f_avg
        res_u = self._solve(sys_op, rhs_u, self._flat(self._g, t), u,
                            prec_sys, g_zero=self._g.is_zero)
        u_new = res_u.x.astype(self.dtype)

        # v system (WaveTheta.cpp:188-249, 296-339)
        rhs_v = mv - (dt * (1.0 - th)) * ku - (dt * th) * k_np1.apply(u_new)
        if f_avg is not None:
            rhs_v = rhs_v + dt * f_avg
        res_v = self._solve(self._mass_op, rhs_v,
                            self._flat(self._dgdt, t), v,
                            self._prec_mass, g_zero=self._dgdt.is_zero)
        v_new = res_v.x.astype(self.dtype)

        new_state = FastGridState(u=u_new, v=v_new, a=state.a,
                                  k_payload=pay_np1)
        info = {
            "iterations_1": res_u.iterations,
            "iterations_2": res_v.iterations,
            "norm_u": jnp.linalg.norm(u_new),
            "norm_v": jnp.linalg.norm(v_new),
        }
        return new_state, info


class FastP2NewmarkSolver(_FastP2EngineBase):
    """Newmark-beta on the P2 planes — parity algebra of
    models/newmark.py (reference WaveNewmark.cpp:116-390): consistent-mass
    a-solve (also at beta = 0), the derived acceleration boundary
    formulas, consistent a0, per-step forcing, variable / time-dependent
    wave speed."""

    method_name = "newmark"

    def method_params_suffix(self) -> str:
        from tpuwave.utils.naming import clean_double
        return ("-gamma" + clean_double(self.gamma)
                + "-beta" + clean_double(self.beta))

    # -- acceleration boundary data (WaveNewmark.cpp:177-262) ----------
    def _accel_bc_flat(self, t, z):
        dt = self.dt
        if self.beta > 1e-12:
            return (self._flat(self._g, t) - z) / (self.beta * dt * dt)
        g_p = self._flat(self._g, t)
        g_0 = self._flat(self._g, t - dt)
        g_m = self._flat(self._g, t - 2.0 * dt)
        return (g_p - 2.0 * g_0 + g_m) / (dt * dt)

    def initial_state(self) -> FastGridState:
        """u0, v0 interpolation + consistent M a0 = F(0) - K(0) u0 with
        a0|b = (g(dt) - 2 g(0) + g(-dt)) / dt^2 (reference :298-390)."""
        d, dt = self.disc, self.dt
        u0 = jnp.asarray(d.interpolate(d.params.u0), self.dtype)
        v0 = jnp.asarray(d.interpolate(d.params.v0), self.dtype)
        rhs = -self._k_at(0.0).apply(u0)
        if self._f is not None:
            rhs = rhs + self.grid_load(0.0)
        g_p = self._flat(self._g, dt)
        g_0 = self._flat(self._g, 0.0)
        g_m = self._flat(self._g, -dt)
        a0_bc = (g_p - 2.0 * g_0 + g_m) / (dt * dt)
        res = self._solve(self._mass_op, rhs, a0_bc, jnp.zeros_like(u0),
                          self._prec_mass, g_zero=self._g.is_zero)
        self.initial_iterations = int(res.iterations)
        return FastGridState(u=u0, v=v0,
                             a=res.x.astype(self.dtype))

    def _step_impl(self, state: FastGridState, t):
        dt, beta, gamma = self.dt, self.beta, self.gamma
        u, v, a = state.u, state.v, state.a

        # the elastic force acts at t^{n+1} (models/newmark.py tdep note)
        k_np1 = self._k_at(t)
        sys_op = self._system_at(k_np1)
        prec_sys = self._sys_precond(sys_op)

        # z = u + dt v + dt^2 (1/2 - beta) a  (WaveNewmark.cpp:123-126)
        z = u + dt * v + (dt * dt * (0.5 - beta)) * a
        rhs = -k_np1.apply(z)
        if self._f is not None:
            rhs = rhs + self.grid_load(t)

        a_bc = self._accel_bc_flat(t, z)
        # NB for beta > 0 the derived BC (g - z)/(beta dt^2) is nonzero
        # even for g == 0 whenever the state is nonzero on the boundary
        # (inconsistent initial data decays to g, reference
        # WaveNewmark.cpp:196-210) — the homogeneous shortcut applies
        # only to the beta = 0 second-difference formula
        res = self._solve(sys_op, rhs, a_bc, a, prec_sys,
                          g_zero=self._g.is_zero and beta <= 1e-12)
        a_new = res.x.astype(self.dtype)

        u_new = (z + (beta * dt * dt) * a_new).astype(self.dtype)
        v_new = (v + dt * ((1.0 - gamma) * a + gamma * a_new)).astype(
            self.dtype)
        new_state = FastGridState(u=u_new, v=v_new, a=a_new)
        info = {
            "iterations_1": res.iterations,
            "iterations_2": jnp.asarray(0, jnp.int32),
            "norm_u": jnp.linalg.norm(u_new),
            "norm_v": jnp.linalg.norm(v_new),
        }
        return new_state, info
