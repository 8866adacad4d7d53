"""Geometric multigrid for the P1 grid-stencil systems — the large-dt
implicit solver.

The reference hands every implicit system to ML-AMG-CG (WaveTheta.cpp:
276-293, WaveNewmark.cpp:243-261). For wave-stable time steps the Jacobi-
or Chebyshev-preconditioned CG/Chebyshev solvers in this package match it
at a fraction of the cost, because `M + c*K` is then mass-dominated with a
small, h-independent condition number. But the whole point of the
unconditionally stable schemes (BE, CN, Newmark-AA) is to take dt far
beyond the CFL limit — and there the system becomes stiffness-dominated:
cond ~ c*lam_max(K)/lam_min(M) ~ (dt/h)^2, and any single-level polynomial
solver needs O(dt/h) iterations (measured: BE at 4096^2, dt=1e-3 takes
1070 ms/step on one chip vs 7.7 at dt=8e-5; dt=1e-2 overflows the
analytic-bound Chebyshev setup entirely).

Multigrid is the standard fix, and on the STRUCTURED triangulated
rectangle it is exact and TPU-friendly in a way AMG never is:

  * **Nested spaces**: the P1 space on the Nel/2 mesh (same diagonal
    direction) is a subspace of the fine one, and the inclusion operator P
    is the P1 interpolation: coincident nodes copy, edge-midpoint nodes
    average their two coarse edge endpoints — including the (+1,+1)
    triangulation diagonal. Hence the Galerkin coarse operator
    P^T (M + c K) P is EXACTLY the coarse-mesh FEM matrix M_2h + c K_2h:
    no triple products, no setup graph — each level's operator is just the
    constant stencil assembled on its own mesh (ops/stencil.py).
  * **Regular data flow**: restriction/prolongation are strided slices of
    2D planes, the smoother is the same 9-point stencil apply as
    everything else; all of it jit/shard-compatible (GSPMD inserts halo
    collectives), nothing data-dependent.
  * **Fixed polynomial structure**: smoothing and the coarsest solve are
    fixed-coefficient Chebyshev polynomials in the (symmetric) level
    operators with ANALYTIC eigenvalue bounds from the stencil symbol
    (solve/cheby_iter.py) — so one V(pre,post)-cycle is a fixed symmetric
    positive definite linear operator, a valid CG preconditioner with
    h- and dt-INDEPENDENT contraction.

Boundary handling follows the constrained-system convention used
everywhere in the fast path (ops/stencil.py, models/fast.py): level
operators act as `diag * x` on boundary rows, and residuals/corrections
are zeroed there before restriction / after prolongation, so the cycle
solves the interior (eliminated) problem and leaves pinned rows alone.
"""

from __future__ import annotations

import math
from typing import Callable, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuwave.solve.cheby_iter import (chebyshev_block, chebyshev_coefficients,
                                      block_contraction,
                                      stencil_symbol_bounds)
from tpuwave.ops.stencil import apply_stencil

__all__ = ["prolong_p1", "restrict_p1", "MgLevel", "build_gmg_levels",
           "GmgPreconditioner", "gmg_for_system", "gmg_flat_preconditioner"]


# ----------------------------------------------------------------------
# transfer operators (P = nested-P1 inclusion, R = P^T)
# ----------------------------------------------------------------------

# The P1 inclusion weights as a 3x3 stencil on the DILATED grid: a fine
# node takes 1x the coincident coarse node, 0.5x each endpoint of the
# coarse edge it bisects — horizontal, vertical, or the (+1,+1)
# triangulation DIAGONAL (not the 4-point bilinear average; the mesh is
# triangulated, core/mesh.py). Same layout convention as ops/stencil.py:
# s[1+dj][1+di] couples offset (di, dj).
_P_STENCIL = ((0.5, 0.5, 0.0),
              (0.5, 1.0, 0.5),
              (0.0, 0.5, 0.5))


def prolong_p1(c: jax.Array) -> jax.Array:
    """(ny+1, nx+1) coarse plane -> (2ny+1, 2nx+1) fine plane by P1
    interpolation on the nested triangulation.

    Implemented as interior-dilation (zeros between nodes, one zero ring)
    followed by one `_P_STENCIL` apply — the strided-scatter formulation
    costs 90 ms at 2048->4096 on a v5e chip vs 7.5 ms for this one (the
    TPU hates stride-2 scatters; `lax.pad` + the 9-point roll pass it
    streams). The zero ring absorbs the rolls' cyclic wrap, so the result
    is exact everywhere including boundary rows.
    """
    zero = jnp.asarray(0.0, c.dtype)
    d = jax.lax.pad(c, zero, ((1, 1, 1), (1, 1, 1)))
    return apply_stencil(d, _P_STENCIL)[1:-1, 1:-1]


def restrict_p1(r: jax.Array) -> jax.Array:
    """(2ny+1, 2nx+1) fine plane -> (ny+1, nx+1) coarse plane, R = P^T.

    Coarse node (I, J) accumulates the fine residual at its own node plus
    half of the six fine edge-midpoint neighbours it interpolates into:
    the same `_P_STENCIL` pass (one zero ring absorbs the wrap), then a
    stride-2 subsample done as pad + reshape + contiguous slice (TPU-
    friendly deinterleave; a strided gather relayouts instead).
    """
    zero = jnp.asarray(0.0, r.dtype)
    p = jax.lax.pad(r, zero, ((1, 1, 0), (1, 1, 0)))
    y = apply_stencil(p, _P_STENCIL)[1:-1, 1:-1]
    hf, wf = y.shape
    ny1, nx1 = (hf + 1) // 2, (wf + 1) // 2
    yr = jax.lax.pad(y, zero, ((0, 1, 0), (0, 0, 0)))
    yr = yr.reshape(ny1, 2, wf)[:, 0, :]
    yc = jax.lax.pad(yr, zero, ((0, 0, 0), (0, 1, 0)))
    return yc.reshape(ny1, nx1, 2)[:, :, 0]


# ----------------------------------------------------------------------
# level construction
# ----------------------------------------------------------------------

class MgLevel(NamedTuple):
    stencil: Tuple            # (3,3) tuple-of-tuples operator stencil
    shape: Tuple[int, int]    # (ny+1, nx+1) plane shape
    sm_theta: float           # smoother Chebyshev schedule
    sm_coeffs: Tuple


def _spd_symbol_bounds(stencil) -> Tuple[float, float]:
    """Analytic SPD spectrum bounds; keeps the lower bound positive even
    when the default relative pad would cross zero (stiffness-dominated
    stencils have lam_min << lam_max)."""
    lo, hi = stencil_symbol_bounds(stencil)
    if lo <= 0.0:
        lo0, _ = stencil_symbol_bounds(stencil, pad_rel=0.0)
        if lo0 <= 0.0:
            raise ValueError(f"stencil symbol not SPD: min {lo0}")
        # 512^2 sampling of the degree-1 trig symbol is accurate to
        # ~1e-5 relative; halving is a generous safety margin
        lo = 0.5 * lo0
    return lo, hi


def build_gmg_levels(system_stencil_of: Callable[[int, int], np.ndarray],
                     nel: Tuple[int, int], *, pre_degree: int = 2,
                     smooth_range: float = 8.0, min_coarse: int = 8,
                     coarse_tol: float = 1e-2,
                     max_coarse_degree: int = 96) -> Tuple[List[MgLevel],
                                                           float, Tuple]:
    """Build the level hierarchy.

    ``system_stencil_of(nx, ny)`` returns the (3, 3) operator stencil
    assembled on the (nx, ny) mesh — by nestedness this IS the Galerkin
    coarse operator (module docstring). Coarsening halves both axes while
    they stay even and larger than ``min_coarse``.

    Returns (levels, coarse_theta, coarse_coeffs): every level carries a
    degree-``pre_degree`` Chebyshev smoother targeting the upper
    [lam_max/smooth_range, lam_max] band of its analytic symbol spectrum;
    the coarsest level's full-range schedule is sized (host-side, from
    ``block_contraction``) to reduce the residual by ``coarse_tol``.
    """
    nx, ny = int(nel[0]), int(nel[1])
    levels: List[MgLevel] = []
    while True:
        st = np.asarray(system_stencil_of(nx, ny))
        st_t = tuple(tuple(float(v) for v in row) for row in st)
        _, hi = _spd_symbol_bounds(st_t)
        th, cf = chebyshev_coefficients(hi / smooth_range, hi, pre_degree)
        levels.append(MgLevel(stencil=st_t, shape=(ny + 1, nx + 1),
                              sm_theta=th, sm_coeffs=tuple(cf)))
        if (nx % 2 or ny % 2 or min(nx, ny) // 2 < min_coarse):
            break
        nx //= 2
        ny //= 2

    lo, hi = _spd_symbol_bounds(levels[-1].stencil)
    sigma = (hi + lo) / (hi - lo)
    need = math.acosh(1.0 / coarse_tol) / math.acosh(sigma)
    degree = min(max(int(math.ceil(need)), pre_degree), max_coarse_degree)
    c_theta, c_coeffs = chebyshev_coefficients(lo, hi, degree)
    return levels, c_theta, tuple(c_coeffs)


# ----------------------------------------------------------------------
# the V-cycle
# ----------------------------------------------------------------------

def _interior(shape: Tuple[int, int]) -> jax.Array:
    h, w = shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return (ri > 0) & (ri < h - 1) & (ci > 0) & (ci < w - 1)


class GmgPreconditioner:
    """z = V(b): one V(pre, post)-cycle on the constrained level operators.

    A fixed SPD linear operator (fixed-polynomial Chebyshev smoothing and
    coarse solve, R = P^T) — pass directly as ``precond_inv_diag`` to
    solve/cg.py::pcg. Apply cost ~ (pre + post + 1) fine stencil applies
    plus a geometrically decaying coarse tail (< 4/3 of the fine work).
    """

    def __init__(self, levels: Sequence[MgLevel], coarse_theta: float,
                 coarse_coeffs: Tuple):
        self.levels = list(levels)
        self.coarse_theta = float(coarse_theta)
        self.coarse_coeffs = tuple(coarse_coeffs)

    @staticmethod
    def _constrained(lev: MgLevel, interior) -> Callable:
        diag = lev.stencil[1][1]

        def apply_c(x):
            # mask columns AND rows (models/fast.py::_constrained): the
            # eliminated operator is block-diagonal over interior/boundary,
            # hence symmetric — required for the SPD cycle
            xi = jnp.where(interior, x, 0.0)
            return jnp.where(interior, apply_stencil(xi, lev.stencil),
                             diag * x)
        return apply_c

    def _coarse_solve(self, apply_c: Callable, b: jax.Array) -> jax.Array:
        """Fixed-schedule Chebyshev on the coarsest level, rolled up as a
        ``lax.scan`` over the coefficient pairs: the stiffest systems need
        degree ~100 here, and unrolling that inside the caller's CG
        while_loop sends XLA:CPU compile time through the roof (>10 min;
        the TPU compiles fine but gains nothing from the unroll either —
        the level is tiny)."""
        theta = jnp.asarray(self.coarse_theta, b.dtype)
        x = b * (1.0 / theta)
        r = b - apply_c(x)
        d = x
        if not self.coarse_coeffs:
            return x
        cc = jnp.asarray(self.coarse_coeffs, b.dtype)

        def body(carry, c):
            x, r, d = carry
            d = c[0] * d + c[1] * r
            x = x + d
            r = r - apply_c(d)
            return (x, r, d), None

        (x, r, d), _ = jax.lax.scan(body, (x, r, d), cc)
        return x

    def _cycle(self, l: int, b: jax.Array) -> jax.Array:
        lev = self.levels[l]
        interior = _interior(lev.shape)
        apply_c = self._constrained(lev, interior)
        x = jnp.zeros_like(b)
        if l == len(self.levels) - 1:
            return self._coarse_solve(apply_c, b)
        # pre-smoothing (zero initial guess -> r stays consistent)
        x, r = chebyshev_block(apply_c, x, b, lev.sm_theta, lev.sm_coeffs)
        # coarse correction (mask boundary rows first: restriction must be
        # the exact transpose of the masked prolongation for SPD symmetry)
        bc = restrict_p1(jnp.where(interior, r, 0.0))
        bc = jnp.where(_interior(self.levels[l + 1].shape), bc, 0.0)
        ec = self._cycle(l + 1, bc)
        x = x + jnp.where(interior, prolong_p1(ec), 0.0)
        r = b - apply_c(x)
        # post-smoothing (same polynomial -> symmetric cycle)
        x, _ = chebyshev_block(apply_c, x, r, lev.sm_theta, lev.sm_coeffs)
        return x

    def __call__(self, b: jax.Array) -> jax.Array:
        return self._cycle(0, b)


def gmg_for_system(nel: Tuple[int, int], geometry, c: float,
                   stiff_coef: float, *, pre_degree: int = 2,
                   smooth_range: float = 8.0, min_coarse: int = 8,
                   coarse_tol: float = 1e-2) -> GmgPreconditioner:
    """GMG preconditioner for ``M + stiff_coef * K`` on the structured
    (nel, geometry) P1 mesh (``stiff_coef`` = beta dt^2 for Newmark,
    (theta dt)^2 for the theta u-system — models/fast.py).

    Level operators are the coarse-mesh FEM stencils (exact Galerkin by
    nestedness); all setup is host-side numpy + closed-form assembly.
    """
    from tpuwave.core.mesh import FeSpace, StructuredTriMesh
    from tpuwave.core.quadrature import gauss_simplex
    from tpuwave.ops.assembly import (element_mass_class,
                                      element_stiffness_class)
    from tpuwave.ops.stencil import class_matrices_to_stencil

    quad = gauss_simplex(2)

    def stencil_of(nx, ny):
        space = FeSpace(StructuredTriMesh((nx, ny), geometry), 1)
        m = class_matrices_to_stencil(element_mass_class(space, quad))
        k = class_matrices_to_stencil(
            element_stiffness_class(space, quad, c * c))
        return m + stiff_coef * k

    levels, c_theta, c_coeffs = build_gmg_levels(
        stencil_of, nel, pre_degree=pre_degree, smooth_range=smooth_range,
        min_coarse=min_coarse, coarse_tol=coarse_tol)
    return GmgPreconditioner(levels, c_theta, c_coeffs)


def gmg_flat_preconditioner(disc, stiff_coef: float, **kw) -> Callable:
    """GMG V-cycle as a FLAT-DoF-vector preconditioner for the general
    (parity) solvers (models/theta.py, models/newmark.py), whose state is
    the flat DoF vector of models/discretization.py.

    Requires the structured P1 discretization with constant wave speed —
    there the flat DoF numbering IS the row-major vertex grid
    (core/mesh.py::vertex_index), so the adapter is a pair of reshapes.
    Raises ValueError otherwise (P2, imported meshes, variable c).
    """
    from tpuwave.core.mesh import StructuredTriMesh

    p = disc.params
    mesh = disc.mesh
    if not type(mesh) is StructuredTriMesh:
        raise ValueError("mg preconditioner needs the structured mesh")
    if p.r != 1:
        raise ValueError("mg preconditioner supports only R=1 (P1 DoFs = "
                         "vertex grid); use chebyshev for P2")
    if p.c.constant_value is None:
        raise ValueError("mg preconditioner needs a constant wave speed C")
    shape = (mesh.ny + 1, mesh.nx + 1)
    inner = gmg_for_system(mesh.nel, mesh.geometry,
                           float(p.c.constant_value), stiff_coef, **kw)

    def precond(r):
        return inner(r.reshape(shape)).reshape(-1)

    return precond
