"""Fused variable-coefficient leapfrog kernel for the FWI propagator.

The differentiable propagator (models/inverse.py, engine="stencil")
applies the variable-c stiffness as 7 multiply-roll-adds on coefficient
planes (the TPU form of the reference's variable-c assembly+vmult,
src/WaveTheta.cpp:56-117); XLA materialises a shifted grid copy per
offset, so one leapfrog step moves ~10 grid-sized HBM arrays. This
kernel fuses the WHOLE step

    u_next = (2 u - dnum * u_prev - coef * K(c2) u) * dden,  boundary -> 0
    (K(c2) u)[I] = sum_d w_d[I] * u[I + d]

into one pass per row block: halo DMA of u into VMEM, the 7-offset
variable-coefficient stencil via in-register lane/sublane rolls with the
coefficient planes streamed per block, elementwise update, Dirichlet
mask. HBM traffic per step: read u, u_prev, 7 planes (+ 2 damping
planes when a sponge is active), write u_next.

Offsets (dx, dy) of the P1 structured triangulation's stencil (lower
triangle (v00, v10, v11) / upper (v00, v11, v01), core/mesh.py::cells):
(0,0), (±1,0), (0,±1), (1,1), (-1,-1) — the (1,-1)/(-1,1) corners never
couple. ``OFFSETS`` below fixes the plane stacking order; the planes are
exactly models/inverse.py::_assemble_stencil_planes' dict values.

The same algebra also serves the time-REVERSED reconstruction and the
adjoint-field update of the O(1)-memory FWI backward pass
(inverse.py::_adjoint_backward):

    u_prev  = mask0(2 u_cur - u_next - coef K(u_cur))          (+ src term)
    lam_cur = lam_partial + 2 blam - K(coef blam)
            = -(-lam_partial) + 2 blam - coef K(blam)

i.e. one extra kernel call each with (u, u_prev) roles re-bound — see
``varcoef_leapfrog_step_pallas`` callers in models/inverse.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _HALO, _halo_dma, _pinned_mask

__all__ = ["OFFSETS", "varcoef_leapfrog_step_pallas",
           "varcoef_adjoint_step_pallas"]

# (dx, dy) neighbour offsets; plane j multiplies u[r + dy_j, c + dx_j]
OFFSETS = ((0, 0), (-1, 0), (1, 0), (0, -1), (-1, -1), (0, 1), (1, 1))


def _varcoef_stencil(a, planes, n_cols, hh, br):
    """(K u) on the ``br`` centre rows of the halo slab ``a``
    ((br+2hh, W)) with coefficient planes ``planes`` ((7, br, W)) in
    ``OFFSETS`` order. Wrap garbage lands only on boundary/padding
    rows/cols, which every caller masks."""
    h_tot = a.shape[0]
    cen = a[hh:hh + br, :]
    up = pltpu.roll(a, shift=1, axis=0)[hh:hh + br, :]          # u[r-1, c]
    dn = pltpu.roll(a, shift=h_tot - 1, axis=0)[hh:hh + br, :]  # u[r+1, c]

    def left(x):                                   # u[., c-1]
        return pltpu.roll(x, shift=1, axis=1)

    def right(x):                                  # u[., c+1]
        return pltpu.roll(x, shift=n_cols - 1, axis=1)

    return (planes[0] * cen
            + planes[1] * left(cen) + planes[2] * right(cen)
            + planes[3] * up + planes[4] * left(up)
            + planes[5] * dn + planes[6] * right(dn))


def _varcoef_kernel(up_ref, planes_ref, u_hbm, out_ref, scratch, sem, *,
                    coef, block_rows: int, n_rows: int, n_cols: int,
                    true_cols: int):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    hh = _HALO
    _halo_dma(u_hbm, scratch, sem, i, n_blocks, block_rows, n_cols)
    a = scratch[:, :]
    ku = _varcoef_stencil(a, planes_ref[:, :, :], n_cols, hh, block_rows)
    cen = a[hh:hh + block_rows, :]
    un = 2.0 * cen - up_ref[:, :] - coef * ku
    mask = _pinned_mask(i * block_rows, (block_rows, n_cols), n_rows,
                        true_cols)
    out_ref[:, :] = jnp.where(mask, 0.0, un).astype(out_ref.dtype)


def _varcoef_damped_kernel(up_ref, planes_ref, dnum_ref, dden_ref, u_hbm,
                           out_ref, scratch, sem, *, coef, block_rows: int,
                           n_rows: int, n_cols: int, true_cols: int):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    hh = _HALO
    _halo_dma(u_hbm, scratch, sem, i, n_blocks, block_rows, n_cols)
    a = scratch[:, :]
    ku = _varcoef_stencil(a, planes_ref[:, :, :], n_cols, hh, block_rows)
    cen = a[hh:hh + block_rows, :]
    un = (2.0 * cen - dnum_ref[:, :] * up_ref[:, :]
          - coef * ku) * dden_ref[:, :]
    mask = _pinned_mask(i * block_rows, (block_rows, n_cols), n_rows,
                        true_cols)
    out_ref[:, :] = jnp.where(mask, 0.0, un).astype(out_ref.dtype)


def _validate(h, w, block_rows, interpret):
    if block_rows % _HALO != 0:
        raise ValueError(f"block_rows {block_rows} must be a multiple of "
                         f"{_HALO} (sublane DMA alignment)")
    if h % block_rows != 0:
        raise ValueError(f"rows {h} not a multiple of block_rows "
                         f"{block_rows}")
    if w % 128 != 0 and not interpret:
        raise ValueError(f"cols {w} not a multiple of 128 (pad + mask)")
    if h // block_rows < 2:
        raise ValueError("need at least 2 row blocks; use the XLA "
                         "plane path")
    if h < block_rows + 2 * _HALO:
        raise ValueError(f"rows {h} must be >= block_rows + 2*{_HALO} "
                         f"(the middle halo-DMA branch traces a "
                         f"{block_rows + 2 * _HALO}-row slice)")


@functools.partial(jax.jit, static_argnames=(
    "coef", "block_rows", "true_rows", "true_cols", "interpret"))
def varcoef_leapfrog_step_pallas(u, u_prev, planes, *, coef: float,
                                 damp: Optional[Tuple] = None,
                                 block_rows: int = 128,
                                 true_rows: int = None,
                                 true_cols: int = None,
                                 interpret: bool = False):
    """One fused variable-coefficient leapfrog step.

    u, u_prev : (H, W) padded vertex grids (H % block_rows == 0,
        W % 128 == 0; pad with zeros and give the physical extents in
        ``true_rows``/``true_cols`` — nodes beyond them are masked to 0,
        as are the Dirichlet boundary rows/cols).
    planes : (7, H, W) variable stencil coefficient planes in ``OFFSETS``
        order (zero-padded like u).
    coef : dt² / lumped-interior-mass scalar (uniform grid: dt²/detJ).
    damp : optional (dnum, dden) per-vertex sponge planes, each (H, W) —
        the (1 − σdt/2) numerator and 1/(1 + σdt/2) denominator factors.
        Omitted ⇒ the undamped hard-wall update (time-reversible).

    Point-source injection and receiver sampling are O(1) gathers done by
    the caller outside the kernel.
    """
    h, w = u.shape
    _validate(h, w, block_rows, interpret)
    n_rows = true_rows if true_rows is not None else h
    n_cols_true = true_cols if true_cols is not None else w
    grid = h // block_rows

    common = dict(coef=float(coef), block_rows=block_rows, n_rows=n_rows,
                  n_cols=w, true_cols=n_cols_true)
    block2 = pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    planes_spec = pl.BlockSpec((7, block_rows, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((block_rows + 2 * _HALO, w), u.dtype),
               pltpu.SemaphoreType.DMA]

    if damp is None:
        kernel = functools.partial(_varcoef_kernel, **common)
        in_specs = [block2, planes_spec,
                    pl.BlockSpec(memory_space=pltpu.ANY)]
        args = (u_prev, planes, u)
    else:
        dnum, dden = damp
        kernel = functools.partial(_varcoef_damped_kernel, **common)
        in_specs = [block2, planes_spec, block2, block2,
                    pl.BlockSpec(memory_space=pltpu.ANY)]
        args = (u_prev, planes, dnum, dden, u)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=block2,
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _adjoint_kernel(unext_ref, lpart_ref, planes_ref, wbar_ref, u_hbm,
                    lam_hbm, uprev_ref, lcur_ref, lpnew_ref, wbar_out_ref,
                    scr_u, scr_lam, sem_u, sem_lam, *, coef,
                    block_rows: int, n_rows: int, n_cols: int,
                    true_cols: int):
    """Fused body of the O(1)-memory FWI backward step (one HBM pass):

      blam     = mask0(lam_next)                  (B = interior projector)
      lam_cur  = lam_partial + 2 blam - coef K(blam)     [pre-injection]
      u_prev   = mask0(2 u_cur - u_next - coef K(u_cur)) [pre-source-term]
      lam_partial_new = -blam
      wbar_d  -= (coef blam) * shift(u_cur, d)    for the 7 offsets

    The receiver injection into lam_cur, the source term on u_prev and
    the wavelet cotangent (coef blam)[src] are O(1) gathers/scatters the
    caller does outside. lam_cur's boundary rows are masked — harmless,
    every downstream consumer multiplies by the interior mask.
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    hh = _HALO
    br = block_rows
    _halo_dma(u_hbm, scr_u, sem_u, i, n_blocks, br, n_cols)
    _halo_dma(lam_hbm, scr_lam, sem_lam, i, n_blocks, br, n_cols)

    # interior mask over the FULL halo slab (global row coords)
    slab_shape = (br + 2 * hh, n_cols)
    slab_mask = _pinned_mask(i * br - hh, slab_shape, n_rows, true_cols)
    blam_slab = jnp.where(slab_mask, 0.0, scr_lam[:, :])
    a_u = scr_u[:, :]

    planes = planes_ref[:, :, :]
    k_blam = _varcoef_stencil(blam_slab, planes, n_cols, hh, br)
    k_u = _varcoef_stencil(a_u, planes, n_cols, hh, br)

    mask = _pinned_mask(i * br, (br, n_cols), n_rows, true_cols)
    blam = blam_slab[hh:hh + br, :]
    u_cur = a_u[hh:hh + br, :]

    lcur_ref[:, :] = jnp.where(
        mask, 0.0, lpart_ref[:, :] + 2.0 * blam - coef * k_blam
    ).astype(lcur_ref.dtype)
    uprev_ref[:, :] = jnp.where(
        mask, 0.0, 2.0 * u_cur - unext_ref[:, :] - coef * k_u
    ).astype(uprev_ref.dtype)
    lpnew_ref[:, :] = (-blam).astype(lpnew_ref.dtype)

    # wbar_d[I] -= mu[I] * u[I + d],  mu = coef * blam
    mu = coef * blam
    h_tot = br + 2 * hh
    up = pltpu.roll(a_u, shift=1, axis=0)[hh:hh + br, :]
    dn = pltpu.roll(a_u, shift=h_tot - 1, axis=0)[hh:hh + br, :]

    def left(x):
        return pltpu.roll(x, shift=1, axis=1)

    def right(x):
        return pltpu.roll(x, shift=n_cols - 1, axis=1)

    shifted = (u_cur, left(u_cur), right(u_cur), up, left(up), dn,
               right(dn))
    for j in range(7):
        wbar_out_ref[j, :, :] = (wbar_ref[j, :, :]
                                 - mu * shifted[j]).astype(wbar_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "coef", "block_rows", "true_rows", "true_cols", "interpret"))
def varcoef_adjoint_step_pallas(u_next, u_cur, lam_next, lam_partial,
                                planes, wbar, *, coef: float,
                                block_rows: int = 128,
                                true_rows: int = None,
                                true_cols: int = None,
                                interpret: bool = False):
    """One fused FWI backward step (see ``_adjoint_kernel``); hard-wall
    (undamped) trajectories only — exactly the regime the time-reversal
    adjoint supports. Returns (u_prev, lam_cur_pre_inject,
    lam_partial_new, wbar_new); ``wbar`` is donated (aliased to the
    output) so the 7-plane accumulator never copies."""
    h, w = u_next.shape
    _validate(h, w, block_rows, interpret)
    n_rows = true_rows if true_rows is not None else h
    n_cols_true = true_cols if true_cols is not None else w
    grid = h // block_rows

    kernel = functools.partial(
        _adjoint_kernel, coef=float(coef), block_rows=block_rows,
        n_rows=n_rows, n_cols=w, true_cols=n_cols_true)
    block2 = pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    planes_spec = pl.BlockSpec((7, block_rows, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)
    slab = (block_rows + 2 * _HALO, w)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[block2, block2, planes_spec, planes_spec,
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(block2, block2, block2, planes_spec),
        out_shape=(jax.ShapeDtypeStruct(u_next.shape, u_next.dtype),
                   jax.ShapeDtypeStruct(u_next.shape, u_next.dtype),
                   jax.ShapeDtypeStruct(u_next.shape, u_next.dtype),
                   jax.ShapeDtypeStruct(planes.shape, planes.dtype)),
        scratch_shapes=[pltpu.VMEM(slab, u_next.dtype),
                        pltpu.VMEM(slab, u_next.dtype),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={3: 3},   # wbar -> wbar_new, in-place
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u_next, lam_partial, planes, wbar, u_cur, lam_next)
