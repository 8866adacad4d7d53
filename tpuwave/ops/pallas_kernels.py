"""Pallas TPU kernels for the hot explicit time step.

The XLA roll-based stencil (ops/stencil.py) materialises shifted copies of
the grid, so the explicit step moves ~6-10 array-sized HBM transfers. This
kernel fuses the ENTIRE leapfrog update

    u_next = 2 u - u_prev - coef * K_stencil(u),   boundary rows/cols -> 0

into one pass: per row-block it DMAs a (block+2)-row halo slab of u from
HBM into VMEM, applies the 9-point stencil with in-register lane rolls,
combines with the streamed u_prev block and writes u_next — read 2 + write
1 arrays per step, the HBM-bandwidth optimum for this recurrence.

Assumptions (the production bench configuration):
  * constant wave speed (constant stencil coefficients),
  * homogeneous Dirichlet data (boundary forced to zero),
  * interior lumped mass = detJ (uniform structured grid), so
    coef = dt^2 / detJ is a scalar.

The row count is padded to a multiple of the block size by the caller;
padded rows are masked like boundary rows.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["leapfrog_step_pallas", "leapfrog_multistep_pallas",
           "leapfrog_multistep_driven_pallas",
           "constrained_stencil_apply_pallas", "cheby_block_pallas",
           "newmark_rhs_r0_pallas", "newmark_update_pallas",
           "theta_r0u_pallas", "theta_r0v_pallas"]


_HALO = 8  # Mosaic sublane tiling: all dim-0 DMA slices must be 8-aligned


def _halo_dma_cases(ref_hbm, scratch, sem, i, n_blocks, br, n_cols,
                    do_start: bool, do_wait: bool, hh: int = _HALO):
    """Start and/or wait the halo slab DMA for block ``i`` into ``scratch``.

    Fill rule: scratch[hh + r] = ref[i*br + r], with ``hh`` rows of halo
    above/below (zeros outside the array); ``hh`` must be a multiple of
    the 8-sublane tile. Split start/wait enables double-buffered prefetch
    (scratch persists across sequential TPU grid steps).
    """
    row0 = i * br
    h_pad = n_blocks * br

    def run(dma, zero_slice):
        if do_start:
            dma.start()
            if zero_slice is not None:
                scratch[zero_slice, :] = jnp.zeros(
                    (hh, n_cols), scratch.dtype)
        if do_wait:
            dma.wait()

    @pl.when(i == 0)
    def _first():
        run(pltpu.make_async_copy(ref_hbm.at[pl.ds(0, br + hh), :],
                                  scratch.at[pl.ds(hh, br + hh), :], sem),
            slice(0, hh))

    @pl.when(jnp.logical_and(i > 0, i < n_blocks - 1))
    def _middle():
        start = pl.multiple_of(row0 - hh, _HALO)
        run(pltpu.make_async_copy(ref_hbm.at[pl.ds(start, br + 2 * hh), :],
                                  scratch.at[:, :], sem), None)

    @pl.when(jnp.logical_and(i == n_blocks - 1, i > 0))
    def _last():
        run(pltpu.make_async_copy(
            ref_hbm.at[pl.ds(h_pad - br - hh, br + hh), :],
            scratch.at[pl.ds(0, br + hh), :], sem),
            slice(br + hh, br + 2 * hh))


def _halo_dma(ref_hbm, scratch, sem, i, n_blocks, br, n_cols,
              hh: int = _HALO):
    _halo_dma_cases(ref_hbm, scratch, sem, i, n_blocks, br, n_cols,
                    do_start=True, do_wait=True, hh=hh)

def _rolled_stencil(a, s, n_cols):
    """Full-array 9-point stencil via lane/sublane rolls (wrap garbage is
    confined to halo/boundary rows and columns, which every caller masks).
    Shared by all kernels in this module.

    NB: a 'roll-minimised' variant (shared x-shifted copies, pre-combined
    row contributions: 2 lane + 2 sublane rolls) was measured SLOWER on
    v5e (0.81 -> 0.88 ms/step at br=128; 0.84 -> 1.26 at br=64) — the
    full-slab temporaries cost more than the extra rolls save. Keep the
    naive per-row-group form.
    """
    h_tot = a.shape[0]

    def row_contrib(rows, sj):
        acc = sj[1] * rows
        if sj[0] != 0.0:
            acc += sj[0] * pltpu.roll(rows, shift=1, axis=1)
        if sj[2] != 0.0:
            acc += sj[2] * pltpu.roll(rows, shift=n_cols - 1, axis=1)
        return acc

    up_rows = pltpu.roll(a, shift=1, axis=0)
    dn_rows = pltpu.roll(a, shift=h_tot - 1, axis=0)
    return row_contrib(a, s[1]) + row_contrib(up_rows, s[0]) \
        + row_contrib(dn_rows, s[2])


def _rolled_stencil_diff(a, s, n_cols):
    """Zero-row-sum stencil in DIFFERENCE form (kernel twin of
    ops/stencil.py::apply_stencil_diff): sum_{d != 0} s_d * (a_d - a),
    the center coefficient implied as -sum of neighbours. Identical
    algebra to _rolled_stencil for stiffness stencils with the
    arithmetic cancellation noise removed — used by the
    displacement-recurrence r0 pass (see apply_stencil_diff for the
    measured effect)."""
    h_tot = a.shape[0]
    up_rows = pltpu.roll(a, shift=1, axis=0)
    dn_rows = pltpu.roll(a, shift=h_tot - 1, axis=0)
    out = None
    for rows, sj in ((a, s[1]), (up_rows, s[0]), (dn_rows, s[2])):
        for k, sh in ((0, 1), (1, 0), (2, n_cols - 1)):
            if rows is a and sh == 0:
                continue
            c = sj[k]
            if c == 0.0:
                continue
            shifted = rows if sh == 0 else pltpu.roll(rows, shift=sh,
                                                      axis=1)
            t = c * (shifted - a)
            out = t if out is None else out + t
    return out if out is not None else jnp.zeros_like(a)


def _pinned_mask(row_start, shape, n_rows, true_cols):
    """Dirichlet + padding mask in global grid coordinates."""
    gr = row_start + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (gr <= 0) | (gr >= n_rows - 1) | (gc == 0) | (gc >= true_cols - 1)



def _kernel(up_ref, u_hbm, out_ref, scratch, sem, *, stencil, coef,
            block_rows: int, n_rows: int, n_cols: int, true_cols: int):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    br = block_rows
    hh = _HALO
    row0 = i * br

    _halo_dma(u_hbm, scratch, sem, i, n_blocks, br, n_cols)

    a = scratch[:, :]                       # (br + 2*hh, W), aligned read
    ku_full = _rolled_stencil(a, stencil, n_cols)
    ku = ku_full[hh:hh + br, :]
    cen = a[hh:hh + br, :]

    un = 2.0 * cen - up_ref[:, :] - coef * ku
    mask = _pinned_mask(row0, (br, n_cols), n_rows, true_cols)
    out_ref[:, :] = jnp.where(mask, 0.0, un).astype(out_ref.dtype)


def _multistep_kernel(*refs, stencil, coef, n_steps: int,
                      block_rows: int, n_rows: int, n_cols: int,
                      true_cols: int, halo: int = _HALO,
                      double_buffer: bool = False,
                      dyn_offset: bool = False):
    """Temporal blocking: advance ``n_steps`` leapfrog steps in one pass.

    Both u and u_prev are DMA'd with a ``halo``-row halo (a multiple of the
    8-sublane tile, >= n_steps); each inner step loses one halo row of
    validity, and every inner step re-applies the Dirichlet/pad mask so
    lane-roll wraparound never propagates inward. HBM traffic: read 2 +
    write 2 arrays per n_steps steps.

    With ``double_buffer`` the scratch/semaphores carry a leading slot
    dimension of 2 and block i prefetches block i+1's slabs while
    computing (TPU grid steps run sequentially on the core, so scratch
    persists between them).

    ``dyn_offset``: a traced SMEM scalar prepends the refs and shifts the
    grid-row coordinate of the Dirichlet/pad mask — the shard_map hook:
    a row-shard runs this kernel on its LOCAL (halo-padded) block while
    masking by GLOBAL row ids (parallel/halo.py), so only the true
    domain walls pin and shard seams stay transparent.
    """
    if dyn_offset:
        (row_off_ref, uprev_hbm, u_hbm, out_u_ref, out_up_ref,
         scr_u, scr_up, sem_u, sem_up) = refs
    else:
        (uprev_hbm, u_hbm, out_u_ref, out_up_ref,
         scr_u, scr_up, sem_u, sem_up) = refs
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    br = block_rows
    hh = halo
    row0 = i * br
    h_tot = br + 2 * hh

    if double_buffer:
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i == 0)
        def _prime():
            _halo_dma_cases(u_hbm, scr_u.at[0], sem_u.at[0], 0, n_blocks,
                            br, n_cols, do_start=True, do_wait=False, hh=hh)
            _halo_dma_cases(uprev_hbm, scr_up.at[0], sem_up.at[0], 0,
                            n_blocks, br, n_cols, do_start=True,
                            do_wait=False, hh=hh)

        @pl.when(i + 1 < n_blocks)
        def _prefetch():
            _halo_dma_cases(u_hbm, scr_u.at[nxt], sem_u.at[nxt], i + 1,
                            n_blocks, br, n_cols, do_start=True,
                            do_wait=False, hh=hh)
            _halo_dma_cases(uprev_hbm, scr_up.at[nxt], sem_up.at[nxt], i + 1,
                            n_blocks, br, n_cols, do_start=True,
                            do_wait=False, hh=hh)

        _halo_dma_cases(u_hbm, scr_u.at[slot], sem_u.at[slot], i, n_blocks,
                        br, n_cols, do_start=False, do_wait=True, hh=hh)
        _halo_dma_cases(uprev_hbm, scr_up.at[slot], sem_up.at[slot], i,
                        n_blocks, br, n_cols, do_start=False, do_wait=True,
                        hh=hh)
        scr_u = scr_u.at[slot]
        scr_up = scr_up.at[slot]
    else:
        _halo_dma(u_hbm, scr_u, sem_u, i, n_blocks, br, n_cols, hh=hh)
        _halo_dma(uprev_hbm, scr_up, sem_up, i, n_blocks, br, n_cols, hh=hh)

    base = row_off_ref[0] if dyn_offset else 0
    mask = _pinned_mask(base + row0 - hh, (h_tot, n_cols), n_rows,
                        true_cols)

    cur = scr_u[:, :]
    prev = scr_up[:, :]
    for _ in range(n_steps):
        ku = _rolled_stencil(cur, stencil, n_cols)
        nxt = 2.0 * cur - prev - coef * ku
        nxt = jnp.where(mask, 0.0, nxt)
        prev = cur
        cur = nxt

    out_u_ref[:, :] = cur[hh:hh + br, :].astype(out_u_ref.dtype)
    out_up_ref[:, :] = prev[hh:hh + br, :].astype(out_up_ref.dtype)


def _multistep_driven_kernel(gtb_ref, glr_hbm, uprev_hbm, u_hbm,
                             out_u_ref, out_up_ref, scr_u, scr_up, scr_g,
                             sem_u, sem_up, sem_g, *, stencil, coef,
                             n_steps: int, k_pad: int, block_rows: int,
                             n_rows: int, n_cols: int, true_cols: int,
                             halo: int):
    """Temporal blocking WITH per-substep driven Dirichlet data.

    The round-3 claim that per-sub-step boundary data is incompatible
    with wide-halo autonomy was disproven by the FWI kernels' in-kernel
    per-step source injection (ops/pallas_varcoef.py): boundary VALUES
    are injected by GLOBAL coordinates, so every slab (including the
    halo copies of boundary rows in neighbouring blocks) sees the same
    values at every inner step — shard-transparent, exactly like the
    Dirichlet mask itself.

    Boundary data layout (precomputed per chunk by the caller, XLA):
      * ``gtb``   (2 k_pad, W): row s = bottom-edge g at substep s,
        row k_pad + s = top-edge g  (full-width VMEM block, small)
      * ``glr``   (H, 128): lane s = left-edge g per grid row at substep
        s, lane 64 + s = right-edge — DMA'd with the same halo-slab
        windows as u so each block reads exactly its extended rows
    """
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    br = block_rows
    hh = halo
    row0 = i * br
    h_tot = br + 2 * hh

    _halo_dma(u_hbm, scr_u, sem_u, i, n_blocks, br, n_cols, hh=hh)
    _halo_dma(uprev_hbm, scr_up, sem_up, i, n_blocks, br, n_cols, hh=hh)
    _halo_dma(glr_hbm, scr_g, sem_g, i, n_blocks, br, 128, hh=hh)

    gr = row0 - hh + jax.lax.broadcasted_iota(jnp.int32, (h_tot, n_cols), 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, (h_tot, n_cols), 1)
    outside = (gr < 0) | (gr > n_rows - 1) | (gc > true_cols - 1)
    bot = gr == 0
    top = gr == n_rows - 1
    lft = gc == 0
    rgt = gc == true_cols - 1

    glr = scr_g[:, :]                      # (h_tot, 128)
    # extend the 128-lane edge table to slab width ONCE so the
    # per-substep column overlays become cheap lane ROTATIONS instead of
    # single-lane broadcasts (a broadcast from one lane is a cross-lane
    # shuffle Mosaic serialises; pltpu.roll is the same native rotation
    # the stencil itself uses — the round-4 'edge-restricted overlay'
    # finding: the 4 full-slab broadcast-selects cost 4.2x at k=32)
    if n_cols > 128:
        glr_ext = jnp.concatenate(
            [glr, jnp.zeros((h_tot, n_cols - 128), glr.dtype)], axis=1)
    else:
        glr_ext = glr
    # top/bottom rows exist only in slabs overlapping the domain walls —
    # a static per-launch check cannot know the block id, but the row
    # masks are all-False in interior slabs, so fold both row overlays
    # into the single outside-select via a per-substep row-value slab
    # built from sublane broadcasts (native)
    # per-substep column overlays as INCREMENTAL shift-by-1 rotations:
    # substep s needs glr lane s at the left wall (lane 0) and lane
    # 64 + s at the right wall (lane true_cols - 1). A fresh roll by
    # ~n_cols per substep is an arbitrary cross-vreg rotation Mosaic
    # lowers far slower than the stencil's shift-by-1 rolls (measured:
    # driven k=32 plateaued at ~740 us/step, 4.5x the undriven kernel).
    # Instead hoist ONE alignment roll per wall and rotate the table by
    # a single lane each substep — the same op class as the stencil's
    # own neighbour rolls, and identical values.
    lval = glr_ext                                   # lane 0 = substep 0
    rval = pltpu.roll(glr_ext,
                      shift=(true_cols - 1 - 64) % n_cols, axis=1)
    dec = n_cols - 1                                 # lane rotate by -1
    cur = scr_u[:, :]
    prev = scr_up[:, :]
    for s in range(n_steps):
        ku = _rolled_stencil(cur, stencil, n_cols)
        nxt = 2.0 * cur - prev - coef * ku
        # driven boundary overlay at substep s (global coordinates);
        # every cell the stencil leaves garbage in (roll wrap, padding,
        # halo rows beyond the domain) is covered by the overlays or the
        # final outside-zero select, so no pre-mask is needed
        nxt = jnp.where(lft, lval, nxt)
        nxt = jnp.where(rgt, rval, nxt)
        nxt = jnp.where(bot, gtb_ref[s, :][None, :], nxt)
        nxt = jnp.where(top, gtb_ref[k_pad + s, :][None, :], nxt)
        nxt = jnp.where(outside, 0.0, nxt)
        prev = cur
        cur = nxt
        if s + 1 < n_steps:
            lval = pltpu.roll(lval, shift=dec, axis=1)
            rval = pltpu.roll(rval, shift=dec, axis=1)

    out_u_ref[:, :] = cur[hh:hh + br, :].astype(out_u_ref.dtype)
    out_up_ref[:, :] = prev[hh:hh + br, :].astype(out_up_ref.dtype)


@functools.partial(jax.jit, static_argnames=("stencil", "coef", "n_steps",
                                             "block_rows", "true_rows",
                                             "true_cols", "interpret"))
def leapfrog_multistep_driven_pallas(u, u_prev, gtb, glr, *, stencil: Tuple,
                                     coef: float, n_steps: int = 8,
                                     block_rows: int = 128,
                                     true_rows: int = None,
                                     true_cols: int = None,
                                     interpret: bool = False):
    """Advance ``n_steps`` DRIVEN leapfrog steps in ONE kernel pass.

    Same padding/halo contract as :func:`leapfrog_multistep_pallas`;
    ``gtb`` is (2 * k_pad, W) with k_pad = 8-ceil(n_steps) and ``glr``
    is (H, 128) (see the kernel docstring for the layouts). n_steps is
    capped at 64 by the glr lane split (left lanes 0-63, right 64-127).
    """
    h, w = u.shape
    halo = -(-n_steps // _HALO) * _HALO
    k_pad = halo
    if not (1 <= n_steps <= 64):
        raise ValueError("n_steps must be in [1, 64]")
    if block_rows % _HALO != 0:
        raise ValueError(f"block_rows {block_rows} must be a multiple of "
                         f"{_HALO}")
    if block_rows < halo:
        raise ValueError(f"block_rows {block_rows} must be >= the "
                         f"{halo}-row halo for n_steps={n_steps}")
    if h % block_rows != 0:
        raise ValueError(f"rows {h} not a multiple of block_rows {block_rows}")
    if w % 128 != 0 and not interpret:
        raise ValueError(f"cols {w} not a multiple of 128 (pad + mask)")
    if gtb.shape != (2 * k_pad, w):
        raise ValueError(f"gtb must be (2*{k_pad}, {w}), got {gtb.shape}")
    if glr.shape != (h, 128):
        raise ValueError(f"glr must be ({h}, 128), got {glr.shape}")
    n_rows = true_rows if true_rows is not None else h
    n_cols_true = true_cols if true_cols is not None else w
    grid = h // block_rows
    if grid < 2:
        raise ValueError("need at least 2 row blocks; use the roll path")

    kernel = functools.partial(
        _multistep_driven_kernel, stencil=stencil, coef=float(coef),
        n_steps=n_steps, k_pad=k_pad, block_rows=block_rows, n_rows=n_rows,
        n_cols=w, true_cols=n_cols_true, halo=halo)

    slab = (block_rows + 2 * halo, w)
    out_u, out_up = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((2 * k_pad, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),   # gtb (small)
            pl.BlockSpec(memory_space=pltpu.ANY),    # glr in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),    # u_prev in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),    # u in HBM
        ],
        out_specs=(
            pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct(u.shape, u.dtype)),
        scratch_shapes=[
            pltpu.VMEM(slab, u.dtype), pltpu.VMEM(slab, u.dtype),
            pltpu.VMEM((block_rows + 2 * halo, 128), u.dtype),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(gtb, glr, u_prev, u)
    return out_u, out_up


def _newmark_rhs_r0_kernel(u_hbm, v_hbm, a_hbm, out_r0_ref, out_z_ref,
                           out_rn_ref, out_bn_ref, out_xn_ref, scr_u, scr_v,
                           scr_a, sem_u, sem_v, sem_a, *, k_stencil,
                           a_stencil, c_zv: float, c_za: float,
                           block_rows: int, n_rows: int, n_cols: int,
                           true_cols: int):
    """Fused Newmark solve-setup: z = u + dt v + (1/2-beta) dt^2 a,
    rhs = interior-masked -K z, r0 = rhs - A_sys(interior-masked a), plus
    the partials ||r0||^2, ||rhs||^2, ||x0||^2 for the solver's stopping
    rule — one pass over u, v, a instead of the XLA roll path's many (the
    warm start moves to a zero-initialised correction: the caller solves
    A e = r0, then a_new = masked(a) + e)."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    br = block_rows
    hh = _HALO
    row0 = i * br
    h_tot = br + 2 * hh

    _halo_dma(u_hbm, scr_u, sem_u, i, n_blocks, br, n_cols)
    _halo_dma(v_hbm, scr_v, sem_v, i, n_blocks, br, n_cols)
    _halo_dma(a_hbm, scr_a, sem_a, i, n_blocks, br, n_cols)

    pinned = _pinned_mask(row0 - hh, (h_tot, n_cols), n_rows, true_cols)
    a = scr_a[:, :]
    z = scr_u[:, :] + c_zv * scr_v[:, :] + c_za * a
    z = jnp.where(pinned, 0.0, z)      # homogeneous-Dirichlet fast path
    kz = _rolled_stencil(z, k_stencil, n_cols)
    x0 = jnp.where(pinned, 0.0, a)
    ax0 = _rolled_stencil(x0, a_stencil, n_cols)
    cen = slice(hh, hh + br)
    rhs = jnp.where(pinned, 0.0, -kz)[cen, :]
    r0c = rhs - jnp.where(pinned, 0.0, ax0)[cen, :]
    out_r0_ref[:, :] = r0c.astype(out_r0_ref.dtype)
    out_z_ref[:, :] = z[cen, :].astype(out_z_ref.dtype)

    @pl.when(i == 0)
    def _zero():
        out_rn_ref[0, 0] = jnp.zeros((), jnp.float32)
        out_bn_ref[0, 0] = jnp.zeros((), jnp.float32)
        out_xn_ref[0, 0] = jnp.zeros((), jnp.float32)

    r32 = r0c.astype(jnp.float32)
    b32 = rhs.astype(jnp.float32)
    x32 = x0[cen, :].astype(jnp.float32)
    out_rn_ref[0, 0] += jnp.sum(r32 * r32)
    out_bn_ref[0, 0] += jnp.sum(b32 * b32)
    out_xn_ref[0, 0] += jnp.sum(x32 * x32)


@functools.partial(jax.jit, static_argnames=("k_stencil", "a_stencil",
                                             "c_zv", "c_za", "block_rows",
                                             "true_rows", "true_cols",
                                             "interpret"))
def newmark_rhs_r0_pallas(u, v, a, *, k_stencil: Tuple, a_stencil: Tuple,
                          c_zv: float, c_za: float, block_rows: int = 128,
                          true_rows: int = None, true_cols: int = None,
                          interpret: bool = False):
    """Returns (r0, z, ||r0||^2, ||rhs||^2, ||x0||^2) for the implicit
    Newmark a-solve in one fused pass. Same padding contract as the
    other kernels."""
    h, w = u.shape
    if block_rows % _HALO != 0:
        raise ValueError(f"block_rows {block_rows} must be a multiple of "
                         f"{_HALO}")
    if h % block_rows != 0:
        raise ValueError(f"rows {h} not a multiple of block_rows {block_rows}")
    if w % 128 != 0 and not interpret:
        raise ValueError(f"cols {w} not a multiple of 128 (pad + mask)")
    n_rows = true_rows if true_rows is not None else h
    n_cols_true = true_cols if true_cols is not None else w
    grid = h // block_rows
    if grid < 2:
        raise ValueError("need at least 2 row blocks; use the XLA path")

    kernel = functools.partial(
        _newmark_rhs_r0_kernel, k_stencil=k_stencil, a_stencil=a_stencil,
        c_zv=float(c_zv), c_za=float(c_za), block_rows=block_rows,
        n_rows=n_rows, n_cols=w, true_cols=n_cols_true)

    slab = (block_rows + 2 * _HALO, w)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=(
            pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM(slab, u.dtype), pltpu.VMEM(slab, u.dtype),
            pltpu.VMEM(slab, u.dtype),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u, v, a)


def _recurrence_r0_kernel(u_hbm, up_hbm, out_r0_ref, out_x0_ref, out_rn_ref,
                          out_xn_ref, scr_u, scr_up, sem_u, sem_up, *,
                          k_stencil, c_u: float, c_up: float,
                          block_rows: int, n_rows: int, n_cols: int,
                          true_cols: int, mask_combo: bool = True):
    """Fused displacement-recurrence solve setup (models/fast.py::
    run_implicit_mg_2term): x0 = masked(2 u - u_prev),
    r0 = masked(DiffStencil(kneg, c_u u + c_up u_prev)) with kneg the
    -dt^2-scaled stiffness stencil in zero-row-sum difference form, plus
    the ||r0||^2 / ||x0||^2 partials for the stopping rule — one halo
    pass over (u, u_prev) instead of four XLA passes.

    ``mask_combo=False`` applies the stencil to the UNMASKED combo so
    interior rows see the true (driven) boundary values of u/u_prev —
    the driven 2-term product engine's setup
    (models/fast_engine_2term.py; wrap garbage still lands only in
    pinned output rows, which stay masked)."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    br = block_rows
    hh = _HALO
    row0 = i * br
    h_tot = br + 2 * hh

    _halo_dma(u_hbm, scr_u, sem_u, i, n_blocks, br, n_cols)
    _halo_dma(up_hbm, scr_up, sem_up, i, n_blocks, br, n_cols)

    pinned = _pinned_mask(row0 - hh, (h_tot, n_cols), n_rows, true_cols)
    u = scr_u[:, :]
    up = scr_up[:, :]
    if c_u == 1.0 and c_up == 0.0:
        combo = u
    else:
        combo = c_u * u + c_up * up
    if mask_combo:
        combo = jnp.where(pinned, 0.0, combo)
    r_full = _rolled_stencil_diff(combo, k_stencil, n_cols)
    x0 = jnp.where(pinned, 0.0, 2.0 * u - up)
    cen = slice(hh, hh + br)
    r0c = jnp.where(pinned, 0.0, r_full)[cen, :]
    x0c = x0[cen, :]
    out_r0_ref[:, :] = r0c.astype(out_r0_ref.dtype)
    out_x0_ref[:, :] = x0c.astype(out_x0_ref.dtype)

    @pl.when(i == 0)
    def _zero():
        out_rn_ref[0, 0] = jnp.zeros((), jnp.float32)
        out_xn_ref[0, 0] = jnp.zeros((), jnp.float32)

    r32 = r0c.astype(jnp.float32)
    x32 = x0c.astype(jnp.float32)
    out_rn_ref[0, 0] += jnp.sum(r32 * r32)
    out_xn_ref[0, 0] += jnp.sum(x32 * x32)


@functools.partial(jax.jit, static_argnames=("k_stencil", "c_u", "c_up",
                                             "block_rows", "true_rows",
                                             "true_cols", "interpret",
                                             "mask_combo"))
def recurrence_r0_pallas(u, u_prev, *, k_stencil: Tuple, c_u: float,
                         c_up: float, block_rows: int = 128,
                         true_rows: int = None, true_cols: int = None,
                         interpret: bool = False, mask_combo: bool = True):
    """Returns (r0, x0, ||r0||^2, ||x0||^2) for the displacement-form
    implicit step in one fused pass. ``k_stencil`` must already carry
    the -dt^2 scale; it is evaluated in difference form (zero row sum).
    ``mask_combo=False`` keeps the true boundary values visible to the
    stencil (driven problems). Same padding contract as the other
    kernels."""
    h, w = u.shape
    if block_rows % _HALO != 0:
        raise ValueError(f"block_rows {block_rows} must be a multiple of "
                         f"{_HALO}")
    if h % block_rows != 0:
        raise ValueError(f"rows {h} not a multiple of block_rows {block_rows}")
    if w % 128 != 0 and not interpret:
        raise ValueError(f"cols {w} not a multiple of 128 (pad + mask)")
    n_rows = true_rows if true_rows is not None else h
    n_cols_true = true_cols if true_cols is not None else w
    grid = h // block_rows
    if grid < 2:
        raise ValueError("need at least 2 row blocks; use the XLA path")

    kernel = functools.partial(
        _recurrence_r0_kernel, k_stencil=k_stencil, c_u=float(c_u),
        c_up=float(c_up), block_rows=block_rows, n_rows=n_rows, n_cols=w,
        true_cols=n_cols_true, mask_combo=mask_combo)

    slab = (block_rows + 2 * _HALO, w)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=(
            pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM(slab, u.dtype), pltpu.VMEM(slab, u.dtype),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u, u_prev)


def _theta_r0u_kernel(u_hbm, v_hbm, out_r0_ref, out_rn_ref, out_bn_ref,
                      out_xn_ref, scr_u, scr_v, sem_u, sem_v, *, m_stencil,
                      k_stencil, c_comb: float, c_r0k: float, c_mv: float,
                      block_rows: int, n_rows: int, n_cols: int,
                      true_cols: int):
    """Fused theta u-solve setup (homogeneous-Dirichlet fast path).

    The theta u-system (reference WaveTheta.cpp:119-186, 251-294) is
    A_u u^{n+1} = rhs_u with A_u = M + (theta dt)^2 K and
    rhs_u = M u - dt^2 th(1-th) K u + dt M v. With warm start x0 = u the
    M u terms cancel exactly, so the initial residual is

        r0 = interior( c_r0k * K u + c_mv * M v ),  c_r0k = -dt^2 theta.

    rhs itself is only needed for the stopping rule's ||rhs||, so it is
    reduced in-kernel (c_comb = -dt^2 th(1-th)) and never written. One
    halo pass over u, v replaces the XLA path's 4+ stencil passes."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    br = block_rows
    hh = _HALO
    row0 = i * br
    h_tot = br + 2 * hh

    _halo_dma(u_hbm, scr_u, sem_u, i, n_blocks, br, n_cols)
    _halo_dma(v_hbm, scr_v, sem_v, i, n_blocks, br, n_cols)

    pinned = _pinned_mask(row0 - hh, (h_tot, n_cols), n_rows, true_cols)
    u = jnp.where(pinned, 0.0, scr_u[:, :])
    v = jnp.where(pinned, 0.0, scr_v[:, :])
    ku = _rolled_stencil(u, k_stencil, n_cols)
    mu = _rolled_stencil(u, m_stencil, n_cols)
    mv = _rolled_stencil(v, m_stencil, n_cols)

    cen = slice(hh, hh + br)
    pin_c = pinned[cen, :]
    r0c = jnp.where(pin_c, 0.0, (c_r0k * ku + c_mv * mv)[cen, :])
    rhsc = jnp.where(pin_c, 0.0, (mu + c_comb * ku + c_mv * mv)[cen, :])
    out_r0_ref[:, :] = r0c.astype(out_r0_ref.dtype)

    @pl.when(i == 0)
    def _zero():
        out_rn_ref[0, 0] = jnp.zeros((), jnp.float32)
        out_bn_ref[0, 0] = jnp.zeros((), jnp.float32)
        out_xn_ref[0, 0] = jnp.zeros((), jnp.float32)

    r32 = r0c.astype(jnp.float32)
    b32 = rhsc.astype(jnp.float32)
    x32 = u[cen, :].astype(jnp.float32)
    out_rn_ref[0, 0] += jnp.sum(r32 * r32)
    out_bn_ref[0, 0] += jnp.sum(b32 * b32)
    out_xn_ref[0, 0] += jnp.sum(x32 * x32)


@functools.partial(jax.jit, static_argnames=("m_stencil", "k_stencil",
                                             "c_comb", "c_r0k", "c_mv",
                                             "block_rows", "true_rows",
                                             "true_cols", "interpret"))
def theta_r0u_pallas(u, v, *, m_stencil: Tuple, k_stencil: Tuple,
                     c_comb: float, c_r0k: float, c_mv: float,
                     block_rows: int = 128, true_rows: int = None,
                     true_cols: int = None, interpret: bool = False):
    """Returns (r0, ||r0||^2, ||rhs||^2, ||x0||^2) for the theta u-solve in
    one fused pass; the caller solves A_u e = r0 from e=0 and sets
    u_new = interior(u) + e. Same padding contract as the other kernels."""
    h, w = u.shape
    if block_rows % _HALO != 0:
        raise ValueError(f"block_rows {block_rows} must be a multiple of "
                         f"{_HALO}")
    if h % block_rows != 0:
        raise ValueError(f"rows {h} not a multiple of block_rows {block_rows}")
    if w % 128 != 0 and not interpret:
        raise ValueError(f"cols {w} not a multiple of 128 (pad + mask)")
    n_rows = true_rows if true_rows is not None else h
    n_cols_true = true_cols if true_cols is not None else w
    grid = h // block_rows
    if grid < 2:
        raise ValueError("need at least 2 row blocks; use the XLA path")

    kernel = functools.partial(
        _theta_r0u_kernel, m_stencil=m_stencil, k_stencil=k_stencil,
        c_comb=float(c_comb), c_r0k=float(c_r0k), c_mv=float(c_mv),
        block_rows=block_rows, n_rows=n_rows, n_cols=w,
        true_cols=n_cols_true)

    slab = (block_rows + 2 * _HALO, w)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        out_specs=(
            pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            smem, smem, smem,
        ),
        out_shape=(jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM(slab, u.dtype), pltpu.VMEM(slab, u.dtype),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u, v)


def _theta_r0v_kernel(u_hbm, e_hbm, v_hbm, out_un_ref, out_r0_ref,
                      out_rn_ref, out_bn_ref, out_xn_ref, scr_u, scr_e,
                      scr_v, sem_u, sem_e, sem_v, *, m_stencil, k_stencil,
                      c_ku: float, c_kun: float, block_rows: int,
                      n_rows: int, n_cols: int, true_cols: int):
    """Fused theta v-solve setup + u update.

    u_new = interior(u) + e (the u-solve's correction); the v-system is
    M v^{n+1} = rhs_v with rhs_v = M v - dt(1-th) K u - dt th K u_new
    (reference WaveTheta.cpp:188-249). With warm start x0 = v the M v
    terms cancel, so

        r0 = interior( c_ku * K u + c_kun * K u_new ),
        c_ku = -dt(1-th),  c_kun = -dt th.

    One halo pass over u, e, v emits u_new, r0 and the stopping-rule
    norms."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    br = block_rows
    hh = _HALO
    row0 = i * br
    h_tot = br + 2 * hh

    _halo_dma(u_hbm, scr_u, sem_u, i, n_blocks, br, n_cols)
    _halo_dma(e_hbm, scr_e, sem_e, i, n_blocks, br, n_cols)
    _halo_dma(v_hbm, scr_v, sem_v, i, n_blocks, br, n_cols)

    pinned = _pinned_mask(row0 - hh, (h_tot, n_cols), n_rows, true_cols)
    u = jnp.where(pinned, 0.0, scr_u[:, :])
    un = u + jnp.where(pinned, 0.0, scr_e[:, :])
    v = jnp.where(pinned, 0.0, scr_v[:, :])
    ku = _rolled_stencil(u, k_stencil, n_cols)
    kun = _rolled_stencil(un, k_stencil, n_cols)
    mv = _rolled_stencil(v, m_stencil, n_cols)

    cen = slice(hh, hh + br)
    pin_c = pinned[cen, :]
    r0c = jnp.where(pin_c, 0.0, (c_ku * ku + c_kun * kun)[cen, :])
    rhsc = jnp.where(pin_c, 0.0, (mv + c_ku * ku + c_kun * kun)[cen, :])
    out_un_ref[:, :] = un[cen, :].astype(out_un_ref.dtype)
    out_r0_ref[:, :] = r0c.astype(out_r0_ref.dtype)

    @pl.when(i == 0)
    def _zero():
        out_rn_ref[0, 0] = jnp.zeros((), jnp.float32)
        out_bn_ref[0, 0] = jnp.zeros((), jnp.float32)
        out_xn_ref[0, 0] = jnp.zeros((), jnp.float32)

    r32 = r0c.astype(jnp.float32)
    b32 = rhsc.astype(jnp.float32)
    x32 = v[cen, :].astype(jnp.float32)
    out_rn_ref[0, 0] += jnp.sum(r32 * r32)
    out_bn_ref[0, 0] += jnp.sum(b32 * b32)
    out_xn_ref[0, 0] += jnp.sum(x32 * x32)


@functools.partial(jax.jit, static_argnames=("m_stencil", "k_stencil",
                                             "c_ku", "c_kun", "block_rows",
                                             "true_rows", "true_cols",
                                             "interpret"))
def theta_r0v_pallas(u, e, v, *, m_stencil: Tuple, k_stencil: Tuple,
                     c_ku: float, c_kun: float, block_rows: int = 128,
                     true_rows: int = None, true_cols: int = None,
                     interpret: bool = False):
    """Returns (u_new, r0, ||r0||^2, ||rhs||^2, ||x0||^2) for the theta
    v-solve in one fused pass; the caller solves M e_v = r0 from e_v=0 and
    sets v_new = interior(v) + e_v."""
    h, w = u.shape
    if block_rows % _HALO != 0:
        raise ValueError(f"block_rows {block_rows} must be a multiple of "
                         f"{_HALO}")
    if h % block_rows != 0:
        raise ValueError(f"rows {h} not a multiple of block_rows {block_rows}")
    if w % 128 != 0 and not interpret:
        raise ValueError(f"cols {w} not a multiple of 128 (pad + mask)")
    n_rows = true_rows if true_rows is not None else h
    n_cols_true = true_cols if true_cols is not None else w
    grid = h // block_rows
    if grid < 2:
        raise ValueError("need at least 2 row blocks; use the XLA path")

    kernel = functools.partial(
        _theta_r0v_kernel, m_stencil=m_stencil, k_stencil=k_stencil,
        c_ku=float(c_ku), c_kun=float(c_kun), block_rows=block_rows,
        n_rows=n_rows, n_cols=w, true_cols=n_cols_true)

    slab = (block_rows + 2 * _HALO, w)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    blk = pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=(blk, blk, smem, smem, smem),
        out_shape=(jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM(slab, u.dtype), pltpu.VMEM(slab, u.dtype),
            pltpu.VMEM(slab, u.dtype),
            pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u, e, v)


def _newmark_update_kernel(z_ref, v_ref, a_ref, e_ref, out_u_ref, out_v_ref,
                           out_a_ref, *, c_ua: float, c_va: float,
                           c_van: float, block_rows: int, n_rows: int,
                           n_cols: int, true_cols: int):
    """Fused Newmark state update (pure streaming, no halo):
    a_new = masked(a) + e;  u_new = z + c_ua a_new;
    v_new = v + c_va a + c_van a_new."""
    i = pl.program_id(0)
    row0 = i * block_rows
    pinned = _pinned_mask(row0, (block_rows, n_cols), n_rows, true_cols)
    a = a_ref[:, :]
    a_new = jnp.where(pinned, 0.0, a) + e_ref[:, :]
    out_a_ref[:, :] = a_new.astype(out_a_ref.dtype)
    out_u_ref[:, :] = (z_ref[:, :] + c_ua * a_new).astype(out_u_ref.dtype)
    out_v_ref[:, :] = (v_ref[:, :] + c_va * a
                       + c_van * a_new).astype(out_v_ref.dtype)


@functools.partial(jax.jit, static_argnames=("c_ua", "c_va", "c_van",
                                             "block_rows", "true_rows",
                                             "true_cols", "interpret"))
def newmark_update_pallas(z, v, a, e, *, c_ua: float, c_va: float,
                          c_van: float, block_rows: int = 128,
                          true_rows: int = None, true_cols: int = None,
                          interpret: bool = False):
    """Returns (u_new, v_new, a_new) — one streaming pass over 4 in +
    3 out arrays (the XLA version runs ~3x off bandwidth here)."""
    h, w = z.shape
    if h % block_rows != 0:
        raise ValueError(f"rows {h} not a multiple of block_rows {block_rows}")
    n_rows = true_rows if true_rows is not None else h
    n_cols_true = true_cols if true_cols is not None else w
    grid = h // block_rows

    kernel = functools.partial(
        _newmark_update_kernel, c_ua=float(c_ua), c_va=float(c_va),
        c_van=float(c_van), block_rows=block_rows, n_rows=n_rows, n_cols=w,
        true_cols=n_cols_true)

    bs = pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[bs, bs, bs, bs],
        out_specs=(bs, bs, bs),
        out_shape=(jax.ShapeDtypeStruct(z.shape, z.dtype),) * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(z, v, a, e)


def _constrained_apply_kernel(x_hbm, out_ref, scratch, sem, *, stencil,
                              diag: float, block_rows: int, n_rows: int,
                              n_cols: int, true_cols: int,
                              diff: bool = False):
    """out = interior ? Stencil(x * interior) : diag * x — the constrained
    operator of the implicit CG path, fused into one halo-DMA pass.
    ``diff=True`` evaluates a zero-row-sum stencil in difference form
    (_rolled_stencil_diff)."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    br = block_rows
    hh = _HALO
    row0 = i * br
    h_tot = br + 2 * hh

    _halo_dma(x_hbm, scratch, sem, i, n_blocks, br, n_cols)

    a_raw = scratch[:, :]
    pinned = _pinned_mask(row0 - hh, (h_tot, n_cols), n_rows, true_cols)
    a = jnp.where(pinned, 0.0, a_raw)
    ku_full = (_rolled_stencil_diff(a, stencil, n_cols) if diff
               else _rolled_stencil(a, stencil, n_cols))
    out = jnp.where(pinned[hh:hh + br, :], diag * a_raw[hh:hh + br, :],
                    ku_full[hh:hh + br, :])
    out_ref[:, :] = out.astype(out_ref.dtype)


def _cheby_block_kernel(x_ref, r_hbm, out_x_ref, out_r_ref, out_rn_ref,
                        scr_r, sem, *, stencil, theta: float, coeffs,
                        block_rows: int, n_rows: int, n_cols: int,
                        true_cols: int, halo: int):
    """One restarted Chebyshev block (degree = 1 + len(coeffs)) fused into
    a single halo-DMA pass: the solver analogue of the temporal-blocking
    leapfrog kernel. Only r needs a halo (it feeds the stencil); x is
    touched elementwise, so its block streams in/out without halo. The
    Dirichlet/pad mask is re-applied to r after every stencil so lane-roll
    wraparound never propagates inward; slab-edge wrap garbage advances one
    row per stencil and dies in the >= degree-row halo. The residual
    norm^2 accumulates across the (sequential) grid into a (1,1) output —
    the stopping check costs no extra HBM pass."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    br = block_rows
    hh = halo
    row0 = i * br
    h_tot = br + 2 * hh

    _halo_dma(r_hbm, scr_r, sem, i, n_blocks, br, n_cols, hh=hh)

    pinned = _pinned_mask(row0 - hh, (h_tot, n_cols), n_rows, true_cols)
    r = jnp.where(pinned, 0.0, scr_r[:, :])
    d = (1.0 / theta) * r
    xc = x_ref[:, :] + d[hh:hh + br, :]
    r = jnp.where(pinned, 0.0, r - _rolled_stencil(d, stencil, n_cols))
    for c1, c2 in coeffs:
        d = c1 * d + c2 * r
        xc = xc + d[hh:hh + br, :]
        r = jnp.where(pinned, 0.0, r - _rolled_stencil(d, stencil, n_cols))

    out_x_ref[:, :] = xc.astype(out_x_ref.dtype)
    rc = r[hh:hh + br, :]
    out_r_ref[:, :] = rc.astype(out_r_ref.dtype)

    @pl.when(i == 0)
    def _zero():
        out_rn_ref[0, 0] = jnp.zeros((), jnp.float32)

    rc32 = rc.astype(jnp.float32)
    out_rn_ref[0, 0] += jnp.sum(rc32 * rc32)


@functools.partial(jax.jit, static_argnames=("stencil", "theta", "coeffs",
                                             "block_rows", "true_rows",
                                             "true_cols", "interpret"))
def cheby_block_pallas(x, r, *, stencil: Tuple, theta: float, coeffs: Tuple,
                       block_rows: int = 128, true_rows: int = None,
                       true_cols: int = None, interpret: bool = False):
    """Advance one restarted Chebyshev block on the constrained stencil
    system: returns (x_new, r_new, ||r_new||^2 as f32 scalar).

    ``theta``/``coeffs`` come from solve/cheby_iter.py::
    chebyshev_coefficients — data-independent scalars baked in as kernel
    constants (the property that makes the solver fusable at all). Same
    padding contract as the other kernels; ``r`` must be zero on pinned
    rows (every fast-path solve constructs it that way).
    """
    h, w = x.shape
    degree = 1 + len(coeffs)
    halo = -(-degree // _HALO) * _HALO
    if block_rows % _HALO != 0:
        raise ValueError(f"block_rows {block_rows} must be a multiple of "
                         f"{_HALO}")
    if block_rows < halo:
        raise ValueError(f"block_rows {block_rows} must be >= the "
                         f"{halo}-row halo for degree {degree}")
    if h % block_rows != 0:
        raise ValueError(f"rows {h} not a multiple of block_rows {block_rows}")
    if w % 128 != 0 and not interpret:
        raise ValueError(f"cols {w} not a multiple of 128 (pad + mask)")
    n_rows = true_rows if true_rows is not None else h
    n_cols_true = true_cols if true_cols is not None else w
    grid = h // block_rows
    if grid < 2:
        raise ValueError("need at least 2 row blocks; use the XLA path")

    kernel = functools.partial(
        _cheby_block_kernel, stencil=stencil, theta=float(theta),
        coeffs=tuple(coeffs), block_rows=block_rows, n_rows=n_rows,
        n_cols=w, true_cols=n_cols_true, halo=halo)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),   # x block
            pl.BlockSpec(memory_space=pltpu.ANY),    # r in HBM (halo DMA)
        ],
        out_specs=(
            pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(r.shape, r.dtype),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((block_rows + 2 * halo, w), r.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, r)


@functools.partial(jax.jit, static_argnames=("stencil", "diag", "block_rows",
                                             "true_rows", "true_cols",
                                             "interpret", "diff"))
def constrained_stencil_apply_pallas(x, *, stencil: Tuple, diag: float,
                                     block_rows: int = 128,
                                     true_rows: int = None,
                                     true_cols: int = None,
                                     interpret: bool = False,
                                     diff: bool = False):
    """Fused constrained stencil apply on a padded (H, W) grid.

    Equivalent to the masked operator used by the implicit fast path:
    interior rows get Stencil(interior-masked x), Dirichlet/pad rows get
    diag * x. One halo-DMA pass per apply — the hot op of every CG
    iteration in the implicit schemes. ``diff=True`` evaluates a
    zero-row-sum stencil in difference form (low f32 cancellation
    noise; see _rolled_stencil_diff).
    """
    h, w = x.shape
    if block_rows % _HALO != 0:
        raise ValueError(f"block_rows {block_rows} must be a multiple of "
                         f"{_HALO}")
    if h % block_rows != 0:
        raise ValueError(f"rows {h} not a multiple of block_rows {block_rows}")
    if w % 128 != 0 and not interpret:
        raise ValueError(f"cols {w} not a multiple of 128 (pad + mask)")
    n_rows = true_rows if true_rows is not None else h
    n_cols_true = true_cols if true_cols is not None else w
    grid = h // block_rows
    if grid < 2:
        raise ValueError("need at least 2 row blocks; use the roll path")

    kernel = functools.partial(
        _constrained_apply_kernel, stencil=stencil, diag=float(diag),
        block_rows=block_rows, n_rows=n_rows, n_cols=w,
        true_cols=n_cols_true, diff=diff)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_rows + 2 * _HALO, w), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x)


@functools.partial(jax.jit, static_argnames=("stencil", "coef", "n_steps",
                                             "block_rows", "true_rows",
                                             "true_cols", "interpret",
                                             "double_buffer"))
def leapfrog_multistep_pallas(u, u_prev, row_offset=None, *, stencil: Tuple,
                              coef: float,
                              n_steps: int = 4, block_rows: int = 128,
                              true_rows: int = None, true_cols: int = None,
                              interpret: bool = False,
                              double_buffer: bool = False):
    """Advance n_steps fused leapfrog steps in ONE kernel pass.

    Returns (u_new, u_prev_new). Same padding contract as
    leapfrog_step_pallas. The halo height is 8*ceil(n_steps/8) rows (the
    validity shrinks one halo row per inner step); the Dirichlet mask is
    re-applied every inner step so roll wraparound never propagates inward.

    Practical TPU envelope (v5e, measured): n_steps=32 with
    block_rows=128 is the sweet spot — the kernel is VPU compute-bound
    there, so larger k only adds redundant halo compute. block_rows=256
    and n_steps>=48 are rejected by the Mosaic compiler at wide halos.

    ``row_offset`` (traced int scalar, optional): global grid row of the
    input's row 0 — for running the kernel on a row-shard's local,
    halo-padded block inside shard_map: the Dirichlet/pad mask pins by
    GLOBAL rows (true_rows = the global height), so shard seams are
    transparent and the exchanged halo rows absorb the validity shrink
    (parallel/halo.py::make_multistep_halo_leapfrog(engine="pallas")).
    """
    h, w = u.shape
    halo = -(-n_steps // _HALO) * _HALO
    if n_steps < 1:
        raise ValueError("n_steps must be >= 1")
    if block_rows % _HALO != 0:
        raise ValueError(f"block_rows {block_rows} must be a multiple of "
                         f"{_HALO} (sublane DMA alignment)")
    if block_rows < halo:
        raise ValueError(f"block_rows {block_rows} must be >= the "
                         f"{halo}-row halo for n_steps={n_steps}")
    if h % block_rows != 0:
        raise ValueError(f"rows {h} not a multiple of block_rows {block_rows}")
    if w % 128 != 0 and not interpret:
        raise ValueError(f"cols {w} not a multiple of 128 (pad + mask)")
    n_rows = true_rows if true_rows is not None else h
    n_cols_true = true_cols if true_cols is not None else w
    grid = h // block_rows
    if grid < 2:
        raise ValueError("need at least 2 row blocks; use the roll path")
    dyn = row_offset is not None

    kernel = functools.partial(
        _multistep_kernel, stencil=stencil, coef=float(coef),
        n_steps=n_steps, block_rows=block_rows, n_rows=n_rows, n_cols=w,
        true_cols=n_cols_true, halo=halo, double_buffer=double_buffer,
        dyn_offset=dyn)

    slab = (block_rows + 2 * halo, w)
    if double_buffer:
        scratch = [pltpu.VMEM((2,) + slab, u.dtype),
                   pltpu.VMEM((2,) + slab, u.dtype),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.SemaphoreType.DMA((2,))]
    else:
        scratch = [pltpu.VMEM(slab, u.dtype), pltpu.VMEM(slab, u.dtype),
                   pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),   # u_prev in HBM
        pl.BlockSpec(memory_space=pltpu.ANY),   # u in HBM
    ]
    args = (u_prev, u)
    if dyn:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (jnp.asarray(row_offset, jnp.int32).reshape(1),) + args

    out_u, out_up = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct(u.shape, u.dtype)),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out_u, out_up


@functools.partial(jax.jit, static_argnames=("stencil", "coef", "block_rows",
                                             "true_rows", "true_cols",
                                             "interpret"))
def leapfrog_step_pallas(u, u_prev, *, stencil: Tuple, coef: float,
                         block_rows: int = 128, true_rows: int = None,
                         true_cols: int = None, interpret: bool = False):
    """One fused leapfrog step. u, u_prev: (H, W) with H % block_rows == 0
    and W % 128 == 0 (Mosaic lane tiling — pad and mask).

    ``true_rows``/``true_cols``: the physical grid extents (<= H/W); nodes
    beyond them are padding forced to zero. ``stencil``: 3x3 tuple-of-tuples
    of floats; ``coef`` = dt^2 / lumped_interior.
    """
    h, w = u.shape
    if block_rows % _HALO != 0:
        raise ValueError(f"block_rows {block_rows} must be a multiple of "
                         f"{_HALO} (sublane DMA alignment)")
    if h % block_rows != 0:
        raise ValueError(f"rows {h} not a multiple of block_rows {block_rows}")
    if w % 128 != 0 and not interpret:
        raise ValueError(f"cols {w} not a multiple of 128 (pad + mask)")
    n_rows = true_rows if true_rows is not None else h
    n_cols_true = true_cols if true_cols is not None else w
    grid = h // block_rows
    if grid < 2:
        raise ValueError("need at least 2 row blocks; use the roll path")

    kernel = functools.partial(
        _kernel, stencil=stencil, coef=float(coef), block_rows=block_rows,
        n_rows=n_rows, n_cols=w, true_cols=n_cols_true)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),   # u_prev block
            pl.BlockSpec(memory_space=pltpu.ANY),    # u stays in HBM
        ],
        out_specs=pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_rows + 2 * _HALO, w), u.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(u_prev, u)
