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
           "varcoef_adjoint_step_pallas",
           "varcoef_leapfrog_multistep_pallas",
           "varcoef_adjoint_multistep_pallas"]

# (dx, dy) neighbour offsets; plane j multiplies u[r + dy_j, c + dx_j]
OFFSETS = ((0, 0), (-1, 0), (1, 0), (0, -1), (-1, -1), (0, 1), (1, 1))


def _varcoef_stencil(a, planes, n_cols, hh, br):
    """(K u) on the ``br`` centre rows of the halo slab ``a``
    ((br+2hh, W)) with coefficient planes ``planes`` ((7, br, W)) in
    ``OFFSETS`` order. Wrap garbage lands only on boundary/padding
    rows/cols, which every caller masks."""
    s = _slab_shifts(a, n_cols)
    c = slice(hh, hh + br)
    return (planes[0] * s[0][c] + planes[1] * s[1][c]
            + planes[2] * s[2][c] + planes[3] * s[3][c]
            + planes[4] * s[4][c] + planes[5] * s[5][c]
            + planes[6] * s[6][c])


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


def _halo_dma3(ref_hbm, scratch, sem, i, n_blocks, br, n_cols,
               hh: int):
    """3D variant of pallas_kernels._halo_dma for the (7, H, W) coefficient
    planes: scratch[:, hh + r, :] = ref[:, i*br + r, :] with ``hh`` halo
    rows above/below (zeros outside the array)."""
    row0 = i * br
    h_pad = n_blocks * br
    n_planes = scratch.shape[0]

    def run(dma, zero_slice):
        dma.start()
        if zero_slice is not None:
            scratch[:, zero_slice, :] = jnp.zeros(
                (n_planes, hh, n_cols), scratch.dtype)
        dma.wait()

    @pl.when(i == 0)
    def _first():
        run(pltpu.make_async_copy(ref_hbm.at[:, pl.ds(0, br + hh), :],
                                  scratch.at[:, pl.ds(hh, br + hh), :],
                                  sem),
            slice(0, hh))

    @pl.when(jnp.logical_and(i > 0, i < n_blocks - 1))
    def _middle():
        start = pl.multiple_of(row0 - hh, _HALO)
        run(pltpu.make_async_copy(
            ref_hbm.at[:, pl.ds(start, br + 2 * hh), :],
            scratch.at[:, :, :], sem), None)

    @pl.when(jnp.logical_and(i == n_blocks - 1, i > 0))
    def _last():
        run(pltpu.make_async_copy(
            ref_hbm.at[:, pl.ds(h_pad - br - hh, br + hh), :],
            scratch.at[:, pl.ds(0, br + hh), :], sem),
            slice(br + hh, br + 2 * hh))


def _varcoef_multistep_kernel(srcinfo_ref, wchunk_ref, u_hbm, up_hbm,
                              planes_hbm, out_u_ref, out_up_ref,
                              out_rec_ref, *rest, coef, n_steps: int,
                              rec_rows: Tuple[int, ...], block_rows: int,
                              n_rows: int, n_cols: int, true_cols: int,
                              halo: int, damped: bool = False,
                              ring: Optional[Tuple[int, ...]] = None):
    """Temporal blocking for the VARIABLE-coefficient leapfrog: advance
    ``n_steps`` steps in one HBM pass. u, u_prev AND the 7 coefficient
    planes are DMA'd with a ``halo``-row halo (validity shrinks one row
    per inner step; the Dirichlet/pad mask is re-applied each step).
    Per-pass HBM traffic: read 9 + write 2 slabs + the receiver strip —
    ~(11/n_steps + strip) arrays per step instead of the single-step
    kernel's 10.

    Source injection happens in-kernel every inner step over the whole
    slab (an iota-mask add, so a source row inside a neighbour block's
    halo is handled too); ``srcinfo`` = (src_r, src_c) int32 in SMEM,
    ``wchunk`` = (n_steps,) wavelet samples in SMEM. Receiver rows
    (static ``rec_rows``, global grid rows) are written after every
    inner step into out_rec (n_steps, len(rec_rows), W) by the block
    owning each row (centre rows are always inside the validity
    region).

    ``damped`` (sponge): the planes slab carries 9 planes —
    [0:7] dden-folded stencil planes, [7] p2 = 2*dden,
    [8] pm = dden*dnum — and the update becomes
    nxt = p2*cur - pm*prev - coef*K'(cur) with the source picking up
    its dden factor from p2/2. ``ring`` = (rA, rB, cA, cB) additionally
    streams the interface-ring values out per inner step (rows via the
    rec-row mechanism into out_ring_rows (n_steps, 2, W); cols into the
    block-sliced out_ring_cols (n_steps, H, 128) lanes 0/1) for the
    backward pass's boundary-saving reconstruction.
    """
    if ring is not None:
        (out_rr_ref, out_rc_ref, scr_u, scr_up, scr_p,
         sem_u, sem_up, sem_p) = rest
    else:
        scr_u, scr_up, scr_p, sem_u, sem_up, sem_p = rest
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    br = block_rows
    hh = halo
    row0 = i * br
    h_tot = br + 2 * hh

    _halo_dma(u_hbm, scr_u, sem_u, i, n_blocks, br, n_cols, hh=hh)
    _halo_dma(up_hbm, scr_up, sem_up, i, n_blocks, br, n_cols, hh=hh)
    _halo_dma3(planes_hbm, scr_p, sem_p, i, n_blocks, br, n_cols, hh=hh)

    mask = _pinned_mask(row0 - hh, (h_tot, n_cols), n_rows, true_cols)
    planes_all = scr_p[:, :, :]
    if damped:
        planes = planes_all[0:7]
        p2 = planes_all[7]
        pm = planes_all[8]
    else:
        planes = planes_all

    # slab-global source selector (handles a source inside halo rows)
    gr = row0 - hh + jax.lax.broadcasted_iota(jnp.int32,
                                              (h_tot, n_cols), 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, (h_tot, n_cols), 1)
    src_sel = jnp.where((gr == srcinfo_ref[0]) & (gc == srcinfo_ref[1]),
                        jnp.asarray(coef, scr_u.dtype), 0.0)
    if damped:
        src_sel = src_sel * (0.5 * p2)   # dden at the source point

    cur = scr_u[:, :]
    prev = scr_up[:, :]
    for s in range(n_steps):
        ku = _varcoef_stencil_slab(cur, planes, n_cols)
        if damped:
            nxt = p2 * cur - pm * prev - coef * ku
        else:
            nxt = 2.0 * cur - prev - coef * ku
        nxt = jnp.where(mask, 0.0, nxt) + wchunk_ref[s] * src_sel
        prev = cur
        cur = nxt
        for j, rr in enumerate(rec_rows):
            owner = rr // br
            local = hh + rr - owner * br

            @pl.when(i == owner)
            def _write_rec(j=j, local=local, s=s, cur=cur):
                out_rec_ref[s, j, :] = cur[local, :].astype(
                    out_rec_ref.dtype)
        if ring is not None:
            rA, rB, cA, cB = ring
            for j, rr in enumerate((rA, rB)):
                owner = rr // br
                local = hh + rr - owner * br

                @pl.when(i == owner)
                def _write_ring_row(j=j, local=local, s=s, cur=cur):
                    out_rr_ref[s, j, :] = cur[local, :].astype(
                        out_rr_ref.dtype)

            li = jax.lax.broadcasted_iota(jnp.int32, (br, 128), 1)
            ca = cur[hh:hh + br, cA:cA + 1]
            cb = cur[hh:hh + br, cB:cB + 1]
            zero = jnp.zeros((), cur.dtype)
            out_rc_ref[s, :, :] = (jnp.where(li == 0, ca, zero)
                                   + jnp.where(li == 1, cb, zero)).astype(
                out_rc_ref.dtype)

    out_u_ref[:, :] = cur[hh:hh + br, :].astype(out_u_ref.dtype)
    out_up_ref[:, :] = prev[hh:hh + br, :].astype(out_up_ref.dtype)


def _slab_shifts(a, n_cols):
    """The 7 OFFSETS-ordered shifted views of the full slab ``a``:
    (cen, left(cen), right(cen), up, left(up), dn, right(dn))."""
    h_tot = a.shape[0]
    up = pltpu.roll(a, shift=1, axis=0)           # u[r-1, c]
    dn = pltpu.roll(a, shift=h_tot - 1, axis=0)   # u[r+1, c]

    def left(x):
        return pltpu.roll(x, shift=1, axis=1)

    def right(x):
        return pltpu.roll(x, shift=n_cols - 1, axis=1)

    return (a, left(a), right(a), up, left(up), dn, right(dn))


def _varcoef_stencil_slab(a, planes, n_cols, shifts=None):
    """Full-slab variable-coefficient stencil (planes cover the same
    halo'd slab as ``a``): out[r] = sum_d planes_d[r] * u[r + d].
    ``shifts``: optionally pass precomputed ``_slab_shifts(a, n_cols)``
    (the adjoint multistep kernel reuses them for the wbar correlation)."""
    s = shifts if shifts is not None else _slab_shifts(a, n_cols)
    return (planes[0] * s[0]
            + planes[1] * s[1] + planes[2] * s[2]
            + planes[3] * s[3] + planes[4] * s[4]
            + planes[5] * s[5] + planes[6] * s[6])


@functools.partial(jax.jit, static_argnames=(
    "coef", "n_steps", "rec_rows", "block_rows", "true_rows", "true_cols",
    "interpret", "ring"))
def varcoef_leapfrog_multistep_pallas(u, u_prev, planes, wchunk, srcinfo,
                                      *, coef: float, n_steps: int,
                                      rec_rows: Tuple[int, ...],
                                      block_rows: int = 128,
                                      true_rows: int = None,
                                      true_cols: int = None,
                                      interpret: bool = False,
                                      ring: Optional[Tuple[int, ...]]
                                      = None):
    """Advance ``n_steps`` fused variable-coefficient leapfrog steps in
    ONE kernel pass (see ``_varcoef_multistep_kernel``). Returns
    (u_new, u_prev_new, rec_strip) with rec_strip of shape
    (n_steps, len(rec_rows), W) holding the full receiver grid rows
    after every inner step (sample columns outside).

    ``wchunk``: (n_steps,) source-wavelet samples; ``srcinfo``: (2,)
    int32 (src_row, src_col) — both live in SMEM so they may be traced
    values (vmapped shots).

    Sponge mode: pass 9 ``planes`` ([0:7] dden-folded stencil planes,
    [7] p2 = 2*dden, [8] pm = dden*dnum; detected from the leading
    extent) for the damped update, and ``ring`` = (rA, rB, cA, cB) to
    additionally return (ring_rows (n_steps, 2, W), ring_cols
    (n_steps, H, 128) with lanes 0/1 = cols cA/cB) — the per-step
    interface-ring saves for boundary-saving reconstruction."""
    h, w = u.shape
    halo = -(-n_steps // _HALO) * _HALO
    _validate(h, w, block_rows, interpret)
    if block_rows < halo:
        raise ValueError(f"block_rows {block_rows} must be >= the "
                         f"{halo}-row halo for n_steps={n_steps}")
    if h < block_rows + 2 * halo:
        raise ValueError(f"rows {h} must be >= block_rows + 2*halo = "
                         f"{block_rows + 2 * halo} for n_steps={n_steps}")
    n_rows = true_rows if true_rows is not None else h
    n_cols_true = true_cols if true_cols is not None else w
    grid = h // block_rows
    n_planes = planes.shape[0]
    damped = n_planes == 9

    kernel = functools.partial(
        _varcoef_multistep_kernel, coef=float(coef), n_steps=n_steps,
        rec_rows=tuple(rec_rows), block_rows=block_rows, n_rows=n_rows,
        n_cols=w, true_cols=n_cols_true, halo=halo, damped=damped,
        ring=None if ring is None else tuple(int(x) for x in ring))

    block2 = pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    rec_spec = pl.BlockSpec((n_steps, max(len(rec_rows), 1), w),
                            lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    slab = (block_rows + 2 * halo, w)

    out_specs = (block2, block2, rec_spec)
    out_shape = (jax.ShapeDtypeStruct(u.shape, u.dtype),
                 jax.ShapeDtypeStruct(u.shape, u.dtype),
                 jax.ShapeDtypeStruct(
                     (n_steps, max(len(rec_rows), 1), w), u.dtype))
    if ring is not None:
        out_specs = out_specs + (
            pl.BlockSpec((n_steps, 2, w), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_steps, block_rows, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM))
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((n_steps, 2, w), u.dtype),
            jax.ShapeDtypeStruct((n_steps, h, 128), u.dtype))

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),   # srcinfo
                  pl.BlockSpec(memory_space=pltpu.SMEM),   # wchunk
                  pl.BlockSpec(memory_space=pltpu.ANY),    # u
                  pl.BlockSpec(memory_space=pltpu.ANY),    # u_prev
                  pl.BlockSpec(memory_space=pltpu.ANY)],   # planes
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM(slab, u.dtype),
                        pltpu.VMEM(slab, u.dtype),
                        pltpu.VMEM((n_planes,) + slab, u.dtype),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(srcinfo, wchunk, u, u_prev, planes)


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


def _adjoint_multistep_kernel(srcinfo_ref, wchunk_ref, inj_ref, wbar_ref,
                              unext_hbm, ucur_hbm, lam_hbm, lpart_hbm,
                              planes_hbm, *rest, coef, n_steps: int,
                              rec_groups: Tuple, block_rows: int,
                              n_rows: int, n_cols: int, true_cols: int,
                              halo: int, damped: bool = False,
                              ring: Optional[Tuple[int, ...]] = None):
    """Temporal blocking for the FWI BACKWARD pass: ``n_steps`` fused
    reverse steps per HBM pass. Each inner step (time-descending order;
    the caller pre-reverses the per-chunk wavelet/cotangent rows) is the
    exact ``_adjoint_kernel`` body over the shrinking-validity slab:

      wavbar[s] = coef * lam[src]                     (pre-update lam)
      blam      = mask0(lam)
      lam'      = mask0(lpart + 2 blam - coef K(blam)) + receiver inject
      u_prev    = mask0(2 B - A - coef K(B)) + coef w[s] at src
      wbar_d   -= (coef blam)|int * shift(B, d)|int   (interior rows only)
      (A, B, lam, lpart) <- (B, u_prev, lam', -blam)

    Validity shrinks one row per step; ``halo`` >= n_steps keeps the
    block interior exact for all inner steps. Source position arrives in
    SMEM (traced, vmap-able over shots); receiver injection points are
    static, grouped by grid row (``rec_groups`` =
    ((row, ((col, flat_idx), ...)), ...) with inj_ref[s, flat_idx] the
    pre-weighted cotangent) so each inner step costs one slab select per
    distinct receiver row plus (1, W) lane work per point.

    ``damped`` (sponge): the planes slab carries 9 planes ([0:7] plain
    stencil planes for K, [7] dden, [8] dnum); the lambda recursion runs
    the exact damped-leapfrog transpose (dden folded into blam before
    the mask, dnum on the u_prev-cotangent leg). ``ring`` = (rA, rB,
    cA, cB) switches the reconstruction to boundary saving: after the
    undamped u_prev formula, everything strictly outside the
    [rA..rB]x[cA..cB] bounding box is zeroed and the saved ring values
    are restored (cols first, then rows) from the forward pass's
    storage — ring rows arrive whole in VMEM (n_steps, 2, W), ring cols
    via a halo'd (n_steps, h_tot, 128) DMA so halo rows restore too.
    """
    if ring is not None:
        (rr_ref, rc_hbm, unext_out_ref, ucur_out_ref,
         lam_out_ref, lpart_out_ref, wbar_out_ref, wavbar_out_ref,
         scr_a, scr_b, scr_l, scr_p, scr_pl, scr_c,
         sem_a, sem_b, sem_l, sem_p, sem_pl, sem_c) = rest
    else:
        (unext_out_ref, ucur_out_ref, lam_out_ref, lpart_out_ref,
         wbar_out_ref, wavbar_out_ref,
         scr_a, scr_b, scr_l, scr_p, scr_pl,
         sem_a, sem_b, sem_l, sem_p, sem_pl) = rest
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    br = block_rows
    hh = halo
    row0 = i * br
    h_tot = br + 2 * hh

    _halo_dma(unext_hbm, scr_a, sem_a, i, n_blocks, br, n_cols, hh=hh)
    _halo_dma(ucur_hbm, scr_b, sem_b, i, n_blocks, br, n_cols, hh=hh)
    _halo_dma(lam_hbm, scr_l, sem_l, i, n_blocks, br, n_cols, hh=hh)
    _halo_dma(lpart_hbm, scr_p, sem_p, i, n_blocks, br, n_cols, hh=hh)
    _halo_dma3(planes_hbm, scr_pl, sem_pl, i, n_blocks, br, n_cols, hh=hh)
    if ring is not None:
        _halo_dma3(rc_hbm, scr_c, sem_c, i, n_blocks, br, 128, hh=hh)

    mask = _pinned_mask(row0 - hh, (h_tot, n_cols), n_rows, true_cols)
    planes_all = scr_pl[:, :, :]
    if damped:
        planes = planes_all[0:7]
        dd = planes_all[7]
        dn = planes_all[8]
    else:
        planes = planes_all

    gr = row0 - hh + jax.lax.broadcasted_iota(jnp.int32,
                                              (h_tot, n_cols), 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, (h_tot, n_cols), 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_cols), 1)
    src_r, src_c = srcinfo_ref[0], srcinfo_ref[1]
    src_sel = jnp.where((gr == src_r) & (gc == src_c),
                        jnp.asarray(coef, scr_b.dtype), 0.0)
    in_owner = jnp.logical_and(src_r >= row0, src_r < row0 + br)
    # interior-row restriction for the wavbar source read
    int_row = (gr >= row0) & (gr < row0 + br)

    a = scr_a[:, :]        # u_next
    b = scr_b[:, :]        # u_cur
    lam = scr_l[:, :]
    lpart = scr_p[:, :]
    wbar = wbar_ref[:, :, :]
    zero = jnp.zeros((), b.dtype)

    for s in range(n_steps):
        # wavbar = coef * (dden*lam)[src]; the source is validated to sit
        # outside the sponge, where dden == 1, so no damped variant needed
        val = coef * jnp.sum(jnp.where(
            (gr == src_r) & (gc == src_c) & int_row, lam, zero))

        @pl.when(in_owner)
        def _write_wavbar(s=s, val=val):
            wavbar_out_ref[0, s] = val.astype(wavbar_out_ref.dtype)

        blam = jnp.where(mask, zero, (dd * lam) if damped else lam)
        k_blam = _varcoef_stencil_slab(blam, planes, n_cols)
        b_shifts = _slab_shifts(b, n_cols)
        k_b = _varcoef_stencil_slab(b, planes, n_cols, shifts=b_shifts)
        lam_new = jnp.where(mask, zero, lpart + 2.0 * blam - coef * k_blam)
        for rr, pts in rec_groups:
            rowvec = zero[None, None]
            for cc, p in pts:
                rowvec = rowvec + inj_ref[s, p] * jnp.where(
                    col_iota == cc, jnp.asarray(1.0, b.dtype), zero)
            lam_new = lam_new + jnp.where(gr == rr, rowvec, zero)
        u_prev = (jnp.where(mask, zero, 2.0 * b - a - coef * k_b)
                  + wchunk_ref[s] * src_sel)
        if ring is not None:
            # boundary saving: zero the deep sponge (strictly outside the
            # ring bounding box), restore saved cols then rows
            rA, rB, cA, cB = ring
            u_prev = jnp.where((gr < rA) | (gr > rB)
                               | (gc < cA) | (gc > cB), zero, u_prev)
            u_prev = jnp.where(gc == cA, scr_c[s, :, 0:1], u_prev)
            u_prev = jnp.where(gc == cB, scr_c[s, :, 1:2], u_prev)
            u_prev = jnp.where(gr == rA, rr_ref[s, 0:1, :], u_prev)
            u_prev = jnp.where(gr == rB, rr_ref[s, 1:2, :], u_prev)

        mu = coef * blam[hh:hh + br, :]
        wbar = jnp.stack([wbar[j] - mu * b_shifts[j][hh:hh + br, :]
                          for j in range(7)])

        a, b, lam, lpart = (b, u_prev, lam_new,
                            -(dn * blam) if damped else -blam)

    unext_out_ref[:, :] = a[hh:hh + br, :].astype(unext_out_ref.dtype)
    ucur_out_ref[:, :] = b[hh:hh + br, :].astype(ucur_out_ref.dtype)
    lam_out_ref[:, :] = lam[hh:hh + br, :].astype(lam_out_ref.dtype)
    lpart_out_ref[:, :] = lpart[hh:hh + br, :].astype(lpart_out_ref.dtype)
    wbar_out_ref[:, :, :] = wbar.astype(wbar_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "coef", "n_steps", "rec_groups", "block_rows", "true_rows",
    "true_cols", "interpret", "ring"))
def varcoef_adjoint_multistep_pallas(u_next, u_cur, lam, lam_partial,
                                     planes, wbar, wchunk, inj, srcinfo,
                                     ring_rows=None, ring_cols=None,
                                     *, coef: float, n_steps: int,
                                     rec_groups: Tuple,
                                     block_rows: int = 128,
                                     true_rows: int = None,
                                     true_cols: int = None,
                                     interpret: bool = False,
                                     ring: Optional[Tuple[int, ...]]
                                     = None):
    """Advance ``n_steps`` fused FWI backward steps in ONE kernel pass
    (see ``_adjoint_multistep_kernel``). Returns (u_next', u_cur', lam',
    lam_partial', wbar', wavbar) with wavbar of shape (n_steps,) —
    the wavelet cotangents in the kernel's (time-descending) step order.
    ``wbar`` is donated in-place.

    wchunk : (n_steps,) wavelet samples, inj : (n_steps, P) pre-weighted
    receiver cotangent values, srcinfo : (2,) int32 — all SMEM so they
    may be traced (vmapped shots). ``rec_groups`` is the static
    row-grouped injection layout ((row, ((col, flat_idx), ...)), ...).

    Sponge mode: pass 9 ``planes`` ([0:7] PLAIN stencil planes,
    [7] dden, [8] dnum) for the damped lambda transpose, plus ``ring``
    = (rA, rB, cA, cB) with the forward pass's per-step saves
    ``ring_rows`` (n_steps, 2, W) / ``ring_cols`` (n_steps, H, 128),
    both in the kernel's time-descending order (row s = ring of the
    state u_{m_s - 1} being reconstructed at inner step s).
    """
    h, w = u_next.shape
    halo = -(-n_steps // _HALO) * _HALO
    _validate(h, w, block_rows, interpret)
    if block_rows < halo:
        raise ValueError(f"block_rows {block_rows} must be >= the "
                         f"{halo}-row halo for n_steps={n_steps}")
    if h < block_rows + 2 * halo:
        raise ValueError(f"rows {h} must be >= block_rows + 2*halo = "
                         f"{block_rows + 2 * halo} for n_steps={n_steps}")
    n_rows = true_rows if true_rows is not None else h
    n_cols_true = true_cols if true_cols is not None else w
    grid = h // block_rows
    n_planes = planes.shape[0]
    damped = n_planes == 9

    kernel = functools.partial(
        _adjoint_multistep_kernel, coef=float(coef), n_steps=n_steps,
        rec_groups=tuple(rec_groups), block_rows=block_rows,
        n_rows=n_rows, n_cols=w, true_cols=n_cols_true, halo=halo,
        damped=damped,
        ring=None if ring is None else tuple(int(x) for x in ring))

    block2 = pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    wbar_spec = pl.BlockSpec((7, block_rows, w), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    wavbar_spec = pl.BlockSpec((1, n_steps), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
    slab = (block_rows + 2 * halo, w)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),   # srcinfo
                pl.BlockSpec(memory_space=pltpu.SMEM),   # wchunk
                pl.BlockSpec(memory_space=pltpu.SMEM),   # inj
                wbar_spec,                               # wbar
                pl.BlockSpec(memory_space=pltpu.ANY),    # u_next
                pl.BlockSpec(memory_space=pltpu.ANY),    # u_cur
                pl.BlockSpec(memory_space=pltpu.ANY),    # lam
                pl.BlockSpec(memory_space=pltpu.ANY),    # lam_partial
                pl.BlockSpec(memory_space=pltpu.ANY)]    # planes
    args = (srcinfo, wchunk, inj, wbar, u_next, u_cur, lam, lam_partial,
            planes)
    scratch = [pltpu.VMEM(slab, u_next.dtype),
               pltpu.VMEM(slab, u_next.dtype),
               pltpu.VMEM(slab, u_next.dtype),
               pltpu.VMEM(slab, u_next.dtype),
               pltpu.VMEM((n_planes,) + slab, u_next.dtype)]
    sems = [pltpu.SemaphoreType.DMA] * 5
    if ring is not None:
        in_specs += [pl.BlockSpec((n_steps, 2, w), lambda i: (0, 0, 0),
                                  memory_space=pltpu.VMEM),  # ring rows
                     pl.BlockSpec(memory_space=pltpu.ANY)]   # ring cols
        args = args + (ring_rows, ring_cols)
        scratch.append(pltpu.VMEM((n_steps, block_rows + 2 * halo, 128),
                                  u_next.dtype))
        sems.append(pltpu.SemaphoreType.DMA)

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(block2, block2, block2, block2, wbar_spec,
                   wavbar_spec),
        out_shape=(jax.ShapeDtypeStruct(u_next.shape, u_next.dtype),
                   jax.ShapeDtypeStruct(u_next.shape, u_next.dtype),
                   jax.ShapeDtypeStruct(u_next.shape, u_next.dtype),
                   jax.ShapeDtypeStruct(u_next.shape, u_next.dtype),
                   jax.ShapeDtypeStruct(wbar.shape, wbar.dtype),
                   jax.ShapeDtypeStruct((1, n_steps), u_next.dtype)),
        scratch_shapes=scratch + sems,
        input_output_aliases={3: 4},   # wbar -> wbar', in-place
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*args)
