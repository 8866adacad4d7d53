"""Pallas kernel for the P2 canvas block-stencil constrained apply.

The XLA version (ops/stencil_p2.py::apply_canvases) materialises a rolled
copy per coefficient term (~30 terms over four canvases), so each P2 CG
matvec moves many canvas-sized HBM transfers. This kernel fuses the whole
constrained operator

    out_p = interior_p ? sum_{(p,q,off)} C * shift(x_q masked) : diag_p * x_p

into one pass: per row-block it DMAs the four plane slabs (8-row halos),
applies every coefficient term with in-register rolls, masks, and writes
the four output blocks — read 4 + write 4 canvases per apply.

Plane order everywhere: V, H, W, D (ops/stencil_p2._PLANES). Offsets are
in {-1, 0, 1}^2 by construction of the element positions.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuwave.ops.pallas_kernels import _HALO, _halo_dma_cases

__all__ = ["p2_constrained_apply_pallas", "p2_presmooth_pallas",
           "p2_postsmooth_pallas", "coeffs_to_static"]


def coeffs_to_static(coeffs: dict) -> Tuple:
    """{(pa, pb, ox, oy): c} -> hashable ((ia, ib, ox, oy, c), ...)."""
    order = {"V": 0, "H": 1, "W": 2, "D": 3}
    return tuple(sorted((order[pa], order[pb], ox, oy, float(c))
                        for (pa, pb, ox, oy), c in coeffs.items()))


def _plane_interior_1d(gr, gc, plane_idx: int, nx: int, ny: int):
    """Interior (free-DoF) mask of plane ``plane_idx``, SEPARABLE form:
    returns (row_mask, col_mask) on narrow iotas ``gr`` (h, 1) and ``gc``
    (1, w); the 2-D mask is their broadcast AND. Equivalent to the
    support & ~boundary predicate of P2CanvasSolver._interior_canvas_mask
    — every plane's interior is a row-interval x col-interval product, so
    the mask costs ~2 full-width ops instead of ~10 (the round-4 kernel
    recomputed ~40 int ops/element of mask logic per apply, a measured
    ~30% of its VPU time)."""
    shapes = ((ny + 1, nx + 1), (ny + 1, nx), (ny, nx + 1), (ny, nx))
    r, c = shapes[plane_idx]
    lj = gr - 1
    li = gc - 1
    if plane_idx == 0:    # V: interior of both axes
        row = (lj >= 1) & (lj <= r - 2)
        col = (li >= 1) & (li <= c - 2)
    elif plane_idx == 1:  # H: row-interior, col-support
        row = (lj >= 1) & (lj <= r - 2)
        col = (li >= 0) & (li <= c - 1)
    elif plane_idx == 2:  # W: row-support, col-interior
        row = (lj >= 0) & (lj <= r - 1)
        col = (li >= 1) & (li <= c - 2)
    else:                 # D: support only
        row = (lj >= 0) & (lj <= r - 1)
        col = (li >= 0) & (li <= c - 1)
    return row, col


def _p2_kernel(x_hbm, o_ref, scratch, sems, *, coeffs, diags,
               nx: int, ny: int, block_rows: int, n_cols: int,
               mask_input: bool = True):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    br = block_rows
    hh = _HALO
    row0 = i * br
    h_tot = br + 2 * hh

    # double-buffered halo DMA (the P1 multistep pattern): prime block 0,
    # prefetch block i+1 while computing block i, wait only on this
    # block's slot — the round-4 kernel's start+wait-per-block serialised
    # ~2/3 of the apply behind DMA latency (measured: a 4-term no-shift
    # variant still cost 2.36 ms vs the 0.70 ms traffic roofline)
    two = jnp.asarray(2, i.dtype)   # literal stays i's dtype under x64
    slot = jax.lax.rem(i, two)
    nxt_slot = jax.lax.rem(i + 1, two)

    @pl.when(i == 0)
    def _prime():
        for p in range(4):
            _halo_dma_cases(x_hbm.at[p], scratch.at[0, p], sems.at[0, p],
                            0, n_blocks, br, n_cols,
                            do_start=True, do_wait=False)

    @pl.when(i + 1 < n_blocks)
    def _prefetch():
        for p in range(4):
            _halo_dma_cases(x_hbm.at[p], scratch.at[nxt_slot, p],
                            sems.at[nxt_slot, p], i + 1, n_blocks, br,
                            n_cols, do_start=True, do_wait=False)

    for p in range(4):
        _halo_dma_cases(x_hbm.at[p], scratch.at[slot, p], sems.at[slot, p],
                        i, n_blocks, br, n_cols,
                        do_start=False, do_wait=True)
    scratch = scratch.at[slot]

    # separable interior masks on NARROW iotas (one column / one row);
    # broadcast to 2-D only at the single AND per use site
    gr_1 = (row0 - hh) + jax.lax.broadcasted_iota(jnp.int32, (h_tot, 1), 0)
    gc_1 = jax.lax.broadcasted_iota(jnp.int32, (1, n_cols), 1)
    rms, cms = [], []
    for p in range(4):
        rm, cm = _plane_interior_1d(gr_1, gc_1, p, nx, ny)
        rms.append(rm)
        cms.append(cm)

    # interior-masked slabs (input masking of the constrained operator);
    # mask_input=False reads the slabs RAW — the driven-recurrence / lift
    # form where the stencil must see true boundary values (caller
    # guarantees zeros outside each plane's support, so roll wraparound
    # still only moves zeros)
    slabs = []
    raw_center = []
    for p in range(4):
        s_raw = scratch[p, :, :]
        slabs.append(jnp.where(rms[p] & cms[p], s_raw, 0.0) if mask_input
                     else s_raw)
        raw_center.append(s_raw[hh:hh + br, :])

    # accumulate coefficient terms per target plane, SHARING the shifted
    # slab per (source plane, offset) — 46 coefficient terms reuse only
    # 19 distinct shifted operands, so deduping halves the roll count.
    # The FMA accumulation runs on the hh-ALIGNED center slice
    # (br, n_cols), not the full halo slab — 20% less multiply-add work
    # at br = 64
    shifted = {}

    def get_shifted(ib, ox, oy):
        key = (ib, ox, oy)
        if key not in shifted:
            term = slabs[ib]
            if oy != 0:
                # out row r needs source row r + oy -> roll by -oy
                term = pltpu.roll(term, shift=(h_tot - oy) % h_tot,
                                  axis=0)
            if ox != 0:
                term = pltpu.roll(term, shift=(n_cols - ox) % n_cols,
                                  axis=1)
            shifted[key] = term[hh:hh + br, :]
        return shifted[key]

    outs = [None, None, None, None]
    for (ia, ib, ox, oy, c) in coeffs:
        term = get_shifted(ib, ox, oy)
        outs[ia] = c * term if outs[ia] is None else outs[ia] + c * term

    for p in range(4):
        interior_c = rms[p][hh:hh + br, :] & cms[p]
        val = outs[p] if outs[p] is not None \
            else jnp.zeros((br, n_cols), raw_center[p].dtype)
        pinned = diags[p] * raw_center[p]
        o_ref[p, :, :] = jnp.where(interior_c, val,
                                   pinned).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("coeffs", "diags", "nx", "ny",
                                             "block_rows", "interpret",
                                             "mask_input"))
def p2_constrained_apply_pallas(xc, *, coeffs: Tuple, diags: Tuple,
                                nx: int, ny: int, block_rows: int = 64,
                                interpret: bool = False,
                                mask_input: bool = True):
    """Fused constrained P2 block-stencil apply on canvases (4, Hc, Wc).

    ``coeffs`` from :func:`coeffs_to_static`; ``diags`` = per-plane pinned
    diagonals (V, H, W, D). Hc must be a multiple of block_rows; Wc of 128.
    ``mask_input=False``: the stencil reads the raw canvases (true driven
    boundary values) — with ``diags=(0, 0, 0, 0)`` the result is
    ``where(interior, A x, 0)``, the rhs-assembly / boundary-lift form of
    the product engines.
    """
    four, hc, wc = xc.shape
    assert four == 4
    if block_rows % _HALO != 0:
        raise ValueError(f"block_rows {block_rows} must be a multiple of "
                         f"{_HALO}")
    if hc % block_rows != 0:
        raise ValueError(f"canvas rows {hc} not a multiple of {block_rows}")
    if wc % 128 != 0 and not interpret:
        raise ValueError(f"canvas cols {wc} not a multiple of 128")
    grid = hc // block_rows
    if grid < 2:
        raise ValueError("need at least 2 row blocks")
    if hc < block_rows + 2 * _HALO:
        raise ValueError(
            f"canvas rows {hc} must be >= block_rows + {2 * _HALO} "
            f"(middle-block halo slab)")

    kernel = functools.partial(_p2_kernel, coeffs=coeffs, diags=diags,
                               nx=nx, ny=ny, block_rows=block_rows,
                               n_cols=wc, mask_input=mask_input)
    # single stacked (4, hc, wc) output — the round-4 kernel emitted four
    # separate canvases and jnp.stack'ed them after, a full extra
    # read+write of the result (~0.7 ms at bench scale)
    blockspec = pl.BlockSpec((4, block_rows, wc), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=blockspec,
        out_shape=jax.ShapeDtypeStruct((4, hc, wc), xc.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 4, block_rows + 2 * _HALO, wc), xc.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(xc)

# ---------------------------------------------------------------------------
# Fused (p+h)-MG smoothing kernels
# ---------------------------------------------------------------------------
#
# The round-4 V-cycle (solve/multigrid.py::P2CanvasGmgPreconditioner) paid
# one full HBM round-trip per elementwise op and per constrained apply —
# ~12-16 canvas-sized passes at ~1.4 ms each on top of 5 fused applies at
# the 4096^2 bench scale. These kernels collapse the two Chebyshev
# smoothing blocks to ONE HBM pass each:
#
#   presmooth:  b                  -> (x, r)      [deg applies in-register]
#   postsmooth: (x, r_pre, corr)   -> x_out       [1 + deg applies]
#
# The halo budget (_HALO = 8 rows) covers up to 7 chained radius-1 applies;
# the production smoother is degree 2 (pre) + 1 correction-residual apply
# + degree 2 (post). Numerics match _smooth_block_jacobi to reassociation
# (same polynomial, same per-element operation order along each chain).


def _slab_masks(row0: int, h_tot: int, n_cols: int, nx: int, ny: int):
    gr_1 = (row0 - _HALO) + jax.lax.broadcasted_iota(jnp.int32,
                                                     (h_tot, 1), 0)
    gc_1 = jax.lax.broadcasted_iota(jnp.int32, (1, n_cols), 1)
    return [_plane_interior_1d(gr_1, gc_1, p, nx, ny) for p in range(4)]


def _apply_slabs(slabs, coeffs, masks, h_tot: int, n_cols: int):
    """Constrained apply on interior-supported full slabs: returns
    interior-masked A(slabs) as a list of 4 (h_tot, n_cols) arrays.
    Inputs MUST be interior-supported (zero at pins/pads) — then the
    constrained apply's pinned-diagonal branch is identically zero and
    roll wraparound only moves zeros."""
    shifted = {}

    def get(ib, ox, oy):
        key = (ib, ox, oy)
        if key not in shifted:
            t = slabs[ib]
            if oy != 0:
                t = pltpu.roll(t, shift=(h_tot - oy) % h_tot, axis=0)
            if ox != 0:
                t = pltpu.roll(t, shift=(n_cols - ox) % n_cols, axis=1)
            shifted[key] = t
        return shifted[key]

    outs = [None, None, None, None]
    for (ia, ib, ox, oy, c) in coeffs:
        t = get(ib, ox, oy)
        outs[ia] = c * t if outs[ia] is None else outs[ia] + c * t
    res = []
    for p in range(4):
        rm, cm = masks[p]
        o = outs[p] if outs[p] is not None \
            else jnp.zeros((h_tot, n_cols), slabs[p].dtype)
        res.append(jnp.where(rm & cm, o, 0.0))
    return res


def _smooth_chain(b_slabs, coeffs, masks, inv_diags, theta, sm_coeffs,
                  h_tot: int, n_cols: int):
    """In-register _smooth_block_jacobi from x = 0: returns (x_slabs,
    r_slabs). b_slabs interior-supported."""
    d = [(1.0 / theta) * inv_diags[p] * b_slabs[p] for p in range(4)]
    x = list(d)
    ad = _apply_slabs(d, coeffs, masks, h_tot, n_cols)
    r = [b_slabs[p] - ad[p] for p in range(4)]
    for c1, c2 in sm_coeffs:
        d = [c1 * d[p] + c2 * (inv_diags[p] * r[p]) for p in range(4)]
        x = [x[p] + d[p] for p in range(4)]
        ad = _apply_slabs(d, coeffs, masks, h_tot, n_cols)
        r = [r[p] - ad[p] for p in range(4)]
    return x, r


def _dma_all(hbm_refs, scratch, sems, i, n_blocks, br, n_cols):
    """Double-buffered prime/prefetch/wait of one slab per (input, plane)
    pair. ``hbm_refs``: list of stacked (4, hc, wc) HBM refs; ``scratch``:
    (2, n_in, 4, h_tot, wc) VMEM; ``sems``: (2, n_in, 4)."""
    two = jnp.asarray(2, i.dtype)   # literal stays i's dtype under x64
    slot = jax.lax.rem(i, two)
    nxt_slot = jax.lax.rem(i + 1, two)
    n_in = len(hbm_refs)

    @pl.when(i == 0)
    def _prime():
        for k in range(n_in):
            for p in range(4):
                _halo_dma_cases(hbm_refs[k].at[p], scratch.at[0, k, p],
                                sems.at[0, k, p], 0, n_blocks, br, n_cols,
                                do_start=True, do_wait=False)

    @pl.when(i + 1 < n_blocks)
    def _prefetch():
        for k in range(n_in):
            for p in range(4):
                _halo_dma_cases(hbm_refs[k].at[p],
                                scratch.at[nxt_slot, k, p],
                                sems.at[nxt_slot, k, p], i + 1, n_blocks,
                                br, n_cols, do_start=True, do_wait=False)

    for k in range(n_in):
        for p in range(4):
            _halo_dma_cases(hbm_refs[k].at[p], scratch.at[slot, k, p],
                            sems.at[slot, k, p], i, n_blocks, br, n_cols,
                            do_start=False, do_wait=True)
    return scratch.at[slot]


def _p2_presmooth_kernel(b_hbm, x_ref, r_ref, scratch, sems, *, coeffs,
                         inv_diags, theta, sm_coeffs, nx: int, ny: int,
                         block_rows: int, n_cols: int):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    br = block_rows
    hh = _HALO
    h_tot = br + 2 * hh
    scr = _dma_all([b_hbm], scratch, sems, i, n_blocks, br, n_cols)
    masks = _slab_masks(i * br, h_tot, n_cols, nx, ny)
    b = [scr[0, p, :, :] for p in range(4)]
    x, r = _smooth_chain(b, coeffs, masks, inv_diags, theta, sm_coeffs,
                         h_tot, n_cols)
    for p in range(4):
        x_ref[p, :, :] = x[p][hh:hh + br, :].astype(x_ref.dtype)
        r_ref[p, :, :] = r[p][hh:hh + br, :].astype(r_ref.dtype)


def _p2_postsmooth_kernel(x_hbm, r_hbm, corr_hbm, o_ref, scratch, sems, *,
                          coeffs, inv_diags, theta, sm_coeffs, nx: int,
                          ny: int, block_rows: int, n_cols: int):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    br = block_rows
    hh = _HALO
    h_tot = br + 2 * hh
    scr = _dma_all([x_hbm, r_hbm, corr_hbm], scratch, sems, i, n_blocks,
                   br, n_cols)
    masks = _slab_masks(i * br, h_tot, n_cols, nx, ny)
    corr = []
    for p in range(4):
        rm, cm = masks[p]
        corr.append(jnp.where(rm & cm, scr[2, p, :, :], 0.0))
    acorr = _apply_slabs(corr, coeffs, masks, h_tot, n_cols)
    r = [scr[1, p, :, :] - acorr[p] for p in range(4)]
    dx, _ = _smooth_chain(r, coeffs, masks, inv_diags, theta, sm_coeffs,
                          h_tot, n_cols)
    for p in range(4):
        xc = scr[0, p, hh:hh + br, :]
        o_ref[p, :, :] = (xc + corr[p][hh:hh + br, :]
                          + dx[p][hh:hh + br, :]).astype(o_ref.dtype)


def _smooth_grid_checks(hc, wc, block_rows, interpret, n_shrink):
    if block_rows % _HALO != 0:
        raise ValueError(f"block_rows {block_rows} must be a multiple of "
                         f"{_HALO}")
    if hc % block_rows != 0:
        raise ValueError(f"canvas rows {hc} not a multiple of {block_rows}")
    if wc % 128 != 0 and not interpret:
        raise ValueError(f"canvas cols {wc} not a multiple of 128")
    if n_shrink > _HALO:
        raise ValueError(f"{n_shrink} chained applies exceed the "
                         f"{_HALO}-row halo budget")
    grid = hc // block_rows
    if grid < 2 or hc < block_rows + 2 * _HALO:
        raise ValueError("need at least 2 row blocks and a full halo slab")
    return grid


@functools.partial(jax.jit, static_argnames=(
    "coeffs", "inv_diags", "theta", "sm_coeffs", "nx", "ny", "block_rows",
    "interpret"))
def p2_presmooth_pallas(b, *, coeffs: Tuple, inv_diags: Tuple, theta: float,
                        sm_coeffs: Tuple, nx: int, ny: int,
                        block_rows: int = 64, interpret: bool = False):
    """Fused pre-smoothing block: (x, r) = _smooth_block_jacobi(A_c,
    inv_d, 0, b) in one HBM pass (read b, write x and r). ``b`` must be
    interior-supported (the canvas-CG residual invariant)."""
    four, hc, wc = b.shape
    assert four == 4
    grid = _smooth_grid_checks(hc, wc, block_rows, interpret,
                               1 + len(sm_coeffs))
    kernel = functools.partial(
        _p2_presmooth_kernel, coeffs=coeffs, inv_diags=inv_diags,
        theta=theta, sm_coeffs=sm_coeffs, nx=nx, ny=ny,
        block_rows=block_rows, n_cols=wc)
    blockspec = pl.BlockSpec((4, block_rows, wc), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(blockspec, blockspec),
        out_shape=(jax.ShapeDtypeStruct((4, hc, wc), b.dtype),) * 2,
        scratch_shapes=[
            pltpu.VMEM((2, 1, 4, block_rows + 2 * _HALO, wc), b.dtype),
            pltpu.SemaphoreType.DMA((2, 1, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(b)


@functools.partial(jax.jit, static_argnames=(
    "coeffs", "inv_diags", "theta", "sm_coeffs", "nx", "ny", "block_rows",
    "interpret"))
def p2_postsmooth_pallas(x, r, corr, *, coeffs: Tuple, inv_diags: Tuple,
                         theta: float, sm_coeffs: Tuple, nx: int, ny: int,
                         block_rows: int = 64, interpret: bool = False):
    """Fused V-cycle tail: x_out = postsmooth(x + corr, r - A corr) in one
    HBM pass (read x, r, corr; write x_out). ``corr`` is interior-masked
    in-kernel; 1 + degree chained applies."""
    four, hc, wc = x.shape
    assert four == 4
    grid = _smooth_grid_checks(hc, wc, block_rows, interpret,
                               2 + len(sm_coeffs))
    kernel = functools.partial(
        _p2_postsmooth_kernel, coeffs=coeffs, inv_diags=inv_diags,
        theta=theta, sm_coeffs=sm_coeffs, nx=nx, ny=ny,
        block_rows=block_rows, n_cols=wc)
    blockspec = pl.BlockSpec((4, block_rows, wc), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=blockspec,
        out_shape=jax.ShapeDtypeStruct((4, hc, wc), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 3, 4, block_rows + 2 * _HALO, wc), x.dtype),
            pltpu.SemaphoreType.DMA((2, 3, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, r, corr)
