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

from tpuwave.ops.pallas_kernels import _HALO, _halo_dma

__all__ = ["p2_constrained_apply_pallas", "coeffs_to_static"]


def coeffs_to_static(coeffs: dict) -> Tuple:
    """{(pa, pb, ox, oy): c} -> hashable ((ia, ib, ox, oy, c), ...)."""
    order = {"V": 0, "H": 1, "W": 2, "D": 3}
    return tuple(sorted((order[pa], order[pb], ox, oy, float(c))
                        for (pa, pb, ox, oy), c in coeffs.items()))


def _plane_interior(gr, gc, plane_idx: int, nx: int, ny: int):
    """Interior (free-DoF) mask of plane ``plane_idx`` at canvas coords
    (gr, gc) — mirrors P2CanvasSolver._interior_canvas_mask."""
    shapes = ((ny + 1, nx + 1), (ny + 1, nx), (ny, nx + 1), (ny, nx))
    r, c = shapes[plane_idx]
    lj = gr - 1
    li = gc - 1
    support = (lj >= 0) & (lj < r) & (li >= 0) & (li < c)
    if plane_idx == 0:    # V
        bnd = (lj == 0) | (lj == r - 1) | (li == 0) | (li == c - 1)
    elif plane_idx == 1:  # H
        bnd = (lj == 0) | (lj == r - 1)
    elif plane_idx == 2:  # W
        bnd = (li == 0) | (li == c - 1)
    else:                 # D
        bnd = jnp.zeros(gr.shape, bool)
    return support & ~bnd


def _p2_kernel(x_hbm, o0, o1, o2, o3, scratch, sems, *, coeffs, diags,
               nx: int, ny: int, block_rows: int, n_cols: int,
               mask_input: bool = True):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    br = block_rows
    hh = _HALO
    row0 = i * br
    h_tot = br + 2 * hh

    for p in range(4):
        _halo_dma(x_hbm.at[p], scratch.at[p], sems.at[p], i, n_blocks, br,
                  n_cols)

    gr_s = (row0 - hh) + jax.lax.broadcasted_iota(jnp.int32,
                                                  (h_tot, n_cols), 0)
    gc_s = jax.lax.broadcasted_iota(jnp.int32, (h_tot, n_cols), 1)

    # interior-masked slabs (input masking of the constrained operator);
    # mask_input=False reads the slabs RAW — the driven-recurrence / lift
    # form where the stencil must see true boundary values (caller
    # guarantees zeros outside each plane's support, so roll wraparound
    # still only moves zeros)
    slabs = []
    raw_center = []
    int_slab = []
    for p in range(4):
        s_raw = scratch[p, :, :]
        interior = _plane_interior(gr_s, gc_s, p, nx, ny)
        int_slab.append(interior)
        slabs.append(jnp.where(interior, s_raw, 0.0) if mask_input
                     else s_raw)
        raw_center.append(s_raw[hh:hh + br, :])

    # accumulate coefficient terms per target plane, SHARING the shifted
    # slab per (source plane, offset) — 46 coefficient terms reuse only
    # 19 distinct shifted operands, so deduping halves the roll count
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
            shifted[key] = term
        return shifted[key]

    outs = [None, None, None, None]
    for (ia, ib, ox, oy, c) in coeffs:
        term = get_shifted(ib, ox, oy)
        outs[ia] = c * term if outs[ia] is None else outs[ia] + c * term

    out_refs = (o0, o1, o2, o3)
    for p in range(4):
        interior_c = int_slab[p][hh:hh + br, :]
        val = outs[p][hh:hh + br, :] if outs[p] is not None \
            else jnp.zeros((br, n_cols), raw_center[p].dtype)
        pinned = diags[p] * raw_center[p]
        out_refs[p][:, :] = jnp.where(interior_c, val,
                                      pinned).astype(out_refs[p].dtype)


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
    blockspec = pl.BlockSpec((block_rows, wc), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(blockspec,) * 4,
        out_shape=tuple(jax.ShapeDtypeStruct((hc, wc), xc.dtype)
                        for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((4, block_rows + 2 * _HALO, wc), xc.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(xc)
    return jnp.stack(outs)
