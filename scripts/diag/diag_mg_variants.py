#!/usr/bin/env python3
"""Compile-time experiment: V-cycle program variants on the TPU backend.

Baseline vcycle compile at 2048^2 on the tunnel TPU is ~392 s (vs 16 s on
XLA:CPU) and >28 min at 4096^2. Variants isolate the two shape-scaling
suspects:

  v0  — production code as-is (rolls + iota-pred where masks)
  v1  — apply_stencil via one lax.pad + 9 static slices (no cyclic
        concats) patched into ops.stencil/solve.multigrid
  v2  — v1 + boundary masking via crop-and-pad (no iota preds anywhere)

Usage: python -u scripts/diag_mg_variants.py <nel> v0 v1 v2
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
# deliberately NOT setting the compilation cache: each measurement must
# be a cold compile

import jax
import jax.numpy as jnp
import numpy as np

import tpuwave.ops.stencil as stencil_mod
import tpuwave.solve.multigrid as mg
import tpuwave.solve.cheby_iter as ci

NEL = int(sys.argv[1])
CASES = sys.argv[2:] or ["v0", "v1", "v2"]

apply_stencil_roll = stencil_mod.apply_stencil


def apply_stencil_shift(u: jax.Array, s) -> jax.Array:
    """y = stencil apply with ZERO (not cyclic) out-of-range reads:
    one ring pad + 9 static slices. Interior rows identical to the roll
    version; boundary rows differ only in the wrapped garbage that every
    caller masks anyway."""
    zero = jnp.asarray(0.0, u.dtype)
    p = jax.lax.pad(u, zero, ((1, 1, 0), (1, 1, 0)))
    h, w = u.shape
    out = s[1][1] * u
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            if (di, dj) == (0, 0):
                continue
            c = s[1 + dj][1 + di]
            if c == 0.0:
                continue
            out = out + c * jax.lax.slice(p, (1 + dj, 1 + di),
                                          (1 + dj + h, 1 + di + w))
    return out


def zero_boundary(x: jax.Array) -> jax.Array:
    zero = jnp.asarray(0.0, x.dtype)
    return jax.lax.pad(x[1:-1, 1:-1], zero, ((1, 1, 0), (1, 1, 0)))


class PadMaskGmg(mg.GmgPreconditioner):
    """v2: the same V(pre, post)-cycle with all iota-pred masks replaced
    by crop-and-pad zeroing (pure data movement, no predicates)."""

    @staticmethod
    def _constrained(lev, interior):
        diag = lev.stencil[1][1]

        def apply_c(x):
            xi = zero_boundary(x)
            y = zero_boundary(mg.apply_stencil(xi, lev.stencil))
            return y + diag * (x - xi)
        return apply_c

    def _cycle(self, l, b):
        lev = self.levels[l]
        apply_c = self._constrained(lev, None)
        if l == len(self.levels) - 1:
            return self._coarse_solve(apply_c, b)
        x = jnp.zeros_like(b)
        x, r = ci.chebyshev_block(apply_c, x, b, lev.sm_theta, lev.sm_coeffs)
        bc = zero_boundary(mg.restrict_p1(zero_boundary(r)))
        ec = self._cycle(l + 1, bc)
        x = x + zero_boundary(mg.prolong_p1(ec))
        r = b - apply_c(x)
        x, _ = ci.chebyshev_block(apply_c, x, r, lev.sm_theta, lev.sm_coeffs)
        return x


def build(nel):
    coef = 1e-6  # (theta dt)^2 at theta=1, dt=1e-3
    return mg.gmg_for_system((nel, nel), ((0.0, 0.0), (1.0, 1.0)), 1.0, coef)


def timed_compile(label, fn, arg):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(arg)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"{label}: lower {t1 - t0:.1f} s, compile {t2 - t1:.1f} s",
          flush=True)


print(jax.devices(), flush=True)
b = jnp.zeros((NEL + 1, NEL + 1), jnp.float32)

for case in CASES:
    if case == "v0":
        stencil_mod.apply_stencil = apply_stencil_roll
        mg.apply_stencil = apply_stencil_roll
        timed_compile(f"v0 rolls+where nel={NEL}", build(NEL), b)
    elif case == "v1":
        stencil_mod.apply_stencil = apply_stencil_shift
        mg.apply_stencil = apply_stencil_shift
        timed_compile(f"v1 pad-slice+where nel={NEL}", build(NEL), b)
    elif case == "v2":
        stencil_mod.apply_stencil = apply_stencil_shift
        mg.apply_stencil = apply_stencil_shift
        base = build(NEL)
        p = PadMaskGmg(base.levels, base.coarse_theta, base.coarse_coeffs)
        timed_compile(f"v2 pad-slice+pad-mask nel={NEL}", p, b)
    else:
        raise SystemExit(f"unknown case {case}")
