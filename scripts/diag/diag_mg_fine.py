#!/usr/bin/env python3
"""Bisect WITHIN the fine level of the V-cycle diamond: which edge of
  pre-smooth -> restrict -> [coarse stub] -> prolong -> residual -> post
creates the TPU compile blowup. The coarse branch is stubbed with
ec = 0.5*bc so restrict/prolong stay live but no coarse ops exist.

Cases:
  f1 — the full fine-level V shape (stubbed coarse)
  f2 — f1 without the post-smooth
  f3 — f1 without the recomputed residual (post-smooth reuses r)
  f4 — f1 with the pre-smooth replaced by one stencil apply
  f5 — pre-smooth + restrict + prolong only (no correction/post)

Usage: python -u scripts/diag_mg_fine.py <nel> f1 f2 f3 f4 f5
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import tpuwave.solve.multigrid as mg
from tpuwave.solve.cheby_iter import chebyshev_block

NEL = int(sys.argv[1])
CASES = sys.argv[2:]
GEOM = ((0.0, 0.0), (1.0, 1.0))

print(jax.devices(), flush=True)
b = jnp.zeros((NEL + 1, NEL + 1), jnp.float32)
base = mg.gmg_for_system((NEL, NEL), GEOM, 1.0, 1e-6, min_coarse=NEL // 2)
lev = base.levels[0]
nxt = base.levels[1]


def make(case):
    def f(bb):
        interior = mg._interior(lev.shape)
        apply_c = mg.GmgPreconditioner._constrained(lev, interior)
        x = jnp.zeros_like(bb)
        if case == "f4":
            x = bb * (1.0 / lev.sm_theta)
            r = bb - apply_c(x)
        else:
            x, r = chebyshev_block(apply_c, x, bb, lev.sm_theta,
                                   lev.sm_coeffs)
        bc = mg.restrict_p1(jnp.where(interior, r, 0.0))
        bc = jnp.where(mg._interior(nxt.shape), bc, 0.0)
        ec = 0.5 * bc  # coarse stub
        corr = jnp.where(interior, mg.prolong_p1(ec), 0.0)
        if case == "f5":
            return x + corr
        x = x + corr
        if case == "f3":
            x2, _ = chebyshev_block(apply_c, x, r, lev.sm_theta,
                                    lev.sm_coeffs)
            return x2
        r = bb - apply_c(x)
        if case == "f2":
            return x + r
        x, _ = chebyshev_block(apply_c, x, r, lev.sm_theta, lev.sm_coeffs)
        return x
    return f


for case in CASES:
    t0 = time.perf_counter()
    lowered = jax.jit(make(case)).lower(b)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"{case} nel={NEL}: lower {t1 - t0:.1f} s, "
          f"compile {t2 - t1:.1f} s", flush=True)
