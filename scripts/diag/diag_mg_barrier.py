#!/usr/bin/env python3
"""Test optimization_barrier placements against the V-cycle compile blowup.

The 2-level bisect (diag_mg_parts.py) shows one restrict->coarse->prolong
diamond at 2048^2 costs ~356 s of TPU compile while all its fragments
compile in seconds — the fine-level tensors living across the coarse
branch explode a scheduling/fusion pass. optimization_barrier is identity
at runtime but cuts the pass's search space.

Cases:
  none      — production 2-level cycle (baseline ~356 s at 2048)
  vjunction — barrier on (x, r, bc) after restrict and on (x, r) after
              the coarse correction
  levels    — barrier only between levels (on bc and on ec)

Usage: python -u scripts/diag_mg_barrier.py <nel> <case> [case ...]
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


class BarrierGmg(mg.GmgPreconditioner):
    mode = "levels"

    def _cycle(self, l, b):
        lev = self.levels[l]
        interior = mg._interior(lev.shape)
        apply_c = self._constrained(lev, interior)
        x = jnp.zeros_like(b)
        if l == len(self.levels) - 1:
            return self._coarse_solve(apply_c, b)
        x, r = chebyshev_block(apply_c, x, b, lev.sm_theta, lev.sm_coeffs)
        bc = mg.restrict_p1(jnp.where(interior, r, 0.0))
        bc = jnp.where(mg._interior(self.levels[l + 1].shape), bc, 0.0)
        if self.mode == "vjunction":
            x, r, bc = jax.lax.optimization_barrier((x, r, bc))
        else:
            bc = jax.lax.optimization_barrier(bc)
        ec = self._cycle(l + 1, bc)
        ec = jax.lax.optimization_barrier(ec)
        x = x + jnp.where(interior, mg.prolong_p1(ec), 0.0)
        if self.mode == "vjunction":
            x = jax.lax.optimization_barrier(x)
        r = b - apply_c(x)
        x, _ = chebyshev_block(apply_c, x, r, lev.sm_theta, lev.sm_coeffs)
        return x


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
    base = mg.gmg_for_system((NEL, NEL), GEOM, 1.0, 1e-6,
                             min_coarse=NEL // 2)
    if case == "none":
        timed_compile(f"none 2-level nel={NEL}", base, b)
    elif case in ("vjunction", "levels"):
        p = BarrierGmg(base.levels, base.coarse_theta, base.coarse_coeffs)
        p.mode = case
        timed_compile(f"{case} 2-level nel={NEL}", p, b)
    elif case == "full-levels":
        deep = mg.gmg_for_system((NEL, NEL), GEOM, 1.0, 1e-6)
        p = BarrierGmg(deep.levels, deep.coarse_theta, deep.coarse_coeffs)
        p.mode = "levels"
        timed_compile(f"full-levels nel={NEL} ({len(deep.levels)} levels)",
                      p, b)
    else:
        raise SystemExit(f"unknown case {case}")
