#!/usr/bin/env python3
"""Bisect the V-cycle compile blowup by program fragment.

Cases (each AOT-compiled on the default backend, time printed):
  down      — restrict_p1 chain from (nel+1) down to 9
  up        — prolong_p1 chain from 9 up to (nel+1)
  coarse    — the coarsest-level Chebyshev lax.scan alone (9x9)
  smooth    — per-level smoothing only (no transfers): chebyshev_block
              twice at each level's shape, chained via fresh inputs
  two       — 2-level V-cycle at nel (one restrict + one prolong)
  full      — the production V-cycle (baseline)

Usage: python -u scripts/diag_mg_parts.py <nel> <case> [case ...]
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
COEF = 1e-6


def build(nel, min_coarse=8):
    return mg.gmg_for_system((nel, nel), GEOM, 1.0, COEF,
                             min_coarse=min_coarse)


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
full = build(NEL)

for case in CASES:
    if case == "down":
        def down(x):
            n = NEL
            while n >= 16:
                x = mg.restrict_p1(x)
                n //= 2
            return x
        timed_compile(f"down nel={NEL}", down, b)
    elif case == "up":
        def up(_):
            n = 8
            x = jnp.ones((9, 9), jnp.float32)
            while n < NEL:
                x = mg.prolong_p1(x)
                n *= 2
            return x
        timed_compile(f"up nel={NEL}", up, b)
    elif case == "coarse":
        lev = full.levels[-1]
        interior = mg._interior(lev.shape)
        apply_c = full._constrained(lev, interior)
        bc = jnp.zeros(lev.shape, jnp.float32)
        timed_compile(f"coarse {lev.shape}",
                      lambda y: full._coarse_solve(apply_c, y), bc)
    elif case == "smooth":
        def smooth(x):
            outs = []
            for lev in full.levels:
                interior = mg._interior(lev.shape)
                apply_c = full._constrained(lev, interior)
                y = jnp.zeros(lev.shape, x.dtype)
                r = jnp.ones(lev.shape, x.dtype) * jnp.max(x)
                y, r = chebyshev_block(apply_c, y, r, lev.sm_theta,
                                       lev.sm_coeffs)
                y, r = chebyshev_block(apply_c, y, r, lev.sm_theta,
                                       lev.sm_coeffs)
                outs.append(jnp.sum(y))
            return jnp.stack(outs)
        timed_compile(f"smooth nel={NEL}", smooth, b)
    elif case == "two":
        p2 = build(NEL, min_coarse=NEL // 2)
        print(f"  ({len(p2.levels)} levels)", flush=True)
        timed_compile(f"two-level nel={NEL}", p2, b)
    elif case == "full":
        timed_compile(f"full nel={NEL}", full, b)
    else:
        raise SystemExit(f"unknown case {case}")
