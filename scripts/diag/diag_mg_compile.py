#!/usr/bin/env python3
"""Bisect the TPU compile-time blowup of the 4096^2 MG-PCG program.

AOT-compiles (no run) each component and prints wall time:
  vcycle    — the GMG V-cycle alone
  jacobi    — pcg with Jacobi preconditioning (no MG)
  mgpcg     — pcg with the V-cycle preconditioner (the slow production op)
  vcycle-L<k> — V-cycle truncated to k levels (via min_coarse)

Usage: python -u scripts/diag_mg_compile.py <nel> <case> [case ...]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), os.pardir,
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from tpuwave.models.fast import FastWaveSolver
from tpuwave.solve.cg import pcg

NEL = int(sys.argv[1])
CASES = sys.argv[2:] or ["vcycle", "jacobi", "mgpcg"]

print(jax.devices(), flush=True)
s = FastWaveSolver((NEL, NEL), ((0.0, 0.0), (1.0, 1.0)), 1e-3,
                   scheme="theta", theta=1.0, dtype=jnp.float32)
st = s.initial_state(lambda x, y: jnp.sin(np.pi * x) * jnp.sin(np.pi * y))
b = jnp.where(s.interior, s.mass(st.u), 0.0)


def solve_with(precond):
    def f(rhs):
        x0 = jnp.zeros_like(rhs)
        return pcg(s._constrained(s.system), rhs, x0,
                   precond_inv_diag=precond,
                   abs_tol=s._solve_abs_tol(rhs, x0, s.system),
                   max_iter=2000, reduction=s.cg_reduction).x
    return f


def timed_compile(label, fn, arg):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(arg)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"{label}: lower {t1 - t0:.1f} s, compile {t2 - t1:.1f} s",
          flush=True)


for case in CASES:
    if case == "vcycle":
        timed_compile(f"vcycle nel={NEL}", s.gmg_preconditioner(), b)
    elif case.startswith("vcycle-L"):
        k = int(case[len("vcycle-L"):])
        from tpuwave.solve.multigrid import gmg_for_system
        coef = (s.theta * s.dt) ** 2
        mc = max(8, NEL // (2 ** (k - 1)))
        p = gmg_for_system((NEL, NEL), s.mesh.geometry, s.c, coef,
                           min_coarse=mc)
        print(f"  ({len(p.levels)} levels, min_coarse={mc})", flush=True)
        timed_compile(f"{case} nel={NEL}", p, b)
    elif case == "jacobi":
        timed_compile(f"jacobi-pcg nel={NEL}", solve_with(s._inv_diag), b)
    elif case == "mgpcg":
        timed_compile(f"mg-pcg nel={NEL}", solve_with(s.gmg_preconditioner()),
                      b)
    else:
        raise SystemExit(f"unknown case {case}")
