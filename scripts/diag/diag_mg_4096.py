#!/usr/bin/env python3
"""One-off diagnostic: split the 4096^2 XLA-MG cost into compile vs run.

Stage 1: AOT lower+compile of the 20-step MG-PCG scan (timed separately).
Stage 2: one executable invocation (timed).
Stage 3: a single MG-PCG solve with the iteration count printed — detects
the CG-spinning-to-max_iter failure mode that would masquerade as a hang.
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

NEL = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
STEPS = 20

print(jax.devices(), flush=True)
s = FastWaveSolver((NEL, NEL), ((0.0, 0.0), (1.0, 1.0)), 1e-3,
                   scheme="theta", theta=1.0, dtype=jnp.float32)
st = s.initial_state(lambda x, y: jnp.sin(np.pi * x) * jnp.sin(np.pi * y))

# ---- stage 3 first (cheap): one solve, report iterations -------------
precond = s.gmg_preconditioner()


def one_solve(state):
    u, v, _a = state
    th, dt = s.theta, s.dt
    rhs = jnp.where(s.interior, s.mass(u) + dt * s.mass(v)
                    - (dt * dt * th * (1.0 - th)) * s.stiff(u), 0.0)
    x0 = jnp.where(s.interior, u, 0.0)
    res = pcg(s._constrained(s.system), rhs, x0,
              precond_inv_diag=precond,
              abs_tol=s._solve_abs_tol(rhs, x0, s.system),
              max_iter=2000, reduction=s.cg_reduction)
    return res


t0 = time.perf_counter()
f1 = jax.jit(one_solve)
res = f1(st)
jax.block_until_ready(res.x)
print(f"single MG-PCG solve: compile+run {time.perf_counter() - t0:.1f} s, "
      f"iterations = {int(res.iterations)}", flush=True)
t0 = time.perf_counter()
res = f1(st)
jax.block_until_ready(res.x)
print(f"single MG-PCG solve (warm): {time.perf_counter() - t0:.3f} s",
      flush=True)

# ---- stages 1+2: the full 20-step scan, compile and run split -------
t0 = time.perf_counter()
fn = jax.jit(lambda st_: s.run_implicit_mg(st_, STEPS))
lowered = fn.lower(st)
t1 = time.perf_counter()
print(f"lower: {t1 - t0:.1f} s", flush=True)
compiled = lowered.compile()
t2 = time.perf_counter()
print(f"compile: {t2 - t1:.1f} s", flush=True)
out = compiled(st)
jax.block_until_ready(out.u)
t3 = time.perf_counter()
print(f"first run ({STEPS} steps): {t3 - t2:.1f} s "
      f"({(t3 - t2) / STEPS * 1e3:.2f} ms/step)", flush=True)
out = compiled(st)
jax.block_until_ready(out.u)
t4 = time.perf_counter()
print(f"second run: {t4 - t3:.1f} s ({(t4 - t3) / STEPS * 1e3:.2f} ms/step)",
      flush=True)
