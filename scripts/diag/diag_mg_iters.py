#!/usr/bin/env python3
"""Per-step MG-PCG iteration counts for the implicit fast paths.

Why: bench_implicit_mg measured NM-AA (beta=0.25) at ~1.7-1.8x the
ms/step of CN (theta=0.5) at 4096^2 dt=1e-3, even though both solve the
SAME system stencil M + 0.25 dt^2 K and Newmark does ONE solve per step
vs theta's two (the reference finds Newmark 2x FASTER,
report/sections/8_Scalability.tex:63-65). This prints the PCG iteration
counts each scheme actually runs, per step, to locate the gap.

Usage (TPU):  python -u scripts/diag_mg_iters.py --nel 1024 --steps 8
Off-TPU:      PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python ... --nel 256
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), os.pardir,
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from tpuwave.models.fast import FastState, FastWaveSolver
from tpuwave.solve.cg import pcg


def newmark_step_instr(s, st, precond):
    dt, beta, gamma = s.dt, s.beta, s.gamma
    u, v, a = st
    z = u + dt * v + (dt * dt * (0.5 - beta)) * a
    rhs = jnp.where(s.interior, -s.stiff(z), 0.0)
    x0 = jnp.where(s.interior, a, 0.0)
    res = pcg(s._constrained(s.system), rhs, x0,
              precond_inv_diag=precond,
              abs_tol=s._solve_abs_tol(rhs, x0, s.system),
              max_iter=2000, reduction=s.cg_reduction)
    a_new = res.x.astype(s.dtype)
    u_new = z + (beta * dt * dt) * a_new
    v_new = v + dt * ((1.0 - gamma) * a + gamma * a_new)
    return FastState(u=u_new, v=v_new, a=a_new), (int(res.iterations),), (
        float(jnp.linalg.norm(rhs - s._constrained(s.system)(x0))),
        float(s._solve_abs_tol(rhs, x0, s.system)))


def theta_step_instr(s, st, precond):
    dt, th = s.dt, s.theta
    u, v, a = st
    mu, ku, mv = s.mass(u), s.stiff(u), s.mass(v)
    rhs_u = jnp.where(s.interior,
                      mu - (dt * dt * th * (1.0 - th)) * ku + dt * mv, 0.0)
    x0_u = jnp.where(s.interior, u + dt * v, 0.0)
    res_u = pcg(s._constrained(s.system), rhs_u, x0_u,
                precond_inv_diag=precond,
                abs_tol=s._solve_abs_tol(rhs_u, x0_u, s.system),
                max_iter=2000, reduction=s.cg_reduction)
    u_new = res_u.x.astype(s.dtype)
    ku_new = s.stiff(u_new)
    rhs_v = jnp.where(s.interior,
                      mv - (dt * (1.0 - th)) * ku - (dt * th) * ku_new,
                      0.0)
    x0_v = jnp.where(
        s.interior,
        v - dt * (s.inv_lumped * ((1.0 - th) * ku + th * ku_new)), 0.0)
    res_v = pcg(s._constrained(s.mass), rhs_v, x0_v,
                precond_inv_diag=1.0 / s.mass.stencil[1][1],
                abs_tol=s._solve_abs_tol(rhs_v, x0_v, s.mass),
                max_iter=2000, reduction=s.cg_reduction)
    v_new = res_v.x.astype(s.dtype)
    return FastState(u=u_new, v=v_new, a=a), (
        int(res_u.iterations), int(res_v.iterations)), (
        float(jnp.linalg.norm(rhs_u - s._constrained(s.system)(x0_u))),
        float(s._solve_abs_tol(rhs_u, x0_u, s.system)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nel", type=int, default=1024)
    p.add_argument("--dt", type=float, default=1e-3)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--schemes", nargs="+",
                   default=["theta-1.0", "theta-0.5", "newmark-0.25"])
    args = p.parse_args()
    print(jax.devices(), flush=True)
    geom = ((0.0, 0.0), (1.0, 1.0))

    def u0(x, y):
        return jnp.sin(np.pi * x) * jnp.sin(np.pi * y)

    for name in args.schemes:
        family, val = name.rsplit("-", 1)
        kw = ({"theta": float(val)} if family == "theta"
              else {"beta": float(val), "lumped": False})
        s = FastWaveSolver((args.nel, args.nel), geom, args.dt,
                           scheme=family, dtype=jnp.float32, **kw)
        precond = s.gmg_preconditioner()
        st = s.initial_state(u0)
        step = newmark_step_instr if family == "newmark" else theta_step_instr
        print(f"-- {name} nel={args.nel} dt={args.dt} "
              f"reduction={s.cg_reduction}", flush=True)
        for k in range(args.steps):
            st, iters, (r0n, atol) = step(s, st, precond)
            print(f"  step {k}: iters={iters}  ||r0||={r0n:.3e} "
                  f"abs_tol={atol:.3e}", flush=True)


if __name__ == "__main__":
    main()
