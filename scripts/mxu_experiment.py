#!/usr/bin/env python3
"""MXU experiment: can the 9-point leapfrog ride the matrix unit?

The fused Pallas multistep kernel (156.5 us/step at 4096^2 f32,
RESULTS.md) is VPU-bound: ~20 flop/DoF-step of elementwise work at ~2
TFLOP/s effective, far under the chip's matrix-unit peak. The only way to
feed a stencil to the MXU is to TRADE FLOPs for matmul shape: k leapfrog
steps form a linear recurrence

    u^{n+k}   = p_k(S) u^n + q_k(S) u^{n-1}
    u^{n+k-1} = p_{k-1}(S) u^n + q_{k-1}(S) u^{n-1}

with S = 2 I - dt^2 M_L^{-1} K and p, q polynomials of degree k, k-1 —
i.e. TWO dense convolutions with (2k+1)^2 / (2k-1)^2 kernels per k-step
block (plus two more for the second output). XLA lowers large-kernel
convs onto the MXU via im2col, contraction size (2k+1)^2.

Cost model (per DoF per step): conv flops ~ 2*[(2k+1)^2 + (2k-1)^2 +
(2k-1)^2 + (2k-3)^2]/k ~ 32k vs the VPU path's ~20 — a ~1.6k-fold flop
inflation, against an MXU/VPU peak ratio of only ~25x (bf16). Break-even
k ~ 32 at perfect MXU efficiency; this script MEASURES the actual
verdict (expected negative — recorded either way per the round-3 review).

Usage (on the chip):  python -u scripts/mxu_experiment.py --nel 4096 --k 8 16
Writes a summary table to stdout; copy the verdict into RESULTS.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def step_polynomials(s_kernel: np.ndarray, k: int):
    """p_k, q_k 2-D kernels for u^{n+k} = p_k * u^n + q_k * u^{n-1}.

    Recurrence on kernels (conv = polynomial multiply in S):
      p_1 = s, q_1 = -delta;  p_{j+1} = s * p_j + q_j,  q_{j+1} = -p_j.
    ``s_kernel`` is the 3x3 kernel of S = 2I - dt^2 M_L^{-1} K.
    """
    from scipy.signal import convolve2d

    def conv(a, b):
        return convolve2d(a, b, mode="full")

    delta = np.zeros((1, 1)); delta[0, 0] = 1.0
    p_prev, q_prev = delta, np.zeros((1, 1))        # p_0 = I, q_0 = 0
    p, q = s_kernel.copy(), -delta                  # p_1 = S, q_1 = -I

    def pad_to(a, shape):
        out = np.zeros(shape)
        oy = (shape[0] - a.shape[0]) // 2
        ox = (shape[1] - a.shape[1]) // 2
        out[oy:oy + a.shape[0], ox:ox + a.shape[1]] = a
        return out

    for _ in range(k - 1):
        p_new = conv(s_kernel, p)
        q_new = -p
        sh = p_new.shape
        p, q, p_prev, q_prev = (p_new + pad_to(q, sh), pad_to(q_new, sh),
                                p, q)
    # align the k-1 kernels to the k kernels' shape for a fused 2x2 apply
    sh = p.shape
    return p, q, pad_to(p_prev, sh), pad_to(q_prev, sh)


def conv_apply(u, kern, dtype):
    """Single-channel 2-D convolution, SAME padding, via conv_general."""
    lhs = u[None, None].astype(dtype)
    rhs = jnp.asarray(kern, dtype)[None, None]
    pad = (kern.shape[0] // 2, kern.shape[1] // 2)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1),
        padding=((pad[0], pad[0]), (pad[1], pad[1])),
        preferred_element_type=jnp.float32)
    return out[0, 0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nel", type=int, default=4096)
    ap.add_argument("--k", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--blocks", type=int, default=4,
                    help="k-step blocks per timed call")
    ap.add_argument("--dtypes", nargs="+", default=["float32", "bfloat16"])
    args = ap.parse_args()

    from tpuwave.models.fast import FastWaveSolver

    nel = args.nel
    s = FastWaveSolver((nel, nel), ((0.0, 0.0), (1.0, 1.0)), 8e-5,
                       beta=0.0, dtype=jnp.float32)
    # S = 2I - dt^2 M_L^{-1} K as a 3x3 kernel. NB conv kernels are
    # cross-correlation-flipped relative to stencil offsets; the stencil
    # here is symmetric under the flip, so the array transfers directly.
    kst = np.asarray(s.stiff.stencil)
    coef = s.dt * s.dt / s.mesh.det_j
    s_kernel = -coef * kst
    s_kernel[1, 1] += 2.0

    u0 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (nel + 1, nel + 1)), jnp.float32)
    up0 = jnp.asarray(np.random.default_rng(1).standard_normal(
        (nel + 1, nel + 1)), jnp.float32)

    # VPU reference: the fused Pallas multistep at k=32
    lfstate = type("LF", (), {})
    from tpuwave.models.fast import LeapfrogState
    st = LeapfrogState(u=u0, u_prev=up0)

    def sync(x):
        return float(jnp.sum(jnp.asarray(x, jnp.float32)))

    k_ref = 32
    n_ref = k_ref * args.blocks
    t0 = time.perf_counter()
    out = s.run_leapfrog_multistep(st, n_ref, steps_per_call=k_ref,
                                   double_buffer=True)
    sync(out.u)
    print(f"# pallas k=32 compile+first: {time.perf_counter()-t0:.1f} s",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = s.run_leapfrog_multistep(st, n_ref, steps_per_call=k_ref,
                                       double_buffer=True)
        sync(out.u)
        best = min(best, time.perf_counter() - t0)
    ref_us = best / n_ref * 1e6
    print(f"VPU pallas k=32: {ref_us:.1f} us/step", flush=True)

    for k in args.k:
        kerns = step_polynomials(s_kernel, k)
        ksz = kerns[0].shape[0]
        flops_dof_step = 2 * sum(kk.size for kk in kerns) / k
        for dt_name in args.dtypes:
            cdtype = jnp.dtype(dt_name)

            @jax.jit
            def kblock(u, up):
                un = (conv_apply(u, kerns[0], cdtype)
                      + conv_apply(up, kerns[1], cdtype))
                unm1 = (conv_apply(u, kerns[2], cdtype)
                        + conv_apply(up, kerns[3], cdtype))
                return un.astype(jnp.float32), unm1.astype(jnp.float32)

            @jax.jit
            def run(u, up):
                def body(c, _):
                    return kblock(*c), None
                return jax.lax.scan(body, (u, up), None,
                                    length=args.blocks)[0]

            try:
                t0 = time.perf_counter()
                u, up = run(u0, up0)
                sync(u)
                compile_s = time.perf_counter() - t0
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    u, up = run(u0, up0)
                    sync(u)
                    best = min(best, time.perf_counter() - t0)
                us_step = best / (k * args.blocks) * 1e6
                n = (nel + 1) ** 2
                tflops = flops_dof_step * n / (us_step * 1e-6) / 1e12
                # interior accuracy vs the VPU path over one k-block
                vpu = s.run_leapfrog_multistep(
                    LeapfrogState(u=u0, u_prev=up0), k, steps_per_call=k,
                    double_buffer=True)
                got = kblock(u0, up0)[0]
                m = ksz // 2 + 2
                denom = float(jnp.max(jnp.abs(vpu.u[m:-m, m:-m])))
                err = float(jnp.max(jnp.abs(
                    got[m:-m, m:-m] - vpu.u[m:-m, m:-m]))) / denom
                print(f"MXU conv k={k:3d} kernel={ksz}x{ksz} {dt_name}: "
                      f"{us_step:8.1f} us/step  ({flops_dof_step:.0f} "
                      f"flop/DoF-step, {tflops:.1f} TFLOP/s eff)  "
                      f"interior rel err vs VPU {err:.2e}  "
                      f"[compile {compile_s:.0f} s]  "
                      f"{'WIN' if us_step < ref_us else 'LOSS'} "
                      f"vs {ref_us:.1f}", flush=True)
            except Exception as e:
                print(f"MXU conv k={k} {dt_name}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
