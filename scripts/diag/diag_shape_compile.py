#!/usr/bin/env python3
"""Isolate what the TPU backend's compile time scales with: shape
alignment (odd 2^k+1 vs 128-multiple) and op-chain length.

Compiles a chain of K masked 9-point stencil applies (the V-cycle's
dominant op pattern, no hierarchy) for various (K, shape) and prints
compile seconds.

Usage: python -u scripts/diag_shape_compile.py "K,H[,W]" ...
e.g.   python -u scripts/diag_shape_compile.py 40,2049 40,2176 10,2049
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from tpuwave.ops.stencil import apply_stencil

S = ((1.0, 2.0, 0.0), (2.0, -12.0, 2.0), (0.0, 2.0, 1.0))

print(jax.devices(), flush=True)

for spec in sys.argv[1:]:
    parts = [int(p) for p in spec.split(",")]
    k, h = parts[0], parts[1]
    w = parts[2] if len(parts) > 2 else h

    def chain(x, k=k):
        ri = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        m = (ri > 0) & (ri < x.shape[0] - 1) & (ci > 0) & (ci < x.shape[1] - 1)
        for _ in range(k):
            x = jnp.where(m, apply_stencil(x, S), x)
            x = x * (1.0 / jnp.max(jnp.abs(x)))  # break trivial fusion chains
        return x

    b = jnp.zeros((h, w), jnp.float32)
    t0 = time.perf_counter()
    jax.jit(chain).lower(b).compile()
    print(f"K={k} shape=({h},{w}): compile {time.perf_counter() - t0:.1f} s",
          flush=True)
