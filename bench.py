#!/usr/bin/env python3
"""Headline benchmark: explicit Newmark (lumped mass) throughput.

Reproduces the reference's strong-scaling configuration at the BASELINE.md
north-star scale: standing-mode problem, P1 elements, IO disabled
(reference scripts/scalability_sweep.py:85-120), explicit central-difference
Newmark. Metric: DoF*steps/second. Baseline: the reference's best CPU
number, 1.14e7 DoF*steps/s (Newmark beta=0, 32 MPI ranks on 2x28-core Xeon,
BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "DoF*steps/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

# persistent XLA compilation cache: makes repeated bench runs start fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax
import jax.numpy as jnp

REFERENCE_BASELINE = 1.14e7  # DoF*steps/s, reference p=32 explicit Newmark


def _cpu_reexec(reason: str):
    """Relaunch this script on the local CPU backend (the axon platform
    env must be overridden at process launch, so in-process config flips
    are too late)."""
    print(f"# TPU backend unavailable ({reason}); falling back to CPU",
          file=sys.stderr)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               TPUWAVE_BENCH_CPU_FALLBACK="1")
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(__file__)], env)


def _devices_with_fallback(timeout_s: float = 600.0):
    """jax.devices(), hardened against the remote-TPU tunnel being down:
    a raise OR a hang beyond ``timeout_s`` re-execs the bench on CPU so
    it still emits its one JSON line."""
    if os.environ.get("TPUWAVE_BENCH_CPU_FALLBACK"):
        return jax.devices()
    import threading
    watchdog = threading.Timer(timeout_s,
                               _cpu_reexec, ("device init timed out",))
    watchdog.daemon = True
    watchdog.start()
    try:
        devs = jax.devices()
    except RuntimeError as e:
        watchdog.cancel()
        _cpu_reexec(str(e).splitlines()[0][:120])
        raise  # unreachable (execve), keeps type-checkers honest
    watchdog.cancel()
    return devs


def main():
    from tpuwave.models.fast import FastWaveSolver

    platform = _devices_with_fallback()[0].platform
    on_accel = platform not in ("cpu",)
    nel = 4096 if on_accel else 512
    repeats = 5 if on_accel else 3

    solver = FastWaveSolver((nel, nel), ((0.0, 0.0), (1.0, 1.0)), 8e-5,
                            beta=0.0, dtype=jnp.float32)
    state = solver.initial_leapfrog_state(
        lambda xs, ys: jnp.sin(jnp.pi * xs) * jnp.sin(jnp.pi * ys))

    def sync(st):
        # force full materialisation (block_until_ready alone can return
        # before remote execution finishes under the axon tunnel)
        return float(jnp.sum(st.u))

    def run(st, path, chunk):
        if path.startswith("pallas-k"):
            k = int(path[len("pallas-k"):])
            return solver.run_leapfrog_multistep(st, chunk, steps_per_call=k,
                                                 block_rows=128,
                                                 double_buffer=True)
        if path == "pallas":
            return solver.run_leapfrog_pallas(st, chunk)
        return solver.run_leapfrog_scan(st, chunk)

    results = {}
    # (path, steps per timed call); chunk is a multiple of the kernel's k.
    # Deep chunks amortise per-call dispatch/sync (the axon tunnel costs
    # tens of ms per call): at chunk 6400 the k=32 kernel saturates at
    # ~157 us/step vs 564 us/step measured at chunk 96.
    paths = [("pallas-k32", 6400), ("pallas-k8", 960), ("pallas", 480),
             ("roll", 96)] if on_accel else [("roll", 8)]
    for path, chunk in paths:
        try:
            st = run(state, path, chunk)
            sync(st)
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                st = run(st, path, chunk)
                sync(st)
                best = min(best, time.perf_counter() - t0)
            results[path] = solver.n_dofs * chunk / best
        except Exception as e:  # pallas may be unavailable on some backends
            print(f"# {path} path failed: {type(e).__name__}", file=sys.stderr)

    if not results:
        print(json.dumps({"metric": "bench failed: no path ran",
                          "value": 0.0, "unit": "DoF*steps/s",
                          "vs_baseline": 0.0}))
        return 1
    path, value = max(results.items(), key=lambda kv: kv[1])
    print(json.dumps({
        "metric": (f"explicit Newmark (leapfrog, lumped) DoF*steps/s, "
                   f"{nel}x{nel} P1, f32, {platform}, {path} kernel"),
        "value": value,
        "unit": "DoF*steps/s",
        "vs_baseline": value / REFERENCE_BASELINE,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
