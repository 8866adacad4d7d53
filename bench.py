#!/usr/bin/env python3
"""Headline benchmark: explicit Newmark (lumped mass) throughput.

Reproduces the reference's strong-scaling configuration at the BASELINE.md
north-star scale: standing-mode problem, P1 elements, IO disabled
(reference scripts/scalability_sweep.py:85-120), explicit central-difference
Newmark. Metric: DoF*steps/second. Baseline: the reference's best CPU
number, 1.14e7 DoF*steps/s (Newmark beta=0, 32 MPI ranks on 2x28-core Xeon,
BASELINE.md).

Budget-proof contract (the driver runs this under a wall-clock timeout and
parses the LAST JSON line on stdout):

  * a valid JSON result line is printed and flushed after the FIRST
    measured path; faster paths re-print improved lines as they finish,
    so a kill at any point after ~1 minute still leaves a parseable result;
  * paths run cheapest-compile-first (XLA roll -> pallas k=1 -> k=8 -> k=32);
  * device init is watchdogged at 90 s before falling back to CPU;
  * a hard deadline (TPUWAVE_BENCH_BUDGET seconds, default 450) exits 0
    with the best-so-far already on stdout, enforced from a timer thread
    so even a wedged XLA compile cannot eat the whole budget;
  * the persistent XLA compile cache (.jax_cache/) makes warm reruns start
    in seconds -- `python bench.py` itself is the warmup.

Run-to-run variance: each path reports the MIN of ``repeats`` timed
chunks, but chunk-level minima under the remote-TPU (axon) tunnel still
move a few percent between bench invocations (tunnel RTT jitter on the
per-chunk sync + compile-server load; observed headline spread r02
1.068e11 vs r03 1.017e11, ~5%). Differences within ~±5% between rounds
are measurement noise, not kernel regressions; cross-check with the
us/step roofline lines on stderr, which carry the same jitter.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

# persistent XLA compilation cache: makes repeated bench runs start fast
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax
import jax.numpy as jnp

REFERENCE_BASELINE = 1.14e7  # DoF*steps/s, reference p=32 explicit Newmark

# --- roofline model constants (printed to stderr per measured path) ----
# flop/DoF-step of the leapfrog update: 7-pt stencil (7 mul + 6 add) +
# lumped-mass scale + 2u - u_prev - dt^2 a combine ~ 17; round up to the
# RESULTS.md accounting of ~20 to include boundary masking selects.
FLOP_PER_DOF_STEP = 20.0
# v5e headline peaks for context: HBM ~819 GB/s; MXU 197 TFLOP/s bf16
# (f32 via 3-pass decomposition ~1/3 of that); VPU f32 is O(4) TFLOP/s.
HBM_GBPS_PEAK = 819.0
MXU_TFLOPS_BF16 = 197.0

_best_value = 0.0
_emit_lock = threading.Lock()


def emit(metric: str, value: float) -> None:
    """Print one JSON result line (only if it improves on the best so far)
    and flush immediately so a later kill cannot lose it."""
    global _best_value
    with _emit_lock:
        if value <= _best_value:
            return
        _best_value = value
        print(json.dumps({
            "metric": metric,
            "value": value,
            "unit": "DoF*steps/s",
            "vs_baseline": value / REFERENCE_BASELINE,
        }), flush=True)


def _deadline_exit():
    """Hard-deadline exit from the watchdog thread: best-so-far lines are
    already flushed, so leave rc=0 if we measured anything at all.

    Takes ``_emit_lock`` first so an emit() in flight on the main thread
    finishes its flushed print before the process dies — otherwise the
    driver could json-parse a truncated final stdout line."""
    with _emit_lock:
        sys.stderr.write("# bench budget exhausted; exiting with best-so-far\n")
        sys.stderr.flush()
        os._exit(0 if _best_value > 0 else 1)


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


def _devices_with_fallback(timeout_s: float = 90.0):
    """jax.devices(), hardened against the remote-TPU tunnel being down:
    a raise OR a hang beyond ``timeout_s`` re-execs the bench on CPU so
    it still emits its JSON lines."""
    if os.environ.get("TPUWAVE_BENCH_CPU_FALLBACK"):
        return jax.devices()
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
    budget = float(os.environ.get("TPUWAVE_BENCH_BUDGET", "450"))
    deadline = time.monotonic() + budget
    killer = threading.Timer(budget, _deadline_exit)
    killer.daemon = True
    killer.start()
    # a SIGTERM (driver timeout) also exits cleanly with best-so-far.
    # The exit runs on a FRESH thread: the handler itself executes on the
    # main thread, and _deadline_exit takes _emit_lock — if the signal
    # landed mid-emit() the handler would self-deadlock on the lock the
    # interrupted main thread holds. The helper thread simply waits for
    # the in-flight print to finish, then exits.
    try:
        signal.signal(signal.SIGTERM, lambda *_: threading.Thread(
            target=_deadline_exit, daemon=True).start())
    except ValueError:
        pass  # not on the main thread (never happens, but harmless)

    from tpuwave.models.fast import FastWaveSolver

    platform = _devices_with_fallback()[0].platform
    on_accel = platform not in ("cpu",)
    nel = 4096 if on_accel else 512
    repeats = 3

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

    # Cheapest-compile-first so the first JSON line lands within ~1 min
    # even on a cold cache. Measured cold-compile times on the chip at
    # 4096^2: pallas k=1 8.5 s, roll scan 343 s (!) -- XLA's fusion of the
    # 96-step roll scan is pathologically slow to compile, so the Pallas
    # kernels lead and the roll path runs last as a cross-check. Deep
    # chunks amortise per-call dispatch/sync (the axon tunnel costs tens
    # of ms per call): at chunk 6400 the k=32 kernel saturates at
    # ~157 us/step vs 564 us/step at chunk 96.
    paths = [("pallas", 480), ("pallas-k8", 960), ("pallas-k32", 6400),
             ("roll", 96)] if on_accel else [("roll", 8)]
    for path, chunk in paths:
        if time.monotonic() > deadline - 45:
            print(f"# skipping {path}: <45 s of budget left", file=sys.stderr)
            break
        try:
            t0 = time.perf_counter()
            st = run(state, path, chunk)  # compile + first run
            sync(st)
            print(f"# {path}: compile+first call "
                  f"{time.perf_counter() - t0:.1f} s", file=sys.stderr)
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                st = run(st, path, chunk)
                sync(st)
                best = min(best, time.perf_counter() - t0)
                if time.monotonic() > deadline - 20:
                    break
            value = solver.n_dofs * chunk / best
            # roofline accounting (VERDICT round-2 weak item 1): us/step,
            # model HBM traffic of the k-blocked kernel (2 reads + 2
            # writes per k steps, 4 B each), effective TFLOP/s and the
            # peak fractions — printed so every bench run carries its own
            # MFU context
            us_step = best / chunk * 1e6
            k = (int(path[len("pallas-k"):]) if path.startswith("pallas-k")
                 else 1)
            gbps = solver.n_dofs * 4.0 * 4 / k / (us_step * 1e-6) / 1e9
            tflops = FLOP_PER_DOF_STEP * value / 1e12
            print(f"# roofline {path}: {us_step:.1f} us/step, "
                  f"model HBM {gbps:.0f} GB/s ({gbps / HBM_GBPS_PEAK:.0%} "
                  f"of ~{HBM_GBPS_PEAK:.0f}), {tflops:.2f} TFLOP/s "
                  f"effective ({tflops / MXU_TFLOPS_BF16:.1%} of MXU bf16 "
                  f"peak; stencil runs on the VPU)", file=sys.stderr)
            emit(f"explicit Newmark (leapfrog, lumped) DoF*steps/s, "
                 f"{nel}x{nel} P1, f32, {platform}, {path} kernel", value)
        except Exception as e:  # pallas may be unavailable on some backends
            print(f"# {path} path failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)

    if _best_value == 0.0:
        print(json.dumps({"metric": "bench failed: no path ran",
                          "value": 0.0, "unit": "DoF*steps/s",
                          "vs_baseline": 0.0}))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
