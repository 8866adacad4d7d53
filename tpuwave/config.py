"""Global numeric configuration.

The reference solver (deal.II) is double precision throughout; parity runs
therefore enable JAX x64. On TPU, f64 is emulated and slow, so the
performance paths (lumped-mass explicit Newmark, stencil operators) are
written dtype-generically and are typically run in f32 on device while the
acceptance/parity suite runs f64 (on CPU or TPU).

Call :func:`use_x64` before building any arrays for parity runs; the CLI
entry points and the pytest suite do this automatically.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_X64_ENABLED = False


def use_x64(enable: bool = True) -> None:
    """Enable (or disable) 64-bit floats/ints in JAX. Idempotent."""
    global _X64_ENABLED
    jax.config.update("jax_enable_x64", bool(enable))
    _X64_ENABLED = bool(enable)


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_float():
    """The dtype parity code should use (f64 when x64 is on, else f32)."""
    return jnp.float64 if x64_enabled() else jnp.float32


def env_flag_enabled(name: str, default_value: bool) -> bool:
    """Read a boolean env flag with the reference's exact semantics.

    Mirrors the anonymous helper in the reference base class
    (src/WaveEquationBase.cpp:22-33): only the literal strings
    "0"/"false"/"FALSE"/"False" and "1"/"true"/"TRUE"/"True" are
    recognised; anything else returns the default.
    """
    v = os.environ.get(name)
    if v is None:
        return default_value
    if v in ("0", "false", "FALSE", "False"):
        return False
    if v in ("1", "true", "TRUE", "True"):
        return True
    return default_value
