"""P2 plane-stencil solver == flat parity path."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuwave.models.discretization import Discretization
from tpuwave.models.fast_p2 import P2FastSolver
from tpuwave.models.newmark import NewmarkSolver
from tpuwave.utils.params import load_params

from tests.test_schemes import standing_mode


def u0(xs, ys):
    return jnp.sin(jnp.pi * xs) * jnp.sin(jnp.pi * ys)


def test_p2_fast_matches_parity_path():
    nel, dt, steps = 10, 0.005, 8
    fast = P2FastSolver((nel, nel), ((0.0, 0.0), (1.0, 1.0)), dt,
                        beta=0.25, gamma=0.5, dtype=jnp.float64)
    st = fast.initial_state(u0)

    p = load_params(standing_mode(Nel=str(nel), R="2", Dt=str(dt),
                                  T=str(dt * steps)))
    d = Discretization(p)
    s = NewmarkSolver(d)
    ref = s.initial_state()

    # flat DoF orderings agree (vertices then h/v/d edges), so states are
    # directly comparable
    np.testing.assert_allclose(np.asarray(st.u), np.asarray(ref.u),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.a), np.asarray(ref.a),
                               rtol=1e-5, atol=1e-7)

    t = 0.0
    for _ in range(steps):
        t += dt
        st = fast.step(st)
        ref, _ = s.step(ref, t)
    nrm = np.linalg.norm(np.asarray(ref.u))
    assert np.linalg.norm(np.asarray(st.u) - np.asarray(ref.u)) < 1e-6 * nrm


def test_p2_fast_tracks_exact_solution():
    nel, dt = 24, 0.004
    fast = P2FastSolver((nel, nel), ((0.0, 0.0), (1.0, 1.0)), dt,
                        dtype=jnp.float64)
    st = fast.initial_state(u0)
    n = 25
    st = fast.run_scan(st, n)
    t = dt * n
    # compare the vertex plane against the exact standing mode
    from tpuwave.ops.stencil_p2 import flat_to_planes
    planes = flat_to_planes(st.u, nel, nel)
    xs = np.linspace(0, 1, nel + 1)
    exact = (np.cos(np.sqrt(2) * np.pi * t)
             * np.outer(np.sin(np.pi * xs), np.sin(np.pi * xs)).T)
    err = np.linalg.norm(np.asarray(planes["V"]) - exact) / np.linalg.norm(exact)
    assert err < 1e-3
