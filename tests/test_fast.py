"""Fast grid-stencil path: stencil == element operators, lumped mass,
explicit scheme agreement, scan loop, and sharded execution on the
8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuwave.core.mesh import FeSpace, StructuredTriMesh
from tpuwave.core.quadrature import gauss_simplex
from tpuwave.models.fast import FastState, FastWaveSolver
from tpuwave.ops.assembly import element_mass_class, element_stiffness_class
from tpuwave.ops.operators import MatrixFreeOperator
from tpuwave.ops.stencil import (apply_stencil, boundary_mask_grid,
                                 class_matrices_to_stencil, lumped_mass_grid)


def build_flat(nx, ny, geom=((0.0, 0.0), (1.0, 1.0)), c2=1.0):
    m = StructuredTriMesh((nx, ny), geom)
    sp = FeSpace(m, 1)
    quad = gauss_simplex(2)
    mass = MatrixFreeOperator(sp.cell_dofs, sp.n_dofs,
                              a_class=element_mass_class(sp, quad))
    stiff = MatrixFreeOperator(sp.cell_dofs, sp.n_dofs,
                               a_class=element_stiffness_class(sp, quad, c2))
    return m, sp, mass, stiff


@pytest.mark.parametrize("op_name", ["mass", "stiff"])
def test_stencil_matches_flat_on_interior(op_name):
    nx, ny = 7, 5
    m, sp, mass, stiff = build_flat(nx, ny, geom=((0.0, 0.0), (1.4, 1.0)))
    quad = gauss_simplex(2)
    a_class = (element_mass_class(sp, quad) if op_name == "mass"
               else element_stiffness_class(sp, quad, 1.0))
    s = class_matrices_to_stencil(a_class)
    rng = np.random.default_rng(0)
    u = rng.normal(size=(ny + 1, nx + 1))
    got = np.asarray(apply_stencil(jnp.asarray(u), tuple(map(tuple, s))))
    op = mass if op_name == "mass" else stiff
    want = np.asarray(op(jnp.asarray(u.ravel()))).reshape(ny + 1, nx + 1)
    interior = ~boundary_mask_grid(sp)
    np.testing.assert_allclose(got[interior], want[interior],
                               rtol=1e-12, atol=1e-13)


def test_stencil_diff_matches_direct_for_stiffness():
    """apply_stencil_diff == apply_stencil on interior nodes for
    zero-row-sum (stiffness) stencils, in f64 where cancellation noise
    is negligible."""
    from tpuwave.ops.stencil import apply_stencil_diff
    nx, ny = 9, 6
    m, sp, mass, stiff = build_flat(nx, ny, geom=((0.0, 0.0), (1.3, 0.9)))
    quad = gauss_simplex(2)
    s = class_matrices_to_stencil(element_stiffness_class(sp, quad, 2.25))
    assert abs(np.asarray(s).sum()) < 1e-12  # zero row sum (K const = 0)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(ny + 1, nx + 1)))
    st = tuple(map(tuple, s))
    got = np.asarray(apply_stencil_diff(u, st))
    want = np.asarray(apply_stencil(u, st))
    interior = ~boundary_mask_grid(sp)
    np.testing.assert_allclose(got[interior], want[interior],
                               rtol=1e-12, atol=1e-13)


def test_stencil_diff_noise_floor_f32():
    """On a smooth field the difference form's f32 result tracks the f64
    truth better than the direct form (the bulk of the remaining error is
    the INPUT's f32 representation noise propagated through K, common to
    both forms — measured ~1.4x improvement, not orders of magnitude)."""
    from tpuwave.ops.stencil import apply_stencil_diff
    nx = ny = 512
    m, sp, _, _ = build_flat(nx, ny)
    quad = gauss_simplex(2)
    s = class_matrices_to_stencil(element_stiffness_class(sp, quad, 1.0))
    st = tuple(map(tuple, s))
    xs = np.linspace(0, 1, nx + 1)
    u64 = jnp.asarray(np.sin(np.pi * xs)[None, :]
                      * np.sin(np.pi * xs)[:, None])
    u32 = u64.astype(jnp.float32)
    interior = ~boundary_mask_grid(sp)
    truth = np.asarray(apply_stencil(u64, st))[interior]
    err_direct = np.linalg.norm(
        np.asarray(apply_stencil(u32, st), np.float64)[interior] - truth)
    err_diff = np.linalg.norm(
        np.asarray(apply_stencil_diff(u32, st), np.float64)[interior]
        - truth)
    assert err_diff < err_direct


def test_compensated_leapfrog_beats_plain_f32():
    """The TwoSum error-carry state (CompensatedState) tracks the f64
    leapfrog trajectory far below the plain f32 path's rounding floor
    (measured 160x at 512^2/800 steps; assert a conservative 10x at this
    smaller config)."""
    geom = ((0.0, 0.0), (1.0, 1.0))
    n, steps = 128, 400
    cfl_dt = 0.9 / (n * np.sqrt(2.0) * 2)

    def u0f(x, y):
        return jnp.sin(np.pi * x) * jnp.sin(np.pi * y)

    s64 = FastWaveSolver((n, n), geom, cfl_dt, dtype=jnp.float64)
    ref = s64.run_leapfrog_scan(s64.initial_leapfrog_state(u0f), steps)
    s32 = FastWaveSolver((n, n), geom, cfl_dt, dtype=jnp.float32)
    plain = s32.run_leapfrog_scan(s32.initial_leapfrog_state(u0f), steps)
    comp = s32.run_leapfrog_compensated(s32.initial_compensated_state(u0f),
                                        steps)
    den = float(jnp.linalg.norm(ref.u))
    ep = float(jnp.linalg.norm(plain.u.astype(jnp.float64) - ref.u)) / den
    full = comp.u.astype(jnp.float64) + comp.u_lo.astype(jnp.float64)
    ec = float(jnp.linalg.norm(full - ref.u)) / den
    assert ec < ep / 10
    # and the head alone is no worse than the plain path
    eh = float(jnp.linalg.norm(comp.u.astype(jnp.float64) - ref.u)) / den
    assert eh < 2 * ep


def test_lumped_mass_grid_matches_rowsums():
    for nx, ny in ((4, 3), (7, 7), (2, 5)):
        m, sp, mass, _ = build_flat(nx, ny, geom=((-1.0, 0.0), (2.0, 2.0)))
        want = np.asarray(mass.row_sums()).reshape(ny + 1, nx + 1)
        got = lumped_mass_grid(sp)
        np.testing.assert_allclose(got, want, rtol=1e-12)


def standing_u0(xs, ys):
    return jnp.sin(jnp.pi * xs) * jnp.sin(jnp.pi * ys)


def test_fast_explicit_matches_reference_path():
    """Grid fast path == flat lumped-explicit NewmarkSolver trajectory."""
    from tpuwave.models.discretization import Discretization
    from tpuwave.models.newmark import NewmarkSolver
    from tests.test_schemes import standing_mode
    from tpuwave.utils.params import load_params

    nel, dt, steps = 20, 0.005, 20
    fast = FastWaveSolver((nel, nel), ((0.0, 0.0), (1.0, 1.0)), dt,
                          beta=0.0, dtype=jnp.float64)
    st = fast.initial_state(standing_u0)
    for _ in range(steps):
        st = fast.step(st)

    p = load_params(standing_mode(Nel=str(nel), Dt=str(dt), T=str(dt * steps),
                                  Beta="0.0"))
    d = Discretization(p)
    s = NewmarkSolver(d, lumped_explicit=True)
    ref = s.initial_state()
    t = 0.0
    while t < p.t_final:
        t += p.dt
        ref, _ = s.step(ref, t)

    got = np.asarray(st.u).ravel()
    want = np.asarray(ref.u)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_fast_scan_equals_stepwise():
    fast = FastWaveSolver((16, 16), ((0.0, 0.0), (1.0, 1.0)), 0.01,
                          dtype=jnp.float64)
    st0 = fast.initial_state(standing_u0)
    st_scan = fast.run_scan(st0, 10)
    st_loop = st0
    for _ in range(10):
        st_loop = fast.step(st_loop)
    np.testing.assert_allclose(np.asarray(st_scan.u), np.asarray(st_loop.u),
                               rtol=1e-12)


def test_fast_energy_stable_explicit():
    fast = FastWaveSolver((24, 24), ((0.0, 0.0), (1.0, 1.0)), 0.01,
                          dtype=jnp.float64)
    st = fast.initial_state(standing_u0)
    e0 = float(fast.energy(st))
    st = fast.run_scan(st, 100)
    eT = float(fast.energy(st))
    assert eT == pytest.approx(e0, rel=0.02)  # CD: bounded oscillation


def test_fast_implicit_newmark_matches_consistent():
    """Implicit stencil Newmark(1/4,1/2) tracks the exact solution."""
    fast = FastWaveSolver((24, 24), ((0.0, 0.0), (1.0, 1.0)), 0.01,
                          beta=0.25, gamma=0.5, lumped=False,
                          dtype=jnp.float64)
    st = fast.initial_state(standing_u0)
    n = 20
    st = fast.run_scan(st, n)
    t = 0.01 * n
    xs, ys = fast.grid_coords()
    exact = np.cos(np.sqrt(2) * np.pi * t) * np.asarray(standing_u0(xs, ys))
    err = np.linalg.norm(np.asarray(st.u) - exact) / np.linalg.norm(exact)
    assert err < 5e-3


def test_fast_sharded_matches_single_device():
    """8-way row sharding (virtual CPU mesh) reproduces the single-device
    trajectory — the 'multi-node without a cluster' check."""
    from tpuwave.parallel.sharding import device_mesh, grid_sharding

    assert len(jax.devices()) >= 8
    mesh = device_mesh(8)
    sh = grid_sharding(mesh)
    # ny+1 = 24 rows over 8 devices = 3 rows per shard
    single = FastWaveSolver((16, 23), ((0.0, 0.0), (1.0, 1.0)), 0.005,
                            dtype=jnp.float64)
    st = single.initial_state(standing_u0)
    want = single.run_scan(st, 25)

    sharded = FastWaveSolver((16, 23), ((0.0, 0.0), (1.0, 1.0)), 0.005,
                             dtype=jnp.float64, sharding=sh)
    st_s = sharded.initial_state(standing_u0)
    assert len(st_s.u.sharding.device_set) == 8
    got = sharded.run_scan(st_s, 25)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(want.u),
                               rtol=1e-11, atol=1e-12)


def test_fast_sharded_2d_mesh():
    """2D (rows x cols) domain decomposition via a ('y','x') device mesh."""
    from tpuwave.parallel.sharding import device_mesh, grid_sharding

    mesh = device_mesh(8, shape=(4, 2))
    sh = grid_sharding(mesh)
    single = FastWaveSolver((15, 19), ((0.0, 0.0), (1.0, 1.0)), 0.005,
                            dtype=jnp.float64)
    want = single.run_scan(single.initial_state(standing_u0), 15)

    sharded = FastWaveSolver((15, 19), ((0.0, 0.0), (1.0, 1.0)), 0.005,
                             dtype=jnp.float64, sharding=sh)
    st = sharded.initial_state(standing_u0)
    assert len(st.u.sharding.device_set) == 8
    got = sharded.run_scan(st, 15)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(want.u),
                               rtol=1e-11, atol=1e-12)


def test_fast_sharded_implicit_cg():
    """Sharded implicit path (CG dots -> psum) matches single device."""
    from tpuwave.parallel.sharding import device_mesh, grid_sharding

    mesh = device_mesh(8)
    sh = grid_sharding(mesh)
    kw = dict(beta=0.25, gamma=0.5, lumped=False, dtype=jnp.float64)
    single = FastWaveSolver((12, 15), ((0.0, 0.0), (1.0, 1.0)), 0.01, **kw)
    st = single.initial_state(standing_u0)
    want = single.run_scan(st, 5)
    sharded = FastWaveSolver((12, 15), ((0.0, 0.0), (1.0, 1.0)), 0.01,
                             sharding=sh, **kw)
    got = sharded.run_scan(sharded.initial_state(standing_u0), 5)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(want.u),
                               rtol=1e-9, atol=1e-11)


def test_fast_energy_uses_wave_speed():
    """Energy must use the solver's c^2 — with c=2 the conserved quantity is
    1/2 (v M v + u K_c u); a mismatched K would show large E oscillation."""
    fast = FastWaveSolver((24, 24), ((0.0, 0.0), (1.0, 1.0)), 0.004,
                          c=2.0, dtype=jnp.float64)
    st = fast.initial_state(standing_u0)
    e0 = float(fast.energy(st))
    st = fast.run_scan(st, 100)
    eT = float(fast.energy(st))
    assert eT == pytest.approx(e0, rel=0.02)


def test_driven_boundary_leapfrog():
    """Time-dependent Dirichlet g on the fast path: grid implementation ==
    a direct flat-operator replica of the same algorithm (lumped CD with
    pinned boundary), and the boundary tracks g exactly."""
    import math
    from tpuwave.models.discretization import Discretization
    from tpuwave.models.runner import time_steps
    from tpuwave.models.fast import LeapfrogState
    from tests.test_schemes import osc_boundary
    from tpuwave.utils.params import load_params

    nel, dt, t_final = 16, 0.005, 0.1
    case = osc_boundary(Nel=str(nel), Dt=str(dt), T=str(t_final))
    p = load_params(case)
    d = Discretization(p)
    times = time_steps(t_final, dt)

    def g_fn(xs, ys, t):
        cond = (xs < 0.1) & (ys >= 0) & (ys <= 1)
        return jnp.where(cond, jnp.sin(6 * math.pi * t), 0.0)

    fast = FastWaveSolver((nel, nel), ((0.0, 0.0), (1.0, 1.0)), dt,
                          beta=0.0, dtype=jnp.float64)
    zeros = jnp.zeros(fast.shape, jnp.float64)
    st = fast.run_leapfrog_driven(LeapfrogState(u=zeros, u_prev=zeros),
                                  times, g_fn)

    # direct flat-operator replica of the identical recurrence
    bnd = jnp.asarray(d.space.boundary_mask)
    u = jnp.zeros(d.n_dofs)
    up = jnp.zeros(d.n_dofs)
    inv_l = 1.0 / d.lumped_mass
    for t in times:
        un = 2.0 * u - up - dt * dt * (d.stiffness(u) * inv_l)
        un = jnp.where(bnd, d.boundary_values(p.g, t), un)
        up, u = u, un

    np.testing.assert_allclose(np.asarray(st.u).ravel(), np.asarray(u),
                               rtol=1e-12, atol=1e-13)
    # boundary pinned exactly; interior excited
    g_want = np.asarray(d.boundary_values(p.g, times[-1]))
    np.testing.assert_allclose(np.asarray(st.u).ravel()[np.asarray(bnd)],
                               g_want[np.asarray(bnd)], atol=1e-12)
    assert np.linalg.norm(np.asarray(st.u).ravel()[~np.asarray(bnd)]) > 1e-3
