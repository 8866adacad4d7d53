"""Pallas fused leapfrog kernel: interpret-mode equivalence with the
roll-based stencil path (runs on the CPU backend)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuwave.models.fast import FastWaveSolver


def u0(xs, ys):
    return jnp.sin(jnp.pi * xs) * jnp.sin(jnp.pi * ys)


def test_pallas_leapfrog_matches_roll_path():
    solver = FastWaveSolver((63, 63), ((0.0, 0.0), (1.0, 1.0)), 1e-3,
                            beta=0.0, dtype=jnp.float32)
    lf = solver.initial_leapfrog_state(u0)
    want = solver.run_leapfrog_scan(lf, 5)
    got = solver.run_leapfrog_pallas(lf, 5, block_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(want.u),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.u_prev), np.asarray(want.u_prev),
                               rtol=1e-5, atol=1e-6)


def test_pallas_handles_row_padding():
    # 50 true rows padded to 64 (block_rows=16): padding stays zero
    solver = FastWaveSolver((40, 49), ((0.0, 0.0), (1.0, 1.0)), 1e-3,
                            beta=0.0, dtype=jnp.float32)
    lf = solver.initial_leapfrog_state(u0)
    want = solver.run_leapfrog_scan(lf, 3)
    got = solver.run_leapfrog_pallas(lf, 3, block_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(want.u),
                               rtol=1e-5, atol=1e-6)


def test_multistep_pallas_matches_roll_path():
    solver = FastWaveSolver((63, 63), ((0.0, 0.0), (1.0, 1.0)), 1e-3,
                            beta=0.0, dtype=jnp.float32)
    lf = solver.initial_leapfrog_state(u0)
    want = solver.run_leapfrog_scan(lf, 8)
    got = solver.run_leapfrog_multistep(lf, 8, steps_per_call=4,
                                        block_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(want.u),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.u_prev), np.asarray(want.u_prev),
                               rtol=1e-4, atol=1e-6)


def test_multistep_wide_halo_matches_roll_path():
    # n_steps > 8 engages the 16-row halo path
    solver = FastWaveSolver((63, 63), ((0.0, 0.0), (1.0, 1.0)), 1e-3,
                            beta=0.0, dtype=jnp.float32)
    lf = solver.initial_leapfrog_state(u0)
    want = solver.run_leapfrog_scan(lf, 16)
    got = solver.run_leapfrog_multistep(lf, 16, steps_per_call=16,
                                        block_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(want.u),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.u_prev), np.asarray(want.u_prev),
                               rtol=1e-4, atol=1e-6)


def test_multistep_rejects_bad_counts():
    solver = FastWaveSolver((31, 31), ((0.0, 0.0), (1.0, 1.0)), 1e-3,
                            beta=0.0, dtype=jnp.float32)
    lf = solver.initial_leapfrog_state(u0)
    with pytest.raises(ValueError, match="multiple"):
        solver.run_leapfrog_multistep(lf, 6, steps_per_call=4, interpret=True)
    from tpuwave.ops.pallas_kernels import leapfrog_multistep_pallas
    with pytest.raises(ValueError, match="n_steps"):
        leapfrog_multistep_pallas(lf.u, lf.u_prev, stencil=((0,)*3,)*3,
                                  coef=1.0, n_steps=0, interpret=True)
    with pytest.raises(ValueError, match="halo"):
        # 12 steps need a 16-row halo; block_rows=8 is too small
        leapfrog_multistep_pallas(lf.u, lf.u_prev, stencil=((0,)*3,)*3,
                                  coef=1.0, n_steps=12, block_rows=8,
                                  interpret=True)


def test_leapfrog_equals_newmark_explicit():
    """Leapfrog recurrence == lumped Newmark beta=0 trajectory."""
    solver = FastWaveSolver((24, 24), ((0.0, 0.0), (1.0, 1.0)), 0.005,
                            beta=0.0, dtype=jnp.float64)
    st3 = solver.initial_state(u0)
    lf = solver.initial_leapfrog_state(u0)   # already at step 1
    st3 = solver.step(st3)
    for _ in range(10):
        st3 = solver.step(st3)
        lf = solver.leapfrog_step(lf)
    np.testing.assert_allclose(np.asarray(lf.u), np.asarray(st3.u),
                               rtol=1e-12, atol=1e-14)
    # velocity reconstruction: v^n = (u^{n+1} - u^{n-1}) / 2dt == Newmark v^n
    lf_next = solver.leapfrog_step(lf)
    v = solver.leapfrog_velocity(lf_next, lf)
    np.testing.assert_allclose(np.asarray(v), np.asarray(st3.v),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("scheme,kw", [
    ("newmark", dict(scheme="newmark", beta=0.25, gamma=0.5, lumped=False)),
    ("theta", dict(scheme="theta", theta=0.5, lumped=False)),
])
def test_implicit_pallas_matches_roll_path(scheme, kw):
    solver = FastWaveSolver((40, 40), ((0.0, 0.0), (1.0, 1.0)), 0.01,
                            dtype=jnp.float32, **kw)
    st = solver.initial_state(u0)
    want = solver.run_scan(st, 4)
    got = solver.run_implicit_pallas(st, 4, block_rows=16, interpret=True)
    # same scheme, same CG tolerances; differences are f32 solver noise
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(want.u),
                               rtol=1e-3, atol=1e-5)


def test_cheby_block_pallas_matches_xla_block():
    """One fused Chebyshev block == the XLA reference block, bitwise-ish."""
    from tpuwave.ops.pallas_kernels import cheby_block_pallas
    from tpuwave.solve.cheby_iter import (chebyshev_block,
                                          chebyshev_coefficients,
                                          stencil_symbol_bounds)

    solver = FastWaveSolver((30, 38), ((0.0, 0.0), (1.0, 1.0)), 0.01,
                            scheme="newmark", beta=0.25, lumped=False,
                            dtype=jnp.float64)
    lo, hi = stencil_symbol_bounds(solver.system.stencil)
    theta_c, coeffs = chebyshev_coefficients(lo, hi, 6)

    h, w = solver.shape
    hp, wp = 48, 64   # padded, 3 blocks of 16 rows
    rng = np.random.default_rng(3)
    interior = np.zeros((hp, wp), bool)
    interior[1:h - 1, 1:w - 1] = True
    r = jnp.asarray(np.where(interior, rng.normal(size=(hp, wp)), 0.0))
    x = jnp.asarray(np.where(interior, rng.normal(size=(hp, wp)), 0.0))

    interior_j = jnp.asarray(interior)

    def apply_c(wv):
        out = solver.system(jnp.where(interior_j, wv, 0.0))
        return jnp.where(interior_j, out, solver.system.stencil[1][1] * wv)

    want_x, want_r = chebyshev_block(apply_c, x, r, theta_c, coeffs)
    got_x, got_r, rn2 = cheby_block_pallas(
        x, r, stencil=solver.system.stencil, theta=theta_c,
        coeffs=tuple(coeffs), block_rows=16, true_rows=h, true_cols=w,
        interpret=True)

    # the roll path wraps across the FULL padded array while the kernel
    # wraps per-slab; both are exact on interior rows only
    np.testing.assert_allclose(np.asarray(got_x)[:h, :w],
                               np.asarray(want_x)[:h, :w],
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(got_r)[:h, :w],
                               np.asarray(want_r)[:h, :w],
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(float(rn2[0, 0]),
                               float(jnp.vdot(want_r, want_r)), rtol=1e-5)


@pytest.mark.parametrize("scheme,kw", [
    ("newmark", dict(scheme="newmark", beta=0.25, gamma=0.5, lumped=False)),
    ("theta", dict(scheme="theta", theta=0.5, lumped=False)),
])
def test_implicit_cheby_matches_roll_path(scheme, kw):
    solver = FastWaveSolver((40, 40), ((0.0, 0.0), (1.0, 1.0)), 0.01,
                            dtype=jnp.float32, **kw)
    st = solver.initial_state(u0)
    want = solver.run_scan(st, 4)
    got = solver.run_implicit_cheby(st, 4, degree=6, block_rows=16,
                                    interpret=True)
    # same schemes, both solved to the 1e-6 relative tolerance contract
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(want.u),
                               rtol=1e-3, atol=1e-5)
    if scheme == "theta":
        # a separate v-solve block degree changes only restart
        # granularity, never the stopping contract
        got2 = solver.run_implicit_cheby(st, 4, degree=6, degree_v=10,
                                         block_rows=16, interpret=True)
        np.testing.assert_allclose(np.asarray(got2.u), np.asarray(want.u),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got2.v), np.asarray(got.v),
                                   rtol=1e-3, atol=1e-5)


def test_constrained_apply_diff_matches_direct():
    """constrained_stencil_apply_pallas(diff=True) == diff=False for a
    zero-row-sum stencil (f64, interpret mode), pinned rows included."""
    from tpuwave.core.mesh import FeSpace, StructuredTriMesh
    from tpuwave.core.quadrature import gauss_simplex
    from tpuwave.ops.assembly import element_stiffness_class
    from tpuwave.ops.pallas_kernels import constrained_stencil_apply_pallas
    from tpuwave.ops.stencil import class_matrices_to_stencil

    sp = FeSpace(StructuredTriMesh((31, 23), ((0.0, 0.0), (1.0, 0.7))), 1)
    s = class_matrices_to_stencil(
        element_stiffness_class(sp, gauss_simplex(2), 1.0))
    st = tuple(map(tuple, s))
    rng = np.random.default_rng(3)
    h, w = 32, 128
    x = jnp.asarray(rng.normal(size=(h, w)))
    kw = dict(stencil=st, diag=0.0, block_rows=16, true_rows=24,
              true_cols=32, interpret=True)
    want = constrained_stencil_apply_pallas(x, diff=False, **kw)
    got = constrained_stencil_apply_pallas(x, diff=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12, atol=1e-12)


def test_recurrence_r0_kernel_matches_xla():
    """recurrence_r0_pallas == the XLA 2-term setup algebra (f64,
    interpret mode): r0, x0 and the two norm partials."""
    from tpuwave.ops.pallas_kernels import recurrence_r0_pallas
    from tpuwave.ops.stencil import apply_stencil_diff

    s = FastWaveSolver((40, 40), ((0.0, 0.0), (1.0, 1.0)), 0.01,
                       scheme="newmark", beta=0.25, gamma=0.6,
                       lumped=False, dtype=jnp.float64)
    dt = s.dt
    c_u, c_up = s.gamma + 0.5, 0.5 - s.gamma
    rng = np.random.default_rng(7)
    h, w = s.shape
    hp = -(-h // 8) * 8  # pad rows to the block multiple (pinned rows)
    ri = np.arange(hp)[:, None]
    ci = np.arange(w)[None, :]
    interior = jnp.asarray((ri > 0) & (ri < h - 1) & (ci > 0) & (ci < w - 1))
    u = jnp.where(interior, jnp.asarray(rng.normal(size=(hp, w))), 0.0)
    up = jnp.where(interior, jnp.asarray(rng.normal(size=(hp, w))), 0.0)
    kneg = tuple(tuple(-dt * dt * cc for cc in row)
                 for row in s.stiff.stencil)
    r0, x0, rn2, xn2 = recurrence_r0_pallas(
        u, up, k_stencil=kneg, c_u=c_u, c_up=c_up, block_rows=8,
        true_rows=h, true_cols=w, interpret=True)
    combo = c_u * u + c_up * up
    want_r0 = jnp.where(interior, apply_stencil_diff(combo, kneg), 0.0)
    want_x0 = jnp.where(interior, 2.0 * u - up, 0.0)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(want_r0),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(want_x0),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(float(rn2[0, 0]),
                               float(jnp.vdot(want_r0, want_r0)), rtol=1e-5)
    np.testing.assert_allclose(float(xn2[0, 0]),
                               float(jnp.vdot(want_x0, want_x0)), rtol=1e-5)


def test_theta_r0_kernels_match_xla():
    """theta_r0u/theta_r0v == the XLA roll-path residual algebra on
    interior nodes (f64, interpret mode)."""
    from tpuwave.ops.pallas_kernels import theta_r0u_pallas, theta_r0v_pallas

    th, dt = 0.5, 0.01
    solver = FastWaveSolver((30, 38), ((0.0, 0.0), (1.0, 1.0)), dt,
                            scheme="theta", theta=th, lumped=False,
                            dtype=jnp.float64)
    h, w = solver.shape
    hp, wp = 48, 64
    rng = np.random.default_rng(7)
    interior = np.zeros((hp, wp), bool)
    interior[1:h - 1, 1:w - 1] = True
    u = jnp.asarray(np.where(interior, rng.normal(size=(hp, wp)), 0.0))
    v = jnp.asarray(np.where(interior, rng.normal(size=(hp, wp)), 0.0))
    e = jnp.asarray(np.where(interior, rng.normal(size=(hp, wp)), 0.0))
    ii = jnp.asarray(interior)

    mu, ku, mv = solver.mass(u), solver.stiff(u), solver.mass(v)
    rhs_u = jnp.where(ii, mu - (dt * dt * th * (1 - th)) * ku + dt * mv, 0.0)
    au = jnp.where(ii, solver.system(jnp.where(ii, u, 0.0)), 0.0)
    want_r0u = rhs_u - au

    r0u, rn2, bn2, xn2 = theta_r0u_pallas(
        u, v, m_stencil=solver.mass.stencil, k_stencil=solver.stiff.stencil,
        c_comb=-dt * dt * th * (1 - th), c_r0k=-dt * dt * th, c_mv=dt,
        block_rows=16, true_rows=h, true_cols=w, interpret=True)
    np.testing.assert_allclose(np.asarray(r0u)[:h, :w],
                               np.asarray(want_r0u)[:h, :w],
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(float(rn2[0, 0]), float(jnp.vdot(r0u, r0u)),
                               rtol=1e-5)
    np.testing.assert_allclose(float(bn2[0, 0]), float(jnp.vdot(rhs_u, rhs_u)),
                               rtol=1e-5)
    np.testing.assert_allclose(float(xn2[0, 0]), float(jnp.vdot(u, u)),
                               rtol=1e-5)

    u_new_want = jnp.where(ii, u, 0.0) + e
    rhs_v = jnp.where(ii, mv - dt * (1 - th) * ku
                      - dt * th * solver.stiff(u_new_want), 0.0)
    mvv = jnp.where(ii, solver.mass(jnp.where(ii, v, 0.0)), 0.0)
    want_r0v = rhs_v - mvv

    u_new, r0v, rn2v, bn2v, xn2v = theta_r0v_pallas(
        u, e, v, m_stencil=solver.mass.stencil,
        k_stencil=solver.stiff.stencil, c_ku=-dt * (1 - th), c_kun=-dt * th,
        block_rows=16, true_rows=h, true_cols=w, interpret=True)
    np.testing.assert_allclose(np.asarray(u_new)[:h, :w],
                               np.asarray(u_new_want)[:h, :w],
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r0v)[:h, :w],
                               np.asarray(want_r0v)[:h, :w],
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(float(bn2v[0, 0]),
                               float(jnp.vdot(rhs_v, rhs_v)), rtol=1e-5)
