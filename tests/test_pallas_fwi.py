"""Fused variable-coefficient FWI kernels (ops/pallas_varcoef.py):
interpret-mode equivalence of engine="pallas" with the XLA stencil-plane
engine — forward traces, misfit gradients (time-reversal adjoint) and
wavelet cotangents."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuwave.models.inverse import FwiProblem


NEL = (12, 10)          # (ny+1, nx+1) = (11, 13) -> padded rows 16, br=8
GEOM = ((0.0, 0.0), (1.0, 1.0))
DT = 8e-3
STEPS = 12


def _problem(engine, **kw):
    return FwiProblem(NEL, GEOM, DT, STEPS, source=(0.45, 0.55),
                      receivers=[(0.25, 0.3), (0.7, 0.65)],
                      dtype=jnp.float64, engine=engine,
                      adjoint="reversal", pallas_block_rows=8,
                      pallas_interpret=True, **kw)


def _c2(prob, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(1.0 + 0.3 * rng.random(prob.n_cells))


def test_pallas_forward_matches_stencil_engine():
    ref = _problem("stencil")
    pal = _problem("pallas")
    c2 = _c2(ref)
    want = np.asarray(ref.simulate(c2))
    got = np.asarray(pal.simulate(c2))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)


def test_pallas_forward_interp_receivers():
    ref = _problem("stencil", interp_receivers=True)
    pal = _problem("pallas", interp_receivers=True)
    c2 = _c2(ref, seed=3)
    np.testing.assert_allclose(np.asarray(pal.simulate(c2)),
                               np.asarray(ref.simulate(c2)),
                               rtol=1e-12, atol=1e-13)


def test_pallas_gradient_matches_stencil_reversal():
    ref = _problem("stencil")
    pal = _problem("pallas")
    c2_true = _c2(ref, seed=1)
    obs = ref.simulate(c2_true)
    c2_init = jnp.ones(ref.n_cells)
    v_ref, g_ref = jax.value_and_grad(ref.misfit)(c2_init, obs)
    v_pal, g_pal = jax.value_and_grad(pal.misfit)(c2_init, obs)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-9, atol=1e-14)


def test_pallas_wavelet_cotangent_matches():
    ref = _problem("stencil")
    pal = _problem("pallas")
    c2 = _c2(ref, seed=2)
    obs = ref.simulate(1.1 * c2)

    def loss(p):
        def f(w):
            return p.misfit(c2, obs, wavelet=w)
        return jax.grad(f)(p.wavelet)

    np.testing.assert_allclose(np.asarray(loss(pal)),
                               np.asarray(loss(ref)),
                               rtol=1e-9, atol=1e-14)


def test_pallas_engine_guards():
    with pytest.raises(ValueError, match="pallas"):
        FwiProblem(NEL, GEOM, DT, STEPS, source=(0.5, 0.5),
                   receivers=[(0.25, 0.25)], engine="pallas",
                   adjoint="remat")


def test_damped_kernel_matches_xla_sponge_step():
    """Kernel-level check of the damped variant (the sponge forward update)
    against the stencil engine's XLA step body."""
    from tpuwave.ops.pallas_varcoef import (OFFSETS,
                                            varcoef_leapfrog_step_pallas)
    prob = FwiProblem((16, 12), GEOM, DT, 4, source=(0.5, 0.5),
                      receivers=[(0.3, 0.3)], dtype=jnp.float64,
                      engine="stencil", sponge_width=0.2,
                      sponge_strength=12.0)
    rng = np.random.default_rng(7)
    c2 = jnp.asarray(1.0 + 0.2 * rng.random(prob.n_cells))
    rows, cols = prob.mesh.ny + 1, prob.mesh.nx + 1
    u = jnp.asarray(rng.standard_normal((rows, cols))).reshape(-1)
    u = u * prob._interior
    up = jnp.asarray(rng.standard_normal((rows, cols))).reshape(-1)
    up = up * prob._interior

    # XLA step body (no source term)
    dt2 = DT * DT
    planes_d = prob._assemble_stencil_planes(c2)
    f = -prob._apply_stencil_planes(planes_d, u) * prob._inv_lumped
    want = ((2.0 * u - prob._damp_num * up + dt2 * f)
            * prob._damp_den * prob._interior)

    # kernel on the padded grid
    br, W = 8, 128
    H = max(-(-rows // br), 3) * br   # middle DMA branch traces br+16 rows
    pad = lambda g: jnp.zeros((H, W), jnp.float64).at[
        :rows, :cols].set(g.reshape(rows, cols))
    zero = jnp.zeros((rows, cols), jnp.float64)
    planes = jnp.zeros((7, H, W), jnp.float64).at[:, :rows, :cols].set(
        jnp.stack([planes_d.get(d, zero) for d in OFFSETS]))
    got = varcoef_leapfrog_step_pallas(
        pad(u), pad(up), planes, coef=dt2 / prob._det_j,
        damp=(pad(prob._damp_num), pad(prob._damp_den)),
        block_rows=br, true_rows=rows, true_cols=cols, interpret=True)
    np.testing.assert_allclose(np.asarray(got[:rows, :cols]).ravel(),
                               np.asarray(want), rtol=1e-12, atol=1e-13)


def _sponge_pair(k, **extra):
    kw = dict(sponge_width=0.22, sponge_strength=25.0,
              boundary_save="ring", **extra)
    ref = _problem("stencil", **kw)
    pal = _problem("pallas", pallas_steps_per_call=k, **kw)
    return ref, pal


def _check_sponge_equality(ref, pal):
    c2_true = _c2(ref, seed=5)
    obs = ref.simulate(c2_true)
    np.testing.assert_allclose(np.asarray(pal.simulate(c2_true)),
                               np.asarray(obs), rtol=1e-12, atol=1e-13)

    c2_init = jnp.ones(ref.n_cells)
    v_ref, g_ref = jax.value_and_grad(ref.misfit)(c2_init, obs)
    v_pal, g_pal = jax.value_and_grad(pal.misfit)(c2_init, obs)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-9, atol=1e-14)

    def wgrad(p):
        return jax.grad(lambda w: p.misfit(c2_init, obs, wavelet=w))(
            p.wavelet)

    np.testing.assert_allclose(np.asarray(wgrad(pal)),
                               np.asarray(wgrad(ref)),
                               rtol=1e-9, atol=1e-14)


def test_pallas_sponge_ring_matches_stencil_ring():
    """engine='pallas' + sponge (ring boundary saving, single-step
    kernels): traces, misfit, c2 gradient and wavelet cotangents equal
    the stencil engine's ring mode exactly, in f64 interpret mode."""
    ref, pal = _sponge_pair(k=1)
    assert pal._pallas_layout["k"] == 1
    _check_sponge_equality(ref, pal)


def test_pallas_sponge_ring_multistep():
    """Same equality through the DAMPED multistep kernels (k=8 with a
    3-step remainder: chunked fused passes + head/tail single steps,
    in-kernel ring save/restore, 9-plane damped updates)."""
    ref, pal = _sponge_pair(k=8)
    assert pal._pallas_layout["k"] == 8
    _check_sponge_equality(ref, pal)


def test_pallas_sponge_requires_ring():
    with pytest.raises(ValueError, match="ring"):
        _problem("pallas", sponge_width=0.2)


# --- temporal blocking (multistep kernel) ---------------------------------

def _big_problem(engine, steps=20, k=8, **kw):
    # padded rows 32 >= br + 2*halo = 24, so steps_per_call=8 activates
    return FwiProblem((12, 26), GEOM, DT, steps, source=(0.45, 0.55),
                      receivers=[(0.25, 0.3), (0.7, 0.65)],
                      dtype=jnp.float64, engine=engine,
                      adjoint="reversal", pallas_block_rows=8,
                      pallas_steps_per_call=k,
                      pallas_interpret=True, **kw)


def test_block_rows_vmem_autoclamp():
    """Wide grids auto-halve the row-block size so the multistep adjoint
    fits VMEM (4096-class widths at f32: 128 -> 64)."""
    wide = FwiProblem((4160, 128), GEOM, DT, 4, source=(0.5, 0.5),
                      receivers=[(0.3, 0.3)], dtype=jnp.float32,
                      engine="pallas", adjoint="reversal",
                      pallas_block_rows=128, pallas_interpret=True)
    assert wide._pallas_layout["W"] == 4224
    assert wide._pallas_layout["br"] == 64
    narrow = FwiProblem((256, 256), GEOM, DT, 4, source=(0.5, 0.5),
                        receivers=[(0.3, 0.3)], dtype=jnp.float32,
                        engine="pallas", adjoint="reversal",
                        pallas_block_rows=128, pallas_interpret=True)
    assert narrow._pallas_layout["br"] == 128


def test_multistep_layout_activates():
    prob = _big_problem("pallas")
    assert prob._pallas_layout["k"] == 8
    # k=16 needs a 16-row halo > br=8: falls back to the largest fit (8)
    wide = _big_problem("pallas", k=16)
    assert wide._pallas_layout["k"] == 8
    one = _big_problem("pallas", k=1)
    assert one._pallas_layout["k"] == 1


def test_multistep_forward_matches_stencil_engine():
    """steps=20 -> 1 half-start + 2 fused chunks of 8 + 3 tail steps."""
    ref = _big_problem("stencil")
    pal = _big_problem("pallas")
    c2 = _c2(ref, seed=5)
    np.testing.assert_allclose(np.asarray(pal.simulate(c2)),
                               np.asarray(ref.simulate(c2)),
                               rtol=1e-12, atol=1e-13)


def test_multistep_forward_interp_receivers():
    ref = _big_problem("stencil", interp_receivers=True)
    pal = _big_problem("pallas", interp_receivers=True)
    c2 = _c2(ref, seed=6)
    np.testing.assert_allclose(np.asarray(pal.simulate(c2)),
                               np.asarray(ref.simulate(c2)),
                               rtol=1e-12, atol=1e-13)


def test_multistep_gradient_matches_stencil_reversal():
    ref = _big_problem("stencil")
    pal = _big_problem("pallas")
    c2_true = _c2(ref, seed=7)
    obs = ref.simulate(c2_true)
    c2_init = jnp.ones(ref.n_cells)
    v_ref, g_ref = jax.value_and_grad(ref.misfit)(c2_init, obs)
    v_pal, g_pal = jax.value_and_grad(pal.misfit)(c2_init, obs)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-9, atol=1e-14)


def test_multistep_gradient_interp_receivers():
    """Interp receivers spread each cotangent over 3 vertices — exercises
    the multistep adjoint's pre-weighted point-injection layout."""
    ref = _big_problem("stencil", interp_receivers=True)
    pal = _big_problem("pallas", interp_receivers=True)
    c2_true = _c2(ref, seed=8)
    obs = ref.simulate(c2_true)
    c2_init = jnp.ones(ref.n_cells)
    g_ref = jax.grad(ref.misfit)(c2_init, obs)
    g_pal = jax.grad(pal.misfit)(c2_init, obs)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-9, atol=1e-14)


def test_multistep_wavelet_cotangent_matches():
    """Pins the multistep adjoint's per-inner-step wavbar SMEM output
    (chunk ordering + head/tail stitching) against the stencil engine."""
    ref = _big_problem("stencil")
    pal = _big_problem("pallas")
    c2 = _c2(ref, seed=9)
    obs = ref.simulate(1.1 * c2)

    def wav_grad(p):
        return jax.grad(lambda w: p.misfit(c2, obs, wavelet=w))(p.wavelet)

    np.testing.assert_allclose(np.asarray(wav_grad(pal)),
                               np.asarray(wav_grad(ref)),
                               rtol=1e-9, atol=1e-14)


def test_multistep_multishot_vmap():
    """vmapped shots through the multistep kernels (traced src in SMEM)."""
    ref = _big_problem("stencil")
    pal = _big_problem("pallas")
    srcs = pal.snap_vertices([(0.3, 0.5), (0.7, 0.4)])
    c2 = _c2(ref, seed=11)
    obs = ref.simulate_shots(1.1 * c2, srcs)
    np.testing.assert_allclose(np.asarray(pal.simulate_shots(1.1 * c2,
                                                             srcs)),
                               np.asarray(obs), rtol=1e-12, atol=1e-13)
    g_ref = jax.grad(lambda c: ref.misfit_shots(c, srcs, obs))(c2)
    g_pal = jax.grad(lambda c: pal.misfit_shots(c, srcs, obs))(c2)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-9, atol=1e-14)


def test_multistep_multishot_vmap_sponge():
    """vmapped shots through the DAMPED multistep kernels with ring
    boundary saving (per-shot ring saves under vmap)."""
    kw = dict(sponge_width=0.2, sponge_strength=20.0,
              boundary_save="ring")
    ref = _big_problem("stencil", **kw)
    pal = _big_problem("pallas", **kw)
    assert pal._pallas_layout["k"] > 1
    srcs = pal.snap_vertices([(0.3, 0.5), (0.7, 0.45)])
    c2 = _c2(ref, seed=12)
    obs = ref.simulate_shots(1.1 * c2, srcs)
    np.testing.assert_allclose(np.asarray(pal.simulate_shots(1.1 * c2,
                                                             srcs)),
                               np.asarray(obs), rtol=1e-12, atol=1e-13)
    g_ref = jax.grad(lambda c: ref.misfit_shots(c, srcs, obs))(c2)
    g_pal = jax.grad(lambda c: pal.misfit_shots(c, srcs, obs))(c2)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-9, atol=1e-14)


def test_multistep_gradient_exact_chunking():
    """steps such that (n_steps-1) % k == 0: no single-step head scan."""
    ref = _big_problem("stencil", steps=17)   # m = 16 = 2 chunks of 8
    pal = _big_problem("pallas", steps=17)
    c2_true = _c2(ref, seed=10)
    obs = ref.simulate(c2_true)
    c2_init = jnp.ones(ref.n_cells)
    g_ref = jax.grad(ref.misfit)(c2_init, obs)
    g_pal = jax.grad(pal.misfit)(c2_init, obs)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-9, atol=1e-14)
