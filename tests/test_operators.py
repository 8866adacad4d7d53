"""Operators: assembled M/K identities, matrix-free vs dense, BC elimination."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuwave.core.mesh import FeSpace, StructuredTriMesh
from tpuwave.core.quadrature import gauss_simplex
from tpuwave.ops.assembly import (element_mass_class, element_stiffness_class,
                                  element_stiffness_scaled)
from tpuwave.ops.operators import MatrixFreeOperator, constrain_system


def build(nx=5, ny=4, r=1, geom=((0.0, 0.0), (1.0, 1.0)), c2=1.0):
    m = StructuredTriMesh((nx, ny), geom)
    sp = FeSpace(m, r)
    quad = gauss_simplex(r + 1)
    mass = MatrixFreeOperator(sp.cell_dofs, sp.n_dofs,
                              a_class=element_mass_class(sp, quad))
    stiff = MatrixFreeOperator(sp.cell_dofs, sp.n_dofs,
                               a_class=element_stiffness_class(sp, quad, c2))
    return m, sp, mass, stiff


@pytest.mark.parametrize("r", [1, 2])
def test_mass_total(r):
    # 1^T M 1 = |Omega|
    m, sp, mass, stiff = build(r=r, geom=((0.0, 0.0), (2.0, 3.0)))
    one = jnp.ones(sp.n_dofs)
    assert float(one @ mass(one)) == pytest.approx(6.0, rel=1e-12)


@pytest.mark.parametrize("r", [1, 2])
def test_stiffness_annihilates_linears(r):
    m, sp, mass, stiff = build(r=r)
    coords = sp.dof_coords
    interior = ~sp.boundary_mask
    # constants are in the kernel everywhere; linears only away from dOmega
    out = np.asarray(stiff(jnp.ones(sp.n_dofs)))
    assert np.max(np.abs(out)) < 1e-12
    for vec in (coords[:, 0], coords[:, 1],
                2.0 * coords[:, 0] - 3.0 * coords[:, 1] + 1.0):
        out = np.asarray(stiff(jnp.asarray(vec)))
        assert np.max(np.abs(out[interior])) < 1e-12


@pytest.mark.parametrize("r", [1, 2])
def test_stiffness_energy_of_linear(r):
    # u = x  =>  u^T K u = int |grad u|^2 = |Omega| (c=1)
    m, sp, mass, stiff = build(r=r, geom=((0.0, 0.0), (2.0, 1.0)))
    u = jnp.asarray(sp.dof_coords[:, 0])
    assert float(u @ stiff(u)) == pytest.approx(2.0, rel=1e-12)


@pytest.mark.parametrize("r", [1, 2])
def test_dense_symmetry_and_spd(r):
    m, sp, mass, stiff = build(nx=3, ny=3, r=r)
    md = mass.to_dense()
    kd = stiff.to_dense()
    assert np.allclose(md, md.T)
    assert np.allclose(kd, kd.T)
    assert (np.linalg.eigvalsh(md) > 0).all()
    assert (np.linalg.eigvalsh(kd) > -1e-12).all()


@pytest.mark.parametrize("r", [1, 2])
def test_apply_matches_dense(r):
    m, sp, mass, stiff = build(nx=4, ny=3, r=r)
    rng = np.random.default_rng(1)
    v = rng.normal(size=sp.n_dofs)
    for op in (mass, stiff):
        dense = op.to_dense()
        np.testing.assert_allclose(np.asarray(op(jnp.asarray(v))), dense @ v,
                                   rtol=1e-12, atol=1e-13)


def test_diagonal_and_rowsums_match_dense():
    m, sp, mass, stiff = build(nx=4, ny=3, r=2)
    for op in (mass, stiff):
        dense = op.to_dense()
        np.testing.assert_allclose(np.asarray(op.diagonal()), np.diag(dense),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(op.row_sums()), dense.sum(axis=1),
                                   rtol=1e-12, atol=1e-12)


def test_lumped_mass_equals_area_partition():
    m, sp, mass, _ = build(nx=6, ny=6, r=1, geom=((0.0, 0.0), (1.0, 1.0)))
    lumped = np.asarray(mass.row_sums())
    assert lumped.sum() == pytest.approx(1.0, rel=1e-12)
    assert (lumped > 0).all()


def test_axpy_merged_matches_sum():
    m, sp, mass, stiff = build(nx=4, ny=3, r=1)
    combo = mass.axpy(0.37, stiff)
    assert combo.a_class is not None  # merged, single fused operator
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.normal(size=sp.n_dofs))
    np.testing.assert_allclose(np.asarray(combo(v)),
                               np.asarray(mass(v) + 0.37 * stiff(v)),
                               rtol=1e-12, atol=1e-13)


def test_variable_c_scaled_p1_matches_full_quadrature():
    """P1 stiffness with variable c^2: scaled-class storage == einsum of the
    full per-element quadrature contraction."""
    m = StructuredTriMesh((4, 3), ((0.0, 0.0), (1.0, 1.0)))
    sp = FeSpace(m, 1)
    quad = gauss_simplex(2)
    rng = np.random.default_rng(3)
    c2 = rng.uniform(0.5, 2.0, size=(m.n_cells, quad.n_points))
    scale, g_class = element_stiffness_scaled(sp, quad, c2)
    op = MatrixFreeOperator(sp.cell_dofs, sp.n_dofs, a_class=g_class, scale=scale)
    # direct per-element assembly
    grads = sp.physical_grads(sp.shape_at(quad))  # (2, Q, nloc, 2)
    c2_k = c2.reshape(-1, 2, quad.n_points)
    a_full = np.einsum("q,ekq,kqia,kqja->ekij", quad.weights, c2_k, grads, grads)
    a_full = (a_full * m.det_j).reshape(-1, 3, 3)
    op_full = MatrixFreeOperator(sp.cell_dofs, sp.n_dofs, a_full=a_full)
    v = jnp.asarray(rng.normal(size=sp.n_dofs))
    np.testing.assert_allclose(np.asarray(op(v)), np.asarray(op_full(v)),
                               rtol=1e-12, atol=1e-13)


def test_variable_c_p2_full():
    m = StructuredTriMesh((3, 3), ((0.0, 0.0), (1.0, 1.0)))
    sp = FeSpace(m, 2)
    quad = gauss_simplex(3)
    c2 = np.full((m.n_cells, quad.n_points), 2.25)  # constant c=1.5
    scale, a = element_stiffness_scaled(sp, quad, c2)
    assert scale is None
    op = MatrixFreeOperator(sp.cell_dofs, sp.n_dofs, a_full=a)
    ref = MatrixFreeOperator(sp.cell_dofs, sp.n_dofs,
                             a_class=element_stiffness_class(sp, quad, 2.25))
    rng = np.random.default_rng(4)
    v = jnp.asarray(rng.normal(size=sp.n_dofs))
    np.testing.assert_allclose(np.asarray(op(v)), np.asarray(ref(v)),
                               rtol=1e-12, atol=1e-12)


def test_constrain_system_matches_dense_elimination():
    """Matrix-free BC elimination == deal.II apply_boundary_values algebra."""
    m, sp, mass, stiff = build(nx=4, ny=4, r=1)
    a_op = mass.axpy(0.1, stiff)
    dense = a_op.to_dense()
    n = sp.n_dofs
    bnd = sp.boundary_mask
    rng = np.random.default_rng(5)
    rhs = rng.normal(size=n)
    g = rng.normal(size=n)  # arbitrary values; only boundary entries used
    x_prev = rng.normal(size=n)

    # dense emulation of MatrixTools::apply_boundary_values(eliminate=true)
    a_mod = dense.copy()
    rhs_mod = rhs.copy()
    x_mod = x_prev.copy()
    for j in np.flatnonzero(bnd):
        d_j = dense[j, j]
        # eliminate column from interior rows
        for i in range(n):
            if i != j:
                rhs_mod[i] -= a_mod[i, j] * g[j]
                a_mod[i, j] = 0.0
                a_mod[j, i] = 0.0
        a_mod[j, j] = d_j
        rhs_mod[j] = d_j * g[j]
        x_mod[j] = g[j]

    apply_c, rhs_c, x0 = constrain_system(
        a_op, a_op.diagonal(), jnp.asarray(bnd), jnp.asarray(g),
        jnp.asarray(rhs), jnp.asarray(x_prev))
    np.testing.assert_allclose(np.asarray(rhs_c), rhs_mod, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(x0), x_mod, rtol=1e-12)
    v = rng.normal(size=n)
    np.testing.assert_allclose(np.asarray(apply_c(jnp.asarray(v))), a_mod @ v,
                               rtol=1e-12, atol=1e-12)
