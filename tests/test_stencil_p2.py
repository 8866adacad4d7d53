"""P2 plane-stencil operator == flat element operator (interior rows)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuwave.core.mesh import FeSpace, StructuredTriMesh
from tpuwave.core.quadrature import gauss_simplex
from tpuwave.ops.assembly import element_mass_class, element_stiffness_class
from tpuwave.ops.operators import MatrixFreeOperator
from tpuwave.ops.stencil_p2 import (P2PlaneStencil, flat_to_planes,
                                    planes_to_flat, p2_plane_shapes)


def build(nx, ny, geom=((0.0, 0.0), (1.0, 1.0)), c2=1.0):
    m = StructuredTriMesh((nx, ny), geom)
    sp = FeSpace(m, 2)
    quad = gauss_simplex(3)
    m_class = element_mass_class(sp, quad)
    k_class = element_stiffness_class(sp, quad, c2)
    return m, sp, m_class, k_class


def test_flat_planes_roundtrip():
    nx, ny = 5, 3
    n = sum(r * c for r, c in p2_plane_shapes(nx, ny).values())
    x = jnp.arange(n, dtype=jnp.float64)
    planes = flat_to_planes(x, nx, ny)
    np.testing.assert_array_equal(np.asarray(planes_to_flat(planes)),
                                  np.asarray(x))


@pytest.mark.parametrize("which", ["mass", "stiffness"])
@pytest.mark.parametrize("nx,ny", [(4, 3), (7, 6)])
def test_p2_stencil_matches_flat_interior(which, nx, ny):
    m, sp, m_class, k_class = build(nx, ny, geom=((0.0, 0.0), (1.3, 1.0)),
                                    c2=1.7)
    a_class = m_class if which == "mass" else k_class
    flat_op = MatrixFreeOperator(sp.cell_dofs, sp.n_dofs, a_class=a_class)
    sten_op = P2PlaneStencil(sp, a_class, jnp.float64)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=sp.n_dofs))
    got = np.asarray(sten_op(x))
    want = np.asarray(flat_op(x))
    interior = ~sp.boundary_mask
    np.testing.assert_allclose(got[interior], want[interior],
                               rtol=1e-12, atol=1e-12)


def test_p2_stencil_diagonal_interior():
    m, sp, m_class, k_class = build(6, 5)
    flat_op = MatrixFreeOperator(sp.cell_dofs, sp.n_dofs, a_class=k_class)
    sten_op = P2PlaneStencil(sp, k_class, jnp.float64)
    interior = ~sp.boundary_mask
    np.testing.assert_allclose(np.asarray(sten_op.diagonal())[interior],
                               np.asarray(flat_op.diagonal())[interior],
                               rtol=1e-12)


def test_p2_stencil_axpy():
    m, sp, m_class, k_class = build(4, 4)
    mop = P2PlaneStencil(sp, m_class, jnp.float64)
    kop = P2PlaneStencil(sp, k_class, jnp.float64)
    combo = mop.axpy(0.37, kop)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=sp.n_dofs))
    np.testing.assert_allclose(np.asarray(combo(x)),
                               np.asarray(mop(x) + 0.37 * kop(x)),
                               rtol=1e-12, atol=1e-12)
