"""Mesh + FE space: counts, connectivity, boundary masks, point location."""

import numpy as np
import pytest

from tpuwave.core.mesh import FeSpace, StructuredTriMesh
from tpuwave.core.quadrature import gauss_simplex
from tpuwave.core.shape import simplex_shape


def make(nx=4, ny=3, geom=((0.0, 0.0), (2.0, 1.5))):
    return StructuredTriMesh((nx, ny), geom)


def test_counts():
    m = make()
    assert m.n_vertices == 5 * 4
    assert m.n_cells == 2 * 4 * 3
    assert m.n_edges == 4 * 4 + 5 * 3 + 4 * 3
    assert m.hx == pytest.approx(0.5)
    assert m.hy == pytest.approx(0.5)
    assert m.det_j == pytest.approx(0.25)


def test_cell_areas_cover_domain():
    m = make()
    v = m.vertex_coords[m.cells]  # (E, 3, 2)
    areas = 0.5 * np.abs(
        (v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
        - (v[:, 2, 0] - v[:, 0, 0]) * (v[:, 1, 1] - v[:, 0, 1]))
    assert areas.sum() == pytest.approx(2.0 * 1.5)
    assert np.allclose(areas, m.det_j / 2)


def test_orientation_positive():
    m = make()
    v = m.vertex_coords[m.cells]
    signed = ((v[:, 1, 0] - v[:, 0, 0]) * (v[:, 2, 1] - v[:, 0, 1])
              - (v[:, 2, 0] - v[:, 0, 0]) * (v[:, 1, 1] - v[:, 0, 1]))
    assert (signed > 0).all()


def test_jacobians_match_vertices():
    m = make()
    v = m.vertex_coords[m.cells].reshape(-1, 2, 3, 2)  # (grid, class, 3, 2)
    for k in range(2):
        j_cols = np.stack([v[:, k, 1] - v[:, k, 0], v[:, k, 2] - v[:, k, 0]],
                          axis=-1)  # (grid, 2, 2)
        assert np.allclose(j_cols, m.jacobians[k])


def test_boundary_vertex_mask():
    m = make()
    mask = m.boundary_vertex_mask
    coords = m.vertex_coords
    on_b = ((coords[:, 0] == 0) | (coords[:, 0] == 2.0)
            | (coords[:, 1] == 0) | (coords[:, 1] == 1.5))
    assert (mask == on_b).all()


@pytest.mark.parametrize("r,expected", [(1, 21 * 21), (2, 41 * 41)])
def test_dof_counts_square(r, expected):
    # reference: P1 -> (N+1)^2, P2 -> (2N+1)^2 for square grids
    m = StructuredTriMesh((20, 20), ((0.0, 0.0), (1.0, 1.0)))
    sp = FeSpace(m, r)
    assert sp.n_dofs == expected


def test_p2_connectivity_consistent():
    m = make(3, 2)
    sp = FeSpace(m, 2)
    cd = sp.cell_dofs
    assert cd.shape == (m.n_cells, 6)
    coords = sp.dof_coords
    # edge midpoints must be midpoints of their vertex pair per local ordering
    from tpuwave.core.shape import P2_EDGES
    for e in range(m.n_cells):
        for loc, (i, j) in enumerate(P2_EDGES):
            mid = 0.5 * (coords[cd[e, i]] + coords[cd[e, j]])
            assert np.allclose(coords[cd[e, 3 + loc]], mid), (e, loc)


def test_p2_boundary_mask():
    m = make(3, 2)
    sp = FeSpace(m, 2)
    coords = sp.dof_coords
    (x0, y0), (x1, y1) = m.geometry
    on_b = ((coords[:, 0] == x0) | (coords[:, 0] == x1)
            | (coords[:, 1] == y0) | (coords[:, 1] == y1))
    assert (sp.boundary_mask == on_b).all()


def test_locate_point():
    m = make()
    for p in [(0.1, 0.1), (0.4, 0.45), (1.99, 1.49), (1.0, 0.75), (0.0, 0.0)]:
        cell, (xi, eta) = m.locate_point(p)
        assert 0 <= cell < m.n_cells
        assert xi >= -1e-12 and eta >= -1e-12 and xi + eta <= 1 + 1e-12
        # map back to physical coordinates
        v0 = m.vertex_coords[m.cells[cell, 0]]
        J = m.jacobians[cell % 2]
        back = v0 + J @ np.array([xi, eta])
        assert np.allclose(back, p)


def test_shape_partition_of_unity():
    pts = np.array([[0.2, 0.3], [0.0, 0.0], [0.5, 0.5], [1 / 3, 1 / 3]])
    for r in (1, 2):
        sh = simplex_shape(r, pts)
        assert np.allclose(sh.values.sum(axis=1), 1.0)
        assert np.allclose(sh.grads.sum(axis=1), 0.0)


def test_shape_kronecker_at_nodes():
    nodes1 = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    sh = simplex_shape(1, nodes1)
    assert np.allclose(sh.values, np.eye(3))
    nodes2 = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0],
                       [0.5, 0.0], [0.5, 0.5], [0.0, 0.5]])
    sh2 = simplex_shape(2, nodes2)
    assert np.allclose(sh2.values, np.eye(6), atol=1e-14)
