"""2-D block DoF partition (parallel/dofs2d.py; 8-device virtual mesh).

The 2-D generalisation of the 1-D y-band engine: blocks cut at global
centroid quantiles, ghost exchange over the 8-neighbor block graph.
Closes the round-2 review's "1-D y-bands only" limitation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuwave.models.general import UnstructuredDiscretization
from tpuwave.parallel.dofs2d import (ShardedDofOperator2D,
                                     build_dof_plan_2d)
from tpuwave.parallel.sharding import device_mesh
from tpuwave.utils.params import load_params

from tests.test_schemes import standing_mode
from tests.test_unstructured import perturbed_mesh


def _plan_for(d, um, shape):
    cen = um.vertex_coords[um.cells].mean(axis=1)
    return build_dof_plan_2d(d.space.cell_dofs, d.n_dofs, cen,
                             d.space.dof_coords, shape)


@pytest.mark.parametrize("r,shape", [("1", (2, 4)), ("2", (4, 2)),
                                     ("1", (2, 2))])
def test_sharded_dof2d_operator_matches(r, shape):
    """2-D block operator == replicated MatrixFreeOperator (apply /
    diagonal+pad / row_sums / abs_row_sums / axpy), P1 and P2, portrait
    and landscape block grids."""
    um = perturbed_mesh(9, seed=11)
    p = load_params(standing_mode(R=r))
    d = UnstructuredDiscretization(p, mesh=um)
    plan = _plan_for(d, um, shape)
    mesh = device_mesh(shape[0] * shape[1])
    sm = ShardedDofOperator2D.from_operator(d.mass, plan, mesh)
    sk = ShardedDofOperator2D.from_operator(d.stiffness, plan, mesh)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(d.n_dofs))
    vb = plan.to_banded(v)
    np.testing.assert_allclose(np.asarray(plan.from_banded(sm(vb))),
                               np.asarray(d.mass(v)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(plan.from_banded(sk(vb))),
                               np.asarray(d.stiffness(v)), atol=1e-12)
    pad = np.asarray(plan.pad_mask)
    assert np.all(np.asarray(sm(vb))[pad] == 0.0)
    dg = np.asarray(sk.diagonal())
    np.testing.assert_allclose(np.asarray(plan.from_banded(sk.diagonal())),
                               np.asarray(d.stiffness.diagonal()),
                               atol=1e-12)
    assert np.all(dg[pad] == 1.0)
    np.testing.assert_allclose(np.asarray(plan.from_banded(sm.row_sums())),
                               np.asarray(d.mass.row_sums()), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(plan.from_banded(sk.abs_row_sums())),
        np.asarray(d.stiffness.abs_row_sums()), atol=1e-12)
    combo = sm.axpy(0.37, sk)
    np.testing.assert_allclose(
        np.asarray(plan.from_banded(combo(vb))),
        np.asarray(d.mass(v) + 0.37 * d.stiffness(v)), atol=1e-12)


def test_plan2d_rejects_blocks_thinner_than_cells():
    um = perturbed_mesh(3, seed=1)   # 3x3 cells cannot feed an 8x8 grid
    p = load_params(standing_mode())
    d = UnstructuredDiscretization(p, mesh=um)
    with pytest.raises(ValueError, match="neighborhood"):
        _plan_for(d, um, (8, 8))


def test_wide_flat_mesh_2d_where_1d_fails():
    """The motivating case: a wide-and-short mesh where 8 y-bands are
    thinner than one cell (1-D engine refuses) runs on a 2x4 block
    grid."""
    from tpuwave.core.mesh import StructuredTriMesh
    from tpuwave.core.unstructured import UnstructuredTriMesh
    from tpuwave.parallel.dofs import build_dof_plan

    m = StructuredTriMesh((24, 4), ((0.0, 0.0), (6.0, 1.0)))
    um = UnstructuredTriMesh(np.asarray(m.vertex_coords),
                             np.asarray(m.cells))
    p = load_params(standing_mode(Nel="24,4",
                                  Geometry="[0,6]x[0,1]"))
    d = UnstructuredDiscretization(p, mesh=um)
    cy = um.vertex_coords[um.cells].mean(axis=1)[:, 1]
    with pytest.raises(ValueError):
        build_dof_plan(d.space.cell_dofs, d.n_dofs, cy, 8)
    plan = _plan_for(d, um, (2, 4))
    mesh = device_mesh(8)
    sm = ShardedDofOperator2D.from_operator(d.mass, plan, mesh)
    v = jnp.asarray(np.random.default_rng(1).standard_normal(d.n_dofs))
    np.testing.assert_allclose(
        np.asarray(plan.from_banded(sm(plan.to_banded(v)))),
        np.asarray(d.mass(v)), atol=1e-12)


@pytest.mark.parametrize("family", ["theta", "newmark"])
def test_dof2d_sharded_solver_matches_replicated(family):
    """Full scheme trajectories on the 2-D-partitioned engine equal the
    replicated unstructured engine (incl. diagnostics)."""
    from tpuwave.models.newmark import NewmarkSolver
    from tpuwave.models.theta import ThetaSolver

    um = perturbed_mesh(9, seed=7)
    p = load_params(standing_mode())
    ref = UnstructuredDiscretization(p, mesh=um)
    shd = UnstructuredDiscretization(p, mesh=um,
                                     device_mesh=device_mesh(8),
                                     dof_sharded=True, dof_partition="2d")
    cls = ThetaSolver if family == "theta" else NewmarkSolver
    sref, sshd = cls(ref), cls(shd)
    st_r, st_s = sref.initial_state(), sshd.initial_state()
    plan = shd.dof_plan
    np.testing.assert_allclose(np.asarray(plan.from_banded(st_s.u)),
                               np.asarray(st_r.u), atol=1e-12)
    t = 0.0
    for _ in range(3):
        t += p.dt
        st_r, _ = sref.step(st_r, t)
        st_s, _ = sshd.step(st_s, t)
    np.testing.assert_allclose(np.asarray(plan.from_banded(st_s.u)),
                               np.asarray(st_r.u), atol=1e-9)
    e_r = float(ref.energy(st_r.u, st_r.v))
    e_s = float(shd.energy(st_s.u, st_s.v))
    assert abs(e_r - e_s) < 1e-9 * abs(e_r)
    assert abs(float(ref.probe(st_r.u))
               - float(shd.probe(st_s.u))) < 1e-9


def test_dof2d_tdep_payload_roundtrip():
    """Time Dependent C on the 2-D engine: stiffness_from_payload
    rebuilds the SAME operator class and matches the replicated K(t)."""
    um = perturbed_mesh(8, seed=3)
    case = standing_mode(
        **{"Time Dependent C": "true",
           "C": {"Function expression": "1 + 0.3*x*sin(t)",
                 "Variable names": "x, y, t"}})
    p = load_params(case)
    ref = UnstructuredDiscretization(p, mesh=um)
    shd = UnstructuredDiscretization(p, mesh=um,
                                     device_mesh=device_mesh(8),
                                     dof_sharded=True, dof_partition="2d")
    k_ref = ref.stiffness_at(0.6)
    k_shd = shd.stiffness_from_payload(shd.stiffness_payload_at(0.6))
    assert isinstance(k_shd, ShardedDofOperator2D)
    v = jnp.asarray(np.random.default_rng(2).standard_normal(ref.n_dofs))
    np.testing.assert_allclose(
        np.asarray(shd.dof_plan.from_banded(k_shd(
            shd.dof_plan.to_banded(v)))),
        np.asarray(k_ref(v)), atol=1e-12)
