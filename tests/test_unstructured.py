"""Unstructured mesh import: readers, geometry, operator parity with the
structured path, end-to-end runs, and convergence on perturbed meshes.

Exercises the activated ``Mesh File Name`` parameter (reference
ParameterReader.cpp:51-54, declared there but never consumed)."""

import numpy as np
import pytest

from tpuwave.core.mesh import StructuredTriMesh
from tpuwave.core.unstructured import (UnstructuredFeSpace, UnstructuredTriMesh,
                                       read_mesh_file, write_msh)
from tpuwave.models.discretization import Discretization
from tpuwave.models.general import UnstructuredDiscretization, make_discretization
from tpuwave.utils.params import ParamError, load_params

from tests.test_schemes import standing_mode


def perturbed_mesh(nel, seed=0, amp=0.25):
    """Structured rectangle with interior vertices randomly displaced by
    up to ``amp * h`` — a genuinely non-uniform but valid mesh."""
    m = StructuredTriMesh((nel, nel), ((0.0, 0.0), (1.0, 1.0)))
    pts = m.vertex_coords.copy()
    rng = np.random.default_rng(seed)
    interior = ~m.boundary_vertex_mask
    pts[interior] += (rng.uniform(-amp, amp, (interior.sum(), 2))
                      * np.array([m.hx, m.hy]))
    return UnstructuredTriMesh(pts, m.cells)


# ---------------------------------------------------------------------------
# readers / writer
# ---------------------------------------------------------------------------

def test_msh22_roundtrip(tmp_path):
    m = StructuredTriMesh((5, 4), ((0.0, -1.0), (2.0, 1.0)))
    path = write_msh(tmp_path / "m.msh", m.vertex_coords, m.cells)
    rt = read_mesh_file(path)
    np.testing.assert_allclose(rt.vertex_coords, m.vertex_coords, atol=0)
    assert np.array_equal(rt.cells, m.cells)


def test_msh41_parse(tmp_path):
    # one entity block, unit square split into two triangles
    text = """$MeshFormat
4.1 0 8
$EndMeshFormat
$Nodes
1 4 1 4
2 1 0 4
1
2
3
4
0 0 0
1 0 0
1 1 0
0 1 0
$EndNodes
$Elements
1 2 1 2
2 1 2 2
1 1 2 3
2 1 3 4
$EndElements
"""
    path = tmp_path / "m4.msh"
    path.write_text(text)
    m = read_mesh_file(path)
    assert m.n_vertices == 4 and m.n_cells == 2
    np.testing.assert_allclose(m.det_j, [1.0, 1.0])


def test_legacy_vtk_parse(tmp_path):
    from tpuwave.utils.vtu import write_mesh_vtk
    m = StructuredTriMesh((3, 3), ((0.0, 0.0), (1.0, 1.0)))
    path = write_mesh_vtk(tmp_path / "m.vtk", m.vertex_coords, m.cells)
    rt = read_mesh_file(path)
    np.testing.assert_allclose(rt.vertex_coords, m.vertex_coords, atol=1e-12)
    assert np.array_equal(rt.cells, m.cells)


def test_unreadable_mesh_errors(tmp_path):
    bad = tmp_path / "bad.msh"
    bad.write_text("not a mesh")
    with pytest.raises(ValueError):
        read_mesh_file(bad)
    with pytest.raises(FileNotFoundError):
        read_mesh_file(tmp_path / "missing.msh")
    # binary .msh: friendly ValueError, not a UnicodeDecodeError
    binmsh = tmp_path / "bin.msh"
    binmsh.write_bytes(b"$MeshFormat\n4.1 1 8\n" + bytes(range(256)))
    with pytest.raises(ValueError, match="binary"):
        read_mesh_file(binmsh)


def test_non_planar_mesh_rejected(tmp_path):
    """A Gmsh surface mesh off z = 0 must not silently flatten."""
    text = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
3
1 0 0 0
2 1 0 0.5
3 0 1 0
$EndNodes
$Elements
1
1 2 2 0 1 1 2 3
$EndElements
"""
    path = tmp_path / "warped.msh"
    path.write_text(text)
    with pytest.raises(ValueError, match="planar"):
        read_mesh_file(path)


def test_params_mesh_file_resolution(tmp_path):
    m = StructuredTriMesh((4, 4), ((0.0, 0.0), (1.0, 1.0)))
    write_msh(tmp_path / "sq.msh", m.vertex_coords, m.cells)
    case = standing_mode(**{"Mesh File Name": "sq.msh"})
    import json
    pf = tmp_path / "case.json"
    pf.write_text(json.dumps(case))
    p = load_params(pf)       # resolves relative to the param file dir
    assert p.mesh_file.endswith("sq.msh")
    with pytest.raises(ParamError):
        load_params(standing_mode(**{"Mesh File Name": "nope.msh"}))
    # absent key -> structured path
    assert load_params(standing_mode()).mesh_file is None


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def test_orientation_fix_and_degenerate_rejection():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    cells_in = np.array([[0, 2, 1]], dtype=np.int32)     # clockwise input
    m = UnstructuredTriMesh(pts, cells_in)
    assert m.det_j[0] > 0
    # the orientation fix must not write through to the caller's array
    assert np.array_equal(cells_in, [[0, 2, 1]])
    with pytest.raises(ValueError):
        UnstructuredTriMesh(np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]]),
                            np.array([[0, 1, 2]]))


def test_boundary_and_edges_match_structured():
    m = StructuredTriMesh((6, 5), ((0.0, 0.0), (1.0, 1.0)))
    um = UnstructuredTriMesh(m.vertex_coords, m.cells)
    assert np.array_equal(um.boundary_vertex_mask, m.boundary_vertex_mask)
    assert um.n_edges == m.n_edges
    assert um.boundary_edge_mask.sum() == m.boundary_edge_mask.sum()
    # every cell edge id consistent with its vertex pair
    e = um.edges[um.cell_edges]                  # (C, 3, 2)
    c = um.cells
    pairs = np.sort(np.stack([c[:, [0, 1]], c[:, [1, 2]], c[:, [2, 0]]],
                             axis=1), axis=2)
    assert np.array_equal(np.sort(e, axis=2), pairs)


def test_locate_point_perturbed():
    um = perturbed_mesh(8, seed=3)
    sp = UnstructuredFeSpace(um, 1)
    rng = np.random.default_rng(0)
    for p in rng.uniform(0.05, 0.95, (10, 2)):
        cell, (xi, eta) = um.locate_point(p)
        assert -1e-9 <= xi and -1e-9 <= eta and xi + eta <= 1 + 1e-9
        # reconstruct the physical point from the reference coords
        v = um.vertex_coords[um.cells[cell]]
        rec = v[0] + xi * (v[1] - v[0]) + eta * (v[2] - v[0])
        np.testing.assert_allclose(rec, p, atol=1e-12)


# ---------------------------------------------------------------------------
# operator parity with the structured discretisation
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("r", [1, 2])
def test_operator_parity_structured_equivalent(r):
    case = standing_mode(Nel="4,3", R=str(r))
    p = load_params(case)
    d_s = Discretization(p)
    m = StructuredTriMesh(p.nel, p.geometry)
    d_u = UnstructuredDiscretization(
        p, mesh=UnstructuredTriMesh(m.vertex_coords, m.cells))
    # DoF numbering differs (P2 edge order); match by support coordinates
    cs = np.asarray(d_s.dof_coords)
    cu = np.asarray(d_u.dof_coords)
    os_ = np.lexsort((cs[:, 0], cs[:, 1]))
    ou = np.lexsort((cu[:, 0], cu[:, 1]))
    np.testing.assert_allclose(cs[os_], cu[ou], atol=1e-14)
    np.testing.assert_array_equal(np.asarray(d_s.boundary_mask)[os_],
                                  np.asarray(d_u.boundary_mask)[ou])
    for a, b in ((d_s.mass, d_u.mass), (d_s.stiffness, d_u.stiffness)):
        np.testing.assert_allclose(a.to_dense()[np.ix_(os_, os_)],
                                   b.to_dense()[np.ix_(ou, ou)], atol=1e-12)
    # diagnostics agree on the same FE function (nodal values of a smooth
    # field on each numbering's own support points)
    import jax.numpy as jnp
    def f(c):
        return jnp.asarray(np.sin(3.0 * c[:, 0]) * np.cos(2.0 * c[:, 1]))
    e_s = float(d_s.energy(f(cs), f(cs)))
    e_u = float(d_u.energy(f(cu), f(cu)))
    assert abs(e_s - e_u) < 1e-10 * abs(e_s)


def test_mass_matrix_exactness_perturbed():
    """Sum of all mass entries = domain area; stiffness annihilates
    constants — on a genuinely perturbed mesh."""
    um = perturbed_mesh(6, seed=1)
    case = standing_mode(R="2")
    p = load_params(case)
    d = UnstructuredDiscretization(p, mesh=um)
    M = d.mass.to_dense()
    np.testing.assert_allclose(M.sum(), 1.0, rtol=1e-12)
    K = d.stiffness.to_dense()
    np.testing.assert_allclose(K @ np.ones(K.shape[0]), 0.0, atol=1e-10)
    # linear function is in the P2 space: K @ x-coords gives boundary flux
    # only; interior rows must vanish
    x = np.asarray(d.dof_coords)[:, 0]
    res = K @ x
    interior = ~np.asarray(d.boundary_mask)
    np.testing.assert_allclose(res[interior], 0.0, atol=1e-10)


# ---------------------------------------------------------------------------
# end-to-end
# ---------------------------------------------------------------------------

def test_end_to_end_import_matches_structured(tmp_path):
    from tpuwave import api
    from tpuwave.models.runner import RunConfig
    m = StructuredTriMesh((10, 10), ((0.0, 0.0), (1.0, 1.0)))
    msh = write_msh(tmp_path / "sq10.msh", m.vertex_coords, m.cells)
    base = standing_mode(Nel="10", T="0.05", **{"Save Solution": "false"})
    cfg = RunConfig(quiet=True, write_mesh=False,
                    results_root=str(tmp_path / "res"))
    r_s = api.solve(dict(base), family="theta", config=cfg)
    r_u = api.solve(dict(base, **{"Mesh File Name": str(msh)}),
                    family="theta", config=cfg)
    # the import is recognised as the structured triangulation
    # (detect_structured) and renumbered onto the SAME structured engine,
    # so the trajectories are identical to the last digit
    assert abs(r_s.rel_l2 - r_u.rel_l2) <= 1e-14 * r_s.rel_l2
    assert abs(r_s.rel_h1 - r_u.rel_h1) <= 1e-14 * r_s.rel_h1


@pytest.mark.parametrize("family", ["theta", "newmark"])
def test_end_to_end_perturbed(tmp_path, family):
    from tpuwave import api
    from tpuwave.models.runner import RunConfig
    um = perturbed_mesh(12, seed=2)
    msh = write_msh(tmp_path / "p12.msh", um.vertex_coords, um.cells)
    base = standing_mode(T="0.05", **{"Mesh File Name": str(msh),
                                      "Save Solution": "false"})
    cfg = RunConfig(quiet=True, write_mesh=False,
                    results_root=str(tmp_path / "res"))
    r = api.solve(base, family=family, config=cfg)
    assert not r.diverged
    assert r.rel_l2 < 0.02      # standing mode, short horizon


def test_convergence_on_perturbed_meshes(tmp_path):
    """Spatial L2 order ~2 for P1 on a sequence of perturbed meshes
    (CN, dt scaled with h so temporal error stays subdominant)."""
    from tpuwave import api
    from tpuwave.models.runner import RunConfig
    errs, hs = [], []
    for nel in (8, 16, 32):
        um = perturbed_mesh(nel, seed=5, amp=0.2)
        msh = write_msh(tmp_path / f"p{nel}.msh", um.vertex_coords, um.cells)
        base = standing_mode(T="0.1", Dt=str(0.4 / nel),
                             **{"Mesh File Name": str(msh),
                                "Save Solution": "false"})
        cfg = RunConfig(quiet=True, write_mesh=False,
                        results_root=str(tmp_path / "res"))
        r = api.solve(base, family="theta", config=cfg)
        errs.append(r.rel_l2)
        hs.append(um.h_max)
    order = np.log(errs[0] / errs[2]) / np.log(hs[0] / hs[2])
    assert 1.6 < order < 2.6, (errs, hs, order)


def test_vtu_output_on_imported_mesh(tmp_path):
    """Save Solution works on an imported mesh (piece geometry = the
    imported triangulation)."""
    from tpuwave import api
    from tpuwave.models.runner import RunConfig
    um = perturbed_mesh(5, seed=7)
    msh = write_msh(tmp_path / "p5.msh", um.vertex_coords, um.cells)
    base = standing_mode(T="0.02", Dt="0.01",
                         **{"Mesh File Name": str(msh),
                            "Save Solution": "true"})
    cfg = RunConfig(quiet=True, write_mesh=False,
                    results_root=str(tmp_path / "res"))
    r = api.solve(base, family="theta", config=cfg)
    vtus = list(r.output_folder.glob("solution_*.pvtu"))
    assert len(vtus) == 3    # t=0 plus two steps


def test_make_discretization_factory():
    p = load_params(standing_mode())
    assert type(make_discretization(p)) is Discretization


# ---------------------------------------------------------------------------
# structured-grid detection (imported mesh -> stencil fast paths)
# ---------------------------------------------------------------------------

def test_detect_structured_roundtrip_and_renumbering():
    from tpuwave.core.unstructured import detect_structured
    m = StructuredTriMesh((7, 4), ((-1.0, 2.0), (3.0, 5.0)))
    um = UnstructuredTriMesh(m.vertex_coords, m.cells)
    assert detect_structured(um) == ((7, 4), ((-1.0, 2.0), (3.0, 5.0)))
    # arbitrary vertex/cell renumbering and local vertex rotation must
    # still match (detection is permutation-invariant)
    rng = np.random.default_rng(0)
    perm = rng.permutation(m.n_vertices)
    inv = np.argsort(perm)
    pts2 = m.vertex_coords[perm]
    cells2 = inv[m.cells][rng.permutation(m.n_cells)]
    cells2 = np.roll(cells2, 1, axis=1)
    um2 = UnstructuredTriMesh(pts2, cells2.astype(np.int32))
    assert detect_structured(um2) == ((7, 4), ((-1.0, 2.0), (3.0, 5.0)))


def test_detect_structured_rejections():
    from tpuwave.core.unstructured import detect_structured
    # perturbed interior vertices: not a lattice
    assert detect_structured(perturbed_mesh(6, seed=1)) is None
    # same lattice, squares split along the OTHER diagonal: different
    # triangulation (different stiffness), must not match
    nx = ny = 4
    m = StructuredTriMesh((nx, ny), ((0.0, 0.0), (1.0, 1.0)))
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="xy")
    ii, jj = ii.ravel(), jj.ravel()

    def vi(i, j):
        return j * (nx + 1) + i

    lower = np.stack([vi(ii, jj), vi(ii + 1, jj), vi(ii, jj + 1)], axis=-1)
    upper = np.stack([vi(ii + 1, jj), vi(ii + 1, jj + 1), vi(ii, jj + 1)],
                     axis=-1)
    flipped = np.concatenate([lower, upper]).astype(np.int32)
    assert detect_structured(
        UnstructuredTriMesh(m.vertex_coords, flipped)) is None
    # tensor grid with non-uniform x spacing: counts match, snap fails
    m3 = StructuredTriMesh((3, 3), ((0.0, 0.0), (1.0, 1.0)))
    pts = m3.vertex_coords.copy()
    col = np.rint(pts[:, 0] * 3).astype(int)
    pts[:, 0] = np.array([0.0, 0.1, 0.5, 1.0])[col]
    assert detect_structured(UnstructuredTriMesh(pts, m3.cells)) is None


def test_factory_routes_detected_structured(tmp_path):
    m = StructuredTriMesh((6, 5), ((0.0, 0.0), (3.0, 1.0)))
    msh = write_msh(tmp_path / "s.msh", m.vertex_coords, m.cells)
    # the param file's own Nel/Geometry are overridden by the detected mesh
    p = load_params(standing_mode(**{"Mesh File Name": str(msh)}))
    d = make_discretization(p)
    assert type(d) is Discretization
    assert d.mesh.nel == (6, 5)
    assert d.mesh.geometry == ((0.0, 0.0), (3.0, 1.0))
    assert d.params.nel == (6, 5)          # folder naming sees the real grid
    assert d.params.mesh_file is not None  # provenance preserved
    # a genuinely perturbed import keeps the general engine
    um = perturbed_mesh(5, seed=3)
    msh2 = write_msh(tmp_path / "p.msh", um.vertex_coords, um.cells)
    p2 = load_params(standing_mode(**{"Mesh File Name": str(msh2)}))
    assert type(make_discretization(p2)) is UnstructuredDiscretization


# ---------------------------------------------------------------------------
# cell-parallel sharding (8-device virtual CPU mesh from conftest)
# ---------------------------------------------------------------------------

def test_sharded_cell_operator_matches():
    import jax
    import jax.numpy as jnp
    from tpuwave.parallel.cells import ShardedCellOperator
    from tpuwave.parallel.sharding import device_mesh
    um = perturbed_mesh(7, seed=11)      # 98 cells: pads to 104 over 8 devs
    p = load_params(standing_mode(R="2"))
    d = UnstructuredDiscretization(p, mesh=um)
    mesh = device_mesh(8)
    sm = ShardedCellOperator.from_operator(d.mass, mesh)
    sk = ShardedCellOperator.from_operator(d.stiffness, mesh)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(d.n_dofs))
    np.testing.assert_allclose(np.asarray(sm(v)), np.asarray(d.mass(v)),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(sk.diagonal()),
                               np.asarray(d.stiffness.diagonal()), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sm.row_sums()),
                               np.asarray(d.mass.row_sums()), atol=1e-12)
    combo = sm.axpy(0.37, sk)
    ref = d.mass.axpy(0.37, d.stiffness)
    np.testing.assert_allclose(np.asarray(combo(v)), np.asarray(ref(v)),
                               atol=1e-12)
    # the apply must also work under jit (it runs inside the step program)
    np.testing.assert_allclose(np.asarray(jax.jit(combo)(v)),
                               np.asarray(ref(v)), atol=1e-12)


@pytest.mark.parametrize("family", ["theta", "newmark"])
def test_sharded_unstructured_trajectory(family):
    from tpuwave.models.newmark import NewmarkSolver
    from tpuwave.models.theta import ThetaSolver
    from tpuwave.parallel.sharding import device_mesh
    um = perturbed_mesh(10, seed=12)
    p = load_params(standing_mode(T="0.05"))
    mk = ThetaSolver if family == "theta" else NewmarkSolver
    s0 = mk(UnstructuredDiscretization(p, mesh=um))
    s1 = mk(UnstructuredDiscretization(p, mesh=um,
                                       device_mesh=device_mesh(8)))
    st0, st1 = s0.initial_state(), s1.initial_state()
    t = 0.0
    for _ in range(5):
        t += p.dt
        st0, _ = s0.step(st0, t)
        st1, _ = s1.step(st1, t)
    np.testing.assert_allclose(np.asarray(st1.u), np.asarray(st0.u),
                               atol=1e-10)


def test_sharded_tdep_c_supported():
    """Time Dependent C + sharded engines is supported since round 2
    (K(t) rebuilt SHARDED in-step); trajectory equivalence is covered by
    tests/test_tdep_c.py::test_tdep_unstructured_engines_match — here we
    just pin that construction succeeds and stiffness_at stays sharded."""
    from tpuwave.parallel.cells import ShardedCellOperator
    from tpuwave.parallel.sharding import device_mesh
    um = perturbed_mesh(5, seed=13)
    case = standing_mode(**{"Time Dependent C": "true",
                            "C": {"Function expression": "1 + 0.1*sin(t)",
                                  "Variable names": "x, y, t"}})
    d = UnstructuredDiscretization(load_params(case), mesh=um,
                                   device_mesh=device_mesh(8))
    assert isinstance(d.stiffness_at(0.2), ShardedCellOperator)


# ---------------------------------------------------------------------------
# DoF-partitioned sharding (parallel/dofs.py; 8-device virtual CPU mesh)
# ---------------------------------------------------------------------------

def test_sharded_dof_operator_matches():
    """Banded DoF-partitioned operator == replicated MatrixFreeOperator
    (apply / diagonal+pad / row_sums+pad / axpy), P1 and P2."""
    import jax.numpy as jnp
    from tpuwave.parallel.dofs import ShardedDofOperator, build_dof_plan
    from tpuwave.parallel.sharding import device_mesh
    for r in ("1", "2"):
        um = perturbed_mesh(9, seed=11)
        p = load_params(standing_mode(R=r))
        d = UnstructuredDiscretization(p, mesh=um)
        cy = um.vertex_coords[um.cells].mean(axis=1)[:, 1]
        plan = build_dof_plan(d.space.cell_dofs, d.n_dofs, cy, 8)
        mesh = device_mesh(8)
        sm = ShardedDofOperator.from_operator(d.mass, plan, mesh)
        sk = ShardedDofOperator.from_operator(d.stiffness, plan, mesh)
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.standard_normal(d.n_dofs))
        vb = plan.to_banded(v)
        np.testing.assert_allclose(np.asarray(plan.from_banded(sm(vb))),
                                   np.asarray(d.mass(v)), atol=1e-12)
        # padding rows are exactly zero (the stays-zero invariant)
        pad = np.asarray(plan.pad_mask)
        assert np.all(np.asarray(sm(vb))[pad] == 0.0)
        # diagonal()/row_sums() are the true values on real dofs, 1 on pads
        dg = np.asarray(sk.diagonal())
        np.testing.assert_allclose(
            np.asarray(plan.from_banded(sk.diagonal())),
            np.asarray(d.stiffness.diagonal()), atol=1e-12)
        assert np.all(dg[pad] == 1.0)
        np.testing.assert_allclose(
            np.asarray(plan.from_banded(sm.row_sums())),
            np.asarray(d.mass.row_sums()), atol=1e-12)
        combo = sm.axpy(0.37, sk)
        np.testing.assert_allclose(
            np.asarray(plan.from_banded(combo(vb))),
            np.asarray(d.mass(v) + 0.37 * d.stiffness(v)), atol=1e-12)


def test_dof_plan_rejects_too_many_bands():
    from tpuwave.parallel.dofs import build_dof_plan
    um = perturbed_mesh(3, seed=1)  # 3 cell rows cannot feed 8 bands
    sp = UnstructuredFeSpace(um, 1)
    cy = um.vertex_coords[um.cells].mean(axis=1)[:, 1]
    with pytest.raises(ValueError, match="neighbor-only"):
        build_dof_plan(sp.cell_dofs, sp.n_dofs, cy, 8)


@pytest.mark.parametrize("family", ["theta", "newmark"])
def test_dof_sharded_solver_matches_replicated(family):
    """Full scheme trajectories on the DoF-partitioned engine equal the
    replicated unstructured engine: forcing, time-dependent Dirichlet g,
    errors, energy, probe."""
    import jax.numpy as jnp
    from tpuwave.models.newmark import NewmarkSolver
    from tpuwave.models.theta import ThetaSolver
    from tpuwave.parallel.sharding import device_mesh

    um = perturbed_mesh(9, seed=7)
    p = load_params(standing_mode())
    ref = UnstructuredDiscretization(p, mesh=um)
    shd = UnstructuredDiscretization(p, mesh=um,
                                     device_mesh=device_mesh(8),
                                     dof_sharded=True)
    cls = ThetaSolver if family == "theta" else NewmarkSolver
    sref, sshd = cls(ref), cls(shd)
    st_r, st_s = sref.initial_state(), sshd.initial_state()
    plan = shd.dof_plan
    np.testing.assert_allclose(np.asarray(plan.from_banded(st_s.u)),
                               np.asarray(st_r.u), atol=1e-12)
    t = 0.0
    for _ in range(3):
        t += p.dt
        st_r, info_r = sref.step(st_r, t)
        st_s, info_s = sshd.step(st_s, t)
    np.testing.assert_allclose(np.asarray(plan.from_banded(st_s.u)),
                               np.asarray(st_r.u), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(plan.from_banded(st_s.v)),
                               np.asarray(st_r.v), rtol=1e-9, atol=1e-11)
    # diagnostics agree on the banded layout
    np.testing.assert_allclose(float(shd.energy(st_s.u, st_s.v)),
                               float(ref.energy(st_r.u, st_r.v)), rtol=1e-10)
    np.testing.assert_allclose(float(shd.probe(st_s.u)),
                               float(ref.probe(st_r.u)), rtol=1e-8,
                               atol=1e-12)
    er = ref.errors(st_r.u, t)
    es = shd.errors(st_s.u, t)
    np.testing.assert_allclose(np.asarray(es), np.asarray(er), rtol=1e-9)
    # vertex extraction (VTU path) returns mesh order
    np.testing.assert_allclose(np.asarray(shd.vertex_values(st_s.u)),
                               np.asarray(ref.vertex_values(st_r.u)),
                               rtol=1e-9, atol=1e-11)


def test_cli_unstructured_sharding_dofs(tmp_path):
    """End-to-end CLI run on an imported mesh with the DoF-partitioned
    engine (--unstructured-sharding dofs, 8-device virtual mesh): same
    final errors as the default single-device engine."""
    import json

    from tpuwave.cli import newmark as cli_newmark

    um = perturbed_mesh(10, seed=3, amp=0.15)
    msh = write_msh(tmp_path / "m10.msh", um.vertex_coords, um.cells)
    case = standing_mode(T="0.05", Dt="0.01",
                         **{"Mesh File Name": str(msh),
                            "Save Solution": "false", "Log Every": "5"})
    cfile = tmp_path / "case.json"
    cfile.write_text(json.dumps(case))

    def run(tag, *extra):
        code = cli_newmark.main([str(cfile), "--results-root",
                                 str(tmp_path / tag), "--mesh-root",
                                 str(tmp_path / "mesh"), "--quiet", *extra])
        assert code == 0
        runs = list((tmp_path / tag).glob("*/run-*"))
        assert len(runs) == 1
        err = (runs[0] / "error.csv").read_text().strip().splitlines()[-1]
        return [float(x) for x in err.split(",")[2:]]

    base = run("plain")
    dofs = run("dofs", "--unstructured-sharding", "dofs")
    np.testing.assert_allclose(dofs, base, rtol=1e-8)
