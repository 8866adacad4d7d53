"""Native C++ runtime: connectivity builders + binary VTU/VTK writers.

Skipped entirely when the toolchain can't produce the shared library."""

import struct

import numpy as np
import pytest

from tpuwave import native
from tpuwave.core.mesh import FeSpace, StructuredTriMesh

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _numpy_cells(nx, ny):
    """Reference (pure-numpy) connectivity, bypassing the native fast path."""
    m = StructuredTriMesh((nx, ny), ((0.0, 0.0), (1.0, 1.0)))
    # force the numpy branch regardless of size threshold
    ii, jj = np.meshgrid(np.arange(nx), np.arange(ny), indexing="xy")
    ii, jj = ii.ravel(), jj.ravel()
    v00 = m.vertex_index(ii, jj)
    v10 = m.vertex_index(ii + 1, jj)
    v11 = m.vertex_index(ii + 1, jj + 1)
    v01 = m.vertex_index(ii, jj + 1)
    lower = np.stack([v00, v10, v11], axis=-1)
    upper = np.stack([v00, v11, v01], axis=-1)
    return np.stack([lower, upper], axis=1).reshape(-1, 3).astype(np.int32)


@pytest.mark.parametrize("nx,ny", [(3, 2), (7, 7), (40, 13)])
def test_p1_cells_matches_numpy(nx, ny):
    got = native.p1_cells(nx, ny)
    np.testing.assert_array_equal(got, _numpy_cells(nx, ny))


@pytest.mark.parametrize("nx,ny", [(3, 2), (9, 4)])
def test_p2_cell_dofs_matches_numpy(nx, ny):
    m = StructuredTriMesh((nx, ny), ((0.0, 0.0), (1.0, 1.0)))
    sp = FeSpace(m, 2)
    want = sp.cell_dofs  # small mesh -> numpy branch
    got = native.p2_cell_dofs(nx, ny)
    np.testing.assert_array_equal(got, want)


def _parse_appended_vtu(path):
    """Minimal raw-appended VTU reader for round-trip checks."""
    raw = path.read_bytes()
    header, _, payload = raw.partition(b'<AppendedData encoding="raw">')
    payload = payload[payload.index(b"_") + 1:]
    import re
    arrays = {}
    for m in re.finditer(
            rb'<DataArray type="(\w+)" Name="([^"]+)" NumberOfComponents='
            rb'"(\d+)" format="appended" offset="(\d+)"/>', header):
        dtype = {b"Float64": np.float64, b"Int32": np.int32,
                 b"UInt8": np.uint8}[m.group(1)]
        off = int(m.group(4))
        (nbytes,) = struct.unpack_from("<Q", payload, off)
        data = np.frombuffer(payload, dtype=dtype, offset=off + 8,
                             count=nbytes // np.dtype(dtype).itemsize)
        arrays[m.group(2).decode()] = data
    return arrays


def test_native_vtu_roundtrip(tmp_path):
    m = StructuredTriMesh((4, 3), ((0.0, 0.0), (1.0, 1.0)))
    rng = np.random.default_rng(0)
    u = rng.normal(size=m.n_vertices)
    part = np.arange(m.n_cells, dtype=float)
    pts3 = np.concatenate([m.vertex_coords,
                           np.zeros((m.n_vertices, 1))], axis=1)
    path = tmp_path / "out.vtu"
    assert native.write_vtu_native(path, pts3, m.cells,
                                   {"u": u}, {"partitioning": part})
    arrays = _parse_appended_vtu(path)
    np.testing.assert_allclose(arrays["Points"].reshape(-1, 3), pts3)
    np.testing.assert_array_equal(arrays["connectivity"].reshape(-1, 3),
                                  m.cells)
    np.testing.assert_allclose(arrays["u"], u)
    np.testing.assert_allclose(arrays["partitioning"], part)
    assert (arrays["types"] == 5).all()
    np.testing.assert_array_equal(arrays["offsets"],
                                  3 * np.arange(1, m.n_cells + 1))


def test_native_mesh_vtk_matches_python(tmp_path):
    from tpuwave.utils.vtu import write_mesh_vtk
    m = StructuredTriMesh((3, 3), ((0.0, 0.0), (1.0, 1.0)))
    native_path = tmp_path / "native.vtk"
    assert native.write_mesh_vtk_native(native_path, m.vertex_coords, m.cells)
    import os
    os.environ["TPUWAVE_NO_NATIVE"] = "1"
    try:
        # force the python branch by monkeypatching availability
        import tpuwave.native as nat
        saved = nat._lib, nat._tried
        nat._lib, nat._tried = None, True
        py_path = write_mesh_vtk(tmp_path / "python.vtk",
                                 m.vertex_coords, m.cells)
        nat._lib, nat._tried = saved
    finally:
        del os.environ["TPUWAVE_NO_NATIVE"]
    assert native_path.read_text() == py_path.read_text()


def test_write_vtu_record_uses_native(tmp_path):
    from tpuwave.utils.vtu import write_vtu_record
    m = StructuredTriMesh((4, 4), ((0.0, 0.0), (1.0, 1.0)))
    u = np.ones(m.n_vertices)
    record = write_vtu_record(tmp_path, "solution", 3, m.vertex_coords,
                              m.cells, {"u": u}, {"partitioning":
                                                  np.zeros(m.n_cells)})
    assert record.name == "solution_0003.pvtu"
    piece = tmp_path / "solution_0003.0.vtu"
    assert piece.exists()
    # native writer output is raw-appended binary
    assert b'format="appended"' in piece.read_bytes()


def test_python_fallback_vtu(tmp_path):
    """The pure-Python (base64) VTU writer works when native is disabled."""
    import base64
    import struct as _struct
    import tpuwave.native as nat
    from tpuwave.utils.vtu import write_vtu_record

    m = StructuredTriMesh((3, 3), ((0.0, 0.0), (1.0, 1.0)))
    u = np.arange(m.n_vertices, dtype=float)
    saved = nat._lib, nat._tried
    nat._lib, nat._tried = None, True  # force fallback
    try:
        record = write_vtu_record(tmp_path, "solution", 0, m.vertex_coords,
                                  m.cells, {"u": u}, {})
    finally:
        nat._lib, nat._tried = saved
    piece = (tmp_path / "solution_0000.0.vtu").read_text()
    assert 'format="binary"' in piece
    # decode the u DataArray payload (base64 with u32 length prefix)
    import re
    blocks = re.findall(r'Name="u"[^>]*>\s*([A-Za-z0-9+/=]+)', piece)
    assert blocks
    raw = base64.b64decode(blocks[0])
    (nbytes,) = _struct.unpack_from("<I", raw, 0)
    vals = np.frombuffer(raw, dtype=np.float64, offset=4,
                         count=nbytes // 8)
    np.testing.assert_allclose(vals, u)
    assert record.name == "solution_0000.pvtu"


def test_multipiece_vtu_record(tmp_path):
    """cell_shard -> one piece per shard; union of pieces reconstructs the
    full mesh/fields and ``partitioning`` carries the real shard id."""
    from tpuwave.utils.vtu import write_vtu_record

    m = StructuredTriMesh((4, 8), ((0.0, 0.0), (1.0, 1.0)))
    rng = np.random.default_rng(1)
    u = rng.normal(size=m.n_vertices)
    # row blocks by centroid y over 4 shards (what the runner computes)
    cy = m.vertex_coords[m.cells, 1].mean(axis=1)
    shard = np.minimum((cy * 4).astype(np.int64), 3)

    record = write_vtu_record(tmp_path, "solution", 7, m.vertex_coords,
                              m.cells, {"u": u}, cell_shard=shard)
    pvtu = record.read_text()
    for pid in range(4):
        assert f'<Piece Source="solution_0007.{pid}.vtu"/>' in pvtu
    assert 'Name="partitioning"' in pvtu

    # reassemble: every global cell appears exactly once, with matching u
    # values at its (coordinate-identified) vertices and its shard id
    coord_to_gid = {tuple(np.round(xy, 12)): i
                    for i, xy in enumerate(m.vertex_coords)}
    seen = np.zeros(m.n_cells, dtype=int)
    want_key = {frozenset(c): i for i, c in enumerate(map(tuple, m.cells))}
    for pid in range(4):
        arrays = _parse_appended_vtu(tmp_path / f"solution_0007.{pid}.vtu")
        pts = arrays["Points"].reshape(-1, 3)[:, :2]
        gids = np.array([coord_to_gid[tuple(np.round(xy, 12))] for xy in pts])
        np.testing.assert_allclose(arrays["u"], u[gids])
        assert (arrays["partitioning"] == pid).all()
        for lc in arrays["connectivity"].reshape(-1, 3):
            gcell = frozenset(gids[lc])
            gi = want_key[gcell]
            assert shard[gi] == pid
            seen[gi] += 1
    assert (seen == 1).all()


def test_per_process_piece_writing(tmp_path):
    """Multi-host piece ownership: ``only_pieces`` writes just those piece
    files (the record still references all), ``write_record=False``
    suppresses the .pvtu — the union over "processes" equals a full write."""
    from tpuwave.utils.vtu import write_vtu_record

    m = StructuredTriMesh((4, 8), ((0.0, 0.0), (1.0, 1.0)))
    u = np.arange(m.n_vertices, dtype=np.float64)
    cy = m.vertex_coords[m.cells, 1].mean(axis=1)
    shard = np.minimum((cy * 4).astype(np.int64), 3)

    # "process 1": pieces {2, 3}, no record
    out = write_vtu_record(tmp_path, "solution", 1, m.vertex_coords,
                           m.cells, {"u": u}, cell_shard=shard,
                           only_pieces=frozenset({2, 3}), write_record=False)
    assert out is None
    assert not (tmp_path / "solution_0001.pvtu").exists()
    assert not (tmp_path / "solution_0001.0.vtu").exists()
    assert not (tmp_path / "solution_0001.1.vtu").exists()
    assert (tmp_path / "solution_0001.2.vtu").exists()
    assert (tmp_path / "solution_0001.3.vtu").exists()

    # "process 0": pieces {0, 1} + the record referencing all four
    record = write_vtu_record(tmp_path, "solution", 1, m.vertex_coords,
                              m.cells, {"u": u}, cell_shard=shard,
                              only_pieces=frozenset({0, 1}), write_record=True)
    pvtu = record.read_text()
    for pid in range(4):
        assert f'<Piece Source="solution_0001.{pid}.vtu"/>' in pvtu
        assert (tmp_path / f"solution_0001.{pid}.vtu").exists()

    # the union of the two partial writes is byte-identical to a full write
    full = tmp_path / "full"
    write_vtu_record(full, "solution", 1, m.vertex_coords, m.cells,
                     {"u": u}, cell_shard=shard)
    for pid in range(4):
        assert ((full / f"solution_0001.{pid}.vtu").read_bytes()
                == (tmp_path / f"solution_0001.{pid}.vtu").read_bytes())
    assert (full / "solution_0001.pvtu").read_bytes() == record.read_bytes()

    # single-piece path honors the same contract
    out = write_vtu_record(tmp_path, "single", 0, m.vertex_coords, m.cells,
                           {"u": u}, only_pieces=frozenset(),
                           write_record=False)
    assert out is None and not list(tmp_path.glob("single*"))
