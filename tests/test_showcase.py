"""FWI showcase building blocks (scripts/fwi_showcase.py)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from fwi_showcase import cells_to_image, layered_model  # noqa: E402

from tpuwave.models.inverse import FwiProblem  # noqa: E402


def _problem(nel=24):
    return FwiProblem((nel, nel), ((0.0, 0.0), (1.0, 1.0)), 0.01, 8,
                      source=(0.5, 0.85), receivers=[(0.3, 0.85)])


def test_layered_model_structure():
    p = _problem()
    c2 = layered_model(p, np)
    assert c2.shape == (p.n_cells,)
    cent = p.mesh.vertex_coords[np.asarray(p.mesh.cells)].mean(axis=1)
    depth = 1.0 - cent[:, 1]
    # three layers in the un-faulted column (x < 0.55, away from the lens)
    col = (cent[:, 0] > 0.58) & (cent[:, 0] < 0.95)
    assert set(np.round(c2[col & (depth < 0.3)], 6)) == {1.0}
    assert np.all(c2[col & (depth > 0.9)] == 1.8)
    # the fault throws the deep interface: at depth just above 0.68+throw
    # the right side is still mid-layer while the left is deep
    band = (depth > 0.70) & (depth < 0.74)
    assert np.all(c2[band & (cent[:, 0] < 0.5)] == 1.8)
    assert np.all(c2[band & (cent[:, 0] > 0.6)] == 1.35)
    # lens is slower than its host layer
    lens = ((cent[:, 0] - 0.38) ** 2 / 0.14 ** 2
            + (depth - 0.52) ** 2 / 0.09 ** 2) < 0.5
    assert np.all(c2[lens] < 1.35)


def test_cells_to_image_roundtrip():
    p = _problem(nel=6)
    vals = np.arange(p.n_cells, dtype=float)
    img = cells_to_image(p, jnp.asarray(vals), np)
    assert img.shape == (6, 6)
    # bottom grid row (y smallest = deepest) lands at image row -1 ...
    # flipped: image row 0 is the surface (largest y)
    pair0 = vals[:2].mean()            # grid cell (row 0, col 0)
    assert img[-1, 0] == pair0
    pair_last = vals[-2:].mean()       # grid cell (row ny-1, col nx-1)
    assert img[0, -1] == pair_last


def test_imaging_showcase_reflectivity_model():
    """imaging_showcase's synthetic: a dipping reflector band + two point
    diffractors, zero elsewhere (scripts/imaging_showcase.py)."""
    from imaging_showcase import reflectivity_model

    p = _problem(nel=32)
    dm = reflectivity_model(p, np)
    assert dm.shape == (p.n_cells,)
    cent = p.mesh.vertex_coords[np.asarray(p.mesh.cells)].mean(axis=1)
    x, depth = cent[:, 0], 1.0 - cent[:, 1]
    # on the reflector line, mid-segment
    on = (np.abs(depth - (0.45 + 0.2 * (x - 0.2))) < 0.01) & \
         (x > 0.3) & (x < 0.6)
    assert on.any() and np.all(dm[on] == 0.15)
    # diffractors present, background zero
    assert np.any(dm == 0.2)
    far = (depth < 0.2)
    assert np.all(dm[far] == 0.0)
    assert (dm != 0).sum() < 0.2 * p.n_cells
