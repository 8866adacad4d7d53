#!/usr/bin/env python
"""Generate sample unstructured meshes for the ``Mesh File Name`` import.

The reference's parameter reader declares a default mesh path
``../mesh/mesh-square-40.msh`` (ParameterReader.cpp:51-54) without ever
reading it; tpuwave's import path (core/unstructured.py) makes the
parameter live, and this script produces meshes to feed it:

    python scripts/make_mesh.py uniform   40 mesh/mesh-square-40.msh
    python scripts/make_mesh.py perturbed 40 /tmp/pert40.msh --amp 0.2
    python scripts/make_mesh.py graded    40 /tmp/graded40.msh --power 1.8

``uniform`` reproduces the structured rectangle triangulation byte-level
(same vertex order and diagonal split), so runs on it match the generated
mesh to solver noise. ``perturbed`` jitters interior vertices; ``graded``
concentrates resolution toward the domain centre.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tpuwave.core.mesh import StructuredTriMesh              # noqa: E402
from tpuwave.core.unstructured import write_msh              # noqa: E402


def build(kind: str, nel: int, geometry, amp: float, power: float, seed: int):
    m = StructuredTriMesh((nel, nel), geometry)
    pts = m.vertex_coords.copy()
    if kind == "perturbed":
        rng = np.random.default_rng(seed)
        interior = ~m.boundary_vertex_mask
        pts[interior] += (rng.uniform(-amp, amp, (int(interior.sum()), 2))
                          * np.array([m.hx, m.hy]))
    elif kind == "graded":
        # symmetric grading toward the centre: remap each axis through
        # s(u) = 0.5 + sign(u-0.5) * |2u-1|^power / 2  (power > 1 clusters
        # points at the centre; boundary vertices stay fixed)
        (x0, y0), (x1, y1) = geometry
        for axis, (lo, hi) in enumerate(((x0, x1), (y0, y1))):
            u = (pts[:, axis] - lo) / (hi - lo)
            s = 0.5 + np.sign(u - 0.5) * np.abs(2.0 * u - 1.0) ** power / 2.0
            pts[:, axis] = lo + s * (hi - lo)
    elif kind != "uniform":
        raise SystemExit(f"unknown kind {kind!r}")
    return pts, m.cells


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("kind", choices=["uniform", "perturbed", "graded"])
    ap.add_argument("nel", type=int, help="elements per direction")
    ap.add_argument("out", help="output .msh path")
    ap.add_argument("--geometry", default="0,1,0,1",
                    help="x0,x1,y0,y1 (default unit square)")
    ap.add_argument("--amp", type=float, default=0.2,
                    help="perturbation amplitude in units of h")
    ap.add_argument("--power", type=float, default=1.5,
                    help="grading exponent (>1 concentrates at the centre)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    x0, x1, y0, y1 = (float(v) for v in args.geometry.split(","))
    pts, cells = build(args.kind, args.nel, ((x0, y0), (x1, y1)),
                       args.amp, args.power, args.seed)
    path = write_msh(args.out, pts, cells)
    print(f"Wrote {path} ({pts.shape[0]} vertices, {cells.shape[0]} cells)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
