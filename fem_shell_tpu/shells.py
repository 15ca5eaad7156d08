"""Curved-shell benchmark geometries (Scordelis-Lo roof et al.).

The reference validates its shell element on the twisted I-beam (Test E,
doc/validation.tex:376-397); the classic curved-shell obstacle course
(MacNeal-Harder) adds the Scordelis-Lo barrel-vault roof, which
BASELINE.json configs[2] names for the scale benchmarks. This module
builds those geometries as row-major structured quad grids — exactly
the layout `mg.detect_structured_grid` recognizes, so the full
production pipeline (grid-df assembly, MG V-cycle, Pallas SpMV) runs on
curved shells unchanged (only the uniform-grid class-table fast path
falls back to the materialized operator pair: the exact-stencil class
construction requires affine node coordinates, ops/exact_stencil.py).

Scordelis-Lo setup (canonical): cylindrical roof, radius 25, length 50,
80-degree opening, thickness 0.25, E = 4.32e8, nu = 0, self-weight 90
per unit midsurface area downward; axial ends on rigid diaphragms
(u_x = u_z = 0, the diaphragm is rigid in its own x-z plane), straight
edges free. Target: vertical midside free-edge deflection 0.3024.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import ShellMesh

SCORDELIS_LO_GOLDEN_W = -0.3024  # MacNeal-Harder target (downward)
SCORDELIS_LO_MATERIAL = Material(nu=0.0, em=4.32e8, thickness=0.25)


def scordelis_lo(
    n_arc: int,
    n_axial: Optional[int] = None,
    radius: float = 25.0,
    length: float = 50.0,
    half_angle_deg: float = 40.0,
    load: float = -90.0,
) -> Tuple[ShellMesh, np.ndarray, int]:
    """Scordelis-Lo roof as a row-major structured Quad-4 grid.

    Columns (fast axis) run along the ARC, rows along the cylinder axis
    (node = iy*nxp + ix — the meshgen numbering, so the structured-grid
    production solvers accept the mesh). Returns
    ``(mesh, forces[N,6], midside_node)`` where ``midside_node`` is the
    free-edge midside whose vertical (z) displacement carries the
    0.3024 golden; ``n_axial`` (default ``n_arc``) must be even for the
    midside row to be a node row.
    """
    from fem_shell_tpu.mg import _grid_conn

    if n_axial is None:
        n_axial = n_arc
    if n_axial % 2:
        raise ValueError("n_axial must be even (midside row must be a node row)")
    nxp, nyp = n_arc + 1, n_axial + 1
    phi0 = np.deg2rad(half_angle_deg)
    ix = np.arange(nxp)
    iy = np.arange(nyp)
    phi = phi0 * (2.0 * ix / (nxp - 1) - 1.0)
    x = radius * np.sin(phi)
    z = radius * np.cos(phi)
    y = length * iy / (nyp - 1)
    coords = np.stack(
        [
            np.broadcast_to(x[None, :], (nyp, nxp)),
            np.broadcast_to(y[:, None], (nyp, nxp)),
            np.broadcast_to(z[None, :], (nyp, nxp)),
        ],
        axis=-1,
    ).reshape(-1, 3)

    types, conn = _grid_conn(nxp, nyp, "q", True)

    # rigid diaphragms at the axial ends: u_x = u_z = 0, u_y and all
    # rotations free — not expressible with the reference's bc ids, so
    # it rides the node_dirichlet_mask extension
    mask = np.zeros((nxp * nyp, 6), bool)
    ends = np.concatenate([np.arange(nxp), np.arange(nxp) + (nyp - 1) * nxp])
    mask[ends, 0] = True
    mask[ends, 2] = True

    mesh = ShellMesh(coords, types, conn, np.zeros((0, 3), np.int32),
                     node_dirichlet_mask=mask)

    # dead load per unit midsurface area -> equal nodal shares of each
    # facet's area (meshgen loading-2 analog on the curved facets)
    q = mesh.quad
    p0, p1, p2, p3 = (coords[q[:, k]] for k in range(4))
    area = 0.5 * np.linalg.norm(np.cross(p2 - p0, p3 - p1), axis=1)
    forces = np.zeros((nxp * nyp, 6))
    np.add.at(forces[:, 2], q.reshape(-1), np.repeat(load * area / 4.0, 4))

    midside = (n_axial // 2) * nxp  # ix = 0 free edge, middle row
    return mesh, forces, midside
