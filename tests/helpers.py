"""Shared helpers for building test systems."""
import numpy as np

from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import ShellMesh
from fem_shell_tpu.system import ShellSystem


def mesh_from_tris(coords, tris, boundary_sides):
    ne = tris.shape[0]
    conn = np.hstack([tris, np.full((ne, 1), -1, np.int32)])
    return ShellMesh(coords, np.full(ne, 3, np.int32), conn, boundary_sides)


def mesh_from_quads(coords, quads, boundary_sides):
    ne = quads.shape[0]
    return ShellMesh(coords, np.full(ne, 5, np.int32), quads, boundary_sides)


def solve(mesh, forces, nu, em, t, method="pcg", rtol=1e-12, maxiter=50000):
    system = ShellSystem(mesh, Material(nu=nu, em=em, thickness=t))
    u = system.solve(forces, method=method, rtol=rtol, maxiter=maxiter)
    return np.asarray(u), system
