"""SPMD domain-decomposition tests (the reference Test-G analog:
solution independent of process count, doc/validation.tex:518) on a
virtual 8-device CPU mesh."""
import numpy as np
import pytest

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.parallel.sharded import ShardedShellSystem, make_device_mesh
from fem_shell_tpu.system import ShellSystem


def quad_case(n=16):
    p = MeshGenParams("q", n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    return mesh, rows * fac


def tri_case(n=8):
    p = MeshGenParams("t", n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, False, "z")
    mesh, rows, fac = generate(p)
    return mesh, rows * fac


MAT = Material(nu=0.3, em=1e7, thickness=0.5)


@pytest.mark.parametrize("ndev", [1, 2, 4, 8])
def test_quad_shard_count_invariance(ndev):
    mesh, forces = quad_case(16)
    ref = np.asarray(ShellSystem(mesh, MAT).solve(forces))
    s = ShardedShellSystem(mesh, MAT, make_device_mesh(ndev))
    u = s.solve(forces)
    scale = np.abs(ref).max()
    assert np.abs(u - ref).max() < 1e-12 * scale
    assert s.last_residual < 1e-11


@pytest.mark.parametrize("ndev", [3, 8])
def test_tri_shard_count_invariance(ndev):
    """Also exercises non-divisible node counts (81 nodes over 3/8 shards)."""
    mesh, forces = tri_case(8)
    ref = np.asarray(ShellSystem(mesh, MAT).solve(forces))
    s = ShardedShellSystem(mesh, MAT, make_device_mesh(ndev))
    u = s.solve(forces)
    assert np.abs(u - ref).max() < 1e-12 * np.abs(ref).max()


def test_mixed_mesh_sharded():
    """Mesh with both element families sharded together."""
    from fem_shell_tpu.data import test_e as E  # I-beam (tri)

    from helpers import mesh_from_tris

    mesh = mesh_from_tris(E.COORDS, E.TRIS, E.BOUNDARY_SIDES)
    ref = np.asarray(ShellSystem(mesh, Material(0.25, 10000, 0.25)).solve(E.FORCES))
    s = ShardedShellSystem(mesh, Material(0.25, 10000, 0.25), make_device_mesh(4))
    u = s.solve(E.FORCES)
    assert np.abs(u - ref).max() < 1e-11 * np.abs(ref).max()


def test_iteration_count_matches_single_device():
    mesh, forces = quad_case(16)
    sys1 = ShellSystem(mesh, MAT)
    sys1.solve(forces)
    s8 = ShardedShellSystem(mesh, MAT, make_device_mesh(8))
    s8.solve(forces)
    assert abs(int(sys1.last_cg.iters) - s8.last_iters) <= 1
