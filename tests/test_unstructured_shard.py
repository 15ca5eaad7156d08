"""HaloShardedShellSystem — O(boundary)-communication SPMD on
unstructured meshes (parallel/unstructured_shard.py; the reference's
libMesh/Metis + PETSc VecScatter analog, doc/implementation.tex:463-486).

Runs on the 8-device virtual CPU mesh (conftest.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fem_shell_tpu.data import test_e as E
from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import ShellMesh, refine_uniform
from fem_shell_tpu.parallel.sharded import make_device_mesh
from fem_shell_tpu.parallel.unstructured_shard import HaloShardedShellSystem

MAT = Material(nu=0.25, em=10000, thickness=0.25)


def _ibeam(levels=1):
    ne = E.TRIS.shape[0]
    conn = np.hstack([E.TRIS, np.full((ne, 1), -1, np.int32)])
    mesh = ShellMesh(E.COORDS, np.full(ne, 3, np.int32), conn, E.BOUNDARY_SIDES)
    if levels:
        mesh = refine_uniform(mesh, levels)
    forces = np.zeros((mesh.n_nodes, 6))
    forces[35, 1] = 1.6
    forces[44, 1] = -1.6
    return mesh, forces


def _reference_solution(mesh, forces):
    from fem_shell_tpu.large import LargeShellSystem

    sys1 = LargeShellSystem(mesh, MAT, dtype=jnp.float64)
    u = sys1.solve(forces, rtol=1e-12, maxiter=50000)
    return u, int(sys1.last_cg.iters)


def test_halo_sharded_matches_single_device():
    mesh, forces = _ibeam(1)  # 320 tris, unstructured numbering after refine
    u_ref, it_ref = _reference_solution(mesh, forces)

    dm = make_device_mesh(8)
    sys8 = HaloShardedShellSystem(mesh, MAT, dm, dtype=jnp.float64)
    u8 = sys8.solve(forces, rtol=1e-12, maxiter=50000)
    np.testing.assert_allclose(u8, u_ref, atol=1e-9 * np.abs(u_ref).max())
    # same operator + same Jacobi preconditioner -> iteration parity
    assert abs(sys8.last_iters - it_ref) <= max(3, 0.05 * it_ref)


def test_halo_sharded_shard_count_invariance():
    mesh, forces = _ibeam(1)
    sols = []
    for s in (2, 4, 8):
        dm = make_device_mesh(s)
        sys_s = HaloShardedShellSystem(mesh, MAT, dm, dtype=jnp.float64)
        sols.append(sys_s.solve(forces, rtol=1e-12, maxiter=50000))
    scale = np.abs(sols[0]).max()
    np.testing.assert_allclose(sols[1], sols[0], atol=1e-10 * scale)
    np.testing.assert_allclose(sols[2], sols[0], atol=1e-10 * scale)


def test_halo_comm_volume_is_boundary_sized():
    """The per-iteration exchange must scale with the partition boundary
    (~sqrt(N) for surface meshes), not with N: 16x more elements must
    grow comm by ~4x, and sit far under the all_gather volume.
    (Measured: boundary 308 -> 602 -> 1178 nodes for levels 2/3/4 —
    x1.96 per 4x elements — vs N = 693 -> 2665 -> 10449.)"""
    vols, ns = [], []
    for lv in (2, 4):
        mesh = _ibeam(lv)[0]
        dm = make_device_mesh(8)
        sys8 = HaloShardedShellSystem(mesh, MAT, dm, dtype=jnp.float64)
        vols.append(sys8.comm_floats_per_iter)
        ns.append(mesh.n_nodes * 6)
    # far below the full-vector all_gather volume at the larger size
    assert vols[1] < ns[1] / 4, (vols, ns)
    # boundary growth ~sqrt(element growth): ~4x (+ padding slack) for 16x
    assert vols[1] < 4.5 * vols[0], (vols, ns)


def test_halo_sharded_mixed_mesh():
    """Mixed tri+quad unstructured meshes go through the same path."""
    types, conn, bsides = [], [], []
    tri_pairs = {
        1: lambda i: ([18 + i, 19 + i, i], [19 + i, i + 1, i]),
        2: lambda i: ([i, i + 1, 27 + i], [i + 1, 28 + i, 27 + i]),
    }
    for p in range(5):
        first = len(types)
        if p in (0, 3, 4):
            for i in range(8):
                types.append(5)
                conn.append(list(E._QUAD_PANELS[p](i)))
            bsides.append([first, 3, 0])
        else:
            for i in range(8):
                t1, t2 = tri_pairs[p](i)
                types.append(3)
                conn.append(t1 + [-1])
                types.append(3)
                conn.append(t2 + [-1])
            bsides.append([first, 2, 0])
    mesh = ShellMesh(E.COORDS, np.array(types, np.int32),
                     np.array(conn, np.int32), np.array(bsides, np.int32))
    mesh = refine_uniform(mesh, 1)
    forces = np.zeros((mesh.n_nodes, 6))
    forces[35, 1] = 1.6
    forces[44, 1] = -1.6
    u_ref, _ = _reference_solution(mesh, forces)
    dm = make_device_mesh(8)
    sys8 = HaloShardedShellSystem(mesh, MAT, dm, dtype=jnp.float64)
    u8 = sys8.solve(forces, rtol=1e-12, maxiter=50000)
    np.testing.assert_allclose(u8, u_ref, atol=1e-9 * np.abs(u_ref).max())
