"""meshgen + XDA/force-file I/O tests (meshGen parity, round-trips)."""
import numpy as np
import pytest

from fem_shell_tpu.mesh import (
    ShellMesh,
    read_forces,
    read_xda,
    write_forces,
    write_xda,
)
from fem_shell_tpu.meshgen import MeshGenParams, generate, write_files


def test_quad_grid_structure():
    p = MeshGenParams("q", 3, 2, 0, 0, 3, 2, (0, 1, -1, 2), 1.0, 0, True, "z")
    mesh, rows, fac = generate(p)
    assert mesh.n_nodes == 12 and mesh.n_elems == 6
    np.testing.assert_allclose(mesh.coords[0], [0, 0, 0])
    np.testing.assert_allclose(mesh.coords[-1], [3, 2, 0])
    # quad 0 = [0,1,5,4]
    np.testing.assert_array_equal(mesh.quad[0], [0, 1, 5, 4])
    # bc records: bottom 3 (id 1), top 3 (id 0), right 2 (id 2); no left
    ids = mesh.boundary_sides[:, 2]
    assert (ids == 1).sum() == 3 and (ids == 0).sum() == 3 and (ids == 2).sum() == 2


def test_tri_orientations():
    for ul_lr in (True, False):
        p = MeshGenParams("t", 2, 2, 0, 0, 2, 2, (0, 0, 0, 0), 1.0, 0, ul_lr, "z")
        mesh, _, _ = generate(p)
        assert mesh.n_elems == 8
        # all triangles must have positive area and consistent winding
        for tri in mesh.tri:
            a, b, c = mesh.coords[tri]
            cr = np.cross(b - a, c - a)
            assert abs(cr[2]) > 0


def test_dead_axis_plane():
    for axis, plane in (("z", (0, 1)), ("y", (0, 2)), ("x", (1, 2))):
        p = MeshGenParams("q", 2, 2, 0, 0, 1, 1, (-1, -1, -1, 0), 1.0, 0, True, axis)
        mesh, _, _ = generate(p)
        dead = {"x": 0, "y": 1, "z": 2}[axis]
        assert np.all(mesh.coords[:, dead] == 0)
        assert mesh.coords[:, plane[0]].max() == 1


def test_uniform_force_factor_and_quirk():
    # 16x16 over 10x10 with factor 300 -> file factor 117.1875, n-1 rows
    p = MeshGenParams("q", 16, 16, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    np.testing.assert_allclose(fac, 117.1875)
    assert rows[-1].sum() == 0.0  # reference writes only n_nodes-1 rows
    assert np.all(rows[:-1, 2] == 1.0)


def test_concentrated_force_target():
    p = MeshGenParams("q", 4, 4, 0, 0, 10, 10, (0, 0, 0, 0), 30000.0, 1, True, "z")
    mesh, rows, fac = generate(p)
    assert fac == 30000.0
    nz = np.nonzero(rows)[0]
    assert list(nz) == [mesh.n_nodes // 2]


def test_xda_roundtrip(tmp_path):
    p = MeshGenParams("t", 3, 3, -1, -1, 1, 1, (0, 1, 20, 21), 2.5, 2, False, "y")
    base = str(tmp_path / "rt")
    mesh = write_files(p, base)
    mesh2 = read_xda(base + ".xda")
    # writer uses C++ ostream 6-significant-digit formatting (parity with
    # meshGen), so the round-trip is exact only to ~1e-6 relative
    np.testing.assert_allclose(mesh.coords, mesh2.coords, rtol=2e-6, atol=1e-12)
    np.testing.assert_array_equal(mesh.elem_conn, mesh2.elem_conn)
    np.testing.assert_array_equal(mesh.boundary_sides, mesh2.boundary_sides)
    forces = read_forces(base + "_f", mesh.n_nodes)
    # dead axis y -> forces along global y; factor 2.5*dx*dy
    dx = 2.0 / 3.0
    np.testing.assert_allclose(forces[0, 1], 2.5 * dx * dx, rtol=2e-6)
    np.testing.assert_allclose(forces[-1], np.zeros(6))  # quirk row


def test_force_file_missing_rows_read_as_zero(tmp_path):
    path = tmp_path / "f"
    path.write_text("3\n2.0\n1 0 0 0 0 0\n")  # header says 3 nodes, 1 row
    f = read_forces(str(path), 3)
    np.testing.assert_allclose(f[0], [2, 0, 0, 0, 0, 0])
    np.testing.assert_allclose(f[1:], 0)


def test_dirichlet_masks():
    p = MeshGenParams("q", 2, 2, 0, 0, 1, 1, (0, 1, -1, -1), 1.0, 0, True, "z")
    mesh, _, _ = generate(p)
    mask = mesh.dirichlet_mask()
    # bottom edge (id 1, clamped): nodes 0,1,2 all 6 dofs
    assert mask[0].all() and mask[1].all() and mask[2].all()
    # top edge (id 0, simply supported): nodes 6,7,8 only u,v,w
    assert mask[6, :3].all() and not mask[6, 3:].any()
    # interior node 4: free
    assert not mask[4].any()


def test_coupling_node_discovery():
    p = MeshGenParams("q", 2, 3, 0, 0, 1, 3, (2, 0, 2, 2), 1.0, 0, True, "z")
    mesh, _, _ = generate(p)
    ids = mesh.coupling_node_ids()
    # left (0,3,6,9) + right (2,5,8,11) + top (9,10,11) borders
    assert set(ids.tolist()) == {0, 2, 3, 5, 6, 8, 9, 10, 11}
