"""Gmsh .msh reader + ExodusII writer tests."""
import numpy as np
import pytest

from fem_shell_tpu.materials import Material
from fem_shell_tpu.mesh import load_mesh_and_forces, read_mesh
from fem_shell_tpu.meshgen import MeshGenParams, generate


MSH_EXAMPLE = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
4
1 -1.0 -1.0  0.0
2  1.0 -1.0  0.0
3 -1.0  1.0  0.0
4  1.0  1.0  0.0
$EndNodes
$Elements
6
1 2 2 0 0 1 2 3
2 2 2 0 0 2 4 3
3 15 2 0 0 1
4 15 2 0 0 2
5 15 2 1 0 3
6 15 2 1 0 4
$EndElements
"""


def test_read_msh_thesis_example(tmp_path):
    """The exact example mesh from the thesis (doc/implementation.tex:104)."""
    p = tmp_path / "ex.msh"
    p.write_text(MSH_EXAMPLE)
    mesh = read_mesh(str(p))
    assert mesh.n_nodes == 4 and mesh.n_elems == 2
    np.testing.assert_array_equal(mesh.tri, [[0, 1, 2], [1, 3, 2]])
    # nodes 1,2 (0-based 0,1) -> bc 0 (simply supported u,v,w);
    # nodes 3,4 (0-based 2,3) -> bc 1 (clamped, all six)
    mask = mesh.dirichlet_mask()
    assert mask[0, :3].all() and not mask[0, 3:].any()
    assert mask[2].all() and mask[3].all()


def test_msh_with_line_bcs(tmp_path):
    msh = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
4
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
$EndNodes
$Elements
2
1 3 2 0 0 1 2 3 4
2 1 2 20 0 1 2
$EndElements
"""
    p = tmp_path / "q.msh"
    p.write_text(msh)
    mesh = read_mesh(str(p))
    assert mesh.n_elems == 1 and len(mesh.quad) == 1
    assert set(mesh.coupling_node_ids().tolist()) == {0, 1}  # bc id 20


def test_msh_solve_end_to_end(tmp_path):
    """Solve the same plate from .msh and .xda inputs — identical results."""
    from fem_shell_tpu.system import ShellSystem

    p = MeshGenParams("q", 4, 4, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(p)
    forces = rows * fac
    # write an equivalent .msh by hand: quads + boundary point BCs
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes", str(mesh.n_nodes)]
    for i, c in enumerate(mesh.coords):
        lines.append(f"{i+1} {c[0]} {c[1]} {c[2]}")
    lines.append("$EndNodes")
    bc_nodes = mesh.boundary_node_ids([0])
    lines.append("$Elements")
    lines.append(str(mesh.n_elems + len(bc_nodes)))
    eid = 1
    for q in mesh.quad:
        lines.append(f"{eid} 3 2 0 0 " + " ".join(str(v + 1) for v in q))
        eid += 1
    for n in bc_nodes:
        lines.append(f"{eid} 15 2 0 0 {n+1}")
        eid += 1
    lines.append("$EndElements")
    path = tmp_path / "plate.msh"
    path.write_text("\n".join(lines) + "\n")

    mesh2 = read_mesh(str(path))
    u_ref = np.asarray(ShellSystem(mesh, Material(0.3, 1e7, 0.5)).solve(forces))
    u_msh = np.asarray(ShellSystem(mesh2, Material(0.3, 1e7, 0.5)).solve(forces))
    np.testing.assert_allclose(u_msh, u_ref, atol=1e-10)


def test_exodus_roundtrip(tmp_path):
    pytest.importorskip("scipy")
    from fem_shell_tpu.io.exodus import read_exodus_summary, write_exodus

    p = MeshGenParams("t", 3, 2, 0, 0, 3, 2, (0, 0, 0, 0), 1.0, 1, False, "z")
    mesh, _, _ = generate(p)
    u = np.random.default_rng(0).normal(size=(2, mesh.n_nodes, 6))
    path = str(tmp_path / "out.e")
    write_exodus(mesh, path, displacements=u, times=[0.0, 0.5])

    s = read_exodus_summary(path)
    assert s["num_nodes"] == mesh.n_nodes
    assert s["num_elem"] == mesh.n_elems
    np.testing.assert_allclose(s["coords"], mesh.coords)
    (etype, conn), = s["blocks"]
    assert etype == "TRI3"
    np.testing.assert_array_equal(conn, mesh.tri)
    np.testing.assert_allclose(s["times"], [0.0, 0.5])
    np.testing.assert_allclose(s["nodal_vars"]["disp_z"], u[:, :, 2])
    np.testing.assert_allclose(s["nodal_vars"]["rot_y"], u[:, :, 4])


def test_coupled_driver_exodus_timeseries(tmp_path):
    """Per-timestep ExodusII output in the coupled driver (the
    reference's parallel-build mode, fem-shell_precice.cpp:1526-1561):
    `-out name.e` accumulates every timestep into ONE .e time series;
    any other name keeps the per-step VTU files."""
    pytest.importorskip("scipy")
    from fem_shell_tpu.coupling.structure_cli import make_timestep_writer
    from fem_shell_tpu.io.exodus import read_exodus_summary

    p = MeshGenParams("t", 3, 2, 0, 0, 3, 2, (0, 0, 0, 0), 1.0, 1, False, "z")
    mesh, _, _ = generate(p)
    sols = np.random.default_rng(1).normal(size=(3, mesh.n_nodes, 6))

    path = str(tmp_path / "coupled.e")
    write_step, finalize = make_timestep_writer(mesh, path, dt=0.25)
    for t, s in enumerate(sols, start=1):
        write_step(t, s)
    finalize()
    summ = read_exodus_summary(path)
    np.testing.assert_allclose(summ["times"], [0.25, 0.5, 0.75])
    np.testing.assert_allclose(summ["nodal_vars"]["disp_z"], sols[:, :, 2])

    # VTU mode unchanged: one file per step
    vtu_base = str(tmp_path / "coupled")
    write_step, finalize = make_timestep_writer(mesh, vtu_base, dt=0.25)
    write_step(1, sols[0])
    finalize()
    assert (tmp_path / "coupled_0001.vtu").exists()

    # disabled mode is inert
    write_step, finalize = make_timestep_writer(mesh, None, dt=0.25)
    write_step(1, sols[0])
    finalize()


# ----------------------------------------------------------------------
# XDR binary meshes (fem-shell.cpp:45-47 accepts .xda/.xdr/.msh)
# ----------------------------------------------------------------------


def test_xdr_roundtrip_and_ascii_parity(tmp_path):
    from fem_shell_tpu.mesh import read_mesh, read_xdr, write_xdr, write_xda
    from fem_shell_tpu.meshgen import MeshGenParams, generate

    p = MeshGenParams("t", 7, 5, 0, 0, 3.3, 2.1, (0, 1, -1, 2), 1.0, 0, False, "y")
    mesh, _, _ = generate(p)
    write_xdr(mesh, str(tmp_path / "m.xdr"))
    m2 = read_mesh(str(tmp_path / "m.xdr"))
    # binary roundtrip is BIT-exact (ASCII stores 6 significant digits)
    np.testing.assert_array_equal(m2.coords, mesh.coords)
    np.testing.assert_array_equal(m2.elem_types, mesh.elem_types)
    np.testing.assert_array_equal(m2.elem_conn, mesh.elem_conn)
    np.testing.assert_array_equal(m2.boundary_sides, mesh.boundary_sides)
    # cross-format: same records as the ASCII path
    write_xda(mesh, str(tmp_path / "m.xda"))
    m3 = read_mesh(str(tmp_path / "m.xda"))
    np.testing.assert_array_equal(m2.elem_conn, m3.elem_conn)
    np.testing.assert_array_equal(m2.boundary_sides, m3.boundary_sides)
    np.testing.assert_allclose(m2.coords, m3.coords, rtol=1e-5)


def test_xdr_rejects_garbage(tmp_path):
    import pytest as _pytest

    from fem_shell_tpu.mesh import read_xdr

    (tmp_path / "bad.xdr").write_bytes(b"\x00\x00\x00\x04nope")
    with _pytest.raises(ValueError):
        read_xdr(str(tmp_path / "bad.xdr"))
