"""Stress/von Mises recovery tests (ops/recovery.py).

Patch tests (exact fields the elements reproduce exactly) plus an
analytic Kirchhoff moment check on the Test-D plate
(reference doc/validation.tex:264-297 configuration).
"""
import numpy as np
import pytest

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.ops.recovery import nodal_average, recover_stresses

E0 = 1e7
NU = 0.3
MAT = Material(nu=NU, em=E0, thickness=0.5)


def _plate_mesh(et, n):
    pm = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, rows, fac = generate(pm)
    return mesh, rows * fac


@pytest.mark.parametrize("et", ["q", "t"])
def test_membrane_patch_uniaxial(et):
    """Linear in-plane field u = e0*x, v = -nu*e0*y => sigma_x = E*e0,
    sigma_y = tau = 0, zero moments — exact for CST and bilinear."""
    mesh, _ = _plate_mesh(et, 4)
    e0 = 1e-4
    c = np.asarray(mesh.coords)
    u = np.zeros((mesh.n_nodes, 6))
    u[:, 0] = e0 * c[:, 0]
    u[:, 1] = -NU * e0 * c[:, 1]
    f = recover_stresses(mesh, MAT, u)
    # stresses are reported in each ELEMENT's local frame (tri frames
    # follow edge AB) — check the frame-invariant quantities: principal
    # stresses {E*e0, 0} and von Mises E*e0
    sx, sy, txy = f.sigma_m[:, 0], f.sigma_m[:, 1], f.sigma_m[:, 2]
    mid = 0.5 * (sx + sy)
    rad = np.sqrt((0.5 * (sx - sy)) ** 2 + txy**2)
    s1, s2 = mid + rad, mid - rad
    assert np.abs(s1 - E0 * e0).max() < 1e-6 * E0 * e0
    assert np.abs(s2).max() < 1e-6 * E0 * e0
    assert np.abs(f.moments).max() < 1e-6 * E0 * e0
    assert np.abs(f.vm - E0 * e0).max() < 1e-5 * E0 * e0


@pytest.mark.parametrize("et", ["q", "t"])
def test_rigid_body_motion_is_stress_free(et):
    mesh, _ = _plate_mesh(et, 4)
    c = np.asarray(mesh.coords)
    u = np.zeros((mesh.n_nodes, 6))
    # translation + small rotation about z
    w = 1e-4
    u[:, 0] = 0.3 - w * c[:, 1]
    u[:, 1] = -0.2 + w * c[:, 0]
    u[:, 2] = 0.05
    u[:, 5] = w
    f = recover_stresses(mesh, MAT, u)
    scale = E0 * w
    assert np.abs(f.sigma_m).max() < 1e-6 * scale
    assert np.abs(f.moments).max() < 1e-6 * scale


def test_plate_center_moment_vs_kirchhoff():
    """Test-D configuration (SS square plate, uniform q): center bending
    moment Mmax = beta*q*a^2 with beta = 0.0479 (nu = 0.3, Timoshenko
    Table 8). Recovery at element centers of the solved 16x16 plate must
    land within the discretization error of that."""
    from fem_shell_tpu.system import ShellSystem

    mesh, forces = _plate_mesh("q", 16)
    u = ShellSystem(mesh, MAT).solve(forces)
    f = recover_stresses(mesh, MAT, u)
    m_exact = 0.0479 * 300.0 * 10.0**2
    m_peak = np.abs(f.moments[:, :2]).max()
    assert abs(m_peak - m_exact) < 0.05 * m_exact
    # surface stress consistency: vm == |6 M / t^2| combination
    assert f.vm.max() > 6 * m_peak / MAT.thickness**2 * 0.9


def test_nodal_average_shapes():
    mesh, forces = _plate_mesh("t", 4)
    from fem_shell_tpu.system import ShellSystem

    u = ShellSystem(mesh, MAT).solve(forces)
    f = recover_stresses(mesh, MAT, u)
    nv = nodal_average(mesh, f.vm)
    assert nv.shape == (mesh.n_nodes,)
    assert np.isfinite(nv).all() and nv.max() > 0


@pytest.mark.parametrize("et", ["q", "t"])
def test_membrane_patch_nodal(et):
    """Constant-stress patch: Gauss-point extrapolation + nodal averaging
    must reproduce the constant exactly (frame-invariant check)."""
    from fem_shell_tpu.ops.recovery import recover_stresses_nodal

    mesh, _ = _plate_mesh(et, 4)
    e0 = 1e-4
    c = np.asarray(mesh.coords)
    u = np.zeros((mesh.n_nodes, 6))
    u[:, 0] = e0 * c[:, 0]
    u[:, 1] = -NU * e0 * c[:, 1]
    f = recover_stresses_nodal(mesh, MAT, u)
    sx, sy, txy = f.sigma_m[:, 0], f.sigma_m[:, 1], f.sigma_m[:, 2]
    mid = 0.5 * (sx + sy)
    rad = np.sqrt((0.5 * (sx - sy)) ** 2 + txy**2)
    assert np.abs(mid + rad - E0 * e0).max() < 1e-6 * E0 * e0
    assert np.abs(mid - rad).max() < 1e-6 * E0 * e0
    assert np.abs(f.moments).max() < 1e-6 * E0 * e0
    assert np.abs(f.vm - E0 * e0).max() < 1e-5 * E0 * e0


@pytest.mark.parametrize("et,tol", [("q", 0.02), ("t", 0.05)])
def test_nodal_moment_center_vs_kirchhoff(et, tol):
    """SS square plate under uniform q: the EXTRAPOLATED NODAL moment at
    the center node must hit Mmax = 0.0479 q a^2 (Timoshenko Table 8).
    At the center Mx = My and Mxy = 0, so the check is invariant to the
    per-element local frames the averaging mixes."""
    from fem_shell_tpu.ops.recovery import recover_stresses_nodal
    from fem_shell_tpu.system import ShellSystem

    mesh, forces = _plate_mesh(et, 16)
    u = ShellSystem(mesh, MAT).solve(forces)
    f = recover_stresses_nodal(mesh, MAT, u)
    center = mesh.n_nodes // 2
    m_exact = 0.0479 * 300.0 * 10.0**2
    assert abs(abs(f.moments[center, 0]) - m_exact) < tol * m_exact
    assert abs(abs(f.moments[center, 1]) - m_exact) < tol * m_exact
    # center vm = 6 Mmax / t^2 (Mx = My, Mxy = 0 there); the GLOBAL vm
    # max sits at the CORNERS (twisting moment Mxy = 0.0325 q a^2)
    vm_center = 6.0 * m_exact / MAT.thickness**2
    assert abs(f.vm[center] - vm_center) < tol * vm_center
    vm_corner = np.sqrt(3.0) * 6.0 * 0.0325 * 300.0 * 10.0**2 / MAT.thickness**2
    assert abs(f.vm.max() - vm_corner) < 0.06 * vm_corner


def test_cli_stress_output(tmp_path, capsys):
    from fem_shell_tpu.meshgen import MeshGenParams, write_files
    from fem_shell_tpu.utils import cli

    pm = MeshGenParams("q", 8, 8, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    write_files(pm, str(tmp_path / "plate"))
    rc = cli.main(
        ["-nu", "0.3", "-e", "1e7", "-t", "0.5", "-mesh", str(tmp_path / "plate.xda"),
         "-out", str(tmp_path / "out"), "--stress"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "peak von Mises" in out
    vtu = (tmp_path / "out.vtu").read_text()
    assert "von_mises" in vtu and "<CellData>" in vtu and "moments" in vtu
