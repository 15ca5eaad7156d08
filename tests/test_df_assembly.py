"""Strip-wise df assembly + generalized multigrid tests (CPU).

The strip pipeline (ops/soa.py:assemble_soa_df) must reproduce the plain
f64 SoA assembly to ~eps64 ENTRYWISE — eps32-level operator noise is
amplified by ~kappa into the solution (measured 8e-2 relative at 64^2),
which is the whole reason the df pair exists. On CPU the "emulated f64"
kernels are native f64, so parity here checks the strip bucketing,
local-slot relocation, cross-strip overlap accumulation and BC masking.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fem_shell_tpu.materials import Material
from fem_shell_tpu.meshgen import MeshGenParams, generate
from fem_shell_tpu.large import LargeShellSystem
from fem_shell_tpu.mg import MultigridShellSystem, detect_structured_grid

MAT = Material(nu=0.3, em=1e7, thickness=0.5)


@pytest.mark.parametrize(
    "et,n,strip",
    [("q", 16, 64), ("t", 12, 50), ("q", 16, 4096), ("t", 12, 37)],
)
def test_assemble_df_matches_f64(et, n, strip):
    pm = MeshGenParams(et, n, n, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, et == "q", "z")
    mesh, _, _ = generate(pm)
    s = LargeShellSystem(mesh, MAT, dtype=jnp.float64, chunk=64)
    v64 = np.asarray(s.assemble())
    pair = s.assemble_df(strip_nodes=strip, chunk=32)
    v_df = np.asarray(pair.hi.astype(jnp.float64) + pair.lo.astype(jnp.float64))
    v_df = v_df.reshape(v64.shape)  # pair is stored flat [36K, Npad]
    scale = np.abs(v64).max()
    assert np.abs(v_df - v64).max() < 1e-13 * scale


def test_f32_assembly_is_not_operator_exact():
    """Documents WHY the df pair exists: plain f32 kernels leave
    near-cancellation entries with large errors (the centered geometry
    only fixes the coordinate-difference part)."""
    pm = MeshGenParams("q", 16, 16, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, _, _ = generate(pm)
    v64 = np.asarray(LargeShellSystem(mesh, MAT, dtype=jnp.float64).assemble())
    v32 = np.asarray(LargeShellSystem(mesh, MAT, dtype=jnp.float32).assemble())
    err = np.abs(v32.astype(np.float64) - v64).max() / np.abs(v64).max()
    assert 1e-9 < err < 1e-6  # eps32-class noise: too big for golden solves


@pytest.mark.parametrize("et,ul", [("q", True), ("t", True), ("t", False)])
def test_detect_structured_grid(et, ul):
    pm = MeshGenParams(et, 12, 8, 0, 0, 3, 2, (0, 1, -1, 2), 1.0, 0, ul, "z")
    mesh, _, _ = generate(pm)
    g = detect_structured_grid(mesh)
    assert g is not None
    assert (g.nxp, g.nyp, g.elem_type) == (13, 9, et)
    if et == "t":
        assert g.ul_lr == ul


def test_detect_rejects_permuted_mesh():
    pm = MeshGenParams("q", 8, 8, 0, 0, 1, 1, (0, 0, 0, 0), 1.0, 0, True, "z")
    mesh, _, _ = generate(pm)
    # renumber nodes with a nontrivial permutation -> not row-major anymore
    perm = np.random.default_rng(0).permutation(mesh.n_nodes).astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(mesh.n_nodes, dtype=np.int32)
    conn = mesh.elem_conn.copy()
    conn[conn >= 0] = inv[conn[conn >= 0]]
    from fem_shell_tpu.mesh import ShellMesh

    m2 = ShellMesh(mesh.coords[perm.argsort()], mesh.elem_types, conn, mesh.boundary_sides)
    assert detect_structured_grid(m2) is None


def test_mg_from_loaded_mesh(tmp_path):
    """MG must precondition a mesh loaded from disk (no MeshGenParams) —
    reference generality: libMesh meshes come from files
    (fem-shell.cpp:35-39)."""
    from fem_shell_tpu.mesh import load_mesh_and_forces
    from fem_shell_tpu.meshgen import write_files
    from fem_shell_tpu.system import ShellSystem

    pm = MeshGenParams("q", 16, 16, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    write_files(pm, str(tmp_path / "plate"))
    mesh, forces = load_mesh_and_forces(str(tmp_path / "plate.xda"))
    ref = np.asarray(ShellSystem(mesh, MAT).solve(forces))
    mg = MultigridShellSystem(mesh, MAT, dtype=jnp.float64)
    u = mg.solve(forces, rtol=1e-10)
    assert int(mg.last_cg.iters) < 40
    assert np.abs(u - ref).max() < 1e-8 * np.abs(ref).max()


def test_mg_tri_mesh():
    """Tri grids (7-point stencil, both meshGen diagonals) go through the
    same V-cycle."""
    pm = MeshGenParams("t", 16, 16, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    mesh, rows, fac = generate(pm)
    from fem_shell_tpu.system import ShellSystem

    ref = np.asarray(ShellSystem(mesh, MAT).solve(rows * fac))
    mg = MultigridShellSystem(mesh, MAT, dtype=jnp.float64)
    u = mg.solve(rows * fac, rtol=1e-10)
    assert int(mg.last_cg.iters) < 60
    assert np.abs(u - ref).max() < 1e-8 * np.abs(ref).max()


def test_cli_precond_mg(tmp_path, capsys):
    from fem_shell_tpu.meshgen import write_files
    from fem_shell_tpu.utils import cli

    pm = MeshGenParams("q", 16, 16, 0, 0, 10, 10, (0, 0, 0, 0), 300.0, 2, True, "z")
    write_files(pm, str(tmp_path / "plate"))
    rc = cli.main(
        ["-nu", "0.3", "-e", "1e7", "-t", "0.5", "-mesh", str(tmp_path / "plate.xda"),
         "--precond", "mg", "--rtol", "1e-10", "-d", "1"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    # Test-D golden row (doc/validation.tex:287-293): n=16 uniform -> 0.106454
    import re

    ws = [float(m.group(1)) for m in re.finditer(r"w= ([-\d.e+]+)", out)]
    center = ws[len(ws) // 2]
    assert abs(center - 0.106454) < 5e-6
